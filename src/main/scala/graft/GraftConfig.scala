package graft

import java.io.FileInputStream
import java.util.Properties
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** R10 — config / properties loading. The reference loads an
  * env-specific .properties file and builds its StreamsConfig from it
  * (KStreamsToKTable.java:143-150, :53-64; configuration/dev.properties).
  * The Spark twin: load a .properties file and apply every `spark.`
  * key to a SparkSession.Builder (static confs) or a live session's
  * RuntimeConfig (runtime confs).
  */
object GraftConfig {

  /** Parse a java .properties file (the reference's loadEnvProperties). */
  def load(path: String): Properties = {
    val props = new Properties()
    val in = new FileInputStream(path)
    try props.load(in) finally in.close()
    props
  }

  /** All `spark.`-prefixed entries, sorted for determinism. */
  def sparkEntries(props: Properties): Seq[(String, String)] =
    props.asScala.toSeq
      .collect { case (k, v) if k.startsWith("spark.") => (k, v) }
      .sortBy(_._1)

  /** Apply to a builder (before getOrCreate — static + runtime confs). */
  def configure(builder: SparkSession.Builder, props: Properties): SparkSession.Builder =
    sparkEntries(props).foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }

  /** Apply runtime-settable confs to a live session; returns the keys
    * actually applied (non-runtime keys are skipped, as Spark forbids
    * mutating them after start). */
  def applyRuntime(spark: SparkSession, props: Properties): Seq[String] =
    sparkEntries(props).flatMap { case (k, v) =>
      try { spark.conf.set(k, v); Some(k) }
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    }
}
