package graft.plans

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R9 — topology description. The reference prints the compiled
  * processor graph via `topology.describe()`
  * (KStreamsToKTable.java:183-186; sample output README.md:37-50).
  * The Spark twin is the formatted Catalyst plan: `describe` returns
  * it as a string for any registered query, and `topology` parses the
  * operator list into rows so the description is itself queryable.
  */
object Describe {

  /** Formatted physical plan (operators + their inputs + pushed
    * filters/read schema) of a registered query — the engine's
    * `topology.describe()`. */
  def describe(spark: SparkSession, dir: String, name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  private val opLine = """^[\s*+:-]*([A-Za-z][A-Za-z0-9 ]*?) \(\d+\)$""".r

  /** Physical-operator inventory of a query's plan as (op, n) rows.
    * Plan node ids vary run to run; operator names do not — still,
    * plans are engine-specific, so this is a rows-only entry. */
  def topology(spark: SparkSession, dir: String, name: String): DataFrame = {
    import spark.implicits._
    describe(spark, dir, name).linesIterator
      .collect { case opLine(op) => op.trim }
      .toSeq.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
      .toDF("op", "n")
      .orderBy(col("op"))
  }

  /** Registered entry: the flagship query's operator inventory. */
  def topologyQuery(spark: SparkSession, dir: String): DataFrame =
    topology(spark, dir, "q1_pricing_summary")

  val all: Seq[graft.GQuery] = Seq(
    graft.GQuery("meta_topology_describe", topologyQuery, None),
  )
}
