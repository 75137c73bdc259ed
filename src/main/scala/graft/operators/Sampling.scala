package graft.operators

import graft.GQuery
import graft.util._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reproducible sampling — a corpus build must be able to cut the
  * same subset on any cluster, any partitioning, any day. Spark's
  * `df.sample` is partition-order dependent, so both operators here
  * sample by KEY HASH instead: membership is a pure function of the
  * row, independent of physical layout.
  */
object Sampling {

  /** Deterministic ~5 % sample: keep rows whose key hash lands in
    * bucket 0 of 20. Membership never changes across runs/partitions;
    * at 100 TB this is a metadata-free sample that any job can
    * recompute exactly. Hash fn is engine-specific → rows-only check;
    * the spec asserts determinism and the sampled fraction. */
  def hashSample(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(pmod(xxhash64(col("o_orderkey")), lit(20)) === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** Stratified sample: up to 25 documents per language, chosen by
    * hash order (deterministic, unbiased by doc_id order). Emitting
    * the per-stratum COUNTS makes it oracle-checkable even though the
    * chosen ids are hash-dependent: n_sampled = least(25, |stratum|). */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(xxhash64(col("doc_id")), col("doc_id"))
    t(spark, dir, "documents")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 25)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy(col("lang"))
  }

  val stratifiedSampleSql: String =
    """SELECT lang, least(25, count(*)) AS n_sampled
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  val all: Seq[GQuery] = Seq(
    GQuery("sample_hash_deterministic", hashSample, None),
    GQuery("sample_stratified", stratifiedSample, Some(stratifiedSampleSql)),
  )
}
