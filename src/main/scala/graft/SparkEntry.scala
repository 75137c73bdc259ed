package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All operators live in graft.operators / graft.streaming; this object
  * only aggregates them into the driver's expected shape.
  */
object SparkEntry {
  /** Every declared operator of the engine. */
  def registry: Seq[GQuery] =
    operators.Relational.all ++
    operators.KTableOps.all ++
    operators.Dedup.all ++
    operators.Similarity.all ++
    operators.TextAnalysis.all ++
    operators.Multimodal.all ++
    operators.StreamingOps.all ++
    operators.Analytics.all ++
    operators.SqlSurface.all ++
    operators.Sampling.all ++
    operators.Warehouse.all ++
    operators.Graph.all ++
    sources.FileSources.all ++
    functions.Udfs.all ++
    plans.Describe.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
