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
    * Plan node ids vary run to run; operator names do not, and the
    * flagship plan's SHAPE is a commitment, not an accident — so the
    * entry is a GOLDEN-PLAN gate (round 10): the oracle replays the
    * expected inventory as a literal table, and any structural
    * regression (a lost map-side partial aggregate, an extra shuffle,
    * a filter no longer pushed into one Scan) flips the row red in
    * the driver's hash compare. */
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

  /** The committed flagship inventory: one parquet Scan (filter
    * pushed, no second scan), partial+final HashAggregate (map-side
    * combine on), exactly two Exchanges (agg shuffle + sort range
    * exchange), one Sort, under one AQE root. SF-independent — the
    * single-table agg plan does not change shape with data volume. */
  val topologyOracleSql: String =
    """SELECT * FROM (VALUES
      | ('AdaptiveSparkPlan', cast(1 as bigint)),
      | ('Exchange', cast(2 as bigint)),
      | ('Filter', cast(1 as bigint)),
      | ('HashAggregate', cast(2 as bigint)),
      | ('Project', cast(1 as bigint)),
      | ('Scan parquet', cast(1 as bigint)),
      | ('Sort', cast(1 as bigint))) t(op, n)
      |ORDER BY op""".stripMargin

  val all: Seq[graft.GQuery] = Seq(
    graft.GQuery("meta_topology_describe", topologyQuery, Some(topologyOracleSql)),
  )
}
