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

  /** COLUMN-LEVEL LINEAGE from the analyzed logical plan — the
    * warehouse-governance complement to the operator inventory above:
    * for every output column of a registered query, the set of
    * (source_table, source_column) leaves it transitively derives
    * from, computed by folding an exprId → sources map bottom-up
    * through the plan (leaf relations seed it; every `Alias` unions
    * the sources of the attributes it references). Filters contribute
    * CONTROL lineage only and are deliberately excluded — this is the
    * standard data-lineage cut (what a column's VALUES derive from).
    * Aggregates with no column inputs (count(*)) map to '(constant)'.
    *
    * Deterministic: names, not exprIds, are emitted, and plan analysis
    * is a pure function of the query — so the entry is a golden gate
    * like the topology inventory: the oracle replays the committed
    * lineage of the flagship query as a literal table, and any
    * accidental re-derivation of an output column flips the hash red. */
  def columnLineage(spark: SparkSession, dir: String, name: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val plan = SparkEntry.queries(name)(spark, dir).queryExecution.analyzed
    def build(p: LogicalPlan): Map[Long, Set[(String, String)]] = {
      val fromChildren = p.children.map(build)
        .foldLeft(Map.empty[Long, Set[(String, String)]])(_ ++ _)
      val own = p match {
        case lr: LogicalRelation =>
          val table = lr.relation match {
            case fs: HadoopFsRelation => fs.location.rootPaths.headOption
              .map(_.getName.stripSuffix(".parquet")).getOrElse("(source)")
            case _ => "(source)"
          }
          lr.output.map(a => a.exprId.id -> Set((table, a.name))).toMap
        case _ => Map.empty[Long, Set[(String, String)]]
      }
      val aliased = p.expressions.flatMap(_.collect { case a: Alias => a }).map { a =>
        a.exprId.id -> a.child.references.toSeq
          .flatMap(r => fromChildren.get(r.exprId.id).orElse(own.get(r.exprId.id)))
          .foldLeft(Set.empty[(String, String)])(_ ++ _)
      }.toMap
      fromChildren ++ own ++ aliased
    }
    val m = build(plan)
    plan.output.zipWithIndex.flatMap { case (a, i) =>
      val srcs = m.getOrElse(a.exprId.id, Set.empty[(String, String)])
      val rows = if (srcs.isEmpty) Seq(("(constant)", "(constant)")) else srcs.toSeq.sorted
      rows.map { case (tb, c) => (i + 1L, a.name, tb, c) }
    }.toDF("out_ord", "out_col", "src_table", "src_col")
      .orderBy(col("out_ord"), col("src_col"))
  }

  def lineageQuery(spark: SparkSession, dir: String): DataFrame =
    columnLineage(spark, dir, "q1_pricing_summary")

  /** Committed lineage of the flagship query: every measure traces to
    * exactly its input money/quantity columns, count(*) to none. */
  val lineageOracleSql: String =
    """SELECT * FROM (VALUES
      | (cast(1 as bigint), 'l_returnflag', 'lineitem', 'l_returnflag'),
      | (cast(2 as bigint), 'l_linestatus', 'lineitem', 'l_linestatus'),
      | (cast(3 as bigint), 'sum_qty', 'lineitem', 'l_quantity'),
      | (cast(4 as bigint), 'sum_base_price', 'lineitem', 'l_extendedprice'),
      | (cast(5 as bigint), 'sum_disc_price', 'lineitem', 'l_discount'),
      | (cast(5 as bigint), 'sum_disc_price', 'lineitem', 'l_extendedprice'),
      | (cast(6 as bigint), 'sum_charge', 'lineitem', 'l_discount'),
      | (cast(6 as bigint), 'sum_charge', 'lineitem', 'l_extendedprice'),
      | (cast(6 as bigint), 'sum_charge', 'lineitem', 'l_tax'),
      | (cast(7 as bigint), 'avg_qty', 'lineitem', 'l_quantity'),
      | (cast(8 as bigint), 'avg_price', 'lineitem', 'l_extendedprice'),
      | (cast(9 as bigint), 'avg_disc', 'lineitem', 'l_discount'),
      | (cast(10 as bigint), 'count_order', '(constant)', '(constant)')
      |) t(out_ord, out_col, src_table, src_col)
      |ORDER BY out_ord, src_col""".stripMargin

  val all: Seq[graft.GQuery] = Seq(
    graft.GQuery("meta_topology_describe", topologyQuery, Some(topologyOracleSql)),
    graft.GQuery("meta_column_lineage", lineageQuery, Some(lineageOracleSql)),
  )
}
