package graft.operators

import graft.GQuery
import graft.util._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics expressed as relational operators — the
  * Pregel/GraphX message-passing pattern without an RDD in sight:
  * each superstep is `edges ⋈ ranks → groupBy(dst) → new ranks`, one
  * hash shuffle on the destination key per iteration.
  *
  * Companion to the connected-components family in `Dedup.scala`
  * (label propagation / star contraction); PageRank adds the
  * weighted-accumulation shape: per-node out-degree division,
  * damping, and a fixed-point loop of join+aggregate rounds.
  */
object Graph {

  /** Five PageRank supersteps over the customer↔supplier trade graph
    * (distinct (custkey, suppkey) pairs from orders ⋈ lineitem, made
    * symmetric so mass keeps circulating; node ids disambiguated as
    * 2·custkey / 2·suppkey+1).
    *
    * ALL arithmetic is integral — ranks live in micro-units (start
    * 1 000 000) and each step computes
    * `r' = 150000 + (85 · Σ_in (r div deg)) div 100`
    * with floor division — so both engines produce bit-identical
    * BIGINTs and the query is fully hash-checkable, with no float
    * reassociation anywhere. (Real damping d=0.85; dangling mass is
    * dropped, the standard simplified formulation.)
    *
    * Scale design: the degree-annotated edge list is materialized ONCE
    * to scratch parquet and every superstep scans that compact table —
    * the lineage-truncation/checkpoint pattern of production iterative
    * jobs (without it, superstep k re-derives the orders ⋈ lineitem
    * join k times and the plan grows without bound). Each superstep
    * shuffles only (dst, contrib) pairs — edge-linear, no all-pairs
    * state, and the ranks side of the join is node-linear. The oracle
    * replays the identical five steps as an unrolled CTE chain.
    */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val lineitem = t(spark, dir, "lineitem")
    val pairs = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("c"),
        (col("l_suppkey") * 2 + 1).cast("long").as("s"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))

    // materialize the per-superstep input once (checkpoint pattern)
    val edgePath = scratchDir("pagerank_edges")
    edges.join(deg, "src").write.parquet(edgePath)
    val withDeg = spark.read.parquet(edgePath)

    var ranks = withDeg.select(col("src").as("node")).distinct()
      .withColumn("r", lit(1000000L))
    for (_ <- 1 to 5) {
      ranks = withDeg.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div d").as("contrib"))
        .groupBy(col("dst"))
        .agg((lit(150000L) + expr("(85 * sum(contrib)) div 100")).as("r"))
        .select(col("dst").as("node"), col("r"))
    }
    ranks.orderBy(col("r").desc, col("node")).limit(20)
      .select(col("node"), col("r").as("rank"))
  }

  /** The oracle unrolls the same five supersteps as chained CTEs —
    * identical integral arithmetic (`//` ≡ `div` on non-negative
    * operands), identical tie-break. */
  val pageRankSql: String = {
    val steps = (1 to 5).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |         CAST(150000 + (85 * SUM(p.r // e.d)) // 100 AS BIGINT) AS r
         |  FROM edges e JOIN r${i - 1} p ON p.node = e.src
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS c,
       |                  CAST(l_suppkey * 2 + 1 AS BIGINT) AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |edges0 AS (
       |  SELECT c AS src, s AS dst FROM pairs
       |  UNION ALL
       |  SELECT s AS src, c AS dst FROM pairs),
       |deg AS (SELECT src, count(*) AS d FROM edges0 GROUP BY src),
       |edges AS (SELECT e.src, e.dst, d.d FROM edges0 e JOIN deg d USING (src)),
       |r0 AS (SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS r FROM edges),
       |$steps
       |SELECT node, r AS rank FROM r5
       |ORDER BY r DESC, node LIMIT 20""".stripMargin
  }

  val all: Seq[GQuery] = Seq(
    GQuery("graph_pagerank", pageRank, Some(pageRankSql)),
  )
}
