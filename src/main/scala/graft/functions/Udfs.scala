package graft.functions

import graft.GQuery
import graft.util._
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The declared extensibility surface (SURVEY.md §2.2 last row): one
  * Scala UDF and one `Aggregator`-based UDAF, each behind an
  * oracle-verified query.
  *
  * Design note: UDFs are opaque to Catalyst (no codegen, no pushdown
  * through them), so the engine's hot paths use built-ins/HOFs
  * (graft.functions.Vectors) — these exist to prove the extension
  * mechanism a real user would reach for, and the UDF result is
  * bit-identical to the HOF twin. The UDAF accumulates money as exact
  * integer cents and quantities as exact longs, so the aggregation is
  * associative/commutative over integers — bit-identical at any
  * partitioning, i.e. the same answer on 4 threads or 1000 executors.
  */
object Udfs {

  /** Scala UDF: cosine similarity over two double vectors. Left-to-right
    * fold like DuckDB's list_dot_product; rounding happens OUTSIDE the
    * UDF with Spark's round() (same discipline as the HOF version).
    * Ragged or null inputs yield NULL — the same malformed-input
    * contract as the native `CosineSim` expression and its HOF twin,
    * so all three declared cosine surfaces agree. */
  val cosineUdf = udf((a: Seq[Double], b: Seq[Double]) =>
    if (a == null || b == null || a.length != b.length) Option.empty[Double]
    else {
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      Some(dot / (math.sqrt(na) * math.sqrt(nb)))
    })

  /** Cosine of vec i vs vec i+250 via the Scala UDF. */
  def udfCosinePairs(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.filter(col("vec_id") < 250)
      .select(col("vec_id").as("a_id"), col("v").as("va"))
    val b = e.select((col("vec_id") - 250).as("a_id"), col("v").as("vb"))
    a.join(b, Seq("a_id"))
      .select(col("a_id"), round(cosineUdf(col("va"), col("vb")), 6).as("cos"))
      .orderBy(col("a_id"))
  }

  val udfCosinePairsSql: String =
    """SELECT a.vec_id AS a_id,
      | round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
      |  (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
      |   sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cos
      |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 250
      |WHERE a.vec_id < 250
      |ORDER BY a_id""".stripMargin

  /** Mutable exact-integer buffer: money in cents, quantity as long. */
  final case class WAvgBuf(var cents: Long, var qty: Long)

  /** UDAF: quantity-weighted average price, exact integer accumulation
    * (testdata prices have 2 decimals, quantities are integral — both
    * verified), so partial aggregation merges are exact. */
  object WeightedAvgPrice extends Aggregator[(Double, Double), WAvgBuf, Double] {
    def zero: WAvgBuf = WAvgBuf(0L, 0L)
    def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf = {
      b.cents += math.round(in._1 * 100); b.qty += math.round(in._2); b
    }
    def merge(x: WAvgBuf, y: WAvgBuf): WAvgBuf = {
      x.cents += y.cents; x.qty += y.qty; x
    }
    def finish(b: WAvgBuf): Double =
      if (b.qty == 0) 0.0 else (b.cents / 100.0) / b.qty
    def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Per-returnflag quantity-weighted average extended price. */
  def udafWeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val wavg = udaf(WeightedAvgPrice)
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 6).as("wavg_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  val udafWeightedAvgSql: String =
    """SELECT l_returnflag,
      | round(sum(cast(round(l_extendedprice * 100) as bigint)) / 100.0
      |   / sum(cast(round(l_quantity) as bigint)), 6) AS wavg_price,
      | count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** EXACT mergeable distinct counting through the native bitmap
    * aggregate ([[BitmapAgg]]/[[BitmapUnionAgg]]/[[BitmapCount]], SQL
    * surface `graft_bitmap*`): per-month customer bitmaps materialize
    * once, each month's exact distinct reads off its bitmap, and the
    * ALL row is the bitmap UNION — the incremental dashboard pattern
    * of meta_hll_sketches but EXACT, so unlike every estimator in the
    * sketch matrix this one is fully DuckDB-oracle-checked against
    * COUNT(DISTINCT). The union row also proves mergeability
    * end-to-end: a lost or double-merged word would shift the exact
    * count and hash-fail. At 100 TB the monthly bitmap table is
    * ~n_distinct/8 bytes per partition and rollups never rescan
    * facts. */
  def udafBitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    val monthly = t(spark, dir, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_custkey"))
      .groupBy(col("month"))
      .agg(expr("graft_bitmap(o_custkey)").as("bm"))
      .localCheckpoint(true) // the materialized bitmap table
    monthly
      .select(col("month"), expr("graft_bitmap_count(bm)").as("n_distinct"))
      .unionByName(monthly.agg(
        expr("graft_bitmap_count(graft_bitmap_union(bm))").as("n_distinct"))
        .select(lit("ALL").as("month"), col("n_distinct")))
      .orderBy(col("month"))
  }

  val udafBitmapDistinctSql: String =
    """SELECT * FROM (
      | SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |  cast(count(DISTINCT o_custkey) as bigint) AS n_distinct
      | FROM orders GROUP BY 1
      | UNION ALL
      | SELECT 'ALL', cast(count(DISTINCT o_custkey) as bigint) FROM orders
      |) ORDER BY month""".stripMargin

  val all: Seq[GQuery] = Seq(
    GQuery("udf_cosine_pairs", udfCosinePairs, Some(udfCosinePairsSql)),
    GQuery("udaf_weighted_avg", udafWeightedAvg, Some(udafWeightedAvgSql)),
    GQuery("udaf_bitmap_distinct", udafBitmapDistinct, Some(udafBitmapDistinctSql)),
  )
}
