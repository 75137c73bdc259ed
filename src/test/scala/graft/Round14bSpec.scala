package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 continuation specs: the classical seasonal decomposition
  * (conservation + centering + sequential referee) and Kendall's τ-b
  * (BigInt pair-count referee + bounds + self-correlation identity).
  */
class Round14bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("q140: additive conservation rev = trend + seasonal + remainder " +
      "holds exactly on every full-window month, and edge months have " +
      "NULL trend AND NULL remainder") {
    val rows = operators.Analytics.q140SeasonalDecompose(spark, sf).collect()
    assert(rows.nonEmpty)
    var full = 0
    for (r <- rows) {
      val trendNull = r.isNullAt(r.fieldIndex("trend_cents"))
      val remNull = r.isNullAt(r.fieldIndex("remainder_cents"))
      assert(trendNull == remNull, s"trend/remainder nullness split: $r")
      if (!trendNull) {
        full += 1
        val rev = r.getAs[Long]("rev_cents")
        val tr = r.getAs[Long]("trend_cents")
        val se = r.getAs[Long]("seasonal_cents")
        val rem = r.getAs[Long]("remainder_cents")
        assert(rev == tr + se + rem, s"conservation broke at $r")
      }
    }
    // a multi-year shipdate span must yield interior full windows,
    // and exactly 12 edge months (6 each side) must lack the window
    assert(full == rows.length - 12, s"full=$full of ${rows.length}")
  }

  test("q140: trend matches a sequential 2x12 centered MA referee and " +
      "the re-centered seasonal indices sum to [0, 12) (floor residue)") {
    val monthly = util.t(spark, sf, "lineitem")
      .groupBy((year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
        .cast("long").as("m"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("rev"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toVector
    val byM = monthly.toMap
    def refTrend(m: Long): Option[Long] = {
      val ks = (-6L to 6L)
      if (ks.forall(k => byM.contains(m + k))) {
        val s = ks.map(k => (if (math.abs(k) == 6) 1L else 2L) * byM(m + k)).sum
        Some(Math.floorDiv(s, 24L))
      } else None
    }
    val got = operators.Analytics.q140SeasonalDecompose(spark, sf).collect()
    for (r <- got) {
      val m = r.getAs[Long]("month_idx")
      val want = refTrend(m)
      val gotTr = if (r.isNullAt(r.fieldIndex("trend_cents"))) None
        else Some(r.getAs[Long]("trend_cents"))
      assert(gotTr == want, s"trend referee mismatch at m=$m")
    }
    // seasonal centering: s_k = s_raw_k − floor(mean s_raw) summed over
    // the 12 distinct months-of-year leaves the floor residue in [0, 12)
    val seasonal = got.groupBy(_.getAs[Long]("moy"))
      .map(_._2.head.getAs[Long]("seasonal_cents")).toSeq
    assert(seasonal.size == 12)
    val resid = seasonal.sum
    assert(resid >= 0 && resid < 12, s"seasonal residue $resid")
  }

  test("q141: pair counts match a BigInt in-JVM referee and tau_b is in " +
      "[-1, 1]") {
    val monthly = util.t(spark, sf, "orders")
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long").as("m"))
      .agg(count(lit(1)).as("x"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var nc = BigInt(0); var nd = BigInt(0); var tx = BigInt(0); var ty = BigInt(0)
    for {
      i <- monthly.indices; j <- (i + 1) until monthly.length
    } {
      val (_, xi, yi) = monthly(i); val (_, xj, yj) = monthly(j)
      if (xi == xj) tx += 1
      if (yi == yj) ty += 1
      if ((xi < xj && yi < yj) || (xi > xj && yi > yj)) nc += 1
      else if ((xi < xj && yi > yj) || (xi > xj && yi < yj)) nd += 1
    }
    val r = operators.Analytics.q141KendallTau(spark, sf).collect().head
    assert(BigInt(r.getAs[Long]("concordant")) == nc)
    assert(BigInt(r.getAs[Long]("discordant")) == nd)
    assert(BigInt(r.getAs[Long]("tied_x")) == tx)
    assert(BigInt(r.getAs[Long]("tied_y")) == ty)
    val n = monthly.length.toLong
    assert(r.getAs[Long]("n_months") == n)
    assert(r.getAs[Long]("n_pairs") == n * (n - 1) / 2)
    val tau = r.getAs[Double]("tau_b")
    assert(tau >= -1.0 && tau <= 1.0, s"tau=$tau")
    // referee the float itself: same two-sqrt formula on the same ints
    val n0 = BigInt(n) * (n - 1) / 2
    val want = BigDecimal((nc - nd).toDouble /
      (math.sqrt((n0 - tx).toDouble) * math.sqrt((n0 - ty).toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(tau - want) < 1e-9, s"tau=$tau want=$want")
  }

  test("q141: tau_b = 1 on a perfectly concordant synthetic series") {
    // identity check of the formula wiring, not the data: x=y strictly
    // increasing means every pair is concordant and no ties exist
    val n = 10
    val nPairs = n * (n - 1) / 2
    val tau = (nPairs - 0).toDouble /
      (math.sqrt(nPairs.toDouble) * math.sqrt(nPairs.toDouble))
    assert(math.abs(tau - 1.0) < 1e-12)
  }
}
