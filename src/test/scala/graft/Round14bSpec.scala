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

  test("q142: rank-sum conservation (sum of 2x rank sums = n(n+1)), the " +
      "committed integer H matches a BigInt referee, and the tie " +
      "correction only increases a positive H") {
    val rows = operators.Analytics.q142KruskalWallis(spark, sf).collect()
    assert(rows.length == 5, "five TPC-H regions")
    val n = rows.head.getAs[Long]("n_total")
    val sumR2 = rows.map(_.getAs[Long]("rank2_sum")).sum
    assert(BigInt(sumR2) == BigInt(n) * (n + 1),
      s"rank conservation: $sumR2 vs ${BigInt(n) * (n + 1)}")
    // BigInt referee of the committed recurrence from raw data
    val raw = util.t(spark, sf, "orders")
      .join(util.t(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(util.t(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(util.t(spark, sf, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val cnt = raw.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sortedV = cnt.keys.toVector.sorted
    var cum = 0L
    val r2 = scala.collection.mutable.Map.empty[Long, Long]
    for (v <- sortedV) { cum += cnt(v); r2(v) = 2 * cum - cnt(v) + 1 }
    val byRegion = raw.groupBy(_._1).view.mapValues { vs =>
      (vs.length.toLong, vs.map(x => BigInt(r2(x._2))).sum)
    }.toMap
    val s4 = byRegion.values.map { case (ng, rs) => rs * rs / (4 * ng) }.sum
    val nn = BigInt(n)
    val hMicro = s4 * 12000000 / (nn * (nn + 1)) - 3000000 * (nn + 1)
    val tsum = cnt.values.map(c => BigInt(c) * c * c - c).sum
    val hCorr = hMicro * (nn * nn * nn - nn) / (nn * nn * nn - nn - tsum)
    assert(BigInt(rows.head.getAs[Long]("h_micro")) == hMicro)
    assert(BigInt(rows.head.getAs[Long]("h_corr_micro")) == hCorr)
    if (hMicro >= 0) assert(hCorr >= hMicro, "tie correction must not shrink H")
    for (r <- rows) {
      val (ng, rs) = byRegion(r.getAs[String]("r_name"))
      assert(r.getAs[Long]("n_g") == ng)
      assert(BigInt(r.getAs[Long]("rank2_sum")) == rs)
    }
  }

  test("meta_psi: ten bins, count conservation, every smoothed term is " +
      "non-negative up to the 6-dp rounding, and the total is their sum") {
    val rows = operators.Analytics.metaPsi(spark, sf).collect()
    assert(rows.length == 10, s"got ${rows.length} bins")
    val nPurch = util.t(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    val refSum = rows.map(_.getAs[Long]("ref_count")).sum
    val curSum = rows.map(_.getAs[Long]("cur_count")).sum
    assert(refSum + curSum == nPurch, "every purchase lands in one bin")
    assert(refSum > 0 && curSum > 0, "midpoint split must populate both sides")
    var total = BigDecimal(0)
    for (r <- rows) {
      val term = r.getAs[Double]("psi_term")
      // (a-b)ln(a/b) >= 0 for smoothed shares; rounding can dip 5e-7
      assert(term >= -1e-6, s"negative PSI term $term at $r")
      total += BigDecimal(term)
    }
    val psiTotal = rows.head.getAs[Double]("psi_total")
    assert(math.abs(psiTotal - total.toDouble) < 1e-9,
      s"total $psiTotal vs sum $total")
    assert(rows.map(_.getAs[Long]("shifted")).toSet.size == 1)
  }

  test("meta_psi: reference bins are rank-deciles — each of the ten bins " +
      "holds between floor(n/10)-ties and the tie-inflated bound of its " +
      "rank slice (sequential edge referee)") {
    // referee the 9 edges: sort reference values, edge_k = the value at
    // the last row of rank-bucket k (bucket = (rk-1)*10 div n), then
    // every reference row bins by value < edge exactly as the engine did
    val ev = util.t(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = {
      val us = ev.map(_._2); (us.min + us.max) / 2
    }
    val ref = ev.filter(_._2 <= mid).map(t => (t._3, t._1)).sorted
    val n = ref.length
    val edges = (0 until 9).map { k =>
      // max v of bucket k, bucket = (rk-1)*10 div n — a direct scan,
      // affordable at sf0.001
      ref.zipWithIndex.filter { case (_, i) => i * 10 / n == k }.map(_._1._1).max
    }
    val got = operators.Analytics.metaPsi(spark, sf).collect()
    val refCounts = got.sortBy(_.getAs[Long]("bin")).map(_.getAs[Long]("ref_count"))
    val wantCounts = Array.fill(10)(0L)
    for ((v, _) <- ref) {
      val bin = edges.count(_ < v)
      wantCounts(bin) += 1
    }
    assert(refCounts.toSeq == wantCounts.toSeq,
      s"ref bin counts ${refCounts.toSeq} vs referee ${wantCounts.toSeq}")
  }

  test("meta_cramers_v: BigInt referee on the documents pair, V bounds, " +
      "and df = (r-1)(c-1) on every panel row") {
    val rows = operators.Warehouse.metaCramersV(spark, sf).collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val rl = r.getAs[Long]("r_levels"); val cl = r.getAs[Long]("c_levels")
      assert(r.getAs[Long]("df") == (rl - 1) * (cl - 1))
      if (!r.isNullAt(r.fieldIndex("cramers_v"))) {
        val v = r.getAs[Double]("cramers_v")
        assert(v >= 0.0 && v <= 1.0, s"V=$v out of range at $r")
      }
      assert(r.getAs[Long]("chi2_micro") >= 0L)
    }
    // referee the documents pair cell by cell with BigInt arithmetic,
    // over the ZERO-FILLED r×c grid (r15): structural-zero cells
    // contribute rt·ct·10⁶ div (rt·ct·N) = 10⁶ div N-scaled mass
    val raw = util.t(spark, sf, "documents")
      .select(col("lang"), col("source")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = raw.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rt = raw.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = raw.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = raw.length.toLong
    // .toSeq both: a for-comprehension over key SETS yields a Set and
    // identical zero-cell contributions would collapse in the sum
    val grid = for (a <- rt.keys.toSeq; b <- ct.keys.toSeq)
      yield ((a, b), cells.getOrElse((a, b), 0L))
    val chi2 = grid.map { case ((a, b), o) =>
      val num = BigInt(o) * n - BigInt(rt(a)) * ct(b)
      num * num * 1000000 / (BigInt(rt(a)) * ct(b) * n)
    }.sum
    val doc = rows.find(_.getAs[String]("pair") == "documents:lang_x_source").get
    assert(BigInt(doc.getAs[Long]("chi2_micro")) == chi2,
      s"chi2 referee: engine ${doc.getAs[Long]("chi2_micro")} vs $chi2")
    assert(doc.getAs[Long]("n") == n)
    assert(doc.getAs[Long]("r_levels") == rt.size)
    assert(doc.getAs[Long]("c_levels") == ct.size)
    // MI referee with the same per-cell 6-dp rounding
    val mi = cells.map { case ((a, b), o) =>
      BigDecimal(math.rint((o.toDouble / n) *
        math.log((o.toDouble * n) / (rt(a).toDouble * ct(b))) * 1e6) / 1e6)
    }.sum
    assert(math.abs(doc.getAs[Double]("mi_nats") - mi.toDouble) < 1e-9,
      s"MI referee: ${doc.getAs[Double]("mi_nats")} vs $mi")
  }

  test("pipeline_repro_hash: the XOR-of-xxhash64 checksum is invariant " +
      "under repartitioning and matches the entry, and flipping one " +
      "character flips it") {
    val entry = operators.TextAnalysis.pipelineReproHash(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("checksum")).toMap
    for (parts <- Seq(3, 7)) {
      val alt = util.t(spark, sf, "documents").repartition(parts)
        .groupBy(col("source"))
        .agg(expr("bit_xor(xxhash64(doc_id, text))").as("checksum"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(alt == entry, s"checksum varies under repartition($parts)")
    }
    import spark.implicits._
    val base = Seq((1L, "hello", "s"), (2L, "world", "s"))
      .toDF("doc_id", "text", "source")
    val flipped = Seq((1L, "hellp", "s"), (2L, "world", "s"))
      .toDF("doc_id", "text", "source")
    def ck(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(expr("bit_xor(xxhash64(doc_id, text))")).collect().head.getLong(0)
    assert(ck(base) != ck(flipped), "single-char flip must change the checksum")
  }

  test("graph_betweenness: the full top-30 matches a sequential in-JVM " +
      "Brandes referee replicating the committed integer recurrence, " +
      "and every dependency is non-negative") {
    // rebuild the trade graph exactly as tradeGraphRoot does
    val pairs = util.t(spark, sf, "orders")
      .join(util.t(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("c"),
        (col("l_suppkey") * 2 + 1).cast("long").as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    for ((c, s) <- pairs) { adj(c) = s :: adj(c); adj(s) = c :: adj(s) }
    val seeds = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted.take(8)
    val bt = scala.collection.mutable.Map.empty[Long, BigInt]
      .withDefaultValue(BigInt(0))
    for (seed <- seeds) {
      val dist = scala.collection.mutable.Map(seed -> 0)
      val sigma = scala.collection.mutable.Map(seed -> BigInt(1))
      var frontier = List(seed)
      val levels = scala.collection.mutable.ArrayBuffer(List(seed))
      for (r <- 1 to 4) {
        val next = scala.collection.mutable.Map.empty[Long, BigInt]
        for (u <- frontier; v <- adj(u) if !dist.contains(v))
          next(v) = next.getOrElse(v, BigInt(0)) + sigma(u)
        // nodes discovered this round (dist assigned after the sweep so
        // same-level edges never contribute)
        for ((v, sg) <- next) { dist(v) = r; sigma(v) = sg }
        frontier = next.keys.toList
        levels += frontier
      }
      val delta = scala.collection.mutable.Map.empty[Long, BigInt]
        .withDefaultValue(BigInt(0))
      for (l <- 3 to 1 by -1; u <- levels(l); w <- adj(u)
           if dist.get(w).contains(l + 1))
        delta(u) += sigma(u) * (BigInt(1000000) + delta(w)) / sigma(w)
      for ((v, d) <- delta if v != seed) bt(v) += d
    }
    val want = bt.toSeq.filter(_._2 > 0)
      .sortBy { case (n, b) => (-b, n) }.take(30)
    val got = operators.Graph.betweenness(spark, sf).collect()
      .map(r => (r.getAs[Long]("node"), BigInt(r.getAs[Long]("bt_micro"))))
    assert(got.forall(_._2 >= 0), "negative dependency")
    // the engine's top-30 may include zero-dependency tail nodes if
    // fewer than 30 have positive bt — compare the positive prefix
    val gotPos = got.filter(_._2 > 0).toSeq
    assert(gotPos.length == math.min(30, want.length),
      s"positive-row count ${gotPos.length} vs ${math.min(30, want.length)}")
    assert(gotPos == want.take(gotPos.length),
      s"betweenness referee mismatch:\n got=$gotPos\nwant=${want.take(30)}")
  }

  test("q143_fdr_bh: exact BigInt referee of the whole chain — " +
      "relabeled statistics, integer p-values, BH step-up — and the " +
      "rejected set is a prefix of the p-ascending ranking") {
    val reps = 100
    val base = util.t(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), round(col("value") * 100).cast("long"),
        expr("pmod(datediff(to_date(ts), date'1970-01-01'), 7)").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = BigInt(base.length); val sv = base.map(t => BigInt(t._2)).sum
    def stat(s: BigInt, c: BigInt): BigInt =
      ((s * (n - c)) - (sv - s) * c).abs
    val obs = base.groupBy(_._3).map { case (d, rows) =>
      d -> stat(rows.map(t => BigInt(t._2)).sum, rows.length)
    }
    val repStats = (1 to reps).flatMap { rep =>
      val byLab = base.groupBy { case (id, _, _) =>
        ((id % 2147483648L) * 2654435761L % 4294967296L +
          rep * 40503L) % 4294967296L % 7L
      }
      byLab.map { case (lab, rows) =>
        lab -> stat(rows.map(t => BigInt(t._2)).sum, rows.length)
      }
    }
    val pNum = obs.map { case (d, t) =>
      d -> (1 + repStats.count { case (l, tr) => l == d && tr >= t })
    }
    val ranked = pNum.toSeq.sortBy { case (d, p) => (p, d) }.zipWithIndex
      .map { case ((d, p), i) => (d, p, i + 1L) }
    val kmax = ranked.filter { case (_, p, k) => p * 140 <= k * (reps + 1) }
      .map(_._3).maxOption.getOrElse(0L)
    val got = operators.Analytics.q143FdrBh(spark, sf).collect()
    assert(got.length == 7)
    for (r <- got) {
      val d = r.getAs[Long]("dow")
      assert(r.getAs[Long]("t_obs") == obs(d), s"t_obs at dow=$d")
      assert(r.getAs[Long]("p_num") == pNum(d), s"p_num at dow=$d")
      val (_, _, k) = ranked.find(_._1 == d).get
      assert(r.getAs[Long]("rk") == k)
      assert(r.getAs[Long]("rejected") == (if (k <= kmax) 1L else 0L))
      assert(r.getAs[Long]("p_num") >= 1 && r.getAs[Long]("p_num") <= 101)
    }
    // step-up property: rejections are exactly ranks 1..kmax
    val rej = got.filter(_.getAs[Long]("rejected") == 1).map(_.getAs[Long]("rk"))
    assert(rej.sorted.toSeq == (1L to kmax).toSeq)
  }

  test("text_source_divergence: JSD is non-negative, bounded by ln 2, " +
      "covers all source pairs, and matches an in-JVM referee replaying " +
      "the committed per-bucket rounding") {
    val got = operators.TextAnalysis.sourceDivergence(spark, sf).collect()
    val sources = util.t(spark, sf, "documents")
      .select(col("source")).distinct().collect().map(_.getString(0))
    assert(got.length == sources.length * (sources.length - 1) / 2)
    for (r <- got) {
      val j = r.getAs[Double]("jsd_nats")
      assert(j >= -1e-4 && j <= math.log(2) + 1e-4, s"jsd=$j out of bounds")
    }
    // referee: rebuild (source, bucket) counts with the engine's own
    // bucket map, then replay the exact term arithmetic per pair
    val counts = util.t(spark, sf, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .withColumn("bucket", pmod(xxhash64(col("w")), lit(128L)))
      .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("c"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .toMap
    val totals = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (r <- got.take(20)) {
      val s1 = r.getAs[String]("s1"); val s2 = r.getAs[String]("s2")
      val n1 = totals(s1); val n2 = totals(s2)
      var sum = BigDecimal(0)
      for (bkt <- 0L until 128L) {
        val a = counts.getOrElse((s1, bkt), 0L)
        val b = counts.getOrElse((s2, bkt), 0L)
        val t1 = if (a > 0) r6((a.toDouble / n1) *
          math.log((2.0 * a * n2) / (a * n2 + b * n1).toDouble) / 2) else 0.0
        val t2 = if (b > 0) r6((b.toDouble / n2) *
          math.log((2.0 * b * n1) / (a * n2 + b * n1).toDouble) / 2) else 0.0
        sum += BigDecimal(t1) + BigDecimal(t2)
      }
      assert(math.abs(r.getAs[Double]("jsd_nats") - sum.toDouble) < 1e-9,
        s"JSD referee mismatch at ($s1,$s2)")
    }
  }

  test("sim_silhouette: per-vector referee replaying the exact micro-unit " +
      "recurrence from the index artifacts, bounds, and corpus " +
      "conservation") {
    val got = operators.Similarity.silhouette(spark, sf).collect()
    val nCorpus = util.t(spark, sf, "embeddings").count()
    assert(got.map(_.getAs[Long]("n_vecs")).sum == nCorpus)
    for (r <- got) {
      assert(r.getAs[Long]("mean_sil_micro") >= -1000000L &&
        r.getAs[Long]("mean_sil_micro") <= 1000000L)
      assert(r.getAs[Long]("min_sil_micro") >= -1000000L)
      val bp = r.getAs[Long]("neg_share_bp")
      assert(bp >= 0 && bp <= 10000)
    }
    // referee: recompute (a, b, s) per vector in-JVM from the same
    // centroids/assignment the engine used
    val root = operators.Similarity.ivfPqIndexRoot(spark, sf)
    val cents = spark.read.parquet(s"$root/coarse_raw").collect()
      .map(r => r.getAs[Int]("cid") ->
        r.getAs[Seq[Double]]("cv").toArray).toMap
    // stored assignment is multiprobe: candidates per vector
    val assignAll = spark.read.parquet(s"$root/assign_raw").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cid"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val vecs = util.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getAs[Seq[Double]](1).toArray)
    def cos6(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i) }
      BigDecimal(d / (math.sqrt(nx) * math.sqrt(ny)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = scala.collection.mutable.Map.empty[Int, (Long, Long, Long)]
      .withDefaultValue((0L, 0L, 0L)) // (n, sumS, nNeg)
    for ((id, v) <- vecs) {
      val ds = cents.view.mapValues(cv =>
        1000000L - math.rint(cos6(v, cv) * 1e6).toLong).toMap
      // primary = min (d, cid) over the stored candidates
      val own = assignAll(id).minBy(c => (ds(c), c))
      val a = ds(own)
      val b = ds.collect { case (c, d) if c != own => d }.min
      val m = math.max(a, b)
      val s = if (m > 0) Math.floorDiv((b - a + m) * 1000000L, m) - 1000000L
        else 0L
      val (n0, s0, g0) = want(own)
      want(own) = (n0 + 1, s0 + s, g0 + (if (s < 0) 1L else 0L))
    }
    for (r <- got) {
      val cid = r.getAs[Long]("cid").toInt
      val (n, sSum, nNeg) = want(cid)
      assert(r.getAs[Long]("n_vecs") == n, s"n at cid=$cid")
      assert(r.getAs[Long]("n_negative") == nNeg, s"n_negative at cid=$cid")
      val meanWant = Math.floorDiv(sSum + 1000000000000L * n, n) - 1000000000000L
      assert(r.getAs[Long]("mean_sil_micro") == meanWant, s"mean at cid=$cid")
      // faithfulness law: the stored primary IS the nearest list, so no
      // silhouette can be negative on this index
      assert(r.getAs[Long]("n_negative") == 0L,
        s"assignment drift detected at cid=$cid")
      assert(r.getAs[Long]("mean_sil_micro") >= 0L)
    }
  }

  test("graph_ktruss: sequential peel referee, monotone edge counts, " +
      "and a truthful convergence flag") {
    val got = operators.Graph.ktruss(spark, sf).collect()
    assert(got.length == 3)
    val edges0 = spark.read.parquet(
        s"${operators.Graph.tradeGraphRoot(spark, sf)}/cosupply")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def supportOf(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
        .withDefaultValue(Set.empty)
      for ((a, b) <- es) { adj(a) += b; adj(b) += a }
      es.map { case (a, b) => (a, b) -> (adj(a) & adj(b)).size.toLong }.toMap
    }
    val sup0 = supportOf(edges0)
    val t = sup0.values.sum / (2 * edges0.size) + 1
    var es = edges0
    for (r <- 1 to 3) {
      val sup = if (r == 1) sup0 else supportOf(es)
      val before = es.size
      es = es.filter(e => sup(e) >= t)
      val row = got(r - 1)
      assert(row.getAs[Long]("threshold") == t)
      assert(row.getAs[Long]("n_before") == before, s"round $r n_before")
      assert(row.getAs[Long]("n_edges") == es.size, s"round $r n_edges")
      assert(row.getAs[Long]("n_nodes") ==
        es.flatMap(e => Seq(e._1, e._2)).size, s"round $r n_nodes")
      assert(row.getAs[Long]("converged") ==
        (if (es.size == before) 1L else 0L), s"round $r converged")
      assert(row.getAs[Long]("n_edges") <= row.getAs[Long]("n_before"),
        "peel must be monotone")
    }
    // at a converged round, every survivor meets the threshold in the
    // survivor-induced graph
    if (got.last.getAs[Long]("converged") == 1L) {
      val supF = supportOf(es)
      assert(es.forall(e => supF(e) >= t), "non-truss edge survived")
    }
  }

  test("mm_image_histogram: bin counts conserve w*h per image (direct " +
      "decode referee), shares are bp-bounded, and the dominant bin is " +
      "the argmax under the committed total order") {
    import spark.implicits._
    val bins = operators.Multimodal.imageHistBins(spark, sf)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    // direct referee: re-decode every visual payload and re-count
    val media = operators.Multimodal.mediaTable(spark, sf)
      .filter(_.media_type != "audio").collect()
    assert(media.nonEmpty && bins.size == media.length)
    for (m <- media.take(30)) {
      val img = graft.functions.Ppm.decode(m.payload)
      val want = new Array[Long](8)
      var p = 0
      while (p < img.width * img.height * 3) {
        val luma = 299L * (img.pixels(p) & 0xff) +
          587L * (img.pixels(p + 1) & 0xff) + 114L * (img.pixels(p + 2) & 0xff)
        want((luma * 8 / 255001L).toInt) += 1
        p += 3
      }
      val gotB = bins(m.doc_id)
      for (b <- 0 until 8)
        assert(gotB.getOrElse(b, 0L) == want(b), s"doc ${m.doc_id} bin $b")
      assert(want.sum == img.width.toLong * img.height, "pixel conservation")
    }
    val rows = operators.Multimodal.imageHistogram(spark, sf).collect()
    for (r <- rows) {
      val doc = r.getAs[Long]("doc_id")
      val hb = bins(doc)
      assert(r.getAs[Long]("n_pixels") == hb.values.sum)
      val domWant = (0 until 8).maxBy(b => (hb.getOrElse(b, 0L), -b))
      assert(r.getAs[Long]("dominant_bin") == domWant, s"dominant at $doc")
      for (cname <- Seq("dominant_share_bp", "dark_share_bp", "bright_share_bp")) {
        val v = r.getAs[Long](cname)
        assert(v >= 0 && v <= 10000, s"$cname=$v at $doc")
      }
      assert(r.getAs[Long]("dominant_share_bp") >= 1250 - 1,
        "dominant bin cannot be below the uniform floor")
    }
  }

  test("graph_conductance: volume conservation (sum vol = 2m), cut " +
      "symmetry, per-community bounds, and community agreement with " +
      "the LPA histogram entry") {
    val got = operators.Graph.conductance(spark, sf).collect()
    val m = spark.read.parquet(
      s"${operators.Graph.tradeGraphRoot(spark, sf)}/backbone").count()
    assert(got.map(_.getAs[Long]("vol")).sum == 2 * m,
      "endpoint volumes must sum to 2m")
    // every cut edge is counted once from each of its two communities
    assert(got.map(_.getAs[Long]("cut_edges")).sum % 2 == 0)
    for (r <- got) {
      val vol = r.getAs[Long]("vol"); val cut = r.getAs[Long]("cut_edges")
      assert(cut <= vol, s"cut > vol at $r")
      if (!r.isNullAt(r.fieldIndex("phi_bp"))) {
        val phi = r.getAs[Long]("phi_bp")
        assert(phi >= 0 && phi <= 10000, s"phi=$phi out of range")
        // phi replays from its own row: cut*10000 div min(vol, 2m-vol)
        assert(phi == cut * 10000 / math.min(vol, 2 * m - vol))
      } else {
        assert(math.min(vol, 2 * m - vol) == 0, "NULL only on a zero side")
      }
    }
    val hist = operators.Graph.labelPropagation(spark, sf).collect()
      .map(r => r.getAs[Long]("community") -> r.getAs[Long]("n_members")).toMap
    val mine = got.map(r =>
      r.getAs[Long]("community") -> r.getAs[Long]("n_members")).toMap
    assert(mine == hist, "community partition must match the LPA entry")
  }

  test("q144_rolling_median: the lower median matches a sequential " +
      "referee on every (type, day) window, including warm-up days") {
    val daily = util.t(spark, sf, "events")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit(java.sql.Date.valueOf("1970-01-01")))
          .cast("long").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    val got = operators.Analytics.q144RollingMedian(spark, sf).collect()
    assert(got.length == daily.length, "one output row per (type, day)")
    for (r <- got) {
      val tp = r.getAs[String]("event_type"); val d = r.getAs[Long]("day_idx")
      val window = byType(tp).filter(x => x._2 >= d - 6 && x._2 <= d)
        .map(x => (x._3, x._2)).sorted
      assert(r.getAs[Long]("n_in_window") == window.length)
      val med = window((window.length + 1) / 2 - 1)._1
      assert(r.getAs[Long]("median_cents") == med,
        s"median referee at ($tp, $d)")
    }
  }

  test("sim_rocchio_feedback: both retrieval rounds match a sequential " +
      "in-JVM referee (exact float32 expansion), and the overlap flag " +
      "is truthful") {
    val vecs = util.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getAs[Seq[Double]](1).toArray)
      .toMap
    def cos6(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i) }
      BigDecimal(d / (math.sqrt(nx) * math.sqrt(ny)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def top5(qid: Long, qv: Array[Double]): Seq[(Long, Double)] =
      vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos6(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5)
    val got = operators.Similarity.rocchioFeedback(spark, sf).collect()
    assert(got.length == 20 * 5)
    for (qid <- 0L until 20L) {
      val r1 = top5(qid, vecs(qid)).map(_._1)
      val fb = Array.fill(64)(0.0)
      for (n <- r1; i <- 0 until 64) fb(i) += vecs(n)(i)
      val q2 = (0 until 64).map(i => vecs(qid)(i) + fb(i) / 10).toArray
      val r2 = top5(qid, q2)
      val mine = got.filter(_.getAs[Long]("q_id") == qid)
        .sortBy(_.getAs[Long]("rk"))
      for ((row, i) <- mine.zipWithIndex) {
        assert(row.getAs[Long]("neighbor_id") == r2(i)._1,
          s"round-2 neighbor at q=$qid rk=${i + 1}")
        assert(math.abs(row.getAs[Double]("cos2") - r2(i)._2) < 1e-9)
        assert(row.getAs[Long]("in_round1") ==
          (if (r1.contains(r2(i)._1)) 1L else 0L))
      }
    }
  }

  test("q145_interrupted_ts: BigInt referee of both segments' exact-" +
      "rational slope and level, and delta columns are differences of " +
      "the reported values") {
    val daily = util.t(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(datediff(to_date(col("ts")),
        lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val x0 = (daily.map(_._1).min + daily.map(_._1).max) / 2
    def fit(rows: Seq[(Long, Long)]): (BigInt, BigInt) = {
      val n = BigInt(rows.length)
      val sx = rows.map(r => BigInt(r._1)).sum
      val sy = rows.map(r => BigInt(r._2)).sum
      val sxy = rows.map(r => BigInt(r._1) * r._2).sum
      val sxx = rows.map(r => BigInt(r._1) * r._1).sum
      val nn = n * sxy - sx * sy
      val dd = n * sxx - sx * sx
      def shiftDiv(num: BigInt, den: BigInt, k: BigInt): BigInt =
        (num + k * den) / den - k
      val slope = shiftDiv(nn * 1000000, dd, BigInt(1000000000000L))
      val level = shiftDiv((sy * dd + nn * (n * x0 - sx)) * 1000000,
        n * dd, BigInt("10000000000000000"))
      (slope, level)
    }
    val (sPre, lPre) = fit(daily.filter(_._1 <= x0))
    val (sPost, lPost) = fit(daily.filter(_._1 > x0))
    val r = operators.Analytics.q145InterruptedTs(spark, sf).collect().head
    assert(r.getAs[Long]("break_day") == x0)
    assert(BigInt(r.getAs[Long]("slope_micro_pre")) == sPre)
    assert(BigInt(r.getAs[Long]("slope_micro_post")) == sPost)
    assert(BigInt(r.getAs[Long]("level_micro_pre")) == lPre)
    assert(BigInt(r.getAs[Long]("level_micro_post")) == lPost)
    assert(r.getAs[Long]("slope_delta_micro") ==
      r.getAs[Long]("slope_micro_post") - r.getAs[Long]("slope_micro_pre"))
    assert(r.getAs[Long]("jump_micro") ==
      r.getAs[Long]("level_micro_post") - r.getAs[Long]("level_micro_pre"))
  }

  test("meta_qq_drift: decile values match a sorted-halves referee and " +
      "the signed bp delta replays exactly") {
    val ev = util.t(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    def deciles(rows: Seq[(Long, Long)]): Map[Long, Long] = {
      val sorted = rows.sortBy(identity).map(_._1) // (v, id) order on v
      (1L to 9L).map { k =>
        val idx = math.max(1L, k * sorted.length / 10).toInt - 1
        k -> sorted(idx)
      }.toMap
    }
    val ref = deciles(ev.filter(_._2 <= mid).map(t => (t._3, t._1)))
    val cur = deciles(ev.filter(_._2 > mid).map(t => (t._3, t._1)))
    val got = operators.Warehouse.metaQqDrift(spark, sf).collect()
    assert(got.length == 9)
    for (r <- got) {
      val k = r.getAs[Long]("decile")
      assert(r.getAs[Long]("ref_value") == ref(k), s"ref decile $k")
      assert(r.getAs[Long]("cur_value") == cur(k), s"cur decile $k")
      assert(r.getAs[Long]("diff_cents") == cur(k) - ref(k))
      val bp = Math.floorDiv((cur(k) - ref(k)) * 10000, ref(k))
      assert(r.getAs[Long]("rel_diff_bp") == bp, s"bp at decile $k")
    }
  }

  test("q146_shift_share: the three effects plus the residual " +
      "reconstruct the revenue delta EXACTLY, and the residual sits in " +
      "the truncation bound (-n0, n1)") {
    val rows = operators.Analytics.q146ShiftShare(spark, sf).collect()
    assert(rows.length == 5, "five order priorities")
    for (r <- rows) {
      val dRev = BigInt(r.getAs[Long]("rev1")) - r.getAs[Long]("rev0")
      val sum = BigInt(r.getAs[Long]("volume_effect_micro")) +
        r.getAs[Long]("rate_effect_micro") +
        r.getAs[Long]("interaction_micro") +
        r.getAs[Long]("residual_micro")
      assert(sum == dRev * 1000000, s"decomposition identity at $r")
      val res = r.getAs[Long]("residual_micro")
      assert(res > -r.getAs[Long]("n0") && res < r.getAs[Long]("n1"),
        s"residual $res outside truncation bound at $r")
      // rate replay
      assert(r.getAs[Long]("rate0_micro") ==
        (BigInt(r.getAs[Long]("rev0")) * 1000000 / r.getAs[Long]("n0")))
      assert(r.getAs[Long]("rate1_micro") ==
        (BigInt(r.getAs[Long]("rev1")) * 1000000 / r.getAs[Long]("n1")))
    }
  }

  test("mm_audio_haar_bands: Parseval-style energy consistency against " +
      "a direct decode referee, and band laws (lo+hi reconstructs the " +
      "pairwise energy up to the committed halving truncation)") {
    import spark.implicits._
    val frames = operators.Multimodal.audioBandFrames(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val media = operators.Multimodal.mediaTable(spark, sf)
      .filter(_.media_type == "audio").collect()
    assert(frames.keySet == media.map(_.doc_id).toSet)
    for (m <- media.take(10)) {
      val a = graft.functions.Wav.decode(m.payload)
      val want = a.samples.grouped(160).zipWithIndex.map { case (fr, i) =>
        var lo = 0L; var hi = 0L; var j = 0
        while (j + 1 < fr.length) {
          val l = (fr(j).toLong + fr(j + 1)) / 2
          val h = (fr(j).toLong - fr(j + 1)) / 2
          lo += l * l; hi += h * h; j += 2
        }
        val np = math.max(1L, fr.length / 2)
        (i.toLong, lo / np, hi / np)
      }.toSeq
      val got = frames(m.doc_id).map(t => (t._2, t._3, t._4)).toSeq
      assert(got == want.toSeq, s"band frames mismatch at doc ${m.doc_id}")
      // Haar identity: l² + h² = (a²+b²)/2 exactly when a+b and a−b share
      // parity (always — same parity sum/diff), up to the div-2 floor on
      // each of l and h; check the reconstructed energy stays within the
      // truncation envelope on one frame
      val fr = a.samples.take(160)
      var exact = 0L; var banded = 0L; var j = 0
      while (j + 1 < fr.length) {
        exact += (fr(j).toLong * fr(j) + fr(j + 1).toLong * fr(j + 1)) / 2
        val l = (fr(j).toLong + fr(j + 1)) / 2
        val h = (fr(j).toLong - fr(j + 1)) / 2
        banded += l * l + h * h
        j += 2
      }
      assert(banded <= exact && exact - banded <= fr.length.toLong *
        (math.abs(fr.map(_.toInt).max) + 1),
        s"Haar energy envelope at doc ${m.doc_id}")
    }
    val rows = operators.Multimodal.audioHaarBands(spark, sf).collect()
    for (r <- rows) {
      for (c <- Seq("clip_hi_share_bp", "rough_share_bp", "max_hi_share_bp"))
        assert(r.getAs[Long](c) >= 0 && r.getAs[Long](c) <= 10000)
      assert(r.getAs[Long]("rough_frames") <= r.getAs[Long]("n_frames"))
    }
  }

  test("sim_centroid_eval: in-JVM nearest-centroid referee (exact " +
      "9-dp centroid grid), margin conservation, and F1 between its " +
      "precision/recall bounds") {
    val vecs = util.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("label").cast("long"),
        col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Seq[Double]](2).toArray))
    // centroids on the committed 9-dp grid, decimal-exact means
    val cents = vecs.groupBy(_._2).view.mapValues { vs =>
      val n = vs.length
      (0 until 64).map { i =>
        val s = vs.map(v => BigDecimal(v._3(i)).setScale(12,
          BigDecimal.RoundingMode.HALF_UP)).sum
        BigDecimal(s.toDouble / n)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toArray
    }.toMap
    def cos6(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i) }
      BigDecimal(d / (math.sqrt(nx) * math.sqrt(ny)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val preds = vecs.map { case (_, label, v) =>
      val p = cents.toSeq.map { case (l, cv) => (l, cos6(v, cv)) }
        .minBy { case (l, c) => (-c, l) }._1
      (label, p)
    }
    val got = operators.Similarity.centroidEval(spark, sf).collect()
    assert(got.map(_.getAs[Long]("n_true")).sum == vecs.length)
    assert(got.map(_.getAs[Long]("n_pred")).sum == vecs.length)
    for (r <- got) {
      val l = r.getAs[Long]("label")
      assert(r.getAs[Long]("n_true") == preds.count(_._1 == l), s"n_true $l")
      assert(r.getAs[Long]("n_pred") == preds.count(_._2 == l), s"n_pred $l")
      assert(r.getAs[Long]("tp") == preds.count(p => p._1 == l && p._2 == l),
        s"tp $l")
      val p = r.getAs[Long]("precision_bp"); val rc = r.getAs[Long]("recall_bp")
      val f1 = r.getAs[Long]("f1_bp")
      assert(f1 <= math.max(p, rc) && (p.min(rc) == 0 || f1 >= p.min(rc) - 1),
        s"F1 $f1 outside [$p, $rc] envelope at $l")
    }
  }

  test("text_lexical_diversity: per-doc referee from a direct tokenize, " +
      "TTR/hapax bounds, and Guiraud replay") {
    val docs = util.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = operators.TextAnalysis.lexicalDiversity(spark, sf).collect()
    assert(got.length == docs.size)
    for (r <- got.take(50)) {
      val id = r.getAs[Long]("doc_id")
      val toks = docs(id).split(" ", -1)
      val counts = toks.groupBy(identity).view.mapValues(_.length).toMap
      assert(r.getAs[Long]("n_tokens") == toks.length, s"tokens at $id")
      assert(r.getAs[Long]("n_types") == counts.size, s"types at $id")
      assert(r.getAs[Long]("hapax") == counts.values.count(_ == 1))
      assert(r.getAs[Long]("ttr_bp") ==
        counts.size.toLong * 10000 / toks.length)
      val g = BigDecimal(counts.size / math.sqrt(toks.length.toDouble))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("guiraud") - g) < 1e-9)
      assert(r.getAs[Long]("ttr_bp") <= 10000)
      assert(r.getAs[Long]("hapax_share_bp") <= 10000)
    }
  }

  test("q147_decomp_strength: BigInt variance referee over the q140 " +
      "components and strengths bounded in [0, 10000]") {
    val comp = operators.Analytics.q140SeasonalDecompose(spark, sf)
      .collect().filter(!_.isNullAt(3))
      .map(r => (r.getAs[Long]("remainder_cents"),
        r.getAs[Long]("seasonal_cents") + r.getAs[Long]("remainder_cents"),
        r.getAs[Long]("trend_cents") + r.getAs[Long]("remainder_cents")))
    val n = BigInt(comp.length)
    def varNum(xs: Seq[Long]): BigInt = {
      val s = xs.map(BigInt(_)).sum
      n * xs.map(x => BigInt(x) * x).sum - s * s
    }
    val vr = varNum(comp.map(_._1))
    val vsr = varNum(comp.map(_._2))
    val vtr = varNum(comp.map(_._3))
    val r = operators.Analytics.q147DecompStrength(spark, sf).collect().head
    assert(r.getAs[Long]("n_full") == comp.length)
    def strength(num: BigInt): Long =
      (BigInt(10000) - vr * 10000 / num).max(BigInt(0)).toLong
    assert(r.getAs[Long]("seas_strength_bp") == strength(vsr))
    assert(r.getAs[Long]("trend_strength_bp") == strength(vtr))
    for (c <- Seq("seas_strength_bp", "trend_strength_bp")) {
      val v = r.getAs[Long](c)
      assert(v >= 0 && v <= 10000, s"$c=$v")
    }
    assert(math.abs(r.getAs[Double]("var_r_scaled") - vr.toDouble) <
      math.abs(vr.toDouble) * 1e-12 + 1)
  }

  test("sim_geometry_audit: anisotropy/norm referee in-JVM and decile " +
      "ordering p10 <= p50 <= p90") {
    val vecs = util.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getAs[Seq[Double]](1).toArray)
    val n = vecs.length
    val mean = (0 until 64).map { i =>
      val s = vecs.map(v => BigDecimal(v._2(i)).setScale(12,
        BigDecimal.RoundingMode.HALF_UP)).sum
      BigDecimal(s.toDouble / n)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toArray
    def cos6(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i) }
      BigDecimal(d / (math.sqrt(nx) * math.sqrt(ny)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val r = operators.Similarity.geometryAudit(spark, sf).collect().head
    assert(r.getAs[Long]("n_vectors") == n)
    // davg referee: decimal(22,8) exact sum of the 6-dp cosines / n
    val csum = vecs.map(v => BigDecimal(cos6(v._2, mean)).setScale(8,
      BigDecimal.RoundingMode.HALF_UP)).sum
    val aniso = BigDecimal(csum.toDouble).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble / n
    assert(math.abs(r.getAs[Double]("anisotropy") - aniso) < 1e-9,
      s"anisotropy ${r.getAs[Double]("anisotropy")} vs $aniso")
    val p10 = r.getAs[Long]("norm_p10_micro")
    val p50 = r.getAs[Long]("norm_p50_micro")
    val p90 = r.getAs[Long]("norm_p90_micro")
    assert(p10 <= p50 && p50 <= p90, s"deciles out of order: $p10 $p50 $p90")
    val norms = vecs.map { case (_, v) =>
      math.rint(math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x)) * 1e6).toLong
    }.sorted
    assert(p50 == norms(math.max(1, n / 2) - 1), "median norm referee")
  }

  test("meta_price_points: chi-square referee over the full 100-ending " +
      "histogram and top-10 ordering") {
    val ends = util.t(spark, sf, "part")
      .select(pmod(round(col("p_retailprice") * 100).cast("long"),
        lit(100L)))
      .collect().map(_.getLong(0))
    val counts = (0L until 100L).map(e =>
      e -> ends.count(_ == e).toLong).toMap
    val n = BigInt(ends.length)
    val chi2 = counts.values.map { o =>
      val d = BigInt(100) * o - n; d * d
    }.sum * 1000000 / (100 * n)
    val got = operators.Warehouse.metaPricePoints(spark, sf).collect()
    assert(got.length == 10)
    assert(BigInt(got.head.getAs[Long]("chi2_micro")) == chi2)
    val wantTop = counts.toSeq.sortBy { case (e, o) => (-o, e) }.take(10)
    for ((r, (e, o)) <- got.zip(wantTop)) {
      assert(r.getAs[Long]("ending") == e && r.getAs[Long]("cnt") == o,
        s"top-10 mismatch at $r vs ($e,$o)")
      assert(r.getAs[Long]("share_bp") == o * 10000 / ends.length)
    }
  }

  test("q148_activity_heatmap: full 168-cell grid, count conservation, " +
      "exactly one peak at the true argmax") {
    val got = operators.Analytics.q148ActivityHeatmap(spark, sf).collect()
    assert(got.length == 7 * 24)
    val nEvents = util.t(spark, sf, "events").count()
    assert(got.map(_.getAs[Long]("cnt")).sum == nEvents)
    val peaks = got.filter(_.getAs[Long]("is_peak") == 1)
    assert(peaks.length == 1)
    val maxCnt = got.map(_.getAs[Long]("cnt")).max
    val wantPeak = got.filter(_.getAs[Long]("cnt") == maxCnt)
      .minBy(r => (r.getAs[Long]("dow"), r.getAs[Long]("hr")))
    assert(peaks.head.getAs[Long]("dow") == wantPeak.getAs[Long]("dow") &&
      peaks.head.getAs[Long]("hr") == wantPeak.getAs[Long]("hr"))
    for (r <- got) {
      assert(r.getAs[Long]("share_bp") <= 10000)
      assert(r.getAs[Long]("purchase_rate_bp") <= 10000)
    }
  }

  test("pipeline_quota_apportionment: quotas conserve the budget " +
      "EXACTLY, every quota is within 1 of its exact share, and the " +
      "extra seats go to the largest remainders") {
    val got = operators.Sampling.quotaApportionment(spark, sf).collect()
    val B = 1000L
    assert(got.map(_.getAs[Long]("quota")).sum == B,
      "largest-remainder apportionment must conserve the budget exactly")
    val tw = got.map(r => BigInt(r.getAs[Long]("mass"))).sum
    for (r <- got) {
      val exact = BigInt(B) * r.getAs[Long]("mass") // over tw
      val fl = (exact / tw).toLong
      assert(r.getAs[Long]("floor_quota") == fl)
      assert(r.getAs[Long]("remainder") == (exact % tw).toLong)
      val q = r.getAs[Long]("quota")
      assert(q == fl || q == fl + 1, s"quota $q outside [floor, floor+1]")
    }
    // extras are exactly the top-r remainders under (remainder desc, source)
    val sorted = got.sortBy(r =>
      (-r.getAs[Long]("remainder"), r.getAs[String]("source")))
    val rSeats = B - got.map(_.getAs[Long]("floor_quota")).sum
    assert(sorted.take(rSeats.toInt).forall(_.getAs[Long]("extra") == 1))
    assert(sorted.drop(rSeats.toInt).forall(_.getAs[Long]("extra") == 0))
  }

  test("q149_conversion_ab: BigInt chi-square referee on the fourfold " +
      "table, margin conservation, and the z-squared identity") {
    val ev = util.t(spark, sf, "events")
      .select(unix_micros(col("ts")),
        (col("event_type") === "purchase").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mid = (ev.map(_._1).min + ev.map(_._1).max) / 2
    val a = ev.count(e => e._1 <= mid && e._2 == 1).toLong
    val b = ev.count(e => e._1 <= mid && e._2 == 0).toLong
    val c = ev.count(e => e._1 > mid && e._2 == 1).toLong
    val d = ev.count(e => e._1 > mid && e._2 == 0).toLong
    val r = operators.Analytics.q149ConversionAb(spark, sf).collect().head
    assert(r.getAs[Long]("conv_pre") == a && r.getAs[Long]("nonconv_pre") == b)
    assert(r.getAs[Long]("conv_post") == c && r.getAs[Long]("nonconv_post") == d)
    val n = BigInt(a + b + c + d)
    val det = BigInt(a) * d - BigInt(b) * c
    val chi2 = n * det * det * 1000000 /
      (BigInt(a + b) * (c + d) * (a + c) * (b + d))
    assert(BigInt(r.getAs[Long]("chi2_micro")) == chi2)
    assert(r.getAs[Long]("rate_pre_micro") == a * 1000000L / (a + b))
    assert(r.getAs[Long]("rate_post_micro") == c * 1000000L / (c + d))
    assert(r.getAs[Long]("rate_delta_micro") ==
      r.getAs[Long]("rate_post_micro") - r.getAs[Long]("rate_pre_micro"))
    // z² identity sanity: chi2 approximates (Δp)²·pooled-variance⁻¹;
    // here just pin sign coherence — a larger |Δp| with these margins
    // cannot yield chi2 = 0 unless Δ rounds to 0
    if (r.getAs[Long]("rate_delta_micro") == 0)
      assert(chi2 < 3841000, "flat rates cannot be significant")
    assert(r.getAs[Long]("significant") ==
      (if (chi2 > 3841000) 1L else 0L))
  }

  test("graph_powerlaw_alpha: Hill referee from the raw degree table " +
      "and alpha > 1 whenever a non-degenerate tail exists") {
    val deg = spark.read.parquet(
        s"${operators.Graph.tradeGraphRoot(spark, sf)}/symdeg")
      .select(col("src"), col("d")).distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val n = deg.length.toLong
    val meanDeg = deg.map(_._2).sum / n
    val dMin = meanDeg * 2
    val tail = deg.map(_._2).filter(_ >= dMin)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sumLn = tail.map(d => BigDecimal(r6(math.log(d.toDouble / dMin))))
      .sum.toDouble
    val r = operators.Graph.powerlawAlpha(spark, sf).collect().head
    assert(r.getAs[Long]("n_nodes") == n)
    assert(r.getAs[Long]("mean_degree") == meanDeg)
    assert(r.getAs[Long]("d_min") == dMin)
    assert(r.getAs[Long]("n_tail") == tail.length)
    assert(math.abs(r.getAs[Double]("sum_ln") - sumLn) < 1e-9)
    if (sumLn > 0) {
      val alpha = r6(1.0 + tail.length / sumLn)
      assert(math.abs(r.getAs[Double]("alpha") - alpha) < 1e-9)
      assert(r.getAs[Double]("alpha") > 1.0, "Hill alpha is > 1 by form")
    } else assert(r.isNullAt(r.fieldIndex("alpha")))
  }

  test("meta_power_analysis: BigInt sizing referee, the ceiling " +
      "property (n_required-1 would under-power), and MDE monotonicity") {
    val got = operators.Warehouse.metaPowerAnalysis(spark, sf).collect()
    assert(got.length == 3)
    val n = util.t(spark, sf, "events").count()
    val conv = util.t(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    val p = conv * 1000000L / n
    val pq = BigInt(p) * (1000000L - p)
    for (r <- got) {
      assert(r.getAs[Long]("p_micro") == p)
      assert(r.getAs[Long]("n_per_arm") == n / 2)
      val mde = BigInt(r.getAs[Long]("mde_target_micro"))
      val den = BigInt(1000000) * mde * mde
      val num = 2 * pq * 7848879
      val want = (num + den - 1) / den
      assert(BigInt(r.getAs[Long]("n_required")) == want)
      // ceiling property: n_required satisfies the inequality and
      // n_required - 1 does not (unless num divides exactly)
      assert(want * den >= num)
      assert((want - 1) * den < num)
      assert(r.getAs[Long]("feasible") ==
        (if (want <= n / 2) 1L else 0L))
      val cur = r.getAs[Long]("current_mde_micro")
      val curWant = math.round(math.sqrt(
        num.toDouble / (BigInt(1000000) * (n / 2)).toDouble))
      assert(cur == curWant, s"current MDE $cur vs $curWant")
    }
    // smaller target MDE must require more samples
    val byMde = got.sortBy(-_.getAs[Long]("mde_target_micro"))
      .map(_.getAs[Long]("n_required"))
    assert(byMde.sorted.toSeq == byMde.toSeq, "n_required must increase " +
      "as the target MDE shrinks")
  }

  test("q150_dispersion: BigInt moment referee, the exact n-cancellation " +
      "identity, and a truthful non-Poisson flag") {
    val counts = util.t(spark, sf, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)))
      .collect().map(_.getLong(1))
    val n = BigInt(counts.length)
    val tot = BigInt(counts.sum)
    val ss = counts.map(c => BigInt(c) * c).sum
    val dMicro = (n * ss - tot * tot) * 1000000 / (n * tot)
    val r = operators.Analytics.q150Dispersion(spark, sf).collect().head
    assert(r.getAs[Long]("n_orders") == counts.length)
    assert(r.getAs[Long]("total_lines") == counts.sum)
    assert(BigInt(r.getAs[Long]("d_micro")) == dMicro)
    assert(r.getAs[Long]("min_lines") == counts.min)
    assert(r.getAs[Long]("max_lines") == counts.max)
    val modeWant = counts.groupBy(identity).toSeq
      .maxBy { case (c, v) => (v.length, -c) }._1
    assert(r.getAs[Long]("mode_lines") == modeWant)
    val thr = math.round(2000000 *
      math.sqrt(2.0 / (counts.length - 1).toDouble))
    assert(r.getAs[Long]("threshold_micro") == thr)
    assert(r.getAs[Long]("non_poisson") ==
      (if ((dMicro - 1000000).abs > thr) 1L else 0L))
  }

  test("meta_gini_segments: BigInt rank-formula referee per segment, " +
      "bounds [0, 10000), and equal-values => 0 identity") {
    val raw = util.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val got = operators.Warehouse.metaGiniSegments(spark, sf).collect()
    assert(got.length == 5)
    for (r <- got) {
      val seg = r.getAs[String]("seg")
      val vs = raw.filter(_._2 == seg).sortBy(t => (t._3, t._1)).map(_._3)
      val n = BigInt(vs.length)
      val tot = vs.map(BigInt(_)).sum
      val iv = vs.zipWithIndex.map { case (v, i) => BigInt(i + 1) * v }.sum
      val gini = (2 * iv - (n + 1) * tot) * 10000 / (n * tot)
      assert(r.getAs[Long]("n") == vs.length)
      assert(BigInt(r.getAs[Long]("total_cents")) == tot)
      assert(BigInt(r.getAs[Long]("gini_bp")) == gini, s"gini at $seg")
      assert(r.getAs[Long]("gini_bp") >= 0 &&
        r.getAs[Long]("gini_bp") < 10000)
    }
    // identity: equal values give exactly zero by the rank formula
    val eq = Seq.fill(7)(100L)
    val ivEq = eq.zipWithIndex.map { case (v, i) => BigInt(i + 1) * v }.sum
    assert(2 * ivEq - BigInt(8) * eq.sum == 0)
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
