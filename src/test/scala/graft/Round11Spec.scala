package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 pins: in-JVM sequential referees for the new exact-integer
  * analytics entries — MATCH_RECOGNIZE-style V patterns, Pareto/ABC,
  * EWMA, KS drift, rank-sum AUC, PMI collocations, and the
  * leakage-safe temporal split. Every referee recomputes the answer
  * from raw rows with plain Scala arithmetic (no Spark, no SQL), so a
  * pass means Spark and DuckDB agree with a THIRD independent
  * implementation, not just with each other.
  */
class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  /** Exact epoch micros — `getTime` alone truncates to millis, and the
    * events table carries real sub-millisecond precision. */
  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  test("q90 pattern match: sequential V-pattern referee agrees row-for-row") {
    val rows = util.t(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), round(col("l_extendedprice") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime, r.getLong(2),
        r.getInt(3).toLong, r.getLong(4))))
    val expect = rows.groupBy(_._1).flatMap { case (p, g) =>
      val cents = g.map(_._2).sortBy(t => (t._1, t._2, t._3)).map(_._4)
      // sequential scan: direction runs, bottoms, depths
      val dirs = cents.indices.map { i =>
        if (i == 0) 0
        else if (cents(i) > cents(i - 1)) 1
        else if (cents(i) < cents(i - 1)) -1 else 0
      }
      var nV = 0L; var maxFall = 0L; var maxRise = 0L; var deepest = 0L
      var runLen = 0L; var runStartPeak = 0L
      dirs.indices.foreach { i =>
        if (i > 0 && dirs(i) == dirs(i - 1)) runLen += 1
        else { runLen = 1; runStartPeak = if (i > 0) cents(i - 1) else 0L }
        if (dirs(i) == -1 && runLen > maxFall) maxFall = runLen
        if (dirs(i) == 1 && runLen > maxRise) maxRise = runLen
        if (dirs(i) == -1 && i + 1 < dirs.length && dirs(i + 1) == 1) {
          nV += 1
          val drop = runStartPeak - cents(i)
          if (drop > deepest) deepest = drop
        }
      }
      if (nV >= 1) Some(p -> (nV, maxFall, maxRise, deepest)) else None
    }
    val got = SparkEntry.queries("q90_pattern_match")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got.keySet == expect.keySet,
      s"part sets differ: +${got.keySet -- expect.keySet} -${expect.keySet -- got.keySet}")
    expect.foreach { case (p, e) =>
      assert(got(p) == e, s"part $p: got ${got(p)}, referee $e")
    }
  }

  test("q91 pareto: sequential exact-decimal ABC referee agrees") {
    val rev = util.t(spark, sf, "lineitem").collect()
      .map(r => (r.getLong(1), // l_partkey
        BigDecimal(r.getDouble(5) * (1 - r.getDouble(6)))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = rev.values.sum
    val ordered = rev.toSeq.sortBy { case (p, r) => (-r, p) }
    var cum = BigDecimal(0)
    val classed = ordered.map { case (p, r) =>
      cum += r
      val c = if (cum * 100 <= total * 80) "A"
      else if (cum * 100 <= total * 95) "B" else "C"
      (c, r)
    }
    val expect = classed.groupBy(_._1).view.mapValues { g =>
      (g.size.toLong,
        g.map(_._2).sum.setScale(4, BigDecimal.RoundingMode.HALF_UP))
    }.toMap
    val got = SparkEntry.queries("q91_pareto_abc")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
      .toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (c, e) =>
      assert(got(c) == e, s"class $c: got ${got(c)}, referee $e")
    }
    // the defining Pareto property: class A really is the minimal head
    // whose cumulative share covers ≤ 80 % — its share is ≤ 80 % and
    // adding the first B part would push past it
    val aRev = classed.filter(_._1 == "A").map(_._2).sum
    val firstB = classed.find(_._1 == "B").map(_._2).getOrElse(BigDecimal(0))
    assert(aRev * 100 <= total * 80, "A exceeds the 80% budget")
    assert((aRev + firstB) * 100 > total * 80,
      "A is not maximal: the next part still fits under 80%")
  }

  test("q92 ewma: sequential integer half-life referee agrees") {
    val ev = util.t(spark, sf, "events").collect()
      .map(r => (r.getLong(2), micros(r.getTimestamp(1)), r.getLong(0),
        math.round(r.getDouble(4) * 100)))
    val expect = ev.groupBy(_._1).map { case (u, g) =>
      val recent = g.sortBy(t => (-t._2, -t._3)).take(20)
      val ewma = recent.zipWithIndex.map { case ((_, _, _, c), j) =>
        (c * 1000000L) / (2L << j)
      }.sum
      u -> (recent.size.toLong, ewma)
    }
    val got = SparkEntry.queries("q92_ewma_halflife")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect, s"ewma mismatch: ${got.toSeq.diff(expect.toSeq).take(3)}")
  }

  test("meta_drift_ks: sequential ECDF referee agrees; D on the micro grid") {
    val ev = util.t(spark, sf, "events").collect()
      .map(r => (r.getString(3), math.round(r.getDouble(4) * 100),
        r.getTimestamp(1).getTime / 86400000L))
    val days = ev.map(_._3)
    val cutoff = (days.min + days.max + 1) / 2
    val expect = ev.groupBy(_._1).map { case (et, g) =>
      val a = g.filter(_._3 < cutoff).map(_._2)
      val b = g.filter(_._3 >= cutoff).map(_._2)
      val vals = g.map(_._2).distinct.sorted
      var best = (-1L, 0L)
      vals.foreach { v =>
        val d = math.abs(a.count(_ <= v) * 1000000L / math.max(a.size, 1) -
          b.count(_ <= v) * 1000000L / math.max(b.size, 1))
        if (d > best._1) best = (d, v)
      }
      et -> (a.size.toLong, b.size.toLong, best._1, best._2)
    }
    val got = SparkEntry.queries("meta_drift_ks")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == expect, s"ks mismatch: got $got\nreferee $expect")
    got.values.foreach { case (_, _, ks, _) =>
      assert(ks >= 0 && ks <= 1000000, s"D=$ks off the [0,1e6] micro grid")
    }
  }

  test("meta_auc_ranksum: quadratic pair-count referee agrees") {
    val ev = util.t(spark, sf, "events").collect()
      .map(r => (r.getString(3), math.round(r.getDouble(4) * 100)))
    val pos = ev.filter(_._1 == "purchase").map(_._2)
    val expect = ev.filter(_._1 != "purchase").groupBy(_._1).map {
      case (nt, g) =>
        val neg = g.map(_._2)
        // the definition itself: count wins twice, ties once
        val u2 = pos.iterator.map { p =>
          2L * neg.count(_ < p) + neg.count(_ == p)
        }.sum
        nt -> (pos.size.toLong, neg.size.toLong, u2,
          u2 * 1000000L / (2L * pos.size * neg.size))
    }
    val got = SparkEntry.queries("meta_auc_ranksum")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == expect, s"auc mismatch: got $got\nreferee $expect")
  }

  test("text_pmi: sequential bigram referee confirms counts and top-50 order") {
    val docs = util.t(spark, sf, "documents").collect()
      .map(_.getString(1).split(" ", -1).toSeq)
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTok = docs.map(_.size).sum.toLong
    val pairs = docs.filter(_.size >= 2)
      .flatMap(ws => ws.sliding(2).map(s => (s(0), s(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 5)
    val scored = pairs.toSeq.map { case ((w1, w2), cxy) =>
      (w1, w2, cxy, uni(w1), uni(w2),
        cxy * nTok * 1000000L / (uni(w1) * uni(w2)))
    }.sortBy(t => (-t._6, t._1, t._2)).take(50)
    val got = SparkEntry.queries("text_pmi_collocations")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == scored,
      s"pmi top-50 mismatch: first diff ${got.zip(scored).find(p => p._1 != p._2)}")
  }

  test("join elimination: declared PK-FK join vanishes from the plan; undeclared stays") {
    import org.apache.spark.sql.functions._
    val fact = util.t(spark, sf, "lineitem")
    val dim = util.t(spark, sf, "orders")
    def joins(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
    // queryExecution memoizes the optimized plan, so every probe must
    // BUILD A FRESH DataFrame — a frame planned before registration
    // would keep its join forever
    def joined() = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), util.dsum(col("l_extendedprice")).as("s"))
      .orderBy(col("l_returnflag"))
    val c = plans.JoinElimination.FkConstraint(
      s"$sf/orders.parquet", "o_orderkey",
      s"$sf/lineitem.parquet", "l_orderkey")
    // this dir's constraint may ALREADY be live: q93_join_elimination
    // registers it as a construction side effect (persistent by
    // design), and any suite that builds q93 first — the r13
    // registry-wide plan gate does — would otherwise make probe 1
    // order-sensitive
    plans.JoinElimination.unregister(c)
    // 1. without a declaration the rule is inert
    assert(joins(joined()) == 1, "undeclared join must survive")
    val baseline = joined().collect().toSeq
    // 2. with the RELY constraint declared, the join is eliminated
    plans.JoinElimination.register(c)
    try {
      assert(joins(joined()) == 0, "declared PK-FK join must be eliminated")
      assert(joined().collect().toSeq == baseline,
        "elimination changed the answer")
      // 3. negative control: consuming a real dimension column keeps
      // the join — elimination is only legal when the dim side was
      // pruned to its bare PK
      val consuming = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(util.dsum(col("o_totalprice")).as("s"))
      assert(joins(consuming) == 1, "join consuming o_totalprice must survive")
      // 4. the projected-key case: selecting o_orderkey itself is
      // served by the FK alias, join still gone, values identical
      def keyOnly() = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey")).groupBy().agg(sum(col("o_orderkey")).as("s"))
      plans.JoinElimination.unregister(c)
      val want = keyOnly().collect().head.getLong(0)
      plans.JoinElimination.register(c)
      assert(joins(keyOnly()) == 0, "pk-projection join must be eliminated")
      assert(keyOnly().collect().head.getLong(0) == want,
        "pk values must be served by the FK alias")
    } finally plans.JoinElimination.unregister(c)
  }

  test("branch refs: isolation, orphan unreachability, ff-only merges") {
    import sources.FileSources._
    import spark.implicits._
    val root = util.scratchDir("branch_spec")
    def df(ids: Int*) = ids.toSeq.toDF("id")
    // main: v1(1,2); etl forks, commits v2(3); main is isolated
    writeRef(root, "main", commitVersion(root, "a", df(1, 2), parent = 0))
    writeRef(root, "etl", readRef(root, "main"))
    writeRef(root, "etl", commitVersion(root, "b", df(3), parent = readRef(root, "etl")))
    def ids(ref: String): Set[Int] =
      snapshotAt(spark, root, readRef(root, ref)).collect().map(_.getInt(0)).toSet
    assert(ids("main") == Set(1, 2), "main must not see unmerged branch commits")
    assert(ids("etl") == Set(1, 2, 3))
    // a second branch diverges: hotfix commits v3 off v1 — now etl's
    // head is NOT fast-forwardable onto hotfix and vice versa
    writeRef(root, "hotfix", readRef(root, "main"))
    writeRef(root, "hotfix", commitVersion(root, "c", df(9), parent = readRef(root, "hotfix")))
    intercept[IllegalArgumentException] {
      ffMerge(root, "hotfix", "etl") // hotfix@3 not an ancestor of etl@2
    }
    // ff merge etl → main: pointer move only, content adopts the branch
    ffMerge(root, "main", "etl")
    assert(ids("main") == Set(1, 2, 3))
    // drop hotfix: its commit becomes an orphan — on no ref's chain
    writeRef(root, "hotfix", readRef(root, "main"))
    val reachable = ancestors(root, readRef(root, "main")) ++
      ancestors(root, readRef(root, "etl")) ++ ancestors(root, readRef(root, "hotfix"))
    val all = new java.io.File(s"$root/_versions").listFiles()
      .map(_.getName.stripPrefix("v").stripSuffix(".json").toInt).toSet
    assert((all -- reachable.toSet) == Set(3),
      "the dropped branch's commit must be exactly the orphan set")
    assert(!ids("main").contains(9) && !ids("etl").contains(9),
      "no reader can reach the orphaned commit's data")
  }

  test("audio zcr: plain-Scala feature referee agrees; classes partition frames") {
    // third implementation: same synth chain, sequential ZCR/energy +
    // classification, NO Spark and NO sidecar on the path
    val docs = util.t(spark, sf, "documents")
      .filter(col("doc_id") % 3 === 1).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.map { case (id, text) =>
      val samples = text.split(" ").grouped(8).flatMap { cArr =>
        val c = cArr.mkString(" ")
        val a = functions.Wav.synth(c)
        if ((scala.util.hashing.MurmurHash3.stringHash(c) & 1) == 0)
          a.samples.map(s => (s >> 8).toShort)
        else a.samples
      }.toArray
      val frames = samples.grouped(160).toSeq
      val feats = frames.map { fr =>
        val zc = fr.indices.drop(1).count(j => (fr(j) >= 0) != (fr(j - 1) >= 0)).toLong
        val en = fr.map(s => math.abs(s.toInt).toLong).sum / fr.length
        (zc, en)
      }
      val cls = feats.map { case (zc, en) =>
        if (en <= operators.Multimodal.vadEnergyFloor) "silence"
        else if (zc > operators.Multimodal.zcrFricativeFloor) "unvoiced"
        else "voiced"
      }
      id -> (feats.size.toLong, cls.count(_ == "voiced").toLong,
        cls.count(_ == "unvoiced").toLong, cls.count(_ == "silence").toLong,
        feats.map(_._1).max)
    }.toMap
    val got = SparkEntry.queries("mm_audio_zcr")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == expect, s"zcr mismatch: ${got.toSeq.diff(expect.toSeq).take(2)}")
    got.values.foreach { case (n, v, u, s, _) =>
      assert(v + u + s == n, "classes must partition the frames")
    }
  }

  test("readability: sequential FK-grade referee agrees on every doc") {
    val docs = util.t(spark, sf, "documents").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      val syl = ws.map(w =>
        math.max("[aeiouy]+".r.findAllIn(w).size, 1).toLong).sum
      val nw = ws.length.toLong
      val ns = (nw + 11) / 12
      val wps = nw * 1000000L / ns
      val spw = syl * 1000000L / nw
      val fk = 39 * wps / 100 + 118 * spw / 10 - 15590000L
      val band = if (fk <= 6000000L) "easy"
      else if (fk <= 10000000L) "medium" else "hard"
      id -> (nw, syl, ns, fk, band)
    }.toMap
    val got = SparkEntry.queries("text_readability")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toMap
    assert(got == expect, s"fk mismatch: ${got.toSeq.diff(expect.toSeq).take(3)}")
  }

  test("wap: poisoned stage is rejected, clean stage publishes, main is whole") {
    val rows = SparkEntry.queries("src_wap_publish")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    val byKey = rows.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(byKey((1L, "no_nonpositive_price"))._1 > 0,
      "the poisoned batch must actually violate the contract")
    assert(rows.filter(_._1 == 1L).forall(!_._4), "attempt 1 must not publish")
    assert(rows.filter(_._1 == 2L).forall(r => r._3 == 0 && r._4),
      "the clean batch must audit clean and publish")
    val total = util.t(spark, sf, "orders").count()
    assert(byKey((3L, "main_row_count"))._1 == total,
      "published main must hold every order exactly once — no poison, no loss")
  }

  test("q94 rolling distinct: sequential 7-day WAU referee agrees") {
    val active = util.t(spark, sf, "events").collect()
      .map(r => (r.getString(3), r.getLong(2), r.getTimestamp(1).getTime / 86400000L))
      .distinct
    val hi = active.map(_._3).max
    val expect = active.groupBy(_._1).toSeq.flatMap { case (et, g) =>
      val byUser = g.map(t => (t._2, t._3)).toSeq
      val days = g.map(_._3).flatMap(d => d to math.min(d + 6, hi)).distinct.toSeq
      days.map { d =>
        val wau = byUser.filter { case (_, ad) => ad >= d - 6 && ad <= d }
          .map(_._1).distinct.size.toLong
        (et, d) -> wau
      }
    }.filter(_._2 > 0).toMap
    val got = SparkEntry.queries("q94_rolling_distinct")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect, s"wau mismatch: ${got.toSeq.diff(expect.toSeq).take(3)}")
  }

  test("q95 bitemporal: sequential as-known-at referee agrees at both tx times") {
    val o = util.t(spark, sf, "orders").collect()
      .map(r => (r.getLong(0), r.getString(5),
        r.getTimestamp(4).getTime / 86400000L,
        math.round(r.getDouble(3) * 100)))
    val cut = (o.map(_._3).min + o.map(_._3).max + 1) / 2
    def asKnown(tx: Long) = o
      .map { case (k, pr, bd, c) =>
        (k, pr, bd, if (tx >= 1 && k % 10 == 3) c * 2 else c)
      }
      .filter(_._3 < cut)
      .groupBy(_._2).view.mapValues(g => (g.size.toLong, g.map(_._4).sum)).toMap
    val got = SparkEntry.queries("q95_bitemporal")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    Seq(0L, 1L).foreach { tx =>
      val e = asKnown(tx)
      e.foreach { case (pr, x) =>
        assert(got((tx, pr)) == x, s"tx=$tx pr=$pr: got ${got((tx, pr))}, referee $x")
      }
    }
    // the two reconstructions must actually differ (corrections bite)
    assert(got.filter(_._1._1 == 0L).values.toSeq.sortBy(_._1) !=
      got.filter(_._1._1 == 1L).values.toSeq.sortBy(_._1))
  }

  test("sample_negative: hash-draw referee agrees; no positives; all filled") {
    val pos = {
      val ok = util.t(spark, sf, "orders").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      util.t(spark, sf, "lineitem").collect()
        .flatMap(r => ok.get(r.getLong(0)).map(c => (c, r.getLong(1)))).toSet
    }
    val nItems = util.t(spark, sf, "part").collect().map(_.getLong(0)).max
    val custs = util.t(spark, sf, "customer").collect().map(_.getLong(0))
    val expect = custs.flatMap { c =>
      (0L to 19L).map { j =>
        (j, 1 + (((c * 2654435761L + j * 40503L) % 4294967296L + 4294967296L)
          % 4294967296L) % nItems)
      }.filter { case (_, it) => !pos((c, it)) }
        .sortBy(_._1).take(5).zipWithIndex
        .map { case ((_, it), i) => (c, i + 1L, it) }
    }.toSeq
    val got = SparkEntry.queries("sample_negative")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"negatives mismatch: ${got.diff(expect).take(3)}")
    assert(got.groupBy(_._1).forall(_._2.size == 5),
      "every customer must fill its 5 negatives from 20 draws")
    assert(got.forall { case (c, _, it) => !pos((c, it)) },
      "a sampled negative must never be an observed positive")
  }

  test("benford: law constants sum to exactly 1e6; sequential referee agrees") {
    assert(operators.Warehouse.benfordMicro.map(_._2).sum == 1000000L,
      "the micro-unit Benford probabilities must partition the grid exactly")
    val cents = util.t(spark, sf, "orders").collect()
      .map(r => math.round(r.getDouble(3) * 100)).filter(_ > 0)
    val n = cents.length.toLong
    val obs = cents.map(_.toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = operators.Warehouse.benfordMicro.map { case (d, em) =>
      val c = obs.getOrElse(d, 0L)
      val om = c * 1000000L / n
      d -> (c, om, em, math.abs(om - em))
    }.toMap
    val got = SparkEntry.queries("meta_benford")(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == expect, s"benford mismatch: ${got.toSeq.diff(expect.toSeq)}")
  }

  test("reconcile: classes partition the orders; sequential referee agrees") {
    val hdr = util.t(spark, sf, "orders").collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(3) * 100)).toMap
    val lines = util.t(spark, sf, "lineitem").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(5) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expect = hdr.toSeq.map { case (k, hc) =>
      lines.get(k) match {
        case None => ("missing_lines", hc)
        case Some(lc) if hc > lc => ("header_higher", hc - lc)
        case Some(lc) if hc < lc => ("lines_higher", lc - hc)
        case Some(_) => ("equal", 0L)
      }
    }.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    val got = SparkEntry.queries("meta_reconcile")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect, s"reconcile mismatch: got $got\nreferee $expect")
    assert(got.values.map(_._1).sum == hdr.size.toLong,
      "classes must partition the order set")
  }

  test("manifest expiry: readback byte-identical across GC; orphan physically gone") {
    import sources.FileSources._
    import spark.implicits._
    val root = util.scratchDir("expire_spec")
    def df(ids: Int*) = ids.toSeq.toDF("id")
    writeRef(root, "main", commitVersion(root, "a", df(1, 2), parent = 0))
    writeRef(root, "main", commitVersion(root, "b", df(3), parent = readRef(root, "main")))
    commitVersion(root, "stale", df(99), parent = 1) // never reffed
    def readback: Seq[Int] =
      snapshotAt(spark, root, readRef(root, "main")).collect()
        .map(_.getInt(0)).toSeq.sorted
    val before = readback
    expireUnreachable(root, Seq("main"))
    assert(readback == before, "GC must be invisible to readers")
    assert(!new java.io.File(s"$root/stale").exists,
      "the orphan's data file must be physically reclaimed")
    assert(new java.io.File(s"$root/a").exists && new java.io.File(s"$root/b").exists,
      "reachable data files must survive")
    val manifests = new java.io.File(s"$root/_versions").listFiles()
      .map(_.getName).toSet
    assert(manifests == Set("v1.json", "v2.json"),
      s"only the reachable chain's manifests may remain: $manifests")
  }

  test("curriculum: phases balanced, grade spans non-overlapping, corpus covered") {
    val got = SparkEntry.queries("pipeline_curriculum")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    val sizes = got.map(_._2)
    assert(sizes.max - sizes.min <= 1, s"rank cuts must balance phases: ${sizes.toSeq}")
    assert(sizes.sum == util.t(spark, sf, "documents").count(),
      "phases must cover the corpus exactly")
    got.sliding(2).foreach { case Array(p, q) =>
      assert(p._4 <= q._3,
        s"phase ${p._1} max_fk ${p._4} must not exceed phase ${q._1} min_fk ${q._3}")
    }
  }

  test("q96 decile lift: sequential referee agrees; gains reach exactly 1e6") {
    val urgent = util.t(spark, sf, "orders").collect()
      .filter(_.getString(5) == "1-URGENT").map(_.getLong(1)).toSet
    val custs = util.t(spark, sf, "customer").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
      .sortBy { case (k, bal) => (-bal, k) }
    val n = custs.length
    // SQL ntile: first (n mod 10) buckets get ceil(n/10) rows
    val big = n % 10; val base = n / 10
    val deciles = custs.zipWithIndex.map { case ((k, _), i) =>
      val d = if (i < big * (base + 1)) i / (base + 1)
      else big + (i - big * (base + 1)) / base
      (d + 1L, if (urgent(k)) 1L else 0L)
    }
    val totResp = deciles.map(_._2).sum
    val expect = deciles.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, g) =>
      (d, g.length.toLong, g.map(_._2).sum)
    }
    var cum = 0L
    val full = expect.map { case (d, nn, resp) =>
      cum += resp
      (d, nn, resp, resp * 1000000L / nn,
        resp * n * 1000000L / (nn * totResp), cum * 1000000L / totResp)
    }
    val got = SparkEntry.queries("q96_decile_lift")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == full, s"lift mismatch: ${got.diff(full).take(3)}")
    assert(got.last._6 == 1000000L, "cumulative gains must close at exactly 1e6")
  }

  test("q97 rfm: sequential ntile referee agrees; segments partition buyers") {
    val orders = util.t(spark, sf, "orders").collect()
      .map(r => (r.getLong(1), r.getTimestamp(4).getTime / 86400000L,
        math.round(r.getDouble(3) * 100)))
    val rfm = orders.groupBy(_._1).map { case (c, g) =>
      (c, g.map(_._2).max, g.size.toLong, g.map(_._3).sum)
    }.toSeq
    def ntile5(keyed: Seq[(Long, Long)]): Map[Long, Long] = {
      // keyed = (sortValue, cust) ascending; SQL ntile bucket sizes
      val sorted = keyed.sortBy(identity)
      val n = sorted.length; val big = n % 5; val base = n / 5
      sorted.zipWithIndex.map { case ((_, c), i) =>
        val b = if (i < big * (base + 1)) i / (base + 1)
        else big + (i - big * (base + 1)) / base
        c -> (b + 1L)
      }.toMap
    }
    val r = ntile5(rfm.map(t => (t._2, t._1)))
    val f = ntile5(rfm.map(t => (t._3, t._1)))
    val m = ntile5(rfm.map(t => (t._4, t._1)))
    val expect = rfm.map { case (c, _, _, cents) =>
      val (rs, fs, ms) = (r(c), f(c), m(c))
      val seg = if (rs >= 4 && fs >= 4 && ms >= 4) "champion"
      else if (fs >= 4) "loyal"
      else if (ms >= 4) "big_spender"
      else if (rs <= 2 && fs >= 3) "at_risk"
      else if (rs == 1) "lost" else "regular"
      (seg, cents, rs, fs)
    }.groupBy(_._1).view.mapValues { g =>
      (g.size.toLong, g.map(_._2).sum,
        g.map(_._3).sum.toDouble / g.size, g.map(_._4).sum.toDouble / g.size)
    }.toMap
    val got = SparkEntry.queries("q97_rfm_segmentation")(spark, sf).collect()
      .map(rr => rr.getString(0) -> (rr.getLong(1), rr.getLong(2),
        rr.getDouble(3), rr.getDouble(4))).toMap
    assert(got.keySet == expect.keySet, s"segments: got ${got.keySet}")
    expect.foreach { case (s, e) =>
      assert(got(s)._1 == e._1 && got(s)._2 == e._2, s"segment $s: ${got(s)} vs $e")
      assert(math.abs(got(s)._3 - e._3) < 1e-9 && math.abs(got(s)._4 - e._4) < 1e-9)
    }
    assert(got.values.map(_._1).sum == rfm.size.toLong,
      "segments must partition the buyer set")
  }

  test("stream wap: poisoned batches quarantined exactly; main total balances") {
    val rows = SparkEntry.queries("stream_wap_ingest")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val ledger = rows.filter(_._1 >= 0)
    assert(ledger.map(_._1).toSeq == (0L to 5L), "one ledger row per batch")
    val quarantined = ledger.filter(_._2 == "quarantined").map(_._1).toSet
    assert(quarantined == Set(1L, 4L),
      s"exactly the sign-bugged chunks must quarantine: $quarantined")
    ledger.filter(_._2 == "quarantined").foreach { case (b, _, _, cents) =>
      assert(cents < 0, s"batch $b staged cents must carry the sign bug")
    }
    val mainRow = rows.find(_._1 == -1L).get
    val pub = ledger.filter(_._2 == "published")
    assert(mainRow._3 == pub.map(_._3).sum && mainRow._4 == pub.map(_._4).sum,
      "the storage recount must balance the published ledger rows")
  }

  test("bitmap distinct: buffer exact vs set referee; merge + codec stable") {
    val b = new functions.Bitmap.Buffer
    val ref = scala.collection.mutable.Set.empty[Long]
    // adversarial stream: clustered runs, repeats, word-boundary hits
    val vals = (0 until 5000).map(i =>
      ((i.toLong * 2654435761L) % 4294967296L) % 10000L) ++
      Seq(0L, 63L, 64L, 127L, 128L, 0L, 64L)
    vals.foreach { v => b.add(v); ref += v }
    assert(b.cardinality == ref.size.toLong, "bitmap must be exact")
    // split-merge across interleaved shards == sequential
    val shards = (0 until 4).map { s =>
      val sb = new functions.Bitmap.Buffer
      vals.indices.filter(_ % 4 == s).foreach(i => sb.add(vals(i)))
      sb
    }
    val merged = shards.reduce { (x, y) =>
      val m = functions.Bitmap.deserialize(functions.Bitmap.serialize(x))
      m.mergeFrom(functions.Bitmap.deserialize(functions.Bitmap.serialize(y)))
      m
    }
    assert(merged.cardinality == ref.size.toLong, "merge must lose nothing")
    assert(functions.Bitmap.serialize(merged).toSeq ==
      functions.Bitmap.serialize(b).toSeq,
      "serialized form must be canonical regardless of build order")
    intercept[IllegalArgumentException] { b.add(-1L) }
  }

  test("graph random walks: sequential hop referee agrees; every hop is an edge") {
    val edges = {
      val ok = util.t(spark, sf, "orders").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      util.t(spark, sf, "lineitem").collect()
        .flatMap(r => ok.get(r.getLong(0)).map(c => (c * 2, r.getLong(2) * 2 + 1)))
        .distinct
    }
    val adj = (edges ++ edges.map(_.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    val starts = adj.keys.filter(_ % 2 == 0).toSeq.sorted.take(50)
    val expectRows = starts.zipWithIndex.flatMap { case (start, i) =>
      val w = i + 1L
      var node = start
      Seq((w, 0L, node)) ++ (1 to 4).map { s =>
        val nbrs = adj(node)
        val idx = (((w * 2654435761L + s * 40503L) % 4294967296L + 4294967296L)
          % 4294967296L % nbrs.size).toInt
        node = nbrs(idx)
        (w, s.toLong, node)
      }
    }
    val got = SparkEntry.queries("graph_random_walks")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1))).toSeq
    assert(got == expectRows, s"walk mismatch: ${got.diff(expectRows).take(3)}")
    // structural validity: consecutive positions are genuine edges
    got.groupBy(_._1).values.foreach { walk =>
      walk.sortBy(_._2).sliding(2).foreach { case Seq(a, b) =>
        assert(adj(a._3).contains(b._3), s"hop ${a._3}->${b._3} is not an edge")
      }
    }
  }

  test("backfill merge: the seam overlap is real, so the anti-join dedup is load-bearing") {
    val days = util.t(spark, sf, "events").collect()
      .map(_.getTimestamp(1).getTime / 86400000L)
    val cut = (days.min + days.max + 1) / 2
    assert(days.exists(_ == cut - 1),
      "the seam day must exist — otherwise the overlap replay tests nothing")
    // and the merged view must reproduce the full-table truth (the
    // oracle hash also proves this; here it guards refactors at spec
    // speed)
    val got = SparkEntry.queries("stream_backfill_merge")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = util.t(spark, sf, "events").collect()
      .groupBy(_.getString(3)).view.mapValues(_.size.toLong).toMap
    assert(got == want, s"merge mismatch: $got vs $want")
  }

  test("q98 allocation: every order's allocations sum to its header exactly") {
    val hdr = util.t(spark, sf, "orders").collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(3) * 100)).toMap
    val lines = util.t(spark, sf, "lineitem").collect()
      .map(r => (r.getLong(0), r.getInt(3).toLong, r.getLong(1), r.getLong(2),
        r.getString(8), math.round(r.getDouble(4))))
    val alloc = lines.groupBy(_._1).toSeq.flatMap { case (ok, g) =>
      val tc = hdr(ok)
      val bigQ = g.map(_._6).sum
      val based = g.map { case (_, ln, pk, sk, rf, q) =>
        (ln, pk, sk, rf, tc * q / bigQ, tc * q % bigQ)
      }
      val leftover = tc - based.map(_._5).sum
      val ranked = based.sortBy { case (ln, pk, sk, rf, _, rem) =>
        (-rem, ln, pk, sk, rf)
      }.zipWithIndex
      val rows = ranked.map { case ((_, _, _, rf, base, _), i) =>
        (rf, base + (if (i < leftover) 1L else 0L))
      }
      assert(rows.map(_._2).sum == tc,
        s"order $ok: allocations ${rows.map(_._2).sum} != header $tc")
      rows
    }
    val expect = alloc.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    val got = SparkEntry.queries("q98_allocation")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect, s"allocation mismatch: $got vs $expect")
  }

  test("q99 interval coverage: sequential union referee agrees per user") {
    val iv = util.t(spark, sf, "events").collect()
      .map { r =>
        val s = micros(r.getTimestamp(1))
        (r.getLong(2), s, s + math.round(r.getDouble(4) * 100) * 10000L)
      }
    val expect = iv.groupBy(_._1).map { case (u, g) =>
      val sorted = g.map(t => (t._2, t._3)).sortBy(identity)
      var islands = 0L; var covered = 0L
      var curS = Long.MinValue; var curE = Long.MinValue
      sorted.foreach { case (s, e) =>
        if (islands == 0 || s > curE) {
          if (islands > 0) covered += curE - curS
          islands += 1; curS = s; curE = e
        } else if (e > curE) curE = e
      }
      covered += curE - curS
      u -> (islands, covered)
    }
    val got = SparkEntry.queries("q99_interval_coverage")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect, s"coverage mismatch: ${got.toSeq.diff(expect.toSeq).take(3)}")
  }

  test("clone: zero-copy, divergence isolated, survives a source GC") {
    import sources.FileSources._
    import spark.implicits._
    val src = util.scratchDir("clone_spec_src")
    val dst = util.scratchDir("clone_spec_dst")
    def df(ids: Int*) = ids.toSeq.toDF("id")
    writeRef(src, "main", commitVersion(src, "a", df(1, 2), parent = 0))
    writeRef(src, "main", commitVersion(src, "b", df(3), parent = readRef(src, "main")))
    shallowClone(src, dst)
    def ids(root: String): Set[Int] =
      snapshotAt(spark, root, readRef(root, "main")).collect().map(_.getInt(0)).toSet
    assert(ids(dst) == Set(1, 2, 3), "clone must see the source's content")
    assert(!new java.io.File(s"$dst/a").exists,
      "zero-copy: no data files may exist under the clone root")
    // divergence: append to the clone, source unchanged
    writeRef(dst, "main", commitVersion(dst, "c", df(9), parent = readRef(dst, "main")))
    assert(ids(dst) == Set(1, 2, 3, 9) && ids(src) == Set(1, 2, 3),
      "clone appends must not leak into the source")
    // a GC of the source's own refs must not break the clone (all src
    // manifests are main-reachable, so nothing is reclaimed)
    expireUnreachable(src, Seq("main"))
    assert(ids(dst) == Set(1, 2, 3, 9), "clone must survive a source GC")
  }

  test("k-anonymity: sequential referee agrees; records partition exactly") {
    val cust = util.t(spark, sf, "customer").collect()
      .map(r => (r.getString(4), r.getInt(2).toLong,
        math.round(r.getDouble(3) * 100) / 100000L))
    val expect = cust.groupBy(identity).toSeq
      .map { case ((seg, _, _), g) => (seg, g.size.toLong) }
      .groupBy(_._1).view.mapValues { ks =>
        val sizes = ks.map(_._2)
        (sizes.size.toLong, sizes.min,
          sizes.count(_ < 5).toLong, sizes.filter(_ < 5).sum, sizes.sum)
      }.toMap
    val got = SparkEntry.queries("meta_k_anonymity")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == expect, s"k-anon mismatch: $got vs $expect")
    assert(got.values.map(_._5).sum == cust.length.toLong,
      "QI groups must partition the customer records")
  }

  test("semi-additive: sequential carry-forward referee agrees") {
    val ev = util.t(spark, sf, "events").collect()
      .map(r => (r.getLong(2), r.getTimestamp(1).getTime / 86400000L,
        micros(r.getTimestamp(1)), r.getLong(0),
        math.round(r.getDouble(4) * 100)))
    val hi = ev.map(_._2).max
    val expect = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    ev.groupBy(_._1).foreach { case (_, g) =>
      val lastPerDay = g.groupBy(_._2).view.mapValues(
        _.maxBy(t => (t._3, t._4))._5).toSeq.sortBy(_._1)
      lastPerDay.zipWithIndex.foreach { case ((day, bal), i) =>
        val to = if (i + 1 < lastPerDay.size) lastPerDay(i + 1)._1 - 1 else hi
        (day to to).foreach { d =>
          val (n, s) = expect.getOrElse(d, (0L, 0L))
          expect(d) = (n + 1, s + bal)
        }
      }
    }
    val got = SparkEntry.queries("meta_semi_additive")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect.toMap,
      s"carry-forward mismatch: ${got.toSeq.diff(expect.toSeq).take(3)}")
    val nUsers = ev.map(_._1).distinct.length.toLong
    assert(got(hi)._1 == nUsers,
      "on the final day every user's balance must be known")
  }

  test("hashing trick: features replay from the sidecar map; width respected") {
    // run the ENTRY first so the sidecar on disk is this SF's map
    val got = SparkEntry.queries("text_hashing_trick")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // the sidecar map IS the published artifact — read it back and
    // recompute every doc's features sequentially from raw text
    val vocab = spark.read.parquet(
      util.oracleSidecarGlob("hashing_vocab").stripSuffix("/*.parquet"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab.values.forall(b => b >= 0 && b < 128), "bucket width is 128")
    val docs = util.t(spark, sf, "documents").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.map { case (id, text) =>
      val counts = text.split(" ", -1).toSeq.map(vocab)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (topB, topC) = counts.toSeq.maxBy { case (b, c) => (c, -b) }
      id -> (counts.size.toLong, counts.values.sum, topB, topC)
    }.toMap
    assert(got == expect, s"feature mismatch: ${got.toSeq.diff(expect.toSeq).take(3)}")
  }

  test("equi-depth histogram: depth balanced, spans ordered, referee agrees") {
    val cents = util.t(spark, sf, "orders").collect()
      .map(r => (math.round(r.getDouble(3) * 100), r.getLong(0)))
      .sortBy(identity)
    val n = cents.length; val big = n % 8; val base = n / 8
    val expect = cents.zipWithIndex.map { case ((c, _), i) =>
      val b = if (i < big * (base + 1)) i / (base + 1)
      else big + (i - big * (base + 1)) / base
      (b + 1L, c)
    }.groupBy(_._1).view.mapValues { g =>
      val cs = g.map(_._2)
      (cs.min, cs.max, cs.size.toLong, cs.distinct.size.toLong)
    }.toMap
    val got = SparkEntry.queries("meta_histogram_equidepth")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == expect, s"histogram mismatch: $got vs $expect")
    val sizes = got.values.map(_._3)
    assert(sizes.max - sizes.min <= 1, "equi-depth buckets must balance")
    (1L to 7L).foreach { b =>
      assert(got(b)._2 <= got(b + 1)._1, s"bucket $b span overlaps ${b + 1}")
    }
  }

  test("q100 rolling slope: sequential signed-trunc referee agrees") {
    val rows = util.t(spark, sf, "lineitem").collect()
      .map(r => (r.getLong(1), (r.getTimestamp(10).getTime, r.getLong(0),
        r.getInt(3).toLong, math.round(r.getDouble(5) * 100))))
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (p, g) =>
      val ys = g.map(_._2).sortBy(t => (t._1, t._2, t._3)).map(_._4)
      val slopes = ys.indices.flatMap { i =>
        val lo = math.max(0, i - 7)
        val xs = (lo to i).map(j => (j + 1).toLong) // row_number is 1-based
        val win = (lo to i).map(ys)
        val n = xs.size.toLong
        if (n < 2) None
        else {
          val sx = xs.sum; val sy = win.sum
          val sxy = xs.zip(win).map { case (x, y) => x * y }.sum
          val sxx = xs.map(x => x * x).sum
          val num = (n * sxy - sx * sy) * 1000000L
          val den = n * sxx - sx * sx
          Some(if (num >= 0) num / den else -((-num) / den))
        }
      }
      if (slopes.isEmpty) None
      else Some(p -> (slopes.size.toLong, slopes.max, slopes.min))
    }.toMap
    val got = SparkEntry.queries("q100_rolling_slope")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect, s"slope mismatch: ${got.toSeq.diff(expect.toSeq).take(3)}")
  }

  test("walk pairs: recomputed from the walk table; bounded to the band") {
    val walks = SparkEntry.queries("graph_random_walks")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1))) // walk, step, node
    val expect = walks.flatMap { case (w, s1, c) =>
      walks.filter(t => t._1 == w && math.abs(t._2 - s1) >= 1 &&
        math.abs(t._2 - s1) <= 2)
        .map(t => ((c, t._3), math.abs(t._2 - s1)))
    }.groupBy(_._1).toSeq
      .map { case ((c, x), g) => (c, x, g.size.toLong, g.map(_._2).min) }
      .sortBy { case (c, x, nn, _) => (-nn, c, x) }.take(30)
    val got = SparkEntry.queries("pipeline_walk_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect, s"pair mismatch: ${got.diff(expect).take(3)}")
  }

  test("gini: BigInt referee agrees; index on [0, 1e6); even split scores 0") {
    val custSeg = util.t(spark, sf, "customer").collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    val orderCust = util.t(spark, sf, "orders").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rev = util.t(spark, sf, "lineitem").collect()
      .flatMap { r =>
        orderCust.get(r.getLong(0)).map { c =>
          ((custSeg(c), r.getLong(1)), math.round(r.getDouble(5) * 100))
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def gini(xs: Seq[Long]): (Long, Long, Long) = {
      val sorted = xs.sorted
      val n = BigInt(sorted.size)
      val sx = sorted.map(BigInt(_)).sum
      val six = sorted.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      ((BigInt(2) * six - (n + 1) * sx) * 1000000 / (n * sx)).toLong match {
        case g => (sorted.size.toLong, sx.toLong, g)
      }
    }
    val expect = rev.toSeq.groupBy(_._1._1).view
      .mapValues(g => gini(g.map(_._2))).toMap
    val got = SparkEntry.queries("meta_gini")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect, s"gini mismatch: $got vs $expect")
    got.values.foreach { case (_, _, g) =>
      assert(g >= 0 && g < 1000000, s"gini $g off the unit micro grid")
    }
    // formula sanity on constructed inputs: perfect equality → 0,
    // total concentration → (n-1)/n
    assert(gini(Seq(5L, 5L, 5L, 5L))._3 == 0L)
    assert(gini(Seq(0L, 0L, 0L, 12L))._3 == 750000L)
  }

  test("group holdout: user sets disjoint and partition the population") {
    val ev = util.t(spark, sf, "events").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    def fold(u: Long): String =
      if (((u * 2654435761L) % 4294967296L + 4294967296L) % 4294967296L % 5 < 4)
        "train" else "holdout"
    val expect = ev.groupBy(t => fold(t._2)).view.mapValues { g =>
      (g.size.toLong, g.map(_._2).distinct.size.toLong,
        g.map(_._1).reduce(_ ^ _), g.map(_._2).sum)
    }.toMap
    val got = SparkEntry.queries("sample_group_holdout")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == expect, s"holdout mismatch: $got vs $expect")
    val trainUsers = ev.filter(t => fold(t._2) == "train").map(_._2).toSet
    val holdUsers = ev.filter(t => fold(t._2) == "holdout").map(_._2).toSet
    assert(trainUsers.intersect(holdUsers).isEmpty,
      "a user must never straddle the split")
    assert(trainUsers.size + holdUsers.size == ev.map(_._2).distinct.length,
      "splits must partition the user population")
  }

  test("q101 cohort ltv: sequential triangle referee agrees; curve is cumulative") {
    val ev = util.t(spark, sf, "events").collect()
      .map(r => (r.getLong(2), r.getString(3),
        r.getTimestamp(1).getTime / 86400000L / 7L,
        math.round(r.getDouble(4) * 100)))
    val cohort = ev.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val cells = ev.map { case (u, et, w, c) =>
      ((cohort(u), w - cohort(u)), (u, if (et == "purchase") c else 0L))
    }.groupBy(_._1).view.mapValues { g =>
      (g.map(_._2._1).distinct.size.toLong, g.map(_._2._2).sum)
    }.toMap
    val expect = cells.keys.groupBy(_._1).flatMap { case (co, ks) =>
      var cum = 0L
      ks.toSeq.sortBy(_._2).map { k =>
        cum += cells(k)._2
        k -> (cells(k)._1, cells(k)._2, cum)
      }
    }
    val got = SparkEntry.queries("q101_cohort_ltv")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == expect, s"ltv mismatch: ${got.toSeq.diff(expect.toSeq).take(3)}")
    // every user appears in their cohort's age-0 cell
    val age0 = got.filter(_._1._2 == 0L).values.map(_._1).sum
    assert(age0 == cohort.size.toLong, "age-0 cells must cover every user")
  }

  test("q102 time-to-convert: rank-pick percentile referee agrees") {
    val ev = util.t(spark, sf, "events").collect()
      .map(r => (r.getLong(2), r.getString(3), micros(r.getTimestamp(1))))
    val firstView = ev.filter(_._2 == "view").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val lats = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, m) =>
        firstView.get(u).filter(m >= _).map(v => (u, m, v))
      }
      .groupBy(_._1).map { case (u, g) =>
        (g.map(_._2).min - g.head._3, u)
      }.toSeq.sorted.map(_._1)
    val n = lats.size
    def pick(p: Int) = lats((n * p + 99) / 100 - 1)
    val Array(row) = SparkEntry.queries("q102_time_to_convert")(spark, sf).collect()
    assert(row.getLong(0) == firstView.size.toLong)
    assert(row.getLong(1) == n.toLong)
    assert(row.getLong(2) == pick(50) && row.getLong(3) == pick(90))
    assert(row.getLong(4) == lats.max)
    assert(row.getLong(2) <= row.getLong(3) && row.getLong(3) <= row.getLong(4),
      "percentiles must be monotone")
  }

  test("knn classifier: vote referee over the knn table agrees; classes covered") {
    val labels = util.t(spark, sf, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    val knn = SparkEntry.queries("sim_knn_join_exact")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val pred = knn.groupBy(_._1).map { case (q, g) =>
      val votes = g.map(t => labels(t._2)).groupBy(identity).view
        .mapValues(_.size).toSeq
      q -> votes.maxBy { case (l, c) => (c, -l) }._1
    }
    val expect = pred.toSeq.map { case (q, p) => (labels(q), p == labels(q)) }
      .groupBy(_._1).view.mapValues { g =>
        val correct = g.count(_._2).toLong
        (g.size.toLong, correct, correct * 1000000L / g.size)
      }.toMap
    val got = SparkEntry.queries("sim_knn_classifier")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect, s"classifier mismatch: $got vs $expect")
    assert(got.values.map(_._1).sum == labels.size.toLong,
      "every vector must be classified exactly once")
  }

  test("rake: full sequential pipeline referee reproduces the top-25") {
    val docs = util.t(spark, sf, "documents").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val stops = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(20).map(_._1).toSet
    // delimiter islands → candidate phrases of 2..4 words
    val phrases = docs.flatMap { case (_, ws) =>
      val segs = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      ws.foreach { w =>
        if (stops(w)) segs += scala.collection.mutable.ArrayBuffer.empty[String]
        else segs.last += w
      }
      segs.filter(s => s.size >= 2 && s.size <= 4).map(_.toSeq)
    }
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val deg = phrases.flatMap(p => p.map(w => (w, p.size.toLong)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val wscore = freq.keys.map(w => w -> deg(w) * 1000000L / freq(w)).toMap
    val expect = phrases.map(p => (p.mkString(" "), p.map(wscore).sum))
      .groupBy(_._1).toSeq
      .map { case (ph, g) => (ph, g.size.toLong, g.map(_._2).max) }
      .sortBy { case (ph, _, s) => (-s, ph) }.take(25)
    val got = SparkEntry.queries("text_rake_keywords")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"rake mismatch: ${got.diff(expect).take(3)}")
  }

  test("abc-xyz: sequential zero-filled CV referee agrees; cells partition parts") {
    val li = util.t(spark, sf, "lineitem").collect()
      .map(r => (r.getLong(1), r.getTimestamp(10).getTime / 86400000L / 7L,
        math.round(r.getDouble(4)),
        BigDecimal(r.getDouble(5) * (1 - r.getDouble(6)))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)))
    val lo = li.map(_._2).min; val hi = li.map(_._2).max
    val xyz = li.groupBy(_._1).view.mapValues { g =>
      val weekly = g.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val qs = (lo to hi).map(w => weekly.getOrElse(w, 0L))
      val w = qs.size.toLong; val sq = qs.sum; val sqq = qs.map(q => q * q).sum
      val cv2 = (w * sqq - sq * sq) * 1000000L / (sq * sq)
      if (cv2 <= 250000) "X" else if (cv2 <= 1000000) "Y" else "Z"
    }.toMap
    val rev = li.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val total = rev.values.sum
    var cum = BigDecimal(0)
    val abc = rev.toSeq.sortBy { case (p, r) => (-r, p) }.map { case (p, r) =>
      cum += r
      p -> (if (cum * 100 <= total * 80) "A"
      else if (cum * 100 <= total * 95) "B" else "C")
    }.toMap
    val expect = rev.keys.toSeq.map(p => ((abc(p), xyz(p)), rev(p)))
      .groupBy(_._1).view.mapValues { g =>
        (g.size.toLong,
          g.map(_._2).sum.setScale(4, BigDecimal.RoundingMode.HALF_UP))
      }.toMap
    val got = SparkEntry.queries("q103_abc_xyz")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
      .toMap
    assert(got == expect, s"abc-xyz mismatch: ${got.toSeq.diff(expect.toSeq).take(3)}")
    assert(got.values.map(_._1).sum == rev.size.toLong,
      "the matrix must partition the part catalog")
  }

  test("window funnel: sequential earliest-chain referee agrees; ladder monotone") {
    val win = 7L * 86400000000L
    val ev = util.t(spark, sf, "events").collect()
      .map(r => (r.getLong(2), r.getString(3), micros(r.getTimestamp(1))))
    val t1 = ev.filter(_._2 == "view").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val t2 = ev.filter(_._2 == "click").flatMap { case (u, _, m) =>
      t1.get(u).filter(t => m >= t && m <= t + win).map(_ => (u, m))
    }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val t3 = ev.filter(_._2 == "purchase").flatMap { case (u, _, m) =>
      t2.get(u).filter(t => m >= t && m <= t + win).map(_ => (u, m))
    }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val got = SparkEntry.queries("q104_window_funnel")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L)._2 == t1.size.toLong && got(2L)._2 == t2.size.toLong &&
      got(3L)._2 == t3.size.toLong,
      s"stage counts mismatch: $got vs ${(t1.size, t2.size, t3.size)}")
    assert(got(2L)._3 == t2.size.toLong * 1000000L / t1.size)
    assert(got(3L)._3 == t3.size.toLong * 1000000L / t2.size)
    assert(got(1L)._2 >= got(2L)._2 && got(2L)._2 >= got(3L)._2,
      "a stage can never out-count its predecessor")
  }

  test("growth accounting: referee agrees; the two flow identities hold") {
    val act = util.t(spark, sf, "events").collect()
      .map(r => (r.getLong(2), r.getTimestamp(1).getTime / 86400000L / 7L))
      .distinct
    val first = act.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val actSet = act.toSet
    val expect = act.groupBy(_._2).map { case (w, g) =>
      val cls = g.map { case (u, _) =>
        if (w == first(u)) "new"
        else if (actSet((u, w - 1))) "retained" else "resurrected"
      }
      val churned = act.filter(_._2 == w - 1).count(t => !actSet((t._1, w)))
      w -> (g.size.toLong, cls.count(_ == "new").toLong,
        cls.count(_ == "retained").toLong, cls.count(_ == "resurrected").toLong,
        churned.toLong)
    }
    val got = SparkEntry.queries("q105_growth_accounting")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == expect, s"growth mismatch: ${got.toSeq.diff(expect.toSeq).take(3)}")
    // the accounting identities that make this a decomposition, not a
    // dashboard: actives = new + retained + resurrected, and last
    // week's actives = this week's retained + churned
    got.foreach { case (w, (a, nw, rt, rs, ch)) =>
      assert(a == nw + rt + rs, s"week $w: actives must decompose exactly")
      expect.get(w - 1).foreach { case (prevA, _, _, _, _) =>
        assert(prevA == rt + ch,
          s"week $w: last week's actives must flow into retained+churned")
      }
    }
  }

  test("mutual nn: reciprocity referee over the knn table; hubs filtered") {
    val knn = SparkEntry.queries("sim_knn_join_exact")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1), r.getDouble(3)))
    val top = knn.map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    val expect = knn.flatMap { case (a, b, rab, cos) =>
      top.get((b, a)).filter(_ => a < b).map { case (rba, _) =>
        (a, b, cos, rab, rba)
      }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = SparkEntry.queries("sim_mutual_nn")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect, s"mutual-nn mismatch: ${got.diff(expect).take(3)}")
    assert(got.nonEmpty, "the synthetic space must produce mutual pairs")
    // reciprocity is the definition: every emitted pair appears in
    // BOTH top-3 lists
    got.foreach { case (a, b, _, _, _) =>
      assert(top.contains((a, b)) && top.contains((b, a)),
        s"pair ($a,$b) is not reciprocal")
    }
  }

  test("dormancy: sequential gap/streak referee agrees") {
    val days = util.t(spark, sf, "events").collect()
      .map(r => (r.getLong(2), r.getTimestamp(1).getTime / 86400000L))
      .distinct
    val expect = days.groupBy(_._1).view.mapValues { g =>
      val ds = g.map(_._2).sorted
      val gaps = ds.sliding(2).collect { case Array(x, y) => y - x }.toSeq
      var streak = 1L; var best = 1L
      ds.sliding(2).foreach { case Array(x, y) =>
        if (y == x + 1) { streak += 1; best = math.max(best, streak) }
        else streak = 1
      }
      (ds.size.toLong, if (gaps.isEmpty) 0L else gaps.max, best)
    }.toMap
    val got = SparkEntry.queries("q106_dormancy")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect, s"dormancy mismatch: ${got.toSeq.diff(expect.toSeq).take(3)}")
  }

  test("textrank: sequential integer-superstep referee reproduces the top-20") {
    val docs = util.t(spark, sf, "documents").collect()
      .map(_.getString(1).split(" ", -1).toSeq)
    val pairs = docs.flatMap { ws =>
      ws.sliding(2).map(s => (s(0), s(1))).toSeq ++
        ws.sliding(3).collect { case Seq(x, _, z) => (x, z) }.toSeq
    }.filter(t => t._1 != t._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 3)
    val sym = (pairs.toSeq ++ pairs.toSeq.map { case ((a, b), c) => ((b, a), c) })
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val strength = sym.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    var r = strength.keys.map(_ -> 1000000L).toMap
    (1 to 5).foreach { _ =>
      val contribs = sym.toSeq.map { case ((src, dst), w) =>
        dst -> (r(src) * w / strength(src))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = contribs.map { case (n, s) => n -> (150000L + 85L * s / 100L) }
    }
    val expect = r.toSeq.sortBy { case (w, s) => (-s, w) }.take(20)
    val got = SparkEntry.queries("text_textrank_keywords")(spark, sf).collect()
      .map(rr => (rr.getString(0), rr.getLong(1))).toSeq
    assert(got == expect, s"textrank mismatch: ${got.diff(expect).take(3)}")
  }

  test("dynamic overwrite: only the restated partitions change") {
    val got = SparkEntry.queries("src_overwrite_dynamic")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = util.t(spark, sf, "orders").collect()
      .map(r => (r.getString(5), math.round(r.getDouble(3) * 100)))
      .groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    base.foreach { case (pr, (n, cents)) =>
      val bump = if (pr == "1-URGENT" || pr == "2-HIGH") n else 0L
      assert(got(pr) == (n, cents + bump),
        s"partition $pr: got ${got(pr)}, want ${(n, cents + bump)} — " +
          "restated partitions bump by one cent per row, others must not move")
    }
    assert(got.keySet == base.keySet,
      "dynamic mode must never truncate untouched partitions")
  }

  test("seq patterns: sequential first-occurrence referee agrees") {
    val firsts = util.t(spark, sf, "events").collect()
      .map(r => ((r.getLong(2), r.getString(3)), micros(r.getTimestamp(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val nUsers = firsts.keys.map(_._1).toSeq.distinct.size.toLong
    val na = firsts.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val byUser = firsts.toSeq.map { case ((u, t), m) => (u, t, m) }.groupBy(_._1)
    val expect = byUser.values.flatMap { g =>
      for {
        (_, a, ma) <- g; (_, b, mb) <- g
        if a != b && ma < mb
      } yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((a, b), n) =>
        (a, b) -> (n, n * 1000000L / nUsers, n * 1000000L / na(a))
      }.toMap
    val got = SparkEntry.queries("q107_seq_patterns")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == expect, s"seq mismatch: ${got.toSeq.diff(expect.toSeq).take(3)}")
    // antisymmetry of strict first-occurrence order: a⇒b and b⇒a
    // counts can never share a user, so their sum ≤ users having both
    got.keys.filter { case (a, b) => a < b }.foreach { case (a, b) =>
      val both = byUser.values.count(g =>
        g.exists(_._2 == a) && g.exists(_._2 == b)).toLong
      assert(got((a, b))._1 + got.getOrElse((b, a), (0L, 0L, 0L))._1 <= both)
    }
  }

  test("pop growth: signed-trunc referee agrees; reconstruction identity holds") {
    val weekly = util.t(spark, sf, "orders").collect()
      .map(r => (r.getTimestamp(4).getTime / 86400000L / 7L,
        math.round(r.getDouble(3) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val weeks = weekly.keys.toSeq.sorted
    val expect = weeks.zipWithIndex.map { case (w, i) =>
      val rev = weekly(w)
      val prev = if (i == 0) None else Some(weekly(weeks(i - 1)))
      val growth = prev.map { p =>
        val d = rev - p
        if (d >= 0) d * 1000000L / p else -((-d) * 1000000L / p)
      }
      w -> (rev, prev, growth)
    }.toMap
    val got = SparkEntry.queries("q108_pop_growth")(spark, sf).collect()
      .map { r =>
        r.getLong(0) -> (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))
      }.toMap
    assert(got == expect, s"growth mismatch: ${got.toSeq.diff(expect.toSeq).take(3)}")
  }

  test("changepoint: exhaustive split referee agrees; split maximizes the score") {
    val daily = util.t(spark, sf, "events").collect()
      .map(r => ((r.getString(3), r.getTimestamp(1).getTime / 86400000L),
        math.round(r.getDouble(4) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expect = daily.keys.toSeq.groupBy(_._1).map { case (et, ks) =>
      val series = ks.map(_._2).sorted.map(d => (d, daily((et, d))))
      val n = series.size.toLong
      val stot = series.map(_._2).sum
      var sl = 0L
      val scoredSplits = series.dropRight(1).zipWithIndex.map { case ((d, c), i) =>
        sl += c
        val t = i + 1L
        val diff = sl / t - (stot - sl) / (n - t)
        (d, t * (n - t) * diff * diff / n, sl / t, (stot - sl) / (n - t))
      }
      val best = scoredSplits.maxBy { case (d, s, _, _) => (s, -d) }
      et -> (best._1, best._2, best._3, best._4)
    }
    val got = SparkEntry.queries("meta_changepoint")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == expect, s"changepoint mismatch: $got vs $expect")
  }

  test("weighted median: sequential cumulative-weight referee agrees") {
    val li = util.t(spark, sf, "lineitem").collect()
      .map(r => (r.getString(8), math.round(r.getDouble(5) * 100),
        math.round(r.getDouble(4))))
    val expect = li.groupBy(_._1).view.mapValues { g =>
      val sorted = g.map(t => (t._2, t._3)).sortBy(_._1)
      val tw = sorted.map(_._2).sum
      var cw = 0L
      val med = sorted.find { case (_, w) => cw += w; cw * 2 >= tw }.get._1
      (med, tw)
    }.toMap
    val got = SparkEntry.queries("q109_weighted_median")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect, s"wmedian mismatch: $got vs $expect")
    // the defining property: units below the weighted median never
    // exceed half the total weight
    li.groupBy(_._1).foreach { case (g, rows) =>
      val below = rows.filter(_._2 < got(g)._1).map(_._3).sum
      assert(below * 2 < got(g)._2 ||
        rows.count(_._2 == got(g)._1) > 0 && below * 2 <= got(g)._2,
        s"group $g: weight below median exceeds half")
    }
  }

  test("iqr fences: rank-pick quartile referee agrees; fences bracket the IQR") {
    val ev = util.t(spark, sf, "events").collect()
      .map(r => (r.getString(3), math.round(r.getDouble(4) * 100)))
    val expect = ev.groupBy(_._1).view.mapValues { g =>
      val s = g.map(_._2).sorted
      val n = s.length.toLong
      val q1 = s(((n + 3) / 4 - 1).toInt)
      val q3 = s(((3 * n + 3) / 4 - 1).toInt)
      val lo2 = 2 * q1 - 3 * (q3 - q1); val hi2 = 2 * q3 + 3 * (q3 - q1)
      (n, q1, q3, s.count(_ * 2 < lo2).toLong, s.count(_ * 2 > hi2).toLong)
    }.toMap
    val got = SparkEntry.queries("meta_outlier_iqr")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == expect, s"iqr mismatch: $got vs $expect")
    got.values.foreach { case (_, q1, q3, _, _) =>
      assert(q1 <= q3, "quartiles must be ordered")
    }
  }

  test("decile migration: sequential ntile referee agrees; matrix covers both-active") {
    val o = util.t(spark, sf, "orders").collect()
      .map(r => (r.getLong(1), r.getTimestamp(4).getTime / 86400000L,
        math.round(r.getDouble(3) * 100)))
    val cut = (o.map(_._2).min + o.map(_._2).max + 1) / 2
    def deciles(rows: Seq[(Long, Long)]): Map[Long, Long] = {
      val sorted = rows.sortBy { case (c, r) => (-r, c) }
      val n = sorted.size; val big = n % 10; val base = n / 10
      sorted.zipWithIndex.map { case ((c, _), i) =>
        val d = if (i < big * (base + 1)) i / (base + 1)
        else big + (i - big * (base + 1)) / base
        c -> (d + 1L)
      }.toMap
    }
    val h1 = deciles(o.filter(_._2 < cut).groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toSeq)
    val h2 = deciles(o.filter(_._2 >= cut).groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toSeq)
    val expect = h1.keys.toSeq.filter(h2.contains)
      .map(c => (h1(c), h2(c)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q110_decile_migration")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect, s"migration mismatch: ${got.toSeq.diff(expect.toSeq).take(3)}")
    assert(got.values.sum == h1.keySet.intersect(h2.keySet).size.toLong,
      "the matrix must cover exactly the both-halves-active customers")
  }

  test("temporal split: sequential referee agrees; no event-time leakage") {
    val ev = util.t(spark, sf, "events").collect()
      .map(r => (r.getLong(0), micros(r.getTimestamp(1))))
      .sortBy(t => (t._2, t._1))
    val n = ev.length.toLong
    val e = math.max(n / 200, 1L)
    val k1 = n * 70 / 100; val k2 = n * 85 / 100
    val tagged = ev.zipWithIndex.map { case ((id, ts), i) =>
      val rn = i + 1L
      val split = if (rn <= k1) "train"
      else if (rn <= k1 + e) "embargo"
      else if (rn <= k2) "val"
      else if (rn <= k2 + e) "embargo" else "test"
      (split, id, ts)
    }
    val expect = tagged.groupBy(_._1).view.mapValues { g =>
      (g.size.toLong, g.map(_._2).reduce(_ ^ _), g.map(_._2).sum)
    }.toMap
    val got = SparkEntry.queries("sample_temporal_split")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (s, x) =>
      assert(got(s) == x, s"split $s: got ${got(s)}, referee $x")
    }
    // leakage check: every train event precedes every val event, and
    // every val event precedes every test event, in (ts, id) order
    def maxKey(s: String) = tagged.filter(_._1 == s).map(t => (t._3, t._2)).max
    def minKey(s: String) = tagged.filter(_._1 == s).map(t => (t._3, t._2)).min
    assert(Ordering[(Long, Long)].lt(maxKey("train"), minKey("val")))
    assert(Ordering[(Long, Long)].lt(maxKey("val"), minKey("test")))
    // the embargo really buffers both boundaries: 2e rows withheld
    assert(expect("embargo")._1 == 2 * e, "embargo must withhold 2e rows")
  }
}
