package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-15 specs for the self-healing bench-of-record: (1) the
  * per-query requote detector laws on synthetic inflated timings —
  * the r14 driver artifact's burst victims (3.6–13.7× their quiet
  * pins) must all flag while honest round-over-round drift (≤ ~2×)
  * and pinless/zero-pin entries never do; (2) the committed-detail
  * pin parser on real and degenerate inputs, including the
  * auto-refresh property that the sentinel pins come from the
  * committed close, not code constants; (3) the targeted-run detail
  * filename switch — a SPARK_GRAFT_BENCH_ONLY run must never clobber
  * the full-registry BENCH_DETAIL.json (r14 lost the driver's
  * 434-entry close to exactly that).
  */
class Round15Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("seed-BFS artifact laws: 8 level-0 seeds with sigma 1, per-seed " +
      "levels partition the reached set, sigma >= 1 everywhere, and the " +
      "per-(seed, level) counts reconcile with harmonic centrality") {
    import org.apache.spark.sql.functions._
    val lv = spark.read.parquet(
      s"${operators.Graph.seedBfsRoot(spark, sf)}/levels")
    val l0 = lv.filter(col("level") === 0L)
    assert(l0.count() == 8 && l0.filter(col("sigma") =!= 1L).count() == 0)
    assert(l0.filter(col("seed") =!= col("node")).count() == 0)
    assert(lv.filter(col("sigma") < 1L).count() == 0)
    // a (seed, node) pair appears at EXACTLY one level (first reach)
    assert(lv.groupBy(col("seed"), col("node")).count()
      .filter(col("count") > 1L).count() == 0)
    // the artifact's distance distribution IS harmonic's n_reached
    val fromArtifact = lv.filter(col("level") > 0L)
      .groupBy(col("seed")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val harmonic = operators.Graph.harmonicCentrality(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromArtifact == harmonic.map { case (s, n) => s -> n })
  }

  test("requote detector: entries over the factor x their pin flag, " +
      "sub-factor drift and pinless entries do not, output is name-sorted") {
    val pins = Map("a" -> 0.17, "b" -> 0.40, "c" -> 2.09, "d" -> 1.0,
      "zero" -> 0.0, "neg" -> -1.0)
    // r14 artifact shapes: kt_mapvalues 0.17->2.30 (13.5x),
    // sample_walk_forward 0.40->4.51 (11.3x), text_ccnet_buckets
    // 2.09->15.15 (7.2x); "d" drifts 1.9x (under the 2.0 default);
    // "new" has no pin
    val measured = Map("a" -> 2.30, "b" -> 4.51, "c" -> 15.15,
      "d" -> 1.9, "new" -> 9.9, "zero" -> 5.0, "neg" -> 5.0)
    assert(Bench.requoteNames(measured, pins) == Seq("a", "b", "c"))
    // exactly at the factor is NOT over it (default 2.0, explicit 3.0)
    assert(Bench.requoteNames(Map("d" -> 2.0), pins).isEmpty)
    assert(Bench.requoteNames(Map("d" -> 2.001), pins) == Seq("d"))
    assert(Bench.requoteNames(Map("d" -> 3.0), pins, 3.0).isEmpty)
    assert(Bench.requoteNames(Map("d" -> 3.001), pins, 3.0) == Seq("d"))
    // the r15-close burst shape a 3.0 factor missed: 2.5x flags at 2.0
    assert(Bench.requoteNames(Map("d" -> 2.5), pins) == Seq("d"))
    // no pins at all -> nothing to compare against
    assert(Bench.requoteNames(measured, Map.empty).isEmpty)
  }

  test("detail pin parser: extracts the queries object, survives " +
      "missing/empty/truncated JSON, and the committed close parses " +
      "with live sentinel pins in it") {
    val sample = """{"metric":"total","value":317.3,"unit":"sec","n":429,""" +
      """"queries":{"q1_agg":0.5,"graph_triangles":0.18,"x":1.2e-1},""" +
      """"amortized":["q1_agg"],"load1_pre":0.9,"contended":false}"""
    val got = Bench.parseDetailQueries(sample)
    assert(got == Map("q1_agg" -> 0.5, "graph_triangles" -> 0.18, "x" -> 0.12))
    assert(Bench.parseDetailQueries("").isEmpty)
    assert(Bench.parseDetailQueries("{\"metric\":\"total\"}").isEmpty)
    assert(Bench.parseDetailQueries("{\"queries\":{").isEmpty)
    // a full-registry close must carry every sentinel, so the canary
    // auto-refreshes instead of rotting on code constants — asserted
    // on a SYNTHETIC full-size detail (the unit suite must not couple
    // to the mutable benchmark artifact in the working tree: a bench
    // run at another SF or registry size would fail correct code)
    val synthQs = ((1 to 450).map(i => s"syn_$i" -> (0.1 + i * 0.001)) ++
      Bench.sentinelFallbackPins.keys.map(_ -> 0.2)).toMap
    val synth = s"""{"metric":"total","value":290.1,"unit":"sec",""" +
      s""""n":${synthQs.size},"queries":${synthQs.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")},"amortized":[],"load1_pre":0.5,""" +
      s""""requoted":[],"contended":false,"sf":"/root/testdata/sf0.1"}"""
    val synthPins = Bench.quietSf01Pins(synth)
    assert(synthPins.size == synthQs.size, "synthetic close must round-trip")
    for ((k, v) <- synthQs)
      assert(math.abs(synthPins(k) - v) < 1e-12, s"pin $k mangled")
    // the committed-file checks run only when the artifact in the
    // working tree self-declares as a quiet sf0.1 full-registry close
    val p = java.nio.file.Paths.get("BENCH_DETAIL.json")
    if (java.nio.file.Files.isReadable(p)) {
      val committed = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      val pins = Bench.quietSf01Pins(committed)
      // if the artifact CLAIMS to be a quiet sf0.1 close, the read
      // guard must accept it — a claimed-quiet file with a broken n
      // stamp is a real defect, not a skippable foreign artifact
      val claimsQuiet =
        Bench.extractJsonString(committed, "sf")
          .exists(_.stripSuffix("/").endsWith("sf0.1")) &&
          Bench.extractJsonBool(committed, "contended").contains(false)
      assert(!claimsQuiet || pins.nonEmpty,
        "committed detail claims quiet sf0.1 but fails pin validation")
      if (pins.nonEmpty) { // validated: sf0.1, contended:false, n matches
        assert(pins.size > 400, s"committed close parsed only ${pins.size}")
        for (name <- Bench.sentinelFallbackPins.keys) {
          assert(pins.get(name).exists(_ > 0), s"sentinel $name missing")
        }
        // the live-pin merge prefers the committed value
        for ((name, pin) <- Bench.sentinelPins) {
          assert(pin == pins(name), s"live pin for $name not from the close")
        }
      }
    }
  }

  test("pin-ratio stats: median and p90 of measured/pin — the broad-" +
      "drift stamp a uniform slowdown leaves when every per-query " +
      "detector stays silent") {
    val pins = Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0, "zero" -> 0.0)
    // quiet run: everything at its pin
    assert(Bench.pinRatioStats(Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0), pins)
      .contains((1.0, 1.0)))
    // the r15 third-run shape: uniform ~1.2x, no query over 2x
    val (med, p90) = Bench.pinRatioStats(
      Map("a" -> 1.2, "b" -> 2.4, "c" -> 4.8), pins).get
    assert(med > 1.19 && med < 1.21 && p90 > 1.19 && p90 < 1.21)
    // zero/absent pins are excluded; none usable -> None
    assert(Bench.pinRatioStats(Map("zero" -> 9.0, "new" -> 9.0), pins).isEmpty)
    assert(Bench.pinRatioStats(Map("a" -> 1.0), Map.empty).isEmpty)
    // p90 >= median on a skewed run
    val (m2, p2) = Bench.pinRatioStats(
      Map("a" -> 1.0, "b" -> 2.0, "c" -> 40.0), pins).get
    assert(p2 >= m2 && p2 == 10.0)
  }

  test("targeted bench runs write a name-keyed sidecar, never the " +
      "full-registry detail file") {
    assert(Bench.detailFileName(None) == "BENCH_DETAIL.json")
    val a = Bench.detailFileName(Some(Set("q1_agg", "q2_filter_project")))
    assert(a.startsWith("BENCH_DETAIL_only_") && a.endsWith(".json"))
    // deterministic and order-insensitive (Set iteration order varies)
    assert(a == Bench.detailFileName(Some(Set("q2_filter_project", "q1_agg"))))
    // different selections get different sidecars
    val b = Bench.detailFileName(Some(Set("q1_agg")))
    assert(b != a && b != "BENCH_DETAIL.json")
  }
}
