package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 scale-design pins. The DuckDB oracle value-checks results;
  * these specs assert the PLANS the 100 TB mandate requires:
  *
  *  - `sim_knn_join_ivf` scores candidates relationally (equi-joins
  *    back to the vector table) — no typed `mapPartitions` over a
  *    driver-collected corpus anywhere in the plan, and the only
  *    driver-materialized relations are the k×dim codebook.
  *  - `graph_triangles` ranks its sparsified edge list through
  *    `TakeOrderedAndProject` (bounded per-partition heaps), never an
  *    un-partitioned global `Window` sort.
  */
class Round7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("sim_knn_join_ivf plan is fully relational — no driver-side scoring") {
    val df = operators.Similarity.knnJoinIvf(spark, sf)
    val plan = df.queryExecution.optimizedPlan
    val nodeNames = plan.collect { case p => p.nodeName }
    // a collect().toMap + mapPartitions scoring stage (the round-6
    // formulation) shows up as MapPartitions/DeserializeToObject or an
    // ExternalRDD scan — none of those may appear
    val forbidden = nodeNames.filter(n =>
      n.contains("MapPartitions") || n.contains("ExternalRDD") ||
        n.contains("DeserializeToObject"))
    assert(forbidden.isEmpty, s"driver/typed scoring nodes in plan: $forbidden")
    // the only local (driver-built) relations are the trained codebook
    // rows — k×dim, bounded — never the corpus
    val locals = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l.data.length
    }
    assert(locals.forall(_ <= operators.Similarity.ivfCentroids),
      s"data-sized local relation in plan: row counts $locals")
  }

  test("graph_triangles edge ranking uses TakeOrdered, not a global window") {
    val edges = operators.Graph.topCoSupplyEdges(spark, sf)
    val physical = edges.queryExecution.executedPlan.toString
    assert(!physical.contains("Window"),
      s"un-partitioned Window survives in edge-ranking plan:\n$physical")
    assert(physical.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in edge-ranking plan:\n$physical")
  }

  test("streaming sink replay with FEWER writer partitions leaves no stale parts") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType)))
    val out = util.scratchDir("stream_sink_shrink_replay")
    new java.io.File(out).mkdirs()
    val sw = new sources.GraftTextStreamingWrite(out, schema)
    val factory = sw.createStreamingWriterFactory(null)
    def runEpoch(nParts: Int, base: Long): Unit = {
      val msgs = (0 until nParts).map { p =>
        val w = factory.createWriter(p, base + p, 9L)
        w.write(InternalRow(base + p))
        w.commit()
      }
      sw.commit(9L, msgs.toArray)
    }
    // first attempt writes 3 partitions; an executor also leaves an
    // orphaned staged file behind (task retried, message never reached
    // the driver)
    runEpoch(3, 100L)
    val orphan = factory.createWriter(7, 777L, 9L)
    orphan.write(InternalRow(777L)); orphan.commit()
    // the replay runs with ONE partition — publish must REPLACE the
    // whole epoch, not leave part-e9-00001/2 (or the orphan) beside it
    runEpoch(1, 200L)
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.count(_.startsWith("part-e9-")) == 1,
      s"stale parts survived the shrunken replay: ${files.toSeq.sorted}")
    assert(!files.exists(_.startsWith("_tmp_e9_")),
      s"orphaned staged files survived the replay: ${files.toSeq.sorted}")
    val vals = spark.read.schema("id long").csv(out).collect().map(_.getLong(0)).toSeq
    assert(vals == Seq(200L), s"exactly-once violated after shrunken replay: $vals")
  }

  test("graft_bottomk rejects non-integral priority/id at analysis time") {
    import spark.implicits._
    val df = Seq((1.5, 1L), (2.5, 2L)).toDF("p", "id")
    df.createOrReplaceTempView("bk_typed")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_bottomk(p, id, 2) FROM bk_typed").collect()
    }
    assert(err.getMessage.contains("integral"),
      s"expected an integral-type analysis error, got: ${err.getMessage}")
    // decimal priority must also fail at analysis, not CCE at runtime
    val err2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_bottomk(cast(p as decimal(10,2)), id, 2) FROM bk_typed")
        .collect()
    }
    assert(err2.getMessage.contains("integral"))
  }

  test("manifest pruning with a never-matching predicate returns empty, not an error") {
    val df = sources.FileSources.manifestPruningFor(
      spark, sf, "2099-01-01", "2099-12-31")
    assert(df.collect().isEmpty, "a fully-pruned read must yield zero rows")
  }

  test("AutoRangeJoin caps per-row fan-out: wide intervals take the fallback branch") {
    import spark.implicits._
    val wKey = "spark.graft.autoRangeJoin.binWidth"
    val cKey = "spark.graft.autoRangeJoin.maxBinsPerRow"
    // id 2 spans 2e9 bins at w=1 — sequence() alone would overflow its
    // 2^31 element cap; the guard must route it to the band-join tail
    val iv = Seq((1L, 10L, 12L), (2L, 0L, 2000000000L), (3L, 5L, 5L))
      .toDF("id", "lo", "hi")
    val pts = Seq((100L, 11L), (101L, 1999999999L), (102L, 5L), (103L, -7L))
      .toDF("pid", "pt")
    def run() = pts.join(iv, col("pt") >= col("lo") && col("pt") <= col("hi"))
    spark.conf.set(wKey, "1")
    try {
      val on = run()
      val optimized = on.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_range_bin"), s"rule did not fire:\n$optimized")
      assert(optimized.contains("Union"), s"wide-interval fallback branch missing:\n$optimized")
      val got = on.select(col("pid"), col("id")).as[(Long, Long)].collect().toSet
      spark.conf.set(wKey, "0")
      val want = run().select(col("pid"), col("id")).as[(Long, Long)].collect().toSet
      assert(got == want, s"capped rewrite changed results: got=$got want=$want")
      assert(want == Set((100L, 1L), (100L, 2L), (101L, 2L), (102L, 2L), (102L, 3L)),
        s"fixture expectation drifted: $want")
    } finally { spark.conf.unset(wKey); spark.conf.unset(cKey) }
  }

  test("streaming LSH hot bucket degrades to a deterministic bounded sample") {
    import operators.StreamingOps.{BandedDoc, NearDupProcessor}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import spark.implicits._
    val pk = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(pk)
    spark.conf.set(pk,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val cap = 8
      val n = 120L
      // a degenerate shingle: every doc posts to the SAME bucket
      def run(order: Seq[Long], qn: String): (Long, Set[Long], Set[Long]) = {
        implicit val ctx = spark.sqlContext
        val ms = MemoryStream[BandedDoc]
        val q = ms.toDS().groupByKey(d => (d.band, d.band_key))
          .transformWithState(new NearDupProcessor(cap),
            TimeMode.None(), OutputMode.Append())
          .toDF("a_id", "b_id")
          .writeStream.format("memory").queryName(qn)
          .outputMode(OutputMode.Append).start()
        ms.addData(order.map(id => BandedDoc(0, 42L, id)))
        q.processAllAvailable()
        val firehose = spark.table(qn).collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(firehose.length <= order.length * cap,
          s"unbounded pair fan-out: ${firehose.length} pairs from ${order.length} docs")
        // the probe's pairs reveal exactly the bucket's current residents
        ms.addData(BandedDoc(0, 42L, 999L))
        q.processAllAvailable(); q.stop()
        val all = spark.table(qn).collect().map(r => (r.getLong(0), r.getLong(1)))
        val residents = all.filter(p => p._1 == 999L || p._2 == 999L)
          .map(p => if (p._1 == 999L) p._2 else p._1).toSet
        val covered = all.flatMap(p => Seq(p._1, p._2)).toSet
        (firehose.length.toLong, residents, covered)
      }
      val ids = (1L to n).toSeq
      val (_, res1, covered) = run(ids, "hot_fwd")
      val expected = ids.sortBy(id => (operators.StreamingOps.mixId(id), id))
        .take(cap).toSet
      assert(res1 == expected,
        s"resident sample is not bottom-$cap by mix: $res1 vs $expected")
      // surviving recall: EVERY doc still surfaced in at least one
      // candidate pair (un-admitted arrivals pair against the sample)
      assert((ids.toSet -- covered).isEmpty,
        s"docs lost all candidate coverage: ${(ids.toSet -- covered).take(5)}")
      // arrival-order independence of the converged sample
      val (_, res2, _) = run(ids.reverse, "hot_rev")
      assert(res2 == expected, s"sample depends on arrival order: $res2")
    } finally {
      prevProv match {
        case Some(v) => spark.conf.set(pk, v); case None => spark.conf.unset(pk)
      }
    }
  }

  test("streaming LSH bucket entries expire after the wall-clock TTL") {
    import operators.StreamingOps.{BandedDoc, NearDupProcessor}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig}
    import spark.implicits._
    val pk = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(pk)
    spark.conf.set(pk,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val ctx = spark.sqlContext
      val ms = MemoryStream[BandedDoc]
      val q = ms.toDS().groupByKey(d => (d.band, d.band_key))
        .transformWithState(
          new NearDupProcessor(ttl = TTLConfig(java.time.Duration.ofMillis(200L))),
          TimeMode.ProcessingTime(), OutputMode.Append())
        .toDF("a_id", "b_id")
        .writeStream.format("memory").queryName("lsh_ttl")
        .option("checkpointLocation", util.scratchDir("lsh_ttl_cp"))
        .outputMode(OutputMode.Append).start()
      def pairs() = spark.table("lsh_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // doc 1 joins the bucket; the engine churns batches on its own
      // (ProcessingTime mode), so it is processed promptly and its
      // entry expires 200 ms later
      ms.addData(BandedDoc(0, 7L, 1L))
      Thread.sleep(800L)
      // docs 2 and 3 arrive AFTER doc 1's entry expired: the only
      // candidate pair the index may produce is (2, 3)
      ms.addData(BandedDoc(0, 7L, 2L))
      ms.addData(BandedDoc(0, 7L, 3L))
      val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
      while (!pairs().contains((2L, 3L)) && System.nanoTime < deadline)
        Thread.sleep(50L)
      q.stop()
      assert(pairs() == Set((2L, 3L)),
        s"expired bucket entry still produced pairs: ${pairs()}")
    } finally {
      prevProv match {
        case Some(v) => spark.conf.set(pk, v); case None => spark.conf.unset(pk)
      }
    }
  }

  test("processing-time punctuator evicts on wall clock and clears state") {
    import operators.StreamingOps.{ProcTtlProcessor, SeqRecord}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import spark.implicits._
    val pk = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(pk)
    spark.conf.set(pk,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val ctx = spark.sqlContext
      val cp = util.scratchDir("punct_spec_cp")
      val ttlMs = 1500L
      val ms = MemoryStream[SeqRecord]
      // continuous run: the engine self-schedules micro-batches to
      // service wall-clock timers (the punctuator lifecycle)
      val q = ms.toDS().groupByKey(_.key)
        .transformWithState(new ProcTtlProcessor(ttlMs),
          TimeMode.ProcessingTime(), OutputMode.Update())
        .writeStream.format("memory").queryName("punct")
        .option("checkpointLocation", cp)
        .outputMode(OutputMode.Update).start()
      def rows() = spark.table("punct").collect()
        .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2), r.getBoolean(3)))
      def pollUntil(what: String)(p: => Boolean): Unit = {
        val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
        while (!p && System.nanoTime < deadline) Thread.sleep(50L)
        assert(p, s"timed out waiting for $what: ${rows().toSeq}")
      }
      def at(s: String) = java.sql.Timestamp.valueOf(s)
      val t0 = System.nanoTime
      // key "a" carries an equal-ts PAIR delivered higher-seq FIRST:
      // the (ts, seq) tie-break must pick v2 (seq 3) regardless of the
      // iterator order the shuffle hands the processor
      ms.addData(SeqRecord("a", "v1", at("2024-01-01 10:00:00"), 1L),
        SeqRecord("a", "v2", at("2024-01-01 11:00:00"), 3L),
        SeqRecord("a", "v2x", at("2024-01-01 11:00:00"), 2L),
        SeqRecord("b", "w1", at("2024-01-01 10:30:00"), 4L))
      pollUntil("both evictions")(rows().count(_._4) == 2)
      val elapsedMs = (System.nanoTime - t0) / 1000000
      // periodic semantics: the wall-clock TTL gates the emission
      assert(elapsedMs >= ttlMs,
        s"evictions surfaced ${elapsedMs} ms after arming — before the $ttlMs ms TTL")
      val ev = rows().filter(_._4).map(r => (r._1, r._2)).toSet
      assert(ev == Set(("a", "v2"), ("b", "w1")),
        s"idle keys must evict with their LATEST value on wall-clock expiry: $ev")
      // state must be CLEARED: a re-entering record with an OLDER ts
      // than the evicted latest becomes the fresh latest (stale state
      // would swallow the upsert)
      ms.addData(SeqRecord("a", "v0", at("2024-01-01 09:00:00"), 5L))
      pollUntil("fresh re-entry upsert")(
        rows().contains(("a", "v0", at("2024-01-01 09:00:00"), false)))
      q.stop()
    } finally {
      prevProv match {
        case Some(v) => spark.conf.set(pk, v); case None => spark.conf.unset(pk)
      }
    }
  }

  test("blocked exact k-NN join equals the broadcast tier row-for-row") {
    val a = operators.Similarity.knnJoinExact(spark, sf)
      .collect().map(_.toSeq).toSeq
    val b = operators.Similarity.knnJoinExactBlocked(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(a.nonEmpty, "exact tier returned no rows")
    assert(a == b, {
      val diff = a.zip(b).filter { case (x, y) => x != y }.take(3)
      s"tiers diverge (${diff.size}+ rows): $diff"
    })
  }

  test("hll sketch table: error-bounded estimates and exact mergeability") {
    val rows = operators.Warehouse.metaHllSketches(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue(), r.getLong(2)))
    assert(rows.length >= 2, s"expected monthly rows + ALL: ${rows.toSeq}")
    rows.foreach { case (scope, est, exact) =>
      assert(math.abs(est - exact) <= math.max(2.0, exact * 0.05),
        s"$scope: estimate $est strays from exact $exact")
    }
    // mergeability: the union of the materialized monthly sketches
    // must estimate EXACTLY what one whole-set sketch estimates —
    // the property that lets rollups skip the fact table
    val all = rows.find(_._1 == "ALL").get
    val direct = util.t(spark, sf, "orders")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("e"))
      .collect()(0).getAs[Number](0).longValue()
    assert(all._2 == direct,
      s"sketch union (${all._2}) != whole-set sketch ($direct)")
  }

  test("kmv sketches: referee equality, both estimator paths, exact mergeability") {
    import graft.functions.Kmv
    def r2(x: Double): Double = // Spark round(x, 2) is HALF_UP on doubles
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = operators.Warehouse.metaKmvOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val data = util.t(spark, sf, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"), col("o_custkey"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    // sequential in-JVM referee: one-threaded sketch per month — the
    // distributed partial-merge must land on the identical sketch
    val refSk = data.groupBy(_._1).map { case (m, rs) =>
      val b = new Kmv.Buffer(64)
      rs.map(_._2).foreach(c => b.add(Kmv.mix(c)))
      m -> Kmv.serialize(b)
    }
    val monthExact = data.groupBy(_._1).map { case (m, rs) => m -> rs.map(_._2).distinct.size }
    // the fixture must exercise BOTH paths: unsaturated (exact) months
    // and a saturated (estimating) rollup
    assert(rows.exists(_._3 > 64), s"no saturated scope — raise fixture or lower k")
    assert(rows.exists(r => r._3 < 64 && !r._1.contains("|")), "no unsaturated month")
    rows.foreach { case (scope, est, exact) =>
      assert(math.abs(est - exact) <= math.max(2.0, 0.55 * exact),
        s"$scope: estimate $est strays from exact $exact beyond 4-sigma")
    }
    rows.filter(r => !r._1.contains("|") && r._1 != "ALL").foreach { case (m, est, exact) =>
      assert(est == r2(Kmv.estimate(refSk(m))),
        s"$m: distributed sketch diverges from sequential referee")
      if (exact < 64) assert(est == exact.toDouble, s"$m: unsaturated sketch must be exact")
    }
    // overlap rows are exact whenever both sides are unsaturated (θ=1)
    rows.filter(_._1.contains("|")).foreach { case (scope, est, exact) =>
      val Array(m1, m2) = scope.split('|')
      if (monthExact(m1) < 64 && monthExact(m2) < 64)
        assert(est == exact.toDouble, s"$scope: unsaturated intersection must be exact")
    }
    // exact mergeability: union of the monthly sketches IS the
    // bottom-k of the whole set — ALL must equal a one-shot sketch
    val whole = new Kmv.Buffer(64)
    data.map(_._2).foreach(c => whole.add(Kmv.mix(c)))
    assert(rows.find(_._1 == "ALL").get._2 == r2(Kmv.estimate(Kmv.serialize(whole))),
      "union-of-monthly sketch != whole-set sketch")
  }

  test("shard plan: multiplicative-hash shards are balanced and exhaustive") {
    val rows = operators.TextAnalysis.shardPlan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (0L until 8L), s"missing shards: ${rows.toSeq}")
    val docs = rows.map(_._2)
    assert(docs.max.toDouble / docs.min <= 1.3,
      s"shard skew ${docs.max}/${docs.min} — multiplicative hash failed to spread")
    val total = util.t(spark, sf, "documents").count()
    assert(docs.sum == total, "shards must partition the corpus exactly")
  }

  test("bpe training + application match a sequential in-JVM referee merge-for-merge") {
    def greedyMerge(ss: Vector[String], a: String, b: String): Vector[String] = {
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < ss.length) {
        if (i < ss.length - 1 && ss(i) == a && ss(i + 1) == b) { buf += (a + b); i += 2 }
        else { buf += ss(i); i += 1 }
      }
      buf.toVector
    }
    val got = operators.TextAnalysis.bpeTrainTable(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val wf = util.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w")).filter(col("w") =!= "")
      .groupBy("w").count().collect().map(r => (r.getString(0), r.getLong(1)))
    val freqs = wf.toMap
    var segs: Map[String, Vector[String]] =
      wf.map { case (w, _) => w -> w.map(_.toString).toVector }.toMap
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var r = 0
    var go = true
    while (r < 16 && go) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      for { (w, ss) <- segs; if ss.length >= 2; i <- 0 until ss.length - 1 }
        counts((ss(i), ss(i + 1))) = counts.getOrElse((ss(i), ss(i + 1)), 0L) + freqs(w)
      if (counts.isEmpty) go = false
      else {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        if (cnt < 2) go = false
        else {
          merges += ((r + 1, a, b, a + b, cnt))
          segs = segs.map { case (w, ss) => w -> greedyMerge(ss, a, b) }
          r += 1
        }
      }
    }
    assert(got.toSeq == merges.toSeq,
      s"merge tables diverge:\n got=${got.toSeq}\nwant=${merges.toSeq}")
    // application: per-doc BPE token counts equal replaying the
    // referee's final segmentations over the raw word stream
    val gotTok = operators.TextAnalysis.bpeTokens(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docWords = util.t(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docWords.groupBy(_._1).toSeq.map { case (d, ws) =>
      (d, ws.length.toLong, ws.map(x => segs(x._2).length.toLong).sum)
    }.sortBy(_._1)
    assert(gotTok.toSeq == want, "bpe token counts diverge from referee")
  }

  test("streaming kmv distinct converges to the batch sketch bit-for-bit") {
    val got = operators.StreamingOps.streamKmvDistinct(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    import graft.functions.KmvSketch._
    val batch = util.t(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(kmvEstimate(kmvSketch(col("user_id"), 64)).as("e"),
        countDistinct(col("user_id")).as("exact"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(got.map(_._1).toSet == batch.keySet, "key sets diverge")
    got.foreach { case (k, e) =>
      // exact mergeability: any batch split must land on the batch sketch
      assert(e == batch(k)._1, s"$k: stream estimate $e != batch sketch ${batch(k)._1}")
      val exact = batch(k)._2
      assert(math.abs(e - exact) <= math.max(2.0, 0.55 * exact),
        s"$k: estimate $e strays from exact $exact")
    }
  }

  test("cms term frequencies: never-underestimate, referee equality, lossless union") {
    import graft.functions.Cms
    val rows = operators.TextAnalysis.cmsTermFreq(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // CMS NEVER underestimates — a deterministic guarantee, not a bound
    rows.foreach { case (src, term, est, exact) =>
      assert(est >= exact, s"$src/$term: CMS underestimated ($est < $exact)")
    }
    // the absent probe must appear with exact = 0 in every scope
    assert(rows.count { case (_, t, _, e) => t == "quantum" && e == 0L } >= 2,
      "absent probe missing")
    // sequential referee: one-threaded sketches per source must equal
    // the distributed partial-merge estimates bit-for-bit, and the
    // ALL row must equal a whole-corpus sequential sketch (union is
    // lossless counter addition)
    val words = util.t(spark, sf, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = words.groupBy(_._1)
    val sketches = scala.collection.mutable.HashMap[String, Array[Long]]()
    bySource.foreach { case (src, ws) =>
      val c = new Array[Long](Cms.Depth * Cms.Width)
      ws.foreach(w => Cms.update(c, org.apache.spark.unsafe.types.UTF8String.fromString(w._2)))
      sketches(src) = c
    }
    val all = new Array[Long](Cms.Depth * Cms.Width)
    sketches.values.foreach { c => var i = 0; while (i < all.length) { all(i) += c(i); i += 1 } }
    sketches("ALL") = all
    rows.foreach { case (src, term, est, _) =>
      val want = Cms.estimate(sketches(src),
        org.apache.spark.unsafe.types.UTF8String.fromString(term))
      assert(est == want, s"$src/$term: distributed $est != sequential referee $want")
    }
    // error bound sanity: overestimate <= 8 * N / Width on the fixture
    bySource.foreach { case (src, ws) =>
      val n = ws.length
      rows.filter(_._1 == src).foreach { case (_, term, est, exact) =>
        assert(est - exact <= math.max(3L, 8L * n / Cms.Width),
          s"$src/$term: overcount ${est - exact} beyond bound for n=$n")
      }
    }
  }

  test("quantile sketch: sampled order statistics sit at the right ranks") {
    val rows = operators.Warehouse.metaQuantileSketch(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cents = util.t(spark, sf, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"),
        expr("cast(round(o_totalprice * 100, 0) as bigint)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val all = cents.map(_._2).sorted
    def rankOf(v: Long, xs: Array[Long]): Double = xs.count(_ <= v).toDouble / xs.length
    // the sampled ALL row: order statistics within the O(1/sqrt(k)) rank band
    val allRow = rows.find(_._1 == "ALL").get
    assert(allRow._2 == 256 && all.length > 256, "ALL must exercise the sampling path")
    assert(rankOf(allRow._3, all) >= 0.35 && rankOf(allRow._3, all) <= 0.65,
      s"ALL p50 ${allRow._3} at rank ${rankOf(allRow._3, all)}")
    assert(rankOf(allRow._4, all) >= 0.78 && rankOf(allRow._4, all) <= 0.98,
      s"ALL p90 ${allRow._4} at rank ${rankOf(allRow._4, all)}")
    // months under k rows degrade to EXACT order statistics
    val byMonth = cents.groupBy(_._1)
    val exactMonths = rows.filter(r => r._1 != "ALL" && r._2 < 256)
    assert(exactMonths.nonEmpty, "no exact-path month at this sf")
    exactMonths.foreach { case (m, n, p50, p90) =>
      val xs = byMonth(m).map(_._2).sorted
      assert(n == xs.length, s"$m sample must be the whole month")
      assert(p50 == xs((xs.length - 1) / 2), s"$m p50 not the exact median")
      assert(p90 == xs(((xs.length - 1) * 9) / 10), s"$m p90 not the exact order statistic")
    }
  }

  test("kmv/cms SQL surface: registered functions compute and validate args") {
    util.t(spark, sf, "orders").createOrReplaceTempView("orders_sk")
    val exact = spark.sql(
      """SELECT count(DISTINCT o_custkey) AS d,
        | count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS f
        |FROM orders_sk""".stripMargin).collect()(0)
    val r = spark.sql(
      """SELECT graft_kmv_estimate(graft_kmv(o_custkey, 64)) AS d,
        | graft_cms_estimate(graft_cms(o_orderpriority), '1-URGENT') AS f
        |FROM orders_sk""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - exact.getLong(0)) <=
      math.max(2.0, 0.55 * exact.getLong(0)), "kmv estimate out of band")
    assert(r.getLong(1) >= exact.getLong(1), "cms underestimated via SQL")
    // union over a grouped sketch table == one whole-set sketch (exact
    // mergeability, through the SQL surface end-to-end)
    val merged = spark.sql(
      """WITH sk AS (SELECT o_orderstatus AS s, graft_kmv(o_custkey, 64) AS sk
        |            FROM orders_sk GROUP BY 1)
        |SELECT graft_kmv_estimate(graft_kmv_union(sk)) FROM sk""".stripMargin)
      .collect()(0).getDouble(0)
    assert(merged == r.getDouble(0), "union-of-groups != whole-set sketch")
    // intersections are non-negative and bounded by the smaller side
    val ov = spark.sql(
      """WITH sk AS (SELECT o_orderstatus AS s, graft_kmv(o_custkey, 64) AS sk,
        |                   count(DISTINCT o_custkey) AS d
        |            FROM orders_sk GROUP BY 1)
        |SELECT a.s, b.s, graft_kmv_intersect(a.sk, b.sk) AS est,
        |       least(a.d, b.d) AS cap
        |FROM sk a JOIN sk b ON a.s < b.s""".stripMargin).collect()
    assert(ov.nonEmpty)
    ov.foreach(row => assert(row.getDouble(2) >= 0.0 &&
      row.getDouble(2) <= row.getLong(3) * 1.6 + 2,
      s"intersect estimate ${row.getDouble(2)} vs cap ${row.getLong(3)}"))
    // bad args must fail at analysis, not at execution
    intercept[Exception](
      spark.sql("SELECT graft_kmv(o_custkey, 4) FROM orders_sk").collect())
    intercept[Exception](
      spark.sql("SELECT graft_cms_estimate(graft_cms(o_orderpriority)) FROM orders_sk").collect())
  }

  test("stream-stream outer join state SHRINKS once the watermark passes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(String, java.sql.Timestamp)]
    val purchases = MemoryStream[(String, java.sql.Timestamp)]
    val cDf = clicks.toDS().toDF("key", "click_ts")
      .withWatermark("click_ts", "0 seconds")
    val pDf = purchases.toDS().toDF("p_key", "p_ts")
      .withWatermark("p_ts", "0 seconds")
    val q = pDf.join(cDf,
        expr("key = p_key AND click_ts >= p_ts - INTERVAL 1 HOUR AND click_ts <= p_ts"),
        "leftOuter")
      .writeStream.format("memory").queryName("ss_evict")
      .outputMode("append").start()
    def at(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: 60 purchases + 60 clicks buffer as join state (the
    // watermark still allows future matches)
    purchases.addData((1 to 60).map(i => (s"u$i", at("2024-01-01 10:00:00"))))
    clicks.addData((1 to 60).map(i => (s"u$i", at("2024-01-01 09:30:00"))))
    q.processAllAvailable()
    def stateTotals = q.recentProgress.toSeq
      .flatMap(p => p.stateOperators.toSeq.map(s => s.numRowsTotal))
    val peak = stateTotals.max
    assert(peak >= 120, s"join state should hold both sides' rows: peak=$peak")
    // batch 2: both watermarks jump 10 hours — every buffered row is
    // now older than any possible match window and must be EVICTED
    // (not merely ignored): numRowsTotal drops, numRowsRemoved fires
    purchases.addData(("w", at("2024-01-01 20:00:00")))
    clicks.addData(("w", at("2024-01-01 20:00:00")))
    q.processAllAvailable()
    val progresses = q.recentProgress.toSeq
    q.stop()
    val removed = progresses.flatMap(_.stateOperators.toSeq).map(_.numRowsRemoved).sum
    val finalTotal = progresses.flatMap(p => p.stateOperators.toSeq.map(_.numRowsTotal))
      .lastOption.getOrElse(Long.MaxValue)
    // numRowsRemoved counts one side's store in this join shape
    // (measured 60 of the 120 buffered); the load-bearing proof of
    // PHYSICAL eviction is the numRowsTotal drop asserted below
    assert(removed >= 60,
      s"watermark passage must physically remove buffered rows: removed=$removed")
    assert(finalTotal < peak / 10,
      s"state did not shrink after watermark passage: final=$finalTotal peak=$peak")
  }

  // shared by the two dedup referees below
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("dedup_apply_minhash survivors equal an in-JVM exact-Jaccard referee") {
    import spark.implicits._
    // independent recomputation of the WHOLE pipeline: 3-shingles,
    // all-pairs exact Jaccard >= 0.8 (no LSH), keep-first drop,
    // per-lang survivor aggregate — plain Scala, no Spark, no DuckDB
    val docs = util.t(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .as[(Long, String, Long, String)].collect()
    def shingles3(text: String): Set[String] = {
      val ws = text.split(" ")
      if (ws.length < 3) Set.empty
      else (0 to ws.length - 3).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}").toSet
    }
    val sh = docs.map(d => d._1 -> shingles3(d._4)).toMap
    val ids = docs.map(_._1).sorted
    val dropped = scala.collection.mutable.HashSet.empty[Long]
    for (i <- ids.indices; j <- i + 1 until ids.length) {
      val (sa, sb) = (sh(ids(i)), sh(ids(j)))
      if (sa.nonEmpty && sb.nonEmpty) {
        val inter = (sa & sb).size
        if (inter > 0 &&
            round6(inter.toDouble / (sa.size + sb.size - inter)) >= 0.8)
          dropped += ids(j)
      }
    }
    val want = docs.filterNot(d => dropped(d._1))
      .groupBy(_._2).view
      .mapValues(g => (g.length.toLong, g.map(_._3).sum)).toMap
    val got = operators.Dedup.applyNearDupMinhash(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want, s"survivor audit diverges from referee:\n got=$got\nwant=$want")
  }

  test("dedup_semantic_clusters audit equals an in-JVM referee end-to-end") {
    import spark.implicits._
    // only the trained codebook comes from the engine (k x dim,
    // deterministic); assignment, in-cluster pairing, keep-first and
    // the final audit are all recomputed in plain Scala
    val e = util.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = operators.Similarity.trainCodebook(
        spark, e, operators.Similarity.ivfCentroids)
      .as[(Int, Seq[Double])].collect()
    val vecs = e.as[(Long, Seq[Double])].collect()
    def cos(x: Seq[Double], y: Seq[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val assign = vecs.map { case (id, v) =>
      id -> cents.map { case (cid, cv) => (cid, cos(v, cv)) }
        .minBy { case (cid, ac) => (-ac, cid) }._1
    }.toMap
    val byV = vecs.toMap
    val audit = assign.groupBy(_._2).map { case (cid, members) =>
      val ids = members.keys.toSeq.sorted
      val droppedHere = (for {
        i <- ids.indices; j <- i + 1 until ids.length
        if cos(byV(ids(i)), byV(ids(j))) >= 0.4
      } yield ids(j)).toSet
      cid -> ((ids.length.toLong, droppedHere.size.toLong,
        (ids.length - droppedHere.size).toLong))
    }
    val got = operators.Dedup.semanticDedup(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == audit,
      s"cluster audit diverges from referee:\n got=$got\nwant=$audit")
  }

  test("graph_triangles TakeOrdered edge set equals the window referee") {
    import spark.implicits._
    val got = operators.Graph.topCoSupplyEdges(spark, sf)
      .as[(Long, Long)].collect().toSet
    // independent referee: rank all co-supply pairs in memory
    val pairs = util.t(spark, sf, "orders")
      .join(util.t(spark, sf, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("l_suppkey").as("s"), col("o_custkey").as("c"))
      .distinct().as[(Long, Long)].collect()
    val ns = pairs.map(_._1).distinct.length
    val common = pairs.groupBy(_._2).values.flatMap { grp =>
      val ss = grp.map(_._1).distinct.sorted
      for (i <- ss.indices; j <- i + 1 until ss.length) yield (ss(i), ss(j))
    }.groupBy(identity).map { case (ab, xs) => (ab._1, ab._2, xs.size.toLong) }
    val want = common.toSeq
      .sortBy { case (a, b, n) => (-n, a, b) }
      .take(ns * 3).map { case (a, b, _) => (a, b) }.toSet
    assert(got == want,
      s"edge sets differ: extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
  }
}
