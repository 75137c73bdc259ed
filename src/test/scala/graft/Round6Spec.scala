package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 additions: the RFC-4180 escaping contract of the V2 text
  * sink (round-trip of delimiter/quote/newline payloads), task-retry
  * idempotence of its commit protocol, argument validation for the
  * injected `graft_heavy_hitters` SQL function, and the watermark
  * mechanics behind the two new streaming entries — TTL eviction
  * (evicted key re-enters as fresh) and the left-outer stream-stream
  * join (null-padded rows appear only after the watermark passes). */
class Round6Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def scratch(prefix: String): String = util.scratchDir(prefix)

  // ---- GraftTextSink: RFC-4180 escaping --------------------------------

  test("V2 text sink round-trips strings containing delimiter, quote, and newlines") {
    import spark.implicits._
    val rows = Seq(
      (1L, "plain"),
      (2L, "comma, separated, values"),
      (3L, "say \"hi\" twice \"\""),
      (4L, "line1\nline2"),
      (5L, "crlf\r\nend"),
      (6L, "all: ,\"x\",\n\"y\"\r\n,z"),
      (7L, "héllo, \"wörld\"")) // UTF-8 beyond ASCII — writer is explicit UTF-8
    val out = scratch("sink_escape")
    rows.toDF("id", "s").repartition(2)
      .write.format("graft.sources.GraftTextSink")
      .mode("append").option("path", out).save()
    // RFC-4180 readers: quote is the escape — inner quotes arrive doubled
    val back = spark.read
      .schema("id long, s string")
      .option("escape", "\"").option("multiLine", "true")
      .csv(out)
      .as[(Long, String)].collect().toSet
    assert(back == rows.toSet, s"round-trip mismatch: $back")
  }

  test("V2 sink task retry cannot double-publish: one commit message wins") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val schema = StructType(Seq(StructField("s", StringType)))
    val out = scratch("sink_retry")
    new java.io.File(out).mkdirs()
    val factory = new sources.GraftTextWriterFactory(out, schema)
    def row(s: String) = InternalRow(UTF8String.fromString(s))
    // attempt 1: task fails cleanly — abort() removes its staged file
    val w1 = factory.createWriter(0, taskId = 100L)
    w1.write(row("attempt1"))
    w1.abort()
    // attempt 2: executor dies WITHOUT abort — the staged file is
    // orphaned, but stays reader-invisible under the `_` convention
    val w2 = factory.createWriter(0, taskId = 101L)
    w2.write(row("attempt2"))
    w2.commit() // staged; its message is LOST with the executor
    // attempt 3: the retry that succeeds — only ITS message reaches
    // the driver, so only its staged file is published
    val w3 = factory.createWriter(0, taskId = 102L)
    w3.write(row("attempt3"))
    val winner = w3.commit()
    new sources.GraftTextBatchWrite(out, schema).commit(Array(winner))
    val visible = new java.io.File(out).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(visible.length == 1, s"published: ${visible.map(_.getName).mkString(",")}")
    val read = spark.read.schema("s string").csv(out).collect().map(_.getString(0))
    assert(read.toSeq == Seq("attempt3"))
  }

  // ---- graft_heavy_hitters argument validation -------------------------

  test("graft_heavy_hitters rejects NULL / string / non-positive capacity at analysis") {
    util.t(spark, sf, "lineitem").createOrReplaceTempView("lineitem_hh6")
    def analysisError(capacityLiteral: String): String = {
      val e = intercept[Exception] {
        spark.sql(
          s"""SELECT graft_heavy_hitters(l_returnflag, $capacityLiteral)
             |FROM lineitem_hh6""".stripMargin).collect()
      }
      // walk to the root message: the require/IAE text must survive
      // wrapping, never an NPE or ClassCastException
      var t: Throwable = e
      while (t.getCause != null && !t.getMessage.contains("capacity")) t = t.getCause
      assert(!t.isInstanceOf[NullPointerException] &&
        !t.isInstanceOf[ClassCastException], s"raw $t for capacity=$capacityLiteral")
      t.getMessage
    }
    for (bad <- Seq("NULL", "'x'", "0", "-3", "1.5"))
      assert(analysisError(bad).contains("positive integral literal"),
        s"capacity=$bad lacked the descriptive message")
    // positive control: a valid literal still builds and runs
    val ok = spark.sql(
      "SELECT graft_heavy_hitters(l_returnflag, 8) AS hh FROM lineitem_hh6").collect()
    assert(ok.length == 1)
  }

  // ---- TTL eviction: evicted key re-enters as fresh --------------------

  test("TTL latest-per-key evicts idle keys on watermark and re-admits them as fresh") {
    import spark.implicits._
    import graft.streaming.KStreams.Record
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = scratch("ttl_feed")
      val name = "ttl_reentry_" + java.util.UUID.randomUUID.toString.replace("-", "")
      def feed(recs: (String, String, Long)*): Unit =
        recs.map { case (k, v, ms) => Record(k, v, new java.sql.Timestamp(ms)) }
          .toDS().write.mode("append").parquet(dir)
      val t0 = 1700000000000L
      val hour = 3600 * 1000L
      feed(("A", "a1", t0), ("B", "b1", t0)) // dir must exist before readStream
      val q = spark.readStream
        .schema("key string, value string, ts timestamp").parquet(dir)
        .as[Record]
        .withWatermark("ts", "0 seconds")
        .groupByKey(_.key)
        .transformWithState(new operators.StreamingOps.TtlLatestProcessor,
          org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Update())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      try {
        q.processAllAvailable()
        val afterB1 = spark.table(name).collect()
        assert(afterB1.count(_.getBoolean(3)) == 0, "no eviction before the TTL passes")
        // batch 2: A stays active 7h later — watermark jumps past B's
        // 6h timer, so B (idle) is tombstoned and A survives
        feed(("A", "a2", t0 + 7 * hour))
        q.processAllAvailable()
        val evicted = spark.table(name).filter(col("evicted")).collect()
        assert(evicted.map(_.getString(0)).toSeq == Seq("B"), "exactly B evicted")
        // batch 3: B returns ABOVE the current watermark (a row at or
        // below it is dropped as late) — state was cleared, so the
        // same-key record is re-admitted as a FRESH upsert, not
        // suppressed by old state
        feed(("B", "b2", t0 + 8 * hour))
        q.processAllAvailable()
        val bRows = spark.table(name).filter(col("key") === "B").collect()
        assert(bRows.exists(r => !r.getBoolean(3) && r.getString(1) == "b2"),
          s"B must re-enter fresh: ${bRows.mkString(";")}")
      } finally q.stop()
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  // ---- outer join: null padding waits for the watermark -----------------

  test("stream-stream left-outer join emits null-padded rows only after the watermark passes") {
    import spark.implicits._
    val pDir = scratch("ssj_purchases")
    val cDir = scratch("ssj_clicks")
    val name = "ssj_outer_" + java.util.UUID.randomUUID.toString.replace("-", "")
    def feed(dir: String, recs: (String, Long)*): Unit =
      recs.map { case (k, ms) => (k, new java.sql.Timestamp(ms)) }
        .toDF("key", "ts").write.mode("append").parquet(dir)
    val t0 = 1700000000000L
    val hour = 3600 * 1000L
    // batch 1: an unmatched purchase at t0; the click stream's max stays
    // 30 min BEHIND it, so the global watermark cannot reach p_ts yet
    feed(pDir, ("u1", t0))
    feed(cDir, ("u2", t0 - hour / 2))
    val purchases = spark.readStream.schema("key string, ts timestamp").parquet(pDir)
      .select(col("key").as("p_key"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "0 seconds")
    val clicks = spark.readStream.schema("key string, ts timestamp").parquet(cDir)
      .select(col("key"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "0 seconds")
    val q = purchases.join(clicks,
        col("key") === col("p_key") &&
        col("click_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("p_ts"),
      "leftOuter")
      .select(col("p_key"), col("p_ts"), col("click_ts"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // a matching click may still arrive while watermark < p_ts: the
      // engine must HOLD u1 — emitting (u1, null) now would be wrong
      assert(spark.table(name).isEmpty,
        s"premature rows: ${spark.table(name).collect().mkString(";")}")
      // batch 2 advances both watermarks 2h past u1: its null row must
      // flush; u3 joins its in-range click and emits matched
      feed(pDir, ("u3", t0 + 2 * hour))
      feed(cDir, ("u3", t0 + 2 * hour - 5 * 60 * 1000))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => (r.getString(0), r.isNullAt(2))).toSet
      assert(rows == Set(("u1", true), ("u3", false)),
        s"expected u1 null-padded + u3 matched, got: ${rows.mkString(";")}")
    } finally q.stop()
  }
}
