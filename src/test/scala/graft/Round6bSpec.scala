package graft

import graft.streaming.KStreams.Record
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Round-6 operator additions: warehouse mutations (merge / SCD2 /
  * snapshot diff), the data-expectations report, fuzzy edit-distance
  * dedup, boilerplate n-gram detection, the modern-SQL entries, and
  * the chained-stateful streaming query. The DuckDB oracle already
  * checks values; these specs pin the INVARIANTS the oracle can't
  * express — action classification, interval tiling, independent
  * distance verification, forward-fill semantics, and streaming
  * dedup-before-window mechanics.
  */
class Round6bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- warehouse mutations ---------------------------------------------

  test("q58 merge: actions partition the key space and updates price at 1.25x") {
    val base = util.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val out = operators.Warehouse.q58MergeUpsert(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (k, price, action) = (r.getLong(0), r.getDouble(2), r.getString(3))
      val expected =
        if (k % 2 == 0 && k % 3 == 0) "insert"
        else if (k % 2 == 0) "update"
        else if (k % 3 != 0) "keep"
        else fail(s"key $k (removed from target, absent from source) must not appear")
      assert(action == expected, s"key $k: action $action, expected $expected")
      val want = if (action == "keep") base(k) else base(k) * 1.25
      assert(price == want, s"key $k: price $price != $want")
    }
    // every surviving key of the base relations is present exactly once
    val keys = out.map(_.getLong(0))
    assert(keys.length == keys.distinct.length)
    assert(keys.toSet == base.keySet.filter(k => k % 3 != 0 || k % 2 == 0))
  }

  test("q59 SCD2: intervals tile each user's timeline with one open row") {
    val rows = operators.Warehouse.q59Scd2Dimension(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
    rows.groupBy(_._1).foreach { case (user, hist) =>
      val sorted = hist.sortBy(_._2.getTime)
      // exactly one open (is_current) interval, and it is the last one
      assert(hist.count(_._4) == 1, s"user $user: expected exactly one current row")
      assert(sorted.last._3.isEmpty && sorted.last._4)
      // contiguous: each valid_to equals the next valid_from, no gaps
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.contains(b._2), s"user $user: interval gap at ${a._3}")
        case _ => ()
      }
    }
  }

  test("q60 snapshot diff: classifications match the derivation rules") {
    val out = operators.Warehouse.q60SnapshotDiff(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val k = r.getLong(0)
      r.getString(1) match {
        case "removed" =>
          assert(k % 11 == 0); assert(r.isNullAt(3))
        case "changed" =>
          assert(k % 7 == 0 && k % 11 != 0)
          assert(r.getDouble(3) - r.getDouble(2) == 5.0)
        case other => fail(s"unexpected change type $other")
      }
    }
  }

  test("meta_expectations: all declared checks pass on the generated data") {
    val rep = operators.Warehouse.metaExpectations(spark, sf).collect()
    assert(rep.length == 6)
    rep.foreach(r => assert(r.getBoolean(2) && r.getLong(1) == 0L,
      s"check ${r.getString(0)} reported ${r.getLong(1)} violations"))
  }

  // ---- fuzzy edit-distance dedup ---------------------------------------

  /** Textbook two-row DP — the independent referee for levenshtein. */
  private def editDistance(a: String, b: String): Int = {
    var prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  test("dedup_fuzzy_edit: every pair's distance verifies against an independent DP") {
    val texts = util.t(spark, sf, "documents").select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = operators.Dedup.fuzzyEditPairs(spark, sf).collect()
    assert(pairs.nonEmpty, "planted near-dups must surface")
    pairs.foreach { r =>
      val (a, b, d) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(a < b)
      assert(d <= 12)
      assert(editDistance(texts(a), texts(b)) == d,
        s"pair ($a,$b): engine distance $d != reference DP")
    }
  }

  // ---- boilerplate n-grams ---------------------------------------------

  test("text_boilerplate_ngrams: counts are consistent and cover the corpus") {
    val nDocs = util.t(spark, sf, "documents").count()
    val out = operators.TextAnalysis.boilerplateNgrams(spark, sf).collect()
    assert(out.length == nDocs) // every (>=2-word) doc reports; fixture docs all qualify
    out.foreach { r =>
      val (nGrams, nBoiler, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nBoiler <= nGrams)
      assert(ratio == nBoiler.toDouble / nGrams)
      assert(r.getBoolean(4) == (ratio >= 0.5))
    }
  }

  // ---- modern SQL entries ----------------------------------------------

  test("q62 lateral top-k equals the window-function formulation") {
    import org.apache.spark.sql.expressions.Window
    val viaLateral = operators.SqlSurface.q62LateralTopk(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_name"))
    val viaWindow = util.t(spark, sf, "customer")
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
      .join(util.t(spark, sf, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name"), col("c_acctbal")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(viaLateral == viaWindow)
  }

  test("q64 gap fill: spine is dense and last_seen forward-fills") {
    val rows = operators.Analytics.q64GapFill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val span = rows.map(_._2).distinct.length
    rows.groupBy(_._1).foreach { case (user, days) =>
      // dense: every user covers the full corpus day span exactly once
      assert(days.map(_._2).distinct.length == span && days.length == span,
        s"user $user: spine not dense")
      var lastActive: Option[Long] = None
      days.sortBy(_._2.getTime).foreach { case (_, day, n, lastSeen) =>
        if (n > 0) lastActive = Some(n)
        assert(lastSeen == lastActive,
          s"user $user @ $day: last_seen $lastSeen, expected $lastActive")
      }
    }
  }

  test("q65 z-score: flagged rows are exactly the recomputed >3-sigma set") {
    val flagged = operators.Analytics.q65ZscoreAnomaly(spark, sf).collect()
      .map(r => r.getLong(0)).toSet
    assert(flagged.nonEmpty)
    // independent recomputation with plain double accumulation (stats
    // only; 1e-9 tolerance on the boundary is far above any noise)
    val ev = util.t(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expected = ev.groupBy(_._2).toSeq.flatMap { case (_, xs) =>
      val n = xs.length
      val mean = xs.map(_._3).sum / n
      val sd = math.sqrt(xs.map(x => (x._3 - mean) * (x._3 - mean)).sum / (n - 1))
      xs.filter(x => math.abs((x._3 - mean) / sd) > 3).map(_._1).toSeq
    }.toSet
    assert(flagged == expected)
  }

  // ---- chained stateful streaming --------------------------------------

  test("stream_chained_stateful: dedup feeds the window agg; only closed windows emit") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Record]
    val q = ms.toDS()
      .withColumn("hour", date_trunc("hour", col("ts")))
      .withWatermark("ts", "0 seconds")
      .dropDuplicatesWithinWatermark("key", "value", "hour")
      .groupBy(window(col("ts"), "1 hour"), col("value"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("value"), col("n"))
      .writeStream.format("memory").queryName("t_chained")
      .outputMode("append").start()
    // hour 10: k1 twice (must count once), k2 once
    ms.addData(Record("k1", "v", ts("2024-01-01 10:05:00")),
               Record("k1", "v", ts("2024-01-01 10:20:00")),
               Record("k2", "v", ts("2024-01-01 10:30:00")))
    q.processAllAvailable()
    // watermark jump finalizes hour 10
    ms.addData(Record("k3", "v", ts("2024-01-01 13:00:00")))
    q.processAllAvailable()
    // late duplicate for the finalized hour: dropped by the chain
    ms.addData(Record("k1", "v", ts("2024-01-01 10:40:00")))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("t_chained").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((ts("2024-01-01 10:00:00"), "v", 2L)),
      s"expected one dedup'd closed window, got ${rows.toSeq}")
  }
}
