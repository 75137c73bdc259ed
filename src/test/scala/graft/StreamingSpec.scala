package graft

import graft.streaming.KStreams
import graft.streaming.KStreams.Record
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** MemoryStream-driven topology tests — the Spark analog of the
  * reference's (declared but unused) TopologyTestDriver
  * (reference build.gradle:33). Covers R1–R7 semantics: upsert wins
  * latest across batches, tombstone retraction on table filter,
  * update output mode, watermark late-data drop.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream.toTable: latest value per key wins across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Record]
    val q = KStreams.KStreamDS(ms.toDS()).toTable.toMemory("t_latest")
    ms.addData(Record("a", "v1", ts("2024-01-01 10:00:00")),
               Record("b", "v1", ts("2024-01-01 10:01:00")))
    q.processAllAvailable()
    val s1 = KStreams.snapshot(spark, "t_latest").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(s1 == Map("a" -> "v1", "b" -> "v1"))
    // upsert a, out-of-order stale update for b (older ts must lose)
    ms.addData(Record("a", "v2", ts("2024-01-01 11:00:00")),
               Record("b", "v0", ts("2024-01-01 09:00:00")))
    q.processAllAvailable(); q.stop()
    val s2 = KStreams.snapshot(spark, "t_latest").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(s2 == Map("a" -> "v2", "b" -> "v1"))
  }

  test("table.filter: tombstone retracts a key that leaves the view") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Record]
    val q = KStreams.KStreamDS(ms.toDS()).toTable
      .filter(col("key") === lower(col("value"))) // the reference's key==value filter (KStreamsToKTable.java:87-98)
      .toMemory("t_filtered")
    ms.addData(Record("x", "X", ts("2024-01-01 10:00:00")),
               Record("y", "nope", ts("2024-01-01 10:00:30")))
    q.processAllAvailable()
    val s1 = KStreams.snapshot(spark, "t_filtered").collect().map(_.getString(0)).toSet
    assert(s1 == Set("x"))
    // x's state changes to a non-matching value -> must disappear
    ms.addData(Record("x", "zzz", ts("2024-01-01 11:00:00")))
    q.processAllAvailable(); q.stop()
    val s2 = KStreams.snapshot(spark, "t_filtered").collect().map(_.getString(0)).toSet
    assert(s2 == Set.empty[String])
  }

  test("table.mapValues + toStream compose on the changelog") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Record]
    val q = KStreams.KStreamDS(ms.toDS()).toTable
      .mapValues(v => upper(v))
      .toStream.ds
      .writeStream.format("memory").queryName("t_mapped")
      .outputMode("update").start()
    ms.addData(Record("k", "hello", ts("2024-01-01 10:00:00")))
    q.processAllAvailable(); q.stop()
    assert(spark.table("t_mapped").collect().head.getString(1) == "HELLO")
  }

  test("watermark drops late data beyond the threshold") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Record]
    val q = ms.toDS()
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("key"), col("n"))
      .writeStream.format("memory").queryName("t_win")
      .outputMode("update").start()
    ms.addData(Record("a", "v", ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    // advance event time far enough that the 10:00 window is final
    ms.addData(Record("a", "v", ts("2024-01-01 13:00:00")))
    q.processAllAvailable()
    // late arrival for the finalized 10:00 window: must be dropped
    ms.addData(Record("a", "v", ts("2024-01-01 10:20:00")))
    q.processAllAvailable(); q.stop()
    val tenOClock = spark.table("t_win")
      .filter(col("w") === ts("2024-01-01 10:00:00"))
      .agg(max("n")).collect().head.getLong(0)
    assert(tenOClock == 1, "late row leaked into a finalized window")
  }
}
