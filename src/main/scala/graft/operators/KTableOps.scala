package graft.operators

import graft.GQuery
import graft.util._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch twins of the reference topology's operators (SURVEY.md §2.1
  * R1–R7), over the `events` table standing in for the Kafka topic
  * (reference: KStreamsToKTable.java:66-107 — stream → toTable →
  * filter → toStream → sinks; interactive state-store scan :152-167).
  *
  * The record key is `cast(user_id as string)`, the value is the
  * event payload — mirroring the reference's (String,String) records
  * (KStreamsToKTable.java:46,60-61). Latest-per-key is a single-pass
  * `max_by` aggregation (partial aggregation map-side → one shuffle),
  * NOT a window sort — at 100 TB the sort would be the bottleneck.
  * The streaming twins live in graft.streaming (mapGroupsWithState).
  */
object KTableOps {

  /** R1 — source scan: the replayed keyed record stream, earliest-first. */
  def ksSourceScan(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"), col("ts"),
        col("user_id").cast("string").as("key"),
        col("event_type").as("value"))
      .orderBy(col("ts"), col("event_id"))

  val ksSourceScanSql: String =
    """SELECT event_id, date_trunc('microseconds', ts) AS ts, cast(user_id as varchar) AS key,
      | event_type AS value
      |FROM events ORDER BY ts, event_id""".stripMargin

  /** R2 — stream→table upsert: latest value per key, one-pass max_by
    * with (ts, event_id) as the deterministic recency order. */
  def ktLatestPerKey(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("ts"), col("event_type"), col("value"), col("props")),
        struct(col("ts"), col("event_id"))).as("r"))
      .select(col("user_id"), col("r.event_id").as("event_id"),
        col("r.ts").as("ts"), col("r.event_type").as("event_type"),
        col("r.value").as("value"), col("r.props").as("props"))
      .orderBy(col("user_id"))

  val ktLatestPerKeySql: String =
    """SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts, event_type, value, props FROM (
      | SELECT *, row_number() OVER (PARTITION BY user_id
      |   ORDER BY ts DESC, event_id DESC) AS rn
      | FROM events) WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** R4 — table filter, materialized: the reference keeps rows where
    * key equalsIgnoreCase value (KStreamsToKTable.java:87-98); our
    * analog keeps table rows whose latest event is a purchase. */
  def ktFilter(spark: SparkSession, dir: String): DataFrame =
    ktLatestPerKey(spark, dir)
      .filter(col("event_type").isNotNull && lower(col("event_type")) === "purchase")
      .orderBy(col("user_id"))

  val ktFilterSql: String =
    """SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts, event_type, value, props FROM (
      | SELECT *, row_number() OVER (PARTITION BY user_id
      |   ORDER BY ts DESC, event_id DESC) AS rn
      | FROM events) WHERE rn = 1
      | AND event_type IS NOT NULL AND lower(event_type) = 'purchase'
      |ORDER BY user_id""".stripMargin

  /** R3 — mapValues: per-update projection over the table, with the
    * reference's side-effecting watch/peek tap
    * (KStreamsToKTable.java:84-85) as an `observe` metric — the
    * observation rides the existing pass (no extra job) and surfaces
    * through QueryExecutionListener, like the reference's stderr tap. */
  def ktMapValues(spark: SparkSession, dir: String): DataFrame =
    ktLatestPerKey(spark, dir)
      .observe("kt_mapvalues_tap", count(lit(1)).as("n_updates"))
      .select(col("user_id"),
        upper(col("event_type")).as("event_type_uc"),
        (col("value") * 2).cast("decimal(18,4)").cast("double").as("value_x2"))
      .orderBy(col("user_id"))

  val ktMapValuesSql: String =
    """SELECT user_id, upper(event_type) AS event_type_uc,
      | cast(cast(value * 2 as decimal(18,4)) as double) AS value_x2
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |   ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** R5 — table→stream: re-emit the table changelog as a keyed record
    * stream in event order (KStreamsToKTable.java:103-104). */
  def ktToStream(spark: SparkSession, dir: String): DataFrame =
    ktLatestPerKey(spark, dir)
      .select(col("user_id").cast("string").as("key"),
        col("event_type").as("value"), col("ts"), col("event_id"))
      .orderBy(col("ts"), col("event_id"))

  val ktToStreamSql: String =
    """SELECT cast(user_id as varchar) AS key, event_type AS value,
      | date_trunc('microseconds', ts) AS ts, event_id
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |   ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1 ORDER BY ts, event_id""".stripMargin

  /** R6 — sink: write the stream to a parquet "topic" and read it
    * back (the reference's three `to(topic)` sinks,
    * KStreamsToKTable.java:100-104). Round-trip proves the sink path. */
  def ksSink(spark: SparkSession, dir: String): DataFrame = {
    // per-run unique path (concurrent suites must not collide),
    // registered for JVM-exit deletion
    val out = scratchDir("sink_topic")
    t(spark, dir, "events")
      .select(col("event_id"), col("user_id").cast("string").as("key"),
        col("event_type").as("value"))
      .repartition(3, col("key")) // reference topics have 3 partitions (dev.properties:5)
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out).orderBy(col("event_id"))
  }

  val ksSinkSql: String =
    """SELECT event_id, cast(user_id as varchar) AS key,
      | event_type AS value
      |FROM events ORDER BY event_id""".stripMargin

  /** R7 — interactive query: full scan of the materialized store,
    * aggregated (the reference's 10 s watcher loop printing all (k,v),
    * KStreamsToKTable.java:152-167). */
  def ktInteractiveScan(spark: SparkSession, dir: String): DataFrame =
    ktLatestPerKey(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_keys"), dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))

  val ktInteractiveScanSql: String =
    s"""SELECT event_type, count(*) AS n_keys,
       | ${sqlDsum("value")} AS sum_value
       |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
       |   ORDER BY ts DESC, event_id DESC) AS rn FROM events)
       |WHERE rn = 1 GROUP BY event_type ORDER BY event_type""".stripMargin

  /** R8 — topic/DDL admin: the reference pre-creates its 4 topics with
    * 3 partitions via AdminClient (KStreamsToKTable.java:110-141,
    * partitions from dev.properties:5). Spark twin: provision a
    * partitioned parquet "topic" (repartition(3) → 3 part files) and
    * verify the layout — partition count from the file listing, row
    * count from the data. Round-robin, not hash-on-key: the oracle
    * asserts exactly 3 non-empty partitions, which key-hash layout
    * cannot guarantee under skew (a hash leaving one bucket empty
    * writes 2 files and flakes the check); key-colocated layout is
    * the bucketed-table entry's job (`src_bucketed_join`). */
  def ksTopicAdmin(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchDir("topic_admin")
    t(spark, dir, "events")
      .select(col("event_id"), col("user_id").cast("string").as("key"),
        col("event_type").as("value"))
      .repartition(3)
      .write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    val nParts = back.select(input_file_name()).distinct().count()
    back.agg(count(lit(1)).as("n_rows"))
      .select(lit(nParts).as("n_partitions"), col("n_rows"))
  }

  val ksTopicAdminSql: String =
    """SELECT cast(3 as bigint) AS n_partitions, count(*) AS n_rows
      |FROM events""".stripMargin

  // ---- windowed aggregation batch twins (streaming ops, §2.2) -------
  /** Tumbling 1-hour event-time window (streaming twin uses
    * window(ts, "1 hour") + watermark; see graft.streaming). */
  def ksTumblingWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))

  val ksTumblingWindowSql: String =
    s"""SELECT date_trunc('hour', ts) AS w_start, event_type,
       | count(*) AS n, ${sqlDsum("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  /** Sliding window: 2-hour width, 1-hour slide — every event lands in
    * two buckets. Oracle enumerates both shifted buckets explicitly. */
  def ksSlidingWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))
      .orderBy(col("w_start"))

  val ksSlidingWindowSql: String =
    """SELECT w_start, count(*) AS n FROM (
      | SELECT date_trunc('hour', ts) AS w_start FROM events
      | UNION ALL
      | SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS w_start FROM events)
      |GROUP BY w_start ORDER BY w_start""".stripMargin

  /** Session windows per user with a 30-minute gap. Oracle is the
    * classic gaps-and-islands rewrite. */
  def ksSessionWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("n_events"))
      .orderBy(col("user_id"), col("s_start"))

  val ksSessionWindowSql: String =
    """WITH marked AS (
      | SELECT user_id, ts, event_id,
      |  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |        < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
      | FROM events),
      |sessions AS (
      | SELECT user_id, ts,
      |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      | FROM marked)
      |SELECT user_id, date_trunc('microseconds', min(ts)) AS s_start, count(*) AS n_events
      |FROM sessions GROUP BY user_id, sid
      |ORDER BY user_id, s_start""".stripMargin

  val all: Seq[GQuery] = Seq(
    GQuery("ks_source_scan", ksSourceScan, Some(ksSourceScanSql)),
    GQuery("kt_latest_per_key", ktLatestPerKey, Some(ktLatestPerKeySql)),
    GQuery("kt_filter", ktFilter, Some(ktFilterSql)),
    GQuery("kt_mapvalues", ktMapValues, Some(ktMapValuesSql)),
    GQuery("kt_to_stream", ktToStream, Some(ktToStreamSql)),
    GQuery("ks_sink_roundtrip", ksSink, Some(ksSinkSql)),
    GQuery("ks_topic_admin", ksTopicAdmin, Some(ksTopicAdminSql)),
    GQuery("kt_interactive_scan", ktInteractiveScan, Some(ktInteractiveScanSql)),
    GQuery("ks_tumbling_window", ksTumblingWindow, Some(ksTumblingWindowSql)),
    GQuery("ks_sliding_window", ksSlidingWindow, Some(ksSlidingWindowSql)),
    GQuery("ks_session_window", ksSessionWindow, Some(ksSessionWindowSql)),
  )
}
