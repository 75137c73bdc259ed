package graft.operators

import graft.GQuery
import graft.util._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Warehouse-maintenance operators — the mutation/reconciliation half
  * of a production analytics engine that the reference sandbox (one
  * fixed append topology, `KStreamsToKTable.java:66-107`) never needs:
  * MERGE-style upsert, slowly-changing-dimension history, and snapshot
  * diffing (CDC). Spark on plain parquet has no transactional MERGE
  * INTO target, so each operator is expressed as the relational core a
  * table format would wrap: a keyed full-outer reconciliation. That is
  * also why they scale — every one is a single equi-shuffle on the
  * merge key (AQE-splittable, salting-compatible), no driver-side
  * state, no per-row RPCs.
  *
  * Determinism for the oracle: derived "update" prices use one IEEE
  * double op (`* 1.25`, `+ 5.0`) on the raw column — bit-identical in
  * Spark and DuckDB, no decimal rounding mode in play.
  */
object Warehouse {

  /** MERGE INTO semantics (upsert): target = orders snapshot missing
    * every 3rd key; source = refreshed rows for even keys at 1.25×
    * price. Matched → update, source-only → insert, target-only →
    * keep. One full-outer equi-join on the key: at 100 TB both sides
    * shuffle-partition on o_orderkey and each task merges its slice —
    * the same plan a Delta/Iceberg MERGE compiles to for the
    * all-partitions-touched case. */
  def q58MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val target = orders.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice").as("price"))
    val source = orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") * 1.25).as("price"))
    target.as("t").join(source.as("s"), Seq("o_orderkey"), "full_outer")
      .select(
        col("o_orderkey"),
        coalesce(col("s.o_custkey"), col("t.o_custkey")).as("o_custkey"),
        coalesce(col("s.price"), col("t.price")).as("price"),
        when(col("t.o_custkey").isNull, "insert")
          .when(col("s.o_custkey").isNull, "keep")
          .otherwise("update").as("action"))
      .orderBy(col("o_orderkey"))
  }

  val q58Sql: String =
    """WITH target AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice AS price
      |  FROM orders WHERE o_orderkey % 3 <> 0),
      |source AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice * 1.25 AS price
      |  FROM orders WHERE o_orderkey % 2 = 0)
      |SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
      |       coalesce(s.o_custkey, t.o_custkey) AS o_custkey,
      |       coalesce(s.price, t.price) AS price,
      |       CASE WHEN t.o_custkey IS NULL THEN 'insert'
      |            WHEN s.o_custkey IS NULL THEN 'keep'
      |            ELSE 'update' END AS action
      |FROM target t FULL JOIN source s ON t.o_orderkey = s.o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** SCD Type-2 dimension build from the event stream: compress each
    * user's event_type runs (keep only rows where the type changed),
    * then derive [valid_from, valid_to) intervals with lead() — the
    * standard dimension-history recipe. Two window passes over the
    * same (user_id, ts) partitioning: Catalyst reuses one sort+shuffle
    * for both. Ties broken by event_id for determinism. */
  def q59Scd2Dimension(spark: SparkSession, dir: String): DataFrame = {
    val wLag = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wLead = Window.partitionBy(col("user_id")).orderBy(col("valid_from"))
    t(spark, dir, "events")
      .withColumn("prev", lag(col("event_type"), 1).over(wLag))
      .filter(col("prev").isNull || col("event_type") =!= col("prev"))
      .select(col("user_id"), col("event_type"), col("ts").as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wLead))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy(col("user_id"), col("valid_from"))
  }

  val q59Sql: String =
    """WITH ordered AS (
      |  SELECT user_id, ts, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |changes AS (
      |  SELECT user_id, ts, event_type FROM ordered
      |  WHERE prev IS NULL OR event_type <> prev)
      |SELECT user_id, event_type, ts AS valid_from,
      |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
      |       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL) AS is_current
      |FROM changes ORDER BY user_id, valid_from""".stripMargin

  /** Snapshot diff (CDC extract): version B drops every 11th key and
    * bumps every 7th price; the diff classifies removed/changed rows.
    * Full-outer on the key + value comparison — the plan that powers
    * incremental downstream refresh when a source can't emit a
    * changelog. Unchanged rows are filtered pre-sort, so the output
    * (and the sort) is proportional to the CHANGE set, not the
    * snapshot. */
  def q60SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val snapA = orders.select(col("o_orderkey"), col("o_totalprice").as("price"))
    val snapB = orders.filter(col("o_orderkey") % 11 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 5.0)
          .otherwise(col("o_totalprice")).as("price"))
    snapA.as("a").join(snapB.as("b"), Seq("o_orderkey"), "full_outer")
      .filter(col("b.price").isNull || col("a.price") =!= col("b.price"))
      .select(
        col("o_orderkey"),
        when(col("b.price").isNull, "removed").otherwise("changed").as("change"),
        col("a.price").as("old_price"),
        col("b.price").as("new_price"))
      .orderBy(col("o_orderkey"))
  }

  val q60Sql: String =
    """WITH snap_a AS (
      |  SELECT o_orderkey, o_totalprice AS price FROM orders),
      |snap_b AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 5.0
      |              ELSE o_totalprice END AS price
      |  FROM orders WHERE o_orderkey % 11 <> 0)
      |SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
      |       CASE WHEN b.price IS NULL THEN 'removed'
      |            ELSE 'changed' END AS change,
      |       a.price AS old_price, b.price AS new_price
      |FROM snap_a a FULL JOIN snap_b b ON a.o_orderkey = b.o_orderkey
      |WHERE b.price IS NULL OR a.price <> b.price
      |ORDER BY o_orderkey""".stripMargin

  /** MERGE-ON-READ position deletes (the Iceberg v2 / Delta
    * deletion-vector pattern, built from first principles): deleting
    * rows from a 100 TB table must not rewrite data files, so deletes
    * are recorded as a SIDECAR of (file_id, pos) coordinates and every
    * read applies them with an anti-join. Here the base table is
    * materialized to scratch parquet bucketed by a deterministic
    * file_id with an explicit in-file position (the coordinates a
    * table format tracks implicitly), the delete vector is derived
    * from a predicate (the DELETE statement) but stored as PURE
    * positions — the read side never re-evaluates the predicate — and
    * the merge-on-read scan is `base ANTI JOIN dv ON (file_id, pos)`.
    *
    * Scale design: the DV is delete-linear (two longs per deleted
    * row, never a rewritten file); the anti-join key (file_id, pos)
    * is exactly the base table's layout, so a format-aware reader
    * applies each file's vector scan-local with no shuffle — the
    * relational plan here shuffle-hashes on the same key, the
    * portable equivalent. Everything is integer-deterministic ⇒ the
    * survivor aggregate hash-matches DuckDB replaying the same
    * coordinates. */
  def q70DeleteVectors(spark: SparkSession, dir: String): DataFrame = {
    val nFiles = 8
    val wPos = Window.partitionBy(col("file_id")).orderBy(col("o_orderkey"))
    val base0 = t(spark, dir, "orders")
      .withColumn("file_id", pmod(col("o_orderkey"), lit(nFiles)))
      .withColumn("pos", row_number().over(wPos).cast("long"))
    val basePath = scratchDir("dv_base")
    base0.select(col("file_id"), col("pos"), col("o_orderkey"),
        col("o_orderpriority"), col("o_totalprice"))
      .repartition(col("file_id"))
      .write.partitionBy("file_id").parquet(basePath)
    val base = spark.read.parquet(basePath)
    // the DELETE: predicate evaluated ONCE at delete time, persisted
    // as bare coordinates (file_id, pos)
    val dvPath = scratchDir("dv_sidecar")
    base.filter(col("o_orderkey") % 5 === 0 || col("o_totalprice") > 400000.0)
      .select(col("file_id"), col("pos"))
      .write.parquet(dvPath)
    val dv = spark.read.parquet(dvPath)
    base.join(dv, Seq("file_id", "pos"), "left_anti")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_live"), dsum(col("o_totalprice")).as("live_total"))
      .orderBy(col("o_orderpriority"))
  }

  /** The oracle replays the identical coordinate derivation — the
    * anti-join collapses to the predicate's complement, proving the
    * position-delete read path loses and invents nothing. */
  val q70Sql: String =
    s"""SELECT o_orderpriority, count(*) AS n_live,
       | ${sqlDsum("o_totalprice")} AS live_total
       |FROM orders
       |WHERE NOT (o_orderkey % 5 = 0 OR o_totalprice > 400000.0)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TIME TRAVEL through DELETE-VECTOR snapshots — `src_time_travel`'s
    * append-only manifest composed with [[q70DeleteVectors]]' sidecar
    * read path, which is what a real merge-on-read table does: a
    * version's manifest lists BOTH its data files and its delete
    * vectors, and reading "as of N" is
    * `union(data files of ≤ N) ANTI JOIN union(dv files of ≤ N)` on
    * the (commit-set, file, pos) coordinate — no file is rewritten by
    * an append OR a delete, so every version stays readable forever
    * from immutable parts.
    *
    * History: commit 1 loads F1; commit 2 appends F2 and deletes
    * WHERE A (coordinates persisted as dv1 — the predicate is
    * evaluated ONCE, at delete time); commit 3 deletes WHERE B over
    * the then-live rows (dv2). The read side below touches only
    * manifests, file scans, and coordinate anti-joins — never the
    * predicates — while the DuckDB oracle recomputes each version
    * from the defining predicates; their hash-match proves the
    * coordinate path reconstructs every historical state exactly.
    * At 100 TB: manifests are KB-sized, DVs are delete-linear, the
    * anti-join key is the table's own layout (a format-aware reader
    * applies it scan-local), and old versions cost zero storage
    * beyond their share of immutable files. */
  def q76TimeTravelDv(spark: SparkSession, dir: String): DataFrame = {
    val nFiles = 8
    val o = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    // stable (cset, file_id, pos) coordinates per commit's file set
    def withCoords(df: DataFrame, cset: Int): DataFrame = {
      val wPos = Window.partitionBy(col("file_id")).orderBy(col("o_orderkey"))
      df.withColumn("file_id", pmod(col("o_orderkey"), lit(nFiles)))
        .withColumn("pos", row_number().over(wPos).cast("long"))
        .withColumn("cset", lit(cset))
    }
    val f1Path = scratchDir("ttdv_f1")
    val f2Path = scratchDir("ttdv_f2")
    withCoords(o.filter(col("o_orderkey") % 3 =!= 0), 1).write.parquet(f1Path)
    withCoords(o.filter(col("o_orderkey") % 3 === 0), 2).write.parquet(f2Path)
    val f1 = spark.read.parquet(f1Path)
    val f2 = spark.read.parquet(f2Path)
    val coords = Seq("cset", "file_id", "pos")
    // commit 2's DELETE WHERE A, over the post-append table
    val dv1Path = scratchDir("ttdv_dv1")
    f1.unionByName(f2).filter(col("o_orderkey") % 7 === 0)
      .select(coords.map(col): _*).write.parquet(dv1Path)
    val dv1 = spark.read.parquet(dv1Path)
    // commit 3's DELETE WHERE B, over the rows live AT v2
    val dv2Path = scratchDir("ttdv_dv2")
    f1.unionByName(f2).join(dv1, coords, "left_anti")
      .filter(col("o_totalprice") > 350000.0)
      .select(coords.map(col): _*).write.parquet(dv2Path)
    val dv2 = spark.read.parquet(dv2Path)
    // the manifest says v3 = {f1,f2} ⊖ {dv1,dv2} and v2 = {f1,f2} ⊖
    // {dv1}: since each version's DV set is a superset of the
    // previous one's (delete vectors only accumulate until
    // compaction), live(vN+1) = live(vN) ⊖ dvN — so a multi-version
    // read computes the chain INCREMENTALLY, checkpointing each
    // version's live set instead of re-running the shared anti-join
    // prefix once per version (the Round13Spec plan gate flags the
    // naive per-version re-read, which executed the v2 anti-join
    // twice). A single-version read still composes its manifest
    // directly; this is the all-versions audit path.
    def snap(v: Long, live: DataFrame): DataFrame =
      live.agg(count(lit(1)).as("n_live"), dsum(col("o_totalprice")).as("live_total"))
        .select(lit(v).as("version"), col("n_live"), col("live_total"))
    val v2Live = f1.unionByName(f2).join(dv1, coords, "left_anti")
      .localCheckpoint(true)
    val v3Live = v2Live.join(dv2, coords, "left_anti")
    Seq(snap(1L, f1), snap(2L, v2Live), snap(3L, v3Live))
      .reduce(_ unionAll _).orderBy(col("version"))
  }

  /** Each version replayed from its defining predicates. */
  val q76Sql: String =
    s"""SELECT cast(1 as bigint) AS version, count(*) AS n_live,
       | ${sqlDsum("o_totalprice")} AS live_total
       |FROM orders WHERE o_orderkey % 3 <> 0
       |UNION ALL
       |SELECT cast(2 as bigint), count(*), ${sqlDsum("o_totalprice")}
       |FROM orders WHERE NOT (o_orderkey % 7 = 0)
       |UNION ALL
       |SELECT cast(3 as bigint), count(*), ${sqlDsum("o_totalprice")}
       |FROM orders WHERE NOT (o_orderkey % 7 = 0) AND NOT (o_totalprice > 350000.0)
       |ORDER BY version""".stripMargin

  /** DELETE-VECTOR COMPACTION — the maintenance half of merge-on-read
    * (Iceberg's rewrite_data_files / Delta's PURGE): DVs keep deletes
    * cheap, but a file whose vector grows pays the anti-join on every
    * read forever, so table services periodically REWRITE heavily
    * deleted files (materializing their survivors, dropping their
    * vectors) while leaving lightly-deleted files untouched. Policy
    * here: rewrite when ≥ 25 % of a file's rows are deleted, decided
    * by integer arithmetic (4·deleted ≥ total). The v2 manifest is
    * {kept files + their DVs} ∪ {compacted files, no DVs}; the read
    * after compaction must equal the read before it — compaction is
    * a physical-layout transaction, never a semantic one.
    *
    * The fixture's DELETE concentrates in files 0–2 (o_orderkey%16<3
    * lands only there, ~50 % of each) with a thin price-predicate
    * tail across all files, so the policy genuinely splits the file
    * set: 0–2 rewritten, 3–7 keep their small vectors. At 100 TB the
    * per-file (total, deleted) stats come from the manifest — the
    * policy decision reads no data files, and the rewrite touches
    * only the hot files (delete-concentration-linear, not
    * table-linear). The oracle replays the surviving predicate, so
    * the full detour — coordinates → sidecar → policy → rewrite →
    * two-manifest union read — must land exactly on the logical
    * table. */
  def q77DvCompaction(spark: SparkSession, dir: String): DataFrame = {
    val nFiles = 8
    val wPos = Window.partitionBy(col("file_id")).orderBy(col("o_orderkey"))
    val basePath = scratchDir("dvc_base")
    t(spark, dir, "orders")
      .withColumn("file_id", pmod(col("o_orderkey"), lit(nFiles)))
      .withColumn("pos", row_number().over(wPos).cast("long"))
      .select(col("file_id"), col("pos"), col("o_orderkey"),
        col("o_orderpriority"), col("o_totalprice"))
      .repartition(col("file_id"))
      .write.partitionBy("file_id").parquet(basePath)
    val base = spark.read.parquet(basePath)
    val dvPath = scratchDir("dvc_sidecar")
    base.filter(col("o_orderkey") % 16 < 3 || col("o_totalprice") > 480000.0)
      .select(col("file_id"), col("pos"))
      .write.parquet(dvPath)
    val dv = spark.read.parquet(dvPath)
    // policy from manifest-sized stats: files with 4·deleted ≥ total
    val stats = base.groupBy(col("file_id")).agg(count(lit(1)).as("tot"))
      .join(dv.groupBy(col("file_id")).agg(count(lit(1)).as("del")),
        Seq("file_id"), "left")
      .withColumn("del", coalesce(col("del"), lit(0L)))
    val hot = stats.filter(col("del") * 4 >= col("tot")).select(col("file_id"))
    // the rewrite: hot files' survivors materialized WITHOUT coordinates'
    // baggage; their DV entries are retired with them
    val compactPath = scratchDir("dvc_compact")
    base.join(hot, Seq("file_id"), "left_semi")
      .join(dv, Seq("file_id", "pos"), "left_anti")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .coalesce(2)
      .write.parquet(compactPath)
    // v2 read: untouched files still merge their (small) vectors;
    // compacted files scan clean
    val keptRead = base.join(hot, Seq("file_id"), "left_anti")
      .join(dv, Seq("file_id", "pos"), "left_anti")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    keptRead.unionByName(spark.read.parquet(compactPath))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_live"), dsum(col("o_totalprice")).as("live_total"))
      .orderBy(col("o_orderpriority"))
  }

  val q77Sql: String =
    s"""SELECT o_orderpriority, count(*) AS n_live,
       | ${sqlDsum("o_totalprice")} AS live_total
       |FROM orders
       |WHERE NOT (o_orderkey % 16 < 3 OR o_totalprice > 480000.0)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Transparent materialized-view rewrite, end to end: build (once,
    * fingerprint-keyed) the per-status revenue matview, REGISTER it
    * with [[graft.plans.MatviewRewrite]], then run the ORDINARY
    * DataFrame aggregate over the raw orders table — the optimizer
    * rule recognizes the canonical shape (semanticEquals on
    * canonicalized aggregate expressions, not names) and substitutes a
    * groups-sized view scan for the fact scan. The DuckDB oracle
    * computes the aggregate DIRECTLY from orders, so a hash match
    * proves the rewrite serves exactly what the fact scan would have;
    * the plan spec asserts the physical scan reads the view path and
    * not orders.parquet. Freshness: the view path is a function of the
    * orders table's content fingerprint (a regenerated table can never
    * hit a stale view). At 100 TB this is the dashboard query served
    * from O(groups) bytes instead of a fact scan. */
  def q87MvRewrite(spark: SparkSession, dir: String): DataFrame = {
    val mvPath = mvRoot(spark, dir) + "/status_revenue"
    graft.plans.MatviewRewrite.register(s"file:$dir/orders.parquet",
      "o_orderstatus", graft.plans.MatviewRewrite.ViewDef(mvPath, exact = true))
    canonicalStatusRevenue(spark, dir)
  }

  /** Roll-up (containment) rewrite — the view is grouped FINER than
    * the query: a (status, priority) view answers the per-PRIORITY
    * aggregate by re-aggregating its partials (count → sum of partial
    * counts, sum → sum of partial sums — lossless, count/sum are
    * commutative monoids over the disjoint finer groups). This is the
    * standard view-containment extension over [[q87MvRewrite]]'s
    * exact matching; one stored cube face serves every coarser
    * grouping it contains. The re-aggregation input is VIEW-sized
    * (|status|×|priority| rows), not fact-sized — at 100 TB the
    * difference between a dashboard refresh and a fact scan. Oracle
    * computes directly from orders, proving the roll-up exact. */
  def q88MvRollup(spark: SparkSession, dir: String): DataFrame = {
    val mvPath = mvRoot(spark, dir) + "/status_priority_revenue"
    graft.plans.MatviewRewrite.register(s"file:$dir/orders.parquet",
      "o_orderpriority", graft.plans.MatviewRewrite.ViewDef(mvPath, exact = false))
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("revenue_cents"))
      .orderBy(col("o_orderpriority"))
  }

  val q88Sql: String =
    """SELECT o_orderpriority, cast(count(*) as bigint) AS n_orders,
      | cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
      |   AS revenue_cents
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** The canonical per-status revenue aggregate — the QUERY side of
    * the matview demo, built from the raw table every time; whether it
    * scans fact or view is the optimizer's decision. */
  private[graft] def canonicalStatusRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("revenue_cents"))
      .orderBy(col("o_orderstatus"))

  /** Build-once root for BOTH matviews (cross-JVM, atomic publish).
    * The build computes the canonical aggregates while nothing is
    * registered for a fresh root, so it always scans fact. The `2` in
    * the key is this builder's revision — the closure gained the
    * roll-up view, and a root published by the single-view closure
    * must not satisfy it (the ADVICE r9 cache-key discipline). */
  private def mvRoot(spark: SparkSession, dir: String): String =
    artifactRoot(s"matview2-${tableFingerprint(dir, "orders")}") { root =>
      canonicalStatusRevenue(spark, dir)
        .write.parquet(s"$root/status_revenue")
      t(spark, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("revenue_cents"))
        .write.parquet(s"$root/status_priority_revenue")
    }

  val q87Sql: String =
    """SELECT o_orderstatus, cast(count(*) as bigint) AS n_orders,
      | cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
      |   AS revenue_cents
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Winsorization (robust scaling / outlier clamping) with EXACT
    * integer order-statistic cutoffs: per group, the p01/p99 fences
    * are the cents values at integer ranks ⌈n/100⌉ and ⌈99n/100⌉ —
    * value-at-rank is well-defined under ties whatever the tie order,
    * and ceil is `(x + 99) div 100`, so the whole computation is
    * integer arithmetic both engines replay bit-for-bit (no
    * interpolated percentile float). Output per group: fences, clip
    * counts each side, exact pre/post sums — the audit a feature
    * pipeline wants before feeding a scale-sensitive model. The
    * cutoff pass here is an in-group sort (row_number window); at
    * 100 TB swap the fences to KLL/bottom-k sketch quantiles
    * (`meta_kll_quantiles` / `meta_quantile_sketch`) and keep the
    * clamp pass — the clamp itself is map-side against broadcast
    * fences either way. */
  def metaWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("g"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val ranked = li.withColumn("rn",
      row_number().over(Window.partitionBy(col("g")).orderBy(col("cents"))))
    val counts = li.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val fences = ranked.join(counts, Seq("g"))
      .filter(col("rn") === expr("(n + 99) div 100") ||
        col("rn") === expr("(n * 99 + 99) div 100"))
      .groupBy(col("g")).agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    li.join(broadcast(fences), Seq("g"))
      .select(col("g"), col("lo"), col("hi"), col("cents"),
        greatest(col("lo"), least(col("hi"), col("cents"))).as("w"))
      .groupBy(col("g"), col("lo"), col("hi"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("cents") < col("lo"), 1L).otherwise(0L)).cast("long").as("n_clip_lo"),
        sum(when(col("cents") > col("hi"), 1L).otherwise(0L)).cast("long").as("n_clip_hi"),
        sum(col("cents")).cast("long").as("sum_raw"),
        sum(col("w")).cast("long").as("sum_winsorized"))
      .orderBy(col("g"))
  }

  val metaWinsorizeSql: String =
    """WITH li AS (
      | SELECT l_returnflag AS g,
      |  cast(round(l_extendedprice * 100) as bigint) AS cents
      | FROM lineitem),
      |ranked AS (
      | SELECT g, cents,
      |  row_number() OVER (PARTITION BY g ORDER BY cents) AS rn
      | FROM li),
      |counts AS (SELECT g, count(*) AS n FROM li GROUP BY g),
      |fences AS (
      | SELECT r.g, min(r.cents) AS lo, max(r.cents) AS hi
      | FROM ranked r JOIN counts c USING (g)
      | WHERE r.rn = (c.n + 99) // 100 OR r.rn = (c.n * 99 + 99) // 100
      | GROUP BY r.g)
      |SELECT li.g, f.lo, f.hi, cast(count(*) as bigint) AS n,
      | cast(sum(CASE WHEN li.cents < f.lo THEN 1 ELSE 0 END) as bigint)
      |   AS n_clip_lo,
      | cast(sum(CASE WHEN li.cents > f.hi THEN 1 ELSE 0 END) as bigint)
      |   AS n_clip_hi,
      | cast(sum(li.cents) as bigint) AS sum_raw,
      | cast(sum(greatest(f.lo, least(f.hi, li.cents))) as bigint)
      |   AS sum_winsorized
      |FROM li JOIN fences f USING (g)
      |GROUP BY li.g, f.lo, f.hi ORDER BY li.g""".stripMargin

  /** Robust outlier detection by MEDIAN ABSOLUTE DEVIATION — the
    * robust twin of `q65_zscore_anomaly` (whose mean/stddev an outlier
    * itself corrupts; the median/MAD pair has a 50% breakdown point).
    * Exact integer order statistics throughout: per event type, median
    * = value at rank ⌈n/2⌉ of cents (the winsorize rank discipline),
    * MAD = the same rank over |cents − median|, and the flag threshold
    * is the textbook 3σ-equivalent 3·1.4826·MAD held as the integer
    * product (3·14826·mad) div 10000 — no float anywhere, so counts
    * and thresholds replay bit-for-bit in DuckDB. Two rank passes =
    * two in-group sorts sharing the (type) partitioning; at 100 TB
    * both medians come from KLL sketch quantiles and only the
    * map-side flagging pass remains. */
  def metaAnomalyMad(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_type").as("g"),
        round(col("value") * 100).cast("long").as("cents"))
    def rankStat(df: DataFrame, valueCol: String): DataFrame = {
      val w = Window.partitionBy(col("g")).orderBy(col(valueCol))
      df.withColumn("rn", row_number().over(w))
        .join(df.groupBy(col("g")).agg(count(lit(1)).as("n")), Seq("g"))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("g"), col(valueCol).as("stat"))
    }
    val med = rankStat(ev, "cents").withColumnRenamed("stat", "med")
    val dev = ev.join(med, Seq("g"))
      .withColumn("adev", abs(col("cents") - col("med")))
    val mad = rankStat(dev.select(col("g"), col("adev")), "adev")
      .withColumnRenamed("stat", "mad")
    ev.join(broadcast(med), Seq("g")).join(broadcast(mad), Seq("g"))
      .withColumn("thr", expr("(3 * 14826 * mad) div 10000"))
      .groupBy(col("g"), col("med"), col("mad"), col("thr"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(abs(col("cents") - col("med")) > col("thr"), 1L)
          .otherwise(0L)).cast("long").as("n_outliers"),
        max(when(abs(col("cents") - col("med")) > col("thr"),
          abs(col("cents") - col("med")))).cast("long").as("worst_adev"))
      .select(col("g").as("event_type"), col("med"), col("mad"), col("thr"),
        col("n"), col("n_outliers"),
        coalesce(col("worst_adev"), lit(-1L)).as("worst_adev"))
      .orderBy(col("event_type"))
  }

  val metaAnomalyMadSql: String =
    """WITH ev AS (
      | SELECT event_type AS g, cast(round(value * 100) as bigint) AS cents
      | FROM events),
      |counts AS (SELECT g, count(*) AS n FROM ev GROUP BY g),
      |med AS (
      | SELECT r.g, r.cents AS med FROM (
      |  SELECT g, cents, row_number() OVER (PARTITION BY g ORDER BY cents)
      |    AS rn FROM ev) r
      | JOIN counts c USING (g) WHERE r.rn = (c.n + 1) // 2),
      |dev AS (
      | SELECT ev.g, abs(ev.cents - med.med) AS adev
      | FROM ev JOIN med USING (g)),
      |mad AS (
      | SELECT r.g, r.adev AS mad FROM (
      |  SELECT g, adev, row_number() OVER (PARTITION BY g ORDER BY adev)
      |    AS rn FROM dev) r
      | JOIN counts c USING (g) WHERE r.rn = (c.n + 1) // 2),
      |flagged AS (
      | SELECT ev.g, med.med, mad.mad,
      |  (3 * 14826 * mad.mad) // 10000 AS thr,
      |  abs(ev.cents - med.med) AS adev
      | FROM ev JOIN med USING (g) JOIN mad USING (g))
      |SELECT g AS event_type, med, mad, thr,
      | cast(count(*) as bigint) AS n,
      | cast(sum(CASE WHEN adev > thr THEN 1 ELSE 0 END) as bigint)
      |   AS n_outliers,
      | cast(coalesce(max(CASE WHEN adev > thr THEN adev END), -1) as bigint)
      |   AS worst_adev
      |FROM flagged GROUP BY g, med, mad, thr ORDER BY event_type""".stripMargin

  /** Distribution-drift monitor — the tabular sibling of
    * `sim_embedding_drift`: per event type, the value histogram of the
    * first time-epoch against the second (day-midpoint split), scored
    * with the two-sample Pearson χ² in integer micro-units. Written in
    * PROPORTION space so every intermediate fits a long: with
    * per-epoch bin proportions p̂ₕ = oₕ·10⁶ div tₕ and pooled
    * p = (oa+ob)·10⁶ div (ta+tb), the per-cell term
    * tₕ·(p̂ₕ − p)² div (p + 1) equals χ²·10⁶ on the micro grid —
    * the textbook (o − e)²/e without the raw count-cross-product
    * (oa·T)² whose square overflows 64 bits beyond ~10⁵-row epochs;
    * this form holds to ~10⁶-row epochs and per-cell Δ ≤ 2·10⁵
    * (beyond that, promote the single multiply to decimal(38) in both
    * engines). Calibrated: under no drift each cell contributes O(10⁶)
    * (χ² ≈ O(1) per cell) independent of n, so the score is comparable
    * across epoch sizes — the property the spec pins by shifting one
    * half. One scan, one (type, bin) aggregate, one type rollup; fixed
    * integer bin edges keep epochs comparable across runs. */
  def metaDriftChi2(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        (unix_micros(col("ts")) / 86400000000L).cast("long").as("day"))
    val bounds = ev.agg(max(col("cents")).as("maxc"),
      expr("(min(day) + max(day) + 1) div 2").cast("long").as("cutoff"))
    val binned = ev.crossJoin(broadcast(bounds))
      .select(col("event_type"),
        least(lit(9L), expr("(cents * 10) div (maxc + 1)")).as("bin"),
        when(col("day") < col("cutoff"), 1L).otherwise(0L).as("in_a"))
    val cells = binned.groupBy(col("event_type"), col("bin"))
      .agg(sum(col("in_a")).as("oa"), sum(lit(1L) - col("in_a")).as("ob"))
    val totals = cells.groupBy(col("event_type"))
      .agg(sum(col("oa")).as("ta"), sum(col("ob")).as("tb"))
    cells.join(totals, Seq("event_type"))
      .select(col("event_type"), col("ta"), col("tb"),
        expr("(oa * 1000000) div greatest(ta, 1)").as("pa"),
        expr("(ob * 1000000) div greatest(tb, 1)").as("pb"),
        expr("((oa + ob) * 1000000) div greatest(ta + tb, 1)").as("pp"))
      .withColumn("term",
        expr("(ta * (pa - pp) * (pa - pp)) div (pp + 1)") +
          expr("(tb * (pb - pp) * (pb - pp)) div (pp + 1)"))
      .groupBy(col("event_type"))
      .agg(min(col("ta")).cast("long").as("n_epoch_a"),
        min(col("tb")).cast("long").as("n_epoch_b"),
        count(lit(1)).cast("long").as("n_bins"),
        sum(col("term")).cast("long").as("drift_micro"))
      .orderBy(col("event_type"))
  }

  val metaDriftChi2Sql: String =
    """WITH ev AS (
      | SELECT event_type, cast(round(value * 100) as bigint) AS cents,
      |  (epoch_ns(ts) // 1000) // 86400000000 AS day
      | FROM events),
      |bounds AS (
      | SELECT max(cents) AS maxc,
      |  (min(day) + max(day) + 1) // 2 AS cutoff FROM ev),
      |binned AS (
      | SELECT event_type, least(9, (cents * 10) // (maxc + 1)) AS bin,
      |  CASE WHEN day < cutoff THEN 1 ELSE 0 END AS in_a
      | FROM ev CROSS JOIN bounds),
      |cells AS (
      | SELECT event_type, bin, sum(in_a) AS oa, sum(1 - in_a) AS ob
      | FROM binned GROUP BY 1, 2),
      |totals AS (
      | SELECT event_type, sum(oa) AS ta, sum(ob) AS tb
      | FROM cells GROUP BY 1),
      |terms AS (
      | SELECT c.event_type, t.ta, t.tb,
      |  (c.oa * 1000000) // greatest(t.ta, 1) AS pa,
      |  (c.ob * 1000000) // greatest(t.tb, 1) AS pb,
      |  ((c.oa + c.ob) * 1000000) // greatest(t.ta + t.tb, 1) AS pp
      | FROM cells c JOIN totals t USING (event_type))
      |SELECT event_type, cast(min(ta) as bigint) AS n_epoch_a,
      | cast(min(tb) as bigint) AS n_epoch_b,
      | cast(count(*) as bigint) AS n_bins,
      | cast(sum((ta * (pa - pp) * (pa - pp)) // (pp + 1)
      |        + (tb * (pb - pp) * (pb - pp)) // (pp + 1))
      |   as bigint) AS drift_micro
      |FROM terms GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Sketch-partitioned distinct counting — the INCREMENTAL pattern
    * behind every 100 TB "unique users" dashboard: per-partition
    * (here per-month) HyperLogLog sketches are materialized ONCE as a
    * tiny binary sketch TABLE, and any rollup (quarter, year, ad-hoc
    * month set) is answered by UNIONING sketches — never rescanning
    * the fact table. Uses Spark's built-in DataSketches HLL aggregates
    * (`hll_sketch_agg` / `hll_union_agg`, codegen'd); the sketch
    * estimate is engine-specific ⇒ rows-only driver check, with the
    * load-bearing properties spec-asserted: every estimate within the
    * configured-lgK error of exact, and the union of monthly sketches
    * estimates EXACTLY what one whole-year sketch estimates
    * (mergeability — the property that makes the pattern sound). */
  def metaHllSketches(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"), col("o_custkey"))
    val skPath = scratchDir("hll_sketches")
    o.groupBy(col("m"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
        countDistinct(col("o_custkey")).as("exact"))
      .write.parquet(skPath)
    val sketches = spark.read.parquet(skPath)
    // estimate-sidecar discipline (the r10 MinHash/IVF move): the
    // sketch BINARY is engine-specific, but its estimates are
    // deterministic given the build — dump (scope, estimate) and let
    // DuckDB recompute every `exact` from orders, join the estimates
    // relationally, and replay the error classification; the entry
    // then hash-checks instead of rows-only.
    val monthly = sketches.select(col("m").as("scope"),
      hll_sketch_estimate(col("sk")).as("estimate"), col("exact"))
    val exactAll = o.agg(countDistinct(col("o_custkey")).as("exact"))
    val overall = sketches
      .agg(hll_union_agg(col("sk")).as("sk"))
      .crossJoin(exactAll)
      .select(lit("ALL").as("scope"),
        hll_sketch_estimate(col("sk")).as("estimate"), col("exact"))
    val est = monthly.unionAll(overall).select(col("scope"), col("estimate"))
    oracleSidecar("hll_estimates", est)
    monthly.unionAll(overall)
      .withColumn("err_bp",
        expr("abs(estimate - exact) * 10000 div greatest(exact, 1)"))
      .orderBy(col("scope"))
  }

  /** Exact distinct counts recomputed by DuckDB; estimates joined from
    * the sidecar; error band replayed relationally. */
  val metaHllSketchesSql: String =
    s"""WITH est AS (
       | SELECT scope, estimate
       | FROM read_parquet('${oracleSidecarGlob("hll_estimates")}')),
       |ex AS (
       | SELECT strftime(o_orderdate, '%Y-%m') AS scope,
       |  count(DISTINCT o_custkey) AS exact
       | FROM orders GROUP BY 1
       | UNION ALL
       | SELECT 'ALL', count(DISTINCT o_custkey) FROM orders)
       |SELECT e.scope, cast(s.estimate as bigint) AS estimate,
       | cast(e.exact as bigint) AS exact,
       | cast(abs(s.estimate - e.exact) * 10000
       |   // greatest(e.exact, 1) as bigint) AS err_bp
       |FROM ex e JOIN est s USING (scope)
       |ORDER BY e.scope""".stripMargin

  /** Incremental materialized-view maintenance: the view (order count
    * + revenue per (priority, month)) is stored as PARTIAL aggregates
    * — count plus the EXACT decimal(22,8) sum, never a rounded double
    * — so a delta batch refreshes it by aggregating ONLY the delta and
    * combining partials: `stored ∪ delta-partials → re-agg`. The fact
    * base is read once at materialization and never rescanned; refresh
    * cost is O(delta + |view|), the property that makes a 100 TB
    * dashboard refreshable per-micro-batch. Works because count/sum
    * are commutative monoids and decimal addition is associative —
    * the combined result is bit-identical to a full recompute, which
    * is exactly what the DuckDB oracle does (same reason avg/stddev
    * views must store (n, Σx, Σx²) partials, not finished quotients).
    */
  def q71IncrementalView(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM").as("m"), col("o_totalprice"))
    val mvPath = scratchDir("mv_partials")
    o.filter(col("o_orderkey") % 7 =!= 0)
      .groupBy(col("o_orderpriority"), col("m"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(22, 8))).as("rev"))
      .write.parquet(mvPath)
    val mv = spark.read.parquet(mvPath)
    val delta = o.filter(col("o_orderkey") % 7 === 0)
      .groupBy(col("o_orderpriority"), col("m"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(22, 8))).as("rev"))
    mv.unionByName(delta)
      .groupBy(col("o_orderpriority"), col("m"))
      .agg(sum(col("n_orders")).as("n_orders"),
        round(sum(col("rev")).cast("double"), 4).as("revenue"))
      .orderBy(col("o_orderpriority"), col("m"))
  }

  /** Full recompute over all orders — incremental maintenance must be
    * indistinguishable from it. */
  val q71Sql: String =
    s"""SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS m,
       | count(*) AS n_orders, ${sqlDsum("o_totalprice")} AS revenue
       |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** KMV (k-minimum-values / bottom-k theta) sketch table with SET
    * INTERSECTION — the cohort-overlap question HyperLogLog cannot
    * answer ("how many customers ordered in BOTH months?"). Same
    * materialize-once shape as [[metaHllSketches]], but through the
    * project's native `KmvSketchAgg` family (`functions/KmvSketch
    * .scala`): per-month bottom-k sketches of distinct `o_custkey`,
    * rollups via `KmvUnionAgg` (exactly mergeable: the union of
    * bottom-k sketches IS the bottom-k of the union — spec-asserted
    * bit-identical to a whole-set sketch), and consecutive-month
    * overlap via the clipped-theta intersection estimator.
    *
    * Scale design: each sketch is ≤ 8k bytes however many rows feed
    * it; the agg is partial-aggregable so only k hashes per partition
    * shuffle; every overlap row is answered from the sketch table
    * without rescanning the fact table. k = 64 here so the fixture
    * exercises BOTH estimator paths (un-saturated months are exact,
    * the saturated ALL rollup estimates); production would use
    * k = 2^14 (~1 % error). Sketch hashing is fixed-constant
    * splitmix64 ⇒ deterministic output, but engine-specific ⇒
    * rows-only driver check; error bounds, both-paths exactness, and
    * a sequential in-JVM referee (distributed merge ≡ sequential
    * build) are spec-asserted. */
  def metaKmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.KmvSketch._
    val o = t(spark, dir, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"), col("o_custkey"))
    val skPath = scratchDir("kmv_sketches")
    o.groupBy(col("m"))
      .agg(kmvSketch(col("o_custkey"), 64).as("sk"),
        countDistinct(col("o_custkey")).as("exact"))
      .write.parquet(skPath)
    val sk = spark.read.parquet(skPath)
    val monthly = sk.select(col("m").as("scope"),
      round(kmvEstimate(col("sk")), 2).as("estimate"), col("exact"))
    val exactAll = o.agg(countDistinct(col("o_custkey")).as("exact"))
    val overall = sk.agg(kmvUnion(col("sk")).as("sk"))
      .crossJoin(exactAll)
      .select(lit("ALL").as("scope"),
        round(kmvEstimate(col("sk")), 2).as("estimate"), col("exact"))
    // consecutive-month overlap: sketch-vs-sketch intersection beside
    // the exact distinct-customer intersection (self-join on custkey)
    val mc = o.distinct()
    val exactOv = mc.toDF("m1", "c")
      .join(mc.toDF("m2", "c"), Seq("c"))
      .filter(date_format(add_months(to_date(concat(col("m1"), lit("-01"))), 1),
        "yyyy-MM") === col("m2"))
      .groupBy(col("m1"), col("m2")).agg(count(lit(1)).as("exact"))
    val ov = sk.select(col("m").as("m1"), col("sk").as("ska"),
        date_format(add_months(to_date(concat(col("m"), lit("-01"))), 1),
          "yyyy-MM").as("m2"))
      .join(sk.select(col("m").as("m2"), col("sk").as("skb")), Seq("m2"))
      .join(exactOv, Seq("m1", "m2"), "left")
      .select(concat(col("m1"), lit("|"), col("m2")).as("scope"),
        round(kmvIntersect(col("ska"), col("skb")), 2).as("estimate"),
        coalesce(col("exact"), lit(0L)).as("exact"))
    val out = monthly.unionAll(overall).unionAll(ov)
    // estimate-sidecar discipline: the sketch binary is engine-side,
    // but every estimate is deterministic given the build — dump
    // (scope, estimate) and let DuckDB recompute all three exact
    // families (monthly distinct, ALL distinct, consecutive-month
    // overlap) from orders and join the estimates ⇒ hash-green.
    oracleSidecar("kmv_estimates", out.select(col("scope"), col("estimate")))
    out.orderBy(col("scope"))
  }

  /** Exacts (monthly/ALL distinct + consecutive-month overlap)
    * recomputed by DuckDB; sketch estimates joined from the sidecar. */
  val metaKmvOverlapSql: String =
    s"""WITH est AS (
       | SELECT scope, estimate
       | FROM read_parquet('${oracleSidecarGlob("kmv_estimates")}')),
       |mc AS (
       | SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS m, o_custkey AS c
       | FROM orders),
       |months AS (SELECT DISTINCT m FROM mc),
       |pairs AS (
       | SELECT a.m AS m1, b.m AS m2 FROM months a JOIN months b
       |  ON b.m = strftime(strptime(a.m || '-01', '%Y-%m-%d')
       |    + INTERVAL 1 MONTH, '%Y-%m')),
       |ovc AS (
       | SELECT a.m AS m1, b.m AS m2, count(*) AS cnt
       | FROM mc a JOIN mc b ON a.c = b.c GROUP BY 1, 2),
       |ex AS (
       | SELECT m AS scope, count(*) AS exact FROM mc GROUP BY m
       | UNION ALL
       | SELECT 'ALL', count(DISTINCT c) FROM mc
       | UNION ALL
       | SELECT p.m1 || '|' || p.m2, coalesce(o.cnt, 0)
       | FROM pairs p LEFT JOIN ovc o ON o.m1 = p.m1 AND o.m2 = p.m2)
       |SELECT e.scope, s.estimate, cast(e.exact as bigint) AS exact
       |FROM ex e JOIN est s USING (scope)
       |ORDER BY e.scope""".stripMargin

  /** Sketch-based JOIN-CARDINALITY estimation — the query-optimizer
    * capability behind every CBO join reorder: predict |A ⋈ B| on a
    * key from per-TABLE statistics, never by running the join. Each
    * side contributes one scan collecting (rows, distinct keys, KMV
    * sketch of the key); a candidate join is then costed in O(k) from
    * the sketch pair: est_overlap = KMV theta-intersection of the two
    * key sets, est_rows = overlap · (rowsA/dA) · (rowsB/dB) — the
    * System-R uniform-frequency model with the sketch replacing the
    * containment guess, which is where naive CBO estimates go wrong
    * on filtered/partial key spaces. At 100 TB the per-table sketch
    * pass amortizes over EVERY candidate join in the plan space
    * (k · tables bytes of state); the exact join count here is the
    * referee column, not part of the estimator. Sketch-routed →
    * rows-only; the spec bounds relative error on every row. */
  def metaJoinEstimate(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.KmvSketch._
    val k = 512
    def side(table: String, keyCol: String): DataFrame =
      t(spark, dir, table).select(col(keyCol).as("key"))
        .agg(count(lit(1)).as("rows"), countDistinct(col("key")).as("d"),
          kmvSketch(col("key"), k).as("sk"))
        .select(lit(table).as("tbl"), col("rows"), col("d"), col("sk"))
    val joins = Seq(
      ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"))
    val out = joins.map { case (name, ta, ka, tb, kb) =>
      val exact = t(spark, dir, ta).select(col(ka).as("key"))
        .join(t(spark, dir, tb).select(col(kb).as("key")), Seq("key"))
        .count()
      side(ta, ka).crossJoin(side(tb, kb).select(
          col("rows").as("rows_b"), col("d").as("d_b"), col("sk").as("sk_b")))
        .select(lit(name).as("join_name"),
          round(kmvIntersect(col("sk"), col("sk_b")), 2).as("est_overlap"),
          round(kmvIntersect(col("sk"), col("sk_b")) *
            (col("rows").cast("double") / col("d")) *
            (col("rows_b").cast("double") / col("d_b")), 2).as("est_rows"),
          lit(exact).as("exact_rows"))
    }.reduce(_ unionAll _)
    // estimate-sidecar discipline: sketch-routed estimates dumped,
    // exact join cardinalities recomputed by DuckDB ⇒ hash-green.
    oracleSidecar("join_estimates",
      out.select(col("join_name"), col("est_overlap"), col("est_rows")))
    out.orderBy(col("join_name"))
  }

  /** Exact join cardinalities recomputed by DuckDB; sketch-pair
    * estimates joined from the sidecar. */
  val metaJoinEstimateSql: String =
    s"""WITH est AS (
       | SELECT join_name, est_overlap, est_rows
       | FROM read_parquet('${oracleSidecarGlob("join_estimates")}')),
       |ex AS (
       | SELECT 'orders_customer' AS join_name, count(*) AS exact_rows
       | FROM orders JOIN customer ON o_custkey = c_custkey
       | UNION ALL
       | SELECT 'lineitem_orders', count(*)
       | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       | UNION ALL
       | SELECT 'lineitem_part', count(*)
       | FROM lineitem JOIN part ON l_partkey = p_partkey)
       |SELECT e.join_name, s.est_overlap, s.est_rows,
       | cast(e.exact_rows as bigint) AS exact_rows
       |FROM ex e JOIN est s USING (join_name)
       |ORDER BY e.join_name""".stripMargin

  /** Mergeable QUANTILE summaries from bounded uniform row samples —
    * the percentile companion of the HLL/KMV/CMS sketch tables: each
    * month keeps only the 256 rows with the smallest engine-replayable
    * Knuth priority (a uniform sample, via the native
    * `BottomKByPriority` aggregate — k pairs per group cross the
    * shuffle, never the fact rows), and any rollup re-ranks the UNION
    * of stored samples (bottom-k of a union ≡ union of bottom-ks), so
    * the ALL row never rescans orders. (priority, value-in-cents) is
    * packed into one long — priority·2²⁷ + cents, exact because cents
    * < 2²⁷ — so the sample carries its values through the id-only
    * aggregate. Quantile = exact order statistic of the sample at
    * integer index ⌊(n−1)·q⌋: everything is integer arithmetic, so —
    * unlike t-digest/KLL — the whole summary replays in DuckDB and the
    * entry is FULLY oracle-checked at every SF (months under 256 rows
    * degrade to exact quantiles; above, to the sampled estimate).
    * Sampling error is the classic O(1/√k) quantile bound —
    * spec-asserted against exact percentiles on the fixture. */
  def metaQuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val L = 134217728L // 2^27 value packing
    // o_orderkey is reduced mod 2^31 BEFORE the Knuth multiply: the
    // raw product overflows Long once o_orderkey > ~3.47e9 (Spark ANSI
    // would error; DuckDB raises) — (2^31-1) * 2654435761 < 2^63 keeps
    // both engines exact at any SF, and the reduction is the identity
    // for every realistic orderkey range below 2^31. The 2^27 cents
    // bound (o_totalprice < 1,342,177.28) is spec-asserted.
    val packed = t(spark, dir, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"),
        (pmod(pmod(col("o_orderkey"), lit(2147483648L)) * lit(2654435761L),
          lit(4294967296L)) * lit(L) +
          expr("cast(round(o_totalprice * 100, 0) as bigint)")).as("packed"))
    val monthly = packed.groupBy(col("m"))
      .agg(graft.functions.BottomKByPriority.bottomK(col("packed"), col("packed"), 256).as("sample"))
    val allScope = monthly
      .select(explode(col("sample")).as("packed"))
      .agg(graft.functions.BottomKByPriority.bottomK(col("packed"), col("packed"), 256).as("sample"))
      .select(lit("ALL").as("scope"), col("sample"))
    def quants(df: DataFrame): DataFrame = df
      .withColumn("cents", expr(s"array_sort(transform(sample, x -> x % ${L}L))"))
      .select(col("scope"),
        size(col("cents")).cast("long").as("n_sample"),
        expr("element_at(cents, cast((size(cents)-1)/2 as int) + 1)").as("p50_cents"),
        expr("element_at(cents, cast((size(cents)-1)*9/10 as int) + 1)").as("p90_cents"))
    quants(monthly.select(col("m").as("scope"), col("sample")).unionByName(allScope))
      .orderBy(col("scope"))
  }

  /** DuckDB replays the identical priorities, ranks, union, and
    * order-statistic indexes — all integer arithmetic. */
  val metaQuantileSketchSql: String =
    """WITH pk AS (
      | SELECT strftime(o_orderdate, '%Y-%m') AS m,
      |  (((o_orderkey % 2147483648) * 2654435761) % 4294967296) * 134217728
      |    + cast(round(o_totalprice * 100, 0) as bigint) AS packed
      | FROM orders),
      |ms AS (SELECT m, packed FROM (
      |  SELECT m, packed, row_number() OVER (PARTITION BY m ORDER BY packed) AS rk
      |  FROM pk) WHERE rk <= 256),
      |alls AS (SELECT 'ALL' AS m, packed FROM (
      |  SELECT packed, row_number() OVER (ORDER BY packed) AS rk FROM ms)
      | WHERE rk <= 256),
      |vals AS (SELECT m AS scope, packed % 134217728 AS cents
      |         FROM (SELECT * FROM ms UNION ALL SELECT * FROM alls)),
      |rk AS (SELECT scope, cents,
      |  row_number() OVER (PARTITION BY scope ORDER BY cents) AS r,
      |  count(*) OVER (PARTITION BY scope) AS n FROM vals)
      |SELECT scope, cast(any_value(n) as bigint) AS n_sample,
      | max(CASE WHEN r = (n-1)//2 + 1 THEN cents END) AS p50_cents,
      | max(CASE WHEN r = (n-1)*9//10 + 1 THEN cents END) AS p90_cents
      |FROM rk GROUP BY scope ORDER BY scope""".stripMargin

  /** Mergeable KLL quantile summary ([[graft.functions.Kll]]) beside
    * the EXACT bottom-k sampler above: per-month sketches of
    * o_totalprice cents, plus the ALL scope produced by MERGING the
    * monthly sketches (never re-scanning the facts) — the rollup only
    * a mergeable summary supports, and the reason a 100 TB quantile
    * cube is one scan + kilobyte-sized merges instead of one global
    * sort per cell. Emits per scope: n (exact — KLL tracks it), p50 /
    * p90 / p99 estimates, and the retained-bytes size whose O(k)
    * bound the spec pins. Compaction order varies with merge order ⇒
    * approximation-equivalent, not bit-identical → rows-only; specs
    * referee against exact order statistics (rank error ≤ 3/k·n),
    * mergeability, and the size bound. */
  def metaKllQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.KllSketch._
    val k = 200
    val cents = t(spark, dir, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"),
        expr("cast(round(o_totalprice * 100, 0) as bigint)").cast("double").as("cents"))
    val monthly = cents.groupBy(col("m"))
      .agg(kllSketch(col("cents"), k).as("sk"))
    val allScope = monthly
      .agg(kllMerge(col("sk")).as("sk"))
      .select(lit("ALL").as("m"), col("sk"))
    // MATERIALIZE once (scope-count rows): the ALL scope merges the
    // monthly sketches in shuffle-fetch order, and KLL compaction is
    // merge-order-sensitive — executing the plan twice (sidecar dump +
    // returned answer) could therefore dump estimates that differ from
    // the answer's and fail the hash intermittently. One bounded
    // collect feeds both (same guard as q46ApproxPercentile).
    val out = materializeLocal(monthly.unionByName(allScope)
      .select(col("m").as("scope"),
        kllCount(col("sk")).as("n"),
        kllQuantiles(col("sk"), array(lit(0.5), lit(0.9), lit(0.99))).as("qs"),
        length(col("sk")).cast("long").as("sketch_bytes"))
      .select(col("scope"), col("n"),
        element_at(col("qs"), 1).as("p50_cents"),
        element_at(col("qs"), 2).as("p90_cents"),
        element_at(col("qs"), 3).as("p99_cents"),
        col("sketch_bytes")))
    // estimate-sidecar discipline: quantile estimates + retained-size
    // are engine-side but deterministic given the build — dump them
    // and let DuckDB recompute every scope's EXACT n from orders
    // (KLL tracks n exactly, so a mismatch is a real bug) ⇒ the
    // entry hash-checks instead of rows-only.
    oracleSidecar("kll_estimates", out.select(col("scope"),
      col("p50_cents"), col("p90_cents"), col("p99_cents"),
      col("sketch_bytes")))
    out.orderBy(col("scope"))
  }

  /** Exact per-scope row counts recomputed by DuckDB (KLL's n is
    * exact by contract); quantile estimates + sketch size joined from
    * the sidecar. */
  val metaKllQuantilesSql: String =
    s"""WITH est AS (
       | SELECT scope, p50_cents, p90_cents, p99_cents, sketch_bytes
       | FROM read_parquet('${oracleSidecarGlob("kll_estimates")}')),
       |ex AS (
       | SELECT strftime(o_orderdate, '%Y-%m') AS scope, count(*) AS n
       | FROM orders GROUP BY 1
       | UNION ALL
       | SELECT 'ALL', count(*) FROM orders)
       |SELECT e.scope, cast(e.n as bigint) AS n,
       | s.p50_cents, s.p90_cents, s.p99_cents,
       | cast(s.sketch_bytes as bigint) AS sketch_bytes
       |FROM ex e JOIN est s USING (scope)
       |ORDER BY e.scope""".stripMargin

  /** RESOURCE AUDIT of the heavy-tier entries — wall time predicts
    * 100× behavior worse than STATE GROWTH does, so this entry runs
    * the registry's heaviest batch operators at the two smallest
    * published scale factors and measures, per run, the task-metric
    * totals a capacity planner actually needs: peak execution memory
    * (max over tasks), spilled bytes (memory + disk), and shuffle
    * records written. The headline column is `growth_ratio_bp`
    * (shuffle records hi/lo in basis points): the fixture SF ratio is
    * 10×, so a linear operator reads ≈ 100 000 bp and anything
    * `superlinear` (> 2× the data ratio, i.e. > 200 000 bp) is flagged
    * — a quadratic candidate generator would read ~10⁶ bp. Shuffle
    * RECORDS (not bytes) are the signal because they are
    * deterministic given the plan, while memory/spill are
    * environment-dependent (reported, but rows-only — hence no
    * DuckDB oracle; the spec asserts the laws: panel coverage,
    * non-negative metrics, sub-superlinear growth for every entry).
    * The audit pins the two SMALLEST SFs regardless of the serving
    * `dir`, so its own cost stays answer-sized at any scale; the
    * growth LAW, not the absolute SF, is what it certifies. */
  /** JOB-GROUP-SCOPED task-metric probe: counts ONLY tasks whose stage
    * belongs to a job started under `groupId` — any concurrent job on
    * the shared SparkContext (a parallel bench rep, a zombie stream's
    * micro-batch) would otherwise pollute the growth ratios the audit
    * certifies. Stage→group membership is learned from onJobStart
    * (which carries the submitting thread's jobGroup property and the
    * job's stage ids); onTaskEnd filters on that stage set. */
  private[graft] final class AuditProbe(groupId: String)
      extends org.apache.spark.scheduler.SparkListener {
    import java.util.concurrent.atomic.AtomicLong
    val peak = new AtomicLong(0L)
    val spilled = new AtomicLong(0L)
    val shuffleRecs = new AtomicLong(0L)
    val tasks = new AtomicLong(0L)
    private val myStages =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    override def onJobStart(
        js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      if (js.properties != null &&
          groupId == js.properties.getProperty("spark.jobGroup.id")) {
        js.stageIds.foreach(id => myStages.add(id))
        ()
      }
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null && myStages.contains(te.stageId)) {
        peak.getAndAccumulate(m.peakExecutionMemory, math.max)
        spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        shuffleRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        tasks.incrementAndGet()
        ()
      }
    }
  }

  /** Run `fn(spark, d).count()` under a fresh audit job group and
    * return its (shuffleRecords, peakMem, spilledBytes) — package-
    * visible so the concurrent-pollution spec can exercise it with a
    * rival job in flight. */
  private[graft] def auditMeasure(spark: SparkSession,
      fn: (SparkSession, String) => DataFrame, d: String): (Long, Long, Long) = {
    val groupId = s"graft-audit-${java.util.UUID.randomUUID}"
    val p = new AuditProbe(groupId)
    spark.sparkContext.addSparkListener(p)
    try {
      spark.sparkContext.setJobGroup(groupId, "graft resource audit", false)
      try fn(spark, d).count()
      finally spark.sparkContext.clearJobGroup()
      // the listener bus is async: poll until the task counter is
      // stable for 100 ms (bounded at 5 s) before reading totals
      var last = -1L; var stable = 0; var waited = 0
      while (stable < 2 && waited < 100) {
        val now = p.tasks.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
        Thread.sleep(50); waited += 1
      }
    } finally spark.sparkContext.removeSparkListener(p)
    (p.shuffleRecs.get(), p.peak.get(), p.spilled.get())
  }

  /** MD5 (16 hex chars) over the compiled bytecode of EVERY class in
    * the graft package — the certificate's code-version key. The r16
    * version hashed only five top-level module class files, but panel
    * behavior also lives in separately-compiled nested and anonymous
    * classes (Warehouse$AuditProbe — the listener doing the counting —
    * Analytics$$anon$*, typecreators) and in helpers outside those
    * files (util.t, source readers): an edit confined to such a class
    * left every hashed file byte-identical and served a STALE
    * certificate (ADVICE r16). Enumerating the whole package prefix
    * over-invalidates — any graft edit forces one honest ~8 s
    * re-measure — which is the safe direction for a certificate.
    * Entries are sorted by resource name so the digest is independent
    * of filesystem/jar iteration order. */
  private[graft] lazy val auditCodeKey: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val src = Warehouse.getClass.getProtectionDomain.getCodeSource
    require(src != null && src.getLocation != null,
      "auditCodeKey: no code source for the graft classes — refusing " +
      "a constant key (it would serve stale certificates forever)")
    val loc = new java.io.File(src.getLocation.toURI)
    def hashEntry(name: String, bytes: Array[Byte]): Unit = {
      md.update(name.getBytes("UTF-8")); md.update(bytes)
    }
    var n = 0
    if (loc.isDirectory) {
      def walk(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        if (f.isDirectory) kids.flatMap(walk) else Seq(f)
      }
      val base = loc.toPath
      walk(new java.io.File(loc, "graft"))
        .filter(_.getName.endsWith(".class"))
        .map(f => base.relativize(f.toPath).toString.replace('\\', '/') -> f)
        .sortBy(_._1)
        .foreach { case (name, f) =>
          hashEntry(name, java.nio.file.Files.readAllBytes(f.toPath)); n += 1
        }
    } else {
      val jar = new java.util.jar.JarFile(loc)
      try {
        import scala.jdk.CollectionConverters._
        jar.entries().asScala
          .filter(e => e.getName.startsWith("graft/") &&
            e.getName.endsWith(".class"))
          .toSeq.sortBy(_.getName)
          .foreach { e =>
            val in = jar.getInputStream(e)
            try hashEntry(e.getName, in.readAllBytes()) finally in.close()
            n += 1
          }
      } finally jar.close()
    }
    require(n > 0, "auditCodeKey: zero graft .class resources found " +
      "under the code source — refusing a constant key")
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  def metaResourceAudit(spark: SparkSession, dir: String): DataFrame = {
    val parent = new java.io.File(dir).getParentFile
    // FAIL, don't degrade: measuring the same dir twice reads ratio
    // exactly 10000 bp and recLo==0 reads ratio 0 — both would pass
    // the superlinear gate vacuously, turning a broken measurement
    // into a false certificate. A missing fixture is a loud error.
    def sfDir(name: String): String = {
      val f = new java.io.File(parent, name)
      require(f.isDirectory,
        s"metaResourceAudit: fixture dir $f is missing — the growth " +
        "ratio needs BOTH published small SFs; refusing to measure " +
        "one dir twice (ratio would be vacuously linear)")
      f.getPath
    }
    val lo = sfDir("sf0.001")
    val hi = sfDir("sf0.01")
    val panel: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("graph_hits", Graph.hits),
      ("graph_shortest_paths_frontier", Graph.shortestPathsFrontier),
      ("sim_knn_join_ivf", Similarity.knnJoinIvf),
      ("sim_mutual_nn", Similarity.mutualNn),
      ("q103_abc_xyz", Analytics.q103AbcXyz))
    import spark.implicits._
    panel.map { case (name, fn) =>
      // MEASURE ONCE PER (data, code) ACROSS JVMs: shuffle records are
      // deterministic given the plan and the fixture bytes, so the
      // certificate is cacheable like any trained index — the panel
      // was 11.3 s (3.9% of the whole bench) re-measuring the same
      // unchanged plans every run. Invalidation keys on the BYTECODE
      // of the WHOLE graft package (not on plan hashes: CONSTRUCTING
      // an iterative entry like graph_hits executes its eager
      // per-superstep checkpoints, so a plan probe costs as much as
      // the measurement it tries to skip). Package-wide bytecode
      // over-invalidates — any graft edit forces one honest ~8 s
      // re-measure — which is the safe direction for a certificate;
      // the r16 five-file version under-invalidated on edits confined
      // to nested/anon classes or helpers. peak/spill ride along as the
      // measuring run's environment-dependent observations (the
      // entry is rows-only declared for exactly that reason).
      // data key spans every table the panel reads (graph: orders +
      // lineitem, sim: embeddings, q103: lineitem) at both fixtures —
      // per-table fingerprints CONCATENATED directly (collapsing them
      // through a second 32-bit hash was weaker than the artifact-key
      // discipline everywhere else, ADVICE r16)
      val dataKey = Seq(lo, hi)
        .flatMap(d => Seq("orders", "lineitem", "embeddings")
          .map(tableFingerprint(d, _))).mkString("-")
      // session conf shapes the physical plan and hence the shuffle-
      // record counts (AQE, broadcast threshold, partition counts): a
      // certificate measured under one conf must not be served as
      // another JVM's own observation (ADVICE r16)
      val confKey = Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(Seq(
          "spark.sql.adaptive.enabled",
          "spark.sql.adaptive.coalescePartitions.enabled",
          "spark.sql.adaptive.skewJoin.enabled",
          "spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.shuffle.partitions")
          .map(k => s"$k=${spark.conf.getOption(k).getOrElse("")}")
          .mkString("|")))
      val codeKey = auditCodeKey
      val root = artifactRoot(
          s"audit-$name-$dataKey-$confKey-$codeKey") { staged =>
        // WARM PASS (un-instrumented) at both SFs first: panel entries
        // lazily build cross-JVM cached artifacts (trade graph, IVF
        // index, seed BFS) on first touch, and in a fresh artifact
        // cache that build lands INSIDE whichever SF's instrumented
        // run reaches it first — the growth ratio then certifies
        // cache state, not the entry's plan (observed on a fresh
        // sandbox: graph_hits 630 → 113,507 records = "180×" because
        // only the hi run paid the sf0.01 trade-graph build). The law
        // this certificate carries is about the entry's own
        // steady-state shuffle growth — the build cost is a separate,
        // amortized concern (see Bench.amortizedEntries) — so measure
        // warm on both sides, deterministically.
        fn(spark, lo).count(); fn(spark, hi).count()
        val (recLo, _, _) = auditMeasure(spark, fn, lo)
        val (recHi, peakHi, spillHi) = auditMeasure(spark, fn, hi)
        require(recLo > 0,
          s"metaResourceAudit: $name wrote 0 shuffle records at $lo — " +
          "a zero baseline makes the growth ratio meaningless (every " +
          "panel operator shuffles by design); measurement is broken")
        val d = new java.io.File(staged); d.mkdirs()
        java.nio.file.Files.writeString(
          d.toPath.resolve("measurement.csv"),
          s"$recLo,$recHi,$peakHi,$spillHi\n")
        ()
      }
      val Array(recLo, recHi, peakHi, spillHi) =
        java.nio.file.Files.readString(
          java.nio.file.Paths.get(root, "measurement.csv"))
          .trim.split(",").map(_.toLong)
      val ratioBp = recHi * 10000L / recLo
      (name, recLo, recHi, ratioBp, ratioBp > 200000L, peakHi, spillHi)
    }.toDF("entry", "shuffle_records_lo", "shuffle_records_hi",
      "growth_ratio_bp", "superlinear", "peak_mem_hi_bytes",
      "spilled_hi_bytes")
      .orderBy(col("entry"))
  }

  /** Data-quality expectations report (dbt-test/Deequ-style): each row
    * is one declared constraint over the star schema — key uniqueness,
    * non-null, referential integrity, accepted range — with its
    * violation count and verdict. Every check is an independent
    * aggregate/anti-join (no cross-check dependency), so on a cluster
    * they run as parallel jobs over pruned column subsets; the report
    * union is six 1-row DataFrames. */
  def metaExpectations(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    val lineitem = t(spark, dir, "lineitem")
    val events = t(spark, dir, "events")
    def check(name: String, violations: DataFrame): DataFrame =
      violations.select(lit(name).as("check_name"), col("violations"))
    val report =
      check("orders_pk_unique",
        orders.agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("violations"))) union
      check("customer_name_not_null",
        customer.agg(count(when(col("c_name").isNull, 1)).as("violations"))) union
      check("orders_custkey_fk",
        orders.join(customer, col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("violations"))) union
      check("lineitem_qty_range",
        lineitem.agg(count(when(col("l_quantity") < 0 || col("l_quantity") > 60, 1)).as("violations"))) union
      check("lineitem_orderkey_fk",
        lineitem.join(orders, col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("violations"))) union
      check("events_value_not_null",
        events.agg(count(when(col("value").isNull, 1)).as("violations")))
    report
      .withColumn("pass", col("violations") === 0)
      .orderBy(col("check_name"))
  }

  val metaExpectationsSql: String =
    """SELECT check_name, violations, violations = 0 AS pass FROM (
      |  SELECT 'orders_pk_unique' AS check_name,
      |         (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS violations
      |  UNION ALL SELECT 'customer_name_not_null',
      |         (SELECT count(*) FROM customer WHERE c_name IS NULL)
      |  UNION ALL SELECT 'orders_custkey_fk',
      |         (SELECT count(*) FROM orders o
      |          WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |  UNION ALL SELECT 'lineitem_qty_range',
      |         (SELECT count(*) FROM lineitem WHERE l_quantity < 0 OR l_quantity > 60)
      |  UNION ALL SELECT 'lineitem_orderkey_fk',
      |         (SELECT count(*) FROM lineitem l
      |          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |  UNION ALL SELECT 'events_value_not_null',
      |         (SELECT count(*) FROM events WHERE value IS NULL)
      |) ORDER BY check_name""".stripMargin

  /** Two-sample Kolmogorov–Smirnov drift monitor — the ECDF sibling of
    * [[metaDriftChi2]]: per event type, the supremum gap between the
    * first and second time-epoch empirical CDFs of the value column.
    * Where χ² needs binning (and is blind to within-bin shifts), KS
    * compares the FULL distributions: D = max over observed values of
    * |F̂ₐ(v) − F̂ᵦ(v)|, computed entirely in integer micro-units
    * (cumulative counts are exact; each CDF step is `cum·10⁶ div t`),
    * so the statistic replays bit-identically in DuckDB. Also reports
    * WHERE the gap peaks (the smallest cents value attaining D) — the
    * actionable half of a drift alert. Plan shape: one scan → one
    * (type, value) aggregate → two cumulative windows sharing one sort
    * → answer-sized rollup; per-type distinct-value sequences bound the
    * window work, nothing is quadratic. */
  def metaDriftKs(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        (unix_micros(col("ts")) / 86400000000L).cast("long").as("day"))
    val bounds = ev.agg(
      expr("(min(day) + max(day) + 1) div 2").cast("long").as("cutoff"))
    val cells = ev.crossJoin(broadcast(bounds))
      .withColumn("in_a", when(col("day") < col("cutoff"), 1L).otherwise(0L))
      .groupBy(col("event_type"), col("cents"))
      .agg(sum(col("in_a")).as("ca"), sum(lit(1L) - col("in_a")).as("cb"))
    val totals = cells.groupBy(col("event_type"))
      .agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"))
    val cumw = Window.partitionBy(col("event_type")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val steps = cells.join(totals, Seq("event_type"))
      .withColumn("cuma", sum(col("ca")).over(cumw))
      .withColumn("cumb", sum(col("cb")).over(cumw))
      .withColumn("d_micro", abs(
        expr("(cuma * 1000000) div greatest(ta, 1)") -
          expr("(cumb * 1000000) div greatest(tb, 1)")))
    val pick = Window.partitionBy(col("event_type"))
      .orderBy(desc("d_micro"), col("cents"))
    steps.withColumn("rk", row_number().over(pick))
      .filter(col("rk") === 1)
      .select(col("event_type"),
        col("ta").cast("long").as("n_epoch_a"),
        col("tb").cast("long").as("n_epoch_b"),
        col("d_micro").cast("long").as("ks_micro"),
        col("cents").cast("long").as("ks_at_cents"))
      .orderBy(col("event_type"))
  }

  val metaDriftKsSql: String =
    """WITH ev AS (
      | SELECT event_type, cast(round(value * 100) as bigint) AS cents,
      |  (epoch_ns(ts) // 1000) // 86400000000 AS day
      | FROM events),
      |bounds AS (SELECT (min(day) + max(day) + 1) // 2 AS cutoff FROM ev),
      |cells AS (
      | SELECT event_type, cents,
      |  sum(CASE WHEN day < cutoff THEN 1 ELSE 0 END) AS ca,
      |  sum(CASE WHEN day < cutoff THEN 0 ELSE 1 END) AS cb
      | FROM ev CROSS JOIN bounds GROUP BY 1, 2),
      |totals AS (
      | SELECT event_type, sum(ca) AS ta, sum(cb) AS tb FROM cells GROUP BY 1),
      |steps AS (
      | SELECT c.event_type, c.cents, t.ta, t.tb,
      |  abs((sum(c.ca) OVER w * 1000000) // greatest(t.ta, 1)
      |    - (sum(c.cb) OVER w * 1000000) // greatest(t.tb, 1)) AS d_micro
      | FROM cells c JOIN totals t USING (event_type)
      | WINDOW w AS (PARTITION BY c.event_type ORDER BY c.cents
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |picked AS (
      | SELECT *, row_number() OVER (PARTITION BY event_type
      |   ORDER BY d_micro DESC, cents) AS rk FROM steps)
      |SELECT event_type, cast(ta as bigint) AS n_epoch_a,
      | cast(tb as bigint) AS n_epoch_b,
      | cast(d_micro as bigint) AS ks_micro,
      | cast(cents as bigint) AS ks_at_cents
      |FROM picked WHERE rk = 1 ORDER BY event_type""".stripMargin

  /** ROC AUC by rank-sum (Mann–Whitney U) — the standard
    * label-separability score for a candidate feature, computed
    * EXACTLY: AUC = P(score⁺ > score⁻) + ½·P(tie), and with grouped
    * value counts 2U = Σ_v c⁺(v)·(2·Σ_{u<v} c⁻(u) + c⁻(v)) is pure
    * integer arithmetic — no per-row ranks, no float midranks
    * (doubling clears the ½-tie terms; the final `·10⁶ div 2n⁺n⁻`
    * lands on the micro grid identically in both engines). Here:
    * does the event value separate purchases from each other event
    * type — one AUC row per negative class, 0.5·10⁶ ≈ "no signal".
    * Plan shape: value-grouped counts (answer-sized per type), one
    * cumulative window per negative class, answer-sized rollup —
    * the n·log n sort-free form that scales to 100 TB because U
    * consumes COUNTS, never row ranks. */
  def metaAucRanksum(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val pos = ev.filter(col("event_type") === "purchase")
      .groupBy(col("cents")).agg(count(lit(1)).as("cp"))
    val neg = ev.filter(col("event_type") =!= "purchase")
      .groupBy(col("event_type").as("neg_type"), col("cents"))
      .agg(count(lit(1)).as("cn"))
    // every class needs EVERY positive value row (cp) plus its own
    // negative rows (cn): fan positives across the class list, then
    // union the negative-only values — mirrors the oracle SQL 1:1
    val classes = neg.select(col("neg_type")).distinct()
    val posFanned = pos.crossJoin(broadcast(classes))
      .join(neg, Seq("neg_type", "cents"), "left")
      .select(col("neg_type"), col("cents"), col("cp"),
        coalesce(col("cn"), lit(0L)).as("cn"))
    val negOnly = neg.join(pos, Seq("cents"), "left_anti")
      .select(col("neg_type"), col("cents"), lit(0L).as("cp"), col("cn"))
    val fanned = posFanned.unionByName(negOnly)
      .groupBy(col("neg_type"), col("cents"))
      .agg(sum(col("cp")).as("cp"), sum(col("cn")).as("cn"))
    val below = Window.partitionBy(col("neg_type")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    fanned
      .withColumn("negBelow",
        coalesce(sum(col("cn")).over(below), lit(0L)))
      .groupBy(col("neg_type"))
      // the U statistic is n_pos·n_neg-scaled (n²): accumulate in
      // decimal(38,0) (DuckDB: HUGEINT) and derive auc_micro — the
      // bounded answer — from the exact decimal BEFORE the reported
      // u2 narrows to int64 (u2 itself is a diagnostic, bounded to
      // ~2e9 events per class as an int64 column)
      .agg(sum(col("cp")).cast("long").as("n_pos"),
        sum(col("cn")).cast("long").as("n_neg"),
        sum(expr("cast(cp as decimal(38,0)) * (negBelow * 2 + cn)"))
          .as("u2d"))
      .withColumn("auc_micro",
        expr("(u2d * 1000000) div (cast(n_pos as decimal(38,0)) * n_neg * 2)")
          .cast("long"))
      .select(col("neg_type"), col("n_pos"), col("n_neg"),
        col("u2d").cast("long").as("u2"), col("auc_micro"))
      .orderBy(col("neg_type"))
  }

  val metaAucRanksumSql: String =
    """WITH ev AS (
      | SELECT event_type, cast(round(value * 100) as bigint) AS cents
      | FROM events),
      |pos AS (SELECT cents, count(*) AS cp FROM ev
      |        WHERE event_type = 'purchase' GROUP BY 1),
      |neg AS (SELECT event_type AS neg_type, cents, count(*) AS cn FROM ev
      |        WHERE event_type <> 'purchase' GROUP BY 1, 2),
      |classes AS (SELECT DISTINCT neg_type FROM neg),
      |fanned AS (
      | SELECT c.neg_type, p.cents, p.cp, coalesce(n.cn, 0) AS cn
      | FROM pos p CROSS JOIN classes c
      | LEFT JOIN neg n ON n.neg_type = c.neg_type AND n.cents = p.cents
      | UNION ALL
      | SELECT n.neg_type, n.cents, 0 AS cp, n.cn
      | FROM neg n WHERE NOT EXISTS
      |   (SELECT 1 FROM pos p WHERE p.cents = n.cents)),
      |grouped AS (
      | SELECT neg_type, cents, sum(cp) AS cp, sum(cn) AS cn
      | FROM fanned GROUP BY 1, 2),
      |cum AS (
      | SELECT *, coalesce(sum(cn) OVER (PARTITION BY neg_type
      |   ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |   0) AS negBelow
      | FROM grouped),
      |rolled AS (
      | SELECT neg_type, cast(sum(cp) as bigint) AS n_pos,
      |  cast(sum(cn) as bigint) AS n_neg,
      |  sum(cast(cp as hugeint) * (negBelow * 2 + cn)) AS u2h
      | FROM cum GROUP BY 1)
      |SELECT neg_type, n_pos, n_neg, cast(u2h as bigint) AS u2,
      | cast((u2h * 1000000) // (cast(n_pos as hugeint) * n_neg * 2)
      |   as bigint) AS auc_micro
      |FROM rolled ORDER BY neg_type""".stripMargin

  /** Benford first-digit audit — the classic fabricated-data detector
    * for multi-scale positive amounts: the observed share of each
    * leading significant digit against Benford's log₁₀(1+1/d) law.
    * The expected shares are FIXED integer micro constants (301030,
    * 176091, … — log never evaluates at query time), observed shares
    * are exact `count·10⁶ div n`, and the per-digit deviation and
    * total-variation rollup are integer sums, so the whole audit
    * replays bit-identically in DuckDB. One scan + one 9-group
    * aggregate: scan-speed at any scale. The synthetic prices are
    * roughly uniform-by-scale, so deviations here are LARGE — the
    * audit's job is the measurement, and the spec pins calibration on
    * a constructed Benford-distributed column instead. */
  val benfordMicro: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  def metaBenford(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val exp = benfordMicro.toDF("digit", "exp_micro")
    val digits = t(spark, dir, "orders")
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
    val n = digits.agg(count(lit(1)).as("n"))
    broadcast(exp)
      .join(digits.groupBy(col("digit")).agg(count(lit(1)).as("c")), Seq("digit"), "left")
      .crossJoin(broadcast(n))
      .select(col("digit"),
        coalesce(col("c"), lit(0L)).cast("long").as("n_obs"),
        expr("(coalesce(c, 0) * 1000000) div n").cast("long").as("obs_micro"),
        col("exp_micro").cast("long").as("exp_micro"))
      .withColumn("dev_micro", abs(col("obs_micro") - col("exp_micro")))
      .orderBy(col("digit"))
  }

  val metaBenfordSql: String = {
    val expRows = benfordMicro
      .map { case (d, m) => s"($d, ${m}::BIGINT)" }.mkString(", ")
    s"""WITH exp(digit, exp_micro) AS (VALUES $expRows),
       |digits AS (
       | SELECT cast(substr(cast(cents as varchar), 1, 1) as int) AS digit
       | FROM (SELECT cast(round(o_totalprice * 100) as bigint) AS cents
       |       FROM orders) WHERE cents > 0),
       |obs AS (SELECT digit, count(*) AS c FROM digits GROUP BY digit),
       |tot AS (SELECT count(*) AS n FROM digits)
       |SELECT e.digit, cast(coalesce(o.c, 0) as bigint) AS n_obs,
       | cast((coalesce(o.c, 0) * 1000000) // n as bigint) AS obs_micro,
       | cast(e.exp_micro as bigint) AS exp_micro,
       | cast(abs((coalesce(o.c, 0) * 1000000) // n - e.exp_micro) as bigint)
       |   AS dev_micro
       |FROM exp e LEFT JOIN obs o ON e.digit = o.digit CROSS JOIN tot
       |ORDER BY e.digit""".stripMargin
  }

  /** Cross-table reconciliation — the daily warehouse audit that
    * catches partial loads and double-applied CDC: the order header's
    * total against the sum of its line items, classified per order
    * (header_higher / lines_higher / missing_lines — this synthetic
    * schema has no exact-equality invariant, so the report measures
    * the discrepancy rather than asserting zero) and rolled up with
    * exact integer diff magnitudes. One outer join on the key, one
    * class rollup; at 100 TB both sides bucket on the order key and
    * the report stays answer-sized. */
  def metaReconcile(spark: SparkSession, dir: String): DataFrame = {
    val hdr = t(spark, dir, "orders")
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("hdr_cents"))
    val lines = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("line_cents"))
    hdr.join(lines, col("o_orderkey") === col("l_orderkey"), "left")
      .withColumn("cls",
        when(col("line_cents").isNull, lit("missing_lines"))
          .when(col("hdr_cents") > col("line_cents"), lit("header_higher"))
          .when(col("hdr_cents") < col("line_cents"), lit("lines_higher"))
          .otherwise(lit("equal")))
      .groupBy(col("cls"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        sum(abs(col("hdr_cents") - coalesce(col("line_cents"), lit(0L))))
          .cast("long").as("abs_diff_cents"))
      .orderBy(col("cls"))
  }

  val metaReconcileSql: String =
    """WITH hdr AS (
      | SELECT o_orderkey, cast(round(o_totalprice * 100) as bigint) AS hdr_cents
      | FROM orders),
      |lines AS (
      | SELECT l_orderkey,
      |  sum(cast(round(l_extendedprice * 100) as bigint)) AS line_cents
      | FROM lineitem GROUP BY 1),
      |classed AS (
      | SELECT CASE WHEN line_cents IS NULL THEN 'missing_lines'
      |             WHEN hdr_cents > line_cents THEN 'header_higher'
      |             WHEN hdr_cents < line_cents THEN 'lines_higher'
      |             ELSE 'equal' END AS cls,
      |  abs(hdr_cents - coalesce(line_cents, 0)) AS adiff
      | FROM hdr LEFT JOIN lines ON o_orderkey = l_orderkey)
      |SELECT cls, cast(count(*) as bigint) AS n_orders,
      | cast(sum(adiff) as bigint) AS abs_diff_cents
      |FROM classed GROUP BY cls ORDER BY cls""".stripMargin

  /** k-anonymity audit (Sweeney, 2002) — the privacy gate a
    * training-data release runs before shipping user-derived tables:
    * group by the quasi-identifier tuple (market segment × nation ×
    * $1000 balance bucket) and measure how small the smallest
    * equivalence classes are. A record in a group of size < k is
    * re-identifiable; the report carries, per segment, the group
    * count, the minimum class size, and how many records would need
    * suppression/generalization to reach k = 5 — all exact integer
    * counts, fully replayed in DuckDB. One aggregate at QI grain +
    * one rollup; at 100 TB this is scan-speed and the QI grain table
    * is the thing you'd iterate on (coarser buckets) until the
    * suppression share is acceptable. */
  def metaKAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val qi = t(spark, dir, "customer")
      .select(col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"),
        expr("cast(round(c_acctbal * 100) as bigint) div 100000").as("balb"))
      .groupBy(col("seg"), col("nat"), col("balb"))
      .agg(count(lit(1)).as("k"))
    qi.groupBy(col("seg"))
      .agg(count(lit(1)).cast("long").as("n_groups"),
        min(col("k")).cast("long").as("min_k"),
        sum(when(col("k") < 5, 1L).otherwise(0L)).cast("long").as("n_small_groups"),
        sum(when(col("k") < 5, col("k")).otherwise(0L)).cast("long").as("n_suppressed"),
        sum(col("k")).cast("long").as("n_records"))
      .orderBy(col("seg"))
  }

  val metaKAnonymitySql: String =
    """WITH qi AS (
      | SELECT c_mktsegment AS seg, c_nationkey AS nat,
      |  cast(round(c_acctbal * 100) as bigint) // 100000 AS balb,
      |  count(*) AS k
      | FROM customer GROUP BY 1, 2, 3)
      |SELECT seg, cast(count(*) as bigint) AS n_groups,
      | cast(min(k) as bigint) AS min_k,
      | cast(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) as bigint) AS n_small_groups,
      | cast(sum(CASE WHEN k < 5 THEN k ELSE 0 END) as bigint) AS n_suppressed,
      | cast(sum(k) as bigint) AS n_records
      |FROM qi GROUP BY seg ORDER BY seg""".stripMargin

  /** ℓ-diversity audit (Machanavajjhala et al., ICDE'06) — the
    * k-anonymity follow-up every privacy review asks for next:
    * k-anonymity bounds GROUP SIZE but a group where every member
    * shares one sensitive value still leaks it (the homogeneity
    * attack). Same quasi-identifier grid as [[metaKAnonymity]]
    * (nation × balance-band), sensitive attribute = market segment;
    * per QI group ℓ = distinct sensitive values, reported per nation:
    * min ℓ, weak groups (ℓ < 3 — distinct-ℓ-diversity at ℓ=3), and the
    * records exposed in them. Two answer-bounded aggregations (QI grid
    * ≤ |nations|·|bands|), map-side partial, no join: scan-speed at
    * 100 TB. */
  def metaLDiversity(spark: SparkSession, dir: String): DataFrame = {
    val groups = t(spark, dir, "customer")
      .select(col("c_nationkey").as("nat"),
        expr("cast(round(c_acctbal * 100) as bigint) div 100000").as("balb"),
        col("c_mktsegment").as("sens"))
      .groupBy(col("nat"), col("balb"))
      .agg(count(lit(1)).as("k"), countDistinct(col("sens")).as("l"))
    groups.groupBy(col("nat"))
      .agg(count(lit(1)).cast("long").as("n_groups"),
        min(col("l")).cast("long").as("min_l"),
        sum(when(col("l") < 3, 1L).otherwise(0L)).cast("long").as("n_weak_groups"),
        sum(when(col("l") < 3, col("k")).otherwise(0L)).cast("long").as("n_exposed"),
        sum(col("k")).cast("long").as("n_records"))
      .orderBy(col("nat"))
  }

  val metaLDiversitySql: String =
    """WITH g AS (
      | SELECT c_nationkey AS nat,
      |  cast(round(c_acctbal * 100) as bigint) // 100000 AS balb,
      |  count(*) AS k, count(DISTINCT c_mktsegment) AS l
      | FROM customer GROUP BY 1, 2)
      |SELECT nat, cast(count(*) as bigint) AS n_groups,
      | cast(min(l) as bigint) AS min_l,
      | cast(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) as bigint) AS n_weak_groups,
      | cast(sum(CASE WHEN l < 3 THEN k ELSE 0 END) as bigint) AS n_exposed,
      | cast(sum(k) as bigint) AS n_records
      |FROM g GROUP BY nat ORDER BY nat""".stripMargin

  /** Join-key SKEW audit — the report a 100 TB operator reads before
    * choosing salt factors / AQE skew thresholds: for each candidate
    * join/shuffle key, row count, exact NDV, the hottest key's
    * frequency, its share of the table (basis points), and the
    * max/avg frequency ratio ×100 (the number AQE's skewedJoin
    * heuristic thresholds on). One count-per-key aggregation per key —
    * the shuffle is on the audited key itself, so the audit costs
    * exactly one pass of the join it derisks; the second aggregate is
    * answer-bounded. All-integer output (counts and floor ratios of
    * counts), so the oracle is exact. */
  def metaSkewAudit(spark: SparkSession, dir: String): DataFrame = {
    def keyStats(table: String, key: String): DataFrame =
      t(spark, dir, table)
        .select(col(key).cast("long").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("f"))
        .agg(sum(col("f")).as("n_rows"), count(lit(1)).as("ndv"),
          max(col("f")).as("max_freq"))
        .select(lit(s"$table.$key").as("key_name"),
          col("n_rows").cast("long"), col("ndv").cast("long"),
          col("max_freq").cast("long"),
          expr("max_freq * 10000 div n_rows").cast("long").as("top1_bp"),
          // max/avg ×100 = max_freq·ndv·100/n; counts are nonnegative so
          // Spark div (trunc) and DuckDB // (floor) agree. The product
          // of two counts runs in decimal(38,0) (DuckDB: HUGEINT) —
          // max_freq·ndv approaches n² on a skewed key and would wrap
          // int64 near ~6e9 rows
          expr("cast(max_freq as decimal(38,0)) * ndv * 100 div n_rows")
            .cast("long").as("skew_x100"))
    Seq("lineitem" -> "l_orderkey", "lineitem" -> "l_partkey",
        "orders" -> "o_custkey", "events" -> "user_id")
      .map { case (tb, k) => keyStats(tb, k) }
      .reduce(_ unionByName _)
      .orderBy(col("key_name"))
  }

  val metaSkewAuditSql: String = {
    def one(table: String, key: String): String =
      s"""SELECT '$table.$key' AS key_name,
         | cast(sum(f) as bigint) AS n_rows, cast(count(*) as bigint) AS ndv,
         | cast(max(f) as bigint) AS max_freq,
         | cast(max(f) * 10000 // sum(f) as bigint) AS top1_bp,
         | cast(cast(max(f) as hugeint) * count(*) * 100 // sum(f)
         |   as bigint) AS skew_x100
         |FROM (SELECT $key AS k, count(*) AS f FROM $table GROUP BY 1)""".stripMargin
    Seq("lineitem" -> "l_orderkey", "lineitem" -> "l_partkey",
        "orders" -> "o_custkey", "events" -> "user_id")
      .map { case (tb, k) => one(tb, k) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY key_name")
  }

  /** Hash-partition BALANCE audit — [[metaSkewAudit]]'s sibling one
    * level down: skew tells you the hottest KEY; this simulates the
    * actual 32-way hash partitioning a shuffle would produce and
    * reports how the ROWS land (partitions used, min/max partition
    * size, max/ideal ratio ×100 — >200 means some task does 2× the
    * average work). The hash is the Knuth multiplicative scheme
    * `(k·2654435761) mod 2³² mod 32` — pure integer arithmetic both
    * engines share (Spark's murmur3 `hash()` is engine-private, so an
    * oracle-checkable audit must pick a portable hash; the LAYOUT
    * conclusions transfer). Three audited keys show the spectrum:
    * high-cardinality uniform (l_orderkey), a 7-value key that leaves
    * 25 of 32 partitions EMPTY (l_linenumber — the classic
    * partition-by-low-cardinality mistake), and o_custkey. Cost: one
    * count-per-partition agg per key; the summary is 32 rows. */
  def metaPartitionBalance(spark: SparkSession, dir: String): DataFrame = {
    def audit(table: String, key: String): DataFrame =
      t(spark, dir, table)
        .select(expr(s"((($key % 2147483648L) * 2654435761L) % 4294967296L) % 32").as("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("rows_p"))
        .agg(count(lit(1)).as("parts_used"), sum(col("rows_p")).as("rows_total"),
          min(col("rows_p")).as("min_rows"), max(col("rows_p")).as("max_rows"))
        .select(lit(s"$table.$key").as("key_name"),
          col("parts_used").cast("long"), col("rows_total").cast("long"),
          col("min_rows").cast("long"), col("max_rows").cast("long"),
          // max over the 32-way IDEAL (rows/32); counts nonnegative so
          // trunc div == floor div
          expr("max_rows * 32 * 100 div rows_total").cast("long")
            .as("imbalance_x100"))
    Seq("lineitem" -> "l_orderkey", "lineitem" -> "l_linenumber",
        "orders" -> "o_custkey")
      .map { case (tb, k) => audit(tb, k) }
      .reduce(_ unionByName _)
      .orderBy(col("key_name"))
  }

  val metaPartitionBalanceSql: String = {
    def one(table: String, key: String): String =
      s"""SELECT '$table.$key' AS key_name,
         | cast(count(*) as bigint) AS parts_used,
         | cast(sum(rows_p) as bigint) AS rows_total,
         | cast(min(rows_p) as bigint) AS min_rows,
         | cast(max(rows_p) as bigint) AS max_rows,
         | cast(max(rows_p) * 32 * 100 // sum(rows_p) as bigint) AS imbalance_x100
         |FROM (SELECT ((($key % 2147483648) * 2654435761) % 4294967296) % 32 AS p, count(*) AS rows_p
         |      FROM $table GROUP BY 1)""".stripMargin
    Seq("lineitem" -> "l_orderkey", "lineitem" -> "l_linenumber",
        "orders" -> "o_custkey")
      .map { case (tb, k) => one(tb, k) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY key_name")
  }

  /** Semi-additive rollup with carry-forward — the balance-style
    * measure that sums across ACCOUNTS but takes LAST over TIME: each
    * user's running "balance" is their latest event value, and the
    * daily total must carry every user's last-known balance forward
    * through days they were silent. The standard relational shape:
    * per-user last-update-per-day (one latest-per-key window), each
    * update exploded across its validity range [day, next update) —
    * bounded by the calendar, never user² — then one sum per day.
    * Exact cents; DuckDB replays via lead() + generate_series. At
    * 100 TB the fan-out is |calendar| per user worst case, the
    * documented cost of exact carry-forward (the alternative is the
    * as-of join at query time — q36's operator). */
  def metaSemiAdditive(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"),
        (unix_micros(col("ts")) / 86400000000L).cast("long").as("day"),
        col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val lastPerDay = ev
      .groupBy(col("user_id"), col("day"))
      .agg(max_by(col("cents"), struct(col("ts"), col("event_id"))).as("bal"))
    val maxDay = ev.agg(max(col("day")).as("hi"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
    lastPerDay
      .withColumn("nextDay", lead(col("day"), 1).over(byUser))
      .crossJoin(broadcast(maxDay))
      .withColumn("validTo",
        coalesce(col("nextDay") - 1, col("hi")))
      .withColumn("d", explode(sequence(col("day"), col("validTo"))))
      .groupBy(col("d"))
      .agg(count(lit(1)).cast("long").as("n_users_known"),
        sum(col("bal")).cast("long").as("total_balance_cents"))
      .orderBy(col("d"))
  }

  val metaSemiAdditiveSql: String =
    """WITH ev AS (
      | SELECT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS day,
      |  ts, event_id, cast(round(value * 100) as bigint) AS cents
      | FROM events),
      |last_per_day AS (
      | SELECT user_id, day, cents AS bal FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, day
      |    ORDER BY ts DESC, event_id DESC) AS rn FROM ev)
      | WHERE rn = 1),
      |hi AS (SELECT max(day) AS hi FROM ev),
      |ranged AS (
      | SELECT user_id, day, bal,
      |  coalesce(lead(day, 1) OVER (PARTITION BY user_id ORDER BY day) - 1,
      |   hi) AS validTo
      | FROM last_per_day CROSS JOIN hi),
      |filled AS (
      | SELECT user_id, bal, unnest(generate_series(day, validTo)) AS d
      | FROM ranged)
      |SELECT d, cast(count(*) as bigint) AS n_users_known,
      | cast(sum(bal) as bigint) AS total_balance_cents
      |FROM filled GROUP BY d ORDER BY d""".stripMargin

  /** Equi-depth histogram — the CBO statistics object behind range
    * selectivity estimation (Spark's own ANALYZE ... FOR COLUMNS
    * builds one; here it is a first-class queryable table): 8 buckets
    * over order-total cents with boundaries at EXACT order statistics
    * (`ntile` under the (cents, key) total order), per bucket the
    * span, row count, and exact distinct count. Depth balance is the
    * defining property (bucket sizes differ by ≤ 1 — spec-pinned),
    * which is what makes range estimates robust to skew where
    * equi-WIDTH histograms collapse. One sort-equivalent window + one
    * aggregate; at 100 TB the boundaries come from a quantile sketch
    * and the same table shape serves the optimizer. */
  def metaHistogramEquidepth(spark: SparkSession, dir: String): DataFrame = {
    DistRank.withNtile(
        t(spark, dir, "orders")
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 100).cast("long").as("cents")),
        Seq(col("cents"), col("o_orderkey")), 8, "bucket")
      .groupBy(col("bucket"))
      .agg(min(col("cents")).cast("long").as("lo"),
        max(col("cents")).cast("long").as("hi"),
        count(lit(1)).cast("long").as("n_rows"),
        countDistinct(col("cents")).cast("long").as("n_distinct"))
      .orderBy(col("bucket"))
  }

  val metaHistogramEquidepthSql: String =
    """WITH c AS (
      | SELECT o_orderkey, cast(round(o_totalprice * 100) as bigint) AS cents
      | FROM orders),
      |b AS (
      | SELECT cents, ntile(8) OVER (ORDER BY cents, o_orderkey) AS bucket
      | FROM c)
      |SELECT cast(bucket as bigint) AS bucket,
      | cast(min(cents) as bigint) AS lo, cast(max(cents) as bigint) AS hi,
      | cast(count(*) as bigint) AS n_rows,
      | cast(count(DISTINCT cents) as bigint) AS n_distinct
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Gini concentration index — the scalar companion to
    * [[Analytics.q91ParetoAbc]]'s cuts: how concentrated is revenue
    * across parts, as the exact mean-difference form
    * G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over ascending-sorted part
    * revenues (rank i from one window, every moment an exact integer
    * sum, one magnitude-safe division onto the micro grid — the
    * numerator is provably ≥ 0 for ascending ranks, but the guard
    * matches q100's discipline anyway). Reported per market segment
    * via the customer→orders→parts path so segments are comparable;
    * 0 = perfectly even, → 10⁶ = one part takes everything. Part-
    * grain windows, answer-sized output. */
  def metaGini(spark: SparkSession, dir: String): DataFrame = {
    val rev = t(spark, dir, "orders")
      .join(t(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(t(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("l_partkey").as("p"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("x"))
    val bySeg = Window.partitionBy(col("seg")).orderBy(col("x"), col("p"))
    rev.withColumn("i", row_number().over(bySeg).cast("long"))
      .groupBy(col("seg"))
      // Σ i·x accumulates in decimal(38,0) — i approaches the per-seg
      // part count, so int64 wraps near 10²³-scale moments at 100 TB
      // while DuckDB's sum() auto-widens to HUGEINT: the engines would
      // silently diverge exactly there (the metaGiniSegments pattern)
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(expr("cast(i as decimal(38,0)) * x")).as("six"))
      .select(col("seg"), col("n").cast("long").as("n_parts"),
        col("sx").cast("long").as("revenue_cents"),
        // every cross-moment in decimal(38,0); `div` on decimals is
        // the same integral truncation (≡ floor here, the numerator
        // is ≥ 0 for ascending ranks) as DuckDB's hugeint //
        expr("(2 * six - cast(n + 1 as decimal(38,0)) * sx) * 1000000 " +
          "div (cast(n as decimal(38,0)) * sx)")
          .cast("long").as("gini_micro"))
      .orderBy(col("seg"))
  }

  val metaGiniSql: String =
    """WITH rev AS (
      | SELECT c.c_mktsegment AS seg, l.l_partkey AS p,
      |  sum(cast(round(l.l_extendedprice * 100) as bigint)) AS x
      | FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      | GROUP BY 1, 2),
      |ranked AS (
      | SELECT *, cast(row_number() OVER (PARTITION BY seg ORDER BY x, p)
      |   as bigint) AS i
      | FROM rev)
      |SELECT seg, cast(count(*) as bigint) AS n_parts,
      | cast(sum(x) as bigint) AS revenue_cents,
      | cast(((2 * sum(cast(i as hugeint) * x)
      |     - cast(count(*) + 1 as hugeint) * sum(x)) * 1000000)
      |   // (cast(count(*) as hugeint) * sum(x)) as bigint) AS gini_micro
      |FROM ranked GROUP BY seg ORDER BY seg""".stripMargin

  /** Committed FD candidates: (table, lhs, rhs) — the determinations
    * a schema designer would assert; some hold, some don't, which is
    * what makes the check a CHECK. */
  private val fdCandidates = Seq(
    ("nation", "n_nationkey", "n_regionkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("part", "p_brand", "p_type"))

  /** FUNCTIONAL-DEPENDENCY CHECK (data profiling à la Papenbrock et
    * al., VLDB'15's FD-discovery problem, restricted to a committed
    * candidate panel): lhs → rhs holds iff no lhs value maps to two
    * rhs values. Per candidate: distinct lhs count, distinct
    * (lhs, rhs) pairs, lhs values with >1 rhs (the violators), and
    * the verdict. One groupBy per candidate — aggregation-sized,
    * never pairwise; the five candidate plans union into one
    * answer-sized result. The panel MIXES holding and failing FDs so
    * a broken check cannot pass vacuously. */
  def fdCheck(spark: SparkSession, dir: String): DataFrame =
    fdCandidates.map { case (tbl, lhs, rhs) =>
      t(spark, dir, tbl)
        .groupBy(col(lhs).as("lv"))
        .agg(countDistinct(col(rhs)).as("nr"))
        .agg(count(lit(1)).as("n_lhs"), sum(col("nr")).as("n_pairs"),
          sum(when(col("nr") > 1, 1L).otherwise(0L)).as("violating_lhs"))
        .select(lit(tbl).as("tbl"), lit(s"$lhs->$rhs").as("fd"),
          col("n_lhs"), col("n_pairs"), col("violating_lhs"),
          (col("violating_lhs") === 0L).cast("long").as("holds"))
    }.reduce(_ unionAll _).orderBy(col("tbl"), col("fd"))

  lazy val fdCheckSql: String =
    fdCandidates.map { case (tbl, lhs, rhs) =>
      s"""SELECT '$tbl' AS tbl, '$lhs->$rhs' AS fd,
         | cast(count(*) as bigint) AS n_lhs,
         | cast(sum(nr) as bigint) AS n_pairs,
         | cast(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) as bigint)
         |   AS violating_lhs,
         | cast(CASE WHEN sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) = 0
         |   THEN 1 ELSE 0 END as bigint) AS holds
         |FROM (SELECT $lhs, count(DISTINCT $rhs) AS nr
         |      FROM $tbl GROUP BY $lhs)""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY tbl, fd"

  /** Committed FK candidates: (child table, child col, parent table,
    * parent col) — the joins every query in this registry relies on
    * (all hold on this fixture, events.user_id included), plus one
    * deliberately MISWIRED declaration (events.event_id against the
    * customer key — a surrogate id declared as an FK, the classic
    * schema-registration mistake) so the orphan path is exercised
    * and a broken audit cannot pass vacuously. */
  private val fkCandidates = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("events", "event_id", "customer", "c_custkey"))

  /** REFERENTIAL-INTEGRITY AUDIT — the FK half of profiling beside
    * [[fdCheck]]'s FD half: per declared (child → parent) edge, how
    * many child rows and distinct keys point nowhere. Plain parquet
    * enforces nothing, so the audit IS the constraint — the query a
    * warehouse runs after every load. Orphan keys via LEFT ANTI on
    * the DISTINCT child keys (key-linear, never row×parent), orphan
    * rows by joining the orphan keys back (broadcast — orphan sets
    * are failure-sized). */
  def fkOrphans(spark: SparkSession, dir: String): DataFrame =
    fkCandidates.map { case (ct, cc, pt, pc) =>
      // parent keys are PKs, but the explicit distinct makes the LEFT
      // join below provably row-preserving on the key side
      val parent = t(spark, dir, pt).select(col(pc).cast("long").as("pk")).distinct()
      // ONE child scan: per-key row counts carry everything the ledger
      // needs, so neither totals nor orphan rows re-read the table
      val keys = t(spark, dir, ct).select(col(cc).cast("long").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      // totals + orphan tallies in ONE aggregation over a LEFT join
      // (null pk = orphan): the old shape checkpointed `keys` and ran
      // totals and a LEFT ANTI as separate single-row jobs per edge —
      // 47 serial jobs across the 6 edges at sf0.1 (measured r18);
      // this is one plan, one job, with nothing consumed twice
      keys.join(parent, col("k") === col("pk"), "left")
        .agg(sum(col("cnt")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          coalesce(sum(when(col("pk").isNull, 1L).otherwise(0L)), lit(0L))
            .as("orphan_keys"),
          coalesce(sum(when(col("pk").isNull, col("cnt")).otherwise(0L)), lit(0L))
            .as("orphan_rows"))
        .select(lit(ct).as("child_tbl"), lit(s"$cc->$pt.$pc").as("fk"),
          col("n_rows"), col("n_keys"), col("orphan_keys"), col("orphan_rows"),
          expr("orphan_rows * 10000 div n_rows").as("orphan_bp"))
    }.reduce(_ unionAll _).orderBy(col("child_tbl"), col("fk"))

  lazy val fkOrphansSql: String =
    fkCandidates.map { case (ct, cc, pt, pc) =>
      s"""SELECT '$ct' AS child_tbl, '$cc->$pt.$pc' AS fk,
         | (SELECT cast(count(*) as bigint) FROM $ct) AS n_rows,
         | (SELECT cast(count(DISTINCT $cc) as bigint) FROM $ct) AS n_keys,
         | (SELECT cast(count(*) as bigint) FROM
         |   (SELECT DISTINCT cast($cc as bigint) AS k FROM $ct) ck
         |   WHERE NOT EXISTS (SELECT 1 FROM $pt p
         |     WHERE cast(p.$pc as bigint) = ck.k)) AS orphan_keys,
         | (SELECT cast(count(*) as bigint) FROM $ct
         |   WHERE NOT EXISTS (SELECT 1 FROM $pt p
         |     WHERE cast(p.$pc as bigint) = cast($cc as bigint)))
         |   AS orphan_rows,
         | (SELECT cast(count(*) as bigint) FROM $ct
         |   WHERE NOT EXISTS (SELECT 1 FROM $pt p
         |     WHERE cast(p.$pc as bigint) = cast($cc as bigint)))
         |   * 10000 // (SELECT count(*) FROM $ct) AS orphan_bp""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY child_tbl, fk"

  /** CAPTURE–RECAPTURE population estimation (Lincoln–Petersen with
    * the Chapman '51 small-sample correction) — the ecology estimator
    * warehouses reuse to size a population only reachable through
    * samples (how many distinct users/documents/keys exist when a
    * full scan is off-budget): two independent deterministic marks
    * (Knuth multiplicative hashes of the id under different salts,
    * pure arithmetic — replayable in DuckDB, no engine hash), and
    * N̂ = (n₁+1)(n₂+1) div (m+1) − 1 from the mark sizes and their
    * overlap. Reported beside the exact count with the signed error
    * in bp — the estimator-eval discipline of `sample_ht_estimate`.
    * Everything is one aggregation over the id column; the marks are
    * scan-level predicates at any scale. */
  def captureRecapture(spark: SparkSession, dir: String): DataFrame = {
    val marks = t(spark, dir, "documents")
      .select(col("doc_id"),
        (pmod(pmod(col("doc_id"), lit(2147483648L)) * 2654435761L,
          lit(4294967296L)) % 7L < 2L).cast("long").as("c1"),
        // SECOND MULTIPLIER, not a salted id: the same multiplier on a
        // shifted id gives NEGATIVELY correlated marks (measured m=165
        // vs the 406 independence expects, inflating N-hat 2.4x); two
        // independent Knuth-family primes restore m to its expectation
        (pmod(pmod(col("doc_id"), lit(2147483648L)) * 2246822519L,
          lit(4294967296L)) % 7L < 2L).cast("long").as("c2"))
    marks.agg(count(lit(1)).as("n_true"),
        sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        sum(col("c1") * col("c2")).as("m"))
      .select(col("n1"), col("n2"), col("m"),
        expr("(n1 + 1) * (n2 + 1) div (m + 1) - 1").as("n_hat"),
        col("n_true"),
        expr("((n1 + 1) * (n2 + 1) div (m + 1) - 1 - n_true) * 10000 " +
          "div n_true").as("err_bp"))
  }

  val captureRecaptureSql: String =
    """WITH marks AS (
      | SELECT doc_id,
      |  CASE WHEN ((doc_id % 2147483648) * 2654435761) % 4294967296 % 7 < 2
      |   THEN 1 ELSE 0 END AS c1,
      |  CASE WHEN ((doc_id % 2147483648) * 2246822519)
      |   % 4294967296 % 7 < 2 THEN 1 ELSE 0 END AS c2
      | FROM documents),
      |agg AS (
      | SELECT cast(count(*) as bigint) AS n_true,
      |  cast(sum(c1) as bigint) AS n1, cast(sum(c2) as bigint) AS n2,
      |  cast(sum(c1 * c2) as bigint) AS m
      | FROM marks)
      |SELECT n1, n2, m,
      | cast((n1 + 1) * (n2 + 1) // (m + 1) - 1 as bigint) AS n_hat,
      | n_true,
      | cast(((n1 + 1) * (n2 + 1) // (m + 1) - 1 - n_true) * 10000
      |   // n_true as bigint) AS err_bp
      |FROM agg""".stripMargin

  /** One (rowdim × coldim) contingency summary: χ² in micro-units
    * (decimal(38,0) cross-moments, the committed per-cell truncation),
    * Cramér's V from two IEEE steps on bit-identical integers, and
    * mutual information as 6-dp ln terms summed in decimal(18,6) —
    * the [[graft.operators.Analytics.metaPsi]] float discipline. */
  private def assocPair(df: DataFrame, a: Column, b: Column,
      pair: String): DataFrame = {
    val cells = df.select(a.as("a"), b.as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
      .localCheckpoint(true) // consumed by both margins + the cell pass
    val rt = cells.groupBy(col("a")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("b")).agg(sum(col("o")).as("ct"))
    val n = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("r_levels"),
      countDistinct(col("b")).as("c_levels"))
    // ZERO-FILL the full r×c grid: structural-zero cells (level pairs
    // never observed together) still contribute rt·ct/N to χ² —
    // cells-only accumulation understates χ² and V on sparse tables.
    // The rt × ct cross join IS the grid with margins pre-attached
    // (r·c rows, both sides cells-sized); observed counts left-join in.
    val grid = broadcast(rt).crossJoin(broadcast(ct))
      .join(cells, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    grid.crossJoin(broadcast(n))
      // num itself must be decimal(38,0) (DuckDB: HUGEINT): o·N and
      // rt·ct approach N² ≈ 10¹⁹ near N ≈ 3e9, where int64 wraps
      // silently on Spark but RAISES on DuckDB — widening only the
      // downstream square left a cross-engine divergence in the
      // subtraction itself
      .withColumn("num",
        expr("cast(o as decimal(38,0)) * n - cast(rt as decimal(38,0)) * ct"))
      .withColumn("chi2_cell_micro", expr(
        "cast(num as decimal(38,0)) * num * 1000000 " +
          "div (cast(rt as decimal(38,0)) * ct * n)"))
      // x·ln(x) → 0 as x → 0: zero cells contribute nothing to MI.
      // ln-argument products in decimal(38,0) (DuckDB: HUGEINT) —
      // o·n and rt·ct wrap int64 once N passes ~3e9 rows
      .withColumn("mi_term", when(col("o") > 0,
        round((col("o") / col("n")) *
          log(expr("cast(cast(o as decimal(38,0)) * n as double)") /
            expr("cast(cast(rt as decimal(38,0)) * ct as double)")), 6))
        .otherwise(lit(0.0)))
      .agg(max(col("n")).as("n"),
        max(col("r_levels")).as("r_levels"),
        max(col("c_levels")).as("c_levels"),
        sum(col("chi2_cell_micro")).as("chi2_micro"),
        sum(col("mi_term").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("mi_nats"))
      .select(lit(pair).as("pair"), col("n"), col("r_levels"),
        col("c_levels"),
        ((col("r_levels") - 1) * (col("c_levels") - 1)).as("df"),
        col("chi2_micro"),
        when(least(col("r_levels"), col("c_levels")) > 1,
          round(sqrt(col("chi2_micro") /
            (col("n") * least(col("r_levels"), col("c_levels")) - col("n"))
            / 1000000.0), 6)).as("cramers_v"),
        col("mi_nats"))
  }

  /** CATEGORICAL ASSOCIATION PANEL — Cramér's V (Cramér '46) and
    * mutual information over a committed set of categorical pairs,
    * the data-profiling companion to the numeric [[metaGini]]/
    * correlation entries: which column pairs carry structure? Panel:
    * events (event_type × calendar month — seasonal mix), documents
    * (lang × source — corpus composition), orders (status ×
    * priority). χ² accumulates the exact integer cross-moment
    * (o·N − rt·ct)²·10⁶ div (rt·ct·N) per cell in decimal(38,0)
    * (int64 would wrap at o·N ≈ 10¹²·², and DuckDB mirrors in
    * HUGEINT); V = √(χ²/(N·(min(r,c)−1))); MI in nats from the same
    * margins. A V near 0 with χ² above its critical value is the
    * classic "significant but tiny" large-N read — both are reported
    * so the panel teaches that lesson.
    *
    * Scale shape: per pair ONE data-sized groupBy to the contingency
    * cells; margins and everything after are cells-sized (≤ r·c
    * rows). Three pairs union to a 3-row frame. */
  def metaCramersV(spark: SparkSession, dir: String): DataFrame = {
    // events span one calendar month at every published SF, so the
    // calendar dimension is DAY-OF-WEEK, computed portably as days
    // since the 1970-01-01 epoch (a Thursday) mod 7 — Spark's
    // dayofweek() and DuckDB's dayofweek() disagree on the 0-base
    val ev = assocPair(t(spark, dir, "events"), col("event_type"),
      expr("pmod(datediff(to_date(ts), date'1970-01-01'), 7)").cast("long"),
      "events:type_x_dow")
    val doc = assocPair(t(spark, dir, "documents"),
      col("lang"), col("source"), "documents:lang_x_source")
    val ord = assocPair(t(spark, dir, "orders"),
      col("o_orderstatus"), col("o_orderpriority"), "orders:status_x_priority")
    ev.unionAll(doc).unionAll(ord).orderBy(col("pair"))
  }

  private def assocPairSql(from: String, a: String, b: String,
      pair: String): String =
    s"""SELECT '$pair' AS pair, n, r_levels, c_levels,
       | (r_levels - 1) * (c_levels - 1) AS df, chi2_micro,
       | CASE WHEN least(r_levels, c_levels) > 1 THEN
       |  round(sqrt(chi2_micro / cast(n * least(r_levels, c_levels) - n
       |    as double) / 1000000.0), 6) END AS cramers_v, mi_nats
       |FROM (
       | SELECT max(n) AS n, max(r_levels) AS r_levels,
       |  max(c_levels) AS c_levels,
       |  cast(sum(cast(num as hugeint) * num * 1000000
       |    // (cast(rt as hugeint) * ct * n)) as bigint) AS chi2_micro,
       |  cast(sum(cast(CASE WHEN o > 0 THEN round((o / cast(n as double)) *
       |    ln(cast(cast(o as hugeint) * n as double)
       |       / cast(cast(rt as hugeint) * ct as double)), 6) ELSE 0 END
       |    as decimal(18,6))) as double) AS mi_nats
       | FROM (
       |  WITH cells AS (
       |   SELECT $a AS a, $b AS b, cast(count(*) as bigint) AS o
       |   FROM $from GROUP BY 1, 2),
       |  rmarg AS (SELECT a, cast(sum(o) as bigint) AS rt
       |            FROM cells GROUP BY 1),
       |  cmarg AS (SELECT b, cast(sum(o) as bigint) AS ct
       |            FROM cells GROUP BY 1)
       |  -- zero-filled r x c grid: structural zeros contribute rt*ct/N
       |  SELECT g.o, g.rt, g.ct, t.n, t.r_levels, t.c_levels,
       |   cast(g.o as hugeint) * t.n - cast(g.rt as hugeint) * g.ct AS num
       |  FROM (
       |   SELECT rmarg.a, cmarg.b, rmarg.rt, cmarg.ct,
       |    coalesce(c.o, 0) AS o
       |   FROM rmarg CROSS JOIN cmarg
       |   LEFT JOIN cells c ON c.a = rmarg.a AND c.b = cmarg.b) g,
       |   (SELECT cast(count(*) as bigint) AS n,
       |     cast(count(distinct $a) as bigint) AS r_levels,
       |     cast(count(distinct $b) as bigint) AS c_levels
       |    FROM $from) t))""".stripMargin

  val metaCramersVSql: String =
    Seq(
      assocPairSql("events", "event_type",
        "cast(date_diff('day', DATE '1970-01-01', cast(ts as date)) % 7 as bigint)",
        "events:type_x_dow"),
      assocPairSql("documents", "lang", "source", "documents:lang_x_source"),
      assocPairSql("orders", "o_orderstatus", "o_orderpriority",
        "orders:status_x_priority"))
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY pair")

  /** QUANTILE-QUANTILE DRIFT — the LOCATION companion to
    * [[graft.operators.Analytics.metaPsi]]'s bin-share drift: PSI
    * says "mass moved between bins", the Q-Q table says WHERE the
    * distribution shifted, decile by decile (the plot drift reviews
    * actually look at). Both halves of the event timeline (same
    * integer midpoint split as PSI) are ranked independently
    * (two-pass DistRank row numbers, no global window) and the value
    * at rank (k·n) div 10 — a committed lower-quantile, an ACTUAL
    * data value, so everything stays exact integer cents — is
    * compared at k = 1..9 with absolute and basis-point deltas.
    *
    * Scale shape: two rank passes over the halves, a 9-row grid
    * join; output is 9 rows at any data size. */
  def metaQqDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("v"))
    val bounds = ev.agg(expr("(min(us) + max(us)) div 2").as("mid"))
    val tagged = ev.crossJoin(broadcast(bounds))
      .withColumn("is_ref", (col("us") <= col("mid")).cast("long"))
      .select(col("event_id"), col("v"), col("is_ref"))
      .localCheckpoint(true) // both half-rank passes
    def decilesOf(half: DataFrame, name: String): DataFrame = {
      val n = half.agg(count(lit(1)).as("n"))
      val ranked = graft.operators.DistRank.withRowNumber(
        half, Seq(col("v"), col("event_id")), "rk")
      spark.range(1, 10).select(col("id").as("k"))
        .crossJoin(broadcast(n))
        .withColumn("target", greatest(lit(1L), expr("k * n div 10")))
        .join(ranked, col("rk") === col("target"))
        .select(col("k"), col("v").as(name))
    }
    val ref = decilesOf(tagged.filter(col("is_ref") === 1L), "ref_value")
    val cur = decilesOf(tagged.filter(col("is_ref") === 0L), "cur_value")
    ref.join(cur, Seq("k"))
      .select(col("k").as("decile"), col("ref_value"), col("cur_value"),
        (col("cur_value") - col("ref_value")).as("diff_cents"),
        when(col("ref_value") > 0, expr(
          "((cur_value - ref_value) * 10000 + 1000000000 * ref_value) " +
            "div ref_value - 1000000000")).as("rel_diff_bp"))
      .orderBy(col("decile"))
  }

  val metaQqDriftSql: String =
    """WITH ev AS (
      | SELECT event_id, epoch_us(ts) AS us,
      |  cast(round(value * 100) as bigint) AS v
      | FROM events WHERE event_type = 'purchase'),
      |bounds AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
      |tagged AS (
      | SELECT event_id, v,
      |  CASE WHEN us <= b.mid THEN 1 ELSE 0 END AS is_ref
      | FROM ev, bounds b),
      |refr AS (
      | SELECT v, row_number() OVER (ORDER BY v, event_id) AS rk,
      |  count(*) OVER () AS n
      | FROM tagged WHERE is_ref = 1),
      |curr AS (
      | SELECT v, row_number() OVER (ORDER BY v, event_id) AS rk,
      |  count(*) OVER () AS n
      | FROM tagged WHERE is_ref = 0),
      |ks AS (SELECT unnest(range(1, 10)) AS k),
      |dr AS (
      | SELECT k.k, r.v AS ref_value
      | FROM ks k JOIN refr r ON r.rk = greatest(1, k.k * r.n // 10)),
      |dc AS (
      | SELECT k.k, c.v AS cur_value
      | FROM ks k JOIN curr c ON c.rk = greatest(1, k.k * c.n // 10))
      |SELECT cast(dr.k as bigint) AS decile, dr.ref_value, dc.cur_value,
      | dc.cur_value - dr.ref_value AS diff_cents,
      | CASE WHEN dr.ref_value > 0 THEN
      |  cast(((dc.cur_value - dr.ref_value) * 10000
      |    + 1000000000 * dr.ref_value) // dr.ref_value
      |    - 1000000000 as bigint) END AS rel_diff_bp
      |FROM dr JOIN dc USING (k)
      |ORDER BY decile""".stripMargin

  /** TERMINAL-DIGIT PREFERENCE AUDIT — the forensic companion to the
    * `meta_benford` LEADING-digit test: cent endings (price mod 100)
    * should be ~uniform for
    * organically-computed amounts; spikes at .99/.00/.50 reveal
    * psychological pricing, rounding policy, or hand-keyed data
    * (Nigrini's last-two-digits test, the standard audit-analytics
    * step after Benford). Full χ² against uniform over the 100
    * endings as ONE committed integer division —
    * Σ(100·o − n)²·10⁶ div (100·n) in decimal(38,0)/HUGEINT — plus
    * the top-10 endings under the (count desc, ending) total order
    * with bp shares. df = 99, committed χ²₀.₀₅ critical 123.225.
    *
    * Scale shape: one groupBy(ending) — at most 100 groups with
    * map-side partials; everything after is 100-row arithmetic. */
  def metaPricePoints(spark: SparkSession, dir: String): DataFrame = {
    val ends = t(spark, dir, "part")
      .select(pmod(round(col("p_retailprice") * 100).cast("long"),
        lit(100L)).as("ending"))
      .groupBy(col("ending")).agg(count(lit(1)).as("o"))
    val grid = spark.range(0, 100).select(col("id").as("ending"))
      .join(ends, Seq("ending"), "left")
      .select(col("ending"), coalesce(col("o"), lit(0L)).as("o"))
      .localCheckpoint(true) // consumed by chi2 + top-10
    val tot = grid.agg(sum(col("o")).as("n"),
      sum(expr("cast(100 * o as decimal(38,0)) * (100 * o)")).as("ss"))
    val chi2 = tot.select(col("n"),
      expr("(ss - 200 * cast(n as decimal(38,0)) * n " +
        "+ 100 * cast(n as decimal(38,0)) * n) * 1000000 div (100 * n)")
        .as("chi2_micro"))
    val top = grid.orderBy(col("o").desc, col("ending")).limit(10)
    top.crossJoin(broadcast(chi2))
      .select(col("ending"), col("o").as("cnt"),
        expr("o * 10000 div n").as("share_bp"), col("n").as("n_total"),
        col("chi2_micro"),
        (col("chi2_micro") > 123225000L).cast("long").as("significant"))
      .orderBy(col("cnt").desc, col("ending"))
  }

  val metaPricePointsSql: String =
    """WITH ends AS (
      | SELECT cast(round(p_retailprice * 100) as bigint) % 100 AS ending
      | FROM part),
      |grid AS (
      | SELECT g.ending, cast(coalesce(c.o, 0) as bigint) AS o
      | FROM (SELECT unnest(range(0, 100)) AS ending) g
      | LEFT JOIN (SELECT ending, count(*) AS o FROM ends GROUP BY 1) c
      |  ON c.ending = g.ending),
      |tot AS (
      | SELECT cast(sum(o) as bigint) AS n,
      |  sum(cast(100 * o as hugeint) * (100 * o)) AS ss
      | FROM grid),
      |chi2 AS (
      | SELECT n, cast((ss - 200 * cast(n as hugeint) * n
      |   + 100 * cast(n as hugeint) * n) * 1000000 // (100 * n)
      |  as bigint) AS chi2_micro
      | FROM tot),
      |top AS (
      | SELECT ending, o FROM grid ORDER BY o DESC, ending LIMIT 10)
      |SELECT t.ending, t.o AS cnt,
      | cast(t.o * 10000 // c.n as bigint) AS share_bp,
      | c.n AS n_total, c.chi2_micro,
      | cast(CASE WHEN c.chi2_micro > 123225000 THEN 1 ELSE 0 END as bigint)
      |   AS significant
      |FROM top t, chi2 c
      |ORDER BY cnt DESC, t.ending""".stripMargin

  /** POWER ANALYSIS for the two-proportion test — the question every
    * experiment review asks BEFORE reading
    * [[graft.operators.Analytics.q149ConversionAb]]'s verdict: at
    * the observed conversion rate, what sample gives what minimum
    * detectable effect? Standard normal-approximation sizing
    * n/arm = 2·p(1−p)·(z_{α/2}+z_β)²/Δ² at committed α = 0.05,
    * power = 0.80 ((z₁+z₂)² committed as the integer micro constant
    * 7848879). For each committed target MDE {1%, 0.5%, 0.1%}:
    * required n by EXACT integer ceiling division — all-int64-safe at
    * ANY scale because the numerator is capped by p(1−p) ≤ 1/4 in
    * micro² (2·pq·C ≤ 3.93·10¹⁸ always); plus the MDE the CURRENT per-arm n
    * already affords (one IEEE sqrt on bit-identical integer
    * operands, rounded to micro). Feasibility flag per row.
    *
    * Scale shape: one data-sized aggregate to (purchases, total);
    * then 3-row arithmetic. */
  def metaPowerAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "events")
      .agg(count(lit(1)).as("n_events"),
        sum((col("event_type") === "purchase").cast("long")).as("conv"))
      .withColumn("p_micro", expr("conv * 1000000 div n_events"))
      .withColumn("n_per_arm", expr("n_events div 2"))
      .withColumn("pq", expr("p_micro * (1000000 - p_micro)"))
    val targets = spark.range(0, 3)
      .select(element_at(array(lit(10000L), lit(5000L), lit(1000L)),
        (col("id") + 1).cast("int")).as("mde_target_micro"))
    base.crossJoin(broadcast(targets))
      .withColumn("n_required", expr(
        "(2 * pq * 7848879 + 1000000 * mde_target_micro " +
          "* mde_target_micro - 1) " +
          "div (1000000 * mde_target_micro * mde_target_micro)"))
      .withColumn("current_mde_micro", expr(
        "cast(round(sqrt(cast(2 * pq * 7848879 as double) " +
          "/ cast(1000000 * n_per_arm as double))) as bigint)"))
      .select(col("p_micro"), col("n_per_arm"), col("current_mde_micro"),
        col("mde_target_micro"), col("n_required"),
        (col("n_required") <= col("n_per_arm")).cast("long").as("feasible"))
      .orderBy(col("mde_target_micro").desc)
  }

  val metaPowerAnalysisSql: String =
    """WITH base AS (
      | SELECT cast(count(*) as bigint) AS n_events,
      |  cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    as bigint) AS conv
      | FROM events),
      |k AS (
      | SELECT n_events, conv,
      |  cast(conv * 1000000 // n_events as bigint) AS p_micro,
      |  cast(n_events // 2 as bigint) AS n_per_arm
      | FROM base),
      |kk AS (
      | SELECT *, p_micro * (1000000 - p_micro) AS pq FROM k),
      |t AS (SELECT cast(unnest([10000, 5000, 1000]) as bigint)
      |        AS mde_target_micro)
      |SELECT kk.p_micro, kk.n_per_arm,
      | cast(round(sqrt(cast(2 * kk.pq * 7848879 as double)
      |   / cast(1000000 * kk.n_per_arm as double))) as bigint)
      |   AS current_mde_micro,
      | cast(t.mde_target_micro as bigint) AS mde_target_micro,
      | cast((2 * kk.pq * 7848879
      |   + 1000000 * t.mde_target_micro * t.mde_target_micro - 1)
      |  // (1000000 * t.mde_target_micro * t.mde_target_micro)
      |  as bigint) AS n_required,
      | cast(CASE WHEN (2 * kk.pq * 7848879
      |   + 1000000 * t.mde_target_micro * t.mde_target_micro - 1)
      |  // (1000000 * t.mde_target_micro * t.mde_target_micro)
      |  <= kk.n_per_arm THEN 1 ELSE 0 END as bigint) AS feasible
      |FROM kk, t
      |ORDER BY mde_target_micro DESC""".stripMargin

  /** GINI COEFFICIENT PER SEGMENT — the inequality DRILLDOWN beside
    * the corpus-level [[metaGini]]: concentration of order value
    * inside each order-priority class, via the rank formula
    * G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over ascending within-segment
    * ranks. The numerator is non-negative BY THE REARRANGEMENT
    * INEQUALITY (ascending order maximizes Σi·xᵢ), so one committed
    * truncating division in decimal(38,0)/HUGEINT gives exact bp
    * (Σi·xᵢ ≈ rank·value passes int64 at ~10⁵ orders × 10⁷ cents).
    * Ranks are per-segment windows (partitioned — never global).
    *
    * Scale shape: one data-sized rank per segment partition, one
    * aggregate; 5-row output. */
  def metaGiniSegments(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("seg"))
      .orderBy(col("v"), col("o_orderkey"))
    val ranked = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority").as("seg"),
        round(col("o_totalprice") * 100).cast("long").as("v"))
      .withColumn("i", row_number().over(w).cast("long"))
    ranked.groupBy(col("seg"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).as("total_cents"),
        sum(expr("cast(i as decimal(38,0)) * v")).as("iv"))
      .withColumn("gini_bp", expr(
        "(2 * iv - cast(n + 1 as decimal(38,0)) * total_cents) * 10000 " +
          "div (cast(n as decimal(38,0)) * total_cents)"))
      .select(col("seg"), col("n"), col("total_cents"),
        col("gini_bp").cast("long").as("gini_bp"))
      .orderBy(col("seg"))
  }

  val metaGiniSegmentsSql: String =
    """WITH ranked AS (
      | SELECT o_orderpriority AS seg,
      |  cast(round(o_totalprice * 100) as bigint) AS v,
      |  cast(row_number() OVER (PARTITION BY o_orderpriority
      |    ORDER BY round(o_totalprice * 100), o_orderkey) as bigint) AS i
      | FROM orders)
      |SELECT seg, cast(count(*) as bigint) AS n,
      | cast(sum(v) as bigint) AS total_cents,
      | cast((2 * sum(cast(i as hugeint) * v)
      |   - cast(count(*) + 1 as hugeint) * sum(v)) * 10000
      |  // (cast(count(*) as hugeint) * sum(v)) as bigint) AS gini_bp
      |FROM ranked GROUP BY seg ORDER BY seg""".stripMargin

  val all: Seq[GQuery] = Seq(
    GQuery("meta_gini_segments", metaGiniSegments, Some(metaGiniSegmentsSql)),
    GQuery("meta_power_analysis", metaPowerAnalysis, Some(metaPowerAnalysisSql)),
    GQuery("meta_price_points", metaPricePoints, Some(metaPricePointsSql)),
    GQuery("meta_qq_drift", metaQqDrift, Some(metaQqDriftSql)),
    GQuery("meta_cramers_v", metaCramersV, Some(metaCramersVSql)),
    GQuery("meta_capture_recapture", captureRecapture,
      Some(captureRecaptureSql)),
    GQuery("meta_fd_check", fdCheck, Some(fdCheckSql)),
    GQuery("meta_fk_orphans", fkOrphans, Some(fkOrphansSql)),
    GQuery("meta_gini", metaGini, Some(metaGiniSql)),
    GQuery("meta_histogram_equidepth", metaHistogramEquidepth,
      Some(metaHistogramEquidepthSql)),
    GQuery("meta_k_anonymity", metaKAnonymity, Some(metaKAnonymitySql)),
    GQuery("meta_l_diversity", metaLDiversity, Some(metaLDiversitySql)),
    GQuery("meta_skew_audit", metaSkewAudit, Some(metaSkewAuditSql)),
    GQuery("meta_partition_balance", metaPartitionBalance,
      Some(metaPartitionBalanceSql)),
    GQuery("meta_semi_additive", metaSemiAdditive, Some(metaSemiAdditiveSql)),
    GQuery("meta_benford", metaBenford, Some(metaBenfordSql)),
    GQuery("meta_reconcile", metaReconcile, Some(metaReconcileSql)),
    GQuery("meta_drift_ks", metaDriftKs, Some(metaDriftKsSql)),
    GQuery("meta_auc_ranksum", metaAucRanksum, Some(metaAucRanksumSql)),
    GQuery("q58_merge_upsert", q58MergeUpsert, Some(q58Sql)),
    GQuery("q59_scd2_dimension", q59Scd2Dimension, Some(q59Sql)),
    GQuery("q60_snapshot_diff", q60SnapshotDiff, Some(q60Sql)),
    GQuery("q70_delete_vectors", q70DeleteVectors, Some(q70Sql)),
    GQuery("q76_time_travel_dv", q76TimeTravelDv, Some(q76Sql)),
    GQuery("q77_dv_compaction", q77DvCompaction, Some(q77Sql)),
    GQuery("q71_incremental_view", q71IncrementalView, Some(q71Sql)),
    GQuery("meta_winsorize", metaWinsorize, Some(metaWinsorizeSql)),
    GQuery("meta_drift_chi2", metaDriftChi2, Some(metaDriftChi2Sql)),
    GQuery("meta_anomaly_mad", metaAnomalyMad, Some(metaAnomalyMadSql)),
    GQuery("q87_mv_rewrite", q87MvRewrite, Some(q87Sql)),
    GQuery("q88_mv_rollup", q88MvRollup, Some(q88Sql)),
    GQuery("meta_hll_sketches", metaHllSketches, Some(metaHllSketchesSql)),
    GQuery("meta_kmv_overlap", metaKmvOverlap, Some(metaKmvOverlapSql)),
    GQuery("meta_join_estimate", metaJoinEstimate, Some(metaJoinEstimateSql)),
    GQuery("meta_quantile_sketch", metaQuantileSketch, Some(metaQuantileSketchSql)),
    GQuery("meta_kll_quantiles", metaKllQuantiles, Some(metaKllQuantilesSql)),
    GQuery("meta_resource_audit", metaResourceAudit, None),
    GQuery("meta_expectations", metaExpectations, Some(metaExpectationsSql)),
  )
}
