package graft.operators

import graft.GQuery
import graft.util._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reproducible sampling — a corpus build must be able to cut the
  * same subset on any cluster, any partitioning, any day. Spark's
  * `df.sample` is partition-order dependent, so both operators here
  * sample by KEY HASH instead: membership is a pure function of the
  * row, independent of physical layout.
  */
object Sampling {

  /** Stable sidecar the oracle reads: the Spark-side xxhash64 of
    * every orderkey, dumped once per entry run. xxhash64 itself is
    * engine-specific (DuckDB's hash() is not bit-compatible), but the
    * HASH TABLE is data the oracle can consume — the src_time_travel
    * manifest discipline: Spark publishes the engine-specific part as
    * rows, DuckDB replays all the RELATIONAL semantics (membership
    * arithmetic, join, projection, ordering) against it. NOT a scratch
    * dir — the driver's DuckDB pass runs after this JVM exits. */

  /** Deterministic ~5 % sample: keep rows whose key hash lands in
    * bucket 0 of 20. Membership never changes across runs/partitions;
    * at 100 TB this is a metadata-free sample that any job can
    * recompute exactly. Hash-green as of round 10 via the sidecar:
    * the oracle joins the dumped (key, hash) table and replays the
    * bucket filter, so row set, schema, and values are all compared —
    * only the hash values themselves are taken from Spark (their
    * determinism is spec-pinned separately). */
  def hashSample(spark: SparkSession, dir: String): DataFrame = {
    oracleSidecar("orders_keyhash", t(spark, dir, "orders")
      .select(col("o_orderkey"), xxhash64(col("o_orderkey")).as("h")))
    t(spark, dir, "orders")
      .filter(pmod(xxhash64(col("o_orderkey")), lit(20)) === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** DuckDB replays membership from the dumped hash table; pmod ≡
    * ((h % 20) + 20) % 20 on possibly-negative 64-bit hashes. */
  val hashSampleSql: String =
    s"""SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
       |FROM orders o
       |JOIN read_parquet('${oracleSidecarGlob("orders_keyhash")}') h
       |  ON h.o_orderkey = o.o_orderkey
       |WHERE ((h.h % 20) + 20) % 20 = 0
       |ORDER BY o.o_orderkey""".stripMargin

  /** Stratified sample: up to 25 documents per language, chosen by
    * hash order (deterministic, unbiased by doc_id order). Emitting
    * the per-stratum COUNTS makes it oracle-checkable even though the
    * chosen ids are hash-dependent: n_sampled = least(25, |stratum|). */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(xxhash64(col("doc_id")), col("doc_id"))
    t(spark, dir, "documents")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 25)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy(col("lang"))
  }

  val stratifiedSampleSql: String =
    """SELECT lang, least(25, count(*)) AS n_sampled
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Temperature-scaled mixture sampling — the α-sampling that
    * multilingual/multi-domain pretraining uses to keep head strata
    * from drowning tail strata (Conneau et al., XLM-R, §3.1: sample
    * stratum l with p_l ∝ n_l^α; α=1/2 here): per-language allocation
    * score = ⌊√n_l⌋ (exact in double far beyond any corpus size), a
    * 200-doc budget split by floor allocation `budget·score div Σscore`
    * capped at the stratum size, and the WHICH-docs choice made by the
    * Knuth multiplicative priority `((doc_id mod 2³¹)·2654435761) mod 2³²` — a
    * pure row function both engines compute identically, so membership
    * (not just counts) is oracle-checked. Per-stratum window sort is
    * the clarity shape; at 100 TB swap in the
    * [[graft.functions.BottomKByPriority]] partial aggregate with
    * k = max target (≤ k·|strata| rows ever shuffle). */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("lang"), col("doc_id"))
    val alloc = docs.groupBy(col("lang")).agg(count(lit(1)).as("stratum_n"))
      .withColumn("score", floor(sqrt(col("stratum_n"))).cast("long"))
      .crossJoin(broadcast(docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .agg(sum(floor(sqrt(col("n"))).cast("long")).as("tot"))))
      .withColumn("target", least(col("stratum_n"), expr("200 * score div tot")))
      .select(col("lang"), col("stratum_n"), col("score"), col("target"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(pmod(pmod(col("doc_id"), lit(2147483648L)) * 2654435761L, lit(4294967296L)), col("doc_id"))
    docs.withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(alloc), Seq("lang"))
      .filter(col("rk") <= col("target"))
      .select(col("lang"), col("rk"), col("doc_id"),
        col("stratum_n"), col("target"))
      .orderBy(col("lang"), col("rk"))
  }

  val temperatureMixSql: String =
    """WITH counts AS (
      | SELECT lang, count(*) AS stratum_n,
      |  cast(floor(sqrt(count(*))) as bigint) AS score
      | FROM documents GROUP BY lang),
      |alloc AS (
      | SELECT lang, stratum_n, score,
      |  least(stratum_n, 200 * score // (SELECT sum(score) FROM counts)) AS target
      | FROM counts),
      |ranked AS (
      | SELECT lang, doc_id, cast(row_number() OVER (PARTITION BY lang
      |   ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id) as bigint) AS rk
      | FROM documents)
      |SELECT r.lang, r.rk, r.doc_id, a.stratum_n, cast(a.target as bigint) AS target
      |FROM ranked r JOIN alloc a USING (lang)
      |WHERE r.rk <= a.target ORDER BY r.lang, r.rk""".stripMargin

  /** Bounded per-group sample via the native
    * [[graft.functions.BottomKByPriority]] aggregate: the 10 documents
    * per language with the smallest deterministic priority
    * `(doc_id · 2654435761) mod 2³²` (Knuth multiplicative hash — pure
    * row function, so ANY engine can replay membership, unlike
    * `xxhash64`). One-pass, partial-aggregable: map tasks keep ≤ k
    * pairs per group, so only k·|groups| pairs shuffle — the scale
    * alternative to the window-sort sample above, which shuffles every
    * row of every stratum. Fully oracle-checkable (row_number twin). */
  def reservoirGroup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("pri", pmod(pmod(col("doc_id"), lit(2147483648L)) * 2654435761L, lit(4294967296L)))
      .groupBy(col("lang"))
      .agg(graft.functions.BottomKByPriority.bottomK(col("pri"), col("doc_id"), 10).as("ids"))
      .select(col("lang"), posexplode(col("ids")).as(Seq("sample_rank", "doc_id")))
      .withColumn("sample_rank", (col("sample_rank") + 1).cast("long"))
      .orderBy(col("lang"), col("sample_rank"))

  val reservoirGroupSql: String =
    """WITH ranked AS (
      |  SELECT lang, doc_id,
      |         row_number() OVER (
      |           PARTITION BY lang
      |           ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id) AS sample_rank
      |  FROM documents)
      |SELECT lang, sample_rank, doc_id FROM ranked
      |WHERE sample_rank <= 10
      |ORDER BY lang, sample_rank""".stripMargin

  /** WEIGHTED sample without replacement — Efraimidis–Spirakis
    * (A-ES) exponential keys: item i gets key `-ln(uᵢ)/wᵢ` and the k
    * SMALLEST keys are the sample, equivalent to sequential weighted
    * draws. The uniform uᵢ is the deterministic Knuth hash mapped into
    * (0, 1], so membership is layout- and run-independent; keys are
    * scaled to integer priorities and fed through the same bounded
    * [[graft.functions.BottomKByPriority]] aggregate — one pass, k
    * pairs of state, no sort of the corpus. Weight = n_chars (longer
    * docs proportionally likelier — the "sample by contribution"
    * pipeline cut). ln() last-ulp behavior is libm-specific → rows-only;
    * specs pin determinism, exact size, and the heavy-doc bias. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val u = (pmod(pmod(col("doc_id"), lit(2147483648L)) * 2654435761L, lit(4294967296L)) + 1).cast("double") /
      lit(4294967296.0)
    val pri = (-log(u) / col("n_chars") * lit(1e15)).cast("long")
    val docs = t(spark, dir, "documents")
    // libm ln() is the only engine-specific term: publish the computed
    // priorities as an oracle sidecar, and DuckDB replays the ENTIRE
    // selection — bottom-50 by (pri, doc_id), join-back, ordering —
    // against them (hash-green as of round 10; determinism, exact
    // size, and heavy-doc bias stay spec-pinned)
    oracleSidecar("documents_espri", docs.withColumn("pri", pri)
      .select(col("doc_id"), col("pri")))
    docs
      .withColumn("pri", pri)
      .groupBy()
      .agg(graft.functions.BottomKByPriority.bottomK(col("pri"), col("doc_id"), 50).as("ids"))
      .select(posexplode(col("ids")).as(Seq("rank0", "doc_id")))
      .select((col("rank0") + 1).cast("long").as("sample_rank"), col("doc_id"))
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .select(col("sample_rank"), col("doc_id"), col("n_chars"))
      .orderBy(col("sample_rank"))
  }

  val weightedSampleSql: String =
    s"""WITH ranked AS (
       |  SELECT doc_id, cast(row_number() OVER (ORDER BY pri, doc_id) as bigint)
       |    AS sample_rank
       |  FROM read_parquet('${oracleSidecarGlob("documents_espri")}'))
       |SELECT r.sample_rank, r.doc_id, d.n_chars
       |FROM ranked r JOIN documents d USING (doc_id)
       |WHERE r.sample_rank <= 50
       |ORDER BY r.sample_rank""".stripMargin

  /** Deterministic A/B experiment assignment — the traffic-split
    * primitive every ramp/holdout pipeline needs: the UNIT (user) maps
    * to an arm by pure integer arithmetic on its id — Knuth
    * multiplicative hash mod 100, bucket < 50 → A — so membership is
    * layout-, run-, and engine-independent (the
    * `sample_hash_deterministic` discipline: a user's arm never
    * changes across days or recomputations, the property randomized
    * assignment cannot give). Output is the sample-ratio-mismatch
    * sanity table: per (arm, event_type) user counts, event counts,
    * and exact-decimal value sums. One shuffle on the grouping key;
    * all-integer assignment ⇒ fully oracle-checked. */
  def abSplit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("arm",
        when(pmod(pmod(col("user_id"), lit(2147483648L)) * 2654435761L, lit(4294967296L)) % 100 < 50, "A")
          .otherwise("B"))
      .groupBy(col("arm"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .orderBy(col("arm"), col("event_type"))

  val abSplitSql: String =
    s"""SELECT CASE WHEN ((user_id % 2147483648) * 2654435761) % 4294967296 % 100 < 50
       |       THEN 'A' ELSE 'B' END AS arm,
       | event_type,
       | count(DISTINCT user_id) AS n_users,
       | count(*) AS n_events,
       | ${sqlDsum("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY arm, event_type""".stripMargin

  /** Embedding CORESET via farthest-point sampling (Gonzalez 1985
    * 2-approx k-center): start from the smallest vec_id, then k−1
    * times pick the point maximizing its distance to the chosen set —
    * the diversity-maximizing subset a curation pipeline uses to cover
    * an embedding space with a tiny budget (the complement of SemDeDup:
    * instead of dropping near-dups, keep the spread). Distances are
    * cosine distance `1 − round(cos, 6)` via the codegen [[CosineSim]]
    * expression, so every value lives on the 1e-6 grid and the argmax
    * (ties → smallest vec_id) is bit-deterministic in BOTH engines —
    * the DuckDB oracle replays all k rounds as unrolled MATERIALIZED
    * CTEs and must produce the identical (rank, id, distance) rows.
    *
    * Scale: each round is ONE full-scan max-reduce (no shuffle beyond
    * a 1-row top-k) against the incrementally maintained min-distance
    * column; k rounds total. At 100 TB you don't FPS raw rows — you
    * FPS the IVF centroid table from `sim_index_build` (centroid-sized
    * input, same code path); the k driver-side collects here are each
    * exactly one row by construction. */
  def coresetFps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 8
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val seed = e.orderBy(col("vec_id")).limit(1).collect().head
    var picks = Vector((seed.getLong(0), 0.0))
    var centerV: Seq[Double] = seed.getSeq[Double](1)
    var scored = e.withColumn("md",
      lit(1.0) - graft.functions.CosineSim.cosine(col("v"), typedLit(centerV)))
    for (_ <- 2 to k) {
      val top = scored.orderBy(col("md").desc, col("vec_id")).limit(1)
        .select(col("vec_id"), col("md"), col("v")).collect().head
      picks = picks :+ ((top.getLong(0), top.getDouble(1)))
      centerV = top.getSeq[Double](2)
      scored = scored.withColumn("md",
        least(col("md"), lit(1.0) - graft.functions.CosineSim.cosine(col("v"), typedLit(centerV))))
    }
    picks.zipWithIndex
      .map { case ((id, d), i) => (i + 1L, id, d) }
      .toDF("rnk", "vec_id", "dist")
      .orderBy(col("rnk"))
  }

  /** Unrolled FPS rounds; every d_i is referenced by both c_{i+1} and
    * d_{i+1}, so each is MATERIALIZED (the k-core oracle lesson: a CTE
    * referenced more than once must not be inlined twice). */
  val coresetFpsSql: String = {
    def cos(a: String, b: String) =
      s"round(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
    val rounds = (2 to 8).map { i =>
      s"""c$i AS MATERIALIZED (SELECT vec_id, v, md FROM d${i - 1} ORDER BY md DESC, vec_id LIMIT 1),
         | d$i AS MATERIALIZED (SELECT d.vec_id, d.v, least(d.md, 1 - ${cos("d.v", "c.v")}) AS md
         |  FROM d${i - 1} d, c$i c)""".stripMargin
    }.mkString(",\n ")
    val unions = (2 to 8).map(i =>
      s"UNION ALL SELECT cast($i as bigint), vec_id, md FROM c$i").mkString("\n ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       | c1 AS MATERIALIZED (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
       | d1 AS MATERIALIZED (SELECT e.vec_id, e.v AS v, 1 - ${cos("e.v", "c.v")} AS md
       |  FROM e, c1 c),
       | $rounds
       |SELECT * FROM (
       | SELECT cast(1 as bigint) AS rnk, vec_id, cast(0.0 as double) AS dist FROM c1
       | $unions
       |) ORDER BY rnk""".stripMargin
  }

  /** Poisson(1) CDF thresholds in 2³²-units — P(X ≤ i) · 2³² for
    * i = 0..6, draws capped at 7 (the cap binds with P ≈ 8·10⁻⁵).
    * Fixed integer literals so both engines draw identically. */
  val poissonCdf32: Seq[Long] = Seq(1580030168L, 3160060337L, 3950075421L,
    4213413783L, 4279248373L, 4292415291L, 4294609777L)

  /** Online (Poisson) bootstrap — uncertainty for a 100 TB aggregate
    * in ONE pass: instead of materializing R resamples-with-replacement
    * (each a full shuffle of the fact table), every row draws a
    * per-replicate Poisson(1) multiplicity — the large-N limit of the
    * multinomial resample — and the R replicate aggregates accumulate
    * side by side (Chamandy et al., "Estimating Uncertainty for
    * Massive Data Streams", 2012). The draw is a pure integer function
    * of (event_id, replicate) — Knuth multiplicative mixing into 2³²
    * space, multiplicity = #CDF thresholds at or below the hash — so
    * membership is layout-independent and both engines replay it
    * bit-for-bit: the whole entry is oracle-checked, no RNG anywhere.
    * Plan shape: map-side R× expansion (R tiny), one R-group
    * aggregate; the fact table is scanned once and never reshuffled.
    * The replicate spread of mean_micro IS the standard-error
    * estimate. */
  def bootstrapPoisson(spark: SparkSession, dir: String): DataFrame = {
    val reps = 5
    val ev = t(spark, dir, "events")
      .select(col("event_id"), round(col("value") * 100).cast("long").as("cents"))
    val r = spark.range(reps).select(col("id").as("rep"))
    val u32 = pmod(pmod(col("event_id"), lit(2147483648L)) * 2654435761L +
      (col("rep") + 1) * lit(2246822519L), lit(4294967296L))
    val k = poissonCdf32.map(t => when(u32 >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    ev.crossJoin(r)
      .select(col("rep"), k.as("k"), col("cents"))
      .groupBy(col("rep"))
      // accumulate in decimal(38,0): total_cents is a CORPUS-scale
      // money sum and ×10⁶ wraps int64 already at ~$92B — DuckDB's
      // sum() is HUGEINT, so the decimal path keeps the engines in
      // lockstep at any SF (the long display cast of total_cents is
      // safe to ~$9.2·10¹⁶, documented like q117's sum_d2)
      .agg(sum(col("k")).cast("long").as("n_drawn"),
        sum((col("k") * col("cents"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("tc"))
      .select(col("rep"), col("n_drawn"),
        col("tc").cast("long").as("total_cents"),
        expr("cast(tc * 1000000 div n_drawn as bigint)").as("mean_micro"))
      .orderBy(col("rep"))
  }

  val bootstrapPoissonSql: String = {
    val kCase = poissonCdf32.map(t =>
      s"CASE WHEN u32 >= $t THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH d AS (
       | SELECT r.rep,
       |  (((e.event_id % 2147483648) * 2654435761 + (r.rep + 1) * 2246822519)
       |     % 4294967296 + 4294967296) % 4294967296 AS u32,
       |  cast(round(e.value * 100) as bigint) AS cents
       | FROM events e
       | CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4]) AS rep) r),
       |k AS (SELECT rep, $kCase AS k, cents FROM d)
       |SELECT rep, cast(sum(k) as bigint) AS n_drawn,
       | cast(sum(k * cents) as bigint) AS total_cents,
       | cast(sum(k * cents) * 1000000 // sum(k) as bigint) AS mean_micro
       |FROM k GROUP BY rep ORDER BY rep""".stripMargin
  }

  /** Deterministic k-fold cross-validation assignment — every event
    * lands in exactly one of 5 folds by the Knuth multiplicative hash
    * (layout/run/engine-independent, the `sample_ab_split` discipline
    * extended from 2 arms to k folds), with the audit a CV harness
    * needs before training: per-fold size and per-fold class balance
    * (event_type share in integer micro-units). A skewed fold or a
    * fold whose class mix diverges invalidates cross-validation —
    * both are visible in this one table, and the integer arithmetic
    * makes it fully oracle-checked. Assignment is map-side; the only
    * shuffle is the (fold, class) count. */
  def kfoldSplit(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_type"),
        pmod(pmod(col("event_id"), lit(2147483648L)) * 2654435761L, lit(4294967296L))
          .mod(5).cast("long").as("fold"))
    val foldTotals = ev.groupBy(col("fold")).agg(count(lit(1)).as("fn"))
    ev.groupBy(col("fold"), col("event_type"))
      .agg(count(lit(1)).as("cn"))
      .join(foldTotals, Seq("fold"))
      .select(col("fold"), col("event_type"), col("cn").cast("long").as("n"),
        expr("(cn * 1000000) div fn").cast("long").as("share_micro"))
      .orderBy(col("fold"), col("event_type"))
  }

  val kfoldSplitSql: String =
    """WITH ev AS (
      | SELECT event_type,
      |  (((event_id % 2147483648) * 2654435761) % 4294967296 + 4294967296)
      |    % 4294967296 % 5 AS fold
      | FROM events),
      |ft AS (SELECT fold, count(*) AS fn FROM ev GROUP BY fold)
      |SELECT ev.fold, event_type, cast(count(*) as bigint) AS n,
      | cast((count(*) * 1000000) // ft.fn as bigint) AS share_micro
      |FROM ev JOIN ft USING (fold)
      |GROUP BY ev.fold, event_type, ft.fn
      |ORDER BY fold, event_type""".stripMargin

  /** Leakage-safe temporal train/val/test split with embargo gaps —
    * the time-series discipline (de Prado's purged split) that a
    * random split violates: boundaries are strict points in EVENT
    * TIME (70 / 85 % order statistics of the (ts, event_id) total
    * order), and an embargo of n/200 rows immediately AFTER each
    * boundary is EXCLUDED so that windowed features computed near the
    * cut cannot straddle it. Everything is exact integer rank
    * arithmetic, and membership is oracle-checked via per-split
    * bit_xor/sum of event ids, not just counts. Ranks come from
    * DistRank.withRowNumber (range partitioner + per-partition
    * offsets) — the whole events table never funnels through a
    * single-partition window. */
  def temporalSplit(spark: SparkSession, dir: String): DataFrame = {
    DistRank.withRowNumber(
        t(spark, dir, "events")
          .select(col("event_id"), col("ts"),
            (unix_micros(col("ts")) / 86400000000L).cast("long").as("day")),
        Seq(col("ts"), col("event_id")), "rn")
      .crossJoin(broadcast(t(spark, dir, "events")
        .agg(count(lit(1)).as("n"),
          greatest(expr("count(1) div 200"), lit(1L)).as("e"))))
      .withColumn("k1", expr("(n * 70) div 100"))
      .withColumn("k2", expr("(n * 85) div 100"))
      .withColumn("split",
        when(col("rn") <= col("k1"), lit("train"))
          .when(col("rn") <= col("k1") + col("e"), lit("embargo"))
          .when(col("rn") <= col("k2"), lit("val"))
          .when(col("rn") <= col("k2") + col("e"), lit("embargo"))
          .otherwise(lit("test")))
      .groupBy(col("split"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min(col("day")).cast("long").as("min_day"),
        max(col("day")).cast("long").as("max_day"),
        expr("bit_xor(event_id)").cast("long").as("xor_ids"),
        sum(col("event_id")).cast("long").as("sum_ids"))
      .orderBy(col("split"))
  }

  val temporalSplitSql: String =
    """WITH ev AS (
      | SELECT event_id, (epoch_ns(ts) // 1000) // 86400000000 AS day,
      |  row_number() OVER (ORDER BY ts, event_id) AS rn
      | FROM events),
      |tot AS (SELECT count(*) AS n,
      |  greatest(count(*) // 200, 1) AS e FROM events),
      |marked AS (
      | SELECT ev.*, (n * 70) // 100 AS k1, (n * 85) // 100 AS k2, e
      | FROM ev CROSS JOIN tot)
      |SELECT CASE WHEN rn <= k1 THEN 'train'
      |            WHEN rn <= k1 + e THEN 'embargo'
      |            WHEN rn <= k2 THEN 'val'
      |            WHEN rn <= k2 + e THEN 'embargo'
      |            ELSE 'test' END AS split,
      | cast(count(*) as bigint) AS n_rows,
      | cast(min(day) as bigint) AS min_day,
      | cast(max(day) as bigint) AS max_day,
      | cast(bit_xor(event_id) as bigint) AS xor_ids,
      | cast(sum(event_id) as bigint) AS sum_ids
      |FROM marked GROUP BY 1 ORDER BY split""".stripMargin

  /** Walk-forward (expanding-window) cross-validation — the
    * time-series CV scheme that never trains on the future: fold i of
    * 4 trains on the chronologically first n·i/8 events and tests on
    * the next n/8 (so train windows expand 1/8 → 4/8 while each test
    * window stays one slice wide). Chronological ranks come from
    * [[DistRank.withRowNumber]] (range partition + prefix-sum offsets
    * — no single-partition window), fold membership from one
    * explode(sequence) so the table is scanned ONCE for all folds, and
    * boundaries are integer n·i div 8 — exact in both engines. Output
    * per (fold, role): counts, day span, and xor/sum id digests so the
    * oracle checks MEMBERSHIP, not just sizes. */
  def walkForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_id"), col("ts"),
        (unix_micros(col("ts")) / 86400000000L).cast("long").as("day"))
    DistRank.withRowNumber(ev, Seq(col("ts"), col("event_id")), "rn")
      .crossJoin(broadcast(ev.agg(count(lit(1)).as("n"))))
      .withColumn("fold", explode(expr("sequence(1L, 4L)")))
      .filter(col("rn") <= expr("n * (fold + 1) div 8"))
      .withColumn("role",
        when(col("rn") <= expr("n * fold div 8"), lit("train")).otherwise(lit("test")))
      .groupBy(col("fold"), col("role"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min(col("day")).cast("long").as("min_day"),
        max(col("day")).cast("long").as("max_day"),
        expr("bit_xor(event_id)").cast("long").as("xor_ids"),
        sum(col("event_id")).cast("long").as("sum_ids"))
      .orderBy(col("fold"), col("role"))
  }

  val walkForwardSql: String =
    """WITH ev AS (
      | SELECT event_id, (epoch_ns(ts) // 1000) // 86400000000 AS day,
      |  row_number() OVER (ORDER BY ts, event_id) AS rn
      | FROM events),
      |tot AS (SELECT count(*) AS n FROM events),
      |folds AS (SELECT range AS fold FROM range(1, 5)),
      |m AS (
      | SELECT ev.*, fold, (n * fold) // 8 AS k1, (n * (fold + 1)) // 8 AS k2
      | FROM ev CROSS JOIN tot CROSS JOIN folds)
      |SELECT cast(fold as bigint) AS fold,
      | CASE WHEN rn <= k1 THEN 'train' ELSE 'test' END AS role,
      | cast(count(*) as bigint) AS n_rows,
      | cast(min(day) as bigint) AS min_day,
      | cast(max(day) as bigint) AS max_day,
      | cast(bit_xor(event_id) as bigint) AS xor_ids,
      | cast(sum(event_id) as bigint) AS sum_ids
      |FROM m WHERE rn <= k2
      |GROUP BY 1, 2 ORDER BY fold, role""".stripMargin

  /** Deterministic negative sampling for implicit-feedback training —
    * the ranking-loss data op (word2vec/BPR and every recommender):
    * per customer, draw candidate items from the engine-neutral Knuth
    * multiplicative hash stream (the sample_kfold generator, seeded by
    * (customer, draw index)), REJECT any observed positive via one
    * anti-join against the purchase pairs, keep the first 5 surviving
    * draws in stream order. Fully deterministic, bit-identical in both
    * engines (integer hash, no RNG), and candidate-linear: 20 draws ×
    * customers scored in one hash join — never a customers×items
    * cross product. At 100 TB the same plan holds with the positives
    * side bucketed on customer; collision-free k-out-of-n sampling
    * follows from drawing a few more candidates than k (spec asserts
    * every customer fills its 5). */
  def negativeSampling(spark: SparkSession, dir: String): DataFrame = {
    val pos = t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("item"))
      .distinct()
    val nItems = t(spark, dir, "part")
      .agg(max(col("p_partkey")).as("n_items"))
    val draws = t(spark, dir, "customer")
      .select(col("c_custkey").as("cust"))
      .crossJoin(broadcast(nItems))
      .withColumn("j", explode(sequence(lit(0L), lit(19L))))
      .withColumn("item",
        expr("1 + (((cust % 2147483648) * 2654435761 + j * 40503) % 4294967296 + 4294967296) " +
          "% 4294967296 % n_items"))
    val keepw = Window.partitionBy(col("cust")).orderBy(col("j"))
    draws.join(pos, Seq("cust", "item"), "left_anti")
      .withColumn("rk", row_number().over(keepw))
      .filter(col("rk") <= 5)
      .select(col("cust"), col("rk").cast("long").as("rk"),
        col("item").cast("long").as("neg_item"))
      .orderBy(col("cust"), col("rk"))
  }

  val negativeSamplingSql: String =
    """WITH pos AS (
      | SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS item
      | FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |ni AS (SELECT max(p_partkey) AS n_items FROM part),
      |draws AS (
      | SELECT c.c_custkey AS cust, j,
      |  1 + (((c.c_custkey % 2147483648) * 2654435761 + j * 40503) % 4294967296
      |    + 4294967296) % 4294967296 % n_items AS item
      | FROM customer c CROSS JOIN ni
      |  CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS j)),
      |survivors AS (
      | SELECT d.cust, d.j, d.item FROM draws d
      | WHERE NOT EXISTS (SELECT 1 FROM pos p
      |   WHERE p.cust = d.cust AND p.item = d.item)),
      |ranked AS (
      | SELECT *, row_number() OVER (PARTITION BY cust ORDER BY j) AS rk
      | FROM survivors)
      |SELECT cust, cast(rk as bigint) AS rk, cast(item as bigint) AS neg_item
      |FROM ranked WHERE rk <= 5 ORDER BY cust, rk""".stripMargin

  /** Grouped holdout split (GroupKFold discipline) — the split that
    * prevents ENTITY leakage where [[temporalSplit]] prevents
    * temporal leakage: every event of a user lands in the same fold,
    * assigned by the engine-neutral Knuth hash of the USER id (80/20),
    * so correlated rows of one entity can never straddle the
    * train/eval boundary. The audit columns make the guarantee
    * relational: per split, the row count, the distinct-user count,
    * and membership checksums — and the defining invariant (user sets
    * disjoint across splits) is spec-pinned. Pure per-row hash +
    * answer-sized rollup: scan-speed at any scale, no coordination. */
  def groupHoldout(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "events")
      .select(col("event_id"), col("user_id"))
      .withColumn("split",
        when(expr("(((user_id % 2147483648) * 2654435761) % 4294967296 + 4294967296) " +
          "% 4294967296 % 5") < 4, lit("train")).otherwise(lit("holdout")))
      .groupBy(col("split"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        countDistinct(col("user_id")).cast("long").as("n_users"),
        expr("bit_xor(event_id)").cast("long").as("xor_ids"),
        sum(col("user_id")).cast("long").as("sum_uids"))
      .orderBy(col("split"))
  }

  val groupHoldoutSql: String =
    """WITH ev AS (
      | SELECT event_id, user_id,
      |  CASE WHEN (((user_id % 2147483648) * 2654435761) % 4294967296 + 4294967296)
      |    % 4294967296 % 5 < 4 THEN 'train' ELSE 'holdout' END AS split
      | FROM events)
      |SELECT split, cast(count(*) as bigint) AS n_rows,
      | cast(count(DISTINCT user_id) as bigint) AS n_users,
      | cast(bit_xor(event_id) as bigint) AS xor_ids,
      | cast(sum(user_id) as bigint) AS sum_uids
      |FROM ev GROUP BY split ORDER BY split""".stripMargin

  /** NEYMAN OPTIMAL ALLOCATION — the survey-sampling answer to "how
    * many samples per stratum": allocate ∝ N_h·S_h (stratum size ×
    * stratum spread), so volatile strata get more budget than uniform
    * ones at equal size (Neyman 1934; vs. the proportional split of
    * [[stratifiedSample]] and the α-temperature split of
    * [[temperatureMix]] — this completes the allocation-policy
    * matrix). All arithmetic is engine-neutral: spread is measured on
    * x = ⌊acctbal/10⌋ (tens of currency units, LongType), and
    * N_h·S_h = √(N_h²·Var) = √(N_h·Σx² − (Σx)²) — a square root of a
    * PURE INTEGER. With |x| ≤ 10³ the radicand is ≤ n_h²·10⁶
    * (< 2⁵³ through sf1's ~3·10⁴-customer strata), exactly
    * representable in double, and IEEE-754 sqrt is correctly rounded,
    * so ⌊√·⌋ is bit-identical in both engines. A 300-customer budget
    * splits by floor allocation `300·score div Σscore` capped at the
    * stratum size; WHICH customers is decided by the Knuth
    * multiplicative priority `(c_custkey·2654435761) mod 2³²`, a pure
    * row function — membership, not just counts, is oracle-checked.
    * Scale: one map-side-partial moment aggregation (n, Σx, Σx² per
    * stratum — 5 rows), allocation math on the driver-free broadcast
    * scalar, and the per-stratum pick is the keyed-window clarity
    * shape with [[graft.functions.BottomKByPriority]] as the ledgered
    * 100 TB swap-in (≤ budget·|strata| rows would ever shuffle). */
  def neymanAllocation(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
      .select(col("c_mktsegment").as("segment"), col("c_custkey"),
        floor(col("c_acctbal") / 10).cast("long").as("x"))
    val moments = cust.groupBy(col("segment"))
      .agg(count(lit(1)).as("stratum_n"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
      .withColumn("score",
        floor(sqrt((col("stratum_n") * col("sxx") - col("sx") * col("sx"))
          .cast("double"))).cast("long"))
    val alloc = moments
      .crossJoin(broadcast(moments.agg(sum(col("score")).as("tot"))))
      // greatest(tot, 1): a degenerate corpus where every stratum is
      // constant (all scores 0) must yield an empty sample, not a
      // division error — DuckDB's // raises on 0 where Spark's div
      // returns null, so the guard also keeps the engines aligned
      .withColumn("target",
        least(col("stratum_n"), expr("300 * score div greatest(tot, 1L)")))
      .select(col("segment"), col("stratum_n"), col("score"), col("target"))
    val w = Window.partitionBy(col("segment"))
      .orderBy(pmod(pmod(col("c_custkey"), lit(2147483648L)) * 2654435761L, lit(4294967296L)), col("c_custkey"))
    cust.withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(alloc), Seq("segment"))
      .filter(col("rk") <= col("target"))
      .select(col("segment"), col("rk"), col("c_custkey"),
        col("stratum_n"), col("score"), col("target"))
      .orderBy(col("segment"), col("rk"))
  }

  val neymanAllocationSql: String =
    """WITH cust AS (
      | SELECT c_mktsegment AS segment, c_custkey,
      |  cast(floor(c_acctbal / 10) as bigint) AS x
      | FROM customer),
      |moments AS (
      | SELECT segment, count(*) AS stratum_n,
      |  cast(sum(x) as bigint) AS sx, cast(sum(x * x) as bigint) AS sxx
      | FROM cust GROUP BY segment),
      |scored AS (
      | SELECT segment, stratum_n,
      |  cast(floor(sqrt(cast(stratum_n * sxx - sx * sx as double))) as bigint)
      |    AS score
      | FROM moments),
      |alloc AS (
      | SELECT segment, stratum_n, score,
      |  least(stratum_n, 300 * score // greatest((SELECT sum(score) FROM scored), 1))
      |    AS target
      | FROM scored),
      |ranked AS (
      | SELECT segment, c_custkey, cast(row_number() OVER (PARTITION BY segment
      |   ORDER BY ((c_custkey % 2147483648) * 2654435761) % 4294967296, c_custkey) as bigint) AS rk
      | FROM cust)
      |SELECT r.segment, r.rk, r.c_custkey, a.stratum_n, a.score,
      | cast(a.target as bigint) AS target
      |FROM ranked r JOIN alloc a USING (segment)
      |WHERE r.rk <= a.target ORDER BY r.segment, r.rk""".stripMargin

  /** SYSTEMATIC sampling — every 20th element of a deterministic
    * permutation (take rank ≡ 7 mod 20 over the Knuth-priority order
    * of o_orderkey): the classic equal-probability design whose
    * stride guarantees exact 5 % coverage of every contiguous
    * priority range, unlike Bernoulli hash sampling whose per-bucket
    * counts fluctuate ([[hashSample]] is the Bernoulli twin). Ordering
    * by a hash-derived priority is what makes the systematic design
    * safe — the textbook failure mode (periodicity in the frame
    * aligning with the stride) cannot survive a pseudo-random
    * permutation. The global rank comes from
    * [[graft.operators.DistRank]] (range partition → prefix-sum
    * offsets → partition-local rank), NOT a global window — no
    * single-partition WindowExec at any scale; membership is a pure
    * function of the data so the oracle replays it exactly. */
  def systematicSample(spark: SparkSession, dir: String): DataFrame = {
    val pop = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("pri", pmod(pmod(col("o_orderkey"), lit(2147483648L)) * 2654435761L, lit(4294967296L)))
    graft.operators.DistRank
      .withRowNumber(pop, Seq(col("pri"), col("o_orderkey")), "rk")
      .filter(pmod(col("rk"), lit(20)) === 7)
      .select(col("rk"), col("o_orderkey"), col("o_custkey"), col("cents"))
      .orderBy(col("rk"))
  }

  val systematicSampleSql: String =
    """WITH ranked AS (
      | SELECT o_orderkey, o_custkey,
      |  cast(round(o_totalprice * 100) as bigint) AS cents,
      |  cast(row_number() OVER (
      |   ORDER BY ((o_orderkey % 2147483648) * 2654435761) % 4294967296, o_orderkey) as bigint)
      |   AS rk
      | FROM orders)
      |SELECT rk, o_orderkey, o_custkey, cents FROM ranked
      |WHERE rk % 20 = 7 ORDER BY rk""".stripMargin

  /** DEDUP-AWARE train/test split — the leakage fix
    * `dedup_contamination` only DETECTS: near-duplicate documents
    * must land on the SAME side of a split, or the test set scores
    * memorization (Lee et al. ACL'22 measure this exact inflation).
    * The split key is therefore the near-dup COMPONENT root (from
    * the persisted dedup graph; singletons key by their own id), and
    * the side is the engine-neutral Knuth hash of that key — so two
    * docs with J ≥ 0.8 share a root and can NEVER straddle the
    * boundary, by construction rather than by post-hoc filtering.
    * Output: per side, doc/char counts and xor/sum id digests —
    * membership, not just counts, is oracle-checked (DuckDB rebuilds
    * the components with a recursive CTE and replays the split
    * arithmetic). Scale: one left join of documents against the
    * node-sized component labels + an answer-bounded rollup; the
    * component build amortizes in the cross-JVM dedup-graph
    * artifact. */
  def dedupAwareSplit(spark: SparkSession, dir: String): DataFrame = {
    val comp = spark.read
      .parquet(s"${graft.operators.Dedup.dedupGraphRoot(spark, dir)}/components")
      .select(col("id").as("doc_id"), col("root"))
    t(spark, dir, "documents")
      .join(comp, Seq("doc_id"), "left")
      .withColumn("k", coalesce(col("root"), col("doc_id")))
      .withColumn("side",
        when(pmod(pmod(pmod(col("k"), lit(2147483648L)) * 2654435761L, lit(4294967296L)), lit(10)) < 8,
          "train").otherwise("test"))
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(doc_id)").cast("long").as("xor_ids"),
        sum(col("doc_id")).as("sum_ids"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy(col("side"))
  }

  val dedupAwareSplitSql: String = {
    import graft.operators.Dedup.componentsSqlCtes
    s"""WITH RECURSIVE $componentsSqlCtes,
       |keyed AS (
       | SELECT d.doc_id, d.n_chars, coalesce(c.root, d.doc_id) AS k
       | FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
       |SELECT CASE WHEN (((k % 2147483648) * 2654435761) % 4294967296) % 10 < 8
       |         THEN 'train' ELSE 'test' END AS side,
       | cast(count(*) as bigint) AS n_docs,
       | cast(bit_xor(doc_id) as bigint) AS xor_ids,
       | cast(sum(doc_id) as bigint) AS sum_ids,
       | cast(sum(n_chars) as bigint) AS total_chars
       |FROM keyed GROUP BY 1 ORDER BY side""".stripMargin
  }

  /** EPOCH RESHUFFLING — training loops need a DIFFERENT document
    * order every epoch without materializing a permutation (shuffling
    * 100 TB between epochs is a non-starter): order = the Knuth
    * priority of (doc_id, epoch), a pure row function any reader can
    * recompute, so epoch e's order exists nowhere on disk yet is
    * identical on every worker. The entry proves the contract on the
    * first 5 docs of 3 epochs — and fetches them through the
    * [[graft.functions.BottomKByPriority]] partial aggregate, so the
    * shuffle carries k·|epochs| pairs, never a per-epoch global sort
    * (the window-sort formulation would funnel the corpus through one
    * task per epoch). The epoch offset is added BEFORE the Knuth
    * multiplication — added after, it would be a constant shift of
    * every priority, which preserves the order almost everywhere and
    * gives three near-identical "shuffles" (the spec's
    * distinct-permutation law caught exactly that in the first
    * draft). The mixed key reduces mod 2³¹ before the Knuth multiply
    * (the double-mod discipline applied registry-wide in round 13),
    * so the product is < 2⁶³ at ANY doc_id, not just the fixture's. */
  def epochShuffle(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), explode(expr("sequence(1, 3)")).as("epoch"))
      .withColumn("pri", pmod(
        pmod(col("doc_id") + col("epoch") * 16777259L, lit(2147483648L)) * 2654435761L,
        lit(4294967296L)))
      .groupBy(col("epoch"))
      .agg(graft.functions.BottomKByPriority.bottomK(col("pri"), col("doc_id"), 5)
        .as("ids"))
      .select(col("epoch").cast("long").as("epoch"),
        posexplode(col("ids")).as(Seq("rank0", "doc_id")))
      .select(col("epoch"), (col("rank0") + 1).cast("long").as("rank"), col("doc_id"))
      .orderBy(col("epoch"), col("rank"))

  val epochShuffleSql: String =
    """WITH e AS (
      | SELECT doc_id, unnest(range(1, 4)) AS epoch FROM documents),
      |ranked AS (
      | SELECT epoch, doc_id,
      |  cast(row_number() OVER (PARTITION BY epoch
      |   ORDER BY (((doc_id + epoch * 16777259) % 2147483648) * 2654435761) % 4294967296, doc_id)
      |   as bigint) AS rank
      | FROM e)
      |SELECT cast(epoch as bigint) AS epoch, rank, doc_id
      |FROM ranked WHERE rank <= 5
      |ORDER BY epoch, rank""".stripMargin

  /** CLASS-BALANCED RESAMPLING — the imbalanced-learning prep step:
    * every embedding label downsampled to the MINORITY class's count
    * (random undersampling, the baseline of the imbalance literature),
    * membership decided by the per-class Knuth-priority rank so WHICH
    * vectors survive is a pure function of the data — the oracle
    * checks membership digests, not just counts. The minority count
    * is a broadcast scalar; the per-class pick is the keyed-window
    * clarity shape with [[graft.functions.BottomKByPriority]] as the
    * ledgered 100 TB swap-in. Output per label: original count, kept
    * count (= global minimum), xor/sum digests of kept ids. */
  def balancedClasses(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
      .select(col("label").cast("long").as("label"), col("vec_id"))
    val minority = e.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("target"))
    val w = Window.partitionBy(col("label"))
      .orderBy(pmod(pmod(col("vec_id"), lit(2147483648L)) * 2654435761L, lit(4294967296L)), col("vec_id"))
    e.withColumn("rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(minority))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_original"),
        sum(when(col("rk") <= col("target"), 1L).otherwise(0L)).as("n_kept"),
        expr("bit_xor(CASE WHEN rk <= target THEN vec_id END)").cast("long")
          .as("xor_kept"),
        coalesce(sum(when(col("rk") <= col("target"), col("vec_id"))), lit(0L))
          .as("sum_kept"))
      .orderBy(col("label"))
  }

  val balancedClassesSql: String =
    """WITH e AS (
      | SELECT cast(label as bigint) AS label, vec_id FROM embeddings),
      |ranked AS (
      | SELECT label, vec_id, cast(row_number() OVER (PARTITION BY label
      |   ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id) as bigint) AS rk
      | FROM e),
      |target AS (
      | SELECT min(n) AS t FROM (SELECT count(*) AS n FROM e GROUP BY label))
      |SELECT label, cast(count(*) as bigint) AS n_original,
      | cast(sum(CASE WHEN rk <= (SELECT t FROM target) THEN 1 ELSE 0 END)
      |   as bigint) AS n_kept,
      | cast(bit_xor(CASE WHEN rk <= (SELECT t FROM target) THEN vec_id END)
      |   as bigint) AS xor_kept,
      | cast(coalesce(sum(CASE WHEN rk <= (SELECT t FROM target)
      |   THEN vec_id END), 0) as bigint) AS sum_kept
      |FROM ranked GROUP BY label ORDER BY label""".stripMargin

  /** SEQUENCE PACKING — the concat-then-chunk step every GPT-style
    * pretraining pipeline runs between tokenization and training: the
    * corpus is one long token stream in corpus (doc_id) order, cut
    * into fixed 2048-token training windows; a document occupies
    * [prefix−n, prefix) of the stream and therefore lands in chunks
    * ⌊start/B⌋ .. ⌊(end−1)/B⌋ — documents straddling a cut are the
    * boundary-split docs an attention-mask reset has to handle, and
    * the packer's whole job is knowing exactly which they are. The
    * global prefix sum runs through [[DistRank.withPrefix]] (range
    * partition + partition partials — never a single-partition
    * window); per-doc chunk spans explode output-linearly (a doc with
    * T tokens touches ≤ T/B + 1 chunks); the per-chunk rollup is one
    * equi-shuffle on chunk_id. Every chunk except the last carries
    * EXACTLY B tokens — the law the spec pins — so downstream
    * training-shard manifests can address the stream arithmetically.
    * All integer ⇒ DuckDB replays the identical packing. */
  val packChunkTokens = 2048L

  def sequencePack(spark: SparkSession, dir: String): DataFrame = {
    val B = packChunkTokens
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    val pre = graft.operators.DistRank.withPrefix(
      toks, Seq(col("doc_id")), col("n_toks"), "sum", "pend")
      .select(col("doc_id"), col("n_toks"),
        (col("pend") - col("n_toks")).as("pstart"), col("pend"))
    val spans = pre
      // INTEGER division (div), not float `/` + cast: the float path
      // is exact only while prefix sums stay below 2^53 — a real
      // corpus passes that within ~1 PB of tokens, and the DuckDB
      // twin's `//` is integral at any scale. Keep the packer exact
      // for any corpus size, as the entry claims.
      .withColumn("first_chunk", expr(s"pstart div ${B}L"))
      .withColumn("last_chunk", expr(s"(pend - 1) div ${B}L"))
      .withColumn("chunk_id",
        explode(sequence(col("first_chunk"), col("last_chunk"))))
      .withColumn("tok_in_chunk",
        least(col("pend"), (col("chunk_id") + 1) * B) -
          greatest(col("pstart"), col("chunk_id") * B))
    spans.groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("first_chunk") === col("chunk_id") &&
          col("last_chunk") === col("chunk_id"), 1L).otherwise(0L))
          .as("n_full_docs"),
        sum(col("tok_in_chunk")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("chunk_id"))
  }

  val sequencePackSql: String =
    s"""WITH toks AS (
       | SELECT doc_id, cast(len(string_split(text, ' ')) as bigint) AS n_toks
       | FROM documents),
       |pre AS (
       | SELECT doc_id, n_toks,
       |  cast(sum(n_toks) OVER (ORDER BY doc_id) - n_toks as bigint) AS pstart,
       |  cast(sum(n_toks) OVER (ORDER BY doc_id) as bigint) AS pend
       | FROM toks),
       |spans AS (
       | SELECT doc_id, pstart, pend,
       |  pstart // ${packChunkTokens} AS first_chunk,
       |  (pend - 1) // ${packChunkTokens} AS last_chunk,
       |  unnest(range(pstart // ${packChunkTokens},
       |               (pend - 1) // ${packChunkTokens} + 1)) AS chunk_id
       | FROM pre)
       |SELECT cast(chunk_id as bigint) AS chunk_id,
       | cast(count(*) as bigint) AS n_docs,
       | cast(sum(CASE WHEN first_chunk = chunk_id AND last_chunk = chunk_id
       |   THEN 1 ELSE 0 END) as bigint) AS n_full_docs,
       | cast(sum(least(pend, (chunk_id + 1) * ${packChunkTokens})
       |   - greatest(pstart, chunk_id * ${packChunkTokens})) as bigint)
       |   AS n_tokens,
       | cast(min(doc_id) as bigint) AS first_doc,
       | cast(max(doc_id) as bigint) AS last_doc
       |FROM spans GROUP BY chunk_id ORDER BY chunk_id""".stripMargin

  /** Draw count for the PPS design — a committed knob like the pack
    * chunk size. */
  val ppsDraws = 100L

  /** PPS SYSTEMATIC sampling (Madow '49; the textbook
    * probability-proportional-to-size design): lay every document's
    * token count end to end on one integer line, then take
    * [[ppsDraws]] equally-spaced grid points — step = T div k, first
    * point at step div 2 (midpoint start: deterministic, no RNG; the
    * classic randomized start is one committed integer here, exactly
    * like every other seeded knob in the registry). A document is
    * drawn once per grid point inside its [pstart, pend) interval, so
    * inclusion is ∝ size and a document longer than the step is drawn
    * MULTIPLE times — the with-replacement-like multiplicity that
    * makes PPS estimators unbiased, reported as n_draws beside the
    * exact expected-draw count in integer micro-units (n_toks·k·10⁶
    * div T). This is the size-weighted twin of the equal-probability
    * `sample_systematic`, and the sampling design behind
    * token-budgeted corpus draws (sample tokens, not documents).
    *
    * Scale shape: prefix sums via [[DistRank.withPrefix]] (two-pass
    * partition-boundary accumulation — NO global window anywhere),
    * the 1-row total broadcast back, and the per-document draw count
    * is pure closed-form integer arithmetic: count of grid points in
    * [a, b) = ((b−1−s) div step) − ((a−1−s) div step), shifted by
    * k·step so every operand is non-negative (Spark `div` and DuckDB
    * `//` truncate toward zero, which equals floor only for
    * non-negative operands — the shift makes the two engines and the
    * math agree). Fully oracle-checked. */
  def ppsSystematic(spark: SparkSession, dir: String): DataFrame = {
    val k = ppsDraws
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    val pre = graft.operators.DistRank.withPrefix(
      toks, Seq(col("doc_id")), col("n_toks"), "sum", "pend")
      .select(col("doc_id"), col("n_toks"),
        (col("pend") - col("n_toks")).as("pstart"), col("pend"))
    val tot = pre.agg(max(col("pend")).as("t"))
    pre.crossJoin(broadcast(tot))
      .withColumn("step", expr(s"t div ${k}L"))
      .withColumn("st", expr("step div 2"))
      .withColumn("n_draws", expr(
        s"((pend - 1 - st + ${k}L * step) div step) - " +
          s"((pstart - 1 - st + ${k}L * step) div step)"))
      .filter(col("n_draws") >= 1)
      .withColumn("expect_micro", expr(s"n_toks * ${k}L * 1000000L div t"))
      .select(col("doc_id"), col("n_toks"), col("n_draws"), col("expect_micro"))
      .orderBy(col("doc_id"))
  }

  val ppsSystematicSql: String =
    s"""WITH toks AS (
       | SELECT doc_id, cast(len(string_split(text, ' ')) as bigint) AS n_toks
       | FROM documents),
       |pre AS (
       | SELECT doc_id, n_toks,
       |  cast(sum(n_toks) OVER (ORDER BY doc_id) - n_toks as bigint) AS pstart,
       |  cast(sum(n_toks) OVER (ORDER BY doc_id) as bigint) AS pend
       | FROM toks),
       |tot AS (SELECT max(pend) AS t FROM pre),
       |j AS (
       | SELECT p.doc_id, p.n_toks, p.pstart, p.pend, t.t,
       |  t.t // ${ppsDraws} AS step, (t.t // ${ppsDraws}) // 2 AS st
       | FROM pre p, tot t)
       |SELECT doc_id, n_toks,
       | cast(((pend - 1 - st + ${ppsDraws} * step) // step) -
       |      ((pstart - 1 - st + ${ppsDraws} * step) // step) as bigint) AS n_draws,
       | cast(n_toks * ${ppsDraws} * 1000000 // t as bigint) AS expect_micro
       |FROM j
       |WHERE ((pend - 1 - st + ${ppsDraws} * step) // step) -
       |      ((pstart - 1 - st + ${ppsDraws} * step) // step) >= 1
       |ORDER BY doc_id""".stripMargin

  /** First-stage cluster draws / second-stage stride — committed
    * design knobs like [[ppsDraws]]. */
  val twoStageDraws = 6L
  val twoStageStride = 5L

  /** TWO-STAGE CLUSTER SAMPLING (Cochran ch. 10; Hansen & Hurwitz
    * '43): the survey design behind "sample sources, then documents
    * within sources" — the only affordable design when visiting a
    * cluster has fixed cost (a crawl host, a shard, an archive).
    * Stage 1 draws [[twoStageDraws]] clusters PPS-systematically on
    * the cluster token-mass line (the [[ppsSystematic]] grid lifted
    * to cluster grain — a big cluster can be drawn twice, the
    * with-replacement multiplicity that keeps Hansen–Hurwitz
    * unbiased); stage 2 takes every [[twoStageStride]]-th document
    * within each drawn cluster by doc_id rank from a deterministic
    * midpoint phase. Each sampled document carries its HH weight in
    * micro-units: d_c · stride · T div (k · S_c) — inverse inclusion
    * under the two stages, all integer.
    *
    * Scale shape: the cluster frame is CATALOG-sized (#sources, never
    * #docs), so its cumulative window over 20 rows is free — the only
    * data-sized passes are the per-doc token count and the stage-2
    * rank within drawn clusters (window partitioned BY CLUSTER). The
    * 1-row total and the drawn-cluster list broadcast. */
  def twoStageCluster(spark: SparkSession, dir: String): DataFrame = {
    val k = twoStageDraws
    val r = twoStageStride
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    val cl = docs.groupBy(col("source"))
      .agg(sum(col("n_toks")).as("s"))
    // prefix sum via DistRank (two-pass boundary accumulation) even on
    // the catalog-sized cluster frame — the registry-wide no-global-
    // window plan law (Round12Spec) holds for every entry, so the
    // cluster count never silently becomes a single-partition sort
    val pre = graft.operators.DistRank.withPrefix(
      cl, Seq(col("source")), col("s"), "sum", "pend")
      .withColumn("pstart", col("pend") - col("s"))
    val tot = pre.agg(max(col("pend")).as("t"))
    val drawn = pre.crossJoin(broadcast(tot))
      .withColumn("step", expr(s"t div ${k}L"))
      .withColumn("st", expr("step div 2"))
      .withColumn("d_c", expr(
        s"((pend - 1 - st + ${k}L * step) div step) - " +
          s"((pstart - 1 - st + ${k}L * step) div step)"))
      .filter(col("d_c") >= 1)
      .select(col("source"), col("s"), col("d_c"), col("t"))
    docs.join(broadcast(drawn), Seq("source"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))).cast("long"))
      .filter(expr(s"(rn - 1) % ${r}L = ${r / 2}L"))
      .withColumn("weight_micro",
        expr(s"d_c * ${r}L * t * 1000000L div (${k}L * s)"))
      .select(col("doc_id"), col("source"), col("n_toks"),
        col("d_c").as("cluster_draws"), col("weight_micro"))
      .orderBy(col("doc_id"))
  }

  val twoStageClusterSql: String = {
    val k = twoStageDraws
    val r = twoStageStride
    s"""WITH docs AS (
       | SELECT doc_id, source,
       |  cast(len(string_split(text, ' ')) as bigint) AS n_toks
       | FROM documents),
       |cl AS (SELECT source, cast(sum(n_toks) as bigint) AS s
       |  FROM docs GROUP BY source),
       |pre AS (SELECT source, s,
       |  cast(sum(s) OVER (ORDER BY source) as bigint) AS pend,
       |  cast(sum(s) OVER (ORDER BY source) - s as bigint) AS pstart
       | FROM cl),
       |tot AS (SELECT max(pend) AS t FROM pre),
       |drawn AS (
       | SELECT p.source, p.s, t.t, t.t // $k AS step, (t.t // $k) // 2 AS st,
       |  ((p.pend - 1 - (t.t // $k) // 2 + $k * (t.t // $k)) // (t.t // $k)) -
       |  ((p.pstart - 1 - (t.t // $k) // 2 + $k * (t.t // $k)) // (t.t // $k))
       |    AS d_c
       | FROM pre p, tot t),
       |ranked AS (
       | SELECT d.doc_id, d.source, d.n_toks, w.d_c, w.s, w.t,
       |  row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) AS rn
       | FROM docs d JOIN drawn w ON w.source = d.source AND w.d_c >= 1)
       |SELECT doc_id, source, n_toks,
       | cast(d_c as bigint) AS cluster_draws,
       | cast(d_c * $r * t * 1000000 // ($k * s) as bigint) AS weight_micro
       |FROM ranked WHERE (rn - 1) % $r = ${r / 2}
       |ORDER BY doc_id""".stripMargin
  }

  /** HANSEN–HURWITZ ESTIMATOR EVAL — the sampling twin of
    * `sim_recall_eval`: a sampling design is only trustworthy if its
    * estimator is MEASURED against ground truth, so this entry runs
    * the estimate and the exact answer side by side. From the
    * [[ppsSystematic]] token-PPS draw, estimate the corpus total of a
    * CORRELATED variable the design never saw — characters — via
    * Ŷ = (1/k) Σ_draws y_i/p_i with p_i = t_i/T (all integer:
    * Σ d_i·chars_i·T div (t_i·k) in micro-units), and report the
    * signed error vs the exact Σ chars in basis points. Size-biased
    * draws + inverse-inclusion weights cancel ⇒ small error; the
    * entry demonstrates (and the spec bounds) exactly that.
    *
    * Scale shape: the draw table is sample-sized; the exact total is
    * ONE aggregation pass; both join as 1-row broadcasts. */
  def htEstimate(spark: SparkSession, dir: String): DataFrame = {
    val k = ppsDraws
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .localCheckpoint(true) // consumed by the draw, the estimate, and the truth
    val pre = graft.operators.DistRank.withPrefix(
      docs, Seq(col("doc_id")), col("n_toks"), "sum", "pend")
      .select(col("doc_id"), col("n_chars"), col("n_toks"),
        (col("pend") - col("n_toks")).as("pstart"), col("pend"))
    val tot = pre.agg(max(col("pend")).as("t"))
    val drawn = pre.crossJoin(broadcast(tot))
      .withColumn("step", expr(s"t div ${k}L"))
      .withColumn("st", expr("step div 2"))
      .withColumn("d", expr(
        s"((pend - 1 - st + ${k}L * step) div step) - " +
          s"((pstart - 1 - st + ${k}L * step) div step)"))
      .filter(col("d") >= 1)
    // per-draw term d·(chars·10⁶ div toks) is SCALE-INVARIANT (a
    // chars-per-token ratio, never corpus-sized), so the one place the
    // corpus total T enters is the final S·T div k — int64-safe until
    // T ≈ 1.8e10 tokens (~70 TB of text); beyond that drop the micro
    // scale (report whole chars) rather than widening to decimal
    val est = drawn.agg(
      sum(expr("d * (n_chars * 1000000L div n_toks)")).as("s"),
      max(col("t")).as("t"),
      count(lit(1)).as("n_sampled"),
      sum(col("d")).as("n_draws"))
    val truth = docs.agg(sum(col("n_chars")).as("exact_chars"))
    est.crossJoin(broadcast(truth))
      .select(col("n_sampled"), col("n_draws"),
        expr(s"s * t div ${k}L").as("estimate_micro"), col("exact_chars"),
        expr(s"(s * t div ${k}L - exact_chars * 1000000L) * 10000L div " +
          "(exact_chars * 1000000L)").as("err_bp"))
  }

  val htEstimateSql: String =
    s"""WITH docs AS (
       | SELECT doc_id, n_chars,
       |  cast(len(string_split(text, ' ')) as bigint) AS n_toks
       | FROM documents),
       |pre AS (
       | SELECT doc_id, n_chars, n_toks,
       |  cast(sum(n_toks) OVER (ORDER BY doc_id) - n_toks as bigint) AS pstart,
       |  cast(sum(n_toks) OVER (ORDER BY doc_id) as bigint) AS pend
       | FROM docs),
       |tot AS (SELECT max(pend) AS t FROM pre),
       |drawn AS (
       | SELECT p.doc_id, p.n_chars, p.n_toks, t.t,
       |  ((p.pend - 1 - (t.t // ${ppsDraws}) // 2 + ${ppsDraws} * (t.t // ${ppsDraws}))
       |    // (t.t // ${ppsDraws})) -
       |  ((p.pstart - 1 - (t.t // ${ppsDraws}) // 2 + ${ppsDraws} * (t.t // ${ppsDraws}))
       |    // (t.t // ${ppsDraws})) AS d
       | FROM pre p, tot t),
       |est AS (
       | SELECT cast(count(*) as bigint) AS n_sampled,
       |  cast(sum(d) as bigint) AS n_draws,
       |  cast(sum(d * (n_chars * 1000000 // n_toks)) as bigint) AS s,
       |  cast(max(t) as bigint) AS t
       | FROM drawn WHERE d >= 1),
       |truth AS (SELECT cast(sum(n_chars) as bigint) AS exact_chars FROM docs)
       |SELECT n_sampled, n_draws,
       | cast(s * t // ${ppsDraws} as bigint) AS estimate_micro, exact_chars,
       | cast((s * t // ${ppsDraws} - exact_chars * 1000000) * 10000 //
       |      (exact_chars * 1000000) as bigint) AS err_bp
       |FROM est, truth""".stripMargin

  /** SOURCE-BALANCED INTERLEAVING — the deterministic epoch ORDER
    * beside `sample_temperature_mix` (which picks the mix) and
    * `pipeline_epoch_shuffle` (which decorrelates): every source's
    * documents are spread EVENLY through the training order (the
    * low-discrepancy stride used for dataset interleaving in training
    * loaders), so a consumer reading any prefix sees each source at
    * its corpus rate — no "all of source A first" curriculum
    * accidents and no RNG. The k-th doc of a source with n docs gets
    * line position (2k−1)·10⁶ div (2n) — the midpoint lattice, exact
    * integers — and the global order is (position, source, doc_id).
    *
    * Scale shape: one per-source rank window (partitioned), the
    * source sizes broadcast, and the global order assigned by
    * [[DistRank.withRowNumber]] (two-pass, no single-partition
    * window). Fully hash-green — every step is integer arithmetic
    * both engines share. */
  def interleaveSources(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("source"))
    val ranked = docs.withColumn("src_rank", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))).cast("long"))
    val sizes = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val keyed = ranked.join(broadcast(sizes), Seq("source"))
      .withColumn("key_micro", expr("(2 * src_rank - 1) * 1000000L div (2 * n_s)"))
    graft.operators.DistRank.withRowNumber(
        keyed, Seq(col("key_micro"), col("source"), col("doc_id")), "pos")
      .select(col("pos"), col("doc_id"), col("source"),
        col("src_rank"), col("key_micro"))
      .orderBy(col("pos"))
  }

  val interleaveSourcesSql: String =
    """WITH ranked AS (
      | SELECT doc_id, source,
      |  cast(row_number() OVER (PARTITION BY source ORDER BY doc_id)
      |    as bigint) AS src_rank
      | FROM documents),
      |sizes AS (SELECT source, cast(count(*) as bigint) AS n_s
      |          FROM documents GROUP BY source),
      |keyed AS (
      | SELECT r.doc_id, r.source, r.src_rank,
      |  (2 * r.src_rank - 1) * 1000000 // (2 * s.n_s) AS key_micro
      | FROM ranked r JOIN sizes s USING (source))
      |SELECT cast(row_number() OVER (ORDER BY key_micro, source, doc_id)
      |  as bigint) AS pos,
      | doc_id, source, src_rank, cast(key_micro as bigint) AS key_micro
      |FROM keyed ORDER BY pos""".stripMargin

  /** LARGEST-REMAINDER QUOTA APPORTIONMENT (Hamilton's method — the
    * apportionment algorithm, applied to the question every data-mix
    * plan ends with: "given per-source weights and a batch budget of
    * B documents, how many does each source get, EXACTLY?"). Floor
    * quotas q_s = B·w_s div W leave r = B − Σq_s seats; the r
    * largest remainders (B·w_s mod W, ties by source) each get one
    * extra. All integer, exactly conserving B — the property
    * proportional rounding by round() cannot give (it drifts by up
    * to sources/2 either way). Weights here are per-source character
    * mass, the same mass [[interleaveSources]] paces by.
    *
    * Scale shape: one groupBy(source), then 20-row arithmetic with
    * a DistRank remainder ranking. */
  def quotaApportionment(spark: SparkSession, dir: String): DataFrame = {
    val budget = 1000L
    val mass = t(spark, dir, "documents")
      .groupBy(col("source")).agg(sum(col("n_chars")).as("w"))
      .localCheckpoint(true) // consumed by total + quotas
    val tot = mass.agg(sum(col("w")).as("tw"))
    val q = mass.crossJoin(broadcast(tot))
      .withColumn("floor_quota", expr(s"$budget * w div tw"))
      .withColumn("remainder", expr(s"($budget * w) % tw"))
    val seats = q.agg((lit(budget) - sum(col("floor_quota"))).as("r"))
    val ranked = graft.operators.DistRank.withRowNumber(
      q, Seq(col("remainder").desc, col("source")), "rk")
    ranked.crossJoin(broadcast(seats))
      .withColumn("extra", (col("rk") <= col("r")).cast("long"))
      .select(col("source"), col("w").as("mass"), col("floor_quota"),
        col("remainder"), col("rk").as("remainder_rank"), col("extra"),
        (col("floor_quota") + col("extra")).as("quota"))
      .orderBy(col("source"))
  }

  val quotaApportionmentSql: String =
    """WITH mass AS (
      | SELECT source, cast(sum(n_chars) as bigint) AS w
      | FROM documents GROUP BY source),
      |tot AS (SELECT cast(sum(w) as bigint) AS tw FROM mass),
      |q AS (
      | SELECT m.source, m.w,
      |  cast(1000 * m.w // t.tw as bigint) AS floor_quota,
      |  cast((1000 * m.w) % t.tw as bigint) AS remainder
      | FROM mass m, tot t),
      |seats AS (
      | SELECT cast(1000 - sum(floor_quota) as bigint) AS r FROM q),
      |ranked AS (
      | SELECT *, cast(row_number() OVER (ORDER BY remainder DESC, source)
      |   as bigint) AS rk
      | FROM q)
      |SELECT ra.source, ra.w AS mass, ra.floor_quota, ra.remainder,
      | ra.rk AS remainder_rank,
      | cast(CASE WHEN ra.rk <= s.r THEN 1 ELSE 0 END as bigint) AS extra,
      | ra.floor_quota + CASE WHEN ra.rk <= s.r THEN 1 ELSE 0 END AS quota
      |FROM ranked ra, seats s
      |ORDER BY ra.source""".stripMargin

  val all: Seq[GQuery] = Seq(
    GQuery("pipeline_quota_apportionment", quotaApportionment,
      Some(quotaApportionmentSql)),
    GQuery("pipeline_interleave_sources", interleaveSources,
      Some(interleaveSourcesSql)),
    GQuery("sample_ht_estimate", htEstimate, Some(htEstimateSql)),
    GQuery("sample_two_stage", twoStageCluster, Some(twoStageClusterSql)),
    GQuery("sample_pps_systematic", ppsSystematic, Some(ppsSystematicSql)),
    GQuery("sample_balanced_classes", balancedClasses, Some(balancedClassesSql)),
    GQuery("pipeline_sequence_pack", sequencePack, Some(sequencePackSql)),
    GQuery("pipeline_epoch_shuffle", epochShuffle, Some(epochShuffleSql)),
    GQuery("sample_dedup_split", dedupAwareSplit, Some(dedupAwareSplitSql)),
    GQuery("sample_systematic", systematicSample, Some(systematicSampleSql)),
    GQuery("sample_neyman", neymanAllocation, Some(neymanAllocationSql)),
    GQuery("sample_group_holdout", groupHoldout, Some(groupHoldoutSql)),
    GQuery("sample_negative", negativeSampling, Some(negativeSamplingSql)),
    GQuery("sample_temporal_split", temporalSplit, Some(temporalSplitSql)),
    GQuery("sample_kfold", kfoldSplit, Some(kfoldSplitSql)),
    GQuery("sample_bootstrap_poisson", bootstrapPoisson, Some(bootstrapPoissonSql)),
    GQuery("sample_hash_deterministic", hashSample, Some(hashSampleSql)),
    GQuery("sample_coreset_fps", coresetFps, Some(coresetFpsSql)),
    GQuery("sample_ab_split", abSplit, Some(abSplitSql)),
    GQuery("sample_stratified", stratifiedSample, Some(stratifiedSampleSql)),
    GQuery("sample_temperature_mix", temperatureMix, Some(temperatureMixSql)),
    GQuery("sample_walk_forward", walkForward, Some(walkForwardSql)),
    GQuery("sample_reservoir_group", reservoirGroup, Some(reservoirGroupSql)),
    GQuery("sample_weighted", weightedSample, Some(weightedSampleSql)),
  )
}
