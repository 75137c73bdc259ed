package graft.operators

import graft.GQuery
import graft.util._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Statistical aggregates, pivot/unpivot reshaping, ordered collection
  * aggregates, the remaining window-function family, and the salted
  * two-stage aggregation pattern for skewed keys — rounding out the
  * relational inventory beyond Relational.scala's q1–q36.
  */
object Analytics {

  /** Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, both linear interpolation over the sorted set —
    * verified bit-equal at 6 decimals). The exact percentile sorts
    * per group; at 100 TB swap in approx_percentile (t-digest) — same
    * call shape, sketch-based, no sort. */
  def q37Percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("med_qty"),
        round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25_price"),
        round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val q37Sql: String =
    """SELECT l_returnflag,
      | round(quantile_cont(l_quantity, 0.5), 6) AS med_qty,
      | round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
      | round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
      | count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Moment-based statistics: stddev/variance/covariance/correlation
    * (both engines use numerically-stable one-pass updates; agreement
    * at 6 decimals verified on the testdata). */
  def q38StatsAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(var_samp(col("l_quantity")), 6).as("var_qty"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"))
      .orderBy(col("l_linestatus"))

  val q38Sql: String =
    """SELECT l_linestatus,
      | round(stddev_samp(l_quantity), 6) AS sd_qty,
      | round(var_samp(l_quantity), 6) AS var_qty,
      | round(covar_samp(l_quantity, l_discount), 6) AS cov_qd,
      | round(corr(l_quantity, l_extendedprice), 6) AS corr_qp
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Pivot: order counts + exact revenue per status, one column per
    * returnflag (explicit pivot values — at scale never let pivot
    * discover values with an extra pass). */
  def q39Pivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("l_linestatus"), col("A").as("n_a"), col("N").as("n_n"), col("R").as("n_r"))
      .orderBy(col("l_linestatus"))

  val q39Sql: String =
    """SELECT l_linestatus,
      | count(*) FILTER (WHERE l_returnflag = 'A') AS n_a,
      | count(*) FILTER (WHERE l_returnflag = 'N') AS n_n,
      | count(*) FILTER (WHERE l_returnflag = 'R') AS n_r
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Unpivot (melt): wide money columns → long (metric, value) rows. */
  def q40Unpivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_orderkey") <= 50)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("quantity"),
        col("l_extendedprice").as("extendedprice"),
        col("l_discount").as("discount"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("quantity"), col("extendedprice"), col("discount")),
        "metric", "val")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))

  val q40Sql: String =
    """SELECT l_orderkey, l_linenumber, metric, val FROM (
      | SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
      | FROM lineitem WHERE l_orderkey <= 50
      | UNION ALL
      | SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
      | FROM lineitem WHERE l_orderkey <= 50
      | UNION ALL
      | SELECT l_orderkey, l_linenumber, 'discount', l_discount
      | FROM lineitem WHERE l_orderkey <= 50)
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin

  /** Ordered collection aggregate: distinct sorted set as a CSV string
    * (collect_set is unordered by contract — sort_array makes the
    * result deterministic under any partitioning). */
  def q41CollectAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
        countDistinct(col("o_orderstatus")).as("n_statuses"))
      .orderBy(col("o_orderpriority"))

  val q41Sql: String =
    """SELECT o_orderpriority,
      | array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
      | count(DISTINCT o_orderstatus) AS n_statuses
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Salted two-stage aggregation — the skew pattern: a hot group key
    * (few event types over millions of rows) first aggregates on
    * (key, salt) spreading each hot key over 8 reducers, then merges
    * partials per key. Same exact result as the direct groupBy (the
    * decimal sums are associative); at 100 TB this is the difference
    * between one straggler reducer and even utilization. */
  def q42SaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val salted = t(spark, dir, "events")
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(8)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast("decimal(22,8)")).as("psum"))
    // round(,4) matches sqlDsum's grid exactly (core.scala dsum): the
    // merged decimal sum is identical in both engines, but the final
    // decimal→double conversion can differ in the last ulp at scale
    salted.groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"),
        round(sum(col("psum")).cast("double"), 4).as("sum_value"))
      .orderBy(col("event_type"))
  }

  val q42Sql: String =
    s"""SELECT event_type, count(*) AS n,
       | ${sqlDsum("value")} AS sum_value
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Window-function family completion: first/last/nth value over the
    * full partition frame, percent_rank and cume_dist (deterministic:
    * unique (price, key) ordering). */
  def q43WindowExtras(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, dir, "orders")
      .filter(col("o_custkey") <= 200)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        first(col("o_totalprice")).over(full).as("cheapest"),
        last(col("o_totalprice")).over(full).as("priciest"),
        nth_value(col("o_totalprice"), 2).over(full).as("second_cheapest"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("o_orderkey"))
  }

  val q43Sql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      | first_value(o_totalprice) OVER wf AS cheapest,
      | last_value(o_totalprice) OVER wf AS priciest,
      | nth_value(o_totalprice, 2) OVER wf AS second_cheapest,
      | round(percent_rank() OVER w, 6) AS pct_rank,
      | round(cume_dist() OVER w, 6) AS cume
      |FROM orders WHERE o_custkey <= 200
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice, o_orderkey),
      |       wf AS (PARTITION BY o_orderpriority
      |              ORDER BY o_totalprice, o_orderkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderkey""".stripMargin

  /** Join-strategy hints: force a sort-merge join where the planner
    * would broadcast (the control a user needs when the "small" side
    * is only small at dev scale — at 100 TB both sides of this join
    * are facts and SMJ on the equi key is the right plan). Result is
    * strategy-independent; the plan shape is spec-asserted. */
  def q44JoinHintSmj(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders").hint("merge")
    val li = t(spark, dir, "lineitem")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("o_orderstatus"))
  }

  val q44Sql: String =
    s"""SELECT o_orderstatus, count(*) AS n_items,
       | ${sqlDsum("l_extendedprice")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** One strategy variant of the q111 join, hint applied to the dim
    * side — public so the spec can assert each hint actually selected
    * its physical join (Broadcast/SortMerge/ShuffledHash). */
  def q111Joined(spark: SparkSession, dir: String, hint: String): DataFrame = {
    val n = t(spark, dir, "nation").hint(hint)
    t(spark, dir, "customer")
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(expr("cast(round(c_acctbal * 100) as bigint)")).as("bal_cents"))
  }

  /** Join-STRATEGY matrix — the full planner-control surface q44
    * samples one point of: the identical customer⋈nation aggregate
    * executed under BROADCAST (dim fits in memory — the 100 TB default
    * for true dims), MERGE (both sides facts: sort-merge on the equi
    * key, spillable), and SHUFFLE_HASH (mid-size build side where
    * sorting is wasted work). Results are strategy-independent — THE
    * correctness property hint surfaces must preserve — so the oracle
    * replays one join three times under the labels; the spec asserts
    * each variant's executed plan carries the requested physical
    * operator (hints change plans, never answers). */
  def q111JoinStrategies(spark: SparkSession, dir: String): DataFrame =
    Seq("broadcast", "merge", "shuffle_hash")
      .map(h => q111Joined(spark, dir, h).withColumn("strategy", lit(h)))
      .reduce(_ unionByName _)
      .orderBy(col("strategy"), col("n_name"))

  val q111Sql: String =
    """WITH agg AS (
      | SELECT n_name, count(*) AS n_cust,
      |  cast(sum(cast(round(c_acctbal * 100) as bigint)) as bigint) AS bal_cents
      | FROM customer JOIN nation ON c_nationkey = n_nationkey
      | GROUP BY n_name)
      |SELECT n_name, n_cust, bal_cents, strategy
      |FROM agg CROSS JOIN (VALUES ('broadcast'), ('merge'), ('shuffle_hash')) s(strategy)
      |ORDER BY strategy, n_name""".stripMargin

  /** NOT IN three-valued-logic matrix — the SQL-semantics trap every
    * engine must honor: `x NOT IN (subquery)` is an ANTI join only
    * while the subquery is null-free; one NULL in the set makes every
    * comparison UNKNOWN and the predicate selects ZERO rows, while the
    * NOT EXISTS spelling stays null-safe. Three variants over the same
    * customers-without-urgent-orders question: a null-free NOT IN
    * (Spark plans a null-aware anti join), the same subquery with one
    * key NULLed via nullif (must return 0), and NOT EXISTS (the
    * null-safe twin — must equal the clean NOT IN). The subquery is
    * dim-bounded, so the null-aware anti join's broadcast is the
    * correct 100 TB plan. */
  def q112NotInNulls(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("q112_customer")
    t(spark, dir, "orders").createOrReplaceTempView("q112_orders")
    spark.sql(
      """WITH urgent AS (
        | SELECT o_custkey FROM q112_orders WHERE o_orderpriority = '1-URGENT'),
        |poisoned AS (
        | SELECT nullif(o_custkey, (SELECT min(o_custkey) FROM urgent)) AS o_custkey
        | FROM urgent)
        |SELECT 'not_exists' AS variant, count(*) AS n_cust,
        |  coalesce(sum(c_custkey), 0) AS sum_keys
        |FROM q112_customer c
        |WHERE NOT EXISTS (SELECT 1 FROM urgent u WHERE u.o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT 'not_in_clean', count(*), coalesce(sum(c_custkey), 0)
        |FROM q112_customer WHERE c_custkey NOT IN (SELECT o_custkey FROM urgent)
        |UNION ALL
        |SELECT 'not_in_nullable', count(*), coalesce(sum(c_custkey), 0)
        |FROM q112_customer WHERE c_custkey NOT IN (SELECT o_custkey FROM poisoned)
        |ORDER BY variant""".stripMargin)
  }

  val q112Sql: String =
    """WITH urgent AS (
      | SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      |poisoned AS (
      | SELECT nullif(o_custkey, (SELECT min(o_custkey) FROM urgent)) AS o_custkey
      | FROM urgent)
      |SELECT 'not_exists' AS variant, cast(count(*) as bigint) AS n_cust,
      | cast(coalesce(sum(c_custkey), 0) as bigint) AS sum_keys
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM urgent u WHERE u.o_custkey = c.c_custkey)
      |UNION ALL
      |SELECT 'not_in_clean', cast(count(*) as bigint),
      | cast(coalesce(sum(c_custkey), 0) as bigint)
      |FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM urgent)
      |UNION ALL
      |SELECT 'not_in_nullable', cast(count(*) as bigint),
      | cast(coalesce(sum(c_custkey), 0) as bigint)
      |FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM poisoned)
      |ORDER BY variant""".stripMargin

  /** Relational DIVISION (the "for all" query Codd's algebra names ÷):
    * customers whose order history covers EVERY priority class present
    * in the fact table, reported per market segment. The classic
    * scalable plan — no division operator exists in any engine — is
    * distinct(custkey, priority) → per-customer coverage count →
    * compare against the (broadcast scalar) total class count: two
    * key-partitioned aggregations and one broadcast, never a
    * cross/anti cascade. Coverage counting survives 100 TB because the
    * distinct pre-aggregation collapses the fact table to
    * |customers|·|classes| before anything else runs. */
  def q113Division(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val nClasses = orders.agg(
      countDistinct(col("o_orderpriority")).as("n_classes"))
    val coverage = orders
      .select(col("o_custkey"), col("o_orderpriority")).distinct()
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_cov"))
      .crossJoin(broadcast(nClasses))
      .filter(col("n_cov") === col("n_classes"))
    t(spark, dir, "customer")
      .join(coverage, col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).cast("long").as("n_full_coverage"),
        sum(col("c_custkey")).cast("long").as("sum_keys"))
      .orderBy(col("seg"))
  }

  val q113Sql: String =
    """WITH cov AS (
      | SELECT o_custkey, count(*) AS n_cov
      | FROM (SELECT DISTINCT o_custkey, o_orderpriority FROM orders)
      | GROUP BY o_custkey),
      |full_cov AS (
      | SELECT o_custkey FROM cov
      | WHERE n_cov = (SELECT count(DISTINCT o_orderpriority) FROM orders))
      |SELECT c_mktsegment AS seg, cast(count(*) as bigint) AS n_full_coverage,
      | cast(sum(c_custkey) as bigint) AS sum_keys
      |FROM customer JOIN full_cov ON c_custkey = o_custkey
      |GROUP BY 1 ORDER BY seg""".stripMargin

  /** SQL surface: chained CTEs + a LATERAL VIEW explode (the UDTF
    * position) over the pure-SQL entry point. */
  def q45SqlCte(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "documents").createOrReplaceTempView("documents_cte")
    spark.sql(
      """WITH toks AS (
        | SELECT doc_id, tok
        | FROM documents_cte LATERAL VIEW explode(split(text, ' ')) AS tok),
        |counts AS (
        | SELECT doc_id, count(*) AS n_toks, count(DISTINCT tok) AS n_uniq
        | FROM toks GROUP BY doc_id)
        |SELECT doc_id, n_toks, n_uniq FROM counts ORDER BY doc_id""".stripMargin)
  }

  val q45Sql: String =
    """WITH toks AS (
      | SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |counts AS (
      | SELECT doc_id, count(*) AS n_toks, count(DISTINCT tok) AS n_uniq
      | FROM toks GROUP BY doc_id)
      |SELECT doc_id, n_toks, n_uniq FROM counts ORDER BY doc_id""".stripMargin

  /** approx_percentile (t-digest-style sketch) — the 100 TB percentile
    * path (no per-group sort). Sketches differ per engine, but the
    * estimate is deterministic given the build → estimate-sidecar
    * discipline: dump (flag, estimate), DuckDB recomputes the exact
    * group counts and joins ⇒ hash-checked; the spec additionally
    * bounds the estimate's error against the exact percentile. */
  def q46ApproxPercentile(spark: SparkSession, dir: String): DataFrame = {
    // MATERIALIZE the estimate ONCE: approx_percentile merges partial
    // QuantileSummaries in shuffle-fetch order, which is NOT
    // deterministic across executions — the estimate-sidecar premise
    // ("deterministic given the build") holds for HLL/KMV/CMS but not
    // the GK sketch, so dumping the sidecar from one execution and
    // returning a second would hash-mismatch intermittently. One
    // bounded collect (|returnflag| rows) feeds both.
    val est = materializeLocal(t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_median"),
        count(lit(1)).as("n")))
    oracleSidecar("q46_estimates",
      est.select(col("l_returnflag"), col("approx_median")))
    est.orderBy(col("l_returnflag"))
  }

  val q46Sql: String =
    s"""WITH est AS (
       | SELECT l_returnflag, approx_median
       | FROM read_parquet('${oracleSidecarGlob("q46_estimates")}')),
       |ex AS (
       | SELECT l_returnflag, count(*) AS n
       | FROM lineitem GROUP BY 1)
       |SELECT e.l_returnflag, s.approx_median, cast(e.n as bigint) AS n
       |FROM ex e JOIN est s USING (l_returnflag)
       |ORDER BY e.l_returnflag""".stripMargin

  /** Dedicated array-function family: construction, set algebra,
    * sorting, slicing, membership — over per-priority order-status
    * arrays (built deterministically with sort_array ∘ collect_set). */
  def q47ArrayFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(sort_array(collect_set(col("o_orderstatus"))).as("statuses"))
      .select(col("o_orderpriority"),
        size(col("statuses")).cast("long").as("n"),
        array_contains(col("statuses"), "F").as("has_f"),
        element_at(col("statuses"), 1).as("first_status"),
        array_join(slice(col("statuses"), 1, 2), ",").as("first_two"),
        array_join(array_intersect(col("statuses"), array(lit("F"), lit("O"))), ",").as("fo_only"),
        array_join(array_union(col("statuses"), array(lit("X"))), ",").as("with_x"),
        array_join(array_remove(col("statuses"), "P"), ",").as("no_p"),
        array_join(reverse(col("statuses")), ",").as("rev"))
      .orderBy(col("o_orderpriority"))

  val q47Sql: String =
    """WITH s AS (
      | SELECT o_orderpriority,
      |  list_sort(list_distinct(list(o_orderstatus))) AS statuses
      | FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority,
      | cast(len(statuses) as bigint) AS n,
      | list_contains(statuses, 'F') AS has_f,
      | statuses[1] AS first_status,
      | array_to_string(statuses[1:2], ',') AS first_two,
      | array_to_string(list_filter(statuses, x -> x IN ('F','O')), ',') AS fo_only,
      | array_to_string(list_concat(statuses,
      |   list_filter(['X'], x -> NOT list_contains(statuses, x))), ',') AS with_x,
      | array_to_string(list_filter(statuses, x -> x <> 'P'), ',') AS no_p,
      | array_to_string(list_reverse(statuses), ',') AS rev
      |FROM s ORDER BY o_orderpriority""".stripMargin

  /** Struct construction + JSON serialization round-trip: named_struct
    * → to_json → get back a field — the schema-evolution shape of a
    * multimodal metadata column. */
  def q48StructJson(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .filter(col("c_custkey") <= 200)
      .withColumn("meta", struct(
        col("c_name").as("name"),
        col("c_mktsegment").as("segment"),
        col("c_acctbal").as("balance")))
      .select(col("c_custkey"),
        col("meta.segment").as("segment"),
        to_json(col("meta")).as("meta_json"),
        get_json_object(to_json(col("meta")), "$.name").as("name_back"))
      .orderBy(col("c_custkey"))

  val q48Sql: String =
    """SELECT c_custkey, c_mktsegment AS segment,
      | concat('{"name":"', c_name, '","segment":"', c_mktsegment,
      |        '","balance":', c_acctbal::VARCHAR, '}') AS meta_json,
      | c_name AS name_back
      |FROM customer WHERE c_custkey <= 200
      |ORDER BY c_custkey""".stripMargin

  /** Salted shuffle JOIN — the skew pattern for joins (the join twin
    * of `q42_salted_agg`): when the probe side has hot keys and the
    * build side is too big to broadcast, salt the probe key over k
    * buckets and REPLICATE each build row k times (explode over the
    * salt range), joining on (key, salt) — each hot key's rows spread
    * over k reducers instead of one straggler. Result is identical to
    * the plain join (each probe row matches its build row at exactly
    * its own salt); the oracle is the plain join. AQE's skew-join
    * split handles moderate skew adaptively; explicit salting is the
    * deterministic version for pipelines that cannot rely on runtime
    * stats. */
  def q49SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val k = 8
    val ev = t(spark, dir, "events")
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(k)))
    val dim = t(spark, dir, "customer")
      .filter(col("c_custkey") < 500)
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("salt", explode(sequence(lit(0L), lit(k - 1L))))
    ev.join(dim, ev("user_id") === dim("c_custkey") && ev("salt") === dim("salt"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  val q49Sql: String =
    s"""SELECT c_mktsegment, event_type, count(*) AS n,
       | ${sqlDsum("value")} AS sum_value
       |FROM events JOIN customer ON user_id = c_custkey
       |WHERE c_custkey < 500
       |GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""".stripMargin

  /** Positional generator (posexplode): each part expands to its first
    * min(p_size, 5) price steps with an explicit 1-based position —
    * the generator+ordinality pattern (DuckDB twin: zipped unnest over
    * the same list). Generate runs inside WholeStageCodegen with no
    * shuffle; output is bounded at 5× input by construction, the
    * discipline any 100 TB explode needs. */
  def q63Posexplode(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(col("p_partkey"), col("p_retailprice"),
        posexplode(sequence(lit(1), least(col("p_size"), lit(5)))))
      .select(col("p_partkey"), (col("pos") + 1).as("pos"),
        (col("p_retailprice") * col("col")).as("step_price"))
      .orderBy(col("p_partkey"), col("pos"))

  val q63Sql: String =
    """SELECT p_partkey,
      | unnest(range(1, least(p_size, 5) + 1)) AS pos,
      | p_retailprice * unnest(range(1, least(p_size, 5) + 1)) AS step_price
      |FROM part ORDER BY p_partkey, pos""".stripMargin

  /** Time-series gap fill: a per-user daily spine (date sequence from
    * the corpus bounds) left-joined to daily activity, with zero-fill
    * and a forward-filled last-observation column (`last(...,
    * ignoreNulls)` over an ordered window — IGNORE NULLS in the DuckDB
    * twin). The spine is users × days (generated, never shuffled
    * wide); the fill is one window pass partitioned by user — at
    * 100 TB both scale with the user count, and the sequence() spine
    * costs no scan at all. */
  /** MULTI-TOUCH ATTRIBUTION — the marketing-analytics primitive over
    * the event stream: every `purchase` (conversion) credits the
    * user's PRECEDING non-purchase touches under three standard
    * models in one pass over the same conversion×touch relation —
    * first-touch (earliest touch takes the credit), last-touch
    * (latest), and linear (each of the n touches gets 1/n, held as
    * exact integer micro-credits `1000000 div n` so both engines
    * agree bit-for-bit; floor division makes per-conversion credit
    * ≤ 1e6 — the standard integral-credit trick). "Preceding" is the
    * strict (ts, event_id) total order, so equal-timestamp events
    * resolve deterministically. The conversion×touch join is keyed on
    * user_id — per-user work is touches × conversions of THAT user,
    * never cross-user; the two credit picks are per-conversion top-1
    * windows (answer-sized). Fully oracle-checked. */
  def q82Attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("conv_id"), col("us").as("cus"))
    val touch = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_type").as("touch_type"),
        col("event_id").as("touch_id"), col("us").as("tus"))
    // localCheckpoint: three attribution models (first/last/linear)
    // each re-reference this join — without the barrier the
    // conv ⋈ touch join executes three times per run (the r12
    // double-execution class, caught by the Round13Spec plan gate).
    // Materialized once, the three models are window/agg passes over
    // the pair table (pairs are per-user bounded, scan-sized).
    val joined = conv.join(touch, Seq("user_id"))
      .filter(col("tus") < col("cus") ||
        (col("tus") === col("cus") && col("touch_id") < col("conv_id")))
      .select(col("conv_id"), col("touch_type"), col("touch_id"), col("tus"))
      .localCheckpoint(true)
    val wF = Window.partitionBy(col("conv_id")).orderBy(col("tus"), col("touch_id"))
    val wL = Window.partitionBy(col("conv_id")).orderBy(col("tus").desc, col("touch_id").desc)
    val wN = Window.partitionBy(col("conv_id"))
    val first = joined.withColumn("rn", row_number().over(wF)).filter(col("rn") === 1)
      .groupBy(col("touch_type")).agg(count(lit(1)).as("first_touch"))
    val last = joined.withColumn("rn", row_number().over(wL)).filter(col("rn") === 1)
      .groupBy(col("touch_type")).agg(count(lit(1)).as("last_touch"))
    val linear = joined.withColumn("n", count(lit(1)).over(wN))
      .groupBy(col("touch_type"))
      .agg(sum(expr("1000000 div n")).cast("long").as("linear_micro"))
    first.join(last, Seq("touch_type"), "full_outer")
      .join(linear, Seq("touch_type"), "full_outer")
      .select(col("touch_type"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"),
        coalesce(col("linear_micro"), lit(0L)).as("linear_micro"))
      .orderBy(col("touch_type"))
  }

  val q82Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events),
      |conv AS (
      |  SELECT user_id, event_id AS conv_id, us AS cus
      |  FROM ev WHERE event_type = 'purchase'),
      |touch AS (
      |  SELECT user_id, event_type AS touch_type, event_id AS touch_id, us AS tus
      |  FROM ev WHERE event_type <> 'purchase'),
      |joined AS (
      |  SELECT conv_id, touch_type, touch_id, tus
      |  FROM conv JOIN touch USING (user_id)
      |  WHERE tus < cus OR (tus = cus AND touch_id < conv_id)),
      |firsts AS (
      |  SELECT touch_type, count(*) AS first_touch FROM (
      |    SELECT *, row_number() OVER (PARTITION BY conv_id
      |      ORDER BY tus, touch_id) AS rn FROM joined)
      |  WHERE rn = 1 GROUP BY 1),
      |lasts AS (
      |  SELECT touch_type, count(*) AS last_touch FROM (
      |    SELECT *, row_number() OVER (PARTITION BY conv_id
      |      ORDER BY tus DESC, touch_id DESC) AS rn FROM joined)
      |  WHERE rn = 1 GROUP BY 1),
      |lin AS (
      |  SELECT touch_type, cast(sum(1000000 // n) as bigint) AS linear_micro FROM (
      |    SELECT touch_type, count(*) OVER (PARTITION BY conv_id) AS n FROM joined)
      |  GROUP BY 1)
      |SELECT touch_type,
      |  coalesce(first_touch, 0) AS first_touch,
      |  coalesce(last_touch, 0) AS last_touch,
      |  coalesce(linear_micro, 0) AS linear_micro
      |FROM firsts FULL JOIN lasts USING (touch_type) FULL JOIN lin USING (touch_type)
      |ORDER BY touch_type""".stripMargin

  /** TIME-WEIGHTED average — the aggregate time-series stores treat as
    * primitive and plain AVG silently gets wrong on irregular samples:
    * a reading "holds" until the next one, so it weighs by its HOLD
    * DURATION, not its sample count (a sensor emitting 100 readings in
    * one quiet minute must not dominate the hour it was silent for).
    * Per user: interval = lead(ts) − ts under the (ts, event_id) total
    * order — one window pass, one shuffle on user_id; the last reading
    * has no successor and drops out (the standard left-closed
    * formulation). value·µs products accumulate in exact decimal
    * (partition-order independence), the final division is one double
    * op on bit-identical inputs ⇒ fully oracle-checked. */
  def q81TimeWeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("us"))
      .withColumn("dur_us", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("dur_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur_us")).as("span_us"),
        sum(col("value").cast("decimal(22,8)") * col("dur_us")).as("vw"))
      .select(col("user_id"), col("n_intervals"), col("span_us"),
        round(col("vw").cast("double") / col("span_us"), 6).as("twa"))
      .orderBy(col("user_id"))
  }

  val q81Sql: String =
    """WITH iv AS (
      | SELECT user_id, value,
      |  lead(epoch_us(ts)) OVER (PARTITION BY user_id
      |    ORDER BY epoch_us(ts), event_id) - epoch_us(ts) AS dur_us
      | FROM events)
      |SELECT user_id,
      | count(*) AS n_intervals,
      | cast(sum(dur_us) as bigint) AS span_us,
      | round(cast(sum(cast(value as decimal(22,8)) * dur_us) as double)
      |   / cast(sum(dur_us) as bigint), 6) AS twa
      |FROM iv WHERE dur_us IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  def q64GapFill(spark: SparkSession, dir: String): DataFrame = {
    // `day` stays a TIMESTAMP (date_trunc) on both sides: a DATE
    // column stringifies differently in the two engines' compare path
    val ev = t(spark, dir, "events").filter(col("user_id") % 20 === 0)
    val bounds = ev.agg(date_trunc("day", min(col("ts"))).as("d0"),
      date_trunc("day", max(col("ts"))).as("d1"))
    val spine = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val daily = ev.groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("n_events"), ignoreNulls = true).over(w).as("last_seen"))
      .orderBy(col("user_id"), col("day"))
  }

  val q64Sql: String =
    """WITH ev AS (SELECT * FROM events WHERE user_id % 20 = 0),
      |bounds AS (SELECT date_trunc('day', min(cast(ts AS timestamp))) AS d0,
      |                  date_trunc('day', max(cast(ts AS timestamp))) AS d1 FROM ev),
      |spine AS (
      |  SELECT u.user_id,
      |   unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS day
      |  FROM (SELECT DISTINCT user_id FROM ev) u, bounds b),
      |daily AS (
      |  SELECT user_id, date_trunc('day', cast(ts AS timestamp)) AS day,
      |         count(*) AS n_events
      |  FROM ev GROUP BY 1, 2)
      |SELECT s.user_id, s.day,
      |  coalesce(d.n_events, 0) AS n_events,
      |  last_value(d.n_events IGNORE NULLS)
      |    OVER (PARTITION BY s.user_id ORDER BY s.day) AS last_seen
      |FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
      |ORDER BY s.user_id, s.day""".stripMargin

  /** Z-score outlier detection per event_type — the standard
    * streaming-ingest QA gate, computed with the exact-decimal-sum
    * discipline: n, Σx, Σx² accumulate as decimals (partition-order
    * independent), and mean/σ/z are derived in double from those exact
    * inputs with an expression tree mirrored in the oracle, so both
    * engines produce bit-identical z. One aggregate + one broadcast
    * rejoin; nothing quadratic, no second scan for the variance. */
  def q65ZscoreAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ev = t(spark, dir, "events")
    val stats = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("value").cast(DecimalType(22, 8))).as("s1"),
      sum((col("value") * col("value")).cast(DecimalType(22, 8))).as("s2"))
    val s1d = col("s1").cast("double")
    val s2d = col("s2").cast("double")
    ev.join(broadcast(stats), Seq("event_type"))
      .withColumn("z",
        (col("value") - s1d / col("n")) /
          sqrt((s2d - s1d * s1d / col("n")) / (col("n") - 1)))
      .filter(abs(col("z")) > 3)
      .select(col("event_id"), col("event_type"), round(col("z"), 2).as("z"))
      .orderBy(col("event_id"))
  }

  val q65Sql: String =
    """WITH stats AS (
      |  SELECT event_type, count(*) AS n,
      |         sum(cast(value AS decimal(22,8))) AS s1,
      |         sum(cast(value * value AS decimal(22,8))) AS s2
      |  FROM events GROUP BY event_type)
      |SELECT e.event_id, e.event_type,
      |  round((e.value - cast(s.s1 AS double) / s.n) /
      |    sqrt((cast(s.s2 AS double) - cast(s.s1 AS double) * cast(s.s1 AS double) / s.n)
      |         / (s.n - 1)), 2) AS z
      |FROM events e JOIN stats s ON e.event_type = s.event_type
      |WHERE abs((e.value - cast(s.s1 AS double) / s.n) /
      |      sqrt((cast(s.s2 AS double) - cast(s.s1 AS double) * cast(s.s1 AS double) / s.n)
      |           / (s.n - 1))) > 3
      |ORDER BY e.event_id""".stripMargin

  /** Gap-based sessionization via the SECONDARY-SORT pattern:
    * `repartition(user_id)` + `sortWithinPartitions(user_id, ts)` +
    * a single-pass typed `mapPartitions` with O(1) state per partition
    * — the physical shape (one shuffle, one partition-local sort,
    * streaming iterator, zero per-key buffering) that handles a user
    * whose history exceeds executor memory, where a
    * `collect_list`-per-user approach would OOM. Same semantics as
    * the built-in `session_window` twin (`ks_session_window`, ≥ 30 min
    * gap starts a new session — spec-asserted equal); this entry adds
    * session_end. Event times are compared as epoch micros (exact
    * integer arithmetic), so the oracle's interval algebra agrees
    * bit-for-bit. */
  def q66SessionizeScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gapUs = 30L * 60 * 1000000
    val sessions = t(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long)]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"))
      .mapPartitions { it =>
        // streaming fold: emit a session when the user changes or the
        // gap reaches 30 min; O(1) state, never materializes a user
        new Iterator[(Long, Long, Long, Long)] {
          private var cur: Option[(Long, Long, Long, Long)] = None // uid, start, end, n
          private var pending: Option[(Long, Long, Long, Long)] = None
          private def advance(): Unit = {
            while (pending.isEmpty && it.hasNext) {
              val (uid, ts) = it.next()
              cur match {
                case Some((u, s, e, n)) if u == uid && ts - e < gapUs =>
                  cur = Some((u, s, ts, n + 1))
                case Some(done) =>
                  pending = Some(done); cur = Some((uid, ts, ts, 1L))
                case None =>
                  cur = Some((uid, ts, ts, 1L))
              }
            }
            if (pending.isEmpty && !it.hasNext && cur.isDefined) {
              pending = cur; cur = None
            }
          }
          override def hasNext: Boolean = { advance(); pending.isDefined }
          override def next(): (Long, Long, Long, Long) = {
            advance(); val r = pending.get; pending = None; r
          }
        }
      }
      .toDF("user_id", "start_us", "end_us", "n_events")
    sessions.select(col("user_id"),
      timestamp_micros(col("start_us")).as("session_start"),
      timestamp_micros(col("end_us")).as("session_end"),
      col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
  }

  val q66Sql: String =
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
      |SELECT user_id,
      | date_trunc('microseconds', min(ts)) AS session_start,
      | date_trunc('microseconds', max(ts)) AS session_end,
      | count(*) AS n_events
      |FROM sessions GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Mode + median per group. Spark's built-in `mode()` is
    * tie-nondeterministic, so the mode here is the count+rank
    * formulation with an explicit (count desc, value asc) tie-break —
    * the only way a distributed mode can be hash-compared against
    * another engine. Median is the built-in (both engines interpolate
    * the midpoint of the sorted set — same family as the q37
    * percentile equivalence). */
  def q67ModeMedian(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val counts = li.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("cnt").desc, col("l_quantity"))
    val mode = counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
        col("cnt").as("mode_n"))
    val med = li.groupBy(col("l_returnflag"))
      .agg(round(median(col("l_quantity")), 6).as("median_qty"))
    mode.join(med, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("mode_qty"), col("mode_n"), col("median_qty"))
      .orderBy(col("l_returnflag"))
  }

  val q67Sql: String =
    """WITH c AS (
      |  SELECT l_returnflag, l_quantity, count(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |m AS (
      |  SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_n FROM (
      |    SELECT *, row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY cnt DESC, l_quantity) AS rk FROM c)
      |  WHERE rk = 1),
      |med AS (
      |  SELECT l_returnflag, round(median(l_quantity), 6) AS median_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, mode_qty, mode_n, median_qty
      |FROM m JOIN med USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  /** Multiset set operations — INTERSECT ALL / EXCEPT ALL (bag
    * semantics: multiplicities min / subtract, not the dedup of q21's
    * INTERSECT / q22's EXCEPT). Spark plans both as a single hash
    * aggregation over a union with per-side counts — no join, one
    * shuffle on the value. Per-key result counts make the bag
    * multiplicities directly hash-checkable. */
  def q69SetopsAll(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val u = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val inter = f.intersectAll(u).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_common"))
    val exc = f.exceptAll(u).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_only_f"))
    inter.join(exc, Seq("o_custkey"), "full")
      .select(col("o_custkey"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("n_only_f"), lit(0L)).as("n_only_f"))
      .orderBy(col("o_custkey"))
  }

  val q69Sql: String =
    """WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
      |u AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      |i AS (SELECT o_custkey, count(*) AS n_common
      |      FROM (SELECT * FROM f INTERSECT ALL SELECT * FROM u) GROUP BY 1),
      |e AS (SELECT o_custkey, count(*) AS n_only_f
      |      FROM (SELECT * FROM f EXCEPT ALL SELECT * FROM u) GROUP BY 1)
      |SELECT o_custkey,
      |       coalesce(n_common, 0) AS n_common,
      |       coalesce(n_only_f, 0) AS n_only_f
      |FROM i FULL JOIN e USING (o_custkey)
      |ORDER BY o_custkey""".stripMargin

  /** Ordered conversion funnel (view -> click -> purchase) by min-ts
    * chaining: the user's first view, their first click STRICTLY after
    * that view, their first purchase strictly after that click — the
    * product-analytics "did they progress, and when" query.
    *
    * Shape: three user-keyed hash aggregations chained by equi-joins —
    * every stage shuffles on `user_id` only (events-linear, and AQE
    * reuses the exchange across the v→c→p chain), with NO window over
    * the event log and no per-user event materialization, so the plan
    * is identical at 100 TB: each funnel stage is one partial-agg
    * (map-side min) + one shuffle. Timestamps are compared as epoch
    * MICROS (integer floor of the source nanos, `util.t`'s conversion)
    * so both engines run the same integer arithmetic; depth is the
    * reached-stage count. */
  def q74FunnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") > col("v_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("c_us"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") > col("c_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        timestamp_micros(col("v_us")).as("view_ts"),
        timestamp_micros(col("c_us")).as("click_ts"),
        timestamp_micros(col("p_us")).as("purchase_ts"),
        (lit(1L) + when(col("c_us").isNotNull, 1L).otherwise(0L)
          + when(col("p_us").isNotNull, 1L).otherwise(0L)).as("depth"))
      .orderBy(col("user_id"))
  }

  val q74Sql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
      |v AS (SELECT user_id, min(us) AS v_us FROM e WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.us) AS c_us FROM e JOIN v USING (user_id)
      |      WHERE e.event_type = 'click' AND e.us > v.v_us GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.us) AS p_us FROM e JOIN c USING (user_id)
      |      WHERE e.event_type = 'purchase' AND e.us > c.c_us GROUP BY 1)
      |SELECT v.user_id,
      | make_timestamp(v_us) AS view_ts,
      | make_timestamp(c_us) AS click_ts,
      | make_timestamp(p_us) AS purchase_ts,
      | cast(1 + (CASE WHEN c_us IS NULL THEN 0 ELSE 1 END)
      |        + (CASE WHEN p_us IS NULL THEN 0 ELSE 1 END) AS bigint) AS depth
      |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** Weekly retention cohorts: users grouped by the week of their
    * first event, counted as active in each later week they appear.
    * Weeks are INTEGRAL — epoch-micros div (7 days of micros) — so
    * cohort assignment and offsets are pure BIGINT floor division in
    * both engines (no calendar/week-of-year semantics to disagree on).
    *
    * Shape: one user-keyed min-agg (the cohort), one user-week
    * distinct (events-linear), one equi-join back on `user_id`, then a
    * (cohort, offset)-keyed count-distinct. At 100 TB each step is a
    * single hash shuffle on a narrow key; the count-distinct's state
    * is (cohorts x offsets x users-per-cell) — the same cells the
    * answer itself has — and would move to HLL (`meta_hll_sketches`'s
    * estimator) if exactness were negotiable. */
  def q75RetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val uw = t(spark, dir, "events")
      .select(col("user_id"),
        (unix_micros(col("ts")) / weekUs).cast("long").as("week"))
      .distinct()
    val cohort = uw.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    uw.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val q75Sql: String =
    """WITH uw AS (
      | SELECT DISTINCT user_id, (epoch_ns(ts) // 1000) // 604800000000 AS week
      | FROM events),
      |cohort AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1)
      |SELECT c.cohort_week, u.week - c.cohort_week AS week_offset,
      |       cast(count(DISTINCT u.user_id) AS bigint) AS active_users
      |FROM uw u JOIN cohort c USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Sketch size for the retention twin: σ ≈ 1/√(k−2) ≈ 4.4 % — the
    * spec bounds per-cell error at 3σ (plus a small-count floor). */
  val retentionSketchK = 512

  /** [[q75RetentionCohorts]] re-based on the engine's own MERGEABLE
    * KMV sketches (`meta_hll_sketches`' discipline): the per-cell
    * distinct-user count comes from a bottom-k theta sketch instead of
    * an exact count-distinct. Same two shuffles; what changes is the
    * aggregation STATE — ≤ k hashes per (cohort, offset) cell instead
    * of every distinct user id — which is the 100 TB trade: exact
    * count-distinct state is cell-cardinality-sized and skew-fragile,
    * sketch state is fixed-size, partial-aggregable, and the stored
    * sketch TABLE rolls up to any coarser grouping by lossless union
    * without rescanning events (spec-asserted: unioning a cohort's
    * cell sketches re-estimates the cohort size — identical to the
    * offset-0 cell — within the same bound). Cells under k are EXACT
    * (θ = 1); estimation begins only where exactness would cost.
    * Hashing is engine-specific but the estimates are deterministic
    * given the build (KMV is an exact bottom-k set, merge-order
    * independent) → estimate-sidecar discipline: DuckDB recomputes
    * the exact per-cell counts (q75's own aggregation — the referee
    * column) and joins the dumped estimates ⇒ hash-green; the spec
    * keeps the 3σ error bound. */
  def q75bRetentionSketch(spark: SparkSession, dir: String): DataFrame = {
    val est = retentionCellSketches(spark, dir)
      .select(col("cohort_week"), col("week_offset"),
        round(graft.functions.KmvSketch.kmvEstimate(col("sk")))
          .cast("long").as("est_users"))
    oracleSidecar("q75b_estimates", est)
    est.join(
        q75RetentionCohorts(spark, dir)
          .select(col("cohort_week"), col("week_offset"),
            col("active_users").as("exact_users")),
        Seq("cohort_week", "week_offset"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val q75bSql: String =
    s"""WITH est AS (
       | SELECT cohort_week, week_offset, est_users
       | FROM read_parquet('${oracleSidecarGlob("q75b_estimates")}')),
       |uw AS (
       | SELECT DISTINCT user_id, (epoch_ns(ts) // 1000) // 604800000000 AS week
       | FROM events),
       |cohort AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1),
       |ex AS (
       | SELECT c.cohort_week, u.week - c.cohort_week AS week_offset,
       |  cast(count(DISTINCT u.user_id) AS bigint) AS exact_users
       | FROM uw u JOIN cohort c USING (user_id)
       | GROUP BY 1, 2)
       |SELECT e.cohort_week, e.week_offset,
       | cast(s.est_users as bigint) AS est_users, e.exact_users
       |FROM ex e JOIN est s USING (cohort_week, week_offset)
       |ORDER BY e.cohort_week, e.week_offset""".stripMargin

  /** The stored sketch table behind [[q75bRetentionSketch]] — exposed
    * so the spec can union cells into cohort rollups. */
  private[graft] def retentionCellSketches(spark: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val uw = t(spark, dir, "events")
      .select(col("user_id"),
        (unix_micros(col("ts")) / weekUs).cast("long").as("week"))
      .distinct()
    val cohort = uw.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    uw.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(graft.functions.KmvSketch
        .kmvSketch(col("user_id"), retentionSketchK).as("sk"))
  }

  /** Skyline (Pareto frontier): parts no other part beats on BOTH
    * price (lower-is-better) and size (higher-is-better), with at
    * least one strict. The naive formulation is the quadratic
    * NOT-EXISTS self-join (the oracle); the engine's plan is the
    * sorted 2-D sweep — one sort by price, keep a row iff its size
    * strictly exceeds the running max over all strictly-cheaper rows —
    * O(n log n), a single exchange. Before the sort, a bucket
    * pre-prune runs: per integer-dollar price bucket, max size; the
    * strictly-lower-bucket running max (a ~100-row relation)
    * broadcasts, and any row at-or-under that bound is provably
    * dominated by some strictly cheaper row and never reaches the
    * global sort. At 100 TB the prune is the pass that matters: the
    * full scan reduces map-side to near the frontier size, so the
    * sort exchange carries a sliver. Correctness of pruning: every
    * pruned row has a strictly-cheaper dominator; chains of such
    * dominators strictly decrease price, so they terminate at an
    * UNdominated dominator, which is never pruned — the sweep over
    * survivors therefore sees a dominator for every dominated
    * survivor, and frontier rows are never pruned. Prices compared in
    * exact integer cents in both engines. */
  def q83Skyline(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
      .select(col("p_partkey"), col("p_size"),
        round(col("p_retailprice") * 100).cast("long").as("price_cents"))
    val withBk = p.withColumn("bk", (col("price_cents") / 100L).cast("long"))
    // prefix maxes via DistRank.withPrefix — these frames are domain-
    // bounded (≤ ~1.2k buckets / ≤ ~120k distinct cent prices) but the
    // partition-less window still serializes them through one task;
    // the distributed prefix keeps the sweep parallel at any domain.
    val bounds = DistRank.withPrefix(
        withBk.groupBy(col("bk")).agg(max(col("p_size")).as("bmax")),
        Seq(col("bk")), col("bmax"), "max", "lb", inclusive = false)
      .select(col("bk"), col("lb"))
    val pruned = withBk.join(broadcast(bounds), Seq("bk"))
      .filter(col("lb").isNull || col("p_size") > col("lb"))
    val grp = DistRank.withPrefix(
      pruned.groupBy(col("price_cents")).agg(max(col("p_size")).as("gmax")),
      Seq(col("price_cents")), col("gmax"), "max", "prevmax",
      inclusive = false)
    pruned.join(grp, Seq("price_cents"))
      .filter((col("prevmax").isNull || col("p_size") > col("prevmax")) &&
        col("gmax") <= col("p_size"))
      .select(col("p_partkey"), col("price_cents"), col("p_size"))
      .orderBy(col("price_cents"), col("p_partkey"))
  }

  val q83Sql: String =
    """SELECT p_partkey,
      | cast(round(p_retailprice * 100) as bigint) AS price_cents, p_size
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE cast(round(q.p_retailprice * 100) as bigint)
      |          <= cast(round(p.p_retailprice * 100) as bigint)
      |    AND q.p_size >= p.p_size
      |    AND (cast(round(q.p_retailprice * 100) as bigint)
      |           < cast(round(p.p_retailprice * 100) as bigint)
      |         OR q.p_size > p.p_size))
      |ORDER BY price_cents, p_partkey""".stripMargin

  /** Incremental view maintenance of a JOIN view by delta rules: with
    * V = O ⋈ C aggregated per nation, and arriving deltas ΔO (new
    * orders) and ΔC (late dimension rows),
    * V_new = V_base ⊎ (ΔO⋈C) ⊎ (O⋈ΔC) ⊎ (ΔO⋈ΔC) — sum/count form a
    * commutative monoid, so maintenance is a 4-way partial-aggregate
    * merge and ONLY the delta sides are re-joined. This entry runs the
    * delta plan (base/delta split carved deterministically from the
    * tables); the oracle recomputes the view directly from scratch —
    * equality IS the delta-rule proof. At 100 TB the base aggregate is
    * a stored table and each micro-batch joins delta-sized inputs
    * (q71_incremental_view is the aggregate-only sibling; this one
    * maintains through a JOIN, where the naive recompute re-shuffles
    * the full fact table every refresh). Money summed in exact cents. */
  def q84IvmJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val c = t(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val oBase = o.filter(col("o_orderkey") % 7 =!= 0)
    val oDelta = o.filter(col("o_orderkey") % 7 === 0)
    val cBase = c.filter(col("c_custkey") % 11 =!= 0)
    val cDelta = c.filter(col("c_custkey") % 11 === 0)
    def part(of: DataFrame, cf: DataFrame): DataFrame =
      of.join(cf, of("o_custkey") === cf("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("pn"), sum(col("cents")).as("pc"))
    part(oBase, cBase).unionAll(part(oDelta, cBase))
      .unionAll(part(oBase, cDelta)).unionAll(part(oDelta, cDelta))
      .groupBy(col("c_nationkey"))
      .agg(sum(col("pn")).cast("long").as("n_orders"),
        sum(col("pc")).cast("long").as("revenue_cents"))
      .orderBy(col("c_nationkey"))
  }

  val q84Sql: String =
    """SELECT c_nationkey, cast(count(*) as bigint) AS n_orders,
      | cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
      |   AS revenue_cents
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Gaps-and-islands: maximal runs of CONSECUTIVE active days per
    * user via the classic day − row_number() grouping constant — two
    * window/agg stages, both partitioned by user, so after the first
    * exchange on user_id everything is partition-local (one shuffle
    * total; the ordering inside each user is a partition-local sort).
    * Top-100 by longest streak keeps the answer bounded. */
  def q85Islands(spark: SparkSession, dir: String): DataFrame = {
    val days = t(spark, dir, "events")
      .select(col("user_id"),
        (unix_micros(col("ts")) / 86400000000L).cast("long").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days.withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"), max(col("len")).cast("long").as("longest"),
        sum(col("len")).cast("long").as("active_days"))
      .orderBy(desc("longest"), desc("active_days"), col("user_id"))
      .limit(100)
  }

  val q85Sql: String =
    """WITH days AS (
      | SELECT DISTINCT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS day
      | FROM events),
      |isl AS (
      | SELECT user_id,
      |   day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      | FROM days),
      |runs AS (
      | SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2)
      |SELECT user_id, cast(count(*) as bigint) AS n_islands,
      | cast(max(len) as bigint) AS longest,
      | cast(sum(len) as bigint) AS active_days
      |FROM runs GROUP BY user_id
      |ORDER BY longest DESC, active_days DESC, user_id LIMIT 100""".stripMargin

  /** Market-basket association rules (A-Priori pair counting, Agrawal
    * & Srikant VLDB'94): co-occurrence support, confidence, and lift
    * for part pairs bought in the same order. The pair join is
    * per-basket (equi-join on the order key then p_a < p_b), so work
    * is Σ basket² — basket-bounded, never catalog² — and the only
    * shuffles are the basket equi-join and the (pa, pb) count. All
    * three metrics are exact integer micro-units (counts and integer
    * division only), so the full rule table replays in DuckDB. At
    * 100 TB the same plan holds with a basket-size cap and a PCY-style
    * hash filter ahead of the pair count; the top-30 emit keeps the
    * answer bounded under a total order. */
  def q89MarketBasket(spark: SparkSession, dir: String): DataFrame = {
    val items = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .localCheckpoint(true) // feeds the totals, frequency, and pair scans
    val totals = items.agg(countDistinct(col("o")).as("n"))
    val freq = items.groupBy(col("p")).agg(count(lit(1)).as("cp"))
    items.as("x").join(items.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .groupBy(col("x.p").as("pa"), col("y.p").as("pb"))
      .agg(count(lit(1)).as("cab"))
      .join(freq.select(col("p").as("pa"), col("cp").as("ca")), Seq("pa"))
      .join(freq.select(col("p").as("pb"), col("cp").as("cb")), Seq("pb"))
      .crossJoin(broadcast(totals))
      .select(col("pa"), col("pb"), col("cab"), col("ca"), col("cb"),
        expr("(cab * 1000000) div n").cast("long").as("support_micro"),
        expr("(cab * 1000000) div ca").cast("long").as("confidence_micro"),
        expr("(cab * n * 1000000) div (ca * cb)").cast("long").as("lift_micro"))
      .orderBy(desc("cab"), col("pa"), col("pb"))
      .limit(30)
  }

  val q89Sql: String =
    """WITH items AS (
      | SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |tot AS (SELECT count(DISTINCT o) AS n FROM items),
      |freq AS (SELECT p, count(*) AS cp FROM items GROUP BY p),
      |pairs AS (
      | SELECT x.p AS pa, y.p AS pb, count(*) AS cab
      | FROM items x JOIN items y ON x.o = y.o AND x.p < y.p
      | GROUP BY 1, 2)
      |SELECT pa, pb, cab, fa.cp AS ca, fb.cp AS cb,
      | cast((cab * 1000000) // n as bigint) AS support_micro,
      | cast((cab * 1000000) // fa.cp as bigint) AS confidence_micro,
      | cast((cab * n * 1000000) // (fa.cp * fb.cp) as bigint) AS lift_micro
      |FROM pairs JOIN freq fa ON pa = fa.p JOIN freq fb ON pb = fb.p
      |CROSS JOIN tot
      |ORDER BY cab DESC, pa, pb LIMIT 30""".stripMargin

  /** MATCH_RECOGNIZE-style sequence pattern detection, expressed as
    * pure window algebra (Spark has no MATCH_RECOGNIZE; this is the
    * standard rewrite): over each part's time-ordered price sequence,
    * find V patterns — a strictly-falling run followed immediately by
    * a strictly-rising run — and report per part how many V bottoms
    * occur, the longest fall/rise runs, and the deepest drop in cents.
    * Mechanics: price deltas → direction ∈ {-1,0,1} → direction-change
    * islands (the q85 trick) → a bottom is the LAST row of a falling
    * island whose next row rises; its drop is (island's entry peak −
    * bottom), where the entry peak is max(lag(cents)) over the island
    * (the island is strictly decreasing, so that max IS the price
    * before the fall began). Everything is exact integer cents, so the
    * whole pattern table replays in DuckDB. Plan shape: one scan, all
    * windows share the (part, date) sort — Catalyst collapses them
    * into one shuffle+sort per partition key; per-part sequences are
    * bounded by part frequency, so at 100 TB this scales as the
    * groupBy, with no cross-part traffic. */
  def q90PatternMatch(spark: SparkSession, dir: String): DataFrame = {
    val byPart = Window.partitionBy(col("p"))
      .orderBy(col("d"), col("o"), col("ln"))
    val li = t(spark, dir, "lineitem")
      .select(col("l_partkey").as("p"), col("l_shipdate").as("d"),
        col("l_orderkey").as("o"), col("l_linenumber").as("ln"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val dirs = li
      .withColumn("prev", lag(col("cents"), 1).over(byPart))
      .withColumn("dirn", when(col("prev").isNull, lit(0))
        .when(col("cents") > col("prev"), lit(1))
        .when(col("cents") < col("prev"), lit(-1)).otherwise(lit(0)))
      .withColumn("chg",
        when(expr("coalesce(dirn <=> lag(dirn, 1) over " +
          "(partition by p order by d, o, ln), false)"), lit(0L))
          .otherwise(lit(1L)))
      .withColumn("seg", sum(col("chg")).over(
        byPart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("nextDir", lead(col("dirn"), 1).over(byPart))
    val bySeg = Window.partitionBy(col("p"), col("seg"))
    val runs = dirs
      .withColumn("runLen", count(lit(1)).over(bySeg))
      .withColumn("peak", max(col("prev")).over(bySeg))
      .withColumn("isBottom",
        (col("dirn") === -1) && (col("nextDir") === 1))
    runs.groupBy(col("p"))
      .agg(
        sum(when(col("isBottom"), 1L).otherwise(0L)).as("n_v"),
        max(when(col("dirn") === -1, col("runLen"))).cast("long")
          .as("max_fall_run"),
        max(when(col("dirn") === 1, col("runLen"))).cast("long")
          .as("max_rise_run"),
        max(when(col("isBottom"), col("peak") - col("cents")))
          .cast("long").as("deepest_drop_cents"))
      .filter(col("n_v") >= 1)
      .select(col("p").as("partkey"), col("n_v"), col("max_fall_run"),
        col("max_rise_run"), col("deepest_drop_cents"))
      .orderBy(col("partkey"))
  }

  val q90Sql: String =
    """WITH li AS (
      | SELECT l_partkey AS p, l_shipdate AS d, l_orderkey AS o,
      |  l_linenumber AS ln,
      |  cast(round(l_extendedprice * 100) as bigint) AS cents
      | FROM lineitem),
      |dirs AS (
      | SELECT *,
      |  lag(cents, 1) OVER w AS prev,
      |  CASE WHEN lag(cents, 1) OVER w IS NULL THEN 0
      |       WHEN cents > lag(cents, 1) OVER w THEN 1
      |       WHEN cents < lag(cents, 1) OVER w THEN -1 ELSE 0 END AS dirn
      | FROM li WINDOW w AS (PARTITION BY p ORDER BY d, o, ln)),
      |dirs2 AS (
      | SELECT *, lag(dirn, 1) OVER w AS prevDir,
      |  lead(dirn, 1) OVER w AS nextDir
      | FROM dirs WINDOW w AS (PARTITION BY p ORDER BY d, o, ln)),
      |segs AS (
      | SELECT *,
      |  sum(CASE WHEN dirn IS NOT DISTINCT FROM prevDir THEN 0 ELSE 1 END)
      |    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
      | FROM dirs2 WINDOW w AS (PARTITION BY p ORDER BY d, o, ln)),
      |runs AS (
      | SELECT *,
      |  count(*) OVER s AS runLen,
      |  max(prev) OVER s AS peak,
      |  (dirn = -1 AND nextDir = 1) AS isBottom
      | FROM segs WINDOW s AS (PARTITION BY p, seg))
      |SELECT p AS partkey,
      | cast(sum(CASE WHEN isBottom THEN 1 ELSE 0 END) as bigint) AS n_v,
      | cast(max(CASE WHEN dirn = -1 THEN runLen END) as bigint)
      |   AS max_fall_run,
      | cast(max(CASE WHEN dirn = 1 THEN runLen END) as bigint)
      |   AS max_rise_run,
      | cast(max(CASE WHEN isBottom THEN peak - cents END) as bigint)
      |   AS deepest_drop_cents
      |FROM runs GROUP BY p HAVING sum(CASE WHEN isBottom THEN 1 ELSE 0 END) >= 1
      |ORDER BY partkey""".stripMargin

  /** Pareto / ABC inventory classification — the classic warehouse
    * 80/95 revenue-concentration cut: parts ranked by revenue, the
    * heads whose RUNNING share stays ≤ 80 % are class A, ≤ 95 % B,
    * the tail C. All comparisons happen in EXACT decimal space
    * (`cum·100 ≤ total·80` on decimal(22,8) sums — no rounding, no
    * float division anywhere), so the class boundary is bit-identical
    * in both engines; only the final per-class revenue is rounded for
    * display via the [[graft.util.dsum]] grid. Plan shape: one
    * aggregate to part grain, then window math over the part table
    * (catalog-sized, thousands of× smaller than the fact table) — at
    * 100 TB the cumulative window runs over ~10⁵ parts regardless of
    * fact volume. */
  def q91ParetoAbc(spark: SparkSession, dir: String): DataFrame = {
    val rev = t(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("p"))
      .agg(sum(expr("cast(l_extendedprice * (1 - l_discount) as decimal(22,8))"))
        .as("revd"))
    val total = rev.agg(sum(col("revd")).as("totd"))
    // cumulative revenue via the distributed prefix sum — no
    // partition-less window even over the catalog-sized part dimension
    DistRank.withPrefix(rev.crossJoin(broadcast(total)),
        Seq(desc("revd"), col("p")), col("revd"), "sum", "cum",
        inclusive = true)
      .withColumn("abc_class",
        when(col("cum") * 100 <= col("totd") * 80, lit("A"))
          .when(col("cum") * 100 <= col("totd") * 95, lit("B"))
          .otherwise(lit("C")))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).cast("long").as("n_parts"),
        round(sum(col("revd")).cast("double"), 4).as("class_revenue"))
      .orderBy(col("abc_class"))
  }

  val q91Sql: String =
    """WITH rev AS (
      | SELECT l_partkey AS p,
      |  sum(cast(l_extendedprice * (1 - l_discount) as decimal(22,8))) AS revd
      | FROM lineitem GROUP BY 1),
      |tot AS (SELECT sum(revd) AS totd FROM rev),
      |ranked AS (
      | SELECT p, revd, totd,
      |  sum(revd) OVER (ORDER BY revd DESC, p
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      | FROM rev CROSS JOIN tot)
      |SELECT CASE WHEN cum * 100 <= totd * 80 THEN 'A'
      |            WHEN cum * 100 <= totd * 95 THEN 'B'
      |            ELSE 'C' END AS abc_class,
      | cast(count(*) as bigint) AS n_parts,
      | round(cast(sum(revd) as double), 4) AS class_revenue
      |FROM ranked GROUP BY 1 ORDER BY abc_class""".stripMargin

  /** Exponentially-weighted moving average with half-life 1 (α = ½)
    * over each user's most recent 20 event values — the smoothing
    * primitive behind rate monitors and feature-store "recent
    * activity" columns. The geometric weights are EXACT powers of two,
    * so every term is one integer shift + one integer division
    * (`cents·10⁶ div 2^(j+1)` for the j-th most recent event) and the
    * sum replays bit-identically in DuckDB — the same
    * float-determinism discipline as text_bm25_topk's integer idf.
    * Truncating the series at 20 terms loses < 2⁻²⁰ of the weight
    * mass, far below the micro grid. Plan shape: one window rank per
    * user + one aggregate — at 100 TB the per-user sequence scan is
    * the unavoidable minimum and nothing leaves the user's partition
    * until the final answer-sized rollup. */
  def q92EwmaHalflife(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(desc("ts"), desc("event_id"))
    t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("rn", row_number().over(byUser))
      .filter(col("rn") <= 20)
      .withColumn("term",
        expr("(cents * 1000000) div shiftleft(cast(2 as bigint), rn - 1)"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_used"),
        sum(col("term")).cast("long").as("ewma_micro_cents"))
      .orderBy(col("user_id"))
  }

  val q92Sql: String =
    """WITH recent AS (
      | SELECT user_id,
      |  cast(round(value * 100) as bigint) AS cents,
      |  row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) AS rn
      | FROM events)
      |SELECT user_id, cast(count(*) as bigint) AS n_used,
      | cast(sum((cents * 1000000) // (2::BIGINT << (rn - 1))) as bigint)
      |   AS ewma_micro_cents
      |FROM recent WHERE rn <= 20
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Rolling 7-day distinct actives (the "WAU" curve) — the windowed
    * COUNT DISTINCT no SQL window frame can express (DISTINCT is not
    * legal inside a window): rewritten as the contribution fan-out,
    * the standard warehouse technique. Each (type, user, active-day)
    * fact contributes to the 7 trailing report days [day, day+6];
    * de-duplicating contributions per (type, user, report-day) and
    * counting gives exactly |distinct users active in (d−6..d]|.
    * Work is 7× the distinct-activity table (bounded fan-out — never
    * the n² self-join of the naive interval formulation), all exact
    * integer, fully replayed in DuckDB. At 100 TB the fan-out factor
    * equals the window length in days — the known, budgeted cost of
    * exact rolling actives; beyond ~90-day windows switch to the
    * mergeable-HLL partials of meta_hll_sketches. */
  def q94RollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val active = t(spark, dir, "events")
      .select(col("event_type"), col("user_id"),
        (unix_micros(col("ts")) / 86400000000L).cast("long").as("day"))
      .distinct()
    val bounds = active.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    active
      .withColumn("report_day", explode(sequence(col("day"), col("day") + 6)))
      .select(col("event_type"), col("user_id"), col("report_day")).distinct()
      .crossJoin(broadcast(bounds))
      .filter(col("report_day") <= col("hi"))
      .groupBy(col("event_type"), col("report_day"))
      .agg(count(lit(1)).cast("long").as("wau"))
      .orderBy(col("event_type"), col("report_day"))
  }

  val q94Sql: String =
    """WITH active AS (
      | SELECT DISTINCT event_type, user_id,
      |  (epoch_ns(ts) // 1000) // 86400000000 AS day
      | FROM events),
      |bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM active),
      |contrib AS (
      | SELECT DISTINCT event_type, user_id,
      |  unnest(generate_series(day, day + 6)) AS report_day
      | FROM active)
      |SELECT event_type, report_day, cast(count(*) as bigint) AS wau
      |FROM contrib CROSS JOIN bounds
      |WHERE report_day <= hi
      |GROUP BY event_type, report_day
      |ORDER BY event_type, report_day""".stripMargin

  /** Bitemporal point-in-time query — SCD2 tracks one time axis; a
    * bitemporal table tracks two: BUSINESS time (when the fact was
    * true) and TRANSACTION time (when the warehouse learned it), and
    * the defining query is "as known at T, what was true during V".
    * The fact versions here are the original orders (tx 0) overlaid
    * by deterministic corrections (tx 1: priority-1 orders repriced
    * ×2 in exact cents); the as-known-at reconstruction takes, per
    * order, the LATEST version with tx_time ≤ T (one row_number over
    * the key — the same latest-per-key shape as kt_latest_per_key,
    * which is why a streaming upsert table IS the transaction-time
    * axis), then aggregates the first half of business time. Both
    * reconstructions replay in DuckDB; at 100 TB the version overlay
    * is a key-partitioned window over only the CHANGED keys'
    * versions, never a fact rewrite. */
  def q95Bitemporal(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        (unix_micros(col("o_orderdate")) / 86400000000L).cast("long").as("bday"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val v0 = orders.withColumn("tx", lit(0L))
    val v1 = orders.filter(col("o_orderkey") % 10 === 3)
      .withColumn("cents", col("cents") * 2).withColumn("tx", lit(1L))
    val versions = v0.unionByName(v1)
    val bounds = orders.agg(
      expr("(min(bday) + max(bday) + 1) div 2").cast("long").as("cut"))
    def asKnownAt(t: Long): DataFrame = {
      val w = Window.partitionBy(col("o_orderkey"))
        .orderBy(desc("tx"))
      versions.filter(col("tx") <= t)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .crossJoin(broadcast(bounds))
        .filter(col("bday") < col("cut"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
          sum(col("cents")).cast("long").as("cents"))
        .select(lit(t).as("known_at_tx"), col("o_orderpriority"),
          col("n_orders"), col("cents"))
    }
    asKnownAt(0L).unionAll(asKnownAt(1L))
      .orderBy(col("known_at_tx"), col("o_orderpriority"))
  }

  val q95Sql: String =
    """WITH o AS (
      | SELECT o_orderkey, o_orderpriority,
      |  (epoch_ns(o_orderdate) // 1000) // 86400000000 AS bday,
      |  cast(round(o_totalprice * 100) as bigint) AS cents
      | FROM orders),
      |bounds AS (SELECT (min(bday) + max(bday) + 1) // 2 AS cut FROM o),
      |versions AS (
      | SELECT *, 0 AS tx FROM o
      | UNION ALL
      | SELECT o_orderkey, o_orderpriority, bday, cents * 2, 1
      | FROM o WHERE o_orderkey % 10 = 3),
      |known AS (
      | SELECT t.t AS known_at_tx, v.* FROM (VALUES (0), (1)) t(t)
      | JOIN versions v ON v.tx <= t.t),
      |latest AS (
      | SELECT * FROM (
      |  SELECT *, row_number() OVER (PARTITION BY known_at_tx, o_orderkey
      |    ORDER BY tx DESC) AS rk FROM known)
      | WHERE rk = 1)
      |SELECT cast(known_at_tx as bigint) AS known_at_tx, o_orderpriority,
      | cast(count(*) as bigint) AS n_orders,
      | cast(sum(cents) as bigint) AS cents
      |FROM latest CROSS JOIN bounds
      |WHERE bday < cut
      |GROUP BY known_at_tx, o_orderpriority
      |ORDER BY known_at_tx, o_orderpriority""".stripMargin

  /** Decile lift / gains table — the campaign-targeting report: rank
    * customers by a model score (here account balance as the stand-in
    * ranking signal), cut into 10 equal deciles (`ntile` under the
    * deterministic (score desc, key) total order — identical tie
    * handling in both engines), and per decile report the response
    * rate (placed ≥ 1 urgent-priority order), its lift over the base
    * rate, and cumulative gains — all exact integer micro-units. The
    * standard readout for "is the top of the ranking worth
    * targeting"; at 100 TB the rank cut comes from order statistics
    * exactly like the other rank-based entries, and everything after
    * the per-customer flag join is decile-sized. */
  def q96DecileLift(spark: SparkSession, dir: String): DataFrame = {
    val resp = t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey")).distinct()
      .withColumn("responded", lit(1L))
    val scored = DistRank.withNtile(
      t(spark, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
        .join(resp, Seq("c_custkey"), "left")
        .withColumn("responded", coalesce(col("responded"), lit(0L))),
      Seq(desc("c_acctbal"), col("c_custkey")), 10, "decile")
    val base = scored.agg(sum(col("responded")).as("tot_resp"),
      count(lit(1)).as("tot_n"))
    DistRank.withPrefix(
        scored.groupBy(col("decile"))
          .agg(count(lit(1)).as("n"), sum(col("responded")).as("resp"))
          .crossJoin(broadcast(base)),
        Seq(col("decile")), col("resp"), "sum", "cum_resp",
        inclusive = true)
      .withColumn("rate_micro", expr("(resp * 1000000) div n"))
      .withColumn("lift_micro",
        expr("(resp * tot_n * 1000000) div (n * tot_resp)"))
      .withColumn("cum_gain_micro",
        expr("(cum_resp * 1000000) div tot_resp"))
      .select(col("decile"), col("n").cast("long").as("n"),
        col("resp").cast("long").as("resp"),
        col("rate_micro").cast("long").as("rate_micro"),
        col("lift_micro").cast("long").as("lift_micro"),
        col("cum_gain_micro").cast("long").as("cum_gain_micro"))
      .orderBy(col("decile"))
  }

  val q96Sql: String =
    """WITH resp AS (
      | SELECT DISTINCT o_custkey AS c_custkey, 1 AS responded
      | FROM orders WHERE o_orderpriority = '1-URGENT'),
      |scored AS (
      | SELECT c.c_custkey, coalesce(r.responded, 0) AS responded,
      |  ntile(10) OVER (ORDER BY c.c_acctbal DESC, c.c_custkey) AS decile
      | FROM customer c LEFT JOIN resp r USING (c_custkey)),
      |base AS (SELECT sum(responded) AS tot_resp, count(*) AS tot_n FROM scored),
      |dec AS (
      | SELECT decile, count(*) AS n, sum(responded) AS resp
      | FROM scored GROUP BY decile)
      |SELECT cast(decile as bigint) AS decile, cast(n as bigint) AS n,
      | cast(resp as bigint) AS resp,
      | cast((resp * 1000000) // n as bigint) AS rate_micro,
      | cast((resp * tot_n * 1000000) // (n * tot_resp) as bigint) AS lift_micro,
      | cast((sum(resp) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
      |   AND CURRENT ROW) * 1000000) // tot_resp as bigint) AS cum_gain_micro
      |FROM dec CROSS JOIN base ORDER BY decile""".stripMargin

  /** RFM segmentation — the canonical customer-base taxonomy:
    * per buyer, Recency (last order day), Frequency (order count),
    * Monetary (exact cents), each cut into quintile scores 1–5 under
    * deterministic total orders (most recent / most frequent / biggest
    * spender = 5), then the rule-based segment labels every CRM ships.
    * Quintiles are `ntile` with (value, key) tie-breaks — identical in
    * both engines — and the report (customers + revenue per segment)
    * is exact integer. One orders aggregate to buyer grain, three
    * windows over the buyer table (customer-sized, not fact-sized),
    * answer-sized rollup. */
  def q97RfmSegmentation(spark: SparkSession, dir: String): DataFrame = {
    val buyers = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max((unix_micros(col("o_orderdate")) / 86400000000L).cast("long"))
        .as("last_day"),
        count(lit(1)).as("freq"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    // three buyer-sized quintile assignments, each via the distributed
    // ntile (three range shuffles of the buyer table, zero
    // single-partition windows)
    val rfm = DistRank.withNtile(
      DistRank.withNtile(
        DistRank.withNtile(buyers,
          Seq(col("last_day"), col("o_custkey")), 5, "r"),
        Seq(col("freq"), col("o_custkey")), 5, "f"),
      Seq(col("cents"), col("o_custkey")), 5, "m")
    rfm.withColumn("segment",
        when(col("r") >= 4 && col("f") >= 4 && col("m") >= 4, lit("champion"))
          .when(col("f") >= 4, lit("loyal"))
          .when(col("m") >= 4, lit("big_spender"))
          .when(col("r") <= 2 && col("f") >= 3, lit("at_risk"))
          .when(col("r") === 1, lit("lost"))
          .otherwise(lit("regular")))
      .groupBy(col("segment"))
      .agg(count(lit(1)).cast("long").as("n_customers"),
        sum(col("cents")).cast("long").as("revenue_cents"),
        avg(col("r")).cast("double").as("avg_r"),
        avg(col("f")).cast("double").as("avg_f"))
      .orderBy(col("segment"))
  }

  val q97Sql: String =
    """WITH rfm AS (
      | SELECT o_custkey,
      |  max((epoch_ns(o_orderdate) // 1000) // 86400000000) AS last_day,
      |  count(*) AS freq,
      |  sum(cast(round(o_totalprice * 100) as bigint)) AS cents
      | FROM orders GROUP BY 1),
      |scored AS (
      | SELECT *,
      |  ntile(5) OVER (ORDER BY last_day, o_custkey) AS r,
      |  ntile(5) OVER (ORDER BY freq, o_custkey) AS f,
      |  ntile(5) OVER (ORDER BY cents, o_custkey) AS m
      | FROM rfm),
      |labeled AS (
      | SELECT *, CASE
      |   WHEN r >= 4 AND f >= 4 AND m >= 4 THEN 'champion'
      |   WHEN f >= 4 THEN 'loyal'
      |   WHEN m >= 4 THEN 'big_spender'
      |   WHEN r <= 2 AND f >= 3 THEN 'at_risk'
      |   WHEN r = 1 THEN 'lost'
      |   ELSE 'regular' END AS segment
      | FROM scored)
      |SELECT segment, cast(count(*) as bigint) AS n_customers,
      | cast(sum(cents) as bigint) AS revenue_cents,
      | cast(avg(r) as double) AS avg_r, cast(avg(f) as double) AS avg_f
      |FROM labeled GROUP BY segment ORDER BY segment""".stripMargin

  /** Top-down proportional allocation with LARGEST-REMAINDER rounding
    * — the finance/planning disaggregation primitive (spread an order
    * header's total across its lines by quantity share) done the only
    * way that audits clean: base share = `(T·qᵢ) div Q` in exact
    * cents, then the `T − Σ base` leftover cents go one each to the
    * lines with the largest division remainders. The tie-break must
    * be chosen with care: this synthetic lineitem does NOT have
    * unique (order, linenumber) pairs, so ranking needs enough
    * columns — (rem, linenumber, partkey, suppkey, returnflag) —
    * that any residual tie is between rows of the SAME output group,
    * making the grouped sums deterministic even where individual row
    * ranks are interchangeable. Per-order allocations sum to the
    * header EXACTLY — no
    * float pennies, ever (the spec pins Σ alloc ≡ T for every order).
    * One per-order window for the remainder ranks, answer-sized
    * rollup; at 100 TB the window is per-order-bounded like every
    * basket computation. */
  def q98Allocation(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_returnflag"),
        round(col("l_quantity")).cast("long").as("q"))
    val hdr = t(spark, dir, "orders")
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("tc"))
    val byOrder = Window.partitionBy(col("l_orderkey"))
    val remRank = Window.partitionBy(col("l_orderkey"))
      .orderBy(desc("rem"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_returnflag"))
    li.join(hdr, col("l_orderkey") === col("o_orderkey"))
      .withColumn("bigQ", sum(col("q")).over(byOrder))
      .withColumn("base", expr("(tc * q) div bigQ"))
      .withColumn("rem", expr("(tc * q) % bigQ"))
      .withColumn("leftover", col("tc") - sum(col("base")).over(byOrder))
      .withColumn("rk", row_number().over(remRank))
      .withColumn("alloc",
        col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("long").as("n_lines"),
        sum(col("alloc")).cast("long").as("alloc_cents"))
      .orderBy(col("l_returnflag"))
  }

  val q98Sql: String =
    """WITH li AS (
      | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag,
      |  cast(round(l_quantity) as bigint) AS q
      | FROM lineitem),
      |hdr AS (
      | SELECT o_orderkey, cast(round(o_totalprice * 100) as bigint) AS tc
      | FROM orders),
      |shares AS (
      | SELECT li.*, tc,
      |  sum(q) OVER (PARTITION BY l_orderkey) AS bigQ
      | FROM li JOIN hdr ON l_orderkey = o_orderkey),
      |based AS (
      | SELECT *, (tc * q) // bigQ AS base, (tc * q) % bigQ AS rem
      | FROM shares),
      |ranked AS (
      | SELECT *,
      |  tc - sum(base) OVER (PARTITION BY l_orderkey) AS leftover,
      |  row_number() OVER (PARTITION BY l_orderkey
      |    ORDER BY rem DESC, l_linenumber, l_partkey, l_suppkey,
      |      l_returnflag) AS rk
      | FROM based)
      |SELECT l_returnflag, cast(count(*) as bigint) AS n_lines,
      | cast(sum(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END) as bigint)
      |   AS alloc_cents
      |FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Interval-union coverage (sweep line) — total covered time from
    * OVERLAPPING intervals, the uptime/SLA computation a naive
    * sum-of-durations double-counts: per user, each event opens an
    * interval [ts, ts + value·10 ms]; sorting by start and comparing
    * each start against the running max of prior ends splits the
    * timeline into maximal covered islands (`start > max_prior_end` ⇒
    * new island — the q85 gaps-and-islands trick lifted to
    * intervals), and coverage = Σ (island_max_end − island_min_start)
    * in exact micros. One per-user sort, two windows sharing it;
    * per-user interval counts bound the work at any scale. */
  def q99IntervalCoverage(spark: SparkSession, dir: String): DataFrame = {
    val iv = t(spark, dir, "events")
      .select(col("user_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) +
          round(col("value") * 100).cast("long") * 10000L).as("e"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("s"), col("e"))
    val islands = iv
      .withColumn("maxPrior",
        max(col("e")).over(byUser.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("newIsland",
        when(col("maxPrior").isNull || col("s") > col("maxPrior"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("newIsland")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands.groupBy(col("user_id"), col("island"))
      .agg(min(col("s")).as("is"), max(col("e")).as("ie"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_islands"),
        sum(col("ie") - col("is")).cast("long").as("covered_micros"))
      .orderBy(col("user_id"))
  }

  val q99Sql: String =
    """WITH iv AS (
      | SELECT user_id, epoch_ns(ts) // 1000 AS s,
      |  epoch_ns(ts) // 1000
      |    + cast(round(value * 100) as bigint) * 10000 AS e
      | FROM events),
      |marked AS (
      | SELECT *,
      |  max(e) OVER (PARTITION BY user_id ORDER BY s, e
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxPrior
      | FROM iv),
      |islanded AS (
      | SELECT *,
      |  sum(CASE WHEN maxPrior IS NULL OR s > maxPrior THEN 1 ELSE 0 END)
      |   OVER (PARTITION BY user_id ORDER BY s, e
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      | FROM marked),
      |spans AS (
      | SELECT user_id, island, min(s) AS i_s, max(e) AS i_e
      | FROM islanded GROUP BY 1, 2)
      |SELECT user_id, cast(count(*) as bigint) AS n_islands,
      | cast(sum(i_e - i_s) as bigint) AS covered_micros
      |FROM spans GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Rolling OLS trend slope — the windowed least-squares primitive
    * behind trend alerts ("price rising over the last 8 observations
    * of this part"): with x = the per-part observation index and
    * y = price cents, slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) over a
    * trailing ROWS window. Every moment is an exact integer window
    * sum, the division lands once on the micro grid, and the report
    * (per part: steepest rise, steepest fall, window count) replays
    * bit-identically in DuckDB. Five window sums share ONE sort —
    * Catalyst evaluates them in a single Window operator — and
    * per-part sequences bound the work. */
  def q100RollingSlope(spark: SparkSession, dir: String): DataFrame = {
    val byPart = Window.partitionBy(col("p"))
      .orderBy(col("d"), col("o"), col("ln"))
    val trail = byPart.rowsBetween(-7, Window.currentRow)
    t(spark, dir, "lineitem")
      .select(col("l_partkey").as("p"), col("l_shipdate").as("d"),
        col("l_orderkey").as("o"), col("l_linenumber").as("ln"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
      .withColumn("x", row_number().over(byPart).cast("long"))
      .withColumn("n", count(lit(1)).over(trail))
      .withColumn("sx", sum(col("x")).over(trail))
      .withColumn("sy", sum(col("y")).over(trail))
      .withColumn("sxy", sum(col("x") * col("y")).over(trail))
      .withColumn("sxx", sum(col("x") * col("x")).over(trail))
      // the numerator is SIGNED and Spark `div` truncates toward zero
      // while DuckDB `//` floors — divide magnitudes and reapply the
      // sign so both engines truncate identically
      .withColumn("num", expr("(n * sxy - sx * sy) * 1000000"))
      .withColumn("den", expr("n * sxx - sx * sx"))
      .withColumn("slope_micro",
        when(col("n") >= 2,
          when(col("num") >= 0, expr("num div den"))
            .otherwise(-expr("(-num) div den"))))
      .filter(col("slope_micro").isNotNull)
      .groupBy(col("p"))
      .agg(count(lit(1)).cast("long").as("n_windows"),
        max(col("slope_micro")).cast("long").as("max_rise_micro"),
        min(col("slope_micro")).cast("long").as("max_fall_micro"))
      .orderBy(col("p"))
      .select(col("p").as("partkey"), col("n_windows"),
        col("max_rise_micro"), col("max_fall_micro"))
  }

  val q100Sql: String =
    """WITH li AS (
      | SELECT l_partkey AS p, l_shipdate AS d, l_orderkey AS o,
      |  l_linenumber AS ln,
      |  cast(round(l_extendedprice * 100) as bigint) AS y
      | FROM lineitem),
      |xed AS (
      | SELECT *, cast(row_number() OVER w as bigint) AS x
      | FROM li WINDOW w AS (PARTITION BY p ORDER BY d, o, ln)),
      |moments AS (
      | SELECT p, count(*) OVER t AS n,
      |  sum(x) OVER t AS sx, sum(y) OVER t AS sy,
      |  sum(x * y) OVER t AS sxy, sum(x * x) OVER t AS sxx
      | FROM xed WINDOW t AS (PARTITION BY p ORDER BY d, o, ln
      |   ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)),
      |slopes AS (
      | SELECT p, CASE WHEN (n * sxy - sx * sy) >= 0
      |   THEN ((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
      |   ELSE -((-(n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx))
      |  END AS slope_micro
      | FROM moments WHERE n >= 2)
      |SELECT p AS partkey, cast(count(*) as bigint) AS n_windows,
      | cast(max(slope_micro) as bigint) AS max_rise_micro,
      | cast(min(slope_micro) as bigint) AS max_fall_micro
      |FROM slopes GROUP BY p ORDER BY partkey""".stripMargin

  /** Cohort LTV curves — q75's retention triangle upgraded from
    * presence to VALUE: users cohorted by first-activity week, and
    * per (cohort, age-in-weeks) the active-user count, the week's
    * purchase revenue, and the RUNNING cumulative revenue — the
    * curve whose flattening point sets payback windows. Cohorting is
    * one min-aggregate, the triangle one (cohort, age) aggregate, the
    * cumulative one ordered window per cohort — all exact cents. At
    * 100 TB the cohort map is user-grain (broadcastable against the
    * fact stream) and the triangle is answer-sized. */
  def q101CohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        (unix_micros(col("ts")) / 86400000000L / 7L).cast("long").as("week"),
        round(col("value") * 100).cast("long").as("cents"))
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort"))
    val cells = ev.join(cohorts, Seq("user_id"))
      .withColumn("age", col("week") - col("cohort"))
      .groupBy(col("cohort"), col("age"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum(when(col("event_type") === "purchase", col("cents"))
          .otherwise(0L)).as("rev"))
    val cum = Window.partitionBy(col("cohort")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_rev", sum(col("rev")).over(cum))
      .select(col("cohort"), col("age"),
        col("n_users").cast("long").as("n_users"),
        col("rev").cast("long").as("rev_cents"),
        col("cum_rev").cast("long").as("cum_rev_cents"))
      .orderBy(col("cohort"), col("age"))
  }

  val q101Sql: String =
    """WITH ev AS (
      | SELECT user_id, event_type,
      |  (epoch_ns(ts) // 1000) // 86400000000 // 7 AS week,
      |  cast(round(value * 100) as bigint) AS cents
      | FROM events),
      |cohorts AS (SELECT user_id, min(week) AS cohort FROM ev GROUP BY 1),
      |cells AS (
      | SELECT c.cohort, e.week - c.cohort AS age,
      |  count(DISTINCT e.user_id) AS n_users,
      |  sum(CASE WHEN e.event_type = 'purchase' THEN e.cents ELSE 0 END) AS rev
      | FROM ev e JOIN cohorts c USING (user_id)
      | GROUP BY 1, 2)
      |SELECT cohort, age, cast(n_users as bigint) AS n_users,
      | cast(rev as bigint) AS rev_cents,
      | cast(sum(rev) OVER (PARTITION BY cohort ORDER BY age
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint)
      |   AS cum_rev_cents
      |FROM cells ORDER BY cohort, age""".stripMargin

  /** Funnel time-to-convert — q74 counts who reaches each step; this
    * measures HOW LONG the step takes: per user, the latency from
    * first `view` to the first `purchase` AFTER it, summarized as
    * exact order-statistic percentiles (value at ceil(p·n) in the
    * ascending latency order — a rank pick, no interpolation, so the
    * percentile replays bit-identically). Two min-aggregates, one
    * join, one rank window over the converters (population-sized,
    * answer-bounded output). The conversion-latency distribution is
    * the metric funnels get wrong when they only count. */
  def q102TimeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("m"))
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("m")).as("v"))
    val conv = ev.filter(col("event_type") === "purchase")
      .join(firstView, Seq("user_id"))
      .filter(col("m") >= col("v"))
      .groupBy(col("user_id"), col("v")).agg(min(col("m")).as("p"))
      .withColumn("lat", col("p") - col("v"))
    val ranked = DistRank.withRowNumber(conv,
      Seq(col("lat"), col("user_id")), "rk")
    val n = ranked.agg(count(lit(1)).as("n"))
    val viewed = firstView.agg(count(lit(1)).as("n_viewed"))
    ranked.crossJoin(broadcast(n)).crossJoin(broadcast(viewed))
      .withColumn("p50rk", expr("(n * 50 + 99) div 100"))
      .withColumn("p90rk", expr("(n * 90 + 99) div 100"))
      .groupBy(col("n_viewed"), col("n"))
      .agg(max(when(col("rk") === col("p50rk"), col("lat"))).as("p50_micros"),
        max(when(col("rk") === col("p90rk"), col("lat"))).as("p90_micros"),
        max(col("lat")).as("max_micros"))
      .select(col("n_viewed").cast("long").as("n_viewed"),
        col("n").cast("long").as("n_converted"),
        col("p50_micros").cast("long").as("p50_micros"),
        col("p90_micros").cast("long").as("p90_micros"),
        col("max_micros").cast("long").as("max_micros"))
  }

  val q102Sql: String =
    """WITH ev AS (
      | SELECT user_id, event_type, epoch_ns(ts) // 1000 AS m FROM events),
      |fv AS (SELECT user_id, min(m) AS v FROM ev
      |       WHERE event_type = 'view' GROUP BY 1),
      |conv AS (
      | SELECT e.user_id, fv.v, min(e.m) AS p
      | FROM ev e JOIN fv USING (user_id)
      | WHERE e.event_type = 'purchase' AND e.m >= fv.v
      | GROUP BY 1, 2),
      |ranked AS (
      | SELECT p - v AS lat,
      |  row_number() OVER (ORDER BY p - v, user_id) AS rk
      | FROM conv),
      |n AS (SELECT count(*) AS n FROM ranked),
      |viewed AS (SELECT count(*) AS n_viewed FROM fv)
      |SELECT cast(n_viewed as bigint) AS n_viewed,
      | cast(n as bigint) AS n_converted,
      | cast(max(CASE WHEN rk = (n * 50 + 99) // 100 THEN lat END) as bigint)
      |   AS p50_micros,
      | cast(max(CASE WHEN rk = (n * 90 + 99) // 100 THEN lat END) as bigint)
      |   AS p90_micros,
      | cast(max(lat) as bigint) AS max_micros
      |FROM ranked CROSS JOIN n CROSS JOIN viewed
      |GROUP BY n_viewed, n""".stripMargin

  /** ABC×XYZ inventory matrix — the two-axis planning taxonomy: ABC
    * from revenue concentration (the q91 cumulative cuts) crossed
    * with XYZ from demand VARIABILITY, where CV² is computed as the
    * exact integer ratio (W·Σq² − (Σq)²)·10⁶ div (Σq)² over
    * ZERO-FILLED weekly demand (silent weeks count — skipping them
    * is the classic XYZ mistake that labels sporadic parts steady).
    * X ≤ 0.25 (CV ≤ ½), Y ≤ 1.0, else Z, all on the micro grid. The
    * zero-fill is ANALYTIC (no week fan-out): silent weeks add 0 to
    * both Σq and Σq², and the filled count is the constant
    * hi − lo + 1 — one (part, week) aggregate, one scalar span+total
    * pull, two part-grain prefix ranks, a 3×3 answer. */
  def q103AbcXyz(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_partkey").as("p"),
        (unix_micros(col("l_shipdate")) / 86400000000L / 7L).cast("long").as("wk"),
        round(col("l_quantity")).cast("long").as("q"),
        expr("cast(l_extendedprice * (1 - l_discount) as decimal(22,8))").as("revd"))
    // ONE data-sized pass: (part, week) carries both the quantity sum
    // (XYZ moments) and the revenue sum (ABC axis) — span, weekly
    // moments and per-part revenue all derive from this weekly table,
    // so lineitem is scanned once, not three times
    // ANALYTIC zero-fill: silent weeks contribute 0 to both Σq and Σq²,
    // and the per-part week count over the filled calendar is the SAME
    // constant hi − lo + 1 for every part — so the parts × weeks grid
    // (a ~W× row amplification at any scale) collapses to a
    // present-weeks aggregate plus the broadcast 1-row span. The DuckDB
    // oracle (q103Sql) keeps its literal grid: agreeing from two
    // different plans is the point. ONE data-sized chain
    // (li → (p, wk) → (p)), then a barrier on the PART-sized moments
    // table — span, XYZ and the ABC revenue ranking all read those
    // ~|parts| rows (DistRank's boundary pass runs as a separate job,
    // where exchange reuse does not apply; checkpointing the 30×
    // larger (p, wk) table instead measured 1.9 s vs 1.0 s at sf0.1).
    val weekly = li.groupBy(col("p"), col("wk"))
      .agg(sum(col("q")).as("qw"), sum(col("revd")).as("rw"))
    // LAZY checkpoint: same barrier (first action materializes, every
    // later job — DistRank's boundary pass included — reuses it).
    // NOTE (r17): constructing this entry is no longer free — the
    // fused scalar pull below executes the moments pass at build time
    // (the scalar-subquery trade: one ~0.2 s fixture aggregation per
    // plan probe bought the deletion of two broadcast subtrees and 4
    // of 16 jobs from the hot path)
    val mom = weekly.groupBy(col("p"))
      .agg(sum(col("qw")).as("sq"), sum(col("qw") * col("qw")).as("sqq"),
        sum(col("rw")).as("revd"),
        min(col("wk")).as("mn"), max(col("wk")).as("mx"))
      .localCheckpoint(false) // consumed by span + xyz + revenue
    // ONE scalar pass over the part-sized checkpoint fuses the week
    // span AND the revenue grand total (r16 ran them as two broadcast
    // subtrees — two jobs, two exchanges, two BNL joins; the job-count
    // audit measured 16 jobs in the entry, so every barrier matters).
    // Collecting ONE row is exactly how Catalyst executes a scalar
    // subquery — bounded by contract, and the constants then inline
    // into codegen instead of riding a broadcast join.
    val g = mom.agg(min(col("mn")), max(col("mx")),
      sum(col("revd"))).head()
    val (wkLo, wkHi) = (g.getLong(0), g.getLong(1))
    val totd = g.getDecimal(2)
    val xyz = mom
      .withColumn("w", lit(wkHi - wkLo + 1L))
      // the CV² cross-moments run in decimal(38,0) (DuckDB: HUGEINT):
      // W·Σq² and (Σq)² approach 10¹⁹ on a high-volume part at 100 TB;
      // the dividend is ≥ 0 by Cauchy–Schwarz, so div stays exact
      .withColumn("cv2_micro",
        expr("((cast(w as decimal(38,0)) * sqq - " +
          "cast(sq as decimal(38,0)) * sq) * 1000000) " +
          "div (cast(sq as decimal(38,0)) * sq)"))
      .withColumn("xyz",
        when(col("cv2_micro") <= 250000, lit("X"))
          .when(col("cv2_micro") <= 1000000, lit("Y")).otherwise(lit("Z")))
      .select(col("p"), col("xyz"))
    // decimal sums re-aggregate associatively: Σ_p rw = Σ_p Σ_wk revd
    val rev = mom.select(col("p"), col("revd"))
    val abc = DistRank.withPrefix(rev,
        Seq(desc("revd"), col("p")), col("revd"), "sum", "cum",
        inclusive = true)
      .withColumn("abc",
        when(col("cum") * 100 <= lit(totd) * 80, lit("A"))
          .when(col("cum") * 100 <= lit(totd) * 95, lit("B"))
          .otherwise(lit("C")))
      .select(col("p"), col("abc"), col("revd"))
    abc.join(xyz, Seq("p"))
      .groupBy(col("abc"), col("xyz"))
      .agg(count(lit(1)).cast("long").as("n_parts"),
        round(sum(col("revd")).cast("double"), 4).as("revenue"))
      .orderBy(col("abc"), col("xyz"))
  }

  val q103Sql: String =
    """WITH li AS (
      | SELECT l_partkey AS p,
      |  (epoch_ns(l_shipdate) // 1000) // 86400000000 // 7 AS wk,
      |  cast(round(l_quantity) as bigint) AS q,
      |  cast(l_extendedprice * (1 - l_discount) as decimal(22,8)) AS revd
      | FROM lineitem),
      |span AS (SELECT min(wk) AS lo, max(wk) AS hi FROM li),
      |weekly AS (SELECT p, wk, sum(q) AS qw FROM li GROUP BY 1, 2),
      |grid AS (
      | SELECT pp.p, gs.wk, coalesce(w.qw, 0) AS qw
      | FROM (SELECT DISTINCT p FROM weekly) pp
      | CROSS JOIN span
      | CROSS JOIN LATERAL (SELECT unnest(generate_series(lo, hi)) AS wk) gs
      | LEFT JOIN weekly w ON w.p = pp.p AND w.wk = gs.wk),
      |xyz AS (
      | SELECT p, CASE
      |   WHEN ((cast(count(*) as hugeint) * sum(qw * qw)
      |       - cast(sum(qw) as hugeint) * sum(qw)) * 1000000)
      |     // (cast(sum(qw) as hugeint) * sum(qw)) <= 250000 THEN 'X'
      |   WHEN ((cast(count(*) as hugeint) * sum(qw * qw)
      |       - cast(sum(qw) as hugeint) * sum(qw)) * 1000000)
      |     // (cast(sum(qw) as hugeint) * sum(qw)) <= 1000000 THEN 'Y'
      |   ELSE 'Z' END AS xyz
      | FROM grid GROUP BY p),
      |rev AS (SELECT p, sum(revd) AS revd FROM li GROUP BY 1),
      |tot AS (SELECT sum(revd) AS totd FROM rev),
      |abc AS (
      | SELECT p, CASE WHEN cum * 100 <= totd * 80 THEN 'A'
      |   WHEN cum * 100 <= totd * 95 THEN 'B' ELSE 'C' END AS abc, revd
      | FROM (SELECT p, revd, totd, sum(revd) OVER (ORDER BY revd DESC, p
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM rev CROSS JOIN tot))
      |SELECT abc, xyz, cast(count(*) as bigint) AS n_parts,
      | round(cast(sum(revd) as double), 4) AS revenue
      |FROM abc JOIN xyz USING (p)
      |GROUP BY 1, 2 ORDER BY abc, xyz""".stripMargin

  /** Time-window funnel (the ClickHouse `windowFunnel` semantic) —
    * q74 counts stage reach over all time; this requires each stage
    * within 7 DAYS of the previous one: the first `view`, the first
    * `click` at or after it within the window, the first `purchase`
    * at or after THAT click within the window — earliest-chain
    * semantics, so a user's stage depth is well-defined. Three
    * min-aggregates chained through two window-banded joins (each
    * per-user, answer-sized); exact micros throughout. The output is
    * the stage ladder with integer conversion shares. */
  def q104WindowFunnel(spark: SparkSession, dir: String): DataFrame = {
    val win = 7L * 86400000000L
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("m"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("m")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("m") >= col("t1") && col("m") <= col("t1") + win)
      .groupBy(col("user_id"), col("t1")).agg(min(col("m")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("m") >= col("t2") && col("m") <= col("t2") + win)
      .groupBy(col("user_id")).agg(min(col("m")).as("t3"))
    val n1 = s1.count(); val n2 = s2.count(); val n3 = s3.count()
    import ev.sparkSession.implicits._
    Seq(
      (1L, "view", n1, 1000000L),
      (2L, "click_within_7d", n2, if (n1 > 0) n2 * 1000000L / n1 else 0L),
      (3L, "purchase_within_7d", n3, if (n2 > 0) n3 * 1000000L / n2 else 0L))
      .toDF("stage", "name", "n_users", "conv_micro")
      .orderBy(col("stage"))
  }

  val q104Sql: String =
    """WITH ev AS (
      | SELECT user_id, event_type, epoch_ns(ts) // 1000 AS m FROM events),
      |s1 AS (SELECT user_id, min(m) AS t1 FROM ev
      |       WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      | SELECT e.user_id, s1.t1, min(e.m) AS t2
      | FROM ev e JOIN s1 USING (user_id)
      | WHERE e.event_type = 'click' AND e.m >= s1.t1
      |   AND e.m <= s1.t1 + 7 * 86400000000
      | GROUP BY 1, 2),
      |s3 AS (
      | SELECT e.user_id, min(e.m) AS t3
      | FROM ev e JOIN s2 USING (user_id)
      | WHERE e.event_type = 'purchase' AND e.m >= s2.t2
      |   AND e.m <= s2.t2 + 7 * 86400000000
      | GROUP BY 1),
      |n AS (SELECT (SELECT count(*) FROM s1) AS n1,
      |             (SELECT count(*) FROM s2) AS n2,
      |             (SELECT count(*) FROM s3) AS n3)
      |SELECT * FROM (
      | SELECT cast(1 as bigint) AS stage, 'view' AS name,
      |  cast(n1 as bigint) AS n_users, cast(1000000 as bigint) AS conv_micro
      | FROM n
      | UNION ALL
      | SELECT 2, 'click_within_7d', n2,
      |  CASE WHEN n1 > 0 THEN (n2 * 1000000) // n1 ELSE 0 END FROM n
      | UNION ALL
      | SELECT 3, 'purchase_within_7d', n3,
      |  CASE WHEN n2 > 0 THEN (n3 * 1000000) // n2 ELSE 0 END FROM n
      |) ORDER BY stage""".stripMargin

  /** Growth accounting — the canonical active-user decomposition
    * every growth team lives by: each (week, user) activity cell is
    * exactly one of NEW (first-ever week), RETAINED (also active the
    * previous week), or RESURRECTED (active before, silent last
    * week); CHURNED counts last week's actives who went silent (the
    * negative flow). The identity actives(w) = new + retained +
    * resurrected — and actives(w−1) = retained(w) + churned(w) — is
    * what makes the decomposition an ACCOUNTING (both spec-pinned).
    * One distinct-activity table, one first-week aggregate, one
    * self-join on (user, week−1) and one on (user, week+1): all
    * key-partitioned, exact counts. */
  def q105GrowthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val act = t(spark, dir, "events")
      .select(col("user_id"),
        (unix_micros(col("ts")) / 86400000000L / 7L).cast("long").as("wk"))
      .distinct()
    val first = act.groupBy(col("user_id")).agg(min(col("wk")).as("fw"))
    val prev = act.select(col("user_id"), (col("wk") + 1).as("wk"),
      lit(1).as("wasPrev"))
    val classed = act.join(first, Seq("user_id"))
      .join(prev, Seq("user_id", "wk"), "left")
      .withColumn("cls",
        when(col("wk") === col("fw"), lit("new"))
          .when(col("wasPrev").isNotNull, lit("retained"))
          .otherwise(lit("resurrected")))
      .groupBy(col("wk"))
      .agg(count(lit(1)).as("actives"),
        sum(when(col("cls") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("cls") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("cls") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"))
    val next = act.select(col("user_id"), col("wk"), lit(1).as("a"))
    val churn = act.select(col("user_id"), (col("wk") + 1).as("wk"))
      .join(next, Seq("user_id", "wk"), "left_anti")
      .groupBy(col("wk")).agg(count(lit(1)).as("n_churned"))
    classed.join(churn, Seq("wk"), "left")
      .select(col("wk").cast("long").as("week"),
        col("actives").cast("long").as("actives"),
        col("n_new").cast("long").as("n_new"),
        col("n_retained").cast("long").as("n_retained"),
        col("n_resurrected").cast("long").as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).cast("long").as("n_churned"))
      .orderBy(col("week"))
  }

  val q105Sql: String =
    """WITH act AS (
      | SELECT DISTINCT user_id,
      |  (epoch_ns(ts) // 1000) // 86400000000 // 7 AS wk
      | FROM events),
      |first AS (SELECT user_id, min(wk) AS fw FROM act GROUP BY 1),
      |classed AS (
      | SELECT a.wk,
      |  CASE WHEN a.wk = f.fw THEN 'new'
      |       WHEN p.user_id IS NOT NULL THEN 'retained'
      |       ELSE 'resurrected' END AS cls
      | FROM act a JOIN first f USING (user_id)
      | LEFT JOIN act p ON p.user_id = a.user_id AND p.wk = a.wk - 1),
      |weekly AS (
      | SELECT wk, count(*) AS actives,
      |  sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS n_new,
      |  sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS n_retained,
      |  sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS n_resurrected
      | FROM classed GROUP BY wk),
      |churn AS (
      | SELECT a.wk + 1 AS wk, count(*) AS n_churned
      | FROM act a
      | WHERE NOT EXISTS (SELECT 1 FROM act n
      |   WHERE n.user_id = a.user_id AND n.wk = a.wk + 1)
      | GROUP BY 1)
      |SELECT cast(w.wk as bigint) AS week,
      | cast(actives as bigint) AS actives,
      | cast(n_new as bigint) AS n_new,
      | cast(n_retained as bigint) AS n_retained,
      | cast(n_resurrected as bigint) AS n_resurrected,
      | cast(coalesce(c.n_churned, 0) as bigint) AS n_churned
      |FROM weekly w LEFT JOIN churn c USING (wk)
      |ORDER BY week""".stripMargin

  /** Dormancy & streak profile — the per-user engagement-shape
    * metrics churn models feed on: distinct active days, the LONGEST
    * inactivity gap between consecutive active days, and the longest
    * CONSECUTIVE-day streak (activity islands via the day − rank
    * trick: consecutive days share `day − row_number`). One distinct
    * pass, two windows sharing the per-user day sort, exact integer
    * days throughout. */
  def q106Dormancy(spark: SparkSession, dir: String): DataFrame = {
    val days = t(spark, dir, "events")
      .select(col("user_id"),
        (unix_micros(col("ts")) / 86400000000L).cast("long").as("day"))
      .distinct()
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val marked = days
      .withColumn("gap", col("day") - lag(col("day"), 1).over(byUser))
      .withColumn("isle", col("day") - row_number().over(byUser))
    val streaks = marked.groupBy(col("user_id"), col("isle"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id")).agg(max(col("len")).as("longest_streak"))
    marked.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_active_days"),
        coalesce(max(col("gap")), lit(0L)).as("max_gap_days"))
      .join(streaks, Seq("user_id"))
      .select(col("user_id"),
        col("n_active_days").cast("long").as("n_active_days"),
        col("max_gap_days").cast("long").as("max_gap_days"),
        col("longest_streak").cast("long").as("longest_streak"))
      .orderBy(col("user_id"))
  }

  val q106Sql: String =
    """WITH days AS (
      | SELECT DISTINCT user_id,
      |  (epoch_ns(ts) // 1000) // 86400000000 AS day
      | FROM events),
      |marked AS (
      | SELECT *, day - lag(day, 1) OVER w AS gap,
      |  day - row_number() OVER w AS isle
      | FROM days WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      |streaks AS (
      | SELECT user_id, max(len) AS longest_streak FROM (
      |  SELECT user_id, isle, count(*) AS len
      |  FROM marked GROUP BY 1, 2) GROUP BY 1)
      |SELECT m.user_id, cast(count(*) as bigint) AS n_active_days,
      | cast(coalesce(max(gap), 0) as bigint) AS max_gap_days,
      | cast(min(s.longest_streak) as bigint) AS longest_streak
      |FROM marked m JOIN streaks s USING (user_id)
      |GROUP BY m.user_id ORDER BY m.user_id""".stripMargin

  /** Sequential pattern mining (the 2-sequence core of GSP/SPADE) —
    * which behavior ORDERS are common, not just which co-occur: for
    * every ordered event-type pair (a ⇒ b, a ≠ b), the number of
    * users whose FIRST a precedes their first b, with support over
    * the user base and confidence over a's adopters — both exact
    * integer micro shares. First-occurrence semantics make the count
    * well-defined and the whole 20-row pattern table replays in
    * DuckDB. One per-(user, type) min-aggregate, one self-join on
    * the user (type-count bounded, ~25 rows per user), answer-sized
    * rollup — the shape that scales to arbitrary event volumes
    * because everything after the first-occurrence table is
    * user-type-grain. */
  def q107SeqPatterns(spark: SparkSession, dir: String): DataFrame = {
    val firsts = t(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(unix_micros(col("ts"))).as("m"))
    val nUsers = firsts.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val aSide = firsts.select(col("user_id"), col("event_type").as("a"),
      col("m").as("ma"))
    val aCounts = aSide.groupBy(col("a")).agg(count(lit(1)).as("na"))
    val bSide = firsts.select(col("user_id"), col("event_type").as("b"),
      col("m").as("mb"))
    aSide.join(bSide, Seq("user_id"))
      .filter(col("a") =!= col("b") && col("ma") < col("mb"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_seq"))
      .join(aCounts, Seq("a"))
      .crossJoin(broadcast(nUsers))
      .select(col("a"), col("b"), col("n_seq").cast("long").as("n_seq"),
        expr("(n_seq * 1000000) div n_users").cast("long").as("support_micro"),
        expr("(n_seq * 1000000) div na").cast("long").as("confidence_micro"))
      .orderBy(col("a"), col("b"))
  }

  val q107Sql: String =
    """WITH firsts AS (
      | SELECT user_id, event_type, min(epoch_ns(ts) // 1000) AS m
      | FROM events GROUP BY 1, 2),
      |nu AS (SELECT count(DISTINCT user_id) AS n_users FROM firsts),
      |ac AS (SELECT event_type AS a, count(*) AS na FROM firsts GROUP BY 1),
      |seqs AS (
      | SELECT x.event_type AS a, y.event_type AS b, count(*) AS n_seq
      | FROM firsts x JOIN firsts y ON x.user_id = y.user_id
      | WHERE x.event_type <> y.event_type AND x.m < y.m
      | GROUP BY 1, 2)
      |SELECT a, b, cast(n_seq as bigint) AS n_seq,
      | cast((n_seq * 1000000) // n_users as bigint) AS support_micro,
      | cast((n_seq * 1000000) // na as bigint) AS confidence_micro
      |FROM seqs JOIN ac USING (a) CROSS JOIN nu
      |ORDER BY a, b""".stripMargin

  /** Period-over-period growth table — the WoW readout every revenue
    * dashboard leads with: weekly order revenue in exact cents, the
    * previous week alongside (one lag), and the SIGNED growth rate in
    * micro-units — divided magnitude-first (the q100 discipline) so
    * Spark's truncate-toward-zero and DuckDB's floor agree on
    * negative weeks. One weekly aggregate + one lag window over the
    * answer-sized week table. */
  def q108PopGrowth(spark: SparkSession, dir: String): DataFrame = {
    val weekly = t(spark, dir, "orders")
      .groupBy((unix_micros(col("o_orderdate")) / 86400000000L / 7L)
        .cast("long").as("week"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
    // lag(1) as a rank self-join on the answer-sized week table —
    // keeps even this bounded frame off the single-partition window
    val rn = DistRank.withRowNumber(weekly, Seq(col("week")), "rn")
    rn.join(broadcast(rn.select(col("rn").as("rnp"), col("rev").as("prev"))),
        col("rn") === col("rnp") + 1, "left")
      .drop("rnp", "rn")
      .withColumn("delta", col("rev") - col("prev"))
      .withColumn("growth_micro",
        when(col("prev").isNull, lit(null))
          .when(col("delta") >= 0, expr("(delta * 1000000) div prev"))
          .otherwise(-expr("((-delta) * 1000000) div prev")))
      .select(col("week"), col("rev").cast("long").as("rev_cents"),
        col("prev").cast("long").as("prev_cents"),
        col("growth_micro").cast("long").as("growth_micro"))
      .orderBy(col("week"))
  }

  val q108Sql: String =
    """WITH weekly AS (
      | SELECT (epoch_ns(o_orderdate) // 1000) // 86400000000 // 7 AS week,
      |  sum(cast(round(o_totalprice * 100) as bigint)) AS rev
      | FROM orders GROUP BY 1),
      |lagged AS (
      | SELECT week, rev, lag(rev, 1) OVER (ORDER BY week) AS prev
      | FROM weekly)
      |SELECT week, cast(rev as bigint) AS rev_cents,
      | cast(prev as bigint) AS prev_cents,
      | cast(CASE WHEN prev IS NULL THEN NULL
      |   WHEN rev - prev >= 0 THEN ((rev - prev) * 1000000) // prev
      |   ELSE -((prev - rev) * 1000000) // prev END as bigint) AS growth_micro
      |FROM lagged ORDER BY week""".stripMargin

  /** Single changepoint detection — the offline split-score form of
    * CUSUM: per event type, over the day-ordered daily value totals,
    * find the split maximizing the between-segment separation
    * `n_l·n_r·(μ_l − μ_r)² div n` — the two-segment least-squares
    * objective, computed for EVERY candidate split in one pass from
    * prefix sums (two shared-sort windows), all exact integers.
    * Division discipline: Spark `div` truncates toward zero, and the
    * installed DuckDB's `//` was MEASURED to also truncate
    * (-7 // 2 = -3, matching the q125 Holt finding) — but `//`
    * semantics differ across DuckDB versions, so the oracle spells
    * every mean as sign-split magnitude division (the q100 pattern),
    * an identity under truncation that keeps the engines in
    * agreement under EITHER `//` semantics if a day's value total
    * goes negative. Overflow:
    * `t·(n−t)·d²` needs |d| < √(2⁶³/(n²/4)) — with calendar-bounded n
    * (≤ ~3.6k days) that is ~$16k of daily-mean shift in cents,
    * spec-asserted against the data (Round12Spec). Reports where each
    * type's level shifted and how hard. At 100 TB the per-type series
    * are calendar-bounded; nothing is quadratic. */
  def metaChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"),
        (unix_micros(col("ts")) / 86400000000L).cast("long").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val byType = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val cumw = byType.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily
      .withColumn("t", row_number().over(byType).cast("long"))
      .withColumn("sl", sum(col("cents")).over(cumw))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("stot", sum(col("cents")).over(
        Window.partitionBy(col("event_type"))))
      .filter(col("t") < col("n"))
      .withColumn("d",
        expr("sl div t") - expr("(stot - sl) div (n - t)"))
      .withColumn("score", expr("(t * (n - t) * d * d) div n"))
    val pick = Window.partitionBy(col("event_type"))
      .orderBy(desc("score"), col("day"))
    scored.withColumn("rk", row_number().over(pick))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").cast("long").as("split_day"),
        col("score").cast("long").as("score"),
        expr("sl div t").cast("long").as("mean_left_cents"),
        expr("(stot - sl) div (n - t)").cast("long").as("mean_right_cents"))
      .orderBy(col("event_type"))
  }

  val metaChangepointSql: String =
    """WITH daily AS (
      | SELECT event_type, (epoch_ns(ts) // 1000) // 86400000000 AS day,
      |  sum(cast(round(value * 100) as bigint)) AS cents
      | FROM events GROUP BY 1, 2),
      |pre AS (
      | SELECT *, cast(row_number() OVER w as bigint) AS t,
      |  sum(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW) AS sl,
      |  count(*) OVER (PARTITION BY event_type) AS n,
      |  sum(cents) OVER (PARTITION BY event_type) AS stot
      | FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      |scored AS (
      | SELECT *,
      |  (CASE WHEN sl >= 0 THEN sl // t ELSE -((-sl) // t) END)
      |   - (CASE WHEN stot - sl >= 0 THEN (stot - sl) // (n - t)
      |           ELSE -((sl - stot) // (n - t)) END) AS d
      | FROM pre WHERE t < n),
      |picked AS (
      | SELECT *, (t * (n - t) * d * d) // n AS score,
      |  row_number() OVER (PARTITION BY event_type
      |    ORDER BY (t * (n - t) * d * d) // n DESC, day) AS rk
      | FROM scored)
      |SELECT event_type, cast(day as bigint) AS split_day,
      | cast(score as bigint) AS score,
      | cast(CASE WHEN sl >= 0 THEN sl // t ELSE -((-sl) // t) END
      |   as bigint) AS mean_left_cents,
      | cast(CASE WHEN stot - sl >= 0 THEN (stot - sl) // (n - t)
      |   ELSE -((sl - stot) // (n - t)) END as bigint) AS mean_right_cents
      |FROM picked WHERE rk = 1 ORDER BY event_type""".stripMargin

  /** Exact WEIGHTED median — the order statistic that respects row
    * importance (here: price cents weighted by quantity — "the price
    * at which half the UNITS moved", not half the line items): sort
    * by value within each group, take the first row whose cumulative
    * weight reaches half the total (lower weighted median — a pure
    * rank pick, no interpolation, bit-identical in both engines).
    * One sort-sharing window pair per group; per-group sequences
    * bound the work. Spark has no weighted percentile built-in —
    * this is the standard relational form. */
  def q109WeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("g"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        round(col("l_quantity")).cast("long").as("w"))
    val byG = Window.partitionBy(col("g")).orderBy(col("cents"))
    val cumw = byG.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.withColumn("cw", sum(col("w")).over(cumw))
      .withColumn("tw", sum(col("w")).over(Window.partitionBy(col("g"))))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy(col("g"))
      .agg(min(col("cents")).cast("long").as("wmedian_cents"),
        min(col("tw")).cast("long").as("total_weight"))
      .orderBy(col("g"))
      .select(col("g").as("l_returnflag"), col("wmedian_cents"),
        col("total_weight"))
  }

  val q109Sql: String =
    """WITH li AS (
      | SELECT l_returnflag AS g,
      |  cast(round(l_extendedprice * 100) as bigint) AS cents,
      |  cast(round(l_quantity) as bigint) AS w
      | FROM lineitem),
      |cum AS (
      | SELECT *, sum(w) OVER (PARTITION BY g ORDER BY cents
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |  sum(w) OVER (PARTITION BY g) AS tw
      | FROM li)
      |SELECT g AS l_returnflag,
      | cast(min(cents) as bigint) AS wmedian_cents,
      | cast(min(tw) as bigint) AS total_weight
      |FROM cum WHERE cw * 2 >= tw
      |GROUP BY g ORDER BY l_returnflag""".stripMargin

  /** Tukey IQR outlier fences — the boxplot rule beside the
    * median/MAD robust twin (meta_anomaly_mad): exact rank-pick
    * quartiles (value at ceil(n/4), ceil(3n/4) — no interpolation),
    * fences at quartile ± 1.5·IQR computed in integer half-cents
    * (×2 clears the 1.5 without touching floats), and per-type
    * outlier counts on both tails. One sort-sharing rank window per
    * type + answer-sized rollup. */
  def metaOutlierIqr(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val byT = Window.partitionBy(col("event_type")).orderBy(col("cents"))
    val ranked = ev
      .withColumn("rk", row_number().over(byT).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    val quarts = ranked
      .withColumn("q1v", when(col("rk") === expr("(n + 3) div 4"), col("cents")))
      .withColumn("q3v", when(col("rk") === expr("(3 * n + 3) div 4"), col("cents")))
      .groupBy(col("event_type"))
      .agg(max(col("q1v")).as("q1"), max(col("q3v")).as("q3"))
      // half-cent units: lo2 = 2·q1 − 3·(q3−q1), hi2 = 2·q3 + 3·(q3−q1)
      .withColumn("lo2", expr("2 * q1 - 3 * (q3 - q1)"))
      .withColumn("hi2", expr("2 * q3 + 3 * (q3 - q1)"))
    ev.join(quarts, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        min(col("q1")).cast("long").as("q1_cents"),
        min(col("q3")).cast("long").as("q3_cents"),
        sum(when(col("cents") * 2 < col("lo2"), 1L).otherwise(0L))
          .cast("long").as("n_low_outliers"),
        sum(when(col("cents") * 2 > col("hi2"), 1L).otherwise(0L))
          .cast("long").as("n_high_outliers"))
      .orderBy(col("event_type"))
  }

  val metaOutlierIqrSql: String =
    """WITH ev AS (
      | SELECT event_type, cast(round(value * 100) as bigint) AS cents
      | FROM events),
      |ranked AS (
      | SELECT *, cast(row_number() OVER (PARTITION BY event_type
      |   ORDER BY cents) as bigint) AS rk,
      |  count(*) OVER (PARTITION BY event_type) AS n
      | FROM ev),
      |quarts AS (
      | SELECT event_type,
      |  max(CASE WHEN rk = (n + 3) // 4 THEN cents END) AS q1,
      |  max(CASE WHEN rk = (3 * n + 3) // 4 THEN cents END) AS q3
      | FROM ranked GROUP BY event_type)
      |SELECT e.event_type, cast(count(*) as bigint) AS n,
      | cast(min(q1) as bigint) AS q1_cents,
      | cast(min(q3) as bigint) AS q3_cents,
      | cast(sum(CASE WHEN e.cents * 2 < 2 * q1 - 3 * (q3 - q1)
      |   THEN 1 ELSE 0 END) as bigint) AS n_low_outliers,
      | cast(sum(CASE WHEN e.cents * 2 > 2 * q3 + 3 * (q3 - q1)
      |   THEN 1 ELSE 0 END) as bigint) AS n_high_outliers
      |FROM ev e JOIN quarts q USING (event_type)
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** Decile migration matrix — how customers MOVE between value
    * tiers: revenue deciles computed independently in each half of
    * the order history (date-midpoint split), joined per customer
    * active in both, counted per (decile-then, decile-now) cell. The
    * diagonal is stability, below it growth, above it decay — the
    * churn-risk targeting surface. Deterministic ntile cuts
    * ((revenue desc, key) total orders), exact cents, two
    * customer-grain windows, answer-sized matrix. */
  def q110DecileMigration(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_custkey").as("c"),
        (unix_micros(col("o_orderdate")) / 86400000000L).cast("long").as("day"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val cut = o.agg(expr("(min(day) + max(day) + 1) div 2").as("cut"))
    val halves = o.crossJoin(broadcast(cut))
      .withColumn("half", when(col("day") < col("cut"), 1).otherwise(2))
      .groupBy(col("half"), col("c")).agg(sum(col("cents")).as("rev"))
    def deciles(h: Int) = DistRank.withNtile(
        halves.filter(col("half") === h),
        Seq(desc("rev"), col("c")), 10, "d")
      .select(col("c"), col("d"))
    deciles(1).withColumnRenamed("d", "decile_then")
      .join(deciles(2).withColumnRenamed("d", "decile_now"), Seq("c"))
      .groupBy(col("decile_then"), col("decile_now"))
      .agg(count(lit(1)).cast("long").as("n_customers"))
      .orderBy(col("decile_then"), col("decile_now"))
  }

  val q110Sql: String =
    """WITH o AS (
      | SELECT o_custkey AS c,
      |  (epoch_ns(o_orderdate) // 1000) // 86400000000 AS day,
      |  cast(round(o_totalprice * 100) as bigint) AS cents
      | FROM orders),
      |cut AS (SELECT (min(day) + max(day) + 1) // 2 AS cut FROM o),
      |halves AS (
      | SELECT CASE WHEN day < cut THEN 1 ELSE 2 END AS half, c,
      |  sum(cents) AS rev
      | FROM o CROSS JOIN cut GROUP BY 1, 2),
      |d1 AS (
      | SELECT c, cast(ntile(10) OVER (ORDER BY rev DESC, c) as bigint) AS d
      | FROM halves WHERE half = 1),
      |d2 AS (
      | SELECT c, cast(ntile(10) OVER (ORDER BY rev DESC, c) as bigint) AS d
      | FROM halves WHERE half = 2)
      |SELECT d1.d AS decile_then, d2.d AS decile_now,
      | cast(count(*) as bigint) AS n_customers
      |FROM d1 JOIN d2 USING (c)
      |GROUP BY 1, 2 ORDER BY decile_then, decile_now""".stripMargin

  /** HYPOTHETICAL-SET aggregates — SQL:2003's `rank(v) WITHIN GROUP`
    * family ("what rank would a 5 000.00 balance take in each
    * segment?"), which Spark has no built-in for and the naive
    * implementation computes by SORTING the whole table. The identity
    * that makes it scale: every hypothetical-set function is a
    * COUNTING aggregate over the hypothetical insert —
    * `rank(v) = 1 + |{x > v}|` (desc), `dense_rank(v) = 1 +
    * |distinct x > v|`, `percent_rank(v) = |{x < v}| / n`,
    * `cume_dist(v) = (|{x ≤ v}| + 1) / (n + 1)` (the inserted row is
    * its own peer — PostgreSQL/SQL:2003 semantics) — so one
    * map-side-partial aggregation over the scan answers all of them
    * with NO sort, NO window, and an answer bounded by |groups|. The
    * only two-phase piece is the distinct count for dense_rank
    * (key-bounded by segment). Ratios are reported in integer basis
    * points (floor division) to stay engine-exact. */
  def q116HypotheticalRank(spark: SparkSession, dir: String): DataFrame = {
    val v = 500000L // hypothetical 5 000.00 balance, in cents
    t(spark, dir, "customer")
      .select(col("c_mktsegment").as("segment"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"),
        (sum(when(col("cents") > v, 1L).otherwise(0L)) + 1L).as("rank_desc"),
        (countDistinct(when(col("cents") > v, col("cents"))) + 1L)
          .cast("long").as("dense_rank_desc"),
        expr(s"(sum(CASE WHEN cents <= ${v}L THEN 1 ELSE 0 END) + 1) * 10000 " +
          "div (count(*) + 1)").as("cume_dist_bp"),
        expr(s"sum(CASE WHEN cents < ${v}L THEN 1 ELSE 0 END) * 10000 " +
          "div count(*)").as("percent_rank_asc_bp"))
      .orderBy(col("segment"))
  }

  val q116Sql: String =
    """WITH c AS (
      | SELECT c_mktsegment AS segment,
      |  cast(round(c_acctbal * 100) as bigint) AS cents
      | FROM customer)
      |SELECT segment, cast(count(*) as bigint) AS n,
      | cast(sum(CASE WHEN cents > 500000 THEN 1 ELSE 0 END) + 1 as bigint)
      |   AS rank_desc,
      | cast(count(DISTINCT CASE WHEN cents > 500000 THEN cents END) + 1 as bigint)
      |   AS dense_rank_desc,
      | cast((sum(CASE WHEN cents <= 500000 THEN 1 ELSE 0 END) + 1) * 10000
      |   // (count(*) + 1) as bigint) AS cume_dist_bp,
      | cast(sum(CASE WHEN cents < 500000 THEN 1 ELSE 0 END) * 10000
      |   // count(*) as bigint) AS percent_rank_asc_bp
      |FROM c GROUP BY segment ORDER BY segment""".stripMargin

  /** SPEARMAN rank correlation — "does account balance predict
    * spend?" asked the robust way (monotone association on ranks, no
    * normality assumption; the audit twin of Pearson that survives
    * outliers and skew): ρ = 1 − 6·Σd² / (n·(n²−1)) with d = the gap
    * between a customer's two GLOBAL ranks. Both rankings are
    * tie-free by construction (tie-break on custkey), so the classic
    * formula is exact and all-integer — ρ reported in basis points by
    * floor division, bit-identical in both engines. The rank moments
    * accumulate as decimal(38,0): worst-case Σd² = (n³−n)/3 means
    * 60000·Σd² wraps int64 already at n ≈ 7.7·10⁴ (even independent
    * rankings wrap at sf1's 150k customers), while the DuckDB side
    * sums in HUGEINT — decimal keeps Spark exact to n ≈ 1.7·10¹¹,
    * spec-asserted on a synthetic 10⁶-row reversed ranking. The
    * SCALE point: each global ranking runs through
    * [[graft.operators.DistRank]] — range partition, prefix-sum
    * offsets, partition-local rank — so correlating two rankings of a
    * 100 TB table never funnels it through one task, the exact
    * single-partition-window trap this round removed everywhere
    * else. The spend side is one map-side-partial aggregation of
    * orders; the join of the two rank tables is key-to-key. */
  def q117Spearman(spark: SparkSession, dir: String): DataFrame = {
    val bal = t(spark, dir, "customer")
      .select(col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val spend = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("sp"))
    val joined = bal.join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("bal_cents"),
        coalesce(col("sp"), lit(0L)).as("spend_cents"))
    val r1 = graft.operators.DistRank.withRowNumber(
      joined, Seq(col("bal_cents"), col("c_custkey")), "r_bal")
      .select(col("c_custkey"), col("r_bal"))
    val r2 = graft.operators.DistRank.withRowNumber(
      joined, Seq(col("spend_cents"), col("c_custkey")), "r_spend")
      .select(col("c_custkey").as("k2"), col("r_spend"))
    spearmanFromRanks(
      r1.join(r2, col("c_custkey") === col("k2")),
      col("r_bal"), col("r_spend"))
  }

  /** Spearman rank-moment arithmetic from two tie-free rank columns —
    * runs entirely in decimal(38,0): worst-case Σd² = (n³−n)/3, so
    * 60000·Σd² wraps int64 already at n ≈ 7.7·10⁴ (and even
    * independent rankings' Σd² ≈ n³/6 wraps at sf1's 150k customers),
    * while DuckDB accumulates in HUGEINT — decimal keeps Spark exact
    * to n ≈ 1.7·10¹¹ alongside the oracle at ANY row count, no
    * row-count branch needed (spec-asserted on a synthetic 10⁶-row
    * reversed ranking, where the closed form gives ρ = −1). The
    * bigint display cast of sum_d2 is safe to n ≈ 3·10⁶ (sf ~20);
    * rho_bp itself is exact at any n. */
  def spearmanFromRanks(ranked: DataFrame,
      ra: org.apache.spark.sql.Column,
      rb: org.apache.spark.sql.Column): DataFrame = {
    val dd = (ra - rb).cast(org.apache.spark.sql.types.DecimalType(38, 0))
    ranked
      .select((dd * dd).as("d2"))
      .agg(count(lit(1)).as("n"), sum(col("d2")).as("d2s"))
      .select(col("n"), col("d2s").cast("long").as("sum_d2"),
        // greatest(…, 1): rank correlation is undefined at n = 1 (the
        // formula's denominator is 0); the guard returns the vacuous
        // ρ = 1 there instead of diverging the engines (DuckDB //
        // raises on 0, Spark div returns null)
        expr("""cast(10000 - (cast(60000 as decimal(38,0)) * d2s) div
          greatest(cast(n as decimal(38,0)) *
            (cast(n as decimal(38,0)) * cast(n as decimal(38,0)) - 1),
            cast(1 as decimal(38,0))) as bigint)""").as("rho_bp"))
  }

  val q117Sql: String =
    """WITH joined AS (
      | SELECT c_custkey,
      |  cast(round(c_acctbal * 100) as bigint) AS bal_cents,
      |  cast(coalesce(sp, 0) as bigint) AS spend_cents
      | FROM customer LEFT JOIN (
      |  SELECT o_custkey, sum(cast(round(o_totalprice * 100) as bigint)) AS sp
      |  FROM orders GROUP BY o_custkey) o ON o_custkey = c_custkey),
      |ranked AS (
      | SELECT c_custkey,
      |  cast(row_number() OVER (ORDER BY bal_cents, c_custkey) as bigint)
      |    AS r_bal,
      |  cast(row_number() OVER (ORDER BY spend_cents, c_custkey) as bigint)
      |    AS r_spend
      | FROM joined)
      |SELECT cast(count(*) as bigint) AS n,
      | cast(sum((r_bal - r_spend) * (r_bal - r_spend)) as bigint) AS sum_d2,
      | cast(10000 - (60000 * sum((r_bal - r_spend) * (r_bal - r_spend)))
      |   // greatest(cast(count(*) as hugeint)
      |     * (cast(count(*) as hugeint) * count(*) - 1), 1) as bigint)
      |   AS rho_bp
      |FROM ranked""".stripMargin

  /** WALD–WOLFOWITZ RUNS TEST — "is the ingest sequence actually
    * random, or autocorrelated?" (the data-quality question behind
    * batch-vs-shuffled training order, sensor stuck-values, and
    * sorted-by-accident ingests): per event_type, each value in
    * event_id order is classed above/below the type's integer mean
    * (ties → above, documented), maximal same-class runs are counted
    * with the lag-based islands trick, and the observed run count is
    * compared to the null expectation E[R] = 1 + 2ab/(a+b) — too few
    * runs ⇒ clumping/trend, too many ⇒ alternation. Everything is
    * integer: the mean is a floor division, E[R] is carried in
    * milli-units, and the observed/expected ratio in basis points
    * (runs·10⁷ div E_milli — products ≤ 2·10¹³ at any plausible
    * per-type count). All windows are KEYED by event_type (lag + the
    * run rollup) — nothing global; one scan, answer bounded by
    * |event types|. */
  def metaRunsTest(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val means = ev.groupBy(col("event_type"))
      .agg(expr("sum(cents) div count(*)").as("mu"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
    val signed = ev.join(broadcast(means), Seq("event_type"))
      .withColumn("above", (col("cents") >= col("mu")).cast("long"))
      .withColumn("flip",
        when(lag(col("above"), 1).over(w).isNull, 1L)
          .when(lag(col("above"), 1).over(w) =!= col("above"), 1L)
          .otherwise(0L))
    signed.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("above")).as("n_above"),
        (count(lit(1)) - sum(col("above"))).as("n_below"),
        sum(col("flip")).as("n_runs"))
      .withColumn("expected_milli",
        expr("1000 + (2000 * n_above * n_below) div greatest(n_above + n_below, 1L)"))
      .withColumn("obs_vs_exp_bp",
        expr("n_runs * 10000000 div greatest(expected_milli, 1L)"))
      .orderBy(col("event_type"))
  }

  val metaRunsTestSql: String =
    """WITH ev AS (
      | SELECT event_type, event_id,
      |  cast(round(value * 100) as bigint) AS cents
      | FROM events),
      |means AS (
      | SELECT event_type, sum(cents) // count(*) AS mu
      | FROM ev GROUP BY event_type),
      |signed AS (
      | SELECT e.event_type, e.event_id,
      |  CASE WHEN e.cents >= m.mu THEN 1 ELSE 0 END AS above
      | FROM ev e JOIN means m USING (event_type)),
      |flips AS (
      | SELECT event_type, above,
      |  CASE WHEN lag(above) OVER (PARTITION BY event_type
      |         ORDER BY event_id) IS DISTINCT FROM above
      |       THEN 1 ELSE 0 END AS flip
      | FROM signed),
      |agg AS (
      | SELECT event_type, cast(count(*) as bigint) AS n,
      |  cast(sum(above) as bigint) AS n_above,
      |  cast(count(*) - sum(above) as bigint) AS n_below,
      |  cast(sum(flip) as bigint) AS n_runs
      | FROM flips GROUP BY event_type)
      |SELECT event_type, n, n_above, n_below, n_runs,
      | cast(1000 + (2000 * n_above * n_below)
      |   // greatest(n_above + n_below, 1) as bigint) AS expected_milli,
      | cast(n_runs * 10000000
      |   // greatest(1000 + (2000 * n_above * n_below)
      |     // greatest(n_above + n_below, 1), 1) as bigint) AS obs_vs_exp_bp
      |FROM agg ORDER BY event_type""".stripMargin

  /** EXACT 1-WASSERSTEIN (earth-mover) drift distance between the
    * click and purchase value distributions — the drift measure that
    * reports HOW FAR apart the distributions are in value units,
    * where `meta_drift_ks` only reports the max CDF gap:
    * W₁ = ∫|F_A − F_B| = Σᵢ (vᵢ₊₁ − vᵢ)·|F_A(vᵢ) − F_B(vᵢ)| over the
    * merged sorted values. Everything up to the last division is
    * EXACT: the CDF numerators are running counts from TWO
    * [[DistRank.withPrefix]] passes over the merged value order
    * (range partition + prefix carries — no single-partition window
    * for a 100 TB merge), the gap comes from a rank self-join on
    * rn+1 (keyed, never a global lead()), and each term
    * (gap)·|cumA·n_B − cumB·n_A| accumulates in decimal(38,0). Only
    * the final normalization by n_A·n_B drops to double through the
    * mirrored expression tree (q65 discipline, round 4) — W₁ in
    * cents. */
  def metaWasserstein(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ev = t(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"),
        round(col("value") * 100).cast("long").as("cents"),
        (col("event_type") === "click").cast("long").as("is_a"),
        (col("event_type") === "purchase").cast("long").as("is_b"))
    val sortCols = Seq(col("cents"), col("event_id"))
    val withA = DistRank.withPrefix(ev, sortCols, col("is_a"), "sum", "cum_a")
    val withB = DistRank.withPrefix(withA, sortCols, col("is_b"), "sum", "cum_b")
    val ranked = DistRank.withRowNumber(withB, sortCols, "rn")
      .select(col("rn"), col("cents"), col("cum_a"), col("cum_b"))
    val nexts = ranked.select((col("rn") - 1).as("rn"), col("cents").as("next_cents"))
    val d38 = DecimalType(38, 0)
    val counts = ev.agg(sum(col("is_a")).as("na"), sum(col("is_b")).as("nb"))
    // inner join: the max-rank row has no successor — its gap is 0 by
    // definition (F_A = F_B = 1 beyond the last value)
    ranked.join(nexts, Seq("rn"))
      .crossJoin(broadcast(counts))
      .select(((col("next_cents") - col("cents")).cast(d38) *
        abs(col("cum_a").cast(d38) * col("nb") - col("cum_b").cast(d38) * col("na")))
        .as("term"), col("na"), col("nb"))
      .groupBy(col("na"), col("nb"))
      .agg(sum(col("term")).as("tot"))
      .select(col("na").as("n_click"), col("nb").as("n_purchase"),
        round(col("tot").cast("double") /
          (col("na").cast("double") * col("nb").cast("double")), 4)
          .as("w1_cents"))
  }

  val metaWassersteinSql: String =
    """WITH ev AS (
      | SELECT event_id, cast(round(value * 100) as bigint) AS cents,
      |  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a,
      |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_b
      | FROM events WHERE event_type IN ('click', 'purchase')),
      |ranked AS (
      | SELECT cents,
      |  sum(is_a) OVER w AS cum_a, sum(is_b) OVER w AS cum_b,
      |  row_number() OVER (ORDER BY cents, event_id) AS rn
      | FROM ev WINDOW w AS (ORDER BY cents, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |terms AS (
      | SELECT cast(n.cents - r.cents as hugeint) *
      |   abs(cast(r.cum_a as hugeint) * (SELECT sum(is_b) FROM ev)
      |     - cast(r.cum_b as hugeint) * (SELECT sum(is_a) FROM ev)) AS term
      | FROM ranked r JOIN ranked n ON n.rn = r.rn + 1)
      |SELECT cast((SELECT sum(is_a) FROM ev) as bigint) AS n_click,
      | cast((SELECT sum(is_b) FROM ev) as bigint) AS n_purchase,
      | round(cast(sum(term) as double) /
      |  (cast((SELECT sum(is_a) FROM ev) as double) *
      |   cast((SELECT sum(is_b) FROM ev) as double)), 4) AS w1_cents
      |FROM terms""".stripMargin

  /** ONE-WAY ANOVA — "do the segment means actually differ, or is
    * the spread noise?" (Fisher's F): between-group vs within-group
    * variance of account balances across market segments. The
    * sufficient statistics (per group: n_g, S_g, SS_g in cents) are
    * EXACT integer aggregates — map-side partial, |groups| rows — and
    * the F statistic derives from them in double through an
    * expression tree the oracle mirrors term for term (the q65
    * discipline: exact integers in, IEEE arithmetic out, round 4).
    * SSB = Σ S_g²/n_g − S²/n, SSW = ΣSS − Σ S_g²/n_g,
    * F = (SSB/(k−1)) / (SSW/(n−k)). One scan, answer one row; no
    * second pass for the within-group deviations (the moment identity
    * does that algebraically). */
  def q122Anova(spark: SparkSession, dir: String): DataFrame = {
    // x in whole dollars (⌊acctbal⌋, the sample_neyman unit discipline);
    // the squared sums S_g² and S² run in decimal(38,0) (DuckDB:
    // HUGEINT) — int64 would wrap past ~3e9-dollar group sums — and the
    // floor-divided Σ S_g²/n_g is a DETERMINISTIC integer (a float sum
    // over groups would be partition-order dependent; dividends are
    // squares ≥ 0, so Spark div ≡ DuckDB //). The ≤1-unit-per-group
    // floor loss is the declared statistic's definition, mirrored in
    // the oracle.
    val g = t(spark, dir, "customer")
      .select(col("c_mktsegment").as("seg"),
        floor(col("c_acctbal")).cast("long").as("x"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("sg"),
        sum(col("x") * col("x")).as("ssg"))
    g.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(col("sg")).as("s"), sum(col("ssg")).as("ss"),
        sum(expr("cast(sg as decimal(38,0)) * sg div ng")).as("sb"))
      .select(col("k"), col("n"),
        round(
          ((col("sb") - expr("cast(s as decimal(38,0)) * s div n"))
            .cast("double") /
            (col("k") - 1).cast("double")) /
            ((col("ss") - col("sb")).cast("double") /
              (col("n") - col("k")).cast("double")),
          4).as("f_stat"))
  }

  val q122Sql: String =
    """WITH g AS (
      | SELECT c_mktsegment AS seg, count(*) AS ng,
      |  sum(cast(floor(c_acctbal) as bigint)) AS sg,
      |  sum(cast(floor(c_acctbal) as bigint)
      |    * cast(floor(c_acctbal) as bigint)) AS ssg
      | FROM customer GROUP BY c_mktsegment),
      |m AS (
      | SELECT cast(count(*) as bigint) AS k, cast(sum(ng) as bigint) AS n,
      |  cast(sum(sg) as bigint) AS s, cast(sum(ssg) as bigint) AS ss,
      |  cast(sum(cast(sg as hugeint) * sg // ng) as bigint) AS sb
      | FROM g)
      |SELECT k, n,
      | round((cast(sb - cast(s as hugeint) * s // n as double)
      |    / cast(k - 1 as double)) /
      |   (cast(ss - sb as double) / cast(n - k as double)), 4) AS f_stat
      |FROM m""".stripMargin

  /** HOLT LINEAR-TREND forecasting (double exponential smoothing,
    * Holt 1957) — the first real forecasting step past q92's EWMA
    * (which tracks level only and lags every trend): per event_type,
    * daily revenue feeds the coupled level/trend recursion
    * `l_t = v_t/5 + 4(l+b)/5`, `b_t = (l_t−l)/10 + 9b/10`
    * (α = 1/5, β = 1/10) carried EXACTLY in integer milli-cents with
    * Java's truncating `/` — measured (not assumed) to match DuckDB's
    * `//`, which TRUNCATES toward zero (`SELECT -7 // 2` = −3), so
    * negative trends agree exactly. A recursion is inherently sequential
    * PER KEY, so the physical shape is the secondary-sort pattern
    * (repartition by type, sort (type, day) within partitions, one
    * O(1)-state pass) — per-series scan parallelized across series,
    * which is exactly how a 100 TB fleet of per-key time series
    * forecasts. Output: final level/trend and the 7-step-ahead
    * forecast per type; oracle = an unrolled recursive CTE over the
    * same ordered days. */
  def q125HoltForecast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
      .select(col("event_type"), col("day"), col("v"))
    val folded = daily
      .repartition(col("event_type"))
      .sortWithinPartitions(col("event_type"), col("day"))
      .as[(String, java.sql.Timestamp, Long)]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long, Long, Long)]
        var cur: String = null
        var n = 0L; var l = 0L; var b = 0L; var prevV = 0L
        def flush(): Unit =
          if (cur != null) out += ((cur, n, l, b))
        for ((tpe, _, v) <- it) {
          if (tpe != cur) { flush(); cur = tpe; n = 0L; l = 0L; b = 0L }
          val vm = v * 1000L
          if (n == 0) l = vm
          else if (n == 1) { b = vm - l; l = vm }
          else {
            val l1 = vm / 5L + 4L * (l + b) / 5L
            b = (l1 - l) / 10L + 9L * b / 10L
            l = l1
          }
          prevV = v; n += 1
        }
        flush()
        out.iterator
      }
      .toDF("event_type", "n_days", "level_milli", "trend_milli")
    folded
      .select(col("event_type"), col("n_days"), col("level_milli"),
        col("trend_milli"),
        (col("level_milli") + lit(7L) * col("trend_milli")).as("forecast7_milli"))
      .orderBy(col("event_type"))
  }

  val q125Sql: String =
    """WITH RECURSIVE daily AS (
      | SELECT event_type, date_trunc('day', ts) AS day,
      |  sum(cast(round(value * 100) as bigint)) AS v
      | FROM events GROUP BY 1, 2),
      |seq AS (
      | SELECT event_type, v,
      |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
      |  count(*) OVER (PARTITION BY event_type) AS n
      | FROM daily),
      |holt(event_type, rn, n, l, b) AS (
      | SELECT event_type, 1, n, v * 1000, cast(0 as bigint)
      | FROM seq WHERE rn = 1
      | UNION ALL
      | SELECT s.event_type, s.rn, h.n,
      |  CASE WHEN s.rn = 2 THEN s.v * 1000
      |       ELSE (s.v * 1000) // 5 + (4 * (h.l + h.b)) // 5 END,
      |  CASE WHEN s.rn = 2 THEN s.v * 1000 - h.l
      |       ELSE ((s.v * 1000) // 5 + (4 * (h.l + h.b)) // 5 - h.l) // 10
      |            + (9 * h.b) // 10 END
      | FROM holt h JOIN seq s
      |  ON s.event_type = h.event_type AND s.rn = h.rn + 1)
      |SELECT event_type, cast(n as bigint) AS n_days,
      | cast(l as bigint) AS level_milli, cast(b as bigint) AS trend_milli,
      | cast(l + 7 * b as bigint) AS forecast7_milli
      |FROM holt WHERE rn = n
      |ORDER BY event_type""".stripMargin

  /** HOLT–WINTERS additive seasonal smoothing (Winters, Mgmt Sci '60)
    * — the SEASONAL completion of [[q125HoltForecast]]'s level+trend
    * pair: a third recurrence tracks a 7-slot weekly profile, so the
    * h-step forecast is level + h·trend + the season of the target
    * weekday. Committed integer recurrences (α=1/5, β=1/10, γ=1/4,
    * milli-units, truncating division — identical in Scala `/` and
    * DuckDB `//`): init at day 7 with l₀ = mean of the first week,
    * b₀ = 0, s_i = v_i − l₀; then
    * l' = (v−s_slot) div 5 + 4(l+b) div 5, b' = (l'−l) div 10 +
    * 9b div 10, s_slot' = (v−l') div 4 + 3·s_slot div 4. Types with
    * fewer than 8 days are excluded (no update ever ran).
    *
    * Scale shape: the recurrence is inherently sequential IN TIME but
    * embarrassingly parallel ACROSS SERIES — the fold runs inside
    * mapPartitions after one repartition+sort by series key, so state
    * is O(m) per series and no driver collect exists (same shape as
    * q125/q126). The oracle unrolls the same recurrences as a
    * recursive CTE whose seasonal state is a LIST column rebuilt
    * slot-by-slot each step. */
  def q130HoltWinters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = 7
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
      .select(col("event_type"), col("day"), col("v"))
    daily
      .repartition(col("event_type"))
      .sortWithinPartitions(col("event_type"), col("day"))
      .as[(String, java.sql.Timestamp, Long)]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long, Long, Long, Long, Long, Long)]
        var cur: String = null
        var n = 0L; var l = 0L; var b = 0L
        val s = new Array[Long](m)
        val head = scala.collection.mutable.ArrayBuffer.empty[Long]
        def flush(): Unit = if (cur != null && n >= 8) {
          val f = (1 to 3).map(h => l + h * b + s(((n + h - 1) % m).toInt))
          out += ((cur, n, l, b, f(0), f(1), f(2)))
        }
        for ((tpe, _, v) <- it) {
          if (tpe != cur) {
            flush(); cur = tpe; n = 0; l = 0; b = 0; head.clear()
          }
          val vm = v * 1000L
          n += 1
          if (n <= m) {
            head += vm
            if (n == m) {
              l = head.sum / m
              var i = 0
              while (i < m) { s(i) = head(i) - l; i += 1 }
              b = 0L
            }
          } else {
            val idx = ((n - 1) % m).toInt
            val sea = s(idx)
            val l1 = (vm - sea) / 5L + 4L * (l + b) / 5L
            b = (l1 - l) / 10L + 9L * b / 10L
            s(idx) = (vm - l1) / 4L + 3L * sea / 4L
            l = l1
          }
        }
        flush()
        out.iterator
      }
      .toDF("event_type", "n_days", "level_milli", "trend_milli",
        "f1_milli", "f2_milli", "f3_milli")
      .orderBy(col("event_type"))
  }

  val q130Sql: String =
    """WITH RECURSIVE daily AS (
      | SELECT event_type, date_trunc('day', ts) AS day,
      |  sum(cast(round(value * 100) as bigint)) AS v
      | FROM events GROUP BY 1, 2),
      |seq AS (
      | SELECT event_type, v,
      |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
      |  count(*) OVER (PARTITION BY event_type) AS n
      | FROM daily),
      |init AS (
      | SELECT event_type, any_value(n) AS n,
      |  cast(sum(v * 1000) // 7 as bigint) AS l0,
      |  list(v * 1000 ORDER BY rn) AS vs
      | FROM seq WHERE rn <= 7 GROUP BY event_type
      | HAVING count(*) = 7),
      |hw(event_type, rn, n, l, b, s) AS (
      | SELECT event_type, 7, n, l0, cast(0 as bigint),
      |  [x - l0 FOR x IN vs]
      | FROM init
      | UNION ALL
      | SELECT q.event_type, q.rn, h.n,
      |  (q.v * 1000 - h.s[((q.rn - 1) % 7) + 1]) // 5 + (4 * (h.l + h.b)) // 5,
      |  ((q.v * 1000 - h.s[((q.rn - 1) % 7) + 1]) // 5 + (4 * (h.l + h.b)) // 5
      |    - h.l) // 10 + (9 * h.b) // 10,
      |  [CASE WHEN i = ((q.rn - 1) % 7) + 1
      |    THEN (q.v * 1000 -
      |      ((q.v * 1000 - h.s[i]) // 5 + (4 * (h.l + h.b)) // 5)) // 4
      |      + (3 * h.s[i]) // 4
      |    ELSE h.s[i] END FOR i IN range(1, 8)]
      | FROM hw h JOIN seq q
      |  ON q.event_type = h.event_type AND q.rn = h.rn + 1)
      |SELECT event_type, cast(n as bigint) AS n_days,
      | cast(l as bigint) AS level_milli, cast(b as bigint) AS trend_milli,
      | cast(l + 1 * b + s[((n + 0) % 7) + 1] as bigint) AS f1_milli,
      | cast(l + 2 * b + s[((n + 1) % 7) + 1] as bigint) AS f2_milli,
      | cast(l + 3 * b + s[((n + 2) % 7) + 1] as bigint) AS f3_milli
      |FROM hw WHERE rn = n AND n >= 8
      |ORDER BY event_type""".stripMargin

  /** Committed lead–lag panel: (driver, follower) series pairs whose
    * cross-correlation a growth analyst actually reads. */
  private val ccPairs = Seq(
    ("click", "purchase"), ("view", "click"), ("signup", "purchase"))

  /** CROSS-CORRELATION at lags −3..+3 between pairs of per-type daily
    * series — the LEAD–LAG companion to [[metaAutocorrelation]]'s
    * self-similarity: ccf(a→b, k) > ccf(a→b, 0) at k > 0 means a
    * LEADS b by k days (clicks today, purchases in two days), the
    * question attribution models start from. Same integer centering
    * (μ = Σv div n) and Σ dᵃ·dᵇ cross-sums as the ACF entry;
    * normalization √(ssₐ)·√(ss_b) is taken as two separate sqrt
    * calls so no int64 product of two ~10¹⁰ sums ever forms, and the
    * quotient is rounded to 4 dp (both engines' IEEE sqrt/÷ are
    * correctly rounded ⇒ cell-exact).
    *
    * Scale shape: series aggregate first; the (pair, lag) grid is a
    * 21-row broadcast; each cross-sum is one equi-join on
    * (type, rn+lag) over calendar-bounded series — nothing here is
    * data-sized after the daily rollup. Centered series and ss stats
    * are each checkpointed once (consumed per lag). */
  def q132CrossCorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
    val mu = daily.groupBy(col("event_type"))
      .agg(expr("sum(v) div count(*)").as("mu"))
    val centered = daily.join(broadcast(mu), Seq("event_type"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("day"))).cast("long"))
      .select(col("event_type"), col("rn"), (col("v") - col("mu")).as("d"))
      .localCheckpoint(true)
    // deviation products in decimal(38,0) (DuckDB: HUGEINT): a daily
    // aggregate past ~3e9 cents makes d² wrap int64 in the single
    // multiply — plausible at the 100 TB event volume this serves
    val ss = centered.groupBy(col("event_type"))
      .agg(sum(expr("cast(d as decimal(38,0)) * d")).as("ss"))
      .localCheckpoint(true)
    val grid = spark.createDataFrame(for {
      (a, b) <- ccPairs; k <- -3 to 3
    } yield (a, b, k.toLong)).toDF("a", "b", "lag")
    val ca = centered.select(col("event_type").as("a"), col("rn"), col("d").as("da"))
    val cb = centered.select(col("event_type").as("bb"), col("rn").as("rnb"), col("d").as("db"))
    broadcast(grid).join(ca, Seq("a"))
      .join(cb, col("bb") === col("b") && col("rnb") === col("rn") + col("lag"))
      .groupBy(col("a"), col("b"), col("lag"))
      .agg(count(lit(1)).as("n_overlap"),
        sum(expr("cast(da as decimal(38,0)) * db")).as("cross"))
      .join(broadcast(ss.select(col("event_type").as("a"), col("ss").as("ssa"))), Seq("a"))
      .join(broadcast(ss.select(col("event_type").as("b"), col("ss").as("ssb"))), Seq("b"))
      .select(col("a"), col("b"), col("lag"), col("n_overlap"),
        // a constant daily series has ss = 0: ccf is undefined there
        // (0/0 → NaN in Spark vs DuckDB float-div) — the tau_b
        // degenerate-series guard discipline
        when(col("ssa") > 0 && col("ssb") > 0,
          round(col("cross").cast("double") /
            (sqrt(col("ssa").cast("double")) *
              sqrt(col("ssb").cast("double"))), 4)).as("ccf"))
      .orderBy(col("a"), col("b"), col("lag"))
  }

  lazy val q132Sql: String = {
    val gridRows = (for { (a, b) <- ccPairs; k <- -3 to 3 }
      yield s"('$a', '$b', $k)").mkString(", ")
    s"""WITH daily AS (
       | SELECT event_type, date_trunc('day', ts) AS day,
       |  sum(cast(round(value * 100) as bigint)) AS v
       | FROM events GROUP BY 1, 2),
       |mu AS (SELECT event_type, sum(v) // count(*) AS mu
       |       FROM daily GROUP BY event_type),
       |c AS (
       | SELECT d.event_type,
       |  cast(row_number() OVER (PARTITION BY d.event_type ORDER BY d.day)
       |    as bigint) AS rn,
       |  d.v - m.mu AS dd
       | FROM daily d JOIN mu m USING (event_type)),
       |ss AS (SELECT event_type, sum(cast(dd as hugeint) * dd) AS ss
      |       FROM c GROUP BY 1),
       |grid(a, b, lag) AS (VALUES $gridRows),
       |x AS (
       | SELECT g.a, g.b, cast(g.lag as bigint) AS lag,
       |  cast(count(*) as bigint) AS n_overlap,
       |  sum(cast(ca.dd as hugeint) * cb.dd) AS crs
       | FROM grid g
       |  JOIN c ca ON ca.event_type = g.a
       |  JOIN c cb ON cb.event_type = g.b AND cb.rn = ca.rn + g.lag
       | GROUP BY 1, 2, 3)
       |SELECT x.a, x.b, x.lag, x.n_overlap,
       | CASE WHEN sa.ss > 0 AND sb.ss > 0 THEN
       |  round(cast(x.crs as double) /
       |   (sqrt(cast(sa.ss as double)) * sqrt(cast(sb.ss as double))), 4)
       | END AS ccf
       |FROM x JOIN ss sa ON sa.event_type = x.a
       |       JOIN ss sb ON sb.event_type = x.b
       |ORDER BY x.a, x.b, x.lag""".stripMargin
  }

  /** KAPLAN–MEIER survival estimator (Kaplan & Meier, JASA '58) —
    * survival analysis enters the registry as the censoring-correct
    * upgrade of [[q102 time-to-convert]]-style means: S(t) = Π_{tᵢ≤t}
    * (1 − dᵢ/nᵢ) over the time-to-first-purchase life table. The
    * event is a user's FIRST purchase, measured in days from their
    * first event; users who never purchase are CENSORED at their last
    * observed day — a plain conversion-time average silently drops
    * them and biases fast. The product folds in integer MILLI-units
    * with truncating division per step (S' = S·(nᵢ−dᵢ) div nᵢ) — a
    * committed deterministic grid both engines share exactly; no
    * float product reassociation anywhere.
    *
    * Scale shape: the ONLY data-sized pass is the per-user
    * first/last/first-purchase aggregate (one shuffle on user_id).
    * The life table is CALENDAR-BOUNDED, so its at-risk counts route
    * through DistRank (no single-partition window) and the
    * sequential KM fold runs over the answer-sized single partition
    * — the q125/q130 fold discipline, never a data-sized driver
    * loop. Oracle: recursive CTE over the same life table with the
    * same milli recurrence. */
  def q133KaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val users = t(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("d0"),
        max(to_date(col("ts"))).as("dlast"),
        min(when(col("event_type") === "purchase", to_date(col("ts"))))
          .as("dconv"))
    val spans = users.select(
      when(col("dconv").isNotNull, datediff(col("dconv"), col("d0")))
        .otherwise(datediff(col("dlast"), col("d0")))
        .cast("long").as("t"),
      col("dconv").isNotNull.cast("long").as("observed"))
    val grouped = spans.groupBy(col("t"))
      .agg(count(lit(1)).as("cnt"), sum(col("observed")).as("d"))
    // at-risk nᵢ = #users with duration ≥ tᵢ: total − prefix(cnt) + cnt
    val withPre = graft.operators.DistRank.withPrefix(
      grouped, Seq(col("t")), col("cnt"), "sum", "cum")
    val total = spans.agg(count(lit(1)).as("n_total"))
    withPre.crossJoin(broadcast(total))
      .select(col("t"), col("cnt"), col("d"),
        (col("n_total") - col("cum") + col("cnt")).as("n_risk"))
      .repartition(1).sortWithinPartitions(col("t"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        var s = 1000000L
        it.map { case (t0, cnt, d, nRisk) =>
          s = s * (nRisk - d) / nRisk
          (t0, nRisk, d, cnt, s)
        }
      }
      .toDF("t_days", "n_risk", "n_events", "n_ending", "surv_milli")
      .orderBy(col("t_days"))
  }

  val q133Sql: String =
    """WITH RECURSIVE users AS (
      | SELECT user_id, min(cast(ts as date)) AS d0,
      |  max(cast(ts as date)) AS dlast,
      |  min(CASE WHEN event_type = 'purchase' THEN cast(ts as date) END)
      |    AS dconv
      | FROM events GROUP BY user_id),
      |spans AS (
      | SELECT CASE WHEN dconv IS NOT NULL
      |   THEN cast(date_diff('day', d0, dconv) as bigint)
      |   ELSE cast(date_diff('day', d0, dlast) as bigint) END AS t,
      |  CASE WHEN dconv IS NOT NULL THEN 1 ELSE 0 END AS observed
      | FROM users),
      |grouped AS (
      | SELECT t, cast(count(*) as bigint) AS cnt,
      |  cast(sum(observed) as bigint) AS d
      | FROM spans GROUP BY t),
      |tot AS (SELECT cast(count(*) as bigint) AS n_total FROM spans),
      |life AS (
      | SELECT g.t, g.cnt, g.d,
      |  cast(tt.n_total - sum(g.cnt) OVER (ORDER BY g.t) + g.cnt as bigint)
      |    AS n_risk,
      |  cast(row_number() OVER (ORDER BY g.t) as bigint) AS rn
      | FROM grouped g, tot tt),
      |km(rn, t, n_risk, d, cnt, s) AS (
      | SELECT rn, t, n_risk, d, cnt, 1000000 * (n_risk - d) // n_risk
      | FROM life WHERE rn = 1
      | UNION ALL
      | SELECT l.rn, l.t, l.n_risk, l.d, l.cnt,
      |  k.s * (l.n_risk - l.d) // l.n_risk
      | FROM km k JOIN life l ON l.rn = k.rn + 1)
      |SELECT t AS t_days, n_risk, d AS n_events, cnt AS n_ending,
      | cast(s as bigint) AS surv_milli
      |FROM km ORDER BY t_days""".stripMargin

  /** PRICE INDICES (Laspeyres 1871 / Paasche 1874 / Fisher 1922) —
    * the canonical economics aggregates over the lineitem panel: how
    * did part prices move month over month, weighted by base-period
    * quantities (Laspeyres: what the OLD basket costs now), by
    * current quantities (Paasche: what the NEW basket would have
    * cost), and their geometric compromise (Fisher ideal, reported as
    * the integer sqrt of the L·P product in basis points). Prices
    * are per-part monthly mean unit prices in cents (exact integer
    * division of cent sums by quantities); only parts present in
    * BOTH the base month and the report month enter (matched-model
    * index — the standard treatment of entry/exit).
    *
    * Scale shape: one aggregation to (part, month) grain — the only
    * data-sized pass — then every index is an equi-join of a month
    * slice against the broadcast base-month slice, part-grain all
    * the way. isqrt is exact integer Newton (both engines share the
    * committed floor-sqrt semantics via their native isqrt/floor). */
  def q135PriceIndex(spark: SparkSession, dir: String): DataFrame = {
    val pm = t(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
          .cast("long").as("m"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .select(col("pk"), col("m"), col("qty"),
        expr("cents div qty").as("p")) // unit price, cents
      .localCheckpoint(true) // consumed by the base slice and every month
    val base = pm.agg(min(col("m")).as("m0"))
    val baseSlice = pm.join(broadcast(base), col("m") === col("m0"))
      .select(col("pk"), col("p").as("p0"), col("qty").as("q0"))
    pm.join(broadcast(baseSlice), Seq("pk"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("p") * col("q0")).as("lnum"),
        sum(col("p0") * col("q0")).as("lden"),
        sum(col("p") * col("qty")).as("pnum"),
        sum(col("p0") * col("qty")).as("pden"))
      .select(col("m").as("month_idx"), col("n_parts"),
        expr("lnum * 10000 div lden").as("laspeyres_bp"),
        expr("pnum * 10000 div pden").as("paasche_bp"),
        // floor BEFORE the int cast: Spark's double->bigint cast
        // truncates but DuckDB's ROUNDS — floor() makes both exact
        expr("cast(floor(sqrt(cast((lnum * 10000 div lden) as double) * " +
          "cast((pnum * 10000 div pden) as double))) as bigint)")
          .as("fisher_bp"))
      .orderBy(col("month_idx"))
  }

  val q135Sql: String =
    """WITH pm AS (
      | SELECT l_partkey AS pk,
      |  cast(year(l_shipdate) * 12 + month(l_shipdate) - 1 as bigint) AS m,
      |  cast(sum(l_quantity) as bigint) AS qty,
      |  cast(sum(cast(round(l_extendedprice * 100) as bigint))
      |    // sum(cast(l_quantity as bigint)) as bigint) AS p
      | FROM lineitem GROUP BY 1, 2),
      |b AS (SELECT min(m) AS m0 FROM pm),
      |base AS (
      | SELECT pk, p AS p0, qty AS q0 FROM pm, b WHERE pm.m = b.m0)
      |SELECT pm.m AS month_idx, cast(count(*) as bigint) AS n_parts,
      | cast(sum(pm.p * base.q0) * 10000 // sum(base.p0 * base.q0) as bigint)
      |   AS laspeyres_bp,
      | cast(sum(pm.p * pm.qty) * 10000 // sum(base.p0 * pm.qty) as bigint)
      |   AS paasche_bp,
      | cast(floor(sqrt(
      |   cast(sum(pm.p * base.q0) * 10000 // sum(base.p0 * base.q0)
      |     as double) *
      |   cast(sum(pm.p * pm.qty) * 10000 // sum(base.p0 * pm.qty) as double)))
      |   as bigint) AS fisher_bp
      |FROM pm JOIN base USING (pk)
      |GROUP BY pm.m ORDER BY month_idx""".stripMargin

  /** Committed numeric panel for the correlation matrix: column name →
    * integer-scaled expression (cents / hundredths — exact sums). */
  private val corrCols: Seq[(String, String)] = Seq(
    ("qty", "cast(l_quantity as bigint)"),
    ("price_c", "cast(round(l_extendedprice * 100) as bigint)"),
    ("disc_c", "cast(round(l_discount * 100) as bigint)"),
    ("tax_c", "cast(round(l_tax * 100) as bigint)"))

  /** PEARSON CORRELATION MATRIX over the lineitem numeric panel — the
    * profiling table every EDA pass starts from, computed EXACTLY:
    * all moments (Σx, Σx², Σxy) accumulate as INTEGER sums of the
    * cent/hundredth-scaled columns in ONE data pass (no per-engine
    * float reassociation anywhere — int64-safe to ~10⁹ rows at these
    * scales), and only the final r = (nΣxy − ΣxΣy)/(√(nΣx²−(Σx)²)·
    * √(nΣy²−(Σy)²)) evaluates in doubles from bit-identical integer
    * operands, rounded to 6 dp. The 6 pairs reshape from the single
    * moment row — answer-sized after the one scan. */
  def q137CorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(corrCols.map { case (n, e) => expr(e).as(n) }: _*)
    // moments accumulate in decimal(38,0): Σ(price_c²) alone tops
    // int64 at sf0.1 (10⁷ cents squared × 6·10⁵ rows ≈ 6·10¹⁹) —
    // ANSI mode surfaced exactly that; decimal sums stay exact and
    // order-independent, DuckDB's HUGEINT widening is the same move
    val momentAggs =
      corrCols.flatMap { case (n, _) =>
        Seq(sum(col(n).cast("decimal(38,0)")).as(s"s_$n"),
          sum((col(n) * col(n)).cast("decimal(38,0)")).as(s"ss_$n")) } ++
      corrCols.combinations(2).toSeq.map { case Seq((a, _), (b, _)) =>
        sum((col(a) * col(b)).cast("decimal(38,0)")).as(s"sp_${a}_$b") } :+
      count(lit(1)).as("n")
    val m = li.agg(momentAggs.head, momentAggs.tail: _*)
    // degenerate-series guard (the tau_b discipline): a constant
    // column has zero variance and r is undefined — NULL, not NaN
    def varPos(n: String): org.apache.spark.sql.Column =
      col(s"ss_$n").cast("double") * col("n") -
        col(s"s_$n").cast("double") * col(s"s_$n") > 0.0
    corrCols.combinations(2).toSeq.map { case Seq((a, _), (b, _)) =>
      m.select(lit(a).as("x"), lit(b).as("y"), col("n").as("n_rows"),
        when(varPos(a) && varPos(b), round(
          (col(s"sp_${a}_$b").cast("double") * col("n") -
            col(s"s_$a").cast("double") * col(s"s_$b")) /
          (sqrt(col(s"ss_$a").cast("double") * col("n") -
            col(s"s_$a").cast("double") * col(s"s_$a")) *
           sqrt(col(s"ss_$b").cast("double") * col("n") -
            col(s"s_$b").cast("double") * col(s"s_$b"))), 6)).as("r"))
    }.reduce(_ unionAll _).orderBy(col("x"), col("y"))
  }

  lazy val q137Sql: String = {
    val moments = corrCols.flatMap { case (n, e) =>
      Seq(s"sum($e) AS s_$n", s"sum(($e) * ($e)) AS ss_$n") } ++
      corrCols.combinations(2).toSeq.map { case Seq((a, ae), (b, be)) =>
        s"sum(($ae) * ($be)) AS sp_${a}_$b" } :+ "count(*) AS n"
    val rows = corrCols.combinations(2).toSeq.map { case Seq((a, _), (b, _)) =>
      s"""SELECT '$a' AS x, '$b' AS y, cast(n as bigint) AS n_rows,
         | CASE WHEN cast(ss_$a as double) * n -
         |     cast(s_$a as double) * cast(s_$a as double) > 0
         |   AND cast(ss_$b as double) * n -
         |     cast(s_$b as double) * cast(s_$b as double) > 0 THEN
         |  round((cast(sp_${a}_$b as double) * n -
         |   cast(s_$a as double) * cast(s_$b as double)) /
         |  (sqrt(cast(ss_$a as double) * n -
         |    cast(s_$a as double) * cast(s_$a as double)) *
         |   sqrt(cast(ss_$b as double) * n -
         |    cast(s_$b as double) * cast(s_$b as double))), 6)
         | END AS r
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH m AS (SELECT ${moments.mkString(", ")} FROM lineitem)
       |$rows
       |ORDER BY x, y""".stripMargin
  }

  /** HERFINDAHL–HIRSCHMAN INDEX per month (the regulator's market-
    * concentration standard; HHI = Σ shareᵢ², shares in bp so the
    * index lands on the familiar 0–10⁸ scale where 1500²-style
    * thresholds live — reported div 10⁴ back to the conventional
    * 0–10⁴ reading): is supplier revenue concentrating month over
    * month? Shares are integer bp of monthly revenue cents
    * (truncating division — deterministic); the squared sum is exact
    * int64 (≤ 10⁸·|suppliers|). One (supplier, month) aggregation is
    * the only data-sized pass; shares join a broadcast monthly-total
    * slice. */
  def q138Herfindahl(spark: SparkSession, dir: String): DataFrame = {
    val sm = t(spark, dir, "lineitem")
      .groupBy(col("l_suppkey").as("sk"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
          .cast("long").as("m"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("rev"))
      .localCheckpoint(true) // consumed by totals + shares
    val tot = sm.groupBy(col("m")).agg(sum(col("rev")).as("tot"),
      count(lit(1)).as("n_suppliers"))
    sm.join(broadcast(tot), Seq("m"))
      .withColumn("share_bp", expr("rev * 10000 div tot"))
      .groupBy(col("m"))
      .agg(max(col("n_suppliers")).as("n_suppliers"),
        max(col("share_bp")).as("top_share_bp"),
        expr("sum(share_bp * share_bp) div 10000").as("hhi"))
      .select(col("m").as("month_idx"), col("n_suppliers"),
        col("top_share_bp"), col("hhi"))
      .orderBy(col("month_idx"))
  }

  val q138Sql: String =
    """WITH sm AS (
      | SELECT l_suppkey AS sk,
      |  cast(year(l_shipdate) * 12 + month(l_shipdate) - 1 as bigint) AS m,
      |  cast(sum(cast(round(l_extendedprice * 100) as bigint)) as bigint)
      |    AS rev
      | FROM lineitem GROUP BY 1, 2),
      |tot AS (
      | SELECT m, cast(sum(rev) as bigint) AS tot,
      |  cast(count(*) as bigint) AS n_suppliers
      | FROM sm GROUP BY m),
      |shares AS (
      | SELECT sm.m, t.n_suppliers, sm.rev * 10000 // t.tot AS share_bp
      | FROM sm JOIN tot t USING (m))
      |SELECT m AS month_idx,
      | cast(max(n_suppliers) as bigint) AS n_suppliers,
      | cast(max(share_bp) as bigint) AS top_share_bp,
      | cast(sum(share_bp * share_bp) // 10000 as bigint) AS hhi
      |FROM shares GROUP BY m ORDER BY month_idx""".stripMargin

  /** LOG-RANK TEST (Mantel '66; Peto & Peto '72) — the two-cohort
    * comparison completing the survival family: does the cohort whose
    * FIRST event is a 'view' convert on a different clock than
    * everyone else? At each event time, cohort 1's observed events
    * are compared with the hypergeometric expectation d·n₁/n given
    * the at-risk margins, accumulating O−E and its variance; the
    * statistic is χ² = (O−E)²/V on one degree of freedom. All
    * arithmetic is integer micro-units with a COMMITTED sequential
    * truncating-division order per term (divide early, multiply
    * late), so no int64 product of four table margins ever forms and
    * both engines share every intermediate bit.
    *
    * Scale shape: identical to [[q133KaplanMeier]] — one user-keyed
    * aggregate is the only data-sized pass; the two-cohort life
    * table is calendar-bounded, its at-risk counts route through
    * TWO DistRank prefix passes (total and cohort-1), and the O/E/V
    * sums are one answer-sized aggregation. */
  def q134LogRank(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    // tie-break the "first event" under the (ts, event_id) total order
    // in BOTH engines (alphabetical type would silently diverge from
    // DuckDB's min_by on same-timestamp rows)
    val firstType = ev
      .groupBy(col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"), col("event_type"))).as("fst"))
      .select(col("user_id"),
        (col("fst.event_type") === "view").cast("long").as("g"))
    val users = ev.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("d0"),
        max(to_date(col("ts"))).as("dlast"),
        min(when(col("event_type") === "purchase", to_date(col("ts"))))
          .as("dconv"))
      .join(firstType, Seq("user_id"))
    val spans = users.select(
      when(col("dconv").isNotNull, datediff(col("dconv"), col("d0")))
        .otherwise(datediff(col("dlast"), col("d0")))
        .cast("long").as("t"),
      col("dconv").isNotNull.cast("long").as("observed"), col("g"))
    val grouped = spans.groupBy(col("t"))
      .agg(count(lit(1)).as("cnt"), sum(col("observed")).as("d"),
        sum(col("g")).as("cnt1"),
        sum(col("observed") * col("g")).as("d1"))
    val pre1 = graft.operators.DistRank.withPrefix(
      grouped, Seq(col("t")), col("cnt"), "sum", "cum")
    val pre2 = graft.operators.DistRank.withPrefix(
      pre1, Seq(col("t")), col("cnt1"), "sum", "cum1")
    val totals = spans.agg(count(lit(1)).as("nt"), sum(col("g")).as("n1t"))
    val life = pre2.crossJoin(broadcast(totals))
      .select(col("t"), col("d"), col("d1"),
        (col("nt") - col("cum") + col("cnt")).as("n"),
        (col("n1t") - col("cum1") + col("cnt1")).as("n1"))
      .filter(col("d") > 0 && col("n") > 1)
    // the cross-moments d·n1·10⁶ and the chi-square numerator run in
    // decimal(38,0) (DuckDB: HUGEINT) — with d, n1 ≤ n they approach
    // n²·10⁶ and wrap int64 near n ≈ 3e6 users; the reported sums
    // themselves stay answer-sized (≤ 10⁶·n) and cast back to long
    life.agg(
        sum(col("d1")).as("o1"),
        sum(expr("cast(d as decimal(38,0)) * n1 * 1000000 div n"))
          .cast("long").as("e1_micro"),
        // committed order: ((d·n1·10⁶ div n)·(n−n1) div n)·(n−d) div (n−1)
        sum(expr("((cast(d as decimal(38,0)) * n1 * 1000000 div n) " +
          "* (n - n1) div n) * (n - d) div (n - 1)"))
          .cast("long").as("v_micro"))
      .crossJoin(broadcast(totals))
      .select(col("n1t").as("n_cohort1"), (col("nt") - col("n1t")).as("n_cohort0"),
        col("o1"), col("e1_micro"), col("v_micro"),
        expr("CASE WHEN v_micro > 0 THEN cast(cast(o1 * 1000000L - e1_micro " +
          "as decimal(38,0)) * (o1 * 1000000L - e1_micro) div v_micro " +
          "as long) ELSE 0L END")
          .as("chi2_micro"))
      .select(col("n_cohort1"), col("n_cohort0"), col("o1"),
        col("e1_micro"), col("v_micro"), col("chi2_micro"),
        (col("chi2_micro") > 3841000L).cast("long").as("significant"))
  }

  val q134Sql: String =
    """WITH firsts AS (
      | SELECT user_id,
      |  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g0
      | FROM (SELECT user_id, event_type,
      |   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |     AS frk FROM events)
      | WHERE frk = 1),
      |users AS (
      | SELECT e.user_id, min(cast(e.ts as date)) AS d0,
      |  max(cast(e.ts as date)) AS dlast,
      |  min(CASE WHEN e.event_type = 'purchase' THEN cast(e.ts as date) END)
      |    AS dconv,
      |  any_value(f.g0) AS g
      | FROM events e JOIN firsts f USING (user_id)
      | GROUP BY e.user_id),
      |spans AS (
      | SELECT CASE WHEN dconv IS NOT NULL
      |   THEN cast(date_diff('day', d0, dconv) as bigint)
      |   ELSE cast(date_diff('day', d0, dlast) as bigint) END AS t,
      |  CASE WHEN dconv IS NOT NULL THEN 1 ELSE 0 END AS observed, g
      | FROM users),
      |grouped AS (
      | SELECT t, cast(count(*) as bigint) AS cnt,
      |  cast(sum(observed) as bigint) AS d,
      |  cast(sum(g) as bigint) AS cnt1,
      |  cast(sum(observed * g) as bigint) AS d1
      | FROM spans GROUP BY t),
      |tot AS (SELECT cast(count(*) as bigint) AS nt,
      |               cast(sum(g) as bigint) AS n1t FROM spans),
      |life AS (
      | SELECT g.t, g.d, g.d1,
      |  cast(tt.nt - sum(g.cnt) OVER (ORDER BY g.t) + g.cnt as bigint) AS n,
      |  cast(tt.n1t - sum(g.cnt1) OVER (ORDER BY g.t) + g.cnt1 as bigint) AS n1
      | FROM grouped g, tot tt),
      |sums AS (
      | SELECT cast(sum(d1) as bigint) AS o1,
      |  cast(sum(cast(d as hugeint) * n1 * 1000000 // n) as bigint)
      |    AS e1_micro,
      |  cast(sum(((cast(d as hugeint) * n1 * 1000000 // n) * (n - n1) // n)
      |    * (n - d) // (n - 1)) as bigint) AS v_micro
      | FROM life WHERE d > 0 AND n > 1)
      |SELECT t2.n1t AS n_cohort1, t2.nt - t2.n1t AS n_cohort0,
      | s.o1, s.e1_micro, s.v_micro,
      | cast(CASE WHEN s.v_micro > 0
      |   THEN cast(s.o1 * 1000000 - s.e1_micro as hugeint)
      |     * (s.o1 * 1000000 - s.e1_micro)
      |     // s.v_micro ELSE 0 END as bigint) AS chi2_micro,
      | cast(CASE WHEN s.v_micro > 0 AND
      |   cast(s.o1 * 1000000 - s.e1_micro as hugeint) *
      |   (s.o1 * 1000000 - s.e1_micro) // s.v_micro > 3841000
      |   THEN 1 ELSE 0 END as bigint) AS significant
      |FROM sums s, tot t2""".stripMargin

  /** NELSON–AALEN cumulative hazard (Nelson '72; Aalen '78) — the
    * SUM-form survival companion to [[q133KaplanMeier]]'s product:
    * H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ over the same time-to-first-purchase life
    * table. Being a running SUM of per-time rationals it needs no
    * sequential fold at all — per-time hazard dᵢ·10⁶ div nᵢ is
    * row-local and the cumulative is a prefix sum, so the WHOLE curve
    * is two DistRank passes after the user aggregate (contrast KM,
    * whose product recurrence forces the answer-sized fold) — the
    * shape a 100 TB survival panel wants. The KM relation
    * S ≈ exp(−H) is spec-asserted as the bound S ≥ exp-free proxy
    * 10⁶ − H_micro (1 − H ≤ e^(−H) ≤ S only one side holds exactly;
    * the spec pins S_milli·1000 ≥ 10⁶ − H_micro, the first-order
    * inequality that is EXACT arithmetic, not an approximation). */
  def q139NelsonAalen(spark: SparkSession, dir: String): DataFrame = {
    val users = t(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("d0"),
        max(to_date(col("ts"))).as("dlast"),
        min(when(col("event_type") === "purchase", to_date(col("ts"))))
          .as("dconv"))
    val spans = users.select(
      when(col("dconv").isNotNull, datediff(col("dconv"), col("d0")))
        .otherwise(datediff(col("dlast"), col("d0")))
        .cast("long").as("t"),
      col("dconv").isNotNull.cast("long").as("observed"))
    val grouped = spans.groupBy(col("t"))
      .agg(count(lit(1)).as("cnt"), sum(col("observed")).as("d"))
    val withPre = graft.operators.DistRank.withPrefix(
      grouped, Seq(col("t")), col("cnt"), "sum", "cum")
    val total = spans.agg(count(lit(1)).as("n_total"))
    val hazard = withPre.crossJoin(broadcast(total))
      .select(col("t"), col("d"),
        (col("n_total") - col("cum") + col("cnt")).as("n_risk"))
      .withColumn("h_micro", expr("d * 1000000L div n_risk"))
    graft.operators.DistRank.withPrefix(
        hazard, Seq(col("t")), col("h_micro"), "sum", "cumh_micro")
      .select(col("t").as("t_days"), col("n_risk"), col("d").as("n_events"),
        col("h_micro"), col("cumh_micro"))
      .orderBy(col("t_days"))
  }

  val q139Sql: String =
    """WITH users AS (
      | SELECT user_id, min(cast(ts as date)) AS d0,
      |  max(cast(ts as date)) AS dlast,
      |  min(CASE WHEN event_type = 'purchase' THEN cast(ts as date) END)
      |    AS dconv
      | FROM events GROUP BY user_id),
      |spans AS (
      | SELECT CASE WHEN dconv IS NOT NULL
      |   THEN cast(date_diff('day', d0, dconv) as bigint)
      |   ELSE cast(date_diff('day', d0, dlast) as bigint) END AS t,
      |  CASE WHEN dconv IS NOT NULL THEN 1 ELSE 0 END AS observed
      | FROM users),
      |grouped AS (
      | SELECT t, cast(count(*) as bigint) AS cnt,
      |  cast(sum(observed) as bigint) AS d
      | FROM spans GROUP BY t),
      |tot AS (SELECT cast(count(*) as bigint) AS n_total FROM spans),
      |hz AS (
      | SELECT g.t, g.d,
      |  cast(tt.n_total - sum(g.cnt) OVER (ORDER BY g.t) + g.cnt as bigint)
      |    AS n_risk
      | FROM grouped g, tot tt)
      |SELECT t AS t_days, n_risk, d AS n_events,
      | cast(d * 1000000 // n_risk as bigint) AS h_micro,
      | cast(sum(d * 1000000 // n_risk) OVER (ORDER BY t) as bigint)
      |   AS cumh_micro
      |FROM hz ORDER BY t_days""".stripMargin

  /** Poisson(1) inverse-CDF thresholds ×10⁵, committed integer
    * literals (re-derived from e⁻¹ in the spec so a typo cannot
    * hide): u < 36788 → 0 draws, < 73576 → 1, < 91970 → 2,
    * < 98101 → 3, < 99634 → 4, < 99941 → 5, < 99992 → 6, else 7. */
  private[graft] val poisCdf5: Seq[Long] =
    Seq(36788L, 73576L, 91970L, 98101L, 99634L, 99941L, 99992L)

  private def poisCase(uCol: String): String =
    "CASE " + poisCdf5.zipWithIndex.map { case (thr, k) =>
      s"WHEN $uCol < $thr THEN $k" }.mkString(" ") +
      s" ELSE ${poisCdf5.length} END"

  /** POISSON-BOOTSTRAP CONFIDENCE INTERVAL for the mean purchase
    * value (Efron '79 bootstrap; the Poisson(1)-weight form is THE
    * distributed variant — Chamandy et al., "Estimating Uncertainty
    * for Massive Data Streams", Google '12 — because it needs no
    * global resample: each row draws its replicate multiplicity
    * independently). Weights come from the registry's deterministic
    * Knuth hash of (event_id, rep) pushed through the committed
    * integer Poisson CDF — no RNG state, fully replayable in DuckDB.
    * 100 replicate means (integer cents, truncating division), CI =
    * the 5th and 96th order statistics — a ~90% percentile interval.
    *
    * Scale shape: the replicate means reduce by ONE groupBy(rep)
    * with map-side partials (the permutation-test shape); the
    * 100-row replicate frame ranks via DistRank (no single-partition
    * window) and the interval is two rank filters. */
  def metaBootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        round(col("value") * 100).cast("long").as("v"))
      .localCheckpoint(true) // consumed by the observed mean + replicates
    val obs = base.agg(count(lit(1)).as("n_rows"),
      expr("sum(v) div count(1)").as("mean_cents"))
    val reps = base
      .select(col("event_id"), col("v"),
        explode(expr(s"sequence(1, $permReps)")).as("rep"))
      .withColumn("u", expr(
        s"pmod(pmod(event_id, 2147483648L) * 2654435761L + rep * 40503L, " +
          "4294967296L) % 100000L"))
      .withColumn("w", expr(poisCase("u")).cast("long"))
      .groupBy(col("rep"))
      .agg(expr("sum(w * v) div sum(w)").as("mean_r"))
    val ranked = graft.operators.DistRank.withRowNumber(
      reps, Seq(col("mean_r"), col("rep")), "rk")
    val lo = ranked.filter(col("rk") === 5)
      .select(col("mean_r").as("ci_lo_cents"))
    val hi = ranked.filter(col("rk") === 96)
      .select(col("mean_r").as("ci_hi_cents"))
    obs.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .select(col("n_rows"), col("mean_cents"),
        col("ci_lo_cents"), col("ci_hi_cents"))
  }

  lazy val metaBootstrapCiSql: String =
    s"""WITH base AS (
       | SELECT event_id, cast(round(value * 100) as bigint) AS v
       | FROM events WHERE event_type = 'purchase'),
       |obs AS (
       | SELECT cast(count(*) as bigint) AS n_rows,
       |  cast(sum(v) // count(*) as bigint) AS mean_cents
       | FROM base),
       |reps AS (
       | SELECT r.rep,
       |  cast(sum((${poisCase(s"(((b.event_id % 2147483648) * 2654435761 + r.rep * 40503) % 4294967296) % 100000")}) * b.v)
       |   // sum(${poisCase(s"(((b.event_id % 2147483648) * 2654435761 + r.rep * 40503) % 4294967296) % 100000")})
       |   as bigint) AS mean_r
       | FROM base b, (SELECT unnest(range(1, ${permReps + 1})) AS rep) r
       | GROUP BY r.rep),
       |ranked AS (
       | SELECT mean_r, row_number() OVER (ORDER BY mean_r, rep) AS rk
       | FROM reps)
       |SELECT o.n_rows, o.mean_cents,
       | (SELECT cast(mean_r as bigint) FROM ranked WHERE rk = 5) AS ci_lo_cents,
       | (SELECT cast(mean_r as bigint) FROM ranked WHERE rk = 96) AS ci_hi_cents
       |FROM obs o""".stripMargin

  /** Randomization-test replication count — committed like every
    * seeded knob; p-value granularity is 1/(R+1). */
  private val permReps = 100

  /** RANDOMIZATION (permutation-style) TEST — nonparametric two-sample
    * inference with NO distributional assumption and NO RNG state
    * (Fisher '35 exact-test logic, Monte-Carlo'd with DETERMINISTIC
    * hash relabelings): does the mean purchase value differ from the
    * mean click value more than chance relabeling explains? The
    * statistic is the all-integer scaled mean gap T = Σ_A·n_B −
    * Σ_B·n_A (sign and order of |T| match mean_A − mean_B without a
    * single division); each replicate reassigns every row by the
    * registry's Knuth double-mod hash of (event_id, rep) — pure
    * arithmetic, identical in DuckDB, so the whole test replays
    * relationally. p_bp = (1 + #{|T_r| ≥ |T_obs|})·10⁴ div (R+1),
    * the add-one Monte-Carlo estimator (Davison & Hinkley).
    *
    * Scale shape: one pass computes T_obs; the R replicates explode
    * a rep index and reduce by ONE groupBy(rep) whose map-side
    * partial aggregation shrinks the shuffle to R×partials — never
    * R copies of the data across the wire. Σ·count products are
    * int64-safe to ~10⁸ rows at cent scale (decimal(38,0) beyond —
    * documented, the Spearman discipline). */
  def metaPermutationTest(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"),
        round(col("value") * 100).cast("long").as("v"),
        (col("event_type") === "purchase").cast("long").as("is_a"))
      .localCheckpoint(true) // consumed by the observed pass + replicates
    val obs = base.agg(
      sum(when(col("is_a") === 1, col("v"))).as("sum_a"),
      sum(when(col("is_a") === 0, col("v"))).as("sum_b"),
      sum(col("is_a")).as("n_a"),
      sum(lit(1L) - col("is_a")).as("n_b"))
      .select(col("n_a"), col("n_b"),
        (col("sum_a") * col("n_b") - col("sum_b") * col("n_a")).as("t_obs"))
    val n = base.count()
    // per-rep relabeled statistic: row goes to A' iff h mod n < n_a —
    // the observed group sizes are the permutation's margins
    val perRep = base
      .select(col("event_id"), col("v"),
        explode(expr(s"sequence(1, $permReps)")).as("rep"))
      .withColumn("h", expr(
        s"pmod(pmod(event_id, 2147483648L) * 2654435761L + rep * 40503L, " +
          "4294967296L)"))
      .crossJoin(broadcast(obs.select(col("n_a").as("na0"))))
      .withColumn("to_a", (pmod(col("h"), lit(n)) < col("na0")).cast("long"))
      .groupBy(col("rep"))
      .agg(sum(when(col("to_a") === 1, col("v"))).as("sa"),
        sum(when(col("to_a") === 0, col("v"))).as("sb"),
        sum(col("to_a")).as("na"),
        sum(lit(1L) - col("to_a")).as("nb"))
      .select(col("rep"), (col("sa") * col("nb") - col("sb") * col("na")).as("t_r"))
    obs.crossJoin(broadcast(perRep.crossJoin(broadcast(obs.select(abs(col("t_obs")).as("ta"))))
        .agg(sum((abs(col("t_r")) >= col("ta")).cast("long")).as("n_extreme"))))
      .select(col("n_a"), col("n_b"), col("t_obs"), col("n_extreme"),
        expr(s"(1 + n_extreme) * 10000 div ${permReps + 1}").as("p_bp"))
  }

  val metaPermutationTestSql: String =
    s"""WITH base AS (
       | SELECT event_id, cast(round(value * 100) as bigint) AS v,
       |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
       | FROM events WHERE event_type IN ('purchase', 'click')),
       |obs AS (
       | SELECT cast(sum(is_a) as bigint) AS n_a,
       |  cast(sum(1 - is_a) as bigint) AS n_b,
       |  cast(sum(CASE WHEN is_a = 1 THEN v ELSE 0 END) * sum(1 - is_a)
       |   - sum(CASE WHEN is_a = 0 THEN v ELSE 0 END) * sum(is_a) as bigint)
       |   AS t_obs,
       |  cast(count(*) as bigint) AS n
       | FROM base),
       |reps AS (
       | SELECT b.event_id, b.v, r.rep,
       |  ((b.event_id % 2147483648) * 2654435761 + r.rep * 40503)
       |    % 4294967296 AS h
       | FROM base b, (SELECT unnest(range(1, ${permReps + 1})) AS rep) r),
       |labeled AS (
       | SELECT r.rep, r.v,
       |  CASE WHEN r.h % o.n < o.n_a THEN 1 ELSE 0 END AS to_a
       | FROM reps r, obs o),
       |per_rep AS (
       | SELECT rep,
       |  sum(CASE WHEN to_a = 1 THEN v ELSE 0 END) * sum(1 - to_a)
       |   - sum(CASE WHEN to_a = 0 THEN v ELSE 0 END) * sum(to_a) AS t_r
       | FROM labeled GROUP BY rep),
       |ext AS (
       | SELECT cast(sum(CASE WHEN abs(p.t_r) >= abs(o.t_obs)
       |   THEN 1 ELSE 0 END) as bigint) AS n_extreme
       | FROM per_rep p, obs o)
       |SELECT o.n_a, o.n_b, o.t_obs, e.n_extreme,
       | cast((1 + e.n_extreme) * 10000 // ${permReps + 1} as bigint) AS p_bp
       |FROM obs o, ext e""".stripMargin

  /** CUSUM CONTROL CHART (Page 1954) — the ONLINE companion to
    * [[metaChangepoint]]'s retrospective split: per event_type the
    * daily revenue stream drives the classic one-sided cumulative
    * sums S⁺ = max(0, S⁺ + x − μ − k) and S⁻ = max(0, S⁻ + μ − x − k)
    * with slack k = μ/20 and alarm threshold h = μ/2 (re-arming by
    * reset after each alarm). Everything is integer cents — μ is the
    * series' floor mean, the clipped recursion is exact — so the
    * alarm COUNT and peak excursions are bit-deterministic. The
    * recursion is sequential per key ⇒ the same secondary-sort
    * one-pass fold as [[q125HoltForecast]] (sequential per series,
    * parallel across series); the oracle replays it as a recursive
    * CTE. Fixture expectation: i.i.d. daily sums ⇒ zero or near-zero
    * alarms — the chart stays in control. */
  def q126Cusum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
    val means = daily.groupBy(col("event_type"))
      .agg(expr("sum(v) div count(*)").as("mu"))
    val folded = daily.join(broadcast(means), Seq("event_type"))
      .repartition(col("event_type"))
      .sortWithinPartitions(col("event_type"), col("day"))
      .select(col("event_type"), col("day"), col("v"), col("mu"))
      .as[(String, java.sql.Timestamp, Long, Long)]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long, Long, Long, Long, Long)]
        var cur: String = null
        var n = 0L; var sp = 0L; var sn = 0L
        var maxP = 0L; var maxN = 0L; var alarms = 0L; var mu = 0L
        def flush(): Unit =
          if (cur != null) out += ((cur, n, mu, maxP, maxN, alarms))
        for ((tpe, _, v, m) <- it) {
          if (tpe != cur) {
            flush(); cur = tpe; n = 0L; sp = 0L; sn = 0L
            maxP = 0L; maxN = 0L; alarms = 0L; mu = m
          }
          val k = mu / 20L; val h = mu / 2L
          sp = math.max(0L, sp + v - mu - k)
          sn = math.max(0L, sn + mu - v - k)
          maxP = math.max(maxP, sp); maxN = math.max(maxN, sn)
          if (sp > h) { alarms += 1; sp = 0L }
          if (sn > h) { alarms += 1; sn = 0L }
          n += 1
        }
        flush()
        out.iterator
      }
      .toDF("event_type", "n_days", "mu_cents", "max_s_pos", "max_s_neg",
        "n_alarms")
    folded.orderBy(col("event_type"))
  }

  val q126Sql: String =
    """WITH RECURSIVE daily AS (
      | SELECT event_type, date_trunc('day', ts) AS day,
      |  sum(cast(round(value * 100) as bigint)) AS v
      | FROM events GROUP BY 1, 2),
      |mu AS (SELECT event_type, sum(v) // count(*) AS mu
      |       FROM daily GROUP BY event_type),
      |seq AS (
      | SELECT d.event_type, d.v, m.mu,
      |  row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS rn,
      |  count(*) OVER (PARTITION BY d.event_type) AS n
      | FROM daily d JOIN mu m USING (event_type)),
      |cusum(event_type, rn, n, mu, sp, sn, maxp, maxn, alarms) AS (
      | SELECT event_type, 0, n, mu, cast(0 as bigint), cast(0 as bigint),
      |  cast(0 as bigint), cast(0 as bigint), cast(0 as bigint)
      | FROM seq WHERE rn = 1
      | UNION ALL
      | SELECT s.event_type, s.rn, c.n, c.mu,
      |  CASE WHEN greatest(0, c.sp + s.v - c.mu - c.mu // 20) > c.mu // 2
      |       THEN 0 ELSE greatest(0, c.sp + s.v - c.mu - c.mu // 20) END,
      |  CASE WHEN greatest(0, c.sn + c.mu - s.v - c.mu // 20) > c.mu // 2
      |       THEN 0 ELSE greatest(0, c.sn + c.mu - s.v - c.mu // 20) END,
      |  greatest(c.maxp, greatest(0, c.sp + s.v - c.mu - c.mu // 20)),
      |  greatest(c.maxn, greatest(0, c.sn + c.mu - s.v - c.mu // 20)),
      |  c.alarms
      |   + CASE WHEN greatest(0, c.sp + s.v - c.mu - c.mu // 20) > c.mu // 2
      |          THEN 1 ELSE 0 END
      |   + CASE WHEN greatest(0, c.sn + c.mu - s.v - c.mu // 20) > c.mu // 2
      |          THEN 1 ELSE 0 END
      | FROM cusum c JOIN seq s
      |  ON s.event_type = c.event_type AND s.rn = c.rn + 1)
      |SELECT event_type, cast(n as bigint) AS n_days, cast(mu as bigint)
      |  AS mu_cents,
      | cast(maxp as bigint) AS max_s_pos, cast(maxn as bigint) AS max_s_neg,
      | cast(alarms as bigint) AS n_alarms
      |FROM cusum WHERE rn = n
      |ORDER BY event_type""".stripMargin

  /** LAG AUTOCORRELATION — the seasonality detector: ACF at lags 1
    * and 7 of the per-type daily revenue series (lag-7 ≈ weekly
    * seasonality, the first thing a forecaster checks before trusting
    * [[q125HoltForecast]]'s non-seasonal model). Deviations are
    * centered on the integer floor mean, the lag pairing is a KEYED
    * rn-offset self-join (row numbers from a per-type window — never
    * global), the cross/auto products accumulate as exact integers
    * (|x−μ| ≤ 10⁶ cents, ≤ 10⁵ days ⇒ products < 10¹⁷), and the
    * final ratio is one mirrored double in basis points' precision
    * (round 4). i.i.d. fixture ⇒ both lags ≈ 0. */
  def metaAutocorrelation(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
    val mu = daily.groupBy(col("event_type"))
      .agg(expr("sum(v) div count(*)").as("mu"))
    val centered = daily.join(broadcast(mu), Seq("event_type"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("day"))).cast("long"))
      .select(col("event_type"), col("rn"), (col("v") - col("mu")).as("d"))
    val denom = centered.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("d") * col("d")).as("ss"))
    def acf(lag: Int) = centered
      .join(centered.select(col("event_type"),
        (col("rn") - lag).as("rn"), col("d").as("dl")), Seq("event_type", "rn"))
      .groupBy(col("event_type"))
      .agg(sum(col("d") * col("dl")).as(s"cross"))
      .select(col("event_type"),
        col("cross").as(s"cross_$lag"))
    denom.join(acf(1), Seq("event_type")).join(acf(7), Seq("event_type"))
      .select(col("event_type"), col("n_days"),
        round(col("cross_1").cast("double") / col("ss").cast("double"), 4)
          .as("acf_lag1"),
        round(col("cross_7").cast("double") / col("ss").cast("double"), 4)
          .as("acf_lag7"))
      .orderBy(col("event_type"))
  }

  val metaAutocorrelationSql: String =
    """WITH daily AS (
      | SELECT event_type, date_trunc('day', ts) AS day,
      |  sum(cast(round(value * 100) as bigint)) AS v
      | FROM events GROUP BY 1, 2),
      |mu AS (SELECT event_type, sum(v) // count(*) AS mu
      |       FROM daily GROUP BY event_type),
      |c AS (
      | SELECT d.event_type,
      |  row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS rn,
      |  d.v - m.mu AS dd
      | FROM daily d JOIN mu m USING (event_type)),
      |den AS (
      | SELECT event_type, cast(count(*) as bigint) AS n_days,
      |  sum(dd * dd) AS ss
      | FROM c GROUP BY event_type),
      |l1 AS (
      | SELECT a.event_type, sum(a.dd * b.dd) AS cross_1
      | FROM c a JOIN c b ON b.event_type = a.event_type AND b.rn = a.rn + 1
      | GROUP BY a.event_type),
      |l7 AS (
      | SELECT a.event_type, sum(a.dd * b.dd) AS cross_7
      | FROM c a JOIN c b ON b.event_type = a.event_type AND b.rn = a.rn + 7
      | GROUP BY a.event_type)
      |SELECT d.event_type, d.n_days,
      | round(cast(l1.cross_1 as double) / cast(d.ss as double), 4) AS acf_lag1,
      | round(cast(l7.cross_7 as double) / cast(d.ss as double), 4) AS acf_lag7
      |FROM den d JOIN l1 USING (event_type) JOIN l7 USING (event_type)
      |ORDER BY d.event_type""".stripMargin

  /** LORENZ CURVE deciles — the distribution behind [[metaGini]]'s
    * scalar: per customer-spend decile (zero-order customers
    * included), the decile's revenue and the CUMULATIVE revenue share
    * in basis points — "the top decile holds X % of revenue", the
    * concentration report revenue teams actually read. Deciles come
    * from [[DistRank.withNtile]] (range partition + prefix offsets —
    * no single-partition window even though the order is global), and
    * the cumulative sum over the 10-row decile relation is an
    * answer-sized triangular self-join (decile ≤ d) — NOT a window,
    * so the registry-wide no-global-window gate holds here too. All
    * shares integer basis points. */
  def q127LorenzDeciles(spark: SparkSession, dir: String): DataFrame = {
    val spend = t(spark, dir, "customer")
      .join(t(spark, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("sp")),
        col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), coalesce(col("sp"), lit(0L)).as("cents"))
    val tiled = DistRank.withNtile(spend,
      Seq(col("cents"), col("c_custkey")), 10, "decile")
    val perDecile = tiled.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("decile_cents"))
    val total = perDecile.agg(sum(col("decile_cents")).as("tot"))
    val cum = perDecile.select(col("decile").as("d2"),
      col("decile_cents").as("c2"))
    perDecile
      .join(cum, col("d2") <= col("decile"))
      .groupBy(col("decile"), col("n_customers"), col("decile_cents"))
      // decimal(38,0): cum_cents is a cumulative corpus-revenue sum —
      // ×10⁴ wraps int64 at ~$9.2·10¹⁴ cents while DuckDB's window
      // sum is HUGEINT; decimal keeps the engines in lockstep
      .agg(sum(col("c2").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .as("cum_cents"))
      .crossJoin(broadcast(total))
      .select(col("decile"), col("n_customers"), col("decile_cents"),
        expr("cast(cum_cents * 10000 div tot as bigint)").as("cum_share_bp"))
      .orderBy(col("decile"))
  }

  val q127Sql: String =
    """WITH spend AS (
      | SELECT c.c_custkey, coalesce(o.sp, 0) AS cents
      | FROM customer c LEFT JOIN (
      |  SELECT o_custkey, sum(cast(round(o_totalprice * 100) as bigint)) AS sp
      |  FROM orders GROUP BY o_custkey) o ON o.o_custkey = c.c_custkey),
      |tiled AS (
      | SELECT cents, cast(ntile(10) OVER (ORDER BY cents, c_custkey) as bigint)
      |   AS decile
      | FROM spend),
      |per AS (
      | SELECT decile, cast(count(*) as bigint) AS n_customers,
      |  cast(sum(cents) as bigint) AS decile_cents
      | FROM tiled GROUP BY decile)
      |SELECT a.decile, a.n_customers, a.decile_cents,
      | cast(sum(b.decile_cents) * 10000
      |   // (SELECT sum(decile_cents) FROM per) as bigint) AS cum_share_bp
      |FROM per a JOIN per b ON b.decile <= a.decile
      |GROUP BY a.decile, a.n_customers, a.decile_cents
      |ORDER BY a.decile""".stripMargin

  /** MANN–KENDALL TREND TEST — the nonparametric "is this series
    * trending?" beside [[metaAutocorrelation]]'s "is it seasonal?":
    * S = Σ_{i<j} sign(x_j − x_i) over the per-type daily series, with
    * Kendall's τ = S / (n(n−1)/2) reported in basis points by integer
    * floor division — no distributional assumption, robust to any
    * monotone transformation of the values. The pairwise comparison
    * is an rn-keyed self-join PER SERIES — O(days²) per type, which
    * is the right trade: the series is the DAILY rollup, so it grows
    * by 365 rows a year while the underlying events grow by billions;
    * the quadratic lives on the answer-sized relation, never the
    * fact table. i.i.d. fixture ⇒ τ ≈ 0. */
  def q128TrendTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("day"))).cast("long"))
      .select(col("event_type"), col("rn"), col("v"))
    daily.select(col("event_type"), col("rn").as("i"), col("v").as("vi"))
      .join(daily.select(col("event_type"), col("rn").as("j"), col("v").as("vj")),
        Seq("event_type"))
      .filter(col("i") < col("j"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(signum(col("vj") - col("vi")).cast("long")).as("s_stat"))
      .select(col("event_type"),
        ((lit(1.0) + sqrt(lit(1.0) + lit(8.0) * col("n_pairs"))) / 2)
          .cast("long").as("n_days"),
        col("s_stat"),
        expr("s_stat * 10000 div n_pairs").as("tau_bp"))
      .orderBy(col("event_type"))
  }

  val q128Sql: String =
    """WITH daily AS (
      | SELECT event_type, date_trunc('day', ts) AS day,
      |  sum(cast(round(value * 100) as bigint)) AS v
      | FROM events GROUP BY 1, 2),
      |seq AS (
      | SELECT event_type, v,
      |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      | FROM daily),
      |pairs AS (
      | SELECT a.event_type,
      |  CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS sg
      | FROM seq a JOIN seq b
      |  ON b.event_type = a.event_type AND a.rn < b.rn)
      |SELECT event_type,
      | cast((1 + cast(sqrt(1.0 + 8.0 * count(*)) as bigint)) // 2 as bigint)
      |   AS n_days,
      | cast(sum(sg) as bigint) AS s_stat,
      | cast(sum(sg) * 10000 // count(*) as bigint) AS tau_bp
      |FROM pairs GROUP BY event_type ORDER BY event_type""".stripMargin

  /** THEIL–SEN robust slope (Theil '50; Sen JASA'68) — the MAGNITUDE
    * companion to [[q128TrendTest]]'s Mann–Kendall significance, on
    * the SAME per-type daily series: the median of all pairwise
    * slopes (vj − vi)/(j − i), insensitive to ~29% outliers where OLS
    * (q124) breaks on one. All-integer: slopes in micro-units via
    * truncating division — Spark `div` and DuckDB `//` both truncate
    * toward zero (verified on negatives), so the grids agree exactly —
    * and the median is the LOWER median, picked by deterministic rank
    * (n+1) div 2 under (s_micro, i, j) total order.
    *
    * Scale shape: aggregate FIRST (the only data-sized pass, one
    * shuffle to daily grain), then the pair join runs on the tiny
    * per-type series — pairs ≤ days², bounded by the calendar, never
    * by row count; both windows share one (event_type) partitioning
    * (single exchange). The checkpoint stops the daily aggregation
    * from re-running for each side of the self-join. */
  def q129TheilSen(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("day"))).cast("long"))
      .select(col("event_type"), col("rn"), col("v"))
      .localCheckpoint(true)
    val pairs = daily.select(col("event_type"), col("rn").as("i"), col("v").as("vi"))
      .join(daily.select(col("event_type"), col("rn").as("j"), col("v").as("vj")),
        Seq("event_type"))
      .filter(col("i") < col("j"))
      .withColumn("s_micro", expr("(vj - vi) * 1000000L div (j - i)"))
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("s_micro"), col("i"), col("j"))
    val wAll = Window.partitionBy(col("event_type"))
    pairs.withColumn("rk", row_number().over(wOrd).cast("long"))
      .withColumn("n_pairs", count(lit(1)).over(wAll))
      .filter(col("rk") === expr("(n_pairs + 1) div 2"))
      .select(col("event_type"), col("n_pairs"),
        col("s_micro").as("slope_micro"))
      .orderBy(col("event_type"))
  }

  val q129Sql: String =
    """WITH daily AS (
      | SELECT event_type, date_trunc('day', ts) AS day,
      |  sum(cast(round(value * 100) as bigint)) AS v
      | FROM events GROUP BY 1, 2),
      |seq AS (
      | SELECT event_type, v,
      |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      | FROM daily),
      |pairs AS (
      | SELECT a.event_type, a.rn AS i, b.rn AS j,
      |  (b.v - a.v) * 1000000 // (b.rn - a.rn) AS s_micro
      | FROM seq a JOIN seq b
      |  ON b.event_type = a.event_type AND a.rn < b.rn),
      |ranked AS (
      | SELECT event_type, s_micro,
      |  row_number() OVER (PARTITION BY event_type
      |    ORDER BY s_micro, i, j) AS rk,
      |  count(*) OVER (PARTITION BY event_type) AS n_pairs
      | FROM pairs)
      |SELECT event_type, cast(n_pairs as bigint) AS n_pairs,
      | cast(s_micro as bigint) AS slope_micro
      |FROM ranked WHERE rk = (n_pairs + 1) // 2
      |ORDER BY event_type""".stripMargin

  /** CLASSICAL ADDITIVE SEASONAL DECOMPOSITION (Kendall & Stuart; the
    * `decompose` of R/statsmodels, Macaulay '31 moving-average form) —
    * monthly lineitem revenue split into trend + seasonal + remainder:
    * trend is the standard 2×12 centered moving average for an even
    * period (half weight on the ±6 endpoints, so the window is
    * symmetric), seasonal indices are the month-of-year means of the
    * detrended series re-centered to sum ≈ 0, remainder is what's
    * left. All integer cents: trend = (y₋₆ + y₊₆ + 2·Σ₋₅..₊₅) div 24
    * over strictly positive revenues; the two means over possibly
    * NEGATIVE detrended values use the shift-non-negative floor trick
    * ((s + K·n) div n − K, K = 10¹²) so Spark `div` ≡ DuckDB `//` ≡
    * floor on every operand (truncation vs floor diverges on
    * negatives — the [[q129TheilSen]]-family lesson applied before
    * the bug, not after).
    *
    * Scale shape: ONE data-sized aggregation to monthly grain; the
    * centered window is an explode(-6..6)+regroup over the
    * answer-sized series (calendar-bounded — never a data-sized
    * window); seasonal is a 12-row frame; everything joins back
    * broadcast. Edge months without the full 13-month window report
    * NULL trend/remainder, exactly as R's decompose does. */
  def q140SeasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val monthly = t(spark, dir, "lineitem")
      .groupBy((year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
        .cast("long").as("m"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("rev"))
      .localCheckpoint(true) // consumed by the MA regroup + the join-back
    val trend = monthly
      .withColumn("k", explode(expr("sequence(-6, 6)")))
      .select((col("m") - col("k")).as("c"),
        when(abs(col("k")) === 6, lit(1L)).otherwise(lit(2L)).as("w"),
        col("rev"))
      .groupBy(col("c"))
      .agg(sum(expr("w * rev")).as("wsum"), sum(col("w")).as("wtot"))
      .filter(col("wtot") === 24) // full 13-month window only
      .select(col("c").as("m"), expr("wsum div 24").as("trend"))
    val detr = monthly.join(trend, Seq("m"), "left")
      .withColumn("detr", col("rev") - col("trend"))
      .withColumn("moy", pmod(col("m"), lit(12L)))
      .localCheckpoint(true) // consumed by seasonal means + final select
    val sraw = detr.filter(col("detr").isNotNull)
      .groupBy(col("moy"))
      .agg(expr("(sum(detr) + 1000000000000L * count(1)) div count(1) " +
        "- 1000000000000L").as("s_raw"))
    val g = sraw.agg(expr("(sum(s_raw) + 1000000000000L * count(1)) " +
      "div count(1) - 1000000000000L").as("g"))
    val seasonal = sraw.crossJoin(broadcast(g))
      .select(col("moy"), (col("s_raw") - col("g")).as("seasonal"))
    detr.join(broadcast(seasonal), Seq("moy"))
      .select(col("m").as("month_idx"), col("moy"),
        col("rev").as("rev_cents"), col("trend").as("trend_cents"),
        col("seasonal").as("seasonal_cents"),
        (col("detr") - col("seasonal")).as("remainder_cents"))
      .orderBy(col("month_idx"))
  }

  val q140Sql: String =
    """WITH monthly AS (
      | SELECT cast(year(l_shipdate) * 12 + month(l_shipdate) - 1 as bigint)
      |   AS m,
      |  cast(sum(cast(round(l_extendedprice * 100) as bigint)) as bigint)
      |   AS rev
      | FROM lineitem GROUP BY 1),
      |trend AS (
      | SELECT m - k AS m, sum(CASE WHEN abs(k) = 6 THEN 1 ELSE 2 END * rev)
      |   // 24 AS trend
      | FROM monthly, (SELECT unnest(range(-6, 7)) AS k)
      | GROUP BY m - k
      | HAVING sum(CASE WHEN abs(k) = 6 THEN 1 ELSE 2 END) = 24),
      |detr AS (
      | SELECT mo.m, mo.m % 12 AS moy, mo.rev, tr.trend,
      |  mo.rev - tr.trend AS detr
      | FROM monthly mo LEFT JOIN trend tr ON tr.m = mo.m),
      |sraw AS (
      | SELECT moy,
      |  (sum(detr) + 1000000000000 * count(*)) // count(*)
      |   - 1000000000000 AS s_raw
      | FROM detr WHERE detr IS NOT NULL GROUP BY moy),
      |g AS (
      | SELECT (sum(s_raw) + 1000000000000 * count(*)) // count(*)
      |   - 1000000000000 AS g
      | FROM sraw),
      |seasonal AS (SELECT moy, s_raw - g.g AS seasonal FROM sraw, g)
      |SELECT d.m AS month_idx, cast(d.moy as bigint) AS moy,
      | d.rev AS rev_cents, cast(d.trend as bigint) AS trend_cents,
      | cast(s.seasonal as bigint) AS seasonal_cents,
      | cast(d.detr - s.seasonal as bigint) AS remainder_cents
      |FROM detr d JOIN seasonal s USING (moy)
      |ORDER BY month_idx""".stripMargin

  /** KENDALL'S τ-b (Kendall, Biometrika '38; tie correction '45) —
    * rank correlation between the monthly ORDER COUNT and monthly
    * REVENUE series, the robust companion to [[q117Spearman]]: τ
    * counts concordant minus discordant pairs, so a single outlier
    * month moves it by at most 2/n(n−1). Pure integer pair counts
    * (concordant, discordant, x-ties, y-ties over all month pairs
    * i<j); the only float is the final
    * τ_b = (nc − nd) / (√(n₀−Tx)·√(n₀−Ty)), taken as TWO separate
    * IEEE sqrt calls on bit-identical integer operands (the
    * [[q132CrossCorr]] normalization discipline) and rounded 6 dp.
    *
    * Scale shape: aggregate FIRST to the calendar-bounded monthly
    * series (the one data-sized pass), then the pair grid is months²
    * ≈ 84² — answer-sized, via one broadcast self-join. At any data
    * scale the pair stage is constant-cost. */
  def q141KendallTau(spark: SparkSession, dir: String): DataFrame = {
    val monthly = t(spark, dir, "orders")
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long").as("m"))
      .agg(count(lit(1)).as("x"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .localCheckpoint(true) // both sides of the pair self-join
    val pairs = monthly.select(col("m").as("i"), col("x").as("xi"), col("y").as("yi"))
      .join(broadcast(monthly.select(col("m").as("j"), col("x").as("xj"), col("y").as("yj"))),
        col("i") < col("j"))
    val agg = pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(when((col("xi") < col("xj") && col("yi") < col("yj")) ||
        (col("xi") > col("xj") && col("yi") > col("yj")), 1L).otherwise(0L))
        .as("concordant"),
      sum(when((col("xi") < col("xj") && col("yi") > col("yj")) ||
        (col("xi") > col("xj") && col("yi") < col("yj")), 1L).otherwise(0L))
        .as("discordant"),
      sum(when(col("xi") === col("xj"), 1L).otherwise(0L)).as("tied_x"),
      sum(when(col("yi") === col("yj"), 1L).otherwise(0L)).as("tied_y"))
    val n = monthly.agg(count(lit(1)).as("n_months"))
    agg.crossJoin(broadcast(n))
      .select(col("n_months"), col("n_pairs"), col("concordant"),
        col("discordant"), col("tied_x"), col("tied_y"),
        // a fully-tied series makes the denominator 0 (0/0 → NaN in
        // Spark vs float-div in DuckDB): tau_b is undefined there, so
        // return NULL — the degenerate-V guard discipline
        expr("CASE WHEN n_pairs > tied_x AND n_pairs > tied_y THEN " +
          "round((concordant - discordant) / " +
          "(sqrt(cast(n_pairs - tied_x as double)) * " +
          "sqrt(cast(n_pairs - tied_y as double))), 6) END").as("tau_b"))
  }

  val q141Sql: String =
    """WITH monthly AS (
      | SELECT cast(year(o_orderdate) * 12 + month(o_orderdate) - 1 as bigint)
      |   AS m,
      |  cast(count(*) as bigint) AS x,
      |  cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) AS y
      | FROM orders GROUP BY 1),
      |pairs AS (
      | SELECT a.x AS xi, a.y AS yi, b.x AS xj, b.y AS yj
      | FROM monthly a JOIN monthly b ON a.m < b.m),
      |agg AS (
      | SELECT cast(count(*) as bigint) AS n_pairs,
      |  cast(sum(CASE WHEN (xi < xj AND yi < yj) OR (xi > xj AND yi > yj)
      |    THEN 1 ELSE 0 END) as bigint) AS concordant,
      |  cast(sum(CASE WHEN (xi < xj AND yi > yj) OR (xi > xj AND yi < yj)
      |    THEN 1 ELSE 0 END) as bigint) AS discordant,
      |  cast(sum(CASE WHEN xi = xj THEN 1 ELSE 0 END) as bigint) AS tied_x,
      |  cast(sum(CASE WHEN yi = yj THEN 1 ELSE 0 END) as bigint) AS tied_y
      | FROM pairs),
      |n AS (SELECT cast(count(*) as bigint) AS n_months FROM monthly)
      |SELECT n.n_months, a.n_pairs, a.concordant, a.discordant,
      | a.tied_x, a.tied_y,
      | CASE WHEN a.n_pairs > a.tied_x AND a.n_pairs > a.tied_y THEN
      |  round((a.concordant - a.discordant) /
      |   (sqrt(cast(a.n_pairs - a.tied_x as double)) *
      |    sqrt(cast(a.n_pairs - a.tied_y as double))), 6) END AS tau_b
      |FROM agg a, n""".stripMargin

  /** KRUSKAL–WALLIS one-way rank test (Kruskal & Wallis, JASA '52) —
    * the nonparametric companion to [[q122Anova]]: do order totals
    * come from the same distribution across the five customer
    * REGIONS? Average ranks with ties are exact in HALF-UNITS
    * (r2 = 2·cum − cnt + 1, an integer for any tie group), the
    * per-region rank sums accumulate in int64, and the two places a
    * square or cross-product exceeds int64 (R²_g, 12·10⁶·S, the tie
    * polynomial n³−n at 10⁹⁺ rows) run in decimal(38,0) with
    * IntegralDivide — exact and order-independent at any scale,
    * mirroring DuckDB's HUGEINT widening. The per-group quotient
    * t_g = R2²_g div (4·n_g) is a COMMITTED truncation (both engines
    * truncate identically; the error is < 1 rank unit per group).
    * H is then tie-corrected by the (n³−n)/(n³−n−Σ(t³−t)) factor and
    * compared with the committed χ²₀.₀₅ critical value for df = 4.
    *
    * Scale shape: ONE data-sized groupBy(value) for the tie table,
    * ranks via the two-pass DistRank prefix sum (no global window),
    * one data-sized equi-join back on value, then everything is a
    * 5-row frame. Dimension joins broadcast (customer ≤ 10⁶ rows at
    * the published SFs; at true scale swap for a shuffle join —
    * noted, not coded, since the hint is one word). */
  def q142KruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val nat = t(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
    val reg = t(spark, dir, "region")
      .select(col("r_regionkey"), col("r_name"))
    val rows = t(spark, dir, "orders")
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("v"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("v"))
      .localCheckpoint(true) // consumed by the tie table + the join-back
    val byV = rows.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val ranked = graft.operators.DistRank.withPrefix(
        byV, Seq(col("v")), col("cnt"), "sum", "cum")
      .withColumn("r2", lit(2L) * col("cum") - col("cnt") + 1)
    val perRegion = rows.join(ranked.select(col("v"), col("r2")), Seq("v"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_g"), sum(col("r2")).as("rank2_sum"))
      .localCheckpoint(true) // 5 rows; consumed by S + the output grid
    val ties = ranked.agg(
      sum(col("cnt")).as("n"),
      sum(expr("cnt * cnt * cnt - cnt")).as("tsum"))
    val s = perRegion.agg(sum(expr(
      "cast(rank2_sum as decimal(38,0)) * rank2_sum div (4 * n_g)")).as("s4"))
    val summary = ties.crossJoin(broadcast(s))
      .withColumn("h_micro", expr(
        "cast(s4 as decimal(38,0)) * 12000000 div (n * (n + 1)) " +
          "- 3000000 * (n + 1)"))
      // clamp at 0 before the tie-correction multiply: true H is
      // non-negative; committed per-group truncations can push h_micro
      // a few rank-units below 0, and a negative dividend is where
      // Spark div (truncate) and DuckDB // diverge
      .withColumn("h_corr_micro", expr(
        "cast(greatest(h_micro, 0) as decimal(38,0)) " +
          "* (cast(n as decimal(38,0)) * n * n - n) " +
          "div (cast(n as decimal(38,0)) * n * n - n - tsum)"))
      .select(col("n").as("n_total"), col("tsum").as("tie_sum"),
        col("h_micro"), col("h_corr_micro"),
        (col("h_corr_micro") > 9488000L).cast("long").as("significant"))
    perRegion
      .withColumn("mean_rank_milli", expr("rank2_sum * 500 div n_g"))
      .crossJoin(broadcast(summary))
      .select(col("r_name"), col("n_g"), col("rank2_sum"),
        col("mean_rank_milli"), col("n_total"), col("tie_sum"),
        col("h_micro"), col("h_corr_micro"), col("significant"))
      .orderBy(col("r_name"))
  }

  val q142Sql: String =
    """WITH rows_ AS (
      | SELECT r.r_name, cast(round(o.o_totalprice * 100) as bigint) AS v
      | FROM orders o
      | JOIN customer c ON c.c_custkey = o.o_custkey
      | JOIN nation n ON n.n_nationkey = c.c_nationkey
      | JOIN region r ON r.r_regionkey = n.n_regionkey),
      |byv AS (
      | SELECT v, cast(count(*) as bigint) AS cnt FROM rows_ GROUP BY v),
      |ranked AS (
      | SELECT v, cnt,
      |  2 * sum(cnt) OVER (ORDER BY v) - cnt + 1 AS r2
      | FROM byv),
      |per_region AS (
      | SELECT r_name, cast(count(*) as bigint) AS n_g,
      |  cast(sum(rk.r2) as bigint) AS rank2_sum
      | FROM rows_ d JOIN ranked rk USING (v) GROUP BY r_name),
      |ties AS (
      | SELECT cast(sum(cnt) as bigint) AS n,
      |  cast(sum(cnt * cnt * cnt - cnt) as bigint) AS tsum
      | FROM ranked),
      |s AS (
      | SELECT cast(sum(cast(rank2_sum as hugeint) * rank2_sum
      |   // (4 * n_g)) as bigint) AS s4
      | FROM per_region),
      |summary AS (
      | SELECT t.n AS n_total, t.tsum AS tie_sum,
      |  cast(cast(s.s4 as hugeint) * 12000000 // (t.n * (t.n + 1))
      |   - 3000000 * (t.n + 1) as bigint) AS h_micro,
      |  cast(greatest(cast(s.s4 as hugeint) * 12000000 // (t.n * (t.n + 1))
      |    - 3000000 * (t.n + 1), 0)
      |   * (cast(t.n as hugeint) * t.n * t.n - t.n)
      |   // (cast(t.n as hugeint) * t.n * t.n - t.n - t.tsum) as bigint)
      |   AS h_corr_micro
      | FROM ties t, s)
      |SELECT p.r_name, p.n_g, p.rank2_sum,
      | cast(p.rank2_sum * 500 // p.n_g as bigint) AS mean_rank_milli,
      | su.n_total, su.tie_sum, su.h_micro, su.h_corr_micro,
      | cast(CASE WHEN su.h_corr_micro > 9488000 THEN 1 ELSE 0 END as bigint)
      |   AS significant
      |FROM per_region p, summary su
      |ORDER BY p.r_name""".stripMargin

  /** POPULATION STABILITY INDEX (the credit-scoring drift standard;
    * see Siddiqi, "Credit Risk Scorecards" '06) — completes the drift
    * family beside [[Warehouse]]'s KS / χ² / Wasserstein entries with
    * the metric production scorecards actually alarm on: bin purchase
    * values by the REFERENCE period's rank-deciles, then
    * PSI = Σ (p_ref − p_cur)·ln(p_ref/p_cur) over the 10 bins.
    * Reference = first half of the event timeline by the integer
    * midpoint (min+max) div 2 of epoch-micros. Bin edges come from
    * reference ranks (DistRank row numbers), but BOTH sides then bin
    * by VALUE against those edges, so ties never straddle a boundary
    * inconsistently. Shares are Laplace-smoothed ((c+1)/(n+10), the
    * standard zero-bin guard) as exact integer rationals; each bin's
    * ln runs on bit-identical integer products and is rounded 6 dp,
    * and the total sums those 6-dp terms in decimal(18,6) — the
    * [[TextAnalysis]] log-term discipline, order-independent.
    *
    * Scale shape: one data-sized filter+tag pass, ranks only on the
    * reference side via two-pass DistRank, a 9-value edge array
    * broadcast to bin both sides in one fused scan, and a 10-row
    * result. PSI ≥ 0.25 = "significant shift" (industry rule of
    * thumb) is flagged per run. */
  def metaPsi(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("v"))
    val bounds = ev.agg(expr("(min(us) + max(us)) div 2").as("mid"))
    val tagged = ev.crossJoin(broadcast(bounds))
      .withColumn("is_ref", (col("us") <= col("mid")).cast("long"))
      .select(col("event_id"), col("v"), col("is_ref"))
      .localCheckpoint(true) // consumed by the rank pass + the bin pass
    val ref = tagged.filter(col("is_ref") === 1L)
    val nRef = ref.agg(count(lit(1)).as("n_ref"))
    val ranked = graft.operators.DistRank.withRowNumber(
        ref, Seq(col("v"), col("event_id")), "rk")
      .crossJoin(broadcast(nRef))
      .withColumn("bucket", expr("(rk - 1) * 10 div n_ref"))
    val edges = ranked.filter(col("bucket") < 9)
      .groupBy(col("bucket")).agg(max(col("v")).as("hi"))
      .agg(sort_array(collect_list(col("hi"))).as("edges"))
    val binned = tagged.crossJoin(broadcast(edges))
      .withColumn("bin", expr("cast(size(filter(edges, e -> e < v)) as bigint)"))
      .groupBy(col("bin"))
      .agg(sum(col("is_ref")).as("ref_count"),
        sum(lit(1L) - col("is_ref")).as("cur_count"))
    val grid = spark.range(0, 10).select(col("id").as("bin"))
      .join(binned, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("ref_count"), lit(0L)).as("ref_count"),
        coalesce(col("cur_count"), lit(0L)).as("cur_count"))
      .localCheckpoint(true) // 10 rows; consumed by terms + total
    val tot = grid.agg(sum(col("ref_count")).as("na"),
      sum(col("cur_count")).as("nb"))
    val terms = grid.crossJoin(broadcast(tot))
      // ln-argument products in decimal(38,0) (DuckDB mirrors in
      // HUGEINT): (c+1)·(n+10) wraps int64 once both sides pass ~3e9
      // events — the chi-square-entry widening discipline
      .withColumn("psi_term", round(
        ((col("ref_count") + 1) / (col("na") + 10) -
          (col("cur_count") + 1) / (col("nb") + 10)) *
          log(expr("cast(cast(ref_count + 1 as decimal(38,0)) * (nb + 10) " +
              "as double)") /
            expr("cast(cast(cur_count + 1 as decimal(38,0)) * (na + 10) " +
              "as double)")), 6))
      .localCheckpoint(true) // consumed by the total + the output
    val total = terms.agg(
      sum(col("psi_term").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .cast("double").as("psi_total"))
    terms.crossJoin(broadcast(total))
      .select(col("bin"), col("ref_count"), col("cur_count"),
        col("psi_term"), col("psi_total"),
        (col("psi_total") >= 0.25).cast("long").as("shifted"))
      .orderBy(col("bin"))
  }

  val metaPsiSql: String =
    """WITH ev AS (
      | SELECT event_id, epoch_us(ts) AS us,
      |  cast(round(value * 100) as bigint) AS v
      | FROM events WHERE event_type = 'purchase'),
      |bounds AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
      |tagged AS (
      | SELECT event_id, v,
      |  CASE WHEN us <= b.mid THEN 1 ELSE 0 END AS is_ref
      | FROM ev, bounds b),
      |ref AS (
      | SELECT v, row_number() OVER (ORDER BY v, event_id) AS rk
      | FROM tagged WHERE is_ref = 1),
      |nref AS (SELECT cast(count(*) as bigint) AS n_ref FROM ref),
      |edges AS (
      | SELECT list_sort(list(hi)) AS edges
      | FROM (SELECT bucket, max(v) AS hi
      |       FROM (SELECT (rk - 1) * 10 // n.n_ref AS bucket, v
      |             FROM ref, nref n)
      |       WHERE bucket < 9 GROUP BY bucket)),
      |binned AS (
      | SELECT cast(len(list_filter(e.edges, x -> x < t.v)) as bigint) AS bin,
      |  cast(sum(t.is_ref) as bigint) AS ref_count,
      |  cast(sum(1 - t.is_ref) as bigint) AS cur_count
      | FROM tagged t, edges e GROUP BY 1),
      |grid AS (
      | SELECT g.bin, coalesce(b.ref_count, 0) AS ref_count,
      |  coalesce(b.cur_count, 0) AS cur_count
      | FROM (SELECT unnest(range(0, 10)) AS bin) g
      | LEFT JOIN binned b ON b.bin = g.bin),
      |tot AS (
      | SELECT cast(sum(ref_count) as bigint) AS na,
      |  cast(sum(cur_count) as bigint) AS nb FROM grid),
      |terms AS (
      | SELECT g.bin, g.ref_count, g.cur_count,
      |  round(((g.ref_count + 1) / cast(t.na + 10 as double)
      |    - (g.cur_count + 1) / cast(t.nb + 10 as double))
      |   * ln(cast(cast(g.ref_count + 1 as hugeint) * (t.nb + 10) as double)
      |     / cast(cast(g.cur_count + 1 as hugeint) * (t.na + 10) as double)),
      |    6) AS psi_term
      | FROM grid g, tot t),
      |total AS (
      | SELECT cast(sum(cast(psi_term as decimal(18,6))) as double)
      |   AS psi_total
      | FROM terms)
      |SELECT te.bin, te.ref_count, te.cur_count, te.psi_term, tt.psi_total,
      | cast(CASE WHEN tt.psi_total >= 0.25 THEN 1 ELSE 0 END as bigint)
      |   AS shifted
      |FROM terms te, total tt
      |ORDER BY te.bin""".stripMargin

  /** BENJAMINI–HOCHBERG FDR CORRECTION (Benjamini & Hochberg, JRSS-B
    * '95) over a family of deterministic randomization tests — the
    * multiple-testing discipline every metric-mining pipeline needs
    * once it screens MANY hypotheses: here, "does weekday d's mean
    * purchase value differ?" for each of the 7 days-of-week. Each
    * per-day p-value is EXACT INTEGER arithmetic — the
    * [[metaPermutationTest]] machinery (Knuth-hash relabelings,
    * committed 100 replicates, cross-product statistic
    * |s_d·n_rest − s_rest·n_d| so no division ever happens), p =
    * (1 + #{t_rep ≥ t_obs}) / (R+1) kept as a numerator over the
    * committed denominator 101. The BH step-up is then pure integer:
    * rank p ascending, k qualifies iff p_num·m·20 ≤ k·(R+1)
    * (α = 1/20, m = 7), reject every rank ≤ the largest qualifying k.
    * NO floats anywhere — the whole multiple-testing chain is exact.
    *
    * Scale shape: one data-sized explode ×100 with a single
    * groupBy(rep, label) carrying map-side partials (the permutation
    * test's shape); everything after is a 700-row then 7-row frame
    * ranked via DistRank. */
  def q143FdrBh(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        round(col("value") * 100).cast("long").as("v"),
        expr("pmod(datediff(to_date(ts), date'1970-01-01'), 7)")
          .cast("long").as("dow"))
      .localCheckpoint(true) // consumed by the observed pass + replicates
    val tot = base.agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val obs = base.groupBy(col("dow"))
      .agg(count(lit(1)).as("n_d"), sum(col("v")).as("s_d"))
      .crossJoin(broadcast(tot))
      .withColumn("t_obs", abs(col("s_d") * (col("n") - col("n_d")) -
        (col("sv") - col("s_d")) * col("n_d")))
      .select(col("dow"), col("n_d"), col("t_obs"))
    val reps = base
      .select(col("v"),
        explode(expr(s"sequence(1, $permReps)")).as("rep"),
        col("event_id"))
      .withColumn("lab", expr(
        s"pmod(pmod(event_id, 2147483648L) * 2654435761L + rep * 40503L, " +
          "4294967296L) % 7"))
      .groupBy(col("rep"), col("lab"))
      .agg(count(lit(1)).as("c"), sum(col("v")).as("s"))
      .crossJoin(broadcast(tot))
      .withColumn("t_r", abs(col("s") * (col("n") - col("c")) -
        (col("sv") - col("s")) * col("c")))
      .select(col("lab"), col("t_r"))
    val counted = obs.join(reps, col("lab") === col("dow"), "left")
      .groupBy(col("dow"), col("n_d"), col("t_obs"))
      .agg(coalesce(sum((col("t_r") >= col("t_obs")).cast("long")), lit(0L))
        .as("cnt_ge"))
      .withColumn("p_num", col("cnt_ge") + 1)
      .localCheckpoint(true) // 7 rows; DistRank's two passes must not
                             // re-run the 100-replicate explode
    val ranked = graft.operators.DistRank.withRowNumber(
        counted, Seq(col("p_num"), col("dow")), "rk")
      .withColumn("bh_ok",
        (col("p_num") * 140 <= col("rk") * (permReps + 1)).cast("long"))
      .localCheckpoint(true) // 7 rows; consumed by kmax + output
    val kmax = ranked.agg(
      coalesce(max(when(col("bh_ok") === 1, col("rk"))), lit(0L)).as("kmax"))
    ranked.crossJoin(broadcast(kmax))
      .select(col("dow"), col("n_d"), col("t_obs"), col("cnt_ge"),
        col("p_num"), lit(permReps + 1L).as("p_den"), col("rk"),
        col("bh_ok"), (col("rk") <= col("kmax")).cast("long").as("rejected"))
      .orderBy(col("dow"))
  }

  lazy val q143Sql: String =
    s"""WITH base AS (
       | SELECT event_id, cast(round(value * 100) as bigint) AS v,
       |  cast(date_diff('day', DATE '1970-01-01', cast(ts as date)) % 7
       |    as bigint) AS dow
       | FROM events WHERE event_type = 'purchase'),
       |tot AS (SELECT cast(count(*) as bigint) AS n,
       |               cast(sum(v) as bigint) AS sv FROM base),
       |obs AS (
       | SELECT dow, cast(count(*) as bigint) AS n_d,
       |  abs(cast(sum(v) as bigint) * (t.n - count(*))
       |    - (t.sv - cast(sum(v) as bigint)) * count(*)) AS t_obs
       | FROM base, tot t GROUP BY dow, t.n, t.sv),
       |reps AS (
       | SELECT r.rep,
       |  (((b.event_id % 2147483648) * 2654435761 + r.rep * 40503)
       |    % 4294967296) % 7 AS lab,
       |  cast(count(*) as bigint) AS c, cast(sum(b.v) as bigint) AS s
       | FROM base b, (SELECT unnest(range(1, ${permReps + 1})) AS rep) r
       | GROUP BY 1, 2),
       |repstats AS (
       | SELECT lab, abs(s * (t.n - c) - (t.sv - s) * c) AS t_r
       | FROM reps, tot t),
       |counted AS (
       | SELECT o.dow, o.n_d, o.t_obs,
       |  cast(coalesce(sum(CASE WHEN r.t_r >= o.t_obs THEN 1 ELSE 0 END), 0)
       |    as bigint) AS cnt_ge
       | FROM obs o LEFT JOIN repstats r ON r.lab = o.dow
       | GROUP BY 1, 2, 3),
       |ranked AS (
       | SELECT *, cnt_ge + 1 AS p_num,
       |  row_number() OVER (ORDER BY cnt_ge + 1, dow) AS rk
       | FROM counted),
       |flags AS (
       | SELECT *, CASE WHEN p_num * 140 <= rk * ${permReps + 1}
       |   THEN 1 ELSE 0 END AS bh_ok
       | FROM ranked),
       |kmax AS (
       | SELECT coalesce(max(CASE WHEN bh_ok = 1 THEN rk END), 0) AS kmax
       | FROM flags)
       |SELECT f.dow, f.n_d, f.t_obs, f.cnt_ge,
       | cast(f.p_num as bigint) AS p_num,
       | cast(${permReps + 1} as bigint) AS p_den,
       | cast(f.rk as bigint) AS rk, cast(f.bh_ok as bigint) AS bh_ok,
       | cast(CASE WHEN f.rk <= k.kmax THEN 1 ELSE 0 END as bigint)
       |   AS rejected
       |FROM flags f, kmax k ORDER BY f.dow""".stripMargin

  /** ROLLING MEDIAN over a trailing 7-day window per event type — the
    * robust smoother ops dashboards overlay on spiky daily series
    * (the median ignores a single outage/burst day that would drag
    * [[q92EwmaHalflife]]'s mean-family smoothers). SQL window frames
    * cannot express a moving PERCENTILE, so the window materializes
    * as a bounded offset self-join (≤ 7 rows per center — calendar-
    * bounded, the [[q140SeasonalDecompose]] shape) and the median is
    * the committed LOWER median: the value at rank (n+1) div 2 under
    * the (value, day) total order — integer-exact, tie-deterministic.
    *
    * Scale shape: ONE data-sized aggregation to (type, day); the
    * self-join and rank run on the answer-sized daily series with one
    * (type) partitioning. Warm-up days report their shorter-window
    * median (n < 7), flagged by n_in_window. */
  def q144RollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit(java.sql.Date.valueOf("1970-01-01")))
          .cast("long").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
      .localCheckpoint(true) // both sides of the offset self-join
    val j = daily.join(
      daily.select(col("event_type"), col("d").as("d2"), col("v").as("v2")),
      Seq("event_type"))
      .filter(col("d2") >= col("d") - 6 && col("d2") <= col("d"))
    val w = Window.partitionBy(col("event_type"), col("d"))
      .orderBy(col("v2"), col("d2"))
    val wAll = Window.partitionBy(col("event_type"), col("d"))
    j.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col("d").as("day_idx"),
        col("n").as("n_in_window"), col("v2").as("median_cents"),
        col("v").as("today_cents"))
      .orderBy(col("event_type"), col("day_idx"))
  }

  val q144Sql: String =
    """WITH daily AS (
      | SELECT event_type,
      |  cast(date_diff('day', DATE '1970-01-01', cast(ts as date))
      |    as bigint) AS d,
      |  cast(sum(cast(round(value * 100) as bigint)) as bigint) AS v
      | FROM events GROUP BY 1, 2),
      |j AS (
      | SELECT a.event_type, a.d, a.v, b.d AS d2, b.v AS v2
      | FROM daily a JOIN daily b ON b.event_type = a.event_type
      |  AND b.d >= a.d - 6 AND b.d <= a.d),
      |ranked AS (
      | SELECT *,
      |  row_number() OVER (PARTITION BY event_type, d
      |    ORDER BY v2, d2) AS rn,
      |  count(*) OVER (PARTITION BY event_type, d) AS n
      | FROM j)
      |SELECT event_type, d AS day_idx, cast(n as bigint) AS n_in_window,
      | v2 AS median_cents, v AS today_cents
      |FROM ranked WHERE rn = (n + 1) // 2
      |ORDER BY event_type, day_idx""".stripMargin

  /** INTERRUPTED TIME-SERIES ANALYSIS (segmented regression; Wagner
    * et al., J Clin Pharm Ther '02 — the standard quasi-experimental
    * read when an intervention has a known date and no control
    * group): fit OLS on daily purchase revenue SEPARATELY before and
    * after the committed break point (the timeline midpoint day —
    * deterministic, like [[metaPsi]]'s split), then report the two
    * causal quantities: the LEVEL JUMP (both segments' fitted values
    * AT the break, difference) and the SLOPE CHANGE. All arithmetic
    * is exact until one committed floor per reported number: moments
    * (n, Σx, Σy, Σxy, Σx²) accumulate in int64, every cross-product
    * runs in decimal(38,0) (DuckDB: HUGEINT), the slope is the exact
    * rational N/D floored via the shift identity, and the fitted
    * level at x₀ uses the UN-truncated rational
    * (Σy·D + N·(n·x₀−Σx)) / (n·D) so no error compounds.
    *
    * Scale shape: one data-sized aggregation to daily grain, one
    * 2-row moment aggregate, answer-sized arithmetic after. */
  def q145InterruptedTs(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(datediff(to_date(col("ts")),
        lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .localCheckpoint(true) // consumed by the bounds + the moment pass
    val x0f = daily.agg(expr("(min(d) + max(d)) div 2").as("x0"))
    val m = daily.crossJoin(broadcast(x0f))
      .withColumn("seg", (col("d") <= col("x0")).cast("long"))
      .groupBy(col("seg"))
      .agg(max(col("x0")).as("x0"), count(lit(1)).as("n"),
        sum(col("d")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("d * y")).as("sxy"), sum(expr("d * d")).as("sxx"))
      .withColumn("nn", expr("cast(n as decimal(38,0)) * sxy " +
        "- cast(sx as decimal(38,0)) * sy"))
      .withColumn("dd", expr("cast(n as decimal(38,0)) * sxx " +
        "- cast(sx as decimal(38,0)) * sx"))
      .withColumn("slope_micro", expr("CASE WHEN dd > 0 THEN " +
        "(nn * 1000000 + 1000000000000 * dd) div dd - 1000000000000 END"))
      .withColumn("level_micro", expr("CASE WHEN dd > 0 THEN " +
        "((cast(sy as decimal(38,0)) * dd + nn * (n * x0 - sx)) * 1000000 " +
        " + 10000000000000000 * (cast(n as decimal(38,0)) * dd)) " +
        " div (cast(n as decimal(38,0)) * dd) - 10000000000000000 END"))
      .localCheckpoint(true) // 2 rows; consumed by the pivot twice
    def pick(c: String, seg: Int) =
      max(when(col("seg") === seg, col(c))).as(s"${c}_${if (seg == 1) "pre" else "post"}")
    m.agg(max(col("x0")).as("break_day"),
        pick("n", 1), pick("n", 0),
        pick("slope_micro", 1), pick("slope_micro", 0),
        pick("level_micro", 1), pick("level_micro", 0))
      .select(col("break_day"), col("n_pre"), col("n_post"),
        col("slope_micro_pre"), col("slope_micro_post"),
        (col("slope_micro_post") - col("slope_micro_pre"))
          .as("slope_delta_micro"),
        col("level_micro_pre"), col("level_micro_post"),
        (col("level_micro_post") - col("level_micro_pre")).as("jump_micro"))
  }

  val q145Sql: String =
    """WITH daily AS (
      | SELECT cast(date_diff('day', DATE '1970-01-01', cast(ts as date))
      |   as bigint) AS d,
      |  cast(sum(cast(round(value * 100) as bigint)) as bigint) AS y
      | FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |x0f AS (SELECT (min(d) + max(d)) // 2 AS x0 FROM daily),
      |m AS (
      | SELECT CASE WHEN d <= x.x0 THEN 1 ELSE 0 END AS seg,
      |  max(x.x0) AS x0, cast(count(*) as bigint) AS n,
      |  cast(sum(d) as bigint) AS sx, cast(sum(y) as bigint) AS sy,
      |  cast(sum(d * y) as bigint) AS sxy,
      |  cast(sum(d * d) as bigint) AS sxx
      | FROM daily, x0f x GROUP BY 1),
      |per AS (
      | SELECT seg, x0, n,
      |  cast(n as hugeint) * sxy - cast(sx as hugeint) * sy AS nn,
      |  cast(n as hugeint) * sxx - cast(sx as hugeint) * sx AS dd,
      |  sx, sy
      | FROM m),
      |calc AS (
      | SELECT seg, x0, n,
      |  CASE WHEN dd > 0 THEN cast(
      |   (nn * 1000000 + 1000000000000 * dd) // dd - 1000000000000
      |   as bigint) END AS slope_micro,
      |  CASE WHEN dd > 0 THEN cast(
      |   ((cast(sy as hugeint) * dd + nn * (n * x0 - sx)) * 1000000
      |    + 10000000000000000 * (cast(n as hugeint) * dd))
      |   // (cast(n as hugeint) * dd) - 10000000000000000 as bigint)
      |  END AS level_micro
      | FROM per)
      |SELECT max(x0) AS break_day,
      | max(CASE WHEN seg = 1 THEN n END) AS n_pre,
      | max(CASE WHEN seg = 0 THEN n END) AS n_post,
      | max(CASE WHEN seg = 1 THEN slope_micro END) AS slope_micro_pre,
      | max(CASE WHEN seg = 0 THEN slope_micro END) AS slope_micro_post,
      | max(CASE WHEN seg = 0 THEN slope_micro END)
      |  - max(CASE WHEN seg = 1 THEN slope_micro END) AS slope_delta_micro,
      | max(CASE WHEN seg = 1 THEN level_micro END) AS level_micro_pre,
      | max(CASE WHEN seg = 0 THEN level_micro END) AS level_micro_post,
      | max(CASE WHEN seg = 0 THEN level_micro END)
      |  - max(CASE WHEN seg = 1 THEN level_micro END) AS jump_micro
      |FROM calc""".stripMargin

  /** SHIFT-SHARE (volume/rate/mix) DECOMPOSITION — the classic BI
    * bridge ("why did revenue move?"): per order-priority segment,
    * the period-over-period revenue delta splits EXACTLY into
    * Δrev = Δn·rate₀ + n₀·Δrate + Δn·Δrate, with rate = revenue per
    * order. Periods are the two halves of the order timeline
    * (committed integer midpoint of epoch days). Rates are committed
    * micro-cent truncations (rev·10⁶ div n), so the three effects
    * don't exactly reconstruct the delta — the RESIDUAL column
    * carries the truncation remainder honestly instead of hiding it
    * (|residual| < n₁ micro-cents by construction, spec-pinned).
    * Products run in decimal(38,0)/HUGEINT: Δn·rate_micro already
    * passes int64 at ~10⁶ orders × 10¹³ micro-rate.
    *
    * Scale shape: one data-sized groupBy(segment, period); the
    * decomposition is arithmetic on a 5×2 frame. */
  def q146ShiftShare(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
      .select(col("o_orderpriority").as("seg"),
        datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1970-01-01")))
          .cast("long").as("d"),
        round(col("o_totalprice") * 100).cast("long").as("rev"))
      .localCheckpoint(true) // consumed by bounds + the period aggregate
    val mid = ord.agg(expr("(min(d) + max(d)) div 2").as("mid"))
    val per = ord.crossJoin(broadcast(mid))
      .withColumn("p", (col("d") > col("mid")).cast("long"))
      .groupBy(col("seg"))
      .agg(sum(when(col("p") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("p") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("p") === 0, col("rev")).otherwise(0L)).as("rev0"),
        sum(when(col("p") === 1, col("rev")).otherwise(0L)).as("rev1"))
      .withColumn("rate0",
        expr("cast(rev0 as decimal(38,0)) * 1000000 div n0"))
      .withColumn("rate1",
        expr("cast(rev1 as decimal(38,0)) * 1000000 div n1"))
    per.select(col("seg"), col("n0"), col("n1"), col("rev0"), col("rev1"),
        col("rate0").as("rate0_micro"), col("rate1").as("rate1_micro"),
        expr("cast(n1 - n0 as decimal(38,0)) * rate0")
          .cast("long").as("volume_effect_micro"),
        expr("cast(n0 as decimal(38,0)) * (rate1 - rate0)")
          .cast("long").as("rate_effect_micro"),
        expr("cast(n1 - n0 as decimal(38,0)) * (rate1 - rate0)")
          .cast("long").as("interaction_micro"),
        expr("cast(rev1 - rev0 as decimal(38,0)) * 1000000 " +
          "- (cast(n1 - n0 as decimal(38,0)) * rate0 " +
          "+ cast(n0 as decimal(38,0)) * (rate1 - rate0) " +
          "+ cast(n1 - n0 as decimal(38,0)) * (rate1 - rate0))")
          .cast("long").as("residual_micro"))
      .orderBy(col("seg"))
  }

  val q146Sql: String =
    """WITH ord AS (
      | SELECT o_orderpriority AS seg,
      |  cast(date_diff('day', DATE '1970-01-01', o_orderdate) as bigint)
      |    AS d,
      |  cast(round(o_totalprice * 100) as bigint) AS rev
      | FROM orders),
      |mid AS (SELECT (min(d) + max(d)) // 2 AS mid FROM ord),
      |per AS (
      | SELECT seg,
      |  cast(sum(CASE WHEN d <= m.mid THEN 1 ELSE 0 END) as bigint) AS n0,
      |  cast(sum(CASE WHEN d > m.mid THEN 1 ELSE 0 END) as bigint) AS n1,
      |  cast(sum(CASE WHEN d <= m.mid THEN rev ELSE 0 END) as bigint)
      |    AS rev0,
      |  cast(sum(CASE WHEN d > m.mid THEN rev ELSE 0 END) as bigint)
      |    AS rev1
      | FROM ord, mid m GROUP BY seg),
      |rates AS (
      | SELECT *, cast(cast(rev0 as hugeint) * 1000000 // n0 as bigint)
      |    AS rate0,
      |  cast(cast(rev1 as hugeint) * 1000000 // n1 as bigint) AS rate1
      | FROM per)
      |SELECT seg, n0, n1, rev0, rev1,
      | rate0 AS rate0_micro, rate1 AS rate1_micro,
      | cast(cast(n1 - n0 as hugeint) * rate0 as bigint)
      |   AS volume_effect_micro,
      | cast(cast(n0 as hugeint) * (rate1 - rate0) as bigint)
      |   AS rate_effect_micro,
      | cast(cast(n1 - n0 as hugeint) * (rate1 - rate0) as bigint)
      |   AS interaction_micro,
      | cast(cast(rev1 - rev0 as hugeint) * 1000000
      |  - (cast(n1 - n0 as hugeint) * rate0
      |     + cast(n0 as hugeint) * (rate1 - rate0)
      |     + cast(n1 - n0 as hugeint) * (rate1 - rate0)) as bigint)
      |   AS residual_micro
      |FROM rates ORDER BY seg""".stripMargin

  /** SEASONAL / TREND STRENGTH of the decomposition (Hyndman &
    * Athanasopoulos, "Forecasting: Principles and Practice" §STL
    * features; Wang-Smith-Hyndman '06): F_seas = 1 − Var(R)/Var(S+R)
    * and F_trend = 1 − Var(R)/Var(T+R) over [[q140SeasonalDecompose]]'s
    * full-window months — the two numbers that say whether the
    * decomposition actually found structure. Population variances
    * as exact integer cross-moments n·Σx² − (Σx)² in decimal(38,0)
    * (ΣR² passes int64 at ~10¹⁰-cent residuals); the shared n²
    * denominator cancels in the ratio, so each strength is ONE
    * committed floor: 10⁴ − (varR_num·10⁴) div varX_num, clamped at
    * 0 like the reference definition.
    *
    * Scale shape: consumes the decomposition entry's own output
    * (answer-sized), one aggregate. */
  def q147DecompStrength(spark: SparkSession, dir: String): DataFrame = {
    val comp = q140SeasonalDecompose(spark, dir)
      .filter(col("trend_cents").isNotNull)
      .select(col("remainder_cents").as("r"),
        (col("seasonal_cents") + col("remainder_cents")).as("sr"),
        (col("trend_cents") + col("remainder_cents")).as("tr"))
    comp.agg(count(lit(1)).as("n"),
        sum(col("r")).as("s_r"),
        sum(expr("cast(r as decimal(38,0)) * r")).as("ss_r"),
        sum(col("sr")).as("s_sr"),
        sum(expr("cast(sr as decimal(38,0)) * sr")).as("ss_sr"),
        sum(col("tr")).as("s_tr"),
        sum(expr("cast(tr as decimal(38,0)) * tr")).as("ss_tr"))
      .withColumn("var_r_num", expr("n * ss_r - cast(s_r as decimal(38,0)) * s_r"))
      .withColumn("var_sr_num", expr("n * ss_sr - cast(s_sr as decimal(38,0)) * s_sr"))
      .withColumn("var_tr_num", expr("n * ss_tr - cast(s_tr as decimal(38,0)) * s_tr"))
      .select(col("n").as("n_full"),
        expr("CASE WHEN var_sr_num > 0 THEN " +
          "greatest(0L, 10000 - cast(var_r_num * 10000 div var_sr_num " +
          "as bigint)) END").as("seas_strength_bp"),
        expr("CASE WHEN var_tr_num > 0 THEN " +
          "greatest(0L, 10000 - cast(var_r_num * 10000 div var_tr_num " +
          "as bigint)) END").as("trend_strength_bp"),
        col("var_r_num").cast("double").as("var_r_scaled"),
        col("var_sr_num").cast("double").as("var_sr_scaled"),
        col("var_tr_num").cast("double").as("var_tr_scaled"))
  }

  lazy val q147Sql: String =
    s"""WITH comp AS (SELECT * FROM ($q140Sql) WHERE trend_cents IS NOT NULL),
       |m AS (
       | SELECT cast(count(*) as bigint) AS n,
       |  cast(sum(remainder_cents) as hugeint) AS s_r,
       |  sum(cast(remainder_cents as hugeint) * remainder_cents) AS ss_r,
       |  cast(sum(seasonal_cents + remainder_cents) as hugeint) AS s_sr,
       |  sum(cast(seasonal_cents + remainder_cents as hugeint)
       |    * (seasonal_cents + remainder_cents)) AS ss_sr,
       |  cast(sum(trend_cents + remainder_cents) as hugeint) AS s_tr,
       |  sum(cast(trend_cents + remainder_cents as hugeint)
       |    * (trend_cents + remainder_cents)) AS ss_tr
       | FROM comp),
       |v AS (
       | SELECT n, n * ss_r - s_r * s_r AS var_r_num,
       |  n * ss_sr - s_sr * s_sr AS var_sr_num,
       |  n * ss_tr - s_tr * s_tr AS var_tr_num
       | FROM m)
       |SELECT n AS n_full,
       | CASE WHEN var_sr_num > 0 THEN
       |  greatest(0, 10000 - cast(var_r_num * 10000 // var_sr_num
       |    as bigint)) END AS seas_strength_bp,
       | CASE WHEN var_tr_num > 0 THEN
       |  greatest(0, 10000 - cast(var_r_num * 10000 // var_tr_num
       |    as bigint)) END AS trend_strength_bp,
       | cast(var_r_num as double) AS var_r_scaled,
       | cast(var_sr_num as double) AS var_sr_scaled,
       | cast(var_tr_num as double) AS var_tr_scaled
       |FROM v""".stripMargin

  /** ACTIVITY HEATMAP — the (weekday × hour) event-density grid every
    * ops dashboard opens with: counts, bp share of total, per-cell
    * purchase rate (bp of that cell's events), and the peak flag
    * under the (count desc, dow, hour) total order. Day-of-week is
    * the portable epoch-mod-7 (Spark and DuckDB disagree on
    * dayofweek's 0-base — the [[graft.operators.Warehouse]]
    * association-panel lesson); hour is UTC. Zero-filled on the full
    * 7×24 grid so the silent-cell pattern is visible, not absent.
    *
    * Scale shape: ONE data-sized groupBy onto ≤ 168 cells with
    * map-side partials; grid fill and ranking are answer-sized. */
  def q148ActivityHeatmap(spark: SparkSession, dir: String): DataFrame = {
    val cells = t(spark, dir, "events")
      .select(expr("pmod(datediff(to_date(ts), date'1970-01-01'), 7)")
        .cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hr"),
        (col("event_type") === "purchase").cast("long").as("is_p"))
      .groupBy(col("dow"), col("hr"))
      .agg(count(lit(1)).as("cnt"), sum(col("is_p")).as("purchases"))
    val grid = spark.range(0, 7).select(col("id").as("dow"))
      .crossJoin(spark.range(0, 24).select(col("id").as("hr")))
      .join(cells, Seq("dow", "hr"), "left")
      .select(col("dow"), col("hr"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        coalesce(col("purchases"), lit(0L)).as("purchases"))
      .localCheckpoint(true) // consumed by the total + the peak rank
    val tot = grid.agg(sum(col("cnt")).as("n"))
    val peak = grid.orderBy(col("cnt").desc, col("dow"), col("hr")).limit(1)
      .select(col("dow").as("pk_dow"), col("hr").as("pk_hr"))
    grid.crossJoin(broadcast(tot)).crossJoin(broadcast(peak))
      .select(col("dow"), col("hr"), col("cnt"),
        expr("cnt * 10000 div n").as("share_bp"),
        expr("CASE WHEN cnt > 0 THEN purchases * 10000 div cnt " +
          "ELSE 0 END").as("purchase_rate_bp"),
        (col("dow") === col("pk_dow") && col("hr") === col("pk_hr"))
          .cast("long").as("is_peak"))
      .orderBy(col("dow"), col("hr"))
  }

  val q148Sql: String =
    """WITH cells AS (
      | SELECT cast(date_diff('day', DATE '1970-01-01', cast(ts as date))
      |   % 7 as bigint) AS dow,
      |  cast(hour(ts) as bigint) AS hr,
      |  cast(count(*) as bigint) AS cnt,
      |  cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    as bigint) AS purchases
      | FROM events GROUP BY 1, 2),
      |grid AS (
      | SELECT d.dow, h.hr, coalesce(c.cnt, 0) AS cnt,
      |  coalesce(c.purchases, 0) AS purchases
      | FROM (SELECT unnest(range(0, 7)) AS dow) d
      | CROSS JOIN (SELECT unnest(range(0, 24)) AS hr) h
      | LEFT JOIN cells c ON c.dow = d.dow AND c.hr = h.hr),
      |tot AS (SELECT cast(sum(cnt) as bigint) AS n FROM grid),
      |peak AS (
      | SELECT dow AS pk_dow, hr AS pk_hr FROM grid
      | ORDER BY cnt DESC, dow, hr LIMIT 1)
      |SELECT g.dow, g.hr, g.cnt,
      | cast(g.cnt * 10000 // t.n as bigint) AS share_bp,
      | cast(CASE WHEN g.cnt > 0 THEN g.purchases * 10000 // g.cnt
      |   ELSE 0 END as bigint) AS purchase_rate_bp,
      | cast(CASE WHEN g.dow = p.pk_dow AND g.hr = p.pk_hr
      |   THEN 1 ELSE 0 END as bigint) AS is_peak
      |FROM grid g, tot t, peak p
      |ORDER BY g.dow, g.hr""".stripMargin

  /** TWO-PROPORTION TEST on the 2×2 table — the A/B-testing
    * workhorse (Pearson χ² on a fourfold table, algebraically
    * z² for two proportions): did the PURCHASE SHARE of events
    * change between the two halves of the timeline? χ² =
    * n(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) is ONE exact integer rational
    * — computed with a single committed floor in micro-units, every
    * product in decimal(38,0)/HUGEINT ((ad−bc)² alone passes int64
    * at ~10⁵ events). Committed χ²₀.₀₅ df=1 critical 3.841. The
    * absolute-difference column (p₂−p₁ in micro) uses the signed
    * shift identity.
    *
    * Scale shape: one data-sized aggregate to four cells. */
  def q149ConversionAb(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(unix_micros(col("ts")).as("us"),
        (col("event_type") === "purchase").cast("long").as("is_p"))
    val bounds = ev.agg(expr("(min(us) + max(us)) div 2").as("mid"))
    val cells = ev.crossJoin(broadcast(bounds))
      .withColumn("h", (col("us") > col("mid")).cast("long"))
      .agg(
        sum(when(col("h") === 0, col("is_p")).otherwise(0L)).as("a"),
        sum(when(col("h") === 0, lit(1L) - col("is_p")).otherwise(0L)).as("b"),
        sum(when(col("h") === 1, col("is_p")).otherwise(0L)).as("c"),
        sum(when(col("h") === 1, lit(1L) - col("is_p")).otherwise(0L)).as("d"))
    cells
      .withColumn("n", expr("a + b + c + d"))
      .withColumn("chi2_micro", expr(
        "cast(n as decimal(38,0)) " +
          "* (cast(a as decimal(38,0)) * d - cast(b as decimal(38,0)) * c) " +
          "* (cast(a as decimal(38,0)) * d - cast(b as decimal(38,0)) * c) " +
          "* 1000000 div (cast(a + b as decimal(38,0)) * (c + d) " +
          "* (a + c) * (b + d))"))
      .select(col("a").as("conv_pre"), col("b").as("nonconv_pre"),
        col("c").as("conv_post"), col("d").as("nonconv_post"),
        expr("a * 1000000 div (a + b)").as("rate_pre_micro"),
        expr("c * 1000000 div (c + d)").as("rate_post_micro"),
        expr("(c * 1000000 div (c + d)) - (a * 1000000 div (a + b))")
          .as("rate_delta_micro"),
        col("chi2_micro"),
        (col("chi2_micro") > 3841000L).cast("long").as("significant"))
  }

  val q149Sql: String =
    """WITH ev AS (
      | SELECT epoch_us(ts) AS us,
      |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      | FROM events),
      |bounds AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
      |cells AS (
      | SELECT
      |  cast(sum(CASE WHEN us <= b.mid THEN is_p ELSE 0 END) as bigint)
      |    AS a,
      |  cast(sum(CASE WHEN us <= b.mid THEN 1 - is_p ELSE 0 END) as bigint)
      |    AS b,
      |  cast(sum(CASE WHEN us > b.mid THEN is_p ELSE 0 END) as bigint)
      |    AS c,
      |  cast(sum(CASE WHEN us > b.mid THEN 1 - is_p ELSE 0 END) as bigint)
      |    AS d
      | FROM ev, bounds b)
      |SELECT a AS conv_pre, b AS nonconv_pre, c AS conv_post,
      | d AS nonconv_post,
      | cast(a * 1000000 // (a + b) as bigint) AS rate_pre_micro,
      | cast(c * 1000000 // (c + d) as bigint) AS rate_post_micro,
      | cast((c * 1000000 // (c + d)) - (a * 1000000 // (a + b)) as bigint)
      |   AS rate_delta_micro,
      | cast(cast(a + b + c + d as hugeint)
      |  * (cast(a as hugeint) * d - cast(b as hugeint) * c)
      |  * (cast(a as hugeint) * d - cast(b as hugeint) * c)
      |  * 1000000 // (cast(a + b as hugeint) * (c + d) * (a + c) * (b + d))
      |  as bigint) AS chi2_micro,
      | cast(CASE WHEN cast(a + b + c + d as hugeint)
      |  * (cast(a as hugeint) * d - cast(b as hugeint) * c)
      |  * (cast(a as hugeint) * d - cast(b as hugeint) * c)
      |  * 1000000 // (cast(a + b as hugeint) * (c + d) * (a + c) * (b + d))
      |  > 3841000 THEN 1 ELSE 0 END as bigint) AS significant
      |FROM cells""".stripMargin

  /** INDEX OF DISPERSION for lines-per-order (Fisher's variance-to-
    * mean ratio; Cox & Lewis '66) — the first diagnostic on any COUNT
    * variable: Poisson arrivals give D ≈ 1, clumping gives D > 1,
    * regularity D < 1, and the χ² form (n−1)·D against df = n−1
    * makes it a test. Exact integer path: per-order line counts, the
    * population variance numerator n·Σc² − (Σc)² in
    * decimal(38,0)/HUGEINT, D in micro as ONE committed floor
    * D_micro = (n·Σc² − (Σc)²)·10⁶ div (n·Σc) — the n² of variance
    * and the n of the mean cancel to n·Σc exactly, so no error
    * compounds. Count histogram (min/max/mode) rides along; the
    * committed two-sided normal approximation flags |D−1| beyond
    * 2·√(2/(n−1)) (χ² normal limit), all in micro arithmetic with
    * one IEEE sqrt.
    *
    * Scale shape: one groupBy(order), one moment aggregate. */
  def q150Dispersion(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // consumed by moments + mode
    val mode = counts.groupBy(col("c")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("c")).limit(1)
      .select(col("c").as("mode_lines"))
    counts.agg(count(lit(1)).as("n_orders"),
        sum(col("c")).as("total_lines"),
        sum(expr("cast(c as decimal(38,0)) * c")).as("ss"),
        min(col("c")).as("min_lines"), max(col("c")).as("max_lines"))
      .withColumn("mean_micro", expr("total_lines * 1000000 div n_orders"))
      .withColumn("d_micro", expr(
        "(cast(n_orders as decimal(38,0)) * ss " +
          "- cast(total_lines as decimal(38,0)) * total_lines) * 1000000 " +
          "div (cast(n_orders as decimal(38,0)) * total_lines)"))
      .withColumn("threshold_micro", expr(
        "cast(round(2000000 * sqrt(2.0 / cast(n_orders - 1 as double))) " +
          "as bigint)"))
      .crossJoin(broadcast(mode))
      .select(col("n_orders"), col("total_lines"), col("min_lines"),
        col("max_lines"), col("mode_lines"), col("mean_micro"),
        col("d_micro"), col("threshold_micro"),
        (abs(col("d_micro") - 1000000L) > col("threshold_micro"))
          .cast("long").as("non_poisson"))
  }

  val q150Sql: String =
    """WITH counts AS (
      | SELECT l_orderkey, cast(count(*) as bigint) AS c
      | FROM lineitem GROUP BY 1),
      |mode AS (
      | SELECT c AS mode_lines FROM (
      |  SELECT c, count(*) AS f FROM counts GROUP BY c
      |  ORDER BY f DESC, c LIMIT 1)),
      |m AS (
      | SELECT cast(count(*) as bigint) AS n_orders,
      |  cast(sum(c) as bigint) AS total_lines,
      |  sum(cast(c as hugeint) * c) AS ss,
      |  cast(min(c) as bigint) AS min_lines,
      |  cast(max(c) as bigint) AS max_lines
      | FROM counts)
      |SELECT m.n_orders, m.total_lines, m.min_lines, m.max_lines,
      | mo.mode_lines,
      | cast(m.total_lines * 1000000 // m.n_orders as bigint) AS mean_micro,
      | cast((cast(m.n_orders as hugeint) * m.ss
      |   - cast(m.total_lines as hugeint) * m.total_lines) * 1000000
      |  // (cast(m.n_orders as hugeint) * m.total_lines) as bigint)
      |  AS d_micro,
      | cast(round(2000000 * sqrt(2.0 / cast(m.n_orders - 1 as double)))
      |   as bigint) AS threshold_micro,
      | cast(CASE WHEN abs(cast((cast(m.n_orders as hugeint) * m.ss
      |   - cast(m.total_lines as hugeint) * m.total_lines) * 1000000
      |  // (cast(m.n_orders as hugeint) * m.total_lines) as bigint)
      |  - 1000000) >
      |  cast(round(2000000 * sqrt(2.0 / cast(m.n_orders - 1 as double)))
      |    as bigint)
      |  THEN 1 ELSE 0 END as bigint) AS non_poisson
      |FROM m, mode mo""".stripMargin

  val all: Seq[GQuery] = Seq(
    GQuery("q150_dispersion", q150Dispersion, Some(q150Sql)),
    GQuery("q149_conversion_ab", q149ConversionAb, Some(q149Sql)),
    GQuery("q148_activity_heatmap", q148ActivityHeatmap, Some(q148Sql)),
    GQuery("q147_decomp_strength", q147DecompStrength, Some(q147Sql)),
    GQuery("q146_shift_share", q146ShiftShare, Some(q146Sql)),
    GQuery("q145_interrupted_ts", q145InterruptedTs, Some(q145Sql)),
    GQuery("q144_rolling_median", q144RollingMedian, Some(q144Sql)),
    GQuery("q143_fdr_bh", q143FdrBh, Some(q143Sql)),
    GQuery("q142_kruskal_wallis", q142KruskalWallis, Some(q142Sql)),
    GQuery("meta_psi", metaPsi, Some(metaPsiSql)),
    GQuery("q140_seasonal_decompose", q140SeasonalDecompose, Some(q140Sql)),
    GQuery("q141_kendall_tau", q141KendallTau, Some(q141Sql)),
    GQuery("q129_theil_sen", q129TheilSen, Some(q129Sql)),
    GQuery("q130_holt_winters", q130HoltWinters, Some(q130Sql)),
    GQuery("q132_cross_corr", q132CrossCorr, Some(q132Sql)),
    GQuery("q133_kaplan_meier", q133KaplanMeier, Some(q133Sql)),
    GQuery("q139_nelson_aalen", q139NelsonAalen, Some(q139Sql)),
    GQuery("meta_permutation_test", metaPermutationTest, Some(metaPermutationTestSql)),
    GQuery("meta_bootstrap_ci", metaBootstrapCi, Some(metaBootstrapCiSql)),
    GQuery("q134_log_rank", q134LogRank, Some(q134Sql)),
    GQuery("q135_price_index", q135PriceIndex, Some(q135Sql)),
    GQuery("q137_corr_matrix", q137CorrMatrix, Some(q137Sql)),
    GQuery("q138_herfindahl", q138Herfindahl, Some(q138Sql)),
    GQuery("q128_trend_test", q128TrendTest, Some(q128Sql)),
    GQuery("q127_lorenz_deciles", q127LorenzDeciles, Some(q127Sql)),
    GQuery("meta_autocorrelation", metaAutocorrelation,
      Some(metaAutocorrelationSql)),
    GQuery("q126_cusum", q126Cusum, Some(q126Sql)),
    GQuery("q125_holt_forecast", q125HoltForecast, Some(q125Sql)),
    GQuery("q122_anova", q122Anova, Some(q122Sql)),
    GQuery("meta_wasserstein", metaWasserstein, Some(metaWassersteinSql)),
    GQuery("meta_runs_test", metaRunsTest, Some(metaRunsTestSql)),
    GQuery("q117_spearman", q117Spearman, Some(q117Sql)),
    GQuery("q116_hypothetical_rank", q116HypotheticalRank, Some(q116Sql)),
    GQuery("q110_decile_migration", q110DecileMigration, Some(q110Sql)),
    GQuery("q109_weighted_median", q109WeightedMedian, Some(q109Sql)),
    GQuery("meta_outlier_iqr", metaOutlierIqr, Some(metaOutlierIqrSql)),
    GQuery("q107_seq_patterns", q107SeqPatterns, Some(q107Sql)),
    GQuery("q108_pop_growth", q108PopGrowth, Some(q108Sql)),
    GQuery("meta_changepoint", metaChangepoint, Some(metaChangepointSql)),
    GQuery("q106_dormancy", q106Dormancy, Some(q106Sql)),
    GQuery("q105_growth_accounting", q105GrowthAccounting, Some(q105Sql)),
    GQuery("q103_abc_xyz", q103AbcXyz, Some(q103Sql)),
    GQuery("q104_window_funnel", q104WindowFunnel, Some(q104Sql)),
    GQuery("q101_cohort_ltv", q101CohortLtv, Some(q101Sql)),
    GQuery("q102_time_to_convert", q102TimeToConvert, Some(q102Sql)),
    GQuery("q100_rolling_slope", q100RollingSlope, Some(q100Sql)),
    GQuery("q98_allocation", q98Allocation, Some(q98Sql)),
    GQuery("q99_interval_coverage", q99IntervalCoverage, Some(q99Sql)),
    GQuery("q96_decile_lift", q96DecileLift, Some(q96Sql)),
    GQuery("q97_rfm_segmentation", q97RfmSegmentation, Some(q97Sql)),
    GQuery("q94_rolling_distinct", q94RollingDistinct, Some(q94Sql)),
    GQuery("q95_bitemporal", q95Bitemporal, Some(q95Sql)),
    GQuery("q90_pattern_match", q90PatternMatch, Some(q90Sql)),
    GQuery("q91_pareto_abc", q91ParetoAbc, Some(q91Sql)),
    GQuery("q92_ewma_halflife", q92EwmaHalflife, Some(q92Sql)),
    GQuery("q89_market_basket", q89MarketBasket, Some(q89Sql)),
    GQuery("q74_funnel_steps", q74FunnelSteps, Some(q74Sql)),
    GQuery("q83_skyline", q83Skyline, Some(q83Sql)),
    GQuery("q84_ivm_join", q84IvmJoin, Some(q84Sql)),
    GQuery("q85_islands", q85Islands, Some(q85Sql)),
    GQuery("q75_retention_cohorts", q75RetentionCohorts, Some(q75Sql)),
    GQuery("q75b_retention_sketch", q75bRetentionSketch, Some(q75bSql)),
    GQuery("q69_setops_all", q69SetopsAll, Some(q69Sql)),
    GQuery("q67_mode_median", q67ModeMedian, Some(q67Sql)),
    GQuery("q66_sessionize_scan", q66SessionizeScan, Some(q66Sql)),
    GQuery("q63_posexplode", q63Posexplode, Some(q63Sql)),
    GQuery("q64_gap_fill", q64GapFill, Some(q64Sql)),
    GQuery("q81_time_weighted_avg", q81TimeWeightedAvg, Some(q81Sql)),
    GQuery("q82_attribution", q82Attribution, Some(q82Sql)),
    GQuery("q65_zscore_anomaly", q65ZscoreAnomaly, Some(q65Sql)),
    GQuery("q49_salted_join", q49SaltedJoin, Some(q49Sql)),
    GQuery("q47_array_funcs", q47ArrayFuncs, Some(q47Sql)),
    GQuery("q48_struct_json", q48StructJson, Some(q48Sql)),
    GQuery("q44_join_hint_smj", q44JoinHintSmj, Some(q44Sql)),
    GQuery("q111_join_strategies", q111JoinStrategies, Some(q111Sql)),
    GQuery("q112_not_in_nulls", q112NotInNulls, Some(q112Sql)),
    GQuery("q113_division", q113Division, Some(q113Sql)),
    GQuery("q45_sql_cte", q45SqlCte, Some(q45Sql)),
    GQuery("q46_approx_percentile", q46ApproxPercentile, Some(q46Sql)),
    GQuery("q37_percentiles", q37Percentiles, Some(q37Sql)),
    GQuery("q38_stats_agg", q38StatsAgg, Some(q38Sql)),
    GQuery("q39_pivot", q39Pivot, Some(q39Sql)),
    GQuery("q40_unpivot", q40Unpivot, Some(q40Sql)),
    GQuery("q41_collect_agg", q41CollectAgg, Some(q41Sql)),
    GQuery("q42_salted_agg", q42SaltedAgg, Some(q42Sql)),
    GQuery("q43_window_extras", q43WindowExtras, Some(q43Sql)),
  )
}
