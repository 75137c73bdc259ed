package graft.operators

import graft.GQuery
import graft.util._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The modern SQL surface of the engine — capabilities the reference
  * sandbox has no counterpart for (it has no SQL layer at all:
  * `/root/reference/src/main/java/.../KStreamsToKTable.java` builds one
  * fixed DSL topology), declared here because a user replacing the
  * reference with this engine gets a full ANSI-plus SQL front end from
  * Spark: recursive CTEs, the VARIANT semi-structured type, SQL-defined
  * functions, and SQL pipe syntax — each oracle-checked against DuckDB
  * where expressible.
  *
  * Scale notes: all four queries compile to the same Catalyst plans
  * their DataFrame twins would (the recursion materializes a 12-row
  * spine — driver-side-constant sized, never data-sized; the VARIANT
  * path is a per-row projection inside WholeStageCodegen; the SQL UDF
  * is inlined into the plan at analysis time — zero lambda overhead,
  * unlike a Scala UDF).
  */
object SqlSurface {

  /** Recursive CTE (Spark 4 `WITH RECURSIVE`): a 12-month spine joined
    * to 1995 monthly order revenue — empty months surface as zero rows
    * instead of vanishing, the classic reporting-spine pattern. The
    * recursion is bounded (12 rows) and evaluated once; revenue uses
    * the exact-decimal sum discipline. */
  def q51RecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_rc")
    spark.sql(
      s"""WITH RECURSIVE m(mo) AS (
         |  SELECT 1 UNION ALL SELECT mo + 1 FROM m WHERE mo < 12)
         |SELECT mo AS month,
         | coalesce(n_orders, 0) AS n_orders,
         | coalesce(revenue, 0.0) AS revenue
         |FROM m LEFT JOIN (
         |  SELECT month(o_orderdate) AS mo2, count(*) AS n_orders,
         |   ${sqlDsum("o_totalprice")} AS revenue
         |  FROM orders_rc WHERE year(o_orderdate) = 1995
         |  GROUP BY month(o_orderdate)) ON mo = mo2
         |ORDER BY month""".stripMargin)
  }

  val q51Sql: String =
    s"""WITH RECURSIVE m(mo) AS (
       |  SELECT 1 UNION ALL SELECT mo + 1 FROM m WHERE mo < 12)
       |SELECT mo AS month,
       | coalesce(n_orders, 0) AS n_orders,
       | coalesce(revenue, 0.0) AS revenue
       |FROM m LEFT JOIN (
       |  SELECT month(o_orderdate) AS mo2, count(*) AS n_orders,
       |   ${sqlDsum("o_totalprice")} AS revenue
       |  FROM orders WHERE year(o_orderdate) = 1995
       |  GROUP BY month(o_orderdate)) ON mo = mo2
       |ORDER BY month""".stripMargin

  /** VARIANT (Spark 4 semi-structured type): `events.props` parsed
    * once into a VARIANT value, a typed path extracted with
    * `variant_get`, then aggregated — the open-schema ingest pattern
    * (parse once, bind types at query time) that `get_json_object`
    * string-hacking does not give. Oracle reads the same path with
    * DuckDB's JSON functions. */
  def q52VariantJson(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("v", expr("parse_json(props)"))
      .withColumn("k_val", expr("variant_get(v, '$.k', 'bigint')"))
      .groupBy((col("k_val") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy(col("k_bucket"))

  val q52Sql: String =
    s"""SELECT cast(json_extract_string(props, '$$.k') as bigint) % 10 AS k_bucket,
       | count(*) AS n_events, ${sqlDsum("value")} AS total_value
       |FROM events
       |GROUP BY 1 ORDER BY k_bucket""".stripMargin

  /** SQL-defined scalar function (Spark 4 `CREATE FUNCTION ... RETURN
    * expr`): the discounted-taxed price as a named, reusable SQL UDF.
    * Unlike a Scala UDF this is INLINED by the analyzer — the plan is
    * identical to writing the expression by hand (codegen, pushdown,
    * all preserved), which is why it is the right extension point for
    * pure-SQL logic at 100 TB. */
  def q53SqlUdf(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("lineitem_su")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(
        |  price DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS DOUBLE
        |RETURN price * (1 - disc) * (1 + tax)""".stripMargin)
    spark.sql(
      s"""SELECT l_returnflag, count(*) AS n,
         | ${sqlDsum("graft_disc_price(l_extendedprice, l_discount, l_tax)")} AS disc_revenue
         |FROM lineitem_su
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  val q53Sql: String =
    s"""SELECT l_returnflag, count(*) AS n,
       | ${sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS disc_revenue
       |FROM lineitem
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** SQL pipe syntax (Spark 4 `|>` operators): the linear
    * filter→aggregate→sort dataflow written the way the engine
    * executes it. Compiles to the identical plan as the nested form —
    * declared to prove the surface, oracle-checked in plain SQL. */
  def q54PipeSyntax(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("lineitem_ps")
    spark.sql(
      s"""FROM lineitem_ps
         ||> WHERE l_shipdate >= timestamp '1995-01-01 00:00:00'
         ||> AGGREGATE count(*) AS n, ${sqlDsum("l_extendedprice")} AS revenue
         |   GROUP BY l_returnflag
         ||> ORDER BY l_returnflag""".stripMargin)
  }

  val q54Sql: String =
    s"""SELECT l_returnflag, count(*) AS n, ${sqlDsum("l_extendedprice")} AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= timestamp '1995-01-01 00:00:00'
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Correlated EXISTS and NOT EXISTS in one predicate: customers with
    * at least one open order but no order above 300k. Catalyst
    * decorrelates both into semi/anti joins — the plan never builds a
    * per-customer subquery loop. */
  def q55ExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("customer_ex")
    t(spark, dir, "orders").createOrReplaceTempView("orders_ex")
    spark.sql(
      """SELECT c_custkey, c_acctbal
        |FROM customer_ex c
        |WHERE EXISTS (SELECT 1 FROM orders_ex o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |  AND NOT EXISTS (SELECT 1 FROM orders_ex o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin)
  }

  val q55Sql: String =
    """SELECT c_custkey, c_acctbal
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  /** One-pass column profiler — the data-quality scan a 100 TB ingest
    * runs before anything else: per column, null count, exact distinct
    * count, min/max (rendered as strings so heterogeneous column types
    * share one report schema). ALL columns profile in a SINGLE
    * aggregation over ONE scan (Catalyst plans the multi-distinct
    * aggregate via Expand — one shuffle, no per-column re-scan), then
    * the one summary row explodes into the per-column report. */
  def profileColumns(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__cnt"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    } :+ count(lit(1)).as("__n")
    t(spark, dir, "lineitem")
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__cnt")).as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"))): _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))
  }

  val profileColumnsSql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         | count(*) - count($c) AS n_null,
         | count(DISTINCT $c) AS n_distinct,
         | cast(min($c) as varchar) AS min_val,
         | cast(max($c) as varchar) AS max_val
         |FROM lineitem""".stripMargin
    Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
      .map(one).mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY \"column\"")
  }

  /** Runtime bloom-filter join pruning — Spark's runtime filter
    * builds a bloom filter from the SELECTIVE (filtered-dimension)
    * side of a shuffle join and pushes `might_contain` into the fact
    * scan, so fact rows that cannot join are dropped BEFORE the
    * shuffle — at 100 TB this is the difference between shuffling the
    * whole fact table and shuffling the matching slice. The
    * injection thresholds assume warehouse-sized inputs (application
    * side ≥ 10 GB), so this entry scopes them down (and disables
    * broadcast, which would otherwise win at bench scale) and
    * materializes inside the scope; the plan spec asserts
    * `might_contain` reached the scan. Results are identical with or
    * without the filter — the oracle checks values, the spec checks
    * the plan. */
  def q56BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val urgent = t(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      val joined = t(spark, dir, "lineitem")
        .join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("l_returnflag"))
      // materialize inside the scoped confs so the executed plan IS
      // the bloom-pruned one (lazy execution would see restored confs)
      joined.localCheckpoint(true)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  val q56Sql: String =
    s"""SELECT l_returnflag, count(*) AS n, ${sqlDsum("l_extendedprice")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderpriority = '1-URGENT'
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val all: Seq[GQuery] = Seq(
    GQuery("q51_recursive_cte", q51RecursiveCte, Some(q51Sql)),
    GQuery("q52_variant_json", q52VariantJson, Some(q52Sql)),
    GQuery("q53_sql_udf", q53SqlUdf, Some(q53Sql)),
    GQuery("q54_pipe_syntax", q54PipeSyntax, Some(q54Sql)),
    GQuery("q55_exists_subquery", q55ExistsSubquery, Some(q55Sql)),
    GQuery("q56_bloom_runtime_filter", q56BloomJoin, Some(q56Sql)),
    GQuery("meta_profile_columns", profileColumns, Some(profileColumnsSql)),
  )
}
