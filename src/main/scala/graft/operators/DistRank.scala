package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordering primitives — row_number / ntile / prefix
  * aggregates over a TOTAL order without ever funnelling the table
  * through a single-partition WindowExec (`Window.orderBy(...)` with no
  * partitionBy logs `WindowExec: No Partition Defined ... Moving all
  * data to a single partition` and serializes the whole input through
  * one task — correct at sf0.1, fatal at 100 TB).
  *
  * Scheme (the classic range-partitioned rank):
  *   1. `repartitionByRange(parts, sortCols)` — Spark's RangePartitioner
  *      samples boundaries and sends equal keys to the same partition,
  *      so the concatenation of partitions IS the global order.
  *   2. `sortWithinPartitions(sortCols)` then
  *      `monotonically_increasing_id()` — Spark documents the id as
  *      (partitionId << 33) + consecutive record counter, and the
  *      nondeterministic projection cannot be reordered below the sort,
  *      so ids follow the sorted order within every partition.
  *   3. A P-row aggregate (min(id), count) per partition, then a
  *      triangular self-join over the P rows computes each partition's
  *      carry-in offset (rows in all preceding partitions). P = `parts`,
  *      so this stage is CONSTANT-sized regardless of table size.
  *   4. Broadcast-join the offsets back: rank = id - min(id) + 1 + off.
  *
  * One full-data shuffle total (the range exchange is shared between the
  * stats branch and the output branch and deduped by ReusedExchange);
  * the offsets never leave constant size. Because RangePartitioner keeps
  * equal keys together, ranks are IDENTICAL to `row_number() OVER
  * (ORDER BY sortCols)` whenever sortCols is a total order (every entry
  * routed through here uses tie-broken deterministic keys), so the
  * DuckDB oracles are unchanged.
  */
object DistRank {
  private val PID = "__graft_pid"
  private val MID = "__graft_mid"
  private val LOCAL = "__graft_local"
  private val OFF = "__graft_off"
  private val MN = "__graft_mn"
  private val CNT = "__graft_cnt"
  private val TOT = "__graft_total"

  /** df range-sorted with partition id + monotonic id columns. */
  private def ranged(df: DataFrame, sortCols: Seq[Column], parts: Int): DataFrame =
    df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn(MID, monotonically_increasing_id())
      .withColumn(PID, spark_partition_id())

  /** Per-partition (min id, count) + exclusive prefix-sum offset + total
    * row count — P rows, computed with a triangular self-join (P² pairs
    * of P = `parts` rows, constant-sized) instead of a global window so
    * the utility itself never emits the single-partition warning. */
  private def offsets(r: DataFrame): DataFrame = {
    val stats = r.groupBy(col(PID)).agg(
      min(col(MID)).as(MN), count(lit(1)).as(CNT))
    val offs = stats.as("a")
      .join(stats.as("b"), col(s"b.$PID") < col(s"a.$PID"), "left_outer")
      .groupBy(col(s"a.$PID").as(PID), col(s"a.$MN").as(MN),
        col(s"a.$CNT").as(CNT))
      .agg(coalesce(sum(col(s"b.$CNT")), lit(0L)).as(OFF))
    val total = stats.agg(sum(col(CNT)).as(TOT))
    offs.crossJoin(broadcast(total))
  }

  /** Appends `name` = global 1-based row_number ordered by sortCols. */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column], name: String,
      parts: Int = 32): DataFrame = {
    val r = ranged(df, sortCols, parts)
    r.join(broadcast(offsets(r)), Seq(PID))
      .withColumn(name, col(MID) - col(MN) + lit(1L) + col(OFF))
      .drop(PID, MID, MN, CNT, OFF, TOT)
  }

  /** Appends `name` = ntile(n) over (order by sortCols), long-typed.
    * Standard SQL ntile (Spark and DuckDB agree): with N rows, q = N/n,
    * r = N%n, the first r buckets hold q+1 rows, the rest q. */
  def withNtile(df: DataFrame, sortCols: Seq[Column], n: Int, name: String,
      parts: Int = 32): DataFrame = {
    val r = ranged(df, sortCols, parts)
    val RN = "__graft_rn"; val Q = "__graft_q"; val RM = "__graft_rm"
    // all-integer bucket math (`div`, not `/` — Divide on longs is a
    // DOUBLE division whose floor can be off-by-one once N outgrows the
    // 53-bit mantissa headroom; `div` stays exact at any N)
    r.join(broadcast(offsets(r)), Seq(PID))
      .withColumn(RN, col(MID) - col(MN) + lit(1L) + col(OFF))
      .withColumn(Q, expr(s"$TOT div ${n}L"))
      .withColumn(RM, col(TOT) % lit(n.toLong))
      .withColumn(name, expr(
        s"""CASE WHEN $RN <= $RM * ($Q + 1L)
           |  THEN ($RN - 1L) div ($Q + 1L) + 1L
           |  ELSE $RM + ($RN - $RM * ($Q + 1L) - 1L) div greatest($Q, 1L) + 1L
           |END""".stripMargin).cast("long"))
      .drop(PID, MID, MN, CNT, OFF, TOT, RN, Q, RM)
  }

  /** Appends `name` = prefix aggregate (`op` ∈ sum|max|min) of `value`
    * over the global sortCols order — `inclusive=false` gives the
    * `ROWS UNBOUNDED PRECEDING AND -1` frame (null for the global first
    * rows, matching the window semantics). Two-level: a parallel
    * per-partition window (partitioned by pid — P-way parallel, never
    * single-partition) plus a constant-sized triangular carry-in of the
    * per-partition totals. Costs one extra full shuffle (hash by pid)
    * versus withRowNumber; still never funnels to one task. */
  def withPrefix(df: DataFrame, sortCols: Seq[Column], value: Column,
      op: String, name: String, inclusive: Boolean = true,
      parts: Int = 32): DataFrame = {
    val V = "__graft_val"
    val r = ranged(df.withColumn(V, value), sortCols, parts).drop(MID)
    val w = Window.partitionBy(col(PID)).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, if (inclusive) 0 else -1)
    def aggOf(c: Column): Column = op match {
      case "sum" => sum(c)
      case "max" => max(c)
      case "min" => min(c)
      case other => throw new IllegalArgumentException(other)
    }
    val local = r.withColumn(LOCAL, aggOf(col(V)).over(w))
    val totals = r.groupBy(col(PID)).agg(aggOf(col(V)).as(CNT))
    val carry = totals.as("a")
      .join(totals.as("b"), col(s"b.$PID") < col(s"a.$PID"), "left_outer")
      .groupBy(col(s"a.$PID").as(PID))
      .agg(aggOf(col(s"b.$CNT")).as(OFF))
    val combined = op match {
      case "sum" => when(col(OFF).isNull && col(LOCAL).isNull, lit(null))
        .otherwise(coalesce(col(OFF), lit(0)) + coalesce(col(LOCAL), lit(0)))
      case "max" => greatest(col(OFF), col(LOCAL))
      case "min" => least(col(OFF), col(LOCAL))
    }
    local.join(broadcast(carry), Seq(PID))
      .withColumn(name, combined)
      .drop(PID, V, LOCAL, OFF)
  }
}
