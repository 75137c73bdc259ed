package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed global ordering primitives — row_number / ntile / prefix
  * aggregates over a TOTAL order without ever funnelling the table
  * through a single-partition WindowExec (`Window.orderBy(...)` with no
  * partitionBy logs `WindowExec: No Partition Defined ... Moving all
  * data to a single partition` and serializes the whole input through
  * one task — correct at sf0.1, fatal at 100 TB).
  *
  * Scheme (the classic range-partitioned two-pass rank):
  *   1. `repartitionByRange(parts, sortCols).sortWithinPartitions` —
  *      RangePartitioner keeps equal keys in one partition, so the
  *      concatenation of partitions IS the global order.
  *   2. `.rdd` pins ONE physical execution: the partitioner (and its
  *      sampled boundaries) is constructed exactly once, and every job
  *      over the RDD reuses the same shuffle files. This is the load-
  *      bearing choice: expressing the two passes as two DataFrame
  *      branches re-plans the range exchange per branch with
  *      independently SAMPLED boundaries (observed: 4 separate
  *      `Exchange rangepartitioning` nodes), so per-partition counts
  *      can disagree with the partitioning that assigned the rows —
  *      off-by-a-few ranks that vary run to run.
  *   3. Pass 1: per-partition counts (or partial aggregates) — P longs
  *      collected to the driver, prefix-combined there. Constant-sized
  *      whatever the table size.
  *   4. Pass 2: mapPartitionsWithIndex assigns rank/bucket/prefix from
  *      the broadcast carry-ins; the map side is NOT re-executed (the
  *      DAG scheduler reuses the stage-1 shuffle output).
  *
  * Ranks are IDENTICAL to `row_number() OVER (ORDER BY sortCols)`
  * whenever sortCols is a total order (every entry routed through here
  * uses tie-broken deterministic keys), so the DuckDB oracles are
  * unchanged.
  */
object DistRank {

  /** One pinned execution of the range-sorted input. */
  private def sortedRdd(df: DataFrame, sortCols: Seq[Column],
      parts: Int): (RDD[Row], StructType) = {
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    (sorted.rdd, sorted.schema)
  }

  /** Per-partition row counts — pass 1 (P longs to the driver). */
  private def partCounts(rdd: RDD[Row]): Array[Long] = {
    val counted = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect()
    val out = Array.fill(rdd.getNumPartitions)(0L)
    counted.foreach { case (i, n) => out(i) = n }
    out
  }

  /** Appends `name` = global 1-based row_number ordered by sortCols. */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column], name: String,
      parts: Int = 32): DataFrame =
    withRankBased(df, sortCols, name, parts)((rk, _) => rk)

  /** Appends `name` = ntile(n) over (order by sortCols), long-typed.
    * Standard SQL ntile (Spark and DuckDB agree): with N rows, q = N/n,
    * r = N%n, the first r buckets hold q+1 rows, the rest q — all
    * integer arithmetic, exact at any N. */
  def withNtile(df: DataFrame, sortCols: Seq[Column], n: Int, name: String,
      parts: Int = 32): DataFrame =
    withRankBased(df, sortCols, name, parts) { (rk, total) =>
      val q = total / n
      val r = total % n
      if (rk <= r * (q + 1)) (rk - 1) / (q + 1) + 1
      else r + (rk - r * (q + 1) - 1) / math.max(q, 1L) + 1
    }

  private def withRankBased(df: DataFrame, sortCols: Seq[Column],
      name: String, parts: Int)(value: (Long, Long) => Long): DataFrame = {
    val (rdd, schema) = sortedRdd(df, sortCols, parts)
    val counts = partCounts(rdd)
    val offs = counts.scanLeft(0L)(_ + _) // offs(i) = rows before part i
    val total = offs.last
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var rk = offs(i)
      it.map { r =>
        rk += 1
        Row.fromSeq(r.toSeq :+ value(rk, total))
      }
    }
    df.sparkSession.createDataFrame(out,
      StructType(schema.fields :+ StructField(name, LongType, nullable = false)))
  }

  /** Appends `name` = prefix aggregate (`op` ∈ sum|max|min) of `value`
    * over the global sortCols order — `inclusive=false` gives the
    * `ROWS UNBOUNDED PRECEDING AND -1` frame (null for the global
    * first rows, matching the window semantics; nulls in `value` are
    * skipped like the window aggregates skip them). Pass 1 reduces
    * each partition to ONE partial aggregate (P values to the driver,
    * prefix-combined there); pass 2 runs the partition-local running
    * aggregate seeded with its carry-in. */
  def withPrefix(df: DataFrame, sortCols: Seq[Column], value: Column,
      op: String, name: String, inclusive: Boolean = true,
      parts: Int = 32): DataFrame = {
    val V = "__graft_val"
    // integral inputs accumulate in long (Spark's sum(int) contract);
    // decimals keep their scale with Spark's +10 precision headroom
    val prepared = df.withColumn(V, value)
    val vType0 = prepared.schema(V).dataType
    val (vCast, outType): (Column, DataType) = (op, vType0) match {
      case (_, ByteType | ShortType | IntegerType) =>
        (col(V).cast(LongType), LongType)
      case ("sum", d: DecimalType) =>
        (col(V), DecimalType(math.min(38, d.precision + 10), d.scale))
      case _ => (col(V), vType0)
    }
    val (rdd, schema) = sortedRdd(prepared.withColumn(V, vCast),
      sortCols, parts)
    val vIdx = schema.fieldIndex(V)
    val comb: (Any, Any) => Any = op match {
      case "sum" => {
        case (a: Long, b: Long) => a + b
        case (a: Double, b: Double) => a + b
        case (a: java.math.BigDecimal, b: java.math.BigDecimal) => a.add(b)
        case (a, b) => throw new IllegalArgumentException(s"sum($a,$b)")
      }
      case "max" | "min" => {
        val keepFirst: (Int => Boolean) =
          if (op == "max") (_ >= 0) else (_ <= 0)
        (a: Any, b: Any) => (a, b) match {
          case (x: Long, y: Long) => if (keepFirst(x.compareTo(y))) x else y
          case (x: Double, y: Double) =>
            if (keepFirst(x.compareTo(y))) x else y
          case (x: java.math.BigDecimal, y: java.math.BigDecimal) =>
            if (keepFirst(x.compareTo(y))) x else y
          case (x: String, y: String) =>
            if (keepFirst(x.compareTo(y))) x else y
          case (x, y) => throw new IllegalArgumentException(s"$op($x,$y)")
        }
      }
      case other => throw new IllegalArgumentException(other)
    }
    def merge(acc: Any, v: Any): Any =
      if (v == null) acc else if (acc == null) v else comb(acc, v)
    // pass 1: one partial aggregate per partition
    val partials = rdd
      .mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.foldLeft(null: Any)((acc, r) => merge(acc, r.get(vIdx)))))
      }.collect()
    val byPart = Array.fill[Any](rdd.getNumPartitions)(null)
    partials.foreach { case (i, v) => byPart(i) = v }
    val carries = byPart.scanLeft(null: Any)(merge).dropRight(1)
    // pass 2: seeded running aggregate (map stage reused via shuffle)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc: Any = carries(i)
      it.map { r =>
        val withRow = merge(acc, r.get(vIdx))
        val v = if (inclusive) withRow else acc
        acc = withRow
        Row.fromSeq(r.toSeq.patch(vIdx, Nil, 1) :+ v)
      }
    }
    val outFields = schema.fields.patch(vIdx, Nil, 1) :+
      StructField(name, outType, nullable = true)
    df.sparkSession.createDataFrame(out, StructType(outFields))
  }
}
