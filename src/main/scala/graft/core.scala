package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One declared engine operator: a Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL. Column names and
  * row order MUST match between the two (driver hash-compares).
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object util {
  /** Load one of the driver-generated parquet tables under `dir`.
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; with spark.sql.legacy.parquet.nanosAsLong=true it
    * arrives as nano-precision LongType and is converted back to a
    * (micro-precision) timestamp here.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df0 = spark.read.parquet(s"$dir/$name.parquet")
    // driver testdata regenerated as timestamp[us] without the UTC flag:
    // sessions read it as TimestampType via inferTimestampNTZ=false, but a
    // session missing that conf gets NTZ — normalize to session-zone (UTC)
    // TimestampType so watermarks/unix_micros/as-of keep working
    val df = df0.schema.fields.foldLeft(df0) { (acc, f) =>
      if (f.dataType == org.apache.spark.sql.types.TimestampNTZType)
        acc.withColumn(f.name, col(f.name).cast("timestamp"))
      else acc
    }
    if (df.schema.fields.exists(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType))
      df.withColumn("ts", timestamp_micros(expr("ts div 1000"))) // integer div: ns are > 2^53, float div would round
    else df
  }

  /** Order-independent, engine-exact sum of a double column:
    * per-row cast to decimal(22,8) (exact for the testdata's 2-decimal
    * money columns and any product of up to four of them — scale 8
    * avoids round-half midpoints where Spark HALF_UP and DuckDB
    * HALF_EVEN disagree), exact decimal accumulation (no float
    * reassociation across partitions), final cast back to double
    * ROUNDED to 4 decimals: the decimal sum is identical in both
    * engines, but their decimal→double conversions can differ in the
    * last ulp once sums exceed ~2^33 (seen at sf0.1: 1 ulp ≈ 2e-6 on
    * 1e10-scale sums) — the 1e-4 grid is 100× coarser than that
    * divergence and loses nothing on 2-decimal money data.
    * DuckDB twin: round(cast(sum(cast(x as decimal(22,8))) as double), 4).
    */
  def dsum(c: Column): Column =
    round(sum(c.cast(DecimalType(22, 8))).cast(DoubleType), 4)

  /** Deterministic average built from the exact decimal sum (the
    * division inputs are bit-identical in both engines, so the
    * quotient is too). */
  def davg(c: Column): Column = (dsum(c) / count(lit(1))).cast(DoubleType)

  /** SQL fragments mirroring dsum/davg for the DuckDB oracle. */
  def sqlDsum(x: String): String = s"round(cast(sum(cast(($x) as decimal(22,8))) as double), 4)"
  def sqlDavg(x: String): String = s"(${sqlDsum(x)} / count(*))"

  /** Recursively delete a directory tree (no-op on missing paths). */
  def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete()
    ()
  }

  private lazy val cleanupHook: java.util.concurrent.ConcurrentLinkedQueue[String] = {
    val q = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      q.forEach(p => deleteRecursively(new java.io.File(p)))))
    q
  }

  /** Register an EXISTING path for recursive deletion at JVM exit —
    * for artifacts whose location the caller does not choose (e.g. a
    * saveAsTable warehouse dir: the in-memory catalog forgets the
    * table across JVMs, but its directory would persist). */
  def registerShutdownDelete(path: String): Unit = {
    cleanupHook.add(path)
    ()
  }

  /** A unique temp-dir path under java.io.tmpdir, registered for
    * recursive deletion at JVM exit — entries that write scratch
    * layouts (round-trips, skew facts, bucketed tables) must not
    * accumulate artifacts across bench/spec runs. Deletion is deferred
    * to shutdown because most entries return a LAZY DataFrame still
    * reading from the path. */
  def scratchDir(prefix: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_${prefix}_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    cleanupHook.add(p)
    p
  }
}
