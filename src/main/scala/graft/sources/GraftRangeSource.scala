package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 connector — the extension point a user
  * would implement to plug a Kafka-like transport (or any external
  * system) into this engine. The reference's only source is
  * `builder.stream(topic)` (KStreamsToKTable.java:75); no Kafka
  * connector jar exists in this environment (SURVEY.md §0), so this
  * connector demonstrates the full V2 surface the real one would use:
  * `TableProvider` → `Table(SupportsRead)` → `ScanBuilder` with
  * COLUMN PRUNING (`SupportsPushDownRequiredColumns`) and FILTER
  * PUSHDOWN (`SupportsPushDownFilters`) → `Batch` planning
  * `InputPartition`s → per-partition `PartitionReader`s.
  *
  * The table itself is a deterministic generated range (options
  * `rows`, `slices`): every column is a pure function of `id`, so a
  * DuckDB oracle can replay it exactly. The scale behaviors are real:
  * the source plans `slices` independent partitions (executor
  * parallelism, no driver materialization), pushed id-range filters
  * prune whole partitions BEFORE they are scheduled (the V2 analogue
  * of partition pruning — at 100 TB this is offset/time-range pruning
  * on a Kafka topic), and column pruning means a 2-column projection
  * never builds the other columns' values. The plan spec asserts both
  * via the scan's `description()`.
  */
class GraftRangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftRangeSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftRangeTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt,
      properties.getOrDefault("batchRows", "1000").toLong,
      properties.getOrDefault("compactedKeys", "0").toInt)
}

object GraftRangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("label", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  // every column is a pure function of id (replayable in the oracle)
  def bucketOf(id: Long): Long = id % 16
  def labelOf(id: Long): String = "lbl" + (id % 5)
  // (id % 1000)·K % 1000 ≡ id·K % 1000 exactly (mod-arithmetic identity),
  // and the reduced product is ≤ 999·2654435761 < 2^63 at ANY offset —
  // the naive form wraps silently once a topic passes ~3.47e9 records
  def valueOf(id: Long): Double = (((id % 1000L) * 2654435761L) % 1000L).toDouble / 10.0

  /** Compacted-log mode (`compactedKeys=K`, K>0): the served offsets
    * are what a log-compacted Kafka topic retains — per record key,
    * only the LATEST offset survives; earlier offsets for the key are
    * holes in the offset space (a compacted topic's offsets are NOT
    * contiguous — the consumer must tolerate gaps, which is exactly
    * what this mode forces downstream code to handle). The record key
    * is a scattered pure function of the offset so the survivor set is
    * non-trivial — NOTE the double mod: `(id·A) mod K` alone is cyclic
    * with period K (it degenerates to "the last K offsets survive",
    * i.e. no compaction holes at all; the spec asserts holes exist),
    * so the product is first folded through a large prime. DuckDB
    * replays it as `max(id) GROUP BY key` over `range(rows)`. Models
    * the reference broker's `cleanup.policy=compact`
    * (docker-compose.yaml:31-32). */
  // (id mod p)·K mod p ≡ id·K mod p (mod-multiplication identity), and
  // the reduced product is ≤ 1000002·2654435761 ≈ 2.7e15 < 2^63 at ANY
  // offset — the naive id·K wraps signed int64 once a topic passes
  // ~3.47e9 records (same hazard valueOf was hardened against)
  def keyOf(id: Long, k: Int): Long = (((id % 1000003L) * 2654435761L) % 1000003L) % k

  /** Offsets surviving compaction of the [0, rows) log over K keys —
    * max offset per key, ascending. Computed by a BACKWARD
    * coupon-collector scan: walking down from rows-1, the first
    * occurrence of each key IS its max offset, and with a ~uniform key
    * function all K keys are seen in O(K·lnK) expected steps — the
    * survivor set is answer-sized (≤K) and its computation is
    * scale-independent of the log length (a real broker maintains this
    * index during cleaning; a 100 TB log never gets scanned here). */
  def survivors(rows: Long, k: Int): Array[Long] = {
    val seen = new java.util.HashSet[Long]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var id = rows - 1
    while (id >= 0 && seen.size < k) {
      if (seen.add(keyOf(id, k))) out += id
      id -= 1
    }
    out.sortInPlace().toArray
  }
}

class GraftRangeTable(rows: Long, slices: Int, batchRows: Long, compacted: Int = 0)
  extends Table with SupportsRead {
  override def name(): String =
    if (compacted > 0) s"graft_range($rows, compacted=$compacted)"
    else s"graft_range($rows)"
  override def schema(): StructType = GraftRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRangeScanBuilder(rows, slices, batchRows, compacted)
}

class GraftRangeScanBuilder(rows: Long, slices: Int, batchRows: Long = 1000L,
    compacted: Int = 0)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var requiredSchema: StructType = GraftRangeSource.schema
  private var pushed: Array[Filter] = Array.empty
  // id bounds accumulated from pushed filters: [lo, hi)
  private var lo: Long = 0L
  private var hi: Long = Long.MaxValue

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("id", v) => asLong(v).isDefined
      case GreaterThanOrEqual("id", v) => asLong(v).isDefined
      case LessThan("id", v) => asLong(v).isDefined
      case LessThanOrEqual("id", v) => asLong(v).isDefined
      case EqualTo("id", v) => asLong(v).isDefined
      case _ => false
    }
    // saturating +1: Long.MaxValue literals must not wrap the bound —
    // accepted filters leave no residual, so a wrapped bound would
    // silently return the wrong rows
    def succ(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    accepted.foreach {
      case GreaterThan("id", v) => lo = math.max(lo, succ(asLong(v).get))
      case GreaterThanOrEqual("id", v) => lo = math.max(lo, asLong(v).get)
      case LessThan("id", v) => hi = math.min(hi, asLong(v).get)
      case LessThanOrEqual("id", v) => hi = math.min(hi, succ(asLong(v).get))
      case EqualTo("id", v) =>
        lo = math.max(lo, asLong(v).get); hi = math.min(hi, succ(asLong(v).get))
      case _ =>
    }
    pushed = accepted
    // accepted bounds are fully enforced by partition pruning + the
    // reader's clamped range, so only the rejected ones remain residual
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  override def build(): Scan =
    new GraftRangeScan(rows, slices, batchRows, requiredSchema, lo,
      math.min(hi, rows), pushed.length, compacted)
}

class GraftRangeScan(
    rows: Long, slices: Int, batchRows: Long, required: StructType,
    lo: Long, hi: Long, nPushed: Int, compacted: Int = 0) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Streaming face of the same table — the Kafka-transport analogue:
    * the driver tracks a monotone offset (`n` rows served), each
    * trigger plans the [committed, available) slice as input
    * partitions, and the checkpoint replays offsets on restart
    * (deserializeOffset). `batchRows` paces availability so a run
    * takes several micro-batches, like a live topic. Pushed id bounds
    * are forwarded and enforced here too: `pushFilters` reported the
    * accepted bounds as fully enforced (no residual), so the streaming
    * face must clamp to them as well or a future engine version that
    * pushes filters into micro-batch scans would silently read rows
    * outside the bounds. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftRangeMicroBatchStream(rows, slices, batchRows, required, lo, hi, compacted)

  // one slice = one InputPartition = one task; slices whose id range
  // is disjoint with the pushed [lo, hi) bound are never planned
  private def allSlices: Seq[(Long, Long)] = {
    val per = math.max(1L, (rows + slices - 1) / slices)
    (0 until slices).map(i => (i * per, math.min(rows, (i + 1) * per)))
      .filter { case (s, e) => s < e }
  }
  private def keptSlices: Seq[(Long, Long)] =
    allSlices.map { case (s, e) => (math.max(s, lo), math.min(e, hi)) }
      .filter { case (s, e) => s < e }

  override def planInputPartitions(): Array[InputPartition] =
    if (compacted > 0) {
      // compacted batch face: survivors within the pushed [lo, hi)
      // bound, chunked across `slices` tasks (the set is ≤compacted
      // offsets — answer-sized, never the raw log)
      val surv = GraftRangeSource.survivors(rows, compacted)
        .filter(id => id >= lo && id < hi)
      if (surv.isEmpty) Array.empty
      else surv.grouped(math.max(1, (surv.length + slices - 1) / slices))
        .map(ids => GraftRangeListPartition(ids): InputPartition).toArray
    } else keptSlices.map { case (s, e) => GraftRangePartition(s, e): InputPartition }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRangeReaderFactory(required)

  override def description(): String =
    s"GraftRangeScan(rows=$rows, slices=${keptSlices.size}/${allSlices.size} kept, " +
      s"pushedFilters=$nPushed, columns=${required.fieldNames.mkString(",")}" +
      (if (compacted > 0) s", compacted=$compacted" else "") + ")"
}

case class GraftRangePartition(start: Long, end: Long) extends InputPartition

/** Explicit-offset partition: a compacted log's surviving offsets are
  * non-contiguous, so a (start, end) range cannot describe them. */
case class GraftRangeListPartition(ids: Array[Long]) extends InputPartition

case class GraftRangeOffset(n: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

class GraftRangeMicroBatchStream(
    rows: Long, slices: Int, batchRows: Long, required: StructType,
    lo: Long = 0L, hi: Long = Long.MaxValue, compacted: Int = 0)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  // driver-side availability pacing: each trigger exposes batchRows
  // more (a live topic's "new messages"); the stream converges when
  // committed == rows
  private var available: Long = 0L

  override def initialOffset(): Offset = GraftRangeOffset(0L)

  /** Admission-controlled form — the one the engine actually calls.
    * `start` is the restart-safe committed offset: the pacer must
    * never fall below it, or a restarted query would see an end
    * offset behind its start, regress, and replay committed rows
    * (caught by the Round4Spec restart test). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    available = math.max(available, start.asInstanceOf[GraftRangeOffset].n)
    available = math.min(rows, available + math.max(1L, batchRows))
    GraftRangeOffset(available)
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  // basic-API form, unused once SupportsAdmissionControl is present
  override def latestOffset(): Offset = GraftRangeOffset(available)

  /** Trigger.AvailableNow contract (bounded reprocessing — the batch-
    * drain twin of the reference's earliest-offset full-history replay,
    * KStreamsToKTable.java:75): snapshot "everything available at query
    * start" as the terminal offset. This log is STATIC — its end is
    * `rows` by construction — so there is nothing to snapshot; the
    * pacer keeps delivering `batchRows` per trigger and the engine
    * self-terminates once `latestOffset` reaches [[rows]]. A live
    * source would freeze its broker end-offsets here. */
  override def prepareForTriggerAvailableNow(): Unit = ()
  /** The true end of the log regardless of pacing — AvailableNow polls
    * this to know when the drain is complete. */
  override def reportLatestOffset(): Offset = GraftRangeOffset(rows)

  override def deserializeOffset(json: String): Offset = {
    available = math.max(available, json.toLong)
    GraftRangeOffset(json.toLong)
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftRangeOffset].n
    val e = end.asInstanceOf[GraftRangeOffset].n
    if (s >= e) Array.empty
    else if (compacted > 0) {
      // compacted streaming face: offsets still advance over the RAW
      // [0, rows) space (a compacted topic's offsets keep their
      // original positions), but a micro-batch delivers only the
      // offsets that survived cleaning — so some triggers carry holes
      // and some are legitimately EMPTY, the gap-tolerance a real
      // compacted-topic consumer must have
      val surv = GraftRangeSource.survivors(rows, compacted)
        .filter(id => id >= s && id < e && id >= lo && id < hi)
      if (surv.isEmpty) Array.empty
      else surv.grouped(math.max(1, (surv.length + slices - 1) / slices))
        .map(ids => GraftRangeListPartition(ids): InputPartition).toArray
    } else {
      val per = math.max(1L, (e - s + slices - 1) / slices)
      (s until e by per)
        .map(b => (b, math.min(e, b + per)))
        // enforce the pushed id bounds the batch face promised (no residual)
        .map { case (ps, pe) => (math.max(ps, lo), math.min(pe, hi)) }
        .filter { case (ps, pe) => ps < pe }
        .map { case (ps, pe) => GraftRangePartition(ps, pe): InputPartition }
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRangeReaderFactory(required)
}

class GraftRangeReaderFactory(required: StructType) extends PartitionReaderFactory {
  // column pruning is real: only the projected generators run
  private def gens: Array[Long => Any] = required.fieldNames.map {
    case "id" => (i: Long) => i
    case "bucket" => (i: Long) => GraftRangeSource.bucketOf(i)
    case "label" => (i: Long) => UTF8String.fromString(GraftRangeSource.labelOf(i))
    case "value" => (i: Long) => GraftRangeSource.valueOf(i)
    case other => sys.error(s"unknown column $other")
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: GraftRangePartition =>
        new PartitionReader[InternalRow] {
          private var id = p.start - 1
          private val g = gens
          override def next(): Boolean = { id += 1; id < p.end }
          override def get(): InternalRow = InternalRow.fromSeq(g.map(_(id)).toSeq)
          override def close(): Unit = ()
        }
      case p: GraftRangeListPartition =>
        new PartitionReader[InternalRow] {
          private var i = -1
          private val g = gens
          override def next(): Boolean = { i += 1; i < p.ids.length }
          override def get(): InternalRow = InternalRow.fromSeq(g.map(_(p.ids(i))).toSeq)
          override def close(): Unit = ()
        }
    }
}
