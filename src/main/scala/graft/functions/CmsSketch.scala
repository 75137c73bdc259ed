package graft.functions

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) —
  * the third native sketch family beside Misra–Gries (top-k only) and
  * KMV (distinct counts): POINT-FREQUENCY estimates for ANY queried
  * item from fixed memory. depth×width counters; item x increments
  * cell (i, h_i(x)) in every row i; the estimate is the MIN over rows.
  *
  * Guarantees: estimates NEVER underestimate (every true occurrence
  * incremented every row — a deterministic property the spec asserts
  * item-by-item), and overestimate by ≤ εN with probability 1−δ for
  * width = e/ε, depth = ln(1/δ). Merging is elementwise counter
  * addition — exact and lossless, so a union of per-partition sketches
  * is BIT-IDENTICAL to one sketch of the union (unlike MG's lossy
  * shrink), which is what makes per-source sketch TABLES rollup-able.
  *
  * Scale design: the sketch is depth×width×8 bytes (16 KiB at 4×512)
  * however many rows feed it; partial-aggregable, so per partition
  * only the fixed array crosses the shuffle. Row hashes are splitmix64
  * with fixed per-row seeds — deterministic across runs, layouts, and
  * partition counts. The estimate expression is eval-based
  * (CodegenFallback): it runs over sketch-table rows, never in the
  * fact-scan hot path.
  */
object Cms {
  val Depth = 4
  val Width = 512

  /** Cell index of item-hash `h` in row `i` (fixed odd seeds). */
  def cell(h: Long, i: Int): Int = {
    val mixed = Kmv.mix(h + 0x9E3779B97F4A7C15L * (i + 1))
    ((mixed % Width).toInt + Width) % Width
  }

  def itemHash(v: Any): Long = Kmv.hashAny(v)

  def update(counts: Array[Long], v: Any): Unit = {
    val h = itemHash(v)
    var i = 0
    while (i < Depth) { counts(i * Width + cell(h, i)) += 1L; i += 1 }
  }

  def estimate(counts: Array[Long], v: Any): Long = {
    val h = itemHash(v)
    var m = Long.MaxValue
    var i = 0
    while (i < Depth) {
      val c = counts(i * Width + cell(h, i))
      if (c < m) m = c
      i += 1
    }
    m
  }

  /** Aggregation state: the counter matrix plus the input-kind tag
    * (Kmv.Kind*): integral and string items hash differently, so a
    * probe against the wrong-kind sketch must error, not return a
    * collisions-only near-zero count. */
  final class Buf(val counts: Array[Long], var kind: Byte)

  def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(9 + 8 * buf.counts.length)
    bb.putInt(Depth); bb.putInt(Width); bb.put(buf.kind)
    buf.counts.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt; val w = bb.getInt; val kind = bb.get()
    require(d == Depth && w == Width,
      s"cms sketch dims ($d x $w) do not match this build (${Depth} x ${Width})")
    val counts = new Array[Long](d * w)
    var i = 0
    while (i < counts.length) { counts(i) = bb.getLong; i += 1 }
    new Buf(counts, kind)
  }
}

/** Aggregate raw values into a count-min sketch (binary). */
case class CmsSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Cms.Buf] with UnaryLike[Expression] {

  override def prettyName: String = "cms_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch requires an integral or string child, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Cms.Buf =
    new Cms.Buf(new Array[Long](Cms.Depth * Cms.Width), Kmv.kindOf(child.dataType))

  override def update(buf: Cms.Buf, input: InternalRow): Cms.Buf = {
    val v = child.eval(input)
    if (v != null) Cms.update(buf.counts, v)
    buf
  }

  override def merge(buf: Cms.Buf, other: Cms.Buf): Cms.Buf = {
    buf.kind = Kmv.mergeKinds(buf.kind, other.kind, "cms merge")
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) += other.counts(i); i += 1 }
    buf
  }

  override def eval(buf: Cms.Buf): Any = Cms.serialize(buf)
  override def serialize(buf: Cms.Buf): Array[Byte] = Cms.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Cms.Buf = Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

/** Union already-materialized CMS sketches (binary → binary): counter
  * addition — exact, lossless, commutative. */
case class CmsUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Cms.Buf] with UnaryLike[Expression] {

  override def prettyName: String = "cms_union"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_union requires a binary (serialized sketch) child, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Cms.Buf =
    new Cms.Buf(new Array[Long](Cms.Depth * Cms.Width), Kmv.KindUnknown)

  override def update(buf: Cms.Buf, input: InternalRow): Cms.Buf = {
    val v = child.eval(input)
    if (v != null) merge(buf, Cms.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Cms.Buf, other: Cms.Buf): Cms.Buf = {
    buf.kind = Kmv.mergeKinds(buf.kind, other.kind, "cms_union")
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) += other.counts(i); i += 1 }
    buf
  }

  override def eval(buf: Cms.Buf): Any = Cms.serialize(buf)
  override def serialize(buf: Cms.Buf): Array[Byte] = Cms.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Cms.Buf = Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsUnionAgg =
    copy(child = newChild)
}

/** Point-frequency estimate of `item` in a serialized sketch. The
  * probe item's STATIC kind (integral vs string) is validated against
  * the kind tag serialized in the sketch header — a wrong-kind probe
  * errors instead of silently returning a collisions-only count. */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "cms_estimate"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ByteType | ShortType | IntegerType | LongType | StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires (binary sketch, integral-or-string item), got ${l.catalogString}, ${r.catalogString}")
    }
  override protected def nullSafeEval(sk: Any, item: Any): Any = {
    val buf = Cms.deserialize(sk.asInstanceOf[Array[Byte]])
    Kmv.mergeKinds(buf.kind, Kmv.kindOf(right.dataType), "cms_estimate probe")
    Cms.estimate(buf.counts, item)
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsSketch {
  /** Column API. */
  def cmsSketch(c: Column): Column =
    graftbridge.column(CmsSketchAgg(graftbridge.expression(c)).toAggregateExpression())
  def cmsUnion(c: Column): Column =
    graftbridge.column(CmsUnionAgg(graftbridge.expression(c)).toAggregateExpression())
  def cmsEstimate(sk: Column, item: Column): Column =
    graftbridge.column(CmsEstimate(graftbridge.expression(sk), graftbridge.expression(item)))
}
