package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** EXACT distinct counting over bounded integer domains via chunked
  * bitmaps — the roaring-bitmap production pattern (Druid/ClickHouse
  * `groupBitmap`, Doris BITMAP_UNION) in its minimal honest form: a
  * hash map of 64-bit words keyed by `value >> 6`. Where HLL/KMV
  * (`meta_hll_sketches`, KmvSketchAgg) trade exactness for fixed
  * size, the bitmap is EXACT and still mergeable — per-partition
  * (e.g. per-month) bitmaps materialize once and any rollup is a
  * word-wise OR, never a fact rescan; memory is data-adaptive
  * (~n_distinct/8 bytes worst case, far less on clustered key
  * ranges). Because it is exact, the whole family is DuckDB
  * oracle-checkable against COUNT(DISTINCT) — the one sketch-shaped
  * aggregate in the matrix whose driver check is a full hash match,
  * not a rows-only error bound.
  */
object Bitmap {
  /** word index → 64-bit membership word. */
  final class Buffer {
    var words: scala.collection.mutable.LongMap[Long] =
      scala.collection.mutable.LongMap.empty
    def add(v: Long): Unit = {
      require(v >= 0, "bitmap_distinct requires non-negative keys")
      val w = v >> 6
      words(w) = words.getOrElse(w, 0L) | (1L << (v & 63))
      ()
    }
    def mergeFrom(o: Buffer): Unit =
      o.words.foreach { case (w, bits) =>
        words(w) = words.getOrElse(w, 0L) | bits
      }
    def cardinality: Long =
      words.valuesIterator.map(java.lang.Long.bitCount(_).toLong).sum
  }

  def serialize(b: Buffer): Array[Byte] = {
    val entries = b.words.toSeq.sortBy(_._1)
    val bb = java.nio.ByteBuffer.allocate(4 + entries.size * 16)
    bb.putInt(entries.size)
    entries.foreach { case (w, bits) => bb.putLong(w); bb.putLong(bits) }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new Buffer
    (0 until n).foreach { _ =>
      val w = bb.getLong; val bits = bb.getLong
      b.words(w) = bits
    }
    b
  }
}

/** Aggregate raw integer keys into an exact bitmap (binary). */
case class BitmapAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bitmap.Buffer] with UnaryLike[Expression] {

  override def prettyName: String = "bitmap_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_agg requires an integral child, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Bitmap.Buffer = new Bitmap.Buffer

  override def update(buf: Bitmap.Buffer, input: InternalRow): Bitmap.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v match {
      case b: Byte => b.toLong
      case s: Short => s.toLong
      case i: Int => i.toLong
      case l: Long => l
    })
    buf
  }

  override def merge(buf: Bitmap.Buffer, other: Bitmap.Buffer): Bitmap.Buffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: Bitmap.Buffer): Any = Bitmap.serialize(buf)
  override def serialize(buf: Bitmap.Buffer): Array[Byte] = Bitmap.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Bitmap.Buffer = Bitmap.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapAgg =
    copy(child = newChild)
}

/** OR already-materialized bitmaps (binary → binary) — the rollup
  * aggregate over a bitmap table: exact distinct over any partition
  * set without rescanning facts. */
case class BitmapUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bitmap.Buffer] with UnaryLike[Expression] {

  override def prettyName: String = "bitmap_union"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_union requires a binary (serialized bitmap) child, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Bitmap.Buffer = new Bitmap.Buffer

  override def update(buf: Bitmap.Buffer, input: InternalRow): Bitmap.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.mergeFrom(Bitmap.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Bitmap.Buffer, other: Bitmap.Buffer): Bitmap.Buffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: Bitmap.Buffer): Any = Bitmap.serialize(buf)
  override def serialize(buf: Bitmap.Buffer): Array[Byte] = Bitmap.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Bitmap.Buffer = Bitmap.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapUnionAgg =
    copy(child = newChild)
}

/** Cardinality of a serialized bitmap (binary → bigint). */
case class BitmapCount(child: Expression) extends UnaryExpression {
  override def prettyName: String = "bitmap_count"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_count requires a binary child, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    Bitmap.deserialize(input.asInstanceOf[Array[Byte]]).cardinality
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Bitmap.deserialize($c).cardinality()")
  override protected def withNewChildInternal(newChild: Expression): BitmapCount =
    copy(child = newChild)
}
