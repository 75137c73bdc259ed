package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters as a native `TypedImperativeAggregate` —
  * the mergeable-sketch extension point (beside the codegen
  * `CosineSim` expression and the `Aggregator` UDAF): a bounded map of
  * at most `capacity` counters per partial buffer, merged with the
  * mergeable-summaries rule (sum counters, then subtract the
  * (capacity+1)-th largest and drop non-positives).
  *
  * Guarantees (classic Misra–Gries): every term with true frequency
  * > n/(capacity+1) is present in the summary, and each reported count
  * undercounts the truth by at most n/(capacity+1). With capacity ≥
  * distinct terms the counts are EXACT — which is what makes the
  * declared query oracle-checkable on the fixture vocabulary while the
  * 100 TB story is the same one-pass, fixed-memory, partial-aggregable
  * plan with capacity ≪ distinct terms (a full groupBy of a web-scale
  * vocabulary shuffles billions of groups; this shuffles `capacity`
  * counters per partition).
  */
case class MisraGriesTopK(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, "capacity must be >= 1")

  override def prettyName: String = "misra_gries_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Shrink to `capacity` entries: subtract the (capacity+1)-th
    * largest count from everything, drop non-positives — the
    * mergeable-summaries reduction (correct for both the single-insert
    * overflow and arbitrary merges). */
  private def shrink(buf: mutable.HashMap[String, Long]): Unit =
    if (buf.size > capacity) {
      val vals = buf.values.toArray
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - capacity - 1)
      buf.filterInPlace((_, v) => v - sub > 0)
      buf.mapValuesInPlace((_, v) => v - sub)
    }

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.toString
      buf.update(t, buf.getOrElse(t, 0L) + 1L)
      shrink(buf)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) => buf.update(t, buf.getOrElse(t, 0L) + c) }
    shrink(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(buf.toArray.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => InternalRow(UTF8String.fromString(t), c) })

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed raw UTF-8, not writeUTF: writeUTF throws on
    // terms whose encoding exceeds 64 KiB, and a web-scale corpus
    // WILL contain such a token eventually
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
}

object MisraGriesTopK {
  /** Column API: `misraGries($"term", 64)` → array<struct<term,count>>
    * sorted by (count desc, term). */
  def misraGries(c: Column, capacity: Int): Column =
    graftbridge.column(
      MisraGriesTopK(graftbridge.expression(c), capacity).toAggregateExpression())
}
