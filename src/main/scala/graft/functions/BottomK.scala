package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group sample as a native `TypedImperativeAggregate`:
  * keep the `k` rows with the smallest `(priority, id)` per group —
  * the distributed-reservoir pattern with DETERMINISTIC priorities.
  *
  * Scale story (vs the window-function sample in
  * `operators/Sampling.stratifiedSample`): a `row_number() OVER
  * (PARTITION BY g ORDER BY h)` sample shuffles and sorts EVERY row of
  * every stratum before discarding all but k. This aggregate is
  * partial-aggregable: each map task keeps at most k `(priority, id)`
  * pairs per group in a bounded max-heap, partials merge by heap
  * union-then-truncate (associative + commutative), and only
  * `k·groups` pairs ever cross the wire. At 100 TB that is the
  * difference between shuffling the corpus and shuffling kilobytes.
  *
  * With a priority that is a pure function of the row (the caller
  * passes e.g. `(id * knuth) % 2^32`), membership is layout- and
  * run-independent, and — unlike hash functions private to one engine —
  * any SQL engine can replay it, so the declared query is fully
  * oracle-checkable.
  */
case class BottomKByPriority(
    left: Expression,   // priority (integral)
    right: Expression,  // payload id (integral)
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]]
  with BinaryLike[Expression] {

  require(k >= 1, "k must be >= 1")

  override def prettyName: String = "bottomk_by_priority"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Both children must be integral at ANALYSIS time: via the SQL
    * surface (`graft_bottomk`) a double priority would silently
    * truncate through `Number.longValue` and a decimal one would throw
    * `ClassCastException` mid-execution (Spark's `Decimal` is not a
    * `java.lang.Number`) — fail the query plan instead. */
  override def checkInputDataTypes(): TypeCheckResult = {
    def integral(e: Expression, role: String): Option[String] = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => None
      case other => Some(s"$role must be an integral type, got ${other.sql}")
    }
    integral(left, "priority").orElse(integral(right, "id")) match {
      case Some(msg) => TypeCheckResult.TypeCheckFailure(s"$prettyName: $msg")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  // max-heap on (priority, id): the root is the WORST kept pair, so a
  // better candidate replaces it in O(log k)
  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)](Ordering.Tuple2[Long, Long])

  private def offer(buf: mutable.PriorityQueue[(Long, Long)], p: Long, id: Long): Unit = {
    if (buf.size < k) buf.enqueue((p, id))
    else if (Ordering.Tuple2[Long, Long].lt((p, id), buf.head)) {
      buf.dequeue(); buf.enqueue((p, id))
    }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val p = left.eval(input)
    val id = right.eval(input)
    if (p != null && id != null) {
      offer(buf, p.asInstanceOf[Number].longValue(), id.asInstanceOf[Number].longValue())
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach { case (p, id) => offer(buf, p, id) }
    buf
  }

  /** ids ordered by ascending (priority, id) — the deterministic
    * sample order, so `posexplode` downstream yields a stable rank. */
  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted(Ordering.Tuple2[Long, Long]).map(_._2))

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (p, id) => bb.putLong(p); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getLong, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByPriority =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByPriority =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKByPriority =
    copy(left = newLeft, right = newRight)
}

object BottomKByPriority {
  /** Column API: `bottomK($"priority", $"doc_id", 10)` → array<bigint>
    * of the k ids with the smallest (priority, id). */
  def bottomK(priority: Column, id: Column, k: Int): Column =
    graftbridge.column(
      BottomKByPriority(
        graftbridge.expression(priority), graftbridge.expression(id), k)
        .toAggregateExpression())
}
