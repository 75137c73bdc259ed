package graft.functions

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** KLL streaming quantile sketches (Karnin, Lang, Liberty, "Optimal
  * Quantile Approximation in Streams", FOCS'16 — the algorithm behind
  * Apache DataSketches' `kll_sketch`) — the MERGEABLE quantile summary
  * the exact bottom-k sampler (`Warehouse.metaQuantileSketch`) cannot
  * be: two KLL sketches over disjoint shards merge into a valid sketch
  * of the union with the SAME error guarantee, so a 100 TB table's
  * quantiles come from one map-side sketch per partition plus a
  * kilobyte-sized reduce — no global sort, no second scan, and the
  * materialized per-group sketches roll up along any dimension
  * hierarchy after the fact (the cube problem percentile_approx's
  * GK summary handles less cleanly: GK merges lose the error bound,
  * KLL merges provably keep it).
  *
  * Structure: a hierarchy of COMPACTORS; an item at level ℓ carries
  * weight 2^ℓ. Level 0 buffers raw values; when a level overflows its
  * capacity it is sorted and every other item is promoted to the level
  * above (halving count, doubling weight) — the survivors' parity
  * alternates per level (deterministic KLL: Ivkin et al. NeurIPS'19
  * study the derandomized variant; the alternation keeps the rank
  * estimate unbiased ACROSS compactions while making a single-JVM
  * sequential build reproducible). Capacities decay geometrically
  * (2/3)^depth from the top, so total retained items are O(k) and the
  * normalized rank error is O(1/k) at fixed failure probability —
  * ~1.3 % at k = 200 (the DataSketches default table).
  *
  * Rank queries: every retained item contributes its weight; the
  * estimated quantile q is the smallest retained value whose
  * cumulative weight reaches q·n over the weight-sorted items.
  *
  * Scale design: `KllSketchAgg` is partial-aggregable — map tasks
  * sketch locally and only O(k)-sized buffers cross the shuffle;
  * `KllMergeAgg` rolls up materialized sketch columns (the sketch-
  * table pattern of [[Kmv]]). Compaction order depends on merge order,
  * so cross-partition results are approximation-equivalent rather
  * than bit-identical → rows-only entry; specs pin the error bound
  * against exact order statistics, mergeability (split build ≡ bound
  * of whole build), and the O(k) size bound.
  */
object Kll {

  /** Base capacity → error: eps ≈ 2.296 / k^0.9 would be the
    * randomized bound; specs assert the lenient 3/k envelope. */
  val MinK = 8

  final class Buffer(val k: Int) {
    // levels(i) = compactor at level i (weight 2^i); level 0 unsorted
    var levels: Array[Array[Double]] = Array(Array.empty)
    var sizes: Array[Int] = Array(0)
    var n: Long = 0L
    var min: Double = Double.PositiveInfinity
    var max: Double = Double.NegativeInfinity
    // per-level compaction parity: alternating odd/even promotion
    var parity: Array[Boolean] = Array(false)

    private def capacity(level: Int): Int = {
      val depth = levels.length
      // top level gets k, lower levels decay by (2/3); floor 2 keeps
      // every compactor able to compact
      math.max(2, math.ceil(k * math.pow(2.0 / 3.0, depth - 1 - level)).toInt)
    }

    private def grow(level: Int): Unit =
      while (levels.length <= level) {
        levels = levels :+ Array.empty[Double]
        sizes = sizes :+ 0
        parity = parity :+ false
      }

    private def push(level: Int, v: Double): Unit = {
      grow(level)
      if (levels(level).length == sizes(level)) {
        val cap = math.max(4, math.max(levels(level).length * 2, capacity(level)))
        levels(level) = java.util.Arrays.copyOf(levels(level), cap)
      }
      levels(level)(sizes(level)) = v
      sizes(level) += 1
    }

    def add(v: Double): Unit = {
      push(0, v)
      n += 1
      if (v < min) min = v
      if (v > max) max = v
      compressIfNeeded()
    }

    private def totalRetained: Int = sizes.sum

    private def totalCapacity: Int = levels.indices.map(capacity).sum

    def compressIfNeeded(): Unit = {
      var guard = 0
      while (totalRetained > totalCapacity && guard < 64) {
        // compact the LOWEST over-capacity level (classic KLL order)
        val level = levels.indices
          .find(i => sizes(i) > capacity(i))
          .getOrElse(levels.indices.maxBy(i => sizes(i) - capacity(i)))
        compact(level)
        guard += 1
      }
    }

    private def compact(level: Int): Unit = {
      val m = sizes(level)
      if (m < 2) return
      val items = java.util.Arrays.copyOf(levels(level), m)
      java.util.Arrays.sort(items)
      // keep a possible odd straggler at this level: compact pairs only
      val pairs = m / 2
      val offset = if (parity(level)) 1 else 0
      parity(level) = !parity(level)
      // survivors: one of each adjacent pair (items 2i+offset)
      var i = 0
      sizes(level) = 0
      while (i < pairs) {
        push(level + 1, items(2 * i + offset))
        i += 1
      }
      if (m % 2 == 1) push(level, items(m - 1)) // straggler stays
    }

    def mergeFrom(other: Buffer): Unit = {
      n += other.n
      if (other.min < min) min = other.min
      if (other.max > max) max = other.max
      var level = 0
      while (level < other.levels.length) {
        var i = 0
        while (i < other.sizes(level)) {
          push(level, other.levels(level)(i))
          i += 1
        }
        level += 1
      }
      compressIfNeeded()
    }

    /** (value, weight) pairs of every retained item, value-sorted. */
    def weighted: Array[(Double, Long)] = {
      val out = new Array[(Double, Long)](totalRetained)
      var idx = 0
      var level = 0
      while (level < levels.length) {
        val w = 1L << level
        var i = 0
        while (i < sizes(level)) {
          out(idx) = (levels(level)(i), w)
          i += 1; idx += 1
        }
        level += 1
      }
      java.util.Arrays.sort(out, Ordering.by((p: (Double, Long)) => p._1))
      out
    }

    /** Smallest retained value with cumulative weight ≥ q·n. */
    def quantile(q: Double): Double = {
      require(q >= 0.0 && q <= 1.0, s"quantile fraction out of range: $q")
      if (n == 0) return Double.NaN
      if (q == 0.0) return min
      if (q == 1.0) return max
      val items = weighted
      val target = q * n
      var cum = 0.0
      var i = 0
      while (i < items.length) {
        cum += items(i)._2
        if (cum >= target) return items(i)._1
        i += 1
      }
      max
    }

    /** Estimated normalized rank of `v`: weight fraction strictly below. */
    def rank(v: Double): Double = {
      if (n == 0) return Double.NaN
      var below = 0.0
      var level = 0
      while (level < levels.length) {
        val w = (1L << level).toDouble
        var i = 0
        while (i < sizes(level)) {
          if (levels(level)(i) < v) below += w
          i += 1
        }
        level += 1
      }
      below / n
    }
  }

  def serialize(buf: Buffer): Array[Byte] = {
    val numLevels = buf.levels.length
    val retained = buf.sizes.sum
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 + 8 + 4 +
      numLevels * (4 + 1) + retained * 8)
    bb.putInt(buf.k); bb.putLong(buf.n)
    bb.putDouble(buf.min); bb.putDouble(buf.max)
    bb.putInt(numLevels)
    var level = 0
    while (level < numLevels) {
      bb.putInt(buf.sizes(level))
      bb.put(if (buf.parity(level)) 1.toByte else 0.toByte)
      var i = 0
      while (i < buf.sizes(level)) { bb.putDouble(buf.levels(level)(i)); i += 1 }
      level += 1
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getInt)
    buf.n = bb.getLong
    buf.min = bb.getDouble
    buf.max = bb.getDouble
    val numLevels = bb.getInt
    buf.levels = new Array[Array[Double]](numLevels)
    buf.sizes = new Array[Int](numLevels)
    buf.parity = new Array[Boolean](numLevels)
    var level = 0
    while (level < numLevels) {
      val m = bb.getInt
      buf.sizes(level) = m
      buf.parity(level) = bb.get() == 1
      val arr = new Array[Double](m)
      var i = 0
      while (i < m) { arr(i) = bb.getDouble; i += 1 }
      buf.levels(level) = arr
      level += 1
    }
    buf
  }
}

/** Aggregate raw numeric values into a KLL sketch (binary). */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kll.Buffer] with UnaryLike[Expression] {

  require(k >= Kll.MinK, s"kll sketch size k must be >= ${Kll.MinK}")

  override def prettyName: String = "kll_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch requires a numeric child, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Kll.Buffer = new Kll.Buffer(k)

  override def update(buf: Kll.Buffer, input: InternalRow): Kll.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
      case other => other.toString.toDouble
    })
    buf
  }

  override def merge(buf: Kll.Buffer, other: Kll.Buffer): Kll.Buffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: Kll.Buffer): Any = Kll.serialize(buf)
  override def serialize(buf: Kll.Buffer): Array[Byte] = Kll.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Kll.Buffer = Kll.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Merge already-materialized KLL sketches (binary → binary) — the
  * rollup aggregate over a sketch table; sketches of differing k merge
  * soundly (error follows the smaller k, as in DataSketches). */
case class KllMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kll.Buffer] with UnaryLike[Expression] {

  override def prettyName: String = "kll_merge"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge requires a binary (serialized sketch) child, got ${other.catalogString}")
  }

  // n = -1 empty sentinel, adopts the first real sketch wholesale
  override def createAggregationBuffer(): Kll.Buffer = {
    val b = new Kll.Buffer(Kll.MinK)
    b.n = -1
    b
  }

  private def isEmptySentinel(b: Kll.Buffer): Boolean = b.n == -1L

  private def combine(buf: Kll.Buffer, other: Kll.Buffer): Kll.Buffer =
    if (isEmptySentinel(other)) buf
    else if (isEmptySentinel(buf)) other
    else if (other.k < buf.k) {
      // adopt the smaller k (the only sound error envelope)
      val out = new Kll.Buffer(other.k)
      out.n = 0
      out.mergeFrom(buf); out.mergeFrom(other)
      out
    } else { buf.mergeFrom(other); buf }

  override def update(buf: Kll.Buffer, input: InternalRow): Kll.Buffer = {
    val v = child.eval(input)
    if (v == null) buf
    else combine(buf, Kll.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buf: Kll.Buffer, other: Kll.Buffer): Kll.Buffer =
    combine(buf, other)

  override def eval(buf: Kll.Buffer): Any =
    Kll.serialize(if (isEmptySentinel(buf)) new Kll.Buffer(buf.k) else buf)
  override def serialize(buf: Kll.Buffer): Array[Byte] = {
    // sentinel survives shuffle: n = -1 round-trips through the codec
    Kll.serialize(buf)
  }
  override def deserialize(bytes: Array[Byte]): Kll.Buffer = Kll.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** Quantile estimates from a serialized sketch: fractions → values.
  * Sketch-table-sized input ⇒ CodegenFallback (the [[KmvEstimate]]
  * discipline: never in a fact-scan hot path). */
case class KllQuantiles(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "kll_quantiles"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // any numeric element type is accepted — the SQL surface writes
  // array(0.5), a DECIMAL array literal
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(_: NumericType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantiles requires (binary, array<numeric>), got ${l.catalogString}, ${r.catalogString}")
    }
  private lazy val elemType =
    right.dataType.asInstanceOf[ArrayType].elementType
  override protected def nullSafeEval(sketch: Any, fracs: Any): Any = {
    val buf = Kll.deserialize(sketch.asInstanceOf[Array[Byte]])
    val qs = fracs.asInstanceOf[ArrayData].toObjectArray(elemType).map {
      case d: java.lang.Double => d.doubleValue
      case f: java.lang.Float => f.doubleValue
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
      case n: java.lang.Number => n.doubleValue
      case other => throw new IllegalArgumentException(
        s"kll_quantiles: bad quantile fraction $other")
    }
    new GenericArrayData(qs.map(buf.quantile))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantiles =
    copy(left = newLeft, right = newRight)
}

/** Count of values summarized by a sketch (n). */
case class KllCount(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "kll_count"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_count requires a binary child, got ${other.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    Kll.deserialize(v.asInstanceOf[Array[Byte]]).n
  override protected def withNewChildInternal(newChild: Expression): KllCount =
    copy(child = newChild)
}

object KllSketch {
  /** Column API. */
  def kllSketch(c: Column, k: Int): Column =
    graftbridge.column(KllSketchAgg(graftbridge.expression(c), k).toAggregateExpression())
  def kllMerge(c: Column): Column =
    graftbridge.column(KllMergeAgg(graftbridge.expression(c)).toAggregateExpression())
  def kllQuantiles(sketch: Column, fracs: Column): Column =
    graftbridge.column(KllQuantiles(
      graftbridge.expression(sketch), graftbridge.expression(fracs)))
  def kllCount(c: Column): Column =
    graftbridge.column(KllCount(graftbridge.expression(c)))
}
