package graft.functions

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** K-minimum-values (KMV / bottom-k theta) distinct-count sketches —
  * the mergeable sketch family that, unlike HyperLogLog, supports SET
  * INTERSECTION estimates (Beyer et al., "On Synopses for Distinct-
  * Value Estimation Under Multiset Operations", SIGMOD'07; the same
  * math behind Apache DataSketches' theta sketch).
  *
  * Sketch = the k smallest 64-bit hashes of the distinct input values,
  * kept in unsigned order. Mapping each hash to a uniform fraction
  * u(h) ∈ [0,1), the k-th smallest fraction θ estimates density:
  * distinct ≈ (k−1)/θ. Two sketches intersect by clipping both to the
  * SHARED threshold θ = min(θ_a, θ_b) and counting common hashes ρ:
  * |A ∩ B| ≈ ρ/θ — impossible with HLL registers, which only union.
  *
  * Scale design: a sketch is ≤ 8k bytes regardless of input size;
  * `KmvSketchAgg` is partial-aggregable (each map task keeps a bounded
  * heap, partials merge by union-then-truncate), so only k hashes per
  * partition cross the shuffle. Materialized per-partition sketches
  * form a SKETCH TABLE (see `Warehouse.metaKmvOverlap`): any rollup,
  * overlap, or ad-hoc cohort intersection is answered from kilobytes
  * without rescanning the 100 TB fact table. The estimate/intersect
  * expressions are eval-based (CodegenFallback) by design — they run
  * on sketch-table rows (thousands), never in the fact-scan hot path.
  *
  * Determinism: hashing is splitmix64 on the raw long (integral
  * inputs) or FNV-1a-then-splitmix on UTF-8 bytes (strings) — fixed
  * constants, no seeds, so sketches and estimates are bit-identical
  * across runs, layouts, and partition counts.
  */
object Kmv {
  /** splitmix64 finalizer — public-domain constants (Steele et al.,
    * "Fast Splittable Pseudorandom Number Generators", OOPSLA'14). */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def hashBytes(b: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L // FNV-1a 64 offset basis
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xFFL); h *= 0x100000001B3L; i += 1 }
    mix(h)
  }

  def hashAny(v: Any): Long = v match {
    case l: Long => mix(l)
    case i: Int => mix(i.toLong)
    case s: Short => mix(s.toLong)
    case b: Byte => mix(b.toLong)
    case u: UTF8String => hashBytes(u.getBytes)
    case other => hashBytes(other.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Input-kind tag serialized into sketch headers: integrals and
    * strings hash DIFFERENTLY (splitmix on the long vs FNV-1a on the
    * bytes), so probing or combining sketches across kinds silently
    * yields collisions-only near-zero results instead of an error.
    * The tag makes the mismatch detectable from the binary sketch.
    * 0 = unknown (raw buffers built outside the typed aggregates). */
  val KindUnknown: Byte = 0
  val KindIntegral: Byte = 1
  val KindString: Byte = 2
  def kindOf(dt: DataType): Byte = dt match {
    case ByteType | ShortType | IntegerType | LongType => KindIntegral
    case StringType => KindString
    case _ => KindUnknown
  }
  def kindName(k: Byte): String = k match {
    case KindIntegral => "integral"
    case KindString => "string"
    case _ => "unknown"
  }
  /** Reconcile two kinds: adopt the known one; ERROR on a true clash. */
  def mergeKinds(a: Byte, b: Byte, op: String): Byte =
    if (a == KindUnknown) b
    else if (b == KindUnknown || a == b) a
    else throw new IllegalArgumentException(
      s"$op over sketches built from different input kinds " +
        s"(${kindName(a)} vs ${kindName(b)}) — their hash spaces are " +
        "disjoint and the result would be a collisions-only near-zero count")

  /** Uniform fraction in [0,1) from a 64-bit hash (unsigned order-
    * preserving: flip the sign bit, scale by 2^-64). */
  def frac(h: Long): Double =
    ((h ^ Long.MinValue).toDouble - Long.MinValue.toDouble) / 1.8446744073709552E19

  /** Bounded sorted set of the k unsigned-smallest hashes, tagged with
    * the input kind it was built from (0 = unknown/raw). */
  final class Buffer(val k: Int, var kind: Byte = KindUnknown) {
    val set = new java.util.TreeSet[java.lang.Long](
      (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))
    def add(h: Long): Unit = {
      set.add(h)
      if (set.size > k) { set.pollLast(); () }
    }
    def mergeFrom(other: Buffer): Unit = {
      kind = mergeKinds(kind, other.kind, "kmv merge")
      val it = other.set.iterator()
      while (it.hasNext) add(it.next())
    }
  }

  def serialize(buf: Buffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(9 + 8 * buf.set.size)
    bb.putInt(buf.k); bb.putInt(buf.set.size); bb.put(buf.kind)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt; val n = bb.getInt; val kind = bb.get()
    val buf = new Buffer(k, kind)
    var i = 0
    while (i < n) { buf.set.add(bb.getLong); i += 1 }
    buf
  }

  /** (sorted hash array, θ, kind) view of a serialized sketch: θ =
    * u(k-th smallest) when the sketch is full, else 1.0. */
  def view(bytes: Array[Byte]): (Array[Long], Double, Byte) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt; val n = bb.getInt; val kind = bb.get()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = bb.getLong; i += 1 }
    val theta = if (n >= k) frac(hs(n - 1)) else 1.0
    (hs, theta, kind)
  }

  def estimate(bytes: Array[Byte]): Double = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt; val n = bb.getInt; bb.get()
    if (n < k || n == 0) n.toDouble
    else {
      // (k-1)/θ — the unbiased KMV estimator
      var i = 0; var last = 0L
      while (i < n) { last = bb.getLong; i += 1 }
      (k - 1).toDouble / math.max(frac(last), 1e-18)
    }
  }

  /** |A ∩ B| via the clipped-theta rule: θ = min(θ_a, θ_b), ρ = common
    * hashes below θ, estimate ρ/θ. Exact when both sketches are
    * un-saturated (θ = 1: every distinct value is present). Sketches
    * of differing input kinds ERROR (hash spaces are disjoint). */
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val (ha, ta, ka) = view(a)
    val (hb, tb, kb) = view(b)
    mergeKinds(ka, kb, "kmv_intersect_estimate")
    val theta = math.min(ta, tb)
    var i = 0; var j = 0; var rho = 0L
    while (i < ha.length && j < hb.length) {
      val c = java.lang.Long.compareUnsigned(ha(i), hb(j))
      if (c == 0) {
        if (frac(ha(i)) < theta) rho += 1
        i += 1; j += 1
      } else if (c < 0) i += 1 else j += 1
    }
    rho.toDouble / math.max(theta, 1e-18)
  }
}

/** Aggregate raw values into a KMV sketch (binary). */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.Buffer] with UnaryLike[Expression] {

  require(k >= 16, "kmv sketch size k must be >= 16")

  override def prettyName: String = "kmv_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires an integral or string child, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Kmv.Buffer =
    new Kmv.Buffer(k, Kmv.kindOf(child.dataType))

  override def update(buf: Kmv.Buffer, input: InternalRow): Kmv.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(Kmv.hashAny(v))
    buf
  }

  override def merge(buf: Kmv.Buffer, other: Kmv.Buffer): Kmv.Buffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: Kmv.Buffer): Any = Kmv.serialize(buf)
  override def serialize(buf: Kmv.Buffer): Array[Byte] = Kmv.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Kmv.Buffer = Kmv.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

/** Union already-materialized KMV sketches (binary → binary) — the
  * rollup aggregate over a sketch table. */
case class KmvUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.Buffer] with UnaryLike[Expression] {

  override def prettyName: String = "kmv_union"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_union requires a binary (serialized sketch) child, got ${other.catalogString}")
  }

  // k adopted from the first sketch merged in; 0 = empty sentinel
  override def createAggregationBuffer(): Kmv.Buffer = new Kmv.Buffer(0)

  private def combine(buf: Kmv.Buffer, other: Kmv.Buffer): Kmv.Buffer =
    if (other.set.isEmpty && other.k == 0) buf
    else if (buf.set.isEmpty && buf.k == 0) other
    else {
      // differing k: clip to the smaller (the only sound θ)
      val out = if (other.k < buf.k) { val b = new Kmv.Buffer(other.k); b.mergeFrom(buf); b }
                else buf
      out.mergeFrom(other)
      out
    }

  override def update(buf: Kmv.Buffer, input: InternalRow): Kmv.Buffer = {
    val v = child.eval(input)
    if (v == null) buf
    else combine(buf, Kmv.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buf: Kmv.Buffer, other: Kmv.Buffer): Kmv.Buffer =
    combine(buf, other)

  override def eval(buf: Kmv.Buffer): Any = Kmv.serialize(buf)
  override def serialize(buf: Kmv.Buffer): Array[Byte] = Kmv.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Kmv.Buffer = Kmv.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvUnionAgg =
    copy(child = newChild)
}

/** Distinct-count estimate of a serialized sketch. Sketch-table-sized
  * input ⇒ CodegenFallback is fine (documented above). */
case class KmvEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "kmv_estimate"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_estimate requires a binary child, got ${other.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    Kmv.estimate(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
}

/** Intersection-cardinality estimate of two serialized sketches — the
  * operation HLL cannot perform. */
case class KmvIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "kmv_intersect_estimate"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kmv_intersect_estimate requires two binary children, got ${l.catalogString}, ${r.catalogString}")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kmv.intersectEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): KmvIntersectEstimate =
    copy(left = newLeft, right = newRight)
}

object KmvSketch {
  /** Column API. */
  def kmvSketch(c: Column, k: Int): Column =
    graftbridge.column(KmvSketchAgg(graftbridge.expression(c), k).toAggregateExpression())
  def kmvUnion(c: Column): Column =
    graftbridge.column(KmvUnionAgg(graftbridge.expression(c)).toAggregateExpression())
  def kmvEstimate(c: Column): Column =
    graftbridge.column(KmvEstimate(graftbridge.expression(c)))
  def kmvIntersect(a: Column, b: Column): Column =
    graftbridge.column(KmvIntersectEstimate(graftbridge.expression(a), graftbridge.expression(b)))
}
