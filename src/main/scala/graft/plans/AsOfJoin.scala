package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{graftbridge, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Native as-of join — the full custom-operator ladder (SURVEY §4.2c):
  * logical node + planner strategy + physical operator, registered
  * through `SparkSessionExtensions`.
  *
  * Semantics: INNER as-of — every left row pairs with the single right
  * row sharing its key whose timestamp is the greatest ≤ the left
  * timestamp (ties in right timestamps resolve to the last row in
  * (key, ts) sort order — pre-reduce the right side if ties matter,
  * as `q36_asof_join` does). Null keys/timestamps never match.
  *
  * Why a physical operator: the composable formulation (equi-join on
  * key + range filter + row_number window) materializes EVERY
  * (left, right-before) pair before the window keeps one — with heavy
  * key fan-in that intermediate is |left| × |right-per-key|. This
  * operator declares hash co-partitioning on the keys and (key, ts)
  * sort order as REQUIRED child properties (Catalyst's
  * EnsureRequirements inserts the exchanges/sorts, and can elide them
  * when the children are already partitioned — e.g. bucketed tables),
  * then merges each partition pair in one streaming pass holding ONE
  * buffered right row per key: output is |matched left|, intermediate
  * state is O(1) per partition. This is the plan shape a native
  * engine's ASOF JOIN runs.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    direction: String = "backward") extends BinaryNode {
  // the exec's merge loop reads keys/timestamps as raw longs — reject
  // other types at plan construction, not with a ClassCastException
  // mid-job (the DataFrame builder checks too, but the plan can be
  // constructed directly, e.g. by a future SQL surface)
  AsOfJoinPlan.validate(Seq(leftKey, rightKey, leftTs, rightTs))
  AsOfJoinPlan.validateDirection(direction)
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  val Directions: Set[String] = Set("backward", "forward", "nearest")
  /** Long/timestamp only (both are long-backed internally). Skips
    * unresolved expressions — those fail analysis on their own. */
  def validate(exprs: Seq[Expression]): Unit =
    exprs.filter(_.resolved).foreach { e =>
      require(e.dataType == LongType || e.dataType == TimestampType,
        s"as-of join: key/ts expression '${e.sql}' must be long or timestamp, got ${e.dataType}")
    }
  def validateDirection(d: String): Unit =
    require(Directions.contains(d),
      s"as-of join: direction must be one of ${Directions.mkString("/")}, got '$d'")
}

/** Planner strategy mapping the logical node to the exec — registered
  * via `injectPlannerStrategy` in [[GraftExtensions]]. */
object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, dir) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, dir) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    direction: String = "backward")
  extends SparkPlan with BinaryExecNode {

  AsOfJoinPlan.validate(Seq(leftKey, rightKey, leftTs, rightTs))
  AsOfJoinPlan.validateDirection(direction)

  override def output: Seq[Attribute] = left.output ++ right.output

  /** Hash co-partition both sides on their keys (value-hash equality
    * makes corresponding keys land in the same partition index — the
    * sort-merge-join contract) and sort each partition by (key, ts). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val (lOut, rOut) = (left.output, right.output)
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTs, rightTs)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyE = BindReferences.bindReference(lk, lOut)
      val lTsE = BindReferences.bindReference(lt, lOut)
      val rKeyE = BindReferences.bindReference(rk, rOut)
      val rTsE = BindReferences.bindReference(rt, rOut)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(lOut ++ rOut, lOut ++ rOut)

      val dirForward = direction == "forward"
      val dirNearest = direction == "nearest"

      new Iterator[InternalRow] {
        // the one buffered right row: latest (key, ts) seen with ts ≤
        // the current left ts — the O(1) state of the merge. FORWARD
        // needs no buffer at all (the match is the first not-yet-
        // consumed same-key row with ts ≥ left ts); NEAREST keeps the
        // backward buffer AND peeks the forward row, still O(1).
        private var rCur: InternalRow = _
        private var rCurKey = 0L; private var rCurTs = 0L
        private var rValid = false
        private var lastRow: InternalRow = _
        private var lastKey = 0L; private var lastTs = 0L
        private var lastValid = false
        private var pending: InternalRow = _

        private def advanceRight(): Unit = {
          rValid = false
          while (!rValid && rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyE.eval(r); val t = rTsE.eval(r)
            if (k != null && t != null) {
              rCur = r
              rCurKey = k.asInstanceOf[Long]; rCurTs = t.asInstanceOf[Long]
              rValid = true
            }
          }
        }
        advanceRight()

        private def computeNext(): Unit = {
          pending = null
          while (pending == null && lIter.hasNext) {
            val l = lIter.next()
            val kAny = lKeyE.eval(l); val tAny = lTsE.eval(l)
            if (kAny != null && tAny != null) {
              val k = kAny.asInstanceOf[Long]; val t = tAny.asInstanceOf[Long]
              if (dirForward) {
                // drop right rows strictly before the left ts (no later
                // left row — keys/ts only grow — can want them); the
                // surviving same-key head IS the forward match. rCur is
                // projected before any further advance, so the child's
                // reused buffer is still live — no copy needed.
                while (rValid && (rCurKey < k || (rCurKey == k && rCurTs < t)))
                  advanceRight()
                if (rValid && rCurKey == k)
                  pending = resultProj(joined(l, rCur))
              } else {
                // consume right rows that can never match a later left row
                // (left keys/ts only grow); remember the latest same-key one.
                // copy(): the child iterator reuses its row buffer
                while (rValid && (rCurKey < k || (rCurKey == k && rCurTs <= t))) {
                  if (rCurKey == k) {
                    lastRow = rCur.copy(); lastKey = k; lastTs = rCurTs
                    lastValid = true
                  }
                  advanceRight()
                }
                val backOk = lastValid && lastKey == k
                if (!dirNearest) {
                  if (backOk) pending = resultProj(joined(l, lastRow))
                } else {
                  // NEAREST: the un-consumed same-key head (ts > t) is
                  // the forward candidate; closer wins, ties → backward
                  val fwdOk = rValid && rCurKey == k
                  if (backOk && (!fwdOk || t - lastTs <= rCurTs - t))
                    pending = resultProj(joined(l, lastRow))
                  else if (fwdOk)
                    pending = resultProj(joined(l, rCur))
                }
              }
            }
          }
        }

        // lazy compute: `pending` points into resultProj's reused
        // buffer, so the next row may only be computed after the
        // caller is done with the previous one (the SparkPlan row
        // reuse contract) — computing eagerly in next() would corrupt
        // the row just handed out
        override def hasNext: Boolean = {
          if (pending == null) computeNext()
          pending != null
        }
        override def next(): InternalRow = {
          if (pending == null) computeNext()
          val out = pending; pending = null; out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level builder for the native as-of join. */
object AsOf {
  /** `left ASOF JOIN right ON left.lKey = right.rKey AND
    * left.lTs >= right.rTs` (inner). Key and timestamp columns must be
    * long/timestamp typed; right column names must not collide with
    * left ones (the right side gets fresh expression ids here, but the
    * OUTPUT carries both sides' columns and is addressed by name).
    *
    * `direction` is the pandas merge_asof / QuestDB surface:
    * "backward" (default — greatest right ts ≤ left ts), "forward"
    * (smallest right ts ≥ left ts), "nearest" (closer of the two,
    * ties to backward). All three run the same one-pass merge over
    * co-partitioned sorted children with O(1) buffered state. */
  def join(left: DataFrame, right: DataFrame,
      lKey: String, rKey: String, lTs: String, rTs: String,
      direction: String = "backward"): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    // fresh exprIds: left and right may derive from the same source
    // (self-join), which would otherwise duplicate attribute ids
    // across the two children
    val rPlan = Project(
      right.queryExecution.analyzed.output.map(a => Alias(a, a.name)()),
      right.queryExecution.analyzed)
    val lNames = lPlan.output.map(_.name).toSet
    require(rPlan.output.forall(a => !lNames.contains(a.name)),
      "as-of join: right column names must be disjoint from left")
    def attr(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"as-of join: no column '$n'"))
    def checkTyped(a: Attribute): Attribute = {
      require(a.dataType == LongType || a.dataType == TimestampType,
        s"as-of join: '${a.name}' must be long or timestamp, got ${a.dataType}")
      a
    }
    graftbridge.ofRows(left.sparkSession, AsOfJoinPlan(
      lPlan, rPlan,
      checkTyped(attr(lPlan.output, lKey)), checkTyped(attr(rPlan.output, rKey)),
      checkTyped(attr(lPlan.output, lTs)), checkTyped(attr(rPlan.output, rTs)),
      direction))
  }
}
