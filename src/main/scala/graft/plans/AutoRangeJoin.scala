package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** AUTOMATIC range-join binning — the optimizer extension that makes
  * the q50 rewrite a property of the ENGINE instead of a pattern users
  * must hand-apply (the role of Databricks' range-join optimization /
  * `RANGE_JOIN` hint, rebuilt on public Catalyst API).
  *
  * Trigger: an INNER join whose condition is exactly a band predicate
  *   `lo ≼ pt  AND  pt ≼ hi`   (≼ ∈ {<, ≤}, any operand order)
  * with `pt` from one side, `lo`/`hi` from the other, all integral —
  * the shape Spark would otherwise plan as a nested-loop over the full
  * cross product (no equi key to hash on).
  *
  * Rewrite (bin width `w` from `spark.graft.autoRangeJoin.binWidth`,
  * 0/unset = rule off):
  *   - interval side gains `Generate(Explode(sequence(lo div w,
  *     hi div w)))` — each interval posted to every bin it spans
  *     (guarded: an empty interval explodes to no rows, so a
  *     `lo > hi` row can never crash `sequence`);
  *   - point side gains `pt div w` as its single bin;
  *   - the join becomes an EQUI-join on the bin, with the ORIGINAL
  *     band predicate kept for exact re-verification;
  *   - a final Project restores the original output (bins are
  *     plumbing, invisible to the user).
  *
  * Each point has exactly ONE bin, so every (interval, point) pair
  * meets at most once — no dedup step. Truncating division is
  * monotone, so `pt ∈ [lo, hi] ⇒ pt div w ∈ [lo div w, hi div w]`
  * for ANY sign — no match can be lost. Null bounds/points produce
  * empty sequences / never-equal bins, matching the original
  * null-comparison semantics. The rewritten join never re-matches the
  * rule (its condition now contains an equality), so the rule is
  * idempotent.
  *
  * At 100 TB this is the difference between an O(n·m) nested loop and
  * a hash shuffle on a well-distributed bin key with per-bin work
  * proportional to genuine proximity. Correctness is spec-asserted
  * (rule-on ≡ rule-off row sets, plan shape, empty-interval guard) and
  * the declared query `q68_range_join_auto` is DuckDB-oracle-checked.
  *
  * Fan-out guard (`spark.graft.autoRangeJoin.maxBinsPerRow`, default
  * 4096): a single wide interval with a small `w` would otherwise
  * `sequence()` up to 2³¹ bins — a runtime failure (or an enormous
  * fan-out before it) that turns a WORKING nested-loop query into a
  * broken one the moment the rule is armed. The span is per-row, so
  * the guard cannot be a plan-time skip: instead the interval side is
  * SPLIT — rows spanning ≤ cap bins take the binned equi-join, wider
  * rows fall back to the original band join — and the two results
  * union. The fallback branch costs an extra scan of both inputs even
  * when no row is wide, so `-1` disables the split for pipelines that
  * can promise bounded intervals (the round-6 behavior: pure binned
  * rewrite, no second scan). Split correctness: the two branch
  * predicates partition the non-null-span rows exactly, and rows with
  * a NULL bound (span NULL → both filters false) match nothing in
  * either branch — same as the original inner band join.
  */
object AutoRangeJoin extends Rule[LogicalPlan] {

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Normalize a comparison to (lower, upper): lower ≼ upper. */
  private def bounds(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case LessThan(a, b) => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case GreaterThan(a, b) => Some((b, a))
    case _ => None
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitAnd(a) ++ splitAnd(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = conf.getConfString("spark.graft.autoRangeJoin.binWidth", "0")
    val w = try raw.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"spark.graft.autoRangeJoin.binWidth must be an integral bin width " +
          s"(positive to enable, 0/unset to disable), got '$raw'")
    }
    if (w <= 0) return plan
    val capRaw = conf.getConfString("spark.graft.autoRangeJoin.maxBinsPerRow", "4096")
    val cap = try capRaw.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"spark.graft.autoRangeJoin.maxBinsPerRow must be a positive bin cap " +
          s"or -1 to disable the wide-interval fallback, got '$capRaw'")
    }
    require(cap == -1L || cap >= 1L,
      s"spark.graft.autoRangeJoin.maxBinsPerRow must be >= 1 or -1, got $cap")
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitAnd(cond)
        val rewritten = if (conjuncts.length == 2) {
          (bounds(conjuncts(0)), bounds(conjuncts(1))) match {
            case (Some(b1), Some(b2)) =>
              // pt is the upper bound of one conjunct and the lower of
              // the other: (lo ≼ pt) ∧ (pt ≼ hi)
              val oriented =
                if (b1._2.semanticEquals(b2._1)) Some((b1._2, b1._1, b2._2))
                else if (b2._2.semanticEquals(b1._1)) Some((b2._2, b2._1, b1._2))
                else None
              oriented.flatMap { case (pt, lo, hi) =>
                val sides = Seq(left, right)
                val ptSide = sides.find(s => pt.references.nonEmpty &&
                  pt.references.subsetOf(s.outputSet))
                val ivSide = sides.find(s => lo.references.nonEmpty &&
                  (lo.references ++ hi.references).subsetOf(s.outputSet))
                (ptSide, ivSide) match {
                  case (Some(p), Some(iv)) if p.ne(iv) &&
                      Seq(pt, lo, hi).forall(isIntegral) =>
                    Some(rewrite(j, cond, pt, lo, hi, p, iv, w, cap))
                  case _ => None
                }
              }
            case _ => None
          }
        } else None
        rewritten.getOrElse(j)
    }
  }

  private def rewrite(j: Join, cond: Expression,
      pt: Expression, lo: Expression, hi: Expression,
      ptChild: LogicalPlan, ivChild: LogicalPlan, w: Long, cap: Long): LogicalPlan = {
    val wLit = Literal(w)
    def binOf(e: Expression): Expression =
      IntegralDivide(Cast(e, LongType), wLit)
    // per-row bin span; NULL when either bound is NULL (row matches
    // nothing in an inner band join, so both branch filters drop it)
    val spanExpr = Add(Subtract(binOf(hi), binOf(lo)), Literal(1L))
    val narrowIv =
      if (cap == -1L) ivChild else Filter(LessThanOrEqual(spanExpr, Literal(cap)), ivChild)
    // Sequence is TimeZoneAwareExpression — without an explicit zone it
    // reports unresolved and the optimizer rejects the rewritten plan
    val seqExpr = If(LessThanOrEqual(Cast(lo, LongType), Cast(hi, LongType)),
      Sequence(binOf(lo), binOf(hi), Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone)),
      Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
    val binAttr = AttributeReference("graft_range_bin", LongType, nullable = false)()
    val ivGen = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(binAttr), child = narrowIv)
    val ptBinAlias = Alias(binOf(pt), "graft_pt_bin")()
    val ptProj = Project(ptChild.output :+ ptBinAlias, ptChild)
    val (newLeft, newRight) =
      if (j.left.eq(ivChild)) (ivGen: LogicalPlan, ptProj: LogicalPlan)
      else (ptProj: LogicalPlan, ivGen: LogicalPlan)
    val newCond = And(EqualTo(binAttr, ptBinAlias.toAttribute), cond)
    val binned = Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    if (cap == -1L) binned
    else {
      // wide tail: intervals spanning more bins than the cap keep the
      // ORIGINAL band join (nested loop over the few wide rows). The
      // appended TRUE conjunct makes the condition 3 conjuncts so this
      // join can never re-match the rule inside the fixed-point batch.
      val wideIv = Filter(GreaterThan(spanExpr, Literal(cap)), ivChild)
      val (wl, wr) =
        if (j.left.eq(ivChild)) (wideIv: LogicalPlan, ptChild)
        else (ptChild, wideIv: LogicalPlan)
      val wide = Project(j.output,
        Join(wl, wr, Inner, Some(And(cond, Literal.TrueLiteral)), j.hint))
      Union(Seq(binned, wide), byName = false, allowMissingCol = false)
    }
  }
}
