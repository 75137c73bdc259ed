package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import scala.jdk.CollectionConverters._

/** PK–FK join elimination — the constraint-driven optimization every
  * warehouse optimizer ships (Oracle/DB2 "join elimination", Calcite
  * `RelMdUniqueKeys`-based pruning) and OSS Spark cannot do because it
  * has no declared constraints: an INNER equi-join of a fact table to
  * a dimension's PRIMARY KEY is a no-op whenever (a) the FK is
  * non-null, (b) every FK value exists in the dimension (referential
  * integrity), (c) the PK is unique, and (d) the query consumes no
  * dimension column beyond the key itself. Under (a)–(c) each fact row
  * matches exactly one dimension row, so the join neither filters nor
  * duplicates; under (d) the only right-side output is the PK, which
  * the equi-condition makes literally EQUAL to the FK — the rewrite
  * replaces the join with a projection aliasing the FK onto the PK's
  * exprId. At 100 TB this deletes the largest shuffle in star-schema
  * queries written through views that always join their dimensions.
  *
  * Constraints are DECLARED, not inferred (exactly how the production
  * engines do it — `RELY` constraints): [[register]] records
  * (dimension path, pkCol, fkCol); the rule stays inert for any join
  * not covered by a declaration. Condition (d) is not declared but
  * OBSERVED structurally: the rule only fires after column pruning
  * has already reduced the dimension side to the bare PK column — if
  * any other dimension column survives pruning, someone consumes it
  * and the join stays. Spark 4's own V2 constraint framework accepts
  * the declarations but does not yet eliminate joins from them, which
  * is why this is an extension rule, not a conf flag.
  */
object JoinElimination extends Rule[LogicalPlan] {

  /** One declared RELY constraint: FK column `fkCol` of the fact table
    * stored at a path ending in `factPathSuffix` (non-null,
    * referentially intact) targets unique PK `pkCol` of the dimension
    * stored at a path ending in `dimPathSuffix`. The constraint binds
    * COLUMNS OF TABLES, not column names: the rule verifies the FK
    * attribute resolves — through value-preserving operators only —
    * to a scan of the declared fact path, so a derived or unrelated
    * column that merely shares the FK's NAME never triggers
    * elimination (it could violate the declared integrity). */
  final case class FkConstraint(dimPathSuffix: String, pkCol: String,
      factPathSuffix: String, fkCol: String)

  private val constraints =
    java.util.concurrent.ConcurrentHashMap.newKeySet[FkConstraint]()

  def register(c: FkConstraint): Unit = { constraints.add(c); () }
  def unregister(c: FkConstraint): Unit = { constraints.remove(c); () }

  /** The dimension side must already be pruned to exactly its PK:
    * Project(Seq(pk), scan-of-registered-path) or a bare scan whose
    * only output is the pk (single-column dimension). Returns the PK
    * attribute when the shape and a declaration match. */
  private def prunedPkSide(plan: LogicalPlan): Option[(Attribute, FkConstraint)] = {
    def scanPath(p: LogicalPlan): Option[String] = p match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.headOption.map(_.toString)
        case _ => None
      }
      case _ => None
    }
    // the only filter that may sit between the pruned Project and the
    // scan without blocking elimination is the optimizer's own
    // inferred IsNotNull(pk) (InferFiltersFromConstraints adds it to
    // every inner equi-join input): it removes no rows under the
    // declared non-null FK. ANY other predicate genuinely filters the
    // dimension and must keep the join.
    def stripInferredNotNull(p: LogicalPlan, pk: Attribute): LogicalPlan = p match {
      case Filter(cond, child)
          if splitConjunctivePredicates(cond).forall {
            case IsNotNull(a: AttributeReference) => a.exprId == pk.exprId
            case _ => false
          } => child
      case other => other
    }
    plan match {
      case Project(Seq(pk: AttributeReference), child) =>
        scanPath(stripInferredNotNull(child, pk)).flatMap { path =>
          constraints.asScala
            .find(c => path.endsWith(c.dimPathSuffix) && c.pkCol == pk.name)
            .map(c => (pk: Attribute, c))
        }
      case _ => None
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => Seq(other)
  }

  /** Fact-side provenance: the scan path `fk` faithfully descends
    * from, traversing only operators that cannot introduce values the
    * scan never produced — pass-through projections (an Alias mints a
    * new exprId, so a DERIVED column fails the exprId match), filters,
    * row-preserving-or-subsetting joins on the fk's side, grouping
    * keys, sort/limit. Union, Window, Generate, Expand, and
    * null-extending join sides all stop the walk: they can emit fk
    * values that violate the declared referential integrity. */
  private def faithfulScanPath(plan: LogicalPlan, fk: Attribute): Option[String] =
    plan match {
      case lr: LogicalRelation if lr.outputSet.contains(fk) =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.headOption.map(_.toString)
          case _ => None
        }
      case p: Project if p.projectList.exists {
          case a: AttributeReference => a.exprId == fk.exprId
          case _ => false
        } => faithfulScanPath(p.child, fk)
      case f: Filter => faithfulScanPath(f.child, fk)
      case j: Join =>
        import org.apache.spark.sql.catalyst.plans._
        val fromLeft = j.left.outputSet.contains(fk)
        val side = if (fromLeft) j.left else j.right
        val preserved = j.joinType match {
          case Inner | Cross => true
          case LeftOuter | LeftSemi | LeftAnti => fromLeft
          case RightOuter => !fromLeft
          case _ => false // full outer etc. null-extend both sides
        }
        if (preserved) faithfulScanPath(side, fk) else None
      case a: Aggregate if a.groupingExpressions.exists {
          case ar: AttributeReference => ar.exprId == fk.exprId
          case _ => false
        } => faithfulScanPath(a.child, fk)
      case s: Sort => faithfulScanPath(s.child, fk)
      case l: GlobalLimit => faithfulScanPath(l.child, fk)
      case l: LocalLimit => faithfulScanPath(l.child, fk)
      case r: RepartitionOperation => faithfulScanPath(r.child, fk)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (constraints.isEmpty) plan
    else plan transform {
      case j @ Join(left, right, Inner, Some(EqualTo(a: AttributeReference, b: AttributeReference)), _) =>
        prunedPkSide(right) match {
          case Some((pk, c)) =>
            // identify which condition side is the PK attr and which
            // the FK; the FK must come from the left (fact) side and
            // carry the declared name
            val (pkAttr, fkAttr) =
              if (a.exprId == pk.exprId) (a, b)
              else if (b.exprId == pk.exprId) (b, a)
              else (null, null)
            if (pkAttr != null && fkAttr.name == c.fkCol &&
              left.outputSet.contains(fkAttr) &&
              faithfulScanPath(left, fkAttr)
                .exists(_.endsWith(c.factPathSuffix))) {
              // join output is left.output ++ [pk]; pk ≡ fk under the
              // equi-condition, so alias the FK onto the PK's exprId
              Project(left.output :+
                Alias(fkAttr, pkAttr.name)(exprId = pkAttr.exprId), left)
            } else j
          case None => j
        }
    }
}
