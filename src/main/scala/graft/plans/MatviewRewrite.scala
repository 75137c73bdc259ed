package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.LongType

/** Transparent materialized-view rewrite — the Calcite/warehouse
  * capability where the OPTIMIZER, not the user, decides a stored
  * aggregate can answer a query: an `Aggregate` whose grouping, input
  * relation, and aggregate EXPRESSIONS (canonicalized, not
  * name-matched) exactly match a registered view definition is
  * replaced by a `Project` over the view's parquet — the fact table is
  * never scanned. Freshness is by construction, not bookkeeping: the
  * registered view path comes from [[graft.util.artifactRoot]] keyed
  * by the fact table's content fingerprint, so a regenerated fact
  * table yields a different fingerprint, a different view path, and a
  * rebuild — a stale view is unreachable. At 100 TB this turns the
  * canonical dashboard aggregate from a full fact scan into a
  * groups-sized read; the registry generalizes to N views the way the
  * single-entry map generalizes to a catalog.
  *
  * Scope (deliberate): exact-match rewrite only — same grouping, same
  * aggregate expressions (`semanticEquals` on canonicalized forms),
  * fact scan possibly under a column-pruning Project. Containment
  * rewrites (view GROUP BY finer than query) are the standard
  * extension and would reuse the same matching skeleton with a
  * re-aggregation step.
  */
object MatviewRewrite extends Rule[LogicalPlan] {

  /** One catalog entry: the stored view's parquet path and the
    * grouping column the view carries BEYOND the query grouping —
    * empty for an exact-match view, non-empty for a roll-up view whose
    * finer rows must be re-aggregated (count → sum of partial counts,
    * sum → sum of partial sums; both lossless because count/sum are
    * commutative monoids over disjoint finer groups). */
  final case class ViewDef(mvPath: String, exact: Boolean)

  /** (fact-table root path, query grouping column) → view. */
  private val views = new java.util.concurrent.ConcurrentHashMap[(String, String), ViewDef]()

  def register(factPath: String, groupCol: String, v: ViewDef): Unit = {
    views.put((factPath, groupCol), v); ()
  }
  def unregister(factPath: String, groupCol: String): Unit = {
    views.remove((factPath, groupCol)); ()
  }

  /** The registered view definition: GROUP BY o_orderstatus over
    * orders with count(*) and sum(cast(round(o_totalprice*100) as
    * long)). The cents template is built against the SCAN's own
    * attribute and compared canonicalized, so only a semantically
    * identical sum matches — a different rounding or scale must not
    * read the view. */
  private def centsTemplate(price: Attribute): Expression =
    Cast(Round(Multiply(price, Literal(100.0)), Literal(0)), LongType)

  /** Unwraps an optional column-pruning Project over the fact scan;
    * returns the scan's output attributes by name. */
  private def factScan(plan: LogicalPlan): Option[(String, Map[String, Attribute])] =
    plan match {
      case Project(projectList, child) if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        factScan(child)
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.headOption.map(p =>
              (p.toString, lr.output.map(a => a.name -> a).toMap))
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (views.isEmpty) plan
    else plan transform {
      case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _) =>
        factScan(child) match {
          case Some((path, attrs))
              if views.containsKey((path, g.name)) && attrs.contains("o_totalprice") =>
            val cents = centsTemplate(attrs("o_totalprice")).canonicalized
            // map every output of the Aggregate onto a view column, or
            // bail out (None anywhere → no rewrite)
            val mapped: Seq[Option[(NamedExpression, String)]] = aggExprs.map {
              case a: AttributeReference if a.exprId == g.exprId =>
                Some((a, g.name))
              case al @ Alias(AggregateExpression(Count(Seq(Literal(1, _))), _, false, None, _), _) =>
                Some((al, "n_orders"))
              case al @ Alias(AggregateExpression(Sum(e, _), _, false, None, _), _)
                  if e.canonicalized semanticEquals cents =>
                Some((al, "revenue_cents"))
              case _ => None
            }
            if (mapped.exists(_.isEmpty)) agg
            else {
              val vdef = views.get((path, g.name))
              val mv = SparkSession.active.read.parquet(vdef.mvPath)
                .queryExecution.analyzed
              val byName = mv.output.map(a => a.name -> a).toMap
              if (vdef.exact) {
                val projList = mapped.flatten.map { case (orig, mvCol) =>
                  Alias(byName(mvCol), orig.name)(exprId = orig.exprId)
                }
                Project(projList, mv)
              } else {
                // roll-up: the view is grouped FINER than the query —
                // re-aggregate its partials (count → sum(n), sum →
                // sum(sum)); the query's grouping column must be one
                // of the view's grouping columns
                val gAttr = byName(g.name)
                val aggList = mapped.flatten.map {
                  case (orig, mvCol) if mvCol == g.name =>
                    Alias(gAttr, orig.name)(exprId = orig.exprId)
                  case (orig, mvCol) =>
                    Alias(Sum(byName(mvCol)).toAggregateExpression(),
                      orig.name)(exprId = orig.exprId)
                }
                Aggregate(Seq(gAttr), aggList, mv)
              }
            }
          case _ => agg
        }
    }
}
