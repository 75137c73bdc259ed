package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. `classic.ExpressionUtils` is
  * private[sql] in Spark 4, so custom native expressions (e.g.
  * graft.functions.CosineSim) need this one-file shim in the spark.sql
  * namespace — the same pattern Spark extension libraries use to
  * expose codegen expressions through the public Column API.
  */
object graftbridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** DataFrame from a custom logical plan (`Dataset.ofRows` is
    * private[sql]) — the construction hook for injected operators
    * like graft.plans.AsOfJoinPlan. */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
