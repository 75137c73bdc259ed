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
}
