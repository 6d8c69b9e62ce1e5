package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a raw Catalyst [[Expression]] to a public [[Column]].
  *
  * Spark 4 routes `Column` through the connect-compatible ColumnNode
  * layer and keeps the direct Expression wrapper `private[sql]`
  * (`classic.ExpressionUtils`). This one-liner lives under
  * `org.apache.spark.sql` purely to re-export it for graft's native
  * expressions (see `graft.ext.expr`); no Spark internals are
  * modified.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `QueryExecutionErrors` is private[sql] to scalac (bytecode-public,
    * so GENERATED Java calls it directly); interpreted eval paths of
    * graft's native expressions raise ANSI errors through here. */
  def divideByZeroError(context: org.apache.spark.QueryContext): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(context)
}
