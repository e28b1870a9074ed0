package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column <-> Expression conversion for the
  * graft engine's custom Catalyst expressions (Spark 4 moved Column to a
  * ColumnNode representation; `classic.ExpressionUtils` is the supported
  * conversion point but is sql-package-private). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
