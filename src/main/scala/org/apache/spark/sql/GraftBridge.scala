package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column <-> Expression conversion for the
  * graft engine's custom Catalyst expressions (Spark 4 moved Column to a
  * ColumnNode representation; `classic.ExpressionUtils` is the supported
  * conversion point but is sql-package-private). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a temp SQL function on a live session (the
    * SparkSessionExtensions path only applies at session build time;
    * this covers already-built sessions and tests). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
