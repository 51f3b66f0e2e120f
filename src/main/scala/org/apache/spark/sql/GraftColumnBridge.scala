package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression conversions that
  * Spark 4 moved behind `org.apache.spark.sql.classic.ExpressionUtils`.
  * Custom Catalyst expressions (graft.functions.*) need both directions;
  * placing this object inside the sql package is the standard pattern
  * for Spark extension libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
