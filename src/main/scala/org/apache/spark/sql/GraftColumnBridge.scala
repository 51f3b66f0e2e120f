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

  /** Wrap a hand-built LogicalPlan (e.g. a custom operator node) as a
    * DataFrame — the `Dataset.ofRows` hop custom plan nodes need. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
