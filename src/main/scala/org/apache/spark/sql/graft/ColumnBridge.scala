package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters so the
  * graft library can lift custom Catalyst expressions (e.g.
  * graft.expressions.VecDot) into user-facing Columns on Spark 4's
  * ColumnNode API. This is the only file outside the `graft` package. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Lift a custom LogicalPlan into a DataFrame (the `Dataset.ofRows`
    * internal entry point — needed to expose whole-operator plans like
    * graft.plans.TopKPerKeyNode through the public Dataset API). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
