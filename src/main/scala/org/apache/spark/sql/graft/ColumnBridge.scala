package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst `Expression`s and the public
  * `Column` API. Spark 4 made the Expression<->Column conversions
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * extensions host this two-liner inside the `org.apache.spark.sql`
  * namespace — the same pattern third-party connectors use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Same-namespace bridge for constructing a DataFrame from a custom
  * LogicalPlan (`classic.Dataset.ofRows` is private[sql]) — needed to
  * hand a `graft.plans.AsOfJoinPlan` to the planner.
  */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
