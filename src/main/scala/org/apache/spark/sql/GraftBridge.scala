package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column ↔ Expression conversions — the
  * supported pattern for libraries that define custom Catalyst expressions
  * against Spark 4's split Column API (sql-api vs classic).
  */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  /** DataFrame from a custom logical plan (classic.Dataset.ofRows is
    * private[sql]) — the construction path for custom operators like
    * [[graft.plans.TopKPerGroupNode]].
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
