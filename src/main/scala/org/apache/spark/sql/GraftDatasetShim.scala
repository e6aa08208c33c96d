package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` DataFrame-from-LogicalPlan constructor,
  * for graft's custom logical operators (graft.plans.RangeJoinPlan).
  * Lives in the `org.apache.spark.sql` package purely for access — the
  * standard arrangement for libraries that contribute Catalyst plan
  * nodes (Delta, Qbeast, Pathling all ship the same three-line shim).
  */
object GraftDatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ⇄ Expression bridges (`private[sql]` in Spark 4), for
    * expressions that carry driver-built state a SQL-literal surface
    * can't (e.g. graft.functions.NearestCentroid's broadcast codebook). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
