package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions._

/** Minimal bridge into `private[sql]` surface for graft's custom plan
  * nodes — the same technique every Spark extension library uses to
  * construct DataFrames from custom LogicalPlans. Kept to the two
  * functions the library needs.
  */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(castToImpl(spark), plan)

  def analyzed(df: DataFrame): LogicalPlan =
    castToImpl(df).queryExecution.analyzed

  /** Column from a raw Catalyst Expression — lets pure Column helpers
    * use graft's native kernels without needing a session to register
    * the SQL function name first.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
