package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge to `private[sql]` Column↔Expression conversions, so
 * graft's custom Catalyst expressions can surface as `Column`s. The
 * same pattern every Spark extension library uses (a tiny file in the
 * `org.apache.spark.sql` package); nothing else in graft lives here.
 */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a custom logical plan as a DataFrame (the `Dataset.ofRows`
    * every extension library bridges to). */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Test-only: whether the session's SQL cache manager holds any
    * cached plans — the thing `spark.catalog.clearCache()` clears.
    * Operators must leave this empty after their action (no
    * caller-side cache contract). */
  def sqlCacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty

  /** Test-only: materialize the planner strategies an extensions object
    * would inject into a session built with it. */
  def plannerStrategies(
      ext: SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark.asInstanceOf[classic.SparkSession])
}
