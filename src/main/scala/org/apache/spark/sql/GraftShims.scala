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
}
