package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into Spark 4's private[sql] Column↔Expression conversions.
 * Spark 4 made Column implementation-agnostic; classic-mode extensions
 * (like this engine's custom Catalyst expressions) use the same pattern
 * Spark's own `org.apache.spark.sql.classic` internals use.
 */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
