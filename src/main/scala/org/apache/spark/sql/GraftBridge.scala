package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Spark 4 made Column <-> Expression conversion `private[sql]`
 * (org.apache.spark.sql.classic.ExpressionUtils). Library extensions that
 * define native Catalyst expressions need the bridge, so expose it from
 * within the sql package — the standard pattern for Spark-extension libraries.
 */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
