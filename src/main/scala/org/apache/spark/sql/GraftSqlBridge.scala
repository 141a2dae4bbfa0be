package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge for `private[sql]` Column↔Expression conversion so the
  * library can expose custom Catalyst expressions through the public
  * Column API (Spark 4 moved Column onto ColumnNode; classic
  * ExpressionUtils does the conversion but is sql-private). */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
