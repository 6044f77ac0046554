package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * sanctioned-by-precedent way for libraries shipping native Catalyst
  * expressions to expose them through the public Column API (Spark 4
  * moved Column construction behind ColumnNode).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
