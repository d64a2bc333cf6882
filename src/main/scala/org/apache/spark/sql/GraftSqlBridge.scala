package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's package-private Column<->Expression converters.
  * Extension libraries that define native Catalyst expressions need this
  * hop since Column became implementation-agnostic in Spark 4.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
