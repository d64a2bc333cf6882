package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's package-private Column<->Expression converters.
  * Extension libraries that define native Catalyst expressions need this
  * hop since Column became implementation-agnostic in Spark 4.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Release the storage blocks behind a `localCheckpoint()`ed Dataset.
    * The checkpoint's RDD is only reachable through the private LogicalRDD
    * plan node, so driver loops that checkpoint per round (connected
    * components) would otherwise leak one materialized copy per round
    * until GC + ContextCleaner get around to it. */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
