package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark 4's package-private Column<->Expression converters.
  * Extension libraries that define native Catalyst expressions need this
  * hop since Column became implementation-agnostic in Spark 4.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** A DSv2 expression (a pushed DELETE predicate) as an UNRESOLVED
    * Catalyst expression — field references become UnresolvedAttributes
    * that the target DataFrame's analysis resolves. None when the v2
    * node has no Catalyst counterpart (the caller fails loudly). */
  def v2ToCatalyst(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[Expression] =
    catalyst.expressions.V2ExpressionUtils.toCatalyst(e)

  /** The v1-filter view of a DSv2 predicate, when one exists — what the
    * delete path PRUNES with (box/bloom math speaks v1 filters); a
    * predicate with no v1 form simply doesn't prune. */
  def v2PredicateToV1(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[org.apache.spark.sql.sources.Filter] =
    internal.connector.PredicateUtils.toV1(p)

  /** Build a DataFrame from a logical plan (Dataset.ofRows is
    * private[sql]) — the entry point for custom logical operators. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame (resolved attributes,
    * usable as a custom operator's child). */
  def analyzed(df: Dataset[_]): LogicalPlan = df.queryExecution.analyzed

  /** A STREAMING DataFrame over a batch DataFrame's rows — what a v1
    * streaming [[org.apache.spark.sql.execution.streaming.Source]]'s
    * `getBatch` must return (`internalCreateDataFrame(isStreaming =
    * true)` is private[sql]; this is the same call Spark's own v1 file
    * source rides). */
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** A BATCH DataFrame over a streaming micro-batch's rows — what a v1
    * streaming [[org.apache.spark.sql.execution.streaming.Sink]]'s
    * `addBatch` needs before handing the data to batch writers: the
    * incoming DataFrame is bound to the micro-batch's
    * IncrementalExecution and cannot be re-planned by batch actions
    * (Delta's DeltaSink does this same hop). Rows are copied — the
    * incremental execution reuses unsafe-row buffers. */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd.map(_.copy()), df.schema, isStreaming = false)
  }

  /** Session-aware EAGER Column -> catalyst Expression conversion.
    * `expression(c)` (ExpressionUtils) wraps API-built nodes like
    * `.cast(...)` in a lazy ColumnNodeExpression whose dataType reads
    * NullType — fine when fed back through Dataset.select (the analyzer
    * converts it), fatal inside a hand-built LogicalPlan that needs
    * real dataTypes at planning time. */
  def expressionOf(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** Idempotently add a planner strategy to the session (the
    * programmatic twin of GraftExtensions.injectPlannerStrategy).
    * Synchronized on the ExperimentalMethods instance: extraStrategies
    * is shared mutable session state, and an unsynchronized
    * check-then-act would let a concurrent writer's append be lost. */
  def ensureStrategy(spark: SparkSession, s: execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val exp = cs.experimental
    exp.synchronized {
      // a session built with spark.sql.extensions=graft.GraftExtensions
      // already carries the strategy via injectPlannerStrategy — adding
      // it to extraStrategies too would make the planner evaluate
      // duplicate candidates for every plan
      val present = exp.extraStrategies.contains(s) ||
        cs.sessionState.planner.extraPlanningStrategies.contains(s)
      if (!present)
        exp.extraStrategies = exp.extraStrategies :+ s
    }
  }

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
