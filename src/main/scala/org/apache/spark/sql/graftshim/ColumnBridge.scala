package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ catalyst Expression
  * conversion (Spark 4 routes Column through ColumnNode). Lives under the
  * `org.apache.spark.sql` package solely to satisfy the access modifier —
  * the standard technique for Catalyst-extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Convert a composed Column into a STANDARD catalyst expression tree
    * (UnresolvedFunction et al.) the analyzer can resolve.
    * [[expression]] wraps the node lazily (ColumnNodeExpression) — fine
    * inside a Dataset transformation, but an injected SQL FunctionBuilder
    * must return a tree the analyzer descends into. */
  def resolvableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Clone a session (shared SparkContext + cache, copied conf) —
    * `SparkSession.cloneSession` is private[sql]. Used to scope per-write
    * SQL-conf overrides without mutating the caller's session. */
  def cloneSession(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Build a DataFrame from a logical plan (Dataset.ofRows is private[sql]). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Streaming-flagged DataFrame over a batch plan's rows — what a V1
    * streaming `Source.getBatch` must return (`internalCreateDataFrame` is
    * private[sql]). The batch plan executes when the micro-batch runs. */
  def streamingFrom(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** Batch DataFrame over a streaming micro-batch's physical rows — the
    * inverse of [[streamingFrom]], for a V1 `Sink.addBatch`: the incoming
    * frame carries an incremental streaming plan that batch writers must
    * not re-analyze, so the sink writes this wrapper instead. */
  def batchFrom(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
