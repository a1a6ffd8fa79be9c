package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Two `private[sql]` bridges the DSv2 catalog integration needs
  * (`graft.catalog.GraftDml`): turning an analyzed LogicalPlan back into a
  * DataFrame (to hand a SQL MERGE's source subquery to the engine's
  * mergeInto API) and wrapping a catalyst Expression as a user-facing
  * Column (to carry rewritten DML conditions). Lives under
  * `org.apache.spark.sql` for the access scope only — the standard
  * extension-author escape hatch; nothing here overrides Spark behavior. */
object GraftSqlShim {

  /** `Dataset.ofRows` — analyzed plan → DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** `ExpressionUtils.column` — catalyst Expression → Column (unresolved
    * attributes re-resolve against whatever frame the Column is used on). */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** The inverse — Column → catalyst Expression (for engine-side
    * re-rendering of a caller's condition against a renamed frame). */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a BATCH plan as a streaming frame (`isStreaming = true`) — the
    * V1 `Source.getBatch` contract. The plan stays lazy: the LogicalRDD
    * carries `queryExecution.toRdd`, which launches its jobs only when
    * the micro-batch sink consumes it. */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val qe = df.queryExecution
    classic.Dataset.ofRows(spark, org.apache.spark.sql.execution.LogicalRDD(
      qe.analyzed.output, qe.toRdd, isStreaming = true)(spark))
  }

  /** The inverse for V1 `Sink.addBatch`: a micro-batch's streaming frame
    * re-expressed as a batch frame over the SAME physical rows (the
    * ForeachBatchSink pattern), so it can go through batch writers. */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val qe = df.queryExecution
    classic.Dataset.ofRows(spark, org.apache.spark.sql.execution.LogicalRDD(
      qe.analyzed.output, qe.toRdd, isStreaming = false)(spark))
  }
}
