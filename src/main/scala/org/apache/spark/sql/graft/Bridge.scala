package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils, SparkSession => ClassicSession}

/** Narrow bridge to `private[sql]` internals: turn a hand-built logical plan into a
  * DataFrame on the session (used by model substitution, which rewrites parsed plans
  * rather than SQL text), and a hand-built catalyst expression into a Column (used by
  * the semantic planner's parse-based lineage rewriting).
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** DataFrame over an ALREADY analyzed + optimized plan pair: the QueryExecution's
    * analysis and optimization phases are pinned to the supplied plans, so the warm
    * path pays neither (the optimizer alone is ~half of warm planning latency).
    * Only sound when the optimized plan is execution-invariant — the caller must
    * exclude plans with time-dependent foldables (current_timestamp & co., which
    * the optimizer freezes per-optimization) and non-deterministic expressions.
    * Physical planning still runs per call, so nothing stateful (AQE stages,
    * exchange reuse) leaks between executions.
    */
  def ofRowsPreOptimized(
      spark: SparkSession, analyzedPlan: LogicalPlan, optimized: LogicalPlan): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSession]
    val qe = new org.apache.spark.sql.execution.QueryExecution(cs, analyzedPlan) {
      override lazy val analyzed: LogicalPlan = analyzedPlan
      override lazy val optimizedPlan: LogicalPlan = optimized
    }
    new Dataset[org.apache.spark.sql.Row](qe,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(analyzedPlan.schema))
  }

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Fully convert a Column into a catalyst expression tree (unlike `expression`,
    * which returns a lazy wrapper that the analyzer will not recurse into — needed
    * when the expression is handed back to the analyzer, e.g. from a function
    * builder).
    */
  def toExpression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[ClassicSession].expression(c)

  /** Drain the listener bus so SparkListener-accumulated metrics (stage shuffle
    * bytes, etc.) are complete before a measurement tool reads them.
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Register a plan-time expression builder as a session temp function (the same
    * registry SQL temp functions land in, so `SHOW FUNCTIONS` / drops behave alike).
    */
  def registerFunction(
      spark: SparkSession, name: String, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[ClassicSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
