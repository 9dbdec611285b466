package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to `private[sql]` Column↔Expression conversion — the
  * standard pattern for libraries that ship custom Catalyst expressions
  * (Spark 4 removed the public `Column(expr)` constructor).
  */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Block until all queued listener events are delivered (private[spark]
    * listener bus) — used by Bench so per-query task-time attribution
    * doesn't bleed into the next query's window.
    */
  def drainListeners(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(30000)

  /** DataFrame from a logical plan (private[sql] Dataset.ofRows) — used by
    * the IVM planner to evaluate a sub-plan (e.g. an Aggregate's child)
    * under rebound temp-view bindings.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
