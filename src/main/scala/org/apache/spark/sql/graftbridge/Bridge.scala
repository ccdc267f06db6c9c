package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal accessor for the `private[sql]` Dataset constructor — the
  * standard pattern for libraries that introduce their own logical plan
  * nodes (a custom node has no public entry point into a DataFrame).
  * Everything else in graft uses only public API; this file exists solely
  * so graft.plans.AsofJoin and graft.plans.GraftMergeInto can hand their
  * custom logical plans to the session. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ⇄ Expression for custom scalar expressions that need no
    * function-registry round-trip (graft.functions.PinnedKey). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
