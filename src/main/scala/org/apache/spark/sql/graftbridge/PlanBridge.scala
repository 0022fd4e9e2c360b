package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal accessor for the `private[sql]` LogicalPlan→DataFrame
  * constructor — the extension-library pattern for surfacing a custom
  * logical operator ([[graft.plans.TopKPerKey]]) through the public
  * DataFrame API. Same rationale as [[ColumnBridge]]; nothing else from
  * the private surface is touched. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Eager Column→Expression conversion through the session's
    * ColumnNode converter. [[ColumnBridge.expression]] wraps lazily
    * (fine when the result goes back through Dataset APIs that convert
    * at the boundary) — but an expression embedded in a hand-built
    * LogicalPlan skips that boundary, and the lazy wrapper surfaces as
    * an Unevaluable ColumnNodeExpression at execution time. */
  def expression(spark: SparkSession,
      c: org.apache.spark.sql.Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)
}
