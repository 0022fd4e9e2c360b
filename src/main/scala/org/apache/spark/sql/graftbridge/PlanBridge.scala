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

  /** Unpersist the RDD behind a `localCheckpoint()`ed Dataset.
    * `Dataset.unpersist` only consults the CacheManager, which has NO
    * entry for checkpoint RDDs (they are persisted directly), so it is
    * a silent no-op there — the checkpoint stays in block-manager
    * storage until the ContextCleaner happens to GC the Dataset. This
    * reaches the `LogicalRDD` the checkpointed plan wraps and
    * unpersists it deterministically; a no-op for any other plan. */
  def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ =>
    }

  /** `private[sql]` NormalizeFloatingNumbers.normalize — rewrites -0.0
    * to 0.0 and canonicalizes NaN bit patterns (no-op on non-FP types).
    * Catalyst applies it to Aggregate/Join/Window grouping keys; a
    * custom operator that groups by raw UnsafeRow bytes must apply the
    * same rewrite to its keys itself. */
  def normalizeFloating(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers
      .normalize(e)
}
