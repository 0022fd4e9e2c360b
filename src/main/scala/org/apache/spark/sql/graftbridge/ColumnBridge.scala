package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the `private[sql]` Column↔Expression bridge —
  * the sanctioned extension-library pattern for wiring a custom Catalyst
  * `Expression` (graft.expressions.FloatDot) into the public Column API
  * without a session-extensions registration step. Nothing else from
  * the private surface is touched. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
