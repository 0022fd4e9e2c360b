package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Zero-cost OPTIMIZER FENCE: a pass-through expression whose ONLY
  * effect is `deterministic = false`, which stops `CollapseProject`
  * (and every other rule that inlines or duplicates expressions —
  * the inline guard is `producer.deterministic`) from substituting
  * the fenced alias into its consumers.
  *
  * Why it exists (VERDICT r16 item 1): the crawl family's
  * normalize/resolve URL chain is a stack of `withColumn` Projects
  * (`u` = normalizeUrl(url), `r` = resolveUrl(u, p), `host` =
  * hostBucket(u, r)) where each alias is referenced up to ~7 times by
  * the next level. Project collapsing substitutes the regex trees
  * into every reference, so the OPTIMIZED expression tree grows
  * multiplicatively (|host| ≈ 3·|r| ≈ 21·|normalizeUrl|) and every
  * optimizer batch iteration walks that blown-up tree — measured as
  * 0.1–1 s of pure driver planning per consumer query, re-paid per
  * micro-batch in the foreachBatch streams, where the r16 checkpoint
  * memo cannot help (each batch is a new DataFrame). Fencing the
  * aliases keeps the plan a stack of small Projects: planning is
  * O(sum of chain stages), not O(product).
  *
  * Runtime cost: ZERO. `doGenCode` delegates to the child, so inside
  * whole-stage codegen the fence compiles to exactly the child's
  * code; consecutive ProjectExecs fuse into one codegen stage and
  * pass values as locals, same as the collapsed form. (The collapsed
  * form was never a runtime win anyway — duplicated subtrees are
  * recovered by codegen subexpression elimination at best, and
  * re-evaluated per reference at worst.)
  *
  * Semantics: identical values — the flag only removes optimizer
  * freedoms (inline, duplicate, constant-fold, reorder past the
  * alias). Fenced columns are only ever produced in Projects, where
  * non-deterministic expressions are legal; consumers reference the
  * resulting ATTRIBUTE, which stays deterministic, so joins, filters,
  * aggregates and windows over fenced columns are unaffected.
  * Deliberate side effect: filters on a fenced column no longer push
  * below its Project — for the fenced chains (regex-derived columns
  * over an exploded CSV scan) there is nothing below to push into. */
final case class PlanFence(child: Expression) extends UnaryExpression {
  // the whole point: never inline, never duplicate, never fold
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def prettyName: String = "plan_fence"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PlanFence = copy(child = newChild)
}

object PlanFence {
  /** Fence a column: same values, opaque to project collapsing. */
  def apply(c: Column): Column =
    ColumnBridge.column(PlanFence(ColumnBridge.expression(c)))
}
