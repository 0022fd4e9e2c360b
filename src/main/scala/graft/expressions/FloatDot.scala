package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: sequential-fold dot product of two
  * `array<float>` columns in double precision.
  *
  * Semantically identical to the higher-order-function formulation
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)` —
  * same element order, same double arithmetic, so results stay
  * bit-identical to the DuckDB `list_dot_product(CAST(.. AS DOUBLE[]))`
  * oracle. The difference is execution: HOF lambdas are interpreted
  * per element and allocate an intermediate zipped array; this
  * expression is a single fused loop with `doGenCode`, so it inlines
  * into whole-stage codegen (SURVEY.md §4.3's preference for native
  * expressions over UDFs on the hot path).
  *
  * Null semantics match zip_with+aggregate: null array → null; a null
  * element makes the product term null → the whole fold null.
  * Mismatched lengths fold over the shorter prefix (zip_with would pad
  * with nulls → null result; callers here always pass equal-length
  * embeddings, and the shorter-prefix choice keeps the loop branchless).
  */
final case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"float_dot requires two array<float> arguments, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"
  // Always nullable: a null ELEMENT nulls the result even when the
  // array columns themselves are non-null, and codegen must have an
  // assignable isNull slot for that path.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object FloatDot {
  /** Column-level entry point: `float_dot(a, b)`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Driver-side evaluation of the SAME expression (its interpreted
    * `nullSafeEval` loop) over two in-memory vectors. Exists so driver
    * code that must replicate in-plan dot arithmetic exactly — e.g.
    * [[graft.ops.Similarity.ivfProbeTopK]]'s query routing, whose
    * probe ≡ inline parity is spec-pinned — has ONE source of truth
    * instead of a hand-copied loop that could drift if this
    * expression ever changes. */
  def evalDot(a: Seq[Float], b: Seq[Float]): Double = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val at = ArrayType(FloatType)
    FloatDot(Literal.create(a, at), Literal.create(b, at))
      .eval().asInstanceOf[Double]
  }
}
