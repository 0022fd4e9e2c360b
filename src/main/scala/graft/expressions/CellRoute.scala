package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: IVF coarse routing — the argmax cell id
  * of an `array<float>` embedding against a constant codebook, as ONE
  * fused matrix-vector loop.
  *
  * Semantically identical (spec-pinned in SimilaritySpec) to the
  * composed formulation `greatest(struct(float_dot(e, c_0), id_0), …)
  * .getField("cell")` that [[graft.ops.Similarity]] uses for small
  * codebooks: per-cell score is the same sequential double fold over
  * the float-downcast centroid ([[FloatDot]] arithmetic), comparison
  * is (score, id) lexicographic with NaN greatest (Spark's double
  * ordering), ties broken to the LARGER cell id. A null ELEMENT
  * poisons every score identically, so the struct-max falls through
  * to the id tiebreak — the largest cell id — and this expression
  * reproduces that too. A null embedding COLUMN takes the same poison
  * route (every per-cell score is null under the greatest form, so it
  * also lands on the largest id): the expression is non-nullable and
  * returns maxId, keeping the two forms bit-identical on EVERY input,
  * not just the non-null ones today's corpora happen to carry.
  *
  * Why it exists: the `greatest` chain materializes one dot-struct
  * subtree PER CELL, so the expression tree — and with it analysis,
  * optimizer passes (the "Max iterations reached" warning at ~160
  * cells), and codegen size — grows linearly with the codebook. At
  * the SemDeDup operating point (cells ∝ √corpus) a large corpus
  * wants thousands of cells, where the composed form spends more time
  * compiling the plan than routing the data. This expression is
  * O(1) in plan size at any codebook size: the matrix rides along as
  * a flattened `float[]` reference object and the generated code is
  * one cache-friendly cell-major loop. */
final case class CellRoute(child: Expression, ids: Seq[Int],
    centroids: Seq[Seq[Float]]) extends UnaryExpression {

  require(ids.nonEmpty && ids.length == centroids.length,
    s"cell_route: ${ids.length} ids vs ${centroids.length} centroids")
  require(centroids.forall(_.length == centroids.head.length),
    "cell_route: centroids must share one dimensionality")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cell_route requires array<float>, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "cell_route"

  /** Codebook dimensionality (all centroids share it). */
  val dim: Int = centroids.head.length
  /** Flattened cell-major matrix [c * dim + i] — the inner element
    * loop walks contiguous memory. Public for the generated code. */
  @transient lazy val matrix: Array[Float] = {
    val m = new Array[Float](ids.length * dim)
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      var i = 0
      while (i < dim) { m(c * dim + i) = cen(i); i += 1 }
      c += 1
    }
    m
  }
  /** Cell ids, index-aligned with [[matrix]]. Public for codegen. */
  @transient lazy val cellIds: Array[Int] = ids.toArray
  /** max id — the null poison route (element OR column, class doc). */
  @transient private lazy val maxId: Int = ids.max

  override def nullable: Boolean = false

  /** One row: route. Shared verbatim by interpreted eval and (via a
    * reference-object call) generated code — one source of truth for
    * the fold order and tie rule. A null input takes the null-poison
    * route (class doc): the composed greatest-of-structs form scores
    * every cell null and falls through to the largest-id tiebreak. */
  def route(x: ArrayData): Int = {
    if (x == null) return maxId
    val n = math.min(x.numElements(), dim)
    var i = 0
    while (i < n) { // element-null poison: all scores null -> max id
      if (x.isNullAt(i)) return maxId
      i += 1
    }
    var bestScore = 0.0
    var bestId = 0
    var first = true
    var c = 0
    while (c < cellIds.length) {
      var acc = 0.0
      val base = c * dim
      var j = 0
      while (j < n) {
        acc += x.getFloat(j).toDouble * matrix(base + j).toDouble
        j += 1
      }
      val id = cellIds(c)
      // Spark's nan-safe double ordering (NaN greatest, -0.0 == 0.0 —
      // java.lang.Double.compare alone would order -0.0 < 0.0), ties
      // to the larger id: the greatest(struct(score, id)) rule
      val cmp =
        if (acc < bestScore) -1
        else if (acc > bestScore) 1
        else if (acc == bestScore) 0
        else java.lang.Double.compare(acc, bestScore) // NaN branch
      if (first || cmp > 0 || (cmp == 0 && id > bestId)) {
        bestScore = acc; bestId = id; first = false
      }
      c += 1
    }
    bestId
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    route(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the expression instance rides along; one virtual call per row
    // into the same route() the interpreted path runs — the loop is
    // monomorphic and JIT-compiles tight, and the generated method
    // stays O(1) in codebook size. Hand-rolled (not nullSafeCodeGen):
    // a null child VALUE routes to maxId instead of propagating null,
    // so the output is never null.
    val self = ctx.addReferenceObj("cellRoute", this,
      classOf[CellRoute].getName)
    val c = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    ev.copy(
      code = c.code + code"""
        int ${ev.value} = $self.route(${c.isNull} ? null : ${c.value});
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CellRoute =
    copy(child = newChild)
}

object CellRoute {
  /** Codebook size above which [[graft.ops.Similarity]] switches from
    * the composed greatest-of-structs form (whole-stage-codegen'd,
    * plan-size ∝ cells) to this expression (plan-size O(1)). The
    * registered queries' 16-cell default stays on the composed form;
    * the crossover is well before the optimizer-iteration blowup
    * observed at ~160 cells. */
  val MaxExprCells = 64

  /** Column-level entry point. Centroids are float-downcast here —
    * the routing representation, same as the composed form. */
  def apply(e: Column, cells: Seq[(Int, Seq[Double])]): Column =
    ColumnBridge.column(CellRoute(ColumnBridge.expression(e),
      cells.map(_._1), cells.map(_._2.map(_.toFloat))))
}
