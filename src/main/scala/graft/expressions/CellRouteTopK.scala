package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: the TOP-K cell ids of an `array<float>`
  * embedding against a constant codebook — [[CellRoute]]'s argmax
  * generalized to a ranked prefix, for MULTI-PROBE listing (X61b
  * semdedup_probe): a vector is listed under its `k` best cells so a
  * near-dup pair straddling one cell boundary is still compared.
  *
  * Ranking is the oracle `route` CTE's exactly: per-cell score is the
  * sequential double fold over the float-downcast centroid
  * ([[FloatDot]] arithmetic), order is `(score DESC, cell DESC)` —
  * Spark's nan-safe double ordering with NaN greatest, score ties to
  * the LARGER cell id — so element 1 of the result is always
  * [[CellRoute]]'s argmax. A null input column or null element takes
  * the same poison route both forms share: every score is null, the
  * ordering falls through to `cell DESC`, and the result is the k
  * largest cell ids. Output is non-null.
  *
  * Why an expression and not a window: ranking via
  * `explode(codebook) → row_number over (vec)` shuffles n·cells rows
  * through a per-vector sort — quadratic once cells scale with the
  * corpus (the SemDeDup operating point). This is one fused loop per
  * row, O(1) plan size, no shuffle, and the listing fan-out is the
  * k rows the operator actually needs. */
final case class CellRouteTopK(child: Expression, ids: Seq[Int],
    centroids: Seq[Seq[Float]], k: Int) extends UnaryExpression {

  require(ids.nonEmpty && ids.length == centroids.length,
    s"cell_route_topk: ${ids.length} ids vs ${centroids.length} centroids")
  require(centroids.forall(_.length == centroids.head.length),
    "cell_route_topk: centroids must share one dimensionality")
  require(k >= 1, s"cell_route_topk: k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cell_route_topk requires array<float>, got $other")
  }
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cell_route_topk"

  val dim: Int = centroids.head.length
  /** Effective k (≤ codebook size). */
  val kEff: Int = math.min(k, ids.length)
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
  @transient lazy val cellIds: Array[Int] = ids.toArray
  @transient private lazy val poison: GenericArrayData =
    new GenericArrayData(
      ids.sorted(Ordering[Int].reverse).take(kEff).toArray)

  /** (score, id) descending comparison — greater-than under the
    * nan-safe double order (NaN greatest), ties to the larger id. */
  private def beats(s1: Double, id1: Int, s2: Double, id2: Int): Boolean = {
    val cmp =
      if (s1 < s2) -1
      else if (s1 > s2) 1
      else if (s1 == s2) 0
      else java.lang.Double.compare(s1, s2) // NaN branch
    cmp > 0 || (cmp == 0 && id1 > id2)
  }

  /** One row: the ranked top-k cell ids. Shared by interpreted eval
    * and generated code — one source of truth for fold order, tie
    * rule, and the poison route. */
  def routeTopK(x: ArrayData): ArrayData = {
    if (x == null) return poison
    val n = math.min(x.numElements(), dim)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return poison
      i += 1
    }
    // insertion top-k over (score, id) — k is tiny (2 in practice)
    val topS = new Array[Double](kEff)
    val topI = new Array[Int](kEff)
    var filled = 0
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
      if (filled < kEff || beats(acc, id, topS(filled - 1), topI(filled - 1))) {
        var pos = if (filled < kEff) filled else kEff - 1
        while (pos > 0 && beats(acc, id, topS(pos - 1), topI(pos - 1))) {
          topS(pos) = topS(pos - 1); topI(pos) = topI(pos - 1)
          pos -= 1
        }
        topS(pos) = acc; topI(pos) = id
        if (filled < kEff) filled += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topI, filled))
  }

  override def eval(input: InternalRow): Any =
    routeTopK(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cellRouteTopK", this,
      classOf[CellRouteTopK].getName)
    val c = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    ev.copy(
      code = c.code + code"""
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $self.routeTopK(${c.isNull} ? null : ${c.value});
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): CellRouteTopK = copy(child = newChild)
}

object CellRouteTopK {
  /** Column-level entry point; centroids float-downcast here (the
    * routing representation, as in [[CellRoute]]). */
  def apply(e: Column, cells: Seq[(Int, Seq[Double])], k: Int): Column =
    ColumnBridge.column(CellRouteTopK(ColumnBridge.expression(e),
      cells.map(_._1), cells.map(_._2.map(_.toFloat)), k))
}
