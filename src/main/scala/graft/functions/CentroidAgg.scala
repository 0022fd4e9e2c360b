package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** X17 — custom typed aggregate (SURVEY.md §2.8/§4.3): element-wise
  * centroid of embedding vectors, via the Catalyst `Aggregator` surface
  * registered through `functions.udaf`.
  *
  * Partial-merge friendly by construction: `reduce` accumulates into a
  * per-partition buffer, `merge` combines partition buffers — the
  * physical plan is a partial+final ObjectHashAggregate, no driver
  * materialization of vectors. */
final case class CentroidBuf(var sum: Array[Double], var n: Long)

/** Input/output are primitive arrays, not `Seq`: the `Array[Float]`
  * ExpressionEncoder deserializes each row with one bulk
  * `UnsafeArrayData.toFloatArray` copy, where a `Seq[Float]` encoder
  * builds a boxed wrapper per row — measurably slower across a
  * whole-corpus aggregation (the round-3→4 `centroid_udaf` shave). */
class CentroidAgg(dim: Int)
    extends Aggregator[Array[Float], CentroidBuf, Array[Double]] {

  override def zero: CentroidBuf = CentroidBuf(Array.fill(dim)(0.0), 0L)

  override def reduce(b: CentroidBuf, a: Array[Float]): CentroidBuf = {
    if (a != null) {
      val m = math.min(dim, a.length)
      var i = 0
      while (i < m) { b.sum(i) += a(i); i += 1 }
      b.n += 1
    }
    b
  }

  override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
    var i = 0
    while (i < dim) { x.sum(i) += y.sum(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(b: CentroidBuf): Array[Double] =
    if (b.n == 0) Array.empty else b.sum.map(_ / b.n)

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}

object CentroidAgg {
  /** Column function: `centroid(embeddingCol)`. */
  def centroid(dim: Int): Column => Column = {
    val fn = udaf(new CentroidAgg(dim), ExpressionEncoder[Array[Float]]())
    c => fn(c)
  }
}
