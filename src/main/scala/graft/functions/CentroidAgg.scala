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

  /** Column function: `centroidQ(embeddingCol)` — the gate-exact
    * fixed-point variant ([[QuantizedCentroidAgg]]). */
  def centroidQ(dim: Int, scale: Long = QuantizedCentroidAgg.Scale)
      : Column => Column = {
    val fn = udaf(new QuantizedCentroidAgg(dim, scale),
      ExpressionEncoder[Array[Float]]())
    c => fn(c)
  }
}

final case class QCentroidBuf(var sum: Array[Long], var n: Long)

/** Order-independent (bit-exact) centroid: each element is quantized to
  * a fixed-point long `floor(x.toDouble * scale)` BEFORE summation, so
  * the aggregate state is integer and the result is invariant to task
  * and merge order — unlike [[CentroidAgg]]'s double accumulation,
  * whose final ulps depend on partition order. floor (never round) of
  * an IEEE double product is bit-deterministic across engines, which is
  * what lets the DuckDB gate recompute this aggregate exactly:
  * `CAST(floor(CAST(x AS DOUBLE) * scale) AS BIGINT)` summed per
  * (group, dim), then `CAST(s AS DOUBLE) / scale / n` — the identical
  * multiply/floor/divide chain, hence identical doubles.
  *
  * Cost of exactness: the mean is of the quantized values, biased low
  * by < 1/scale per element (1e-9 at the default — far below float
  * input precision, asserted ≤ 5e-7 of the double path in
  * SimilaritySpec). Overflow headroom: |sum| < scale · Σ|x|, so with
  * unit-normed embeddings a single group can absorb ~9e9 rows before
  * nearing 2^63 — raise to a wider scale only with a narrower corpus.
  * Same partial+final ObjectHashAggregate shape as [[CentroidAgg]]. */
class QuantizedCentroidAgg(dim: Int, scale: Long)
    extends Aggregator[Array[Float], QCentroidBuf, Array[Double]] {

  private val scaleD = scale.toDouble

  override def zero: QCentroidBuf = QCentroidBuf(Array.fill(dim)(0L), 0L)

  override def reduce(b: QCentroidBuf, a: Array[Float]): QCentroidBuf = {
    if (a != null) {
      val m = math.min(dim, a.length)
      var i = 0
      while (i < m) {
        b.sum(i) += math.floor(a(i).toDouble * scaleD).toLong
        i += 1
      }
      b.n += 1
    }
    b
  }

  override def merge(x: QCentroidBuf, y: QCentroidBuf): QCentroidBuf = {
    var i = 0
    while (i < dim) { x.sum(i) += y.sum(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(b: QCentroidBuf): Array[Double] =
    if (b.n == 0) Array.empty
    else b.sum.map(s => s.toDouble / scaleD / b.n)

  override def bufferEncoder: Encoder[QCentroidBuf] = Encoders.product
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}

object QuantizedCentroidAgg {
  /** Default fixed-point scale: nano precision — far below float input
    * precision, ~9e9-row per-group overflow headroom (scaladoc above). */
  val Scale: Long = 1000000000L
}
