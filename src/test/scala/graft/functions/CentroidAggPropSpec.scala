package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generated properties for [[QuantizedCentroidAgg]] — the
  * round-9 fixed-point centroid whose gate oracle rests entirely on
  * ORDER-INVARIANCE: whatever partitioning and merge tree Spark picks,
  * the integer state must produce bit-identical doubles. These
  * properties pin that claim at the unit level (pure aggregator calls,
  * no Spark), including the adversarial shapes a cluster produces:
  * arbitrary splits, arbitrary merge order, empty partitions, null
  * rows. (Raw Gen sampling with fixed seeds — the
  * scalatest/scalacheck bridge artifact isn't in the offline cache.) */
class CentroidAggPropSpec extends AnyFunSuite {

  private val dim = 8
  private val agg = new QuantizedCentroidAgg(dim,
    QuantizedCentroidAgg.Scale)

  private val genVec: Gen[Array[Float]] =
    Gen.listOfN(dim, Gen.chooseNum(-1e3f, 1e3f)).map(_.toArray)

  // up to 40 rows with occasional nulls (null array rows are skipped
  // by reduce, like Spark feeds them)
  private val genRows: Gen[List[Array[Float]]] = Gen.listOfN(40,
    Gen.frequency(9 -> genVec, 1 -> Gen.const(null: Array[Float])))

  private def sample[A](g: Gen[List[A]], seed: Long): List[A] =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Fold a row slice into a fresh buffer. */
  private def bufOf(rows: Seq[Array[Float]]): QCentroidBuf =
    rows.foldLeft(agg.zero)(agg.reduce)

  /** Split rows at the given cut points and merge the partition
    * buffers in the given order. */
  private def viaPartitions(rows: List[Array[Float]],
      cuts: List[Int], mergeOrder: Seq[Int]): Array[Double] = {
    val parts: Vector[Seq[Array[Float]]] = {
      val sorted = (0 :: rows.length :: cuts.map(c =>
        math.min(rows.length, math.max(0, c)))).distinct.sorted
      sorted.zip(sorted.tail).map { case (a, b) => rows.slice(a, b) }
        .toVector
    }
    val bufs = parts.map(bufOf)
    val order =
      if (bufs.isEmpty) Seq.empty
      else mergeOrder.map(i => math.abs(i) % bufs.length).distinct ++
        bufs.indices
    val merged = order.distinct.map(bufs).reduceLeft(agg.merge)
    agg.finish(merged)
  }

  /** Split rows at the given cut points and combine the partition
    * buffers by RANDOM ADJACENT PAIR-MERGES — a full merge TREE (e.g.
    * merge(merge(b2,b3), merge(b0,b1))), the shape a cluster's
    * partial/final aggregation actually produces, which the
    * left-linear [[viaPartitions]] fold never exercises. The pairing
    * order (and per-step argument order) is driven by the seeded
    * stream, so 60 seeds cover many distinct tree shapes. */
  private def viaMergeTree(rows: List[Array[Float]],
      cuts: List[Int], seed: Long): Array[Double] = {
    val parts: Vector[Seq[Array[Float]]] = {
      val sorted = (0 :: rows.length :: cuts.map(c =>
        math.min(rows.length, math.max(0, c)))).distinct.sorted
      sorted.zip(sorted.tail).map { case (a, b) => rows.slice(a, b) }
        .toVector
    }
    val rnd = new scala.util.Random(seed)
    var bufs = parts.map(bufOf)
    while (bufs.length > 1) {
      val j = rnd.nextInt(bufs.length - 1)
      val merged =
        if (rnd.nextBoolean()) agg.merge(bufs(j), bufs(j + 1))
        else agg.merge(bufs(j + 1), bufs(j))
      bufs = (bufs.take(j) :+ merged) ++ bufs.drop(j + 2)
    }
    agg.finish(bufs.headOption.getOrElse(agg.zero))
  }

  test("quantized centroid is bit-identical under any split and merge order") {
    (1L to 60L).foreach { seed =>
      val rows = sample(genRows, seed)
      val single = agg.finish(bufOf(rows))
      val cuts = sample(Gen.listOfN(4, Gen.choose(0, rows.length)),
        seed + 1000)
      val order = sample(Gen.listOfN(6, Gen.choose(0, 10)), seed + 2000)
      val split = viaPartitions(rows, cuts, order)
      val tree = viaMergeTree(rows, cuts, seed + 3000)
      assert(single.length == split.length, s"seed $seed: length")
      assert(single.length == tree.length, s"seed $seed: tree length")
      single.zip(split).zipWithIndex.foreach { case ((a, b), i) =>
        assert(java.lang.Double.doubleToLongBits(a) ==
          java.lang.Double.doubleToLongBits(b),
          s"seed $seed dim $i: $a vs $b (must be bit-identical)")
      }
      single.zip(tree).zipWithIndex.foreach { case ((a, b), i) =>
        assert(java.lang.Double.doubleToLongBits(a) ==
          java.lang.Double.doubleToLongBits(b),
          s"seed $seed dim $i (merge tree): $a vs $b " +
            "(must be bit-identical)")
      }
    }
  }

  test("quantized centroid matches the oracle's arithmetic chain exactly") {
    (1L to 30L).foreach { seed =>
      val rows = sample(genRows, seed).filter(_ != null)
      val got = agg.finish(bufOf(rows))
      if (rows.isEmpty) assert(got.isEmpty)
      else {
        // the DuckDB chain: floor(double(x)*scale) summed as integers,
        // then sum.toDouble / scale / n — element for element
        val s = QuantizedCentroidAgg.Scale.toDouble
        (0 until dim).foreach { i =>
          val sum = rows.map(r => math.floor(r(i).toDouble * s).toLong).sum
          val want = sum.toDouble / s / rows.length
          assert(java.lang.Double.doubleToLongBits(got(i)) ==
            java.lang.Double.doubleToLongBits(want),
            s"seed $seed dim $i: ${got(i)} vs $want")
        }
      }
    }
  }

  test("double-path CentroidAgg stays within float precision of the quantized path") {
    // the two aggregators are documented siblings: same mean up to
    // quantization (1/scale per element) + double-sum rounding
    val da = new CentroidAgg(dim)
    (1L to 20L).foreach { seed =>
      val rows = sample(genRows, seed).filter(_ != null)
      if (rows.nonEmpty) {
        val q = agg.finish(bufOf(rows))
        val d = da.finish(rows.foldLeft(da.zero)(da.reduce))
        q.zip(d).zipWithIndex.foreach { case ((a, b), i) =>
          assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)),
            s"seed $seed dim $i: quantized $a vs double $b")
        }
      }
    }
  }
}
