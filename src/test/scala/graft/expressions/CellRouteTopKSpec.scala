package graft.expressions

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[CellRouteTopK]] must reproduce the oracle `route` CTE's ranking
  * exactly — per-cell FloatDot score, `(score DESC, cell DESC)` order
  * — and its element 1 must equal [[CellRoute]]'s argmax on every
  * input, so semdedup_probe's oracle (crn ≤ k over the shared route
  * CTE) stays valid at any codebook size. The reference here is the
  * explode-codebook + per-vector rank WINDOW formulation, rebuilt
  * from public pieces. */
class CellRouteTopKSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val emb = graft.util.Tables.t(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private lazy val realVecs: Seq[Seq[Double]] = {
    import spark.implicits._
    emb.orderBy("vec_id").limit(200)
      .select(col("embedding")).as[Seq[Float]].collect()
      .map(_.map(_.toDouble)).toSeq
  }

  /** The window reference: explode the codebook, score with the same
    * FloatDot fold, rank by (score desc, cell desc), keep crn ≤ k. */
  private def windowTopK(cells: Seq[(Int, Seq[Double])], k: Int) = {
    val cellLit = typedLit(cells.map { case (id, c) =>
      (id, c.map(_.toFloat)) })
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("s").desc, col("cell").desc)
    emb.select(col("vec_id"), col("embedding"),
        explode(cellLit).as("c"))
      .select(col("vec_id"), col("c._1").as("cell"),
        graft.ops.Similarity.dot(col("embedding"),
          col("c._2")).as("s"))
      .withColumn("crn", row_number().over(w))
      .filter(col("crn") <= k)
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(
        struct(col("crn"), col("cell")))).as("r"))
      .select(col("vec_id"),
        expr("transform(r, x -> x.cell)").as("cells"))
  }

  test("fused top-k == window-ranked top-k at codebook sizes spanning the CellRoute crossover") {
    import spark.implicits._
    for (n <- Seq(3, 16, 70); k <- Seq(1, 2, 3)) {
      val cells = realVecs.take(n).zipWithIndex
        .map { case (v, i) => (i * 3 + 1, v) }
      val fused = emb.select(col("vec_id"),
          CellRouteTopK(col("embedding"), cells, k).as("cells"))
        .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
      val ref = windowTopK(cells, k)
        .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
      assert(fused == ref, s"divergence at n=$n k=$k")
    }
  }

  test("element 1 equals CellRoute's argmax on the full corpus") {
    import spark.implicits._
    val cells = realVecs.take(40).zipWithIndex.map { case (v, i) => (i, v) }
    val got = emb.select(col("vec_id"),
        element_at(CellRouteTopK(col("embedding"), cells, 2), 1).as("c"),
        CellRoute(col("embedding"), cells).as("r"))
      .as[(Long, Int, Int)].collect()
    assert(got.forall(r => r._2 == r._3))
  }

  test("null column / null element take the poison route: k largest ids, descending") {
    val schema = StructType(Seq(StructField("embedding",
      ArrayType(FloatType, containsNull = true), nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(null),
      Row(Seq[java.lang.Float](1.0f, null, 2.0f)))
    val df = spark.createDataFrame(rows, schema)
    val cells = Seq((3, Seq(1.0, 1.0, 1.0)), (11, Seq(2.0, 0.5, 1.0)),
      (7, Seq(0.0, 1.0, 0.0)))
    import spark.implicits._
    val got = df.select(
        CellRouteTopK(col("embedding"), cells, 2).as("c"))
      .as[Seq[Int]].collect().toSeq
    assert(got == Seq(Seq(11, 7), Seq(11, 7)))
  }

  test("k larger than the codebook returns every cell, ranked") {
    import spark.implicits._
    val cells = realVecs.take(3).zipWithIndex.map { case (v, i) => (i, v) }
    val got = emb.limit(20).select(
        CellRouteTopK(col("embedding"), cells, 10).as("c"))
      .as[Seq[Int]].collect()
    assert(got.forall(c => c.length == 3 && c.toSet == Set(0, 1, 2)))
  }
}
