package graft.expressions

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[CellRoute]] (the O(1)-plan-size fused routing loop for large
  * codebooks) must be BIT-IDENTICAL to the composed
  * `greatest(struct(float_dot(e, c), id), …).getField("cell")` form it
  * replaces past [[CellRoute.MaxExprCells]] cells — same fold order,
  * same nan-safe comparison, same larger-id tiebreak, same
  * element-null poison route. These tests pin that equivalence on the
  * real embedding corpus at codebook sizes spanning the crossover, so
  * the IVF/semdedup oracles (which replay the composed form's
  * semantics in DuckDB) stay valid when the engine switches paths. */
class CellRouteSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** The small-codebook form, rebuilt from public pieces. */
  private def composed(cells: Seq[(Int, Seq[Double])], e: Column): Column =
    greatest(cells.map { case (id, c) =>
      struct(
        graft.ops.Similarity.dot(e, typedLit(c.map(_.toFloat))).as("score"),
        lit(id).as("cell"))
    }: _*).getField("cell")

  private lazy val emb = graft.util.Tables.t(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private lazy val realVecs: Seq[Seq[Double]] = {
    import spark.implicits._
    emb.orderBy("vec_id").limit(200)
      .select(col("embedding")).as[Seq[Float]].collect()
      .map(_.map(_.toDouble)).toSeq
  }

  test("fused route == composed route at codebook sizes spanning the crossover") {
    import spark.implicits._
    // centroids are real vectors (the hardest tie/precision regime:
    // each one routes to itself with competitors at genuine margins);
    // ids deliberately non-contiguous
    for (n <- Seq(2, CellRoute.MaxExprCells, CellRoute.MaxExprCells + 1, 163)) {
      val cells = realVecs.take(n).zipWithIndex
        .map { case (v, i) => (i * 3 + 1, v) }
      val fused = emb.select(col("vec_id"),
          CellRoute(col("embedding"), cells).as("c"))
        .as[(Long, Int)].collect().sorted.toSeq
      val comp = emb.select(col("vec_id"),
          composed(cells, col("embedding")).as("c"))
        .as[(Long, Int)].collect().sorted.toSeq
      assert(fused == comp, s"divergence at $n cells")
      assert(fused.map(_._2).distinct.size > 1, s"degenerate routing at $n")
    }
  }

  test("score ties route to the larger cell id, matching the composed form") {
    import spark.implicits._
    // two cells share one centroid: every vector ties between them
    val c = realVecs.head
    val cells = Seq((5, c), (9, c))
    val got = emb.limit(20).select(
        CellRoute(col("embedding"), cells).as("c"),
        composed(cells, col("embedding")).as("g"))
      .as[(Int, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (f, g) => assert(f == 9 && g == 9) }
  }

  test("a null element poisons every score and routes to the max cell id") {
    val schema = StructType(Seq(StructField("embedding",
      ArrayType(FloatType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      Row(Seq[java.lang.Float](1.0f, null, 2.0f)))
    val df = spark.createDataFrame(rows, schema)
    val cells = Seq((3, Seq(1.0, 1.0, 1.0)), (11, Seq(2.0, 0.5, 1.0)),
      (7, Seq(0.0, 1.0, 0.0)))
    val got = df.select(
      CellRoute(col("embedding"), cells).as("c"),
      composed(cells, col("embedding")).as("g")).head()
    assert(got.getInt(0) == 11 && got.getInt(1) == 11)
  }

  test("a null embedding COLUMN routes to the max cell id, matching the composed form") {
    // ADVICE r10: the composed greatest-of-structs form scores every
    // cell null on a null input column and falls through to the
    // largest-id tiebreak; CellRoute must take the same poison route
    // (and be non-null doing it) so behavior cannot depend on whether
    // the codebook size crosses MaxExprCells.
    val schema = StructType(Seq(StructField("embedding",
      ArrayType(FloatType, containsNull = true), nullable = true)))
    val rows = java.util.Arrays.asList(Row(null))
    val df = spark.createDataFrame(rows, schema)
    val cells = Seq((3, Seq(1.0, 1.0, 1.0)), (11, Seq(2.0, 0.5, 1.0)),
      (7, Seq(0.0, 1.0, 0.0)))
    val got = df.select(
      CellRoute(col("embedding"), cells).as("c"),
      composed(cells, col("embedding")).as("g")).head()
    assert(!got.isNullAt(0) && got.getInt(0) == 11 && got.getInt(1) == 11)
  }

  test("interpreted eval matches the planned (codegen) path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import spark.implicits._
    val cells = realVecs.take(70).zipWithIndex.map { case (v, i) => (i, v) }
    val planned = emb.orderBy("vec_id").limit(50)
      .select(col("vec_id"), CellRoute(col("embedding"), cells).as("c"))
      .as[(Long, Int)].collect().toSeq
    val vecs = emb.orderBy("vec_id").limit(50)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val interpreted = vecs.map { case (id, e) =>
      (id, CellRoute(Literal.create(e, ArrayType(FloatType)),
        cells.map(_._1), cells.map(_._2.map(_.toFloat)))
        .eval().asInstanceOf[Int])
    }
    assert(planned == interpreted)
  }
}
