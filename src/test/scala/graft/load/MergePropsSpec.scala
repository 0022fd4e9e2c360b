package graft.load

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** ScalaCheck-generated properties for the Delta-free merge
  * (SURVEY.md §5.2.3): idempotence, reference MERGE equivalence.
  * (Raw Gen sampling with fixed seeds — the scalatest/scalacheck bridge
  * artifact isn't in the offline cache.) */
class MergePropsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val genRows: Gen[List[(Int, String, String)]] = Gen.listOfN(8,
    for {
      id <- Gen.choose(0, 5)
      v <- Gen.identifier.map(_.take(3))
      dt <- Gen.oneOf("d1", "d2")
    } yield (id, v, dt))

  // One row per merge key (PK+dt): MERGE semantics assume the source
  // batch is key-unique (Delta errors on multiple matches otherwise).
  private def uniq(rows: List[(Int, String, String)]) =
    rows.groupBy(r => (r._1, r._3)).map(_._2.head).toList

  private def sample(seed: Long): (List[(Int, String, String)], List[(Int, String, String)]) = {
    def draw(s: Long) = uniq(genRows.pureApply(Gen.Parameters.default, Seed(s)))
    (draw(seed), draw(seed + 1000))
  }

  private def df(rows: List[(Int, String, String)]): DataFrame =
    rows.toDF("id", "v", "dt")

  private def read(p: String): Set[(Int, String, String)] =
    Strategies.readCurated(spark, p)
      .select("id", "v", "dt").as[(Int, String, String)].collect().toSet

  private def freshTarget(rows: List[(Int, String, String)]): String = {
    val p = Files.createTempDirectory("graft-merge").toString + "/t"
    Strategies.writeCurated(spark, df(rows), p, "overwrite", Nil)
    p
  }

  test("property: merge is idempotent — re-applying the same source is a no-op") {
    for (seed <- 1L to 5L) {
      val (t, s) = sample(seed)
      val p = freshTarget(t)
      Strategies.writeCurated(spark, df(s), p, "upsert", Seq("id"))
      val once = read(p)
      Strategies.writeCurated(spark, df(s), p, "upsert", Seq("id"))
      assert(read(p) == once, s"seed=$seed t=$t s=$s")
    }
  }

  test("property: merge == reference MERGE semantics (anti ∪ source)") {
    for (seed <- 11L to 15L) {
      val (t, s) = sample(seed)
      val p = freshTarget(t)
      Strategies.writeCurated(spark, df(s), p, "upsert", Seq("id"))
      val srcKeys = s.map(r => (r._1, r._3)).toSet
      val expected = // whenMatchedUpdateAll + whenNotMatchedInsertAll
        t.filterNot(r => srcKeys((r._1, r._3))).toSet ++ s.toSet
      assert(read(p) == expected, s"seed=$seed t=$t s=$s")
    }
  }
}
