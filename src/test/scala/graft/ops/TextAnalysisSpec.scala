package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class TextAnalysisSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("langId heuristic picks the language with most marker hits") {
    import spark.implicits._
    val markers = Map(
      "en" -> Seq("the", "and", "of"),
      "de" -> Seq("der", "und", "nicht"),
      "es" -> Seq("el", "los", "que"))
    val df = Seq(
      ("the cat and the dog", "en"),
      ("der hund und der berg nicht", "de"),
      ("el rio que los arboles", "es"),
      ("zzz qqq", "und")).toDF("text", "expected")
    val out = df.withColumn("got",
      TextAnalysis.langIdScore(col("text"), markers))
    assert(out.filter(col("got") =!= col("expected")).count() == 0)
  }

  test("near-dup pairs are symmetric-free and band counts bounded (X3)") {
    import spark.implicits._
    val pairs = Dedup.nearDupPairs(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    assert(pairs.forall { case (a, b, n) => a < b && n >= 4 && n <= 8 })
    // planted near-dups exist in the synthetic corpus
    assert(pairs.nonEmpty)
  }

  test("tokens splits on whitespace and drops empties") {
    import spark.implicits._
    val out = Seq("  Hello   world ").toDF("t")
      .select(TextAnalysis.tokens(col("t")).as("w"))
      .as[Seq[String]].head()
    assert(out == Seq("hello", "world"))
  }
}
