package graft.util

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SkewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("salted join == plain join on skewed keys") {
    import spark.implicits._
    // 90% of the big side lands on one hot key
    val big = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i =>
      (1L + i % 7, i))).toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (8L, "unused"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val salted = Skew.saltedJoin(big, small, Seq("k"), nSalts = 8)
      .select("k", "v", "name")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted == plain && plain.nonEmpty)
  }

  test("two-phase salted aggregation == direct aggregation") {
    import spark.implicits._
    val df = ((1 to 1000).map(i => (1L, i.toLong)) ++ (1 to 50).map(i =>
      (2L, i.toLong))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSet
    val salted = Skew.saltedAgg(df, Seq("k"), nSalts = 8,
        partialAggs = Seq(sum("v").as("s"), count(lit(1)).as("n")),
        finalAggs = Seq(sum("s").as("s"), sum("n").as("n")))
      .as[(Long, Long, Long)].collect().toSet
    assert(salted == direct)
  }
}
