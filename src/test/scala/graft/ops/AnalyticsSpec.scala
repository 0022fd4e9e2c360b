package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class AnalyticsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("approx_count_distinct tracks exact distinct within rsd (X7 scale path)") {
    val orders = graft.util.Tables.t(spark, "/root/testdata/sf0.01", "orders")
    val row = orders.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), rsd = 0.05).as("approx"))
      .head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }

  test("exceptAll is multiset difference, not set difference (X11)") {
    import spark.implicits._
    val a = Seq(1, 1, 1, 2, 3).toDF("v")
    val b = Seq(1, 2).toDF("v")
    val got = a.exceptAll(b).as[Int].collect().sorted.toSeq
    assert(got == Seq(1, 1, 3)) // 1 kept twice: 3 copies minus 1
  }

  test("grouping sets emits exactly the requested sets, no grand total (X8)") {
    import spark.implicits._
    val df = Seq(("O", "HIGH"), ("O", "LOW"), ("F", "HIGH")).toDF("s", "p")
    val out = df.groupingSets(Seq(Seq(col("s")), Seq(col("p"))),
        col("s"), col("p"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2)))
      .toSet
    assert(out == Set(
      (Some("O"), None, 2L), (Some("F"), None, 1L),   // by status
      (None, Some("HIGH"), 2L), (None, Some("LOW"), 1L))) // by priority
  }
}
