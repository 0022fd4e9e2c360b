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

  test("eventPaths: per-user triples, ts+id tiebreak, top-k order (X107)") {
    import spark.implicits._
    def ts(s: Int) = java.sql.Timestamp.valueOf(f"2024-06-01 10:00:$s%02d")
    // user 1 walks a>b>c>b (paths a>b>c, b>c>b); user 2 walks a>b>c
    // (a>b>c again); user 3's SIMULTANEOUS events break ties by
    // event_id: x(7) then y(8) then z(9) → x>y>z only
    val events = Seq(
      (1L, ts(1), 10L, "a"), (1L, ts(2), 11L, "b"),
      (1L, ts(3), 12L, "c"), (1L, ts(4), 13L, "b"),
      (2L, ts(1), 20L, "a"), (2L, ts(2), 21L, "b"),
      (2L, ts(3), 22L, "c"),
      (3L, ts(5), 7L, "x"), (3L, ts(5), 8L, "y"), (3L, ts(5), 9L, "z"),
      // a two-event user contributes no triple
      (4L, ts(1), 30L, "a"), (4L, ts(2), 31L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.eventPathsFrom(events)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a > b > c", 2L), ("b > c > b", 1L),
      ("x > y > z", 1L)), got)
  }
}
