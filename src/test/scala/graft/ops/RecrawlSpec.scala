package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** X92 gates: the tier/interval/date chain on planted version
  * histories the 3-version fixture cannot produce (warm rates,
  * multi-change runs, null transitions), plus the fixture-level
  * structural contract. */
class RecrawlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** obs rows: (id, dt, name, city, bal, v, batch day-of-July). */
  private def sched(rows: Seq[(Int, String, String, String,
      java.lang.Double, Int, Int)]) = {
    val obs = rows
      .toDF("id", "dt", "name", "city", "bal", "v", "day")
      .withColumn("batch_dt",
        to_date(format_string("2024-07-%02d", col("day"))))
      .drop("day")
    Ingest.recrawlScheduleFrom(obs).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5), r.getLong(6),
        r.getString(7), r.getString(8)))).toMap
  }

  test("tiers: volatile=hot, rare-change=warm, static/new=cold") {
    val n = null.asInstanceOf[java.lang.Double]
    val rows =
      // id 1: changes at every one of 4 transitions → rate 1.0, hot
      (1 to 5).map(v => (1, "d", s"n$v", "c", Double.box(1.0), v, v)) ++
      // id 2: one change (v1→v2) in 4 transitions → rate 0.25, warm
      Seq((2, "d", "a", "c", Double.box(1.0), 1, 1),
        (2, "d", "b", "c", Double.box(1.0), 2, 2),
        (2, "d", "b", "c", Double.box(1.0), 3, 3),
        (2, "d", "b", "c", Double.box(1.0), 4, 4),
        (2, "d", "b", "c", Double.box(1.0), 5, 5)) ++
      // id 3: never changes → cold
      (1 to 5).map(v => (3, "d", "s", "c", Double.box(2.0), v, v)) ++
      // id 4: first seen at v5 → single obs, cold
      Seq((4, "d", "x", "c", Double.box(9.0), 5, 5)) ++
      // id 5: null→null is NOT a change, null→value IS
      Seq((5, "d", "x", "c", n, 1, 1),
        (5, "d", "x", "c", n, 2, 2),
        (5, "d", "x", "c", Double.box(3.0), 3, 3))
    val got = sched(rows)

    val (o1, c1, r1, t1, i1, le1, nf1) = got(1)
    assert((o1, c1, r1, t1, i1) == ((5L, 4L, 1.0, "hot", 1L)))
    assert(le1 == "2024-07-05" && nf1 == "2024-07-06")

    val (o2, c2, r2, t2, i2, le2, nf2) = got(2)
    assert((o2, c2, r2, t2, i2) == ((5L, 1L, 0.25, "warm", 7L)))
    assert(le2 == "2024-07-02" && nf2 == "2024-07-09",
      "last event is the CHANGE date, not the latest sighting")

    val (o3, c3, r3, t3, i3, le3, nf3) = got(3)
    assert((o3, c3, r3, t3, i3) == ((5L, 0L, 0.0, "cold", 30L)))
    assert(le3 == "2024-07-01" && nf3 == "2024-07-31",
      "a static page's clock starts at first sighting")

    val (o4, _, r4, t4, _, le4, _) = got(4)
    assert(o4 == 1L && r4 == 0.0 && t4 == "cold" && le4 == "2024-07-05")

    val (_, c5, _, _, _, le5, _) = got(5)
    assert(c5 == 1L, "null→null must not count; null→3.0 must")
    assert(le5 == "2024-07-03")
  }

  test("date arithmetic crosses month boundaries by whole days") {
    val rows = Seq((9, "d", "x", "c", Double.box(1.0), 1, 30))
    val (_, _, _, tier, _, le, nf) = sched(rows)(9)
    assert(tier == "cold" && le == "2024-07-30" && nf == "2024-08-29")
  }

  test("fixture lake: r2-corrected keys run hot, untouched keys cold") {
    val got = Ingest.ingestRecrawlSchedule(spark, "/root/testdata/sf0.001")
      .collect()
    assert(got.nonEmpty)
    val tiers = got.map(_.getString(5)).toSet
    // three versions → rates 0 or 1/2 only: hot and cold, never warm
    assert(tiers == Set("hot", "cold"))
    got.foreach { r =>
      val obs = r.getLong(2); val ch = r.getLong(3)
      assert(ch <= obs - 1, s"changes bounded by transitions: $r")
      // new-dt (06-29) keys were seen once and must be cold
      if (r.getString(1) == "2024-06-29")
        assert(r.getString(5) == "cold" && obs == 1L)
    }
  }
}
