package graft.ops

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Robustness battery for the event-time family: NULL timestamps
  * (a dropped field upstream), epoch-zero and far-future outliers
  * (clock bugs), NaN values, duplicate event ids, and a single-event
  * user — through the window/session/funnel shapes. The contract:
  * no exception, and the accounting each operator implies holds —
  * Catalyst's TimeWindowing injects `ts IS NOT NULL`, so event-time
  * windows EXCLUDE null-ts rows (pinned here, not discovered in
  * production), while row-order windows keep them (nulls sort
  * first). */
class HostileEventsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val rows: Seq[(Long, Timestamp, Long, String, Double, String)] = Seq(
      (1L, null, 10L, "view", 1.0, "{}"),                       // null ts
      (2L, ts("1970-01-01 00:00:00"), 10L, "view", 2.0, "{}"),  // epoch 0
      (3L, ts("9999-12-31 23:59:59"), 10L, "buy", 3.0, "{}"),   // far future
      (4L, ts("2024-06-01 10:00:00"), 11L, "view", Double.NaN, "{}"),
      (5L, ts("2024-06-01 10:05:00"), 11L, "cart", 0.5, "{}"),
      (6L, ts("2024-06-01 11:30:00"), 11L, "buy", 0.25, "{}"),
      (7L, ts("2024-06-01 10:00:00"), 12L, "view", 1.0, null),  // null props
      (6L, ts("2024-06-01 12:00:00"), 12L, "view", 1.0, "{}"))  // dup id
    val fdir = s"target/tmp/hostile_events_${java.util.UUID.randomUUID}"
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$fdir/events.parquet")
    fdir
  }

  test("event-time windows exclude null-ts rows; row-order windows keep them") {
    import spark.implicits._
    val tumbled = Analytics.tumblingWindow(spark, dir)
    val counted = tumbled.select("n_events").as[Long].collect().sum
    assert(counted == 7L, s"tumbling counted $counted, expected 7 (8 - 1 null ts)")
    val slid = Analytics.slidingWindow(spark, dir)
      .select("n_events").as[Long].collect().sum
    assert(slid == 28L, s"sliding counted $slid, expected 7 * 4 hops")
    // row-order window: every row ranked, null ts sorts first
    val ranked = Analytics.windowEvents(spark, dir)
      .select("user_id", "rn", "event_id").as[(Long, Long, Long)].collect()
    assert(ranked.count(_._1 == 10L) == 3)
    assert(ranked.find(r => r._1 == 10L && r._2 == 1L).exists(_._3 == 1L),
      "null-ts event must rank first for its user")
  }

  test("sessionization and funnel survive the hostile rows") {
    import spark.implicits._
    val f = Analytics.funnel(spark, dir).collect()
    assert(f != null && f.nonEmpty)
    // NaN value must not poison decimal-accumulated sums for OTHER
    // groups: user 10's windows carry finite sums
    val sums = Analytics.tumblingWindow(spark, dir)
      .select("sum_value").as[Option[Double]].collect().flatten
    assert(sums.exists(v => !v.isNaN), "some finite window sum expected")
  }
}
