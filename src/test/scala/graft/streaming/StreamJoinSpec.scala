package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

final case class AEv(ts: Timestamp, event_id: Long, user_id: Long,
    event_type: String, value: Double)

class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String): Timestamp =
    Timestamp.from(java.time.Instant.parse(s))

  private val evs = Seq(
    AEv(ts("2024-01-01T10:00:00Z"), 1, 7, "click", 0.0),
    AEv(ts("2024-01-01T10:04:00Z"), 2, 7, "view", 1.5), // within 10m of click 1
    AEv(ts("2024-01-01T10:15:00Z"), 3, 7, "view", 2.5), // outside 10m
    AEv(ts("2024-01-01T10:05:00Z"), 4, 8, "view", 3.0), // other user, no click
    AEv(ts("2024-01-01T11:00:00Z"), 5, 8, "click", 0.0),
    AEv(ts("2024-01-01T11:01:00Z"), 6, 8, "view", 4.0), // within 10m of click 5
    AEv(ts("2024-01-01T09:59:00Z"), 7, 7, "view", 5.0)) // BEFORE click 1

  test("stream-stream interval join == batch twin on identical input") {
    import spark.implicits._
    val input = MemoryStream[AEv](spark)
    val q = StreamingOps.clickViewAttribution(input.toDF())
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      input.addData(evs)
      q.processAllAvailable()
      val streamed = spark.table("attrib")
        .select("user_id", "click_id", "view_id", "lag_us", "view_value")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      val batch = StreamingOps.clickViewAttribution(evs.toDF())
        .select("user_id", "click_id", "view_id", "lag_us", "view_value")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(streamed == batch)
      // exactly the two in-window pairs; nothing before the click or
      // past the lag bound
      assert(batch == Set(
        (7L, 1L, 2L, 240000000L, 1.5),
        (8L, 5L, 6L, 60000000L, 4.0)))
    } finally q.stop()
  }

  test("join state is watermark-bounded (plan carries both watermarks)") {
    import spark.implicits._
    val input = MemoryStream[AEv](spark)
    val df = StreamingOps.clickViewAttribution(input.toDF())
    // both sides must carry event-time watermarks or the stream-stream
    // join would buffer forever; assert they survive into the plan
    val wm = df.queryExecution.analyzed.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
    }
    assert(wm.size == 2, df.queryExecution.analyzed.toString)
  }
}
