package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

final case class Ev(ts: Timestamp, user_id: Long, event_type: String,
    value: Double)

final case class DEv(ts: Timestamp, event_id: Long, user_id: Long)

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def ts(s: String): Timestamp =
    Timestamp.from(java.time.Instant.parse(s))

  private val batch1 = Seq(
    Ev(ts("2024-01-01T10:05:00Z"), 1, "click", 1.0),
    Ev(ts("2024-01-01T10:20:00Z"), 1, "click", 2.0),
    Ev(ts("2024-01-01T10:55:00Z"), 1, "view", 4.0),
    Ev(ts("2024-01-01T12:00:00Z"), 2, "click", 8.0),
    Ev(ts("2024-01-01T12:40:00Z"), 2, "view", 16.0))

  test("streaming tumbling window == batch tumbling window on same data") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    val q = StreamingOps.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumb")
      .outputMode("complete").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      val streamed = spark.table("tumb")
        .select("w_start_us", "event_type", "n_events", "sum_value")
        .as[(Long, String, Long, Double)].collect().toSet
      val batch = StreamingOps.tumblingCounts(batch1.toDF())
        .as[(Long, String, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dq window == batch dq window on same data") {
    import spark.implicits._
    // include actual violations so the parity is non-vacuous
    val dirty = batch1 ++ Seq(
      Ev(ts("2024-01-01T10:30:00Z"), 3, "bogus", 1.0),   // bad type
      Ev(ts("2024-01-01T12:10:00Z"), 3, "click", 0.0))   // non-positive
    val input = MemoryStream[Ev](spark)
    val q = StreamingOps.dqWindow(input.toDF())
      .writeStream.format("memory").queryName("dqw")
      .outputMode("complete").start()
    try {
      input.addData(dirty)
      q.processAllAvailable()
      val streamed = spark.table("dqw")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val batch = StreamingOps.dqWindow(dirty.toDF())
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      // the planted violations are counted in their windows
      assert(batch.exists(r => r._4 == 1L)) // bad type at 10:xx
      assert(batch.exists(r => r._3 == 1L)) // non-positive at 12:xx
    } finally q.stop()
  }

  test("native session windows emit finalized sessions once watermark passes") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    val q = StreamingOps.sessionAgg(input.toDF())
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      // advance the watermark beyond every batch1 session (+gap+wm)
      input.addData(Seq(Ev(ts("2024-01-02T00:00:00Z"), 9, "click", 0.0)))
      q.processAllAvailable()
      val emitted = spark.table("sess")
        .select("user_id", "n_events", "sum_value")
        .as[(Long, Long, Double)].collect().toSet
      // user 1: events at 10:05/10:20 chain (<30m gap), 10:55 second
      // session (35m gap); user 2: 12:00 and 12:40 are separate sessions
      assert(emitted == Set((1L, 2L, 3.0), (1L, 1L, 4.0),
        (2L, 1L, 8.0), (2L, 1L, 16.0)))
    } finally q.stop()
  }

  test("mapGroupsWithState carries per-user totals across micro-batches") {
    import spark.implicits._
    import StreamingOps.{UserEvent, UserTotal}
    val input = MemoryStream[UserEvent](spark)
    val q = StreamingOps.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("totals")
      .outputMode("update").start()
    try {
      input.addData(Seq(UserEvent(1, 1.0), UserEvent(1, 2.0), UserEvent(2, 5.0)))
      q.processAllAvailable()
      input.addData(Seq(UserEvent(1, 4.0)))
      q.processAllAvailable()
      val last = spark.table("totals").as[UserTotal].collect()
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.n_events) }
      // state survived: batch 2's user-1 row includes batch 1's events
      assert(last(1L) == UserTotal(1, 3, 7.0))
      assert(last(2L) == UserTotal(2, 1, 5.0))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate keys within and across micro-batches") {
    import spark.implicits._
    val input = MemoryStream[DEv](spark)
    val q = StreamingOps.streamingDedup(input.toDF())
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      // in-batch duplicate (id 1) and a clean id 2
      input.addData(Seq(
        DEv(ts("2024-01-01T10:00:00Z"), 1, 10),
        DEv(ts("2024-01-01T10:01:00Z"), 1, 11),
        DEv(ts("2024-01-01T10:02:00Z"), 2, 12)))
      q.processAllAvailable()
      // cross-batch duplicate of id 2 (within the 2h horizon) + new id 3
      input.addData(Seq(
        DEv(ts("2024-01-01T10:30:00Z"), 2, 13),
        DEv(ts("2024-01-01T10:31:00Z"), 3, 14)))
      q.processAllAvailable()
      val ids = spark.table("sdedup").select("event_id", "user_id")
        .as[(Long, Long)].collect().toSet
      assert(ids == Set((1L, 10L), (2L, 12L), (3L, 14L)))
    } finally q.stop()
  }

  test("batch sessionWindow (gaps-and-islands) agrees with native session_window") {
    import spark.implicits._
    // same 30-minute gap semantics, two independent formulations
    val df = batch1.toDF().withColumn("event_id", col("user_id"))
    val native = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select("user_id", "n").as[(Long, Long)].collect()
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val islands = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"))
      df.withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("newS", when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > 1800000000L, 1)
          .otherwise(0))
        .withColumn("sid", sum(col("newS")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sid")).agg(count(lit(1)).as("n"))
        .select("user_id", "n").as[(Long, Long)].collect()
        .groupBy(identity).map { case (k, v) => k -> v.size }
    }
    assert(native == islands)
  }

  test("flatMapGroupsWithState sessionizer matches native session_window") {
    import spark.implicits._
    val input = MemoryStream[StreamingOps.SessEvent](spark)
    val q = StreamingOps.sessionizeWithTimeout(input.toDS())
      .writeStream.format("memory").queryName("fmgws_sess")
      .outputMode("append").start()
    try {
      input.addData(batch1.map(e =>
        StreamingOps.SessEvent(e.user_id, e.ts, e.value)))
      q.processAllAvailable()
      // push the watermark far past every open session so timeouts fire
      input.addData(Seq(StreamingOps.SessEvent(9L,
        ts("2024-01-02T12:00:00Z"), 0.0)))
      q.processAllAvailable()
      val emitted = spark.table("fmgws_sess")
        .filter(col("user_id") =!= 9L)
        .as[StreamingOps.ClosedSession].collect()
        .map(c => (c.user_id, c.sess_start_us, c.n_events, c.sum_value))
        .toSet
      // native session_window on the same batch input (session END in
      // session_window is last_event + gap; ours is the last event
      // itself, so compare on start/n/sum which mean the same thing)
      val native = StreamingOps.sessionAgg(batch1.toDF())
        .select("user_id", "sess_start_us", "n_events", "sum_value")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(emitted.nonEmpty)
      assert(emitted == native)
    } finally q.stop()
  }

  test("sessionizer folds FULL-microsecond event times (sub-ms boundary)") {
    import spark.implicits._
    // Two events 30min + 501µs apart: a millisecond-truncated fold sees
    // exactly 30min (<= gap, one merged session); the micros fold must
    // SPLIT them — and the emitted boundaries must carry the µs digits.
    val t1 = ts("2024-01-01T10:00:00.000123Z")
    val t2 = ts("2024-01-01T10:30:00.000624Z")
    val input = MemoryStream[StreamingOps.SessEvent](spark)
    val q = StreamingOps.sessionizeWithTimeout(input.toDS())
      .writeStream.format("memory").queryName("fmgws_subms")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        StreamingOps.SessEvent(1L, t1, 1.0),
        StreamingOps.SessEvent(1L, t2, 2.0)))
      q.processAllAvailable()
      input.addData(Seq(StreamingOps.SessEvent(9L,
        ts("2024-01-02T12:00:00Z"), 0.0))) // advance watermark past both
      q.processAllAvailable()
      val sessions = spark.table("fmgws_subms")
        .filter(col("user_id") === 1L)
        .as[StreamingOps.ClosedSession].collect().toSet
      assert(sessions == Set(
        StreamingOps.ClosedSession(1L, 1704103200000123L,
          1704103200000123L, 1L, 1.0),
        StreamingOps.ClosedSession(1L, 1704105000000624L,
          1704105000000624L, 1L, 2.0)), sessions.toString)
    } finally q.stop()
  }

  test("flatMapGroupsWithState closes a session mid-stream when the gap passes") {
    import spark.implicits._
    val input = MemoryStream[StreamingOps.SessEvent](spark)
    val q = StreamingOps.sessionizeWithTimeout(input.toDS())
      .writeStream.format("memory").queryName("fmgws_midclose")
      .outputMode("append").start()
    try {
      // batch 1: one event; batch 2: an event 31 minutes later for the
      // SAME user — the first session must close with the old content
      input.addData(Seq(StreamingOps.SessEvent(7L,
        ts("2024-01-01T10:00:00Z"), 1.5)))
      q.processAllAvailable()
      input.addData(Seq(StreamingOps.SessEvent(7L,
        ts("2024-01-01T10:31:00Z"), 2.5)))
      q.processAllAvailable()
      val afterSplit = spark.table("fmgws_midclose")
        .as[StreamingOps.ClosedSession].collect().toSet
      assert(afterSplit == Set(StreamingOps.ClosedSession(7L,
        1704103200000000L, 1704103200000000L, 1L, 1.5)))
    } finally q.stop()
  }

  test("streaming neardup probe == batch probe, with the index maintained (X57b)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // the harness itself requires maintained-index ≡ full rebuild
    val streamed = NeardupStream.neardupStreamQuery(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    val batch = graft.ops.Dedup.neardupProbe(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(streamed == batch,
      "accumulated streaming pairs differ from the batch probe")
    // the maintained index is LIVE: a later ad-hoc probe of one
    // streamed doc's signatures against it finds that doc's own rows
    // (they were appended by the stream, not by any batch builder).
    // Read through NeardupIndex — the harness compacted the index, so
    // this also exercises the post-compaction reader contract.
    val idxDir = graft.util.Scratch
      .under("ingest/neardup_stream/index").toString
    val idx = NeardupIndex.read(spark, idxDir)
    assert(NeardupIndex.liveBatchDirs(spark, idxDir).size == 1,
      "harness compaction must leave one live index directory")
    val streamedDocRows = idx.filter(pmod(col("doc_id"), lit(7)) === 0)
    assert(streamedDocRows.count() > 0,
      "streamed batch signatures missing from the maintained index")
    // EXACT set-equality twin of the harness's checksum invariant:
    // maintained index rows == a from-scratch signature rebuild
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // MULTISET compare (sorted seqs, not sets): a duplicated row from
    // a non-idempotent replay must fail this exact twin, and toSet
    // would dedup it away
    val rebuilt = graft.ops.Dedup.bandSignaturesFor(docs)
      .select("doc_id", "band", "sig")
      .as[(Long, Int, String)].collect().toSeq.sorted
    val maintained = idx.select(col("doc_id").cast("long"),
        col("band").cast("int"), col("sig"))
      .as[(Long, Int, String)].collect().toSeq.sorted
    assert(maintained == rebuilt,
      "maintained index differs from a full signature rebuild")
  }

  test("neardup index compaction: bounded dirs, identical content, crash-safe visibility") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-ndidx").toString
    val idx = s"$base/index"
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    def sigs(filter: org.apache.spark.sql.Column) =
      graft.ops.Dedup.bandSignaturesFor(docs.filter(filter))
    def fp(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, String)] =
      df.select(col("doc_id").cast("long"), col("band").cast("int"),
        col("sig")).as[(Long, Int, String)].collect().toSeq.sorted
    // seed + three appended batches, the stream's layout
    sigs(pmod(col("doc_id"), lit(4)) === 0)
      .write.partitionBy("band").parquet(s"$idx/batch_id=seed")
    (1 to 3).foreach { b =>
      sigs(pmod(col("doc_id"), lit(4)) === b)
        .write.partitionBy("band").parquet(s"$idx/batch_id=$b")
    }
    assert(NeardupIndex.liveBatchDirs(spark, idx).size == 4)
    val before = fp(NeardupIndex.read(spark, idx))

    NeardupIndex.compact(spark, idx)
    assert(NeardupIndex.liveBatchDirs(spark, idx) ==
      Seq("batch_id=compact1"))
    // folded dirs physically gone — the on-disk dir count is bounded
    val children = new java.io.File(idx).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSeq
    assert(children == Seq("batch_id=compact1"))
    // content identical, as a multiset
    assert(fp(NeardupIndex.read(spark, idx)) == before,
      "compaction changed the index content")
    // idempotent: single live dir → no-op
    NeardupIndex.compact(spark, idx)
    assert(NeardupIndex.liveBatchDirs(spark, idx) ==
      Seq("batch_id=compact1"))

    // append AFTER compaction, then compact again → generation 2
    sigs(col("doc_id") < 40)
      .write.partitionBy("band").parquet(s"$idx/batch_id=99")
    assert(NeardupIndex.liveBatchDirs(spark, idx).size == 2)
    NeardupIndex.compact(spark, idx)
    assert(NeardupIndex.liveBatchDirs(spark, idx) ==
      Seq("batch_id=compact2"))
    val after99 = fp(NeardupIndex.read(spark, idx))
    assert(after99 == fp(sigs(pmod(col("doc_id"), lit(4)) < 4)
      .unionByName(sigs(col("doc_id") < 40))),
      "post-append compaction lost or duplicated rows")

    // crash simulation: an UNLOGGED compact dir (consolidated written,
    // commit rename never ran) must be invisible to readers
    sigs(col("doc_id") < 8).write.partitionBy("band")
      .parquet(s"$idx/batch_id=compact3")
    assert(NeardupIndex.liveBatchDirs(spark, idx) ==
      Seq("batch_id=compact2"),
      "unlogged compaction generation must stay invisible")
    assert(fp(NeardupIndex.read(spark, idx)) == after99)
    // an in-flight append (no _SUCCESS yet) is invisible too
    new java.io.File(s"$idx/batch_id=77").mkdirs()
    assert(NeardupIndex.liveBatchDirs(spark, idx) ==
      Seq("batch_id=compact2"))
  }

  test("media probe stream: two file arrivals accumulate the batch probe exactly (X106f)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = MediaStream.mediaProbeStreamQuery(spark, dir)
      .collect().toSeq
    val batch = graft.ops.MediaNeardup.mediaNeardupProbe(spark, dir)
      .collect().toSeq
    assert(streamed.nonEmpty, "fixture variants must produce verdicts")
    assert(streamed == batch,
      "accumulated stream verdicts must equal the batch probe")
  }
}
