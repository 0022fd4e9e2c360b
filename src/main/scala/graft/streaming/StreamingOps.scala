package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** X10 streaming twins (SURVEY.md §2.8): the same event-time window
  * expressions the batch queries use (`Analytics.tumblingWindow` /
  * `sessionWindow`), under Structured Streaming with watermarks, plus a
  * `mapGroupsWithState` custom-state operator.
  *
  * These take the (possibly streaming) events DataFrame rather than a
  * path: callers wire `spark.readStream` (or a MemoryStream in tests —
  * StreamingSpec asserts batch/stream parity on identical input).
  *
  * Scale: event-time windows + watermark keep state bounded — the store
  * holds only open windows newer than the watermark; state is
  * partitioned by group key across executors, no driver state. */
object StreamingOps {

  /** Tumbling 1-hour event-time counts per event type. Watermark bounds
    * state: windows older than 2 hours behind max event time finalize
    * and evict. Decimal accumulation keeps sums exact, as in batch. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // decToDouble keeps streaming output bit-identical to the
        // batch twin at every magnitude
        graft.util.Tables.decToDouble(
          sum(col("value").cast("decimal(30,8)"))).as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Per-window data-quality monitor — the streaming form of the
    * batch dq_audit: violation counts (non-positive values, unknown
    * event types, null users) per 1-hour event-time window, so a bad
    * upstream deploy shows up as a red window within the watermark
    * delay instead of at the next batch audit. All metrics are
    * conditional counts (associative partial aggs — streaming-state
    * safe); the same code runs in batch for the oracle-paired
    * `dq_window` gate entry, and StreamingSpec pins stream == batch. */
  def dqWindow(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("value") <= 0.0, 1L).otherwise(0L))
          .as("n_nonpositive"),
        sum(when(not(col("event_type").isin(
          "click", "view", "purchase", "signup", "error")), 1L)
          .otherwise(0L)).as("n_bad_type"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L))
          .as("n_null_user"))
      .select(unix_micros(col("w.start")).as("w_start_us"),
        col("n_events"), col("n_nonpositive"), col("n_bad_type"),
        col("n_null_user"))

  /** Native stateful session windows (30-minute gap) per user — the
    * streaming-engine form of the batch gaps-and-islands query. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        graft.util.Tables.decToDouble(
          sum(col("value").cast("decimal(30,8)"))).as("sum_value"))
      .select(col("user_id"), unix_micros(col("w.start")).as("sess_start_us"),
        unix_micros(col("w.end")).as("sess_end_us"), col("n_events"),
        col("sum_value"))

  /** Stream-stream event-time interval join: attribute each VIEW to
    * the CLICKs by the same user in the preceding `maxLag` window.
    * Both sides carry watermarks and the time predicate is range-bound
    * on both ends, which is exactly what lets Structured Streaming
    * evict join state — an unbounded-time stream-stream join would
    * buffer both streams forever. On a batch frame `withWatermark` is
    * a no-op and the same code runs as an equi-join on `user_id` with
    * a time residual (NOT a range-only join — the equi key keeps the
    * shuffle hash-partitioned; the interval is a per-pair filter), so
    * the registered batch query oracle-checks the identical plan the
    * streaming twin runs (StreamJoinSpec pins batch/stream parity).
    *
    * Output lag is integer micros (exact in both engines). */
  def clickViewAttribution(events: DataFrame,
      maxLag: String = "10 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "30 minutes")
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"), col("value").as("view_value"))
      .withWatermark("v_ts", "30 minutes")
    clicks.join(views,
        col("c_user") === col("v_user") &&
          col("v_ts") >= col("c_ts") &&
          col("v_ts") <= col("c_ts") + expr(s"INTERVAL $maxLag"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        (unix_micros(col("v_ts")) - unix_micros(col("c_ts"))).as("lag_us"),
        col("view_value"))
  }

  /** Streaming exact dedup — the ingestion-time twin of the batch
    * `Analytics.dedupExact`: drop events whose dedup key was already
    * seen, with `dropDuplicatesWithinWatermark` so the seen-keys state
    * EVICTS once the key's event time falls behind the watermark.
    * Plain `dropDuplicates` on an unbounded stream grows state forever
    * — the watermarked variant is the only shape that survives an
    * always-on 100 TB/day feed (dup keys are only ever re-emitted
    * within the late-data horizon, which is exactly the guarantee a
    * replay/at-least-once source needs). State is partitioned by key
    * across executors; no driver state. */
  def streamingDedup(events: DataFrame,
      keys: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(keys)

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserTotal(user_id: Long, n_events: Long, total: Double)

  final case class SessEvent(user_id: Long, ts: java.sql.Timestamp,
      value: Double)
  final case class OpenSession(startUs: Long, endUs: Long, n: Long,
      sum: Double)
  final case class ClosedSession(user_id: Long, sess_start_us: Long,
      sess_end_us: Long, n_events: Long, sum_value: Double)

  /** Custom sessionizer via `flatMapGroupsWithState` with
    * EventTimeTimeout — the shape `session_window` cannot express:
    * sessions CLOSE (and emit) either when a later event arrives past
    * the gap, or when the WATERMARK passes the session end + gap (the
    * timeout), so downstream consumers see a closed session exactly
    * once, as soon as it is provably complete. State per user is one
    * open session (two timestamps + two accumulators) — bounded
    * regardless of stream length; keys partition across executors.
    *
    * Within a micro-batch, events are sorted by event time before
    * folding (the iterator carries no order guarantee), so results are
    * deterministic and match the batch gaps-and-islands semantics
    * (StreamingSpec asserts parity with `session_window`). */
  def sessionizeWithTimeout(events: Dataset[SessEvent],
      gapMinutes: Int = 30): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[SessEvent],
            state: GroupState[OpenSession]) =>
          def close(s: OpenSession) =
            ClosedSession(user, s.startUs, s.endUs, s.n, s.sum)
          if (state.hasTimedOut) {
            val closed = close(state.get)
            state.remove()
            Iterator(closed)
          } else {
            // Full-microsecond event time: getTime is millis-truncated;
            // sub-ms digits live in getNanos. Matching unix_micros here
            // keeps the asserted batch/stream parity exact for sub-ms
            // timestamps (session boundaries are compared in micros).
            def micros(ts: java.sql.Timestamp): Long =
              ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
            val sorted = batch.toArray.sortBy(e => micros(e.ts))
            var open = state.getOption
            val out = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              val tUs = micros(e.ts)
              open match {
                case Some(s) if tUs - s.endUs <= gapUs =>
                  open = Some(OpenSession(s.startUs, math.max(s.endUs, tUs),
                    s.n + 1, s.sum + e.value))
                case Some(s) =>
                  out += close(s)
                  open = Some(OpenSession(tUs, tUs, 1L, e.value))
                case None =>
                  open = Some(OpenSession(tUs, tUs, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire once the watermark proves no event can extend it —
              // rounded UP to the ms grid: flooring would let the
              // timeout fire up to 999µs early, closing a session an
              // in-flight event at (endUs+gapUs-ε) could still extend
              // (the sub-ms batch/stream parity case)
              state.setTimeoutTimestamp((s.endUs + gapUs + 999L) / 1000L)
            }
            out.result().iterator
          }
      }
  }

  /** Custom per-key state via `mapGroupsWithState`: running per-user
    * totals that survive across micro-batches (the
    * KeyValueGroupedDataset custom-state surface). */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal] {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(user, 0L, 0.0))
          val next = batch.foldLeft(prev)((acc, e) =>
            UserTotal(user, acc.n_events + 1, acc.total + e.value))
          state.update(next)
          next
      }
  }
}
