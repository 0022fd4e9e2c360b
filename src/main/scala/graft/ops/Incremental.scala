package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.util.Tables.{t, decToDouble, pathTag}

/** X47 — incremental aggregate maintenance: keep a persisted rollup
  * current by MERGING each new batch's partial aggregate into the
  * stored state, never recomputing from raw history. This is the
  * pattern that turns an O(history) nightly job into an O(batch) one —
  * at 100 TB of accumulated events, recomputing a daily rollup from
  * raw is the single most common self-inflicted cluster bill.
  *
  * Two disciplines make the merged result EXACTLY equal a full
  * recompute (which is what the paired oracle asserts):
  *
  *  1. State carries only DECOMPOSABLE aggregates (count, decimal sum)
  *     — mergeable by re-aggregation. Non-decomposable stats (exact
  *     median, distinct) need sketches (see `kmv_distinct`) or a
  *     different state layout.
  *  2. The stored sum column stays DECIMAL(30,8) end to end: decimal
  *     addition is associative, so (batch-then-merge) == (all-at-once)
  *     bit-for-bit; the cast to double happens once, on read-out. A
  *     double-typed state column would make the result depend on batch
  *     boundaries (float addition is not associative).
  *
  * Scale: each maintenance step shuffles |state| + |batch partial|
  * rows on the grouping key — both rollup-sized, never history-sized.
  * The state write is a plain overwrite of a rollup-sized table;
  * at lake scale it would be the partition-scoped swap the upsert
  * strategy already implements (`load/Strategies.scala`). */
object Incremental {

  /** Per-(day, event_type) partial aggregate of one batch, with the
    * mergeable decimal sum kept as decimal. */
  private def partial(batch: DataFrame): DataFrame =
    batch
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(30, 8))).as("sum_value_dec"))

  /** Merge persisted state with a new batch's partial: union, then
    * re-aggregate the decomposable columns. */
  private def merge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_value_dec")).as("sum_value_dec"))

  /** Test seams (IncrementalSpec asserts split-invariance of the
    * merge across batch counts). */
  private[ops] def partialForTest(batch: DataFrame): DataFrame = partial(batch)
  private[ops] def mergeForTest(state: DataFrame, delta: DataFrame): DataFrame =
    merge(state, delta)

  /** Registered query: seed the rollup from 60% of events, then apply
    * two incremental batches (30%, 10%) through the persisted state,
    * reading the state back from disk between steps — the oracle is the
    * FULL recompute over all events, so green means batch boundaries
    * are invisible in the final values. Batch membership is keyed on
    * event_id (deterministic), mimicking arrival order. */
  def incrementalRollup(spark: SparkSession, dir: String): DataFrame = {
    val out = s"target/graft_incr/rollup_${pathTag(dir)}"
    val ev = t(spark, dir, "events")
      .select(col("ts"), col("event_type"), col("value"), col("event_id"))
    val m = col("event_id") % 10
    val batches = Seq(m < 6, m >= 6 && m < 9, m >= 9)

    partial(ev.filter(batches.head))
      .write.mode("overwrite").parquet(s"$out/v0")
    batches.tail.zipWithIndex.foreach { case (cond, i) =>
      val state = spark.read.parquet(s"$out/v$i")
      merge(state, partial(ev.filter(cond)))
        .write.mode("overwrite").parquet(s"$out/v${i + 1}")
    }

    spark.read.parquet(s"$out/v${batches.size - 1}")
      .select(col("day"), col("event_type"), col("n_events"),
        decToDouble(col("sum_value_dec")).as("sum_value"))
      .orderBy("day", "event_type")
  }
}
