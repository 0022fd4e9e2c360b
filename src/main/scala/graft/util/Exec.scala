package graft.util

import org.apache.spark.sql.DataFrame

/** Full-materialization runner shared by every timing harness (Bench,
  * QTime, Profile, ScaleStress).
  *
  * `df.count()` is NOT "run the query": Catalyst optimizes the count —
  * column pruning drops every projection the count doesn't need, and
  * Spark 4 eliminates a left outer join whose build side is unique-keyed
  * and unreferenced. Measured concretely on this engine: counting
  * `span_scrub` optimizes to `count(1)` over a BARE PARQUET SCAN (the
  * whole window/groupBy/join pipeline vanishes — 1.8 KB total shuffle
  * where the real query moves megabytes), and every pure per-row map
  * query (`media_resize`, `scrub_normalize`, ...) counts only its scan.
  * The correctness gate always materialized full output (Verify writes
  * parquet), but timings taken via `count()` under-measured those
  * queries.
  *
  * `queryExecution.toRdd.count()` instead executes the query's OWN
  * physical plan — every projection, join, aggregate and sort, all
  * output columns materialized into UnsafeRows — and only counts the
  * resulting rows, without collecting them to the driver. */
object Exec {

  /** Execute `df`'s full plan (all columns, no count-pruning); returns
    * the row count. */
  def materialize(df: DataFrame): Long = df.queryExecution.toRdd.count()
}
