package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Session-scoped memo for `localCheckpoint`ed relations (VERDICT/ADVICE
  * r10): the checkpoint-heavy operators (jaccardPrefixJoin,
  * containmentJoin, ngramJaccard's candidate-shingle slice, wordRarity's
  * frequency table, the corpus-pipeline stages) each pin one or more
  * RDD blocks per invocation. Without a memo, EVERY call re-builds and
  * re-persists them — including a corpus-shingle-sized DISK_ONLY block —
  * and nothing ever unpersists, so a long-lived session (a notebook, the
  * bench loop, the verify driver) grows pinned storage without bound.
  *
  * With the memo, a given (session, key) builds its checkpoint ONCE —
  * correct because inputs are immutable within a session (the lake
  * layout writes new partitions, never rewrites a read path; same
  * assumption as [[graft.ops.Dedup.nearDupPairsCached]]) — and
  * [[clear]] both drops the map AND deterministically unpersists every
  * memoized checkpoint's RDD ([[PlanBridge.unpersistLocalCheckpoint]] —
  * plain `Dataset.unpersist` is a silent no-op on checkpoint RDDs).
  * Stopped sessions are evicted on every access: weak keying cannot do
  * this — a memoized DataFrame strongly references its own session, so
  * a WeakHashMap key would never become collectable.
  *
  * Callers pass the BUILD closure including its own `.localCheckpoint`
  * call, so storage level (heap vs DISK_ONLY) stays a per-relation
  * decision at the call site. */
object CkptMemo {

  private val memo = collection.mutable.Map.empty[
    SparkSession, collection.mutable.Map[Seq[Any], DataFrame]]

  /** Memoized build: returns the cached checkpointed relation for
    * (spark, key), building it once per session. */
  def of(spark: SparkSession, key: Any*)(build: => DataFrame): DataFrame =
    memo.synchronized {
      memo.filterInPlace((s, _) => !s.sparkContext.isStopped)
      memo.getOrElseUpdate(spark,
          collection.mutable.Map.empty[Seq[Any], DataFrame])
        .getOrElseUpdate(key.toSeq, build)
    }

  /** Drop every memo entry and unpersist its checkpoint RDD. Call
    * after external input changes (testdata refresh) or between timed
    * scale-stress runs so measurements see cold builds. */
  def clear(): Unit = memo.synchronized {
    memo.values.iterator.flatMap(_.values).foreach { df =>
      if (!df.sparkSession.sparkContext.isStopped)
        PlanBridge.unpersistLocalCheckpoint(df)
    }
    memo.clear()
  }
}
