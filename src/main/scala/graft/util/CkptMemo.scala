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

  // One lazy holder per (session, key): the global lock only installs
  // or looks up the holder (O(1)); the BUILD — full Spark jobs
  // checkpointing corpus-sized relations — evaluates OUTSIDE it, on
  // the holder's own lazy-val latch (ADVICE r11: holding the global
  // lock through a build serialized every unrelated concurrent query
  // in the JVM). Two concurrent callers of the SAME key still
  // coordinate (lazy val's per-instance monitor — one builds, one
  // waits), which is the wanted semantics: the checkpoint must be
  // built exactly once.
  // The latch memoizes the OUTCOME (Either), not just success: if the
  // build throws, every waiter blocked on the same holder gets the
  // recorded failure and fails fast instead of re-running the build
  // inside a holder the failing caller has already evicted (ADVICE
  // r12: such a retry's checkpoint would never be registered in the
  // map, so clear() could never unpersist it). Failed callers all
  // evict-and-rethrow in of(), so the next fresh call installs a new
  // holder and builds cleanly.
  private final class Holder(build: () => DataFrame) {
    @volatile var built = false
    private lazy val outcome: Either[Throwable, DataFrame] =
      try { val d = build(); built = true; Right(d) }
      catch { case e: Throwable => Left(e) }
    def df: DataFrame = outcome.fold(e => throw e, identity)
  }

  private val memo = collection.mutable.Map.empty[
    SparkSession, collection.mutable.Map[Seq[Any], Holder]]

  /** Memoized build: returns the cached checkpointed relation for
    * (spark, key), building it once per session. A build that THROWS
    * evicts its holder (matching the pre-latch semantics, where a
    * failed getOrElseUpdate left no entry): the next caller's own
    * closure runs instead of the failed one staying pinned in the
    * map. */
  def of(spark: SparkSession, key: Any*)(build: => DataFrame): DataFrame = {
    val holder = memo.synchronized {
      memo.filterInPlace((s, _) => !s.sparkContext.isStopped)
      memo.getOrElseUpdate(spark,
          collection.mutable.Map.empty[Seq[Any], Holder])
        .getOrElseUpdate(key.toSeq, new Holder(() => build))
    }
    try holder.df
    catch {
      case e: Throwable =>
        memo.synchronized {
          memo.get(spark).foreach { m =>
            if (m.get(key.toSeq).exists(_ eq holder)) m.remove(key.toSeq)
          }
        }
        throw e
    }
  }

  /** Drop every memo entry and unpersist its checkpoint RDD. Call
    * after external input changes (testdata refresh) or between timed
    * scale-stress runs so measurements see cold builds. Only holders
    * whose build actually completed are unpersisted — an in-flight
    * build's entry is dropped from the map (its owner still holds the
    * Holder reference and completes normally). */
  def clear(): Unit = {
    val holders = memo.synchronized {
      val hs = memo.values.flatMap(_.values).toSeq
      memo.clear()
      hs
    }
    holders.foreach { h =>
      // peek via the explicit flag, never by forcing the lazy val:
      // clearing must not trigger a build
      if (h.built && !h.df.sparkSession.sparkContext.isStopped)
        PlanBridge.unpersistLocalCheckpoint(h.df)
    }
  }
}
