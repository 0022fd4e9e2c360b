package graft

import scala.concurrent.{Await, Future, ExecutionContext}
import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent-workload smoke: a diverse slice of the registry runs
  * SIMULTANEOUSLY on the shared session (the Thrift-server / notebook
  *-cluster shape: one SparkSession, many callers) and every result
  * must equal its own sequential run. This exercises the pieces of
  * session-shared state a per-query spec never contends on — the
  * near-dup pair memo ([[graft.ops.Dedup.nearDupPairsCached]]), the
  * checkpoint memo latches ([[graft.util.CkptMemo]], whose r12 lock
  * refactor exists precisely for concurrent callers), temp-view
  * registration, and AQE plan state — under real thread interleaving.
  *
  * The slice picks one representative per shared-state class: two
  * pair-memo consumers, two CkptMemo consumers (different keys), the
  * temp-view query, a TPC-H agg, a window shape, and one of the new
  * stats-join-back ops. Hash-compare (sorted) against sequential
  * ground truth. */
class ConcurrencySmokeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def queries: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
    "dedup_groups" -> (() => ops.Dedup.dedupGroups(spark, dir)),
    "dedup_canonical" -> (() => ops.Dedup.dedupCanonical(spark, dir)),
    "word_rarity" -> (() => ops.QualitySignals.wordRarity(spark, dir)),
    "quality_calibrated" -> (() => ops.QualitySignals.qualityCalibrated(spark, dir)),
    "sql_native_dot" -> (() => ops.Similarity.sqlNativeDot(spark, dir)),
    "rollup_nation" -> (() => ops.Analytics.rollupNation(spark, dir)),
    "window_events" -> (() => ops.Analytics.windowEvents(spark, dir)),
    "length_outliers" -> (() => ops.QualitySignals.lengthOutliers(spark, dir)))

  private def fingerprint(df: org.apache.spark.sql.DataFrame): String = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toString).sorted.mkString("\n")
  }

  test("a concurrent slice of the registry matches its sequential results") {
    graft.util.CkptMemo.clear()
    ops.Dedup.clearPairsMemo()
    val sequential = queries.map { case (n, f) => n -> fingerprint(f()) }.toMap

    graft.util.CkptMemo.clear()
    ops.Dedup.clearPairsMemo()
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(queries.size)
    try {
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutor(pool)
      val futures = queries.map { case (n, f) =>
        Future { n -> fingerprint(f()) }
      }
      val concurrent = Await.result(
        Future.sequence(futures), 10.minutes).toMap

      queries.foreach { case (n, _) =>
        assert(concurrent(n) == sequential(n),
          s"$n diverged under concurrency")
        assert(concurrent(n).nonEmpty, s"$n returned nothing")
      }
    } finally pool.shutdown()
  }
}
