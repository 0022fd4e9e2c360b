package graft.util

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the ADVICE-r11 lock fix: [[CkptMemo.of]] must build each
  * (session, key) exactly once — including under concurrent callers
  * of the SAME key — while callers of DIFFERENT keys must not
  * serialize behind one build (the old code held the single global
  * lock through the whole Spark build). Also: a failed build must not
  * poison the slot, and clear() must evict so the next access
  * rebuilds. */
class CkptMemoSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def df(tag: String) = {
    import spark.implicits._
    Seq(tag).toDF("v").localCheckpoint()
  }

  test("same key builds once under concurrent access") {
    CkptMemo.clear()
    val builds = new java.util.concurrent.atomic.AtomicInteger
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val results = try {
      val futures = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[
            org.apache.spark.sql.DataFrame] {
          def call() = CkptMemo.of(spark, "memo_spec_same") {
            builds.incrementAndGet(); df("same")
          }
        })
      }
      futures.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    assert(builds.get == 1, s"built ${builds.get} times, expected 1")
    assert(results.forall(_ eq results.head), "all callers share one DataFrame")
  }

  test("different keys do not serialize behind one build") {
    CkptMemo.clear()
    // key A's build blocks until key B's caller has COMPLETED — under
    // the old global-lock-through-build code this deadlocks (B's of()
    // waits on the lock A's build holds); under per-key latches B
    // sails through and releases A. A 30s guard turns a regression
    // into a failure instead of a hung suite.
    val bDone = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = {
          CkptMemo.of(spark, "memo_spec_a") {
            assert(bDone.await(30, java.util.concurrent.TimeUnit.SECONDS),
              "key B's caller never completed — builds are serialized")
            df("a")
          }
          "a"
        }
      })
      Thread.sleep(200) // let A enter its build first
      CkptMemo.of(spark, "memo_spec_b") { df("b") }
      bDone.countDown()
      assert(fa.get(60, java.util.concurrent.TimeUnit.SECONDS) == "a")
    } finally pool.shutdownNow()
  }

  test("a waiter on a failing build fails fast, never retries in the evicted holder (ADVICE r12)") {
    CkptMemo.clear()
    val attempts = new java.util.concurrent.atomic.AtomicInteger
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      def build() = CkptMemo.of(spark, "memo_spec_waiter") {
        attempts.incrementAndGet(); entered.countDown()
        assert(release.await(30, java.util.concurrent.TimeUnit.SECONDS))
        sys.error("boom")
      }
      def submit() = pool.submit(new java.util.concurrent.Callable[
          org.apache.spark.sql.DataFrame] { def call() = build() })
      val fa = submit()
      assert(entered.await(30, java.util.concurrent.TimeUnit.SECONDS))
      val fb = submit() // blocks on the same holder's latch
      Thread.sleep(200)
      release.countDown()
      // both callers observe the ONE failure — under the pre-fix lazy
      // val the waiter re-ran the build inside the holder the failing
      // caller had already evicted, orphaning its checkpoint from
      // clear()'s unpersist accounting
      intercept[java.util.concurrent.ExecutionException] {
        fa.get(60, java.util.concurrent.TimeUnit.SECONDS) }
      intercept[java.util.concurrent.ExecutionException] {
        fb.get(60, java.util.concurrent.TimeUnit.SECONDS) }
      assert(attempts.get == 1,
        s"build ran ${attempts.get} times — a waiter retried in-holder")
      // a fresh call installs a new holder and rebuilds cleanly
      CkptMemo.of(spark, "memo_spec_waiter") {
        attempts.incrementAndGet(); df("ok")
      }
      assert(attempts.get == 2)
    } finally pool.shutdownNow()
  }

  test("a failed build does not poison the slot; clear() forces a rebuild") {
    CkptMemo.clear()
    val attempts = new java.util.concurrent.atomic.AtomicInteger
    intercept[RuntimeException] {
      CkptMemo.of(spark, "memo_spec_fail") {
        attempts.incrementAndGet(); sys.error("boom")
      }
    }
    // lazy-val init failure resets the holder: the next access retries
    CkptMemo.of(spark, "memo_spec_fail") {
      attempts.incrementAndGet(); df("ok")
    }
    assert(attempts.get == 2)
    // clear() evicts (and must not itself trigger any build)
    CkptMemo.clear()
    CkptMemo.of(spark, "memo_spec_fail") {
      attempts.incrementAndGet(); df("ok2")
    }
    assert(attempts.get == 3)
  }
}
