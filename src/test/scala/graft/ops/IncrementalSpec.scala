package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The registered query proves 3-batch incremental == full recompute
  * via the oracle; this spec pins the stronger property that the MERGE
  * is split-invariant — any deterministic partition of the input, any
  * number of steps, same final state. */
class IncrementalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def runWith(nBatches: Int): Seq[String] = {
    val ev = graft.util.Tables.t(spark, dir, "events")
    val parts = (0 until nBatches)
      .map(i => ev.filter(col("event_id") % nBatches === i))
    // fold through the public single-step API by reusing the registered
    // query's building blocks via reflection-free package access
    val first = Incremental.partialForTest(parts.head)
    val merged = parts.tail.foldLeft(first)((st, b) =>
      Incremental.mergeForTest(st, Incremental.partialForTest(b)))
    merged
      .select(col("day").cast("string"), col("event_type"),
        col("n_events"), col("sum_value_dec").cast("string"))
      .orderBy("day", "event_type")
      .collect().map(_.toString).toSeq
  }

  test("merged state is identical for 1, 2, and 7 batch splits") {
    val one = runWith(1)
    assert(one.nonEmpty)
    assert(runWith(2) == one)
    assert(runWith(7) == one)
  }
}
