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

  test("CDC-maintained rollup is bit-identical to a direct recompute at v3") {
    import org.apache.spark.sql.types.DecimalType
    // the registered query builds its own versioned lake, then
    // retracts/applies the v1→v3 change feed over a v1 base
    val cdc = Ingest.ingestCdcRollup(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).toSeq
    assert(cdc.nonEmpty)
    // direct recompute over the v3 reconstruction with the same
    // decimal arithmetic — one string-routed double conversion
    val path = "/root/repo/target/ingest/ingest_cdc_rollup/curated/sap/customers_cdc"
    val direct = graft.load.Strategies
      .readAtVersion(spark, path, 3)
      .groupBy(col("dt"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n_rows"),
        graft.util.Tables.decToDouble(
          org.apache.spark.sql.functions.sum(
            col("bal").cast(DecimalType(30, 8)))).as("sum_bal"))
      .orderBy("dt")
      .collect().map(_.toString).toSeq
    assert(cdc == direct)
  }
}
