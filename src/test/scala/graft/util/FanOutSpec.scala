package graft.util

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** fanOut contract: spreads bare scans without running a job, and is an
  * identity on derived frames (where probing `.rdd` could trigger stage
  * execution under AQE). */
class FanOutSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def jobCount: Int =
    spark.sparkContext.statusTracker.getJobIdsForGroup(null).length

  test("fanOut on a scan spreads partitions and runs zero jobs") {
    val scan = Tables.t(spark, dir, "documents")
    val before = jobCount
    val fanned = Tables.fanOut(scan)
    assert(jobCount == before, "fanOut must not trigger a job on a scan")
    assert(fanned.rdd.getNumPartitions >=
      spark.sparkContext.defaultParallelism)
  }

  test("fanOut is an identity on derived (join/agg) frames") {
    import org.apache.spark.sql.functions._
    val derived = Tables.t(spark, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val out = Tables.fanOut(derived)
    assert(out eq derived, "fanOut must not touch a non-scan frame")
  }
}
