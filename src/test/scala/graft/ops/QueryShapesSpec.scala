package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the PLAN properties each QueryShapes query exists to
  * demonstrate — correctness is the oracle's job (CORRECTNESS gate);
  * these assertions keep the distributed shapes from silently
  * regressing (e.g. an optimizer change or refactor re-introducing a
  * second fact scan in q21). */
class QueryShapesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q6 is scan-only: no join, filters pushed to the parquet scan") {
    val p = plan(QueryShapes.q6Forecast(spark, dir))
    assert(!p.contains("Join"), p)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    // projection pruned to the columns the query touches
    assert(p.contains("ReadSchema: struct<l_quantity:double," +
      "l_extendedprice:double,l_discount:double,l_shipdate:timestamp_ntz>"), p)
  }

  test("q4 EXISTS compiles to a left-semi join with the lateness residual") {
    val p = plan(QueryShapes.q4PriorityCheck(spark, dir))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("INTERVAL '60' DAY"), p)
  }

  test("q21 decorrelation runs ONE pass over lineitem") {
    val p = plan(QueryShapes.q21WaitingSupplier(spark, dir))
    val scans = "lineitem\\.parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 lineitem scan, got $scans:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q17 pre-aggregate only scans the brand's lineitems (semi-join pushdown)") {
    val p = plan(QueryShapes.q17SmallQty(spark, dir))
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
    // threshold-as-window keeps it to ONE pass over the fact table
    val scans = "lineitem\\.parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 lineitem scan, got $scans:\n$p")
  }

  test("q15 scalar max reuses the one aggregate: single lineitem scan") {
    val p = plan(QueryShapes.q15TopSupplier(spark, dir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    val scans = "lineitem\\.parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 lineitem scan, got $scans:\n$p")
    // sanity: the query returns the true max supplier(s)
    val rows = QueryShapes.q15TopSupplier(spark, dir).collect()
    assert(rows.nonEmpty)
  }

  test("q8 market share is a fraction in [0, 1]") {
    val rows = QueryShapes.q8MarketShare(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0, s)
    }
  }
}
