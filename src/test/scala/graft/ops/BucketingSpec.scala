package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.util.Tables.t

class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed join plans with no shuffle exchange on either side") {
    val join = Bucketing.bucketedJoinOnly(spark, dir)
    val plan = join.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"expected exchange-free bucketed join, got:\n$plan")
  }

  test("bucketed join contents equal the plain parquet join") {
    import spark.implicits._
    val bucketed = Bucketing.bucketedJoin(spark, dir)
      .as[(String, String, Long, Double, Double)].collect().sorted.toSeq
    val plain = t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        graft.util.Tables.dsum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))).as("revenue"),
        graft.util.Tables.dsum(col("l_quantity")).as("sum_qty"))
      .as[(String, String, Long, Double, Double)].collect().sorted.toSeq
    assert(bucketed == plain)
  }
}
