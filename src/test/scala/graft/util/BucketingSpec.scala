package graft.util

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Demonstrates the bucketed co-located join the scale notes promise:
  * two tables bucketed by the join key on write join WITHOUT a shuffle
  * on either input — at 100 TB this removes the dominant cost of
  * repeated fact-fact joins on a stable key. Uses the shared test
  * session (tables land in the default warehouse dir, gitignored);
  * plan-shape-sensitive confs are overridden and restored. */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join with zero input shuffle exchanges") {
    val dir = "/root/testdata/sf0.001"
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      try {
        Tables.t(spark, dir, "orders")
          .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .mode("overwrite").saveAsTable("orders_b")
        Tables.t(spark, dir, "lineitem")
          .select("l_orderkey", "l_extendedprice")
          .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .mode("overwrite").saveAsTable("lineitem_b")

        val joined = spark.table("lineitem_b")
          .join(spark.table("orders_b"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
        val exchanges = joined.queryExecution.executedPlan.collect {
          case e: Exchange => e
        }
        // the join and the partial agg consume the bucket distribution;
        // only the final single-key agg may exchange
        assert(exchanges.size <= 1,
          s"expected co-located join (<=1 exchange), got ${exchanges.size}:\n" +
            joined.queryExecution.executedPlan)

        // and the answer matches the unbucketed formulation
        val plain = Tables.t(spark, dir, "lineitem")
          .select("l_orderkey", "l_extendedprice")
          .join(Tables.t(spark, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val bucketed = joined.collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(bucketed == plain)
      } finally {
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
      }
    }
  }
}
