package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.util.Tables.t

class LayoutSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("dppScan's fact scan carries a dynamic partition pruning filter") {
    val plan = Layout.dppScan(spark, dir).queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning in fact scan:\n$plan")
  }

  test("dppScan equals the raw-table semi-join") {
    import spark.implicits._
    val pruned = Layout.dppScan(spark, dir)
      .as[(String, Long, Double, Long)].collect().toSeq
    val hot = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("dt"))
      .agg(graft.util.Tables.dsum(col("value")).as("revenue"))
      .orderBy(col("revenue").desc, col("dt")).limit(3)
      .select(col("dt"))
    val raw = t(spark, dir, "events")
      .withColumn("dt", to_date(col("ts")))
      .join(hot, "dt")
      .groupBy(col("dt"))
      .agg(count(lit(1)).as("n_events"),
        graft.util.Tables.dsum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("dt"), "yyyy-MM-dd"),
        col("n_events"), col("sum_value"), col("n_users"))
      .as[(String, Long, Double, Long)].collect().toSeq
      .sortBy(_._1)
    assert(pruned == raw)
  }

  test("zorderBox prunes to a strict subset of quadtree cells") {
    val cells = Layout.registeredCells(spark, dir)
    assert(cells.nonEmpty && cells.size <= 6,
      s"expected <=6 of 16 cells, got ${cells.size}: $cells")
    val plan = Layout.zorderBox(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("z_cell"),
      s"no z_cell partition filter in plan:\n$plan")
  }

  test("zorderBox equals the raw-table box filter") {
    import spark.implicits._
    val clustered = Layout.zorderBox(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    val r = t(spark, dir, "events")
      .agg(min(to_date(col("ts"))), min(col("user_id")),
        max(col("user_id"))).head()
    val (d0, umin, umax) = (r.getDate(0), r.getLong(1), r.getLong(2))
    val uext = umax - umin + 1
    val raw = t(spark, dir, "events")
      .filter(col("user_id").between(umin + uext / 4, umin + uext / 2 - 1) &&
        datediff(to_date(col("ts")), lit(d0)).between(9, 18))
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"),
        graft.util.Tables.dsum(col("value")).as("sum_value"))
      .orderBy(col("day"))
      .as[(String, Long, Double)].collect().toSeq
    assert(clustered == raw)
  }
}
