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

  test("selectCells never misses a cell containing an in-box point") {
    // Property over random boxes on the 256×256 grid: every grid point
    // inside the box must land in a selected cell — a false negative
    // here would silently drop rows from the pruned scan.
    val rnd = new scala.util.Random(42)
    def cellOf(gx: Long, gy: Long): Int = {
      val (qx, qy) = ((gx >> 6).toInt, (gy >> 6).toInt)
      (qy >> 1) << 3 | (qx >> 1) << 2 | (qy & 1) << 1 | (qx & 1)
    }
    (1 to 200).foreach { _ =>
      val (x1, x2) = (rnd.nextInt(256), rnd.nextInt(256))
      val (y1, y2) = (rnd.nextInt(256), rnd.nextInt(256))
      val (gxlo, gxhi) = (math.min(x1, x2).toLong, math.max(x1, x2).toLong)
      val (gylo, gyhi) = (math.min(y1, y2).toLong, math.max(y1, y2).toLong)
      val cells = Layout.selectCells(gxlo, gxhi, gylo, gyhi).toSet
      (1 to 50).foreach { _ =>
        val gx = gxlo + (rnd.nextLong().abs % (gxhi - gxlo + 1))
        val gy = gylo + (rnd.nextLong().abs % (gyhi - gylo + 1))
        assert(cells.contains(cellOf(gx, gy)),
          s"point ($gx,$gy) of box [$gxlo,$gxhi]x[$gylo,$gyhi] " +
            s"in cell ${cellOf(gx, gy)} not in $cells")
      }
    }
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
