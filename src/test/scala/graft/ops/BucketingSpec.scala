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

  test("mixed-case dir tag: stale lowercase warehouse dir is dropped, not orphaned") {
    // saveAsTable lowercases identifiers, so the on-disk location of
    // `li_bucketed_<MixedCaseTag>` is the LOWERCASE name. A previous
    // JVM's table therefore leaves a lowercase dir that a
    // case-preserving cleanup would miss — and the subsequent
    // saveAsTable would fail on the existing location. Reproduce: an
    // uppercase source dir (uppercase tag asserted), stale junk planted
    // at both lowercase locations, then writeBucketed must recover.
    val uc = java.nio.file.Files.createTempDirectory("GraftUC").toString
    val tag = graft.util.Tables.pathTag(uc)
    assert(tag.exists(_.isUpper), s"precondition: tag '$tag' not mixed-case")
    Seq("lineitem", "orders").foreach { tbl =>
      spark.read.parquet(s"$dir/$tbl.parquet")
        .write.parquet(s"$uc/$tbl.parquet")
    }
    val hc = spark.sparkContext.hadoopConfiguration
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    Seq(s"li_bucketed_$tag", s"ord_bucketed_$tag").foreach { tbl =>
      val stale = new org.apache.hadoop.fs.Path(s"$wh/${tbl.toLowerCase}")
      val fs = stale.getFileSystem(hc)
      fs.mkdirs(stale)
      val junk = fs.create(new org.apache.hadoop.fs.Path(stale, "junk"))
      junk.writeBytes("stale"); junk.close()
    }
    val (liTbl, ordTbl) = Bucketing.writeBucketed(spark, uc)
    assert(spark.table(liTbl).count() ==
      spark.read.parquet(s"$dir/lineitem.parquet").count())
    assert(spark.table(ordTbl).count() ==
      spark.read.parquet(s"$dir/orders.parquet").count())
    Seq(liTbl, ordTbl).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
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
