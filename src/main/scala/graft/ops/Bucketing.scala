package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables.{t, dsum}

/** Bucketed co-located join: both fact tables are written bucketed by
  * the join key (`bucketBy` + `saveAsTable`), so a later join reads
  * pre-partitioned data and the physical plan contains NO shuffle
  * exchange on either join side — the shape a pipeline wants when the
  * same big⨝big join runs every day: pay the partitioning once at
  * write time, never again at read time. (BucketingSpec asserts the
  * exchange-free plan; at 100 TB the equivalent is a bucketed lake
  * table or a co-partitioned write, same mechanism.)
  *
  * The bucket count is the scale knob: buckets ≈ target parallelism.
  * Locally 8; a 1000-executor cluster would use thousands. Contents
  * are unaffected by bucketing, so the oracle is the plain join over
  * the raw parquet — proving the bucketed path computes the same
  * answer. */
object Bucketing {

  /** Bucketed-table names are scoped by a dir tag so sf0.01 and sf0.1
    * runs never read each other's buckets. */
  private def tag(dir: String): String = graft.util.Tables.pathTag(dir)

  /** Drop a managed table AND its warehouse location: the session
    * catalog is in-memory, so a table written by a previous JVM leaves
    * an orphaned location that blocks re-creation. */
  private def dropStale(spark: SparkSession, tbl: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    // saveAsTable lowercases identifiers; the warehouse dir is the
    // lowercase name (a mixed-case tag would otherwise orphan the real
    // directory and block the subsequent saveAsTable)
    val p = new org.apache.hadoop.fs.Path(s"$wh/${tbl.toLowerCase}")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Write `lineitem` + `orders` bucketed by order key — ONCE per
    * session: if the session catalog already has both tables, the
    * partitioning was paid and later calls go straight to the join
    * (the amortization that is the point of bucketing; Bench's timed
    * passes after warmup measure the join, not the write). A fresh
    * JVM has an empty in-memory catalog, so its first call drops any
    * stale on-disk locations and rewrites. */
  def writeBucketed(spark: SparkSession, dir: String, nBuckets: Int = 8)
      : (String, String) = {
    val liTbl = s"li_bucketed_${tag(dir)}"
    val ordTbl = s"ord_bucketed_${tag(dir)}"
    if (spark.catalog.tableExists(liTbl) && spark.catalog.tableExists(ordTbl))
      return (liTbl, ordTbl)
    dropStale(spark, liTbl)
    dropStale(spark, ordTbl)
    // repartition on the bucket key first so each task writes only its
    // own bucket files (otherwise every task emits nBuckets files)
    t(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
      .repartition(nBuckets, col("l_orderkey"))
      .write.mode("overwrite")
      .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(liTbl)
    t(spark, dir, "orders")
      .select("o_orderkey", "o_orderpriority", "o_orderstatus")
      .repartition(nBuckets, col("o_orderkey"))
      .write.mode("overwrite")
      .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(ordTbl)
    (liTbl, ordTbl)
  }

  /** The co-located join itself (no aggregation) — used by the spec to
    * assert an exchange-free physical plan. The `merge` hint pins the
    * sort-merge strategy: at test SFs the orders side is under the
    * broadcast threshold and AQE would broadcast it, but the shape
    * being demonstrated is the big⨝big join where broadcasting is
    * impossible — bucketing is what removes its shuffles. */
  def bucketedJoinOnly(spark: SparkSession, dir: String): DataFrame = {
    val (liTbl, ordTbl) = writeBucketed(spark, dir)
    spark.table(liTbl).hint("merge").join(spark.table(ordTbl),
      col("l_orderkey") === col("o_orderkey"))
  }

  /** Registered query: revenue by priority × status through the
    * bucketed join. Only the small post-join aggregate shuffles. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame =
    bucketedJoinOnly(spark, dir)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderpriority", "o_orderstatus")
}
