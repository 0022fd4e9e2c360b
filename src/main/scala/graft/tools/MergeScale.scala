package graft.tools

import org.apache.spark.sql.functions._
import graft.load.Strategies
import graft.util.GraftSession

/** Evidence harness for the partition-scoped-merge claim: upsert the
  * SAME 2,000-row batch (2 touched dt partitions, half updates / half
  * inserts) into a 1× and a 10× curated table (100k / 1M rows over 30
  * dt partitions). If the merge really only reads, merges and swaps
  * the touched partitions, cost tracks the touched-partition size
  * (which grows 10× here, but is 1/15 of the table) — NOT the table
  * scan a naive overwrite pays. Results land in SCALE_NOTES.md. */
object MergeScale {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession
      .builder("graft-mergescale", Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dts = (1 to 30).map(d => f"2024-01-$d%02d")
    val dtLit = typedlit(dts)
    def mkRows(n: Long, idStep: Long, idOffset: Long) =
      spark.range(n).select(
        (col("id") * idStep + idOffset).as("id"),
        md5(col("id").cast("string")).as("payload"),
        element_at(dtLit,
          (pmod(col("id") * idStep + idOffset, lit(30)) + 1).cast("int"))
          .as("dt"))
    val fs = new org.apache.hadoop.fs.Path("target/graft_mergescale")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(1, 10).foreach { s =>
      val baseRows = 100000L * s
      val path = s"target/graft_mergescale/x$s"
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      // seed table: ids 0..baseRows step 1, uniform over the 30 dts
      Strategies.writeCurated(spark, mkRows(baseRows, 1L, 0L), path,
        "upsert", Seq("id"))
      // batch: step 15 → ids ≡ {0,15} (mod 30) → exactly 2 distinct
      // dts; first half existing ids (updates), second half beyond the
      // table (inserts). The insert offset must be ≡ 0 (mod 30) or the
      // insert half lands in two OTHER dts and the batch touches 4.
      val insertOffset = (baseRows * 2 / 30) * 30
      val batch = mkRows(1000, 15L, 0L)
        .unionByName(mkRows(1000, 15L, insertOffset))
      batch.count() // materialize plan costs outside the timed region
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Strategies.writeCurated(spark, batch, path, "upsert", Seq("id"))
        (System.nanoTime() - t0) / 1e9
      }
      val n = spark.read.parquet(path).count()
      println(f"MERGESCALE x$s%-3d table=$baseRows%8d rowsAfter=$n%8d " +
        f"upsert_min=${times.min}%6.2f s  runs=${times.map(t => f"$t%4.2f").mkString(",")}")
    }
    spark.stop()
  }
}
