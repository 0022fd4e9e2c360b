package graft.tools

import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Drives the cross-formulation parity the module doc promises:
  * StreamingOps over a REAL file-source stream vs the registered BATCH
  * query Analytics.tumblingWindow on the same data. */
object StreamParityDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.GraftSession.local("parity", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val watch = java.nio.file.Files.createTempDirectory("parity").toString
    val batchRaw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    def fix(df: org.apache.spark.sql.DataFrame) =
      graft.util.Tables.normalizeEventTs(df)
    val q = StreamingOps.tumblingCounts(
        fix(spark.readStream.schema(batchRaw.schema).parquet(watch)))
      .writeStream.format("memory").queryName("p")
      .outputMode("complete").start()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$watch/e.parquet"))
    q.processAllAvailable()
    val streamed = spark.table("p")
      .select("w_start_us", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    val batch = graft.ops.Analytics.tumblingWindow(spark, "/root/testdata/sf0.001")
      .select("w_start_us", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    println(s"PARITY stream==registered_batch_query: ${streamed == batch} (${batch.size} windows)")
    q.stop(); spark.stop()
  }
}
