package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Sample-code driver: StreamingOps over a REAL file-source stream
  * (readStream.parquet on a watched dir), compared to the batch twin.
  * Run: sbt "Test/runMain graft.tools.StreamFileDemo <watchDir>" */
object StreamFileDemo {
  def main(args: Array[String]): Unit = {
    val watch = args.headOption.getOrElse("/tmp/stream_in")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchRaw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    def fix(df: org.apache.spark.sql.DataFrame) =
      graft.util.Tables.normalizeEventTs(df)
    val stream = spark.readStream.schema(batchRaw.schema).parquet(watch)
    val q = StreamingOps.tumblingCounts(fix(stream)).writeStream
      .format("memory").queryName("t").outputMode("complete").start()
    def land(name: String): Unit = java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$watch/$name"))
    land("e1.parquet")
    q.processAllAvailable()
    val streamed = spark.table("t").collect().map(_.toSeq).toSet
    val batch = StreamingOps.tumblingCounts(fix(batchRaw))
      .collect().map(_.toSeq).toSet
    println(s"STREAMED_ROWS=${streamed.size} BATCH_ROWS=${batch.size} EQUAL=${streamed == batch}")
    land("e2.parquet")
    q.processAllAvailable()
    val evenCounts = spark.table("t").collect().forall(_.getLong(2) % 2 == 0)
    println(s"AFTER_DUP even_counts=$evenCounts rows=${spark.table("t").count()}")
    q.stop(); spark.stop()
  }
}
