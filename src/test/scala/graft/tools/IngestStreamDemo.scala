package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.config.TableConfig
import graft.lake.LakeLayout
import graft.load.Strategies
import graft.ops.Ingest
import graft.streaming.IngestStream

/** Sample-code driver: the streaming loader over a real watched dir.
  * Run: sbt "Test/runMain graft.tools.IngestStreamDemo" */
object IngestStreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.GraftSession.local("ingest-stream-demo", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val base = Files.createTempDirectory("graft-isd").toString
    val watch = s"$base/inbound"; Files.createDirectories(Paths.get(watch))
    val layout = LakeLayout(s"$base/landing", s"$base/config", s"$base/curated")
    val cfg = TableConfig.fromFile(
      s"${Ingest.FixtureDir}/config/sap/customers_upsert/customers_upsert_config.json")
    def land(f: String) = Files.copy(
      Paths.get(s"${Ingest.FixtureDir}/inbound/sap/customers/$f"),
      Paths.get(s"$watch/$f"), StandardCopyOption.REPLACE_EXISTING)
    def curated = Strategies.readCurated(spark,
      layout.curatedPath("sap", "customers"))
    land("customers_20240628.csv")
    val q = IngestStream.start(spark, watch, cfg, layout, "sap", "customers",
      s"$base/ckpt", clock = Some(Ingest.Clock))
    q.processAllAvailable()
    println(s"AFTER_FIRST rows=${curated.count()}")
    land("customers_r2_20240628.csv"); q.processAllAvailable()
    import org.apache.spark.sql.functions.col
    val id11 = curated.filter(col("id") === 11).select("name").head().getString(0)
    println(s"AFTER_MERGE rows=${curated.count()} id11=$id11")
    // probe: restart the stream with the same checkpoint - processed
    // files must NOT re-merge (exactly-once discovery)
    q.stop()
    val q2 = IngestStream.start(spark, watch, cfg, layout, "sap", "customers",
      s"$base/ckpt", clock = Some(Ingest.Clock))
    q2.processAllAvailable()
    println(s"AFTER_RESTART rows=${curated.count()}")
    land("customers_20240629.csv"); q2.processAllAvailable()
    println(s"AFTER_NEWDT rows=${curated.count()} dts=${curated.select("dt").distinct().count()}")
    q2.stop(); spark.stop()
  }
}
