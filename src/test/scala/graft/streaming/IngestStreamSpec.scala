package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.config.TableConfig
import graft.lake.LakeLayout
import graft.load.Strategies
import graft.ops.Ingest

class IngestStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def fixture(name: String) = Paths.get(
    s"${Ingest.FixtureDir}/inbound/sap/customers/$name")

  test("streaming upsert ingest: files landed in sequence merge like batch") {
    val base = Files.createTempDirectory("graft-ingest-stream").toString
    val watch = s"$base/inbound"
    Files.createDirectories(Paths.get(watch))
    val layout = LakeLayout(s"$base/landing", s"$base/config", s"$base/curated")
    val cfg = TableConfig.fromFile(
      s"${Ingest.FixtureDir}/config/sap/customers_upsert/customers_upsert_config.json")

    // first file must exist before start (schema + first batch)
    Files.copy(fixture("customers_20240628.csv"),
      Paths.get(s"$watch/customers_20240628.csv"),
      StandardCopyOption.REPLACE_EXISTING)
    val q = IngestStream.start(spark, watch, cfg, layout, "sap", "customers",
      s"$base/ckpt", clock = Some(Ingest.Clock))
    try {
      q.processAllAvailable()
      val afterFirst = Strategies.readCurated(spark,
        layout.curatedPath("sap", "customers"))
      assert(afterFirst.count() == 20)

      // corrections batch lands while the stream runs: same dt, merge
      Files.copy(fixture("customers_r2_20240628.csv"),
        Paths.get(s"$watch/customers_r2_20240628.csv"))
      q.processAllAvailable()
      val merged = Strategies.readCurated(spark,
        layout.curatedPath("sap", "customers"))
      assert(merged.count() == 25) // 10 kept + 10 updated + 5 inserted
      import spark.implicits._
      val id11 = merged.filter(org.apache.spark.sql.functions.col("id") === 11)
        .select("name").as[String].head()
      assert(id11 == "Cust 11 r2") // updated row won

      // new-dt batch: all inserted (merge key includes dt)
      Files.copy(fixture("customers_20240629.csv"),
        Paths.get(s"$watch/customers_20240629.csv"))
      q.processAllAvailable()
      val fin = Strategies.readCurated(spark,
        layout.curatedPath("sap", "customers"))
      assert(fin.count() == 35)
      assert(fin.select("dt").distinct().count() == 2)

      // zone parity with the batch loader: every micro-batch also wrote
      // its raw pre-dt projection to the landing zone under the config's
      // landing strategy — here `overwrite`, so the zone holds exactly
      // the LATEST micro-batch (the 10-row 0629 file), like the batch
      // loader after its last file
      val landing = spark.read.parquet(layout.landingPath("sap", "customers"))
      assert(landing.count() == 10)
      assert(!landing.columns.contains("dt"), "landing must be pre-dt")
      assert(!landing.columns.contains("cret_ts"), "landing must be raw")
    } finally q.stop()
  }

  test("streaming ingest applies timestamp_normalize like the batch loader") {
    val base = Files.createTempDirectory("graft-ingest-ts").toString
    val watch = s"$base/inbound"
    Files.createDirectories(Paths.get(watch))
    val layout = LakeLayout(s"$base/landing", s"$base/config", s"$base/curated")
    val cfg = TableConfig.fromFile(
      s"${Ingest.FixtureDir}/config/sap/signals/signals_config.json")
    Files.copy(
      Paths.get(s"${Ingest.FixtureDir}/inbound/sap/signals/signals_20240628.csv"),
      Paths.get(s"$watch/signals_20240628.csv"),
      StandardCopyOption.REPLACE_EXISTING)
    val q = IngestStream.start(spark, watch, cfg, layout, "sap", "signals",
      s"$base/ckpt", clock = Some(Ingest.Clock))
    try {
      q.processAllAvailable()
      val curated = Strategies.readCurated(spark,
        layout.curatedPath("sap", "signals"))
      // normalized columns are instants in the curated zone...
      Seq("ev_ms", "ev_mixed", "ev_iso").foreach { c =>
        assert(curated.schema(c).dataType ==
          org.apache.spark.sql.types.TimestampType,
          s"$c must normalize to TimestampType in the curated zone")
      }
      // ...with the same values the batch loader produces (the
      // registered ingest_ts_normalize query, oracle-checked): row 2
      // of ev_mixed is a nano epoch — exact equality catches any
      // double-math rounding on the streaming path too.
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, unix_micros}
      val mixed = curated.orderBy("id").select(unix_micros(col("ev_mixed")))
        .as[Long].collect().toSeq
      assert(mixed == Seq(1719561600123456L, 1719565200456789L,
        1719568800000000L, 1719572400012000L, 1719576000345678L))
      // landing stays raw: the epoch columns are still integers there
      val landing = spark.read.parquet(layout.landingPath("sap", "signals"))
      assert(landing.schema("ev_mixed").dataType ==
        org.apache.spark.sql.types.LongType, "landing must keep raw encoding")
    } finally q.stop()
  }
}
