package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.config.TableConfig
import graft.lake.{InboundKey, LakeLayout}
import graft.ops.Ingest

class GenericLoaderSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def freshLayout(): LakeLayout = {
    val base = Files.createTempDirectory("graft-loader").toString
    LakeLayout(s"$base/landing", s"$base/config", s"$base/curated")
  }

  private val cfg = TableConfig.fromFile(
    s"${Ingest.FixtureDir}/config/sap/customers_append/customers_append_config.json")

  test("end-to-end: landing is raw pre-dt, curated carries dt+audit (v2 ordering)") {
    val layout = freshLayout()
    val curated = GenericLoader.run(spark, GenericLoader.LoadRun(
      s"${Ingest.FixtureDir}/inbound/sap/customers/customers_20240628.csv",
      "sap", "customers", cfg, layout, clock = Some(Ingest.Clock)))
    // landing: projection only — no dt, no audit (FInal/load_script.py:197-216)
    val landing = spark.read.parquet(layout.landingPath("sap", "customers"))
    assert(landing.columns.toSeq == Seq("id", "name", "city", "bal"))
    // curated: projection + dt + audit, dt read back as string
    assert(curated.columns.sorted.toSeq == Seq("bal", "city", "cret_nm",
      "cret_ts", "dt", "id", "name", "updt_nm", "updt_ts"))
    assert(curated.select("dt").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("2024-06-28"))
    assert(curated.count() == 20 && landing.count() == 20)
  }

  test("gzip CSV is read by the scan itself, no staging step (S1)") {
    val layout = freshLayout()
    val curated = GenericLoader.run(spark, GenericLoader.LoadRun(
      s"${Ingest.FixtureDir}/inbound/sap/customers/customers_20240630.csv.gz",
      "sap", "customers", cfg, layout, clock = Some(Ingest.Clock)))
    assert(curated.count() == 15)
    assert(curated.select("dt").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("2024-06-30"))
  }

  test("inbound key parsing (E1, FInal/script.sh:13-16)") {
    val k = InboundKey.parse("inbound/sap/customers/customers_20240628.csv")
    assert(k == InboundKey("inbound", "sap", "customers",
      "customers_20240628.csv"))
    intercept[IllegalArgumentException](InboundKey.parse("inbound/sap"))
  }

  test("lake layout: v2 config addressing + s3a scheme rewrite (E2/E5)") {
    val l = LakeLayout("s3://land", "s3://cfg", "s3://cur")
    assert(l.configPath("sap", "customers")
      == "s3://cfg/sap/customers/customers_config.json")
    assert(l.curatedPath("sap", "customers") == "s3a://cur/sap/customers")
    assert(LakeLayout.sparkScheme("/local/path") == "/local/path")
  }
}
