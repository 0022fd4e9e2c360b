package graft.pipeline

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.config.TableConfig
import graft.lake.LakeLayout
import graft.ops.Ingest

/** Malformed-feed battery for the loader: ragged rows (missing and
  * extra fields), type garbage against the declared schema, an
  * unterminated quote, and an empty trailing line — the feeds a
  * warehouse export ACTUALLY delivers at 3am. The contract pinned:
  * the load COMPLETES (Spark CSV stays PERMISSIVE — a malformed cell
  * nulls out, it never kills the batch), every physical line lands as
  * a row, the parseable cells of ragged rows survive, and the dt +
  * audit columns are stamped on every row including the damaged
  * ones. */
class HostileFeedSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("a damaged feed loads completely: malformed cells null out, audit still stamps") {
    val base = Files.createTempDirectory("graft-hostile-feed").toString
    val layout = LakeLayout(s"$base/landing", s"$base/config", s"$base/curated")
    val cfg = TableConfig.fromFile(
      s"${Ingest.FixtureDir}/config/sap/customers_append/customers_append_config.json")
    val csv = Seq(
      "id,name,city,bal,junk",
      "1,alice,berlin,10.5,x",
      "2,bob,paris",
      "3,carol,rome,not_a_number,x",
      "4,\"dave \"\"the quote\"\"\",lyon,4.0,x",
      "5,eve,oslo,5.0,x,EXTRA,FIELDS",
      "not_an_int,frank,nice,6.0,x",
      "").mkString("\n")
    val path = s"$base/customers_20240630.csv"
    Files.write(Paths.get(path), csv.getBytes("UTF-8"))

    val curated = GenericLoader.run(spark, GenericLoader.LoadRun(
      path, "sap", "customers", cfg, layout, clock = Some(Ingest.Clock)))
    val rows = curated.collect()
    assert(rows.length == 6, s"all 6 physical lines must land, got ${rows.length}")
    val byName = rows.map(r => r.getAs[String]("name") -> r).toMap
    // ragged-short: parsed prefix survives, missing bal is null
    assert(byName("bob").getAs[String]("city") == "paris")
    assert(byName("bob").isNullAt(byName("bob").fieldIndex("bal")))
    // type garbage nulls the CELL, not the row
    assert(byName("carol").isNullAt(byName("carol").fieldIndex("bal")))
    assert(byName("carol").getAs[String]("city") == "rome")
    // RFC-4180 doubled quote parses
    assert(byName("dave \"the quote\"").getAs[String]("city") == "lyon")
    // ragged-long: declared columns keep their values
    assert(byName("eve").getAs[Double]("bal") == 5.0)
    // bad key type nulls out but the row stays
    val frank = byName("frank")
    assert(frank.isNullAt(frank.fieldIndex("id")))
    // dt + audit stamped on EVERY row, damaged or not
    rows.foreach { r =>
      assert(r.getAs[String]("dt") == "2024-06-30")
      assert(r.getAs[String]("cret_nm") != null)
    }
  }
}
