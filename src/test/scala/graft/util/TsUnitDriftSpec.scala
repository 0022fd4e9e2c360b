package graft.util

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Unit-drift differential property for the adaptive events reader:
  * the SAME event rows written under every on-disk `ts` encoding the
  * driver has shipped (epoch-nanos BIGINT, naive micros = the NTZ
  * read path, instant = TimestampType) must read back IDENTICALLY
  * through [[Tables.t]] — same schema, same micros, same windowed
  * aggregate. This is the property the round-7 breakage violated: a
  * testdata regeneration changed only the parquet unit and 16 queries
  * died at analysis; with the normalizer, encoding is a storage detail
  * the engine provably cannot observe. */
class TsUnitDriftSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark

  test("all three ts encodings read back identically through Tables.t") {
    Tables.ensureSessionConf(spark)
    import spark.implicits._
    val base = Scratch.under("ts_unit_drift")
    Scratch.deleteRecursive(base)
    val rows = Seq( // µs-aligned, like the driver testdata
      (1L, 1719561600000000L, 10L, "click", 1.5),
      (2L, 1719561600123456L, 10L, "view", 2.5),
      (3L, 1719565200500000L, 11L, "click", 3.5),
      (4L, 1719568800999999L, 12L, "purchase", 4.5))
    val src = rows.toDF("event_id", "us", "user_id", "event_type", "value")

    // instant: TimestampType column (what Spark itself writes)
    src.withColumn("ts", timestamp_micros($"us")).drop("us")
      .write.parquet(s"$base/instant/events.parquet")
    // naive micros: TIMESTAMP_NTZ column (what pandas writes —
    // isAdjustedToUTC=false, the current driver testdata shape)
    src.withColumn("ts", timestamp_micros($"us").cast("timestamp_ntz"))
      .drop("us").write.parquet(s"$base/ntz/events.parquet")
    // epoch-nanos BIGINT: the pre-round-8 driver shape as read under
    // nanosAsLong (a raw long column stands in for TIMESTAMP(NANOS) —
    // Spark can't WRITE nanos parquet, but the read path after
    // nanosAsLong is byte-identical to this)
    src.withColumn("ts", $"us" * 1000L).drop("us")
      .write.parquet(s"$base/nanos/events.parquet")
    // epoch-micros BIGINT: the long branch magnitude-dispatches the
    // unit per row, so a plain int64-micros regeneration cannot be
    // misread 1000× as nanos
    src.withColumn("ts", $"us").drop("us")
      .write.parquet(s"$base/uslong/events.parquet")

    def readBack(variant: String) = {
      val df = Tables.t(spark, s"$base/$variant", "events")
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType,
        s"$variant: ts must normalize to TimestampType")
      df.select($"event_id", unix_micros($"ts").as("us")).orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val instant = readBack("instant")
    assert(instant.map(_._2) == rows.map(_._2), "instant: micros drifted")
    assert(readBack("ntz") == instant, "NTZ encoding diverged")
    assert(readBack("nanos") == instant, "nanos encoding diverged")
    assert(readBack("uslong") == instant, "micros-long encoding diverged")

    // And a derived aggregate (the shape the 16 broken queries share):
    // hourly tumbling counts must be encoding-invariant too.
    def windowed(variant: String) =
      Tables.t(spark, s"$base/$variant", "events")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select(unix_micros($"window.start"), $"event_type", $"n")
        .collect().map(_.toSeq).toSet
    val w = windowed("instant")
    assert(w.nonEmpty && windowed("ntz") == w && windowed("nanos") == w)
  }

  test("naive date columns absorb the same drift class (orders.o_orderdate)") {
    Tables.ensureSessionConf(spark)
    import spark.implicits._
    val base = Scratch.under("date_unit_drift")
    Scratch.deleteRecursive(base)
    val us = Seq(
      (1L, 1719532800000000L), // 2024-06-28
      (2L, 1719619200000000L)) // 2024-06-29
    val src = us.toDF("o_orderkey", "us")
    src.withColumn("o_orderdate", timestamp_micros($"us").cast("timestamp_ntz"))
      .drop("us").write.parquet(s"$base/ntz/orders.parquet")
    src.withColumn("o_orderdate", timestamp_micros($"us")).drop("us")
      .write.parquet(s"$base/instant/orders.parquet")
    src.withColumn("o_orderdate", $"us" * 1000L).drop("us")
      .write.parquet(s"$base/nanos/orders.parquet")
    src.withColumn("o_orderdate", timestamp_micros($"us").cast("date"))
      .drop("us").write.parquet(s"$base/date/orders.parquet")
    def readBack(variant: String) = {
      val df = Tables.t(spark, s"$base/$variant", "orders")
      assert(df.schema("o_orderdate").dataType ==
        org.apache.spark.sql.types.TimestampNTZType,
        s"$variant: o_orderdate must normalize to TIMESTAMP_NTZ")
      df.select($"o_orderkey",
          unix_micros($"o_orderdate".cast("timestamp")).as("us"))
        .orderBy("o_orderkey")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val ntz = readBack("ntz")
    assert(ntz.map(_._2) == us.map(_._2), "ntz: micros drifted")
    assert(readBack("instant") == ntz && readBack("nanos") == ntz &&
      readBack("date") == ntz)
  }
}
