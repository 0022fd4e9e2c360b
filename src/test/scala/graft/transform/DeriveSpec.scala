package graft.transform

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class DeriveSpec extends AnyFunSuite {

  test("dt derivation: v2 rule — last segment, last _ part, pre-extension") {
    assert(Derive.dtFromFileName(
      "inbound/sap/customers/customers_20240628.csv") == "2024-06-28")
    assert(Derive.dtFromFileName("x/y/a_b_20231201.csv.gz") == "2023-12-01")
  }

  test("dt derivation: v1 regex fallback when v2 slice isn't 8 digits") {
    // v2 rule yields "final" (not digits) → fall back to anywhere-regex
    assert(Derive.dtFromFileName("in/20240628/data_final.csv") == "2024-06-28")
  }

  test("dt derivation: 'unknown' fallback (v1, generic_load_script.py:126)") {
    assert(Derive.dtFromFileName("inbound/sap/customers/nodate.csv")
      == "unknown")
  }

  test("audit columns: pinned clock is deterministic and TZ-independent") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val clock = Timestamp.from(java.time.Instant.parse("2024-07-01T00:00:00Z"))
    val out = Derive.withAudit(Seq(1, 2).toDF("v"), "tester", Some(clock))
    val rows = out.collect()
    assert(out.columns.toSeq ==
      Seq("v", "updt_nm", "cret_nm", "cret_ts", "updt_ts"))
    assert(rows.forall(_.getAs[String]("cret_nm") == "tester"))
    assert(rows.forall(_.getAs[Timestamp]("cret_ts").toInstant ==
      java.time.Instant.parse("2024-07-01T00:00:00Z")))
  }

  test("projection: None and empty mean identity") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq((1, "a")).toDF("x", "y")
    assert(Derive.project(df, None).columns.toSeq == Seq("x", "y"))
    assert(Derive.project(df, Some(Seq("y"))).columns.toSeq == Seq("y"))
  }

  test("normalizeTimestamps: every unit and auto-dispatch in int space") {
    val spark = SparkTestSession.spark
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import spark.implicits._
    import org.apache.spark.sql.functions.unix_micros
    val base = 1719561600123456L // 2024-06-28 08:00:00.123456 UTC in µs
    // One row per unit through the SAME auto column — per-row dispatch,
    // not a whole-column guess. Nanos value exceeds 2^53: a double-math
    // implementation would round it and fail the exact equality.
    val df = Seq(
      ("s",  base / 1000000L,        (base / 1000000L) * 1000000L),
      ("ms", base / 1000L,           (base / 1000L) * 1000L),
      ("us", base,                   base),
      ("ns", base * 1000L + 789L,    base)
    ).toDF("unit", "v", "want_us")
    val out = Derive.normalizeTimestamps(df, Seq("v" -> "auto"))
    assert(out.schema("v").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(out.select(unix_micros($"v") === $"want_us")
      .collect().forall(_.getBoolean(0)))
    // Explicit units: millis on a long, string cast, int seconds (the
    // widen-first guard: int*1000000 would overflow in int math).
    val ms = Derive.normalizeTimestamps(
      Seq(base / 1000L).toDF("t"), Seq("t" -> "millis"))
    assert(ms.select(unix_micros($"t")).head.getLong(0) == (base / 1000L) * 1000L)
    val iso = Derive.normalizeTimestamps(
      Seq("2024-06-28 08:00:00").toDF("t"), Seq("t" -> "auto"))
    assert(iso.select(unix_micros($"t")).head.getLong(0) == 1719561600000000L)
    val sec = Derive.normalizeTimestamps(
      Seq((base / 1000000L).toInt).toDF("t"), Seq("t" -> "seconds"))
    assert(sec.select(unix_micros($"t")).head.getLong(0) ==
      (base / 1000000L) * 1000000L)
    // Unsupported source type names the column.
    val ex = intercept[IllegalArgumentException] {
      Derive.normalizeTimestamps(Seq(1.5).toDF("t"), Seq("t" -> "auto"))
    }
    assert(ex.getMessage.contains("t") && ex.getMessage.contains("Double"))
    // v1 all-string mode: a NUMERIC string honors the declared unit (a
    // plain timestamp cast would silently NULL it) while textual
    // timestamps in the same column still parse.
    val strs = Derive.normalizeTimestamps(
      Seq((base / 1000L).toString, "2024-06-28 08:00:00").toDF("t"),
      Seq("t" -> "millis"))
    assert(strs.select(unix_micros($"t")).collect().map(_.getLong(0)).toSeq ==
      Seq((base / 1000L) * 1000L, 1719561600000000L))
    // A spec entry naming an absent column fails with the column named,
    // not Spark's generic schema error mid-load.
    val missing = intercept[IllegalArgumentException] {
      Derive.normalizeTimestamps(Seq(1L).toDF("t"), Seq("nope" -> "auto"))
    }
    assert(missing.getMessage.contains("nope") &&
      missing.getMessage.contains("timestamp_normalize"))
  }
}
