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
}
