package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class InspectSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("snapshotDiff classifies insert/update/delete and drops unchanged") {
    val old = Seq((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", 4.0))
      .toDF("id", "s", "v")
    val neu = Seq((1, "a", 1.0), (2, "B", 2.0), (3, "c", 9.0), (5, "e", 5.0))
      .toDF("id", "s", "v")
    val out = Inspect.snapshotDiff(old, neu, Seq("id"), Seq("s", "v"))
      .select("id", "change_type").as[(Int, String)].collect().toSet
    assert(out == Set((2, "update"), (3, "update"), (4, "delete"),
      (5, "insert"))) // id 1 unchanged -> dropped
  }

  test("snapshotDiff payload compare is null-safe") {
    val old = Seq((1, Option.empty[String]), (2, Option("x")))
      .toDF("id", "s")
    val neu = Seq((1, Option.empty[String]), (2, Option.empty[String]))
      .toDF("id", "s")
    val out = Inspect.snapshotDiff(old, neu, Seq("id"), Seq("s"))
      .select("id", "change_type").as[(Int, String)].collect().toSet
    // NULL <=> NULL is unchanged; value -> NULL is an update
    assert(out == Set((2, "update")))
  }

  test("snapshotDiff with empty compare list is a keys-only diff") {
    val old = Seq((1, "a"), (2, "b")).toDF("id", "s")
    val neu = Seq((2, "CHANGED"), (3, "c")).toDF("id", "s")
    val out = Inspect.snapshotDiff(old, neu, Seq("id"), Seq.empty)
      .select("id", "change_type").as[(Int, String)].collect().toSet
    // payload changes are invisible without compare columns
    assert(out == Set((1, "delete"), (3, "insert")))
  }

  test("tableProfile handles non-identifier column names") {
    val df = Seq((1, "x"), (2, "y")).toDF("order key", "mary's column")
    val out = Inspect.tableProfile(df, Seq("order key", "mary's column"))
      .collect()
    assert(out.map(_.getString(0)).toSet == Set("order key", "mary's column"))
  }

  test("fkViolations detects orphans (testdata is all-zero through the gate)") {
    val dir = "/root/testdata/sf0.001"
    val out = Inspect.fkViolations(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(out.keySet == Set("lineitem->orders", "lineitem->part",
      "lineitem->supplier", "orders->customer"))
    assert(out.values.forall(_ == 0L)) // synthetic data is intact
    // prove the non-zero path: histogram-check on hand-built frames
    val facts = Seq((1, 10), (2, 10), (3, 99)).toDF("fk", "payload")
    val parent = Seq(Tuple1(1), Tuple1(2)).toDF("pk")
    val orphans = facts
      .join(parent.withColumn("__p", org.apache.spark.sql.functions.lit(true)),
        $"fk" === $"pk", "left")
      .agg(org.apache.spark.sql.functions.sum(
        $"__p".isNull.cast("long"))).as[Long].head()
    assert(orphans == 1L)
  }

  test("fkViolations scans lineitem once, not once per relation") {
    val p = Inspect.fkViolations(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val scans = "lineitem\\.parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 lineitem scan, got $scans:\n$p")
  }

  test("tableProfile runs ONE pass over the table") {
    val df = graft.util.Tables.t(spark, "/root/testdata/sf0.001", "orders")
    val prof = Inspect.tableProfile(df, Seq("o_orderkey", "o_orderstatus"))
    val p = prof.queryExecution.executedPlan.toString
    val scans = "orders\\.parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 orders scan, got $scans:\n$p")
    // multi-distinct via Expand, not one aggregation subtree per column
    assert(p.contains("Expand"), p)
    val rows = prof.collect()
    assert(rows.length == 2)
    val orderkeyRow = rows.find(_.getString(0) == "o_orderkey").get
    assert(orderkeyRow.getLong(1) == df.count())   // n_rows
    assert(orderkeyRow.getLong(2) == 0L)           // n_nulls
    assert(orderkeyRow.getLong(3) == df.count())   // pk: all distinct
  }

  test("tableProfileApprox matches the exact twin within 5% at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    def byCol(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    val exact = byCol(Inspect.ordersProfile(spark, dir))
    val approx = byCol(Inspect.ordersProfileApprox(spark, dir))
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, (nRows, nNulls, nd, mn, mx)) =>
      val (aRows, aNulls, aNd, aMn, aMx) = approx(c)
      // everything except the distinct estimate is computed exactly
      assert(aRows == nRows && aNulls == nNulls && aMn == mn && aMx == mx, c)
      val relErr = math.abs(aNd - nd).toDouble / math.max(1L, nd)
      assert(relErr < 0.05, s"$c: approx $aNd vs exact $nd (err $relErr)")
    }
  }

  test("tableProfileApprox is one pass with no exact-distinct state") {
    val df = graft.util.Tables.t(spark, "/root/testdata/sf0.001", "orders")
    val prof = Inspect.tableProfileApprox(df, Seq("o_orderkey", "o_orderstatus"))
    val p = prof.queryExecution.executedPlan.toString
    val scans = "orders\\.parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 orders scan, got $scans:\n$p")
    // HLL sketches aggregate directly — no Expand row-multiplication and
    // no per-group exact-distinct state anywhere in the plan
    assert(!p.contains("count(distinct"), p)
    assert(p.contains("approx_count_distinct"), p)
  }

  test("dqAudit flags injected violations and passes the clean fixture") {
    import org.apache.spark.sql.functions._
    // dirty frame: duplicate pk (1), a null price, a negative price
    val dirty = Seq((1, Some(10.0)), (1, Some(5.0)), (2, None),
      (3, Some(-1.0))).toDF("pk", "price")
    val out = Inspect.dqAudit(dirty, Seq(
      Inspect.Expect("pk_unique",
        count(lit(1)) - countDistinct(col("pk")), 0),
      Inspect.Expect("price_complete",
        count(lit(1)) - count(col("price")), 0),
      Inspect.Expect("price_positive",
        sum(when(col("price") <= 0.0, 1L).otherwise(0L)), 0)))
      .as[(String, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("pk_unique")._2 == 1.0 && !out("pk_unique")._4)
    assert(out("price_complete")._2 == 1.0 && !out("price_complete")._4)
    assert(out("price_positive")._2 == 1.0 && !out("price_positive")._4)
    // the committed fixture passes its whole contract
    val clean = Inspect.ordersDqAudit(spark, "/root/testdata/sf0.001")
      .as[(String, Double, Double, Boolean)].collect()
    assert(clean.length == 7 && clean.forall(_._4), clean.toSeq.toString)
  }

  test("dqAudit over an EMPTY table yields verdicts, not NULLs") {
    import org.apache.spark.sql.functions._
    val empty = Seq.empty[(Int, Option[Double])].toDF("pk", "price")
    val out = Inspect.dqAudit(empty, Seq(
      Inspect.Expect("nonempty",
        when(count(lit(1)) >= 1, lit(0L)).otherwise(lit(1L)), 0),
      Inspect.Expect("price_positive",
        sum(when(col("price") <= 0.0, 1L).otherwise(0L)), 0)))
      .as[(String, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(!out("nonempty")._4)                       // emptiness flagged
    assert(out("price_positive")._2 == 0.0 &&
      out("price_positive")._4)                       // vacuously green
  }

  test("dqAudit computes every expectation in ONE scan") {
    val audit = Inspect.ordersDqAudit(spark, "/root/testdata/sf0.001")
    val p = audit.queryExecution.executedPlan.toString
    val scans = "orders\\.parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 orders scan, got $scans:\n$p")
  }

  test("eventAnomaly: spike flagged, constant series zero, hand-math exact (X94)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // type A: 9 quiet days of 2 events + 1 day of 20 → the spike must
    // flag; type B: constant 3/day → var 0, every z exactly 0.0
    val rows =
      (1 to 9).flatMap(d => Seq.fill(2)(("A", d))) ++
      Seq.fill(20)(("A", 10)) ++
      (1 to 10).flatMap(d => Seq.fill(3)(("B", d)))
    val events = rows.toDF("event_type", "d")
      .withColumn("ts", to_timestamp(
        format_string("2024-06-%02d 07:3%s:00", col("d"),
          pmod(col("d"), lit(2)))))
      .select(col("event_type"), col("ts"))
    val got = Inspect.eventAnomalyFrom(events).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))
    val a = got.filter(_._1 == "A")
    val b = got.filter(_._1 == "B")
    assert(a.length == 10 && b.length == 10)
    // A: mean 38/10 = 3.8; var = (9*4+400)/10 - 3.8^2 = 29.16
    val meanA = 3.8; val sdA = math.sqrt(43.6 - meanA * meanA)
    a.foreach { case (_, n, m, z, flag) =>
      assert(m == meanA)
      val want = (n.toDouble - meanA) / sdA
      assert(math.abs(z - want) < 1e-12)
      assert(flag == (math.abs(want) >= Inspect.AnomalyZ))
    }
    assert(a.count(_._5) == 1 && a.exists(r => r._2 == 20L && r._5),
      "exactly the spike day flags")
    // B: constant series — var 0 exactly (integer identity), z 0.0
    b.foreach { case (_, n, m, z, flag) =>
      assert(n == 3L && m == 3.0 && z == 0.0 && !flag)
    }
  }
}
