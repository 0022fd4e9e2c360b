package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.util.Tables.t

class JoinReductionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("bloomReduceJoin equals the plain join exactly") {
    import spark.implicits._
    val reduced = JoinReduction.bloomJoin(spark, dir)
      .as[(String, Double, Long)].collect().sorted.toSeq
    val plain = t(spark, dir, "lineitem")
      .join(t(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(t(spark, dir, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .join(t(spark, dir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(
        graft.util.Tables.dsum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .as[(String, Double, Long)].collect().sorted.toSeq
    assert(reduced == plain)
  }

  test("the plan probes a bloom filter BELOW the join") {
    val plan = JoinReduction.bloomJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a bloom probe in the plan:\n$plan")
    // The probe must sit on the fact scan side, i.e. appear as a
    // Filter, not be folded away — the reduction IS the filter.
    assert("might_contain".r.findAllIn(plan).nonEmpty &&
      plan.contains("Filter"), s"no filter with bloom probe:\n$plan")
  }

  test("bloom pre-filter keeps every true match (no false negatives)") {
    // Every l_suppkey that survives the real join must also pass the
    // bloom probe — compare the reduced fact row count contribution
    // against the true per-key match counts.
    val dim = t(spark, dir, "supplier")
      .join(t(spark, dir, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .join(t(spark, dir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select(col("s_suppkey"))
    val fact = t(spark, dir, "lineitem").select(col("l_suppkey"))
    val joined = JoinReduction.bloomReduceJoin(
      fact, dim, "l_suppkey", "s_suppkey", expectedItems = 1000L)
    val expected = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
    assert(joined.count() == expected.count())
  }

  test("a tiny bloom (high fpp) still yields the exact join result") {
    // Deliberately undersized filter: lots of false positives, all of
    // which must die in the join — the contract under any sizing.
    val dim = t(spark, dir, "supplier").filter(col("s_suppkey") % 7 === 0)
      .select(col("s_suppkey"))
    val fact = t(spark, dir, "lineitem").select(col("l_suppkey"))
    val sloppy = JoinReduction.bloomReduceJoin(
      fact, dim, "l_suppkey", "s_suppkey",
      expectedItems = 2, fpp = 0.5)
    val expected = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
    assert(sloppy.count() == expected.count())
  }

  test("null fact keys die at the scan, and the result still equals the plain join") {
    import spark.implicits._
    // xxhash64 is null-safe (null hashes to the seed), so without the
    // explicit isNotNull a null-keyed row could pass the bloom probe
    // and ride to the equi-join. The contract: nulls never appear in
    // the output (equi-join semantics) AND never survive the pre-filter.
    val fact = Seq(Some(1L), Some(2L), None, None, Some(99L))
      .toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val joined = JoinReduction.bloomReduceJoin(
      fact, dim, "fk", "dk", expectedItems = 10L)
    assert(joined.select("fk").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // the scan-side reduction really drops the null rows pre-join
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isnotnull(fk"),
      s"expected an isnotnull(fk) scan filter in:\n$plan")
  }

  test("bloomReduceJoin with an EMPTY dim returns an empty result") {
    // bloom_filter_agg over zero rows yields a null filter;
    // might_contain(null, ...) is null, the filter drops every fact
    // row, and the join of nothing with nothing is empty — matching
    // the plain join's answer for an empty dim.
    val dim = t(spark, dir, "supplier")
      .filter(col("s_suppkey") < 0).select(col("s_suppkey"))
    val fact = t(spark, dir, "lineitem").select(col("l_suppkey"))
    val joined = JoinReduction.bloomReduceJoin(
      fact, dim, "l_suppkey", "s_suppkey", expectedItems = 10L)
    assert(joined.count() == 0L)
  }

  test("skewJoin equals the plain unsalted join") {
    import spark.implicits._
    val salted = Analytics.skewJoin(spark, dir)
      .as[(String, Double, Long)].collect().toSeq
    val weights = Seq(
      ("click", 1.0), ("view", 0.5), ("purchase", 10.0),
      ("signup", 5.0), ("error", 0.0)).toDF("event_type", "weight")
    val plain = t(spark, dir, "events")
      .join(weights, "event_type")
      .groupBy(col("event_type"))
      .agg(
        graft.util.Tables.dsum(col("value") * col("weight"))
          .as("weighted_value"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
      .as[(String, Double, Long)].collect().toSeq
    assert(salted == plain)
  }
}
