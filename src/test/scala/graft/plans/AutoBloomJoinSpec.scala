package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The engine-behavior form of bloom join reduction: a PLAIN
  * `fact.join(dim)` — no JoinReduction call anywhere — must come out
  * of the optimizer bloom-reduced when the rule is enabled, unchanged
  * when it is not, and must never change results either way. */
class AutoBloomJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def probes(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) => f
    }.size

  /** Plain selective-dim equi-join, written as any user would. */
  private def plainJoin(): DataFrame = {
    val sup = graft.util.Tables.t(spark, dir, "supplier")
      .filter(col("s_nationkey") < 5)
      .select(col("s_suppkey"), col("s_name"))
    val fact = graft.util.Tables.t(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_quantity"))
    fact.join(sup, col("l_suppkey") === col("s_suppkey"))
  }

  private def withRule[A](on: Boolean)(body: => A): A = {
    spark.conf.set(AutoBloomJoin.ConfKey, on.toString)
    try body finally spark.conf.unset(AutoBloomJoin.ConfKey)
  }

  test("plain fact.join(dim) gets the bloom probe injected — engine behavior, no per-query code") {
    val off = withRule(on = false)(plainJoin().collect().toSet)
    withRule(on = true) {
      val df = plainJoin()
      assert(probes(df) == 1,
        "expected exactly ONE injected bloom probe (idempotence under " +
          "fixed-point optimization included)")
      // the probe must sit on the FACT side: the optimized join's
      // streamed child carries the might_contain filter
      assert(df.collect().toSet == off,
        "bloom reduction changed the join result")
    }
  }

  test("rule stays conservative: both-sides-filtered, non-equi, and disabled shapes are untouched") {
    withRule(on = true) {
      // both sides selectively filtered — ambiguous, skip
      val sup = graft.util.Tables.t(spark, dir, "supplier")
        .filter(col("s_nationkey") < 5)
      val cust = graft.util.Tables.t(spark, dir, "customer")
        .filter(col("c_nationkey") < 5)
      assert(probes(sup.join(cust,
        col("s_nationkey") === col("c_nationkey"))) == 0)
      // non-equi condition — skip
      val fact = graft.util.Tables.t(spark, dir, "lineitem")
        .select(col("l_suppkey"), col("l_quantity"))
      assert(probes(fact.join(sup,
        col("l_suppkey") < col("s_suppkey"))) == 0)
    }
    // disabled (default): plain join stays plain
    assert(probes(plainJoin()) == 0)
  }

  test("explicit bloomReduceJoin composes: already-probed fact is not double-injected") {
    def explicit() = {
      val sup = graft.util.Tables.t(spark, dir, "supplier")
        .filter(col("s_nationkey") < 5)
        .select(col("s_suppkey"), col("s_name"))
      val fact = graft.util.Tables.t(spark, dir, "lineitem")
        .select(col("l_suppkey"), col("l_quantity"))
      graft.ops.JoinReduction.bloomReduceJoin(
        fact, sup, "l_suppkey", "s_suppkey", expectedItems = 1000L)
    }
    // the rule must add NOTHING to an explicitly reduced join — same
    // probe count with the rule on and off (the explicit path's own
    // count includes whatever constraint inference mirrors; that
    // pre-exists the rule and is not its doing)
    val off = withRule(on = false)(probes(explicit()))
    val on = withRule(on = true)(probes(explicit()))
    assert(on == off,
      s"the rule stacked probes on an explicit reduction ($off -> $on)")
  }
}
