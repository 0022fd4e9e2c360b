package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def orders = graft.util.Tables.t(spark, dir, "orders")
    .select($"o_custkey", $"o_orderkey", $"o_totalprice")

  test("matches the window row_number formulation exactly (total order)") {
    val native = TopK.topKPerKey(orders, Seq($"o_custkey"),
        Seq($"o_totalprice".desc, $"o_orderkey"), 3)
      .orderBy("o_custkey", "o_orderkey")
      .collect().toSeq
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).drop("rn")
      .orderBy("o_custkey", "o_orderkey")
      .collect().toSeq
    assert(native == viaWindow)
  }

  test("k larger than every group returns the whole input") {
    val small = Seq((1, 10), (1, 20), (2, 30)).toDF("k", "v")
    val out = TopK.topKPerKey(small, Seq($"k"), Seq($"v".desc), 99)
      .orderBy("k", "v").collect().toSeq
    assert(out == small.orderBy("k", "v").collect().toSeq)
  }

  test("empty keys = global top-k, matching orderBy.limit") {
    val global = TopK.topKPerKey(orders, Seq.empty,
        Seq($"o_totalprice".desc, $"o_orderkey"), 5)
      .orderBy($"o_totalprice".desc, $"o_orderkey").collect().toSeq
    val expected = orders.orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(5).collect().toSeq
    assert(global == expected)
  }

  test("empty input yields empty output") {
    val empty = Seq.empty[(Int, Int)].toDF("k", "v")
    assert(TopK.topKPerKey(empty, Seq($"k"), Seq($"v"), 2).count() == 0)
  }

  private def finalPlan(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  test("plans as partial heap -> ONE exchange -> final heap") {
    val df = TopK.topKPerKey(orders, Seq($"o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey"), 3)
    val p = df.queryExecution.executedPlan
    val execs = p.collect { case e: TopKPerKeyExec => e } ++ (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case e: TopKPerKeyExec => e }
      case _ => Nil
    })
    assert(execs.exists(_.partial) && execs.exists(!_.partial), p.toString)
    val s = p.toString
    assert("Exchange hashpartitioning\\(o_custkey".r.findAllIn(s).size == 1, s)
    // partial below the exchange, final above it (toString prints the
    // partial flag as the trailing boolean)
    val lines = s.split("\n")
    val iPartial = lines.indexWhere(l =>
      l.contains("TopKPerKey") && l.trim.endsWith("true"))
    val iFinal = lines.indexWhere(l =>
      l.contains("TopKPerKey") && l.trim.endsWith("false"))
    val iEx = lines.indexWhere(_.contains("Exchange hashpartitioning(o_custkey"))
    assert(iFinal < iEx && iEx < iPartial,
      s"expected final above exchange above partial:\n$s")
  }

  test("property: matches a reference Scala top-k on random data, many shapes") {
    // Deterministic pseudo-random corpus (seeded), multiple (n, k,
    // nKeys, partitions) shapes — every row unique via idx so the
    // total order makes the expected set exact.
    val rnd = new scala.util.Random(42)
    for {
      (n, nKeys, k, parts) <- Seq((0, 3, 2, 3), (57, 1, 4, 5),
        (200, 7, 1, 2), (500, 13, 3, 8), (300, 5, 100, 4))
    } {
      val data = (0 until n)
        .map(i => (rnd.nextInt(nKeys), rnd.nextInt(50), i.toLong))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(data, parts))
        .toDF("k", "v", "idx")
      val got = TopK.topKPerKey(df, Seq($"k"), Seq($"v".desc, $"idx"), k)
        .as[(Int, Int, Long)].collect().toSet
      val want = data.groupBy(_._1).values.flatMap(g =>
        g.sortBy(r => (-r._2, r._3)).take(k)).toSet
      assert(got == want, s"shape n=$n nKeys=$nKeys k=$k parts=$parts")
    }
  }

  test("float keys: -0.0/0.0 and all NaN bit patterns group together") {
    // Raw UnsafeRow grouping would split these; the strategy normalizes
    // keys like Catalyst's NormalizeFloatingNumbers does for Aggregate.
    val nan1 = java.lang.Double.longBitsToDouble(0x7ff8000000000000L)
    val nan2 = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    val data = Seq((0.0, 1L), (-0.0, 2L), (nan1, 3L), (nan2, 4L))
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(data, 2)).toDF("k", "v")
    val got = TopK.topKPerKey(df, Seq($"k"), Seq($"v".desc), 1)
      .as[(Double, Long)].collect().toSet
    // two groups — {0.0,-0.0} and {NaN,NaN} — each keeping its max v
    assert(got.map(_._2) == Set(2L, 4L), got.toString)
    // parity with the row_number formulation (Spark normalizes there)
    val w = Window.partitionBy($"k").orderBy($"v".desc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn").as[(Double, Long)].collect().toSet
    assert(got.map(_._2) == viaWindow.map(_._2))
  }

  test("shuffle carries at most partitions*keys*k rows, not the fact table") {
    // 4 input partitions, 5 keys, k=2: the partial phase must cut
    // 10,000 rows to <= 4*5*2 before the exchange.
    val big = spark.range(0, 10000, 1, 4)
      .select(($"id" % 5).as("k"), $"id".as("v"))
    val df = TopK.topKPerKey(big, Seq($"k"), Seq($"v".desc), 2)
    val out = df.collect()
    assert(out.length == 10) // 5 keys x top-2
    // read the partial exec's numOutputRows metric after execution;
    // AQE wraps each materialized stage in a QueryStageExec LEAF, so a
    // plain collect stops at the shuffle boundary — recurse through
    def collectAll(
        p: org.apache.spark.sql.execution.SparkPlan): Seq[TopKPerKeyExec] =
      p.collect { case e: TopKPerKeyExec => e } ++
        p.collect {
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => s
        }.flatMap(s => collectAll(s.plan))
    val partial = collectAll(finalPlan(df)).filter(_.partial)
    assert(partial.nonEmpty, finalPlan(df).toString)
    val shuffled = partial.map(_.metrics("numOutputRows").value).sum
    assert(shuffled > 0 && shuffled <= 4 * 5 * 2,
      s"partial emitted $shuffled rows")
  }
}
