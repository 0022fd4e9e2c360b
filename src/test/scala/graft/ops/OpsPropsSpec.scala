package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Cross-operator invariants (SURVEY.md §5.2.3) on real testdata. */
class OpsPropsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("property: exact dedup output ⊆ input and equals the input's distinct set") {
    import spark.implicits._
    val input = graft.util.Tables.t(spark, dir, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_orderkey")
      .as[(String, String, Long)].collect()
    val out = Analytics.dedupExact(spark, dir)
      .as[(String, String, Long)].collect()
    assert(out.toSet.subsetOf(input.toSet))
    assert(out.toSet == input.toSet) // distinct loses nothing
    assert(out.length == input.toSet.size) // and keeps exactly one each
  }

  test("property: top-k equals the k-prefix of the fully sorted input") {
    import spark.implicits._
    val all = graft.util.Tables.t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .as[(Long, Long, Double)].collect()
      .sortBy(r => (-r._3, r._1))
    val topk = Analytics.topKOrders(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(topk.toSeq == all.take(25).toSeq)
  }

  test("property: clean_corpus ⊆ quality survivors ⊆ all docs") {
    import spark.implicits._
    val cleaned = TextAnalysis.cleanCorpus(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    val quality = TextAnalysis.textQuality(spark, dir)
      .filter(org.apache.spark.sql.functions.col("n_tokens") >= 20 &&
        org.apache.spark.sql.functions.col("uniq_ratio") >= 0.35)
      .select("doc_id").as[Long].collect().toSet
    val all = graft.util.Tables.t(spark, dir, "documents")
      .select("doc_id").as[Long].collect().toSet
    assert(cleaned.subsetOf(quality) && quality.subsetOf(all))
  }

  test("property: keep-latest dedup emits exactly one row per key, the max") {
    import spark.implicits._
    val out = Analytics.dedupKeepLatest(spark, dir)
      .select("o_custkey").as[Long].collect()
    assert(out.length == out.distinct.length) // one per customer
    // spot-check maximality for one customer against raw data
    val c = out.head
    val best = graft.util.Tables.t(spark, dir, "orders")
      .filter(org.apache.spark.sql.functions.col("o_custkey") === c)
      .select("o_orderkey", "o_orderdate")
      .as[(Long, java.sql.Timestamp)].collect()
      .maxBy(r => (r._2.getTime, r._1))
    val got = Analytics.dedupKeepLatest(spark, dir)
      .filter(org.apache.spark.sql.functions.col("o_custkey") === c)
      .select("o_orderkey").as[Long].head()
    assert(got == best._1)
  }

  test("property: bloomReduceJoin == plain join on random key sets") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      // random overlap profile per trial: fact keys from a wide space,
      // dim keys a random mix of hits and misses, with duplicates on
      // the fact side (a join multiplies them)
      val factKeys = Seq.fill(500)(rnd.nextInt(200).toLong)
      val dimKeys = rnd.shuffle((0L until 200L) ++ (1000L until 1200L))
        .take(rnd.nextInt(60) + 1).distinct
      val fact = factKeys.zipWithIndex.toDF("k", "payload")
      val dim = dimKeys.toDF("dk")
      val reduced = JoinReduction.bloomReduceJoin(
        fact, dim, "k", "dk", expectedItems = 64, fpp = 0.2)
        .select("k", "payload").as[(Long, Int)].collect().sorted.toSeq
      val plain = fact.join(dim, col("k") === col("dk"))
        .select("k", "payload").as[(Long, Int)].collect().sorted.toSeq
      assert(reduced == plain, s"trial $trial diverged")
    }
  }
}
