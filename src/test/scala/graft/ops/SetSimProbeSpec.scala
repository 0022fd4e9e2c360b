package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The set-similarity probes (X62b/X67b) must equal the registered
  * full self-joins RESTRICTED to cross (batch × corpus) pairs — the
  * same contract [[Dedup.neardupProbe]] pins against
  * [[Dedup.nearDupPairs]]. The DuckDB gate already brute-forces the
  * same relation; this spec closes the engine-internal loop (index
  * build, df-ranked batch prefix, streaming verification) against the
  * independently-implemented full join, so a bug in the shared index
  * could not hide behind an identical bug in the oracle pairing. */
class SetSimProbeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("jaccard_probe == jaccardPrefixJoin restricted to cross pairs") {
    import spark.implicits._
    val got = Dedup.jaccardProbe(spark, dir, minJaccard = 0.5)
      .select("new_doc", "corpus_doc", "inter", "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val full = Dedup.jaccardPrefixJoin(spark, dir, minJaccard = 0.5)
      .select("doc_a", "doc_b", "inter", "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long)].collect()
    val expected = full.flatMap { case (a, b, inter, na, nb) =>
      if (a % 7 == 0 && b % 7 != 0) Some((a, b, inter, na, nb))
      else if (b % 7 == 0 && a % 7 != 0) Some((b, a, inter, nb, na))
      else None
    }.toSet
    assert(got == expected)
    assert(got.nonEmpty, "t=0.5 must surface cross pairs at this sf")
  }

  test("containment_probe == containmentJoin restricted to cross pairs") {
    import spark.implicits._
    val got = Dedup.containmentProbe(spark, dir, minContain = 0.5)
      .select("new_doc", "corpus_doc", "inter", "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val expected = Dedup.containmentJoin(spark, dir, minContain = 0.5)
      .select("doc_a", "doc_b", "inter", "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long)].collect()
      .filter { case (a, b, _, _, _) => a % 7 == 0 && b % 7 != 0 }
      .toSet
    assert(got == expected)
    assert(got.nonEmpty, "t=0.5 must surface cross pairs at this sf")
  }
}
