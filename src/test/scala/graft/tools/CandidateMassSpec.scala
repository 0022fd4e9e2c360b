package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.ops.Dedup

/** Candidate-mass GATE for the exact set-similarity joins (VERDICT r10
  * item 8): the scale claim "prefix-filter candidate mass is
  * output-shaped at the default thresholds" was previously a
  * SCALE_NOTES measurement; this spec pins it. On a planted-duplicate
  * corpus (3 suffix-rotated copies of sf0.001 — the ScaleStress doc
  * family, where qualifying pairs stay within-copy while the shingle
  * df table and candidate space triple), the pre-verification
  * candidate count must stay within a constant factor of the true
  * output. A prefix-ordering regression (e.g. losing the rarity rank
  * or the positional bound) blows the ratio up by orders of magnitude
  * and fails here rather than surfacing as a 100× bench cliff. */
class CandidateMassSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    val out = graft.util.Scratch.under("candmass_spec/x3").toString
    if (!new java.io.File(s"$out/documents.parquet/_SUCCESS").exists())
      ScaleStress.buildDocCorpus(spark, "/root/testdata/sf0.001", out, 3)
    out
  }

  test("jaccard prefix candidates are output-shaped at t=0.7") {
    val cand = Dedup.jaccardCandidatePairs(spark, dir, 0.7).count()
    val out = Dedup.jaccardPrefixJoin(spark, dir, 0.7).count()
    info(s"jaccard t=0.7: candidates=$cand output=$out")
    assert(out > 0, "planted corpus must carry qualifying pairs")
    assert(cand <= 50L * out + 50L,
      s"candidate mass $cand not output-shaped (output $out)")
  }

  test("containment candidates are output-shaped at t=0.9") {
    val cand = Dedup.containmentCandidatePairs(spark, dir, 0.9).count()
    val out = Dedup.containmentJoin(spark, dir, 0.9).count()
    info(s"containment t=0.9: candidates=$cand output=$out")
    assert(out > 0, "planted corpus must carry qualifying pairs")
    assert(cand <= 50L * out + 50L,
      s"candidate mass $cand not output-shaped (output $out)")
  }

  test("edit-distance segment candidates are output-shaped at tau=8") {
    val cand = graft.ops.EditDistance
      .editDistanceCandidatePairs(spark, dir, 8).count()
    val out = graft.ops.EditDistance
      .editDistanceJoin(spark, dir, 8).count()
    info(s"edit distance tau=8: candidates=$cand output=$out")
    assert(out > 0, "planted corpus must carry qualifying pairs")
    assert(cand <= 50L * out + 50L,
      s"candidate mass $cand not output-shaped (output $out)")
  }

  test("edit-distance PROBE candidates are output-shaped at tau=8 (VERDICT r12 item 8)") {
    // the serving path's batch×corpus candidate stream carries the
    // same output-shaped claim as the self-join's — now a failing
    // test, not just a SCALE_NOTES ratio
    val cand = graft.ops.EditDistance
      .editDistanceProbeCandidatePairs(spark, dir, 8).count()
    val out = graft.ops.EditDistance
      .editDistanceProbe(spark, dir, 8).count()
    info(s"edit distance probe tau=8: candidates=$cand output=$out")
    assert(out > 0, "planted corpus must carry qualifying cross pairs")
    assert(cand <= 50L * out + 50L,
      s"probe candidate mass $cand not output-shaped (output $out)")
  }
}
