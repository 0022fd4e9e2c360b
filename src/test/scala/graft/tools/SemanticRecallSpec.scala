package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** MEASURED recall for the top-2-cell probe family (VERDICT r10 item
  * 3): until now semdedup/semantic_decon recall was only
  * contract-consistency with an oracle sharing the same cell
  * approximation — a systematic routing miss would be invisible. This
  * spec measures against PLANTED ground truth (zeroed-dims twins,
  * cos ≈ 0.97, planted by [[ScaleStress.buildEmbeddingCorpus]]) and
  * pins the precise contract: detection within the routing cell is
  * EXACT (same-cell recall 1.0), and every miss is a routing straddle
  * — the documented approximation class whose knob is maxCells.
  * The 1×/10×/100× table lives in SCALE_NOTES (runMain
  * graft.tools.ScaleStress semrec). */
class SemanticRecallSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** 5× planted corpus off sf0.001 (≈ 2 550 vectors, ~50 twins),
    * cached under target and reused across runs. */
  private lazy val dir: String = {
    val out = graft.util.Scratch.under("semrec_spec/x5").toString
    if (!new java.io.File(s"$out/embeddings.parquet/_SUCCESS").exists())
      ScaleStress.buildEmbeddingCorpus(spark, "/root/testdata/sf0.001",
        out, 5)
    out
  }

  test("planted-twin recall: same-cell detection exact, misses are exactly straddlers") {
    // evalMod 5 (vs the registered 50) so the eval-crossing planted
    // slice is populated at this corpus size; prime maxCells per the
    // stress convention (labels offset +1000/copy must not alias)
    val rows = ScaleStress.semanticRecall(spark, dir, maxCells = 83,
      evalMod = 5)

    val sd = rows.find(_.family == "semdedup").get
    assert(sd.planted > 0, "corpus must carry planted twins")
    assert(sd.sameCell > 0, "some planted pairs must share a cell")
    assert(sd.sameCellRecall == 1.0,
      s"within-cell detection must be exact, got ${sd.sameCellRecall}")
    assert(sd.misses.toSet.subsetOf(sd.straddlePairs.toSet),
      s"non-straddle misses: ${sd.misses.toSet -- sd.straddlePairs.toSet}")

    // X61b: the multi-probe variant exists to close semdedup's
    // straddle-miss class — on the planted set it must keep the
    // exact-within-cell contract AND strictly beat the single-cell
    // form on straddlers (measured 0 → ~0.9, SCALE_NOTES)
    val sp = rows.find(_.family == "semdedup_probe").get
    assert(sp.sameCellRecall == 1.0)
    assert(sp.planted == sd.planted && sp.straddle == sd.straddle,
      "probe variant must see the same planted geometry")
    if (sp.straddle > 0)
      assert(sp.straddleRecall > sd.straddleRecall,
        s"probing must lift straddle recall: ${sp.straddleRecall} vs " +
          s"${sd.straddleRecall}")
    assert(sp.recall >= sd.recall)

    val dc = rows.find(_.family == "semantic_decon").get
    assert(dc.planted > 0,
      "eval-crossing planted pairs must exist at evalMod=5")
    if (dc.sameCell > 0)
      assert(dc.sameCellRecall == 1.0,
        s"probed-cell detection must be exact, got ${dc.sameCellRecall}")
    assert(dc.misses.toSet.subsetOf(dc.straddlePairs.toSet),
      s"non-straddle misses: ${dc.misses.toSet -- dc.straddlePairs.toSet}")

    // X66b: both-sides probing exists to close the TRAIN-side
    // straddle-miss class — same planted geometry, never worse, and
    // its residual misses stay inside the straddle class
    val dp = rows.find(_.family == "semantic_decon_probe").get
    assert(dp.planted == dc.planted,
      "probe variant must see the same planted eval-crossing pairs")
    if (dp.sameCell > 0) assert(dp.sameCellRecall == 1.0)
    assert(dp.recall >= dc.recall,
      s"both-sides probing must not lose recall: ${dp.recall} vs " +
        s"${dc.recall}")
    assert(dp.misses.toSet.subsetOf(dp.straddlePairs.toSet),
      s"non-straddle misses: ${dp.misses.toSet -- dp.straddlePairs.toSet}")
  }
}
