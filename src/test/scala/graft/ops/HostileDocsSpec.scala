package graft.ops

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Robustness battery: the document operators against a HOSTILE
  * corpus — null text, empty text, whitespace-only, a single
  * 10k-char token, CJK + emoji (multi-byte and surrogate-pair
  * codepoints), embedded newlines/tabs, and a normal control doc.
  * The driver testdata contains none of these, but a 100 TB crawl
  * contains all of them; an operator that throws (or silently
  * mangles a surrogate pair into a crash downstream) must surface
  * here, not in production. The contract asserted is deliberately
  * weak-but-universal: no exception, no duplicated doc_id in per-doc
  * outputs, and output doc_ids ⊆ input doc_ids — plus a few
  * op-specific spot checks where the right answer is obvious. */
class HostileDocsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    import spark.implicits._
    val docs: Seq[(Long, String, String, String, Long)] = Seq(
      (1L, null, "en", "src0", 0L),
      (2L, "", "en", "src0", 0L),
      (3L, "   \t  \n ", "en", "src1", 8L),
      (4L, "x" * 10000, "en", "src1", 10000L),
      (5L, "的 是 在 了 不 的 是 😀 😀 text",
        "zh", "src2", 20L),
      (6L, "line one\nline two\ttabbed end", "en", "src2", 28L),
      (7L, "the quick brown fox jumps over the lazy dog and runs on",
        "en", "src3", 56L),
      (8L, "the quick brown fox jumps over the lazy dog and runs off",
        "en", "src3", 56L))
    val fdir = s"target/tmp/hostile_docs_${java.util.UUID.randomUUID}"
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$fdir/documents.parquet")
    fdir
  }

  private val ids = (1L to 8L).toSet

  private def perDocIds(df: DataFrame, idCol: String = "doc_id"): Seq[Long] = {
    import spark.implicits._
    df.select(idCol).as[Long].collect().toSeq
  }

  private def checkPerDoc(name: String, df: DataFrame,
      idCol: String = "doc_id"): Seq[Long] = {
    val got = perDocIds(df, idCol)
    assert(got.distinct.size == got.size, s"$name: duplicated doc_id")
    assert(got.toSet.subsetOf(ids), s"$name: unknown doc_id emitted")
    got
  }

  test("per-doc text operators survive null/empty/unicode/huge inputs") {
    checkPerDoc("text_quality", TextAnalysis.textQuality(spark, dir))
    checkPerDoc("token_counts", TextAnalysis.tokenCounts(spark, dir))
    checkPerDoc("doc_fingerprint", TextAnalysis.docFingerprint(spark, dir))
    checkPerDoc("scrub_normalize", TextAnalysis.scrubNormalize(spark, dir))
    checkPerDoc("quality_score", QualitySignals.qualityScore(spark, dir))
    checkPerDoc("ngram_repetition", QualitySignals.ngramRepetition(spark, dir))
    checkPerDoc("word_rarity", QualitySignals.wordRarity(spark, dir))
    checkPerDoc("weighted_sample", Reshape.weightedSample(spark, dir))
    checkPerDoc("token_budget_mix", Reshape.tokenBudgetMix(spark, dir))
    checkPerDoc("doc_chunk",
      Reshape.docChunk(spark, dir).select("doc_id").distinct())
  }

  test("the dedup family survives and pairs only the planted near-dups") {
    import spark.implicits._
    graft.util.CkptMemo.clear()
    // 7 and 8 differ in the trailing token ("on" → "off": one
    // substitution + one insertion = ed 2) — the only sane pair;
    // nothing may pair with the null/empty/huge docs
    val ed = EditDistance.editDistanceJoin(spark, dir, tau = 3)
      .select("doc_a", "doc_b", "dist").as[(Long, Long, Long)].collect()
    assert(ed.toSet == Set((7L, 8L, 2L)))
    val groups = checkPerDoc("dedup_groups_fixture",
      Dedup.dedupGroups(spark, dir).select(
        org.apache.spark.sql.functions.col("doc_id")))
    assert(groups.toSet.subsetOf(ids))
    checkPerDoc("leakage_safe_split", Reshape.leakageSafeSplit(spark, dir))
    graft.util.CkptMemo.clear()
  }

  test("rollup operators account for every hostile doc exactly once") {
    import spark.implicits._
    val lm = TextAnalysis.langMismatch(spark, dir)
      .select("n_docs").as[Long].collect().sum
    assert(lm == 8L, s"lang_mismatch counted $lm docs, expected 8")
    val ts = Reshape.trainSplit(spark, dir)
      .select("n_docs").as[Long].collect().sum
    assert(ts == 8L, s"train_split counted $ts docs, expected 8")
  }

  test("exact set-similarity joins survive and pair only the planted twins") {
    import spark.implicits._
    graft.util.CkptMemo.clear()
    // docs 7/8 share 9 of 11 distinct 3-word shingles (J = 0.818):
    // the ONLY pair either join may emit; null/empty/huge docs must
    // pass through the shingle machinery without crashing or pairing
    val jp = Dedup.jaccardPrefixJoin(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(jp == Set((7L, 8L)), s"jaccard pairs: $jp")
    // containment is ASYMMETRIC (ordered pairs); both directions
    // qualify here (9/10 = 0.9 each way)
    val cj = Dedup.containmentJoin(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cj.subsetOf(Set((7L, 8L), (8L, 7L))), s"containment pairs: $cj")
    val sh = Dedup.simhashPairs(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(sh.subsetOf(Set((7L, 8L))), s"simhash pairs: $sh")
    val nj = Dedup.ngramJaccard(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(nj.subsetOf(Set((7L, 8L))), s"ngram-jaccard pairs: $nj")
    graft.util.CkptMemo.clear()
  }

  test("manifest and mixture operators stay exact on the hostile corpus") {
    import spark.implicits._
    // X77: every doc gets a verdict — the single-doc zh stratum and
    // the 0-char null doc must not drop out of the percentile join
    val lo = checkPerDoc("length_outliers",
      QualitySignals.lengthOutliers(spark, dir))
    assert(lo.size == 8, s"length_outliers emitted ${lo.size}/8 docs")
    // X78: the all-null/empty source derives rate 0 (not a crash on a
    // zero-token source), so docs 1-2 are dropped; kept ids unique ⊆
    val tm = checkPerDoc("temperature_mix",
      Reshape.temperatureMix(spark, dir))
    assert(!tm.contains(1L) && !tm.contains(2L),
      "zero-token source must sample at rate 0")
    // X80: docs with no features (null/empty/whitespace text) are
    // absent from the scorer on both engines; everyone else is ranked
    graft.util.CkptMemo.clear()
    val qc = checkPerDoc("quality_calibrated",
      QualitySignals.qualityCalibrated(spark, dir))
    assert(qc.nonEmpty && !qc.exists(Set(1L, 2L, 3L)),
      s"quality_calibrated kept a feature-less doc: $qc")
    graft.util.CkptMemo.clear()
    // X76: the manifest stays a complete partition of the corpus
    val members = Dedup.dedupCanonical(spark, dir)
      .select("n_members").as[Long].collect()
    assert(members.sum == 8L, s"manifest covers ${members.sum}/8 docs")
    // X79: the only near-dup pair is the planted (7, 8) within src3 —
    // the matrix is exactly its one diagonal cell
    val cells = Dedup.sourceOverlapMatrix(spark, dir)
      .select("source_lo", "source_hi", "n_pairs", "pair_chars")
      .as[(String, String, Long, Long)].collect()
    assert(cells.toSeq == Seq(("src3", "src3", 1L, 112L)),
      s"unexpected overlap cells: ${cells.mkString(", ")}")
    // X81: the gate builds its stats over a corpus whose src0 is all
    // null/empty text (zero scored docs, zero tokens) without
    // crashing; batch = {7}, whose verdicts must be internally
    // consistent
    graft.util.CkptMemo.clear()
    val gate = QualitySignals.qualityGateProbe(spark, dir)
      .select("doc_id", "keep_length", "keep_quality", "keep_sample",
        "admit")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(gate.map(_._1).toSeq == Seq(7L))
    gate.foreach { case (_, kl, kq, ks, ad) =>
      assert(ad == (kl && kq && ks)) }
    graft.util.CkptMemo.clear()
  }

  test("takedown survives null text, null source and fully-deleted sources") {
    import spark.implicits._
    val base = s"target/tmp/hostile_takedown_${java.util.UUID.randomUUID}"
    // hits are multiples of 97; 97 has NULL text (removed token mass
    // must coalesce to 0, not crash), 388 has NULL source (the
    // manifest's null group must round-trip), srcB is FULLY deleted
    Seq((97L, null.asInstanceOf[String], "en", "srcA", 0L),
        (194L, "doomed words here", "en", "srcB", 17L),
        (388L, "null source text", "en", null.asInstanceOf[String], 16L),
        (5L, "survivor text", "en", "srcA", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$base/documents.parquet")
    Seq((97L, Array.fill(64)(0.5f), 1), (5L, Array.fill(64)(0.25f), 2))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$base/embeddings.parquet")

    val rows = Takedown.takedownPropagate(spark, base)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => Option(r._1) -> r).toMap
    assert(rows(Some("srcA")) == (("srcA", 2L, 1L, 1L, 0L, 0L)),
      s"null-text removal must report zero mass: ${rows(Some("srcA"))}")
    assert(rows(Some("srcB")) == (("srcB", 1L, 1L, 0L, 3L, 17L)),
      s"fully-deleted source: ${rows(Some("srcB"))}")
    assert(rows(None)._3 == 1L && rows(None)._4 == 0L,
      s"null-source group must carry its removal: ${rows(None)}")
    // the write-back round-trips: survivors only, embeddings pruned
    val out = Takedown.takedownStore(spark, base)
    assert(spark.read.parquet(s"$out/documents.parquet")
      .select("doc_id").as[Long].collect().toSet == Set(5L))
    assert(spark.read.parquet(s"$out/embeddings.parquet")
      .select("vec_id").as[Long].collect().toSet == Set(5L))
  }
}
