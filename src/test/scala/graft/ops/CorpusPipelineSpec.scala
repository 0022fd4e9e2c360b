package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Invariant checks for the COMPOSED corpus pipeline (X69) beyond the
  * cross-engine oracle: stage-count monotonicity, conservation between
  * the chunk accounting and the written-shard manifest, restriction
  * semantics against a standalone stage, and run-to-run determinism
  * (the export stage rewrites scratch — the manifest must not care). */
class CorpusPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private case class Row5(stage: String, shard: Int, nDocs: Long,
      nPacks: Long, nTokens: Long)

  private lazy val rows: Seq[Row5] = {
    import spark.implicits._
    CorpusPipeline.corpusPipeline(spark, dir)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
      .map((Row5.apply _).tupled)
  }
  private def stage(s: String): Row5 = rows.find(_.stage == s)
    .getOrElse(fail(s"missing stage row $s"))

  test("doc counts and token mass are non-increasing across filter stages") {
    val order = Seq("00_ingest", "01_quality", "02_exact", "03_neardup",
      "04_spanscrub", "05_contain", "06_decon_ngram", "07_semdedup",
      "08_decon_sem", "09_rarity", "10_quality_score")
    val st = order.map(stage)
    st.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b.nDocs <= a.nDocs, s"${b.stage} grew docs vs ${a.stage}")
        assert(b.nTokens <= a.nTokens,
          s"${b.stage} grew tokens vs ${a.stage}")
      case _ =>
    }
    // the pipeline must actually filter something at this sf — a chain
    // of no-ops would "pass" monotonicity while testing nothing
    assert(st.last.nDocs < st.head.nDocs)
  }

  test("shard manifest conserves the chunk stage exactly") {
    val ch = stage("11_chunk")
    val shards = rows.filter(_.stage == "12_shard")
    assert(shards.map(_.shard).sorted == (0 until 8), "8 shard rows")
    assert(shards.map(_.nDocs).sum == ch.nDocs,
      "every chunk lands in exactly one shard")
    assert(shards.map(_.nTokens).sum == ch.nTokens,
      "token mass conserved through the export roundtrip")
    assert(shards.forall(_.nPacks >= 1))
  }

  test("quality stage equals the standalone gate applied to the corpus") {
    // restriction semantics, checked against an INDEPENDENT
    // formulation: stage 1's survivor count must equal textQuality
    // filtered by the same thresholds
    import org.apache.spark.sql.functions._
    val expected = TextAnalysis.textQuality(spark, dir)
      .filter(col("n_tokens") >= CorpusPipeline.MinTokens &&
        col("uniq_ratio") >= CorpusPipeline.MinUniqRatio)
      .count()
    assert(stage("01_quality").nDocs == expected)
  }

  test("the pipeline is deterministic across invocations (fresh export)") {
    import spark.implicits._
    val again = CorpusPipeline.corpusPipeline(spark, dir)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
      .map((Row5.apply _).tupled)
    assert(again == rows)
  }

  // ---- X70: the incremental (daily-batch) form ----

  private lazy val incrRows: Seq[Row5] = {
    import spark.implicits._
    CorpusPipeline.corpusPipelineIncr(spark, dir)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
      .map((Row5.apply _).tupled)
  }
  private def istage(s: String): Row5 = incrRows.find(_.stage == s)
    .getOrElse(fail(s"missing incr stage row $s"))

  test("incremental: batch counts are non-increasing and something filters") {
    val order = Seq("00_batch", "01_quality", "02_exact", "03_neardup",
      "04_contain", "05_decon_ngram", "06_semdedup", "07_decon_sem",
      "08_rarity", "09_quality_score")
    val st = order.map(istage)
    st.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b.nDocs <= a.nDocs, s"${b.stage} grew docs vs ${a.stage}")
        assert(b.nTokens <= a.nTokens,
          s"${b.stage} grew tokens vs ${a.stage}")
      case _ =>
    }
    assert(st.last.nDocs < st.head.nDocs)
  }

  test("incremental: shard manifest conserves the chunk stage; deterministic") {
    import spark.implicits._
    val ch = istage("10_chunk")
    val shards = incrRows.filter(_.stage == "11_shard")
    assert(shards.map(_.nDocs).sum == ch.nDocs)
    assert(shards.map(_.nTokens).sum == ch.nTokens)
    val again = CorpusPipeline.corpusPipelineIncr(spark, dir)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
      .map((Row5.apply _).tupled)
    assert(again == incrRows)
  }

  test("incremental: stage 1 equals the standalone calibrated gate's admissions") {
    // composition semantics (VERDICT r12 item 2): the increment's
    // stage-1 survivors must be exactly the docs the standalone X81
    // probe admits — same persisted stats store (same dir/batchMod
    // key), same verdict conjunction, checked against the
    // independently-registered query
    import org.apache.spark.sql.functions._
    val expected = QualitySignals.qualityGateProbe(spark, dir)
      .filter(col("admit")).count()
    assert(istage("01_quality").nDocs == expected)
    assert(expected < istage("00_batch").nDocs,
      "the gate must actually reject something at this sf")
  }

  test("incremental: the batch slice is exactly the full corpus's batchMod stand-in") {
    // restriction semantics against an independent count — stage 0
    // must equal the doc_id % 7 == 0 slice of the raw corpus
    import org.apache.spark.sql.functions._
    val expected = graft.util.Tables.t(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(7)) === 0).count()
    assert(istage("00_batch").nDocs == expected)
  }
}
