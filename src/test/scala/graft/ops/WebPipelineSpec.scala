package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Invariant checks for the END-TO-END web pipeline (X108) beyond the
  * cross-engine oracle: the robots stage drops exactly the
  * fixture's disallowed pages, doc counts are monotone across filter
  * stages, the shard manifest conserves the chunk stage, and —
  * via controlled toDF corpora — each composed stage demonstrably
  * ACTS (robots drop, paragraph rewrite incl. the all-paragraphs-lost
  * empty state, no-markup passthrough, Gopher drop). */
class WebPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private case class Row5(stage: String, shard: Int, nDocs: Long,
      nPacks: Long, nTokens: Long)

  private lazy val rows: Seq[Row5] = {
    import spark.implicits._
    WebPipeline.webPipeline(spark, dir)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
      .map((Row5.apply _).tupled)
  }
  private def stage(s: String): Row5 = rows.find(_.stage == s)
    .getOrElse(fail(s"missing stage row $s"))

  test("robots stage drops exactly the disallowed trap-site pages") {
    // independent derivation: count fixture pages whose host the
    // committed rules fully disallow (trapsite.crawl.test, disallow /)
    val trapped = HtmlExtract.fixturePages(spark)
      .filter(col("page_url").contains("trapsite.crawl.test"))
      .count()
    assert(trapped > 0, "fixture must carry trap-site pages")
    assert(stage("00_fetch").nDocs ==
      stage("01_robots").nDocs + trapped)
  }

  test("doc counts are non-increasing across the filter stages; every stage acts") {
    val order = Seq("00_fetch", "01_robots", "02_extract", "03_exact",
      "04_neardup", "05_paradedup", "06_gopher")
    val st = order.map(stage)
    st.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b.nDocs <= a.nDocs, s"${b.stage} grew docs vs ${a.stage}")
      case _ =>
    }
    // the chain must actually filter at each deduping/gating stage on
    // the committed fixture — a vacuous stage tests nothing
    assert(stage("01_robots").nDocs < stage("00_fetch").nDocs)
    assert(stage("02_extract").nDocs < stage("01_robots").nDocs)
    assert(stage("03_exact").nDocs < stage("02_extract").nDocs)
    assert(stage("04_neardup").nDocs < stage("03_exact").nDocs)
    // paragraph dedup keeps docs but must REMOVE duplicate-paragraph
    // token mass on the fixture
    assert(stage("05_paradedup").nDocs == stage("04_neardup").nDocs)
    assert(stage("05_paradedup").nTokens < stage("04_neardup").nTokens)
    assert(stage("06_gopher").nDocs < stage("05_paradedup").nDocs)
    assert(stage("06_gopher").nDocs > 0,
      "the gate must not empty the corpus — the export tail would " +
        "only exercise the empty path")
  }

  test("shard manifest conserves the chunk stage exactly") {
    val ch = stage("07_chunk")
    val shards = rows.filter(_.stage == "08_shard")
    assert(shards.nonEmpty)
    assert(shards.map(_.nDocs).sum == ch.nDocs,
      "every chunk lands in exactly one shard")
    assert(shards.map(_.nTokens).sum == ch.nTokens,
      "token mass conserved through the export roundtrip")
    assert(shards.forall(_.nPacks >= 1))
  }

  test("composed stages act on a controlled corpus (toDF)") {
    import spark.implicits._
    def page(id: Long, host: String, path: String, body: String) =
      (id, "s", s"http://$host$path", body)
    // two DISJOINT 40-word bodies that pass every Gopher rule at the
    // Web floor — disjoint so the shared paragraph below is a small
    // Jaccard fraction and the near-dup stage never pairs the pages
    val goodA = ("the quick brown fox jumps over the lazy dog and " +
      "keeps running with steady pace to be sure of the route " +
      "that every word here will have clean letters and " +
      "plain shape so the battery of rules stays green now").trim
    val goodB = ("that evening a calm harbor held small boats and " +
      "their crews worked to mend worn sails with patient hands " +
      "while gulls circled the quiet pier and the tide drifted " +
      "slowly past wooden posts to be counted again").trim
    val goodC = ("when morning broke the market square filled with " +
      "vendors who stacked ripe fruit beside warm loaves and " +
      "called cheerful greetings to neighbors that came early " +
      "to trade fresh goods be they spices or simple cloth").trim
    Seq(goodA, goodB, goodC).foreach(g =>
      assert(g.split("\\s+").length >= WebPipeline.WebMinWords))
    val dupPara = "<p>shared boilerplate paragraph across pages</p>"
    val pages = Seq(
      // robots-blocked page: must leave at stage 1
      page(1L, "blocked.test", "/x", s"<p>$goodA</p>"),
      // clean page, unique paragraph + the shared one (keeps both —
      // it is the FIRST occurrence of the shared paragraph)
      page(2L, "ok.test", "/a", s"$dupPara<p>$goodA alpha</p>"),
      // later page repeating the shared paragraph: loses it
      page(3L, "ok.test", "/b", s"$dupPara<p>$goodB beta</p>"),
      // page whose EVERY paragraph is a duplicate: empty state, then
      // dropped by Gopher's word_count floor
      page(4L, "ok.test", "/c", dupPara),
      // no <p> markup at all: keeps its extracted text
      page(5L, "ok.test", "/d", s"<div>$goodC gamma delta</div>"),
      // short page: survives to stage 6, dropped by word_count
      page(6L, "ok.test", "/e",
        "<p>the words of this page be few and with that it ends</p>"))
      .toDF("doc_id", "source", "page_url", "html")
    val rules = Seq(("blocked.test", "*", "disallow", "/", 1L))
      .toDF("host", "agent", "directive", "value", "rule_order")
    val got = WebPipeline
      .webPipelineFrom(spark, pages, rules, "graft_pipeline_web/spec")
      .as[(String, Int, Long, Long, Long)].collect().toSeq
      .map((Row5.apply _).tupled)
    def st(s: String) = got.find(_.stage == s)
      .getOrElse(fail(s"missing stage $s"))
    assert(st("00_fetch").nDocs == 6)
    assert(st("01_robots").nDocs == 5)     // doc 1 robots-dropped
    assert(st("04_neardup").nDocs == 5)    // no exact/near dups
    // stage 5 keeps all 5 docs; doc 3 lost the shared paragraph and
    // doc 4 lost everything, so token mass strictly shrinks
    assert(st("05_paradedup").nDocs == 5)
    assert(st("05_paradedup").nTokens < st("04_neardup").nTokens)
    // Gopher drops doc 4 (empty) and doc 6 (short): 3 survivors
    assert(st("06_gopher").nDocs == 3)
    val shards = got.filter(_.stage == "08_shard")
    assert(shards.map(_.nTokens).sum == st("07_chunk").nTokens)
  }

  test("run-to-run determinism across the scratch rewrite") {
    import spark.implicits._
    val again = WebPipeline.webPipeline(spark, dir)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
      .map((Row5.apply _).tupled)
    assert(again.toSet == rows.toSet)
  }
}
