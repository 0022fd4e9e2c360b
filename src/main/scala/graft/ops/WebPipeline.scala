package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X108 — the END-TO-END WEB PIPELINE: raw fetched HTML → training
  * shards in ONE registered lineage (VERDICT r15 item 1).
  *
  * The crawl half (`crawl_ingest`, X84) stops at the per-source
  * manifest and the corpus half (`corpus_pipeline`, X69) starts from
  * an already-clean documents table — the SEAM between them is
  * exactly where composition bugs hide (this engine's own history:
  * jaccard's 34-scan plan, the bpe lineage blowups all lived at
  * operator seams). This query chains the proven stages across that
  * seam, each over the SURVIVORS of the previous one:
  *
  *  0. `00_fetch` — the raw page store (one row per fetched page).
  *  1. `01_robots` — RETROACTIVE robots compliance: a page whose own
  *     normalized URL the X87 verdict disallows leaves the corpus
  *     (the publisher said no — whether the fetch predated the rule
  *     or ignored it, a polite pipeline honors it at build time; the
  *     fixture's trap site disallows `/` and all its fetched pages
  *     drop here). Verdicts via [[Robots.robotsVerdictsFor]] over the
  *     distinct (host, url) page frontier — the same machinery that
  *     gates the forward frontier.
  *  2. `02_extract` — X82 extraction + the X84 admission gate
  *     (non-boilerplate, `text_len ≥` [[HtmlExtract.MinTextLen]]).
  *  3. `03_exact` — exact dedup on the EXTRACTED text, keep-min
  *     doc_id (the X84 stage).
  *  4. `04_neardup` — MinHash banded LSH one-pass larger-side drop
  *     ([[Dedup.nearDupPairsFor]], 8 bands / ≥ 4 agreeing — the X84
  *     crawl-entry choice).
  *  5. `05_paradedup` — corpus-wide paragraph KEEP-FIRST (X95) over
  *     the survivors' RAW html: every `<p>` block, tag-stripped and
  *     collapsed, deduplicated with the earliest (doc_id, idx)
  *     occurrence surviving; each paragraph-bearing doc's text state
  *     becomes its KEPT paragraphs rejoined in document order (a doc
  *     whose every paragraph lost keeps an EMPTY state — its content
  *     exists elsewhere), while docs with no `<p>` markup keep their
  *     stage-2 extracted text (paragraph dedup only rewrites what
  *     has paragraphs). Downstream token state `w` = the shared
  *     tokenizer over that text.
  *  6. `06_gopher` — the X102 Gopher rule battery over the
  *     post-paragraph token state ([[QualitySignals.gopherRulesTok]]);
  *     only rule-clean docs ship.
  *  7. `07_chunk` / `08_shard` — the X69 chunk → pack → PHYSICAL
  *     shard export tail ([[CorpusPipeline.chunkShardExport]] — the
  *     same 64/8 chunk rule, 512-token packs, 8 content-hash shards,
  *     manifest read back from the written files).
  *
  * Output: one accounting row per stage (shard = −1) plus one
  * manifest row per written shard — the DuckDB oracle replays the
  * whole chain (extraction CTEs, robots verdicts, banded minhash,
  * paragraph winners, Gopher rules, pack arithmetic) and pins every
  * stage boundary AND the export roundtrip in a single hash.
  *
  * Plan/scale shape: the page store is scanned TWICE by design — once
  * through the extraction chain (stages 1–4) and once for the
  * paragraph fan-out of stage 5 (which needs raw html the extracted
  * relation no longer carries; both scans are fanned out and each
  * feeds a checkpoint, so neither replays). Every inter-stage
  * relation is an eager fixture/corpus-sized checkpoint consumed by
  * its successor AND its accounting branch — the seam discipline this
  * query exists to audit (PlanAuditSpec pins its exchange/scan
  * budget). The robots verdict side is frontier-distinct-sized with a
  * broadcast rules relation; paragraph keep-first is the
  * map-side-combinable min-encode (hot boilerplate keys never meet a
  * window); the shard tail is the X69 shape. At 100 TB nothing here
  * is all-pairs or driver-sized: the LSH is band-bucketed, the
  * winner fetch joins on unique keys, the export is
  * partitioned-parquet parallel. */
object WebPipeline {

  /** The pipeline's Gopher word-count floor: the published 50 is
    * calibrated for full web documents and zeroes the committed
    * fixture's miniature pages (measured: 0/45 stage-5 survivors) —
    * the shard tail would then only ever exercise the empty-export
    * path. 20 keeps every other rule at its published threshold
    * while letting the export stages run on real content; the
    * STANDALONE `gopher_rules` query keeps 50. */
  val WebMinWords = 20L

  /** X108 registered query — the committed 161-page HTML fixture +
    * the committed robots rules through the full chain. */
  def webPipeline(spark: SparkSession, dir: String): DataFrame =
    webPipelineFrom(spark, HtmlExtract.fixturePages(spark),
      Robots.fixtureRules(spark),
      "graft_pipeline_web/" + graft.util.Tables.pathTag(dir))

  private[graft] def webPipelineFrom(spark: SparkSession,
      pages: DataFrame, rules: DataFrame,
      scratchRoot: String): DataFrame = {
    def acct(stage: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(size(col("w")).cast("long")), lit(0L))
            .as("n_tokens"))
        .select(lit(stage).as("stage"), lit(-1).as("shard"),
          col("n_docs"), lit(0L).as("n_packs"), col("n_tokens"))
    // page-count stages (no text state yet): tokens are 0 by contract
    def acctPages(stage: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(stage).as("stage"), lit(-1).as("shard"),
          col("n_docs"), lit(0L).as("n_packs"), lit(0L).as("n_tokens"))
    def tokState(df: DataFrame): DataFrame =
      df.select(TextAnalysis.tokens(col("text")).as("w"))

    // ---- stage 1: retroactive robots compliance ----
    // the page's own URL through the same normalize chain the
    // discovery side uses — URL identity must agree across the crawl
    val purl = pages
      .select(col("doc_id"),
        HtmlExtract.normalizeUrl(col("page_url")).as("url"))
      .filter(col("url") =!= "")
      .withColumn("host",
        regexp_extract(col("url"), HtmlExtract.HostPattern, 1))
      .filter(col("host") =!= "")
    val allowedUrls = Robots.robotsVerdictsFor(
        purl.select(col("host"), col("url")).distinct(), rules)
      .filter(col("allowed")).select(col("url"))
    // doc-id-sized; checkpointed so the verdict window runs once, not
    // once per downstream stage + accounting branch
    val okDocs = purl.join(allowedUrls, Seq("url"), "left_semi")
      .select(col("doc_id")).localCheckpoint()
    val p1 = pages.join(okDocs, Seq("doc_id"), "left_semi")

    // ---- stage 2: extraction + admission ----
    val ex = HtmlExtract.htmlExtractFrom(p1).localCheckpoint()
    val s2 = ex.filter(HtmlExtract.admissionOk)

    // ---- stage 3: exact dedup on extracted text ----
    val s3 = s2
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).select(col("doc_id"), col("text"))
      .localCheckpoint()

    // ---- stage 4: near-dup one-pass larger-side drop ----
    val drops4 = Dedup
      .nearDupPairsFor(s3.select(col("doc_id"), col("text")))
      .select(col("doc_b").as("doc_id")).distinct()
    val s4 = s3.join(drops4, Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // ---- stage 5: corpus-wide paragraph keep-first ----
    // raw html of the SURVIVORS only (paragraphsOf checkpoints)
    val paras = HtmlExtract.paragraphsOf(
      pages.join(s4.select(col("doc_id")), Seq("doc_id"), "left_semi"))
    val winners = HtmlExtract.paragraphWinners(paras)
    val rebuilt = paras.join(winners, Seq("doc_id", "idx"))
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("idx"), col("text")))),
        s => s.getField("text")), " ").as("rtext"))
    val nParas = paras.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"))
    val s5 = s4
      .join(nParas, Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        TextAnalysis.tokens(
          when(col("n_paras").isNotNull,
            coalesce(col("rtext"), lit("")))
            .otherwise(col("text"))).as("w"))
      .localCheckpoint()

    // ---- stage 6: Gopher quality gate over the token state ----
    val s6 = s5.join(
      QualitySignals
        .gopherRulesTok(s5.select(col("doc_id"), col("w")), WebMinWords)
        .filter(col("pass")).select(col("doc_id")),
      Seq("doc_id"), "left_semi").localCheckpoint()

    // ---- stages 7-8: the shared chunk → pack → shard-export tail ----
    val tail = CorpusPipeline.chunkShardExport(spark, s6, scratchRoot,
      "07_chunk", "08_shard")

    (Seq(
      acctPages("00_fetch", pages), acctPages("01_robots", p1),
      acct("02_extract", tokState(s2)), acct("03_exact", tokState(s3)),
      acct("04_neardup", tokState(s4)), acct("05_paradedup", s5),
      acct("06_gopher", s6), tail)
      .reduce(_ unionByName _))
      .orderBy("stage", "shard")
  }
}
