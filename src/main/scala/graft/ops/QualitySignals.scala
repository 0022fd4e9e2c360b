package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables.{t, fanOut}

/** Pre-training corpus quality signals beyond per-document ratios
  * (see TextAnalysis.textQuality): repetition scoring, eval-set
  * decontamination, and the corpus frequency spectrum. All values are
  * exact integer counts or single double divisions thereof, so the
  * DuckDB oracle reproduces them bit-for-bit. */
object QualitySignals {

  /** Repetition signals per document (the "excessive repetition" family
    * of quality filters): what fraction of a doc's bigram occurrences
    * belong to its single most frequent bigram (`top_bigram_frac`), and
    * what fraction of trigram occurrences are repeats of an
    * already-seen trigram (`dup_trigram_frac`). Template/boilerplate
    * text scores high on both; clean prose scores low.
    *
    * Scale shape: both n-gram counts group on (doc_id, gram) — keys are
    * doc-local, so the aggregation is map-side combined and the final
    * per-doc reduction shuffles one row per distinct gram, never the
    * text. Docs with fewer than 3 tokens have no trigram (and a
    * degenerate bigram profile) and are excluded in both engines. */
  def ngramRepetition(spark: SparkSession, dir: String): DataFrame = {
    val docs = fanOut(t(spark, dir, "documents"))
      .withColumn("w", TextAnalysis.tokens(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), col("w"))
    def grams(n: Int) = docs.select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("w")) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(o => element_at(col("w"), i + o)): _*)))
        .as("g"))
    val bi = grams(2).groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_bigram_n"), sum(col("c")).as("n_bigrams"))
    val tri = grams(3).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        count_distinct(col("g")).as("n_distinct_trigrams"))
    bi.join(tri, Seq("doc_id"))
      .select(col("doc_id"),
        col("n_bigrams"), col("top_bigram_n"),
        (col("top_bigram_n").cast("double") / col("n_bigrams").cast("double"))
          .as("top_bigram_frac"),
        col("n_trigrams"), col("n_distinct_trigrams"),
        ((col("n_trigrams") - col("n_distinct_trigrams")).cast("double") /
          col("n_trigrams").cast("double")).as("dup_trigram_frac"))
      .orderBy("doc_id")
  }

  /** Eval-set decontamination: flag training documents sharing word
    * {n}-grams with a held-out eval set (docs whose `doc_id % evalMod
    * == 0` stand in for the benchmark). Output: one row per
    * contaminated train doc with its distinct-shingle count, the number
    * of shingles also present anywhere in the eval set, and the overlap
    * fraction — the decision variable of every published
    * decontamination pipeline.
    *
    * Scale shape: the eval side is a distinct-shingle set orders of
    * magnitude smaller than the corpus; AQE broadcasts it when it
    * measures small (the normal case — a few benchmarks), so the train
    * side never shuffles, and the equi-join on `shingle` degrades to a
    * sort-merge join when it doesn't. Per-doc aggregation is map-side
    * combined on doc-local keys. */
  def decontaminate(spark: SparkSession, dir: String, n: Int = 5,
      evalMod: Int = 97): DataFrame = {
    val shingled = fanOut(t(spark, dir, "documents"))
      .withColumn("w", TextAnalysis.tokens(col("text")))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("w")) - (n - 1)), i =>
          concat_ws(" ", (0 until n).map(o => element_at(col("w"), i + o)): _*))))
        .as("shingle"))
    val evalShingles = shingled.filter(col("doc_id") % evalMod === 0)
      .select("shingle").distinct().withColumn("hit", lit(1))
    // No broadcast hint: a real eval set (a few benchmarks) measures
    // tiny and AQE broadcasts it on its own; the hint would force a
    // driver collect even when the eval side is corpus-proportional
    // (as it is under the %evalMod stand-in) and turn a graceful
    // sort-merge fallback into an OOM.
    shingled.filter(col("doc_id") % evalMod =!= 0)
      .join(evalShingles, Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).as("n_overlap"))
      .filter(col("n_overlap") > 0)
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        (col("n_overlap").cast("double") / col("n_shingles").cast("double"))
          .as("overlap_frac"))
      .orderBy("doc_id")
  }

  /** Corpus frequency spectrum (Zipf profile): bucket every term by
    * floor(log2(document frequency)) and report terms-per-bucket plus
    * df extrema — the shape a corpus curator reads to spot head/tail
    * imbalance before filtering. The bucket is computed EXACTLY as the
    * bit length of the integer df (`length(bin(df)) - 1`), not via
    * float log2, so bucket boundaries at powers of two cannot diverge
    * between engines.
    *
    * Scale shape: df is one distinct + one map-side-combined groupBy;
    * the spectrum itself aggregates ~vocabulary-size rows down to ~20
    * buckets. */
  /** X64 — per-document word-rarity score: the corpus-language-model
    * quality signal (the CCNet/perplexity-filter family) in a form
    * that stays bit-exact cross-engine. A document's words are scored
    * against the corpus unigram model; the score is the MEAN INVERSE
    * PROBABILITY `avg(total_words / freq(w))` — monotone in the same
    * direction as unigram perplexity (rare-word-heavy docs score
    * high, common-word prose low) but free of the transcendental
    * `log`, whose last-ulp behavior differs between engines (same
    * reasoning that keeps the idf damping out of [[CorpusStats]]'s
    * TF-IDF). `n_hapax` (corpus-frequency-1 words) is the classic
    * OOV-ish rarity count alongside.
    *
    * Scale shape: one corpus pass to the (vocabulary-sized) frequency
    * table — localCheckpoint'd so the total scalar AND the scoring
    * join both read the checkpoint instead of re-scanning the corpus
    * (the [[BpeTrain]] vocab idiom) — then one keyed join of exploded
    * words to it (map-side combined agg per doc after), and ONE driver
    * scalar (the corpus word total). Two corpus scans total. The
    * per-doc mean uses the exact decimal accumulation (`Tables.davg`)
    * so partition order can't move a bit. */
  def wordRarity(spark: SparkSession, dir: String): DataFrame = {
    import graft.util.Tables.davg
    val words = fanOut(t(spark, dir, "documents"))
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("word"))
    // memoized (CkptMemo): repeat invocations reuse the pinned
    // vocabulary-sized block instead of stacking fresh ones
    val freq = graft.util.CkptMemo.of(spark, "rarity_freq", dir) {
      words.groupBy(col("word")).agg(count(lit(1)).as("f"))
        .localCheckpoint()
    }
    // corpus word total: a single long — the one driver-side value,
    // injected as a literal so the scoring plan has no 1-row cross
    // join (which would need a PlanAudit BNLJ allowlist entry)
    val total: Long = freq.agg(sum(col("f"))).head().getLong(0)
    words.join(freq, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(when(col("f") === 1, 1L).otherwise(0L)).as("n_hapax"),
        davg(lit(total).cast("double") / col("f")).as("mean_inv_p"))
      .orderBy("doc_id")
  }

  /** X68 — corpus-quality classifier INFERENCE: a hashed-n-gram
    * linear scorer, the fastText-style architecture of published
    * corpus quality filters (e.g. the CCNet/GPT-3 "looks like
    * reference text" classifiers): unigram + bigram features,
    * feature-hashed into `nBuckets` buckets with the engine's
    * cross-engine md5 hash, each bucket carrying a FIXED weight, and
    * the document's margin = the MEAN bucket weight over its feature
    * occurrences (averaged bag-of-features — exactly fastText
    * inference with a 1-dim output). `keep = margin ≥ threshold` is
    * the filter verdict a pipeline consumes.
    *
    * The weight vector is a deterministic md5-derived stand-in for
    * trained weights (`w[j] = (md5_32("qw:"+j) mod 2001 − 1000) /
    * 1000 ∈ [−1, 1]`): no trained artifact could be shipped or
    * cross-engine-verified here, but the ARCHITECTURE — tokenize →
    * n-gram → hash → weight lookup → mean → threshold — is the
    * production shape, swap-in ready for real weights. Every step is
    * integer arithmetic or exactly-rounded double division, and the
    * mean accumulates in decimal ([[graft.util.Tables.davg]]), so the
    * DuckDB oracle replays the whole scorer bit-for-bit.
    *
    * Scale shape: embarrassingly parallel feature fan-out (rows ∝
    * each doc's own token count), then ONE map-side-combined groupBy
    * on doc_id — no joins, no broadcast state, nothing driver-side;
    * the weight "table" is pure hash arithmetic, so there is no model
    * object to distribute at 100 TB (the real-weights variant would
    * broadcast an nBuckets-sized float array). Docs with zero tokens
    * have no features and are absent in both engines. */
  def qualityScore(spark: SparkSession, dir: String,
      nBuckets: Int = 1024, threshold: Double = 0.0): DataFrame =
    qualityScoreFor(fanOut(t(spark, dir, "documents")), nBuckets,
      threshold)

  /** [[qualityScore]] over an arbitrary (doc_id, text) corpus. */
  def qualityScoreFor(docs: DataFrame, nBuckets: Int = 1024,
      threshold: Double = 0.0): DataFrame =
    qualityScoreTok(
      docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w")),
      nBuckets, threshold)

  /** [[qualityScore]] over an already-tokenized (doc_id, w) corpus —
    * the corpus-pipeline form. */
  private[graft] def qualityScoreTok(docs: DataFrame,
      nBuckets: Int = 1024, threshold: Double = 0.0): DataFrame = {
    import graft.util.Tables.davg
    val grams = docs
      .select(col("doc_id"), explode(concat(col("w"),
        when(size(col("w")) >= 2,
          transform(sequence(lit(1), size(col("w")) - 1), i =>
            concat_ws(" ", element_at(col("w"), i),
              element_at(col("w"), i + 1))))
          .otherwise(array()))).as("g"))
    val bucket = graft.util.Tables.md5Bucket("qf:", col("g"), nBuckets)
    val weight =
      (graft.util.Tables.md5Long32(
          concat(lit("qw:"), bucket.cast("string"))) % 2001 - 1000)
        .cast("double") / 1000.0
    grams.select(col("doc_id"), weight.as("wgt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), davg(col("wgt")).as("margin"))
      .withColumn("keep", col("margin") >= threshold)
      .orderBy("doc_id")
  }

  /** X77 — CALIBRATED length-outlier filter: per-language exact
    * percentile bounds on document length, every doc flagged
    * against its own language's [p02, p98] interval — the CCNet-style
    * cleaning step that drops truncation stubs and concatenation
    * monsters WITHOUT a hand-tuned global threshold (a length that is
    * normal for zh is a stub for en; calibrating per stratum is the
    * point). Exact `percentile` on integer lengths interpolates onto
    * exact binary fractions, so the bounds — and the keep verdicts —
    * are bit-identical in DuckDB's `quantile_cont` (the proven
    * percentiles pairing). Emitted as the full per-doc report (doc,
    * bounds, verdict): the decision threshold stays downstream and
    * the gate hashes every verdict.
    *
    * Scale shape: one grouped percentile pass (per-lang sort state —
    * the exact form; the approx_percentile twin is the 100 TB path,
    * same trade as table_profile vs table_profile_approx) producing a
    * LANGUAGE-sized bounds table broadcast back over one corpus
    * scan. Two scans by the stats-join-back class (multi-scan budget
    * 2, like neardup_probe). */
  def lengthOutliers(spark: SparkSession, dir: String,
      pLo: Double = 0.02, pHi: Double = 0.98): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    // NULL-SAFE equi-join: a null-lang doc (dropped field upstream) is
    // its own stratum — groupBy emits its bounds row, and <=> matches
    // it back, so the report stays complete per-doc (a plain equi-join
    // silently drops the null stratum on both engines)
    val bounds = docs.groupBy(col("lang"))
      .agg(percentile(col("n_chars"), lit(pLo)).as("lo"),
        percentile(col("n_chars"), lit(pHi)).as("hi"))
      .withColumnRenamed("lang", "b_lang")
    docs.join(broadcast(bounds), col("lang") <=> col("b_lang"))
      .withColumn("keep",
        col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("lo"), col("hi"), col("keep"))
      .orderBy("doc_id")
  }

  /** X80 — PERCENTILE-CALIBRATED quality filter: keep the top
    * `keepPct`% of each SOURCE by the X68 classifier margin — the
    * published per-stratum calibration move (a single global margin
    * cliff keeps whatever the head source looks like and guts the
    * tail; ranking within each source keeps its best q% regardless of
    * where its margin mass sits). RANK-based, not value-interpolated:
    * the quota is the integer ceil(n·q) and membership is a pure
    * ordering question on the (margin, doc_id) key, so the whole
    * verdict is exact — no percentile interpolation of doubles to
    * replay cross-engine (the margin itself is the decimal-accumulated
    * X68 value, already bit-exact).
    *
    * Scale design: NOT one row_number window per source (a 100 TB
    * source = one sort reducer). Phase 1 aggregates doc counts per
    * (source, margin-bucket) — mb = floor(margin·1000), a ≤
    * |sources|·2001-row relation — whose running count is each
    * bucket's global rank OFFSET (window over the bounded stats
    * relation only). Phase 2 joins the offsets + quotas back
    * (broadcast), PRUNES buckets whose offset already meets the quota
    * (provably verdict-free: every member's rank ≥ offset ≥ quota),
    * and ranks within (source, mb) partitions — each ≤ 1/2001 of a
    * source. mb is monotone in margin, so offset + within-bucket rank
    * IS the global per-source rank; the oracle replays the NAIVE
    * one-window form, gate-checking the decomposition every run (the
    * [[graft.ops.Reshape.tokenBudgetMix]] pattern). */
  def qualityCalibrated(spark: SparkSession, dir: String,
      keepPct: Int = 60): DataFrame =
    qualityCalibratedOn(spark,
      graft.util.Tables.fanOut(t(spark, dir, "documents")),
      keepPct, "qcal_base", dir)

  /** [[qualityCalibrated]] over an arbitrary (doc_id, source, text)
    * corpus slice — the gate-probe build step ranks the CORPUS side
    * only through this form. `memoKey` discriminates the checkpoint
    * (the registered full-corpus query keeps its round-12 key). */
  private[graft] def qualityCalibratedOn(spark: SparkSession,
      docs: DataFrame, keepPct: Int, memoKey: Any*): DataFrame = {
    // the scored relation feeds BOTH the phase-1 stats and the phase-2
    // rank pass; checkpoint it (doc-id-sized) so the scorer's feature
    // fan-out runs once, not once per reference (memoized per session
    // — the word_rarity freq idiom)
    val base = graft.util.CkptMemo.of(spark, memoKey: _*) {
      val scored = qualityScoreFor(
          docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"), col("margin"))
      docs
        .select(col("doc_id"), col("source"))
        .join(scored, Seq("doc_id"))
        .withColumn("mb", floor(col("margin") * 1000).cast("long"))
        .localCheckpoint()
    }
    val wB = Window.partitionBy(col("source")).orderBy(col("mb").desc)
    val stats = base.groupBy(col("source"), col("mb"))
      .agg(count(lit(1)).as("bn"))
      .withColumn("offset",
        coalesce(sum(col("bn")).over(
          wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_scored",
        sum(col("bn")).over(Window.partitionBy(col("source"))))
      .withColumn("quota",
        expr(s"(n_scored * $keepPct + 99) div 100"))
      .select(col("source"), col("mb"), col("offset"), col("quota"))
    val wIn = Window.partitionBy(col("source"), col("mb"))
      .orderBy(col("margin").desc, col("doc_id"))
    base
      .join(broadcast(stats), Seq("source", "mb"))
      .filter(col("offset") < col("quota"))
      .withColumn("src_rank",
        col("offset") + row_number().over(wIn).cast("long"))
      .filter(col("src_rank") <= col("quota"))
      .select(col("doc_id"), col("source"), col("margin"),
        col("src_rank"))
      .orderBy("doc_id")
  }

  /** Build step of [[qualityGateProbe]]: derive the corpus-side
    * admission statistics ONCE and persist them — per-language length
    * bounds (the X77 relation), per-source margin cutoffs (min kept
    * margin of the X80 rank), and the α = 1/2 temperature rates (the
    * X78 derivation) — all computed over the CORPUS side only
    * (`doc_id % batchMod ≠ 0`), never the batch, so the gate is the
    * honest serving artifact: train-side statistics applied to unseen
    * arrivals. Each relation is tiny (lang- or source-sized); the
    * build's corpus scans happen once per (corpus, batchMod) and are
    * `_SUCCESS`-gated like the LSH/set-sim indexes. */
  def qualityGateBuildStats(spark: SparkSession, dir: String,
      batchMod: Int = 7, keepPct: Int = 60): String = {
    import graft.util.Tables
    val out = s"target/graft_qgate/${Tables.pathTag(dir)}_" +
      Tables.listingTag(spark, s"$dir/documents.parquet") +
      s"_m${batchMod}_q$keepPct"
    if (!Tables.successExists(spark, s"$out/bounds") ||
        !Tables.successExists(spark, s"$out/cutoffs") ||
        !Tables.successExists(spark, s"$out/rates")) {
      val corpus = t(spark, dir, "documents")
        .filter(pmod(col("doc_id"), lit(batchMod)) =!= 0)
      corpus.groupBy(col("lang"))
        .agg(percentile(col("n_chars"), lit(0.02)).as("lo"),
          percentile(col("n_chars"), lit(0.98)).as("hi"))
        .write.mode("overwrite").parquet(s"$out/bounds")
      // the memo key MUST carry the corpus listing tag: a mid-session
      // corpus change re-keys this build's output dir, and without the
      // tag the session-cached scored base would hand the fresh build
      // YESTERDAY'S cutoffs (bounds/rates fresh, cutoffs stale — the
      // exact staleness class this build exists to prevent)
      qualityCalibratedOn(spark, fanOut(corpus), keepPct,
          "qgate_base", dir, batchMod,
          Tables.listingTag(spark, s"$dir/documents.parquet"))
        .groupBy(col("source"))
        .agg(min(col("margin")).as("cutoff"))
        .write.mode("overwrite").parquet(s"$out/cutoffs")
      val bySrc = corpus
        .select(col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
        .groupBy(col("source")).agg(sum(col("n_tok")).as("src_tok"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1)
      spark.createDataFrame(Reshape.temperatureRates(bySrc.toSeq))
        .toDF("source", "rate_ppm")
        .write.mode("overwrite").parquet(s"$out/rates")
    }
    out
  }

  /** X81 — the composed ONLINE admission gate, the serving split of
    * the round-12 quality family: an incoming batch (`doc_id %
    * batchMod == 0`, the [[graft.ops.Dedup.neardupProbe]] convention)
    * is gated against the PERSISTED corpus statistics — calibrated
    * length bounds per language (X77), the per-source classifier-
    * margin cutoff the X80 rank implies (margin ≥ min kept margin ⇔
    * "would have ranked in the top q%"; batch ties at the cutoff are
    * admitted — serving semantics), and the X78 temperature coin.
    * Per-doc verdicts for all three legs plus the conjunction, the
    * row a streaming ingest routes on.
    *
    * Scale shape: at probe time the plan touches the BATCH scan
    * (partition-pruned filter on the corpus table), the batch-sized
    * scorer fan-out, and three broadcast joins against lang/source-
    * sized parquet stats — ZERO corpus-sized work; the corpus is
    * consulted only at build, once per (corpus, batchMod). Batch docs
    * with no features (empty text) take margin NULL → keep_quality
    * false (no evidence is not admission); an unseen language or
    * source likewise fails its leg closed. */
  def qualityGateProbe(spark: SparkSession, dir: String,
      batchMod: Int = 7): DataFrame = {
    val idx = qualityGateBuildStats(spark, dir, batchMod)
    val batch = t(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(batchMod)) === 0)
    qualityGateFor(batch, idx).orderBy("doc_id")
  }

  /** The gate's verdict assembly over an arbitrary (doc_id, source,
    * lang, n_chars, text) batch frame — shared by the registered
    * batch probe and [[graft.streaming.GateStream]]'s per-micro-batch
    * form. Unordered (each caller sorts or partitions as it needs). */
  private[graft] def qualityGateFor(batch: DataFrame,
      statsDir: String): DataFrame = {
    val spark = batch.sparkSession
    val scored = qualityScoreFor(
        fanOut(batch).select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("margin"))
    batch.select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"))
      .join(scored, Seq("doc_id"), "left")
      .join(broadcast(spark.read.parquet(s"$statsDir/bounds")),
        Seq("lang"), "left")
      .join(broadcast(spark.read.parquet(s"$statsDir/cutoffs")),
        Seq("source"), "left")
      .join(broadcast(spark.read.parquet(s"$statsDir/rates")),
        Seq("source"), "left")
      .withColumn("keep_length", coalesce(
        col("n_chars") >= col("lo") && col("n_chars") <= col("hi"),
        lit(false)))
      .withColumn("keep_quality",
        coalesce(col("margin") >= col("cutoff"), lit(false)))
      .withColumn("keep_sample", coalesce(
        graft.util.Tables.md5Bucket("qgate:", col("doc_id"), 1000000)
          < col("rate_ppm"), lit(false)))
      .withColumn("admit",
        col("keep_length") && col("keep_quality") && col("keep_sample"))
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"), col("margin"), col("keep_length"),
        col("keep_quality"), col("keep_sample"), col("admit"))
  }

  def zipfSpectrum(spark: SparkSession, dir: String): DataFrame = {
    // Spectrum over word BIGRAMS, not unigrams: the bigram vocabulary
    // is large enough to spread document frequencies across the full
    // bucket range (a unigram spectrum on a small vocabulary collapses
    // into one or two buckets and measures nothing).
    val docs = fanOut(t(spark, dir, "documents"))
      .withColumn("w", TextAnalysis.tokens(col("text")))
    val df = docs.select(col("doc_id"),
        explode(array_distinct(when(size(col("w")) >= 2,
          transform(sequence(lit(1), size(col("w")) - 1), i =>
            concat_ws(" ", element_at(col("w"), i),
              element_at(col("w"), i + 1))))
          .otherwise(array()))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    df.select(col("term"), col("df"),
        (length(bin(col("df"))) - 1).cast("int").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_terms"),
        min(col("df")).as("min_df"), max(col("df")).as("max_df"),
        min(col("term")).as("first_term"))
      .orderBy("bucket")
  }

  /** X91 — n-gram language-model quality score (the CCNet recipe:
    * score every document with a reference LM trained on a trusted
    * slice, keep the head of the distribution). The reference here is
    * the `doc_id % 5 == 0` corpus slice (a deterministic stand-in for
    * "Wikipedia"); the model is an add-one-smoothed BIGRAM LM:
    * `p(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)` with `V` = distinct
    * train unigrams. Per document: bigram count, unseen-bigram count,
    * and the MEAN bigram probability — deliberately the arithmetic
    * mean of probabilities, NOT log-perplexity: `ln` is not
    * bit-identical across engines (the bm25 lesson), while counts,
    * single double divisions and the decimal-exact mean replay
    * bit-for-bit. Ranking by mean probability orders documents the
    * same way a monotone per-doc transform of it would.
    *
    * Scale shape: the model is CORPUS-scaled (train bigrams), so
    * scoring is two keyed equi-joins (bigram key, then context key) —
    * never a broadcast of the model, never all-pairs; the per-doc
    * reduction is map-side combined on doc_id. V rides along as a
    * 1-row broadcast. Docs with < 2 tokens have no bigram and are
    * excluded in both engines. */
  def ngramLmScore(spark: SparkSession, dir: String,
      trainMod: Int = 5): DataFrame = {
    // ONE corpus scan: the tokenized relation is a listing-tag-keyed
    // memoized checkpoint (the edit-distance docsCkpt pattern) that
    // the train side, the vocab count and the scoring side all read —
    // without it the plan scans documents.parquet 4×.
    val tok = graft.util.CkptMemo.of(spark, "lm_tok", dir,
        graft.util.Tables.listingTag(spark, s"$dir/documents.parquet")) {
      fanOut(t(spark, dir, "documents"))
        .withColumn("w", TextAnalysis.tokens(col("text")))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"), col("w"))
        .localCheckpoint()
    }
    def bigrams(df: DataFrame) = df.select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("w")) - 1), i =>
        struct(element_at(col("w"), i).as("w1"),
          concat_ws(" ", element_at(col("w"), i),
            element_at(col("w"), i + 1)).as("g")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.g").as("g"))
    val train = tok.filter(col("doc_id") % trainMod === 0)
    // c1(w1) = Σ_g c2(w1,g): both model tables fall out of ONE
    // (w1, g) rollup (model-sized, checkpointed — used twice) instead
    // of two independent passes over the train bigrams
    val c2pre = bigrams(train).groupBy(col("w1"), col("g"))
      .agg(count(lit(1)).as("c2")).localCheckpoint()
    val c2 = c2pre.select(col("g"), col("c2"))
    val c1 = c2pre.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    // V counts distinct train unigrams over ALL positions (the last
    // token of each doc is vocabulary too, not just bigram contexts)
    val vocab = train
      .select(explode(col("w")).as("t")).agg(
        countDistinct(col("t")).cast("double").as("vd"))
    bigrams(tok)
      .join(c2, Seq("g"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        ((coalesce(col("c2"), lit(0L)).cast("double") + lit(1.0)) /
          (coalesce(col("c1"), lit(0L)).cast("double") + col("vd")))
          .as("p"),
        when(col("c2").isNull, 1L).otherwise(0L).as("unseen"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("unseen")).as("n_unseen"),
        (graft.util.Tables.dsum(col("p")) / count(lit(1))).as("mean_p"))
      .orderBy("doc_id")
  }

  // ---- X102: Gopher rule battery with reasons ---------------------------

  /** The Gopher quality-rule thresholds (Rae et al. 2021, "Scaling
    * Language Models", §A1.1 — the published MassiveText filter),
    * restricted to the deterministic word-level subset (the line-based
    * bullet/ellipsis-line rules need newline structure the documents
    * table does not carry; documented omission). Every bound compares
    * an exact integer or one exact division against a decimal literal
    * both engines parse identically. */
  val GopherMinWords = 50L
  val GopherMaxWords = 100000L
  val GopherMinMeanLen = 3.0
  val GopherMaxMeanLen = 10.0
  val GopherMaxHashRatio = 0.1
  val GopherMaxEllipsisRatio = 0.1
  val GopherMinAlphaFrac = 0.8
  val GopherMinStopwords = 2L
  val GopherMaxTopBigram = 0.2
  val GopherMaxDupTrigram = 0.3
  /** Gopher's stop-word list — the doc must contain at least
    * [[GopherMinStopwords]] DISTINCT of these eight. */
  val GopherStops = Seq(
    "the", "be", "to", "of", "and", "that", "have", "with")

  /** X102 — the Gopher rule battery AS AN EXPLAINABLE FILTER: per
    * document every rule is evaluated and the output carries the
    * sorted `+`-joined list of FAILED rule names (the "why was this
    * doc dropped" answer an operator actually needs — a bare boolean
    * gate is undebuggable at corpus scale) plus the pass verdict.
    * Rules: word-count bounds, mean-word-length bounds, `#` and `…`
    * symbol ratios, alphabetic-word fraction, the distinct-stopword
    * floor, and the X28 repetition pair (top-bigram mass, duplicate
    * trigram fraction). Ratio rules on token-less docs evaluate NULL
    * → not-failed in both engines (word_count already fails them);
    * repetition rules need ≥ 2/3 tokens and pass vacuously below
    * that — each documented, both engines replay the same CASE.
    *
    * Scale shape: one corpus scan; the scalar rules are a per-row
    * projection; the repetition rules reuse X28's (doc_id, gram)
    * map-side-combined aggs; one doc-keyed join stitches them. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRulesFrom(fanOut(t(spark, dir, "documents")))

  private[graft] def gopherRulesFrom(docs: DataFrame): DataFrame =
    gopherRulesTok(docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w")))

  /** The rule battery over an ALREADY-TOKENIZED (doc_id, w) relation —
    * the composed-pipeline form (X108 gates its post-paragraph-dedup
    * token state without re-materializing a text column). `minWords`
    * parameterizes ONLY the word-count floor: Gopher's published 50
    * is calibrated for full web documents, and a composed pipeline
    * over a corpus of shorter units (the committed fixture's
    * miniature pages) scales that one bound while keeping every
    * other rule at its published threshold. */
  private[graft] def gopherRulesTok(tok: DataFrame,
      minWords: Long = GopherMinWords): DataFrame = {
    val base = tok
      .select(col("doc_id"), col("w"), size(col("w")).as("n"))
      .localCheckpoint()
    val denom = nullif(col("n"), lit(0)).cast("double")
    val nStops = GopherStops
      .map(s => when(array_contains(col("w"), s), 1L).otherwise(0L))
      .reduce(_ + _)
    val scalarFails: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "word_count" ->
        (col("n") < minWords || col("n") > GopherMaxWords),
      "mean_word_len" -> {
        val m = aggregate(transform(col("w"), w => length(w)), lit(0),
          _ + _).cast("double") / denom
        m < GopherMinMeanLen || m > GopherMaxMeanLen
      },
      "hash_ratio" ->
        (size(filter(col("w"), w => w.contains("#"))).cast("double") /
          denom > GopherMaxHashRatio),
      "ellipsis_ratio" ->
        (size(filter(col("w"), w => w.contains("..."))).cast("double") /
          denom > GopherMaxEllipsisRatio),
      "alpha_words" ->
        (size(filter(col("w"), w => w.rlike("[a-z]"))).cast("double") /
          denom < GopherMinAlphaFrac),
      "stopwords" -> (nStops < GopherMinStopwords))
    val scalars = base.select(
      col("doc_id") +: col("n").cast("long").as("n_words") +:
      scalarFails.map { case (name, cond) =>
        when(cond, lit(name)).as(s"f_$name") }: _*)
    // X28's repetition shapes, re-derived off the shared token base
    def grams(k: Int) = base.filter(col("n") >= k)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), col("n") - (k - 1)), i =>
          concat_ws(" ", (0 until k).map(o =>
            element_at(col("w"), i + o)): _*))).as("g"))
    val bi = grams(2).groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") /
        sum(col("c")).cast("double")).as("top_bi"))
    val tri = grams(3).groupBy(col("doc_id"))
      .agg(((count(lit(1)) - count_distinct(col("g"))).cast("double") /
        count(lit(1)).cast("double")).as("dup_tri"))
    val failCols = scalarFails.map { case (name, _) => col(s"f_$name") } ++
      Seq(when(col("top_bi") > GopherMaxTopBigram, lit("top_bigram")),
        when(col("dup_tri") > GopherMaxDupTrigram, lit("dup_trigram")))
    scalars
      .join(bi, Seq("doc_id"), "left")
      .join(tri, Seq("doc_id"), "left")
      .withColumn("fails",
        filter(array(failCols: _*), x => x.isNotNull))
      .select(col("doc_id"), col("n_words"),
        array_join(array_sort(col("fails")), "+").as("failed"),
        (size(col("fails")) === 0).as("pass"))
      .orderBy("doc_id")
  }
}
