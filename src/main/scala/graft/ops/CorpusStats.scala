package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables.{t, fanOut, md5Long32}

/** Corpus-level statistics a large-scale training-data pipeline needs
  * beyond per-document quality scores: cardinality sketches, term
  * weighting, index construction, and cross-document novelty. All four
  * operators are exactly oracle-able — sketches use deterministic
  * md5-derived hashes (not RNG), and every floating-point value is a
  * single correctly-rounded double division of integers, so DuckDB
  * reproduces them bit-for-bit. */
object CorpusStats {

  /** KMV (K-minimum-values) distinct-count sketch: estimate the number
    * of distinct tokens per language from only the K smallest hash
    * values — the mergeable, bounded-memory cardinality sketch shape
    * used at 100 TB, where exact `count(DISTINCT)` needs a full
    * shuffle of every distinct value. Estimator: `(K-1) / frac(h_K)`
    * with `h_K` the K-th smallest 32-bit md5 prefix.
    *
    * Deterministic by construction (md5, not random seeds), so the
    * DuckDB oracle reproduces the ESTIMATE exactly; the exact distinct
    * count is carried alongside, making the sketch's relative error
    * visible in the result (spec asserts < 15%). Groups with fewer
    * than K distinct values fall back to the exact count, like any
    * production KMV. Scale note: the sketch here ranks with a
    * per-group window for oracle parity; the window shuffles only
    * DISTINCT (lang, token) hashes, and K bounds what survives. */
  def kmvDistinct(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val words = fanOut(t(spark, dir, "documents"))
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("word"))
      .distinct()
    val hashed = words.select(col("lang"), col("word"),
      md5Long32(col("word")).as("hv"))
    // 32-bit prefix collisions are broken by the word itself so the
    // rank-K row is unique in both engines
    val w = Window.partitionBy(col("lang")).orderBy(col("hv"), col("word"))
    val kth = hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === k)
      .select(col("lang"), col("hv").as("kth_hv"))
    val exact = words.groupBy(col("lang"))
      .agg(count(lit(1)).as("exact_distinct"))
    exact.join(kth, Seq("lang"), "left")
      .select(col("lang"), col("exact_distinct"),
        coalesce(
          (lit((k - 1).toDouble) * pow(lit(2.0), 32)) /
            col("kth_hv").cast("double"),
          col("exact_distinct").cast("double")).as("kmv_estimate"))
      .orderBy("lang")
  }

  /** TF-IDF top terms per document (raw inverse document frequency):
    * `score = tf · (N / df)` — log damping is deliberately omitted
    * because `ln` is not guaranteed bit-identical across engines, while
    * integer-derived double division is; the RANKING this produces is
    * what the operator is for, and raw idf ranks more aggressively
    * toward rare terms. Term stats are corpus-wide; the per-doc top-k
    * window runs on a deterministic (score desc, term) order.
    *
    * Scale shape: tf is one map-side-combined groupBy(doc, term); df
    * is one groupBy(term) over distinct (doc, term) pairs reusing the
    * same exchange; N is a 1-row aggregate broadcast into the join.
    * Output is restricted to a doc_id sample purely to bound the
    * verification payload — the plan is identical unsampled. */
  def tfidfTopTerms(spark: SparkSession, dir: String, topK: Int = 5,
      docMod: Int = 50): DataFrame = {
    val tok = fanOut(t(spark, dir, "documents"))
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
    val docTerm = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = docTerm.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = fanOut(t(spark, dir, "documents"))
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    // No broadcast hint on df: the vocabulary aggregate is one row per
    // distinct term — corpus-scale, not dimension-scale. AQE broadcasts
    // it when it measures small and falls back to a shuffle join when
    // it doesn't; a forced hint would bypass that check and OOM the
    // driver on a real corpus. Only the 1-row N is hint-broadcast.
    docTerm.filter(col("doc_id") % docMod === 0)
      .join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") *
          (col("n_docs").cast("double") / col("df").cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank").cast("int").as("rank"),
        col("term"), col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rank")
  }

  /** Inverted-index construction: per term, its document frequency,
    * posting range, and a MERGEABLE membership fingerprint — the XOR
    * of a 32-bit md5-derived hash of each posting. A production index
    * materializes (term, doc_id) postings partitioned by term —
    * exactly the `postings` exchange here — and the registered
    * verification projects that build through constant-size
    * aggregation buffers only: XOR is commutative/associative, so the
    * partial aggregates combine map-side and a stop-word head term
    * costs the same buffer as a tail term. (An earlier
    * `md5(sorted collect_list)` fingerprint pinned posting ORDER too,
    * but its buffer grew with df — precisely the head terms that
    * survive the `minDf` filter — which is an executor OOM at corpus
    * scale, not a plan detail.) */
  def invertedIndex(spark: SparkSession, dir: String,
      minDf: Int = 20): DataFrame = {
    val postings = fanOut(t(spark, dir, "documents"))
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .distinct()
    postings
      .withColumn("hv",
        md5Long32(col("doc_id").cast("string")))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        expr("bit_xor(hv)").as("posting_fp"))
      .filter(col("df") >= minDf)
      .orderBy("term")
  }

  /** BM25-shaped retrieval over the corpus — the retrieval primitive a
    * training-data pipeline runs for decontamination-by-retrieval and
    * targeted corpus search. Classic Okapi BM25 with ONE deliberate
    * change, following [[tfidfTopTerms]]: the idf log damping is
    * omitted (`ln` is not guaranteed bit-identical across engines,
    * while integer-derived double arithmetic is) — idf here is the raw
    * Lucene idf argument `(N - df + 0.5)/(df + 0.5) + 1`, which ranks
    * more aggressively toward rare terms; tf saturation and length
    * normalization (`k1`, `b`) are standard.
    *
    * Scale shape: the exploded (doc, term) stream is filtered to the
    * QUERY'S terms before any aggregation, so the tf groupBy touches
    * query-term postings only — never the vocabulary; df is a
    * query-term-sized aggregate; N/avgdl is a broadcast 1-row
    * aggregate; the final top-k is a TakeOrderedAndProject (no global
    * sort). Per-doc scores sum the per-term doubles in decimal
    * ([[graft.util.Tables.dsum]]) so partition order can't change the
    * result. The registered oracle inlines the default constants —
    * keep them in sync when changing defaults. */
  def bm25Search(spark: SparkSession, dir: String,
      query: Seq[String] = Seq("join", "window", "dup"),
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    import graft.util.Tables.dsum
    val docs = fanOut(t(spark, dir, "documents"))
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
      .withColumn("dl", size(col("w")))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val terms = docs
      .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .filter(col("term").isin(query: _*))
    val tf = terms.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)) + lit(1.0)
    val tfd = col("tf").cast("double")
    val tfpart = (tfd * lit(k1 + 1.0)) /
      (tfd + lit(k1) * (lit(1.0 - b) +
        lit(b) * (col("dl").cast("double") / col("avgdl"))))
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("term_score", idf * tfpart)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched"), dsum(col("term_score")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Per-document bigram novelty: what fraction of a doc's distinct
    * word bigrams appear in NO other document (`novelty`), and how
    * common its bigrams are on average (`mean_df`) — the cheap
    * LM-free proxy for "is this document new text or boilerplate"
    * used to prioritize training data. All ratios are single double
    * divisions of exact integer counts. */
  def bigramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val docs = fanOut(t(spark, dir, "documents"))
      .withColumn("w", TextAnalysis.tokens(col("text")))
    val bigrams = docs.select(col("doc_id"),
      explode(array_distinct(when(size(col("w")) >= 2,
        transform(sequence(lit(1), size(col("w")) - 1), i =>
          concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))))
        .otherwise(array()))).as("g"))
    val gdf = bigrams.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
    bigrams.join(gdf, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("gdf") === 1, 1L).otherwise(0L)).as("n_unique"),
        sum(col("gdf")).as("sum_df"))
      .select(col("doc_id"), col("n_bigrams"), col("n_unique"),
        (col("n_unique").cast("double") / col("n_bigrams").cast("double"))
          .as("novelty"),
        (col("sum_df").cast("double") / col("n_bigrams").cast("double"))
          .as("mean_df"))
      .orderBy("doc_id")
  }

  /** Sketch-guided EXACT heavy hitters: tokens with support
    * > total/`supportDiv`. Pass 1 is a shuffle-free aggregate (a
    * count-min sketch merges associatively map-side, plus the exact
    * token total); pass 2 probes the plan-embedded sketch BEFORE the
    * groupBy, so the exact-count shuffle carries only candidate
    * tokens instead of the whole vocabulary — at 100 TB the long tail
    * IS the vocabulary, and this is the difference between shuffling
    * billions of distinct rare tokens and shuffling the handful of
    * frequent ones. CMS never underestimates, so no true hitter is
    * dropped (no false negatives); the exact count then discards the
    * sketch's false positives — the registered result is EXACT and
    * the DuckDB oracle pins it. CorpusStatsSpec proves the shuffle
    * reduction on a synthetic long-tail vocabulary. */
  def heavyHitters(spark: SparkSession, dir: String,
      supportDiv: Long = 1000L): DataFrame = {
    val tok = fanOut(t(spark, dir, "documents"))
      .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
    heavyHittersOf(tok, supportDiv)
  }

  /** Core of [[heavyHitters]] over any single-column token frame —
    * exposed for the long-tail spec. The candidate pre-filter is the
    * codegen'd [[graft.expressions.CmsCountGreaterThan]] expression
    * (sketch embedded in the plan, no UDF serialization boundary in
    * the pass-2 scan and no broadcast to manage/destroy). */
  private[ops] def heavyHittersOf(tok: DataFrame,
      supportDiv: Long): DataFrame = {
    val first = tok.agg(
      expr("count_min_sketch(word, 0.001d, 0.99d, 42)").as("cms"),
      count(lit(1)).as("total")).head()
    val thr = first.getLong(1) / supportDiv
    tok.filter(graft.expressions.CmsCountGreaterThan(
        col("word"), first.getAs[Array[Byte]](0), thr))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > thr)
      .orderBy(col("n").desc, col("word"))
  }
}
