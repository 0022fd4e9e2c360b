package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables.{t, fanOut}

/** Distributed BPE merge training — tokenizer induction, the step a
  * training-data pipeline runs before it can count a single token.
  *
  * Scale shape: the corpus is touched ONCE, to build the word →
  * frequency table (the standard BPE-on-word-frequencies reduction:
  * merges depend only on weighted symbol-pair counts, and the
  * frequency table is vocabulary-sized — millions of rows for a
  * 100 TB corpus, not the corpus). Every merge iteration then runs
  * over that small table: explode adjacent symbol pairs (weighted by
  * word frequency), aggregate, take the argmax pair (deterministic
  * tie-break: count desc, then pair lexicographic), and apply the
  * merge to each word's symbol array with a left-to-right greedy fold
  * — a higher-order `aggregate` lambda, no UDF. Per-iteration
  * `localCheckpoint` cuts the growing lambda lineage; the state it
  * snapshots is the vocabulary, not the corpus.
  *
  * Registered rows-only (`bpe_train`): the iterative argmax-and-merge
  * has no single-query SQL equivalent. Exactness is anchored in
  * BpeTrainSpec: a driver-side reference implementation over the same
  * word frequencies must produce the identical merge sequence, and a
  * hand-computed fixture pins the greedy-merge semantics (including
  * the overlapping-pair case aaa → [aa, a]). */
object BpeTrain {

  /** One greedy left-to-right merge pass of pair (l, r) over a symbol
    * array, as a fold: append each symbol, except that a symbol `r`
    * arriving when the accumulator ends in `l` replaces that `l` with
    * the merged symbol. A symbol produced by a merge never re-merges
    * in the same pass (it is textually `l+r`, longer than `l`). */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** The corpus reduced to (symbols, freq): one scan, then BPE never
    * reads the corpus again. */
  private[ops] def wordFreqs(spark: SparkSession, dir: String): DataFrame =
    fanOut(t(spark, dir, "documents"))
      .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(split(col("word"), "").as("syms"), col("freq"))

  /** Train `nMerges` merges; returns one row per learned merge:
    * (rank, left, right, merged, weighted_count). Stops early when no
    * adjacent pair remains. */
  def train(vocab0: DataFrame, nMerges: Int): DataFrame = {
    val spark = vocab0.sparkSession
    import spark.implicits._
    var vocab = vocab0.localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val pairs = vocab
        // single-symbol words contribute no pairs — and sequence(1, 0)
        // would count DOWN (Spark defaults step to -1 when start>stop)
        // into the invalid array index 0
        .filter(size(col("syms")) > 1)
        .select(col("freq"), explode(
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(
              element_at(col("syms"), i).as("l"),
              element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .as[(String, String, Long)].collect()
      pairs.headOption match {
        case None => done = true
        case Some((l, r, cnt)) =>
          merges += ((rank, l, r, l + r, cnt))
          val prev = vocab
          vocab = vocab
            .select(applyMerge(col("syms"), l, r).as("syms"), col("freq"))
            .localCheckpoint()
          // free the superseded checkpoint: without this each of the
          // nMerges rounds pins a vocabulary-sized persisted RDD for
          // the session lifetime. Dataset.unpersist is a NO-OP on
          // checkpoint RDDs (CacheManager has no entry for them) —
          // the bridge unpersists the underlying LogicalRDD directly.
          org.apache.spark.sql.graftbridge.PlanBridge
            .unpersistLocalCheckpoint(prev)
          rank += 1
      }
    }
    val out = merges.result()
      .toDF("rank", "left", "right", "merged", "weighted_count")
      .orderBy("rank")
    org.apache.spark.sql.graftbridge.PlanBridge
      .unpersistLocalCheckpoint(vocab)
    out
  }

  /** Registered query: 12 merges over the documents corpus. */
  def bpeTrain(spark: SparkSession, dir: String,
      nMerges: Int = 12): DataFrame =
    train(wordFreqs(spark, dir), nMerges)

  /** X63 — ENCODE with the trained tokenizer: apply the learned merge
    * sequence to every document and report per-doc token statistics —
    * the step that turns bpe_train's artifact into the token counts
    * the packing/chunking/budgeting operators consume.
    *
    * Scale shape mirrors training's word-frequency reduction: encoding
    * is a pure function of the WORD, so the merges are applied to the
    * (vocabulary-sized) distinct-word table — `nMerges` greedy HOF
    * folds, lineage cut every 4 rounds — never to the corpus. The
    * corpus is touched twice: once to build the word list, once to
    * join each document's exploded words to the word → n_symbols map
    * (a keyed shuffle on the word, broadcastable when the vocabulary
    * is small) and aggregate per doc. The driver holds the merge list
    * (nMerges rows) and nothing else.
    *
    * Output per doc: word count, encoded token count, alpha chars
    * (sum of word lengths = the pre-merge symbol count), and the
    * chars-per-token compression ratio — integer counts plus one
    * exact double division, so the DuckDB oracle (which replays the
    * merge chain through the bpe_train CTE stack and re-derives the
    * same word → n_symbols map) hash-matches bit-for-bit. */
  def bpeEncode(spark: SparkSession, dir: String,
      nMerges: Int = 12): DataFrame = {
    import spark.implicits._
    val merges = train(wordFreqs(spark, dir), nMerges)
      .select("left", "right").as[(String, String)].collect()
    val words = fanOut(t(spark, dir, "documents"))
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("word"))
    var vocab = words.select("word").distinct()
      .withColumn("syms", split(col("word"), ""))
    // Cut the nested-lambda lineage periodically: 12 stacked
    // aggregate() folds blow past the codegen method-size limit and
    // fall back to interpreted evaluation on the whole chain. The
    // LAST checkpoint stays persisted — the returned plan reads from
    // it (vocabulary-sized, the same residency the memoized signature
    // caches accept); superseded ones are freed eagerly.
    var lastCkpt: Option[DataFrame] = None
    var applied = 0
    for ((l, r) <- merges) {
      vocab = vocab.select(col("word"),
        applyMerge(col("syms"), l, r).as("syms"))
      applied += 1
      if (applied % 4 == 0) {
        vocab = vocab.localCheckpoint()
        lastCkpt.foreach(org.apache.spark.sql.graftbridge.PlanBridge
          .unpersistLocalCheckpoint)
        lastCkpt = Some(vocab)
      }
    }
    val enc = vocab.select(col("word"),
      size(col("syms")).cast("long").as("n_sym"),
      length(col("word")).cast("long").as("n_chars_word"))
    words.join(enc, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sym")).as("n_tokens"),
        sum(col("n_chars_word")).as("n_chars_alpha"))
      .withColumn("chars_per_token",
        col("n_chars_alpha").cast("double") / col("n_tokens"))
      .orderBy("doc_id")
  }

  /** X103 — tokenizer FERTILITY rollup: tokens-per-word and
    * chars-per-token PER LANGUAGE — the standard tokenizer-evaluation
    * relation (a tokenizer trained on one language mix "taxes" the
    * under-represented languages with more tokens per word; this is
    * the table that decision is made from, and the denominator
    * token-budget mixes divide by). Exact integer sums over the X63
    * per-doc encoding joined to each doc's declared language, with the
    * two ratios as single exact divisions of those sums. Docs with no
    * encodable words (empty text) carry no tokens and are absent from
    * the per-doc relation — `n_docs` counts ENCODABLE docs, the
    * denominator that makes the ratios meaningful.
    *
    * Scale shape: everything corpus-sized happens inside [[bpeEncode]]
    * (vocabulary-sized merge folds, one word-keyed join); the rollup
    * adds one lang-keyed map-side-combined agg. */
  def bpeFertility(spark: SparkSession, dir: String,
      nMerges: Int = 12): DataFrame =
    bpeEncode(spark, dir, nMerges)
      .join(t(spark, dir, "documents").select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars_alpha")).as("n_chars"),
        (sum(col("n_tokens")).cast("double") /
          sum(col("n_words")).cast("double")).as("tokens_per_word"),
        (sum(col("n_chars_alpha")).cast("double") /
          sum(col("n_tokens")).cast("double")).as("chars_per_token"))
      .orderBy("lang")
}
