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
}
