package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables.{t, dsum}

/** Reshaping + sampling operators rounding out the analytics surface:
  * pivot/unpivot, exact percentiles, an array higher-order-function
  * suite, deterministic stratified sampling, and a bucketed range join.
  * All pure DataFrame ops — Catalyst plans them as partial+final
  * aggregates or equi-joins; nothing here materializes on the driver.
  */
object Reshape {

  /** Pivot: order counts and exact price sums per priority × status.
    * Pivot values are DECLARED (`F`/`O`/`P`) so the plan is a single
    * aggregate pass — an undeclared pivot first runs a distinct-values
    * job and would embed a data-dependent column set. Missing combos:
    * Spark's pivot yields null where `count(*) FILTER` yields 0, so
    * counts are coalesced to 0; sums are NULL in both engines. */
  def pivotOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("price"))
      .select(col("o_orderpriority"),
        coalesce(col("F_n"), lit(0L)).as("n_f"),
        col("F_price").as("price_f"),
        coalesce(col("O_n"), lit(0L)).as("n_o"),
        col("O_price").as("price_o"),
        coalesce(col("P_n"), lit(0L)).as("n_p"),
        col("P_price").as("price_p"))
      .orderBy("o_orderpriority")

  /** Unpivot (melt): wide per-returnflag metric columns back to long
    * (flag, metric, value) rows — the Dataset.unpivot operator. */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame = {
    val wide = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        dsum(col("l_quantity")).as("qty"),
        dsum(col("l_extendedprice")).as("price"),
        dsum(col("l_discount")).as("disc"))
    wide.unpivot(
      Array(col("l_returnflag")),
      Array(col("qty"), col("price"), col("disc")),
      "metric", "value")
      .orderBy("l_returnflag", "metric")
  }

  /** Approximate-percentile twin of [[percentiles]] — the shape that
    * survives 100 TB. Exact percentiles hold every group's values as
    * sort state; `approx_percentile` keeps a fixed-size mergeable
    * KLL-style sketch per group (error ≤ 1/accuracy quantile units),
    * so aggregate state is O(groups·accuracy) regardless of row count.
    * Registered rows-only (sketch internals differ across engines);
    * ReshapeSpec bounds it against the exact twin: min/max/count are
    * exact, each percentile within the sketch's rank-error of the
    * exact value on sf0.1. */
  def percentilesApprox(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_percentile(col("l_quantity"), lit(0.5), lit(accuracy)).as("p50"),
        approx_percentile(col("l_quantity"), lit(0.9), lit(accuracy)).as("p90"),
        approx_percentile(col("l_quantity"), lit(0.99), lit(accuracy)).as("p99"),
        min(col("l_quantity")).as("q_min"),
        max(col("l_quantity")).as("q_max"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** The REGISTERED gate form of [[percentilesApprox]]: the sketch's
    * rank-error guarantee, audited in-engine and emitted as a
    * deterministic boolean per percentile. The raw sketch estimate is
    * engine-specific (DuckDB has no GK twin), but the sketch's
    * CONTRACT — the returned element's exact rank is within
    * `n/accuracy` of the target rank — is checkable against the exact
    * data: join the per-group estimates back, count `< v` / `≤ v`
    * (the element's exact rank interval), and test interval overlap
    * with `p·n ± (n/accuracy + 1)`. The emitted row is exact anchors
    * (min/max/count) + the three booleans — all DuckDB-reproducible
    * (oracle: the exact side + literal true), so a sketch that ever
    * violated its bound turns the row red in the gate, not just in a
    * spec. Two scans by design: this is the verification harness; the
    * 100 TB serving shape remains the one-pass [[percentilesApprox]]. */
  def percentilesApproxGate(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"))
    val approx = li.groupBy(col("l_returnflag")).agg(
      approx_percentile(col("l_quantity"), lit(0.5), lit(accuracy))
        .as("a50"),
      approx_percentile(col("l_quantity"), lit(0.9), lit(accuracy))
        .as("a90"),
      approx_percentile(col("l_quantity"), lit(0.99), lit(accuracy))
        .as("a99"))
    val ranked = li.join(broadcast(approx), Seq("l_returnflag"))
      .groupBy(col("l_returnflag")).agg(
        min(col("l_quantity")).as("q_min"),
        max(col("l_quantity")).as("q_max"),
        count(lit(1)).as("n"),
        sum((col("l_quantity") < col("a50")).cast("long")).as("lt50"),
        sum((col("l_quantity") <= col("a50")).cast("long")).as("le50"),
        sum((col("l_quantity") < col("a90")).cast("long")).as("lt90"),
        sum((col("l_quantity") <= col("a90")).cast("long")).as("le90"),
        sum((col("l_quantity") < col("a99")).cast("long")).as("lt99"),
        sum((col("l_quantity") <= col("a99")).cast("long")).as("le99"))
    def ok(p: Double, lt: Column, le: Column): Column = {
      val target = lit(p) * col("n")
      // GK guarantee: rank error ≤ n/accuracy; +1 absorbs the
      // integer-rank boundary convention
      val e = col("n").cast("double") / lit(accuracy.toDouble) + lit(1.0)
      ((lt + lit(1)).cast("double") <= target + e) &&
        (le.cast("double") >= target - e)
    }
    ranked.select(col("l_returnflag"), col("q_min"), col("q_max"),
        col("n"),
        ok(0.5, col("lt50"), col("le50")).as("p50_ok"),
        ok(0.9, col("lt90"), col("le90")).as("p90_ok"),
        ok(0.99, col("lt99"), col("le99")).as("p99_ok"))
      .orderBy("l_returnflag")
  }

  /** Exact interpolated percentiles of l_quantity per return flag.
    * l_quantity is integer-valued, so the interpolation lands on exact
    * quarter/hundredth fractions representable in double — bit-identical
    * across engines regardless of each one's interpolation formula. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.9)).as("p90"),
        percentile(col("l_quantity"), lit(0.99)).as("p99"),
        min(col("l_quantity")).as("q_min"),
        max(col("l_quantity")).as("q_max"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Array higher-order-function suite over the embedding vectors:
    * slice, reverse, sort, filter, transform, left-fold aggregate,
    * min/max — each reduced to a scalar so the result is oracle-able.
    * The fold sum is a SEQUENTIAL left fold over 8 elements, matching
    * an explicit left-associated addition chain in the oracle. */
  def arraySuite(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .withColumn("a8",
        slice(transform(col("embedding"), x => x.cast("double")), 1, 8))
      .select(
        col("vec_id"),
        size(col("a8")).as("n"),
        element_at(col("a8"), 1).as("first_el"),
        element_at(reverse(col("a8")), 1).as("last_el"),
        element_at(array_sort(col("a8")), 1).as("sorted_min"),
        element_at(array_sort(col("a8")), 8).as("sorted_max"),
        array_min(col("a8")).as("a_min"),
        array_max(col("a8")).as("a_max"),
        size(filter(col("a8"), x => x > 0.0)).as("n_pos"),
        aggregate(col("a8"), lit(0.0), (acc, x) => acc + x).as("sum8"),
        aggregate(transform(col("a8"), x => x * x), lit(0.0),
          (acc, x) => acc + x).as("sumsq8"))
      .orderBy("vec_id")

  /** Deterministic stratified sample: per-stratum rates applied through
    * a content-derived hash (`md5` of a salted key), NOT an RNG — the
    * same row is in or out on every run, every engine, every retry.
    * This is the reproducible sampler a training pipeline wants (an
    * RNG-based `sampleBy` resamples differently per execution and is
    * unverifiable cross-engine). Embarrassingly parallel: a pure
    * per-row filter, no shuffle. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val bucket = graft.util.Tables.md5Bucket("smpl:", col("c_custkey"), 100)
    val rate = when(col("c_mktsegment") === "BUILDING", 20).otherwise(5)
    t(spark, dir, "customer")
      .withColumn("bucket", bucket)
      .filter(col("bucket") < rate)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        col("bucket").cast("int").as("bucket"))
      .orderBy("c_custkey")
  }

  /** Exact-k deterministic stratified TAKE: exactly `min(k, |stratum|)`
    * documents per language, chosen by a content-derived md5 rank —
    * the "give me 200 eval docs per language, same 200 every run,
    * every engine, every retry" pipeline shape. [[sampleStratified]]
    * is its rate-based sibling (expected fraction, binomial count
    * jitter); eval sets and few-shot pools need exact counts, which
    * an RNG-free rank + `row_number` window delivers.
    *
    * Scale design (VERDICT r12 item 3 — the doc'd pre-pass, now
    * implemented): NOT one window over each full stratum (a 100 TB
    * language = one sort reducer). Phase 1 counts per language
    * (lang-sized, map-side combined); each stratum gets a hash cutoff
    * `headroom·k/n` of the 32-bit md5 range, so the SURVIVOR set the
    * window sorts is ~headroom·k rows per language — bounded by the
    * knob, not the corpus. The k smallest hashes are provably inside
    * the survivors whenever ≥ min(k, n) rows survive (every
    * non-survivor hash exceeds every survivor hash); the
    * astronomically-rare underflow stratum (Chernoff: the survivor
    * count is Binomial(n, headroom·k/n)) falls back to the plain
    * full-stratum window — EXACT-k preserved by construction, and the
    * registered oracle replays the naive one-window form, so the
    * decomposition is gate-checked on every verify run (the X75/X80
    * pattern). Cost: 2–3 column-pruned scans (doc_id, lang, n_chars)
    * instead of a corpus-sized sort — the scan-heavy/sort-light trade
    * a 1000-executor cluster wants; the fallback scan is empty unless
    * a stratum underflowed. Ties are impossible short of an md5
    * collision on distinct doc_ids, so the order — and the cutoff
    * comparison — is total. */
  def takeStratified(spark: SparkSession, dir: String,
      k: Int = 25): DataFrame =
    takeStratifiedFrom(t(spark, dir, "documents"), k)
      .orderBy("lang", "rn")

  /** [[takeStratified]] over an arbitrary (doc_id, lang, n_chars)
    * relation, with the headroom knob exposed — the spec drives the
    * underflow fallback through a planted adversarial stratum here.
    *
    * The per-stratum counts, cutoffs, and survivor tallies are
    * LANG-DOMAIN-BOUNDED driver state (the codebook convention):
    * collecting them keeps every derived relation out of the
    * registered plan, the cutoff a map-literal lookup instead of a
    * join, and — decisively — lets the fallback's language set be a
    * pushed-down scan predicate, so when no stratum underflows (the
    * Chernoff-normal case) the final plan touches the corpus ZERO
    * times beyond the two phase jobs (count pass + survivor
    * checkpoint, each one column-pruned scan). */
  private[graft] def takeStratifiedFrom(docs: DataFrame, k: Int,
      headroom: Int = 8): DataFrame = {
    require(k > 0 && headroom > 0, s"k=$k, headroom=$headroom")
    val rank = graft.util.Tables.md5Long32(
      concat(lit("take:"), col("doc_id").cast("string")))
    val base = docs.select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("rk", rank)
    // phase 1: lang-sized counts → per-stratum hash cutoff. 2^32 ·
    // headroom·k fits a long for any real k; small strata (n ≤
    // headroom·k) get cutoff ≥ 2^32, i.e. survive whole.
    val nOfAll: Map[Option[String], Long] = base.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val nOf: Map[String, Long] =
      nOfAll.collect { case (Some(l), n) => l -> n }
    // a NULL-lang stratum (dirty data) can't key the cutoff map —
    // element_at(map, NULL) is NULL so its rows never survive the
    // pre-pass filter; route the whole stratum through the fallback
    // window instead of silently dropping it (the plain-window
    // semantics this decomposition must preserve)
    val hasNullStratum = nOfAll.contains(None)
    val cutOf: Map[String, Long] = nOf.view.mapValues(n =>
      (headroom.toLong * k * (1L << 32)) / n).toMap
    // phase 2: survivors (~headroom·k rows/stratum) — checkpointed so
    // the count-below and the window read the tiny set, not the corpus
    val surv = base.filter(col("rk") <
        coalesce(element_at(typedLit(cutOf), col("lang")), lit(0L)))
      .localCheckpoint()
    // safety: the k smallest hashes are provably inside the survivor
    // set iff ≥ min(k, n) rows survived
    val nsOf: Map[String, Long] = surv.groupBy(col("lang"))
      .agg(count(lit(1)).as("ns"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val unsafe: Seq[String] = nOf.collect {
      case (lang, n) if nsOf.getOrElse(lang, 0L) < math.min(n, k.toLong)
        => lang
    }.toSeq.sorted
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("rk"), col("doc_id"))
    val fromSurv =
      (if (unsafe.isEmpty) surv
       else surv.filter(!col("lang").isin(unsafe: _*)))
        .withColumn("rn", row_number().over(w))
    // fallback: the (normally zero) underflow strata — plus the NULL
    // stratum if present — window in full; the lang list is a
    // pushed-down predicate on the corpus scan
    val fallbackPred: Option[Column] =
      (unsafe.nonEmpty, hasNullStratum) match {
        case (false, false) => None
        case (true, false) => Some(col("lang").isin(unsafe: _*))
        case (false, true) => Some(col("lang").isNull)
        case (true, true) =>
          Some(col("lang").isin(unsafe: _*) || col("lang").isNull)
      }
    val all = fallbackPred.fold(fromSurv)(p =>
      fromSurv.unionByName(
        base.filter(p).withColumn("rn", row_number().over(w))))
    all.filter(col("rn") <= k)
      .select(col("lang"), col("rn").cast("int").as("rn"),
        col("doc_id"), col("n_chars"))
  }

  /** Cumulative-share COVERAGE selection: the smallest prefix of
    * sources (ranked by token mass) whose running total reaches
    * `share` of the corpus — "which domains make up 90% of my tokens",
    * the pruning/licensing decision every corpus audit starts with.
    * A source is kept iff the mass BEFORE it is still short of the
    * target, so the result is exactly the minimal covering prefix.
    * Plan: one tokenize+agg pass (map-side combined), then a window
    * over the SOURCE-level table — group-count-sized, so the window
    * state is bounded by source cardinality, not corpus size. All
    * integer token counts; the share threshold multiplies a bigint
    * total in double — exact for totals < 2^53. */
  def coverageSelect(spark: SparkSession, dir: String,
      share: Double = 0.9): DataFrame = {
    val perSource = t(spark, dir, "documents")
      .select(col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("toks"))
      .groupBy("source").agg(sum(col("toks")).as("tokens"))
    val w = Window.orderBy(col("tokens").desc, col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = Window.partitionBy()
    perSource
      .withColumn("cum_tokens", sum(col("tokens")).over(w))
      .withColumn("__total", sum(col("tokens")).over(total))
      .filter((col("cum_tokens") - col("tokens")).cast("double") <
        lit(share) * col("__total").cast("double"))
      .select(col("source"), col("tokens"), col("cum_tokens"))
      .orderBy(col("tokens").desc, col("source"))
  }

  /** Range join, bucket-accelerated: for each event, the user's orders
    * in the trailing 7 days. A naive range-predicate join is a
    * broadcast-nested-loop at scale; instead each event EXPLODES into
    * its 8 covered calendar days, orders key by their day, and the join
    * is pure equi on (user, day) — shuffle-bounded, fan-out 8×events —
    * with the exact timestamp range applied as a post-filter. Events
    * with no orders in range are kept via the final left join. */
  def rangeJoinBucketed(spark: SparkSession, dir: String): DataFrame = {
    val events = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val eDays = events.withColumn("day",
      explode(sequence(
        to_date(col("ts") - expr("INTERVAL 7 DAYS")), to_date(col("ts")))))
    val orders = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), to_date(col("o_orderdate")).as("day"))
    val matched = eDays
      .join(orders,
        eDays("user_id") === orders("o_custkey") &&
          eDays("day") === orders("day"))
      .filter(col("o_orderdate") >= col("ts") - expr("INTERVAL 7 DAYS") &&
        col("o_orderdate") <= col("ts"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"))
    events
      .join(matched, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"),
        (unix_micros(col("ts"))).as("ts_us"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("sum_price"))
      .orderBy("event_id")
  }

  /** Sequence packing for training: assign documents to fixed-token-
    * budget packs the way an LLM data loader fills context windows.
    * Documents are sharded by content hash (shards = the unit of
    * parallelism — each worker packs its shard independently, which is
    * how real pipelines do it; a single global ORDER BY + running sum
    * would serialize the corpus through one partition at 100 TB), then
    * packed greedily in deterministic hash order within the shard: a
    * doc starts pack `floor(cum_tokens_before / budget)`. Token counts
    * are whitespace tokens (the registered token-counting semantics).
    * One shuffle (the window partition exchange); integer arithmetic
    * throughout, so the oracle match is exact. */
  def seqPacking(spark: SparkSession, dir: String, nShards: Int = 8,
      budget: Long = 512L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("h", md5(concat(lit("pack:"), col("doc_id").cast("string"))))
      .withColumn("shard", graft.util.Tables.md5Bucket("shard:", col("doc_id"), nShards)
        .cast("int"))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    docs
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .withColumn("pack_id",
        floor((col("cum_tok") - col("n_tok")) / lit(budget)).cast("long"))
      .select(col("doc_id"), col("shard"), col("pack_id"), col("n_tok"),
        col("cum_tok"))
      .orderBy("doc_id")
  }

  /** Shard EXPORT + manifest — the last-mile step of the training-data
    * pipeline: the [[seqPacking]] assignment is physically written as
    * one partition directory per shard (what a data loader consumes),
    * then the MANIFEST is computed from the WRITTEN files — doc, pack
    * and token accounting per shard — so the registered query gates the
    * full export roundtrip, not just the in-memory assignment. A wrong
    * write layout, a dropped row, or a type-mangled readback all break
    * the oracle match. One extra keyed shuffle over the packing plan;
    * the write itself is shard-partitioned and embarrassingly parallel. */
  def shardExport(spark: SparkSession, dir: String, nShards: Int = 8,
      budget: Long = 512L): DataFrame = {
    // absolute + dataset-scoped, per the scratch convention
    // (Ingest.scratchBase / Tables.pathTag): sf0.01 and sf0.1 runs must
    // not clobber each other's export, and the resolved-once Scratch
    // root keeps the path stable against a mid-run chdir
    val out = graft.util.Scratch
      .under("graft_shards/" + graft.util.Tables.pathTag(dir)).toString
    graft.util.Scratch.deleteRecursive(java.nio.file.Paths.get(out))
    seqPacking(spark, dir, nShards, budget)
      .write.partitionBy("shard").parquet(out)
    // shard comes back from the partition DIRECTORY — string under the
    // engine session (inference off); cast before grouping
    spark.read.parquet(out)
      .groupBy(col("shard").cast("int").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("pack_id")).as("n_packs"),
        sum(col("n_tok")).as("n_tokens"),
        max(col("cum_tok")).as("max_cum_tok"))
      .orderBy("shard")
  }

  /** Token-budget document chunking with overlap — the SPLITTING
    * complement of [[seqPacking]]'s joining: long documents become
    * fixed-size training windows (`chunkSize` tokens, consecutive
    * chunks sharing `overlap` tokens so no span is ever cut without
    * context), short documents pass through as one chunk. Chunk i
    * covers token positions [i·stride, i·stride+chunkSize) with
    * stride = chunkSize − overlap; the count is
    * max(1, ⌈(n − overlap) / stride⌉), so the final chunk always has
    * more than `overlap` tokens (never a pure-overlap tail).
    *
    * Everything is per-row HOF work — tokenize once, explode a
    * chunk-index sequence, `slice` + `array_join` per chunk — no
    * shuffle at all until the output sort: fan-out is proportional to
    * each document's own token count, the embarrassingly-parallel
    * shape that holds at 100 TB. Integer boundaries throughout (the
    * one division's double rounding cannot cross an integer — operands
    * are tiny), so the DuckDB oracle (list_slice on the same
    * tokenization, proven bit-compatible by `seq_packing`) is exact. */
  def docChunk(spark: SparkSession, dir: String, chunkSize: Int = 64,
      overlap: Int = 8): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got $chunkSize/$overlap")
    val stride = chunkSize - overlap
    t(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .withColumn("n_chunks",
        greatest(lit(1L),
          ceil((size(col("toks")) - lit(overlap)).cast("double") /
            lit(stride.toDouble)).cast("long")))
      .withColumn("chunk_id",
        explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("chunk_toks",
        slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkSize)))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk_toks")).cast("long").as("n_tokens"),
        array_join(col("chunk_toks"), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Deterministic train/val/test split assignment — the dataset-level
    * twin of [[sampleStratified]]'s row filter: every doc gets a split
    * from its content-derived bucket (80/10/10), so the assignment is
    * identical on every run, engine, and retry, and a re-shuffled or
    * re-partitioned corpus never leaks rows across splits. Per-row
    * projection, no shuffle; the registered query aggregates
    * (source, split) counts so the oracle pins the whole assignment. */
  def trainSplit(spark: SparkSession, dir: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = graft.util.Tables.md5Bucket("split:", col("doc_id"), 100)
    t(spark, dir, "documents")
      .withColumn("split",
        when(bucket < trainPct, lit("train"))
          .when(bucket < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("source", "split")
  }

  /** X72 — LEAKAGE-SAFE train/val/test split: [[trainSplit]]'s
    * deterministic assignment keyed by the NEAR-DUP GROUP instead of
    * the document. A doc-keyed split can put two near-duplicates on
    * opposite sides of the train/eval boundary — the eval set then
    * contains lightly-edited copies of training documents and the
    * benchmark leaks (the split-time counterpart of
    * [[graft.ops.QualitySignals.decontaminate]], which can only catch
    * leakage against a KNOWN eval set). Here every document hashes by
    * its connected-component label over the MinHash candidate pairs
    * ([[Dedup.nearDupPairsCached]] → [[Dedup.minLabelComponents]], the
    * dedup_groups machinery; singletons label as themselves), so an
    * entire near-dup group lands on one side by construction.
    *
    * Output is the full per-doc assignment (doc_id, group_id, split)
    * — the oracle pins every row, and the leakage property
    * (∀ near-dup pair: same split) is pinned by ReshapeSpec directly.
    *
    * Scale shape: the pair graph + label propagation are dedup_groups'
    * (pair-stream-sized rounds, driver holds a convergence flag); the
    * split itself is a broadcast-or-keyed left join of the label
    * relation onto the corpus plus a per-row md5 — no new corpus
    * shuffle class. At 100 TB the label relation is pair-participant-
    * sized (≪ corpus), so the join broadcasts under AQE or shuffles
    * doc-id-sized rows at worst. */
  def leakageSafeSplit(spark: SparkSession, dir: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val pairs = Dedup.nearDupPairsCached(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val labels = Dedup.minLabelComponents(pairs)
    val bucket =
      graft.util.Tables.md5Bucket("lsplit:", col("group_id"), 100)
    t(spark, dir, "documents").select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("group_id", coalesce(col("grp"), col("doc_id")))
      .withColumn("split",
        when(bucket < trainPct, lit("train"))
          .when(bucket < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("group_id"), col("split"))
      .orderBy("doc_id")
  }

  /** Weighted domain-mix sampling: re-balance a corpus toward target
    * per-source sampling rates (the "training mixture" step — e.g.
    * up-sample curated sources, down-sample crawl). Rates live in a
    * tiny dim table (broadcast join — never a shuffle of the corpus);
    * membership is the content-derived hash coin, so the same doc is
    * in or out on every run and every engine. Embarrassingly parallel:
    * broadcast join + per-row filter, no corpus shuffle. */
  def domainMixSample(spark: SparkSession, dir: String): DataFrame = {
    val ratesDf = spark.createDataFrame(MixRates).toDF("source", "rate")
    t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"))
      .join(broadcast(ratesDf), Seq("source"))
      .withColumn("bucket", graft.util.Tables.md5Bucket("mix:", col("doc_id"), 100).cast("int"))
      .filter(col("bucket") < col("rate"))
      .select(col("doc_id"), col("source"), col("lang"), col("bucket"))
      .orderBy("doc_id")
  }

  /** Target per-source sampling rates (percent). Deterministic spread
    * across the synthetic src0..src19 sources; the oracle SQL's VALUES
    * list is generated from this same map (single source of truth). */
  val MixRates: Seq[(String, Int)] =
    (0 until 20).map(i => (s"src$i", Seq(80, 35, 10, 55)(i % 4)))

  /** Per-source TOKEN budgets for [[tokenBudgetMix]] — fixed, like
    * [[MixRates]]; the oracle's VALUES list mirrors this map. */
  val TokenBudgets: Seq[(String, Long)] =
    (0 until 20).map(i => (s"src$i", Seq(6000L, 2500L, 800L, 4000L)(i % 4)))

  /** X75 — TOKEN-BUDGET domain mix: select documents per source until
    * a per-source TOKEN budget fills — the form training mixes are
    * actually specified in (a mixture spec says "20B code tokens, 5B
    * forum tokens", not percentages; [[domainMixSample]]'s rate form
    * cannot hit a token target when doc lengths vary by source).
    * Selection order is the content-derived md5 coin (ties by doc_id),
    * so the chosen prefix is deterministic and engine-independent;
    * greedy rule: a doc is kept iff the tokens selected BEFORE it are
    * still under budget (the crossing doc is included — budgets fill,
    * never undershoot).
    *
    * Scale shape — the reason this is not one window: a per-source
    * ordered cumsum would sort EVERY source's documents in one reducer
    * (a 100 TB web source = one task). Instead, two phases: (1) token
    * sums per (source, coarse coin bucket) — one keyed agg to a
    * BOUNDED relation (sources × 1000 buckets) whose bucket-level
    * running sum is computed inside that bounded relation and
    * broadcast back; (2) a window over (source, bucket) partitions —
    * each ~1/1000 of a source — adds the within-bucket prefix, and
    * the keep test composes the two. No source-wide sort partition
    * anywhere; the exact same greedy prefix as the naive window (the
    * bucket running sum IS the global prefix at bucket granularity,
    * coin order refines inside). Integer token arithmetic end-to-end,
    * so the DuckDB oracle (which replays the naive one-window form —
    * it need not be scalable) matches bit-for-bit. */
  def tokenBudgetMix(spark: SparkSession, dir: String): DataFrame = {
    val budgetsDf = spark.createDataFrame(TokenBudgets)
      .toDF("source", "budget")
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(graft.ops.TextAnalysis.tokens(col("text")))
          .cast("long").as("n_tok"))
      .withColumn("coin",
        graft.util.Tables.md5Bucket("tbm:", col("doc_id"), 1000000))
      .withColumn("cb", floor(col("coin") / 1000).cast("int"))
    // phase 1: bucket token sums → bounded relation; running sum per
    // source over ≤1000 rows each (the window here is over the
    // BOUNDED bucket relation, not the corpus)
    val wB = Window.partitionBy(col("source")).orderBy(col("cb"))
    val bounds = docs.groupBy(col("source"), col("cb"))
      .agg(sum(col("n_tok")).as("bt"))
      .withColumn("bucket_before",
        coalesce(sum(col("bt")).over(
          wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("cb"), col("bucket_before"))
    // phase 2: within-bucket prefix over (source, cb) partitions
    val wIn = Window.partitionBy(col("source"), col("cb"))
      .orderBy(col("coin"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .join(broadcast(bounds), Seq("source", "cb"))
      .join(broadcast(budgetsDf), Seq("source"))
      // prune BEFORE the window: a bucket whose global prefix already
      // meets the budget cannot contribute a kept doc (every member's
      // cum_before ≥ bucket_before ≥ budget), so the phase-2 window
      // only shuffles the ~budget-sized surviving mass, not the corpus
      .filter(col("bucket_before") < col("budget"))
      .withColumn("cum_before",
        col("bucket_before") + sum(col("n_tok")).over(wIn) - col("n_tok"))
      .filter(col("cum_before") < col("budget"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        col("cum_before"))
      .orderBy("source", "doc_id")
  }

  /** X74 — QUALITY-WEIGHTED deterministic sampling: keep each document
    * with probability p = clamp(0.5 + margin, 0, 1), margin the X68
    * classifier's decimal-exact score — the soft companion of
    * `quality_score`'s hard threshold (published pipelines sample
    * proportionally to classifier confidence rather than cliff-edge
    * filtering, so borderline text survives at reduced rate instead
    * of vanishing). Membership is the content-derived md5 coin
    * ([[graft.util.Tables.md5Bucket]] mod 10^6, scaled to [0,1)), so
    * the sample is identical on every run, engine, and retry — a
    * rand()-based sampler could never be oracle-gated or reproduced.
    * Every arithmetic step (decimal-accumulated margin, double add,
    * clamp via least/greatest, exact /10^6 division) is bit-identical
    * in DuckDB, so the oracle pins the exact kept set.
    *
    * Scale shape: the classifier's one map-side-combined agg plus a
    * per-row coin + filter — no joins, no new shuffle class; output
    * is the kept slice with its audit columns (margin, keep_p, coin). */
  def weightedSample(spark: SparkSession, dir: String,
      nBuckets: Int = 1024): DataFrame = {
    val scored = QualitySignals.qualityScore(spark, dir, nBuckets)
      .select(col("doc_id"), col("margin"))
    val keepP = least(lit(1.0), greatest(lit(0.0), lit(0.5) + col("margin")))
    val coin = graft.util.Tables
      .md5Bucket("wsmp:", col("doc_id"), 1000000)
      .cast("double") / 1000000.0
    scored
      .withColumn("keep_p", keepP)
      .withColumn("coin", coin)
      .filter(col("coin") < col("keep_p"))
      .orderBy("doc_id")
  }

  /** X78 — TEMPERATURE-SMOOTHED source mixture (the mT5-style
    * α-sampling recipe, α = 1/2): derive per-source sampling rates
    * from the corpus's OWN token distribution — target share
    * q_i ∝ p_i^α — instead of a hand-written rate table
    * ([[domainMixSample]]) or absolute budgets ([[tokenBudgetMix]]).
    * α < 1 flattens the mixture: head sources are down-sampled, tail
    * sources (low-resource languages, small curated sets) retained up
    * to fully — the published balancing move for multilingual /
    * multi-source mixes when the tail should be boosted without
    * hand-tuning twenty knobs. The overall volume target is covariant
    * with the corpus (targetNum/targetDen of total tokens, default
    * 2/5), so the same operator call is meaningful at every scale.
    *
    * Exactness: α = 1/2 is floor(sqrt(T_i)) — IEEE-754 sqrt is
    * CORRECTLY ROUNDED (unlike pow), so it is bit-identical across
    * engines; everything else is int64 (the rate is DEFINED by the
    * factorized floor-division chain below, so the oracle replays it
    * digit-for-digit; magnitudes stay inside int64 up to ~9×10^12
    * corpus tokens, past which the 20-row derivation widens to
    * decimal). Membership is the content-derived md5 coin against the
    * ppm rate — deterministic on every run, engine, and retry.
    *
    * Scale shape: ONE map-side-combined agg to source-sized token
    * totals; the rate derivation runs on the driver over that
    * constant-bounded relation (≤ |source domain| rows — the codebook
    * convention); rates broadcast back over one corpus pass with a
    * per-row coin — the stats-join-back class ([[QualitySignals
    * .lengthOutliers]], neardup_probe). No corpus shuffle beyond the
    * partial+final agg. */
  /** The α = 1/2 rate derivation of [[temperatureMix]], shared with
    * the quality-gate probe's build step: pure int64 over the
    * source-sized token totals — N = floor(tot·num/den), a =
    * floor(N·10^6 / Σ⌊√T_j⌋), r_i = min(10^6, floor(a·⌊√T_i⌋ / T_i));
    * zero-token sources rate 0. IEEE sqrt is correctly rounded, so
    * every step replays bit-identically in the DuckDB oracle. */
  private[graft] def temperatureRates(bySrcTok: Seq[(String, Long)],
      targetNum: Long = 2L, targetDen: Long = 5L): Seq[(String, Long)] = {
    val sI = bySrcTok.map { case (_, tk) =>
      math.floor(math.sqrt(tk.toDouble)).toLong }
    // an all-zero-token corpus (every source empty) has no mixture to
    // derive — every rate is 0, matching the oracle's per-row CASE
    // (which never divides); without the guard a = x/0 throws
    val sSum = sI.sum
    val a =
      if (sSum == 0L) 0L
      else (bySrcTok.map(_._2).sum * targetNum / targetDen) *
        1000000L / sSum
    bySrcTok.zip(sI).map { case ((src, tk), s) =>
      (src, if (tk == 0L) 0L else math.min(1000000L, a * s / tk)) }
  }

  def temperatureMix(spark: SparkSession, dir: String,
      targetNum: Long = 2L, targetDen: Long = 5L): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(graft.ops.TextAnalysis.tokens(col("text")))
          .cast("long").as("n_tok"))
    // source-sized stats: constant-bounded collect (source domain),
    // same convention as the IVF codebooks / dt lists
    val st = docs.groupBy(col("source"))
      .agg(sum(col("n_tok")).as("src_tok"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val ratesDf = spark.createDataFrame(
        temperatureRates(st.toSeq, targetNum, targetDen))
      .toDF("source", "rate_ppm")
    docs
      .join(broadcast(ratesDf), Seq("source"))
      .withColumn("coin",
        graft.util.Tables.md5Bucket("tmix:", col("doc_id"), 1000000))
      .filter(col("coin") < col("rate_ppm"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        col("rate_ppm"))
      .orderBy("doc_id")
  }
}
