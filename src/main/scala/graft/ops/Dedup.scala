package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory
import graft.util.Tables.{t, fanOut}

/** X3 — near-duplicate text detection via MinHash + banded LSH
  * (SURVEY.md §2.8). Deterministic md5 minhashes (identical in the
  * DuckDB oracle) rather than MLlib's MinHashLSH, whose random
  * coefficients would be unverifiable cross-engine; the Spark plan shape
  * is the same banded self-join.
  *
  * Pipeline: word 3-gram shingles → per (doc, band) minhash signature →
  * self-join on (band, signature) — fan-out bounded by band-bucket
  * size, NEVER all-pairs — → pairs agreeing on ≥ minBands bands.
  * At 100 TB each stage is a shuffle-bounded groupBy/join on
  * (band, signature); skewed buckets (stop-shingle mins) are the one
  * hazard, handled by AQE skew-join splitting. */
object Dedup {

  private val log = LoggerFactory.getLogger(getClass)

  /** Word 3-gram shingle array over an ALREADY-MATERIALIZED token
    * column. The token array must be a plain column reference, not the
    * tokenize expression inline: Spark does not CSE a subexpression
    * across a lambda boundary, so an inline `split(...)` would re-run
    * per sequence element — benched 10× slower at sf0.1. */
  private[graft] def shingles3(w: org.apache.spark.sql.Column) =
    when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2), i =>
        concat_ws(" ", element_at(w, i), element_at(w, i + 1),
          element_at(w, i + 2))))
      .otherwise(array())

  /** (doc_id, band, sig) minhash signatures: sig = min md5 over the
    * doc's shingles, salted per band.
    *
    * All nBands mins are aggregated in ONE groupBy(doc_id) pass — the
    * map-side partial aggregate reduces each partition to one row per
    * doc BEFORE the shuffle, so the exchange carries |docs| rows, not
    * |shingles|×nBands (a crossJoin-with-bands formulation benched 12s
    * vs ~1s at sf0.1 for exactly this reason). The per-band rows are
    * then unpivoted from the aggregated result. */
  def bandSignatures(spark: SparkSession, dir: String,
      nBands: Int = 8): DataFrame =
    bandSignaturesFor(fanOut(t(spark, dir, "documents")), nBands)

  /** Signature variant over an arbitrary (doc_id, text) DataFrame —
    * lets composed pipelines (cleanCorpus) restrict the expensive
    * shingle/signature work to an already-filtered corpus. */
  def bandSignaturesFor(docs: DataFrame, nBands: Int = 8): DataFrame =
    bandSignaturesTok(
      docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w")),
      nBands)

  /** [[bandSignaturesFor]] over an ALREADY-TOKENIZED (doc_id, w)
    * corpus — the corpus-pipeline form, where one tokenization pass
    * feeds every stage. */
  private[graft] def bandSignaturesTok(docs: DataFrame,
      nBands: Int = 8): DataFrame = {
    val sh = docs
      .select(col("doc_id"),
        explode(array_distinct(shingles3(col("w")))).as("shingle"))
    // NOTE: a numeric 32-bit minhash (conv(substring(md5,1,8),16,10))
    // was benched to move this from SortAggregate to HashAggregate —
    // no measurable win at sf0.1 or 10× (the agg is not the bottleneck
    // at these scales), so the md5 string min stays for oracle parity.
    val minCols = (0 until nBands).map(b =>
      min(md5(concat(lit(s"$b:"), col("shingle")))).as(s"sig_$b"))
    sh.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band"), col(s"sig_$b").as("sig"))): _*)).as("h"))
      .select(col("doc_id"), col("h.band"), col("h.sig"))
  }

  /** X3b — SimHash near-dup: 64-bit simhash over 3-gram shingle
    * features (md5-derived bit hashes — deterministic in the DuckDB
    * oracle), candidates bucketed on FOUR 16-bit chunks, exact hamming
    * filter after. Pigeonhole guarantee: a pair within hamming ≤ 3
    * differs in at most 3 of the 4 chunk regions, so it must agree on
    * at least one chunk and is always surfaced — chunk count must
    * exceed hammingMax for full recall.
    *
    * The signature is CARRIED AS TWO 32-BIT HALVES (sim_lo = bits
    * 0–31 from md5 hex chars 1–8, sim_hi = bits 32–63 from chars 9–16):
    * a single 64-bit value would need `1 << 63`, which is negative in
    * both Spark's ANSI longs and DuckDB BIGINT — summing those powers
    * of two overflows. Each half sums disjoint powers < 2^32, safe in
    * both engines; hamming distance is the sum of the halves'
    * bit_count(xor).
    *
    * Scale shape: one groupBy(doc_id) with 64 map-side-combined sums
    * builds the signatures; candidates are generated BUCKET-LOCALLY
    * per (chunk region, chunk value) via collect + pair explode, so
    * the signature subplan executes once. 16-bit chunks give 65,536
    * buckets per region — expected bucket occupancy stays ~N/65536
    * (vs ~N/256 for the 8-bit chunks this replaces, whose pair fan-out
    * went quadratic past ~1M docs); `maxBucket` still caps adversarial
    * buckets (near-identical boilerplate corpora). */
  def simhashPairs(spark: SparkSession, dir: String,
      hammingMax: Int = 3, maxBucket: Int = 0): DataFrame =
    simhashPairsFor(fanOut(t(spark, dir, "documents")), hammingMax,
      maxBucket)

  /** (doc_id, sim_lo, sim_hi) 64-bit simhash signatures over an
    * arbitrary (doc_id, text) corpus — the shared signature subplan of
    * [[simhashPairsFor]], public so SimhashSpec can brute-force-verify
    * the banded candidate generation's recall independently of the
    * cross-engine oracle (which cannot catch a bug implemented
    * identically on both sides). */
  def simhashSignaturesFor(docs: DataFrame): DataFrame = {
    val sh = docs
      .withColumn("w", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        explode(array_distinct(shingles3(col("w")))).as("g"))
      // 64-bit feature hash as two 32-bit md5 hex slices
      .withColumn("hex", md5(col("g")))
      .select(col("doc_id"),
        conv(substring(col("hex"), 1, 8), 16, 10).cast("long").as("hlo"),
        conv(substring(col("hex"), 9, 8), 16, 10).cast("long").as("hhi"))
    def bitSums(src: String, pre: String) = (0 until 32).map(j =>
      sum(when(shiftright(col(src), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"$pre$j"))
    def half(pre: String) = (0 until 32).map(j =>
      when(col(s"$pre$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a + b)
    val allSums = bitSums("hlo", "l") ++ bitSums("hhi", "u")
    sh.groupBy(col("doc_id"))
      .agg(allSums.head, allSums.tail: _*)
      .select(col("doc_id"), half("l").as("sim_lo"), half("u").as("sim_hi"))
  }

  /** [[simhashPairs]] over an arbitrary (doc_id, text) corpus. */
  def simhashPairsFor(docs: DataFrame, hammingMax: Int = 3,
      maxBucket: Int = 0): DataFrame = {
    val nChunks = 4 // 16-bit regions; must be > hammingMax for recall
    require(hammingMax < nChunks,
      s"hammingMax=$hammingMax needs more than $hammingMax chunks for full recall")
    val sig = simhashSignaturesFor(docs)
    // 16-bit chunk values: regions 0,1 off sim_lo; 2,3 off sim_hi.
    val mask = 0xFFFFL
    val chunkVals = Seq(
      col("sim_lo").bitwiseAND(lit(mask)),
      shiftright(col("sim_lo"), 16).bitwiseAND(lit(mask)),
      col("sim_hi").bitwiseAND(lit(mask)),
      shiftright(col("sim_hi"), 16).bitwiseAND(lit(mask)))
    // Bucket-local pair generation, like nearDupPairs: explode one row
    // per (chunk region, chunk value), collect each bucket's members,
    // emit its (a<b) pairs. The signature subplan runs ONCE — a
    // chunk-per-join formulation re-executed it on every join side
    // (benched ~2× slower at sf0.1 on the 32-bit version).
    val buckets = sig
      .select(col("doc_id"), col("sim_lo"), col("sim_hi"),
        explode(array(chunkVals.zipWithIndex.map { case (cv, i) =>
          struct(lit(i).as("chunk"), cv.as("cval")) }: _*)).as("h"))
      .groupBy(col("h.chunk"), col("h.cval"))
      .agg(sort_array(collect_list(
        struct(col("doc_id"), col("sim_lo"), col("sim_hi")))).as("docs"))
      .filter(size(col("docs")) > 1)
    val capped =
      if (maxBucket > 0) buckets.filter(size(col("docs")) <= maxBucket)
      else buckets
    capped
      .select(explode(flatten(transform(col("docs"), (a, i) =>
        transform(slice(col("docs"), i + 2, size(col("docs"))), b =>
          struct(a.getField("doc_id").as("doc_a"),
            b.getField("doc_id").as("doc_b"),
            a.getField("sim_lo").as("lo_a"),
            b.getField("sim_lo").as("lo_b"),
            a.getField("sim_hi").as("hi_a"),
            b.getField("sim_hi").as("hi_b")))))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.lo_a").as("lo_a"), col("p.lo_b").as("lo_b"),
        col("p.hi_a").as("hi_a"), col("p.hi_b").as("hi_b"))
      // dedup pairs surfaced by several chunk regions BEFORE scoring
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        (bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
          bit_count(col("hi_a").bitwiseXOR(col("hi_b")))).as("hamming"))
      .filter(col("hamming") <= hammingMax)
      .orderBy("doc_a", "doc_b")
  }

  /** X3c — exact n-gram Jaccard over the MinHash candidate pairs:
    * LSH bounds the candidate set, then the true 3-gram-set Jaccard is
    * computed per candidate — integer intersection/union counts, so the
    * double division is engine-exact.
    *
    * Plan shape (fixed after the 10× scale-stress caught the previous
    * one): candidates come from [[nearDupPairs]] and are materialized
    * once with localCheckpoint (pair-count-sized, tiny relative to the
    * corpus). Intersections are a shingle equi-join between candidate
    * docs only — the corpus-sized shingle relation is SEMI-JOINED down
    * to candidate docs before anything heavy touches it, so per-pair
    * work is bounded by candidate-set size, never corpus size.
    *
    * The previous formulation carried `collect_set(shingles)` through
    * one "shared" aggregation; column pruning actually split it into
    * THREE corpus passes and AQE then broadcast the corpus-sized
    * signature+set table as the build side of both pair joins — ~6×
    * super-linear from 3× to 10× docs locally, and a guaranteed driver
    * OOM on a real cluster. The join-based intersection computes the
    * same integers, so this is plan-only: output is bit-identical and
    * the paired oracle is unchanged. */
  def ngramJaccard(spark: SparkSession, dir: String, nBands: Int = 8,
      minBands: Int = 4): DataFrame = {
    // memoized localCheckpoint: 2 consumers below (and other queries in
    // the same session); without it the signature subplan runs twice
    val pairs = nearDupPairsCached(spark, dir, nBands, minBands)
    val sh = fanOut(t(spark, dir, "documents"))
      .withColumn("w", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        explode(array_distinct(shingles3(col("w")))).as("g"))
    val pairDocs = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    // AQE broadcasts pairDocs when small; degrades to a shuffle
    // semi-join (not a broadcast of the corpus) when it isn't.
    // memoized localCheckpoint: THREE consumers below (ns + both
    // intersection sides) would each re-derive the corpus
    // scan→shingle→semi-join lineage; shc is candidate-doc-sized, so
    // pinning it cuts the plan from 3 corpus scans to this one, and
    // the memo keeps repeat invocations from stacking pinned blocks.
    val shc = graft.util.CkptMemo.of(spark, "ngram_shc", dir, nBands,
        minBands) {
      sh.join(pairDocs, Seq("doc_id"), "left_semi").localCheckpoint()
    }
    val ns = shc.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // Pair-DRIVEN intersection: attach A's shingles to each pair, then
    // equi-join on (doc_b, shingle). Work is |pairs|·|doc| rows — a
    // candidate self-join on shingle alone instead explodes with
    // bucket occupancy² on common shingles (measured 3× slower than
    // even the broken formulation on a small-vocabulary corpus).
    val inter = pairs.select(col("doc_a"), col("doc_b"))
      .join(shc.select(col("doc_id").as("doc_a"), col("g")), Seq("doc_a"))
      .join(shc.select(col("doc_id").as("doc_b"), col("g")),
        Seq("doc_b", "g"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    // INNER join on the intersections, matching the paired oracle: a
    // band-min can only be equal when the two docs share the shingle
    // that produced it (absent an md5 collision), so every LSH pair has
    // inter ≥ 1 and a zero-intersection row cannot exist in either
    // engine.
    pairs
      .join(inter, Seq("doc_a", "doc_b"))
      .join(ns.select(col("doc_id").as("doc_a"), col("n").as("n_a")),
        Seq("doc_a"))
      .join(ns.select(col("doc_id").as("doc_b"), col("n").as("n_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_bands"), col("inter"),
        col("n_a"), col("n_b"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")))
      .orderBy("doc_a", "doc_b")
  }

  /** Corpus 3-shingle relation (doc_id, g) — the shared input of the
    * exact set-similarity family ([[jaccardPrefixJoin]],
    * [[containmentJoin]], the probe index build) — checkpointed ONCE
    * per session via [[graft.util.CkptMemo]].
    *
    * DISK_ONLY: this relation is corpus-shingle-sized — heap-cached it
    * competes with the downstream joins' shuffle buffers (OOM'd the
    * 100× stress at 8g); streamed from local disk it behaves like a
    * shuffle spill, which is what this materialization morally is. */
  // listing-tagged memo keys (the qgate_base lesson, pinned by
  // IndexFreshnessSpec): setSimBuildIndex fills a tag-keyed `_SUCCESS`
  // store from these checkpoints, so a corpus change must re-key the
  // memo too or the fresh store would hold yesterday's shingles
  private[graft] def shingleRelation(spark: SparkSession,
      dir: String): DataFrame =
    graft.util.CkptMemo.of(spark, "shingles", dir,
        graft.util.Tables.listingTag(spark, s"$dir/documents.parquet")) {
      fanOut(t(spark, dir, "documents"))
        .withColumn("w", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"),
          explode(array_distinct(shingles3(col("w")))).as("g"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.DISK_ONLY)
    }

  /** Per-doc shingle-set sizes over [[shingleRelation]], memoized
    * (doc-count-sized). */
  private[graft] def shingleSizes(spark: SparkSession,
      dir: String): DataFrame =
    graft.util.CkptMemo.of(spark, "shingle_sz", dir,
        graft.util.Tables.listingTag(spark, s"$dir/documents.parquet")) {
      shingleRelation(spark, dir)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        .localCheckpoint()
    }

  /** X62 — EXACT set-similarity self-join via prefix filtering (the
    * AllPairs/PPJoin family): every document pair whose shingle-set
    * Jaccard is ≥ `minJaccard`, with NO false negatives and no LSH
    * randomness — the exact complement to [[nearDupPairs]]' banded
    * MinHash (which trades recall for speed) and to the recall-checked
    * candidates [[ngramJaccard]] scores.
    *
    * Candidate generation is the classic prefix-filter reduction
    * instead of all-pairs: order each document's shingles by a GLOBAL
    * rarity rank (document frequency asc, shingle asc — any total
    * order works for correctness; rarest-first minimizes candidates),
    * keep only the first `|s| - ceil(t·|s|) + 1` shingles as the
    * document's PREFIX, and equi-join prefixes on the shingle. The
    * prefix lemma makes this lossless: J(x,y) ≥ t implies
    * |x∩y| ≥ t·|x| (and ≥ t·|y|), and two sets whose overlap is ≥ α
    * must collide inside their first |s|−α+1 elements under any shared
    * total order — so every qualifying pair shares ≥ 1 prefix shingle.
    * Common boilerplate shingles (huge join fan-out, the skew killer
    * of a naive token join) sort to the SUFFIX and never enter the
    * join.
    *
    * Candidates then pass the POSITIONAL filter (PPJoin): for a
    * qualifying pair the MINIMAL shared token g sits in both prefixes
    * (if it didn't, the whole intersection would fit in one suffix —
    * size < ⌈t·n⌉ ≤ α, contradiction), no shared token precedes it,
    * so |x∩y| ≤ 1 + min(n_x − rn_x(g), n_y − rn_y(g)); pairs whose
    * bound misses the required overlap α = ⌈t/(1+t)·(n_x+n_y)⌉ are
    * pruned before any verification work. Because both per-doc ranks
    * restrict the SAME global order, g's positions are exactly
    * (min rn_x, min rn_y) over the pair's shared prefix tokens — two
    * MIN aggregates on the candidate groupBy that deduplicates pairs
    * anyway, so the filter costs no extra shuffle. Measured at 10×
    * sf0.1: 12.5M within-copy pairs → 1.05M prefix candidates →
    * 334k after the positional filter, against 2,560 true pairs at
    * the default threshold.
    *
    * Verification is exact and candidate-driven, the [[ngramJaccard]]
    * plan shape: the corpus shingle relation is semi-joined down to
    * candidate docs, intersections are a pair-driven (doc_b, shingle)
    * equi-join, and Jaccard divides two integers — bit-identical to
    * the brute-force DuckDB oracle, which is how the losslessness
    * claim is externally checked every gate run.
    *
    * 100 TB: every stage is a keyed shuffle bounded by prefix-bucket
    * occupancy (rare shingles by construction); no stage is all-pairs
    * and nothing data-sized reaches the driver. Verification cost is
    * |candidates| · |doc shingles| rows, so the filters are the whole
    * game: the default threshold is 0.7 (the near-dup regime this
    * operator exists for — prefix length ∝ (1−t), and t=0.5 prefixes
    * are HALF of every document, which on a corpus with a dense
    * mid-similarity band admits a quadratic candidate mass; measured
    * 31M candidates → a 2.6-billion-row verification join at 100×
    * before the rewrite, vs ~3.3M candidates after). Lower thresholds
    * remain supported and exact — the t=0.5/0.3 lossless contracts
    * are spec-pinned at sf0.001 — they are just priced as the
    * scan-the-band exact queries they mathematically are. */
  def jaccardPrefixJoin(spark: SparkSession, dir: String,
      minJaccard: Double = 0.7): DataFrame = {
    // The shingle relation has SEVEN downstream consumers (df/size
    // aggs, both prefix-join sides, the semi-join, both intersection
    // sides); lineage branching re-derived the whole
    // scan→tokenize→shingle→explode pipeline per consumer — 34 corpus
    // scans in the physical plan, zero ReuseExchange (column pruning
    // specializes each branch's scan). The memoized checkpoints
    // ([[shingleRelation]]/[[shingleSizes]]/CkptMemo) pin each ONCE
    // PER SESSION — repeated invocation reuses them instead of
    // stacking fresh pinned RDD blocks (ADVICE r10) — and the derived
    // relations consumed more than once (prefix ×2, cand ×3) are
    // memoized per (dir, threshold), each at most prefix-/pair-sized.
    // One corpus scan total.
    val sh = shingleRelation(spark, dir)
    val sz = shingleSizes(spark, dir)
    val cand = jaccardCandidatePairs(spark, dir, minJaccard)
    // Exact verification, candidate-driven (see ngramJaccard for why
    // this shape and not a collect_set pass or a shingle self-join).
    val pairDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val shc = sh.join(pairDocs, Seq("doc_id"), "left_semi")
    val inter = cand
      .join(shc.select(col("doc_id").as("doc_a"), col("g")), Seq("doc_a"))
      .join(shc.select(col("doc_id").as("doc_b"), col("g")),
        Seq("doc_b", "g"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("n_a")),
        Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("n_b")),
        Seq("doc_b"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("n_a"),
        col("n_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** The prefix-filtered CANDIDATE pair set of [[jaccardPrefixJoin]]
    * (pre-verification), memoized per (dir, threshold) — named so the
    * candidate-mass gate (CandidateMassSpec) can measure |candidates|
    * against |output| directly: the "candidate mass is output-shaped
    * at t ≥ 0.7" scale claim is spec-pinned, not just a SCALE_NOTES
    * measurement. Rarity rank + per-doc set size in one cascade of
    * keyed aggs; the groupBy both DEDUPLICATES pairs and carries the
    * two MINs the positional filter needs (min rn on each side is the
    * shared minimal token's position pair — its overlap upper bound
    * is exact; see [[jaccardPrefixJoin]]'s scaladoc for the lemma). */
  /** Shared document-frequency relation over [[shingleRelation]]
    * (g, df), memoized: BOTH exact set-similarity joins (jaccard
    * prefix + containment) order prefixes by the same global rarity
    * rank, and each derived its own `sh.groupBy(g)` — a full pass
    * over the corpus shingle relation per query (r17). The groupBy
    * keeps map-side partial aggregation (hot boilerplate shingles
    * are absorbed per map partition — a window over `g` would funnel
    * every copy of a hot shingle through one reducer, the skew class
    * the prefix filter exists to avoid). In production this IS the
    * persisted document-frequency artifact of the AllPairs family. */
  private[graft] def shingleDf(spark: SparkSession,
      dir: String): DataFrame =
    graft.util.CkptMemo.of(spark, "shingle_df", dir,
        graft.util.Tables.listingTag(spark, s"$dir/documents.parquet")) {
      shingleRelation(spark, dir)
        .groupBy(col("g")).agg(count(lit(1)).as("df"))
        .localCheckpoint(false)
    }

  private[graft] def jaccardCandidatePairs(spark: SparkSession,
      dir: String, minJaccard: Double): DataFrame = {
    val sh = shingleRelation(spark, dir)
    val prefix = graft.util.CkptMemo.of(spark, "jp_prefix", dir,
        minJaccard) {
      import org.apache.spark.sql.expressions.Window
      // per-doc set size from the SAME window partitioning the rank
      // pass already needs (one exchange + one sort serve both — the
      // sz join's extra shuffle is gone, r17); sh is distinct
      // (doc_id, g) by construction, so the partition count IS the
      // shingle-set size the memoized sz relation holds
      val wDoc = Window.partitionBy(col("doc_id"))
        .orderBy(col("df"), col("g"))
      sh.join(shingleDf(spark, dir), Seq("g"))
        .withColumn("n", count(lit(1)).over(wDoc.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("rn", row_number().over(wDoc))
        .filter(col("rn") <=
          col("n") - ceil(lit(minJaccard) * col("n")) + lit(1))
        .select(col("doc_id"), col("g"), col("n"), col("rn"))
        .localCheckpoint()
    }
    graft.util.CkptMemo.of(spark, "jp_cand", dir, minJaccard) {
      prefix.select(col("g"), col("doc_id").as("doc_a"),
          col("n").as("n_a"), col("rn").as("rn_a"))
        .join(prefix.select(col("g"), col("doc_id").as("doc_b"),
          col("n").as("n_b"), col("rn").as("rn_b")), Seq("g"))
        .filter(col("doc_a") < col("doc_b"))
        .filter(least(col("n_a"), col("n_b")) >=
          lit(minJaccard) * greatest(col("n_a"), col("n_b")))
        .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
        .agg(min(col("rn_a")).as("ra"), min(col("rn_b")).as("rb"))
        .filter(lit(1) + least(col("n_a") - col("ra"),
            col("n_b") - col("rb")) >=
          ceil(lit(minJaccard / (1.0 + minJaccard)) *
            (col("n_a") + col("n_b"))))
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint()
    }
  }

  /** X67 — exact CONTAINMENT join: all ordered pairs (a, b) with
    * `|A∩B| / |A| ≥ t` over 3-shingle sets — the ASYMMETRIC near-dup
    * relation [[jaccardPrefixJoin]]'s symmetric Jaccard cannot see: a
    * quote, excerpt, or boilerplate-wrapped page is ~fully contained
    * in its source while the Jaccard of the pair is tiny (a 50-shingle
    * excerpt of a 5000-shingle source has C ≈ 1.0 but J ≈ 0.01). The
    * standard pipeline use is stripping subset pages before near-dup
    * clustering.
    *
    * Same lossless prefix machinery, containment-adapted. Only the
    * CONTAINED side is prefixed: if `|A∩B| ≥ ⌈t·n_a⌉`, fewer than
    * `n_a − ⌈t·n_a⌉ + 1` of A's tokens are outside the intersection,
    * so A's rarity prefix of that length must share a token with B —
    * B joins with its FULL shingle relation (fan-out stays bounded:
    * prefixes hold each doc's globally RAREST shingles, so prefix
    * buckets are small by construction). The positional bound carries
    * over exactly: the minimal shared token is always in A's prefix
    * (any rarer shared token would itself be a prefix token), so
    * `|A∩B| ≤ 1 + (n_a − ra)` with ra = min A-rank over shared prefix
    * tokens — one MIN on the dedup groupBy, no extra shuffle — plus
    * the size necessity `n_b ≥ ⌈t·n_a⌉`. Verification is the exact
    * candidate-driven intersection of [[jaccardPrefixJoin]], with the
    * same checkpoint structure (ONE corpus scan; the audit class that
    * operator documents).
    *
    * 100 TB: candidate mass is prefix-bucket-bounded exactly as in
    * the symmetric join; t defaults high (0.9) because containment is
    * a dedup decision, not a ranking — and prefix length ∝ (1−t)
    * keeps the per-doc join surface a sliver of its shingles. */
  def containmentJoin(spark: SparkSession, dir: String,
      minContain: Double = 0.9): DataFrame = {
    val sh = shingleRelation(spark, dir)
    val cand = containmentCandidatePairs(spark, dir, minContain)
    val pairDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val shc = sh.join(pairDocs, Seq("doc_id"), "left_semi")
    cand
      .join(shc.select(col("doc_id").as("doc_a"), col("g")), Seq("doc_a"))
      .join(shc.select(col("doc_id").as("doc_b"), col("g")),
        Seq("doc_b", "g"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("containment",
        col("inter").cast("double") / col("n_a"))
      .filter(col("containment") >= minContain)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("n_a"),
        col("n_b"), col("containment"))
      .orderBy("doc_a", "doc_b")
  }

  /** The one-sided-prefix CANDIDATE pair set of [[containmentJoin]]
    * (pre-verification), memoized per (dir, threshold) — named for
    * the candidate-mass gate, like [[jaccardCandidatePairs]]. */
  private[graft] def containmentCandidatePairs(spark: SparkSession,
      dir: String, minContain: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = shingleRelation(spark, dir)
    val sz = shingleSizes(spark, dir)
    // shared memoized df relation + window-derived set size: same
    // two-shuffles-saved rewrite as [[jaccardCandidatePairs]] (r17)
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("g"))
    val prefixA = sh.join(shingleDf(spark, dir), Seq("g"))
      .withColumn("n", count(lit(1)).over(wDoc.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <=
        col("n") - ceil(lit(minContain) * col("n")) + lit(1))
      .select(col("g"), col("doc_id").as("doc_a"),
        col("n").as("n_a"), col("rn"))
    graft.util.CkptMemo.of(spark, "cj_cand", dir, minContain) {
      prefixA
        .join(sh.select(col("g"), col("doc_id").as("doc_b")), Seq("g"))
        .filter(col("doc_a") =!= col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"), col("n_a"))
        .agg(min(col("rn")).as("ra"))
        .filter(lit(1) + col("n_a") - col("ra") >=
          ceil(lit(minContain) * col("n_a")))
        .join(sz.select(col("doc_id").as("doc_b"), col("n").as("n_b")),
          Seq("doc_b"))
        .filter(col("n_b") >= ceil(lit(minContain) * col("n_a")))
        .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
        .localCheckpoint()
    }
  }

  /** [[containmentJoin]]'s DROP SET over an arbitrary (doc_id, g)
    * shingle relation — the composable corpus-pipeline stage: the
    * distinct docs ≥ `minContain` contained in some OTHER doc of the
    * SAME relation (the excerpt/quote side, stripped before near-dup
    * clustering). Identical lossless one-sided prefix machinery and
    * candidate-driven exact verification as the registered operator,
    * reduced to the contained-side ids. The caller should checkpoint
    * `sh` — it feeds five subtrees here. */
  private[graft] def containmentDrops(sh: DataFrame,
      minContain: Double = 0.9): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dfreq = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // set size from the rank pass's own window (one exchange + one
    // sort serve both; the sz join below stays for the n_b side) —
    // the r17 prefix rewrite, see [[jaccardCandidatePairs]]
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("g"))
    val prefixA = sh.join(dfreq, Seq("g"))
      .withColumn("n", count(lit(1)).over(wDoc.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <=
        col("n") - ceil(lit(minContain) * col("n")) + lit(1))
      .select(col("g"), col("doc_id").as("doc_a"),
        col("n").as("n_a"), col("rn"))
    val cand = prefixA
      .join(sh.select(col("g"), col("doc_id").as("doc_b")), Seq("g"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"))
      .agg(min(col("rn")).as("ra"))
      .filter(lit(1) + col("n_a") - col("ra") >=
        ceil(lit(minContain) * col("n_a")))
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("n_b")),
        Seq("doc_b"))
      .filter(col("n_b") >= ceil(lit(minContain) * col("n_a")))
      .select(col("doc_a"), col("doc_b"), col("n_a"))
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("g")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("g")),
        Seq("doc_b", "g"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"))
      .agg(count(lit(1)).as("inter"))
      .filter(col("inter").cast("double") / col("n_a") >= minContain)
      .select(col("doc_a").as("doc_id")).distinct()
  }

  /** X62b/X67b-scale — persisted SET-SIMILARITY index, the SERVING
    * split of [[jaccardPrefixJoin]]/[[containmentJoin]] (the same
    * build/probe pattern as [[neardupBuildIndex]]): the corpus's
    * shingle relation WITH per-doc set sizes (`sh/`: doc_id, g, n) and
    * its document-frequency statistics (`df/`: g, df) are computed
    * once — off the session-memoized [[shingleRelation]] checkpoint —
    * and persisted. A daily pipeline must not re-run the full
    * prefix self-join per incoming batch (containment_join's 23.9×
    * 100× curve was round 10's worst); with the index, an increment
    * probes in batch-proportional work plus streaming index scans.
    * `_SUCCESS`-gated per (sf dir, source listing fingerprint) like
    * the other derived stores. */
  def setSimBuildIndex(spark: SparkSession, dir: String): String = {
    import graft.util.Tables
    val out = s"target/graft_setsim/${Tables.pathTag(dir)}_" +
      Tables.listingTag(spark, s"$dir/documents.parquet")
    if (!Tables.successExists(spark, s"$out/sh") ||
        !Tables.successExists(spark, s"$out/df")) {
      val sh = shingleRelation(spark, dir)
      sh.join(shingleSizes(spark, dir), Seq("doc_id"))
        .write.mode("overwrite").parquet(s"$out/sh")
      sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
        .write.mode("overwrite").parquet(s"$out/df")
    }
    out
  }

  /** Batch-side shingle relation of the probe queries: the docs with
    * `doc_id % batchMod == 0` stand in for the incoming increment
    * (the [[neardupProbe]] convention); memoized, batch-shingle-sized
    * (three consumers: sizes/rank window, prefix, verification). */
  private def probeBatchShingles(spark: SparkSession, dir: String,
      batchMod: Int): DataFrame =
    graft.util.CkptMemo.of(spark, "setsim_bsh", dir, batchMod) {
      fanOut(t(spark, dir, "documents")
          .filter(pmod(col("doc_id"), lit(batchMod)) === 0))
        .withColumn("w", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"),
          explode(array_distinct(shingles3(col("w")))).as("g"))
        .localCheckpoint()
    }

  /** Shared probe machinery of [[jaccardProbe]]/[[containmentProbe]]:
    * rank the BATCH side's shingles by the INDEX's df statistics
    * (rarest first; unseen shingles rank rarest at df 0 — any fixed
    * per-doc order keeps the prefix lemma lossless, df order merely
    * minimizes candidates), keep each batch doc's first
    * `n_a − ⌈t·n_a⌉ + 1` tokens, and equi-join that prefix — BROADCAST,
    * so the index side moves zero shuffle data — against the index
    * scan. The one-sided prefix is lossless for BOTH relations: any
    * pair with `|x∩y| ≥ ⌈t·n_x⌉` shares a token inside x's prefix
    * under ANY order of x's own tokens (at most n_x − ⌈t·n_x⌉ of x's
    * tokens are outside the intersection) — and J ≥ t implies
    * |x∩y| ≥ t·n_x, C ≥ t is that bound directly. The positional
    * bound carries over: every shared token's batch-rank is ≥ the
    * minimal PREFIX-shared token's rank (a rarer shared token would
    * be in the prefix and the join would have surfaced it), so
    * `|x∩y| ≤ 1 + n_a − min(rn)` prunes before verification.
    * Returns (new_doc, corpus_doc, n_a, n_b, ra) candidates. */
  private def probeCandidates(spark: SparkSession, dir: String,
      idx: String, batchMod: Int, prefixT: Double): DataFrame =
    probeCandidatesFor(spark, idx,
      probeBatchShingles(spark, dir, batchMod),
      pmod(col("doc_id"), lit(batchMod)) =!= 0, prefixT)

  /** [[probeCandidates]] over an ARBITRARY (doc_id, g) batch-shingle
    * relation — the incremental-pipeline form; `corpusFilter` selects
    * the index rows standing in for the already-ingested corpus. */
  private[graft] def probeCandidatesFor(spark: SparkSession,
      idx: String, bsh: DataFrame,
      corpusFilter: org.apache.spark.sql.Column,
      prefixT: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sizes = bsh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_a"))
    val dfStats = spark.read.parquet(s"$idx/df")
    val wDoc = Window.partitionBy(col("doc_id"))
    // INNER join, the batch side the expected build under AQE (a
    // LEFT-outer here would need a broadcast-LEFT build Spark cannot
    // plan, and would unconditionally shuffle the vocabulary-sized df
    // table; a FORCED broadcast hint would collect a
    // corpus-proportional "batch" to the driver — the maxResultSize
    // failure the 100× stress hit). Batch shingles
    // ABSENT from the index sort rarest under the (df, g) order (df 0
    // precedes every real df) and cannot be shared with any corpus
    // doc, so the implied total order puts them at the front of the
    // prefix and they are simply omitted from the emitted relation —
    // the seen tokens' ranks are offset by the per-doc unseen count
    // to stay faithful to that order, keeping the lemma and the
    // positional bound exact.
    val seen = dfStats.join(bsh, Seq("g"))
      .withColumn("rn_seen",
        row_number().over(wDoc.orderBy(col("df"), col("g"))))
      .withColumn("n_seen", count(lit(1)).over(wDoc))
    val prefix = seen.join(sizes, Seq("doc_id"))
      .withColumn("rn", col("n_a") - col("n_seen") + col("rn_seen"))
      .filter(col("rn") <=
        col("n_a") - ceil(lit(prefixT) * col("n_a")) + lit(1))
      .select(col("doc_id").as("new_doc"), col("g"), col("n_a"),
        col("rn"))
    val corpusSh = spark.read.parquet(s"$idx/sh")
      .filter(corpusFilter)
      .select(col("doc_id").as("corpus_doc"), col("g"),
        col("n").as("n_b"))
    corpusSh.join(prefix, Seq("g"))
      .groupBy(col("new_doc"), col("corpus_doc"), col("n_a"),
        col("n_b"))
      .agg(min(col("rn")).as("ra"))
  }

  /** Exact verification of probe candidates: attach the batch doc's
    * shingles to each candidate pair (both broadcast-small), count the
    * intersection against ONE streaming pass of the index, return
    * (new_doc, corpus_doc, n_a, n_b, inter). */
  private def probeVerify(spark: SparkSession, dir: String, idx: String,
      batchMod: Int, cand: DataFrame): DataFrame =
    probeVerifyFor(spark, idx,
      probeBatchShingles(spark, dir, batchMod), cand)

  /** [[probeVerify]] over an arbitrary batch-shingle relation. */
  private[graft] def probeVerifyFor(spark: SparkSession, idx: String,
      bsh: DataFrame, cand: DataFrame): DataFrame = {
    val candB = cand.join(bsh.select(col("doc_id").as("new_doc"),
      col("g")), Seq("new_doc"))
    spark.read.parquet(s"$idx/sh")
      .select(col("doc_id").as("corpus_doc"), col("g"))
      .join(candB, Seq("corpus_doc", "g"))
      .groupBy(col("new_doc"), col("corpus_doc"), col("n_a"),
        col("n_b"))
      .agg(count(lit(1)).as("inter"))
  }

  /** X62b — INCREMENTAL exact Jaccard probe: every (batch doc, corpus
    * doc) pair with shingle-set Jaccard ≥ `minJaccard`, computed
    * against the persisted [[setSimBuildIndex]] without re-pairing —
    * or re-shingling — the corpus. Batch work is batch-proportional;
    * the index contributes two STREAMING scans (candidates +
    * verification) with zero index-side shuffle, the
    * [[neardupProbe]] serving shape. Lossless (one-sided prefix — see
    * [[probeCandidates]]); the oracle is the brute-force cross-pair
    * join, so losslessness is gate-checked every run. */
  def jaccardProbe(spark: SparkSession, dir: String,
      minJaccard: Double = 0.7, batchMod: Int = 7): DataFrame = {
    val idx = setSimBuildIndex(spark, dir)
    val cand = probeCandidates(spark, dir, idx, batchMod, minJaccard)
      // J ≥ t needs |x∩y| ≥ t/(1+t)·(n_a+n_b) and t·max ≤ min
      .filter(lit(1) + col("n_a") - col("ra") >=
        ceil(lit(minJaccard / (1.0 + minJaccard)) *
          (col("n_a") + col("n_b"))))
      .filter(least(col("n_a"), col("n_b")) >=
        lit(minJaccard) * greatest(col("n_a"), col("n_b")))
      .select(col("new_doc"), col("corpus_doc"), col("n_a"), col("n_b"))
    probeVerify(spark, dir, idx, batchMod, cand)
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("new_doc"), col("corpus_doc"), col("inter"),
        col("n_a"), col("n_b"), col("jaccard"))
      .orderBy("new_doc", "corpus_doc")
  }

  /** X67b — INCREMENTAL containment probe: batch docs ≥ `minContain`
    * contained in some corpus doc (the strip-incoming-excerpts
    * decision), against the persisted index. Same serving shape and
    * lossless one-sided prefix as [[jaccardProbe]] — containment IS
    * the one-sided bound, so the filters are the registered
    * [[containmentJoin]]'s exactly. */
  def containmentProbe(spark: SparkSession, dir: String,
      minContain: Double = 0.9, batchMod: Int = 7): DataFrame = {
    val idx = setSimBuildIndex(spark, dir)
    val cand = probeCandidates(spark, dir, idx, batchMod, minContain)
      .filter(lit(1) + col("n_a") - col("ra") >=
        ceil(lit(minContain) * col("n_a")))
      .filter(col("n_b") >= ceil(lit(minContain) * col("n_a")))
      .select(col("new_doc"), col("corpus_doc"), col("n_a"), col("n_b"))
    probeVerify(spark, dir, idx, batchMod, cand)
      .withColumn("containment",
        col("inter").cast("double") / col("n_a"))
      .filter(col("containment") >= minContain)
      .select(col("new_doc"), col("corpus_doc"), col("inter"),
        col("n_a"), col("n_b"), col("containment"))
      .orderBy("new_doc", "corpus_doc")
  }

  /** X3d — near-dup GROUP assignment: connected components over the
    * MinHash candidate pairs, labels = min doc_id per component. This
    * is the step that turns pairwise candidates into dedup decisions
    * ("keep one doc per group") when duplicate clusters are larger
    * than 2 and only pairwise edges exist (a~b, b~c but never a~c).
    *
    * Algorithm: iterative min-label propagation — each round every
    * node takes the min of its own label and its neighbors' labels;
    * converges in graph-diameter rounds. Each round is one shuffle of
    * the (bounded, pair-derived) edge set; the driver holds only a
    * convergence flag, never data. Lineage is truncated with
    * localCheckpoint every round so 20 iterations don't stack 20
    * joins into one plan. Near-dup graphs are overwhelmingly tiny
    * cliques (diameter 1–2), so the loop exits after 2–3 rounds. */
  def dedupGroups(spark: SparkSession, dir: String, nBands: Int = 8,
      minBands: Int = 4, maxIter: Int = 20): DataFrame = {
    val pairs = nearDupPairsCached(spark, dir, nBands, minBands)
      .select(col("doc_a"), col("doc_b"))
    val labels = minLabelComponents(pairs, maxIter)
    val sizes = labels.groupBy(col("grp")).agg(count(lit(1)).as("grp_size"))
    labels.join(sizes, Seq("grp"))
      .select(col("doc_id"), col("grp").as("group_id"), col("grp_size"))
      .orderBy("doc_id")
  }

  /** X76 — CANONICAL-representative consolidation: one row per
    * near-dup GROUP with its keeper and provenance — the step that
    * turns [[dedupGroups]]'s per-doc labels into what a pipeline
    * actually writes back (keep ONE representative, remember where
    * the duplicates came from). Canonical = min doc_id (the group
    * label itself — deterministic, id-stable under re-runs);
    * provenance = member count, distinct sources as a SORTED
    * comma-joined list (both engines sort before joining, so the
    * string is deterministic), and the members' total chars — the
    * numbers dedup reporting ("how much did we collapse, from
    * where") is built on. Singletons (docs in no pair) are emitted
    * too, as 1-member groups: the output is a full corpus manifest,
    * not just the collapsed part.
    *
    * Scale shape: [[dedupGroups]]'s pair-stream label rounds, then
    * one left join of the label relation onto the corpus (label side
    * ≪ corpus, broadcasts under AQE) and one group-keyed agg —
    * `collect_set(source)` state is bounded by the DISTINCT SOURCE
    * count per group (sources are a small domain; a group's member
    * list is never collected). */
  def dedupCanonical(spark: SparkSession, dir: String, nBands: Int = 8,
      minBands: Int = 4, maxIter: Int = 20): DataFrame = {
    val pairs = nearDupPairsCached(spark, dir, nBands, minBands)
      .select(col("doc_a"), col("doc_b"))
    val labels = minLabelComponents(pairs, maxIter)
    t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("group_id", coalesce(col("grp"), col("doc_id")))
      .groupBy(col("group_id"))
      .agg(
        min(col("doc_id")).as("canonical_doc"),
        count(lit(1)).as("n_members"),
        countDistinct(col("source")).as("n_sources"),
        array_join(sort_array(collect_set(col("source"))), ",")
          .as("sources"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("group_id")
  }

  /** X79 — CROSS-SOURCE near-dup overlap matrix: for every unordered
    * source pair, how many near-duplicate doc pairs straddle it and
    * how much character mass they carry — the "who is contaminating
    * whom" rollup a multi-source crawl pipeline routes on (a source
    * whose rows mostly duplicate another source gets demoted or
    * dropped WHOLESALE, which per-doc dedup verdicts can't tell you).
    * The diagonal (source paired with itself) is within-source
    * duplication — retained, it's the self-redundancy baseline the
    * off-diagonal cells are judged against. Source pairs are
    * normalized to (lo ≤ hi) by string order so each unordered pair
    * is one cell.
    *
    * Scale shape: the pair stream is [[nearDupPairsCached]]'s
    * (checkpointed once per session — pair-participant-sized, ≪
    * corpus); source/char lookup is two keyed joins of that pair
    * stream against a 3-column corpus projection (pair side ≪ corpus
    * → AQE broadcasts the pairs, the corpus never shuffles), then one
    * agg onto a |sources|²-bounded cell relation. Output is tiny at
    * any corpus size. */
  def sourceOverlapMatrix(spark: SparkSession, dir: String,
      nBands: Int = 8, minBands: Int = 4): DataFrame = {
    val pairs = nearDupPairsCached(spark, dir, nBands, minBands)
      .select(col("doc_a"), col("doc_b"))
    val meta = t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val enriched = pairs
      .join(meta.select(col("doc_id").as("doc_a"),
        col("source").as("src_a"), col("n_chars").as("ch_a")), Seq("doc_a"))
      .join(meta.select(col("doc_id").as("doc_b"),
        col("source").as("src_b"), col("n_chars").as("ch_b")), Seq("doc_b"))
    enriched
      .withColumn("source_lo", least(col("src_a"), col("src_b")))
      .withColumn("source_hi", greatest(col("src_a"), col("src_b")))
      .groupBy(col("source_lo"), col("source_hi"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("ch_a") + col("ch_b")).as("pair_chars"))
      .orderBy("source_lo", "source_hi")
  }

  /** Min-label connected components over an undirected (doc_a, doc_b)
    * pair set — the iterative-propagation core of [[dedupGroups]],
    * shared with the corpus-pipeline's near-dup-group stage. Returns
    * (doc_id, grp) for every doc appearing in a pair; grp = the
    * component's minimal doc_id (when converged — see the warn). */
  private[graft] def minLabelComponents(pairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val edges = pairs.union(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    var labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("grp", col("doc_id"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // Neighbor contributions + the node's own label in ONE union; the
      // `self` flag lets min(grp) (new label) and min(grp | self) (old
      // label) come out of the SAME aggregation, so the convergence
      // check is a scan of the round's result, not an extra join.
      // checkpointed BEFORE the jump self-join: both sides of the
      // join then read a leaf, instead of re-evaluating the pair-
      // stream-sized edge join + aggregate once per side
      val propagated = labels
        .join(edges, labels("doc_id") === edges("doc_a"))
        .select(col("doc_b").as("doc_id"), col("grp"),
          lit(false).as("self"))
        .union(labels.withColumn("self", lit(true)))
        .groupBy(col("doc_id"))
        .agg(min(col("grp")).as("grp"),
          min(when(col("self"), col("grp"))).as("old"))
        .localCheckpoint()
      // POINTER JUMP: chase each node's label one hop through the
      // freshly propagated labels (label ← label's label). Reach
      // roughly DOUBLES per round, so `maxIter` bounds component
      // diameter ~2^maxIter instead of maxIter — plain propagation
      // converges in diameter rounds, and a chained near-dup corpus
      // (a → b → c → … of pairwise-similar crawl docs) exceeds any
      // fixed round budget at scale. grp values are always labels of
      // pair participants, so the self-lookup matches (left join +
      // coalesce is belt-and-braces); min keeps the label monotone
      // non-increasing, preserving the min-label invariant.
      // jumped stays a shallow plan over the checkpoint leaf; next
      // round's propagation re-checkpoints, so lineage depth is
      // bounded at one join regardless of round count
      // checkpointed (r16): the convergence isEmpty below and the
      // NEXT round's propagation both consume the jump join — un-
      // checkpointed it evaluated twice per round (once under each
      // action); now the join runs once and both reads scan the leaf
      val jumped = propagated
        .join(propagated.select(col("doc_id").as("grp"),
          col("grp").as("ggrp")), Seq("grp"), "left")
        .select(col("doc_id"),
          least(col("grp"), coalesce(col("ggrp"), col("grp")))
            .as("grp"),
          col("old"))
        .localCheckpoint()
      converged = jumped.filter(col("grp") =!= col("old")).isEmpty
      labels = jumped.select(col("doc_id"), col("grp"))
      iter += 1
    }
    // Truncated propagation is silent data corruption at scale — keep
    // it loud even though the doubling makes it unreachable below
    // ~2^maxIter diameter.
    if (!converged) log.warn(
      s"minLabelComponents: label propagation did NOT converge after " +
        s"$maxIter iterations; components with larger diameter carry " +
        "truncated (non-minimal) group labels. Raise maxIter.")
    // return a LEAF: consumers embed the label relation in their own
    // registered plans, which must not inherit the final round's jump
    // join (their exchange pins count it otherwise)
    labels.localCheckpoint()
  }

  /** Session-scoped memo of the candidate pair set. `neardup_minhash`,
    * `ngram_jaccard` and `dedup_groups` all consume the SAME
    * [[nearDupPairs]] subplan — the expensive part of each (full
    * tokenize/shingle/signature pipeline over the corpus, ~2.2s fixed
    * at sf0.1) — and within one session the result is deterministic
    * for a given (dir, params), so each consumer after the first
    * reuses the localCheckpoint'd pair set (pair-count-sized, tiny
    * relative to the corpus) instead of recomputing the pipeline.
    * Assumes input dirs are immutable within a session (true for this
    * engine's lake layout: loads write new partitions, never rewrite a
    * read path mid-session); [[clearPairsMemo]] resets after external
    * changes — the scale-stress harness clears between timed runs so
    * SCALE_NOTES measures the full pipeline, not a memo hit. Entries
    * of STOPPED sessions (whose checkpointed RDDs died with the
    * context) are evicted on every access: weak keying cannot do this
    * — the memoized DataFrames strongly reference their own session
    * (`df.sparkSession`), so a WeakHashMap's key would never become
    * collectable and a long-lived JVM cycling sessions would pin one
    * context's worth of state per session forever. */
  private val pairsMemo = collection.mutable.Map.empty[
    SparkSession, collection.mutable.Map[(String, Int, Int), DataFrame]]

  def clearPairsMemo(): Unit = {
    pairsMemo.synchronized { pairsMemo.clear() }
    // the derived-checkpoint memo shares the same immutable-input
    // assumption and the same reset points (testdata refresh, timed
    // scale-stress runs) — one hook clears both
    graft.util.CkptMemo.clear()
  }

  def nearDupPairsCached(spark: SparkSession, dir: String,
      nBands: Int = 8, minBands: Int = 4): DataFrame =
    pairsMemo.synchronized {
      pairsMemo.filterInPlace((s, _) => !s.sparkContext.isStopped)
      pairsMemo
        .getOrElseUpdate(spark,
          collection.mutable.Map.empty[(String, Int, Int), DataFrame])
        .getOrElseUpdate((dir, nBands, minBands),
          nearDupPairs(spark, dir, nBands, minBands).localCheckpoint())
    }

  /** Candidate near-duplicate pairs: distinct (a < b) doc pairs sharing
    * a band bucket, kept when they agree on ≥ minBands of the bands.
    *
    * Pair generation is BUCKET-LOCAL: group the signatures by
    * (band, sig), collect the bucket's doc list, and explode its (a<b)
    * pairs with a nested array transform — the signature subplan runs
    * ONCE (a self-join formulation re-computes it for each side) and
    * pair fan-out is bounded by bucket size². Degenerate stop-shingle
    * buckets are the skew hazard; cap them with maxBucket (0 = no cap;
    * the oracle-paired query uses no cap so both engines see identical
    * pairs). */
  def nearDupPairs(spark: SparkSession, dir: String, nBands: Int = 8,
      minBands: Int = 4, maxBucket: Int = 0): DataFrame =
    nearDupPairsFor(fanOut(t(spark, dir, "documents")), nBands, minBands,
      maxBucket)

  /** X3e-scale — persisted MinHash signature index, the SERVING split
    * of [[nearDupPairs]] (same build/probe pattern as
    * [[Similarity.ivfBuildIndex]]): the corpus's (doc_id, band, sig)
    * band signatures — the expensive tokenize/shingle/minhash pass —
    * are computed ONCE and written partitioned by band. At 100 TB the
    * index is ~nBands compact rows per doc (a few % of corpus bytes),
    * and incremental dedup of an incoming batch never re-reads, let
    * alone re-shingles, the corpus text again. `_SUCCESS`-gated per
    * (sf dir, source listing fingerprint, nBands) like the other
    * derived stores, so a testdata refresh self-invalidates. */
  def neardupBuildIndex(spark: SparkSession, dir: String,
      nBands: Int = 8): String = {
    import graft.util.Tables
    val out = s"target/graft_neardup/sig_${Tables.pathTag(dir)}_" +
      Tables.listingTag(spark, s"$dir/documents.parquet") + s"_b$nBands"
    if (!Tables.successExists(spark, out)) {
      bandSignatures(spark, dir, nBands)
        .write.mode("overwrite").partitionBy("band").parquet(out)
    }
    out
  }

  /** X3e — INCREMENTAL near-dup probe: dedup a small incoming batch
    * against the existing corpus via the persisted signature index,
    * without re-pairing (or even re-scanning) the corpus. This is the
    * shape a 100 TB training-data pipeline actually runs day to day —
    * [[nearDupPairs]] is the one-time backfill; every subsequent crawl
    * increment probes.
    *
    * Plan shape: only the BATCH is tokenized/shingled/minhashed
    * (batch-sized work); its signatures are BROADCAST and hash-joined
    * against the index scan on (band, sig), so the corpus side moves
    * NO shuffle data — one streaming pass over the signature index,
    * which is itself a few % of corpus bytes. The per-pair band
    * agreement count then shuffles matched candidates only. Output
    * pairs are (new_doc from the batch) × (corpus_doc), band-agreement
    * semantics identical to [[nearDupPairs]] restricted to cross
    * pairs — pinned by spec and by the cross-engine oracle.
    *
    * The registered query simulates the increment deterministically:
    * docs with `doc_id % batchMod == 0` are "the new batch", the rest
    * are "the corpus" (excluded from the index read by a pushed-down
    * scan filter — in production the index would simply not contain
    * the batch yet, and accepted batch signatures would be appended as
    * a new index partition file). */
  def neardupProbe(spark: SparkSession, dir: String, nBands: Int = 8,
      minBands: Int = 4, batchMod: Int = 7): DataFrame = {
    val idx = neardupBuildIndex(spark, dir, nBands)
    val corpusSigs = spark.read.parquet(idx)
      .filter(pmod(col("doc_id"), lit(batchMod)) =!= 0)
      .select(col("doc_id").as("corpus_doc"), col("band"), col("sig"))
    val batch = t(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(batchMod)) === 0)
    val batchSigs = bandSignaturesFor(fanOut(batch), nBands)
      .select(col("doc_id").as("new_doc"), col("band"), col("sig"))
    broadcast(batchSigs)
      .join(corpusSigs, Seq("band", "sig"))
      .groupBy(col("new_doc"), col("corpus_doc"))
      .agg(count(lit(1)).as("n_bands"))
      .filter(col("n_bands") >= minBands)
      .orderBy("new_doc", "corpus_doc")
  }

  /** X58 — repeated-span scrub: EXACT substring-level dedup (the
    * "dedup repeated 50-token spans" pass of published training-data
    * pipelines, at window size `w`): any `w`-token window occurring
    * more than once ACROSS THE CORPUS is dropped from every document
    * carrying it; the rest of each document survives. Doc-level dedup
    * (X1–X3) can't see this redundancy — boilerplate headers, license
    * blocks and quoted passages repeat inside otherwise-unique docs.
    *
    * Plan shape: window fan-out is one row per token (same cost class
    * as the shingle pipelines); repeated-window detection is ONE
    * groupBy over a 128-BIT WINDOW HASH (two independent xxhash64
    * longs) with map-side partial counts; hit positions join back on
    * the same hash pair and collapse to a per-doc sorted start list
    * (repeated-hit-sized, small); the final scrub is per-row HOF
    * work — each token's keep/drop decision scans only its own doc's
    * hit list. Two keyed shuffles total at any corpus size, and both
    * carry ~16 bytes of key per row instead of the w-token window
    * STRING (~w× the corpus text bytes on the wire at w=8 — the
    * shuffle volume that dominates at 100 TB). The window string never
    * leaves the map side. Exactness is up to a 128-bit collision —
    * the same acceptance the MinHash family already makes for md5 —
    * and the DuckDB oracle still compares TRUE window strings, so a
    * hash regression hash-fails the gate rather than hiding.
    *
    * Output is (doc_id, n_tokens, n_kept, md5 of the scrubbed text) —
    * the full cleaned corpus reduced to an oracle-comparable row per
    * doc; a production pipeline would keep the rebuilt text column
    * instead of hashing it. */
  def repeatedSpanScrub(spark: SparkSession, dir: String,
      w: Int = 8): DataFrame =
    repeatedSpanScrubFor(fanOut(t(spark, dir, "documents")), w)

  /** [[repeatedSpanScrub]] over an arbitrary (doc_id, text) corpus. */
  def repeatedSpanScrubFor(docs: DataFrame, w: Int = 8): DataFrame = {
    val tok = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
    // sequence(a, b) DESCENDS when a > b — guard short docs to an
    // empty window set instead of a backwards one
    val wins = tok
      .select(col("doc_id"), explode(
          when(size(col("w")) >= w,
            sequence(lit(1), size(col("w")) - (w - 1)))
            .otherwise(array())).as("i"),
        col("w"))
      .select(col("doc_id"), col("i"),
        concat_ws(" ", slice(col("w"), col("i"), lit(w))).as("win"))
      // the two seeds make the halves independent; the string column
      // is dropped here, BEFORE anything shuffles
      .select(col("doc_id"), col("i"),
        xxhash64(col("win")).as("h1"),
        xxhash64(lit("graft:span:2"), col("win")).as("h2"))
    val rep = wins.groupBy(col("h1"), col("h2"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("h1", "h2")
    val hitStarts = wins.join(rep, Seq("h1", "h2"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("i"))).as("ss"))
    tok.join(hitStarts, Seq("doc_id"), "left")
      .withColumn("ss",
        coalesce(col("ss"), array().cast("array<int>")))
      // same descending-sequence guard as the window set above: a
      // ZERO-token doc would make sequence(1, 0) descend to [1, 0] and
      // zip_with null-pad two phantom tokens into `kept`
      .withColumn("idx",
        when(size(col("w")) > 0, sequence(lit(1), size(col("w"))))
          .otherwise(array().cast("array<int>")))
      .withColumn("kept", filter(
        zip_with(col("w"), col("idx"),
          (t, i) => struct(t.as("t"), i.as("i"))),
        p => !exists(col("ss"), s =>
          p.getField("i") >= s && p.getField("i") < s + w)))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        size(col("kept")).cast("long").as("n_kept"),
        md5(concat_ws(" ",
          transform(col("kept"), p => p.getField("t")))).as("clean_md5"))
      .orderBy("doc_id")
  }

  /** Pair-generation variant over an arbitrary (doc_id, text) corpus. */
  def nearDupPairsFor(docs: DataFrame, nBands: Int = 8,
      minBands: Int = 4, maxBucket: Int = 0): DataFrame =
    pairsFromSigs(bandSignaturesFor(docs, nBands), minBands, maxBucket)

  /** [[nearDupPairsFor]] over an already-tokenized (doc_id, w) corpus
    * (corpus-pipeline form). */
  private[graft] def nearDupPairsTok(docs: DataFrame, nBands: Int = 8,
      minBands: Int = 4, maxBucket: Int = 0): DataFrame =
    pairsFromSigs(bandSignaturesTok(docs, nBands), minBands, maxBucket)

  /** Bucket-local candidate-pair generation over a (doc_id, band, sig)
    * signature relation — the shared tail of both pair generators. */
  private[graft] def pairsFromSigs(sigs: DataFrame, minBands: Int,
      maxBucket: Int): DataFrame = {
    val buckets = sigs
      .groupBy(col("band"), col("sig"))
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) > 1)
    val capped =
      if (maxBucket > 0) buckets.filter(size(col("docs")) <= maxBucket)
      else buckets
    capped
      .select(explode(flatten(transform(col("docs"), (a, i) =>
        transform(slice(col("docs"), i + 2, size(col("docs"))), b =>
          struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
      .filter(col("n_bands") >= minBands)
    // NOTE: no orderBy here — this is a reusable pair generator
    // (ngramJaccard feeds it into joins); the registered query adds the
    // deterministic ordering at the output boundary.
  }
}
