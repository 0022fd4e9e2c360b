package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.util.CkptMemo
import graft.util.Tables.{t, fanOut, davg}

/** X69 — the COMPOSED end-to-end training-corpus pipeline (VERDICT r10
  * item 1): every LLM-data cleaning stage this engine implements,
  * chained over ONE lineage the way a production corpus build actually
  * runs them — each stage operating on the SURVIVORS (and, after the
  * span scrub, the SCRUBBED token state) of the previous stage, not on
  * the raw corpus its standalone registered twin sees. Cross-operator
  * composition is where every scan explosion found so far lived
  * (jaccard's 34-scan plan, the bpe lineage blowups), which is why the
  * chain itself is a registered, oracle-checked, plan-budgeted query.
  *
  * Stages (fixed parameters; each is the already-verified operator —
  * citations point at the standalone form):
  *
  *  0. `00_ingest` — one tokenization pass ([[TextAnalysis.tokens]]);
  *     the ONLY `documents` scan in the whole pipeline.
  *  1. `01_quality` — gate: ≥ 20 tokens, distinct-token ratio ≥ 0.35
  *     (the [[TextAnalysis.cleanCorpus]] gate).
  *  2. `02_exact` — canonical exact dedup: md5 of the token stream,
  *     keep min doc_id (X1 in token-canonical form).
  *  3. `03_neardup` — MinHash LSH pairs among survivors
  *     ([[Dedup.nearDupPairsTok]], 8 bands / ≥ 4 agreeing) → connected
  *     components ([[Dedup.minLabelComponents]]) → keep each group's
  *     min doc_id (X3 + X22).
  *  4. `04_spanscrub` — corpus-wide repeated 8-token spans dropped
  *     from every surviving doc ([[Dedup.repeatedSpanScrubFor]]'s
  *     rule); the TOKEN STATE downstream is the scrubbed one (X58).
  *  5. `05_contain` — docs ≥ 0.9-contained in another survivor are
  *     stripped ([[Dedup.containmentDrops]] — excerpts/quotes, X67).
  *  6. `06_decon_ngram` — 5-gram eval decontamination at evalMod 97:
  *     eval stand-ins leave the corpus, any overlap drops the train
  *     doc ([[QualitySignals.decontaminate]]'s relation, X29).
  *  7. `07_semdedup` — SemDeDup drop rule among survivor vectors,
  *     full-corpus codebook, MULTI-PROBE pair generation (both sides
  *     listed under their top-2 cells — X61b's measured straddle
  *     recall lift; [[Similarity.semDedupDrops]] at nProbe 2). Docs
  *     without an embedding row pass through.
  *  8. `08_decon_sem` — semantic decontamination: the deterministic
  *     md5 eval slice leaves the corpus, survivors whose best
  *     top-2-cell eval cosine ≥ 0.6 drop
  *     ([[Similarity.semanticDeconDrops]], X66).
  *  9. `09_rarity` — word-rarity filter over the SURVIVOR frequency
  *     model: mean inverse unigram probability > 40 drops (junk/OOV
  *     tail; [[QualitySignals.wordRarity]]'s statistic, X64).
  * 10. `10_quality_score` — hashed-n-gram linear classifier margin
  *     < −0.12 drops ([[QualitySignals.qualityScoreTok]], X68).
  * 11. `11_chunk` — 64-token / 8-overlap chunking of the scrubbed
  *     survivors ([[Reshape.docChunk]]'s rule, X56).
  * 12. `12_shard` — chunks packed into 512-token packs in 8
  *     content-hash shards, physically EXPORTED (partitioned parquet)
  *     and the manifest read back from the written files
  *     ([[Reshape.seqPacking]]/[[Reshape.shardExport]], X35/X60).
  *
  * Output: one accounting row per stage (surviving doc/chunk count +
  * token mass — `shard` = −1) plus one manifest row per written shard,
  * so the DuckDB oracle pins every stage boundary AND the physical
  * export roundtrip in a single hash.
  *
  * Plan/scale shape: `documents` and `embeddings` are each scanned
  * ONCE (stage-0 tokenization / the routing pass); every downstream
  * stage reads session-memoized checkpoints ([[CkptMemo]]) — the
  * corpus-sized token states (raw, scrubbed) at DISK_ONLY, the
  * per-stage DROP LISTS as doc-id-sized heap checkpoints that keep the
  * final plan shallow. Nothing all-pairs survives composition: near-dup
  * is banded LSH, containment is the lossless rarity prefix,
  * semantic dedup is salted within-cell blocks, decon is a broadcast
  * eval side — the same 100 TB shapes as the standalone operators,
  * now audited THROUGH the composition (PlanAuditSpec pins this
  * query's exchange count and scan budget like any other). Driver
  * state: the 16-cell codebook, per-cell salt counts, and one corpus
  * word total — all constant-bounded. */
object CorpusPipeline {

  /** Stage thresholds (fixed — they are part of the registered query's
    * identity and baked into the paired oracle SQL). */
  val MinTokens = 20
  val MinUniqRatio = 0.35
  val SpanW = 8
  val MinContain = 0.9
  val DeconN = 5
  val DeconEvalMod = 97
  val SemTau = 0.4
  val MaxCells = 16
  /** Stage-7 multi-probe listing depth (X61b — both pair sides under
    * their top-2 cells; straddle recall 0 → ~0.9 on planted twins). */
  val SemProbe = 2
  val SdTau = 0.6
  val SdEvalMod = 50
  val RarityMax = 40.0
  val QsMinMargin = -0.12
  val ChunkSize = 64
  val ChunkOverlap = 8
  val NShards = 8
  val PackBudget = 512L

  /** Per-invocation scratch discriminator (ADVICE r11): the shard
    * export is written at DataFrame-construction time and read back
    * LAZILY by the returned manifest branch — on a shared path, a
    * second invocation's delete-and-rewrite would race a
    * still-unconsumed earlier result (and concurrent invocations each
    * other). A monotone per-JVM counter keys each invocation's subdir
    * instead; the rewrite-in-place delete is gone. Scratch growth is
    * bounded by invocations-per-JVM of a heavy pipeline query (the
    * bench's handful), each export doc-id-sized. */
  private val invocation = new java.util.concurrent.atomic.AtomicLong

  /** The shared CHUNK → PACK → PHYSICAL SHARD EXPORT tail over a
    * (doc_id, w) token state — one definition for the rebuild (X69),
    * the incremental batch (X70) and the X108 web pipeline, so the
    * pack rule and the export roundtrip can never drift between the
    * composed queries. Chunks by [[ChunkSize]]/[[ChunkOverlap]],
    * packs to [[PackBudget]] tokens within [[NShards]] content-hash
    * shards, WRITES the partitioned parquet under
    * `scratchRoot/run_<n>` (the per-invocation counter — see
    * [[invocation]]) and reads the manifest back from the written
    * files. Returns the chunk accounting row (`chunkLabel`) unioned
    * with one manifest row per written shard (`shardLabel`). */
  private[graft] def chunkShardExport(spark: SparkSession,
      s: DataFrame, scratchRoot: String,
      chunkLabel: String, shardLabel: String): DataFrame = {
    val stride = ChunkSize - ChunkOverlap
    // LAZY chunk-relation checkpoint (r17): `ch` has two consumers —
    // the pack/export write (runs at construction) and the chunk
    // accounting row of the RETURNED query — and without a checkpoint
    // the accounting branch re-ran the whole survivor chain + chunk
    // explode a second time at materialization. Chunk-count-sized
    // (doc_id, chunk_id, n_tok — no tokens); the construction-time
    // write is its first action and materializes it.
    val ch = s
      .withColumn("n_chunks", greatest(lit(1L),
        ceil((size(col("w")) - lit(ChunkOverlap)).cast("double") /
          lit(stride.toDouble)).cast("long")))
      .withColumn("chunk_id",
        explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("ct",
        slice(col("w"), (col("chunk_id") * stride + 1).cast("int"),
          lit(ChunkSize)))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ct")).cast("long").as("n_tok"))
      .localCheckpoint(false)
    val key = concat(col("doc_id").cast("string"), lit(":"),
      col("chunk_id").cast("string"))
    val packed = ch
      .withColumn("h", md5(concat(lit("pack:"), key)))
      .withColumn("shard",
        graft.util.Tables.md5Bucket("shard:", key, NShards).cast("int"))
      .withColumn("cum_tok", sum(col("n_tok")).over(
        Window.partitionBy(col("shard"))
          .orderBy(col("h"), col("doc_id"), col("chunk_id"))))
      .withColumn("pack_id",
        floor((col("cum_tok") - col("n_tok")) / lit(PackBudget))
          .cast("long"))
      .select(col("doc_id"), col("chunk_id"), col("shard"),
        col("pack_id"), col("n_tok"), col("cum_tok"))
    // overwrite: the counter restarts per JVM, so run_N may exist from
    // a PREVIOUS process — dead, safe to replace; live same-JVM
    // invocations never share a counter value
    val out = graft.util.Scratch
      .under(scratchRoot + "/run_" + invocation.incrementAndGet())
      .toString
    packed.write.mode("overwrite").partitionBy("shard").parquet(out)
    // explicit schema on the read-back: a fully-filtered corpus writes
    // an EMPTY dataset (just _SUCCESS, no footers) and schema
    // inference would throw where "0 shards" is the correct answer
    val manifest = spark.read.schema(packed.schema).parquet(out)
      .groupBy(col("shard").cast("int").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("pack_id")).as("n_packs"),
        sum(col("n_tok")).as("n_tokens"))
      .select(lit(shardLabel).as("stage"), col("shard"), col("n_docs"),
        col("n_packs"), col("n_tokens"))
    val chAcct = ch
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tok")), lit(0L)).as("n_tokens"))
      .select(lit(chunkLabel).as("stage"), lit(-1).as("shard"),
        col("n_docs"), lit(0L).as("n_packs"), col("n_tokens"))
    chAcct.unionByName(manifest)
  }

  /** `semTau`/`semCells` parameterize the two embedding-space stages
    * for the scale harness (threshold 0.8 / cells ∝ corpus — the
    * planted-twin regime; the registered defaults sit partly in the
    * random cosine band, which is inherently quadratic on an
    * isotropic corpus and would measure geometry, not the operator).
    * The registered query always runs the defaults; every memo key
    * downstream of stage 7 carries both knobs so differently-
    * parameterized invocations cannot share survivor checkpoints. */
  def corpusPipeline(spark: SparkSession, dir: String,
      semTau: Double = SemTau, semCells: Int = MaxCells,
      rarityMax: Double = RarityMax): DataFrame = {
    def ntok = sum(size(col("w")).cast("long"))
    def acct(stage: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(ntok, lit(0L)).as("n_tokens"))
        .select(lit(stage).as("stage"), lit(-1).as("shard"),
          col("n_docs"), lit(0L).as("n_packs"), col("n_tokens"))

    // ---- stage 0: the one corpus tokenization pass ----
    val tok = CkptMemo.of(spark, "cp_tok", dir) {
      fanOut(t(spark, dir, "documents"))
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
        .localCheckpoint(true, StorageLevel.DISK_ONLY)
    }

    // ---- stage 1: quality gate ----
    val s1 = tok.filter(size(col("w")) >= MinTokens &&
      (size(array_distinct(col("w"))).cast("double") /
        nullif(size(col("w")), lit(0))) >= MinUniqRatio)

    // ---- stage 2: canonical exact dedup (keep min doc_id) ----
    val s2 = s1
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(concat_ws(" ", col("w"))))
          .orderBy(col("doc_id"))))
      .filter(col("rn") === 1).select(col("doc_id"), col("w"))

    // ---- stage 3: near-dup groups -> keep each component's min ----
    val s3 = CkptMemo.of(spark, "cp_s3", dir) {
      val pairs = Dedup.nearDupPairsTok(s2)
        .select(col("doc_a"), col("doc_b")).localCheckpoint(false)
      val drops = Dedup.minLabelComponents(pairs)
        .filter(col("grp") =!= col("doc_id")).select(col("doc_id"))
      s2.join(drops, Seq("doc_id"), "left_anti")
        .localCheckpoint(false, StorageLevel.DISK_ONLY)
    }

    // ---- stage 4: repeated-span scrub; token state becomes `kept` ----
    val s4 = CkptMemo.of(spark, "cp_s4", dir) {
      val wins = s3
        .select(col("doc_id"), explode(
            when(size(col("w")) >= SpanW,
              sequence(lit(1), size(col("w")) - (SpanW - 1)))
              .otherwise(array())).as("i"), col("w"))
        .select(col("doc_id"), col("i"),
          concat_ws(" ", slice(col("w"), col("i"), lit(SpanW))).as("win"))
        // 128-bit window key, string dropped before any shuffle — the
        // registered span_scrub plan (its oracle checks TRUE strings)
        .select(col("doc_id"), col("i"),
          xxhash64(col("win")).as("h1"),
          xxhash64(lit("graft:span:2"), col("win")).as("h2"))
      val rep = wins.groupBy(col("h1"), col("h2"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).select("h1", "h2")
      val hitStarts = wins.join(rep, Seq("h1", "h2"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("i"))).as("ss"))
      s3.join(hitStarts, Seq("doc_id"), "left")
        .withColumn("ss",
          coalesce(col("ss"), array().cast("array<int>")))
        .withColumn("idx",
          when(size(col("w")) > 0, sequence(lit(1), size(col("w"))))
            .otherwise(array().cast("array<int>")))
        .withColumn("kept", filter(
          zip_with(col("w"), col("idx"),
            (tk, i) => struct(tk.as("t"), i.as("i"))),
          p => !exists(col("ss"), s =>
            p.getField("i") >= s && p.getField("i") < s + SpanW)))
        .select(col("doc_id"),
          transform(col("kept"), p => p.getField("t")).as("w"))
        .localCheckpoint(false, StorageLevel.DISK_ONLY)
    }

    // ---- stage 5: containment strip over scrubbed shingles ----
    val sh4 = CkptMemo.of(spark, "cp_sh4", dir) {
      s4.select(col("doc_id"),
          explode(array_distinct(Dedup.shingles3(col("w")))).as("g"))
        .localCheckpoint(false, StorageLevel.DISK_ONLY)
    }
    val drop5 = CkptMemo.of(spark, "cp_drop5", dir) {
      Dedup.containmentDrops(sh4, MinContain).localCheckpoint(false)
    }
    val s5 = s4.join(drop5, Seq("doc_id"), "left_anti")

    // ---- stage 6: 5-gram eval decontamination ----
    val drop6 = CkptMemo.of(spark, "cp_drop6", dir) {
      val sh5 = s5.filter(size(col("w")) >= DeconN)
        .select(col("doc_id"), explode(array_distinct(
          transform(sequence(lit(1), size(col("w")) - (DeconN - 1)), i =>
            concat_ws(" ",
              (0 until DeconN).map(o => element_at(col("w"), i + o)): _*))))
          .as("g"))
      val ev = sh5.filter(col("doc_id") % DeconEvalMod === 0)
        .select("g").distinct()
      sh5.filter(col("doc_id") % DeconEvalMod =!= 0)
        .join(ev, Seq("g"), "left_semi")
        .select(col("doc_id")).distinct()
        .localCheckpoint(false)
    }
    val s6 = s5.filter(col("doc_id") % DeconEvalMod =!= 0)
      .join(drop6, Seq("doc_id"), "left_anti")

    // ---- stage 7: SemDeDup among survivor vectors ----
    val drop7 = CkptMemo.of(spark, "cp_drop7", dir, semTau, semCells) {
      Similarity.semDedupDrops(spark, dir,
          s6.select(col("doc_id").as("vec_id")), semTau, semCells,
          nProbe = SemProbe)
        .select(col("vec_id").as("doc_id")).localCheckpoint(false)
    }
    val s7 = s6.join(drop7, Seq("doc_id"), "left_anti")

    // ---- stage 8: semantic decontamination ----
    val drop8 = CkptMemo.of(spark, "cp_drop8", dir, semTau, semCells) {
      Similarity.semanticDeconDrops(spark, dir,
          s7.select(col("doc_id").as("vec_id")), SdTau, semCells,
          SdEvalMod)
        .select(col("vec_id").as("doc_id")).localCheckpoint(false)
    }
    val s8 = s7.join(drop8, Seq("doc_id"), "left_anti")

    // ---- stage 9: word-rarity filter over the survivor model ----
    val drop9 = CkptMemo.of(spark, "cp_drop9", dir, semTau, semCells,
        rarityMax) {
      val words = s8.select(col("doc_id"), explode(col("w")).as("word"))
      val freq = words.groupBy(col("word")).agg(count(lit(1)).as("f"))
        .localCheckpoint()
      val totRow = freq.agg(sum(col("f"))).head()
      val total: Long = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
      val d = words.join(freq, Seq("word"))
        .groupBy(col("doc_id"))
        .agg(davg(lit(total).cast("double") / col("f")).as("mip"))
        .filter(col("mip") > rarityMax).select(col("doc_id"))
        .localCheckpoint()
      // freq only feeds the (now materialized) drop list — free it
      org.apache.spark.sql.graftbridge.PlanBridge
        .unpersistLocalCheckpoint(freq)
      d
    }
    val s9 = s8.join(drop9, Seq("doc_id"), "left_anti")

    // ---- stage 10: hashed-n-gram quality classifier ----
    val drop10 = CkptMemo.of(spark, "cp_drop10", dir, semTau,
        semCells, rarityMax) {
      QualitySignals.qualityScoreTok(s9, threshold = QsMinMargin)
        .filter(!col("keep")).select(col("doc_id"))
        .localCheckpoint(false)
    }
    // ---- single-pass accounting for the drop-list stages (r17) ----
    // The per-stage acct branches each replayed the anti-join chain
    // from s4 (acct(s5) = 1 join, acct(s6) = 2, ... acct(s10) = 6 —
    // 21 broadcast anti-joins + 6 aggregates + 6 s4 scans in ONE
    // query), and with AQE every exchange materialized as its own
    // job: 157 jobs, most of the query's 12 s. Every drop list is
    // DISTINCT on doc_id by construction (containmentDrops /
    // decon .distinct(), semDedup/semanticDecon drops .distinct(),
    // rarity/quality groupBy(doc_id)), so a LEFT join marks
    // membership without row multiplication and stage K's survivor
    // set is exactly the conjunction of "not in any earlier drop
    // list" — the same sets the anti-join chain computes, now derived
    // in ONE pass over s4 with 6 broadcast flag joins + ONE aggregate
    // of conditional sums. Oracle-verified identical (the stage rows
    // hash-match at sf0.01 and sf0.1).
    val survived = cumulativeSurvival(s4,
      Seq("d5" -> drop5, "d6" -> drop6, "d7" -> drop7,
        "d8" -> drop8, "d9" -> drop9, "d10" -> drop10),
      // stage 6 additionally removes the eval stand-in slice
      Map("d6" -> (col("doc_id") % DeconEvalMod =!= 0)))
    val acctDrops = survivalAcct(survived,
      Seq("05_contain" -> "d5", "06_decon_ngram" -> "d6",
        "07_semdedup" -> "d7", "08_decon_sem" -> "d8",
        "09_rarity" -> "d9", "10_quality_score" -> "d10"))

    // ---- stages 11-12: the shared chunk → pack → shard-export tail ----
    val tail = chunkShardExport(spark,
      survived.filter(col("alive_d10")).select(col("doc_id"), col("w")),
      "graft_pipeline/" + graft.util.Tables.pathTag(dir),
      "11_chunk", "12_shard")

    // stages 0/1 share one tok scan (conditional sums — same values
    // as the separate filter+agg branches)
    val q1 = size(col("w")) >= MinTokens &&
      (size(array_distinct(col("w"))).cast("double") /
        nullif(size(col("w")), lit(0))) >= MinUniqRatio
    val acct01 = stagePairAcct(tok, "00_ingest", "01_quality", q1)

    (Seq(
      acct01,
      acct("02_exact", s2), acct("03_neardup", s3),
      acct("04_spanscrub", s4), acctDrops, tail)
      .reduce(_ unionByName _))
      .orderBy("stage", "shard")
  }

  /** One pass over `base` (doc_id, w) marking, per drop list, whether
    * each doc is STILL ALIVE after that stage: `alive_<k>` =
    * alive_<k-1> ∧ extra-filter(k) ∧ doc ∉ drops(k). Drop lists must
    * be distinct on doc_id (they are — see call sites); LEFT joins
    * then mark membership without multiplying rows, which is exactly
    * the anti-join chain's semantics. */
  private def cumulativeSurvival(base: DataFrame,
      drops: Seq[(String, DataFrame)],
      extraFilter: Map[String, org.apache.spark.sql.Column]):
      DataFrame = {
    val joined = drops.foldLeft(base) { case (df, (name, d)) =>
      df.join(d.withColumn(s"in_$name", lit(true)),
        Seq("doc_id"), "left")
    }
    drops.foldLeft((joined, lit(true))) {
      case ((df, prev), (name, _)) =>
        val alive = prev && extraFilter.getOrElse(name, lit(true)) &&
          col(s"in_$name").isNull
        (df.withColumn(s"alive_$name", alive), col(s"alive_$name"))
    }._1
  }

  /** The per-stage accounting rows of [[cumulativeSurvival]]'s flags,
    * from ONE aggregate of conditional sums — value-identical to
    * aggregating each anti-joined stage separately. */
  private def survivalAcct(survived: DataFrame,
      stages: Seq[(String, String)]): DataFrame = {
    val aggs = stages.flatMap { case (_, k) =>
      Seq(
        coalesce(sum(when(col(s"alive_$k"), 1L)), lit(0L))
          .as(s"c_$k"),
        coalesce(sum(when(col(s"alive_$k"),
          size(col("w")).cast("long"))), lit(0L)).as(s"t_$k"))
    }
    val rows = stages.map { case (stage, k) =>
      struct(lit(stage).as("stage"), lit(-1).as("shard"),
        col(s"c_$k").as("n_docs"), lit(0L).as("n_packs"),
        col(s"t_$k").as("n_tokens"))
    }
    survived.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage"), col("r.shard"), col("r.n_docs"),
        col("r.n_packs"), col("r.n_tokens"))
  }

  /** Accounting for a stage and its filtered successor from ONE scan
    * (stage pair 00/01 in both pipelines): count/token mass of `df`
    * and of `df.filter(pred)` as two conditional sums. */
  private def stagePairAcct(df: DataFrame, allStage: String,
      filtStage: String,
      pred: org.apache.spark.sql.Column): DataFrame =
    df.agg(
        count(lit(1)).as("c0"),
        coalesce(sum(size(col("w")).cast("long")), lit(0L)).as("t0"),
        coalesce(sum(when(pred, 1L)), lit(0L)).as("c1"),
        coalesce(sum(when(pred, size(col("w")).cast("long"))),
          lit(0L)).as("t1"))
      .select(explode(array(
        struct(lit(allStage).as("stage"), lit(-1).as("shard"),
          col("c0").as("n_docs"), lit(0L).as("n_packs"),
          col("t0").as("n_tokens")),
        struct(lit(filtStage).as("stage"), lit(-1).as("shard"),
          col("c1").as("n_docs"), lit(0L).as("n_packs"),
          col("t1").as("n_tokens")))).as("r"))
      .select(col("r.stage"), col("r.shard"), col("r.n_docs"),
        col("r.n_packs"), col("r.n_tokens"))

  /** X70 — the INCREMENTAL (daily-batch) form of [[corpusPipeline]]:
    * the shape a production corpus build actually runs after the
    * backfill — a small incoming batch (`doc_id % batchMod == 0`
    * stands in, the engine's probe convention) flows through every
    * cleaning stage AGAINST THE EXISTING CORPUS's serving artifacts,
    * never re-pairing (or re-cleaning) the corpus itself. This is the
    * composition of the round's serving splits:
    *
    *  - `01_quality` — the X81 calibrated admission gate: the batch
    *    judged against the `_SUCCESS`-persisted corpus-side statistics
    *    (per-lang length bounds, per-source margin cutoff, temperature
    *    coin — [[QualitySignals.qualityGateBuildStats]], the same
    *    store `quality_gate_probe` serves from), NOT the rebuild's
    *    fixed token-ratio rule;
    *  - `02_exact` — batch-internal keep-min + anti-join against the
    *    corpus's canonical token-stream hashes;
    *  - `03_neardup` — batch signatures probed against the persisted
    *    MinHash index ([[Dedup.neardupBuildIndex]]) + batch-internal
    *    banded pairs;
    *  - `04_contain` — batch docs ≥ 0.9-contained in a corpus doc via
    *    the persisted set-similarity index
    *    ([[Dedup.probeCandidatesFor]]'s lossless one-sided prefix +
    *    exact verification) or in another batch doc
    *    ([[Dedup.containmentDrops]] on the batch's own shingles);
    *  - `05_decon_ngram` — batch 5-grams vs the eval stand-in's
    *    shingle set (eval docs themselves leave the batch);
    *  - `06_semdedup` — multi-probe (top-2-listed, X61b) cosine
    *    against BOTH the corpus's listed vectors (any qualifying
    *    corpus neighbor drops the batch doc — the corpus is already
    *    deduped and wins) and lower-id batch neighbors;
    *  - `07_decon_sem` — [[Similarity.semanticDeconDrops]] restricted
    *    to the surviving batch;
    *  - `08_rarity` — batch words scored against the CORPUS frequency
    *    model (the production direction: the model is an artifact of
    *    the existing corpus; batch-only words — absent from the
    *    model — are skipped by the inner join on both engines);
    *  - `09_quality_score` / `10_chunk` / `11_shard` — the stateless
    *    stages, with the batch exported as its own shard delivery.
    *
    * DELIBERATELY ABSENT: the repeated-span scrub — its corpus-wide
    * window counts change with every arriving batch and it has no
    * serving split; a production system re-runs it in the periodic
    * full rebuild ([[corpusPipeline]]), which is exactly how this
    * engine pairs the two queries.
    *
    * Scale shape: batch-proportional work plus streaming index scans
    * (the probe contract); the corpus-side derivations (canonical
    * hashes, eval shingles, frequency model) all read the ONE
    * session-memoized corpus token checkpoint — in production each
    * is a persisted artifact maintained by the full rebuild. Driver
    * state: the codebook + per-cell salts + one corpus word total. */
  def corpusPipelineIncr(spark: SparkSession, dir: String,
      batchMod: Int = 7, rarityMax: Double = RarityMax): DataFrame = {
    def ntok = sum(size(col("w")).cast("long"))
    def acct(stage: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(ntok, lit(0L)).as("n_tokens"))
        .select(lit(stage).as("stage"), lit(-1).as("shard"),
          col("n_docs"), lit(0L).as("n_packs"), col("n_tokens"))

    // the one corpus token checkpoint (shared with corpusPipeline's
    // cp_tok memo key on purpose: one build serves both queries in a
    // session) + the batch slice of it
    val tok = CkptMemo.of(spark, "cp_tok", dir) {
      fanOut(t(spark, dir, "documents"))
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
        .localCheckpoint(true, StorageLevel.DISK_ONLY)
    }
    val btok = tok.filter(pmod(col("doc_id"), lit(batchMod)) === 0)
    val ctok = tok.filter(pmod(col("doc_id"), lit(batchMod)) =!= 0)

    // ---- stage 1: calibrated admission gate (X81 persisted stats) ----
    // The increment is gated by the CORPUS-CALIBRATED statistics the
    // quality family derives (VERDICT r12 item 2) — per-language
    // length bounds, per-source margin cutoff, temperature coin, all
    // `_SUCCESS`-persisted by [[QualitySignals.qualityGateBuildStats]]
    // and shared with the standalone `quality_gate_probe` — instead of
    // the rebuild's fixed token-ratio rule: the daily path exercises
    // the serving artifacts; the periodic rebuild re-derives them.
    // Checkpointed (batch-sized) so the scorer fan-out + stat
    // broadcasts run once, not once per downstream stage + accounting
    // branch. The memo key carries the corpus LISTING TAG (review
    // r13): the stats STORE re-keys on a corpus change, and an
    // untagged memo hit would skip the rebuild and serve admissions
    // gated by the superseded store — the qgate_base staleness class.
    // (The other cpi_* memos ride the documented session-immutability
    // assumption; only this one pairs with a tag-keyed artifact.)
    val b1 = CkptMemo.of(spark, "cpi_b1", dir, batchMod,
        graft.util.Tables.listingTag(spark,
          s"$dir/documents.parquet")) {
      val statsIdx =
        QualitySignals.qualityGateBuildStats(spark, dir, batchMod)
      val admitted = QualitySignals.qualityGateFor(
          t(spark, dir, "documents")
            .filter(pmod(col("doc_id"), lit(batchMod)) === 0), statsIdx)
        .filter(col("admit")).select(col("doc_id"))
      btok.join(admitted, Seq("doc_id"), "left_semi").localCheckpoint(false)
    }

    // ---- stage 2: exact dedup, batch-internal + vs corpus hashes ----
    val corpusHashes = CkptMemo.of(spark, "cpi_chash", dir, batchMod) {
      ctok.select(md5(concat_ws(" ", col("w"))).as("k")).distinct()
        .localCheckpoint(false)
    }
    // checkpointed (batch-sized): every downstream stage AND its
    // accounting branch would otherwise replay the dedup window
    val b2 = CkptMemo.of(spark, "cpi_b2", dir, batchMod) {
      b1.withColumn("k", md5(concat_ws(" ", col("w"))))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("k")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1)
        .join(corpusHashes, Seq("k"), "left_anti")
        .select(col("doc_id"), col("w"))
        .localCheckpoint(false)
    }

    // ---- stage 3: near-dup — signature-index probe + batch pairs ----
    val drop3 = CkptMemo.of(spark, "cpi_drop3", dir, batchMod) {
      val idxNd = Dedup.neardupBuildIndex(spark, dir)
      val bSigs = Dedup.bandSignaturesTok(b2)
      val corpusSigs = spark.read.parquet(idxNd)
        .filter(pmod(col("doc_id"), lit(batchMod)) =!= 0)
        .select(col("doc_id").as("corpus_doc"), col("band"), col("sig"))
      val crossHit = bSigs.join(corpusSigs, Seq("band", "sig"))
        .groupBy(col("doc_id"), col("corpus_doc"))
        .agg(count(lit(1)).as("n_bands"))
        .filter(col("n_bands") >= 4)
        .select(col("doc_id")).distinct()
      val withinB = Dedup.pairsFromSigs(bSigs, minBands = 4,
          maxBucket = 0)
        .select(col("doc_b").as("doc_id")).distinct()
      crossHit.union(withinB).distinct().localCheckpoint(false)
    }
    val b3 = b2.join(drop3, Seq("doc_id"), "left_anti")

    // ---- stage 4: containment — set-sim index probe + batch-local ----
    val drop4 = CkptMemo.of(spark, "cpi_drop4", dir, batchMod) {
      val idxSS = Dedup.setSimBuildIndex(spark, dir)
      val bsh = b3.select(col("doc_id"),
          explode(array_distinct(Dedup.shingles3(col("w")))).as("g"))
        .localCheckpoint()
      val cand = Dedup.probeCandidatesFor(spark, idxSS, bsh,
          pmod(col("doc_id"), lit(batchMod)) =!= 0, MinContain)
        .filter(lit(1) + col("n_a") - col("ra") >=
          ceil(lit(MinContain) * col("n_a")))
        .filter(col("n_b") >= ceil(lit(MinContain) * col("n_a")))
        .select(col("new_doc"), col("corpus_doc"), col("n_a"),
          col("n_b"))
      val crossContained = Dedup.probeVerifyFor(spark, idxSS, bsh, cand)
        .filter(col("inter").cast("double") / col("n_a") >= MinContain)
        .select(col("new_doc").as("doc_id")).distinct()
      val withinContained = Dedup.containmentDrops(bsh, MinContain)
      crossContained.union(withinContained).distinct().localCheckpoint(false)
    }
    val b4 = b3.join(drop4, Seq("doc_id"), "left_anti")

    // ---- stage 5: 5-gram decon vs the eval stand-in's shingles ----
    def grams5(df: DataFrame) = df.filter(size(col("w")) >= DeconN)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("w")) - (DeconN - 1)), i =>
          concat_ws(" ",
            (0 until DeconN).map(o => element_at(col("w"), i + o)): _*))))
        .as("g"))
    val evalSh = CkptMemo.of(spark, "cpi_evsh", dir) {
      grams5(tok.filter(col("doc_id") % DeconEvalMod === 0))
        .select("g").distinct().localCheckpoint(false)
    }
    val drop5 = CkptMemo.of(spark, "cpi_drop5", dir, batchMod) {
      grams5(b4.filter(col("doc_id") % DeconEvalMod =!= 0))
        .join(evalSh, Seq("g"), "left_semi")
        .select(col("doc_id")).distinct().localCheckpoint(false)
    }
    val b5 = b4.filter(col("doc_id") % DeconEvalMod =!= 0)
      .join(drop5, Seq("doc_id"), "left_anti")

    // ---- stage 6: semantic near-dup, multi-probe, cross + within ----
    val drop6 = CkptMemo.of(spark, "cpi_drop6", dir, batchMod) {
      Similarity.semDedupIncrDrops(spark, dir,
          b5.select(col("doc_id").as("vec_id")), batchMod, SemTau,
          MaxCells, SemProbe)
        .select(col("vec_id").as("doc_id")).localCheckpoint(false)
    }
    val b6 = b5.join(drop6, Seq("doc_id"), "left_anti")

    // ---- stage 7: semantic decontamination (batch restriction) ----
    val drop7 = CkptMemo.of(spark, "cpi_drop7", dir, batchMod) {
      Similarity.semanticDeconDrops(spark, dir,
          b6.select(col("doc_id").as("vec_id")), SdTau, MaxCells,
          SdEvalMod)
        .select(col("vec_id").as("doc_id")).localCheckpoint(false)
    }
    val b7 = b6.join(drop7, Seq("doc_id"), "left_anti")

    // ---- stage 8: rarity vs the CORPUS frequency model ----
    val drop8 = CkptMemo.of(spark, "cpi_drop8", dir, batchMod,
        rarityMax) {
      import graft.util.Tables.davg
      val freq = CkptMemo.of(spark, "cpi_cfreq", dir, batchMod) {
        ctok.select(explode(col("w")).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("f"))
          .localCheckpoint()
      }
      val totRow = freq.agg(sum(col("f"))).head()
      val total: Long = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
      val d = b7.select(col("doc_id"), explode(col("w")).as("word"))
        .join(freq, Seq("word"))
        .groupBy(col("doc_id"))
        .agg(davg(lit(total).cast("double") / col("f")).as("mip"))
        .filter(col("mip") > rarityMax).select(col("doc_id"))
        .localCheckpoint()
      d
    }
    val b8 = b7.join(drop8, Seq("doc_id"), "left_anti")

    // ---- stage 9: quality classifier (stateless) ----
    val drop9 = CkptMemo.of(spark, "cpi_drop9", dir, batchMod,
        rarityMax) {
      QualitySignals.qualityScoreTok(b8, threshold = QsMinMargin)
        .filter(!col("keep")).select(col("doc_id")).localCheckpoint(false)
    }
    // ---- single-pass accounting for the drop-list stages (r17) ----
    // same restructure (and same equivalence argument) as the rebuild:
    // every incr drop list is distinct on doc_id (the unions/decon
    // .distinct(), rarity/quality groupBy(doc_id)), so one pass over
    // the b2 checkpoint with 7 broadcast flag joins + one aggregate
    // replaces 28 anti-join replays across the acct branches
    val survived = cumulativeSurvival(b2,
      Seq("d3" -> drop3, "d4" -> drop4, "d5" -> drop5,
        "d6" -> drop6, "d7" -> drop7, "d8" -> drop8, "d9" -> drop9),
      Map("d5" -> (col("doc_id") % DeconEvalMod =!= 0)))
    val acctDrops = survivalAcct(survived,
      Seq("03_neardup" -> "d3", "04_contain" -> "d4",
        "05_decon_ngram" -> "d5", "06_semdedup" -> "d6",
        "07_decon_sem" -> "d7", "08_rarity" -> "d8",
        "09_quality_score" -> "d9"))

    // ---- stages 10–11: chunk + pack + export (batch delivery) ----
    val tail = chunkShardExport(spark,
      survived.filter(col("alive_d9")).select(col("doc_id"), col("w")),
      "graft_pipeline_incr/" + graft.util.Tables.pathTag(dir),
      "10_chunk", "11_shard")

    (Seq(
      acct("00_batch", btok), acct("01_quality", b1),
      acct("02_exact", b2), acctDrops, tail)
      .reduce(_ unionByName _))
      .orderBy("stage", "shard")
  }
}
