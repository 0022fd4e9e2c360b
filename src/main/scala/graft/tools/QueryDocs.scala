package graft.tools

/** Registry-driven reference docs: renders `docs/QUERIES.md` from
  * [[graft.SparkEntry.registry]] itself, so the user-facing query
  * catalog can never silently diverge from what the engine actually
  * registers. `QueryDocsSpec` fails the build when (a) a registered
  * query has no metadata row here (or vice versa), or (b) the checked
  * -in markdown differs from a fresh render — regenerate with
  * `sbt "runMain graft.tools.QueryDocs"`.
  *
  * Per query: SURVEY.md §2 operator id, one-line description, oracle
  * form (read from the registry — SQL-oracled vs rows-only), and the
  * implementing module. Scale notes for the heavy operators live in
  * SCALE_NOTES.md; plan budgets in PlanAuditSpec. */
object QueryDocs {

  final case class Meta(op: String, family: String, desc: String,
      impl: String)

  private def m(op: String, family: String, desc: String,
      impl: String) = Meta(op, family, desc, impl)

  /** Family display order. */
  val families: Seq[String] = Seq(
    "Ingest & table lifecycle",
    "TPC-H query shapes",
    "Aggregation, windows & scalars",
    "Joins, set ops & layout",
    "Deduplication",
    "Similarity & embeddings",
    "Multimodal",
    "Text & corpus analytics",
    "Training-data reshaping",
    "Data quality & governance",
    "Streaming",
    "Storage formats")

  private val I = "Ingest & table lifecycle"
  private val Q = "TPC-H query shapes"
  private val A = "Aggregation, windows & scalars"
  private val J = "Joins, set ops & layout"
  private val D = "Deduplication"
  private val S = "Similarity & embeddings"
  private val M = "Multimodal"
  private val T = "Text & corpus analytics"
  private val R = "Training-data reshaping"
  private val G = "Data quality & governance"
  private val St = "Streaming"
  private val F = "Storage formats"

  val meta: Map[String, Meta] = Map(
    "ingest_append" -> m("S1–S3,P1–P5,W1", I,
      "CSV/gzip inbound batches through projection, dt derivation and audit columns into an appended curated table",
      "pipeline/GenericLoader.scala"),
    "ingest_overwrite" -> m("W2", I,
      "Overwrite-strategy load (both generations' spellings) replacing the curated table per batch",
      "load/Strategies.scala"),
    "ingest_upsert" -> m("J1/J2/W5", I,
      "Partition-scoped upsert merge (anti-join ∪ source) with staged atomic partition swap; first load falls back to overwrite",
      "load/Strategies.scala"),
    "ingest_ts_normalize" -> m("P3", I,
      "Config-declared per-column event-time normalization (s/ms/µs/ns magnitudes to epoch-µs)",
      "transform/Derive.scala"),
    "ingest_multiline" -> m("S3", I,
      "Quoted multiline + escaped-delimiter CSV parsing with explicit schema",
      "pipeline/GenericLoader.scala"),
    "ingest_escaped_dt" -> m("E1/W3", I,
      "Adversarial partition values (:, %, =, whitespace) Hive-escaped consistently through write, merge and read-back",
      "lake/LakeLayout.scala"),
    "ingest_compact" -> m("E3", I,
      "Small-file compaction of hot partitions to target file size via the same staged swap as the merge",
      "load/Strategies.scala"),
    "ingest_backfill" -> m("E3", I,
      "Ledger-driven backfill over a date range, idempotent per re-run",
      "ops/Ingest.scala"),
    "ingest_stream" -> m("W1/X10", St,
      "Structured-streaming file-source ingest of inbound batches into the curated layout",
      "streaming/StreamingOps.scala"),
    "binary_ingest" -> m("S6", I,
      "binaryFile directory source: per-asset bytes + typed metadata ingested as opaque binary columns",
      "ops/Formats.scala"),
    "read_at_version" -> m("X55", I,
      "Snapshot time-travel: read the curated table exactly as of a committed version",
      "load/SnapshotLog.scala"),
    "version_changes" -> m("X55", I,
      "Version-to-version CDC: rows added/removed between two snapshot versions",
      "load/SnapshotLog.scala"),
    "cdc_rollup" -> m("X59", I,
      "CDC-driven incremental rollup maintenance from version diffs, no full recompute",
      "ops/Ingest.scala"),
    "snapshot_diff" -> m("X42", I,
      "Day-over-day snapshot diff (added/removed/changed) on the fixture table",
      "ops/Inspect.scala"),
    "incremental_rollup" -> m("X47", I,
      "Incremental aggregate maintenance: fold a delta batch into a persisted rollup",
      "ops/Incremental.scala"),
    "schema_evolution" -> m("X44", I,
      "Parquet schema evolution: mergeSchema read across generations with added/missing columns",
      "ops/Formats.scala"),

    "q1_pricing_summary" -> m("X32", Q,
      "TPC-H Q1 pricing summary: pushed date filter, partial+final decimal aggregation",
      "ops/Analytics.scala"),
    "q3_top_revenue" -> m("X32", Q,
      "TPC-H Q3 shipping-priority top revenue (segment dim join, top-k)",
      "ops/Analytics.scala"),
    "q4_priority_check" -> m("X32b", Q,
      "TPC-H Q4 order-priority check via semi-join on late lineitems",
      "ops/QueryShapes.scala"),
    "q5_revenue_by_nation" -> m("X32", Q,
      "TPC-H Q5 revenue by nation: broadcast constant dims, AQE-left data-scaled joins",
      "ops/Analytics.scala"),
    "q6_forecast" -> m("X32b", Q,
      "TPC-H Q6 forecast revenue change: pure scan-side filters, no join",
      "ops/QueryShapes.scala"),
    "q7_volume_shipping" -> m("X32b", Q,
      "TPC-H Q7 volume shipping between two nations (dual nation-dim joins)",
      "ops/Analytics.scala"),
    "q8_market_share" -> m("X32b", Q,
      "TPC-H Q8 market share: conditional revenue ratio over a 6-way join",
      "ops/QueryShapes.scala"),
    "q9_nation_brand" -> m("X32", Q,
      "TPC-H Q9 profit by nation × brand over part/supplier joins",
      "ops/Analytics.scala"),
    "q10_returned_items" -> m("X32", Q,
      "TPC-H Q10 revenue lost to returns: both-side-filtered join, top-20",
      "ops/Analytics.scala"),
    "q12_late_lines" -> m("X32b", Q,
      "TPC-H Q12 late lines by priority class, conditional counts in one pass",
      "ops/QueryShapes.scala"),
    "q13_order_dist" -> m("X32b", Q,
      "TPC-H Q13 customer order-count distribution via outer join",
      "ops/Analytics.scala"),
    "q14_promo_effect" -> m("X32b", Q,
      "TPC-H Q14 promo revenue share with a filtered part dim",
      "ops/QueryShapes.scala"),
    "q15_top_supplier" -> m("X32b", Q,
      "TPC-H Q15 top supplier by revenue (aggregate, max-join-back)",
      "ops/QueryShapes.scala"),
    "q17_small_qty" -> m("X32b", Q,
      "TPC-H Q17 small-quantity revenue vs per-part average (agg join-back)",
      "ops/QueryShapes.scala"),
    "q18_large_orders" -> m("X32", Q,
      "TPC-H Q18 large orders: HAVING-filtered aggregate broadcast back to headers",
      "ops/Analytics.scala"),
    "q19_disjunctive" -> m("X32b", Q,
      "TPC-H Q19 disjunctive bracket predicates evaluated in the join condition",
      "ops/QueryShapes.scala"),
    "q21_waiting_supplier" -> m("X32b", Q,
      "TPC-H Q21 suppliers who kept orders waiting (multi-exists shape)",
      "ops/QueryShapes.scala"),
    "q22_dormant_rich" -> m("X32b", Q,
      "TPC-H Q22 dormant high-balance customers (anti-join + scalar avg)",
      "ops/Analytics.scala"),

    "agg_distinct" -> m("X7", A,
      "Grouped aggregation with count(distinct) alongside plain aggregates",
      "ops/Analytics.scala"),
    "rollup_nation" -> m("X8", A,
      "Rollup over the region→nation hierarchy with grand totals",
      "ops/Analytics.scala"),
    "cube_orders" -> m("X8", A,
      "Cube over order status × priority", "ops/Analytics.scala"),
    "grouping_sets" -> m("X8", A,
      "Explicit grouping sets with grouping-id disambiguation",
      "ops/Analytics.scala"),
    "window_events" -> m("X9", A,
      "Ranked/lagged window analytics per user over the events table",
      "ops/Analytics.scala"),
    "tumbling_window" -> m("X10", A,
      "Event-time tumbling windows (batch form of the streaming twin)",
      "ops/Analytics.scala"),
    "sliding_window" -> m("X10", A,
      "Overlapping sliding event-time windows", "ops/Analytics.scala"),
    "session_window" -> m("X10", A,
      "Gap-based session windows per user", "ops/Analytics.scala"),
    "funnel" -> m("X9", A,
      "Ordered multi-step funnel conversion via window sequencing",
      "ops/Analytics.scala"),
    "percentiles" -> m("X19", A,
      "Exact grouped percentiles (median/p90/p99)", "ops/Reshape.scala"),
    "percentiles_approx" -> m("X19", A,
      "Greenwald-Khanna approximate percentiles, self-auditing its error contract against the exact twin",
      "ops/Reshape.scala"),
    "topk_orders" -> m("X6", A,
      "Global top-k with total-order tie-breaker (TakeOrderedAndProject)",
      "ops/Analytics.scala"),
    "topk_per_key" -> m("X40", A,
      "Per-key top-k as a custom LogicalPlan + Strategy + SparkPlan (no global sort)",
      "plans/TopKPerKey.scala"),
    "pivot_orders" -> m("X18", A,
      "Pivot order metrics to columns per status", "ops/Reshape.scala"),
    "unpivot_metrics" -> m("X18", A,
      "Unpivot wide metric columns back to long form", "ops/Reshape.scala"),
    "price_histogram" -> m("X46", A,
      "Fixed-width numeric histogram of extended price",
      "ops/Inspect.scala"),
    "scalar_suite" -> m("X15", A,
      "Scalar function surface: string/date/math/conditional expressions, codegen-friendly",
      "ops/Analytics.scala"),
    "json_extract" -> m("X14", A,
      "JSON path extraction from the events payload", "ops/Analytics.scala"),
    "json_functions" -> m("X14", A,
      "JSON object/array functions (schema_of, to/from_json, explode)",
      "ops/Analytics.scala"),
    "array_suite" -> m("X16", A,
      "Array higher-order functions (transform/filter/aggregate/zip_with)",
      "ops/Reshape.scala"),

    "set_ops" -> m("X11", J,
      "union/intersect/except over projected order slices",
      "ops/Analytics.scala"),
    "except_all" -> m("X11", J,
      "Multiset difference (exceptAll) preserving duplicate counts",
      "ops/Analytics.scala"),
    "semi_join" -> m("X12", J,
      "Left-semi join: customers with orders", "ops/Analytics.scala"),
    "anti_join" -> m("X12", J,
      "Left-anti join: customers without orders", "ops/Analytics.scala"),
    "asof_join" -> m("X13", J,
      "As-of join (latest quote ≤ event time) in a single shuffle via union + window",
      "ops/Analytics.scala"),
    "range_join" -> m("X21", J,
      "Bucketed range join: overlap buckets turn the inequality join into an equi-join",
      "ops/Reshape.scala"),
    "bucketed_join" -> m("X37", J,
      "Bucket-pruned co-located join: both sides bucketed on the key, zero exchanges",
      "ops/Bucketing.scala"),
    "bloom_join" -> m("X49", J,
      "Explicit bloom-filter join reduction: dim-keyed bloom pre-filters the fact scan",
      "ops/JoinReduction.scala"),
    "skew_agg" -> m("X33", J,
      "Two-phase salted aggregation for skewed keys", "util/Skew.scala"),
    "skew_join" -> m("X33", J,
      "Salted join: replicate the small side over salt buckets to break key skew",
      "util/Skew.scala"),
    "dpp_scan" -> m("X50", J,
      "Dynamic partition pruning: dim filter prunes fact partitions at runtime",
      "ops/Layout.scala"),
    "zorder_box" -> m("X51", J,
      "Z-order (Morton) layout clustering for multi-dimension range scans",
      "ops/Layout.scala"),

    "dedup_exact" -> m("X1", D,
      "Exact duplicate removal by hash-groupBy on content columns",
      "ops/Analytics.scala"),
    "dedup_keep_latest" -> m("X2", D,
      "Keep-latest-version dedup by key via window rank",
      "ops/Analytics.scala"),
    "neardup_minhash" -> m("X3", D,
      "MinHash-LSH near-duplicate pairs: shingle → minhash → band → bucket join",
      "ops/Dedup.scala"),
    "neardup_probe" -> m("X57", D,
      "Incremental near-dup probe of a new batch against an indexed corpus",
      "ops/Dedup.scala"),
    "neardup_stream" -> m("X57", D,
      "Streaming near-dup detection over micro-batch arrivals",
      "streaming/NeardupStream.scala"),
    "simhash_pairs" -> m("X3", D,
      "SimHash near-dup candidates by Hamming-ball band matching",
      "ops/Dedup.scala"),
    "ngram_jaccard" -> m("X3", D,
      "Exact n-gram Jaccard similarity on LSH-survivor pairs",
      "ops/Dedup.scala"),
    "jaccard_prefix_join" -> m("X62", D,
      "Exact set-similarity self-join via lossless prefix filtering (AllPairs/PPJoin)",
      "ops/Dedup.scala"),
    "dedup_groups" -> m("X22", D,
      "Connected components over the near-dup pair graph (iterative min-label propagation)",
      "ops/Dedup.scala"),
    "span_scrub" -> m("X58", D,
      "Repeated-span scrub: excise long char spans shared across documents",
      "ops/Dedup.scala"),

    "semdedup" -> m("X61", S,
      "SemDeDup semantic dedup: cell-clustered exact cosine, greedy keep-first verdicts",
      "ops/Similarity.scala"),
    "similarity_topk" -> m("X4", S,
      "Brute-force cosine top-k over embeddings (exact baseline)",
      "ops/Similarity.scala"),
    "filtered_topk" -> m("X4", S,
      "Predicate-filtered cosine top-k (filter pushed below the distance work)",
      "ops/Similarity.scala"),
    "cosine_pairs" -> m("X4", S,
      "All-pairs cosine ≥ τ via angular cell-bound pruning + salted block equi-joins (no cartesian)",
      "ops/Similarity.scala"),
    "ann_lsh_pairs" -> m("X4", S,
      "Approximate neighbor pairs by random-hyperplane LSH banding",
      "ops/Similarity.scala"),
    "ann_ivf_topk" -> m("X4", S,
      "IVF approximate top-k: coarse-quantize, probe nearest cells only",
      "ops/Similarity.scala"),
    "ann_ivf_probe" -> m("X4", S,
      "IVF probe of held-out queries against the persisted cell index",
      "ops/Similarity.scala"),
    "ann_ivf_append" -> m("X4", S,
      "IVF index append path: new vectors into existing cells without rebuild",
      "ops/Similarity.scala"),
    "ann_filtered_probe" -> m("X4", S,
      "IVF probe with metadata predicate applied inside the probed cells",
      "ops/Similarity.scala"),
    "embedding_stats" -> m("X16", S,
      "Per-label embedding norms/means via array higher-order functions",
      "ops/Similarity.scala"),
    "embedding_quantize" -> m("X31", S,
      "Symmetric int8 quantization of embeddings with scale recovery",
      "ops/Similarity.scala"),
    "centroid_udaf" -> m("X17", S,
      "Per-label centroid via custom Aggregator (quantized merge-gate form)",
      "functions/CentroidAgg.scala"),
    "sql_native_dot" -> m("X38", S,
      "SQL-registered native codegen dot-product expression (SparkSessionExtensions)",
      "plans/GraftExtensions.scala"),

    "multimodal_media" -> m("X16", M,
      "Opaque media bytes + typed metadata: decode PPM assets, extract pixel-statistic features",
      "ops/Multimodal.scala"),
    "media_resize" -> m("X16c", M,
      "Box-filter resize stage over decoded rasters (batch UDF plumbing)",
      "ops/Multimodal.scala"),
    "media_embed_topk" -> m("X16b", M,
      "Decode → feature-embed → cosine top-k pipeline over real image bytes",
      "ops/Similarity.scala"),

    "word_freq" -> m("X5", T,
      "Corpus word frequencies (tokenize, explode, count)",
      "ops/TextAnalysis.scala"),
    "text_quality" -> m("X5", T,
      "Quality scoring: length/punctuation/stopword/uppercase ratios",
      "ops/TextAnalysis.scala"),
    "lang_stats" -> m("X5", T,
      "N-gram-heuristic language ID distribution", "ops/TextAnalysis.scala"),
    "doc_fingerprint" -> m("X5", T,
      "Rolling-hash document fingerprints (winnowing)",
      "ops/TextAnalysis.scala"),
    "token_counts" -> m("X5", T,
      "Whitespace + BPE-ish regex token counting per document",
      "ops/TextAnalysis.scala"),
    "clean_corpus" -> m("X5", T,
      "Filter-chain corpus cleaning with per-rule rejection tallies",
      "ops/TextAnalysis.scala"),
    "scrub_normalize" -> m("X23", T,
      "Text scrub/normalize: unicode folds, boilerplate strips, whitespace collapse",
      "ops/TextAnalysis.scala"),
    "kmv_distinct" -> m("X24", T,
      "KMV (k-minimum-values) distinct-count sketch with exact twin check",
      "ops/CorpusStats.scala"),
    "tfidf_top_terms" -> m("X25", T,
      "TF-IDF top terms per document", "ops/CorpusStats.scala"),
    "bm25_search" -> m("X25", T,
      "BM25 ranked retrieval over the inverted index", "ops/CorpusStats.scala"),
    "inverted_index" -> m("X26", T,
      "Posting-list inverted index with positions", "ops/CorpusStats.scala"),
    "bigram_novelty" -> m("X27", T,
      "Bigram novelty: fraction of bigrams unseen in the reference slice",
      "ops/CorpusStats.scala"),
    "ngram_repetition" -> m("X28", T,
      "Within-document n-gram repetition ratios (degenerate-text signal)",
      "ops/QualitySignals.scala"),
    "zipf_spectrum" -> m("X30", T,
      "Zipf rank-frequency spectrum of the corpus vocabulary",
      "ops/QualitySignals.scala"),
    "heavy_hitters" -> m("X52", T,
      "Sketch-guided heavy hitters: count-min candidates, exact recount",
      "ops/CorpusStats.scala"),
    "bpe_train" -> m("X54", T,
      "Distributed BPE merge-rule training (vocab-bounded driver iterations)",
      "ops/BpeTrain.scala"),
    "bpe_encode" -> m("X63", T,
      "Tokenizer application: per-doc token counts from the trained BPE merges",
      "ops/BpeTrain.scala"),
    "decontaminate" -> m("X29", T,
      "Eval-set decontamination: drop training docs sharing n-grams with eval",
      "ops/QualitySignals.scala"),
    "pii_redact" -> m("X34", T,
      "PII redaction: emails/phones/ids masked with per-kind counts",
      "ops/Privacy.scala"),

    "doc_chunk" -> m("X56", R,
      "Token-budget document chunking with overlap", "ops/Reshape.scala"),
    "seq_packing" -> m("X35", R,
      "Greedy sequence packing of chunks into fixed token budgets",
      "ops/Reshape.scala"),
    "shard_export" -> m("X60", R,
      "Deterministic shard export with per-shard manifest",
      "ops/Reshape.scala"),
    "domain_mix_sample" -> m("X36", R,
      "Domain-mix sampling to target proportions", "ops/Reshape.scala"),
    "train_split" -> m("X48", R,
      "Deterministic hash-based train/val/test split", "ops/Reshape.scala"),
    "sample_stratified" -> m("X20", R,
      "Per-stratum Bernoulli sampling (sampleBy)", "ops/Reshape.scala"),
    "take_stratified" -> m("X20b", R,
      "Exact-k per-stratum take with deterministic order",
      "ops/Reshape.scala"),
    "coverage_select" -> m("X36b", R,
      "Coverage-maximizing greedy selection under a budget",
      "ops/Reshape.scala"),

    "dq_audit" -> m("X53", G,
      "One-scan data-quality audit: null/range/uniqueness/referential expectations",
      "ops/Inspect.scala"),
    "dq_window" -> m("X53", St,
      "Windowed streaming data-quality monitor (violation rates per window)",
      "streaming/StreamingOps.scala"),
    "fk_violations" -> m("X45", G,
      "Foreign-key integrity audit across the star schema",
      "ops/Inspect.scala"),
    "table_profile" -> m("X43", G,
      "One-pass table profile: per-column nulls/distincts/extremes (exact)",
      "ops/Inspect.scala"),
    "table_profile_approx" -> m("X43", G,
      "HLL-sketch table profile, self-auditing its 5σ error bound",
      "ops/Inspect.scala"),

    "click_attribution" -> m("X41", St,
      "Stream-stream interval join: clicks attributed to impressions within the window",
      "streaming/StreamingOps.scala"),

    "orc_roundtrip" -> m("X39", F,
      "ORC write/read roundtrip preserving schema and values",
      "ops/Formats.scala"),
    "json_roundtrip" -> m("X39", F,
      "JSONL write/read roundtrip with explicit schema",
      "ops/Formats.scala"),
    "csv_roundtrip" -> m("X39", F,
      "CSV write/read roundtrip with quoting/escaping intact",
      "ops/Formats.scala"))

  /** Render the full markdown document (pure — also used by the
    * freshness spec). */
  def render(): String = {
    val reg = graft.SparkEntry.registry
    val names = reg.map(_._1)
    val oracled = reg.collect {
      case (n, q) if q.oracle.isDefined => n }.toSet
    val sb = new StringBuilder
    sb ++= "# Query reference\n\n"
    sb ++= ("GENERATED FILE — edit `tools/QueryDocs.scala` and re-run " +
      "`sbt \"runMain graft.tools.QueryDocs\"`. `QueryDocsSpec` fails " +
      "when this file is stale or the registry and the metadata map " +
      "diverge.\n\n")
    sb ++= s"${names.size} registered queries. Every query is driven " +
      "end-to-end by the correctness gate (`graft.Verify` + DuckDB " +
      "oracle hash-compare at sf0.01) and timed by `graft.Bench` at " +
      "sf0.1. Oracle column: `SQL` = full rows+schema+hash check " +
      "against `SparkEntry.oracleSql`; `rows` = row-count-only check.\n\n"
    sb ++= "Scale notes for the heavy operators: `SCALE_NOTES.md`. " +
      "Per-plan shuffle budgets: `plans/PlanAuditSpec.scala`.\n"
    for (fam <- families) {
      val rows = names.filter(n => meta(n).family == fam)
      if (rows.nonEmpty) {
        sb ++= s"\n## $fam\n\n"
        sb ++= "| query | operator | description | oracle | implementation |\n"
        sb ++= "|---|---|---|---|---|\n"
        for (n <- rows) {
          val mt = meta(n)
          val o = if (oracled(n)) "SQL" else "rows"
          sb ++= s"| `$n` | ${mt.op} | ${mt.desc} | $o | `src/main/scala/graft/${mt.impl}` |\n"
        }
      }
    }
    sb.result()
  }

  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get("docs/QUERIES.md")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      render().getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote ${out.toAbsolutePath}")
  }
}
