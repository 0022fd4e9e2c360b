package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The failing-spec version of the advisory `tools/PlanAudit` sweep
  * (round-9, VERDICT r8 item 7): every registered query's PHYSICAL
  * plan is walked, and a cartesian anywhere — or a
  * BroadcastNestedLoopJoin outside the explicit allowlist — fails the
  * suite. This is the structural half of the 100 TB contract: a plan
  * with an unkeyed n×m join is broken at scale regardless of local
  * wall time, so it must not be able to land silently.
  *
  * The BNLJ allowlist is the set of queries whose nested-loop side is
  * BOUNDED BY CONSTRUCTION (a broadcast query set, a 1-row aggregate,
  * or corpus-constant stats — never a data-scaled relation):
  *  - similarity_topk / filtered_topk / media_embed_topk:
  *    `crossJoin(broadcast(queries))` — the fixed top-k query set.
  *  - fk_violations: two 1-row aggregates crossed into one row.
  *  - q22_dormant_rich: TPC-H Q22's scalar avg-balance subquery.
  *  - tfidf_top_terms / bm25_search: corpus-constant doc-count/IDF
  *    scalars joined onto the term stream.
  * CartesianProduct has NO allowlist: since the round-9 cosine_pairs
  * rework (cell-bound pruning + salted block equi-joins) no registered
  * plan needs one.
  *
  * Driver-side collects stay out of scope here — the bounded ones
  * (IVF codebooks, BPE vocab, upsert dt-lists) are documented serving
  * constants, and a plan-string audit cannot see them anyway; the
  * VERDICT-tracked inventory lives in their scaladocs. */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val bnljAllowed = Set(
    "similarity_topk", "filtered_topk", "media_embed_topk",
    "fk_violations", "q22_dormant_rich", "tfidf_top_terms", "bm25_search",
    // 1-row broadcast vocab scalar riding along the scoring join
    "ngram_lm_score")

  /** Every registered query's physical-plan STRING, built once and
    * shared by all audits (building a plan runs the side-effecting
    * queries' setup, so one walk instead of one per test also keeps
    * the suite's wall time flat as audits accumulate). Build failures
    * are carried as Left and surfaced by the first test. */
  private lazy val plans: Seq[(String, Either[String, String])] =
    graft.SparkEntry.registry.map { case (name, q) =>
      name -> (try Right(q.fn(spark, dir).queryExecution.executedPlan
          .toString)
        catch { case e: Throwable =>
          Left(String.valueOf(e.getMessage).take(120)) })
    }
  private def plan(name: String): String =
    plans.find(_._1 == name)
      .getOrElse(fail(s"query $name is not registered"))
      ._2.fold(e => fail(s"$name: plan build failed: $e"), identity)

  test("no registered plan contains a cartesian; BNLJ only on bounded broadcast sides") {
    val bad = Seq.newBuilder[String]
    plans.foreach { case (name, p) =>
      val plan = p.fold(e => { bad += s"$name: plan build failed: $e"; "" },
        identity)
      if (plan.contains("CartesianProduct"))
        bad += s"$name: CartesianProduct in physical plan"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
        bad += s"$name: BroadcastNestedLoopJoin outside the allowlist"
    }
    val failures = bad.result()
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  /** Per-query KEYED-exchange budgets (VERDICT r9 item 2): the
    * expected number of hash/range/single-partition exchanges in the
    * static physical plan at sf0.001. RoundRobin repartitions are
    * excluded on purpose — they are `Tables.fanOut`'s scan-scaling
    * knob, present only when the local source has fewer splits than
    * cores (see `tools.PlanAudit.keyedExchanges`). The pin is EXACT
    * in both directions: a regression that sneaks an extra shuffle in
    * fails here instead of hiding as bench drift, and an optimization
    * that removes one must update the budget so the table stays the
    * plan of record. Budgets with their decomposition:
    *  - q1_pricing_summary 2  = agg partial→final + output sort
    *  - q5_revenue_by_nation 2 = final agg key + output sort (dims
    *    broadcast)
    *  - topk_per_key 2        = per-key shuffle into the custom
    *    operator + output sort
    *  - dedup_exact 2         = key-hash dedup + output sort
    *  - window_events 2       = user_id window key + output sort
    *  - tumbling_window 2     = window-start agg key + output sort
    *  - asof_join 2           = user_id window key (the union trick's
    *    ONE shuffle — the join adds none) + output sort
    *  - bucketed_join 2       = agg + output sort; the JOIN itself is
    *    exchange-free (bucketed SMJ both sides, the operator's point)
    *  - neardup_minhash 1     = output sort only at this sf (the band
    *    self-join's build side broadcasts; at scale it degrades to
    *    one keyed shuffle, never all-pairs)
    *  - span_scrub 3          = the scaladoc's two keyed shuffles
    *    (window-hash group, doc_id regroup) + output sort
    *  - cosine_pairs 1        = output sort only (block-pair key
    *    table broadcasts; block sides co-partitioned at this sf)
    *  - ann_lsh_pairs 2       = band-bucket join key + output sort
    *  - dedup_groups 3        = pair stream + component propagation +
    *    output sort
    *  - ngram_jaccard 4       = two intersection attach joins,
    *    intersection agg, size join + output sort over the
    *    checkpointed pair/shingle relations (was 8 before the shc
    *    checkpoint absorbed the semi-join prune + signature side)
    *  - jaccard_prefix_join 6 = the FINAL plan over the four
    *    checkpointed relations: semi-join prune, two intersection
    *    attach joins, intersection agg, size joins, output sort (the
    *    checkpoint jobs' own exchanges run once at build; pre-fix the
    *    un-checkpointed plan held 37 exchanges and 34 corpus scans).
    *    containment_join 6 = the identical structure, one-sided
    *    prefix
    *  - semdedup 3            = per-cell count agg feeding the salt
    *    map, verdict agg, output sort (block pairs broadcast)
    *  - embedding_outliers 2  = the X40 partial→final top-k shuffle
    *    + output sort (centroids broadcast)
    *  - word_rarity 2         = per-doc agg after the freq-checkpoint
    *    join + output sort
    *  - bpe_encode 2          = word→n_symbols join key + per-doc agg
    *    (vocab folds are checkpoint-local)
    *  - the FULL TPC-H q-family, one row per registered shape: every
    *    dim is broadcast and every agg partial/final, so the whole
    *    count is final-agg keys + output sorts (+ the decorrelated
    *    subquery's own agg where one exists: q13's outer join
    *    regroup, q15's revenue-view reuse, q21's multi-flag regroup,
    *    q22's customer re-agg). TopN shapes (q3/q10) plan
    *    TakeOrderedAndProject — no range exchange at all. A
    *    broadcast-threshold or AQE change that flips any join to a
    *    shuffle lands HERE, not in bench noise.
    *
    * Since round 11 (VERDICT r10 item 4) the table covers EVERY
    * registered query — the multi-scan audit's default-1 treatment,
    * applied to exchanges as exact pins: a plan-shape flip on ANY
    * query now fails the build instead of surfacing as bench drift.
    * The full map is generated from `tools.PlanAudit exch` output at
    * sf0.001 and hand-audited; update an entry ONLY together with the
    * plan change that moves it. */
  private val exchangeBudgets: Map[String, Int] = Map(
    "agg_distinct" -> 3,
    "ann_filtered_probe" -> 2,
    "ann_ivf_append" -> 2,
    "ann_ivf_probe" -> 2,
    // X31+X4: the rerank shortlist window's q_id key + output sort;
    // the re-rank join broadcasts the query-bounded shortlist
    "ann_ivf_quantized" -> 2,
    "ann_ivf_topk" -> 2,
    "ann_lsh_pairs" -> 2,
    "anti_join" -> 1,
    "array_suite" -> 1,
    "asof_join" -> 2,
    "bigram_novelty" -> 3,
    "binary_ingest" -> 1,
    "bloom_join" -> 4,
    "bm25_search" -> 5,
    "bpe_encode" -> 2,
    // X104: pure per-row projection — the presentation sort is the
    // only exchange
    "script_mix" -> 1,
    // X103: the X63 encode exchanges (the doc agg reuses the word
    // join's shuffle; the lang join broadcasts the slim projection)
    // + the lang rollup + presentation sort
    "bpe_fertility" -> 3,
    "bpe_train" -> 1,
    "bucketed_join" -> 2,
    "cdc_rollup" -> 5,
    "centroid_udaf" -> 1,
    "clean_corpus" -> 2,
    "click_attribution" -> 1,
    "containment_join" -> 6,
    "containment_probe" -> 3,
    // r17 single-pass accounting: one flags aggregate + the shard
    // tail's keyed exchanges over the stage checkpoints (was 42 when
    // each stage branch replayed the anti-join chain)
    "corpus_pipeline" -> 15,
    // the incremental twin: same single-pass flags aggregate + probe
    // candidate/verify aggs — batch- or pair-sized rows throughout
    // (index sides stream; was 49 with per-stage replay branches)
    "corpus_pipeline_incr" -> 14,
    "cosine_pairs" -> 1,
    "coverage_select" -> 2,
    "csv_roundtrip" -> 2,
    "cube_orders" -> 2,
    "decontaminate" -> 3,
    // X76: corpus-label left join + group agg + output sort on top of
    // the pair-label rounds (which run at construction)
    "dedup_canonical" -> 5,
    "dedup_exact" -> 2,
    "dedup_groups" -> 3,
    "dedup_keep_latest" -> 2,
    "doc_chunk" -> 1,
    "doc_fingerprint" -> 1,
    "domain_mix_sample" -> 1,
    "dpp_scan" -> 5,
    "dq_audit" -> 2,
    "dq_window" -> 2,
    // X71: candidate distinct + two verify-attach joins + output sort
    // over the checkpointed (doc_id, text, len) relation
    "edit_distance_join" -> 4,
    // X71b: cross-direction candidate distinct + corpus verify attach
    // + output sort (batch sides broadcast; index scans stream)
    "edit_distance_probe" -> 3,
    "embedding_outliers" -> 2,
    "embedding_quantize" -> 1,
    "embedding_stats" -> 2,
    "except_all" -> 2,
    "filtered_topk" -> 2,
    "fk_violations" -> 6,
    "funnel" -> 2,
    "grouping_sets" -> 2,
    "heavy_hitters" -> 2,
    "incremental_rollup" -> 1,
    "ingest_append" -> 1,
    "ingest_backfill" -> 1,
    "ingest_compact" -> 1,
    "ingest_escaped_dt" -> 1,
    "ingest_multiline" -> 1,
    "ingest_overwrite" -> 1,
    "ingest_stream" -> 1,
    "ingest_ts_normalize" -> 1,
    "ingest_upsert" -> 1,
    "inverted_index" -> 3,
    "jaccard_prefix_join" -> 6,
    "jaccard_probe" -> 3,
    "json_extract" -> 2,
    "json_functions" -> 2,
    "json_roundtrip" -> 2,
    "kmv_distinct" -> 5,
    // X77: per-lang exact-percentile agg + verdict join + output sort
    "length_outliers" -> 2,
    // X73: (source, lang) partial→final agg + output sort (scoring is
    // per-row against the broadcast marker profile)
    "lang_mismatch" -> 2,
    "lang_stats" -> 3,
    // X72: group-label left join + split projection + output sort over
    // the label relation (the component rounds run at construction)
    "leakage_safe_split" -> 3,
    "media_embed_topk" -> 2,
    "media_resize" -> 1,
    "multimodal_media" -> 1,
    "neardup_minhash" -> 1,
    "neardup_probe" -> 4,
    "neardup_stream" -> 1,
    "ngram_jaccard" -> 4,
    "ngram_repetition" -> 5,
    "orc_roundtrip" -> 2,
    "percentiles" -> 2,
    "percentiles_approx" -> 3,
    "pii_redact" -> 1,
    // X82: pure per-row projection over the fixture CSV; the one
    // exchange is the final presentation orderBy
    "html_extract" -> 1,
    // X82b: the registered plan reads the accumulated verdict store
    // (the streaming work happens in foreachBatch) + presentation sort
    "html_extract_stream" -> 1,
    // X83: extraction projection → one map-side-combined host agg
    // (count-distinct expands it) + presentation sort
    "link_hosts" -> 3,
    // X83b: same shape — resolution is a per-row projection, so the
    // plan budget must be identical to the unresolved rollup's
    "link_hosts_resolved" -> 3,
    // X85: ONE conditional-agg scan (before+removed), the rewritten
    // corpus's rollup, null-safe join + presentation sort; the
    // write-back happens store-side, not in the registered plan
    "takedown_propagate" -> 3,
    // X76b: the takedown shape driven by the dedup manifest — one
    // conditional-agg scan (drop list broadcast), the rewritten
    // corpus's rollup, null-safe join + presentation sort; write-back
    // and the MinHash drop-list derivation run store-side/checkpointed
    "dedup_apply" -> 3,
    // X107: one user-keyed window (both leads share the spec) + the
    // map-side-combined path count; the top-k cut plans as
    // TakeOrderedAndProject — no range exchange
    "event_paths" -> 2,
    // X94: stats agg over the checkpointed bucket relation (the
    // corpus-sized (type,day) count agg runs at checkpoint time) +
    // presentation sort; stats join back is broadcast
    "event_anomaly" -> 2,
    // X93: one type-keyed agg over the per-file sniff projection
    // (content never shuffles) + presentation sort
    "mime_sniff" -> 2,
    // X106: one digest-keyed agg over the per-file hash projection
    // (the shuffle carries digests and names, never bytes) +
    // presentation sort
    "asset_dedup" -> 2,
    // X106b: the (chunk, cval) bucket agg + the pair distinct +
    // presentation sort; decode+dHash is mapPartitions over the scan
    // (no shuffle), signatures are the only thing that ever moves
    "media_neardup" -> 3,
    // X106c: the pair distinct + presentation sort — the batch decode
    // is mapPartitions, the index a slim parquet scan, the banded
    // join broadcasts the batch side at this sf (keyed at scale);
    // +1 (r16): the index-side bucket-occupancy agg behind the
    // MaxBucket cap (ADVICE r15 — the cap the pair path always had)
    "media_neardup_probe" -> 3,
    // X106d: the label join onto the asset universe (the component
    // rounds ran on checkpointed leaves), the group agg + its
    // partial, and the presentation sort
    "media_canonical" -> 4,
    // X106e: read-back manifest — four per-class listing/index aggs
    // + the presentation sort ride one exchange each via the class
    // joins; the write-back ran at store build (memoized)
    "media_apply" -> 5,
    // X106f: the registered plan is the verdict-store read-back +
    // presentation sort — decode/probe ran inside foreachBatch
    "media_probe_stream" -> 1,
    // X109a: decode+stats is mapPartitions over the clip scan; only
    // the presentation sort exchanges
    "audio_ingest" -> 1,
    // X109b: the shared pair engine's shape — bucket agg + pair
    // distinct + presentation sort; decode+fingerprint never shuffles
    "audio_neardup" -> 3,
    // X110a/b: decode + per-frame features is mapPartitions over the
    // clip scan; only the presentation sort exchanges
    "video_ingest" -> 1,
    "video_frames" -> 1,
    // X110c: the shared pair engine's shape (see audio_neardup)
    "video_neardup" -> 3,
    // X110d: shingle occupancy agg + cap join + pair self-join (one
    // exchange reused across them) + pair agg + presentation sort;
    // decode+shingling itself never shuffles (in-closure window)
    "video_subclip" -> 4,
    // X110e: the label relation is checkpointed (pair chains priced
    // at build, not in this plan): manifest left join + keeper/agg
    // exchange + presentation sort
    "video_canonical" -> 4,
    // X111: three decode scans union into ONE doc-keyed agg (map-side
    // combinable) + presentation sort — no per-modality shuffles
    "multimodal_manifest" -> 2,
    // X112: nine path listings + the retired decode union into two
    // modality-keyed aggs (one exchange reused by the join) +
    // presentation sort
    "asset_gc" -> 3,
    // X113: media-cost agg (its exchange reused by the doc join) +
    // the shard window + presentation sort
    "multimodal_pack" -> 3,
    // X92: one lag window + one agg over the merge key (the same
    // exchange reused), presentation sort; the three version
    // reconstructions read the tiny fixture lake, not a scaled table
    "recrawl_schedule" -> 2,
    // X91: score-side bigrams join the model on the bigram key then
    // the context key (both shuffles — the model is corpus-scaled,
    // never broadcast), per-doc reduction, presentation sort; the
    // (w1,g) model rollup and the one corpus scan live behind the
    // listing-tagged checkpoint
    "ngram_lm_score" -> 5,
    // X95: winner agg on the paragraph hash (map-side combined — hot
    // boilerplate keys) + join-back + per-doc rebuild agg + total agg
    // join + presentation sort, over the one checkpointed fan-out
    "paragraph_dedup" -> 4,
    // X90: the REGISTERED plan reads the final checkpointed rank
    // vector (the 10 power-method rounds run at checkpoint time, each
    // a host-sized join+agg) and joins the in/out-degree rollups —
    // one degree agg exchange survives reuse — plus the presentation
    // sort; everything corpus-sized happened before the edge
    // checkpoint
    "link_pagerank" -> 2,
    // X86: the budget is a per-row projection over the host-sized
    // CHECKPOINTED rollup (the resolve tree is optimizer-expensive;
    // the rollup job runs at checkpoint time) joined BROADCAST to the
    // checkpointed declared-delay relation (no keyed exchange) — one
    // presentation sort
    "crawl_budget" -> 1,
    // X102: the two X28-shaped repetition aggs (the bigram pair
    // shares its doc_id exchange) over the checkpointed token base +
    // the two doc-keyed left joins + presentation sort; scalar rules
    // are per-row
    "gopher_rules" -> 5,
    // X105: the registered plan reads the final label checkpoint
    // (pointer-jump rounds run at checkpoint time) + the size agg
    // (its join-back reuses the cluster exchange) + presentation sort
    "host_clusters" -> 3,
    // X90b: like X90 — the registered plan reads the final warm-round
    // checkpoint and joins the degree rollups (one exchange survives
    // reuse) + presentation sort; the store build and the warm rounds
    // run at checkpoint time
    "link_pagerank_probe" -> 2,
    // X101: the outlink distinct + its novelty anti-join, the sitemap
    // fold + its novelty join, the robots channel's novelty anti-join
    // (its X100 parse is checkpointed at the host-bounded (host, url)
    // boundary, so the parse windows run at build), the merge agg +
    // presentation sort. The round-15 shared-assembly refactor
    // dropped the frontierNovelFrom detour's 2 extra exchanges (its
    // internal orderBy + second seen distinct): 9 → 7
    // r16: the sitemap/robots channels read memoized checkpoint
    // leaves — one window exchange left the read-time plan
    "discovery_feed" -> 6,
    // X101b: the batch feed's merge shape over the accumulated
    // per-batch stores — the outlink/seen distincts read slim state
    // parquet instead of the resolve chain (whose exchanges ran
    // per-arrival inside foreachBatch), then the three novelty
    // anti-joins + merge agg + presentation sort
    "discovery_feed_stream" -> 6,
    // X100: the line windows, the rules×agents self-join and the
    // rule_order window all REUSE the one host exchange; plus the
    // presentation sort — all host-bounded (lines per robots file);
    // +1 (r16): the non-group sitemap branch unions BEFORE the
    // rule_order window (ADVICE r15 — pre-group Sitemap lines), so
    // the window re-partitions the unioned relation
    "robots_parse" -> 4,
    // X99: four host-bounded rollups (novel distinct+anti+agg, the
    // admit join+agg, the two trap aggs) + the three host-keyed left
    // joins + presentation sort; the rank vector is a PERSISTED-store
    // scan (the X90 artifact — built once per crawl fingerprint)
    "host_priority" -> 8,
    // X98: (host, url)-keyed latest-lastmod agg + seen-set distinct +
    // presentation sort; the url left join BROADCASTS the declared
    // side at fixture scale (corpus-scaled deployments shuffle it —
    // the join key is already the agg key, so that exchange reuses)
    "sitemap_ingest" -> 3,
    // X97: (host, term) count agg + the TopKPerKey operator's keyed
    // exchange + presentation sort, over the per-row element parse —
    // the rank window REUSES the TopK exchange's host partitioning
    "anchor_text" -> 3,
    // X96: (host, path)-keyed distinct-variant agg (count-distinct
    // expands to two exchanges) + host rollup + presentation sort
    // over the shared resolve projection
    "crawl_traps" -> 4,
    // X87: the frontier is checkpointed (resolve tree); the verdict
    // window + the two left joins against broadcast rules relations +
    // presentation sort
    "robots_gate" -> 4,
    // X88: frontier distinct + the seen-set anti join + presentation
    // sort (the fixture scans twice — outlinks and page_urls — but it
    // is not a data-scaled table, so the multi-scan audit ignores it)
    "frontier_novel" -> 3,
    // X89: the novel anti-join chain pre-checkpoint (distinct + anti)
    // feeds the checkpointed robots frontier; then verdict window,
    // host rollup, presentation sort
    "frontier_schedule" -> 5,
    // X88b: batch-outlink distinct + the store anti join + sort — one
    // exchange fewer than the backfill (the seen side reads the
    // persisted store instead of re-deriving page_urls)
    "frontier_novel_probe" -> 2,
    // X84: checkpointed extraction (ONE chain run — the stage
    // counters read the checkpoint) → exact-dedup window (ckpt'd) →
    // near-dup pair chain (signature agg, bucket agg, pair agg,
    // drop distinct) → four source-sized aggs + presentation sort
    "crawl_ingest" -> 9,
    // X84b: the registered plan is the manifest FOLD over the
    // accumulated slim stores (exact window, sig-join + the
    // re-fetch-dedup DISTINCT, pair chain, four rollups) — the
    // extraction ran in foreachBatch
    "crawl_ingest_stream" -> 9,
    // X108: every inter-stage relation is an eager checkpoint, so the
    // registered plan is the stage-accounting UNION over checkpoint
    // reads plus the LIVE tails: the paragraph rebuild agg + its
    // winner fetch join (3), the gopher gate's repetition aggs +
    // stitch joins + admit semi-join (5), the manifest read-back
    // rollup + chunk-accounting agg (2), presentation sort (1). The
    // html fixture's 2 scans (extraction chain + paragraph fan-out)
    // are the documented by-design pair — fixture-sized, not a
    // scaled-table scan.
    "web_pipeline" -> 11,
    "pivot_orders" -> 3,
    "price_histogram" -> 2,
    "q10_returned_items" -> 1,
    "q12_late_lines" -> 2,
    "q13_order_dist" -> 3,
    "q14_promo_effect" -> 1,
    "q15_top_supplier" -> 2,
    "q17_small_qty" -> 2,
    "q18_large_orders" -> 2,
    "q19_disjunctive" -> 1,
    "q1_pricing_summary" -> 2,
    "q21_waiting_supplier" -> 3,
    "q22_dormant_rich" -> 3,
    "q3_top_revenue" -> 1,
    "q4_priority_check" -> 2,
    "q5_revenue_by_nation" -> 2,
    "q6_forecast" -> 1,
    "q7_volume_shipping" -> 2,
    "q8_market_share" -> 2,
    "q9_nation_brand" -> 2,
    // X80: over the scored checkpoint — phase-1 (source, mb) agg, its
    // source-window repartition (bounded stats relation), the phase-2
    // (source, mb) rank window, output sort
    "quality_calibrated" -> 4,
    // X81: batch scorer's per-doc agg + output sort; all three stats
    // joins broadcast tiny persisted parquet (built at construction)
    "quality_gate_probe" -> 2,
    // X81b: the registered plan reads the stream's accumulated
    // verdict store + output sort (the gating ran inside the
    // StreamingQuery at construction)
    "quality_gate_stream" -> 1,
    "quality_score" -> 2,
    "range_join" -> 3,
    "read_at_version" -> 1,
    "rollup_nation" -> 2,
    "sample_stratified" -> 1,
    "scalar_suite" -> 1,
    "schema_evolution" -> 1,
    "scrub_normalize" -> 1,
    "semantic_decon" -> 2,
    "semantic_decon_probe" -> 2,
    "semdedup" -> 3,
    // X61c: the registered plan reads the checkpointed pair stream —
    // dup agg + two verdict joins + output sort (the per-round MIS
    // passes run at construction, before this plan exists)
    "semdedup_greedy" -> 6,
    "semdedup_probe" -> 4,
    "semi_join" -> 1,
    "seq_packing" -> 2,
    "session_window" -> 2,
    "set_ops" -> 3,
    "shard_export" -> 3,
    "simhash_pairs" -> 4,
    "similarity_topk" -> 2,
    "skew_agg" -> 3,
    "skew_join" -> 2,
    "sliding_window" -> 2,
    "snapshot_diff" -> 3,
    // X79: source-pair cell agg + output sort (pair stream is the
    // session checkpoint; both meta joins broadcast the pair side)
    "source_overlap_matrix" -> 2,
    "span_scrub" -> 3,
    "sql_native_dot" -> 1,
    "table_profile" -> 2,
    "table_profile_approx" -> 3,
    // X20: survivor window + presentation sort. The r13 rank-filter
    // pre-pass moved the corpus out of the registered plan entirely
    // (count pass + survivor checkpoint are construction-time jobs;
    // the window sorts ~headroom·k rows per lang, never a stratum)
    "take_stratified" -> 2,
    // X78: output sort only — the rate derivation is a construction-
    // time agg over the source domain (codebook convention), rates a
    // broadcast join
    "temperature_mix" -> 1,
    "text_quality" -> 1,
    "tfidf_top_terms" -> 6,
    // X75: phase-1 (source, bucket) agg + its bounded running-sum
    // window + the phase-2 (source, bucket) window key + output sort
    "token_budget_mix" -> 4,
    "token_counts" -> 1,
    "topk_orders" -> 0,
    "topk_per_key" -> 2,
    "train_split" -> 2,
    "tumbling_window" -> 2,
    "unpivot_metrics" -> 2,
    // X74: the X68 classifier's one agg + output sort (coin + clamp
    // are per-row)
    "weighted_sample" -> 2,
    "version_changes" -> 3,
    "window_events" -> 2,
    "word_freq" -> 1,
    "word_rarity" -> 2,
    "zipf_spectrum" -> 3,
    "zorder_box" -> 2
  )

  test("audit tables are closed-world over the registry") {
    // VERDICT r11 item 2: the class doc claims the exchange table
    // covers EVERY registered query — enforce it, so a new operator
    // with no pin fails the build BY NAME instead of silently skipping
    // its audit (exactly how round-11's edit_distance_join slipped).
    val registered = graft.SparkEntry.registry.map(_._1).toSet
    val unpinned = registered -- exchangeBudgets.keySet
    assert(unpinned.isEmpty,
      s"registered queries with no exchange budget: $unpinned — " +
        "measure with `tools.PlanAudit exch` and pin")
    val stale = exchangeBudgets.keySet -- registered
    assert(stale.isEmpty, s"exchange budgets for unregistered: $stale")
    // same coverage rule for the other allow/pin tables: a row naming
    // a query that no longer exists is a latent hole
    assert((bnljAllowed -- registered).isEmpty,
      s"BNLJ allowlist rows for unregistered: ${bnljAllowed -- registered}")
    assert((multiScanBudgets.keySet -- registered).isEmpty,
      "multi-scan budgets for unregistered: " +
        s"${multiScanBudgets.keySet -- registered}")
  }

  test("keyed exchange counts match the pinned per-query budgets") {
    val bad = exchangeBudgets.toSeq.sortBy(_._1).flatMap {
      case (name, budget) =>
        val got = graft.tools.PlanAudit.keyedExchanges(plan(name))
        if (got == budget) None
        else Some(s"$name: $got keyed exchanges, budget $budget" +
          (if (got > budget) " — a shuffle regressed into the plan"
           else " — plan improved; move the budget down with it"))
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("BNLJ allowlist stays tight: allowlisted queries do plan a BNLJ") {
    // an entry that stops planning a BNLJ should be REMOVED — a stale
    // allowlist row is a latent hole, not a convenience
    val stale = bnljAllowed.filter(name =>
      !plan(name).contains("BroadcastNestedLoopJoin"))
    assert(stale.isEmpty, s"allowlist rows no longer needed: $stale")
  }

  /** Tables whose size scales with the corpus — a repeated FileScan of
    * one of these is a repeated 100 TB pass, the regression class the
    * round-10 jaccard_prefix_join audit caught (34 scans of
    * `documents` in one plan: lineage branching re-derives the scan
    * per consumer, and column pruning specializes each branch's scan
    * so ReuseExchange never fires). `nation`/`region` are fixed-size
    * dims and exempt. */
  private val scaledTables = Set("lineitem", "orders", "events",
    "customer", "part", "supplier", "documents", "embeddings")

  /** Exact pins for every query whose plan scans some data-scaled
    * table more than once (the plan of record, measured at sf0.001);
    * unlisted queries must stay at ≤ 1. Checkpoint-backed queries
    * (jaccard_prefix_join, ngram_jaccard, bpe_*) show 0 here — their
    * one corpus scan runs at checkpoint build. Multi-scan
    * decompositions:
    *  - set_ops 4            = 4 customer slices through
    *    union/intersect/exceptAll — the operator's semantics
    *  - ngram_repetition, bigram_novelty, decontaminate, kmv_distinct,
    *    dpp_scan, range_join, click_attribution, except_all,
    *    table_profile_approx, percentiles_approx, neardup_probe,
    *    sql_native_dot, similarity_topk, filtered_topk,
    *    ann_ivf_topk 2       = two-slice / probe-vs-corpus /
    *    exact-vs-sketch-twin shapes
    *  - span_scrub, clean_corpus, tfidf_top_terms, bm25_search 3;
    *    ann_lsh_pairs 4 = signature/score build + both
    *    verification attach sides; the ≤1-scan path at 100 TB is the
    *    corresponding SERVING split (neardup_probe / ann_ivf_probe /
    *    the persisted LSH index), which is why these inline forms pin
    *    rather than chase checkpoints. (semdedup/semdedup_probe/
    *    cosine_pairs dropped to 0 in r17: the routed-embeddings
    *    checkpoint is the only consumer of the scan.) */
  private val multiScanBudgets: Map[String, Int] = Map(
    "set_ops" -> 4, "ann_lsh_pairs" -> 4,
    "span_scrub" -> 3, "clean_corpus" -> 3, "tfidf_top_terms" -> 3,
    "bm25_search" -> 3, "bloom_join" -> 3,
    "q22_dormant_rich" -> 2,
    "except_all" -> 2, "similarity_topk" -> 2, "filtered_topk" -> 2,
    "dpp_scan" -> 2, "table_profile_approx" -> 2,
    "click_attribution" -> 2, "sql_native_dot" -> 2,
    "neardup_probe" -> 2, "ann_ivf_topk" -> 2,
    "semantic_decon" -> 2, "semantic_decon_probe" -> 2,
    "percentiles_approx" -> 2, "range_join" -> 2, "kmv_distinct" -> 2,
    "bigram_novelty" -> 2, "ngram_repetition" -> 2,
    "decontaminate" -> 2, "fk_violations" -> 2,
    // X75: the corpus feeds both the bucket-stats aggregate and the
    // selection pass — same stats-join-back class as neardup_probe
    "token_budget_mix" -> 2,
    // X77: the same stats-join-back class (percentile bounds + verdict
    // pass)
    "length_outliers" -> 2,
    // X79: the pair stream joins the slim corpus projection once per
    // side (checkpointed pairs never rescan)
    "source_overlap_matrix" -> 2,
    // X81: both scans are BATCH-filtered (verdict projection + the
    // batch scorer fan-out); the corpus is consulted only at build
    "quality_gate_probe" -> 2,
    // X103: the X63 word fan-out + the slim (doc_id, lang) projection
    // — the same stats-join-back class as token_budget_mix
    "bpe_fertility" -> 2)
    // (X87 robots_gate scans the tiny parsed-robots FIXTURE twice —
    // host-rule-count-sized, not a data-scaled table, so the
    // multi-scan audit rightly ignores it)

  test("data-scaled tables are not re-scanned beyond the pinned multi-scan budgets") {
    val scanRe = "file:[^,\\]]*?([a-z_0-9]+)\\.(?:parquet|csv|csv\\.gz)".r
    val bad = plans.flatMap { case (name, p) =>
      val worst = scanRe.findAllMatchIn(p.getOrElse(""))
        .map(_.group(1)).toSeq.filter(scaledTables)
        .groupBy(identity).map(_._2.size).maxOption.getOrElse(0)
      val budget = multiScanBudgets.getOrElse(name, 1)
      if (worst <= budget && (worst > 1 || !multiScanBudgets.contains(name)))
        None
      else if (worst > budget)
        Some(s"$name: a data-scaled table is scanned $worst times, " +
          s"budget $budget — a corpus re-read regressed into the plan")
      else Some(s"$name: scans $worst ≤ 1 — plan improved; drop its " +
        "multiScanBudgets row so the pin stays tight")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
