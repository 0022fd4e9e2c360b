package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.{CkptMemo, Tables}
import Tables.{t, fanOut}

/** X71 — exact edit-distance (Levenshtein) self-join: every document
  * pair within `tau` character edits, with NO false negatives — the
  * character-level complement to the token-level exact family
  * ([[Dedup.jaccardPrefixJoin]] / [[Dedup.containmentJoin]]): Jaccard
  * over shingles is blind to within-token typos and to small edits
  * that shift every downstream shingle, which is exactly the regime
  * (OCR noise, template fills, single-field mutations) an
  * edit-distance join exists for.
  *
  * Candidate generation is the partition/pigeonhole reduction of the
  * PassJoin family (Li, Deng & Feng, VLDB 2011 — public algorithm)
  * instead of all-pairs: each INDEXED string s (the shorter side of
  * every candidate pair) is split into `tau+1` balanced contiguous
  * segments. If ed(s, r) ≤ tau, an optimal alignment spends ≤ tau
  * edits across tau+1 segments, so some segment i is untouched
  * (pigeonhole) and appears VERBATIM in r as a substring — candidates
  * are therefore an EQUI-join between index-side segments and
  * probe-side substrings, never a cartesian.
  *
  * The probe windows are bounded, which is what keeps probe fan-out
  * O(tau^3) per string instead of O(tau·|r|): let the untouched
  * segment start at p_i in s and at q = p_i + d in r, let x / y be
  * the edit count strictly before / after the segment, and
  * Δ = |r| − |s| ≥ 0. Then |d| ≤ x (each net position shift costs an
  * indel before the segment) and |Δ − d| ≤ y (the suffix length
  * change is paid after it), so |d| + |Δ − d| ≤ x + y ≤ tau, giving
  * d ∈ [−⌊(tau−Δ)/2⌋, ⌊(tau+Δ)/2⌋] — at most tau+1 start positions
  * per (segment, length) and provably lossless. Probing only index
  * lengths |s| ∈ [|r|−tau, |r|] (ties broken by doc id) generates
  * each unordered pair exactly once.
  *
  * Verification is Spark's built-in banded `levenshtein(l, r, tau)`
  * (codegen'd, O(tau·min-len) per pair, −1 past the bound) on the
  * deduplicated candidates; the DuckDB gate recomputes the join BRUTE
  * FORCE with its own `levenshtein`, so the filter's losslessness is
  * externally checked every run, exactly like the Jaccard prefix
  * filter's contract.
  *
  * Strings shorter than tau+1 characters cannot host tau+1 non-empty
  * segments; any pair involving one (min length ≤ tau forces BOTH
  * lengths ≤ 2·tau) is resolved in a separate short-string bucket over
  * DISTINCT short strings — bounded by the alphabet at |Σ|^(2·tau)
  * entries regardless of corpus size, paired through a partner-length
  * EQUI-join (each distinct string explodes its ≤ 2·tau+1 compatible
  * partner lengths; hash-join on the exploded key), verified with the
  * banded levenshtein at STRING level, and only then fanned back out
  * to doc ids via two text equi-joins (output-shaped: every re-attached
  * pair is already a verified match). No nested-loop join anywhere —
  * the round-11 form broadcast short DOCS (corpus-scaled) on a pure
  * inequality condition and planned a BNLJ, which PlanAuditSpec bans.
  * Disjoint from the segment path (which handles min length ≥ tau+1),
  * so nothing is double-counted; empty on this testdata (min doc
  * length 63).
  *
  * 100 TB: one corpus scan (the narrow (doc_id, text, len) relation is
  * checkpointed once per session and fans out to the index, probe and
  * verify sides), every stage a keyed shuffle — segments are ~len/9
  * chars, far more selective than tokens, and residual hot segments
  * (boilerplate runs) are AQE skew-split. Candidate mass is
  * output-shaped for the same reason the prefix filter's is: a
  * segment collision IS a 25-char exact overlap at a near-aligned
  * offset. Driver state: none. The SERVING split
  * ([[editDistanceBuildIndex]] / [[editDistanceProbe]]) persists the
  * segment relation so a daily batch probes in batch-proportional
  * work plus streaming index scans, the [[Dedup.setSimBuildIndex]]
  * operating shape. */
object EditDistance {

  /** Balanced-partition arithmetic shared by the index and probe
    * sides: for a string of length `sl` split into `parts` segments,
    * segment i (0-based) has length `base + (i ≥ parts−k ? 1 : 0)`
    * and 0-based start `i·base + max(0, i − (parts−k))` where
    * k = sl mod parts, base = sl div parts — lengths differ by at
    * most one and the long segments sit at the tail, so both engines
    * of a (segment, substring) match compute identical offsets. */
  private def segGeom(sl: Column, i: Column, parts: Int)
      : (Column, Column) = {
    val k = pmod(sl, lit(parts))
    val base = floor(sl / lit(parts)).cast("int")
    val li = base + when(i >= lit(parts) - k, lit(1)).otherwise(lit(0))
    val pi = i * base + greatest(lit(0), i - (lit(parts) - k))
    (pi, li)
  }

  /** The checkpointed (doc_id, text, len) relation — one corpus scan
    * feeds the index, probe and verification branches (the multi-scan
    * budget lesson of jaccard_prefix_join, round 10). */
  // the memo key carries the corpus LISTING TAG (the qgate_base
  // lesson, now a failing IndexFreshnessSpec contract): a mid-session
  // corpus change re-keys the `_SUCCESS` index dir, and an untagged
  // memo would fill the FRESH dir with YESTERDAY'S checkpointed docs
  private def docsCkpt(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.of(spark, "edj_docs", dir,
        Tables.listingTag(spark, s"$dir/documents.parquet")) {
      fanOut(t(spark, dir, "documents"))
        .select(col("doc_id"), col("text"),
          length(col("text")).cast("int").as("len"))
        .localCheckpoint()
    }

  /** Index-side segment relation (s_id, ls, i, seg) over a
    * (doc_id, text, len) input restricted to len ≥ tau+1 — tau+1
    * balanced segments per string, the equi-join key side of the
    * PassJoin reduction. Shared by the self-join and the persisted
    * index build. */
  private def segmentsOf(docs: DataFrame, tau: Int): DataFrame = {
    val parts = tau + 1
    val d = docs.filter(col("len") >= parts)
      .select(col("doc_id").as("s_id"), col("text"),
        col("len").as("ls"),
        explode(sequence(lit(0), lit(tau))).as("i"))
    val (pi, li) = segGeom(col("ls"), col("i"), parts)
    d.select(col("s_id"), col("ls"), col("i"),
      col("text").substr(pi + 1, li).as("seg"))
  }

  /** Probe-side substring windows (r_id, lr, sl, j, sub) over a
    * (doc_id, text, len) input restricted to len ≥ tau+1: for every
    * candidate index length sl ∈ [max(tau+1, lr−tau), lr] and segment
    * j, the scaladoc lemma's ≤ tau+1 start positions. `slRestrict`
    * (a 1-column (sl) relation, broadcast) prunes the exploded
    * lengths before the segment/position fan-out — the probe path's
    * way of generating corpus-side windows ONLY for lengths actually
    * present in the incoming batch. */
  private def probeSubstrings(docs: DataFrame, tau: Int,
      slRestrict: Option[DataFrame] = None): DataFrame = {
    val parts = tau + 1
    val exploded = docs.filter(col("len") >= parts)
      .select(col("doc_id").as("r_id"), col("text"),
        col("len").as("lr"),
        explode(sequence(greatest(lit(parts), col("len") - tau),
          col("len"))).as("sl"))
    val restricted = slRestrict.fold(exploded)(r =>
      exploded.join(broadcast(r), Seq("sl"), "left_semi"))
    val d = restricted.withColumn("i", explode(sequence(lit(0), lit(tau))))
    val (pi, li) = segGeom(col("sl"), col("i"), parts)
    val delta = col("lr") - col("sl") // ≥ 0 by construction
    // d ∈ [−⌊(tau−Δ)/2⌋, ⌊(tau+Δ)/2⌋] (scaladoc lemma), clamped to
    // valid substring starts
    val lo = greatest(lit(0), pi - floor((lit(tau) - delta) / 2))
    val hi = least(col("lr") - li, pi + floor((lit(tau) + delta) / 2))
    d.withColumn("lo", lo.cast("int")).withColumn("hi", hi.cast("int"))
      .withColumn("li", li)
      .filter(col("lo") <= col("hi"))
      .withColumn("p", explode(sequence(col("lo"), col("hi"))))
      .select(col("r_id"), col("lr"), col("sl"), col("i").as("j"),
        col("text").substr(col("p") + 1, col("li")).as("sub"))
  }

  /** Short-string candidate pairs (id_a < id_b) over a
    * (doc_id, text, len) relation: every unordered doc pair whose
    * shorter string is ≤ tau chars (both ≤ 2·tau by the band), via
    * the alphabet-bounded distinct-string reduction the class doc
    * describes. Pairs are VERIFIED (banded levenshtein at string
    * level) before doc-id fan-out, so the returned pairs are final
    * matches, not candidates — re-verification downstream is a no-op
    * kept for plan uniformity. */
  private def shortStringPairs(docs: DataFrame, tau: Int): DataFrame = {
    val shortDocs = docs.filter(col("len") <= 2 * tau)
      .select(col("doc_id"), col("text"), col("len"))
    val strs = shortDocs.select(col("text"), col("len")).distinct()
    val sa = strs.select(col("text").as("ta"), col("len").as("la"))
      .withColumn("lb", explode(sequence(
        greatest(lit(0), col("la") - tau),
        least(lit(2 * tau), col("la") + tau))))
      .filter(least(col("la"), col("lb")) <= tau)
    // each unordered string pair {ta, tb} arrives exactly once under
    // ta ≤ tb (the swapped row fails the inequality); ta = tb is the
    // identical-string case (ed 0) and stays
    val sPairs = sa.join(strs.select(col("text").as("tb"),
        col("len").as("lb")), Seq("lb"))
      .filter(col("ta") <= col("tb") &&
        levenshtein(col("ta"), col("tb"), tau) >= 0)
      .select(col("ta"), col("tb"))
    sPairs
      .join(shortDocs.select(col("doc_id").as("id_a"),
        col("text").as("ta")), Seq("ta"))
      .join(shortDocs.select(col("doc_id").as("id_b"),
        col("text").as("tb")), Seq("tb"))
      // ta < tb: every doc pairing counts once (ids normalized below);
      // ta = tb: the text self-join yields both orders — keep one
      .filter(col("ta") < col("tb") || col("id_a") < col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
  }

  /** Pre-verification candidate pairs (id_a < id_b): segment-path
    * collisions ∪ the short bucket, deduplicated — exposed
    * package-private for the candidate-mass gate (CandidateMassSpec:
    * the "collisions are output-shaped" scale claim must be a failing
    * test, not a notes table). */
  private[graft] def editDistanceCandidatePairs(spark: SparkSession,
      dir: String, tau: Int): DataFrame = {
    require(tau >= 1, s"tau must be >= 1, got $tau")
    val docs = docsCkpt(spark, dir)
    // ---- segment path: both strings >= tau+1 chars ----------------
    val idx = segmentsOf(docs, tau)
    val probe = probeSubstrings(docs, tau)
    val candLong = idx.join(probe,
        idx("seg") === probe("sub") && idx("i") === probe("j") &&
          idx("ls") === probe("sl") &&
          (idx("ls") < probe("lr") || idx("s_id") < probe("r_id")))
      .select(least(col("s_id"), col("r_id")).as("id_a"),
        greatest(col("s_id"), col("r_id")).as("id_b"))
      .distinct()
    // ---- short bucket: pairs whose shorter string is ≤ tau chars --
    candLong.unionByName(shortStringPairs(docs, tau))
  }

  /** Exact Levenshtein self-join: pairs with ed(text_a, text_b) ≤ tau.
    * Output one row per unordered pair, doc_a < doc_b. */
  def editDistanceJoin(spark: SparkSession, dir: String,
      tau: Int = 8): DataFrame = {
    val docs = docsCkpt(spark, dir)
    // ---- exact verification on the candidates ---------------------
    editDistanceCandidatePairs(spark, dir, tau)
      .join(docs.select(col("doc_id").as("id_a"), col("text").as("ta"),
        col("len").as("la")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("text").as("tb"),
        col("len").as("lb")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("ta"), col("tb"), tau))
      .filter(col("dist") >= 0)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("la").cast("long").as("len_a"),
        col("lb").cast("long").as("len_b"),
        col("dist").cast("long").as("dist"))
      .orderBy("doc_a", "doc_b")
  }

  /** X71-scale — persisted EDIT-DISTANCE segment index, the serving
    * split of [[editDistanceJoin]] (the [[Dedup.setSimBuildIndex]]
    * pattern): the corpus's narrow doc relation (`docs/`: doc_id,
    * text, len) and its PassJoin segment relation (`seg/`: s_id, ls,
    * i, seg — tau+1 rows per doc) are computed once off the
    * session-memoized checkpoint and persisted, `_SUCCESS`-gated per
    * (sf dir, tau, source listing fingerprint). A daily pipeline must
    * not re-run the full segment self-join per incoming batch; with
    * the index, an increment probes in batch-proportional work plus
    * streaming index scans. */
  def editDistanceBuildIndex(spark: SparkSession, dir: String,
      tau: Int = 8): String = {
    val out = s"target/graft_editdist/${Tables.pathTag(dir)}_tau${tau}_" +
      Tables.listingTag(spark, s"$dir/documents.parquet")
    if (!Tables.successExists(spark, s"$out/docs") ||
        !Tables.successExists(spark, s"$out/seg")) {
      val docs = docsCkpt(spark, dir)
      docs.write.mode("overwrite").parquet(s"$out/docs")
      segmentsOf(docs, tau).write.mode("overwrite").parquet(s"$out/seg")
    }
    out
  }

  /** The probe's two base relations — the batch slice of the memoized
    * doc checkpoint and the index's corpus complement — defined ONCE
    * here for both the candidate stream and the verification joins
    * (review r13: each caller previously rebuilt them). */
  private def probeRelations(spark: SparkSession, dir: String,
      idx: String, batchMod: Int): (DataFrame, DataFrame) = {
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    (docsCkpt(spark, dir).filter(isBatch),
      spark.read.parquet(s"$idx/docs").filter(!isBatch))
  }

  /** The probe's pre-verification CANDIDATE stream (both PassJoin
    * directions + the short bucket, distinct cross pairs) — split out
    * so CandidateMassSpec can pin its output-shaped claim exactly
    * like the self-join's (VERDICT r12 item 8). */
  private[graft] def editDistanceProbeCandidatePairs(spark: SparkSession,
      dir: String, tau: Int = 8, batchMod: Int = 7,
      idxOpt: Option[String] = None): DataFrame = {
    require(tau >= 1, s"tau must be >= 1, got $tau")
    val parts = tau + 1
    val idx = idxOpt.getOrElse(editDistanceBuildIndex(spark, dir, tau))
    val (batch, corpusDocs) = probeRelations(spark, dir, idx, batchMod)
    val corpusSeg = spark.read.parquet(s"$idx/seg")
      .filter(pmod(col("s_id"), lit(batchMod)) =!= 0)

    // direction 1: corpus doc not longer — batch substrings probe the
    // persisted corpus segments (ls = sl ≤ lr covers the equal-length
    // tie, so direction 2 stays strict and no pair arrives twice
    // across directions)
    val d1 = corpusSeg.join(probeSubstrings(batch, tau),
        corpusSeg("seg") === col("sub") && corpusSeg("i") === col("j") &&
          corpusSeg("ls") === col("sl"))
      .select(col("r_id").as("new_doc"), col("s_id").as("corpus_doc"))

    // direction 2: batch doc strictly shorter — corpus substring
    // windows (restricted to the batch's distinct lengths) probe the
    // broadcast batch segments
    val batchLens = batch.filter(col("len") >= parts)
      .select(col("len").as("sl")).distinct()
    val corpusSubs = probeSubstrings(corpusDocs, tau, Some(batchLens))
      .filter(col("sl") < col("lr"))
    val batchSeg = segmentsOf(batch, tau)
    val d2 = batchSeg.join(corpusSubs,
        batchSeg("seg") === col("sub") && batchSeg("i") === col("j") &&
          batchSeg("ls") === col("sl"))
      .select(col("s_id").as("new_doc"), col("r_id").as("corpus_doc"))

    // short bucket: batch shorts × corpus shorts via partner-length
    // equi-join (batch side tiny — candidates only, verified below)
    val bShort = batch.filter(col("len") <= 2 * tau)
      .select(col("doc_id").as("b_id"), col("len").as("la"))
      .withColumn("lb", explode(sequence(
        greatest(lit(0), col("la") - tau),
        least(lit(2 * tau), col("la") + tau))))
      .filter(least(col("la"), col("lb")) <= tau)
    val dShort = bShort.join(
        corpusDocs.filter(col("len") <= 2 * tau)
          .select(col("doc_id").as("c_id"), col("len").as("lb")),
        Seq("lb"))
      .select(col("b_id").as("new_doc"), col("c_id").as("corpus_doc"))

    d1.unionByName(d2).unionByName(dShort).distinct()
  }

  /** X71b — INCREMENTAL edit-distance probe: every (batch doc, corpus
    * doc) pair within `tau` edits, computed against the persisted
    * [[editDistanceBuildIndex]] without re-pairing the corpus. The
    * batch is the `doc_id % batchMod == 0` slice (the [[Dedup
    * .neardupProbe]] convention); index rows standing in for the
    * already-ingested corpus are the complement.
    *
    * PassJoin indexes the SHORTER side of a pair, so the probe runs
    * both directions and unions:
    *  - corpus-shorter-or-equal: batch-side substring windows (tiny —
    *    batch-proportional fan-out) equi-join the PERSISTED corpus
    *    segments in one streaming index scan, batch side broadcast
    *    under AQE — zero index-side shuffle;
    *  - batch-strictly-shorter: batch SEGMENTS (tau+1 rows per batch
    *    doc, broadcast) equi-join corpus substring windows generated
    *    on the fly in one streaming pass of the index's doc relation,
    *    with the exploded candidate lengths semi-joined against the
    *    broadcast distinct batch lengths BEFORE the O(tau^2)
    *    segment/position fan-out — corpus rows near no batch length
    *    cost one explode row each, and nothing corpus-sized shuffles.
    * The short-string bucket (min length ≤ tau) is a partner-length
    * equi-join of the tiny batch short slice against the corpus short
    * slice. Verification attaches batch text by broadcast and corpus
    * text in one more streaming scan, then applies the banded
    * `levenshtein(·,·,tau)` exactly like the self-join; the DuckDB
    * gate brute-forces the cross-pair join, so losslessness of both
    * probe directions is externally checked every run.
    *
    * Output (new_doc, corpus_doc, len_a, len_b, dist), one row per
    * cross pair. */
  def editDistanceProbe(spark: SparkSession, dir: String,
      tau: Int = 8, batchMod: Int = 7): DataFrame = {
    // validate BEFORE the index build: an invalid tau must not write
    // a permanent `_SUCCESS`-gated garbage store (review r13)
    require(tau >= 1, s"tau must be >= 1, got $tau")
    val idx = editDistanceBuildIndex(spark, dir, tau)
    val (batch, corpusDocs) = probeRelations(spark, dir, idx, batchMod)
    editDistanceProbeCandidatePairs(spark, dir, tau, batchMod, Some(idx))
      .join(batch.select(col("doc_id").as("new_doc"),
        col("text").as("ta"), col("len").as("la")), Seq("new_doc"))
      .join(corpusDocs.select(col("doc_id").as("corpus_doc"),
        col("text").as("tb"), col("len").as("lb")), Seq("corpus_doc"))
      .withColumn("dist", levenshtein(col("ta"), col("tb"), tau))
      .filter(col("dist") >= 0)
      .select(col("new_doc"), col("corpus_doc"),
        col("la").cast("long").as("len_a"),
        col("lb").cast("long").as("len_b"),
        col("dist").cast("long").as("dist"))
      .orderBy("new_doc", "corpus_doc")
  }
}
