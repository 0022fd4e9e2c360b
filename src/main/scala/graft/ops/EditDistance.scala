package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.{CkptMemo, Tables}
import Tables.{t, fanOut}

/** X69 — exact edit-distance (Levenshtein) self-join: every document
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
  * lengths ≤ 2·tau) is resolved in a separate short-string bucket —
  * a broadcast nested-loop over strings ≤ 2·tau chars, bounded by the
  * alphabet (at most |Σ|^(2·tau) distinct strings) and empty on this
  * testdata (min doc length 63). Disjoint from the segment path
  * (which handles min length ≥ tau+1), so nothing is double-counted.
  *
  * 100 TB: one corpus scan (the narrow (doc_id, text, len) relation is
  * checkpointed once per session and fans out to the index, probe and
  * verify sides), every stage a keyed shuffle — segments are ~len/9
  * chars, far more selective than tokens, and residual hot segments
  * (boilerplate runs) are AQE skew-split. Candidate mass is
  * output-shaped for the same reason the prefix filter's is: a
  * segment collision IS a 25-char exact overlap at a near-aligned
  * offset. Driver state: none. */
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
  private def docsCkpt(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.of(spark, "edj_docs", dir) {
      fanOut(t(spark, dir, "documents"))
        .select(col("doc_id"), col("text"),
          length(col("text")).cast("int").as("len"))
        .localCheckpoint()
    }

  /** Exact Levenshtein self-join: pairs with ed(text_a, text_b) ≤ tau.
    * Output one row per unordered pair, doc_a < doc_b. */
  def editDistanceJoin(spark: SparkSession, dir: String,
      tau: Int = 8): DataFrame = {
    require(tau >= 1, s"tau must be >= 1, got $tau")
    val parts = tau + 1
    val docs = docsCkpt(spark, dir)

    // ---- segment path: both strings >= tau+1 chars ----------------
    val long = docs.filter(col("len") >= parts)
    val idx = {
      val d = long.select(col("doc_id").as("s_id"), col("text"),
        col("len").as("ls"),
        explode(sequence(lit(0), lit(tau))).as("i"))
      val (pi, li) = segGeom(col("ls"), col("i"), parts)
      d.select(col("s_id"), col("ls"), col("i"),
        col("text").substr(pi + 1, li).as("seg"))
    }
    val probe = {
      val d = long
        .select(col("doc_id").as("r_id"), col("text"),
          col("len").as("lr"),
          // index side is the shorter string: probe lengths
          // [lr−tau, lr], clamped to the segment path's domain
          explode(sequence(greatest(lit(parts), col("len") - tau),
            col("len"))).as("sl"))
        .withColumn("i", explode(sequence(lit(0), lit(tau))))
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
    val candLong = idx.join(probe,
        idx("seg") === probe("sub") && idx("i") === probe("j") &&
          idx("ls") === probe("sl") &&
          (idx("ls") < probe("lr") || idx("s_id") < probe("r_id")))
      .select(least(col("s_id"), col("r_id")).as("id_a"),
        greatest(col("s_id"), col("r_id")).as("id_b"))
      .distinct()

    // ---- short bucket: pairs whose shorter string is ≤ tau chars --
    val shorts = docs.filter(col("len") <= 2 * tau)
    val candShort = broadcast(
        shorts.select(col("doc_id").as("id_a"), col("len").as("la")))
      .join(shorts.select(col("doc_id").as("id_b"), col("len").as("lb")),
        col("id_a") < col("id_b") &&
          least(col("la"), col("lb")) <= tau &&
          abs(col("la") - col("lb")) <= tau)
      .select(col("id_a"), col("id_b"))

    // ---- exact verification on the candidates ---------------------
    candLong.unionByName(candShort)
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
}
