package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables.{t, fanOut}
import graft.functions.CentroidAgg

/** X4/X17 — similarity search + embedding aggregation over the
  * `embeddings` table (vec_id, embedding: array<float>, label).
  *
  * All vector math uses codegen'd higher-order functions (`zip_with` +
  * `aggregate` sequential fold) — no UDFs — and casts each float to
  * double BEFORE multiplying so the DuckDB oracle
  * (`list_dot_product(CAST(.. AS DOUBLE[])`, also a sequential fold)
  * produces bit-identical IEEE doubles. */
object Similarity {

  /** Sequential-fold dot product of two array<float> columns in double:
    * the native codegen'd expression ([[graft.expressions.FloatDot]] —
    * one fused loop inside whole-stage codegen, no intermediate zipped
    * array). Bit-identical to [[dotHof]], asserted in SimilaritySpec. */
  def dot(a: Column, b: Column): Column = graft.expressions.FloatDot(a, b)

  /** The pure-builtin formulation of [[dot]] (interpreted HOF lambdas);
    * kept as the reference semantics the native expression must match. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Embedding rows admissible for cosine scoring: non-null,
    * non-empty, finite, with a nonzero component (⇔ norm > 0). Under
    * ANSI SQL (the session default) a SINGLE all-zero row turns every
    * norm division into a job-killing DIVIDE_BY_ZERO at corpus scale,
    * and a NaN component poisons score comparisons (Spark orders NaN
    * above every real, so a NaN cosine would "clear" any threshold).
    * Degenerate rows carry no direction, so every scoring operator
    * EXCLUDES them at the read (pinned by HostileEmbeddingsSpec);
    * inspection operators (quantize, stats) keep them. The oracle
    * corpora contain none, so gate semantics are unchanged. */
  private[graft] def scorableEmb(df: DataFrame): DataFrame = {
    // one native codegen'd fold decides all five cases: null → null
    // (filtered), empty/all-zero → 0, any-NaN → NaN (Spark orders NaN
    // above every real, hence the explicit isnan leg), any-±Inf → Inf
    // (a cosine against an Inf-norm vector is NaN, which would then
    // outrank every real score — the upper bound closes that door);
    // codegen CSE shares the fold between the predicate legs
    val sq = dot(col("embedding"), col("embedding"))
    df.where(sq > 0.0 && !isnan(sq) &&
      sq < lit(Double.PositiveInfinity))
  }

  /** X4 — brute-force cosine top-k: the correctness baseline.
    *
    * Scale design: the query set is small and BROADCAST (size-bounded by
    * construction, unlike a data-scaled table); candidates stream
    * through a broadcast nested-loop join scoring each (query,
    * candidate) pair once — cost O(|C|·|Q|), no shuffle of the candidate
    * side. Top-k lands on a window over q_id (|Q| partitions). For
    * data-scaled query sets switch to [[lshCandidates]]. */
  def cosineTopK(spark: SparkSession, dir: String, k: Int = 10,
      nQueries: Int = 8,
      candidatePred: Column = lit(true)): DataFrame = {
    val emb = fanOut(scorableEmb(t(spark, dir, "embeddings")))
    // Norms are precomputed per ROW before the pair join — computing
    // them inside `cosine` would redo both 64-element folds once per
    // (query, candidate) pair, tripling the scoring work. Same
    // arithmetic per vector (sqrt of the same sequential fold), so
    // scores stay bit-identical to the oracle's. `candidatePred`
    // restricts the CANDIDATE side only (queries stay unfiltered) —
    // the constant-true default folds away in the optimizer.
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        l2norm(col("embedding")).as("q_nrm"))
    val cands = emb.filter(candidatePred)
      .select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
    scoreTopK(cands.crossJoin(broadcast(queries)), k)
  }

  /** Shared scoring tail of the top-k family: exact cosine from the
    * precomputed norms, per-query `row_number` ranking (ties by
    * vec_id), keep k. ONE definition on purpose — the pinned
    * ivfProbeTopK ≡ ivfTopK row-for-row parity depends on the
    * tie-break and projection staying identical. Input needs columns
    * (q_id, q_emb, q_nrm, vec_id, embedding, nrm). Package-visible so
    * [[Multimodal.mediaEmbedTopK]] ranks its decoded media embeddings
    * with the SAME scoring tail. */
  private[ops] def scoreTopK(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    cand
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score",
        dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("score"),
        col("rn").cast("int").as("rn"))
      .orderBy("q_id", "rn")
  }

  /** X4 scale path — deterministic random-hyperplane LSH bucketing,
    * OR-amplified across hash tables.
    *
    * Signature for one table: bit j is the sign of a pseudo-random
    * projection whose "plane" coefficients derive from
    * `md5_32("hp:table:j:element index")` (`Tables.md5Long32` — the
    * engine's one cross-engine hash, so the DuckDB gate recomputes the
    * full pipeline) — deterministic, no stored model, identical on
    * every executor. Vectors are ANN candidates if
    * they share a bucket in ANY of the `nTables` tables (OR-amplification
    * recovers the recall a single AND-of-bits table lacks); each table's
    * self-join is an equi shuffle on (table, bucket) with fan-out bounded
    * by bucket size — never all-pairs. Recall vs [[cosineTopK]] is
    * asserted in SimilaritySpec; nBits (bucket granularity) × nTables
    * (recall) is the cost/recall knob. */
  def signature(e: Column, nBits: Int, table: Int = 0): Column = {
    import graft.util.Tables.md5Long32
    val bits = (0 until nBits).map { j =>
      // projection_j = Σ_i coef(table,j,i) · e[i], coef in [-0.5, 0.5).
      // The index sequence is sized from the row's own array, so any
      // embedding dimension works (a hardcoded dim would silently
      // truncate longer vectors or null-pad shorter ones into bucket 0).
      val proj = aggregate(
        zip_with(e, sequence(lit(0), size(e) - 1), (x, i) =>
          x.cast("double") *
            ((pmod(md5Long32(concat_ws(":", lit("hp"), lit(table),
              lit(j), i)), lit(1000000L))
              .cast("double") / 1000000.0) - 0.5)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** The FIRST-CLASS embedding near-dup query: LSH candidate generation
    * ([[lshCandidates]]) followed by exact cosine rescoring and a
    * threshold. Precision is exact by construction — every returned pair
    * is rescored with the same [[dot]]/[[l2norm]] arithmetic as the
    * brute-force twin, so the scores are bit-identical doubles — and the
    * only approximation is recall (pairs whose vectors never share a
    * bucket are missed), tuned by nBits × nTables and asserted against
    * [[cosinePairs]] in SimilaritySpec. The md5-derived plane
    * coefficients are DuckDB-recomputable, so the gate replays the
    * whole pipeline (signatures → bands → candidates → exact verify)
    * and this query is fully hash-checked. */
  def lshPairs(spark: SparkSession, dir: String, threshold: Double = 0.4,
      nBits: Int = 8, nTables: Int = 8): DataFrame =
    lshCandidates(spark, dir, nBits, nTables)
      .filter(col("score") > threshold)
      .orderBy("a", "b")

  /** Precondition: `vec_id` is unique (it is the vector's key, as in
    * the testdata) — the id-only pair dedup + join-back relies on it;
    * duplicate ids would multiply pair rows where the payload-carrying
    * form collapsed them with first(). */
  def lshCandidates(spark: SparkSession, dir: String, nBits: Int = 8,
      nTables: Int = 8): DataFrame = {
    val emb = fanOut(scorableEmb(t(spark, dir, "embeddings")))
      .select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
    // (table, bucket, vec_id): one row per vector per hash table. All
    // nTables signatures come from ONE fused codegen loop
    // ([[graft.expressions.HyperplaneSigs]], bit-identical to the HOF
    // [[signature]] — SimilaritySpec) instead of nBits × nTables
    // interpreted lambda folds per row. The bucket stream carries ONLY
    // ids: candidate fan-out is bucket-occupancy-quadratic, so vector
    // payloads (dim×4B each) must ride the per-VECTOR relations, never
    // the per-CANDIDATE stream — carrying embeddings through the pair
    // join + dedup measured a 10×-corpus shuffle of ~3 GB vs ~10 MB for
    // the id-only form (SCALE_NOTES round 5).
    val buckets = emb
      .select(col("vec_id"),
        posexplode(graft.expressions.HyperplaneSigs(
          col("embedding"), nBits, nTables)).as(Seq("tb", "bucket")))
    val pairIds = buckets.select(col("tb"), col("bucket"),
        col("vec_id").as("a"))
      .join(buckets.select(col("tb"), col("bucket"), col("vec_id").as("b")),
        Seq("tb", "bucket"))
      .filter(col("a") < col("b"))
      // dedup pairs surfaced by several tables BEFORE scoring: one
      // shuffle on (a,b), each survivor scored exactly once
      .select("a", "b").distinct()
    // equi-join the vectors back per side (n-row shuffles of the
    // embedding relation, candidate-count-independent) and score once
    pairIds
      .join(emb.select(col("vec_id").as("a"), col("embedding").as("ea"),
        col("nrm").as("na")), Seq("a"))
      .join(emb.select(col("vec_id").as("b"), col("embedding").as("eb"),
        col("nrm").as("nb")), Seq("b"))
      .withColumn("score", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .select("a", "b", "score")
  }

  /** X4c — IVF-style ANN: coarse-quantize vectors into centroid cells,
    * then search only the query's nProbe closest cells.
    *
    * The coarse codebook is BOUNDED at `maxCells` entries — the fixed
    * serving constant every IVF deployment picks at build time — by
    * folding labels into cells (`pmod(label, maxCells)`) before the
    * [[CentroidAgg]] centroid pass ([[coarseCodebook]]). Bounding is
    * what keeps the per-vector routing term (argmax over cell dots)
    * O(n·maxCells) = O(n): with an unbounded per-label codebook a
    * corpus whose label count grows with n makes routing n×nCells ∝ n²
    * (measured 8.88× time growth on 10× data, SCALE_NOTES round 5 —
    * bounding cleared it). nProbe/maxCells stays the recall/cost knob.
    * Candidate generation is an equi-join on the cell id (probed cells
    * exploded on the query side), so the shuffle is keyed and bounded
    * by cell population — the IVF shape used at 100 TB.
    * Correctness is anchored in SimilaritySpec: probing ALL cells must
    * reproduce the brute-force top-k exactly (true for ANY codebook:
    * every vector lands in exactly one cell). */
  def ivfTopK(spark: SparkSession, dir: String, k: Int = 10,
      nQueries: Int = 8, nProbe: Int = 2,
      codebook: Option[Seq[(Int, Seq[Double])]] = None,
      maxCells: Int = 16,
      candidatePred: Column = lit(true)): DataFrame = {
    import spark.implicits._
    // CentroidAgg's double-sum accumulates in task-merge order, so two
    // computations of the codebook can differ by ulps — enough to flip
    // a routing TIE. The optional `codebook` lets callers (the
    // probe-parity spec) pin one realization; the registered query
    // recomputes, which is the inline operator's contract.
    val cells: Seq[(Int, Seq[Double])] = codebook.getOrElse(
      coarseCodebook(spark, dir, maxCells)
        .select("cell", "centroid").as[(Int, Seq[Double])].collect().toSeq)
    // nProbe beyond the cell count would make the probe slice start at
    // <=0 (error, or Spark's from-the-end semantics silently probing
    // ONE cell); clamp to "probe everything".
    val probeN = math.min(nProbe, cells.size)
    // Cell scoring is a heuristic ROUTE (which cells to probe / which
    // cell owns a vector), not part of the returned scores — so the
    // codebook is downcast to float and scored with the codegen'd
    // [[dot]] loop instead of an interpreted HOF fold per (row, cell).
    // Returned top-k scores still use the exact double path below.
    val assignCell = argmaxCell(cells, col("embedding"))
    val probes = slice(
      array_sort(array(cellDotStructs(cells, col("q_emb")): _*)),
      lit(cells.size - probeN + 1), lit(probeN))
    val emb = fanOut(scorableEmb(t(spark, dir, "embeddings")))
      .select(col("vec_id"), col("embedding"), col("label"),
        l2norm(col("embedding")).as("nrm"))
      .withColumn("cell", assignCell)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
      .withColumn("cell", explode(transform(probes, p => p.getField("cell"))))
    // candidatePred restricts the CANDIDATE side only (queries stay
    // unfiltered), mirroring cosineTopK — the filteredProbeTopK parity
    // depends on both paths filtering identically
    scoreTopK(queries.join(emb.filter(candidatePred), Seq("cell")), k)
  }

  /** Per-cell (float-dot score, cell id) structs — the shared routing
    * formula of [[ivfTopK]] and [[ivfBuildIndex]]: codebook downcast
    * to float, scored by the codegen'd [[dot]] loop (a heuristic
    * route, not a returned score). */
  private def cellDotStructs(cells: Seq[(Int, Seq[Double])],
      e: Column): Seq[Column] =
    cells.map { case (id, c) =>
      struct(
        dot(e, typedLit(c.map(_.toFloat))).as("score"),
        lit(id).as("cell"))
    }

  /** Argmax cell id for a vector — `greatest` over the per-cell dot
    * structs, except that `greatest` requires ≥2 arguments: a
    * single-cell codebook (maxCells=1, or a corpus whose labels fold
    * into one cell) degenerates to that cell unconditionally. Past
    * [[graft.expressions.CellRoute.MaxExprCells]] cells the composed
    * form's plan size (one dot-struct subtree per cell) starts to
    * dominate — optimizer max-iteration warnings, codegen bloat — so
    * large codebooks route through the native [[graft.expressions
    * .CellRoute]] fused loop instead (bit-identical; spec-pinned). */
  private def argmaxCell(cells: Seq[(Int, Seq[Double])],
      e: Column): Column = {
    // zero cells reaches greatest() with no args (AnalysisException) —
    // reachable via ivfAppendedIndex when the corpus slice is empty
    // (e.g. appendMod = 1); fail with the real cause instead
    require(cells.nonEmpty,
      "empty codebook: the corpus used to build it has no rows")
    if (cells.size == 1) lit(cells.head._1)
    else if (cells.size <= graft.expressions.CellRoute.MaxExprCells)
      greatest(cellDotStructs(cells, e): _*).getField("cell")
    else graft.expressions.CellRoute(e, cells)
  }

  /** The bounded coarse codebook shared by [[ivfTopK]] and
    * [[ivfBuildIndex]]: at most `maxCells` cells, ids
    * `pmod(label, maxCells)`, one [[CentroidAgg]] centroid per cell.
    * When distinct labels ≤ maxCells (the testdata's 10 labels) this
    * is exactly the per-label codebook; past the bound, labels fold
    * together and the centroid pass stays ONE corpus scan either way.
    * The bound is the scale invariant: codebook size — and with it the
    * per-vector routing cost and the `greatest(...)` expression tree
    * fed to codegen — never grows with the corpus. Order-free agg +
    * single-partition sort, same rationale as [[centroidCore]]. */
  def coarseCodebook(spark: SparkSession, dir: String,
      maxCells: Int): DataFrame =
    coarseCodebookFor(t(spark, dir, "embeddings"), maxCells)

  /** [[coarseCodebook]] over an arbitrary (label, embedding) corpus —
    * lets [[ivfAppend]] build its codebook from the pre-append corpus
    * only (the production contract: appends never move centroids). */
  def coarseCodebookFor(emb: DataFrame, maxCells: Int): DataFrame = {
    require(maxCells > 0, s"maxCells must be positive, got $maxCells")
    // degenerate rows (null/empty/zero/NaN) carry no direction and
    // must not pull a centroid — same admission rule as scoring
    scorableEmb(emb)
      .groupBy(pmod(col("label"), lit(maxCells)).cast("int").as("cell"))
      .agg(CentroidAgg.centroid(64)(col("embedding")).as("centroid"))
      .coalesce(1).sortWithinPartitions("cell")
  }

  /** X4c-scale — persisted IVF index, the SERVING split of [[ivfTopK]].
    * Build once: the codebook table plus every vector written
    * PARTITIONED BY its assigned cell (with its precomputed norm).
    * The assign-each-vector-to-a-cell routing term — the n×nCells
    * cost that dominates ivfTopK's measured scale growth — is paid
    * here ONCE and amortized over every probe. Returns the index
    * path; `_SUCCESS`-gated per (sf dir, source fingerprint) like the
    * layout stores, so a testdata refresh self-invalidates. */
  def ivfBuildIndex(spark: SparkSession, dir: String,
      maxCells: Int = 16): String = {
    import spark.implicits._
    // maxCells is part of the index identity: two builds with different
    // bounds produce different codebooks (and cell layouts), so they
    // must never share a cache directory. The `v2` component versions
    // the STORE SCHEMA (v2 carries the label metadata column for
    // filtered probes) — the listing tag only tracks source changes,
    // so a layout change must bump this or stale caches would serve
    // the old schema.
    val out = s"target/graft_ann/ivf_v2_${graft.util.Tables.pathTag(dir)}_" +
      graft.util.Tables.listingTag(spark, s"$dir/embeddings.parquet") +
      s"_c$maxCells"
    def ok(sub: String): Boolean =
      graft.util.Tables.successExists(spark, s"$out/$sub")
    if (!ok("codebook") || !ok("cells")) {
      // sweep superseded-schema stores (pre-v2 `ivf_<tag>`): nothing
      // else ever deletes them, and each holds a full corpus copy
      val annRoot = java.nio.file.Paths.get("target/graft_ann")
      if (java.nio.file.Files.exists(annRoot)) {
        val ls = java.nio.file.Files.list(annRoot)
        try ls.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .filter { p =>
            val n = p.getFileName.toString
            n.startsWith("ivf_") && !n.startsWith("ivf_v2_")
          }.foreach(graft.util.Scratch.deleteRecursive)
        finally ls.close()
      }
      coarseCodebook(spark, dir, maxCells).select("cell", "centroid")
        .write.mode("overwrite").parquet(s"$out/codebook")
      // Collect the codebook BACK FROM THE WRITTEN PARQUET, not by
      // re-executing the aggregation: CentroidAgg's double sums merge
      // in task order, so a second run can differ by ulps and assign a
      // near-tie vector to a different cell than the persisted
      // codebook (the one probes route with) would.
      val cells: Seq[(Int, Seq[Double])] = spark.read
        .parquet(s"$out/codebook").select("cell", "centroid")
        .as[(Int, Seq[Double])].collect().toSeq
      val assignCell = argmaxCell(cells, col("embedding"))
      // label rides along in the store: filtered probes prune on the
      // metadata INSIDE the index scan (real filtered-ANN indexes
      // carry their filterable attributes for exactly this reason)
      fanOut(scorableEmb(t(spark, dir, "embeddings")))
        .select(col("vec_id"), col("embedding"), col("label"),
          l2norm(col("embedding")).as("nrm"))
        .withColumn("cell", assignCell)
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$out/cells")
    }
    out
  }

  /** Probe the persisted index: route the query batch against the
    * collected codebook DRIVER-side (nQueries×nCells flops — the
    * query set is driver-resident in any serving path), then read
    * ONLY the probed cell directories (static partition pruning on
    * `cell`) and score. Routing replicates the in-plan float-dot
    * arithmetic of [[ivfTopK]] exactly (double accumulator over
    * float products, ties by cell id), so SimilaritySpec can pin
    * probe ≡ ivfTopK row-for-row. */
  def ivfProbeTopK(spark: SparkSession, dir: String, k: Int = 10,
      nQueries: Int = 8, nProbe: Int = 2, maxCells: Int = 16): DataFrame =
    probeIndexPath(spark, ivfBuildIndex(spark, dir, maxCells), dir, k,
      nQueries, nProbe)

  /** The probe against an EXPLICIT index path — shared by
    * [[ivfProbeTopK]] (the `_SUCCESS`-gated build cache),
    * [[ivfAppend]] (a per-run appended store) and
    * [[filteredProbeTopK]] (metadata-filtered serving), so all serve
    * with byte-identical routing and scoring. `candidatePred` is
    * applied to the index scan AFTER the static cell pruning — the
    * filter and the partition pruning compose. */
  def probeIndexPath(spark: SparkSession, idx: String, dir: String,
      k: Int, nQueries: Int, nProbe: Int,
      candidatePred: Column = lit(true)): DataFrame = {
    import spark.implicits._
    val cells: Seq[(Int, Seq[Double])] = spark.read
      .parquet(s"$idx/codebook").select("cell", "centroid")
      .as[(Int, Seq[Double])].collect().toSeq
    val probeN = math.min(nProbe, cells.size)
    // query batch with exact in-plan norms (one bounded job)
    val qs: Seq[(Long, Seq[Float], Double)] =
      scorableEmb(t(spark, dir, "embeddings")).filter(col("vec_id") < nQueries)
        .select(col("vec_id"), col("embedding"),
          l2norm(col("embedding")).as("nrm"))
        .as[(Long, Seq[Float], Double)].collect().toSeq
    // FloatDot semantics by construction: the routing score IS the
    // FloatDot expression evaluated driver-side ([[FloatDot.evalDot]],
    // its interpreted nullSafeEval loop) over the same float-downcast
    // codebook the in-plan route uses — one source of truth, so a
    // FloatDot change can never silently break the spec-pinned
    // probe ≡ inline parity. The downcast is hoisted out of the
    // (query × cell) loop: one conversion per cell, not per pair.
    val fcells: Seq[(Int, Seq[Float])] =
      cells.map { case (id, c) => (id, c.map(_.toFloat)) }
    val routes: Seq[(Long, Int)] = qs.flatMap { case (qId, qEmb, _) =>
      fcells.map { case (id, fc) =>
        (graft.expressions.FloatDot.evalDot(qEmb, fc), id)
      }.sorted.takeRight(probeN).map { case (_, id) => (qId, id) }
    }
    val probedCells = routes.map(_._2).distinct
    val store = spark.read.parquet(s"$idx/cells")
      .filter(col("cell").isin(probedCells: _*))
      .filter(candidatePred)
    scoreTopK(
      routes.toDF("q_id", "cell")
        .join(qs.toDF("q_id", "q_emb", "q_nrm"), Seq("q_id"))
        .join(store, Seq("cell")),
      k)
  }

  /** X4d — IVF index APPEND maintenance: new vectors join a served
    * index without a rebuild — the other half of the build/probe
    * split's operating story ([[graft.ops.Dedup.neardupProbe]]'s
    * signature-index maintenance, for embeddings). The codebook is
    * built from the PRE-APPEND corpus only and is never moved by an
    * append (the production IVF contract: centroids are a serving
    * constant between explicit retrains); incoming vectors are routed
    * with that persisted codebook — a bounded broadcast-sized model,
    * O(batch·maxCells) work — and land as NEW files in their cells'
    * partition directories. Existing cell files are never rewritten,
    * so a 100 TB index appends a daily batch in batch-sized time.
    *
    * The registered query simulates the increment with
    * `vec_id % appendMod == 0` as the incoming batch, then probes the
    * appended store. Correctness anchor (SimilaritySpec): the probe
    * over the appended index must equal [[ivfTopK]] run inline over
    * ALL vectors with the SAME persisted codebook — i.e. an appended
    * vector is indistinguishable from one present at build. */
  def ivfAppend(spark: SparkSession, dir: String, k: Int = 10,
      nQueries: Int = 8, nProbe: Int = 2, maxCells: Int = 16,
      appendMod: Int = 11): DataFrame = {
    import spark.implicits._
    val idx = ivfAppendedIndex(spark, dir, maxCells, appendMod)
    probeIndexPath(spark, idx, dir, k, nQueries, nProbe)
  }

  /** Build-then-append harness for [[ivfAppend]]: a per-run scratch
    * index (never the shared `_SUCCESS`-gated cache — appends would
    * pollute it) built from the corpus slice, then appended with the
    * incoming slice routed by the persisted codebook. Returns the
    * index path; public so SimilaritySpec can pin the append contract
    * (same codebook ⇒ inline parity; corpus cell files untouched). */
  def ivfAppendedIndex(spark: SparkSession, dir: String,
      maxCells: Int = 16, appendMod: Int = 11): String = {
    import spark.implicits._
    val out = "target/graft_ann/append_run"
    // resolve the cleanup path FROM the relative write path (cwd-based,
    // like every spark write in this family) so delete and write can
    // never target different trees under an unexpected working dir
    graft.util.Scratch.deleteRecursive(
      java.nio.file.Paths.get(out).toAbsolutePath)
    val all = scorableEmb(t(spark, dir, "embeddings"))
    val corpus = all.filter(pmod(col("vec_id"), lit(appendMod)) =!= 0)
    coarseCodebookFor(corpus, maxCells).select("cell", "centroid")
      .write.parquet(s"$out/codebook")
    // route with the PERSISTED codebook (see ivfBuildIndex: re-running
    // the centroid agg can differ by ulps and flip near-tie routing)
    val cells: Seq[(Int, Seq[Double])] = spark.read
      .parquet(s"$out/codebook").select("cell", "centroid")
      .as[(Int, Seq[Double])].collect().toSeq
    val assignCell = argmaxCell(cells, col("embedding"))
    // same v2 store schema as ivfBuildIndex (label rides along) so
    // filtered probes work against appended stores too.
    // ONE routing pass (r17): the corpus write and the append write
    // are separate jobs by contract (appends land as NEW files), but
    // they previously each re-ran the scan + argmax routing — route
    // the whole relation once into a lazy checkpoint and write the
    // two slices from it. Same rows, same routing, same file layout.
    val routedAll = fanOut(all)
      .select(col("vec_id"), col("embedding"), col("label"),
        l2norm(col("embedding")).as("nrm"))
      .withColumn("cell", assignCell)
      .localCheckpoint(false)
    routedAll.filter(pmod(col("vec_id"), lit(appendMod)) =!= 0)
      .write.partitionBy("cell").parquet(s"$out/cells")
    routedAll.filter(pmod(col("vec_id"), lit(appendMod)) === 0)
      .write.mode("append").partitionBy("cell").parquet(s"$out/cells")
    out
  }

  /** X4e — metadata-FILTERED vector search: top-k among only the
    * candidates satisfying a metadata predicate (here `label` even —
    * the "only English docs", "only licensed sources" serving mode).
    * This is the PRE-FILTER strategy: the predicate prunes candidates
    * AT THE SCAN (pushed down next to the column read), and the
    * filtered set is scored exactly — correct at any selectivity,
    * unlike post-filtering a top-k' overfetch, which silently returns
    * fewer than k when the predicate is selective. Same broadcast
    * query set / streamed candidate side / [[scoreTopK]] tail as the
    * unfiltered operator; at 100 TB the filter composes with partition
    * pruning and the IVF cell layout unchanged. */
  /** The ONE metadata predicate of the registered filtered-search
    * queries — shared by [[filteredTopK]], [[filteredProbeTopK]] and
    * their parity specs, which all depend on filtering IDENTICALLY. */
  val evenLabelPred: Column = pmod(col("label"), lit(2)) === 0

  def filteredTopK(spark: SparkSession, dir: String, k: Int = 10,
      nQueries: Int = 8): DataFrame =
    cosineTopK(spark, dir, k, nQueries, candidatePred = evenLabelPred)

  /** X4e over the SERVING path — metadata-filtered probe of the
    * persisted IVF index: the predicate prunes candidates INSIDE the
    * index scan (the store carries its filterable metadata), AFTER the
    * static cell partition pruning — filter and partition pruning
    * compose, which is the claim [[filteredTopK]]'s scaladoc makes for
    * 100 TB. Same pre-filter correctness property: exact scoring over
    * the filtered candidate set of the probed cells, never a
    * post-filtered overfetch. Parity pinned in SimilaritySpec:
    * ≡ [[ivfTopK]] with the same persisted codebook and predicate. */
  def filteredProbeTopK(spark: SparkSession, dir: String, k: Int = 10,
      nQueries: Int = 8, nProbe: Int = 2, maxCells: Int = 16): DataFrame =
    probeIndexPath(spark, ivfBuildIndex(spark, dir, maxCells), dir, k,
      nQueries, nProbe, candidatePred = evenLabelPred)

  /** X4b — EXACT embedding-cosine pair search above a threshold: the
    * verification twin of the first-class [[lshPairs]] query, now with
    * no cartesian anywhere in the plan (the round-9 change — the old
    * form was a literal `crossJoin`).
    *
    * Design: metric-bound cell pruning + salted block equi-joins.
    *  1. Vectors are routed to a BOUNDED codebook cell (the IVF
    *     family's [[coarseCodebookFor]]/[[argmaxCell]], a serving
    *     constant), and each cell gets an ANGULAR RADIUS — the max
    *     angle of any member to the cell centroid (double-precision
    *     fold, one broadcast join + one keyed agg).
    *  2. Spherical triangle inequality: for a ∈ c1, b ∈ c2,
    *     `angle(a,b) ≥ angle(μ1,μ2) − r1 − r2`. A cell pair whose
    *     bound exceeds `arccos(threshold)` (+ an fp-safety margin)
    *     cannot contain a qualifying pair and is pruned — provably no
    *     false negatives; survivors are scored EXACTLY, so precision
    *     is exact too and the DuckDB oracle is unchanged.
    *  3. Surviving cell pairs execute as salted block EQUI-joins: each
    *     cell splits into ADAPTIVELY many deterministic sub-blocks
    *     (md5-bucketed, ~`targetBlockRows` rows each, capped at
    *     `maxSaltsPerCell`), the unordered surviving block pairs
    *     become a broadcast-sized key table, and the pair stream is
    *     two keyed hash/merge joins — per-task pair work and
    *     replication both bounded by constants, skew-free, no
    *     CartesianProduct node (pinned by a plan spec).
    *
    * 100 TB honesty: on a CLUSTERED corpus (the realistic case) the
    * bound prunes most cell pairs and the work tracks the qualifying
    * mass. On an isotropic corpus (this testdata: label clusters have
    * ~90° radius) nothing prunes and the operator degrades to the
    * blocked exact quadratic scan — the information-theoretic floor
    * for an exact threshold join, with replication O(n·√tasks), the
    * same I/O a cartesian pays, but evenly partitioned. The serving
    * path at scale remains [[lshPairs]]; this twin exists to certify
    * it. */
  def cosinePairs(spark: SparkSession, dir: String,
      threshold: Double = 0.4, maxCells: Int = 16,
      targetBlockRows: Int = 2048, maxSaltsPerCell: Int = 64): DataFrame =
    cosinePairsFor(t(spark, dir, "embeddings"), threshold, maxCells,
      targetBlockRows, maxSaltsPerCell)._1

  /** Cell-pair pruning statistics of one [[cosinePairsFor]] plan:
    * how many unordered cell pairs existed, how many survived the
    * angular bound, and how many salted block-pair tasks they fanned
    * into. The spec contract (`CosinePruneSpec`) asserts the bound
    * actually FIRES on a clustered corpus — surviving ≪ total — and
    * this record is how a caller (or a capacity planner sizing the
    * 100 TB run) observes the prune rate without re-deriving it. */
  final case class PairPruneStats(liveCells: Int, totalCellPairs: Int,
      survivingCellPairs: Int, blockPairs: Int) {
    def pruneFraction: Double =
      if (totalCellPairs == 0) 0.0
      else 1.0 - survivingCellPairs.toDouble / totalCellPairs
  }

  /** [[cosinePairs]] over an arbitrary (vec_id, label, embedding)
    * corpus, returning the pair stream AND the pruning stats of the
    * plan it built. `pruneCells = false` disables the angular bound
    * (every live cell pair executes) — the measured control for the
    * prune-rate scale table in SCALE_NOTES, and exactly the degraded
    * regime an isotropic corpus forces. */
  def cosinePairsFor(corpus: DataFrame,
      threshold: Double = 0.4, maxCells: Int = 16,
      targetBlockRows: Int = 2048, maxSaltsPerCell: Int = 64,
      pruneCells: Boolean = true): (DataFrame, PairPruneStats) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val emb = fanOut(scorableEmb(corpus))
      .select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
    val cells: Seq[(Int, Seq[Double])] =
      coarseCodebookFor(corpus, maxCells)
        .select("cell", "centroid").as[(Int, Seq[Double])].collect().toSeq
    if (cells.isEmpty)
      return (emb.select(col("vec_id").as("a"), col("vec_id").as("b"),
        lit(0.0).as("score")).limit(0), PairPruneStats(0, 0, 0, 0))
    // one routing pass: the radius/count collect materializes the
    // checkpoint, which then serves both block-join sides (r17 —
    // the semDedupQualifying leaf contract)
    val celled = emb.withColumn("cell", argmaxCell(cells, col("embedding")))
      .localCheckpoint(false)
    // Per-cell angular radius vs the cell's own centroid (the pruning
    // bound) and per-cell COUNT (the salting input), one keyed agg.
    // The radius fold is double-precision (dotHof casts both sides),
    // so the only slack the bound needs is the eps margin below.
    val cellsDf = cells.toDF("cell", "centroid")
    val cosToCentroid =
      dotHof(col("embedding"), col("centroid")) /
        (col("nrm") * sqrt(dotHof(col("centroid"), col("centroid"))))
    val ang = acos(least(lit(1.0), greatest(lit(-1.0), cosToCentroid)))
    val cellStats: Map[Int, (Double, Long)] = celled
      .join(broadcast(cellsDf), Seq("cell"))
      .groupBy("cell").agg(max(ang).as("r"), count(lit(1)).as("n"))
      .as[(Int, Double, Long)].collect()
      // a zero-norm member folds to NaN — treat as "unbounded cell",
      // never as prunable (Spark max sorts NaN above all values, so a
      // NaN radius would otherwise PRUNE via `NaN <= x` = false)
      .map { case (c, r, n) =>
        c -> ((if (r.isNaN) math.Pi else r, n)) }.toMap
    val radii = cellStats.view.mapValues(_._1).toMap
    // ADAPTIVE salting: each cell splits into ~count/targetBlockRows
    // sub-blocks, so block size — and with it both per-task pair work
    // AND the replication factor — is bounded by a constant, not by
    // cell occupancy. A fixed salt count is wrong at both ends: it
    // over-replicates small corpora (8× the shuffle at sf0.1 for
    // nothing) and under-splits the billion-row cell of a skewed
    // 100 TB corpus. maxSaltsPerCell caps the block-pair table at
    // broadcastable size; raise it in lockstep with cluster size.
    val salts: Map[Int, Int] = cellStats.view.mapValues { case (_, n) =>
      math.min(maxSaltsPerCell.toLong,
        math.max(1L, (n + targetBlockRows - 1) / targetBlockRows)).toInt
    }.toMap
    // ONE map-literal lookup, not a when-chain: a per-cell CASE WHEN
    // is O(cells) in plan size AND — after projection collapse inlines
    // the routing expression into every branch — blows generated code
    // past the codegen limit at large codebooks
    val saltOf = coalesce(
      element_at(typedLit(salts), col("cell")), lit(1))
    val blocked = celled.withColumn("salt",
      pmod(graft.util.Tables.md5Long32(
          concat(lit("cospair"), col("vec_id").cast("string"))),
        saltOf.cast("long")).cast("int"))
    val theta = math.acos(threshold)
    val eps = 1e-4 // driver-side fp slack, ~0.006° — bound is in radians
    def unit(v: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val units = cells.map { case (c, v) => c -> unit(v) }.toMap
    def centAngle(c1: Int, c2: Int): Double = {
      val d = units(c1).zip(units(c2)).map { case (x, y) => x * y }.sum
      math.acos(math.max(-1.0, math.min(1.0, d)))
    }
    // Unordered surviving BLOCK pairs, (cell, salt) lexicographic —
    // each unordered vector pair lands in exactly one block-pair task.
    val live = cellStats.keySet.toSeq.sorted
    val liveCellPairs = for {
      c1 <- live; c2 <- live; if c1 <= c2
    } yield (c1, c2)
    val survivingCellPairs = liveCellPairs.filter { case (c1, c2) =>
      !pruneCells ||
        centAngle(c1, c2) - radii(c1) - radii(c2) <= theta + eps
    }
    val blockPairs = for {
      (c1, c2) <- survivingCellPairs
      s1 <- 0 until salts(c1); s2 <- 0 until salts(c2)
      if c1 < c2 || s1 <= s2
    } yield (c1, s1, c2, s2)
    val stats = PairPruneStats(live.size, liveCellPairs.size,
      survivingCellPairs.size, blockPairs.size)
    val pairsDf = blockPairs.toDF("c1", "s1", "c2", "s2")
    val x = blocked.select(col("vec_id").as("xid"), col("embedding")
      .as("xe"), col("nrm").as("xn"), col("cell").as("xc"),
      col("salt").as("xs"))
    val y = blocked.select(col("vec_id").as("yid"), col("embedding")
      .as("ye"), col("nrm").as("yn"), col("cell").as("yc"),
      col("salt").as("ys"))
    val pairs = x.join(broadcast(pairsDf),
        col("xc") === col("c1") && col("xs") === col("s1"))
      .join(y, col("yc") === col("c2") && col("ys") === col("s2"))
      // same block: order the pair; cross-block: every pair arrives
      // exactly once already (only the (g1 <= g2) block pair exists)
      .filter((col("xc") =!= col("yc")) || (col("xs") =!= col("ys")) ||
        (col("xid") < col("yid")))
      // dot/norm products are IEEE-commutative, so scoring before the
      // least/greatest normalization yields the bit-identical double
      // the a<b form produced — the oracle is unchanged
      .withColumn("score", dot(col("xe"), col("ye")) /
        (col("xn") * col("yn")))
      .filter(col("score") > threshold)
      .select(least(col("xid"), col("yid")).as("a"),
        greatest(col("xid"), col("yid")).as("b"), col("score"))
      .orderBy("a", "b")
    (pairs, stats)
  }

  /** X61 — SemDeDup-style semantic near-duplicate pruning (the
    * embedding-space dedup step of an LLM data pipeline, after the
    * token-level MinHash families have run): route every vector to its
    * bounded coarse-codebook cell (the clustering step — same
    * [[coarseCodebook]]/[[argmaxCell]] routing the IVF family uses,
    * collected ONCE so routing ties cannot flip between the pair pass
    * and the output pass), score EXACT double cosine between SAME-CELL
    * pairs only, and drop each vector that has ANY lower-vec_id
    * same-cell neighbor with score > tau — deterministic and
    * order-free. NOTE the retention rule precisely: a vector is
    * dropped even when its qualifying lower-id neighbor was ITSELF
    * dropped, so chains over-prune relative to true greedy/SemDeDup
    * keep-first semantics (a~b, b~c, a≁c drops both b and c; greedy
    * against the kept set would keep c). Engine, oracle, and spec all
    * pin this same drop-if-any-lower-id-neighbor rule — the stronger
    * prune is the cheaper one (no sequential dependence on the kept
    * set, which would serialize within a cell) and errs toward
    * removing near-duplicates. Output: one row per corpus vector
    * (vec_id, cell, kept, dup_of = min qualifying lower id or NULL,
    * n_near = count of qualifying lower-id neighbors).
    *
    * Scale shape: the quadratic is confined WITHIN cells — the SemDeDup
    * reduction (cluster first, pairwise-cosine only inside a cluster) —
    * and each cell's pair mass executes as salted block equi-joins
    * exactly like [[cosinePairsFor]]: vectors split into deterministic
    * md5 sub-blocks of ~`targetBlockRows` rows, the unordered same-cell
    * block pairs become a broadcast key table, and per-task pair work /
    * replication stay constant-bounded regardless of cell occupancy
    * (no CartesianProduct — pinned by PlanAuditSpec like every other
    * registered plan). At 100 TB the knobs are maxCells (more, tighter
    * cells ⇒ less within-cell quadratic mass; the codebook stays
    * driver-bounded) and targetBlockRows/maxSaltsPerCell exactly as in
    * the exact-pairs twin. The final keep/drop pass is one keyed
    * aggregate over the (output-sized) qualifying-pair stream plus a
    * left join back to the corpus — nothing driver-side scales with
    * the data. */
  def semDedup(spark: SparkSession, dir: String,
      tau: Double = 0.4, maxCells: Int = 16,
      targetBlockRows: Int = 2048, maxSaltsPerCell: Int = 64): DataFrame = {
    import spark.implicits._
    val cells: Seq[(Int, Seq[Double])] =
      coarseCodebook(spark, dir, maxCells)
        .select("cell", "centroid").as[(Int, Seq[Double])].collect().toSeq
    // ONE routing pass: the lazy checkpoint is materialized by the
    // salt-count collect and then serves both pair-join sides and the
    // output join below (see semDedupQualifying's leaf contract)
    val celled = fanOut(scorableEmb(t(spark, dir, "embeddings")))
      .select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
      .withColumn("cell", argmaxCell(cells, col("embedding")))
      .localCheckpoint(false)
    val qualifying =
      semDedupQualifying(spark, celled, tau, targetBlockRows,
        maxSaltsPerCell)
    val dup = qualifying.groupBy(col("b_id"))
      .agg(min(col("a_id")).as("dup_of"), count(lit(1)).as("n_near"))
      .select(col("b_id").as("vec_id"), col("dup_of"), col("n_near"))
    celled.select(col("vec_id"), col("cell"))
      .join(dup, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        col("dup_of").isNull.as("kept"), col("dup_of"),
        coalesce(col("n_near"), lit(0L)).as("n_near"))
      .orderBy("vec_id")
  }

  /** The qualifying-pair core of [[semDedup]] over an already-routed
    * (vec_id, embedding, nrm, cell) relation: every same-cell pair
    * with exact cosine > tau, as ordered (a_id < b_id) rows, via the
    * salted block equi-joins the class doc describes. Shared by the
    * registered full-corpus form and the corpus-pipeline's
    * survivor-restricted stage ([[semDedupDrops]]). */
  private def semDedupQualifying(spark: SparkSession, celled: DataFrame,
      tau: Double, targetBlockRows: Int, maxSaltsPerCell: Int): DataFrame = {
    import spark.implicits._
    // `celled` must be a CHECKPOINT LEAF (callers checkpoint once,
    // r17): this helper consumes it three times — the salt-count
    // collect below, then BOTH sides of the block-pair join — and the
    // callers read it again for their output join. Un-checkpointed,
    // each consumer re-ran the embeddings scan + argmax/top-k cell
    // routing (4-5 routing passes per query; the salting was derived
    // "per consumer, not once" — VERDICT r16 item 5).
    // Adaptive per-cell salting, same rationale as [[cosinePairsFor]]:
    // block size bounds both per-task pair work and replication.
    val counts: Map[Int, Long] = celled.groupBy("cell")
      .agg(count(lit(1)).as("n")).as[(Int, Long)].collect().toMap
    val salts: Map[Int, Int] = counts.view.mapValues { n =>
      math.min(maxSaltsPerCell.toLong,
        math.max(1L, (n + targetBlockRows - 1) / targetBlockRows)).toInt
    }.toMap
    // map-literal lookup, not a when-chain — see [[cosinePairsFor]]
    val saltOf = coalesce(
      element_at(typedLit(salts), col("cell")), lit(1))
    val blocked = celled.withColumn("salt",
      pmod(graft.util.Tables.md5Long32(
          concat(lit("semdedup"), col("vec_id").cast("string"))),
        saltOf.cast("long")).cast("int"))
    // Unordered SAME-CELL block pairs only — the structural difference
    // from cosinePairsFor, which crosses cells.
    val blockPairs = for {
      c <- counts.keySet.toSeq.sorted
      s1 <- 0 until salts(c); s2 <- s1 until salts(c)
    } yield (c, s1, s2)
    val pairsDf = blockPairs.toDF("c", "s1", "s2")
    val x = blocked.select(col("vec_id").as("xid"), col("embedding")
      .as("xe"), col("nrm").as("xn"), col("cell").as("xc"),
      col("salt").as("xs"))
    val y = blocked.select(col("vec_id").as("yid"), col("embedding")
      .as("ye"), col("nrm").as("yn"), col("cell").as("yc"),
      col("salt").as("ys"))
    x.join(broadcast(pairsDf),
        col("xc") === col("c") && col("xs") === col("s1"))
      .join(y, col("yc") === col("c") && col("ys") === col("s2"))
      // same block: order the pair; cross-block (s1 < s2): every
      // unordered pair arrives exactly once already
      .filter((col("xs") =!= col("ys")) || (col("xid") < col("yid")))
      // dot/norm products are IEEE-commutative, so scoring before the
      // least/greatest normalization matches the oracle's a<b form
      .withColumn("score", dot(col("xe"), col("ye")) /
        (col("xn") * col("yn")))
      .filter(col("score") > tau)
      .select(least(col("xid"), col("yid")).as("a_id"),
        greatest(col("xid"), col("yid")).as("b_id"))
  }

  /** X61b — [[semDedup]] with MULTI-PROBE pair generation: every
    * vector is LISTED under its top-`nProbe` cells for candidate
    * generation (the `crn ≤ nProbe` contract of [[ivfProbeTopK]] and
    * [[semanticDecontaminate]]'s eval side, here applied to BOTH pair
    * sides), so a near-dup pair straddling one cell boundary is still
    * compared whenever either vector ranks the other's cell within
    * its top-nProbe. Verdict rule and output schema are exactly
    * [[semDedup]]'s (the reported `cell` is the assigned crn-1 cell);
    * pairs surfaced via several shared cells deduplicate before the
    * verdict aggregate, so `n_near` counts distinct lower-id
    * neighbors.
    *
    * Measured on planted twins (SCALE_NOTES round 11): straddle
    * recall 0 → ~0.5–0.7 at nProbe = 2 for ~nProbe× listed rows —
    * the missing half of the maxCells dial the recall table
    * quantified. Routing is the fused
    * [[graft.expressions.CellRouteTopK]] loop — one projection, no
    * shuffle, O(1) plan size at any codebook (an
    * explode-codebook + per-vector rank window would shuffle n·cells
    * rows, quadratic once cells scale with the corpus). */
  def semDedupProbe(spark: SparkSession, dir: String,
      tau: Double = 0.4, maxCells: Int = 16, nProbe: Int = 2,
      targetBlockRows: Int = 2048, maxSaltsPerCell: Int = 64): DataFrame = {
    import spark.implicits._
    val cells: Seq[(Int, Seq[Double])] =
      coarseCodebook(spark, dir, maxCells)
        .select("cell", "centroid").as[(Int, Seq[Double])].collect().toSeq
    // ONE top-k routing pass (leaf contract, as in [[semDedup]]): the
    // listed explode, both pair-join sides and the output join all
    // read this checkpoint instead of re-running CellRouteTopK
    val base = fanOut(scorableEmb(t(spark, dir, "embeddings")))
      .select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
      .withColumn("cells",
        graft.expressions.CellRouteTopK(col("embedding"), cells, nProbe))
      .localCheckpoint(false)
    val listed = base.select(col("vec_id"), col("embedding"),
      col("nrm"), explode(col("cells")).as("cell"))
    val qualifying =
      semDedupQualifying(spark, listed, tau, targetBlockRows,
        maxSaltsPerCell).distinct()
    val dup = qualifying.groupBy(col("b_id"))
      .agg(min(col("a_id")).as("dup_of"), count(lit(1)).as("n_near"))
      .select(col("b_id").as("vec_id"), col("dup_of"), col("n_near"))
    base.select(col("vec_id"), element_at(col("cells"), 1).as("cell"))
      .join(dup, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        col("dup_of").isNull.as("kept"), col("dup_of"),
        coalesce(col("n_near"), lit(0L)).as("n_near"))
      .orderBy("vec_id")
  }

  /** X61c — TRUE greedy keep-first SemDeDup: the paper's retention
    * semantics, offered alongside the registered [[semDedup]] rule
    * (drop-if-ANY-lower-id-neighbor, which transitively over-prunes:
    * a~b, b~c, a≁c drops both b and c). Greedy keeps a vector unless
    * it has a KEPT lower-id neighbor above tau — on that chain it
    * keeps c, because c's only qualifying lower neighbor b was itself
    * dropped. Kept set is therefore always a SUPERSET of the
    * registered rule's (SemDedupGreedySpec pins both facts).
    *
    * The sequential-looking recurrence (kept(v) = ¬∃ kept u < v with
    * cos(u,v) > tau) parallelizes as rounds of the classic
    * greedy-MIS-in-id-order schedule over the qualifying-pair graph:
    * each round, every pair-graph vertex with NO undecided lower-id
    * neighbor is decided KEPT (the graph's global minimum always
    * qualifies, so progress is guaranteed), its higher partners are
    * decided DROPPED, and all decided vertices leave the graph — a
    * vertex whose lower neighbors were all dropped surfaces as a
    * later root. Rounds = longest blocking chain (near-dup graphs
    * are shallow cliques: 2–3), each round two keyed
    * distinct/anti-join passes over the PAIR stream (output-sized,
    * never corpus-sized), lineage truncated per round exactly like
    * [[graft.ops.Dedup.dedupGroups]]'s label propagation; the driver
    * holds one undecided-count scalar. Output schema/columns are
    * [[semDedup]]'s, with `dup_of`/`n_near` counting KEPT lower-id
    * neighbors (the survivor a dropped vector duplicates).
    *
    * Pathological chains (the operator answer, VERDICT r12 item 4):
    * rounds grow as ~chain/2 on an id-ordered similarity PATH, so a
    * graph whose longest blocking chain exceeds 2·maxIter aborts
    * LOUDLY at the `require` below (never a silent truncation — the
    * CC lesson). The remedies are the knob and the trade: raise
    * `maxIter` (each round costs two keyed passes over the
    * pair stream — linear in chain length, measured on a planted
    * 200-link chain in SemDedupGreedySpec), or fall back to
    * [[semDedup]]'s over-pruning rule, which is chain-depth-free by
    * construction. */
  def semDedupGreedy(spark: SparkSession, dir: String,
      tau: Double = 0.4, maxCells: Int = 16,
      targetBlockRows: Int = 2048, maxSaltsPerCell: Int = 64,
      maxIter: Int = 50): DataFrame = {
    import spark.implicits._
    val cells: Seq[(Int, Seq[Double])] =
      coarseCodebook(spark, dir, maxCells)
        .select("cell", "centroid").as[(Int, Seq[Double])].collect().toSeq
    val celled = fanOut(scorableEmb(t(spark, dir, "embeddings")))
      .select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
      .withColumn("cell", argmaxCell(cells, col("embedding")))
      .localCheckpoint(false) // one routing pass (leaf contract)
    val qualifying = semDedupQualifying(spark, celled, tau,
      targetBlockRows, maxSaltsPerCell).localCheckpoint()
    var undecided = qualifying
    // Accumulate the DROPPED set, not the kept set (ADVICE r12): a
    // vertex whose every pair is removed via PARTNER decisions in one
    // round never surfaces as a root — with pairs (0,1),(1,2),(2,4),
    // (3,4), round 1 keeps {0,3}, drops {1,4}, and removes both of
    // vertex 2's pairs, so 2 is implicitly KEPT but a root-only
    // accumulator misses it and dup_of/n_near for 4 would count only
    // {3}, not {2,3} (the sequential oracle counts both). Dropped
    // vertices, by contrast, are always decided EXPLICITLY (as the b
    // of a kept root), so kept = all pair-graph vertices ∖ dropped is
    // exact.
    // per-round drop lists accumulate LAZILY (r16): each round's list
    // is itself a checkpoint leaf and the cumulative set is only read
    // AFTER the loop, so the old per-round union+checkpoint job was
    // one materialization per round for data already on the block
    // store — union the leaves once at the end instead
    var droppedRounds = List.empty[DataFrame]
    var remaining = undecided.count()
    var iter = 0
    while (remaining > 0 && iter < maxIter) {
      val verts = undecided.select(col("a_id").as("vec_id"))
        .union(undecided.select(col("b_id").as("vec_id"))).distinct()
      val blocked = undecided.select(col("b_id").as("vec_id")).distinct()
      val roots = verts.join(blocked, Seq("vec_id"), "left_anti")
        .localCheckpoint()
      val roundDropped = undecided
        .join(roots.select(col("vec_id").as("a_id")), Seq("a_id"),
          "left_semi")
        .select(col("b_id").as("vec_id")).distinct()
        .localCheckpoint()
      droppedRounds ::= roundDropped
      val decided = roots.union(roundDropped)
      undecided = undecided
        .join(decided.select(col("vec_id").as("a_id")), Seq("a_id"),
          "left_anti")
        .join(decided.select(col("vec_id").as("b_id")), Seq("b_id"),
          "left_anti")
        .localCheckpoint()
      remaining = undecided.count()
      iter += 1
    }
    require(remaining == 0,
      s"semDedupGreedy: $remaining undecided pairs after $maxIter rounds")
    // FINAL kept set = every pair-graph vertex minus the dropped set
    // (covers implicitly-kept vertices; see the accumulator comment)
    val dropped = droppedRounds
      .foldLeft(Seq.empty[Long].toDF("vec_id"))(_ union _)
    val kept = qualifying.select(col("a_id").as("vec_id"))
      .union(qualifying.select(col("b_id").as("vec_id"))).distinct()
      .join(dropped, Seq("vec_id"), "left_anti")
      .localCheckpoint()
    // dup_of / n_near against the FINAL kept set: every pair-graph
    // vertex is decided, so "not kept" ⟺ dropped ⟺ has a kept
    // lower-id neighbor — dup below is exactly the dropped set
    val dup = qualifying
      .join(kept.select(col("vec_id").as("a_id")), Seq("a_id"),
        "left_semi")
      .join(kept.select(col("vec_id").as("b_id")), Seq("b_id"),
        "left_anti")
      .groupBy(col("b_id"))
      .agg(min(col("a_id")).as("dup_of"), count(lit(1)).as("n_near"))
      .select(col("b_id").as("vec_id"), col("dup_of"), col("n_near"))
    celled.select(col("vec_id"), col("cell"))
      .join(dup, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        col("dup_of").isNull.as("kept"), col("dup_of"),
        coalesce(col("n_near"), lit(0L)).as("n_near"))
      .orderBy("vec_id")
  }

  /** [[semDedup]]'s DROP SET restricted to a survivor sub-corpus — the
    * composable corpus-pipeline stage form of X61. `survivors`
    * (vec_id) names the docs still alive; they are routed with the
    * FULL-corpus codebook (the fixed routing artifact an operating
    * pipeline shares across stages and days — survivors must not move
    * centroids), pairs are scored among survivors only, and the
    * returned (vec_id) rows are the survivors with at least one
    * lower-id same-cell neighbor above tau (the registered rule).
    * `nProbe > 1` switches pair generation to the [[semDedupProbe]]
    * multi-probe listing (both sides under their top-nProbe cells via
    * the fused CellRouteTopK loop) — the straddle-recall lift the
    * planted measurement quantified (0 → ~0.9 at nProbe 2); the drop
    * set is distinct vec_ids either way. Docs without an embedding
    * row never appear (they cannot be semantic duplicates of
    * anything). */
  def semDedupDrops(spark: SparkSession, dir: String,
      survivors: DataFrame, tau: Double = 0.4, maxCells: Int = 16,
      targetBlockRows: Int = 2048, maxSaltsPerCell: Int = 64,
      nProbe: Int = 1): DataFrame = {
    import spark.implicits._
    val cells: Seq[(Int, Seq[Double])] =
      coarseCodebook(spark, dir, maxCells)
        .select("cell", "centroid").as[(Int, Seq[Double])].collect().toSeq
    val base = fanOut(scorableEmb(t(spark, dir, "embeddings")))
      .join(survivors.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
    val celled =
      (if (nProbe <= 1)
        base.withColumn("cell", argmaxCell(cells, col("embedding")))
      else base.select(col("vec_id"), col("embedding"), col("nrm"),
        explode(graft.expressions.CellRouteTopK(col("embedding"),
          cells, nProbe)).as("cell")))
        .localCheckpoint(false) // one routing pass (leaf contract)
    semDedupQualifying(spark, celled, tau, targetBlockRows,
        maxSaltsPerCell)
      .select(col("b_id").as("vec_id")).distinct()
  }

  /** X65 — embedding outlier detection: the top-k vectors FARTHEST
    * from their own routed cell centroid, per cell — the embedding-
    * space data-cleaning signal (mislabeled, corrupt, or off-
    * distribution vectors surface first) that complements [[semDedup]]
    * (which removes the over-represented center; this flags the
    * suspicious fringe).
    *
    * Distance is squared L2 expanded as `e·e − 2·e·c + c·c`, all three
    * dots the same sequential double fold ([[dot]] / DuckDB
    * `list_dot_product`), the centroid float-downcast exactly like the
    * IVF routing codebook — so the oracle (sharing the proven
    * `ivfRouteCtes` assign CTEs) reproduces every bit, and ranking by
    * (dist² desc, vec_id) can never disagree.
    *
    * Scale shape: routing is the bounded-codebook scan (O(n·maxCells)),
    * the centroid join is a broadcast of ≤ maxCells rows, and the
    * per-cell top-k runs through the X40 partial-heap operator
    * ([[graft.plans.TopK.topKPerKey]]) AFTER the embedding column is
    * projected away — the one keyed exchange carries at most
    * partitions×maxCells×k (cell, vec_id, dist2) triples, where the
    * window formulation would shuffle (and per-cell sort) every vector
    * row into ≤ maxCells reducers. The rank column is a window over
    * the ≤ maxCells·k survivors — output-sized, free. Output is
    * maxCells·k rows regardless of corpus size. */
  def embeddingOutliers(spark: SparkSession, dir: String, k: Int = 5,
      maxCells: Int = 16): DataFrame = {
    import spark.implicits._
    val cells: Seq[(Int, Seq[Double])] =
      coarseCodebook(spark, dir, maxCells)
        .select("cell", "centroid").as[(Int, Seq[Double])].collect().toSeq
    // float-downcast centroid (the routing representation) + its
    // self-dot, computed driver-side with the same sequential fold
    val cellsDf = cells.map { case (id, c) =>
      val cf = c.map(_.toFloat)
      val cc = cf.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
      (id, cf, cc)
    }.toDF("cell", "centroid_f", "cc")
    val celled = fanOut(scorableEmb(t(spark, dir, "embeddings")))
      .select(col("vec_id"), col("embedding"))
      .withColumn("cell", argmaxCell(cells, col("embedding")))
    val scored = celled.join(broadcast(cellsDf), Seq("cell"))
      .withColumn("dist2",
        dot(col("embedding"), col("embedding")) -
          lit(2.0) * dot(col("embedding"), col("centroid_f")) +
          col("cc"))
      .select(col("cell"), col("vec_id"), col("dist2"))
    val top = graft.plans.TopK.topKPerKey(scored, Seq(col("cell")),
      Seq(col("dist2").desc, col("vec_id")), k)
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("dist2").desc, col("vec_id"))
    top.withColumn("rn", row_number().over(w).cast("int"))
      .select(col("cell"), col("vec_id"), col("dist2"), col("rn"))
      .orderBy("cell", "rn")
  }

  /** X66 — SEMANTIC eval-set decontamination: the embedding-space twin
    * of [[QualitySignals.decontaminate]] (X29's n-gram form misses
    * paraphrased or re-worded eval leakage; this catches anything the
    * embedding model maps near an eval item). A deterministic
    * content-hash slice of the corpus plays the eval set
    * (`md5Bucket`, the engine's standard reproducible coin); every
    * remaining vector is scored against the eval vectors ROUTED TO ITS
    * OWN CELL (the shared bounded-codebook routing the IVF family +
    * [[semDedup]] have proven), and its best match is reported —
    * (vec_id, eval_id, score, contaminated) with `contaminated =
    * score ≥ tau`, one row per training vector that shares a cell
    * with at least one eval vector (the full report: the decision
    * threshold stays a downstream choice, and the gate hashes real
    * scores instead of an empty set on a corpus with no genuine
    * leakage).
    *
    * Cell-local comparison makes this approximate in the same sense —
    * and with the same knob — as SemDeDup/IVF: recall is bounded by
    * routing agreement, and maxCells is what a 100 TB deployment
    * raises (cells ∝ √corpus balances the n·eval/c join mass against
    * the n·c routing term, exactly the [[semDedup]] trade). The
    * boundary case — a leaked pair whose two vectors straddle a cell
    * boundary — is half-closed the way [[ivfProbeTopK]] closes it: the
    * EVAL
    * side (the small side) is listed under its top-`nProbe` cells
    * (rank by (score desc, cell desc), the oracle route CTE's `crn ≤
    * nProbe`), so a train vector is compared against every eval item
    * that considers the train's cell first OR second. Eval fan-out is
    * |eval|·nProbe rows — still the small side. The per-train
    * best-match is a groupBy max over one keyed exchange (partial agg
    * — never a per-train window sort); the eval side of the cell join
    * is eval-fraction-sized and broadcasts under AQE until it
    * genuinely doesn't fit.
    *
    * Cosine is the IVF family's exact arithmetic: [[dot]] folds with
    * sqrt-norm division, bit-reproduced by the oracle's
    * `list_dot_product`/`sqrt` chain; ties on score break to the
    * SMALLER eval_id (the max-struct carries a negated id), matching
    * the oracle's `ORDER BY score DESC, eval_id` rank. */
  def semanticDecontaminate(spark: SparkSession, dir: String,
      tau: Double = 0.6, maxCells: Int = 16, evalMod: Int = 50,
      nProbe: Int = 2): DataFrame =
    semanticDeconBest(spark, dir, None, maxCells, evalMod, nProbe)
      .select(col("vec_id"), col("eval_id"), col("score"),
        (col("score") >= tau).as("contaminated"))
      .orderBy("vec_id")

  /** X66b — [[semanticDecontaminate]] with BOTH-SIDES multi-probe
    * listing (the X61b pattern applied to decontamination — VERDICT
    * r11 item 4): the eval side was already listed under its top-
    * `nProbe` cells, but a straddling leaked pair whose TRAIN vector
    * ranks the eval's cell second was still missed when the eval
    * vector didn't reciprocate (measured straddle recall 0.52 at
    * 100×, SCALE_NOTES r11). Here the train side lists under its
    * top-`nProbe` cells too (one more fused [[graft.expressions
    * .CellRouteTopK]] projection — no shuffle, O(1) plan size), so a
    * pair is compared whenever ANY of the two top-2 listings
    * intersect. A pair surfacing via several shared cells contributes
    * duplicate (vec_id, eval_id, score) rows, which the per-train
    * best-match max-aggregate absorbs without a distinct. Train
    * fan-out is nProbe× listed rows — the linear-side cost the
    * semdedup_probe measurement already priced. Output schema and
    * semantics are [[semanticDecontaminate]]'s. */
  def semanticDeconProbe(spark: SparkSession, dir: String,
      tau: Double = 0.6, maxCells: Int = 16, evalMod: Int = 50,
      nProbe: Int = 2): DataFrame =
    semanticDeconBest(spark, dir, None, maxCells, evalMod, nProbe,
        trainProbe = nProbe)
      .select(col("vec_id"), col("eval_id"), col("score"),
        (col("score") >= tau).as("contaminated"))
      .orderBy("vec_id")

  /** The best-eval-match core of [[semanticDecontaminate]]: one
    * (vec_id, eval_id, score) row per train vector sharing a probed
    * cell with an eval vector. `restrict` (vec_id) narrows the TRAIN
    * side (the corpus-pipeline form — eval stays the full-corpus
    * slice: the benchmark stands outside the pipeline and is not
    * subject to its filters); None is the registered full-corpus
    * query. */
  private def semanticDeconBest(spark: SparkSession, dir: String,
      restrict: Option[DataFrame], maxCells: Int, evalMod: Int,
      nProbe: Int, trainProbe: Int = 1): DataFrame = {
    import spark.implicits._
    val cells: Seq[(Int, Seq[Double])] =
      coarseCodebook(spark, dir, maxCells)
        .select("cell", "centroid").as[(Int, Seq[Double])].collect().toSeq
    val emb = fanOut(scorableEmb(t(spark, dir, "embeddings")))
      .select(col("vec_id"), col("embedding"))
      .withColumn("is_eval",
        graft.util.Tables.md5Bucket("sdecon:", col("vec_id"), evalMod)
          === 0)
    // eval side under its top-nProbe cells via the fused
    // [[graft.expressions.CellRouteTopK]] loop — one projection, no
    // shuffle, O(1) plan size; bit-identical to the previous
    // explode-codebook + rank-window formulation (CellRouteTopKSpec
    // pins the (score desc, cell desc) order parity), which shuffled
    // |eval|·cells rows through a per-vector sort — the piece that
    // went quadratic once cells scale with the corpus.
    val eval = emb.filter(col("is_eval"))
      .select(col("vec_id").as("eval_id"), col("embedding").as("ee"),
        explode(graft.expressions.CellRouteTopK(col("embedding"),
          cells, nProbe)).as("cell"))
      .select(col("cell"), col("eval_id"), col("ee"))
    val trainBase = emb.filter(!col("is_eval"))
    val train = restrict.fold(trainBase)(s =>
      trainBase.join(s.select(col("vec_id")), Seq("vec_id"), "left_semi"))
    val trainCelled =
      if (trainProbe <= 1)
        train.withColumn("cell", argmaxCell(cells, col("embedding")))
      else train.withColumn("cell",
        explode(graft.expressions.CellRouteTopK(col("embedding"),
          cells, trainProbe)))
    trainCelled
      .join(eval, Seq("cell"))
      .withColumn("score",
        dot(col("embedding"), col("ee")) /
          (l2norm(col("embedding")) * l2norm(col("ee"))))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("score"), (-col("eval_id")).as("neg")))
        .as("m"))
      .select(col("vec_id"), (-col("m.neg")).as("eval_id"),
        col("m.score").as("score"))
  }

  /** X61-incremental — the DROP SET of the daily-batch semantic dedup
    * stage ([[graft.ops.CorpusPipeline.corpusPipelineIncr]]): a batch
    * survivor is dropped when it has (a) ANY corpus-side neighbor
    * (vec_id % batchMod ≠ 0 — the already-deduped corpus wins
    * regardless of id order) or (b) a LOWER-id batch-survivor
    * neighbor, above `tau` within a shared top-`nProbe`-listed cell
    * (the X61b multi-probe contract on both sides). Both sides list
    * through the fused CellRouteTopK loop; the batch side is
    * increment-sized, so the per-cell joins broadcast it under AQE —
    * the corpus listing streams (in production it is the persisted
    * cell index the full rebuild maintains). */
  def semDedupIncrDrops(spark: SparkSession, dir: String,
      survivors: DataFrame, batchMod: Int, tau: Double = 0.4,
      maxCells: Int = 16, nProbe: Int = 2): DataFrame = {
    import spark.implicits._
    val cells: Seq[(Int, Seq[Double])] =
      coarseCodebook(spark, dir, maxCells)
        .select("cell", "centroid").as[(Int, Seq[Double])].collect().toSeq
    val emb = fanOut(scorableEmb(t(spark, dir, "embeddings")))
    def listed(df: DataFrame, pre: String) = df
      .select(col("vec_id").as(s"${pre}id"),
        col("embedding").as(s"${pre}e"),
        l2norm(col("embedding")).as(s"${pre}n"),
        explode(graft.expressions.CellRouteTopK(col("embedding"),
          cells, nProbe)).as("cell"))
    // the batch side is routed ONCE (r17): it feeds both the cross
    // and the within joins, and the within Y-side is the same rows
    // under the y aliases — rename the checkpoint instead of running
    // the scan + top-k routing a third time
    val batchL = listed(
      emb.join(survivors.select(col("vec_id")), Seq("vec_id"),
        "left_semi"), "x").localCheckpoint(false)
    val corpusL = listed(
      emb.filter(pmod(col("vec_id"), lit(batchMod)) =!= 0), "y")
    val withinL = batchL.select(col("xid").as("yid"),
      col("xe").as("ye"), col("xn").as("yn"), col("cell"))
    def qualified(pairs: DataFrame) = pairs
      .withColumn("score", dot(col("xe"), col("ye")) /
        (col("xn") * col("yn")))
      .filter(col("score") > tau)
      .select(col("xid").as("vec_id"))
    val cross = qualified(batchL.join(corpusL, Seq("cell")))
    val within = qualified(batchL.join(withinL, Seq("cell"))
      .filter(col("yid") < col("xid")))
    cross.union(within).distinct()
  }

  /** [[semanticDecontaminate]]'s DROP SET for a survivor sub-corpus
    * (the composable corpus-pipeline stage form of X66): survivors
    * that are themselves in the deterministic eval slice (eval items
    * never train), plus survivors whose best top-nProbe-cell eval
    * match scores ≥ tau. Docs without an embedding row never appear
    * (nothing semantic can flag them). */
  def semanticDeconDrops(spark: SparkSession, dir: String,
      survivors: DataFrame, tau: Double = 0.6, maxCells: Int = 16,
      evalMod: Int = 50, nProbe: Int = 2): DataFrame = {
    val evalIds = fanOut(t(spark, dir, "embeddings"))
      .select(col("vec_id"))
      .filter(graft.util.Tables.md5Bucket("sdecon:", col("vec_id"),
        evalMod) === 0)
      .join(survivors.select(col("vec_id")), Seq("vec_id"), "left_semi")
    val contaminated =
      semanticDeconBest(spark, dir, Some(survivors), maxCells, evalMod,
          nProbe)
        .filter(col("score") >= tau)
        .select(col("vec_id"))
    evalIds.union(contaminated).distinct()
  }

  /** X17 — per-label centroid aggregation WITHOUT an output ordering:
    * the shared subplan for both public forms. Kept order-free because a
    * global orderBy over an aggregate range-samples its child — running
    * the whole UDAF subplan an extra time per sort (the round-3
    * centroid_udaf 2.6× regression was exactly two stacked orderBys). */
  private def centroidCore(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .groupBy(col("label"))
      .agg(
        CentroidAgg.centroid(64)(col("embedding")).as("centroid"),
        count(lit(1)).as("n_vecs"))

  /** X17 — per-label centroid via the custom Aggregator UDAF. Array
    * output + float-sum order nondeterminism ⇒ registered as a
    * rows-only check; exact values verified against a Scala
    * recomputation in SimilaritySpec. Output is label-count-sized
    * (bounded), so the total order comes from a single-partition sort —
    * no range-sampling re-execution of the aggregate. */
  def centroidByLabel(spark: SparkSession, dir: String): DataFrame =
    centroidCore(spark, dir).coalesce(1).sortWithinPartitions("label")

  /** The registered form of the centroid family: the
    * [[graft.functions.QuantizedCentroidAgg]] fixed-point Aggregator
    * (order-independent integer state ⇒ bit-exact across runs AND
    * engines — the DuckDB gate recomputes the same floor-quantized
    * sums over unnested arrays), exploded into one (label, dim, value)
    * row per element so every column is a sortable scalar — the
    * driver's canonicalization cannot sort an array column (pandas
    * `unhashable type` on ndarray). Raw doubles, no display rounding:
    * the whole multiply/floor/sum/divide chain is IEEE-identical on
    * both sides, so the values hash-match as-is.
    * Single-partition sort (labels × 64 dims rows, bounded): the
    * map-side partial aggregation keeps full scan parallelism, only the
    * tiny final-merge stage collapses to one task. */
  def centroidByLabelFlat(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .groupBy(col("label"))
      .agg(
        CentroidAgg.centroidQ(64)(col("embedding")).as("centroid"),
        count(lit(1)).as("n_vecs"))
      .select(col("label"), col("n_vecs"),
        posexplode(col("centroid")).as(Seq("dim", "c")))
      .select(col("label"), col("dim").cast("int").as("dim"),
        col("c").as("centroid_val"), col("n_vecs"))
      .coalesce(1).sortWithinPartitions("label", "dim")

  /** X16 — higher-order-function stats over the embedding arrays
    * (norms + leading elements), exactly oracle-able because per-row
    * folds are deterministic and cross-row sums use decimal
    * accumulation. */
  def embeddingStats(spark: SparkSession, dir: String): DataFrame = {
    import graft.util.Tables.dsum
    val e = t(spark, dir, "embeddings")
      .withColumn("nrm", l2norm(col("embedding")))
    e.groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        dsum(col("nrm")).as("sum_norm"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"),
        dsum(element_at(col("embedding"), 1).cast("double")).as("sum_e1"),
        dsum(element_at(col("embedding"), 2).cast("double")).as("sum_e2"))
      .orderBy("label")
  }

  /** Int8 scalar quantization of the embedding column — the 4×
    * compression step a 100 TB ANN index applies before anything else
    * (smaller vectors = more of the index in executor memory = fewer
    * probe spills). Per vector: min/max range, codes
    * `floor((x-min)/scale)` (floor, NOT round — round-half ties break
    * differently across engines; floor of the same IEEE division is
    * bit-deterministic), and the reconstruction-error stats that tell
    * a user whether int8 is safe for their corpus. Everything is
    * per-row HOF work — embarrassingly parallel, whole-stage codegen,
    * no shuffle at all until the final output sort. */
  def quantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
      .withColumn("v", transform(col("embedding"), x => x.cast("double")))
      .withColumn("vmin", array_min(col("v")))
      .withColumn("vmax", array_max(col("v")))
      .withColumn("scale", (col("vmax") - col("vmin")) / lit(255.0))
      // degenerate all-constant vector: scale 0 → all codes 0
      .withColumn("codes", transform(col("v"), x =>
        when(col("scale") === 0.0, lit(0L)).otherwise(
          least(lit(255L), floor((x - col("vmin")) / col("scale"))
            .cast("long")))))
      .withColumn("errs", zip_with(col("v"), col("codes"), (x, c) =>
        abs(x - (col("vmin") +
          (c.cast("double") + lit(0.5)) * col("scale")))))
    e.select(col("vec_id"), col("label"),
        size(col("v")).as("n_dims"), col("vmin"), col("vmax"),
        md5(concat_ws(",", transform(col("codes"), c => c.cast("string"))))
          .as("code_fp"),
        array_max(col("errs")).as("max_abs_err"),
        aggregate(col("errs"), lit(0.0), (acc, x) => acc + x * x)
          .as("sse"))
      .orderBy("vec_id")
  }

  // ---- X31+X4: QUANTIZED IVF serving ---------------------------------

  /** Rerank overfetch: the quantized stage keeps `RerankFactor · k`
    * candidates per query for the full-precision rescore. */
  val RerankFactor = 3

  /** X31+X4 — the int8-QUANTIZED IVF index, the 100 TB memory story:
    * the served store keeps 1-byte codes per dimension (plus the
    * per-vector (vmin, vmax) range and the precomputed dequantized
    * norm) instead of 4-byte floats — ~4× less vector payload in
    * executor memory per probed cell, which is the difference between
    * an index that fits and one that spills. Quantization is EXACTLY
    * the [[quantizeInt8]] arithmetic (floor of the same IEEE
    * division — round-half ties break differently across engines),
    * codes shifted by −128 into a signed `byte` column so the store
    * is honest int8 on disk. Derived FROM the full-precision
    * [[ivfBuildIndex]] store — same codebook parquet (routing parity
    * by construction), same cell partitioning, `_SUCCESS`-gated the
    * same way. */
  def ivfBuildQuantizedIndex(spark: SparkSession, dir: String,
      maxCells: Int = 16): String = {
    val base = ivfBuildIndex(spark, dir, maxCells)
    val out = base.replaceFirst("/ivf_v2_", "/ivfq_v1_")
    // if ivfBuildIndex's naming drifts, the no-match replace yields
    // out == base and the overwrite below would clobber the
    // full-precision store the quantized probe re-ranks from — fail
    // loudly instead (ADVICE r15)
    require(out != base,
      s"quantized-index path derivation failed: base store '$base' " +
        "does not carry the expected /ivf_v2_ segment")
    def ok(sub: String): Boolean =
      graft.util.Tables.successExists(spark, s"$out/$sub")
    if (!ok("codebook") || !ok("cells")) {
      // the SAME persisted codebook doubles as this store's router —
      // copied, not recomputed (CentroidAgg merge order can differ by
      // ulps; see ivfBuildIndex)
      spark.read.parquet(s"$base/codebook")
        .write.mode("overwrite").parquet(s"$out/codebook")
      spark.read.parquet(s"$base/cells")
        .withColumn("v", transform(col("embedding"), x => x.cast("double")))
        .withColumn("vmin", array_min(col("v")))
        .withColumn("vmax", array_max(col("v")))
        .withColumn("scale", (col("vmax") - col("vmin")) / lit(255.0))
        .withColumn("codes", transform(col("v"), x =>
          when(col("scale") === 0.0, lit(0L)).otherwise(
            least(lit(255L), floor((x - col("vmin")) / col("scale"))
              .cast("long")))))
        .withColumn("qcodes",
          transform(col("codes"), c => (c - 128L).cast("byte")))
        // the dequantized norm is precomputed once at build (the nrm
        // convention of the v2 store) — same sequential fold as the
        // oracle's list_dot_product
        .withColumn("dq", transform(col("codes"), c =>
          col("vmin") + (c.cast("double") + lit(0.5)) * col("scale")))
        .withColumn("dq_nrm",
          sqrt(aggregate(col("dq"), lit(0.0), (acc, x) => acc + x * x)))
        .select(col("vec_id"), col("label"), col("vmin"), col("vmax"),
          col("qcodes"), col("dq_nrm"), col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$out/cells")
    }
    out
  }

  /** X31+X4 — QUANTIZED IVF probe with full-precision re-rank, the
    * serving shape a real 100 TB deployment runs: route the query
    * batch driver-side (identical [[probeIndexPath]] routing — same
    * persisted codebook, same FloatDot), scan ONLY the probed cells
    * of the int8 store, score candidates against the EXACT replayable
    * dequantization `vmin + (code + 0.5)·scale` (every step one IEEE
    * double op from stored integers — the DuckDB oracle recomputes
    * the codes from the raw vectors and lands on identical doubles),
    * keep the top `RerankFactor·k` per query by quantized score (ties
    * by vec_id), then RE-RANK those few against the full-precision
    * store — a candidate-bounded keyed join against the same probed
    * cell partitions — through the shared [[scoreTopK]] tail, so the
    * returned scores are exact.
    *
    * Scale shape: the quantized scan moves ~4× fewer vector bytes
    * than [[probeIndexPath]] per probed cell; the re-rank join
    * touches `queries × RerankFactor·k` full vectors regardless of
    * corpus size. Recall vs exact is spec-bounded
    * (QuantizedIvfSpec), and probing every cell with an uncut rerank
    * reproduces brute force exactly — the [[ivfTopK]] anchor,
    * quantization included. */
  def ivfQuantizedProbe(spark: SparkSession, dir: String, k: Int = 10,
      nQueries: Int = 8, nProbe: Int = 2, maxCells: Int = 16,
      rerankFactor: Int = RerankFactor): DataFrame = {
    import spark.implicits._
    val qidx = ivfBuildQuantizedIndex(spark, dir, maxCells)
    val base = ivfBuildIndex(spark, dir, maxCells)
    val cells: Seq[(Int, Seq[Double])] = spark.read
      .parquet(s"$qidx/codebook").select("cell", "centroid")
      .as[(Int, Seq[Double])].collect().toSeq
    val probeN = math.min(nProbe, cells.size)
    val qs: Seq[(Long, Seq[Float], Double)] =
      scorableEmb(t(spark, dir, "embeddings"))
        .filter(col("vec_id") < nQueries)
        .select(col("vec_id"), col("embedding"),
          l2norm(col("embedding")).as("nrm"))
        .as[(Long, Seq[Float], Double)].collect().toSeq
    val fcells: Seq[(Int, Seq[Float])] =
      cells.map { case (id, c) => (id, c.map(_.toFloat)) }
    val routes: Seq[(Long, Int)] = qs.flatMap { case (qId, qEmb, _) =>
      fcells.map { case (id, fc) =>
        (graft.expressions.FloatDot.evalDot(qEmb, fc), id)
      }.sorted.takeRight(probeN).map { case (_, id) => (qId, id) }
    }
    val probedCells = routes.map(_._2).distinct
    val store = spark.read.parquet(s"$qidx/cells")
      .filter(col("cell").isin(probedCells: _*))
      .withColumn("scale", (col("vmax") - col("vmin")) / lit(255.0))
      .withColumn("dq", transform(col("qcodes"), b =>
        col("vmin") +
          ((b.cast("int") + lit(128)).cast("double") + lit(0.5)) *
          col("scale")))
    val shortlist = routes.toDF("q_id", "cell")
      .join(qs.toDF("q_id", "q_emb", "q_nrm"), Seq("q_id"))
      .join(store, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("ascore",
        aggregate(
          zip_with(col("q_emb"), col("dq"),
            (x, y) => x.cast("double") * y),
          lit(0.0), (acc, v) => acc + v) /
          (col("q_nrm") * col("dq_nrm")))
      .withColumn("arn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("ascore").desc, col("vec_id"))))
      .filter(col("arn") <= rerankFactor * k)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("vec_id"))
    val full = spark.read.parquet(s"$base/cells")
      .filter(col("cell").isin(probedCells: _*))
      .select(col("vec_id"), col("embedding"), col("nrm"))
    scoreTopK(shortlist.join(full, Seq("vec_id")), k)
  }

  /** The pure-SQL surface of the native expressions: adjacent-vector
    * dot products computed by `float_dot(...)` resolved from SQL TEXT
    * through the FunctionRegistry ([[graft.plans.GraftExtensions]] —
    * installed by GraftSession via `spark.sql.extensions`), not the
    * Column API. Same bit-exact double fold as the DuckDB
    * `list_dot_product(CAST(.. AS DOUBLE[]))` oracle. The join is equi
    * (`b.vec_id = a.vec_id + 1`) so the plan is a plain shuffle/
    * broadcast hash join at any scale — the point here is the SQL
    * resolution path, which a SQL-only user of the engine needs. */
  def sqlNativeDot(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "embeddings").createOrReplaceTempView("graft_emb_sql")
    spark.sql("""
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        float_dot(a.embedding, b.embedding) AS dot
      FROM graft_emb_sql a
      JOIN graft_emb_sql b ON b.vec_id = a.vec_id + 1
      ORDER BY a_id""")
  }
}
