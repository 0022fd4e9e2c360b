package graft.tools

import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.{GraftSession, Tables}
import graft.ops.{BpeTrain, CorpusStats, Dedup, EditDistance,
  QualitySignals, Similarity, TextAnalysis}

/** Scale-stress harness for the dedup + embedding families: runs the
  * document and ANN operators on 1×/3×/10× corpora derived from sf0.1
  * and reports how cost and output grow with corpus size (results
  * recorded in SCALE_NOTES.md).
  *
  * Document corpus construction keeps the DUPLICATE RATE constant:
  * copy `c` offsets every doc_id and suffixes every token with `c<c>`,
  * so no shingle ever matches across copies — a 10× corpus has 10× the
  * docs, 10× the true near-dup pairs, and (crucially) the same
  * bucket-size distribution shape an organically-10×-larger corpus
  * would have. Naively unioning unperturbed copies would instead make
  * every doc a near-dup of its 9 clones and measure an artificial 45×
  * pair blowup.
  *
  * Embedding corpus construction ([[buildEmbeddingCorpus]]) follows the
  * same principle with vector arithmetic — see its doc.
  *
  * Usage: `runMain graft.tools.ScaleStress [docs|emb|tpch|all]
  * [scales...]` (default `all 1 3 10`); corpora are cached under
  * target/scale/. */
object ScaleStress {

  /** Balanced unionByName — O(log n) plan depth. The left-deep
    * `reduce(_ unionByName _)` form builds a depth-n Column tree whose
    * recursive conversion overflows the default JVM stack around
    * n=100 when each copy also carries per-copy lambda expressions
    * (the embedding corpus' signFlip zip_with). */
  private def treeUnion(dfs: Seq[DataFrame]): DataFrame =
    // fail fast on an empty Seq — grouped(2) of Nil yields nothing and
    // the recursion would spin forever on another empty Seq
    if (dfs.isEmpty)
      throw new IllegalArgumentException("treeUnion: empty input")
    else if (dfs.size == 1) dfs.head
    else treeUnion(dfs.grouped(2).map(g =>
      if (g.size == 1) g.head else g(0).unionByName(g(1))).toSeq)

  /** Deterministic per-copy ±1 sign flip of every element — the
    * "rotation" that separates copies: multiplying floats by ±1 is
    * exact, so WITHIN-copy dot products (and therefore every cosine,
    * LSH signature margin, and centroid up to sign) are bit-preserved,
    * while CROSS-copy cosines collapse to the random band of the
    * near-isotropic corpus (measured ≤ 0.61 at sf0.1 — see
    * SCALE_NOTES). */
  private def signFlip(c: Int, e: Column): Column =
    zip_with(e, sequence(lit(0), size(e) - 1), (x, i) =>
      when(pmod(xxhash64(lit(c), i), lit(2)) === 0, x).otherwise(-x))

  /** Near-dup twin of a vector: ~1/16 of the dims (deterministic by
    * index hash) zeroed. Zeroing is exact, and for the near-isotropic
    * testdata the squared mass in the zeroed dims concentrates at
    * ~1/16, so cos(x, twin) = sqrt(1 - f) ≈ 0.97 (measured min 0.816
    * at sf0.1) — cleanly above the 0.8 detection threshold that the
    * random band (≤0.61) never reaches. */
  private def zeroTwin(e: Column): Column =
    zip_with(e, sequence(lit(0), size(e) - 1), (x, i) =>
      when(pmod(xxhash64(lit("twin"), i), lit(16)) === 0,
        lit(0.0f)).otherwise(x))

  /** Build an n× embedding corpus with a CONSTANT planted near-dup
    * rate. The base table's pairs above 0.4 are pure random-geometry
    * tail (the corpus is near-isotropic: rate 4.6e-4 ≈ the isotropic
    * dim-64 expectation), so at low thresholds pair output inherently
    * grows O(n²) for ANY corpus from this distribution — there is no
    * "true near-dup set" to hold constant. A realistic near-dup
    * workload is instead: a high-similarity band of true duplicates
    * over a random-band background. So each copy is sign-flipped
    * (cross-copy cosines stay in the random band) and 2% of vectors
    * per copy get a planted zeroed-dims twin (cosine ≈ 0.97, id offset
    * +5M within the copy's +10M·c id space; labels offset +1000·c so
    * each copy keeps its own centroid cells). At detection threshold
    * 0.8 the true-pair count grows exactly with n and recall is
    * measurable at every scale. */
  def buildEmbeddingCorpus(spark: SparkSession, srcDir: String,
      out: String, n: Int): Unit = {
    val base = Tables.t(spark, srcDir, "embeddings")
    val copies = (0 until n).map { c =>
      if (c == 0) base
      else base
        .withColumn("vec_id", col("vec_id") + lit(c * 10000000L))
        .withColumn("label", col("label") + lit(c * 1000))
        .withColumn("embedding", signFlip(c, col("embedding")))
    }
    val all = treeUnion(copies)
    val twins = all
      .filter(pmod(xxhash64(col("vec_id")), lit(50)) === 0)
      .withColumn("vec_id", col("vec_id") + lit(5000000L))
      .withColumn("embedding", zeroTwin(col("embedding")))
    all.unionByName(twins)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** Build an n× TPC-H-shaped corpus with CONSTANT per-entity
    * distributions: every data-scaled table is unioned n times with all
    * primary AND foreign keys offset per copy (copy c's orders
    * reference copy c's customers, etc.), so per-customer order counts,
    * join fan-outs, and filter selectivities are exactly those of the
    * base — the way TPC-H itself scales — while dimension tables
    * (region, nation) stay fixed, as in the spec. */
  def buildTpchCorpus(spark: SparkSession, srcDir: String,
      out: String, n: Int): Unit = {
    val OFF = 1000000000L
    val keyCols: Seq[(String, Seq[String])] = Seq(
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"))
    Seq("region", "nation").foreach { tbl =>
      Tables.t(spark, srcDir, tbl)
        .write.mode("overwrite").parquet(s"$out/$tbl.parquet")
    }
    keyCols.foreach { case (tbl, keys) =>
      val base = Tables.t(spark, srcDir, tbl)
      (0 until n).map { c =>
        keys.foldLeft(base)((df, k) =>
          df.withColumn(k, col(k) + lit(c * OFF)))
      }.pipe(treeUnion)
        .write.mode("overwrite").parquet(s"$out/$tbl.parquet")
    }
  }

  /** n× events: per-copy event_id/user_id offsets (more users, same
    * 30-day span — traffic grows per day, the realistic shape for the
    * layout operators: dt-partition COUNT stays fixed while rows per
    * partition scale; the z-order user quartile box keeps selecting
    * ~25% of users at every scale). ts is written as a native Spark
    * timestamp (parquet TIMESTAMP(MICROS)) — [[Tables.normalizeEventTs]]
    * reads that back as a pass-through, and would equally accept the
    * NANOS-long or NTZ encodings if the source ever drifts again. */
  private def buildEventsCorpus(spark: SparkSession, srcDir: String,
      out: String, n: Int): Unit = {
    val base = Tables.t(spark, srcDir, "events")
    (0 until n).map { c =>
      base
        .withColumn("event_id", col("event_id") + lit(c * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(c * 1000000L))
    }.pipe(treeUnion)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }

  private[tools] def buildDocCorpus(spark: SparkSession, srcDir: String,
      out: String, n: Int): Unit = {
    val base = Tables.t(spark, srcDir, "documents")
    val copies = (0 until n).map { c =>
      if (c == 0) base
      else base
        .withColumn("doc_id", col("doc_id") + lit(c * 10000000L))
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", s"$$1c$c"))
    }
    treeUnion(copies)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val (family, scaleArgs) = args.headOption match {
      case Some(f) if !f.forall(_.isDigit) => (f, args.drop(1))
      case _ => ("all", args)
    }
    require(
      Set("docs", "emb", "tpch", "events", "semrec", "pipeline",
        "incrsweep", "all")(family),
      s"unknown family '$family' — expected " +
        "docs|emb|tpch|events|semrec|pipeline|incrsweep|all")
    val scales =
      if (scaleArgs.nonEmpty) scaleArgs.map(_.toInt).toSeq else Seq(1, 3, 10)
    val src = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-scale-stress",
      master = Some(s"local[$cpus]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val runDocs = family == "docs" || family == "all"
    val runEmb = family == "emb" || family == "all"
    val runSemrec = family == "semrec"
    val runPipeline = family == "pipeline"
    val runIncrSweep = family == "incrsweep"
    val runTpch = family == "tpch" || family == "all"
    val runEvents = family == "events" || family == "all"

    def corpusDir(n: Int) = graft.util.Scratch.under(s"scale/x$n").toString
    // _SUCCESS marker, not the dir: a partially-written corpus from a
    // crashed run would otherwise be reused and skew the measurements
    def ready(path: String) =
      new java.io.File(s"$path/_SUCCESS").exists()
    scales.foreach { n =>
      val out = corpusDir(n)
      if ((runDocs || runPipeline || runIncrSweep) &&
          !ready(s"$out/documents.parquet"))
        buildDocCorpus(spark, src, out, n)
      if ((runEmb || runSemrec || runPipeline || runIncrSweep) &&
          !ready(s"$out/embeddings.parquet"))
        buildEmbeddingCorpus(spark, src, out, n)
      if (runTpch && !ready(s"$out/lineitem.parquet"))
        buildTpchCorpus(spark, src, out, n)
      if (runEvents && !ready(s"$out/events.parquet"))
        buildEventsCorpus(spark, src, out, n)
    }

    // full materialization for every timed op (graft.util.Exec doc:
    // count() prunes per-row work and even whole join subtrees out of
    // the timed plan — span_scrub's count optimized to a bare scan)
    def m(df: org.apache.spark.sql.DataFrame): Long =
      graft.util.Exec.materialize(df)

    // clearPairsMemo before every pair-consumer run: the session memo
    // would otherwise turn the 2nd+ runs into memo hits and the growth
    // table would measure the incremental cost, not the pipeline
    val docOps: Seq[(String, String => Long)] = Seq(
      "neardup_minhash" -> (d => m(Dedup.nearDupPairs(spark, d))),
      // serving split: index build lands in the warmup pass (memoized,
      // _SUCCESS-gated), timed passes measure the PROBE — same
      // treatment as ann_ivf_probe
      "neardup_probe" -> (d => m(Dedup.neardupProbe(spark, d))),
      "simhash_pairs" -> (d => m(Dedup.simhashPairs(spark, d))),
      "ngram_jaccard" -> (d => {
        Dedup.clearPairsMemo(); m(Dedup.ngramJaccard(spark, d)) }),
      // X62 exact prefix-filtered join: per-copy token suffixes keep
      // qualifying pairs within-copy, so output grows exactly with n
      // while the prefix filter has to survive an n×-larger shingle
      // df table and candidate space
      "jaccard_prefix_join" ->
        (d => m(Dedup.jaccardPrefixJoin(spark, d))),
      "containment_join" ->
        (d => m(Dedup.containmentJoin(spark, d))),
      // X62b/X67b serving splits: index build lands in the warmup pass
      // (_SUCCESS-gated per corpus), timed passes measure the PROBE —
      // same accounting as neardup_probe/ann_ivf_probe
      "jaccard_probe" -> (d => m(Dedup.jaccardProbe(spark, d))),
      // X106b: the asset + variant stores land in warmup (one PPM per
      // doc, memoized per corpus listing); timed passes measure the
      // REAL per-run work — binaryFile scan → decode+dHash
      // mapPartitions → banded pair join
      "media_neardup" -> (d =>
        m(graft.ops.MediaNeardup.mediaNeardup(spark, d))),
      "containment_probe" ->
        (d => m(Dedup.containmentProbe(spark, d))),
      // the SERVING regime: batchMod ∝ scale keeps the incoming batch
      // a CONSTANT ~714 docs while the indexed corpus grows n× — the
      // daily-increment shape whose near-flat curve is the split's
      // whole point (the plain probe rows above scale the batch WITH
      // the corpus and so measure batch growth, not serving cost)
      "jaccard_probe_fb" -> (d => {
        val n = "x(\\d+)$".r.findFirstMatchIn(d)
          .map(_.group(1).toInt).getOrElse(1)
        m(Dedup.jaccardProbe(spark, d, batchMod = 7 * n)) }),
      "containment_probe_fb" -> (d => {
        val n = "x(\\d+)$".r.findFirstMatchIn(d)
          .map(_.group(1).toInt).getOrElse(1)
        m(Dedup.containmentProbe(spark, d, batchMod = 7 * n)) }),
      // X71 exact edit-distance join: per-copy token suffixes push
      // cross-copy pairs far beyond tau, so output grows exactly with
      // n while the segment filter survives an n×-larger
      // substring/segment space. Cold checkpoint per timed run (the
      // Bench r12 protocol)
      "edit_distance_join" -> (d => {
        Dedup.clearPairsMemo(); m(EditDistance.editDistanceJoin(spark, d)) }),
      // X71b serving split: index build lands in the warmup pass
      // (_SUCCESS-gated per corpus), timed passes measure the PROBE
      "edit_distance_probe" ->
        (d => m(EditDistance.editDistanceProbe(spark, d))),
      // the SERVING regime: batchMod ∝ scale keeps the incoming batch
      // constant while the indexed corpus grows n× (the jaccard/_fb
      // accounting)
      "edit_distance_probe_fb" -> (d => {
        val n = "x(\\d+)$".r.findFirstMatchIn(d)
          .map(_.group(1).toInt).getOrElse(1)
        m(EditDistance.editDistanceProbe(spark, d, batchMod = 7 * n)) }),
      // X63 encode: vocabulary (and therefore merge-application work)
      // grows with n — the scale claim is that the CORPUS cost stays
      // the two scans + one keyed join
      "bpe_encode" -> (d => m(BpeTrain.bpeEncode(spark, d))),
      "word_rarity" -> (d => m(QualitySignals.wordRarity(spark, d))),
      "dedup_groups" -> (d => {
        Dedup.clearPairsMemo(); m(Dedup.dedupGroups(spark, d)) }),
      // X76: dedup_groups' component machinery + the manifest agg —
      // cold pair cache per run, same accounting as dedup_groups
      "dedup_canonical" -> (d => {
        Dedup.clearPairsMemo(); m(Dedup.dedupCanonical(spark, d)) }),
      // X77: per-lang exact percentile (lang-sized stats) + one
      // broadcast verdict pass — the stats-join-back class
      "length_outliers" ->
        (d => m(QualitySignals.lengthOutliers(spark, d))),
      // X78: one source-sized agg (construction) + broadcast rates +
      // per-row coin — growth should be scan-bound
      "temperature_mix" ->
        (d => m(graft.ops.Reshape.temperatureMix(spark, d))),
      // X80: scorer fan-out into the checkpointed base + bounded-
      // relation rank windows; cold checkpoint per timed run
      "quality_calibrated" -> (d => {
        graft.util.CkptMemo.clear()
        m(QualitySignals.qualityCalibrated(spark, d)) }),
      // X81 serving split: stats build lands in the warmup pass
      // (_SUCCESS-gated per corpus), timed passes measure the PROBE
      "quality_gate_probe" ->
        (d => m(QualitySignals.qualityGateProbe(spark, d))),
      // the SERVING regime: batchMod ∝ scale keeps the batch constant
      // while the corpus (and its persisted stats) grow n×
      "quality_gate_probe_fb" -> (d => {
        val n = "x(\\d+)$".r.findFirstMatchIn(d)
          .map(_.group(1).toInt).getOrElse(1)
        m(QualitySignals.qualityGateProbe(spark, d, batchMod = 7 * n)) }),
      // X79: pair-stream cell rollup — cold pair cache per run, same
      // accounting as dedup_groups/dedup_canonical
      "source_overlap_matrix" -> (d => {
        Dedup.clearPairsMemo(); m(Dedup.sourceOverlapMatrix(spark, d)) }),
      // X72: dedup_groups' component machinery + the split projection
      "leakage_safe_split" -> (d => {
        Dedup.clearPairsMemo()
        m(graft.ops.Reshape.leakageSafeSplit(spark, d)) }),
      // X20 (r13 pre-pass): cost must be the two column-pruned phase
      // scans — the windowed survivor set stays ~headroom·k per lang
      // at every corpus size, so growth tracks the scan, not a sort
      "take_stratified" ->
        (d => m(graft.ops.Reshape.takeStratified(spark, d))),
      // X73/X74: embarrassingly parallel scoring + one keyed agg
      "lang_mismatch" -> (d => m(TextAnalysis.langMismatch(spark, d))),
      "weighted_sample" ->
        (d => m(graft.ops.Reshape.weightedSample(spark, d))),
      // X75: per-source budgets are FIXED while the corpus grows n× —
      // the selected prefix stays ~budget-sized, so growth measures
      // the scan + phase-1 agg, the claim the two-phase design makes
      "token_budget_mix" ->
        (d => m(graft.ops.Reshape.tokenBudgetMix(spark, d))),
      // X82: the scan-speed claim measured directly — the n× documents
      // corpus wrapped in synthetic page chrome (nav/script/links/
      // footer), then the full extraction chain; pure per-row
      // projection, so growth must track the scan
      "html_extract" -> (d =>
        m(graft.ops.HtmlExtract.htmlExtractFrom(
          graft.ops.HtmlExtract.chromeWrap(
            Tables.t(spark, d, "documents"))))),
      // X83: billions-of-links → hosts rollup claim — chrome-wrapped
      // pages carrying per-doc host + fragment/utm variants, so the
      // normalization chain and the two count-distincts all do real
      // work; host domain ~1000 regardless of corpus size
      "link_hosts" -> (d =>
        m(graft.ops.HtmlExtract.linkHostsFrom(
          Tables.t(spark, d, "documents").select(col("doc_id"),
            concat(
              lit("<html><body><p>x "),
              lit("<a href='http://H"), pmod(col("doc_id"), lit(1000)),
              lit(".test/p"), col("doc_id"), lit(".html#frag'>a</a> "),
              lit("<a href='http://h"), pmod(col("doc_id"), lit(1000)),
              lit(".test/p"), col("doc_id"),
              lit(".html?utm_source=s'>b</a> "),
              lit("<a href='/rel'>c</a></p></body></html>"))
              .as("html"))))),
      // X84: the composed crawl-entry pipeline over the MIXED-chrome
      // n× corpus (half flag-free, so admission passes ~half and the
      // exact-dedup window + MinHash near-dup stage do corpus-sized
      // work — the all-flagged r13 wrap measured extraction only) —
      // extraction (checkpointed once) + admission + dedup stages +
      // source rollup; growth must stay LSH-shuffle-bound
      "crawl_ingest" -> (d => {
        Dedup.clearPairsMemo()
        m(graft.ops.HtmlExtract.crawlIngestFrom(
          graft.ops.HtmlExtract.chromeWrapMixed(
            Tables.t(spark, d, "documents")))) }),
      // X83b: the resolved rollup — same link mix plus a synthetic
      // per-page page_url, so the normalize+resolve chain (scheme/
      // root/dir derivation, four CASE arms) runs per link; still a
      // pure projection into one keyed agg, so growth must track the
      // uniform link_hosts leg
      "link_hosts_resolved" -> (d =>
        m(graft.ops.HtmlExtract.linkHostsResolvedFrom(
          Tables.t(spark, d, "documents").select(col("doc_id"),
            concat(lit("http://s"), pmod(col("doc_id"), lit(1000)),
              lit(".test/a/p"), col("doc_id"), lit(".html"))
              .as("page_url"),
            concat(
              lit("<html><body><p>x "),
              lit("<a href='http://h"), pmod(col("doc_id"), lit(1000)),
              lit(".test/p"), col("doc_id"), lit(".html#frag'>a</a> "),
              lit("<a href='rel"), col("doc_id"), lit(".html'>b</a> "),
              lit("<a href='/abs"), col("doc_id"), lit("'>c</a> "),
              lit("<a href='//cdn"), pmod(col("doc_id"), lit(1000)),
              lit(".test/l.js'>d</a></p></body></html>"))
              .as("html"))))),
      // X85: takedown write-back + manifest — the store is dropped
      // before each pass so the curve prices the file-granular
      // retire-then-rewrite (affected files only; untouched part
      // files hard-linked) and the three source rollups, not the
      // _SUCCESS memo hit a weekly re-report would enjoy
      "takedown_propagate" -> (d => {
        graft.util.Scratch.deleteRecursive(
          java.nio.file.Paths.get("target/graft_takedown"))
        m(graft.ops.Takedown.takedownPropagate(spark, d)) }),
      // X88: novel-frontier anti-join — the same resolved-frontier mix
      // (seen side = n× page_urls, frontier side = 4 links/page with
      // the self-ish /abs links novel); both sides corpus-scaled, so
      // the curve prices the canonical keyed anti-join on the URL
      "frontier_novel" -> (d =>
        m(graft.ops.HtmlExtract.frontierNovelFrom(
          Tables.t(spark, d, "documents").select(col("doc_id"),
            concat(lit("http://s"), pmod(col("doc_id"), lit(1000)),
              lit(".test/a/p"), col("doc_id"), lit(".html"))
              .as("page_url"),
            concat(
              lit("<html><body><p>x "),
              lit("<a href='http://h"), pmod(col("doc_id"), lit(1000)),
              lit(".test/p"), col("doc_id"), lit(".html#frag'>a</a> "),
              lit("<a href='rel"), col("doc_id"), lit(".html'>b</a> "),
              lit("<a href='/abs"), col("doc_id"), lit("'>c</a> "),
              lit("<a href='//cdn"), pmod(col("doc_id"), lit(1000)),
              lit(".test/l.js'>d</a></p></body></html>"))
              .as("html"))))),
      // X102: the rule battery straight over the scaled corpus — the
      // repetition aggs are the corpus-sized term (doc-local gram
      // keys, map-side combined); scalar rules ride the same scan
      "gopher_rules" -> (d =>
        m(graft.ops.QualitySignals.gopherRules(spark, d))),
      // X100: robots parsing scales with HOSTS, not corpus bytes — one
      // synthetic multi-group body per host (n hosts at scale n); the
      // line/run/rule_order windows partition per host and must
      // parallelize across them
      "robots_parse" -> (d =>
        m(graft.ops.Robots.robotsParseFrom(
          Tables.t(spark, d, "documents").select(
            concat(lit("s"), col("doc_id"), lit(".test")).as("host"),
            concat(lit("# synthetic\nUser-agent: *\nUser-agent: bot"),
              pmod(col("doc_id"), lit(7)),
              lit("\nDisallow: /p"), col("doc_id"),
              lit("\nAllow: /p"), col("doc_id"),
              lit("/ok\nCrawl-delay: 2\n\nUser-agent: other\n"),
              lit("Disallow: /x")).as("body"))))),
      // X105: components over the same synthetic page mix — the edge
      // derivation is the corpus-sized term; the label rounds run on
      // the checkpointed host-bounded pair set (~1k 2-host components)
      "host_clusters" -> (d =>
        m(graft.ops.LinkGraph.hostClustersFrom(
          Tables.t(spark, d, "documents").select(col("doc_id"),
            lit("syn").as("source"),
            concat(lit("http://s"), pmod(col("doc_id"), lit(1000)),
              lit(".test/a/p"), col("doc_id"), lit(".html"))
              .as("page_url"),
            concat(
              lit("<html><body><p>x "),
              lit("<a href='http://h"), pmod(col("doc_id"), lit(1000)),
              lit(".test/p"), col("doc_id"), lit(".html'>a</a>"),
              lit("</p></body></html>")).as("html"))))),
      // X99: the composed priority over the same synthetic page mix as
      // the pagerank leg — corpus-sized extraction/novelty/trap scans
      // into host-bounded rollups (~2k hosts at every scale), then the
      // fixed-cost 10-round rank iteration and host-keyed joins
      "host_priority" -> (d =>
        m(graft.ops.LinkGraph.hostPriorityFrom(
          Tables.t(spark, d, "documents").select(col("doc_id"),
            lit("syn").as("source"),
            concat(lit("http://s"), pmod(col("doc_id"), lit(1000)),
              lit(".test/a/p"), col("doc_id"), lit(".html"))
              .as("page_url"),
            concat(
              lit("<html><body><p>"),
              substring(col("text"), 1, 40),
              lit(" <a href='http://h"), pmod(col("doc_id"), lit(1000)),
              lit(".test/p"), col("doc_id"), lit(".html'>a</a> "),
              lit("<a href='rel"), col("doc_id"), lit(".html'>b</a>"),
              lit("</p></body></html>")).as("html"))))),
      // X98: sitemap ingestion with BOTH sides corpus-scaled — one
      // single-entry sitemap row per doc (even ids declare an
      // already-crawled loc, odd ids a fresh one) against the n×
      // crawled-URL seen set; prices the block parse, the (host, url)
      // fold and the url-keyed novelty join at scale
      "sitemap_ingest" -> (d => {
        val base = Tables.t(spark, d, "documents").select(col("doc_id"),
          concat(lit("s"), pmod(col("doc_id"), lit(1000)), lit(".test"))
            .as("host"))
        m(graft.ops.Sitemap.sitemapIngestFrom(
          base.select(col("host"),
            concat(lit("http://"), col("host"), lit("/sitemap.xml"))
              .as("sitemap_url"),
            concat(lit("<urlset><url><loc>http://"), col("host"),
              when(pmod(col("doc_id"), lit(2)) === 0, lit("/a/p"))
                .otherwise(lit("/new/p")),
              col("doc_id"),
              lit(".html</loc><lastmod>2024-01-01</lastmod></url>"),
              lit("</urlset>")).as("xml")),
          base.select(col("doc_id"),
            concat(lit("http://"), col("host"), lit("/a/p"),
              col("doc_id"), lit(".html")).as("page_url"),
            lit("<p>x</p>").as("html")))) }),
      // X97: anchor-text rollup with a mega-hot TARGET host — every
      // page's first anchor points at hot.test with its own 64 chars
      // of text, so one host owns n× of the (host, term) mass; the
      // map-side (host, term) combine plus TopKPerKey's partial heaps
      // (≤ k rows per host per partition cross the exchange) must
      // absorb it
      "anchor_text" -> (d =>
        m(graft.ops.HtmlExtract.anchorTextFrom(
          Tables.t(spark, d, "documents").select(col("doc_id"),
            concat(lit("http://s"), pmod(col("doc_id"), lit(1000)),
              lit(".test/a/p"), col("doc_id"), lit(".html"))
              .as("page_url"),
            concat(
              lit("<html><body><p>"),
              lit("<a href='http://hot.test/p"), col("doc_id"),
              lit(".html'>"), substring(col("text"), 1, 64),
              lit("</a> "),
              lit("<a href='http://h"), pmod(col("doc_id"), lit(1000)),
              lit(".test/x'>"), substring(col("text"), 65, 64),
              lit("</a></p></body></html>")).as("html"))))),
      // X96: crawl-trap detection under its own skew — EVERY page
      // links the same session-id path on one hot host (n× distinct
      // variants of ONE (host, path) key at scale n) plus a healthy
      // per-page path; the two-phase distinct-count must absorb the
      // hot path map-side (partial count after dedup), never funnel
      // n variants through one reducer
      "crawl_traps" -> (d =>
        m(graft.ops.HtmlExtract.crawlTrapsFrom(
          Tables.t(spark, d, "documents").select(col("doc_id"),
            concat(lit("http://s"), pmod(col("doc_id"), lit(1000)),
              lit(".test/a/p"), col("doc_id"), lit(".html"))
              .as("page_url"),
            concat(
              lit("<html><body><p>x "),
              lit("<a href='http://hot.test/list?sid="),
              col("doc_id"), lit("'>s</a> "),
              lit("<a href='http://h"), pmod(col("doc_id"), lit(1000)),
              lit(".test/p"), col("doc_id"), lit(".html'>a</a>"),
              lit("</p></body></html>"))
              .as("html"))))),
      // X95: paragraph keep-first dedup under the REAL skew shape —
      // every page shares two boilerplate paragraphs (mega-hot hash
      // keys: n× occupancy at scale n) around its unique body; the
      // map-side-combined winner agg must absorb them where a
      // row_number window would funnel each hot key through one
      // reducer
      "paragraph_dedup" -> (d =>
        m(graft.ops.HtmlExtract.paragraphDedupFrom(
          Tables.t(spark, d, "documents").select(col("doc_id"),
            concat(
              lit("<html><body><p>subscribe to our newsletter</p><p>"),
              col("text"),
              lit("</p><p>(c) 2024 corp - all rights reserved</p>"),
              lit("</body></html>")).as("html"))))),
      // X90: host-graph PageRank over the same synthetic page mix —
      // the edge-derivation scan is corpus-sized while the graph
      // stays host-bounded (~2k hosts at every scale: doc_id % 1000
      // source hosts linking h/cdn targets), so the curve prices the
      // distinct-edge rollup feeding a scale-FLAT 10-round iteration
      // over the bounded rank vector — the 100 TB shape: corpus-sized
      // scan once, host-sized graph forever after
      "link_pagerank" -> (d =>
        m(graft.ops.LinkGraph.pagerank(graft.ops.LinkGraph.hostEdges(
          Tables.t(spark, d, "documents").select(col("doc_id"),
            concat(lit("http://s"), pmod(col("doc_id"), lit(1000)),
              lit(".test/a/p"), col("doc_id"), lit(".html"))
              .as("page_url"),
            concat(
              lit("<html><body><p>x "),
              lit("<a href='http://h"), pmod(col("doc_id"), lit(1000)),
              lit(".test/p"), col("doc_id"), lit(".html#frag'>a</a> "),
              lit("<a href='rel"), col("doc_id"), lit(".html'>b</a> "),
              lit("<a href='/abs"), col("doc_id"), lit("'>c</a> "),
              lit("<a href='//cdn"), pmod(col("doc_id"), lit(1000)),
              lit(".test/l.js'>d</a></p></body></html>"))
              .as("html")))))),
      // X88b fixed-batch leg: the seen store is built once per scale
      // dir (n×-sized, _SUCCESS-gated) and a CONSTANT-sized batch
      // (batchMod ∝ scale) probes it — the daily-loop claim: probe
      // cost is batch work + one streaming scan of the URL store,
      // flat-ish as the crawl grows
      "frontier_novel_fb" -> (d => {
        // (scaleOf is defined below docOps — inline the same parse)
        val sc = "x(\\d+)$".r.findFirstMatchIn(d)
          .map(_.group(1).toLong).getOrElse(1L)
        val pages = Tables.t(spark, d, "documents").select(col("doc_id"),
          concat(lit("http://s"), pmod(col("doc_id"), lit(1000)),
            lit(".test/a/p"), col("doc_id"), lit(".html"))
            .as("page_url"),
          concat(
            lit("<html><body><p>x "),
            lit("<a href='http://h"), pmod(col("doc_id"), lit(1000)),
            lit(".test/p"), col("doc_id"), lit(".html'>a</a> "),
            lit("<a href='/abs"), col("doc_id"), lit("'>c</a></p>"),
            lit("</body></html>")).as("html"))
        val store = s"target/graft_frontier/stress_${Tables.pathTag(d)}"
        if (!Tables.successExists(spark, store)) {
          pages.select(graft.ops.HtmlExtract
              .normalizeUrl(col("page_url")).as("url")).distinct()
            .write.mode("overwrite").parquet(store)
        }
        m(graft.ops.HtmlExtract.frontierNovelProbeFor(spark,
          pages.filter(pmod(col("doc_id"), lit(4L * sc)) === 0),
          store)) }),
      // X87: robots gate over the same resolved-frontier mix plus a
      // synthetic rules table (half the 1000 hosts carry a disallow +
      // carve-out + delay) — per-URL broadcast prefix match + the
      // verdict window; growth must track the X83b leg (the resolve
      // stage's whole-stage-codegen fallback included)
      "robots_gate" -> (d => {
        import spark.implicits._
        val rules = (0 until 500).flatMap { h =>
          Seq((s"h$h.test", "*", "disallow", "/p", 1L),
            (s"h$h.test", "*", "allow", "/p1", 2L),
            (s"h$h.test", "*", "crawl-delay", (1 + h % 5).toString, 3L))
        }.toDF("host", "agent", "directive", "value", "rule_order")
        m(graft.ops.Robots.robotsGateFrom(
          graft.ops.HtmlExtract.resolvedUrls(
            Tables.t(spark, d, "documents").select(col("doc_id"),
              concat(lit("http://s"), pmod(col("doc_id"), lit(1000)),
                lit(".test/a/p"), col("doc_id"), lit(".html"))
                .as("page_url"),
              concat(
                lit("<html><body><p>x "),
                lit("<a href='http://h"), pmod(col("doc_id"), lit(1000)),
                lit(".test/p"), col("doc_id"), lit(".html#frag'>a</a> "),
                lit("<a href='rel"), col("doc_id"), lit(".html'>b</a> "),
                lit("<a href='/abs"), col("doc_id"), lit("'>c</a> "),
                lit("<a href='//cdn"), pmod(col("doc_id"), lit(1000)),
                lit(".test/l.js'>d</a></p></body></html>"))
                .as("html"))),
          rules)) }),
      // X83 skew leg: 90% of links on ONE host (every crawl has a
      // YouTube) — the hot key must be absorbed by the map-side
      // partial agg, so this curve must match the uniform leg's
      "link_hosts_skew" -> (d => {
        val host = when(pmod(col("doc_id"), lit(10)) < 9, lit(0))
          .otherwise(pmod(col("doc_id"), lit(1000)))
        m(graft.ops.HtmlExtract.linkHostsFrom(
          Tables.t(spark, d, "documents").select(col("doc_id"),
            concat(
              lit("<html><body><a href='http://h"), host,
              lit(".test/p"), col("doc_id"), lit("'>x</a> "),
              lit("<a href='http://h"), host,
              lit(".test/q"), col("doc_id"),
              lit("#f'>y</a></body></html>"))
              .as("html")))) }),
      "clean_corpus" -> (d => {
        Dedup.clearPairsMemo(); m(TextAnalysis.cleanCorpus(spark, d)) }),
      "heavy_hitters" -> (d => m(CorpusStats.heavyHitters(spark, d))),
      "bpe_train" -> (d => m(BpeTrain.bpeTrain(spark, d))),
      "kmv_distinct" -> (d => m(CorpusStats.kmvDistinct(spark, d))),
      "tfidf_top_terms" -> (d => m(CorpusStats.tfidfTopTerms(spark, d))),
      "inverted_index" -> (d => m(CorpusStats.invertedIndex(spark, d))),
      "bigram_novelty" -> (d => m(CorpusStats.bigramNovelty(spark, d))),
      // X91: the tokenize checkpoint lands in the warmup pass
      // (listing-tag memo, shared with any co-running quality op);
      // timed passes price the model rollup + the two keyed scoring
      // joins — the recurring cost when the LM is retrained per run
      "ngram_lm_score" -> (d => m(QualitySignals.ngramLmScore(spark, d))),
      "doc_chunk" -> (d => m(graft.ops.Reshape.docChunk(spark, d))),
      "span_scrub" -> (d => m(Dedup.repeatedSpanScrub(spark, d))),
      "media_embed_topk" ->
        (d => m(graft.ops.Multimodal.mediaEmbedTopK(spark, d))),
      "ngram_repetition" -> (d => m(QualitySignals.ngramRepetition(spark, d))),
      "decontaminate" -> (d => m(QualitySignals.decontaminate(spark, d))),
      "zipf_spectrum" -> (d => m(QualitySignals.zipfSpectrum(spark, d))),
      // X106e: the consolidation store lands in the warmup pass
      // (_SUCCESS-gated per corpus listing); timed passes measure the
      // READ-BACK manifest — three listings + one slim index scan,
      // the recurring cost. The build itself is drop-list-bounded
      // links + a file-granular index rewrite (affected-file-bounded)
      "media_apply" -> (d =>
        m(graft.ops.MediaNeardup.mediaApply(spark, d))),
      // X109a/b: the WAV store lands in warmup (one clip per doc,
      // memoized per corpus listing); timed passes measure the real
      // per-run work — binaryFile scan → decode+fingerprint
      // mapPartitions → (neardup only) the banded pair join
      "audio_ingest" -> (d =>
        m(graft.ops.AudioNeardup.audioIngest(spark, d))),
      "audio_neardup" -> (d =>
        m(graft.ops.AudioNeardup.audioNeardup(spark, d))),
      // X110: the Y4M store lands in warmup (one clip per doc,
      // memoized per corpus listing); timed passes measure the real
      // per-run work — binaryFile scan → decode + per-frame features
      // (ingest/frames) or keyframe hash + banded pairs (neardup)
      "video_ingest" -> (d =>
        m(graft.ops.VideoNeardup.videoIngest(spark, d))),
      "video_frames" -> (d =>
        m(graft.ops.VideoNeardup.videoFrames(spark, d))),
      "video_neardup" -> (d =>
        m(graft.ops.VideoNeardup.videoNeardup(spark, d))),
      // X110d: all-frames hash + shingle equality join — the growth
      // axis is shingle-bucket occupancy, never all-pairs
      "video_subclip" -> (d =>
        m(graft.ops.VideoNeardup.videoSubclip(spark, d))),
      // X110e: both pair channels + checkpointed label rounds + the
      // manifest join/agg — the media_canonical accounting
      "video_canonical" -> (d =>
        m(graft.ops.VideoNeardup.videoCanonical(spark, d))),
      // X111: three header-decode scans into one doc-keyed agg — the
      // curve must stay scan-bound (ledger rows are all that shuffle)
      "multimodal_manifest" -> (d =>
        m(graft.ops.MediaManifest.multimodalManifest(spark, d))),
      // X112: the write-back lands in warmup (_SUCCESS-memoized,
      // drop-bounded); timed passes price the read-back manifest —
      // three path listings + the retired-set decode
      "asset_gc" -> (d =>
        m(graft.ops.AssetGc.assetGc(spark, d))),
      // X113: three base-asset decodes + the doc-keyed cost agg +
      // ONE window exchange — must track seq_packing's curve plus
      // the scan term
      "multimodal_pack" -> (d =>
        m(graft.ops.MediaManifest.multimodalPack(spark, d))),
      // X108: the full composed web pipeline over the mixed-chrome n×
      // corpus with synthetic per-page URLs (1000-host domain; the
      // committed rules leave them default-allowed, so every stage
      // does corpus-sized work); cold pair memo per run — growth must
      // stay extraction+LSH-bound, the seam the query exists to audit
      "web_pipeline" -> (d => {
        Dedup.clearPairsMemo()
        val pages = graft.ops.HtmlExtract.chromeWrapMixed(
            Tables.t(spark, d, "documents"))
          .withColumn("page_url",
            concat(lit("http://s"), pmod(col("doc_id"), lit(1000)),
              lit(".test/a/p"), col("doc_id"), lit(".html")))
        m(graft.ops.WebPipeline.webPipelineFrom(spark, pages,
          graft.ops.Robots.fixtureRules(spark),
          "graft_pipeline_web/stress_" + Tables.pathTag(d))) }))

    // ANN family, in its realistic regime: detection threshold 0.8 (the
    // planted-dup band; the registered 0.4 default sits inside the
    // random band, where output is inherently O(n²) — see
    // buildEmbeddingCorpus). nBits grows with the corpus (+log2 n) to
    // hold bucket occupancy constant — the knob a 100 TB deployment
    // turns; recall at each scale is printed below.
    def scaleOf(d: String): Int =
      "x(\\d+)$".r.findFirstMatchIn(d).map(_.group(1).toInt).getOrElse(1)
    def nextPrime(n: Int): Int =
      Iterator.from(n).find(p => p > 1 &&
        (2 to math.sqrt(p.toDouble).toInt).forall(p % _ != 0)).get
    def lshBits(d: String): Int =
      8 + math.round(math.log(scaleOf(d).toDouble) / math.log(2.0)).toInt
    val embOps: Seq[(String, String => Long)] = Seq(
      "similarity_topk" -> (d => m(Similarity.cosineTopK(spark, d))),
      "ann_lsh_pairs" -> (d =>
        m(Similarity.lshPairs(spark, d, threshold = 0.8,
          nBits = lshBits(d)))),
      "ann_ivf_topk" -> (d => m(Similarity.ivfTopK(spark, d))),
      "ann_ivf_probe" -> (d => m(Similarity.ivfProbeTopK(spark, d))),
      // X31+X4 serving split: quantized store derives from the full
      // index in warmup; timed passes measure the int8 probe + the
      // shortlist's full-precision re-rank
      "ann_ivf_quantized" -> (d =>
        m(Similarity.ivfQuantizedProbe(spark, d))),
      "cosine_pairs" -> (d =>
        m(Similarity.cosinePairs(spark, d, threshold = 0.8))),
      "embedding_quantize" -> (d => m(Similarity.quantizeInt8(spark, d))),
      // X61 in its realistic regime: detection threshold 0.8 (planted
      // twin band — the registered 0.4 sits in the random band, where
      // within-cell output is inherently quadratic) and maxCells
      // scaled with the corpus, the SemDeDup 100 TB knob: cluster
      // count grows so per-cell quadratic mass stays ~constant. A
      // PRIME cell count, because the stress corpus offsets labels by
      // +1000·copy: gcd(1000, 16n) > 1 would alias many copies onto
      // the same label-fold cells and fake a quadratic blowup the
      // operator doesn't have
      "semdedup" -> (d =>
        m(Similarity.semDedup(spark, d, tau = 0.8,
          maxCells = nextPrime(16 * scaleOf(d))))),
      // X61c: the iterative greedy form in the same regime — the
      // extra axis vs semdedup is the round count (longest blocking
      // chain), which planted-twin cliques keep at 2-3
      "semdedup_greedy" -> (d =>
        m(Similarity.semDedupGreedy(spark, d, tau = 0.8,
          maxCells = nextPrime(16 * scaleOf(d))))),
      "embedding_outliers" -> (d =>
        m(Similarity.embeddingOutliers(spark, d,
          maxCells = nextPrime(16 * scaleOf(d))))),
      "semantic_decon" -> (d =>
        m(Similarity.semanticDecontaminate(spark, d,
          maxCells = nextPrime(16 * scaleOf(d))))),
      "centroid_udaf" -> (d =>
        m(Similarity.centroidByLabelFlat(spark, d))))

    // the registered TPC-H shapes verbatim (same code path the gate and
    // bench run): at sf0.1 fixed overheads dominate, so broadcast-
    // threshold flips and AQE plan changes only show at 10×
    val tpchOps: Seq[(String, String => Long)] =
      graft.SparkEntry.registry.collect {
        case (name, q) if name.matches("q\\d+.*") ||
            Set("bloom_join", "percentiles", "percentiles_approx",
              "dq_audit")(name) =>
          name -> ((d: String) => m(q.fn(spark, d)))
      }
    // rows_in overrides for ops whose input is NOT their family's
    // default count table (dq_audit scans orders, not lineitem)
    val countTableOverride = Map("dq_audit" -> "orders")

    // layout + skew queries over the scaled events corpus, verbatim
    // from the registry (store writes are memoized per corpus dir, so
    // the warmup pass pays the layout write and the timed passes
    // measure the pruned reads — same accounting as bucketed_join)
    // the COMPOSED corpus pipeline (X69) — the round-11 composition
    // curve: every stage checkpoint is rebuilt per timed invocation
    // (clearPairsMemo clears CkptMemo too), so the number is the full
    // chain cost, not a memo hit
    // semantic stages in the planted-twin regime (tau 0.8, cells ∝
    // corpus) — the same knobs the standalone semdedup stress turns;
    // the registered defaults would measure the random cosine band's
    // inherent quadratic, not the composition
    // rarityMax scales with n: this corpus construction (per-copy
    // token suffixes) keeps per-word frequency CONSTANT while the
    // corpus total grows n× — so mean inverse probability grows n×
    // for every doc, and the fixed registered threshold would wipe
    // the corpus at 10×+ (a real corpus grows frequencies with
    // volume; the registered threshold is calibrated for that)
    val pipelineOps: Seq[(String, String => Long)] = Seq(
      // X76b serving split (pipeline family — it rewrites BOTH corpus
      // tables, so it needs the documents AND embeddings corpora):
      // the write-back store lands in the warmup pass (_SUCCESS-gated
      // per corpus listing); timed passes measure the manifest — one
      // conditional-agg corpus scan + the read-back rollup (the
      // takedown accounting)
      "dedup_apply" -> (d => m(graft.ops.Takedown.dedupApply(spark, d))),
      // X70 serving regime: batchMod ∝ scale keeps the increment a
      // constant ~714 docs while the corpus (and its indexes) grow n×
      "corpus_pipeline_incr" -> (d => {
        val n = scaleOf(d)
        Dedup.clearPairsMemo()
        m(graft.ops.CorpusPipeline.corpusPipelineIncr(spark, d,
          batchMod = 7 * n, rarityMax = 40.0 * n)) }),
      "corpus_pipeline" -> (d => {
        Dedup.clearPairsMemo()
        m(graft.ops.CorpusPipeline.corpusPipeline(spark, d,
          semTau = 0.8, semCells = nextPrime(16 * scaleOf(d)),
          rarityMax = 40.0 * scaleOf(d))) }))

    val eventsOps: Seq[(String, String => Long)] =
      Seq("skew_join", "dpp_scan", "zorder_box", "dq_window").map { name =>
        val fn = graft.SparkEntry.queries(name)
        name -> ((d: String) => m(fn(spark, d)))
      }

    // each op carries its family's input table so rows_in is right even
    // under family=all (a single shared count table would report the
    // documents count against embedding/TPC-H rows)
    // optional name filter: SPARK_GRAFT_OPS=a,b,c runs only those ops
    val opFilter = sys.env.get("SPARK_GRAFT_OPS")
      .map(_.split(",").map(_.trim).toSet)
    val ops: Seq[(String, String, String => Long)] =
      ((if (runDocs) docOps.map { case (n, f) => (n, "documents", f) }
        else Nil) ++
       (if (runEmb) embOps.map { case (n, f) => (n, "embeddings", f) }
        else Nil) ++
       (if (runTpch) tpchOps.map { case (n, f) =>
         (n, countTableOverride.getOrElse(n, "lineitem"), f) }
        else Nil) ++
       (if (runEvents) eventsOps.map { case (n, f) => (n, "events", f) }
        else Nil) ++
       (if (runPipeline) pipelineOps.map { case (n, f) =>
         (n, "documents", f) }
        else Nil))
        .filter { case (n, _, _) => opFilter.forall(_.contains(n)) }
    val rowsInCache = collection.mutable.Map.empty[(String, String), Long]

    println(f"${"op"}%-18s ${"scale"}%5s ${"rows_in"}%8s ${"rows"}%8s ${"sec"}%8s")
    val results = for {
      n <- scales
      dir = corpusDir(n)
      (name, countTable, fn) <- ops
      rowsIn = rowsInCache.getOrElseUpdate((dir, countTable),
        Tables.t(spark, dir, countTable).count())
    } yield {
      fn(dir) // warmup (codegen + shuffle files)
      // min of THREE: this box shows host-level noise spikes of 1-2s
      // (shared hardware); two samples were not enough to reject one
      val timed = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val rows = fn(dir)
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val sec = timed.map(_._1).min
      val rows = timed.head._2
      println(f"$name%-18s $n%5d $rowsIn%8d $rows%8d $sec%8.2f")
      (name, n, sec, rows)
    }
    // growth factors vs 1× (time and rows per op)
    val base = results.filter(_._2 == scales.min)
      .map(r => r._1 -> ((r._3, r._4))).toMap
    println(f"${"op"}%-18s ${"scale"}%5s ${"t-growth"}%9s ${"row-growth"}%11s")
    results.filter(_._2 != scales.min).foreach { case (name, n, sec, rows) =>
      val (b, br) = base(name)
      println(f"$name%-18s $n%5d ${sec / b}%9.2f ${rows.toDouble / math.max(1, br)}%11.2f")
    }

    // Recall vs exact ground truth per scale (embedding family): LSH
    // pair recall against the O(n²) twin at the same 0.8 threshold, and
    // IVF top-k recall against brute force with the same query set.
    // the recall table needs the O(n²) exact twin + brute force at every
    // scale — only meaningful (and only affordable) on FULL family runs,
    // so a SPARK_GRAFT_OPS-filtered quick measurement skips it
    if (runEmb && opFilter.isEmpty) {
      // ivf_scaled probes nProbe = 2·scale cells. The codebook is now
      // BOUNDED at maxCells=16 (round 6): this corpus grows LABELS with
      // n (+1000/copy) but labels fold into at most 16 cells, so the
      // routing term stays O(n·16) and 2·scale probes cover a growing
      // fraction of the bounded codebook (all 16 cells at n ≥ 8 —
      // ivf_scaled recall goes exact there by construction).
      println(f"${"scale"}%5s ${"lsh_recall"}%11s ${"ivf_recall"}%11s ${"ivf_scaled"}%11s ${"true_pairs"}%11s")
      scales.foreach { n =>
        val dir = corpusDir(n)
        val exact = Similarity.cosinePairs(spark, dir, threshold = 0.8)
          .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val lsh = Similarity.lshPairs(spark, dir, threshold = 0.8,
            nBits = lshBits(dir))
          .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val brute = Similarity.cosineTopK(spark, dir)
          .select("q_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        def ivfSet(nProbe: Int) = Similarity.ivfTopK(spark, dir, nProbe = nProbe)
          .select("q_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val ivf = ivfSet(2)
        val ivfScaled = ivfSet(2 * n)
        val lshR = if (exact.isEmpty) 1.0
          else exact.count(lsh.contains).toDouble / exact.size
        def recall(s: Set[(Long, Long)]) = if (brute.isEmpty) 1.0
          else brute.count(s.contains).toDouble / brute.size
        println(f"$n%5d $lshR%11.3f ${recall(ivf)}%11.3f ${recall(ivfScaled)}%11.3f ${exact.size}%11d")
      }
    }

    // X70 BATCH sweep (VERDICT r11 item 8): the daily-increment curve
    // above holds the batch CONSTANT while the corpus grows; an
    // operator also schedules by the OTHER axis — how incremental cost
    // grows with batch size at a fixed large corpus, and where it
    // crosses the full rebuild (the number that decides "accumulate
    // K days of increments vs rebuild"). Corpus fixed at scales.max
    // (pass 100 explicitly for the SCALE_NOTES table); batch size
    // swept ×1/×3/×10 via batchMod ∝ 1/B; full-rebuild reference
    // measured in the same session. Cold checkpoints per invocation,
    // warmup builds the _SUCCESS-gated serving indexes.
    if (runIncrSweep) {
      val n = scales.max
      val dir = corpusDir(n)
      def timed2(f: => Long): (Double, Long) = {
        val samples = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val rows = f
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        (samples.map(_._1).min, samples.head._2)
      }
      def rebuildRun(): Long = {
        Dedup.clearPairsMemo()
        m(graft.ops.CorpusPipeline.corpusPipeline(spark, dir,
          semTau = 0.8, semCells = nextPrime(16 * n),
          rarityMax = 40.0 * n))
      }
      rebuildRun() // warmup: codegen + index stores
      val (rebuildSec, _) = timed2(rebuildRun())
      println(f"corpus x$n%d full rebuild: $rebuildSec%8.2f s")
      println(f"${"batch_x"}%7s ${"batchMod"}%8s ${"rows"}%8s ${"sec"}%8s ${"vs_rebuild"}%10s")
      Seq(1, 3, 10).foreach { b =>
        val mod = math.max(1, 7 * n / b)
        def run(): Long = {
          Dedup.clearPairsMemo()
          m(graft.ops.CorpusPipeline.corpusPipelineIncr(spark, dir,
            batchMod = mod, rarityMax = 40.0 * n))
        }
        run() // warmup
        val (sec, rows) = timed2(run())
        println(f"$b%7d $mod%8d $rows%8d $sec%8.2f ${sec / rebuildSec}%10.2f")
      }
    }

    // MEASURED recall for the top-2-cell probe family (VERDICT r10
    // item 3): the planted zeroed-dims twins are exhaustive ground
    // truth (cos ≈ 0.97, far above both thresholds), so recall here is
    // against TRUE pairs, not against an oracle sharing the engine's
    // cell approximation. Split by routing agreement: same-cell recall
    // is the within-cell-exactness contract (must be 1.0), straddle
    // recall is what the approximation family actually loses —
    // semdedup has no probing (straddlers are its documented miss
    // class), semantic_decon's eval-side top-2 listing recovers the
    // straddlers whose eval vector ranks the train's cell second.
    if (runSemrec) {
      println(f"${"scale"}%5s ${"family"}%-15s ${"planted"}%8s ${"recall"}%7s ${"same_cell"}%10s ${"sc_recall"}%10s ${"straddle"}%9s ${"str_recall"}%10s")
      scales.foreach { n =>
        val dir = corpusDir(n)
        val mc = nextPrime(16 * n)
        semanticRecall(spark, dir, mc).foreach { r =>
          println(f"$n%5d ${r.family}%-15s ${r.planted}%8d ${r.recall}%7.3f ${r.sameCell}%10d ${r.sameCellRecall}%10.3f ${r.straddle}%9d ${r.straddleRecall}%10.3f")
        }
      }
    }
    spark.stop()
  }

  /** One planted-pair recall measurement row; `misses` lists the
    * undetected pairs so a spec can assert every miss is a straddler
    * (NaN recalls mean the slice was empty). */
  final case class RecallRow(family: String, planted: Int,
      recall: Double, sameCell: Int, sameCellRecall: Double,
      straddle: Int, straddleRecall: Double,
      misses: Seq[(Long, Long)], straddlePairs: Seq[(Long, Long)])

  /** First-8-hex-chars md5 mod — the JVM twin of
    * [[graft.util.Tables.md5Bucket]], for classifying planted ids
    * driver-side without a Spark job. */
  private def md5Mod(s: String, mod: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % mod
  }

  /** Planted-twin recall of `semdedup` and `semantic_decon` on a
    * [[buildEmbeddingCorpus]] corpus: planted pairs are (o, o+5M)
    * with both ids present (the builder's structural id layout —
    * independent of the engine's routing); a pair is caught when the
    * twin is dropped (semdedup) / the train side of an eval-crossing
    * pair is flagged contaminated (semantic_decon, eval = the
    * `sdecon` md5 coin slice). */
  private[tools] def semanticRecall(spark: SparkSession, dir: String,
      maxCells: Int, sdTau: Double = 0.8, deconTau: Double = 0.6,
      evalMod: Int = 50): Seq[RecallRow] = {
    import spark.implicits._
    val sd = Similarity.semDedup(spark, dir, tau = sdTau,
        maxCells = maxCells)
      .select("vec_id", "cell", "kept").as[(Long, Int, Boolean)]
      .collect()
    val cellOf = sd.map(r => r._1 -> r._2).toMap
    val keptOf = sd.map(r => r._1 -> r._3).toMap
    val ids = cellOf.keySet
    val pairs = sd.map(_._1)
      .filter(id => (id % 10000000L) < 5000000L &&
        ids.contains(id + 5000000L))
      .map(id => (id, id + 5000000L)).toSeq.sorted
    def row(fam: String, ps: Seq[(Long, Long)],
        caught: ((Long, Long)) => Boolean): RecallRow = {
      val (same, strad) = ps.partition { case (a, b) =>
        cellOf(a) == cellOf(b) }
      def rec(s: Seq[(Long, Long)]) =
        if (s.isEmpty) Double.NaN
        else s.count(caught).toDouble / s.size
      RecallRow(fam, ps.size, rec(ps), same.size, rec(same),
        strad.size, rec(strad), ps.filterNot(caught), strad)
    }
    val sdRow = row("semdedup", pairs, p => !keptOf(p._2))
    // X61b: same planted set through the multi-probe variant — the
    // straddle-recall lift is the measurement that motivated it
    val keptProbe = Similarity.semDedupProbe(spark, dir, tau = sdTau,
        maxCells = maxCells)
      .select("vec_id", "kept").as[(Long, Boolean)].collect()
      .map(r => r._1 -> r._2).toMap
    val spRow = row("semdedup_probe", pairs, p => !keptProbe(p._2))
    val flagged = Similarity.semanticDecontaminate(spark, dir,
        tau = deconTau, maxCells = maxCells, evalMod = evalMod)
      .filter(org.apache.spark.sql.functions.col("contaminated"))
      .select("vec_id").as[Long].collect().toSet
    def coin(id: Long) = md5Mod(s"sdecon:$id", evalMod) == 0
    val evPairs = pairs.flatMap { case (o, t) =>
      if (coin(o) && !coin(t)) Some((o, t))
      else if (coin(t) && !coin(o)) Some((t, o))
      else None
    } // (eval side, train side)
    val dcRow = row("semantic_decon", evPairs, p => flagged(p._2))
    // X66b: the both-sides-probed variant through the same planted
    // eval-crossing pairs — the train-side straddle-recall lift is
    // the measurement that motivated it (VERDICT r11 item 4)
    val flaggedProbe = Similarity.semanticDeconProbe(spark, dir,
        tau = deconTau, maxCells = maxCells, evalMod = evalMod)
      .filter(org.apache.spark.sql.functions.col("contaminated"))
      .select("vec_id").as[Long].collect().toSet
    val dpRow = row("semantic_decon_probe", evPairs,
      p => flaggedProbe(p._2))
    Seq(sdRow, spRow, dcRow, dpRow)
  }
}
