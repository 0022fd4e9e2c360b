package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables.dsum

/** X90 — host-graph PageRank: the global link-authority signal a
  * crawl scheduler folds into its frontier priority (alongside the
  * X86 politeness budget and X88 novelty), and the classic
  * quality-weighting input for training-data source mixes (a page on
  * a well-linked host is a better bet than one nobody links to).
  * The reference's loader world has no link graph at all
  * (`FInal/load_script.py` projects flat CSV columns), so this is an
  * extension operator mandated by the crawl-entry surface, not a
  * port.
  *
  * Graph: DISTINCT host→host edges from the resolved outlink
  * relation ([[HtmlExtract.resolvedUrls]] — the same canonical URL
  * chain X83b/X87/X88 share). Source = the linking page's own host,
  * target = the resolved outlink host; the un-fetchable
  * `(non-http)`/`(unresolved)` buckets and pages whose own URL has
  * no host contribute no edges, and host-level SELF-edges (a site's
  * internal navigation, the overwhelming raw-link majority) are
  * dropped — with them in, every big site ranks itself.
  *
  * Iteration (the published power method, damping d=0.85, fixed
  * [[Iters]] rounds from a uniform start): each round every host
  * splits its rank across its distinct out-neighbors, dangling hosts
  * (no outlinks — most crawl-frontier targets, since we have not
  * fetched them yet) donate their mass to every host uniformly, and
  * `rank' = (1-d)/N + d·(in_mass + dangling/N)`.
  *
  * Cross-engine determinism: the ONLY order-sensitive steps are the
  * two per-round sums (per-target in-mass, global dangling mass);
  * both go through the exact decimal accumulator ([[dsum]] /
  * `osum`), and every other step is a single IEEE-exact double
  * op (divisions by counts, the fixed-shape rank expression), so
  * Spark and DuckDB walk bit-identical rank vectors round by round
  * and the oracle can hash-compare raw doubles after 10 iterations.
  *
  * Scale shape: the rank/degree/node relations are HOST-bounded (the
  * one small relation class in the crawl family — millions of rows
  * when the corpus is billions of pages), while the edge relation is
  * distinct-host-pair-sized. Each round is one keyed equi-join
  * (edges ⋈ ranks on src, map-side-combined sum per target) plus a
  * scalar aggregate; nothing is ever all-pairs and nothing carries
  * corpus text. The edge/degree relations are checkpointed ONCE at
  * the host boundary (the X86 lesson: the collapsed resolve
  * expression tree is optimizer-expensive, and 10 rounds would
  * re-plan it 10×), and each round's host-sized rank vector is
  * eagerly checkpointed so the iteration plan stays flat instead of
  * growing 10 joins deep. */
object LinkGraph {

  /** Damping factor — the standard published value. */
  val Damping = 0.85
  /** Host-count bound for the per-round BROADCAST joins (r17, VERDICT
    * r16 item 7): the rank vector is (host, double) rows — ~50 B
    * framed — so 16M hosts is a few-hundred-MB broadcast, inside the
    * guide's §3.1 comfort zone and far under the 8 GB/512M-row hard
    * cap. Graphs with more hosts than this fall back to keyed
    * shuffle joins instead of forcing an OOM through an unconditional
    * hint: past the bound the edge relation is so much larger than
    * the vector that the shuffle is the right trade anyway. The
    * fixture graph (32 hosts) always broadcasts — plan unchanged. */
  val MaxBroadcastHosts: Long = 16L << 20
  /** Teleport share, as its OWN literal: `1.0 - 0.85` computed in
    * double is NOT the double nearest to 0.15, and the oracle
    * interpolates these constants as decimal strings — both engines
    * must parse the same digits. */
  val Teleport = 0.15
  /** Fixed power-method rounds (both engines unroll the same count). */
  val Iters = 10

  /** The distinct fetchable host→host edge relation (src, dst) from
    * a (doc_id, page_url, html) page set — shared by the registered
    * query and the ScaleStress leg. */
  private[graft] def hostEdges(pages: DataFrame,
      resolved: Option[DataFrame] = None): DataFrame = {
    val urls = resolved.getOrElse(HtmlExtract.resolvedUrls(pages))
    urls
      .withColumn("src",
        regexp_extract(col("p"), HtmlExtract.HostPattern, 1))
      .filter(col("src").isNotNull && col("src") =!= "" &&
        !col("host").isin("(non-http)", "(unresolved)") &&
        col("src") =!= col("host"))
      .select(col("src"), col("host").as("dst"))
      .distinct()
  }

  /** Registered query: PageRank over the fixture crawl's host graph.
    * Output (host, in_deg, out_deg, rank), highest rank first. */
  def linkPagerank(spark: SparkSession, dir: String): DataFrame =
    pagerank(hostEdges(HtmlExtract.fixturePages(spark),
      Some(HtmlExtract.fixtureResolved(spark))))

  /** PageRank core over an arbitrary DISTINCT (src, dst) edge set —
    * specs feed planted graphs here. */
  private[graft] def pagerank(edgesIn: DataFrame,
      maxBroadcastHosts: Long = MaxBroadcastHosts): DataFrame = {
    val (edges, outDeg, inDeg, nodes, nn) = graphRelations(edgesIn)
    val uniform = nodes.crossJoin(broadcast(nn))
      .select(col("host"), (lit(1.0) / col("nd")).as("rank"))
      .localCheckpoint()
    val ranks = iterate(edges, outDeg, nodes, nn, uniform, Iters,
      maxBroadcastHosts)
    ranks
      .join(inDeg, ranks("host") === inDeg("dst"), "left")
      .join(outDeg, ranks("host") === outDeg("src"), "left")
      .select(ranks("host"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        col("rank"))
      .orderBy(col("rank").desc, col("host"))
  }

  /** The checkpointed graph relations every rank computation shares:
    * (edges, outDeg, inDeg, nodes, nn). One checkpoint caps every
    * round's plan at the edge relation instead of the resolve chain's
    * collapsed expression tree; the host-count scalar rides as a
    * 1-row relation (the bm25 stats pattern — no driver collect). */
  private def graphRelations(edgesIn: DataFrame):
      (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val edges = edgesIn.localCheckpoint()
    val outDeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("out_deg")).localCheckpoint()
    val inDeg = edges.groupBy(col("dst"))
      .agg(count(lit(1)).as("in_deg"))
    val nodes = edges.select(col("src").as("host"))
      .union(edges.select(col("dst")))
      .distinct().localCheckpoint()
    val nn = nodes.agg(count(lit(1)).as("n"))
      .withColumn("nd", col("n").cast("double")).localCheckpoint()
    (edges, outDeg, inDeg, nodes, nn)
  }

  /** The power-method iteration, from an ARBITRARY start vector —
    * shared by the cold build ([[pagerank]], uniform start, [[Iters]]
    * rounds) and the warm-start probe ([[linkPagerankProbe]], stored
    * ranks, [[WarmIters]] rounds). Per round: per-target in-mass
    * (each host splits its rank evenly across its distinct
    * out-neighbors, decimal-summed per target), dangling mass (ranks
    * of hosts with no outlinks; empty set → NULL sum → 0.0 matching
    * the oracle's COALESCE), then the fixed-shape rank update. */
  private[graft] def iterate(edges: DataFrame, outDeg: DataFrame,
      nodes: DataFrame, nn: DataFrame, start: DataFrame,
      iters: Int,
      maxBroadcastHosts: Long = MaxBroadcastHosts): DataFrame = {
    // LOOP-INVARIANT relations hoisted out of the rounds (r16, guide
    // §2.4): edges ⋈ outDeg never changes — pre-r16 every round
    // re-ran that join (10 extra shuffles per cold build); likewise
    // the DANGLING HOST SET (nodes with no outlinks) is fixed, so
    // each round's dangling mass is a semi-join against the
    // precomputed set instead of a per-round anti-join against
    // outDeg. The per-round arithmetic is unchanged: the same
    // rank/out_deg contribution per edge, the same decimal sum over
    // the same dangling ranks.
    val edgesDeg = edges.join(outDeg, Seq("src"))
      .select(col("src"), col("dst"), col("out_deg"))
      .localCheckpoint()
    val dangHosts = nodes
      .join(outDeg, nodes("host") === outDeg("src"), "left_anti")
      .localCheckpoint()
    // SIZE-GUARDED broadcast (r17, VERDICT r16 item 7): the r16 hint
    // was unconditional, which at extreme host counts (10⁸+) would
    // force a multi-GB broadcast into an OOM where a keyed shuffle
    // join degrades gracefully. The host count is already on hand as
    // the 1-row nn checkpoint — reading it is a constant-size action,
    // never data-sized. Within the bound the plan is unchanged.
    val nHosts = nn.head().getLong(0)
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (nHosts <= maxBroadcastHosts) broadcast(df) else df
    var ranks = start
    for (_ <- 1 to iters) {
      // the RANK VECTOR is the broadcast side (r16, guide §3.1): it
      // is the one host-bounded relation in the round (tens of MB at
      // billions of pages), while the edge relation is host-PAIR-
      // sized and loop-invariant — shipping the vector to the edges
      // leaves the edge relation un-shuffled in every round (the
      // pregel layout). The per-target sum is the same dsum over the
      // same rank/out_deg terms (exact decimal — order-free).
      val contribs = edgesDeg
        .join(maybeBroadcast(ranks), edgesDeg("src") === ranks("host"))
        .select(col("dst"),
          (col("rank") / col("out_deg").cast("double")).as("c"))
        .groupBy(col("dst")).agg(dsum(col("c")).as("s"))
      val dang = ranks
        .join(dangHosts, Seq("host"), "left_semi")
        .agg(coalesce(dsum(col("rank")), lit(0.0)).as("dang"))
      // contribs (≤ host-sized) broadcasts into the node update for
      // the same reason: no per-round shuffle of the node relation
      ranks = nodes
        .join(maybeBroadcast(contribs),
          nodes("host") === contribs("dst"), "left")
        .crossJoin(broadcast(dang))
        .crossJoin(broadcast(nn))
        .select(nodes("host"),
          ((lit(Teleport) / col("nd")) +
            (lit(Damping) * (coalesce(col("s"), lit(0.0)) +
              (col("dang") / col("nd"))))).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  // ---- X90b: warm-start incremental rank probe -------------------------

  /** Warm rounds per refresh — the daily loop's iteration budget.
    * Rank perturbations from one fetch round are local, so two
    * damped rounds recover most of the movement (the spec MEASURES
    * the residual against the cold 10-round answer). */
  val WarmIters = 2
  /** The incoming fetch round: pages with `doc_id % 4 == 0` (the X88b
    * batch convention); the base crawl is everything else. */
  val ProbeBatchMod = 4

  /** Base-crawl rank store — ranks over the fixture MINUS the
    * incoming batch slice, `_SUCCESS`-gated per fixture listing tag
    * (rebuilt when the crawl changes, like [[rankStore]]). */
  private[graft] def baseRankStore(spark: SparkSession): String = {
    import graft.util.Tables
    val out = "target/graft_rank_base/" +
      Tables.listingTag(spark, HtmlExtract.FixtureCsv)
    if (!Tables.successExists(spark, out))
      pagerank(hostEdges(HtmlExtract.fixturePages(spark)
        .filter(pmod(col("doc_id"), lit(ProbeBatchMod)) =!= 0)))
        .write.mode("overwrite").parquet(out)
    out
  }

  /** X90b — WARM-START rank refresh, the serving split of X90 (the
    * X88b/X57 daily-loop pattern): yesterday's crawl has a persisted
    * rank vector; today's fetch round adds pages and edges. Instead
    * of re-running [[Iters]] rounds from uniform over the full graph,
    * the probe starts from the STORED ranks (new hosts enter at the
    * uniform share 1/N of the grown graph) and runs [[WarmIters]]
    * damped rounds. The result is an approximation BY DESIGN — the
    * oracle replays the identical warm arithmetic (correctness gate),
    * while the SPEC measures the approximation against the cold
    * 10-round answer (L1 residual, and that warm iterating strictly
    * improves on not iterating).
    *
    * Scale shape: the probe prices 2 rounds instead of 10 — each
    * round one keyed equi-join + two decimal sums over host-bounded
    * relations — plus one store scan; the base build lands once per
    * crawl fingerprint. */
  def linkPagerankProbe(spark: SparkSession, dir: String): DataFrame =
    linkPagerankProbeWith(
      hostEdges(HtmlExtract.fixturePages(spark),
        Some(HtmlExtract.fixtureResolved(spark))),
      spark.read.parquet(baseRankStore(spark))
        .select(col("host"), col("rank").as("base_rank")))

  private[graft] def linkPagerankProbeWith(fullEdges: DataFrame,
      stored: DataFrame): DataFrame = {
    val (edges, outDeg, inDeg, nodes, nn) = graphRelations(fullEdges)
    val warm = nodes
      .join(stored, Seq("host"), "left")
      .crossJoin(broadcast(nn))
      .select(col("host"),
        coalesce(col("base_rank"), lit(1.0) / col("nd")).as("rank"))
      .localCheckpoint()
    val ranks = iterate(edges, outDeg, nodes, nn, warm, WarmIters)
    ranks
      .join(inDeg, ranks("host") === inDeg("dst"), "left")
      .join(outDeg, ranks("host") === outDeg("src"), "left")
      .select(ranks("host"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        col("rank"))
      .orderBy(col("rank").desc, col("host"))
  }

  // ---- X105: host-graph connected components ---------------------------

  /** X105 — crawl NEIGHBORHOODS: weakly-connected components over the
    * host graph — which hosts are reachable from which through the
    * corpus's own links. The scheduling relation above X99's per-host
    * priority: a neighborhood is fetched/throttled/audited as a unit
    * (a link farm is a CLUSTER of interlinked hosts — X96 flags the
    * URL-shape trap on one host, this surfaces the host-group around
    * it), and isolated components are discovery dead-ends a frontier
    * must seed externally. Reuses the X22 min-label pointer-jumping
    * core ([[Dedup.minLabelComponents]] — `min`/`least` order strings
    * exactly like ids, so the component label is the lexicographic
    * minimum host) over the undirected view of [[hostEdges]]. Output
    * per host: its cluster label and the cluster size; the DuckDB
    * oracle derives the same labels from the recursive-CTE walk (the
    * dedup_groups oracle shape), so the pointer-jump decomposition is
    * gate-checked on every run.
    *
    * Scale shape: the edge derivation is the corpus-sized scan
    * (shared resolve chain); the component rounds are pointer-jumped
    * (reach doubles per round — diameter ~2^maxIter) over the
    * host-bounded edge set, each round one keyed join + agg. */
  def hostClusters(spark: SparkSession, dir: String): DataFrame =
    hostClustersFrom(HtmlExtract.fixturePages(spark),
      Some(HtmlExtract.fixtureResolved(spark)))

  private[graft] def hostClustersFrom(pages: DataFrame,
      resolved: Option[DataFrame] = None): DataFrame = {
    val e = hostEdges(pages, resolved)
    // checkpoint BEFORE the label rounds: minLabelComponents consumes
    // its pair relation once per round, and an un-checkpointed pair
    // plan re-runs the corpus-sized resolve chain every round (16.4 s
    // → 2 s at sf0.1, measured) — the same lesson as pagerank's edge
    // checkpoint
    val pairs = e.select(
      least(col("src"), col("dst")).as("doc_a"),
      greatest(col("src"), col("dst")).as("doc_b")).distinct()
      .localCheckpoint()
    val labels = Dedup.minLabelComponents(pairs)
      .select(col("doc_id").as("host"), col("grp").as("cluster"))
    val sizes = labels.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_hosts"))
    labels.join(sizes, Seq("cluster"))
      .select(col("host"), col("cluster"), col("n_hosts"))
      .orderBy("host")
  }

  // ---- X99: composed frontier priority --------------------------------

  /** Admit-rate prior for hosts the crawl has never fetched a page
    * from: no evidence either way → 0.5, the uninformative midpoint
    * (documented constant; both engines interpolate the same digits). */
  val AdmitPrior = 0.5

  /** X99 — the composed frontier PRIORITY: the one relation a fetch
    * scheduler actually ranks by, folding the family's signals into a
    * single score per novel-backlog host. `priority = rank ×
    * admit_rate`, zeroed for trap hosts:
    *
    *  - `rank` — X90 link authority (hosts outside the edge graph —
    *    linked only by their own pages — coalesce to 0.0: no external
    *    authority, no priority);
    *  - `admit_rate` — what fraction of the host's ALREADY-CRAWLED
    *    pages survived the X84 admission gate (boilerplate flag +
    *    minimum text length): the observed content-quality prior,
    *    [[AdmitPrior]] for never-crawled hosts;
    *  - `trap_flag` — X96's structural verdict: a trap host's backlog
    *    is phantom, priority 0 regardless of authority.
    *
    * Every factor is a replayed double (rank from the decimal-exact
    * power method, admit_rate one exact division, the product one
    * IEEE multiply), so both engines order identically; ties (all the
    * zero-priority hosts) break on host ASC.
    *
    * Scale shape: all four inputs are host-bounded rollups of
    * corpus-sized scans the family already prices ([[pagerank]]
    * checkpoints its chain; novelty/admission/traps are one keyed agg
    * each); the final join chain is host-keyed over host-bounded
    * relations. */
  /** Persisted RANK store — the X90 artifact: a daily scheduler reads
    * the rank vector, it does not re-run the power method per
    * consumer. `_SUCCESS`-gated per fixture listing fingerprint (the
    * SIXTH store in IndexFreshnessSpec's re-key contract: a corpus
    * change re-keys the store and the priorities read fresh ranks).
    * [[linkPagerank]] itself stays a direct computation — it PRICES
    * the build; this is its serving artifact. */
  def rankStore(spark: SparkSession,
      csv: String = HtmlExtract.FixtureCsv): String = {
    import graft.util.Tables
    val out = "target/graft_rank/" + Tables.listingTag(spark, csv)
    if (!Tables.successExists(spark, out))
      pagerank(hostEdges(
        spark.read.option("header", "true")
          .schema(HtmlExtract.FixtureSchema).csv(csv)))
        .write.mode("overwrite").parquet(out)
    out
  }

  def hostPriority(spark: SparkSession, dir: String): DataFrame =
    hostPriorityWith(HtmlExtract.fixturePages(spark),
      spark.read.parquet(rankStore(spark))
        .select(col("host"), col("rank")),
      Some(HtmlExtract.fixtureResolved(spark)))

  /** Full-compute form (pagerank inline) — specs and the ScaleStress
    * leg price the backfill; the registered query reads the store. */
  private[graft] def hostPriorityFrom(pages: DataFrame): DataFrame =
    hostPriorityWith(pages,
      pagerank(hostEdges(pages)).select(col("host"), col("rank")))

  private def hostPriorityWith(pages: DataFrame,
      ranks: DataFrame,
      resolved: Option[DataFrame] = None): DataFrame = {
    val novel = HtmlExtract.frontierNovelFrom(pages, resolved)
      .groupBy(col("host")).agg(count(lit(1)).as("n_novel"))
    val admitted = HtmlExtract.htmlExtractFrom(pages)
      .select(col("doc_id"), HtmlExtract.admissionOk.as("admitted"))
    val pageHost = pages
      .select(col("doc_id"), regexp_extract(
        HtmlExtract.normalizeUrl(col("page_url")),
        HtmlExtract.HostPattern, 1).as("host"))
      .filter(col("host").isNotNull && col("host") =!= "")
    val admitRate = pageHost.join(admitted, Seq("doc_id"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_pages"),
        sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"))
      .select(col("host"),
        (col("n_admitted").cast("double") /
          col("n_pages").cast("double")).as("admit_rate"))
    val traps = HtmlExtract.crawlTrapsFrom(pages, resolved)
      .select(col("host"), col("trap_flag"))
    novel
      .join(ranks, Seq("host"), "left")
      .join(admitRate, Seq("host"), "left")
      .join(traps, Seq("host"), "left")
      .select(col("host"), col("n_novel"),
        coalesce(col("rank"), lit(0.0)).as("rank"),
        coalesce(col("admit_rate"), lit(AdmitPrior)).as("admit_rate"),
        coalesce(col("trap_flag"), lit(false)).as("trap_flag"))
      .withColumn("priority",
        when(col("trap_flag"), lit(0.0))
          .otherwise(col("rank") * col("admit_rate")))
      .orderBy(col("priority").desc, col("host"))
  }
}
