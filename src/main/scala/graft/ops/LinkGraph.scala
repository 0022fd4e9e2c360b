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
  private[graft] def hostEdges(pages: DataFrame): DataFrame = {
    val urls = HtmlExtract.resolvedUrls(pages)
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
    pagerank(hostEdges(HtmlExtract.fixturePages(spark)))

  /** PageRank core over an arbitrary DISTINCT (src, dst) edge set —
    * specs feed planted graphs here. */
  private[graft] def pagerank(edgesIn: DataFrame): DataFrame = {
    // One checkpoint caps every round's plan at the edge relation
    // instead of the resolve chain's collapsed expression tree.
    val edges = edgesIn.localCheckpoint()
    val outDeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("out_deg")).localCheckpoint()
    val inDeg = edges.groupBy(col("dst"))
      .agg(count(lit(1)).as("in_deg"))
    val nodes = edges.select(col("src").as("host"))
      .union(edges.select(col("dst")))
      .distinct().localCheckpoint()
    // Host-count scalar as a 1-row relation (the bm25 stats pattern —
    // no driver-side collect needed even though N is bounded).
    val nn = nodes.agg(count(lit(1)).as("n"))
      .withColumn("nd", col("n").cast("double")).localCheckpoint()

    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("host"), (lit(1.0) / col("nd")).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to Iters) {
      // Per-target in-mass: each linking host splits its rank evenly
      // across its distinct out-neighbors. Decimal-summed per target.
      val contribs = edges
        .join(ranks, edges("src") === ranks("host"))
        .join(outDeg, Seq("src"))
        .select(col("dst"),
          (col("rank") / col("out_deg").cast("double")).as("c"))
        .groupBy(col("dst")).agg(dsum(col("c")).as("s"))
      // Dangling mass: ranks of hosts with no outlinks (empty set →
      // NULL sum → 0.0, matching the oracle's COALESCE).
      val dang = ranks
        .join(outDeg, ranks("host") === outDeg("src"), "left_anti")
        .agg(coalesce(dsum(col("rank")), lit(0.0)).as("dang"))
      ranks = nodes
        .join(contribs, nodes("host") === contribs("dst"), "left")
        .crossJoin(broadcast(dang))
        .crossJoin(broadcast(nn))
        .select(nodes("host"),
          ((lit(Teleport) / col("nd")) +
            (lit(Damping) * (coalesce(col("s"), lit(0.0)) +
              (col("dang") / col("nd"))))).as("rank"))
        .localCheckpoint()
    }
    ranks
      .join(inDeg, ranks("host") === inDeg("dst"), "left")
      .join(outDeg, ranks("host") === outDeg("src"), "left")
      .select(ranks("host"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        col("rank"))
      .orderBy(col("rank").desc, col("host"))
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
        .select(col("host"), col("rank")))

  /** Full-compute form (pagerank inline) — specs and the ScaleStress
    * leg price the backfill; the registered query reads the store. */
  private[graft] def hostPriorityFrom(pages: DataFrame): DataFrame =
    hostPriorityWith(pages,
      pagerank(hostEdges(pages)).select(col("host"), col("rank")))

  private def hostPriorityWith(pages: DataFrame,
      ranks: DataFrame): DataFrame = {
    val novel = HtmlExtract.frontierNovelFrom(pages)
      .groupBy(col("host")).agg(count(lit(1)).as("n_novel"))
    val admitted = HtmlExtract.htmlExtractFrom(pages)
      .select(col("doc_id"),
        (!col("boilerplate_flag") &&
          col("text_len") >= HtmlExtract.MinTextLen).as("admitted"))
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
    val traps = HtmlExtract.crawlTrapsFrom(pages)
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
