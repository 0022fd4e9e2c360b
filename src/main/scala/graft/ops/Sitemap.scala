package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** X98 — sitemap ingestion: the publisher-DECLARED frontier.
  *
  * A crawl discovers URLs two ways: by observing outlinks (X88's
  * novel-frontier anti-join) and by reading what publishers declare
  * in their sitemaps. This operator parses the persisted sitemap
  * relation — one row per (host, sitemap_url, xml) as a fetcher
  * stores it — into the per-URL discovery feed, with the same
  * deterministic-regex discipline as the X82 extraction chain (both
  * engines replay every step bit-for-bit; no XML library, whose
  * entity/namespace handling neither engine reproduces):
  *
  *  1. `<url>` blocks, non-greedy, case-insensitive, newline-safe;
  *  2. per block: `<loc>` (whitespace-trimmed by the pattern) and the
  *     `YYYY-MM-DD` prefix of `<lastmod>` — the deterministic subset
  *     of W3C datetime; full timestamps and prose dates fall to null
  *     (`try_to_date`: a malformed calendar date must not kill the
  *     batch under ANSI);
  *  3. the loc is normalized by the shared [[HtmlExtract.normalizeUrl]]
  *     chain (case, fragments, tracking params fold exactly as the
  *     outlink side does — the two discovery feeds must agree on URL
  *     identity);
  *  4. protocol validation: a sitemap may only declare URLs on its
  *     OWN host (RFC 9309-adjacent sitemap protocol rule) — cross-host
  *     locs are dropped, empty/loc-less blocks are dropped;
  *  5. duplicate locs keep the LATEST lastmod (`max`, nulls lose);
  *  6. each surviving URL is flagged `is_novel` against the crawled
  *     corpus's normalized page_urls — the same seen-set the X88
  *     outlink feed anti-joins.
  *
  * Scale shape: per-row block fan-out (codegen'd regex), one
  * (host, url)-keyed max agg (map-side combined — duplicate locs are
  * rare and never hot), one keyed LEFT join against the distinct
  * seen set (both sides corpus-scaled at 100 TB, never broadcast),
  * presentation sort. The sitemap relation itself is
  * fetch-bounded — hosts × declared URLs — not corpus-sized. */
object Sitemap {

  val FixtureCsv = s"${Ingest.FixtureDir}/corpus/sitemaps.csv"

  val FixtureSchema: StructType = StructType(Seq(
    StructField("host", StringType),
    StructField("sitemap_url", StringType),
    StructField("xml", StringType)))

  /** One declared URL entry; non-greedy so malformed nesting stays
    * local to its block (the X82 region-rule discipline). */
  val UrlBlockPattern = "(?is)<url>.*?</url>"
  /** The loc value, pattern-trimmed: lazy group between greedy
    * whitespace runs — identical semantics in Java regex and RE2. */
  val LocPattern = "(?is)<loc>\\s*(.*?)\\s*</loc>"
  /** The deterministic date subset: the leading YYYY-MM-DD of any
    * W3C datetime; anything else → no match → null lastmod. */
  val LastmodPattern =
    "(?is)<lastmod>\\s*([0-9]{4}-[0-9]{2}-[0-9]{2})"

  private[graft] def fixtureSitemaps(spark: SparkSession): DataFrame =
    spark.read.option("header", "true").schema(FixtureSchema)
      .csv(FixtureCsv)

  def sitemapIngest(spark: SparkSession, dir: String): DataFrame =
    sitemapIngestFrom(fixtureSitemaps(spark),
      HtmlExtract.fixturePages(spark))

  /** Session-memoized lazy checkpoint of the fixture's declared-URL
    * relation — the sitemap channel the discovery feed splices; the
    * registered `sitemap_ingest` stays direct (it prices the parse).
    * Cold-cleared per bench pass ([[graft.util.CkptMemo]]). */
  private[graft] def fixtureDeclared(spark: SparkSession): DataFrame =
    graft.util.CkptMemo.of(spark, "sm_declared",
        graft.util.Tables.listingTag(spark, FixtureCsv)) {
      declaredUrls(fixtureSitemaps(spark)).localCheckpoint(false)
    }

  /** The parsed, validated, (host, url)-folded declared-URL relation
    * of a sitemap store — the shared core of [[sitemapIngestFrom]]
    * and the X101 feed assembly. */
  private[graft] def declaredUrls(sitemaps: DataFrame): DataFrame = {
    // the emitted host is LOWERED at the door: the outlink discovery
    // channel derives hosts from lowercased normalized URLs, so a
    // mixed-case host value in the sitemap relation would otherwise
    // produce (host, url) keys that never fold in [[discoveryFeed]] —
    // silently breaking the "no URL discovered twice" merge contract
    // (the fixture plants a MixedCase.Test row to pin this)
    val entries = sitemaps
      .select(lower(col("host")).as("host"),
        explode(regexp_extract_all(col("xml"), lit(UrlBlockPattern),
          lit(0))).as("b"))
      .select(col("host"),
        HtmlExtract.normalizeUrl(
          regexp_extract(col("b"), LocPattern, 1)).as("url"),
        try_to_date(
          nullif(regexp_extract(col("b"), LastmodPattern, 1), lit("")),
          "yyyy-MM-dd").as("lastmod"))
      .filter(col("url") =!= "" &&
        regexp_extract(col("url"), HtmlExtract.HostPattern, 1) ===
          col("host"))
    entries.groupBy(col("host"), col("url"))
      .agg(max(col("lastmod")).as("lastmod"))
  }

  /** The crawled corpus's distinct normalized page URLs — the seen
    * set every novelty anti-join subtracts. */
  private[graft] def seenUrls(pages: DataFrame): DataFrame =
    pages
      .filter(col("page_url").isNotNull && col("page_url") =!= "")
      .select(HtmlExtract.normalizeUrl(col("page_url")).as("url"))
      .distinct()

  private[graft] def sitemapIngestFrom(sitemaps: DataFrame,
      pages: DataFrame): DataFrame =
    declaredUrls(sitemaps)
      .join(seenUrls(pages).withColumn("seen", lit(true)),
        Seq("url"), "left")
      .select(col("host"), col("url"), col("lastmod"),
        col("seen").isNull.as("is_novel"))
      .orderBy("host", "url")

  // ---- X101: merged discovery feed ------------------------------------

  /** X101 — the MERGED discovery feed: one relation holding every URL
    * the crawl should consider fetching next, from ALL THREE
    * discovery channels a real crawl runs — outlinks observed in
    * crawled pages (X88's novel frontier), URLs publishers declare in
    * sitemaps (X98), and the sitemap URLs publishers declare in their
    * robots.txt `Sitemap:` directives (X100's parse carries them;
    * RFC 9309 leaves them non-group-scoped, so every parsed row
    * counts regardless of agent) — with provenance. Because all
    * channels normalize through the SAME chain, a URL found more than
    * one way folds to one row (`via` = the sorted `+`-joined channel
    * set — a cross-engine-stable encoding), keeping the sitemap's
    * freshness hint. This is the relation the X87 robots gate and the
    * X99 priority actually want as input: deduplicated across
    * channels, lastmod-aware, no URL fetched twice because two
    * discovery paths found it.
    *
    * Scale shape: the outlink side is the X88 anti-join (both sides
    * corpus-scaled), the sitemap side is fetch-bounded, the robots
    * side is host-bounded (a handful of directives per host); the
    * merge is one (host, url)-keyed agg over their union — map-side
    * combined, a URL appears at most once per channel. */
  def discoveryFeed(spark: SparkSession, dir: String): DataFrame = {
    val pages = HtmlExtract.fixturePages(spark)
    val outlinks = HtmlExtract.fixtureResolved(spark)
      .filter(!col("host").isin("(non-http)", "(unresolved)"))
      .select(col("host"), col("r").as("url")).distinct()
    discoveryFeedAssemble(spark, outlinks, seenUrls(pages))
  }

  /** The shared X101 feed ASSEMBLY over an arbitrary fetchable
    * outlink relation (host, url) and seen-URL relation (url) — the
    * batch feed and its streaming twin ([[graft.streaming
    * .DiscoveryStream]]) must stay realizations of the same merge, so
    * the channel folds live in one place. The sitemap and robots
    * channels read the committed fixtures (publisher-declared state —
    * refreshed on the robots/sitemap fetch cadence, not per crawl
    * batch). */
  private[graft] def discoveryFeedAssemble(spark: SparkSession,
      outlinks: DataFrame, seen: DataFrame): DataFrame = {
    val no = outlinks.join(seen, Seq("url"), "left_anti")
      .select(col("host"), col("url"),
        lit("outlink").as("via"),
        lit(null).cast("date").as("lastmod"))
    val declared = fixtureDeclared(spark)
      .join(seen, Seq("url"), "left_anti")
      .select(col("host"), col("url"),
        lit("sitemap").as("via"), col("lastmod"))
    // robots-declared sitemap URLs: the crawl must FETCH these to
    // read the declared frontier, so they enter the feed as URLs in
    // their own right — host derived from the normalized URL itself
    // (the outlink channel's convention), crawled ones anti-joined
    // out. The parsed relation is HOST-BOUNDED tiny (a handful of
    // directives per host) — checkpointed at the (host, url) boundary
    // so the X100 parse's window exchanges run once at build instead
    // of riding the corpus-sized feed plan (the crawl_budget
    // discipline); only the novelty anti-join stays in the plan.
    val robotsDeclared = Robots.fixtureParsed(spark)
      .filter(col("directive") === "sitemap")
      .select(HtmlExtract.normalizeUrl(col("value")).as("url"))
      .withColumn("host",
        regexp_extract(col("url"), HtmlExtract.HostPattern, 1))
      .filter(col("url") =!= "" && col("host") =!= "")
      .select(col("host"), col("url")).distinct()
      .localCheckpoint()
      .join(seen, Seq("url"), "left_anti")
      .select(col("host"), col("url"),
        lit("robots").as("via"), lit(null).cast("date").as("lastmod"))
    no.unionByName(declared).unionByName(robotsDeclared)
      .groupBy(col("host"), col("url"))
      .agg(array_join(array_sort(collect_set(col("via"))), "+")
          .as("via"),
        max(col("lastmod")).as("lastmod"))
      .select(col("host"), col("url"), col("via"), col("lastmod"))
      .orderBy("host", "url")
  }
}
