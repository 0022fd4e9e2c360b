package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** X98 gates: the sitemap protocol subset pinned on the planted
  * fixture shapes (novelty classes, loc folding, cross-host drops,
  * lastmod subset), plus toDF edges (invalid calendar dates, scheme
  * variance, null-loses max). */
class SitemapSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def d(s: String) = java.sql.Date.valueOf(s)

  private lazy val got = Sitemap.sitemapIngest(spark, dir)
    .collect()
    .map(r => (r.getString(0), r.getString(1),
      Option(r.getDate(2)), r.getBoolean(3)))

  test("fixture: crawled locs are not novel, fresh locs are (X98)") {
    // ids 0 and 5 share the site-root page_url shape → their two
    // sitemap entries fold to one loc keeping the later lastmod
    val c0 = got.filter(_._1 == "crawl0.crawl.test")
    assert(c0.length == 9, c0.toSeq)
    assert(c0.count(!_._4) == 5, s"crawled: ${c0.filter(!_._4).toSeq}")
    assert(c0.filter(_._4).forall(_._2.contains("/fresh/")))
    assert(c0.find(_._2 == "http://crawl0.crawl.test/")
      .flatMap(_._3) == Some(d("2024-03-15")))
  }

  test("fixture: dup locs keep latest lastmod; tracking params fold (X98)") {
    val docs = got.filter(_._1 == "docs.example.com")
      .map(r => r._2 -> ((r._3, r._4))).toMap
    assert(docs.size == 5, docs.keySet)
    // the planted cross-channel URL (also an outlink target)
    assert(docs("http://docs.example.com/p1.html")._1 ==
      Some(d("2024-02-20")))
    assert(docs.values.forall(_._2), "docs.example.com never crawled")
    assert(docs("http://docs.example.com/guide/intro.html")._1 ==
      Some(d("2024-02-17")))
    // the utm+fragment twin folds with the clean loc; later date wins
    assert(docs("http://docs.example.com/guide/api.html")._1 ==
      Some(d("2024-02-01")))
    assert(docs("http://docs.example.com/guide/setup.html")._1.isEmpty)
    // uppercase loc normalized
    assert(docs.contains("http://docs.example.com/guide/mixed.html"))
  }

  test("fixture: cross-host and loc-less blocks drop; date subset (X98)") {
    val sloppy = got.filter(_._1 == "sloppy.test")
      .map(r => r._2 -> r._3).toMap
    assert(sloppy.keySet == Set("ok", "w3c", "upper", "padded")
      .map(p => s"http://sloppy.test/$p.html"), sloppy.keySet)
    // prose date is outside the deterministic subset → null
    assert(sloppy("http://sloppy.test/ok.html").isEmpty)
    // W3C datetime contributes its date prefix
    assert(sloppy("http://sloppy.test/w3c.html") == Some(d("2024-01-06")))
    // uppercase tags parse ((?is)); pattern-trimmed padded loc
    assert(sloppy("http://sloppy.test/upper.html") ==
      Some(d("2024-01-07")))
    assert(sloppy("http://sloppy.test/padded.html") ==
      Some(d("2024-01-08")))
    // nothing cross-host survives anywhere in the output
    assert(!got.exists(r => r._2.contains("evil.test") ||
      r._2.contains("other.example.org")))
    // the empty sitemap contributes no rows
    assert(!got.exists(_._1 == "empty.test"))
    assert(got.count(_._1 == "bulk.test") == 40)
  }

  test("fixture: mixed-case host value lowers at the door (X98)") {
    val mc = got.filter(_._1 == "mixedcase.test")
    assert(mc.map(_._2).toSet == Set(
      "http://mixedcase.test/page.html",
      "http://mixedcase.test/upper.html"), mc.toSeq)
    // NO emitted host anywhere carries upper case — the (host, url)
    // keys must fold against the lowercased outlink channel
    assert(got.forall(r => r._1 == r._1.toLowerCase), got.map(_._1).toSeq)
  }

  test("discovery_feed: channels fold per URL, provenance sorted (X101)") {
    import spark.implicits._
    val feed = Sitemap.discoveryFeed(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getDate(3))))
    // one row per (host, url)
    assert(feed.map(r => (r._1, r._2)).distinct.length == feed.length)
    assert(feed.map(_._3).toSet.subsetOf(Set(
      "outlink", "sitemap", "robots", "outlink+sitemap",
      "outlink+robots", "robots+sitemap", "outlink+robots+sitemap")))
    val byUrl = feed.map(r => r._2 -> r).toMap
    // the planted cross-channel URL folds with sorted provenance and
    // keeps the sitemap freshness hint
    assert(byUrl("http://docs.example.com/p1.html")._3 ==
      "outlink+sitemap")
    assert(byUrl("http://docs.example.com/p1.html")._4 ==
      Some(d("2024-02-20")))
    // sitemap-only and outlink-only classes both present
    assert(byUrl("http://crawl0.crawl.test/fresh/n0.html")._3 ==
      "sitemap")
    assert(feed.exists(r => r._3 == "outlink" && r._4.isEmpty))
    // the ROBOTS-ONLY sitemap URLs: declared in robots.txt bodies,
    // never linked and never a sitemap <loc> — the third channel
    assert(byUrl("http://sloppy.test/sitemap.xml")._3 == "robots")
    assert(byUrl("http://docs.example.com/sitemap.xml")._3 == "robots")
    // the feed is EXACTLY the union of its three channels
    val outl = graft.ops.HtmlExtract
      .frontierNovelFrom(graft.ops.HtmlExtract.fixturePages(spark))
      .select("url").as[String].collect().toSet
    val sm = Sitemap.sitemapIngest(spark, dir)
      .filter(col("is_novel")).select("url").as[String].collect().toSet
    val rb = Robots.robotsParse(spark, dir)
      .filter(col("directive") === "sitemap")
      .select(graft.ops.HtmlExtract.normalizeUrl(col("value")).as("u"))
      .as[String].collect().toSet
    assert(feed.map(_._2).toSet == (outl ++ sm ++ rb))
  }

  test("discovery_feed_stream equals batch over the fixture (X101b)") {
    import spark.implicits._
    val batch = Sitemap.discoveryFeed(spark, dir)
      .as[(String, String, String, Option[java.sql.Date])].collect().toSeq
    val stream = graft.streaming.DiscoveryStream
      .discoveryStreamQuery(spark, dir)
      .as[(String, String, String, Option[java.sql.Date])].collect().toSeq
    assert(stream == batch,
      "accumulated stream feed must equal the batch feed row for row")
  }

  test("a URL crawled in a later arrival LEAVES the stream feed (X101b)") {
    import spark.implicits._
    // planted corpus: page A (arrival 1) links URL u; the page at u
    // arrives (is crawled) in arrival 2 — the read-time anti-join
    // must retract u, which per-batch append-only feed rows never
    // could (the fixture's only crawled-URL targets are self links,
    // hence the planted witness)
    val u = "http://w.test/b.html"
    val pages = Seq(
      (0L, "s", "http://w.test/a.html",
        s"<p><a href='$u'>next</a> body words</p>"),
      (1L, "s", u, "<p>no links here</p>"))
      .toDF("doc_id", "source", "page_url", "html")
    val stream = graft.streaming.DiscoveryStream
      .streamFeed(spark, pages, col("doc_id") === 0L)
      .as[(String, String, String, Option[java.sql.Date])].collect()
    assert(!stream.map(_._2).contains(u),
      s"$u was crawled in arrival 2 and must leave the feed")
    // ...while the arrival-1-only assembly DOES discover it — the
    // retraction is the second arrival's doing, not a parse gap
    val a1 = pages.filter(col("doc_id") === 0L)
    val a1links = graft.ops.HtmlExtract.resolvedUrls(a1)
      .filter(!col("host").isin("(non-http)", "(unresolved)"))
      .select(col("host"), col("r").as("url")).distinct()
    val feed1 = Sitemap
      .discoveryFeedAssemble(spark, a1links, Sitemap.seenUrls(a1))
      .as[(String, String, String, Option[java.sql.Date])].collect()
    assert(feed1.exists(r => r._2 == u && r._3 == "outlink"),
      s"arrival 1 must discover $u as an outlink")
  }

  test("toDF edges: invalid calendar date, scheme variance, null-loses max (X98)") {
    import spark.implicits._
    val sm = Seq(
      ("h.test", "http://h.test/sitemap.xml",
        "<urlset>" +
          // regex-shaped but calendar-invalid → try_to_date null
          "<url><loc>http://h.test/a</loc>" +
          "<lastmod>2024-13-99</lastmod></url>" +
          // https loc on the http host: same host → kept
          "<url><loc>https://h.test/b</loc></url>" +
          "<url><loc>http://h.test/c</loc>" +
          "<lastmod>2024-06-01</lastmod></url>" +
          // duplicate loc without a date: null loses the max
          "<url><loc>http://h.test/c</loc></url>" +
          // case + fragment fold through the shared normalize chain
          "<url><loc>HTTP://H.TEST/D#frag</loc>" +
          "<lastmod>2024-06-02</lastmod></url>" +
          "</urlset>")
    ).toDF("host", "sitemap_url", "xml")
    val pages = Seq((1L, "s", "http://h.test/a", "<p>x</p>"))
      .toDF("doc_id", "source", "page_url", "html")
    val out = Sitemap.sitemapIngestFrom(sm, pages).collect()
      .map(r => r.getString(1) ->
        ((Option(r.getDate(2)), r.getBoolean(3)))).toMap
    assert(out.keySet == Set("http://h.test/a", "https://h.test/b",
      "http://h.test/c", "http://h.test/d"), out.keySet)
    assert(out("http://h.test/a") == ((None, false)))
    assert(out("https://h.test/b") == ((None, true)))
    assert(out("http://h.test/c") == ((Some(d("2024-06-01")), true)))
    assert(out("http://h.test/d") == ((Some(d("2024-06-02")), true)))
  }
}
