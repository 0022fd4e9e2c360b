package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** X82 gates: planted-shape assertions on the committed fixture corpus
  * plus the hostile-HTML battery (VERDICT r12 item 1) — unclosed
  * blocks, nested CDATA, entity bombs, tag soup. Every behavior pinned
  * here is the DETERMINISTIC documented one (scaladoc steps 1–5), not
  * a best-effort parse: the point is that Spark and the DuckDB oracle
  * agree bit-for-bit, including on malformed input. */
class HtmlExtractSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val out =
    HtmlExtract.htmlExtract(spark, dir).collect().map { r =>
      r.getLong(0) -> r }.toMap
  private lazy val srcOf =
    spark.read.option("header", "true")
      .csv(HtmlExtract.FixtureCsv)
      .collect().map(r => r.getString(0).toLong -> r.getString(1)).toMap

  private def text(id: Long) = out(id).getString(2)
  private def flag(id: Long) = out(id).getBoolean(7)
  private def ids(src: String) =
    srcOf.collect { case (id, s) if s == src => id }.toSeq.sorted

  test("articles: chrome stripped, body kept, nav/footer flag set") {
    ids("crawl0").foreach { id =>
      val t = text(id)
      assert(t.contains("article"), s"doc $id lost its body")
      assert(!t.contains("document.write"), s"doc $id leaked script")
      assert(!t.contains("color: red"), s"doc $id leaked style")
      assert(!t.contains("site footer"), s"doc $id leaked footer")
      assert(!t.contains("page0"), s"doc $id leaked nav links")
      assert(!t.contains("editorial note"), s"doc $id leaked a comment")
      assert(flag(id), s"doc $id has <nav>+<footer> but no flag")
    }
  }

  test("link farms: no chrome tags, flagged purely by link density") {
    ids("crawl1").foreach { id =>
      val d = out(id).getDouble(6)
      assert(d > HtmlExtract.LinkDensityCut, s"doc $id density $d")
      assert(flag(id), s"doc $id is a link farm but not flagged")
      assert(out(id).getLong(4) == 12L, s"doc $id n_links")
    }
  }

  test("plain text: identity extraction, zero links, unflagged") {
    ids("crawl2").foreach { id =>
      assert(out(id).getLong(4) == 0L && out(id).getLong(5) == 0L)
      assert(out(id).getDouble(6) == 0.0)
      assert(!flag(id))
      assert(out(id).getLong(3) > 0)
    }
  }

  test("entities: single-pass decode, amp last, comma/nbsp/quote forms") {
    ids("crawl3").foreach { id =>
      val t = text(id)
      assert(t.contains("a <tag> literal,"), t)
      assert(t.contains("a \"quote\""), t)
      assert(t.contains("'apostrophes'"), t)
      assert(t.contains("'both'"), t)
      assert(t.contains("plus nbsp"), t)
      // double-encoded &amp;lt; decodes ONCE to the literal text &lt;
      assert(t.contains("&lt; stays encoded"), t)
    }
  }

  test("CDATA blocks are stripped with their content") {
    ids("crawl4").foreach { id =>
      assert(!text(id).contains("not text"), text(id))
    }
  }

  test("boilerplate-only pages keep just the title text and flag true") {
    ids("crawl5").foreach { id =>
      // <title> is content, not chrome: an empty-body page reduces to
      // exactly its title — nav/footer/style contribute nothing
      assert(text(id).matches("page \\d+"), s"doc $id: '${text(id)}'")
      assert(flag(id))
    }
  }

  // --- hostile battery --------------------------------------------

  private lazy val hostile = ids("hostile")

  test("unclosed script: block regex can't match, code leaks minus tags") {
    val t = text(hostile(0))
    assert(t.contains("var leak = 'code';"), t)
    assert(!t.contains("<script>"), t)
  }

  test("unclosed tag at EOF stays as text (a dangling < is not a tag)") {
    val t = text(hostile(1))
    assert(t.endsWith("<div class='x"), t)
  }

  test("malformed nesting '<div <span>' strips as one tag to the first >") {
    val t = text(hostile(2))
    assert(!t.contains("div") && !t.contains("span"), t)
  }

  test("nested CDATA: inner ]]> closes the match, tail survives as text") {
    val t = text(hostile(3))
    assert(!t.contains("a <![CDATA[b"), t)
    assert(t.contains("c ]]>"), t)
  }

  test("entity bomb: one decode pass, no iterative re-decoding") {
    val t = text(hostile(4))
    // 40x '&amp;' then 'amp;lt;bomb': each literal &amp; decodes to &
    // exactly once; the &lt; materialized by the LAST amp-decode is
    // NOT re-decoded (amp is the final rule in the chain)
    assert(t.contains("&" * 39 + "&amp;lt;bomb") ||
           t.contains("&" * 40 + "amp;lt;bomb"), t)
    assert(!t.contains("<bomb"), t)
  }

  test("tag soup survives deterministically") {
    val t = text(hostile(5))
    assert(t.nonEmpty && !t.contains("<p>"), t)
  }

  test("uppercase NAV/FOOTER blocks are removed and flagged (?i)") {
    val id = hostile(6)
    val t = text(id)
    assert(!t.contains("page1") && !t.contains("done"), t)
    assert(flag(id))
  }

  test("comments hide tag-like and entity-like content entirely") {
    val t = text(hostile(7))
    assert(!t.contains("ghost"), t)
  }

  test("whitespace-only body collapses to empty text") {
    assert(text(hostile(8)) == "")
  }

  test("anchor with nested markup: link text measured tag-stripped") {
    val id = hostile(9)
    assert(out(id).getLong(4) == 1L)
    assert(out(id).getLong(5) == "bold link text".length.toLong)
  }

  test("script/style blocks close only on their own terminator") {
    val t = text(hostile(10))
    assert(!t.contains("</style>") && !t.contains("content:"), t)
  }

  // ---- X83: outlink host aggregation -------------------------------

  test("link_hosts: normalization folds fragments, utm params and host case") {
    import spark.implicits._
    val hosts = HtmlExtract.linkHosts(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // the crawl6 rows plant per-page: an UPPERCASE-host #fragment
    // link and a ?utm_source&utm_campaign link to the SAME page —
    // normalization must fold both to one canonical URL
    val crawl6 = ids("crawl6")
    assert(crawl6.size == 8)
    val dex = hosts("docs.example.com")
    assert(dex._4 < dex._2,
      s"n_urls ${dex._4} should be < n_links ${dex._2}: the planted " +
        "fragment/tracking/case variants must fold")
    // relative links aggregate under the (relative) bucket: at least
    // one per crawl6 page (the fuzz rows plant more)
    assert(hosts("(relative)")._2 >= 8L)
    assert(hosts("(relative)")._3 >= 8L)
    // tracker links survive with their non-utm param intact: 8 links,
    // 8 distinct ids → 8 canonical urls
    assert(hosts("tracker.test.net") == ("tracker.test.net", 8L, 8L, 8L))
  }

  test("link_hosts: n_links conserves the raw href match count") {
    import spark.implicits._
    val total = HtmlExtract.linkHosts(spark, dir)
      .agg(sum("n_links")).as[Long].head()
    val raw = spark.read.option("header", "true")
      .csv(HtmlExtract.FixtureCsv)
      .select(size(regexp_extract_all(col("html"),
        lit(HtmlExtract.HrefPattern), lit(1))).cast("long").as("n"))
      .agg(sum("n")).as[Long].head()
    assert(total == raw, s"aggregated $total links vs $raw raw hrefs")
  }

  // ---- X83b: page-URL-aware resolved link rollup --------------------

  test("link_hosts_resolved: relative mass lands on the page's own host") {
    import spark.implicits._
    val hosts = HtmlExtract.linkHostsResolved(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // crawl8 plants per page: relative path + root-relative + self
    // (fragment-only) = 3 links that must resolve to the OWN host
    val own = hosts("crawl8.crawl.test")
    assert(own._2 == 24L && own._3 == 8L, own)
    // protocol-relative //cdn.shared.test picks up each page's scheme
    assert(hosts("cdn.shared.test")._2 == 8L, hosts.get("cdn.shared.test"))
    // mailto: is fenced into (non-http), not a fake host (8 planted
    // in crawl8; the urlfuzz family adds a md5-driven tail)
    assert(hosts("(non-http)")._2 >= 8L, hosts.get("(non-http)"))
    // unquoted hrefs extract
    assert(hosts("unquoted.test")._2 == 8L, hosts.get("unquoted.test"))
    // nothing is (relative) or (unresolved): every fixture page has a
    // valid page_url, so ALL relative mass resolves
    assert(!hosts.contains("(relative)") && !hosts.contains("(unresolved)"),
      hosts.keys)
  }

  test("link_hosts_resolved: resolution shapes — dir, root, scheme, fail-closed") {
    import spark.implicits._
    val pages = Seq(
      // nested dir page: relative resolves beside the page
      (1L, "s", "http://a.test/x/y.html", "<a href='z.html'>z</a>"),
      // no-path page: base dir is the root slash
      (2L, "s", "http://b.test", "<a href='z.html'>z</a>"),
      // https page: protocol-relative picks up https
      (3L, "s", "https://c.test/p", "<a href='//cdn.test/l.js'>l</a>"),
      // query page: query stripped before deriving the base dir
      (4L, "s", "http://d.test/list?page=4", "<a href='n.html'>n</a>"),
      // root-relative from a nested page
      (5L, "s", "http://e.test/x/y/z.html", "<a href='/top.html'>t</a>"),
      // null page_url: relative link fails CLOSED
      (6L, "s", null.asInstanceOf[String], "<a href='rel.html'>r</a>"),
      // null page_url: absolute link still resolves
      (7L, "s", null.asInstanceOf[String], "<a href='http://f.test/p'>f</a>"))
      .toDF("doc_id", "source", "page_url", "html")
    val got = HtmlExtract.linkHostsResolvedFrom(pages)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a.test")._2 == 1L)
    assert(got("b.test")._2 == 1L)
    assert(got("cdn.test")._2 == 1L)
    assert(got("d.test")._2 == 1L)
    assert(got("e.test")._2 == 1L)
    assert(got("f.test")._2 == 1L)
    assert(got("(unresolved)")._2 == 1L)
    // and the resolved URL strings themselves are right: re-derive via
    // the column helpers on the planted rows
    val res = pages
      .select(col("doc_id"),
        HtmlExtract.resolveUrl(
          HtmlExtract.normalizeUrl(
            element_at(regexp_extract_all(col("html"),
              lit(HtmlExtract.HrefPattern), lit(1)), 1)),
          HtmlExtract.normalizeUrl(col("page_url"))).as("r"))
      .as[(Long, String)].collect().toMap
    assert(res(1L) == "http://a.test/x/z.html", res(1L))
    assert(res(2L) == "http://b.test/z.html", res(2L))
    assert(res(3L) == "https://cdn.test/l.js", res(3L))
    assert(res(4L) == "http://d.test/n.html", res(4L))
    assert(res(5L) == "http://e.test/top.html", res(5L))
    assert(res(6L) == null)
  }

  // ---- X88: novel-frontier discovery --------------------------------

  test("frontier_novel: crawled pages and self links drop; outlinks stay") {
    import spark.implicits._
    val pages = Seq(
      // A links to B's own URL (seen), to itself via fragment (seen),
      // and to an uncrawled page (novel)
      (1L, "s", "http://a.test/1.html",
        "<a href='http://b.test/2.html'>b</a> " +
          "<a href='#top'>self</a> " +
          "<a href='/new.html'>n</a>"),
      (2L, "s", "http://b.test/2.html",
        "<a href='http://c.test/only.html?utm_source=x'>c</a>"))
      .toDF("doc_id", "source", "page_url", "html")
    val got = HtmlExtract.frontierNovelFrom(pages)
      .as[(String, String)].collect().toSet
    assert(got == Set(
      ("a.test", "http://a.test/new.html"),
      ("c.test", "http://c.test/only.html")),
      s"got $got")
  }

  test("frontier_novel: fixture frontier excludes every crawled page_url") {
    import spark.implicits._
    val novel = HtmlExtract.frontierNovel(spark, dir)
      .as[(String, String)].collect().map(_._2).toSet
    val seen = spark.read.option("header", "true")
      .csv(HtmlExtract.FixtureCsv)
      .select(HtmlExtract.normalizeUrl(col("page_url")).as("u"))
      .as[String].collect().toSet
    assert(novel.nonEmpty)
    assert((novel & seen).isEmpty,
      s"crawled URLs leaked into the novel frontier: ${novel & seen}")
  }

  test("frontier_novel_probe: batch-restricted subset of the backfill, memoized store") {
    import spark.implicits._
    val probe = HtmlExtract.frontierNovelProbe(spark, dir)
      .as[(String, String)].collect().toSet
    val full = HtmlExtract.frontierNovel(spark, dir)
      .as[(String, String)].collect().toSet
    assert(probe.nonEmpty && probe.subsetOf(full),
      s"probe must be the batch-outlink slice of the backfill: " +
        s"${probe -- full}")
    // and strictly smaller: the batch is a quarter of the crawl
    assert(probe.size < full.size)
    // the seen store is _SUCCESS-memoized per fixture listing
    assert(HtmlExtract.frontierSeenBuild(spark) ==
      HtmlExtract.frontierSeenBuild(spark))
  }

  // ---- X86: per-host crawl budget -----------------------------------

  test("crawl_budget: two-tier delay, exact integer window ceilings") {
    import spark.implicits._
    // (host, n_links, n_pages, n_source_pages, n_urls) — planted
    // boundary cases for the ceiling chain at both delay tiers
    val hosts = Seq(
      ("cold.test", 15L, 1L, 1L, 3600L),      // base delay, == slots → 1
      ("cold2.test", 15L, 1L, 1L, 3601L),     // base delay, slots+1 → 2
      ("hot.test", 16L, 1L, 1L, 1800L),       // hot cut inclusive, == slots
      ("hot2.test", 999L, 1L, 1L, 54001L),    // 30 windows + 1 → 31
      ("(non-http)", 99L, 1L, 1L, 99L),       // excluded
      ("(unresolved)", 99L, 1L, 1L, 99L))     // excluded
      .toDF("host", "n_links", "n_pages", "n_source_pages", "n_urls")
    val got = HtmlExtract.crawlBudgetFrom(hosts)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 4 && !got.contains("(non-http)"))
    assert(got("cold.test") == (("cold.test", 3600L, 1000L, 3600L, 1L)))
    assert(got("cold2.test") == (("cold2.test", 3601L, 1000L, 3600L, 2L)))
    assert(got("hot.test") == (("hot.test", 1800L, 2000L, 1800L, 1L)))
    assert(got("hot2.test") == (("hot2.test", 54001L, 2000L, 1800L, 31L)))
  }

  test("crawl_budget OBEYS the parsed Crawl-delay; heuristic is the fallback (X86+X100)") {
    import spark.implicits._
    val hosts = Seq(
      ("declared.hot", 999L, 1L, 1L, 3600L),  // heuristic says 2000ms
      ("declared.cold", 1L, 1L, 1L, 10L),     // heuristic says 1000ms
      ("declared.huge", 1L, 1L, 1L, 5L),      // delay > window
      ("fallback.test", 15L, 1L, 1L, 100L))   // declares nothing
      .toDF("host", "n_links", "n_pages", "n_source_pages", "n_urls")
    val declared = Seq(
      ("declared.hot", 10000L), ("declared.cold", 2000L),
      ("declared.huge", 7200000L))
      .toDF("host", "declared_delay_ms")
    val got = HtmlExtract.crawlBudgetFrom(hosts, declared)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // declared wins over BOTH heuristic tiers
    assert(got("declared.hot") ==
      (("declared.hot", 3600L, 10000L, 360L, 10L)))
    assert(got("declared.cold") ==
      (("declared.cold", 10L, 2000L, 1800L, 1L)))
    // a delay longer than the window clamps to ONE slot per window
    assert(got("declared.huge") ==
      (("declared.huge", 5L, 7200000L, 1L, 5L)))
    assert(got("fallback.test") ==
      (("fallback.test", 100L, 1000L, 3600L, 1L)))
    // end to end over the committed fixtures: docs.example.com is
    // heuristically HOT but declares 10s; tracker.test.net is
    // heuristically cold but declares a FRACTIONAL 2.5s (ceil'd to
    // 2500 ms) next to a junk value the numeric filter must ignore;
    // undeclared hosts keep the heuristic tiers
    val full = HtmlExtract.crawlBudget(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(full("docs.example.com") == 10000L)
    assert(full("tracker.test.net") == 2500L)
    assert(full("www.example.org") == 2000L)
    assert(full("cdn.shared.test") == 1000L)
  }

  // ---- X84: composed crawl-entry pipeline ---------------------------

  test("crawl_ingest: stage counts are conserved and monotone per source") {
    import spark.implicits._
    val rows = HtmlExtract.crawlIngest(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val bySrc = rows.map(r => r._1 -> r).toMap
    rows.foreach { case (src, nP, nA, nU, nF, nTok, nCh) =>
      assert(nA <= nP && nU <= nA && nF <= nU,
        s"$src not monotone: $nP/$nA/$nU/$nF")
      assert((nF == 0) == (nTok == 0L && nCh == 0L), src)
    }
    assert(rows.map(_._2).sum ==
      spark.read.option("header", "true")
        .csv(HtmlExtract.FixtureCsv).count())
    // chrome-heavy families admit nothing: boilerplate-only pages are
    // flagged, link farms exceed the density cut
    assert(bySrc("crawl5")._3 == 0L)
    assert(bySrc("crawl1")._3 == 0L)
    // plain-text pages (hash-driven independent word draws) must NOT
    // collapse in the near-dup stage — the degenerate-vocabulary trap
    assert(bySrc("crawl2")._4 == bySrc("crawl2")._5,
      s"independent plain-text docs near-dup-collapsed: ${bySrc("crawl2")}")
  }

  test("crawl_ingest: mirror pairs dedup exact, edited mirrors dedup near") {
    import spark.implicits._
    val crawl7 = HtmlExtract.crawlIngest(spark, dir)
      .filter(col("source") === "crawl7")
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    // 6 pages: 2 exact-mirror pairs (raw HTML differs by comments/
    // script, extracted text identical → exact stage) + 1 EDITED
    // mirror pair (one appended word → only the near-dup stage can
    // collapse it): 6 admitted, 4 exact-unique, 3 final
    assert(crawl7._2 == 6L && crawl7._3 == 6L && crawl7._4 == 4L &&
      crawl7._5 == 3L,
      s"expected 6 pages / 6 admitted / 4 unique / 3 final, got $crawl7")
    // and the raw bytes genuinely differ — extraction + near-dup are
    // what make them duplicates
    val raw = spark.read.option("header", "true")
      .csv(HtmlExtract.FixtureCsv)
      .filter(col("source") === "crawl7")
      .select("html").as[String].collect()
    assert(raw.distinct.length == 6, "raw pages must all differ")
  }

  test("crawl_ingest: null-html pages count as seen but never admit") {
    import spark.implicits._
    val pages = Seq(
      (1L, "advsrc", null.asInstanceOf[String]),
      (2L, "advsrc", "<p>" + ("word " * 30) + "</p>"))
      .toDF("doc_id", "source", "html")
    val row = HtmlExtract.crawlIngestFrom(pages)
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    // the null page is a fetch that happened (n_pages) but carries no
    // admissible text — the null verdicts must fail it closed, not
    // crash the window or the manifest
    assert(row == (("advsrc", 2L, 1L, 1L, 1L, 30L, row._7)))
  }

  // --- real-input battery (VERDICT r13 item 1) ---------------------
  // The committed fixture stays CSV-dialect-constrained (single-line,
  // no double quotes); these rows exercise the shapes real HTML is
  // made of — multiline blocks, double-quoted/unquoted attributes,
  // numeric entities — via toDF, which has no such constraint.

  test("multiline script/style/comment/nav/footer/CDATA regions are removed") {
    import spark.implicits._
    val html =
      """<html><head>
        |<script type='text/javascript'>
        |  var leak = 'code';
        |  document.write('<p>gen</p>');
        |</script>
        |<style>
        |  .x { color: red; }
        |</style>
        |</head><body>
        |<!-- a comment
        |     spanning lines -->
        |<nav>
        |  <a href="/a">home</a>
        |</nav>
        |<![CDATA[ raw
        | block ]]>
        |<p>real body text</p>
        |<footer>
        |  site footer
        |</footer>
        |</body></html>""".stripMargin
    val t = HtmlExtract.htmlExtractFrom(
      Seq((1L, "ml", html)).toDF("doc_id", "source", "html"))
      .collect()(0).getString(2)
    assert(t == "real body text", s"got: '$t'")
  }

  test("double-quoted, unquoted and spaced href forms all extract") {
    import spark.implicits._
    val html = "<body>" +
      "<a href=\"http://dq.test/p1\">dq</a> " +
      "<a href='http://sq.test/p2'>sq</a> " +
      "<a href=http://uq.test/p3>uq</a> " +
      "<a href = \"http://sp.test/p4\">spaced</a>" +
      "</body>"
    val hosts = HtmlExtract.linkHostsFrom(
      Seq((1L, "qd", html)).toDF("doc_id", "source", "html"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    Seq("dq.test", "sq.test", "uq.test", "sp.test").foreach { h =>
      assert(hosts.contains(h), s"host $h not extracted: ${hosts.keys}")
      assert(hosts(h)._2 == 1L && hosts(h)._4 == 1L, hosts(h))
    }
    // and the anchor/link stats agree: 4 links measured on the body
    val ex = HtmlExtract.htmlExtractFrom(
      Seq((1L, "qd", html)).toDF("doc_id", "source", "html")).head()
    assert(ex.getLong(4) == 4L, s"n_links ${ex.getLong(4)}")
  }

  test("numeric entities decode to ASCII stand-ins, one pass, amp last") {
    import spark.implicits._
    val html = "<p>it&#8217;s &#8220;quoted&#8221; &#8212; dash " +
      "&#x2019;hex&#x2026; nb&#160;sp &#34;q&#34; " +
      "&amp;#8217; stays {filler}</p>"
    val t = HtmlExtract.htmlExtractFrom(
      Seq((1L, "ne", html)).toDF("doc_id", "source", "html"))
      .head().getString(2)
    assert(t.contains("it's \"quoted\" - dash"), t)
    assert(t.contains("'hex... nb sp \"q\""), t)
    // double-encoded numeric form decodes ONCE: &amp;#8217; -> &#8217;
    assert(t.contains("&#8217; stays"), t)
  }

  test("utm-first URLs fold with their canonical twin (query glue re-anchored)") {
    import spark.implicits._
    val html = "<body>" +
      "<a href='http://h.test/p?utm_source=s&id=2'>utm first</a> " +
      "<a href='http://h.test/p?id=2'>canonical</a> " +
      "<a href='http://h.test/p?id=2&utm_medium=m'>utm last</a> " +
      "<a href='http://h.test/p?utm_a=1&utm_b=2&id=2'>utm double head</a> " +
      // the guard: a legit '&' in a query-less path must NOT be
      // rewritten to '?' (no utm was ever stripped from this URL)
      "<a href='http://amp.test/a&b'>path amp</a> " +
      "<a href='http://amp.test/a?b'>genuinely different</a>" +
      "</body>"
    val rows = HtmlExtract.linkHostsFrom(
      Seq((1L, "utm", html)).toDF("doc_id", "source", "html"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rows("h.test") == (("h.test", 4L, 1L, 1L)),
      s"all four variants must fold to one canonical URL: ${rows("h.test")}")
    assert(rows("amp.test")._4 == 2L,
      s"/a&b and /a?b are different URLs and must not fold: ${rows("amp.test")}")
  }

  test("in-memory adversarial rows: nulls and megabyte entity runs don't throw") {
    import spark.implicits._
    val big = "&amp;" * 200000 // ~1 MB of entities
    val rows = Seq(
      (1L, "adv", null.asInstanceOf[String]),
      (2L, "adv", ""),
      (3L, "adv", big),
      (4L, "adv", "<" * 100000),
      (5L, "adv", "<a href='x'>" + ("y " * 50000) + "</a>"))
      .toDF("doc_id", "source", "html")
    val got = HtmlExtract.htmlExtractFrom(rows).collect()
    assert(got.length == 5)
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(2)) // null html propagates, never crashes
    assert(byId(3L).getString(2) == "&" * 200000)
    assert(byId(5L).getDouble(6) > 0.9) // one giant link: density ~1
  }

  test("anchor_text: href+text pairing, resolution, top-3 cut (X97)") {
    import spark.implicits._
    val pages = Seq(
      (1L, "s", "http://src.test/a/",
        "<a href='http://t.test/x'>Alpha beta</a> " +
        "<a href='/y'>beta</a> " +
        "<a href='rel.html'>beta gamma</a> " +
        "<a href='#f'>self words</a> " +
        "<a name='n'>no href drops</a> " +
        "<a href='http://t.test/z'>  </a> " +
        "<a href='mailto:a@b.test'>mail term fenced</a> " +
        "<a href='http://t2.test/'><b>Bold</b>\nText</a>"),
      // null page_url: relative link fails closed → excluded
      (2L, "s", null, "<a href='/q'>lost</a>"),
      // >3 distinct terms on one host: the TopKPerKey cut must keep
      // exactly 3, count DESC then term ASC
      (3L, "s", "http://src.test/",
        "<a href='http://many.test/p'>zz zz yy xx ww</a>")
    ).toDF("doc_id", "source", "page_url", "html")
    val got = HtmlExtract.anchorTextFrom(pages)
      .as[(String, Long, String, Long)].collect()
    val byHost = got.groupBy(_._1)
    assert(byHost.keySet == Set("src.test", "t.test", "t2.test",
      "many.test"), byHost.keySet)
    // src.test: beta 2 (root-relative + relative), gamma/self/words 1
    assert(byHost("src.test").toSeq.sorted == Seq(
      ("src.test", 1L, "beta", 2L), ("src.test", 2L, "gamma", 1L),
      ("src.test", 3L, "self", 1L)))
    // t.test: the empty-text anchor dropped, only alpha/beta remain
    assert(byHost("t.test").toSeq.sorted == Seq(
      ("t.test", 1L, "alpha", 1L), ("t.test", 2L, "beta", 1L)))
    // nested markup inside the anchor strips to its text
    assert(byHost("t2.test").toSeq.sorted == Seq(
      ("t2.test", 1L, "bold", 1L), ("t2.test", 2L, "text", 1L)))
    // top-3 cut: zz(2) then ww/xx ascending; yy falls off
    assert(byHost("many.test").toSeq.sorted == Seq(
      ("many.test", 1L, "zz", 2L), ("many.test", 2L, "ww", 1L),
      ("many.test", 3L, "xx", 1L)))
  }

  test("anchor_text: fixture ranks are dense and counts non-increasing (X97)") {
    import spark.implicits._
    val got = HtmlExtract.anchorText(spark, dir)
      .as[(String, Long, String, Long)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (host, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"$host ranks not dense: ${sorted.toSeq}")
      assert(sorted.length <= HtmlExtract.AnchorTopK)
      assert(sorted.toSeq.sliding(2).forall {
        case Seq(a, b) => a._4 > b._4 || (a._4 == b._4 && a._3 < b._3)
        case _ => true
      }, s"$host order violated: ${sorted.toSeq}")
    }
    // the nav chrome dominates the three nav hosts' anchor mass: 40
    // article pages × 4 nav links each titled '<word> page<j>', so
    // the shared 'page<j>' tokens must surface in the top-3
    val navTerms = got.filter(r => Set("docs.example.com",
      "internal.test.net", "www.example.org")(r._1)).map(_._3).toSet
    assert(navTerms.exists(_.startsWith("page")), navTerms)
  }

  test("crawl_traps: fixture trap hosts flag, healthy hosts do not (X96)") {
    import spark.implicits._
    val got = HtmlExtract.crawlTraps(spark, dir)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // session-id explosion: 4 pages × 10 sid variants, ONE path
    val trap = got("trap.fz.test")
    assert(trap._2 == 40L && trap._3 == 1L && trap._4 == 40L && trap._6,
      trap)
    // calendar dig: 4 distinct ever-deeper paths, 1 variant each
    val cal = got("cal.fz.test")
    assert(cal._3 == 4L && cal._4 == 1L && cal._5 == 13L && cal._6, cal)
    // healthy pagination stays under the bar: q.html?id=0..7 is the
    // fixture's deepest legitimate variant family
    val healthy = got("docs.example.com")
    assert(healthy._4 == 8L && !healthy._6, healthy)
    // and NOTHING else flags — the two planted hosts are the only traps
    assert(got.values.filter(_._6).map(_._1).toSet ==
      Set("trap.fz.test", "cal.fz.test"),
      got.values.filter(_._6).toSeq.sortBy(_._1))
  }

  test("crawl_traps: both thresholds are exact boundaries (X96)") {
    import spark.implicits._
    val v = HtmlExtract.TrapVariants.toInt   // 16
    val dp = HtmlExtract.TrapDepth.toInt     // 8
    def links(host: String, n: Int) = (0 until n)
      .map(j => s"<a href='http://$host/p?v=$j'>x</a>").mkString(" ")
    def deep(host: String, segs: Int) =
      s"<a href='http://$host/${(1 to segs).map(i => s"s$i").mkString("/")}'>d</a>"
    val pages = Seq(
      (1L, "t", "http://src.test/", links("at.test", v)),
      (2L, "t", "http://src.test/", links("under.test", v - 1)),
      // segs path segments → segs slashes? '/s1/../sN' = N slashes
      (3L, "t", "http://src.test/", deep("deep.test", dp)),
      (4L, "t", "http://src.test/", deep("shallow.test", dp - 1))
    ).toDF("doc_id", "source", "page_url", "html")
    val got = HtmlExtract.crawlTrapsFrom(pages)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("at.test")._4 == v.toLong && got("at.test")._6)
    assert(got("under.test")._4 == (v - 1).toLong && !got("under.test")._6)
    assert(got("deep.test")._5 == dp.toLong && got("deep.test")._6)
    assert(got("shallow.test")._5 == (dp - 1).toLong &&
      !got("shallow.test")._6)
  }

  test("paragraph keep-first dedup: earliest copy survives, rest drop (X95)") {
    import spark.implicits._
    val md5hex = (s: String) => java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val pages = Seq(
      // doc 1 owns both paragraphs; doc 2 repeats x, keeps only z
      (1L, "<p>x one</p><p>y two</p>"),
      (2L, "<P class='a'>x   one</P><p>z three</p>"),
      // doc 3: within-doc duplicate — second copy drops
      (3L, "<p>q</p><p>q</p>"),
      // doc 4: empty-after-strip, unclosed block, multiline + nested
      // tags — only the real paragraph counts
      (4L, "<p>  <b> </b> </p><p>never closed <p>A\nB <i>C</i></p>"),
      // doc 5: no paragraphs at all — absent from the output
      (5L, "<div>no paras here</div>")
    ).toDF("doc_id", "html")
    val got = HtmlExtract.paragraphDedupFrom(pages).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == ((2L, 2L, md5hex("x one y two"))))
    // doc 2's "x   one" collapses to "x one" = doc 1's — only z kept
    assert(got(2L) == ((2L, 1L, md5hex("z three"))))
    assert(got(3L) == ((2L, 1L, md5hex("q"))))
    // the unclosed "<p>never closed " swallows up to the NEXT </p>
    // (non-greedy): its inner "<p>A\nB <i>C</i>" strips to the text —
    // deterministic, documented fall-through, one surviving paragraph
    assert(got(4L)._1 == 1L && got(4L)._3 == md5hex("never closed A B C"))
  }

  test("paragraph dedup FAILS LOUDLY on a winner-encode bound violation (X95)") {
    import spark.implicits._
    // doc_id ≥ 2⁴³ would silently wrap into a neighboring doc's key
    // space pre-round-15; the raise_error guard must surface instead
    val pages = Seq((Long.MaxValue / HtmlExtract.IdxCap, "<p>x</p>"))
      .toDF("doc_id", "html")
    val e = intercept[Exception] {
      HtmlExtract.paragraphDedupFrom(pages).collect()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: causes(t.getCause)
    assert(causes(e).exists(_.contains("winner encode out of bounds")),
      s"expected the guard's message, got: ${causes(e).take(3)}")
  }
}
