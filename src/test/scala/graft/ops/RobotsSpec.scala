package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** X87 gates: each documented RFC-9309-subset behavior pinned on the
  * planted fixture shapes, plus toDF edges the fixture dialect cannot
  * carry. */
class RobotsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val verdicts =
    Robots.robotsGate(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getBoolean(2), r.getString(3), r.getLong(4)))).toMap

  private def allowed(host: String) =
    verdicts.collect { case ((h, u), (a, _, _)) if h == host => (u, a) }

  test("longest match wins: the /p1 allow carves out of the /p disallow") {
    val dex = allowed("docs.example.com").toMap
    assert(!dex("http://docs.example.com/p0.html"),
      "/p0 must be blocked by disallow:/p")
    assert(dex("http://docs.example.com/p1.html"),
      "/p1 must be re-allowed by the LONGER allow:/p1")
    // delay override from crawl-delay: 2
    assert(verdicts(("docs.example.com",
      "http://docs.example.com/p0.html"))._3 == 2000L)
  }

  test("equal-length allow and disallow tie: allow wins (RFC 9309)") {
    val c8 = allowed("crawl8.crawl.test").toMap
    val sub = c8.filter(_._1.contains("/sub/"))
    assert(sub.nonEmpty && sub.values.forall(identity),
      s"allow:/sub/ must win its equal-length disallow tie: $sub")
    val root = c8.filter(_._1.contains("/root/"))
    assert(root.nonEmpty && root.values.forall(v => !v),
      s"/root targets stay blocked: $root")
  }

  test("empty disallow imposes no restriction; non-* agents are ignored") {
    assert(allowed("internal.test.net").forall(_._2),
      "empty-value disallow must be dropped, not treated as match-all")
    // crawl-delay still honored for that host
    assert(verdicts.collect { case ((h, _), v)
      if h == "internal.test.net" => v._3 }.forall(_ == 10000L))
    // www.example.org's rules are all for other agents: default allow,
    // default delay
    val weo = verdicts.collect { case ((h, _), v)
      if h == "www.example.org" => v }
    assert(weo.nonEmpty && weo.forall(v => v._1 &&
      v._2 == "(default)" && v._3 == Robots.DefaultDelayMs))
  }

  test("disallow:/ blocks everything; rule-free hosts default-allow") {
    assert(allowed("cdn.shared.test").forall(v => !v._2))
    assert(allowed("tracker.test.net").forall(_._2))
    // cdn's only crawl-delay value is junk ("n/a") — filtered, so the
    // host keeps the default delay instead of a null one
    assert(verdicts.collect { case ((h, _), v)
      if h == "cdn.shared.test" => v._3 }
      .forall(_ == Robots.DefaultDelayMs))
    // unquoted.test declares a FRACTIONAL 0.5 s: double-parsed and
    // ceil'd to 500 ms (an integer cast silently fell to the default)
    assert(verdicts.collect { case ((h, _), v)
      if h == "unquoted.test" => v._3 }.forall(_ == 500L))
  }

  test("frontier_schedule: novel ∧ allowed only, robots delay drives windows") {
    import spark.implicits._
    val sched = Robots.frontierSchedule(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // fully-disallowed hosts never reach the schedule
    assert(!sched.contains("cdn.shared.test"))
    // the robots crawl-delay (10 s) drives the window arithmetic
    assert(sched("internal.test.net")._3 == 10000L &&
      sched("internal.test.net")._4 == 360L)
    // crawl8: self links are SEEN (novel drop) and /root targets are
    // disallowed — only the /sub and cdn-free remainder schedules
    assert(sched("crawl8.crawl.test")._2 == 8L,
      s"crawl8 backlog: ${sched("crawl8.crawl.test")}")
    // every scheduled backlog is consistent: windows = ceil(urls/slots)
    sched.values.foreach { case (_, n, _, slots, w) =>
      assert(w == (n + slots - 1) / slots)
    }
  }

  test("frontier_schedule: multi-window backlog via toDF") {
    import spark.implicits._
    val novel = (1 to 4000).map(i => ("big.test", s"http://big.test/p$i"))
      .toDF("host", "url")
    val rules = Seq(("big.test", "*", "crawl-delay", "2", 1L))
      .toDF("host", "agent", "directive", "value", "rule_order")
    val got = Robots.frontierScheduleFrom(novel, rules)
      .as[(String, Long, Long, Long, Long)].head()
    // 4000 urls at 2s delay → 1800 slots/window → 3 windows
    assert(got == (("big.test", 4000L, 2000L, 1800L, 3L)), got)
  }

  test("toDF edges: query-only paths, no-rules host, delay without path rules") {
    import spark.implicits._
    val urls = Seq(
      ("h.test", "http://h.test/?x=1"),   // query-only path → '/?x=1'
      ("h.test", "http://h.test"),        // path-less → '/'
      ("free.test", "http://free.test/p"))
      .toDF("host", "r")
    val rules = Seq(
      ("h.test", "*", "disallow", "/?x", 1L),
      ("h.test", "*", "crawl-delay", "7", 2L))
      .toDF("host", "agent", "directive", "value", "rule_order")
    val got = Robots.robotsGateFrom(urls, rules)
      .as[(String, String, Boolean, String, Long)].collect()
      .map(r => r._2 -> r).toMap
    assert(got("http://h.test/?x=1") ==
      (("h.test", "http://h.test/?x=1", false, "disallow:/?x", 7000L)),
      s"query-only path must prefix-match: ${got("http://h.test/?x=1")}")
    assert(got("http://h.test")._3 && got("http://h.test")._5 == 7000L,
      "path-less URL reads as '/', unmatched by /?x, delay still applies")
    assert(got("http://free.test/p") ==
      (("free.test", "http://free.test/p", true, "(default)",
        Robots.DefaultDelayMs)))
  }

  // ---- X100: raw robots.txt parsing ----------------------------------

  test("robots_parse: fixture bodies parse to the exact rules relation (X100)") {
    import spark.implicits._
    val got = Robots.robotsParse(spark, dir)
      .as[(String, String, String, String, Long)].collect().toSeq
    // a.test: comments/CRLF/blank lines stripped, one * group; the
    // TOP-OF-FILE Sitemap line (before any group) is a non-group
    // record and must be emitted with agent * (ADVICE r15)
    assert(got.filter(_._1 == "a.test") == Seq(
      ("a.test", "*", "sitemap", "http://a.test/sitemap-index.xml", 1L),
      ("a.test", "*", "disallow", "/private", 2L),
      ("a.test", "*", "allow", "/private/ok", 3L),
      ("a.test", "*", "crawl-delay", "5", 4L)))
    // multi.test: two UA lines SHARE the first group (its one rule
    // emits under both agents); the second group is bot2-only
    assert(got.filter(_._1 == "multi.test") == Seq(
      ("multi.test", "*", "disallow", "/shared", 1L),
      ("multi.test", "googlebot", "disallow", "/shared", 2L),
      ("multi.test", "bot2", "disallow", "/bot2only", 3L),
      ("multi.test", "bot2", "allow", "/bot2only/sub", 4L)))
    // sloppy.test: orphan rule (before any UA) and junk line dropped;
    // caps + spaced colons fold; agents lowercase, VALUES keep case;
    // empty disallow survives faithfully; the in-group sitemap line
    // emits as a NON-GROUP record (agent *, not the group's agent)
    assert(got.filter(_._1 == "sloppy.test") == Seq(
      ("sloppy.test", "spiderbot", "disallow", "/Caps", 1L),
      ("sloppy.test", "spiderbot", "disallow", "", 2L),
      ("sloppy.test", "*", "sitemap",
        "http://sloppy.test/sitemap.xml", 3L),
      ("sloppy.test", "spiderbot", "allow", "/nospace", 4L)))
    // comments-only body contributes nothing
    assert(!got.exists(_._1 == "empty.test"))
    // the budget hosts: declared Crawl-delay (and docs' Sitemap
    // directive) parse faithfully — X86/X101 consume these rows
    assert(got.filter(_._1 == "docs.example.com") == Seq(
      ("docs.example.com", "*", "crawl-delay", "10", 1L),
      ("docs.example.com", "*", "sitemap",
        "http://docs.example.com/sitemap.xml", 2L)))
    assert(got.filter(_._1 == "tracker.test.net") == Seq(
      ("tracker.test.net", "*", "crawl-delay", "2.5", 1L),
      ("tracker.test.net", "*", "crawl-delay", "soonish", 2L)))
  }

  test("declaredDelays: agent-* crawl-delay rows only, min seconds, ms (X86 input)") {
    import spark.implicits._
    val rules = Seq(
      ("h.test", "*", "crawl-delay", "5", 1L),
      ("h.test", "*", "crawl-delay", "3", 2L),     // min wins
      ("h.test", "bot2", "crawl-delay", "1", 3L),  // non-* ignored
      ("i.test", "*", "disallow", "/x", 1L),       // not a delay
      ("j.test", "*", "crawl-delay", "7", 1L),
      // fractional seconds parse through double and ceil to whole ms
      // (ADVICE r15: an integer cast nulled them to the heuristic)
      ("k.test", "*", "crawl-delay", "0.5", 1L),
      ("k.test", "*", "crawl-delay", "0.75", 2L),  // min of doubles
      // junk is filtered BEFORE the min: it neither poisons a
      // numeric sibling (l.test) nor yields a null row (m.test)
      ("l.test", "*", "crawl-delay", "soonish", 1L),
      ("l.test", "*", "crawl-delay", "1.5", 2L),
      ("m.test", "*", "crawl-delay", "whenever", 1L))
      .toDF("host", "agent", "directive", "value", "rule_order")
    val got = Robots.declaredDelays(rules)
      .as[(String, Long)].collect().toMap
    assert(got == Map("h.test" -> 3000L, "j.test" -> 7000L,
      "k.test" -> 500L, "l.test" -> 1500L))
  }

  test("robots_parse output drives the X87 gate end to end (X100)") {
    import spark.implicits._
    val rules = Robots.robotsParse(spark, dir)
    val frontier = Seq(
      ("a.test", "http://a.test/private/x"),
      ("a.test", "http://a.test/private/ok/y"),
      ("a.test", "http://a.test/pub")
    ).toDF("host", "url")
    val got = Robots.robotsVerdictsFor(frontier, rules).collect()
      .map(r => r.getString(1) ->
        ((r.getBoolean(2), r.getString(3), r.getLong(4)))).toMap
    assert(got("http://a.test/private/x") ==
      ((false, "disallow:/private", 5000L)))
    assert(got("http://a.test/private/ok/y") ==
      ((true, "allow:/private/ok", 5000L)))
    assert(got("http://a.test/pub") == ((true, "(default)", 5000L)))
  }
}
