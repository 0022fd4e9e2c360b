package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** X90 gates: the power method against an in-test reference that
  * replays the SAME decimal-exact accumulation (so agreement is
  * near-bit, not approximate), plus the graph-construction contract
  * on the crawl fixture. */
class LinkGraphSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference PageRank mirroring the engine's arithmetic: per-round
    * in-mass and dangling mass accumulate as DECIMAL(30,8) (HALF_UP
    * per element, exact sum, string-routed back to double — the
    * Tables.dsum contract); everything else is plain double ops in
    * the same shape. */
  private def refPagerank(edges: Seq[(String, String)]):
      Map[String, Double] = {
    def dsum(xs: Iterable[Double]): Double =
      if (xs.isEmpty) 0.0
      else java.lang.Double.parseDouble(
        xs.map(x => BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP))
          .sum.bigDecimal.toPlainString)
    val dist = edges.distinct
    val nodes = (dist.map(_._1) ++ dist.map(_._2)).distinct.sorted
    val out = dist.groupBy(_._1).map { case (s, es) => s -> es.size }
    val in = dist.groupBy(_._2)
    val nd = nodes.size.toDouble
    var rank = nodes.map(_ -> (1.0 / nd)).toMap
    for (_ <- 1 to LinkGraph.Iters) {
      val dang = dsum(nodes.filterNot(out.contains).map(rank))
      rank = nodes.map { v =>
        val s = dsum(in.getOrElse(v, Seq.empty)
          .map { case (u, _) => rank(u) / out(u).toDouble })
        v -> ((LinkGraph.Teleport / nd) +
          (LinkGraph.Damping * (s + (dang / nd))))
      }.toMap
    }
    rank
  }

  private def run(edges: Seq[(String, String)]): Map[String, Double] =
    LinkGraph.pagerank(edges.toDF("src", "dst").distinct())
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap

  test("star graph: the hub out-ranks every leaf, reference-exact") {
    val edges = (1 to 6).map(i => (s"leaf$i.test", "hub.test"))
    val got = run(edges)
    val want = refPagerank(edges)
    assert(got.keySet == want.keySet)
    for ((h, r) <- want)
      assert(math.abs(got(h) - r) < 1e-12, s"$h: ${got(h)} vs $r")
    assert(got("hub.test") > got("leaf1.test") * 3,
      "six in-links must dominate a no-in-link leaf")
  }

  test("broadcast guard: shuffle-join fallback is rank-identical (r17)") {
    // maxBroadcastHosts = 0 forces every round's rank/contrib joins
    // onto the keyed-shuffle path — the graceful degradation the
    // guard exists for at 10⁸+ hosts. Ranks must be BIT-identical:
    // the per-round sums are exact decimal (order-free), so the join
    // strategy cannot change a single ulp.
    val edges = (1 to 6).map(i => (s"leaf$i.test", "hub.test")) ++
      Seq(("hub.test", "leaf1.test"), ("x.test", "y.test"))
    val bcast = LinkGraph.pagerank(edges.toDF("src", "dst").distinct())
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val shuf = LinkGraph.pagerank(edges.toDF("src", "dst").distinct(),
        maxBroadcastHosts = 0L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(bcast == shuf,
      "shuffle fallback must reproduce the broadcast plan's ranks")
  }

  test("dangling mass: a sink's rank is redistributed, mass sums to 1") {
    // chain with a sink end and a side feeder — the sink donates back
    val edges = Seq(("a.test", "b.test"), ("b.test", "c.test"),
      ("d.test", "b.test"))
    val got = run(edges)
    val want = refPagerank(edges)
    for ((h, r) <- want)
      assert(math.abs(got(h) - r) < 1e-12, s"$h: ${got(h)} vs $r")
    val mass = got.values.sum
    assert(math.abs(mass - 1.0) < 1e-6,
      s"rank mass must be conserved, got $mass")
  }

  test("2-cycle + feeder: oscillation is reference-exact at iter 10") {
    // a↔b with c→a: the cycle makes the power method OSCILLATE
    // toward the fixed point (a asymptotically wins on the extra
    // in-link, but iteration parity decides who leads at any finite
    // round) — the engine must reproduce the reference's round-10
    // snapshot exactly, not the limit.
    val edges = Seq(("a.test", "b.test"), ("b.test", "a.test"),
      ("c.test", "a.test"))
    val got = run(edges)
    val want = refPagerank(edges)
    for ((h, r) <- want)
      assert(math.abs(got(h) - r) < 1e-12, s"$h: ${got(h)} vs $r")
    assert(got("c.test") < got("a.test") && got("c.test") < got("b.test"),
      "the feeder with no in-links must rank last")
  }

  test("seeded random graphs agree with the reference bit-for-bit") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 8 + trial * 3
      val hosts = (0 until n).map(i => s"h$i.test")
      val edges = (1 to n * 3).map { _ =>
        (hosts(rnd.nextInt(n)), hosts(rnd.nextInt(n)))
      }.filter { case (a, b) => a != b }.distinct
      val got = run(edges)
      val want = refPagerank(edges)
      assert(got.keySet == want.keySet, s"trial $trial node set")
      for ((h, r) <- want)
        assert(math.abs(got(h) - r) < 1e-12,
          s"trial $trial $h: ${got(h)} vs $r")
    }
  }

  test("fixture graph: fetchable hosts only, no self-edges, sane degs") {
    val rows = LinkGraph.linkPagerank(spark, "/root/testdata/sf0.001")
      .collect()
    val hosts = rows.map(_.getString(0)).toSet
    assert(!hosts.contains("(non-http)") && !hosts.contains("(unresolved)"),
      "un-fetchable buckets must not enter the graph")
    assert(rows.nonEmpty && rows.forall(_.getDouble(3) > 0.0),
      "every node keeps at least the teleport share")
    // ordering contract: rank desc, then host
    val ranks = rows.map(_.getDouble(3)).toSeq
    assert(ranks == ranks.sorted(Ordering[Double].reverse))
    // every host has in-links or out-links (it came from an edge)
    assert(rows.forall(r => r.getLong(1) > 0 || r.getLong(2) > 0))
  }

  // ---- X90b: warm-start incremental rank probe ------------------------

  test("warm-start probe: close to the cold answer, improves on not iterating, ranks new hosts (X90b)") {
    val dir = "/root/testdata/sf0.001"
    val cold = LinkGraph.linkPagerank(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val warm = LinkGraph.linkPagerankProbe(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // same node set: the probe ranks the FULL grown graph
    assert(warm.keySet == cold.keySet)
    // hosts linked ONLY by the batch slice are new to the store but
    // present in the probe
    val base = spark.read.parquet(LinkGraph.baseRankStore(spark))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val newHosts = warm.keySet -- base.keySet
    assert(newHosts.nonEmpty,
      "the fixture batch slice must introduce at least one new host")
    // warm start BEFORE iterating: stored ranks + uniform for new
    val n = warm.size.toDouble
    val warm0 = cold.keySet.map(h =>
      h -> base.getOrElse(h, 1.0 / n)).toMap
    def l1(a: Map[String, Double], b: Map[String, Double]) =
      a.keySet.iterator.map(h => math.abs(a(h) - b(h))).sum
    val d0 = l1(warm0, cold)
    val d2 = l1(warm, cold)
    assert(d2 < d0,
      s"two warm rounds must improve on not iterating: $d2 vs $d0")
    assert(d2 < 0.05, s"warm residual too large: $d2 (cold mass is 1)")
  }

  // ---- X105: host-graph connected components --------------------------

  test("host_clusters: planted components, string min-labels (X105)") {
    val pages = Seq(
      (1L, "s", "http://pa.test/",
        "<a href='http://x.test/1'>a</a> <a href='http://y.test/1'>b</a>"),
      (2L, "s", "http://pb.test/", "<a href='http://y.test/2'>c</a>"),
      (3L, "s", "http://pc.test/", "<a href='http://z.test/1'>d</a>")
    ).toDF("doc_id", "source", "page_url", "html")
    val got = LinkGraph.hostClustersFrom(pages).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    // component 1: pa→{x,y}, pb→y — min label 'pa.test', 4 hosts
    Seq("pa.test", "pb.test", "x.test", "y.test").foreach { h =>
      assert(got(h) == (("pa.test", 4L)), s"$h: ${got(h)}")
    }
    // component 2: pc→z — min label 'pc.test', 2 hosts
    Seq("pc.test", "z.test").foreach { h =>
      assert(got(h) == (("pc.test", 2L)), s"$h: ${got(h)}")
    }
  }

  test("host_clusters: fixture labels are canonical minima and partition (X105)") {
    val rows = LinkGraph.hostClusters(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      assert(members.map(_._1).min == c,
        s"cluster label $c is not its members' minimum")
      assert(members.forall(_._3 == members.length.toLong),
        s"cluster $c size column inconsistent")
    }
    // hosts appear exactly once (clusters partition the host set)
    assert(rows.map(_._1).distinct.length == rows.length)
    // the planted trap neighborhood: the trapsite crawl host and its
    // two trap targets share one component
    val byHost = rows.map(r => r._1 -> r._2).toMap
    assert(byHost("trap.fz.test") == byHost("cal.fz.test") &&
      byHost("trap.fz.test") == byHost("trapsite.crawl.test"))
  }

  // ---- X99: composed frontier priority -------------------------------

  test("host_priority: factors compose, traps zero, prior applies (X99)") {
    val longText = (1 to 30).map(i => s"word$i").mkString(" ")
    val variants = (0 until 16)
      .map(j => s"<a href='http://t.test/p?v=$j'>v</a>").mkString(" ")
    val pages = Seq(
      // c.test page 1: admitted (long text, low density), links n+t
      (1L, "s", "http://c.test/a",
        s"<p>$longText <a href='http://n.test/x1'>z</a> $variants</p>"),
      // c.test page 2: <nav> → boilerplate-flagged, not admitted
      (2L, "s", "http://c.test/b",
        "<nav><a href='http://n.test/x2'>z</a></nav>")
    ).toDF("doc_id", "source", "page_url", "html")
    val got = LinkGraph.hostPriorityFrom(pages).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4), r.getDouble(5)))).toMap
    // novel hosts only: c.test is linked by nobody → absent
    assert(got.keySet == Set("n.test", "t.test"), got.keySet)
    val ref = refPagerank(Seq(("c.test", "n.test"), ("c.test", "t.test")))
    val n = got("n.test")
    // never-crawled host: the admit-rate prior; priority = rank×prior
    assert(n._1 == 2L && !n._4)
    assert(math.abs(n._2 - ref("n.test")) < 1e-12, n)
    assert(n._3 == LinkGraph.AdmitPrior)
    assert(n._5 == n._2 * n._3, "priority must be the exact product")
    // trap host: 16 variants of one path → structural zero
    val t = got("t.test")
    assert(t._1 == 16L && t._4 && t._5 == 0.0, t)
  }

  test("host_priority: fixture internal consistency and trap zeroing (X99)") {
    val rows = LinkGraph.hostPriority(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // priority is EXACTLY the documented function of the row's own
    // columns — no hidden recomputation drift
    rows.foreach { r =>
      assert(r._6 == (if (r._5) 0.0 else r._3 * r._4), r)
    }
    val byHost = rows.map(r => r._1 -> r).toMap
    // the planted trap hosts carry novel backlog but zero priority
    assert(byHost("trap.fz.test")._5 && byHost("trap.fz.test")._6 == 0.0)
    assert(byHost("cal.fz.test")._5 && byHost("cal.fz.test")._6 == 0.0)
    // somebody is worth fetching
    assert(rows.exists(_._6 > 0.0))
    // ordering contract: priority desc, then host asc
    val ps = rows.map(_._6).toSeq
    assert(ps == ps.sorted(Ordering[Double].reverse))
  }
}
