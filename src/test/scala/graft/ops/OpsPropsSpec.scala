package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Cross-operator invariants (SURVEY.md §5.2.3) on real testdata. */
class OpsPropsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("property: exact dedup output ⊆ input and equals the input's distinct set") {
    import spark.implicits._
    val input = graft.util.Tables.t(spark, dir, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_orderkey")
      .as[(String, String, Long)].collect()
    val out = Analytics.dedupExact(spark, dir)
      .as[(String, String, Long)].collect()
    assert(out.toSet.subsetOf(input.toSet))
    assert(out.toSet == input.toSet) // distinct loses nothing
    assert(out.length == input.toSet.size) // and keeps exactly one each
  }

  test("property: top-k equals the k-prefix of the fully sorted input") {
    import spark.implicits._
    val all = graft.util.Tables.t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .as[(Long, Long, Double)].collect()
      .sortBy(r => (-r._3, r._1))
    val topk = Analytics.topKOrders(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(topk.toSeq == all.take(25).toSeq)
  }

  test("property: dedup_canonical is a complete, consistent corpus manifest (X76)") {
    import spark.implicits._
    val manifest = Dedup.dedupCanonical(spark, dir)
      .select("group_id", "canonical_doc", "n_members", "sum_chars")
      .as[(Long, Long, Long, Long)].collect()
    val docs = graft.util.Tables.t(spark, dir, "documents")
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
    // complete: every doc in exactly one group
    assert(manifest.map(_._3).sum == docs.length)
    assert(manifest.map(_._4).sum == docs.map(_._2).sum)
    // canonical == group label == min member (labels are min-ids)
    manifest.foreach { case (g, c, _, _) => assert(c == g) }
    // consistent with dedup_groups: same group sizes
    val grpSizes = Dedup.dedupGroups(spark, dir)
      .select("group_id", "grp_size").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (g, rs) => g -> rs.head._2 }
    grpSizes.foreach { case (g, size) =>
      val row = manifest.find(_._1 == g)
      assert(row.exists(_._3 == size),
        s"group $g: manifest ${row.map(_._3)} vs dedup_groups $size")
    }
    assert(manifest.exists(_._3 > 1), "some multi-member group must exist")
  }

  test("property: length_outliers bounds match a driver-side interpolated percentile (X77)") {
    import spark.implicits._
    val got = QualitySignals.lengthOutliers(spark, dir)
      .select("doc_id", "lang", "n_chars", "lo", "hi", "keep")
      .as[(Long, String, Long, Double, Double, Boolean)].collect()
    val byLang = graft.util.Tables.t(spark, dir, "documents")
      .select("lang", "n_chars").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    // Spark Percentile's exact association: lo·(1−f) + hi·f (a
    // different-but-equal formula differs in the last ulp)
    def pct(v: IndexedSeq[Long], p: Double): Double = {
      val r = p * (v.length - 1)
      val i = r.toInt
      if (i + 1 >= v.length) v(i).toDouble
      else v(i) * (1.0 - (r - i)) + v(i + 1) * (r - i)
    }
    got.foreach { case (id, lang, n, lo, hi, keep) =>
      val v = byLang(lang)
      assert(lo == pct(v, 0.02) && hi == pct(v, 0.98),
        s"doc $id ($lang): bounds ($lo,$hi) vs driver " +
          s"(${pct(v, 0.02)},${pct(v, 0.98)})")
      assert(keep == (n >= lo && n <= hi))
    }
    assert(got.exists(!_._6), "some outlier must be flagged")
    assert(got.count(_._6) > got.length / 2, "most docs must be kept")
  }

  test("property: component labels survive a chain far deeper than the round budget") {
    import spark.implicits._
    // a 60-edge PATH has diameter 60 > maxIter 20: plain min-label
    // propagation truncates here (nodes far from the min keep
    // intermediate labels); the pointer-jumping rounds must not
    val chain = (0L until 60L).map(i => (100 + i, 101 + i))
      .toDF("doc_a", "doc_b")
    val got = Dedup.minLabelComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 61)
    got.foreach { case (id, grp) =>
      assert(grp == 100L, s"node $id labeled $grp, expected 100") }
    // and a forest of two deep chains + one star keeps components apart
    val forest = ((0L until 40L).map(i => (1000 + i, 1001 + i)) ++
      (0L until 40L).map(i => (2000 + i, 2001 + i)) ++
      (1L to 5L).map(i => (3000L, 3000 + i)))
      .toDF("doc_a", "doc_b")
    val lbl = Dedup.minLabelComponents(forest)
      .as[(Long, Long)].collect().toMap
    assert((1000L to 1040L).forall(lbl(_) == 1000L))
    assert((2000L to 2040L).forall(lbl(_) == 2000L))
    assert((3000L to 3005L).forall(lbl(_) == 3000L))
  }

  test("property: component labels equal a union-find on random graphs (seeded fuzz)") {
    import spark.implicits._
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(150)
      // mix of sparse random edges + a guaranteed deep path segment
      val edges = (Seq.tabulate(n / 3)(i =>
          (i.toLong, (i + 1).toLong)) ++           // path of diameter n/3
        Seq.fill(n)(
          (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => if (a < b) (a, b) else (b, a) }
        .distinct
      // driver-side union-find ground truth
      val parent = collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // canonical min-id per component
      val byRoot = nodes.groupBy(find)
      val expect = byRoot.values.flatMap { members =>
        val m = members.min; members.map(_ -> m) }.toMap
      val got = Dedup.minLabelComponents(
          edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"seed $seed: labels diverge from union-find")
    }
  }

  test("property: source_overlap_matrix cells re-aggregate the pair stream exactly (X79)") {
    import spark.implicits._
    val cells = Dedup.sourceOverlapMatrix(spark, dir)
      .select("source_lo", "source_hi", "n_pairs", "pair_chars")
      .as[(String, String, Long, Long)].collect()
    val meta = graft.util.Tables.t(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val pairs = Dedup.nearDupPairsCached(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "corpus must carry near-dup pairs")
    // driver-side re-aggregation over the same pair stream
    val expect = pairs.groupBy { case (a, b) =>
      val (sa, sb) = (meta(a)._1, meta(b)._1)
      if (sa <= sb) (sa, sb) else (sb, sa)
    }.map { case (k, ps) =>
      (k._1, k._2, ps.length.toLong,
        ps.map { case (a, b) => meta(a)._2 + meta(b)._2 }.sum)
    }.toSet
    assert(cells.toSet == expect)
    // normalization: every cell is lo ≤ hi; totals conserve the stream
    cells.foreach { case (lo, hi, _, _) => assert(lo <= hi) }
    assert(cells.map(_._3).sum == pairs.length.toLong)
    // the corpus's planted twins land in BOTH diagonal and
    // cross-source cells, or the matrix isn't exercising the contrast
    assert(cells.exists(c => c._1 == c._2), "diagonal cell expected")
    assert(cells.exists(c => c._1 != c._2), "cross-source cell expected")
  }

  test("property: clean_corpus ⊆ quality survivors ⊆ all docs") {
    import spark.implicits._
    val cleaned = TextAnalysis.cleanCorpus(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    val quality = TextAnalysis.textQuality(spark, dir)
      .filter(org.apache.spark.sql.functions.col("n_tokens") >= 20 &&
        org.apache.spark.sql.functions.col("uniq_ratio") >= 0.35)
      .select("doc_id").as[Long].collect().toSet
    val all = graft.util.Tables.t(spark, dir, "documents")
      .select("doc_id").as[Long].collect().toSet
    assert(cleaned.subsetOf(quality) && quality.subsetOf(all))
  }

  test("property: keep-latest dedup emits exactly one row per key, the max") {
    import spark.implicits._
    val out = Analytics.dedupKeepLatest(spark, dir)
      .select("o_custkey").as[Long].collect()
    assert(out.length == out.distinct.length) // one per customer
    // spot-check maximality for one customer against raw data
    val c = out.head
    val best = graft.util.Tables.t(spark, dir, "orders")
      .filter(org.apache.spark.sql.functions.col("o_custkey") === c)
      .select("o_orderkey", "o_orderdate")
      .as[(Long, java.sql.Timestamp)].collect()
      .maxBy(r => (r._2.getTime, r._1))
    val got = Analytics.dedupKeepLatest(spark, dir)
      .filter(org.apache.spark.sql.functions.col("o_custkey") === c)
      .select("o_orderkey").as[Long].head()
    assert(got == best._1)
  }

  test("property: bloomReduceJoin == plain join on random key sets") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      // random overlap profile per trial: fact keys from a wide space,
      // dim keys a random mix of hits and misses, with duplicates on
      // the fact side (a join multiplies them)
      val factKeys = Seq.fill(500)(rnd.nextInt(200).toLong)
      val dimKeys = rnd.shuffle((0L until 200L) ++ (1000L until 1200L))
        .take(rnd.nextInt(60) + 1).distinct
      val fact = factKeys.zipWithIndex.toDF("k", "payload")
      val dim = dimKeys.toDF("dk")
      val reduced = JoinReduction.bloomReduceJoin(
        fact, dim, "k", "dk", expectedItems = 64, fpp = 0.2)
        .select("k", "payload").as[(Long, Int)].collect().sorted.toSeq
      val plain = fact.join(dim, col("k") === col("dk"))
        .select("k", "payload").as[(Long, Int)].collect().sorted.toSeq
      assert(reduced == plain, s"trial $trial diverged")
    }
  }

  test("property: span scrub matches an independent reference on random corpora") {
    import spark.implicits._
    val w = 4
    // independent reimplementation of the scrub semantics — plain
    // driver-side Scala, no Spark, no shared code with the operator
    def reference(docs: Seq[(Long, String)])
        : Map[Long, (Long, Long, String)] = {
      def toks(s: String) =
        s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val wins = docs.flatMap { case (id, text) =>
        val t = toks(text)
        if (t.size >= w)
          (0 to t.size - w).map(i =>
            (id, i + 1, t.slice(i, i + w).mkString(" ")))
        else Nil
      }
      val repeated =
        wins.groupBy(_._3).filter(_._2.size > 1).keySet
      docs.map { case (id, text) =>
        val t = toks(text)
        val starts = wins.collect {
          case (d, s, win) if d == id && repeated(win) => s }
        val kept = t.zipWithIndex.collect {
          case (tok, i0)
            if !starts.exists(s => i0 + 1 >= s && i0 + 1 < s + w) => tok }
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(kept.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        id -> ((t.size.toLong, kept.size.toLong, hex))
      }.toMap
    }
    val rnd = new scala.util.Random(20260813)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    (1 to 3).foreach { trial =>
      // tiny vocabulary forces genuine cross-doc window collisions;
      // lengths 0..14 cover empty, short (< w) and long docs
      val docs = (1L to 40L).map { id =>
        id -> Seq.fill(rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      }
      val got = Dedup.repeatedSpanScrubFor(docs.toDF("doc_id", "text"), w)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val expect = reference(docs)
      assert(got == expect, s"trial $trial diverged")
    }
  }

  test("property: URL normalization is idempotent; resolution is absolute-stable (X83/X83b)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(20260815)
    val frag = Seq("", "#x", "#a b", "##")
    val query = Seq("", "?id=1", "?utm_source=s", "?utm_a=1&id=2",
      "?id=1&utm_b=2", "?utm_a=1&utm_b=2", "?", "&glued=1",
      "?utm_a=1&utm_b=2&c=3")
    val paths = Seq("", "/", "/p", "/a/b.html", "/a&b", "/a%20b",
      "a/rel.html", "//cdn.t/x", "mailto:a@b.c", "JAVASCRIPT:void(0)")
    val hosts = Seq("http://h.test", "https://H.Test", "http://h.test:8080",
      "")
    val quotes = Seq[String => String](u => u, u => s"'$u'",
      u => "\"" + u + "\"")
    val urls = (1 to 300).map { i =>
      val h = hosts(rnd.nextInt(hosts.size))
      val p = paths(rnd.nextInt(paths.size))
      val q = query(rnd.nextInt(query.size))
      val f = frag(rnd.nextInt(frag.size))
      (i.toLong, quotes(rnd.nextInt(quotes.size))(s"$h$p$q$f"))
    }
    val df = urls.toDF("id", "u")
    val once = df.select(col("id"),
      HtmlExtract.normalizeUrl(col("u")).as("n1"))
    val twice = once.select(col("id"),
      col("n1"), HtmlExtract.normalizeUrl(col("n1")).as("n2"))
      .as[(Long, String, String)].collect()
    twice.foreach { case (id, n1, n2) =>
      assert(n1 == n2,
        s"normalize not idempotent for ${urls(id.toInt - 1)._2}: " +
          s"'$n1' -> '$n2'")
    }
    // resolution of an already-absolute normalized URL ignores the
    // page entirely; and resolving a resolved URL is stable
    val page = "http://base.test/a/b.html"
    val res = df.select(col("id"),
        HtmlExtract.normalizeUrl(col("u")).as("n"))
      .select(col("id"), col("n"),
        HtmlExtract.resolveUrl(col("n"),
          HtmlExtract.normalizeUrl(
            org.apache.spark.sql.functions.lit(page))).as("r"))
      .as[(Long, String, String)].collect()
    res.foreach { case (id, n, r) =>
      if (n.startsWith("http://") || n.startsWith("https://"))
        assert(r == n, s"absolute URL must resolve to itself: $n -> $r")
      if (r != null) {
        assert(!r.contains("#"), s"fragment survived: $r")
        assert(!r.contains("'") && !r.contains("\""),
          s"attribute quote survived: $r")
      }
    }
  }
}
