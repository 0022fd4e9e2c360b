package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class ReshapeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("takeStratified returns exactly min(k, stratum size) rows per stratum, deterministically") {
    import spark.implicits._
    val k = 7
    val got = Reshape.takeStratified(spark, dir, k)
      .select("lang", "doc_id").as[(String, Long)].collect()
    val strata = graft.util.Tables.t(spark, dir, "documents")
      .groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val byLang = got.groupBy(_._1)
    assert(byLang.keySet == strata.keySet)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == math.min(k.toLong, strata(lang)),
        s"$lang: ${rows.length} rows for stratum of ${strata(lang)}")
    }
    // content-derived rank ⇒ identical selection on re-run
    val again = Reshape.takeStratified(spark, dir, k)
      .select("lang", "doc_id").as[(String, Long)].collect()
    assert(got.sortBy(identity).sameElements(again.sortBy(identity)))
  }

  /** The plain one-window form the pre-pass decomposition must equal
    * bit-for-bit (it is also what the registered oracle replays). */
  private def plainWindow(docs: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    val rank = graft.util.Tables.md5Long32(
      concat(lit("take:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("lang")).orderBy(rank, col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("lang"), col("rn").cast("int").as("rn"),
        col("doc_id"), col("n_chars"))
  }

  test("takeStratified pre-pass is bit-identical to the plain window (real corpus)") {
    import spark.implicits._
    val docs = graft.util.Tables.t(spark, dir, "documents")
    Seq(1, 7, 25).foreach { k =>
      val got = Reshape.takeStratifiedFrom(docs, k)
        .as[(String, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
      val want = plainWindow(docs, k)
        .as[(String, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
      assert(got.toSeq == want.toSeq, s"k=$k diverged from plain window")
    }
  }

  test("takeStratified underflow stratum falls back to the full window, exact-k preserved") {
    import spark.implicits._
    // Plant an ADVERSARIAL stratum: 60 docs whose md5 ranks all sit in
    // the TOP half of the 32-bit range. At headroom=1, k=10 the cutoff
    // is 2^32·10/60 (bottom sixth), so ZERO rows survive the pre-pass
    // and the safety check must route the whole stratum through the
    // fallback window. A normal stratum rides along to prove the two
    // paths union cleanly.
    val rk = graft.util.Tables.md5Long32(
      concat(lit("take:"), col("doc_id").cast("string")))
    val highIds = spark.range(0, 100000).toDF("doc_id")
      .withColumn("rk", rk)
      .filter(col("rk") >= lit(1L << 31))
      .limit(60).select("doc_id").as[Long].collect()
    assert(highIds.length == 60)
    val docs = (highIds.map(id => (id, "adv", id % 997)) ++
        (1000000L to 1000199L).map(id => (id, "ok", id % 997)))
      .toSeq.toDF("doc_id", "lang", "n_chars")
    val got = Reshape.takeStratifiedFrom(docs, k = 10, headroom = 1)
      .as[(String, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val want = plainWindow(docs, 10)
      .as[(String, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == want.toSeq)
    assert(got.count(_._1 == "adv") == 10, "exact-k through the fallback")
    assert(got.count(_._1 == "ok") == 10)
    // and the planted stratum genuinely underflowed the cutoff
    val cutoff = (1L * 10 * (1L << 32)) / 60
    val survivors = docs.filter(col("lang") === "adv")
      .withColumn("rk", rk).filter(col("rk") < cutoff).count()
    assert(survivors == 0L, s"fixture drifted: $survivors survivors")
  }

  test("takeStratified routes a NULL-lang stratum through the fallback, matching the plain window") {
    import spark.implicits._
    // dirty-data shape: NULL langs can't key the cutoff map, so the
    // whole stratum must ride the fallback window rather than
    // silently vanish (review r13 — the one-window form it replaced
    // treated NULL as an ordinary partition)
    val docs = ((1L to 40L).map(id => (id, null.asInstanceOf[String],
        id % 97)) ++
      (100L to 159L).map(id => (id, "en", id % 97)))
      .toDF("doc_id", "lang", "n_chars")
    val got = Reshape.takeStratifiedFrom(docs, k = 10)
      .collect().map(_.toString).sorted.toSeq
    val want = plainWindow(docs, 10)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
    assert(got.count(_.contains("null")) == 10,
      "the NULL stratum must contribute exactly k rows")
  }

  test("coverageSelect keeps the MINIMAL source prefix reaching the share") {
    import spark.implicits._
    val share = 0.9
    val kept = Reshape.coverageSelect(spark, dir, share)
      .select("source", "tokens").as[(String, Long)].collect()
    assert(kept.nonEmpty)
    val all = graft.util.Tables.t(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.size(
          TextAnalysis.tokens(org.apache.spark.sql.functions.col("text")))
          .cast("long").as("t"))
      .groupBy("source").sum("t").as[(String, Long)].collect().toMap
    val total = all.values.sum
    val keptMass = kept.map(_._2).sum
    // coverage: the kept prefix reaches the share
    assert(keptMass.toDouble >= share * total,
      s"kept $keptMass of $total < $share")
    // minimality: dropping the last (smallest) kept source falls short
    val withoutLast = keptMass - kept.map(_._2).min
    assert(withoutLast.toDouble < share * total,
      s"prefix not minimal: $withoutLast still covers $share of $total")
    // and the kept set is exactly the top-|kept| sources by mass
    val topK = all.toSeq.sortBy { case (s, t) => (-t, s) }
      .take(kept.length).map(_._1).toSet
    assert(kept.map(_._1).toSet == topK)
  }

  test("pivot cell counts reconcile with the plain groupBy") {
    import spark.implicits._
    val pivoted = Reshape.pivotOrders(spark, dir)
      .select("o_orderpriority", "n_f", "n_o", "n_p")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val plain = graft.util.Tables.t(spark, dir, "orders")
      .groupBy("o_orderpriority", "o_orderstatus").count()
      .as[(String, String, Long)].collect()
      .map { case (p, s, n) => (p, s) -> n }.toMap
    for ((p, (f, o, pp)) <- pivoted) {
      assert(f == plain.getOrElse((p, "F"), 0L), s"F @ $p")
      assert(o == plain.getOrElse((p, "O"), 0L), s"O @ $p")
      assert(pp == plain.getOrElse((p, "P"), 0L), s"P @ $p")
    }
  }

  test("unpivot is the inverse shape of the wide aggregate") {
    import spark.implicits._
    val long = Reshape.unpivotMetrics(spark, dir)
    // 3 metrics per flag, one value each, metric names preserved
    val byFlag = long.as[(String, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    byFlag.values.foreach(ms =>
      assert(ms == Seq("disc", "price", "qty")))
  }

  test("percentiles are order statistics: p50 <= p90 <= p99 within bounds") {
    import spark.implicits._
    Reshape.percentiles(spark, dir)
      .as[(String, Double, Double, Double, Double, Double, Long)]
      .collect().foreach { case (f, p50, p90, p99, mn, mx, n) =>
        assert(n > 0)
        assert(mn <= p50 && p50 <= p90 && p90 <= p99 && p99 <= mx, f)
      }
  }

  test("percentilesApprox tracks the exact twin at sf0.1") {
    import spark.implicits._
    val big = "/root/testdata/sf0.1"
    def byFlag(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Double, Double, Double, Double, Double, Long)]
        .collect().map(r => r._1 -> r).toMap
    val exact = byFlag(Reshape.percentiles(spark, big))
    val approx = byFlag(Reshape.percentilesApprox(spark, big))
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (f, (_, e50, e90, e99, emn, emx, en)) =>
      val (_, a50, a90, a99, amn, amx, an) = approx(f)
      // min/max/count are computed exactly in both plans
      assert(amn == emn && amx == emx && an == en, f)
      // l_quantity is integer-valued in [1,50]: the sketch returns a
      // data value within its rank error, the exact twin interpolates —
      // they agree to within one quantity unit at accuracy=10000.
      Seq((a50, e50), (a90, e90), (a99, e99)).foreach { case (a, e) =>
        assert(math.abs(a - e) <= 1.0, s"$f: approx $a vs exact $e")
      }
    }
  }

  test("stratified sample is deterministic and near the configured rates") {
    import spark.implicits._
    val s1 = Reshape.sampleStratified(spark, dir)
      .as[(Long, String, Double, Int)].collect().toSeq
    val s2 = Reshape.sampleStratified(spark, dir)
      .as[(Long, String, Double, Int)].collect().toSeq
    assert(s1 == s2) // same rows, same order, every run
    val total = graft.util.Tables.t(spark, dir, "customer")
      .groupBy("c_mktsegment").count()
      .as[(String, Long)].collect().toMap
    val picked = s1.groupBy(_._2).view.mapValues(_.size).toMap
    for ((seg, n) <- picked) {
      val rate = if (seg == "BUILDING") 0.20 else 0.05
      val expected = total(seg) * rate
      // md5 buckets are uniform; allow generous slack at tiny sf
      assert(math.abs(n - expected) <= math.max(5.0, expected),
        s"$seg: picked $n of ${total(seg)} (expected ~$expected)")
    }
  }

  test("bucketed range join equals the naive range-predicate join") {
    import spark.implicits._
    val bucketed = Reshape.rangeJoinBucketed(spark, dir)
      .select("event_id", "n_orders").as[(Long, Long)].collect().toMap
    val e = graft.util.Tables.t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = graft.util.Tables.t(spark, dir, "orders")
    val naive = e.join(o,
        e("user_id") === o("o_custkey") &&
          o("o_orderdate") >= e("ts") - expr("INTERVAL 7 DAYS") &&
          o("o_orderdate") <= e("ts"), "left")
      .groupBy(col("event_id"))
      .agg(count(col("o_orderkey")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(bucketed == naive)
  }

  test("docChunk covers every token, overlaps exactly, and reconstructs the doc") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lower, split}
    val chunkSize = 64; val overlap = 8; val stride = chunkSize - overlap
    val chunks = Reshape.docChunk(spark, dir, chunkSize, overlap)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val docs = graft.util.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("t"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, t) => id -> t.filter(_.nonEmpty) }.toMap
    assert(chunks.keySet == docs.keySet)
    docs.foreach { case (id, toks) =>
      val cs = chunks(id)
      // chunk ids are 0..n-1 with the spec'd count
      val expectN = math.max(1L,
        math.ceil((toks.length - overlap).toDouble / stride).toLong)
      assert(cs.map(_._2).toSeq == (0L until expectN), s"doc $id ids")
      cs.foreach { case (_, cid, nTok, text) =>
        val expect = toks.slice((cid * stride).toInt,
          (cid * stride).toInt + chunkSize)
        assert(nTok == expect.length, s"doc $id chunk $cid size")
        assert(text == expect.mkString(" "), s"doc $id chunk $cid text")
      }
      // stitching chunks back (dropping each successor's overlap)
      // reconstructs the document exactly — no token lost or duplicated
      val stitched = cs.zipWithIndex.flatMap { case ((_, _, _, text), i) =>
        val ts = if (text.isEmpty) Seq.empty else text.split(" ").toSeq
        if (i == 0) ts else ts.drop(overlap)
      }
      assert(stitched.toSeq == toks.toSeq, s"doc $id reconstruction")
      // every non-final chunk is full; the final one exceeds the overlap
      cs.init.foreach { case (_, cid, nTok, _) =>
        assert(nTok == chunkSize, s"doc $id chunk $cid not full") }
      if (toks.length > overlap)
        assert(cs.last._3 > overlap, s"doc $id pure-overlap tail")
    }
  }

  test("dedup groups match a driver-side union-find over the same pairs") {
    import spark.implicits._
    val pairs = Dedup.nearDupPairs(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    // brute-force union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = parent.keys.map(x => x -> find(x)).toMap
    val got = Dedup.dedupGroups(spark, dir)
      .select("doc_id", "group_id").as[(Long, Long)].collect().toMap
    assert(got == expect)
    // group sizes are consistent
    val sizes = Dedup.dedupGroups(spark, dir)
      .select("group_id", "grp_size").as[(Long, Long)].collect().toSet
    val expectSizes = expect.groupBy(_._2).map { case (g, m) =>
      (g, m.size.toLong) }.toSet
    assert(sizes == expectSizes)
  }

  test("scrub output has no consecutive duplicate tokens and is idempotent") {
    import spark.implicits._
    val rows = TextAnalysis.scrubNormalize(spark, dir)
      .select("doc_id", "n_raw", "n_kept", "n_collapsed", "head5")
      .as[(Long, Int, Int, Int, String)].collect()
    rows.foreach { case (id, raw, kept, coll, head5) =>
      assert(kept <= raw && coll <= kept, s"doc $id monotone stages")
      val toks = head5.split(" ").filter(_.nonEmpty)
      toks.sliding(2).foreach {
        case Array(x, y) => assert(x != y, s"doc $id repeat in head5")
        case _ =>
      }
    }
  }

  test("token_budget_mix == the naive per-source greedy prefix (X75)") {
    import spark.implicits._
    val got = Reshape.tokenBudgetMix(spark, dir)
      .select("doc_id", "source", "n_tok", "cum_before")
      .as[(Long, String, Long, Long)].collect().toSet
    // independent naive implementation: full per-source sort + cumsum
    def coin(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"tbm:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16) % 1000000
    }
    val budgets = Reshape.TokenBudgets.toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
      .map { case (id, src, text) =>
        (id, src,
          text.toLowerCase.split("\\s+").count(_.nonEmpty).toLong) }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val ordered = ds.sortBy(d => (coin(d._1), d._1))
      val cums = ordered.scanLeft(0L)(_ + _._3)
      ordered.zip(cums).toSeq.collect {
        case ((id, s, n), before) if before < budgets(src) =>
          (id, s, n, before)
      }
    }.toSet
    assert(got == expected)
    // non-vacuity: at least one source must have been truncated by
    // its budget, and every truncated source must have FILLED it
    // (crossing doc included)
    val keptBySrc = got.groupBy(_._2)
    val totalBySrc = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    val truncated = totalBySrc.filter { case (s, tot) =>
      tot > budgets(s) }.keys.toSeq
    assert(truncated.nonEmpty, "some source must exceed its budget")
    truncated.foreach { src =>
      val keptTok = keptBySrc(src).toSeq.map(_._3).sum
      assert(keptTok >= budgets(src),
        s"$src: budget ${budgets(src)} not filled ($keptTok kept)")
    }
  }

  test("weighted_sample keeps exactly the docs whose coin clears the margin-derived rate (X74)") {
    import spark.implicits._
    val kept = Reshape.weightedSample(spark, dir)
      .select("doc_id", "margin", "keep_p", "coin")
      .as[(Long, Double, Double, Double)].collect()
    assert(kept.nonEmpty, "some doc must survive")
    def coin(id: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wsmp:$id".getBytes("UTF-8"))
      (java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16) % 1000000) / 1000000.0
    }
    kept.foreach { case (id, m, p, c) =>
      assert(p == math.min(1.0, math.max(0.0, 0.5 + m)))
      assert(c == coin(id) && c < p, s"doc $id kept with coin $c >= $p")
    }
    // and the complement is genuinely rejected: every scored doc
    // absent from the sample must FAIL the coin test
    val keptIds = kept.map(_._1).toSet
    val rejected = QualitySignals.qualityScore(spark, dir)
      .select("doc_id", "margin").as[(Long, Double)].collect()
      .filterNot(r => keptIds(r._1))
    assert(rejected.nonEmpty, "some doc must be sampled out")
    rejected.foreach { case (id, m) =>
      val p = math.min(1.0, math.max(0.0, 0.5 + m))
      assert(coin(id) >= p, s"doc $id rejected but coin ${coin(id)} < $p")
    }
  }

  test("leakage_safe_split: no near-dup pair straddles the train/eval boundary (X72)") {
    import spark.implicits._
    val assign = Reshape.leakageSafeSplit(spark, dir)
      .select("doc_id", "group_id", "split")
      .as[(Long, Long, String)].collect()
    val splitOf = assign.map(r => r._1 -> r._3).toMap
    val groupOf = assign.map(r => r._1 -> r._2).toMap
    val pairs = Dedup.nearDupPairsCached(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "corpus must carry near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b),
        s"pair ($a, $b) straddles: ${splitOf(a)} vs ${splitOf(b)}")
      assert(groupOf(a) == groupOf(b),
        s"pair ($a, $b) got different group labels")
    }
    // the doc-keyed split must actually DIFFER for some grouped doc,
    // or the group-keyed coin changed nothing and the test is vacuous
    // (a group member whose own-id coin lands elsewhere exists on this
    // corpus; if regeneration ever removes the case, this flags it)
    val grouped = assign.filter(r => r._2 != r._1)
    assert(grouped.nonEmpty, "some doc must carry a non-self group label")
    // every member inherits the GROUP's coin, not its own
    def coin(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"lsplit:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) % 100
    }
    assign.foreach { case (_, g, s) =>
      val expect =
        if (coin(g) < 80) "train" else if (coin(g) < 90) "val" else "test"
      assert(s == expect)
    }
  }

  test("temperature_mix == the alpha=1/2 integer rate derivation; rates flatten the mixture (X78)") {
    import spark.implicits._
    val got = Reshape.temperatureMix(spark, dir)
      .select("doc_id", "source", "n_tok", "rate_ppm")
      .as[(Long, String, Long, Long)].collect()
    def coin(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"tmix:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16) % 1000000
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
      .map { case (id, src, text) =>
        (id, src,
          text.toLowerCase.split("\\s+").count(_.nonEmpty).toLong) }
    val bySrc = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val tot = bySrc.values.sum
    val sI = bySrc.map { case (s, t) =>
      s -> math.floor(math.sqrt(t.toDouble)).toLong }
    val a = (tot * 2 / 5) * 1000000L / sI.values.sum
    val rates = bySrc.map { case (s, t) =>
      s -> (if (t == 0) 0L else math.min(1000000L, a * sI(s) / t)) }
    val expected = docs.collect {
      case (id, src, n) if coin(id) < rates(src) =>
        (id, src, n, rates(src)) }.toSet
    assert(got.toSet == expected)
    // temperature property (alpha < 1 flattens): the LIGHTEST source
    // samples at a strictly higher rate than the HEAVIEST (pairwise
    // monotonicity is NOT promised — floor(sqrt(t))/t inverts near
    // square boundaries for near-equal masses, measured 1 inversion
    // on this corpus — but the head/tail contrast is the semantics)
    val byMass = bySrc.toSeq.sortBy(_._2)
    assert(rates(byMass.head._1) > rates(byMass.last._1),
      "lightest source must sample at a higher rate than the heaviest")
    assert(rates.values.toSet.size > 1, "rates must differ across sources")
  }

  test("temperature_mix clamps tail sources to full retention on a skewed corpus (X78)") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-tmix").toString
    // head: 200 docs x 64 tokens; tail: 4 docs x 8 tokens — skewed
    // enough that the tail's smoothed share clamps at keep-everything
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(64)(s"w$i").mkString(" "), "en", "head", 64L)
    } ++ (200 until 204).map { i =>
      (i.toLong, Seq.fill(8)(s"t$i").mkString(" "), "en", "tail", 8L)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    val got = Reshape.temperatureMix(spark, tmp)
      .select("source", "rate_ppm").distinct()
      .as[(String, Long)].collect().toMap
    assert(got("tail") == 1000000L,
      s"tail source must clamp to full retention, got ${got("tail")}")
    assert(got.get("head").forall(_ < 1000000L),
      s"head source must be down-sampled, got ${got.get("head")}")
    // flattening: the tail's share of EXPECTED kept tokens exceeds its
    // input share (8·4 / (8·4+64·200) ≈ 0.25%; kept: full tail vs
    // down-sampled head)
    val headRate = got("head").toDouble / 1000000.0
    val inShare = 32.0 / (32 + 12800)
    val outShare = 32.0 / (32 + 12800 * headRate)
    assert(outShare > inShare)
  }
}
