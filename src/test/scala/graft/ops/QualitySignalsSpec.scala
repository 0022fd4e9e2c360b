package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class QualitySignalsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def corpus(rows: (Long, String)*): String = {
    import spark.implicits._
    val dir = s"${sys.props("java.io.tmpdir")}/graft-qs-${System.nanoTime()}"
    rows.map { case (id, tx) => (id, tx, "en", "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("repetition: looped text scores high, varied text scores low") {
    import spark.implicits._
    val dir = corpus(
      1L -> "spam spam spam spam spam spam", // one bigram repeated 5x
      2L -> "one two three four five six")   // all bigrams distinct
    val out = QualitySignals.ngramRepetition(spark, dir)
      .select("doc_id", "top_bigram_frac", "dup_trigram_frac")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out(1L) == ((1.0, 0.75))) // 5/5 bigrams; 4 trigrams, 1 distinct
    assert(out(2L) == ((0.2, 0.0)))  // 1/5 bigrams; 4 trigrams all distinct
  }

  test("decontaminate flags exactly the train docs overlapping eval") {
    import spark.implicits._
    // doc 0 and 97 are eval (id % 97 == 0); doc 1 copies doc 0's text,
    // doc 2 is disjoint. 5-gram shingles.
    val dir = corpus(
      0L -> "a b c d e f",
      97L -> "p q r s t u",
      1L -> "a b c d e f",
      2L -> "v w x y z zz")
    val out = QualitySignals.decontaminate(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 2L, 1.0))) // both 5-grams of doc 1 hit
  }

  test("zipf spectrum buckets are exact powers of two on df") {
    import spark.implicits._
    val rows = QualitySignals.zipfSpectrum(spark, "/root/testdata/sf0.001")
      .as[(Int, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (bucket, nTerms, minDf, maxDf, _) =>
      assert(nTerms > 0)
      assert(minDf >= (1L << bucket) && maxDf < (1L << (bucket + 1)),
        s"bucket $bucket holds df range [$minDf,$maxDf]")
    }
  }

  test("wordRarity equals a driver-side unigram-model recomputation (X64)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val docs = graft.util.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def toks(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val all = docs.flatMap(d => toks(d._2))
    val freq = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = all.length.toLong
    val got = QualitySignals.wordRarity(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val expectCounts = docs.toSeq.flatMap { case (id, tx) =>
      val ws = toks(tx)
      if (ws.isEmpty) None
      else Some((id, ws.length.toLong,
        ws.count(w => freq(w) == 1L).toLong))
    }.sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3)) == expectCounts)
    // mean inverse probability: reference with plain double sums —
    // the engine's decimal accumulation agrees to well under 1e-9
    // relative (bit-exactness vs DuckDB is the gate's job)
    got.foreach { case (id, n, _, meanInvP) =>
      val ws = toks(docs.find(_._1 == id).get._2)
      val ref = ws.map(w => total.toDouble / freq(w)).sum / n
      assert(math.abs(meanInvP - ref) <= 1e-9 * math.max(1.0, ref),
        s"doc $id: $meanInvP vs $ref")
      assert(meanInvP >= 1.0, s"doc $id: mean inverse p below 1")
    }
    // rare-word-heavy docs score higher than common-word docs:
    // the hapax-richest doc must outrank the hapax-free docs' median
    val byHapaxFrac = got.map(r => (r._3.toDouble / r._2, r._4))
    val rich = byHapaxFrac.maxBy(_._1)
    val none = byHapaxFrac.filter(_._1 == 0.0).map(_._2)
    if (none.nonEmpty && rich._1 > 0)
      assert(rich._2 > none.sorted.apply(none.size / 2))
  }

  test("quality_gate_probe verdicts replay from corpus-side stats only (X81)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batchMod = 7
    graft.util.CkptMemo.clear()
    val got = QualitySignals.qualityGateProbe(spark, dir, batchMod)
      .select("doc_id", "lang", "n_chars", "keep_length",
        "keep_quality", "keep_sample", "admit")
      .as[(Long, String, Long, Boolean, Boolean, Boolean, Boolean)]
      .collect()
    val all = graft.util.Tables.t(spark, dir, "documents")
      .select("doc_id", "source", "lang", "n_chars", "text")
      .as[(Long, String, String, Long, String)].collect()
    val corpus = all.filter(_._1 % batchMod != 0)
    val batchIds = all.filter(_._1 % batchMod == 0).map(_._1).toSet
    assert(got.map(_._1).toSet == batchIds)
    // independent corpus-side bounds (Spark's exact interpolation)
    def pct(v: IndexedSeq[Long], p: Double): Double = {
      val r = p * (v.length - 1); val i = r.toInt
      if (i + 1 >= v.length) v(i).toDouble
      else v(i) * (1.0 - (r - i)) + v(i + 1) * (r - i)
    }
    val corpusByLang = corpus.groupBy(_._3).view
      .mapValues(_.map(_._4).sorted.toIndexedSeq).toMap
    got.foreach { case (_, lang, n, kl, _, _, _) =>
      val v = corpusByLang(lang)
      assert(kl == (n >= pct(v, 0.02) && n <= pct(v, 0.98)))
    }
    // TRAIN/SERVE SEPARATION (non-vacuous): corpus-side bounds must
    // differ from full-corpus bounds for some lang — a gate built on
    // the full table (batch leaking into its own statistics) would
    // flip this
    val fullByLang = all.groupBy(_._3).view
      .mapValues(_.map(_._4).sorted.toIndexedSeq).toMap
    assert(corpusByLang.exists { case (l, v) =>
      pct(v, 0.02) != pct(fullByLang(l), 0.02) ||
        pct(v, 0.98) != pct(fullByLang(l), 0.98) },
      "corpus-side and full-corpus bounds coincide — separation unproven")
    // margin cutoff: naive rank over CORPUS-side scored docs
    val margins = QualitySignals.qualityScore(spark, dir)
      .select("doc_id", "margin").as[(Long, Double)].collect().toMap
    val srcOf = all.map(r => r._1 -> r._2).toMap
    val cutoff = corpus.flatMap(r => margins.get(r._1).map(m => (r._1, r._2, m)))
      .groupBy(_._2).view.mapValues { ds =>
        val quota = (ds.size * 60 + 99) / 100
        ds.sortBy { case (i, _, m) => (-m, i) }.take(quota).map(_._3).min
      }.toMap
    got.foreach { case (id, _, _, _, kq, _, _) =>
      val expect = margins.get(id).exists(_ >= cutoff(srcOf(id)))
      assert(kq == expect, s"doc $id keep_quality $kq vs $expect")
    }
    // admit is the conjunction; all three legs discriminate
    got.foreach { case (_, _, _, kl, kq, ks, ad) =>
      assert(ad == (kl && kq && ks)) }
    assert(got.exists(_._7) && got.exists(!_._7),
      "gate must admit some and reject some")
    assert(got.exists(r => !r._4) || got.exists(r => !r._5),
      "some leg must reject independently")
    graft.util.CkptMemo.clear()
  }

  test("quality_calibrated == the naive per-source margin rank (X80)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = QualitySignals.qualityCalibrated(spark, dir)
      .select("doc_id", "source", "margin", "src_rank")
      .as[(Long, String, Double, Long)].collect()
    // independent naive form: one full sort per source, ceil quota
    val scored = QualitySignals.qualityScore(spark, dir)
      .select("doc_id", "margin").as[(Long, Double)].collect().toMap
    val srcOf = graft.util.Tables.t(spark, dir, "documents")
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    val expected = scored.toSeq
      .map { case (id, m) => (id, srcOf(id), m) }
      .groupBy(_._2).toSeq.flatMap { case (_, ds) =>
        val quota = (ds.size * 60 + 99) / 100
        ds.sortBy { case (id, _, m) => (-m, id) }
          .zipWithIndex.take(quota)
          .map { case ((id, s, m), i) => (id, s, m, (i + 1).toLong) }
      }.toSet
    assert(got.toSet == expected)
    // calibration property: EVERY source keeps its quota (a global
    // cliff would skew keeps toward whichever source's margins run
    // high — per-source ranking cannot)
    val keptBySrc = got.groupBy(_._2).view.mapValues(_.length).toMap
    val scoredBySrc = scored.keys.groupBy(srcOf).view
      .mapValues(_.size).toMap
    scoredBySrc.foreach { case (src, n) =>
      assert(keptBySrc.getOrElse(src, 0) == (n * 60 + 99) / 100,
        s"$src kept ${keptBySrc.getOrElse(src, 0)} of $n")
    }
    // non-vacuity: someone below the global keep line is kept, and
    // someone above it is dropped (the per-stratum point)
    val allMargins = scored.values.toSeq.sorted(Ordering[Double].reverse)
    val globalCut = allMargins((allMargins.size * 60 + 99) / 100 - 1)
    val keptIds = got.map(_._1).toSet
    assert(scored.exists { case (id, m) =>
      m < globalCut && keptIds.contains(id) })
    assert(scored.exists { case (id, m) =>
      m > globalCut && !keptIds.contains(id) })
  }

  test("ngram LM score: hand-computed add-one probabilities (X91)") {
    // train slice (doc_id % 5 == 0): docs 0 and 5
    //   doc0 "a b a c" → bigrams (a b)(b a)(a c); doc5 "a b c" →
    //   (a b)(b c) ⇒ c2: ab=2 ba=1 ac=1 bc=1; c1: a=3 b=2; V=3
    val dir = corpus(
      0L -> "a b a c",
      5L -> "a b c",
      1L -> "a b z",  // (a b): (2+1)/(3+3)=0.5; (b z): (0+1)/(2+3)=0.2
      2L -> "z z",    // (z z): unseen context → (0+1)/(0+3)=1/3
      3L -> "a")      // single token: no bigram, excluded
    val got = QualitySignals.ngramLmScore(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got.keySet == Set(0L, 5L, 1L, 2L), "doc 3 has no bigram")
    val (n1, u1, p1) = got(1L)
    assert(n1 == 2 && u1 == 1 && math.abs(p1 - 0.35) < 1e-6)
    val (n2, u2, p2) = got(2L)
    assert(n2 == 1 && u2 == 1 && math.abs(p2 - 1.0 / 3.0) < 1e-6)
    // train docs: every bigram is in the model by construction
    assert(got(0L)._2 == 0 && got(5L)._2 == 0)
    // doc0: (0.5 + 0.4 + 1/3) / 3 with the model above
    assert(math.abs(got(0L)._3 - (0.5 + 0.4 + 1.0 / 3.0) / 3.0) < 1e-6)
    // higher-quality (in-model) text outscores unseen-heavy text
    assert(got(0L)._3 > got(1L)._3)
  }

  test("gopher_rules: each planted violation names exactly its rule (X102)") {
    import spark.implicits._
    // a clean 60-word doc: varied words, two stopword types, all
    // bigrams distinct
    val clean = ((1 to 56).map(i => s"word$i") ++
      Seq("the", "and", "that", "have")).mkString(" ")
    val docs = Seq(
      (1L, clean),
      (2L, "too short the and"),                         // word_count
      (3L, ((1 to 60).map(i => s"verylongtokenxx$i") ++
        Seq("the", "and")).mkString(" ")),               // mean_word_len
      (4L, ((1 to 50).map(i => s"word$i") ++
        (1 to 8).map(i => s"#tag$i") ++
        Seq("the", "and")).mkString(" ")),               // hash_ratio
      (5L, ((1 to 50).map(i => s"word$i") ++
        (1 to 8).map(i => s"etc$i...") ++
        Seq("the", "and")).mkString(" ")),               // ellipsis_ratio
      (6L, ((1 to 40).map(i => s"word$i") ++
        (1 to 18).map(i => s"$i$i$i") ++
        Seq("the", "and")).mkString(" ")),               // alpha_words
      (7L, (1 to 60).map(i => s"word$i").mkString(" ")), // stopwords
      (8L, (Seq.fill(28)("the and") :+ "that x have y")
        .mkString(" ")),                                 // top_bigram
      (9L, (Seq.fill(15)("the quick fox and all that") :+ "have")
        .mkString(" ")),                                 // dup_trigram
      (10L, "")                                          // empty
    ).toDF("doc_id", "text")
    val got = QualitySignals.gopherRulesFrom(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((60L, "", true)), got(1L))
    def failedSet(id: Long) = got(id)._2.split('+').toSet
    // 4 words: word_count fails; its 3 distinct bigrams also trip the
    // top-bigram mass rule (1/3 > 0.2) — tiny docs fail both
    assert(failedSet(2L).contains("word_count") && !got(2L)._3)
    assert(failedSet(3L).contains("mean_word_len"))
    assert(got(4L)._2 == "hash_ratio")
    assert(got(5L)._2 == "ellipsis_ratio")
    assert(got(6L)._2 == "alpha_words")
    assert(got(7L)._2 == "stopwords")
    assert(failedSet(8L).contains("top_bigram"))
    assert(failedSet(9L).contains("dup_trigram"))
    // empty text: the ratio rules are NULL-safe and repetition rules
    // pass vacuously; the two exact-integer rules (word_count,
    // stopwords) legitimately fail
    assert(got(10L) == ((0L, "stopwords+word_count", false)), got(10L))
  }
}
