package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class CorpusStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("KMV estimate lands within 15% of the exact distinct count") {
    import spark.implicits._
    val rows = CorpusStats.kmvDistinct(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, exact, est) =>
      // small groups fall back to exact; sketched groups must be close
      if (exact >= 64)
        assert(math.abs(est - exact) / exact < 0.15,
          s"$lang: exact=$exact est=$est")
      else assert(est == exact.toDouble)
    }
  }

  test("TF-IDF ranks a rare term above a common one at equal tf") {
    import spark.implicits._
    val docs = Seq(
      (0L, "zebra common common", "en", "s", 19),
      (50L, "zebra common apple", "en", "s", 18),
      (100L, "common filler words", "en", "s", 19),
      (150L, "more common filler", "en", "s", 18))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = s"${sys.props("java.io.tmpdir")}/graft-tfidf-${System.nanoTime()}"
    docs.write.parquet(s"$dir/documents.parquet")
    val out = CorpusStats.tfidfTopTerms(spark, dir, topK = 3, docMod = 50)
      .select("doc_id", "rank", "term").as[(Long, Int, String)].collect()
    // doc 0: tf(common)=2 df=4 → score 2; tf(zebra)=1 df=2 → score 2;
    // tie broken by term: "common" < "zebra"
    assert(out.filter(_._1 == 0L).sortBy(_._2).map(_._3).toSeq ==
      Seq("common", "zebra"))
    // doc 50: zebra (df 2) and apple (df 1) outrank common (df 4)
    assert(out.filter(_._1 == 50L).sortBy(_._2).map(_._3).toSeq ==
      Seq("apple", "zebra", "common"))
  }

  test("inverted-index fingerprint is the xor-fold of posting hashes") {
    import spark.implicits._
    val out = CorpusStats.invertedIndex(spark, sf, minDf = 20)
    val row = out.filter(col("term") === "the").head()
    val docs = spark.read
      .parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("t"))
      .filter(col("t") === "the").select("doc_id").distinct()
      .as[Long].collect().sorted
    assert(row.getAs[Long]("df") == docs.length)
    assert(row.getAs[Long]("min_doc") == docs.min)
    assert(row.getAs[Long]("max_doc") == docs.max)
    val fp = docs.map { d =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(d.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }.reduce(_ ^ _)
    assert(row.getAs[Long]("posting_fp") == fp)
  }

  test("bigram novelty: all-unique doc scores 1.0, cloned docs near 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta", "en", "s", 22),
      (2L, "shared text here now", "en", "s", 20),
      (3L, "shared text here now", "en", "s", 20),
      (4L, "one", "en", "s", 3)) // <2 tokens → no output row
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = s"${sys.props("java.io.tmpdir")}/graft-novel-${System.nanoTime()}"
    docs.write.parquet(s"$dir/documents.parquet")
    val byId = CorpusStats.bigramNovelty(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    assert(byId(1L) == ((1.0, 1.0)))
    assert(byId(2L) == ((0.0, 2.0))) // every bigram shared with doc 3
    assert(byId(3L) == ((0.0, 2.0)))
    assert(!byId.contains(4L))
  }

  test("bm25 ranks rare-term docs first and matches a hand-computed score") {
    import spark.implicits._
    // rare term 'zebra' (df=1) must outrank the common 'shared' (df=3)
    // despite lower tf; doc 4 matches nothing and must not appear
    val docs = Seq(
      (1L, "zebra shared alpha beta", "en", "s", 1),
      (2L, "shared shared shared gamma", "en", "s", 1),
      (3L, "shared delta epsilon eta theta iota", "en", "s", 1),
      (4L, "unrelated words only here", "en", "s", 1))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = s"${sys.props("java.io.tmpdir")}/graft-bm25-${System.nanoTime()}"
    docs.write.parquet(s"$dir/documents.parquet")
    val out = CorpusStats.bm25Search(spark, dir,
        query = Seq("zebra", "shared"), topK = 10)
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L)) // rank order
    assert(!out.exists(_._1 == 4L))
    assert(out.find(_._1 == 1L).get._2 == 2L) // doc 1 matches both terms
    // hand-computed doc 2 score: only 'shared' (tf=3, df=3, N=4,
    // dl=4, avgdl=(4+4+6+4)/4=4.5), raw idf=(4-3+0.5)/(3+0.5)+1,
    // sat=(3*2.2)/(3+1.2*(0.25+0.75*4/4.5)); dsum rounds to 8dp
    val idf = (4 - 3 + 0.5) / (3 + 0.5) + 1.0
    val sat = (3 * (1.2 + 1.0)) / (3 + 1.2 * (0.25 + 0.75 * (4 / 4.5)))
    val expect = BigDecimal(idf * sat)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.find(_._1 == 2L).get._3 - expect) < 1e-9,
      s"${out.toSeq} vs $expect")
  }

  test("heavyHitters is exact and prunes a long-tail vocabulary " +
      "before the shuffle") {
    import spark.implicits._
    // Synthetic corpus: 5 frequent words (1000 each) over a 20,000-word
    // rare tail (1 each) — the 100 TB vocabulary shape in miniature.
    val frequent = (1 to 5).flatMap(i => Seq.fill(1000)(s"hot$i"))
    val tail = (1 to 20000).map(i => s"rare$i")
    val tok = spark.sparkContext
      .parallelize(scala.util.Random.shuffle(frequent ++ tail), 8)
      .toDF("word")
    // support 1/100 of 25,000 tokens = 250 → exactly the 5 hot words
    val out = CorpusStats.heavyHittersOf(tok, supportDiv = 100L)
      .as[(String, Long)].collect().toSeq
    assert(out.map(_._1).sorted == (1 to 5).map(i => s"hot$i"),
      out.toString)
    assert(out.forall(_._2 == 1000L))
    // The pruning claim: the CMS probe admits FAR fewer distinct words
    // into the exact groupBy than the vocabulary holds. Bound the
    // sketch's false-positive candidates: re-run the probe stage alone.
    val first = tok.agg(
      org.apache.spark.sql.functions.expr(
        "count_min_sketch(word, 0.001d, 0.99d, 42)").as("cms"),
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("total")).head()
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(first.getAs[Array[Byte]](0)))
    val thr = first.getLong(1) / 100L
    val candidates = (frequent ++ tail).distinct
      .count(w => cms.estimateCount(w) > thr)
    assert(candidates < 100,
      s"CMS admitted $candidates of 20,005 distinct words")
  }
}
