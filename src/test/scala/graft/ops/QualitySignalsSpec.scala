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
}
