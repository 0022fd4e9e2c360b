package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Seeded fuzz for the round-12 mixture/calibration operators: random
  * skewed corpora (heavy/tail sources, duplicated texts, single-doc
  * sources, empty docs) checked against independent driver-side
  * re-derivations — the regimes the fixed testdata never produces:
  * margin TIES from duplicate texts (rank must break by doc_id, not
  * partition luck), sources at the clamp boundary, sources whose
  * whole mass sits in one margin bucket, and zero-token sources
  * (rate 0, not a division error). The oracle gate already replays
  * both operators on the one registered corpus shape; this spec walks
  * the input space. */
class MixFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val words =
    Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")

  /** Random corpus: nSrc sources with exponentially skewed doc
    * counts, ~30% duplicated texts (margin/token ties), one
    * single-doc source, one all-empty source. */
  private def corpus(seed: Int): String = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val nSrc = 4 + rnd.nextInt(4)
    var id = 0L
    val rows = (0 until nSrc).flatMap { s =>
      val n = if (s == nSrc - 1) 1 else 3 + rnd.nextInt(40) * (nSrc - s)
      val pool = Vector.fill(1 + n / 3)(
        Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.size)))
          .mkString(" "))
      (0 until n).map { _ =>
        id += 1
        val text =
          if (s == 0 && rnd.nextInt(4) == 0) "" // empty docs in src0
          else pool(rnd.nextInt(pool.size))     // ~duplicate-heavy
        (id, text, "en", s"s$s", text.length.toLong)
      }
    }
    val dir = s"target/tmp/mixfuzz_${seed}_${java.util.UUID.randomUUID}"
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(7) // shuffle the layout so order can't help
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(t: String): Long =
    if (t == null) 0L else t.toLowerCase.split("\\s+").count(_.nonEmpty).toLong

  private def coin(salt: String, id: Long, mod: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt$id".getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(4).map(b => f"$b%02x").mkString, 16) % mod
  }

  test("temperatureRates: an all-zero-token corpus derives all-zero rates, no division error") {
    assert(Reshape.temperatureRates(Seq(("a", 0L), ("b", 0L)))
      == Seq(("a", 0L), ("b", 0L)))
    assert(Reshape.temperatureRates(Seq.empty) == Seq.empty)
  }

  test("fuzz: temperature_mix equals the integer derivation on random skewed corpora") {
    import spark.implicits._
    (1 to 4).foreach { seed =>
      val dir = corpus(seed)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "source", "text")
        .as[(Long, String, String)].collect()
        .map { case (i, s, t) => (i, s, toks(t)) }
      val bySrc = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val sI = bySrc.map { case (s, t) =>
        s -> math.floor(math.sqrt(t.toDouble)).toLong }
      val a = (bySrc.values.sum * 2 / 5) * 1000000L / sI.values.sum
      val rates = bySrc.map { case (s, t) =>
        s -> (if (t == 0) 0L else math.min(1000000L, a * sI(s) / t)) }
      val expected = docs.collect {
        case (i, s, n) if coin("tmix:", i, 1000000) < rates(s) =>
          (i, s, n, rates(s)) }.toSet
      val got = Reshape.temperatureMix(spark, dir)
        .select("doc_id", "source", "n_tok", "rate_ppm")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == expected, s"seed $seed: ${got.size} vs ${expected.size}")
    }
  }

  test("fuzz: quality_calibrated equals the naive rank under heavy margin ties") {
    import spark.implicits._
    (1 to 4).foreach { seed =>
      val dir = corpus(seed)
      graft.util.CkptMemo.clear()
      val scored = QualitySignals.qualityScore(spark, dir)
        .select("doc_id", "margin").as[(Long, Double)].collect().toMap
      val srcOf = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "source").as[(Long, String)].collect().toMap
      val expected = scored.toSeq
        .map { case (i, m) => (i, srcOf(i), m) }
        .groupBy(_._2).toSeq.flatMap { case (_, ds) =>
          val quota = (ds.size * 60 + 99) / 100
          ds.sortBy { case (i, _, m) => (-m, i) }
            .zipWithIndex.take(quota)
            .map { case ((i, s, m), r) => (i, s, m, (r + 1).toLong) }
        }.toSet
      graft.util.CkptMemo.clear()
      val got = QualitySignals.qualityCalibrated(spark, dir)
        .select("doc_id", "source", "margin", "src_rank")
        .as[(Long, String, Double, Long)].collect().toSet
      assert(got == expected, s"seed $seed: ${got.size} vs ${expected.size}")
      // the duplicate-heavy pool guarantees tie groups; ranks within a
      // tie must follow doc_id (determinism, not partition luck)
      val ties = got.groupBy(r => (r._2, r._3)).values.filter(_.size > 1)
      assert(ties.nonEmpty, s"seed $seed produced no margin ties")
      ties.foreach { g =>
        val sorted = g.toSeq.sortBy(_._1)
        assert(sorted.map(_._4) == sorted.map(_._4).sorted,
          s"tie group ranks not doc_id-ordered: $g")
      }
      graft.util.CkptMemo.clear()
    }
  }
}
