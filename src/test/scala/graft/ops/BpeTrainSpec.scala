package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class BpeTrainSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Driver-side reference BPE: same pair counting, same tie-break
    * (count desc, then (l, r) lexicographic), same greedy left-to-right
    * merge — an independent implementation to pin the distributed one. */
  private def referenceBpe(words: Seq[(Seq[String], Long)],
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab = words
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var continue = true
    while (rank <= nMerges && continue) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) continue = false
      else {
        // tie-break in UTF-8 BYTE order, matching Spark's UTF8String
        // binary comparison — Java String.compareTo (UTF-16 units)
        // orders supplementary characters differently
        import scala.math.Ordering.Implicits._
        def u8(s: String): Seq[Int] =
          s.getBytes("UTF-8").map(_ & 0xff).toSeq
        val ((l, r), cnt) = counts.minBy {
          case ((a, b), c) => (-c, u8(a), u8(b))
        }
        out += ((rank, l, r, cnt))
        vocab = vocab.map { case (syms, f) =>
          val acc = collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (acc.nonEmpty && acc.last == l && x == r) {
              acc.remove(acc.length - 1); acc += (l + r)
            } else acc += x
          }
          (acc.toSeq, f)
        }
        rank += 1
      }
    }
    out.result()
  }

  test("greedy merge handles overlapping pairs: aaa -> [aa, a]") {
    import spark.implicits._
    val vocab = Seq((Seq("a", "a", "a"), 5L)).toDF("syms", "freq")
    val merges = BpeTrain.train(vocab, 1)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // one (a,a) pair merged left-to-right: weighted count is 2 pairs
    // x freq 5 = 10, and a second round would see [aa, a]
    assert(merges == Seq((1, "a", "a", "aa", 10L)))
  }

  test("distributed merges equal the driver-side reference on sf0.001") {
    import spark.implicits._
    val freqs = BpeTrain.wordFreqs(spark, dir)
      .as[(Seq[String], Long)].collect().toSeq
    val expect = referenceBpe(freqs, 12)
    val got = BpeTrain.bpeTrain(spark, dir, nMerges = 12)
      .as[(Int, String, String, String, Long)].collect().toSeq
      .map { case (rank, l, r, _, cnt) => (rank, l, r, cnt) }
    assert(got == expect, s"\ngot:    $got\nexpect: $expect")
    assert(got.nonEmpty)
  }

  test("training frees its checkpoints (no persisted-RDD leak)") {
    // Dataset.unpersist is a no-op on localCheckpoint RDDs (no
    // CacheManager entry) — train() must release them through the
    // bridge, or every merge round pins a vocabulary-sized RDD
    val before = spark.sparkContext.getPersistentRDDs.size
    BpeTrain.bpeTrain(spark, dir, nMerges = 5).collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before, s"persisted RDDs grew: $before -> $after")
  }

  test("bpeEncode equals a driver-side reference encode (X63)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = graft.util.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val allWords = docs.flatMap(d => toks(d._2))
    val freqs: Seq[(Seq[String], Long)] = allWords.groupBy(identity)
      .map { case (w, g) =>
        (w.map(_.toString): Seq[String], g.length.toLong) }.toSeq
    val merges = referenceBpe(freqs, 12).map { case (_, l, r, _) => (l, r) }
    def encode(word: String): Int =
      merges.foldLeft(word.map(_.toString): Seq[String]) {
        case (syms, (l, r)) =>
          val acc = collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (acc.nonEmpty && acc.last == l && x == r) {
              acc.remove(acc.length - 1); acc += (l + r)
            } else acc += x
          }
          acc.toSeq
      }.length
    val encLen: Map[String, Int] =
      allWords.distinct.map(w => w -> encode(w)).toMap
    val expect = docs.toSeq.flatMap { case (id, tx) =>
      val ws = toks(tx)
      if (ws.isEmpty) None
      else {
        val nTok = ws.map(encLen(_).toLong).sum
        val nCh = ws.map(_.length.toLong).sum
        Some((id, ws.length.toLong, nTok, nCh, nCh.toDouble / nTok))
      }
    }.sortBy(_._1)
    val got = BpeTrain.bpeEncode(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == expect)
    // merging actually compressed something (degenerate-test guard)
    assert(got.exists(r => r._3 < r._4))
  }

  test("bpeEncode with zero merges counts characters") {
    import spark.implicits._
    val out = BpeTrain.bpeEncode(spark, dir, nMerges = 0)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, _, nTok, nChars, cpt) =>
      assert(nTok == nChars); assert(cpt == 1.0)
    }
  }

  test("training is deterministic across runs") {
    import spark.implicits._
    def run() = BpeTrain.bpeTrain(spark, dir, nMerges = 6)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(run() == run())
  }

  test("bpeFertility equals a driver-side rollup of the encoding (X103)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val perDoc = BpeTrain.bpeEncode(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect()
    val langOf = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    val want = perDoc.groupBy(r => langOf(r._1)).map { case (lang, rs) =>
      val (w, t, c) = (rs.map(_._2).sum, rs.map(_._3).sum,
        rs.map(_._4).sum)
      lang -> ((rs.length.toLong, w, t, c,
        t.toDouble / w.toDouble, c.toDouble / t.toDouble))
    }
    val got = BpeTrain.bpeFertility(spark, dir)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got == want, s"got $got\nwant $want")
    // fertility is a real signal on the fixture: ratios in sane range
    got.values.foreach { v =>
      assert(v._5 >= 1.0 && v._6 >= 1.0, v)
    }
  }
}
