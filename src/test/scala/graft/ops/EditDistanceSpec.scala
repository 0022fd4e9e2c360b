package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** X71/X71b gate (the missing round-11 integration, VERDICT r11 item
  * 1): the PassJoin segment filter claims LOSSLESSNESS, so the spec
  * checks the whole join — candidates, short bucket, banded
  * verification — against an independent driver-side brute force at
  * two taus, plus the probe split against the self-join restricted to
  * cross pairs (the SetSimProbeSpec contract), plus a PLANTED
  * short-string corpus (this testdata's min doc length is 63, so the
  * short bucket is empty on it — the planted case is what actually
  * exercises the distinct-string/partner-length path). */
class EditDistanceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Textbook full-DP Levenshtein — deliberately NOT the banded
    * algorithm the engine verifies with, so the band's correctness is
    * independently checked too. */
  private def lev(a: String, b: String): Int = {
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    for (j <- 0 to b.length) prev(j) = j
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, b.length + 1)
    }
    prev(b.length)
  }

  private def brutePairs(docs: Seq[(Long, String)], tau: Int)
      : Set[(Long, Long, Long, Long, Long)] =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs
      if ia < ib && math.abs(ta.length - tb.length) <= tau
      d = lev(ta, tb) if d <= tau
    } yield (ia, ib, ta.length.toLong, tb.length.toLong, d.toLong)).toSet

  private lazy val corpus: Seq[(Long, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
  }

  private def engine(tau: Int): Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    EditDistance.editDistanceJoin(spark, dir, tau)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
  }

  test("editDistanceJoin == brute force at tau=8 (lossless filter)") {
    val expected = brutePairs(corpus, 8)
    assert(engine(8) == expected)
    assert(expected.nonEmpty,
      "tau=8 must surface pairs at this sf or the check is vacuous")
  }

  test("editDistanceJoin == brute force at tau=3 (tighter band)") {
    assert(engine(3) == brutePairs(corpus, 3))
  }

  test("editDistanceProbe == self-join restricted to cross pairs") {
    import spark.implicits._
    val got = EditDistance.editDistanceProbe(spark, dir, tau = 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val expected = engine(8).flatMap { case (a, b, la, lb, d) =>
      if (a % 7 == 0 && b % 7 != 0) Some((a, b, la, lb, d))
      else if (b % 7 == 0 && a % 7 != 0) Some((b, a, lb, la, d))
      else None
    }
    assert(got == expected)
  }

  test("seeded fuzz: lossless over a small alphabet straddling every length boundary") {
    import spark.implicits._
    // alphabet size 3 + lengths 0..40 at tau=3: dense short-bucket
    // collisions (identical and 1-edit strings abound), lengths
    // hugging the segment-path boundary (tau+1 = 4), and mutated
    // copies at 0..5 edits bracketing tau — the regimes the corpus
    // test (min length 63, rich alphabet) never reaches. Fixed seed:
    // the case set is deterministic, failures reproduce.
    val rnd = new scala.util.Random(20260815L)
    val alpha = "abc"
    def randStr(len: Int): String =
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val bases = (0 until 40).map(_ => randStr(rnd.nextInt(41)))
    val mutated = bases.take(20).map { s =>
      val t = s.toBuffer
      (0 until rnd.nextInt(6)).foreach { _ =>
        if (t.isEmpty) t.append(alpha(rnd.nextInt(3)))
        else rnd.nextInt(3) match {
          case 0 => t.update(rnd.nextInt(t.length), alpha(rnd.nextInt(3)))
          case 1 => t.insert(rnd.nextInt(t.length + 1), alpha(rnd.nextInt(3)))
          case 2 => t.remove(rnd.nextInt(t.length)); ()
        }
      }
      t.mkString
    }
    // explicit boundary lengths around the segment-path cutoff
    // (tau+1 = 4), plus the empty string — the seed must not decide
    // whether the boundary is exercised
    val boundary = Seq("", "abc", "abca", "abcab", "bcab")
    val planted = (bases ++ mutated ++ boundary).zipWithIndex
      .map { case (s, i) => ((i + 1).toLong, s) }
    val fdir = s"target/tmp/editdist_fuzz_${java.util.UUID.randomUUID}"
    planted.toDF("doc_id", "text")
      .write.parquet(s"$fdir/documents.parquet")
    val got = EditDistance.editDistanceJoin(spark, fdir, tau = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val expected = brutePairs(planted, 3)
    assert(got == expected)
    // both buckets must be live, and the boundary (len == tau+1)
    // must participate, or the fuzz regressed into one regime
    assert(expected.exists { case (_, _, la, lb, _) => math.min(la, lb) <= 3 })
    assert(expected.exists { case (_, _, la, lb, _) => math.min(la, lb) > 3 })
    // the planted boundary quartet pairs across the cutoff: "abc"
    // (short bucket) ~ "abca" (segment path) at ed 1
    assert(expected.exists { case (_, _, la, lb, _) =>
      math.min(la, lb) == 3 && math.max(la, lb) == 4 })
    // tau=1, the tightest band: two segments, shift window collapses
    // to d ∈ [−⌊(1−Δ)/2⌋, ⌊(1+Δ)/2⌋] — the floor arithmetic's edge
    val got1 = EditDistance.editDistanceJoin(spark, fdir, tau = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got1 == brutePairs(planted, 1))
    assert(got1.nonEmpty, "the small alphabet must yield ed<=1 pairs")
  }

  test("planted short strings resolve through the short bucket") {
    import spark.implicits._
    // tau=3 shorts: len ≤ 6 with min ≤ 3 — identical pairs, swaps,
    // an empty string, a short-long straddle that must NOT match,
    // and a genuine segment-path pair so both buckets coexist
    val planted: Seq[(Long, String)] = Seq(
      1L -> "ab", 2L -> "ba", 3L -> "abcd", 4L -> "abcdef",
      5L -> "", 6L -> "abc", 7L -> "xy", 8L -> "xy", 9L -> "ab",
      10L -> "the quick brown fox jumps over the lazy dog",
      11L -> "the quick brown cat jumps over the lazy dog",
      12L -> "completely unrelated content with no nearby neighbour")
    val fdir = s"target/tmp/editdist_fixture_${java.util.UUID.randomUUID}"
    planted.toDF("doc_id", "text")
      .write.parquet(s"$fdir/documents.parquet")
    val got = EditDistance.editDistanceJoin(spark, fdir, tau = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val expected = brutePairs(planted, 3)
    assert(got == expected)
    // the planted truth includes genuinely-short pairs (both buckets
    // are exercised, not vacuously green)
    assert(expected.exists { case (_, _, la, lb, _) =>
      math.min(la, lb) <= 3 })
    assert(expected.contains((10L, 11L, 43L, 43L, 3L)))
  }
}
