package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Recall contract of the banded simhash candidate generation, verified
  * against an exhaustive all-pairs hamming scan. The cross-engine oracle
  * cannot catch a pigeonhole bug implemented identically on both sides
  * (round-2 postmortem), so this check is independent: brute force says
  * which pairs are within the threshold; the banded path must surface
  * exactly those. */
class SimhashSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** Corpus with near-dup clusters (shared text ± small edits) and
    * unrelated filler so both hamming<=3 hits and misses exist. */
  private def corpus = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while " +
      "seventeen sleepy cats watch from the warm stone wall nearby " +
      "and a gentle evening wind moves the tall dry summer grass"
    val variants = Seq(
      base,
      base.replace("lazy", "tired"),
      base.replace("warm stone", "cold brick"),
      base + " tonight")
    val filler = (0 until 40).map(i =>
      s"document number $i talks about topic $i with entirely distinct " +
        s"vocabulary item${i}a item${i}b item${i}c item${i}d item${i}e " +
        s"item${i}f item${i}g item${i}h item${i}i item${i}j item${i}k " +
        s"item${i}l item${i}m item${i}n item${i}o item${i}p item${i}q")
    (variants ++ filler).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("banded 16-bit-chunk candidates == exhaustive hamming <= 3 pairs") {
    val docs = corpus
    val sig = Dedup.simhashSignaturesFor(docs).cache()
    try {
      val a = sig.select(col("doc_id").as("doc_a"),
        col("sim_lo").as("lo_a"), col("sim_hi").as("hi_a"))
      val b = sig.select(col("doc_id").as("doc_b"),
        col("sim_lo").as("lo_b"), col("sim_hi").as("hi_b"))
      val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
            bit_count(col("hi_a").bitwiseXOR(col("hi_b")))).as("hamming"))
        .filter(col("hamming") <= 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      val banded = Dedup.simhashPairsFor(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      assert(brute.nonEmpty, "corpus must contain near-dup pairs")
      assert(banded == brute,
        s"banded=${banded.toSeq.sorted} brute=${brute.toSeq.sorted}")
    } finally sig.unpersist()
  }

  test("signatures are 32-bit halves (no sign-bit overflow)") {
    val rows = Dedup.simhashSignaturesFor(corpus)
      .agg(min("sim_lo"), max("sim_lo"), min("sim_hi"), max("sim_hi"))
      .collect().head
    (0 until 4).foreach { i =>
      val v = rows.getLong(i)
      assert(v >= 0L && v < (1L << 32), s"half out of range: $v")
    }
  }
}
