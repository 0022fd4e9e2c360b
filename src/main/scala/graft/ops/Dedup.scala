package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables.t

/** X3 — near-duplicate text detection via MinHash + banded LSH
  * (SURVEY.md §2.8). Deterministic md5 minhashes (identical in the
  * DuckDB oracle) rather than MLlib's MinHashLSH, whose random
  * coefficients would be unverifiable cross-engine; the Spark plan shape
  * is the same banded self-join.
  *
  * Pipeline: word 3-gram shingles → per (doc, band) minhash signature →
  * self-join on (band, signature) — fan-out bounded by band-bucket
  * size, NEVER all-pairs — → pairs agreeing on ≥ minBands bands.
  * At 100 TB each stage is a shuffle-bounded groupBy/join on
  * (band, signature); skewed buckets (stop-shingle mins) are the one
  * hazard, handled by AQE skew-join splitting. */
object Dedup {

  /** Word 3-gram shingle array of the lowercased text. */
  private def shingles3 = {
    val w = TextAnalysis.tokens(col("text"))
    when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2), i =>
        concat_ws(" ", element_at(w, i), element_at(w, i + 1),
          element_at(w, i + 2))))
      .otherwise(array())
  }

  /** (doc_id, band, sig) minhash signatures: sig = min md5 over the
    * doc's shingles, salted per band. */
  def bandSignatures(spark: SparkSession, dir: String,
      nBands: Int = 8): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), explode(array_distinct(shingles3)).as("shingle"))
      .crossJoin(
        spark.range(nBands).select(col("id").cast("int").as("band")))
      .groupBy(col("doc_id"), col("band"))
      .agg(min(md5(concat(col("band").cast("string"), lit(":"),
        col("shingle")))).as("sig"))

  /** Candidate near-duplicate pairs: distinct (a < b) doc pairs sharing
    * a band bucket, kept when they agree on ≥ minBands of the bands. */
  def nearDupPairs(spark: SparkSession, dir: String, nBands: Int = 8,
      minBands: Int = 4): DataFrame = {
    val sig = bandSignatures(spark, dir, nBands)
    val a = sig.select(col("band"), col("sig"), col("doc_id").as("doc_a"))
    val b = sig.select(col("band"), col("sig"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
      .filter(col("n_bands") >= minBands)
      .orderBy("doc_a", "doc_b")
  }
}
