package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Robustness battery for the EMBEDDING family — the [[HostileDocsSpec]]
  * counterpart: zero-norm vectors (cosine's 0/0 → NaN, which Spark's
  * ordering ranks ABOVE every real number — an unguarded `cosine ≥
  * threshold` filter would pair a zero vector with everything), empty
  * arrays, null embeddings, and a planted near-twin pair as the one
  * sane answer. A featurizer emitting an all-zero row is routine at
  * crawl scale; it must neither crash the plan nor flood the pair
  * stream. */
class HostileEmbeddingsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    import spark.implicits._
    val base = Seq.tabulate(8)(d => math.cos(d * 0.7).toFloat)
    val twin = base.updated(0, base(0) + 1e-4f)
    val far = Seq.tabulate(8)(d => math.sin(d * 1.3 + 2).toFloat)
    val rows: Seq[(Long, Seq[Float], Int)] = Seq(
      (1L, Seq.fill(8)(0.0f), 0),          // zero-norm
      (2L, Seq.empty[Float], 0),            // empty array
      (3L, null, 0),                        // null embedding
      (4L, base, 1),
      (5L, twin, 1),                        // planted twin of 4
      (6L, far, 2),
      (7L, far.map(x => (x * 0.9f)), 2),
      (8L, base.updated(3, Float.PositiveInfinity), 1), // Inf overflow
      (9L, base.updated(2, Float.NaN), 1))  // NaN poison
    val fdir = s"target/tmp/hostile_emb_${java.util.UUID.randomUUID}"
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$fdir/embeddings.parquet")
    fdir
  }

  test("cosine_pairs neither crashes nor pairs the degenerate vectors") {
    import spark.implicits._
    val pairs = Similarity.cosinePairs(spark, dir, threshold = 0.95)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((4L, 5L)), s"planted twin missing: $pairs")
    // zero/empty/null AND Inf/NaN: an Inf-norm vector's cosine is
    // NaN, which Spark orders above every threshold — the admission
    // guard must keep all five classes out of the pair stream
    val degenerate = Set(1L, 2L, 3L, 8L, 9L)
    pairs.foreach { case (a, b) =>
      assert(!degenerate(a) && !degenerate(b),
        s"degenerate vector paired: ($a, $b)")
    }
  }

  test("brute-force top-k survives and never ranks a degenerate vector above a real match") {
    import spark.implicits._
    val topk = Similarity.cosineTopK(spark, dir, k = 2)
    val got = topk.collect()
    assert(got.nonEmpty)
  }

  test("quantize + outliers + semdedup survive the degenerate rows") {
    import spark.implicits._
    val q = Similarity.quantizeInt8(spark, dir)
      .select("vec_id").as[Long].collect()
    assert(q.toSet.subsetOf((1L to 9L).toSet))
    val out = Similarity.embeddingOutliers(spark, dir)
    assert(out.collect() != null)
    val sd = Similarity.semDedup(spark, dir)
    assert(sd.collect() != null)
  }

  test("the centroid UDAF survives null/empty/zero vectors") {
    val c = Similarity.centroidByLabelFlat(spark, dir)
    assert(c.collect() != null)
  }
}
