package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** X61c gate (VERDICT r11 item 6): the greedy keep-first variant must
  * implement the PAPER's retention semantics — kept(v) ⟺ no KEPT
  * lower-id neighbor above tau — which the registered [[Similarity
  * .semDedup]] rule (drop on ANY lower-id neighbor) deliberately
  * over-prunes. The planted chain a~b, b~c, a≁c is the separating
  * case: greedy keeps c (its only qualifying lower neighbor b was
  * itself dropped), the registered rule drops it. The DuckDB gate
  * replays greedy SEQUENTIALLY per vertex; this spec pins the planted
  * separation plus the superset relation on the real corpus. */
class SemDedupGreedySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** 64-dim unit vector at `deg` degrees in the (0,1) plane — the
    * CentroidAgg dim contract. */
  private def unit(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    val v = new Array[Float](64)
    v(0) = math.cos(r).toFloat; v(1) = math.sin(r).toFloat
    v
  }

  private lazy val chainDir: String = {
    import spark.implicits._
    // cos(0°,50°) = cos(50°,100°) ≈ 0.643 > 0.4; cos(0°,100°) ≈ −0.17
    val fdir =
      s"target/tmp/semgreedy_fixture_${java.util.UUID.randomUUID}"
    Seq((1L, unit(0), 0), (2L, unit(50), 0), (3L, unit(100), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$fdir/embeddings.parquet")
    fdir
  }

  test("planted chain a~b, b~c, a≁c: greedy keeps c") {
    import spark.implicits._
    val got = Similarity.semDedupGreedy(spark, chainDir,
        tau = 0.4, maxCells = 1)
      .select("vec_id", "kept", "dup_of", "n_near")
      .as[(Long, Boolean, Option[Long], Long)].collect().toSet
    assert(got == Set(
      (1L, true, None, 0L),
      (2L, false, Some(1L), 1L),
      (3L, true, None, 0L)))
  }

  test("planted chain: the registered rule drops c (the documented over-prune)") {
    import spark.implicits._
    val got = Similarity.semDedup(spark, chainDir,
        tau = 0.4, maxCells = 1)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("real corpus: greedy kept ⊇ registered kept, drops only chain tails back") {
    import spark.implicits._
    def keptOf(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "kept").as[(Long, Boolean)]
        .collect().filter(_._2).map(_._1).toSet
    val greedy = keptOf(Similarity.semDedupGreedy(spark, dir))
    val reg = keptOf(Similarity.semDedup(spark, dir))
    assert(reg.subsetOf(greedy),
      s"registered-kept not ⊆ greedy-kept: ${reg -- greedy}")
    // and greedy must still drop something real on this corpus, or
    // the superset check is vacuous
    val total = Similarity.semDedupGreedy(spark, dir).count()
    assert(greedy.size < total, "greedy must drop at least one vector")
  }
}
