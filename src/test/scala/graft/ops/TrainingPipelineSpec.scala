package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.util.Tables.t

/** Invariant checks for the training-pipeline reshaping operators
  * (sequence packing, domain-mix sampling) and the Q13/Q22-shaped
  * analytics — properties the cross-engine oracle cannot express
  * (it would just mirror the same SQL). */
class TrainingPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("seq_packing: packs are contiguous token ranges within a shard") {
    import spark.implicits._
    val rows = Reshape.seqPacking(spark, dir)
      .select("shard", "pack_id", "n_tok", "cum_tok")
      .as[(Int, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (shard, inShard) =>
      val byCum = inShard.sortBy(_._4)
      // pack ids start at 0 and never decrease along the hash order
      assert(byCum.head._2 == 0L, s"shard $shard first pack")
      assert(byCum.sliding(2).forall {
        case Array(a, b) => a._2 <= b._2
        case _           => true
      }, s"shard $shard monotone")
      // the pack rule: a doc's pack is its preceding token count / 512
      byCum.foreach { case (_, pack, nTok, cum) =>
        assert(pack == (cum - nTok) / 512L, s"shard $shard pack rule")
      }
      // every pack but the highest closed at >= its budget boundary:
      // the LAST doc of pack p has cum crossing into (p+1)*512
      val lastPack = byCum.last._2
      byCum.groupBy(_._2).foreach { case (pack, docs) =>
        if (pack != lastPack)
          assert(docs.map(_._4).max >= (pack + 1) * 512L,
            s"shard $shard pack $pack underfilled but not last")
      }
    }
  }

  test("seq_packing: deterministic across runs") {
    val a = Reshape.seqPacking(spark, dir).collect().toSeq
    val b = Reshape.seqPacking(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("shard_export: manifest from written files equals the in-memory assignment") {
    import spark.implicits._
    val manifest = Reshape.shardExport(spark, dir)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(manifest.nonEmpty)
    // direct aggregate of the assignment, never touching the export
    val direct = Reshape.seqPacking(spark, dir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("pack_id")).as("n_packs"),
        sum(col("n_tok")).as("n_tokens"),
        max(col("cum_tok")).as("max_cum_tok"))
      .orderBy("shard")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(manifest == direct)
    // the export physically landed one directory per populated shard
    val exportDir = java.nio.file.Paths.get(
      "/root/repo/target/graft_shards/" + graft.util.Tables.pathTag(dir))
    val listing = java.nio.file.Files.list(exportDir)
    val dirs =
      try listing.toArray.map(_.toString).count(_.contains("shard="))
      finally listing.close()
    assert(dirs == manifest.size, s"$dirs dirs vs ${manifest.size} shards")
  }

  test("domain_mix_sample: per-source rates are honored exactly") {
    import spark.implicits._
    val sampled = Reshape.domainMixSample(spark, dir)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val totals = t(spark, dir, "documents")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val rates = Reshape.MixRates.toMap
    // every sampled bucket respects its source's rate; a source with
    // rate r keeps roughly r% (binomial bounds are loose at sf0.001 —
    // just assert the filter's hard guarantees)
    val buckets = Reshape.domainMixSample(spark, dir)
      .select("source", "bucket").as[(String, Int)].collect()
    buckets.foreach { case (src, b) =>
      assert(b < rates(src), s"$src bucket $b >= rate ${rates(src)}")
    }
    sampled.foreach { case (src, n) =>
      assert(n <= totals(src), src)
    }
    // no source disappears entirely when its rate is the max (80%)
    rates.filter(_._2 == 80).keys
      .filter(totals.getOrElse(_, 0L) >= 10)
      .foreach(src => assert(sampled.getOrElse(src, 0L) > 0L, src))
  }

  test("q13: distribution accounts for every customer exactly once") {
    import spark.implicits._
    val dist = Analytics.q13OrderDist(spark, dir)
      .as[(Long, Long)].collect()
    val nCust = t(spark, dir, "customer").count()
    assert(dist.map(_._2).sum == nCust)
    // the LEFT-join property directly: the zero bucket holds exactly
    // the customers with no qualifying (non-urgent) order
    val zeroExpected = t(spark, dir, "customer").join(
      t(spark, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey")),
      col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(dist.toMap.getOrElse(0L, 0L) == zeroExpected)
  }

  test("q22: every reported customer beats the positive-average bar") {
    import spark.implicits._
    val cust = t(spark, dir, "customer")
    val avgPos = cust.filter(col("c_acctbal") > 0)
      .agg(avg("c_acctbal")).collect()(0).getDouble(0)
    val perNation = Analytics.q22DormantRich(spark, dir)
      .select("c_nationkey", "n_cust", "total_bal")
      .as[(Long, Long, Double)].collect()
    assert(perNation.nonEmpty)
    perNation.foreach { case (_, n, bal) =>
      // average of reported balances must exceed the bar
      assert(bal / n > avgPos)
    }
  }
}
