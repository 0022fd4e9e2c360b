package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.util.Tables.{t, dsum}

/** Bloom-filter semi-join reduction — the standard shuffle-reduction
  * pattern for a selective fact⨝dim join whose dim side is too big to
  * broadcast: build a bloom filter over the dim keys (a distributed
  * aggregate whose result is ONE binary row), probe it in a filter on
  * the fact side BEFORE the join, and let the join itself remove the
  * bloom's false positives. The fact rows that would die in the join
  * are dropped at the scan, so the join shuffle carries only
  * (matching + fpp·non-matching) rows instead of the whole fact table
  * — at 100 TB that is the difference between shuffling terabytes and
  * shuffling the selectivity.
  *
  * The plan shape is exactly Spark's own `InjectRuntimeFilter`
  * rewrite (filter on `might_contain(scalar-subquery(bloom_filter_agg
  * (xxhash64(k))), xxhash64(k))`), built explicitly so it applies to
  * any (fact, dim) pair the caller knows is selective — the automatic
  * rule only fires on joins whose creation side it can prove cheap
  * and selective, and is off by default. No driver round-trip: the
  * bloom travels plan-internally as a scalar subquery.
  *
  * Correctness contract (what the DuckDB oracle pins): the reduced
  * join equals the plain join EXACTLY — a bloom filter has no false
  * negatives, and every false positive fails the real join predicate
  * downstream.
  */
object JoinReduction {

  /** Pre-filter `fact` by a bloom filter of `dim`'s join keys, then
    * join. `expectedItems` sizes the filter (dim-side distinct keys);
    * `fpp` is the target false-positive rate — bits follow the
    * standard m = -n·ln(p)/ln(2)² formula. NULL fact keys are dropped
    * by an explicit `isNotNull` before the probe: `xxhash64` is
    * null-SAFE (a null key hashes to the seed, never to null), so
    * without the explicit filter a null-keyed row could collide with
    * the seed-hash bucket and ride the shuffle all the way to the
    * equi-join that finally drops it — on a null-heavy fact that is
    * exactly the shuffle this operator exists to avoid. */
  def bloomReduceJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"bad bloom sizing: n=$expectedItems fpp=$fpp")
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong)
    // Distributed bloom build over the dim keys: Aggregate → 1 binary
    // row, embedded as a scalar subquery (planned and executed by
    // Spark's normal subquery machinery — reused, not re-run, if the
    // plan references it twice).
    val buildAgg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(col(dimKey)))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bloomPlan = dim
      .select(ColumnBridge.column(buildAgg).as("bloom"))
      .queryExecution.analyzed
    val probe = BloomFilterMightContain(
      ScalarSubquery(bloomPlan),
      new XxHash64(Seq(ColumnBridge.expression(col(factKey)))))
    fact.filter(col(factKey).isNotNull)
      .filter(ColumnBridge.column(probe))
      .join(dim, col(factKey) === col(dimKey))
  }

  /** Registered query (`bloom_join`): revenue by nation for lineitems
    * supplied from one region. The dim (region-filtered suppliers,
    * 20% of the supplier table) bloom-reduces the lineitem scan before
    * the join; the aggregate runs on the surviving rows. Oracle = the
    * plain SQL join — green proves the reduction is lossless. */
  def bloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val sup = t(spark, dir, "supplier")
    val nat = t(spark, dir, "nation")
    val reg = t(spark, dir, "region")
    val dim = sup
      .join(nat, sup("s_nationkey") === nat("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select(col("s_suppkey"), col("n_name"))
    val fact = t(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    bloomReduceJoin(fact, dim, "l_suppkey", "s_suppkey",
        expectedItems = 1000L * 1000L)
      .groupBy(col("n_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("n_name"))
  }
}
