package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, BloomFilterMightContain, EqualTo, IsNotNull, Literal, PredicateHelper, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Engine-level automatic bloom-filter join reduction: the optimizer
  * rule form of [[graft.ops.JoinReduction.bloomReduceJoin]] — a plain
  * `fact.join(dim)` gets the dim-keyed bloom pre-filter injected on the
  * fact side with no per-query code at all. This is the difference
  * between a library idiom the caller must know and engine behavior
  * every query inherits.
  *
  * Fires on an INNER equi-join (single `a = b` condition between plain
  * column references) where exactly ONE side is selectively filtered —
  * its subtree contains a `Filter` doing real work, not just
  * `IsNotNull` bookkeeping — and the other (the fact) is not. The fact
  * side gains `isnotnull(k) AND might_contain(scalar-subquery(
  * bloom_filter_agg(xxhash64(dimKey))), xxhash64(k))`: the exact plan
  * shape of the explicit operator (and of Spark's own
  * `InjectRuntimeFilter`), so the join's dead rows die at the fact
  * scan instead of riding the shuffle. Exactness is inherited from the
  * explicit operator's contract — no false negatives, false positives
  * killed by the real join — which the `bloom_join` gate row pins with
  * a plain-SQL oracle.
  *
  * OFF by default (`spark.graft.autoBloomJoin=true` enables), matching
  * Spark's own runtime-filter rule: without table statistics a logical
  * rule cannot prove the dim side cheap, and an unprofitable bloom
  * build costs one extra aggregate over the dim — correct but not
  * free. The conservative both-sides-filtered and non-equi shapes are
  * skipped entirely.
  *
  * Injected in the PRE-CBO phase (once, after the operator
  * optimization fixed point): inside that fixed point,
  * `InferFiltersFromConstraints` would mirror the injected probe
  * across the join condition onto the dim side — a per-dim-row bloom
  * self-probe that can never filter anything. Guards keep the rule
  * idempotent anyway (a fact side already carrying a
  * `BloomFilterMightContain` probe is never injected twice), so a
  * re-optimization replay is safe. */
case class AutoBloomJoin(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  import AutoBloomJoin._

  private def enabled: Boolean =
    spark.conf.get(ConfKey, "false").toBoolean

  private def expectedItems: Long =
    spark.conf.get(ItemsKey, "1000000").toLong

  /** A Filter predicate that does real selection work (anything beyond
    * null-intolerance bookkeeping and already-injected bloom probes). */
  private def selectivelyFiltered(p: LogicalPlan): Boolean =
    p.exists {
      case Filter(cond, _) => splitConjunctivePredicates(cond).exists {
        case _: IsNotNull => false
        case c => !c.exists(_.isInstanceOf[BloomFilterMightContain])
      }
      case _ => false
    }

  private def hasBloomProbe(p: LogicalPlan): Boolean =
    p.exists {
      case Filter(cond, _) =>
        cond.exists(_.isInstanceOf[BloomFilterMightContain])
      case _ => false
    }

  private def inject(j: Join): Join = {
    val Some(EqualTo(a: AttributeReference, b: AttributeReference)) =
      j.condition: @unchecked
    val (leftKey, rightKey) =
      if (j.left.outputSet.contains(a)) (a, b) else (b, a)
    val leftSelective = selectivelyFiltered(j.left)
    // exactly one selective side (checked by the caller): that side is
    // the dim, the other the fact
    val (dim, dimKey, fact, factKey, factIsLeft) =
      if (leftSelective) (j.left, leftKey, j.right, rightKey, false)
      else (j.right, rightKey, j.left, leftKey, true)
    val fpp = 0.01
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong)
    val bloom = Aggregate(Nil,
      Seq(Alias(new BloomFilterAggregate(
        new XxHash64(Seq(dimKey)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression(),
        "graft_auto_bloom")()),
      Project(Seq(dimKey), dim))
    val probe = And(IsNotNull(factKey),
      BloomFilterMightContain(ScalarSubquery(bloom),
        new XxHash64(Seq(factKey))))
    val reduced = Filter(probe, fact)
    if (factIsLeft) j.copy(left = reduced) else j.copy(right = reduced)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner,
          Some(EqualTo(a: AttributeReference, b: AttributeReference)), _)
        if (left.outputSet.contains(a) && right.outputSet.contains(b) ||
            left.outputSet.contains(b) && right.outputSet.contains(a)) &&
          selectivelyFiltered(left) != selectivelyFiltered(right) &&
          !hasBloomProbe(if (selectivelyFiltered(left)) right else left) =>
        inject(j)
    }
}

object AutoBloomJoin {
  val ConfKey = "spark.graft.autoBloomJoin"
  val ItemsKey = "spark.graft.autoBloomJoin.expectedItems"
}
