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
  * column references) where exactly ONE side QUALIFIES AS A DIM: its
  * subtree is selectively filtered — a `Filter` doing real work, not
  * just `IsNotNull` bookkeeping — AND join/aggregate-free (scan +
  * filter/project only, the same "simple creation side" restriction
  * Spark's `InjectRuntimeFilter` applies). The simplicity requirement
  * is what keeps the rule profitable: the bloom build RECOMPUTES the
  * dim subtree as a scalar subquery, so a join- or aggregate-carrying
  * "dim" would re-run the expensive part of the query to prune the
  * cheap part (the round-9 rule would do exactly that on the TPC-H Q10
  * shape — bloom over lineitem⋈orders to prune the customer scan).
  * The fact side gains `isnotnull(k) AND might_contain(scalar-subquery(
  * bloom_filter_agg(xxhash64(dimKey))), xxhash64(k))`: the exact plan
  * shape of the explicit operator (and of Spark's own
  * `InjectRuntimeFilter`), so the join's dead rows die at the fact
  * scan instead of riding the shuffle. Exactness is inherited from the
  * explicit operator's contract — no false negatives, false positives
  * killed by the real join — which the `bloom_join` gate row pins with
  * a plain-SQL oracle.
  *
  * A deep multi-join plan can collect SEVERAL probes, one per
  * qualifying dim (TPC-H Q7: the supplier-nation AND customer-nation
  * dims each probe the fact tree on their own key) — the idempotence
  * guard is per-key (a fact already probed on THIS key is never probed
  * on it again), not a blanket any-probe-anywhere check, which in
  * round 9 silently blocked every dim after the first. Both sides
  * qualifying (small filtered dim ⋈ small filtered dim) is skipped:
  * no fact to protect, the blooms would only add cost.
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
  * `BloomFilterMightContain` probe over a key is never re-probed on
  * that key), so a re-optimization replay is safe. */
case class AutoBloomJoin(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  import AutoBloomJoin._

  private def enabled: Boolean =
    spark.conf.get(ConfKey, "false").toBoolean

  private def expectedItems: Long =
    spark.conf.get(ItemsKey, "1000000").toLong

  /** Max estimated bytes for the bloom's creation side (default 10 MB,
    * Spark's own runtime-bloom creation-side default): the build
    * RE-SCANS the dim as a scalar subquery, so a filtered-but-huge
    * side (lineitem under a shipmode predicate) must not become a
    * "dim" — at 100 TB that build re-reads the biggest table to prune
    * a smaller one. Size comes from the logical size-only estimate
    * (file bytes × filter selectivity), the same signal
    * InjectRuntimeFilter thresholds on. */
  private def creationSideThreshold: Long =
    spark.conf.get(ThresholdKey, (10L * 1024 * 1024).toString).toLong

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

  /** Cheap to recompute as the bloom build's scalar subquery: no join
    * and no aggregate anywhere in the subtree (scan+filter/project
    * shapes only — mirrors InjectRuntimeFilter's creation-side
    * restriction). */
  private def simple(p: LogicalPlan): Boolean =
    !p.exists {
      case _: Join => true
      case _: Aggregate => true
      case _ => false
    }

  /** A side is a usable bloom SOURCE iff selective, simple, and small
    * enough that re-scanning it for the build is cheap. */
  private def qualifiesAsDim(p: LogicalPlan): Boolean =
    selectivelyFiltered(p) && simple(p) &&
      p.stats.sizeInBytes <= creationSideThreshold

  /** Idempotence guard, PER KEY: true iff `p` already carries a bloom
    * probe over xxhash64 of (semantically) this key — a replayed
    * optimization or the explicit operator's own probe. A probe on a
    * DIFFERENT key does not block injection (a deep plan collects one
    * probe per dim). */
  private def alreadyProbed(p: LogicalPlan,
      key: AttributeReference): Boolean =
    p.exists {
      case Filter(cond, _) =>
        cond.exists {
          case BloomFilterMightContain(_, x: XxHash64) =>
            x.children.exists(_.semanticEquals(key))
          case _ => false
        }
      case _ => false
    }

  private def inject(j: Join, dim: LogicalPlan,
      dimKey: AttributeReference, fact: LogicalPlan,
      factKey: AttributeReference, factIsLeft: Boolean): Join = {
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
      case j @ Join(left, right, Inner, Some(cond), _) =>
        // Equi-pairs are EXTRACTED from the conjunction (as
        // InjectRuntimeFilter does via ExtractEquiJoinKeys), not
        // required to BE the whole condition: a pushed-down residual
        // predicate merged into the join condition (TPC-H Q7's
        // nation-pair disjunction) must not hide the equi-key.
        val eqPairs = splitConjunctivePredicates(cond).collect {
          case EqualTo(a: AttributeReference, b: AttributeReference)
            if left.outputSet.contains(a) && right.outputSet.contains(b) =>
            (a, b)
          case EqualTo(a: AttributeReference, b: AttributeReference)
            if left.outputSet.contains(b) && right.outputSet.contains(a) =>
            (b, a)
        }
        if (eqPairs.isEmpty) j
        else (qualifiesAsDim(left), qualifiesAsDim(right)) match {
          // ONE probe per join (the first unprobed pair): a multi-key
          // equi-join would support one bloom per pair, but each extra
          // bloom is a full dim re-scan for diminishing extra pruning.
          case (true, false) =>
            eqPairs.find { case (_, rk) => !alreadyProbed(right, rk) }
              .fold(j) { case (lk, rk) =>
                inject(j, dim = left, dimKey = lk,
                  fact = right, factKey = rk, factIsLeft = false) }
          case (false, true) =>
            eqPairs.find { case (lk, _) => !alreadyProbed(left, lk) }
              .fold(j) { case (lk, rk) =>
                inject(j, dim = right, dimKey = rk,
                  fact = left, factKey = lk, factIsLeft = true) }
          case _ => j // both or neither side qualifies as the dim
        }
    }
}

object AutoBloomJoin {
  val ConfKey = "spark.graft.autoBloomJoin"
  val ItemsKey = "spark.graft.autoBloomJoin.expectedItems"
  val ThresholdKey = "spark.graft.autoBloomJoin.creationSideThreshold"
}
