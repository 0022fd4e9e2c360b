package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples,
  ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}

/** X40 — whole-operator Catalyst extension: per-key top-k with
  * partition-local bounded heaps.
  *
  * The composable formulation — `row_number().over(partitionBy(keys)
  * .orderBy(ord)) <= k` — must shuffle EVERY fact row to its key's
  * reducer and sort there before any row can be discarded: the shuffle
  * carries N rows. This operator discards before the exchange: a
  * partial phase keeps at most k rows per key per input partition
  * (bounded heap, no sort), so the shuffle carries at most
  * `partitions × keys × k` — at 100 TB with k=3 that is the difference
  * between shuffling the fact table and shuffling a rounding error.
  * Same partial/final split as an aggregate, but no aggregate function
  * can express "the k whole rows ranked first" without packing rows
  * into a collect_list struct heap (driver-sized risk, no codegen'd
  * comparisons).
  *
  * Pieces (the (c) tier of the extension ladder — logical node +
  * strategy + physical node, registered via SparkSessionExtensions):
  *  - [[TopKPerKey]]: logical node; analyzer resolves `keys`/`order`
  *    against the child, optimizer leaves it opaque (its `references`
  *    keep the sort/key columns alive through column pruning).
  *  - [[TopKStrategy]]: plans partial(no distribution requirement) →
  *    final(ClusteredDistribution on keys); EnsureRequirements inserts
  *    the single hash exchange between them.
  *  - [[TopKPerKeyExec]]: one algorithm for both phases — per-key
  *    bounded priority queue of row copies, worst row at the head, an
  *    incoming row replaces the head only when it ranks strictly
  *    better. Memory is keys-in-partition × k rows, the same envelope
  *    as a hash aggregate's state.
  *
  * Determinism: with a total `order` (tie-broken to uniqueness) the
  * result set is exactly ORDER BY ... LIMIT k per key, row-for-row —
  * which is what lets the registered query hash-match a DuckDB
  * `row_number()` oracle. With a non-total order, ties at the k-th rank
  * are broken arbitrarily (same as `row_number`). */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"topKPerKey: k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial → (exchange by keys) → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(rawKeys, order, k, child) =>
      // Grouping happens by raw UnsafeRow bytes of the key projection,
      // so -0.0 vs 0.0 and distinct NaN bit patterns would split groups.
      // Catalyst's NormalizeFloatingNumbers rule does this rewrite for
      // Aggregate/Join/Window but doesn't know this node — apply the
      // same normalization here (it is a no-op on non-FP keys).
      val keys = rawKeys.map(PlanBridge.normalizeFloating)
      val partial =
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  /** The final phase needs all rows of a key co-located; the partial
    * phase runs wherever the child already is. Empty `keys` = GLOBAL
    * top-k: the final merge needs every partial survivor on one
    * partition (AllTuples, like a global aggregate — and like one, the
    * single final task only sees partitions×k rows, not the input). */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutput = longMetric("numOutputRows")
    val kLocal = k
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = GenerateOrdering.generate(orderExprs, childOutput)
      // Reversed comparator: the heap head is the WORST retained row,
      // so admission is one compare against the head.
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ord.compare(b, a)
      }
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var pq = heaps.get(key)
        if (pq == null) {
          pq = new java.util.PriorityQueue[InternalRow](kLocal + 1, worstFirst)
          // the projection reuses its buffer — copy for map ownership
          heaps.put(key.copy(), pq)
        }
        if (pq.size() < kLocal) pq.add(row.copy())
        else if (ord.compare(row, pq.peek()) < 0) {
          pq.poll(); pq.add(row.copy())
        }
      }
      heaps.values().iterator().asScala.flatMap { pq =>
        numOutput += pq.size(); pq.iterator().asScala
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Public Column-API surface for the operator. */
object TopK {
  /** Top `k` rows per `keyCols` group under `order` (use a total order
    * — tie-break to uniqueness — for deterministic results). Empty
    * `keyCols` = global top-k (ORDER BY ... LIMIT k without sorting
    * more than partitions×k rows anywhere). */
  def topKPerKey(df: DataFrame, keyCols: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    // Eager conversion (PlanBridge.expression, not ColumnBridge): these
    // expressions bypass the Dataset API boundary that would otherwise
    // unwrap the lazy ColumnNode form.
    val sortOrders = order.map(c => PlanBridge.expression(spark, c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    PlanBridge.ofRows(spark,
      TopKPerKey(keyCols.map(PlanBridge.expression(spark, _)), sortOrders, k,
        df.queryExecution.logical))
  }
}
