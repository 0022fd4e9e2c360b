package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType}

import graft.expressions.{CmsCountGreaterThan, FloatDot, HyperplaneSigs}

/** SparkSessionExtensions entry point: registers the engine's native
  * codegen expressions in the session FunctionRegistry so pure-SQL
  * users reach them — `SELECT float_dot(a.embedding, b.embedding) …` —
  * without touching the Scala Column API. Installed by
  * [[graft.util.GraftSession.builder]] via `spark.sql.extensions`
  * (the public extension mechanism; no private registry access).
  *
  *  - `float_dot(array<float>, array<float>) → double` — fused
  *    whole-stage-codegen dot product ([[graft.expressions.FloatDot]]).
  *  - `hyperplane_sigs(array<float>, nBits, nTables) → array<bigint>` —
  *    all LSH signatures in one loop
  *    ([[graft.expressions.HyperplaneSigs]]); `nBits`/`nTables` must be
  *    integer literals because they shape the expression (and its
  *    codegen) at plan time, exactly like the Column API's Int
  *    parameters.
  *  - `cms_count_gt(item, sketch, threshold) → boolean` — count-min
  *    probe ([[graft.expressions.CmsCountGreaterThan]]); `sketch` must
  *    be a BINARY literal (a serialized sketch from Spark's
  *    `count_min_sketch(...)` aggregate, e.g. `X'...'`) and `threshold`
  *    a BIGINT/INT literal, both embedded in the expression at plan
  *    time like the Column API's parameters.
  *
  * Also injects the [[AutoBloomJoin]] optimizer rule (off by default;
  * `spark.graft.autoBloomJoin=true` turns plain selective-dim
  * equi-joins into bloom-reduced joins engine-wide).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Whole-operator extension: plans graft.plans.TopKPerKey as
    // partial→exchange→final bounded-heap top-k (see its scaladoc).
    ext.injectPlannerStrategy(_ => TopKStrategy)

    // Engine-level join reduction (conf-gated, see AutoBloomJoin doc).
    // Pre-CBO, not the operator-optimization fixed point: injected
    // there, InferFiltersFromConstraints mirrors the probe across the
    // equi-join onto the dim side — a per-dim-row bloom self-probe
    // that is pure waste (a dim key is always in its own bloom).
    ext.injectPreCBORule(spark => AutoBloomJoin(spark))

    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"float_dot expects 2 arguments, got ${children.size}")
        FloatDot(children(0), children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("hyperplane_sigs"),
      new ExpressionInfo(classOf[HyperplaneSigs].getName, "hyperplane_sigs"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"hyperplane_sigs expects (embedding, nBits, nTables), " +
            s"got ${children.size} arguments")
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"hyperplane_sigs: $what must be an INT literal, got $other")
        }
        HyperplaneSigs(children(0), intLit(children(1), "nBits"),
          intLit(children(2), "nTables"))
      }))

    ext.injectFunction((
      new FunctionIdentifier("cms_count_gt"),
      new ExpressionInfo(classOf[CmsCountGreaterThan].getName,
        "cms_count_gt"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"cms_count_gt expects (item, sketch, threshold), " +
            s"got ${children.size} arguments")
        val sketch = children(1) match {
          case Literal(b: Array[Byte], BinaryType) => b
          case other => throw new IllegalArgumentException(
            s"cms_count_gt: sketch must be a BINARY literal, got $other")
        }
        val threshold = children(2) match {
          case Literal(v: Long, LongType) => v
          case Literal(v: Int, IntegerType) => v.toLong
          case other => throw new IllegalArgumentException(
            s"cms_count_gt: threshold must be an integer literal, " +
              s"got $other")
        }
        CmsCountGreaterThan(children(0), sketch, threshold)
      }))
  }
}
