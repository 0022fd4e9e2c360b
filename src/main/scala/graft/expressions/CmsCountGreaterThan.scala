package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Native Catalyst expression: `cms.estimateCount(item) > threshold`
  * against a count-min sketch embedded in the plan — the candidate
  * pre-filter of the sketch-guided heavy-hitters pass
  * ([[graft.ops.CorpusStats.heavyHitters]]).
  *
  * This replaces what was the engine's only Scala UDF. A UDF puts a
  * serialization boundary in the middle of the pass-2 scan (codegen →
  * Java objects → lambda → back) and needs an explicitly-managed
  * broadcast for the sketch; this expression inlines into whole-stage
  * codegen via `doGenCode`, and the sketch rides the plan's reference
  * array (shipped through the task-binary broadcast Spark already
  * does — nothing to destroy afterwards).
  *
  * The probe hashes the item's UTF-8 BYTES (`UTF8String.getBytes`),
  * which is exactly how `count_min_sketch(...)` added string values on
  * the aggregation side (and how `CountMinSketch.estimateCount` treats
  * a `String`: it re-encodes to UTF-8 and hashes the bytes) — so the
  * expression is probe-identical to a `estimateCount(w: String)` UDF
  * without the per-row String allocation. CmsExpressionSpec pins that
  * parity. Null item → null, standard unary null semantics.
  *
  * The sketch is carried SERIALIZED (`sketchBytes`) and deserialized
  * once per JVM lazily, so interpreted evaluation after plan
  * serialization works without requiring the impl class to be
  * Java-serializable in-flight.
  */
final case class CmsCountGreaterThan(child: Expression,
    sketchBytes: Array[Byte], threshold: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_count_gt requires a string argument, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "cms_count_gt"

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketchBytes))

  override def nullSafeEval(w: Any): Any =
    sketch.estimateCount(w.asInstanceOf[UTF8String].getBytes) > threshold

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsSketch", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = $ref.estimateCount($w.getBytes()) > ${threshold}L;")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CmsCountGreaterThan = copy(child = newChild)
}

object CmsCountGreaterThan {
  /** Column-level entry point over a serialized count-min sketch. */
  def apply(item: Column, sketchBytes: Array[Byte],
      threshold: Long): Column =
    ColumnBridge.column(CmsCountGreaterThan(
      ColumnBridge.expression(item), sketchBytes, threshold))
}
