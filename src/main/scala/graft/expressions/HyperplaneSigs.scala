package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: ALL `nTables` random-hyperplane LSH
  * signatures of an `array<float>` embedding in one fused loop —
  * `result[t]` has bit `j` set iff
  * `Σ_i x_i · (pmod(xxhash64(t, j, i), 1e6)/1e6 − 0.5) ≥ 0`.
  *
  * Semantically identical (bit-for-bit, asserted in SimilaritySpec) to
  * the higher-order-function formulation [[graft.ops.Similarity.signature]]
  * evaluated per table: same xxhash64 chaining (seed 42, int children),
  * same coefficient arithmetic, same sequential element order. The
  * difference is execution: the HOF form interprets nBits × nTables
  * lambda folds per row (each re-walking the array and re-hashing per
  * element); this expression runs one whole-stage-codegen loop with the
  * (table, bit) hash prefixes precomputed once per query, so signature
  * cost drops from the dominant term of the LSH query to noise.
  *
  * Null semantics match the HOF form: null array → null; a null ELEMENT
  * poisons every projection fold (acc + null stays null), whose
  * `when(proj >= 0, bit).otherwise(0)` then takes the otherwise branch —
  * i.e. every signature collapses to 0L. */
final case class HyperplaneSigs(child: Expression, nBits: Int, nTables: Int)
    extends UnaryExpression {

  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1,63], got $nBits")
  require(nTables >= 1, s"nTables must be >= 1, got $nTables")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sigs requires array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sigs"

  /** Row-independent prefix hashes: preH(t*nBits + j) = the xxhash64
    * chain state after (table, bit), so the per-element work is a single
    * int-hash step. Computed once per (deserialized) expression. */
  @transient private lazy val preH: Array[Long] = {
    val a = new Array[Long](nTables * nBits)
    var t = 0
    while (t < nTables) {
      val ht = XXH64.hashInt(t, 42L)
      var j = 0
      while (j < nBits) { a(t * nBits + j) = XXH64.hashInt(j, ht); j += 1 }
      t += 1
    }
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val projs = new Array[Double](nTables * nBits)
    var poisoned = false
    var i = 0
    while (i < n && !poisoned) {
      if (x.isNullAt(i)) poisoned = true
      else {
        val xi = x.getFloat(i).toDouble
        var k = 0
        while (k < projs.length) {
          val h = XXH64.hashInt(i, preH(k))
          val m = ((h % 1000000L) + 1000000L) % 1000000L
          projs(k) += xi * (m.toDouble / 1000000.0 - 0.5)
          k += 1
        }
      }
      i += 1
    }
    val sigs = new Array[Long](nTables)
    if (!poisoned) {
      var t = 0
      while (t < nTables) {
        var sig = 0L
        var j = 0
        while (j < nBits) {
          if (projs(t * nBits + j) >= 0) sig |= 1L << j
          j += 1
        }
        sigs(t) = sig
        t += 1
      }
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val pre = ctx.addReferenceObj("preH", preH, "long[]")
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val xi = ctx.freshName("xi")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      val projs = ctx.freshName("projs")
      val sigs = ctx.freshName("sigs")
      val sig = ctx.freshName("sig")
      val poisoned = ctx.freshName("poisoned")
      s"""
         |int $n = $x.numElements();
         |double[] $projs = new double[${nTables * nBits}];
         |boolean $poisoned = false;
         |for (int $i = 0; $i < $n && !$poisoned; $i++) {
         |  if ($x.isNullAt($i)) { $poisoned = true; break; }
         |  double $xi = (double) $x.getFloat($i);
         |  for (int $k = 0; $k < ${nTables * nBits}; $k++) {
         |    long $h = $xxh.hashInt($i, $pre[$k]);
         |    long $m = (($h % 1000000L) + 1000000L) % 1000000L;
         |    $projs[$k] += $xi * (((double) $m) / 1000000.0 - 0.5);
         |  }
         |}
         |long[] $sigs = new long[$nTables];
         |if (!$poisoned) {
         |  for (int $t = 0; $t < $nTables; $t++) {
         |    long $sig = 0L;
         |    for (int $j = 0; $j < $nBits; $j++) {
         |      if ($projs[$t * $nBits + $j] >= 0) $sig |= 1L << $j;
         |    }
         |    $sigs[$t] = $sig;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($sigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)
}

object HyperplaneSigs {
  /** Column-level entry point: array of nTables signature longs. */
  def apply(e: Column, nBits: Int, nTables: Int): Column =
    ColumnBridge.column(
      HyperplaneSigs(ColumnBridge.expression(e), nBits, nTables))
}
