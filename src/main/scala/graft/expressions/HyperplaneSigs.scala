package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: ALL `nTables` random-hyperplane LSH
  * signatures of an `array<float>` embedding in one fused loop —
  * `result[t]` has bit `j` set iff `Σ_i x_i · coef(t,j,i) ≥ 0`, where
  * `coef(t,j,i) = (md5_32("hp:t:j:i") mod 1e6)/1e6 − 0.5`
  * ([[HyperplaneSigs.coefAt]] — the engine's one cross-engine hash,
  * `graft.util.Tables.md5Long32`).
  *
  * The coefficients are ROW-INDEPENDENT constants (they depend only on
  * table, bit, element index), so the whole plane matrix is computed
  * once per expression instance and the per-row inner loop is a pure
  * multiply-add over a cached `double[]` — no hashing in the hot path
  * at all (the round-9 change; the previous xxhash64 formulation
  * re-hashed every (element, plane) pair per ROW, and — being
  * xxhash64 — had no DuckDB twin, which kept `ann_lsh_pairs`
  * rows-only). md5-derived coefficients make the full signature →
  * band → candidate → exact-verify pipeline recomputable in the
  * DuckDB gate: `CAST(('0x' || substring(md5('hp:'||t||':'||j||':'||i),
  * 1, 8)) AS BIGINT) % 1000000 / 1e6 - 0.5`, folded in list order by
  * `list_dot_product` — the identical sequential IEEE sum.
  *
  * Semantically identical (bit-for-bit, asserted in SimilaritySpec) to
  * the higher-order-function formulation
  * [[graft.ops.Similarity.signature]] evaluated per table: same
  * coefficient derivation, same sequential element order.
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

  /** The cached plane matrix, flattened [i * K + k] with
    * k = t·nBits + j — element-major so the per-element inner k loop
    * walks contiguous memory. Covers i < MaxCachedDim eagerly; a wider
    * vector triggers a one-time geometric regrow via [[coefsFor]] —
    * the per-row loop is ALWAYS a pure multiply-add over a cached
    * array, never per-(plane, element) md5 (that fallback was a silent
    * ~1000× per-row cliff for wide embeddings: nK digests per element
    * per row). */
  @transient private lazy val coefs: Array[Double] =
    HyperplaneSigs.buildCoefs(nTables, nBits, HyperplaneSigs.MaxCachedDim)

  /** Wide-vector extension of [[coefs]], grown geometrically on first
    * observation of a longer array and reused by every later row.
    * Volatile + synchronized regrow: the expression instance can be
    * shared across a local-mode stage's task threads, and the regrow
    * is idempotent (coefAt is a pure function), so the worst race
    * cost is one redundant build. The steady-state per-row cost is
    * one volatile read. */
  @transient @volatile private var wideCoefs: Array[Double] = null

  /** Coefficient matrix covering at least `n` elements. Public only
    * for the generated code's per-row call. */
  def coefsFor(n: Int): Array[Double] = {
    if (n <= HyperplaneSigs.MaxCachedDim) coefs
    else {
      val k = nTables * nBits
      var w = wideCoefs
      if (w == null || w.length < n * k) {
        synchronized {
          w = wideCoefs
          if (w == null || w.length < n * k) {
            val dim = math.max(n,
              math.max(HyperplaneSigs.MaxCachedDim,
                if (w == null) 0 else w.length / k) * 2)
            w = HyperplaneSigs.buildCoefs(nTables, nBits, dim)
            wideCoefs = w
          }
        }
      }
      w
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val nK = nTables * nBits
    val projs = new Array[Double](nK)
    val cm = coefsFor(n)
    var poisoned = false
    var i = 0
    while (i < n && !poisoned) {
      if (x.isNullAt(i)) poisoned = true
      else {
        val xi = x.getFloat(i).toDouble
        val base = i * nK
        var k = 0
        while (k < nK) { projs(k) += xi * cm(base + k); k += 1 }
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
      // the expression instance itself rides along so the generated
      // code shares the SAME growing coefficient cache as interpreted
      // eval — one virtual call per row, never per-element hashing
      val self = ctx.addReferenceObj("hyperplaneSigs", this,
        classOf[HyperplaneSigs].getName)
      val cf = ctx.freshName("cf")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val xi = ctx.freshName("xi")
      val base = ctx.freshName("base")
      val projs = ctx.freshName("projs")
      val sigs = ctx.freshName("sigs")
      val sig = ctx.freshName("sig")
      val poisoned = ctx.freshName("poisoned")
      val nK = nTables * nBits
      s"""
         |int $n = $x.numElements();
         |double[] $cf = $self.coefsFor($n);
         |double[] $projs = new double[$nK];
         |boolean $poisoned = false;
         |for (int $i = 0; $i < $n && !$poisoned; $i++) {
         |  if ($x.isNullAt($i)) { $poisoned = true; break; }
         |  double $xi = (double) $x.getFloat($i);
         |  int $base = $i * $nK;
         |  for (int $k = 0; $k < $nK; $k++) {
         |    $projs[$k] += $xi * $cf[$base + $k];
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
  /** Eager coefficient cache width (element index). Wider embeddings
    * regrow the cache once ([[HyperplaneSigs.coefsFor]]) — still a
    * cached multiply-add per row, never per-row hashing. */
  val MaxCachedDim = 256

  /** Plane matrix for element indices [0, dim), flattened
    * [i * nK + t * nBits + j] — element-major so the per-element
    * inner loop walks contiguous memory. Pure function of the
    * (nTables, nBits, dim) triple; called once per cache (re)build. */
  private[expressions] def buildCoefs(nTables: Int, nBits: Int,
      dim: Int): Array[Double] = {
    val k = nTables * nBits
    val a = new Array[Double](dim * k)
    var i = 0
    while (i < dim) {
      var t = 0
      while (t < nTables) {
        var j = 0
        while (j < nBits) {
          a(i * k + t * nBits + j) = coefAt(t, j, i)
          j += 1
        }
        t += 1
      }
      i += 1
    }
    a
  }

  /** Plane coefficient for (table, bit, element): the first 32 md5
    * bits of `"hp:t:j:i"` as an unsigned int, mod 1e6, mapped to
    * [-0.5, 0.5). EXACTLY `graft.util.Tables.md5Long32` of the same
    * string (the engine's one cross-engine hash) — any change here
    * must change the `ann_lsh_pairs` oracle and the HOF
    * [[graft.ops.Similarity.signature]] twin in lockstep. */
  def coefAt(t: Int, j: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hp:$t:$j:$i".getBytes("UTF-8"))
    val v = ((d(0) & 255L) << 24) | ((d(1) & 255L) << 16) |
      ((d(2) & 255L) << 8) | (d(3) & 255L)
    (v % 1000000L).toDouble / 1000000.0 - 0.5
  }

  /** Column-level entry point: array of nTables signature longs. */
  def apply(e: Column, nBits: Int, nTables: Int): Column =
    ColumnBridge.column(
      HyperplaneSigs(ColumnBridge.expression(e), nBits, nTables))
}
