package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Asymmetric distance between a full-precision query vector and a
  * 1-bit-per-dim sign code's lattice centroid (±0.25 per dim), the PQ/ADC
  * scoring kernel of `sim_pq_adc_topk`:
  *
  *   adc = Σ_k (q[k] − (bit_k(code) ? 0.25 : −0.25))²
  *
  * where bit k < 32 reads word `lo`, bit k ≥ 32 reads word `hi` (two
  * 32-bit words so no term ever touches the long sign bit). The fold runs
  * k = 0..n−1 SEQUENTIALLY — bit-identical to the SQL higher-order
  * `aggregate(sequence(...))` formulation, so the DuckDB oracle is
  * unchanged; a spec asserts the equivalence. Native + `doGenCode` for
  * the same reason as [[CosineSim]]: the ranked scan evaluates this once
  * per (query, code) pair, and the fused loop beats the HOF's per-element
  * lambda dispatch by roughly an order of magnitude.
  */
case class AdcDist(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = DoubleType

  private lazy val qvIsFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"adc_dist query side requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  // type check runs post-resolution (a constructor require would fire on
  // unresolved children during analysis)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (f, s, t) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"adc_dist requires (ARRAY<FLOAT|DOUBLE>, BIGINT, BIGINT), got (${f.sql}, ${s.sql}, ${t.sql})")
    }

  // a NULL array element propagates to a NULL distance — the same
  // semantics as the HOF fold (acc + (NULL - c)² = NULL) and DuckDB's
  // list_sum, so the bit-identity claim covers nullable arrays too
  override def nullable: Boolean = true

  override def nullSafeEval(qv: Any, lo: Any, hi: Any): Any =
    AdcDist.computeBoxed(qv.asInstanceOf[ArrayData],
      lo.asInstanceOf[Long], hi.asInstanceOf[Long], qvIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, lo, hi) => s"""
      java.lang.Double ${ev.value}_r =
        graft.functions.AdcDist.computeBoxed($q, $lo, $hi, $qvIsFloat);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }""")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): AdcDist =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "adc_dist"
}

object AdcDist {
  /** Boxed result: null iff any array element is null (matching the HOF
    * fold and DuckDB list_sum, which both propagate NULL).
    */
  def computeBoxed(qv: ArrayData, lo: Long, hi: Long,
      qvIsFloat: Boolean): java.lang.Double = {
    val n = qv.numElements()
    // two 64-bit code words span exactly 64 dims; past that the JVM's
    // mod-64 shift would silently RECYCLE bits 0..63 — garbage distances
    // dressed as numbers. Loud failure, like the codebase's other kernels.
    require(n <= 64,
      s"adc_dist: query vector has $n dims; the 2x64-bit sign code covers at most 64")
    var acc = 0.0
    var k = 0
    while (k < n) {
      if (qv.isNullAt(k)) return null
      val q = if (qvIsFloat) qv.getFloat(k).toDouble else qv.getDouble(k)
      val bit = if (k < 32) (lo >> k) & 1L else (hi >> (k - 32)) & 1L
      val d = q - (if (bit == 1L) 0.25 else -0.25)
      acc += d * d
      k += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
