package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * Per-key Theil–Sen medians as ONE compiled pass over the collected grid
 * arrays — the kernel form of the estimator's two median selections.
 *
 * The distributed formulation materialized `C(points, 2)` pair rows per
 * key through a self-join and ranked them with a per-key window sort —
 * correct, but at bench scale the pair frame (~10⁶ rows) plus the sort
 * dominated the gate while the per-key work is BOUNDED by contract
 * (`maxPoints = 4096` ⇒ ≤ 8.4M slopes ≈ 64 MB scratch per key, the same
 * bound that capped the join). The kernels keep the exact arithmetic:
 *
 *  - every slope is the IDENTICAL IEEE division `(v_j − v_i)/(x_j − x_i)`
 *    over the same operand multiset (slopes are symmetric under pair
 *    reversal: `(−a)/(−b)` is bit-equal to `a/b`);
 *  - the median is the same positional selection the window ranked —
 *    1-indexed rows `(n+1) div 2 .. (n+2) div 2` of the VALUE-ascending
 *    order (`java.util.Arrays.sort(double[])` uses `Double.compare`, the
 *    exact ordering Spark's sort applies to DoubleType), summed then
 *    divided by the selected count — `x/1.0` or `(a+b)/2.0`, the very
 *    expressions `sum/count` evaluated;
 *  - degenerate inputs (< 2 points for slopes, empty for residuals)
 *    return NaN — callers filter `n_points >= 2` first, exactly the keys
 *    the old inner join against the pair frame kept.
 */
object TheilSenMedians {

  /** median of all pairwise slopes of `(xs(i), vs(i))` points (xs exact
    * longs, distinct per the resample-grid contract). */
  def slopesMedian(xs: ArrayData, vs: ArrayData): Double = {
    val n = xs.numElements()
    if (n < 2) return Double.NaN
    val m = n * (n - 1) / 2
    val s = new Array[Double](m)
    var k = 0
    var i = 0
    while (i < n) {
      val xi = xs.getLong(i)
      val vi = vs.getDouble(i)
      var j = i + 1
      while (j < n) {
        s(k) = (vs.getDouble(j) - vi) / (xs.getLong(j) - xi).toDouble
        k += 1
        j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(s)
    medianSorted(s)
  }

  /** median of the residuals `v_i − slope · x_i` (slope is the already
    * 6-dp-ROUNDED column, exactly as the windowed form consumed it). */
  def residMedian(xs: ArrayData, vs: ArrayData, slope: Double): Double = {
    val n = xs.numElements()
    if (n == 0) return Double.NaN
    val r = new Array[Double](n)
    var i = 0
    while (i < n) {
      r(i) = vs.getDouble(i) - slope * xs.getLong(i).toDouble
      i += 1
    }
    java.util.Arrays.sort(r)
    medianSorted(r)
  }

  /** 1-indexed positions `(n+1) div 2 .. (n+2) div 2` of the ascending
    * order, summed / count — the windowed `medianOf` selection verbatim. */
  private def medianSorted(a: Array[Double]): Double = {
    val n  = a.length
    val lo = (n - 1) / 2
    val hi = n / 2
    if (lo == hi) a(lo) / 1.0 else (a(lo) + a(hi)) / 2.0
  }
}

/** `graft_ts_slope_median(xs: array<long>, vs: array<double>) -> double` */
case class TheilSenSlopeMedian(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_ts_slope_median requires (array<bigint>, array<double>), got ${l.catalogString} / ${r.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_ts_slope_median"

  override protected def nullSafeEval(xs: Any, vs: Any): Any =
    TheilSenMedians.slopesMedian(xs.asInstanceOf[ArrayData], vs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, v) => s"graft.functions.TheilSenMedians.slopesMedian($x, $v)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_ts_resid_median(xs: array<long>, vs: array<double>, slope: double) -> double` */
case class TheilSenResidMedian(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_ts_resid_median requires (array<bigint>, array<double>, double), got " +
          s"${a.catalogString} / ${b.catalogString} / ${c.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_ts_resid_median"

  override protected def nullSafeEval(xs: Any, vs: Any, slope: Any): Any =
    TheilSenMedians.residMedian(
      xs.asInstanceOf[ArrayData], vs.asInstanceOf[ArrayData], slope.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, v, s) => s"graft.functions.TheilSenMedians.residMedian($x, $v, $s)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
