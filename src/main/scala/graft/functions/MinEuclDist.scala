package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** One-pass min-Euclidean-distance kernel (see [[MinEuclDist]]). */
object MinEuclKernel extends Serializable {

  /**
   * Minimum Euclidean distance from `vec` to any center in `centsFlat`
   * (row-major, `centsFlat.length / dim` centers). Arithmetic replicates
   * the `least(sqrt(aggregate(zip_with(v, c, (x,y) → (x−y)²), 0.0,
   * acc+e))...)` chain it replaces exactly: per center a SEQUENTIAL
   * left-fold of `(x_i − y_i)²` in element order starting from 0.0 (the
   * identical IEEE sequence), one `Math.sqrt`, then the null-skipping
   * `least` fold over centers in center order. A center whose distance
   * the chain would evaluate to SQL NULL (length mismatch or a null
   * element — `zip_with` null-pads and the add-fold absorbs) is skipped,
   * exactly as `least` skips nulls; all centers null ⇒ SQL NULL.
   */
  def minDist(vec: ArrayData, isFloat: Boolean, centsFlat: Array[Double], dim: Int): java.lang.Double = {
    val nC = centsFlat.length / dim
    val n  = vec.numElements()
    var best: java.lang.Double = null
    var c = 0
    while (c < nC) {
      if (n == dim) {
        val off = c * dim
        var s = 0.0
        var ok = true
        var i = 0
        while (ok && i < dim) {
          if (vec.isNullAt(i)) ok = false
          else {
            val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
            val d = x - centsFlat(off + i)
            s += d * d
            i += 1
          }
        }
        if (ok) {
          val dist = math.sqrt(s)
          if (best == null || dist < best) best = dist
        }
      }
      c += 1
    }
    best
  }
}

/**
 * Native minimum Euclidean distance of a vector column to a literal
 * center set, one pass over the vector — replaces a `centers.size`-branch
 * `zip_with`/`aggregate` higher-order-function chain whose lambdas
 * evaluate INTERPRETED per element (per round of a greedy k-center
 * traversal that chain re-reads the vector once per center through
 * interpreted dispatch; this reads it once, compiled).
 */
case class MinEuclDist(child: Expression, centsFlat: Array[Double], dim: Int)
    extends UnaryExpression {

  require(dim >= 1 && centsFlat.length % dim == 0,
    s"centsFlat length ${centsFlat.length} must be a multiple of dim = $dim")

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_min_eucl requires array<float|double>, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_min_eucl"

  override protected def nullSafeEval(v: Any): Any =
    MinEuclKernel.minDist(v.asInstanceOf[ArrayData], isFloat, centsFlat, dim)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("minEuclKernel", MinEuclKernel, MinEuclKernel.getClass.getName)
    val cents  = ctx.addReferenceObj("centsFlat", centsFlat, "double[]")
    val boxed  = ctx.freshName("boxed")
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |java.lang.Double $boxed = $kernel.minDist($in, $isFloat, $cents, $dim);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
