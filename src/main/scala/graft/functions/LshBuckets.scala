package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** One-pass multi-table LSH bucket kernel (see [[LshBuckets]]). */
object LshKernel extends Serializable {

  /**
   * All per-table sign buckets of one vector in a single traversal.
   * `planesFlat` is `tables × k × dim` doubles, row-major
   * `[table][plane][component]`; bucket of table t packs bit j =
   * (sequential-fold dot(vec, plane_{t,j}) > 0), identical per bit to the
   * portable HOF form [[graft.pipeline.Similarity.lshBucket]] and to a
   * per-plane [[DotProduct]] (same order, same double arithmetic, null
   * elements contribute 0, common-prefix length semantics).
   */
  def buckets(vec: ArrayData, isFloat: Boolean, planesFlat: Array[Double], k: Int, dim: Int): ArrayData = {
    val tables = planesFlat.length / (k * dim)
    val m      = math.min(vec.numElements(), dim)
    // vector is materialized once — each of the tables×k dots then reads
    // primitive locals instead of re-traversing the unsafe array payload
    val v = new Array[Double](m)
    var i = 0
    while (i < m) {
      v(i) = if (vec.isNullAt(i)) 0.0 else if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var b = 0L
      var j = 0
      while (j < k) {
        val off = (t * k + j) * dim
        var s   = 0.0
        var c   = 0
        while (c < m) { s += v(c) * planesFlat(off + c); c += 1 }
        if (s > 0) b |= 1L << j
        j += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }
}

/**
 * Native multi-table LSH bucketing: `array<long>` of one sign-bucket per
 * hash table, computed in one pass over the vector.
 *
 * Rationale: building `tables` bucket columns from per-plane dot products
 * (even native ones) makes the projection a `tables × planes`-expression
 * tree — at 12 tables × 7 planes that is 84 separate array traversals per
 * row and a plan Catalyst spends seconds optimizing/codegen'ing. This
 * expression collapses the whole bucketing stage into ONE node: the vector
 * is read once, all dots accumulate over primitive locals, and plan size
 * is independent of the table/plane counts (which [[graft.pipeline.Similarity.planesFor]]
 * grows with the corpus).
 */
case class LshBuckets(child: Expression, planesFlat: Array[Double], k: Int, dim: Int)
    extends UnaryExpression {

  require(k >= 1 && dim >= 1 && planesFlat.length % (k * dim) == 0,
    s"planesFlat length ${planesFlat.length} must be a multiple of k*dim = ${k * dim}")

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_buckets requires array<float|double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  override protected def nullSafeEval(v: Any): Any =
    LshKernel.buckets(v.asInstanceOf[ArrayData], isFloat, planesFlat, k, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("lshKernel", LshKernel, LshKernel.getClass.getName)
    val planes = ctx.addReferenceObj("planesFlat", planesFlat, "double[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $kernel.buckets($in, $isFloat, $planes, $k, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
