package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/**
 * Native signature kernels for the dedup operators. The HOF formulations
 * (`transform` + `array_min` / 64 × `aggregate`) evaluate an interpreted
 * lambda per array element — for a minhash signature that is
 * `numHashes × |shingles|` lambda invocations per document. These
 * expressions run the same arithmetic as tight generated loops.
 */

/**
 * MinHash signature over a hashed-shingle array: for each permutation i,
 * `min over shingles of floorMod(floorMod(h, P) * a_i + b_i, P)` with
 * P = 2^31-1 — value-identical to the HOF version in
 * [[graft.pipeline.Dedup.minhashSignature]].
 */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {

  private val P = 2147483647L // 2^31 - 1

  // deterministic permutation parameters — MUST stay in sync with
  // Dedup.mhParams (same seed, same generator sequence)
  @transient private lazy val perms: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(numHashes)((1L + rnd.nextInt(Int.MaxValue - 1).toLong, rnd.nextInt(Int.MaxValue).toLong))
  }
  @transient private lazy val as: Array[Long] = perms.map(_._1)
  @transient private lazy val bs: Array[Long] = perms.map(_._2)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"graft_minhash requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n   = arr.numElements()
    val acc = Array.fill(numHashes)(Long.MaxValue)
    var i   = 0
    while (i < n) {
      val base = java.lang.Math.floorMod(arr.getLong(i), P)
      var j = 0
      while (j < numHashes) {
        val x = java.lang.Math.floorMod(base * as(j) + bs(j), P)
        if (x < acc(j)) acc(j) = x
        j += 1
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, in => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val base = ctx.freshName("base"); val x = ctx.freshName("x")
      s"""
         |final int $n = $in.numElements();
         |final long[] $acc = new long[$numHashes];
         |java.util.Arrays.fill($acc, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $base = java.lang.Math.floorMod($in.getLong($i), ${P}L);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    final long $x = java.lang.Math.floorMod($base * $aRef[$j] + $bRef[$j], ${P}L);
         |    if ($x < $acc[$j]) $acc[$j] = $x;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/**
 * 64-bit SimHash signature over a word-hash array: bit b = 1 iff the sum
 * of ±1 (bit b of each hash set / clear) is positive — value-identical to
 * the 64-aggregate HOF version.
 */
case class SimHashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"graft_simhash requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n   = arr.numElements()
    val acc = new Array[Int](64)
    var i   = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    new GenericArrayData(acc.map(s => if (s > 0) 1 else 0))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |final int $n = $in.numElements();
         |final int[] $acc = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $in.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $acc[$b]++; else $acc[$b]--;
         |  }
         |}
         |final int[] $out = new int[64];
         |for (int $b = 0; $b < 64; $b++) $out[$b] = $acc[$b] > 0 ? 1 : 0;
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
