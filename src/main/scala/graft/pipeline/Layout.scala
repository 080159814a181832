package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data layout: Z-ORDER (Morton-curve) clustering so that
 * filters on EITHER of two columns prune files and row groups.
 *
 * A single-column sort gives perfect pruning on that column and none on any
 * other; at 100 TB a corpus is queried along several axes (events by time
 * AND by user, documents by source AND by length). Interleaving the bits of
 * two bucketized sort keys places rows so every file covers a small
 * rectangle of the (a, b) space — parquet's per-row-group min/max stats
 * then skip most files for a range predicate on either axis (the classic
 * Delta/Databricks Z-ORDER layout, built here from plain codegen'd bit
 * arithmetic — no engine support needed).
 *
 * Everything is one pass: a 1-row min/max aggregate, then
 * `repartitionByRange` on the z-value (one range shuffle, the same cost as
 * the sort a compaction already pays) and a per-partition sort.
 */
object Layout {

  private val Bits = 16 // 16 bits per axis -> 32-bit z-values

  /** bit-spread of the low 16 bits of `x` to even positions (binary
    * magic numbers — four mask-and-shift rounds, all codegen'd). */
  private def spread(x: Column): Column = {
    val s1 = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton z-value of two 16-bit bucket columns: bit i of `a` lands at
    * position 2i+1, bit i of `b` at position 2i. */
  def zValue(a: Column, b: Column): Column =
    spread(a.cast("long")) * 2 + spread(b.cast("long"))

  /** linear bucketization of a numeric column to `[0, 2^16)` given its
    * min/max (equal min/max collapses to bucket 0). */
  def bucketize(c: Column, mn: Double, mx: Double): Column =
    if (mx > mn)
      least(lit((1L << Bits) - 1),
        floor((c.cast("double") - lit(mn)) / lit(mx - mn) * lit((1L << Bits) - 1)).cast("long"))
    else lit(0L)

  /**
   * Write `df` as `numFiles` parquet files z-ordered on `(colA, colB)`:
   * one 1-row min/max aggregate, one range shuffle on the z-value, one
   * per-partition sort — after which a range filter on EITHER column
   * touches only the files whose rectangle intersects it (verified by the
   * spec against per-file min/max spans vs a single-column sort).
   */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      numFiles: Int
  ): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    val s = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).collect()(0)
    require(!s.isNullAt(0) && !s.isNullAt(2), "z-order columns must be non-null numeric")
    val z = zValue(
      bucketize(col(colA), s.getDouble(0), s.getDouble(1)),
      bucketize(col(colB), s.getDouble(2), s.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
