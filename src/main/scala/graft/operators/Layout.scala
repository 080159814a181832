package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional DATA LAYOUT for scan pruning — the missing third leg
 * next to time partitioning (`shard=` directories) and hash bucketing
 * ([[Bucketed]]): Z-ORDER (Morton) clustering. Sorting a table by one
 * column makes that column's per-file min/max ranges tight and every
 * other column's ranges useless; interleaving the bits of TWO filter
 * columns into one sort key makes BOTH columns' per-file ranges tight
 * simultaneously, so parquet row-group min/max statistics prune scans for
 * predicates on either column (or both). At 100 TB this is the difference
 * between "skip 15/16 of the files" and "read everything" for the second
 * filter column.
 *
 * The key is pure exact integer bit arithmetic — deterministic, codegen'd,
 * engine-portable — so both the layout decision and the skipping evidence
 * are oracle-checkable.
 */
object Layout {

  /**
   * MORTON KEY: interleave the low `bits` bits of `x` and `y` (x on even
   * positions, y on odd) into one long. Points close in BOTH dimensions
   * land close on the key (the Z space-filling curve), which is exactly
   * what makes range-partitioning on it produce bounded boxes. Inputs
   * must be non-negative and fit `bits` bits — values beyond that alias
   * (mask semantics, documented, same on both engines).
   */
  def mortonKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { b =>
      shiftleft(shiftright(x.cast("long"), b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(shiftleft(shiftright(y.cast("long"), b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** the same interleave as runnable SQL (shared by [[graft.OracleGen]]). */
  def mortonSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { b =>
      s"(((($x >> $b) & 1) << ${2 * b}) | ((($y >> $b) & 1) << ${2 * b + 1}))"
    }.mkString("(", " | ", ")")

  /**
   * Z-ORDER LAYOUT: range-partition on the Morton key of `(xCol, yCol)`
   * and sort within partitions — the write-side clustering step before a
   * parquet write (each output file then covers one bounded box of the
   * (x, y) plane, and row-group min/max prunes on both columns).
   * Range-bound SAMPLING makes the partition cut points
   * non-deterministic run to run; the LAYOUT is an optimization, not a
   * semantics — readers never depend on which file a row landed in.
   */
  def zorderBy(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 16,
      partitions: Int = 0
  ): DataFrame = {
    val key = mortonKey(col(xCol), col(yCol), bits).as("__z")
    val keyed = df.withColumn("__z", key)
    val parted =
      if (partitions > 0) keyed.repartitionByRange(partitions, col("__z"))
      else keyed.repartitionByRange(col("__z"))
    parted.sortWithinPartitions(col("__z")).drop("__z")
  }

  /**
   * SKIPPING EVIDENCE: cut the Morton keyspace into `nBuckets` fixed
   * equal slices (a deterministic stand-in for "files") and report each
   * slice's row count and its bounding box on BOTH source columns. Tight
   * boxes on both axes ARE the data-skipping win — this is the report a
   * layout decision reads, and it is exact-integer end to end.
   */
  def zorderBuckets(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 16,
      nBuckets: Int = 16
  ): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val keyspace = 1L << (2 * bits)
    require(nBuckets <= keyspace,
      s"nBuckets ($nBuckets) must be <= 4^bits ($keyspace) or slices would be empty")
    // ceil-division: every key lands in [0, nBuckets), even when nBuckets
    // does not divide the keyspace (floor would push top keys to bucket == nBuckets)
    val span = (keyspace + nBuckets - 1) / nBuckets
    df.select(col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"),
        mortonKey(col(xCol), col(yCol), bits).as("__z"))
      .groupBy(expr(s"__z div ${span}L").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__x")).as("x_min"), max(col("__x")).as("x_max"),
        min(col("__y")).as("y_min"), max(col("__y")).as("y_max"))
  }
}
