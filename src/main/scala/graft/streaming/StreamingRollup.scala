package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Rollup

/**
 * Write-time rollup maintenance over a streaming ingest — the streaming
 * face of [[graft.operators.Rollup]], mirroring how the reference keeps
 * its facet indexes current as writes arrive (`AllFacetIndexes.scala:
 * 147-169`: every accumulated batch updates the pre-aggregated structures,
 * so serving reads never scan raw points).
 *
 * Log-structured, not read-modify-write: each micro-batch APPENDS its own
 * sufficient-statistics segment (`Rollup.build` of just that batch) to the
 * stats table; [[read]] merges segments at read time with the same
 * associative re-aggregation [[Rollup.merge]] uses, and [[compact]]
 * periodically folds the segment log back to one segment (rename-aside,
 * crash-safe like `Warehouse.compact`). No batch ever reads or rewrites
 * another batch's output, so maintenance never races the serving reads —
 * the property a 100 TB multi-writer ingest needs. Exactly-once note: with
 * the checkpoint, a replayed batch re-appends its segment; dedup by the
 * embedded `__batch` id on read makes replays idempotent.
 */
object StreamingRollup {

  /** Start maintaining `statsPath` from a raw event stream. */
  def maintain(
      stream: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      step: Long,
      statsPath: String,
      checkpointDir: String,
      flushIntervalMs: Long = 1000L
  ): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(flushIntervalMs))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Rollup.build(batch, keys, tsCol, valueCol, step)
          .withColumn("__batch", lit(batchId))
          .write.mode("append").parquet(statsPath)
        ()
      }
      .start()

  /** The merged stats table: segments re-aggregated, replayed batches
    * deduplicated (a crashed-then-replayed `foreachBatch` appends its
    * segment twice under the SAME batch id — keep one copy per (group,
    * batch), then fold across batches). */
  def read(spark: SparkSession, statsPath: String): DataFrame = {
    val raw = spark.read.parquet(statsPath)
    val groupCols = raw.columns.filterNot(Set("n", "vsum", "vmin", "vmax", "__batch")).toSeq
    val once = raw.groupBy((groupCols :+ "__batch").map(col): _*)
      .agg(
        first(col("n")).as("n"), first(col("vsum")).as("vsum"),
        first(col("vmin")).as("vmin"), first(col("vmax")).as("vmax"))
    Rollup.coalesceStats(once.drop("__batch"))
  }

  /** Fold the segment log to a single segment (bounded file count),
    * rename-aside like `Warehouse.compact`: write `.compact`, move the log
    * to `.old`, promote, delete `.old`. [[recover]] heals a crash at any
    * point in that sequence; run it before reading after a restart. */
  def compact(spark: SparkSession, statsPath: String): Unit = {
    recover(statsPath)
    val merged = read(spark, statsPath).withColumn("__batch", lit(-1L))
    val tmp = new java.io.File(statsPath + ".compact")
    val old = new java.io.File(statsPath + ".old")
    merged.write.mode("overwrite").parquet(tmp.getPath)
    require(new java.io.File(statsPath).renameTo(old), s"compact: move-aside failed for $statsPath")
    require(tmp.renameTo(new java.io.File(statsPath)), s"compact: promote failed for $statsPath")
    deleteRecursively(old)
  }

  /** Heal a crashed [[compact]]: a missing log with `.old` present means
    * the crash hit between the two renames — restore the old log; a stale
    * `.compact` is an incomplete write — drop it. */
  def recover(statsPath: String): Unit = {
    val dir = new java.io.File(statsPath)
    val old = new java.io.File(statsPath + ".old")
    if (!dir.exists() && old.exists()) { val _ = old.renameTo(dir) }
    else if (old.exists()) deleteRecursively(old)
    deleteRecursively(new java.io.File(statsPath + ".compact"))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }
}
