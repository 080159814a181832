package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming faces of the dedup operators — the shapes an ingest pipeline
 * needs when documents arrive as a stream rather than a static corpus.
 *
 * Two complementary guarantees:
 *  - [[exactDedup]]: declarative, per-record, state bounded by the
 *    event-time watermark (Structured Streaming owns the digest state).
 *  - [[startGatedIngest]]: per micro-batch, against the FULL historical
 *    corpus via its persisted signature index ([[Dedup.signatureIndex]]).
 *    foreachBatch because the gate is a batch plan (bucket join +
 *    anti-join); micro-batch-vs-corpus is exactly how large training
 *    pipelines run ingest dedup — the corpus index lives on disk and each
 *    batch pays one bucket-join against it, never a rescan of history.
 */
object StreamingDedup {

  /**
   * Exact streaming dedup: drop any record whose content digest was
   * already seen within the watermark delay. State (one md5 per distinct
   * doc) is evicted once the watermark passes — bounded memory at any
   * rate. Corpus-wide exactness across all time needs [[Dedup.exact]] on
   * the stored table or the corpus gate; this is the in-flight guard
   * (duplicate submissions, replayed batches).
   */
  def exactDedup(
      stream: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      textCol: String = "text"
  ): DataFrame =
    stream
      .withColumn("__digest", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /**
   * Ingest-time near-dup gating: every micro-batch is first deduplicated
   * WITHIN itself (two near-dup copies arriving together keep one
   * representative — [[Dedup.deduplicated]]) and then gated against the
   * corpus signature index with [[Dedup.gateAgainstCorpus]]; the
   * surviving rows are handed to `sink` (append to the warehouse, …) and —
   * this is the loop that makes the gate correct over time — their
   * signatures are APPENDED to the index at `indexPath`, so a near-dup of
   * a doc accepted three batches ago is caught even though that doc was
   * never in the original corpus. The index is re-read from `indexPath`
   * at the START of each batch (a parquet DataFrame freezes its file
   * listing at creation, so a captured frame would never see the appends).
   *
   * The gate's `numHashes/bands/shingleK/maxBucket` MUST match the
   * parameters the index at `indexPath` was built with
   * ([[Dedup.signatureIndex]] / [[Dedup.gateAgainstCorpus]] contract) —
   * mismatched params mean buckets never collide and everything passes.
   * A missing/empty `indexPath` is a cold start: the first batch gates
   * only against itself and seeds the index.
   *
   * Failure semantics: foreachBatch side effects are at-least-once — a
   * crash between the index append and the checkpoint commit replays the
   * batch, leaving duplicate `(id, sh, sig)` rows in the index. That is
   * safe for gating (candidate pairs dedupe on bare ids before the
   * verify) and the replayed batch's docs now match their own index rows,
   * so the replay emits nothing downstream — the gate is idempotent.
   * Set `dedupWithinBatch = false` when the producer already guarantees
   * distinct batches; `extendIndex = false` restores the static-corpus
   * gate (e.g. when a separate compaction job owns index growth).
   */
  def startGatedIngest(
      stream: DataFrame,
      indexPath: String,
      threshold: Double,
      checkpointDir: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3,
      maxBucket: Int = 1000,
      textCol: String = "text",
      idCol: String = "doc_id",
      triggerMs: Long = 1000L,
      dedupWithinBatch: Boolean = true,
      extendIndex: Boolean = true
  )(sink: DataFrame => Unit): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark    = batch.sparkSession
        val internal = if (dedupWithinBatch) Dedup.deduplicated(batch, threshold) else batch
        // fresh listing every batch — prior batches' appends must be visible
        val accepted = loadIndex(spark, indexPath) match {
          case Some(idx) =>
            Dedup.gateAgainstCorpus(internal, idx, threshold,
              numHashes, bands, shingleK, maxBucket, textCol, idCol)
          case None => internal // cold start: nothing to gate against yet
        }
        // accepted feeds BOTH the sink and the index append — materialize
        // once so the gate plan (bucket join + verify) doesn't run twice
        val mat = accepted.localCheckpoint(true)
        if (extendIndex)
          Dedup.signatureIndex(mat, numHashes, shingleK, textCol, idCol)
            .write.mode("append").parquet(indexPath)
        sink(mat)
        ()
      }
      .start()

  /** The index at `path`, or None when it doesn't exist yet (cold start).
    * Existence is checked through the Hadoop FS API so any scheme the
    * session can read works, not just local files. */
  private def loadIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String
  ): Option[DataFrame] = {
    val p  = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(path)) else None
  }
}
