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
   * surviving rows are handed to `sink` (append to the warehouse, extend
   * the index, …). Exactly-once per batch via the checkpoint, like
   * [[graft.streaming.Ingest]]. Set `dedupWithinBatch = false` when the
   * producer already guarantees distinct batches.
   */
  def startGatedIngest(
      stream: DataFrame,
      corpusIndex: DataFrame,
      threshold: Double,
      checkpointDir: String,
      triggerMs: Long = 1000L,
      dedupWithinBatch: Boolean = true
  )(sink: DataFrame => Unit): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val internal = if (dedupWithinBatch) Dedup.deduplicated(batch, threshold) else batch
        sink(Dedup.gateAgainstCorpus(internal, corpusIndex, threshold))
        ()
      }
      .start()
}
