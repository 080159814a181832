package graft.pipeline

import graft.pipeline.Checkpoints.PinOps
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
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
 *    corpus via its persisted signature index ([[Dedup.signatureIndex]])
 *    and the persisted CAPPED band relation ([[Dedup.bandedIndex]]) kept
 *    beside it. foreachBatch because the gate is a batch plan (bucket
 *    join + anti-join); micro-batch-vs-corpus is exactly how large
 *    training pipelines run ingest dedup — both indexes live on disk,
 *    each batch pays one bucket join against the banded relation plus an
 *    id-keyed verify join against the signature index, and NEVER a
 *    corpus-wide aggregation: the bucket-count cap is computed once at
 *    index build time and each accepted batch appends its own
 *    `(id, band, bucket)` rows to the sidecar.
 */
object StreamingDedup {

  /** Where the capped band relation of the index at `indexPath` lives —
    * one sidecar directory next to the signature index, extended in
    * lockstep with it. */
  def bandedPathFor(indexPath: String): String = s"${indexPath}_banded"

  /** Build parameters a gated index's sidecar was created with — what a
    * periodic re-cap ([[compactSidecars]]) needs to rebuild it. */
  final case class SidecarSpec(numHashes: Int, bands: Int, maxBucket: Int)

  // gated indexes whose sidecars erode (accepted batches append un-capped
  // rows) — [[startGatedIngest]] registers, [[compactSidecars]] sweeps.
  private val capRegistry = new java.util.concurrent.ConcurrentHashMap[String, SidecarSpec]()

  // serializes a sidecar's per-batch appends against its compaction swap
  // IN THIS JVM (the single-driver deployment model: the stream's
  // micro-batches and the Maintenance sweep share the driver). Without it
  // a batch appending between the compactor's snapshot read and its
  // delete+rename loses those rows — near-dups of that batch would pass
  // the gate until the next sweep. Cross-JVM compaction coordination is
  // out of scope (run Maintenance in the ingesting driver).
  private val sidecarLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def sidecarLock(indexPath: String): Object =
    sidecarLocks.computeIfAbsent(indexPath, _ => new Object)

  // (file count, total bytes) of each banded dir at its last re-cap: an
  // unchanged summary means no batch appended since — skip the
  // corpus-wide rebuild instead of paying it forever for stopped streams.
  private val lastCompacted = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  /** Register `indexPath` for periodic sidecar re-capping (automatic from
    * [[startGatedIngest]] when it extends the index). Idempotent. */
  def registerForCompaction(indexPath: String, numHashes: Int, bands: Int, maxBucket: Int): Unit =
    capRegistry.put(indexPath, SidecarSpec(numHashes, bands, maxBucket))

  /** Drop `indexPath` from the compaction sweep (e.g. after the owning
    * stream is permanently stopped and the index archived). */
  def unregisterFromCompaction(indexPath: String): Unit = capRegistry.remove(indexPath)

  /** Paths currently registered for sidecar re-capping. */
  def registeredForCompaction: Seq[String] = {
    import scala.jdk.CollectionConverters._
    capRegistry.keySet().asScala.toSeq.sorted
  }

  /**
   * Re-apply the bucket-count cap to every registered banded sidecar —
   * the compaction-time counterpart of the gate's per-batch appends: the
   * cap is enforced when a sidecar is BUILT ([[Dedup.bandedIndex]]), but
   * each accepted batch appends its own `(id, band, bucket)` rows
   * un-capped, so a bucket that grows hot purely from accepted batches
   * degrades candidate pruning until re-capped here. Mirrors the
   * reference's periodic retention check
   * (`nsdb-cluster/.../MetadataCoordinator.scala:83-84,198`): wired into
   * `Maintenance.runOnce`, it pays the corpus-wide bucket count ONCE per
   * sweep per index — exactly the aggregation the per-batch path must
   * never run.
   *
   * The rebuilt sidecar is written to a temp directory and swapped in via
   * FS rename; the per-index lock (see `sidecarLocks`) serializes the
   * whole snapshot→rebuild→swap against the stream's per-batch appends,
   * so no accepted batch's band rows can land between the snapshot and
   * the swap and be silently discarded. Readers outside the lock either
   * see the old capped relation or — in the brief swap window — find the
   * path missing and self-heal from the signature index. A sidecar whose
   * file summary is unchanged since its last re-cap is skipped, so a
   * stopped stream stops costing corpus-wide rebuilds. One compactor per
   * index at a time (Maintenance's single sweep thread satisfies this).
   *
   * Returns `(recappedCount, errors)`; one index's failure never aborts
   * the sweep for the rest.
   */
  def compactSidecars(spark: SparkSession): (Int, Seq[String]) = {
    import scala.jdk.CollectionConverters._
    var ok = 0
    val errors = Seq.newBuilder[String]
    capRegistry.asScala.toSeq.sortBy(_._1).foreach { case (indexPath, spec) =>
      try {
        // the lock pins out concurrent extendIndexes appends for the whole
        // snapshot-read → rebuild → swap sequence (see sidecarLocks)
        sidecarLock(indexPath).synchronized {
          loadIndex(spark, indexPath) match {
            case None => () // index gone or not yet seeded — nothing to re-cap
            case Some(idx) =>
              val banded  = bandedPathFor(indexPath)
              val bPath   = new org.apache.hadoop.fs.Path(banded)
              val fs      = bPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
              def summary: (Long, Long) =
                if (!fs.exists(bPath)) (0L, 0L)
                else { val s = fs.getContentSummary(bPath); (s.getFileCount, s.getLength) }
              if (lastCompacted.get(indexPath) == summary) () // no appends since last re-cap
              else {
                val tmp = s"$banded._compacting"
                Dedup.bandedIndex(idx, spec.numHashes, spec.bands, spec.maxBucket)
                  .write.mode("overwrite").parquet(tmp)
                fs.delete(bPath, true)
                if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), bPath))
                  throw new java.io.IOException(
                    s"rename $tmp -> $banded failed; sidecar left for self-heal")
                lastCompacted.put(indexPath, summary)
                ok += 1
              }
          }
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          errors += s"sidecar re-cap $indexPath: ${e.getMessage}"
      }
    }
    (ok, errors.result())
  }

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
   * signatures AND band buckets are APPENDED to the two index directories,
   * so a near-dup of a doc accepted three batches ago is caught even
   * though that doc was never in the original corpus. Both indexes are
   * re-read from their paths at the START of each batch (a parquet
   * DataFrame freezes its file listing at creation, so a captured frame
   * would never see the appends).
   *
   * Scale shape per trigger: one bucket join of the (tiny) batch band
   * relation against the persisted banded sidecar, one id-keyed join
   * against the signature index for the Jaccard verify — no corpus-wide
   * groupBy, ever. The `maxBucket` cap is enforced when the sidecar is
   * BUILT ([[Dedup.bandedIndex]]); appended batch rows are not re-capped,
   * so a bucket that grows hot purely from accepted batches degrades the
   * candidate count gradually until the next rebuild — re-run
   * [[Dedup.bandedIndex]] over the signature index periodically
   * (compaction time) to re-apply the cap. An index created before the
   * sidecar existed self-heals: the first batch derives the capped
   * relation from the signature index (paying the corpus-wide bucket
   * count once), persists it, and every later batch reads it back.
   *
   * The gate's `numHashes/bands/shingleK/maxBucket` MUST match the
   * parameters the indexes at `indexPath`/the sidecar were built with
   * ([[Dedup.signatureIndex]] / [[Dedup.gateAgainstCorpus]] contract) —
   * mismatched params mean buckets never collide and everything passes.
   * A missing/empty `indexPath` is a cold start: the first batch gates
   * only against itself and seeds both indexes.
   *
   * Failure semantics: foreachBatch side effects are at-least-once. The
   * sink runs BEFORE the index appends — a crash anywhere before the
   * checkpoint commit replays the batch, and because the gate re-reads
   * the index, a replay whose appends already landed matches its own
   * rows and emits nothing new downstream; a replay that crashed before
   * the appends re-delivers the same accepted rows to the sink (dedupe
   * downstream on id if the sink is not idempotent). Accepted docs are
   * therefore never silently lost: downstream is at-least-once, the index
   * at-least-once with duplicate `(id, sh, sig)` rows tolerated (candidate
   * pairs dedupe on bare ids before the verify).
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
  )(sink: DataFrame => Unit): StreamingQuery = {
    // an extending gate erodes its sidecar's cap — enroll it in the
    // periodic re-cap sweep (Maintenance.runOnce → compactSidecars)
    if (extendIndex) registerForCompaction(indexPath, numHashes, bands, maxBucket)
    stream.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val mat = gateBatch(batch, indexPath, threshold,
          numHashes, bands, shingleK, maxBucket, textCol, idCol, dedupWithinBatch)
        // sink FIRST: downstream delivery is at-least-once even if the
        // index appends never run (a crash here replays the batch; the
        // gate then re-accepts the same rows because its signatures are
        // not yet in the index)
        sink(mat)
        if (extendIndex) extendIndexes(mat, indexPath, numHashes, bands, shingleK, textCol, idCol)
        // the batch pin is dead once sink + appends ran — free it NOW: a
        // 24/7 stream otherwise accumulates one checkpointed frame per
        // trigger until GC + ContextCleaner catch up
        Checkpoints.free(mat)
        ()
      }
      .start()
  }

  /**
   * One micro-batch through the gate (exposed for plan-level tests):
   * intra-batch dedup, then the corpus gate against the persisted
   * signature index + banded sidecar at `indexPath`. Returns the accepted
   * rows MATERIALIZED (`localCheckpoint`) so the caller's sink and index
   * appends don't re-run the gate plan.
   */
  def gateBatch(
      batch: DataFrame,
      indexPath: String,
      threshold: Double,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3,
      maxBucket: Int = 1000,
      textCol: String = "text",
      idCol: String = "doc_id",
      dedupWithinBatch: Boolean = true
  ): DataFrame = {
    val spark    = batch.sparkSession
    val internal = if (dedupWithinBatch) Dedup.deduplicated(batch, threshold, idCol) else batch
    // fresh listing every batch — prior batches' appends must be visible
    val accepted = loadIndex(spark, indexPath) match {
      case Some(idx) =>
        // persisted capped band relation: the per-batch plan joins it
        // directly. A legacy index without the sidecar self-heals: the
        // capped relation is derived ONCE (the one corpus-wide bucket
        // count), persisted, and every later batch reads it back.
        val banded = loadIndex(spark, bandedPathFor(indexPath)).getOrElse {
          val built = Dedup.bandedIndex(idx, numHashes, bands, maxBucket)
          built.write.mode("overwrite").parquet(bandedPathFor(indexPath))
          spark.read.parquet(bandedPathFor(indexPath))
        }
        Dedup.gateAgainstCorpus(internal, idx, threshold,
          numHashes, bands, shingleK, maxBucket, textCol, idCol, corpusBanded = Some(banded))
      case None => internal // cold start: nothing to gate against yet
    }
    // accepted feeds the sink and BOTH index appends — materialize once
    accepted.pinned
  }

  /** Append the accepted batch's signatures and band buckets to the two
    * index directories — the closed loop that keeps future batches gated
    * against everything accepted so far without any corpus rescan. */
  private def extendIndexes(
      mat: DataFrame,
      indexPath: String,
      numHashes: Int,
      bands: Int,
      shingleK: Int,
      textCol: String,
      idCol: String
  ): Unit = {
    // one signature computation feeds both writes
    val sigs = Dedup.signatureIndex(mat, numHashes, shingleK, textCol, idCol).pinned
    // both appends ride the sidecar lock so a concurrent compaction swap
    // can never discard this batch's band rows (see sidecarLocks)
    sidecarLock(indexPath).synchronized {
      sigs.write.mode("append").parquet(indexPath)
      Dedup.bandRelation(sigs, numHashes, bands)
        .write.mode("append").parquet(bandedPathFor(indexPath))
    }
    Checkpoints.free(sigs) // both writes done — release the per-batch pin
  }

  /**
   * Embedding twin of [[startGatedIngest]]: every micro-batch of vectors
   * is deduplicated within itself ([[Similarity.deduplicated]]), gated
   * against the persisted LSH vector index ([[Similarity.vectorIndex]]
   * parquet at `indexPath`) with [[Similarity.gateAgainstCorpus]], handed
   * to `sink`, and — the closed loop — the accepted vectors' index rows
   * are appended so a near-duplicate of a vector accepted batches ago is
   * still caught. Cold start (missing/unreadable `indexPath`) gates the
   * first batch only against itself and seeds the index.
   *
   * Contract and failure semantics mirror the text gate exactly:
   * `planesPerTable`/`tables` (and the data's dimensionality) MUST match
   * the index build; sink-before-append makes downstream at-least-once
   * with duplicate index rows tolerated on replay (candidates dedupe on
   * bare ids before the cosine verify). Per-trigger cost: one kernel pass
   * over the batch + one bucket join against the index — never a
   * corpus-wide aggregation (the vector index has no bucket-count cap to
   * maintain, so no sidecar is needed).
   */
  def startVectorGatedIngest(
      stream: DataFrame,
      indexPath: String,
      threshold: Double,
      checkpointDir: String,
      planesPerTable: Int = 6,
      tables: Int = 8,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      triggerMs: Long = 1000L,
      dedupWithinBatch: Boolean = true,
      extendIndex: Boolean = true
  )(sink: DataFrame => Unit): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val mat = gateVectorBatch(batch, indexPath, threshold,
          planesPerTable, tables, vecCol, idCol, dedupWithinBatch)
        sink(mat) // sink FIRST: at-least-once downstream (see text gate)
        if (extendIndex)
          Similarity.vectorIndex(mat, planesPerTable, tables, vecCol = vecCol, idCol = idCol)
            .write.mode("append").parquet(indexPath)
        Checkpoints.free(mat) // per-trigger pin released (see text gate)
        ()
      }
      .start()

  /** One vector micro-batch through the gate (exposed for tests):
    * intra-batch near-dup dedup, then the corpus gate against the
    * persisted vector index. Accepted rows come back MATERIALIZED. */
  def gateVectorBatch(
      batch: DataFrame,
      indexPath: String,
      threshold: Double,
      planesPerTable: Int = 6,
      tables: Int = 8,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      dedupWithinBatch: Boolean = true
  ): DataFrame = {
    val spark = batch.sparkSession
    val internal =
      if (dedupWithinBatch)
        Similarity.deduplicated(batch, threshold, planesPerTable, tables, vecCol = vecCol, idCol = idCol)
      else batch
    val accepted = loadIndex(spark, indexPath) match {
      case Some(idx) =>
        Similarity.gateAgainstCorpus(internal, idx, threshold,
          planesPerTable, tables, vecCol = vecCol, idCol = idCol)
      case None => internal // cold start: nothing to gate against yet
    }
    accepted.pinned
  }

  /** The index at `path`, or None when it doesn't exist yet (cold start)
    * or holds no readable parquet data (e.g. only a `_temporary` left by
    * a crashed first append — schema inference fails, which must recover
    * as a cold start, not poison every subsequent batch). Existence is
    * checked through the Hadoop FS API so any scheme the session can read
    * works, not just local files. */
  private def loadIndex(
      spark: SparkSession,
      path: String
  ): Option[DataFrame] = {
    val p  = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else
      Try(spark.read.parquet(path)) match {
        case Success(df)                    => Some(df)
        case Failure(_: AnalysisException) => None // unreadable ⇒ cold start
        case Failure(other)                 => throw other
      }
  }
}
