package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata; decode / feature-extract /
 * frame-sample are per-partition batch operations.
 *
 * The actual codec step is STUBBED (no image/audio libraries in this
 * environment): `decodeBatch` derives deterministic fake dimensions from
 * the payload bytes. Everything around it — schema, batching, partition
 * sizing, the explode shape for frame sampling — is the real pipeline.
 */
object Multimodal {

  /** schema of a decoded media record (what a real codec would emit). */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("channels", LongType)
  ))

  /**
   * Attach a binary payload column (UTF-8 bytes of the text stand in for
   * real media bytes) plus the container-level metadata a real ingest
   * would carry.
   */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("source").as("container"),
        octet_length(col("text")).as("n_bytes"),
        lit("raw/v1").as("format")
      ).as("media_meta")
    )

  /**
   * Content-hash dedup of binary assets: group byte-identical payloads by
   * SHA-256 and keep the smallest id as representative — the standard
   * first-line media dedup (exact byte copies re-crawled under different
   * ids) that runs BEFORE any decode. Real arithmetic, no stub: the hash,
   * grouping and counts are exactly what a production pipeline runs.
   * Map-side-combined single shuffle on the 32-byte digest; payload bytes
   * never shuffle (only the hash and id survive the projection).
   */
  def contentDedup(
      media: DataFrame,
      payloadCol: String = "payload",
      idCol: String = "doc_id"
  ): DataFrame =
    media
      .select(col(idCol), sha2(col(payloadCol), 256).as("content_hash"),
        octet_length(col(payloadCol)).cast("long").as("__nb"))
      .groupBy(col("content_hash"))
      .agg(
        min(col(idCol)).as(idCol),
        count(lit(1)).as("n_copies"),
        max(col("__nb")).as("n_bytes"))
      .select(col(idCol), col("content_hash"), col("n_copies"), col("n_bytes"))

  /**
   * Column-level metadata "decode": deterministic dimensions derived from
   * payload size. STUB — a real implementation would parse the codec
   * header; the arithmetic stands in so the pipeline shape (and its
   * oracle) is testable end-to-end.
   */
  def decodeMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      (lit(64) + pmod(octet_length(col("payload")), lit(193))).cast("long").as("width"),
      (lit(64) + pmod(octet_length(col("payload")) * 31, lit(177))).cast("long").as("height"),
      lit(3L).as("channels")
    )

  /**
   * AUDIO-ENERGY WINDOWS over the raw payload BYTES — per record, the
   * byte stream is treated as unsigned PCM8 samples, cut into
   * `window`-sample frames, and each frame scores its RMS energy around
   * the 128 midpoint plus an activity flag (`rms >= threshold`) — the
   * voice-activity-detection shape (silence trimming, speech/music
   * segmentation) every audio-curation pipeline runs before the
   * expensive model pass. Unlike the decode stubs this is REAL byte
   * arithmetic end to end: bytes extract natively
   * (`substring(binary) → hex → conv`, all codegen'd builtins — no UDF),
   * frame sums are exact integers, and the only float ops are one
   * divide + sqrt per frame — so the DuckDB oracle replays it exactly
   * from `hex(payload)`.
   *
   * Scale shape: row-local (no shuffle before the explode), output rows
   * = ceil(bytes/window) per record; payload bytes never shuffle — only
   * the per-frame sums survive the projection.
   */
  def audioEnergyWindows(
      media: DataFrame,
      window: Int = 256,
      threshold: Double = 40.0,
      payloadCol: String = "payload",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(window >= 1, "window must be >= 1")
    media
      .select(col(idCol),
        expr(s"transform(sequence(1, octet_length($payloadCol)), " +
          s"i -> cast(conv(hex(substring($payloadCol, i, 1)), 16, 10) AS INT))").as("__bs"))
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(__bs) / ${window}.0) AS INT) - 1), " +
          s"w -> slice(__bs, w * $window + 1, $window))")).as(Seq("window_idx", "__fr")))
      .select(col(idCol), col("window_idx").cast("long").as("window_idx"),
        size(col("__fr")).cast("long").as("n_samples"),
        sqrt(expr("aggregate(__fr, 0L, (a, b) -> a + cast((b - 128) * (b - 128) AS BIGINT))")
          .cast("double") / size(col("__fr")).cast("double")).as("__rms"))
      .select(col(idCol), col("window_idx"), col("n_samples"),
        round(col("__rms"), 6).as("rms"),
        (col("__rms") >= threshold).as("active"))
  }

  /**
   * Partition-batched decode: the mapPartitions/mapInPandas shape a real
   * codec needs (amortize model/codec init per batch, bounded batch
   * memory). The per-record decode is the same STUB arithmetic.
   */
  def decodeBatched(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // >>> STUB: real codec would decode `batch` here in one native call
        batch.map { r =>
          val id    = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          Row(id, bytes.length.toLong, (64 + bytes.length % 193).toLong, (64 + (bytes.length * 31) % 177).toLong, 3L)
        }
      }
    }
    spark.createDataFrame(out, MediaMetaSchema)
  }

  /** schema of a resized media record. */
  val ResizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_bytes", LongType)
  ))

  /**
   * Partition-batched "resize" to target dimensions: emits a new binary
   * payload whose size scales the source by the pixel-count ratio against
   * the decoded dimensions (aspect math a real resampler would follow).
   * STUB: output bytes are a deterministic function of source length; the
   * real parts are the batching, the binary-out schema, and the size
   * arithmetic — at 100 TB this is the shape of a recompression pass
   * (map-only, no shuffle, bounded batch memory).
   */
  def resizeBatched(media: DataFrame, targetW: Int = 64, targetH: Int = 64, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // >>> STUB: real resampler would process `batch` in one native call
        batch.map { r =>
          val id     = r.getLong(0)
          val srcLen = r.getAs[Array[Byte]](1).length.toLong
          val w0     = 64 + srcLen % 193
          val h0     = 64 + (srcLen * 31) % 177
          val outLen = math.max(1L, srcLen * (targetW.toLong * targetH) / (w0 * h0))
          val bytes  = Array.tabulate(outLen.toInt)(i => ((srcLen * 31 + i) % 251).toByte)
          Row(id, bytes, targetW.toLong, targetH.toLong, outLen)
        }
      }
    }
    spark.createDataFrame(out, ResizedSchema)
  }

  /**
   * Partition-batched feature extraction — the inference shape (encoder
   * init amortized per partition, bounded batch memory, map-only). STUB:
   * each embedding component is the portable polynomial code-point fold
   * ([[graft.functions.PortableHash.wordPoly]]) at a per-dimension seed,
   * normalized to [0,1) — deterministic, engine-portable (the DuckDB
   * oracle replays it), and the output feeds [[Similarity]] unchanged:
   * media → embeddings → ANN composes end to end.
   */
  def embedBatched(media: DataFrame, dim: Int = 4, batchSize: Int = 64): DataFrame = {
    import graft.functions.PortableHash
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("embedding", ArrayType(DoubleType))
    ))
    val out = media.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // >>> STUB: real encoder would embed `batch` in one forward pass
        batch.map { r =>
          val id    = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val emb = Array.tabulate(dim) { j =>
            PortableHash.wordPoly(bytes, 0, bytes.length, 131L, j.toLong).toDouble / PortableHash.P31
          }
          Row(id, emb)
        }
      }
    }
    spark.createDataFrame(out, schema)
  }

  /**
   * Frame sampling: one row per sampled frame with its byte offset —
   * the standard explode shape for video/audio windowing. Frame count is
   * a deterministic function of payload size (STUB for container parsing).
   */
  def frameSample(media: DataFrame, frameBytes: Int = 64, maxFrames: Int = 8): DataFrame = {
    val nFrames = least(greatest(octet_length(col("payload")).divide(frameBytes).cast(IntegerType), lit(1)), lit(maxFrames))
    media.select(
      col("doc_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      posexplode(sequence(lit(0), nFrames - 1)).as(Seq("frame_idx", "frame_no"))
    ).select(
      col("doc_id"),
      col("frame_idx").cast("long").as("frame_idx"),
      (col("frame_idx") * frameBytes).cast("long").as("byte_offset"),
      col("n_bytes")
    )
  }
}
