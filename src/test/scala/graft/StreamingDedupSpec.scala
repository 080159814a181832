package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.pipeline.{Dedup, StreamingDedup}

case class SdDoc(ts: Timestamp, doc_id: Long, text: String)
case class SdIn(doc_id: Long, text: String)

/** Streaming dedup specs: watermark-bounded exact dedup and per-batch
  * near-dup gating against a historical corpus index. */
class StreamingDedupSpec extends SparkTestBase {

  import spark.implicits._

  "StreamingDedup.exactDedup" should "drop in-flight exact duplicates within the watermark" in {
    implicit val sqlc = spark.sqlContext
    val input  = MemoryStream[SdDoc]
    val outDir = Files.createTempDirectory("graft_sdd_").toString
    val q = StreamingDedup.exactDedup(input.toDF(), "ts", "10 minutes")
      .writeStream.format("memory").queryName("sdd_exact").outputMode("append")
      .option("checkpointLocation", s"$outDir/cp").start()
    try {
      val t0 = new Timestamp(1000000L)
      input.addData(
        SdDoc(t0, 1L, "alpha beta gamma"),
        SdDoc(t0, 2L, "alpha beta gamma"), // duplicate content, same batch
        SdDoc(t0, 3L, "delta epsilon zeta"))
      q.processAllAvailable()
      input.addData(SdDoc(new Timestamp(1060000L), 4L, "alpha beta gamma")) // replay in a later batch
      q.processAllAvailable()
      val ids = spark.table("sdd_exact").select("doc_id").collect().map(_.getLong(0)).toSet
      // one representative of the duplicated text survives; the replay and
      // the intra-batch copy are both dropped
      ids.intersect(Set(1L, 2L, 4L)).size shouldBe 1
      ids should contain(3L)
    } finally q.stop()
  }

  it should "gate each micro-batch against the corpus signature index" in {
    val corpusDocs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog and runs far away"),
      (1L, "completely different content about spark query engines and shuffles")
    ).toDF("doc_id", "text")
    // the index round-trips through parquet, as it would at scale
    val idxPath = Files.createTempDirectory("graft_sdd_idx_").toString + "/index"
    // index params must match the gate's (defaults here on both sides)
    Dedup.writeSignatureIndex(Dedup.signatureIndex(corpusDocs), idxPath)

    implicit val sqlc = spark.sqlContext
    val input    = MemoryStream[SdIn]
    val survived = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val cp       = Files.createTempDirectory("graft_sdd_cp_").toString
    val q = StreamingDedup.startGatedIngest(input.toDF(), idxPath, threshold = 0.5, cp, triggerMs = 100L) {
      batch => batch.select(col("doc_id")).collect().foreach(r => survived.add(r.getLong(0)))
    }
    try {
      input.addData(
        SdIn(10L, "the quick brown fox jumps over the lazy dog and runs far home"), // near dup of corpus 0
        SdIn(11L, "a brand new document mentioning neither foxes nor engines"))
      q.processAllAvailable()
      input.addData(SdIn(12L, "completely different content about spark query engines and shuffles")) // exact dup of corpus 1
      q.processAllAvailable()
      // two near-dup copies of a NEW doc in one batch: intra-batch dedup
      // keeps the smaller id, the corpus gate passes it through
      input.addData(
        SdIn(20L, "fresh material on watermark state stores and their checkpoint layout today"),
        SdIn(21L, "fresh material on watermark state stores and their checkpoint layout now"))
      q.processAllAvailable()
      survived.toArray.map(_.asInstanceOf[Long]).toSet shouldBe Set(11L, 20L)

      // the closed loop: doc 30 is a near-dup of doc 11 — accepted TWO
      // batches ago, never in the original corpus. The extended index
      // catches it; an unrelated doc in the same batch still passes.
      input.addData(
        SdIn(30L, "a brand new document mentioning neither foxes nor engine"),
        SdIn(31L, "entirely unrelated prose concerning tokenizer vocabularies and merges"))
      q.processAllAvailable()
      survived.toArray.map(_.asInstanceOf[Long]).toSet shouldBe Set(11L, 20L, 31L)

      // and a near-dup of doc 20 (accepted LAST batch) is also caught
      input.addData(SdIn(40L, "fresh material on watermark state stores and their checkpoint layout here"))
      q.processAllAvailable()
      survived.toArray.map(_.asInstanceOf[Long]).toSet shouldBe Set(11L, 20L, 31L)
    } finally q.stop()
  }

  it should "seed the index from a cold start and still catch cross-batch near-dups" in {
    implicit val sqlc = spark.sqlContext
    val idxPath  = Files.createTempDirectory("graft_sdd_cold_").toString + "/index"
    val input    = MemoryStream[SdIn]
    val survived = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val cp       = Files.createTempDirectory("graft_sdd_cold_cp_").toString
    val q = StreamingDedup.startGatedIngest(input.toDF(), idxPath, threshold = 0.5, cp, triggerMs = 100L) {
      batch => batch.select(col("doc_id")).collect().foreach(r => survived.add(r.getLong(0)))
    }
    try {
      // batch 1 against a NONEXISTENT index: everything passes, index seeded
      input.addData(SdIn(1L, "the very first document this pipeline has ever seen arrives now"))
      q.processAllAvailable()
      survived.toArray.map(_.asInstanceOf[Long]).toSet shouldBe Set(1L)
      // batch 2's near-dup of it is gated by the seeded index
      input.addData(SdIn(2L, "the very first document this pipeline has ever seen arrives today"))
      q.processAllAvailable()
      survived.toArray.map(_.asInstanceOf[Long]).toSet shouldBe Set(1L)
    } finally q.stop()

    // the on-disk index now holds exactly the accepted doc
    Dedup.readSignatureIndex(spark, idxPath)
      .select("id").collect().map(_.getLong(0)).toSet shouldBe Set(1L)
  }
}
