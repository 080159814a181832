package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.pipeline.{Dedup, StreamingDedup}

case class SdDoc(ts: Timestamp, doc_id: Long, text: String)
case class SdIn(doc_id: Long, text: String)
case class SvIn(vec_id: Long, embedding: Array[Float])

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

    // the on-disk index now holds exactly the accepted doc, and the
    // banded sidecar was seeded in lockstep with it
    Dedup.readSignatureIndex(spark, idxPath)
      .select("id").collect().map(_.getLong(0)).toSet shouldBe Set(1L)
    spark.read.parquet(StreamingDedup.bandedPathFor(idxPath))
      .select("id").distinct().collect().map(_.getLong(0)).toSet shouldBe Set(1L)
  }

  it should "gate a micro-batch without any corpus-wide aggregation once the sidecar exists" in {
    val corpusDocs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog and runs far away"),
      (1L, "completely different content about spark query engines and shuffles")
    ).toDF("doc_id", "text")
    val idxPath = Files.createTempDirectory("graft_sdd_plan_").toString + "/index"
    Dedup.writeSignatureIndex(Dedup.signatureIndex(corpusDocs), idxPath)

    val batch1 = Seq((10L, "the quick brown fox jumps over the lazy dog and runs far home")).toDF("doc_id", "text")
    // first batch against a legacy index: self-heals the sidecar
    StreamingDedup.gateBatch(batch1, idxPath, threshold = 0.5)
    val bandedDir = new java.io.File(StreamingDedup.bandedPathFor(idxPath))
    bandedDir.exists() shouldBe true

    // second batch: the gate plan joins the persisted sidecar — no
    // bucket-count aggregation anywhere in the plan (the recompute path
    // would carry a `count(1)` HashAggregate over the full index). The
    // batch is passed raw: intra-batch dedup has its own batch-sized
    // bucket-cap count, which is not what this asserts on.
    val batch2 = Seq((11L, "a brand new document mentioning neither foxes nor engines")).toDF("doc_id", "text")
    val banded = spark.read.parquet(StreamingDedup.bandedPathFor(idxPath))
    val gated = Dedup.gateAgainstCorpus(batch2, Dedup.readSignatureIndex(spark, idxPath), 0.5,
      corpusBanded = Some(banded))
    val plan = gated.queryExecution.executedPlan.toString
    plan should not include "count(1)"
    gated.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(11L)

    // and the whole gateBatch path agrees (sidecar present → same result)
    StreamingDedup.gateBatch(batch2, idxPath, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(11L)
  }

  it should "restore the sidecar's bucket cap on a maintenance re-cap sweep" in {
    // the cap is applied when the sidecar is BUILT; accepted batches append
    // un-capped rows, so a bucket hot purely from batch traffic erodes the
    // candidate bound until compactSidecars (wired into Maintenance.runOnce)
    // rebuilds the capped relation from the signature index
    val maxBucket = 3
    val corpusDocs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog and runs far away"),
      (1L, "completely different content about spark query engines and shuffles")
    ).toDF("doc_id", "text")
    val idxPath = Files.createTempDirectory("graft_sdd_recap_").toString + "/index"
    Dedup.writeSignatureIndex(Dedup.signatureIndex(corpusDocs), idxPath)
    val bandedPath = StreamingDedup.bandedPathFor(idxPath)
    Dedup.bandedIndex(Dedup.readSignatureIndex(spark, idxPath), maxBucket = maxBucket)
      .write.mode("overwrite").parquet(bandedPath)

    // simulate the accepted-batch loop: 8 exact copies of one text appended
    // to BOTH directories (what extendIndexes does per accepted batch) —
    // their shared buckets now exceed the cap in the sidecar
    val copies = (100L to 107L)
      .map(i => (i, "an endlessly repeated boilerplate footer that every accepted batch carries along"))
      .toDF("doc_id", "text")
    val sigs = Dedup.signatureIndex(copies)
    sigs.write.mode("append").parquet(idxPath)
    Dedup.bandRelation(sigs).write.mode("append").parquet(bandedPath)
    def hotBuckets(): Long = spark.read.parquet(bandedPath)
      .groupBy("band", "bucket").count().filter(col("count") > maxBucket).count()
    hotBuckets() should be > 0L // eroded

    StreamingDedup.registerForCompaction(idxPath, numHashes = 64, bands = 16, maxBucket = maxBucket)
    try {
      StreamingDedup.registeredForCompaction should contain(idxPath)
      val (recapped, errs) = StreamingDedup.compactSidecars(spark)
      errs shouldBe empty
      recapped should be >= 1
      hotBuckets() shouldBe 0L // every bucket back under the cap
      // the re-capped sidecar still carries the original corpus rows
      spark.read.parquet(bandedPath).select("id").distinct()
        .collect().map(_.getLong(0)).toSet should contain allOf (0L, 1L)
    } finally StreamingDedup.unregisterFromCompaction(idxPath)
  }

  it should "still catch corpus near-dups through the self-healed sidecar" in {
    // regression guard for sidecar seeding: the sidecar must carry the
    // ORIGINAL corpus band rows, not just post-seed accepted batches
    val corpusDocs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog and runs far away")
    ).toDF("doc_id", "text")
    val idxPath = Files.createTempDirectory("graft_sdd_heal_").toString + "/index"
    Dedup.writeSignatureIndex(Dedup.signatureIndex(corpusDocs), idxPath)
    // batch 1 seeds the sidecar (unrelated doc)
    StreamingDedup.gateBatch(Seq((5L, "completely unrelated words about parquet footers and row groups")).toDF("doc_id", "text"),
      idxPath, threshold = 0.5).count() shouldBe 1
    // batch 2's near-dup of CORPUS doc 0 must be caught via the sidecar
    StreamingDedup.gateBatch(Seq((6L, "the quick brown fox jumps over the lazy dog and runs far home")).toDF("doc_id", "text"),
      idxPath, threshold = 0.5).count() shouldBe 0
  }

  it should "treat an unreadable index directory as a cold start" in {
    implicit val sqlc = spark.sqlContext
    val idxPath = Files.createTempDirectory("graft_sdd_bad_").toString + "/index"
    // a crashed first append can leave only _temporary behind — schema
    // inference fails; the gate must recover as a cold start, not fail
    // every subsequent batch
    Files.createDirectories(java.nio.file.Paths.get(s"$idxPath/_temporary"))
    val input    = MemoryStream[SdIn]
    val survived = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val cp       = Files.createTempDirectory("graft_sdd_bad_cp_").toString
    val q = StreamingDedup.startGatedIngest(input.toDF(), idxPath, threshold = 0.5, cp, triggerMs = 100L) {
      batch => batch.select(col("doc_id")).collect().foreach(r => survived.add(r.getLong(0)))
    }
    try {
      input.addData(SdIn(1L, "the very first document this pipeline has ever seen arrives now"))
      q.processAllAvailable()
      survived.toArray.map(_.asInstanceOf[Long]).toSet shouldBe Set(1L)
      // and the loop still closes across batches after the recovery
      input.addData(SdIn(2L, "the very first document this pipeline has ever seen arrives today"))
      q.processAllAvailable()
      survived.toArray.map(_.asInstanceOf[Long]).toSet shouldBe Set(1L)
    } finally q.stop()
  }

  "StreamingDedup.startVectorGatedIngest" should "gate vector batches against the growing index" in {
    import graft.pipeline.Similarity
    val rnd  = new scala.util.Random(13)
    def v()  = Array.fill(16)(rnd.nextGaussian().toFloat)
    def twin(a: Array[Float]) = a.map(_ * 1.01f)
    val base0 = v(); val base1 = v(); val fresh1 = v(); val fresh2 = v()

    // corpus index on disk, as at scale
    val idxPath = Files.createTempDirectory("graft_svg_idx_").toString + "/vindex"
    Similarity.vectorIndex(Seq((0L, base0), (1L, base1)).toDF("vec_id", "embedding"))
      .write.parquet(idxPath)

    implicit val sqlc = spark.sqlContext
    val input    = MemoryStream[SvIn]
    val survived = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val cp       = Files.createTempDirectory("graft_svg_cp_").toString
    val q = StreamingDedup.startVectorGatedIngest(input.toDF(), idxPath, threshold = 0.9, cp,
      triggerMs = 100L) {
      batch => batch.select(col("vec_id")).collect().foreach(r => survived.add(r.getLong(0)))
    }
    try {
      input.addData(SvIn(10L, twin(base0)), SvIn(11L, fresh1)) // 10 ~ corpus, 11 new
      q.processAllAvailable()
      // a near-dup of a vector ACCEPTED last batch (never in the original
      // corpus) must be caught through the extended index
      input.addData(SvIn(12L, twin(fresh1)), SvIn(13L, fresh2))
      q.processAllAvailable()
      survived.toArray.map(_.asInstanceOf[Long]).toSet shouldBe Set(11L, 13L)
    } finally q.stop()
  }

  it should "cold-start on a missing vector index and dedupe within the batch" in {
    import graft.pipeline.StreamingDedup
    val rnd  = new scala.util.Random(17)
    def v()  = Array.fill(16)(rnd.nextGaussian().toFloat)
    val base = v()
    val idxPath = Files.createTempDirectory("graft_svg_cold_").toString + "/vindex"

    implicit val sqlc = spark.sqlContext
    val input    = MemoryStream[SvIn]
    val survived = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val cp       = Files.createTempDirectory("graft_svg_cold_cp_").toString
    val q = StreamingDedup.startVectorGatedIngest(input.toDF(), idxPath, threshold = 0.9, cp,
      triggerMs = 100L) {
      batch => batch.select(col("vec_id")).collect().foreach(r => survived.add(r.getLong(0)))
    }
    try {
      input.addData(SvIn(20L, base), SvIn(21L, base.map(_ * 1.01f))) // intra-batch twins
      q.processAllAvailable()
      survived.toArray.map(_.asInstanceOf[Long]).toSet shouldBe Set(20L)
      input.addData(SvIn(22L, base.map(_ * 0.99f))) // near-dup of the seeded 20
      q.processAllAvailable()
      survived.toArray.map(_.asInstanceOf[Long]).toSet shouldBe Set(20L)
    } finally q.stop()
  }
}
