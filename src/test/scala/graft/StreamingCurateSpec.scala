package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.pipeline.{StreamingCurate, TextAnalysis}

case class ScDoc(ts: Timestamp, doc_id: Long, text: String)
case class ScLangDoc(ts: Timestamp, doc_id: Long, lang: String, text: String)

/** Streaming curation specs: the stateless row-local filter pipeline and
  * the watermarked quality monitor. */
class StreamingCurateSpec extends SparkTestBase {

  import spark.implicits._

  private val good  = "the quick brown fox jumps over the lazy dog and it runs on for a while in the field"
  private val spam  = "spam spam spam spam spam spam spam spam the spam spam spam spam spam spam"
  private val pii   = "write to the admin at admin@example.com for the answers to all of the questions in it"
  private val es    = "el perro y el gato de la casa que corren por los campos todos los dias"

  "StreamingCurate.curateStream" should "filter a stream row-locally and scrub PII" in {
    implicit val sqlc = spark.sqlContext
    val input  = MemoryStream[ScDoc]
    val cp     = Files.createTempDirectory("graft_sc_").toString
    val q = StreamingCurate.curateStream(input.toDF(),
        keepLangs = Seq("en"), minQuality = 0.0, scrub = true,
        maxRepetition = Some((0.7, 0.2, 0.9)))
      .writeStream.format("memory").queryName("sc_curate").outputMode("append")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      val t0 = new Timestamp(1000000L)
      input.addData(ScDoc(t0, 0L, good), ScDoc(t0, 1L, spam), ScDoc(t0, 2L, pii), ScDoc(t0, 3L, es))
      q.processAllAvailable()
      val rows = spark.table("sc_curate").select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      rows.keySet shouldBe Set(0L, 2L)          // spam rejected, spanish rejected
      rows(2L) should include("<EMAIL>")        // scrub ran inside the stream
      rows(2L) should not include "admin@example.com"
    } finally q.stop()
  }

  "StreamingCurate.watermarkGateStream" should "gate a live stream exactly like the batch scorer" in {
    implicit val sqlc = spark.sqlContext
    // an all-one-word doc maxes |z| at √n; a short doc has no evidence
    val biased  = Seq.fill(25)("alpha").mkString(" ")
    val natural = good
    val shorty  = "tiny doc"
    val corpus  = Seq((0L, natural), (1L, biased), (2L, shorty)).toDF("doc_id", "text")
    val batchZ = TextAnalysis.watermarkScores(corpus)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val input = MemoryStream[ScDoc]
    val cp    = Files.createTempDirectory("graft_sc_wm_").toString
    val q = StreamingCurate.watermarkGateStream(input.toDF(), maxAbsZ = 4.0)
      .writeStream.format("memory").queryName("sc_wm").outputMode("append")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      val t0 = new Timestamp(1000000L)
      input.addData(ScDoc(t0, 0L, natural), ScDoc(t0, 1L, biased), ScDoc(t0, 2L, shorty))
      q.processAllAvailable()
      val streamed = spark.table("sc_wm").select("doc_id", "wm_z").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // the 25-repeat doc hits |z| = 5 and is gated out; the natural doc
      // passes with the IDENTICAL z the batch operator reports; the short
      // doc passes (no evidence) with its z present but unjudged
      streamed.keySet shouldBe Set(0L, 2L)
      math.abs(batchZ(1L)) shouldBe 5.0
      streamed(0L) shouldBe batchZ(0L)
    } finally q.stop()
  }

  "StreamingCurate.importanceScoreStream" should "score a live stream within 1e-9 of the batch operator" in {
    implicit val sqlc = spark.sqlContext
    val corpus = Seq((0L, good), (1L, spam), (2L, pii), (3L, es)).toDF("doc_id", "text")
    val lr     = TextAnalysis.importanceLogRatios(corpus, corpus.filter($"doc_id" <= 0L))
    val batch  = TextAnalysis.importanceWeights(corpus, corpus.filter($"doc_id" <= 0L))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val input = MemoryStream[ScDoc]
    val cp    = Files.createTempDirectory("graft_sc_dsir_").toString
    val q = StreamingCurate.importanceScoreStream(input.toDF(), lr)
      .writeStream.format("memory").queryName("sc_dsir").outputMode("append")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      val t0 = new Timestamp(1000000L)
      input.addData(ScDoc(t0, 0L, good), ScDoc(t0, 1L, spam), ScDoc(t0, 2L, pii), ScDoc(t0, 3L, es))
      q.processAllAvailable()
      val streamed = spark.table("sc_dsir").select("doc_id", "weight").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      streamed.keySet shouldBe Set(0L, 1L, 2L, 3L)
      // row-local doc-order fold vs the batch sorted fold: FP-equal to ~ulps
      streamed.foreach { case (id, w) => w shouldBe batch(id) +- 1e-9 }
      // the target-domain doc outranks the off-domain ones, as in batch
      streamed(0L) should be > streamed(3L)
    } finally q.stop()
    // threshold filtering stays streaming-legal (stateless filter)
    val kept = StreamingCurate.importanceScoreStream(corpus, lr, minWeight = Some(0.0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    kept should contain(0L)
    kept should not contain 3L
  }

  it should "match the batch curation predicates on the same data" in {
    // the stream filter IS the batch predicate set — same expressions, so
    // a static frame through curateStream equals the hand-applied filters
    val df  = Seq((0L, good), (1L, spam), (2L, pii), (3L, es)).toDF("doc_id", "text")
    val out = StreamingCurate.curateStream(df, keepLangs = Seq("en"), minQuality = 0.0,
      scrub = true, maxRepetition = Some((0.7, 0.2, 0.9)))
    out.columns should contain allOf ("predicted_lang", "quality", "n_tokens")
    out.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(0L, 2L)
  }

  it should "compose with StreamingDedup.exactDedup in one streaming query" in {
    import graft.pipeline.StreamingDedup
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[ScDoc]
    val cp    = Files.createTempDirectory("graft_sc_pipe_").toString
    val piped = StreamingDedup.exactDedup(
      StreamingCurate.curateStream(input.toDF(), keepLangs = Seq("en"), minQuality = 0.0,
        maxRepetition = Some((0.7, 0.2, 0.9))),
      "ts", "10 minutes")
    val q = piped.writeStream.format("memory").queryName("sc_pipe").outputMode("append")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      val t0 = new Timestamp(1000000L)
      input.addData(
        ScDoc(t0, 0L, good), ScDoc(t0, 1L, good),  // exact dup within the batch
        ScDoc(t0, 2L, spam), ScDoc(t0, 3L, es))    // both rejected by curation
      q.processAllAvailable()
      val ids = spark.table("sc_pipe").select("doc_id").collect().map(_.getLong(0)).toSet
      ids.size shouldBe 1               // one representative of the dup pair
      ids.subsetOf(Set(0L, 1L)) shouldBe true
    } finally q.stop()
  }

  "StreamingCurate.domainMixMonitor" should "emit batch-parity window losses feeding live mix weights" in {
    import graft.pipeline.Sampling
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[ScLangDoc]
    val cp = Files.createTempDirectory("graft_sc_").toString
    val q = StreamingCurate.domainMixMonitor(input.toDF(), "ts", windowDur = "1 minute")
      .writeStream.format("memory").queryName("sc_mix").outputMode("update")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      val t0 = new Timestamp(60000L)
      input.addData(
        ScLangDoc(t0, 0L, "en", good), ScLangDoc(t0, 1L, "en", good),
        ScLangDoc(t0, 2L, "zz", "x y"), ScLangDoc(t0, 3L, "zz", "x y"))
      q.processAllAvailable()
      val win = spark.table("sc_mix").select("domain", "n_docs", "loss")
      val batch = Sampling.domainReweight(
        Seq((0L, "en", good), (1L, "en", good), (2L, "zz", "x y"), (3L, "zz", "x y"))
          .toDF("doc_id", "lang", "text"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
      val live = win.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      // identical snap-then-divide → the emitted loss equals the batch loss exactly
      live("en") shouldBe ((batch("en")._1, batch("en")._2))
      live("zz") shouldBe ((batch("zz")._1, batch("zz")._2))
      // weights derived from the emitted window track the batch operator
      // (loss arrives 6-dp-snapped, so agreement is to ~1e-4, not bitwise)
      val w = Sampling.mixWeightsOf(win).collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      w("zz") shouldBe batch("zz")._3 +- 1e-4
      w("en") shouldBe batch("en")._3 +- 1e-4
      (w("en") + w("zz")) shouldBe 1.0 +- 3e-6
      w("zz") should be > w("en") // the tilt survives the streaming path
    } finally q.stop()
  }

  "StreamingCurate.bm25RouteStream" should "route live docs by corpus-stat BM25 within 1e-9 of batch" in {
    import graft.pipeline.{Retrieval, Sampling => _}
    implicit val sqlc = spark.sqlContext
    val corpus = Seq((0L, good), (1L, spam), (2L, pii), (3L, es)).toDF("doc_id", "text")
    val ixRaw  = Retrieval.termIndex(corpus)
    val ix     = ixRaw.copy(postings = ixRaw.postings.localCheckpoint(true))
    val queries = Map("q_spam" -> Seq("spam"), "q_the" -> Seq("the", "dog"))
    val input = MemoryStream[ScDoc]
    val cp = Files.createTempDirectory("graft_sc_").toString
    val q = StreamingCurate.bm25RouteStream(input.toDF(), ix, queries)
      .select("doc_id", "route", "score")
      .writeStream.format("memory").queryName("sc_route").outputMode("append")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      val t0 = new Timestamp(1000L)
      input.addData(ScDoc(t0, 0L, good), ScDoc(t0, 1L, spam), ScDoc(t0, 2L, pii), ScDoc(t0, 3L, es))
      q.processAllAvailable()
      val out = spark.table("sc_route").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
      out(1L)._1 shouldBe "q_spam" // the spam doc routes to the spam query
      out(0L)._1 shouldBe "q_the"  // the english doc routes to the stopword query
      // live scores match the batch scorer to summation-order noise
      val batch = Retrieval.bm25Scores(corpus, Seq("the", "dog"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      out(0L)._2 shouldBe batch(0L) +- 1e-9
      // a doc matching no query term scores an exact 0 on every route and
      // survives only because minScore defaults to 0
      out(3L)._2 shouldBe 0.0
    } finally q.stop()
  }

  "StreamingCurate.qualityMonitor" should "aggregate per-window per-lang acceptance and quality" in {
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[ScDoc]
    val cp    = Files.createTempDirectory("graft_scm_").toString
    val q = StreamingCurate.qualityMonitor(input.toDF(), "ts",
        windowDur = "1 minute", watermarkDelay = "10 minutes",
        keepLangs = Seq("en"), minQuality = 0.0)
      .writeStream.format("memory").queryName("sc_mon").outputMode("update")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      val t0 = new Timestamp(1000000L) // all inside one 1-minute window
      input.addData(ScDoc(t0, 0L, good), ScDoc(t0, 1L, spam), ScDoc(t0, 2L, es))
      q.processAllAvailable()
      val rows = spark.table("sc_mon")
        .select("predicted_lang", "docs", "accepted_docs").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // good + spam both predict en (spam's only marker hit is "the");
      // the monitor counts arrivals vs curation-accepted
      rows("en")._1 shouldBe 2L
      rows("en")._2 shouldBe 2L // repetition is NOT part of the monitor predicate
      rows("es")._1 shouldBe 1L
      rows("es")._2 shouldBe 0L // lang allowlist rejects es
    } finally q.stop()
  }

  "StreamingCurate.termTrendMonitor" should "surface only terms crossing the heavy-hitter cut" in {
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[ScDoc]
    val cp    = Files.createTempDirectory("graft_sct_").toString
    val q = StreamingCurate.termTrendMonitor(input.toDF(), "ts",
        windowDur = "1 minute", watermarkDelay = "10 minutes", minCount = 3L)
      .writeStream.format("memory").queryName("sc_trend").outputMode("update")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      val t0 = new Timestamp(1000000L)
      input.addData(
        ScDoc(t0, 0L, "buy buy buy now"),
        ScDoc(t0, 1L, "buy now or later"))
      q.processAllAvailable()
      val counts = spark.table("sc_trend").select("term", "n").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      counts("buy") shouldBe 4L // 3 + 1 across docs in the window
      counts should not contain key("now") // 2 < minCount
      counts should not contain key("later")
    } finally q.stop()
  }

  "StatefulMonitors.ewmaAnomalies" should "carry the EWMA across micro-batches and flag deviations" in {
    import graft.streaming.StatefulMonitors
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val cp    = Files.createTempDirectory("graft_ewma_mon_").toString
    val q = StatefulMonitors.ewmaAnomalies(
        input.toDF().toDF("event_type", "ts", "value"), alpha = 0.5, band = 2.0)
      .writeStream.format("memory").queryName("ewma_mon").outputMode("append")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      // batch 1: seed 10, then 11 (|11-10|=1 <= band, no alarm);
      // ewma after batch: 0.5*11 + 0.5*10 = 10.5
      input.addData(("m", 0L, 10.0), ("m", 1L, 11.0))
      q.processAllAvailable()
      spark.table("ewma_mon").count() shouldBe 0L
      // batch 2: 14 deviates from the CARRIED 10.5 by 3.5 > 2 -> alarm
      // (state survived the batch boundary); then |13.5 - 12.25| <= 2
      input.addData(("m", 2L, 14.0), ("m", 3L, 13.5))
      q.processAllAvailable()
      val alarms = spark.table("ewma_mon").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      alarms shouldBe Array(("m", 2L, 14.0, 10.5))
      // independent key: its own baseline, first sample never alarms
      input.addData(("other", 0L, 99.0))
      q.processAllAvailable()
      spark.table("ewma_mon").count() shouldBe 1L
    } finally q.stop()
  }

  "StatefulMonitors.quantileMonitor" should "stay exact through 5 samples and track the median after" in {
    import graft.streaming.StatefulMonitors
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val cp    = Files.createTempDirectory("graft_p2_mon_").toString
    val q = StatefulMonitors.quantileMonitor(
        input.toDF().toDF("key", "ts", "value"), p = 0.5)
      .writeStream.format("memory").queryName("p2_mon").outputMode("update")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      // 4 samples: exact interpolated median of {1, 3, 5, 7} = 4
      input.addData(("m", 0L, 5.0), ("m", 1L, 1.0), ("m", 2L, 7.0), ("m", 3L, 3.0))
      q.processAllAvailable()
      val b1 = spark.table("p2_mon").collect().last
      (b1.getLong(1), b1.getDouble(3)) shouldBe ((4L, 4.0))
      // a big uniform batch: the P² median estimate lands near the true
      // median (~500 for 0..999 uniform) — a monitor-accuracy band, not
      // an oracle equality
      input.addData((0 until 1000).map(i => ("m", 10L + i, ((i * 617) % 1000).toDouble)): _*)
      q.processAllAvailable()
      val b2 = spark.table("p2_mon").collect().last
      b2.getLong(1) shouldBe 1004L
      b2.getDouble(3) shouldBe 500.0 +- 50.0
      // independent key: its own markers, exact small-n estimate
      input.addData(("other", 0L, 42.0))
      q.processAllAvailable()
      val oth = spark.table("p2_mon").collect().filter(_.getString(0) == "other").last
      (oth.getLong(1), oth.getDouble(3)) shouldBe ((1L, 42.0))
    } finally q.stop()
  }

  it should "agree with the unordered fold on a tie-free one-row-per-batch stream" in {
    import graft.streaming.StatefulMonitors
    implicit val sqlc = spark.sqlContext
    // one row per micro-batch: iterator order is trivially the arrival
    // order, so deterministic=false must walk the IDENTICAL P² recurrence
    // — the flag only skips the per-batch sort buffer
    val xs = Seq(5.0, 1.0, 7.0, 3.0, 9.0, 2.0, 8.0, 4.0, 6.0, 0.0)
    def run(det: Boolean): Seq[(Long, Double)] = {
      val input = MemoryStream[(String, Long, Double)]
      val cp    = Files.createTempDirectory("graft_p2_det_").toString
      val name  = s"p2_det_$det"
      val q = StatefulMonitors.quantileMonitor(
          input.toDF().toDF("key", "ts", "value"), p = 0.5, deterministic = det)
        .writeStream.format("memory").queryName(name).outputMode("update")
        .option("checkpointLocation", s"$cp/cp").start()
      try {
        xs.zipWithIndex.foreach { case (x, i) =>
          input.addData(("m", i.toLong, x)); q.processAllAvailable()
        }
        spark.table(name).collect().map(r => (r.getLong(1), r.getDouble(3))).toSeq
      } finally q.stop()
    }
    run(det = true) shouldBe run(det = false)
  }

  it should "replay deterministically for the same batch boundaries" in {
    import graft.streaming.P2State
    import graft.streaming.StatefulMonitors.{p2Estimate, p2Observe}
    // the kernel, driven directly: same observation order → same state
    val xs = (0 until 200).map(i => ((i * 137) % 200).toDouble)
    def runAll() = xs.foldLeft(P2State(0L, Vector.empty, Vector.empty))((s, x) => p2Observe(s, x, 0.9))
    val a = runAll()
    val b = runAll()
    a shouldBe b
    p2Estimate(a, 0.9) shouldBe p2Estimate(b, 0.9)
    // p0.9 of ~uniform 0..199 sits near 180
    p2Estimate(a, 0.9) shouldBe 180.0 +- 20.0
    // markers stay sorted and positions strictly increase (P² invariants)
    a.heights shouldBe a.heights.sorted
    a.positions.zip(a.positions.tail).foreach { case (lo, hi) => lo should be < hi }
  }

  "StatefulMonitors.heavyHitters" should "carry counts across batches and bound eviction overcount" in {
    import graft.streaming.StatefulMonitors
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val cp    = Files.createTempDirectory("graft_hh_mon_").toString
    val q = StatefulMonitors.heavyHitters(
        input.toDF().toDF("event_type", "user_id"), k = 2, capacity = 3)
      .writeStream.format("memory").queryName("hh_mon").outputMode("update")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      // batch 1: a×3, b×2, c×1 fit within capacity 3 -> exact counts
      input.addData(Seq("a", "a", "a", "b", "b", "c").map(("click", _)): _*)
      q.processAllAvailable()
      val b1 = spark.table("hh_mon").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      b1.toSet shouldBe Set(("a", 3L, 0L, 1), ("b", 2L, 0L, 2))
      // batch 2: d arrives under pressure -> evicts the min counter (c, 1)
      // and inherits count 1 as overcount: d reports 3 with overcount 1
      // (true count 2); a's exact 3 carried from batch 1 ranks by tiebreak
      input.addData(("click", "d"), ("click", "d"))
      q.processAllAvailable()
      val b2 = spark.table("hh_mon").collect()
      // memory sink in update mode appends; take the latest emission per rank
      val latest = b2.grouped(2).toSeq.last // 2 rows per trigger (k = 2)
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4))).toSet
      latest shouldBe Set(("a", 3L, 0L, 1), ("d", 3L, 1L, 2))
      // independent group: its own summary
      input.addData(("view", "z"))
      q.processAllAvailable()
      val views = spark.table("hh_mon").collect().filter(_.getString(0) == "view")
        .map(r => (r.getString(1), r.getLong(2)))
      views shouldBe Array(("z", 1L))
    } finally q.stop()
  }

  it should "report identical counts in iterator-order mode (deterministic = false)" in {
    // Space-Saving totals are order-independent: the no-buffer fold must
    // land the same per-item counts on the same data — only TIED min
    // evictions (none here: the evicted min is unique) depend on order
    import graft.streaming.StatefulMonitors
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val cp    = Files.createTempDirectory("graft_hh_iter_").toString
    val q = StatefulMonitors.heavyHitters(
        input.toDF().toDF("event_type", "user_id"), k = 2, capacity = 3,
        deterministic = false)
      .writeStream.format("memory").queryName("hh_iter").outputMode("update")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      input.addData(Seq("a", "a", "a", "b", "b", "c").map(("click", _)): _*)
      q.processAllAvailable()
      spark.table("hh_iter").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
        .toSet shouldBe Set(("a", 3L, 0L, 1), ("b", 2L, 0L, 2))
      // pressure batch: the min counter (c, 1) is UNIQUE, so iterator
      // order evicts exactly what sorted order does — counts identical
      input.addData(("click", "d"), ("click", "d"))
      q.processAllAvailable()
      val latest = spark.table("hh_iter").collect().grouped(2).toSeq.last
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4))).toSet
      latest shouldBe Set(("a", 3L, 0L, 1), ("d", 3L, 1L, 2))
    } finally q.stop()
  }

  "StatefulMonitors.sessionWindows" should "merge within-gap events and split across the gap" in {
    import graft.streaming.StatefulMonitors
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val cp    = Files.createTempDirectory("graft_sess_").toString
    val q = StatefulMonitors.sessionWindows(
        input.toDF().toDF("user_id", "ts", "value"),
        gap = "10 seconds", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sess_win").outputMode("complete")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      def t(s: Long) = new Timestamp(s * 1000L)
      // u1: events at 0s and 5s chain (gap 10s); 30s starts a new session
      input.addData(("u1", t(0), 1.0), ("u1", t(5), 2.0), ("u1", t(30), 4.0))
      q.processAllAvailable()
      val rows = spark.table("sess_win")
        .selectExpr("user_id", "unix_timestamp(session_start)", "n_events", "sum_value")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(r => (r._1, r._2))
      rows shouldBe Array(("u1", 0L, 2L, 3.0), ("u1", 30L, 1L, 4.0))
    } finally q.stop()
  }

  "StatefulMonitors.funnelProgress" should "advance per key across batches with batch-funnel semantics" in {
    import graft.streaming.StatefulMonitors
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[(String, Long, String)]
    val cp    = Files.createTempDirectory("graft_funnel_").toString
    val q = StatefulMonitors.funnelProgress(
        input.toDF().toDF("user_id", "ts", "event_type"), Seq("view", "click", "buy"))
      .writeStream.format("memory").queryName("funnel_mon").outputMode("append")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      def rows() = spark.table("funnel_mon").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
      // u1 view@10 advances; click@10 is NOT strictly after (no advance);
      // u2's click before any view does nothing
      input.addData(("u1", 10L, "view"), ("u1", 10L, "click"), ("u2", 5L, "click"))
      q.processAllAvailable()
      rows() shouldBe Set(("u1", 1, "view", 10L))
      // state carried: click@20 then buy@30 complete the funnel in batch 2
      input.addData(("u1", 20L, "click"), ("u1", 30L, "buy"))
      q.processAllAvailable()
      rows() shouldBe Set(("u1", 1, "view", 10L), ("u1", 2, "click", 20L), ("u1", 3, "buy", 30L))
      // parity with the batch operator over the same replayed events
      val batch = graft.operators.Relational.funnel(
        Seq(("u1", 10L, "view"), ("u1", 10L, "click"), ("u2", 5L, "click"),
          ("u1", 20L, "click"), ("u1", 30L, "buy")).toDF("user_id", "ts", "event_type"),
        Seq("user_id"), "ts", "event_type", Seq("view", "click", "buy"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      batch shouldBe Map("u1" -> 3, "u2" -> 0) // max emitted stage per key matches
      // completion cleared u1's state: a later view starts a FRESH pass
      input.addData(("u1", 40L, "view"))
      q.processAllAvailable()
      rows() should contain(("u1", 1, "view", 40L))
    } finally q.stop()
  }

  it should "replay a single batch exactly like the batch ewmaScan recurrence" in {
    import graft.streaming.StatefulMonitors
    implicit val sqlc = spark.sqlContext
    // values on a fixed grid; alpha 0.5; band tiny so every post-seed
    // sample alarms and exposes its pre-update ewma (the scan's s_{i-1})
    val xs = Seq(2.0, 4.0, 8.0, 1.0)
    val input = MemoryStream[(String, Long, Double)]
    val cp    = Files.createTempDirectory("graft_ewma_par_").toString
    val q = StatefulMonitors.ewmaAnomalies(
        input.toDF().toDF("event_type", "ts", "value"), alpha = 0.5, band = 1e-9)
      .writeStream.format("memory").queryName("ewma_par").outputMode("append")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      input.addData(xs.zipWithIndex.map { case (v, i) => ("k", i.toLong * 10L, v) }: _*)
      q.processAllAvailable()
      val pre = spark.table("ewma_par").orderBy("ts").collect().map(_.getDouble(3))
      // batch scan over the same grid: ewma = [2, 3, 5.5, 3.25]; the
      // monitor's pre-update levels are the scan shifted by one
      val scan = graft.operators.TimeSeries.ewmaScan(
        xs.zipWithIndex.map { case (v, i) => ("k", i.toLong * 10L, v) }
          .toDF("k", "ts", "v"), Seq("k"), "ts", "v", step = 10L, alpha = 0.5)
        .orderBy("ts").collect().map(_.getDouble(3))
      pre shouldBe scan.dropRight(1)
    } finally q.stop()
  }
}
