package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.Chat

case class ChatConv(conv_id: Long, conversation: String)

/** SFT conversation curation: JSON turn parsing, structural validation,
  * loss-mask stats, context-window trimming. */
class ChatSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val turns = Seq(
    // conv 1: valid (user opener, alternating, has assistant)
    (1L, 1L, "user", "hi there"),
    (1L, 2L, "assistant", "hello friend of mine"),
    (1L, 3L, "user", "bye"),
    // conv 2: assistant opener + a user-user violation, no assistant after
    (2L, 1L, "assistant", "unprompted"),
    (2L, 2L, "user", "a b"),
    (2L, 3L, "user", "c"),
    // conv 3: user only — no assistant turn at all
    (3L, 1L, "user", "anyone?")
  ).toDF("conv_id", "turn_idx", "role", "content")

  "Chat.parseTurns" should "explode role/content arrays 1-based and drop malformed JSON" in {
    val df = Seq(
      (1L, """[{"role":"user","content":"a \"quoted\" ask"},{"role":"assistant","content":"ok"}]"""),
      (2L, """not json at all""")
    ).toDF("conv_id", "conversation")
    val out = Chat.parseTurns(df).orderBy("conv_id", "turn_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    out shouldBe Array(
      (1L, 1L, "user", """a "quoted" ask"""),
      (1L, 2L, "assistant", "ok")) // conv 2 parses to NULL → zero turns
  }

  "Chat.validate" should "flag alternation violations, wrong openers and missing assistants" in {
    val v = Chat.validate(turns).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    v(1L) shouldBe ((3L, "user", 0L, 1L, 1L))      // valid
    v(2L) shouldBe ((3L, "assistant", 1L, 1L, 0L)) // opener + violation
    v(3L) shouldBe ((1L, "user", 0L, 0L, 0L))      // no assistant
  }

  "Chat.maskStats" should "ratio assistant tokens over exact integer sums" in {
    val m = Chat.maskStats(turns).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    m(1L) shouldBe ((7L, 4L, 0.571429)) // 2 + 4 + 1 tokens, assistant 4
    m(2L) shouldBe ((4L, 1L, 0.25))
    m(3L) shouldBe ((1L, 0L, 0.0))
  }

  "Chat.conversationCols" should "match the exploded-relation validate/maskStats signal for signal" in {
    // rebuild each spec conversation as JSON, analyse row-locally, compare
    val conv = turns.groupBy("conv_id").agg(
      to_json(transform(
        array_sort(collect_list(struct(col("turn_idx"), col("role"), col("content")))),
        t => struct(t.getField("role").as("role"), t.getField("content").as("content"))))
        .as("conversation"))
    val rowLocal = conv
      .withColumn("__t", from_json(col("conversation"),
        org.apache.spark.sql.types.DataType.fromDDL("array<struct<role:string,content:string>>")))
      .select(col("conv_id"), Chat.conversationCols(col("__t")).as("c"))
      .select("conv_id", "c.n_turns", "c.first_role", "c.n_violations", "c.has_assistant",
        "c.valid", "c.total_tokens", "c.assistant_tokens")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val v = Chat.validate(turns).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val m = Chat.maskStats(turns).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    rowLocal.keySet shouldBe v.keySet
    rowLocal.foreach { case (id, Seq(n, fr, nv, ha, va, tt, at)) =>
      (n, fr, nv, ha, va) shouldBe v(id)
      (tt, at) shouldBe m(id)
    }
  }

  "Chat.chatGateStream" should "gate a live stream exactly like the static frame" in {
    implicit val sqlc = spark.sqlContext
    val valid    = ChatConv(1L, """[{"role":"user","content":"a b"},{"role":"assistant","content":"c d e"}]""")
    val badOpen  = ChatConv(2L, """[{"role":"assistant","content":"x"},{"role":"user","content":"y"}]""")
    val lowMask  = ChatConv(3L, """[{"role":"user","content":"a b c d e f g h i"},{"role":"assistant","content":"k"}]""")
    val garbage  = ChatConv(4L, """nope""")
    val empty    = ChatConv(5L, """[]""") // valid JSON, zero turns — must flow, not throw
    val noContent = ChatConv(6L, """[{"role":"user","content":"q"},{"role":"assistant"}]""")
    val input = MemoryStream[ChatConv]
    val cp    = Files.createTempDirectory("graft_chat_gate_").toString
    val q = Chat.chatGateStream(input.toDF(), minMaskRatio = 0.2)
      .writeStream.format("memory").queryName("chat_gate").outputMode("append")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      input.addData(valid, badOpen, lowMask, garbage, empty, noContent)
      q.processAllAvailable()
      val streamed = spark.table("chat_gate")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      // conv 6: NULL content counts 0 tokens (not NULL-poisoned) → ratio 0 < 0.2
      streamed shouldBe Array((1L, 2L, 0.6))
      // identical verdicts on the same data as a static frame
      val static = Chat.chatGateStream(
        Seq(valid, badOpen, lowMask, garbage, empty, noContent).toDF(), minMaskRatio = 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      static shouldBe streamed
      // the NULL-content conversation is structurally valid and visible at
      // mask 0.0 — dropped above only by the ratio gate, not by a NULL sum
      Chat.chatGateStream(Seq(noContent).toDF(), minMaskRatio = 0.0)
        .collect().map(r => (r.getLong(0), r.getDouble(3))) shouldBe Array((6L, 0.0))
    } finally q.stop()
  }

  "Chat.preferencePairs" should "pair best and worst candidates, dropping no-preference prompts" in {
    val cands = Seq(
      (1L, 10L, 3.0), (1L, 11L, 1.0), (1L, 12L, 2.0), // clear preference
      (2L, 20L, 5.0), (2L, 21L, 5.0),                  // all equal → no pair
      (3L, 30L, 2.0),                                  // single candidate → no pair
      (4L, 40L, 2.0), (4L, 41L, 1.5)                   // margin 0.5 below the gate
    ).toDF("prompt_id", "cand_id", "score")
    val out = Chat.preferencePairs(cands, minMargin = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    out shouldBe Array((1L, 3L, 10L, 11L, 2.0))
    // ties on score break to the smaller candidate id on both ends
    val tied = Seq((1L, 10L, 2.0), (1L, 11L, 2.0), (1L, 12L, 1.0)).toDF("prompt_id", "cand_id", "score")
    val t = Chat.preferencePairs(tied).head()
    (t.getLong(2), t.getLong(3)) shouldBe ((10L, 12L))
    // a NULL score carries no signal: dropped up front, the rest still pair
    // (NOT ranked first by struct ordering, which would poison the margin)
    val withNull = Seq((1L, 10L, Some(3.0)), (1L, 11L, None), (1L, 12L, Some(1.0)))
      .toDF("prompt_id", "cand_id", "score")
    val n = Chat.preferencePairs(withNull).head()
    (n.getLong(1), n.getLong(2), n.getLong(3), n.getDouble(4)) shouldBe ((2L, 10L, 12L, 2.0))
  }

  it should "agree with the oracle's window formulation when NULL scores exist" in {
    // the sft_prefs DuckDB oracle filters NULLs up front then ranks via
    // row_number windows; run that exact formulation here (Spark SQL) on a
    // fixture WITH NULLs and assert it matches preferencePairs row-for-row
    val cands = Seq(
      (1L, 10L, Some(3.0)), (1L, 11L, None), (1L, 12L, Some(1.0)),
      (2L, 20L, Some(5.0)), (2L, 21L, None), // one real score → no pair
      (3L, 30L, None), (3L, 31L, None),      // all NULL → prompt vanishes
      (4L, 40L, Some(4.0)), (4L, 41L, Some(1.5)), (4L, 42L, None)
    ).toDF("prompt_id", "cand_id", "score")
    cands.createOrReplaceTempView("prefs_null_fixture")
    val oracle = spark.sql(
      """WITH c AS (SELECT prompt_id, cand_id, score FROM prefs_null_fixture WHERE score IS NOT NULL),
        |r AS (SELECT prompt_id, cand_id, score,
        |        row_number() OVER (PARTITION BY prompt_id ORDER BY score DESC, cand_id) AS rb,
        |        row_number() OVER (PARTITION BY prompt_id ORDER BY score ASC, cand_id) AS rw,
        |        count(*) OVER (PARTITION BY prompt_id) AS n FROM c),
        |b AS (SELECT prompt_id, cand_id AS chosen_id, score AS bs, n FROM r WHERE rb = 1),
        |w AS (SELECT prompt_id, cand_id AS rejected_id, score AS ws FROM r WHERE rw = 1)
        |SELECT b.prompt_id, b.n AS n_cands, b.chosen_id, w.rejected_id, b.bs - w.ws AS margin
        |FROM b JOIN w ON b.prompt_id = w.prompt_id
        |WHERE b.chosen_id <> w.rejected_id AND b.bs - w.ws >= 1.0
        |ORDER BY b.prompt_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val engine = Chat.preferencePairs(cands, minMargin = 1.0).orderBy("prompt_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    engine shouldBe oracle
    engine.map(_._1) shouldBe Array(1L, 4L) // prompts 2 and 3 dropped by NULL semantics
  }

  "Chat.passAtK" should "match the closed-form estimator and handle the exact branches" in {
    // prompt 1: n=5, c=2 → pass@3 = 1 - C(3,3)/C(5,3) = 1 - 1/10 = 0.9
    // prompt 2: n=4, c=0 → exactly 0; prompt 3: n=3, c=2 (n-c<k) → exactly 1
    // prompt 4: n=2 < k → dropped
    val samples = (
      Seq.fill(2)((1L, true)) ++ Seq.fill(3)((1L, false)) ++
      Seq.fill(4)((2L, false)) ++
      Seq.fill(2)((3L, true)) ++ Seq((3L, false)) ++
      Seq.fill(2)((4L, true))
    ).toDF("prompt_id", "passed")
    val out = Chat.passAtK(samples, k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L)
    out(1L) shouldBe ((5L, 2L, 0.9))
    out(2L) shouldBe ((4L, 0L, 0.0))
    out(3L) shouldBe ((3L, 2L, 1.0))
  }

  "Chat.groupAdvantages" should "standardize within each prompt and zero out degenerate groups" in {
    val cands = Seq(
      (1L, 10L, 1.0), (1L, 11L, 2.0), (1L, 12L, 3.0), // mean 2, popstd sqrt(2/3)
      (2L, 20L, 5.0), (2L, 21L, 5.0),                  // all equal → 0 via eps floor
      (3L, 30L, 7.0)                                   // single candidate → 0
    ).toDF("prompt_id", "cand_id", "score")
    val out = Chat.groupAdvantages(cands)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val sd = math.sqrt(2.0 / 3.0)
    out((1L, 10L)) shouldBe (-1.0 / sd) +- 1e-4
    out((1L, 12L)) shouldBe (1.0 / sd) +- 1e-4
    out((1L, 10L)) + out((1L, 11L)) + out((1L, 12L)) shouldBe 0.0 +- 1e-5
    out((2L, 20L)) shouldBe 0.0
    out((2L, 21L)) shouldBe 0.0
    out((3L, 30L)) shouldBe 0.0
  }

  "Chat.render" should "produce the canonical transcript in turn order" in {
    val t = Chat.render(turns).filter(col("conv_id") === 1L).head().getString(1)
    t shouldBe "user: hi there\nassistant: hello friend of mine\nuser: bye"
  }

  "Chat.cannedReplies" should "surface assistant contents repeated across conversations" in {
    val withCanned = turns.union(Seq(
      (4L, 1L, "user", "q1"), (4L, 2L, "assistant", "canned reply"),
      (5L, 1L, "user", "q2"), (5L, 2L, "assistant", "canned reply"),
      (6L, 1L, "user", "canned reply") // user turns never count
    ).toDF("conv_id", "turn_idx", "role", "content"))
    val out = Chat.cannedReplies(withCanned).collect()
    out.length shouldBe 1
    (out.head.getLong(1), out.head.getLong(2)) shouldBe ((2L, 4L))
  }

  "Chat.trimToBudget" should "keep the longest whole-turn suffix within budget" in {
    // conv 1 token counts by turn: 2, 4, 1 → reverse cums 1, 5, 7
    val kept = Chat.trimToBudget(turns.filter(col("conv_id") === 1L), maxTokens = 5)
      .orderBy("turn_idx").collect().map(r => (r.getLong(1), r.getLong(3)))
    kept shouldBe Array((2L, 4L), (3L, 1L)) // turn 1 overflows the suffix
    // a final turn alone over budget empties the conversation
    Chat.trimToBudget(turns.filter(col("conv_id") === 1L), maxTokens = 0L + 1)
      .filter(col("turn_idx") === 2L).count() shouldBe 0L
  }

  "Chat.lengthBias" should "count longer-chosen pairs exactly and drop unmeasured candidates" in {
    // pairs: (chosen 1, rejected 2) lens (10, 4) → chosen longer, diff +6
    //        (chosen 3, rejected 4) lens (2, 8)  → rejected longer, diff −6
    //        (chosen 5, rejected 6) — cand 6 has NULL length → dropped
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("chosen_id", "rejected_id")
    val attrs = Seq((1L, Some(10L)), (2L, Some(4L)), (3L, Some(2L)),
      (4L, Some(8L)), (5L, Some(9L)), (6L, None)).toDF("cand_id", "length")
    val r = Chat.lengthBias(pairs, attrs).head()
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((2L, 1L, 1L))
    r.getDouble(3) shouldBe 0.5
    r.getDouble(4) shouldBe 0.0 // +6 and −6 cancel
  }

  "Chat.bestOfN" should "pin the curve endpoints at mean and max and match the hand formula between" in {
    // prompt 1: scores 1..4 → emax_1 = mean 2.5, emax_4 = max 4,
    // emax_2 = Σ s_(i)·(i−1)/C(4,2) = (0·1 + 1·2 + 2·3 + 3·4)/6 = 20/6
    // prompt 2: only 3 candidates → dropped (needs max(ns) = 4)
    val cands = Seq(
      (1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0), (1L, 4L, 4.0),
      (2L, 1L, 9.0), (2L, 2L, 9.0), (2L, 3L, 9.0)
    ).toDF("prompt_id", "cand_id", "score")
    val out = Chat.bestOfN(cands, ns = Seq(1, 2, 4)).collect()
    out.length shouldBe 1
    val r = out.head
    r.getLong(0) shouldBe 1L
    r.getLong(1) shouldBe 4L     // n_samples
    r.getDouble(2) shouldBe 4.0  // best
    r.getDouble(3) shouldBe 2.5  // emax_1 = pool mean
    r.getDouble(4) shouldBe 3.333333 // 20/6 rounded
    r.getDouble(5) shouldBe 4.0  // emax_N = pool max
  }

  it should "drop null scores before ranking" in {
    // a null score would rank FIRST in Spark ASC but LAST in DuckDB —
    // the defensive filter makes the pool identical to the null-free one
    val withNull = Seq(
      (1L, 1L, Some(1.0)), (1L, 2L, Some(2.0)), (1L, 3L, Some(3.0)),
      (1L, 4L, Some(4.0)), (1L, 5L, None)
    ).toDF("prompt_id", "cand_id", "score")
    val clean = withNull.filter(col("score").isNotNull)
    Chat.bestOfN(withNull, ns = Seq(1, 2, 4)).collect() shouldBe
      Chat.bestOfN(clean, ns = Seq(1, 2, 4)).collect()
  }
}
