package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Rollup
import graft.plan.TimeContext

/** Temporal aggregations served from an attached sufficient-statistics
  * rollup: eligible queries must return exactly what the raw scan returns,
  * ineligible ones must fall back. The poisoned-stats cases prove WHICH
  * path ran from results alone (a served query reads the poison, a
  * fallback never touches it). */
class RollupServeSpec extends SparkTestBase {

  import spark.implicits._

  private implicit val tc: TimeContext = TimeContext(20001L)

  // 1 s rollup grain; values chosen so every aggregate differs per bucket
  private val Step = 1000L
  private lazy val events = Seq(
    (1200L, 2.0, "a"), (1800L, 4.0, "a"), (2500L, 6.0, "b"),
    (4100L, 1.0, "a"), (5900L, 9.0, "b"), (8000L, 3.0, "a"),
    (9999L, 7.0, "b"), (10000L, 5.0, "a")
  ).toDF("timestamp", "value", "kind")

  private def freshEngine(): GraftEngine = {
    val e = new GraftEngine(spark)
    e.registerMetric("db", "ns", "ev", events, col("timestamp"), col("value"), tags = Set("kind"))
    e
  }

  private def run(e: GraftEngine, q: String): Seq[Row] =
    e.sql("db", "ns", q).fold(err => fail(err), _.collect().toSeq)

  private val aligned  = "where timestamp > 1000 and timestamp <= 10000 group by interval 3 s"
  private val queries = Seq(
    s"select count(*) from ev $aligned",
    s"select sum(*) from ev $aligned",
    s"select min(*) from ev $aligned",
    s"select max(*) from ev $aligned",
    s"select avg(*) from ev $aligned")

  "rollup serving" should "return exactly the raw-scan result for every eligible aggregate" in {
    val raw    = freshEngine()
    val rolled = freshEngine()
    rolled.attachRollup("db", "ns", "ev",
      Rollup.buildForServing(events, Seq.empty, "timestamp", "value", Step), Step)
      .fold(fail(_), identity)
    queries.foreach { q =>
      withClue(q) { run(rolled, q).map(_.toSeq) shouldBe run(raw, q).map(_.toSeq) }
    }
  }

  it should "actually serve from the stats (poison is visible) and fall back when ineligible" in {
    val e = freshEngine()
    // poison: every cell count doubled, sums tripled
    val poison = Rollup.buildForServing(events, Seq.empty, "timestamp", "value", Step)
      .withColumn("n", col("n") * 2).withColumn("vsum", col("vsum") * 3)
    e.attachRollup("db", "ns", "ev", poison, Step).fold(fail(_), identity)
    val raw = freshEngine()

    // aligned count: served → sees the doubled n
    val served = run(e, s"select count(*) from ev $aligned").map(_.getLong(3)).sum
    val truth  = run(raw, s"select count(*) from ev $aligned").map(_.getLong(3)).sum
    served shouldBe truth * 2

    // misaligned span (hi not on the grain) → fallback, poison invisible
    val mis = "where timestamp > 1000 and timestamp <= 9999 group by interval 3 s"
    run(e, s"select count(*) from ev $mis").map(_.toSeq) shouldBe
      run(raw, s"select count(*) from ev $mis").map(_.toSeq)

    // tag-filtered WHERE → fallback (rollup has no per-tag stats)
    val tagged = s"select count(*) from ev where kind = 'a' and timestamp > 1000 and timestamp <= 10000 group by interval 3 s"
    run(e, tagged).map(_.toSeq) shouldBe run(raw, tagged).map(_.toSeq)

    // count distinct → fallback (not derivable from sufficient stats)
    val cd = s"select count(distinct value) from ev $aligned"
    run(e, cd).map(_.toSeq) shouldBe run(raw, cd).map(_.toSeq)

    // interval not a multiple of the grain → fallback
    val odd = "where timestamp > 1000 and timestamp <= 10000 group by interval 2500 ms"
    if (freshEngine().sql("db", "ns", s"select count(*) from ev $odd").isRight)
      run(e, s"select count(*) from ev $odd").map(_.toSeq) shouldBe
        run(raw, s"select count(*) from ev $odd").map(_.toSeq)
  }

  "global rollup serving" should "serve pure aggregates and fall back on plain fields or tags" in {
    val e = freshEngine()
    val poison = Rollup.buildForServing(events, Seq.empty, "timestamp", "value", Step)
      .withColumn("n", col("n") * 2)
    e.attachRollup("db", "ns", "ev", poison, Step).fold(fail(_), identity)
    val raw = freshEngine()

    // unconstrained global count: served (poison visible)
    run(e, "select count(*) from ev").head.getLong(0) shouldBe
      run(raw, "select count(*) from ev").head.getLong(0) * 2
    // aligned time-bounded count: served
    run(e, "select count(*) from ev where timestamp > 1000 and timestamp <= 10000").head.getLong(0) shouldBe
      run(raw, "select count(*) from ev where timestamp > 1000 and timestamp <= 10000").head.getLong(0) * 2
    // misaligned bound → fallback
    run(e, "select count(*) from ev where timestamp > 1000 and timestamp <= 9999").map(_.toSeq) shouldBe
      run(raw, "select count(*) from ev where timestamp > 1000 and timestamp <= 9999").map(_.toSeq)
    // mixed plain fields → fallback (stats cannot carry per-row columns)
    run(e, "select kind, count(*) from ev").map(_.toSeq) shouldBe
      run(raw, "select kind, count(*) from ev").map(_.toSeq)
    // tag filter → fallback
    run(e, "select sum(*) from ev where kind = 'a'").map(_.toSeq) shouldBe
      run(raw, "select sum(*) from ev where kind = 'a'").map(_.toSeq)
    // min/max (poison leaves vmin/vmax untouched) and the count clamp
    run(e, "select min(*) from ev").map(_.toSeq) shouldBe run(raw, "select min(*) from ev").map(_.toSeq)
    run(e, "select count(*) from ev limit 3").head.getLong(0) shouldBe 3L // served, clamped
  }

  "tag rollup serving" should "serve group-by-tag from keyed stats and fall back for unkeyed tags" in {
    val e = freshEngine()
    val poison = Rollup.buildForServing(events, Seq("kind"), "timestamp", "value", Step)
      .withColumn("n", col("n") * 2)
    e.attachRollup("db", "ns", "ev", poison, Step).fold(fail(_), identity)
    val raw = freshEngine()
    // keyed tag: served (poison visible per group)
    val served = run(e, "select count(*) from ev group by kind order by kind").map(r => (r.getString(0), r.getLong(1)))
    val truth  = run(raw, "select count(*) from ev group by kind order by kind").map(r => (r.getString(0), r.getLong(1)))
    served shouldBe truth.map { case (k, n) => (k, n * 2) }
    // keyed stats still serve GLOBAL queries (re-aggregated over the key)
    run(e, "select count(*) from ev").head.getLong(0) shouldBe truth.map(_._2).sum * 2
    // first/last cannot fold from stats → fallback
    run(e, "select first(value) from ev group by kind").map(_.toSeq) shouldBe
      run(raw, "select first(value) from ev group by kind").map(_.toSeq)
  }

  "the approx-count-distinct opt-in" should "stay exact by default and approximate under the flag" in {
    val exact = freshEngine()
    val approx = {
      val e = new GraftEngine(spark, None, graft.exec.ExecConfig(approxDistinctRsd = Some(0.05)))
      e.registerMetric("db", "ns", "ev", events, col("timestamp"), col("value"), tags = Set("kind"))
      e
    }
    val q = "select count(distinct value) from ev"
    val ex = run(exact, q).head.getLong(0)
    ex shouldBe 8L // all values distinct: the default path is exact
    val ap = run(approx, q).head.getLong(0)
    // HLL++ at rsd 0.05 on 8 values lands within a tight band of the truth
    ap.toDouble shouldBe 8.0 +- 2.0
  }

  it should "serve SINCE-grace queries only when the grace-trimmed span stays aligned" in {
    val e = freshEngine()
    val poison = Rollup.buildForServing(events, Seq.empty, "timestamp", "value", Step)
      .withColumn("n", col("n") * 2)
    e.attachRollup("db", "ns", "ev", poison, Step).fold(fail(_), identity)
    val raw = freshEngine()
    // now = 20001; since 19 s trims lo to 1001 → (lo-1) = 1000 aligned → served
    val q = "select count(*) from ev where timestamp > 0 and timestamp <= 10000 group by interval 3 s since 19 s"
    val served = run(e, q).map(_.getLong(3)).sum
    served shouldBe run(raw, q).map(_.getLong(3)).sum * 2
  }

  "Rollup.movingWindow" should "not stretch the trailing window across gap cells" in {
    import graft.operators.Rollup
    // hourly cells at buckets 0, 1, 3 (gap at 2); a 2-step RANGE window at
    // bucket 3 covers values {2,3} -> ONLY cell 3; a row-based frame would
    // wrongly pull cell 1 in
    val step = 10L
    val ev = Seq(("a", 0L, 1.0), ("a", 5L, 3.0), ("a", 10L, 5.0), ("a", 30L, 7.0))
      .toDF("k", "ts", "v")
    val cells = Rollup.build(ev, Seq("k"), "ts", "v", step)
    val out = Rollup.movingWindow(cells, step, windowSteps = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    out shouldBe Array(
      (0L, 2L, 4.0),  // cells {0}: n=2, total=4
      (10L, 3L, 9.0), // cells {0,10}: n=3, total=9
      (30L, 1L, 7.0)) // gap at 20 -> window [20,30] holds only cell 30
  }
}
