package graft

import org.apache.spark.sql.functions._

import graft.plan.TimeContext

/**
 * Regression guard for the NTZ time-mirror timezone contract: the derived
 * millisecond timestamp (`unix_millis(cast(ntz as timestamp))`) renders the
 * wall clock in the SESSION timezone, so the mirror's raw-column bound
 * literal must be built in that same zone (Executor.TimeMirror.boundLit).
 * A hard-coded UTC literal under a non-UTC session silently shifts the
 * ANDed raw filter and drops rows that satisfy the actual span filter —
 * exactly the failure this spec plants by running the full engine stack
 * under Asia/Kolkata (UTC+5:30 — the half-hour offset also catches
 * whole-hour-only handling).
 */
class TimeMirrorTzSpec extends SparkTestBase {

  private implicit val tc: TimeContext = TimeContext(1706659200000L)

  "the NTZ time mirror" should "agree with the derived-ms filter under a non-UTC session timezone" in {
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      withClue("testdata contract: events.ts is a timestamp flavor at this SF") {
        ev.schema("ts").dataType.typeName should startWith("timestamp")
      }
      val ms = unix_millis(col("ts").cast("timestamp"))
      val e  = new GraftEngine(spark)
      e.registerMetric("db", "ns", "events", ev, ms, col("value"),
        tags = Set("event_type"),
        timeMirror = Some(graft.exec.TimeMirror("ts", 1000L, tsType = Some(ev.schema("ts").dataType))))
      // span = middle half of the data; expected count from the derived-ms
      // filter ALONE — if the mirror bound were rendered in the wrong zone,
      // the engine (mirror ANDed in) would return fewer rows
      val b = ev.agg(min(ms), max(ms)).head()
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val (s1, s2) = (lo + (hi - lo) / 4, lo + 3 * (hi - lo) / 4)
      val expected = ev.filter(ms.between(s1, s2)).count()
      expected should be > 0L
      val viaEngine = e.sql("db", "ns", s"select count(*) from events where timestamp in ($s1,$s2)")
        .fold(err => fail(err), identity)
      viaEngine.collect().head.getAs[Long]("count") shouldBe expected
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }
}
