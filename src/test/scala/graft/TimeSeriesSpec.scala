package graft

import graft.operators.TimeSeries

/** Grid resample / gap-fill / counter rate / rolling / z-score semantics. */
class TimeSeriesSpec extends SparkTestBase {

  import spark.implicits._

  "TimeSeries.resample" should "floor to the grid and average per bucket" in {
    val df = Seq(("a", 5L, 2.0), ("a", 9L, 4.0), ("a", 25L, 7.0), ("b", 12L, 1.0))
      .toDF("k", "ts", "v")
    val out = TimeSeries.resample(df, Seq("k"), "ts", "v", step = 10L)
      .orderBy("k", "ts").collect()
    out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))) shouldBe
      Array(("a", 0L, 3.0), ("a", 20L, 7.0), ("b", 10L, 1.0))
  }

  "TimeSeries.theilSen" should "shrug off the outlier that bends the OLS line" in {
    // y = x + 1 on ticks 0..3, then a wild spike at tick 4: of the 10
    // pairwise slopes six are exactly 1, so the median slope stays 1 and
    // the residual median pins the intercept at 1 — while OLS is dragged
    // far above 1 by the same spike
    val df = Seq(("a", 0L, 1.0), ("a", 10L, 2.0), ("a", 20L, 3.0), ("a", 30L, 4.0),
      ("a", 40L, 100.0)).toDF("k", "ts", "v")
    val ts = TimeSeries.theilSen(df, Seq("k"), "ts", "v", step = 10L).collect()
    ts.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))) shouldBe
      Array(("a", 5L, 10L, 1.0, 1.0))
    val ols = TimeSeries.trendForecast(df, Seq("k"), "ts", "v", step = 10L)
      .select("slope").head().getDouble(0)
    ols should be > 10.0
  }

  it should "average the two middle slopes on an even pair count and refuse an oversized grid" in {
    // 4 points, 6 pairwise slopes sorted [1, 1.5, 2, 3, 3.5, 6]: the even
    // count averages the two middles — (2+3)/2
    val df = Seq(("a", 0L, 0.0), ("a", 10L, 2.0), ("a", 20L, 3.0), ("a", 30L, 9.0))
      .toDF("k", "ts", "v")
    val out = TimeSeries.theilSen(df, Seq("k"), "ts", "v", step = 10L).head()
    out.getLong(2) shouldBe 6L
    out.getDouble(3) shouldBe 2.5
    an[IllegalArgumentException] should be thrownBy
      TimeSeries.theilSen(df, Seq("k"), "ts", "v", step = 10L, maxPoints = 3).head()
  }

  it should "refuse a grid denser than the DEFAULT maxPoints budget" in {
    // 4097 distinct ticks on one key: one past the default 4096 cap —
    // the C(n,2) pair join must refuse with the coarser-step hint, not
    // launch an 8M-row-per-key self-join (the ScaleBench 30x probe
    // relies on exactly this guard being stated correctly)
    val dense = (0 to 4096).map(i => ("a", i.toLong * 10L, i.toDouble)).toDF("k", "ts", "v")
    val ex = the[IllegalArgumentException] thrownBy
      TimeSeries.theilSen(dense, Seq("k"), "ts", "v", step = 10L).head()
    ex.getMessage should include("maxPoints")
  }

  "TimeSeries.seasonStrength" should "separate pure-seasonal from pure-trend series exactly" in {
    // key s: period-4 alternation 0,10,0,10 → centered MA is exactly 5
    //   (constant trend), seasonal carries everything: (F_T, F_S) = (0, 1)
    // key t: exact linear ramp → the MA reproduces the line, residual and
    //   seasonal are exactly 0: (F_T, F_S) = (1, 0)
    val rows =
      (0 until 16).map(i => ("s", i.toLong, if (i % 2 == 0) 0.0 else 10.0)) ++
        (0 until 16).map(i => ("t", i.toLong, i.toDouble))
    val out = TimeSeries.seasonStrength(rows.toDF("k", "ts", "v"), Seq("k"), "ts", "v",
        step = 1L, period = 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    out("s") shouldBe ((12L, 0.0, 1.0))
    out("t") shouldBe ((12L, 1.0, 0.0))
  }

  private lazy val grid = Seq( // key a: observations at 0, 30, 40 (gap 10..20)
    ("a", 0L, 1.0), ("a", 30L, 4.0), ("a", 40L, 10.0),
    ("b", 100L, 5.0) // single observation: nothing to fill
  ).toDF("k", "ts", "v")

  "TimeSeries.gapFill" should "linearly interpolate interior ticks" in {
    val out = TimeSeries.gapFill(grid, Seq("k"), "ts", "v", step = 10L)
      .orderBy("k", "ts").collect()
    out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))) shouldBe
      Array(
        ("a", 0L, 1.0, false), ("a", 10L, 2.0, true), ("a", 20L, 3.0, true),
        ("a", 30L, 4.0, false), ("a", 40L, 10.0, false),
        ("b", 100L, 5.0, false))
  }

  it should "pass sub-step and duplicate timestamps through without filling" in {
    // off-grid input: successors closer than one step have no interior
    // ticks (and must not hit sequence's inverted-boundary error)
    val df = Seq(("a", 0L, 1.0), ("a", 5L, 2.0), ("a", 5L, 3.0), ("a", 30L, 4.0))
      .toDF("k", "ts", "v")
    val out = TimeSeries.gapFill(df, Seq("k"), "ts", "v", step = 10L)
      .orderBy("ts", "v").collect()
    // only the 5→30 pair has room for an interior tick (at 15); the 0→5
    // and 5→5 pairs are sub-step and pass through unfilled
    out.count(_.getBoolean(3)) shouldBe 1
    out.length shouldBe 5
  }

  it should "carry the last observation forward in locf mode" in {
    val out = TimeSeries.gapFill(grid, Seq("k"), "ts", "v", step = 10L, mode = "locf")
      .filter($"filled").orderBy("ts").collect()
    out.map(r => (r.getLong(1), r.getDouble(2))) shouldBe Array((10L, 1.0), (20L, 1.0))
  }

  it should "not fill across gaps longer than maxGap" in {
    val out = TimeSeries.gapFill(grid, Seq("k"), "ts", "v", step = 10L,
      maxGap = Some(20L)).orderBy("k", "ts").collect()
    // the 0->30 gap (30 ticks) stays open; 30->40 is adjacent (no interior)
    out.map(_.getLong(1)) shouldBe Array(0L, 30L, 40L, 100L)
    out.map(_.getBoolean(3)) shouldBe Array(false, false, false, false)
  }

  "TimeSeries.counterRate" should "sum deltas and restart on resets" in {
    // 10 -> 25 (+15) -> 5 (reset: +5) -> 11 (+6) over 30 s
    val df = Seq(("c", 0L, 10.0), ("c", 10000000L, 25.0),
      ("c", 20000000L, 5.0), ("c", 30000000L, 11.0)).toDF("k", "ts", "v")
    val r = TimeSeries.counterRate(df, Seq("k"), "ts", "v").head()
    r.getLong(1) shouldBe 4L
    r.getDouble(2) shouldBe 26.0
    r.getDouble(3) shouldBe (26.0 / 30.0) +- 1e-6
  }

  it should "report a null rate for a single-sample key" in {
    val r = TimeSeries.counterRate(Seq(("x", 5L, 3.0)).toDF("k", "ts", "v"),
      Seq("k"), "ts", "v").head()
    r.getDouble(2) shouldBe 0.0
    r.isNullAt(3) shouldBe true
  }

  "TimeSeries.rolling" should "aggregate the trailing time range inclusive of ties" in {
    val df = Seq(("a", 0L, 1.0), ("a", 5L, 3.0), ("a", 5L, 5.0), ("a", 20L, 7.0))
      .toDF("k", "ts", "v")
    val out = TimeSeries.rolling(df, Seq("k"), "ts", "v", window = 10L)
      .orderBy("ts", "v").collect()
    // ts=5 rows are frame peers: both see {1,3,5}; ts=20 sees only itself
    out.map(r => (r.getLong(1), r.getLong(3), r.getDouble(4))) shouldBe
      Array((0L, 1L, 1.0), (5L, 3L, 3.0), (5L, 3L, 3.0), (20L, 1L, 7.0))
  }

  "TimeSeries.zscoreOutliers" should "flag only beyond-threshold rows and skip constant series" in {
    val a = (1 to 9).map(i => ("a", i.toDouble)) :+ (("a", 100.0)) // one outlier
    val b = (1 to 5).map(_ => ("b", 2.0))                         // constant: sd = 0
    val out = TimeSeries.zscoreOutliers((a ++ b).toDF("k", "v"), Seq("k"), "v", 2.0)
      .collect()
    out.map(r => (r.getString(0), r.getDouble(1))) shouldBe Array(("a", 100.0))
    out.head.getDouble(2) should be > 2.0
  }

  "TimeSeries.seasonalProfile" should "fold timestamps onto the cyclic phase" in {
    // width 10, period 3: ts 0,5 → phase 0; 10 → 1; 35,65 → phase 0/0? 35 div 10 = 3 % 3 = 0; 65 div 10 = 6 % 3 = 0
    val df = Seq(("a", 0L, 1.0), ("a", 5L, 3.0), ("a", 10L, 5.0), ("a", 35L, 7.0), ("a", 65L, 9.0))
      .toDF("k", "ts", "v")
    val out = TimeSeries.seasonalProfile(df, Seq("k"), "ts", "v", width = 10L, period = 3)
      .orderBy("phase").collect()
    out.map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))) shouldBe
      Array((0L, 4L, 5.0), (1L, 1L, 5.0)) // phase 0: {1,3,7,9} avg 5; phase 1: {5}
  }

  "TimeSeries.madOutliers" should "flag by median deviation and ignore constant series" in {
    // key a: median of {1..9, 100} = 5.5, |dev| sorted =
    // {0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,94.5} → MAD 2.5; only 100
    // clears 3.5 × 2.5 = 8.75 (the mean/stddev would have been dragged)
    val a = (1 to 9).map(i => ("a", i.toLong, i.toDouble)) :+ (("a", 10L, 100.0))
    val b = (1 to 5).map(i => ("b", i.toLong, 2.0)) // constant: MAD = 0
    val out = TimeSeries.madOutliers((a ++ b).toDF("k", "ts", "v"), Seq("k"), "v", 3.5)
      .collect()
    out.map(r => (r.getString(0), r.getDouble(2))) shouldBe Array(("a", 100.0))
    out.head.getDouble(3) shouldBe 37.8 // |100 − 5.5| / 2.5
  }

  it should "share one exchange between the two median windows" in {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 9.0)).toDF("k", "ts", "v")
    val plan = TimeSeries.madOutliers(df, Seq("k"), "v", 3.5)
      .queryExecution.executedPlan.toString
    withClue(plan) {
      plan.sliding("Exchange".length).count(_ == "Exchange") shouldBe 1
    }
  }

  "TimeSeries.largestDeltas" should "rank per-key jumps with timestamp tie-break" in {
    val df = Seq(
      ("a", 0L, 1.0), ("a", 10L, 5.0), ("a", 20L, 4.0), ("a", 30L, 8.0), // deltas 4,1,4
      ("b", 0L, 2.0), ("b", 10L, 2.0)                                    // delta 0
    ).toDF("k", "ts", "v")
    val out = TimeSeries.largestDeltas(df, Seq("k"), "ts", "v", k = 2)
      .orderBy("k", "rank").collect()
    out.map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getLong(4))) shouldBe
      Array(("a", 10L, 4.0, 1L), ("a", 30L, 4.0, 2L), ("b", 10L, 0.0, 1L))
  }

  it should "prune the rank window map-side" in {
    val df = Seq(("a", 0L, 1.0), ("a", 10L, 5.0)).toDF("k", "ts", "v")
    TimeSeries.largestDeltas(df, Seq("k"), "ts", "v", k = 1)
      .queryExecution.executedPlan.toString should include("WindowGroupLimit")
  }

  "TimeSeries.ewmaScan" should "seed with the first grid value and apply the recurrence" in {
    // grid (step 10): a -> [2.0, 4.0, 8.0]; alpha 0.5:
    // s1 = 2, s2 = .5*4 + .5*2 = 3, s3 = .5*8 + .5*3 = 5.5
    val df = Seq(("a", 0L, 2.0), ("a", 10L, 4.0), ("a", 20L, 8.0), ("b", 0L, 7.0))
      .toDF("k", "ts", "v")
    val out = TimeSeries.ewmaScan(df, Seq("k"), "ts", "v", step = 10L, alpha = 0.5)
      .orderBy("k", "ts").collect()
    out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))) shouldBe
      Array(("a", 0L, 2.0, 2.0), ("a", 10L, 4.0, 3.0), ("a", 20L, 8.0, 5.5),
        ("b", 0L, 7.0, 7.0)) // single-tick key: ewma = value
  }

  it should "average within buckets before smoothing" in {
    // two samples in bucket 0 average to 3.0 first, then the scan runs
    val df = Seq(("a", 0L, 2.0), ("a", 5L, 4.0), ("a", 10L, 5.0)).toDF("k", "ts", "v")
    val out = TimeSeries.ewmaScan(df, Seq("k"), "ts", "v", step = 10L, alpha = 0.5)
      .orderBy("ts").collect()
    out.map(_.getDouble(3)) shouldBe Array(3.0, 4.0)
  }

  "TimeSeries.cusumScan" should "accumulate a level shift on one side and reset on noise" in {
    // grid mean mu = (1+1+1+5+5+5)/6 = 3, slack 0.5:
    //   hi: max(0, prev + x - 3.5) -> 0,0,0 then 1.5, 3.0, 4.5 (ramps)
    //   lo: max(0, prev + 2.5 - x) -> 1.5, 3.0, 4.5 then decays by 2.5/step
    val df = (0 until 6).map(i => ("a", i.toLong * 10, if (i < 3) 1.0 else 5.0))
      .toDF("k", "ts", "v")
    val out = TimeSeries.cusumScan(df, Seq("k"), "ts", "v", step = 10L, slack = 0.5)
      .orderBy("ts").collect()
    out.map(_.getDouble(3)) shouldBe Array(0.0, 0.0, 0.0, 1.5, 3.0, 4.5)
    out.map(_.getDouble(4)) shouldBe Array(1.5, 3.0, 4.5, 2.0, 0.0, 0.0)
  }

  it should "stay at zero for a constant series" in {
    val df = (0 until 4).map(i => ("a", i.toLong * 10, 2.0)).toDF("k", "ts", "v")
    val out = TimeSeries.cusumScan(df, Seq("k"), "ts", "v", step = 10L, slack = 0.5)
      .collect()
    out.map(_.getDouble(3)).sum shouldBe 0.0
    out.map(_.getDouble(4)).sum shouldBe 0.0
  }

  "TimeSeries.holtScan" should "track level and trend through the coupled recurrence" in {
    // x = [2, 4, 8], alpha 0.5, beta 0.25:
    // t1: l=2, b=0; t2: l=.5*4+.5*2=3, b=.25*1=0.25
    // t3: l=.5*8+.5*3.25=5.625, b=.25*2.625+.75*.25=0.84375
    val df = Seq(("a", 0L, 2.0), ("a", 10L, 4.0), ("a", 20L, 8.0)).toDF("k", "ts", "v")
    val out = TimeSeries.holtScan(df, Seq("k"), "ts", "v", step = 10L).orderBy("ts")
      .collect().map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    out shouldBe Array((2.0, 0.0, 2.0), (3.0, 0.25, 3.25), (5.625, 0.84375, 6.46875))
  }

  "TimeSeries.changePoint" should "locate a planted level shift and tie flat series to the start" in {
    // a: 0,0,0 → 10,10,10; mean 5, prefix sums -5,-10,-15,-10,-5,0 →
    // |S| peaks at 15 on the last pre-shift point (ts 20)
    val df = ((0 until 3).map(i => ("a", i * 10L, 0.0)) ++
      (3 until 6).map(i => ("a", i * 10L, 10.0)) ++
      (0 until 4).map(i => ("b", i * 10L, 7.0))).toDF("k", "ts", "v")
    val out = TimeSeries.changePoint(df, Seq("k"), "ts", "v", step = 10L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out("a") shouldBe ((20L, 6L, 15.0))
    // dead-flat series: every |S| is 0, ties resolve to the earliest point
    out("b") shouldBe ((0L, 4L, 0.0))
  }

  "TimeSeries.holtBacktest" should "score one-step-ahead errors and skip single-point keys" in {
    // x = [2, 4, 8] (holtScan fixture): forecasts 2 → err 2, 3.25 → err 4.75
    // mae = (2 + 4.75)/2 = 3.375; rmse = sqrt((4 + 22.5625)/2)
    val df = Seq(("a", 0L, 2.0), ("a", 10L, 4.0), ("a", 20L, 8.0), ("b", 0L, 9.0))
      .toDF("k", "ts", "v")
    val out = TimeSeries.holtBacktest(df, Seq("k"), "ts", "v", step = 10L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.keySet shouldBe Set("a") // key b has one point: nothing to forecast
    out("a") shouldBe ((2L, 3.375, r6(math.sqrt((4.0 + 22.5625) / 2.0))))
  }

  "TimeSeries.holtWintersScan" should "update one seasonal slot per tick and compose the forecast" in {
    // p = 2, α = β = γ = 0.5 over [10, 20, 30], by hand:
    // t1: l=10  b=0     sv=[0, 0]        seasonal sv[0]=0      f=10+0+sv[1]=10
    // t2: l=15  b=2.5   sv=[0, 2.5]      seasonal sv[1]=2.5    f=15+2.5+sv[0]=17.5
    // t3: l=23.75 b=5.625 sv=[3.125,2.5] seasonal sv[0]=3.125  f=23.75+5.625+2.5=31.875
    val df = Seq(("a", 0L, 10.0), ("a", 10L, 20.0), ("a", 20L, 30.0)).toDF("k", "ts", "v")
    val out = TimeSeries.holtWintersScan(df, Seq("k"), "ts", "v", step = 10L,
      period = 2, alpha = 0.5, beta = 0.5, gamma = 0.5)
      .orderBy("ts").collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    out shouldBe Array(
      (10.0, 0.0, 0.0, 10.0),
      (15.0, 2.5, 2.5, 17.5),
      (23.75, 5.625, 3.125, 31.875))
  }

  "TimeSeries.dominantPeriod" should "find the cycle length and break multiples to the smallest" in {
    // perfect 3-cycle [0, 10, 20] over 12 ticks: P = 3 explains ALL the
    // variance (as do its multiples 6, 9, 12 — the tie breaks to 3)
    val cyc = (0 until 12).map(i => ("a", i.toLong * 10, (i % 3) * 10.0))
    // plus a constant key: zero variance, no period to report
    val df = (cyc ++ (0 until 6).map(i => ("b", i.toLong * 10, 7.0))).toDF("k", "ts", "v")
    val out = TimeSeries.dominantPeriod(df, Seq("k"), "ts", "v", step = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    out shouldBe Array(("a", 3L, 1.0))
  }

  "TimeSeries.turningPointTest" should "count strict extrema only and score Kendall's z" in {
    // [1, 3, 2, 5, 4]: interior points 3 (peak), 2 (valley), 5 (peak) -> T = 3
    val df = Seq(0, 1, 2, 3, 4).zip(Seq(1.0, 3.0, 2.0, 5.0, 4.0))
      .map { case (i, v) => ("a", i.toLong * 10, v) }.toDF("k", "ts", "v")
    val r = TimeSeries.turningPointTest(df, Seq("k"), "ts", "v", step = 10L).head()
    (r.getLong(1), r.getLong(2)) shouldBe ((5L, 3L))
    val zExp = BigDecimal((3.0 - 2.0 * (5.0 - 2.0) / 3.0) /
      math.sqrt((16.0 * 5.0 - 29.0) / 90.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    r.getDouble(3) shouldBe zExp
    // lattice ties are NOT extrema (strict both sides): [1, 2, 2, 1] -> 0
    val tie = Seq(0, 1, 2, 3).zip(Seq(1.0, 2.0, 2.0, 1.0))
      .map { case (i, v) => ("a", i.toLong * 10, v) }.toDF("k", "ts", "v")
    val t = TimeSeries.turningPointTest(tie, Seq("k"), "ts", "v", step = 10L).head()
    (t.getLong(1), t.getLong(2)) shouldBe ((4L, 0L))
    // a 2-point series has no interior: z is null, not a divide-by-zero
    val short = Seq(("a", 0L, 1.0), ("a", 10L, 9.0)).toDF("k", "ts", "v")
    val s = TimeSeries.turningPointTest(short, Seq("k"), "ts", "v", step = 10L).head()
    (s.getLong(1), s.getLong(2), s.isNullAt(3)) shouldBe ((2L, 0L, true))
  }

  "TimeSeries.runsTest" should "count median runs and score the exact permutation z" in {
    // [1, 9, 5, 9, 1, 9]: lower median = 5 (cum 3 of 6 at v=5), the 5
    // drops as a tie; signs [-,+,+,-,+] -> 4 runs, n1=3 above, n2=2 below
    val df = Seq(1.0, 9.0, 5.0, 9.0, 1.0, 9.0).zipWithIndex
      .map { case (v, i) => ("a", i.toLong * 10, v) }.toDF("k", "ts", "v")
    val r = TimeSeries.runsTest(df, Seq("k"), "ts", "v", step = 10L).head()
    (r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((3L, 2L, 4L))
    val zExp = BigDecimal((4.0 - (12.0 / 5.0 + 1.0)) /
      math.sqrt((12.0 * (12.0 - 5.0)) / (25.0 * 4.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    r.getDouble(4) shouldBe zExp
    // a monotone trend has the FEWEST runs: [1..6] -> med 3 drops,
    // signs [-,-,+,+,+] -> 2 runs, z < 0
    val up = (1 to 6).map(i => ("a", i.toLong * 10, i.toDouble)).toDF("k", "ts", "v")
    val u = TimeSeries.runsTest(up, Seq("k"), "ts", "v", step = 10L).head()
    (u.getLong(1), u.getLong(2), u.getLong(3)) shouldBe ((3L, 2L, 2L))
    u.getDouble(4) should be < 0.0
    // one-sided after the median drop (constant-ish series): z is null
    val flat = Seq(1.0, 1.0, 1.0, 5.0, 5.0, 5.0).zipWithIndex
      .map { case (v, i) => ("a", i.toLong * 10, v) }.toDF("k", "ts", "v")
    val f = TimeSeries.runsTest(flat, Seq("k"), "ts", "v", step = 10L).head()
    (f.getLong(1), f.getLong(2), f.isNullAt(4)) shouldBe ((3L, 0L, true))
  }

  "TimeSeries.permutationEntropy" should "score ordinal-pattern complexity with strict ties dropped" in {
    // [1,3,2,5,4,6]: windows (1,3,2)->132, (3,2,5)->213, (2,5,4)->132,
    // (5,4,6)->213 — two patterns at p=1/2 each: H = ln2, norm = ln2/ln6
    val df = Seq(1.0, 3.0, 2.0, 5.0, 4.0, 6.0).zipWithIndex
      .map { case (v, i) => ("a", i.toLong * 10, v) }.toDF("k", "ts", "v")
    val r = TimeSeries.permutationEntropy(df, Seq("k"), "ts", "v", step = 10L).head()
    (r.getLong(1), r.getLong(2)) shouldBe ((4L, 2L))
    r.getDouble(3) shouldBe BigDecimal(math.log(2.0) / math.log(6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // a monotone ramp is ONE pattern: entropy exactly 0
    val up = (1 to 4).map(i => ("a", i.toLong * 10, i.toDouble)).toDF("k", "ts", "v")
    val u = TimeSeries.permutationEntropy(up, Seq("k"), "ts", "v", step = 10L).head()
    (u.getLong(1), u.getLong(2), u.getDouble(3)) shouldBe ((2L, 1L, 0.0))
    // windows carrying a TIE are excluded, never force-ranked: a series
    // whose every window ties produces no row for the key
    val tie = Seq(1.0, 2.0, 2.0, 3.0).zipWithIndex
      .map { case (v, i) => ("a", i.toLong * 10, v) }.toDF("k", "ts", "v")
    TimeSeries.permutationEntropy(tie, Seq("k"), "ts", "v", step = 10L).count() shouldBe 0L
  }

  "TimeSeries.maseBacktest" should "scale the Holt MAE by the naive lag-1 MAE" in {
    // x = [1, 2, 3, 4]: Holt errs 1, 1.375, 1.390625 → sum 3.765625;
    // naive errs all 1 → naive_mae 1, mase = 3.765625 / 3
    val df = Seq(("a", 0L, 1.0), ("a", 10L, 2.0), ("a", 20L, 3.0), ("a", 30L, 4.0))
      .toDF("k", "ts", "v")
    val r = TimeSeries.maseBacktest(df, Seq("k"), "ts", "v", step = 10L).head()
    (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)) shouldBe
      ((3L, 1.255208, 1.0, 1.255208))
    // a flat series: model errors 0, naive errors 0 → mase is NULL, not ∞
    val flat = Seq(("a", 0L, 5.0), ("a", 10L, 5.0), ("a", 20L, 5.0)).toDF("k", "ts", "v")
    val f = TimeSeries.maseBacktest(flat, Seq("k"), "ts", "v", step = 10L).head()
    (f.getDouble(2), f.getDouble(3), f.isNullAt(4)) shouldBe ((0.0, 0.0, true))
  }

  it should "hold a linear series' trend once locked on" in {
    // after convergence on x_t = 5t the forecast tracks within the ramp
    val df = (0 until 30).map(i => ("a", i.toLong * 10, i * 5.0)).toDF("k", "ts", "v")
    val last = TimeSeries.holtScan(df, Seq("k"), "ts", "v", step = 10L)
      .orderBy($"ts".desc).head()
    last.getDouble(4) shouldBe 5.0 +- 0.5        // trend ~ slope
    last.getDouble(5) shouldBe (29 * 5.0 + 5.0) +- 2.0 // forecast ~ next point
  }

  "TimeSeries.decompose" should "recover a planted cycle on a flat trend" in {
    // period 4 (h=2): x = 10 + cycle(+2,0,-2,0) on a constant base —
    // trend recovers 10 (the centered window spans one full cycle),
    // seasonal recovers the cycle, residual vanishes
    val cycle = Seq(2.0, 0.0, -2.0, 0.0)
    val df = (0 until 16).map(i => ("a", i.toLong * 10, 10.0 + cycle(i % 4)))
      .toDF("k", "ts", "v")
    val out = TimeSeries.decompose(df, Seq("k"), "ts", "v", step = 10L, period = 4)
      .orderBy("ts").collect()
    out.length shouldBe 16
    // interior points (full window): trend 10, seasonal = cycle, resid 0
    val interior = out.filter(r => !r.isNullAt(3))
    interior.length shouldBe 16 - 4 // h=2 lost at each end
    interior.foreach { r =>
      r.getDouble(3) shouldBe 10.0 +- 1e-9
      r.getDouble(4) shouldBe cycle((r.getLong(1) / 10 % 4).toInt) +- 1e-9
      r.getDouble(5) shouldBe 0.0 +- 1e-9
    }
    // edge points: no trend -> no seasonal-resid chain, value preserved
    out.take(2).foreach { r => r.isNullAt(3) shouldBe true; r.isNullAt(5) shouldBe true }
  }

  "TimeSeries.seasonalAnomalies" should "flag a planted spike but not the normal cycle" in {
    // the decompose fixture (clean cycle ⇒ residual ≈ 0 everywhere) plus
    // one corrupted interior point: only the spike's residual survives the
    // k·rms cut — a plain z-score would also have flagged the cycle's own
    // troughs, which is exactly what deseasonalization prevents
    val cycle = Seq(2.0, 0.0, -2.0, 0.0)
    val df = (0 until 24).map { i =>
      val spike = if (i == 13) 6.0 else 0.0
      ("a", i.toLong * 10, 10.0 + cycle(i % 4) + spike)
    }.toDF("k", "ts", "v")
    val out = TimeSeries.seasonalAnomalies(df, Seq("k"), "ts", "v", step = 10L,
      period = 4, k = 3.0).collect()
    out.map(_.getLong(1)) shouldBe Array(130L)
    out.head.getDouble(3) should be > 3.0 // residual carries most of the +6 spike
  }

  it should "null everything for a series shorter than one window" in {
    val df = (0 until 3).map(i => ("a", i.toLong * 10, 1.0)).toDF("k", "ts", "v")
    val out = TimeSeries.decompose(df, Seq("k"), "ts", "v", step = 10L, period = 4).collect()
    out.length shouldBe 3
    out.foreach { r => r.isNullAt(3) shouldBe true; r.isNullAt(4) shouldBe true }
  }

  "TimeSeries.acfProfile" should "compute lag correlations and null out-of-range lags" in {
    // alternating series 1,3,1,3: mu = 2, den = 4,
    // acf_1 = ((−1)(1)+(1)(−1)+(−1)(1))/4 = −0.75, acf_2 = ((−1)(−1)+(1)(1))/4 = 0.5,
    // acf_3 = (−1)(1)/4 = −0.25; lags 4+ have no pairs -> null
    val df = Seq(("a", 0L, 1.0), ("a", 10L, 3.0), ("a", 20L, 1.0), ("a", 30L, 3.0))
      .toDF("k", "ts", "v")
    val r = TimeSeries.acfProfile(df, Seq("k"), "ts", "v", step = 10L, maxLag = 4).head()
    r.getLong(1) shouldBe 4L
    r.getDouble(2) shouldBe -0.75
    r.getDouble(3) shouldBe 0.5
    r.getDouble(4) shouldBe -0.25
    r.isNullAt(5) shouldBe true
  }

  it should "null every lag of a constant series (zero denominator)" in {
    val df = (0 until 5).map(i => ("a", i.toLong * 10, 2.0)).toDF("k", "ts", "v")
    val r = TimeSeries.acfProfile(df, Seq("k"), "ts", "v", step = 10L, maxLag = 2).head()
    r.isNullAt(2) shouldBe true
    r.isNullAt(3) shouldBe true
  }

  "TimeSeries.pacfExprs" should "cut off after lag 1 on an exact AR(1) correlogram" in {
    import org.apache.spark.sql.functions.expr
    // acf_k = 0.5^k is the exact AR(1) signature: Durbin-Levinson gives
    // pacf_1 = 0.5 and pacf_k = 0 for k >= 2 — numerators cancel EXACTLY
    // (0.25 - 0.5*0.5 = 0), so this pins the recursion, not an approximation
    val row = Seq((0.5, 0.25, 0.125, 0.0625)).toDF("acf_1", "acf_2", "acf_3", "acf_4")
    val out = TimeSeries.pacfExprs(4, k => s"acf_$k").foldLeft(row) {
      case (acc, (n, e)) => acc.withColumn(n, expr(e))
    }.select("phi_1_1", "phi_2_2", "phi_3_3", "phi_4_4").head()
    out.getDouble(0) shouldBe 0.5
    out.getDouble(1) shouldBe 0.0
    out.getDouble(2) shouldBe 0.0
    out.getDouble(3) shouldBe 0.0
  }

  "TimeSeries.pacfProfile" should "equal the acf at lag 1 and propagate short-series nulls" in {
    val df = Seq(("a", 0L, 1.0), ("a", 10L, 3.0), ("a", 20L, 1.0), ("a", 30L, 3.0))
      .toDF("k", "ts", "v")
    val r = TimeSeries.pacfProfile(df, Seq("k"), "ts", "v", step = 10L, maxLag = 4).head()
    r.getLong(1) shouldBe 4L
    r.getDouble(2) shouldBe -0.75 // pacf_1 = acf_1
    // acf_4 is null (no pairs) -> order-4 block nulls
    r.isNullAt(5) shouldBe true
  }

  "TimeSeries.crossCorrelation" should "peak at the true lag of a shifted copy" in {
    // over the shared ticks 10..40, a = [3,1,3,1] and b = [6,8,6,8] (a
    // delayed one step, +5 level). Full-series denominators (the acf
    // estimator convention): xcorr_0 = −4/4 = −1 (anti-phase), and the
    // lag-1 window keeps 3 of 4 terms → xcorr_1 = 3/4, the lag-k ceiling
    val rows = Seq(1.0, 3.0, 1.0, 3.0, 1.0).zipWithIndex.flatMap { case (v, i) =>
      Seq(("a", i.toLong * 10, v)) ++
        (if (i >= 1) Seq(("b", i.toLong * 10, Seq(1.0, 3.0, 1.0, 3.0, 1.0)(i - 1) + 5.0)) else Nil)
    }
    val df = rows.toDF("k", "ts", "v")
    val r = TimeSeries.crossCorrelation(df, "k", "ts", "v", step = 10L, "a", "b", maxLag = 2).head()
    r.getLong(0) shouldBe 4L                  // ticks 10..40 shared
    r.getDouble(1) shouldBe -1.0 +- 1e-12     // xcorr_0: anti-phase
    r.getDouble(2) shouldBe 0.75 +- 1e-12     // xcorr_1: shifted copy, 3/4 terms
  }

  it should "null every lag when one side is constant" in {
    val rows = (0 until 4).flatMap(i => Seq(("a", i.toLong * 10, 2.0), ("b", i.toLong * 10, i.toDouble)))
    val df = rows.toDF("k", "ts", "v")
    val r = TimeSeries.crossCorrelation(df, "k", "ts", "v", step = 10L, "a", "b", maxLag = 1).head()
    r.isNullAt(1) shouldBe true
    r.isNullAt(2) shouldBe true
  }

  "TimeSeries.anomalyIntervals" should "merge step-adjacent flags into one episode" in {
    // ticks 30 and 40 both spike: one island (30..40, 2 ticks); tick 70
    // spikes alone: its own island — baseline ticks keep sd sane
    val vals = Map(30L -> 100.0, 40L -> 100.0, 70L -> 100.0).withDefaultValue(1.0)
    val df = (0 until 10).map(i => ("a", i * 10L, vals(i * 10L))).toDF("k", "ts", "v")
    val out = TimeSeries.anomalyIntervals(df, Seq("k"), "ts", "v", step = 10L, threshold = 1.0)
      .orderBy("start_ts").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    out shouldBe Array((30L, 40L, 2L), (70L, 70L, 1L))
  }

  "TimeSeries.lttb" should "keep endpoints and pick the largest-triangle point per bucket" in {
    // n=7, nOut=4 -> middle buckets {1,2} and {3,4,5}; the spike at idx 2
    // wins bucket 1 (area 4*10 vs 0); in bucket 2 (all zero values, prev =
    // the spike, next = last point) idx 3 has the largest area (30 > 20 > 10)
    val df = Seq(0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 0.0).zipWithIndex
      .map { case (v, i) => ("a", i.toLong, v) }.toDF("k", "ts", "v")
    val out = TimeSeries.lttb(df, Seq("k"), "ts", "v", step = 1L, nOut = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    out shouldBe Array((0L, 0.0), (2L, 10.0), (3L, 0.0), (6L, 0.0))
  }

  it should "pass short series through whole" in {
    val df = Seq(("a", 0L, 1.0), ("a", 10L, 2.0), ("a", 20L, 3.0)).toDF("k", "ts", "v")
    TimeSeries.lttb(df, Seq("k"), "ts", "v", step = 10L, nOut = 5).count() shouldBe 3L
  }

  "TimeSeries.trendForecast" should "recover an exact linear trend and extrapolate it" in {
    // y = 2x + 1 on a 10-unit grid: slope 2, intercept 1, forecast at x=5
    val df = (0 to 3).map(i => ("a", i.toLong * 10, 2.0 * i + 1.0)).toDF("k", "ts", "v")
    val r = TimeSeries.trendForecast(df, Seq("k"), "ts", "v", step = 10L, horizon = 2).head()
    r.getLong(1) shouldBe 4L        // n_points
    r.getDouble(2) shouldBe 2.0     // slope
    r.getDouble(3) shouldBe 1.0     // intercept
    r.getLong(4) shouldBe 50L       // forecast_ts = last grid ts + 2 steps
    r.getDouble(5) shouldBe 11.0    // y at x = 5
  }

  it should "report a flat forecast for a single-point key" in {
    val df = Seq(("a", 0L, 7.0)).toDF("k", "ts", "v")
    val r = TimeSeries.trendForecast(df, Seq("k"), "ts", "v", step = 10L, horizon = 3).head()
    r.getDouble(2) shouldBe 0.0
    r.getDouble(5) shouldBe 7.0
  }

  "Rollup" should "make merge(build(a), build(b)) equal build(a union b)" in {
    import graft.operators.Rollup
    val a = Seq(("x", 5L, 2.0), ("x", 9L, 4.0), ("y", 25L, 7.0)).toDF("k", "ts", "v")
    val b = Seq(("x", 7L, 6.0), ("y", 12L, 1.0)).toDF("k", "ts", "v")
    val merged = Rollup.serve(Rollup.merge(
      Rollup.build(a, Seq("k"), "ts", "v", 10L),
      Rollup.build(b, Seq("k"), "ts", "v", 10L))).orderBy("k", "bucket").collect()
    val full = Rollup.serve(Rollup.build(a.unionByName(b), Seq("k"), "ts", "v", 10L))
      .orderBy("k", "bucket").collect()
    merged.map(_.toSeq) shouldBe full.map(_.toSeq)
    // spot-check the stats: bucket 0 of x holds 2.0, 4.0, 6.0
    val x0 = merged.find(r => r.getString(0) == "x" && r.getLong(1) == 0L).get
    x0.getLong(2) shouldBe 3L
    x0.getDouble(3) shouldBe 12.0
    x0.getDouble(4) shouldBe 2.0
    x0.getDouble(5) shouldBe 6.0
    x0.getDouble(6) shouldBe 4.0
  }

  it should "regrain hourly stats to a coarser bucket exactly" in {
    import graft.operators.Rollup
    val ev = Seq(("x", 0L, 1.0), ("x", 15L, 3.0), ("x", 25L, 5.0)).toDF("k", "ts", "v")
    val fine   = Rollup.build(ev, Seq("k"), "ts", "v", 10L)  // buckets 0, 10, 20
    val coarse = Rollup.serve(Rollup.regrain(fine, 30L)).collect()
    coarse.length shouldBe 1
    coarse.head.getLong(2) shouldBe 3L       // n
    coarse.head.getDouble(3) shouldBe 9.0    // total
    coarse.head.getDouble(4) shouldBe 1.0    // vmin
    coarse.head.getDouble(5) shouldBe 5.0    // vmax
  }
}
