package graft

import graft.operators.Relational

/** As-of / range join specs: semantics, null cases, and scale shape. */
class RelationalSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val trades = Seq(
    (1L, "A", 10L), (2L, "A", 20L), (3L, "B", 5L), (4L, "B", 100L)
  ).toDF("trade_id", "sym", "ts")

  private lazy val quotes = Seq(
    ("A", 5L, 1.0), ("A", 10L, 2.0), ("A", 15L, 3.0), ("B", 9L, 9.0)
  ).toDF("sym", "qts", "px")

  "Relational.asofJoin" should "pick the latest right row at or before each left ts" in {
    val out = Relational.asofJoin(trades, quotes, Seq("sym"), "ts", "qts")
      .orderBy("trade_id").collect()
    out.map(_.getLong(1)) shouldBe Array(1L, 2L, 3L, 4L)  // (sym, trade_id, ts, px)
    out(0).getDouble(3) shouldBe 2.0 // ts=10 sees the ts=10 quote: <= semantics
    out(1).getDouble(3) shouldBe 3.0 // ts=20 sees the latest (15), not an older one
    out(2).isNullAt(3) shouldBe true // B at ts=5: no prior quote -> left-outer null
    out(3).getDouble(3) shouldBe 9.0 // B at ts=100 still sees the ts=9 quote
  }

  it should "never read a right row from another key group" in {
    val out = Relational.asofJoin(
      trades.filter($"sym" === "B"), quotes.filter($"sym" === "A"), Seq("sym"), "ts", "qts")
      .collect()
    out.foreach(_.isNullAt(3) shouldBe true)
  }

  "Relational.rangeJoin" should "match the naive inequality join under asymmetric bounds" in {
    val rnd = new scala.util.Random(29)
    val l = (1 to 80).map(i => (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(1000).toLong))
      .toDF("l_id", "key", "l_ts")
    val r = (1 to 80).map(i => (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(1000).toLong))
      .toDF("r_id", "key", "r_ts")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val fast = pairs(Relational.rangeJoin(l, r, Seq("key"), "l_ts", "r_ts", -50L, 20L))
    val naive = pairs(l.join(r, "key")
      .filter($"r_ts".between($"l_ts" - 50, $"l_ts" + 20)))
    fast shouldBe naive
    fast should not be empty
  }

  "Relational.sessionize" should "start a new session when the gap exceeds the threshold" in {
    val ev = Seq(
      ("u1", 0L), ("u1", 50L), ("u1", 90L),      // session 0
      ("u1", 300L), ("u1", 310L),                 // gap 210 > 100 -> session 1
      ("u2", 5L),                                 // separate key
      ("u2", 500L)                                // session 1 for u2
    ).toDF("user", "ts")
    val out = Relational.sessionize(ev, Seq("user"), "ts", gap = 100L)
      .orderBy("user", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out shouldBe Array(
      ("u1", 0L, 0L), ("u1", 50L, 0L), ("u1", 90L, 0L),
      ("u1", 300L, 1L), ("u1", 310L, 1L),
      ("u2", 5L, 0L), ("u2", 500L, 1L))
  }

  it should "aggregate session stats with one exchange" in {
    val ev = Seq(("u1", 0L), ("u1", 50L), ("u1", 300L)).toDF("user", "ts")
    val stats = Relational.sessionStats(ev, Seq("user"), "ts", gap = 100L)
    val rows = stats.orderBy("session_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    rows shouldBe Array((0L, 2L, 0L, 50L, 50L), (1L, 1L, 300L, 300L, 0L))
    // both windows and the aggregation share the keys partitioning
    val exchanges = "Exchange".r.findAllIn(
      stats.queryExecution.executedPlan.toString).length
    exchanges should be <= 2 // one for the windows/agg + at most a final gather
  }

  "Relational.funnel" should "match stages greedily in order, strictly after the previous match" in {
    val ev = Seq(
      ("u1", 10L, "view"), ("u1", 20L, "click"), ("u1", 30L, "buy"),   // full funnel
      ("u2", 10L, "click"), ("u2", 20L, "view"), ("u2", 30L, "click"), // click BEFORE view doesn't count
      ("u3", 10L, "view"), ("u3", 10L, "click"),                        // same ts: not strictly after
      ("u4", 50L, "buy")                                                // never starts
    ).toDF("user", "ts", "stage")
    val out = Relational.funnel(ev, Seq("user"), "ts", "stage", Seq("view", "click", "buy"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    out shouldBe Map("u1" -> 3, "u2" -> 2, "u3" -> 1, "u4" -> 0)
    val counts = Relational.funnelCounts(ev, Seq("user"), "ts", "stage", Seq("view", "click", "buy"))
      .orderBy("stage_idx").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    counts shouldBe Array((1, "view", 3L), (2, "click", 2L), (3, "buy", 1L))
  }

  "Relational.retention" should "count distinct keys per (cohort, offset)" in {
    val ev = Seq(
      ("u1", 5L), ("u1", 15L), ("u1", 25L),  // cohort 0, active buckets 0,1,2
      ("u2", 12L), ("u2", 13L), ("u2", 22L), // cohort 1, buckets 0 (twice, distinct) and 1
      ("u3", 27L)                            // cohort 2, bucket 0
    ).toDF("user", "ts")
    val out = Relational.retention(ev, "user", "ts", bucketLen = 10L)
      .orderBy("cohort", "bucket_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out shouldBe Array(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L),
      (2L, 0L, 1L))
  }

  "Relational.interEventGaps" should "profile per-type gaps, ties and users kept apart" in {
    val ev = Seq(
      ("u1", 0L, "view"), ("u1", 10L, "view"), ("u1", 40L, "view"),   // gaps 10, 30
      ("u2", 100L, "view"), ("u2", 110L, "view"),                     // gap 10 (u1's ts never differenced)
      ("u1", 0L, "click"), ("u1", 0L, "click"), ("u1", 5L, "click"),  // tie: gaps 0, 5
      ("u3", 7L, "buy")                                               // single event: no gap
    ).toDF("user_id", "ts", "event_type")
    val out = Relational.interEventGaps(ev)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    out.keySet shouldBe Set("view", "click") // buy never has two events
    out("view")._1 shouldBe 3L
    out("view")._2 shouldBe 10.0  // median of (10, 30, 10)
    out("click") shouldBe ((2L, 2.5, 4.5)) // gaps (0,5): p50 interpolates 2.5, p90 4.5
    // the 100 TB flag: sketch percentiles stay within the accuracy bound
    val approx = Relational.interEventGaps(ev, approx = true)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    approx("view").toDouble shouldBe 10.0 +- 1.0
  }

  "Graph.pageRank" should "rank hubs above leaves, floor isolated nodes, and free its pins" in {
    import graft.pipeline.Checkpoints
    import org.apache.spark.storage.StorageLevel
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("id_a", "id_b")
    val nodes = Seq(0L, 1L, 2L, 3L, 9L).toDF("doc_id")
    val (out, pins) = Checkpoints.scoped {
      graft.operators.Graph.pageRank(edges, nodes, iterations = 1)
    }
    val r = out.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // one round by hand on the star: hub gets 0.15 + 0.85·(1+1+1) = 2.7,
    // each leaf 0.15 + 0.85·(1/3) = 0.433333, isolated 9 floors at 1-d
    r(0L) shouldBe 2.7
    r(1L) shouldBe 0.433333
    r(2L) shouldBe 0.433333
    r(9L) shouldBe 0.15
    // edge relation, degree table and superseded rank rounds are freed by
    // the call; only the returned rank frame's own pin may live
    def live = pins.filter(_.getStorageLevel != StorageLevel.NONE)
    live.size should be <= 1
    Checkpoints.free(out)
    live shouldBe empty
  }

  "Graph.bfsHops" should "label first-reach hops and stop at the bound" in {
    import graft.pipeline.Checkpoints
    import org.apache.spark.storage.StorageLevel
    // path 1-2-3-4-5 plus a shortcut 1-3 and an island 8-9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L), (8L, 9L))
      .toDF("id_a", "id_b")
    val (out, pins) = Checkpoints.scoped {
      graft.operators.Graph.bfsHops(edges, seed = 1L, maxHops = 2)
    }
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 is reached at hop 1 via the shortcut, NOT at 2 via the path
    m shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L)
    def live = pins.filter(_.getStorageLevel != StorageLevel.NONE)
    live.size should be <= 1
    Checkpoints.free(out)
    live shouldBe empty
  }

  "Graph.personalizedPageRank" should "concentrate rank near the seed and zero unreachable components" in {
    import graft.pipeline.Checkpoints
    import org.apache.spark.storage.StorageLevel
    // path 1-2-3 plus a disconnected edge 4-5; seed = 1, d = 0.5, 2 iters:
    // r1 = (0.5, 0.5, 0), r2 = (0.5·1 + 0.5·0.25, 0.5·0.5, 0.5·0.25)
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val (out, pins) = Checkpoints.scoped {
      graft.operators.Graph.personalizedPageRank(edges, Seq(1L),
        iterations = 2, damping = 0.5, topK = 5)
    }
    val rows = out.collect().map(x => (x.getLong(0), x.getDouble(1)))
    rows shouldBe Array((1L, 0.625), (2L, 0.25), (3L, 0.125), (4L, 0.0), (5L, 0.0))
    def live = pins.filter(_.getStorageLevel != StorageLevel.NONE)
    // sparse-frontier contract: the node-id pin AND the final rank pin are
    // both leaves of `out` (the dense restore joins them at the end) and
    // both release through one free(out)
    live.size should be <= 2
    Checkpoints.free(out)
    live shouldBe empty
  }

  "Graph.labelPropagation" should "split bridged triangles into two communities and free its pins" in {
    import graft.pipeline.Checkpoints
    import org.apache.spark.storage.StorageLevel
    // two triangles joined by ONE bridge edge (3-11): connected components
    // would merge everything; LPA keeps the families apart because the
    // bridge never outvotes a triangle's internal edges
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (11L, 12L), (12L, 13L), (11L, 13L), (3L, 11L))
      .toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 11L, 12L, 13L, 99L).toDF("doc_id")
    val (out, pins) = Checkpoints.scoped {
      graft.operators.Graph.labelPropagation(edges, nodes, rounds = 4)
    }
    val lbl = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-traced 4 synchronous rounds (most-frequent neighbor label,
    // ties to smallest): left triangle settles on 1, right on 3 (the
    // label leaks over the bridge in round 1 but the PARTITION is stable)
    lbl shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 11L -> 3L, 12L -> 3L, 13L -> 3L, 99L -> 99L)
    def live = pins.filter(_.getStorageLevel != StorageLevel.NONE)
    live.size should be <= 1 // only the returned label frame's own pin
    Checkpoints.free(out)
    live shouldBe empty
  }

  "Relational.benfordDigits" should "bucket by cent-lattice leading digit and mirror the ideal share" in {
    // 1.50 -> 150 (digit 1), 0.02 -> 2, 25.0 -> 2500 (2), 9.99 -> 999 (9),
    // 0.004 -> 0 cents (dropped), -3.0 and null dropped
    val ev = Seq(Some(1.50), Some(0.02), Some(25.0), Some(9.99), Some(0.004), Some(-3.0), None)
      .toDF("value")
    val out = Relational.benfordDigits(ev).orderBy("digit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    out.map(t => t._1 -> t._2).toMap shouldBe Map(1L -> 1L, 2L -> 2L, 9L -> 1L)
    out.map(_._2).sum shouldBe 4L
    out.find(_._1 == 2L).get._3 shouldBe 0.5
    out.find(_._1 == 1L).get._4 shouldBe
      BigDecimal(math.log(2.0) / math.log(10.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  "Relational.giniConcentration" should "match hand-computed Gini and zero out uniform activity" in {
    // counts (1,1,2): n=3, S=4, T=1·1+1·2+2·3=9 → G = 18/12 − 4/3 = 1/6
    val ev = Seq("a", "b", "c", "c").toDF("user_id")
    val r = Relational.giniConcentration(ev).head()
    (r.getLong(0), r.getLong(1), r.getDouble(2)) shouldBe ((3L, 4L, 0.166667))
    // perfectly uniform activity scores an exact 0
    val u = Seq("a", "a", "b", "b").toDF("user_id")
    Relational.giniConcentration(u).head().getDouble(2) shouldBe 0.0
    // empty input → empty frame
    Relational.giniConcentration(ev.filter($"user_id" === "z")).count() shouldBe 0L
  }

  it should "agree with the driver path through the distributed fallback on near-distinct counts" in {
    // adversarial for the driver histogram: every key has a UNIQUE count
    // (one bucket per key), the shape that motivated maxDriverBuckets —
    // key k appears k times, k = 1..40
    val ev = (1 to 40).flatMap(k => Seq.fill(k)(s"u$k")).toDF("user_id")
    val exact    = Relational.giniConcentration(ev).head()
    val fallback = Relational.giniConcentration(ev, maxDriverBuckets = 4L).head()
    // both paths are integer-exact until the same two final divisions
    (fallback.getLong(0), fallback.getLong(1), fallback.getDouble(2)) shouldBe
      ((exact.getLong(0), exact.getLong(1), exact.getDouble(2)))
    exact.getLong(0) shouldBe 40L
    exact.getLong(1) shouldBe 820L
    // counts 1..40: T = Σ k·rank = Σ k², G = 2T/(nS) − (n+1)/n = 2·22140/32800 − 41/40
    exact.getDouble(2) shouldBe 0.325 +- 1e-9
  }

  "Relational.markovSteadyState" should "converge toward the stationary distribution" in {
    // A→B always; B→A or B→B evenly → π = (1/3, 2/3)
    val ev = Seq(
      ("u1", 0L, "A"), ("u1", 1L, "B"), ("u1", 2L, "A"), ("u1", 3L, "B"),
      ("u2", 0L, "B"), ("u2", 1L, "B")
    ).toDF("user_id", "ts", "event_type")
    val pi = Relational.markovSteadyState(ev, rounds = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    pi.keySet shouldBe Set("A", "B")
    pi("A") shouldBe (1.0 / 3.0) +- 0.005
    pi("B") shouldBe (2.0 / 3.0) +- 0.005
    pi.values.sum shouldBe 1.0 +- 3e-6
    // a dangling state self-loops (absorbs) instead of losing mass
    val ev2 = ev.union(Seq(("u3", 0L, "A"), ("u3", 1L, "C")).toDF("user_id", "ts", "event_type"))
    val pi2 = Relational.markovSteadyState(ev2, rounds = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    pi2.keySet shouldBe Set("A", "B", "C")
    pi2("C") should be > 0.2 // absorbing: mass accumulates
    pi2.values.sum shouldBe 1.0 +- 1e-5
  }

  it should "fail loud when stateCol cardinality exceeds maxStates (driver S×S guard)" in {
    // a user-id column passed as the state by mistake: the S×S driver
    // matrix must be refused BEFORE any collect
    val ev = (1 to 50).map(i => ("u", i.toLong, s"state$i")).toDF("user_id", "ts", "event_type")
    val e = intercept[IllegalArgumentException] {
      Relational.markovSteadyState(ev, maxStates = 10)
    }
    e.getMessage should include("exceed maxStates=10")
    // at exactly the cap it runs
    Relational.markovSteadyState(ev, maxStates = 50).count() shouldBe 50L
  }

  "Relational.survivalCurve" should "estimate hand-computed KM survival with censoring" in {
    // bucket 10, horizon 5; corpus max ts = 30
    // u5: lifetime 2 (t=0), churned; u2/u3: t=1, churned;
    // u1: t=2, still active at 25 (censored); u4: t=3, active (censored)
    val ev = Seq(
      ("u1", 0L), ("u1", 25L), ("u2", 0L), ("u2", 10L), ("u3", 0L), ("u3", 12L),
      ("u4", 0L), ("u4", 30L), ("u5", 0L), ("u5", 2L)
    ).toDF("user_id", "ts")
    val out = Relational.survivalCurve(ev, bucketUs = 10L, horizonUs = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // t=0: risk 5, 1 death → S=0.8; t=1: risk 4, 2 deaths → S=0.8·0.5=0.4;
    // censored lifetimes 2 and 3 emit no row but shrank the risk set
    out shouldBe Array((0L, 5L, 1L, 0.8), (1L, 4L, 2L, 0.4))
    // empty input → empty frame with schema
    val e = Relational.survivalCurve(ev.filter($"user_id" === "nope"), 10L, 5L)
    e.columns.toSeq shouldBe Seq("t", "n_risk", "n_churned", "survival")
    e.count() shouldBe 0L
  }

  "Graph.modularity" should "score the bridged-triangle partition by hand-checked contributions" in {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (11L, 12L), (12L, 13L), (11L, 13L), (3L, 11L))
      .toDF("id_a", "id_b")
    val labels = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 11L -> 3L, 12L -> 3L, 13L -> 3L, 99L -> 99L)
      .toDF("doc_id", "community")
    val out = graft.operators.Graph.modularity(edges, labels)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // m = 7; each triangle: 3 internal edges, degree sum 7 (2+2+3 with the
    // bridge endpoint) → 3/7 − (7/14)² = 0.178571; the isolated node is an
    // exact-zero singleton row
    out(1L) shouldBe ((3L, 3L, 7L, 0.178571))
    out(3L) shouldBe ((3L, 3L, 7L, 0.178571))
    out(99L) shouldBe ((1L, 0L, 0L, 0.0)) // exact-zero singleton row
    // an edgeless graph scores zero instead of dividing by zero
    val none = graft.operators.Graph.modularity(edges.limit(0), labels)
      .collect().map(_.getDouble(4))
    none.foreach(_ shouldBe 0.0)
  }

  "Graph.partitionAgreement" should "score hand-computed ARI" in {
    // A = {1,2}{3,4}; B = {1,2,3}{4}: contingency (1,1)=2,(3,1)=1,(3,4)=1
    // → S_ij=1, S_a=2, S_b=3, n=4, T=6 → expected 1.0, max 2.5 → ARI 0
    val a = Seq(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L).toDF("doc_id", "rep")
    val b = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L).toDF("doc_id", "community")
    val r = graft.operators.Graph.partitionAgreement(a, b, "rep", "community").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)) shouldBe
      ((4L, 1L, 2L, 3L, 0.0))
    // identical partitions score an exact 1
    val a2 = Seq(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L).toDF("doc_id", "rep")
    graft.operators.Graph.partitionAgreement(
      a2, a2.withColumnRenamed("rep", "community"), "rep", "community")
      .head().getDouble(4) shouldBe 1.0
  }

  "Relational.percentRankWithin" should "rank within each group, 0 for singletons" in {
    val d = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 20.0), ("b", 99.0))
      .toDF("k", "v")
    val out = Relational.percentRankWithin(d, Seq("k"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    // rank over 4 rows: 10→0/3, ties 20→1/3 both, 30→3/3; singleton b → 0
    out shouldBe Set(("a", 10.0, 0.0), ("a", 20.0, 0.3333), ("a", 30.0, 1.0), ("b", 99.0, 0.0))
  }

  "Relational.cohortLtv" should "accumulate per-cohort revenue by age with per-member division" in {
    // cohort 0 (users u1@t0, u2@t5): period 10 → u1 spends 2 at age 0 and
    // 4 at age 1 (ts 12: (12-0)/10 = 1); u2 spends 6 at age 0 (ts 5)
    // cohort 10 (u3@t15): 8 at age 0
    val ev = Seq(
      ("u1", 0L, 2.0), ("u1", 12L, 4.0),
      ("u2", 5L, 6.0),
      ("u3", 15L, 8.0)
    ).toDF("user_id", "ts", "value")
    val out = Relational.cohortLtv(ev, periodTs = 10L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    out((0L, 0L)) shouldBe ((2L, 8.0, 8.0, 4.0))   // both users active, 8 total, /2 members
    out((0L, 1L)) shouldBe ((1L, 4.0, 12.0, 6.0))  // cumulative 12, /2
    out((10L, 0L)) shouldBe ((1L, 8.0, 8.0, 8.0))
  }

  "Relational.funnelWithin" should "anchor at the first stage-1 event and enforce the deadline" in {
    val stages = Seq("a", "b", "c")
    val ev = Seq(
      // u1: completes inside the window (anchor 10, deadline 10+100)
      ("u1", 10L, "a"), ("u1", 50L, "b"), ("u1", 90L, "c"),
      // u2: stage c arrives past the deadline → stuck at 2
      ("u2", 10L, "a"), ("u2", 50L, "b"), ("u2", 200L, "c"),
      // u3: a LATER anchor would work (a@150, c@200), but the first "a" at
      // 10 anchors the window — documented earliest-anchor semantics
      ("u3", 10L, "a"), ("u3", 150L, "a"), ("u3", 160L, "b"), ("u3", 200L, "c")
    ).toDF("user_id", "ts", "event_type")
    val out = Relational.funnelWithin(ev, Seq("user_id"), "ts", "event_type", stages, windowTs = 100L)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    out shouldBe Map("u1" -> 3, "u2" -> 2, "u3" -> 1)
  }

  "Relational.rfmScores" should "assign 1-5 quintiles with 5 = best on every axis" in {
    // five users, strictly ordered on all three axes: user i has last event
    // at t=i0, i events, spend 10*i — so user 5 is 5/5/5, user 1 is 1/1/1
    val ev = (1 to 5).flatMap(u => (1 to u).map(e => (s"u$u", u.toLong * 10, 10.0 * u / u)))
      .toDF("user_id", "ts", "value")
    val out = Relational.rfmScores(ev, nowTs = 100L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    out("u5") shouldBe ((50L, 5L, 5L, 5L, 555L)) // recency 100-50, all-best
    out("u1") shouldBe ((90L, 1L, 1L, 1L, 111L))
    out("u3")._4 shouldBe 3L // middle monetary quintile
  }

  it should "agree with the exact quintiles off cutoff boundaries under approx = true, with no global sort" in {
    // 50 users, every axis strictly distinct (user i: last event at i*10,
    // i events, spend 1.5*i) so only threshold-boundary values can differ
    val ev = (1 to 50).flatMap(u => (1 to u).map(e => (u.toLong, u.toLong * 10, 1.5 * u / u)))
      .toDF("user_id", "ts", "value")
    val exactDf  = Relational.rfmScores(ev, nowTs = 1000L)
    val approxDf = Relational.rfmScores(ev, nowTs = 1000L, approx = true)
    // the scale contract: the approx plan has NO unpartitioned window
    // (no single-partition total-order sort anywhere)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    approxDf.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    } shouldBe empty
    def byUser(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((1000L - r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val ex = byUser(exactDf); val ap = byUser(approxDf)
    // the approx cutoffs each axis actually used (same call shape)
    val per  = ex.values.map(v => (v._1, v._2, v._3)).toSeq.toDF("last_ts", "frequency", "monetary")
    def cuts(c: String) = per
      .selectExpr(s"approx_percentile($c, array(0.2, 0.4, 0.6, 0.8), 10000) AS q")
      .head.getSeq[Any](0).map(x => x.toString.toDouble).toSet
    val (rc, fc, mc) = (cuts("last_ts"), cuts("frequency"), cuts("monetary"))
    ex.keys.foreach { u =>
      val (lts, f, m, er, ef, em) = ex(u)
      val (_, _, _, ar, af, am)   = ap(u)
      // off-boundary: scores are identical; at a boundary the threshold
      // path may land ties one bucket lower — never further than 1
      if (!rc(lts.toDouble)) ar shouldBe er else math.abs(ar - er) should be <= 1L
      if (!fc(f.toDouble)) af shouldBe ef else math.abs(af - ef) should be <= 1L
      if (!mc(m)) am shouldBe em else math.abs(am - em) should be <= 1L
    }
  }

  "Relational.lastTouchAttribution" should "credit the latest prior touch, else 'direct'" in {
    val ev = Seq(
      ("u1", 1L, "view", 0.0), ("u1", 3L, "click", 0.0), ("u1", 5L, "purchase", 10.0), // click
      ("u1", 2L, "purchase", 4.0),  // view@1 is the only prior touch
      ("u2", 9L, "purchase", 1.5),  // no touches at all: direct
      ("u3", 7L, "click", 0.0)      // touch without conversion: no credit row
    ).toDF("user_id", "ts", "event_type", "value")
    val out = Relational.lastTouchAttribution(ev, Seq("view", "click"), "purchase")
      .orderBy("touch").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    out shouldBe Array(("click", 1L, 10.0), ("direct", 1L, 1.5), ("view", 1L, 4.0))
  }

  "Relational.winsorizedMean" should "clamp to exact interpolated percentiles before averaging" in {
    val d = Seq.tabulate(4)(i => ("a", (i + 1).toDouble)).toDF("k", "v")
      .union(Seq(("a", 100.0)).toDF("k", "v"))
    val out = Relational.winsorizedMean(d, Seq("k"), "v", 0.05, 0.95).collect().head
    out.getLong(1) shouldBe 5L
    // p05 = 1.2, p95 = 80.8 -> clamped (1.2, 2, 3, 4, 80.8) -> mean 18.2
    out.getDouble(2) shouldBe 18.2 +- 1e-9
  }

  it should "stay close to the exact form under approx = true (the unbounded-domain flag)" in {
    // a continuous-ish value domain big enough for the sketch to settle;
    // approx_percentile returns an actual element (nearest rank) where the
    // exact form interpolates, so the clamp cutoffs differ by at most one
    // inter-element gap — the winsorized mean must track within a tight
    // relative band
    val d = Seq.tabulate(2000)(i => ("g", (i % 997).toDouble * 1.37)).toDF("k", "v")
    val exact  = Relational.winsorizedMean(d, Seq("k"), "v", 0.05, 0.95, dp = 6).collect().head
    val approx = Relational.winsorizedMean(d, Seq("k"), "v", 0.05, 0.95, dp = 6, approx = true).collect().head
    approx.getLong(1) shouldBe exact.getLong(1)
    approx.getDouble(2) shouldBe exact.getDouble(2) +- math.abs(exact.getDouble(2)) * 0.01
  }

  it should "bucket correctly across zero and at nanosecond magnitudes" in {
    // negative window edge: l_ts + lower crosses below 0 — true floor
    // semantics must still probe the right buckets
    val l = Seq((1L, "k", 3L)).toDF("l_id", "key", "l_ts")
    val r = Seq((1L, "k", -40L), (2L, "k", -60L), (3L, "k", 10L)).toDF("r_id", "key", "r_ts")
    val got = Relational.rangeJoin(l, r, Seq("key"), "l_ts", "r_ts", -50L, 20L)
      .select("r_id").collect().map(_.getLong(0)).toSet
    got shouldBe Set(1L, 3L) // -40 and 10 in [3-50, 3+20]; -60 out
    // nanosecond-epoch magnitudes: integer floor-div keeps exactness where
    // double division would round (ts > 2^53)
    val big = 1706659200000000000L
    val l2 = Seq((1L, "k", big)).toDF("l_id", "key", "l_ts")
    val r2 = Seq((1L, "k", big + 999L), (2L, "k", big + 2000L)).toDF("r_id", "key", "r_ts")
    Relational.rangeJoin(l2, r2, Seq("key"), "l_ts", "r_ts", 0L, 1000L)
      .select("r_id").collect().map(_.getLong(0)).toSet shouldBe Set(1L)
  }

  it should "join on bucket equality, not a cartesian" in {
    val plan = Relational.rangeJoin(trades, quotes, Seq("sym"), "ts", "qts", -10L, 10L)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should include("__bucket")
  }

  "Relational.transitionCounts" should "count per-key consecutive state pairs" in {
    val ev = Seq(
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "view"), (1L, 30L, "click"),
      (2L, 5L, "view"), (2L, 15L, "click"), (2L, 25L, "buy"),
      (3L, 0L, "view") // single event: no transition
    ).toDF("user_id", "ts", "event_type")
    val out = Relational.transitionCounts(ev, Seq("user_id"), "ts", "event_type")
      .orderBy("from_state", "to_state").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    out shouldBe Array(
      ("click", "buy", 1L), ("click", "view", 1L), ("view", "click", 3L))
  }

  "Relational.topPaths" should "count truncated per-key journeys with deterministic ranking" in {
    val ev = Seq(
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "buy"),
      (2L, 5L, "view"), (2L, 15L, "click"), (2L, 25L, "buy"),
      (3L, 0L, "view"), (3L, 10L, "click"),
      (4L, 0L, "view") // prefix shorter than pathLen: kept as-is
    ).toDF("user_id", "ts", "event_type")
    val out = Relational.topPaths(ev, Seq("user_id"), "ts", "event_type",
      pathLen = 3, k = 10).collect().map(r => (r.getString(0), r.getLong(1)))
    out shouldBe Array(
      ("view>click>buy", 2L), ("view", 1L), ("view>click", 1L))
  }

  it should "truncate at pathLen and break timestamp ties by state" in {
    val ev = Seq(
      (1L, 0L, "b"), (1L, 0L, "a"), // same ts: state order -> a>b
      (1L, 10L, "c"), (1L, 20L, "d")
    ).toDF("user_id", "ts", "event_type")
    Relational.topPaths(ev, Seq("user_id"), "ts", "event_type", pathLen = 3, k = 1)
      .head().getString(0) shouldBe "a>b>c"
  }

  "Relational.abTestReport" should "split by id parity and compute the Welch t on per-user revenue" in {
    // arm A (even ids 0,2): totals 10, 20 -> mean 15, var 50
    // arm B (odd ids 1,3):  totals 30, 50 -> mean 40, var 200
    // t = 25 / sqrt(50/2 + 200/2) = 25 / sqrt(125)
    val ev = Seq(
      (0L, "purchase", 10.0), (2L, "purchase", 15.0), (2L, "purchase", 5.0),
      (1L, "purchase", 30.0), (3L, "purchase", 50.0),
      (0L, "view", 999.0) // non-metric events contribute 0
    ).toDF("user_id", "event_type", "value")
    val r = Relational.abTestReport(ev, "purchase").head()
    (r.getLong(0), r.getLong(1)) shouldBe ((2L, 2L))
    r.getDouble(2) shouldBe 15.0
    r.getDouble(3) shouldBe 40.0
    r.getDouble(4) shouldBe 25.0
    r.getDouble(5) shouldBe (25.0 / math.sqrt(125.0)) +- 1e-12
  }

  "Relational.stepTransitions" should "count from→to per journey position" in {
    val ev = Seq(
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "buy"),
      (2L, 0L, "view"), (2L, 10L, "click"),
      (3L, 0L, "click"), (3L, 10L, "buy")
    ).toDF("user_id", "ts", "event_type")
    val out = Relational.stepTransitions(ev, Seq("user_id"), "ts", "event_type", maxStep = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    out shouldBe Map(
      (1L, "view", "click") -> 2L,  // users 1 and 2, first move
      (1L, "click", "buy")  -> 1L,  // user 3, first move
      (2L, "click", "buy")  -> 1L)  // user 1, second move
  }

  "Relational.stickiness" should "count trailing-7-day distinct actives per day" in {
    val dayUs = 86400000000L
    // user 1 active days 0 and 3 (counts once in both windows); user 2 day 3
    val ev = Seq((1L, 0L), (1L, 100L), (1L, 3 * dayUs), (2L, 3 * dayUs + 5L))
      .toDF("user_id", "ts")
    val out = Relational.stickiness(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out shouldBe Map(
      0L -> ((1L, 1L, 1.0)),       // day 0: only user 1 in window
      3L -> ((2L, 2L, 1.0)))       // day 3: both active, both in trailing 7d
  }

  "Relational.powerUserConcentration" should "report the top-fraction share with ceil sizing" in {
    // 4 users with 10/5/3/2 events: frac 0.5 -> top 2 users, 15 of 20 events
    val ev = (Seq.fill(10)(1L) ++ Seq.fill(5)(2L) ++ Seq.fill(3)(3L) ++ Seq.fill(2)(4L))
      .toDF("user_id")
    val r = Relational.powerUserConcentration(ev, frac = 0.5).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((4L, 2L, 15L, 20L))
    r.getDouble(4) shouldBe 0.75
  }

  it should "return the zeroed report on empty input instead of tripping on a NULL sum" in {
    val r = Relational.powerUserConcentration(
      Seq.empty[Long].toDF("user_id"), frac = 0.2).head()
    (r.getLong(0), r.getLong(1), r.getLong(3)) shouldBe ((0L, 0L, 0L))
    r.isNullAt(2) shouldBe true
    r.isNullAt(4) shouldBe true
  }

  "Relational.cupedReport" should "regression-adjust arm means with the event-count covariate" in {
    // X (counts) = [2,1,3,2], Y (purchase sums) = [10,30,20,50]:
    // cov = 210-220 = -10, varX = 18-16 = 2 -> theta = -5, mx = 2
    // adjA = 15 - (-5)(2.5-2) = 17.5, adjB = 40 - (-5)(1.5-2) = 37.5
    // varAdj = (875 - 50)/3 = 275 -> t = 20/sqrt(275) = 1.206045
    val ev = Seq(
      (0L, "purchase", 10.0), (0L, "view", 0.0),
      (1L, "purchase", 30.0),
      (2L, "purchase", 15.0), (2L, "purchase", 5.0), (2L, "view", 0.0),
      (3L, "purchase", 50.0), (3L, "view", 0.0)
    ).toDF("user_id", "event_type", "value")
    val r = Relational.cupedReport(ev, "purchase").head()
    (r.getLong(0), r.getLong(1)) shouldBe ((2L, 2L))
    r.getDouble(2) shouldBe -5.0           // theta
    r.getDouble(3) shouldBe 0.057143       // r2 = 100/1750
    r.getDouble(4) shouldBe 17.5           // adj_mean_a
    r.getDouble(5) shouldBe 37.5           // adj_mean_b
    r.getDouble(6) shouldBe 20.0           // adj_lift
    r.getDouble(7) shouldBe 1.206045       // 20/sqrt(275), 6 dp
  }

  it should "null theta when the covariate is constant (varX = 0)" in {
    val ev = Seq((0L, "purchase", 1.0), (1L, "purchase", 2.0)).toDF("user_id", "event_type", "value")
    val r = Relational.cupedReport(ev, "purchase").head()
    r.isNullAt(2) shouldBe true
    r.isNullAt(6) shouldBe true
  }

  "Relational.didReport" should "difference the paired pre/post cell means" in {
    // boundary 100: A-users d = [20, 0], B-users d = [40, 10]
    // cells: pre_a 15, post_a 25, pre_b 5, post_b 30 -> DiD = 25 - 10 = 15
    // var_d: A = 200, B = 450 -> t = 15/sqrt(100 + 225) = 0.83205
    val ev = Seq(
      (0L, "purchase", 50L, 10.0), (0L, "purchase", 150L, 30.0),
      (2L, "purchase", 60L, 20.0), (2L, "purchase", 160L, 20.0),
      (1L, "purchase", 50L, 10.0), (1L, "purchase", 150L, 50.0),
      (3L, "purchase", 150L, 10.0),
      (3L, "view", 50L, 999.0) // non-metric never counts
    ).toDF("user_id", "event_type", "ts", "value")
    val r = Relational.didReport(ev, "purchase", boundaryTs = 100L).head()
    (r.getLong(0), r.getLong(1)) shouldBe ((2L, 2L))
    (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)) shouldBe
      ((15.0, 25.0, 5.0, 30.0))
    r.getDouble(6) shouldBe 15.0
    r.getDouble(7) shouldBe 0.83205
  }

  "Relational.srmCheck" should "flag the arm imbalance z over distinct users" in {
    // users 0..4 (dupe rows collapse): 3 even vs 2 odd
    // z = (2-3)/sqrt(5) = -0.447214, chi2 = 0.2
    val ev = Seq(0L, 1L, 2L, 3L, 4L, 4L, 2L).toDF("user_id")
    val r = Relational.srmCheck(ev).head()
    (r.getLong(0), r.getLong(1)) shouldBe ((3L, 2L))
    r.getDouble(2) shouldBe -0.447214
    r.getDouble(3) shouldBe 0.2
  }

  "Relational.abTestReport" should "null the t statistic when an arm is degenerate (n <= 1)" in {
    // only odd ids: arm A is empty, arm B has one user — no sample variance
    val ev = Seq((1L, "purchase", 30.0)).toDF("user_id", "event_type", "value")
    val r = Relational.abTestReport(ev, "purchase").head()
    (r.getLong(0), r.getLong(1)) shouldBe ((0L, 1L))
    r.isNullAt(5) shouldBe true
  }

  "Relational.lorenzCurve" should "compute exact bottom-slice shares through straddling classes" in {
    // counts 1, 1, 3, 5 (10 events): quartile shares 0.1 / 0.2 / 0.5 / 1.0
    // — the k=1 point lands INSIDE the size-1 class (2 users), proving the
    // straddle arithmetic, and the curve ends at exactly 1
    val rows = Seq(1L) ++ Seq(2L) ++ Seq.fill(3)(3L) ++ Seq.fill(5)(4L)
    val out = Relational.lorenzCurve(rows.toDF("user_id"), "user_id", deciles = 4)
      .orderBy("decile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out shouldBe Array((1L, 1L, 0.1), (2L, 2L, 0.2), (3L, 3L, 0.5), (4L, 4L, 1.0))
  }

  "Relational.powerLawAlpha" should "recover the exponent of a synthetic Zipf tail" in {
    // per-key counts drawn as round(xmin·u^(−1/(α−1))) with α = 2.5. The
    // estimator's −0.5 discreteness shift assumes zeta-generated counts;
    // on rounded-continuous draws it reads a few tenths low — the band
    // accepts that known bias while still pinning the tail family
    val rnd = new scala.util.Random(17)
    val alpha = 2.5
    val rows = (1 to 2000).flatMap { k =>
      val x = math.max(5L, math.round(5.0 * math.pow(rnd.nextDouble(), -1.0 / (alpha - 1))))
      Seq.fill(math.min(x, 5000L).toInt)(k.toLong)
    }
    val r = Relational.powerLawAlpha(rows.toDF("user_id"), "user_id", xmin = 5L).head()
    r.getLong(0) shouldBe 2000L
    r.getDouble(2) shouldBe 2.5 +- 0.35
    // degenerate tail (every count exactly xmin): Σln = 0-ish but positive
    // (ln(5/4.5) per obs), still finite and > 1
    val flat = (1 to 10).flatMap(k => Seq.fill(5)(k.toLong)).toDF("user_id")
    Relational.powerLawAlpha(flat, "user_id", xmin = 5L).head().getDouble(2) should be > 1.0
  }

  "Relational.joinSkewReport" should "pick the exact percentile class size from the histogram" in {
    // 10 keys: nine singletons and one hot key with 91 rows → 100 rows,
    // mean 10, max 91, skew 9.1; p90 over sizes [1×9, 91]: ceil(0.9·10)=9
    // → the 9th smallest size is 1; p99 rank 10 → 91
    val rows = (1 to 9).map(k => Seq.fill(1)(k.toLong)).flatten ++ Seq.fill(91)(100L)
    val df = rows.toDF("k")
    val r99 = Relational.joinSkewReport(df, "k", percentile = 99).head()
    (r99.getLong(0), r99.getLong(1), r99.getLong(2), r99.getLong(3)) shouldBe ((10L, 100L, 91L, 91L))
    r99.getDouble(4) shouldBe 9.1
    Relational.joinSkewReport(df, "k", percentile = 90).head().getLong(3) shouldBe 1L
  }

  "Relational.kAnonymity" should "count sub-threshold classes and their row exposure exactly" in {
    // classes: (a,1)×4, (a,2)×1 (a singleton), (b,1)×2 → 7 rows, 3 classes
    val rows = Seq.fill(4)(("a", 1L)) ++ Seq(("a", 2L)) ++ Seq.fill(2)(("b", 1L))
    val r = Relational.kAnonymity(rows.toDF("t", "g"), Seq("t", "g"), ks = Seq(2, 5)).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((3L, 7L, 1L, 1L))
    r.getLong(4) shouldBe 1L                 // classes_lt_2: just the singleton
    r.getDouble(5) shouldBe (1.0 / 7 * 1e6).round / 1e6 // exposure_lt_2
    r.getLong(6) shouldBe 3L   // classes_lt_5: sizes 4, 1 and 2 all qualify
    r.getDouble(7) shouldBe 1.0 // every row is exposed below k = 5
  }

  "Relational.linearAttribution" should "split cents exactly with the remainder on the last touch" in {
    val W = 7L * 86400000000L
    val ev = Seq(
      (1L, 0L, 1L, "click", 0.0),
      (2L, 10L, 1L, "view", 0.0),
      (3L, 20L, 1L, "purchase", 1.01),   // 101 cents over 2 touches → 50 + 51
      (4L, 100L - W, 2L, "click", 0.0),  // exactly window edge: excluded (strict >)
      (5L, 100L, 2L, "purchase", 5.0)    // no in-window touch → no credit anywhere
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Relational.linearAttribution(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out shouldBe Map("click" -> ((1L, 50L)), "view" -> ((1L, 51L)))
    out.values.map(_._2).sum shouldBe 101L // conservation to the cent
  }

  it should "conserve cents for a NEGATIVE conversion (refund) via the floor split" in {
    // -5 cents over 2 touches: floor share = (-5 - pmod(-5,2))/2 = -3,
    // last touch absorbs the non-negative remainder 1 → -3 + (-3+1) = -5.
    // (The old trunc-div split credited -2 + (-2+1) = -3 ≠ -5.)
    val ev = Seq(
      (1L, 0L, 1L, "click", 0.0),
      (2L, 10L, 1L, "view", 0.0),
      (3L, 20L, 1L, "purchase", -0.05)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Relational.linearAttribution(ev).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    out shouldBe Map("click" -> -3L, "view" -> -2L)
    out.values.sum shouldBe -5L
  }

  "Relational.stepTransitionTimes" should "time first-occurrence transitions and skip disordered users" in {
    def us(s: Long) = s * 1000000L
    val ev = Seq(
      (1L, us(0), "view"), (1L, us(5), "click"), (1L, us(10), "purchase"),
      (2L, us(0), "view"), (2L, us(20), "click"),
      (3L, us(10), "view"), (3L, us(0), "click") // click BEFORE view: not a v->c transition
    ).toDF("user_id", "ts", "event_type")
    val out = Relational.stepTransitionTimes(ev, Seq("view", "click", "purchase")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // v->c: users 1 and 2, deltas [5, 20] -> p50 = rank 1 = 5, p90 = rank 2 = 20
    out(0) shouldBe (("view", "click", 2L, 5L, 20L))
    // c->p: user 1 only (user 3's purchase never happened)
    out(1) shouldBe (("click", "purchase", 1L, 5L, 5L))
  }

  "Relational.exactQuantiles" should "pick type-1 percentiles from the histogram" in {
    // values 1..10 (in cents: 100..1000): p50 = ceil(0.5·10) = rank 5 →
    // 500; p90 → rank 9 → 900; p99 → rank 10 → 1000
    val df = (1 to 10).map(v => ("a", v.toDouble)).toDF("k", "v")
    val r = Relational.exactQuantiles(df, "k", "v").head()
    (r.getLong(1), r.getLong(2)) shouldBe ((10L, 10L))
    (r.getLong(3), r.getLong(4), r.getLong(5)) shouldBe ((500L, 900L, 1000L))
    // duplicated values collapse in the histogram but keep exact ranks:
    // [1,1,1,9]: p50 = rank 2 → 100; p99 = rank 4 → 900
    val dup = Seq(("b", 1.0), ("b", 1.0), ("b", 1.0), ("b", 9.0)).toDF("k", "v")
    val d2 = Relational.exactQuantiles(dup, "k", "v").head()
    (d2.getLong(1), d2.getLong(2), d2.getLong(3), d2.getLong(5)) shouldBe ((2L, 4L, 100L, 900L))
  }

  "Relational.bootstrapMeanSe" should "be rerun-deterministic and exactly zero on a constant metric" in {
    val users = (1L to 40L).map(u => (u, u * 100L)).toDF("user_id", "cents")
    val r1 = Relational.bootstrapMeanSe(users, "user_id", "cents").head()
    val r2 = Relational.bootstrapMeanSe(users, "user_id", "cents").head()
    r1 shouldBe r2 // no RNG: the same frame twice gives the same SE
    r1.getLong(0) shouldBe 40L
    r1.getDouble(1) shouldBe 2050.0 // Σ u·100 / 40
    r1.getLong(2) should be <= 32L
    r1.getDouble(3) should be > 0.0
    // constant metric: every replica's weighted mean IS the constant
    val const = (1L to 40L).map(u => (u, 500L)).toDF("user_id", "cents")
    val c = Relational.bootstrapMeanSe(const, "user_id", "cents").head()
    (c.getDouble(1), c.getDouble(3)) shouldBe ((500.0, 0.0))
  }

  it should "reject a fractional value column at plan time" in {
    // the decimal(38,0) guarantee is stated on an integer lattice — a
    // double column would be silently truncated by the long cast
    val frac = Seq((1L, 1.25), (2L, 2.5)).toDF("user_id", "spend")
    an[IllegalArgumentException] should be thrownBy
      Relational.bootstrapMeanSe(frac, "user_id", "spend")
  }

  "Relational.conversionWilson" should "bound the rate with the small-n-safe interval" in {
    // one week, 4 viewing users, 1 converts: p = 0.25, Wilson 95% =
    // [0.045586, 0.699364] (the naive ±1.96·se would dip below 0)
    val ev = Seq(
      (1L, "view"), (2L, "view"), (3L, "view"), (4L, "view"),
      (2L, "purchase"),
      (9L, "purchase") // a purchase with no view: not in the base
    ).map { case (u, t) => (1000L, u, t) }.toDF("ts", "user_id", "event_type")
    val r = Relational.conversionWilson(ev, "view", "purchase").head()
    (r.getLong(1), r.getLong(2)) shouldBe ((4L, 1L))
    (r.getDouble(3), r.getDouble(4), r.getDouble(5)) shouldBe ((0.25, 0.045586, 0.699364))
  }

  "Relational.lDiversity" should "count low-diversity classes and catch the homogeneity attack" in {
    // class a: one user ×3 (homogeneous), class b: 2 users, class c: 3 users
    val rows = Seq(("a", 1L), ("a", 1L), ("a", 1L),
      ("b", 1L), ("b", 2L),
      ("c", 1L), ("c", 2L), ("c", 3L)).toDF("t", "u")
    val r = Relational.lDiversity(rows, Seq("t"), "u", ls = Seq(2, 3)).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((3L, 8L, 1L, 1L))
    r.getLong(4) shouldBe 1L      // classes_lt_2: only the homogeneous one
    r.getDouble(5) shouldBe 0.375 // 3 of 8 rows
    r.getLong(6) shouldBe 2L      // classes_lt_3: a and b
    r.getDouble(7) shouldBe 0.625 // 5 of 8 rows
  }

  "Relational.rankCorrelation" should "score monotone 1, antitone -1, and enforce the population guard" in {
    val mono = Seq((1L, 1L, 10L), (2L, 2L, 20L), (3L, 3L, 30L)).toDF("id", "x", "y")
    val m = Relational.rankCorrelation(mono, "x", "y", "id").head()
    (m.getLong(0), m.getDouble(1)) shouldBe ((3L, 1.0))
    val anti = Seq((1L, 1L, 30L), (2L, 2L, 20L), (3L, 3L, 10L)).toDF("id", "x", "y")
    Relational.rankCorrelation(anti, "x", "y", "id").head().getDouble(1) shouldBe -1.0
    // a swapped middle pair: ranks x=(1,2,3), y=(1,3,2) → rho = 1 - 6·2/24
    val mid = Seq((1L, 1L, 10L), (2L, 2L, 30L), (3L, 3L, 20L)).toDF("id", "x", "y")
    Relational.rankCorrelation(mid, "x", "y", "id").head().getDouble(1) shouldBe 0.5
    an[IllegalArgumentException] should be thrownBy
      Relational.rankCorrelation(mono, "x", "y", "id", maxRows = 2L)
  }
}
