package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** carried EWMA state per key: samples seen and the current smoothed level. */
final case class EwmaState(n: Long, ewma: Double)

/** carried funnel state per key: stages completed and the ts of the last match. */
final case class FunnelState(stage: Int, ts: Long)

/** one emitted funnel advance: `key` reached `stage` (1-based) at `ts`. */
final case class FunnelAdvance(key: String, stage_idx: Int, stage: String, ts: Long)

/** one emitted anomaly: the observation and the level it violated. */
final case class EwmaAnomaly(key: String, ts: Long, value: Double,
                             ewma: Double, deviation: Double)

/** carried Space-Saving summary per group: one bounded counter table.
  * `counts(item)` may OVERCOUNT by at most `overs(item)` (the evicted
  * count the item inherited), never undercount. */
final case class TopKState(counts: Map[String, Long], overs: Map[String, Long])

/** one current heavy hitter: true count ∈ [count - overcount, count]. */
final case class HeavyHitter(group: String, item: String, count: Long,
                             overcount: Long, rank: Int)

/** carried P² quantile state per key: observation count, the five marker
  * heights (ascending) and their integer positions. Until five samples
  * arrive, `heights` is the raw sorted buffer. */
final case class P2State(count: Long, heights: Seq[Double], positions: Seq[Long])

/** one emitted quantile estimate: the key's current P² estimate of `p`
  * after `n` observations (exact while n ≤ 5). */
final case class QuantileEstimate(key: String, n: Long, p: Double, estimate: Double)

/**
 * Arbitrary-stateful streaming monitors (`flatMapGroupsWithState`) — state
 * beyond what windowed aggregation can carry: a recurrence whose value
 * depends on the ENTIRE history of the key, kept as O(1) state per key.
 *
 * The reference's streaming surface stops at windowed re-push
 * (`nsdb-cluster/.../PublisherActor.scala` — per-query periodic aggregates);
 * this goes beyond parity the same way the batch scan operators do
 * ([[graft.operators.TimeSeries.ewmaScan]] is the batch face of the same
 * recurrence, and the spec pins the two to each other).
 */
object StatefulMonitors {

  /**
   * STREAMING EWMA ANOMALY MONITOR — per key, maintain the EWMA of the
   * value stream (`s1 = x1`, `si = alpha*xi + (1-alpha)*s(i-1)`; the
   * [[graft.operators.TimeSeries.ewmaScan]] recurrence) across micro-
   * batches, and emit an [[EwmaAnomaly]] whenever an arriving value
   * deviates from the CURRENT level by more than `band` — level-shift
   * alerting with per-key adaptive baselines, in the stream.
   *
   * Scale shape: state is ONE (n, ewma) pair per key — O(keys), not
   * O(history); keys process in parallel across executors; within a
   * micro-batch a key's rows sort by `(ts, value)` so replay order (and
   * therefore the recurrence) is deterministic under any shuffle. Batch
   * memory per key is that key's batch slice only.
   *
   * Keys are metric names (a bounded domain, like the reference's metric
   * streams), so state needs no eviction — `NoTimeout`. For unbounded key
   * domains add a timeout in the caller's fork; dropping state merely
   * re-seeds the baseline.
   *
   * Input columns: `(key string, ts long, value double)`. Append mode.
   */
  /**
   * STREAMING SESSION WINDOWS — per-key activity sessions with a `gap`
   * inactivity timeout, computed IN the stream via Spark's native
   * `session_window` (state = one open window per key, merged as events
   * arrive, emitted when the watermark closes it). The streaming face of
   * [[graft.operators.Relational.sessionStats]] (same gap semantics) —
   * the reference has no session windows at all (its dialect stops at
   * fixed-width temporal buckets).
   *
   * Returns `(key, session_start, session_end, n_events, sum_value)` per
   * closed session. Watermark bounds the state store: late events beyond
   * `watermarkDelay` are dropped, and a session's state is evicted once
   * the watermark passes its end + gap.
   *
   * Input: `keyCol` string, `tsCol` TIMESTAMP event time, `valueCol`
   * numeric.
   */
  def sessionWindows(
      stream: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes",
      keyCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value"
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
  }

  /**
   * STREAMING FUNNEL MONITOR — per key, track progress through an ordered
   * stage sequence IN the stream and emit a [[FunnelAdvance]] the moment a
   * key completes its next stage. The streaming face of
   * [[graft.operators.Relational.funnel]] with identical greedy-earliest
   * semantics: stage `i+1` counts only STRICTLY after the stage-`i` match
   * (same-timestamp events do not advance), so replaying a stream through
   * this monitor reaches exactly the batch `stage_reached` per key — the
   * spec pins the two to each other.
   *
   * Scale shape: state is ONE (stage, ts) pair per key — O(keys), not
   * O(events); a completed funnel's state is cleared, so a converting key
   * frees its slot and a later pass counts as a FRESH conversion (batch
   * parity holds per pass). Within a micro-batch a key's slice sorts by
   * `(ts, stage)` so the fold is deterministic under any shuffle; parity
   * with the batch operator assumes event-time-ordered arrival across
   * batches (an unmatched later-stage event is skipped, never buffered).
   * Add a timeout in a fork if keys can stall mid-funnel forever.
   *
   * Input columns: `(key string, ts long, stage string)`. Append mode.
   */
  def funnelProgress(
      stream: DataFrame,
      stages: Seq[String],
      keyCol: String = "user_id",
      tsCol: String = "ts",
      stageCol: String = "event_type"
  ): Dataset[FunnelAdvance] = {
    require(stages.nonEmpty, "stages must be non-empty")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    val spark = stream.sparkSession
    import spark.implicits._
    val stageArr = stages.toArray
    stream
      .selectExpr(s"CAST($keyCol AS STRING) AS _1", s"CAST($tsCol AS LONG) AS _2",
        s"CAST($stageCol AS STRING) AS _3")
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long, String)],
         state: GroupState[FunnelState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var st  = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = Seq.newBuilder[FunnelAdvance]
          sorted.foreach { case (_, ts, stage) =>
            if (st.stage < stageArr.length && stage == stageArr(st.stage) &&
                (st.stage == 0 || ts > st.ts)) {
              st = FunnelState(st.stage + 1, ts)
              out += FunnelAdvance(key, st.stage, stage, ts)
            }
          }
          if (st.stage >= stageArr.length) state.remove() // funnel done: free the key
          else state.update(st)
          out.result().iterator
      }
  }

  def ewmaAnomalies(
      stream: DataFrame,
      alpha: Double = 0.25,
      band: Double = 2.0,
      keyCol: String = "event_type",
      tsCol: String = "ts",
      valueCol: String = "value"
  ): Dataset[EwmaAnomaly] = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    require(band > 0.0, "band must be positive")
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .selectExpr(s"$keyCol AS _1", s"CAST($tsCol AS LONG) AS _2",
        s"CAST($valueCol AS DOUBLE) AS _3")
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long, Double)],
         state: GroupState[EwmaState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var st  = state.getOption.getOrElse(EwmaState(0L, 0.0))
          val out = Seq.newBuilder[EwmaAnomaly]
          sorted.foreach { case (_, ts, v) =>
            if (st.n > 0L && math.abs(v - st.ewma) > band)
              out += EwmaAnomaly(key, ts, v, st.ewma, v - st.ewma)
            val next = if (st.n == 0L) v else alpha * v + (1.0 - alpha) * st.ewma
            st = EwmaState(st.n + 1L, next)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /**
   * STREAMING HEAVY HITTERS — per group, the current top-`k` most frequent
   * items of an UNBOUNDED item domain (top user_ids per event type, top
   * crawl hosts per language), maintained across micro-batches with the
   * Space-Saving summary (Metwally et al. 2005, "Efficient computation of
   * frequent and top-k elements in data streams"): at most `capacity`
   * counters per group; a new item under pressure EVICTS the minimum
   * counter and inherits its count as its `overcount` bound. Guarantees:
   * reported `count` never undercounts the true count, exceeds it by at
   * most `overcount` ≤ N/capacity, and any item with true frequency >
   * N/capacity is IN the summary — exactly the bound a monitoring surface
   * needs ("is anything above 1/capacity of traffic?").
   *
   * An exact streaming groupBy(item) would carry O(distinct items) state —
   * unbounded on id-valued columns; this carries O(groups × capacity),
   * fixed at deployment time. Each trigger emits the group's CURRENT
   * top-k ranking (Update mode semantics: downstream sinks upsert by
   * (group, rank)).
   *
   * Determinism: with `deterministic = true` (default) a group's rows
   * fold in (item) sorted order within each micro-batch, min-counter
   * eviction ties break on the item string, and the emitted ranking
   * orders by (count desc, item) — replays reproduce. That sort buffers
   * the group's rows for ONE trigger, so per-trigger memory is
   * O(rows per group per batch) even though the CARRIED state stays
   * O(capacity). `deterministic = false` folds in ITERATOR order — O(1)
   * per row, no per-batch buffer, the right posture for a hot group
   * whose single-trigger row volume is itself a memory concern. The
   * Space-Saving guarantees (no undercount, overcount ≤ N/capacity,
   * total counted mass) hold identically either way; only which item a
   * TIED min-counter eviction picks — and therefore replay determinism —
   * depends on arrival order.
   *
   * Input columns: `(groupCol string, itemCol string)`. Update mode.
   */
  def heavyHitters(
      stream: DataFrame,
      k: Int,
      capacity: Int,
      groupCol: String = "event_type",
      itemCol: String = "user_id",
      deterministic: Boolean = true
  ): Dataset[HeavyHitter] = {
    require(k > 0, "k must be positive")
    require(capacity >= k, "capacity must be >= k (the summary must hold the answer)")
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .selectExpr(s"CAST($groupCol AS STRING) AS _1", s"CAST($itemCol AS STRING) AS _2")
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (group: String, rows: Iterator[(String, String)],
         state: GroupState[TopKState]) =>
          var st = state.getOption.getOrElse(TopKState(Map.empty, Map.empty))
          val itemsInOrder =
            if (deterministic) rows.map(_._2).toSeq.sorted.iterator else rows.map(_._2)
          itemsInOrder.foreach { item =>
            st.counts.get(item) match {
              case Some(c) => st = st.copy(counts = st.counts.updated(item, c + 1L))
              case None if st.counts.size < capacity =>
                st = TopKState(st.counts.updated(item, 1L), st.overs.updated(item, 0L))
              case None =>
                val (evict, m) = st.counts.minBy { case (i, c) => (c, i) }
                st = TopKState(
                  st.counts - evict + (item -> (m + 1L)),
                  st.overs - evict + (item -> m))
            }
          }
          state.update(st)
          st.counts.toSeq
            .sortBy { case (i, c) => (-c, i) }
            .take(k)
            .zipWithIndex
            .map { case ((item, c), r) =>
              HeavyHitter(group, item, c, st.overs(item), r + 1)
            }
            .iterator
      }
  }

  /**
   * STREAMING QUANTILE MONITOR — per key, maintain the P² estimate (Jain &
   * Chlamtac 1985) of the `p`-quantile of the value stream in O(1) state:
   * five marker heights whose positions chase the ideal `p`-split of the
   * count via parabolic interpolation. The latency-percentile /
   * value-distribution tracker next to [[ewmaMonitor]]'s level tracker —
   * an exact streaming quantile needs the full history, this needs 10
   * numbers per key and is the textbook trade.
   *
   * Emits one [[QuantileEstimate]] per key per micro-batch (Update mode).
   * EXACT while a key has ≤ 5 observations (the buffer IS the data;
   * nearest-rank-interpolated); after that, the P² approximation —
   * accuracy is distribution-dependent (typically ≲1 % mid-quantiles on
   * unimodal data), so treat the output as a monitor signal, not an
   * oracle-class statistic (the batch exact quantiles remain the
   * ground truth).
   *
   * Determinism: a key's batch slice replays in ascending `(ts, value)`
   * order, so the marker recurrence — order-dependent, like every
   * streaming sketch — is reproducible under any shuffle given the same
   * batch boundaries. Scale shape: state is 2×5 numbers + a count per
   * key; keys parallelize across executors.
   *
   * `deterministic = false` folds the batch slice in ITERATOR order —
   * O(1) per row, no per-batch sort buffer, mirroring [[heavyHitters]]'s
   * flag: the right posture for a hot key whose single-trigger volume is
   * itself a memory concern. The P² invariants (marker monotonicity,
   * count conservation) hold either way; only the exact marker heights —
   * and therefore replay determinism — depend on arrival order.
   *
   * Input columns: `(key string, ts long, value double)`. Update mode.
   */
  def quantileMonitor(
      stream: DataFrame,
      p: Double = 0.5,
      keyCol: String = "key",
      tsCol: String = "ts",
      valueCol: String = "value",
      deterministic: Boolean = true
  ): Dataset[QuantileEstimate] = {
    require(p > 0.0 && p < 1.0, "p must be in (0, 1)")
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .selectExpr(s"CAST($keyCol AS STRING) AS _1", s"CAST($tsCol AS LONG) AS _2",
        s"CAST($valueCol AS DOUBLE) AS _3")
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long, Double)],
         state: GroupState[P2State]) =>
          var st = state.getOption.getOrElse(P2State(0L, Vector.empty, Vector.empty))
          val ordered =
            if (deterministic) rows.toSeq.sortBy(r => (r._2, r._3)).iterator else rows
          ordered.foreach { case (_, _, x) =>
            st = p2Observe(st, x, p)
          }
          state.update(st)
          if (st.count == 0L) Iterator.empty
          else Iterator.single(QuantileEstimate(key, st.count, p, p2Estimate(st, p)))
      }
  }

  /** one P² observation step (exact sorted buffer until 5 samples). */
  private[graft] def p2Observe(st: P2State, x: Double, p: Double): P2State = {
    if (st.count < 5L) {
      val buf = (st.heights :+ x).sorted
      val pos = if (buf.size == 5) Vector(1L, 2L, 3L, 4L, 5L) else Vector.empty[Long]
      return P2State(st.count + 1L, buf, pos)
    }
    val q = st.heights.toArray
    val n = st.positions.toArray
    // marker cell of x (clamping the extremes to the outer markers)
    val k =
      if (x < q(0)) { q(0) = x; 0 }
      else if (x >= q(4)) { q(4) = x; 3 }
      else (0 to 3).reverse.find(i => q(i) <= x).get
    for (i <- (k + 1) to 4) n(i) += 1L
    val count = st.count + 1L
    // desired marker positions for the current count
    val d = Array(1.0, 1.0 + (count - 1) * p / 2.0, 1.0 + (count - 1) * p,
      1.0 + (count - 1) * (1.0 + p) / 2.0, count.toDouble)
    for (i <- 1 to 3) {
      val delta = d(i) - n(i)
      if ((delta >= 1.0 && n(i + 1) - n(i) > 1L) || (delta <= -1.0 && n(i - 1) - n(i) < -1L)) {
        val s = if (delta >= 1.0) 1L else -1L
        val sD = s.toDouble
        // parabolic (P²) height update; fall back to linear if it would
        // break marker monotonicity
        val para = q(i) + sD / (n(i + 1) - n(i - 1)) * (
          (n(i) - n(i - 1) + s) * (q(i + 1) - q(i)) / (n(i + 1) - n(i)) +
            (n(i + 1) - n(i) - s) * (q(i) - q(i - 1)) / (n(i) - n(i - 1)))
        q(i) =
          if (q(i - 1) < para && para < q(i + 1)) para
          else q(i) + sD * (q((i + s).toInt) - q(i)) / (n((i + s).toInt) - n(i))
        n(i) += s
      }
    }
    P2State(count, q.toVector, n.toVector)
  }

  /** current estimate: the middle marker after 5 samples; the nearest-rank
    * interpolation of the exact sorted buffer before that. */
  private[graft] def p2Estimate(st: P2State, p: Double): Double = {
    val b = st.heights
    if (st.count >= 5L) b(2)
    else {
      val pos  = (b.size - 1) * p
      val lo   = math.floor(pos).toInt
      val hi   = math.ceil(pos).toInt
      val frac = pos - lo
      b(lo) + frac * (b(hi) - b(lo))
    }
  }

  /**
   * WATERMARKED STREAM-STREAM INTERVAL JOIN — enrich each left event with
   * the right-stream events of the same key that happened within
   * `[left.ts - lookbackMs, left.ts]` (attribution joins: conversions ×
   * recent touches, errors × recent deploys). The reference has no
   * stream-stream joins at all (R7 n/a); this is the Structured-Streaming-
   * native shape: BOTH sides watermarked, the join condition carries the
   * time bound, so Spark buffers each side only `watermark + lookback`
   * deep and evicts state as the watermark advances — bounded state at any
   * input rate, the only viable shape at 100 TB/day.
   *
   * Input: both frames `(keyCol, tsCol TIMESTAMP, ...)`. Inner join;
   * append mode downstream.
   */
  def enrichWithin(
      leftDf: DataFrame,
      rightDf: DataFrame,
      keyCol: String,
      tsCol: String,
      lookbackMs: Long,
      watermarkDelay: String = "10 seconds"
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    require(lookbackMs > 0, "lookbackMs must be positive")
    val l = leftDf.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).as("__k"), col(tsCol).as("__lts"),
        struct(leftDf.columns.map(col).toSeq: _*).as("left_row"))
    val r = rightDf.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).as("__rk"), col(tsCol).as("__rts"),
        struct(rightDf.columns.map(col).toSeq: _*).as("right_row"))
    l.join(r,
      col("__k") === col("__rk") &&
        col("__rts") <= col("__lts") &&
        col("__rts") >= col("__lts") - expr(s"INTERVAL $lookbackMs MILLISECONDS"))
      .select(col("__k").as(keyCol), col("left_row"), col("right_row"))
  }
}
