package graft.exec

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.MetricSchema
import graft.plan.{PlannedQuery, TimeBuckets, TimeContext}
import graft.plan.TimeBuckets.Span
import graft.sql.Ast._

/** Time-shard partition column metadata for a warehouse-backed metric.
  * `liveBounds` are the [oldest-shard-start, newest-shard-end] millis derived
  * from the partition directory listing — a metadata-only operation.
  * `liveIds` are the live shard ids themselves (same listing), used for
  * early-terminating ordered iteration.
  * `rowCount` is a metadata-only per-shard row counter (parquet footer
  * record counts, read driver-side — no Spark job); absent for sources
  * that cannot provide one cheaply. */
final case class ShardInfo(
    colName: String,
    intervalMs: Long,
    liveBounds: Option[(Long, Long)] = None,
    liveIds: Seq[Long] = Seq.empty,
    rowCount: Option[Long => Long] = None)

/**
 * Raw-time mirror for metrics whose canonical `timestamp` is DERIVED from a
 * source column (e.g. epoch-nanos → millis): Catalyst cannot push a filter
 * through the arithmetic, so the executor mirrors every time span onto the
 * raw column (`raw ∈ [lo*unitsPerMs, (hi+1)*unitsPerMs)`), which DOES reach
 * the parquet scan and enables row-group skipping.
 *
 * `tsType` handles a raw column that is itself a (µs-precision) timestamp
 * rather than an integer: bounds then compare as timestamp literals of the
 * matching flavor (NTZ vs LTZ — a mismatched flavor would block pushdown),
 * with `unitsPerMs` = 1000 (µs per ms).
 */
final case class TimeMirror(
    colName: String,
    unitsPerMs: Long,
    tsType: Option[DataType] = None) {

  /** literal comparable (and parquet-pushable) against the raw column.
    * NTZ bounds render the instant in the SESSION timezone: the derived-ms
    * expression (`unix_millis(cast(ntz as timestamp))`) interprets the wall
    * clock in that zone, so the mirror must use the same zone or the ANDed
    * raw filter would be offset-shifted under a non-UTC session timezone. */
  def boundLit(rawUnits: Long): Column = tsType match {
    case None => lit(rawUnits)
    case Some(TimestampNTZType) =>
      val zone = java.time.ZoneId.of(
        org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
      lit(java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochSecond(
          Math.floorDiv(rawUnits, 1000000L),
          Math.floorMod(rawUnits, 1000000L) * 1000L),
        zone))
    case Some(_) =>
      lit(java.time.Instant.ofEpochSecond(
        Math.floorDiv(rawUnits, 1000000L),
        Math.floorMod(rawUnits, 1000000L) * 1000L))
  }
}

/** A queryable metric: its DataFrame (canonical columns `timestamp`, `value`, dims/tags) + schema.
  * `shard` is present for warehouse-backed metrics and enables partition pruning;
  * `timeMirror` lets derived-timestamp sources keep parquet row-group skipping. */
/** A maintained sufficient-statistics rollup attached to a metric
  * ([[graft.operators.Rollup.buildForServing]] grain: cells `(U-step, U]`
  * keyed by upper edge): the engine's analogue of the reference's
  * write-time facet indexes (`AllFacetIndexes.scala:147-169`) — eligible
  * temporal aggregations are served from it without scanning raw points. */
final case class RollupRef(stats: DataFrame, stepMs: Long)

final case class MetricRef(
    df: DataFrame,
    schema: MetricSchema,
    shard: Option[ShardInfo] = None,
    timeMirror: Option[TimeMirror] = None,
    rollup: Option[RollupRef] = None)

/**
 * Compiles [[PlannedQuery]] shapes into DataFrame pipelines.
 *
 * Everything stays declarative so Catalyst handles predicate pushdown,
 * column pruning, partial/final aggregation and top-k
 * (`TakeOrderedAndProject`) natively; the only non-built-in pieces are the
 * reference's semantic quirks: null-safe NOT, `$` LIKE wildcard, the
 * limit-clamped global count, backward-anchored temporal buckets and the
 * "last v buckets" temporal limit.
 */
/** Executor-level knobs. `approxDistinctRsd`: when set, COUNT DISTINCT
  * runs as `approx_count_distinct` (HyperLogLog++, relative sd = the
  * value) instead of the exact shuffle-heavy form — the documented 100 TB
  * opt-in (SURVEY §7.4: the reference is exact via per-shard sets; exact
  * stays the default for parity).
  *
  * `emitEmptyBuckets`: temporal buckets with no matching rows emit
  * anyway — value 0 for COUNT/COUNT DISTINCT/SUM/MIN/MAX, null otherwise
  * — matching the reference's Lucene range facets, which report EVERY
  * declared range (`FacetRangeIndex.executeRangeFacet:42-77` builds one
  * `LongRange` per computed bucket and `labelValues` returns them all,
  * zero-count ranges included; empty min/max facets report 0, the origin
  * of the documented min-zero merge quirk). Default off: emitting only
  * populated buckets is the natural groupBy semantics and what the
  * oracle checks.
  *
  * `anchorUnboundedAtNow`: a temporal query with NO time predicate
  * anchors its newest bucket at the query's `now` (`TimeContext
  * .currentTime`, clamped no earlier than the data's max) instead of the
  * data/shard upper bound — matching the reference, whose unbounded
  * buckets anchor at the LIVE shard location's interval end (≈ wall
  * clock) rather than the newest point (`ReadCoordinator.scala:259-272`:
  * `upperBound = limitedLocations.last.to`). Default off: data-bound
  * anchoring keeps results reproducible across re-runs. */
final case class ExecConfig(
    approxDistinctRsd: Option[Double] = None,
    emitEmptyBuckets: Boolean = false,
    anchorUnboundedAtNow: Boolean = false)

object Executor {

  // ---- predicate compilation ---------------------------------------------

  /** Translate the `$` wildcard dialect to SQL LIKE (`$`→`%`, literal `%`/`_` escaped). */
  def likePattern(p: String): String = p.flatMap {
    case '$'  => "%"
    case '%'  => "\\%"
    case '_'  => "\\_"
    case '\\' => "\\\\"
    case c    => c.toString
  }

  /**
   * Compile a predicate to a Column. NOT is null-safe (`!coalesce(p, false)`)
   * to match the reference's Lucene MUST_NOT semantics, where a negated
   * predicate over a missing field MATCHES the record — Spark's three-valued
   * `!` would propagate the null instead (reference:
   * `nsdb-core/.../statement/ExpressionParser.scala:205-212`).
   */
  def compile(p: Predicate, tc: TimeContext): Column = p match {
    case EqPred(f, v)       => col(f) === lit(v.resolve(tc.currentTime))
    case CmpPred(f, op, v)  =>
      val l = lit(v.resolve(tc.currentTime))
      op match {
        case Gt  => col(f) > l
        case Gte => col(f) >= l
        case Lt  => col(f) < l
        case Lte => col(f) <= l
      }
    case RangePred(f, lo, hi) =>
      col(f).between(lit(lo.resolve(tc.currentTime)), lit(hi.resolve(tc.currentTime)))
    case LikePred(f, pat) => col(f).like(likePattern(pat))
    case NullPred(f)      => col(f).isNull
    case NotPred(inner)   => !coalesce(compile(inner, tc), lit(false))
    case AndPred(l, r)    => compile(l, tc) && compile(r, tc)
    case OrPred(l, r)     => compile(l, tc) || compile(r, tc)
  }

  // ---- aggregation columns -----------------------------------------------

  /** Aggregate column + its canonical output name. */
  private def aggColumn(agg: Agg, limit: Option[Int])(implicit cfg: ExecConfig): (String, Column) = agg match {
    case CountAgg(f) =>
      // the reference clamps a global/grouped count at LIMIT if present
      // (`post_proc/package.scala:343-347`)
      val c = if (f == "value" || f == "*") count(lit(1)) else count(col(f))
      "count" -> limit.fold(c)(l => least(c, lit(l.toLong)))
    case CountDistinctAgg(f) =>
      "count_distinct" -> cfg.approxDistinctRsd.fold(count_distinct(col(f)))(rsd =>
        approx_count_distinct(col(f), rsd))
    case SumAgg(f)           => "sum"            -> sum(col(f))
    case MinAgg(f)           => "min"            -> min(col(f))
    case MaxAgg(f)           => "max"            -> max(col(f))
    case AvgAgg(f)           => "avg"            -> avg(col(f))
    case FirstAgg(_)         => "first"          -> min_by(struct(col("timestamp"), col("value")), col("timestamp"))
    case LastAgg(_)          => "last"           -> max_by(struct(col("timestamp"), col("value")), col("timestamp"))
  }

  // ---- plan execution ----------------------------------------------------

  def execute(plan: PlannedQuery, metric: MetricRef, tc: TimeContext): DataFrame =
    execute(plan, metric, tc, ExecConfig())

  def execute(plan: PlannedQuery, metric: MetricRef, tc: TimeContext, cfg: ExecConfig): DataFrame = {
    implicit val c: ExecConfig = cfg
    plan match {
      case p: PlannedQuery.Simple      => executeSimple(p, metric, tc)
      case p: PlannedQuery.GlobalAgg   => executeGlobal(p, metric, tc)
      case p: PlannedQuery.TagAgg      => executeTagAgg(p, metric, tc)
      case p: PlannedQuery.TemporalAgg => executeTemporal(p, metric, tc)
      case _: PlannedQuery.Delete =>
        throw new IllegalArgumentException("DELETE must be executed through the warehouse")
    }
  }

  private def filtered(df: DataFrame, where: Option[Predicate], tc: TimeContext): DataFrame =
    where.fold(df)(p => df.filter(compile(p, tc)))

  /**
   * Shard pruning: derive partition-column bounds from the statement's time
   * spans so Catalyst prunes shard directories — the Spark-native analogue
   * of the reference's `filterLocationsThroughTime`
   * (`ReadCoordinator.scala:210-214`).
   */
  def filtered(m: MetricRef, where: Option[Predicate], tc: TimeContext): DataFrame = {
    val base  = filtered(m.df, where, tc)
    val spans = TimeBuckets.extractSpans(where, tc)
    if (spans.isEmpty) return base

    val shardPred = m.shard.map { si =>
      spans.map { s =>
        val c  = col(si.colName)
        val lo = if (s.lo == Long.MinValue) lit(true) else c >= math.floorDiv(s.lo, si.intervalMs)
        val hi = if (s.hi == Long.MaxValue) lit(true) else c <= math.floorDiv(s.hi, si.intervalMs)
        lo && hi
      }.reduce(_ || _)
    }
    val mirrorPred = m.timeMirror.map { tm =>
      val u = tm.unitsPerMs
      spans.map { s =>
        val c  = col(tm.colName)
        val lo = if (s.lo == Long.MinValue || s.lo < Long.MinValue / u) lit(true) else c >= tm.boundLit(s.lo * u)
        val hi = if (s.hi == Long.MaxValue || s.hi + 1 > Long.MaxValue / u) lit(true) else c < tm.boundLit((s.hi + 1) * u)
        lo && hi
      }.reduce(_ || _)
    }
    Seq(shardPred, mirrorPred).flatten.foldLeft(base)(_.filter(_))
  }

  private def executeSimple(p: PlannedQuery.Simple, m: MetricRef, tc: TimeContext): DataFrame = {
    val base = filtered(m, p.where, tc)
    if (p.distinct) {
      // SELECT DISTINCT f — just the distinct values of the single field
      val f   = p.fields.head.name
      val d   = base.select(col(f)).distinct()
      val ord = p.order.filter(_.field == f).map(o => if (o.desc) col(f).desc else col(f).asc)
      val sorted = ord.fold(d)(d.orderBy(_))
      p.limit.fold(sorted)(sorted.limit)
    } else {
      // timestamp and value are always part of the projection (reference:
      // `nsdb-core/.../statement/FieldsParser.scala:78-93`)
      val names =
        if (p.fields.isEmpty) m.schema.orderedNames
        else {
          val requested = p.fields.map(_.name).filterNot(n => n == "timestamp" || n == "value" || n == "*")
          Seq("timestamp", "value").filter(m.schema.contains) ++ requested.distinct
        }
      // O3, early-terminating ordered shard iteration (reference: ordered
      // index scans stop once LIMIT rows are collected): for ORDER BY
      // timestamp + LIMIT on a sharded metric, shard ids order the time
      // blocks totally, so the global top-k lives in the newest (resp.
      // oldest) shards whose cumulative row count reaches k — every other
      // shard directory is never opened. At 100 TB a "latest 100 events"
      // query touches one shard instead of years. Counts come from parquet
      // footer metadata read driver-side (ShardInfo.rowCount) — NO Spark
      // job runs at plan-construction time, so sql()/explain stay
      // side-effect free. With a WHERE the exact matching count would need
      // a scan that duplicates the real query's work, so filtered queries
      // keep the plain plan: shard pruning + TakeOrderedAndProject already
      // read each pruned shard exactly once, in parallel.
      val narrowed = (p.order, p.limit, m.shard) match {
        case (Some(o), Some(k), Some(si))
            if o.field == "timestamp" && si.liveIds.nonEmpty && p.where.isEmpty && si.rowCount.isDefined =>
          val countOf    = si.rowCount.get
          val idsInOrder = if (o.desc) si.liveIds.sorted.reverse else si.liveIds.sorted
          val used       = scala.collection.mutable.ListBuffer[Long]()
          var acc        = 0L
          val it         = idsInOrder.iterator
          while (acc < k && it.hasNext) {
            val s = it.next()
            used += s
            acc += countOf(s)
          }
          if (used.size == idsInOrder.size) base
          else base.filter(col(si.colName).isin(used.toSeq: _*))
        case _ => base
      }
      // sort+limit BEFORE the projection so ORDER BY may reference any schema
      // field (the reference sorts at the index scan); Catalyst fuses this
      // into a single TakeOrderedAndProject when a limit is present
      val sorted = p.order.fold(narrowed) { o =>
        narrowed.orderBy(if (o.desc) col(o.field).desc else col(o.field).asc)
      }
      val limited = p.limit.fold(sorted)(sorted.limit)
      limited.select(names.map(col): _*)
    }
  }

  /** GLOBAL aggregations from the stats table: pure-aggregate queries
    * (no plain fields) whose WHERE is absent (serve ALL cells) or
    * time-only with grain-aligned spans — the dashboard-count fast path. */
  private def rollupGlobal(p: PlannedQuery.GlobalAgg, m: MetricRef, tc: TimeContext): Option[DataFrame] =
    m.rollup.flatMap { r =>
      val spans   = TimeBuckets.extractSpans(p.where, tc)
      val whereOk = p.where.forall(TimeBuckets.isTimeOnly(_))
      val spansOk = p.where.isEmpty || (spans.nonEmpty && spans.forall(spanAligned(_, r.stepMs)))
      val cols    = p.aggs.map(a => statsAgg(a, p.limit).map(c => (a, c)))
      if (p.plainFields.nonEmpty || !whereOk || !spansOk || cols.exists(_.isEmpty)) None
      else {
        val cells = if (p.where.isEmpty) r.stats else r.stats.filter(cellFilter(spans, r.stepMs))
        val named = cols.flatten.map { case (a, c) =>
          a match {
            case _: SumAgg | _: AvgAgg => coalesce(c, lit(0)).as(a.keyword)
            case _                     => c.as(a.keyword)
          }
        }
        val row = cells.agg(named.head, named.tail: _*)
        Some(
          if (p.aggs.forall(a => a.isInstanceOf[MinAgg] || a.isInstanceOf[MaxAgg])) row.na.drop("all")
          else row)
      }
    }

  private def executeGlobal(p: PlannedQuery.GlobalAgg, m: MetricRef, tc: TimeContext)(implicit cfg: ExecConfig): DataFrame = rollupGlobal(p, m, tc).getOrElse {
    val base = filtered(m, p.where, tc)
    // empty-input parity (reference global spec): count/sum/avg/count
    // distinct yield 0 on an empty selection; a pure min/max query yields
    // NO row (min/max of nothing is dropped, not null)
    val aggCols = p.aggs.map { agg =>
      val (n, c) = aggColumn(agg, p.limit)
      agg match {
        case _: SumAgg | _: AvgAgg | _: CountDistinctAgg => coalesce(c, lit(0)).as(n)
        case _                                           => c.as(n)
      }
    }
    val rawAggRow = base.agg(aggCols.head, aggCols.tail: _*)
    val aggRow =
      if (p.aggs.forall(a => a.isInstanceOf[MinAgg] || a.isInstanceOf[MaxAgg]))
        rawAggRow.na.drop("all")
      else rawAggRow
    if (p.plainFields.isEmpty) aggRow
    else {
      // mixed plain fields + global aggregates: every output row carries the
      // plain fields plus the (identical) global aggregate values — the
      // Spark-idiomatic shape for the reference's head/tail trick
      // (`post_proc/package.scala:385-392`) is a broadcast cross join.
      val names = Seq("timestamp", "value") ++
        p.plainFields.map(_.name).filterNot(n => n == "timestamp" || n == "value").distinct
      val sorted = p.order.fold(base)(o => base.orderBy(if (o.desc) col(o.field).desc else col(o.field).asc))
      val limited = p.limit.fold(sorted)(sorted.limit)
      limited.select(names.map(col): _*).crossJoin(broadcast(aggRow))
    }
  }

  /** TAG-grouped aggregations from a stats table KEYED by (at least) the
    * group tag: the per-tag facet read. Same eligibility as
    * [[rollupGlobal]] plus the tag column present in the stats. */
  private def rollupTagAgg(p: PlannedQuery.TagAgg, m: MetricRef, tc: TimeContext): Option[DataFrame] =
    m.rollup.flatMap { r =>
      val spans   = TimeBuckets.extractSpans(p.where, tc)
      val whereOk = p.where.forall(TimeBuckets.isTimeOnly(_))
      val spansOk = p.where.isEmpty || (spans.nonEmpty && spans.forall(spanAligned(_, r.stepMs)))
      val tagOk   = r.stats.columns.contains(p.tag)
      statsAgg(p.agg, None) match {
        case Some(c) if whereOk && spansOk && tagOk =>
          val cells = if (p.where.isEmpty) r.stats else r.stats.filter(cellFilter(spans, r.stepMs))
          Some(cells.filter(col(p.tag).isNotNull).groupBy(col(p.tag)).agg(c.as("value")))
        case _ => None
      }
    }

  private def executeTagAgg(p: PlannedQuery.TagAgg, m: MetricRef, tc: TimeContext)(implicit cfg: ExecConfig): DataFrame = {
    // records missing the group tag are excluded, matching the reference's
    // facet semantics (a doc without the tag simply isn't in the taxonomy);
    // Spark's groupBy would otherwise emit a NULL group
    lazy val base = filtered(m, p.where, tc).filter(col(p.tag).isNotNull)
    val out = rollupTagAgg(p, m, tc).getOrElse(p.agg match {
      case FirstAgg(_) | LastAgg(_) =>
        val (n, c) = aggColumn(p.agg, None)
        base
          .groupBy(col(p.tag))
          .agg(c.as(n))
          .select(col(n)("timestamp").as("timestamp"), col(p.tag), col(n)("value").as("value"))
      case agg =>
        // LIMIT on a group-by query limits the number of groups, it does not
        // clamp the count itself (clamping is global-count-only)
        val (_, c) = aggColumn(agg, None)
        base.groupBy(col(p.tag)).agg(c.as("value"))
    })
    val sorted = p.order.fold(out) { o =>
      val key = if (o.field == "*" || o.field == "value") col("value") else col(o.field)
      out.orderBy(if (o.desc) key.desc else key.asc)
    }
    p.limit.fold(sorted)(sorted.limit)
  }

  private def executeTemporal(p: PlannedQuery.TemporalAgg, m: MetricRef, tc: TimeContext)(implicit cfg: ExecConfig): DataFrame = {
    val len = p.intervalMs

    // bucket bounds: WHERE-clause time spans if present; else the live shard
    // bounds (metadata-only, mirrors `ReadCoordinator.scala:252-272` using
    // location bounds); else — unsharded in-memory metrics — a min/max scan
    val rawSpans = TimeBuckets.extractSpans(p.where, tc)
    // unbounded parity opt-in: anchor the newest bucket at the query's
    // `now` (clamped to cover the data) like the reference's live-shard
    // location end, instead of the data/shard max (see ExecConfig)
    def anchored(lo: Long, hi: Long): Span =
      if (cfg.anchorUnboundedAtNow) Span(lo, math.max(hi, tc.currentTime)) else Span(lo, hi)
    val spans0 =
      if (rawSpans.nonEmpty) rawSpans
      else m.shard.flatMap(_.liveBounds) match {
        case Some((lo, hi)) => Seq(anchored(lo, hi))
        case None =>
          val bounds: Array[Row] =
            filtered(m, p.where, tc).agg(min(col("timestamp")), max(col("timestamp"))).collect()
          bounds.headOption match {
            case Some(r) if !r.isNullAt(0) => Seq(anchored(r.getLong(0), r.getLong(1)))
            case _                         => Seq.empty
          }
      }
    // SINCE grace period: nothing older than now - grace (reference:
    // `TimeRangeManager.scala:102-126`)
    val spans = p.graceMs
      .map(g => spans0.flatMap(s => s.intersect(Span(tc.currentTime - g, Long.MaxValue))))
      .getOrElse(spans0)

    val valueType = m.schema.fields.get("value").map(_.dataType).getOrElse(DoubleType)
    if (spans.isEmpty) return emptyTemporalResult(m.df.sparkSession, p.agg, valueType)

    val grouped = rollupServable(m, p, spans, len) match {
      case Some((r, rollupAgg)) =>
        // FAST PATH — serve from the maintained sufficient-statistics
        // rollup (reference analogue: facet-index reads,
        // `ShardReaderActor.scala:259-332`). Cells are `(U-step, U]` keyed
        // by upper edge U; eligibility (rollupServable) guarantees every
        // cell tiles exactly one query bucket, so the bucket id derives
        // from U with exact long arithmetic and the aggregates fold from
        // the cell stats — raw points are never scanned.
        val step = r.stepMs
        def cellIn(s: Span) =
          col("bucket") <= lit(s.hi) && (col("bucket") - lit(step)) >= lit(s.lo - 1)
        def upperOfCell(s: Span): Column = {
          val nB = TimeBuckets.bucketCount(s, len)
          val k  = least(expr(s"(${s.hi}L - bucket) div ${len}L"), lit(nB - 1))
          lit(s.hi) - k * lit(len)
        }
        val cellFilter = spans.map(cellIn).reduce(_ || _)
        val upperCol = spans.tail.foldLeft(when(cellIn(spans.head), upperOfCell(spans.head))) {
          (acc, s) => acc.when(cellIn(s), upperOfCell(s))
        }
        val lowerCol = spans.tail.foldLeft(
          when(cellIn(spans.head), greatest(lit(spans.head.lo), upperOfCell(spans.head) - lit(len)))) {
          (acc, s) => acc.when(cellIn(s), greatest(lit(s.lo), upperOfCell(s) - lit(len)))
        }
        r.stats
          .filter(cellFilter)
          .withColumn("upperBound", upperCol)
          .withColumn("lowerBound", lowerCol)
          .groupBy(col("lowerBound"), col("upperBound"))
          .agg(rollupAgg.as("value"))
          .select(col("upperBound").as("timestamp"), col("lowerBound"), col("upperBound"), col("value"))

      case None =>
        val base = filtered(m, p.where, tc)

        // per-span backward-anchored bucket arithmetic, fused into single
        // codegen-friendly CASE expressions
        def inSpan(s: Span)  = col("timestamp").between(lit(s.lo), lit(s.hi))
        def upperExpr(s: Span): Column = {
          val nB = TimeBuckets.bucketCount(s, len)
          val k  = least(floor((lit(s.hi) - col("timestamp")).cast(DoubleType) / lit(len.toDouble)).cast(LongType), lit(nB - 1))
          lit(s.hi) - k * lit(len)
        }
        val spanFilter = spans.map(inSpan).reduce(_ || _)
        val upperCol = spans.tail.foldLeft(when(inSpan(spans.head), upperExpr(spans.head))) { (acc, s) =>
          acc.when(inSpan(s), upperExpr(s))
        }
        val lowerCol = spans.tail.foldLeft(when(inSpan(spans.head), greatest(lit(spans.head.lo), upperExpr(spans.head) - lit(len)))) {
          (acc, s) => acc.when(inSpan(s), greatest(lit(s.lo), upperExpr(s) - lit(len)))
        }

        val (_, aggCol) = aggColumn(p.agg, None)
        base
          .filter(spanFilter)
          .withColumn("upperBound", upperCol)
          .withColumn("lowerBound", lowerCol)
          .groupBy(col("lowerBound"), col("upperBound"))
          .agg(aggCol.as("value"))
          .select(col("upperBound").as("timestamp"), col("lowerBound"), col("upperBound"), col("value"))
    }

    // empty-bucket parity opt-in: left-join the full bucket lattice so
    // zero-row buckets emit like the reference's range facets (ExecConfig
    // scaladoc). The lattice is `spark.range`-generated — distributed,
    // never a driver-side materialization, so a year of 1s buckets stays
    // a 31M-row range scan, not a collect.
    val withEmpty =
      if (!cfg.emitEmptyBuckets) grouped
      else {
        val spark = m.df.sparkSession
        val lattice = spans.map { s =>
          val nB = TimeBuckets.bucketCount(s, len)
          val upper = lit(s.hi) - col("id") * lit(len)
          spark.range(nB).select(upper.as("upperBound"),
            greatest(lit(s.lo), upper - lit(len)).as("lowerBound"))
        }.reduce(_ unionByName _)
        val zeroFill = p.agg match {
          // Lucene count/sum/min-max facets report 0 over an empty range
          case _: CountAgg | _: CountDistinctAgg => Some(lit(0L))
          case _: SumAgg | _: MinAgg | _: MaxAgg => Some(lit(0).cast(valueType))
          case _                                 => None // avg/first/last: null
        }
        val filled = lattice.join(grouped.drop("timestamp"), Seq("lowerBound", "upperBound"), "left")
        zeroFill.fold(filled)(z => filled.withColumn("value", coalesce(col("value"), z)))
          .select(col("upperBound").as("timestamp"), col("lowerBound"), col("upperBound"), col("value"))
      }

    // default ordering is timestamp asc; LIMIT without explicit order keeps
    // the LAST v buckets (reference: `post_proc.applyOrderingWithLimit:56-94`)
    val desc = p.order.exists(_.desc)
    (p.limit, desc) match {
      case (Some(v), false) =>
        withEmpty.orderBy(col("timestamp").desc).limit(v).orderBy(col("timestamp").asc)
      case (Some(v), true) => withEmpty.orderBy(col("timestamp").desc).limit(v)
      case (None, d)       => withEmpty.orderBy(if (d) col("timestamp").desc else col("timestamp").asc)
    }
  }

  /** A span tiles exactly on the rollup grain: cells `(U-step, U]` can
    * cover `[lo, hi]` with no straddler iff both edges land on the grain. */
  private def spanAligned(s: Span, step: Long): Boolean =
    s.hi != Long.MaxValue && s.lo != Long.MinValue &&
      Math.floorMod(s.hi, step) == 0 && Math.floorMod(s.lo - 1, step) == 0

  /** Keep exactly the cells inside the (aligned) spans. */
  private def cellFilter(spans: Seq[Span], step: Long): Column =
    spans.map(s => col("bucket") <= lit(s.hi) && (col("bucket") - lit(step)) >= lit(s.lo - 1))
      .reduce(_ || _)

  /** The stats-table fold equivalent to `agg` over raw rows, when one
    * exists (count-of-rows, sum, min, max, avg on `value` — NOT
    * count-distinct or first/last). Count keeps the reference's limit
    * clamp, coalesced BEFORE the clamp so an empty cell set clamps 0. */
  private def statsAgg(agg: Agg, limit: Option[Int]): Option[Column] = agg match {
    case CountAgg(f) if f == "value" || f == "*" =>
      val c = coalesce(sum(col("n")), lit(0L))
      Some(limit.fold(c)(l => least(c, lit(l.toLong))))
    case SumAgg("value") => Some(sum(col("vsum")))
    case MinAgg("value") => Some(min(col("vmin")))
    case MaxAgg("value") => Some(max(col("vmax")))
    case AvgAgg("value") => Some(sum(col("vsum")).cast(DoubleType) / sum(col("n")).cast(DoubleType))
    case _               => None
  }

  /**
   * Rollup-serving eligibility for a temporal aggregation: the metric has
   * an attached [[RollupRef]]; the aggregate folds from sufficient stats;
   * the WHERE constrains only the timestamp (a tag/dimension filter needs
   * raw rows); and every (post-grace) span tiles exactly on the rollup
   * grain — `len % step == 0` plus [[spanAligned]], so no cell straddles a
   * bucket or the span edge. Anything else falls back to the raw scan;
   * results are identical either way (the eligibility test is about
   * exactness, not approximation).
   */
  private def rollupServable(
      m: MetricRef, p: PlannedQuery.TemporalAgg, spans: Seq[Span], len: Long
  ): Option[(RollupRef, Column)] =
    m.rollup.flatMap { r =>
      val step    = r.stepMs
      val whereOk = p.where.forall(TimeBuckets.isTimeOnly(_))
      val spansOk = spans.nonEmpty && len % step == 0 && spans.forall(spanAligned(_, step))
      if (whereOk && spansOk) statsAgg(p.agg, None).map(a => (r, a)) else None
    }

  private def emptyTemporalResult(spark: SparkSession, agg: Agg, valueType: DataType): DataFrame = {
    val vt = agg match {
      case _: CountAgg | _: CountDistinctAgg => LongType
      case _: AvgAgg                         => DoubleType
      case _                                 => valueType
    }
    val schema = StructType(Seq(
      StructField("timestamp", LongType),
      StructField("lowerBound", LongType),
      StructField("upperBound", LongType),
      StructField("value", vt)
    ))
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }
}
