package graft.client

import org.apache.spark.sql.DataFrame

import graft.GraftEngine
import graft.plan.TimeContext
import graft.sql.Ast

/**
 * Fluent client API mirroring the reference's Scala client surface
 * (`nsdb-scala-api/.../NSDB.scala:57-120`): `db → namespace → metric`
 * selection, an immutable bit builder (`timestamp/value/dimension/tag`),
 * `write` for ingest and `query`/`execute` for reads.
 *
 * The reference client fronts a gRPC channel; this one fronts an embedded
 * [[GraftEngine]] directly — same builder surface, but results come back
 * as a live `DataFrame` (lazily planned, executor-side) instead of a
 * collected protobuf response, and errors as `Either` instead of failed
 * Futures (the engine call is synchronous — wrap in `Future(...)` at the
 * call site if the reference's async shape is needed).
 *
 * {{{
 *   val client = GraftClient.embedded(engine)
 *   val bit = client.db("root").namespace("registry").metric("people")
 *     .timestamp(1000L).value(13L).dimension("city", "Mouseton").tag("country", "IT")
 *   client.write(bit)
 *   val df = client.execute(client.db("root").namespace("registry").query("select * from people limit 1"))
 * }}}
 */
object GraftClient {
  def embedded(engine: GraftEngine): GraftClient = new GraftClient(engine)

  /** db selector — entry point of the builder chain. */
  final case class Db(name: String) {
    def namespace(namespace: String): Namespace = Namespace(name, namespace)
  }

  final case class Namespace(db: String, name: String) {
    /** start building a bit for `metric` (empty value/dimensions/tags). */
    def metric(metric: String): Bit = Bit(db, name, metric)
    /** build a raw dialect query against this namespace. */
    def query(queryString: String): Query = Query(db, name, queryString)
  }

  final case class Query(db: String, namespace: String, queryString: String)

  /**
   * Immutable bit builder. Every method returns a new bit, so partial
   * builders can be shared and forked (same contract as the reference's
   * case-class copies). `value` accepts the reference's numeric types;
   * BigDecimal follows its scale rule (scale > 0 → double, else long).
   */
  final case class Bit(
      db: String,
      namespace: String,
      metric: String,
      timestamp: Option[Long] = None,
      value: Option[Any] = None,
      dimensions: Vector[(String, Any)] = Vector.empty,
      tags: Vector[(String, Any)] = Vector.empty
  ) {
    def timestamp(ts: Long): Bit = copy(timestamp = Some(ts))

    def value(v: Long): Bit   = copy(value = Some(v))
    def value(v: Int): Bit    = copy(value = Some(v.toLong))
    def value(v: Double): Bit = copy(value = Some(v))
    def value(v: java.math.BigDecimal): Bit =
      if (v.scale() > 0) value(v.doubleValue()) else value(v.longValue())

    def dimension(name: String, v: Long): Bit   = copy(dimensions = dimensions :+ (name -> v))
    def dimension(name: String, v: Double): Bit = copy(dimensions = dimensions :+ (name -> v))
    def dimension(name: String, v: String): Bit = copy(dimensions = dimensions :+ (name -> v))

    def tag(name: String, v: Long): Bit   = copy(tags = tags :+ (name -> v))
    def tag(name: String, v: Double): Bit = copy(tags = tags :+ (name -> v))
    def tag(name: String, v: String): Bit = copy(tags = tags :+ (name -> v))

    /** query builder shortcut from a metric-scoped bit (reference parity). */
    def query(queryString: String): Query = Query(db, namespace, queryString)
  }
}

final class GraftClient(engine: GraftEngine) {
  import GraftClient._

  def db(name: String): Db = Db(name)

  /** Write one bit. A missing value is a client-side error (the reference
    * rejects `Value.Empty` server-side). */
  def write(bit: Bit): Either[String, Long] =
    bit.value match {
      case None => Left(s"bit for metric ${bit.metric} has no value")
      case Some(v) =>
        implicit val tc: TimeContext = TimeContext(System.currentTimeMillis())
        engine
          .executeStatement(Ast.InsertStatement(
            bit.db, bit.namespace, bit.metric, bit.timestamp,
            bit.dimensions.toMap, bit.tags.toMap, v))
          .map(_ => 1L)
    }

  /** Write a batch; stops at the first failure (all-or-nothing per bit,
    * like the reference's sequenced Future writes). */
  def write(bits: Seq[Bit]): Either[String, Long] =
    bits.foldLeft[Either[String, Long]](Right(0L)) { (acc, b) =>
      acc.flatMap(n => write(b).map(_ + n))
    }

  /** Execute a dialect query NOW (wall-clock time context). */
  def execute(q: Query): Either[String, DataFrame] =
    executeAt(q, TimeContext(System.currentTimeMillis()))

  /** Execute with an explicit time context (pins `NOW ± x` arithmetic —
    * deterministic tests, historical replay). */
  def executeAt(q: Query, tc: TimeContext): Either[String, DataFrame] =
    engine.sql(q.db, q.namespace, q.queryString)(tc)

  /** Streaming subscription (the reference's `NSDbStreaming` surface):
    * historical result once + live updates for the query, against a
    * streaming DataFrame of the metric's records. */
  def subscribe(q: Query, stream: DataFrame): Either[String, graft.streaming.Subscriptions.Subscription] = {
    implicit val tc: TimeContext = TimeContext(System.currentTimeMillis())
    graft.streaming.Subscriptions.subscribe(engine, stream, q.db, q.namespace, q.queryString)
  }

  /** Create a metric ahead of data with explicit sharding/retention (the
    * reference's init-metric surface; durations in millis here — the Java
    * facade accepts the reference's "1d"/"2h" duration strings). */
  def initMetric(
      ns: Namespace,
      metric: String,
      shardIntervalMs: Long,
      retentionMs: Long = 0L
  ): Either[String, Unit] =
    engine.initMetric(ns.db, ns.name, metric, shardIntervalMs, retentionMs)

  /** Metadata: list the metrics of a namespace. */
  def metrics(ns: Namespace): Either[String, Seq[String]] =
    engine.command(ns.db, ns.name, Ast.ShowMetrics).map(_.flatten)

  /** Metadata: describe a metric's fields as (name, type, fieldClass). */
  def describe(ns: Namespace, metric: String): Either[String, Seq[Seq[String]]] =
    engine.command(ns.db, ns.name, Ast.DescribeMetric(metric))
}
