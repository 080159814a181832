package graft.sql

/**
 * Statement AST for the graft time-series SQL dialect.
 *
 * The dialect reproduces the query surface of radicalbit/NSDb (reference:
 * `nsdb-common/src/main/scala/io/radicalbit/nsdb/common/statement/SQLStatement.scala`):
 * single-metric SELECT with boolean predicates, projection, optional
 * {distinct | global aggregation | group-by-tag | group-by-time-interval},
 * single-field ORDER BY, LIMIT, SINCE grace period; plus INSERT / DELETE /
 * DROP METRIC and the metadata commands.
 *
 * Values resolve against an injected [[graft.plan.TimeContext]] so that a
 * query has exactly one consistent "NOW".
 */
object Ast {

  /** milliseconds for each time-measure keyword the grammar accepts. */
  val unitMillis: Map[String, Long] = Map(
    "S"      -> 1000L,
    "SEC"    -> 1000L,
    "SECOND" -> 1000L,
    "MIN"    -> 60000L,
    "MINUTE" -> 60000L,
    "H"      -> 3600000L,
    "HOUR"   -> 3600000L,
    "D"      -> 86400000L,
    "DAY"    -> 86400000L
  )

  // ---- comparison values -------------------------------------------------

  /** A literal or NOW-relative value appearing on the right side of a predicate. */
  sealed trait CompValue {
    /** Resolve to a concrete literal given the query's time context. */
    def resolve(currentTimeMs: Long): Any
  }
  final case class AbsValue(v: Any) extends CompValue {
    def resolve(currentTimeMs: Long): Any = v
  }
  /** `NOW + n unit` / `NOW - n unit`; signum is +1 or -1. */
  final case class RelValue(signum: Int, offsetMs: Long) extends CompValue {
    def resolve(currentTimeMs: Long): Any = currentTimeMs + signum * offsetMs
  }

  // ---- predicates --------------------------------------------------------

  sealed trait Predicate
  sealed trait CmpOp { def sql: String }
  case object Gt  extends CmpOp { val sql = ">"  }
  case object Gte extends CmpOp { val sql = ">=" }
  case object Lt  extends CmpOp { val sql = "<"  }
  case object Lte extends CmpOp { val sql = "<=" }

  final case class EqPred(field: String, value: CompValue)             extends Predicate
  final case class CmpPred(field: String, op: CmpOp, value: CompValue) extends Predicate
  /** `field IN (lo, hi)` — inclusive range on both bounds. */
  final case class RangePred(field: String, lo: CompValue, hi: CompValue) extends Predicate
  /** `field LIKE pattern` with `$` as the multi-char wildcard. */
  final case class LikePred(field: String, pattern: String) extends Predicate
  final case class NullPred(field: String)                  extends Predicate
  final case class NotPred(p: Predicate)                    extends Predicate
  final case class AndPred(l: Predicate, r: Predicate)      extends Predicate
  final case class OrPred(l: Predicate, r: Predicate)       extends Predicate

  // ---- aggregations ------------------------------------------------------

  sealed trait Agg {
    def field: String
    /** usable without GROUP BY (everything except FIRST/LAST). */
    def global: Boolean = true
    def keyword: String
  }
  final case class SumAgg(field: String)   extends Agg { val keyword = "sum"  }
  final case class MinAgg(field: String)   extends Agg { val keyword = "min"  }
  final case class MaxAgg(field: String)   extends Agg { val keyword = "max"  }
  final case class AvgAgg(field: String)   extends Agg { val keyword = "avg"  }
  final case class CountAgg(field: String) extends Agg { val keyword = "count" }
  final case class CountDistinctAgg(field: String) extends Agg { val keyword = "count_distinct" }
  final case class FirstAgg(field: String) extends Agg { val keyword = "first"; override val global = false }
  final case class LastAgg(field: String)  extends Agg { val keyword = "last";  override val global = false }

  // ---- projection --------------------------------------------------------

  final case class ProjField(name: String, agg: Option[Agg])
  sealed trait Projection
  case object StarProjection                            extends Projection
  final case class FieldsProjection(fields: List[ProjField]) extends Projection

  // ---- grouping / ordering ----------------------------------------------

  sealed trait GroupBy { def field: String }
  final case class TagGroupBy(field: String) extends GroupBy
  /** GROUP BY INTERVAL n unit — tumbling buckets anchored at the query upper bound. */
  final case class IntervalGroupBy(intervalMs: Long, quantity: Long, unit: String) extends GroupBy {
    val field: String = "timestamp"
  }

  final case class OrderBy(field: String, desc: Boolean)
  /** SINCE n unit — grace period limiting how far back temporal buckets reach. */
  final case class Grace(quantity: Long, unit: String) {
    def millis: Long = quantity * unitMillis(unit.toUpperCase)
  }

  // ---- statements --------------------------------------------------------

  sealed trait Statement { def db: String; def namespace: String; def metric: String }

  final case class SelectStatement(
      db: String,
      namespace: String,
      metric: String,
      distinct: Boolean,
      projection: Projection,
      where: Option[Predicate],
      groupBy: Option[GroupBy],
      order: Option[OrderBy],
      grace: Option[Grace],
      limit: Option[Int]
  ) extends Statement {

    /** AND an extra predicate into the WHERE clause (API-layer enrichment). */
    def addCondition(p: Predicate): SelectStatement =
      copy(where = Some(where.fold(p)(AndPred(_, p))))

    /** Restrict to `[from, to]` (inclusive) on timestamp. */
    def enrichWithTimeRange(field: String, from: Long, to: Long): SelectStatement =
      addCondition(RangePred(field, AbsValue(from), AbsValue(to)))
  }

  final case class InsertStatement(
      db: String,
      namespace: String,
      metric: String,
      timestamp: Option[Long],
      dimensions: Map[String, Any],
      tags: Map[String, Any],
      value: Any
  ) extends Statement

  final case class DeleteStatement(db: String, namespace: String, metric: String, where: Predicate)
      extends Statement

  final case class DropStatement(db: String, namespace: String, metric: String) extends Statement

  // ---- metadata commands -------------------------------------------------

  sealed trait Command
  case object ShowDatabases                       extends Command
  case object ShowNamespaces                      extends Command
  final case class UseNamespace(namespace: String) extends Command
  case object ShowMetrics                         extends Command
  final case class DescribeMetric(metric: String) extends Command
  /** beyond-reference diagnostic: plan a SELECT/DELETE without running it. */
  final case class Explain(query: String)         extends Command
  /** beyond-reference pipeline commands: the curation library surfaced
    * through the dialect, so the engine stays a queryable SYSTEM rather
    * than a library of mains. */
  final case class DedupExact(metric: String)     extends Command
  final case class AuditProfile(metric: String)   extends Command
}
