package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.exec.{Executor, MetricRef}
import graft.model.MetricSchema
import graft.plan.{PlannedQuery, Planner, TimeContext}
import graft.sql.{Ast, SqlParser}

/**
 * Session facade: the Spark-native equivalent of the reference's
 * read/write coordinators + SQL endpoint (`nsdb-cluster/.../ReadCoordinator`,
 * `nsdb-http/.../QueryApi`). Metrics live either in the Parquet warehouse
 * (see [[graft.catalog.Warehouse]]) or are registered in-memory views over
 * arbitrary DataFrames.
 */
class GraftEngine(val spark: SparkSession) {

  private val registry = TrieMap.empty[(String, String, String), MetricRef]

  /**
   * Register an existing DataFrame as a metric. `timestampCol` must resolve
   * to epoch-millis (a Column expression is accepted so sources with other
   * encodings can be adapted); `valueCol` must be numeric; `tags` marks the
   * groupable columns, everything else becomes a dimension.
   */
  def registerMetric(
      db: String,
      namespace: String,
      metric: String,
      df: DataFrame,
      timestampCol: Column,
      valueCol: Column,
      tags: Set[String],
      drop: Set[String] = Set.empty
  ): MetricRef = {
    val others = df.columns.filterNot { c =>
      // drop source columns shadowed by the canonical timestamp/value
      timestampCol.toString == c || valueCol.toString == c || drop.contains(c)
    }.filterNot(c => c == "timestamp" || c == "value")
    val canonical = df.select(
      (timestampCol.cast(LongType).as("timestamp") +: valueCol.as("value") +: others.map(col _)): _*
    )
    val ref = MetricRef(canonical, MetricSchema.fromMapping(canonical.schema, tags))
    registry.put((db, namespace, metric), ref)
    ref
  }

  def metricRef(db: String, namespace: String, metric: String): Option[MetricRef] =
    registry.get((db, namespace, metric))

  def listMetrics(db: String, namespace: String): Seq[String] =
    registry.keys.collect { case (d, n, m) if d == db && n == namespace => m }.toSeq.sorted

  /** Parse, validate/plan and execute one SELECT statement. */
  def sql(db: String, namespace: String, query: String)(implicit tc: TimeContext): Either[String, DataFrame] =
    for {
      stmt <- SqlParser.parse(db, namespace, query)
      df   <- executeStatement(stmt)
    } yield df

  def executeStatement(stmt: Ast.Statement)(implicit tc: TimeContext): Either[String, DataFrame] =
    stmt match {
      case s: Ast.SelectStatement =>
        for {
          ref  <- registry.get((s.db, s.namespace, s.metric)).toRight(s"metric ${s.metric} does not exist")
          plan <- Planner.plan(s, ref.schema)
        } yield Executor.execute(plan, ref, tc)
      case other =>
        Left(s"statement ${other.getClass.getSimpleName} requires a warehouse-backed engine")
    }

  /** Plan without executing (validation surface for tests / error parity). */
  def plan(db: String, namespace: String, query: String)(implicit tc: TimeContext): Either[String, PlannedQuery] =
    SqlParser.parse(db, namespace, query).flatMap {
      case s: Ast.SelectStatement =>
        registry
          .get((s.db, s.namespace, s.metric))
          .toRight(s"metric ${s.metric} does not exist")
          .flatMap(ref => Planner.plan(s, ref.schema))
      case s: Ast.DeleteStatement =>
        registry
          .get((s.db, s.namespace, s.metric))
          .toRight(s"metric ${s.metric} does not exist")
          .flatMap(ref => Planner.plan(s, ref.schema))
      case _ => Left("only select/delete statements can be planned")
    }
}
