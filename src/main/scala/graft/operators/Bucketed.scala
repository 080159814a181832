package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * HASH-BUCKETED table layout — the storage-level answer to the question
 * every 100 TB plan review asks: "this fact-fact join shuffles both sides
 * on the key; can the shuffle be paid ONCE at write time instead of once
 * per query?"
 *
 * Spark-native bucketing (`bucketBy` + `saveAsTable`) records the bucket
 * spec in the catalog; a scan of a bucketed table reports
 * `HashPartitioning(keys, n)` as its output partitioning, so
 * `EnsureRequirements` inserts NO Exchange when two tables bucketed the
 * same way join on their bucket keys — the join runs bucket-aligned,
 * task i against task i. For the pipelines here that means: persist
 * `documents` and its per-doc score/signature side-tables bucketed by
 * `doc_id` once, and every later enrich/join/dedup pass over them is
 * shuffle-free on the fact side.
 *
 * Write shape: [[write]] first `repartition(n, keys)`s the frame so each
 * bucket lands in EXACTLY one task → one file per bucket (Spark's
 * repartition and its bucket spec use the same Murmur3 hash). Without
 * that, every write task emits one file per bucket it happens to hold —
 * `tasks × buckets` small files, the classic bucketed-write mistake — and
 * the per-file `sortBy` metadata stops being a per-BUCKET guarantee.
 * One file per bucket keeps the sorted flag honest; Spark then also skips
 * the join's per-task Sorts when
 * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (off by
 * default since 3.0 — the Exchange elision, the expensive part, needs no
 * conf; both behaviors are pinned in BucketedSpec).
 *
 * Catalog scope: with the default in-memory catalog the table DEFINITION
 * lives for the session; the parquet files live at `path`. A production
 * deployment backs the same calls with a persistent metastore — the call
 * shape and the resulting plans are identical; nothing here depends on
 * session lifetime.
 *
 * Reference relevance: NSDb co-locates a metric's shards with their node
 * (`metadata/coordinator/MetadataCoordinator.scala` write-location
 * assignment) so per-shard reads never cross nodes; bucketing is the
 * Spark-catalog expression of the same placement idea, keyed by hash
 * instead of time interval.
 */
object Bucketed {

  /**
   * Persist `df` as a bucketed catalog table at `path`, `n` buckets on
   * `keys`, sorted within each bucket by `keys` (ascending) — one file
   * per bucket (see class doc). Overwrites any previous definition.
   */
  def write(df: DataFrame, table: String, path: String, keys: Seq[String], n: Int): Unit = {
    require(keys.nonEmpty, "bucket keys must be non-empty")
    require(n > 0, "bucket count must be positive")
    df.repartition(n, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(n, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** The bucketed table, scanning with its catalog bucket spec. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /**
   * Join two co-bucketed tables on their (shared) bucket keys — plain
   * equi-join; the value is the PLAN: both scans report the same
   * `HashPartitioning`, so no Exchange appears on either side (asserted
   * in BucketedSpec). `how` as in [[DataFrame.join]].
   */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    keys: Seq[String], how: String = "inner"): DataFrame =
    // MERGE hint: both sides are fact-sized in the intended use, but on
    // small inputs the planner would otherwise pick a broadcast join and
    // the bucket alignment (the point of the layout) would go unexercised
    table(spark, left).hint("merge").join(table(spark, right), keys, how)
}
