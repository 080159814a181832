package graft.pipeline

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/**
 * Deterministic lifecycle for the pipeline's eager materializations.
 *
 * The composed operators ([[Curate.trainingMix]], [[Dedup.duplicateClusters]],
 * [[Sampling.packSequences]], [[Similarity.semDedup]], ...) pin intermediate
 * frames with `localCheckpoint(true)` — correctness-motivated (one execution
 * feeding several consumers, lineage truncation for iteration) but the blocks
 * otherwise live until GC + ContextCleaner happen to reclaim them. A
 * long-lived session (a 24/7 curation service, a 90-query bench loop)
 * accumulates them faster than weak-reference cleanup keeps up; NSDb's write
 * path frees per-shard resources deterministically
 * (reference `MetricAccumulatorActor.scala:76-115`) and so must this one.
 *
 * [[free]] walks a frame's analyzed plan for the checkpointed RDDs it reads
 * from ([[LogicalRDD]] leaves — the shape `Dataset.localCheckpoint` leaves
 * behind) and unpersists their blocks. Two call patterns:
 *
 *   - operators free their OWN dead intermediates before returning (a
 *     superseded label frame in an iterative loop, a stage whose one
 *     downstream consumer has already materialized);
 *   - callers free a RESULT frame once finished with it:
 *     `Checkpoints.free(df)` after the last action releases every block
 *     still backing it.
 *
 * CAUTION: `localCheckpoint` truncates lineage, so a freed frame cannot be
 * recomputed — only free a frame no lazy consumer still needs.
 */
object Checkpoints {

  /** The distinct still-persisted checkpoint RDDs `df` reads from. The
    * LOGICAL plan is walked (not the physical RDD graph) so branches that
    * execute as broadcast sides are found too. */
  private def roots(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed
      .collect { case lr: LogicalRDD => lr.rdd }
      .filter(_.getStorageLevel != StorageLevel.NONE)

  /** Unpersist (non-blocking) every checkpoint block backing `frames`.
    * Idempotent; a frame with no materialized backing is a no-op. */
  def free(frames: DataFrame*): Unit =
    frames.flatMap(roots)
      .groupBy(_.id).map(_._2.head)
      .foreach(_.unpersist(blocking = false))

  // ---- pin attribution -------------------------------------------------
  // The shared test/session SparkContext makes `getPersistentRDDs` diffs
  // racy (any concurrent caller pins blocks too), so lifecycle guarantees
  // are stated per CALL instead: every pipeline-internal checkpoint goes
  // through [[pin]], and [[scoped]] hands back exactly the pins the wrapped
  // call created on this thread — auditable regardless of what the rest of
  // the session is doing.

  private val scopes = new ThreadLocal[List[scala.collection.mutable.ArrayBuffer[RDD[_]]]] {
    override def initialValue(): List[scala.collection.mutable.ArrayBuffer[RDD[_]]] = Nil
  }

  /** `localCheckpoint(eager)` + record the new pin in every active [[scoped]]
    * block on this thread (free-standing calls record nothing). */
  def pin(df: DataFrame): DataFrame = {
    val c  = df.localCheckpoint(true)
    val rs = roots(c)
    scopes.get().foreach(_ ++= rs)
    c
  }

  /** Run `body`, returning its result plus every RDD [[pin]]ned by this
    * thread during it (whether or not since unpersisted). Nests. */
  def scoped[T](body: => T): (T, Seq[RDD[_]]) = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[RDD[_]]
    scopes.set(buf :: scopes.get())
    try { val r = body; (r, buf.toSeq) }
    finally scopes.set(scopes.get().filterNot(_ eq buf))
  }

  /** chain-position sugar: `df.transform(...).pinned` ≡ `pin(df.transform(...))`. */
  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    def pinned: DataFrame = pin(df)
  }
}
