package graft

/**
 * Always-on plan-shape guards over EVERY gate query: the properties that
 * make the plans survive a 100× scale-up must not regress silently when a
 * gate is added or an operator is refactored.
 */
class PlanShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  // intentionally brute-force baselines (bounded-id oracle cross-checks)
  private val bruteForceAllowed = Set("d_embed_exact")

  "every gate query" should "plan without a cartesian product" in {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      if (!bruteForceAllowed(name))
        withClue(s"$name:\n$plan\n") { plan should not include "CartesianProduct" }
    }
  }

  it should "push predicate filters into the parquet scan" in {
    val plan = SparkEntry.queries("p_eq")(spark, dir).queryExecution.executedPlan.toString
    plan should include("PushedFilters: [")
    plan should not include "PushedFilters: []"
  }

  it should "prune per-group rank windows map-side (WindowGroupLimit)" in {
    // a corpus-common query term must not funnel a corpus-sized candidate
    // list through one partition of the per-query rank exchange
    val plan = SparkEntry.queries("rt_bm25_join")(spark, dir).queryExecution.executedPlan.toString
    withClue(plan) { plan should include("WindowGroupLimit") }
  }
}
