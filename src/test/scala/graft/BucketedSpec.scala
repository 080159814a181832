package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Bucketed

/** The bucketed-layout contract: a join of two co-bucketed tables on the
  * bucket key runs WITHOUT any Exchange — the write-once shuffle replaces
  * the per-query shuffle (the 100 TB repeated-join path). */
class BucketedSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  "Bucketed.write + coLocatedJoin" should "join co-bucketed tables with no Exchange and no Sort" in {
    val docs   = (1L to 500L).map(i => (i, s"text_$i")).toDF("doc_id", "text")
    val scores = (1L to 500L).map(i => (i, i * 0.5)).toDF("doc_id", "score")
    Bucketed.write(docs, "b_docs", tmp("b_docs"), Seq("doc_id"), n = 4)
    Bucketed.write(scores, "b_scores", tmp("b_scores"), Seq("doc_id"), n = 4)
    try {
      val j = Bucketed.coLocatedJoin(spark, "b_docs", "b_scores", Seq("doc_id"))
      j.count() shouldBe 500L
      val plan = j.queryExecution.executedPlan.toString
      withClue(plan) {
        plan should include("SortMergeJoin")
        plan should include("Bucketed: true")
        plan should not include "Exchange"
      }
      // the write put one file per bucket, so the per-bucket sortBy
      // metadata is honest — with the (off-by-default) bucketed-scan
      // output-ordering conf the join also skips its per-task Sorts
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      try {
        val sorted = Bucketed.coLocatedJoin(spark, "b_docs", "b_scores", Seq("doc_id"))
          .queryExecution.executedPlan.toString
        withClue(sorted) {
          sorted should not include "Exchange"
          sorted should not include "Sort "
        }
      } finally spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_scores")
    }
  }

  it should "write exactly one file per bucket" in {
    val dir = tmp("b_onefile")
    val df = (1L to 200L).map(i => (i, i % 7)).toDF("k", "v")
    Bucketed.write(df, "b_onefile", dir, Seq("k"), n = 4)
    try {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      files.length shouldBe 4
    } finally spark.sql("DROP TABLE IF EXISTS b_onefile")
  }

  it should "still broadcast a small dimension into a bucketed fact (no regression)" in {
    val dim = Seq((0L, "even"), (1L, "odd")).toDF("m", "name")
    val fact = Bucketed.table(spark, "b_mod")
    val plan = fact.join(broadcast(dim), col("k") % 2 === col("m"))
      .queryExecution.executedPlan.toString
    withClue(plan) { plan should include("BroadcastHashJoin") }
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    Bucketed.write((1L to 50L).toDF("k"), "b_mod", tmp("b_mod"), Seq("k"), n = 2)
  }

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_mod")
    super.afterAll()
  }
}
