package graft

import org.apache.spark.sql.SparkSession

/** Diagnostics: dump physical plans of representative queries to audit
  * pushdown / partial-agg / top-k / codegen shapes (not library surface). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("t_sum", "t_topk", "i_count", "s_star", "g_mixed", "ann_topk", "d_minhash", "d_embed",
      "ann_ivf", "d_gate", "d_embed_gate", "tx_sample", "tx_budget", "tx_pack",
      "sem_dedup", "ann_join", "d_decon_hits", "d_spans", "tx_cap", "tx_rep", "tx_temp",
      "ev_asof", "ev_range", "ev_sessions", "ev_winsor", "ev_funnel", "ev_retention", "tx_lm", "mm_ann",
      "d_labelprop", "d_modularity", "ann_pca", "ann_ndcg", "tx_doremi", "tx_bpemerge",
      "st_basket", "ev_survival", "ev_markov", "ts_backtest", "rt_bm25_app")) {
      println(s"\n================ $q ================")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
