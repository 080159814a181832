package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus curation — the composed pipeline a training-data run
 * actually executes over raw documents:
 *
 *   1. exact dedup: keep the smallest-id representative per distinct text
 *   2. language allowlist (marker-word language ID)
 *   3. quality floor (length/stopword/punctuation heuristic)
 *   4. token-count bounds
 *
 * Plan shape at 100 TB: ONE digest-only shuffle (the dedup groupBy carries
 * md5 + id, never text), one semi-join back on the id, and a single
 * projection computing every metric (the [[TextAnalysis]] column
 * expressions compose — no metrics joins). Near-dup stages
 * ([[Dedup.minhashLshPairs]] etc.) chain after this with
 * [[Dedup.deduplicated]] when needed.
 */
object Curate {

  def curate(
      df: DataFrame,
      keepLangs: Seq[String] = Seq("en"),
      minQuality: Double = 0.5,
      minTokens: Long = 5,
      maxTokens: Long = 100000,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    // exact-dedup representatives: digest-only shuffle
    val reps = df
      .groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    val (nTokens, _, _, quality) = TextAnalysis.qualityCols(col(textCol))
    val (lang, _)                = TextAnalysis.langIdCols(col(textCol))
    df.join(reps, Seq(idCol), "left_semi")
      .select(col(idCol), lang.as("predicted_lang"), nTokens.as("n_tokens"), quality.as("quality"))
      .filter(
        col("predicted_lang").isin(keepLangs: _*) &&
          col("quality") >= minQuality &&
          col("n_tokens").between(minTokens, maxTokens))
  }
}
