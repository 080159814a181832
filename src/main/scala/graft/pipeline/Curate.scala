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

  /**
   * Per-source document cap: keep the `k` highest-quality documents of
   * every source (ties broken by ascending id — fully deterministic). The
   * standard "no single domain dominates the mix" curation rule.
   *
   * Plan shape at 100 TB: `row_number` over (source, quality DESC, id) is
   * rank-limit-pushed by Spark into a `WindowGroupLimit` — every input
   * partition pre-prunes to its local top-k PER GROUP before the single
   * shuffle on `source`, so the exchange carries at most
   * k × sources × partitions rows, not the corpus. A skewed giant source
   * is already pre-shrunk map-side (the spec asserts the WindowGroupLimit
   * is in the plan).
   */
  def capPerGroup(
      df: DataFrame,
      k: Int,
      groupCol: String = "source",
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (_, _, _, quality) = TextAnalysis.qualityCols(col(textCol))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("quality").desc, col(idCol))
    df.select(col(idCol), col(groupCol), quality.as("quality"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /**
   * The whole training-mix pipeline, composed end-to-end — what a corpus
   * run chains between raw documents and the tokenizer:
   *
   *   1. [[curate]] membership (exact dedup + language allowlist +
   *      quality floor + token bounds)
   *   2. [[Dedup.decontaminate]]: drop eval-set n-gram collisions
   *   3. [[Dedup.duplicateClusters]]: keep one representative per
   *      near-dup connected component
   *   4. [[Sampling.stratifiedHashSample]]: deterministic per-language mix
   *   5. [[Sampling.packSequences]]: chunk the survivors' token stream
   *      into training sequences
   *
   * Returns `(doc_id, n_tokens, seq_id)`. Every stage is individually
   * oracle-gated (`tx_curate`, `d_decon`, `d_cc`, `tx_sample`, `tx_pack`);
   * the composition is deterministic end to end — rerunning it (anywhere,
   * at any parallelism) rebuilds the identical mix.
   */
  def trainingMix(
      df: DataFrame,
      evalDf: DataFrame,
      mixRates: Map[String, Double],
      seqTokens: Long,
      keepLangs: Seq[String] = Seq("en", "de"),
      minQuality: Double = 0.5,
      nearDupThreshold: Double = 0.5,
      deconShingleK: Int = 13,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    // curated feeds BOTH the survivors semi-join and the withLang join —
    // materialize once so the curation subtree (digest shuffle + metric
    // projection) doesn't execute twice per mix
    val curated = curate(df, keepLangs, minQuality, textCol = textCol, idCol = idCol)
      .select(col(idCol), col("predicted_lang"))
      .localCheckpoint(true)
    val survivors = df.join(curated, Seq(idCol), "left_semi")
    val clean     = Dedup.decontaminate(survivors, evalDf, deconShingleK, textCol, idCol)
    val reps = Dedup.duplicateClusters(clean, nearDupThreshold, textCol = textCol, idCol = idCol)
      .filter(col(idCol) === col("rep")).select(col(idCol))
    val deduped  = clean.join(reps, Seq(idCol), "left_semi")
    val withLang = deduped.join(curated, Seq(idCol))
    val mixed    = Sampling.stratifiedHashSample(withLang, "predicted_lang", mixRates, idCol = idCol)
    Sampling.packSequences(mixed, seqTokens, textCol, idCol)
  }
}
