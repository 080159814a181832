package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Keyword retrieval and rank fusion over the document corpus — the lexical
 * half of a training-data retrieval stack ([[Similarity]] owns the vector
 * half). BM25 is the classic probabilistic ranking function (Robertson &
 * Spärck Jones; the Okapi BM25 formulation with the Lucene `ln(1 + ...)`
 * idf, which keeps idf non-negative when a term hits more than half the
 * corpus); reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR '09)
 * combines ranked lists using only INTEGER ranks — engine-portable by
 * construction, no score normalization needed.
 *
 * Scale shapes:
 *  - BM25 never builds the full inverted index for a query: tokens are
 *    filtered to the query's terms BEFORE any aggregation, so the shuffled
 *    relation is `(doc, query_term)` hits only. Per-term document
 *    frequencies are a ≤|terms|-row broadcast. Document length and the
 *    corpus-wide `avgdl` come from one map-side-combined count (two scalar
 *    values to the driver — bounded, like the ANN auto-sizing counts).
 *  - Fusion ranks only the bounded top-`n` candidate lists (TakeOrdered on
 *    each side), so the rank windows run over ≤n rows — never a global
 *    single-partition window over the corpus.
 */
object Retrieval {

  /**
   * BM25 score per document over `terms` (documents matching no term are
   * absent — score 0 by definition). Tokenization is whitespace split,
   * matching the corpus convention ([[TextAnalysis.words]]).
   *
   * Arithmetic is shaped for cross-engine determinism: tf/df/dl/N are
   * exact integers, `avgdl = sum(dl)/N` is one exact division, and each
   * term's weight is a fixed multiply/divide chain — only the final
   * per-document sum is order-sensitive (rounded at the caller).
   */
  def bm25Scores(
      docs: DataFrame,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val toks = docs.select(col(idCol), explode(split(col(textCol), " ")).as("__term"))
    val dl   = toks.groupBy(col(idCol)).agg(count(lit(1)).as("__dl"))
    val Array(n, sumDl) = dl.agg(count(lit(1)), sum(col("__dl"))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    require(n > 0, "empty corpus")
    val avgdl = sumDl.toDouble / n
    val tf = toks.filter(col("__term").isin(terms: _*))
      .groupBy(col(idCol), col("__term")).agg(count(lit(1)).cast("double").as("__tf"))
    val dfreq = tf.groupBy(col("__term")).agg(count(lit(1)).cast("double").as("__df"))
    val idf   = log(lit(1.0) + (lit(n.toDouble) - col("__df") + 0.5) / (col("__df") + 0.5))
    val wt    = col("__idf") * (col("__tf") * (k1 + 1)) /
      (col("__tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("__dl") / avgdl))
    tf.join(broadcast(dfreq.withColumn("__idf", idf)), "__term")
      .join(dl, idCol)
      .groupBy(col(idCol))
      .agg(sum(wt).as("score"))
  }

  /** Top-`k` documents by [[bm25Scores]], ties broken by id; the score is
    * rounded AFTER the ordering (the unrounded value sorts). */
  def bm25TopK(
      docs: DataFrame,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id",
      dp: Int = 4
  ): DataFrame =
    bm25Scores(docs, terms, k1, b, textCol, idCol)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("score"), dp).as("score"))

  /**
   * HYBRID RETRIEVAL — reciprocal rank fusion of the BM25 lexical list and
   * the exact-cosine vector list: each candidate scores
   * `Σ 1/(rrfK + rank)` over the lists it appears in (rank 1-based within
   * the top-`n` of each list; absent → no contribution). Returns the
   * top-`k` by fused score with both ranks exposed (null = not in that
   * list). Ranks are integers, so the fused score is bit-identical across
   * engines.
   *
   * `docs.idCol` and `embeddings.vecIdCol` are the same id space (the
   * corpus convention: one embedding row per document).
   */
  def hybridTopK(
      docs: DataFrame,
      embeddings: DataFrame,
      terms: Seq[String],
      queryVec: Seq[Float],
      k: Int,
      n: Int = 100,
      rrfK: Int = 60,
      textCol: String = "text",
      idCol: String = "doc_id",
      vecCol: String = "embedding",
      vecIdCol: String = "vec_id"
  ): DataFrame = {
    // both rank windows run over ≤n rows (post-TakeOrdered) — bounded
    val bmRank  = Window.orderBy(col("score").desc, col(idCol))
    val cosRank = Window.orderBy(col("sim").desc, col(vecIdCol))
    val bm = bm25Scores(docs, terms, textCol = textCol, idCol = idCol)
      .orderBy(col("score").desc, col(idCol)).limit(n)
      .select(col(idCol).as("__id"), row_number().over(bmRank).cast("long").as("r_bm25"))
    val cos = Similarity.bruteForceTopK(embeddings, queryVec, n, vecCol, vecIdCol)
      .select(col(vecIdCol).as("__id"), row_number().over(cosRank).cast("long").as("r_cos"))
    val contrib = (r: String) =>
      coalesce(lit(1.0) / (lit(rrfK.toDouble) + col(r)), lit(0.0))
    val fused = contrib("r_bm25") + contrib("r_cos")
    bm.join(cos, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol), col("r_bm25"), col("r_cos"), fused.as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
      .withColumn("rrf", round(col("rrf"), 6))
  }
}
