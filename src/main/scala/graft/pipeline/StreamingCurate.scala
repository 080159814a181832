package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Streaming faces of the curation operators — the row-local filters and the
 * windowed observability aggregate an ingest pipeline runs while documents
 * arrive, complementing [[StreamingDedup]] (which owns the stateful dedup
 * guarantees).
 *
 * [[curateStream]] is intentionally stateless: every predicate (PII scrub,
 * language allowlist, quality floor, token bounds, repetition reject) is a
 * pure projection/filter, so it applies to a streaming frame UNCHANGED —
 * append mode, any sink, no watermark, no state store, and at 100 TB/day
 * it runs at scan speed on however many cores the source partitions give
 * it. Chain [[StreamingDedup.exactDedup]] (in-flight) and
 * [[StreamingDedup.startGatedIngest]] (vs the historical corpus) after it
 * for the dedup stages; filtering first means the dedup state and index
 * appends only ever see documents worth keeping.
 */
object StreamingCurate {

  /**
   * The row-local curation pipeline over a (streaming or static) frame:
   * optional [[TextAnalysis.scrubPii]], then the [[Curate.curate]]
   * membership predicates, then the optional repetition reject — all fused
   * into one projection + filter. Returns the input rows (text scrubbed if
   * requested) with `predicted_lang`, `quality` and `n_tokens` appended —
   * the columns the downstream mix/monitor stages need, computed once.
   */
  def curateStream(
      stream: DataFrame,
      keepLangs: Seq[String] = Seq("en"),
      minQuality: Double = 0.5,
      minTokens: Long = 5,
      maxTokens: Long = 100000,
      scrub: Boolean = false,
      maxRepetition: Option[(Double, Double, Double)] = None,
      textCol: String = "text"
  ): DataFrame = {
    val base = if (scrub) TextAnalysis.scrubPii(stream, textCol).drop("pii_hits") else stream
    val (nTokens, _, _, quality) = TextAnalysis.qualityCols(col(textCol))
    val (lang, _)                = TextAnalysis.langIdCols(col(textCol))
    val kept = base
      .withColumn("predicted_lang", lang)
      .withColumn("quality", quality)
      .withColumn("n_tokens", nTokens)
      .filter(
        col("predicted_lang").isin(keepLangs: _*) &&
          col("quality") >= minQuality &&
          col("n_tokens").between(minTokens, maxTokens))
    maxRepetition.fold(kept) { case (dw, tw, db) =>
      val (_, _, _, repetitive) = TextAnalysis.repetitionCols(col(textCol), dw, tw, db)
      kept.filter(!repetitive)
    }
  }

  /**
   * Windowed ingest observability: per (event-time window, predicted
   * language) the arriving doc count, how many pass the curation
   * predicate, and mean quality / token count — the numbers an operator
   * watches to catch a quality regression or a language-mix shift in the
   * feed within minutes instead of at the next corpus audit.
   *
   * Watermarked tumbling windows in update mode: state is one row per
   * (window, lang) and is evicted once the watermark passes — bounded at
   * any ingest rate. The aggregation is map-side combined; only per-group
   * partials shuffle.
   */
  def qualityMonitor(
      stream: DataFrame,
      tsCol: String,
      windowDur: String = "1 minute",
      watermarkDelay: String = "5 minutes",
      keepLangs: Seq[String] = Seq("en"),
      minQuality: Double = 0.5,
      minTokens: Long = 5,
      maxTokens: Long = 100000,
      textCol: String = "text"
  ): DataFrame = {
    val (nTokens, _, _, quality) = TextAnalysis.qualityCols(col(textCol))
    val (lang, _)                = TextAnalysis.langIdCols(col(textCol))
    val accepted = lang.isin(keepLangs: _*) &&
      quality >= minQuality && nTokens.between(minTokens, maxTokens)
    stream
      .select(col(tsCol), lang.as("predicted_lang"), quality.as("quality"),
        nTokens.as("n_tokens"), accepted.cast("long").as("accepted"))
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col("predicted_lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("accepted")).as("accepted_docs"),
        round(avg(col("quality")), 4).as("avg_quality"),
        round(avg(col("n_tokens")), 2).as("avg_tokens"))
  }

  /**
   * Streaming face of [[TextAnalysis.importanceWeights]] — DSIR scoring of
   * documents AS THEY ARRIVE, against a target-domain snapshot. The
   * vocabulary→log-ratio table ([[TextAnalysis.importanceLogRatios]],
   * built batch-side — the distribution estimates must come from a corpus
   * snapshot regardless) is collected ONCE into a `map_from_arrays`
   * literal, so per-row scoring is pure codegen'd expression work:
   * `element_at` lookups folded over the doc's own words — no UDF, no
   * stream-static join, no state store, append mode at scan speed.
   * Out-of-vocabulary words contribute 0 (they appear in neither corpus —
   * the ratio carries no signal). Driver/plan footprint is vocab-bounded;
   * at web scale trim the snapshot to the top-K vocabulary by combined
   * count before passing it in (the tail's ratios are ~0 anyway).
   *
   * Per-doc fold order is the document's own word order (row-local, no
   * sort) — FP-equal to the batch operator's sorted fold only up to
   * summation order; the spec bounds the drift at 1e-9.
   */
  def importanceScoreStream(
      stream: DataFrame,
      logRatios: DataFrame,
      minWeight: Option[Double] = None,
      textCol: String = "text"
  ): DataFrame = {
    val rows  = logRatios.select(col("w"), col("lr")).collect()
    val lrMap = map_from_arrays(
      typedlit(rows.map(_.getString(0)).toSeq),
      typedlit(rows.map(_.getDouble(1)).toSeq))
    val ws = TextAnalysis.words(col(textCol))
    val weight = round(
      aggregate(transform(ws, w => coalesce(element_at(lrMap, w), lit(0.0))),
        lit(0.0), (a, x) => a + x) / size(ws), 6)
    val scored = stream.withColumn("weight", weight)
    minWeight.fold(scored)(t => scored.filter(col("weight") >= t))
  }

  /**
   * STREAMING WATERMARK GATE — the streaming face of
   * [[TextAnalysis.watermarkScores]]: drop (or tag) documents whose
   * greenlist-parity z-score exceeds `maxAbsZ` at ingest, BEFORE they
   * enter the corpus — the synthetic-text firewall. The batch op is
   * row-local by construction (nested in-array folds, no shuffle), so
   * this is the [[graft.pipeline.Chat.chatGateStream]] stateless-gate
   * shape: the same expressions run unchanged on a stream, batch ≡
   * streaming per record, no state, no watermark needed.
   */
  def watermarkGateStream(
      stream: DataFrame,
      maxAbsZ: Double = 4.0,
      seed: Long = 7L,
      minTokens: Long = 16L,
      textCol: String = "text"
  ): DataFrame = {
    require(maxAbsZ > 0.0, "maxAbsZ must be positive")
    val ws = filter(TextAnalysis.words(col(textCol)), w => length(w) >= 1)
    val green = (acc: Column, w: Column) =>
      acc + when(pmod(Dedup.polyHash(w, 131L, seed), lit(2L)) === 0L, 1L).otherwise(0L)
    stream
      .withColumn("n_tokens", size(ws).cast("long"))
      .withColumn("wm_z",
        round((lit(2.0) * aggregate(ws, lit(0L), green).cast("double")
          - col("n_tokens").cast("double")) / sqrt(col("n_tokens").cast("double")), 6))
      // under minTokens there is no evidence either way: the doc passes
      .filter(col("n_tokens") < minTokens || abs(col("wm_z")) < maxAbsZ)
  }

  /**
   * STREAMING DOMAIN-MIX MONITOR — the streaming face of
   * [[Sampling.domainReweight]]: per event-time window and domain
   * (language), the doc count and the 6-dp mean quality deficit that
   * drives the DoReMi-style reweighting, as a watermarked windowed
   * aggregate (update mode; state = one row per (window, domain),
   * evicted at the watermark; the quality expressions are row-local
   * codegen, the deficit mean snap-then-divide over exact lattice ints
   * exactly like the batch operator). Cross-domain weight normalization
   * spans groups, which a streaming aggregate cannot do — derive weights
   * per emitted window downstream with [[Sampling.mixWeightsOf]]
   * (foreachBatch, or the live rollup a mix dashboard reads).
   */
  def domainMixMonitor(
      stream: DataFrame,
      tsCol: String,
      windowDur: String = "1 minute",
      watermarkDelay: String = "5 minutes",
      domainCol: String = "lang",
      textCol: String = "text"
  ): DataFrame = {
    val (_, _, _, quality) = TextAnalysis.qualityCols(col(textCol))
    val qInt = round(quality * 10000, 0).cast("long")
    stream
      .filter(col(domainCol).isNotNull)
      .select(col(tsCol), col(domainCol).cast("string").as("domain"), qInt.as("__q"))
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        round(lit(1.0) - sum(col("__q")).cast("double") /
          (lit(10000.0) * count(lit(1)).cast("double")), 6).as("loss"))
  }

  /**
   * TRENDING-TERM monitor — per (event-time window, term) occurrence
   * counts for terms crossing `minCount`: the heavy-hitters feed behind
   * "what vocabulary is suddenly flooding the stream" alerts (spam bursts
   * and template floods surface here before any dedup pass sees them).
   *
   * Watermarked tumbling windows in update mode; the token explode is
   * row-local, the count map-side combined, and state is one row per
   * (window, term) evicted at the watermark. The `minCount` cut is a
   * stateless filter ON the aggregate (streaming-legal), keeping the
   * emitted set to the heavy tail — a per-window TOP-K rank would not be
   * (no window functions over streaming aggregates); rank downstream on
   * the emitted rows if k-bounded output is needed.
   */
  /**
   * STREAMING BM25 ROUTER — score and route documents AS THEY ARRIVE
   * against a set of named term queries, using corpus statistics from a
   * prebuilt [[Retrieval.TermIndex]] ("which topic bucket does this new
   * doc belong to", in the stream). Per query, the Okapi weight chain is
   * EXACTLY [[Retrieval.bm25ScoresIndexed]]'s: idf from the index's
   * postings (collected once per query term — bounded), tf and dl from
   * the arriving document's own words (row-local), n/avgdl from the
   * index scalars. The winning route maximizes score with ties to the
   * smaller query name; rows below `minScore` drop.
   *
   * Scale shape: after the one bounded idf collect, scoring is PURE
   * row-local codegen'd expression work — no state store, no
   * stream-static join, no shuffle; append mode at scan speed (the
   * [[importanceScoreStream]] pattern). Per-query fold order is the
   * sorted term list, so scores replay deterministically; they agree
   * with the batch operator to summation-order noise (the spec bounds it
   * at 1e-9 — batch folds sort by weight, this folds by term).
   */
  def bm25RouteStream(
      stream: DataFrame,
      ix: Retrieval.TermIndex,
      queries: Map[String, Seq[String]],
      k1: Double = 1.2,
      b: Double = 0.75,
      minScore: Double = 0.0,
      textCol: String = "text"
  ): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    queries.foreach { case (name, ts) =>
      require(ts.nonEmpty, s"query '$name' has no terms") }
    require(ix.n > 0, "empty corpus index")
    val allTerms = queries.values.flatten.toSeq.distinct
    val dfs = ix.postings.filter(col("term").isin(allTerms: _*))
      .groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val nD    = ix.n.toDouble
    val avgdl = ix.sumDl.toDouble / ix.n
    val ws = TextAnalysis.words(col(textCol))
    val dl = size(ws).cast("double")
    def scoreOf(terms: Seq[String]) =
      terms.distinct.sorted.map { t =>
        val df2 = dfs.getOrElse(t, 0.0)
        val idf = math.log(1.0 + (nD - df2 + 0.5) / (df2 + 0.5))
        val tf  = size(filter(ws, w => w === lit(t))).cast("double")
        lit(idf) * (tf * (k1 + 1)) / (tf + lit(k1) * (lit(1.0) - b + lit(b) * dl / avgdl))
      }.reduce(_ + _)
    // argmax with smaller-name ties: sort (−score, name) ascending, take head
    val ranked = sort_array(array(queries.toSeq.sortBy(_._1).map { case (name, terms) =>
      struct((-scoreOf(terms)).as("ns"), lit(name).as("q"))
    }: _*))
    stream
      .withColumn("__best", element_at(ranked, 1))
      .withColumn("route", col("__best.q"))
      .withColumn("score", -col("__best.ns"))
      .drop("__best")
      .filter(col("score") >= minScore)
  }

  def termTrendMonitor(
      stream: DataFrame,
      tsCol: String,
      windowDur: String = "1 minute",
      watermarkDelay: String = "5 minutes",
      minCount: Long = 10L,
      textCol: String = "text"
  ): DataFrame =
    stream
      .select(col(tsCol), explode(TextAnalysis.words(col(textCol))).as("term"))
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col("term"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
}
