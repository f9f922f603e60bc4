package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed batch-curation pipeline — the one-call API a user
  * migrating a pretraining data pipeline actually wants: the canonical
  * stage order (PII scrub → exact-dedup canonicality → classifier gate →
  * language allowlist → deterministic sampling) wired together with a
  * first-failing-stage decision per document, fully auditable (every
  * document comes back with its decision, never silently dropped).
  *
  * Stage order rationale:
  *   - scrub FIRST: nothing downstream (state stores, fingerprints,
  *     sinks) may see or key on raw PII — and dedup must fingerprint the
  *     scrubbed form, or two docs differing only in a redacted email
  *     would not collapse;
  *   - dedup before the gates so the canonical survivor is stable under
  *     gate-config changes;
  *   - sampling LAST so the rate applies to the already-clean pool (a
  *     mix plan from [[Sampling.mixWeights]] slots in here).
  *
  * Scale shape: scrub, classifier, language, and sampling are all
  * map-side expressions (zero shuffle, [[Classifier]]/[[TextAnalysis]]
  * scaladocs); the ONLY exchange is the fingerprint window for
  * canonicality — one hash shuffle on `fp`, O(1) state per group. The
  * whole pipeline is a single-shuffle pass over the corpus, which is
  * what lets a daily 100 TB refresh run it end-to-end. Measured
  * (runner.TextScaleProbe, sf0.1 -> 10x = 50k docs, local[32]):
  * 0.74 s -> 2.00 s (2.7x for 10x data, sublinear).
  *
  * Every stage is individually oracle-gated (q58/q30/q68/q45/q51); q79
  * gates the COMPOSITION — same expressions, so the pipeline cannot
  * drift from its parts.
  */
object Curation {

  final case class Config(
      langs: Seq[String] = Seq("en"),
      classifierDim: Int = 64,
      classifierBiasTenths: Int = 0,
      sampleRate: Double = 1.0,
      salt: String = "")

  /** Run the composed pipeline. Emits every input row plus `text`
    * (scrubbed in place), `fp`, `score`, `n_tokens`, `decision`
    * (duplicate | classifier | lang | sampled_out | keep — first failing
    * stage wins), and `kept`. */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      cfg: Config
  ): DataFrame = {
    val scrubbed = docs.withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
    val margin = Classifier.marginTenths(
      col(textCol), cfg.classifierDim, cfg.classifierBiasTenths)
    val w = Window.partitionBy("fp")
    scrubbed
      .withColumn("fp", md5(col(textCol)))
      .withColumn("__canonical", min(col(idCol)).over(w))
      .withColumn("__margin", margin)
      .withColumn("score", col("__margin").cast("double") / 10.0)
      .withColumn("n_tokens", TextAnalysis.wsTokenCount(col(textCol)).cast("long"))
      .withColumn("decision",
        when(col(idCol) =!= col("__canonical"), "duplicate")
          .when(col("__margin") < 0, "classifier")
          // explicit isNull arm: a bare NOT isInCollection is NULL for a
          // null lang (lang-ID failure, common in real crawls), which
          // skips the when-branch and lets the doc fall through to keep
          .when(col(langCol).isNull ||
            !col(langCol).isInCollection(cfg.langs), "lang")
          .when(!Sampling.keeps(col(idCol), cfg.sampleRate, cfg.salt),
            "sampled_out")
          .otherwise("keep"))
      .withColumn("kept", col("decision") === "keep")
      .drop("__canonical", "__margin")
  }

  /** Gopher-style structural quality rules (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", §A1.1) — the heuristic pre-filter that runs BEFORE the
    * learned classifier in a pretraining pipeline: word-count bounds,
    * mean-word-length bounds, a minimum stop-word presence (gibberish /
    * non-prose detector; the stop-word list is configurable because it
    * is language- and corpus-specific), and a symbol-ratio cap
    * (#/ellipsis spam). Thresholds default to the paper's published
    * values where the corpus makes them meaningful.
    *
    * Every rule is a zero-shuffle map-side expression over the token
    * array — one projection pass, no exchange, trivially 100 TB-safe.
    * Output keeps every row with per-rule booleans plus the conjunction
    * `keep` (auditable, like [[curate]]'s decision column — a filter
    * that silently drops rows can't be debugged). Gated by q159.
    * MEASURED (GovernanceScaleProbe, sf0.1 documents ×10):
    * 0.21 → 0.94 s = 4.4×; TextScaleProbe 30× doc LENGTH: 10.3× —
    * sub-linear in both axes. */
  final case class GopherConfig(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      stopwords: Seq[String] = Seq("the", "be", "to", "of", "and", "that",
        "have", "with"),
      minStopHits: Int = 2,
      maxSymbolRatio: Double = 0.1)

  def gopherRules(
      docs: DataFrame,
      textCol: String,
      cfg: GopherConfig = GopherConfig()
  ): DataFrame = {
    val internal = Seq("__gw", "n_words", "mean_word_len", "stop_hits",
      "symbol_ratio", "g_word_count", "g_mean_word_len", "g_stopwords",
      "g_symbols", "keep")
    require(!internal.contains(textCol) &&
      docs.columns.intersect(internal).isEmpty,
      s"input columns collide with gopherRules internals")
    val stopArr = array(cfg.stopwords.map(lit): _*)
    docs
      .withColumn("__gw", TextAnalysis.tokens(col(textCol)))
      .withColumn("n_words", size(col("__gw")).cast("long"))
      // total word chars / word count; single-space corpus ⇒ exact
      .withColumn("mean_word_len",
        length(regexp_replace(col(textCol), " ", "")).cast("double") /
          col("n_words").cast("double"))
      .withColumn("stop_hits",
        size(filter(col("__gw"), w => array_contains(stopArr, w)))
          .cast("long"))
      .withColumn("symbol_ratio",
        size(filter(col("__gw"), w => w === "#" || w === "…"))
          .cast("double") / col("n_words").cast("double"))
      .withColumn("g_word_count",
        col("n_words") >= cfg.minWords && col("n_words") <= cfg.maxWords)
      .withColumn("g_mean_word_len",
        col("mean_word_len") >= cfg.minMeanWordLen &&
          col("mean_word_len") <= cfg.maxMeanWordLen)
      .withColumn("g_stopwords", col("stop_hits") >= cfg.minStopHits)
      .withColumn("g_symbols", col("symbol_ratio") <= cfg.maxSymbolRatio)
      .withColumn("keep",
        col("g_word_count") && col("g_mean_word_len") &&
          col("g_stopwords") && col("g_symbols"))
      .drop("__gw")
  }
}
