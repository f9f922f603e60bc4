package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Classifier, TextAnalysis, WebGraph}

/** Streaming curation for a document feed — the incremental twin of the
  * batch curation decision (q45): each micro-batch of arriving documents
  * is quality-scored and language-gated with the SAME codegen'd
  * expressions the batch path uses (stateless, no shuffle), then exact
  * near-dup re-deliveries are dropped by content fingerprint within the
  * watermark horizon.
  *
  * State is one row per fingerprint, partitioned by fingerprint, expiring
  * with the watermark — bounded by (ingest rate × watermark), not stream
  * history. A full MinHash near-dup pass stays batch-side (its candidate
  * join needs the corpus index; see Dedup.incrementalMinhash for the
  * batch-incremental variant) — this stream gate is the cheap first
  * filter in front of it, which is how production feeds layer the two.
  */
object DocumentStreams {

  /** Gate + dedup an arriving document stream. Expects columns
    * (`ts` timestamp, `text`, `lang`); emits the surviving rows with
    * `quality` and `fp` attached. */
  def curateStream(
      docs: DataFrame,
      minQuality: Double,
      langs: Seq[String],
      watermark: String = "1 hour"
  ): DataFrame =
    docs
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .filter(col("quality") >= minQuality && col("lang").isInCollection(langs))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming PII scrub — the incremental twin of the batch redaction
    * pass (q58), using the SAME codegen'd expressions. Stateless (pure
    * map, no watermark, no state store): a scrub belongs at the front of
    * the feed, before anything stateful sees — or persists — raw text.
    * Emits the redacted text in place plus `n_pii` (total patterns
    * found) so a monitor can alert on PII-rate shifts in the feed. */
  def scrubStream(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import TextAnalysis.{EmailPattern, Ipv4Pattern, PhonePattern}
    docs
      .withColumn("n_pii",
        TextAnalysis.countMatches(col(textCol), EmailPattern) +
          TextAnalysis.countMatches(col(textCol), PhonePattern) +
          TextAnalysis.countMatches(col(textCol), Ipv4Pattern))
      .withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
  }

  /** Streaming classifier gate — the incremental twin of the q68
    * hashed-linear quality scorer. The model is a pure expression
    * (integer-tenths weights addressed by md5 of the token — see
    * ops.Classifier), so the streaming form is stateless and
    * shuffle-free: score and gate each micro-batch at read speed,
    * BEFORE anything stateful (dedup state stores, sinks) pays for a
    * document the gate would drop. Batch ≡ streaming by construction —
    * StreamingSpec asserts the equality on the same rows. */
  def classifyStream(
      docs: DataFrame,
      textCol: String = "text",
      dim: Int = 64,
      biasTenths: Int = 0,
      keepOnly: Boolean = true
  ): DataFrame = {
    val scored = Classifier.hashedLinearScore(docs, textCol, dim, biasTenths)
    if (keepOnly) scored.filter(col("keep")) else scored
  }

  /** Streaming crawl-frontier dedup — the incremental twin of q84's
    * canonical identity: arriving URLs (`ts`, `url`) canonicalize with
    * the SAME expression chain the batch path uses, then re-seen
    * canonical keys drop within the watermark horizon. This is the gate
    * in front of a fetcher: per-visit noise (tracking params, casing,
    * fragments) stops re-queueing the same resource. State is one row
    * per canonical URL, expiring with the watermark — bounded by
    * (frontier rate × horizon), not crawl history; the full dedup
    * against the historical fetch log is the batch join this stream
    * gate sits in front of (the curateStream/incrementalMinhash
    * layering). */
  def frontierStream(
      urls: DataFrame,
      watermark: String = "1 hour"
  ): DataFrame =
    urls
      .withColumn("canonical_url", WebGraph.canonicalizeUrl(col("url")))
      .filter(col("canonical_url") =!= "")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("canonical_url")

  /** Streaming link-graph build — the incremental twin of the q82 batch
    * edge aggregate: pages arrive as (`ts`, `src_host`, `html`), links
    * extract with the SAME zero-shuffle expressions
    * ([[graft.ops.WebGraph.extractLinks]]/`hostOf`), and edges count
    * into event-time windows. State is one row per
    * (window, src_host, dst_host), expiring with the watermark — the
    * hourly edge deltas a nightly [[graft.ops.WebGraph.hostRank]] batch
    * folds into the full graph, which is how a crawl keeps its authority
    * signal fresh without re-scanning history. */
  def linkEdgesStream(
      pages: DataFrame,
      watermark: String = "1 hour",
      windowLength: String = "1 hour"
  ): DataFrame =
    pages
      .select(col("ts"), col("src_host"),
        explode(WebGraph.extractLinks(col("html"))).as("url"))
      .select(col("ts"), col("src_host"),
        WebGraph.hostOf(col("url")).as("dst_host"))
      .filter(col("dst_host") =!= "")
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))
      .select(col("window.start").as("window_start"),
        col("src_host"), col("dst_host"), col("n_links"))
}
