package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Classifier, TextAnalysis}

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
}
