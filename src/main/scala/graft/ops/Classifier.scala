package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear classifier scoring — the fastText-shaped quality
  * gate every web-scale curation pipeline runs (CCNet, RefinedWeb, FineWeb
  * all score documents with a linear model over hashed bag-of-words
  * features before anything expensive sees the text).
  *
  * The hashing trick: token → bucket `h(token) mod dim`, score =
  * bias + Σ w[bucket]. No vocabulary file ships with the job — the
  * weight for a bucket is looked up by hashing the bucket id itself, so
  * the whole model is a pure expression over the text column.
  *
  * Deterministic across engines by construction:
  *   - bucket ids come from the first 4 hex chars of `md5(token)` —
  *     byte-identical in Spark and DuckDB;
  *   - weights are INTEGER tenths in [-10, 10] derived from
  *     `md5('w' || bucket)`. The per-document sum is integer arithmetic —
  *     exact and order-independent — and divides by 10 only once at the
  *     end, so no float-summation-order hazard exists anywhere.
  *
  * In production the integer weights are a trained model's, quantized
  * (int8 weights are standard for exactly this reproducibility reason);
  * the sigmoid is monotone, so thresholding the raw margin is equivalent
  * to thresholding the probability and no transcendental (whose last ulp
  * differs across libm implementations) enters the comparison gate.
  *
  * Scale shape: ZERO shuffle — tokenize, hash, and sum are all map-side
  * expressions; the only cost is two md5 calls per token, inside the
  * scan stage. At 100 TB this runs at parquet-read speed.
  */
object Classifier {

  /** First 4 hex chars of md5 as an integer in [0, 65535]. */
  private def h16(c: Column): Column =
    conv(substring(md5(c), 1, 4), 16, 10).cast("long")

  /** Integer weight in [-10, 10] (tenths) for a feature bucket. */
  private def bucketWeightTenths(bucket: Column): Column =
    conv(substring(md5(concat(lit("w"), bucket.cast("string"))), 1, 2), 16, 10)
      .cast("long") % 21 - 10

  /** Raw margin in integer tenths: bias + Σ_tokens w[h(token) mod dim]. */
  def marginTenths(text: Column, dim: Int, biasTenths: Int): Column =
    aggregate(
      transform(TextAnalysis.tokens(text),
        t => bucketWeightTenths(h16(t) % dim)),
      lit(biasTenths).cast("long"),
      (acc, x) => acc + x)

  /** Score every document: emits `n_tokens`, `score` (the real-valued
    * margin, integer tenths / 10), and the `keep` decision at margin ≥ 0
    * (= sigmoid ≥ 0.5). */
  def hashedLinearScore(
      docs: DataFrame,
      textCol: String,
      dim: Int,
      biasTenths: Int = 0
  ): DataFrame = {
    val m = marginTenths(col(textCol), dim, biasTenths)
    docs
      .withColumn("n_tokens", TextAnalysis.wsTokenCount(col(textCol)).cast("long"))
      .withColumn("score", m.cast("double") / 10.0)
      .withColumn("keep", (m >= 0).cast("boolean"))
  }
}
