package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary construction and out-of-vocabulary (OOV) scoring —
  * the "does my tokenizer cover this corpus" check a training pipeline
  * runs before committing to a vocab, and the per-document OOV-rate
  * filter that catches encoding junk (a document whose tokens are mostly
  * outside the corpus's own head vocabulary is usually mojibake, markup,
  * or the wrong language).
  *
  * Scale shape, in order:
  *   1. vocabulary = top-`vocabSize` words by corpus frequency: one
  *      shuffle (word counts), then a `TakeOrderedAndProject` top-n —
  *      per-partition heaps merged into N rows, no global sort. The
  *      (freq DESC, word ASC) order makes the boundary deterministic.
  *   2. the N-row vocabulary folds to ONE array row and broadcasts; the
  *      per-document pass is then map-side only (`array_contains` per
  *      token) — no second data-sized shuffle, no join on the token
  *      stream. Right shape for vocabularies up to broadcast size
  *      (~100k words); beyond that, swap the array for a broadcast
  *      semi-join on exploded tokens (one more shuffle, unbounded vocab).
  */
object Vocabulary {

  /** Per-document OOV stats against the corpus's own top-`vocabSize`
    * head vocabulary. Emits `n_tokens`, `n_oov`, `oov_rate` alongside
    * the input columns. */
  def oovStats(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int
  ): DataFrame = {
    val vocab = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__word"))
      .groupBy("__word").agg(count(lit(1)).as("__freq"))
      .orderBy(col("__freq").desc, col("__word"))
      .limit(vocabSize)
      .agg(sort_array(collect_list(col("__word"))).as("__vocab"))
    docs.crossJoin(broadcast(vocab))
      .withColumn("n_tokens",
        TextAnalysis.wsTokenCount(col(textCol)).cast("long"))
      .withColumn("n_oov",
        size(filter(TextAnalysis.tokens(col(textCol)),
          t => !array_contains(col("__vocab"), t))).cast("long"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
      .drop("__vocab")
  }
}
