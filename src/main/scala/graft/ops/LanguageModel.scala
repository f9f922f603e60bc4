package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained word-bigram language model and per-document
  * predictability scoring — the KenLM-shaped quality filter (CCNet
  * trains an n-gram LM and drops documents whose perplexity is an
  * outlier; the "wrong-language / boilerplate / gibberish" signal).
  *
  * Score = mean conditional probability of each bigram under add-one
  * smoothing: mean over positions of p(w2|w1) = (c(w1 w2)+1)/(c(w1 ·)+V).
  * Production KenLM works in log space; log's last ulp differs across
  * libm implementations, so the cross-engine gate scores the probability
  * domain instead — same ranking information (mean-p and perplexity are
  * both monotone summaries of the same per-position distribution), and
  * every arithmetic step here is exact-int division + ordered summation,
  * bit-identical in any IEEE-754 engine:
  *   - counts and V are integers;
  *   - each p is ONE double division of two exact ints (correctly
  *     rounded by IEEE, engine-independent);
  *   - the per-doc sum folds a SORTED list left-to-right — same values,
  *     same order, same additions (the DotProduct determinism rule).
  *
  * Scale shape:
  *   - bigram extraction is map-side (slice+zip on the token array —
  *     no posexplode/self-join, no shuffle);
  *   - LM build: one shuffle to (bigram, count), one small shuffle for
  *     the left-context totals;
  *   - scoring: a join of exploded doc bigrams against the LM. The LM
  *     after KenLM-style count pruning fits broadcast (top bigrams of
  *     a 100 TB corpus ≲ GBs); unpruned, it is a plain shuffle join on
  *     the bigram key — no skew (bigram keys are near-uniform);
  *   - the per-doc fold collects one doc's OWN probabilities only —
  *     bounded by document length, never by corpus size.
  *
  * Measured (runner.TextScaleProbe, sf0.1 → 10× = 50k docs, local[32]):
  * train + score 1.08 s → 3.86 s (3.6× for 10× data — the LM join and
  * doc fold both scale linearly; fixed stage setup absorbs the rest).
  */
object LanguageModel {

  /** Bigrams of a token array as "w1 w2" strings; empty array below 2
    * tokens. Map-side — `slice` + `zip_with`, no explode. */
  def bigrams(text: Column): Column = {
    val ws = TextAnalysis.tokens(text)
    zip_with(
      slice(ws, lit(1), size(ws) - 1),
      slice(ws, lit(2), size(ws) - 1),
      (a, b) => concat(a, lit(" "), b))
  }

  /** LM build from an already-exploded bigram frame — the ONE copy of
    * the (bigram, c12, c1) construction, shared by [[bigramCounts]]
    * (standalone train) and [[bigramScore]] (train + score off one
    * explode), so a smoothing or pruning change cannot drift between
    * the two entry points. */
  private def lmFromBigrams(bg: DataFrame): DataFrame = {
    val c12 = bg.groupBy("bigram").agg(count(lit(1)).as("c12"))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    c12.join(c1, Seq("w1")).select("bigram", "c12", "c1")
  }

  /** The trained model: (bigram, c12, c1) — pair count and left-context
    * total. Persist/write this once per corpus snapshot. */
  def bigramCounts(docs: DataFrame, textCol: String): DataFrame =
    lmFromBigrams(docs.select(explode(bigrams(col(textCol))).as("bigram")))

  /** Score every document by mean smoothed conditional probability of
    * its bigrams under the corpus's own bigram LM. Emits `n_bigrams`
    * and `mean_condp` (null when the doc has < 2 tokens). */
  def bigramScore(
      docs: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    // One bigram explode feeds BOTH the LM build and the per-doc scoring
    // join — persisted, or each consumer re-pays the corpus tokenize
    // pass (the Index.bm25TopK / Dedup shingle-frame precedent). The
    // persist releases before return: the narrow per-doc score frame
    // (id + two numbers, NOT the corpus-width result) materializes
    // eagerly via localCheckpoint, after which nothing reads docBg
    // again (the hostRankFrom discipline). The vocab count still needs
    // its own unigram pass (doc-final tokens never appear on a
    // bigram's left side, so it is not derivable from the bigram
    // frame).
    val docBg = docs.select(col(idCol).as("__id"),
      explode(bigrams(col(textCol))).as("bigram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lm = lmFromBigrams(docBg)
    val vocabSize = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .agg(countDistinct("w").as("v"))
    val p = docBg
      .join(lm, Seq("bigram"), "left")
      .crossJoin(broadcast(vocabSize))
      .select(col("__id"),
        ((coalesce(col("c12"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v"))).as("p"))
    val scored = p.groupBy("__id").agg(
      count(lit(1)).as("n_bigrams"),
      (aggregate(sort_array(collect_list(col("p"))), lit(0.0d),
        (acc, x) => acc + x) / count(lit(1))).as("mean_condp"))
      .localCheckpoint()
    docBg.unpersist()
    docs.join(scored, docs(idCol) === scored("__id"), "left")
      .drop("__id")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }
}
