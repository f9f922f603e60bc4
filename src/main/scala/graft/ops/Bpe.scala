package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding — learned, not just counted: the real merge-table
  * construction (Sennrich et al. 2016's subword algorithm, the tokenizer
  * family behind modern LLM vocabularies) as an iterative Spark loop, plus
  * the encoder that applies a learned table. [[TextAnalysis.bpeishTokenCount]]
  * approximates a BPE pre-tokenizer's SPLITS; this is the trainable half.
  *
  * State representation is the trick that keeps everything inside
  * codegen'd string built-ins (no UDF): a word's symbol sequence is a
  * single string with every symbol wrapped in a sentinel (U+0001) —
  * `␁l␁␁o␁␁w␁` for [l,o,w] — so applying merge (a,b) is ONE literal
  * `replace(s, "␁a␁␁b␁", "␁ab␁")`:
  *   - boundary-safe: a pattern can only match whole symbols, never a
  *     suffix of one symbol glued to a prefix of the next;
  *   - greedy left-to-right with correct overlap semantics: each
  *     replacement consumes ONLY its own two symbols' wrappers, so
  *     [a,a,a,a] + (a,a) → [aa,aa] exactly like the reference
  *     implementation (a space-joined encoding gets this wrong — the
  *     match eats the separator the next match needs).
  *
  * Scale shape: the loop state is the DISTINCT-WORD frequency table
  * (vocabulary-sized, not corpus-sized — the corpus is scanned once to
  * build it), `localCheckpoint`ed per round like every iterative loop in
  * this engine; per round ONE pair-explode aggregate and ONE top-1
  * `collect` (a single driver row — the k-means pattern). Merge count N
  * means N rounds; a production 30k-merge vocabulary would batch
  * mutually-non-adjacent merges per round to cut rounds ~10×, same
  * state shape. Gated by q142 against an unrolled DuckDB oracle
  * computing the identical loop round by round.
  */
object Bpe {

  /** Symbol wrapper sentinel — U+0001 never appears in corpus text. */
  val S = "\u0001"

  final case class Merge(rank: Int, left: String, right: String, n: Long)

  /** A word decomposed to wrapped single-character symbols:
    * "low" → "␁l␁␁o␁␁w␁". Expression-only; portable to the oracle. */
  def wrapChars(word: Column): Column = {
    val chars = transform(sequence(lit(1), length(word)),
      i => substring(word, i, lit(1)))
    concat(lit(S), array_join(chars, S + S), lit(S))
  }

  /** Wrapped state → symbol array. */
  def unwrap(state: Column): Column =
    split(regexp_replace(state, "^" + S + "|" + S + "$", ""), S + S)

  /** Adjacent (l, r) symbol pairs of a symbol array; empty below two
    * symbols (slice with length 0 — no descending-`sequence` trap). */
  private def adjacentPairs(syms: Column): Column = {
    val n = greatest(size(syms) - 1, lit(0))
    zip_with(
      slice(syms, lit(1), n),
      slice(syms, lit(2), n),
      (l, r) => struct(l.as("l"), r.as("r")))
  }

  /** Learn `numMerges` merges from a corpus column of space-separated
    * text. Deterministic: ties on pair count break by (left, right)
    * ascending. Stops early if the vocabulary runs out of adjacent
    * pairs (returns fewer merges). */
  def learn(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    val words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    var state = words.select(col("freq"), wrapChars(col("w")).as("s"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    for (k <- 1 to numMerges if !exhausted) {
      val top = state
        .select(col("freq"), explode(adjacentPairs(unwrap(col("s")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        merges += Merge(k, l, r, n)
        state = state
          .withColumn("s",
            replace(col("s"), lit(S + l + S + S + r + S), lit(S + l + r + S)))
          .localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Apply a learned merge table to a wrapped word state: the N literal
    * replaces fold into one codegen'd expression chain — encoding rides
    * the scan, zero shuffle, zero driver round-trips. */
  def applyMerges(state: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(state)((s, m) =>
      replace(s, lit(S + m.left + S + S + m.right + S),
        lit(S + m.left + m.right + S)))

  /** Tokenize a text column with a learned table: per word, wrap →
    * apply merges in rank order → unwrap. Returns array<string> of
    * subword tokens in document order. */
  def tokenize(text: Column, merges: Seq[Merge]): Column = {
    val words = filter(split(text, " "), w => length(w) > 0)
    flatten(transform(words, w => unwrap(applyMerges(wrapChars(w), merges))))
  }
}
