package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: find, for each record of a dirty
  * feed, its best match in a clean reference — the dedup problem when the
  * "duplicates" are typos, truncations and appendages instead of byte
  * copies (customer files, supplier masters, author lists).
  *
  * Two-stage shape, because the naive formulation is a string-distance
  * CROSS JOIN and dies at any scale:
  *   1. BLOCK: candidate pairs only form inside a block key computed from
  *      each record's own attributes (perturbation-stable name slice +
  *      exact attributes like region). One hash-shuffle on the block key;
  *      pair count is Σ|block|², bounded by the blocking design, never
  *      |dirty|×|clean|.
  *   2. SCORE + RESOLVE: edit distance (`levenshtein`, codegen'd
  *      built-in) filters candidates to `maxDistance`, then ONE window
  *      per dirty record picks the best match (distance, then id — fully
  *      deterministic).
  *
  * Blocking trades recall for scale by construction: a match whose block
  * keys differ is invisible (same contract as every LSH-banded operator
  * in [[Dedup]]). Choose block columns the expected error model cannot
  * touch — the q141 fixture's tail-edit errors leave a mid-name digit
  * slice intact, the classic "first-k-characters" blocking.
  */
object Linkage {

  /** Best clean match per dirty record. `dirty` must carry (idCol,
    * nameCol, blockCols...), `clean` the same column names; ids must be
    * distinct within each side. Output: (dirty_id, match_id, distance)
    * — dirty records with no candidate inside `maxDistance` are absent
    * (left-anti them against this to get the unmatched feed). */
  def bestMatches(
      dirty: DataFrame,
      clean: DataFrame,
      idCol: String,
      nameCol: String,
      blockCols: Seq[String],
      maxDistance: Int = 2
  ): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be >= 0: $maxDistance")
    require(blockCols.nonEmpty, "blocking columns are required — an " +
      "unblocked linkage is a cross join; pass an explicit block key")
    val d = dirty.select(
      (col(idCol).as("dirty_id") +: col(nameCol).as("__dn") +:
        blockCols.map(col)): _*)
    val c = clean.select(
      (col(idCol).as("match_id") +: col(nameCol).as("__cn") +:
        blockCols.map(col)): _*)
    val cand = d.join(c, blockCols)
      .withColumn("distance", levenshtein(col("__dn"), col("__cn")))
      .filter(col("distance") <= maxDistance)
    val w = Window.partitionBy("dirty_id")
      .orderBy(col("distance"), col("match_id"))
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("dirty_id", "match_id", "distance")
  }
}
