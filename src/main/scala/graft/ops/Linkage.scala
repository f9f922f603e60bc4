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

  /** Multi-pass sorted-neighborhood candidate generation (Hernández &
    * Stolfo, SIGMOD'95): for each pass, records sort by a pass-specific
    * key and every pair within a sliding window of `window` consecutive
    * records becomes a candidate. Output: (doc_a, doc_b, n_passes) with
    * doc_a < doc_b — n_passes is the agreement count, the standard
    * match-likelihood prior. The complementary blocking strategy to
    * [[bestMatches]]'s hash blocks: hash blocking needs an
    * error-invariant exact key; sorted neighborhood only needs errors to
    * leave the sort ORDER mostly intact, and multi-passing with
    * differently-structured keys (e.g. swapped word order) covers error
    * models no single key survives.
    *
    * Distributed shape — the textbook algorithm's global sort is replaced
    * by block + boundary stitching, so no stage ever sees a global
    * window:
    *   1. records partition into blocks by the first `blockChars`
    *      characters of the pass key; within a block, neighbors come from
    *      `window − 1` `lead()` columns over ONE bounded window
    *      (partitionBy block) — no self-join, no rank-distance join;
    *   2. pairs that straddle a block boundary are recovered by stitching
    *      the LAST `window − 1` rows of block i with the FIRST
    *      `window − 1` rows of block i+1 (block ranks come from a window
    *      over the DISTINCT block list — metadata-sized, thousands of
    *      rows, explicitly not data-scale) and running the same lead()
    *      pairing inside each stitched group, keeping only cross-block
    *      pairs. Because blocks are key PREFIXES, concatenating block i
    *      before block i+1 preserves key order, so whenever every block
    *      holds at least `window` rows the stitched semantics equal the
    *      global-sort semantics exactly; a pair can straddle at most ONE
    *      boundary, so the only contract deviation is a pair spanning an
    *      entire intermediate block smaller than the window — choose
    *      `blockChars` so blocks ≫ window (coarser prefixes = bigger
    *      blocks) and the deviation vanishes.
    * Skew: a block is at most the records sharing a `blockChars`-char key
    * prefix; widen `blockChars` to split hot prefixes (the window pairing
    * cost is linear in block size either way — only window STATE matters,
    * which is `window` rows).
    *
    * Gate: q216 (SimJoinQueries) — two passes (name-order and
    * swapped-word) over the documents table against a DuckDB oracle that
    * replays the identical block/boundary construction. */
  def sortedNeighborhood(
      records: DataFrame,
      idCol: String,
      passKeys: Seq[org.apache.spark.sql.Column],
      window: Int,
      blockChars: Int = 2
  ): DataFrame = {
    require(window >= 2, s"window must be >= 2: $window")
    require(passKeys.nonEmpty, "at least one pass key is required")
    require(blockChars >= 1, s"blockChars must be >= 1: $blockChars")
    val passes = passKeys.zipWithIndex.map { case (key, i) =>
      val base = records
        .select(col(idCol).cast("long").as("id"),
          key.cast("string").as("__key"))
        .withColumn("__blk", substring(col("__key"), 1, blockChars))
      val wIn = Window.partitionBy("__blk").orderBy(col("__key"), col("id"))
      def leadPairs(df: DataFrame, w: Window.type => org.apache.spark.sql.expressions.WindowSpec,
          crossBlockOnly: Boolean): DataFrame = {
        val spec = w(Window)
        val withLeads = (1 until window).foldLeft(df) { (d, off) =>
          d.withColumn(s"__lead_id_$off", lead(col("id"), off).over(spec))
            .withColumn(s"__lead_blk_$off", lead(col("__blk"), off).over(spec))
        }
        val pairCols = (1 until window).map { off =>
          struct(col(s"__lead_id_$off").as("oid"),
            col(s"__lead_blk_$off").as("oblk"))
        }
        val exploded = withLeads
          .select(col("id"), col("__blk"), explode(array(pairCols: _*)).as("__p"))
          .filter(col("__p.oid").isNotNull)
        val filtered =
          if (crossBlockOnly) exploded.filter(col("__p.oblk") =!= col("__blk"))
          else exploded
        filtered.select(
          least(col("id"), col("__p.oid")).as("doc_a"),
          greatest(col("id"), col("__p.oid")).as("doc_b"))
      }
      val inBlock = leadPairs(base, _.partitionBy("__blk").orderBy(col("__key"), col("id")),
        crossBlockOnly = false)
      // boundary stitch: block ranks over the distinct block list
      val blkRank = base.select("__blk").distinct()
        .withColumn("__br", row_number().over(Window.orderBy("__blk")))
      val ranked = base
        .withColumn("__r", row_number().over(wIn))
        .withColumn("__cnt", count(lit(1)).over(Window.partitionBy("__blk")))
        .join(blkRank, "__blk")
      val tail = ranked.filter(col("__r") > col("__cnt") - lit(window - 1))
        .withColumn("__grp", col("__br"))
      val head0 = ranked.filter(col("__r") <= lit(window - 1) && col("__br") > 1)
        .withColumn("__grp", col("__br") - 1)
      val stitched = tail.unionByName(head0)
        .select(col("id"), col("__key"), col("__blk"), col("__grp"))
      val boundary = leadPairs(
        stitched.withColumnRenamed("__grp", "__g"),
        _.partitionBy("__g").orderBy(col("__key"), col("id")),
        crossBlockOnly = true)
      inBlock.unionByName(boundary).withColumn("__pass", lit(i))
    }
    passes.reduce(_ unionByName _)
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(countDistinct(col("__pass")).as("n_passes"))
  }
}
