package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over (key, start, end) rows — merging overlapping or
  * adjacent ranges into maximal blocks ("gaps and islands") and measuring
  * per-key coverage. The classic uses: distinct active days from
  * enrollment date ranges, heartbeat/session union, audit windows.
  *
  * Semantics: intervals are CLOSED on integer points — [start, end] covers
  * end − start + 1 points, and two intervals merge when they overlap OR
  * are adjacent (next.start == prev.end + 1): [1,3] and [4,6] union to
  * [1,6] = 6 days, the enrollment-day convention. (Callers with half-open
  * [start, end) data subtract 1 from `end` first.) Start and end must be
  * integers (date serials, epoch units): coverage sums stay exact.
  *
  * Algorithm: sort each key's intervals by start; a row opens a NEW block
  * exactly when its start exceeds (running max of previous ends) + 1. The
  * running max and the running block counter are windows over the SAME
  * hash(key) exchange, and the final per-block / per-key aggregates reuse
  * it (HashPartitioning(key) satisfies ClusteredDistribution(key, block)),
  * so the whole operator is ONE shuffle of the input regardless of how
  * many blocks emerge.
  *
  * Scale: per-key state is the sort buffer for that key's rows — skew in
  * rows-per-key maps to task skew exactly like any window; the q116 gate
  * runs it over per-user event intervals where key cardinality is high
  * and per-key counts are small, the shape the operator targets.
  * MEASURED (OlapScaleProbe, sf0.1 events ×10): 0.64 → 0.89 s = 1.4× at
  * 10× data — stage setup dominates at this scale.
  */
object Intervals {

  /** Maximal merged blocks: one row per (key, block) with the block's
    * extent. Ties on (start, end) are order-insensitive — the running
    * max only grows, so equal starts land in the same block whichever
    * sorts first. */
  def mergeIntervals(
      df: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String
  ): DataFrame = {
    val internal = Seq("_iv_opens", "_iv_block")
    require(df.columns.intersect(internal).isEmpty,
      s"input columns collide with mergeIntervals internals: " +
        df.columns.intersect(internal).mkString(", "))
    val keys = keyCols.map(col)
    val ordered = Window.partitionBy(keys: _*).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(ordered.rowsBetween(Window.unboundedPreceding, -1))
    // closed-interval union: adjacent blocks (start == prevMax + 1) merge
    val opens = when(prevMax.isNull || col(startCol) > prevMax + lit(1L), lit(1L))
      .otherwise(lit(0L))
    df.withColumn("_iv_opens", opens)
      .withColumn("_iv_block",
        sum(col("_iv_opens"))
          .over(ordered.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((keys :+ col("_iv_block")): _*)
      .agg(
        min(col(startCol)).as("block_start"),
        max(col(endCol)).as("block_end"))
      .drop("_iv_block")
  }

  /** Per-key roll-up of the merged blocks: block count and total covered
    * points — exact integer Σ (block_end − block_start + 1), the
    * closed-interval measure ([1,3]∪[2,5]∪[4,6] covers 6 days). */
  def coverage(
      df: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String
  ): DataFrame =
    mergeIntervals(df, keyCols, startCol, endCol)
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(col("block_end") - col("block_start") + lit(1L)).as("covered"))
}
