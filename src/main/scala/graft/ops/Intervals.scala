package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over (key, start, end) rows — merging overlapping or
  * touching ranges into maximal blocks ("gaps and islands") and measuring
  * per-key coverage. The classic uses: distinct active time from
  * heartbeat/session intervals, enrollment-day coverage from date ranges,
  * audit-window union.
  *
  * Algorithm: sort each key's intervals by start; a row opens a NEW block
  * exactly when its start exceeds the running maximum of all previous
  * ends (touching intervals — start == prev end — merge, matching the
  * closed-interval union semantics). The running max and the running
  * block counter are windows over the SAME hash(key) exchange, and the
  * final per-block / per-key aggregates reuse it (HashPartitioning(key)
  * satisfies ClusteredDistribution(key, block)), so the whole operator is
  * ONE shuffle of the input regardless of how many blocks emerge.
  *
  * Scale: per-key state is the sort buffer for that key's rows — skew in
  * rows-per-key maps to task skew exactly like any window; the q118 gate
  * runs it over per-user event intervals where key cardinality is high
  * and per-key counts are small, the shape the operator targets. Start
  * and end must be integers (epoch micros, date serials): coverage sums
  * stay exact.
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
    val keys = keyCols.map(col)
    val ordered = Window.partitionBy(keys: _*).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(ordered.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(prevMax.isNull || col(startCol) > prevMax, lit(1L))
      .otherwise(lit(0L))
    df.withColumn("opens", opens)
      .withColumn("block",
        sum(col("opens")).over(ordered.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((keys :+ col("block")): _*)
      .agg(
        min(col(startCol)).as("block_start"),
        max(col(endCol)).as("block_end"))
      .drop("block")
  }

  /** Per-key roll-up of the merged blocks: block count and total covered
    * length (exact integer sum of block extents). */
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
        sum(col("block_end") - col("block_start")).as("covered"))
}
