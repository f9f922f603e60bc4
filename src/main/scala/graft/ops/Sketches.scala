package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches — HyperLogLog distinct counting for
  * the scales where exact `count_distinct` stops being an option: a
  * per-key exact distinct over 100 TB shuffles every (key, value) pair;
  * the sketch shuffles a fixed 2^lgK-register summary per key and is
  * MERGEABLE, which is the property that matters — daily sketches
  * union into weekly/monthly cardinalities without rescanning history,
  * the [[Stats]] incremental-maintenance story applied to distincts.
  *
  * Built on Spark's DataSketches-backed `hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate` (codegen'd aggregates, no
  * UDF). Deterministic for a fixed input SET: registers are max-folded
  * per hashed value, so estimate order-independence holds (asserted in
  * the spec along with the merge law and a measured error bound).
  * NOT oracle-gated: DuckDB's approx_count_distinct is a different HLL
  * implementation — the cross-engine contract here is the error bound,
  * not bit equality; the exact twin (A10 distinct / q44-style counts)
  * stays the correctness reference.
  */
object Sketches {

  /** Per-key HLL sketch of `valueCol` — the persistable daily artifact.
    * One shuffle on the keys; map-side partial sketches mean each
    * partition contributes registers, not raw values. `lgK` trades
    * 2^lgK bytes per key for accuracy (~1.04/√2^lgK relative error;
    * lgK 12 ≈ 1.6%). */
  def distinctSketch(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      lgK: Int = 12
  ): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("distinct_sketch"))

  /** Fold previously-built sketches (same lgK) across a finer grain —
    * e.g. daily (day, source) sketches → per-source totals. This is
    * the rescue from O(history): the union reads sketch bytes only. */
  def mergeSketches(
      sketches: DataFrame,
      keyCols: Seq[String],
      sketchCol: String = "distinct_sketch"
  ): DataFrame =
    sketches.groupBy(keyCols.map(col): _*)
      .agg(hll_union_agg(col(sketchCol)).as("distinct_sketch"))

  /** Read the estimate off a sketch column. */
  def estimate(
      sketches: DataFrame,
      sketchCol: String = "distinct_sketch",
      as: String = "approx_distinct"
  ): DataFrame =
    sketches.withColumn(as, hll_sketch_estimate(col(sketchCol)))
      .drop(sketchCol)

  /** Count-min sketch in TABULAR form — (cms_row, cms_col, cnt) cells
    * instead of one opaque array blob, because that is the shape Spark
    * merges for free: the groupBy's map-side partial combine collapses
    * arbitrarily many input rows into ≤ depth×width cells per
    * partition BEFORE the exchange, so the shuffle carries sketch-sized
    * frames no matter the input volume, and daily sketches union into
    * weekly ones with a plain sum-by-cell ([[cmsMerge]]) — the same
    * mergeability contract as the HLL family, for FREQUENCY instead of
    * cardinality.
    *
    * Estimates are one-sided: for every item, min-over-rows of its
    * cells ≥ the true count (collisions only ever inflate), with the
    * classic ε·N overflow bound at width = ⌈e/ε⌉ and confidence
    * 1−(1/2)^depth. The one-sidedness is what makes CMS composable
    * with an EXACT verify pass — a candidate set from the sketch
    * provably contains every true heavy hitter ([[heavyHitters]];
    * property-tested in the spec). Hash rows are xxhash64 with the row
    * index folded in — engine-deterministic, no UDF, codegen'd. */
  def cmsBuild(
      df: DataFrame,
      itemCol: String,
      depth: Int = 4,
      width: Int = 1024
  ): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad cms geometry: $depth x $width")
    df.select(explode(cmsCells(col(itemCol), depth, width)).as("__p"))
      .select(col("__p.cms_row").as("cms_row"), col("__p.cms_col").as("cms_col"))
      .groupBy("cms_row", "cms_col")
      .agg(count(lit(1)).as("cnt"))
  }

  /** The depth probe positions of one item — shared by build and
    * estimate so the two sides can never disagree on the hash row. */
  private[graft] def cmsCells(item: org.apache.spark.sql.Column, depth: Int, width: Int) =
    array((0 until depth).map(i =>
      struct(lit(i).as("cms_row"),
        pmod(xxhash64(item, lit(i)), lit(width)).as("cms_col"))): _*)

  /** Sum sketches cell-wise — the union of the underlying multisets.
    * Sketches must share (depth, width). */
  def cmsMerge(sketches: DataFrame): DataFrame =
    sketches.groupBy("cms_row", "cms_col").agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for each distinct item in `items`: min over the
    * item's depth cells, 0 when a cell was never touched. The sketch
    * is broadcast (≤ depth×width rows by construction), so the probe
    * is a zero-shuffle map-side join + one aggregate on the item. */
  def cmsEstimate(
      items: DataFrame,
      sketch: DataFrame,
      itemCol: String,
      depth: Int = 4,
      width: Int = 1024
  ): DataFrame =
    items.select(col(itemCol)).distinct()
      .select(col(itemCol), explode(cmsCells(col(itemCol), depth, width)).as("__p"))
      .select(col(itemCol), col("__p.cms_row").as("cms_row"),
        col("__p.cms_col").as("cms_col"))
      .join(broadcast(sketch), Seq("cms_row", "cms_col"), "left_outer")
      .groupBy(itemCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))

  /** Exact heavy hitters with CMS candidate pruning — the two-pass
    * pattern that makes "items with count ≥ T" viable at 100 TB: pass
    * one builds the fixed-size sketch; the candidate set (estimate ≥
    * T) provably contains every true heavy hitter (one-sided error);
    * pass two exact-counts ONLY rows matching a candidate (broadcast
    * semi-join — the full-cardinality (item → count) exchange a naive
    * groupBy pays, with its billions of distinct-item rows, never
    * happens; only candidate traffic is shuffled). Output is EXACT:
    * (item, n) for every item with true count ≥ threshold — false
    * positives die in the verify pass. Gated by q138 against a plain
    * GROUP BY/HAVING oracle. */
  def heavyHitters(
      df: DataFrame,
      itemCol: String,
      threshold: Long,
      depth: Int = 4,
      width: Int = 1024
  ): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1: $threshold")
    import org.apache.spark.storage.StorageLevel
    val src = df.persist(StorageLevel.MEMORY_AND_DISK)
    val sketch = cmsBuild(src, itemCol, depth, width)
    val candidates = cmsEstimate(src, sketch, itemCol, depth, width)
      .filter(col("cms_estimate") >= threshold)
      .select(itemCol)
    val out = src
      .join(broadcast(candidates), Seq(itemCol), "left_semi")
      .groupBy(itemCol)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .localCheckpoint()
    src.unpersist()
    out
  }
}
