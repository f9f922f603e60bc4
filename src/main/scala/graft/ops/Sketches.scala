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
}
