package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}

/** Distribution diagnostics for join/aggregation keys — the measurement
  * step before reaching for [[Joins.saltedJoin]] or AQE tuning. Skew is a
  * property of the data, not the plan; at 100 TB the difference between
  * "salt this join" and "leave it to AQE" should come from numbers like
  * these, produced by one aggregation pass.
  */
object Stats {

  /** Top-`topN` heaviest keys with their absolute counts and share of all
    * rows, plus `skew_ratio` = heaviest key count ÷ mean key count. A
    * ratio near 1 is uniform; hundreds means one shuffle partition will
    * carry that key's full weight (AQE can split it for sort-merge joins,
    * salting is needed anywhere AQE can't reach). */
  def keySkew(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(keyCol).agg(F.count(F.lit(1)).as("n"))
    // no cache(): the 1-row totals frame is consumed exactly once (the
    // broadcast below), and a cache here would leak a registered entry
    // per diagnostic call for the session's lifetime
    val totals = counts.agg(
      F.sum(F.col("n")).as("total_rows"),
      F.count(F.lit(1)).as("n_keys"))
    counts
      .orderBy(F.col("n").desc, F.col(keyCol))
      .limit(topN)
      .crossJoin(F.broadcast(totals))
      .select(
        F.col(keyCol).cast("string").as("key"),
        F.col("n"),
        (F.col("n").cast("double") / F.col("total_rows")).as("share"),
        (F.col("n").cast("double") * F.col("n_keys") / F.col("total_rows"))
          .as("skew_ratio"))
  }

  /** Mergeable per-group statistics state — the incremental-aggregate-
    * maintenance pattern: a 100 TB lake never re-aggregates history, it
    * keeps a small per-group STATE table and folds each day's partial
    * into it. Every field here is a commutative monoid (count/sum add,
    * min/max lattice-join), and the sum is decimal — exact and
    * order-independent — so `merge(partial(A), partial(B)) ==
    * partial(A ∪ B)` holds BITWISE, not approximately. q78 proves that
    * equality under the DuckDB hash gate; derived values (avg) are
    * computed once at read time from exact state, never stored.
    *
    * Scale shape: partial() is one map-side-combined shuffle over the
    * batch only (O(day), not O(history)); merge() shuffles the state
    * tables — group-cardinality-sized, tiny next to the data.
    */
  def partialStats(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(F.col): _*).agg(
      F.count(F.lit(1)).as("cnt"),
      // non-null value count carried separately: sum skips nulls, so
      // dividing by cnt (row count) would understate the mean of any
      // nullable metric — avg must divide by n_v, matching SQL AVG
      F.count(F.col(valueCol)).as("n_v"),
      // 12-dp scale: 2 dp quantizes fine-grained metrics (a per-doc
      // quality score of 0.004 would sum to 0 with a systematic bias);
      // 38-12 = 26 integer digits still holds any realistic total
      F.sum(F.col(valueCol).cast("decimal(38,12)")).as("sum_v"),
      F.min(F.col(valueCol)).as("min_v"),
      F.max(F.col(valueCol)).as("max_v"))

  /** Fold two (or more, via repeated union) partial-state frames into
    * one — same schema in, same schema out, so states chain across days. */
  def mergeStats(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy(groupCols.map(F.col): _*).agg(
        F.sum(F.col("cnt")).as("cnt"),
        F.sum(F.col("n_v")).as("n_v"),
        // cast back to the partial() precision so states CHAIN: the state
        // schema is a fixed point of merge, whatever the fold depth
        F.sum(F.col("sum_v")).cast("decimal(38,12)").as("sum_v"),
        F.min(F.col("min_v")).as("min_v"),
        F.max(F.col("max_v")).as("max_v"))

  /** Read-time view over the state: attach derived values (mean over
    * NON-NULL values, null when none — SQL AVG semantics). */
  /** Log₂-bucketed histogram per group — the dataset-card distribution
    * report ("how are document lengths spread per source?") with
    * INTEGER-EXACT bucket edges: bucket = number of binary digits of
    * the value (`length(bin(v))`, = ⌊log₂ v⌋ + 1 for v ≥ 1; v ≤ 0 →
    * bucket 0), so no floating log can disagree across engines —
    * `floor(log2(x))` flips at powers of two under FP rounding, digit
    * count cannot. One shuffle on (group, bucket) with map-side
    * combine; output is ≤ 64 buckets per group at any corpus size. */
  def logHistogram(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String]
  ): DataFrame = {
    val v = F.col(valueCol)
    val bucket = F.when(v <= 0, F.lit(0))
      .otherwise(F.length(F.bin(v.cast("long")))).cast("long")
    df.withColumn("bucket", bucket)
      .groupBy((groupCols.map(F.col) :+ F.col("bucket")): _*)
      .agg(
        F.count(F.lit(1)).as("n"),
        F.min(v).as("min_value"),
        F.max(v).as("max_value"))
  }

  def finalizeStats(state: DataFrame): DataFrame =
    state.withColumn("avg_v",
      F.when(F.col("n_v") === 0, F.lit(null).cast("double"))
        .otherwise(F.col("sum_v").cast("double") / F.col("n_v")))

  /** Per-group k-sigma outlier counts with INTEGER-EXACT arithmetic — no
    * floating sqrt/mean, so the flags are bit-identical across engines and
    * partitionings (what makes the operator hash-gateable, q119).
    *
    * `x` must be integer-valued (scale fractional metrics first, e.g.
    * micros). The test |x − μ| > k·σ is evaluated as the equivalent
    * integer inequality
    *
    *   (n·x − s)² · (n−1)  >  k² · n · (n·ss − s²)
    *
    * (σ² = sample variance), cleared of denominators. All terms are
    * DECIMAL(38,0): exact while n·max|x − pivot| < 10¹⁹. To keep that
    * headroom at any corpus size the values are first shifted by a
    * per-group integer pivot ≈ ⌊mean⌋ — the inequality is invariant under
    * ANY integer shift, and the shifted s′, ss′ come from the unshifted
    * window sums by exact identities (s′ = s − n·p, ss′ = ss − 2·p·s +
    * n·p²), so re-centering costs no extra pass. The pivot itself may be
    * computed in floating point: any integer near the mean works, only the
    * SHIFTED arithmetic must be exact.
    *
    * Plan shape: one window over hash(group) computes (n, s, ss); the
    * per-row flag and the final groupBy reuse the same exchange
    * (HashPartitioning(group) satisfies the groupBy's distribution), so
    * the whole operator is ONE shuffle of the input. */
  def sigmaOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val x = F.col(valueCol).cast(dec)
    val w = Window.partitionBy(groupCols.map(F.col): _*)
    val staged = df
      .withColumn("x", x)
      .withColumn("n", F.count(F.lit(1)).over(w).cast(dec))
      .withColumn("s", F.sum(F.col("x")).over(w).cast(dec))
      .withColumn("ss", F.sum(F.col("x") * F.col("x")).over(w).cast(dec))
      .withColumn("p",
        F.floor(F.col("s").cast("double") / F.col("n").cast("double")).cast(dec))
      .withColumn("xp", F.col("x") - F.col("p"))
      .withColumn("sp", F.col("s") - F.col("n") * F.col("p"))
      .withColumn("ssp",
        F.col("ss") - F.lit(2).cast(dec) * F.col("p") * F.col("s") +
          F.col("n") * F.col("p") * F.col("p"))
    val lhs = (F.col("n") * F.col("xp") - F.col("sp")) *
      (F.col("n") * F.col("xp") - F.col("sp")) * (F.col("n") - F.lit(1).cast(dec))
    val rhs = F.lit(k.toLong * k).cast(dec) * F.col("n") *
      (F.col("n") * F.col("ssp") - F.col("sp") * F.col("sp"))
    staged
      .withColumn("is_out",
        F.when(F.col("n") >= 2 && lhs > rhs, F.lit(1L)).otherwise(F.lit(0L)))
      .groupBy(groupCols.map(F.col): _*)
      .agg(
        F.count(F.lit(1)).as("n"),
        F.sum(F.col("is_out")).as("n_outliers"))
  }
}
