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

  /** Per-group discrete quantile threshold as a window column: the SMALLEST
    * value whose cumulative distribution reaches `p` — a value drawn FROM
    * the data (quantile_disc semantics), so no interpolation arithmetic
    * exists to drift between engines; the oracle states the identical
    * cume_dist + conditional-min algebra. Both windows hash-partition on
    * the group, so stacking thresholds adds sorts but never exchanges. */
  private def discThreshold(
      groupCols: Seq[String], valueCol: String, p: Double): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(groupCols.map(F.col): _*)
    val cd = F.cume_dist().over(byGroup.orderBy(F.col(valueCol)))
    F.min(F.when(cd >= p, F.col(valueCol))).over(byGroup)
  }

  /** Winsorization — clip each value to its group's [pLo, pHi] discrete
    * quantiles, the standard tail-taming step before training-statistics
    * aggregation (a corrupted parse that claims 10¹² tokens would
    * otherwise own the mean). Returns the input plus `v_clipped`; clipped
    * values are existing data points (discrete quantiles), so the output
    * is bit-exact across engines — no interpolated floats. One shuffle on
    * hash(group); the quantile windows and the clip projection share it
    * (MEASURED 3.1× wall at 10× data, OlapScaleProbe). Gated by q121. */
  def winsorize(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      pLo: Double,
      pHi: Double
  ): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentile pair ($pLo, $pHi)")
    require(!df.columns.contains("v_clipped"),
      "input already has a v_clipped column")
    val v = F.col(valueCol)
    val lo = discThreshold(groupCols, valueCol, pLo)
    val hi = discThreshold(groupCols, valueCol, pHi)
    df.withColumn("v_clipped",
      F.when(v < lo, lo).when(v > hi, hi).otherwise(v))
  }

  /** Equi-depth (equal-frequency) histogram per group — `k` buckets each
    * holding ≈ n/k rows, the statistic query optimizers and dataset cards
    * prefer over equi-width when distributions are skewed (every bucket
    * is equally informative). Bucket assignment is ⌈cume_dist · k⌉
    * (clamped to k): deterministic under ties — equal values share a
    * cume_dist, so they can never straddle a boundary, and no
    * interpolation arithmetic exists to drift between engines. Output:
    * (group, bucket, n, lo, hi) — lo/hi are the bucket's actual extreme
    * data points. ONE exchange: the cume_dist window hash-partitions on
    * the group and the (group, bucket) groupBy reuses it (subset rule).
    * Gated by q123. */
  def equiDepthHistogram(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, s"need at least one bucket, got $k")
    val out = Seq("bucket", "n", "lo", "hi")
    require(groupCols.intersect(out).isEmpty,
      s"group columns collide with output columns: ${groupCols.intersect(out).mkString(", ")}")
    import org.apache.spark.sql.expressions.Window
    val cd = F.cume_dist()
      .over(Window.partitionBy(groupCols.map(F.col): _*).orderBy(F.col(valueCol)))
    df.withColumn("bucket",
        F.least(F.ceil(cd * F.lit(k)), F.lit(k.toLong)))
      .groupBy((groupCols.map(F.col) :+ F.col("bucket")): _*)
      .agg(
        F.count(F.lit(1)).as("n"),
        F.min(F.col(valueCol)).as("lo"),
        F.max(F.col(valueCol)).as("hi"))
  }

  /** Robust (median/MAD) per-group outlier counts — the companion to
    * [[sigmaOutliers]] for heavy-tailed metrics where mean/variance are
    * themselves dragged by the outliers being hunted. A row is an outlier
    * when |x − median| > k·MAD (MAD = median of absolute deviations).
    * Both medians are DISCRETE (smallest value with cume_dist ≥ 0.5), so
    * every comparison is between doubles copied from the data —
    * deterministic across engines and partitionings, no interpolation.
    * Degenerate MAD = 0 (over half the group identical) flags every
    * value ≠ median, the textbook behavior. Two window sorts, ONE
    * exchange on hash(group) (PlanSpec-asserted); MEASURED 2.6× wall at
    * 10× data (OlapScaleProbe). Gated by q122. */
  def robustOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Double
  ): DataFrame = {
    val internal = Seq("_rob_med", "_rob_dev", "_rob_mad", "_rob_out")
    require(df.columns.intersect(internal).isEmpty,
      s"input columns collide with robustOutliers internals: " +
        df.columns.intersect(internal).mkString(", "))
    require(!groupCols.contains("n") && !groupCols.contains("n_outliers"),
      "group columns collide with output columns n/n_outliers")
    val staged = df
      .withColumn("_rob_med", discThreshold(groupCols, valueCol, 0.5))
      .withColumn("_rob_dev", F.abs(F.col(valueCol) - F.col("_rob_med")))
      .withColumn("_rob_mad", discThreshold(groupCols, "_rob_dev", 0.5))
    staged
      .withColumn("_rob_out",
        F.when(F.col("_rob_dev") > F.lit(k) * F.col("_rob_mad"), 1L)
          .otherwise(0L))
      .groupBy(groupCols.map(F.col): _*)
      .agg(
        F.count(F.lit(1)).as("n"),
        F.sum(F.col("_rob_out")).as("n_outliers"))
  }

  /** Per-group k-sigma outlier counts, deterministic across engines and
    * partitionings (hash-gateable: q117).
    *
    * `x` must be integer-valued (scale fractional metrics first). The test
    * |x − μ| > k·σ (σ² = sample variance) is evaluated cleared of
    * denominators as
    *
    *   d² · (n−1)  >  k² · n · V,   d = n·x − s,  V = n·ss − s²
    *
    * over per-group sums that are themselves DECIMAL(38,0)-exact: the
    * values are first shifted by a per-group integer pivot ≈ ⌊mean⌋ (the
    * inequality is invariant under any integer shift; the shifted s′, ss′
    * come from the unshifted window sums by exact identities s′ = s − n·p,
    * ss′ = ss − 2·p·s + n·p², so re-centering costs no extra pass — and
    * |s′| < n always, since p is within 1 of the mean).
    *
    * Exactness domain, and what happens beyond it: the decimal comparison
    * is performed exactly whenever BOTH sides are < 10³⁶ — a per-row
    * branch guard evaluated on double approximations first (margin 100×
    * under the DECIMAL(38,0) ceiling, far wider than the double's 1e-15
    * relative error). Outside the guard the sides are compared in double:
    * still fully deterministic (same exact sums in, IEEE arithmetic), and
    * a wrong verdict would need the two sides to agree to ~15 significant
    * digits while one exceeds 10³⁶ — beyond k-sigma's meaningfulness.
    * This replaces the r5 formulation, which evaluated the decimal path
    * unconditionally and threw NUMERIC_VALUE_OUT_OF_RANGE (ANSI) once
    * n·|deviation| crossed ~10¹⁹ — e.g. epoch-micros data, n=1000
    * (OpsSpec covers exactly that domain now).
    *
    * The un-guarded staging sums impose the only hard domain limit:
    * n·x̄² must stay below 10³⁸ (the p·s / n·p² re-centering terms), i.e.
    * micros-scale magnitudes (~10¹⁵) are safe to ~10⁷ rows per group;
    * larger groups should pre-scale the unit.
    *
    * Plan shape: one window over hash(group) computes (n, s, ss); the
    * per-row flag and the final groupBy reuse the same exchange
    * (HashPartitioning(group) satisfies the groupBy's distribution), so
    * the whole operator is ONE shuffle of the input. MEASURED
    * (OlapScaleProbe, sf0.1 events ×10 = 1M rows): 0.65 → 1.79 s = 2.8×
    * at 10× data. */
  def sigmaOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val internal = Seq("_sig_x", "_sig_n", "_sig_s", "_sig_ss", "_sig_p",
      "_sig_xp", "_sig_sp", "_sig_ssp", "_sig_out")
    require(df.columns.intersect(internal).isEmpty,
      s"input columns collide with sigmaOutliers internals: " +
        df.columns.intersect(internal).mkString(", "))
    require(!groupCols.contains("n") && !groupCols.contains("n_outliers"),
      "group columns collide with output columns n/n_outliers")
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(groupCols.map(F.col): _*)
    val staged = df
      .withColumn("_sig_x", F.col(valueCol).cast(dec))
      .withColumn("_sig_n", F.count(F.lit(1)).over(w).cast(dec))
      .withColumn("_sig_s", F.sum(F.col("_sig_x")).over(w).cast(dec))
      .withColumn("_sig_ss",
        F.sum(F.col("_sig_x") * F.col("_sig_x")).over(w).cast(dec))
      .withColumn("_sig_p",
        F.floor(F.col("_sig_s").cast("double") / F.col("_sig_n").cast("double"))
          .cast(dec))
      .withColumn("_sig_xp", F.col("_sig_x") - F.col("_sig_p"))
      .withColumn("_sig_sp", F.col("_sig_s") - F.col("_sig_n") * F.col("_sig_p"))
      .withColumn("_sig_ssp",
        F.col("_sig_ss") - F.lit(2).cast(dec) * F.col("_sig_p") * F.col("_sig_s") +
          F.col("_sig_n") * F.col("_sig_p") * F.col("_sig_p"))
    val n = F.col("_sig_n"); val xp = F.col("_sig_xp")
    val sp = F.col("_sig_sp"); val ssp = F.col("_sig_ssp")
    val k2 = F.lit(k.toLong * k)
    // double approximations steer the branch; exact decimals decide in it
    val nD = n.cast("double"); val dD = (n * xp - sp).cast("double")
    val vD = nD * ssp.cast("double") - sp.cast("double") * sp.cast("double")
    val lhsD = dD * dD * (nD - F.lit(1.0))
    val rhsD = F.lit((k.toLong * k).toDouble) * nD * vD
    val guard = F.abs(lhsD) < F.lit(1e36) && F.abs(rhsD) < F.lit(1e36)
    val d = n * xp - sp
    val lhs = d * d * (n - F.lit(1).cast(dec))
    val rhs = k2.cast(dec) * n * (n * ssp - sp * sp)
    val isOut = F.when(n < 2, F.lit(false))
      .when(guard, lhs > rhs)
      .otherwise(lhsD > rhsD)
    staged
      .withColumn("_sig_out", F.when(isOut, F.lit(1L)).otherwise(F.lit(0L)))
      .groupBy(groupCols.map(F.col): _*)
      .agg(
        F.count(F.lit(1)).as("n"),
        F.sum(F.col("_sig_out")).as("n_outliers"))
  }

  /** Distribution-drift report between a baseline and a current snapshot
    * — the monitoring gate every production feature pipeline runs before
    * trusting new data: per group, bucket `valueCol` on the
    * [[logHistogram]] integer-exact binary buckets and compare shares
    * with total-variation distance (½ Σ|p−q|) and a half-count-smoothed
    * chi-square statistic (Σ (q−p)²/p, baseline share floored at half a
    * count so empty baseline buckets don't divide by zero). PSI is the
    * textbook metric here, but its ln() term is library-rounded
    * differently across engines — these two carry the same signal on
    * +−×÷ only, which is what lets q144's oracle hash-match it (the
    * q112/q130 "no floating transcendentals in a gate" rule).
    *
    * Exactness: per-bucket shares are one double division of exact
    * counts; the cross-bucket reduction folds a BUCKET-SORTED list
    * sequentially ([[graft.ops.Similarity]] dot-product discipline
    * applied to aggregation), so no partition fold order leaks into the
    * result. Scale shape: one (group, bucket) aggregate per side
    * (map-side combined), a bucket-universe full join, one final
    * group aggregate — everything after the first exchange is
    * bucket-count-sized, not data-sized. */
  def driftReport(
      baseline: DataFrame,
      current: DataFrame,
      valueCol: String,
      groupCols: Seq[String]
  ): DataFrame = {
    val internal = Seq("_dr_bucket", "_dr_nb", "_dr_nc", "_dr_arr",
      "n_base", "n_cur", "n_buckets", "tvd", "chi2")
    require(groupCols.intersect(internal).isEmpty && !internal.contains(valueCol),
      s"input columns collide with driftReport internals: " +
        groupCols.mkString(", "))
    val v = F.col(valueCol)
    val bucket = F.when(v <= 0, F.lit(0))
      .otherwise(F.length(F.bin(v.cast("long")))).cast("long")
    def bucketCounts(df: DataFrame, as: String) =
      df.withColumn("_dr_bucket", bucket)
        .groupBy((groupCols.map(F.col) :+ F.col("_dr_bucket")): _*)
        .agg(F.count(F.lit(1)).as(as))
    val joined = bucketCounts(baseline, "_dr_nb")
      .join(bucketCounts(current, "_dr_nc"),
        groupCols :+ "_dr_bucket", "full_outer")
      .select((groupCols.map(F.col) ++ Seq(
        F.col("_dr_bucket"),
        F.coalesce(F.col("_dr_nb"), F.lit(0L)).as("_dr_nb"),
        F.coalesce(F.col("_dr_nc"), F.lit(0L)).as("_dr_nc"))): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(F.col): _*)
    val shares = joined
      .withColumn("n_base", F.sum(F.col("_dr_nb")).over(w))
      .withColumn("n_cur", F.sum(F.col("_dr_nc")).over(w))
      // an entirely-absent side (a group new to, or gone from, the
      // feed) yields all-zero shares rather than a divide-by-zero:
      // tvd lands at its 0.5 ceiling and chi2 at 0 — drift flagged by
      // construction, no ANSI crash, mirrored verbatim in the oracle
      .withColumn("_dr_arr", F.struct(
        F.col("_dr_bucket"),
        F.when(F.col("n_base") === 0, F.lit(0.0d))
          .otherwise(F.col("_dr_nb").cast("double") / F.col("n_base")).as("p"),
        F.when(F.col("n_cur") === 0, F.lit(0.0d))
          .otherwise(F.col("_dr_nc").cast("double") / F.col("n_cur")).as("q"),
        F.when(F.col("n_base") === 0, F.lit(0.0d))
          .otherwise(F.greatest(F.col("_dr_nb").cast("double"), F.lit(0.5d)) /
            F.col("n_base")).as("ps")))
    shares
      .groupBy(groupCols.map(F.col): _*)
      .agg(
        F.max(F.col("n_base")).as("n_base"),
        F.max(F.col("n_cur")).as("n_cur"),
        F.count(F.lit(1)).as("n_buckets"),
        F.sort_array(F.collect_list(F.col("_dr_arr"))).as("_dr_arr"))
      .withColumn("tvd",
        F.aggregate(
          F.transform(F.col("_dr_arr"), x => F.abs(x("p") - x("q"))),
          F.lit(0.0d), (acc, x) => acc + x) * 0.5d)
      .withColumn("chi2",
        F.aggregate(
          F.transform(F.col("_dr_arr"),
            x => F.when(x("ps") === 0.0d, F.lit(0.0d))
              .otherwise((x("q") - x("p")) * (x("q") - x("p")) / x("ps"))),
          F.lit(0.0d), (acc, x) => acc + x))
      .drop("_dr_arr")
  }

  /** Pairwise Pearson correlation over pre-scaled INTEGER value columns —
    * the feature-screening pass (collinearity, leakage smells) run before
    * training on tabular features. One aggregation pass computes every
    * first/second moment (k sums, k square-sums, k·(k−1)/2 cross-sums —
    * all map-side combined, one exchange of ONE row), then each pair's
    * correlation is assembled on that row and exploded; nothing after the
    * aggregate is data-sized.
    *
    * Cross-engine exactness discipline: the caller supplies integer-valued
    * LONG columns (scale your doubles first — cents, hundredths; the
    * per-row products must stay under 2^63), the moments are summed as
    * DECIMAL(38,0) (exact, order-independent — a raw long sum would
    * overflow at sf0.1's 6e19 square-sums, and ANSI mode would throw), and
    * only the final assembly runs in double: `(n·Sxy − Sx·Sy) /
    * (√(n·Sxx − Sx²)·√(n·Syy − Sy²))` with every operand cast to double
    * FIRST and the same op tree on both engines — +,−,×,÷,√ are all
    * IEEE-correctly-rounded, so the doubles match bit-for-bit (the
    * q112/q130 no-transcendentals gate rule; √ is exempt because IEEE 754
    * requires correct rounding for it). A zero-variance column yields
    * NaN (0/0) for its pairs — screen constants out upstream. Gated by
    * q154. MEASURED
  * (GovernanceScaleProbe, sf0.1 lineitem ×10): 0.51 → 2.96 s = 5.8×. */
  def corrPairs(df: DataFrame, vars: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(vars.size >= 2, "corrPairs needs at least two variables")
    val names = vars.map(_._1)
    require(names.distinct.size == names.size, s"duplicate var names: $names")
    val nAgg = F.count(F.lit(1)).as("_c_n")
    val moments =
      vars.map { case (nm, c) =>
        F.sum(c.cast("decimal(38,0)")).as(s"_c_s_$nm") } ++
      vars.map { case (nm, c) =>
        F.sum((c * c).cast("decimal(38,0)")).as(s"_c_ss_$nm") } ++
      (for { i <- vars.indices; j <- (i + 1) until vars.size } yield
        F.sum((vars(i)._2 * vars(j)._2).cast("decimal(38,0)"))
          .as(s"_c_x_${names(i)}_${names(j)}"))
    val one = df.agg(nAgg, moments: _*)
    def d(c: String) = F.col(c).cast("double")
    val rows = for { i <- vars.indices; j <- (i + 1) until vars.size } yield {
      val (x, y) = (names(i), names(j))
      val num = d("_c_n") * d(s"_c_x_${x}_$y") - d(s"_c_s_$x") * d(s"_c_s_$y")
      val den =
        F.sqrt(d("_c_n") * d(s"_c_ss_$x") - d(s"_c_s_$x") * d(s"_c_s_$x")) *
        F.sqrt(d("_c_n") * d(s"_c_ss_$y") - d(s"_c_s_$y") * d(s"_c_s_$y"))
      F.struct(F.lit(x).as("var_x"), F.lit(y).as("var_y"),
        (num / den).as("corr"))
    }
    one.select(F.explode(F.array(rows: _*)).as("_c_r"))
      .select(F.col("_c_r.var_x").as("var_x"), F.col("_c_r.var_y").as("var_y"),
        F.col("_c_r.corr").as("corr"))
      .orderBy("var_x", "var_y")
  }

  /** Pearson chi-square independence cells for two categoricals — the
    * "are these two labels independent" screen (stratification checks,
    * feature/label dependence). Emits PER-CELL rows `(rowVal, colVal,
    * obs, expected, contrib)` rather than the folded statistic: the cells
    * ARE the diagnostic (which combinations are over/under-represented),
    * and per-cell output sidesteps cross-cell double-sum ordering entirely
    * (a caller wanting the scalar folds the sorted cells, the
    * [[driftReport]] discipline). One (row,col) aggregate — map-side
    * combined, output is category-product-sized — then three window sums
    * over that tiny cell frame. Expected counts and contributions are
    * pure +,−,×,÷ on exact longs cast to double: bit-identical across
    * engines. Gated by q155. MEASURED (GovernanceScaleProbe, sf0.1
    * orders ×10): 0.17 → 0.36 s = 2.1×. */
  def chi2Cells(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val internal = Seq("obs", "expected", "contrib", "_x2_rt", "_x2_ct", "_x2_n")
    require(!internal.contains(rowCol) && !internal.contains(colCol),
      s"input columns collide with chi2Cells internals: $rowCol, $colCol")
    val w = org.apache.spark.sql.expressions.Window
    val cells = df.groupBy(rowCol, colCol).agg(F.count(F.lit(1)).as("obs"))
      .withColumn("_x2_rt", F.sum("obs").over(w.partitionBy(rowCol)))
      .withColumn("_x2_ct", F.sum("obs").over(w.partitionBy(colCol)))
      .withColumn("_x2_n", F.sum("obs").over(w.partitionBy()))
    val e = F.col("_x2_rt").cast("double") * F.col("_x2_ct").cast("double") /
      F.col("_x2_n").cast("double")
    cells
      .withColumn("expected", e)
      .withColumn("contrib",
        (F.col("obs").cast("double") - F.col("expected")) *
          (F.col("obs").cast("double") - F.col("expected")) / F.col("expected"))
      .drop("_x2_rt", "_x2_ct", "_x2_n")
      .orderBy(rowCol, colCol)
  }

  /** Cramér's V — the χ² association folded to ONE comparable scalar in
    * [0, 1]: `V = √(χ² / (n · min(r−1, c−1)))`. Where [[chi2Cells]]
    * answers "WHICH cells deviate", this answers "how associated are
    * these two categoricals at all" — the number a feature-selection or
    * redundancy audit ranks column pairs by. The cross-cell χ² sum is a
    * fold over the CATEGORY-SORTED cell list (the [[categoricalDivergence]]
    * discipline — partition fold order cannot leak into the double), the
    * grid includes ABSENT cells (their expected mass counts), and √ is
    * IEEE-exact, so the scalar hash-matches across engines. Contract:
    * both columns non-null with ≥ 2 distinct values (V is undefined on a
    * constant column — min(r−1, c−1) = 0). One data-sized aggregate;
    * everything after is category-product-sized. Gated by q303. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val internal = Seq("_cv_n", "_cv_rt", "_cv_ct", "_cv_tot", "_cv_r",
      "_cv_c", "_cv_arr", "n_rows", "n_a", "n_b", "chi2", "cramers_v")
    require(!internal.contains(aCol) && !internal.contains(bCol),
      s"input columns collide with cramersV internals: $aCol, $bCol")
    val cells = df.groupBy(aCol, bCol).agg(F.count(F.lit(1)).as("_cv_n"))
    val rows = cells.groupBy(aCol).agg(F.sum("_cv_n").as("_cv_rt"))
    val colsF = cells.groupBy(bCol).agg(F.sum("_cv_n").as("_cv_ct"))
    val tot = cells.agg(F.sum("_cv_n").as("_cv_tot"),
      F.countDistinct(F.col(aCol)).as("_cv_r"),
      F.countDistinct(F.col(bCol)).as("_cv_c"))
    val grid = rows.crossJoin(F.broadcast(colsF))
      .join(cells, Seq(aCol, bCol), "left_outer")
      .na.fill(0L, Seq("_cv_n"))
      .crossJoin(F.broadcast(tot))
    val e = F.col("_cv_rt").cast("double") * F.col("_cv_ct").cast("double") /
      F.col("_cv_tot").cast("double")
    val dev = F.col("_cv_n").cast("double") - e
    val cell = F.struct(
      F.col(aCol).cast("string").as("a"),
      F.col(bCol).cast("string").as("b"),
      (dev * dev / e).as("x"))
    grid
      .agg(
        F.max(F.col("_cv_tot")).as("n_rows"),
        F.max(F.col("_cv_r")).as("n_a"),
        F.max(F.col("_cv_c")).as("n_b"),
        F.sort_array(F.collect_list(cell)).as("_cv_arr"))
      .withColumn("chi2",
        F.aggregate(F.col("_cv_arr"), F.lit(0.0d), (acc, x) => acc + x("x")))
      .select(F.col("n_rows"), F.col("n_a"), F.col("n_b"), F.col("chi2"),
        F.sqrt(F.col("chi2") /
          (F.col("n_rows").cast("double") *
            F.least(F.col("n_a") - 1, F.col("n_b") - 1).cast("double")))
          .as("cramers_v"))
  }

  /** Per-group categorical diversity + divergence from the corpus — the
    * "is this source's language mix collapsing / drifting from the
    * whole" monitor for mixture-controlled pretraining corpora. Per
    * group: `n_rows`, Simpson concentration `Σp²` (1 = single category),
    * `effective_cats = 1/Σp²` (Hill number of order 2 — the "how many
    * languages is this source really" reading), and squared Hellinger
    * distance to the corpus-wide distribution `0.5·Σ(√p−√q)²` ∈ [0,1].
    * Simpson/Hellinger are chosen OVER entropy/KL deliberately: they need
    * only +,−,×,÷,√ (IEEE-exact, cross-engine hash-stable — the
    * q112/q130 gate rule), while ln is a non-correctly-rounded libm call
    * that differs in the last ulp between JVM and DuckDB.
    *
    * Shapes: one (group, cat) aggregate (map-side combined) is the only
    * data-sized pass; the group×category alignment grid and the
    * per-group sorted-fold (category-ordered, so no partition fold order
    * leaks — [[driftReport]] discipline) are category-universe-sized.
    * Contract: the category column is bounded-cardinality (languages,
    * sources — not IDs) and NON-NULL — the alignment grid joins on the
    * category, and SQL null-equality would silently drop a null
    * category's mass from p while keeping it in the group total;
    * coalesce nulls to a sentinel upstream. Gated by q156. MEASURED
    * (GovernanceScaleProbe,
    * sf0.1 documents ×10): 0.44 → 0.36 s = 0.8× — grid-dominated at this
    * size; the data-sized pass is one map-side-combined aggregate. */
  def categoricalDivergence(df: DataFrame, groupCol: String, catCol: String): DataFrame = {
    val internal = Seq("_cd_n", "_cd_ng", "_cd_nc", "_cd_nt", "_cd_arr",
      "n_rows", "simpson", "effective_cats", "hellinger_sq")
    require(!internal.contains(groupCol) && !internal.contains(catCol),
      s"input columns collide with categoricalDivergence internals")
    val counts = df.groupBy(groupCol, catCol).agg(F.count(F.lit(1)).as("_cd_n"))
    val w = org.apache.spark.sql.expressions.Window
    // alignment grid: every group × every corpus category, so a category
    // ABSENT from a group contributes p=0 (its √q mass still counts in
    // Hellinger — dropping absent cells would understate divergence)
    val groups = counts.groupBy(groupCol).agg(F.sum("_cd_n").as("_cd_ng"))
    val cats = counts.groupBy(catCol).agg(F.sum("_cd_n").as("_cd_nc"))
      .withColumn("_cd_nt", F.sum("_cd_nc").over(w.partitionBy()))
    val grid = groups.crossJoin(F.broadcast(cats))
      .join(counts, Seq(groupCol, catCol), "left_outer")
      .na.fill(0L, Seq("_cd_n"))
    val p = F.col("_cd_n").cast("double") / F.col("_cd_ng").cast("double")
    val q = F.col("_cd_nc").cast("double") / F.col("_cd_nt").cast("double")
    val cell = F.struct(
      F.col(catCol),
      (p * p).as("p2"),
      ((F.sqrt(p) - F.sqrt(q)) * (F.sqrt(p) - F.sqrt(q))).as("hc"))
    grid
      .groupBy(groupCol)
      .agg(
        F.max(F.col("_cd_ng")).as("n_rows"),
        F.sort_array(F.collect_list(cell)).as("_cd_arr"))
      .withColumn("simpson",
        F.aggregate(F.col("_cd_arr"), F.lit(0.0d), (a, x) => a + x("p2")))
      .withColumn("effective_cats", F.lit(1.0d) / F.col("simpson"))
      .withColumn("hellinger_sq",
        F.aggregate(F.col("_cd_arr"), F.lit(0.0d),
          (a, x) => a + x("hc")) * 0.5d)
      .drop("_cd_arr")
      .orderBy(groupCol)
  }
}
