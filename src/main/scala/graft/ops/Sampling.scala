package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes.
  *
  * Everything here is HASH-based, never RNG-based: a row's fate depends
  * only on (key, salt), so samples are reproducible across runs, engines,
  * partitionings and cluster sizes — the property a training pipeline
  * needs for stable train/validation splits, resumable jobs, and
  * auditable mix definitions. `df.sample()` gives none of that (it is
  * seeded per-partition, so a repartition reshuffles the sample).
  *
  * Mechanism: the first 3 hex chars of `md5(key || salt)` are compared
  * lexicographically against a threshold — hex digits sort in value
  * order, so a string compare IS a numeric compare on the top 12 bits of
  * the hash (resolution 1/4096 ≈ 0.02%). No hex→int parsing, which keeps
  * the predicate a codegen'd string compare and makes it expressible
  * verbatim in any engine with md5 (the DuckDB oracle mirrors it
  * character for character).
  *
  * Scale: the filter is a pure map — no shuffle, pushes below anything
  * stateless, and composes with scans (a sampled read never materializes
  * the dropped rows past the filter).
  *
  * Rates NEST: for the same key and salt, `sample(r1) ⊆ sample(r2)`
  * whenever r1 ≤ r2 (the threshold moves, the hash doesn't) — growing a
  * training split later only adds rows, never churns the existing ones.
  */
object Sampling {

  /** 3-char threshold string for a keep-rate in [0, 1]. Rate 1.0 maps to
    * "g00": 'g' sorts above every hex digit, so 3 hex chars always compare
    * under it (keep-all) while staying a plain same-length string compare.
    * Rate 0 maps to "000", which no hex string sorts under (keep-none). */
  private[graft] def thresholdHex(rate: Double): String = {
    val t = math.round(rate * 4096)
    if (t >= 4096) "g00" else if (t <= 0) "000" else f"$t%03x"
  }

  /** The one hash draw every sampler shares: md5 of (key-as-string ‖
    * salt), null keys hashing as the empty string. Centralized so a
    * change to the null-key or salt convention cannot silently diverge
    * between sampler variants (each variant reads a different prefix
    * width of the same draw). */
  private def drawHex(key: Column, salt: String): Column =
    md5(concat(coalesce(key.cast("string"), lit("")), lit(salt)))

  /** Keep-predicate: row survives iff the top 12 hash bits of
    * (key, salt) fall under `rate`. Change `salt` to draw an independent
    * sample (e.g. "val" vs "test" splits from the same keys). Null keys
    * hash as the empty string (one equivalence class, all kept or all
    * dropped together) — without the coalesce the null predicate would
    * silently drop them at EVERY rate, including keep-all. */
  def keeps(key: Column, rate: Double, salt: String = ""): Column =
    substring(drawHex(key, salt), 1, 3) < lit(thresholdHex(rate))

  /** Uniform deterministic sample at `rate` keyed on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
      salt: String = ""): DataFrame =
    df.filter(keeps(col(keyCol), rate, salt))

  /** Per-row weighted keep-predicate: a row survives with probability
    * equal to its own `weight` (clamped to [0, 1]) — importance
    * sampling, the fourth sampling leg (rate q51, count q62, tokens
    * q65, weight here). The use case is quality-weighted corpus
    * selection: weight = f(quality) keeps good documents at a higher
    * rate without a hard threshold.
    *
    * Deterministic like [[keeps]]: the uniform draw is the top 24 hash
    * bits of (key, salt) scaled by 2⁻²⁴ (an exact power-of-two double),
    * compared once against the clamped weight — reproducible across
    * engines, runs, and partitionings, and MONOTONE per row: raising a
    * row's weight can only add it to the sample, never remove it (the
    * q51 nesting law, row-wise). Zero shuffle. */
  def weightedKeeps(key: Column, weight: Column, salt: String = ""): Column = {
    val u = conv(substring(drawHex(key, salt), 1, 6), 16, 10)
      .cast("double") / 16777216.0
    u < least(greatest(weight, lit(0.0)), lit(1.0))
  }

  /** Weighted deterministic sample: keep each row with probability
    * `weightCol` (clamped to [0, 1]), keyed on `keyCol`. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      salt: String = ""): DataFrame =
    df.filter(weightedKeeps(col(keyCol), col(weightCol), salt))

  /** Deterministic EXACT-size sample: the `n` rows with the smallest
    * md5(key ‖ salt) — a fixed-size draw where [[hashSample]]'s
    * rate-based form gives a binomial-sized one. The use case is
    * eval/holdout-set construction ("exactly 1000 docs"), where set SIZE
    * is part of the contract. Same determinism story as the rate form:
    * the chosen set depends only on (keys, salt), never on partitioning
    * or cluster size.
    *
    * Scale shape: a hash-ranked top-n compiles to
    * TakeOrderedAndProject — per-partition n-row heaps merged on the
    * driver, NO global sort — so it is safe for n up to what one node
    * holds (an eval set), not for sampling half the corpus (use rates
    * for that). The key tiebreak makes the order total even under
    * (astronomically unlikely) hash collisions. */
  def exactSample(df: DataFrame, keyCol: String, n: Int,
      salt: String = ""): DataFrame =
    df.orderBy(
      drawHex(col(keyCol), salt),
      col(keyCol))
      .limit(n)

  /** Deterministic exact-n-PER-STRATUM sample ("5 docs from every
    * source") — the stratified eval-set builder. One hash-ranked window
    * per stratum; the rank<=n filter compiles to WindowGroupLimit
    * (per-group top-n heaps inside the window operator, asserted in
    * PlanSpec), so no stratum is ever fully sorted. Strata smaller than
    * `n` contribute all their rows. */
  def exactStratifiedSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      nPerStratum: Int,
      salt: String = ""
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol)).orderBy(
      drawHex(col(keyCol), salt),
      col(keyCol))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= nPerStratum)
      .drop("__rank")
  }

  /** Mix-weight planning: given RELATIVE target weights per stratum (use
    * integer-valued weights — their sums stay exact in doubles, keeping
    * every derived share bit-identical across engines), compute the
    * largest corpus drawable from the data that honors the target mix
    * WITHOUT upsampling, and each stratum's keep rate for it.
    *
    * The math: target_share_s = w_s / Σw (over observed strata); the
    * binding stratum is the one that runs out first, scale
    * M = min_s(n_s / target_share_s); keep n_keep_s = target_share_s · M
    * of each stratum, i.e. keep_rate_s = n_keep_s / n_s (exactly 1 at the
    * binding stratum). The rates feed [[stratifiedSample]] directly —
    * plan the mix here, execute it there, audit both (this is the
    * DoReMi/Pile-style domain-mixing step expressed as relational
    * algebra).
    *
    * Scale shape: one shuffle (the per-stratum count); the totals and the
    * scale are 1-row aggregates broadcast back (the [[Stats]] pattern) —
    * stratum cardinality is corpus-metadata-sized, never data-sized.
    *
    * @return one row per stratum: (stratum, n_docs, actual_share,
    *         target_share, keep_rate, n_keep) */
  def mixWeights(
      df: DataFrame,
      stratumCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0
  ): DataFrame = {
    val wExpr = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, w)) =>
      when(col(stratumCol) === s, lit(w)).otherwise(acc)
    }
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("n_docs"))
      .withColumn("__w", wExpr)
    val totals = counts.agg(
      sum(col("n_docs")).as("__ntot"), sum(col("__w")).as("__wtot"))
    val shared = counts.crossJoin(broadcast(totals))
      .withColumn("actual_share",
        col("n_docs").cast("double") / col("__ntot").cast("double"))
      .withColumn("target_share", col("__w") / col("__wtot"))
    val scale = shared.agg(
      min(col("n_docs").cast("double") / col("target_share")).as("__scale"))
    shared.crossJoin(broadcast(scale))
      .withColumn("keep_rate",
        least(lit(1.0), col("target_share") * col("__scale") / col("n_docs").cast("double")))
      .withColumn("n_keep",
        least(col("n_docs").cast("double"), col("target_share") * col("__scale")))
      .select(stratumCol, "n_docs", "actual_share", "target_share",
        "keep_rate", "n_keep")
  }

  /** Token-BUDGET-capped per-stratum selection: rank each stratum's rows
    * by `rankBy` (best first) and keep rows while the running token total
    * stays within `budget` — "fill each domain's slice of the training
    * mix with its best documents up to N tokens". This is the
    * budget-based companion to [[exactStratifiedSample]] (exact COUNT per
    * stratum) and [[stratifiedSample]] (RATE per stratum): training mixes
    * are specified in tokens, and documents have wildly different token
    * counts, so neither count nor rate can hit a token target.
    *
    * Semantics are take-while, expressed as a filter: the running sum is
    * monotone (token counts are non-negative), so `cum <= budget` keeps
    * exactly the prefix that fits and nothing after the first overflow —
    * deterministic given a total `rankBy` order (include a key tiebreak).
    *
    * Scale shape: ONE shuffle on the stratum; the running sum is an O(1)
    * streaming window state per stratum. No global sort, no collect —
    * stratum cardinality never matters, only per-stratum row counts,
    * which the window streams through. The emitted `cum_tokens` column
    * is the audit trail (how full each stratum's budget ran).
    */
  def budgetCappedSelect(
      df: DataFrame,
      stratumCol: String,
      tokensCol: String,
      budget: Long,
      rankBy: Seq[Column]
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol)).orderBy(rankBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Stratified deterministic sample: each stratum keeps its own rate
    * (`rates`), everything else keeps `defaultRate`. This is the mix
    * knob — "keep 100% of books, 30% of web" — as one broadcast join +
    * one string compare, no shuffle of the fact side. */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String = ""
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val thresholds = rates.toSeq
      .map { case (s, r) => (s, thresholdHex(r)) }
      .toDF(stratumCol, "__thr")
    df.join(broadcast(thresholds), Seq(stratumCol), "left")
      .withColumn("__thr", coalesce(col("__thr"), lit(thresholdHex(defaultRate))))
      .filter(substring(drawHex(col(keyCol), salt), 1, 3) < col("__thr"))
      .drop("__thr")
  }

  /** Per-stratum percentile quality gate: keep a document iff its score
    * ranks at or above the `minPct` percentile WITHIN its stratum
    * (language, source…). This is the CCNet/FineWeb filter shape —
    * absolute score thresholds misfire across languages because score
    * distributions differ per language, so the cut must be relative to
    * each stratum's own distribution.
    *
    * Determinism: `percent_rank` = (rank − 1)/(n − 1) — exact integer
    * arithmetic divided once, identical in any engine — and the ordering
    * includes the id tiebreak, so ranks are total. Single-row strata get
    * rank 0.0 (both engines' convention) and pass any gate ≤ 0.
    *
    * Scale shape: one shuffle partitioned by stratum, then a streaming
    * rank window (no buffering beyond the sort). A single dominant
    * stratum (web text is 90% of a crawl) makes that window partition
    * huge — Spark's window sort spills and survives, but the better plan
    * at that skew is the two-pass form: aggregate per-stratum exact
    * rank thresholds (count + ordered rank select, tiny result),
    * broadcast them back, and filter map-side — same answer, no giant
    * partition. This one-pass form is right up to ~10⁸ rows per
    * stratum; the scaladoc contract is the switch point, and q74 gates
    * the one-pass form.
    */
  def percentileGate(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      scoreCol: String,
      minPct: Double
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    df.withColumn("pct_rank", percent_rank().over(w))
      .withColumn("keep", col("pct_rank") >= lit(minPct))
  }

  /** Leakage-proof train/val/test assignment: the split label is a pure
    * function of the GROUP key's hash draw (same [[keeps]] md5-prefix
    * machinery, cumulative thresholds), so every row of a group — every
    * event of a user, every chunk of a document — lands in the same
    * split by construction. Splitting on row hashes instead is the
    * classic evaluation-leakage bug (a user's history straddles train
    * and test and the model grades itself on memorized users); this
    * operator makes that state unrepresentable, and [[splitLeakage]]
    * audits feeds whose split column came from somewhere less careful.
    * Zero shuffle: the label is an expression over the group column. */
  def groupSplit(
      df: DataFrame,
      groupCol: String,
      trainRate: Double,
      valRate: Double,
      salt: String = ""
  ): DataFrame = {
    require(trainRate > 0 && valRate >= 0 && trainRate + valRate < 1.0,
      s"rates must leave room for test: train=$trainRate val=$valRate")
    val draw = substring(drawHex(col(groupCol), salt), 1, 3)
    df.withColumn("split",
      when(draw < lit(thresholdHex(trainRate)), "train")
        .when(draw < lit(thresholdHex(trainRate + valRate)), "val")
        .otherwise("test"))
  }

  /** Count groups whose rows straddle more than one split — the audit
    * for an EXTERNAL split column (for [[groupSplit]] output it is 0 by
    * construction, which the q145 gate pins). One shuffle on the group
    * key, group-cardinality-sized. */
  def splitLeakage(df: DataFrame, groupCol: String, splitCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count_distinct(col(splitCol)).as("__n_splits"))
      .agg(count(when(col("__n_splits") > 1, lit(1))).as("n_leaky_groups"))

  /** Deterministic uniform negative sampling — the contrastive-training
    * companion to [[graft.ops.Similarity.hardNegatives]]: for every
    * anchor, k ids drawn uniformly from the DENSE id space [0, n)
    * (the shard-export/packing convention — ids are contiguous after
    * corpus packing; this op's contract, stated rather than checked,
    * because checking costs a full max+count pass the caller usually
    * already did). Draw j of anchor a is `md5(a ‖ '#' ‖ j ‖ salt)`'s
    * 32-bit prefix mod n — the [[keeps]] md5-prefix discipline, so
    * the sample is engine-reproducible (the q160 oracle restates it
    * nibble-by-nibble) and re-runnable: same corpus, same salt → same
    * negatives, across engines and runs. Self-draws (neg == anchor)
    * are dropped, the standard word2vec treatment — callers needing
    * exactly-k resample with a bumped salt.
    *
    * Shapes: `n` rides a broadcast 1-row count frame (the q60 totals
    * pattern — no driver action); the k-way explode is map-side; the
    * output is the (anchor, j, neg_id) edge list, zero shuffles.
    * MEASURED (GovernanceScaleProbe, sf0.1 documents ×10):
    * 0.13 → 0.37 s = 2.9×. */
  def negativeSamples(
      df: DataFrame,
      idCol: String,
      k: Int,
      salt: String = ""
  ): DataFrame = {
    require(k >= 1 && k <= 1000, s"bad negative count: $k")
    val n1 = df.agg(count(lit(1)).as("__neg_n"))
    df.select(col(idCol))
      .crossJoin(broadcast(n1))
      .select(col(idCol), col("__neg_n"),
        explode(sequence(lit(0), lit(k - 1))).as("draw"))
      .withColumn("neg_id",
        pmod(
          conv(substring(
            md5(concat(col(idCol).cast("string"), lit("#"),
              col("draw").cast("string"), lit(salt))), 1, 8), 16, 10)
            .cast("long"),
          col("__neg_n")))
      .filter(col("neg_id") =!= col(idCol))
      .select(col(idCol), col("draw").cast("long").as("draw"), col("neg_id"))
  }
}
