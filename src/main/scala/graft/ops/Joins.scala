package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers (SURVEY.md §2.3).
  *
  * Every join in the reference is an equi `pd.merge` with suffix-based
  * collision handling (reference parquet/Common/pandasWrapper.py:20-28).
  * Spark resolves ambiguity by *name*, so [[merge]] reproduces pandas'
  * suffix semantics deterministically: only columns colliding on BOTH sides
  * (and not join keys) get suffixed (SURVEY.md §7.4.5 J7).
  *
  * Scale notes: join strategy is left to Catalyst/AQE (broadcast under
  * threshold, sort-merge otherwise, skew split at runtime). Call sites that
  * KNOW the right side is tiny (descriptor tables, literal lookups) pass it
  * through [[lookup]] which forces a broadcast — at 100 TB a missed broadcast
  * on a 46-row table is a full shuffle of the fact side.
  */
object Joins {

  /** The SUFFIX half of pandas `pd.merge`: renames colliding non-key
    * columns on both sides (no join — [[mergeJoin]] adds that). */
  def merge(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      suffixLeft: String = "_x",
      suffixRight: String = "_y"
  ): (DataFrame, DataFrame) = {
    val collisions = (left.columns.toSet intersect right.columns.toSet) -- on.toSet
    val l = collisions.foldLeft(left)((d, c) => d.withColumnRenamed(c, c + suffixLeft))
    val r = collisions.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + suffixRight))
    (l, r)
  }

  /** pandas `pd.merge(left, right, on=keys, how=..., suffixes=(l, r))`. */
  def mergeJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      how: String = "inner",
      suffixLeft: String = "_x",
      suffixRight: String = "_y"
  ): DataFrame = {
    val (l, r) = merge(left, right, on, suffixLeft, suffixRight)
    l.join(r, on, how)
  }

  /** Small-side translation join (J8): broadcast + left join + coalesce.
    * e.g. letter grade → numeric (reference
    * ews/student_section_grade_fact/main.py:49-57,142-152). */
  def lookup(
      data: DataFrame,
      lookupTable: DataFrame,
      on: Seq[String],
      how: String = "left"
  ): DataFrame =
    data.join(broadcast(lookupTable), on, how)

  /** Cross join via constant key (J4) — the reference fakes it with
    * `fakeKey=-1` + outer merge (reference base/demographics_dim/main.py:
    * 68-106); Spark has the real operator. */
  def cross(left: DataFrame, right: DataFrame): DataFrame =
    left.crossJoin(broadcast(right))

  /** AS-OF join: every left row picks up the LATEST right row with
    * `right.ts <= left.ts` for the same key (temporal dimension lookup —
    * "what was this user's tier when the event happened"). Left rows
    * before a key's first right row get nulls (left-join semantics).
    *
    * Implementation is union-and-scan, NOT a join: both sides union into
    * one (key, ts)-ordered stream (right rows sorting before left rows
    * at equal ts, so a same-instant change is visible to the event) and
    * a running `last(ignoreNulls)` window forwards each right value to
    * the left rows after it. Cost: ONE shuffle on the key and an O(1)
    * running state per partition — where the naive formulation
    * (`left.join(right, key && r.ts <= l.ts)` + max-per-left-row)
    * explodes into |left|×|right-per-key| intermediate rows and a
    * second aggregation shuffle. This is the standard big-data as-of
    * shape; DuckDB's native `ASOF JOIN` states the same semantics and
    * serves as the q63 oracle.
    *
    * If several right rows share an exact (key, ts), which of them wins
    * is unspecified — pre-aggregate the right side to unique (key, ts)
    * first (a real change stream is unique there anyway).
    *
    * @param valueCols right-side columns to attach; emitted under their
    *                  own names, plus `__matched_ts` (the right ts that
    *                  matched, null when none)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCols: Seq[String]
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.StructType
    val leftStruct = StructType(left.schema.fields)
    val lu = left.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(1).as("__side"),
        struct(left.columns.map(col): _*).as("__lrow"),
        // typed from the right side like the __v_ columns below — a
        // hardcoded timestamp cast would break the union for epoch-long
        // (or date) ts columns, a common event-table shape
        lit(null).cast(right.schema(tsCol).dataType).as("__rts")) ++
        valueCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__v_$c")): _*)
    val ru = right.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(0).as("__side"),
        lit(null).cast(leftStruct).as("__lrow"),
        col(tsCol).as("__rts")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lu.unionByName(ru)
      .select(
        col("__side") +: col("__lrow") +:
          last(col("__rts"), ignoreNulls = true).over(w).as("__matched_ts") +:
          valueCols.map(c =>
            last(col(s"__v_$c"), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .select(col("__lrow.*") +: col("__matched_ts") +: valueCols.map(col): _*)
  }

  /** FORWARD as-of join — [[asofJoin]]'s lookahead twin: every left row
    * picks up the EARLIEST right row with `right.ts >= left.ts` for the
    * same key. This is the label-generation join of ML pipelines ("the
    * next price after the order", "the first status change following the
    * incident") — a backward as-of answers "what was true", this answers
    * "what happened next". Same union-and-scan plan, mirrored: left rows
    * sort BEFORE right rows at equal ts (a same-instant right row
    * matches, mirroring the backward side's inclusive bound), and a
    * `first(ignoreNulls)` over the current-row→following frame pulls the
    * next right value back. ONE shuffle on the key, O(1) running state —
    * Spark evaluates the unbounded-following frame in reverse partition
    * order, so it is the same running-state cost as the backward join,
    * not a per-row scan-ahead. Left rows after a key's last right row
    * get nulls. DuckDB's `ASOF ... ON l.ts <= r.ts` states the identical
    * semantics (the q259 oracle). */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCols: Seq[String]
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.StructType
    val leftStruct = StructType(left.schema.fields)
    val lu = left.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(0).as("__side"),
        struct(left.columns.map(col): _*).as("__lrow"),
        lit(null).cast(right.schema(tsCol).dataType).as("__rts")) ++
        valueCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__v_$c")): _*)
    val ru = right.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(1).as("__side"),
        lit(null).cast(leftStruct).as("__lrow"),
        col(tsCol).as("__rts")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lu.unionByName(ru)
      .select(
        col("__side") +: col("__lrow") +:
          first(col("__rts"), ignoreNulls = true).over(w).as("__matched_ts") +:
          valueCols.map(c =>
            first(col(s"__v_$c"), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 0)
      .select(col("__lrow.*") +: col("__matched_ts") +: valueCols.map(col): _*)
  }

  /** RANGE (interval) join: fact rows matched to every interval
    * containing their timestamp (`start <= ts < end`). The naive plan is
    * a BroadcastNestedLoopJoin — fine when the interval side broadcasts,
    * quadratic disaster when it doesn't. This implementation bin-buckets
    * instead: timestamps hash to a `binSeconds` bucket, intervals explode
    * to every bucket they overlap, and the join becomes an EQUI-join on
    * the bucket followed by the exact range predicate. One data-sized
    * shuffle on the bin key; interval-side blowup is
    * duration/binSeconds rows per interval — set `binSeconds` near the
    * typical interval length so that factor stays small. Each
    * (fact, interval) pair meets in exactly one bucket (the fact's), so
    * no dedup pass is needed. */
  def rangeJoin(
      facts: DataFrame,
      tsCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binSeconds: Long
  ): DataFrame = {
    val binUs = binSeconds * 1000000L
    val f = facts.withColumn("__bin", floor(unix_micros(col(tsCol)) / binUs))
    val i = intervals.withColumn("__bin",
      explode(sequence(
        floor(unix_micros(col(startCol)) / binUs),
        floor(unix_micros(col(endCol)) / binUs))))
    f.join(i, Seq("__bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval×interval OVERLAP join — the temporal-join shape [[rangeJoin]]
    * (point-in-interval) can't express: pairs of intervals that overlap,
    * with the overlap length. Same bin-bucketing scale discipline — both
    * sides explode to the day-grid bins they span, the join key is the
    * bin (never a nested-loop inequality join) — plus the canonical-bin
    * dedup trick: a pair overlapping several bins is emitted ONLY from
    * the bin containing the overlap's start (`greatest(lStart, rStart)`),
    * so no post-join distinct is ever paid. Overlap is half-open
    * ([start, end)): a zero-length interval is empty and matches
    * nothing, the consistent reading both engines state identically.
    * Column names must not collide across sides (rename upstream).
    * Gated by q198 against the direct inequality-join oracle. */
  def intervalOverlapJoin(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      binSeconds: Long
  ): DataFrame = {
    val binUs = binSeconds * 1000000L
    // inverted rows (end < start) are malformed input: without the guard
    // they would explode a DESCENDING bin sequence and could emit
    // negative overlaps; dropping them is the only reading consistent
    // with "empty intervals match nothing"
    def binned(df: DataFrame, s: String, e: String) =
      df.filter(col(s) <= col(e))
        .withColumn("__bin",
          explode(sequence(
            floor(unix_micros(col(s)) / binUs),
            floor(unix_micros(col(e)) / binUs))))
    val l = binned(left, lStart, lEnd)
    val r = binned(right, rStart, rEnd)
    l.join(r, Seq("__bin"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__bin") ===
        floor(unix_micros(greatest(col(lStart), col(rStart))) / binUs))
      .withColumn("overlap_us",
        unix_micros(least(col(lEnd), col(rEnd))) -
          unix_micros(greatest(col(lStart), col(rStart))))
      .drop("__bin")
  }

  /** Skew-proof equi-join by key salting — the manual fallback when AQE's
    * runtime skew split can't apply (e.g. the skewed side feeds an
    * aggregation in the same stage, or the join is inside a cached plan).
    *
    * The skewed side gets a per-row salt in [0, saltFactor); the other
    * side is replicated across ALL salt values (explode of a literal
    * range — saltFactor× its size, so keep that side the smaller one).
    * A hot key's rows now spread over `saltFactor` shuffle partitions
    * instead of one. Semantics are exactly `skewed.join(other, keys,
    * joinType)` for inner/left joins; right/full would lose unmatched
    * right rows to the replication and are rejected. */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin replicates the right side; '$joinType' would duplicate unmatched rows")
    val salted = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val expanded = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(expanded, keys :+ "__salt", joinType).drop("__salt")
  }
}
