package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series smoothing and changepoint detection over an event
  * log — the monitoring layer a training-data pipeline runs on its OWN
  * telemetry (ingest volumes, quality scores, conversion rates): EWMA for
  * "what is the current level", CUSUM for "when did the level shift".
  *
  * Both stay inside the engine's exact-arithmetic oracle discipline
  * (Q.scala): every aggregate is integer (cents, powers of two, exact
  * prefix sums); doubles appear only as a final division of two exact
  * longs — correctly rounded, portable across engines. α is fixed at 1/2
  * so EWMA weights are exact powers of two; a free-form α would make the
  * weights non-representable and the whole window fold-order-dependent.
  *
  * Scale shape: ONE window per operator, partitioned by the key and
  * ordered by (ts, event id) — state per task is `window` rows (EWMA) or
  * running counters (CUSUM). No global windows, no self-joins; a hot key
  * is inherently sequential (its series IS ordered) which is the same
  * non-saltable-by-definition argument as [[WebGraph.fetchSchedule]].
  */
object Series {

  /** Final EWMA level per key over the LAST `window` events, α = 1/2:
    * numerator Σ_j cents_{last−j}·2^(window−1−j), denominator
    * Σ_j 2^(window−1−j) over the rows that exist — both exact longs from
    * ONE window pass of `window` lag columns (weight-by-offset is not
    * expressible as a plain window aggregate; the lag unroll is, and
    * codegens to straight-line arithmetic). Output per key:
    * (key, n_events, ewma_num, ewma_den, ewma) where
    * ewma = num/den/100 in value units. */
  def ewmaLast(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      window: Int = 10
  ): DataFrame = {
    require(window >= 1 && window <= 62, s"window must be in [1,62]: $window")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val cents = round(col(valueCol) * 100.0d, 0).cast("long")
    val base = events.withColumn("__cents", cents)
    // j = 0 is the row itself (not lag(_, 0), whose support varies across
    // engines); lagged terms COALESCE to 0 so short histories just carry
    // fewer weight bits in the denominator
    def at(j: Int) =
      if (j == 0) col("__cents") else lag(col("__cents"), j).over(w)
    val num = (0 until window).map { j =>
      coalesce(at(j), lit(0L)) * lit(1L << (window - 1 - j))
    }.reduce(_ + _)
    val den = (0 until window).map { j =>
      when(at(j).isNotNull, lit(1L << (window - 1 - j))).otherwise(lit(0L))
    }.reduce(_ + _)
    base
      .withColumn("__num", num)
      .withColumn("__den", den)
      .withColumn("__rn",
        row_number().over(
          Window.partitionBy(keyCol).orderBy(col(tsCol).desc, col(idCol).desc)))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keyCol)))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("__n").as("n_events"),
        col("__num").as("ewma_num"), col("__den").as("ewma_den"),
        (col("__num").cast("double") / col("__den").cast("double") /
          lit(100.0d)).as("ewma"))
  }

  /** CUSUM changepoint per key: with P_k the prefix cents sum and S the
    * total over n events, T_k = n·P_k − k·S is n times the cumulative
    * deviation from the key's mean — exact longs, no float mean anywhere.
    * The changepoint is argmax |T_k| (ties → smallest k): the classic
    * max-CUSUM location statistic. Output: (key, n_events, cp_index,
    * cusum_num = max |T_k|, cusum = num/n/100 — the peak cumulative
    * deviation in value units). Magnitude bound: |T_k| ≤ n·|S|, safe in
    * a long for n·Σ|cents| < 2^63 (~9·10^18 cent-events per key). */
  def cusumChangepoint(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String
  ): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val wAll = Window.partitionBy(keyCol)
    val cents = round(col(valueCol) * 100.0d, 0).cast("long")
    val scored = events
      .withColumn("__cents", cents)
      .withColumn("__k", row_number().over(w).cast("long"))
      .withColumn("__p", sum(col("__cents")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__s", sum(col("__cents")).over(wAll))
      .withColumn("__t", col("__n") * col("__p") - col("__k") * col("__s"))
    val pick = Window.partitionBy(keyCol)
      .orderBy(abs(col("__t")).desc, col("__k"))
    scored
      .withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("__n").as("n_events"),
        col("__k").as("cp_index"), abs(col("__t")).as("cusum_num"),
        (abs(col("__t")).cast("double") / col("__n").cast("double") /
          lit(100.0d)).as("cusum"))
  }
}
