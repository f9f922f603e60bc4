package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Lake
import graft.ops.Series

/** Per-key time-series monitoring over the events log
  * ([[graft.ops.Series]]): q221 EWMA level (α = 1/2, exact power-of-two
  * weights), q222 CUSUM changepoint (n·P_k − k·S integer statistic), q223
  * weekday seasonality indices. Oracles replay the identical lag/prefix
  * window algebra; every aggregate is integer, doubles only as final
  * divisions of exact longs (Q.scala discipline). */
object SeriesQueries {

  private val EwmaWindow = 10

  private val CentsCte = """
    e AS (SELECT user_id, ts, event_id,
            CAST(ROUND(value * 100.0) AS BIGINT) AS cents
          FROM events)"""

  // --------------------------------------------------------------- q221
  private val q221 = {
    val numTerms = (0 until EwmaWindow).map { j =>
      val wgt = 1L << (EwmaWindow - 1 - j)
      if (j == 0) s"cents * $wgt"
      else s"COALESCE(lag(cents, $j) OVER w, 0) * $wgt"
    }.mkString(" +\n               ")
    val denTerms = (0 until EwmaWindow).map { j =>
      val wgt = 1L << (EwmaWindow - 1 - j)
      val probe = if (j == 0) "cents" else s"lag(cents, $j) OVER w"
      s"(CASE WHEN $probe IS NOT NULL THEN $wgt ELSE 0 END)"
    }.mkString(" +\n               ")
    Q(
      "q221_ewma_value",
      (s, dir) =>
        Series.ewmaLast(Lake(s, dir).events,
            "user_id", "ts", "event_id", "value", EwmaWindow)
          .orderBy("user_id"),
      Some(s"""
      WITH $CentsCte,
      sm AS (SELECT user_id,
               $numTerms AS num,
               $denTerms AS den,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id, CAST(n AS BIGINT) AS n_events,
             CAST(num AS BIGINT) AS ewma_num, CAST(den AS BIGINT) AS ewma_den,
             CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 100.0 AS ewma
      FROM sm WHERE rn = 1 ORDER BY user_id""")
    )
  }

  // --------------------------------------------------------------- q222
  private val q222 = Q(
    "q222_cusum_changepoint",
    (s, dir) =>
      Series.cusumChangepoint(Lake(s, dir).events,
          "user_id", "ts", "event_id", "value")
        .orderBy("user_id"),
    Some(s"""
      WITH $CentsCte,
      c AS (SELECT user_id,
              CAST(row_number() OVER w AS BIGINT) AS k,
              SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS p,
              count(*) OVER (PARTITION BY user_id) AS n,
              SUM(cents) OVER (PARTITION BY user_id) AS s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      t AS (SELECT user_id, n, k, n * p - k * s AS tval FROM c),
      r AS (SELECT user_id, CAST(n AS BIGINT) AS n_events, k AS cp_index,
              CAST(abs(tval) AS BIGINT) AS cusum_num,
              CAST(abs(tval) AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS cusum,
              row_number() OVER (PARTITION BY user_id
                ORDER BY abs(tval) DESC, k) AS rn
            FROM t)
      SELECT user_id, n_events, cp_index, cusum_num, cusum
      FROM r WHERE rn = 1 ORDER BY user_id""")
  )

  // --------------------------------------------------------------- q223
  /** Day-of-week uplift per event type: mean cents on that weekday over
    * the type's overall mean — the ratio of two exact-long divisions, the
    * feature a volume-anomaly monitor deseasonalizes with before CUSUM.
    * dow 0 = Sunday in both engines (Spark dayofweek − 1 ≡ DuckDB dow). */
  private val q223 = Q(
    "q223_weekday_seasonality",
    (s, dir) => {
      val e = Lake(s, dir).events
        .withColumn("__cents", round(col("value") * 100.0d, 0).cast("long"))
        .withColumn("dow", (dayofweek(col("ts")) - 1).cast("int"))
      val byType = e.groupBy("event_type")
        .agg(sum("__cents").as("s_all"), count(lit(1)).as("n_all"))
      val byDow = e.groupBy("event_type", "dow")
        .agg(sum("__cents").as("s_dow"), count(lit(1)).as("n_dow"))
      byDow.join(byType, "event_type")
        .select(col("event_type"), col("dow"),
          col("n_dow"), col("s_dow"),
          ((col("s_dow").cast("double") / col("n_dow").cast("double")) /
            (col("s_all").cast("double") / col("n_all").cast("double")))
            .as("seasonal_index"))
        .orderBy("event_type", "dow")
    },
    Some("""
      WITH e AS (SELECT event_type,
                   CAST(extract(dow FROM ts) AS INTEGER) AS dow,
                   CAST(ROUND(value * 100.0) AS BIGINT) AS cents
                 FROM events),
      byType AS (SELECT event_type, CAST(SUM(cents) AS BIGINT) AS s_all,
                   count(*) AS n_all
                 FROM e GROUP BY event_type),
      byDow AS (SELECT event_type, dow, CAST(SUM(cents) AS BIGINT) AS s_dow,
                  count(*) AS n_dow
                FROM e GROUP BY event_type, dow)
      SELECT d.event_type, d.dow, d.n_dow, d.s_dow,
             (CAST(d.s_dow AS DOUBLE) / CAST(d.n_dow AS DOUBLE)) /
               (CAST(t.s_all AS DOUBLE) / CAST(t.n_all AS DOUBLE))
               AS seasonal_index
      FROM byDow d JOIN byType t ON d.event_type = t.event_type
      ORDER BY d.event_type, d.dow""")
  )

  // --------------------------------------------------------------- q248
  /** Autocorrelation of the daily value series at lags 1..3 — the
    * seasonality/memory diagnostic that decides whether q221's EWMA or
    * q223's weekday indices is the right model. Mean-centering is cleared
    * of its division: with n days, total S and daily cents x_t, the
    * centered term is a_t = n·x_t − S (exact long), and
    * acf(k) = Σ a_t·a_{t+k} / Σ a_t² — both sums exact DECIMAL(38,0)
    * (HUGEINT in the oracle), one double division at the end. Days are
    * the observed grid (every day of the 30-day window has events at
    * every sf; a gap would simply shorten the series — q129 is the
    * gap-fill gate). One groupBy(day) shuffle; the lag terms ride a
    * single ordered window over the tiny daily frame. */
  private val q248 = Q(
    "q248_acf_daily",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Lake(s, dir).events
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val tot = daily.agg(
        count(lit(1)).as("n"), sum(col("cents")).as("s"))
      val w = Window.orderBy("day")
      val a = daily.crossJoin(broadcast(tot))
        .withColumn("a", (col("n") * col("cents") - col("s")).cast("decimal(19,0)"))
        .withColumn("a1", lead(col("a"), 1).over(w))
        .withColumn("a2", lead(col("a"), 2).over(w))
        .withColumn("a3", lead(col("a"), 3).over(w))
      a.select(col("a"),
          expr("stack(3, 1, a * a1, 2, a * a2, 3, a * a3) AS (lag, prod)"))
        .groupBy("lag")
        .agg(
          sum(col("prod")).cast("decimal(38,0)").as("num"),
          sum(col("a") * col("a")).cast("decimal(38,0)").as("den"))
        .select(col("lag").cast("int").as("lag"),
          (col("num").cast("double") / col("den").cast("double")).as("acf"))
        .orderBy("lag")
    },
    Some("""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1),
      tot AS (SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS s FROM daily),
      a AS (SELECT CAST(n * cents - s AS HUGEINT) AS a,
                   lead(CAST(n * cents - s AS HUGEINT), 1) OVER w AS a1,
                   lead(CAST(n * cents - s AS HUGEINT), 2) OVER w AS a2,
                   lead(CAST(n * cents - s AS HUGEINT), 3) OVER w AS a3
            FROM daily CROSS JOIN tot
            WINDOW w AS (ORDER BY day)),
      st AS (SELECT lag, SUM(prod) AS num, SUM(a * a) AS den FROM (
               SELECT a, 1 AS lag, a * a1 AS prod FROM a
               UNION ALL SELECT a, 2, a * a2 FROM a
               UNION ALL SELECT a, 3, a * a3 FROM a)
             GROUP BY lag)
      SELECT CAST(lag AS INT) AS lag,
             CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS acf
      FROM st ORDER BY lag""")
  )

  // --------------------------------------------------------------- q249
  /** 7-day rolling median of daily order revenue — the robust twin of a
    * rolling mean: one outlier day moves the mean, never the median. The
    * window is a ROWS frame over the day-ordered series; the median of
    * seven exact cent values is element 4 of the sorted window — computed
    * via a collected-and-sorted array on both engines, no interpolation,
    * no float. Emitted only for full windows (the first six days have no
    * 7-day history). The daily frame is tiny after its one groupBy
    * shuffle; at 100 TB the day cardinality is bounded by the calendar,
    * not the data. */
  private val q249 = Q(
    "q249_rolling_median",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Lake(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val w = Window.orderBy("day").rowsBetween(-6, 0)
      daily
        .withColumn("win", collect_list(col("cents")).over(w))
        .filter(size(col("win")) === 7)
        .select(date_format(col("day"), "yyyyMMdd").as("day"),
          col("cents"),
          element_at(array_sort(col("win")), 4).as("med7_cents"))
        .orderBy("day")
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT))
                 AS BIGINT) AS cents
        FROM orders GROUP BY 1)
      SELECT strftime(day, '%Y%m%d') AS day, cents,
             list_sort(win)[4] AS med7_cents
      FROM (
        SELECT day, cents,
               list(cents) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS win
        FROM daily)
      WHERE len(win) = 7
      ORDER BY day""")
  )

  // --------------------------------------------------------------- q250
  /** Month-over-month revenue growth: monthly order revenue in exact
    * cents, the previous month via one lag over the month-ordered frame,
    * growth as a single double division of exact longs. The first month
    * (no predecessor) is dropped rather than null-filled — a growth rate
    * against nothing is not 0%. Calendar-bounded frame, same scale story
    * as q249. */
  private val q250 = Q(
    "q250_mom_growth",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val monthly = Lake(s, dir).orders
        .groupBy(date_format(col("o_orderdate"), "yyyyMM").as("month"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val w = Window.orderBy("month")
      monthly
        .withColumn("prev_cents", lag(col("cents"), 1).over(w))
        .filter(col("prev_cents").isNotNull)
        .select(col("month"), col("cents"), col("prev_cents"),
          ((col("cents") - col("prev_cents")).cast("double") /
            col("prev_cents").cast("double")).as("growth"))
        .orderBy("month")
    },
    Some("""
      WITH monthly AS (
        SELECT strftime(o_orderdate, '%Y%m') AS month,
               CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT))
                 AS BIGINT) AS cents
        FROM orders GROUP BY 1)
      SELECT month, cents, prev_cents,
             CAST(cents - prev_cents AS DOUBLE) / CAST(prev_cents AS DOUBLE)
               AS growth
      FROM (SELECT month, cents,
              lag(cents, 1) OVER (ORDER BY month) AS prev_cents
            FROM monthly)
      WHERE prev_cents IS NOT NULL
      ORDER BY month""")
  )

  // --------------------------------------------------------------- q260
  /** Theil–Sen trend of daily revenue — the robust slope estimator
    * (median of all pairwise day-to-day slopes): up to ~29% of the days
    * can be corrupted before the estimate moves, where the OLS slope
    * chases a single bad day. Slopes are double divisions of exact
    * longs (cents per day) — each pair's value is bit-identical across
    * engines, so ORDERING them is deterministic and the DISCRETE lower
    * median (element ⌈m/2⌉ of the sorted slopes, no interpolation) hash-
    * matches. The pair frame is O(days²) — bounded by the CALENDAR, not
    * the data volume: at 100 TB the daily rollup in front of it is the
    * data-sized work and this stays a ~10⁶-row tail. The single-
    * partition rank window rides that same bound. */
  private val q260 = Q(
    "q260_theil_sen",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Lake(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .select(
          datediff(col("day"), lit("1995-01-01")).cast("long").as("x"),
          col("cents"))
      val a = daily.toDF("xi", "yi")
      val b = daily.toDF("xj", "yj")
      val pairs = a.join(b, col("xi") < col("xj"))
        .select(((col("yj") - col("yi")).cast("double") /
          (col("xj") - col("xi")).cast("double")).as("slope"))
      val nd = daily.agg(count(lit(1)).as("n_days"))
      val m = pairs.agg(count(lit(1)).as("n_pairs"))
      pairs
        .withColumn("rn", row_number().over(Window.orderBy("slope")))
        .crossJoin(broadcast(m)).crossJoin(broadcast(nd))
        .filter(col("rn") === expr("(n_pairs + 1) div 2"))
        .select(col("n_days"), col("n_pairs"), col("slope").as("median_slope"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT))
                 AS BIGINT) AS cents
        FROM orders GROUP BY 1),
      pts AS (SELECT CAST(datediff('day', DATE '1995-01-01', day) AS BIGINT)
                       AS x, cents
              FROM daily),
      pairs AS (
        SELECT CAST(b.cents - a.cents AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
                 AS slope
        FROM pts a JOIN pts b ON a.x < b.x),
      m AS (SELECT COUNT(*) AS n_pairs FROM pairs),
      nd AS (SELECT COUNT(*) AS n_days FROM pts),
      rk AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn
             FROM pairs)
      SELECT nd.n_days, m.n_pairs, rk.slope AS median_slope
      FROM rk CROSS JOIN m CROSS JOIN nd
      WHERE rn = (n_pairs + 1) // 2""")
  )

  // --------------------------------------------------------------- q270
  /** Hampel filter — q249's rolling median armed as an outlier detector:
    * a day is flagged when its deviation from the trailing 7-day median
    * exceeds 3× the window's median absolute deviation. Everything is
    * exact integers (the MAD of seven cent values is element 4 of the
    * sorted absolute deviations) and the 3σ-equivalent test multiplies
    * through — |x − med| > 3·mad as a long comparison, no float, no
    * interpolation. This is the standard robust time-series cleaner: a
    * sigma rule (q186) moves its own threshold when the outlier lands in
    * the window; the median/MAD pair does not. Calendar-bounded frame,
    * one groupBy(day) shuffle, one ordered window. */
  private val q270 = Q(
    "q270_hampel_filter",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Lake(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val w = Window.orderBy("day").rowsBetween(-6, 0)
      daily
        .withColumn("win", collect_list(col("cents")).over(w))
        .filter(size(col("win")) === 7)
        .withColumn("med7", element_at(array_sort(col("win")), 4))
        .withColumn("mad7", element_at(
          array_sort(transform(col("win"), v => abs(v - col("med7")))), 4))
        .filter(abs(col("cents") - col("med7")) > col("mad7") * 3)
        .select(date_format(col("day"), "yyyyMMdd").as("day"),
          col("cents"), col("med7"), col("mad7"))
        .orderBy("day")
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT))
                 AS BIGINT) AS cents
        FROM orders GROUP BY 1),
      win AS (
        SELECT day, cents,
               list(cents) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS w
        FROM daily),
      med AS (
        SELECT day, cents, list_sort(w)[4] AS med7, w
        FROM win WHERE len(w) = 7),
      mad AS (
        SELECT day, cents, med7,
               list_sort(list_transform(w, v -> abs(v - med7)))[4] AS mad7
        FROM med)
      SELECT strftime(day, '%Y%m%d') AS day, cents, med7, mad7
      FROM mad
      WHERE abs(cents - med7) > mad7 * 3
      ORDER BY day""")
  )

  val all: Seq[Q] = Seq(q221, q222, q223, q248, q249, q250, q260, q270)
}
