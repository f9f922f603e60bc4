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

  val all: Seq[Q] = Seq(q221, q222, q223)
}
