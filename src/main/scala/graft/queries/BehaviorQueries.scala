package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Lake
import graft.ops.{Behavior, Snapshot}

/** Behavioral-analytics coverage: funnel conversion, Markov transitions,
  * cohort retention ([[graft.ops.Behavior]]) and the SCD Type-2 history
  * build ([[graft.ops.Snapshot.scd2]]) over the synthetic `events` log.
  * Every query keeps the one-shuffle-on-user discipline the ops document;
  * the oracles state the identical window algebra in DuckDB SQL, so the
  * hash gate proves the chained-window formulations ARE the textbook
  * definitions.
  */
object BehaviorQueries {

  // ---------------------------------------------------------------- q99
  /** Ordered funnel view → click → purchase with a 7-day conversion
    * window: step k counts only after step k-1, and the whole funnel
    * must complete within 7 days of the user's first `view`
    * ([[graft.ops.Behavior.funnel]] — k chained conditional window-mins
    * on ONE hash(user) exchange). The oracle chains the same mins as
    * window CTEs. */
  private val sevenDaysUs = 7L * 24 * 3600 * 1000000
  private val q99 = Q(
    "q99_funnel",
    (s, dir) =>
      Behavior.funnel(
        Lake(s, dir).events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), Some(sevenDaysUs))
        .orderBy("step"),
    Some(s"""
      WITH s0 AS (SELECT user_id, ts, event_type,
          MIN(CASE WHEN event_type = 'view' THEN ts END)
            OVER (PARTITION BY user_id) AS t0
        FROM events),
      s1 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t0
            AND epoch_us(ts) <= epoch_us(t0) + $sevenDaysUs THEN ts END)
          OVER (PARTITION BY user_id) AS t1 FROM s0),
      s2 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t1
            AND epoch_us(ts) <= epoch_us(t0) + $sevenDaysUs THEN ts END)
          OVER (PARTITION BY user_id) AS t2 FROM s1),
      u AS (SELECT user_id, MAX(t0) AS t0, MAX(t1) AS t1, MAX(t2) AS t2
            FROM s2 GROUP BY user_id),
      steps(step, step_name) AS (VALUES (0, 'view'), (1, 'click'),
                                        (2, 'purchase'))
      SELECT CAST(step AS BIGINT) AS step, step_name,
        CAST(SUM(CASE step
          WHEN 0 THEN CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END
          WHEN 1 THEN CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
          ELSE CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END END) AS BIGINT)
          AS n_users
      FROM u CROSS JOIN steps
      GROUP BY step, step_name ORDER BY step""")
  )

  // --------------------------------------------------------------- q100
  /** First-order Markov transition matrix of user journeys
    * ([[graft.ops.Behavior.transitions]]): lag over the per-user
    * timeline, `(start)` for each user's first event, counts per
    * (from, to) cell. */
  private val q100 = Q(
    "q100_event_transitions",
    (s, dir) =>
      Behavior.transitions(
        Lake(s, dir).events, "user_id", "ts", "event_id", "event_type")
        .orderBy("from_state", "to_state"),
    Some("""
      SELECT COALESCE(prev, '(start)') AS from_state,
             event_type AS to_state, COUNT(*) AS n
      FROM (SELECT event_type,
              lag(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev
            FROM events)
      GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  // --------------------------------------------------------------- q101
  /** Weekly cohort retention ([[graft.ops.Behavior.retention]]): users
    * bucketed by the epoch-week of their first event, counted distinct
    * per week offset. Epoch-week = days-since-1970 ÷ 7 — an
    * engine-neutral week index with no week-start convention to
    * disagree on. */
  private val q101 = Q(
    "q101_retention_cohorts",
    (s, dir) =>
      Behavior.retention(Lake(s, dir).events, "user_id", "ts")
        .orderBy("cohort_week", "week_offset"),
    Some("""
      WITH f AS (SELECT user_id, CAST(ts AS DATE) AS d,
          MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS first_d
        FROM events)
      SELECT CAST(date_diff('day', DATE '1970-01-01', first_d) // 7
               AS BIGINT) AS cohort_week,
             CAST(date_diff('day', first_d, d) // 7 AS BIGINT)
               AS week_offset,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM f GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  // --------------------------------------------------------------- q102
  /** SCD Type-2 history build ([[graft.ops.Snapshot.scd2]]): the
    * per-user event-type observation log collapsed into validity
    * ranges with `valid_to` = next range's start (null = current) —
    * gaps-and-islands on one hash(user) exchange. The oracle states
    * the same lag → running-sum → group → lead algebra. */
  private val q102 = Q(
    "q102_scd2_history",
    (s, dir) =>
      Snapshot.scd2(Lake(s, dir).events,
          "user_id", "ts", "event_id", "event_type")
        .select(col("user_id"), col("state"),
          unix_micros(col("valid_from")).as("valid_from_us"),
          unix_micros(col("valid_to")).as("valid_to_us"),
          col("n_obs"), col("version"))
        .orderBy("user_id", "version"),
    Some("""
      WITH m AS (SELECT user_id, ts, event_id, event_type,
          row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS rn,
          lag(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev
        FROM events),
      c AS (SELECT *, CASE WHEN rn = 1
                             OR prev IS DISTINCT FROM event_type
                           THEN 1 ELSE 0 END AS chg FROM m),
      i AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id
              ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
            FROM c),
      r AS (SELECT user_id, version, MIN(event_type) AS state,
              MIN(ts) AS valid_from, COUNT(*) AS n_obs
            FROM i GROUP BY user_id, version),
      f AS (SELECT *, lead(valid_from) OVER (PARTITION BY user_id
              ORDER BY version) AS valid_to FROM r)
      SELECT user_id, state, epoch_us(valid_from) AS valid_from_us,
             epoch_us(valid_to) AS valid_to_us,
             CAST(n_obs AS BIGINT) AS n_obs,
             CAST(version AS BIGINT) AS version
      FROM f ORDER BY user_id, version""")
  )

  // --------------------------------------------------------------- q107
  /** Top 3-step user journeys ([[graft.ops.Behavior.paths]]): sliding
    * length-3 event-type windows per user, counted and ranked — the
    * sequence-mining generalization of the q100 transition matrix. The
    * deterministic (n DESC, path ASC) order makes the LIMIT
    * hash-gateable. */
  private val q107 = Q(
    "q107_event_paths",
    (s, dir) =>
      Behavior.paths(Lake(s, dir).events,
          "user_id", "ts", "event_id", "event_type", len = 3)
        .orderBy(col("n").desc, col("path"))
        .limit(25),
    Some("""
      SELECT path, COUNT(*) AS n
      FROM (SELECT event_type || '>' ||
              lead(event_type, 1) OVER w || '>' ||
              lead(event_type, 2) OVER w AS path
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      WHERE path IS NOT NULL
      GROUP BY path ORDER BY n DESC, path LIMIT 25""")
  )

  // --------------------------------------------------------------- q137
  /** Trailing 7-day rolling features per user
    * ([[graft.ops.Behavior.rollingFeatures]]): day sum, trailing
    * sum/events/active-days/average, day-over-day delta — all computed
    * in ONE hash(user) window pass over the per-day aggregate, with a
    * RANGE frame on the integer epoch-day so calendar gaps genuinely
    * shrink the window (the sparse-key case `ROWS BETWEEN` gets
    * wrong). Decimal sums keep the hash exact; the average is one
    * double division. */
  private val q137 = Q(
    "q137_rolling_features",
    (s, dir) =>
      Behavior.rollingFeatures(
        Lake(s, dir).events.filter(col("user_id") < 60),
        Seq("user_id"), "ts", "value", windowDays = 7)
        .orderBy("user_id", "day_key"),
    Some("""
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
          SUM(CAST(value AS DECIMAL(38,6))) AS ds,
          COUNT(*) AS dn,
          date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS serial
        FROM events WHERE user_id < 60 GROUP BY 1, 2),
      w AS (
        SELECT user_id, day, ds, dn,
          SUM(ds) OVER tw AS tsum,
          SUM(dn) OVER tw AS tn,
          COUNT(*) OVER tw AS tdays,
          LAG(ds) OVER (PARTITION BY user_id ORDER BY serial) AS prev
        FROM daily
        WINDOW tw AS (PARTITION BY user_id ORDER BY serial
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT user_id,
        strftime(day, '%Y%m%d') AS day_key,
        CAST(ds AS DOUBLE) AS day_sum,
        CAST(tsum AS DOUBLE) AS trail_sum,
        CAST(tn AS BIGINT) AS trail_events,
        CAST(tdays AS BIGINT) AS trail_days,
        CAST(tsum AS DOUBLE) / tn AS trail_avg,
        CAST(ds - prev AS DOUBLE) AS day_delta
      FROM w ORDER BY user_id, day_key""")
  )

  // --------------------------------------------------------------- q140
  /** First/last-touch attribution of `purchase` conversions over a 7-day
    * lookback ([[graft.ops.Behavior.attribution]]): one RANGE-framed
    * conditional min/max per conversion on a single hash(user) window
    * pass — never the conversions×touches self-join — with chronology
    * encoded in a zero-padded (micros, id, type) string key both engines
    * compare identically. */
  private val q140 = Q(
    "q140_attribution",
    (s, dir) =>
      Behavior.attribution(
        Lake(s, dir).events, "user_id", "ts", "event_type", "event_id",
        convType = "purchase", lookbackDays = 7)
        .orderBy("model", "touch_type"),
    Some("""
      WITH keyed AS (
        SELECT user_id, event_type, epoch_us(ts) AS us,
          CASE WHEN event_type <> 'purchase' THEN
            lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
            || lpad(CAST(event_id AS VARCHAR), 12, '0')
            || event_type END AS tk
        FROM events),
      conv AS (
        SELECT
          MIN(tk) OVER w AS firstk,
          MAX(tk) OVER w AS lastk,
          event_type
        FROM keyed
        WINDOW w AS (PARTITION BY user_id ORDER BY us
          RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)),
      models AS (
        SELECT 'first_touch' AS model,
          COALESCE(substr(firstk, 33), '(none)') AS touch_type
        FROM conv WHERE event_type = 'purchase'
        UNION ALL
        SELECT 'last_touch',
          COALESCE(substr(lastk, 33), '(none)')
        FROM conv WHERE event_type = 'purchase')
      SELECT model, touch_type, COUNT(*) AS n_conversions
      FROM models GROUP BY model, touch_type
      ORDER BY model, touch_type""")
  )

  val all: Seq[Q] = Seq(q99, q100, q101, q102, q107, q137, q140)
}
