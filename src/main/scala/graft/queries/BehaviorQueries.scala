package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Lake
import graft.ops.{Behavior, Joins, Snapshot}

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

  // --------------------------------------------------------------- q278
  /** Per-step-window funnel — q99's sibling with the OTHER windowing
    * semantics product analytics offers: each step must land within one
    * day of the PREVIOUS step (a slow-burn user who clicks on day 6 and
    * buys on day 7 converts here but not under a tight total budget;
    * a user who does everything in the last hour converts under both).
    * Same one-window-per-step min-fold plan as q99 — the only change is
    * which timestamp anchors each step's deadline, which is exactly
    * what the gate pins. */
  private val q278 = Q(
    "q278_funnel_step_windows",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dayUs = 86400000000L
      val w = Window.partitionBy("user_id")
      val s0 = Lake(s, dir).events
        .withColumn("t0",
          min(when(col("event_type") === "view", col("ts"))).over(w))
      val s1 = s0.withColumn("t1",
        min(when(col("event_type") === "click" && col("ts") > col("t0") &&
          unix_micros(col("ts")) <= unix_micros(col("t0")) + dayUs,
          col("ts"))).over(w))
      val s2 = s1.withColumn("t2",
        min(when(col("event_type") === "purchase" && col("ts") > col("t1") &&
          unix_micros(col("ts")) <= unix_micros(col("t1")) + dayUs,
          col("ts"))).over(w))
      val u = s2.groupBy("user_id")
        .agg(max(col("t0")).as("t0"), max(col("t1")).as("t1"),
          max(col("t2")).as("t2"))
      u.select(expr(
          """stack(3,
             0L, 'view', CASE WHEN t0 IS NOT NULL THEN 1L ELSE 0L END,
             1L, 'click', CASE WHEN t1 IS NOT NULL THEN 1L ELSE 0L END,
             2L, 'purchase', CASE WHEN t2 IS NOT NULL THEN 1L ELSE 0L END)
             AS (step, step_name, reached)"""))
        .groupBy("step", "step_name")
        .agg(sum(col("reached")).as("n_users"))
        .orderBy("step")
    },
    Some("""
      WITH s0 AS (SELECT user_id, ts, event_type,
          MIN(CASE WHEN event_type = 'view' THEN ts END)
            OVER (PARTITION BY user_id) AS t0
        FROM events),
      s1 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t0
            AND epoch_us(ts) <= epoch_us(t0) + 86400000000 THEN ts END)
          OVER (PARTITION BY user_id) AS t1 FROM s0),
      s2 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t1
            AND epoch_us(ts) <= epoch_us(t1) + 86400000000 THEN ts END)
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

  // --------------------------------------------------------------- q282
  /** Churn-label generation — the supervised-learning complement of
    * q276's aggregate half-life: every user active in the observation
    * window (Jan 1–15) gets a label, churned = no activity in the
    * outcome window (Jan 16–30). The population restriction is the
    * point — scoring users who were never active leaks trivial
    * negatives into training — and the two windows are disjoint by
    * construction (temporal leakage is the q226 lesson applied to
    * labels). One conditional aggregation per user; counts are exact. */
  private val q282 = Q(
    "q282_churn_labels",
    (s, dir) => {
      val mid = to_timestamp(lit("2024-01-16"))
      val hi = to_timestamp(lit("2024-01-31"))
      // the outcome window is BOUNDED (Jan 16–30): without the upper
      // bound, a fixture that grows past Jan 30 would silently leak
      // post-window activity into the labels
      Lake(s, dir).events
        .groupBy("user_id")
        .agg(
          sum(when(col("ts") < mid, 1L).otherwise(0L)).as("n_obs"),
          sum(when(col("ts") >= mid && col("ts") < hi, 1L).otherwise(0L))
            .as("n_out"))
        .filter(col("n_obs") > 0)
        .withColumn("churned", col("n_out") === 0)
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id,
        CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_obs,
        CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                       AND ts < TIMESTAMP '2024-01-31' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_out,
        SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  AND ts < TIMESTAMP '2024-01-31' THEN 1 ELSE 0 END) = 0
          AS churned
      FROM events
      GROUP BY user_id
      HAVING SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) > 0
      ORDER BY user_id""")
  )

  // --------------------------------------------------------------- q290
  /** Hour-of-day conversion profile — the circadian axis q223's weekday
    * indices don't cover: per UTC hour, views, purchases, and the
    * purchase-per-view rate as one division of exact counts. The
    * shape every notification scheduler and bid curve starts from;
    * hours with views but no purchases emit rate 0 (not null — a
    * measured zero), pinned by COALESCE on both sides. One groupBy
    * over a 24-row output. */
  private val q290 = Q(
    "q290_hourly_conversion",
    (s, dir) =>
      Lake(s, dir).events
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy(hour(col("ts")).cast("long").as("hour_utc"))
        .agg(
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("views"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("purchases"))
        .withColumn("rate",
          coalesce(col("purchases").cast("double") /
            nullif(col("views").cast("double"), lit(0.0)), lit(0.0)))
        .orderBy("hour_utc"),
    Some("""
      SELECT CAST(hour(ts) AS BIGINT) AS hour_utc,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
          AS BIGINT) AS views,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) AS purchases,
        COALESCE(
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS DOUBLE) /
          NULLIF(CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS DOUBLE), 0.0), 0.0) AS rate
      FROM events
      WHERE event_type IN ('view', 'purchase')
      GROUP BY 1
      ORDER BY hour_utc""")
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

  // --------------------------------------------------------------- q162
  /** Time-decayed engagement ([[graft.ops.Behavior.decayedEngagement]]):
    * per-user recency-weighted value and count with a 1-day half-life,
    * exact by integer fixed-point — each event contributes
    * cents·2^(31−age) to a DECIMAL(38,0) sum, one double division at the
    * end. The oracle restates the same shift arithmetic with `<<`;
    * 2^31·100 = 214748364800 is exactly representable, so the final
    * doubles agree bit-for-bit. Anchor 2024-02-01 sits after every
    * generator window, making ages positive at every scale factor. */
  private val q162 = Q(
    "q162_decayed_engagement",
    (s, dir) =>
      Behavior.decayedEngagement(
        Lake(s, dir).events, "user_id", "ts", "value", "2024-02-01", 31),
    Some("""
      WITH e AS (SELECT user_id,
          CAST(ROUND(value * 100.0) AS BIGINT) AS cents,
          31 - LEAST(GREATEST(
            datediff('day', CAST(ts AS DATE), DATE '2024-02-01'), 0), 31)
            AS shift
        FROM events)
      SELECT user_id,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(SUM(cents * (CAST(1 AS BIGINT) << shift)) AS DOUBLE)
          / 214748364800.0 AS decayed_value,
        CAST(SUM(CAST(1 AS BIGINT) << shift) AS DOUBLE)
          / 2147483648.0 AS decayed_count
      FROM e GROUP BY user_id ORDER BY user_id""")
  )

  // --------------------------------------------------------------- q163
  /** Two-proportion A/B readout: deterministic variant split (user_id
    * parity), per-user conversion (a RECENT purchase — on/after Jan 30;
    * "any purchase" saturates at rate 1.0 on this corpus, which zeroes
    * the pooled variance and divides by zero under ANSI), and the pooled
    * two-proportion z-score — the experiment-analysis kernel, kept
    * gate-exact because every input is an integer count and the z
    * formula is one √ over +,−,×,÷ assembled identically in both
    * engines. One hash(user) aggregate then a single-row reduction. */
  private val q163 = Q(
    "q163_ab_ztest",
    (s, dir) => {
      val perUser = Lake(s, dir).events
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase" &&
            to_date(col("ts")) >= lit("2024-01-30"), 1L).otherwise(0L))
          .as("converted"))
        .withColumn("variant", pmod(col("user_id"), lit(2L)))
      val c = perUser.agg(
        sum(when(col("variant") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 0L, col("converted")).otherwise(0L))
          .as("conv_a"),
        sum(when(col("variant") === 1L, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("variant") === 1L, col("converted")).otherwise(0L))
          .as("conv_b"))
      def d(n: String) = col(n).cast("double")
      val pa = d("conv_a") / d("n_a")
      val pb = d("conv_b") / d("n_b")
      val pool = (d("conv_a") + d("conv_b")) / (d("n_a") + d("n_b"))
      c.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        pa.as("rate_a"), pb.as("rate_b"),
        ((pa - pb) /
          sqrt(pool * (lit(1.0d) - pool) *
            (lit(1.0d) / d("n_a") + lit(1.0d) / d("n_b")))).as("z_score"))
    },
    Some("""
      WITH u AS (SELECT user_id,
          CAST(MAX(CASE WHEN event_type = 'purchase'
                         AND CAST(ts AS DATE) >= DATE '2024-01-30'
                        THEN 1 ELSE 0 END)
            AS BIGINT) AS converted,
          user_id % 2 AS variant
        FROM events GROUP BY user_id),
      c AS (SELECT
          CAST(COUNT(*) FILTER (WHERE variant = 0) AS BIGINT) AS n_a,
          CAST(COALESCE(SUM(converted) FILTER (WHERE variant = 0), 0)
            AS BIGINT) AS conv_a,
          CAST(COUNT(*) FILTER (WHERE variant = 1) AS BIGINT) AS n_b,
          CAST(COALESCE(SUM(converted) FILTER (WHERE variant = 1), 0)
            AS BIGINT) AS conv_b
        FROM u)
      SELECT n_a, conv_a, n_b, conv_b,
        CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
        CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
        (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
          - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
        sqrt(((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE)) /
              (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
             * (1.0 - (CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE)) /
                      (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
             * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
          AS z_score
      FROM c""")
  )

  // --------------------------------------------------------------- q176
  /** Incremental sessionization ([[graft.ops.Behavior.sessionState]] /
    * `mergeSessionState`): events split at a mid-month cutoff, each half
    * sessionized independently, states folded — and the result must
    * hash-equal the ONE-PASS oracle over all events (q26's window
    * algebra). The gate proves the merge law end-to-end, cross-batch
    * session bridging included: a session straddling the cutoff is
    * counted once in each half and the merge subtracts the bridge. */
  private val q176 = Q(
    "q176_incremental_sessions",
    (s, dir) => {
      val gapUs = 1800000000L
      val cutoff = lit("2024-01-16").cast("timestamp")
      val events = Lake(s, dir).events
      val a = Behavior.sessionState(
        events.filter(col("ts") < cutoff), "user_id", "ts", "event_id", gapUs)
      val b = Behavior.sessionState(
        events.filter(col("ts") >= cutoff), "user_id", "ts", "event_id", gapUs)
      Behavior.mergeSessionState(a, b, "user_id", gapUs)
        .select("user_id", "n_sessions", "n_events")
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
             COUNT(*) AS n_events
      FROM (
        SELECT user_id,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id))
                    > 1800000000
               THEN 1 ELSE 0 END AS new_session
        FROM events)
      GROUP BY user_id ORDER BY user_id""")
  )

  // --------------------------------------------------------------- q179
  /** Session features ([[graft.ops.Behavior.sessions]]): one row per
    * (user, session) with event count, exact duration, conversion flag,
    * and cent-exact session value — the training frame behavioral models
    * consume. Session ids come from the running sum of gap breaks over
    * the same one hash(user) exchange as q26. */
  private val q179 = Q(
    "q179_session_features",
    (s, dir) =>
      Behavior.sessions(Lake(s, dir).events, "user_id", "ts", "event_id",
          1800000000L)
        .groupBy("user_id", "session_idx")
        .agg(
          count(lit(1)).as("n_events"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
            .as("duration_us"),
          (max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            === 1L).as("has_purchase"),
          (sum(round(col("value") * 100.0d, 0).cast("long")).cast("double")
            / 100.0d).as("session_value"))
        .orderBy("user_id", "session_idx"),
    Some("""
      WITH s AS (
        SELECT user_id, ts, event_id, event_type, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS ns
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s2 AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS session_idx
             FROM s)
      SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT)
               AS duration_us,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
               AS has_purchase,
             CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS DOUBLE)
               / 100.0 AS session_value
      FROM s2 GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx""")
  )

  // --------------------------------------------------------------- q180
  /** Segmented funnel — q99's ordered view→click→purchase funnel broken
    * out by the q163 parity variant: per (variant, step) reach counts
    * plus each step's share of the variant's step-0 population. The
    * per-user funnel times come from the same one-exchange window chain
    * ([[graft.ops.Behavior.funnelUserTimes]]); segmentation is a
    * constant-per-user tag applied AFTER the collapse, so the funnel
    * algebra is untouched — which is exactly what the shared oracle CTE
    * proves. */
  private val q180 = Q(
    "q180_funnel_by_variant",
    (s, dir) => {
      val times = Behavior.funnelUserTimes(
        Lake(s, dir).events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), Some(sevenDaysUs))
        .withColumn("variant", pmod(col("user_id"), lit(2L)))
      val steps = Seq(("t0", 0L, "view"), ("t1", 1L, "click"),
        ("t2", 2L, "purchase"))
      val cells = steps.map { case (tc, idx, nm) =>
        times.groupBy("variant")
          .agg(sum(when(col(tc).isNotNull, 1L).otherwise(0L)).as("n_users"))
          .select(col("variant"), lit(idx).as("step"),
            lit(nm).as("step_name"), col("n_users"))
      }.reduce(_.unionByName(_))
      import org.apache.spark.sql.expressions.Window
      cells
        .withColumn("step0_users",
          first(col("n_users")).over(
            Window.partitionBy("variant").orderBy("step")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("reach_share",
          col("n_users").cast("double") / col("step0_users").cast("double"))
        .drop("step0_users")
        .orderBy("variant", "step")
    },
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
      u AS (SELECT user_id, user_id % 2 AS variant,
              MAX(t0) AS t0, MAX(t1) AS t1, MAX(t2) AS t2
            FROM s2 GROUP BY user_id),
      cells AS (
        SELECT variant, 0 AS step, 'view' AS step_name,
               CAST(COUNT(*) FILTER (WHERE t0 IS NOT NULL) AS BIGINT)
                 AS n_users
        FROM u GROUP BY variant
        UNION ALL
        SELECT variant, 1, 'click',
               CAST(COUNT(*) FILTER (WHERE t1 IS NOT NULL) AS BIGINT)
        FROM u GROUP BY variant
        UNION ALL
        SELECT variant, 2, 'purchase',
               CAST(COUNT(*) FILTER (WHERE t2 IS NOT NULL) AS BIGINT)
        FROM u GROUP BY variant)
      SELECT variant, CAST(step AS BIGINT) AS step, step_name, n_users,
             CAST(n_users AS DOUBLE) /
               CAST(FIRST(n_users) OVER (PARTITION BY variant ORDER BY step
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS reach_share
      FROM cells ORDER BY variant, step""")
  )

  // --------------------------------------------------------------- q181
  /** Rolling 7-day active users — the canonical engagement metric
    * (DAU/WAU family), exact: distinct (day, user) pairs fan out to the
    * ≤ 7 trailing day-grid rows they activate, then one distinct count
    * per grid day; the same aggregate also counts the day's own actives
    * through a conditional distinct. The fan-out factor is the window
    * length (bounded), never the data. */
  private val q181 = Q(
    "q181_rolling_active_users",
    (s, dir) => {
      val du = Lake(s, dir).events.select(
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day"),
        col("user_id")).distinct()
      val days = du.select(col("day").as("g")).distinct()
      days.join(du, col("day") >= col("g") - 6 && col("day") <= col("g"))
        .groupBy("g")
        .agg(
          count_distinct(when(col("day") === col("g"), col("user_id")))
            .as("active_1d"),
          count_distinct(col("user_id")).as("active_7d"))
        .select(col("g").as("day"), col("active_1d"), col("active_7d"))
        .orderBy("day")
    },
    Some("""
      WITH du AS (SELECT DISTINCT
          datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
          user_id
        FROM events),
      days AS (SELECT DISTINCT day AS g FROM du)
      SELECT CAST(g AS BIGINT) AS day,
        CAST(COUNT(DISTINCT CASE WHEN du.day = g THEN user_id END)
          AS BIGINT) AS active_1d,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_7d
      FROM days JOIN du ON du.day BETWEEN g - 6 AND g
      GROUP BY g ORDER BY day""")
  )

  // --------------------------------------------------------------- q183
  /** Conversion-delay distribution: view→purchase completion times from
    * the q99 funnel chain, log₂-bucketed with the integer-exact
    * binary-digit bins (q112 discipline — no floating log to disagree
    * on). The shape marketing actually reads: most conversions land in
    * a few adjacent power-of-two bands. */
  private val q183 = Q(
    "q183_conversion_delay",
    (s, dir) => {
      val times = Behavior.funnelUserTimes(
        Lake(s, dir).events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), Some(sevenDaysUs))
      graft.ops.Stats.logHistogram(
        times.filter(col("t2").isNotNull)
          .select((unix_micros(col("t2")) - unix_micros(col("t0")))
            .as("delay_us")),
        "delay_us", Seq.empty)
        .orderBy("bucket")
    },
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
      u AS (SELECT user_id, MAX(t0) AS t0, MAX(t2) AS t2
            FROM s2 GROUP BY user_id),
      d AS (SELECT epoch_us(t2) - epoch_us(t0) AS delay_us
            FROM u WHERE t2 IS NOT NULL)
      SELECT CAST(CASE WHEN delay_us <= 0 THEN 0
                  ELSE length(bin(delay_us)) END AS BIGINT) AS bucket,
             COUNT(*) AS n,
             MIN(delay_us) AS min_value,
             MAX(delay_us) AS max_value
      FROM d GROUP BY 1 ORDER BY bucket""")
  )

  // --------------------------------------------------------------- q186
  /** Daily anomaly flags with ZERO floats — the [[graft.ops.Stats
    * .sigmaOutliers]] integer discipline on a trailing RANGE frame:
    * day d's count x is anomalous vs its type's trailing-7-day baseline
    * iff `(n·x − Σx)² > k²·(n·Σx² − (Σx)²)` (the |x−μ| > k·σ inequality
    * with both sides times n² — every term a long). k = 2; days with
    * fewer than 3 baseline days abstain. Both inequality sides are
    * emitted, so the flag is auditable. */
  private val q186 = Q(
    "q186_daily_anomaly",
    (s, dir) => {
      import org.apache.spark.sql.expressions.{Window => W}
      val daily = Lake(s, dir).events
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("x"))
      val w = W.partitionBy("event_type").orderBy("day").rangeBetween(-7, -1)
      daily
        .withColumn("bn", count(col("x")).over(w))
        // empty trailing frames: SUM is NULL while the oracle coalesces
        // to 0 — match it, or the first day of every type hash-mismatches
        .withColumn("bs", coalesce(sum(col("x")).over(w), lit(0L)))
        .withColumn("bss",
          coalesce(sum(col("x") * col("x")).over(w), lit(0L)))
        .withColumn("lhs",
          (col("bn") * col("x") - col("bs")) *
            (col("bn") * col("x") - col("bs")))
        .withColumn("rhs",
          lit(4L) * (col("bn") * col("bss") - col("bs") * col("bs")))
        .withColumn("is_anomaly", col("bn") >= 3 && col("lhs") > col("rhs"))
        .select("event_type", "day", "x", "bn", "lhs", "rhs", "is_anomaly")
        .orderBy("event_type", "day")
    },
    Some("""
      WITH daily AS (
        SELECT event_type,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                 AS BIGINT) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
      b AS (SELECT event_type, day, x,
              CAST(COUNT(x) OVER w AS BIGINT) AS bn,
              CAST(COALESCE(SUM(x) OVER w, 0) AS BIGINT) AS bs,
              CAST(COALESCE(SUM(x * x) OVER w, 0) AS BIGINT) AS bss
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
      SELECT event_type, day, x, bn,
             (bn * x - bs) * (bn * x - bs) AS lhs,
             4 * (bn * bss - bs * bs) AS rhs,
             bn >= 3 AND (bn * x - bs) * (bn * x - bs)
               > 4 * (bn * bss - bs * bs) AS is_anomaly
      FROM b ORDER BY event_type, day""")
  )

  // --------------------------------------------------------------- q198
  /** Interval×interval overlap join ([[graft.ops.Joins
    * .intervalOverlapJoin]]): user sessions against three campaign
    * windows — per campaign, how many sessions overlapped and for how
    * long. The Spark side runs the bin-bucketed scale path (day bins,
    * canonical-bin dedup, no nested loop); the oracle states the direct
    * inequality join — the rangeJoin spec-vs-scale-path pattern for the
    * interval×interval case. */
  private val q198 = Q(
    "q198_campaign_session_overlap",
    (s, dir) => {
      import s.implicits._
      val sessions = Behavior.sessions(Lake(s, dir).events,
          "user_id", "ts", "event_id", 1800000000L)
        .groupBy("user_id", "session_idx")
        .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
      val campaigns = Seq(
        ("c_week1", "2024-01-05 00:00:00", "2024-01-08 00:00:00"),
        ("c_mid", "2024-01-12 00:00:00", "2024-01-20 00:00:00"),
        ("c_final", "2024-01-25 00:00:00", "2024-01-27 00:00:00"))
        .toDF("campaign", "cs0", "ce0")
        .select(col("campaign"), col("cs0").cast("timestamp").as("cs"),
          col("ce0").cast("timestamp").as("ce"))
      graft.ops.Joins.intervalOverlapJoin(
          sessions, "st", "en", campaigns, "cs", "ce", binSeconds = 86400L)
        .groupBy("campaign")
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("overlap_us")).as("total_overlap_us"))
        .orderBy("campaign")
    },
    Some("""
      WITH s0 AS (SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS ns
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s1 AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS sid
             FROM s0),
      sess AS (SELECT user_id, sid, MIN(ts) AS st, MAX(ts) AS en
               FROM s1 GROUP BY user_id, sid),
      c(campaign, cs, ce) AS (VALUES
        ('c_week1', TIMESTAMP '2024-01-05 00:00:00',
                    TIMESTAMP '2024-01-08 00:00:00'),
        ('c_mid',   TIMESTAMP '2024-01-12 00:00:00',
                    TIMESTAMP '2024-01-20 00:00:00'),
        ('c_final', TIMESTAMP '2024-01-25 00:00:00',
                    TIMESTAMP '2024-01-27 00:00:00'))
      SELECT campaign, CAST(COUNT(*) AS BIGINT) AS n_sessions,
             CAST(SUM(epoch_us(LEAST(en, ce)) -
                      epoch_us(GREATEST(st, cs))) AS BIGINT)
               AS total_overlap_us
      FROM sess JOIN c ON st < ce AND cs < en
      GROUP BY campaign ORDER BY campaign""")
  )

  // --------------------------------------------------------------- q199
  /** Cumulative distinct users by day — the growth curve: a user counts
    * from their FIRST active day onward, so "distinct to date" is a
    * per-user min + a running sum over the day grid (never a
    * distinct-over-expanding-window, which would re-scan history per
    * day). New-user and cumulative columns share one pass. */
  private val q199 = Q(
    "q199_user_growth_curve",
    (s, dir) => {
      import org.apache.spark.sql.expressions.{Window => W}
      val ev = Lake(s, dir).events.select(
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day"),
        col("user_id"))
      val firsts = ev.groupBy("user_id").agg(min(col("day")).as("first_day"))
        .groupBy("first_day").agg(count(lit(1)).as("new_users"))
      ev.select("day").distinct()
        .join(firsts, col("day") === col("first_day"), "left_outer")
        .select(col("day"), coalesce(col("new_users"), lit(0L)).as("new_users"))
        .withColumn("cumulative_users",
          sum(col("new_users")).over(W.orderBy("day")))
        .orderBy("day")
    },
    Some("""
      WITH ev AS (SELECT
          datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
          user_id
        FROM events),
      f AS (SELECT user_id, MIN(day) AS first_day FROM ev GROUP BY 1),
      d AS (SELECT first_day, CAST(COUNT(*) AS BIGINT) AS new_users
            FROM f GROUP BY 1),
      g AS (SELECT DISTINCT day FROM ev)
      SELECT CAST(g.day AS BIGINT) AS day,
             CAST(COALESCE(d.new_users, 0) AS BIGINT) AS new_users,
             CAST(SUM(COALESCE(d.new_users, 0)) OVER (ORDER BY g.day)
               AS BIGINT) AS cumulative_users
      FROM g LEFT JOIN d ON g.day = d.first_day
      ORDER BY day""")
  )

  // --------------------------------------------------------------- q205
  /** Time-weighted average value (TWAP) per user: each observation holds
    * until the next one, so its weight is the micros until the user's
    * next event (the last observation carries zero holding time and
    * drops out — the standard left-closed convention). Numerator
    * Σ(cents·hold_us) in DECIMAL(38,0) (cent-scale × month-of-micros
    * products overflow a long at scale), ONE double division at the
    * end — the integer fixed-point discipline on the classic
    * finance/telemetry metric. */
  private val q205 = Q(
    "q205_time_weighted_value",
    (s, dir) => {
      import org.apache.spark.sql.expressions.{Window => W}
      val w = W.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Lake(s, dir).events
        .withColumn("__hold",
          unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
        .filter(col("__hold").isNotNull)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_holds"),
          sum(col("__hold")).as("total_us"),
          ((sum((round(col("value") * 100.0d, 0).cast("long") * col("__hold"))
            .cast("decimal(38,0)")).cast("double") /
            sum(col("__hold")).cast("double")) / 100.0d).as("twap"))
        .orderBy("user_id")
    },
    Some("""
      WITH h AS (SELECT user_id, value,
          epoch_us(lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)) - epoch_us(ts)
            AS hold_us
        FROM events),
      f AS (SELECT * FROM h WHERE hold_us IS NOT NULL)
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_holds,
             CAST(SUM(hold_us) AS BIGINT) AS total_us,
             CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT) * hold_us)
               AS DOUBLE) / CAST(SUM(hold_us) AS DOUBLE) / 100.0 AS twap
      FROM f GROUP BY user_id ORDER BY user_id""")
  )

  // --------------------------------------------------------------- q238
  /** Point-in-time enrichment against SCD2 state — the lakehouse
    * dimension-join pattern: the q102 history becomes the dimension
    * (collapsed to the LAST version per (user, valid_from) so same-instant
    * boundary ties have one deterministic owner), and every event picks
    * up the state/version valid at its timestamp via [[Joins.asofJoin]]
    * (one hash(user) exchange, union-and-scan — never the |events|×
    * |versions| explosion). The oracle builds the identical dimension
    * and states the join with DuckDB's native ASOF JOIN. */
  private val q238 = Q(
    "q238_pit_scd2_enrich",
    (s, dir) => {
      import org.apache.spark.sql.expressions.{Window => W}
      val ev = Lake(s, dir).events
      val scd = Snapshot.scd2(ev, "user_id", "ts", "event_id", "event_type")
      val w = W.partitionBy("user_id", "valid_from")
        .orderBy(col("version").desc)
      val dim = scd
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("valid_from").as("ts"),
          col("state"), col("version"))
      Joins.asofJoin(ev.select("event_id", "user_id", "ts"), dim,
          Seq("user_id"), "ts", Seq("state", "version"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("state"),
          col("version"),
          unix_micros(col("__matched_ts")).as("matched_from_us"))
        .orderBy("event_id")
    },
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
              MIN(ts) AS valid_from
            FROM i GROUP BY user_id, version),
      dim AS (SELECT user_id, valid_from, state, version FROM (
                SELECT *, row_number() OVER (PARTITION BY user_id, valid_from
                  ORDER BY version DESC) AS drn FROM r)
              WHERE drn = 1)
      SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
             d.state, CAST(d.version AS BIGINT) AS version,
             epoch_us(d.valid_from) AS matched_from_us
      FROM events e
      ASOF JOIN dim d
        ON e.user_id = d.user_id AND d.valid_from <= e.ts
      ORDER BY e.event_id""")
  )

  // --------------------------------------------------------------- q269
  /** Temporal-consistency audit ([[graft.ops.Snapshot.temporalAudit]])
    * on a deterministically CORRUPTED q102 history — a well-formed scd2
    * output audits clean by construction, so the fixture plants every
    * violation class: version ≡ 3 (mod 7) extends valid_to by an hour
    * (OVERLAP with the successor), version ≡ 7 (mod 13) shaves one
    * microsecond (GAP), version ≡ 5 (mod 11) nulls valid_to (an OPEN
    * row that is not last). The when-chain order is the contract and is
    * mirrored as the oracle's CASE chain; nulls propagate identically
    * (the last version's null valid_to stays null through the +1h arm).
    * Overlap/gap compare each row against the RUNNING max(valid_to) of
    * all predecessors (open predecessors count as +∞), not just lag-1 —
    * a long interval outliving several successors flags every one of
    * them, and never mints a phantom gap inside its own span.
    * This is the gate a point-in-time join (q238) should demand of its
    * dimension before trusting it. */
  private val q269 = Q(
    "q269_temporal_audit",
    (s, dir) => {
      val hist = Snapshot.scd2(Lake(s, dir).events,
          "user_id", "ts", "event_id", "event_type")
        .select(col("user_id"), col("version"),
          unix_micros(col("valid_from")).as("f_us"),
          unix_micros(col("valid_to")).as("t_us"))
      val corrupted = hist.withColumn("t_us",
        when(col("version") % 7 === 3, col("t_us") + 3600000000L)
          .when(col("version") % 13 === 7, col("t_us") - 1L)
          .when(col("version") % 11 === 5, lit(null).cast("long"))
          .otherwise(col("t_us")))
      Snapshot.temporalAudit(corrupted, "user_id", "f_us", "t_us")
    },
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
      r AS (SELECT user_id, version, MIN(ts) AS valid_from
            FROM i GROUP BY user_id, version),
      f AS (SELECT *, lead(valid_from) OVER (PARTITION BY user_id
              ORDER BY version) AS valid_to FROM r),
      b AS (SELECT user_id, version, epoch_us(valid_from) AS f_us,
              epoch_us(valid_to) AS t_us FROM f),
      x AS (SELECT user_id, f_us,
              CASE WHEN version % 7 = 3 THEN t_us + 3600000000
                   WHEN version % 13 = 7 THEN t_us - 1
                   WHEN version % 11 = 5 THEN NULL
                   ELSE t_us END AS t_us
            FROM b),
      l AS (SELECT user_id, f_us, t_us,
              MAX(t_us) OVER (PARTITION BY user_id ORDER BY f_us
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax,
              COALESCE(MAX(CASE WHEN t_us IS NULL THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY f_us
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS popen,
              COUNT(*) OVER (PARTITION BY user_id ORDER BY f_us
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > 0
                AS pany,
              lead(f_us) OVER (PARTITION BY user_id ORDER BY f_us)
                IS NOT NULL AS has_next
            FROM x)
      SELECT COUNT(*) AS n_rows,
        CAST(SUM(CASE WHEN pany AND (popen = 1 OR f_us < pmax)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
        CAST(SUM(CASE WHEN pany AND popen = 0 AND f_us > pmax
          THEN 1 ELSE 0 END) AS BIGINT) AS n_gap,
        CAST(SUM(CASE WHEN t_us IS NULL AND has_next THEN 1 ELSE 0 END)
          AS BIGINT) AS n_open_not_last
      FROM l""")
  )

  // --------------------------------------------------------------- q272
  /** Cohort LTV curves — the acquisition-economics readout q101's
    * retention (who comes back) and q199's growth (how many arrive) do
    * not give: per FIRST-ORDER-month cohort, cumulative revenue through
    * each month offset, plus how many of the cohort were active in that
    * offset. Month arithmetic is exact integer (year·12 + month index —
    * no date intervals, no month-length edge cases), money is exact
    * cents, and the curve is one running sum over the
    * (cohort, offset)-grouped frame. Two shuffles: first-order per
    * customer, then the cohort/offset rollup whose partitioning the
    * cumulative window reuses. */
  private val q272 = Q(
    "q272_cohort_ltv",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Lake(s, dir).orders.select(
        col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("idx"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val f = o.groupBy("o_custkey").agg(min(col("idx")).as("fidx"))
      val g = o.join(f, "o_custkey")
        .groupBy(col("fidx"), (col("idx") - col("fidx")).as("month_offset"))
        .agg(sum(col("cents")).as("cents"),
          countDistinct(col("o_custkey")).as("active_customers"))
      val c = f.groupBy("fidx").agg(count(lit(1)).as("cohort_customers"))
      val w = Window.partitionBy("fidx").orderBy("month_offset")
      g.join(broadcast(c), "fidx")
        .withColumn("cum_cents", sum(col("cents")).over(w))
        .select(
          concat(expr("fidx div 12").cast("string"),
            lpad((col("fidx") % 12 + 1).cast("string"), 2, "0")).as("cohort"),
          col("month_offset"), col("cohort_customers"),
          col("active_customers"), col("cum_cents"))
        .orderBy("cohort", "month_offset")
    },
    Some("""
      WITH o AS (SELECT o_custkey,
              CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                AS BIGINT) AS idx,
              CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents
            FROM orders),
      f AS (SELECT o_custkey, MIN(idx) AS fidx FROM o GROUP BY 1),
      g AS (SELECT f.fidx, o.idx - f.fidx AS month_offset,
              CAST(SUM(o.cents) AS BIGINT) AS cents,
              COUNT(DISTINCT o.o_custkey) AS active_customers
            FROM o JOIN f USING (o_custkey)
            GROUP BY 1, 2),
      c AS (SELECT fidx, COUNT(*) AS cohort_customers FROM f GROUP BY 1)
      SELECT CAST(g.fidx // 12 AS VARCHAR)
               || lpad(CAST(g.fidx % 12 + 1 AS VARCHAR), 2, '0') AS cohort,
             g.month_offset, c.cohort_customers, g.active_customers,
             CAST(SUM(g.cents) OVER (PARTITION BY g.fidx
               ORDER BY g.month_offset) AS BIGINT) AS cum_cents
      FROM g JOIN c USING (fidx)
      ORDER BY cohort, month_offset""")
  )

  // --------------------------------------------------------------- q276
  /** Cohort retention half-life — q272's curve collapsed to the single
    * number an acquisition dashboard tracks: the first month offset
    * (> 0) where fewer than half the cohort is still active, tested as
    * the pure integer inequality 2·active < cohort (no ratio, no
    * float). Cohorts that never decay below half within the observed
    * window report NULL — "not yet measurable" is a different answer
    * than a number, and the gate pins that distinction. A conditional
    * MIN over the (cohort, offset) frame — no new shuffle beyond
    * q272's rollup. */
  private val q276 = Q(
    "q276_retention_half_life",
    (s, dir) => {
      val o = Lake(s, dir).orders.select(
        col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("idx"))
      val f = o.groupBy("o_custkey").agg(min(col("idx")).as("fidx"))
      val g = o.join(f, "o_custkey")
        .groupBy(col("fidx"), (col("idx") - col("fidx")).as("month_offset"))
        .agg(countDistinct(col("o_custkey")).as("active"))
      val c = f.groupBy("fidx").agg(count(lit(1)).as("cohort_customers"))
      g.join(broadcast(c), "fidx")
        .groupBy("fidx")
        .agg(
          first(col("cohort_customers")).as("cohort_customers"),
          min(when(col("month_offset") > 0 &&
            col("active") * 2 < col("cohort_customers"),
            col("month_offset"))).as("half_life_months"))
        .select(
          concat(expr("fidx div 12").cast("string"),
            lpad((col("fidx") % 12 + 1).cast("string"), 2, "0")).as("cohort"),
          col("cohort_customers"), col("half_life_months"))
        .orderBy("cohort")
    },
    Some("""
      WITH o AS (SELECT o_custkey,
              CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                AS BIGINT) AS idx
            FROM orders),
      f AS (SELECT o_custkey, MIN(idx) AS fidx FROM o GROUP BY 1),
      g AS (SELECT f.fidx, o.idx - f.fidx AS month_offset,
              COUNT(DISTINCT o.o_custkey) AS active
            FROM o JOIN f USING (o_custkey)
            GROUP BY 1, 2),
      c AS (SELECT fidx, COUNT(*) AS cohort_customers FROM f GROUP BY 1)
      SELECT CAST(g.fidx // 12 AS VARCHAR)
               || lpad(CAST(g.fidx % 12 + 1 AS VARCHAR), 2, '0') AS cohort,
             c.cohort_customers,
             MIN(CASE WHEN g.month_offset > 0
                       AND g.active * 2 < c.cohort_customers
                      THEN g.month_offset END) AS half_life_months
      FROM g JOIN c USING (fidx)
      GROUP BY g.fidx, c.cohort_customers
      ORDER BY cohort""")
  )

  // --------------------------------------------------------------- q298
  /** CUPED-adjusted A/B readout — the variance-reduction standard of
    * every experimentation platform (Deng et al. 2013): each user's
    * post-period value is adjusted by θ·(pre − mean(pre)) using the
    * PRE-experiment covariate, shrinking variance without biasing the
    * delta. Everything before the final doubles is exact: per-user
    * pre/post cent sums (pre = Jan 1–15, post = the q282 bounded
    * Jan 16–30 window; population = users with pre activity, the
    * leakage-safe frame), pooled moments in DECIMAL/HUGEINT, and
    * θ = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) plus the per-variant
    * `mean_adj = ȳ_v − θ·(x̄_v − x̄)` assembled with the identical
    * per-operand double casts on both engines (the q154/q289 moment
    * discipline applied to an experimentation op). One data-sized
    * aggregate, a 2-row variant rollup, a broadcast 1-row moment frame. */
  private val q298 = Q(
    "q298_cuped_ab",
    (s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      val lo = to_timestamp(lit("2024-01-16"))
      val hi = to_timestamp(lit("2024-01-31"))
      val cents = round(col("value") * 100.0d, 0).cast("long")
      val per = Lake(s, dir).events
        .groupBy("user_id")
        .agg(
          sum(when(col("ts") < lo, cents).otherwise(0L)).as("pre"),
          sum(when(col("ts") >= lo && col("ts") < hi, cents).otherwise(0L))
            .as("post"),
          sum(when(col("ts") < lo, 1L).otherwise(0L)).as("n_pre"))
        .filter(col("n_pre") > 0)
        .withColumn("variant", pmod(col("user_id"), lit(2L)))
      val m = per.agg(
        count(lit(1)).as("n"),
        sum(dec(col("pre"))).as("sx"),
        sum(dec(col("post"))).as("sy"),
        sum(dec(col("pre")) * dec(col("pre"))).as("sxx"),
        sum(dec(col("pre")) * dec(col("post"))).as("sxy"))
      val theta =
        (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")))
      per.groupBy("variant")
        .agg(
          count(lit(1)).as("n_users"),
          sum(dec(col("pre"))).as("sx_v"),
          sum(dec(col("post"))).as("sy_v"))
        .crossJoin(broadcast(m))
        .select(col("variant"), col("n_users"),
          col("sx_v").cast("long").as("sum_pre_cents"),
          col("sy_v").cast("long").as("sum_post_cents"),
          theta.as("theta"),
          (d(col("sy_v")) / d(col("n_users")) -
            theta * (d(col("sx_v")) / d(col("n_users")) -
              d(col("sx")) / d(col("n")))).as("mean_adj_cents"))
        .orderBy("variant")
    },
    Some("""
      WITH per AS (
        SELECT user_id,
          CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
            THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS pre,
          CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                         AND ts < TIMESTAMP '2024-01-31'
            THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS post,
          SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
            AS n_pre
        FROM events GROUP BY user_id
        HAVING SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
          > 0),
      v AS (SELECT *, user_id % 2 AS variant FROM per),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(pre) AS HUGEINT) AS sx,
              CAST(SUM(post) AS HUGEINT) AS sy,
              SUM(CAST(pre AS HUGEINT) * pre) AS sxx,
              SUM(CAST(pre AS HUGEINT) * post) AS sxy
            FROM v),
      g AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
              CAST(SUM(pre) AS HUGEINT) AS sx_v,
              CAST(SUM(post) AS HUGEINT) AS sy_v
            FROM v GROUP BY 1)
      SELECT CAST(variant AS BIGINT) AS variant, n_users,
             CAST(sx_v AS BIGINT) AS sum_pre_cents,
             CAST(sy_v AS BIGINT) AS sum_post_cents,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
             CAST(sy_v AS DOUBLE) / CAST(n_users AS DOUBLE) -
               ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) *
               (CAST(sx_v AS DOUBLE) / CAST(n_users AS DOUBLE)
                  - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS mean_adj_cents
      FROM g CROSS JOIN m ORDER BY variant""")
  )

  // --------------------------------------------------------------- q301
  /** Incremental global sequence numbers for an append-only log — the
    * maintenance story for [[graft.ops.Ranks.globalRowNumber]]: when new
    * data sorts strictly AFTER everything already ranked (monotone
    * event time, the append-only lake's normal case), the new batch's
    * global positions are just `old_total + rank_within_batch` — O(batch)
    * work, history untouched, the q54 incremental-dedup discipline
    * applied to ordering. This gate derives ranks incrementally (history
    * before Jan 16 ranked on its own; the later batch ranked on its own
    * and offset by one broadcast count) and the ORACLE ranks the whole
    * log in one pass — hash equality IS the proof that the incremental
    * path reproduces the full recompute. Per-day rollup keeps the gate
    * compact: contiguous min/max ranks per day also witness that no
    * position was skipped or doubled. */
  private val q301 = Q(
    "q301_incremental_rank",
    (s, dir) => {
      import graft.ops.Ranks
      val cutoff = to_timestamp(lit("2024-01-16"))
      val ev = Lake(s, dir).events.select(col("event_id"), col("ts"))
      val hist = ev.filter(col("ts") < cutoff)
      val batch = ev.filter(col("ts") >= cutoff)
      val histRanked = Ranks.globalRowNumber(
        hist, Seq(col("ts"), col("event_id")), "grank")
      val histCount = hist.agg(count(lit(1)).as("__c"))
      val batchRanked = Ranks.globalRowNumber(
          batch, Seq(col("ts"), col("event_id")), "__brank")
        .crossJoin(broadcast(histCount))
        .select(col("event_id"), col("ts"),
          (col("__brank") + col("__c")).as("grank"))
      histRanked.unionByName(batchRanked)
        .groupBy(date_format(col("ts"), "yyyyMMdd").as("day"))
        .agg(count(lit(1)).as("n_events"),
          min(col("grank")).as("min_rank"),
          max(col("grank")).as("max_rank"))
        .orderBy("day")
    },
    Some("""
      WITH r AS (SELECT ts,
               CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT)
                 AS grank
             FROM events)
      SELECT strftime(ts, '%Y%m%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MIN(grank) AS min_rank, MAX(grank) AS max_rank
      FROM r GROUP BY 1 ORDER BY day""")
  )

  // --------------------------------------------------------------- q305
  /** Deterministic permutation test for the A/B delta — the
    * assumption-free significance check beside q163's z-test and q298's
    * CUPED: under the null, variant labels are exchangeable, so the
    * observed mean difference is compared against B = 16 label
    * permutations. No RNG anywhere (the q304 discipline): permutation
    * p relabels each user by the parity of md5(user "#" p), so both
    * engines — and any rerun — walk the identical null distribution.
    * Per-permutation means come from exact DECIMAL/HUGEINT cent sums
    * with one mirrored division; the readout is the exact count of
    * permutations at least as extreme as observed and the standard
    * add-one p-value (n_extreme + 1)/(B + 1). */
  private val q305 = Q(
    "q305_permutation_test",
    (s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      def delta(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String]) =
        df.groupBy(groupCols.map(col): _*)
          .agg(
            sum(when(col("v") === 1, dec(col("cents"))).otherwise(dec(lit(0L))))
              .as("s1"),
            sum(when(col("v") === 0, dec(col("cents"))).otherwise(dec(lit(0L))))
              .as("s0"),
            sum(when(col("v") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("v") === 0, 1L).otherwise(0L)).as("n0"))
          .withColumn("delta",
            d(col("s1")) / d(col("n1")) - d(col("s0")) / d(col("n0")))
      val base = Lake(s, dir).events
        .groupBy("user_id")
        .agg(sum(round(col("value") * 100.0d, 0).cast("long")).as("cents"))
      val obs = delta(
        base.withColumn("v", pmod(col("user_id"), lit(2L))), Seq.empty)
        .select(col("delta").as("obs_delta"))
      val perms = s.range(16).select(col("id").as("p"))
      val permDeltas = delta(
        base.crossJoin(broadcast(perms))
          .withColumn("v",
            conv(substring(md5(concat(col("user_id").cast("string"),
              lit("#"), col("p").cast("string"))), 1, 1), 16, 10)
              .cast("long") % 2),
        Seq("p"))
      permDeltas.crossJoin(broadcast(obs))
        .agg(sum(when(abs(col("delta")) >= abs(col("obs_delta")), 1L)
          .otherwise(0L)).as("n_extreme"))
        .crossJoin(broadcast(obs))
        .select(col("obs_delta"), lit(16L).as("b"), col("n_extreme"),
          ((col("n_extreme") + 1L).cast("double") / lit(17.0d))
            .as("p_value"))
    },
    Some("""
      WITH base AS (SELECT user_id,
               CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT)
                 AS cents
             FROM events GROUP BY 1),
      obs AS (SELECT
          CAST(SUM(CASE WHEN user_id % 2 = 1 THEN CAST(cents AS HUGEINT)
            ELSE 0 END) AS DOUBLE) /
          CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS DOUBLE) -
          CAST(SUM(CASE WHEN user_id % 2 = 0 THEN CAST(cents AS HUGEINT)
            ELSE 0 END) AS DOUBLE) /
          CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS DOUBLE)
            AS obs_delta
        FROM base),
      perms AS (SELECT CAST(p AS BIGINT) AS p
                FROM generate_series(0, 15) AS g(p)),
      lab AS (SELECT p,
               (strpos('0123456789abcdef',
                  substr(md5(CAST(user_id AS VARCHAR) || '#'
                    || CAST(p AS VARCHAR)), 1, 1)) - 1) % 2 AS v,
               cents
             FROM base CROSS JOIN perms),
      pd AS (SELECT p,
          CAST(SUM(CASE WHEN v = 1 THEN CAST(cents AS HUGEINT)
            ELSE 0 END) AS DOUBLE) /
          CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS DOUBLE) -
          CAST(SUM(CASE WHEN v = 0 THEN CAST(cents AS HUGEINT)
            ELSE 0 END) AS DOUBLE) /
          CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS delta
        FROM lab GROUP BY p),
      x AS (SELECT CAST(SUM(CASE WHEN ABS(delta) >= ABS(obs_delta)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
            FROM pd CROSS JOIN obs)
      SELECT obs_delta, CAST(16 AS BIGINT) AS b, n_extreme,
             CAST(n_extreme + 1 AS DOUBLE) / 17.0 AS p_value
      FROM x CROSS JOIN obs""")
  )

  val all: Seq[Q] = Seq(q99, q100, q101, q102, q107, q137, q140, q162, q163,
    q176, q179, q180, q181, q183, q186, q198, q199, q205, q238, q269, q272,
    q276, q278, q282, q290, q298, q301, q305)
}
