package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, Snapshot}

/** Unit tests for the behavioral-analytics operators (ops.Behavior) and
  * the SCD2 history build (ops.Snapshot.scd2) — hand-computed fixtures
  * pinning the ordered-funnel, transition, cohort, and gaps-and-islands
  * semantics the q99–q102 oracles gate at corpus scale. */
class BehaviorSpec extends SparkTestBase {
  import testImplicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def mkEvents(rows: Seq[(Long, String, String)]) =
    rows.zipWithIndex
      .map { case ((u, t, e), i) => (u, ts(t), e, i.toLong) }
      .toDF("user_id", "ts", "event_type", "event_id")

  // ------------------------------------------------------------ funnel

  test("funnel: steps count only in order — a purchase before the click doesn't convert") {
    val events = mkEvents(Seq(
      // u1: view → click → purchase, in order: reaches all three
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:05:00", "click"),
      (1L, "2024-01-01 10:10:00", "purchase"),
      // u2: purchase BEFORE the click: reaches view, click — not purchase
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 10:02:00", "purchase"),
      (2L, "2024-01-01 10:05:00", "click"),
      // u3: click with no prior view: reaches nothing
      (3L, "2024-01-01 10:00:00", "click"),
      (3L, "2024-01-01 10:05:00", "purchase")))
    val out = Behavior.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, "view", 2L), (1L, "click", 2L), (2L, "purchase", 1L)))
  }

  test("funnel: the conversion window is anchored at step 0, not per step") {
    val events = mkEvents(Seq(
      // u1 converts within 1h of the first view
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:20:00", "click"),
      (1L, "2024-01-01 10:40:00", "purchase"),
      // u2's purchase is 30min after the click but >1h after the view
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 10:50:00", "click"),
      (2L, "2024-01-01 11:20:00", "purchase")))
    val hourUs = 3600L * 1000000
    val out = Behavior.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), Some(hourUs))
      .orderBy("step").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 2L), (1L, 2L), (2L, 1L)))
  }

  test("funnelUserTimes: step times are the EARLIEST valid completion, not any") {
    val events = mkEvents(Seq(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:05:00", "click"),
      (1L, "2024-01-01 10:30:00", "click"), // later click must not win
      (1L, "2024-01-01 10:40:00", "purchase")))
    val r = Behavior.funnelUserTimes(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).collect().head
    assert(r.getTimestamp(1) == ts("2024-01-01 10:00:00"))
    assert(r.getTimestamp(2) == ts("2024-01-01 10:05:00"))
    assert(r.getTimestamp(3) == ts("2024-01-01 10:40:00"))
  }

  // -------------------------------------------------------- transitions

  test("transitions: lag pairs per user with the (start) state, counted") {
    val events = mkEvents(Seq(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:05:00", "click"),
      (1L, "2024-01-01 10:10:00", "click"),
      (2L, "2024-01-01 09:00:00", "view"),
      (2L, "2024-01-01 09:05:00", "click")))
    val out = Behavior.transitions(events, "user_id", "ts", "event_id", "event_type")
      .orderBy("from_state", "to_state").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("(start)", "view", 2L), ("click", "click", 1L), ("view", "click", 2L)))
  }

  test("paths: sliding length-3 windows per user, partial windows dropped") {
    val events = mkEvents(Seq(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:01:00", "click"),
      (1L, "2024-01-01 10:02:00", "purchase"),
      (1L, "2024-01-01 10:03:00", "view"),   // second window: click>purchase>view
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 10:01:00", "click"),
      (2L, "2024-01-01 10:02:00", "purchase"),
      (3L, "2024-01-01 10:00:00", "view")))  // too short: contributes nothing
    val out = Behavior.paths(events, "user_id", "ts", "event_id", "event_type", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map(
      "view>click>purchase" -> 2L, "click>purchase>view" -> 1L))
  }

  // ---------------------------------------------------------- retention

  test("retention: cohort is the first event's epoch-week, offsets are user-relative") {
    // 2024-01-01 is a Monday; epoch-day 19723 → epoch-week 2817
    val events = mkEvents(Seq(
      // u1 first active Jan 1 (week 2817), again 8 days later (offset 1)
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-09 10:00:00", "view"),
      // u2 first active Jan 2 — same epoch-week cohort as u1;
      // two events the same week (offset 0 counted once)
      (2L, "2024-01-02 10:00:00", "view"),
      (2L, "2024-01-03 10:00:00", "view"),
      // u3 first active Jan 10 → next epoch-week cohort
      (3L, "2024-01-10 10:00:00", "view")))
    val out = Behavior.retention(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val w = 19723 / 7 // epoch-week of 2024-01-01
    assert(out.toSeq == Seq(
      (w.toLong, 0L, 2L), (w.toLong, 1L, 1L), (w.toLong + 1, 0L, 1L)))
  }

  // --------------------------------------------------------------- scd2

  test("scd2: consecutive equal states collapse; valid_to chains to the next range") {
    val hist = mkEvents(Seq(
      (1L, "2024-01-01 00:00:00", "trial"),
      (1L, "2024-01-02 00:00:00", "trial"),
      (1L, "2024-01-03 00:00:00", "paid"),
      (1L, "2024-01-04 00:00:00", "trial"), // back to trial = NEW range
      (2L, "2024-01-01 00:00:00", "paid")))
    val out = Snapshot.scd2(hist, "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id", "version").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "trial", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), 2L),
      (1L, "paid",  ts("2024-01-03 00:00:00"), Some(ts("2024-01-04 00:00:00")), 1L),
      (1L, "trial", ts("2024-01-04 00:00:00"), None, 1L),
      (2L, "paid",  ts("2024-01-01 00:00:00"), None, 1L)))
  }

  test("scd2: null state is a real state (null-safe change detection), ties broken by tieCol") {
    val hist = Seq(
      (1L, ts("2024-01-01 00:00:00"), null.asInstanceOf[String], 0L),
      (1L, ts("2024-01-02 00:00:00"), null.asInstanceOf[String], 1L),
      (1L, ts("2024-01-03 00:00:00"), "active", 2L),
      // same timestamp, ordered by event_id: state flips twice
      (2L, ts("2024-01-01 00:00:00"), "a", 3L),
      (2L, ts("2024-01-01 00:00:00"), "b", 4L),
      (2L, ts("2024-01-01 00:00:00"), "a", 5L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = Snapshot.scd2(hist, "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id", "version").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, None, 2L, 1L), (1L, Some("active"), 1L, 2L),
      (2L, Some("a"), 1L, 1L), (2L, Some("b"), 1L, 2L), (2L, Some("a"), 1L, 3L)))
  }

  test("scd2 composes with diff: the final range states ARE the current snapshot") {
    val hist = mkEvents(Seq(
      (1L, "2024-01-01 00:00:00", "x"),
      (1L, "2024-01-02 00:00:00", "y"),
      (2L, "2024-01-01 00:00:00", "z")))
    val current = Snapshot.scd2(hist, "user_id", "ts", "event_id", "event_type")
      .filter(col("valid_to").isNull)
      .select(col("user_id"), col("state"))
    val latest = hist.groupBy("user_id")
      .agg(max_by(col("event_type"), struct(col("ts"), col("event_id"))).as("state"))
    assert(Snapshot.diff(current, latest, "user_id", Seq("state")).count() == 0)
  }

  test("gapFillDaily: dense calendar per key, forward fill across gaps, observed flags") {
    import java.sql.Timestamp
    def t(day: String): Timestamp = Timestamp.valueOf(s"$day 10:00:00")
    val rows = Seq(
      ("u", t("2024-01-01"), 5.0),
      ("u", t("2024-01-01"), 7.0),  // same day: max wins
      ("u", t("2024-01-04"), 2.0),  // 2-day gap before this
      ("v", t("2024-02-10"), 9.0))  // single-day span
      .toDF("k", "ts", "v")
    val out = Behavior.gapFillDaily(rows, Seq("k"), "ts", "v")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getInt(3))).toMap
    assert(out.size == 5) // u: 4 days, v: 1 day — dense spans only
    assert(out(("u", "20240101")) == (7.0, 1))
    assert(out(("u", "20240102")) == (7.0, 0)) // gap: carried forward
    assert(out(("u", "20240103")) == (7.0, 0))
    assert(out(("u", "20240104")) == (2.0, 1))
    assert(out(("v", "20240210")) == (9.0, 1))
  }

  test("rollingFeatures: RANGE frame ages events out by calendar day, not row count") {
    import java.sql.Timestamp
    def t(day: String): Timestamp = Timestamp.valueOf(s"$day 10:00:00")
    val rows = Seq(
      ("u", t("2024-01-01"), 10.0),
      ("u", t("2024-01-01"), 20.0),  // same day: summed
      ("u", t("2024-01-05"), 3.0),   // inside day-1's 7-day reach
      ("u", t("2024-01-20"), 5.0),   // far gap: window restarts
      ("v", t("2024-03-01"), 1.5))
      .toDF("k", "ts", "v")
    val out = Behavior.rollingFeatures(rows, Seq("k"), "ts", "v", windowDays = 7)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), if (r.isNullAt(7)) None else Some(r.getDouble(7)))))
      .toMap
    assert(out.size == 4) // observed days only — no gap fill here
    assert(out(("u", "20240101")) == ((30.0, 30.0, 2L, 1L, 15.0, None)))
    // Jan 5: Jan 1 still inside the trailing 7 days → sum 33 over 3 events
    assert(out(("u", "20240105")) == ((3.0, 33.0, 3L, 2L, 11.0, Some(-27.0))))
    // Jan 20: everything aged out — a ROWS frame would have kept 3 rows
    assert(out(("u", "20240120")) == ((5.0, 5.0, 1L, 1L, 5.0, Some(2.0))))
    assert(out(("v", "20240301")) == ((1.5, 1.5, 1L, 1L, 1.5, None)))
  }

  test("attribution: lookback ages touches out, strictly-before, (none) fallback") {
    import java.sql.Timestamp
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    val rows = Seq(
      // u1: view then click then purchase — first=view, last=click
      (1L, t("2024-01-01 08:00:00"), 10L, "view"),
      (2L, t("2024-01-02 09:00:00"), 10L, "click"),
      (3L, t("2024-01-03 10:00:00"), 10L, "purchase"),
      // u2: the only touch is 8 days before → aged out, (none)
      (4L, t("2024-02-01 08:00:00"), 20L, "view"),
      (5L, t("2024-02-09 09:00:00"), 20L, "purchase"),
      // u3: touch at the SAME microsecond as the purchase → excluded
      (6L, t("2024-03-01 12:00:00"), 30L, "click"),
      (7L, t("2024-03-01 12:00:00"), 30L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Behavior.attribution(
      rows, "user_id", "ts", "event_type", "event_id", "purchase", 7)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("first_touch", "view") -> 1L, ("first_touch", "(none)") -> 2L,
      ("last_touch", "click") -> 1L, ("last_touch", "(none)") -> 2L))
  }

  test("decayedEngagement: exact dyadic halving, clamped ages") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-31 12:00:00"), 1.00),  // age 1 -> w 1/2
      (1L, Timestamp.valueOf("2024-01-30 01:00:00"), 2.00),  // age 2 -> w 1/4
      (2L, Timestamp.valueOf("2020-01-01 00:00:00"), 100.0)  // age clamps to 31
    ).toDF("user_id", "ts", "value")
    val out = Behavior.decayedEngagement(df, "user_id", "ts", "value",
        "2024-02-01", 31)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val (n1, v1, c1) = out(1L)
    assert(n1 == 2L && v1 == 1.00 / 2 + 2.00 / 4 && c1 == 0.5 + 0.25)
    val (n2, v2, c2) = out(2L)
    assert(n2 == 1L && v2 == 100.0 / math.pow(2.0, 31) &&
      c2 == 1.0 / math.pow(2.0, 31))
  }

  test("sessionState merge law: bridged, non-bridged, and one-sided users") {
    def t(s: String) = Timestamp.valueOf(s)
    val gap = 1800000000L // 30 min in micros
    val a = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L),  // u1 session 1
      (1L, t("2024-01-01 10:10:00"), 2L),
      (2L, t("2024-01-01 09:00:00"), 3L),  // u2 session 1
      (3L, t("2024-01-01 08:00:00"), 4L)   // u3 only in batch A
    ).toDF("user_id", "ts", "event_id")
    val b = Seq(
      (1L, t("2024-01-01 10:20:00"), 5L),  // bridges u1's open session
      (1L, t("2024-01-01 12:00:00"), 6L),  // new session
      (2L, t("2024-01-01 11:00:00"), 7L),  // gap > 30m: NOT bridged
      (4L, t("2024-01-01 10:00:00"), 8L)   // u4 only in batch B
    ).toDF("user_id", "ts", "event_id")
    val merged = Behavior.mergeSessionState(
        Behavior.sessionState(a, "user_id", "ts", "event_id", gap),
        Behavior.sessionState(b, "user_id", "ts", "event_id", gap),
        "user_id", gap)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val onePass = Behavior.sessionState(a.unionByName(b),
        "user_id", "ts", "event_id", gap)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(merged == onePass)
    assert(merged(1L) == ((2L, 4L)), "bridge folds the straddling session")
    assert(merged(2L) == ((2L, 2L)))
    assert(merged(3L) == ((1L, 1L)) && merged(4L) == ((1L, 1L)))
  }
}
