package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference has no streaming layer — freshness is an hourly full
  * batch re-extract (SURVEY §1.3). These operators are the streaming
  * upgrade path: the same hourly rollup the batch query q24 computes,
  * expressed incrementally with watermarked state, plus session windows
  * via typed state (the batch twin is q26's lag-gap sessionization).
  *
  * Scale notes: state is partitioned by the group key (window×type /
  * user), so executors hold disjoint state shards; the watermark bounds
  * state size — without it the window store grows forever. Output mode
  * `update` for counters (append would wait for watermark closure).
  */
object EventStreams {

  /** Tumbling-window event counts + value sums per type, late data
    * tolerated up to `watermark`. */
  def hourlyRollup(
      events: DataFrame,
      watermark: String = "30 minutes",
      windowLength: String = "1 hour"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window rollup: like [[hourlyRollup]] but each event counts
    * into every window covering it (`windowLength` wide, sliding every
    * `slide`). State per (window, type) shard; the watermark still bounds
    * retention — windowLength/slide windows are open per instant. */
  def slidingRollup(
      events: DataFrame,
      watermark: String = "30 minutes",
      windowLength: String = "1 hour",
      slide: String = "15 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Per-window count-min sketch cells over a live feed — the streaming
    * twin of [[graft.ops.Sketches.cmsBuild]]: frequency summaries of an
    * UNBOUNDED item domain under BOUNDED state, which is exactly what a
    * raw per-item streaming count can't promise (its state grows with
    * distinct items; this holds ≤ depth×width cells per window, full
    * stop). Tumbling windows + watermark; emitted cells are
    * [[graft.ops.Sketches.cmsMerge]]-composable across windows and with
    * batch-built daily sketches — the lambda-architecture join the
    * tabular cell form exists for. Stream ≡ batch is pinned in
    * StreamingSpec (same cells, same counts, per window). */
  def sketchStream(
      events: DataFrame,
      itemCol: String,
      watermark: String = "30 minutes",
      windowLength: String = "1 hour",
      depth: Int = 4,
      width: Int = 1024
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("ts"),
        explode(graft.ops.Sketches.cmsCells(col(itemCol), depth, width)).as("__p"))
      .groupBy(window(col("ts"), windowLength),
        col("__p.cms_row").as("cms_row"), col("__p.cms_col").as("cms_col"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("cms_row"), col("cms_col"), col("cnt"))

  /** Session windows via the BUILT-IN `session_window` (gap-merged state
    * managed by the engine, fully codegen'd) — the declarative sibling of
    * [[sessionize]]'s typed flatMapGroupsWithState. Prefer this form when
    * the per-session output is plain aggregates; drop to typed state only
    * for custom in-session logic. */
  def sessionWindows(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "30 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup: drop re-deliveries of the same `event_id`
    * within the watermark horizon — the incremental twin of the batch
    * exact-dedup operator (`ops.Dedup.exact`, q30). State is one row per
    * id, partitioned by id, and expires with the watermark, so state size
    * is bounded by (event rate × watermark), not stream history. */
  def dedupStream(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: join each event against a batch dimension
    * (broadcast when small — same plan rules as batch). The streaming
    * analogue of the views' descriptor/lookup joins; no state is kept
    * because the static side is re-resolvable per micro-batch. */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-STREAM interval join — attribution at ingest time: each left
    * event matches right events of the same key whose timestamp lands in
    * `[left.ts, left.ts + horizon]` (view→purchase within 10 minutes,
    * impression→click, …). Both sides carry the same watermark, and the
    * time-bound condition is what lets Spark EXPIRE join state: a left
    * row can stop waiting once the watermark passes `ts + horizon`, a
    * right row once it can no longer fall in any live interval — state
    * is bounded by (rate × (watermark + horizon)), not stream history.
    * An unbounded-condition stream-stream join would keep both sides
    * forever; the interval bound IS the scalability contract.
    *
    * Inputs must not collide on column names except `keyCol`/`tsCol`
    * (rename upstream); the right timestamp comes back as `r_ts`.
    * Batch ≡ streaming asserted in StreamingSpec on the same rows. */
  def intervalJoinStream(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      horizon: String = "10 minutes",
      watermark: String = "30 minutes"
  ): DataFrame = {
    val collide = left.columns.toSet
      .intersect(right.columns.toSet) - keyCol - tsCol
    require(collide.isEmpty, s"rename colliding columns upstream: $collide")
    val l = left.withWatermark(tsCol, watermark)
    val r = right.withWatermark(tsCol, watermark)
      .withColumnRenamed(tsCol, "r_ts")
    l.join(r,
      l(keyCol) === r(keyCol) &&
        col("r_ts") >= l(tsCol) &&
        col("r_ts") <= l(tsCol) + expr(s"interval $horizon"))
      .drop(r(keyCol))
  }

  /** Durable gold sink: append the (already transformed) stream to
    * parquet with a checkpoint. Exactly-once lands via the checkpoint's
    * offset log + the sink's transactional file commit; restarts resume
    * from the last committed batch. `Trigger.AvailableNow` processes the
    * full backlog in bounded batches then stops — the pattern for running
    * a "streaming" pipeline as an incremental batch job on a schedule
    * (the reference's hourly full re-extract collapses into this). */
  def sinkToGold(
      transformed: DataFrame,
      path: String,
      checkpoint: String,
      availableNow: Boolean = true
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = transformed.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
    (if (availableNow)
      w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else w).start()
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class AsofState(rts: Long, value: Double)

  final case class AsofEnriched(event_id: Long, user_id: Long, ts: Timestamp,
      status_ts: Option[Timestamp], status_value: Option[Double])

  /** Streaming AS-OF enrichment — the incremental twin of the batch
    * `ops.Joins.asofJoin` (q63): one stream carries both dimension
    * changes (`isChange`) and fact events; every fact is emitted with
    * its key's latest change at-or-before its event time.
    *
    * State is ONE (ts, value) pair per key — bounded by key cardinality,
    * never by stream history (the batch form's running
    * `last(ignoreNulls)` window state, made durable across
    * micro-batches). Within a micro-batch, arrival order is irrelevant:
    * the group sorts by (ts, changes-first) so a same-instant change is
    * visible to the fact, exactly the batch operator's tie rule.
    *
    * Cross-batch semantics are forward-only: a change arriving AFTER a
    * later-timestamped fact was already emitted does not retro-correct
    * it (that would need retractions; batch replay via asofJoin is the
    * repair path). Delivered in event-time order per key — the shape of
    * any log-compacted CDC feed — the stream output EQUALS the batch
    * operator row for row (asserted in StreamingSpec). */
  def asofEnrich(
      events: Dataset[Event],
      isChange: Event => Boolean
  ): Dataset[AsofEnriched] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[AsofState]) => {
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, !isChange(e)))
          var cur = state.getOption
          val out = Seq.newBuilder[AsofEnriched]
          sorted.foreach { e =>
            if (isChange(e)) {
              if (cur.forall(_.rts <= e.ts.getTime))
                cur = Some(AsofState(e.ts.getTime, e.value))
            } else out += AsofEnriched(
              e.event_id, userId, e.ts,
              cur.map(s => new Timestamp(s.rts)), cur.map(_.value))
          }
          cur.foreach(state.update)
          out.result().iterator
        })
  }

  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long)

  final case class SessionSummary(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  final case class StatsState(
      cnt: Long, nV: Long, sum: Option[BigDecimal],
      minV: Option[Double], maxV: Option[Double])

  final case class KeyStats(
      user_id: Long, cnt: Long, n_v: Long, sum_v: Option[BigDecimal],
      min_v: Option[Double], max_v: Option[Double])

  /** Streaming running per-key statistics — the incremental twin of the
    * q78 batch state (`ops.Stats.partialStats`/`mergeStats`): the same
    * commutative-monoid fields (count / quantized-decimal sum / min /
    * max), kept durable in typed state and re-emitted per micro-batch.
    * After ANY prefix of the stream, a key's latest emitted row equals
    * the batch `partialStats` over the rows seen so far — asserted in
    * StreamingSpec across multiple micro-batches.
    *
    * Determinism note: each value is quantized to 12 decimals EXACTLY the
    * way Spark's `cast(v as decimal(38,12))` does it —
    * `BigDecimal.valueOf` (the Double's decimal string, not its binary
    * expansion) then HALF_UP — so the streaming sum is bit-equal to the
    * batch decimal sum, not merely close. Non-finite values follow the
    * batch semantics too: the cast yields null (no sum contribution,
    * but n_v still counts the non-null double), and min/max use Spark's
    * double ordering (NaN sorts LARGEST; `math.min`/`math.max` would
    * propagate NaN into min and diverge).
    *
    * Scale shape: state is one small row per key, partitioned by key;
    * no watermark needed because the state never grows with history —
    * it IS the aggregate. */
  def runningStats(events: Dataset[Event]): Dataset[KeyStats] = {
    import events.sparkSession.implicits._
    def quantize(v: Double): Option[BigDecimal] =
      if (java.lang.Double.isFinite(v))
        Some(BigDecimal(java.math.BigDecimal.valueOf(v)
          .setScale(12, java.math.RoundingMode.HALF_UP)))
      else None // cast(NaN/Inf as decimal) is null — sum skips it
    // Spark's total order on doubles: NaN largest, -0.0 < 0.0
    def lesser(a: Double, b: Double) =
      if (java.lang.Double.compare(a, b) <= 0) a else b
    def greater(a: Double, b: Double) =
      if (java.lang.Double.compare(a, b) >= 0) a else b
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[StatsState]) => {
          var s = state.getOption.getOrElse(
            StatsState(0L, 0L, None, None, None))
          batch.foreach { e =>
            s = StatsState(
              s.cnt + 1,
              s.nV + 1,
              quantize(e.value)
                .map(q => s.sum.getOrElse(BigDecimal(0)) + q)
                .orElse(s.sum), // all-skipped group stays null, like SUM
              Some(s.minV.fold(e.value)(lesser(_, e.value))),
              Some(s.maxV.fold(e.value)(greater(_, e.value))))
          }
          state.update(s)
          KeyStats(userId, s.cnt, s.nV, s.sum, s.minV, s.maxV)
        })
  }


  /** Session windows per user with a gap timeout: a session closes after
    * `gapMs` of silence (event-time via watermark + processing-time
    * timeout), emitting one summary row. The typed-state analogue of the
    * batch lag-gap sessionization (q26). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(
              userId, new Timestamp(s.start), new Timestamp(s.lastSeen), s.nEvents))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionSummary]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(s.copy(lastSeen = math.max(s.lastSeen, t), nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed ::= SessionSummary(
                    userId, new Timestamp(s.start), new Timestamp(s.lastSeen), s.nEvents)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMs)
            }
            closed.reverseIterator
          }
        })
  }

  final case class LastEvent(ts: Long, eventId: Long, tpe: String)

  final case class FunnelState(times: List[Long])

  final case class FunnelTimes(user_id: Long, times: Seq[Option[Long]])

  /** Streaming twin of [[graft.ops.Behavior.funnelUserTimes]]: per-user
    * ordered-funnel step times maintained incrementally — state is one
    * fixed-length list of epoch-micros per user (step k's earliest
    * completion after step k-1, within `withinUs` of step 0), updated
    * per arriving event and emitted in Update mode whenever it
    * improves. On an in-order per-user feed the final emission per
    * user equals the batch operator's row (StreamingSpec).
    *
    * The update rule is the batch semantics restated incrementally: an
    * event of step-k type claims slot k iff slot k is open (or this is
    * earlier — can't happen in-order), slot k-1 is filled with an
    * earlier time, and the window bound holds. State is O(k) longs per
    * user — the same bounded-by-population shape as [[transitionPairs]]. */
  def funnelTimes(
      events: Dataset[Event],
      steps: Seq[String],
      withinUs: Option[Long] = None
  ): Dataset[FunnelTimes] = {
    import events.sparkSession.implicits._
    val k = steps.size
    require(k >= 1, "funnel needs at least one step")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) => {
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var times = state.getOption.map(_.times)
            .getOrElse(List.fill(k)(Long.MinValue))
            .toArray // MinValue = unfilled
          var changed = false
          sorted.foreach { e =>
            val us = e.ts.getTime * 1000L
            val idx = steps.indexOf(e.event_type)
            if (idx >= 0 && times(idx) == Long.MinValue) {
              val prevOk = idx == 0 ||
                (times(idx - 1) != Long.MinValue && us > times(idx - 1))
              val windowOk = withinUs.forall(w =>
                idx == 0 || (times(0) != Long.MinValue && us <= times(0) + w))
              if (prevOk && windowOk) { times(idx) = us; changed = true }
            }
          }
          if (changed) {
            state.update(FunnelState(times.toList))
            Iterator.single(FunnelTimes(userId,
              times.toSeq.map(t => if (t == Long.MinValue) None else Some(t))))
          } else Iterator.empty
        })
  }

  final case class Transition(user_id: Long, from_state: String, to_state: String)

  /** Streaming twin of [[graft.ops.Behavior.transitions]]: one
    * (from_state, to_state) pair per arriving event, with `(start)`
    * for a user's first-ever event — per-user last-event state, the
    * incremental form of the batch lag window. Aggregating the emitted
    * pairs reproduces the batch transition matrix exactly when each
    * user's events arrive in order (the partition-by-user log
    * contract); within a micro-batch, arrival order is normalized by
    * (ts, event_id) sort, so batch boundaries don't reorder ties.
    *
    * State is ONE (ts, event_id, type) triple per user — bounded by
    * the user population, not the stream length, the same shard-by-key
    * discipline as [[sessionize]] (no timeout: a user's chain head
    * stays valid forever; evict via TTL config if the key space churns). */
  def transitionPairs(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[LastEvent]) => {
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var prev = state.getOption
          val out = sorted.map { e =>
            val t = Transition(userId, prev.map(_.tpe).getOrElse("(start)"),
              e.event_type)
            prev = Some(LastEvent(e.ts.getTime, e.event_id, e.event_type))
            t
          }
          prev.foreach(state.update)
          out.iterator
        })
  }

  /** Windowed drift monitor against a FROZEN baseline — the live twin of
    * [[graft.ops.Stats.driftReport]]: per tumbling window, total
    * variation distance between the window's value distribution and a
    * baseline bucket-share map computed offline (yesterday's corpus, the
    * training distribution). Buckets are the integer-exact binary-digit
    * bins the batch op uses; the whole monitor is ONE windowed aggregate
    * (a fixed counter per bucket — the [[graft.streaming.DocumentStreams
    * .auditStream]] one-stateful-op discipline, no chained aggregation),
    * and the TVD folds the counters in fixed bucket order, so stream ≡
    * batch to the last bit (StreamingSpec). Alert on tvd crossing a
    * threshold; 0.5 means disjoint distributions. */
  def driftStream(
      events: DataFrame,
      valueCol: String,
      baselineShares: Map[Long, Double],
      tsCol: String = "ts",
      windowDur: String = "1 hour",
      watermark: String = "30 minutes",
      maxBucket: Int = 40
  ): DataFrame = {
    require(baselineShares.keys.forall(b => b >= 0 && b <= maxBucket),
      s"baseline bucket outside [0, $maxBucket]")
    val v = col(valueCol)
    val bucket = when(v <= 0, lit(0L))
      .otherwise(length(bin(v.cast("long"))).cast("long"))
    val counters = (0 to maxBucket).map(b =>
      sum(when(bucket === b.toLong, 1L).otherwise(0L)).as(s"__b$b"))
    val agg = events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(counters.head, counters.tail: _*)
    val n = (0 to maxBucket).map(b => col(s"__b$b")).reduce(_ + _)
    val tvd = (0 to maxBucket).map { b =>
      val q = baselineShares.getOrElse(b.toLong, 0.0)
      abs(col(s"__b$b").cast("double") / col("__n").cast("double") - lit(q))
    }.reduce(_ + _) * 0.5d
    agg
      .withColumn("__n", n)
      .select(
        col("window.start").as("window_start"),
        col("__n").as("n_rows"),
        tvd.as("tvd"))
  }

  final case class Admitted(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, admitted_n: Long)

  /** Per-key admission quota on the Spark 4 `transformWithState` API —
    * the arbitrary-state successor of flatMapGroupsWithState, backed by
    * the RocksDB state store: admit at most `maxPerKey` events per user
    * for the stream's lifetime (billing caps, abuse guards, per-source
    * crawl budgets), drop the rest AT THE STATE LAYER so nothing
    * downstream pays for them. State is ONE ValueState[Long] counter per
    * key — typed, schema-evolvable, and independent of event volume; the
    * processor materializes each key's admissions before updating the
    * counter once per batch. Admitted events carry their admission
    * ordinal (`admitted_n`), which also makes the op's determinism
    * testable: ordinals are contiguous per key regardless of batch
    * boundaries. StreamingSpec drives it across TWO batches to prove the
    * counter survives micro-batch restarts. */
  class QuotaProcessor(maxPerKey: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, Admitted] {
    @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      count = getHandle.getValueState[Long]("count",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[Admitted] = {
      var c = if (count.exists()) count.get() else 0L
      val out = scala.collection.mutable.ListBuffer.empty[Admitted]
      rows.foreach { e =>
        if (c < maxPerKey) {
          c += 1
          out += Admitted(e.event_id, e.ts, e.user_id, e.event_type, e.value, c)
        }
      }
      count.update(c)
      out.iterator
    }
  }

  final case class OpenSession(startMs: Long, lastMs: Long, nEvents: Long)
  final case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Timer-driven sessionization on `transformWithState` — the part of
    * the Spark 4 arbitrary-state API the quota gate doesn't touch:
    * EVENT-TIME TIMERS. Each user's open session lives in one ValueState;
    * every batch re-arms a single timer at `lastSeen + gap`, and the
    * session is emitted from `handleExpiredTimer` when the WATERMARK
    * (not wall time) passes it — so emission is deterministic under
    * replay, late batches extend the session instead of splitting it,
    * and state cannot outlive `gap` past the last event. The
    * flatMapGroupsWithState twin ([[sessionize]]) carries its own
    * timeout bookkeeping; here the engine owns it. */
  class SessionTimeoutProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, ClosedSession] {
    @transient private var open: org.apache.spark.sql.streaming.ValueState[OpenSession] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("open",
        org.apache.spark.sql.Encoders.product[OpenSession],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[ClosedSession] = {
      var cur = if (open.exists()) open.get() else null
      rows.foreach { e =>
        val t = e.ts.getTime
        cur =
          if (cur == null) OpenSession(t, t, 1L)
          else OpenSession(math.min(cur.startMs, t), math.max(cur.lastMs, t),
            cur.nEvents + 1L)
      }
      if (cur != null) {
        open.update(cur)
        // one armed timer per key: re-arm at the new horizon
        getHandle.listTimers().foreach(ts => getHandle.deleteTimer(ts.asInstanceOf[Long]))
        getHandle.registerTimer(cur.lastMs + gapMs)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long,
        timers: org.apache.spark.sql.streaming.TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (!open.exists()) Iterator.empty
      else {
        val s = open.get()
        open.clear()
        Iterator.single(ClosedSession(key,
          new Timestamp(s.startMs), new Timestamp(s.lastMs), s.nEvents))
      }
    }
  }

  /** Sessionize a typed stream with engine-owned event-time timers.
    * Input must be watermarked upstream (`withWatermark` before the
    * typed conversion); requires the RocksDB state store. */
  def sessionTimeoutStream(
      events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L
  ): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionTimeoutProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Apply the quota gate to a typed event stream. Requires the RocksDB
    * state store provider (set in the caller's session conf —
    * `transformWithState` does not run on the default HDFS-backed
    * store). */
  def quotaGate(events: Dataset[Event], maxPerKey: Long): Dataset[Admitted] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new QuotaProcessor(maxPerKey),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  final case class EwmaBuf(cents: List[Long], n: Long)
  final case class EwmaLevel(user_id: Long, n_events: Long,
      ewma_num: Long, ewma_den: Long, ewma: Double)

  /** Streaming twin of [[graft.ops.Series.ewmaLast]]: per key, the EWMA
    * level (α = 1/2, exact power-of-two weights) maintained as typed
    * state — a List of the last `window` cent values, newest first, plus
    * the lifetime count. Each batch appends its rows in (ts, event_id)
    * order, trims to `window`, and emits the key's refreshed level, so
    * the LAST emission per key equals the batch operator on the full
    * feed (StreamingSpec pins stream ≡ batch across micro-batch
    * boundaries). Serving contract: the feed is event-time ordered per
    * key — the q225/q229 lateness profile is how a deployment checks
    * that assumption and sizes its watermark; out-of-order rows here
    * would smooth in arrival order, exactly like any production metrics
    * pipeline. State per key is `window` longs — independent of volume. */
  class EwmaProcessor(window: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, EwmaLevel] {
    @transient private var buf: org.apache.spark.sql.streaming.ValueState[EwmaBuf] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      buf = getHandle.getValueState[EwmaBuf]("buf",
        org.apache.spark.sql.Encoders.product[EwmaBuf],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[EwmaLevel] = {
      val batch = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      if (batch.isEmpty) Iterator.empty
      else {
        val prev = if (buf.exists()) buf.get() else EwmaBuf(Nil, 0L)
        // the same HALF_UP cents rounding as round(value * 100, 0)
        val appended = batch.foldLeft(prev.cents) { (acc, e) =>
          (java.math.BigDecimal.valueOf(e.value * 100.0)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue :: acc)
            .take(window)
        }
        val next = EwmaBuf(appended, prev.n + batch.size)
        buf.update(next)
        val num = next.cents.zipWithIndex
          .map { case (c, j) => c * (1L << (window - 1 - j)) }.sum
        val den = next.cents.indices.map(j => 1L << (window - 1 - j)).sum
        Iterator.single(EwmaLevel(key, next.n, num, den,
          num.toDouble / den.toDouble / 100.0))
      }
    }
  }

  /** Apply the streaming EWMA to a typed event stream (RocksDB state
    * store required, as for [[quotaGate]]). Emits one refreshed level
    * per key per batch; downstream keeps the latest. */
  def ewmaStream(events: Dataset[Event], window: Int = 10): Dataset[EwmaLevel] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new EwmaProcessor(window),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }
}
