package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Lake

/** Data-profiling coverage: q224 one-pass multi-column table profiling
  * (the ANALYZE-style statistics every cost-based planner and data
  * catalog needs) and q225 the out-of-order arrival profile (the
  * empirical input to a Structured Streaming watermark choice). */
object ProfileQueries {

  // --------------------------------------------------------------- q224
  /** Per-column n_rows / n_nulls / exact NDV / min / max over lineitem in
    * ONE scan: all aggregates live in a single agg (Spark plans the six
    * count-distincts via one Expand — data is read once, expanded ×6
    * in-memory, never rescanned), then the wide row unpivots into one row
    * per column. min/max surface as doubles for the numeric columns
    * (exact casts, no sums) and NULL for the string column — doubles
    * never round-trip through strings, whose formatting differs across
    * engines. The oracle states the spec as per-column scans; the hash
    * gate proves one-pass ≡ six-pass. */
  private val NumCols =
    Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
      "l_discount")

  private val q224 = Q(
    "q224_table_profile",
    (s, dir) => {
      val li = Lake(s, dir).lineitem
      val aggs = NumCols.flatMap(c => Seq(
        count(col(c)).as(s"__cnt_$c"),
        count_distinct(col(c)).as(s"__ndv_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))) ++ Seq(
        count(col("l_returnflag")).as("__cnt_l_returnflag"),
        count_distinct(col("l_returnflag")).as("__ndv_l_returnflag"))
      val row = li.agg(count(lit(1)).as("__n"), aggs: _*)
      val entries = NumCols.map(c => struct(
        lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__ndv_$c").as("ndv"),
        col(s"__min_$c").as("min_val"), col(s"__max_$c").as("max_val"))) :+
        struct(lit("l_returnflag").as("col_name"), col("__n").as("n_rows"),
          (col("__n") - col("__cnt_l_returnflag")).as("n_nulls"),
          col("__ndv_l_returnflag").as("ndv"),
          lit(null).cast("double").as("min_val"),
          lit(null).cast("double").as("max_val"))
      row.select(explode(array(entries: _*)).as("__e")).select("__e.*")
        .orderBy("col_name")
    },
    Some {
      val numeric = NumCols.map(c => s"""
        SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT $c) AS BIGINT) AS ndv,
               CAST(MIN($c) AS DOUBLE) AS min_val,
               CAST(MAX($c) AS DOUBLE) AS max_val
        FROM lineitem""").mkString("\n        UNION ALL")
      s"""
      SELECT * FROM (
        $numeric
        UNION ALL
        SELECT 'l_returnflag', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT),
               CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM lineitem)
      ORDER BY col_name"""
    }
  )

  // --------------------------------------------------------------- q225
  /** Out-of-orderness profile per user: arrival order is event time
    * jittered by (event_id % 7) hours (the events table arrives perfectly
    * sorted, so the network/retry delay a real collector sees is
    * simulated deterministically — ~9% of rows arrive late at sf0.01);
    * lateness of a row = high-water-mark of event time among EARLIER
    * arrivals minus its own event time. The per-user aggregate
    * (count / late count / max / total lateness) is exactly what sizes a
    * streaming watermark: `withWatermark(max observed lateness + margin)`.
    * One hash(user) window over arrival order — micro-arithmetic on exact
    * longs throughout. */
  private val q225 = Q(
    "q225_out_of_order_profile",
    (s, dir) => {
      import org.apache.spark.sql.expressions.{Window => W}
      val arr = unix_micros(col("ts")) +
        pmod(col("event_id"), lit(7)) * lit(3600000000L)
      val w = W.partitionBy("user_id").orderBy("__arr", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
      Lake(s, dir).events
        .withColumn("__tsus", unix_micros(col("ts")))
        .withColumn("__arr", arr)
        .withColumn("__hwm", max(col("__tsus")).over(w))
        .withColumn("__late",
          when(col("__hwm").isNotNull && col("__hwm") > col("__tsus"),
            col("__hwm") - col("__tsus")).otherwise(lit(0L)))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("__late") > 0, 1L).otherwise(0L)).as("n_late"),
          max(col("__late")).as("max_late_us"),
          sum(col("__late")).as("total_late_us"))
        .orderBy("user_id")
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsus,
                   epoch_us(ts) + (event_id % 7) * 3600000000 AS arr
                 FROM events),
      h AS (SELECT user_id,
              MAX(tsus) OVER (PARTITION BY user_id ORDER BY arr, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm,
              tsus
            FROM e),
      l AS (SELECT user_id,
              CASE WHEN hwm IS NOT NULL AND hwm > tsus THEN hwm - tsus
                   ELSE 0 END AS late
            FROM h)
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
             CAST(MAX(late) AS BIGINT) AS max_late_us,
             CAST(SUM(late) AS BIGINT) AS total_late_us
      FROM l GROUP BY user_id ORDER BY user_id""")
  )

  // --------------------------------------------------------------- q229
  /** Per-user discrete lateness quantiles over the q225 arrival model —
    * the actionable output: `withWatermark(p95 late + margin)` per
    * ingest key. Quantiles are DISCRETE (smallest value at
    * cume_dist ≥ p, the q121 threshold algebra) so no interpolation
    * arithmetic can drift between engines; every window partitions by
    * user — no global ordering anywhere. */
  private val q229 = Q(
    "q229_late_quantiles",
    (s, dir) => {
      import org.apache.spark.sql.expressions.{Window => W}
      val arr = unix_micros(col("ts")) +
        pmod(col("event_id"), lit(7)) * lit(3600000000L)
      val wArr = W.partitionBy("user_id").orderBy("__arr", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
      val wCd = W.partitionBy("user_id").orderBy("__late")
      val wAll = W.partitionBy("user_id")
      Lake(s, dir).events
        .withColumn("__tsus", unix_micros(col("ts")))
        .withColumn("__arr", arr)
        .withColumn("__hwm", max(col("__tsus")).over(wArr))
        .withColumn("__late",
          when(col("__hwm").isNotNull && col("__hwm") > col("__tsus"),
            col("__hwm") - col("__tsus")).otherwise(lit(0L)))
        .withColumn("__cd", cume_dist().over(wCd))
        .withColumn("p50_late_us",
          min(when(col("__cd") >= 0.5, col("__late"))).over(wAll))
        .withColumn("p95_late_us",
          min(when(col("__cd") >= 0.95, col("__late"))).over(wAll))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("__late") > 0, 1L).otherwise(0L)).as("n_late"),
          first(col("p50_late_us")).as("p50_late_us"),
          first(col("p95_late_us")).as("p95_late_us"),
          max(col("__late")).as("max_late_us"))
        .orderBy("user_id")
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsus,
                   epoch_us(ts) + (event_id % 7) * 3600000000 AS arr
                 FROM events),
      h AS (SELECT user_id,
              MAX(tsus) OVER (PARTITION BY user_id ORDER BY arr, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm,
              tsus
            FROM e),
      l AS (SELECT user_id,
              CASE WHEN hwm IS NOT NULL AND hwm > tsus THEN hwm - tsus
                   ELSE 0 END AS late
            FROM h),
      cd AS (SELECT user_id, late,
               cume_dist() OVER (PARTITION BY user_id ORDER BY late) AS c
             FROM l),
      th AS (SELECT user_id, late,
               MIN(CASE WHEN c >= 0.5 THEN late END)
                 OVER (PARTITION BY user_id) AS p50,
               MIN(CASE WHEN c >= 0.95 THEN late END)
                 OVER (PARTITION BY user_id) AS p95
             FROM cd)
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
             CAST(MIN(p50) AS BIGINT) AS p50_late_us,
             CAST(MIN(p95) AS BIGINT) AS p95_late_us,
             CAST(MAX(late) AS BIGINT) AS max_late_us
      FROM th GROUP BY user_id ORDER BY user_id""")
  )

  val all: Seq[Q] = Seq(q224, q225, q229)
}
