package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Lake
import graft.ops.{Intervals, MultiDim, Stats}

/** OLAP + lake-governance coverage: the subtotal lattice
  * ([[graft.ops.MultiDim]]), closed-interval union/coverage
  * ([[graft.ops.Intervals]]) and exact k-sigma outlier counts
  * ([[graft.ops.Stats.sigmaOutliers]]) — the three round-5 operators that
  * shipped without gates (and, for MultiDim, without working: the alias
  * round-trip broke on Spark 4's ColumnNode — ADVICE r5) — plus the
  * declarative data-quality audit ([[graft.ops.Audit]], q118) and the
  * additive schema-evolution read contract (q119). Each oracle states the
  * identical algebra in DuckDB SQL; the hash gate is what proves the
  * window/Expand/audit formulations ARE the textbook definitions.
  */
object OlapQueries {

  // --------------------------------------------------------------- q115
  /** Revenue rollup over (status, priority): the full hierarchy —
    * per-(status, priority), per-status subtotals, grand total — in ONE
    * Expand + hash-aggregate pass, subtotal rows labeled 'ALL' from the
    * grouping() bit (not coalesce — correct even if the data held NULLs).
    * The money sum goes through DECIMAL (exact, order-independent) and
    * leaves as double. */
  private val q115 = Q(
    "q115_rollup_revenue",
    (s, dir) =>
      MultiDim.rollupAgg(
        Lake(s, dir).orders,
        Seq("o_orderstatus", "o_orderpriority"),
        Seq(
          sum(col("o_totalprice").cast("decimal(38,2)")).cast("double")
            .as("revenue"),
          count(lit(1)).as("n_orders")))
        .orderBy("o_orderstatus", "o_orderpriority"),
    Some("""
      SELECT
        CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
             ELSE CAST(o_orderstatus AS VARCHAR) END AS o_orderstatus,
        CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
             ELSE CAST(o_orderpriority AS VARCHAR) END AS o_orderpriority,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_orders
      FROM orders
      GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus, o_orderpriority""")
  )

  /** q116's fixture: one closed integer interval per event — start = the
    * event's epoch-day, extent = event_id mod 7 days. Deterministic in
    * both engines, and dense enough per user that blocks actually merge. */
  private def eventIntervals(s: org.apache.spark.sql.SparkSession, dir: String) =
    Lake(s, dir).events.select(
      col("user_id"),
      datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
        .cast("long").as("start_d"),
      (datediff(to_date(col("ts")), to_date(lit("1970-01-01"))) +
        pmod(col("event_id"), lit(7))).cast("long").as("end_d"))

  // --------------------------------------------------------------- q116
  /** Per-user coverage of merged closed intervals — distinct active days
    * from overlapping/adjacent activity windows, the gaps-and-islands
    * union in one hash(user) exchange. Closed semantics throughout:
    * adjacent blocks ([1,3],[4,6]) merge, each block covers
    * end − start + 1 days. */
  private val q116 = Q(
    "q116_interval_coverage",
    (s, dir) =>
      Intervals.coverage(
        eventIntervals(s, dir), Seq("user_id"), "start_d", "end_d")
        .orderBy("user_id"),
    Some("""
      WITH iv AS (
        SELECT user_id,
          CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
            AS start_d,
          CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
            + event_id % 7 AS BIGINT) AS end_d
        FROM events),
      marked AS (
        SELECT user_id, start_d, end_d,
          CASE WHEN MAX(end_d) OVER w IS NULL
                 OR start_d > MAX(end_d) OVER w + 1
               THEN 1 ELSE 0 END AS opens
        FROM iv
        WINDOW w AS (PARTITION BY user_id ORDER BY start_d, end_d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      blocks AS (
        SELECT user_id, start_d, end_d,
          SUM(opens) OVER (PARTITION BY user_id ORDER BY start_d, end_d
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS block
        FROM marked),
      merged AS (
        SELECT user_id, block,
          MIN(start_d) AS block_start, MAX(end_d) AS block_end
        FROM blocks GROUP BY user_id, block)
      SELECT user_id, COUNT(*) AS n_blocks,
        CAST(SUM(block_end - block_start + 1) AS BIGINT) AS covered
      FROM merged GROUP BY user_id ORDER BY user_id""")
  )

  // --------------------------------------------------------------- q117
  /** Per-event-type 2-sigma outlier counts over micros-scaled values —
    * integer-exact inequality (no floating sqrt/mean), one shuffle. The
    * oracle states the SAME cleared-of-denominators test in HUGEINT; the
    * Spark side runs it pivot-shifted in DECIMAL(38,0) (shift-invariant,
    * so the hash gate proves the two formulations identical). */
  private val q117 = Q(
    "q117_sigma_outliers",
    (s, dir) =>
      Stats.sigmaOutliers(
        Lake(s, dir).events
          .select(col("event_type"),
            floor(col("value") * lit(1000000.0)).cast("long").as("v_us")),
        Seq("event_type"), "v_us", k = 2)
        .orderBy("event_type"),
    Some("""
      WITH vals AS (
        SELECT event_type,
          CAST(FLOOR(value * 1000000.0) AS HUGEINT) AS x
        FROM events),
      sums AS (
        SELECT event_type,
          CAST(COUNT(*) AS HUGEINT) AS n,
          SUM(x) AS s,
          SUM(x * x) AS ss
        FROM vals GROUP BY event_type),
      flags AS (
        SELECT vals.event_type,
          CASE WHEN sums.n >= 2 AND
            (sums.n * vals.x - sums.s) * (sums.n * vals.x - sums.s)
              * (sums.n - 1)
              > 4 * sums.n * (sums.n * sums.ss - sums.s * sums.s)
          THEN 1 ELSE 0 END AS is_out
        FROM vals JOIN sums USING (event_type))
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(is_out) AS BIGINT) AS n_outliers
      FROM flags GROUP BY event_type ORDER BY event_type""")
  )

  // --------------------------------------------------------------- q118
  /** Data-quality audit over orders: five declarative constraints —
    * three row checks folded into ONE aggregate scan, a key-uniqueness
    * shuffle (key columns only), and a broadcast anti-join FK probe
    * against customer. One row per check, `(check_name, violations, rows_checked)`. The fixture plants violations deterministically
    * (every 97th order gets an out-of-range price and a dangling
    * custkey; every 101st duplicates its key) so each family's counter
    * is exercised above zero. */
  private val q118 = Q(
    "q118_quality_audit",
    (s, dir) => {
      val lake = Lake(s, dir)
      val base = lake.orders.select(
        when(pmod(col("o_orderkey"), lit(101)) === 0, lit(1L))
          .otherwise(col("o_orderkey")).as("o_orderkey"),
        when(pmod(col("o_orderkey"), lit(97)) === 0, col("o_custkey") * lit(-1))
          .otherwise(col("o_custkey")).as("o_custkey"),
        when(pmod(col("o_orderkey"), lit(97)) === 0, lit(-1.0))
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        col("o_orderstatus"))
      graft.ops.Audit.audit(base, Seq(
        graft.ops.Audit.NotNull("o_custkey"),
        graft.ops.Audit.InRange("o_totalprice", 0.0, 1e9),
        graft.ops.Audit.Satisfies("status_known",
          col("o_orderstatus").isin("O", "F", "P")),
        graft.ops.Audit.UniqueKey(Seq("o_orderkey")),
        graft.ops.Audit.RefIntegrity("o_custkey", lake.customer, "c_custkey")))
    },
    Some("""
      WITH base AS (
        SELECT
          CASE WHEN o_orderkey % 101 = 0 THEN 1
               ELSE o_orderkey END AS o_orderkey,
          CASE WHEN o_orderkey % 97 = 0 THEN o_custkey * -1
               ELSE o_custkey END AS o_custkey,
          CASE WHEN o_orderkey % 97 = 0 THEN -1.0
               ELSE o_totalprice END AS o_totalprice,
          o_orderstatus
        FROM orders),
      n AS (SELECT COUNT(*) AS rows_checked FROM base)
      SELECT 'check:status_known' AS check_name,
        CAST(COUNT(*) FILTER (WHERE NOT COALESCE(
          o_orderstatus IN ('O','F','P'), FALSE)) AS BIGINT) AS violations,
        rows_checked
      FROM base CROSS JOIN n GROUP BY rows_checked
      UNION ALL
      SELECT 'fk:o_custkey' AS check_name,
        CAST((SELECT COUNT(*) FROM base b
          WHERE b.o_custkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = b.o_custkey)) AS BIGINT),
        rows_checked FROM n
      UNION ALL
      SELECT 'not_null:o_custkey' AS check_name,
        CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT),
        rows_checked
      FROM base CROSS JOIN n GROUP BY rows_checked
      UNION ALL
      SELECT 'range:o_totalprice' AS check_name,
        CAST(COUNT(*) FILTER (WHERE COALESCE(
          o_totalprice < 0.0 OR o_totalprice > 1e9, FALSE)) AS BIGINT),
        rows_checked
      FROM base CROSS JOIN n GROUP BY rows_checked
      UNION ALL
      SELECT 'unique:o_orderkey' AS check_name,
        CAST(COALESCE((SELECT SUM(c) FROM (
          SELECT COUNT(*) AS c FROM base GROUP BY o_orderkey
          HAVING COUNT(*) > 1)), 0) AS BIGINT),
        rows_checked FROM n
      ORDER BY check_name""")
  )

  // --------------------------------------------------------------- q119
  /** Schema-evolution round trip — the lake reality that a corpus's
    * schema GROWS over deliveries: batch 1 lands (doc_id, text), batch 2
    * adds a `lang` column; a mergeSchema read must see the union schema
    * with NULL backfill for the early batch, and the result must
    * hash-equal the oracle's direct statement of that semantics. Pins
    * the exact read options that make additive evolution safe (the
    * default read takes ONE file's footer and would silently drop or
    * misread `lang`). */
  private val q119 = Q(
    "q119_schema_evolution",
    (s, dir) => {
      val docs = Lake(s, dir).documents
      val tmp = java.nio.file.Files.createTempDirectory("graft-q119").toString
      graft.core.SilverWriter.deleteOnExit(tmp)
      docs.filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(s"$tmp/evolved/batch=1")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"), col("lang"))
        .write.mode("overwrite").parquet(s"$tmp/evolved/batch=2")
      s.read.option("mergeSchema", "true").parquet(s"$tmp/evolved")
        .select("doc_id", "text", "lang")
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, text,
        CASE WHEN doc_id % 2 = 1 THEN lang ELSE NULL END AS lang
      FROM documents ORDER BY doc_id""")
  )

  // --------------------------------------------------------------- q121
  /** Per-group winsorization of event values at the [p05, p95] discrete
    * quantiles — clipped values are existing data points (no
    * interpolation), so the row-wise output is bit-exact across engines.
    * The oracle states the identical cume_dist + conditional-min
    * threshold algebra. */
  private val q121 = Q(
    "q121_winsorize",
    (s, dir) =>
      Stats.winsorize(
        Lake(s, dir).events.select("event_id", "event_type", "value"),
        Seq("event_type"), "value", 0.05, 0.95)
        .filter(col("event_id") < 2000)
        .select("event_id", "event_type", "value", "v_clipped")
        .orderBy("event_id"),
    Some("""
      WITH cd AS (
        SELECT event_id, event_type, value,
          cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS c
        FROM events),
      th AS (
        SELECT event_id, event_type, value,
          MIN(CASE WHEN c >= 0.05 THEN value END)
            OVER (PARTITION BY event_type) AS lo,
          MIN(CASE WHEN c >= 0.95 THEN value END)
            OVER (PARTITION BY event_type) AS hi
        FROM cd)
      SELECT event_id, event_type, value,
        CASE WHEN value < lo THEN lo
             WHEN value > hi THEN hi
             ELSE value END AS v_clipped
      FROM th WHERE event_id < 2000 ORDER BY event_id""")
  )

  // --------------------------------------------------------------- q122
  /** Robust (median/MAD) outlier counts per event type — the
    * heavy-tail-safe twin of q117: |x − median| > 3·MAD with BOTH medians
    * discrete (smallest value at cume_dist ≥ 0.5), so every comparison
    * is between doubles copied from the data. Two window sorts on one
    * hash(event_type) exchange. */
  private val q122 = Q(
    "q122_robust_outliers",
    (s, dir) =>
      Stats.robustOutliers(
        Lake(s, dir).events.select("event_type", "value"),
        Seq("event_type"), "value", k = 3.0)
        .orderBy("event_type"),
    Some("""
      WITH med AS (
        SELECT event_type, value,
          MIN(CASE WHEN c >= 0.5 THEN value END)
            OVER (PARTITION BY event_type) AS m
        FROM (SELECT event_type, value,
                cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS c
              FROM events)),
      dev AS (
        SELECT event_type, value, m, ABS(value - m) AS d FROM med),
      mad AS (
        SELECT event_type, value, m, d,
          MIN(CASE WHEN cd >= 0.5 THEN d END)
            OVER (PARTITION BY event_type) AS md
        FROM (SELECT *,
                cume_dist() OVER (PARTITION BY event_type ORDER BY d) AS cd
              FROM dev))
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CASE WHEN d > 3.0 * md THEN 1 ELSE 0 END) AS BIGINT)
          AS n_outliers
      FROM mad GROUP BY event_type ORDER BY event_type""")
  )

  // --------------------------------------------------------------- q123
  /** Equi-depth histogram of event values per event type (8 buckets):
    * the skew-proof distribution statistic — each bucket holds ≈ n/8
    * rows, boundaries are data points. Bucket = ⌈cume_dist · 8⌉, so ties
    * can never straddle a boundary and both engines assign identically. */
  private val q123 = Q(
    "q123_equidepth_histogram",
    (s, dir) =>
      Stats.equiDepthHistogram(
        Lake(s, dir).events.select("event_type", "value"),
        Seq("event_type"), "value", k = 8)
        .orderBy("event_type", "bucket"),
    Some("""
      WITH cd AS (
        SELECT event_type, value,
          cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS c
        FROM events)
      SELECT event_type,
        CAST(LEAST(CEIL(c * 8), 8) AS BIGINT) AS bucket,
        COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi
      FROM cd GROUP BY event_type, bucket
      ORDER BY event_type, bucket""")
  )

  // --------------------------------------------------------------- q124
  /** Key-skew diagnostic promoted to the oracle gate: top-10 heaviest
    * order customers with share and skew ratio — the measurement that
    * decides salting vs AQE before any 100 TB join
    * ([[graft.ops.Stats.keySkew]], previously unit-tested only). */
  private val q124 = Q(
    "q124_key_skew",
    (s, dir) =>
      Stats.keySkew(Lake(s, dir).orders, "o_custkey", topN = 10),
    Some("""
      WITH counts AS (
        SELECT o_custkey AS k0, COUNT(*) AS n FROM orders GROUP BY 1),
      t AS (SELECT CAST(SUM(n) AS BIGINT) AS total_rows,
                   COUNT(*) AS n_keys FROM counts)
      SELECT CAST(k0 AS VARCHAR) AS key, n,
        CAST(n AS DOUBLE) / total_rows AS share,
        CAST(n AS DOUBLE) * n_keys / total_rows AS skew_ratio
      FROM counts CROSS JOIN t
      ORDER BY n DESC, k0 LIMIT 10""")
  )

  // --------------------------------------------------------------- q129
  /** Daily gap-filled state per user ([[graft.ops.Behavior.gapFillDaily]]):
    * each user's calendar span densified to one row per day, carrying the
    * day's max value where events exist and the last observed day's value
    * across gaps — the point-in-time-correct feature-store materialization
    * (a plain daily groupBy trains on a biased calendar that skips quiet
    * days). The oracle builds the same dense grid with generate_series
    * and fills with LAST_VALUE IGNORE NULLS. */
  private val q129 = Q(
    "q129_daily_gap_fill",
    (s, dir) =>
      graft.ops.Behavior.gapFillDaily(
        Lake(s, dir).events.filter(col("user_id") < 40),
        Seq("user_id"), "ts", "value")
        .orderBy("user_id", "day_key"),
    Some("""
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, MAX(value) AS day_v
        FROM events WHERE user_id < 40 GROUP BY 1, 2),
      span AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
        FROM daily GROUP BY 1),
      grid AS (
        SELECT user_id, CAST(t.d AS DATE) AS day
        FROM span, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS t(d))
      SELECT g.user_id,
        strftime(g.day, '%Y%m%d') AS day_key,
        LAST_VALUE(d.day_v IGNORE NULLS) OVER (
          PARTITION BY g.user_id ORDER BY g.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
        CAST(d.day_v IS NOT NULL AS INT) AS is_observed
      FROM grid g LEFT JOIN daily d
        ON d.user_id = g.user_id AND d.day = g.day
      ORDER BY g.user_id, day_key""")
  )

  // --------------------------------------------------------------- q130
  /** The dataset card in one gated query — the per-source summary every
    * corpus release ships, composed ONLY of engine-reproducible
    * statistics: exact counts and volumes, exact-hash duplicate rate,
    * DISCRETE medians (chars and whitespace tokens — data points, no
    * interpolation), and the dominant language with a deterministic
    * tiebreak (count desc, then lang asc). Averages of floating scores
    * are deliberately absent: a double sum's value depends on fold order
    * across partitions, which is exactly what a cross-engine hash gate
    * must refuse. One event-sized aggregate per block, joined source-wise. */
  private val q130 = Q(
    "q130_dataset_card",
    (s, dir) => {
      val docs = Lake(s, dir).documents
      val base = docs.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(md5(col("text"))).as("n_unique"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_exact_dupes"))
      val medChars = docs
        .select(col("source"), col("n_chars"))
        .withColumn("med_chars",
          min(when(cume_dist().over(
            org.apache.spark.sql.expressions.Window.partitionBy("source")
              .orderBy("n_chars")) >= 0.5, col("n_chars")))
            .over(org.apache.spark.sql.expressions.Window.partitionBy("source")))
        .groupBy("source").agg(max("med_chars").as("median_chars"))
      val topLang = docs.groupBy("source", "lang")
        .agg(count(lit(1)).as("n"))
        .withColumn("__rk",
          row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("source")
              .orderBy(col("n").desc, col("lang"))))
        .filter(col("__rk") === 1)
        .select(col("source"), col("lang").as("top_lang"),
          col("n").as("top_lang_docs"))
      base.join(medChars, Seq("source"))
        .join(topLang, Seq("source"))
        .select("source", "n_docs", "total_chars", "n_exact_dupes",
          "median_chars", "top_lang", "top_lang_docs")
        .orderBy("source")
    },
    Some("""
      WITH base AS (
        SELECT source,
          COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS total_chars,
          CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT)
            AS n_exact_dupes
        FROM documents GROUP BY source),
      med AS (
        SELECT source, MAX(m) AS median_chars
        FROM (SELECT source,
                MIN(CASE WHEN c >= 0.5 THEN n_chars END)
                  OVER (PARTITION BY source) AS m
              FROM (SELECT source, n_chars,
                      cume_dist() OVER (PARTITION BY source
                                        ORDER BY n_chars) AS c
                    FROM documents))
        GROUP BY source),
      tl AS (
        SELECT source, lang AS top_lang, n AS top_lang_docs
        FROM (SELECT source, lang, COUNT(*) AS n,
                row_number() OVER (PARTITION BY source
                                   ORDER BY COUNT(*) DESC, lang) AS rk
              FROM documents GROUP BY source, lang)
        WHERE rk = 1)
      SELECT b.source, b.n_docs, b.total_chars, b.n_exact_dupes,
        m.median_chars, tl.top_lang, tl.top_lang_docs
      FROM base b JOIN med m ON m.source = b.source
      JOIN tl ON tl.source = b.source
      ORDER BY b.source""")
  )

  // --------------------------------------------------------------- q131
  /** Semi-structured extraction under the hash gate: the events table's
    * `props` column is a JSON string the reference-shaped queries never
    * open; production event logs carry exactly this shape (typed columns
    * + a JSON properties bag). Spark parses it with `from_json` and an
    * EXPLICIT schema — the codegen'd, analysis-checked path, not
    * schema-inference or string surgery — and aggregates the extracted
    * field exactly; the oracle extracts the same path with DuckDB's JSON
    * functions. Malformed JSON yields NULL (from_json semantics), carried
    * as an explicit n_null counter so silent parse loss is visible. */
  private val q131 = Q(
    "q131_json_props",
    (s, dir) => {
      val kSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))
      Lake(s, dir).events
        .withColumn("k", from_json(col("props"), kSchema).getField("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          countDistinct(col("k")).as("n_distinct_k"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null"))
        .orderBy("event_type")
    },
    Some("""
      WITH parsed AS (
        SELECT event_type,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events)
      SELECT event_type,
        COUNT(*) AS n,
        CAST(SUM(k) AS BIGINT) AS sum_k,
        MIN(k) AS min_k,
        MAX(k) AS max_k,
        COUNT(DISTINCT k) AS n_distinct_k,
        CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
      FROM parsed GROUP BY event_type ORDER BY event_type""")
  )

  // --------------------------------------------------------------- q144
  /** Distribution-drift monitor ([[graft.ops.Stats.driftReport]]): split
    * documents into a baseline (even doc_id) and current (odd) snapshot
    * and compare per-source n_chars distributions on integer-exact
    * binary buckets — total-variation distance + smoothed chi², the
    * transcendental-free drift pair (PSI's ln() rounds differently per
    * engine and can't sit under a hash gate). Cross-bucket sums fold a
    * bucket-sorted list sequentially, so no aggregation order leaks. */
  private val q144 = Q(
    "q144_drift_report",
    (s, dir) => {
      val d = Lake(s, dir).documents
      Stats.driftReport(
        d.filter(pmod(col("doc_id"), lit(2)) === 0),
        d.filter(pmod(col("doc_id"), lit(2)) === 1),
        "n_chars", Seq("source"))
        .orderBy("source")
    },
    Some("""
      WITH b AS (
        SELECT source,
          CAST(CASE WHEN n_chars <= 0 THEN 0
               ELSE length(bin(n_chars)) END AS BIGINT) AS bucket,
          COUNT(*) AS nb
        FROM documents WHERE doc_id % 2 = 0 GROUP BY 1, 2),
      c AS (
        SELECT source,
          CAST(CASE WHEN n_chars <= 0 THEN 0
               ELSE length(bin(n_chars)) END AS BIGINT) AS bucket,
          COUNT(*) AS nc
        FROM documents WHERE doc_id % 2 = 1 GROUP BY 1, 2),
      j AS (
        SELECT COALESCE(b.source, c.source) AS source,
          COALESCE(b.bucket, c.bucket) AS bucket,
          COALESCE(nb, 0) AS nb, COALESCE(nc, 0) AS nc
        FROM b FULL JOIN c ON b.source = c.source AND b.bucket = c.bucket),
      t AS (
        SELECT source, bucket, nb, nc,
          CAST(SUM(nb) OVER (PARTITION BY source) AS BIGINT) AS n_base,
          CAST(SUM(nc) OVER (PARTITION BY source) AS BIGINT) AS n_cur
        FROM j),
      arrs AS (
        SELECT source, MAX(n_base) AS n_base, MAX(n_cur) AS n_cur,
          COUNT(*) AS n_buckets,
          list(ROW(bucket,
            CASE WHEN n_base = 0 THEN 0.0
                 ELSE CAST(nb AS DOUBLE) / n_base END,
            CASE WHEN n_cur = 0 THEN 0.0
                 ELSE CAST(nc AS DOUBLE) / n_cur END,
            CASE WHEN n_base = 0 THEN 0.0
                 ELSE greatest(CAST(nb AS DOUBLE), 0.5) / n_base END)
            ORDER BY bucket) AS arr
        FROM t GROUP BY source)
      SELECT source, n_base, n_cur, n_buckets,
        list_reduce(list_transform(arr, x -> abs(x[2] - x[3])),
          (a, b) -> a + b) * 0.5 AS tvd,
        list_reduce(list_transform(arr,
          x -> CASE WHEN x[4] = 0.0 THEN 0.0
               ELSE (x[3] - x[2]) * (x[3] - x[2]) / x[4] END),
          (a, b) -> a + b) AS chi2
      FROM arrs ORDER BY source""")
  )

  // --------------------------------------------------------------- q234
  /** Bucketed-join correctness gate: orders and lineitem are WRITTEN
    * bucketed + sorted on the order key ([[graft.core.Bucketing]], the
    * pay-the-shuffle-once lever), then joined and aggregated to revenue
    * per order priority. PlanSpec already pins the physical property
    * (zero exchanges on the bucketed join); this gate pins the VALUE
    * contract — the bucketed write/read round trip must produce exactly
    * the plain join's numbers, decimal-exact. */
  private val q234 = Q(
    "q234_bucketed_revenue",
    (s, dir) => {
      val lk = graft.core.Lake(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-q234").toString
      graft.core.SilverWriter.deleteOnExit(tmp)
      graft.core.Bucketing.writeBucketed(
        lk.orders.select("o_orderkey", "o_orderpriority"),
        "q234_b_orders", s"$tmp/o", 8, Seq("o_orderkey"))
      graft.core.Bucketing.writeBucketed(
        lk.lineitem.select(col("l_orderkey").as("o_orderkey"),
          col("l_extendedprice"), col("l_discount")),
        "q234_b_lines", s"$tmp/l", 8, Seq("o_orderkey"))
      graft.core.Bucketing.read(s, "q234_b_orders")
        .join(graft.core.Bucketing.read(s, "q234_b_lines"), "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n_items,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  // --------------------------------------------------------------- q235
  /** Repeat-purchase cadence: per customer with ≥ 3 orders, the count
    * and the exact-integer day gaps between consecutive order dates —
    * mean gap as one final division, max gap, the churn-model feature
    * pair. One hash(customer) window; ties on the same date break by
    * order key so the gap sequence is total. */
  private val q235 = Q(
    "q235_repeat_purchase_gaps",
    (s, dir) => {
      import org.apache.spark.sql.expressions.{Window => W}
      val w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      graft.core.Lake(s, dir).orders
        .withColumn("__prev", lag(col("o_orderdate"), 1).over(w))
        .withColumn("__gap",
          datediff(col("o_orderdate"), col("__prev")).cast("long"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("__gap")).as("sum_gap_days"),
          max(col("__gap")).as("max_gap_days"))
        .filter(col("n_orders") >= 3)
        .select(col("o_custkey"), col("n_orders"),
          col("sum_gap_days"), col("max_gap_days"),
          (col("sum_gap_days").cast("double") /
            (col("n_orders") - 1).cast("double")).as("mean_gap_days"))
        .orderBy("o_custkey")
    },
    Some("""
      WITH g AS (
        SELECT o_custkey,
          CAST(date_diff('day',
            lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS BIGINT) AS gap
        FROM orders),
      agg AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(gap) AS BIGINT) AS sum_gap_days,
               CAST(MAX(gap) AS BIGINT) AS max_gap_days
        FROM g GROUP BY o_custkey HAVING COUNT(*) >= 3)
      SELECT o_custkey, n_orders, sum_gap_days, max_gap_days,
             CAST(sum_gap_days AS DOUBLE) / CAST(n_orders - 1 AS DOUBLE)
               AS mean_gap_days
      FROM agg ORDER BY o_custkey""")
  )

  // --------------------------------------------------------------- q236
  /** CUBE over (event_type, weekday): the full 2^k lattice — every
    * marginal plus the grand total in ONE Expand pass, ALL-labeled from
    * the grouping() bits (the q115 discipline; cubeAgg/groupingSetsAgg
    * were unit-tested but oracle-ungated until this pair — the r5 ADVICE
    * convention fully closed). Money through DECIMAL, out as double. */
  private val q236 = Q(
    "q236_cube_value",
    (s, dir) =>
      MultiDim.cubeAgg(
        Lake(s, dir).events
          .select(col("event_type"),
            (dayofweek(col("ts")) - 1).cast("int").as("dow"),
            col("value")),
        Seq("event_type", "dow"),
        Seq(
          sum(round(col("value") * 100.0d, 0).cast("long")
            .cast("decimal(38,0)")).cast("double").as("cents"),
          count(lit(1)).as("n")))
        .orderBy("event_type", "dow"),
    Some("""
      WITH e AS (SELECT event_type,
                   CAST(extract(dow FROM ts) AS INTEGER) AS dow, value
                 FROM events)
      SELECT
        CASE WHEN GROUPING(event_type) = 1 THEN 'ALL'
             ELSE CAST(event_type AS VARCHAR) END AS event_type,
        CASE WHEN GROUPING(dow) = 1 THEN 'ALL'
             ELSE CAST(dow AS VARCHAR) END AS dow,
        CAST(SUM(CAST(CAST(ROUND(value * 100.0) AS BIGINT)
          AS DECIMAL(38,0))) AS DOUBLE) AS cents,
        COUNT(*) AS n
      FROM e
      GROUP BY CUBE(event_type, dow)
      ORDER BY event_type, dow""")
  )

  // --------------------------------------------------------------- q237
  /** Arbitrary GROUPING SETS — exactly the two marginals (by type, by
    * weekday), NO grand total and NO cross grain: the dashboard shape
    * where the full cube wastes 2× the Expand rows. Same ALL labels. */
  private val q237 = Q(
    "q237_grouping_sets_value",
    (s, dir) =>
      MultiDim.groupingSetsAgg(
        Lake(s, dir).events
          .select(col("event_type"),
            (dayofweek(col("ts")) - 1).cast("int").as("dow"),
            col("value")),
        Seq("event_type", "dow"),
        Seq(Seq("event_type"), Seq("dow")),
        Seq(
          sum(round(col("value") * 100.0d, 0).cast("long")
            .cast("decimal(38,0)")).cast("double").as("cents"),
          count(lit(1)).as("n")))
        .orderBy("event_type", "dow"),
    Some("""
      WITH e AS (SELECT event_type,
                   CAST(extract(dow FROM ts) AS INTEGER) AS dow, value
                 FROM events)
      SELECT
        CASE WHEN GROUPING(event_type) = 1 THEN 'ALL'
             ELSE CAST(event_type AS VARCHAR) END AS event_type,
        CASE WHEN GROUPING(dow) = 1 THEN 'ALL'
             ELSE CAST(dow AS VARCHAR) END AS dow,
        CAST(SUM(CAST(CAST(ROUND(value * 100.0) AS BIGINT)
          AS DECIMAL(38,0))) AS DOUBLE) AS cents,
        COUNT(*) AS n
      FROM e
      GROUP BY GROUPING SETS ((event_type), (dow))
      ORDER BY event_type, dow""")
  )

  val all: Seq[Q] = Seq(q115, q116, q117, q118, q119, q121, q122, q123,
    q124, q129, q130, q131, q144, q234, q235, q236, q237)
}
