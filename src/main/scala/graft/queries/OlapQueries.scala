package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Lake
import graft.ops.{Intervals, MultiDim, Stats}

/** OLAP-analytics coverage: the subtotal lattice ([[graft.ops.MultiDim]]),
  * closed-interval union/coverage ([[graft.ops.Intervals]]) and exact
  * k-sigma outlier counts ([[graft.ops.Stats.sigmaOutliers]]) — the three
  * round-5 operators that shipped without gates (and, for MultiDim, without
  * working: the alias round-trip broke on Spark 4's ColumnNode — ADVICE r5).
  * Each oracle states the identical algebra in DuckDB SQL; the hash gate is
  * what proves the window/Expand formulations ARE the textbook definitions.
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

  val all: Seq[Q] = Seq(q115, q116, q117)
}
