package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Lake

/** The nine TPC-H query shapes the relational family had not yet covered
  * (Q2, Q5, Q9, Q10, Q12, Q14, Q16, Q19, Q20), adapted to the driver's
  * TPC-H-ish schema (no partsupp table — lineitem's distinct
  * (suppkey, partkey) pairs stand in for it; no ps_supplycost — a
  * deterministic fraction of p_retailprice stands in). Together with
  * q01/q02/q03 (Q1/Q6/Q3), q191-q197 (Q4/Q13/Q17/Q18/Q21/Q22/Q15) and
  * q212-q214 (Q7/Q11/Q8) this closes the full 22-shape TPC-H surface.
  *
  * Shapes — not literal queries: what each gate pins is the PLAN family
  * (decorrelated argmin join, dim-dim equality inside a star join,
  * OR-of-ANDs join predicate, nested-aggregate threshold semi-join), the
  * part that must survive a 100 TB scale-up. Money math follows the repo
  * convention: DECIMAL accumulation (exact, order-independent), double on
  * the way out.
  */
object TpchShapeQueries {

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")
  private def dec4(c: Column): Column = c.cast("decimal(18,4)")
  private def ts(s: String): Column = to_timestamp(lit(s))

  // --------------------------------------------------------------- q239
  /** TPC-H Q5 shape: local supplier volume. The star join's distinctive
    * twist is the dim-dim equality c_nationkey = s_nationkey — revenue
    * only counts when the customer and the shipping supplier share a
    * nation. nation is broadcast; supplier and customer are broadcast
    * (dims); the only shuffle is lineitem⋈orders on orderkey. */
  private val q239 = Q(
    "q239_local_supplier_volume",
    (s, dir) => {
      val lake = Lake(s, dir)
      val o = lake.orders.filter(
        col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1997-01-01"))
      val n = lake.nation.filter(col("n_regionkey") === 0)
      lake.lineitem
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(lake.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(lake.supplier),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(dec4(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
          AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
        AND n_regionkey = 0
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""")
  )

  // --------------------------------------------------------------- q240
  /** TPC-H Q9 shape: product-type profit. p_name LIKE filter on the part
    * dim, profit = revenue − cost with cost = 60% of retail price × qty
    * (the schema has no ps_supplycost; the fraction is deterministic so
    * the gate stays exact). Grouped by (supplier nation, order year).
    * part and supplier broadcast; one orderkey shuffle. */
  private val q240 = Q(
    "q240_product_type_profit",
    (s, dir) => {
      val lake = Lake(s, dir)
      val p = lake.part.filter(col("p_name").like("%red%"))
      lake.lineitem
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(lake.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(lake.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(lake.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(sum(
          dec4(col("l_extendedprice") * (lit(1) - col("l_discount"))) -
            dec4(col("p_retailprice") * lit(0.6) * col("l_quantity")))
          .cast("double").as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("""
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
               - CAST(p_retailprice * 0.6 * l_quantity AS DECIMAL(18,4)))
          AS DOUBLE) AS profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
      GROUP BY 1, 2
      ORDER BY nation, o_year DESC""")
  )

  // --------------------------------------------------------------- q241
  /** TPC-H Q10 shape: returned-item reporting. Revenue lost to returns
    * (l_returnflag = 'R') in one quarter, per customer with their nation,
    * top 20. The groupBy key is the customer — high cardinality, so the
    * aggregation shuffles on custkey and the top-20 is a TakeOrdered at
    * the end, never a global sort of the full customer set. */
  private val q241 = Q(
    "q241_returned_item_revenue",
    (s, dir) => {
      val lake = Lake(s, dir)
      val o = lake.orders.filter(
        col("o_orderdate") >= ts("1997-01-01") &&
          col("o_orderdate") < ts("1997-04-01"))
      lake.lineitem.filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(lake.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(lake.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(dec4(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""
      SELECT c_custkey, c_name, n_name,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
          AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20""")
  )

  // --------------------------------------------------------------- q242
  /** TPC-H Q12 shape: conditional priority counts per ship class. The
    * schema has no l_shipmode, so the ship class is l_linestatus and
    * "late" is shipped more than 60 days after the order date. The shape
    * is what matters: join + CASE-summed priority split per group —
    * one pass, map-side partials, no second scan per bucket. */
  private val q242 = Q(
    "q242_late_shipment_priorities",
    (s, dir) => {
      val lake = Lake(s, dir)
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      lake.lineitem
        .join(lake.orders, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_linestatus").as("ship_class"))
        .agg(
          sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("ship_class")
    },
    Some("""
      SELECT l_linestatus AS ship_class,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      GROUP BY 1
      ORDER BY ship_class""")
  )

  // --------------------------------------------------------------- q243
  /** TPC-H Q14 shape: promo revenue share. One month of shipments, part
    * dim broadcast, a CASE-gated numerator over the same rows as the
    * denominator — both sums exact DECIMAL, the share one double
    * division at the very end. */
  private val q243 = Q(
    "q243_promo_revenue_share",
    (s, dir) => {
      val lake = Lake(s, dir)
      val rev = dec4(col("l_extendedprice") * (lit(1) - col("l_discount")))
      lake.lineitem
        .filter(col("l_shipdate") >= ts("1997-03-01") &&
          col("l_shipdate") < ts("1997-04-01"))
        .join(broadcast(lake.part), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev)
            .otherwise(dec4(lit(0)))).cast("double").as("promo_revenue"),
          sum(rev).cast("double").as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          (lit(100.0) * col("promo_revenue") / col("total_revenue"))
            .as("promo_pct"))
    },
    Some("""
      SELECT promo_revenue, total_revenue,
             100.0 * promo_revenue / total_revenue AS promo_pct
      FROM (
        SELECT
          CAST(SUM(CASE WHEN p_type = 'PROMO'
            THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
            ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS total_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate < TIMESTAMP '1997-04-01')""")
  )

  // --------------------------------------------------------------- q244
  /** TPC-H Q16 shape: supplier count by part attributes with a NOT-IN
    * exclusion. lineitem's distinct (partkey, suppkey) pairs stand in
    * for partsupp; suppliers with negative balance stand in for the
    * complaints blacklist (left anti join — the NOT IN decorrelation).
    * The distinct-supplier count per (brand, type, size) shuffles once
    * on the part attributes after the pair dedup. */
  private val q244 = Q(
    "q244_supplier_count_by_part",
    (s, dir) => {
      val lake = Lake(s, dir)
      val blacklist = lake.supplier.filter(col("s_acctbal") < 0)
        .select("s_suppkey")
      val p = lake.part.filter(
        col("p_brand") =!= "Brand#1" && col("p_size").isin(1, 5, 9, 13))
      lake.lineitem.select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(blacklist), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },
    Some("""
      SELECT p_brand, p_type, p_size,
             COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13)
        AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
  )

  // --------------------------------------------------------------- q245
  /** TPC-H Q19 shape: OR-of-ANDs join predicate. Three disjunctive
    * (brand, size-range, quantity-range) branches evaluated as a single
    * residual filter on the part⋈lineitem join — one scan each side, the
    * disjunction never forces three separate joins; the common
    * l_partkey = p_partkey conjunct is what the join planner keys on. */
  private val q245 = Q(
    "q245_disjunctive_revenue",
    (s, dir) => {
      val lake = Lake(s, dir)
      val branches =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(11, 20) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(21, 30) &&
            col("l_quantity").between(20, 40))
      lake.lineitem
        .join(broadcast(lake.part), col("l_partkey") === col("p_partkey"))
        .filter(branches)
        .agg(
          sum(dec4(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""
      SELECT
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
          AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 20
             AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 21 AND 30
             AND l_quantity BETWEEN 20 AND 40)""")
  )

  // --------------------------------------------------------------- q246
  /** TPC-H Q20 shape: nested-aggregate threshold semi-join. Suppliers
    * who shipped more than 30% of a small-part's 1997 volume — the inner
    * query aggregates (partkey, suppkey) pair volume AND per-part total,
    * compares them, and the outer is a semi join onto supplier. Both
    * quantities are integral (1..50), so the 30% threshold is the exact
    * long comparison 10·pair > 3·total — no float in the gate. */
  private val q246 = Q(
    "q246_dominant_small_part_suppliers",
    (s, dir) => {
      val lake = Lake(s, dir)
      val p = lake.part.filter(col("p_name").like("small%"))
        .select("p_partkey")
      val shipped = lake.lineitem
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        // hash(partkey) co-locates (partkey, suppkey) pairs too, so the
        // pair aggregation AND the per-part total window share ONE
        // exchange instead of shuffling twice
        .repartition(col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity").cast("long")).as("pair_qty"))
      val dominant = shipped
        .withColumn("total_qty",
          sum(col("pair_qty")).over(Window.partitionBy("l_partkey")))
        .filter(col("pair_qty") * 10 > col("total_qty") * 3)
        .select("l_suppkey").distinct()
      lake.supplier
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    },
    Some("""
      SELECT s_suppkey, s_name, s_acctbal
      FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM (
          SELECT l_partkey, l_suppkey,
                 SUM(CAST(l_quantity AS BIGINT)) AS pair_qty,
                 SUM(SUM(CAST(l_quantity AS BIGINT)))
                   OVER (PARTITION BY l_partkey) AS total_qty
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'small%'
            AND l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY l_partkey, l_suppkey)
        WHERE pair_qty * 10 > total_qty * 3)
      ORDER BY s_suppkey""")
  )

  // --------------------------------------------------------------- q247
  /** TPC-H Q2 shape: min-cost supplier per part — the correlated scalar
    * subquery decorrelated into an argmin window. Candidate suppliers
    * come from lineitem's observed (part, supplier) pairs restricted to
    * region 0; the cheapest (s_acctbal as the cost proxy, suppkey
    * tiebreak) wins per part. row_number, not a min-join — one window
    * pass over the deduped pair frame. */
  private val q247 = Q(
    "q247_cheapest_regional_supplier",
    (s, dir) => {
      val lake = Lake(s, dir)
      val p = lake.part.filter(
        col("p_type") === "LARGE" && col("p_size") <= 15)
      val n = lake.nation.filter(col("n_regionkey") === 0)
      val regionalSupp = lake.supplier
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
      val pairs = lake.lineitem.select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(regionalSupp), col("l_suppkey") === col("s_suppkey"))
      val w = Window.partitionBy("p_partkey")
        .orderBy(col("s_acctbal"), col("s_suppkey"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
      FROM (
        SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal,
               row_number() OVER (PARTITION BY p_partkey
                 ORDER BY s_acctbal, s_suppkey) AS rn
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_type = 'LARGE' AND p_size <= 15 AND n_regionkey = 0)
      WHERE rn = 1
      ORDER BY p_partkey""")
  )

  val all: Seq[Q] = Seq(q239, q240, q241, q242, q243, q244, q245, q246, q247)
}
