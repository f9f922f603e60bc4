package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Lake
import graft.ops.Recommend

/** Item-based collaborative filtering ([[graft.ops.Recommend]]) over the
  * TPC-H order/part baskets — the recommender layer on top of q164's
  * association-rule mining: q217 builds the truncated item-item cosine
  * model, q218 serves per-customer "also bought" recommendations against
  * it. Both oracles replay the identical count → cosine → window-rank
  * construction; every aggregate is integer (scores are co-occurrence
  * sums, never float sums — Q.scala discipline), cosine is a single
  * division with IEEE-exact sqrt. */
object RecoQueries {

  /** Shared oracle CTE chain: basket-capped pair counts (q164's algebra)
    * symmetrized into a per-item neighbor list with cosine, ranked and
    * truncated to k = 5. `itemsSql` defines the (bk, it) basket source —
    * the full lineitem for q217/q218, the train-window join for q226. */
  private[queries] def modelCte(itemsSql: String): String = s"""
    items AS ($itemsSql),
    sized AS (SELECT bk, it FROM
               (SELECT bk, it, COUNT(*) OVER (PARTITION BY bk) AS bsz
                FROM items)
              WHERE bsz <= 100),
    ic AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS ni FROM sized GROUP BY it),
    p AS (SELECT a.it AS item_a, b.it AS item_b,
                 CAST(COUNT(*) AS BIGINT) AS n_pair
          FROM sized a JOIN sized b ON a.bk = b.bk AND a.it < b.it
          GROUP BY 1, 2 HAVING COUNT(*) >= 3),
    fullp AS (SELECT item_a, item_b, n_pair, ia.ni AS n_a, ib.ni AS n_b
              FROM p
              JOIN ic ia ON p.item_a = ia.it
              JOIN ic ib ON p.item_b = ib.it),
    sym AS (SELECT item_a AS item, item_b AS neighbor, n_pair,
                   n_a AS n_item, n_b AS n_neighbor
            FROM fullp
            UNION ALL
            SELECT item_b, item_a, n_pair, n_b, n_a FROM fullp),
    scored AS (SELECT item, neighbor, n_pair, n_item, n_neighbor,
                 CAST(n_pair AS DOUBLE) /
                   sqrt(CAST(n_item * n_neighbor AS DOUBLE)) AS cosine
               FROM sym),
    model AS (SELECT * FROM
               (SELECT item, neighbor, n_pair, n_item, n_neighbor, cosine,
                  CAST(row_number() OVER (PARTITION BY item
                    ORDER BY cosine DESC, n_pair DESC, neighbor) AS BIGINT)
                    AS rank
                FROM scored)
              WHERE rank <= 5)"""

  private val ModelCte = modelCte(
    "SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem")

  // --------------------------------------------------------------- q217
  private val q217 = Q(
    "q217_item_neighbors",
    (s, dir) =>
      Recommend.itemNeighbors(Lake(s, dir).lineitem,
          "l_orderkey", "l_partkey", minPairCount = 3L, k = 5)
        .orderBy("item", "rank"),
    Some(s"""
      WITH $ModelCte
      SELECT item, neighbor, n_pair, n_item, n_neighbor, cosine, rank
      FROM model ORDER BY item, rank""")
  )

  // --------------------------------------------------------------- q218
  /** Serving pass: customer → held parts from the order join, candidates
    * from the q217 model, integer co-occurrence-sum scores, held parts
    * anti-joined out, top 3. */
  private val q218 = Q(
    "q218_also_bought",
    (s, dir) => {
      val lk = Lake(s, dir)
      val userItems = lk.orders
        .join(lk.lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("l_partkey"))
      val model = Recommend.itemNeighbors(lk.lineitem,
        "l_orderkey", "l_partkey", minPairCount = 3L, k = 5)
      Recommend.alsoBought(userItems, "o_custkey", "l_partkey", model, k = 3)
        .withColumnRenamed("user", "cust")
        .orderBy("cust", "rank")
    },
    Some(s"""
      WITH $ModelCte,
      ui AS (SELECT DISTINCT o_custkey AS cust, l_partkey AS item
             FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      cand AS (SELECT cust, m.neighbor AS rec_item,
                 CAST(SUM(m.n_pair) AS BIGINT) AS score,
                 CAST(COUNT(*) AS BIGINT) AS n_sources
               FROM ui JOIN model m ON ui.item = m.item
               GROUP BY 1, 2),
      pruned AS (SELECT c.cust, c.rec_item, c.score, c.n_sources
                 FROM cand c
                 WHERE NOT EXISTS (SELECT 1 FROM ui
                                   WHERE ui.cust = c.cust
                                     AND ui.item = c.rec_item)),
      ranked AS (SELECT cust, rec_item, score, n_sources,
                   CAST(row_number() OVER (PARTITION BY cust
                     ORDER BY score DESC, n_sources DESC, rec_item)
                     AS BIGINT) AS rank
                 FROM pruned)
      SELECT cust, rec_item, score, n_sources, rank
      FROM ranked WHERE rank <= 3 ORDER BY cust, rank""")
  )

  // --------------------------------------------------------------- q226
  /** Offline recommender evaluation — the capstone composition: orders
    * split by date into train (< 1997-01-01) and test; the q217 model is
    * built ONLY from train baskets, q218-style recommendations are served
    * from train purchases, and the hit rate is measured against what the
    * customers actually bought in the test window. Leakage-proof by
    * construction (the model never sees a test order — the q145 split
    * discipline applied to time); every metric integer except the final
    * hit-rate divisions. */
  private val q226 = {
    val cutoff = "1997-01-01"
    Q(
      "q226_reco_eval",
      (s, dir) => {
        val lk = Lake(s, dir)
        val train = lk.orders.filter(col("o_orderdate") < cutoff)
        val test = lk.orders.filter(col("o_orderdate") >= cutoff)
        val trainLi = train
          .join(lk.lineitem, col("o_orderkey") === col("l_orderkey"))
          .select(col("l_orderkey"), col("l_partkey"))
        val model = Recommend.itemNeighbors(trainLi,
          "l_orderkey", "l_partkey", minPairCount = 3L, k = 5)
        val heldTrain = train
          .join(lk.lineitem, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey"), col("l_partkey"))
        val recs = Recommend.alsoBought(heldTrain, "o_custkey", "l_partkey",
          model, k = 3)
        val testBuys = test
          .join(lk.lineitem, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("user"),
            col("l_partkey").as("rec_item"))
          .distinct()
        val hits = recs.join(testBuys, Seq("user", "rec_item"), "left_semi")
        val r = recs.agg(
          count_distinct(col("user")).as("n_users"),
          count(lit(1)).as("n_recs"))
        val h = hits.agg(
          count_distinct(col("user")).as("n_users_hit"),
          count(lit(1)).as("n_rec_hits"))
        // at scale factors where the train-window model is too sparse to
        // recommend anything, the rates are NULL, not a division by zero
        // (ANSI mode throws — the q163/q186 empty-side guard discipline)
        r.crossJoin(h).select(
          col("n_users"), col("n_recs"), col("n_users_hit"),
          col("n_rec_hits"),
          when(col("n_recs") > 0,
            col("n_rec_hits").cast("double") / col("n_recs").cast("double"))
            .as("rec_precision"),
          when(col("n_users") > 0,
            col("n_users_hit").cast("double") / col("n_users").cast("double"))
            .as("user_hit_rate"))
      },
      Some(s"""
      WITH ${modelCte(
        s"""SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE o_orderdate < TIMESTAMP '$cutoff'""").stripLeading()},
      ui AS (SELECT DISTINCT o_custkey AS cust, l_partkey AS item
             FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             WHERE o_orderdate < TIMESTAMP '$cutoff'),
      cand AS (SELECT cust, m.neighbor AS rec_item,
                 CAST(SUM(m.n_pair) AS BIGINT) AS score,
                 CAST(COUNT(*) AS BIGINT) AS n_sources
               FROM ui JOIN model m ON ui.item = m.item
               GROUP BY 1, 2),
      pruned AS (SELECT c.cust, c.rec_item, c.score, c.n_sources
                 FROM cand c
                 WHERE NOT EXISTS (SELECT 1 FROM ui
                                   WHERE ui.cust = c.cust
                                     AND ui.item = c.rec_item)),
      recs AS (SELECT cust, rec_item FROM (
                 SELECT cust, rec_item,
                   row_number() OVER (PARTITION BY cust
                     ORDER BY score DESC, n_sources DESC, rec_item) AS rank
                 FROM pruned)
               WHERE rank <= 3),
      testbuys AS (SELECT DISTINCT o_custkey AS cust, l_partkey AS rec_item
                   FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                   WHERE o_orderdate >= TIMESTAMP '$cutoff'),
      hits AS (SELECT r.cust, r.rec_item FROM recs r
               WHERE EXISTS (SELECT 1 FROM testbuys t
                             WHERE t.cust = r.cust
                               AND t.rec_item = r.rec_item)),
      ra AS (SELECT CAST(COUNT(DISTINCT cust) AS BIGINT) AS n_users,
                    CAST(COUNT(*) AS BIGINT) AS n_recs FROM recs),
      ha AS (SELECT CAST(COUNT(DISTINCT cust) AS BIGINT) AS n_users_hit,
                    CAST(COUNT(*) AS BIGINT) AS n_rec_hits FROM hits)
      SELECT n_users, n_recs, n_users_hit, n_rec_hits,
             CASE WHEN n_recs > 0
                  THEN CAST(n_rec_hits AS DOUBLE) / CAST(n_recs AS DOUBLE)
             END AS rec_precision,
             CASE WHEN n_users > 0
                  THEN CAST(n_users_hit AS DOUBLE) / CAST(n_users AS DOUBLE)
             END AS user_hit_rate
      FROM ra CROSS JOIN ha""")
    )
  }

  val all: Seq[Q] = Seq(q217, q218, q226)
}
