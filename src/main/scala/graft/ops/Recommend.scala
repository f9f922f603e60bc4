package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-based collaborative filtering on implicit feedback — the
  * "customers who bought X also bought Y" model (Linden/Smith/York,
  * IEEE Internet Computing 2003) built entirely from the co-occurrence
  * counts [[Baskets.associationRules]] already mines:
  *   - [[itemNeighbors]] — the MODEL BUILD: per item, its top-k most
  *     similar items by co-occurrence cosine, the truncated item-item
  *     similarity matrix every item-CF system ships to serving;
  *   - [[alsoBought]] — the SERVING pass: per user, candidate items are
  *     the neighbors of items the user already holds; scores accumulate
  *     per candidate, held items are anti-joined out, top-k survive.
  *
  * Scale shape: the quadratic step (per-basket pair enumeration) is
  * bounded by [[Baskets.associationRules]]'s basket-size cap; the model
  * is truncated to k rows/item BEFORE serving, so the serving join fans
  * out ≤ k candidates per held item (the industry-standard reason
  * item-CF scales where user-user CF does not: the model is small and
  * static, users stream against it). The candidate aggregation scores
  * with the INTEGER co-occurrence sum (order-independent, engine-exact)
  * rather than a float cosine sum — cosine appears only as the single
  * per-pair division in the model, never inside an aggregate, the
  * no-float-sums oracle discipline (Q.scala).
  */
object Recommend {

  /** Truncated item-item similarity model: for every item, its `k`
    * nearest neighbors by cosine over basket co-occurrence — cosine =
    * n_pair / sqrt(n_item · n_neighbor) with exact integer ingredients
    * and IEEE-exact sqrt (correctly rounded, portable across engines).
    * Ranking ties break by n_pair desc, then neighbor id. Output:
    * (item, neighbor, n_pair, n_item, n_neighbor, cosine, rank ≤ k). */
  def itemNeighbors(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long,
      k: Int,
      maxBasketSize: Int = 100
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val rules = Baskets
      .associationRules(df, basketCol, itemCol, minPairCount, maxBasketSize)
      .select("item_a", "item_b", "n_pair", "n_a", "n_b")
    val sym = rules
      .select(col("item_a").as("item"), col("item_b").as("neighbor"),
        col("n_pair"), col("n_a").as("n_item"), col("n_b").as("n_neighbor"))
      .unionByName(rules.select(col("item_b").as("item"),
        col("item_a").as("neighbor"), col("n_pair"),
        col("n_b").as("n_item"), col("n_a").as("n_neighbor")))
      .withColumn("cosine",
        col("n_pair").cast("double") /
          sqrt((col("n_item") * col("n_neighbor")).cast("double")))
    val w = Window.partitionBy("item")
      .orderBy(col("cosine").desc, col("n_pair").desc, col("neighbor"))
    sym.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Top-`k` recommendations per user against an [[itemNeighbors]] model:
    * candidates = neighbors of held items, scored by the SUM of
    * co-occurrence counts across the user's held items (exact integers —
    * see the object doc for why not a cosine sum), minus everything the
    * user already holds. Ties break by breadth (how many held items
    * proposed the candidate), then item id. Output: (user, rec_item,
    * score, n_sources, rank ≤ k). */
  def alsoBought(
      userItems: DataFrame,
      userCol: String,
      itemCol: String,
      neighbors: DataFrame,
      k: Int
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val ui = userItems
      .select(col(userCol).as("user"), col(itemCol).as("item")).distinct()
    val cand = ui
      .join(neighbors.select(col("item"), col("neighbor"), col("n_pair")),
        "item")
      .groupBy(col("user"), col("neighbor").as("rec_item"))
      .agg(sum(col("n_pair")).cast("long").as("score"),
        count(lit(1)).as("n_sources"))
    val pruned = cand.join(
      ui.withColumnRenamed("item", "rec_item"),
      Seq("user", "rec_item"), "left_anti")
    val w = Window.partitionBy("user")
      .orderBy(col("score").desc, col("n_sources").desc, col("rec_item"))
    pruned.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
