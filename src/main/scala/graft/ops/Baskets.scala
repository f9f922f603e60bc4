package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining — association rules with
  * support / confidence / lift, the classic recommendation-prep pass
  * ("parts ordered together") and the relational twin of the web graph's
  * co-citation (q91: common-source pairs; here common-BASKET pairs).
  *
  * Scale discipline, same as [[WebGraph]]'s hub cap: the within-basket
  * self-join is quadratic in basket SIZE, so baskets above `maxBasketSize`
  * are excluded up front — one mega-cart would otherwise contribute
  * O(10⁶) pairs on its own (the zipfian-hub lesson, measured there).
  * Everything else is hash aggregates: distinct (basket, item), per-item
  * counts, one shuffle for the pair groupBy; the 1-row basket total rides
  * a broadcast (the q60 totals pattern — no driver action).
  *
  * Metrics from exact counts, one division each (gate-safe):
  * support = n_pair/n_baskets, confidence(a→b) = n_pair/n_a,
  * lift = n_pair·n_baskets / (n_a·n_b) — symmetric, computed once per
  * canonical pair (item_a < item_b). Gated by q164. MEASURED
  * (GovernanceScaleProbe, sf0.1 lineitem ×10): 2.13 → 10.32 s = 4.9×. */
object Baskets {

  def associationRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long,
      maxBasketSize: Int = 100
  ): DataFrame = {
    require(minPairCount >= 1, s"bad minPairCount: $minPairCount")
    val items = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct()
    val sized = items
      .withColumn("__bsz",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("__bk")))
      .filter(col("__bsz") <= maxBasketSize)
      .drop("__bsz")
    val nBaskets = sized.agg(count_distinct(col("__bk")).as("__nb"))
    val itemCounts = sized.groupBy("__it").agg(count(lit(1)).as("__ni"))
    val pairs = sized.as("a")
      .join(sized.as("b"),
        col("a.__bk") === col("b.__bk") && col("a.__it") < col("b.__it"))
      .groupBy(col("a.__it").as("item_a"), col("b.__it").as("item_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    pairs
      .join(broadcast(itemCounts.withColumnRenamed("__ni", "n_a")),
        col("item_a") === col("__it")).drop("__it")
      .join(broadcast(itemCounts.withColumnRenamed("__ni", "n_b")),
        col("item_b") === col("__it")).drop("__it")
      .crossJoin(broadcast(nBaskets))
      .select(
        col("item_a"), col("item_b"), col("n_pair"), col("n_a"), col("n_b"),
        (col("n_pair").cast("double") / col("__nb").cast("double"))
          .as("support"),
        (col("n_pair").cast("double") / col("n_a").cast("double"))
          .as("confidence"),
        (col("n_pair").cast("double") * col("__nb").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
      .orderBy("item_a", "item_b")
  }

  /** Frequent triples via the Apriori candidate-pruning step: any triple
    * with support ≥ s has all three sub-pairs at support ≥ s
    * (anti-monotonicity), so the basket×basket×basket cube never
    * materializes — the (a,b) leg is semi-joined against the FREQUENT
    * pair set before the third item joins in, and at sf0.01 that prunes
    * a 157k-triple candidate space to the handful that can qualify. The
    * oracle states the mathematical spec (plain 3-way self-join +
    * HAVING); the hash gate proves pruned ≡ naive (the q29
    * spec-vs-scale-path pattern). Same basket-size cap as
    * [[associationRules]]. Gated by q177. MEASURED (GovernanceScaleProbe,
    * sf0.1 lineitem ×10): 1.60 → 9.29 s = 5.8×. */
  def frequentTriples(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minCount: Long,
      maxBasketSize: Int = 100
  ): DataFrame = {
    require(minCount >= 2, s"bad minCount: $minCount")
    val items = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct()
      .withColumn("__bsz",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("__bk")))
      .filter(col("__bsz") <= maxBasketSize)
      .drop("__bsz")
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.__bk") === col("b.__bk") && col("a.__it") < col("b.__it"))
      .select(col("a.__bk").as("__pbk"),
        col("a.__it").as("item_a"), col("b.__it").as("item_b"))
    val freqPairs = pairs.groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("__np"))
      .filter(col("__np") >= minCount)
      .select("item_a", "item_b")
    pairs
      .join(broadcast(freqPairs), Seq("item_a", "item_b"), "left_semi")
      .join(items.as("c"),
        col("__pbk") === col("c.__bk") && col("item_b") < col("c.__it"))
      .groupBy(col("item_a"), col("item_b"), col("c.__it").as("item_c"))
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minCount)
      .orderBy("item_a", "item_b", "item_c")
  }
}
