package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}

/** Distribution diagnostics for join/aggregation keys — the measurement
  * step before reaching for [[Joins.saltedJoin]] or AQE tuning. Skew is a
  * property of the data, not the plan; at 100 TB the difference between
  * "salt this join" and "leave it to AQE" should come from numbers like
  * these, produced by one aggregation pass.
  */
object Stats {

  /** Top-`topN` heaviest keys with their absolute counts and share of all
    * rows, plus `skew_ratio` = heaviest key count ÷ mean key count. A
    * ratio near 1 is uniform; hundreds means one shuffle partition will
    * carry that key's full weight (AQE can split it for sort-merge joins,
    * salting is needed anywhere AQE can't reach). */
  def keySkew(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(keyCol).agg(F.count(F.lit(1)).as("n"))
    val totals = counts.agg(
      F.sum(F.col("n")).as("total_rows"),
      F.count(F.lit(1)).as("n_keys")).cache()
    counts
      .orderBy(F.col("n").desc, F.col(keyCol))
      .limit(topN)
      .crossJoin(F.broadcast(totals))
      .select(
        F.col(keyCol).cast("string").as("key"),
        F.col("n"),
        (F.col("n").cast("double") / F.col("total_rows")).as("share"),
        (F.col("n").cast("double") * F.col("n_keys") / F.col("total_rows"))
          .as("skew_ratio"))
  }
}
