package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing for pretraining pipelines: documents are
  * concatenated in a deterministic order and chunked into fixed-budget
  * training sequences; each document is assigned the sequence its first
  * token lands in (the concat-then-split convention), plus its token
  * offset within that stream.
  *
  * Scale design: a single global ordering would be one giant window — a
  * total sort through one partition, unusable at 100 TB. Packing is
  * therefore BUCKETED: documents hash into `buckets` independent streams
  * (deterministically, `doc_id % buckets`), and the running-total window
  * partitions by bucket — every bucket packs in parallel and the window
  * state per task is one running sum. Sequences are identified by
  * (bucket, seq_no), which downstream loaders consume independently —
  * exactly how sharded pretraining data is laid out anyway.
  */
object Packing {

  /** Assign each document a training sequence under `budget` tokens per
    * sequence. Returns the input plus `bucket`, `seq_id` ("b-n" string),
    * and `tok_offset` (the doc's first-token offset inside its bucket's
    * concatenated stream).
    *
    * @param tokenCol precomputed token count (e.g.
    *                 [[TextAnalysis.wsTokenCount]] materialized)
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      buckets: Int = 64
  ): DataFrame = {
    val w = Window.partitionBy("bucket").orderBy(col(idCol))
    df.withColumn("bucket", pmod(col(idCol), lit(buckets.toLong)))
      .withColumn("tok_offset", sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("seq_id",
        concat_ws("-", col("bucket"),
          floor(col("tok_offset") / lit(budget)).cast("long")))
  }
}
