package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-partition a table on its join/agg key at
  * write time so every later equi-join or aggregation on that key reads
  * co-located data with NO exchange.
  *
  * This is the 100 TB lever the one-shot queries can't show: a fact table
  * joined on the same key by many consumers (enrollment by schoolId,
  * events by user_id) pays its shuffle ONCE at write. Spark's bucketing
  * needs the catalog (`bucketBy` + `saveAsTable`); the explicit `path`
  * keeps data in the caller's lake layout rather than the warehouse dir.
  * Bucket counts should match the downstream `shuffle.partitions` scale —
  * at 100 TB think thousands, sized so a bucket fits an executor core.
  */
object Bucketing {

  /** Write `df` bucketed (and sorted) by `keys` into `path`, registered as
    * `table`. Sorting within buckets additionally lets sort-merge joins
    * skip their per-task sort. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      nBuckets: Int,
      keys: Seq[String]
  ): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
