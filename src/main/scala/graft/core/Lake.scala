package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin accessor over a directory of parquet tables (one file/dir per table),
  * the layout of both the driver's synthetic test data
  * (/root/testdata/sf0.01/&lt;table&gt;.parquet, TESTDATA.md) and the reference's
  * "gold" layer (one parquet per view per school year,
  * reference parquet/Common/pandasWrapper.py:128-135).
  *
  * Reads are plain `spark.read.parquet`, so Catalyst keeps full pushdown:
  * filters and column pruning reach the scan (`PushedFilters`/`ReadSchema`),
  * which is the property that matters at 100 TB — a query that touches 2 of
  * 16 lineitem columns must only read 2 column chunks.
  */
final case class Lake(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")

  /** events.parquet stores TIMESTAMP(NANOS), which Spark has no native type
    * for; with spark.sql.legacy.parquet.nanosAsLong the scan yields long
    * nanos, converted here (losslessly — the data is micro-aligned) to a
    * proper timestamp column. */
  def events: DataFrame = {
    val e = table("events")
    import org.apache.spark.sql.functions.expr
    e.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        e.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => e
    }
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
