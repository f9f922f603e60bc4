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
  /** One normalization point for the whole engine: every TIMESTAMP_NTZ
    * column is cast to TIMESTAMP at scan time. The driver's generator writes
    * parquet `timestamp[us]` with `isAdjustedToUTC=false`, which Spark 4
    * infers as TIMESTAMP_NTZ — a type `unix_micros()` and friends reject at
    * analysis time (the round-5 five-query regression). The session TZ is
    * pinned UTC (GraftSession), so the cast is a deterministic wall-clock
    * identity, and the DuckDB oracle (which reads the same parquet as naive
    * timestamps) sees identical values. The cast happens BEFORE any filter,
    * and Catalyst still pushes predicates on untouched columns to the scan;
    * timestamp predicates compare post-cast, same as the pre-drift plans. */
  def table(name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val ntz = df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
    }
    ntz.foldLeft(df)((d, c) =>
      d.withColumn(c, org.apache.spark.sql.functions.col(c).cast("timestamp")))
  }

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")

  /** Normalizes `ts` to TimestampType no matter which parquet encoding the
    * generator used. Encodings observed across testdata regenerations:
    *   - TIMESTAMP(NANOS) → long nanos under
    *     spark.sql.legacy.parquet.nanosAsLong (no native Spark type),
    *     converted losslessly here (the data is micro-aligned);
    *   - timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ, handled by
    *     [[table]]'s generic NTZ cast;
    *   - plain TIMESTAMP, passed through.
    * Downstream micro-arithmetic (sessionization, as-of/range joins,
    * funnels, SCD2) relies on this contract; LakeSpec pins it so the next
    * encoding drift fails at the Lake layer with a clear message, not five
    * queries deep. */
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
