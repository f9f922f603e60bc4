package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's scale-oriented defaults.
  *
  * The reference pipeline (Ed-Fi-Exchange-OSS/API-to-AMT-Data-Lake) is a
  * single-process pandas program with no optimizer (SURVEY.md §4); here every
  * knob that pandas lacks is delegated to Catalyst/AQE:
  *
  *   - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  *     and dynamic broadcast conversion — the behaviours we'd otherwise have
  *     to hand-tune per dataset at 100 TB.
  *   - shuffle.partitions sized to the local core count for tests; on a real
  *     cluster AQE's coalesceShufflePartitions makes the initial number a
  *     ceiling, not a constant.
  *   - UTC session timezone so date keys (yyyyMMdd strings, SURVEY §2.6 F4)
  *     hash-match the DuckDB oracle.
  */
object GraftSession {

  def defaultParallelism: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  /** Apply engine defaults to any builder (works for local and cluster). */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Write timestamps as INT64 micros: readable by every modern engine
      // (the DuckDB oracle included) without INT96 legacy handling.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // Parquet TIMESTAMP(NANOS) (the events table) has no native Spark
      // type; read as long nanos and convert in Lake.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Local session for tests/bench: one JVM, N threads. */
  def local(cores: Int = defaultParallelism, appName: String = "graft"): SparkSession = {
    val spark = configure(
      SparkSession.builder().master(s"local[$cores]").appName(appName),
      shufflePartitions = cores
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
