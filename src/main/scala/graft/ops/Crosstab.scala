package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pivot helpers (SURVEY.md §2.4 A8/A9).
  *
  * The reference uses `pd.crosstab` to turn attendance-event categories into
  * one count column per category (reference parquet/Common/pandasWrapper.py:
  * 110-111; ews/student_early_warning_fact/main.py:194-200), then patches
  * columns that didn't occur in the data. Pandas' output schema is
  * data-dependent; ours is NOT: callers pass the category list, which
  *   1. makes the output schema stable (SURVEY.md §7.4.2), and
  *   2. lets Spark skip the extra values-discovery job `pivot(col)` would
  *      run — at 100 TB that discovery pass is a full extra scan.
  */
object Crosstab {

  /** One row per key tuple, one `bigint` count column per category value
    * (0 when absent, matching `pd.crosstab`). */
  def counts(df: DataFrame, keys: Seq[String], category: String, values: Seq[String]): DataFrame = {
    val pivoted = df.groupBy(keys.map(col): _*).pivot(category, values).count()
    // backticks: category values may contain dots (descriptor constants)
    values.foldLeft(pivoted)((d, v) =>
      d.withColumn(v, coalesce(col(s"`$v`"), lit(0L))))
  }

  /** `df.pivot(index, columns, values)` parity (A9) with a deterministic
    * aggregate — pandas takes "the" value (and raises on duplicates); we take
    * an explicit agg (default max) so the result is well-defined under
    * distributed execution.
    */
  def values(
      df: DataFrame,
      keys: Seq[String],
      category: String,
      categoryValues: Seq[String],
      valueCol: String,
      agg: Column => Column = max
  ): DataFrame =
    df.groupBy(keys.map(col): _*)
      .pivot(category, categoryValues)
      .agg(agg(col(valueCol)))
}
