package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structural flattening of nested JSON resources — the Spark-native
  * equivalent of the reference's `jsonNormalize`
  * (reference parquet/Common/pandasWrapper.py:47-85, SURVEY.md §2.1 S5).
  *
  * The reference flattens row-by-row in pandas and patches the schema
  * afterwards (empty-frame fallback, conjured columns). Here the contract is
  * structural: inputs are read with an explicit `StructType`, so
  *   - dotted meta paths become nested-field projections,
  *   - `recordPath` array unnesting becomes `explode_outer`
  *     (outer: a resource with an empty/null array still yields one row, with
  *     null record fields — matching pandas' `json_normalize` drop is NOT
  *     wanted by the views, which guard with null-fills),
  *   - the declared output columns always exist even for an empty source.
  *
  * Everything stays inside whole-stage codegen; `explode_outer` is a Spark
  * `Generator` and needs no custom UDTF.
  */
object Flatten {

  /** Select dotted `meta` paths, keeping the reference's dotted column names
    * (e.g. `schoolReference.schoolId`). Missing leaf fields must be present
    * in the scan schema (EndpointCatalog) — that is what replaces the
    * reference's empty-frame machinery.
    */
  def meta(df: DataFrame, paths: Seq[String]): DataFrame =
    df.select(paths.map(p => col(p).as(p)): _*)

  /** `jsonNormalize(recordPath=..., meta=..., recordPrefix=...)` parity:
    * unnest (possibly multi-level) array path, project meta paths + record
    * fields (prefixed), one output row per array element — or one row of
    * nulls when the array is empty/null.
    */
  def normalize(
      df: DataFrame,
      metaPaths: Seq[String],
      recordPath: Seq[String],
      recordFields: Seq[String],
      recordPrefix: String = ""
  ): DataFrame = {
    require(recordPath.nonEmpty, "use meta() when there is no recordPath")
    // Explode one level at a time: rec0 = explode(a), rec1 = explode(rec0.b)…
    val exploded = recordPath.zipWithIndex.foldLeft(df) { case (d, (seg, i)) =>
      val src: Column = if (i == 0) col(seg) else col(s"__rec${i - 1}").getField(seg)
      d.withColumn(s"__rec$i", explode_outer(src))
    }
    val rec = col(s"__rec${recordPath.size - 1}")
    val metaCols = metaPaths.map(p => col(p).as(p))
    val recCols = recordFields.map(f => rec.getField(f).as(recordPrefix + f))
    exploded.select(metaCols ++ recCols: _*)
  }
}
