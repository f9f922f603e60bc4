package graft.views

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One AMT gold view (the reference's 41 `main.py` view builders, SURVEY.md
  * §2 census). A view is a pure function of resolved endpoints and other
  * views — the Spark equivalent of the reference's
  * `@create_parquet_file`-decorated pandas programs.
  *
  * Contract carried over from the reference:
  *   - [[outputColumns]] is the fixed output schema (RESULT_COLUMNS); the
  *     build ends with a projection onto it.
  *   - Missing/empty source endpoints produce an empty result with the same
  *     schema, never an error (SURVEY §7.4.1).
  *   - Key columns are strings; date keys are `yyyyMMdd` strings with ''
  *     for missing (SURVEY §1.2).
  */
trait AmtView {
  def name: String
  def collection: String
  def outputColumns: Seq[String]
  def endpointDeps: Seq[String]
  def viewDeps: Seq[String] = Nil
  def build(ctx: ViewContext): DataFrame
}

/** Resolver handed to a view's build: endpoints come from the silver layer,
  * views from the shared memoized registry (the reference's gold-parquet
  * read-back cache, pandasWrapper.py:227-235, collapses into this). */
final case class ViewContext(
    spark: SparkSession,
    endpoint: String => DataFrame,
    view: String => DataFrame
)
