package graft.views.base

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.views.{AmtView, ViewContext}

/** AMT MostRecentGradingPeriod — reference
  * parquet/amt/base/most_recent_grading_period/main.py:27-42: group max of
  * GradingPeriodBeginDateKey per school over the GradingPeriodDim *view*
  * (first view-on-view dependency). The pandas version leaves SchoolKey as
  * the parquet index; we keep it as an ordinary column (SURVEY §7.4.9). */
object MostRecentGradingPeriod extends AmtView {
  val name = "mostRecentGradingPeriod"
  val collection = "base"
  val outputColumns = Seq("SchoolKey", "GradingPeriodBeginDateKey")
  val endpointDeps = Seq.empty
  override val viewDeps = Seq("gradingPeriodDim")

  def build(ctx: ViewContext): DataFrame =
    ctx.view("gradingPeriodDim")
      .groupBy("SchoolKey")
      .agg(max(col("GradingPeriodBeginDateKey")).as("GradingPeriodBeginDateKey"))
      .select(outputColumns.map(col): _*)
}
