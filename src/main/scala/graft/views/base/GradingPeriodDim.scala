package graft.views.base

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DateKeys, Descriptors}
import graft.views.{AmtView, ViewContext}

/** AMT GradingPeriodDim — reference
  * parquet/amt/base/grading_period_dim/main.py:37-145.
  *
  * gradingPeriods ⋈ gradingPeriodDescriptors on descriptor code value;
  * surrogate key descriptorId-schoolKey-beginDateKey (main.py:125-129).
  * The descriptor table is tiny at any scale — broadcast.
  */
object GradingPeriodDim extends AmtView {
  val name = "gradingPeriodDim"
  val collection = "base"
  val outputColumns = Seq(
    "GradingPeriodKey", "GradingPeriodBeginDateKey", "GradingPeriodEndDateKey",
    "GradingPeriodDescription", "TotalInstructionalDays", "PeriodSequence",
    "SchoolKey", "SchoolYear")
  val endpointDeps = Seq("gradingPeriods", "gradingPeriodDescriptors")

  def build(ctx: ViewContext): DataFrame = {
    val gp = ctx.endpoint("gradingPeriods").select(
      col("schoolReference.schoolId").as("schoolId"),
      col("beginDate"), col("endDate"),
      // main.py:65 replaces the URI by its code value in place
      Descriptors.codeValueFromUri(col("gradingPeriodDescriptor"))
        .as("gradingPeriodDescriptorCodeValue"),
      col("totalInstructionalDays"), col("periodSequence"),
      col("schoolYearTypeReference.schoolYear").as("schoolYear"))

    val gpd = ctx.endpoint("gradingPeriodDescriptors").select(
      col("gradingPeriodDescriptorId"),
      col("codeValue").as("gradingPeriodDescriptorCodeValue"))

    gp.join(broadcast(gpd), Seq("gradingPeriodDescriptorCodeValue"), "inner")
      .select(
        concat_ws("-",
          col("gradingPeriodDescriptorId").cast("string"),
          col("schoolId").cast("string"),
          DateKeys.dateKey(col("beginDate"))).as("GradingPeriodKey"),
        DateKeys.dateKey(col("beginDate")).as("GradingPeriodBeginDateKey"),
        DateKeys.dateKey(col("endDate")).as("GradingPeriodEndDateKey"),
        col("gradingPeriodDescriptorCodeValue").as("GradingPeriodDescription"),
        col("totalInstructionalDays").as("TotalInstructionalDays"),
        col("periodSequence").as("PeriodSequence"),
        col("schoolId").cast("string").as("SchoolKey"),
        col("schoolYear").cast("string").as("SchoolYear"))
      .select(outputColumns.map(col): _*)
  }
}
