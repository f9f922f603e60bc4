package graft.views.base

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DateKeys, Descriptors}
import graft.views.{AmtView, ViewContext}

/** AMT AcademicTimePeriodDim — reference
  * parquet/amt/base/academic_time_period_dim/main.py:41-201.
  *
  * sessions with their gradingPeriods array exploded (S5 recordPath),
  * inner-joined to termDescriptors + gradingPeriodDescriptors (by code
  * value) + schoolYearTypes (by year) + gradingPeriods (by href id, for
  * the period begin date). The three descriptor-ish sides broadcast. */
object AcademicTimePeriodDim extends AmtView {
  val name = "academicTimePeriodDim"
  val collection = "base"
  val outputColumns = Seq(
    "AcademicTimePeriodKey", "SchoolYear", "SchoolYearName",
    "IsCurrentSchoolYear", "SchoolKey", "SessionKey", "SessionName",
    "TermName", "GradingPeriodKey", "GradingPeriodName")
  val endpointDeps = Seq(
    "sessions", "gradingPeriods", "gradingPeriodDescriptors",
    "termDescriptors", "schoolYearTypes")

  def build(ctx: ViewContext): DataFrame = {
    val sessions = ctx.endpoint("sessions")
      .withColumn("gp", explode_outer(col("gradingPeriods")))
      .select(
        col("sessionName"),
        Descriptors.codeValueFromUri(col("termDescriptor")).as("termCode"),
        col("gp.gradingPeriodReference.schoolId").as("schoolId"),
        col("gp.gradingPeriodReference.schoolYear").as("schoolYear"),
        Descriptors.codeValueFromUri(col("gp.gradingPeriodReference.gradingPeriodDescriptor"))
          .as("gradingPeriodCode"),
        Descriptors.idFromHref(col("gp.gradingPeriodReference.link.href"))
          .as("gradingPeriodsId"))

    val terms = ctx.endpoint("termDescriptors").select(
      col("termDescriptorId"), col("codeValue").as("termCode"))
    val gpDescriptors = ctx.endpoint("gradingPeriodDescriptors").select(
      col("gradingPeriodDescriptorId"), col("codeValue").as("gradingPeriodCode"))
    val years = ctx.endpoint("schoolYearTypes").select(
      col("schoolYear"), col("currentSchoolYear"),
      col("schoolYearDescription"))
    val gradingPeriods = ctx.endpoint("gradingPeriods").select(
      col("id").as("gradingPeriodsId"), col("beginDate"))

    val schoolKey = col("schoolId").cast("string")
    val yearKey = col("schoolYear").cast("string")
    val beginKey = DateKeys.dateKey(col("beginDate"))

    sessions
      .join(broadcast(terms), Seq("termCode"), "inner")
      .join(broadcast(gpDescriptors), Seq("gradingPeriodCode"), "inner")
      .join(broadcast(years), Seq("schoolYear"), "inner")
      .join(gradingPeriods, Seq("gradingPeriodsId"), "inner")
      .select(
        concat_ws("-", schoolKey, yearKey,
          col("termDescriptorId").cast("string"),
          col("gradingPeriodDescriptorId").cast("string"),
          beginKey).as("AcademicTimePeriodKey"),
        yearKey.as("SchoolYear"),
        col("schoolYearDescription").as("SchoolYearName"),
        coalesce(col("currentSchoolYear").cast("int"), lit(0)).as("IsCurrentSchoolYear"),
        schoolKey.as("SchoolKey"),
        concat_ws("-", schoolKey, yearKey, col("sessionName")).as("SessionKey"),
        col("sessionName").as("SessionName"),
        col("termCode").as("TermName"),
        concat_ws("-", col("gradingPeriodDescriptorId").cast("string"),
          schoolKey, beginKey).as("GradingPeriodKey"),
        col("gradingPeriodCode").as("GradingPeriodName"))
      .select(outputColumns.map(col): _*)
  }
}
