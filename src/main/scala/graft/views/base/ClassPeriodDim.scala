package graft.views.base

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.views.{AmtView, ViewContext}

/** AMT ClassPeriodDim — reference
  * parquet/amt/base/class_period_dim/main.py:30-131: sections with their
  * classPeriods array exploded (outer: a section with no class periods
  * keeps one row with null name, matching the reference's left merge). */
object ClassPeriodDim extends AmtView {
  val name = "classPeriodDim"
  val collection = "base"
  val outputColumns = Seq(
    "ClassPeriodKey", "SectionKey", "ClassPeriodName", "LocalCourseCode",
    "SchoolId", "SchoolKey", "SchoolYear", "SectionIdentifier", "SessionName")
  val endpointDeps = Seq("sections")

  def build(ctx: ViewContext): DataFrame = {
    val schoolKey = col("courseOfferingReference.schoolId").cast("string")
    val yearKey = col("courseOfferingReference.schoolYear").cast("string")
    ctx.endpoint("sections")
      .withColumn("cp", explode_outer(col("classPeriods")))
      .select(
        concat_ws("-", col("cp.classPeriodReference.classPeriodName"),
          col("courseOfferingReference.localCourseCode"), schoolKey, yearKey,
          col("sectionIdentifier"), col("courseOfferingReference.sessionName"))
          .as("ClassPeriodKey"),
        concat_ws("-", schoolKey,
          col("courseOfferingReference.localCourseCode"), yearKey,
          col("sectionIdentifier"), col("courseOfferingReference.sessionName"))
          .as("SectionKey"),
        col("cp.classPeriodReference.classPeriodName").as("ClassPeriodName"),
        col("courseOfferingReference.localCourseCode").as("LocalCourseCode"),
        schoolKey.as("SchoolId"),
        schoolKey.as("SchoolKey"),
        yearKey.as("SchoolYear"),
        col("sectionIdentifier").as("SectionIdentifier"),
        col("courseOfferingReference.sessionName").as("SessionName"))
      .select(outputColumns.map(col): _*)
  }
}
