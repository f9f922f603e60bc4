package graft.views.ews

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DateKeys, DescriptorMap, Descriptors}
import graft.views.{AmtView, ViewContext}

/** AMT ews.StudentSectionGradeFact — reference
  * parquet/amt/ews/student_section_grade_fact/main.py:30-253.
  *
  * grades left-joined to gradingPeriods (4-col natural key) for the
  * grading-period begin date; the letter→numeric lookup (A/B/C/D/F →
  * 95/85/75/65/55, main.py:40-47) replaces numeric grades recorded as 0
  * (main.py:142); grade types filtered to GradingPeriod/Semester/Final via
  * the constant map (main.py:236-238). Keys are the reference's 3/7/5-part
  * '-' concatenations. The two descriptor-ish lookups are broadcast.
  */
object StudentSectionGradeFact extends AmtView {
  val name = "ews_studentSectionGradeFact"
  val collection = "ews"
  val outputColumns = Seq(
    "StudentKey", "SchoolKey", "GradingPeriodKey", "StudentSectionKey",
    "SectionKey", "NumericGradeEarned", "LetterGradeEarned", "GradeType")
  val endpointDeps = Seq("grades", "gradingPeriods", "gradingPeriodDescriptors")

  def build(ctx: ViewContext): DataFrame = {
    val spark = ctx.spark
    import spark.implicits._

    val letterGrades = Seq(("A", 95.0), ("B", 85.0), ("C", 75.0), ("D", 65.0), ("F", 55.0))
      .toDF("letterJoin", "numericGradeEarnedJoin")

    val grades = ctx.endpoint("grades").select(
      col("gradingPeriodReference.gradingPeriodDescriptor").as("gpDescriptorUri"),
      col("gradingPeriodReference.periodSequence").as("gpPeriodSequence"),
      col("gradingPeriodReference.schoolId").as("gpSchoolId"),
      col("gradingPeriodReference.schoolYear").as("gpSchoolYear"),
      col("letterGradeEarned"), col("numericGradeEarned"),
      col("studentSectionAssociationReference.studentUniqueId").as("studentKey"),
      col("studentSectionAssociationReference.schoolId").as("schoolId"),
      col("studentSectionAssociationReference.beginDate").as("ssaBeginDate"),
      col("studentSectionAssociationReference.localCourseCode").as("localCourseCode"),
      col("studentSectionAssociationReference.schoolYear").as("schoolYear"),
      col("studentSectionAssociationReference.sectionIdentifier").as("sectionIdentifier"),
      col("studentSectionAssociationReference.sessionName").as("sessionName"),
      col("gradeTypeDescriptor"))

    val gradingPeriods = ctx.endpoint("gradingPeriods").select(
      col("gradingPeriodDescriptor").as("gpDescriptorUri"),
      col("periodSequence").as("gpPeriodSequence"),
      col("schoolReference.schoolId").as("gpSchoolId"),
      col("schoolYearTypeReference.schoolYear").as("gpSchoolYear"),
      col("beginDate").as("gpBeginDate"))

    val descriptors = ctx.endpoint("gradingPeriodDescriptors").select(
      col("gradingPeriodDescriptorId"),
      col("codeValue").as("gpCodeValue"))

    val withPeriod = grades.join(gradingPeriods,
      Seq("gpDescriptorUri", "gpPeriodSequence", "gpSchoolId", "gpSchoolYear"), "left")

    val withNumeric = withPeriod
      .join(broadcast(letterGrades), col("letterGradeEarned") === col("letterJoin"), "left")
      .withColumn("numericGradeEarned",
        when(col("numericGradeEarned") === 0, col("numericGradeEarnedJoin"))
          .otherwise(col("numericGradeEarned")))

    val withDescriptor = withNumeric
      .withColumn("gpCodeValue", Descriptors.codeValueFromUri(col("gpDescriptorUri")))
      .join(broadcast(descriptors), Seq("gpCodeValue"), "inner")

    val typed = DescriptorMap.withConstant(withDescriptor, "gradeTypeDescriptor")
      .filter(
        coalesce(col("gradeTypeDescriptor_constantName").contains("GradeType.GradingPeriod"), lit(false)) ||
          coalesce(col("gradeTypeDescriptor_constantName").contains("GradeType.Semester"), lit(false)) ||
          coalesce(col("gradeTypeDescriptor_constantName").contains("GradeType.Final"), lit(false)))

    val schoolKey = col("schoolId").cast("string")
    val ssaBeginKey = DateKeys.dateKey(col("ssaBeginDate"))

    typed.select(
      col("studentKey").as("StudentKey"),
      schoolKey.as("SchoolKey"),
      concat_ws("-", col("gradingPeriodDescriptorId").cast("string"), schoolKey,
        DateKeys.dateKey(col("gpBeginDate"))).as("GradingPeriodKey"),
      concat_ws("-", col("studentKey"), schoolKey, col("localCourseCode"),
        col("schoolYear").cast("string"), col("sectionIdentifier"),
        col("sessionName"), ssaBeginKey).as("StudentSectionKey"),
      concat_ws("-", schoolKey, col("localCourseCode"),
        col("schoolYear").cast("string"), col("sectionIdentifier"),
        col("sessionName")).as("SectionKey"),
      col("numericGradeEarned").as("NumericGradeEarned"),
      coalesce(col("letterGradeEarned"), lit("")).as("LetterGradeEarned"),
      Descriptors.codeValueFromUri(col("gradeTypeDescriptor")).as("GradeType"))
      .select(outputColumns.map(col): _*)
  }
}
