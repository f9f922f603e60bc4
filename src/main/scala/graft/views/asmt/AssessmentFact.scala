package graft.views.asmt

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Descriptors
import graft.views.{AmtView, ViewContext}

/** AMT asmt.AssessmentFact — reference
  * parquet/amt/asmt/assessment_fact/main.py:41-534.
  *
  * Assessments fanned out over their three metadata arrays (grade levels ×
  * scores × academic subjects — the reference normalizes each separately
  * and left-merges on (identifier, namespace); three sequential
  * explode_outer calls produce the identical cross product in one scan),
  * left-joined to objective assessments similarly fanned over scores ×
  * learning standards, with five broadcast descriptor-description lookups
  * and assessment-level score fields falling back to objective-level ones.
  */
object AssessmentFact extends AmtView {
  val name = "asmt_assessmentFact"
  val collection = "asmt"
  val outputColumns = Seq(
    "AssessmentFactKey", "AssessmentKey", "AssessmentIdentifier", "Namespace",
    "Title", "Version", "Category", "AssessedGradeLevel", "AcademicSubject",
    "ResultDataType", "ReportingMethod", "ObjectiveAssessmentKey",
    "IdentificationCode", "ParentObjectiveAssessmentKey",
    "ObjectiveAssessmentDescription", "PercentOfAssessment", "MinScore",
    "MaxScore", "LearningStandard")
  val endpointDeps = Seq(
    "assessments", "objectiveAssessments", "assessmentCategoryDescriptors",
    "gradeLevelDescriptors", "assessmentReportingMethodDescriptors",
    "academicSubjectDescriptors", "resultDatatypeTypeDescriptors")

  /** descriptor endpoint → (code, id, description) lookup with prefixed names. */
  private def lookup(df: DataFrame, idField: String, p: String): DataFrame =
    df.select(
      col("codeValue").as(s"${p}Code"),
      col(idField).as(s"${p}Id"),
      col("description").as(s"${p}Description"))

  private def blank(c: Column): Column = coalesce(c.cast("string"), lit(""))

  def build(ctx: ViewContext): DataFrame = {
    val categories = lookup(ctx.endpoint("assessmentCategoryDescriptors"),
      "assessmentCategoryDescriptorId", "category")
    val gradeLevels = lookup(ctx.endpoint("gradeLevelDescriptors"),
      "gradeLevelDescriptorId", "gradeLevel")
    val reporting = lookup(ctx.endpoint("assessmentReportingMethodDescriptors"),
      "assessmentReportingMethodDescriptorId", "reporting")
    val subjects = lookup(ctx.endpoint("academicSubjectDescriptors"),
      "academicSubjectDescriptorId", "subject")
    val datatypes = lookup(ctx.endpoint("resultDatatypeTypeDescriptors"),
      "resultDatatypeTypeDescriptorId", "datatype")

    val assessments = ctx.endpoint("assessments")
      .withColumn("gl", explode_outer(col("assessedGradeLevels")))
      .withColumn("score", explode_outer(col("scores")))
      .withColumn("subj", explode_outer(col("academicSubjects")))
      .select(
        col("assessmentIdentifier"), col("namespace"),
        col("assessmentTitle"), col("assessmentVersion"),
        Descriptors.codeValueFromUri(col("assessmentCategoryDescriptor")).as("categoryCode"),
        Descriptors.codeValueFromUri(col("gl.gradeLevelDescriptor")).as("gradeLevelCode"),
        Descriptors.codeValueFromUri(col("score.assessmentReportingMethodDescriptor")).as("reportingCode"),
        col("score.maximumScore").as("maxScore"),
        col("score.minimumScore").as("minScore"),
        Descriptors.codeValueFromUri(col("score.resultDatatypeTypeDescriptor")).as("datatypeCode"),
        Descriptors.codeValueFromUri(col("subj.academicSubjectDescriptor")).as("subjectCode"))

    val objectives = ctx.endpoint("objectiveAssessments")
      .withColumn("score", explode_outer(col("scores")))
      .withColumn("ls", explode_outer(col("learningStandards")))
      .select(
        col("assessmentReference.assessmentIdentifier").as("assessmentIdentifier"),
        col("assessmentReference.namespace").as("namespace"),
        col("assessmentReference.assessmentIdentifier").as("objIdentifier"),
        col("assessmentReference.namespace").as("objNamespace"),
        col("identificationCode"),
        col("parentObjectiveAssessmentReference.assessmentIdentifier").as("parentIdentifier"),
        col("parentObjectiveAssessmentReference.identificationCode").as("parentIdentificationCode"),
        col("parentObjectiveAssessmentReference.namespace").as("parentNamespace"),
        col("description").as("objDescription"),
        col("percentOfAssessment"),
        Descriptors.codeValueFromUri(col("score.assessmentReportingMethodDescriptor")).as("objReportingCode"),
        col("score.maximumScore").as("objMaxScore"),
        col("score.minimumScore").as("objMinScore"),
        Descriptors.codeValueFromUri(col("score.resultDatatypeTypeDescriptor")).as("objDatatypeCode"),
        col("ls.learningStandardReference.learningStandardId").as("learningStandardId"))

    val objReporting = reporting.select(
      col("reportingCode").as("objReportingCode"),
      col("reportingId").as("objReportingId"),
      col("reportingDescription").as("objReportingDescription"))
    val objDatatypes = datatypes.select(
      col("datatypeCode").as("objDatatypeCode"),
      col("datatypeDescription").as("objDatatypeDescription"))

    def pick(primary: Column, fallback: Column): Column = {
      val p = blank(primary)
      when(p =!= "", p).otherwise(blank(fallback))
    }

    assessments
      .join(objectives, Seq("assessmentIdentifier", "namespace"), "left")
      .join(broadcast(categories), Seq("categoryCode"), "left")
      .join(broadcast(gradeLevels), Seq("gradeLevelCode"), "left")
      .join(broadcast(reporting), Seq("reportingCode"), "left")
      .join(broadcast(subjects), Seq("subjectCode"), "left")
      .join(broadcast(datatypes), Seq("datatypeCode"), "left")
      .join(broadcast(objReporting), Seq("objReportingCode"), "left")
      .join(broadcast(objDatatypes), Seq("objDatatypeCode"), "left")
      .select(
        concat_ws("-", col("assessmentIdentifier"), col("namespace"),
          blank(col("gradeLevelId")), blank(col("reportingId")),
          blank(col("subjectId")), blank(col("identificationCode")),
          blank(col("parentIdentificationCode")), blank(col("objReportingId")),
          blank(col("learningStandardId"))).as("AssessmentFactKey"),
        concat_ws("-", col("assessmentIdentifier"), col("namespace")).as("AssessmentKey"),
        col("assessmentIdentifier").as("AssessmentIdentifier"),
        col("namespace").as("Namespace"),
        col("assessmentTitle").as("Title"),
        blank(col("assessmentVersion")).as("Version"),
        blank(col("categoryDescription")).as("Category"),
        blank(col("gradeLevelDescription")).as("AssessedGradeLevel"),
        blank(col("subjectDescription")).as("AcademicSubject"),
        pick(col("datatypeDescription"), col("objDatatypeDescription")).as("ResultDataType"),
        pick(col("reportingDescription"), col("objReportingDescription")).as("ReportingMethod"),
        when(col("objIdentifier").isNotNull,
          concat_ws("-", col("objIdentifier"), blank(col("identificationCode")),
            col("objNamespace"))).otherwise("").as("ObjectiveAssessmentKey"),
        blank(col("identificationCode")).as("IdentificationCode"),
        when(col("parentIdentifier").isNotNull,
          concat_ws("-", col("parentIdentifier"), blank(col("parentIdentificationCode")),
            blank(col("parentNamespace")))).otherwise("").as("ParentObjectiveAssessmentKey"),
        blank(col("objDescription")).as("ObjectiveAssessmentDescription"),
        blank(col("percentOfAssessment")).as("PercentOfAssessment"),
        pick(col("minScore"), col("objMinScore")).as("MinScore"),
        pick(col("maxScore"), col("objMaxScore")).as("MaxScore"),
        blank(col("learningStandardId")).as("LearningStandard"))
      .select(outputColumns.map(col): _*)
  }
}
