package graft.views.asmt

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{DateKeys, Descriptors}
import graft.views.{AmtView, ViewContext}

/** AMT asmt.StudentAssessmentFact — reference
  * parquet/amt/asmt/student_assessment_fact/main.py:43-508.
  *
  * The deepest nested-scan view (SURVEY §2.1 S5): studentAssessments carry
  * assessment-level scoreResults and performanceLevels arrays plus a
  * studentObjectiveAssessments array whose elements hold their own
  * scoreResults/performanceLevels — the reference's two-level recordPaths
  * (`['studentObjectiveAssessments','scoreResults']`, main.py:232) become
  * nested explode_outer calls. Student-objective score/performance fields
  * fall back to assessment-level ones; rows restricted to enrolled
  * students (exit ≥ today, '' = enrolled), school key from enrollment.
  */
object StudentAssessmentFact extends AmtView {
  val name = "asmt_studentAssessmentFact"
  val collection = "asmt"
  val outputColumns = Seq(
    "StudentAssessmentFactKey", "StudentAssessmentKey",
    "StudentObjectiveAssessmentKey", "ObjectiveAssessmentKey", "AssessmentKey",
    "AssessmentIdentifier", "Namespace", "StudentAssessmentIdentifier",
    "StudentKey", "StudentSchoolKey", "SchoolKey", "AdministrationDate",
    "AdministrationDateKey", "AssessedGradeLevel", "StudentScore",
    "ResultDataType", "ReportingMethod", "PerformanceResult",
    "StudentAssessmentScore", "StudentAssessmentResultDataType",
    "StudentAssessmentReportingMethod", "StudentAssessmentPerformanceResult")
  val endpointDeps = Seq(
    "studentAssessments", "studentSchoolAssociations",
    "assessmentReportingMethodDescriptors", "performanceLevelDescriptors")

  private def blank(c: Column): Column = coalesce(c.cast("string"), lit(""))

  def build(ctx: ViewContext): DataFrame = {
    val reporting = ctx.endpoint("assessmentReportingMethodDescriptors").select(
      col("codeValue").as("reportingCode"),
      col("assessmentReportingMethodDescriptorId").as("reportingId"))
    val perfLevels = ctx.endpoint("performanceLevelDescriptors").select(
      col("codeValue").as("perfCode"),
      col("performanceLevelDescriptorId").as("perfId"))

    val exploded = ctx.endpoint("studentAssessments")
      .withColumn("sr", explode_outer(col("scoreResults")))
      .withColumn("pl", explode_outer(col("performanceLevels")))
      .withColumn("soa", explode_outer(col("studentObjectiveAssessments")))
      .withColumn("soaSr", explode_outer(col("soa.scoreResults")))
      .withColumn("soaPl", explode_outer(col("soa.performanceLevels")))
      .select(
        col("assessmentReference.assessmentIdentifier").as("assessmentIdentifier"),
        col("assessmentReference.namespace").as("namespace"),
        col("studentAssessmentIdentifier"),
        col("studentReference.studentUniqueId").as("studentKey"),
        col("administrationDate"),
        Descriptors.codeValueFromUri(col("whenAssessedGradeLevelDescriptor"))
          .as("assessedGradeLevel"),
        // assessment-level score + performance
        Descriptors.codeValueFromUri(col("sr.assessmentReportingMethodDescriptor"))
          .as("saReportingCode"),
        col("sr.result").as("saResult"),
        Descriptors.codeValueFromUri(col("sr.resultDatatypeTypeDescriptor"))
          .as("saDatatypeCode"),
        Descriptors.codeValueFromUri(col("pl.performanceLevelDescriptor"))
          .as("saPerfCode"),
        // student-objective level
        col("soa.objectiveAssessmentReference.identificationCode").as("identificationCode"),
        Descriptors.codeValueFromUri(col("soaSr.assessmentReportingMethodDescriptor"))
          .as("soReportingCode"),
        col("soaSr.result").as("soResult"),
        Descriptors.codeValueFromUri(col("soaSr.resultDatatypeTypeDescriptor"))
          .as("soDatatypeCode"),
        Descriptors.codeValueFromUri(col("soaPl.performanceLevelDescriptor"))
          .as("soPerfCode"))

    val enrollment = ctx.endpoint("studentSchoolAssociations").select(
      col("studentReference.studentUniqueId").as("studentKey"),
      col("schoolReference.schoolId").as("schoolId"),
      col("entryDate"),
      DateKeys.dateKey(col("exitWithdrawDate")).as("exitKey"))
      .filter(col("exitKey") === "" || col("exitKey") >= DateKeys.todayKey)

    def pick(primary: Column, fallback: Column): Column = {
      val p = blank(primary)
      when(p =!= "", p).otherwise(blank(fallback))
    }

    val saReporting = reporting.withColumnsRenamed(
      Map("reportingCode" -> "saReportingCode", "reportingId" -> "saReportingId"))
    val soReporting = reporting.withColumnsRenamed(
      Map("reportingCode" -> "soReportingCode", "reportingId" -> "soReportingId"))
    val saPerf = perfLevels.withColumnsRenamed(
      Map("perfCode" -> "saPerfCode", "perfId" -> "saPerfId"))
    val soPerf = perfLevels.withColumnsRenamed(
      Map("perfCode" -> "soPerfCode", "perfId" -> "soPerfId"))

    val schoolKey = col("schoolId").cast("string")
    val objCode = blank(col("identificationCode"))

    exploded
      .join(enrollment, Seq("studentKey"), "inner")
      .join(broadcast(saReporting), Seq("saReportingCode"), "left")
      .join(broadcast(soReporting), Seq("soReportingCode"), "left")
      .join(broadcast(saPerf), Seq("saPerfCode"), "left")
      .join(broadcast(soPerf), Seq("soPerfCode"), "left")
      .select(
        concat_ws("-", col("assessmentIdentifier"), col("namespace"),
          col("studentAssessmentIdentifier"), blank(col("saReportingId")),
          blank(col("saPerfId")), objCode, blank(col("soReportingId")),
          blank(col("soPerfId")), col("studentKey"), schoolKey,
          col("entryDate")).as("StudentAssessmentFactKey"),
        concat_ws("-", col("assessmentIdentifier"), col("namespace"),
          col("studentAssessmentIdentifier"), col("studentKey"))
          .as("StudentAssessmentKey"),
        when(objCode =!= "",
          concat_ws("-", col("studentKey"), objCode, col("assessmentIdentifier"),
            col("studentAssessmentIdentifier"), col("namespace")))
          .otherwise("").as("StudentObjectiveAssessmentKey"),
        when(objCode =!= "",
          concat_ws("-", col("assessmentIdentifier"), objCode, col("namespace")))
          .otherwise("").as("ObjectiveAssessmentKey"),
        concat_ws("-", col("assessmentIdentifier"), col("namespace")).as("AssessmentKey"),
        col("assessmentIdentifier").as("AssessmentIdentifier"),
        col("namespace").as("Namespace"),
        col("studentAssessmentIdentifier").as("StudentAssessmentIdentifier"),
        col("studentKey").as("StudentKey"),
        concat_ws("-", col("studentKey"), schoolKey).as("StudentSchoolKey"),
        schoolKey.as("SchoolKey"),
        col("administrationDate").as("AdministrationDate"),
        DateKeys.dateKey(col("administrationDate")).as("AdministrationDateKey"),
        blank(col("assessedGradeLevel")).as("AssessedGradeLevel"),
        pick(col("soResult"), col("saResult")).as("StudentScore"),
        pick(col("soDatatypeCode"), col("saDatatypeCode")).as("ResultDataType"),
        pick(col("soReportingCode"), col("saReportingCode")).as("ReportingMethod"),
        pick(col("soPerfCode"), col("saPerfCode")).as("PerformanceResult"),
        blank(col("saResult")).as("StudentAssessmentScore"),
        blank(col("saDatatypeCode")).as("StudentAssessmentResultDataType"),
        blank(col("saReportingCode")).as("StudentAssessmentReportingMethod"),
        blank(col("saPerfCode")).as("StudentAssessmentPerformanceResult"))
      .select(outputColumns.map(col): _*)
  }
}
