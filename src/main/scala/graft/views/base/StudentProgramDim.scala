package graft.views.base

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DateKeys, Descriptors}
import graft.views.{AmtView, ViewContext}

/** AMT StudentProgramDim — reference
  * parquet/amt/base/student_program_dim/main.py:34-240.
  *
  * studentProgramAssociations ⋈ programTypeDescriptors (code value) ⋈
  * studentSchoolAssociations (student) ⋈ programs (href id + org id),
  * restricted to currently-enrolled students (missing exit date counts as
  * enrolled — the reference admits those rows via its NaN-string
  * comparison accident; the intent is explicit here). 7-part surrogate
  * key per (student, school, program, begin date). */
object StudentProgramDim extends AmtView {
  val name = "studentProgramDim"
  val collection = "base"
  val outputColumns = Seq(
    "StudentSchoolProgramKey", "BeginDateKey", "EducationOrganizationId",
    "ProgramName", "StudentKey", "SchoolKey", "StudentSchoolKey",
    "EducationOrganizationKey")
  val endpointDeps = Seq(
    "programs", "studentSchoolAssociations", "studentProgramAssociations",
    "programTypeDescriptors")

  def build(ctx: ViewContext): DataFrame = {
    val assoc = ctx.endpoint("studentProgramAssociations").select(
      col("studentReference.studentUniqueId").as("studentKey"),
      DateKeys.dateKey(col("beginDate")).as("beginDateKey"),
      col("programReference.programName").as("programName"),
      Descriptors.codeValueFromUri(col("programReference.programTypeDescriptor"))
        .as("programTypeCode"),
      col("programReference.educationOrganizationId").as("programOrgId"),
      Descriptors.idFromHref(col("programReference.link.href")).as("programReferenceId"),
      col("educationOrganizationReference.educationOrganizationId").as("assocOrgId"))

    val types = ctx.endpoint("programTypeDescriptors").select(
      col("programTypeDescriptorId"), col("codeValue").as("programTypeCode"))

    val enrollment = ctx.endpoint("studentSchoolAssociations").select(
      col("studentReference.studentUniqueId").as("studentKey"),
      col("schoolReference.schoolId").as("schoolId"),
      DateKeys.dateKey(col("exitWithdrawDate")).as("exitKey"))
      .filter(col("exitKey") === "" || col("exitKey") >= DateKeys.todayKey)

    val programs = ctx.endpoint("programs").select(
      col("id").as("programReferenceId"),
      col("educationOrganizationReference.educationOrganizationId").as("programOrgId"))

    assoc
      .join(broadcast(types), Seq("programTypeCode"), "inner")
      .join(enrollment, Seq("studentKey"), "inner")
      .join(broadcast(programs), Seq("programReferenceId", "programOrgId"), "inner")
      .select(
        concat_ws("-", col("studentKey"), col("schoolId").cast("string"),
          col("programName"), col("programTypeDescriptorId").cast("string"),
          col("assocOrgId").cast("string"), col("programOrgId").cast("string"),
          col("beginDateKey")).as("StudentSchoolProgramKey"),
        col("beginDateKey").as("BeginDateKey"),
        col("programOrgId").cast("string").as("EducationOrganizationId"),
        col("programName").as("ProgramName"),
        col("studentKey").as("StudentKey"),
        col("schoolId").cast("string").as("SchoolKey"),
        concat_ws("-", col("studentKey"), col("schoolId").cast("string"))
          .as("StudentSchoolKey"),
        col("assocOrgId").cast("string").as("EducationOrganizationKey"))
      .select(outputColumns.map(col): _*)
  }
}
