package graft.views.equity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DateKeys, Descriptors}
import graft.views.{AmtView, ViewContext}

/** AMT equity.StudentProgramCohortDim — reference
  * parquet/amt/equity/student_program_cohort_dim/main.py:43-358: cohort
  * memberships fanned out by the cohort's programs, restricted to currently
  * enrolled students, with descriptor descriptions for cohort type and
  * entry grade level.
  *
  * Shape: studentCohortAssociations ⋈(cohort id from href) cohorts×programs
  * ⋈ cohortTypeDescriptors ⋈ programTypeDescriptors, then
  * ⋈(studentUniqueId) studentSchoolAssociations ⋈ gradeLevelDescriptors.
  * All three descriptor joins are inner (unmatched rows drop, main.py parity)
  * and broadcast — descriptor tables stay tiny at any corpus scale, so the
  * fact side never shuffles for them. The one real shuffle is the
  * association ⋈ enrollment join on studentUniqueId.
  *
  * Parity notes:
  *   - cohorts without a `programs` array contribute nothing (pandas
  *     record_path drops them) — plain `explode`, not explode_outer.
  *   - the enrollment filter keeps exitWithdrawDate >= today AND missing
  *     exit dates: pandas `astype(str)` turns NaN into 'nan', which
  *     compares greater than any digit string (main.py:236-307), so
  *     unwithdrawn students survive. Expressed here as `'' or >= today`.
  *   - CohortTypeDescriptor / EntryGradeLevelDescriptor are descriptor
  *     DESCRIPTIONS, not code values (main.py:343-344).
  */
object StudentProgramCohortDim extends AmtView {
  val name = "equity_studentProgramCohortDim"
  val collection = "equity"
  val outputColumns = Seq(
    "StudentProgramCohortKey", "StudentSchoolProgramKey", "StudentSchoolKey",
    "EntryGradeLevelDescriptor", "CohortTypeDescriptor", "CohortDescription",
    "ProgramName")
  val endpointDeps = Seq(
    "studentCohortAssociations", "cohorts", "studentSchoolAssociations",
    "cohortTypeDescriptors", "programTypeDescriptors", "gradeLevelDescriptors")

  def build(ctx: ViewContext): DataFrame = {
    val assoc = ctx.endpoint("studentCohortAssociations").select(
      Descriptors.idFromHref(col("cohortReference.link.href")).as("cohort_id"),
      col("studentReference.studentUniqueId").as("studentUniqueId"),
      col("beginDate"))

    val cohorts = ctx.endpoint("cohorts")
      .select(
        col("id").as("cohort_id"), col("cohortIdentifier"),
        col("cohortDescription"),
        Descriptors.codeValueFromUri(col("cohortTypeDescriptor")).as("cohortTypeCode"),
        col("educationOrganizationReference.educationOrganizationId")
          .as("educationOrganizationId"),
        explode(col("programs")).as("p"))
      .select(
        col("cohort_id"), col("cohortIdentifier"), col("cohortDescription"),
        col("cohortTypeCode"), col("educationOrganizationId"),
        col("p.programReference.educationOrganizationId")
          .as("programEducationOrganizationId"),
        col("p.programReference.programName").as("ProgramName"),
        Descriptors.codeValueFromUri(col("p.programReference.programTypeDescriptor"))
          .as("programTypeCode"))

    val cohortTypes = ctx.endpoint("cohortTypeDescriptors").select(
      col("codeValue").as("cohortTypeCode"),
      col("description").as("CohortTypeDescriptor"))
    val programTypes = ctx.endpoint("programTypeDescriptors").select(
      col("codeValue").as("programTypeCode"),
      col("programTypeDescriptorId"))
    val gradeLevels = ctx.endpoint("gradeLevelDescriptors").select(
      col("codeValue").as("gradeLevelCode"),
      col("description").as("EntryGradeLevelDescriptor"))

    val enrolled = ctx.endpoint("studentSchoolAssociations")
      .withColumn("exitKey", DateKeys.dateKey(col("exitWithdrawDate")))
      .filter(col("exitKey") === "" || col("exitKey") >= DateKeys.todayKey)
      .select(
        col("schoolReference.schoolId").cast("string").as("schoolKey"),
        col("studentReference.studentUniqueId").as("studentUniqueId"),
        Descriptors.codeValueFromUri(col("entryGradeLevelDescriptor"))
          .as("gradeLevelCode"))
      .join(broadcast(gradeLevels), Seq("gradeLevelCode"), "inner")

    val programKeyParts = concat_ws("-",
      col("studentUniqueId"), col("schoolKey"), col("ProgramName"),
      col("programTypeDescriptorId").cast("string"),
      col("educationOrganizationId").cast("string"),
      col("programEducationOrganizationId").cast("string"),
      DateKeys.dateKey(col("beginDate")))

    assoc
      .join(cohorts, Seq("cohort_id"), "inner")
      .join(broadcast(cohortTypes), Seq("cohortTypeCode"), "inner")
      .join(broadcast(programTypes), Seq("programTypeCode"), "inner")
      .join(enrolled, Seq("studentUniqueId"), "inner")
      .select(
        concat_ws("-", programKeyParts, col("cohortIdentifier"))
          .as("StudentProgramCohortKey"),
        programKeyParts.as("StudentSchoolProgramKey"),
        concat_ws("-", col("studentUniqueId"), col("schoolKey"))
          .as("StudentSchoolKey"),
        col("EntryGradeLevelDescriptor"),
        col("CohortTypeDescriptor"),
        col("cohortDescription").as("CohortDescription"),
        col("ProgramName"))
      .select(outputColumns.map(col): _*)
  }
}
