package graft.views.base

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{Crosstab, DateKeys, Descriptors}
import graft.views.{AmtView, ViewContext}

/** AMT AllStudentSchoolDim — reference
  * parquet/amt/base/all_student_school_dim/main.py:48-597 (the largest
  * dimension).
  *
  * Enrollment ⋈ students ⋈ schools, decorated with demographic attributes
  * resolved from studentEducationOrganizationAssociations at two levels —
  * school-level first, district(LEA)-level as fallback (the reference's
  * ''-aware apply-lambda cascade, main.py:429-483, expressed as
  * when/otherwise). The five studentIndicators (Internet Access, Device…)
  * are one explode + pivot-first here instead of the reference's five
  * sequential filtered self-joins (main.py:174-234) — same columns, one
  * shuffle instead of five.
  *
  * Output conventions preserved: EnrollmentDateKey/ExitWithdrawDate stay
  * raw ISO strings (the reference only key-formats inside
  * AllStudentSchoolKey); '' → 'Not applicable' (LEP) / 'n/a' (indicators) /
  * 'Unknown' (school year); IsEnrolled treats missing exit date as
  * enrolled (SURVEY §7.4.4).
  */
object AllStudentSchoolDim extends AmtView {
  val name = "allStudentSchoolDim"
  val collection = "base"
  val outputColumns = Seq(
    "AllStudentSchoolKey", "StudentSchoolKey", "StudentKey", "SchoolKey",
    "SchoolYear", "StudentFirstName", "StudentMiddleName", "StudentLastName",
    "BirthDate", "EnrollmentDateKey", "GradeLevel",
    "LimitedEnglishProficiency", "IsHispanic", "Sex",
    "InternetAccessInResidence", "InternetAccessTypeInResidence",
    "InternetPerformance", "DigitalDevice", "DeviceAccess", "IsEnrolled",
    "ExitWithdrawDate")
  val endpointDeps = Seq(
    "studentSchoolAssociations", "studentEducationOrganizationAssociations",
    "students", "schools")

  private val IndicatorNames = Seq(
    "Internet Access In Residence", "Internet Access Type In Residence",
    "Internet Performance In Residence", "Digital Device", "Device Access")

  /** Demographic attributes + pivoted indicators per (student, edOrgId).
    * Shared with StudentLocalEducationAgencyDim (same pivot machinery at
    * LEA level). */
  private[base] def edOrgAttributes(edorg: DataFrame, suffix: String): DataFrame = {
    val base = edorg.select(
      col("id"),
      col("educationOrganizationReference.educationOrganizationId").as(s"edOrgId$suffix"),
      col("studentReference.studentUniqueId").as(s"edOrgStudent$suffix"),
      col("hispanicLatinoEthnicity").as(s"hispanic$suffix"),
      Descriptors.codeValueFromUri(coalesce(col("limitedEnglishProficiencyDescriptor"), lit("")))
        .as(s"lep$suffix"),
      Descriptors.codeValueFromUri(col("sexDescriptor")).as(s"sex$suffix"))
    val indicators = edorg.select(
      col("id"), explode_outer(col("studentIndicators")).as("ind"))
      .select(col("id"),
        col("ind.indicatorName").as("indicatorName"),
        col("ind.indicator").as("indicator"))
    val pivoted = Crosstab.values(
      indicators, Seq("id"), "indicatorName", IndicatorNames, "indicator")
      .select(col("id") +:
        IndicatorNames.zipWithIndex.map { case (n, i) =>
          col(s"`$n`").as(s"ind$i$suffix")
        }: _*)
    base.join(pivoted, Seq("id"), "left").drop("id")
  }

  def build(ctx: ViewContext): DataFrame = {
    val ssa = ctx.endpoint("studentSchoolAssociations").select(
      col("schoolReference.schoolId").as("schoolId"),
      col("studentReference.studentUniqueId").as("studentUniqueId"),
      col("schoolYearTypeReference.schoolYear").as("schoolYear"),
      col("entryDate"),
      Descriptors.codeValueFromUri(col("entryGradeLevelDescriptor")).as("gradeLevel"),
      col("exitWithdrawDate"))

    val students = ctx.endpoint("students").select(
      col("studentUniqueId"), col("birthDate"),
      col("firstName"), col("lastSurname"), col("middleName"))

    val schools = ctx.endpoint("schools").select(
      col("schoolId"),
      col("localEducationAgencyReference.localEducationAgencyId").as("leaId"))

    val edorg = ctx.endpoint("studentEducationOrganizationAssociations")
    val schoolLevel = edOrgAttributes(edorg, "S")
    val districtLevel = edOrgAttributes(edorg, "D")

    val joined = ssa
      .join(students, Seq("studentUniqueId"), "inner")
      .join(broadcast(schools), Seq("schoolId"), "inner")
      .join(schoolLevel,
        col("studentUniqueId") === col("edOrgStudentS") &&
          col("schoolId") === col("edOrgIdS"), "left")
      .join(districtLevel,
        col("studentUniqueId") === col("edOrgStudentD") &&
          col("leaId") === col("edOrgIdD"), "left")

    /** student-level value if present (non-null, non-''), else district. */
    def pick(s: Column, d: Column): Column = {
      val sv = coalesce(s.cast("string"), lit(""))
      when(sv =!= "", sv).otherwise(coalesce(d.cast("string"), lit("")))
    }
    def orDefault(c: Column, default: String): Column =
      when(c === "", default).otherwise(c)

    val exitKey = DateKeys.dateKey(col("exitWithdrawDate"))
    val schoolKey = col("schoolId").cast("string")

    joined.select(
      concat_ws("-", col("studentUniqueId"), schoolKey,
        DateKeys.dateKey(col("entryDate"))).as("AllStudentSchoolKey"),
      concat_ws("-", col("studentUniqueId"), schoolKey).as("StudentSchoolKey"),
      col("studentUniqueId").as("StudentKey"),
      schoolKey.as("SchoolKey"),
      coalesce(col("schoolYear").cast("string"), lit("Unknown")).as("SchoolYear"),
      col("firstName").as("StudentFirstName"),
      coalesce(col("middleName"), lit("")).as("StudentMiddleName"),
      col("lastSurname").as("StudentLastName"),
      coalesce(col("birthDate"), lit("")).as("BirthDate"),
      coalesce(col("entryDate"), lit("")).as("EnrollmentDateKey"),
      coalesce(col("gradeLevel"), lit("")).as("GradeLevel"),
      orDefault(pick(col("lepS"), col("lepD")), "Not applicable")
        .as("LimitedEnglishProficiency"),
      when(pick(col("hispanicS"), col("hispanicD")) === "true", 1).otherwise(0)
        .as("IsHispanic"),
      pick(col("sexS"), col("sexD")).as("Sex"),
      orDefault(pick(col("ind0S"), col("ind0D")), "n/a").as("InternetAccessInResidence"),
      orDefault(pick(col("ind1S"), col("ind1D")), "n/a").as("InternetAccessTypeInResidence"),
      orDefault(pick(col("ind2S"), col("ind2D")), "n/a").as("InternetPerformance"),
      orDefault(pick(col("ind3S"), col("ind3D")), "n/a").as("DigitalDevice"),
      orDefault(pick(col("ind4S"), col("ind4D")), "n/a").as("DeviceAccess"),
      when(exitKey > DateKeys.todayKey || exitKey === "", 1).otherwise(0)
        .as("IsEnrolled"),
      coalesce(col("exitWithdrawDate"), lit("")).as("ExitWithdrawDate"))
      .select(outputColumns.map(col): _*)
  }
}

/** AMT StudentSchoolDim — reference
  * parquet/amt/base/student_school_dim/main.py:29-66: the currently
  * enrolled subset of AllStudentSchoolDim (IsEnrolled == 1) minus the
  * enrollment-history columns. First consumer of the view-on-view DAG. */
object StudentSchoolDim extends AmtView {
  val name = "studentSchoolDim"
  val collection = "base"
  val outputColumns = AllStudentSchoolDim.outputColumns
    .filterNot(Set("AllStudentSchoolKey", "IsEnrolled", "ExitWithdrawDate"))
  val endpointDeps = Seq.empty
  override val viewDeps = Seq("allStudentSchoolDim")

  def build(ctx: ViewContext): DataFrame =
    ctx.view("allStudentSchoolDim")
      .filter(col("IsEnrolled") === 1)
      .select(outputColumns.map(col): _*)
}
