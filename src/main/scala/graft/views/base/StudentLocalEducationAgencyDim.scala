package graft.views.base

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.DateKeys
import graft.views.{AmtView, ViewContext}

/** AMT StudentLocalEducationAgencyDim — reference
  * parquet/amt/base/student_local_education_agency_dim/main.py:38-346:
  * one row per (student, LEA) with demographics resolved from the
  * LEA-level studentEducationOrganizationAssociation (the indicator
  * name→value pivot, main.py:245-272, shares AllStudentSchoolDim's
  * explode+pivot machinery), restricted to currently-enrolled students. */
object StudentLocalEducationAgencyDim extends AmtView {
  val name = "studentLocalEducationAgencyDim"
  val collection = "base"
  val outputColumns = Seq(
    "StudentLocalEducationAgencyKey", "StudentKey", "LocalEducationAgencyKey",
    "StudentFirstName", "StudentMiddleName", "StudentLastName",
    "LimitedEnglishProficiency", "IsHispanic", "Sex",
    "InternetAccessInResidence", "InternetAccessTypeInResidence",
    "InternetPerformance", "DigitalDevice", "DeviceAccess")
  val endpointDeps = Seq(
    "studentEducationOrganizationAssociations", "students",
    "studentSchoolAssociations", "localEducationAgencies")

  def build(ctx: ViewContext): DataFrame = {
    val students = ctx.endpoint("students").select(
      col("studentUniqueId"),
      col("firstName").as("StudentFirstName"),
      coalesce(col("middleName"), lit("")).as("StudentMiddleName"),
      col("lastSurname").as("StudentLastName"))

    val enrolled = ctx.endpoint("studentSchoolAssociations").select(
      col("studentReference.studentUniqueId").as("studentUniqueId"),
      DateKeys.dateKey(col("exitWithdrawDate")).as("exitKey"))
      .filter(col("exitKey") === "" || col("exitKey") >= DateKeys.todayKey)
      .select("studentUniqueId").distinct()

    val leas = ctx.endpoint("localEducationAgencies")
      .select(col("localEducationAgencyId").as("edOrgIdD"))

    // LEA-level demographic attributes (same pivot machinery as
    // AllStudentSchoolDim's district branch)
    val attrs = AllStudentSchoolDim.edOrgAttributes(
      ctx.endpoint("studentEducationOrganizationAssociations"), "D")
      .join(broadcast(leas), Seq("edOrgIdD"), "inner")

    def str(c: Column): Column = coalesce(c.cast("string"), lit(""))
    def orDefault(c: Column, default: String): Column =
      when(str(c) === "", default).otherwise(str(c))

    attrs
      .withColumnRenamed("edOrgStudentD", "studentUniqueId")
      .join(students, Seq("studentUniqueId"), "inner")
      .join(enrolled, Seq("studentUniqueId"), "left_semi")
      .select(
        concat_ws("-", col("studentUniqueId"), col("edOrgIdD").cast("string"))
          .as("StudentLocalEducationAgencyKey"),
        col("studentUniqueId").as("StudentKey"),
        col("edOrgIdD").cast("string").as("LocalEducationAgencyKey"),
        col("StudentFirstName"), col("StudentMiddleName"), col("StudentLastName"),
        orDefault(col("lepD"), "Not applicable").as("LimitedEnglishProficiency"),
        when(str(col("hispanicD")) === "true", 1).otherwise(0).as("IsHispanic"),
        str(col("sexD")).as("Sex"),
        orDefault(col("ind0D"), "n/a").as("InternetAccessInResidence"),
        orDefault(col("ind1D"), "n/a").as("InternetAccessTypeInResidence"),
        orDefault(col("ind2D"), "n/a").as("InternetPerformance"),
        orDefault(col("ind3D"), "n/a").as("DigitalDevice"),
        orDefault(col("ind4D"), "n/a").as("DeviceAccess"))
      .select(outputColumns.map(col): _*)
  }
}
