package graft.views.base

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{DateKeys, Descriptors}
import graft.views.{AmtView, ViewContext}

/** The two student demographics bridges — reference
  * parquet/amt/base/student_school_demographics_bridge/main.py:38-391 and
  * student_local_education_agency_demographics_bridge/main.py (433 LoC):
  * one row per (student, org, demographic) linking to DemographicsDim.
  *
  * Six demographic arrays of studentEducationOrganizationAssociations are
  * exploded and unioned; Language and Disability additionally fan out
  * their nested derived arrays (uses → LanguageUse, designations →
  * DisabilityDesignation). studentCharacteristics respect active periods
  * (missing endDate = the reference's '21003112' open-ended sentinel,
  * SURVEY §7.4.4). Output restricted to currently-enrolled students.
  */
object DemographicsBridges {

  /** (edOrgId, StudentKey, DemographicKey) for every active demographic. */
  private[base] def studentDemographics(ctx: ViewContext): DataFrame = {
    val edorg = ctx.endpoint("studentEducationOrganizationAssociations")

    def base(path: String, expr: Column): DataFrame =
      edorg.select(
        col("educationOrganizationReference.educationOrganizationId").as("edOrgId"),
        col("studentReference.studentUniqueId").as("StudentKey"),
        explode(col(path)).as("item"))
        .select(col("edOrgId"), col("StudentKey"), expr.as("DemographicKey"))
        .filter(col("DemographicKey").isNotNull)

    def simpleKey(prefix: String, descriptor: Column): Column =
      when(descriptor.isNotNull,
        concat(lit(s"$prefix:"), Descriptors.codeValueFromUri(descriptor)))

    val cohortYears = base("cohortYears",
      when(col("item.cohortYearTypeDescriptor").isNotNull,
        concat(lit("CohortYear:"),
          col("item.schoolYearTypeReference.schoolYear").cast("string"),
          lit("-"),
          Descriptors.codeValueFromUri(col("item.cohortYearTypeDescriptor")))))

    val races = base("races", simpleKey("Race", col("item.raceDescriptor")))
    val tribal = base("tribalAffiliations",
      simpleKey("TribalAffiliation", col("item.tribalAffiliationDescriptor")))
    val languages = base("languages",
      simpleKey("Language", col("item.languageDescriptor")))
    val disabilities = base("disabilities",
      simpleKey("Disability", col("item.disabilityDescriptor")))

    // characteristics: only rows whose periods are absent or still open
    val characteristics = edorg.select(
      col("educationOrganizationReference.educationOrganizationId").as("edOrgId"),
      col("studentReference.studentUniqueId").as("StudentKey"),
      explode(col("studentCharacteristics")).as("item"))
      .filter(
        col("item.periods").isNull || size(col("item.periods")) === 0 ||
          exists(col("item.periods"), p =>
            coalesce(DateKeys.dateKey(p.getField("endDate")), lit("")) === "" ||
              DateKeys.dateKey(p.getField("endDate")) >= DateKeys.todayKey))
      .select(col("edOrgId"), col("StudentKey"),
        simpleKey("StudentCharacteristic",
          col("item.studentCharacteristicDescriptor")).as("DemographicKey"))
      .filter(col("DemographicKey").isNotNull)

    // derived families: nested arrays fan out to extra rows
    val languageUses = edorg.select(
      col("educationOrganizationReference.educationOrganizationId").as("edOrgId"),
      col("studentReference.studentUniqueId").as("StudentKey"),
      explode(col("languages")).as("lang"))
      .select(col("edOrgId"), col("StudentKey"),
        explode(col("lang.uses")).as("use"))
      .select(col("edOrgId"), col("StudentKey"),
        simpleKey("LanguageUse", col("use.languageUseDescriptor")).as("DemographicKey"))
      .filter(col("DemographicKey").isNotNull)

    val designations = edorg.select(
      col("educationOrganizationReference.educationOrganizationId").as("edOrgId"),
      col("studentReference.studentUniqueId").as("StudentKey"),
      explode(col("disabilities")).as("dis"))
      .select(col("edOrgId"), col("StudentKey"),
        explode(col("dis.designations")).as("des"))
      .select(col("edOrgId"), col("StudentKey"),
        simpleKey("DisabilityDesignation",
          col("des.disabilityDesignationDescriptor")).as("DemographicKey"))
      .filter(col("DemographicKey").isNotNull)

    Seq(races, tribal, languages, languageUses, disabilities, designations,
      characteristics).foldLeft(cohortYears)(_ unionByName _)
  }

  /** Currently-enrolled (student, school) pairs. */
  private[base] def enrolled(ctx: ViewContext): DataFrame =
    ctx.endpoint("studentSchoolAssociations").select(
      col("studentReference.studentUniqueId").as("StudentKey"),
      col("schoolReference.schoolId").as("schoolId"),
      DateKeys.dateKey(col("exitWithdrawDate")).as("exitKey"))
      .filter(col("exitKey") === "" || col("exitKey") >= DateKeys.todayKey)
      .select("StudentKey", "schoolId")
      .distinct()
}

object StudentSchoolDemographicsBridge extends AmtView {
  val name = "studentSchoolDemographicsBridge"
  val collection = "base"
  val outputColumns = Seq(
    "StudentSchoolDemographicBridgeKey", "StudentSchoolKey", "DemographicKey")
  val endpointDeps = Seq(
    "studentEducationOrganizationAssociations", "studentSchoolAssociations")

  def build(ctx: ViewContext): DataFrame =
    DemographicsBridges.studentDemographics(ctx)
      .withColumnRenamed("edOrgId", "schoolId")
      .join(DemographicsBridges.enrolled(ctx), Seq("StudentKey", "schoolId"), "inner")
      .select(
        concat_ws("-", col("DemographicKey"),
          concat_ws("-", col("StudentKey"), col("schoolId").cast("string")))
          .as("StudentSchoolDemographicBridgeKey"),
        concat_ws("-", col("StudentKey"), col("schoolId").cast("string"))
          .as("StudentSchoolKey"),
        col("DemographicKey"))
      .distinct()
      .select(outputColumns.map(col): _*)
}

object StudentLeaDemographicsBridge extends AmtView {
  val name = "studentLocalEducationAgencyDemographicsBridge"
  val collection = "base"
  val outputColumns = Seq(
    "StudentSchoolDemographicBridgeKey", "StudentLocalEducationAgencyKey",
    "DemographicKey")
  val endpointDeps = Seq(
    "studentEducationOrganizationAssociations", "studentSchoolAssociations",
    "schools")

  def build(ctx: ViewContext): DataFrame = {
    // enrolled students mapped to their school's LEA
    val schools = ctx.endpoint("schools").select(
      col("schoolId"),
      col("localEducationAgencyReference.localEducationAgencyId").as("leaId"))
    val enrolledLea = DemographicsBridges.enrolled(ctx)
      .join(broadcast(schools), Seq("schoolId"), "inner")
      .select("StudentKey", "leaId").distinct()

    DemographicsBridges.studentDemographics(ctx)
      .join(enrolledLea,
        Seq("StudentKey"), "inner")
      .filter(col("edOrgId") === col("leaId"))
      .select(
        concat_ws("-", col("DemographicKey"),
          concat_ws("-", col("StudentKey"), col("leaId").cast("string")))
          .as("StudentSchoolDemographicBridgeKey"),
        concat_ws("-", col("StudentKey"), col("leaId").cast("string"))
          .as("StudentLocalEducationAgencyKey"),
        col("DemographicKey"))
      .distinct()
      .select(outputColumns.map(col): _*)
  }
}
