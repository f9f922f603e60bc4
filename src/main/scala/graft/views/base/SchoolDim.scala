package graft.views.base

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DescriptorMap, Descriptors}
import graft.views.{AmtView, ViewContext}

/** AMT SchoolDim — reference parquet/amt/base/school_dim/main.py:38-214.
  *
  * schools (addresses exploded) ⋉ physical addresses, left-joined to the
  * LEA → ESC → SEA org chain. All three org tables are small dimensions —
  * broadcast; the address-type filter uses the descriptor-constant map
  * (Address.Physical), matching main.py:145-146.
  *
  * Deliberate divergence from pandas jank: missing org ids/names become ''
  * (the reference's astype(str) of null floats yields 'nan'/'255901.0'
  * artifacts — we keep the intended clean semantics).
  */
object SchoolDim extends AmtView {
  val name = "schoolDim"
  val collection = "base"
  val outputColumns = Seq(
    "SchoolKey", "SchoolName", "SchoolType", "SchoolAddress", "SchoolCity",
    "SchoolCounty", "SchoolState", "LocalEducationAgencyName",
    "LocalEducationAgencyKey", "StateEducationAgencyName",
    "StateEducationAgencyKey", "EducationServiceCenterName",
    "EducationServiceCenterKey")
  val endpointDeps = Seq(
    "schools", "localEducationAgencies", "educationServiceCenters",
    "stateEducationAgencies")

  def build(ctx: ViewContext): DataFrame = {
    val schools = ctx.endpoint("schools")
      .withColumn("address", explode_outer(col("addresses")))
      .select(
        col("schoolId"), col("nameOfInstitution").as("schoolName"),
        col("schoolTypeDescriptor"),
        col("localEducationAgencyReference.localEducationAgencyId").as("leaRef"),
        col("address.addressTypeDescriptor").as("addressType"),
        col("address.stateAbbreviationDescriptor").as("addressState"),
        col("address.streetNumberName").as("addressStreet"),
        col("address.city").as("addressCity"),
        col("address.nameOfCounty").as("addressCounty"))

    val lea = ctx.endpoint("localEducationAgencies").select(
      col("localEducationAgencyId"),
      col("nameOfInstitution").as("leaName"),
      col("educationServiceCenterReference.educationServiceCenterId").as("escRef"))
    val esc = ctx.endpoint("educationServiceCenters").select(
      col("educationServiceCenterId"),
      col("nameOfInstitution").as("escName"),
      col("stateEducationAgencyReference.stateEducationAgencyId").as("seaRef"))
    val sea = ctx.endpoint("stateEducationAgencies").select(
      col("stateEducationAgencyId"),
      col("nameOfInstitution").as("seaName"))

    val joined = schools
      .join(broadcast(lea), col("leaRef") === col("localEducationAgencyId"), "left")
      .join(broadcast(esc), col("escRef") === col("educationServiceCenterId"), "left")
      .join(broadcast(sea), col("seaRef") === col("stateEducationAgencyId"), "left")

    // keep only physical addresses, via the constant map (main.py:145-146)
    val physical = DescriptorMap.withConstant(joined, "addressType")
      .filter(coalesce(col("addressType_constantName").contains("Address.Physical"), lit(false)))

    def str(c: org.apache.spark.sql.Column) = coalesce(c.cast("string"), lit(""))

    physical.select(
      col("schoolId").cast("string").as("SchoolKey"),
      col("schoolName").as("SchoolName"),
      Descriptors.codeValueFromUri(col("schoolTypeDescriptor")).as("SchoolType"),
      concat(col("addressStreet"), lit(", "), col("addressCity"), lit(" "),
        Descriptors.codeValueFromUri(col("addressState")), lit(" "),
        col("addressCounty")).as("SchoolAddress"),
      col("addressCity").as("SchoolCity"),
      col("addressCounty").as("SchoolCounty"),
      Descriptors.codeValueFromUri(col("addressState")).as("SchoolState"),
      str(col("leaName")).as("LocalEducationAgencyName"),
      str(col("localEducationAgencyId")).as("LocalEducationAgencyKey"),
      str(col("seaName")).as("StateEducationAgencyName"),
      str(col("stateEducationAgencyId")).as("StateEducationAgencyKey"),
      str(col("escName")).as("EducationServiceCenterName"),
      str(col("educationServiceCenterId")).as("EducationServiceCenterKey"))
      .select(outputColumns.map(col): _*)
  }
}
