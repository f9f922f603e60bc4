package graft.views.base

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Descriptors
import graft.views.{AmtView, ViewContext}

/** AMT LocalEducationAgencyDim — reference
  * parquet/amt/base/local_education_agency_dim/main.py:36-226: LEAs with
  * their SEA / ESC lookups joined by API resource id (recovered from the
  * reference hrefs), descriptor code values for category/charter status,
  * '' defaults for the optional chain. All sides broadcastable dims. */
object LocalEducationAgencyDim extends AmtView {
  val name = "localEducationAgencyDim"
  val collection = "base"
  val outputColumns = Seq(
    "LocalEducationAgencyKey", "LocalEducationAgencyName",
    "LocalEducationAgencyType",
    "LocalEducationAgencyParentLocalEducationAgencyKey",
    "LocalEducationAgencyStateEducationAgencyName",
    "LocalEducationAgencyStateEducationAgencyKey",
    "LocalEducationAgencyServiceCenterName",
    "LocalEducationAgencyServiceCenterKey",
    "LocalEducationAgencyCharterStatus")
  val endpointDeps = Seq(
    "localEducationAgencies", "stateEducationAgencies", "educationServiceCenters")

  def build(ctx: ViewContext): DataFrame = {
    val lea = ctx.endpoint("localEducationAgencies").select(
      col("localEducationAgencyId").cast("string").as("LocalEducationAgencyKey"),
      col("nameOfInstitution").as("LocalEducationAgencyName"),
      Descriptors.codeValueFromUri(col("localEducationAgencyCategoryDescriptor"))
        .as("LocalEducationAgencyType"),
      Descriptors.codeValueFromUri(coalesce(col("charterStatusDescriptor"), lit("")))
        .as("LocalEducationAgencyCharterStatus"),
      coalesce(col("parentLocalEducationAgencyReference.localEducationAgencyId")
        .cast("string"), lit(""))
        .as("LocalEducationAgencyParentLocalEducationAgencyKey"),
      Descriptors.idFromHref(col("educationServiceCenterReference.link.href"))
        .as("escRefId"),
      Descriptors.idFromHref(col("stateEducationAgencyReference.link.href"))
        .as("seaRefId"))

    val sea = ctx.endpoint("stateEducationAgencies").select(
      col("id").as("seaRefId"),
      coalesce(col("nameOfInstitution"), lit(""))
        .as("LocalEducationAgencyStateEducationAgencyName"),
      coalesce(col("stateEducationAgencyId").cast("string"), lit(""))
        .as("LocalEducationAgencyStateEducationAgencyKey"))

    val esc = ctx.endpoint("educationServiceCenters").select(
      col("id").as("escRefId"),
      coalesce(col("nameOfInstitution"), lit(""))
        .as("LocalEducationAgencyServiceCenterName"),
      coalesce(col("educationServiceCenterId").cast("string"), lit(""))
        .as("LocalEducationAgencyServiceCenterKey"))

    lea
      .join(broadcast(sea), Seq("seaRefId"), "left")
      .join(broadcast(esc), Seq("escRefId"), "left")
      .na.fill("", Seq(
        "LocalEducationAgencyStateEducationAgencyName",
        "LocalEducationAgencyStateEducationAgencyKey",
        "LocalEducationAgencyServiceCenterName",
        "LocalEducationAgencyServiceCenterKey"))
      .select(outputColumns.map(col): _*)
  }
}
