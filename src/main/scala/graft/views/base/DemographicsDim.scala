package graft.views.base

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Joins
import graft.views.{AmtView, ViewContext}

/** AMT DemographicsDim — reference
  * parquet/amt/base/demographics_dim/main.py:44-394.
  *
  * Eight demographic families unioned (O2): seven descriptor endpoints
  * each projected to (parent:label, parent, label, shortDescription), plus
  * CohortYear = schoolYearTypes × cohortYearTypeDescriptors — the
  * reference fakes the cross join with a constant fakeKey + outer merge
  * (main.py:68-106); Spark has the real operator with the small side
  * broadcast (J4). Union preserves the reference's concat order. */
object DemographicsDim extends AmtView {
  val name = "demographicsDim"
  val collection = "base"
  val outputColumns = Seq(
    "DemographicKey", "DemographicParentKey", "DemographicLabel", "ShortDescription")
  val endpointDeps = Seq(
    "schoolYearTypes", "cohortYearTypeDescriptors", "disabilityDescriptors",
    "disabilityDesignationDescriptors", "languageDescriptors",
    "languageUseDescriptors", "raceDescriptors",
    "tribalAffiliationDescriptors", "studentCharacteristicDescriptors")

  private val Families = Seq(
    "disabilityDescriptors" -> "Disability",
    "disabilityDesignationDescriptors" -> "DisabilityDesignation",
    "languageDescriptors" -> "Language",
    "languageUseDescriptors" -> "LanguageUse",
    "raceDescriptors" -> "Race",
    "tribalAffiliationDescriptors" -> "TribalAffiliation",
    "studentCharacteristicDescriptors" -> "StudentCharacteristic")

  def build(ctx: ViewContext): DataFrame = {
    def shape(df: DataFrame, parent: String, label: org.apache.spark.sql.Column): DataFrame =
      df.select(
        concat(lit(parent), lit(":"), label).as("DemographicKey"),
        lit(parent).as("DemographicParentKey"),
        label.as("DemographicLabel"),
        col("shortDescription").as("ShortDescription"))

    val years = ctx.endpoint("schoolYearTypes")
      .select(col("schoolYear").cast("string").as("schoolYearStr"))
    val cohort = shape(
      Joins.cross(ctx.endpoint("cohortYearTypeDescriptors"), years),
      "CohortYear",
      concat(col("schoolYearStr"), lit("-"), col("codeValue")))

    val families = Families.map { case (endpoint, parent) =>
      shape(ctx.endpoint(endpoint), parent, col("codeValue"))
    }

    families.foldLeft(cohort)(_ unionByName _)
      .select(outputColumns.map(col): _*)
  }
}
