package graft.views.epp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Descriptors
import graft.views.{AmtView, ViewContext}

/** AMT epp.EppDim — reference parquet/amt/epp/epp_dim/main.py:25-99:
  * education organizations whose exploded category list contains an
  * "Education Preparation Provider" category. */
object EppDim extends AmtView {
  val name = "epp_eppDim"
  val collection = "epp"
  val outputColumns = Seq("EducationOrganizationKey", "NameOfInstitution")
  val endpointDeps = Seq("schools")

  def build(ctx: ViewContext): DataFrame =
    ctx.endpoint("schools")
      .withColumn("cat", explode_outer(col("educationOrganizationCategories")))
      .withColumn("catCode",
        Descriptors.codeValueFromUri(col("cat.educationOrganizationCategoryDescriptor")))
      .filter(coalesce(col("catCode").contains("Preparation Provider"), lit(false)))
      .select(
        col("schoolId").cast("string").as("EducationOrganizationKey"),
        col("nameOfInstitution").as("NameOfInstitution"))
      .select(outputColumns.map(col): _*)
}
