package graft.views.equity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DateKeys, Descriptors}
import graft.views.{AmtView, ViewContext}

/** AMT equity.StudentSchoolFoodServiceProgramDim — reference
  * parquet/amt/equity/student_school_food_service_program_dim/main.py:
  * 36-257: food-service program associations with their service array
  * exploded, joined to the two descriptor id lookups and restricted to
  * enrolled students; 8-part surrogate key including the service id. */
object StudentSchoolFoodServiceProgramDim extends AmtView {
  val name = "equity_studentSchoolFoodServiceProgramDim"
  val collection = "equity"
  val outputColumns = Seq(
    "StudentSchoolFoodServiceProgramKey", "StudentSchoolProgramKey",
    "StudentSchoolKey", "ProgramName", "SchoolFoodServiceProgramServiceDescriptor")
  val endpointDeps = Seq(
    "studentSchoolFoodServiceProgramAssociations", "studentSchoolAssociations",
    "programTypeDescriptors", "schoolFoodServiceProgramServiceDescriptors")

  def build(ctx: ViewContext): DataFrame = {
    val assoc = ctx.endpoint("studentSchoolFoodServiceProgramAssociations")
      .withColumn("service", explode_outer(col("schoolFoodServiceProgramServices")))
      .select(
        col("studentReference.studentUniqueId").as("studentUniqueId"),
        col("programReference.programName").as("ProgramName"),
        Descriptors.codeValueFromUri(col("programReference.programTypeDescriptor"))
          .as("programTypeCode"),
        col("programReference.educationOrganizationId").as("programOrgId"),
        col("educationOrganizationReference.educationOrganizationId").as("orgId"),
        DateKeys.dateKey(col("beginDate")).as("beginDateKey"),
        Descriptors.codeValueFromUri(
          col("service.schoolFoodServiceProgramServiceDescriptor")).as("serviceCode"))

    val programTypes = ctx.endpoint("programTypeDescriptors").select(
      col("codeValue").as("programTypeCode"), col("programTypeDescriptorId"))
    val services = ctx.endpoint("schoolFoodServiceProgramServiceDescriptors").select(
      col("codeValue").as("serviceCode"),
      col("schoolFoodServiceProgramServiceDescriptorId").as("serviceId"))

    val enrolled = ctx.endpoint("studentSchoolAssociations").select(
      col("studentReference.studentUniqueId").as("studentUniqueId"),
      col("schoolReference.schoolId").as("schoolId"),
      DateKeys.dateKey(col("exitWithdrawDate")).as("exitKey"))
      .filter(col("exitKey") === "" || col("exitKey") >= DateKeys.todayKey)

    val studentKey = col("studentUniqueId")
    val schoolKey = col("schoolId").cast("string")
    val programKey = concat_ws("-", studentKey, schoolKey, col("ProgramName"),
      col("programTypeDescriptorId").cast("string"),
      col("orgId").cast("string"), col("programOrgId").cast("string"),
      col("beginDateKey"))

    enrolled
      .join(assoc, Seq("studentUniqueId"), "inner")
      .join(broadcast(programTypes), Seq("programTypeCode"), "left")
      .join(broadcast(services), Seq("serviceCode"), "left")
      .select(
        concat_ws("-", programKey, col("serviceId").cast("string"))
          .as("StudentSchoolFoodServiceProgramKey"),
        programKey.as("StudentSchoolProgramKey"),
        concat_ws("-", studentKey, schoolKey).as("StudentSchoolKey"),
        col("ProgramName"),
        col("serviceCode").as("SchoolFoodServiceProgramServiceDescriptor"))
      .select(outputColumns.map(col): _*)
  }
}
