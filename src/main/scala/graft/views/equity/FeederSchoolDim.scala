package graft.views.equity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.DateKeys
import graft.views.{AmtView, ViewContext}

/** AMT equity.FeederSchoolDim — reference
  * parquet/amt/equity/feeder_school_dim/main.py:30-127: active feeder
  * relations (endDate >= today when present) joined to the feeder school's
  * name. Lower-cased output names are the reference's own convention. */
object FeederSchoolDim extends AmtView {
  val name = "equity_feederSchoolDim"
  val collection = "equity"
  val outputColumns = Seq(
    "feederSchoolUniqueKey", "schoolKey", "feederSchoolKey", "feederSchoolName")
  val endpointDeps = Seq("feederSchoolAssociations", "schools")

  def build(ctx: ViewContext): DataFrame = {
    val assoc = ctx.endpoint("feederSchoolAssociations")
      .withColumn("endKey", DateKeys.dateKey(col("endDate")))
      .filter(col("endKey") === "" || col("endKey") >= DateKeys.todayKey)
      .select(
        col("feederSchoolReference.schoolId").as("feederSchoolId"),
        col("schoolReference.schoolId").cast("string").as("schoolKey"))

    val schools = ctx.endpoint("schools").select(
      col("schoolId").as("feederSchoolId"),
      col("nameOfInstitution").as("feederSchoolName"))

    assoc.join(broadcast(schools), Seq("feederSchoolId"), "inner")
      .select(
        concat_ws("-", col("schoolKey"), col("feederSchoolId").cast("string"))
          .as("feederSchoolUniqueKey"),
        col("schoolKey"),
        col("feederSchoolId").cast("string").as("feederSchoolKey"),
        col("feederSchoolName"))
      .select(outputColumns.map(col): _*)
  }
}
