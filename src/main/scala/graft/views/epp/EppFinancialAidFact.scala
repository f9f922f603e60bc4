package graft.views.epp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DateKeys, Descriptors}
import graft.views.{AmtView, ViewContext}

/** AMT epp.FinancialAidFact — reference
  * parquet/amt/epp/epp_financial_aid_fact/main.py:34-271.
  *
  * Candidates matched to students through their shared person resource
  * (both sides parse the person href; rows without one are dropped), left
  * joined to financial aid records by student resource id and to the aid
  * type descriptor. Defaults: missing aid amount → 0, Pell flag → 0/1. */
object EppFinancialAidFact extends AmtView {
  val name = "epp_financialAidFact"
  val collection = "epp"
  val outputColumns = Seq(
    "CandidateAidKey", "CandidateKey", "BeginDate", "EndDate",
    "AidConditionDescription", "AidType", "AidAmount", "PellGrantRecipient",
    "BeginDateKey", "EndDateKey")
  val endpointDeps = Seq(
    "aidTypeDescriptors", "candidates", "financialAids", "students")

  def build(ctx: ViewContext): DataFrame = {
    val candidates = ctx.endpoint("candidates").select(
      col("candidateIdentifier"),
      Descriptors.idFromHref(coalesce(col("personReference.link.href"), lit("/")))
        .as("personReferenceId"))
      .filter(col("personReferenceId") =!= "")

    val students = ctx.endpoint("students").select(
      col("id").as("studentReferenceId"),
      Descriptors.idFromHref(coalesce(col("personReference.link.href"), lit("/")))
        .as("personReferenceId"))
      .filter(col("personReferenceId") =!= "")

    val aids = ctx.endpoint("financialAids").select(
      Descriptors.idFromHref(col("studentReference.link.href")).as("studentReferenceId"),
      col("beginDate"),
      coalesce(col("endDate"), lit("")).as("endDate"),
      col("aidConditionDescription"),
      Descriptors.codeValueFromUri(col("aidTypeDescriptor")).as("aidTypeCode"),
      col("aidAmount"),
      col("pellGrantRecipient"),
      DateKeys.dateKey(col("beginDate")).as("beginDateKey"))

    val aidTypes = ctx.endpoint("aidTypeDescriptors").select(
      col("codeValue").as("aidTypeCode"),
      col("aidTypeDescriptorId"))

    candidates
      .join(students, Seq("personReferenceId"), "inner")
      .join(aids, Seq("studentReferenceId"), "left")
      .join(broadcast(aidTypes), Seq("aidTypeCode"), "left")
      .select(
        concat_ws("-", col("candidateIdentifier"),
          coalesce(col("aidTypeDescriptorId").cast("string"), lit("")),
          coalesce(col("beginDateKey"), lit(""))).as("CandidateAidKey"),
        col("candidateIdentifier").as("CandidateKey"),
        coalesce(col("beginDate"), lit("")).as("BeginDate"),
        coalesce(col("endDate"), lit("")).as("EndDate"),
        coalesce(col("aidConditionDescription"), lit("")).as("AidConditionDescription"),
        coalesce(col("aidTypeCode"), lit("")).as("AidType"),
        coalesce(col("aidAmount"), lit(0.0)).as("AidAmount"),
        coalesce(col("pellGrantRecipient").cast("int"), lit(0)).as("PellGrantRecipient"),
        coalesce(col("beginDate"), lit("")).cast("string").as("BeginDateKey"),
        coalesce(col("endDate"), lit("")).cast("string").as("EndDateKey"))
      .select(outputColumns.map(col): _*)
  }
}
