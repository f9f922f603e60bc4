package graft.views.epp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DateKeys, Descriptors}
import graft.views.{AmtView, ViewContext}

/** AMT epp.CandidateSurveyDim — reference
  * parquet/amt/epp/candidate_survey_dim/main.py:45-382: one row per matrix
  * element of each survey-question response, attributed to the candidate
  * the response targets.
  *
  * Shape: matrix-element values (explode) ⋈ questionResponses root, then a
  * chain of inner joins — surveys (surveyIdentifier), responses (response
  * resource id from href), questions (question resource id + code), person
  * target associations (response id), candidates (person resource id from
  * href). Every resource id comes from the trailing segment of the API
  * href, matching `get_reference_from_href`.
  *
  * Parity note: main.py:91-92 has a missing comma that fuses two meta paths
  * into one nonexistent column, so the question frame's surveyReferenceId
  * is always '' there — it is unused (the question join keys on question
  * id + code), so no equivalent is built here.
  */
object CandidateSurveyDim extends AmtView {
  val name = "epp_candidateSurveyDim"
  val collection = "epp"
  val outputColumns = Seq(
    "CandidateSurveyKey", "CandidateKey", "SurveyTitle", "SurveySectionTitle",
    "ResponseDateKey", "QuestionCode", "QuestionText", "NumericResponse",
    "TextResponse")
  val endpointDeps = Seq(
    "candidates", "surveys", "surveyQuestions", "surveyResponses",
    "surveyQuestionResponses", "surveyResponsePersonTargetAssociations")

  def build(ctx: ViewContext): DataFrame = {
    val sqr = ctx.endpoint("surveyQuestionResponses")

    val values = sqr.select(
      col("id"),
      explode(col("surveyQuestionMatrixElementResponses")).as("v"))
      .select(col("id"),
        col("v.numericResponse").as("numericResponse"),
        col("v.textResponse").as("textResponse"))

    val questionResponses = sqr.select(
      col("id"),
      Descriptors.idFromHref(col("surveyQuestionReference.link.href"))
        .as("surveyQuestionReferenceId"),
      Descriptors.idFromHref(col("surveyResponseReference.link.href"))
        .as("surveyResponseReferenceId"),
      col("surveyQuestionReference.questionCode").as("questionCode"),
      col("surveyQuestionReference.surveyIdentifier").as("surveyIdentifier"))

    val surveys = ctx.endpoint("surveys").select(
      col("surveyIdentifier"), col("surveyTitle"))

    val responses = ctx.endpoint("surveyResponses").select(
      col("id").as("surveyResponseReferenceId"),
      DateKeys.dateKey(col("responseDate")).as("responseDateKey"),
      col("surveyResponseIdentifier"))

    val questions = ctx.endpoint("surveyQuestions").select(
      col("id").as("surveyQuestionReferenceId"),
      col("questionCode"),
      col("surveySectionReference.surveySectionTitle").as("surveySectionTitle"),
      col("questionText"))

    val personTargets = ctx.endpoint("surveyResponsePersonTargetAssociations")
      .select(
        Descriptors.idFromHref(col("surveyResponseReference.link.href"))
          .as("surveyResponseReferenceId"),
        col("personReference.personId").as("personId"),
        Descriptors.idFromHref(col("personReference.link.href"))
          .as("personReferenceId"))

    val candidates = ctx.endpoint("candidates").select(
      col("candidateIdentifier"),
      Descriptors.idFromHref(coalesce(col("personReference.link.href"), lit("/")))
        .as("personReferenceId"))

    values
      .join(questionResponses, Seq("id"), "inner")
      .join(broadcast(surveys), Seq("surveyIdentifier"), "inner")
      .join(responses, Seq("surveyResponseReferenceId"), "inner")
      .join(questions, Seq("surveyQuestionReferenceId", "questionCode"), "inner")
      .join(personTargets, Seq("surveyResponseReferenceId"), "inner")
      .join(candidates, Seq("personReferenceId"), "inner")
      .select(
        concat_ws("-", col("surveyIdentifier"), col("questionCode"),
          col("surveyResponseIdentifier"), col("personId"))
          .as("CandidateSurveyKey"),
        coalesce(col("candidateIdentifier"), lit("")).as("CandidateKey"),
        col("surveyTitle").as("SurveyTitle"),
        col("surveySectionTitle").as("SurveySectionTitle"),
        col("responseDateKey").as("ResponseDateKey"),
        col("questionCode").as("QuestionCode"),
        col("questionText").as("QuestionText"),
        coalesce(col("numericResponse").cast("string"), lit(""))
          .as("NumericResponse"),
        coalesce(col("textResponse"), lit("")).as("TextResponse"))
      .select(outputColumns.map(col): _*)
  }
}
