package graft.views.epp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.DateKeys
import graft.views.{AmtView, ViewContext}

/** AMT epp.EvaluationElementRatingDim — reference
  * parquet/amt/epp/evaluation_element_rating_dim/main.py:41-206: per-element
  * evaluation ratings for candidates.
  *
  * Shape: evaluationElementRatings × results (left fan-out) ⋈(inner)
  * candidates by personId ⋈(inner) evaluationObjectives by objective title,
  * left ⋈ termDescriptors matched on the full `namespace#codeValue` URI.
  * Then the reference's drop_duplicates over the business columns
  * (main.py:174-185) — a groupBy on those columns keeping the first row,
  * expressed as dropDuplicates here since all remaining columns are in the
  * dedup key. EvaluationDate is truncated to its date part (str[:10]) and
  * re-keyed yyyyMMdd.
  */
object EvaluationElementRatingDim extends AmtView {
  val name = "epp_evaluationElementRatingDim"
  val collection = "epp"
  val outputColumns = Seq(
    "CandidateKey", "EvaluationDate", "EvaluationDateKey",
    "PerformanceEvaluationTitle", "EvaluationObjectiveTitle",
    "EvaluationElementTitle", "RatingResultTitle", "EvaluationTitle",
    "TermDescriptorId", "TermDescriptorKey", "SchoolYear", "Rating")
  val endpointDeps = Seq(
    "candidates", "evaluationObjectives", "evaluationElementRatings",
    "termDescriptors")

  def build(ctx: ViewContext): DataFrame = {
    val ratings = ctx.endpoint("evaluationElementRatings")

    val base = ratings.select(
      col("id"),
      col("evaluationObjectiveRatingReference.personId").as("personId"),
      col("evaluationObjectiveRatingReference.evaluationDate").as("evaluationDate"),
      col("evaluationObjectiveRatingReference.evaluationObjectiveTitle")
        .as("evaluationObjectiveTitle"),
      col("evaluationElementReference.performanceEvaluationTitle")
        .as("PerformanceEvaluationTitle"),
      col("evaluationElementReference.evaluationElementTitle")
        .as("EvaluationElementTitle"),
      col("evaluationElementReference.termDescriptor").as("termDescriptor"),
      col("evaluationElementReference.schoolYear").as("schoolYear"),
      col("evaluationElementReference.evaluationTitle").as("EvaluationTitle"))

    val results = ratings.select(
      col("id"), explode(col("results")).as("r"))
      .select(col("id"),
        col("r.ratingResultTitle").as("RatingResultTitle"),
        col("r.rating").as("Rating"))

    val candidates = ctx.endpoint("candidates").select(
      col("candidateIdentifier").as("CandidateKey"),
      col("personReference.personId").as("personId"))

    val objectives = ctx.endpoint("evaluationObjectives")
      .select(col("evaluationObjectiveTitle")).distinct()

    val terms = ctx.endpoint("termDescriptors").select(
      concat(col("namespace"), lit("#"), col("codeValue")).as("termDescriptor"),
      col("termDescriptorId"))

    base
      .join(results, Seq("id"), "left")
      .join(candidates, Seq("personId"), "inner")
      .join(broadcast(objectives), Seq("evaluationObjectiveTitle"), "inner")
      .join(broadcast(terms), Seq("termDescriptor"), "left")
      .select(
        col("CandidateKey"),
        substring(col("evaluationDate"), 1, 10).as("EvaluationDate"),
        DateKeys.dateKey(substring(col("evaluationDate"), 1, 10))
          .as("EvaluationDateKey"),
        col("PerformanceEvaluationTitle"),
        col("evaluationObjectiveTitle").as("EvaluationObjectiveTitle"),
        col("EvaluationElementTitle"),
        col("RatingResultTitle"),
        col("EvaluationTitle"),
        coalesce(col("termDescriptorId").cast("string"), lit(""))
          .as("TermDescriptorId"),
        coalesce(col("termDescriptorId").cast("string"), lit(""))
          .as("TermDescriptorKey"),
        coalesce(col("schoolYear").cast("string"), lit("")).as("SchoolYear"),
        col("Rating"))
      .dropDuplicates(
        "CandidateKey", "EvaluationDate", "PerformanceEvaluationTitle",
        "EvaluationObjectiveTitle", "EvaluationElementTitle",
        "RatingResultTitle", "EvaluationTitle", "TermDescriptorId",
        "SchoolYear", "Rating")
      .select(outputColumns.map(col): _*)
  }
}
