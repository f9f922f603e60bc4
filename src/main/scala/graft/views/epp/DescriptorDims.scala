package graft.views.epp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.views.{AmtView, ViewContext}

/** The EPP descriptor dimensions — reference
  * parquet/amt/epp/{race,term,sex}_descriptor_dim/main.py (62-63 LoC each):
  * a straight projection of a descriptor endpoint to (Key, CodeValue) with
  * the id stringified. */
abstract class DescriptorDim(
    val name: String,
    endpoint: String,
    idField: String,
    keyColumn: String
) extends AmtView {
  val collection = "epp"
  val outputColumns = Seq(keyColumn, "CodeValue")
  val endpointDeps = Seq(endpoint)

  def build(ctx: ViewContext): DataFrame =
    ctx.endpoint(endpoint).select(
      col(idField).cast("string").as(keyColumn),
      col("codeValue").as("CodeValue"))
}

object RaceDescriptorDim extends DescriptorDim(
  "epp_raceDescriptorDim", "raceDescriptors", "raceDescriptorId", "RaceDescriptorKey")

object TermDescriptorDim extends DescriptorDim(
  "epp_termDescriptorDim", "termDescriptors", "termDescriptorId", "TermDescriptorKey")

object SexDescriptorDim extends DescriptorDim(
  "epp_sexDescriptorDim", "sexDescriptors", "sexDescriptorId", "SexDescriptorKey")
