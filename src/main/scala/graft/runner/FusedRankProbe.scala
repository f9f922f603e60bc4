package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Lake}
import graft.ops.WebGraph

/** Measures the q96 fusion: spam mass needs PageRank AND TrustRank,
  * which share the damping recursion and differ only in teleport — so
  * [[graft.ops.WebGraph.rankAndTrust]] carries both as two columns of
  * one frame. This probe times the separate-loops composition and the
  * fused loop on the same link-graph fixture in one JVM (warmed), the
  * attribution discipline of runner.BenchAttribution: the claim in the
  * scaladoc is this measurement, not an estimate.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... graft.runner.FusedRankProbe`.
  */
object FusedRankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-fused-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def dropCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }

    // the q96 fixture shape: hosts h0..h16 from documents, seed residues < 3
    val docs = Lake(spark, sfDir).documents
    val pages = docs.select(
      concat(lit("h"), pmod(col("doc_id"), lit(17)), lit(".example")).as("src_host"),
      concat(lit("<a href=\"http://h"), pmod(col("doc_id") * 3 + 1, lit(17)),
        lit(".example/p\">x</a><a href=\"http://h"),
        pmod(col("doc_id") * 5 + 2, lit(17)), lit(".example/q\">y</a>")).as("html"))
    val seeds = docs.filter(pmod(col("doc_id"), lit(17)) < 3)
      .select(concat(lit("h"), pmod(col("doc_id"), lit(17)), lit(".example")).as("host"))
      .distinct()
    def edges = WebGraph.hostEdges(pages, col("src_host"), col("html"))

    def separate(): Unit = noop(WebGraph.spamMass(
      WebGraph.hostRank(edges, iterations = 5),
      WebGraph.trustRank(edges, seeds, iterations = 5)))
    def fused(): Unit = noop(WebGraph.spamMassFrom(
      WebGraph.rankAndTrust(edges, seeds, iterations = 5)))

    separate(); dropCaches(); fused(); dropCaches() // warm codegen/JIT
    val sep = (1 to 3).map { _ => dropCaches(); timed(separate()) }.min
    val fus = (1 to 3).map { _ => dropCaches(); timed(fused()) }.min
    println(f"""{"probe":"fused-rank","sf":"$sfDir","separate_s":$sep%.3f,"fused_s":$fus%.3f,"speedup":${sep / fus}%.2f}""")
    spark.stop()
  }
}
