package graft.runner

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

import graft.SparkEntry
import graft.core.GraftSession

/** Dump `.explain("formatted")` for registered queries to files — the
  * review artifact an optimization round commits (plans/r12/…_before.txt /
  * …_after.txt) so plan-shape claims (Exchange counts, join strategies,
  * PushedFilters/ReadSchema) are checkable without running Spark.
  *
  * The formatted plan here is the STATIC plan (AQE not yet finalized) —
  * exactly what `df.explain("formatted")` prints; for finalized adaptive
  * counts use [[PlanAudit]], which executes the plan first. Static plans
  * are the right before/after artifact: they show what the optimizer
  * planned from the query shape alone, independent of runtime statistics
  * at the probe SF.
  *
  * Run: `runMain graft.runner.PlanDump <outDir> <suffix> <query> [query …]`
  * (suffix is appended as `<outDir>/<query>_<suffix>.txt`).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query> [query …]")
    val (outDir, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]").appName("graft-plan-dump"),
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      val plan = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"wrote $outDir/${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
