package graft.runner

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession
import graft.queries.Registry

/** Plan inspector for any registered query: executes it (so AQE
  * finalizes) and prints the physical plan plus the counts that matter at
  * scale — exchanges (shuffles), exchange reuse, broadcast vs sort-merge
  * joins, whole-stage codegen spans. The review loop the project runs
  * after every operator lands: `.explain` until it's the plan you'd WANT
  * at 100 TB, not the first one that passed.
  *
  * Run: `runMain graft.runner.PlanAudit <queryName> [sfDir]`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: PlanAudit <query> [sfDir]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]").appName("graft-plan-audit"),
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = Registry.byName(name).run(spark, sfDir)
    // finalize THIS dataframe's adaptive plan without materializing the
    // result on the driver: run the executedPlan's OWN RDD (collect()
    // would OOM on large-SF pair joins; df.foreach / a noop write plan a
    // SEPARATE QueryExecution and leave this one's AQE unfinalized —
    // the audit would then count the static pre-AQE plan, which is
    // exactly the mistake this tool exists to prevent)
    val qe = df.queryExecution
    qe.executedPlan.execute().foreach(_ => ())
    val plan = qe.executedPlan.toString
    println(plan)
    def n(pat: String) = pat.r.findAllIn(plan).length
    // a finalized adaptive plan prints each materialized exchange twice
    // (the ShuffleQueryStage wrapper AND its child Exchange) — the stage
    // count is the true shuffle count when stages exist
    val shuffles =
      if (n("ShuffleQueryStage") > 0) n("ShuffleQueryStage")
      else n("Exchange (hash|range|single)")
    println(s"--- audit: finalized=${plan.contains("isFinalPlan=true")}" +
      s" shuffles=$shuffles" +
      s" reused=${n("ReusedExchange")} broadcastJoins=${n("BroadcastHashJoin")}" +
      s" sortMergeJoins=${n("SortMergeJoin")}" +
      s" codegenSpans=${math.max(n("""\*\(\d+\)"""), n("WholeStageCodegen"))}" +
      s" cartesian=${n("CartesianProduct")}")
    spark.stop()
  }
}
