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
    // result on the driver (collect() would OOM on large-SF pair joins;
    // a noop write would execute a different QueryExecution)
    df.foreach(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    println(plan)
    def n(pat: String) = pat.r.findAllIn(plan).length
    println(s"--- audit: exchanges=${n("Exchange hashpartitioning")}" +
      s" reused=${n("ReusedExchange")} broadcastJoins=${n("BroadcastHashJoin")}" +
      s" sortMergeJoins=${n("SortMergeJoin")} codegenSpans=${n("""\*\(\d+\)""")}" +
      s" cartesian=${n("CartesianProduct")}")
    spark.stop()
  }
}
