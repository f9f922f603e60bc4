package graft

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession
import graft.runner.AmtPipeline

/** CLI entry for the AMT gold pipeline — the Spark equivalent of the
  * reference's `generate_parquet` Dagster op (amt_parquet.py:20-41):
  * read silver JSON for each school year, build every registered view,
  * write gold parquet.
  *
  * Usage: AmtRun <silverRoot> <goldRoot> <schoolYear> [<schoolYear>...]
  */
object AmtRun {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: AmtRun <silverRoot> <goldRoot> <schoolYear>...")
    val silverRoot = args(0)
    val goldRoot = args(1)
    val years = args.drop(2)
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-amt"),
      shufflePartitions = cpus
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    years.foreach { year =>
      new AmtPipeline(spark, silverRoot, year).writeAll(goldRoot)
      println(s"[amt] school year $year -> $goldRoot/$year")
    }
    spark.stop()
  }
}
