package graft.runner

import org.apache.spark.sql.SparkSession

import graft.{BenchSetup, SparkEntry}
import graft.core.GraftSession

/** Dedicated-JVM timing for a handful of queries — the cross-check
  * BENCH_NOTES.md prescribes before believing a surprising in-suite bench
  * number (this VM's 12-minute full sweeps inflate individual queries in
  * ways a clean session does not reproduce).
  *
  * Queries named in BenchSetup's overrides run in their production shape
  * (amortized artifacts materialized untimed first), matching the bench.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... graft.runner.TimeQuery q32_dedup_minhash_lsh …`
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQuery <queryName> [queryName …]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-time-query"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dropCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      // ContextCleaner is GC-driven: in a large-heap measurement JVM the
      // collector may never run on its own, so shuffle files and broadcast
      // blocks from previous samples pile up and perturb later ones (the
      // bimodal q54 samples that round 5 could not attribute). An explicit
      // GC between samples keeps each measurement's runway clean.
      System.gc()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val setupDir = java.nio.file.Files.createTempDirectory("graft-timequery").toString
    val (overrides, _) = BenchSetup.materialize(spark, sfDir, setupDir, dropCaches _)
    val fns = SparkEntry.queries ++ overrides

    val results = args.toSeq.map { name =>
      val fn = fns.getOrElse(name, sys.error(s"unknown query: $name"))
      noop(fn(spark, "/root/testdata/sf0.001")) // JIT/classload warmup
      val samples = (1 to 3).map { _ =>
        dropCaches()
        val t0 = System.nanoTime()
        noop(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      s""""$name":[${samples.map(v => f"$v%.3f").mkString(",")}]"""
    }
    println(s"""{"probe":"time-query","sf":"$sfDir",${results.mkString(",")}}""")
    graft.core.SilverWriter.deleteOnExit(setupDir)
    spark.stop()
  }
}
