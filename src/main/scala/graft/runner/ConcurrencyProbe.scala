package graft.runner

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession

/** Measures the claim in [[AmtPipeline.writeAll]]'s scaladoc: independent
  * view jobs submitted from `parallelism` driver threads keep the
  * executors busy while a deep view's stage chain resolves on the
  * driver. The probe runs the full 41-view writeAll over the bench's
  * derived silver tree at parallelism 1 / 2 / 4 / 8 — fresh
  * [[AmtPipeline]] (cold memoized DAG) and fresh gold dir per run, SQL
  * caches dropped between runs, min of 3 — and prints the wall-clock per
  * arm. The speedup is bounded well below Amdahl's ideal because the
  * memoized `view` resolver is synchronized (plan construction serial,
  * actions concurrent) and the deep EWS/chrab DAG shares its spine
  * across most views; the number this records is the honest one.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... graft.runner.ConcurrencyProbe`.
  * Measured results live in BENCH_NOTES.md and the writeAll scaladoc. */
object ConcurrencyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-concurrency-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def dropCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-conc-probe").toString
    graft.core.SilverWriter.deleteOnExit(tmp)
    val silver = s"$tmp/silver"
    graft.Bench.deriveSilver(spark, sfDir, silver)

    var goldN = 0
    val results = Seq(1, 2, 4, 8).map { par =>
      def run(): Unit = {
        goldN += 1
        new AmtPipeline(spark, silver, "1995")
          .writeAll(s"$tmp/gold$goldN", parallelism = par)
      }
      run() // warm plan/codegen paths
      val secs = (1 to 3).map { _ =>
        dropCaches()
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      f""""par$par":${secs.min}%.3f"""
    }
    println(s"""{"probe":"view-concurrency","sf":"$sfDir",${results.mkString(",")}}""")
    spark.stop()
  }
}
