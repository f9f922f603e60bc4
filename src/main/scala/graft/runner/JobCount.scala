package graft.runner

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.core.GraftSession

/** Deterministic cost counters for a registered query: Spark jobs, stages,
  * tasks, shuffle bytes written and rows shuffled, via a SparkListener.
  *
  * This is the noise-immune half of an optimization measurement: wall-clock
  * on this box swings ±2× with host contention (BENCH_NOTES), but the number
  * of jobs a driver-side loop launches, the stages per job, and the bytes
  * crossing each exchange are properties of the CODE — identical run to run
  * at a fixed SF. A change that deletes a per-round shuffle join shows up
  * here as a hard stage/shuffle-byte drop even when wall-clock noise hides
  * it.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... runMain graft.runner.JobCount <query> […]`.
  * One JSON line per query:
  *   {"query": ..., "jobs": n, "stages": n, "tasks": n,
  *    "shuffle_write_bytes": n, "shuffle_write_rows": n,
  *    "executor_run_ms": n, "executor_cpu_ms": n}
  *
  * The two executor-time sums are the round-13 task-metrics extension
  * (VERDICT r12 item 5): they aggregate every task's executorRunTime /
  * executorCpuTime, so sub-noise expression rewrites (a narrower shuffle
  * type, fewer `conv` calls per row) can be validated against executor
  * CPU seconds rather than wall-clock — CPU time excludes scheduler and
  * fetch waits, so it is far less contended-host-sensitive. Counters are
  * read only after a deterministic `listenerBus.waitUntilEmpty()` drain
  * (via [[org.apache.spark.graft.ListenerShim]]); the previous fixed
  * sleep could under-count on a loaded host (ADVICE r12). */
object JobCount {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobCount <queryName> [queryName …]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-job-count"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufBytes = new AtomicLong
    val shufRows = new AtomicLong
    val execRunMs = new AtomicLong
    val execCpuNs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRows.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          execRunMs.addAndGet(m.executorRunTime)
          execCpuNs.addAndGet(m.executorCpuTime)
        }
      }
    })
    def dropCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }

    args.toSeq.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      dropCaches()
      // drain events from the PREVIOUS query before zeroing, so a straggler
      // task-end can't leak into this query's counters
      org.apache.spark.graft.ListenerShim.waitUntilListenerBusEmpty(spark.sparkContext)
      jobs.set(0); stages.set(0); tasks.set(0); shufBytes.set(0); shufRows.set(0)
      execRunMs.set(0); execCpuNs.set(0)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      // deterministic drain: block until every queued listener event has
      // been dispatched — exact counters on any host load
      org.apache.spark.graft.ListenerShim.waitUntilListenerBusEmpty(spark.sparkContext)
      println(s"""{"query":"$name","jobs":${jobs.get},"stages":${stages.get},""" +
        s""""tasks":${tasks.get},"shuffle_write_bytes":${shufBytes.get},""" +
        s""""shuffle_write_rows":${shufRows.get},""" +
        s""""executor_run_ms":${execRunMs.get},""" +
        s""""executor_cpu_ms":${execCpuNs.get / 1000000}}""")
    }
    spark.stop()
  }
}
