package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Lake}
import graft.ops.{Behavior, Layout, Snapshot, WebGraph}

/** Scaling probe for the behavioral/event family (ops.Behavior,
  * Snapshot.scd2, Layout.zorderWrite) and the BFS crawl depth — the
  * TextScaleProbe discipline: run at 1× and N×, report the growth
  * factor. The replication axis is the USER population (each replica
  * shifts user_id and event_id), because that is how an event log
  * actually grows — more users, the same per-user history shape — and
  * it is exactly the partition key the one-shuffle designs ride on.
  *
  * crawlDepth scales on its own axis: a synthetic host graph with 10×
  * the hosts at the same out-degree, BFS depth fixed at 4 rounds.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... graft.runner.BehaviorScaleProbe [N]`.
  * Measured results are recorded in the probed ops' scaladocs.
  */
object BehaviorScaleProbe {

  def eventsNx(spark: SparkSession, dir: String, replicas: Int): DataFrame = {
    val base = Lake(spark, dir).events
    val rep = spark.range(replicas.toLong).select(col("id").as("replica"))
    base.crossJoin(broadcast(rep))
      .select(
        (col("event_id") + col("replica") * 10000000L).as("event_id"),
        col("ts"),
        (col("user_id") + col("replica") * 1000000L).as("user_id"),
        col("event_type"), col("value"))
  }

  def hostGraph(spark: SparkSession, hosts: Int, edgesPerHost: Int): DataFrame = {
    val n = hosts.toLong * edgesPerHost
    spark.range(n).select(
      concat(lit("h"), col("id") % hosts).as("src_host"),
      concat(lit("h"),
        // small-multiplier LCG: id stays < ~1e6 here, so the product
        // fits a long under ANSI arithmetic
        (col("id") * 1103515245L + 12345L) % hosts).as("dst_host"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = if (args.nonEmpty) args(0).toInt else 10
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-behavior-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val one = eventsNx(spark, sfDir, 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ten = eventsNx(spark, sfDir, replicas)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (n1, n10) = (one.count(), ten.count())
    val sevenDaysUs = 7L * 24 * 3600 * 1000000

    val probes: Seq[(String, DataFrame => DataFrame)] = Seq(
      "funnel" -> (d => Behavior.funnel(d, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), Some(sevenDaysUs))),
      "transitions" -> (d => Behavior.transitions(
        d, "user_id", "ts", "event_id", "event_type")),
      "retention" -> (d => Behavior.retention(d, "user_id", "ts")),
      "scd2" -> (d => Snapshot.scd2(d, "user_id", "ts", "event_id", "event_type")),
      "zorder_key" -> (d => d.select(Layout.zorderKey(Seq(
        col("user_id"), Layout.scaleToBits(col("value"), 0.0, 500.0))).as("z")))
    )
    val results = probes.map { case (name, op) =>
      noop(op(one)) // warm plan/codegen paths once
      val t1 = timed(noop(op(one)))
      noop(op(ten))
      val t10 = timed(noop(op(ten)))
      f""""$name":{"sec_1x":$t1%.3f,"sec_${replicas}x":$t10%.3f,"factor":${t10 / t1}%.1f}"""
    }

    // BFS: 10x hosts, same out-degree, fixed 4 rounds
    val seeds = spark.range(3).select(concat(lit("h"), col("id")).as("host"))
    def bfs(hosts: Int): Unit =
      noop(WebGraph.crawlDepth(hostGraph(spark, hosts, 20), seeds, maxDepth = 4))
    bfs(2000) // warm
    val b1 = timed(bfs(2000))
    val b10 = timed(bfs(2000 * replicas))
    val bfsJson =
      f""""crawl_depth":{"sec_1x":$b1%.3f,"sec_${replicas}x":$b10%.3f,"factor":${b10 / b1}%.1f}"""

    // Zipf stress: the behavioral family's real skew risk is a HOT USER —
    // per-user windows serialize within a user, so one user holding 10%
    // of the log is one straggler task no partitioning can split. Measure
    // the wall-time ratio of the skewed log vs the uniform one at equal
    // row count; the mitigation (documented in ops.Behavior) is per-user
    // history capping upstream, not salting — a window's semantics ARE
    // per-user-sequential.
    val hot = ten.withColumn("user_id",
      when(pmod(col("event_id"), lit(10)) === 0, lit(424242L))
        .otherwise(col("user_id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    hot.count()
    def scd2On(d: DataFrame): Unit =
      noop(Snapshot.scd2(d, "user_id", "ts", "event_id", "event_type"))
    scd2On(hot) // warm
    val zUni = timed(scd2On(ten))
    val zHot = timed(scd2On(hot))
    val zipfJson =
      f""""scd2_zipf":{"uniform_s":$zUni%.3f,"hot_user_s":$zHot%.3f,"ratio":${zHot / zUni}%.2f}"""

    println(f"""{"probe":"behavior-scale","sf":"$sfDir","rows_1x":$n1,""" +
      f""""rows_${replicas}x":$n10,${(results :+ bfsJson :+ zipfJson).mkString(",")}}""")
    spark.stop()
  }
}
