package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Lake}
import graft.ops.{Audit, Intervals, MultiDim, Stats}

/** Scaling probe for the round-6 OLAP/robust-stats/audit family — the same
  * measured-not-asserted evidence the dedup/text/behavior families carry:
  * run each operator on the sf events table and on a `replicas`× version
  * (distinct users per replica, the way a real event log grows), report
  * the runtime growth factor. Near-linear (≲ replicas) passes; the
  * operators are all one-exchange window/aggregate shapes, so super-linear
  * growth would mean a lost exchange reuse.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... graft.runner.OlapScaleProbe [replicas]`.
  * Measured results live in the scaladocs of the probed ops.
  */
object OlapScaleProbe {

  def eventsNx(spark: SparkSession, dir: String, replicas: Int): DataFrame = {
    val base = Lake(spark, dir).events
      .select("event_id", "ts", "user_id", "event_type", "value")
    val rep = spark.range(replicas.toLong).select(col("id").as("replica"))
    base.crossJoin(broadcast(rep))
      .select(
        (col("event_id") + col("replica") * 100000000L).as("event_id"),
        col("ts"),
        (col("user_id") + col("replica") * 1000000L).as("user_id"),
        col("event_type"),
        (col("value") + col("replica").cast("double")).as("value"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = if (args.nonEmpty) args(0).toInt else 10
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-olap-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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

    def intervals(d: DataFrame) = Intervals.coverage(
      d.select(col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
          .cast("long").as("s"),
        (datediff(to_date(col("ts")), to_date(lit("1970-01-01"))) +
          pmod(col("event_id"), lit(7))).cast("long").as("e")),
      Seq("user_id"), "s", "e")

    val dim = Lake(spark, sfDir).customer.select(col("c_custkey"))

    val probes: Seq[(String, DataFrame => DataFrame)] = Seq(
      "interval_coverage" -> intervals,
      "sigma_outliers" -> (d => Stats.sigmaOutliers(
        d.select(col("event_type"),
          floor(col("value") * lit(1e6)).cast("long").as("v")),
        Seq("event_type"), "v", 2)),
      "robust_outliers" -> (d => Stats.robustOutliers(
        d.select("event_type", "value"), Seq("event_type"), "value", 3.0)),
      "winsorize" -> (d => Stats.winsorize(
        d.select("event_id", "event_type", "value"),
        Seq("event_type"), "value", 0.05, 0.95)),
      "rollup" -> (d => MultiDim.rollupAgg(
        d.withColumn("day", to_date(col("ts"))).select("event_type", "day", "value"),
        Seq("event_type", "day"),
        Seq(sum(col("value").cast("decimal(38,6)")).cast("double").as("v"),
          count(lit(1)).as("n")))),
      "audit" -> (d => Audit.audit(d, Seq(
        Audit.NotNull("event_type"),
        Audit.InRange("value", -1e9, 1e9),
        Audit.RefIntegrity("user_id", dim, "c_custkey", broadcastDim = true))))
    )

    val results = probes.map { case (name, op) =>
      noop(op(one)) // warm plan/codegen once
      val t1 = timed(noop(op(one)))
      noop(op(ten))
      val t10 = timed(noop(op(ten)))
      f""""$name":{"sec_1x":$t1%.3f,"sec_${replicas}x":$t10%.3f,"factor":${t10 / t1}%.1f}"""
    }.mkString(",")

    println(
      f"""{"probe":"olap-scale","sf":"$sfDir","rows_1x":$n1,"rows_${replicas}x":$n10,$results}""")
    spark.stop()
  }
}
