package graft.runner

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Lake}
import graft.ops.WebGraph

/** Skew stress for the webgraph family: real link graphs are ZIPFIAN —
  * the uniform-host growth of [[WebGraphScaleProbe]] never exercises the
  * hot-key path, so this probe builds a power-law host distribution
  * (hottest host ~10-14% of all page slots) and measures the operators
  * whose scale story depends on a skew lever:
  *
  *   - `host_edges` / `host_rank`: the aggregate/rank state is per-host,
  *     so a hot host means a hot shuffle KEY — the probe reports the
  *     hottest-task/median-task duration ratio per operator (a Spark
  *     listener over task end events) alongside wall time;
  *   - `anchor_index`: the two-level aggregation's claim is that state
  *     is bounded by distinct PHRASINGS, not link count — zipf traffic
  *     into one host with few distinct anchors is exactly the case the
  *     map-side partial combine must absorb;
  *   - `co_citation` capped vs uncapped: the maxOutDeg cap is the skew
  *     guard — the probe reports pair counts AND time for cap=50 vs
  *     cap=2^30, making the quadratic fan-out the cap removes visible.
  *
  * Deterministic zipf via inverse CDF: u = (hash(doc) mod 1000)/1000,
  * host = floor(K^u) — P(host ≤ k) ≈ ln k / ln K, so host 1 draws
  * ln 2 / ln K of the mass (~14% at K=170). Doubles are fine here (probe
  * only, not an oracle gate).
  *
  * Run: `SPARK_GRAFT_SF_DIR=... graft.runner.ZipfSkewProbe [replicas]`.
  * Measured results are recorded in the [[graft.ops.WebGraph]] scaladoc.
  */
object ZipfSkewProbe {

  /** Power-law host index in [1, hosts): floor(hosts^u), u ∈ [0,1). */
  def zipfIdx(seed: Column, hosts: Int): Column =
    least(
      floor(pow(lit(hosts.toDouble),
        pmod(seed, lit(1000)).cast("double") / 1000.0)).cast("long"),
      lit(hosts.toLong - 1))

  /** Crawl pages with zipfian source hosts AND zipfian link targets over
    * a `17 * replicas` host universe (the WebGraphScaleProbe geometry
    * with the uniform modulus swapped for the power law). */
  def zipfPages(spark: SparkSession, dir: String, replicas: Int): DataFrame = {
    val k = 17 * replicas
    val base = Lake(spark, dir).documents.select("doc_id", "text")
    val rep = spark.range(replicas.toLong).select(col("id").as("replica"))
    base.crossJoin(broadcast(rep))
      .select((col("doc_id") + col("replica") * 1000000L).as("doc_id"),
        col("text"))
      .select(
        col("doc_id"),
        concat(lit("z"), zipfIdx(col("doc_id") * 37 + 11, k),
          lit(".example")).as("src_host"),
        concat(
          lit("<html><body><a href=\"http://z"),
          zipfIdx(col("doc_id") * 53 + 7, k),
          lit(".example/p"), col("doc_id"),
          lit("\">read this</a><A HREF=\"HTTPS://Z"),
          zipfIdx(col("doc_id") * 97 + 3, k),
          lit(".EXAMPLE/q"), col("doc_id"),
          lit("?x=1\">source</A><p>"), col("text"),
          lit("</p></body></html>")).as("html"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = if (args.nonEmpty) args(0).toInt else 10
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-zipf-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // hottest-task/median-task ratio across all stages of one action —
    // the per-key skew made visible (a salted/capped/combined plan keeps
    // it near 1; a hot shuffle key drives it up with the data)
    val durations = scala.collection.mutable.ArrayBuffer[Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        durations.synchronized { durations += te.taskInfo.duration }
    }
    def timedWithSkew(f: => Unit): (Double, Double) = {
      durations.synchronized(durations.clear())
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener events post async; let the bus drain
      spark.sparkContext.removeSparkListener(listener)
      val ds = durations.synchronized(durations.sorted.toVector)
      val skew =
        if (ds.isEmpty) 0.0
        else ds.last.toDouble / math.max(ds(ds.size / 2).toDouble, 1.0)
      (sec, skew)
    }

    val pages = zipfPages(spark, sfDir, replicas)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPages = pages.count()
    val edges = WebGraph.hostEdges(pages, col("src_host"), col("html"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEdges = edges.count()
    // the hot-host share that makes this a skew probe, not a rerun of
    // the uniform one
    val hotShare = pages.filter(col("src_host") === "z1.example").count()
      .toDouble / nPages

    val probes: Seq[(String, () => Unit)] = Seq(
      "host_edges" -> (() =>
        noop(WebGraph.hostEdges(pages, col("src_host"), col("html")))),
      "host_rank" -> (() => noop(WebGraph.hostRank(edges))),
      "anchor_index" -> (() => noop(WebGraph.anchorIndex(pages, col("html")))),
      "co_citation_cap50" -> (() => noop(WebGraph.coCitation(edges, 50))),
      "co_citation_uncapped" -> (() =>
        noop(WebGraph.coCitation(edges, 1 << 30)))
    )
    val results = probes.map { case (name, op) =>
      op() // warm plan/codegen once
      val (sec, skew) = timedWithSkew(op())
      f""""$name":{"sec":$sec%.3f,"task_skew":$skew%.1f}"""
    }.mkString(",")
    val pairs50 = WebGraph.coCitation(edges, 50)
      .agg(sum("n_common_sources")).head.getLong(0)
    val pairsRaw = WebGraph.coCitation(edges, 1 << 30)
      .agg(sum("n_common_sources")).head.getLong(0)

    println(
      f"""{"probe":"zipf-skew","sf":"$sfDir","replicas":$replicas,"pages":$nPages,"edges":$nEdges,"hot_share":$hotShare%.3f,$results,"pairs_cap50":$pairs50,"pairs_uncapped":$pairsRaw}""")
    spark.stop()
  }
}
