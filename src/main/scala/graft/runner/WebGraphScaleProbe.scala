package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Lake}
import graft.ops.WebGraph

/** Scaling probe for the crawl link-graph family (the TextScaleProbe
  * pattern): pages replicate `replicas`× AND the host universe grows
  * `replicas`× with them (17 → 17·replicas hosts), so both sides of the
  * scale story are probed — extraction work grows with the PAGE count,
  * the rank loop's state with the HOST count. Near-linear growth for
  * host_edges and a host_rank that stays rank-state-bound (its frames
  * are (host, long) rows — broadcastable at any corpus size) are the
  * pass conditions; a super-linear edge build would mean the explode
  * stopped fusing into the scan stage.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... graft.runner.WebGraphScaleProbe [replicas]`.
  * Measured results are recorded in the [[graft.ops.WebGraph]] scaladoc.
  */
object WebGraphScaleProbe {

  /** Crawl pages over `17 * replicas` hosts: replica r of doc d links to
    * two modular neighbors in the grown host space, mirroring the
    * q82/q83 fixture shape at scale. */
  def pagesNx(spark: SparkSession, dir: String, replicas: Int): DataFrame = {
    val k = 17 * replicas
    val base = Lake(spark, dir).documents.select("doc_id", "text")
    val rep = spark.range(replicas.toLong).select(col("id").as("replica"))
    base.crossJoin(broadcast(rep))
      .select((col("doc_id") + col("replica") * 1000000L).as("doc_id"),
        col("text"))
      .select(
        col("doc_id"),
        concat(lit("h"), pmod(col("doc_id"), lit(k)), lit(".example")).as("src_host"),
        concat(
          lit("<html><body><a href=\"http://h"), pmod(col("doc_id") * 3 + 1, lit(k)),
          lit(".example/p"), col("doc_id"),
          lit("\">a</a><A HREF=\"HTTPS://H"), pmod(col("doc_id") * 5 + 2, lit(k)),
          lit(".EXAMPLE/q"), col("doc_id"),
          lit("?x=1\">b</A><p>"), col("text"),
          lit("</p><a href=\"/nav\">n</a></body></html>")).as("html"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = if (args.nonEmpty) args(0).toInt else 10
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-webgraph-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val one = pagesNx(spark, sfDir, 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ten = pagesNx(spark, sfDir, replicas)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (n1, n10) = (one.count(), ten.count())

    // canonicalization probe input: one URL per page, crawl-log shaped
    def urls(pages: DataFrame): DataFrame = pages.select(
      concat(lit("HTTP://"), upper(col("src_host")), lit(":80/p?utm_source=x&id=1#f"))
        .as("url"))

    val probes: Seq[(String, DataFrame => DataFrame)] = Seq(
      "host_edges" -> (p => WebGraph.hostEdges(p, col("src_host"), col("html"))),
      "host_rank" -> (p =>
        WebGraph.hostRank(WebGraph.hostEdges(p, col("src_host"), col("html")))),
      "anchor_index" -> (p => WebGraph.anchorIndex(p, col("html"))),
      "url_canonical" -> (p =>
        urls(p).select(WebGraph.canonicalizeUrl(col("url")).as("c"))),
      // r6 topology family: triangle counting rides the degree-ordered
      // orientation (wedge work bounded by oriented out-degree, which the
      // modular fixture keeps near-constant as hosts grow), k-core peels
      // on monotonically-shrinking edge frames — both should scale with
      // the EDGE count, not pages
      "triangles" -> (p =>
        WebGraph.triangles(WebGraph.hostEdges(p, col("src_host"), col("html")))),
      "kcore" -> (p =>
        WebGraph.kCore(WebGraph.hostEdges(p, col("src_host"), col("html")), 2)),
      // the q87 composition: extraction + quality riding the scan, the
      // graph side folding to host-sized frames, one broadcast join back
      "crawl_pipeline" -> { p =>
        import graft.ops.TextAnalysis
        val ranks = WebGraph.hostRank(
          WebGraph.hostEdges(p, col("src_host"), col("html")))
        val cleaned = p.select(col("doc_id"), col("src_host"),
          TextAnalysis.extractText(col("html")).as("clean_text"))
        cleaned
          .join(broadcast(ranks), cleaned("src_host") === ranks("host"), "left")
          .select(col("doc_id"),
            coalesce(col("rank_units"), lit(0L)).as("rank_units"),
            TextAnalysis.qualityScore(col("clean_text")).as("quality"))
      }
    )

    val results = probes.map { case (name, op) =>
      noop(op(one)) // warm plan/codegen paths once
      val t1 = timed(noop(op(one)))
      noop(op(ten))
      val t10 = timed(noop(op(ten)))
      f""""$name":{"sec_1x":$t1%.3f,"sec_${replicas}x":$t10%.3f,"factor":${t10 / t1}%.1f}"""
    }.mkString(",")

    println(
      f"""{"probe":"webgraph-scale","sf":"$sfDir","rows_1x":$n1,"rows_${replicas}x":$n10,$results}""")
    spark.stop()
  }
}
