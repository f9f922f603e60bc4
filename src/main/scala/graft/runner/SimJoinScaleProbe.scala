package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Lake}
import graft.ops.{Dedup, Linkage, WebGraph}

/** Scaling probe for the round-7 operators (the WebGraphScaleProbe
  * pattern — measured, not asserted):
  *
  *   1. Exact-Jaccard pair detection on a duplicated corpus:
  *      [[Dedup.jaccardPairs]] (full inverted index) vs
  *      [[Dedup.prefixFilterPairs]] (AllPairs prefix) vs
  *      [[Dedup.minhashDedupCapped]] (LSH, the approximate baseline).
  *      The corpus replicates the sf documents `replicas`×: replica 0
  *      original, every third replica heavily perturbed (common words
  *      rewritten — drops below threshold), the rest near-dups (two
  *      appended tail words). This is the regime where the inverted
  *      index pays Σ C(df,2) on boilerplate shingles and the prefix
  *      filter's rarest-token candidates should win while returning the
  *      IDENTICAL exact answer.
  *
  *   2. [[Linkage.sortedNeighborhood]] on the same grown corpus — the
  *      window pairing is linear in rows; pass condition is near-linear
  *      wall growth.
  *
  *   3. [[WebGraph.labelPropagation]] / [[WebGraph.weightedPaths]] on a
  *      host graph whose host universe grows with the corpus (the
  *      WebGraphScaleProbe convention): per-round frames are
  *      (host, label/cost) rows, so rounds-fixed growth should be
  *      data-linear.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... graft.runner.SimJoinScaleProbe [replicas]`.
  * Measured results live in the operator scaladocs and BENCH_NOTES.md.
  */
object SimJoinScaleProbe {

  /** Duplicated corpus with an optional BOILERPLATE suffix on every doc
    * (the web-template regime: a handful of shingles with df = corpus
    * size). Replica 0 original, every third replica heavily perturbed
    * (drops below threshold), the rest near-dups. */
  def corpus(
      spark: SparkSession, dir: String, replicas: Int,
      boilerplate: Boolean): DataFrame = {
    val docs = Lake(spark, dir).documents.select("doc_id", "text")
    val reps = spark.range(replicas.toLong).select(col("id").as("rep"))
    val suffix =
      if (boilerplate)
        lit(" visit example site subscribe newsletter accept terms privacy")
      else lit("")
    docs.crossJoin(broadcast(reps))
      .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"),
        concat(
          when(col("rep") === 0, col("text"))
            .when(pmod(col("rep"), lit(3)) === 0,
              regexp_replace(col("text"), lit("the|data|order|key"),
                concat(lit("w"), col("rep"))))
            .otherwise(concat(col("text"), lit(" tail"), col("rep"),
              lit(" end"))),
          suffix).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = if (args.nonEmpty) args(0).toInt else 10
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-simjoin-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timedCount(df: DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def clean(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    for (k <- Seq(1, replicas); bp <- Seq(false, true)) {
      val c = corpus(spark, sfDir, k, bp).persist()
      val rows = c.count()
      println(s"== corpus x$k boilerplate=$bp: $rows docs ==")

      // uncapped brute force pays C(df,2) per shingle: with boilerplate
      // df = corpus size, so run it only while that is feasible (x1)
      if (!bp || k == 1) {
        val sh = Dedup.shingles(c, "doc_id", "text", 3)
        val (tBrute, nBrute) = timedCount(Dedup.jaccardPairs(sh, 0.8))
        clean()
        val sh2 = Dedup.shingles(c, "doc_id", "text", 3)
        val (tPrefix, nPrefix) = timedCount(Dedup.prefixFilterPairs(sh2, 0.8))
        clean()
        println(f"jaccardPairs      $tBrute%7.2f s  $nBrute pairs (exact)")
        println(f"prefixFilterPairs $tPrefix%7.2f s  $nPrefix pairs (exact)")
        require(nPrefix == nBrute,
          s"prefix filter must be exact: $nPrefix vs $nBrute")
      } else {
        val sh2 = Dedup.shingles(c, "doc_id", "text", 3)
        val (tPrefix, nPrefix) = timedCount(Dedup.prefixFilterPairs(sh2, 0.8))
        clean()
        println(f"prefixFilterPairs $tPrefix%7.2f s  $nPrefix pairs (exact; " +
          "uncapped brute infeasible here)")
      }
      val (tCapped, nCapped) = timedCount(
        Dedup.jaccardDedup(c, "doc_id", "text", 3, 0.8, maxDf = 1000))
      clean()
      val (tMinhash, nMinhash) = timedCount(
        Dedup.minhashDedupCapped(c, "doc_id", "text", 3, 0.8))
      clean()
      println(f"jaccardDedup(cap) $tCapped%7.2f s  $nCapped pairs (df-capped)")
      println(f"minhashDedupCapped$tMinhash%7.2f s  $nMinhash pairs (approx)")

      if (!bp) {
      val ws = split(col("text"), " ")
      val (tSnm, nSnm) = timedCount(Linkage.sortedNeighborhood(
        c, "doc_id",
        Seq(lower(substring(col("text"), 1, 24)),
          lower(concat(coalesce(element_at(ws, 2), lit("")), lit(" "),
            coalesce(element_at(ws, 1), lit(""))))),
        window = 4, blockChars = 2))
      clean()
      println(f"sortedNeighborhood$tSnm%7.2f s  $nSnm pairs")

      // host graph grows with the corpus: 24*k hosts
      val hk = 24 * k
      val edges = c
        .select(concat(lit("h"), pmod(col("doc_id"), lit(hk))).as("src_host"),
          concat(lit("h"), pmod(col("doc_id") * 3 + 1, lit(hk))).as("dst_host"))
        .union(c.select(
          concat(lit("h"), pmod(col("doc_id"), lit(hk))).as("src_host"),
          concat(lit("h"), pmod(col("doc_id") * 7 + 3, lit(hk))).as("dst_host")))
      val (tLpa, nLpa) = timedCount(WebGraph.labelPropagation(edges, 3))
      clean()
      val seeds = edges.select(col("src_host").as("host")).limit(2)
      val (tWp, nWp) = timedCount(WebGraph.weightedPaths(
        edges.withColumn("weight", pmod(length(col("src_host")), lit(4)) + 1),
        seeds, rounds = 4))
      clean()
      println(f"labelPropagation  $tLpa%7.2f s  $nLpa hosts")
      println(f"weightedPaths     $tWp%7.2f s  $nWp hosts")
      }
      c.unpersist()
    }
    spark.stop()
  }
}
