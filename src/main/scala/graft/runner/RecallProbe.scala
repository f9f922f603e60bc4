package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Lake}
import graft.ops.Similarity

/** ANN quality probe: recall@k and speedup of [[Similarity.ivfTopK]] and
  * [[Similarity.lshTopK]] against [[Similarity.bruteForceTopK]] ground
  * truth on a 10× corpus — the same measured-not-asserted evidence the
  * dedup family documents (its 10×-corpus probe: minhash recall 99.9%,
  * 7× speedup).
  *
  * Corpus: the sf embeddings replicated 10× — each replica's components
  * perturbed by a deterministic ±3% rational factor, so every original
  * grows a tight cluster of near-neighbors (the regime ANN exists for)
  * while replicas of DIFFERENT vectors stay far apart. Queries are 50
  * original vectors; ground truth is exact top-10 cosine.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... graft.runner.RecallProbe [replicas]`.
  * Measured results are recorded in the [[Similarity]] scaladoc; the
  * SimilaritySpec recall-floor test pins the same property at test scale.
  */
object RecallProbe {

  /** Original embeddings + (replicas-1) perturbed copies, withNorm shape.
    * Replica r of vector v gets id v + r*1e6 and components scaled by
    * (1 + ((r*31 + pos*17) % 13 - 6) / 200) — deterministic, ±3%. */
  def corpus10x(spark: SparkSession, dir: String, replicas: Int): DataFrame = {
    val base = Lake(spark, dir).embeddings
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val rep = spark.range(replicas.toLong).select(col("id").as("replica"))
    base.crossJoin(broadcast(rep))
      .select(
        (col("vec_id") + col("replica") * 1000000L).as("vec_id"),
        transform(col("v"),
          (x, pos) => x * (lit(1.0) +
            ((col("replica") * 31 + pos * 17) % 13 - 6).cast("double") / 200.0))
          .as("v"))
      .withColumn("nrm", Similarity.l2Norm(col("v")))
  }

  /** Fraction of exact top-k pairs the approximate result recovers. */
  def recallOf(approx: DataFrame, exact: DataFrame): Double = {
    val hits = approx.select("query_id", "neighbor_id")
      .join(exact.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
    hits.toDouble / exact.count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = if (args.nonEmpty) args(0).toInt else 10
    val k = 10
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-recall-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val corpus = corpus10x(spark, sfDir, replicas)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = corpus.count()
    val queries = corpus.filter(col("vec_id") < 50)

    // warm plan paths once, then time
    noop(Similarity.bruteForceTopK(corpus, queries, k))
    val bfSec = time(noop(Similarity.bruteForceTopK(corpus, queries, k)))
    val exact = Similarity.bruteForceTopK(corpus, queries, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    exact.count()

    // IVF: k-means centroids are the amortized setup (built once per corpus
    // snapshot); the probe-time cost is what a query batch pays
    val kCent = 32
    var centroids: DataFrame = null
    val centSec = time {
      centroids = Similarity.kMeansCentroids(corpus, kCent, maxIter = 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      centroids.count()
    }
    val ivf = Seq(1, 2, 4).map { nProbe =>
      val out = Similarity.ivfTopK(corpus, centroids, queries, k, nProbe)
      noop(out) // warm
      val sec = time(noop(out))
      val r = recallOf(out, exact)
      f""""nprobe_$nProbe":{"recall":$r%.4f,"sec":$sec%.3f}"""
    }.mkString(",")

    val lsh = (for { nPlanes <- Seq(8); bits <- Seq(1, 2) } yield {
      val out = Similarity.lshTopK(corpus, queries, k, nPlanes, dim = 64,
        multiprobeBits = bits)
      noop(out)
      val sec = time(noop(out))
      val r = recallOf(out, exact)
      f""""planes_${nPlanes}_bits_$bits":{"recall":$r%.4f,"sec":$sec%.3f}"""
    }).mkString(",")

    // semanticDedup at 10×: cluster-count is the pair-join lever —
    // Σ C(cluster_size, 2) shrinks ~linearly in k for fixed corpus
    val sem = Seq(32, 128).map { kc =>
      val cents = Similarity.kMeansCentroids(corpus, kc, maxIter = 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cents.count()
      val out = Similarity.semanticDedup(corpus, cents, threshold = 0.995)
      noop(out)
      val sec = time(noop(out))
      val dropped = out.filter(!col("is_kept")).count()
      f""""k_$kc":{"sec":$sec%.3f,"dropped":$dropped}"""
    }.mkString(",")

    println(f"""{"probe":"ann-recall","sf":"$sfDir","corpus":$n,"queries":50,"k":$k,"bf_sec":$bfSec%.3f,"kmeans_setup_sec":$centSec%.3f,"ivf":{$ivf},"lsh":{$lsh},"semantic_dedup":{$sem}}""")
    spark.stop()
  }
}
