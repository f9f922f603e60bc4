package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Lake}
import graft.ops.Similarity

/** O(queries) check for the IVF serving path (the IncrementalProbe
  * pattern applied to ANN): build the cluster-partitioned index ONCE
  * (setup, amortized per corpus snapshot), then time query batches of
  * different sizes against the SAME persisted index, at 1× and at a
  * corpus grown `replicas`× (vectors perturbed per replica so clusters
  * stay meaningful). The serving claim holds when batch time scales
  * with the query count and probed-cluster volume — not with corpus
  * size outside the probed clusters — i.e. the big-batch/small-batch
  * ratio stays far below the batch-size ratio (fixed stage setup
  * dominates), and the 10× corpus moves the per-batch time by the
  * probed-partition growth only.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... graft.runner.IvfServeProbe [replicas]`.
  * Measured results are recorded in the [[graft.ops.Similarity]]
  * scaladoc.
  */
object IvfServeProbe {

  /** `replicas`× corpus: replica r of vector v gets ids offset by
    * 100000·r and each component nudged by a tiny deterministic delta,
    * so replicas are near their original (same cluster neighborhoods)
    * without being identical. */
  def corpusNx(spark: SparkSession, dir: String, replicas: Int): DataFrame = {
    val rep = spark.range(replicas.toLong).select(col("id").as("replica"))
    val base = Lake(spark, dir).embeddings
    Similarity.withNorm(
      base.crossJoin(broadcast(rep))
        .select(
          (col("vec_id") + col("replica") * 100000L).as("vec_id"),
          transform(col("embedding"),
            x => x + (col("replica") % 7).cast("float") / lit(1000.0f))
            .as("embedding")),
      "vec_id", "embedding")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = if (args.nonEmpty) args(0).toInt else 10
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-ivf-serve-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-serve").toString
    val results = Seq(1, replicas).map { n =>
      val corpus = corpusNx(spark, sfDir, n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nVec = corpus.count()
      val centroids = corpus.filter(col("vec_id") < 32)
      val setup = timed {
        Similarity.ivfAssign(corpus, centroids)
          .write.mode("overwrite").partitionBy("cluster_id")
          .parquet(s"$dir/index_$n")
      }
      val index = spark.read.parquet(s"$dir/index_$n")
      def serve(nq: Int): Double = {
        val queries = corpus.filter(col("vec_id") < nq)
        noop(Similarity.ivfTopKFromAssigned(index, centroids, queries, 10, 2))
        timed(noop(
          Similarity.ivfTopKFromAssigned(index, centroids, queries, 10, 2)))
      }
      val t10 = serve(10)
      val t100 = serve(100)
      corpus.unpersist()
      f""""corpus_${n}x":{"vectors":$nVec,"setup_sec":$setup%.3f,"serve_10q_sec":$t10%.3f,"serve_100q_sec":$t100%.3f,"batch_ratio":${t100 / t10}%.2f}"""
    }.mkString(",")

    println(s"""{"probe":"ivf-serve","sf":"$sfDir",$results}""")
    graft.core.SilverWriter.deleteOnExit(dir)
    spark.stop()
  }
}
