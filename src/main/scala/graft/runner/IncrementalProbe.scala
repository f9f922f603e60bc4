package graft.runner

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Lake}
import graft.ops.Dedup

/** O(batch) evidence for [[Dedup.incrementalMinhash]]: time the
  * incremental path at several corpus/batch splits of the same documents
  * table. If the operator is O(batch) — only the batch is signed, corpus
  * work candidate-restricted — runtime must track the BATCH size, not the
  * (growing) corpus size. The q54 bench number alone can't show this: its
  * oracle split (corpus 250 / batch 4750) makes the batch 95% of the
  * corpus, so it costs what the full q32 pass costs, as expected.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... graft.runner.IncrementalProbe`.
  * Measured results live in the [[Dedup.incrementalMinhash]] scaladoc.
  */
object IncrementalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-incr-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def dropCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val tmp = java.nio.file.Files.createTempDirectory("graft-incr-probe").toString
    val docs = Lake(spark, sfDir).documents
    val total = docs.count()

    val results = Seq(250L, total - 500, total - 100).map { split =>
      // untimed: the lake's persisted corpus artifacts for this split
      val corpusSh = Dedup.shingles(
        docs.filter(col("doc_id") < split), "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      corpusSh.write.mode("overwrite").parquet(s"$tmp/sh_$split")
      Dedup.lshBands(Dedup.minhashSignatures(corpusSh, 16), 4, 4)
        .write.mode("overwrite").parquet(s"$tmp/bands_$split")
      corpusSh.unpersist()
      def run(): Unit = noop(Dedup.incrementalMinhash(
        spark.read.parquet(s"$tmp/bands_$split"),
        spark.read.parquet(s"$tmp/sh_$split"),
        Dedup.shingles(docs.filter(col("doc_id") >= split), "doc_id", "text", 3),
        0.8))
      run() // warm plan paths
      val samples = (1 to 3).map { _ =>
        dropCaches()
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      f""""corpus_${split}_batch_${total - split}":${samples.min}%.3f"""
    }
    println(s"""{"probe":"incremental-obatch","sf":"$sfDir","total_docs":$total,${results.mkString(",")}}""")
    graft.core.SilverWriter.deleteOnExit(tmp)
    spark.stop()
  }
}
