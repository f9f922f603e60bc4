package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.ops.Dedup

/** Scale evidence for [[Dedup.incrementalMinhashBucketed]] — the text
  * twin of [[BucketedDedupProbe]]: a FIXED 500-doc batch deduped against
  * a text corpus at 1× and 10×, through
  *
  *   - `shuffled`: [[Dedup.incrementalMinhash]] over plain-parquet
  *     corpus artifacts (bands + shingles) — the band join re-shuffles
  *     index ∪ batch every run;
  *   - `bucketed`: [[Dedup.incrementalMinhashBucketed]] over the
  *     bucketed index + shingle store — the corpus is never re-shuffled
  *     (batch repartition AQE-reused; verify via broadcast semi-join).
  *
  * Corpus compaction (the bucketed writes) is UNTIMED — paid once,
  * amortized over every batch. Docs are shingle-disjoint across scale
  * replicas (the DedupScaleProbe discipline: replica k prefixes every
  * word with `r<k>_`), so the probe measures corpus-size behavior, not
  * an N² fixture artifact; the batch shares vocabulary with replica 0
  * only, keeping its candidate set fixed as the corpus grows.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... graft.runner.BucketedMinhashProbe`.
  * Measured results live in the operator scaladoc and BENCH_NOTES.md. */
object BucketedMinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-bucketed-minhash-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def dropCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val tmp = java.nio.file.Files.createTempDirectory("graft-bminhash").toString
    graft.core.SilverWriter.deleteOnExit(tmp)
    val base = graft.core.Lake(spark, sfDir).documents
      .select(col("doc_id"), col("text"))
    val baseN = base.count()

    // replica k: ids shifted, every word prefixed r<k>_ (shingle-disjoint)
    def replica(k: Int): DataFrame = base.select(
      (col("doc_id") + lit(k * 10L * baseN)).as("doc_id"),
      regexp_replace(col("text"), "(^|\\s)(\\S)", s"$$1r${k}_$$2").as("text"))

    val batch = base.select((col("doc_id") + lit(1000L * baseN)).as("doc_id"),
      regexp_replace(col("text"), "(^|\\s)(\\S)", "$1r0_$2").as("text"))
      .limit(500)

    val scales =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10)
    val results = scales.map { scale =>
      val corpus = (0 until scale).map(replica).reduce(_.unionByName(_))
      val corpusSh = Dedup.shingles(corpus, "doc_id", "text", 3)
      val bands = Dedup.lshBands(Dedup.minhashSignatures(corpusSh, 16), 4, 4)
      // untimed: both persisted artifact sets for this corpus size
      corpusSh.write.mode("overwrite").parquet(s"$tmp/sh_$scale")
      bands.write.mode("overwrite").parquet(s"$tmp/bands_$scale")
      Dedup.writeMinhashIndexBucketed(bands, s"bmp_idx_$scale", s"$tmp/bi_$scale", cpus)
      Dedup.writeShingleStoreBucketed(corpusSh, s"bmp_sh_$scale", s"$tmp/bs_$scale", cpus)
      def newSh() = Dedup.shingles(batch, "doc_id", "text", 3)
      def runShuffled(): Unit = noop(Dedup.incrementalMinhash(
        spark.read.parquet(s"$tmp/bands_$scale"),
        spark.read.parquet(s"$tmp/sh_$scale"), newSh(), 0.8))
      def runBucketed(): Unit = noop(Dedup.incrementalMinhashBucketed(
        spark, s"bmp_idx_$scale", s"bmp_sh_$scale", newSh(), 0.8))
      runShuffled(); runBucketed() // warm plan paths
      def time(run: () => Unit): Double = (1 to 3).map { _ =>
        dropCaches()
        val t0 = System.nanoTime(); run()
        (System.nanoTime() - t0) / 1e9
      }.min
      val sh = time(() => runShuffled())
      val bu = time(() => runBucketed())
      f""""x$scale":{"docs":${baseN * scale},"shuffled":$sh%.3f,"bucketed":$bu%.3f}"""
    }
    println(s"""{"probe":"bucketed-minhash","batch":500,${results.mkString(",")}}""")
    spark.stop()
  }
}
