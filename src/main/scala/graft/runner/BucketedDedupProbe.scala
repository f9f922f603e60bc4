package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.ops.Dedup

/** Scale evidence for [[Dedup.simhashIncrementalBucketed]]: the same
  * fixed-size batch probed against a fingerprint index at 1× and 10×
  * corpus size, through both serving paths —
  *
  *   - `shuffled`: [[Dedup.simhashIncremental]] over the index read from
  *     plain parquet — every run re-shuffles index ∪ batch on the band
  *     key (an exchange that GROWS with the corpus);
  *   - `bucketed`: [[Dedup.simhashIncrementalBucketed]] over the index
  *     written once by [[Dedup.writeSimhashIndexBucketed]] — the timed
  *     section includes the batch's own tiny bucketed write, and the
  *     plan's only exchange is the O(candidates) distinct.
  *
  * The index compaction (bucketed write) is deliberately UNTIMED: it is
  * the shuffle paid once at compaction and amortized over every
  * subsequent batch — the exact trade the operator exists to make.
  *
  * Fingerprints: 4×16-bit bands off `v = id % 50021`, band 2 low bit
  * flipped for odd ids (planted hamming-1 near-dups). Band buckets
  * densify as the corpus grows — the realistic 64-bit-fingerprint
  * regime — so candidates grow with corpus density in BOTH arms alike.
  *
  * Run: `graft.runner.BucketedDedupProbe [corpus1x] [batch]`.
  * Measured results live in the operator scaladoc and BENCH_NOTES.md.
  */
object BucketedDedupProbe {
  def main(args: Array[String]): Unit = {
    val corpus1x = if (args.length > 0) args(0).toLong else 100000L
    val batchN = if (args.length > 1) args(1).toLong else 2000L
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-bucketed-dedup-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def dropCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def fp(from: Long, until: Long): DataFrame = {
      val v = col("id") % 50021L
      spark.range(from, until).select(
        col("id").as("doc_id"),
        (v * 7919L % 65536L).as("b0"),
        (v * 104729L % 65536L).as("b1"),
        ((v * 1299709L % 65536L).bitwiseXOR(col("id") % 2L)).as("b2"),
        (v * 15485863L % 65536L).as("b3"))
    }

    val tmp = java.nio.file.Files.createTempDirectory("graft-bdedup").toString
    graft.core.SilverWriter.deleteOnExit(tmp)

    val results = Seq(1 -> corpus1x, 10 -> corpus1x * 10).map {
      case (scale, n) =>
        // untimed: both persisted index artifacts for this corpus size
        fp(0L, n).write.mode("overwrite").parquet(s"$tmp/plain_$scale")
        Dedup.writeSimhashIndexBucketed(
          fp(0L, n), s"bdp_idx_$scale", s"$tmp/bidx_$scale", cpus)
        val batch = fp(n, n + batchN)

        def runShuffled(): Unit = noop(Dedup.simhashIncremental(
          batch, spark.read.parquet(s"$tmp/plain_$scale"), maxHamming = 3))
        // table-to-table: zero exchanges, but pays a per-batch
        // saveAsTable commit — the compact-and-probe shape
        def runBucketed(): Unit = {
          Dedup.writeSimhashIndexBucketed(
            batch, s"bdp_bat_$scale", s"$tmp/bbat_$scale", cpus)
          noop(Dedup.simhashIncrementalBucketed(
            spark, s"bdp_bat_$scale", s"bdp_idx_$scale", maxHamming = 3))
        }
        // frame-to-table: the serving shape — one batch-sized exchange,
        // index never shuffled, no metastore round trip
        def runProbe(): Unit = noop(Dedup.probeSimhashIndexBucketed(
          spark, batch, s"bdp_idx_$scale", maxHamming = 3))
        runShuffled(); runBucketed(); runProbe() // warm plan paths
        def time(run: () => Unit): Double = (1 to 3).map { _ =>
          dropCaches()
          val t0 = System.nanoTime(); run()
          (System.nanoTime() - t0) / 1e9
        }.min
        val sh = time(() => runShuffled())
        val bu = time(() => runBucketed())
        val pr = time(() => runProbe())
        f""""x$scale":{"corpus":$n,"shuffled":$sh%.3f,"bucketed":$bu%.3f,"probe":$pr%.3f}"""
    }
    println(s"""{"probe":"bucketed-dedup","batch":$batchN,${results.mkString(",")}}""")
    spark.stop()
  }
}
