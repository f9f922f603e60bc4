package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.ops.{MediaCatalog, Multimodal}

/** Scale evidence for [[MediaCatalog]] (VERDICT r10 item 2): the release
  * census and the near-dup probe served from the bucketed hash catalog
  * vs recomputed per run, at 1× and 10× corpus.
  *
  *   - `recompute`: the pre-catalog behavior — decode every blob
  *     ([[Multimodal.imageHashes]]) and shuffle the corpus into
  *     groupBy(ahash) EVERY release; cost grows with the corpus and the
  *     decode dominates;
  *   - `census`: [[MediaCatalog.hashCensus]] off the bucketed catalog —
  *     decode-free, exchange-free scan+agg (the decode was paid once at
  *     ingest, the shuffle once at the bucketed write);
  *   - `probe`: a FIXED 500-doc delivery through
  *     [[MediaCatalog.probeHashCatalog]] — one batch-sized repartition,
  *     the catalog never shuffled.
  *
  * The blob lake and the catalog are parquet/table-backed and UNTIMED
  * (standing state, the decode+bucket cost paid once at ingest); every
  * timed arm ends in a noop write. Blobs are real 64×48 PNGs decoded by
  * the real codec — inflate + unfilter per pixel, so the recompute arm
  * pays a genuine decode (the r11 fixture's 144-byte BMPs made decode
  * nearly free and could not show it; VERDICT r11 item 2) — content
  * keyed on doc_id%1000 so the census has 1000 duplicate classes.
  *
  * Run: `graft.runner.MediaCatalogProbe [docs1x]`. Results in
  * BENCH_NOTES.md under "r12: MediaCatalogProbe".
  */
object MediaCatalogProbe {
  def main(args: Array[String]): Unit = {
    val n1x = if (args.length > 0) args(0).toLong else 20000L
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-media-catalog-probe"),
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

    def blobs(from: Long, until: Long): DataFrame =
      spark.range(from, until).select(col("id")).as[Long]
        .mapPartitions(_.map { id =>
          val k = id % 1000
          val img = Multimodal.DecodedImage(64, 48,
            Array.tabulate(64 * 48 * 3)(i =>
              ((k * 7 + i * 131 + (i >> 5) * k) % 256).toByte))
          (id, Multimodal.encodePng(img))
        })
        .toDF("doc_id", "media")

    val tmp = java.nio.file.Files.createTempDirectory("graft-mcprobe").toString
    graft.core.SilverWriter.deleteOnExit(tmp)

    val results = Seq(1 -> n1x, 10 -> n1x * 10).map { case (scale, n) =>
      // ---- untimed standing state: the blob lake + the bucketed catalog
      blobs(0L, n).write.mode("overwrite").parquet(s"$tmp/blobs_$scale")
      val lake = spark.read.parquet(s"$tmp/blobs_$scale")
      val cat = s"mc_probe_cat_$scale"
      MediaCatalog.writeHashCatalog(
        lake, "doc_id", "media", cat, s"$tmp/cat_$scale", 32)
      // fixed-size delivery, same absolute size at every scale
      val batch = Multimodal.imageHashes(
        blobs(n, n + 500L), "doc_id", "media").toDF()

      def runRecompute(): Unit = noop(
        Multimodal.imageHashes(lake, "doc_id", "media").toDF()
          .groupBy("ahash")
          .agg(count(lit(1)).as("n_docs"), min("doc_id").as("canonical_doc")))
      def runCensus(): Unit = noop(MediaCatalog.hashCensus(spark, cat))
      def runProbe(): Unit = noop(MediaCatalog.probeHashCatalog(spark, batch, cat))

      runRecompute(); runCensus(); runProbe() // warm plan paths
      def time(run: () => Unit): Double = (1 to 3).map { _ =>
        dropCaches()
        val t0 = System.nanoTime(); run()
        (System.nanoTime() - t0) / 1e9
      }.min
      val rc = time(() => runRecompute())
      val ce = time(() => runCensus())
      val pr = time(() => runProbe())
      f""""x$scale":{"docs":$n,"recompute":$rc%.3f,"census":$ce%.3f,"probe":$pr%.3f}"""
    }
    println(s"""{"probe":"media-catalog",${results.mkString(",")}}""")
    spark.stop()
  }
}
