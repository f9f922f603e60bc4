package graft.runner

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.core.{GraftSession, Lake}
import graft.ops.Dedup

/** One-off measurement harness answering the round-3 verdict's open
  * question: is r2's q32 2.10 s vs r3's 7.25 s a code regression or a
  * methodology artifact (r2 ran queries back-to-back without cache
  * cleanup, so Spark's CacheManager could substitute q31's persisted
  * shingle frames into q32's plan)?
  *
  * Three experiments, one JSON line each:
  *   A. r2 conditions — run q31, then q32 WITHOUT dropping caches. If q32
  *      returns to ~2 s, the r2 number was warm-cache substitution.
  *   B. r3 conditions — q32 cold and isolated, 3 samples, min.
  *   C. cold stage breakdown of q32's pipeline: shingle explode+distinct,
  *      minhash signatures, band self-join candidates, Jaccard verify —
  *      which stage dominates the cold cost.
  */
object BenchAttribution {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench-attrib"),
      shufflePartitions = cpus
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dropCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def runQ(name: String): Unit = noop(SparkEntry.queries(name)(spark, sfDir))

    // warmup (JIT + classloading) at the smallest SF, then page-cache prime
    Seq("q31_dedup_ngram_jaccard", "q32_dedup_minhash_lsh").foreach { q =>
      noop(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")); dropCaches()
    }
    noop(spark.read.parquet(s"$sfDir/documents.parquet"))

    // A: r2 conditions — q31 then q32, caches left in place between them
    dropCaches()
    val a31 = time(runQ("q31_dedup_ngram_jaccard"))
    val a32warm = time(runQ("q32_dedup_minhash_lsh"))

    // B: r3 conditions — cold isolated q32, 3 samples
    val b32 = (1 to 3).map { _ => dropCaches(); time(runQ("q32_dedup_minhash_lsh")) }

    // C: cold stage breakdown. NOTE: this deliberately replicates the
    // ROUND-3 shape of minhashDedup (separate counts pass over the
    // shingle frame) — the shape the r3 bench measured and this
    // experiment attributes. The shipped operator has since fused the
    // counts into the signature aggregation, so these stage numbers are
    // the historical baseline, not the current plan's split.
    dropCaches()
    val docs = Lake(spark, sfDir).documents
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tShingles = time(noop(sh))
    val sig = Dedup.minhashSignatures(sh, 16)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tSig = time(noop(sig))
    val cands = Dedup.lshCandidates(Dedup.lshBands(sig, 4, 4))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tCands = time(noop(cands))
    val tVerify = time {
      val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      val common = cands
        .join(sh.as("sa"), col("sa.doc_id") === col("doc_a"))
        .join(sh.as("sb"),
          col("sb.doc_id") === col("doc_b") && col("sb.shingle") === col("sa.shingle"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_common"))
      noop(common
        .join(counts.withColumnsRenamed(Map("doc_id" -> "doc_a", "n_shingles" -> "n_a")), "doc_a")
        .join(counts.withColumnsRenamed(Map("doc_id" -> "doc_b", "n_shingles" -> "n_b")), "doc_b")
        .withColumn("jaccard",
          col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
        .filter(col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "jaccard"))
    }

    println(f"""{"experiment":"q32-attribution","sf":"$sfDir","A_q31_then_q32_no_drop":{"q31":$a31%.3f,"q32_warm":$a32warm%.3f},"B_q32_cold":[${b32.map(v => f"$v%.3f").mkString(",")}],"C_cold_stages":{"shingles":$tShingles%.3f,"signatures":$tSig%.3f,"band_candidates":$tCands%.3f,"jaccard_verify":$tVerify%.3f}}""")
    spark.stop()
  }
}
