package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Lake}
import graft.ops.Dedup

/** Measured ×N growth shapes for the three dedup heavyweights that had no
  * probe factors on record (round-7 review item #3):
  *
  *   - q169 shared spans: positional-shingle self-join within the df
  *     window [2, 30], lag/sum run-merge — expect ~linear (the df cap
  *     bounds per-shingle fan-out regardless of corpus size);
  *   - q171 ensemble dedup: exact-hash + Jaccard + span pair chains
  *     unioned into one CC + canonical pick — expect ~linear for the
  *     same reason (every pair source is df/threshold-bounded);
  *   - q306 threshold profile: ONE ≥0.70 pair frame, three CC passes
  *     over shrinking edge frames — expect ~linear in rows with the
  *     pair frame computed once.
  *
  * Replication detail that makes the probe honest: replicating documents
  * VERBATIM would be adversarial for dedup probes — every doc would gain
  * N−1 exact/near duplicates across replicas, growing the pair volume
  * ~N² by construction and measuring the fixture, not the operator. Each
  * replica instead prefixes every word with `r<k>_`, which keeps the
  * shingle spaces of replicas fully disjoint: within-replica duplicate
  * structure (including the planted q169 phrase tails) is preserved
  * exactly, so the N× corpus has N× the rows AND N× the true pairs — the
  * shape a genuinely bigger corpus has.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... graft.runner.DedupScaleProbe [replicas]`.
  * Measured results live in BENCH_NOTES.md and the query scaladocs.
  */
object DedupScaleProbe {

  private val PhraseA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val PhraseB = "north south east west upper lower inner outer front back"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = if (args.nonEmpty) args(0).toInt else 10
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-dedup-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the q169/q171 fixture: every 25th doc gets a planted phrase tail so
    // multi-shingle duplicated spans genuinely occur
    def phrased: DataFrame = Lake(spark, sfDir).documents.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(25)) === 0,
        concat(col("text"), lit(" "),
          when(pmod(col("doc_id"), lit(2)) === 0, lit(PhraseA))
            .otherwise(lit(PhraseB))))
        .otherwise(col("text")).as("text"),
      col("n_chars"))

    def rep(n: Int): DataFrame =
      spark.range(n.toLong).select(col("id").as("replica"))

    // shingle-disjoint replication: prefix every word with r<k>_
    def docsNx(base: DataFrame, n: Int): DataFrame =
      base.crossJoin(broadcast(rep(n)))
        .select(
          (col("doc_id") + col("replica") * 700000L).as("doc_id"),
          concat(lit("r"), col("replica"), lit("_"),
            regexp_replace(col("text"), lit(" "),
              concat(lit(" r"), col("replica"), lit("_")))).as("text"),
          col("n_chars"))

    def spans(d: DataFrame): DataFrame =
      Dedup.sharedSpans(d, "doc_id", "text", n = 3, maxDf = 30L)

    def ensemble(d: DataFrame): DataFrame = {
      val jac = Dedup.jaccardPairs(
          Dedup.shingles(d, "doc_id", "text", 3), 0.8)
        .select("doc_a", "doc_b")
      val fp = d.select(col("doc_id"), md5(col("text")).as("__fp"))
      val exact = fp.as("a")
        .join(fp.as("b"),
          col("a.__fp") === col("b.__fp") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      val sp = spans(d).filter(col("longest_span_tokens") >= 6)
        .select("doc_a", "doc_b")
      val pairs = jac.unionByName(exact).unionByName(sp).distinct()
      val clusters = Dedup.dupClusters(d.select("doc_id"), pairs)
      Dedup.keepCanonical(clusters, d.select("doc_id", "n_chars"), "n_chars")
    }

    def thresholdProfile(d: DataFrame): DataFrame = {
      val docs = d.select("doc_id")
      val sh = Dedup.shingles(d, "doc_id", "text", 3)
      val allPairs = Dedup.jaccardPairs(sh, 0.70)
        .select("doc_a", "doc_b", "jaccard")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val arms = Seq(70, 80, 90).map { pct =>
        val pairsT = allPairs.filter(col("jaccard") >= pct / 100.0)
          .select("doc_a", "doc_b")
        val sz = Dedup.dupClusters(docs, pairsT)
          .select("doc_id", "cluster_id", "cluster_size")
          .groupBy("cluster_id")
          .agg(first(col("cluster_size")).as("csz"))
        sz.agg(
            coalesce(sum(when(col("csz") > 1, col("csz"))), lit(0L))
              .as("docs_in_dups"),
            sum(when(col("csz") > 1, 1L).otherwise(0L)).as("n_clusters"),
            max(col("csz")).as("max_cluster_size"))
          .crossJoin(broadcast(pairsT.agg(count(lit(1)).as("n_pairs"))))
          .select(lit(pct.toLong).as("threshold_pct"), col("n_pairs"),
            col("docs_in_dups"), col("n_clusters"), col("max_cluster_size"))
      }
      arms.reduce(_.unionByName(_))
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def clean(): Unit = spark.catalog.clearCache()

    def plain: DataFrame =
      Lake(spark, sfDir).documents.select("doc_id", "text", "n_chars")

    val probes: Seq[(String, () => Unit, () => Unit)] = Seq(
      ("shared_spans",
        () => noop(spans(docsNx(phrased, 1))),
        () => noop(spans(docsNx(phrased, replicas)))),
      ("sampled_recall",
        () => noop(Dedup.lshRecallSampled(docsNx(plain, 1),
          "doc_id", "text", frac = 0.5, salt = "probe")),
        () => noop(Dedup.lshRecallSampled(docsNx(plain, replicas),
          "doc_id", "text", frac = 0.5, salt = "probe"))),
      ("tuning_report",
        () => noop(Dedup.tuningReport(docsNx(plain, 1),
          "doc_id", "text", frac = 0.5, salt = "probe")),
        () => noop(Dedup.tuningReport(docsNx(plain, replicas),
          "doc_id", "text", frac = 0.5, salt = "probe"))),
      ("ensemble_dedup",
        () => noop(ensemble(docsNx(phrased, 1))),
        () => noop(ensemble(docsNx(phrased, replicas)))),
      ("threshold_profile",
        () => noop(thresholdProfile(docsNx(Lake(spark, sfDir).documents
          .select("doc_id", "text", "n_chars"), 1))),
        () => noop(thresholdProfile(docsNx(Lake(spark, sfDir).documents
          .select("doc_id", "text", "n_chars"), replicas))))
    )

    val results = probes.map { case (name, p1, pn) =>
      p1(); clean() // warm plan/codegen once
      val t1 = timed(p1()); clean()
      val tn = timed(pn()); clean()
      f""""$name":{"sec_1x":$t1%.3f,"sec_${replicas}x":$tn%.3f,"factor":${tn / t1}%.1f}"""
    }.mkString(",")

    println(f"""{"probe":"dedup-scale","sf":"$sfDir","replicas":$replicas,$results}""")
    spark.stop()
  }
}
