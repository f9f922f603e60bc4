package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Lake}
import graft.ops.{Curation, Dedup, Index, LanguageModel, Packing, Snapshot}

/** Scaling probe for the text/retrieval operator families — the same
  * measured-not-asserted evidence the dedup and ANN families document
  * (10×-corpus probes in the Dedup/Similarity scaladocs): run each
  * operator on the sf corpus and on a `replicas`× version of it, and
  * report the runtime growth factor. Linear-ish growth (factor ≈
  * replicas, here ≲ ~10–15 for 10× allowing fixed stage overhead) is
  * the pass condition; super-linear growth means a pair join or global
  * sort is hiding somewhere.
  *
  * Corpus: each replica r of document d gets id d + r·10⁶ and a
  * replica-unique token appended, so replicas are near- but not exact
  * duplicates — postings/vocabulary/span tables grow realistically
  * (shared spans stay shared, vocab grows by one token per replica).
  *
  * Run: `SPARK_GRAFT_SF_DIR=... graft.runner.TextScaleProbe [replicas]`.
  * Measured results are recorded in the scaladocs of the probed ops.
  */
object TextScaleProbe {

  def corpusNx(spark: SparkSession, dir: String, replicas: Int): DataFrame = {
    val base = Lake(spark, dir).documents.select("doc_id", "text")
    val rep = spark.range(replicas.toLong).select(col("id").as("replica"))
    base.crossJoin(broadcast(rep))
      .select(
        (col("doc_id") + col("replica") * 1000000L).as("doc_id"),
        concat(col("text"), lit(" rep"), col("replica")).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = if (args.nonEmpty) args(0).toInt else 10
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-text-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val one = corpusNx(spark, sfDir, 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ten = corpusNx(spark, sfDir, replicas)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (n1, n10) = (one.count(), ten.count())

    val queries = Seq(
      ("q1", "spark"), ("q1", "join"), ("q2", "hash"), ("q2", "merge"),
      ("q3", "stream"), ("q3", "window")).toDF("query_id", "term")

    val probes: Seq[(String, DataFrame => DataFrame)] = Seq(
      "inverted_index" -> (d => Index.invertedIndex(d, "doc_id", "text", k = 3)),
      "bm25_topk" -> (d => Index.bm25TopK(d, "doc_id", "text", queries, k = 10)),
      "span_dedup" -> (d => Dedup.spanDedup(d, "doc_id", "text", span = 3)),
      "bigram_lm" -> (d => LanguageModel.bigramScore(d, "doc_id", "text")),
      "shard_export" -> (d => Packing.shardExport(d, "doc_id", nShards = 64)),
      "snapshot_diff" -> (d => Snapshot.diff(
        d.filter(col("doc_id") % 7 =!= 0), d, "doc_id", Seq("text"))),
      "curation_pipeline" -> (d => Curation.curate(
        d.withColumn("lang", lit("en")), "doc_id", "text", "lang",
        Curation.Config(langs = Seq("en"), sampleRate = 0.5)))
    )

    val results = probes.map { case (name, op) =>
      noop(op(one)) // warm plan/codegen paths once
      val t1 = timed(noop(op(one)))
      noop(op(ten))
      val t10 = timed(noop(op(ten)))
      f""""$name":{"sec_1x":$t1%.3f,"sec_${replicas}x":$t10%.3f,"factor":${t10 / t1}%.1f}"""
    }.mkString(",")

    println(
      f"""{"probe":"text-scale","sf":"$sfDir","rows_1x":$n1,"rows_${replicas}x":$n10,$results}""")

    // ---- document-LENGTH scaling (VERDICT r5 #8) -----------------------
    // The count probes above replicate docs; none grow a DOC. Per-row
    // higher-order-function chains are where a hidden quadratic bites
    // book-length documents (the r5 wordConcentration cliff), so this
    // section scales each doc's TEXT `lengthX`× on a fixed small doc set
    // and reports the growth factor — ≈ lengthX (allowing log-factor sort
    // cost and fixed overhead) is the pass condition.
    import graft.ops.TextAnalysis
    val lengthX = 30
    def longCorpus(mult: Int): DataFrame =
      Lake(spark, sfDir).documents.filter(col("doc_id") < 2000)
        .select(col("doc_id"),
          concat_ws(" ", array_repeat(col("text"), mult)).as("text"))
    val short = longCorpus(1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val long = longCorpus(lengthX)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    short.count(); long.count()
    val lenProbes: Seq[(String, DataFrame => DataFrame)] = Seq(
      "len_token_counts" -> (d => d.select(col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("ws"),
        TextAnalysis.bpeishTokenCount(col("text")).as("bpe"))),
      "len_concentration" -> (d => d.select(col("doc_id"),
        TextAnalysis.wordConcentration(col("text")).as("simpson"))),
      "len_repetition" -> (d =>
        TextAnalysis.repetitionMetrics(d, "doc_id", "text")),
      "len_bm25" -> (d => Index.bm25TopK(d, "doc_id", "text", queries, k = 10)),
      "len_sentences" -> (d => d.select(col("doc_id"),
        graft.ops.TextAnalysis.sentenceWordCounts(col("text")).as("w"))),
      "len_vowel_groups" -> (d => d.select(col("doc_id"),
        graft.ops.TextAnalysis.vowelGroups(col("text")).as("v"))),
      "len_gopher" -> (d => graft.ops.Curation.gopherRules(d, "text",
        graft.ops.Curation.GopherConfig(minWords = 30,
          stopwords = Seq("a", "the"), minStopHits = 2)))
    )
    val lenResults = lenProbes.map { case (name, op) =>
      noop(op(short))
      val t1 = timed(noop(op(short)))
      noop(op(long))
      val tL = timed(noop(op(long)))
      f""""$name":{"sec_1x":$t1%.3f,"sec_${lengthX}x":$tL%.3f,"factor":${tL / t1}%.1f}"""
    }.mkString(",")
    println(
      f"""{"probe":"text-length-scale","sf":"$sfDir","docs":2000,"length_mult":$lengthX,$lenResults}""")
    spark.stop()
  }
}
