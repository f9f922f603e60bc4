package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Lake}
import graft.ops.{Audit, Behavior, Bloom, Curation, Sampling, Stats}

/** Scaling probe for the round-6 scale-and-governance family (q148,
  * q150-q163): replicate each fixture `replicas`× with fresh keys (the way
  * a real corpus grows) and report runtime growth factors. Expected
  * near-linear (≲ replicas): every probed op is scan + one hash aggregate
  * (corr moments, chi2 cells, divergence, k-anonymity, decayed features),
  * a map-side expression pass (gopher rules, negative draws), or scan +
  * filter + semi-join (bloom). Super-linear growth = a lost broadcast or
  * an accidental pair blowup.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... graft.runner.GovernanceScaleProbe [replicas]`.
  * Measured results live in the scaladocs of the probed ops.
  */
object GovernanceScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = if (args.nonEmpty) args(0).toInt else 10
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-governance-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def nx(df: DataFrame, n: Int, keyCols: Seq[String], bump: Long): DataFrame = {
      val rep = spark.range(n.toLong).select(col("id").as("__replica"))
      keyCols.foldLeft(df.crossJoin(broadcast(rep))) { (d, k) =>
        d.withColumn(k, col(k) + col("__replica") * bump)
      }.drop("__replica")
    }

    val lk = Lake(spark, sfDir)
    val cache = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    val li1 = nx(lk.lineitem, 1, Seq("l_orderkey"), 100000000L).persist(cache)
    val liN = nx(lk.lineitem, replicas, Seq("l_orderkey"), 100000000L).persist(cache)
    val or1 = nx(lk.orders, 1, Seq("o_orderkey"), 100000000L).persist(cache)
    val orN = nx(lk.orders, replicas, Seq("o_orderkey"), 100000000L).persist(cache)
    val dc1 = nx(lk.documents, 1, Seq("doc_id"), 10000000L).persist(cache)
    val dcN = nx(lk.documents, replicas, Seq("doc_id"), 10000000L).persist(cache)
    val ev1 = nx(lk.events, 1, Seq("event_id", "user_id"), 10000000L).persist(cache)
    val evN = nx(lk.events, replicas, Seq("event_id", "user_id"), 10000000L).persist(cache)
    Seq(li1, liN, or1, orN, dc1, dcN, ev1, evN).foreach(_.count())

    def centCols(d: DataFrame) = d.select(
      col("l_quantity").cast("long").as("qty"),
      round(col("l_extendedprice") * 100.0d, 0).cast("long").as("price_c"),
      round(col("l_discount") * 100.0d, 0).cast("long").as("disc_c"))

    val probes: Seq[(String, (DataFrame, DataFrame) => DataFrame)] = Seq(
      "bloom_prune" -> ((li, or0) => Bloom.prunedSemiJoin(
        li, or0.filter(col("o_totalprice") > 450000.0d),
        "l_orderkey", "o_orderkey", 1 << 20, 5)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))),
      "corr_pairs" -> ((li, _) => Stats.corrPairs(centCols(li),
        Seq("qty" -> col("qty"), "price_c" -> col("price_c"),
          "disc_c" -> col("disc_c")))),
      "chi2_cells" -> ((_, or0) =>
        Stats.chi2Cells(or0, "o_orderstatus", "o_orderpriority")),
      "lang_divergence" -> ((dc, _) =>
        Stats.categoricalDivergence(dc, "source", "lang")),
      "kanonymity" -> ((_, or0) => Audit.kAnonymity(
        or0.select(col("o_orderstatus"), col("o_orderpriority"),
          (floor(col("o_totalprice") / 1000.0d) * 1000.0d).cast("long")
            .as("band")),
        Seq("o_orderstatus", "o_orderpriority", "band"), 5L)),
      "gopher_rules" -> ((dc, _) => Curation.gopherRules(dc, "text",
        Curation.GopherConfig(minWords = 30, stopwords = Seq("a", "the"),
          minStopHits = 2))),
      "negative_sampling" -> ((dc, _) =>
        Sampling.negativeSamples(dc, "doc_id", k = 4)),
      "decayed_engagement" -> ((ev, _) => Behavior.decayedEngagement(
        ev, "user_id", "ts", "value", "2024-02-01", 31)),
      "association_rules" -> ((li, _) => graft.ops.Baskets.associationRules(
        li, "l_orderkey", "l_partkey", minPairCount = 3L)),
      "frequent_triples" -> ((li, _) => graft.ops.Baskets.frequentTriples(
        li, "l_orderkey", "l_partkey", minCount = 2L)),
      "session_features" -> ((ev, _) => Behavior.sessions(
          ev, "user_id", "ts", "event_id", 1800000000L)
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n"), min(col("ts")).as("t0"))),
      "cdc_upsert" -> ((ev, _) => {
        import org.apache.spark.sql.expressions.{Window => W}
        val cutoff = lit("2024-01-16").cast("timestamp")
        def latest(df: DataFrame) =
          df.withColumn("__rn", org.apache.spark.sql.functions.row_number()
              .over(W.partitionBy("user_id").orderBy(col("ts").desc,
                col("event_id").desc)))
            .filter(col("__rn") === 1)
            .select(col("user_id"), col("event_type").as("state"),
              unix_micros(col("ts")).as("version"))
        val base = latest(ev.filter(col("ts") < cutoff))
        val chg = latest(ev.filter(col("ts") >= cutoff))
          .withColumn("op",
            when(pmod(col("user_id"), lit(10)) === 7, "D").otherwise("U"))
        graft.ops.Snapshot.applyChanges(base, chg, "user_id", "version", "op")
      }),
      "daily_anomaly" -> ((ev, _) => {
        import org.apache.spark.sql.expressions.{Window => W}
        val daily = ev.groupBy(col("event_type"),
            datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
              .cast("long").as("day"))
          .agg(count(lit(1)).as("x"))
        val w = W.partitionBy("event_type").orderBy("day").rangeBetween(-7, -1)
        daily.withColumn("bn", count(col("x")).over(w))
          .withColumn("bs", coalesce(sum(col("x")).over(w), lit(0L)))
      }),
      "shared_spans" -> ((dc, _) =>
        graft.ops.Dedup.sharedSpans(dc, "doc_id", "text", 3, 30L))
    )

    val results = probes.map { case (name, op) =>
      val (a1, aN, b1, bN) = name match {
        case "chi2_cells" | "kanonymity" => (or1, orN, or1, orN)
        case "lang_divergence" | "gopher_rules" | "negative_sampling" |
             "shared_spans" =>
          (dc1, dcN, dc1, dcN)
        case "decayed_engagement" | "session_features" | "cdc_upsert" |
             "daily_anomaly" => (ev1, evN, ev1, evN)
        case "association_rules" | "frequent_triples" => (li1, liN, li1, liN)
        case _ => (li1, liN, or1, orN)
      }
      noop(op(a1, b1)) // warm plan/codegen
      val t1 = timed(noop(op(a1, b1)))
      noop(op(aN, bN))
      val tN = timed(noop(op(aN, bN)))
      f""""$name":{"sec_1x":$t1%.3f,"sec_${replicas}x":$tN%.3f,"factor":${tN / t1}%.1f}"""
    }.mkString(",")

    println(f"""{"probe":"governance-scale","sf":"$sfDir","replicas":$replicas,$results}""")
    spark.stop()
  }
}
