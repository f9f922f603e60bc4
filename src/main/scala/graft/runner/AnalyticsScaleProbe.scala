package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{GraftSession, Lake}
import graft.ops.{Audit, WebGraph}

/** Scaling probe for the round-8 analytics family — measured-not-asserted
  * growth factors at `replicas`× data for the operators whose scale story
  * is structural:
  *   - t-closeness (q253): two aggregates + a broadcast value
  *     distribution — expect ~linear in rows;
  *   - 2-D Mahalanobis (q266): one scan for moments + one scored scan +
  *     TakeOrdered — expect ~linear;
  *   - daily ACF (q248): the data-sized work is the day rollup; the lag
  *     window rides a CALENDAR-bounded frame — expect ~linear scan cost,
  *     constant window cost;
  *   - Theil–Sen (q260): the day² pair frame does not grow with rows at
  *     all (same date domain), so growth should be ONLY the rollup scan —
  *     expect sublinear overall;
  *   - SCC (q252 fixture): the host graph is replica-invariant (offsets
  *     are multiples of 35, preserving doc_id mod 5/7), so growth is the
  *     edge-dedup scan; the fixpoint rounds are constant.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... graft.runner.AnalyticsScaleProbe [replicas]`.
  * Measured results live in BENCH_NOTES.md and the op scaladocs.
  */
object AnalyticsScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = if (args.nonEmpty) args(0).toInt else 10
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-analytics-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rep(n: Int): DataFrame =
      spark.range(n.toLong).select(col("id").as("replica"))

    def custNx(n: Int): DataFrame =
      Lake(spark, sfDir).customer.crossJoin(broadcast(rep(n)))
        .select(
          (col("c_custkey") + col("replica") * 10000000L).as("c_custkey"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))

    def lineNx(n: Int): DataFrame =
      Lake(spark, sfDir).lineitem
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .crossJoin(broadcast(rep(n)))
        .select(
          (col("l_orderkey") + col("replica") * 1000000000L).as("l_orderkey"),
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))

    def ordersNx(n: Int): DataFrame =
      Lake(spark, sfDir).orders.select("o_orderkey", "o_orderdate", "o_totalprice")
        .crossJoin(broadcast(rep(n)))
        .select(
          (col("o_orderkey") + col("replica") * 1000000000L).as("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))

    def docsNx(n: Int): DataFrame =
      Lake(spark, sfDir).documents.select("doc_id")
        .crossJoin(broadcast(rep(n)))
        // offset is a multiple of 35: doc_id mod 5 / mod 7 — and so the
        // derived host graph — are replica-invariant
        .select((col("doc_id") + col("replica") * 700000L).as("doc_id"))

    def tcloseness(d: DataFrame): DataFrame =
      Audit.tCloseness(
        d.select(col("c_nationkey"),
          (floor(col("c_acctbal") / lit(2000.0d)) * 2000.0d).cast("long")
            .as("bal_band"),
          col("c_mktsegment")),
        Seq("c_nationkey", "bal_band"), "c_mktsegment", 1L, 5L)

    def mahalanobis(d: DataFrame): DataFrame = {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
      def dd(c: org.apache.spark.sql.Column) = c.cast("double")
      val v = d.select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("x"),
        round(col("l_extendedprice") * 100.0d, 0).cast("long").as("y"))
      val m = v.agg(count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"))
      v.crossJoin(broadcast(m)).select(col("l_orderkey"), col("l_linenumber"),
          (dd(dec(col("n")) * col("sxx") - col("sx") * col("sx")) *
            dd(dec(col("n")) * dec(col("y")) - col("sy")) ).as("d2proxy"))
        .orderBy(col("d2proxy").desc).limit(20)
    }

    def acf(d: DataFrame): DataFrame = {
      val daily = d.groupBy(to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val tot = daily.agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      val w = Window.orderBy("day")
      daily.crossJoin(broadcast(tot))
        .withColumn("a", (col("n") * col("cents") - col("s")).cast("decimal(19,0)"))
        .withColumn("a1", lead(col("a"), 1).over(w))
        .select(sum(col("a") * col("a1")).cast("decimal(38,0)").as("num"),
          sum(col("a") * col("a")).cast("decimal(38,0)").as("den"))
    }

    def theilSen(d: DataFrame): DataFrame = {
      val daily = d.groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .select(datediff(col("day"), lit("1995-01-01")).cast("long").as("x"),
          col("cents"))
      val a = daily.toDF("xi", "yi")
      val b = daily.toDF("xj", "yj")
      val pairs = a.join(b, col("xi") < col("xj"))
        .select(((col("yj") - col("yi")).cast("double") /
          (col("xj") - col("xi")).cast("double")).as("slope"))
      val m = pairs.agg(count(lit(1)).as("n_pairs"))
      pairs.withColumn("rn", row_number().over(Window.orderBy("slope")))
        .crossJoin(broadcast(m))
        .filter(col("rn") === expr("(n_pairs + 1) div 2"))
    }

    def sccEdges(d: DataFrame): DataFrame = {
      val c = pmod(col("doc_id"), lit(5))
      val h = pmod(col("doc_id"), lit(7))
      def host(cc: org.apache.spark.sql.Column, hh: org.apache.spark.sql.Column) =
        concat(lit("c"), cc, lit("h"), hh)
      d.select(host(c, h).as("src_host"),
          host(c, pmod(col("doc_id") * 3 + 1, lit(7))).as("dst_host"))
        .union(d.filter(c < 4).select(host(c, h).as("src_host"),
          host(c + 1, h).as("dst_host")))
    }

    def docsTextNx(n: Int): DataFrame =
      Lake(spark, sfDir).documents.select("doc_id", "text")
        .crossJoin(broadcast(rep(n)))
        .select((col("doc_id") + col("replica") * 700000L).as("doc_id"),
          col("text"))

    // q280's two global ranks: the round-6 single-partition window vs the
    // round-7 Ranks rewrite — same statistic, the probe shows the
    // one-task sort tail disappear at replicas×
    def spearmanVals(d: DataFrame): DataFrame = d.select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("long").as("x"),
      round(col("l_extendedprice") * 100.0d, 0).cast("long").as("y"))
    def spearmanAgg(r: DataFrame): DataFrame =
      r.agg(count(lit(1)).as("n"),
        sum(((col("rx") - col("ry")) * (col("rx") - col("ry")))
          .cast("decimal(38,0)")).as("d2"))
    def spearmanWindow(d: DataFrame): DataFrame = {
      val v = spearmanVals(d)
      spearmanAgg(v
        .withColumn("rx", row_number().over(
          Window.orderBy(col("x"), col("l_orderkey"), col("l_linenumber")))
          .cast("long"))
        .withColumn("ry", row_number().over(
          Window.orderBy(col("y"), col("l_orderkey"), col("l_linenumber")))
          .cast("long")))
    }
    def spearmanRanks(d: DataFrame): DataFrame = {
      val v = spearmanVals(d)
      spearmanAgg(graft.ops.Ranks.globalRowNumber(
        graft.ops.Ranks.globalRowNumber(
          v, Seq(col("x"), col("l_orderkey"), col("l_linenumber")), "rx"),
        Seq(col("y"), col("l_orderkey"), col("l_linenumber")), "ry"))
    }

    // q286's first-global-position frame: token-level global row_number
    // (round 6) vs per-doc cumulative offsets (round 7)
    def vocabTok(d: DataFrame): DataFrame = d
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "p", "w")
    def vocabWindow(d: DataFrame): DataFrame =
      vocabTok(d)
        .withColumn("gp",
          row_number().over(Window.orderBy("doc_id", "p")).cast("long"))
        .groupBy("w").agg(min(col("gp")).as("first_pos"))
    def vocabRanks(d: DataFrame): DataFrame = {
      val tok = vocabTok(d)
      val perDoc = tok.groupBy("doc_id").agg(count(lit(1)).as("__nt"))
      val before = graft.ops.Ranks
        .globalCumSum(perDoc, Seq(col("doc_id")), col("__nt"), "__cum")
        .select(col("doc_id"), (col("__cum") - col("__nt")).as("__before"))
      tok.groupBy("w").agg(min(struct(col("doc_id"), col("p"))).as("f"))
        .select(col("w"), col("f.doc_id").as("doc_id"), col("f.p").as("p"))
        .join(before, Seq("doc_id"))
        .select(col("w"),
          (col("__before") + col("p").cast("long") + lit(1L)).as("first_pos"))
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val events1 = OlapScaleProbe.eventsNx(spark, sfDir, 1)
    val eventsN = OlapScaleProbe.eventsNx(spark, sfDir, replicas)

    val probes: Seq[(String, () => Unit, () => Unit)] = Seq(
      ("tcloseness",
        () => noop(tcloseness(custNx(1))),
        () => noop(tcloseness(custNx(replicas)))),
      ("mahalanobis",
        () => noop(mahalanobis(lineNx(1))),
        () => noop(mahalanobis(lineNx(replicas)))),
      ("acf_daily",
        () => noop(acf(events1)),
        () => noop(acf(eventsN))),
      ("theil_sen",
        () => noop(theilSen(ordersNx(1))),
        () => noop(theilSen(ordersNx(replicas)))),
      ("scc",
        () => noop(WebGraph.stronglyConnectedComponents(sccEdges(docsNx(1)))),
        () => noop(WebGraph.stronglyConnectedComponents(sccEdges(docsNx(replicas))))),
      ("spearman_window",
        () => noop(spearmanWindow(lineNx(1))),
        () => noop(spearmanWindow(lineNx(replicas)))),
      ("spearman_ranks",
        () => noop(spearmanRanks(lineNx(1))),
        () => noop(spearmanRanks(lineNx(replicas)))),
      ("vocab_window",
        () => noop(vocabWindow(docsTextNx(1))),
        () => noop(vocabWindow(docsTextNx(replicas)))),
      ("vocab_ranks",
        () => noop(vocabRanks(docsTextNx(1))),
        () => noop(vocabRanks(docsTextNx(replicas))))
    )

    val results = probes.map { case (name, p1, pn) =>
      p1() // warm plan/codegen once
      val t1 = timed(p1())
      pn()
      val tn = timed(pn())
      f""""$name":{"sec_1x":$t1%.3f,"sec_${replicas}x":$tn%.3f,"factor":${tn / t1}%.1f}"""
    }.mkString(",")

    println(f"""{"probe":"analytics-scale","sf":"$sfDir",$results}""")
    spark.stop()
  }
}
