package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Deterministic hash sampling: reproducibility is the contract under
  * test — same inputs, same sample, regardless of partitioning. */
class SamplingSpec extends SparkTestBase {
  import testImplicits._

  private def keys = (1L to 2000L).toDF("k")

  test("thresholdHex: hex formatting with keep-all / keep-none edges") {
    assert(Sampling.thresholdHex(1.0) == "g00") // above every hex string
    assert(Sampling.thresholdHex(0.0) == "000") // below/equal to none
    assert(Sampling.thresholdHex(0.5) == "800")
    assert(Sampling.thresholdHex(0.25) == "400")
  }

  test("hashSample: deterministic, partition-invariant, near the rate") {
    val a = Sampling.hashSample(keys, "k", 0.5).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(keys.repartition(7), "k", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(a == b) // df.sample() fails exactly this property
    assert(math.abs(a.size - 1000) < 100) // binomial, ~3 sigma
    assert(Sampling.hashSample(keys, "k", 1.0).count() == 2000)
    assert(Sampling.hashSample(keys, "k", 0.0).count() == 0)
  }

  test("hashSample: null keys are one equivalence class, kept at rate 1.0") {
    val df = Seq(Some(1L), Some(2L), None, None).toDF("k")
    assert(Sampling.hashSample(df, "k", 1.0).count() == 4) // keep-all keeps nulls
    assert(Sampling.hashSample(df, "k", 0.0).count() == 0)
    // all null rows share one fate at any rate
    val kept = Sampling.hashSample(df, "k", 0.5).filter(col("k").isNull).count()
    assert(kept == 0 || kept == 2)
  }

  test("hashSample: salt draws an independent sample from the same keys") {
    val train = Sampling.hashSample(keys, "k", 0.5, salt = "train")
      .collect().map(_.getLong(0)).toSet
    val other = Sampling.hashSample(keys, "k", 0.5, salt = "val")
      .collect().map(_.getLong(0)).toSet
    assert(train != other)
    // independence: overlap ~ rate² of the population, not 0 and not 100%
    val overlap = (train & other).size.toDouble / 2000
    assert(overlap > 0.15 && overlap < 0.35)
  }

  test("packSequences: bucketed token-budget chunk assignment") {
    import graft.ops.Packing
    // one bucket (buckets=1) to make the stream arithmetic hand-checkable:
    // docs of 300/300/300 tokens, budget 512 → offsets 0/300/600 →
    // sequences 0-0 / 0-0 / 0-1 (doc 2 STARTS inside seq 0: concat-split)
    val docs = Seq((1L, 300), (2L, 300), (3L, 300)).toDF("doc_id", "n_tokens")
    val out = Packing.packSequences(docs, "doc_id", "n_tokens", budget = 512, buckets = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("tok_offset"), r.getAs[String]("seq_id"))).toMap
    assert(out(1L) == (0L, "0-0"))
    assert(out(2L) == (300L, "0-0"))
    assert(out(3L) == (600L, "0-1"))
    // bucketing: two buckets pack independently (parallel streams)
    val bucketed = Packing.packSequences(docs, "doc_id", "n_tokens", budget = 512, buckets = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("tok_offset")).toMap
    assert(bucketed(1L) == 0L && bucketed(2L) == 0L) // different buckets, both start at 0
    assert(bucketed(3L) == 300L) // follows doc 1 in bucket 1
  }

  test("chunkDocuments: sliding windows with overlap, short docs yield one chunk") {
    import graft.ops.Packing
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 words
      (2L, "a b c")                                   // shorter than a chunk
    ).toDF("doc_id", "text")
    // chunk 4, overlap 1 → stride 3: starts 0,3,6 (NOT 9 — a chunk
    // starting at 9 would be just "w10", a strict subset of the chunk
    // before it: redundant content in the stream)
    val out = Packing.chunkDocuments(docs, "doc_id", "text", chunkTokens = 4, overlap = 1)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx")) ->
        (r.getAs[Long]("n_tokens"), r.getAs[String]("chunk_text"))).toMap
    assert(out((1L, 0L)) == (4L, "w1 w2 w3 w4"))
    assert(out((1L, 1L)) == (4L, "w4 w5 w6 w7"))  // overlap: w4 shared
    assert(out((1L, 2L)) == (4L, "w7 w8 w9 w10")) // last NEW word covered
    assert(out((2L, 0L)) == (3L, "a b c"))        // total: one short chunk
    assert(out.size == 4)
    // a doc exactly one chunk long yields one chunk, not a redundant tail
    val exact = Seq((3L, (1 to 4).map(i => s"x$i").mkString(" "))).toDF("doc_id", "text")
    assert(Packing.chunkDocuments(exact, "doc_id", "text", 4, 1).count() == 1)
    intercept[IllegalArgumentException](
      Packing.chunkDocuments(docs, "doc_id", "text", chunkTokens = 4, overlap = 4))
  }

  test("hashSample: rates nest — raising the rate only ADDS rows") {
    // threshold compare over the same hash ⇒ sample(0.2) ⊆ sample(0.5):
    // growing a training split never churns previously selected rows
    val s20 = Sampling.hashSample(keys, "k", 0.2).collect().map(_.getLong(0)).toSet
    val s50 = Sampling.hashSample(keys, "k", 0.5).collect().map(_.getLong(0)).toSet
    assert(s20.subsetOf(s50))
  }

  test("mixWeights: largest corpus honoring the target mix, binding stratum at rate 1") {
    // 100 a, 300 b, 600 c; targets 2:1:1 → a is binding (needs 2 shares
    // from the smallest pool): scale = 100/0.5 = 200 → keep all 100 a,
    // 50 b, 50 c
    val df = ((1 to 100).map(i => (i.toLong, "a")) ++
      (1 to 300).map(i => (i.toLong, "b")) ++
      (1 to 600).map(i => (i.toLong, "c"))).toDF("k", "s")
    val out = Sampling.mixWeights(df, "s", Map("a" -> 2.0), defaultWeight = 1.0)
      .collect().map(r => r.getAs[String]("s") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("target_share"),
          r.getAs[Double]("keep_rate"), r.getAs[Double]("n_keep"))).toMap
    assert(out("a") == ((100L, 0.5, 1.0, 100.0))) // binding stratum: keep all
    assert(out("b")._2 == 0.25 && out("b")._4 == 50.0)
    assert(out("c")._3 == 50.0 / 600.0 && out("c")._4 == 50.0)
    // the planned rates feed stratifiedSample: post-sample counts track n_keep
    val rates = out.map { case (s, (_, _, rate, _)) => s -> rate }
    val sampled = Sampling.stratifiedSample(df, "k", "s", rates, defaultRate = 0.0)
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled("a") == 100)
    assert(math.abs(sampled("b") - 50) < 25 && math.abs(sampled("c") - 50) < 25)
  }

  test("exactSample / exactStratifiedSample: exact sizes, invariant to partitioning") {
    val df = (1L to 500L).map(i => (i, s"src${i % 4}")).toDF("k", "s")
    val once = Sampling.exactSample(df, "k", 20, "ev").collect().map(_.getLong(0)).toSet
    assert(once.size == 20)
    // the chosen SET is a pure function of (keys, salt) — repartitioning
    // must not churn it (df.sample() fails exactly this)
    val repart = Sampling.exactSample(df.repartition(13), "k", 20, "ev")
      .collect().map(_.getLong(0)).toSet
    assert(repart == once)
    // per-stratum: exactly n from each big stratum, all rows of small ones
    val withSmall = df.union(Seq((1000L, "tiny")).toDF("k", "s"))
    val strat = Sampling.exactStratifiedSample(withSmall, "k", "s", 7, "ev")
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(strat == Map("src0" -> 7L, "src1" -> 7L, "src2" -> 7L, "src3" -> 7L, "tiny" -> 1L))
  }

  test("budgetCappedSelect: take-while prefix per stratum, audit column, determinism") {
    // src0: tokens 50,40,30,20,10 ranked by quality desc → cum 50,90,120,140,150
    // budget 120 keeps the first three and nothing after the overflow;
    // src1: one 200-token doc never fits → stratum contributes nothing
    val df = Seq(
      (1L, "src0", 5.0, 50L), (2L, "src0", 4.0, 40L), (3L, "src0", 3.0, 30L),
      (4L, "src0", 2.0, 20L), (5L, "src0", 1.0, 10L),
      (6L, "src1", 9.0, 200L)
    ).toDF("id", "s", "quality", "nt")
    val out = Sampling.budgetCappedSelect(
      df, "s", "nt", budget = 120L,
      rankBy = Seq(col("quality").desc, col("id")))
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got == Map(1L -> 50L, 2L -> 90L, 3L -> 120L))
    // partition-invariant: same prefix regardless of physical layout
    val repart = Sampling.budgetCappedSelect(
      df.repartition(7), "s", "nt", 120L,
      Seq(col("quality").desc, col("id")))
      .collect().map(_.getLong(0)).toSet
    assert(repart == Set(1L, 2L, 3L))
  }

  test("stratifiedSample: per-stratum rates with a default") {
    val df = (1L to 3000L).map(i => (i, s"src${i % 3}")).toDF("k", "s")
    val kept = Sampling.stratifiedSample(
      df, "k", "s", Map("src0" -> 1.0, "src1" -> 0.0), defaultRate = 0.5)
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("src0") == 1000)         // keep-all stratum intact
    assert(!kept.contains("src1"))       // keep-none stratum gone
    assert(math.abs(kept("src2") - 500) < 80)
  }

  test("shardExport: every doc lands in exactly one shard, positions dense from 0") {
    val df = (1L to 200L).map(i => Tuple1(i)).toDF("doc_id")
    val out = graft.ops.Packing.shardExport(df, "doc_id", nShards = 4)
      .select("doc_id", "shard", "shard_pos").collect()
    assert(out.length == 200)
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 4))
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (0L until rows.length).toSeq)
    }
  }

  test("shardExport: salt changes the permutation; same salt reproduces it") {
    val df = (1L to 100L).map(i => Tuple1(i)).toDF("doc_id")
    def order(salt: String) =
      graft.ops.Packing.shardExport(df, "doc_id", nShards = 2, salt = salt)
        .orderBy("shard", "shard_pos").collect().map(_.getLong(0)).toSeq
    assert(order("ep1") == order("ep1"))
    assert(order("ep1") != order("ep2"))
    // partitioning-invariant: the permutation is a pure function of ids
    val repart = graft.ops.Packing.shardExport(
      df.repartition(9), "doc_id", nShards = 2, salt = "ep1")
      .orderBy("shard", "shard_pos").collect().map(_.getLong(0)).toSeq
    assert(repart == order("ep1"))
  }

  test("percentileGate: bottom decile per stratum gated, strata independent") {
    // Stratum A scores 1..100; stratum B scores 1001..1010. An absolute
    // threshold would keep all of B or kill all of A; the per-stratum
    // gate trims each stratum's own bottom 10%.
    val rows = (1L to 100L).map(i => (i, "A", i.toDouble)) ++
      (1L to 10L).map(i => (100L + i, "B", 1000.0 + i))
    val out = Sampling.percentileGate(
      rows.toDF("doc_id", "lang", "score"), "doc_id", "lang", "score", 0.1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    // A: percent_rank = (i-1)/99 >= 0.1 → i >= 10.9 → keep i >= 11
    assert((1L to 10L).forall(!out(_)))
    assert((11L to 100L).forall(out(_)))
    // B: (i-1)/9 >= 0.1 → keep i >= 2 (its own distribution, not A's)
    assert(!out(101L) && (102L to 110L).forall(out(_)))
  }

  test("weightedSample: boundary weights are exact; higher weight only adds rows") {
    val df = (1L to 2000L).map(i => (i, (i % 5) / 4.0)).toDF("k", "w")
    val kept = Sampling.weightedSample(df, "k", "w").collect()
      .map(_.getLong(0)).toSet
    // weight 0 rows can never survive (u >= 0 always), weight 1 always do
    assert((5L to 2000L by 5).forall(!kept.contains(_)))  // w = 0
    assert((4L to 2000L by 5).forall(kept.contains(_)))   // w = 1
    // intermediate rates land near their expectation
    val w25 = (1L to 2000L by 5).count(kept.contains(_))  // w = 0.25, n=400
    assert(math.abs(w25 - 100) < 50, s"w=0.25 kept $w25 of 400")
    // row-wise monotonicity: raising every weight only ADDS rows
    val keptMore = Sampling.weightedSample(
      df.withColumn("w", col("w") + 0.2), "k", "w").collect()
      .map(_.getLong(0)).toSet
    assert(kept.subsetOf(keptMore))
    // reproducible under repartitioning
    val repart = Sampling.weightedSample(df.repartition(7), "k", "w")
      .collect().map(_.getLong(0)).toSet
    assert(repart == kept)
  }

  test("percentileGate: single-row stratum ranks 0.0 and passes a 0 gate") {
    val df = Seq((1L, "solo", 5.0)).toDF("doc_id", "lang", "score")
    val r0 = Sampling.percentileGate(df, "doc_id", "lang", "score", 0.0)
      .collect().head
    assert(r0.getDouble(3) == 0.0 && r0.getBoolean(4))
    val r1 = Sampling.percentileGate(df, "doc_id", "lang", "score", 0.1)
      .collect().head
    assert(!r1.getBoolean(4))
  }

  test("groupSplit: whole groups move together, shares track rates, leakage audit fires") {
    import org.apache.spark.sql.functions.{col, concat, explode, lit, sequence, when}
    // 2000 groups × 3 rows each
    val df = spark.range(0, 2000)
      .select(col("id").as("g"), explode(sequence(lit(1), lit(3))).as("r"))
    val split = Sampling.groupSplit(df, "g", 0.8, 0.1, salt = "s1")
    // by construction: no group straddles splits
    assert(Sampling.splitLeakage(split, "g", "split")
      .collect().head.getLong(0) == 0L)
    // shares approximate 80/10/10 over 2000 groups (hash-binomial, loose)
    val byGroup = split.select("g", "split").distinct()
    val shares = byGroup.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(shares("train") - 1600L) < 120,
      s"train share off: ${shares("train")}")
    assert(math.abs(shares.getOrElse("val", 0L) - 200L) < 80)
    assert(math.abs(shares.getOrElse("test", 0L) - 200L) < 80)
    // determinism: same salt, different partitioning → identical labels
    val again = Sampling.groupSplit(df.repartition(7), "g", 0.8, 0.1, "s1")
      .select("g", "split").distinct()
    assert(again.exceptAll(byGroup).count() == 0)
    // an externally-damaged split column IS caught
    val leaky = split.withColumn("split",
      when(col("r") === 3 && col("g") < 10, lit("test"))
        .otherwise(col("split")))
    assert(Sampling.splitLeakage(leaky, "g", "split")
      .collect().head.getLong(0) > 0L)
  }

  test("negativeSamples: k draws per anchor minus self-hits, in [0,n), reproducible") {
    val ids = (0L until 50L).toDF("id")
    val out = Sampling.negativeSamples(ids, "id", k = 4, salt = "t")
    val rows = out.collect()
    assert(rows.length <= 200 && rows.length >= 200 - 10,
      s"${rows.length} rows: self-draw rate should be ~k/n")
    rows.foreach { r =>
      val (id, neg) = (r.getLong(0), r.getLong(2))
      assert(neg >= 0L && neg < 50L && neg != id)
    }
    // determinism: an identical second call yields the identical edge list
    val again = Sampling.negativeSamples(ids, "id", k = 4, salt = "t").collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
    // a different salt draws a different set
    val other = Sampling.negativeSamples(ids, "id", k = 4, salt = "u").collect()
    assert(other.map(_.toString).sorted.toSeq != rows.map(_.toString).sorted.toSeq)
  }
}
