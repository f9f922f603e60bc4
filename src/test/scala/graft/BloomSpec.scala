package graft

import org.apache.spark.sql.functions._

import graft.ops.Bloom

/** [[graft.ops.Bloom]] laws: zero false negatives (the correctness-critical
  * side — a false negative silently drops a join match), fp rate near the
  * fill-based expectation, bitmap mergeability, and prune+verify ≡ plain
  * semi-join on real tables. */
class BloomSpec extends SparkTestBase {
  import testImplicits._

  private val Bits = 1 << 12
  private val Hashes = 5

  private def bitsOf(keys: Seq[Long]): Bloom.BloomBits = {
    val df = keys.toDF("k")
    Bloom.collect(Bloom.build(df, "k", Bits, Hashes), Bits, Hashes)
  }

  test("no false negatives, ever: every inserted key tests positive") {
    val keys = (0L until 500L).map(_ * 7919L)
    val bloom = bitsOf(keys)
    val misses = keys.toDF("k")
      .filter(!Bloom.mightContain(bloom, col("k"))).count()
    assert(misses == 0L)
  }

  test("false-positive rate tracks the fill-based expectation") {
    val bloom = bitsOf((0L until 300L).map(_ * 7919L))
    // probe keys disjoint from the inserted set
    val probes = (1L to 20000L).map(_ * 7919L + 3L)
    val fp = probes.toDF("k")
      .filter(Bloom.mightContain(bloom, col("k"))).count()
    val rate = fp.toDouble / probes.size
    val expected = bloom.expectedFpRate
    assert(rate <= expected * 3 + 0.005,
      s"fp rate $rate vs expected $expected")
    assert(expected < 0.05, s"fixture under-filled? expected=$expected")
  }

  test("merge law: build(A) ⊎ build(B) == build(A ∪ B)") {
    val a = (0L until 200L).map(_ * 13L)
    val b = (0L until 200L).map(_ * 17L)
    val merged = Bloom.collect(
      Bloom.merge(
        Bloom.build(a.toDF("k"), "k", Bits, Hashes)
          .unionByName(Bloom.build(b.toDF("k"), "k", Bits, Hashes))),
      Bits, Hashes)
    val direct = bitsOf((a ++ b).distinct)
    assert(merged.words.toSeq == direct.words.toSeq)
  }

  test("prunedSemiJoin ≡ plain left_semi on lineitem×orders") {
    val lk = graft.core.Lake(spark, sfDir)
    val dim = lk.orders.filter(col("o_totalprice") > 400000.0)
    val pruned = Bloom.prunedSemiJoin(
        lk.lineitem, dim, "l_orderkey", "o_orderkey", 1 << 12, 5)
      .select("l_orderkey", "l_linenumber")
    val plain = lk.lineitem
      .join(dim.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"),
        "left_semi")
      .select("l_orderkey", "l_linenumber")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    assert(pruned.count() > 0)
  }

  test("probe expression stays codegen-friendly: no UDF in the plan") {
    val bloom = bitsOf(Seq(1L, 2L, 3L))
    val plan = Seq(1L, 9L).toDF("k")
      .filter(Bloom.mightContain(bloom, col("k")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"))
  }
}
