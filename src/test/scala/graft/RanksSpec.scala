package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Ranks

/** [[graft.ops.Ranks]] — the distributed replacement for single-partition
  * global windows. Each law is checked against the window it replaces, and
  * the plan tests pin the structural point: no Window node with an empty
  * partition spec, and exactly one physical shuffle of the data (the range
  * exchange, reused by the counts path).
  */
class RanksSpec extends SparkTestBase {
  import testImplicits._

  private def globalWindows(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w.simpleString(3)
    }

  test("globalRowNumber equals row_number over the same total order") {
    val df = spark.range(0, 5000).select(
      (col("id") * 2654435761L % 1000L).as("k"), col("id"))
    val expected = df.withColumn("rn",
      row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
    val actual = Ranks.globalRowNumber(df, Seq(col("k"), col("id")), "rn")
    assert(actual.except(expected).isEmpty && expected.except(actual).isEmpty,
      "distributed row numbers diverge from the window's")
    assert(globalWindows(actual).isEmpty,
      "globalRowNumber must not plan a partition-less Window")
  }

  test("globalRowNumber respects descending sort orders") {
    val df = spark.range(0, 500).select(col("id"))
    val actual = Ranks.globalRowNumber(df, Seq(col("id").desc), "rn")
      .orderBy(col("rn")).collect()
    assert(actual.head.getLong(0) === 499L && actual.head.getLong(1) === 1L)
    assert(actual.last.getLong(0) === 0L && actual.last.getLong(1) === 500L)
  }

  test("globalRowNumber plans ONE data shuffle (range exchange reused by counts)") {
    val df = spark.range(0, 1000).select(col("id"), (col("id") % 7).as("k"))
    val out = Ranks.globalRowNumber(df, Seq(col("k"), col("id")), "rn")
    out.collect() // materialize so AQE finalizes the physical plan
    // the adaptive plan string repeats every exchange in its "Initial Plan"
    // section — inspect only the executed final plan
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the DATA is shuffled exactly once: one materialized range exchange,
    // which the counts path consumes as a ReusedExchange. The remaining
    // exchanges in the plan (hash on __pid, SinglePartition, broadcast) all
    // carry O(#partitions) count rows, not data.
    // a ReusedExchange line repeats the reused exchange's description, so
    // count materialized range exchanges line-wise
    val ranges = plan.linesIterator.count(l =>
      l.contains("Exchange rangepartitioning") && !l.contains("ReusedExchange"))
    val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
    assert(ranges == 1,
      s"expected exactly one materialized range shuffle, got $ranges:\n$plan")
    assert(reused >= 1,
      s"counts path must reuse the range exchange, not re-shuffle:\n$plan")
  }

  test("globalCumSum equals a running sum over the same total order") {
    val df = spark.range(0, 3000).select(
      (col("id") * 48271L % 600L).as("k"), col("id"),
      (col("id") % 13L + 1L).as("v"))
    val w = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cs", sum(col("v")).over(w))
    val actual = Ranks.globalCumSum(df, Seq(col("k"), col("id")), col("v"), "cs")
    assert(actual.except(expected).isEmpty && expected.except(actual).isEmpty,
      "distributed running sums diverge from the window's")
    assert(globalWindows(actual).isEmpty,
      "globalCumSum must not plan a partition-less Window")
  }

  test("ntileFromRowNumber matches NTILE for even, remainder and n<k cases") {
    for ((n, k) <- Seq((100, 10), (103, 10), (7, 10), (1, 3), (25, 4))) {
      val df = spark.range(1, n + 1).select(col("id"))
      val expected = df
        .withColumn("b", ntile(k).over(Window.orderBy("id")).cast("long"))
      val actual = df.withColumn("b",
        Ranks.ntileFromRowNumber(col("id"), lit(n.toLong), k))
      assert(actual.except(expected).isEmpty && expected.except(actual).isEmpty,
        s"ntile mismatch at n=$n k=$k")
    }
  }

  test("globalRowNumber on an empty frame is empty (no division/offset edge)") {
    val df = spark.range(0).select(col("id"))
    assert(Ranks.globalRowNumber(df, Seq(col("id")), "rn").count() === 0L)
    assert(Ranks.globalCumSum(df, Seq(col("id")), col("id"), "cs").count() === 0L)
  }

  test("globalCumSums: several running sums share one order and one window pass") {
    val df = spark.range(0, 2000).select(
      (col("id") * 69621L % 400L).as("k"), col("id"),
      (col("id") % 7L).as("a"), (col("id") % 11L).as("b"))
    val w = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("ca", sum(col("a")).over(w))
      .withColumn("cb", sum(col("b")).over(w))
    val actual = Ranks.globalCumSums(df, Seq(col("k"), col("id")),
      Seq(col("a") -> "ca", col("b") -> "cb"))
    assert(actual.except(expected).isEmpty && expected.except(actual).isEmpty)
    assert(globalWindows(actual).isEmpty)
    // one Window NODE carrying both running sums, not one per column
    val windows = actual.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size === 1,
      s"both cumsums must share one window node, got ${windows.size}")
  }

  test("skew: a dominant sort key still spreads across partitions via the tiebreaker") {
    // the property Ranks' scale story rests on: range boundaries are
    // TUPLES over all sortCols, so a key holding 100% of the rows is
    // still split by the unique tiebreaker — no single straggler task.
    // (A plain hash/range partition on the key alone would put every row
    // in one partition.)
    val df = spark.range(0, 5000).select(lit(0L).as("k"), col("id"))
    val spread = df.repartitionByRange(4, col("k"), col("id"))
      .select(spark_partition_id().as("p")).distinct().count()
    assert(spread > 1, s"constant key must spread via tiebreak, got $spread partition(s)")
    val out = Ranks.globalRowNumber(df, Seq(col("k"), col("id")), "rn")
      .orderBy("id").select("rn").collect().map(_.getLong(0)).toSeq
    assert(out === (1L to 5000L), "row numbers under total skew stay correct")
  }

  test("AQE skew-split stress: forced skew optimization cannot desync offsets from data") {
    // The open question from the round-7 review: could AQE's skew
    // machinery (OptimizeSkewedJoin splitting a reducer partition into
    // PartialReducer sub-reads) split the reused range exchange AFTER the
    // counts were taken, desyncing partition ids from counts? Answer, now
    // pinned: no. OptimizeSkewedJoin rewrites only shuffle reads feeding
    // a sort-merge/shuffled-hash JOIN directly; both consumers of Ranks'
    // range exchange are a per-partition projection (the data path into a
    // BROADCAST join) and an aggregate (the counts path), neither a skew-
    // split candidate — and a downstream SMJ sits above its OWN exchange
    // of the already-numbered rows. This test forces the machinery as
    // hard as the configs allow (forceOptimizeSkewedJoin + 1KB skew
    // thresholds + a 90%-one-key fixture wide enough to trip them + an
    // SMJ consumer with broadcast disabled) and asserts the ranks stay a
    // perfect order-consistent bijection.
    val keys = Seq(
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val n = 20000L
      val df = spark.range(0, n).select(
        when(col("id") % 10 =!= 0, lit(7L))
          .otherwise(col("id") % 97).as("k"),
        col("id"),
        lpad(col("id").cast("string"), 64, "0").as("pad"))
      val ranked = Ranks.globalRowNumber(df, Seq(col("k"), col("id")), "rn")
      val got = ranked.select("k", "id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.map(_._3).sorted.toSeq === (1L to n).toSeq,
        "forced skew configs must not break the 1..n bijection")
      assert(got.sortBy(t => (t._1, t._2)).map(_._3).toSeq === (1L to n).toSeq,
        "forced skew configs must not break order consistency")
      // downstream sort-merge join over the skewed key (the one place the
      // skew-split CAN fire — above its own exchange of numbered rows)
      val dim = spark.range(0, 100).select(col("id").as("k"),
        (col("id") * 3L).as("w"))
      val joined = ranked.join(dim, Seq("k")).agg(
        count(lit(1)).as("cnt"), sum(col("rn")).as("s"))
      val row = joined.head()
      assert(row.getAs[Long]("cnt") === n,
        "every row must survive the skewed SMJ")
      assert(row.getAs[Long]("s") === n * (n + 1) / 2,
        "rank sum must be exactly n(n+1)/2 after the skewed SMJ")
      // cumsum variant rides spark_partition_id() instead of the mid
      // layout — same desync concern, same pin
      val cs = Ranks.globalCumSum(
        spark.range(0, 5000).select(lit(1L).as("k"), col("id"),
          (col("id") % 5L).as("v")),
        Seq(col("k"), col("id")), col("v"), "cs")
        .orderBy("id").select("cs").collect().map(_.getLong(0))
      val expect = (0L until 5000L).scanLeft(0L)((a, i) => a + i % 5).tail
      assert(cs.toSeq === expect.toSeq,
        "globalCumSum under forced skew configs diverged")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("law: globalRowNumber is the unique order-consistent bijection 1..n") {
    // randomized shapes: skewed keys, duplicates in the non-key column,
    // row counts that don't divide the partition count
    for (seed <- Seq(1L, 7L, 42L)) {
      val n = 997 + seed * 131
      val df = spark.range(0, n).select(
        ((col("id") * 48271L + seed) % 97L).as("k"),
        col("id"))
      val got = Ranks.globalRowNumber(df, Seq(col("k"), col("id")), "rn")
        .select("k", "id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.map(_._3).sorted.toSeq === (1L to n).toSeq,
        s"seed=$seed: row numbers must be a bijection onto 1..$n")
      val bySort = got.sortBy(t => (t._1, t._2)).map(_._3).toSeq
      assert(bySort === (1L to n).toSeq,
        s"seed=$seed: row numbers must follow the (k, id) order")
    }
  }
}
