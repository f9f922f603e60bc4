package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordering primitives — the scale-out replacement for
  * `Window.orderBy(...)` with no `partitionBy`, which funnels every row of
  * the input through ONE task (the single-partition sort that stops being a
  * plan and becomes an outage somewhere around a billion rows).
  *
  * The construction is the classic two-phase total order:
  *
  *   1. `repartitionByRange(sortCols)` range-partitions the data so that
  *      partition `i` holds keys strictly below partition `i+1` — a
  *      distributed sort's first phase, every task carrying ~1/N of rows;
  *   2. `sortWithinPartitions(sortCols)` finishes the order locally;
  *   3. per-partition row counts roll up into an O(#partitions) offsets
  *      frame (prefix sums over an `aggregate` fold of a collected-list —
  *      a one-row aggregate, NOT a window), broadcast back, and each row's
  *      global position is `offset(partition) + local ordinal`.
  *
  * The local ordinal comes from `monotonically_increasing_id()`, whose
  * layout is `partitionId << 33 | rowOrdinalWithinPartition`: evaluated
  * above the per-partition sort it IS the local rank, and the partition id
  * falls out of the same value with one shift — no second pass, no second
  * shuffle for [[globalRowNumber]].
  *
  * Correctness subtlety that shapes the implementation: Spark's range
  * exchange samples boundaries with a seed derived from the runtime RDD id,
  * so TWO SEPARATE ACTIONS over the same lineage may pick DIFFERENT
  * boundaries. The offsets therefore must come from the SAME exchange that
  * feeds the output — not from a separate counting job. Both the data path
  * and the counts path here sit above one identical `repartitionByRange`
  * subtree inside one plan, which `ReuseExchange` collapses to a single
  * physical shuffle (PlanSpec pins this), so boundaries are computed once
  * and the counts can never disagree with the data. This also keeps the
  * whole operator LAZY — no driver collect, no persist. AQE composes
  * safely for the same reason: both consumers read the ONE materialized
  * stage, and `CoalesceShufflePartitions` derives every `AQEShuffleRead`
  * of a stage from that stage's map-output statistics deterministically,
  * so the partition ids the counts see are the partition ids the data
  * sees (RanksSpec's value-equality tests run under default AQE).
  *
  * AQE skew-split boundary (pinned by RanksSpec's forced-skew stress
  * test): `OptimizeSkewedJoin` — the one AQE rule that can split a
  * reducer partition into PartialReducer sub-reads — rewrites only
  * shuffle reads feeding a sort-merge/shuffled-hash join DIRECTLY.
  * Neither consumer of the range exchange qualifies: the data path feeds
  * a broadcast join (the O(#partitions) offsets side is always
  * broadcast, by construction), the counts path feeds an aggregate, and
  * any downstream SMJ sits above its own exchange of already-numbered
  * rows. The stress test forces the machinery
  * (`spark.sql.adaptive.forceOptimizeSkewedJoin`, 1KB skew thresholds, a
  * 90%-one-key fixture, broadcast disabled downstream) and asserts the
  * bijection holds.
  *
  * Determinism contract (same as any `row_number`): `sortCols` should form
  * a total order (include a unique tiebreaker). Ties still produce a valid
  * permutation, but which tied row gets which number is not pinned.
  *
  * The tiebreaker is also the SKEW defense: range boundaries are tuples
  * over ALL sortCols, so a key carrying half the table is still split
  * across partitions by the tiebreaker — no straggler task, unlike a
  * partition on the key alone (RanksSpec pins this under a 100%-skewed
  * key).
  *
  * MEASURED (AnalyticsScaleProbe, sf0.1 ×10 rows, local[32]): the q280
  * Spearman double-rank grows 1.89 s → 16.7 s (8.8×) through the global
  * window but 1.64 s → 6.37 s (3.9×) through [[globalRowNumber]]; the
  * q286 vocab first-position frame grows 0.46 s → 2.93 s (6.4×) windowed
  * vs 0.67 s → 2.08 s (3.1×) through [[globalCumSum]] — the single-task
  * sort tail is the difference, and it widens with every further ×.
  */
object Ranks {

  /** Exclusive prefix sums over the per-partition totals in `counts`
    * (columns `__pid`, `__cnt`): one row per partition with the number of
    * rows in all partitions strictly before it. A one-row aggregate over
    * O(#partitions) values — the only "global" step, and it is bounded by
    * cluster geometry, not data size. */
  private def offsetsFrame(counts: DataFrame): DataFrame =
    counts
      .agg(array_sort(collect_list(struct(
        col("__pid").as("p"), col("__cnt").as("c")))).as("pc"))
      .select(explode(expr(
        """zip_with(pc,
          |  slice(aggregate(pc, array(cast(0 as bigint)),
          |    (acc, x) -> concat(acc, array(element_at(acc, -1) + x.c))),
          |    1, size(pc)),
          |  (x, o) -> struct(x.p as p, o as o))""".stripMargin)).as("po"))
      .select(col("po.p").as("__pid"), col("po.o").as("__off"))

  /** `row_number() over (order by sortCols)` as a distributed plan: range
    * partition + local sort + per-partition offsets. Appends `out`
    * (1-based, LongType) and preserves every input column. One full data
    * shuffle (the range exchange, reused by the counts path) plus one
    * broadcast of #partitions offset rows — against the single-partition
    * window's "ship everything to one task".
    *
    * Replaces the global windows the round-6 audit flagged in
    * q151/q152/q178/q206/q275/q280/q288; PlanSpec asserts none of their
    * plans contain a Window with an empty partition spec.
    *
    * Capacity bound: any single range partition must hold < 2^33 rows
    * (the ordinal width of `monotonically_increasing_id`); the counts
    * aggregate enforces this with a `raise_error` so overflow is an
    * exception, never a silent mis-rank. At the default ~128 MB-per-
    * partition sizing this is ~3 orders of magnitude of headroom. */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column], out: String): DataFrame = {
    require(sortCols.nonEmpty, "globalRowNumber needs at least one sort column")
    val ranged = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftrightunsigned(col("__mid"), 33))
    // Capacity guard: monotonically_increasing_id packs the within-
    // partition ordinal into the low 33 bits, so a single range partition
    // holding >= 2^33 (~8.6e9) rows would overflow the ordinal into the
    // partition-id bits and silently corrupt every rank. The counts frame
    // already carries per-partition totals — fail LOUDLY from inside the
    // same aggregate instead (cost: one comparison over #partitions rows).
    val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__cnt",
        when(col("__cnt") < lit(1L << 33), col("__cnt")).otherwise(raise_error(
          concat(lit("globalRowNumber: range partition "), col("__pid"),
            lit(" holds "), col("__cnt"),
            lit(" rows >= 2^33 — the monotonically_increasing_id ordinal " +
              "would overflow into the partition-id bits; raise the shuffle " +
              "partition count so no partition exceeds the bound")))))
    ranged
      .join(broadcast(offsetsFrame(counts)), Seq("__pid"))
      .withColumn(out,
        col("__off") + (col("__mid") - shiftleft(col("__pid"), 33)) + lit(1L))
      .drop("__pid", "__off", "__mid")
  }

  /** Running `sum(valueCol) over (order by sortCols rows unbounded
    * preceding)` as a distributed plan. Same skeleton as
    * [[globalRowNumber]] with per-partition SUM offsets; the within-
    * partition running sum is a window PARTITIONED by the range-partition
    * id (so it distributes — one extra hash exchange, never a single
    * task). Appends `out` (LongType, inclusive of the current row); the
    * exclusive form is `out - valueCol`. `valueCol` must be integral. */
  def globalCumSum(
      df: DataFrame, sortCols: Seq[Column], valueCol: Column, out: String): DataFrame =
    globalCumSums(df, sortCols, Seq(valueCol -> out))

  /** [[globalCumSum]] for several value columns over ONE shared order:
    * the data rides a single range exchange and a single per-partition
    * window node (k window functions over the same spec); only the
    * O(#partitions) offset frames — one tiny broadcast per column — are
    * per-column. q291's paired ECDFs ride this. */
  def globalCumSums(
      df: DataFrame, sortCols: Seq[Column], values: Seq[(Column, String)]): DataFrame = {
    require(sortCols.nonEmpty, "globalCumSums needs at least one sort column")
    require(values.nonEmpty, "globalCumSums needs at least one value column")
    val tmp = values.zipWithIndex.map { case ((c, out), i) => (s"__v$i", c, out) }
    val ranged = tmp.foldLeft(
        df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)) {
        case (acc, (v, c, _)) => acc.withColumn(v, c.cast("long"))
      }
      .withColumn("__pid", spark_partition_id().cast("long"))
    val sums = ranged.groupBy(col("__pid"))
      .agg(sum(col(tmp.head._1)).as(s"__cnt_${tmp.head._1}"),
        tmp.tail.map(t => sum(col(t._1)).as(s"__cnt_${t._1}")): _*)
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = tmp.foldLeft(ranged) { case (acc, (v, _, _)) =>
      acc.join(broadcast(
        offsetsFrame(sums.select(col("__pid"), col(s"__cnt_$v").as("__cnt")))
          .withColumnRenamed("__off", s"__off_$v")), Seq("__pid"))
    }
    tmp.foldLeft(joined) { case (acc, (v, _, out)) =>
        acc.withColumn(out, col(s"__off_$v") + sum(col(v)).over(w))
      }
      .drop("__pid" +: tmp.flatMap(t => Seq(t._1, s"__off_${t._1}")): _*)
  }

  /** `ntile(buckets) over (order by …)` reconstructed from a global row
    * number and the total count — the SQL-standard remainder convention
    * (the first `n mod k` buckets get one extra row), so it hash-matches
    * an engine's native NTILE while riding [[globalRowNumber]]'s
    * distributed order instead of a single-partition window. `rn` is
    * 1-based; returns the 1-based bucket as LongType. */
  def ntileFromRowNumber(rn: Column, n: Column, buckets: Int): Column = {
    require(buckets > 0, "ntile needs a positive bucket count")
    // exact integral division (Column./ is double division)
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    val k = lit(buckets.toLong)
    val q = idiv(n.cast("long"), k)
    val r = n.cast("long") % k
    val cut = r * (q + lit(1L))
    when(rn <= cut, idiv(rn - lit(1L), q + lit(1L)))
      .otherwise(r + idiv(rn - cut - lit(1L), q)) + lit(1L)
  }
}
