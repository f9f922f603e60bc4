package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Lake
import graft.ops.DescriptorMap
import graft.queries.Registry

/** Physical-plan regression tests: the properties that matter at 100 TB —
  * scan-level pushdown, broadcast dimension joins, no accidental cartesian
  * products — asserted on the actual executed plans so a refactor that
  * silently loses one fails CI, not the cluster. */
class PlanSpec extends SparkTestBase {
  import testImplicits._

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("parquet scan: filter pushdown and column pruning reach the reader") {
    val df = Lake(spark, sfDir).lineitem
      .filter(col("l_shipdate") > "1995-01-01")
      .select("l_orderkey", "l_shipdate")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThan(l_shipdate"), s"no pushed filter in:\n$plan")
    // pruned read schema: only the two projected columns reach the scan
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_shipdate"),
      s"scan not pruned to 2 columns in:\n$plan")
  }

  test("descriptor-constant lookup joins are broadcast, never shuffled") {
    val data = Seq(
      ("uri://ed-fi.org/AddressTypeDescriptor#Home", 1),
      ("uri://ed-fi.org/AddressTypeDescriptor#Work", 2)
    ).toDF("addressTypeDescriptor", "x")
    val plan = planOf(DescriptorMap.withConstant(data, "addressTypeDescriptor"))
    assert(plan.contains("BroadcastHashJoin"), s"descriptor join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"descriptor join shuffled:\n$plan")
  }

  test("no registered query plans a cartesian product (cross-join ops excepted)") {
    // q07 is the deliberate J4 cross-join operator; q27 cross-joins a
    // 775-row calendar spine (broadcast nested loop, intentional).
    val allowed = Set("q07_year_type_matrix", "q27_view_early_warning")
    val offenders = Registry.all
      .filterNot(q => allowed.contains(q.name))
      .flatMap { q =>
        val plan = planOf(q.run(spark, sfDir))
        if (plan.contains("CartesianProduct")) Some(q.name) else None
      }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
