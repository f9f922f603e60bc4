package graft

import graft.queries.Registry

/** Smoke-level integration: every registered query must execute end-to-end
  * on the sf0.001 tables with a stable non-empty schema. (Value-level
  * correctness is the DuckDB oracle gate — scripts/check_oracles.py locally,
  * CORRECTNESS_r{N}.json from the driver.) */
class QueriesSpec extends SparkTestBase {

  test("registry has unique names and oracles for every query") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(Registry.all.forall(_.oracle.nonEmpty),
      "every query should carry a DuckDB oracle")
  }

  for (q <- Registry.all) {
    test(s"${q.name} executes on sf0.001") {
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      // near-dup/pair queries may legitimately be empty at the smallest SF
      val mayBeEmpty = Set("q31_dedup_ngram_jaccard", "q32_dedup_minhash_lsh",
        "q34_dedup_embedding_cosine")
      assert(n > 0 || mayBeEmpty.contains(q.name), s"${q.name} returned 0 rows")
    }
  }

  test("SparkEntry.entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("SparkEntry maps are consistent with the registry") {
    assert(SparkEntry.queries.keySet == Registry.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
