package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark implementation plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. The pair is the correctness contract (BASELINE.md t2): the driver
  * hash-compares the two results after sorting columns by name.
  *
  * Conventions that make the hash comparison robust:
  *   - identical column names on both sides (every computed column aliased);
  *   - deterministic row order (explicit ORDER BY over enough columns);
  *   - no raw double *sums* — money aggregates go through DECIMAL casts
  *     (exact, order-independent) and are cast back to double at the end;
  *   - dates/timestamps leave the query as formatted strings (`yyyyMMdd`),
  *     which is also the reference's own convention (SURVEY.md §2.6 F4).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Registry {
  lazy val all: Seq[Q] =
    RelationalQueries.all ++ ViewQueries.all ++ PipelineQueries.all ++
      BehaviorQueries.all ++ OlapQueries.all ++ GraphQueries.all ++
      ScaleQueries.all ++ SimJoinQueries.all ++ RecoQueries.all ++
      SeriesQueries.all ++ ProfileQueries.all ++ MediaQueries.all ++
      TpchShapeQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
