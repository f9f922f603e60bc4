package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers (SURVEY.md §2.3).
  *
  * Every join in the reference is an equi `pd.merge` with suffix-based
  * collision handling (reference parquet/Common/pandasWrapper.py:20-28).
  * Spark resolves ambiguity by *name*, so [[merge]] reproduces pandas'
  * suffix semantics deterministically: only columns colliding on BOTH sides
  * (and not join keys) get suffixed (SURVEY.md §7.4.5 J7).
  *
  * Scale notes: join strategy is left to Catalyst/AQE (broadcast under
  * threshold, sort-merge otherwise, skew split at runtime). Call sites that
  * KNOW the right side is tiny (descriptor tables, literal lookups) pass it
  * through [[lookup]] which forces a broadcast — at 100 TB a missed broadcast
  * on a 46-row table is a full shuffle of the fact side.
  */
object Joins {

  /** pandas `pd.merge(left, right, on=keys, how=..., suffixes=(l, r))`. */
  def merge(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      how: String = "inner",
      suffixLeft: String = "_x",
      suffixRight: String = "_y"
  ): (DataFrame, DataFrame) = {
    val collisions = (left.columns.toSet intersect right.columns.toSet) -- on.toSet
    val l = collisions.foldLeft(left)((d, c) => d.withColumnRenamed(c, c + suffixLeft))
    val r = collisions.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + suffixRight))
    (l, r)
  }

  def mergeJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      how: String = "inner",
      suffixLeft: String = "_x",
      suffixRight: String = "_y"
  ): DataFrame = {
    val (l, r) = merge(left, right, on, how, suffixLeft, suffixRight)
    l.join(r, on, how)
  }

  /** Small-side translation join (J8): broadcast + left join + coalesce.
    * e.g. letter grade → numeric (reference
    * ews/student_section_grade_fact/main.py:49-57,142-152). */
  def lookup(
      data: DataFrame,
      lookupTable: DataFrame,
      on: Seq[String],
      how: String = "left"
  ): DataFrame =
    data.join(broadcast(lookupTable), on, how)

  /** Cross join via constant key (J4) — the reference fakes it with
    * `fakeKey=-1` + outer merge (reference base/demographics_dim/main.py:
    * 68-106); Spark has the real operator. */
  def cross(left: DataFrame, right: DataFrame): DataFrame =
    left.crossJoin(broadcast(right))

  /** Skew-proof equi-join by key salting — the manual fallback when AQE's
    * runtime skew split can't apply (e.g. the skewed side feeds an
    * aggregation in the same stage, or the join is inside a cached plan).
    *
    * The skewed side gets a per-row salt in [0, saltFactor); the other
    * side is replicated across ALL salt values (explode of a literal
    * range — saltFactor× its size, so keep that side the smaller one).
    * A hot key's rows now spread over `saltFactor` shuffle partitions
    * instead of one. Semantics are exactly `skewed.join(other, keys,
    * joinType)` for inner/left joins; right/full would lose unmatched
    * right rows to the replication and are rejected. */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin replicates the right side; '$joinType' would duplicate unmatched rows")
    val salted = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val expanded = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(expanded, keys :+ "__salt", joinType).drop("__salt")
  }
}
