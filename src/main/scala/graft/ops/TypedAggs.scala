package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s — the Dataset API's custom-aggregate surface
  * (`groupByKey(...).agg(agg.toColumn)`), covered here so the engine
  * demonstrates ALL three aggregation tiers: built-in functions (the
  * default everywhere), tabular/mergeable state frames ([[Stats]],
  * [[Sketches]]), and typed Aggregators for when the reduction is most
  * natural over case classes. The same exactness rules apply: buffers
  * hold INTEGER sums (cents × weight), the single division happens in
  * `finish` — so the result is engine-deterministic and hash-gateable
  * (q203) like every untyped aggregate in the library.
  *
  * Scale note: a typed Aggregator participates in partial aggregation
  * (`reduce` map-side, `merge` across partitions) exactly like a
  * codegen'd builtin, but its lambda evaluation is NOT codegen'd —
  * prefer builtins in hot paths; use this tier for reductions whose
  * state is genuinely structural. */
object TypedAggs {

  final case class WeightedSum(num: Long, den: Long)

  /** Exact weighted mean over (valueCents, weight) pairs: Σ(v·w)/Σw,
    * one double division at the end, /100 back to currency units.
    * Empty/zero-weight groups yield 0.0 (mirrored in the oracle). */
  class WeightedMeanCents extends Aggregator[(Long, Long), WeightedSum, Double] {
    override def zero: WeightedSum = WeightedSum(0L, 0L)
    override def reduce(b: WeightedSum, a: (Long, Long)): WeightedSum =
      WeightedSum(b.num + a._1 * a._2, b.den + a._2)
    override def merge(x: WeightedSum, y: WeightedSum): WeightedSum =
      WeightedSum(x.num + y.num, x.den + y.den)
    override def finish(r: WeightedSum): Double =
      if (r.den == 0L) 0.0d
      else r.num.toDouble / r.den.toDouble / 100.0d
    override def bufferEncoder: Encoder[WeightedSum] = Encoders.product
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
