package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed Aggregator: exact weighted mean of a scale-2 value.
  *
  * The buffer carries integer cents × weight and the weight sum, so
  * partial aggregation and merge are exact and associative — the
  * Aggregator contract (merge in any tree shape) holds bit-for-bit.
  * Demonstrates the `Aggregator[IN, BUF, OUT]` + `udaf()` API tier
  * (below built-in functions, above RDD code).
  */
object WeightedMean extends Aggregator[(Double, Long), (Long, Long), Double] {

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), in: (Double, Long)): (Long, Long) =
    (b._1 + Rounding.halfAwayCents(in._1) * in._2, b._2 + in._2)

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Long, Long)): Double =
    if (b._2 == 0) Double.NaN else b._1.toDouble / 100.0 / b._2.toDouble

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: weighted mean of `value` (2-decimal) by `weight`. */
  def apply(value: Column, weight: Column): Column =
    udaf(this).apply(value, weight)
}

/** Scalar rounding helpers shared by graft's exact-integer folds. */
object Rounding {
  /** Round `x` to integer cents, half away from zero — the rounding
    * SQL `round()` uses in both Spark and DuckDB. `math.round` rounds
    * half toward +∞ and diverges for negative .xx5 values (-1.005 →
    * -100 instead of -101), so Scala-side folds that must agree with a
    * SQL oracle go through here.
    */
  def halfAwayCents(x: Double): Long = {
    val scaled = x * 100
    if (scaled < 0) -math.round(-scaled) else math.round(scaled)
  }
}
