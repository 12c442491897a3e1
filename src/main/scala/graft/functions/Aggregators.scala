package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` — the engine's public UDAF extension surface
  * (SURVEY.md §2.2 "UDF/UDAF/UDTF surface"). Spark plans an Aggregator as
  * a regular two-phase aggregate (partial buffers map-side, merge after
  * the exchange), so a user-defined aggregate scales exactly like a
  * built-in one: O(groups) state, no row collection.
  *
  * Geometric mean via mean-of-logs. NOTE: in production prefer the
  * built-in composition `exp(avg(ln(x)))` (fully codegen'd — and exactly
  * what the DuckDB oracle runs); this Aggregator computes the same
  * statistic through the typed-UDAF path so that extension point is
  * exercised and oracle-checked, not just claimed.
  */
object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    (b._1 + math.log(x), b._2 + 1L)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0L) Double.NaN else math.exp(r._1 / r._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object AggregatorFunctions {
  private lazy val geomeanUdaf =
    org.apache.spark.sql.functions.udaf(GeometricMean)

  /** Geometric mean of a double column, usable in `groupBy().agg(...)`. */
  def geomean(c: Column): Column = geomeanUdaf(c)
}
