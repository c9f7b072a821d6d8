package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregators — the engine's `Aggregator[IN, BUF, OUT]`
  * surface (SURVEY.md §2.10: the reference's pluggable `stats`
  * classmethods, ezdata/simpletable.py:2877–2929, map to built-in agg
  * Columns where possible and to Aggregators for anything custom). */
object Aggregators {

  /** NaN-aware weighted mean: Σwx / Σw over rows where neither value
    * nor weight is NaN (infinities propagate, exactly numpy's nanmean
    * posture) — the reference's nan-handling applied to a weighted
    * statistic Spark lacks as a builtin. */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) = {
      val (x, w) = a
      if (x.isNaN || w.isNaN) b else (b._1 + x * w, b._2 + w)
    }
    def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: `weighted_mean(x, w)` usable in any groupBy.agg.
    * Nulls coalesce to NaN *before* the UDAF: the buffer encoder is a
    * primitive tuple, so a raw null row would fail deserialization
    * instead of being skipped like the NaN it stands for. */
  def weightedMean(x: Column, w: Column): Column =
    udaf(WeightedMean).apply(
      org.apache.spark.sql.functions.coalesce(x.cast("double"), org.apache.spark.sql.functions.lit(Double.NaN)),
      org.apache.spark.sql.functions.coalesce(w.cast("double"), org.apache.spark.sql.functions.lit(Double.NaN)))

  /** Streaming-friendly geometric mean (log-space sum). */
  object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      if (x.isNaN || x <= 0.0) b else (b._1 + math.log(x), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) = (a._1 + b._1, a._2 + b._2)
    def finish(r: (Double, Long)): Double = if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def geometricMean(x: Column): Column = udaf(GeometricMean).apply(
    org.apache.spark.sql.functions.coalesce(x.cast("double"), org.apache.spark.sql.functions.lit(Double.NaN)))

  /** The reference's `elementwise` decorator (ezdata/simpletable.py:
    * 1089–1101): lift a scalar function to a column function.  This is
    * the engine's sanctioned scalar-UDF escape hatch — prefer Column
    * compositions or a Catalyst Expression (codegen'd) in hot paths. */
  def elementwise[A: scala.reflect.runtime.universe.TypeTag,
                  B: scala.reflect.runtime.universe.TypeTag](
      f: A => B): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(f)
}
