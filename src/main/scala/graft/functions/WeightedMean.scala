package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Example user-defined aggregate on the typed Aggregator surface (ref:
  * AggregateFunction<T, ACC> contract — createAccumulator/accumulate/
  * merge/getValue, SURVEY §2.10). Weighted arithmetic mean with a
  * (Σw·x, Σw) accumulator; merge is associative so Spark runs it as a
  * partial + final aggregation (map-side combine at scale).
  */
class WeightedMean[I](weight: I => Double, value: I => Double)
    extends Aggregator[I, (Double, Double), Double] with Serializable {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(acc: (Double, Double), in: I): (Double, Double) = {
    val w = weight(in)
    (acc._1 + w * value(in), acc._2 + w)
  }
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(acc: (Double, Double)): Double = acc._1 / acc._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
