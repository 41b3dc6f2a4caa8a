package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Intermediate state for [[WeightedAvg]]: partial weighted sum + weight. */
case class WeightedAvgBuffer(weightedSum: Double, weightSum: Double)

/** Typed user-defined aggregate (`Aggregator[IN, BUF, OUT]`): weighted
  * average. Models the reference engine's user-supplied-aggregation
  * surface (the executor runs opaque user code over grouped records —
  * `executor/.../run/ProcessRawDataOperation.java:59-85`); on Spark the
  * same contract is an Aggregator with an explicit commutative merge, so
  * it map-side-combines and never collects a group to one place.
  */
object WeightedAvg extends Aggregator[(Double, Double), WeightedAvgBuffer, Double] {
  override def zero: WeightedAvgBuffer = WeightedAvgBuffer(0.0, 0.0)
  override def reduce(b: WeightedAvgBuffer, in: (Double, Double)): WeightedAvgBuffer =
    WeightedAvgBuffer(b.weightedSum + in._1 * in._2, b.weightSum + in._2)
  override def merge(x: WeightedAvgBuffer, y: WeightedAvgBuffer): WeightedAvgBuffer =
    WeightedAvgBuffer(x.weightedSum + y.weightedSum, x.weightSum + y.weightSum)
  override def finish(b: WeightedAvgBuffer): Double =
    if (b.weightSum == 0.0) Double.NaN else b.weightedSum / b.weightSum
  override def bufferEncoder: Encoder[WeightedAvgBuffer] = Encoders.product[WeightedAvgBuffer]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
