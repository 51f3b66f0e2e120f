package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF surface (SURVEY.md §2.2 "UDF/UDAF/UDTF"): the
  * `Aggregator[IN, BUF, OUT]` shape with an explicit merge is the
  * Spark-native custom aggregate — partial aggregation on the map side,
  * associative buffer merge across partitions (same contract a
  * TypedImperativeAggregate gives sketches).
  */
object Aggregators {

  /** Weighted mean: sum(w·x)/sum(w). Buffer is (weightedSum, weightSum)
    * so partials merge associatively. */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
