package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.B "UDF surface": the reference only
  * exposes scalar `create_udf`; Spark's `Aggregator` is the parity surface
  * for custom aggregation).
  *
  * `WeightedAvg` aggregates in EXACT integer arithmetic (inputs scaled to
  * micro-units) so the distributed merge order cannot change the result —
  * the same trick the query pack uses for money sums. Only the final
  * division happens in floating point, once, on the driver-side reduce.
  */
object Aggregators {

  /** (value, weight) -> sum(v*w)/sum(w), exact until the final divide. */
  final case class WAvgBuf(var sumVW: Long, var sumW: Long)

  val weightedAvg: Aggregator[(Double, Double), WAvgBuf, Double] =
    new Aggregator[(Double, Double), WAvgBuf, Double] {
      private def scale(d: Double): Long = math.round(d * 1000000L)

      override def zero: WAvgBuf = WAvgBuf(0L, 0L)

      override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf = {
        val (v, w) = in
        // exact: micro-scaled longs; (v*w) scaled once to stay in range
        b.sumVW += math.round(v * 1000000L) * scale(w) / 1000000L
        b.sumW += scale(w)
        b
      }

      override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf = {
        a.sumVW += b.sumVW
        a.sumW += b.sumW
        a
      }

      override def finish(r: WAvgBuf): Double =
        if (r.sumW == 0L) 0.0 else r.sumVW.toDouble / r.sumW.toDouble

      override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
