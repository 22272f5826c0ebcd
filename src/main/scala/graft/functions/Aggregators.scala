package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.B "UDF surface": the reference only
  * exposes scalar `create_udf`; Spark's `Aggregator` is the parity surface
  * for custom aggregation).
  *
  * `WeightedAvg` aggregates in EXACT decimal arithmetic (inputs scaled to
  * micro-units) so the distributed merge order cannot change the result —
  * the same trick the query pack uses for money sums. Only the final
  * division happens in floating point, once, on the driver-side reduce.
  */
object Aggregators {

  /** (value, weight) -> sum(v*w)/sum(w), exact until the final divide.
    *
    * The sums are integer-valued micro-unit quantities carried in a
    * DECIMAL buffer decimally shifted to original units (scale 6), which
    * Spark encodes as Decimal(38,18): 20 integer digits of headroom, i.e.
    * the accumulator holds value*weight sums to 1e20 — ~100x past a
    * 100 TB lineitem group — where the previous Long buffer silently
    * wrapped after ~1.8M typical rows per group.
    */
  final case class WAvgBuf(var sumVW: BigDecimal, var sumW: BigDecimal)

  private val Micro = BigDecimal(1000000L)

  val weightedAvg: Aggregator[(Double, Double), WAvgBuf, Double] =
    new Aggregator[(Double, Double), WAvgBuf, Double] {
      private def micro(d: Double): BigDecimal =
        BigDecimal(math.round(d * 1000000L))

      override def zero: WAvgBuf = WAvgBuf(BigDecimal(0), BigDecimal(0))

      override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf = {
        val (v, w) = in
        // exact: micro-scaled integers; FLOOR division keeps the per-row
        // product in micro units mirrored digit-for-digit by the oracle's
        // `// 1000000` — DuckDB's `//` floors, so a truncating quot would
        // drift one micro-unit per NEGATIVE v*w row (round-3 ADVICE); the
        // movePointLeft stores it losslessly in original units so the
        // Decimal(38,18) buffer never overflows
        b.sumVW += (micro(v) * micro(w)).bigDecimal
          .divide(Micro.bigDecimal, 0, java.math.RoundingMode.FLOOR)
          .movePointLeft(6)
        b.sumW += micro(w).bigDecimal.movePointLeft(6)
        b
      }

      override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf = {
        a.sumVW += b.sumVW
        a.sumW += b.sumW
        a
      }

      override def finish(r: WAvgBuf): Double =
        if (r.sumW.signum == 0) 0.0
        else {
          // shift back to the exact micro-unit integers before the single
          // double conversion — identical rounding to the Long-buffer path
          val vw = BigDecimal(r.sumVW.bigDecimal.movePointRight(6))
          val w = BigDecimal(r.sumW.bigDecimal.movePointRight(6))
          vw.toDouble / w.toDouble
        }

      override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
