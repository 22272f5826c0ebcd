package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (epsilon) join — pair rows whose event times lie within a
  * distance bound, with NO equi key to hash on. Naively that's a cartesian
  * product; the scalable composition is bucketing: quantize time into
  * epsilon-width buckets, explode the probe side to its bucket and both
  * neighbors, hash-join on bucket, then apply the exact range predicate.
  * A right row lives in exactly ONE bucket and any in-range pair differs
  * by at most one bucket index, so each true pair meets exactly once —
  * the rewrite is exact, no dedup needed, and the cartesian is cut to
  * pairs-per-bucket.
  *
  * At 100 TB: bucket width = epsilon keeps the per-bucket population
  * proportional to data density x epsilon — the join cost tracks the
  * OUTPUT size, not |L| x |R|. Skewed hot buckets fall back to
  * SkewJoin-style salting.
  */
object RangeJoin {

  /** For each left row, count right rows with |leftTs - rightTs| <= eps.
    * Timestamps are compared as epoch micros. Returns left + `n_matches`.
    * Left rows identical in every column are merged by the final groupBy —
    * give the left side a unique id column if that matters.
    */
  def epsilonCount(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      epsMicros: Long
  ): DataFrame = {
    require(epsMicros > 0)
    val l = left
      .withColumn("__lus", unix_micros(col(leftTs)))
      .withColumn(
        "__lb",
        explode(
          array(
            expr(s"unix_micros($leftTs) div $epsMicros") - 1,
            expr(s"unix_micros($leftTs) div $epsMicros"),
            expr(s"unix_micros($leftTs) div $epsMicros") + 1
          )
        )
      )
    val r = right
      .withColumn("__rus", unix_micros(col(rightTs)))
      .select(expr(s"unix_micros($rightTs) div $epsMicros").as("__rb"), col("__rus"))

    val leftKeys = left.columns.toIndexedSeq.map(col)
    l.join(
        r,
        col("__lb") === col("__rb") &&
          abs(col("__lus") - col("__rus")) <= epsMicros,
        "left"
      )
      .groupBy(leftKeys: _*)
      .agg(count(col("__rus")).as("n_matches"))
  }
}
