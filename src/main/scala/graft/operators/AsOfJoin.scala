package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` within the same key (the time-series join Spark
  * has no native operator for; DuckDB/Pandas call it ASOF JOIN).
  *
  * Implementation is a COMPOSITION of built-ins (the preferred tier for
  * custom operators): tag and union both inputs, then one window pass per
  * key ordered by (ts, side) carrying the last non-null right payload
  * forward. Cost at scale: ONE shuffle of (left+right) on the key and a
  * per-partition sort — the same cost profile as a sort-merge join, with
  * no range-explosion and no skew beyond what the key itself has; a
  * backward-looking ROWS window needs no second pass.
  *
  * Tie rule: a right row at exactly left.ts IS visible (inclusive <=),
  * matching DuckDB's ASOF JOIN. Among multiple right rows at the same
  * (key, ts) the winner is unspecified — pre-dedup the right side if that
  * matters (same contract as DuckDB).
  *
  * Null-key rule: NULL never equals NULL in a join key, so null-keyed
  * right rows are dropped before the union (they can match nothing) and
  * null-keyed left rows come back unmatched — the window partitioner
  * would otherwise co-group all NULL keys and invent matches DuckDB's
  * ASOF equality would never produce.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its latest row at-or-before is wanted)
    * @param key       equi key column name present on both sides
    * @param leftTs    event-time column on left
    * @param rightTs   event-time column on right
    * @param rightVals right payload columns to carry, input name -> output
    *                  name (output names must not collide with left's)
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightVals: Map[String, String]
  ): DataFrame = {
    // __side orders right rows BEFORE left rows at the same ts, giving the
    // inclusive (<=) visibility rule. The payload travels as ONE struct:
    // a matched right row is then never-null even when its payload FIELDS
    // are null, so "matched row with null value" and "no match" stay
    // distinct — exactly DuckDB ASOF's semantics.
    val taggedLeft = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val taggedRight = right
      .filter(col(key).isNotNull) // NULL key matches nothing (see scaladoc)
      .select(
        col(key),
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        struct(rightVals.map { case (in, out) => col(in).as(out) }.toSeq: _*)
          .as("__payload")
      )
    // union null-fills each side's missing columns
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols =
      left.columns.map(col).toSeq ++
        rightVals.values.map(o => col("__carried").getField(o).as(o))
    unioned
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(outCols: _*)
  }
}
