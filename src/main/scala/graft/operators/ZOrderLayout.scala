package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout: interleave the bits of two dimension columns
  * so that sorting by the combined key clusters rows that are close in
  * BOTH dimensions. At 100 TB this is the data-layout move that makes
  * min/max file skipping work for multi-dimensional predicates: a sort on
  * (a) alone leaves (b) spanning its full range in every file, so
  * `WHERE b = ...` prunes nothing; a Z-order sort bounds BOTH ranges per
  * file (the Delta/Iceberg OPTIMIZE ZORDER technique, built here from
  * codegen'd bit arithmetic — no UDF, no custom expression needed).
  *
  * The key is a fold of shift/mask/or Columns, so it stays inside
  * whole-stage codegen and is reproducible in any engine with integer
  * bit ops (the fixture query's DuckDB oracle mirrors it digit for
  * digit).
  */
object ZOrderLayout {

  /** Morton-interleave the low `bits` bits of two non-negative integer
    * columns: result bit 2i = bit i of `a`, bit 2i+1 = bit i of `b`.
    *
    * PRECONDITION: both columns must lie in [0, 2^bits) — higher bits are
    * silently dropped, which aliases distant values onto the same key and
    * destroys exactly the locality this exists for. [[writeZOrdered]]
    * validates the range before writing; use it (or check your own
    * domain) rather than calling this raw on unbounded data.
    */
  def zorderKey(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Write `df` range-partitioned and sorted by the Z-order key of
    * (dimA, dimB) — the materialized layout whose files bound both
    * dimensions. `bits` must cover the dimensions' value range.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      dimA: String,
      dimB: String,
      bits: Int,
      partitions: Int = 32
  ): Unit = {
    // enforce the zorderKey domain precondition: values past 2^bits would
    // alias silently and void the layout's skipping property. One cheap
    // min/max scan against a write-once layout job is the right trade.
    val limit = 1L << bits
    val r = df
      .agg(
        min(col(dimA)), max(col(dimA)),
        min(col(dimB)), max(col(dimB))
      )
      .head()
    val (minA, maxA, minB, maxB) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    require(
      minA >= 0 && maxA < limit && minB >= 0 && maxB < limit,
      s"zorderKey domain violated: $dimA in [$minA,$maxA], $dimB in " +
        s"[$minB,$maxB] must lie in [0,$limit) for bits=$bits"
    )
    val keyed = df.withColumn("__zkey", zorderKey(col(dimA), col(dimB), bits))
    keyed
      .repartitionByRange(partitions, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write
      .mode("overwrite")
      .parquet(path)
  }
}
