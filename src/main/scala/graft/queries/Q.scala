package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** One registered query: the Spark implementation plus (when the operation
  * is SQL-expressible) an equivalent ANSI-SQL oracle the driver runs in
  * DuckDB on the same parquet tables (BASELINE.md correctness gate).
  *
  * `oracleFn` is the DYNAMIC variant: an oracle whose text is only known
  * after the query has run (q_sim_topk_ivf and q_embed_clusters embed the
  * KMeans centroids the run fitted). Verify dumps oracle_sql.json AFTER
  * executing every query,
  * so a dynamic oracle that captured its state during the run is emitted;
  * one that never ran simply stays absent (the driver then records the
  * same rows-only check it would for a static None).
  *
  * `bench = true` marks the headline queries Bench.scala times at sf0.1.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false,
    oracleFn: Option[() => Option[String]] = None
) {
  /** The oracle text as of NOW (post-run for dynamic oracles). */
  def oracleNow: Option[String] = oracleFn.map(_()).getOrElse(oracle)
}

/** Shared helpers for query definitions. */
object QueryUtil {

  /** Load one driver-generated table (TESTDATA.md). Plain parquet scan —
    * Catalyst handles column pruning and filter pushdown from the plan.
    *
    * events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects by default ([PARQUET_TYPE_ILLEGAL]); the legacy nanosAsLong
    * conf makes it read as LongType nanos (see `events` for the typed view).
    * Set unconditionally so any session — ours or the driver's — can scan
    * every fixture table.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with `ts` as a real TimestampType (micros), truncated from the
    * file's nanos exactly like DuckDB's TIMESTAMP_NS -> TIMESTAMP cast, so
    * oracle comparisons agree bit-for-bit.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    // `div`, not `/`: Spark's / on longs is DOUBLE division, which rounds
    // the microsecond up for half the nanos values; DuckDB's NS->US cast
    // truncates. Integer division matches it exactly.
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Register tables as temp views for SQL-text queries; returns spark. */
  def views(spark: SparkSession, dir: String, names: String*): SparkSession = {
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark
  }

  /** `$"col"` interpolator usable outside a SparkSession's implicits. */
  implicit class ColumnInterpolator(private val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  /** Exact-arithmetic bridge for the DuckDB oracle: do money math in
    * decimal (bit-exact in any engine, immune to floating-point summation
    * order) and cast to double only at the very end. The same casts appear
    * verbatim in the oracle SQL, so Spark-at-scale parallel aggregation and
    * single-threaded DuckDB produce identical bits.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(14, 2)) // prices/quantities
  def pct(c: Column): Column = c.cast(DecimalType(4, 2)) // rates in [0,1)
  def asDouble(c: Column): Column = c.cast("double")
  def asLong(c: Column): Column = c.cast("bigint")

  /** DuckDB mirror of `rolling_fingerprint` (functions.RollingFingerprint):
    * Karp-Rabin polynomial hash base 257 mod 2^61-1 over the text's BYTES,
    * as HUGEINT modular folds over per-char codes (== bytes ONLY while the
    * corpus is pure ASCII — a codepoint > 127 folds one multi-byte char
    * where the engine folds 2-4 bytes and the equivalence silently breaks;
    * DedupSpec's fixture-envelope test pins the assumption, it is not
    * hoped). Emits a CTE named `fpc` with
    * (doc_id, full_fp, win_fp) where win_fp is the min over `w`-byte
    * rolling windows (whole-string hash when length <= w, matching the
    * expression's `window >= n` branch). O(n*w) per doc in SQL — fine for
    * an oracle, which is the point: the engine side is the O(n) rolling
    * version.
    */
  def fingerprintOracleCte(w: Int = 32): String = {
    def fold(list: String): String =
      s"list_reduce(list_prepend(CAST(0 AS HUGEINT), $list), " +
        "(a, b) -> (a * 257 + b) % 2305843009213693951)"
    val full = fold("codes")
    val win = fold(s"codes[i:i+${w - 1}]")
    s"""fpraw AS (
       |  SELECT doc_id,
       |    [CAST(unicode(text[i]) AS HUGEINT) for i in range(1, length(text)+1)] AS codes,
       |    length(text) AS n
       |  FROM documents
       |), fpc AS (
       |  SELECT doc_id,
       |    CAST($full AS BIGINT) AS full_fp,
       |    CAST(CASE WHEN n > $w THEN
       |      list_min([$win for i in range(1, n - ${w - 2})])
       |    ELSE $full END AS BIGINT) AS win_fp
       |  FROM fpraw
       |)""".stripMargin
  }
}
