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
    * every fixture table. session.timeZone=UTC is pinned for the same
    * reason: [[normalizeTs]]'s TimestampNTZ->Timestamp cast relabels the
    * instant only under UTC — on a non-UTC session every ts would shift by
    * the local offset, silently skewing windows, watermarks, and the
    * DuckDB oracle comparison (which casts in UTC).
    */
  // fixture schemas, inferred once per (dir, table) per JVM: parquet
  // schema inference runs a one-task Spark job per read call — per-read
  // metadata cost across 163 queries, and noise in the plan-audit gate's
  // build-job counting. Fixtures are immutable, so the cache is safe.
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  // r21: resolved-READ cache. Even with the schema memoized, every
  // `spark.read.parquet(path)` re-resolves the relation during the next
  // query's analysis — file-index construction + options resolution
  // measured at ~11 ms per call on the fixtures (ProbeR21 `rules`:
  // ResolveDataSource 898 ms of 2.65 s total Catalyst rule time across 3
  // full-bench planning passes, 81 resolutions — the single largest
  // planning cost, 17x all graft rules combined). A catalog-backed table
  // resolves once and reuses; this gives the same economics to the
  // fixture path reads (guide §6's file-listing cache, applied at the
  // relation level). METADATA ONLY: queries still optimize, plan and
  // execute from parquet on every run. Keyed by session identity AND the
  // target's (length, modTime), so a rewritten file re-resolves and
  // another session never sees a foreign session's relation state.
  private val relationCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val path = s"$dir/$name.parquet"
    val ident =
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getFileStatus(p)
        s"${st.getLen}:${st.getModificationTime}"
      } catch { case scala.util.control.NonFatal(_) => "?" }
    val key = s"${System.identityHashCode(spark)}:$path:$ident"
    if (relationCache.size > 512) relationCache.clear()
    relationCache.computeIfAbsent(key, { _ =>
      val schema =
        schemaCache.computeIfAbsent(path, p => spark.read.parquet(p).schema)
      spark.read.schema(schema).parquet(path)
    })
  }

  /** events with `ts` as a real TimestampType (micros). The fixture has
    * shipped `ts` two ways across driver generations — TIMESTAMP(NANOS)
    * (read as long via nanosAsLong) and plain timestamp[us] (read as
    * TIMESTAMP_NTZ) — so the normalization is type-dispatched; both land
    * on the same micros DuckDB's cast-to-TIMESTAMP produces, so oracle
    * comparisons agree bit-for-bit either way.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(t(spark, dir, "events"))

  /** `ts` (long nanos | timestamp_ntz | timestamp) -> TimestampType micros.
    * The session timezone is UTC (GraftSession), so the NTZ cast relabels
    * the same instant rather than shifting it.
    */
  def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `div`, not `/`: Spark's / on longs is DOUBLE division, which
        // rounds the microsecond up for half the nanos values; DuckDB's
        // NS->US cast truncates. Integer division matches it exactly.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other (expected long nanos or timestamp)")
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

  /** DuckDB expression: the UTF-8 OCTETS of 1-char slices of `s` as one
    * HUGEINT list — the exact byte sequence the engine folds see via
    * `UTF8String.getBytes`. DuckDB has no blob-to-int-list conversion, so
    * the expansion is codepoint arithmetic (1-4 bytes per char); validated
    * against Python's utf-8 encoder across the BMP and astral planes.
    */
  def utf8OctetsSql(s: String): String = {
    val u = s"unicode($s[i])"
    s"""list_transform(flatten([
       |      CASE WHEN $u < 128 THEN [$u]
       |           WHEN $u < 2048 THEN [192 + $u // 64, 128 + $u % 64]
       |           WHEN $u < 65536 THEN [224 + $u // 4096, 128 + ($u // 64) % 64, 128 + $u % 64]
       |           ELSE [240 + $u // 262144, 128 + ($u // 4096) % 64, 128 + ($u // 64) % 64, 128 + $u % 64]
       |      END for i in range(1, length($s)+1)]), x -> CAST(x AS HUGEINT))""".stripMargin
  }

  /** DuckDB mirror of `rolling_fingerprint` (functions.RollingFingerprint):
    * Karp-Rabin polynomial hash base 257 mod 2^61-1 over the text's
    * UTF-8 BYTES, as HUGEINT modular folds over the [[utf8OctetsSql]]
    * octet list — bit-for-bit with the engine for ANY text, ASCII or not
    * (before round 9 this folded codepoints and was exact only while the
    * corpus stayed ASCII). Emits a CTE named `fpc` with
    * (doc_id, full_fp, win_fp) where win_fp is the min over `w`-byte
    * rolling windows (whole-string hash when byte length <= w, matching
    * the expression's `window >= n` branch). O(n*w) per doc in SQL — fine
    * for an oracle, which is the point: the engine side is the O(n)
    * rolling version.
    */
  def fingerprintOracleCte(w: Int = 32): String = {
    def fold(list: String): String =
      s"list_reduce(list_prepend(CAST(0 AS HUGEINT), $list), " +
        "(a, b) -> (a * 257 + b) % 2305843009213693951)"
    val full = fold("codes")
    val win = fold(s"codes[i:i+${w - 1}]")
    s"""fpraw AS (
       |  SELECT doc_id, ${utf8OctetsSql("text")} AS codes
       |  FROM documents
       |), fpn AS (
       |  SELECT doc_id, codes, len(codes) AS n FROM fpraw
       |), fpc AS (
       |  SELECT doc_id,
       |    CAST($full AS BIGINT) AS full_fp,
       |    CAST(CASE WHEN n > $w THEN
       |      list_min([$win for i in range(1, n - ${w - 2})])
       |    ELSE $full END AS BIGINT) AS win_fp
       |  FROM fpn
       |)""".stripMargin
  }
}
