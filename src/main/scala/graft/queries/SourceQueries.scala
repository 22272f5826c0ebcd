package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import graft.sources.CsvSource
import QueryUtil._

/** Source-layer queries: CSV scan with declared schema, the cross-source
  * federated join the reference advertises (README.md:201 — different
  * connectors joined in one query), and the events time-window rollup
  * (batch twin of the M5 streaming pipeline).
  *
  * The CSV inputs are temp-dir copies of the parquet fixtures, so the
  * DuckDB oracle (which reads the parquet) checks the CSV round-trip
  * end-to-end: write -> scan with declared schema -> query.
  */
object SourceQueries {

  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)
  ))

  private val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)
  ))

  val all: Seq[Q] = Seq(
    // CSV scan with declared schema + header (reference:
    // coordinator/src/main.rs:33-43).
    Q(
      "q_csv_scan",
      (s, dir) => {
        val csv = CsvSource.csvCopyOfParquet(s, s"$dir/nation.parquet", "nation")
        CsvSource
          .read(s, csv, nationSchema, header = true)
          .filter($"n_regionkey" < 3)
          .select($"n_nationkey", $"n_name", $"n_regionkey")
          .orderBy($"n_nationkey")
      },
      Some(
        "SELECT n_nationkey, n_name, n_regionkey FROM nation " +
          "WHERE n_regionkey < 3 ORDER BY n_nationkey"
      )
    ),
    // Cross-source federated join: CSV supplier ⋈ parquet nation ⋈ parquet
    // region in one plan — connectors are just scan nodes to Catalyst, so
    // pushdown/broadcast work across sources exactly as within one.
    Q(
      "q_federated_join",
      (s, dir) => {
        val csv = CsvSource.csvCopyOfParquet(s, s"$dir/supplier.parquet", "supplier")
        val sup = CsvSource.read(s, csv, supplierSchema, header = true)
        val nation = t(s, dir, "nation")
        val region = t(s, dir, "region")
        sup
          .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(
            count(lit(1)).as("n_suppliers"),
            asDouble(sum(dec2($"s_acctbal"))).as("total_bal")
          )
          .orderBy($"r_name", $"n_name")
      },
      Some(
        "SELECT r_name, n_name, count(*) AS n_suppliers, " +
          "CAST(sum(CAST(s_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS total_bal " +
          "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
          "JOIN region ON n_regionkey = r_regionkey " +
          "GROUP BY r_name, n_name ORDER BY r_name, n_name"
      ),
      bench = true
    ),
    // Tumbling-window rollup over events — the batch twin of the M5
    // streaming pipeline (same window() operator Structured Streaming
    // uses), exercising the TIMESTAMP(NANOS) -> micros typed read.
    Q(
      "q_events_window",
      (s, dir) =>
        events(s, dir)
          .groupBy(
            window($"ts", "1 day").getField("start").as("day"),
            $"event_type"
          )
          .agg(
            count(lit(1)).as("n"),
            // exact-decimal sum: double summation order differs between
            // engines, decimals don't (QueryUtil.dec2 pattern)
            asDouble(sum($"value".cast(DecimalType(18, 6)))).as("sum_value")
          )
          .orderBy($"day", $"event_type"),
      Some(
        "SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type, " +
          "count(*) AS n, " +
          "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value " +
          "FROM events GROUP BY 1, 2 ORDER BY day, event_type"
      ),
      bench = true
    )
  )
}
