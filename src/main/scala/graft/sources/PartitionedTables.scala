package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-partitioned table materialization — the layout that makes dynamic
  * partition pruning (DPP) work: a fact table written as one directory per
  * partition-key value (`o_month=1995-01-01/…`) lets a join against a
  * FILTERED dimension skip whole directories at runtime, because Catalyst
  * injects a `DynamicPruningExpression` on the fact scan whose IN-set is
  * the dim side's broadcast result. At 100 TB this is the #1 scan-pruning
  * lever: a quarter-filtered query over a 7-year fact reads 3/84 of the
  * files, before a single row is decoded.
  *
  * The reference's analogue is its partition-directory scan path
  * (crates/engine/tests/integration_test.rs:46-56) — a static dir glob;
  * Spark's DPP is that idea done at plan time against a runtime value.
  */
object PartitionedTables {

  /** Materialize `orders` hive-partitioned by calendar month
    * (`o_month`, a DATE — written as `o_month=1995-01-01` directories,
    * which Spark's partition-type inference reads back as DateType).
    * Idempotent per (fixture dir); PID-keyed path so concurrent JVMs
    * never race the check-then-write (same discipline as BucketedTables).
    */
  def ordersByMonth(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.engine.TempDirs.workspace("graft-dpp", "orders_by_month", dir)
    // process-local single-flight: q_dpp_join and q_dpp_subquery share
    // this fixture and can build concurrently (parallel suites, serving)
    graft.engine.TempDirs.materializeOnce(root)(
      java.nio.file.Files.exists(root.resolve("_SUCCESS"))
    ) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read
        .parquet(s"$dir/orders.parquet")
        .withColumn("o_month", trunc(col("o_orderdate"), "month"))
        .write
        .mode("overwrite")
        .partitionBy("o_month")
        .parquet(root.toString)
    }
    spark.read.parquet(root.toString)
  }

  /** A month dimension (first-of-month DATE + quarter label) spanning the
    * fixture's order dates. Tiny by construction — always broadcasts, so
    * the DPP subquery can reuse the broadcast (Spark's default
    * `reuseBroadcastOnly` mode) instead of running a second dim scan.
    */
  def monthDim(spark: SparkSession, from: String, months: Int): DataFrame =
    spark
      .range(0, months)
      .select(add_months(to_date(lit(from)), col("id").cast("int")).as("month"))
      .select(
        col("month"),
        concat(year(col("month")), lit("-Q"), quarter(col("month"))).as("quarter")
      )
}
