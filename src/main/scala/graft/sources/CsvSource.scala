package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV table registration — the Spark-native analogue of the reference's
  * CSV paths: the production `ListingTable`+`CsvFormat` registration with a
  * declared schema and header option (reference:
  * crates/coordinator/src/main.rs:33-43) and the legacy row-scan connector
  * (crates/connectors/filesystem/src/lib.rs:17-46). Spark's CSV source
  * subsumes both: schema declaration or inference, header or headerless,
  * and it scans distributed with column pruning.
  */
object CsvSource {

  /** Read a CSV with a declared schema (no inference pass — at 100 TB you
    * never want the extra full scan schema inference costs).
    */
  def read(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean
  ): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .csv(path)

  /** Read with schema inference (small/ad-hoc files only — inference is an
    * extra scan; reference's legacy connector similarly materialized the
    * whole file, crates/connectors/filesystem/src/lib.rs:24-44).
    */
  def readInferred(spark: SparkSession, path: String, header: Boolean): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("inferSchema", "true")
      .csv(path)

  /** Fixture helper: materialize a parquet table as a single-header CSV in
    * a temp dir (once per JVM per table) so CSV-source queries can run
    * against data whose oracle lives in the parquet tables. Returns the
    * CSV path.
    */
  def csvCopyOfParquet(spark: SparkSession, parquetPath: String, name: String): String = {
    // key the copy by source path too: the same table name exists at every
    // scale factor, and a cached sf0.01 CSV must not serve an sf0.001 run.
    // The PID keeps concurrent JVMs (bench + verify in parallel CI) from
    // racing overwrite-vs-scan on a shared mutable copy.
    val srcKey = Integer.toHexString(parquetPath.hashCode)
    val target = Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft-csv",
      s"$name-${srcKey}_p${ProcessHandle.current().pid()}"
    )
    graft.engine.TempDirs.register(target)
    if (!Files.exists(target.resolve("_SUCCESS"))) {
      spark.read
        .parquet(parquetPath)
        .coalesce(1)
        .write
        .mode("overwrite")
        .option("header", "true")
        .csv(target.toString)
    }
    target.toString
  }
}
