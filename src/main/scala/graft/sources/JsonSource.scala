package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines table registration — rounds out the file-source surface next
  * to CsvSource/IcebergSource (the reference's connector seam registers
  * format-specific listing tables the same way; its filesystem connector
  * is the row-scan analogue, crates/connectors/filesystem/src/lib.rs:17-46).
  * Spark's JSON source scans JSONL distributed, with predicate pushdown on
  * the parsed columns and per-file parallelism.
  */
object JsonSource {

  /** Read newline-delimited JSON with a declared schema. No inference pass
    * — at 100 TB schema inference is a full extra scan, and worse than for
    * CSV: JSON inference must parse every value to union object shapes.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Read with schema inference (small/ad-hoc files only). */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Fixture helper: materialize a parquet table as JSONL in a temp dir
    * (once per JVM per (table, source path)) so JSON-source queries can
    * run against data whose oracle lives in the parquet tables. The PID
    * in the path keeps concurrent JVMs (bench + verify in parallel CI)
    * from racing overwrite-vs-scan on a shared mutable copy — same
    * discipline as the IVF index and bucketed-table materializations.
    */
  def jsonCopyOfParquet(
      spark: SparkSession,
      parquetPath: String,
      name: String
  ): String = {
    val srcKey = Integer.toHexString(parquetPath.hashCode)
    val target = Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft-json",
      s"$name-${srcKey}_p${ProcessHandle.current().pid()}"
    )
    graft.engine.TempDirs.register(target)
    if (!Files.exists(target.resolve("_SUCCESS"))) {
      spark.read
        .parquet(parquetPath)
        .coalesce(1)
        .write
        .mode("overwrite")
        .json(target.toString)
    }
    target.toString
  }
}
