package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC table registration — the third columnar format a mixed-vintage
  * lake actually contains (Hive-era tables are overwhelmingly ORC). The
  * reference never reached beyond parquet/CSV (its connector crates stop
  * at stubs); Spark's native ORC reader gives the full treatment for
  * free: vectorized scan, predicate pushdown into ORC's row-group
  * indexes, column pruning, partition discovery — the same contract the
  * parquet scan (SURVEY §2.A A1) satisfies, which PlanSpec pins.
  */
object OrcSource {

  /** Read an ORC table/directory. Schema comes from the ORC footers
    * (self-describing, like parquet) — no inference scan needed.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Fixture helper: materialize a parquet table as ORC in a temp dir
    * (once per JVM per table+source), so ORC-source queries run against
    * data whose oracle lives in the parquet tables — same pattern as
    * [[CsvSource.csvCopyOfParquet]]. Returns the ORC path.
    */
  def orcCopyOfParquet(
      spark: SparkSession, parquetPath: String, name: String): String = {
    val srcKey = Integer.toHexString(parquetPath.hashCode)
    val target = Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft-orc",
      s"$name-${srcKey}_p${ProcessHandle.current().pid()}"
    )
    graft.engine.TempDirs.register(target)
    if (!Files.exists(target.resolve("_SUCCESS"))) {
      spark.read
        .parquet(parquetPath)
        .write
        .mode("overwrite")
        .orc(target.toString)
    }
    target.toString
  }
}
