package graft.sources

import org.apache.spark.sql.SparkSession

/** Storage-bucketed table registration — the co-located-join technique the
  * 100 TB plan leans on: write both join sides bucketed (and sorted) by
  * the join key into the SAME bucket count, and the join needs NO shuffle
  * at read time — each task zips bucket i with bucket i. At cluster scale
  * this turns the recurring fact-fact join (orders ⋈ lineitem every
  * query) from a full 2-sided shuffle into a scan-local merge, paid once
  * at write time instead of per query.
  *
  * The reference has no storage layer of its own (its Iceberg connector is
  * a dir glob), so this is Spark-native value: `bucketBy` + `sortBy` via
  * `saveAsTable` with an explicit external path (no warehouse dependence —
  * the table's files live under java.io.tmpdir, the metadata in the
  * session's in-memory catalog).
  */
object BucketedTables {

  /** Materialize a parquet fixture table bucketed+sorted by `key` into
    * `nBuckets`, register it in the session catalog, and return the
    * registered table name. Idempotent per (session, fixture dir, table);
    * the PID in the path keeps concurrent JVMs from racing each other's
    * files (same discipline as the IVF index materialization).
    */
  def bucketedCopy(
      spark: SparkSession,
      dir: String,
      table: String,
      key: String,
      nBuckets: Int
  ): String = {
    val name =
      s"graft_bkt_${table}_${Integer.toHexString(dir.hashCode)}"
    if (!spark.catalog.tableExists(name)) {
      val path = graft.engine.TempDirs
        .workspace("graft-bucketed", s"bkt_$table", dir).toString
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read
        .parquet(s"$dir/$table.parquet")
        .write
        .mode("overwrite")
        .bucketBy(nBuckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(name)
    }
    name
  }
}
