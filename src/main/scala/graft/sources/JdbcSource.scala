package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Postgres/MySQL table registration — the reference ships these as
  * connector stubs (crates/connectors/postgres/src/lib.rs:1,
  * crates/connectors/mysql/src/lib.rs:1: "TODO: Implement ... connector");
  * here the full read path exists through Spark's JDBC source, which the
  * stubs were aspiring to: predicate pushdown into the remote SQL, column
  * pruning, and partitioned parallel reads.
  *
  * The offline build ships one JDBC driver — embedded Derby in
  * /opt/spark/jars — so SourcesSpec exercises this read path LIVE
  * (create-insert in Derby, scan/partitioned-read/pushdown/federated-join
  * through `read`); the postgres/mysql helpers differ only in url+driver
  * string, and on a real cluster their driver jar on the classpath is the
  * only additional requirement.
  */
object JdbcSource {

  /** Register a remote table. `partitionColumn`/bounds enable parallel
    * reads: numPartitions concurrent range-partitioned queries instead of
    * one connection streaming the whole table — the difference between a
    * usable and unusable 1 TB JDBC ingest.
    */
  def read(
      spark: SparkSession,
      url: String,
      table: String,
      properties: Map[String, String] = Map.empty,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 0L,
      upperBound: Long = 0L,
      numPartitions: Int = 8
  ): DataFrame = {
    val base = spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val withProps = properties.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
    val withPartitioning = partitionColumn.fold(withProps) { c =>
      withProps
        .option("partitionColumn", c)
        .option("lowerBound", lowerBound.toString)
        .option("upperBound", upperBound.toString)
        .option("numPartitions", numPartitions.toString)
    }
    withPartitioning.load()
  }

  /** Write a DataFrame to a remote table — the reverse path the
    * reference's connector stubs never reached (publishing curated
    * results back to an operational store). Executors write
    * partition-parallel through their own connections with
    * `batchSize`-row batched inserts; `maxConnections` caps the fan-in
    * so a 1000-partition frame doesn't open 1000 sessions against one
    * database (coalesce, never repartition — capping must not shuffle).
    * `mode`: "append" adds rows; "overwrite" replaces the table
    * (truncate when the dialect supports it, else drop-create — Spark's
    * standard JDBC semantics). Transactionality is per-partition-batch,
    * the JDBC source's contract: a mid-write failure can leave partial
    * rows in append mode, so idempotent targets (staging table + server-
    * side merge) are the production pattern for exactly-once publishes.
    */
  def write(
      df: DataFrame,
      url: String,
      table: String,
      properties: Map[String, String] = Map.empty,
      mode: String = "append",
      batchSize: Int = 1000,
      maxConnections: Int = 8
  ): Unit = {
    // unconditional: coalesce to >= the current partition count is a
    // no-op, and probing df.rdd.getNumPartitions would force a separate
    // physical-plan conversion whose pre-AQE estimate can differ from
    // what save() actually executes with — the cap must hold at
    // execution time, not against an estimate
    val capped = df.coalesce(maxConnections)
    val base = capped.write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
    properties.foldLeft(base) { case (w, (k, v)) => w.option(k, v) }
      .mode(mode)
      .save()
  }

  def postgres(
      spark: SparkSession,
      host: String,
      port: Int,
      database: String,
      table: String,
      user: String,
      password: String
  ): DataFrame =
    read(
      spark,
      s"jdbc:postgresql://$host:$port/$database",
      table,
      Map("user" -> user, "password" -> password, "driver" -> "org.postgresql.Driver")
    )

  def mysql(
      spark: SparkSession,
      host: String,
      port: Int,
      database: String,
      table: String,
      user: String,
      password: String
  ): DataFrame =
    read(
      spark,
      s"jdbc:mysql://$host:$port/$database",
      table,
      Map("user" -> user, "password" -> password, "driver" -> "com.mysql.cj.jdbc.Driver")
    )
}
