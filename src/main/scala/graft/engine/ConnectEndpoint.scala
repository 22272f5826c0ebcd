package graft.engine

import org.apache.spark.sql.SparkSession

/** Wire-standard remote serving: a Spark Connect gRPC endpoint running
  * inside the engine's JVM, so ANY stock Spark Connect client — JVM
  * (`spark-connect-client-jvm`), PySpark with `remote(...)`, Spark
  * Connect JDBC — can run graft's tables and views over the network
  * with no bespoke protocol. This is the reference's tonic-gRPC serving
  * intent (crates/api/src/lib.rs:26-38,52-60) on the protocol Spark
  * clients actually speak.
  *
  * Relationship to [[ServingServer]]: that server implements the Arrow
  * Flight VERB SET (poll/cancel/auth/TTL over Arrow-IPC TCP framing)
  * because no arrow-flight jar exists offline — it stays as the
  * ticketed-flight surface; this endpoint is the standards-compliant
  * path for stock clients. Both serve the same session's state.
  *
  * Session topology: each Connect client gets an ISOLATED server-side
  * session (own temp views, own confs) sharing the SparkContext and the
  * JVM-wide catalog — so anything meant for clients must be registered
  * in the SHARED layers, which is what [[registerShared]] does:
  * fixture parquet tables land in the in-memory catalog as external
  * `USING parquet` tables (visible by bare name from every session),
  * and engine-defined DataFrames publish as GLOBAL temp views (clients
  * read `global_temp.<name>`). A client needing the events table's
  * nanos timestamps sets `spark.sql.legacy.parquet.nanosAsLong` on its
  * own session conf — per-session by design.
  */
object ConnectEndpoint {

  // Spark's service object is a JVM singleton; its started/stopped flags
  // are private[connect], so liveness is tracked here (start() below is
  // the only path that starts it in this codebase)
  private val live = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Start the gRPC service on `port` (0 = ephemeral). Returns the bound
    * port. Idempotent per JVM: a second start is a no-op returning the
    * live port.
    */
  def start(spark: SparkSession, port: Int): Int = synchronized {
    import org.apache.spark.sql.connect.GraftConnectBridge
    if (live.compareAndSet(false, true)) {
      try {
        org.apache.spark.GraftSparkInternals.setContextConf(
          spark.sparkContext, "spark.connect.grpc.binding.port", port.toString)
        GraftConnectBridge.start(spark.sparkContext)
      } catch {
        // a failed bind (port taken) must not latch "started": the
        // caller's retry with another port has to actually start it
        case e: Throwable => live.set(false); throw e
      }
    }
    GraftConnectBridge.boundPort
  }

  def stop(): Unit = synchronized {
    import org.apache.spark.sql.connect.GraftConnectBridge
    if (live.compareAndSet(true, false)) GraftConnectBridge.stop()
  }

  /** Publish the graft surface where isolated Connect sessions can see
    * it: parquet fixture tables as shared catalog tables (bare-name
    * SQL), plus any engine-built frames as global temp views.
    */
  def registerShared(
      spark: SparkSession,
      dir: String,
      tables: Seq[String],
      views: Map[String, org.apache.spark.sql.DataFrame] = Map.empty): Unit = {
    tables.foreach { t =>
      val p = new java.io.File(s"$dir/$t.parquet")
      if (p.exists()) {
        // external table over the fixture path: metadata-only, read-only
        // use; IF NOT EXISTS so re-registration (tests, restarts with a
        // warehouse dir) is a no-op rather than an error
        spark.sql(
          s"CREATE TABLE IF NOT EXISTS `$t` USING parquet " +
            s"LOCATION '${p.getAbsolutePath}'")
      }
    }
    views.foreach { case (name, df) => df.createOrReplaceGlobalTempView(name) }
  }
}
