package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session/engine facade — the Spark-native analogue of the reference's
  * `QueryEngine` (reference: crates/engine/src/lib.rs:28-62), which wraps a
  * DataFusion `SessionContext`, registers the `capitalize` UDF, and executes
  * SQL. Here the analogue of DataFusion is Catalyst itself: `execute(sql)`
  * is `spark.sql(sql)` (parse -> analyze -> optimize -> physical plan ->
  * distributed execution), and table registration is the Spark catalog.
  *
  * Unlike the reference (which fully `collect()`s every query,
  * crates/engine/src/lib.rs:54-57), `execute` stays lazy and distributed:
  * callers choose `collect`/`show`/`write`, so a 100 TB result never has to
  * fit on the driver.
  */
class GraftSession(val spark: SparkSession) {

  graft.functions.Functions.register(spark)

  /** Register a DataFrame under a name (reference:
    * crates/common/src/catalog.rs:5-27 `MemoryCatalog::register_table`).
    */
  /** Register an Iceberg table (current snapshot) as a queryable view
    * that FOLLOWS commits: every IcebergWriter commit to this path
    * re-resolves the view against the new metadata, so SQL over `name`
    * always reads the table's current snapshot — append, MERGE, UPSERT,
    * compaction, schema evolution included. (Time travel stays on the
    * explicit IcebergSource.read(snapshotId) API; a view pinned to one
    * snapshot would silently go stale, the opposite of a catalog table.)
    */
  def registerIcebergTable(name: String, tablePath: String): Unit =
    registerIcebergTable(name, tablePath, None)

  /** Catalog view over an Iceberg table that FOLLOWS commits (every
    * writer commit re-binds the view). `ref` registers a named branch or
    * tag instead of main — `orders_audit` over the audit branch and
    * `orders_v1` over a release tag can sit in the catalog next to
    * `orders`, and SQL (and therefore the serving endpoint) reads
    * whichever line of history the name points at. Branch views follow
    * their branch's commits; tag views re-bind to the same pinned
    * snapshot (a no-op by construction — tags are immutable).
    */
  def registerIcebergTable(
      name: String,
      tablePath: String,
      ref: Option[String]): Unit = {
    val abs = java.nio.file.Paths.get(tablePath).toAbsolutePath.toString
    def bind(): Unit = registerTable(
      name, graft.sources.IcebergSource.read(spark, abs, None, None, None,
        ref = ref))
    bind()
    graft.sources.IcebergWriter.addCommitListener { committed =>
      if (java.nio.file.Paths.get(committed).toAbsolutePath.toString == abs)
        bind()
    }
  }

  /** The table's metadata tables as catalog views — `<name>_snapshots`,
    * `_history`, `_refs`, `_files`, `_partitions` — re-bound on every
    * commit like the data view, so `SELECT * FROM orders_partitions`
    * always describes the current snapshot. The ops surface in SQL.
    */
  def registerIcebergMetaTables(name: String, tablePath: String): Unit = {
    val abs = java.nio.file.Paths.get(tablePath).toAbsolutePath.toString
    import graft.sources.IcebergMetaTables
    def bind(): Unit = {
      registerTable(s"${name}_snapshots", IcebergMetaTables.snapshots(spark, abs))
      registerTable(s"${name}_history", IcebergMetaTables.history(spark, abs))
      registerTable(s"${name}_refs", IcebergMetaTables.refs(spark, abs))
      registerTable(s"${name}_files", IcebergMetaTables.files(spark, abs))
      registerTable(s"${name}_partitions", IcebergMetaTables.partitions(spark, abs))
      registerTable(s"${name}_manifests", IcebergMetaTables.manifests(spark, abs))
      registerTable(s"${name}_describe", IcebergMetaTables.describe(spark, abs))
    }
    bind()
    graft.sources.IcebergWriter.addCommitListener { committed =>
      if (java.nio.file.Paths.get(committed).toAbsolutePath.toString == abs)
        bind()
    }
  }

  def registerTable(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  /** Registered table names (reference: catalog.rs `get_table` surface). */
  def tableNames: Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq

  def table(name: String): DataFrame = spark.table(name)

  /** Execute SQL through Catalyst — the whole-query lifecycle of
    * reference crates/engine/src/lib.rs:54-57, minus the eager collect.
    *
    * Side-effect-free statements also land in a bounded QUERY LOG — the
    * observed workload the MV advisor folds over (`DO_ACTION advise`
    * with no argument). Commands are excluded structurally: spark.sql
    * executes DDL/DML eagerly, so replaying them from a log would
    * re-run their side effects — only lazily-planned queries are safe
    * to re-plan, and re-planning is all the advisor does.
    */
  def execute(sql: String): DataFrame = {
    val df = spark.sql(sql)
    val isCommand = df.queryExecution.analyzed match {
      case _: org.apache.spark.sql.catalyst.plans.logical.Command       => true
      case _: org.apache.spark.sql.catalyst.plans.logical.CommandResult => true
      case _                                                            => false
    }
    if (!isCommand) {
      queryLog.addLast(sql)
      while (queryLog.size > QueryLogCap) queryLog.pollFirst(): Unit
    }
    df
  }

  private val QueryLogCap = 256
  private val queryLog =
    new java.util.concurrent.ConcurrentLinkedDeque[String]()

  /** The session's observed side-effect-free workload, oldest first,
    * capped at [[QueryLogCap]] entries.
    */
  def recentQueries: Seq[String] = {
    import scala.jdk.CollectionConverters._
    queryLog.asScala.toSeq
  }

  /** Keyed distributed result cache (reference crates/cache/src/lib.rs). */
  val cache: ResultCache = new ResultCache()

  // Iceberg commits flow into write-through invalidation too: any cache
  // entry whose declared deps contain the committed table's absolute
  // path is evicted. One listener per session; a listener for a session
  // that cached nothing from the committed path is a no-op.
  graft.sources.IcebergWriter.addCommitListener { tablePath =>
    cache.invalidateDependents(
      java.nio.file.Paths.get(tablePath).toAbsolutePath.toString)
  }

  /** Table names a SQL statement reads, from the PARSED plan (analysis
    * not required): the dependency set for write-through invalidation.
    * CTE aliases surface as relations too — a false dep only ever
    * over-invalidates, which recomputes instead of serving stale rows.
    */
  private def referencedTables(sql: String): Set[String] =
    spark.sessionState.sqlParser.parsePlan(sql).collect {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        u.multipartIdentifier.last.toLowerCase(java.util.Locale.ROOT)
    }.toSet

  /** Cache a query's result under a key and register it as a table, so
    * subsequent SQL reads the pinned partitions (reference cache `put` +
    * catalog registration in one step). The query's referenced tables are
    * recorded as deps: a later [[createTableAs]] over any of them evicts
    * this entry (write-through invalidation).
    */
  def cacheQuery(key: String, sql: String): DataFrame = {
    val df = cache.put(key, execute(sql), referencedTables(sql))
    df.createOrReplaceTempView(key)
    df
  }

  /** Serving surface (reference Flight handlers, api/src/lib.rs:81-149). */
  lazy val serving: ServingShim = new ServingShim(this)

  /** Write path / CTAS — the reference has no write surface at all (Flight
    * `do_put` unimplemented, api/src/lib.rs:151-156); SURVEY.md §2 keeps it
    * in scope because Spark gives it for free. Executes `sql`, writes the
    * result as parquet at `path`, registers the WRITTEN table (so
    * subsequent queries scan the materialized files, not the query).
    */
  def createTableAs(name: String, sql: String, path: String): DataFrame = {
    execute(sql).write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    registerTable(name, df)
    // write-through: results computed FROM the (re)written table are now
    // stale — evict them; the next read recomputes over the new files
    cache.invalidateDependents(name.toLowerCase(java.util.Locale.ROOT))
    // statistics maintenance (r20): a CTAS REPLACES the files at `path`,
    // so for a tracked table the union-merge face is wrong (sketches
    // cannot forget the old contents) — re-analyze over the rows just
    // written instead: O(new table), which the write itself just was,
    // and combo sketches re-harvest through the stored combo keys.
    // Untracked paths pay nothing, the same contract as the Iceberg
    // append hook (StatsCatalog.mergeIncrement).
    if (graft.plans.StatsCatalog.tracked(path)) {
      val combos = graft.plans.StatsCatalog.lookup(path).toSeq
        .flatMap(_.combos.keys).map(_.split(',').toSeq)
      try graft.plans.StatsCatalog.analyze(spark, path, Some(df), combos): Unit
      catch {
        case scala.util.control.NonFatal(e) =>
          // a failed re-analyze must not fail the CTAS; drop the entry
          // instead — stale statistics on a REPLACED table could mis-arm
          // the auto optimizer, absent ones merely disarm it
          graft.plans.StatsCatalog.unregister(path)
          System.err.println(s"createTableAs: statistics re-analyze " +
            s"failed for $path; entry dropped (${e.getMessage})")
      }
    }
    df
  }
}

object GraftSession {

  /** Build a local session with the scale-aware defaults this engine
    * assumes everywhere: AQE on (runtime re-plan, skew-join handling),
    * shuffle partitions sized to the machine rather than Spark's default
    * 200, UTC session time zone for reproducible timestamp semantics.
    */
  def local(
      cores: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft"
  ): GraftSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      // graft's native functions as first-class SQL functions in every
      // session state (see GraftExtensions)
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      // Split input files so scans parallelize across the local cores: the
      // test fixtures are single ~1-10 MB parquet files, which the 128 MB
      // default packs into ONE task. 2 MB splits give every core work at
      // sf0.1 while keeping per-task overhead negligible. On a real
      // cluster reading 100 TB of 128 MB+ files, leave the defaults —
      // this constructor is the LOCAL profile (Bench/Verify/tests).
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (512 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      // lake-scale DPP profile: by default Spark only prunes partitions
      // dynamically when it can piggyback on an existing broadcast; a
      // partition-heavy deployment also wants the SUBQUERY path (dim too
      // big to broadcast / merge-joined), where skipping whole partition
      // dirs of a 100 TB fact dwarfs the cost of one extra dim scan. The
      // planner's useStats benefit check still gates each injection.
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as LongType nanos
      // instead of failing the whole scan (queries re-type via QueryUtil).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new GraftSession(spark)
  }

  /** Wrap an existing SparkSession (e.g. on a real cluster, where the
    * session arrives from spark-submit configured for that cluster).
    */
  def apply(spark: SparkSession): GraftSession = new GraftSession(spark)
}
