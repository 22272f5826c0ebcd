package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg table source.
  *
  * The reference's "Iceberg" connector is a directory scan: it recursively
  * globs parquet files under `<table>/data/` and streams each one, with no
  * manifest/snapshot handling — admitted in its own comments
  * (crates/connectors/iceberg/src/lib.rs:3-4, discovery at :42-76).
  *
  * Build-to-capability note (SURVEY.md §7 risks): with
  * `iceberg-spark-runtime` on the classpath the REAL path is
  * `spark.read.format("iceberg")` through a catalog. That jar is not in
  * this offline image, so `read` resolves in order:
  *   1. the Iceberg Spark runtime, if ever present;
  *   2. the REAL metadata layer ([[IcebergMeta]]): version-hint ->
  *      vN.metadata.json -> Avro manifest list -> Avro manifests ->
  *      exact live-file set, with snapshot-id / as-of-timestamp
  *      time-travel and manifest partition-summary pruning;
  *   3. the reference-fidelity directory scan, for metadata-less layouts
  *      (the reference's own fixture is exactly this: a version hint
  *      with no metadata json — data/iceberg_table/).
  */
object IcebergSource {

  /** True when the Iceberg Spark runtime is on the classpath. */
  def runtimeAvailable: Boolean =
    try {
      Class.forName("org.apache.iceberg.spark.source.IcebergSource")
      true
    } catch { case _: ClassNotFoundException => false }

  def read(spark: SparkSession, tablePath: String): DataFrame =
    read(spark, tablePath, None, None, None)

  /** Full read surface: time-travel + identity-partition pruning.
    *
    * Pruning here is MANIFEST-level (planning skips whole manifests via
    * the manifest list's field summaries, then non-matching entries) —
    * on top of that Spark still applies its own partition-dir discovery,
    * predicate pushdown, and column pruning to the explicit file list.
    */
  def read(
      spark: SparkSession,
      tablePath: String,
      snapshotId: Option[Long],
      asOfTimestampMs: Option[Long],
      prune: Option[IcebergMeta.PartitionEquals],
      // file-level data skipping via recorded column min/max bounds —
      // a scan optimization (conservative), the caller still applies
      // the residual row filter
      fileFilter: Seq[IcebergMeta.ColumnBound] = Nil,
      // read a named ref: a BRANCH reads its head with the table's
      // CURRENT schema (it's a live line of development); a TAG reads
      // its pinned snapshot with the schema that snapshot logged
      // (time-travel by name). "main" = the plain current read.
      ref: Option[String] = None): DataFrame = {
    require(Seq(snapshotId, asOfTimestampMs, ref).count(_.isDefined) <= 1,
      "Specify at most one of snapshotId / asOfTimestampMs / ref")
    if (runtimeAvailable) {
      val r = spark.read.format("iceberg")
      snapshotId.foreach(id => r.option("snapshot-id", id))
      asOfTimestampMs.foreach(ts => r.option("as-of-timestamp", ts))
      ref.foreach(b => r.option("branch", b))
      r.load(tablePath)
    } else if (IcebergMeta.hasMetadata(tablePath)) {
      readViaMetadata(spark, tablePath, snapshotId, asOfTimestampMs, prune,
        fileFilter, ref)
    } else {
      require(snapshotId.isEmpty && asOfTimestampMs.isEmpty && prune.isEmpty &&
        ref.isEmpty,
        s"Time-travel/pruning requires table metadata; $tablePath has none " +
          "(directory-scan fallback reads current files only)")
      readDirectoryScan(spark, tablePath)
    }
  }

  /** Plan + execute a metadata-backed scan. The plan itself (file set,
    * manifests read vs total) is exposed via [[planScan]] for tests.
    */
  private def readViaMetadata(
      spark: SparkSession,
      tablePath: String,
      snapshotId: Option[Long],
      asOfTimestampMs: Option[Long],
      prune: Option[IcebergMeta.PartitionEquals],
      fileFilter: Seq[IcebergMeta.ColumnBound] = Nil,
      ref: Option[String] = None): DataFrame = {
    val meta = IcebergMeta.load(tablePath)
    // tag reads are time-travel (pinned snapshot, ITS schema); branch
    // reads are live (head snapshot, CURRENT schema)
    val timeTravel = snapshotId.isDefined || asOfTimestampMs.isDefined ||
      ref.exists(r => meta.refs.get(r).exists(_.refType == "tag"))
    val snap = snapshotId.map(meta.snapshotById)
      .orElse(asOfTimestampMs.map(meta.snapshotAsOf))
      .orElse(ref.map(meta.snapshotByRef))
      .orElse(meta.currentSnapshot)
    // TIME-TRAVEL reads resolve the schema the snapshot logged (spec:
    // snapshots carry a schema-id): the table as it WAS, so a column
    // added later must not appear. A current-table read always uses the
    // CURRENT schema — even though the latest snapshot predates the
    // latest schema change, schema evolution applies to it immediately.
    // snap is always defined under timeTravel (snapshotById/snapshotAsOf
    // throw on a miss), so the snapshot schema resolution has no fallback
    val snapFields = if (timeTravel) meta.schemaAt(snap.get) else meta.fields
    // id-stamped tables resolve parquet columns BY FIELD ID (the schema
    // carries parquet.field.id metadata + the session conf below) — what
    // makes renamed columns read old files correctly and keeps a dropped-
    // then-readded column from resurrecting. Unmarked tables stay
    // name-resolved exactly as before.
    val stamped = meta.fieldIdStamped
    if (stamped) enableFieldIdRead(spark)
    val schema = IcebergMeta.sparkSchema(snapFields, stamped)
    val plan = snap.map(s => IcebergMeta.planScan(meta, s, prune, fileFilter))
      .getOrElse(IcebergMeta.ScanPlan(Seq.empty, 0, 0, 0))
    readFiles(spark, tablePath, schema, plan.files, plan.deletes, snapFields,
      stamped)
  }

  /** Field-id resolution is a session conf, not a per-read option. It
    * only activates for read schemas that CARRY id metadata, so leaving
    * it on never changes how ordinary (metadata-less) parquet reads
    * resolve.
    */
  private def enableFieldIdRead(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")

  /** Planned file set -> DataFrame. The METADATA schema is handed to the
    * reader (no file-footer or partition-dir inference): column order and
    * types come from the table definition, identity-partition columns are
    * reconstituted from the data/<col>=<value>/ dirs with their DECLARED
    * type, and a column the table schema has but an older data file lacks
    * reads as null — the read half of Iceberg schema evolution, which
    * footer inference could never express. An empty plan yields an empty
    * frame WITH the table schema.
    */
  private def readFiles(
      spark: SparkSession,
      tablePath: String,
      schema: org.apache.spark.sql.types.StructType,
      files: Seq[IcebergMeta.DataFile],
      deletes: Seq[IcebergMeta.DeleteFile] = Seq.empty,
      fields: Seq[IcebergMeta.Field] = Seq.empty,
      stamped: Boolean = false): DataFrame =
    if (files.isEmpty) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else if (deletes.isEmpty) {
      import org.apache.spark.sql.functions.col
      groupedRead(spark, tablePath, schema, files)(
        // partition-dir columns surface at the END regardless of their
        // declared position; restore the table schema's column order
        _.select(schema.fieldNames.toSeq.map(col): _*))
    } else {
      applyMergeOnRead(spark, tablePath, schema, files, deletes, fields,
        stamped)
    }

  /** One vectorized parquet read per PARTITION SPEC the planned files
    * were written under, unioned (spec evolution: an identity layout's
    * `<col>=<val>` dirs and an unpartitioned flat layout cannot share
    * one partition-discovery pass — mixed dir depths make Spark refuse).
    * Single-spec tables (the overwhelming case) take exactly one read,
    * same plan as before evolution support existed; `project` normalizes
    * each group to an identical column set so the union is positional.
    */
  private def groupedRead(
      spark: SparkSession,
      tablePath: String,
      schema: org.apache.spark.sql.types.StructType,
      files: Seq[IcebergMeta.DataFile])(
      project: DataFrame => DataFrame): DataFrame =
    files.groupBy(_.specId).toSeq.sortBy(_._1).map { case (_, fs) =>
      project(
        spark.read
          .schema(schema)
          .option("basePath", Paths.get(tablePath, "data").toString)
          .parquet(fs.map(_.path): _*))
    }.reduce(_.union(_))

  /** Canonical file path for delete matching: stored delete-file paths and
    * Spark's `_metadata.file_path` may disagree on URI form
    * (`file:///a/b` vs `file:/a/b` vs `/a/b`) while naming the same file.
    */
  private def normalizePath(p: String): String =
    p.stripPrefix("file:").replaceFirst("^/+", "/")

  private def normalizePathCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.regexp_replace
    regexp_replace(regexp_replace(c, "^file:", ""), "^/+", "/")
  }

  /** v2 merge-on-read: subtract delete-file rows from the planned data
    * files, sequence-scoped per the spec:
    *   - position deletes (content=1, columns `file_path`,`pos`) remove
    *     the row at `pos` of `file_path` from data files with
    *     data seq <= delete seq;
    *   - equality deletes (content=2, rows of the equality columns)
    *     remove every matching row from data files with
    *     data seq < delete seq (strict: a row re-inserted AFTER the
    *     delete survives it).
    *
    * Shape at 100 TB: the data scan stays one vectorized parquet read
    * (column pruning + pushdown intact); delete files are KB–MB-scale
    * side inputs BROADCAST into hash anti-joins keyed on (file, pos) /
    * the equality columns, with the sequence comparison as a residual
    * condition — no shuffle of the data side, no per-file driver loop.
    * Row positions come from Spark's `_metadata.row_index` (generated by
    * the parquet reader itself), so no synthetic ordering is assumed.
    */
  private def applyMergeOnRead(
      spark: SparkSession,
      tablePath: String,
      schema: org.apache.spark.sql.types.StructType,
      files: Seq[IcebergMeta.DataFile],
      deletes: Seq[IcebergMeta.DeleteFile],
      fields: Seq[IcebergMeta.Field],
      stamped: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import spark.implicits._

    deletes.find(_.format.toUpperCase != "PARQUET").foreach(d =>
      throw new UnsupportedOperationException(
        s"delete file format ${d.format} not supported (parquet only): ${d.path}"))

    // data file -> its data sequence number (driver-side KB-scale map,
    // broadcast-joined on the normalized file path)
    val seqByFile = files.map(f => (normalizePath(f.path), f.sequenceNumber))
      .toDF("_g_file", "_g_seq")
    var df = groupedRead(spark, tablePath, schema, files)(g => g
      .withColumn("_g_file", normalizePathCol(col("_metadata.file_path")))
      .withColumn("_g_pos", col("_metadata.row_index"))
      .select((schema.fieldNames.toSeq :+ "_g_file" :+ "_g_pos").map(col): _*))
      .join(broadcast(seqByFile), Seq("_g_file"))

    val posDeletes = deletes.filter(_.content == 1)
    if (posDeletes.nonEmpty) {
      // all position-delete files in ONE read; each row joins back to its
      // own delete file's sequence number via _metadata
      val deleteSeq = posDeletes
        .map(d => (normalizePath(d.path), d.sequenceNumber))
        .toDF("_d_dfile", "_d_seq")
      val pd = spark.read.parquet(posDeletes.map(_.path): _*)
        .select(
          normalizePathCol(col("file_path")).as("_d_file"),
          col("pos").as("_d_pos"),
          normalizePathCol(col("_metadata.file_path")).as("_d_dfile"))
        .join(broadcast(deleteSeq), Seq("_d_dfile"))
      df = df.join(
        broadcast(pd),
        df("_g_file") === pd("_d_file") && df("_g_pos") === pd("_d_pos") &&
          pd("_d_seq") >= df("_g_seq"),
        "left_anti")
    }

    // equality deletes grouped by their equality-column set (each group is
    // one anti-join); null-safe equality per spec (null keys match nulls)
    val eqGroups = deletes.filter(_.content == 2).groupBy(_.equalityIds)
    eqGroups.toSeq.sortBy(_._1.mkString(",")).foreach { case (ids, group) =>
      require(ids.nonEmpty, s"equality delete without equality_ids: ${group.head.path}")
      val names = ids.map { id =>
        fields.find(_.id == id).getOrElse(throw new IllegalArgumentException(
          s"equality delete references field id $id absent from the read schema"))
          .name
      }
      val deleteSeq = group
        .map(d => (normalizePath(d.path), d.sequenceNumber))
        .toDF("_d_dfile", "_d_seq")
      // id-stamped tables declare the delete-file schema from the CURRENT
      // fields (with their id metadata): a delete file written before a
      // key column was renamed still resolves by field id. Unmarked
      // tables infer, as their delete files predate id stamping.
      val edReader =
        if (stamped)
          spark.read.schema(org.apache.spark.sql.types.StructType(
            names.map(n => schema(n))))
        else spark.read
      val ed = edReader.parquet(group.map(_.path): _*)
        .select(names.map(n => col(n).as(s"_d_$n")) :+
          normalizePathCol(col("_metadata.file_path")).as("_d_dfile"): _*)
        .join(broadcast(deleteSeq), Seq("_d_dfile"))
      val keyCond = names.map(n => df(n) <=> ed(s"_d_$n")).reduce(_ && _)
      df = df.join(broadcast(ed), keyCond && ed("_d_seq") > df("_g_seq"), "left_anti")
    }
    df.select(schema.fieldNames.toSeq.map(col): _*)
  }

  /** Incremental read: the NET APPENDS since `fromSnapshotId` (exclusive),
    * up to `toSnapshotId` (inclusive; default the current snapshot) — the
    * "process only what landed since yesterday's run" primitive. Planned
    * entirely from metadata; see [[IcebergMeta.planAppends]].
    */
  def readAppendsSince(
      spark: SparkSession,
      tablePath: String,
      fromSnapshotId: Long,
      toSnapshotId: Option[Long] = None): DataFrame = {
    require(IcebergMeta.hasMetadata(tablePath),
      s"Incremental reads require table metadata; $tablePath has none")
    val meta = IcebergMeta.load(tablePath)
    val to = toSnapshotId.map(meta.snapshotById).orElse(meta.currentSnapshot)
    val stamped = meta.fieldIdStamped
    if (stamped) enableFieldIdRead(spark)
    // explicit historical window end -> that snapshot's logged schema
    // (`to` is defined: snapshotById throws on a miss); default (current)
    // -> current schema (same rule as read())
    val schema = IcebergMeta.sparkSchema(
      if (toSnapshotId.isDefined) meta.schemaAt(to.get) else meta.fields,
      stamped)
    val files = to.map(s => IcebergMeta.planAppends(meta, fromSnapshotId, s).files)
      .getOrElse(Seq.empty)
    readFiles(spark, tablePath, schema, files, stamped = stamped)
  }

  /** Scan plan for a metadata table — the spec pins pruning evidence
    * (manifestsRead < manifestsTotal) and exact file sets with this.
    */
  def planScan(
      tablePath: String,
      snapshotId: Option[Long] = None,
      asOfTimestampMs: Option[Long] = None,
      prune: Option[IcebergMeta.PartitionEquals] = None,
      fileFilter: Seq[IcebergMeta.ColumnBound] = Nil): IcebergMeta.ScanPlan = {
    val meta = IcebergMeta.load(tablePath)
    val snap = snapshotId.map(meta.snapshotById)
      .orElse(asOfTimestampMs.map(meta.snapshotAsOf))
      .orElse(meta.currentSnapshot)
      .getOrElse(throw new IllegalStateException(s"$tablePath has no snapshots"))
    IcebergMeta.planScan(meta, snap, prune, fileFilter)
  }

  /** Reference-fidelity fallback (iceberg/src/lib.rs:42-76): verify the
    * table layout, then scan all parquet under `data/` recursively —
    * Spark's parquet source does the recursive listing and all the usual
    * pruning/pushdown into the files.
    */
  def readDirectoryScan(spark: SparkSession, tablePath: String): DataFrame = {
    val root = Paths.get(tablePath)
    val data = root.resolve("data")
    // mirror the reference's error paths (lib.rs:150-185): missing table
    // dir and missing data dir are distinct, eager errors
    require(Files.isDirectory(root), s"Iceberg table path not found: $tablePath")
    require(
      Files.isDirectory(data),
      s"Iceberg table has no data directory: $tablePath/data"
    )
    spark.read
      .option("recursiveFileLookup", "true")
      .parquet(data.toString)
  }

  /** Current version per the directory layout's `version-hint.text`
    * (reference fixture: data/iceberg_table/metadata/version-hint.text).
    */
  def versionHint(tablePath: String): Option[Int] = {
    val hint = Paths.get(tablePath, "metadata", "version-hint.text")
    if (Files.exists(hint)) Some(Files.readString(hint).trim.toInt) else None
  }
}
