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
      prune: Option[IcebergMeta.PartitionPredicate],
      // file-level data skipping via recorded column min/max bounds —
      // a scan optimization (conservative), the caller still applies
      // the residual row filter
      fileFilter: Seq[IcebergMeta.ColumnBound] = Nil,
      // read a named ref: a BRANCH reads its head with the table's
      // CURRENT schema (it's a live line of development); a TAG reads
      // its pinned snapshot with the schema that snapshot logged
      // (time-travel by name). "main" = the plain current read.
      ref: Option[String] = None,
      // an already-loaded metadata to plan against instead of re-parsing
      // it — the per-step cache the IVM refresh steps thread through
      // every read they issue, so one step costs ONE metadata load per
      // table however many keyed reads it plans. The caller vouches the
      // meta IS tablePath's (same trust shape as a pinned snapshotId).
      preloaded: Option[IcebergMeta.TableMeta] = None): DataFrame = {
    require(Seq(snapshotId, asOfTimestampMs, ref).count(_.isDefined) <= 1,
      "Specify at most one of snapshotId / asOfTimestampMs / ref")
    if (runtimeAvailable) {
      val r = spark.read.format("iceberg")
      snapshotId.foreach(id => r.option("snapshot-id", id))
      asOfTimestampMs.foreach(ts => r.option("as-of-timestamp", ts))
      ref.foreach(b => r.option("branch", b))
      r.load(tablePath)
    } else if (preloaded.isDefined || IcebergMeta.hasMetadata(tablePath)) {
      readViaMetadata(spark, tablePath, snapshotId, asOfTimestampMs, prune,
        fileFilter, ref, preloaded)
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
      prune: Option[IcebergMeta.PartitionPredicate],
      fileFilter: Seq[IcebergMeta.ColumnBound] = Nil,
      ref: Option[String] = None,
      preloaded: Option[IcebergMeta.TableMeta] = None): DataFrame = {
    val meta = preloaded.getOrElse(IcebergMeta.load(tablePath))
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
      stamped: Boolean = false,
      // true: retain the `_g_file`/`_g_pos`/`_g_seq` lineage columns —
      // [[readChangelog]] semi-joins NEW delete files against them to
      // name the exact rows a snapshot removed
      keepLineage: Boolean = false): DataFrame = {
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
    if (keepLineage) df
    else df.select(schema.fieldNames.toSeq.map(col): _*)
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
    val plan = to.map(s => IcebergMeta.planAppends(meta, fromSnapshotId, s))
      .getOrElse(IcebergMeta.ScanPlan(Seq.empty, 0, 0, 0))
    // fromSnapshotId == 0 ("from the beginning") delegates to a full
    // scan plan, which can carry live v2 delete files — they MUST be
    // applied here or every deleted row would silently resurrect. (A
    // non-zero window REFUSES on in-window delete manifests instead;
    // this is the same contract for the degenerate window.)
    readFiles(spark, tablePath, schema, plan.files, deletes = plan.deletes,
      fields =
        if (toSnapshotId.isDefined) meta.schemaAt(to.get) else meta.fields,
      stamped = stamped)
  }

  /** CDC CHANGELOG: every row-level change in the snapshot window
    * (`fromSnapshotId`, `to`], emitted with `_change_type` ("insert" |
    * "delete") and `_change_snapshot_id` — the read that turns an
    * Iceberg table into a change stream a downstream index or cache can
    * consume incrementally. Unlike [[readAppendsSince]] (net appends
    * only, refuses on in-window deletes), this walks the window
    * snapshot by snapshot and emits BOTH sides:
    *
    *   - data files a snapshot ADDED -> their rows as inserts (a MERGE's
    *     replaced rows therefore surface as delete+insert pairs — the
    *     CDC encoding of an update);
    *   - files a COW delete marked DELETED -> their rows as deletes;
    *   - v2 delete FILES a snapshot added -> the exact rows they removed,
    *     computed against the PARENT snapshot's live state (earlier
    *     deletes already applied, sequence scoping preserved), so a
    *     position delete of an already-dead row emits nothing;
    *   - "replace" snapshots (compaction/clustering) -> nothing: they
    *     rewrite bytes, not rows.
    *
    * Scale shape: planning is KB-metadata ancestry walking; each
    * snapshot's reads touch only ITS added files (and, for MoR deletes,
    * the parent files the delete can reach) — the cost is proportional
    * to the window's churn, never the table. Delete-file contents stay
    * broadcast-side, the data side is one vectorized scan per snapshot.
    */
  def readChangelog(
      spark: SparkSession,
      tablePath: String,
      fromSnapshotId: Long,
      toSnapshotId: Option[Long] = None,
      // same per-step metadata-cache contract as [[read]]'s `preloaded`
      preloaded: Option[IcebergMeta.TableMeta] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(preloaded.isDefined || IcebergMeta.hasMetadata(tablePath),
      s"Changelog reads require table metadata; $tablePath has none")
    val meta = preloaded.getOrElse(IcebergMeta.load(tablePath))
    val to = toSnapshotId.map(meta.snapshotById).orElse(meta.currentSnapshot)
      .getOrElse(throw new IllegalStateException(s"$tablePath has no snapshots"))
    // resolve the window by ancestry (same discipline as planAppends:
    // snapshot ids are random longs on foreign tables, id arithmetic lies)
    var chain = List.empty[IcebergMeta.Snapshot]
    var cursor: Option[IcebergMeta.Snapshot] = Some(to)
    val visited = scala.collection.mutable.Set.empty[Long]
    while (cursor.isDefined && cursor.get.id != fromSnapshotId) {
      require(visited.add(cursor.get.id),
        s"parent-snapshot-id ancestry of ${to.id} cycles at " +
          s"${cursor.get.id} — metadata is corrupt; refusing to plan")
      chain = cursor.get :: chain
      cursor = cursor.get.parentId.flatMap(p => meta.snapshots.find(_.id == p))
    }
    require(fromSnapshotId == 0L || cursor.isDefined,
      s"from-snapshot $fromSnapshotId is not a reachable ancestor of " +
        s"snapshot ${to.id} — refusing to guess a window")

    val stamped = meta.fieldIdStamped
    if (stamped) enableFieldIdRead(spark)
    val schema = IcebergMeta.sparkSchema(meta.fields, stamped)
    def tagged(df: DataFrame, tpe: String, sid: Long): DataFrame =
      df.select(schema.fieldNames.toSeq.map(col): _*)
        .withColumn("_change_type", lit(tpe))
        .withColumn("_change_snapshot_id", lit(sid))

    val frames = scala.collection.mutable.Buffer.empty[DataFrame]
    chain.foreach { s =>
      if (s.operation != "replace") {
        val entries = IcebergMeta.readManifestListFile(meta.root, s.manifestList)
          .filter(_.addedSnapshotId == s.id)
          .flatMap(mf => IcebergMeta.readManifest(
            meta.root, mf.path, mf.addedSnapshotId, mf.sequenceNumber)
            .map(mf -> _))
        // inserts: data files this snapshot added
        val added = entries.collect {
          case (mf, e) if mf.content == 0 && e.status == 1 &&
            e.snapshotId == s.id && e.dataFile.content == 0 => e.dataFile
        }
        if (added.nonEmpty)
          frames += tagged(readFiles(spark, tablePath, schema, added,
            Seq.empty, meta.fields, stamped), "insert", s.id)
        // COW deletes: entries this snapshot flipped to DELETED (carried-
        // over DELETED entries from earlier snapshots keep THEIR id and
        // are filtered out — re-emitting them would double-report)
        val removed = entries.collect {
          case (mf, e) if mf.content == 0 && e.status == 2 &&
            e.snapshotId == s.id && e.dataFile.content == 0 => e.dataFile
        }
        if (removed.nonEmpty)
          frames += tagged(readFiles(spark, tablePath, schema, removed,
            Seq.empty, meta.fields, stamped), "delete", s.id)
        // MoR deletes: delete files this snapshot added, resolved to the
        // exact rows they removed from the parent's live state
        val newDeletes = entries.collect {
          case (mf, e) if mf.content == 1 && e.status != 2 =>
            IcebergMeta.DeleteFile(e.dataFile.path, e.dataFile.format,
              e.dataFile.content, e.dataFile.equalityIds,
              e.dataFile.sequenceNumber, e.dataFile.recordCount)
        }
        if (newDeletes.nonEmpty) {
          val parent = s.parentId.map(meta.snapshotById).getOrElse(
            throw new IllegalStateException(
              s"delete snapshot ${s.id} has no parent to diff against"))
          val rem = rowsRemovedBy(spark, tablePath, meta, parent, newDeletes,
            schema, stamped)
          rem.foreach(df => frames += tagged(df, "delete", s.id))
        }
      }
    }
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schema.add("_change_type", org.apache.spark.sql.types.StringType, false)
        .add("_change_snapshot_id", org.apache.spark.sql.types.LongType, false))
    frames.foldLeft(empty)(_.unionByName(_))
  }

  /** The rows `newDeletes` (all added by ONE snapshot) removed from the
    * `parent` snapshot's live state. Position deletes touch only the data
    * files they name; equality deletes touch only files the sequence
    * scoping lets them reach; both semi-join the (parent-live, lineage-
    * tagged) rows against the broadcast delete contents.
    */
  private def rowsRemovedBy(
      spark: SparkSession,
      tablePath: String,
      meta: IcebergMeta.TableMeta,
      parent: IcebergMeta.Snapshot,
      newDeletes: Seq[IcebergMeta.DeleteFile],
      schema: org.apache.spark.sql.types.StructType,
      stamped: Boolean): Seq[DataFrame] = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val parentPlan = IcebergMeta.planScan(meta, parent)
    val frames = scala.collection.mutable.Buffer.empty[DataFrame]

    val posDel = newDeletes.filter(_.content == 1)
    if (posDel.nonEmpty) {
      val seq = posDel.map(_.sequenceNumber).max
      val pd = spark.read.parquet(posDel.map(_.path): _*)
        .select(normalizePathCol(col("file_path")).as("_d_file"),
          col("pos").as("_d_pos"))
      // the delete files NAME their target data files — metadata-scale
      // list, so the parent read touches only those files
      val targetPaths = pd.select("_d_file").distinct()
        .collect().map(_.getString(0)).toSet
      val targets = parentPlan.files.filter(f =>
        targetPaths.contains(normalizePath(f.path)) &&
          f.sequenceNumber <= seq)
      if (targets.nonEmpty) {
        val live = applyMergeOnRead(spark, tablePath, schema, targets,
          parentPlan.deletes, meta.fields, stamped, keepLineage = true)
        frames += live.join(broadcast(pd),
          live("_g_file") === pd("_d_file") &&
            live("_g_pos") === pd("_d_pos") &&
            lit(seq) >= live("_g_seq"),
          "left_semi").select(schema.fieldNames.toSeq.map(col): _*)
      }
    }

    val eqGroups = newDeletes.filter(_.content == 2).groupBy(_.equalityIds)
    eqGroups.toSeq.sortBy(_._1.mkString(",")).foreach { case (ids, group) =>
      require(ids.nonEmpty,
        s"equality delete without equality_ids: ${group.head.path}")
      val names = ids.map(id => meta.fieldById(id).name)
      val seq = group.map(_.sequenceNumber).max
      // DELETE-KEY RANGE PRUNING: without it, materializing an equality
      // delete's removed rows reads EVERY strictly-older file — an
      // O(table) term inside an otherwise O(churn) changelog window (the
      // objectstore probe measured it dominating the IVM step's round
      // trips). A single-column integral delete key gives a cheap, safe
      // filter: only files whose recorded min/max overlaps the deleted
      // keys' [min, max] can lose rows; the semi-join below stays the
      // filter of record. Range-LOCAL churn (CDC corrections within a
      // recent ingest) prunes to a handful of files; scattered deletes
      // degrade gracefully to the unpruned read.
      val keyBounds: Seq[IcebergMeta.ColumnBound] =
        if (ids.length != 1 ||
          !Set("int", "long")(meta.fieldById(ids.head).typeName)) Nil
        else {
          import org.apache.spark.sql.functions.{
            count => fcount, max => fmax, min => fmin, when => fwhen}
          val n = names.head
          // min/max ignore nulls, but the read side applies equality
          // deletes null-SAFELY: a NULL delete key removes null-keyed
          // rows, which can live in files OUTSIDE the value bounds — a
          // delete file carrying any null key disables pruning entirely
          val r = spark.read.parquet(group.map(_.path): _*)
            .agg(fmin(col(n)), fmax(col(n)),
              fcount(fwhen(col(n).isNull, lit(1)))).head()
          if (r.isNullAt(0) || r.getLong(2) > 0L) Nil
          else Seq(IcebergMeta.ColumnBound(n, "gteq", r.get(0)),
            IcebergMeta.ColumnBound(n, "lteq", r.get(1)))
        }
      val prunedFiles =
        if (keyBounds.isEmpty) parentPlan.files
        else IcebergMeta.planScan(meta, parent, None, keyBounds).files
      // strict scoping: equality deletes reach only strictly-older files
      val targets = prunedFiles.filter(_.sequenceNumber < seq)
      if (targets.nonEmpty) {
        val live = applyMergeOnRead(spark, tablePath, schema, targets,
          parentPlan.deletes, meta.fields, stamped, keepLineage = true)
        val edReader =
          if (stamped)
            spark.read.schema(org.apache.spark.sql.types.StructType(
              names.map(n => schema(n))))
          else spark.read
        val ed = edReader.parquet(group.map(_.path): _*)
          .select(names.map(n => col(n).as(s"_d_$n")): _*)
        val keyCond = names.map(n => live(n) <=> ed(s"_d_$n")).reduce(_ && _)
        frames += live.join(broadcast(ed), keyCond, "left_semi")
          .select(schema.fieldNames.toSeq.map(col): _*)
      }
    }
    frames.toSeq
  }

  /** Scan plan for a metadata table — the spec pins pruning evidence
    * (manifestsRead < manifestsTotal) and exact file sets with this.
    */
  def planScan(
      tablePath: String,
      snapshotId: Option[Long] = None,
      asOfTimestampMs: Option[Long] = None,
      prune: Option[IcebergMeta.PartitionPredicate] = None,
      fileFilter: Seq[IcebergMeta.ColumnBound] = Nil): IcebergMeta.ScanPlan = {
    val meta = IcebergMeta.load(tablePath)
    val snap = snapshotId.map(meta.snapshotById)
      .orElse(asOfTimestampMs.map(meta.snapshotAsOf))
      .orElse(meta.currentSnapshot)
      .getOrElse(throw new IllegalStateException(s"$tablePath has no snapshots"))
    IcebergMeta.planScan(meta, snap, prune, fileFilter)
  }

  /** Scan filters for a CHURN-SCALE keyed read ("re-derive exactly these
    * keys from the base") — the piece that decides whether keyed IVM
    * beats view recompute at 100 TB. A keyed refresh semi-joins the base
    * table against a churn-sized key set, but without scan filters the
    * read under the semi-join still lists and reads EVERY data file.
    * When `keyExpr` is a bare column of the table, two conservative
    * (strict-superset) filters derive mechanically from the key set:
    *
    *   - PARTITION pruning ([[IcebergMeta.PartitionIn]]): when a spec
    *     partitions by the column — identity or hidden bucket/truncate;
    *     [[IcebergMeta.planScan]] evaluates the transform on each key —
    *     manifests and files outside the keys' partitions are skipped.
    *     Wins when the keys' transformed image is small relative to the
    *     layout: point lookups, a handful of churned dimension keys.
    *   - FILE-BOUND range skipping ([[IcebergMeta.ColumnBound]]
    *     gteq/lteq over the keys' min..max): files whose recorded
    *     column bounds sit wholly outside the churn's range are
    *     skipped. Wins on clustered / append-ordered layouts where
    *     churn is range-local — the recent-data churn every ingest
    *     pipeline produces.
    *
    * Both are scan OPTIMIZATIONS, never semantics: the caller's
    * semi-join remains the filter of record, and every fallback path —
    * `keyExpr` not a bare column, table without metadata, key set over
    * `cap`, null keys, a spec whose transform cannot evaluate these
    * values, a non-integral column type for the range — degrades to the
    * do-nothing filters, i.e. the exact unpruned read.
    *
    * The key set is driver-collected BOUNDED by `cap` (churn-scale
    * longs, never table-scale). An over-cap key set falls back to a
    * single min/max aggregate so range skipping survives huge churn
    * windows (e.g. the view-creation step, where "churn" is the whole
    * history).
    */
  def keyedFilters(
      tablePath: String,
      keyExpr: org.apache.spark.sql.Column,
      keys: DataFrame,
      keyColName: String,
      cap: Int = 100000,
      // same per-step metadata-cache contract as [[read]]'s `preloaded`
      preloaded: Option[IcebergMeta.TableMeta] = None)
      : (Option[IcebergMeta.PartitionPredicate], Seq[IcebergMeta.ColumnBound]) = {
    import org.apache.spark.sql.functions.{col, max, min}
    val none =
      (Option.empty[IcebergMeta.PartitionPredicate],
        Seq.empty[IcebergMeta.ColumnBound])
    val colName = org.apache.spark.sql.classic.GraftSqlInternals
      .simpleColumnName(keyExpr)
      .getOrElse(return none) // an arbitrary expression has no scan column
    if (preloaded.isEmpty && !IcebergMeta.hasMetadata(tablePath)) return none
    val meta = preloaded.getOrElse(IcebergMeta.load(tablePath))
    val field = meta.fields.find(_.name == colName).getOrElse(return none)
    // range endpoints are picked DRIVER-side and must order exactly as
    // the planner's stored-bound comparison does — integral types only
    // (doubles/strings have encoding-order subtleties not worth the risk)
    val integral = Set("int", "long")(field.typeName)
    val rows = keys.select(col(keyColName)).distinct().limit(cap + 1).collect()
    if (rows.isEmpty) return none
    if (rows.length > cap) {
      if (!integral) return none
      val r = keys.agg(min(col(keyColName)), max(col(keyColName))).head()
      if (r.isNullAt(0)) return none
      return (None, Seq(
        IcebergMeta.ColumnBound(colName, "gteq", r.get(0)),
        IcebergMeta.ColumnBound(colName, "lteq", r.get(1))))
    }
    val vals = rows.map(_.get(0))
    // a null key cannot be pruned FOR (bounds and transforms are defined
    // on values); reading everything is the conservative answer
    if (vals.exists(_ == null)) return none
    // the specs that would prune on this column (same name resolution as
    // planScan); every one of them must evaluate its transform on these
    // values cleanly, or planning would throw where it used to scan
    val resolving = meta.specsById.values.toSeq.flatMap(sf =>
      sf.find(pf =>
        pf.name == colName ||
          meta.fields.find(_.id == pf.sourceId).exists(_.name == colName)))
    val prune =
      if (resolving.isEmpty) None
      else if (resolving.forall(pf => scala.util.Try(
        IcebergTransforms(pf.transform, field.typeName, vals.head)).isSuccess))
        Some(IcebergMeta.PartitionIn(colName, vals.toSet))
      else None
    val bounds =
      if (!integral) Nil
      else {
        val longs = vals.map(_.asInstanceOf[Number].longValue())
        Seq(
          IcebergMeta.ColumnBound(colName, "gteq", longs.min),
          IcebergMeta.ColumnBound(colName, "lteq", longs.max))
      }
    (prune, bounds)
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

  // (root, metadata version) -> the current snapshot's live data-file set,
  // normalized. The version key makes staleness structurally impossible:
  // every table commit bumps the hint, and versions are never reused, so
  // a memo hit IS the current plan. Bounded by distinct (table, version)
  // pairs a process compiles against; entries for superseded versions are
  // evicted on sight.
  private val currentFilesMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Set[String], Long)]()

  /** If `paths` is EXACTLY the current snapshot's live data-file set of
    * one metadata-backed Iceberg table (every path under `<root>/data/`,
    * no pending merge-on-read deletes), the table root — the hook that
    * lets plan-level consumers (MV rewrite/advisor) treat a planned
    * Iceberg read as a scan of the TABLE rather than of N anonymous
    * files. Deliberately exact: a TIME-TRAVEL read (older snapshot) or a
    * pruned read resolves to a different file set and returns None, so a
    * consumer keyed on the root can never mistake a historical or
    * partial scan for the current table. Cost per call: one version-hint
    * read (tiny file) on memo hit; one metadata load + scan plan on miss.
    */
  def currentTableRoot(paths: Seq[String]): Option[String] = {
    if (paths.isEmpty) return None
    val sep = "/data/"
    val idx = paths.head.indexOf(sep)
    if (idx <= 0) return None
    val root = paths.head.substring(0, idx)
    if (!paths.forall(_.startsWith(root + sep))) return None
    currentLiveFiles(root).flatMap { files =>
      if (paths.map(normalizePath).toSet == files) Some(root) else None
    }
  }

  /** The current snapshot's live data-file set, or None when the table
    * has no metadata / no snapshot / live v2 deletes (a MoR read is not
    * a plain file scan, so file-set consumers must not match it).
    */
  private def currentLiveFiles(root: String): Option[Set[String]] = {
    val version = versionHint(root).getOrElse(return None)
    val memo = currentFilesMemo.get(root)
    if (memo != null && memo._1 == version) {
      return if (memo._3 > 0) None else Some(memo._2)
    }
    if (!IcebergMeta.hasMetadata(root)) return None
    val meta = IcebergMeta.load(root)
    val snap = meta.currentSnapshot.getOrElse(return None)
    val plan = IcebergMeta.planScan(meta, snap)
    val entry = (version, plan.files.map(f => normalizePath(f.path)).toSet,
      plan.deletes.size.toLong)
    currentFilesMemo.put(root, entry): Unit
    if (plan.deletes.nonEmpty) None else Some(entry._2)
  }
}
