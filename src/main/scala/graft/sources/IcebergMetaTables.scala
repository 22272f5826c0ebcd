package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Iceberg METADATA TABLES — the ops surface the real Iceberg runtime
  * exposes as `table$snapshots` / `table$files` / `table$history` /
  * `table$refs` / `table$partitions`: the table's own bookkeeping as
  * queryable DataFrames. Everything here is driver-side KB-scale
  * metadata (the same walk scan planning does) materialized as a local
  * relation — no data file is opened, so "how many rows landed per
  * partition yesterday" costs metadata, not a scan.
  *
  * At 100 TB this is how operators watch a table: delete-file pressure
  * (compaction debt) from `files`, snapshot cadence and operations from
  * `snapshots`, publish points from `history`, audit-branch positions
  * from `refs`, per-partition row/file counts from `partitions`.
  */
object IcebergMetaTables {

  /** One row per snapshot: id, parent, commit time, operation, sequence
    * number, and the summary map (commit provenance — e.g. the streaming
    * sink's batch id).
    */
  def snapshots(spark: SparkSession, tablePath: String): DataFrame = {
    val meta = IcebergMeta.load(tablePath)
    val schema = StructType(Seq(
      StructField("snapshot_id", LongType, nullable = false),
      StructField("parent_id", LongType, nullable = true),
      StructField("committed_at_ms", LongType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("sequence_number", LongType, nullable = false),
      StructField("summary", MapType(StringType, StringType), nullable = false)))
    val rows = meta.snapshots.map(s => Row(
      s.id, s.parentId.map(Long.box).orNull, s.timestampMs, s.operation,
      s.sequenceNumber, s.summary - "operation"))
    local(spark, schema, rows)
  }

  /** The MAIN branch's snapshot log: when each snapshot became current
    * (appends and fast-forward publishes both log here; branch-only
    * commits don't), and whether it is still an ancestor of the current
    * state (false = it was rolled past).
    */
  def history(spark: SparkSession, tablePath: String): DataFrame = {
    val meta = IcebergMeta.load(tablePath)
    val ancestors = meta.currentSnapshot.map { c =>
      Iterator.iterate(Option(c)) {
        case Some(s) => s.parentId.flatMap(p => meta.snapshots.find(_.id == p))
        case None => None
      }.takeWhile(_.isDefined).flatten.map(_.id).toSet
    }.getOrElse(Set.empty[Long])
    val node = IcebergMeta.metadataJson(tablePath)
    val entries = {
      import scala.jdk.CollectionConverters._
      node.path("snapshot-log").elements().asScala.map(e =>
        (e.path("timestamp-ms").asLong(), e.path("snapshot-id").asLong())).toSeq
    }
    val schema = StructType(Seq(
      StructField("made_current_at_ms", LongType, nullable = false),
      StructField("snapshot_id", LongType, nullable = false),
      StructField("is_current_ancestor", BooleanType, nullable = false)))
    local(spark, schema, entries.map { case (ts, id) =>
      Row(ts, id, ancestors.contains(id))
    })
  }

  /** Named refs, with `main` surfaced explicitly from current-snapshot-id
    * so the view is the complete answer to "what lines of history exist".
    */
  def refs(spark: SparkSession, tablePath: String): DataFrame = {
    val meta = IcebergMeta.load(tablePath)
    val schema = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("snapshot_id", LongType, nullable = false)))
    val main = meta.currentSnapshotId.map(id =>
      Row(IcebergMeta.MainBranch, "branch", id)).toSeq
    local(spark, schema,
      main ++ meta.refs.toSeq.sortBy(_._1).map { case (n, r) =>
        Row(n, r.refType, r.snapshotId)
      })
  }

  /** One row per LIVE file of a snapshot (default: current) — data files
    * AND delete files (`content` 0/1/2), with the partition tuple as a
    * string map, record counts, sizes, and sequence numbers. Delete-file
    * rows with low `sequence_number` spread = compaction debt.
    */
  def files(
      spark: SparkSession,
      tablePath: String,
      snapshotId: Option[Long] = None): DataFrame = {
    val meta = IcebergMeta.load(tablePath)
    val snap = snapshotId.map(meta.snapshotById).orElse(meta.currentSnapshot)
      .getOrElse(throw new IllegalStateException(s"$tablePath has no snapshots"))
    val plan = IcebergMeta.planScan(meta, snap)
    val schema = StructType(Seq(
      StructField("content", IntegerType, nullable = false),
      StructField("file_path", StringType, nullable = false),
      StructField("partition", MapType(StringType, StringType), nullable = false),
      StructField("record_count", LongType, nullable = false),
      StructField("file_size_bytes", LongType, nullable = false),
      StructField("sequence_number", LongType, nullable = false),
      StructField("spec_id", IntegerType, nullable = false)))
    val dataRows = plan.files.map(f => Row(
      f.content, f.path,
      f.partition.map { case (k, v) => k -> String.valueOf(v) },
      f.recordCount, f.fileSizeBytes, f.sequenceNumber, f.specId))
    val deleteRows = plan.deletes.map(d => Row(
      d.content, d.path, Map.empty[String, String], d.recordCount, 0L,
      d.sequenceNumber, 0))
    local(spark, schema, dataRows ++ deleteRows)
  }

  /** One-row table card — the DESCRIBE EXTENDED analogue: format
    * version, current snapshot/sequence, schema + partition + declared
    * sort order as text, property count, snapshot/ref counts. The
    * "what am I looking at" answer from pure KB metadata.
    */
  def describe(spark: SparkSession, tablePath: String): DataFrame = {
    val meta = IcebergMeta.load(tablePath)
    val schema = StructType(Seq(
      StructField("format_version", IntegerType, nullable = false),
      StructField("current_snapshot_id", LongType, nullable = true),
      StructField("last_sequence_number", LongType, nullable = false),
      StructField("schema", StringType, nullable = false),
      StructField("partition", StringType, nullable = false),
      StructField("sort_order", StringType, nullable = false),
      StructField("n_snapshots", IntegerType, nullable = false),
      StructField("n_refs", IntegerType, nullable = false),
      StructField("n_properties", IntegerType, nullable = false)))
    local(spark, schema, Seq(Row(
      meta.formatVersion,
      meta.currentSnapshotId.map(Long.box).orNull,
      meta.lastSequenceNumber,
      meta.fields.map(f =>
        s"${f.name}:${f.typeName}${if (f.required) "" else "?"}").mkString(", "),
      meta.partitionFields.map(p => s"${p.transform}(${p.name})").mkString(", "),
      meta.sortOrderColumns.mkString(", "),
      meta.snapshots.size,
      meta.refs.size,
      meta.properties.size)))
  }

  /** One row per manifest in the current (or given) snapshot's list —
    * the METADATA-pressure gauge: a commit-accreting ingest table shows
    * one row per commit here, and `IcebergMaintenance`'s manifest-
    * pressure step (or a direct `rewriteManifests`) is due when this
    * view grows long. `entry_count`/`live_entry_count` come from opening
    * each manifest (still KB-scale Avro, no data files touched).
    */
  def manifests(
      spark: SparkSession,
      tablePath: String,
      snapshotId: Option[Long] = None): DataFrame = {
    val meta = IcebergMeta.load(tablePath)
    val snap = snapshotId.map(meta.snapshotById).orElse(meta.currentSnapshot)
      .getOrElse(throw new IllegalStateException(s"$tablePath has no snapshots"))
    val listed = IcebergMeta.readManifestListFile(meta.root, snap.manifestList)
    val schema = StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("length_bytes", LongType, nullable = false),
      StructField("content", IntegerType, nullable = false),
      StructField("spec_id", IntegerType, nullable = false),
      StructField("added_snapshot_id", LongType, nullable = false),
      StructField("sequence_number", LongType, nullable = false),
      StructField("min_sequence_number", LongType, nullable = false),
      StructField("entry_count", IntegerType, nullable = false),
      StructField("live_entry_count", IntegerType, nullable = false)))
    val rows = listed.map { mf =>
      val entries = IcebergMeta.readManifest(
        meta.root, mf.path, mf.addedSnapshotId, mf.sequenceNumber)
      Row(mf.path, mf.length, mf.content, mf.partitionSpecId,
        mf.addedSnapshotId, mf.sequenceNumber, mf.minSequenceNumber,
        entries.size, entries.count(_.status != 2))
    }
    local(spark, schema, rows)
  }

  /** Per-partition rollup of [[files]] (data files only): file count and
    * record count per partition tuple — "is this table balanced" without
    * opening a single data file.
    */
  def partitions(
      spark: SparkSession,
      tablePath: String,
      snapshotId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    files(spark, tablePath, snapshotId)
      .filter(col("content") === 0)
      .groupBy(col("partition"))
      .agg(
        count(lit(1)).as("file_count"),
        sum(col("record_count")).as("record_count"),
        sum(col("file_size_bytes")).as("total_bytes"))
  }

  private def local(
      spark: SparkSession, schema: StructType, rows: Seq[Row]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }
}
