package graft.sources

import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.types._

/** Iceberg table-metadata model + reader (the layer the reference's
  * connector admits it fakes — crates/connectors/iceberg/src/lib.rs:3-4
  * declares manifest/snapshot handling and then directory-scans; built
  * here to the declared capability per SURVEY.md §7).
  *
  * Implements the READ side of the public Iceberg table spec
  * (https://iceberg.apache.org/spec/), format v1 with the v2 fields
  * tolerated by-name:
  *
  *   metadata/version-hint.text          -> current metadata version N
  *   metadata/vN.metadata.json           -> schema, partition spec, snapshots
  *   snapshot.manifest-list (Avro)       -> manifest_file entries with
  *                                          per-partition-field summaries
  *   manifest (Avro)                     -> manifest_entry {status, data_file}
  *
  * Scan planning reconstructs the LIVE file set of a snapshot (entries
  * with status EXISTING=0 or ADDED=1; DELETED=2 files are dropped, which
  * is how Iceberg represents deletes without touching data files) and
  * supports:
  *   - time-travel: snapshot-id or as-of-timestamp selection
  *   - manifest pruning: an identity-partition equality predicate is
  *     checked against the manifest list's field summaries
  *     (lower/upper bound single-value binaries) so whole manifests are
  *     skipped without being opened — the 100 TB lever: at production
  *     scale the manifest LIST is the only file planning must read
  *   - entry pruning: surviving manifests' entries are filtered on the
  *     stored partition tuple
  *
  * Everything here is driver-side planning over KB-scale metadata; the
  * data files themselves go to Spark's parquet source as an explicit
  * file list, keeping column pruning / predicate pushdown / vectorized
  * reads on the normal codegen path.
  */
object IcebergMeta {

  /** One column of the table schema (spec §Schemas: field id, name,
    * required flag, primitive type name).
    */
  final case class Field(id: Int, name: String, required: Boolean, typeName: String)

  /** One partition field (spec §Partition Specs). Only `identity` is
    * produced by [[IcebergWriter]]; other transforms are carried
    * through for honesty but refuse to prune.
    */
  final case class PartitionField(name: String, sourceId: Int, transform: String)

  final case class Snapshot(
      id: Long,
      parentId: Option[Long],
      timestampMs: Long,
      manifestList: String,
      operation: String,
      schemaId: Option[Int] = None,
      // v2 data sequence number (spec: strictly monotonic per commit);
      // 0 for v1 snapshots, where deletes are copy-on-write and ordering
      // by sequence is never needed
      sequenceNumber: Long = 0L,
      // the full summary map (operation included) — writers stamp commit
      // provenance here, e.g. the streaming sink's micro-batch id that
      // makes its replays idempotent
      summary: Map[String, String] = Map.empty)

  /** A named snapshot reference (spec §Refs): `branch` heads move as
    * commits land on them; `tag` pins are immutable. The `main` branch is
    * implicit — it IS `current-snapshot-id` — so it never appears here.
    */
  final case class Ref(snapshotId: Long, refType: String) {
    require(refType == "branch" || refType == "tag",
      s"ref type must be branch|tag, got '$refType'")
  }

  final case class TableMeta(
      root: Path,
      formatVersion: Int,
      fields: Seq[Field],
      partitionFields: Seq[PartitionField],
      currentSnapshotId: Option[Long],
      snapshots: Seq[Snapshot],
      schemasById: Map[Int, Seq[Field]] = Map.empty,
      currentSchemaId: Int = 0,
      lastSequenceNumber: Long = 0L,
      properties: Map[String, String] = Map.empty,
      // spec evolution: every partition spec the table has ever used,
      // keyed by spec-id. `partitionFields` stays the DEFAULT spec's
      // fields (what new writes lay out under); manifests written under
      // an older spec prune via THEIR recorded spec.
      specsById: Map[Int, Seq[PartitionField]] = Map.empty,
      defaultSpecId: Int = 0,
      // named refs (branches/tags) — write-audit-publish: a branch takes
      // commits without moving `main`; a tag pins a snapshot by name
      refs: Map[String, Ref] = Map.empty,
      // the metadata version this load READ — writers must base their
      // commit (verbatim json + target version + snapshot id) on this
      // ONE value; re-reading the hint later can observe a concurrent
      // commit and silently mix two table states into one snapshot
      loadedVersion: Int = 0,
      // the DEFAULT sort order's identity columns (spec `sort-orders` /
      // `default-sort-order-id`) — the table's declared write clustering.
      // Empty = unsorted order, or an order using transforms this writer
      // cannot lay out (read leniently; compaction just won't cluster)
      sortOrderColumns: Seq[String] = Nil) {

    def specFields(specId: Int): Seq[PartitionField] =
      specsById.getOrElse(specId, partitionFields)

    /** True when every data/equality-delete parquet of this table carries
      * spec field ids ([[IcebergMeta.FieldIdsProperty]], stamped at table
      * creation by [[IcebergWriter]] and honored by every write flavor).
      * Gates id-based column resolution on read — the mechanism that makes
      * rename safe and keeps a dropped-then-readded column from
      * resurrecting old values.
      */
    def fieldIdStamped: Boolean =
      properties.get(FieldIdsProperty).contains("true")

    /** The schema a snapshot was written under (spec: each snapshot logs
      * its schema-id) — real time-travel shows the table AS IT WAS, so a
      * column added later must not appear in a historical read. Falls
      * back to the current schema when the snapshot predates schema-id
      * logging or the schema was expired from the metadata.
      */
    def schemaAt(snapshot: Snapshot): Seq[Field] =
      snapshot.schemaId.flatMap(schemasById.get).getOrElse(fields)

    def snapshotById(id: Long): Snapshot =
      snapshots.find(_.id == id).getOrElse(
        throw new IllegalArgumentException(
          s"Iceberg snapshot $id not found (have ${snapshots.map(_.id).mkString(", ")})"))

    def currentSnapshot: Option[Snapshot] = currentSnapshotId.map(snapshotById)

    /** Snapshot ids on MAIN's ancestry (current head -> parent -> ...).
      * Branch-only snapshots share the `snapshots` array but are NOT
      * main history; a dangling parent (expired history) ends the walk.
      */
    def mainAncestry: Set[Long] = {
      val seen = scala.collection.mutable.Set.empty[Long]
      var cursor = currentSnapshot
      while (cursor.isDefined && seen.add(cursor.get.id))
        cursor = cursor.get.parentId.flatMap(id => snapshots.find(_.id == id))
      seen.toSet
    }

    /** Latest MAIN-ancestry snapshot with timestamp-ms <= asOfMs (spec
      * time-travel). Filtering to main's ancestry matters on tables with
      * write-audit-publish branches: branch commits land in the shared
      * snapshots array, and an as-of read that picked one by timestamp
      * alone would silently return unpublished data as if it were the
      * table's history.
      */
    def snapshotAsOf(asOfMs: Long): Snapshot = {
      val ancestry = mainAncestry
      val eligible = snapshots.filter(s =>
        s.timestampMs <= asOfMs && ancestry.contains(s.id))
      if (eligible.isEmpty)
        throw new IllegalArgumentException(
          s"No main-ancestry Iceberg snapshot at or before timestamp $asOfMs " +
            s"(earliest is ${snapshots.filter(s => ancestry.contains(s.id))
              .map(_.timestampMs).minOption.getOrElse(-1L)})")
      eligible.maxBy(s => (s.timestampMs, s.id))
    }

    def fieldById(id: Int): Field =
      fields.find(_.id == id).getOrElse(
        throw new IllegalArgumentException(s"Iceberg schema has no field id $id"))

    /** Resolve a ref name to its snapshot. `main` is the implicit branch
      * over `current-snapshot-id`; every other name must exist in `refs`.
      */
    def snapshotByRef(name: String): Snapshot =
      if (name == MainBranch)
        currentSnapshot.getOrElse(throw new IllegalArgumentException(
          "ref 'main' on a table with no current snapshot"))
      else snapshotById(refs.getOrElse(name,
        throw new IllegalArgumentException(
          s"Iceberg ref '$name' not found (have ${refs.keys.toSeq.sorted.mkString(", ")})")).snapshotId)
  }

  /** The implicit branch name for the table's current state. */
  val MainBranch = "main"

  /** Partition-pruning predicate. `column` may name either the partition
    * FIELD or its SOURCE column (hidden partitioning: the user filters
    * `ts = X` without knowing the table is day(ts)-partitioned); values
    * are SOURCE-typed literals — planning evaluates the partition
    * transform on them ([[IcebergTransforms]]) before comparing against
    * manifest summaries and entry tuples.
    */
  sealed trait PartitionPredicate { def column: String }

  /** `column = value`. */
  final case class PartitionEquals(column: String, value: Any)
    extends PartitionPredicate

  /** `column IN (values)` — the multi-value shape a dim-driven fact scan
    * produces ("these three months", "these two event types"): manifests
    * survive if ANY value could be inside their summaries, entries if
    * their tuple matches ANY value.
    */
  final case class PartitionIn(column: String, values: Set[Any])
    extends PartitionPredicate {
    require(values.nonEmpty, "PartitionIn needs at least one value")
  }

  final case class DataFile(
      path: String,
      format: String,
      partition: Map[String, Any],
      recordCount: Long,
      fileSizeBytes: Long,
      // v2 merge-on-read fields; zero/empty on v1 entries
      content: Int = 0, // 0=data, 1=position deletes, 2=equality deletes
      sequenceNumber: Long = 0L,
      equalityIds: Seq[Int] = Nil,
      // the partition spec this file was written under (inherited from
      // its manifest's recorded spec id at planning time) — mixed-spec
      // tables read each file with its own directory-layout rules
      specId: Int = 0,
      // per-column min/max (spec lower_bounds/upper_bounds: field id ->
      // single-value binary), harvested from the parquet footers at
      // write time — the data-skipping layer UNDER partition pruning:
      // a range-clustered (sorted / Z-ordered) table skips whole files
      // a partition tuple alone never could
      lowerBounds: Map[Int, Array[Byte]] = Map.empty,
      upperBounds: Map[Int, Array[Byte]] = Map.empty)

  /** File-level data-skipping predicate for [[planScan]]: `column op
    * value` decided against each data file's recorded column bounds.
    * `op`: "eq" | "lt" | "lteq" | "gt" | "gteq". Files without bounds
    * for the column are kept (conservative); the caller applies the
    * residual row filter either way — skipping is a scan optimization,
    * never a semantic one.
    */
  final case class ColumnBound(column: String, op: String, value: Any) {
    require(Set("eq", "lt", "lteq", "gt", "gteq")(op),
      s"unsupported bound op '$op'")
  }

  /** A live v2 delete file the scan must apply (merge-on-read). */
  final case class DeleteFile(
      path: String,
      format: String,
      content: Int, // 1=position, 2=equality
      equalityIds: Seq[Int],
      sequenceNumber: Long,
      recordCount: Long)

  /** Scan plan + the pruning evidence the specs pin. `deletes` carries
    * the live v2 delete files whose rows must be subtracted from `files`
    * (position: seq >= data seq; equality: seq > data seq — spec scoping
    * is applied by the reader, not here).
    */
  final case class ScanPlan(
      files: Seq[DataFile],
      manifestsTotal: Int,
      manifestsRead: Int,
      entriesSeen: Int,
      deletes: Seq[DeleteFile] = Seq.empty,
      // data files a [[ColumnBound]] file filter skipped via min/max
      filesSkipped: Int = 0)

  // ---------------------------------------------------------------------
  // metadata JSON
  // ---------------------------------------------------------------------

  private val mapper = new ObjectMapper()

  /** Table property marking every data/eq-delete parquet as carrying spec
    * field ids in its footer (the parquet `field_id` attribute). Set at
    * table creation by this repo's writer; absent on foreign tables and
    * on tables created before the writer stamped ids — those read
    * name-based exactly as they always did.
    */
  val FieldIdsProperty = "graft.parquet-field-ids"

  def metadataDir(tablePath: String): Path = Paths.get(tablePath, "metadata")

  /** True when the table has a real metadata layer (vs. bare data dir). */
  def hasMetadata(tablePath: String): Boolean =
    IcebergSource.versionHint(tablePath).exists(v =>
      Files.exists(metadataDir(tablePath).resolve(s"v$v.metadata.json")))

  /** The current metadata json, parsed — for views that need sections
    * the TableMeta model doesn't carry (e.g. snapshot-log for the
    * history metadata table).
    */
  def metadataJson(tablePath: String): JsonNode = {
    val version = IcebergSource.versionHint(tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"Iceberg table has no metadata/version-hint.text: $tablePath"))
    mapper.readTree(Files.readString(
      metadataDir(tablePath).resolve(s"v$version.metadata.json")))
  }

  /** Probe-facing: how many times [[load]] has parsed table metadata in
    * this process. On local NVMe each load is milliseconds; on an object
    * store each is round-trips — the per-step load COUNT is the number
    * the floor probes track (see ScaleProbe `stepfloor`).
    */
  val loadCount = new java.util.concurrent.atomic.AtomicLong(0L)

  def load(tablePath: String): TableMeta = {
    loadCount.incrementAndGet(): Unit
    val version = IcebergSource.versionHint(tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"Iceberg table has no metadata/version-hint.text: $tablePath"))
    val file = metadataDir(tablePath).resolve(s"v$version.metadata.json")
    require(Files.exists(file), s"Iceberg metadata file missing: $file")
    val node = mapper.readTree(Files.readString(file))

    val formatVersion = node.path("format-version").asInt(1)
    require(
      formatVersion == 1 || formatVersion == 2,
      s"Unsupported Iceberg format-version $formatVersion (spec v1/v2 only)")

    // Prefer the modern schemas/current-schema-id shape; fall back to the
    // v1-required singular "schema". ALL schemas are retained (keyed by
    // schema-id) so time-travel can resolve the schema a snapshot logged.
    def parseFields(schemaNode: JsonNode): Seq[Field] =
      schemaNode.path("fields").elements().asScala.map { f =>
        val t = f.path("type")
        // primitive-element lists fold into the textual `list<elem[!]>`
        // encoding [[IcebergWriter.icebergType]] emits for the same
        // shape, so the Field model (and every typeName comparison on
        // it) stays a flat string; deeper nesting is still refused
        val typeName =
          if (t.isTextual) t.asText()
          else if (t.path("type").asText() == "list" &&
              t.path("element").isTextual) {
            val bang =
              if (t.path("element-required").asBoolean(false)) "!" else ""
            s"list<${t.path("element").asText()}$bang>"
          } else throw new IllegalArgumentException(
            s"Nested Iceberg types not supported: ${f.path("name").asText()}")
        Field(
          f.path("id").asInt(),
          f.path("name").asText(),
          f.path("required").asBoolean(false),
          typeName)
      }.toSeq
    // HISTORICAL schemas parse leniently: a nested type in a schema the
    // table no longer uses must not make the whole table unreadable —
    // the entry is dropped and time-travel for snapshots logging it falls
    // back to the current schema. The CURRENT schema still parses
    // strictly below (an unsupported current schema IS an error).
    val schemasById: Map[Int, Seq[Field]] =
      node.path("schemas").elements().asScala
        .flatMap(s => scala.util.Try(
          s.path("schema-id").asInt(-1) -> parseFields(s)).toOption)
        .filter(_._1 >= 0)
        .toMap
    val currentSchemaId =
      if (node.has("current-schema-id")) node.path("current-schema-id").asInt() else 0
    val fields =
      if (node.has("schemas") && node.has("current-schema-id")) {
        // strict re-parse of the selected entry: lenient dropping above
        // must not silently hide an unsupported CURRENT schema
        node.path("schemas").elements().asScala
          .find(_.path("schema-id").asInt(-1) == currentSchemaId)
          .map(parseFields)
          .getOrElse(throw new IllegalArgumentException(
            s"current-schema-id $currentSchemaId not present in schemas list: $file"))
      } else parseFields(node.path("schema"))
    // a structurally-valid json with no schema would otherwise flow
    // through as an empty-schema table and fail far away (every append
    // "mismatches"); name the file and its content here instead
    require(fields.nonEmpty,
      s"Iceberg metadata $file parsed with an empty schema — " +
        s"content head: ${Files.readString(file).take(200)}")

    def parseSpecFields(fieldsNode: JsonNode): Seq[PartitionField] =
      fieldsNode.elements().asScala.map { f =>
        PartitionField(
          f.path("name").asText(),
          f.path("source-id").asInt(),
          f.path("transform").asText())
      }.toSeq
    // ALL specs are retained (keyed by spec-id) so a manifest written
    // under an older spec prunes/lays-out via ITS spec, not the default.
    val specsById: Map[Int, Seq[PartitionField]] =
      if (node.has("partition-specs"))
        node.path("partition-specs").elements().asScala
          .map(s => s.path("spec-id").asInt(0) -> parseSpecFields(s.path("fields")))
          .toMap
      else Map.empty
    val defaultSpecId =
      if (node.has("default-spec-id")) node.path("default-spec-id").asInt() else 0
    val partitionFields =
      if (node.has("partition-specs") && node.has("default-spec-id")) {
        specsById.getOrElse(defaultSpecId,
          throw new IllegalArgumentException(
            s"default-spec-id $defaultSpecId not present in partition-specs: $file"))
      } else parseSpecFields(node.path("partition-spec"))

    val snapshots = node.path("snapshots").elements().asScala.map { s =>
      Snapshot(
        s.path("snapshot-id").asLong(),
        if (s.has("parent-snapshot-id")) Some(s.path("parent-snapshot-id").asLong()) else None,
        s.path("timestamp-ms").asLong(),
        s.path("manifest-list").asText(),
        // the summary (and its operation) is OPTIONAL in spec v1 — keep
        // the absence visible ("unknown"), because planAppends' window
        // classification is load-bearing: defaulting a summary-less
        // compaction to "append" would re-emit its rewritten corpus
        s.path("summary").path("operation").asText("unknown"),
        if (s.has("schema-id")) Some(s.path("schema-id").asInt()) else None,
        s.path("sequence-number").asLong(0L),
        if (s.has("summary"))
          s.path("summary").properties().asScala
            .map(e => e.getKey -> e.getValue.asText()).toMap
        else Map.empty)
    }.toSeq

    val current =
      if (node.has("current-snapshot-id") && node.path("current-snapshot-id").asLong() != -1L)
        Some(node.path("current-snapshot-id").asLong())
      else None

    val properties: Map[String, String] =
      if (node.has("properties")) {
        val p = node.path("properties")
        p.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      } else Map.empty

    // named refs (spec §Refs). A stored `main` entry (other writers
    // persist it; this writer keeps main implicit) is dropped here —
    // current-snapshot-id is authoritative for main either way.
    val refs: Map[String, Ref] =
      if (node.has("refs"))
        node.path("refs").properties().asScala.map { e =>
          e.getKey -> Ref(
            e.getValue.path("snapshot-id").asLong(),
            e.getValue.path("type").asText("branch"))
        }.toMap - MainBranch
      else Map.empty

    // default sort order's identity columns (lenient: unsupported
    // transforms or dead field ids just yield an empty order)
    val sortCols: Seq[String] =
      if (!node.has("sort-orders")) Nil
      else {
        val defId = node.path("default-sort-order-id").asInt(0)
        node.path("sort-orders").elements().asScala
          .find(_.path("order-id").asInt(-1) == defId)
          .map { so =>
            val fs = so.path("fields").elements().asScala.toSeq
            val resolved = fs.flatMap { f =>
              if (f.path("transform").asText("") != "identity") None
              else fields.find(_.id == f.path("source-id").asInt(-1)).map(_.name)
            }
            // a partially-resolvable order is NOT this order — clustering
            // by a prefix would claim a layout the metadata doesn't mean
            if (resolved.size == fs.size) resolved else Nil
          }
          .getOrElse(Nil)
      }

    TableMeta(Paths.get(tablePath), formatVersion, fields, partitionFields,
      current, snapshots, schemasById, currentSchemaId,
      node.path("last-sequence-number").asLong(0L), properties,
      if (specsById.nonEmpty) specsById else Map(0 -> partitionFields),
      defaultSpecId, refs, version, sortCols)
  }

  // ---------------------------------------------------------------------
  // scan planning (manifest list -> manifests -> live files)
  // ---------------------------------------------------------------------

  def planScan(
      meta: TableMeta,
      snapshot: Snapshot,
      prune: Option[PartitionPredicate] = None,
      fileFilter: Seq[ColumnBound] = Nil): ScanPlan = {
    // Resolve each file filter ONCE: column -> (field id, iceberg type).
    // Unknown column = error (a typo'd filter must not silently read
    // everything); a file lacking bounds for a column is kept for it.
    // A column of a type this planner cannot COMPARE bounds for
    // (decimal, naive timestamp, ...) is dropped from the skip set
    // instead — skipping is an optimization, and the caller's residual
    // row filter makes the conservative keep correct; failing the whole
    // scan over an undecidable optimization would make a readable table
    // unreadable. Multiple bounds AND together — a Z-order point lookup
    // skips on both dimensions at once.
    val boundFields: Seq[(Int, String, ColumnBound)] = fileFilter.flatMap { fb =>
      val f = meta.fields.find(_.name == fb.column).getOrElse(
        throw new IllegalArgumentException(
          s"'${fb.column}' is not a column of the table schema"))
      if (comparableBoundTypes(f.typeName)) Some((f.id, f.typeName, fb))
      else None
    }
    var filesSkipped = 0
    def fileSurvives(df: DataFile): Boolean = {
      val keep = boundFields.forall { case (fid, typeName, fb) =>
        (df.lowerBounds.get(fid), df.upperBounds.get(fid)) match {
          case (Some(lo), Some(hi)) =>
            val cmpLo = compareBound(typeName, fb.value, lo) // value vs lower
            val cmpHi = compareBound(typeName, fb.value, hi) // value vs upper
            fb.op match {
              case "eq"   => cmpLo >= 0 && cmpHi <= 0
              case "lt"   => cmpLo > 0  // some row < value iff lower < value
              case "lteq" => cmpLo >= 0
              case "gt"   => cmpHi < 0  // some row > value iff upper > value
              case "gteq" => cmpHi <= 0
            }
          case _ => true // no recorded bounds: cannot skip on this column
        }
      }
      if (!keep) filesSkipped += 1
      keep
    }
    // Pre-resolve the predicate PER PARTITION SPEC (spec evolution: a
    // manifest prunes via the spec it was written under, not the
    // default). A spec that has no field for the predicate column cannot
    // prune — its manifests are read in full, which is the conservative-
    // correct answer for pre-evolution data; the caller applies the
    // residual row filter. A column matching NO spec at all is an error,
    // not a silent full scan. The predicate literal is transformed once
    // per spec (day/month/bucket/truncate math); downstream comparisons
    // are in transformed space, typed by the transform's result type.
    def resolveIn(specFields: Seq[PartitionField], p: PartitionPredicate)
        : Option[(Int, PartitionField, Seq[Any], String)] = {
      val idx = specFields.indexWhere(pf =>
        pf.name == p.column ||
          meta.fields.find(_.id == pf.sourceId).exists(_.name == p.column))
      if (idx < 0) None
      else {
        val pf = specFields(idx)
        // a HISTORICAL spec can reference a source column later dropped
        // from the schema; per this function's own contract that spec
        // "cannot prune — its manifests are read in full", so resolve
        // leniently instead of letting fieldById throw mid-plan
        val sourceField = meta.fields.find(_.id == pf.sourceId)
        if (sourceField.isEmpty) return None
        val sourceType = sourceField.get.typeName
        val raw = p match {
          case PartitionEquals(_, v) => Seq(v)
          case PartitionIn(_, vs) => vs.toSeq
        }
        val transformed = raw.map(v =>
          if (v == null) null else IcebergTransforms(pf.transform, sourceType, v))
          .distinct
        Some((idx, pf, transformed,
          IcebergTransforms.resultTypeName(pf.transform, sourceType)))
      }
    }
    prune.foreach { p =>
      require(meta.specsById.values.exists(sf => resolveIn(sf, p).isDefined),
        s"'${p.column}' is not a partition field or a partition source " +
          s"column in any of the table's specs " +
          s"(default spec has ${meta.partitionFields.map(_.name).mkString(", ")})")
    }
    val pruneBySpec = scala.collection.mutable.Map
      .empty[Int, Option[(Int, PartitionField, Seq[Any], String)]]
    def pruneFor(specId: Int): Option[(Int, PartitionField, Seq[Any], String)] =
      prune.flatMap(p =>
        pruneBySpec.getOrElseUpdate(specId, resolveIn(meta.specFields(specId), p)))

    val manifests = readManifestListFile(meta.root, snapshot.manifestList)
    var manifestsRead = 0
    var entriesSeen = 0
    val files = Seq.newBuilder[DataFile]
    val deletes = Seq.newBuilder[DeleteFile]
    manifests.foreach { mf =>
      val pruneField = pruneFor(mf.partitionSpecId)
      // Delete manifests are never pruned: an equality delete can remove
      // rows from ANY surviving partition, and a position delete for a
      // pruned-away file is a no-op — always applying live delete files
      // is conservative-correct; they are KB-scale relative to data.
      val survives = mf.content == 1 || pruneField.forall {
        case (idx, _, tvalues, ttype) =>
          tvalues.exists(tv => manifestMayContain(mf, idx, ttype, tv))
      }
      if (survives) {
        manifestsRead += 1
        readManifest(meta.root, mf.path, mf.addedSnapshotId, mf.sequenceNumber)
          .foreach { e =>
            entriesSeen += 1
            val live = e.status != 2 // DELETED files are not scanned (spec)
            if (live && e.dataFile.content != 0) {
              deletes += DeleteFile(
                e.dataFile.path, e.dataFile.format, e.dataFile.content,
                e.dataFile.equalityIds, e.dataFile.sequenceNumber,
                e.dataFile.recordCount)
            } else {
              val matches = pruneField.forall { case (_, pf, tvalues, _) =>
                tvalues.exists(tv =>
                  valueEquals(e.dataFile.partition.get(pf.name).orNull, tv))
              }
              if (live && matches && fileSurvives(e.dataFile))
                files += e.dataFile.copy(specId = mf.partitionSpecId)
            }
          }
      }
    }
    ScanPlan(files.result(), manifests.size, manifestsRead, entriesSeen,
      deletes.result(), filesSkipped)
  }

  /** One manifest_file row of a manifest list; also the writer's
    * carry-over unit (length + added_snapshot_id round-trip through it).
    * `content`/`sequenceNumber`/`minSequenceNumber` are the v2 fields
    * (0 on v1 lists): content 0 = data manifest, 1 = delete manifest.
    */
  private[sources] final case class ManifestFile(
      path: String,
      length: Long,
      addedSnapshotId: Long,
      summaries: Seq[(Boolean, Option[Array[Byte]], Option[Array[Byte]])],
      content: Int = 0,
      sequenceNumber: Long = 0L,
      minSequenceNumber: Long = 0L,
      partitionSpecId: Int = 0)

  /** One manifest_entry row; also the writer's delete-rewrite unit. */
  private[sources] final case class ManifestEntry(
      status: Int, snapshotId: Long, dataFile: DataFile)

  private[graft] def readManifestListFile(
      root: Path, listPath: String): Seq[ManifestFile] =
    readAvro(resolve(root, listPath)) { rec =>
      val summaries = Option(rec.get("partitions")) match {
        case Some(arr: java.util.Collection[_]) =>
          arr.asScala.toSeq.map { s =>
            val r = s.asInstanceOf[GenericRecord]
            (
              r.get("contains_null").asInstanceOf[Boolean],
              Option(r.get("lower_bound")).map(toBytes),
              Option(r.get("upper_bound")).map(toBytes))
          }
        case _ => Seq.empty
      }
      def optField(name: String): Option[Any] =
        Option(rec.getSchema.getField(name)).flatMap(_ => Option(rec.get(name)))
      ManifestFile(
        rec.get("manifest_path").toString,
        rec.get("manifest_length").asInstanceOf[Long],
        Option(rec.get("added_snapshot_id")).map(_.asInstanceOf[Long]).getOrElse(0L),
        summaries,
        optField("content").map(_.asInstanceOf[Int]).getOrElse(0),
        optField("sequence_number").map(_.asInstanceOf[Long]).getOrElse(0L),
        optField("min_sequence_number").map(_.asInstanceOf[Long]).getOrElse(0L),
        optField("partition_spec_id").map(_.asInstanceOf[Int]).getOrElse(0))
    }

  /** `inheritSnapshotId`: v2 manifests may leave entry snapshot_id null,
    * to be inherited from the manifest list's added_snapshot_id (spec
    * "Snapshot ID inheritance") — callers that know the manifest's list
    * entry pass it so inherited ids resolve instead of defaulting to 0
    * and silently failing window-membership checks.
    */
  private[sources] def readManifest(
      root: Path,
      manifestPath: String,
      inheritSnapshotId: Long = 0L,
      inheritSequenceNumber: Long = 0L): Seq[ManifestEntry] =
    readAvro(resolve(root, manifestPath)) { rec =>
      val df = rec.get("data_file").asInstanceOf[GenericRecord]
      // v2 manifests carry data_file.content: 0=data, 1=position deletes,
      // 2=equality deletes (applied by the scan, see planScan/IcebergSource).
      val content = df.getSchema.getField("content") match {
        case null => 0
        case _    => Option(df.get("content")).map(_.asInstanceOf[Int]).getOrElse(0)
      }
      if (content < 0 || content > 2)
        throw new UnsupportedOperationException(
          s"Iceberg data_file.content=$content is not in the spec (0/1/2); " +
            "refusing to guess")
      val equalityIds: Seq[Int] = df.getSchema.getField("equality_ids") match {
        case null => Nil
        case _ => Option(df.get("equality_ids")) match {
          case Some(c: java.util.Collection[_]) =>
            c.asScala.toSeq.map(_.asInstanceOf[Number].intValue())
          case _ => Nil
        }
      }
      // v2 sequence-number inheritance (spec "Sequence Number Inheritance"):
      // a null entry sequence number resolves to the manifest list entry's
      // sequence_number — without it every ADDED entry would read as seq 0
      // and delete scoping would misapply
      val seq = rec.getSchema.getField("sequence_number") match {
        case null => inheritSequenceNumber
        case _ => Option(rec.get("sequence_number")).map(_.asInstanceOf[Long])
          .getOrElse(inheritSequenceNumber)
      }
      val partition = df.get("partition").asInstanceOf[GenericRecord]
      val pmap = partition.getSchema.getFields.asScala.map { f =>
        f.name() -> fromAvro(partition.get(f.pos()))
      }.toMap
      // spec lower_bounds/upper_bounds: array of (key: field id, value:
      // single-value binary) — absent on pre-bounds manifests
      def boundsMap(field: String): Map[Int, Array[Byte]] =
        df.getSchema.getField(field) match {
          case null => Map.empty
          case _ => Option(df.get(field)) match {
            case Some(c: java.util.Collection[_]) =>
              c.asScala.map { e =>
                val r = e.asInstanceOf[GenericRecord]
                r.get("key").asInstanceOf[Number].intValue() ->
                  toBytes(r.get("value"))
              }.toMap
            case _ => Map.empty
          }
        }
      ManifestEntry(
        rec.get("status").asInstanceOf[Int],
        Option(rec.get("snapshot_id")).map(_.asInstanceOf[Long])
          .getOrElse(inheritSnapshotId),
        DataFile(
          df.get("file_path").toString,
          df.get("file_format").toString,
          pmap,
          df.get("record_count").asInstanceOf[Long],
          df.get("file_size_in_bytes").asInstanceOf[Long],
          content,
          seq,
          equalityIds,
          lowerBounds = boundsMap("lower_bounds"),
          upperBounds = boundsMap("upper_bounds")))
    }

  /** Incremental scan plan: the NET APPENDS of a snapshot window — files
    * whose manifest entry was ADDED by a snapshot in (from, to] and that
    * are still live at `to` (a file appended and then deleted inside the
    * window has status DELETED at `to` and is correctly absent). This is
    * the daily-ingest primitive at 100 TB: process only what landed
    * since the last run, planned entirely from KB-scale metadata —
    * no diff of file listings, no reprocessing of the corpus.
    *
    * The window is resolved by ANCESTRY (to -> parent-snapshot-id -> ...
    * -> from), never id arithmetic: spec snapshot ids are RANDOM longs,
    * so numeric comparison would return arbitrary subsets on any table
    * this writer didn't produce. `fromExclusive = 0` means "from the
    * beginning"; a `from` that is not an ancestor of `to` (typo, swapped
    * window, diverged branch) REFUSES instead of silently misleading.
    * Manifests whose added_snapshot_id is outside the window are skipped
    * without being opened (a manifest can only reference its own or
    * ancestor snapshots), so a years-old table's incremental read opens
    * ~the window's manifests, not the whole history.
    */
  def planAppends(
      meta: TableMeta,
      fromExclusive: Long,
      to: Snapshot): ScanPlan = {
    // fromExclusive == 0 means "everything": every live file is an append
    // since the beginning — no ancestry needed, which also sidesteps
    // expired-history tables whose surviving snapshots keep a dangling
    // parent-snapshot-id (Iceberg's expireSnapshots does exactly that).
    if (fromExclusive == 0L) return planScan(meta, to)

    // Resolve the window by walking ancestry; a dangling parent (expired
    // history) ends the walk without reaching `from` and refuses below.
    val windowIds = scala.collection.mutable.Set.empty[Long]
    var cursor: Option[Snapshot] = Some(to)
    while (cursor.exists(_.id != fromExclusive)) {
      // corrupt metadata can cycle parent-snapshot-id; windowIds doubles
      // as the visited set so the walk refuses instead of spinning forever
      require(windowIds.add(cursor.get.id),
        s"parent-snapshot-id ancestry of snapshot ${to.id} cycles at " +
          s"${cursor.get.id} — metadata is corrupt; refusing to plan")
      cursor = cursor.get.parentId.flatMap(id => meta.snapshots.find(_.id == id))
    }
    require(cursor.isDefined,
      s"from-snapshot $fromExclusive is not a reachable ancestor of " +
        s"snapshot ${to.id} (typo'd id, swapped window bounds, or expired " +
        "history) — refusing to guess an increment")
    // Only APPEND snapshots contribute new data, and only APPEND/DELETE
    // snapshots preserve provenance: a delete-rewrite keeps kept entries'
    // adding-snapshot ids (EXISTING entries retain them per spec), but a
    // compaction/replace/overwrite REWRITES files under its own id —
    // in-window appends swallowed by a later in-window replace would be
    // silently LOST from this plan (only `to`'s manifest list is read),
    // and the replace's own ADDED entries would double-count pre-window
    // data. Neither silent failure is acceptable: refuse, pointing at a
    // full scan. A summary-less snapshot ("unknown") is treated the same
    // — guessing "append" would re-emit a compacted corpus as new.
    // A MANIFEST rewrite (IcebergWriter.rewriteManifests) also commits as
    // "replace", but it moves no data: entries are carried as EXISTING
    // with their original snapshot ids and explicit sequence numbers, so
    // append provenance survives and the window may cross it. The
    // summary marker is this writer's own; foreign replaces still refuse.
    def manifestsOnly(s: Snapshot): Boolean =
      s.operation == "replace" &&
        s.summary.get("graft.manifests-only").contains("true")
    val unsafe = windowIds.map(meta.snapshotById)
      .filter(s => s.operation != "append" && s.operation != "delete" &&
        !manifestsOnly(s))
    if (unsafe.nonEmpty)
      throw new UnsupportedOperationException(
        s"snapshot window (${fromExclusive}, ${to.id}] contains " +
          s"non-append/delete operations ${unsafe.map(s => s"${s.id}:${s.operation}").mkString(", ")} " +
          "that destroy append provenance (compaction/replace/overwrite or " +
          "missing summary) — an incremental window cannot be computed; " +
          "use a full scan of `to` instead")
    val appendIds = windowIds.filter(id => meta.snapshotById(id).operation == "append")

    val manifests = readManifestListFile(meta.root, to.manifestList)
    var manifestsRead = 0
    var entriesSeen = 0
    val files = Seq.newBuilder[DataFile]
    manifests.foreach { mf =>
      // A manifest written before the window can only reference pre-window
      // snapshots — skip unopened. One written IN the window (append OR a
      // delete/replace rewrite, which can carry kept in-window entries)
      // must be read. 0 = added_snapshot_id unknown: open conservatively.
      val mayContribute =
        mf.addedSnapshotId == 0L || windowIds.contains(mf.addedSnapshotId)
      if (mayContribute) {
        // a v2 delete manifest IN the window can subtract rows from data
        // files appended in the same window (position deletes apply at
        // seq >= data seq) — a net-appends plan that ignored it would
        // over-report, and one that applied it is no longer "appends".
        // Pre-window delete manifests are provably inert here (their
        // seq <= from's seq < every in-window data seq, and both delete
        // kinds only reach data with seq <= / < theirs), so only the
        // in-window ones refuse.
        if (mf.content == 1) {
          // A manifest rewrite re-adds PRE-window delete manifests under
          // its own (in-window) snapshot id. Those are provably inert —
          // both delete kinds only reach data files with seq <= / <
          // theirs, and every in-window data seq exceeds from's — so a
          // carried manifest whose entries all sit at or below from's
          // sequence is skipped instead of refusing. Anything that might
          // hold an in-window delete still refuses.
          val fromSeq = meta.snapshotById(fromExclusive).sequenceNumber
          val inert = fromSeq > 0L &&
            readManifest(meta.root, mf.path, mf.addedSnapshotId, mf.sequenceNumber)
              .forall(e => e.status == 2 || e.dataFile.sequenceNumber <= fromSeq)
          if (!inert)
            throw new UnsupportedOperationException(
              s"snapshot window (${fromExclusive}, ${to.id}] contains delete " +
                s"manifest ${mf.path} (v2 merge-on-read); net appends cannot " +
                "be computed — use a full scan of `to` instead")
        } else {
        manifestsRead += 1
        readManifest(meta.root, mf.path, mf.addedSnapshotId, mf.sequenceNumber)
          .foreach { e =>
          entriesSeen += 1
          if (e.status != 2) {
            // spec puts delete files only in content=1 manifests; a
            // malformed mix must not be emitted as appended data rows
            if (e.dataFile.content != 0)
              throw new UnsupportedOperationException(
                s"manifest ${mf.path} mixes delete files into a data " +
                  "manifest; refusing to compute net appends")
            // an entry with no snapshot provenance (null at both the entry
            // and manifest-list level) cannot be windowed — refusing beats
            // silently dropping what the conservative open tried to keep
            if (e.snapshotId == 0L)
              throw new UnsupportedOperationException(
                s"manifest ${mf.path} carries entries without snapshot " +
                  "provenance (no snapshot_id, no added_snapshot_id); an " +
                  "incremental window cannot be computed — use a full scan")
            if (appendIds.contains(e.snapshotId)) files += e.dataFile
          }
        }
        }
      }
    }
    ScanPlan(files.result(), manifests.size, manifestsRead, entriesSeen)
  }

  /** Field-summary check: can this manifest contain partition==value?
    * `value` is already TRANSFORMED and `typeName` is the transform's
    * result type — summary bounds are single-value binaries of the
    * stored partition values (int/long little-endian, string UTF-8).
    * A manifest with no summaries must be read.
    */
  private def manifestMayContain(
      mf: ManifestFile,
      fieldIdx: Int,
      typeName: String,
      value: Any): Boolean = {
    if (mf.summaries.isEmpty || fieldIdx >= mf.summaries.size) return true
    val (containsNull, lower, upper) = mf.summaries(fieldIdx)
    if (value == null) return containsNull
    (lower, upper) match {
      case (Some(lo), Some(hi)) =>
        compareBound(typeName, value, lo) >= 0 && compareBound(typeName, value, hi) <= 0
      case _ => true // unknown bounds: must read
    }
  }

  /** compare(value, boundBytes) for the supported primitive types. */
  private def compareBound(typeName: String, value: Any, bound: Array[Byte]): Int =
    typeName match {
      case "int" =>
        java.lang.Integer.compare(
          value.asInstanceOf[Number].intValue(),
          ByteBuffer.wrap(bound).order(ByteOrder.LITTLE_ENDIAN).getInt)
      case "long" =>
        // type promotion (int -> long) is metadata-only: files written
        // before the promote keep 4-byte int bounds — decode by LENGTH,
        // not by the current schema's width (getLong on 4 bytes throws)
        val stored =
          if (bound.length == 4)
            ByteBuffer.wrap(bound).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong
          else ByteBuffer.wrap(bound).order(ByteOrder.LITTLE_ENDIAN).getLong
        java.lang.Long.compare(value.asInstanceOf[Number].longValue(), stored)
      case "string" =>
        // spec order for string bounds is UNSIGNED BYTE-WISE comparison of
        // the UTF-8 single-value binary (== code-point order) — Java
        // String.compareTo is UTF-16 code-unit order, which sorts
        // supplementary-plane characters (surrogates 0xD800-0xDFFF) below
        // U+E000..U+FFFF and would prune manifests that hold matches
        java.util.Arrays.compareUnsigned(
          value.toString.getBytes(StandardCharsets.UTF_8), bound)
      case "date" =>
        val days = value match {
          case d: java.time.LocalDate => d.toEpochDay.toInt
          case d: java.sql.Date       => d.toLocalDate.toEpochDay.toInt
          case n: Number              => n.intValue()
          case other => throw new IllegalArgumentException(
            s"date bound value of unsupported class ${other.getClass}")
        }
        java.lang.Integer.compare(days,
          ByteBuffer.wrap(bound).order(ByteOrder.LITTLE_ENDIAN).getInt)
      case "timestamptz" =>
        def instantMicros(i: java.time.Instant): Long =
          Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
            i.getNano / 1000L)
        val micros = value match {
          case t: java.sql.Timestamp  => instantMicros(t.toInstant)
          case i: java.time.Instant   => instantMicros(i)
          case n: Number              => n.longValue()
          case other => throw new IllegalArgumentException(
            s"timestamp bound value of unsupported class ${other.getClass}")
        }
        java.lang.Long.compare(micros,
          ByteBuffer.wrap(bound).order(ByteOrder.LITTLE_ENDIAN).getLong)
      case "double" =>
        // float -> double promotion: old files keep 4-byte float bounds
        val stored =
          if (bound.length == 4)
            ByteBuffer.wrap(bound).order(ByteOrder.LITTLE_ENDIAN)
              .getFloat.toDouble
          else ByteBuffer.wrap(bound).order(ByteOrder.LITTLE_ENDIAN).getDouble
        java.lang.Double.compare(value.asInstanceOf[Number].doubleValue(), stored)
      case "float" =>
        java.lang.Float.compare(value.asInstanceOf[Number].floatValue(),
          ByteBuffer.wrap(bound).order(ByteOrder.LITTLE_ENDIAN).getFloat)
      case other =>
        throw new UnsupportedOperationException(
          s"Partition bound comparison for type '$other' not supported")
    }

  /** Types [[compareBound]] can decode and order; anything else keeps
    * its files conservatively instead of crashing the plan.
    */
  private val comparableBoundTypes: Set[String] =
    Set("int", "long", "string", "date", "timestamptz", "double", "float")

  private[sources] def valueEquals(stored: Any, wanted: Any): Boolean = {
    // Date/timestamp literals normalize to the spec's STORED encodings
    // (epoch-days int / epoch-micros long) before comparing: an
    // identity-partitioned date/timestamptz column stores a plain number
    // in the manifest, and a toString comparison of Integer(19723) vs
    // Date("2024-01-01") would silently match nothing.
    def norm(v: Any): Any = v match {
      case d: java.time.LocalDate => java.lang.Long.valueOf(d.toEpochDay)
      case d: java.sql.Date =>
        java.lang.Long.valueOf(d.toLocalDate.toEpochDay)
      case i: java.time.Instant =>
        java.lang.Long.valueOf(Math.addExact(
          Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
      case t: java.sql.Timestamp =>
        norm(t.toInstant)
      case other => other
    }
    (norm(stored), norm(wanted)) match {
      case (null, null)               => true
      case (null, _) | (_, null)      => false
      case (a: Number, b: Number)     =>
        // longValue() on both sides would truncate fractional values
        // (1.9 "equals" stored 1 — wrong pruning on float/double
        // partitions of foreign tables); compare in double space when
        // either side is fractional, exactly otherwise
        def fractional(n: Number) = n match {
          case _: java.lang.Double | _: java.lang.Float |
               _: java.math.BigDecimal | _: scala.math.BigDecimal => true
          case _ => false
        }
        if (fractional(a) || fractional(b)) a.doubleValue() == b.doubleValue()
        else a.longValue() == b.longValue()
      case (a, b)                     => a.toString == b.toString
    }
  }

  // ---------------------------------------------------------------------
  // helpers
  // ---------------------------------------------------------------------

  private[sources] def readAvro[T](file: Path)(f: GenericRecord => T): Seq[T] = {
    require(Files.exists(file), s"Iceberg avro metadata file missing: $file")
    val reader = new DataFileReader[GenericRecord](
      file.toFile, new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.map(f).toList
    finally reader.close()
  }

  /** Manifests reference absolute URIs per spec; tolerate repo-relative
    * paths (fixture tables move with the checkout).
    */
  private def resolve(root: Path, path: String): Path = {
    val stripped = path.stripPrefix("file:")
    val p = Paths.get(stripped)
    if (p.isAbsolute) p else root.resolve(stripped)
  }

  private def toBytes(v: Any): Array[Byte] = v match {
    case b: ByteBuffer =>
      val copy = new Array[Byte](b.remaining()); b.duplicate().get(copy); copy
    case a: Array[Byte] => a
    case other => throw new IllegalStateException(s"Unexpected bound type: $other")
  }

  private def fromAvro(v: Any): Any = v match {
    case u: org.apache.avro.util.Utf8 => u.toString
    case other                        => other
  }

  /** Iceberg primitive -> Spark type (for empty scans and column
    * reordering; inverse of [[IcebergWriter.icebergType]]).
    */
  def sparkSchema(meta: TableMeta): StructType = sparkSchema(meta.fields)

  def sparkSchema(fields: Seq[Field]): StructType =
    sparkSchema(fields, withFieldIds = false)

  /** `withFieldIds = true` attaches each field's spec id as
    * `parquet.field.id` StructField metadata. With
    * `spark.sql.parquet.fieldId.read.enabled` (set by the read path)
    * Spark's parquet reader then resolves columns BY ID instead of by
    * name — which is what makes a renamed column read its old files'
    * values, and a dropped-then-readded column (fresh id) read old files
    * as null instead of resurrecting the dropped values. Only used for
    * tables whose files are id-stamped ([[TableMeta.fieldIdStamped]]);
    * elsewhere the metadata-less schema keeps name resolution.
    */
  def sparkSchema(fields: Seq[Field], withFieldIds: Boolean): StructType =
    StructType(sparkSchema0(fields).map { case (f, id) =>
      if (!withFieldIds) f
      else f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata).putLong("parquet.field.id", id.toLong).build())
    })

  private def sparkSchema0(fields: Seq[Field]): Seq[(StructField, Int)] =
    fields.map { f =>
      (StructField(f.name, sparkType(f.typeName), nullable = !f.required),
        f.id)
    }

  private def sparkType(typeName: String): org.apache.spark.sql.types.DataType =
    typeName match {
      case "boolean"     => BooleanType
      case "int"         => IntegerType
      case "long"        => LongType
      case "float"       => FloatType
      case "double"      => DoubleType
      case "string"      => StringType
      case "date"        => DateType
      case "timestamptz" => TimestampType
      case "binary"      => BinaryType
      case dec if dec.startsWith("decimal(") =>
        val Array(p, s) = dec.stripPrefix("decimal(").stripSuffix(")").split(",").map(_.trim.toInt)
        DecimalType(p, s)
      // the flat encoding parseFields folds a primitive-element list
      // into (`list<elem>` nullable element / `list<elem!>` required)
      case l if l.startsWith("list<") && l.endsWith(">") =>
        val inner0 = l.stripPrefix("list<").stripSuffix(">")
        val required = inner0.endsWith("!")
        val inner = if (required) inner0.dropRight(1) else inner0
        org.apache.spark.sql.types.ArrayType(
          sparkType(inner), containsNull = !required)
      case other =>
        throw new UnsupportedOperationException(s"Iceberg type '$other' not mapped")
    }
}
