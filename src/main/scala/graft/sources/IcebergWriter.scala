package graft.sources

import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Writes Iceberg format-v1 tables: real `vN.metadata.json`, Avro
  * manifest lists with partition field summaries, Avro manifests, and
  * parquet data files laid out `data/<col>=<value>/`.
  *
  * Purpose-built for fixtures and tests of [[IcebergMeta]]'s scan
  * planning (append snapshots, partition-delete snapshots, time-travel);
  * a production write path would go through `iceberg-spark-runtime`'s
  * committer (not present in this offline image). The format emitted is
  * the public spec's, not a private twin: field names and single-value
  * bound encodings follow iceberg.apache.org/spec so [[IcebergMeta]]
  * reading these tables is evidence it reads the real layout.
  *
  * Reference capability being built-to: crates/connectors/iceberg/src/
  * lib.rs:3-4 (declares snapshot/manifest support, ships a dir glob).
  */
object IcebergWriter extends org.apache.spark.internal.Logging {

  private val mapper = new ObjectMapper()

  /** One partition field of the table spec: `transform(source)` stored
    * under partition field `fieldName` (hidden partitioning — the data
    * files keep the SOURCE column; only identity drops it into the
    * directory layout). Writable transforms: identity, day/month/year
    * (date sources), truncate[W] (int/long/string), and — since round
    * 12 — `bucket[N]` over int/long/string sources (spec Murmur3 via
    * [[IcebergTransforms.bucket]]; other source types are refused).
    */
  final case class PartitionTransform(source: String, transform: String = "identity") {
    def fieldName: String =
      if (transform == "identity") source
      else s"${source}_${transform.takeWhile(_ != '[')}"
  }

  // Commit listeners: every successful snapshot commit (append, COW
  // delete, v2 delete files) reports the table path AFTER the version
  // hint flips — the hook GraftSession uses for write-through cache
  // invalidation (the reference's CDC-invalidation aspiration,
  // crates/cdc/src/lib.rs:9). Listener failures must not fail a commit
  // that is already durable: they are caught and logged.
  private val commitListeners =
    new java.util.concurrent.CopyOnWriteArrayList[String => Unit]()

  def addCommitListener(f: String => Unit): Unit =
    commitListeners.add(f): Unit

  private def notifyCommit(tablePath: String): Unit = {
    val it = commitListeners.iterator()
    while (it.hasNext) {
      try it.next()(tablePath)
      catch {
        case e: Exception =>
          System.err.println(
            s"[graft-iceberg] commit listener failed for $tablePath: ${e.getMessage}")
      }
    }
  }

  /** Append `df` as a new snapshot; one manifest per partition value
    * (identity transform on `partitionCol`) so manifest-summary pruning
    * has file-level granularity. Returns the new snapshot id.
    *
    * `formatVersion` applies only when CREATING a table (2 = v2 with
    * sequence-numbered snapshots, enabling the row-level delete ops
    * below); appends onto an existing table always write in the table's
    * recorded version.
    */
  def append(
      spark: SparkSession,
      tablePath: String,
      df: DataFrame,
      partitionCol: Option[String],
      timestampMs: Long,
      formatVersion: Int = 1): Long =
    appendPartitioned(spark, tablePath, df,
      partitionCol.map(PartitionTransform(_)), timestampMs, formatVersion)

  /** [[append]] with a transformed (hidden) partition spec — e.g.
    * `PartitionTransform("ts", "day")` lays out one file set per day of
    * `ts` while the data files keep the raw `ts` column, and reads prune
    * via the transform math in [[IcebergTransforms]].
    */
  def appendPartitioned(
      spark: SparkSession,
      tablePath: String,
      df: DataFrame,
      partition: Option[PartitionTransform],
      timestampMs: Long,
      formatVersion: Int = 1,
      // extra snapshot-summary entries (commit provenance — e.g. the
      // streaming sink's micro-batch id); "operation" is reserved
      summary: Map[String, String] = Map.empty): Long =
    appendPartitioned(spark, tablePath, df, partition.toSeq, timestampMs,
      formatVersion, summary)

  /** MULTI-FIELD flavor: `partitions` lays the table out by every listed
    * transform in order — e.g. `Seq(PartitionTransform("region"),
    * PartitionTransform("ts", "day"))` nests region=X/ts_day=N/ dirs,
    * the manifest partition tuples carry both values, and pruning works
    * on EITHER field ([[IcebergMeta.PartitionEquals]] resolves any
    * field of the spec). Empty = unpartitioned.
    */
  def appendPartitioned(
      spark: SparkSession,
      tablePath: String,
      df: DataFrame,
      partitions: Seq[PartitionTransform],
      timestampMs: Long,
      formatVersion: Int,
      summary: Map[String, String]): Long =
    appendImpl(spark, tablePath, df, partitions, timestampMs, formatVersion,
      summary, None)

  private def appendImpl(
      spark: SparkSession,
      tablePath: String,
      df: DataFrame,
      partitions: Seq[PartitionTransform],
      timestampMs: Long,
      formatVersion: Int,
      summary: Map[String, String],
      // Some(name): append onto that BRANCH instead of main — the new
      // snapshot's parent is the branch head and only the branch ref
      // advances; `current-snapshot-id` (what every main read sees) is
      // untouched. The write half of write-audit-publish;
      // [[fastForward]] is the publish half.
      branch: Option[String]): Long = {
    require(formatVersion == 1 || formatVersion == 2,
      s"formatVersion must be 1 or 2, got $formatVersion")
    require(partitions.map(_.fieldName).distinct.size == partitions.size,
      s"partition field names collide: ${partitions.map(_.fieldName).mkString(",")}")
    partitions.foreach(p =>
      require(p.transform == "identity" || !partitions.exists(q =>
        q != p && q.source == p.fieldName),
        s"partition field '${p.fieldName}' shadows another field's source"))
    val root = Paths.get(tablePath)
    Files.createDirectories(root.resolve("data"))
    Files.createDirectories(root.resolve("metadata"))

    val prior = if (IcebergMeta.hasMetadata(tablePath)) Some(IcebergMeta.load(tablePath)) else None
    val fv = prior.map(_.formatVersion).getOrElse(formatVersion)
    // ALL refusals happen here, before any side effect — a guard firing
    // after data files moved into data/ would leave orphans that
    // directory-based readers return as rows
    prior.foreach { m =>
      validateSchemaAgainstTable(m, df.schema, "Append")
      // the spec is carried forward verbatim, so an append laid out
      // differently would DIVERGE metadata from data (files with empty
      // partition tuples under a spec that prunes on 'band' silently
      // vanish from pruned reads) — refuse loudly instead. The whole
      // (name, transform, source) triple must match: name equality alone
      // would let an identity layout land under a spec claiming day(),
      // misrouting every pruned read.
      val specd = m.partitionFields
        .map(pf => (pf.name, pf.transform,
          m.fields.find(_.id == pf.sourceId).map(_.name).getOrElse("?")))
      val declared = partitions.map(p => (p.fieldName, p.transform, p.source))
      require(
        specd == declared,
        s"Append partitioning ${declared.mkString(",")} does not " +
          s"match the table's spec (" +
          (if (specd.isEmpty) "<none>" else specd.mkString(",")) + ")")
    }
    partitions.foreach(p => transformedSparkType(p, df.schema): Unit) // refuse unwritable transforms early
    // reserved summary key refused HERE, not in commitSnapshot: by the
    // time the commit-side backstop fires, data files are already placed
    require(!summary.contains("operation"),
      "summary key 'operation' is reserved")
    // branch appends need an existing table AND an existing branch ref —
    // tags are immutable by definition, and auto-creating a branch on
    // first write would turn every typo into a silent fork
    branch.foreach { b =>
      val m = prior.getOrElse(throw new IllegalArgumentException(
        s"branch append requires an existing table; $tablePath has no metadata"))
      require(m.refs.get(b).exists(_.refType == "branch"),
        s"ref '$b' is not an existing branch (createBranch first; " +
          "main-branch appends pass branch = None)")
    }
    // ---- data files (once; retries re-point metadata at them) ----------
    // the writer token keeps concurrent appends' files collision-free
    // even when both computed the same snapshot id before racing
    val token = newToken()
    val staging = Files.createTempDirectory("graft-iceberg-stage")
    val fieldIds = fieldIdsFor(prior, df.schema)
    val staged = stageDataFiles(df, partitions, staging, fieldIds)
    var written: Seq[(Map[String, Any], Path)] = null

    // ---- OPTIMISTIC COMMIT LOOP ----------------------------------------
    // Appends commute, so a lost race is retried: reload the table (the
    // conflict repair advances the hint to the latest committed
    // version), re-validate, rebuild manifests under the fresh snapshot
    // id, recommit. commitMetadataJson's create-new CAS on the version
    // file is the conflict detector; non-append write flavors surface
    // [[CommitConflictException]] to the caller instead (a merge built
    // on stale state must not silently re-apply).
    var attempt = 0
    var result = -1L
    try {
      while (result < 0) {
        attempt += 1
        val (prior2, fv2) =
          if (attempt == 1) (prior, fv)
          else {
            repairVersionHint(root)
            val p = if (IcebergMeta.hasMetadata(tablePath))
              Some(IcebergMeta.load(tablePath)) else None
            p.foreach(m => validateSchemaAgainstTable(m, df.schema, "Append"))
            // a concurrent schema evolution that changes the field-id
            // layout would make the staged footers lie: refuse
            require(fieldIdsFor(p, df.schema) == fieldIds,
              "table schema field ids changed during a concurrent commit; " +
                "retry the append against the evolved table")
            // same for a concurrent SPEC evolution: the staged files are
            // laid out under the OLD spec, and committing them stamped
            // with the new defaultSpecId would misroute every pruned
            // read — the exact divergence the attempt-1 gate refuses
            p.foreach { m =>
              val specd = m.partitionFields
                .map(pf => (pf.name, pf.transform,
                  m.fields.find(_.id == pf.sourceId).map(_.name).getOrElse("?")))
              val declared =
                partitions.map(pt => (pt.fieldName, pt.transform, pt.source))
              require(specd == declared,
                "table partition spec changed during a concurrent commit; " +
                  "retry the append against the evolved layout")
            }
            (p, p.map(_.formatVersion).getOrElse(formatVersion))
          }
        // base version from the SAME load the commit re-serializes — the
        // version number and its verbatim base can never diverge (a
        // fresh hint read here could observe a concurrent commit and mix
        // two table states into one snapshot)
        val baseVersion = prior2.map(_.loadedVersion)
        val snapshotId =
          prior2.flatMap(_.snapshots.map(_.id).maxOption).getOrElse(0L) + 1L
        if (written == null)
          written = placeDataFiles(root, staged, snapshotId, token)

        val partType = partitions.map(p =>
          p.fieldName -> transformedSparkType(p, df.schema))
        val newManifests = buildDataManifests(spark, root, written, partType,
          snapshotId, fv2, prior2.map(_.defaultSpecId).getOrElse(0), fieldIds,
          token)
        // carried manifests come from the head this commit extends: the
        // branch's when branch-appending, main's otherwise — the mechanism
        // that lets branch state accumulate without ever touching main
        val carried = prior2
          .flatMap(m => branch.map(m.snapshotByRef).orElse(m.currentSnapshot)
            .map(h => IcebergMeta.readManifestListFile(m.root, h.manifestList)))
          .getOrElse(Seq.empty)
        try {
          commitSnapshot(spark, root, df.schema, partitions, prior2,
            baseVersion, snapshotId, timestampMs, carried ++ newManifests,
            operation = "append", fv2, summary, branch, token)
          result = snapshotId
        } catch {
          case e: CommitConflictException =>
            // bounded, not unbounded: each lost race means some OTHER
            // writer committed, so progress is global and a livelocked
            // append means something is abandoning reservations — refuse
            // loudly after enough evidence. Linear backoff keeps a loser
            // from burning its attempts while the winner is still
            // between reserving the version file and flipping the hint
            // (the window where every retry re-targets the same version).
            if (attempt >= 20) throw e
            Thread.sleep(5L * attempt)
        }
      }
    } finally deleteRecursively(staging)
    // O(increment) statistics maintenance: an analyzed table keeps its
    // row count and per-column NDV sketches current through every append
    // (untracked tables pay nothing; see StatsCatalog.mergeIncrement).
    // Best-effort by design — the data committed above must never be
    // failed retroactively by a statistics pass
    if (graft.plans.StatsCatalog.tracked(tablePath)) {
      try graft.plans.StatsCatalog.mergeIncrement(spark, tablePath, Some(df))
      catch {
        case scala.util.control.NonFatal(e) =>
          logWarning(s"statistics merge for $tablePath failed after a " +
            s"successful append (${e.getMessage}); stats are now stale " +
            "until the next analyze")
      }
    }
    result
  }

  /** The ONE schema gate every write flavor (append / merge / upsert)
    * passes an incoming frame through: column names must match the table
    * schema in order; types must match exactly — name equality alone
    * would let a same-named column of a different type through, and the
    * parquet files would diverge from the metadata schema, surfacing
    * later as read failures or silent coercion; nullability may only
    * narrow (a non-nullable frame into a nullable field is safe, the
    * reverse would let nulls into a required column). `op` prefixes the
    * messages so refusals name their write flavor.
    */
  private def validateSchemaAgainstTable(
      meta: IcebergMeta.TableMeta,
      schema: StructType,
      op: String): Unit = {
    require(meta.fields.map(_.name) == schema.fieldNames.toSeq,
      s"$op schema ${schema.fieldNames.mkString(",")} does not match " +
        s"table schema ${meta.fields.map(_.name).mkString(",")}")
    meta.fields.zip(schema.fields).foreach { case (tf, sf) =>
      require(icebergType(sf.dataType) == tf.typeName,
        s"$op column '${sf.name}' has type ${icebergType(sf.dataType)} " +
          s"but the table schema requires ${tf.typeName}")
      require(!(tf.required && sf.nullable),
        s"$op column '${sf.name}' is nullable but the table schema " +
          "marks it required")
    }
  }

  /** Attach each column's spec field id as `parquet.field.id` StructField
    * metadata, so Spark's parquet writer (fieldId.write, on by default)
    * records it in the file footers. Stamped files are what make
    * id-based read resolution — and therefore safe rename / no-resurrect
    * drop+readd — possible; every write flavor routes its data files (and
    * equality-delete files) through this. Columns without a mapping (the
    * transformed layout column, dropped from data files by partitionBy)
    * pass through unstamped.
    */
  private def stampFieldIds(
      df: DataFrame, ids: Map[String, Int]): DataFrame = {
    import org.apache.spark.sql.functions.col
    // session-sticky BY DESIGN (like nanosAsLong/fieldId.read): a
    // set-restore window would race concurrent writes in the same
    // session, and the conf is inert for frames whose schema carries no
    // parquet.field.id metadata — only stamped Iceberg writes do
    df.sparkSession.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    df.select(df.columns.toSeq.map { c =>
      ids.get(c) match {
        case Some(id) =>
          val m = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(df.schema(c).metadata)
            .putLong("parquet.field.id", id.toLong).build()
          col(c).as(c, m)
        case None => col(c)
      }
    }: _*)
  }

  /** The name->field-id map a write against `meta` stamps with; fresh
    * tables (no prior metadata) use positional ids, matching the ids
    * [[schemaJson]] records for them at the commit.
    */
  private def fieldIdsFor(
      prior: Option[IcebergMeta.TableMeta], schema: StructType): Map[String, Int] =
    prior match {
      case Some(m) => m.fields.map(f => f.name -> f.id).toMap
      case None    => schema.fieldNames.zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
    }

  /** Stage `df`'s rows under `staging` laid out per `partition`: the
    * TRANSFORMED value becomes the layout column; partitionBy drops it
    * from the files, which is exactly hidden partitioning (identity
    * drops the source column itself — reconstituted from dirs on read;
    * any other transform keeps the source column in the data and only
    * the derived value shapes the layout). One shuffle per partition
    * value so each value yields one file, not one per input split —
    * the small-files defense a production writer makes. Returns
    * (partition tuple, staged file); partitioned files sit in their
    * `<field>=<value>` dir. Shared by append / merge / upsert / compact.
    */
  /** Per-writer random token for file naming. EVERY write flavor that
    * places files or manifests under deterministic snapshot-id names
    * must use one: two racers that both computed snapshot N would
    * otherwise have the LOSER overwrite the winner's already-committed
    * files (REPLACE_EXISTING) before its own CAS fails — committed data
    * silently corrupted.
    */
  private def newToken(): String =
    java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong()).take(8)

  private def stageDataFiles(
      df0: DataFrame,
      partitions: Seq[PartitionTransform],
      staging: Path,
      fieldIds: Map[String, Int],
      // order rows WITHIN each staged task by these columns: on a
      // PARTITIONED table the repartition below reshuffles, which would
      // silently discard any clustering a caller's relayout applied —
      // compact passes its sort columns here so per-file bounds stay
      // tight even though the partition shuffle happens last
      sortWithin: Seq[String] = Nil): Seq[(Map[String, Any], Path)] = {
    val df = stampFieldIds(df0, fieldIds)
    val out = staging.resolve("out")
    if (partitions.isEmpty) {
      df.write.parquet(out.toString)
      parquetFiles(out).map(f => (Map.empty[String, Any], f))
    } else {
      val types: Map[String, DataType] = partitions
        .map(pt => pt.fieldName -> transformedSparkType(pt, df.schema)).toMap
      // layout columns derive from the ORIGINAL schema (sources are table
      // columns; the collision guard in appendPartitioned holds)
      val laid = partitions.foldLeft(df)((d, pt) =>
        d.withColumn(pt.fieldName, transformedColumn(pt, df.schema)))
      val shuffled = laid
        .repartition(partitions.map(pt =>
          org.apache.spark.sql.functions.col(pt.fieldName)): _*)
      val ordered =
        if (sortWithin.isEmpty) shuffled
        else shuffled.sortWithinPartitions(
          (partitions.map(_.fieldName) ++ sortWithin)
            .map(org.apache.spark.sql.functions.col): _*)
      ordered
        .write.partitionBy(partitions.map(_.fieldName): _*)
        .parquet(out.toString)
      // nested <f1>=<v1>/<f2>=<v2>/... dirs -> one tuple per leaf file
      parquetFilesRecursive(out).map { f =>
        val segs = hivePartitionDirs(f)
        require(segs.size == partitions.size,
          s"staged file $f has ${segs.size} partition dirs, expected ${partitions.size}")
        val tuple = segs.map { s =>
          val Array(k, raw) = s.split("=", 2)
          require(raw != "__HIVE_DEFAULT_PARTITION__",
            s"Null partition values not supported (column $k)")
          k -> parsePartitionValue(raw, types(k))
        }.toMap
        (tuple, f)
      }.sortBy(_._2.toString)
    }
  }

  /** The `<k>=<v>` directory chain of a staged file, outermost first. */
  private def hivePartitionDirs(f: Path): Seq[String] = {
    val segs = List.newBuilder[String]
    var p = f.getParent
    while (p != null && p.getFileName != null &&
        p.getFileName.toString.contains("=")) {
      segs += p.getFileName.toString
      p = p.getParent
    }
    segs.result().reverse
  }

  /** Move staged files into `data/` under deterministic snapshot-keyed
    * names (partitioned files under their `<field>=<value>` dir — the
    * staged file's parent). Deterministic names + REPLACE_EXISTING are
    * the rerun-convergence story: a crashed attempt's orphans are
    * overwritten, never accumulated.
    */
  private def placeDataFiles(
      root: Path,
      staged: Seq[(Map[String, Any], Path)],
      snapshotId: Long,
      // per-append writer token: two concurrent appends that both
      // computed the same next snapshot id must not clobber each
      // other's files while the metadata CAS decides the race
      token: String = ""): Seq[(Map[String, Any], Path)] =
    staged.zipWithIndex.map { case ((ptuple, f), i) =>
      // the staged file's full <k>=<v> dir chain (nested for multi-field
      // specs) transplants under data/ verbatim
      val dest = hivePartitionDirs(f)
        .foldLeft(root.resolve("data"))((d, seg) => d.resolve(seg))
      Files.createDirectories(dest)
      val tok = if (token.isEmpty) "" else s"-$token"
      val target = dest.resolve(f"snap$snapshotId%05d$tok-$i%03d.parquet")
      Files.move(f, target, StandardCopyOption.REPLACE_EXISTING)
      (ptuple, target)
    }

  /** One ADDED-status manifest per distinct partition tuple over the
    * placed files, with partition summaries for manifest-level pruning.
    */
  private def buildDataManifests(
      spark: SparkSession,
      root: Path,
      placed: Seq[(Map[String, Any], Path)],
      partType: Seq[(String, DataType)],
      snapshotId: Long,
      fv: Int,
      specId: Int = 0,
      // name -> spec field id, for the per-file column bounds; empty
      // skips bounds harvesting (delete-file manifests)
      fieldIds: Map[String, Int] = Map.empty,
      // per-writer token (see placeDataFiles): keeps a lost-race
      // writer's manifest Avros from clobbering the winner's while both
      // believed they were snapshot N
      token: String = ""): Seq[IcebergMeta.ManifestFile] = {
    val hadoopConf = spark.sessionState.newHadoopConf()
    val tok = if (token.isEmpty) "" else s"-$token"
    val groups = placed.groupBy(_._1).toSeq.sortBy(_._1.values.mkString)
    groups.zipWithIndex.map { case ((ptuple, files), i) =>
      val entries = files.map { case (_, p) =>
        val (rows, lower, upper) = footerInfo(hadoopConf, p, fieldIds)
        IcebergMeta.ManifestEntry(
          status = 1, // ADDED
          snapshotId = snapshotId,
          IcebergMeta.DataFile(
            p.toAbsolutePath.toString,
            "PARQUET",
            ptuple,
            rows,
            Files.size(p),
            lowerBounds = lower,
            upperBounds = upper))
      }
      val mpath = root.resolve("metadata")
        .resolve(f"manifest-$snapshotId%05d$tok-$i%03d.avro")
      writeManifest(mpath, partType, entries, fv)
      manifestRecord(mpath, snapshotId, partType, entries, specId)
    }
  }

  /** One footer read per staged file: row count + per-column min/max
    * (spec lower_bounds/upper_bounds, keyed by field id, single-value
    * binary encoding). Only flat leaf columns with usable stats and a
    * known field id contribute; anything else (INT96 timestamps, no
    * stats, nested) is silently absent — the reader treats absence as
    * unprunable, so harvesting is always conservative-correct. This is
    * the write-time half of file-level data skipping: a sorted or
    * Z-ordered table gets disjoint per-file ranges here, and planScan's
    * ColumnBound filter skips whole files a partition tuple never could.
    */
  private def footerInfo(
      conf: org.apache.hadoop.conf.Configuration,
      file: Path,
      fieldIds: Map[String, Int])
      : (Long, Map[Int, Array[Byte]], Map[Int, Array[Byte]]) = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val mins = scala.collection.mutable.Map.empty[String, Comparable[Any]]
      val maxs = scala.collection.mutable.Map.empty[String, Comparable[Any]]
      val types = scala.collection.mutable.Map.empty[String, PrimitiveTypeName]
      var statsOk = Set.empty[String]
      var statsBad = Set.empty[String]
      r.getFooter.getBlocks.asScala.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          if (c.getPath.size() == 1) {
            val name = c.getPath.toDotString
            val st = c.getStatistics
            if (st == null || st.isEmpty || !st.hasNonNullValue) {
              statsBad += name // one stats-less row group poisons the file's bounds
            } else {
              statsOk += name
              types(name) = c.getPrimitiveType.getPrimitiveTypeName
              val mn = st.genericGetMin.asInstanceOf[Comparable[Any]]
              val mx = st.genericGetMax.asInstanceOf[Comparable[Any]]
              // cross-row-group fold must use the SAME order the read
              // side prunes with: Iceberg string bounds compare UNSIGNED
              // byte-wise (IcebergMeta.compareBound), while parquet
              // Binary.compareTo is signed — folding signed here would
              // record bounds that exclude non-ASCII values the file
              // holds, and the unsigned pruning would then skip files
              // with matching rows
              def cmp(a: Comparable[Any], b: Comparable[Any]): Int =
                (a: Any, b: Any) match {
                  case (x: org.apache.parquet.io.api.Binary,
                        y: org.apache.parquet.io.api.Binary) =>
                    java.util.Arrays.compareUnsigned(x.getBytes, y.getBytes)
                  case _ => a.compareTo(b)
                }
              if (!mins.contains(name) || cmp(mn, mins(name)) < 0) mins(name) = mn
              if (!maxs.contains(name) || cmp(mx, maxs(name)) > 0) maxs(name) = mx
            }
          }
        }
      }
      def encode(name: String, v: Any): Option[Array[Byte]] = types(name) match {
        case PrimitiveTypeName.INT32 =>
          Some(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
            .putInt(v.asInstanceOf[Number].intValue()).array())
        case PrimitiveTypeName.INT64 =>
          Some(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
            .putLong(v.asInstanceOf[Number].longValue()).array())
        case PrimitiveTypeName.FLOAT =>
          Some(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
            .putFloat(v.asInstanceOf[Number].floatValue()).array())
        case PrimitiveTypeName.DOUBLE =>
          Some(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
            .putDouble(v.asInstanceOf[Number].doubleValue()).array())
        case PrimitiveTypeName.BINARY =>
          Some(v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes)
        case _ => None // INT96/BOOLEAN/FIXED: no portable encoding, skip
      }
      def collect(m: collection.Map[String, Comparable[Any]]): Map[Int, Array[Byte]] =
        m.toSeq.flatMap { case (name, v) =>
          if (statsBad(name)) None
          else for {
            id <- fieldIds.get(name)
            bytes <- encode(name, v)
          } yield id -> bytes
        }.toMap
      (r.getRecordCount, collect(mins), collect(maxs))
    } finally r.close()
  }

  /** The table's recorded partition spec as this writer's transforms,
    * for the write flavors that must lay NEW data files out under it
    * (merge / upsert / compact on a partitioned table). Refuses name
    * conventions this writer didn't produce — writing a layout that
    * diverges from the spec would silently vanish files from pruned
    * reads, the failure appendPartitioned's spec gate exists to prevent.
    */
  private def specTransforms(
      meta: IcebergMeta.TableMeta): Seq[PartitionTransform] =
    meta.partitionFields.map { pf =>
      val src = meta.fields.find(_.id == pf.sourceId).getOrElse(
        throw new IllegalArgumentException(
          s"partition field '${pf.name}' references unknown source id " +
            s"${pf.sourceId}")).name
      val pt = PartitionTransform(src, pf.transform)
      require(pt.fieldName == pf.name,
        s"partition field '${pf.name}' does not follow this writer's " +
          s"naming (expected '${pt.fieldName}'); refusing to lay out files")
      pt
    }

  /** Spark type of the transformed partition value — also the gate on
    * what this writer can lay out (bucket[N] would need Iceberg's
    * murmur3 as a Spark expression; it reads/prunes fine, so refuse the
    * WRITE loudly rather than lay out files a real reader would misroute).
    */
  private def transformedSparkType(
      pt: PartitionTransform, schema: StructType): DataType = {
    val src = schema(pt.source).dataType
    pt.transform match {
      case "identity"                 => src
      case "day" | "month" | "year" =>
        require(src == DateType || src == TimestampType,
          s"'${pt.transform}' layout needs a date or timestamp source " +
            s"column; '${pt.source}' is $src")
        IntegerType
      case "hour" =>
        require(src == TimestampType,
          s"'hour' layout needs a timestamp source column; " +
            s"'${pt.source}' is $src")
        IntegerType
      case t if IcebergTransforms.truncateWidth(t).isDefined =>
        require(src == IntegerType || src == LongType || src == StringType,
          s"truncate layout over $src not supported")
        src
      case t if IcebergTransforms.bucketCount(t).isDefined =>
        require(src == IntegerType || src == LongType || src == StringType,
          s"bucket layout over $src not supported by this writer")
        IntegerType
      case other =>
        throw new UnsupportedOperationException(
          s"this writer cannot lay out transform '$other' " +
            "(reads and pruning support it; write with a real committer)")
    }
  }

  private def transformedColumn(
      pt: PartitionTransform, schema: StructType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val c = col(pt.source)
    // floorDiv in long arithmetic via pmod: (x - pmod(x, d)) / d is exact
    // and rounds toward -inf for pre-epoch instants, matching the spec's
    // Math.floorDiv (a plain `div` truncates toward zero and would put
    // 1969-12-31 23:00 in day 0 instead of day -1)
    def floorDiv(x: org.apache.spark.sql.Column, d: Long) =
      ((x - pmod(x, lit(d))) / lit(d)).cast(IntegerType)
    val isTs = schema(pt.source).dataType == TimestampType
    pt.transform match {
      case "identity" => c
      case "day" if isTs  => floorDiv(unix_micros(c), 86400000000L)
      case "day"          => datediff(c, lit("1970-01-01").cast(DateType))
      case "hour"         => floorDiv(unix_micros(c), 3600000000L)
      // year()/month() evaluate in the session timezone; the session is
      // pinned UTC (GraftSession + QueryUtil), matching the spec's UTC
      // ordinal definition for timestamptz sources
      case "month"    => (year(c) - lit(1970)) * lit(12) + month(c) - lit(1)
      case "year"     => year(c) - lit(1970)
      case t if IcebergTransforms.bucketCount(t).isDefined =>
        // the spec's Murmur3 (x86, seed 0) is NOT Spark's hash() (seed
        // 42, different byte layout), so the layout column reuses the
        // spec-vector-validated IcebergTransforms math via a UDF. A UDF
        // is acceptable exactly here: it shapes the WRITE layout (one
        // pass per commit), never a query hot path — reads prune via
        // the same math driver-side on the predicate literal.
        val n = IcebergTransforms.bucketCount(t).get
        schema(pt.source).dataType match {
          case StringType =>
            udf((s: String) =>
              if (s == null) null
              else Integer.valueOf(IcebergTransforms.bucket("string", s, n)))
              .apply(c)
          case _ => // int/long, gated by transformedSparkType
            udf((v: java.lang.Long) =>
              if (v == null) null
              else Integer.valueOf(IcebergTransforms.bucket("long", v, n)))
              .apply(c.cast(LongType))
        }
      case t =>
        val w = IcebergTransforms.truncateWidth(t).get // gated by transformedSparkType
        schema(pt.source).dataType match {
          case StringType => substring(c, 1, w)
          case _          => c - pmod(c, lit(w)) // floor mod per spec
        }
    }
  }

  /** Delete every file whose identity-partition value is in `values`:
    * manifests containing matches are rewritten (kept entries ->
    * EXISTING=0, matches -> DELETED=2); untouched manifests carry over
    * byte-identical. This is Iceberg's copy-on-write delete shape — no
    * data file is modified, the new snapshot just stops referencing them.
    */
  def deletePartitions(
      spark: SparkSession,
      tablePath: String,
      column: String,
      values: Set[Any],
      timestampMs: Long): Long = {
    val meta = IcebergMeta.load(tablePath)
    requireWritable(meta) // before ANY side effect (see append)
    // head-snapshot guard BEFORE snapshots.max (mergeRows' ordering rule):
    // an empty-snapshots table must refuse with the real reason, not
    // UnsupportedOperationException("empty.max")
    require(meta.currentSnapshot.isDefined, "table has no current snapshot")
    val baseVersion = Some(meta.loadedVersion)
    val root = meta.root
    val snapshotId = meta.snapshots.map(_.id).maxOption.getOrElse(0L) + 1L
    val token = newToken() // collision-free names under commit races
    val pf = meta.partitionFields.find(_.name == column).getOrElse(
      throw new IllegalArgumentException(s"'$column' is not a partition field"))
    require(pf.transform == "identity",
      s"deletePartitions works on identity partitions; '$column' is " +
        s"'${pf.transform}' — use deleteRowsWhere on the source column")

    val manifests = IcebergMeta.readManifestListFile(
      root, currentManifestList(meta).toString)
    var rewrites = 0
    val out = manifests.map { mf =>
      val entries = IcebergMeta.readManifest(root, mf.path, mf.addedSnapshotId)
      val hasMatch = entries.exists(e =>
        values.exists(v => IcebergMeta.valueEquals(
          e.dataFile.partition.get(column).orNull, v)))
      if (!hasMatch) mf
      else {
        val rewritten = entries.map { e =>
          // entries already DELETED by a prior snapshot carry over verbatim
          // — flipping them to EXISTING would resurrect their files in the
          // new snapshot (real v1 manifests mix partitions and retain
          // DELETED entries; self-written ones never hit this, foreign
          // tables do)
          if (e.status == 2) e
          else if (values.exists(v => IcebergMeta.valueEquals(
              e.dataFile.partition.get(column).orNull, v)))
            e.copy(status = 2, snapshotId = snapshotId) // DELETED
          else e.copy(status = 0)                        // EXISTING
        }
        val mpath = root.resolve("metadata")
          .resolve(f"manifest-$snapshotId%05d-$token%s-$rewrites%03d.avro")
        rewrites += 1
        // the manifest's FULL recorded partition layout, not just the
        // delete column: a multi-field spec's entries carry every field,
        // and a single-column record schema would throw from the Avro
        // writer (and misalign the summaries with the spec's indexes)
        val partType = partTypeFor(meta, mf.partitionSpecId, rewritten)
        writeManifest(mpath, partType, rewritten, formatVersion = 1)
        manifestRecord(mpath, snapshotId, partType, rewritten, mf.partitionSpecId)
      }
    }
    require(rewrites > 0, s"deletePartitions matched no files for $column in $values")
    commitSnapshot(spark, root, IcebergMeta.sparkSchema(meta),
      Seq(PartitionTransform(column)),
      Some(meta), baseVersion, snapshotId, timestampMs, out,
      operation = "delete", formatVersion = 1, token = token)
    snapshotId
  }

  /** deletePartitions precondition, checked BEFORE any side effect: the
    * copy-on-write manifest rewrite is v1-shaped (no sequence-number
    * bookkeeping for the rewritten entries) — on a v2 table use the
    * row-level [[deleteRowsWhere]]/[[deleteEquality]] instead.
    */
  private def requireWritable(m: IcebergMeta.TableMeta): Unit =
    require(m.formatVersion == 1,
      s"deletePartitions rewrites v1 manifests only; table is " +
        s"v${m.formatVersion} — use deleteRowsWhere/deleteEquality")

  /** MERGE/DELETE-shaped row-level delete (v2 merge-on-read): scan the
    * current snapshot's live data files for rows matching `predicate`,
    * write their positions as ONE position-delete parquet of
    * (file_path, pos) sorted per spec, and commit it as a delete
    * snapshot. No data file is rewritten — this is exactly the shape
    * Flink CDC / Spark MERGE leave behind, which the read side applies
    * sequence-scoped (the delete reaches data files of this commit and
    * earlier, never later appends).
    */
  def deleteRowsWhere(
      spark: SparkSession,
      tablePath: String,
      predicate: org.apache.spark.sql.Column,
      timestampMs: Long): Long = {
    val meta = IcebergMeta.load(tablePath)
    require(meta.formatVersion == 2,
      s"row-level deletes require a v2 table; this one is v${meta.formatVersion} " +
        "(use deletePartitions for v1 copy-on-write)")
    val baseVersion = Some(meta.loadedVersion)
    val root = meta.root
    val snapshotId = meta.snapshots.map(_.id).maxOption.getOrElse(0L) + 1L
    val token = newToken() // collision-free names under commit races
    val snap = meta.currentSnapshot.getOrElse(
      throw new IllegalStateException("table has no current snapshot"))
    val plan = IcebergMeta.planScan(meta, snap)
    require(plan.files.nonEmpty, "table has no live data files to delete from")

    import org.apache.spark.sql.functions.col
    // stamped tables resolve by field id (a rename must not misresolve
    // pre-rename files while computing positions)
    if (meta.fieldIdStamped)
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val schema = IcebergMeta.sparkSchema(meta.fields, meta.fieldIdStamped)
    val staging = Files.createTempDirectory("graft-iceberg-del")
    spark.read
      .schema(schema)
      .option("basePath", root.resolve("data").toString)
      .parquet(plan.files.map(_.path): _*)
      .filter(predicate)
      .select(
        col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("pos"))
      .sort("file_path", "pos")
      .coalesce(1)
      .write.parquet(staging.resolve("out").toString)
    val src = parquetFiles(staging.resolve("out")) match {
      case Seq(one) => one
      case other => throw new IllegalStateException(
        s"expected one position-delete file, got ${other.size}")
    }
    val hadoopConf = spark.sessionState.newHadoopConf()
    val nDeleted = parquetRowCount(hadoopConf, src)
    if (nDeleted == 0) {
      deleteRecursively(staging)
      throw new IllegalArgumentException("deleteRowsWhere matched no rows")
    }
    val target = root.resolve("data").resolve(f"delete-$snapshotId%05d-$token%s-pos.parquet")
    Files.move(src, target, StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(staging)

    commitDeleteFile(spark, meta, baseVersion, snapshotId, timestampMs,
      IcebergMeta.DataFile(
        target.toAbsolutePath.toString, "PARQUET", Map.empty,
        nDeleted, Files.size(target), content = 1))
    // row-count statistics maintenance (sketches cannot forget — NDVs
    // stay conservative upper bounds; see StatsCatalog.mergeIncrement)
    if (graft.plans.StatsCatalog.tracked(tablePath)) {
      try graft.plans.StatsCatalog.mergeIncrement(
        spark, tablePath, None, deletedRows = nDeleted)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    snapshotId
  }

  /** Equality delete (v2 merge-on-read): `keys` is a small frame whose
    * COLUMNS name the equality fields and whose ROWS are the key tuples
    * to delete. Applies to data files strictly OLDER than this commit —
    * a row with the same key appended after survives (the CDC
    * upsert primitive: delete-by-key then insert).
    */
  def deleteEquality(
      spark: SparkSession,
      tablePath: String,
      keys: DataFrame,
      timestampMs: Long): Long = {
    val meta = IcebergMeta.load(tablePath)
    require(meta.formatVersion == 2,
      s"row-level deletes require a v2 table; this one is v${meta.formatVersion}")
    require(keys.columns.nonEmpty, "equality delete needs at least one key column")
    val ids = keys.columns.toSeq.map { n =>
      val f = meta.fields.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"equality column '$n' is not in the table schema"))
      require(icebergType(keys.schema(n).dataType) == f.typeName,
        s"equality column '$n' has type ${icebergType(keys.schema(n).dataType)} " +
          s"but the table schema requires ${f.typeName}")
      f.id
    }
    val baseVersion = Some(meta.loadedVersion)
    val root = meta.root
    val snapshotId = meta.snapshots.map(_.id).maxOption.getOrElse(0L) + 1L
    val token = newToken() // collision-free names under commit races

    val staging = Files.createTempDirectory("graft-iceberg-eq")
    // delete files are id-stamped like data files, so the read side can
    // resolve their columns by field id after a rename of the key column
    stampFieldIds(keys, keys.columns.toSeq.zip(ids).toMap)
      .coalesce(1).write.parquet(staging.resolve("out").toString)
    val src = parquetFiles(staging.resolve("out")) match {
      case Seq(one) => one
      case other => throw new IllegalStateException(
        s"expected one equality-delete file, got ${other.size}")
    }
    val hadoopConf = spark.sessionState.newHadoopConf()
    val nKeys = parquetRowCount(hadoopConf, src)
    if (nKeys == 0) {
      deleteRecursively(staging)
      throw new IllegalArgumentException("deleteEquality got an empty key frame")
    }
    val target = root.resolve("data").resolve(f"delete-$snapshotId%05d-$token%s-eq.parquet")
    Files.move(src, target, StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(staging)

    commitDeleteFile(spark, meta, baseVersion, snapshotId, timestampMs,
      IcebergMeta.DataFile(
        target.toAbsolutePath.toString, "PARQUET", Map.empty,
        nKeys, Files.size(target), content = 2, equalityIds = ids))
    snapshotId
  }

  /** MERGE (v2 merge-on-read): rows of `updates` whose `key` matches a
    * live row REPLACE it; unmatched rows INSERT. ONE snapshot carries
    * both a position-delete file covering every matched old row AND the
    * new data file(s) holding all update rows — readers can never
    * observe the "deleted but not yet re-inserted" intermediate a
    * two-commit merge would expose. No data file is rewritten (the
    * Spark/Flink MoR MERGE shape, crates/connectors/iceberg/src/lib.rs:3-4
    * intent): the position delete binds to OLD file paths, so the
    * same-sequence data files this commit adds are untouched by it, and
    * the read side's seq-scoped subtraction (IcebergSource.applyDeletes)
    * drops exactly the replaced rows. Returns the new snapshot id.
    *
    * Matched positions are computed against the current snapshot's live
    * data FILES (not the delete-applied view): a row an earlier delete
    * already removed may be re-listed in the new delete file, which is a
    * spec-sanctioned no-op. `key` must be unique per side, the standard
    * MERGE precondition. Partitioned tables are supported: the new data
    * files are laid out under the table's recorded spec (single-field
    * specs this writer produces) while the delete file stays table-wide.
    *
    * `faultHook` is the crash-injection seam (SourcesSpec matrix): it is
    * called at each named point BEFORE the metadata commit; a crash at
    * any of them leaves orphan files that metadata-driven readers never
    * see, and a rerun converges (same snapshot id -> same target names,
    * REPLACE_EXISTING).
    */
  def mergeRows(
      spark: SparkSession,
      tablePath: String,
      updates: DataFrame,
      key: String,
      timestampMs: Long,
      faultHook: String => Unit = _ => (),
      // Some(name): the MERGE lands on that branch — matched positions
      // are computed against the BRANCH head's state and only the branch
      // ref advances. The audit half of a CDC write-audit-publish flow.
      branch: Option[String] = None,
      // Some(id): the head snapshot this merge's UPDATES were computed
      // against — refuse (CommitConflictException) if the table moved
      // since. Closes the read-compute-merge TOCTOU the version CAS
      // alone cannot see: the CAS guards this call's load->commit, but a
      // caller that derived `updates` from an earlier read would
      // otherwise land stale values cleanly on the advanced head
      // (streaming.MaterializedAgg's concurrent-refresh guard).
      requireSnapshot: Option[Long] = None): Long = {
    val meta = IcebergMeta.load(tablePath)
    require(meta.formatVersion == 2,
      s"mergeRows requires a v2 table; this one is v${meta.formatVersion}")
    branch.foreach(b => require(meta.refs.get(b).exists(_.refType == "branch"),
      s"ref '$b' is not an existing branch (createBranch first)"))
    // partitioned tables supported: new data files are laid out under
    // the table's recorded spec; the position-delete file stays
    // table-wide (delete manifests are never pruned, conservative-correct)
    val partition = specTransforms(meta)
    validateSchemaAgainstTable(meta, updates.schema, "Merge")
    require(updates.schema.fieldNames.contains(key),
      s"merge key '$key' is not a column of the updates frame")

    val baseVersion = Some(meta.loadedVersion)
    val root = meta.root
    // head-snapshot guard BEFORE snapshots.max: an empty snapshots
    // array must fail with the intended message, not empty.max
    val snap = branch.map(meta.snapshotByRef).orElse(meta.currentSnapshot)
      .getOrElse(
        throw new IllegalStateException("table has no current snapshot"))
    requireSnapshot.foreach(expected =>
      if (snap.id != expected)
        throw new CommitConflictException(meta.loadedVersion, root.toString))
    val snapshotId = meta.snapshots.map(_.id).maxOption.getOrElse(0L) + 1L
    val token = newToken() // collision-free names under commit races
    val plan = IcebergMeta.planScan(meta, snap)
    require(plan.files.nonEmpty, "table has no live data files to merge into")

    import org.apache.spark.sql.functions.col
    if (meta.fieldIdStamped)
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val schema = IcebergMeta.sparkSchema(meta.fields, meta.fieldIdStamped)
    val hadoopConf = spark.sessionState.newHadoopConf()
    val staging = Files.createTempDirectory("graft-iceberg-merge")

    // matched old rows -> (file_path, pos), one sorted delete file. Only
    // the scan side needs _metadata; the key set is distinct-projected
    // and the join stays a semi join Catalyst can broadcast when small.
    val keys = updates.select(col(key)).distinct()
    spark.read
      .schema(schema)
      .option("basePath", root.resolve("data").toString)
      .parquet(plan.files.map(_.path): _*)
      .select(
        col(key),
        col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("pos"))
      .join(keys, Seq(key), "left_semi")
      .select("file_path", "pos")
      .sort("file_path", "pos")
      .coalesce(1)
      .write.parquet(staging.resolve("del").toString)
    val delSrc = parquetFiles(staging.resolve("del")) match {
      case Seq(one) => one
      case other => throw new IllegalStateException(
        s"expected one position-delete file, got ${other.size}")
    }
    val nDeleted = parquetRowCount(hadoopConf, delSrc)

    // data files for ALL update rows (replacements and inserts alike),
    // laid out under the table's partition spec
    val stagedData = stageDataFiles(
      updates, partition, Files.createDirectories(staging.resolve("data")),
      fieldIdsFor(Some(meta), updates.schema))
    val nUpserted = stagedData.map(f => parquetRowCount(hadoopConf, f._2)).sum
    if (nUpserted == 0) {
      deleteRecursively(staging)
      throw new IllegalArgumentException("mergeRows got an empty updates frame")
    }
    faultHook("staged") // everything computed; table directories untouched

    val movedData = placeDataFiles(root, stagedData, snapshotId, token)
    faultHook("data-moved")
    val delTarget =
      if (nDeleted == 0) None // pure-insert merge: no delete file at all
      else {
        val t = root.resolve("data")
          .resolve(f"delete-$snapshotId%05d-$token%s-pos.parquet")
        Files.move(delSrc, t, StandardCopyOption.REPLACE_EXISTING)
        Some(t)
      }
    deleteRecursively(staging)
    faultHook("files-placed")

    val partType = partition.map(p =>
      p.fieldName -> transformedSparkType(p, updates.schema))
    val dataManifests = buildDataManifests(
      spark, root, movedData, partType, snapshotId, fv = 2,
      specId = meta.defaultSpecId,
      fieldIds = fieldIdsFor(Some(meta), updates.schema))
    val delManifest = delTarget.map { t =>
      val entry = IcebergMeta.ManifestEntry(
        status = 1, snapshotId,
        IcebergMeta.DataFile(
          t.toAbsolutePath.toString, "PARQUET", Map.empty,
          nDeleted, Files.size(t), content = 1))
      val mpath = root.resolve("metadata")
        .resolve(f"manifest-$snapshotId%05d-del.avro")
      writeManifest(mpath, Nil, Seq(entry), formatVersion = 2)
      manifestRecord(mpath, snapshotId, Nil, Seq(entry)).copy(content = 1)
    }
    faultHook("manifests-written")

    // carried manifests come from the head this commit extends (the
    // branch's for branch merges — same discipline as appendImpl)
    val carried = IcebergMeta.readManifestListFile(root, snap.manifestList)
    commitSnapshot(spark, root, schema, Nil, Some(meta), baseVersion,
      snapshotId, timestampMs, carried ++ delManifest.toSeq ++ dataManifests,
      operation = "overwrite", formatVersion = 2, branch = branch,
      token = token)
    snapshotId
  }

  /** UPSERT (v2 merge-on-read, equality-delete flavor): ONE snapshot
    * carrying an equality-delete file on `key` (every update key) plus
    * the new data file(s) holding all update rows. Where [[mergeRows]]
    * SCANS the table to pin matched positions, this path never reads a
    * data file at all — the delete is BY KEY, resolved at read time by
    * the sequence-scoped equality subtraction (an equality delete
    * reaches only data files with a STRICTLY lower sequence, so this
    * commit's own data files survive it, per spec). That makes the
    * commit O(|updates|) regardless of table size: the CDC ingest
    * economics at 100 TB, at the price of a per-read anti-join the
    * position-delete flavor does not pay. Same crash seam and rerun
    * convergence as mergeRows. Returns the new snapshot id.
    */
  def upsertRows(
      spark: SparkSession,
      tablePath: String,
      updates: DataFrame,
      key: String,
      timestampMs: Long,
      faultHook: String => Unit = _ => (),
      // Some(name): the UPSERT lands on that branch (sequence scoping
      // reaches the branch's files; only the branch ref advances) — the
      // O(|updates|) CDC commit staged for audit before publish.
      branch: Option[String] = None,
      // Some(id): the head snapshot these UPDATES were computed against —
      // refuse (CommitConflictException) if the table moved since, the
      // same stale-step guard mergeRows offers (the MV steps' replay
      // protection; unlike merge there are no positions to invalidate,
      // but an update set derived from a superseded head is just as
      // stale semantically).
      requireSnapshot: Option[Long] = None): Long = {
    val meta = IcebergMeta.load(tablePath)
    require(meta.formatVersion == 2,
      s"upsertRows requires a v2 table; this one is v${meta.formatVersion}")
    branch.foreach(b => require(meta.refs.get(b).exists(_.refType == "branch"),
      s"ref '$b' is not an existing branch (createBranch first)"))
    val partition = specTransforms(meta)
    validateSchemaAgainstTable(meta, updates.schema, "Upsert")
    val keyField = meta.fields.find(_.name == key).getOrElse(
      throw new IllegalArgumentException(
        s"upsert key '$key' is not in the table schema"))
    val head = branch.map(meta.snapshotByRef).orElse(meta.currentSnapshot)
      .getOrElse(throw new IllegalStateException(
        "table has no current snapshot (append first, then upsert)"))
    requireSnapshot.foreach(expected =>
      if (head.id != expected)
        throw new CommitConflictException(
          meta.loadedVersion, meta.root.toString))

    val baseVersion = Some(meta.loadedVersion)
    val root = meta.root
    val snapshotId = meta.snapshots.map(_.id).maxOption.getOrElse(0L) + 1L
    val token = newToken() // collision-free names under commit races

    import org.apache.spark.sql.functions.col
    val hadoopConf = spark.sessionState.newHadoopConf()
    val staging = Files.createTempDirectory("graft-iceberg-upsert")

    // the equality-delete file: just the distinct update keys — no table
    // read anywhere on this path. NULL keys are excluded: the read side
    // applies equality deletes null-SAFELY per spec, so a null key in
    // the file would delete every prior null-keyed row — but mergeRows'
    // semi join (SQL equality) treats null-keyed updates as pure
    // inserts, and the two flavors must agree on semantics. A
    // null-keyed update row therefore inserts without deleting here too.
    stampFieldIds(
      updates.select(col(key)).filter(col(key).isNotNull).distinct().sort(key),
      Map(key -> keyField.id))
      .coalesce(1).write.parquet(staging.resolve("del").toString)
    val delSrc = parquetFiles(staging.resolve("del")) match {
      case Seq(one) => one
      case other => throw new IllegalStateException(
        s"expected one equality-delete file, got ${other.size}")
    }
    val nKeys = parquetRowCount(hadoopConf, delSrc)

    val stagedData = stageDataFiles(
      updates, partition, Files.createDirectories(staging.resolve("data")),
      fieldIdsFor(Some(meta), updates.schema))
    val nUpserted = stagedData.map(f => parquetRowCount(hadoopConf, f._2)).sum
    if (nUpserted == 0) {
      deleteRecursively(staging)
      throw new IllegalArgumentException("upsertRows got an empty updates frame")
    }
    faultHook("staged")

    val movedData = placeDataFiles(root, stagedData, snapshotId, token)
    // all-null-keyed batch: nothing to delete — pure insert, no delete
    // file at all (mergeRows' no-match shape)
    val delTarget =
      if (nKeys == 0) None
      else {
        val t = root.resolve("data")
          .resolve(f"delete-$snapshotId%05d-$token%s-eq.parquet")
        Files.move(delSrc, t, StandardCopyOption.REPLACE_EXISTING)
        Some(t)
      }
    deleteRecursively(staging)
    faultHook("files-placed")

    val partType = partition.map(p =>
      p.fieldName -> transformedSparkType(p, updates.schema))
    val dataManifests = buildDataManifests(
      spark, root, movedData, partType, snapshotId, fv = 2,
      specId = meta.defaultSpecId,
      fieldIds = fieldIdsFor(Some(meta), updates.schema))

    val delManifest = delTarget.map { t =>
      val delEntry = IcebergMeta.ManifestEntry(
        status = 1, snapshotId,
        IcebergMeta.DataFile(
          t.toAbsolutePath.toString, "PARQUET", Map.empty,
          nKeys, Files.size(t), content = 2,
          equalityIds = Seq(keyField.id)))
      val delMPath = root.resolve("metadata")
        .resolve(f"manifest-$snapshotId%05d-del.avro")
      writeManifest(delMPath, Nil, Seq(delEntry), formatVersion = 2)
      manifestRecord(delMPath, snapshotId, Nil, Seq(delEntry))
        .copy(content = 1)
    }
    faultHook("manifests-written")

    val carried = IcebergMeta.readManifestListFile(root, head.manifestList)
    commitSnapshot(spark, root, IcebergMeta.sparkSchema(meta), Nil,
      Some(meta), baseVersion, snapshotId, timestampMs,
      carried ++ delManifest.toSeq ++ dataManifests,
      operation = "overwrite", formatVersion = 2, branch = branch,
      token = token)
    snapshotId
  }

  /** COMPACTION (v2 maintenance): rewrite the table's current visible
    * rows — every accumulated position/equality delete applied — into
    * fresh data files and commit a snapshot whose manifest list carries
    * ONLY them. MoR write flavors ([[mergeRows]]/[[upsertRows]]) trade
    * read cost for commit cost; after enough of them every scan pays a
    * growing anti-join stack, and compaction is how the table gets its
    * clean-scan economics back (run it when delete files or their row
    * counts cross a threshold — the classic rewrite_data_files job).
    * Old snapshots still reference their own manifest lists, so time
    * travel to any pre-compaction state keeps working; nothing is
    * physically deleted (file GC = snapshot expiry, a separate concern).
    * Same crash seam and rerun convergence as the other writers.
    * Returns the new snapshot id.
    */
  def compact(
      spark: SparkSession,
      tablePath: String,
      timestampMs: Long,
      faultHook: String => Unit = _ => (),
      // optional physical re-layout applied to the delete-applied state
      // before staging — e.g. `_.repartitionByRange(8, col("k"))
      // .sortWithinPartitions("k")` leaves disjoint per-file ranges so
      // the harvested column bounds make key scans skip whole files
      // (compose with ZOrderLayout.zorderKey for two-dimension
      // clustering). Safe under ANY layout: bounds are conservative, a
      // relayout can only change how much a scan skips, never what it
      // returns. null (the default) = honor the table's DECLARED sort
      // order ([[setSortOrder]]) when one is set, else no relayout — a
      // caller-provided function always wins over the declaration.
      relayout: DataFrame => DataFrame = null,
      sortOrderFiles: Int = 16): Long = {
    val meta = IcebergMeta.load(tablePath)
    require(meta.formatVersion == 2,
      s"compact targets v2 merge-on-read tables; this one is v${meta.formatVersion}")
    val partition = specTransforms(meta)
    require(meta.currentSnapshot.isDefined, "table has no current snapshot")
    val relayout0: DataFrame => DataFrame =
      if (relayout != null) relayout
      else if (meta.sortOrderColumns.isEmpty) identity
      else d => d
        .repartitionByRange(sortOrderFiles,
          meta.sortOrderColumns.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(
          meta.sortOrderColumns.map(org.apache.spark.sql.functions.col): _*)

    val baseVersion = Some(meta.loadedVersion)
    val root = meta.root
    val snapshotId = meta.snapshots.map(_.id).maxOption.getOrElse(0L) + 1L
    val token = newToken() // collision-free names under commit races
    val staging = Files.createTempDirectory("graft-iceberg-compact")

    // the delete-applied current state IS the read path — compaction
    // materializes exactly what any reader sees today, re-laid-out
    // under the table's partition spec. On a PARTITIONED table the
    // staging repartition would discard the relayout's clustering, so
    // the declared sort order rides through as stageDataFiles'
    // sortWithin (per-file bounds stay tight within each partition).
    val stagedData = stageDataFiles(
      relayout0(IcebergSource.read(spark, tablePath)), partition, staging,
      fieldIdsFor(Some(meta), IcebergMeta.sparkSchema(meta)),
      sortWithin =
        if (partition.isEmpty || relayout != null) Nil
        else meta.sortOrderColumns)
    require(stagedData.nonEmpty, "compaction produced no data files")
    faultHook("staged")

    val movedData = placeDataFiles(root, stagedData, snapshotId, token)
    deleteRecursively(staging)
    faultHook("files-placed")

    val partType = partition.map(p =>
      p.fieldName -> transformedSparkType(p, IcebergMeta.sparkSchema(meta)))
    val manifests = buildDataManifests(
      spark, root, movedData, partType, snapshotId, fv = 2,
      specId = meta.defaultSpecId,
      fieldIds = fieldIdsFor(Some(meta), IcebergMeta.sparkSchema(meta)),
      token = token)
    faultHook("manifests-written")

    // NOTHING carried: the whole point — the new manifest list is the
    // compacted data alone, with zero delete manifests left to apply
    commitSnapshot(spark, root, IcebergMeta.sparkSchema(meta), Nil,
      Some(meta), baseVersion, snapshotId, timestampMs, manifests,
      operation = "replace", formatVersion = 2, token = token)
    snapshotId
  }

  /** What [[rewriteManifests]] saw and did. */
  final case class ManifestRewriteReport(
      snapshotId: Option[Long], // None = already compact, nothing committed
      manifestsBefore: Int,
      manifestsAfter: Int,
      entriesCarried: Int)

  /** MANIFEST REWRITE — metadata compaction. A long-lived ingest table
    * accretes one manifest per commit; planning then opens hundreds of
    * KB-scale Avro files to answer "what's live", and at 100-TB commit
    * rates the METADATA becomes the scan bottleneck long before the data
    * does. This rewrites the current snapshot's manifests into one
    * consolidated manifest per (content kind, partition spec) — data
    * files untouched, history untouched, a pure metadata commit.
    *
    * Spec mechanics (the parts that are easy to get fatally wrong):
    * entries are carried with status EXISTING, their ORIGINAL
    * snapshot_id, and their data sequence number written EXPLICITLY
    * ([[writeManifest]]'s EXISTING branch) — inheritance would re-stamp
    * every file to the rewrite's sequence and silently break v2
    * position/equality delete scoping. The consolidated manifest's
    * min_sequence_number is the min over carried entries (preserved
    * through [[commitSnapshot]]'s stamping), and partition field
    * summaries are recomputed so manifest-level pruning keeps working.
    * The commit is operation=replace with summary
    * `graft.manifests-only=true`, which [[IcebergMeta.planAppends]]
    * recognizes as provenance-preserving: unlike a data compaction, an
    * incremental window may cross a manifest rewrite, because carried
    * entries keep their adding snapshot ids.
    *
    * Deleted-status entries are dropped (their tombstone role ends once
    * the list no longer carries the manifest that added the file);
    * delete-file manifests consolidate the same way, into content=1
    * manifests. Grouping by the manifest's recorded partition spec keeps
    * mixed-layout tables readable — entries never migrate between specs.
    */
  def rewriteManifests(
      spark: SparkSession,
      tablePath: String,
      timestampMs: Long,
      // split threshold: a consolidated group larger than this many
      // entries splits into several manifests (bounds metadata memory on
      // million-file tables); the default keeps a manifest ~a few MB
      maxEntriesPerManifest: Int = 100000,
      // test seam: fires at named points ("manifests-written" = staged,
      // pre-commit) so specs can inject deterministic races/crashes
      faultHook: String => Unit = _ => ()): ManifestRewriteReport = {
    // A lost commit race is RETRIED, like appends: the rewrite is
    // recomputed from a fresh load each attempt (a concurrent commit
    // changed the manifest list, so the consolidation must be rebuilt
    // anyway — there is no stale state to mis-apply). A lost attempt's
    // staged manifest Avros are snapshot-id-named orphans; snapshot
    // expiry's GC reclaims them like any other unreferenced file.
    var attempt = 0
    while (true) {
      attempt += 1
      try return rewriteManifestsOnce(spark, tablePath, timestampMs,
        maxEntriesPerManifest, faultHook)
      catch {
        case e: CommitConflictException =>
          if (attempt >= 20) throw e
          Thread.sleep(5L * attempt)
          repairVersionHint(Paths.get(tablePath))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def rewriteManifestsOnce(
      spark: SparkSession,
      tablePath: String,
      timestampMs: Long,
      maxEntriesPerManifest: Int,
      faultHook: String => Unit = _ => ()): ManifestRewriteReport = {
    require(maxEntriesPerManifest > 0, "maxEntriesPerManifest must be positive")
    val meta = IcebergMeta.load(tablePath)
    val baseVersion = Some(meta.loadedVersion)
    val root = meta.root
    val snap = meta.currentSnapshot.getOrElse(
      throw new IllegalStateException("table has no current snapshot"))
    val listed = IcebergMeta.readManifestListFile(root, snap.manifestList)

    // (content kind, spec id) -> carried entries, in stable list order
    val carried: Seq[((Int, Int), Seq[IcebergMeta.ManifestEntry])] = listed
      .flatMap { mf =>
        IcebergMeta
          .readManifest(root, mf.path, mf.addedSnapshotId, mf.sequenceNumber)
          .filter(_.status != 2) // DELETED tombstones end here
          .map(e => (mf.content, mf.partitionSpecId) ->
            e.copy(status = 0)) // EXISTING; snapshot_id + seq preserved
      }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
      .sortBy(_._1)

    val groupCount = carried.map { case (k, es) =>
      (es.size + maxEntriesPerManifest - 1) / maxEntriesPerManifest
    }.sum
    if (listed.size <= groupCount)
      return ManifestRewriteReport(None, listed.size, listed.size,
        carried.map(_._2.size).sum)

    val snapshotId = meta.snapshots.map(_.id).maxOption.getOrElse(0L) + 1L
    val token = newToken() // collision-free names under commit races
    var idx = 0
    val manifests = carried.flatMap { case ((content, specId), entries0) =>
      val partType = partTypeFor(meta, specId, entries0)
      // cluster by partition tuple before chunking: when a group splits
      // across maxEntriesPerManifest, each output manifest covers a
      // CONTIGUOUS partition range and its field summaries stay tight —
      // manifest-level pruning degrades gracefully instead of every
      // manifest spanning every partition (the same clustering Iceberg's
      // own rewrite_manifests applies). Signed numerics map to unsigned
      // order via the sign-bit flip; ties break on file path for
      // determinism.
      def sortKey(v: Any): String = v match {
        case null => ""
        case n: Number =>
          val u = java.lang.Long.toUnsignedString(n.longValue ^ Long.MinValue)
          "0" * (20 - u.length) + u
        case s => s.toString
      }
      val entries = entries0.sortBy(e =>
        partType.map { case (nm, _) =>
          sortKey(e.dataFile.partition.getOrElse(nm, null))
        }.mkString("\u0000") + "\u0000" + e.dataFile.path)
      entries.grouped(maxEntriesPerManifest).map { chunk =>
        val mpath = root.resolve("metadata")
          .resolve(f"manifest-$snapshotId%05d-$token%s-rw-$idx%03d.avro")
        idx += 1
        writeManifest(mpath, partType, chunk, meta.formatVersion)
        manifestRecord(mpath, snapshotId, partType, chunk, specId).copy(
          content = content,
          // min over carried entries; commitSnapshot preserves it while
          // stamping sequence_number to the new commit's sequence
          minSequenceNumber =
            chunk.map(_.dataFile.sequenceNumber).reduceOption(_ min _)
              .getOrElse(0L))
      }.toSeq
    }
    faultHook("manifests-written")

    commitSnapshot(spark, root, IcebergMeta.sparkSchema(meta), Nil,
      Some(meta), baseVersion, snapshotId, timestampMs, manifests,
      operation = "replace", formatVersion = meta.formatVersion,
      summary = Map("graft.manifests-only" -> "true"), token = token)
    ManifestRewriteReport(Some(snapshotId), listed.size, manifests.size,
      carried.map(_._2.size).sum)
  }

  /** Partition record layout for a rewritten manifest: field order from
    * the recorded spec, value types recovered from the carried entries
    * themselves (the current table schema may have dropped or renamed a
    * source column an OLD spec's manifests still lay out by — deriving
    * from entry values sidesteps resolving dead source ids). An all-null
    * partition field types as string: every type encodes null identically
    * in the nullable Avro union.
    */
  private def partTypeFor(
      meta: IcebergMeta.TableMeta,
      specId: Int,
      entries: Seq[IcebergMeta.ManifestEntry]): Seq[(String, DataType)] =
    meta.specFields(specId)
      // only fields the carried entries actually recorded: delete-file
      // manifests (and pre-spec flat manifests) store an EMPTY partition
      // record even on a partitioned table — forcing the spec's fields
      // onto them would fabricate all-null summaries and break the
      // summary rollup's strict key lookup
      .filter(pf => entries.exists(_.dataFile.partition.contains(pf.name)))
      .map { pf =>
        val dt = entries.iterator
          .map(_.dataFile.partition.getOrElse(pf.name, null))
          .collectFirst {
            case _: java.lang.Integer => IntegerType
            case _: java.lang.Long    => LongType
            case _: String            => StringType
          }
          .getOrElse(StringType)
        pf.name -> dt
      }

  /** SCHEMA EVOLUTION — add an OPTIONAL column (spec: adds must be
    * optional; a required add would instantly invalidate every existing
    * file). Metadata-only: a new schema (fresh schema-id, fresh field
    * id from last-column-id) becomes current; NO snapshot is written,
    * because no data changed. The read side already carries the other
    * half: the metadata schema drives the parquet read, so files
    * written before the add read the new column as null, and each
    * snapshot's logged schema-id means time travel shows the table AS
    * IT WAS (pre-evolution snapshots keep the old shape). Appends after
    * the add must carry the new column — the append schema gate now
    * checks against the evolved schema. Returns the new schema id.
    */
  def addColumn(
      tablePath: String,
      name: String,
      typeName: String,
      timestampMs: Long): Int = {
    val meta = IcebergMeta.load(tablePath)
    require(!meta.fields.exists(_.name == name),
      s"column '$name' already exists in the table schema")
    // validate the primitive BEFORE touching metadata: the reverse
    // mapping throws on names the reader could never scan. Lists are
    // refused here (not just unvalidated): this path writes the type as
    // a STRING node, and the spec's list form is a nested object — a
    // textual "list<…>" would be metadata only this reader understands.
    require(!typeName.startsWith("list<"),
      "addColumn supports primitive types only; create list columns at " +
        "table creation (the schema writer emits the spec's nested form)")
    IcebergMeta.sparkSchema(Seq(IcebergMeta.Field(0, name, false, typeName))): Unit

    val baseVersion = meta.loadedVersion
    val root = meta.root
    val node = mapper.readTree(Files.readString(
      root.resolve("metadata").resolve(s"v$baseVersion.metadata.json")))
      .asInstanceOf[ObjectNode]
    require(node.has("schemas"),
      "metadata has no schemas array; refusing to evolve a shape this writer doesn't understand")
    val schemasArr = node.withArray[ArrayNode]("schemas")
    val curId = node.path("current-schema-id").asInt(0)
    val cur = (0 until schemasArr.size()).map(schemasArr.get)
      .find(_.path("schema-id").asInt(0) == curId)
      .getOrElse(schemasArr.get(0)).asInstanceOf[ObjectNode]
    val newId = (0 until schemasArr.size())
      .map(schemasArr.get(_).path("schema-id").asInt(0)).max + 1
    val newFieldId =
      math.max(node.path("last-column-id").asInt(0),
        meta.fields.map(_.id).max) + 1

    val evolved = cur.deepCopy[ObjectNode]()
    evolved.put("schema-id", newId)
    val f = evolved.withArray[ArrayNode]("fields").addObject()
    f.put("id", newFieldId)
    f.put("name", name)
    f.put("required", false)
    f.put("type", typeName)
    schemasArr.add(evolved)
    node.put("current-schema-id", newId)
    node.put("last-column-id", newFieldId)
    node.put("last-updated-ms", timestampMs)
    // v1 metadata also carries the singular schema node — keep it in step
    if (node.has("schema"))
      node.set[ObjectNode]("schema", evolved.deepCopy[ObjectNode]())

    commitMetadataJson(root, baseVersion + 1, node, "evolve")
    notifyCommit(root.toString)
    newId
  }

  /** SCHEMA EVOLUTION — rename a column, metadata-only. The field KEEPS
    * its id, and because every data/eq-delete parquet of this writer's
    * tables carries field ids in its footers (and reads resolve by id —
    * [[IcebergMeta.sparkSchema]]), files written under the old name keep
    * reading correctly under the new one; no data moves. Time travel to a
    * pre-rename snapshot shows the old name (snapshot-scoped schema ids).
    *
    * Refused on: tables without the field-id marker (their files resolve
    * by name — a rename would silently null the column for every old
    * file), and columns a partition spec references (identity layouts
    * name their directories after the column; transformed layouts embed
    * the source name in the partition field name). Returns the new
    * schema id.
    */
  def renameColumn(
      tablePath: String,
      from: String,
      to: String,
      timestampMs: Long): Int = {
    val meta = IcebergMeta.load(tablePath)
    val field = meta.fields.find(_.name == from).getOrElse(
      throw new IllegalArgumentException(s"column '$from' does not exist"))
    require(!meta.fields.exists(_.name == to),
      s"column '$to' already exists in the table schema")
    requireFieldIdStamped(meta, "renameColumn")
    requireNotPartitionSource(meta, field, "rename")
    evolveSchemaFields(meta, timestampMs) { f =>
      if (f.path("id").asInt() == field.id)
        Some(f.deepCopy[ObjectNode]().put("name", to))
      else Some(f.deepCopy[ObjectNode]())
    }
  }

  /** SCHEMA EVOLUTION — drop a column, metadata-only: the field leaves
    * the current schema; old data files keep the physical column, which
    * readers simply never request again. `last-column-id` is NOT lowered,
    * so a later [[addColumn]] of the same name allocates a FRESH field
    * id — and because reads resolve by id, the re-added column reads as
    * null over every pre-drop file instead of resurrecting the dropped
    * values (the classic lakehouse-correctness trap name-based
    * resolution falls into). Time travel to a pre-drop snapshot still
    * shows the column. Returns the new schema id.
    *
    * Refused on: unmarked tables (same reason as rename), partition
    * source columns, the last remaining column, and columns a LIVE
    * equality delete references (the current snapshot could no longer be
    * read; compact first, then drop).
    */
  def dropColumn(
      tablePath: String,
      name: String,
      timestampMs: Long): Int = {
    val meta = IcebergMeta.load(tablePath)
    val field = meta.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column '$name' does not exist"))
    require(meta.fields.size > 1, "cannot drop the last remaining column")
    requireFieldIdStamped(meta, "dropColumn")
    requireNotPartitionSource(meta, field, "drop")
    val liveEqIds = meta.currentSnapshot.toSeq
      .flatMap(s => IcebergMeta.planScan(meta, s).deletes)
      .filter(_.content == 2).flatMap(_.equalityIds).toSet
    require(!liveEqIds.contains(field.id),
      s"column '$name' is referenced by a live equality delete; " +
        "compact the table first, then drop")
    evolveSchemaFields(meta, timestampMs) { f =>
      if (f.path("id").asInt() == field.id) None
      else Some(f.deepCopy[ObjectNode]())
    }
  }

  /** SCHEMA EVOLUTION — widen a column's type, metadata-only. The spec
    * sanctions exactly the lossless promotions: int -> long and float ->
    * double. Old data files keep their narrow physical type; Spark's
    * parquet reader upcasts INT32 -> LongType / FLOAT -> DoubleType at
    * scan time against the requested (promoted) schema, so no data
    * rewrite is needed. Appends after the promotion must carry the wide
    * type (the append gate tracks the evolved schema); time travel to a
    * pre-promotion snapshot shows the narrow type. Returns the new
    * schema id.
    */
  /** TABLE PROPERTIES — metadata-only key/value configuration (spec
    * `properties`): retention windows, write targets, ownership tags —
    * the knobs schedulers and catalogs read without opening a single
    * data file. Set/remove bump the metadata version and carry the rest
    * of the JSON verbatim, exactly like the schema-evolution ops; no
    * snapshot is written because no data changed. The writer-internal
    * field-ids marker ([[IcebergMeta.FieldIdsProperty]]) is refused in
    * both directions — flipping it would silently change how every
    * existing parquet resolves its columns.
    */
  /** SORT ORDER — declare the table's write clustering (spec
    * `sort-orders` / `default-sort-order-id`; SQL `ALTER TABLE ... WRITE
    * ORDERED BY`). Metadata-only: existing files don't move — the order
    * is a CONTRACT for future writes, and [[compact]] (and therefore the
    * maintenance policy) honors it by range-clustering its rewrite on
    * these columns, which is what turns the declaration into disjoint
    * per-file bounds and real file-level data skipping. Identity columns
    * only (what this writer can lay out); ascending, nulls-first —
    * the spec defaults. Returns the new order id.
    */
  def setSortOrder(
      tablePath: String,
      columns: Seq[String],
      timestampMs: Long): Int = {
    require(columns.nonEmpty, "sort order needs at least one column")
    val meta = IcebergMeta.load(tablePath)
    val ids = columns.map { c =>
      meta.fields.find(_.name == c).getOrElse(throw new IllegalArgumentException(
        s"sort column '$c' does not exist in the table schema")).id
    }
    val baseVersion = meta.loadedVersion
    val root = meta.root
    val node = mapper.readTree(Files.readString(
      root.resolve("metadata").resolve(s"v$baseVersion.metadata.json")))
      .asInstanceOf[ObjectNode]
    val arr =
      if (node.has("sort-orders")) node.withArray[ArrayNode]("sort-orders")
      else node.putArray("sort-orders")
    val newId = (0 until arr.size())
      .map(arr.get(_).path("order-id").asInt(0)).maxOption.getOrElse(-1) + 1
    val so = arr.addObject()
    so.put("order-id", newId)
    val fs = so.putArray("fields")
    ids.foreach { id =>
      val f = fs.addObject()
      f.put("transform", "identity")
      f.put("source-id", id)
      f.put("direction", "asc")
      f.put("null-order", "nulls-first")
    }
    node.put("default-sort-order-id", newId)
    node.put("last-updated-ms", timestampMs)
    commitMetadataJson(root, baseVersion + 1, node, "sortorder")
    notifyCommit(root.toString)
    newId
  }

  def setProperties(
      tablePath: String,
      props: Map[String, String],
      timestampMs: Long): Unit =
    updateProperties(tablePath, timestampMs, add = props, remove = Set.empty)

  def removeProperties(
      tablePath: String,
      keys: Set[String],
      timestampMs: Long): Unit =
    updateProperties(tablePath, timestampMs, add = Map.empty, remove = keys)

  private def updateProperties(
      tablePath: String,
      timestampMs: Long,
      add: Map[String, String],
      remove: Set[String]): Unit = {
    require(add.nonEmpty || remove.nonEmpty, "nothing to update")
    require(!add.contains(IcebergMeta.FieldIdsProperty) &&
      !remove.contains(IcebergMeta.FieldIdsProperty),
      s"'${IcebergMeta.FieldIdsProperty}' is writer-internal: it records " +
        "how existing files resolve columns and cannot be edited")
    val meta = IcebergMeta.load(tablePath)
    val baseVersion = meta.loadedVersion
    val root = meta.root
    val node = mapper.readTree(Files.readString(
      root.resolve("metadata").resolve(s"v$baseVersion.metadata.json")))
      .asInstanceOf[ObjectNode]
    val p =
      if (node.has("properties")) node.get("properties").asInstanceOf[ObjectNode]
      else node.putObject("properties")
    add.foreach { case (k, v) => p.put(k, v) }
    remove.foreach(p.remove)
    node.put("last-updated-ms", timestampMs)
    commitMetadataJson(root, baseVersion + 1, node, "properties")
    notifyCommit(root.toString)
  }

  def promoteColumn(
      tablePath: String,
      name: String,
      toType: String,
      timestampMs: Long): Int = {
    val meta = IcebergMeta.load(tablePath)
    val field = meta.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column '$name' does not exist"))
    val allowed = Map("int" -> "long", "float" -> "double")
    require(allowed.get(field.typeName).contains(toType),
      s"cannot promote '$name' from ${field.typeName} to $toType " +
        "(spec-sanctioned promotions: int->long, float->double)")
    // no field-id requirement: promotion keeps the name, so it is safe
    // under name OR id resolution — only the requested type widens
    // a partition source's transformed layout values are typed by the
    // source: identity/truncate dirs of int files would re-parse as long
    // — refusable now, revisit if a real table needs it
    requireNotPartitionSource(meta, field, "promote")
    evolveSchemaFields(meta, timestampMs) { f =>
      if (f.path("id").asInt() == field.id)
        Some(f.deepCopy[ObjectNode]().put("type", toType))
      else Some(f.deepCopy[ObjectNode]())
    }
  }

  private def requireFieldIdStamped(
      meta: IcebergMeta.TableMeta, op: String): Unit =
    require(meta.fieldIdStamped,
      s"$op requires a table whose files carry parquet field ids " +
        s"(property ${IcebergMeta.FieldIdsProperty}); this table's files " +
        "resolve by NAME, so the operation would silently corrupt reads " +
        "of pre-evolution files")

  private def requireNotPartitionSource(
      meta: IcebergMeta.TableMeta, field: IcebergMeta.Field, op: String): Unit =
    // EVERY spec the table ever used, not just the default: an identity
    // layout from a retired spec still reconstitutes its column from
    // `<name>=<value>` directories by the CURRENT name
    require(!meta.specsById.values.flatten.exists(pf =>
      pf.sourceId == field.id || pf.name == field.name),
      s"cannot $op column '${field.name}': a partition spec references " +
        "it (directory layouts and partition field names bind to the " +
        "source column's name)")

  /** PARTITION SPEC EVOLUTION — change how FUTURE writes are laid out,
    * metadata-only: a new spec (fresh spec-id) becomes the default; NO
    * snapshot is written and no data moves. Manifests remember the spec
    * they were written under, so planning prunes each manifest via ITS
    * spec: new-spec manifests prune on the new layout, pre-evolution
    * manifests (whose spec may not contain the predicate column at all)
    * are read in full — conservative-correct; the caller's residual row
    * filter does the rest. Reads group data files by spec so mixed
    * directory layouts coexist; a later [[compact]] rewrites the whole
    * table under the new default, completing the migration physically.
    * `partition = None` evolves to an unpartitioned layout. Returns the
    * new spec id.
    */
  def evolveSpec(
      tablePath: String,
      partition: Option[PartitionTransform],
      timestampMs: Long): Int =
    evolveSpec(tablePath, partition.toSeq, timestampMs)

  /** Multi-field flavor of [[evolveSpec]]; empty = unpartitioned. */
  def evolveSpec(
      tablePath: String,
      partitions: Seq[PartitionTransform],
      timestampMs: Long): Int = {
    val meta = IcebergMeta.load(tablePath)
    val schema = IcebergMeta.sparkSchema(meta)
    require(partitions.map(_.fieldName).distinct.size == partitions.size,
      s"partition field names collide: ${partitions.map(_.fieldName).mkString(",")}")
    partitions.foreach { p =>
      require(meta.fields.exists(_.name == p.source),
        s"partition source '${p.source}' is not in the table schema")
      transformedSparkType(p, schema): Unit // refuse unwritable transforms
    }
    val baseVersion = meta.loadedVersion
    val root = meta.root
    val node = mapper.readTree(Files.readString(
      root.resolve("metadata").resolve(s"v$baseVersion.metadata.json")))
      .asInstanceOf[ObjectNode]
    require(node.has("partition-specs") && node.has("default-spec-id"),
      "spec evolution requires the modern partition-specs metadata shape " +
        "(create the table as format v2)")
    val specsArr = node.withArray[ArrayNode]("partition-specs")
    val newId = (0 until specsArr.size())
      .map(specsArr.get(_).path("spec-id").asInt(0)).max + 1
    // partition field ids are unique across ALL of a table's specs
    val lastPartId = node.path("last-partition-id").asInt(999)
    val sp = specsArr.addObject()
    sp.put("spec-id", newId)
    val fieldsArr = sp.putArray("fields")
    partitions.zipWithIndex.foreach { case (p, i) =>
      val f = fieldsArr.addObject()
      f.put("name", p.fieldName)
      f.put("transform", p.transform)
      f.put("source-id", meta.fields.find(_.name == p.source).get.id)
      f.put("field-id", lastPartId + 1 + i)
    }
    if (partitions.nonEmpty)
      node.put("last-partition-id", lastPartId + partitions.size): Unit
    node.put("default-spec-id", newId)
    node.put("last-updated-ms", timestampMs)
    commitMetadataJson(root, baseVersion + 1, node, "evolvespec")
    notifyCommit(root.toString)
    newId
  }

  /** Shared metadata tail of rename/drop: map the CURRENT schema's field
    * nodes through `f` (None = drop the field), commit the result as a
    * fresh schema id. Mirrors [[addColumn]]'s verbatim-JSON discipline.
    */
  private def evolveSchemaFields(
      meta: IcebergMeta.TableMeta,
      timestampMs: Long)(f: ObjectNode => Option[ObjectNode]): Int = {
    val tablePath = meta.root.toString
    val baseVersion = meta.loadedVersion
    val root = meta.root
    val node = mapper.readTree(Files.readString(
      root.resolve("metadata").resolve(s"v$baseVersion.metadata.json")))
      .asInstanceOf[ObjectNode]
    require(node.has("schemas"),
      "metadata has no schemas array; refusing to evolve a shape this writer doesn't understand")
    val schemasArr = node.withArray[ArrayNode]("schemas")
    val curId = node.path("current-schema-id").asInt(0)
    val cur = (0 until schemasArr.size()).map(schemasArr.get)
      .find(_.path("schema-id").asInt(0) == curId)
      .getOrElse(schemasArr.get(0)).asInstanceOf[ObjectNode]
    val newId = (0 until schemasArr.size())
      .map(schemasArr.get(_).path("schema-id").asInt(0)).max + 1

    val evolved = cur.deepCopy[ObjectNode]()
    evolved.put("schema-id", newId)
    val oldFields = evolved.withArray[ArrayNode]("fields")
    val mapped = (0 until oldFields.size()).map(oldFields.get)
      .flatMap(n => f(n.asInstanceOf[ObjectNode]))
    oldFields.removeAll()
    mapped.foreach(oldFields.add)
    schemasArr.add(evolved)
    node.put("current-schema-id", newId)
    node.put("last-updated-ms", timestampMs)
    if (node.has("schema"))
      node.set[ObjectNode]("schema", evolved.deepCopy[ObjectNode]())

    commitMetadataJson(root, baseVersion + 1, node, "evolve")
    notifyCommit(root.toString)
    newId
  }

  /** The atomic metadata-commit tail shared by EVERY metadata mutation
    * (snapshot commits, schema evolution, snapshot expiry): write the
    * new vN.metadata.json, then flip version-hint.text via a tmp file +
    * ATOMIC_MOVE — readers either see the old complete version or the
    * new complete version, never a hint to a half-written file. This is
    * THE crash-safety primitive of the whole writer; any future
    * hardening (fsync, rename-failure fallback) lands here once.
    */
  // -------------------------------------------------------------------
  // refs: branches & tags (spec §Refs) — write-audit-publish
  // -------------------------------------------------------------------

  /** Create a branch ref at `fromSnapshotId` (default: the current
    * snapshot). Metadata-only; subsequent [[appendPartitioned]] calls
    * with `branch = Some(name)` advance it without moving main, and
    * [[fastForward]] publishes it. Create-once: a name in use (branch OR
    * tag) is refused — re-pointing is an explicit drop + create.
    */
  def createBranch(
      tablePath: String,
      name: String,
      timestampMs: Long,
      fromSnapshotId: Option[Long] = None): Unit =
    setRef(tablePath, name, "branch", fromSnapshotId, timestampMs)

  /** Create an immutable tag ref at `atSnapshotId` (default: the current
    * snapshot) — a name for "the exact file set training run X read",
    * surviving any number of later commits and publishes.
    */
  def createTag(
      tablePath: String,
      name: String,
      timestampMs: Long,
      atSnapshotId: Option[Long] = None): Unit =
    setRef(tablePath, name, "tag", atSnapshotId, timestampMs)

  private def setRef(
      tablePath: String,
      name: String,
      refType: String,
      snapshotId: Option[Long],
      timestampMs: Long): Unit = {
    val meta = IcebergMeta.load(tablePath)
    require(name != IcebergMeta.MainBranch,
      "'main' is the implicit branch over current-snapshot-id; it cannot be created")
    require(name.nonEmpty && !name.exists(c => c == '/' || c.isWhitespace),
      s"invalid ref name '$name'")
    require(!meta.refs.contains(name),
      s"ref '$name' already exists (${meta.refs(name).refType}); drop it first")
    // the target must be a real snapshot — resolve BEFORE touching metadata
    val target = snapshotId.map(meta.snapshotById).orElse(meta.currentSnapshot)
      .getOrElse(throw new IllegalStateException(
        s"cannot create a ref on a table with no snapshots: $tablePath"))
    val baseVersion = meta.loadedVersion
    val root = meta.root
    val node = mapper.readTree(Files.readString(
      root.resolve("metadata").resolve(s"v$baseVersion.metadata.json")))
      .asInstanceOf[ObjectNode]
    val refsNode =
      if (node.has("refs")) node.path("refs").asInstanceOf[ObjectNode]
      else node.putObject("refs")
    val entry = refsNode.putObject(name)
    entry.put("snapshot-id", target.id)
    entry.put("type", refType)
    node.put("last-updated-ms", timestampMs)
    commitMetadataJson(root, baseVersion + 1, node, s"ref-$name")
    notifyCommit(root.toString)
  }

  /** Drop a branch or tag ref. Metadata-only; the snapshots it pointed at
    * stay until [[expireSnapshots]] reclaims them (ref heads are expiry-
    * protected only while the ref exists).
    */
  def dropRef(tablePath: String, name: String, timestampMs: Long): Unit = {
    val meta = IcebergMeta.load(tablePath)
    require(meta.refs.contains(name), s"ref '$name' does not exist")
    val baseVersion = meta.loadedVersion
    val root = meta.root
    val node = mapper.readTree(Files.readString(
      root.resolve("metadata").resolve(s"v$baseVersion.metadata.json")))
      .asInstanceOf[ObjectNode]
    node.path("refs").asInstanceOf[ObjectNode].remove(name)
    node.put("last-updated-ms", timestampMs)
    commitMetadataJson(root, baseVersion + 1, node, s"refdrop-$name")
    notifyCommit(root.toString)
  }

  /** PUBLISH: fast-forward main to a branch's head. Requires main to be
    * an ancestor of (or equal to) the branch head — the branch must
    * contain main's history, else the "fast-forward" would silently drop
    * main-only commits (that divergence needs an explicit merge policy,
    * refused here). The branch ref survives the publish (it now equals
    * main). Returns the published snapshot id.
    *
    * This is the atomic flip of write-audit-publish: the audited branch
    * state becomes what every plain read sees, in ONE metadata commit.
    */
  def fastForward(tablePath: String, branch: String, timestampMs: Long): Long = {
    val meta = IcebergMeta.load(tablePath)
    val ref = meta.refs.getOrElse(branch,
      throw new IllegalArgumentException(s"branch '$branch' does not exist"))
    require(ref.refType == "branch", s"ref '$branch' is a tag, not a branch")
    val head = ref.snapshotId
    val current = meta.currentSnapshotId
    // walk head's parent chain; main must appear on it (or be unset)
    val ancestors = Iterator.iterate(Option(meta.snapshotById(head))) {
      case Some(s) => s.parentId.flatMap(p => meta.snapshots.find(_.id == p))
      case None => None
    }.takeWhile(_.isDefined).flatten.map(_.id).toSet
    current.foreach(c => require(ancestors.contains(c),
      s"main ($c) is not an ancestor of branch '$branch' head ($head); " +
        "fast-forward would drop main-only commits"))
    if (current.contains(head)) return head // already published

    val baseVersion = meta.loadedVersion
    val root = meta.root
    val node = mapper.readTree(Files.readString(
      root.resolve("metadata").resolve(s"v$baseVersion.metadata.json")))
      .asInstanceOf[ObjectNode]
    node.put("current-snapshot-id", head)
    node.put("last-updated-ms", timestampMs)
    val log = node.withArray[ArrayNode]("snapshot-log").addObject()
    log.put("snapshot-id", head)
    log.put("timestamp-ms", timestampMs)
    commitMetadataJson(root, baseVersion + 1, node, s"publish-$branch")
    notifyCommit(root.toString)
    head
  }

  /** ROLLBACK: move main back to an ANCESTOR snapshot — the "yesterday's
    * commit poisoned the table" undo. Metadata-only and instant: the
    * rolled-past snapshots stay in history (still time-travelable, and
    * [[IcebergMetaTables.history]] shows them with is_current_ancestor =
    * false) until expiry reclaims them. The target must be on main's
    * ancestry — moving FORWARD is [[fastForward]]'s job, and moving onto
    * a branch snapshot needs an explicit publish, not a "rollback". A
    * later append parents at the rollback target, diverging history
    * exactly like git reset + commit. Returns the new current id.
    */
  def rollbackTo(
      tablePath: String,
      snapshotId: Long,
      timestampMs: Long): Long = {
    val meta = IcebergMeta.load(tablePath)
    val current = meta.currentSnapshot.getOrElse(
      throw new IllegalStateException("table has no current snapshot"))
    meta.snapshotById(snapshotId): Unit // unknown id: the standard error
    val ancestors = Iterator.iterate(Option(current)) {
      case Some(s) => s.parentId.flatMap(p => meta.snapshots.find(_.id == p))
      case None => None
    }.takeWhile(_.isDefined).flatten.map(_.id).toSet
    require(ancestors.contains(snapshotId),
      s"snapshot $snapshotId is not an ancestor of the current snapshot " +
        s"(${current.id}) — rollback only moves main BACK along its own " +
        "history (fastForward publishes a branch)")
    if (snapshotId == current.id) return snapshotId

    val baseVersion = meta.loadedVersion
    val root = meta.root
    val node = mapper.readTree(Files.readString(
      root.resolve("metadata").resolve(s"v$baseVersion.metadata.json")))
      .asInstanceOf[ObjectNode]
    node.put("current-snapshot-id", snapshotId)
    node.put("last-updated-ms", timestampMs)
    val log = node.withArray[ArrayNode]("snapshot-log").addObject()
    log.put("snapshot-id", snapshotId)
    log.put("timestamp-ms", timestampMs)
    commitMetadataJson(root, baseVersion + 1, node, s"rollback-$snapshotId")
    notifyCommit(root.toString)
    snapshotId
  }

  /** Branch append with the table's own partition spec (the declared-
    * partitions match gate is satisfied from metadata, so callers don't
    * restate the layout). The WAP write step.
    */
  def appendToBranch(
      spark: SparkSession,
      tablePath: String,
      df: DataFrame,
      branch: String,
      timestampMs: Long,
      summary: Map[String, String] = Map.empty): Long = {
    require(IcebergMeta.hasMetadata(tablePath),
      s"branch append requires an existing table; $tablePath has no metadata")
    val m = IcebergMeta.load(tablePath)
    val parts = m.partitionFields.map(pf => PartitionTransform(
      m.fields.find(_.id == pf.sourceId).map(_.name).getOrElse(
        throw new IllegalStateException(
          s"partition spec source id ${pf.sourceId} not in schema")),
      pf.transform))
    appendImpl(spark, tablePath, df, parts, timestampMs,
      m.formatVersion, summary, Some(branch))
  }

  /** Thrown when another writer committed the metadata version this
    * commit targeted — the optimistic-concurrency signal. Appends catch
    * it and retry against the reloaded table (appends commute);
    * row-level writes and evolutions propagate it, because re-applying
    * a decision made on stale state needs the CALLER's judgment.
    */
  final class CommitConflictException(version: Int, tablePath: String)
    extends RuntimeException(
      s"metadata version v$version of $tablePath was committed by a " +
        "concurrent writer (optimistic-concurrency conflict)")

  /** The metadata COMMIT: claim `v<version>.metadata.json` with an
    * atomic create-new (the compare-and-swap deciding every writer
    * race — POSIX rename replaces, so reservation is the portable CAS),
    * fill it, then flip the version hint MONOTONICALLY. Everything the
    * json references (manifest lists, manifests, data files) is durable
    * before this runs, so the version file existing IS the commit; the
    * hint is a discovery pointer that [[repairVersionHint]] can always
    * fast-forward from the version files themselves.
    */
  private def commitMetadataJson(
      root: Path,
      version: Int,
      node: ObjectNode,
      tmpTag: String): Unit = {
    val mdir = root.resolve("metadata")
    val target = mdir.resolve(s"v$version.metadata.json")
    try Files.createFile(target)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(version, root.toString)
    }
    // reserved: fill via tmp + atomic replace so no reader ever parses a
    // half-written json (readers discover via the hint, flipped below,
    // or via repairVersionHint, which parse-checks)
    val tmpJson = mdir.resolve(s".v$version.$tmpTag.json.tmp")
    Files.writeString(tmpJson,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node))
    Files.move(tmpJson, target,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    flipHintMonotonic(root, version, tmpTag)
  }

  /** Flip version-hint.text to `version` iff it advances it. The
    * read-compare-move runs under a tiny create-new lock file so two
    * finishing writers can't regress the hint (A commits v5, B commits
    * v6, A's flip landing last must not point readers back at v5); a
    * lock abandoned by a crash is stolen after 5s of idleness.
    */
  private def flipHintMonotonic(root: Path, version: Int, tmpTag: String): Unit = {
    val mdir = root.resolve("metadata")
    val lock = mdir.resolve(".version-hint.lock")
    val deadline = System.nanoTime() + 10_000_000_000L
    var held = false
    while (!held) {
      try { Files.createFile(lock); held = true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          try {
            val age = System.currentTimeMillis() -
              Files.getLastModifiedTime(lock).toMillis
            if (age > 5000) Files.deleteIfExists(lock): Unit
          } catch { case _: java.io.IOException => () }
          if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"version-hint lock of $root held too long; a crashed " +
                "writer's lock is stolen after 5s — this one is live")
          Thread.sleep(1)
      }
    }
    try {
      val hint = mdir.resolve("version-hint.text")
      val cur =
        if (Files.exists(hint)) Files.readString(hint).trim.toInt else 0
      if (version > cur) {
        val tmp = mdir.resolve(s".version-hint.$tmpTag.tmp")
        Files.writeString(tmp, version.toString)
        Files.move(tmp, hint,
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE): Unit
      }
    } finally Files.deleteIfExists(lock): Unit
  }

  /** Fast-forward the version hint to the newest PARSEABLE committed
    * version file — the conflict-loser's view repair (the winner may not
    * have flipped the hint yet when the loser reloads) and the recovery
    * for a writer that crashed between reserving the version file and
    * filling it (that half-commit parses as empty and is skipped; the
    * next writer's CAS will then conflict on it and ALSO repair past it
    * only when a later version exists — an abandoned reservation needs
    * the operator to delete it, loudly discoverable here).
    */
  private[sources] def repairVersionHint(root: Path): Unit = {
    val mdir = root.resolve("metadata")
    if (!Files.isDirectory(mdir)) return
    val versions = {
      val s = Files.list(mdir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case VersionFileName(n) => n.toInt }
        .toSeq
      finally s.close()
    }
    val committed = versions.sorted(Ordering[Int].reverse).find { v =>
      try {
        val n = mapper.readTree(Files.readString(
          mdir.resolve(s"v$v.metadata.json")))
        // an EMPTY reservation parses as MissingNode (Jackson returns it,
        // not null, for empty input) — only a real json object with
        // content counts as committed
        n != null && n.isObject && n.size() > 0
      } catch { case _: Exception => false }
    }
    committed.foreach(v => flipHintMonotonic(root, v, "repair"))
  }

  private val VersionFileName = "v(\\d+)\\.metadata\\.json".r

  /** SNAPSHOT EXPIRY + orphan GC (the other half of table maintenance —
    * [[compact]] retires delete files logically; nothing reclaims bytes
    * until the snapshots referencing the old files are dropped): remove
    * every snapshot older than `olderThanMs` (the current snapshot is
    * always kept regardless of age) from the table metadata, then delete
    * data/delete files and manifest/list Avros no remaining snapshot
    * references. Returns the expired snapshot ids.
    *
    * Ordering is the crash-safety argument: the shrunk metadata commits
    * FIRST (same verbatim-JSON + atomic-hint discipline as every other
    * commit), file deletion runs after — a crash at any point leaves
    * either the old fully-referenced table or a new consistent one with
    * some unreclaimed orphans that a rerun deletes; dangling references
    * are impossible. Time travel to an expired snapshot now fails with
    * the standard not-found error, which is the spec-intended trade:
    * history retention is exactly the expiry policy.
    */
  def expireSnapshots(
      tablePath: String,
      olderThanMs: Long,
      timestampMs: Long,
      faultHook: String => Unit = _ => (),
      // count-based retention, composed with the time cutoff: the
      // `retainLast` NEWEST snapshots survive even when older than the
      // cutoff (the "always keep a week of rollback points" policy).
      // 1 = the time cutoff alone decides (current is always kept).
      retainLast: Int = 1): Seq[Long] = {
    require(retainLast >= 1, "retainLast must keep at least the current snapshot")
    val meta = IcebergMeta.load(tablePath)
    val root = meta.root
    val current = meta.currentSnapshot.getOrElse(
      throw new IllegalStateException("table has no current snapshot"))
    val newestIds = meta.snapshots.sortBy(s => (s.timestampMs, s.id))
      .takeRight(retainLast).map(_.id).toSet
    // ref HEADS are expiry-protected while the ref exists: an audit
    // branch's unpublished state or a pinned tag must not age out from
    // under its name. (Non-head branch ancestors expire normally — same
    // trade as main's history; the head's manifest list keeps every LIVE
    // file reachable, so GC never deletes branch data.)
    val refHeads = meta.refs.values.map(_.snapshotId).toSet
    val expired = meta.snapshots.filter(s =>
      s.timestampMs < olderThanMs && s.id != current.id &&
        !newestIds.contains(s.id) && !refHeads.contains(s.id))
    // NOTE: no early return when nothing expires — the GC pass below
    // still runs (referenced = every snapshot's files), which is what
    // lets a rerun reclaim orphans a crash-between-commit-and-GC left
    val keep = meta.snapshots.filterNot(s => expired.exists(_.id == s.id))

    def norm(p: String): String = {
      val stripped = p.stripPrefix("file:")
      val path = Paths.get(stripped)
      (if (path.isAbsolute) path else root.resolve(stripped))
        .toAbsolutePath.normalize.toString
    }
    // everything the REMAINING snapshots can reach: manifest lists,
    // manifests, data + delete files — KB-scale metadata walking
    val referenced = scala.collection.mutable.Set.empty[String]
    keep.foreach { s =>
      referenced += norm(s.manifestList)
      IcebergMeta.readManifestListFile(root, s.manifestList).foreach { mf =>
        referenced += norm(mf.path)
        IcebergMeta.readManifest(root, mf.path, mf.addedSnapshotId,
          mf.sequenceNumber).foreach(e => referenced += norm(e.dataFile.path))
      }
    }
    faultHook("computed")

    if (expired.nonEmpty) {
      // metadata first: after this commit the expired snapshots are gone
      // from the table's history; the files become orphans
      val baseVersion = meta.loadedVersion
      val node = mapper.readTree(Files.readString(
        root.resolve("metadata").resolve(s"v$baseVersion.metadata.json")))
        .asInstanceOf[ObjectNode]
      val expiredIds = expired.map(_.id).toSet
      def filterArray(name: String, idField: String): Unit =
        if (node.has(name)) {
          val arr = node.withArray[ArrayNode](name)
          val kept = (0 until arr.size()).map(arr.get)
            .filterNot(n => expiredIds.contains(n.path(idField).asLong()))
          arr.removeAll()
          kept.foreach(arr.add)
          ()
        }
      filterArray("snapshots", "snapshot-id")
      filterArray("snapshot-log", "snapshot-id")
      node.put("last-updated-ms", timestampMs)
      commitMetadataJson(root, baseVersion + 1, node, "expire")
    }
    faultHook("committed")

    // A writer may have COMMITTED between our load and this sweep — its
    // files are not in `referenced` and deleting them would corrupt a
    // committed snapshot. Re-walk any snapshots the CURRENT metadata
    // carries beyond the set we loaded, folding their files into the
    // keep set. (A writer still BETWEEN place and commit is protected by
    // its random token only probabilistically; production deployments
    // should also schedule expiry away from writes or use an age-based
    // orphan policy — the race window here is the re-load-to-delete gap,
    // not the whole expiry run.)
    val freshMeta = IcebergMeta.load(tablePath)
    val known = keep.map(_.id).toSet ++ expired.map(_.id)
    freshMeta.snapshots.filterNot(s => known.contains(s.id)).foreach { s =>
      referenced += norm(s.manifestList)
      IcebergMeta.readManifestListFile(root, s.manifestList).foreach { mf =>
        referenced += norm(mf.path)
        IcebergMeta.readManifest(root, mf.path, mf.addedSnapshotId,
          mf.sequenceNumber).foreach(e => referenced += norm(e.dataFile.path))
      }
    }

    // GC pass: parquet under data/, avro under metadata/ — never the
    // metadata jsons or the hint, which ARE the table's history record
    def sweep(dir: Path, suffix: String): Unit =
      if (Files.isDirectory(dir)) {
        val walk = Files.walk(dir)
        try walk.iterator().asScala
          .filter(p => Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(suffix) &&
            !referenced.contains(p.toAbsolutePath.normalize.toString))
          .foreach(Files.deleteIfExists(_))
        finally walk.close()
      }
    sweep(root.resolve("data"), ".parquet")
    sweep(root.resolve("metadata"), ".avro")
    notifyCommit(root.toString)
    expired.map(_.id)
  }

  /** Shared tail of the two row-level deletes: wrap the delete file in a
    * content=1 delete manifest (empty partition record — the delete
    * applies table-wide; partition-scoped delete manifests are a pruning
    * refinement, not a correctness requirement), carry every current
    * manifest forward, commit as a "delete" snapshot.
    */
  private def commitDeleteFile(
      spark: SparkSession,
      meta: IcebergMeta.TableMeta,
      baseVersion: Option[Int],
      snapshotId: Long,
      timestampMs: Long,
      deleteFile: IcebergMeta.DataFile): Unit = {
    val root = meta.root
    val entry = IcebergMeta.ManifestEntry(status = 1, snapshotId, deleteFile)
    val mpath = root.resolve("metadata")
      .resolve(f"manifest-$snapshotId%05d-del.avro")
    writeManifest(mpath, Nil, Seq(entry), formatVersion = 2)
    val newManifest = manifestRecord(mpath, snapshotId, Nil, Seq(entry))
      .copy(content = 1)
    val carried = IcebergMeta.readManifestListFile(
      root, currentManifestList(meta).toString)
    // partition arg feeds only FRESH-table metadata creation; this table
    // exists (prior = Some), so pass Nil rather than fabricate a spec
    commitSnapshot(spark, root, IcebergMeta.sparkSchema(meta),
      Nil, Some(meta), baseVersion,
      snapshotId, timestampMs, carried :+ newManifest,
      operation = "delete", formatVersion = 2)
  }

  // -----------------------------------------------------------------------
  // snapshot commit: manifest list + metadata json + version hint
  // -----------------------------------------------------------------------

  private def commitSnapshot(
      spark: SparkSession,
      root: Path,
      schema: StructType,
      partition: Seq[PartitionTransform],
      prior: Option[IcebergMeta.TableMeta],
      baseVersion: Option[Int], // the version the caller LOADED — base and
      // version number come from that one read, never a fresh hint
      snapshotId: Long,
      timestampMs: Long,
      manifests: Seq[IcebergMeta.ManifestFile],
      operation: String,
      formatVersion: Int,
      summary: Map[String, String] = Map.empty,
      // Some(name): commit onto that branch — parent = branch head, the
      // ref advances, current-snapshot-id and snapshot-log stay untouched
      branch: Option[String] = None,
      // per-writer token for race-safe manifest-list naming (appends)
      token: String = ""): Unit = {
    // v2: this commit's data sequence number — strictly monotonic from
    // last-sequence-number; the commit's NEW manifests are stamped with
    // it (their entries inherit it on read), carried ones keep their own
    val newSeq = prior.map(_.lastSequenceNumber).getOrElse(0L) + 1L
    val stamped =
      if (formatVersion < 2) manifests
      else manifests.map(m =>
        if (m.addedSnapshotId == snapshotId)
          // a pre-set min (a manifest REWRITE carrying older entries)
          // survives: the spec requires min_sequence_number <= every
          // entry's sequence; stamping it to newSeq would lie upward
          m.copy(sequenceNumber = newSeq,
            minSequenceNumber =
              if (m.minSequenceNumber > 0L) m.minSequenceNumber else newSeq)
        else m)
    val listTok = if (token.isEmpty) "" else s"-$token"
    val listPath = root.resolve("metadata")
      .resolve(f"snap-$snapshotId%05d$listTok-manifest-list.avro")
    writeManifestList(listPath, stamped, formatVersion)

    val version = baseVersion.map(_ + 1).getOrElse(1)
    // Carry the prior metadata's JSON forward VERBATIM and only update
    // what this commit changes. Re-serializing parsed structs would
    // destroy everything the Field/Snapshot model doesn't hold — schemas
    // the lenient reader dropped (nested types), doc/identifier-field
    // attributes, real (non-positional) field ids, last-column-id,
    // partition-spec source ids, summary-less snapshots — silently
    // corrupting any table another writer evolved. Fresh tables get the
    // minimal v1 shape with positional ids.
    val node: ObjectNode = baseVersion match {
      case Some(h) =>
        mapper.readTree(Files.readString(
          root.resolve("metadata").resolve(s"v$h.metadata.json")))
          .asInstanceOf[ObjectNode]
      case None if formatVersion == 2 =>
        // fresh v2 table: the modern metadata shape the spec REQUIRES for
        // v2 (schemas/current-schema-id, partition-specs/default-spec-id,
        // sort-orders, last-sequence-number — the singular v1 fields are
        // not valid here)
        val n = mapper.createObjectNode()
        n.put("format-version", 2)
        n.put("table-uuid", f"00000000-0000-0000-0000-${snapshotId}%012d")
        n.put("last-sequence-number", 0L)
        n.put("last-column-id", lastColumnId(schema))
        n.put("current-schema-id", 0)
        n.putArray("schemas").add(schemaJson(schema))
        n.put("default-spec-id", 0)
        val sp = n.putArray("partition-specs").addObject()
        sp.put("spec-id", 0)
        sp.set[ArrayNode]("fields", specJson(schema, partition))
        n.put("last-partition-id", if (partition.nonEmpty) 999 + partition.size else 999)
        n.put("default-sort-order-id", 0)
        val so = n.putArray("sort-orders").addObject()
        so.put("order-id", 0)
        so.putArray("fields")
        // this writer stamps spec field ids into every parquet footer;
        // the marker is what lets the read side resolve columns by id
        // (and the schema-evolution ops require it)
        n.putObject("properties")
          .put(IcebergMeta.FieldIdsProperty, "true")
        n.putArray("snapshots")
        n.putArray("snapshot-log")
        n
      case None =>
        val n = mapper.createObjectNode()
        n.put("format-version", 1)
        n.put("table-uuid", f"00000000-0000-0000-0000-${snapshotId}%012d")
        n.put("last-column-id", lastColumnId(schema))
        n.set[ObjectNode]("schema", schemaJson(schema))
        n.put("current-schema-id", 0)
        n.putArray("schemas").add(schemaJson(schema))
        n.set[ArrayNode]("partition-spec", specJson(schema, partition))
        n.putObject("properties")
          .put(IcebergMeta.FieldIdsProperty, "true")
        n.putArray("snapshots")
        n.putArray("snapshot-log")
        n
    }
    // location self-heals ONLY when the recorded path is a local path
    // that no longer exists (the table dir was moved) — a resolvable
    // location, or one with a URI scheme this writer can't verify
    // (s3://...), is another writer's metadata and stays verbatim
    val recorded = Option(node.get("location")).map(_.asText())
    val stale = recorded.forall { loc =>
      if (loc.contains("://") && !loc.startsWith("file:")) false // unverifiable: keep
      else !Files.exists(Paths.get(loc.stripPrefix("file:")))
    }
    if (stale) node.put("location", root.toAbsolutePath.toString): Unit
    node.put("last-updated-ms", timestampMs)
    branch match {
      case None =>
        node.put("current-snapshot-id", snapshotId): Unit
      case Some(b) =>
        // only the branch ref moves; main's pointer stays where it was
        val refsNode =
          if (node.has("refs")) node.path("refs").asInstanceOf[ObjectNode]
          else node.putObject("refs")
        val entry = refsNode.putObject(b)
        entry.put("snapshot-id", snapshotId)
        entry.put("type", "branch"): Unit
    }
    if (formatVersion >= 2) node.put("last-sequence-number", newSeq): Unit
    val sn = node.withArray[ArrayNode]("snapshots").addObject()
    sn.put("snapshot-id", snapshotId)
    if (formatVersion >= 2) sn.put("sequence-number", newSeq): Unit
    // parent = the head this commit extended (branch head for branch
    // commits, main for ordinary ones)
    prior.flatMap(m => branch.map(bn => m.snapshotByRef(bn).id)
      .orElse(m.currentSnapshotId))
      .foreach(p => sn.put("parent-snapshot-id", p))
    sn.put("timestamp-ms", timestampMs)
    sn.put("manifest-list", listPath.toAbsolutePath.toString)
    // the new snapshot logs the CURRENT schema id — but only when the
    // table tracks one (a current-schema-id fabricated for a singular-
    // schema table could dangle from its schemas-less metadata)
    if (node.has("current-schema-id"))
      sn.put("schema-id", node.path("current-schema-id").asInt())
    val sum = sn.putObject("summary")
    sum.put("operation", operation)
    summary.foreach { case (k, v) =>
      require(k != "operation", "summary key 'operation' is reserved")
      sum.put(k, v): Unit
    }
    // snapshot-log is the MAIN branch's history (spec): branch commits
    // don't append to it — fastForward logs the publish instead
    if (branch.isEmpty) {
      val log = node.withArray[ArrayNode]("snapshot-log").addObject()
      log.put("snapshot-id", snapshotId)
      log.put("timestamp-ms", timestampMs): Unit
    }

    commitMetadataJson(root, version, node, snapshotId.toString)
    notifyCommit(root.toString)
  }

  private def schemaJson(schema: StructType): ObjectNode = {
    val s = mapper.createObjectNode()
    s.put("type", "struct")
    s.put("schema-id", 0)
    val fields = s.putArray("fields")
    // nested element-ids allocate AFTER the top-level field ids, in field
    // order — deterministic, so re-emitting the schema at every commit
    // (checkSchema pins the StructType itself unchanged) reproduces the
    // identical JSON and the metadata never drifts across snapshots
    var nextId = schema.fields.length
    def alloc(): Int = { nextId += 1; nextId }
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fn = fields.addObject()
      fn.put("id", i + 1)
      fn.put("name", f.name)
      fn.put("required", !f.nullable)
      fn.set[ObjectNode]("type", typeJson(f.dataType, alloc))
    }
    s
  }

  /** The spec's `last-column-id`: the highest field id the schema has
    * ALLOCATED — top-level ids 1..n plus one element-id per list column
    * (the [[typeJson]] allocator hands arrays the ids after the fields,
    * in field order). Writing `fields.length` here would let a later
    * [[addColumn]] mint an id that collides with an existing list
    * element-id — a spec violation an id-resolving reader would misread.
    */
  private def lastColumnId(schema: StructType): Int =
    schema.fields.length +
      schema.fields.count(_.dataType.isInstanceOf[ArrayType])

  /** The metadata-JSON form of one column type: primitives are the spec's
    * type-name strings; a primitive-element list is the spec's nested
    * object (`{"type":"list","element-id":…,"element":…,
    * "element-required":…}`, Iceberg spec "Schemas and Data Types").
    */
  private def typeJson(
      dt: DataType,
      alloc: () => Int): com.fasterxml.jackson.databind.JsonNode = dt match {
    case ArrayType(et, containsNull) =>
      icebergType(dt): Unit // validates: primitive element only
      val n = mapper.createObjectNode()
      n.put("type", "list")
      n.put("element-id", alloc())
      n.put("element", icebergType(et))
      n.put("element-required", !containsNull)
      n
    case prim => mapper.getNodeFactory.textNode(icebergType(prim))
  }

  private def specJson(schema: StructType, partition: Seq[PartitionTransform]): ArrayNode = {
    val arr = mapper.createArrayNode()
    partition.zipWithIndex.foreach { case (p, i) =>
      val idx = schema.fieldIndex(p.source)
      val f = arr.addObject()
      f.put("name", p.fieldName)
      f.put("transform", p.transform)
      f.put("source-id", idx + 1)
      f.put("field-id", 1000 + i)
    }
    arr
  }

  def icebergType(dt: DataType): String = dt match {
    case BooleanType         => "boolean"
    case IntegerType         => "int"
    case LongType            => "long"
    case FloatType           => "float"
    case DoubleType          => "double"
    case StringType          => "string"
    case DateType            => "date"
    case TimestampType       => "timestamptz"
    case BinaryType          => "binary"
    case d: DecimalType      => s"decimal(${d.precision}, ${d.scale})"
    // primitive-element lists (the embedding/token-array columns a
    // training-data table carries). Internal textual encoding — the
    // metadata JSON gets the spec's nested object form via [[typeJson]];
    // this string is the [[IcebergMeta.Field.typeName]] the reader
    // produces for the same shape, so schema checks compare equal.
    // A trailing `!` marks a required (non-null) element.
    case ArrayType(et, containsNull) =>
      val inner = icebergType(et)
      require(!inner.startsWith("list<"),
        s"nested list-of-list not supported: $dt")
      s"list<$inner${if (containsNull) "" else "!"}>"
    case other =>
      throw new UnsupportedOperationException(s"Spark type $other not mapped to Iceberg")
  }

  // -----------------------------------------------------------------------
  // avro manifest / manifest-list writing (spec field names; the records
  // round-trip through IcebergMeta's ManifestFile/ManifestEntry, so the
  // reader and writer share ONE parse of the spec format)
  // -----------------------------------------------------------------------

  private def partitionAvroFields(partType: Seq[(String, DataType)]): String =
    partType.map { case (name, dt) =>
      val avroT = dt match {
        case IntegerType => "\"int\""
        case LongType    => "\"long\""
        case StringType  => "\"string\""
        case other => throw new UnsupportedOperationException(
          s"Partition column type $other not supported")
      }
      s"""{"name":"$name","type":["null",$avroT],"default":null}"""
    }.mkString(",\n    ")

  private def manifestSchema(
      partType: Seq[(String, DataType)], formatVersion: Int): Schema = {
    // v2 adds the sequence-number pair on the entry (null = inherit from
    // the manifest list) and content/equality_ids on data_file
    val v2Entry =
      if (formatVersion < 2) ""
      else
        """{"name":"sequence_number","type":["null","long"],"default":null},
          |{"name":"file_sequence_number","type":["null","long"],"default":null},""".stripMargin
    val v2Content =
      if (formatVersion < 2) ""
      else """{"name":"content","type":"int"},"""
    val v2Equality =
      if (formatVersion < 2) ""
      else
        """,{"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}"""
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int"},
         |{"name":"snapshot_id","type":["null","long"],"default":null},
         |$v2Entry
         |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
         |  $v2Content
         |  {"name":"file_path","type":"string"},
         |  {"name":"file_format","type":"string"},
         |  {"name":"partition","type":{"type":"record","name":"r102","fields":[
         |    ${partitionAvroFields(partType)}]}},
         |  {"name":"record_count","type":"long"},
         |  {"name":"file_size_in_bytes","type":"long"},
         |  {"name":"lower_bounds","type":["null",{"type":"array","items":{
         |    "type":"record","name":"k146","fields":[
         |      {"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}],
         |   "default":null},
         |  {"name":"upper_bounds","type":["null",{"type":"array","items":{
         |    "type":"record","name":"k147","fields":[
         |      {"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}],
         |   "default":null}
         |  $v2Equality
         |]}}]}""".stripMargin)
  }

  private def manifestListSchema(formatVersion: Int): Schema = {
    // v2 manifest lists carry the manifest's content kind and its
    // sequence-number window (required fields in the spec)
    val v2 =
      if (formatVersion < 2) ""
      else
        """{"name":"content","type":"int"},
          |{"name":"sequence_number","type":"long"},
          |{"name":"min_sequence_number","type":"long"},""".stripMargin
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"partition_spec_id","type":"int"},
        |$v2
        |{"name":"added_snapshot_id","type":["null","long"],"default":null},
        |{"name":"partitions","type":["null",{"type":"array","items":{
        |  "type":"record","name":"field_summary","fields":[
        |    {"name":"contains_null","type":"boolean"},
        |    {"name":"lower_bound","type":["null","bytes"],"default":null},
        |    {"name":"upper_bound","type":["null","bytes"],"default":null}]}}],
        | "default":null}]}""".stripMargin)
  }

  private def writeManifest(
      path: Path,
      partType: Seq[(String, DataType)],
      entries: Seq[IcebergMeta.ManifestEntry],
      formatVersion: Int): Unit = {
    val schema = manifestSchema(partType, formatVersion)
    val dfSchema = schema.getField("data_file").schema()
    val pSchema = dfSchema.getField("partition").schema()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path.toFile)
    try entries.foreach { e =>
      val rec = new GenericData.Record(schema)
      rec.put("status", e.status)
      rec.put("snapshot_id", e.snapshotId)
      // v2 entry sequence numbers stay null on ADDED entries -> inherited
      // from the manifest list entry at read time (spec inheritance); an
      // explicit number there would go stale when the manifest is carried
      // forward. EXISTING entries (a manifest REWRITE) are the opposite
      // case: the file's data sequence number is its ORIGINAL commit's,
      // not the rewrite's, so the spec requires it written explicitly —
      // inheritance would silently re-stamp every file to the rewrite's
      // sequence and break position/equality delete scoping.
      if (formatVersion >= 2 && e.status == 0 && e.dataFile.sequenceNumber > 0L)
        rec.put("sequence_number", e.dataFile.sequenceNumber)
      val df = new GenericData.Record(dfSchema)
      if (formatVersion >= 2) {
        df.put("content", e.dataFile.content)
        if (e.dataFile.equalityIds.nonEmpty) {
          val l = new java.util.ArrayList[Integer]()
          e.dataFile.equalityIds.foreach(i => l.add(Integer.valueOf(i)))
          df.put("equality_ids", l)
        }
      }
      df.put("file_path", e.dataFile.path)
      df.put("file_format", e.dataFile.format)
      val p = new GenericData.Record(pSchema)
      e.dataFile.partition.foreach { case (k, v) => p.put(k, v) }
      df.put("partition", p)
      df.put("record_count", e.dataFile.recordCount)
      df.put("file_size_in_bytes", e.dataFile.fileSizeBytes)
      def boundsArray(field: String, m: Map[Int, Array[Byte]]): Unit =
        if (m.nonEmpty) {
          val itemSchema = dfSchema.getField(field).schema()
            .getTypes.get(1).getElementType
          val arr = new java.util.ArrayList[GenericRecord]()
          m.toSeq.sortBy(_._1).foreach { case (k, v) =>
            val r = new GenericData.Record(itemSchema)
            r.put("key", k)
            r.put("value", ByteBuffer.wrap(v))
            arr.add(r)
          }
          df.put(field, arr)
        }
      boundsArray("lower_bounds", e.dataFile.lowerBounds)
      boundsArray("upper_bounds", e.dataFile.upperBounds)
      rec.put("data_file", df)
      w.append(rec)
    } finally w.close()
  }

  private def manifestRecord(
      path: Path,
      snapshotId: Long,
      partType: Seq[(String, DataType)],
      entries: Seq[IcebergMeta.ManifestEntry],
      specId: Int = 0): IcebergMeta.ManifestFile = {
    val summaries = partType.map { case (name, dt) =>
      val values = entries.map(_.dataFile.partition(name))
      val bounds = values.filter(_ != null)
      (
        values.exists(_ == null),
        bounds.minByOption(orderKey(dt)).map(encodeBound(dt, _)),
        bounds.maxByOption(orderKey(dt)).map(encodeBound(dt, _)))
    }
    IcebergMeta.ManifestFile(
      path.toAbsolutePath.toString, Files.size(path), snapshotId, summaries,
      partitionSpecId = specId)
  }

  private def orderKey(dt: DataType): Any => Comparable[Any] = dt match {
    case IntegerType | LongType =>
      (v: Any) => java.lang.Long.valueOf(v.asInstanceOf[Number].longValue())
        .asInstanceOf[Comparable[Any]]
    case StringType => (v: Any) => v.toString.asInstanceOf[Comparable[Any]]
    case other => throw new UnsupportedOperationException(s"$other")
  }

  /** Iceberg single-value binary serialization (spec Appendix D). */
  private def encodeBound(dt: DataType, v: Any): Array[Byte] = dt match {
    case IntegerType =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(v.asInstanceOf[Number].intValue()).array()
    case LongType =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(v.asInstanceOf[Number].longValue()).array()
    case StringType => v.toString.getBytes(StandardCharsets.UTF_8)
    case other => throw new UnsupportedOperationException(s"$other")
  }

  private def writeManifestList(
      path: Path,
      manifests: Seq[IcebergMeta.ManifestFile],
      formatVersion: Int): Unit = {
    val schema = manifestListSchema(formatVersion)
    val itemSchema = schema.getField("partitions").schema()
      .getTypes.get(1).getElementType
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path.toFile)
    try manifests.foreach { m =>
      val rec = new GenericData.Record(schema)
      rec.put("manifest_path", m.path)
      rec.put("manifest_length", m.length)
      rec.put("partition_spec_id", m.partitionSpecId)
      if (formatVersion >= 2) {
        rec.put("content", m.content)
        rec.put("sequence_number", m.sequenceNumber)
        rec.put("min_sequence_number", m.minSequenceNumber)
      }
      rec.put("added_snapshot_id", m.addedSnapshotId)
      val arr = new java.util.ArrayList[GenericRecord]()
      m.summaries.foreach { case (cn, lo, hi) =>
        val s = new GenericData.Record(itemSchema)
        s.put("contains_null", cn)
        s.put("lower_bound", lo.map(ByteBuffer.wrap).orNull)
        s.put("upper_bound", hi.map(ByteBuffer.wrap).orNull)
        arr.add(s)
      }
      rec.put("partitions", arr)
      w.append(rec)
    } finally w.close()
  }

  /** The current snapshot's manifest list path (carry-over + delete
    * rewrite read it back through IcebergMeta's shared parsers).
    */
  private def currentManifestList(meta: IcebergMeta.TableMeta): Path =
    Paths.get(meta.currentSnapshot.getOrElse(
      throw new IllegalStateException("table has no current snapshot")).manifestList)

  private def parsePartitionValue(raw: String, dt: DataType): Any = {
    // Spark's own hive-path unescaping, NOT URLDecoder: URL decoding
    // turns '+' into a space, but escapePathName never encodes '+', so
    // a string partition value "a+b" would silently round-trip as "a b"
    // and pruned reads/deletes on it would match nothing
    val decoded = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(raw)
    dt match {
      case IntegerType => decoded.toInt
      case LongType    => decoded.toLong
      case StringType  => decoded
      case other => throw new UnsupportedOperationException(
        s"Partition column type $other not supported")
    }
  }

  private def parquetFiles(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.getFileName.toString)
    finally s.close()
  }

  private def parquetFilesRecursive(dir: Path): Seq[Path] = {
    val s = Files.walk(dir)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.toString)
    finally s.close()
  }

  private def parquetRowCount(
      conf: org.apache.hadoop.conf.Configuration, file: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  private def deleteRecursively(p: Path): Unit = {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.deleteIfExists(f))
    finally walk.close()
  }
}
