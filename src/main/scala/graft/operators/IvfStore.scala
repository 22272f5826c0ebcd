package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.ml.linalg.{Vectors, Vector => MlVector}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A STORED, VERSIONED, INCREMENTALLY-INGESTABLE IVF index — the
  * similarity-search twin of [[MinHashIndex]]'s ingest economics. A 100 TB
  * corpus is not re-indexed per batch: you pay one build, then every
  * increment costs ONE map-only assignment pass over the increment plus a
  * metadata commit — never a touch of the already-indexed corpus.
  *
  * Reference scope: the reference declares embedding similarity as a
  * first-class workload (crates/engine — see SURVEY §2.C); the incremental
  * maintenance story is ours, designed for the daily-append shape of a
  * training-data pipeline.
  *
  * Layout (all paths under one `root`):
  * {{{
  *   root/_versions/v<N>.json   commit metadata: centroid model (root +
  *                              fit-ordered splits + frozen pileups),
  *                              committed segment list, per-leaf counts
  *   root/seg-<tag>/cell=c3.1/…  cell-partitioned parquet, one dir per
  *                              committed ingest (compaction folds them)
  * }}}
  *
  * The version file is the commit: segments are written first, invisible
  * until a `v<N>.json` naming them lands via an atomic create-new CAS
  * (same discipline as IcebergWriter.commitMetadataJson — reserve with
  * create-new, fill via tmp + ATOMIC_MOVE, readers skip unparseable
  * reservations). Racing ingests serialize on the CAS; the loser re-reads,
  * re-merges ITS segment + counts onto the winner's metadata and retries —
  * its already-written segment stays valid because labels only ever get
  * FINER (splits accumulate; a stored label is always a prefix of the
  * current-model leaf).
  *
  * Hot-cell drift: each ingest merges per-leaf counts; a leaf over
  * `cellCap` is re-quantized with a `splitK`-way sub-KMeans fit on THAT
  * CELL'S rows only (a partition-pruned read of its prefix chain — never a
  * corpus pass). The split updates the MODEL only; stored rows keep their
  * coarser labels until [[compact]] relabels everything in one pass.
  * Probes stay exact w.r.t. the current model: a probe reads the prefix
  * chain of each probed leaf (superset I/O), then re-evaluates the current
  * leaf expression on the candidates (increment-free, candidate-scale) so
  * the answer equals a from-scratch assignment under the same model —
  * [[IvfStoreSpec]] pins that equivalence after create/ingest/split/
  * compact, and the DuckDB oracle of `q_sim_ivf_ingest` replays it.
  *
  * An unsplittable pileup (identical vectors — the sub-fit makes no
  * progress) is FROZEN: recorded so no future ingest re-fits it. Null
  * embeddings assign a null cell (hive default partition), are excluded
  * from counts/splits, and never match a probe — the same tolerance as
  * [[IvfIndex.buildBalanced]].
  *
  * Deletes are TOMBSTONE commits ([[delete]]: metadata-scale, no corpus
  * locate-and-rewrite), SEGMENT-SCOPED so later ingests of the same ids
  * stay visible (see [[delete]]), anti-joined by every read path and
  * folded away by [[compact]]. Streaming maintenance is
  * `writeStream.foreachBatch(ingestSink(root))`: commits are
  * batch-id-stamped, so a replayed micro-batch is a no-op — the same
  * exactly-once discipline as the Iceberg streaming sink.
  */
object IvfStore {

  /** The centroid model. Paths are "c<i>(.<j>)*" strings ("c3", "c3.1") —
    * the letter prefix keeps hive partition-value type inference at
    * STRING across segments (a bare "3" infers int, "3.1" double, and the
    * segment union would then disagree on the column type).
    */
  final case class CellModel(
      root: Seq[Array[Float]],
      splits: Seq[(String, Seq[Array[Float]])], // fit-ordered refinements
      frozen: Set[String]) {

    /** Leaf paths with their centroids: a root cell or split child with
      * no recorded refinement of its own.
      */
    def leaves: Seq[(String, Array[Float])] = {
      val splitOf = splits.toMap
      def walk(path: String, cent: Array[Float]): Seq[(String, Array[Float])] =
        splitOf.get(path) match {
          case None => Seq(path -> cent)
          case Some(subs) =>
            subs.zipWithIndex.flatMap { case (c, i) => walk(s"$path.$i", c) }
        }
      root.zipWithIndex.flatMap { case (c, i) => walk(s"c$i", c) }
    }
  }

  final case class Meta(
      version: Int,
      embCol: String,
      cellCap: Long,
      splitK: Int,
      maxDepth: Int,
      maxTrainRows: Long,
      seed: Long,
      model: CellModel,
      segments: Seq[String], // committed segment dir names under root
      counts: Map[String, Long], // rows per CURRENT-model leaf (see ingest)
      idCol: String = "vec_id", // row identity: tombstones + probe tie-break
      tombstones: Seq[String] = Nil, // committed delete-list dir names
      lastBatchId: Long = -1L, // streaming exactly-once cursor (see ingest)
      // the LAST catalog-refresh window head this store applied — a
      // SEPARATE cursor from lastBatchId on purpose (round 18): streaming
      // ingestSink batch ids and refresh snapshot ids are different id
      // spaces (both small integers in practice), and sharing one cursor
      // let a store fed by both silently drop a streaming batch or treat
      // an unapplied window as applied on a collision. Equality/
      // membership semantics, NOT ordering: the refresh prefix-skip asks
      // "is this snapshot in the pending chain", so foreign Iceberg
      // tables with non-monotone random snapshot ids key exactly-once
      // refreshes too (the r17 `-1` unkeyed fallback is gone).
      lastRefreshSnapshot: Long = Long.MinValue,
      // SEGMENT SCOPE of each delete list (round 18): delName -> the
      // segments that existed when it committed; the anti-join applies
      // only to rows from those segments, so a LATER ingest
      // re-inserting a deleted id lands uncovered and is visible with
      // NO compact — the update window becomes delete + ingest,
      // O(churn) end to end (the r17 resurrection-guard compact is
      // gone). A list missing from this map covers every segment
      // (conservative legacy meaning). Cleared with `tombstones` by
      // compact.
      tombstoneScopes: Map[String, Seq[String]] = Map.empty)

  private val mapper = new ObjectMapper()

  // -------------------------------------------------------------------
  // model expressions
  // -------------------------------------------------------------------

  private def toMl(f: Array[Float]): MlVector =
    Vectors.dense(f.map(_.toDouble))

  /** Label `df` with the current model's leaf path in column `out` —
    * ONE native expression ([[IvfLeafAssign]]) walking root argmin then
    * each recorded refinement, exactly [[IvfIndex.buildBalanced]]'s
    * algebra (the DuckDB `balancedAssignSql` mirror replays it
    * bit-for-bit). Null embedding → null leaf.
    *
    * Why not compose `cellIdxExpr` when-chains: a folded
    * `when(acc === p, refine(acc)).otherwise(acc)` duplicates the
    * accumulator per split (exponential — a ten-split model measured a
    * 32 MB plan), and even level-wise projections re-inline into one
    * giant CASE the moment a `leaf === p` FILTER pushes into the scan —
    * Janino then dies on the 64 KB method limit (measured: the sf0.001
    * lifecycle query crawled past 9 minutes). One opaque expression is
    * linear in the model and survives pushdown unchanged.
    */
  def withLeaf(
      df: DataFrame,
      embCol: String,
      out: String,
      model: CellModel): DataFrame =
    df.withColumn(out, org.apache.spark.sql.classic.GraftSqlInternals.column(
      IvfLeafAssign(
        org.apache.spark.sql.classic.GraftSqlInternals.expression(col(embCol)),
        model.root.toIndexedSeq,
        model.splits.map { case (p, cs) => p -> cs.toIndexedSeq }.toMap)))

  /** Hierarchical IVF leaf assignment as one opaque expression: root
    * argmin over the f32 centroids, then while the path has a recorded
    * split, refine by the sub-centroids' argmin. Score algebra is
    * IDENTICAL to [[IvfIndex.cellIdxExpr]] and its DuckDB mirror —
    * score_i = c_i·c_i − 2·dot(emb, c_i) with min-length SEQUENTIAL
    * double accumulation (functions.DotProduct's loop) and strict-less
    * first-index argmin (list_position/array_position tie-break).
    * Interpreted eval (CodegenFallback) by design: the per-row work is a
    * tight JIT'd double loop; generating it inline is what blew the
    * Janino method limit for the composed form.
    */
  case class IvfLeafAssign(
      child: org.apache.spark.sql.catalyst.expressions.Expression,
      root: IndexedSeq[Array[Float]],
      splits: Map[String, IndexedSeq[Array[Float]]])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    override def prettyName: String = "ivf_leaf_assign"
    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.StringType

    @transient private lazy val rootSelf = root.map(IvfIndex.selfDot)
    @transient private lazy val splitSelf =
      splits.map { case (p, cs) => p -> cs.map(IvfIndex.selfDot) }

    private def argmin(
        cents: IndexedSeq[Array[Float]],
        selfDots: IndexedSeq[Double],
        emb: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
      var best = Double.PositiveInfinity
      var bi = 0
      var i = 0
      while (i < cents.length) {
        val c = cents(i)
        val n = math.min(c.length, emb.numElements())
        var d = 0.0
        var j = 0
        while (j < n) {
          d += emb.getFloat(j).toDouble * c(j).toDouble
          j += 1
        }
        val score = selfDots(i) - 2.0 * d
        if (score < best) { best = score; bi = i }
        i += 1
      }
      bi
    }

    override def nullSafeEval(input: Any): Any = {
      val emb = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var path = "c" + argmin(root, rootSelf, emb)
      var cont = true
      while (cont) splits.get(path) match {
        case Some(cs) =>
          path = path + "." + argmin(cs, splitSelf(path), emb)
        case None => cont = false
      }
      org.apache.spark.unsafe.types.UTF8String.fromString(path)
    }

    override protected def withNewChildInternal(
        newChild: org.apache.spark.sql.catalyst.expressions.Expression)
        : org.apache.spark.sql.catalyst.expressions.Expression =
      copy(child = newChild)
  }

  /** Every stored label a row with current leaf `path` can carry: the
    * path itself and each proper prefix at a split boundary ("c3.1.0" →
    * c3, c3.1, c3.1.0). Splits only accumulate, so this is a complete
    * superset — the I/O contract of [[probe]] and the split refits.
    */
  def prefixChain(path: String): Seq[String] = {
    val parts = path.split('.')
    (1 to parts.length).map(n => parts.take(n).mkString("."))
  }

  // -------------------------------------------------------------------
  // metadata persistence
  // -------------------------------------------------------------------

  private def versionsDir(root: String): Path = Paths.get(root, "_versions")

  private def metaToJson(m: Meta): String = {
    val n = mapper.createObjectNode()
    n.put("version", m.version)
    n.put("embCol", m.embCol)
    n.put("cellCap", m.cellCap)
    n.put("splitK", m.splitK)
    n.put("maxDepth", m.maxDepth)
    n.put("maxTrainRows", m.maxTrainRows)
    n.put("seed", m.seed)
    def cents(parent: ObjectNode, name: String, cs: Seq[Array[Float]]): Unit = {
      val arr = parent.putArray(name)
      cs.foreach { c => val a = arr.addArray(); c.foreach(a.add) }
    }
    cents(n, "root", m.model.root)
    val sp = n.putArray("splits")
    m.model.splits.foreach { case (p, cs) =>
      val o = sp.addObject(); o.put("path", p); cents(o, "centroids", cs)
    }
    val fr = n.putArray("frozen"); m.model.frozen.toSeq.sorted.foreach(fr.add)
    val sg = n.putArray("segments"); m.segments.foreach(sg.add)
    val ct = n.putObject("counts")
    m.counts.toSeq.sortBy(_._1).foreach { case (k, v) => ct.put(k, v) }
    n.put("idCol", m.idCol)
    val tb = n.putArray("tombstones"); m.tombstones.foreach(tb.add)
    n.put("lastBatchId", m.lastBatchId)
    if (m.lastRefreshSnapshot != Long.MinValue)
      n.put("lastRefreshSnapshot", m.lastRefreshSnapshot): Unit
    if (m.tombstoneScopes.nonEmpty) {
      val ts = n.putObject("tombstoneScopes")
      m.tombstoneScopes.toSeq.sortBy(_._1).foreach { case (d, segs) =>
        val a = ts.putArray(d); segs.foreach(a.add)
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(n)
  }

  private def metaFromJson(s: String): Meta = {
    val n = mapper.readTree(s)
    // a zero-length reservation "parses" to Jackson's MissingNode (and
    // would read back as an empty version-0 meta) — reject anything that
    // is not a filled commit object so load() skips torn reservations
    require(n != null && n.isObject && n.has("version") && n.has("root"),
      "not a committed IVF store metadata object")
    def cents(node: com.fasterxml.jackson.databind.JsonNode): Seq[Array[Float]] =
      node.elements().asScala.map(c =>
        c.elements().asScala.map(_.floatValue()).toArray).toSeq
    Meta(
      n.path("version").asInt(),
      n.path("embCol").asText(),
      n.path("cellCap").asLong(),
      n.path("splitK").asInt(),
      n.path("maxDepth").asInt(),
      n.path("maxTrainRows").asLong(),
      n.path("seed").asLong(),
      CellModel(
        cents(n.path("root")),
        n.path("splits").elements().asScala.map(o =>
          o.path("path").asText() -> cents(o.path("centroids"))).toSeq,
        n.path("frozen").elements().asScala.map(_.asText()).toSet),
      n.path("segments").elements().asScala.map(_.asText()).toSeq,
      n.path("counts").properties().asScala
        .map(e => e.getKey -> e.getValue.asLong()).toMap,
      n.path("idCol").asText("vec_id"),
      n.path("tombstones").elements().asScala.map(_.asText()).toSeq,
      n.path("lastBatchId").asLong(-1L),
      n.path("lastRefreshSnapshot").asLong(Long.MinValue),
      n.path("tombstoneScopes").properties().asScala
        .map(e => e.getKey ->
          e.getValue.elements().asScala.map(_.asText()).toSeq)
        .toMap)
  }

  /** Highest PARSEABLE committed version. A zero-length or torn v<N>.json
    * is a reservation whose writer crashed between create-new and the
    * atomic fill — readers skip it (version N is burned; the next commit
    * conflicts on it and moves to N+1).
    */
  def load(root: String): Meta = {
    val dir = versionsDir(root)
    require(Files.isDirectory(dir), s"no IVF store at $root")
    val versions = Files.list(dir).iterator().asScala
      .flatMap { p =>
        val name = p.getFileName.toString
        if (name.startsWith("v") && name.endsWith(".json"))
          scala.util.Try(name.stripPrefix("v").stripSuffix(".json").toInt)
            .toOption.map(v => v -> p)
        else None
      }
      .toSeq.sortBy(-_._1)
    versions.view
      .flatMap { case (_, p) =>
        scala.util.Try(metaFromJson(Files.readString(p))).toOption
      }
      .headOption
      .getOrElse(throw new IllegalStateException(
        s"IVF store at $root has no parseable committed version"))
  }

  /** Atomic create-new CAS on v<N>.json (reserve, fill via tmp +
    * ATOMIC_MOVE). Returns false on conflict — the caller re-reads and
    * retries with a merged meta.
    */
  private def commit(root: String, m: Meta): Boolean = {
    val dir = versionsDir(root)
    Files.createDirectories(dir)
    val target = dir.resolve(s"v${m.version}.json")
    try Files.createFile(target)
    catch { case _: java.nio.file.FileAlreadyExistsException => return false }
    val tmp = dir.resolve(s".v${m.version}.json.tmp")
    Files.writeString(tmp, metaToJson(m))
    Files.move(tmp, target,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    true
  }

  // -------------------------------------------------------------------
  // build / ingest / compact
  // -------------------------------------------------------------------

  /** Build the store from an initial corpus: one balanced model fit
    * ([[IvfIndex.buildBalanced]]'s algebra via create-then-ingest would
    * relabel twice, so create fits the root and lets the shared over-cap
    * loop do the splitting), one cell-partitioned write, version 1.
    */
  def create(
      df: DataFrame,
      embCol: String,
      root: String,
      nCells: Int = 16,
      cellCap: Long = 100000L,
      splitK: Int = 4,
      maxDepth: Int = 4,
      seed: Long = 42L,
      maxTrainRows: Long = 100000L,
      idCol: String = "vec_id"): Meta = {
    require(!Files.exists(versionsDir(root)),
      s"IVF store already exists at $root — ingest into it instead")
    val rootCents = IvfIndex
      .fitCentroids(df, embCol, nCells, seed, maxTrainRows)
      .map(IvfIndex.centroidF32)
    val m0 = Meta(0, embCol, cellCap, splitK, maxDepth, maxTrainRows, seed,
      CellModel(rootCents.toSeq, Nil, Set.empty), Nil, Map.empty,
      idCol = idCol)
    ingestOnto(df.sparkSession, root, df, m0, batchId = -1L)
  }

  /** Ingest one increment: label it with the CURRENT model (one map-only
    * codegen pass over the increment), write it as a new cell-partitioned
    * segment, merge counts, split any leaf the merge pushed over cap
    * (cell-scoped refit — see object doc), and CAS-commit. On a CAS
    * conflict the segment is reused verbatim (labels only get finer) and
    * counts re-merge onto the winner; derived splits are DROPPED on
    * conflict and re-derive on the next ingest from the merged counts —
    * self-healing, never double-applied.
    *
    * `batchId` >= 0 makes the ingest EXACTLY-ONCE for streaming
    * replay: the commit records it, and a later call with the same (or
    * a lower) id is a no-op returning the committed meta — the
    * foreachBatch contract ([[ingestSink]]), same discipline as the
    * Iceberg streaming sink's batch-id-stamped snapshots. The check
    * re-runs after every lost race, so a replayed batch can never
    * double-commit past a concurrent winner.
    */
  def ingest(
      spark: SparkSession,
      root: String,
      batch: DataFrame,
      batchId: Long = -1L): Meta =
    ingestOnto(spark, root, batch, load(root), batchId)

  /** [[ingest]] keyed on a catalog-refresh WINDOW HEAD instead of a
    * streaming batch id — exactly-once by EQUALITY on the separate
    * `lastRefreshSnapshot` cursor (see [[Meta]]), so it works for any
    * Iceberg base, monotone snapshot ids or not, and never collides
    * with an [[ingestSink]]-fed store's `lastBatchId`. A replayed
    * window (same head) is a no-op returning the committed meta.
    */
  def ingestRefresh(
      spark: SparkSession,
      root: String,
      batch: DataFrame,
      refreshSnapshot: Long): Meta =
    ingestOnto(spark, root, batch, load(root), batchId = -1L,
      refreshSnapshot = refreshSnapshot)

  /** `writeStream.foreachBatch(IvfStore.ingestSink(root))`: streaming
    * ANN-index maintenance with exactly-once replay semantics.
    */
  def ingestSink(root: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      ingest(batch.sparkSession, root, batch, batchId)
      ()
    }

  private def ingestOnto(
      spark: SparkSession,
      root: String,
      batch: DataFrame,
      base: Meta,
      batchId: Long,
      refreshSnapshot: Long = Long.MinValue): Meta = {
    def replayed(m: Meta): Boolean =
      (batchId >= 0 && batchId <= m.lastBatchId) ||
        (refreshSnapshot != Long.MinValue &&
          refreshSnapshot == m.lastRefreshSnapshot)
    if (replayed(base)) return base // replay
    val segName = s"seg-${java.util.UUID.randomUUID().toString.take(12)}"
    val segPath = Paths.get(root, segName).toString
    val labeled = graft.engine.PersistScope.pinEager(
      withLeaf(batch, base.embCol, "cell", base.model))
    try {
      // cluster by cell BEFORE the partitioned write: without it every
      // input task emits one file per cell it sees (up to tasks × cells
      // small files per commit — the ~16 s ingest floor the r14 probe
      // measured was mostly this spray's create calls), with it each
      // cell's rows land in one task and the segment carries ONE file
      // per non-empty cell. The shuffle is increment-sized — the cheap
      // side of the trade at any scale, and the read path's directory
      // pruning gets fewer, fuller files to open.
      labeled.repartition(col("cell"))
        .write.partitionBy("cell").parquet(segPath)
      val incCounts = labeled.filter(col("cell").isNotNull)
        .groupBy("cell").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      var cur = base
      var committed: Option[Meta] = None
      var attempts = 0
      // a conflicted version may be a BURNED reservation (its writer
      // crashed before the fill, so load() keeps returning the version
      // below it) — the floor walks past it instead of re-contending
      var versionFloor = cur.version + 1
      while (committed.isEmpty) {
        attempts += 1
        require(attempts <= 20,
          s"IVF ingest at $root lost the commit race 20 times — giving up")
        // a lost race may reveal the winner already committed this
        // batch (two replays racing): the no-op check re-runs per loop
        if (replayed(cur)) {
          deleteRecursively(Paths.get(root, segName)) // orphaned duplicate
          committed = Some(cur)
        } else {
          val merged = mergeCounts(cur.counts, incCounts)
          val withSeg = cur.copy(
            version = math.max(cur.version + 1, versionFloor),
            segments = cur.segments :+ segName,
            counts = merged,
            lastBatchId = math.max(cur.lastBatchId, batchId),
            lastRefreshSnapshot =
              if (refreshSnapshot != Long.MinValue) refreshSnapshot
              else cur.lastRefreshSnapshot)
          // split AFTER the segment is on disk so the refit sees its rows
          val next = splitOverCap(spark, root, withSeg)
          if (commit(root, next)) committed = Some(next)
          else {
            versionFloor = next.version + 1
            cur = load(root) // lost the race: re-merge onto the winner
          }
        }
      }
      committed.get
    } finally labeled.unpersist(blocking = false)
  }

  private def mergeCounts(
      a: Map[String, Long],
      b: Map[String, Long]): Map[String, Long] =
    (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap

  /** Split every leaf over cap, iterating because a huge increment can
    * push a fresh child over cap too. Each refit reads ONLY the cell's
    * prefix chain (partition-pruned) from the given segment list; the
    * progress check is one bounded count-agg on the cell's rows. No
    * progress (an identical-vector pileup) freezes the path. Depth is
    * bounded by maxDepth like buildBalanced.
    */
  private def splitOverCap(spark: SparkSession, root: String, m0: Meta): Meta = {
    var m = m0
    var continue = true
    while (continue) {
      val splitOf = m.model.splits.toMap
      val over = m.counts.filter { case (p, n) =>
        n > m.cellCap && !m.model.frozen(p) && !splitOf.contains(p) &&
          p.count(_ == '.') < m.maxDepth
      }.keys.toSeq.sorted // deterministic fit order
      if (over.isEmpty) continue = false
      else over.foreach { p =>
        val rows = withLeaf(
          readCells(spark, root, m, prefixChain(p)), m.embCol, "__leaf", m.model)
          .filter(col("__leaf") === p)
        val cents = IvfIndex.fitCentroids(
          rows, m.embCol, m.splitK, m.seed ^ p.hashCode.toLong, m.maxTrainRows)
          .map(IvfIndex.centroidF32)
        val childCounts = rows
          .withColumn("__sub",
            IvfIndex.cellIdxExpr(col(m.embCol), cents.map(toMl)).cast("string"))
          .groupBy("__sub").count()
          .collect().map(r => s"$p.${r.getString(0)}" -> r.getLong(1)).toMap
        if (childCounts.size <= 1) {
          // every row in one subcell: unsplittable, never refit again
          m = m.copy(model = m.model.copy(frozen = m.model.frozen + p))
        } else {
          m = m.copy(
            model = m.model.copy(splits =
              m.model.splits :+ (p -> cents.toSeq)),
            counts = (m.counts - p) ++ childCounts)
        }
      }
    }
    m
  }

  /** Fold all segments into one written at the CURRENT model's leaves:
    * one relabel pass over the LIVE corpus (tombstoned rows are
    * physically dropped and the tombstone list cleared), exact recount,
    * and the replaced segment + tombstone dirs are deleted after the
    * commit lands (a concurrent reader holding the old meta re-plans
    * from the new one on failure — same contract as parquet overwrite
    * anywhere else in the engine; orphan segments from CRASHED ingests
    * are left for a gc sweep, they are invisible either way).
    */
  def compact(spark: SparkSession, root: String): Meta = {
    var cur = load(root)
    var done: Option[Meta] = None
    var versionFloor = cur.version + 1 // see ingest: walks past burned reservations
    while (done.isEmpty) {
      val segName = s"seg-${java.util.UUID.randomUUID().toString.take(12)}"
      val relabeled = withLeaf(
        readLive(spark, root, cur).drop("cell"), cur.embCol, "cell", cur.model)
      // same one-file-per-cell clustering as the ingest write (a compact
      // is a full rewrite — exactly the moment to fix the layout)
      relabeled.repartition(col("cell")).write.partitionBy("cell")
        .parquet(Paths.get(root, segName).toString)
      val counts = spark.read
        .parquet(Paths.get(root, segName).toString)
        .filter(col("cell").isNotNull)
        .groupBy("cell").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val next = cur.copy(
        version = math.max(cur.version + 1, versionFloor),
        segments = Seq(segName), counts = counts,
        tombstones = Nil, // dead rows physically dropped above
        tombstoneScopes = Map.empty)
      if (commit(root, next)) {
        cur.segments.foreach(s => deleteRecursively(Paths.get(root, s)))
        cur.tombstones.foreach(t => deleteRecursively(Paths.get(root, t)))
        done = Some(next)
      } else {
        versionFloor = next.version + 1
        deleteRecursively(Paths.get(root, segName)) // stale fold: redo
        cur = load(root) // an ingest won: fold its segment too
      }
    }
    done.get
  }

  /** Leveled/incremental compaction (r19) — the IVF sibling of
    * [[MinHashIndex.compactStep]]: relabel-and-rewrite ONLY the
    * `mergeCount` SMALLEST segments into one new segment at the current
    * model's leaves, leaving every other segment untouched on disk (the
    * version JSON's segment list IS the manifest, so kept segments ride
    * as metadata references — no file-level indirection needed). The
    * merged segments' dead rows are physically dropped; tombstone lists
    * whose remaining LIVE scope sits inside the merged set are absorbed,
    * all others carry unchanged (scope entries naming merged-away
    * segments are vacuous; legacy scope-less lists only die in the full
    * [[compact]]). Per-leaf counts stay exact-or-over: the merged
    * slice's raw contribution is subtracted and its live relabeled
    * output re-added, kept segments' contributions untouched. Cost is
    * proportional to the BYTES MERGED, never the store size. Same CAS
    * commit loop as ingest/compact. None = nothing to merge.
    */
  def compactStep(
      spark: SparkSession, root: String, mergeCount: Int = 4): Option[Meta] =
    compactStepWithHook(spark, root, mergeCount, () => ())

  /** [[compactStep]] with a test-only hook fired between the merged
    * segment's write and the CAS commit — the window a concurrent
    * ingest/delete wins the version race and the loop must re-pick
    * against the reloaded meta.
    */
  private[graft] def compactStepWithHook(
      spark: SparkSession, root: String, mergeCount: Int,
      beforeCommit: () => Unit): Option[Meta] = {
    require(mergeCount >= 2, "a merge needs at least two segments")
    var cur = load(root)
    var versionFloor = cur.version + 1
    var done: Option[Meta] = None
    while (done.isEmpty) {
      if (cur.segments.size < 2) return None
      val picked = cur.segments
        .map(s => s -> dirBytes(Paths.get(root, s)))
        .sortBy { case (n, b) => (b, n) }
        .take(math.min(mergeCount, cur.segments.size))
        .map(_._1)
      val pickedSet = picked.toSet
      val segName = s"seg-${java.util.UUID.randomUUID().toString.take(12)}"
      // raw per-cell counts of the merged input (dead rows INCLUDED —
      // deletes never decremented them, so the subtraction must not
      // either; the live recount below adds back what survives)
      val rawIn = picked
        .map(s => spark.read.parquet(Paths.get(root, s).toString))
        .reduce(_.unionByName(_))
        .filter(col("cell").isNotNull)
        .groupBy("cell").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val relabeled = withLeaf(
        liveReadOf(spark, root, cur, picked, None).drop("cell"),
        cur.embCol, "cell", cur.model)
      relabeled.repartition(col("cell")).write.partitionBy("cell")
        .parquet(Paths.get(root, segName).toString)
      val outCounts = spark.read
        .parquet(Paths.get(root, segName).toString)
        .filter(col("cell").isNotNull)
        .groupBy("cell").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val liveNames = cur.segments.toSet
      val keptLists = cur.tombstones.filter { t =>
        cur.tombstoneScopes.get(t) match {
          case None => true // legacy global list: full compact only
          case Some(scope) =>
            !scope.toSet.intersect(liveNames).subsetOf(pickedSet)
        }
      }
      val newCounts = {
        val cells = cur.counts.keySet ++ rawIn.keySet ++ outCounts.keySet
        cells.iterator.map { c =>
          c -> math.max(0L,
            cur.counts.getOrElse(c, 0L) - rawIn.getOrElse(c, 0L) +
              outCounts.getOrElse(c, 0L))
        }.filter(_._2 > 0L).toMap
      }
      val next = cur.copy(
        version = math.max(cur.version + 1, versionFloor),
        segments = cur.segments.filterNot(pickedSet) :+ segName,
        counts = newCounts,
        tombstones = keptLists,
        tombstoneScopes =
          cur.tombstoneScopes.filter { case (t, _) => keptLists.contains(t) })
      beforeCommit()
      if (commit(root, next)) {
        picked.foreach(s => deleteRecursively(Paths.get(root, s)))
        cur.tombstones.filterNot(keptLists.toSet)
          .foreach(t => deleteRecursively(Paths.get(root, t)))
        done = Some(next)
      } else {
        versionFloor = next.version + 1
        deleteRecursively(Paths.get(root, segName)) // stale merge: redo
        cur = load(root) // a concurrent commit won: re-pick against it
      }
    }
    done
  }

  private def dirBytes(p: Path): Long = {
    val stream = java.nio.file.Files.walk(p)
    try stream
      .filter(f => java.nio.file.Files.isRegularFile(f))
      .mapToLong(f => java.nio.file.Files.size(f))
      .sum()
    finally stream.close()
  }

  /** Delete rows by id: writes the DISTINCT ids as a tombstone list and
    * CAS-commits it — a METADATA-SCALE operation (cost ∝ |ids|, never a
    * corpus locate-and-rewrite; at 100 TB the rows' cells are unknown
    * without reading them, so eager removal would be a full scan). The
    * list is SEGMENT-SCOPED to the segments present at commit (round
    * 18): every read path ([[readLive]], probe, split refits, compact)
    * anti-joins each segment against only the lists covering it, so a
    * LATER ingest re-inserting a deleted id is visible with no compact;
    * [[compact]] physically drops the dead rows and clears the lists.
    * Two deliberate consequences, both documented contract: per-leaf
    * `counts` are NOT decremented (they gate splits — over-counting
    * only splits a shrinking cell early; compact recounts exactly), and
    * probe cost grows with the live tombstone volume until a compact
    * folds it away.
    */
  def delete(spark: SparkSession, root: String, ids: DataFrame): Meta = {
    var cur = load(root)
    val delName = s"del-${java.util.UUID.randomUUID().toString.take(12)}"
    ids.select(col(cur.idCol)).distinct()
      .write.parquet(Paths.get(root, delName).toString)
    var done: Option[Meta] = None
    var attempts = 0
    var versionFloor = cur.version + 1
    while (done.isEmpty) {
      attempts += 1
      require(attempts <= 20,
        s"IVF delete at $root lost the commit race 20 times — giving up")
      val next = cur.copy(
        version = math.max(cur.version + 1, versionFloor),
        tombstones = cur.tombstones :+ delName,
        // scope re-derives from the RELOADED meta on a lost race, so a
        // segment a concurrent ingest committed is covered too — the
        // conservative choice, matching the pre-scoping global behavior
        // for anything present at commit time
        tombstoneScopes = cur.tombstoneScopes + (delName -> cur.segments))
      if (commit(root, next)) done = Some(next)
      else { versionFloor = next.version + 1; cur = load(root) }
    }
    done.get
  }

  /** Remove ORPHAN segment/tombstone dirs — data a crashed writer wrote
    * but never committed (invisible to every reader; this only reclaims
    * disk). Only dirs absent from the CURRENT meta's segment/tombstone
    * lists AND idle for `olderThanMs` are touched: the idle window is
    * the lease protecting a live writer between its data write and its
    * CAS commit (same discipline as MinHashIndex's marker expiry — an
    * aggressive gc racing a slow writer would otherwise delete the
    * segment its commit is about to reference). Returns what it deleted.
    */
  def gc(root: String, olderThanMs: Long = 3600000L): Seq[String] = {
    val m = load(root)
    val referenced = (m.segments ++ m.tombstones).toSet
    val now = System.currentTimeMillis()
    Files.list(Paths.get(root)).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        (n.startsWith("seg-") || n.startsWith("del-")) && !referenced(n) &&
          now - Files.getLastModifiedTime(p).toMillis() >= olderThanMs
      }
      .map { p => deleteRecursively(p); p.getFileName.toString }
      .toSeq
  }

  /** Drop the whole store (tests / rebuild-from-scratch callers). */
  def destroy(root: String): Unit = deleteRecursively(Paths.get(root))

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }

  // -------------------------------------------------------------------
  // reads
  // -------------------------------------------------------------------

  /** All committed segments, stored labels as written. Segments are read
    * individually and unioned so each keeps its own hive partition
    * discovery (and so a `cell` filter prunes DIRECTORIES per segment).
    */
  def readAll(spark: SparkSession, root: String, m: Meta): DataFrame =
    m.segments.map(s => spark.read.parquet(Paths.get(root, s).toString))
      .reduce(_.unionByName(_))

  /** [[readAll]] minus tombstoned ids — what every query-facing path
    * reads. SEGMENT-SCOPED (round 18): segments are grouped by the set
    * of tombstone lists covering them (typically two groups — the
    * pre-delete segments under their lists, the post-delete ingests
    * under none) and each group anti-joins only ITS covering lists, so
    * a re-ingested id in a newer segment stays visible while the old
    * rows stay dead. The lists are churn-scale (compaction folds them
    * away), so every anti-join broadcasts.
    */
  def readLive(spark: SparkSession, root: String, m: Meta): DataFrame =
    liveRead(spark, root, m, cellFilter = None)

  /** The union of the LIVE tombstone lists as one `(idCol)` frame
    * REGARDLESS of scope, or None when nothing is tombstoned — the
    * coarse view tests and gauges consume (liveness itself is
    * segment-scoped; see [[readLive]]).
    */
  def deadIds(spark: SparkSession, root: String, m: Meta): Option[DataFrame] =
    if (m.tombstones.isEmpty) None
    else Some(m.tombstones
      .map(t => spark.read.parquet(Paths.get(root, t).toString))
      .reduce(_.unionByName(_)))

  /** The scoped live read shared by [[readLive]] and [[readCells]]:
    * `cellFilter` applies per segment BEFORE the anti-join (directory
    * pruning first, tombstones on the survivors — same order as the r17
    * global form, now per covering-group).
    */
  private def liveRead(
      spark: SparkSession,
      root: String,
      m: Meta,
      cellFilter: Option[Seq[String]]): DataFrame =
    liveReadOf(spark, root, m, m.segments, cellFilter)

  /** [[liveRead]] restricted to an explicit segment subset — the shared
    * algebra [[compactStep]] reuses to materialize ONLY the segments it
    * merges (each still anti-joined against exactly its covering lists).
    */
  private def liveReadOf(
      spark: SparkSession,
      root: String,
      m: Meta,
      segments: Seq[String],
      cellFilter: Option[Seq[String]]): DataFrame = {
    def segDf(s: String): DataFrame = {
      val df = spark.read.parquet(Paths.get(root, s).toString)
      cellFilter.fold(df)(cs => df.filter(col("cell").isin(cs: _*)))
    }
    if (m.tombstones.isEmpty)
      return segments.map(segDf).reduce(_.unionByName(_))
    // lists covering a segment: scoped lists naming it + legacy lists
    // with no recorded scope (which cover everything)
    val covering: Map[String, Seq[String]] = segments.map { s =>
      s -> m.tombstones.filter(t =>
        m.tombstoneScopes.get(t).forall(_.contains(s)))
    }.toMap
    segments.groupBy(s => covering(s))
      .map { case (lists, segs) =>
        val rows = segs.map(segDf).reduce(_.unionByName(_))
        if (lists.isEmpty) rows
        else rows.join(
          broadcast(lists
            .map(t => spark.read.parquet(Paths.get(root, t).toString))
            .reduce(_.unionByName(_))
            .select(col(m.idCol)).distinct()),
          Seq(m.idCol), "left_anti")
      }
      .reduce(_.unionByName(_))
  }

  private def readCells(
      spark: SparkSession,
      root: String,
      m: Meta,
      cells: Seq[String]): DataFrame =
    liveRead(spark, root, m, cellFilter = Some(cells))

  /** Top-k by cosine within the nProbe leaves closest to the query —
    * exact w.r.t. the current model: stored labels are a prefix superset
    * (directory-pruned I/O), the current-leaf re-filter runs on the
    * candidates only. Output: original columns + `cos`.
    */
  def probe(
      spark: SparkSession,
      root: String,
      query: Array[Float],
      k: Int = 10,
      nProbe: Int = 4): DataFrame =
    probe(spark, root, load(root), query, k, nProbe)

  /** [[probe]] against an ALREADY-LOADED [[Meta]] — the overload a
    * serving path uses so its validation and its probe observe ONE store
    * version: loading twice lets a concurrent ingest/compact change the
    * model or embCol between the two loads, and any decision taken
    * against the first load (e.g. which column to drop from the
    * response) silently misses against the second.
    */
  def probe(
      spark: SparkSession,
      root: String,
      m: Meta,
      query: Array[Float],
      k: Int,
      nProbe: Int): DataFrame = {
    val probed = probedLeaves(m, query, nProbe)
    val prefixes = probed.flatMap(prefixChain).distinct
    val qCol = array(query.toIndexedSeq.map(v => lit(v)): _*)
      .cast("array<float>")
    withLeaf(readCells(spark, root, m, prefixes), m.embCol, "__leaf", m.model)
      .filter(col("__leaf").isin(probed: _*))
      .withColumn("cos",
        round(graft.functions.Functions.cosineSim(col(m.embCol), qCol), 6))
      .drop("__leaf", "cell")
      .orderBy(col("cos").desc, col(m.idCol))
      .limit(k)
  }

  /** The nProbe leaf paths ranked by centroid euclidean distance to the
    * query (path tie-break for determinism).
    */
  def probedLeaves(m: Meta, query: Array[Float], nProbe: Int): Seq[String] = {
    val q = query.map(_.toDouble)
    m.model.leaves
      .map { case (p, c) =>
        var d = 0.0
        var j = 0
        while (j < c.length && j < q.length) {
          val diff = c(j) - q(j); d += diff * diff; j += 1
        }
        (p, d)
      }
      .sortBy { case (p, d) => (d, p) }
      .take(nProbe)
      .map(_._1)
  }
}
