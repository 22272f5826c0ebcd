package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.IncrementalOps
import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}

/** An EXACTLY-ONCE incremental materialized view on Iceberg: a stored
  * per-key (sum, count) aggregate of a source table, maintained purely
  * from the source's CDC changelog — the streaming flavor of
  * `q_mv_incremental`, with the delivery problem solved structurally.
  *
  * The classic failure of aggregate maintenance over an at-least-once
  * feed is the non-idempotent delta: re-applying a delivered window
  * double-counts (the feed-driven MIRROR in CorpusStream gets away with
  * replays because upsert/delete are logically idempotent — deltas are
  * not). Here the view table ITSELF carries its cursor: every refresh
  * writes the touched groups AND a watermark row (the applied source
  * snapshot id) in ONE `upsertRows` commit, so view state and progress
  * are atomic by construction — there is no cursor file to drift from
  * the state it describes, and no crash window because there is no
  * second commit.
  *
  * Commit flavor: EQUALITY-DELETE upsert, not position-delete merge.
  * Both are single commits with the same net state, but merge pins
  * matched positions by SCANNING THE STORED VIEW — an O(view) read per
  * refresh that silently broke the "cost ∝ churn" contract (the r14
  * cdc probe measured it dominating). Upsert writes the churn-sized
  * key list + rows and touches nothing else; the price is MoR read
  * overhead on the view as delete files accumulate, paid by readers
  * until `IcebergMaintenance.compactTable` folds them — the standard
  * write-optimized/read-optimized trade, chosen write-side because a
  * view refreshes far more often than a rewrite-scale read needs
  * optimizing.
  *
  * Delivery contract, precisely: (a) sequential REPLAYS no-op — the
  * watermark is read out of the view, so a re-delivered window finds
  * the view already current; (b) CONCURRENT refreshers cannot corrupt —
  * the merge carries `requireSnapshot` = the view head the deltas were
  * computed against, so a racer that lost lands on an advanced head and
  * surfaces `CommitConflictException` (retry re-reads the watermark and
  * no-ops). Never a silent double-count in either direction. The one
  * unguarded edge is concurrent CREATION of the view table (two initial
  * appends would both land); create from one process.
  *
  * Dead groups (count netted to zero) stay in the table as TOMBSTONES
  * (c = 0) rather than being deleted — the upsert replaces matched
  * keys in one commit, and a later re-insert of the key simply
  * overwrites the tombstone. [[readView]] hides them. NULL KEYS are
  * refused loudly: MERGE matches with standard SQL equality, so a null
  * group could never update in place — a key expression that can null
  * out (a lossy cast) must coalesce to a sentinel first.
  *
  * 100 TB shape: each refresh reads the O(churn) changelog window ONCE
  * (pinned — it feeds both the delta aggregation and the touched-key
  * projection) plus the stored view (keys-sized, not table-sized) and
  * writes only touched groups — the base table is never rescanned, the
  * same economics the cdc probe measures flat at fixed churn.
  *
  * Schema is concrete: key and measure are cast to BIGINT; the view
  * table is (k, s, c) with the reserved watermark row k = Long.MinValue
  * (c = -1 there, so even an unfiltered read cannot mistake it for a
  * live group). The same contract carries the other IVM classes:
  * [[refreshStepMinMax]] maintains (k, mn, mx, c) with the extremum
  * rescan pinned at the step's snapshot, [[refreshStepJoin]] maintains
  * a row-grain (k, jk, fv, dv, c) join view from BOTH sources'
  * changelogs with a two-cursor watermark row,
  * [[refreshStepApproxDistinct]] maintains a (k, sk, nd, c) HLL-sketch
  * view where inserts fold by sketch union and deletes rescan, and
  * [[refreshStepDistinct]] maintains the exact count(DISTINCT)
  * multiplicity store at (key, value) grain with the distinct level
  * derived on read.
  */
object MaterializedAgg {

  /** Reserved key of the watermark row; user keys must not use it. */
  val WatermarkKey: Long = Long.MinValue

  /** Pin a step's OUTPUT frame around its commit: the upsert path writes
    * it twice (the equality-delete key file, then the data files), and
    * without the pin each write re-runs the whole refresh plan — one
    * more full scheduling round on the step's fixed floor.
    */
  private def withPinnedOut[A](df: DataFrame)(f: DataFrame => A): A = {
    val pinned =
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try f(pinned)
    finally pinned.unpersist(blocking = false): Unit
  }

  /** The shared frame of one refresh step: source head, view head, the
    * stored view, and the applied watermark (read from column `wmCol` of
    * the view's reserved row). `stored` is the raw view INCLUDING the
    * watermark row and any tombstones.
    */
  private final case class StepCtx(
      current: Long,
      exists: Boolean,
      viewHead: Option[Long],
      stored: DataFrame,
      watermark: Long,
      // the source metadata THIS STEP plans against, loaded exactly once
      // and threaded into every read the step issues (changelog window,
      // keyed rescans) — the per-step metadata cache that keeps the
      // step's fixed floor at one load per table, and incidentally makes
      // the one-consistent-state property self-evident: there is no
      // second load to disagree with the first
      sourceMeta: IcebergMeta.TableMeta)

  /** Load the step context, or None when the view is already current
    * (the replay path). Refuses a watermark that is not a source
    * snapshot (history rewritten under the view).
    */
  private def stepCtx(
      spark: SparkSession,
      viewPath: String,
      sourcePath: String,
      emptyView: => DataFrame,
      wmCol: String,
      preloadedSource: Option[IcebergMeta.TableMeta] = None): Option[StepCtx] = {
    import spark.implicits._
    val sourceMeta = preloadedSource.getOrElse(IcebergMeta.load(sourcePath))
    val current = sourceMeta.currentSnapshot
      .getOrElse(throw new IllegalStateException(
        s"source $sourcePath has no snapshots"))
      .id
    val exists = IcebergMeta.hasMetadata(viewPath)
    // the view head the deltas are computed against — the merge refuses
    // to land if the view moved after this read (concurrent refresher).
    // Loaded once and handed to the stored read below (one view load).
    val viewMeta: Option[IcebergMeta.TableMeta] =
      if (exists) Some(IcebergMeta.load(viewPath)) else None
    val viewHead: Option[Long] =
      viewMeta.flatMap(_.currentSnapshot.map(_.id))
    val stored: DataFrame =
      if (exists)
        IcebergSource.read(spark, viewPath, snapshotId = None,
          asOfTimestampMs = None, prune = None, preloaded = viewMeta)
      else emptyView
    val watermark: Long =
      if (exists) {
        val wm = stored.filter($"k" === WatermarkKey).select(col(wmCol))
          .collect()
        require(wm.length == 1,
          s"view $viewPath has ${wm.length} watermark rows — corrupt view")
        wm.head.getLong(0)
      } else 0L
    if (exists && watermark == current) return None
    require(!exists || sourceMeta.snapshots.exists(_.id == watermark),
      s"view watermark $watermark is not a snapshot of $sourcePath — " +
        "the source history was rewritten under the view; rebuild it")
    Some(StepCtx(current, exists, viewHead, stored, watermark, sourceMeta))
  }

  /** The changelog window (watermark, current], keyed and pinned.
    * Pinned DIRECTLY (not via PersistScope — an operator must not
    * clobber pins its caller holds): the window feeds both the delta
    * aggregation and the touched-key projection. Caller unpersists.
    * Null keys and the reserved watermark sentinel are refused loudly
    * here: MERGE equality can never update a null group, and a
    * changelog row with key == Long.MinValue would put two sentinel
    * rows into one upsert commit, corrupting the view's cursor.
    *
    * The window's UPPER END is pinned at `current` — the snapshot
    * [[stepCtx]] captured — never resolved at the source's live head at
    * read time. Without the pin, a source commit landing between the
    * stepCtx metadata load and this read would be APPLIED in this step
    * while the watermark row records the earlier `current`; the next
    * refresh re-reads (current, head] and double-applies those rows —
    * silent corruption of every delta-folded aggregate. With it, the
    * changelog window and any snapshot-pinned rescan observe one
    * consistent source state.
    */
  private def pinnedWindow(
      spark: SparkSession,
      sourcePath: String,
      watermark: Long,
      current: Long,
      meta: IcebergMeta.TableMeta,
      key: org.apache.spark.sql.Column,
      measure: org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    val changes = IcebergSource
      .readChangelog(spark, sourcePath, fromSnapshotId = watermark,
        toSnapshotId = Some(current), preloaded = Some(meta))
      .select(
        key.cast("bigint").as("k"),
        measure.cast("bigint").as("m"),
        col("_change_type"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE job materializes the pin AND validates both key refusals (a
    // separate count + two isEmpty probes would cost three scheduling
    // rounds — the floor the stepfloor probe meters)
    try {
      val audit = changes.agg(
        sum(when($"k".isNull, lit(1L)).otherwise(lit(0L))).as("nulls"),
        sum(when($"k" === WatermarkKey, lit(1L)).otherwise(lit(0L)))
          .as("sentinels")).head()
      require(audit.isNullAt(0) || audit.getLong(0) == 0L,
        s"refreshStep: the key expression produced null keys — MERGE " +
          "cannot maintain a null group; coalesce the key to a sentinel")
      require(audit.isNullAt(1) || audit.getLong(1) == 0L,
        s"refreshStep: key expression produced the reserved watermark " +
          s"sentinel $WatermarkKey (Long.MinValue) — remap that key value")
    } catch {
      case t: Throwable =>
        changes.unpersist(blocking = false); throw t
    }
    changes
  }

  /** One refresh step: apply the source changelog window
    * (view-watermark, source-current] to the stored view in one atomic
    * commit. Creates the view table (format v2) on first call. Returns
    * the source snapshot id the view now reflects, or None when the
    * view was already current (the replay path). A lost race against a
    * concurrent refresher surfaces
    * [[graft.sources.IcebergWriter.CommitConflictException]].
    */
  def refreshStep(
      spark: SparkSession,
      viewPath: String,
      sourcePath: String,
      key: org.apache.spark.sql.Column,
      measure: org.apache.spark.sql.Column,
      timestampMs: Long): Option[Long] = {
    import spark.implicits._
    val ctx = stepCtx(spark, viewPath, sourcePath,
      Seq.empty[(Long, Long, Long)].toDF("k", "s", "c"), wmCol = "s")
      .getOrElse(return None)
    val changes = pinnedWindow(spark, sourcePath, ctx.watermark, ctx.current,
      ctx.sourceMeta, key, measure)
    try {
      applySumCount(spark, viewPath, ctx, changes, timestampMs)
      Some(ctx.current)
    } finally changes.unpersist(blocking = false): Unit
  }

  /** The sum/count delta-fold + one-commit write, shared by
    * [[refreshStep]] and [[refreshStepMany]]. `changes` is the keyed
    * (k, m, _change_type) window — pinned by the caller, or a projection
    * of a pinned raw window.
    */
  private def applySumCount(
      spark: SparkSession,
      viewPath: String,
      ctx: StepCtx,
      changes: DataFrame,
      timestampMs: Long): Unit = {
    import spark.implicits._
    val refreshed = IncrementalOps.refreshSumCount(
      // null-SAFE watermark exclusion: =!= on a null key is null and
      // would silently drop a stored null-key group from the MV side
      ctx.stored.filter(!($"k" <=> WatermarkKey)),
      changes, "k", col("m"), "s", "c",
      dropEmptyGroups = false)
    // only groups the window touched are written; everything else is
    // already correct on disk. Null-safe semi join: a null-key group's
    // update must not be silently dropped.
    val touchedKeys = changes.select($"k".as("tk")).distinct()
    val touched = refreshed
      .join(touchedKeys, $"k" <=> $"tk", "left_semi")
    val wmRow = Seq((WatermarkKey, ctx.current, -1L)).toDF("k", "s", "c")
    withPinnedOut(touched.unionByName(wmRow)) { out =>
      if (!ctx.exists)
        IcebergWriter.append(spark, viewPath, out,
          None, timestampMs, formatVersion = 2)
      else
        IcebergWriter.upsertRows(spark, viewPath, out,
          "k", timestampMs, requireSnapshot = ctx.viewHead): Unit
    }
  }

  /** One sum/count view to maintain in a [[refreshStepMany]] batch. */
  final case class ViewSpec(
      viewPath: String,
      key: org.apache.spark.sql.Column,
      measure: org.apache.spark.sql.Column)

  /** Refresh N sum/count views of ONE source as a batch — the
    * ingest-pipeline shape where a source commit lands and every rollup
    * of it refreshes together. The batching is pure floor-cutting, not a
    * new delivery mechanism: the source metadata loads ONCE for the
    * whole batch, and all views standing at the same watermark share ONE
    * raw changelog read (pinned; each view projects its own key/measure
    * off it), so N views cost one source read instead of N. Commits stay
    * PER VIEW — each view still lands its touched groups + watermark row
    * in its own atomic upsert, so the exactly-once contract of
    * [[refreshStep]] is unchanged: a crash mid-batch leaves a prefix of
    * views refreshed and the rest replay to no-ops or apply cleanly next
    * call. Returns the applied snapshot per view, aligned with `views`
    * (None = that view was already current).
    */
  def refreshStepMany(
      spark: SparkSession,
      sourcePath: String,
      views: Seq[ViewSpec],
      timestampMs: Long): Seq[Option[Long]] = {
    import spark.implicits._
    if (views.isEmpty) return Nil
    val sourceMeta = IcebergMeta.load(sourcePath)
    val ctxs: Seq[Option[StepCtx]] = views.map(v =>
      stepCtx(spark, v.viewPath, sourcePath,
        Seq.empty[(Long, Long, Long)].toDF("k", "s", "c"), wmCol = "s",
        preloadedSource = Some(sourceMeta)))
    val results = Array.fill[Option[Long]](views.length)(None)
    // group live work by watermark: views maintained together sit at the
    // same cursor and share one window read; a straggler (registered
    // later, or skipped by a crash) gets its own window
    val byWm = ctxs.zipWithIndex
      .collect { case (Some(c), i) => (c.watermark, i) }
      .groupBy(_._1)
    for ((wm, group) <- byWm.toSeq.sortBy(_._1)) {
      val idxs = group.map(_._2)
      val cur = ctxs(idxs.head).get.current
      val raw = IcebergSource.readChangelog(spark, sourcePath,
          fromSnapshotId = wm, toSnapshotId = Some(cur),
          preloaded = Some(sourceMeta))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      raw.count(): Unit
      try {
        for (i <- idxs) {
          val ctx = ctxs(i).get
          val v = views(i)
          val changes = raw.select(
            v.key.cast("bigint").as("k"),
            v.measure.cast("bigint").as("m"),
            col("_change_type"))
          // same refusals as pinnedWindow, per view (each has its own
          // key expression), folded into ONE job over the cached window
          val audit = changes.agg(
            sum(when($"k".isNull, lit(1L)).otherwise(lit(0L))).as("nulls"),
            sum(when($"k" === WatermarkKey, lit(1L)).otherwise(lit(0L)))
              .as("sentinels")).head()
          require(audit.isNullAt(0) || audit.getLong(0) == 0L,
            s"refreshStepMany(${v.viewPath}): the key expression " +
              "produced null keys — MERGE cannot maintain a null group")
          require(audit.isNullAt(1) || audit.getLong(1) == 0L,
            s"refreshStepMany(${v.viewPath}): key expression produced " +
              s"the reserved watermark sentinel $WatermarkKey")
          applySumCount(spark, v.viewPath, ctx, changes, timestampMs)
          results(i) = Some(ctx.current)
        }
      } finally raw.unpersist(blocking = false): Unit
    }
    results.toSeq
  }

  /** The streaming MIN/MAX view — [[refreshStep]]'s one-commit watermark
    * contract composed with the NON-delta-invertible aggregate class
    * ([[IncrementalOps.refreshMinMax]]): the stored (k, mn, mx, c) view
    * folds inserts incrementally and RESCANS exactly the groups whose
    * deletes could have hit an extremum. The rescan reads the source
    * PINNED AT the step's own `current` snapshot — the whole step
    * (changelog window AND rescan) observes one consistent source state,
    * so a source commit racing the refresh cannot leak post-watermark
    * rows into rescanned groups and double-apply on the next step.
    *
    * Same delivery contract as refreshStep: touched groups + the
    * watermark row land in ONE upsert commit, replays no-op off the
    * in-view watermark, lost races surface CommitConflictException.
    * Dead groups become (null, null, 0) tombstones — refreshMinMax drops
    * them from its output, so any window-touched key it no longer emits
    * is dead by construction; a later re-insert overwrites the
    * tombstone (the stored tombstone is EXCLUDED from the maintained
    * side, so the key refolds from its inserts like a brand-new group).
    * The watermark row carries the snapshot id in `mn` (c = -1).
    */
  def refreshStepMinMax(
      spark: SparkSession,
      viewPath: String,
      sourcePath: String,
      key: org.apache.spark.sql.Column,
      measure: org.apache.spark.sql.Column,
      timestampMs: Long): Option[Long] = {
    import spark.implicits._
    val ctx = stepCtx(spark, viewPath, sourcePath,
      Seq.empty[(Long, Long, Long, Long)].toDF("k", "mn", "mx", "c"),
      wmCol = "mn")
      .getOrElse(return None)
    val changes = pinnedWindow(spark, sourcePath, ctx.watermark, ctx.current,
      ctx.sourceMeta, key, measure)
    val rescanPins = scala.collection.mutable.Buffer.empty[DataFrame]
    try {
      // tombstones and the watermark are NOT live groups: a tombstoned
      // key re-enters as a brand-new group (inserts fold from scratch;
      // a delete against it routes to the authoritative rescan)
      val live = ctx.stored
        .filter(!($"k" <=> WatermarkKey) && $"c" > 0)
      val refreshed = IncrementalOps.refreshMinMax(
        live, changes, "k", col("m"), "mn", "mx", "c",
        rescan = keys => {
          // the rescan key set feeds two jobs (the filter derivation's
          // bounded collect, then the read's semi-join) — pin it so the
          // delta-join deriving it runs once; released with `changes`
          val pinned = keys
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          rescanPins += pinned
          // extremum rescans are typically FEW keys — exactly where a
          // bucketed/clustered source layout prunes the keyed read
          val (prune, bounds) =
            IcebergSource.keyedFilters(sourcePath, key, pinned, "k",
              preloaded = Some(ctx.sourceMeta))
          IcebergSource
            .read(spark, sourcePath, snapshotId = Some(ctx.current),
              asOfTimestampMs = None, prune = prune, fileFilter = bounds,
              preloaded = Some(ctx.sourceMeta))
            .select(key.cast("bigint").as("k"), measure.cast("bigint").as("m"))
            .join(pinned, Seq("k"), "left_semi")
        })
      val touchedKeys = changes.select($"k".as("tk")).distinct()
      val touched = refreshed.join(touchedKeys, $"k" <=> $"tk", "left_semi")
      // window-touched keys refreshMinMax no longer emits are DEAD
      val tombstones = touchedKeys
        .join(refreshed, $"tk" <=> $"k", "left_anti")
        .select($"tk".as("k"),
          lit(null).cast("bigint").as("mn"),
          lit(null).cast("bigint").as("mx"),
          lit(0L).as("c"))
      val wmRow = Seq((WatermarkKey, ctx.current, -1L, -1L))
        .toDF("k", "mn", "mx", "c")
      withPinnedOut(touched.unionByName(tombstones).unionByName(wmRow)) {
        out =>
          if (!ctx.exists)
            IcebergWriter.append(spark, viewPath, out, None, timestampMs,
              formatVersion = 2)
          else
            IcebergWriter.upsertRows(spark, viewPath, out, "k", timestampMs,
              requireSnapshot = ctx.viewHead): Unit
      }
      Some(ctx.current)
    } finally {
      changes.unpersist(blocking = false): Unit
      // the write above consumed the plan; the rescan key pins (if the
      // rescan branch ran at all) are safe to release
      rescanPins.foreach(_.unpersist(blocking = false))
    }
  }

  /** The streaming EXACT COUNT(DISTINCT) view — the multiplicity-table
    * class ([[IncrementalOps.refreshDistinct]]) under the same
    * one-commit watermark contract. The stored table IS the level-1
    * multiplicity store at (key, value) grain — schema
    * (kk, k, v, ref) where `kk` is the composite MERGE key (the
    * equality-upsert needs one column; `k|v` with a null marker is
    * bijective for bigint pairs) — and the DISTINCT level is DERIVED on
    * read ([[readDistinctView]]): persisting both grains in one table
    * would break the single-commit atomicity the contract is built on,
    * and the level-2 aggregate is multiplicity-sized, not base-sized.
    * The store's SHAPE is the [[graft.plans.MvRewrite]]
    * DISTINCT-rewrite target — but do NOT register this Iceberg MoR
    * view root directly as an MvDef: MvDef scans use raw
    * spark.read.parquet, which would read superseded data files, ref=0
    * tombstones and the watermark sentinel. Register a parquet EXPORT
    * of the live rows (ref > 0, sentinel excluded — e.g. a compacted
    * snapshot) with v among the keys.
    *
    * Everything is delta-invertible here, so unlike the sketch flavor
    * there is NO rescan path at all: deletes decrement refcounts, a
    * refcount crossing zero tombstones its pair, a negative refcount
    * (changelog deleting a value the table never held) fails the step
    * loudly before anything commits. Touched (key, value) pairs + the
    * watermark row (kk = "wm" — user keys always start with the bigint
    * key, so no collision; snapshot id carried in `v`, ref = -1) land
    * in ONE upsert commit keyed on kk; replays no-op, lost races
    * surface CommitConflictException.
    */
  def refreshStepDistinct(
      spark: SparkSession,
      viewPath: String,
      sourcePath: String,
      key: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column,
      timestampMs: Long): Option[Long] = {
    import spark.implicits._
    val ctx = stepCtx(spark, viewPath, sourcePath,
      Seq.empty[(String, Long, Option[Long], Long)].toDF("kk", "k", "v", "ref"),
      wmCol = "v")
      .getOrElse(return None)
    val changes = pinnedWindow(spark, sourcePath, ctx.watermark, ctx.current,
      ctx.sourceMeta, key, value)
    try {
      val live = ctx.stored
        .filter(!($"k" <=> WatermarkKey) && $"ref" > 0)
      def kkOf(k: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
        when(v.isNull, concat(k, lit("|n")))
          .otherwise(concat(k, lit("|v"), v))
      // the distinct level is derived and UNUSED here (lazy — never
      // executed); only the multiplicity output persists
      val refreshed = IncrementalOps.refreshDistinct(
        live.select($"k", $"v", $"ref"),
        live.groupBy($"k").agg(
          count(when($"v".isNotNull, lit(1))).as("nd"),
          sum($"ref").as("n")),
        changes, "k", col("m"), "v", "ref", "nd", "n")
      // null-safe pair semi-join: null VALUES are legitimate
      // multiplicity rows (they keep count(*) right) and must update
      val touchedPairs = changes.select($"k".as("tk"), $"m".as("tv")).distinct()
      val touched = refreshed.multiplicity
        .join(touchedPairs, $"k" <=> $"tk" && $"v" <=> $"tv", "left_semi")
        .select(kkOf($"k", $"v").as("kk"), $"k", $"v", $"ref")
      val tombstones = touchedPairs
        .join(refreshed.multiplicity,
          $"tk" <=> $"k" && $"tv" <=> $"v", "left_anti")
        .select(kkOf($"tk", $"tv").as("kk"), $"tk".as("k"), $"tv".as("v"),
          lit(0L).as("ref"))
      val wmRow = Seq(("wm", WatermarkKey, ctx.current, -1L))
        .toDF("kk", "k", "v", "ref")
      withPinnedOut(touched.unionByName(tombstones).unionByName(wmRow)) {
        out =>
          if (!ctx.exists)
            IcebergWriter.append(spark, viewPath, out, None, timestampMs,
              formatVersion = 2)
          else
            IcebergWriter.upsertRows(spark, viewPath, out, "kk", timestampMs,
              requireSnapshot = ctx.viewHead): Unit
      }
      Some(ctx.current)
    } finally changes.unpersist(blocking = false): Unit
  }

  /** The live DISTINCT view derived from a [[refreshStepDistinct]]
    * multiplicity store: (k, nd, n) with nd = exact count of distinct
    * NON-NULL values (SQL count(DISTINCT) semantics) and n = live row
    * count. Multiplicity-sized aggregation, never a base read; groups
    * whose rows are all tombstoned vanish, all-null-value groups stay
    * with nd = 0 — exactly what a recompute emits.
    */
  def readDistinctView(spark: SparkSession, viewPath: String): DataFrame = {
    import spark.implicits._
    IcebergSource.read(spark, viewPath)
      .filter(!($"k" <=> WatermarkKey) && $"ref" > 0)
      .groupBy($"k")
      .agg(
        count(when($"v".isNotNull, lit(1))).as("nd"),
        sum($"ref").as("n"))
  }

  /** The streaming APPROX-DISTINCT view — the MERGEABLE-SKETCH class
    * ([[IncrementalOps.refreshApproxDistinct]]) under the same
    * one-commit watermark contract: a stored (k, sk, nd, c) view where
    * `sk` is the group's HLL sketch, `nd` its materialized estimate and
    * `c` its live row count. This is the streaming-friendliest
    * aggregate class of the four: an APPEND-ONLY source folds purely by
    * sketch union — exactly as cheap as the sum/count flavor, with
    * O(#keys) state at any value cardinality — and only a window with
    * deletes forces the authoritative keyed rescan, which (like
    * [[refreshStepMinMax]]) reads the source PINNED AT the step's own
    * snapshot so a racing source commit cannot leak post-watermark rows
    * into rescanned groups.
    *
    * Counts ride the same split: an insert-only group extends its
    * stored count by the window's inserts; a rescanned group takes the
    * rescan's row count. Dead groups (rescan returned nothing)
    * tombstone as (null, 0, 0); a later re-insert overwrites the
    * tombstone and refolds from its own rows — sketches cannot forget,
    * so excluding the tombstone from the maintained side is what makes
    * resurrection correct. The watermark row carries the snapshot id in
    * `nd` (c = -1). Same delivery contract throughout: touched groups +
    * watermark in ONE upsert commit, replays no-op, lost races surface
    * CommitConflictException.
    */
  def refreshStepApproxDistinct(
      spark: SparkSession,
      viewPath: String,
      sourcePath: String,
      key: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column,
      timestampMs: Long): Option[Long] = {
    import spark.implicits._
    val ctx = stepCtx(spark, viewPath, sourcePath,
      Seq.empty[(Long, Array[Byte], Long, Long)].toDF("k", "sk", "nd", "c"),
      wmCol = "nd")
      .getOrElse(return None)
    val changes = pinnedWindow(spark, sourcePath, ctx.watermark, ctx.current,
      ctx.sourceMeta, key, value)
    val stepPins = scala.collection.mutable.Buffer.empty[DataFrame]
    try {
      val live = ctx.stored
        .filter(!($"k" <=> WatermarkKey) && $"c" > 0)
      // the rescan read is pinned and captured: it feeds the refreshed
      // sketches INSIDE the operator and the authoritative counts below
      var rescanRead: Option[DataFrame] = None
      val refreshedSk = IncrementalOps.refreshApproxDistinct(
        live.select($"k", $"sk"), changes, "k", col("m"), "sk",
        rescan = keys => {
          val pinnedKeys = keys
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          stepPins += pinnedKeys
          val (prune, bounds) =
            IcebergSource.keyedFilters(sourcePath, key, pinnedKeys, "k",
              preloaded = Some(ctx.sourceMeta))
          val read = IcebergSource
            .read(spark, sourcePath, snapshotId = Some(ctx.current),
              asOfTimestampMs = None, prune = prune, fileFilter = bounds,
              preloaded = Some(ctx.sourceMeta))
            .select(key.cast("bigint").as("k"), value.cast("bigint").as("v"))
            .join(pinnedKeys, Seq("k"), "left_semi")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          stepPins += read
          rescanRead = Some(read)
          read
        })
      val touchedKeys = changes.select($"k".as("tk")).distinct()
      val winStats = changes.groupBy($"k").agg(
        max($"_change_type" === "delete").as("_has_del"),
        sum(when($"_change_type" === "insert", lit(1L)).otherwise(lit(0L)))
          .as("_n_ins"))
      // the operator invokes `rescan` while building its plan, so the
      // capture is always populated here
      val rescanCounts = rescanRead.get
        .groupBy($"k").agg(count(lit(1)).as("_rc"))
      val touched = refreshedSk
        .join(touchedKeys, $"k" <=> $"tk", "left_semi")
        .join(winStats, Seq("k"), "left_outer")
        .join(live.select($"k", $"c".as("_old_c")), Seq("k"), "left_outer")
        .join(rescanCounts, Seq("k"), "left_outer")
        .select(
          $"k",
          $"sk",
          hll_sketch_estimate($"sk").as("nd"),
          when(coalesce($"_has_del", lit(false)), coalesce($"_rc", lit(0L)))
            .otherwise(coalesce($"_old_c", lit(0L)) +
              coalesce($"_n_ins", lit(0L))).as("c"))
      // window-touched keys the refreshed output no longer contains are
      // DEAD (their rescan returned no live rows)
      val tombstones = touchedKeys
        .join(refreshedSk, $"tk" <=> $"k", "left_anti")
        .select($"tk".as("k"),
          lit(null).cast("binary").as("sk"),
          lit(0L).as("nd"),
          lit(0L).as("c"))
      val wmRow = spark.range(1).select(
        lit(WatermarkKey).as("k"),
        lit(null).cast("binary").as("sk"),
        lit(ctx.current).as("nd"),
        lit(-1L).as("c"))
      withPinnedOut(touched.unionByName(tombstones).unionByName(wmRow)) {
        o =>
          if (!ctx.exists)
            IcebergWriter.append(spark, viewPath, o, None, timestampMs,
              formatVersion = 2)
          else
            IcebergWriter.upsertRows(spark, viewPath, o, "k", timestampMs,
              requireSnapshot = ctx.viewHead): Unit
      }
      Some(ctx.current)
    } finally {
      changes.unpersist(blocking = false): Unit
      stepPins.foreach(_.unpersist(blocking = false))
    }
  }

  /** The streaming JOIN view — the third IVM class under the same
    * one-commit watermark contract: a stored row-grain
    * `fact INNER JOIN dim` view (concrete schema: k = fact key, jk =
    * join key, fv/dv = fact/dim payloads, c = 1 live / 0 tombstone /
    * -1 watermark) maintained from BOTH sources' CDC changelogs. The
    * watermark row carries TWO cursors — the applied fact snapshot in
    * `jk` and the applied dim snapshot in `fv` — written with the
    * touched rows in ONE upsert commit, so both cursors and the view
    * state stay atomic; a replay finds both current and no-ops.
    *
    * The changelogs contribute only their churned key sets; the
    * affected region re-derives from the CURRENT base state of both
    * tables PINNED AT the step's own (factCurrent, dimCurrent) snapshot
    * pair, so a racing commit on either source cannot leak
    * post-watermark rows into the region and double-apply next step.
    *
    * CHURN-ONLY algebra (the property that makes this step beat view
    * recompute at scale): unlike the general batch
    * [[IncrementalOps.refreshJoin]] — whose caller may hand it an
    * arbitrary view frame, forcing a full-view pass-through computation —
    * this step KNOWS its view was maintained from these same changelogs,
    * which tightens the touched set. A view row (p, j) with j churned
    * either kept its fact row unchanged through the window (then the
    * CURRENT fact p still has jk = j, so p is found by the keyed
    * fact-under-churned-dims read) or its fact row changed/died in the
    * window (then p is in the fact changelog's churned pks — CDC emits
    * every fact change under its pk). So
    * `touched = churned pks ∪ pks of current facts under churned dims`
    * is COMPLETE, and the step never scans the stored view beyond its
    * single watermark row: the cost is two keyed fact reads + one keyed
    * dim read (each taking [[IcebergSource.keyedFilters]]-derived
    * partition pruning / file-bound skipping when the base layout
    * supports it) + a churn-sized merge. Touched pks the re-derived
    * region no longer contains are DEAD (fact deleted, or its dim died
    * through inner-join semantics) and tombstone as c = 0. MERGE is
    * keyed on the fact pk — unique per view row under the N:1 join
    * contract — so dim-side fanout never splits a merge key.
    */
  def refreshStepJoin(
      spark: SparkSession,
      viewPath: String,
      factPath: String,
      dimPath: String,
      factKey: org.apache.spark.sql.Column,
      factJoinKey: org.apache.spark.sql.Column,
      factVal: org.apache.spark.sql.Column,
      dimJoinKey: org.apache.spark.sql.Column,
      dimVal: org.apache.spark.sql.Column,
      timestampMs: Long): Option[(Long, Long)] = {
    import spark.implicits._
    // ONE metadata load per table for the whole step (changelog windows,
    // keyed reads and filter derivations all plan against these) — the
    // fixed-floor discipline the stepfloor probe measures
    val factMeta = IcebergMeta.load(factPath)
    val dimMeta = IcebergMeta.load(dimPath)
    def headOf(path: String, meta: IcebergMeta.TableMeta): Long =
      meta.currentSnapshot.getOrElse(throw new IllegalStateException(
        s"$path has no snapshots")).id
    val factCur = headOf(factPath, factMeta)
    val dimCur = headOf(dimPath, dimMeta)
    val exists = IcebergMeta.hasMetadata(viewPath)
    val viewMeta: Option[IcebergMeta.TableMeta] =
      if (exists) Some(IcebergMeta.load(viewPath)) else None
    val viewHead: Option[Long] =
      viewMeta.flatMap(_.currentSnapshot.map(_.id))
    val stored: DataFrame =
      if (exists) IcebergSource.read(spark, viewPath, snapshotId = None,
        asOfTimestampMs = None, prune = None, preloaded = viewMeta)
      else Seq.empty[(Long, Long, Long, Long, Long)]
        .toDF("k", "jk", "fv", "dv", "c")
    val (factWm, dimWm): (Long, Long) =
      if (exists) {
        val wm = stored.filter($"k" === WatermarkKey)
          .select($"jk", $"fv").collect()
        require(wm.length == 1,
          s"view $viewPath has ${wm.length} watermark rows — corrupt view")
        (wm.head.getLong(0), wm.head.getLong(1))
      } else (0L, 0L)
    if (exists && factWm == factCur && dimWm == dimCur) return None
    def checkHistory(
        path: String, meta: IcebergMeta.TableMeta, wm: Long): Unit =
      require(!exists || meta.snapshots.exists(_.id == wm),
        s"view watermark $wm is not a snapshot of $path — the source " +
          "history was rewritten under the view; rebuild it")
    checkHistory(factPath, factMeta, factWm)
    checkHistory(dimPath, dimMeta, dimWm)

    // churned key sets, one per side — change types are irrelevant (the
    // region re-derives from current state), but the fact pks must obey
    // the MERGE key contract. Each window is PINNED at the (factCur,
    // dimCur) head captured above: resolving at the live head would let
    // a racing commit into this step's churn set while the watermark
    // records the earlier cursor pair, double-applying next step.
    def window(path: String, meta: IcebergMeta.TableMeta, from: Long,
        cur: Long, keyCol: org.apache.spark.sql.Column): DataFrame =
      if (from == cur) Seq.empty[Long].toDF("k")
      else IcebergSource.readChangelog(spark, path, fromSnapshotId = from,
        toSnapshotId = Some(cur), preloaded = Some(meta))
        .select(keyCol.cast("bigint").as("k"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val churnedPks = window(factPath, factMeta, factWm, factCur, factKey)
    val churnedDims = window(dimPath, dimMeta, dimWm, dimCur, dimJoinKey)
    val stepPins = scala.collection.mutable.Buffer.empty[DataFrame]
    try {
      require(churnedPks.filter($"k".isNull).isEmpty,
        "refreshStepJoin: the fact key expression produced null keys — " +
          "MERGE cannot maintain a null-pk view row")
      require(churnedPks.filter($"k" === WatermarkKey).isEmpty,
        s"refreshStepJoin: fact key produced the reserved watermark " +
          s"sentinel $WatermarkKey — remap that key value")
      def factNow(
          prune: Option[IcebergMeta.PartitionPredicate],
          bounds: Seq[IcebergMeta.ColumnBound]) = IcebergSource
        .read(spark, factPath, snapshotId = Some(factCur),
          asOfTimestampMs = None, prune = prune, fileFilter = bounds,
          preloaded = Some(factMeta))
        .select(factKey.cast("bigint").as("k"),
          factJoinKey.cast("bigint").as("jk"),
          factVal.cast("bigint").as("fv"))
      // the two keyed fact reads, each scan-filtered by its own key set
      // (the semi-join stays the filter of record; the derived filters
      // only shrink what the scan lists and reads)
      val (pkPrune, pkBounds) =
        IcebergSource.keyedFilters(factPath, factKey, churnedPks, "k",
          preloaded = Some(factMeta))
      val factsByPk = factNow(pkPrune, pkBounds)
        .join(churnedPks, Seq("k"), "left_semi")
      // null churned dim keys can never inner-join a fact row — dropping
      // them is semantics-free and keeps the filter derivation live
      val dimKeys = churnedDims.filter($"k".isNotNull).select($"k".as("jk"))
      val (jkPrune, jkBounds) =
        IcebergSource.keyedFilters(factPath, factJoinKey, dimKeys, "jk",
          preloaded = Some(factMeta))
      val factsByDim = factNow(jkPrune, jkBounds)
        .join(dimKeys, Seq("jk"), "left_semi")
      // the affected facts feed three consumers (needed dims, region
      // rows, touched pks) — pin so the keyed reads run once
      val affected = factsByPk.unionByName(factsByDim).dropDuplicates("k")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      stepPins += affected
      // exactly the dim rows the region references (churned or not — a
      // fact update may move a row UNDER an un-churned dim); null jks
      // never join, so excluding them keeps the dim read prunable
      val neededDims = affected.filter($"jk".isNotNull)
        .select($"jk").distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      stepPins += neededDims
      val (dimPrune, dimBounds) =
        IcebergSource.keyedFilters(dimPath, dimJoinKey, neededDims, "jk",
          preloaded = Some(dimMeta))
      val dims = IcebergSource
        .read(spark, dimPath, snapshotId = Some(dimCur),
          asOfTimestampMs = None, prune = dimPrune, fileFilter = dimBounds,
          preloaded = Some(dimMeta))
        .select(dimJoinKey.cast("bigint").as("jk"),
          dimVal.cast("bigint").as("dv"))
        .join(neededDims, Seq("jk"), "left_semi")
      val regionRows = affected.join(dims, Seq("jk"), "inner")
      // every pk the step may have changed (complete by the churn-only
      // argument above: affected ⊇ current facts under churned dims, and
      // churnedPks covers every view row whose fact changed or died)
      val touchedPks = churnedPks.select($"k".as("tk"))
        .unionByName(affected.select($"k".as("tk")))
        .distinct()
      val touched = regionRows.select($"k", $"jk", $"fv", $"dv")
        .withColumn("c", lit(1L))
      val tombstones = touchedPks
        .join(regionRows, $"tk" === $"k", "left_anti")
        .select($"tk".as("k"),
          lit(null).cast("bigint").as("jk"),
          lit(null).cast("bigint").as("fv"),
          lit(null).cast("bigint").as("dv"),
          lit(0L).as("c"))
      val wmRow = Seq((WatermarkKey, factCur, dimCur, -1L, -1L))
        .toDF("k", "jk", "fv", "dv", "c")
      withPinnedOut(touched.unionByName(tombstones).unionByName(wmRow)) {
        out =>
          if (!exists)
            IcebergWriter.append(spark, viewPath, out, None, timestampMs,
              formatVersion = 2)
          else
            IcebergWriter.upsertRows(spark, viewPath, out, "k", timestampMs,
              requireSnapshot = viewHead): Unit
      }
      Some((factCur, dimCur))
    } finally {
      churnedPks.unpersist(blocking = false): Unit
      churnedDims.unpersist(blocking = false): Unit
      stepPins.foreach(_.unpersist(blocking = false))
    }
  }

  /** One foreachBatch that keeps an Iceberg table AND its streaming MV
    * fresh TOGETHER — the ingest-to-fresh-view pipeline as a single
    * Structured Streaming sink:
    * {{{
    * df.writeStream.foreachBatch(MaterializedAgg.maintainedSink(
    *   srcPath,
    *   (s, ts) => MaterializedAgg.refreshStep(s, viewPath, srcPath,
    *     key, measure, ts)))
    * }}}
    * Exactly-once end to end WITHOUT any new mechanism, because both
    * halves are independently idempotent: the append is skipped on
    * batch-id replay ([[IcebergSink.batchWriter]]'s snapshot-summary
    * watermark), and the refresh step no-ops when the view already
    * reflects the source head (the in-view watermark). Every crash
    * window is covered — a crash between the table commit and the
    * refresh replays into a skipped append + an applied refresh; a
    * crash between the refresh and the checkpoint ack replays into two
    * no-ops. The `refresh` thunk makes the sink flavor-agnostic: any of
    * the four step flavors (or a chain of them over several views of
    * one source) plugs in.
    */
  def maintainedSink(
      sourcePath: String,
      refresh: (SparkSession, Long) => Option[_],
      partition: Option[graft.sources.IcebergWriter.PartitionTransform] = None,
      formatVersion: Int = 2,
      clock: () => Long = () => System.currentTimeMillis())
      : (DataFrame, Long) => Unit = {
    val append = IcebergSink.batchWriter(
      sourcePath, partition, formatVersion, clock)
    (batch, batchId) => {
      append(batch, batchId)
      refresh(batch.sparkSession, clock()): Unit
    }
  }

  /** The live view — (k, s, c) for the sum/count flavor, (k, mn, mx, c)
    * for min/max — with tombstones and the watermark hidden.
    */
  def readView(spark: SparkSession, viewPath: String): DataFrame = {
    import spark.implicits._
    IcebergSource.read(spark, viewPath)
      .filter(!($"k" <=> WatermarkKey) && $"c" > 0)
  }

  /** The source snapshot id the stored view reflects. `wmCol` is the
    * column the watermark row carries it in: "s" for the sum/count
    * flavor (the default), "mn" for min/max.
    */
  def watermarkOf(
      spark: SparkSession, viewPath: String, wmCol: String = "s"): Long = {
    import spark.implicits._
    val wm = IcebergSource.read(spark, viewPath)
      .filter($"k" === WatermarkKey).select(col(wmCol)).collect()
    require(wm.length == 1, s"view $viewPath watermark rows: ${wm.length}")
    wm.head.getLong(0)
  }
}
