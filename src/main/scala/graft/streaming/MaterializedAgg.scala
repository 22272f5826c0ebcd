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
  * snapshot id) in ONE `mergeRows` commit, so view state and progress
  * are atomic by construction — there is no cursor file to drift from
  * the state it describes, and no crash window because there is no
  * second commit.
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
  * (c = 0) rather than being deleted — `mergeRows` replaces matched
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
  * live group).
  */
object MaterializedAgg {

  /** Reserved key of the watermark row; user keys must not use it. */
  val WatermarkKey: Long = Long.MinValue

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
    val sourceMeta = IcebergMeta.load(sourcePath)
    val current = sourceMeta.currentSnapshot
      .getOrElse(throw new IllegalStateException(
        s"source $sourcePath has no snapshots"))
      .id
    val exists = IcebergMeta.hasMetadata(viewPath)
    // the view head the deltas are computed against — the merge refuses
    // to land if the view moved after this read (concurrent refresher)
    val viewHead: Option[Long] =
      if (exists) IcebergMeta.load(viewPath).currentSnapshot.map(_.id)
      else None
    val stored: DataFrame =
      if (exists) IcebergSource.read(spark, viewPath)
      else Seq.empty[(Long, Long, Long)].toDF("k", "s", "c")
    val watermark: Long =
      if (exists) {
        val wm = stored.filter($"k" === WatermarkKey).select($"s").collect()
        require(wm.length == 1,
          s"view $viewPath has ${wm.length} watermark rows — corrupt view")
        wm.head.getLong(0)
      } else 0L
    if (exists && watermark == current) return None
    require(!exists || sourceMeta.snapshots.exists(_.id == watermark),
      s"view watermark $watermark is not a snapshot of $sourcePath — " +
        "the source history was rewritten under the view; rebuild it")

    // pinned DIRECTLY (not via PersistScope — an operator must not
    // clobber pins its caller holds): the window feeds BOTH the delta
    // aggregation and the touched-key projection
    val changes = IcebergSource
      .readChangelog(spark, sourcePath, fromSnapshotId = watermark)
      .select(
        key.cast("bigint").as("k"),
        measure.cast("bigint").as("m"),
        col("_change_type"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    changes.count(): Unit
    try {
      // MERGE matches keys with standard SQL equality — a null key can
      // never match its stored row, so an updated null group would
      // DUPLICATE in the view. Refuse loudly (the frame is cached; this
      // is a cheap second action); callers pre-map nulls to a sentinel
      // (coalesce(key, lit(...))) if their key expression can null out.
      require(changes.filter($"k".isNull).isEmpty,
        s"refreshStep: the key expression produced null keys — MERGE " +
          "cannot maintain a null group; coalesce the key to a sentinel")
      // the reserved watermark sentinel must be guarded as loudly as null:
      // a changelog row with key == Long.MinValue would put two k=MinValue
      // rows (the group AND the watermark) into one mergeRows call,
      // silently corrupting the view's cursor. The frame is already
      // cached, so this is a cheap second action.
      require(changes.filter($"k" === WatermarkKey).isEmpty,
        s"refreshStep: key expression produced the reserved watermark " +
          s"sentinel $WatermarkKey (Long.MinValue) — remap that key value")
      val refreshed = IncrementalOps.refreshSumCount(
        // null-SAFE watermark exclusion: =!= on a null key is null and
        // would silently drop a stored null-key group from the MV side
        stored.filter(!($"k" <=> WatermarkKey)),
        changes, "k", col("m"), "s", "c",
        dropEmptyGroups = false)
      // only groups the window touched are written; everything else is
      // already correct on disk. Null-safe semi join: a null-key group's
      // update must not be silently dropped.
      val touchedKeys = changes.select($"k".as("tk")).distinct()
      val touched = refreshed
        .join(touchedKeys, $"k" <=> $"tk", "left_semi")
      val wmRow = Seq((WatermarkKey, current, -1L)).toDF("k", "s", "c")
      if (!exists)
        IcebergWriter.append(spark, viewPath, touched.unionByName(wmRow),
          None, timestampMs, formatVersion = 2)
      else
        IcebergWriter.mergeRows(spark, viewPath, touched.unionByName(wmRow),
          "k", timestampMs, requireSnapshot = viewHead): Unit
      Some(current)
    } finally changes.unpersist(blocking = false): Unit
  }

  /** The live view: (k, s, c) with tombstones and the watermark hidden. */
  def readView(spark: SparkSession, viewPath: String): DataFrame = {
    import spark.implicits._
    IcebergSource.read(spark, viewPath)
      .filter(!($"k" <=> WatermarkKey) && $"c" > 0)
  }

  /** The source snapshot id the stored view reflects. */
  def watermarkOf(spark: SparkSession, viewPath: String): Long = {
    import spark.implicits._
    val wm = IcebergSource.read(spark, viewPath)
      .filter($"k" === WatermarkKey).select($"s").collect()
    require(wm.length == 1, s"view $viewPath watermark rows: ${wm.length}")
    wm.head.getLong(0)
  }
}
