package graft.sources

import org.apache.spark.sql.SparkSession

/** One-call table-maintenance policy over [[IcebergWriter]]'s lifecycle
  * ops — the job a 100-TB pipeline schedules nightly instead of deciding
  * by hand when to compact and what history to keep. Merge-on-read
  * writes ([[IcebergWriter.mergeRows]]/[[IcebergWriter.upsertRows]])
  * deliberately push cost from the write to the read; this is the
  * counterweight that keeps the read-side anti-join stack bounded.
  *
  * Policy: compact when the CURRENT snapshot's live delete files (or
  * their total row count) reach the thresholds; then, optionally, expire
  * snapshots older than the cutoff and GC their files. Both steps are
  * the crash-safe primitives underneath — this object only decides, it
  * never writes metadata itself.
  */
object IcebergMaintenance {

  /** What maintenance saw and did. `deleteFiles`/`deleteRows` are the
    * PRE-maintenance live-delete pressure (the decision inputs);
    * `compacted` is the new snapshot id when the policy fired;
    * `expired` the snapshot ids dropped by the retention cutoff.
    */
  final case class Report(
      deleteFiles: Int,
      deleteRows: Long,
      dataFiles: Int,
      compacted: Option[Long],
      expired: Seq[Long],
      // the manifest-rewrite step's commit, when metadata pressure fired
      // it (None = under threshold or already consolidated)
      manifestsRewritten: Option[Long] = None)

  /** Run the policy once. `expireOlderThanMs` is an ABSOLUTE cutoff
    * (compare against snapshot timestamps) — callers pass
    * `now - retention`, keeping this function deterministic and
    * replayable. The current snapshot is never expired regardless of
    * age ([[IcebergWriter.expireSnapshots]]'s contract), so a table
    * older than its retention window still answers queries.
    */
  def maintain(
      spark: SparkSession,
      tablePath: String,
      timestampMs: Long,
      maxDeleteFiles: Int = 4,
      maxDeleteRows: Long = 100000L,
      expireOlderThanMs: Option[Long] = None,
      // when the policy compacts, ALSO range-cluster the rewrite on
      // these columns (disjoint per-file bounds -> data-skipping scans;
      // see IcebergWriter.compact's relayout) — the nightly job that
      // keeps an ingest table both delete-free AND key-skippable
      clusterBy: Seq[String] = Nil,
      clusterFiles: Int = 16,
      // METADATA pressure: rewrite manifests when the current snapshot's
      // list carries at least this many (one per commit accretes fast on
      // a streaming-ingest table; planning cost is linear in this count)
      maxManifests: Int = 8): Report = {
    val meta = IcebergMeta.load(tablePath)
    require(meta.formatVersion == 2,
      s"maintenance targets v2 merge-on-read tables; this one is v${meta.formatVersion}")
    val snap = meta.currentSnapshot.getOrElse(
      throw new IllegalStateException("table has no current snapshot"))
    val plan = IcebergMeta.planScan(meta, snap)
    val deleteFiles = plan.deletes.size
    val deleteRows = plan.deletes.map(_.recordCount).sum

    // clusterBy empty -> null: compact then honors the TABLE's declared
    // sort order (IcebergWriter.setSortOrder) if one is set — the
    // nightly job applies the clustering the table itself asked for
    val relayout: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      if (clusterBy.isEmpty) null
      else d => d
        .repartitionByRange(clusterFiles,
          clusterBy.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(
          clusterBy.map(org.apache.spark.sql.functions.col): _*)
    val compacted =
      if (deleteFiles >= maxDeleteFiles || deleteRows >= maxDeleteRows)
        Some(IcebergWriter.compact(spark, tablePath, timestampMs,
          relayout = relayout))
      else None
    // expiry runs AFTER compaction so a just-compacted table can drop
    // the MoR history it no longer needs for current reads
    val expired = expireOlderThanMs
      .map(cut => IcebergWriter.expireSnapshots(tablePath, cut, timestampMs))
      .getOrElse(Seq.empty)
    // manifest rewrite LAST: it consolidates whatever metadata shape the
    // compaction/expiry steps left behind. A compaction already resets
    // the list to fresh manifests, so on the nights it fires this is a
    // no-op by the rewrite's own idempotence check.
    val freshMeta = IcebergMeta.load(tablePath)
    val listSize = freshMeta.currentSnapshot
      .map(s => IcebergMeta.readManifestListFile(freshMeta.root, s.manifestList).size)
      .getOrElse(0)
    val rewritten =
      if (listSize >= maxManifests)
        IcebergWriter.rewriteManifests(spark, tablePath, timestampMs).snapshotId
      else None
    Report(deleteFiles, deleteRows, plan.files.size, compacted, expired,
      rewritten)
  }
}
