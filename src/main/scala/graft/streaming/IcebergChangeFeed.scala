package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{IcebergMeta, IcebergSource}

/** Incremental CONSUMPTION of an Iceberg table's changes — the egress
  * twin of [[IcebergSink]] (ingest). A durable cursor file records the
  * last fully-processed snapshot id; each [[poll]] reads the CDC
  * changelog of the window (cursor, current] via
  * [[IcebergSource.readChangelog]] (row-level inserts AND deletes, with
  * snapshot provenance), hands it to the caller's batch function, and
  * advances the cursor only after the function returns.
  *
  * Delivery contract — the same one Structured Streaming's foreachBatch
  * gives: AT-LEAST-ONCE delivery, upgraded to exactly-once EFFECT by
  * idempotent consumers. A crash between the batch function and the
  * cursor write re-delivers the window on the next poll; the function
  * receives the window's end-snapshot id (and every row carries
  * `_change_snapshot_id`), so a consumer that keys its side effect on
  * them — an index upsert, a cache refresh, a downstream Iceberg commit
  * stamped via [[IcebergSink.BatchIdKey]] — applies each window once no
  * matter how often it is delivered.
  *
  * Scale shape: a poll's cost tracks the WINDOW's churn (the changelog
  * reads only files the window's snapshots touched), never the table —
  * at 100 TB, feeding a search index off a table taking per-minute
  * commits costs per-minute deltas. Snapshot expiry interacts honestly:
  * a cursor pointing at expired history makes readChangelog refuse
  * ("not a reachable ancestor") rather than silently replaying the
  * whole table — the operator chooses [[reset]] explicitly.
  *
  * Publish-aware by construction: the changelog walks parent ancestry,
  * and a [[graft.sources.IcebergWriter.fastForward]] publish makes the
  * audited branch commits ancestors of main — so a feed polling main
  * picks up a published branch's rows exactly when they become visible,
  * never while they were audit-only.
  */
object IcebergChangeFeed {

  /** The last fully-processed snapshot id, or None for a fresh feed. */
  def cursor(stateFile: String): Option[Long] = {
    val p = Paths.get(stateFile)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Drop the cursor: the next poll re-delivers from the beginning (or
    * from `to` if the operator seeds one explicitly via [[seek]]).
    */
  def reset(stateFile: String): Unit =
    Files.deleteIfExists(Paths.get(stateFile)): Unit

  /** Pin the cursor to an arbitrary snapshot id — "start from here". */
  def seek(stateFile: String, snapshotId: Long): Unit =
    writeCursor(Paths.get(stateFile), snapshotId)

  /** One feed step: read the changelog (cursor, current], run `fn`,
    * advance the cursor. Returns the new cursor position, or None when
    * the table has no new snapshots (fn is NOT called). `fn` receives
    * the change frame and the window's end-snapshot id.
    */
  def poll(
      spark: SparkSession,
      tablePath: String,
      stateFile: String)(fn: (DataFrame, Long) => Unit): Option[Long] = {
    require(IcebergMeta.hasMetadata(tablePath),
      s"change feed requires table metadata; $tablePath has none")
    val meta = IcebergMeta.load(tablePath)
    val current = meta.currentSnapshot
    val from = cursor(stateFile).getOrElse(0L)
    current match {
      case None => None
      case Some(c) if c.id == from => None
      case Some(c) =>
        val changes = IcebergSource.readChangelog(
          spark, tablePath, fromSnapshotId = from, toSnapshotId = Some(c.id))
        fn(changes, c.id)
        // durable AFTER the effect: a crash in fn re-delivers this window
        writeCursor(Paths.get(stateFile), c.id)
        Some(c.id)
    }
  }

  /** Drain every pending window: poll until the table has nothing new
    * (bounded by `maxPolls` against a pathological commit race). Returns
    * the number of windows processed.
    */
  def drain(
      spark: SparkSession,
      tablePath: String,
      stateFile: String,
      maxPolls: Int = 100)(fn: (DataFrame, Long) => Unit): Int = {
    var n = 0
    while (n < maxPolls && poll(spark, tablePath, stateFile)(fn).isDefined)
      n += 1
    n
  }

  /** Atomic cursor write: tmp + ATOMIC_MOVE, same durability discipline
    * as the table's own version-hint commit.
    */
  private def writeCursor(p: Path, id: Long): Unit = {
    val dir = Option(p.getParent).getOrElse(Paths.get("."))
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".${p.getFileName}.tmp")
    Files.writeString(tmp, id.toString)
    Files.move(tmp, p,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE): Unit
  }
}
