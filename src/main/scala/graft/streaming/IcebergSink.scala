package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.{IcebergMeta, IcebergWriter}

/** Structured-Streaming ingest INTO an Iceberg table — the write half of
  * the streaming story ([[EventsStream]]/[[CorpusStream]] are the read
  * half), and the realized version of the reference's CDC-to-lakehouse
  * intent (crates/cdc/src/lib.rs:9 stub + the iceberg connector's
  * admitted aspiration, crates/connectors/iceberg/src/lib.rs:3-4).
  *
  * EXACTLY-ONCE TABLE STATE from an at-least-once primitive: foreachBatch
  * re-delivers a micro-batch when the driver crashes between the table
  * commit and the checkpoint acknowledgment. Every commit here stamps its
  * micro-batch id into the snapshot summary ([[BatchIdKey]]), and a
  * replayed batch whose id is <= the table's high watermark is SKIPPED —
  * the append is idempotent, so the table never holds a batch twice. The
  * watermark comparison (not set membership) is correct because
  * Structured Streaming batch ids are strictly monotonic per checkpoint;
  * the corollary, documented loudly: RESTARTING WITH A FRESH CHECKPOINT
  * against a table the old checkpoint already fed will silently skip the
  * new batches 0..N — pair one checkpoint with one table for the life of
  * the pipeline (the same contract Iceberg's own Spark sink has).
  *
  * Scale shape: each micro-batch is one [[IcebergWriter.appendPartitioned]]
  * — one shuffle per partition value (the small-files defense), manifests
  * with partition summaries, so the table stays prunable while it grows a
  * snapshot per batch; [[graft.sources.IcebergMaintenance]] handles the
  * long-run snapshot/file pressure.
  */
object IcebergSink {

  /** Snapshot-summary key carrying the micro-batch id of the commit. */
  val BatchIdKey = "graft.streaming.batch-id"

  /** The table's committed-batch high watermark (max batch id over all
    * snapshots), or None for a fresh/never-streamed table.
    */
  def lastCommittedBatch(tablePath: String): Option[Long] =
    if (!IcebergMeta.hasMetadata(tablePath)) None
    else IcebergMeta.load(tablePath).snapshots
      .flatMap(_.summary.get(BatchIdKey)).map(_.toLong).maxOption

  /** The per-batch writer, exposed so specs (and custom pipelines) can
    * drive the replay semantics directly. Empty batches commit nothing.
    */
  def batchWriter(
      tablePath: String,
      partition: Option[IcebergWriter.PartitionTransform] = None,
      formatVersion: Int = 2,
      clock: () => Long = () => System.currentTimeMillis())
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    if (lastCommittedBatch(tablePath).exists(_ >= batchId)) {
      // checkpoint replay of a commit that is already durable: skip —
      // this is the idempotence that upgrades at-least-once delivery to
      // exactly-once table state
      ()
    } else if (!batch.isEmpty) {
      IcebergWriter.appendPartitioned(
        batch.sparkSession, tablePath, batch, partition, clock(),
        formatVersion, summary = Map(BatchIdKey -> batchId.toString)): Unit
    }
  }

  /** Start streaming `df` into the Iceberg table at `tablePath`. One
    * checkpoint <-> one table, forever (see the class doc on replays).
    */
  def start(
      df: DataFrame,
      tablePath: String,
      checkpointDir: String,
      partition: Option[IcebergWriter.PartitionTransform] = None,
      formatVersion: Int = 2,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = Some(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()),
      clock: () => Long = () => System.currentTimeMillis()): StreamingQuery = {
    val w = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(batchWriter(tablePath, partition, formatVersion, clock))
    trigger.foreach(w.trigger)
    w.start()
  }
}
