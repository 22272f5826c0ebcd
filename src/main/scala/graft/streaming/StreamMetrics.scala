package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Operational telemetry for the streaming layer: per-micro-batch
  * dropped-late-row counts, state-store size, and the committed watermark,
  * collected off Spark's StreamingQueryListener bus. The functional side
  * of late data (watermarks bounding state, late rows excluded from
  * results) is covered by EventsStream + StreamingSpec; this is the face
  * an OPERATOR needs — "how much is my pipeline silently dropping, and
  * how big is its state growing?" — the difference between a watermark
  * that is tuned and one that is quietly eating 2% of events at 100 TB/day.
  *
  * Metrics come straight from StreamingQueryProgress: stateOperators'
  * numRowsDroppedByWatermark / numRowsTotal / memoryUsedBytes and the
  * eventTime watermark. Collection is bounded (`maxBatches` most recent)
  * so a long-running stream cannot grow the listener without limit.
  */
final class StreamMetricsListener(maxBatches: Int = 1024)
    extends StreamingQueryListener {
  import StreamMetricsListener.BatchMetrics

  private val buf =
    new java.util.concurrent.ConcurrentLinkedDeque[BatchMetrics]()

  def batches: Seq[BatchMetrics] = buf.iterator().asScala.toSeq

  def forQuery(name: String): Seq[BatchMetrics] =
    batches.filter(_.queryName == name)

  /** Total rows the watermark silently discarded across the query's life
    * (within the retained window) — the number that should alarm when
    * nonzero on a pipeline believed to have no late data.
    */
  def droppedLateRows(name: String): Long =
    forQuery(name).map(_.droppedLateRows).sum

  /** State rows as of the newest batch — the figure to trend: unbounded
    * growth here means a watermark (or TTL) is missing.
    */
  def currentStateRows(name: String): Long =
    forQuery(name).lastOption.map(_.stateRows).getOrElse(0L)

  def currentStateBytes(name: String): Long =
    forQuery(name).lastOption.map(_.stateBytes).getOrElse(0L)

  override def onQueryStarted(
      event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    buf.addLast(BatchMetrics(
      queryName = Option(p.name).getOrElse(p.id.toString),
      batchId = p.batchId,
      inputRows = p.numInputRows,
      droppedLateRows = p.stateOperators.map(_.numRowsDroppedByWatermark).sum,
      stateRows = p.stateOperators.map(_.numRowsTotal).sum,
      stateBytes = p.stateOperators.map(_.memoryUsedBytes).sum,
      watermark = Option(p.eventTime.get("watermark")).getOrElse("")))
    while (buf.size() > maxBatches) buf.pollFirst()
  }

  override def onQueryTerminated(
      event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

object StreamMetricsListener {

  /** One micro-batch's operational snapshot. */
  final case class BatchMetrics(
      queryName: String,
      batchId: Long,
      inputRows: Long,
      droppedLateRows: Long,
      stateRows: Long,
      stateBytes: Long,
      watermark: String)

  /** Register a fresh listener on the session's streaming bus; the caller
    * owns removal (`spark.streams.removeListener`). Listener delivery is
    * ASYNC — after `processAllAvailable`, poll [[await]] rather than
    * asserting immediately.
    */
  def attach(spark: SparkSession, maxBatches: Int = 1024): StreamMetricsListener = {
    val l = new StreamMetricsListener(maxBatches)
    spark.streams.addListener(l)
    l
  }

  /** Wait (bounded) until `cond` holds over the listener — the bus posts
    * progress events asynchronously, so metrics lag `processAllAvailable`
    * by a beat.
    */
  def await(cond: => Boolean, timeoutMs: Long = 30000L): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
    cond
  }
}
