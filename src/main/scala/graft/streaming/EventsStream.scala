package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, StreamingQuery, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}

/** Structured Streaming over the `events` fixture — the working analogue of
  * the reference's CDC stub (crates/cdc/src/lib.rs:9 "TODO: Implement CDC
  * logic"; roadmap README.md:218 "Async CDC Updates"). The reference's
  * intent — change streams invalidating/refreshing cached results — is
  * realized here as: file stream -> watermarked tumbling-window aggregate
  * -> foreachBatch sink that refreshes a registered table.
  *
  * Scale notes: the file source lists and checkpoints incrementally (no
  * re-read of seen files); the watermark bounds window state so a
  * long-running stream holds hours of state, not history; the aggregation
  * shuffles on (window, event_type) like any groupBy — AQE does not apply
  * in streaming, so shuffle partitions are sized by the session default.
  */
object EventsStream {

  /** Stream from a DIRECTORY of event parquet files (the file source
    * tails a drop folder; new files become micro-batches). `ts` has
    * shipped as TIMESTAMP(NANOS) (long via the nanosAsLong conf) or plain
    * timestamp[us] depending on fixture generation; both normalize to
    * TimestampType micros ([[graft.queries.QueryUtil.normalizeTs]]).
    */
  def readEventsStream(spark: SparkSession, eventsDir: String): DataFrame = {
    // any session must be able to infer the TIMESTAMP(NANOS) schema, not
    // just ones built by GraftSession.local; timeZone=UTC so the NTZ
    // branch of normalizeTs relabels instants instead of shifting them
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // A drop folder spanning fixture generations would mix long-nanos and
    // timestamp[us] footers; batch inference picks ONE footer's type and
    // micro-batches reading the other generation then fail or misread
    // mid-stream. mergeSchema forces the conflict to surface NOW (Long
    // and Timestamp don't merge) so the stream fails fast at start, not
    // mid-flight.
    val batchSchema =
      try spark.read.option("mergeSchema", "true").parquet(eventsDir).schema
      catch {
        case e: org.apache.spark.SparkException if e.getMessage != null &&
            e.getMessage.contains("merge") =>
          throw new IllegalStateException(
            s"events drop directory $eventsDir mixes fixture generations " +
              "(long-nanos and timestamp ts footers); a streamed folder must " +
              "be single-generation — split it or rewrite one side", e)
      }
    graft.queries.QueryUtil.normalizeTs(
      spark.readStream
        .schema(batchSchema)
        .parquet(eventsDir))
  }

  /** Watermarked tumbling-window counts per event_type. */
  def windowedCounts(eventsTs: DataFrame, window_ : String = "1 hour"): DataFrame =
    eventsTs
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("sum_value")
      )
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n"),
        col("sum_value")
      )

  /** Sliding windows: every event lands in (size/slide) windows — here
    * 2h/1h, so per-window counts sum to exactly 2x the event count (the
    * StreamingSpec conservation check).
    */
  def slidingCounts(eventsTs: DataFrame): DataFrame =
    eventsTs
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** SESSION windows in streaming: per-user activity sessions that close
    * after `gap` of silence — the streaming twin of the batch
    * gaps-and-islands query (`q_events_sessions`). Spark's native
    * `session_window` merges a user's overlapping windows in the state
    * store and the watermark is what lets a session FINALIZE: a session
    * emits when the watermark passes its close, so state is bounded by
    * active-sessions × gap, never stream lifetime.
    */
  def sessionCounts(eventsTs: DataFrame, gap: String = "30 minutes"): DataFrame =
    eventsTs
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"),
        col("sum_value"))

  /** Streaming exactly-once dedup on event_id: the watermark bounds the
    * dedup state (an id older than the watermark can be dropped because a
    * duplicate that late would be discarded anyway).
    */
  def dedupedEvents(eventsTs: DataFrame): DataFrame =
    eventsTs
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")

  /** Per-user running activity state (custom streaming state — the
    * `flatMapGroupsWithState` surface SURVEY M5 scopes): total events and
    * last-seen timestamp per user, updated each micro-batch.
    */
  final case class UserActivity(userId: Long, nEvents: Long, lastTsMicros: Long)

  def userActivity(
      spark: SparkSession,
      eventsTs: DataFrame
  ): Dataset[UserActivity] = {
    import spark.implicits._
    val pairs = eventsTs
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long)]
    pairs
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserActivity, UserActivity](
        OutputMode.Update,
        GroupStateTimeout.NoTimeout
      ) { (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[UserActivity]) =>
        var acc = state.getOption.getOrElse(UserActivity(uid, 0L, Long.MinValue))
        rows.foreach { case (_, ts) =>
          acc = UserActivity(uid, acc.nEvents + 1, math.max(acc.lastTsMicros, ts))
        }
        state.update(acc)
        Iterator.single(acc)
      }
  }

  /** Spark 4 `transformWithState` version of [[userActivity]]: the same
    * per-user running aggregate through the NEW arbitrary-state API
    * (StatefulProcessor + typed ValueState handles, RocksDB-backed state
    * store). flatMapGroupsWithState remains the stable workhorse above;
    * this is the forward-looking surface — explicit state variables, TTL
    * config, and timers — that new stateful pipelines should target.
    * StreamingSpec pins stream == batch equality for both.
    */
  def userActivityTws(
      spark: SparkSession,
      eventsTs: DataFrame
  ): Dataset[UserActivity] = {
    import spark.implicits._
    val pairs = eventsTs
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long)]
    pairs
      .groupByKey(_._1)
      .transformWithState(
        new UserActivityProcessor,
        TimeMode.None(),
        OutputMode.Update
      )
  }

  /** Stream-stream inner join: clicks joined to the same user's purchases
    * within the preceding hour. Both sides carry watermarks and the join
    * condition bounds the time skew, so each side's buffered state is
    * evictable — the requirements for Spark to run a stream-stream join
    * with finite state at all.
    */
  def clickPurchaseJoin(eventsTs: DataFrame): DataFrame = {
    val clicks = eventsTs
      .filter(col("event_type") === "click")
      .select(
        col("event_id").as("click_id"),
        col("user_id"),
        col("ts").as("click_ts")
      )
      .withWatermark("click_ts", "1 hour")
    val purchases = eventsTs
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"),
        col("value").as("purchase_value")
      )
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(
      purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("purchase_ts") <= col("click_ts"),
      "inner"
    ).select(col("click_id"), col("user_id"), col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** Run the windowed aggregate into an in-memory table the engine can
    * query (`spark.table("global_temp.<resultTable>")`), refreshed per
    * micro-batch via foreachBatch — the cache-refresh wiring the
    * reference's CDC layer promises. A GLOBAL temp view because foreachBatch
    * executes in a cloned micro-batch session: a session-local view would
    * be invisible to the serving session. Returns the running query;
    * callers drive it with `processAllAvailable()`/`awaitTermination`.
    */
  def startRefresh(
      spark: SparkSession,
      eventsDir: String,
      resultTable: String,
      checkpoint: String,
      cache: Option[graft.engine.ResultCache] = None
  ): StreamingQuery =
    windowedCounts(readEventsStream(spark, eventsDir)).writeStream
      // Complete mode: every micro-batch carries the full aggregate, so the
      // served table is always a consistent snapshot (Update mode would
      // hand the sink deltas to merge itself).
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // ResultCache.put persists AND counts — full materialization is
        // also what makes the state-store commit valid (every partition
        // must be processed inside foreachBatch)
        cache match {
          case Some(c) => c.refresh(resultTable, batch)
          case None    => batch.persist(); batch.count()
        }
        batch.createOrReplaceGlobalTempView(resultTable)
        ()
      }
      .start()
}

/** StatefulProcessor behind [[EventsStream.userActivityTws]]: one typed
  * ValueState slot per user holding the running (count, last-seen) pair.
  * No TTL and no timers — the fixture aggregate is unbounded by design;
  * production pipelines would set TTLConfig to bound state growth.
  */
class UserActivityProcessor
    extends StatefulProcessor[Long, (Long, Long), EventsStream.UserActivity] {

  @transient private var state: ValueState[EventsStream.UserActivity] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[EventsStream.UserActivity](
      "activity",
      org.apache.spark.sql.Encoders.product[EventsStream.UserActivity],
      TTLConfig.NONE
    )

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long)],
      timerValues: TimerValues
  ): Iterator[EventsStream.UserActivity] = {
    var acc = Option(state.get())
      .getOrElse(EventsStream.UserActivity(key, 0L, Long.MinValue))
    rows.foreach { case (_, ts) =>
      acc = EventsStream.UserActivity(key, acc.nEvents + 1, math.max(acc.lastTsMicros, ts))
    }
    state.update(acc)
    Iterator.single(acc)
  }
}
