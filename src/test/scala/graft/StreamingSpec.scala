package graft

import org.apache.spark.sql.functions._
import graft.streaming.{EventsStream, IcebergChangeFeed}

/** M5: Structured Streaming over the events fixture — the realized version
  * of the reference's CDC stub (crates/cdc/src/lib.rs:9). The stream must
  * produce exactly what the batch engine computes over the same files.
  */
class StreamingSpec extends SparkTestBase {

  test("file stream -> watermark -> tumbling window == batch computation") {
    // stage the fixture as a drop-folder the file source can tail
    val eventsDir = tempDir("graft-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestBase.Sf0001, "events.parquet"),
      java.nio.file.Paths.get(eventsDir, "events-000.parquet")
    )
    val checkpoint = tempDir("graft-ckpt")

    val q = EventsStream.startRefresh(
      spark, eventsDir, "events_live", checkpoint, cache = Some(session.cache))
    try q.awaitTermination(120000)
    finally q.stop()

    // the CDC-refresh wiring: the micro-batch landed in the result cache
    assert(session.cache.get("events_live").isDefined)

    val streamed = spark
      .table("global_temp.events_live")
      .orderBy("window_start", "event_type")
      .collect()

    val batch = EventsStream
      .windowedCounts(graft.queries.QueryUtil.events(spark, SparkTestBase.Sf0001))
      .orderBy("window_start", "event_type")
      .collect()

    assert(streamed.nonEmpty, "stream produced no windows")
    assert(streamed.toSeq === batch.toSeq)
  }

  test("stream-refreshed table is servable over the network endpoint") {
    // the full CDC-to-serving story: file stream -> windowed aggregate ->
    // global-temp refresh -> DO_GET over a real socket returns the same
    // rows the batch engine computes. This is the reference's promised
    // coordinator shape (CDC keeps tables fresh, Flight serves them) as a
    // working pipeline.
    val eventsDir = tempDir("graft-events-serve")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestBase.Sf0001, "events.parquet"),
      java.nio.file.Paths.get(eventsDir, "events-000.parquet")
    )
    val checkpoint = tempDir("graft-ckpt-serve")
    val q = EventsStream.startRefresh(
      spark, eventsDir, "events_served", checkpoint, cache = Some(session.cache))
    try q.awaitTermination(120000)
    finally q.stop()

    val srv = new graft.engine.ServingServer(session).start()
    try {
      val sql = "SELECT window_start, event_type, n " +
        "FROM global_temp.events_served ORDER BY window_start, event_type"
      val r = graft.engine.ServingClient.doGet(srv.boundPort, sql)
      assert(r.isOk, r.status)
      assert(r.columnNames === Seq("window_start", "event_type", "n"))
      val batch = EventsStream
        .windowedCounts(graft.queries.QueryUtil.events(spark, SparkTestBase.Sf0001))
        .orderBy("window_start", "event_type")
        .collect()
      assert(r.rows.size === batch.length, s"served ${r.rows.size} of ${batch.length}")
      assert(
        r.rows.map(_.last.toString.toLong).sum ===
          batch.map(_.getAs[Long]("n")).sum,
        "served event counts diverge from the batch computation")
    } finally srv.close()
  }

  test("streaming dedup drops re-delivered files' duplicates") {
    // stage the SAME data twice: the file source treats each file as new
    // input, so every event_id arrives twice; dropDuplicates must halve it
    val eventsDir = tempDir("graft-events-dup")
    val src = java.nio.file.Paths.get(SparkTestBase.Sf0001, "events.parquet")
    java.nio.file.Files.copy(src, java.nio.file.Paths.get(eventsDir, "a.parquet"))
    java.nio.file.Files.copy(src, java.nio.file.Paths.get(eventsDir, "b.parquet"))
    val checkpoint = tempDir("graft-ckpt-dup")

    val deduped = EventsStream.dedupedEvents(EventsStream.readEventsStream(spark, eventsDir))
    // memory sink: append batches ACCUMULATE (foreachBatch view-replacement
    // would drop earlier batches and can end on an empty trailing batch)
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("events_deduped")
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000)
    finally q.stop()

    val total = graft.queries.QueryUtil.events(spark, SparkTestBase.Sf0001).count()
    assert(spark.table("events_deduped").count() === total)
    assert(
      spark.table("events_deduped").select("event_id").distinct().count() === total
    )
  }

  test("streaming session windows equal the batch twin up to the final watermark") {
    import org.apache.spark.sql.functions._
    val eventsDir = tempDir("graft-events-sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestBase.Sf0001, "events.parquet"),
      java.nio.file.Paths.get(eventsDir, "events.parquet")
    )
    val checkpoint = tempDir("graft-ckpt-sess")
    val q = EventsStream
      .sessionCounts(EventsStream.readEventsStream(spark, eventsDir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessions_live")
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000)
    finally q.stop()

    // append mode emits a session once the watermark passes its close;
    // the exact final watermark comes from the query's own progress
    val wmStr = q.lastProgress.eventTime.get("watermark")
    assert(wmStr != null, "no watermark recorded")
    val wm = java.time.Instant.parse(wmStr)
    val batchEvents = graft.queries.QueryUtil.events(spark, SparkTestBase.Sf0001)
    val batch = batchEvents
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
      .filter(col("session_end") <= lit(java.sql.Timestamp.from(wm)))
      .collect().map(_.toString).sorted.toSeq
    val streamed = spark.table("sessions_live")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty, "no sessions finalized below the watermark")
    assert(streamed === batch,
      "streaming sessions diverged from the batch session_window twin")
  }

  test("flatMapGroupsWithState per-user activity equals batch aggregation") {
    val eventsDir = tempDir("graft-events-state")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestBase.Sf0001, "events.parquet"),
      java.nio.file.Paths.get(eventsDir, "events.parquet")
    )
    val checkpoint = tempDir("graft-ckpt-state")

    val activity = EventsStream.userActivity(
      spark,
      EventsStream.readEventsStream(spark, eventsDir)
    )
    val q = activity.toDF().writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.persist(); batch.count()
        batch.createOrReplaceGlobalTempView("user_activity")
        ()
      }
      .start()
    try q.awaitTermination(120000)
    finally q.stop()

    val streamed = spark.table("global_temp.user_activity")
      .orderBy("userId")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val batch = graft.queries.QueryUtil.events(spark, SparkTestBase.Sf0001)
      .groupBy("user_id").count().orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.toSeq === batch.toSeq)
  }

  test("transformWithState per-user activity equals batch aggregation (Spark 4 API)") {
    val eventsDir = tempDir("graft-events-tws")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestBase.Sf0001, "events.parquet"),
      java.nio.file.Paths.get(eventsDir, "events.parquet")
    )
    val checkpoint = tempDir("graft-ckpt-tws")
    // transformWithState requires the RocksDB state store provider; scope
    // the conf to a derived session so other streaming tests keep the
    // default HDFS-backed store
    val s2 = spark.newSession()
    s2.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val activity = EventsStream.userActivityTws(
      s2,
      EventsStream.readEventsStream(s2, eventsDir)
    )
    val q = activity.toDF().writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.persist(); batch.count()
        batch.createOrReplaceGlobalTempView("user_activity_tws")
        ()
      }
      .start()
    try q.awaitTermination(120000)
    finally q.stop()

    val streamed = spark.table("global_temp.user_activity_tws")
      .orderBy("userId")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val batch = graft.queries.QueryUtil.events(spark, SparkTestBase.Sf0001)
      .groupBy("user_id").count().orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.toSeq === batch.toSeq)
  }

  test("sliding windows: every event lands in exactly size/slide windows") {
    val sliding = EventsStream
      .slidingCounts(graft.queries.QueryUtil.events(spark, SparkTestBase.Sf0001))
      .agg(sum("n"))
      .head()
      .getLong(0)
    val total = graft.queries.QueryUtil.events(spark, SparkTestBase.Sf0001).count()
    assert(sliding === 2 * total)
  }

  test("incremental arrival: a file landing later is picked up as a new micro-batch") {
    val eventsDir = tempDir("graft-events-inc")
    val checkpoint = tempDir("graft-ckpt-inc")
    val src = java.nio.file.Paths.get(SparkTestBase.Sf0001, "events.parquet")

    // half the data "arrives" first
    val half = graft.queries.QueryUtil.t(spark, SparkTestBase.Sf0001, "events")
    half.filter(org.apache.spark.sql.functions.col("event_id") % 2 === 0)
      .write.parquet(s"$eventsDir/batch0")
    val stream = EventsStream.readEventsStream(spark, s"$eventsDir/*/")
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("events_incremental")
      .option("checkpointLocation", checkpoint)
      .start()
    try {
      q.processAllAvailable()
      val n1 = spark.table("events_incremental").count()
      // the other half lands; the SAME running query must ingest it
      half.filter(org.apache.spark.sql.functions.col("event_id") % 2 === 1)
        .write.parquet(s"$eventsDir/batch1")
      q.processAllAvailable()
      val n2 = spark.table("events_incremental").count()
      val total = half.count()
      assert(n1 < total, "first batch should be partial")
      assert(n2 === total, s"stream missed late-arriving files: $n2 != $total")
    } finally q.stop()
  }

  test("streaming ingest into an Iceberg table: batches append, replays are idempotent") {
    import graft.streaming.IcebergSink
    import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}
    val dropDir = tempDir("graft-iceberg-ingest")
    val checkpoint = tempDir("graft-ckpt-iceberg")
    val table = tempDir("graft-iceberg-sink-table")

    val docs = graft.queries.QueryUtil.t(spark, SparkTestBase.Sf0001, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    docs.filter(org.apache.spark.sql.functions.col("n_nationkey") < 12)
      .write.parquet(s"$dropDir/batch0")

    def stream = spark.readStream.schema(docs.schema).parquet(s"$dropDir/*/")
    var tick = 0L
    val clock = () => { tick += 1000L; tick }

    // batch 0 lands as snapshot 1 with its batch id in the summary
    val q1 = IcebergSink.start(stream, table, checkpoint, clock = clock)
    try q1.awaitTermination(120000) finally q1.stop()
    val n1 = IcebergSource.read(spark, table).count()
    assert(n1 === 12)
    assert(IcebergSink.lastCommittedBatch(table) === Some(0L))
    assert(IcebergMeta.load(table).snapshots.head
      .summary(IcebergSink.BatchIdKey) === "0")

    // late files + a RESTART from the same checkpoint: only the new
    // batch commits (AvailableNow re-starts get fresh batch ids)
    docs.filter(org.apache.spark.sql.functions.col("n_nationkey") >= 12)
      .write.parquet(s"$dropDir/batch1")
    val q2 = IcebergSink.start(stream, table, checkpoint, clock = clock)
    try q2.awaitTermination(120000) finally q2.stop()
    assert(IcebergSource.read(spark, table).count() === docs.count())
    val metaAfter = IcebergMeta.load(table)
    assert(metaAfter.snapshots.size === 2, "restart must not re-commit batch 0")

    // crash-replay simulation: foreachBatch re-delivers an ALREADY
    // COMMITTED batch id (crash between table commit and checkpoint ack)
    // — the writer must skip it, leaving the table byte-identical
    val writer = IcebergSink.batchWriter(table, clock = clock)
    val before = IcebergSource.read(spark, table).count()
    writer(docs.limit(5), IcebergSink.lastCommittedBatch(table).get)
    assert(IcebergMeta.load(table).snapshots.size === 2,
      "replayed batch id must not commit a new snapshot")
    assert(IcebergSource.read(spark, table).count() === before)
    // ...while the NEXT batch id commits normally
    writer(docs.limit(5), IcebergSink.lastCommittedBatch(table).get + 1)
    assert(IcebergMeta.load(table).snapshots.size === 3)
    assert(IcebergSource.read(spark, table).count() === before + 5)
  }

  test("streaming ingest into a day(ts)-partitioned Iceberg table prunes like batch-built layouts") {
    import graft.streaming.IcebergSink
    import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}
    val dropDir = tempDir("graft-iceberg-ingest-part")
    val checkpoint = tempDir("graft-ckpt-iceberg-part")
    val table = tempDir("graft-iceberg-sink-day")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestBase.Sf0001, "events.parquet"),
      java.nio.file.Paths.get(dropDir, "events-000.parquet"))

    val stream = EventsStream.readEventsStream(spark, dropDir)
      .select("event_id", "event_type", "ts", "value")
    var tick = 0L
    val q = IcebergSink.start(stream, table, checkpoint,
      partition = Some(IcebergWriter.PartitionTransform("ts", "day")),
      clock = () => { tick += 1000L; tick })
    try q.awaitTermination(120000) finally q.stop()

    val batch = graft.queries.QueryUtil.events(spark, SparkTestBase.Sf0001)
    assert(IcebergSource.read(spark, table).count() === batch.count())

    // the streamed table is HIDDEN-partitioned: a one-day predicate opens
    // a small subset of the ~30 day manifests
    val firstDay = batch
      .agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")))).head().getDate(0)
    val meta = IcebergMeta.load(table)
    val plan = IcebergMeta.planScan(meta, meta.currentSnapshot.get,
      Some(IcebergMeta.PartitionEquals("ts",
        new java.sql.Timestamp(firstDay.getTime))))
    assert(plan.manifestsTotal > 10, s"expected ~30 day manifests, got ${plan.manifestsTotal}")
    assert(plan.manifestsRead < plan.manifestsTotal / 5,
      s"day predicate opened ${plan.manifestsRead} of ${plan.manifestsTotal}")
    val dayFiles = plan.files.map(_.path).toSet

    // the nightly counterweight to snapshot-per-batch ingest: rewrite the
    // accreted manifests with a small split so the consolidation CLUSTERS
    // by partition — each output manifest covers a contiguous day range,
    // so a one-day plan still skips most manifests AND reads the exact
    // same files as before the rewrite
    val rep = IcebergWriter.rewriteManifests(spark, table, 999999L,
      maxEntriesPerManifest = math.max(1, plan.manifestsTotal / 4))
    assert(rep.snapshotId.nonEmpty)
    assert(rep.manifestsAfter < plan.manifestsTotal / 2)
    val m2 = IcebergMeta.load(table)
    val plan2 = IcebergMeta.planScan(m2, m2.currentSnapshot.get,
      Some(IcebergMeta.PartitionEquals("ts",
        new java.sql.Timestamp(firstDay.getTime))))
    assert(plan2.files.map(_.path).toSet === dayFiles,
      "rewrite changed the pruned file set")
    assert(plan2.manifestsRead < plan2.manifestsTotal,
      s"clustered rewrite lost manifest pruning: " +
        s"${plan2.manifestsRead} of ${plan2.manifestsTotal}")
    assert(IcebergSource.read(spark, table).count() === batch.count())
  }

  test("listener surfaces a planted late row as dropped-by-watermark, plus state size") {
    import org.apache.spark.sql.types._
    val eventsDir = tempDir("graft-events-obs")
    val checkpoint = tempDir("graft-ckpt-obs")
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("ts", TimestampType)))
    def mk(rows: Seq[(Long, String, String)], dir: String): Unit = {
      import scala.jdk.CollectionConverters._
      val data = rows.zipWithIndex.map { case ((uid, et, ts), i) =>
        org.apache.spark.sql.Row(
          i.toLong, uid, et, 1.0, java.sql.Timestamp.valueOf(ts))
      }
      spark.createDataFrame(data.asJava, schema).write.parquet(s"$eventsDir/$dir")
    }
    // batch 0: six hours of events — commits watermark = max(ts) - 1h
    mk((0 until 6).map(h => (1L, "click", f"2026-01-01 0$h:30:00")), "b0")

    val metrics = graft.streaming.StreamMetricsListener.attach(spark)
    val q = EventsStream
      .windowedCounts(EventsStream.readEventsStream(spark, s"$eventsDir/*/"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("events_obs")
      .option("checkpointLocation", checkpoint)
      .start()
    try {
      q.processAllAvailable()
      assert(graft.streaming.StreamMetricsListener.await(
        metrics.forQuery("events_obs").exists(_.inputRows == 6)),
        s"no progress for batch 0: ${metrics.batches}")
      assert(metrics.droppedLateRows("events_obs") === 0L)
      // window state is live and measured
      assert(metrics.currentStateRows("events_obs") > 0)
      assert(metrics.currentStateBytes("events_obs") > 0)

      // batch 1: one fresh row (advances nothing much) + ONE ROW A DAY
      // LATE — far below the committed watermark, silently discarded by
      // the aggregation; the listener must make that loss visible
      mk(Seq((2L, "click", "2026-01-01 05:45:00"),
        (3L, "click", "2025-12-31 00:00:00")), "b1")
      q.processAllAvailable()
      assert(graft.streaming.StreamMetricsListener.await(
        metrics.droppedLateRows("events_obs") == 1L),
        s"late row never surfaced: ${metrics.forQuery("events_obs")}")
      // and the committed watermark itself is reported
      assert(metrics.forQuery("events_obs").last.watermark.startsWith("2026-01-01"),
        metrics.forQuery("events_obs").last.watermark)
    } finally {
      q.stop()
      spark.streams.removeListener(metrics)
    }
  }

  test("stream-stream join equals the batch join") {
    val eventsDir = tempDir("graft-events-ssj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestBase.Sf0001, "events.parquet"),
      java.nio.file.Paths.get(eventsDir, "events.parquet")
    )
    val checkpoint = tempDir("graft-ckpt-ssj")

    val joined = EventsStream.clickPurchaseJoin(EventsStream.readEventsStream(spark, eventsDir))
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ssj_out")
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(180000)
    finally q.stop()

    val streamed = spark.table("ssj_out")
      .orderBy("click_id", "purchase_ts").collect()
    val batch = EventsStream
      .clickPurchaseJoin(graft.queries.QueryUtil.events(spark, SparkTestBase.Sf0001))
      .orderBy("click_id", "purchase_ts").collect()
    assert(streamed.nonEmpty, "stream-stream join produced nothing")
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming decontamination flags exactly the batch operator's docs") {
    import graft.streaming.CorpusStream
    // stage the documents fixture as a drop folder
    val docsDir = tempDir("graft-docs-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestBase.Sf0001, "documents.parquet"),
      java.nio.file.Paths.get(docsDir, "docs-000.parquet")
    )
    // static benchmark gram set = the q_decontaminate benchmark slice
    val bench = CorpusStream.benchmarkGrams(
      graft.queries.QueryUtil
        .t(spark, SparkTestBase.Sf0001, "documents")
        .filter(col("doc_id") % 20 === 0)
    )
    val stream = CorpusStream
      .readDocumentsStream(spark, docsDir)
      .filter(col("doc_id") % 20 =!= 0) // corpus side, like the batch op
    val q = CorpusStream
      .contaminationMatches(stream, bench)
      .writeStream
      .format("memory")
      .queryName("contam_live")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000)
    finally q.stop()

    val streamed = spark.table("contam_live")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val batch = graft.queries.Registry.byName("q_decontaminate")
      .fn(spark, SparkTestBase.Sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(batch.nonEmpty && streamed === batch)

    // over-broadcast benchmark (forced, limit 0): the stream-static join
    // falls back to shuffle-hash and flags the SAME docs
    val q2 = CorpusStream
      .contaminationMatches(
        CorpusStream.readDocumentsStream(spark, docsDir)
          .filter(col("doc_id") % 20 =!= 0),
        bench, maxBroadcastGramRows = 0)
      .writeStream
      .format("memory")
      .queryName("contam_live_shuffle")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q2.awaitTermination(120000)
    finally q2.stop()
    val shuffled = spark.table("contam_live_shuffle")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(shuffled === batch, "shuffle fallback changed the streamed matches")
  }

  test("streaming quality screen decides every document exactly like the batch operator") {
    import graft.streaming.CorpusStream
    val docsDir = tempDir("graft-docs-quality")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestBase.Sf0001, "documents.parquet"),
      java.nio.file.Paths.get(docsDir, "docs-000.parquet")
    )
    val q = CorpusStream
      .qualityScreen(CorpusStream.readDocumentsStream(spark, docsDir))
      .writeStream
      .format("memory")
      .queryName("quality_live")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000)
    finally q.stop()

    // the stream holds ZERO state: every rule is within-document, so the
    // plan must carry no stateful operator
    assert(q.lastProgress.stateOperators.isEmpty,
      "quality screen grew streaming state")

    val streamed = spark.table("quality_live")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val batch = graft.queries.TextQueries
      .gopherFilter(graft.queries.QueryUtil
        .t(spark, SparkTestBase.Sf0001, "documents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    assert(batch.nonEmpty && streamed === batch,
      "per-row streaming formulation diverged from the shuffle-based batch one")
    assert(streamed.exists(!_._4) && streamed.exists(_._4),
      "fixture should split keep/drop")
  }

  test("streaming NLL scoring under a frozen model equals batch; OOV takes the smoothing mass") {
    import org.apache.spark.sql.functions.col
    import graft.queries.TextQueries
    val docsDir = tempDir("graft-docs-nll")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestBase.Sf0001, "documents.parquet"),
      java.nio.file.Paths.get(docsDir, "docs-000.parquet")
    )
    // fit offline on the training half; score the held-out half online
    val all = graft.queries.QueryUtil.t(spark, SparkTestBase.Sf0001, "documents")
    val (model, oovLp) = TextQueries.fitUnigramModel(all.filter(col("doc_id") % 2 === 0))
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = graft.streaming.CorpusStream.nllScoreSink(
      graft.streaming.CorpusStream.readDocumentsStream(spark, docsDir)
        .filter(col("doc_id") % 2 === 1),
      model, oovLp, tempDir("graft-ckpt-nll"),
      scored => collected.synchronized {
        collected ++= scored.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      })
    try q.awaitTermination(120000)
    finally q.stop()

    val batch = TextQueries
      .scoreNll(all.filter(col("doc_id") % 2 === 1), model, oovLp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(batch.nonEmpty && collected.sortBy(_._1).toSeq === batch,
      "streamed scores diverged from batch under the same frozen model")

    // OOV: a doc of tokens the model never saw scores exactly -oovLp
    import spark.implicits._
    val oov = TextQueries.scoreNll(
      Seq((999L, "zzqx zzqx plmw")).toDF("doc_id", "text"), model, oovLp)
      .head()
    assert(oov.getLong(1) === 3L)
    assert(math.abs(oov.getDouble(2) - (-oovLp)) < 1e-6,
      s"OOV doc should score -oovLp, got ${oov.getDouble(2)} vs ${-oovLp}")
  }

  test("streaming classifier scoring under a frozen model equals batch") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.operators.QualityClassifier
    val nBuckets = 64
    val docsDir = tempDir("graft-docs-clf")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestBase.Sf0001, "documents.parquet"),
      java.nio.file.Paths.get(docsDir, "docs-000.parquet")
    )
    // fit offline on the training half; score the held-out half online
    val all = graft.queries.QueryUtil.t(spark, SparkTestBase.Sf0001, "documents")
    val feat = QualityClassifier
      .featurize(all.filter(col("doc_id") % 2 === 0), col("lang") === "en", nBuckets)
      .cache()
    val model =
      try QualityClassifier.fit(feat, nBuckets, iters = 20, step = 1.0)
      finally feat.unpersist(): Unit
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val q = graft.streaming.CorpusStream.classifierScoreSink(
      graft.streaming.CorpusStream.readDocumentsStream(spark, docsDir)
        .filter(col("doc_id") % 2 === 1),
      model, nBuckets, tempDir("graft-ckpt-clf"),
      scored => collected.synchronized {
        collected ++= scored.collect().map(r => (r.getLong(0), r.getDouble(2)))
      })
    try q.awaitTermination(120000)
    finally q.stop()

    val batch = QualityClassifier.scoreFeaturized(
      QualityClassifier.featurize(
        all.filter(col("doc_id") % 2 === 1), lit(0.0), nBuckets),
      model)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(batch.nonEmpty && collected.sortBy(_._1).toSeq === batch,
      "streamed quality scores diverged from batch under the same frozen model")
  }

  test("streaming ingest dedup against the stored index equals the batch operator") {
    import graft.streaming.CorpusStream
    // corpus -> stored index (the on-disk dedup state the stream reads)
    def sent(seed: Int): String =
      (0 until 30).map(i => s"s${seed}y$i").mkString(" ")
    import spark.implicits._
    val corpus = Seq(
      (1L, sent(1)), (2L, sent(2)), (3L, sent(3)), (4L, sent(4))
    ).toDF("doc_id", "text")
    val index = graft.operators.MinHashIndex
      .materialize(corpus, tempDir("graft-stream-minhash"))

    // increment arrives as TWO files -> two micro-batches; includes a
    // corpus duplicate, an intra-batch duplicate pair, and unique docs
    val dropDir = tempDir("graft-dedup-stream")
    val inc1 = Seq((101L, sent(3)), (102L, sent(9))).toDF("doc_id", "text")
    val inc2 = Seq((103L, sent(9)), (104L, sent(11)), (105L, sent(11)))
      .toDF("doc_id", "text")
    inc1.coalesce(1).write.mode("append").parquet(dropDir)

    val got = collection.concurrent.TrieMap.empty[(Long, Long), Double]
    val q = CorpusStream.incrementalDedupSink(
      CorpusStream.readDocumentsStream(spark, dropDir), index, 0.5) {
      (pairs, _) =>
        pairs.collect().foreach(r =>
          got.put((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    }
    try {
      q.processAllAvailable()
      assert(got.keySet === Set((3L, 101L)),
        s"first micro-batch must flag the corpus duplicate: $got")
      inc2.coalesce(1).write.mode("append").parquet(dropDir)
      q.processAllAvailable()
      // batch 2 flags its INTRA-BATCH pair (104, 105). The cross-batch
      // pair (102, 103) is invisible by contract: doc 102 is not in the
      // stored index — the index IS the corpus state, so an ingest that
      // must catch cross-batch dups folds each accepted batch into it
      // (the foldId variant below).
      assert(got.keySet === Set((3L, 101L), (104L, 105L)),
        s"unexpected pairs: $got")
      assert(got.values.forall(_ >= 0.99), s"planted dups are exact: $got")
    } finally q.stop()

    // foldId set: each accepted batch is appended to the index, so the
    // SAME two micro-batches now also surface the cross-batch
    // duplicate (102, 103)
    val index2 = graft.operators.MinHashIndex
      .materialize(corpus, tempDir("graft-stream-minhash-fold"))
    val dropDir2 = tempDir("graft-dedup-stream-fold")
    inc1.coalesce(1).write.mode("append").parquet(dropDir2)
    val got2 = collection.concurrent.TrieMap.empty[(Long, Long), Double]
    val q2 = CorpusStream.incrementalDedupSink(
      CorpusStream.readDocumentsStream(spark, dropDir2), index2, 0.5,
      foldId = Some("stream-t1")) {
      (pairs, _) =>
        pairs.collect().foreach(r =>
          got2.put((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    }
    try {
      q2.processAllAvailable()
      inc2.coalesce(1).write.mode("append").parquet(dropDir2)
      q2.processAllAvailable()
      assert(got2.keySet === Set((3L, 101L), (104L, 105L), (102L, 103L)),
        s"folded index must surface the cross-batch pair: $got2")
    } finally q2.stop()
  }

  test("ingest lifecycle: stream dedup + fold, mid-stream compact, restart, full replay") {
    // The production daily-ingest story as ONE scenario:
    //   corpus -> stored index; streamed increments are deduped against it
    //   and folded in; a maintenance compact(dedupe=true) runs MID-STREAM
    //   between incarnations; more batches land; a full replay (fresh
    //   checkpoint, same foldId) re-reads every file. Invariants: the
    //   union of emitted pairs equals the batch operator on the full
    //   corpus, and the replay neither duplicates index rows nor changes
    //   the pair set.
    import graft.operators.MinHashIndex
    import graft.streaming.CorpusStream
    import spark.implicits._
    def sent(seed: Int): String =
      (0 until 30).map(i => s"l${seed}q$i").mkString(" ")
    val corpus = Seq(
      (1L, sent(1)), (2L, sent(2)), (3L, sent(3)), (4L, sent(4))
    ).toDF("doc_id", "text")
    val inc1 = Seq((101L, sent(3)), (102L, sent(9))).toDF("doc_id", "text")
    val inc2 = Seq((103L, sent(9)), (104L, sent(11)), (105L, sent(11)))
      .toDF("doc_id", "text")
    val inc3 = Seq((106L, sent(1)), (107L, sent(9)), (108L, sent(13)))
      .toDF("doc_id", "text")

    // ground truth: the batch operator over the FULL final corpus
    val expected = graft.queries.DedupQueries
      .minhashPairs(corpus.union(inc1).union(inc2).union(inc3), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected === Set(
      (3L, 101L), (102L, 103L), (102L, 107L), (103L, 107L),
      (104L, 105L), (1L, 106L)), s"fixture drifted: $expected")

    val index = MinHashIndex.materialize(corpus, tempDir("graft-lifecycle-idx"))
    val dropDir = tempDir("graft-lifecycle-drop")
    val checkpoint = tempDir("graft-lifecycle-ckpt")
    val got = collection.concurrent.TrieMap.empty[(Long, Long), Double]
    def startSink() = CorpusStream.incrementalDedupSink(
      CorpusStream.readDocumentsStream(spark, dropDir), index, 0.5,
      checkpoint = Some(checkpoint), foldId = Some("daily")) { (pairs, _) =>
      pairs.collect().foreach(r =>
        got.put((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    }

    // incarnation 1: two increments, each folded after its pairs emit
    // (first file lands before the stream starts: the file source infers
    // its schema from it)
    inc1.coalesce(1).write.mode("append").parquet(dropDir)
    val q1 = startSink()
    try {
      q1.processAllAvailable()
      inc2.coalesce(1).write.mode("append").parquet(dropDir)
      q1.processAllAvailable()
      assert(got.keySet === Set((3L, 101L), (102L, 103L), (104L, 105L)),
        s"pre-compact pairs: $got")
    } finally q1.stop()

    // maintenance window: writers quiesced, compact with dedupe
    MinHashIndex.compact(spark, index, nFiles = 1, dedupe = true)
    val rowsAfterCompact = MinHashIndex.bands(spark, index).count()

    // incarnation 2 (same checkpoint resumes AFTER processed batches):
    // inc3 dups must be caught against base AND folded batches across
    // the compact boundary
    val q2 = startSink()
    try {
      inc3.coalesce(1).write.mode("append").parquet(dropDir)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(got.keySet === expected, s"lifecycle pairs != batch operator: $got")

    // full replay: fresh checkpoint re-reads EVERY file with the same
    // foldId — folds are skipped via tokens, so zero index duplication,
    // and re-emitted pairs stay inside the expected set
    val preReplay = MinHashIndex.bands(spark, index).count()
    val q3 = CorpusStream.incrementalDedupSink(
      CorpusStream.readDocumentsStream(spark, dropDir), index, 0.5,
      checkpoint = Some(tempDir("graft-lifecycle-ckpt2")),
      foldId = Some("daily")) { (pairs, _) =>
      pairs.collect().foreach(r =>
        got.put((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    }
    try q3.processAllAvailable() finally q3.stop()
    assert(MinHashIndex.bands(spark, index).count() === preReplay,
      "replay must not duplicate index rows")
    assert(preReplay > rowsAfterCompact, "inc3 fold must have landed")
    assert(got.keySet === expected, s"replay changed the pair set: $got")
    assert(got.values.forall(_ >= 0.99), s"planted dups are exact copies: $got")
  }

  test("windowed counts conserve total events") {
    val dir = SparkTestBase.Sf0001
    val total = graft.queries.QueryUtil.events(spark, dir).count()
    val windowSum = EventsStream
      .windowedCounts(graft.queries.QueryUtil.events(spark, dir))
      .agg(sum("n"))
      .head()
      .getLong(0)
    assert(windowSum === total)
  }

  test("exactly-once streaming MV: converges across merge/delete, replays no-op, one commit per refresh") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, pmod, sum, count, lit}
    import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}
    import graft.streaming.MaterializedAgg
    val src = tempDir("graft-mv-src") + "/table"
    val view = tempDir("graft-mv-view") + "/table"
    def expected() = IcebergSource.read(spark, src)
      .groupBy(pmod(col("id"), lit(4)).as("k"))
      .agg(sum(col("id")).as("s"), count(lit(1)).as("c"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def actual() = MaterializedAgg.readView(spark, view)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def refresh(ts: Long) = MaterializedAgg.refreshStep(
      spark, view, src, pmod(col("id"), lit(4)), col("id"), ts)
    def viewSnapshots() = IcebergMeta.load(view).snapshots.length

    // window 1: creation from the full changelog
    IcebergWriter.append(spark, src,
      (0L until 12L).map(i => (i, s"v$i")).toDF("id", "v"),
      None, 1000L, formatVersion = 2)
    assert(refresh(2000L).isDefined)
    assert(actual() === expected())
    val snaps1 = viewSnapshots()

    // window 2: updates + inserts via MERGE, then kill group 3 ENTIRELY
    // (ids 3,7,11) — its view row must become a hidden tombstone
    IcebergWriter.mergeRows(spark, src,
      Seq((0L, "v0b"), (20L, "v20")).toDF("id", "v"), "id", 3000L)
    IcebergWriter.deleteEquality(spark, src,
      Seq(3L, 7L, 11L).toDF("id"), 4000L)
    assert(refresh(5000L).isDefined)
    assert(actual() === expected())
    assert(!actual().exists(_._1 == 3L), "dead group must vanish from the view")
    assert(viewSnapshots() === snaps1 + 1,
      "one refresh must be exactly one view commit (atomic state+watermark)")

    // replay / race: the view is current — a second refresh is a
    // structural no-op (watermark lives IN the view, no cursor to drift)
    assert(refresh(6000L).isEmpty)
    assert(viewSnapshots() === snaps1 + 1)

    // group resurrection: a re-inserted key overwrites its tombstone
    IcebergWriter.upsertRows(spark, src, Seq((7L, "v7b")).toDF("id", "v"),
      "id", 7000L)
    assert(refresh(8000L).isDefined)
    assert(actual() === expected())
    assert(actual().exists(t => t._1 == 3L && t._3 == 1L),
      "resurrected group must reappear with exactly its new row")
    assert(MaterializedAgg.watermarkOf(spark, view) ===
      IcebergMeta.load(src).currentSnapshot.get.id)

    // a refresher that planned against a superseded view head must
    // REFUSE, not land stale values (the concurrent-refresh guard):
    // replay its commit (the step's equality-upsert flavor) with
    // requireSnapshot pinned to a stale id
    val staleId = IcebergMeta.load(view).snapshots.head.id
    val conflict = intercept[Throwable] {
      IcebergWriter.upsertRows(spark, view,
        Seq((0L, 999L, 1L)).toDF("k", "s", "c"), "k", 9000L,
        requireSnapshot = Some(staleId))
    }
    assert(conflict.getClass.getSimpleName === "CommitConflictException",
      s"stale-head upsert must conflict, got: $conflict")

    // null keys refuse loudly: MERGE equality can never update a null
    // group, so letting one in would duplicate rows on later refreshes
    IcebergWriter.upsertRows(spark, src, Seq((30L, "v30")).toDF("id", "v"),
      "id", 10000L)
    val nullKey = intercept[IllegalArgumentException] {
      MaterializedAgg.refreshStep(spark, view, src,
        org.apache.spark.sql.functions.when(col("id") < 1000, null)
          .otherwise(col("id")),
        col("id"), 11000L)
    }
    assert(nullKey.getMessage.contains("null keys"), nullKey.getMessage)
  }

  test("randomized churn x refresh interleavings converge: seeded append/upsert/delete/merge/refresh/replay sequence ends equal to the recompute") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, pmod, sum}
    import graft.sources.{IcebergSource, IcebergWriter}
    import graft.streaming.MaterializedAgg
    // the hand-written cases pin each transition; this pins their
    // COMPOSITIONS — op sequences (including refreshes at arbitrary
    // points and immediate replays) no enumeration would cover. Seeded,
    // so a failure replays deterministically.
    val src = tempDir("graft-mv-fuzz-src") + "/table"
    val view = tempDir("graft-mv-fuzz-view") + "/table"
    val rng = new scala.util.Random(4242)
    var ts = 0L
    def tick(): Long = { ts += 1000L; ts }
    var nextId = 0L
    def freshRows(n: Int) = {
      val s = (nextId until nextId + n).map(i => (i, s"v$i"))
      nextId += n
      s.toDF("id", "v")
    }
    def liveIds(): Seq[Long] = IcebergSource.read(spark, src)
      .select(col("id")).as[Long].collect().sorted.toSeq
    def expected() = IcebergSource.read(spark, src)
      .groupBy(pmod(col("id"), lit(8)).as("k"))
      .agg(sum(col("id")).as("s"), count(lit(1)).as("c"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def actual() = MaterializedAgg.readView(spark, view)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def refresh() = MaterializedAgg.refreshStep(
      spark, view, src, pmod(col("id"), lit(8)), col("id"), tick())
    IcebergWriter.append(spark, src, freshRows(40), None, tick(),
      formatVersion = 2)
    assert(refresh().isDefined)
    for (step <- 1 to 30) {
      rng.nextInt(5) match {
        case 0 =>
          IcebergWriter.append(spark, src,
            freshRows(1 + rng.nextInt(12)), None, tick())
        case 1 =>
          val ids = rng.shuffle(liveIds()).take(1 + rng.nextInt(8))
          if (ids.nonEmpty) IcebergWriter.upsertRows(spark, src,
            ids.map(i => (i, s"u$i-$step")).toDF("id", "v"), "id", tick())
        case 2 =>
          val ids = rng.shuffle(liveIds()).take(1 + rng.nextInt(8))
          if (ids.nonEmpty) IcebergWriter.deleteEquality(spark, src,
            ids.toDF("id"), tick())
        case 3 =>
          val ups = rng.shuffle(liveIds()).take(rng.nextInt(4))
            .map(i => (i, s"m$i-$step"))
          val rows = ups.toDF("id", "v").unionByName(
            freshRows(1 + rng.nextInt(4)))
          IcebergWriter.mergeRows(spark, src, rows, "id", tick())
        case 4 =>
          refresh(): Unit
          if (rng.nextBoolean())
            assert(refresh().isEmpty, s"replay at head must no-op ($step)")
          assert(actual() === expected(),
            s"view must equal the recompute after the step-$step refresh")
      }
    }
    refresh(): Unit
    assert(actual() === expected(), "final state must converge")
    assert(liveIds().nonEmpty, "fixture sanity: the table never emptied")
  }

  test("randomized churn x min/max refresh interleavings converge: extremum deaths, interior churn and replays under any seeded sequence") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, max, min, pmod}
    import graft.sources.{IcebergSource, IcebergWriter}
    import graft.streaming.MaterializedAgg
    // the extremum-rescan class's fuzz: upserts MOVE measures (each is
    // a delete of the old row — possibly the stored extremum, forcing a
    // rescan — plus an insert that may or may not set a new one), and
    // deletes hit extrema and interiors indiscriminately.
    val src = tempDir("graft-mvmm-fuzz-src") + "/table"
    val view = tempDir("graft-mvmm-fuzz-view") + "/table"
    val rng = new scala.util.Random(555)
    var ts = 0L
    def tick(): Long = { ts += 1000L; ts }
    var nextId = 0L
    def freshRows(n: Int) = {
      val s = (nextId until nextId + n).map(i => (i, (i * 7) % 100L))
      nextId += n
      s.toDF("id", "m")
    }
    def liveIds(): Seq[Long] = IcebergSource.read(spark, src)
      .select(col("id")).as[Long].collect().sorted.toSeq
    def expected() = IcebergSource.read(spark, src)
      .groupBy(pmod(col("id"), lit(4)).as("k"))
      .agg(min(col("m")).as("mn"), max(col("m")).as("mx"),
        count(lit(1)).as("c"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    def actual() = MaterializedAgg.readView(spark, view)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    def refresh() = MaterializedAgg.refreshStepMinMax(
      spark, view, src, pmod(col("id"), lit(4)), col("m"), tick())
    IcebergWriter.append(spark, src, freshRows(30), None, tick(),
      formatVersion = 2)
    assert(refresh().isDefined)
    for (step <- 1 to 30) {
      rng.nextInt(5) match {
        case 0 =>
          IcebergWriter.append(spark, src,
            freshRows(1 + rng.nextInt(10)), None, tick())
        case 1 =>
          val ids = rng.shuffle(liveIds()).take(1 + rng.nextInt(6))
          if (ids.nonEmpty) IcebergWriter.upsertRows(spark, src,
            ids.map(i => (i, rng.nextInt(200).toLong)).toDF("id", "m"),
            "id", tick())
        case 2 =>
          val ids = rng.shuffle(liveIds()).take(1 + rng.nextInt(6))
          if (ids.nonEmpty) IcebergWriter.deleteEquality(spark, src,
            ids.toDF("id"), tick())
        case 3 =>
          val ups = rng.shuffle(liveIds()).take(rng.nextInt(3))
            .map(i => (i, rng.nextInt(200).toLong))
          val rows = ups.toDF("id", "m").unionByName(
            freshRows(1 + rng.nextInt(3)))
          IcebergWriter.mergeRows(spark, src, rows, "id", tick())
        case 4 =>
          refresh(): Unit
          if (rng.nextBoolean())
            assert(refresh().isEmpty, s"replay at head must no-op ($step)")
          assert(actual() === expected(),
            s"min/max view must equal the recompute after step $step")
      }
    }
    refresh(): Unit
    assert(actual() === expected(), "final state must converge")
    assert(liveIds().nonEmpty, "fixture sanity: the table never emptied")
  }

  test("randomized churn x approx-distinct refresh interleavings converge: sketch unions and delete-forced rescans stay exact in the sparse regime") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit, pmod}
    import graft.sources.{IcebergSource, IcebergWriter}
    import graft.streaming.MaterializedAgg
    // per-group cardinality stays in the sketch's exact list/set regime
    // (values = id % 12, so <= 12 per group), so the estimate must
    // EQUAL the recompute after every refresh — unions for insert-only
    // windows, authoritative keyed rescans when a window carries
    // deletes, in whatever order the seed interleaves them.
    val src = tempDir("graft-mvad-fuzz-src") + "/table"
    val view = tempDir("graft-mvad-fuzz-view") + "/table"
    val rng = new scala.util.Random(313)
    var ts = 0L
    def tick(): Long = { ts += 1000L; ts }
    var nextId = 0L
    def freshRows(n: Int) = {
      val s = (nextId until nextId + n).map(i => (i, i % 12L))
      nextId += n
      s.toDF("id", "w")
    }
    def liveIds(): Seq[Long] = IcebergSource.read(spark, src)
      .select(col("id")).as[Long].collect().sorted.toSeq
    def expected() = IcebergSource.read(spark, src)
      .groupBy(pmod(col("id"), lit(4)).as("k"))
      .agg(countDistinct(col("w")).as("nd"), count(lit(1)).as("c"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def actual() = MaterializedAgg.readView(spark, view)
      .select(col("k"), col("nd"), col("c"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def refresh() = MaterializedAgg.refreshStepApproxDistinct(
      spark, view, src, pmod(col("id"), lit(4)), col("w"), tick())
    IcebergWriter.append(spark, src, freshRows(30), None, tick(),
      formatVersion = 2)
    assert(refresh().isDefined)
    for (step <- 1 to 30) {
      rng.nextInt(5) match {
        case 0 =>
          IcebergWriter.append(spark, src,
            freshRows(1 + rng.nextInt(10)), None, tick())
        case 1 =>
          val ids = rng.shuffle(liveIds()).take(1 + rng.nextInt(6))
          if (ids.nonEmpty) IcebergWriter.upsertRows(spark, src,
            ids.map(i => (i, (i + step) % 12L)).toDF("id", "w"),
            "id", tick())
        case 2 =>
          val ids = rng.shuffle(liveIds()).take(1 + rng.nextInt(6))
          if (ids.nonEmpty) IcebergWriter.deleteEquality(spark, src,
            ids.toDF("id"), tick())
        case 3 =>
          val ups = rng.shuffle(liveIds()).take(rng.nextInt(3))
            .map(i => (i, (i * 5 + step) % 12L))
          val rows = ups.toDF("id", "w").unionByName(
            freshRows(1 + rng.nextInt(3)))
          IcebergWriter.mergeRows(spark, src, rows, "id", tick())
        case 4 =>
          refresh(): Unit
          if (rng.nextBoolean())
            assert(refresh().isEmpty, s"replay at head must no-op ($step)")
          assert(actual() === expected(),
            s"approx-distinct view must equal the recompute after step $step")
      }
    }
    refresh(): Unit
    assert(actual() === expected(), "final state must converge")
    assert(liveIds().nonEmpty, "fixture sanity: the table never emptied")
  }

  test("randomized churn x exact-distinct refresh interleavings converge: refcount algebra survives any seeded op sequence") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit, pmod}
    import graft.sources.{IcebergSource, IcebergWriter}
    import graft.streaming.MaterializedAgg
    // same composition-pinning idea as the sum/count fuzz above, aimed
    // at the subtlest algebra of the four: multiplicity refcounts,
    // where an upsert is a death AND a birth and a delete may or may
    // not change the distinct level depending on surviving copies.
    // Values repeat (id % 10), so multiplicities genuinely exercise.
    val src = tempDir("graft-mvd-fuzz-src") + "/table"
    val view = tempDir("graft-mvd-fuzz-view") + "/table"
    val rng = new scala.util.Random(91)
    var ts = 0L
    def tick(): Long = { ts += 1000L; ts }
    var nextId = 0L
    def freshRows(n: Int) = {
      val s = (nextId until nextId + n).map(i => (i, i % 10L))
      nextId += n
      s.toDF("id", "w")
    }
    def liveIds(): Seq[Long] = IcebergSource.read(spark, src)
      .select(col("id")).as[Long].collect().sorted.toSeq
    def expected() = IcebergSource.read(spark, src)
      .groupBy(pmod(col("id"), lit(4)).as("k"))
      .agg(countDistinct(col("w")).as("nd"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def actual() = MaterializedAgg.readDistinctView(spark, view)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def refresh() = MaterializedAgg.refreshStepDistinct(
      spark, view, src, pmod(col("id"), lit(4)), col("w"), tick())
    IcebergWriter.append(spark, src, freshRows(30), None, tick(),
      formatVersion = 2)
    assert(refresh().isDefined)
    for (step <- 1 to 30) {
      rng.nextInt(5) match {
        case 0 =>
          IcebergWriter.append(spark, src,
            freshRows(1 + rng.nextInt(10)), None, tick())
        case 1 =>
          // upsert REASSIGNS values (id -> a different residue class):
          // one op is a death in the old multiplicity and a birth in a
          // new one, possibly moving the distinct level either way
          val ids = rng.shuffle(liveIds()).take(1 + rng.nextInt(6))
          if (ids.nonEmpty) IcebergWriter.upsertRows(spark, src,
            ids.map(i => (i, (i + step) % 10L)).toDF("id", "w"),
            "id", tick())
        case 2 =>
          val ids = rng.shuffle(liveIds()).take(1 + rng.nextInt(6))
          if (ids.nonEmpty) IcebergWriter.deleteEquality(spark, src,
            ids.toDF("id"), tick())
        case 3 =>
          val ups = rng.shuffle(liveIds()).take(rng.nextInt(3))
            .map(i => (i, (i * 3 + step) % 10L))
          val rows = ups.toDF("id", "w").unionByName(
            freshRows(1 + rng.nextInt(3)))
          IcebergWriter.mergeRows(spark, src, rows, "id", tick())
        case 4 =>
          refresh(): Unit
          if (rng.nextBoolean())
            assert(refresh().isEmpty, s"replay at head must no-op ($step)")
          assert(actual() === expected(),
            s"distinct view must equal the recompute after step $step")
      }
    }
    refresh(): Unit
    assert(actual() === expected(), "final state must converge")
    assert(liveIds().nonEmpty, "fixture sanity: the table never emptied")
  }

  test("refreshStepMany: N views of one source batch onto one window read, commits stay per-view, stragglers catch up") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, pmod, sum}
    import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}
    import graft.streaming.MaterializedAgg
    val src = tempDir("graft-mvmany-src") + "/table"
    val dir = tempDir("graft-mvmany-views")
    val specs = (0 until 3).map(i => MaterializedAgg.ViewSpec(
      s"$dir/view_$i", pmod(col("id"), lit(3L + i)), col("id")))
    def expected(m: Long) = IcebergSource.read(spark, src)
      .groupBy(pmod(col("id"), lit(m)).as("k"))
      .agg(sum(col("id")).as("s"), count(lit(1)).as("c"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def actual(v: String) = MaterializedAgg.readView(spark, v)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    IcebergWriter.append(spark, src,
      (0L until 24L).map(i => (i, s"v$i")).toDF("id", "v"),
      None, 1000L, formatVersion = 2)
    // batch creation: every view built from one window read
    val created = MaterializedAgg.refreshStepMany(spark, src, specs, 2000L)
    assert(created.forall(_.isDefined), created)
    specs.zipWithIndex.foreach { case (v, i) =>
      assert(actual(v.viewPath) === expected(3L + i), s"view $i diverged") }
    // churn, then batch refresh: all three track the source; per-view
    // commits mean each view gains exactly one snapshot
    val snapsBefore = specs.map(v => IcebergMeta.load(v.viewPath).snapshots.length)
    IcebergWriter.upsertRows(spark, src,
      Seq((0L, "v0b"), (100L, "v100")).toDF("id", "v"), "id", 3000L)
    IcebergWriter.deleteEquality(spark, src, Seq(5L, 17L).toDF("id"), 4000L)
    val applied = MaterializedAgg.refreshStepMany(spark, src, specs, 5000L)
    assert(applied.forall(_ ===
      Some(IcebergMeta.load(src).currentSnapshot.get.id)), applied)
    specs.zipWithIndex.foreach { case (v, i) =>
      assert(actual(v.viewPath) === expected(3L + i), s"view $i diverged") }
    specs.zip(snapsBefore).foreach { case (v, n) =>
      assert(IcebergMeta.load(v.viewPath).snapshots.length === n + 1,
        "one batched refresh = one commit per view") }
    // replay: every view current -> all no-op
    assert(MaterializedAgg.refreshStepMany(spark, src, specs, 6000L)
      .forall(_.isEmpty))
    // STRAGGLER: one view misses a window (refreshed alone), then the
    // batch brings the others forward — two watermark groups, each view
    // still lands on the head and converges
    IcebergWriter.upsertRows(spark, src, Seq((7L, "v7b")).toDF("id", "v"),
      "id", 7000L)
    assert(MaterializedAgg.refreshStep(spark, specs.head.viewPath, src,
      specs.head.key, specs.head.measure, 8000L).isDefined)
    IcebergWriter.deleteEquality(spark, src, Seq(9L).toDF("id"), 9000L)
    val mixed = MaterializedAgg.refreshStepMany(spark, src, specs, 10000L)
    assert(mixed.forall(_ ===
      Some(IcebergMeta.load(src).currentSnapshot.get.id)), mixed)
    specs.zipWithIndex.foreach { case (v, i) =>
      assert(actual(v.viewPath) === expected(3L + i),
        s"straggler batch: view $i diverged") }
    // per-view key refusal: a null-keyed view poisons ONLY its own step
    IcebergWriter.upsertRows(spark, src, Seq((50L, "x")).toDF("id", "v"),
      "id", 11000L)
    val bad = specs.updated(1, MaterializedAgg.ViewSpec(
      specs(1).viewPath,
      org.apache.spark.sql.functions.when(col("id") < 1000, null)
        .otherwise(col("id")), col("id")))
    val err = intercept[IllegalArgumentException] {
      MaterializedAgg.refreshStepMany(spark, src, bad, 12000L)
    }
    assert(err.getMessage.contains("null keys"), err.getMessage)
  }

  test("exactly-once streaming min/max MV: folds, forced rescan, tombstone + resurrection, replay no-op, one commit per refresh") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, pmod, min, max, count, lit}
    import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}
    import graft.streaming.MaterializedAgg
    val src = tempDir("graft-mvmm-src") + "/table"
    val view = tempDir("graft-mvmm-view") + "/table"
    def expected() = IcebergSource.read(spark, src)
      .groupBy(pmod(col("id"), lit(4)).as("k"))
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"),
        count(lit(1)).as("c"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    def actual() = MaterializedAgg.readView(spark, view)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    def refresh(ts: Long) = MaterializedAgg.refreshStepMinMax(
      spark, view, src, pmod(col("id"), lit(4)), col("id"), ts)
    def viewSnapshots() = IcebergMeta.load(view).snapshots.length

    // window 1: creation from the full changelog
    IcebergWriter.append(spark, src,
      (0L until 12L).map(i => (i, s"v$i")).toDF("id", "v"),
      None, 1000L, formatVersion = 2)
    assert(refresh(2000L).isDefined)
    assert(actual() === expected())
    val snaps1 = viewSnapshots()

    // window 2: FORCED RESCAN — delete group 3's maximum (id 11), the
    // non-invertible case pure folding cannot answer — plus an
    // interior delete (id 5 sits strictly inside group 1's [1, 9]) and
    // a fold-path insert (id 20 extends group 0's max). One refresh,
    // one commit, exact convergence across all three paths.
    IcebergWriter.deleteEquality(spark, src, Seq(11L, 5L).toDF("id"), 3000L)
    IcebergWriter.upsertRows(spark, src, Seq((20L, "v20")).toDF("id", "v"),
      "id", 4000L)
    assert(refresh(5000L).isDefined)
    assert(actual() === expected())
    assert(actual().exists(t => t._1 == 3L && t._3 == 7L),
      "rescanned group must have its true post-delete maximum")
    assert(viewSnapshots() === snaps1 + 1,
      "one refresh must be exactly one view commit (atomic state+watermark)")

    // replay: the view is current — a structural no-op off the in-view
    // watermark, zero extra commits
    assert(refresh(6000L).isEmpty)
    assert(viewSnapshots() === snaps1 + 1)

    // kill group 2 entirely (ids 2, 6, 10) -> hidden tombstone
    IcebergWriter.deleteEquality(spark, src, Seq(2L, 6L, 10L).toDF("id"),
      7000L)
    assert(refresh(8000L).isDefined)
    assert(actual() === expected())
    assert(!actual().exists(_._1 == 2L), "dead group must vanish from the view")

    // resurrection: a re-inserted key overwrites its tombstone and
    // refolds from scratch
    IcebergWriter.upsertRows(spark, src, Seq((6L, "v6b")).toDF("id", "v"),
      "id", 9000L)
    assert(refresh(10000L).isDefined)
    assert(actual() === expected())
    assert(actual().exists(t => t._1 == 2L && t._2 == 6L && t._3 == 6L &&
      t._4 == 1L), "resurrected group must refold from exactly its new row")
    assert(MaterializedAgg.watermarkOf(spark, view, wmCol = "mn") ===
      IcebergMeta.load(src).currentSnapshot.get.id)
  }

  test("maintainedSink: one foreachBatch ingests the source AND refreshes its MV, exactly-once through every crash window") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, pmod, sum}
    import graft.sources.{IcebergMeta, IcebergSource}
    import graft.streaming.{IcebergSink, MaterializedAgg}
    val dropDir = tempDir("graft-maintained-drop")
    val checkpoint = tempDir("graft-maintained-ckpt")
    val src = tempDir("graft-maintained-src") + "/table"
    val view = tempDir("graft-maintained-view") + "/table"
    val docs = (0L until 20L).map(i => (i, i * 3L)).toDF("id", "v")
    docs.filter($"id" < 12).write.parquet(s"$dropDir/batch0")
    def stream = spark.readStream.schema(docs.schema).parquet(s"$dropDir/*/")
    var tick = 0L
    val clock = () => { tick += 1000L; tick }
    val sink = MaterializedAgg.maintainedSink(
      src,
      (s, ts) => MaterializedAgg.refreshStep(
        s, view, src, pmod(col("id"), lit(4)), col("v"), ts),
      clock = clock)
    def expected() = IcebergSource.read(spark, src)
      .groupBy(pmod(col("id"), lit(4)).as("k"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def actual() = MaterializedAgg.readView(spark, view)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

    def run(): Unit = {
      val q = stream.writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000) finally q.stop()
    }
    run()
    assert(actual() === expected(), "view must be fresh after the batch")
    assert(MaterializedAgg.watermarkOf(spark, view) ===
      IcebergMeta.load(src).currentSnapshot.get.id)

    // late files + restart: the new batch lands AND the view follows
    docs.filter($"id" >= 12).write.parquet(s"$dropDir/batch1")
    run()
    assert(IcebergSource.read(spark, src).count() === 20)
    assert(actual() === expected(), "view must track the second batch")

    // crash-replay of an already-committed batch id: BOTH halves no-op —
    // no new source snapshot, no new view snapshot
    val srcSnaps = IcebergMeta.load(src).snapshots.size
    val viewSnaps = IcebergMeta.load(view).snapshots.size
    sink(docs.limit(3), IcebergSink.lastCommittedBatch(src).get)
    assert(IcebergMeta.load(src).snapshots.size === srcSnaps,
      "replayed append must not commit")
    assert(IcebergMeta.load(view).snapshots.size === viewSnaps,
      "replayed refresh must no-op off the in-view watermark")
    assert(actual() === expected())

    // crash BETWEEN the halves: the source committed but the view did
    // not — the replayed batch id skips the append and the refresh
    // catches the view up
    IcebergSink.batchWriter(src, clock = clock)(
      Seq((100L, 7L), (101L, 9L)).toDF("id", "v"),
      IcebergSink.lastCommittedBatch(src).get + 1)
    assert(actual() !== expected(), "view is behind by construction")
    sink(Seq((100L, 7L), (101L, 9L)).toDF("id", "v"),
      IcebergSink.lastCommittedBatch(src).get)
    assert(actual() === expected(),
      "the replayed sink must skip the append and apply the refresh")
  }

  test("exactly-once streaming EXACT-distinct MV: multiplicity upserts, duplicate-copy deletes keep nd, tombstone + resurrection, replay no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, countDistinct, count, lit, pmod}
    import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}
    import graft.streaming.MaterializedAgg
    val src = tempDir("graft-mved-src") + "/table"
    val view = tempDir("graft-mved-view") + "/table"
    def expected() = IcebergSource.read(spark, src)
      .groupBy(pmod(col("id"), lit(4)).as("k"))
      .agg(countDistinct(col("v")).as("nd"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def actual() = MaterializedAgg.readDistinctView(spark, view)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def refresh(ts: Long) = MaterializedAgg.refreshStepDistinct(
      spark, view, src, pmod(col("id"), lit(4)), col("v"), ts)
    def viewSnapshots() = IcebergMeta.load(view).snapshots.length

    // window 1: creation. ids 0 and 4 duplicate v=100 inside group 0
    IcebergWriter.append(spark, src,
      (0L until 12L).map(i => (i, if (i == 4L) 100L else 100L + i))
        .toDF("id", "v"),
      None, 1000L, formatVersion = 2)
    assert(refresh(2000L).isDefined)
    assert(actual() === expected())
    assert(actual().exists(t => t._1 == 0L && t._2 == 2L && t._3 == 3L),
      "group 0 must count its duplicated value once across three rows")
    val snaps1 = viewSnapshots()

    // window 2: delete ONE copy of the duplicate (id 4) — group 0's nd
    // must NOT move while n drops — and delete id 9 (group 1 loses a
    // value outright). One refresh, one commit, no rescan machinery:
    // everything is refcount arithmetic.
    IcebergWriter.deleteEquality(spark, src, Seq(4L, 9L).toDF("id"), 3000L)
    assert(refresh(4000L).isDefined)
    assert(actual() === expected())
    assert(actual().exists(t => t._1 == 0L && t._2 == 2L && t._3 == 2L),
      "duplicate-copy delete must keep the distinct count")
    assert(viewSnapshots() === snaps1 + 1,
      "one refresh must be exactly one view commit (atomic state+watermark)")

    // replay: no-op off the in-view watermark
    assert(refresh(5000L).isEmpty)
    assert(viewSnapshots() === snaps1 + 1)

    // kill group 2 entirely (ids 2, 6, 10) -> pairs tombstone, the
    // derived view loses the group
    IcebergWriter.deleteEquality(spark, src, Seq(2L, 6L, 10L).toDF("id"),
      6000L)
    assert(refresh(7000L).isDefined)
    assert(actual() === expected())
    assert(!actual().exists(_._1 == 2L), "dead group must vanish from the view")

    // resurrection: a re-inserted key overwrites its pair tombstone
    IcebergWriter.upsertRows(spark, src, Seq((6L, 999L)).toDF("id", "v"),
      "id", 8000L)
    assert(refresh(9000L).isDefined)
    assert(actual() === expected())
    assert(actual().exists(t => t._1 == 2L && t._2 == 1L && t._3 == 1L),
      "resurrected group must refold from exactly its new row")
    assert(MaterializedAgg.watermarkOf(spark, view, wmCol = "v") ===
      IcebergMeta.load(src).currentSnapshot.get.id)
  }

  test("exactly-once streaming approx-distinct MV: union folds, delete-forced rescan, tombstone + resurrection, replay no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, countDistinct, count, lit, pmod}
    import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}
    import graft.streaming.MaterializedAgg
    val src = tempDir("graft-mvad-src") + "/table"
    val view = tempDir("graft-mvad-view") + "/table"
    // the fixture's per-group cardinality sits deep in the sketch's
    // exact list/set regime, so the estimate must EQUAL the recompute
    def expected() = IcebergSource.read(spark, src)
      .groupBy(pmod(col("id"), lit(4)).as("k"))
      .agg(countDistinct(col("v")).as("nd"), count(lit(1)).as("c"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def actual() = MaterializedAgg.readView(spark, view)
      .select(col("k"), col("nd"), col("c"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def refresh(ts: Long) = MaterializedAgg.refreshStepApproxDistinct(
      spark, view, src, pmod(col("id"), lit(4)), col("v"), ts)
    def viewSnapshots() = IcebergMeta.load(view).snapshots.length

    // window 1: creation. ids 0 and 4 share v=100 (a duplicated value
    // inside group 0), everything else distinct
    IcebergWriter.append(spark, src,
      (0L until 12L).map(i => (i, if (i == 4L) 100L else 100L + i))
        .toDF("id", "v"),
      None, 1000L, formatVersion = 2)
    assert(refresh(2000L).isDefined)
    assert(actual() === expected())
    assert(actual().exists(t => t._1 == 0L && t._2 == 2L && t._3 == 3L),
      "group 0 must count its duplicated value once across three rows")
    val snaps1 = viewSnapshots()

    // window 2: INSERT-ONLY — the pure union-fold path (one brand-new
    // value for group 1, one duplicate of group 2's existing value).
    // One refresh, one commit, estimates stay exact.
    IcebergWriter.upsertRows(spark, src,
      Seq((13L, 777L), (14L, 102L)).toDF("id", "v"), "id", 3000L)
    assert(refresh(4000L).isDefined)
    assert(actual() === expected())
    assert(viewSnapshots() === snaps1 + 1,
      "one refresh must be exactly one view commit (atomic state+watermark)")

    // replay: no-op off the in-view watermark, zero extra commits
    assert(refresh(5000L).isEmpty)
    assert(viewSnapshots() === snaps1 + 1)

    // window 3: deletes force the rescan (sketches cannot forget).
    // Delete id 4 — group 0 keeps v=100 through id 0, so its distinct
    // count must NOT move while its row count drops.
    IcebergWriter.deleteEquality(spark, src, Seq(4L).toDF("id"), 6000L)
    assert(refresh(7000L).isDefined)
    assert(actual() === expected())
    assert(actual().exists(t => t._1 == 0L && t._2 == 2L && t._3 == 2L),
      "duplicate-copy delete must drop the count but not the distinct")

    // kill group 3 entirely (ids 3, 7, 11) -> hidden tombstone
    IcebergWriter.deleteEquality(spark, src, Seq(3L, 7L, 11L).toDF("id"),
      8000L)
    assert(refresh(9000L).isDefined)
    assert(actual() === expected())
    assert(!actual().exists(_._1 == 3L), "dead group must vanish from the view")

    // resurrection: a re-inserted key overwrites its tombstone and the
    // sketch refolds from exactly its new rows
    IcebergWriter.upsertRows(spark, src, Seq((7L, 999L)).toDF("id", "v"),
      "id", 10000L)
    assert(refresh(11000L).isDefined)
    assert(actual() === expected())
    assert(actual().exists(t => t._1 == 3L && t._2 == 1L && t._3 == 1L),
      "resurrected group must refold from exactly its new row")
    assert(MaterializedAgg.watermarkOf(spark, view, wmCol = "nd") ===
      IcebergMeta.load(src).currentSnapshot.get.id)
  }

  test("randomized two-source churn x join-view refresh interleavings converge: backfills, inner-join deaths and dual cursors under any seeded sequence") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.{IcebergSource, IcebergWriter}
    import graft.streaming.MaterializedAgg
    // the two-cursor flavor's fuzz: FACT and DIM churn interleave
    // freely (facts pointing at not-yet-existent dims, dim inserts
    // backfilling them later, dim deletes killing matched facts through
    // inner-join semantics), refreshes and replays land at random
    // points, and after every refresh the view equals the join
    // recomputed from scratch. jk domain (0..11) is deliberately wider
    // than the dims that exist, so unmatched facts are always present.
    val factP = tempDir("graft-mvj-fuzz-fact") + "/table"
    val dimP = tempDir("graft-mvj-fuzz-dim") + "/table"
    val view = tempDir("graft-mvj-fuzz-view") + "/table"
    val rng = new scala.util.Random(777)
    var ts = 0L
    def tick(): Long = { ts += 1000L; ts }
    var nextId = 0L
    def freshFacts(n: Int) = {
      val s = (nextId until nextId + n)
        .map(i => (i, rng.nextInt(12).toLong, i * 10L))
      nextId += n
      s.toDF("id", "jk", "fv")
    }
    def liveFactIds(): Seq[Long] = IcebergSource.read(spark, factP)
      .select(col("id")).as[Long].collect().sorted.toSeq
    def liveDimKeys(): Seq[Long] = IcebergSource.read(spark, dimP)
      .select(col("jk")).as[Long].collect().sorted.toSeq
    def expected() = IcebergSource.read(spark, factP).as("f")
      .join(IcebergSource.read(spark, dimP).as("d"),
        col("f.jk") === col("d.jk"), "inner")
      .select(col("id").as("k"), col("f.jk"), col("fv"), col("d.dv"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    def actual() = MaterializedAgg.readView(spark, view)
      .select(col("k"), col("jk"), col("fv"), col("dv"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    def refresh() = MaterializedAgg.refreshStepJoin(
      spark, view, factP, dimP,
      factKey = col("id"), factJoinKey = col("jk"), factVal = col("fv"),
      dimJoinKey = col("jk"), dimVal = col("dv"), tick())
    IcebergWriter.append(spark, factP, freshFacts(20), None, tick(),
      formatVersion = 2)
    IcebergWriter.append(spark, dimP,
      (0L until 6L).map(j => (j, j + 100L)).toDF("jk", "dv"),
      None, tick(), formatVersion = 2)
    assert(refresh().isDefined)
    assert(actual() === expected())
    for (step <- 1 to 30) {
      rng.nextInt(6) match {
        case 0 =>
          IcebergWriter.append(spark, factP,
            freshFacts(1 + rng.nextInt(8)), None, tick())
        case 1 =>
          // move facts between dims (possibly to a nonexistent one)
          val ids = rng.shuffle(liveFactIds()).take(1 + rng.nextInt(5))
          if (ids.nonEmpty) IcebergWriter.upsertRows(spark, factP,
            ids.map(i => (i, rng.nextInt(12).toLong, i * 10L + step))
              .toDF("id", "jk", "fv"), "id", tick())
        case 2 =>
          val ids = rng.shuffle(liveFactIds()).take(1 + rng.nextInt(5))
          if (ids.nonEmpty) IcebergWriter.deleteEquality(spark, factP,
            ids.toDF("id"), tick())
        case 3 =>
          // dim upsert-or-insert: relabels rewrite matched facts,
          // inserts backfill previously-unmatched ones
          val keys = (1 to 1 + rng.nextInt(3))
            .map(_ => rng.nextInt(12).toLong).distinct
          IcebergWriter.upsertRows(spark, dimP,
            keys.map(j => (j, j + 100L + step)).toDF("jk", "dv"),
            "jk", tick())
        case 4 =>
          val keys = rng.shuffle(liveDimKeys()).take(1 + rng.nextInt(2))
          if (keys.nonEmpty) IcebergWriter.deleteEquality(spark, dimP,
            keys.toDF("jk"), tick())
        case 5 =>
          refresh(): Unit
          if (rng.nextBoolean())
            assert(refresh().isEmpty, s"replay at heads must no-op ($step)")
          assert(actual() === expected(),
            s"join view must equal the recompute after step $step")
      }
    }
    refresh(): Unit
    assert(actual() === expected(), "final state must converge")
    assert(liveFactIds().nonEmpty && liveDimKeys().nonEmpty,
      "fixture sanity: neither side ever emptied")
  }

  test("exactly-once streaming JOIN view: two-source churn, backfill, inner-join death, two-cursor replay no-op, one commit") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}
    import graft.streaming.MaterializedAgg
    val factP = tempDir("graft-mvj-fact") + "/table"
    val dimP = tempDir("graft-mvj-dim") + "/table"
    val view = tempDir("graft-mvj-view") + "/table"
    def expected() = IcebergSource.read(spark, factP).as("f")
      .join(IcebergSource.read(spark, dimP).as("d"),
        col("f.jk") === col("d.jk"), "inner")
      .select(col("id").as("k"), col("f.jk"), col("fv"), col("d.dv"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    def actual() = MaterializedAgg.readView(spark, view)
      .select(col("k"), col("jk"), col("fv"), col("dv"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    def refresh(ts: Long) = MaterializedAgg.refreshStepJoin(
      spark, view, factP, dimP,
      factKey = col("id"), factJoinKey = col("jk"), factVal = col("fv"),
      dimJoinKey = col("jk"), dimVal = col("dv"), ts)
    def viewSnapshots() = IcebergMeta.load(view).snapshots.length

    // window 1: creation. id 6 points at dim 9, which does not exist yet
    // — it must NOT appear (inner join), but it is the backfill seed.
    IcebergWriter.append(spark, factP,
      Seq((1L, 0L, 10L), (2L, 0L, 20L), (3L, 1L, 30L), (4L, 1L, 40L),
        (5L, 2L, 50L), (6L, 9L, 60L)).toDF("id", "jk", "fv"),
      None, 1000L, formatVersion = 2)
    IcebergWriter.append(spark, dimP,
      Seq((0L, 100L), (1L, 101L), (2L, 102L)).toDF("jk", "dv"),
      None, 1100L, formatVersion = 2)
    assert(refresh(2000L).isDefined)
    assert(actual() === expected())
    assert(!actual().exists(_._1 == 6L), "unmatched fact must not join")
    val snaps1 = viewSnapshots()

    // window 2, BOTH sides churn at once: fact moves id 1 between dims
    // (0 -> 2), deletes id 5, inserts id 7; dim relabels 0, INSERTS 9
    // (id 6 backfills — it exists nowhere in the old view), deletes 1
    // (ids 3 and 4 die through inner-join semantics, no fact deletes)
    IcebergWriter.upsertRows(spark, factP,
      Seq((1L, 2L, 10L), (7L, 0L, 70L)).toDF("id", "jk", "fv"), "id", 3000L)
    IcebergWriter.deleteEquality(spark, factP, Seq(5L).toDF("id"), 3100L)
    IcebergWriter.upsertRows(spark, dimP,
      Seq((0L, 200L), (9L, 109L)).toDF("jk", "dv"), "jk", 3200L)
    IcebergWriter.deleteEquality(spark, dimP, Seq(1L).toDF("jk"), 3300L)
    assert(refresh(4000L).isDefined)
    assert(actual() === expected())
    assert(actual().exists(t => t._1 == 6L && t._2 == 9L && t._4 == 109L),
      "dim insert must backfill the pre-existing unmatched fact")
    assert(actual().exists(t => t._1 == 1L && t._2 == 2L && t._4 == 102L),
      "moved fact must rejoin under its new dim")
    assert(!actual().exists(t => t._1 == 3L || t._1 == 4L || t._1 == 5L),
      "dim death and fact delete must kill their view rows")
    assert(viewSnapshots() === snaps1 + 1,
      "one refresh must be exactly one view commit (atomic state + both cursors)")

    // replay: BOTH cursors current -> structural no-op
    assert(refresh(5000L).isEmpty)
    assert(viewSnapshots() === snaps1 + 1)

    // one-sided churn: only the fact moves; the dim cursor rides along
    IcebergWriter.upsertRows(spark, factP,
      Seq((2L, 0L, 21L)).toDF("id", "jk", "fv"), "id", 6000L)
    assert(refresh(7000L).isDefined)
    assert(actual() === expected())

    // resurrection: a re-inserted fact pk overwrites its tombstone
    IcebergWriter.upsertRows(spark, factP,
      Seq((5L, 2L, 51L)).toDF("id", "jk", "fv"), "id", 8000L)
    assert(refresh(9000L).isDefined)
    assert(actual() === expected())
    assert(actual().exists(t => t._1 == 5L && t._4 == 102L))

    // the watermark row carries BOTH applied cursors
    val wm = IcebergSource.read(spark, view)
      .filter(col("k") === MaterializedAgg.WatermarkKey)
      .select(col("jk"), col("fv")).collect()
    assert(wm.length === 1)
    assert(wm.head.getLong(0) === IcebergMeta.load(factP).currentSnapshot.get.id)
    assert(wm.head.getLong(1) === IcebergMeta.load(dimP).currentSnapshot.get.id)
  }

  test("join view on a bucketed fact: the step's keyed reads prune to touched buckets/ranges and still converge") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}
    import graft.streaming.MaterializedAgg
    val factP = tempDir("graft-mvjb-fact") + "/table"
    val dimP = tempDir("graft-mvjb-dim") + "/table"
    val view = tempDir("graft-mvjb-view") + "/table"
    // the 100 TB deployment layout: fact bucket[8](jk)-partitioned with
    // id-contiguous appends (tight per-file id bounds), dim bucketed on
    // its pk — the layouts keyedFilters turns into pruned keyed reads
    val factSpec = Seq(IcebergWriter.PartitionTransform("jk", "bucket[8]"))
    val dimSpec = Seq(IcebergWriter.PartitionTransform("jk", "bucket[4]"))
    def factBatch(lo: Long, hi: Long) = (lo until hi)
      .map(i => (i, i % 16L, i * 10L)).toDF("id", "jk", "fv")
    IcebergWriter.appendPartitioned(spark, factP, factBatch(0, 400),
      factSpec, 1000L, 2, Map.empty)
    IcebergWriter.appendPartitioned(spark, dimP,
      (0L until 16L).map(j => (j, j + 100L)).toDF("jk", "dv"),
      dimSpec, 1100L, 2, Map.empty)
    def refresh(ts: Long) = MaterializedAgg.refreshStepJoin(
      spark, view, factP, dimP,
      factKey = col("id"), factJoinKey = col("jk"), factVal = col("fv"),
      dimJoinKey = col("jk"), dimVal = col("dv"), ts)
    def expected() = IcebergSource.read(spark, factP).as("f")
      .join(IcebergSource.read(spark, dimP).as("d"),
        col("f.jk") === col("d.jk"), "inner")
      .select(col("id").as("k"), col("f.jk"), col("fv"), col("d.dv"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    def actual() = MaterializedAgg.readView(spark, view)
      .select(col("k"), col("jk"), col("fv"), col("dv"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(refresh(2000L).isDefined)
    assert(actual() === expected())

    // churn window: a recent id-range append + one dim relabel
    IcebergWriter.appendPartitioned(spark, factP, factBatch(400, 420),
      factSpec, 3000L, 2, Map.empty)
    IcebergWriter.upsertRows(spark, dimP,
      Seq((3L, 203L)).toDF("jk", "dv"), "jk", 3100L)
    assert(refresh(4000L).isDefined)
    assert(actual() === expected())
    assert(actual().count(_._4 == 203L) > 0, "relabel must reach the view")

    // pruning evidence, via the same derivations the step makes:
    // (a) churned pks [400, 420) range-skip the initial append's files
    val full = IcebergSource.planScan(factP)
    val (pkP, pkB) = IcebergSource.keyedFilters(
      factP, col("id"), (400L until 420L).toDF("id"), "id")
    val pkPlan = IcebergSource.planScan(factP, prune = pkP, fileFilter = pkB)
    assert(pkPlan.files.size < full.files.size,
      s"pk read planned ${pkPlan.files.size} of ${full.files.size} files")
    // (b) the single churned dim key bucket-prunes the fact's jk layout
    val (jkP, jkB) = IcebergSource.keyedFilters(
      factP, col("jk"), Seq(3L).toDF("jk"), "jk")
    assert(jkP.exists(_.isInstanceOf[IcebergMeta.PartitionIn]))
    val jkPlan = IcebergSource.planScan(factP, prune = jkP, fileFilter = jkB)
    assert(jkPlan.files.size < full.files.size,
      s"dim-churn read planned ${jkPlan.files.size} of ${full.files.size}")
  }

  test("streaming MV under maintenance: refreshes accrete equality deletes, maintain folds them, reads identical, refresh continues") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, pmod, lit, sum, count}
    import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter, IcebergMaintenance}
    import graft.streaming.MaterializedAgg
    val src = tempDir("graft-mv-maint-src") + "/table"
    val view = tempDir("graft-mv-maint-view") + "/table"
    def refresh(ts: Long) = MaterializedAgg.refreshStep(
      spark, view, src, pmod(col("id"), lit(4)), col("id"), ts)
    def expected() = IcebergSource.read(spark, src)
      .groupBy(pmod(col("id"), lit(4)).as("k"))
      .agg(sum(col("id")).as("s"), count(lit(1)).as("c"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def actual() = MaterializedAgg.readView(spark, view)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def deleteFiles(): Int = {
      val m = IcebergMeta.load(view)
      IcebergMeta.planScan(m, m.currentSnapshot.get).deletes.size
    }
    IcebergWriter.append(spark, src,
      (0L until 12L).map(i => (i, s"v$i")).toDF("id", "v"),
      None, 1000L, formatVersion = 2)
    assert(refresh(2000L).isDefined) // creation: an append, no deletes
    // six more refresh windows: each equality-upsert commit adds one
    // delete file to the view — the write-side trade the step documents
    (1 to 6).foreach { i =>
      IcebergWriter.upsertRows(spark, src,
        Seq((i.toLong, s"u$i"), (100L + i, s"n$i")).toDF("id", "v"),
        "id", 2000L + i * 1000L)
      assert(refresh(2500L + i * 1000L).isDefined)
    }
    assert(actual() === expected())
    assert(deleteFiles() >= 6, s"expected an accreted delete stack, got ${deleteFiles()}")

    // the documented maintenance: delete-pressure compaction folds the
    // stack; reads identical; the watermark row survives the rewrite
    val before = actual()
    val wmBefore = MaterializedAgg.watermarkOf(spark, view)
    val report = IcebergMaintenance.maintain(spark, view, 99000L,
      maxDeleteFiles = 4)
    assert(report.compacted.isDefined, "delete pressure must trigger compaction")
    assert(deleteFiles() === 0, "compaction must retire the delete stack")
    assert(actual() === before)
    assert(MaterializedAgg.watermarkOf(spark, view) === wmBefore)

    // the refresh loop continues across the compaction commit
    IcebergWriter.upsertRows(spark, src, Seq((200L, "z")).toDF("id", "v"),
      "id", 100000L)
    assert(refresh(101000L).isDefined)
    assert(actual() === expected())
  }

  test("CDC replication: a feed-driven mirror converges to the source across deletes and a crash replay") {
    import spark.implicits._
    import graft.sources.{IcebergSource, IcebergWriter}
    val src = tempDir("graft-cdcrepl-src")
    val mirror = tempDir("graft-cdcrepl-mirror") + "/table"
    val state = tempDir("graft-cdcrepl-state") + "/cursor"
    var clock = 10000L
    def ts(): Long = { clock += 1; clock }

    // the consumer: deletes -> equality delete, inserts -> upsert. Both
    // are LOGICALLY idempotent (re-deleting a dead key and re-upserting
    // the same row reproduce the same state), so a re-delivered window
    // converges — the at-least-once-to-exactly-once contract without
    // any bookkeeping beyond the feed's own cursor.
    val apply: (org.apache.spark.sql.DataFrame, Long) => Unit = (changes, _) => {
      val del = changes.filter($"_change_type" === "delete").select($"id")
      if (!del.isEmpty) IcebergWriter.deleteEquality(spark, mirror, del, ts())
      val ins = changes.filter($"_change_type" === "insert")
        .select($"id", $"v")
      if (!ins.isEmpty) {
        if (!graft.sources.IcebergMeta.hasMetadata(mirror))
          IcebergWriter.append(spark, mirror, ins, None, ts(), formatVersion = 2)
        else IcebergWriter.upsertRows(spark, mirror, ins, "id", ts()): Unit
      }
    }
    def srcRows() = IcebergSource.read(spark, src)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    def mirrorRows() = IcebergSource.read(spark, mirror)
      .as[(Long, String)].collect().sortBy(_._1).toSeq

    // window 1: initial corpus
    IcebergWriter.append(spark, src,
      (0 until 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      None, 1000L, formatVersion = 2)
    IcebergChangeFeed.drain(spark, src, state)(apply)
    assert(mirrorRows() === srcRows())

    // window 2: updates (delete+insert pairs via MERGE), pure deletes,
    // and fresh inserts — all through one poll
    IcebergWriter.mergeRows(spark, src,
      Seq((3L, "v3-updated"), (20L, "v20")).toDF("id", "v"), "id", 2000L)
    IcebergWriter.deleteEquality(spark, src, Seq(7L).toDF("id"), 3000L)
    IcebergChangeFeed.drain(spark, src, state)(apply)
    assert(mirrorRows() === srcRows())
    assert(mirrorRows().exists(r => r._1 == 3L && r._2 == "v3-updated"))
    assert(!mirrorRows().exists(_._1 == 7L))

    // crash replay: apply the window but crash BEFORE the cursor write,
    // then re-poll — the window re-applies and the mirror still matches
    IcebergWriter.mergeRows(spark, src,
      Seq((4L, "v4-updated")).toDF("id", "v"), "id", 4000L)
    intercept[RuntimeException] {
      IcebergChangeFeed.poll(spark, src, state) { (changes, toId) =>
        apply(changes, toId)
        throw new RuntimeException("crash after effect, before cursor")
      }
    }
    IcebergChangeFeed.drain(spark, src, state)(apply)
    assert(mirrorRows() === srcRows())
  }

  test("change feed: windows deliver once, crashes re-deliver, publishes surface on poll") {
    import spark.implicits._
    import graft.sources.IcebergWriter
    val root = tempDir("graft-feed-table")
    val state = tempDir("graft-feed-state") + "/cursor"

    IcebergWriter.append(spark, root,
      (0 until 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      None, 1000L, formatVersion = 2) // s1

    // first poll: the full history as one window
    val batches = scala.collection.mutable.Buffer.empty[(Long, Seq[(Long, String)])]
    val consume: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, toId) =>
      batches += toId -> df.select($"id", $"_change_type")
        .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(IcebergChangeFeed.poll(spark, root, state)(consume) === Some(1L))
    assert(batches.map(_._1) === Seq(1L))
    assert(batches.head._2.map(_._1) === (0L until 10L))

    // nothing new: fn is not called
    assert(IcebergChangeFeed.poll(spark, root, state)(consume) === None)
    assert(batches.size === 1)

    // two commits -> ONE window carrying both, deletes included
    IcebergWriter.append(spark, root,
      Seq((10L, "v10")).toDF("id", "v"), None, 2000L) // s2
    IcebergWriter.deleteEquality(spark, root, Seq(4L).toDF("id"), 3000L) // s3
    assert(IcebergChangeFeed.poll(spark, root, state)(consume) === Some(3L))
    assert(batches.last._2 === Seq((4L, "delete"), (10L, "insert")))

    // crash INSIDE the consumer: cursor does not advance, the window
    // re-delivers identically on the next poll
    IcebergWriter.append(spark, root,
      Seq((11L, "v11")).toDF("id", "v"), None, 4000L) // s4
    intercept[RuntimeException] {
      IcebergChangeFeed.poll(spark, root, state)((_, _) =>
        throw new RuntimeException("consumer crash"))
    }
    assert(IcebergChangeFeed.cursor(state) === Some(3L))
    assert(IcebergChangeFeed.poll(spark, root, state)(consume) === Some(4L))
    assert(batches.last._2 === Seq((11L, "insert")))

    // audit-branch commits are INVISIBLE to the feed until published,
    // then surface as the publish window
    IcebergWriter.createBranch(root, "audit", 4500L)
    IcebergWriter.appendToBranch(spark, root,
      Seq((20L, "a20")).toDF("id", "v"), "audit", 5000L) // s5, branch-only
    assert(IcebergChangeFeed.poll(spark, root, state)(consume) === None)
    IcebergWriter.fastForward(root, "audit", 6000L)
    assert(IcebergChangeFeed.poll(spark, root, state)(consume) === Some(5L))
    assert(batches.last._2 === Seq((20L, "insert")))

    // drain processes each pending window exactly once overall
    IcebergWriter.append(spark, root, Seq((30L, "v30")).toDF("id", "v"),
      None, 7000L)
    assert(IcebergChangeFeed.drain(spark, root, state)(consume) === 1)
    assert(IcebergChangeFeed.drain(spark, root, state)(consume) === 0)

    // seek pins the cursor; reset forgets it (next poll = full history)
    IcebergChangeFeed.seek(state, 4L)
    assert(IcebergChangeFeed.cursor(state) === Some(4L))
    IcebergChangeFeed.reset(state)
    assert(IcebergChangeFeed.cursor(state) === None)
  }
}
