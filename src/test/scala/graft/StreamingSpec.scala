package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

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

    val q = EventsStream.startRefresh(spark, eventsDir, "events_live", checkpoint)
    try q.awaitTermination(120000)
    finally q.stop()

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
}
