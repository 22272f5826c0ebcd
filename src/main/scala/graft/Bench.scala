package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.engine.GraftSession
import graft.queries.Registry

/** Accumulates executor task metrics so the bench can report per-query
  * shuffle and spill volume — the numbers that actually predict 100 TB
  * behavior — alongside wall time.
  */
private class MetricsListener extends SparkListener {
  val shuffleRead = new AtomicLong(0)
  val shuffleWrite = new AtomicLong(0)
  val spill = new AtomicLong(0)

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
    }
  }

  def snapshot: (Long, Long, Long) =
    (shuffleRead.get, shuffleWrite.get, spill.get)
}

/** Benchmark main: times the headline (`bench = true`) queries on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * Measurement: each query is fully evaluated through a noop-format write —
  * unlike `count()`, which lets Catalyst prune the whole projection away,
  * the noop sink forces every output column to be computed while writing
  * nothing, so the number is the query, not a parquet row-count.
  * Failures are reported as failures (a `failed` list + excluded from the
  * total), never as elapsed-time credit.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val session = GraftSession.local(cores = cpus, appName = "graft-bench")
    val spark = session.spark

    val headline = Registry.all.filter(_.bench)
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)

    def run(q: graft.queries.Q): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try {
          q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
            false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    // Cold pass (JVM/codegen/page-cache warmup), then the timed pass —
    // steady-state throughput is the number that scales to a long-running
    // cluster; the cold total is reported alongside for transparency.
    val cold = headline.map(q => (q.name, run(q)))
    // drain cold-pass stragglers so they don't attribute to the first
    // timed query's metric delta
    org.apache.spark.GraftSparkInternals
      .waitListenerBusEmpty(spark.sparkContext, 10000)
    val results = headline.map { q =>
      val before = listener.snapshot
      val (secs, ok) = run(q)
      // listener events arrive async; give the bus a beat to drain
      org.apache.spark.GraftSparkInternals
        .waitListenerBusEmpty(spark.sparkContext, 10000)
      val after = listener.snapshot
      (q.name, secs, ok,
        (after._1 - before._1) / 1048576.0,
        (after._3 - before._3) / 1048576.0)
    }

    val qs = results
      .map { case (k, v, ok, _, _) => s""""$k":${if (ok) v else -1}""" }
      .mkString("{", ",", "}")
    val shuffle = results
      .map { case (k, _, _, sh, _) => f""""$k":$sh%.2f""" }
      .mkString("{", ",", "}")
    val spills = results
      .map { case (k, _, _, _, sp) => f""""$k":$sp%.2f""" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false, _, _) => s""""$k"""" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true, _, _) => v }.sum
    val coldTotal = cold.collect { case (_, (v, true)) => v }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"cold_total":$coldTotal,"shuffle_read_mb":$shuffle,"spill_mb":$spills,"sf":"$sfDir"}"""
    )
    spark.stop()
  }
}
