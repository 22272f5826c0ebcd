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
        } finally {
          // release any persist() pins the query plan registered, so one
          // query's cache never skews the next one's memory or metrics
          graft.engine.PersistScope.releaseAll()
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    // CPU canary: a fixed JVM integer workload, single-thread and
    // all-cores, reported as million-iters/sec. Makes host speed part of
    // the artifact: a future bench that drifts while its canary matches
    // is a real regression; one whose canary drops proportionally caught
    // a slow host (the r11->r12 adjudication, automated). JIT-warmed by
    // an untimed pass; ~1.5 s total cost.
    def burn(iters: Long): Long = {
      var x = 0L; var i = 0L
      while (i < iters) { x += (i * i) & 1023L; i += 1 }
      x
    }
    def canary(): (Double, Double) = {
      burn(20000000L) // JIT warmup, untimed
      val t0 = System.nanoTime()
      burn(200000000L)
      // iters / ns * 1000 = million iters per second
      val single = 200000000.0 / (System.nanoTime() - t0) * 1000.0
      val threads = Runtime.getRuntime.availableProcessors()
      val t1 = System.nanoTime()
      val pool = (1 to threads).map(_ => new Thread(() => { burn(100000000L): Unit }))
      pool.foreach(_.start()); pool.foreach(_.join())
      val perCore = 100000000.0 / (System.nanoTime() - t1) * 1000.0
      (single, perCore)
    }
    val (canarySingle, canaryPerCore) = canary()

    // 1-minute loadavg — recorded before/after every rep so a contention
    // spike (round-6's q1_agg 8.46 s max against a 1.38 s min, same
    // shuffle bytes) is adjudicable from the artifact alone instead of
    // argued from vibes. -1.0 when /proc is unreadable.
    def loadavg(): Double =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.mkString.split(" ")(0).toDouble
        finally src.close()
      } catch { case _: Throwable => -1.0 }

    // driver-JVM GC time: the third attribution axis next to shuffle
    // bytes and loadavg. A rep-time rise at IDENTICAL shuffle bytes and
    // quiet load (the r12 q_federated_join 0.558→0.617→0.667 shape) is
    // either GC debt accumulated from earlier queries or something in
    // the plan — this makes the two distinguishable from the artifact
    // alone instead of argued about across rounds.
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }

    /** One timed, metric-, load- and GC-attributed execution. */
    def timedRun(q: graft.queries.Q): (Double, Boolean, Double, Double, Double, Double, Long) = {
      val before = listener.snapshot
      val load0 = loadavg()
      val gc0 = gcMillis()
      val (secs, ok) = run(q)
      val load1 = loadavg()
      // listener events arrive async; give the bus a beat to drain
      org.apache.spark.GraftSparkInternals
        .waitListenerBusEmpty(spark.sparkContext, 10000)
      val after = listener.snapshot
      (secs, ok,
        (after._1 - before._1) / 1048576.0,
        (after._3 - before._3) / 1048576.0,
        load0, load1, gcMillis() - gc0)
    }

    // Cold pass (JVM/codegen/page-cache warmup), then THREE timed passes
    // per query reported as the MEDIAN (min/max kept for transparency):
    // a single capture on a shared box can spike 10x on GC/CPU contention
    // with identical shuffle metrics — the median is the number that
    // reflects the plan rather than the neighbor's workload.
    val cold = headline.map(q => (q.name, run(q)))
    // drain cold-pass stragglers so they don't attribute to the first
    // timed query's metric delta
    org.apache.spark.GraftSparkInternals
      .waitListenerBusEmpty(spark.sparkContext, 10000)
    val reps = 3
    case class QStat(name: String, median: Double, min: Double, max: Double,
        ok: Boolean, shuffleMb: Double, spillMb: Double,
        repTimes: Seq[Double], repLoads: Seq[(Double, Double)],
        repGcMs: Seq[Long])
    val results = headline.map { q =>
      val runs = (1 to reps).map(_ => timedRun(q))
      val times = runs.map(_._1).sorted
      val median = times(times.size / 2)
      // metrics come from the median-time run (same plan every rep; the
      // shuffle numbers are bit-identical across reps in practice)
      val medRun = runs.minBy(r => math.abs(r._1 - median))
      QStat(q.name, median, times.head, times.last,
        runs.forall(_._2), medRun._3, medRun._4,
        runs.map(_._1), runs.map(r => (r._5, r._6)), runs.map(_._7))
    }

    def obj(f: QStat => String): String =
      results.map(r => s""""${r.name}":${f(r)}""").mkString("{", ",", "}")
    val qs = obj(r => if (r.ok) r.median.toString else "-1")
    val qmin = obj(r => f"${r.min}%.3f")
    val qmax = obj(r => f"${r.max}%.3f")
    val shuffle = obj(r => f"${r.shuffleMb}%.2f")
    val spills = obj(r => f"${r.spillMb}%.2f")
    // per-rep wall times and [before, after] 1-min loadavg per rep, in
    // run order: the spike-vs-load correlation IS the contention evidence
    val qreps = obj(r => r.repTimes.map(t => f"$t%.3f").mkString("[", ",", "]"))
    val qload = obj(r =>
      r.repLoads.map { case (a, b) => f"[$a%.2f,$b%.2f]" }.mkString("[", ",", "]"))
    // per-rep driver-JVM GC millis, run order — pairs with queries_reps
    val qgc = obj(r => r.repGcMs.mkString("[", ",", "]"))
    val failed = results.collect { case r if !r.ok => s""""${r.name}"""" }
      .mkString("[", ",", "]")
    val total = results.collect { case r if r.ok => r.median }.sum
    val coldTotal = cold.collect { case (_, (v, true)) => v }.sum
    // the JSON line is the ONLY stdout output (Spark logs route to stderr
    // via log4j2.properties) and is flushed before shutdown logging, so
    // the driver's parser finds it first
    val json =
      f"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_min":$qmin,"queries_max":$qmax,"queries_reps":$qreps,"queries_load":$qload,"queries_gc_ms":$qgc,"reps":$reps,"failed":$failed,"cold_total":$coldTotal,"shuffle_read_mb":$shuffle,"spill_mb":$spills,"canary_single_mips":$canarySingle%.1f,"canary_percore_mips":$canaryPerCore%.1f,"sf":"$sfDir"}"""
    println(json)
    System.out.flush()
    // ALSO write the line to a file: the two previous rounds' BENCH
    // artifacts captured a truncated stdout tail and lost three queries'
    // numbers — the file copy (SPARK_GRAFT_BENCH_OUT, default
    // bench_out.json in the working dir) keeps the artifact self-contained
    // even when the harness clips the console. bench_out.json at the repo
    // root is a TRACKED round artifact (committed each round alongside
    // BENCH_r*.json), not working-tree litter — point SPARK_GRAFT_BENCH_OUT
    // elsewhere for ad-hoc runs that shouldn't touch it.
    try
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")),
        json + "\n")
    catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not write bench_out.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
