package graft

import graft.engine.GraftSession
import graft.queries.Registry

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
    val results = headline.map { q =>
      val (secs, ok) = run(q)
      (q.name, secs, ok)
    }

    val qs = results
      .map { case (k, v, ok) => s""""$k":${if (ok) v else -1}""" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s""""$k"""" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val coldTotal = cold.collect { case (_, (v, true)) => v }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"cold_total":$coldTotal,"sf":"$sfDir"}"""
    )
    spark.stop()
  }
}
