package graft

import graft.engine.GraftSession
import graft.queries.Registry

/** Dev measurement tool (guide §1): split each bench query's wall time
  * into (a) DataFrame construction + logical/physical planning and
  * (b) execution through the noop sink, so optimization effort lands on
  * the real cost. Also reports executed-plan leaf scan task counts via
  * the final stage metrics where cheap to get. Run:
  *   runMain graft.PlanCostProbe [sfDir] [reps]
  * Not part of the driver contract; prints human-readable lines only.
  */
object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-plan-cost").spark

    val headline = Registry.all.filter(_.bench)
    // cold pass: JIT + codegen + page cache, untimed
    headline.foreach { q =>
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[cold] ${q.name} FAILED: $e") }
      finally graft.engine.PersistScope.releaseAll()
    }
    println(f"${"query"}%-24s ${"plan_ms"}%8s ${"exec_ms"}%8s (medians of $reps)")
    headline.foreach { q =>
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df =
          try q.fn(spark, sfDir)
          finally ()
        // force full planning: analyzed -> optimized -> executed plan
        df.queryExecution.executedPlan
        val t1 = System.nanoTime()
        try df.write.format("noop").mode("overwrite").save()
        finally graft.engine.PersistScope.releaseAll()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e6, (t2 - t1) / 1e6)
      }
      val planMed = samples.map(_._1).sorted.apply(reps / 2)
      val execMed = samples.map(_._2).sorted.apply(reps / 2)
      println(f"${q.name}%-24s $planMed%8.1f $execMed%8.1f")
    }
    spark.stop()
  }
}
