package graft

import graft.engine.GraftSession

/** Scratch profiler for q_dedup_minhash (dev tool): one full cold run. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = 32, appName = "minhash-probe").spark
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](l: String)(b: => A): A = {
      val t0 = System.nanoTime(); val r = b
      println(f"[probe] $l%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val q = graft.queries.Registry.byName("q_dedup_minhash")
    // warmup then two timed full runs (per-run caches released like Bench)
    time("warmup") { q.fn(spark, dir).write.format("noop").mode("overwrite").save() }
    graft.engine.PersistScope.releaseAll()
    (1 to 2).foreach { i =>
      time(s"full run $i") { q.fn(spark, dir).write.format("noop").mode("overwrite").save() }
      graft.engine.PersistScope.releaseAll()
    }
    spark.stop()
  }
}
