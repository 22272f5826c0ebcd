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
    if (args.contains("sig")) { sigAb(spark); spark.stop(); return }
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

  /** A/B the signature computation paths on pre-hashed arrays (dev tool:
    * isolates the signature arithmetic from tokenize/shingle/hash cost).
    */
  private def sigAb(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    def time[A](l: String)(b: => A): A = {
      val t0 = System.nanoTime(); val r = b
      println(f"[probe] $l%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val n = 50000L
    val hs = spark
      .range(n)
      .select(
        col("id").as("doc_id"),
        transform(sequence(lit(0), lit(47)), i => xxhash64(col("id"), i)).as("hs")
      )
      .cache()
    hs.count()
    def run(l: String)(df: org.apache.spark.sql.DataFrame): Unit =
      time(l) { df.write.format("noop").mode("overwrite").save() }
    (1 to 3).foreach { rep =>
      run(s"native_array_$rep")(
        hs.select(col("doc_id"), TextOps.minhashSignatureArray(col("hs")).as("sig")))
      run(s"composed_64cols_$rep")(
        hs.select(col("doc_id") +: (0 until 64).map(j =>
          array_min(transform(col("hs"), h => xxhash64(lit(j), h))).as(s"mh$j")): _*))
    }
    hs.unpersist()

    // full pipeline from raw text (the ScaleProbe shape): does fusing the
    // tokenize/shingle/hash stages into the same projection change the story?
    val vocab = array((0 until 64).map(i => lit(s"w$i")): _*)
    val docs = spark
      .range(n)
      .select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(49)),
          i => element_at(vocab, pmod(hash(col("id"), i), lit(64)) + 1))).as("text")
      )
      .cache()
    docs.count()
    def hsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), TextOps.shingles(TextOps.tokens(col("text"))).as("sh"))
      .select(col("doc_id"), graft.operators.TextOps.shingleHashes(col("sh")).as("hs"))
    (1 to 3).foreach { rep =>
      run(s"pipe_native_$rep")(
        hsOf(docs).select(col("doc_id"), TextOps.minhashSignatureArray(col("hs")).as("sig")))
      run(s"pipe_composed_$rep")(
        hsOf(docs).select(col("doc_id") +: (0 until 64).map(j =>
          array_min(transform(col("hs"), h => xxhash64(lit(j), h))).as(s"mh$j")): _*))
    }
    docs.unpersist()
  }
}
