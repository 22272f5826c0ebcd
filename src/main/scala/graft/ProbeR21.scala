package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{GraftSession, PersistScope}
import graft.operators.MinHashIndex

/** r21 scratch probe (dev tool): stage-level timing for the dedup pin
  * variants, same binary, same session, interleaved. Not part of any
  * driver contract.
  */
object ProbeR21 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = 32, appName = "probe-r21").spark
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (args.contains("rules")) { rulesProbe(spark, dir); spark.stop(); return }
    if (args.contains("store")) { storeSweep(spark, dir); spark.stop(); return }
    val doc = graft.queries.QueryUtil.t(spark, dir, "documents")
    def time[A](l: String)(b: => A): A = {
      val t0 = System.nanoTime(); val r = b
      println(f"[probe] $l%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val minJ = 0.8

    // ---- variant A: current fused (doc_id, sh, sig) pin ----------------
    def variantA(): DataFrame = {
      val sets = PersistScope.pinEager(MinHashIndex.setsWithSignatures(doc))
      val bands = MinHashIndex.bandDigests(sets)
      val cand = bands.as("x")
        .join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.digest") === col("y.digest") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      val inter = size(array_intersect($"sh_a", $"sh_b"))
      cand
        .join(sets.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), Seq("doc_a"))
        .join(sets.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), Seq("doc_b"))
        .select($"doc_a", $"doc_b",
          round(inter * lit(1.0) / (size($"sh_a") + size($"sh_b") - inter), 6)
            .as("jaccard"))
        .filter($"jaccard" >= minJ)
        .orderBy($"doc_a", $"doc_b")
    }

    // ---- variant B: sig-only pin + candidate-only shingle recompute ----
    def variantB(): DataFrame = {
      val sigs = PersistScope.pinEager(
        MinHashIndex.setsWithSignatures(doc).select($"doc_id", $"sig"))
      val bands = MinHashIndex.bandDigests(sigs)
      val cand = PersistScope.pinEager(
        bands.as("x")
          .join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.digest") === col("y.digest") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct())
      val candIds = cand.select($"doc_a".as("doc_id"))
        .unionByName(cand.select($"doc_b".as("doc_id"))).distinct()
      val candSets =
        MinHashIndex.shingleSets(doc.join(broadcast(candIds), Seq("doc_id")))
      val inter = size(array_intersect($"sh_a", $"sh_b"))
      cand
        .join(broadcast(candSets.select($"doc_id".as("doc_a"), $"sh".as("sh_a"))), Seq("doc_a"))
        .join(broadcast(candSets.select($"doc_id".as("doc_b"), $"sh".as("sh_b"))), Seq("doc_b"))
        .select($"doc_a", $"doc_b",
          round(inter * lit(1.0) / (size($"sh_a") + size($"sh_b") - inter), 6)
            .as("jaccard"))
        .filter($"jaccard" >= minJ)
        .orderBy($"doc_a", $"doc_b")
    }

    // ---- stage probes ---------------------------------------------------
    time("fill fused (sh+sig) [cold]") {
      PersistScope.pinEager(MinHashIndex.setsWithSignatures(doc))
    }
    PersistScope.releaseAll()
    time("fill sig-only [cold]") {
      PersistScope.pinEager(
        MinHashIndex.setsWithSignatures(doc).select($"doc_id", $"sig"))
    }
    PersistScope.releaseAll()
    (1 to 3).foreach { i =>
      time(s"fill fused (sh+sig) $i") {
        PersistScope.pinEager(MinHashIndex.setsWithSignatures(doc))
      }
      PersistScope.releaseAll()
      time(s"fill sig-only $i") {
        PersistScope.pinEager(
          MinHashIndex.setsWithSignatures(doc).select($"doc_id", $"sig"))
      }
      PersistScope.releaseAll()
    }

    // ---- end-to-end interleaved -----------------------------------------
    def run(l: String)(mk: () => DataFrame): Unit = {
      time(l) { mk().write.format("noop").mode("overwrite").save() }
      PersistScope.releaseAll()
    }
    run("warmup A")(variantA _)
    run("warmup B")(variantB _)
    (1 to 3).foreach { i =>
      run(s"full A (fused pin) $i")(variantA _)
      run(s"full B (slim pin)  $i")(variantB _)
    }
    // result equivalence
    val a = variantA().collect().toSeq
    PersistScope.releaseAll()
    val b = variantB().collect().toSeq
    PersistScope.releaseAll()
    println(s"[probe] results match: ${a == b} (|A|=${a.size}, |B|=${b.size})")
    spark.stop()
  }

  /** Store-layout sweep (guide §6 output sizing): materialize the MinHash
    * store with 1/2/4/8 files per side and time the q_dedup_incremental
    * exec path against each — same rows, different file layout (the r20
    * 32-file variant measured worse; this brackets the low end).
    */
  private def storeSweep(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.queries.QueryUtil
    val doc = QueryUtil.t(spark, dir, "documents")
    val increment = doc.filter(col("doc_id") % 10 === 9)
    def time[A](l: String)(b: => A): A = {
      val t0 = System.nanoTime(); val r = b
      println(f"[store] $l%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    for (k <- Seq(8, 4, 2, 1)) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-store-sweep-$k").toString
      val input = if (k == 1) doc else doc.repartition(k, col("doc_id"))
      val index = MinHashIndex.materialize(input, root)
      val files = Seq("shingles", "bands").map { side =>
        val p = new java.io.File(s"$root/v1/base/$side")
        Option(p.listFiles()).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(-1)
      }
      println(s"[store] k=$k files(shingles,bands)=${files.mkString(",")}")
      def run(): Unit = {
        graft.queries.DedupQueries.incrementalPairs(spark, increment, index, 0.5)
          .write.format("noop").mode("overwrite").save()
        PersistScope.releaseAll()
      }
      run() // warm
      (1 to 3).foreach(i => time(s"k=$k incremental exec $i")(run()))
    }
  }

  /** Where does per-query PLAN time go? Build + fully plan every bench
    * query 3x, then dump Catalyst's per-rule time ledger — the receipt
    * for deciding whether injected-rule overhead is worth shaving.
    */
  private def rulesProbe(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val headline = graft.queries.Registry.all.filter(_.bench)
    // warm: JIT + caches (schema, footer, uniqueness memos)
    headline.foreach { q =>
      try { q.fn(spark, dir).queryExecution.executedPlan: Unit }
      catch { case e: Throwable => println(s"[rules] ${q.name} FAILED: $e") }
      finally PersistScope.releaseAll()
    }
    org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    val t0 = System.nanoTime()
    (1 to 3).foreach { _ =>
      headline.foreach { q =>
        try { q.fn(spark, dir).queryExecution.executedPlan: Unit }
        catch { case _: Throwable => () }
        finally PersistScope.releaseAll()
      }
    }
    val total = (System.nanoTime() - t0) / 1e6
    println(f"[rules] 3x full-bench planning wall: $total%.0f ms")
    println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
  }
}
