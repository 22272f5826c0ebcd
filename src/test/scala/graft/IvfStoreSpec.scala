package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IvfStore

/** The stored incremental IVF index: ingest economics (increment-only
  * passes, cell-scoped split refits), probe exactness against the current
  * model after every lifecycle step, crash/race visibility, compaction.
  */
class IvfStoreSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic corpus: `n` vectors in 4 well-separated 4-d clusters
    * (centers at ±8), with a small in-cluster spread keyed off the id so
    * every vector is distinct unless `pileup`.
    */
  private def corpus(ids: Range, pileup: Boolean = false): DataFrame = {
    val centers = Seq(
      Array(8f, 8f, 0f, 0f), Array(-8f, 8f, 0f, 0f),
      Array(8f, -8f, 0f, 0f), Array(-8f, -8f, 0f, 0f))
    ids.map { i =>
      val c = centers(i % 4)
      val emb =
        if (pileup) c
        else c.zipWithIndex.map { case (v, d) =>
          v + ((i * 31 + d * 7) % 13 - 6) * 0.05f
        }
      (i.toLong, emb, i % 4)
    }.toDF("vec_id", "embedding", "label")
  }

  /** Probe semantics of record: top-k over a FROM-SCRATCH assignment of
    * the whole corpus under the store's current model — what probe must
    * equal despite reading coarser stored labels.
    */
  private def fromScratch(
      all: DataFrame,
      m: IvfStore.Meta,
      query: Array[Float],
      k: Int,
      nProbe: Int): Seq[(Long, Double)] = {
    val probed = IvfStore.probedLeaves(m, query, nProbe)
    val qCol = array(query.toIndexedSeq.map(v => lit(v)): _*)
      .cast("array<float>")
    IvfStore.withLeaf(all, "embedding", "__leaf", m.model)
      .filter(col("__leaf").isin(probed: _*))
      .withColumn("cos",
        round(graft.functions.Functions.cosineSim(col("embedding"), qCol), 6))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select("vec_id", "cos")
      .as[(Long, Double)].collect().toSeq
  }

  private def probeRows(root: String, query: Array[Float], k: Int = 5,
      nProbe: Int = 2): Seq[(Long, Double)] =
    IvfStore.probe(spark, root, query, k, nProbe)
      .select("vec_id", "cos").as[(Long, Double)].collect().toSeq

  /** Parquet files the probe's scans actually opened (summed numFiles
    * metric after execution — `inputFiles` lists pre-pruning files, the
    * scan metric is post-partition-pruning truth).
    */
  private def probeFilesRead(root: String, query: Array[Float], k: Int,
      nProbe: Int): Long = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val p = IvfStore.probe(spark, root, query, k, nProbe)
    val scans = p.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.forall(
      _.partitionFilters.exists(_.references.exists(_.name == "cell"))),
      "every probe scan must carry a cell partition filter")
    p.collect()
    scans.map(_.metrics("numFiles").value).sum
  }

  private def dataFilesUnder(dirs: Seq[java.nio.file.Path]): Long =
    dirs.filter(Files.isDirectory(_)).map { d =>
      Files.walk(d).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
    }.sum.toLong

  private val query = Array(8f, 8f, 0.2f, -0.1f)

  test("create + repeated ingest: probes stay exact vs from-scratch assignment; each ingest appends one segment") {
    val root = tempDir("graft-ivfstore")
    val m1 = IvfStore.create(corpus(0 until 120), "embedding", root,
      nCells = 4, cellCap = 200, splitK = 2, seed = 7L)
    assert(m1.version === 1 && m1.segments.size === 1)
    assert(probeRows(root, query) ===
      fromScratch(corpus(0 until 120), m1, query, 5, 2))

    val m2 = IvfStore.ingest(spark, root, corpus(120 until 200))
    val m3 = IvfStore.ingest(spark, root, corpus(200 until 260))
    assert(m3.version === 3 && m3.segments.size === 3)
    assert(m3.counts.values.sum === 260)
    assert(probeRows(root, query) ===
      fromScratch(corpus(0 until 260), m3, query, 5, 2))
    // ingest never rewrites committed segments: the create's segment dir
    // content is byte-identical (same files) after two ingests
    val seg1 = Paths.get(root, m1.segments.head)
    assert(m2.segments.head === m1.segments.head)
    assert(Files.walk(seg1).iterator().hasNext)
  }

  test("hot-cell drift: an over-cap leaf splits in the MODEL only; stored labels stay coarse; probe reads the prefix chain and is still exact") {
    val root = tempDir("graft-ivfstore-split")
    // cap low enough that the cluster-0 leaf crosses it on the 2nd ingest
    val m1 = IvfStore.create(corpus(0 until 80), "embedding", root,
      nCells = 4, cellCap = 40, splitK = 2, seed = 7L)
    // every leaf starts under cap only if the 4 clusters spread evenly:
    // 80/4 = 20 per cell
    assert(m1.model.splits.isEmpty, s"premature split: ${m1.model.splits}")

    // skewed increment: 100 more rows all in cluster 0 (ids ≡ 0 mod 4)
    val skew = corpus(80 until 480).filter($"label" === 0)
    val m2 = IvfStore.ingest(spark, root, skew)
    assert(m2.model.splits.nonEmpty, "over-cap leaf did not split")
    val splitParent = m2.model.splits.head._1
    assert(!m2.counts.contains(splitParent),
      "split parent must be replaced by child counts")

    // stored labels remain coarse: some segment still has the parent dir
    val parentDirs = m2.segments.map(s =>
      Paths.get(root, s, s"cell=$splitParent")).filter(Files.isDirectory(_))
    assert(parentDirs.nonEmpty, "expected pre-split labels on disk")

    // probe targeting the split region: exact, and I/O stays within the
    // probed leaves' prefix chains (scan metric, post-pruning truth)
    val all = corpus(0 until 80).unionByName(skew)
    assert(probeRows(root, query) === fromScratch(all, m2, query, 5, 2))
    val probed = IvfStore.probedLeaves(m2, query, 2)
    val okDirs = probed.flatMap(IvfStore.prefixChain).distinct
    val allowed = dataFilesUnder(for {
      s <- m2.segments; c <- okDirs
    } yield Paths.get(root, s, s"cell=$c"))
    val total = dataFilesUnder(m2.segments.map(s => Paths.get(root, s)))
    val read = probeFilesRead(root, query, 5, 2)
    assert(read <= allowed && read < total,
      s"probe read $read files; prefix chains hold $allowed of $total")
  }

  test("identical-vector pileup freezes instead of splitting forever") {
    val root = tempDir("graft-ivfstore-frozen")
    // cluster 1 is a pure pileup from the start (10 identical vectors at
    // its center); the other three clusters spread normally
    val seedCorpus = corpus(0 until 40).filter($"label" =!= 1).unionByName(
      corpus(0 until 40, pileup = true).filter($"label" === 1))
    IvfStore.create(seedCorpus, "embedding", root,
      nCells = 4, cellCap = 30, splitK = 2, seed = 7L)
    // +40 more identical rows: the cell is 50 IDENTICAL vectors, over
    // cap, and the refit cannot separate anything — must freeze, not loop
    val m = IvfStore.ingest(spark, root,
      corpus(1000 until 1160, pileup = true).filter($"label" === 1))
    assert(m.model.frozen.nonEmpty, "pileup cell should freeze")
    assert(m.model.splits.forall { case (p, _) => !m.model.frozen(p) })
    // the frozen cell's count stays tracked and its leaf still probes
    val frozenLeaf = m.model.frozen.head
    assert(m.counts(frozenLeaf) === 50L)
    val q1 = Array(-8f, 8f, 0f, 0f)
    assert(probeRows(root, q1, k = 3, nProbe = 1).size === 3)
  }

  test("crash visibility: an uncommitted segment is invisible; a torn version reservation is skipped and burned") {
    val root = tempDir("graft-ivfstore-crash")
    val m1 = IvfStore.create(corpus(0 until 60), "embedding", root,
      nCells = 4, cellCap = 100, splitK = 2, seed = 7L)
    // crash between segment write and commit: dir exists, no metadata
    IvfStore.withLeaf(corpus(60 until 80), "embedding", "cell", m1.model)
      .write.partitionBy("cell").parquet(s"$root/seg-orphan")
    val loaded = IvfStore.load(root)
    assert(loaded.version === 1 && !loaded.segments.contains("seg-orphan"))
    assert(IvfStore.readAll(spark, root, loaded).count() === 60)

    // crash between reserve and fill: empty v2.json. Readers skip it,
    // the next ingest conflicts on v2 and commits v3.
    Files.createFile(Paths.get(root, "_versions", "v2.json"))
    assert(IvfStore.load(root).version === 1)
    val m2 = IvfStore.ingest(spark, root, corpus(60 until 90))
    assert(m2.version === 3, s"burned version not skipped: ${m2.version}")
    assert(probeRows(root, query) ===
      fromScratch(corpus(0 until 90), m2, query, 5, 2))

    // gc reclaims the orphan but never a referenced dir, and the idle
    // lease protects a just-written (in-flight) one
    assert(IvfStore.gc(root, olderThanMs = 3600000L).isEmpty,
      "a fresh orphan sits inside the writer lease window")
    val swept = IvfStore.gc(root, olderThanMs = 0L)
    assert(swept === Seq("seg-orphan"), s"gc swept $swept")
    assert(!Files.exists(Paths.get(root, "seg-orphan")))
    val mAfter = IvfStore.load(root)
    assert(mAfter.segments.forall(s => Files.exists(Paths.get(root, s))),
      "gc must never touch referenced segments")
    assert(IvfStore.readAll(spark, root, mAfter).count() === 90)
  }

  test("compact: folds to one segment at current leaves, deletes replaced dirs, probe answers unchanged and read only probed-leaf dirs") {
    val root = tempDir("graft-ivfstore-compact")
    IvfStore.create(corpus(0 until 80), "embedding", root,
      nCells = 4, cellCap = 40, splitK = 2, seed = 7L)
    IvfStore.ingest(spark, root,
      corpus(80 until 480).filter($"label" === 0)) // forces a split
    val before = probeRows(root, query)
    val mPre = IvfStore.load(root)
    assert(mPre.segments.size === 2 && mPre.model.splits.nonEmpty)

    val mc = IvfStore.compact(spark, root)
    assert(mc.segments.size === 1)
    assert(mPre.segments.forall(s => !Files.exists(Paths.get(root, s))),
      "replaced segments must be deleted")
    assert(mc.counts === mPre.counts, "compact recount must agree")
    assert(probeRows(root, query) === before)

    // post-compact: stored labels ARE current leaves, so probe I/O is
    // exactly the probed leaf dirs — no parent-prefix superset left
    val probed = IvfStore.probedLeaves(mc, query, 2)
    val leafOnly = dataFilesUnder(
      probed.map(c => Paths.get(root, mc.segments.head, s"cell=$c")))
    val read = probeFilesRead(root, query, 5, 2)
    assert(read === leafOnly && read > 0,
      s"post-compact probe read $read files, probed leaves hold $leafOnly")
  }

  test("compactStep: merges only the smallest segments, kept segments untouched on disk, lists absorbed or carried, probes exact") {
    val root = tempDir("graft-ivfstore-step")
    // big base + three small ingests = 4 segments
    IvfStore.create(corpus(0 until 200), "embedding", root,
      nCells = 4, cellCap = 500, splitK = 2, seed = 7L)
    (0 until 3).foreach { i =>
      IvfStore.ingest(spark, root,
        corpus(200 + i * 10 until 200 + (i + 1) * 10)): Unit
    }
    val m0 = IvfStore.load(root)
    assert(m0.segments.size === 4)
    val baseSeg = m0.segments.head // the create segment (big)
    // delete one base id (scope = all four segments) and one id from the
    // first small ingest, then re-ingest the base id (the update shape)
    val del = IvfStore.delete(spark, root, Seq(3L, 205L).toDF("vec_id"))
    assert(del.tombstones.size === 1)
    IvfStore.ingest(spark, root, corpus(3 until 4)): Unit // re-insert id 3
    val mPre = IvfStore.load(root)
    val before = probeRows(root, query, k = 250, nProbe = 4)
    assert(before.exists(_._1 == 3L) && !before.exists(_._1 == 205L))

    // merge the three small ingest segments + the refold (4 smallest):
    // the base segment must stay untouched ON DISK; the list still
    // covers the base, so it carries
    val ms = IvfStore.compactStep(spark, root, mergeCount = 4).get
    assert(ms.segments.size === 2, ms.segments.toString)
    assert(ms.segments.contains(baseSeg), "the big base must be kept")
    assert(Files.exists(Paths.get(root, baseSeg)))
    assert(ms.tombstones === mPre.tombstones,
      "a list still covering the base must carry, not die")
    val stepped = probeRows(root, query, k = 250, nProbe = 4)
    assert(stepped === before, "a step must never change probe answers")
    // the dead small-ingest id was physically dropped by the merge; the
    // re-inserted id stays visible exactly once
    assert(IvfStore.readLive(spark, root, ms)
      .filter($"vec_id" === 3L).count() === 1L)
    assert(IvfStore.readLive(spark, root, ms)
      .filter($"vec_id" === 205L).isEmpty)

    // a second step that merges EVERYTHING left absorbs the list: every
    // segment it still covers is in the merge set
    val ms2 = IvfStore.compactStep(spark, root, mergeCount = 8).get
    assert(ms2.segments.size === 1)
    assert(ms2.tombstones.isEmpty && ms2.tombstoneScopes.isEmpty,
      "a fully-covered list must be absorbed by the merge")
    assert(probeRows(root, query, k = 250, nProbe = 4) === before)
    // counts stay consistent with a full recount after the steps
    val mc = IvfStore.compact(spark, root)
    assert(ms2.counts.values.sum === mc.counts.values.sum,
      s"step counts ${ms2.counts.values.sum} vs recount ${mc.counts.values.sum}")
    // nothing to merge on a one-segment store
    assert(IvfStore.compactStep(spark, root, mergeCount = 2).isEmpty)
  }

  test("compactStep lost CAS race: a concurrent ingest wins, the step re-picks and nothing is lost") {
    val root = tempDir("graft-ivfstore-step-race")
    IvfStore.create(corpus(0 until 100), "embedding", root,
      nCells = 4, cellCap = 500, splitK = 2, seed = 7L)
    (0 until 2).foreach { i =>
      IvfStore.ingest(spark, root,
        corpus(100 + i * 10 until 100 + (i + 1) * 10)): Unit
    }
    // fire ONE racing ingest in the step's write-to-commit window: the
    // step's first CAS loses, it must reload, re-pick, and converge —
    // with the racer's rows fully visible afterwards
    var raced = false
    val ms = IvfStore.compactStepWithHook(spark, root, 4, () =>
      if (!raced) {
        raced = true
        IvfStore.ingest(spark, root, corpus(200 until 210)): Unit
      }).get
    assert(raced)
    val ids = IvfStore.readLive(spark, root, ms)
      .select($"vec_id").as[Long].collect().toSet
    assert((0 until 100).forall(i => ids(i.toLong)), "base rows lost")
    assert((100 until 120).forall(i => ids(i.toLong)), "merged rows lost")
    assert((200 until 210).forall(i => ids(i.toLong)),
      "the racing ingest's rows must survive the retried step")
    assert(ids.size === 130)
    // the re-pick happened against the RELOADED meta: one merged
    // segment replaced the smallest set, version advanced past the race
    assert(ms.version > 3, ms.version.toString)
    assert(probeRows(root, query, k = 130, nProbe = 4).nonEmpty)
    // counts stay reconcilable with a full recount
    val mc = IvfStore.compact(spark, root)
    assert(ms.counts.values.sum === mc.counts.values.sum)
  }

  test("delete: a tombstone commit touches no segment; probes exclude the ids; compact physically drops them and clears the list") {
    val root = tempDir("graft-ivfstore-delete")
    IvfStore.create(corpus(0 until 120), "embedding", root,
      nCells = 4, cellCap = 200, splitK = 2, seed = 7L)
    val m1 = IvfStore.load(root)
    val dead = Set(4L, 8L, 12L)
    val del = IvfStore.delete(spark, root, dead.toSeq.toDF("vec_id"))
    // metadata-scale: same segments, same counts (documented contract —
    // counts gate splits; over-counting a shrinking cell is conservative)
    assert(del.segments === m1.segments && del.counts === m1.counts)
    assert(del.tombstones.size === 1)
    assert(IvfStore.readLive(spark, root, del).count() === 117)
    val wide = probeRows(root, query, k = 120, nProbe = 4)
    assert(wide.nonEmpty && !wide.exists(r => dead(r._1)))

    // deletes stack; compact folds them all away
    IvfStore.delete(spark, root, Seq(16L).toDF("vec_id"))
    val mc = IvfStore.compact(spark, root)
    assert(mc.tombstones.isEmpty && mc.counts.values.sum === 116)
    del.tombstones.foreach(t =>
      assert(!Files.exists(Paths.get(root, t)), "tombstone dir must be gone"))
    val after = probeRows(root, query, k = 120, nProbe = 4)
    assert(after.nonEmpty && !after.exists(r => (dead + 16L)(r._1)))
  }

  test("scoped tombstones: a later ingest re-inserting deleted ids is visible with NO compact; the old rows stay dead") {
    val root = tempDir("graft-ivfstore-scoped")
    IvfStore.create(corpus(0 until 60), "embedding", root,
      nCells = 4, cellCap = 200, splitK = 2, seed = 7L)
    val dead = Seq(4L, 8L)
    val del = IvfStore.delete(spark, root, dead.toDF("vec_id"))
    assert(del.tombstoneScopes.keySet === del.tombstones.toSet,
      "an r18 delete records its segment scope")
    assert(del.tombstoneScopes.values.flatten.toSet === del.segments.toSet)
    // re-ingest the SAME ids with shifted embeddings (the update shape)
    val fresh = corpus(0 until 60).filter($"vec_id".isin(dead: _*))
      .select($"vec_id",
        transform($"embedding", x => x + lit(0.5f)).cast("array<float>")
          .as("embedding"),
        $"label")
    val m2 = IvfStore.ingest(spark, root, fresh)
    assert(m2.tombstones.nonEmpty, "no compact ran")
    // exactly ONE live row per re-inserted id, carrying the NEW values
    val live = IvfStore.readLive(spark, root, m2)
      .filter($"vec_id".isin(dead: _*))
      .select($"vec_id", element_at($"embedding", 1))
      .as[(Long, Float)].collect().toSeq.sortBy(_._1)
    assert(live.map(_._1) === dead,
      s"each re-inserted id must be live exactly once: $live")
    val want = fresh.select($"vec_id", element_at($"embedding", 1))
      .as[(Long, Float)].collect().toSeq.sortBy(_._1)
    assert(live === want, "the NEW values must be the visible ones")
    // an id deleted and NOT re-ingested stays dead through the ingest
    IvfStore.delete(spark, root, Seq(12L).toDF("vec_id")): Unit
    val m3 = IvfStore.load(root)
    assert(IvfStore.readLive(spark, root, m3)
      .filter($"vec_id" === 12L).isEmpty)
    // compact folds everything: same live rows, lists + scopes cleared
    val before = IvfStore.readLive(spark, root, m3)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    val mc = IvfStore.compact(spark, root)
    assert(mc.tombstones.isEmpty && mc.tombstoneScopes.isEmpty)
    assert(IvfStore.readLive(spark, root, mc)
      .select($"vec_id").as[Long].collect().sorted.toSeq === before)
  }

  test("streaming ingest via foreachBatch: exactly-once across replay, converges to the batch-equivalent state") {
    val root = tempDir("graft-ivfstore-stream")
    IvfStore.create(corpus(0 until 40), "embedding", root,
      nCells = 4, cellCap = 500, splitK = 2, seed = 7L)
    val streamDir = tempDir("graft-ivfstore-streamsrc")
    corpus(40 until 140).repartition(2).write.mode("overwrite").parquet(streamDir)
    val q = spark.readStream
      .schema(corpus(0 until 1).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir)
      .writeStream
      .option("checkpointLocation", tempDir("graft-ivfstore-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch(IvfStore.ingestSink(root))
      .start()
    try q.awaitTermination(120000)
    finally q.stop()

    val m = IvfStore.load(root)
    assert(m.lastBatchId === 1L, s"two micro-batches expected: $m")
    assert(m.counts.values.sum === 140)
    // crash-replay simulation: foreachBatch re-delivers ALREADY-COMMITTED
    // batches after a restart — both must be no-ops
    val r0 = IvfStore.ingest(spark, root, corpus(40 until 90), batchId = 0L)
    val r1 = IvfStore.ingest(spark, root, corpus(90 until 140), batchId = 1L)
    assert(r0.version === m.version && r1.version === m.version,
      "replayed batches must not commit")
    assert(IvfStore.readLive(spark, root, IvfStore.load(root)).count() === 140)
    // the streamed store answers exactly like a from-scratch assignment
    assert(probeRows(root, query) ===
      fromScratch(corpus(0 until 140), m, query, 5, 2))
  }

  test("probe recall vs brute force: the probed leaves carry the true neighbors on a clustered corpus") {
    import graft.functions.Functions
    val root = tempDir("graft-ivfstore-recall")
    val all = corpus(0 until 200)
    IvfStore.create(all, "embedding", root,
      nCells = 4, cellCap = 500, splitK = 2, seed = 7L)
    val qCol = array(query.toIndexedSeq.map(v => lit(v)): _*)
      .cast("array<float>")
    val brute = all
      .withColumn("cos", round(Functions.cosineSim(col("embedding"), qCol), 6))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10).select("vec_id").as[Long].collect().toSet
    val probed = probeRows(root, query, k = 10, nProbe = 2).map(_._1).toSet
    val recall = (brute & probed).size.toDouble / brute.size
    assert(recall >= 0.8,
      s"recall@10 $recall — probed leaves missed the true neighbors")
  }

  test("null embeddings pass through: null cell partition, excluded from counts and probes") {
    val root = tempDir("graft-ivfstore-null")
    val withNulls = corpus(0 until 40).unionByName(
      Seq((999L, null.asInstanceOf[Array[Float]], 9))
        .toDF("vec_id", "embedding", "label"))
    val m = IvfStore.create(withNulls, "embedding", root,
      nCells = 4, cellCap = 100, splitK = 2, seed = 7L)
    assert(m.counts.values.sum === 40, "null row must not be counted")
    assert(!probeRows(root, query, k = 40, nProbe = 4).exists(_._1 == 999L))
  }
}
