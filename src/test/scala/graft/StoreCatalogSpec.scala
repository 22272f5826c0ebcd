package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfStore, MinHashIndex, StoreCatalog, StoreDef, StoreSource}
import graft.plans.MvAdvisor
import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}

/** The registered-store maintenance loop ([[graft.operators.StoreCatalog]]):
  * advisor builds register their stores with Iceberg source lineage, one
  * changelog `refreshStep` per window brings a store current, and the
  * catalog-wide `MvAdvisor.maintainAll` sweep covers stores alongside MVs.
  * Pins the documented window shapes — insert-only fold / ingest, and
  * the r18 segment-scoped tombstones that keep delete AND update windows
  * O(churn) for both kinds (no rebuild, no compact) — plus cross-window
  * resurrection: an id deleted in one window and re-inserted in a later
  * one must be VISIBLE after the refresh, which the segment scoping
  * delivers without any compact (the new segment is uncovered).
  */
class StoreCatalogSpec extends SparkTestBase {
  import spark.implicits._

  private def docsFixture =
    spark.read.parquet(SparkTestBase.Sf0001 + "/documents.parquet")
      .select(col("doc_id"), col("text"))

  private def embFixture =
    spark.read.parquet(SparkTestBase.Sf0001 + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

  test("registry: kind validation, find/findByRoot/describe, replace-by-name") {
    StoreCatalog.clear()
    try {
      intercept[IllegalArgumentException](
        StoreCatalog.register(StoreDef("x", "btree", "/tmp/x", None)))
      val root = tempDir("graft-sc-reg")
      val d = StoreDef("sc_reg", "split", root + "/./store", None)
      StoreCatalog.register(d)
      assert(StoreCatalog.find("sc_reg").contains(d))
      // path-normalized lookup: the dot segment and the literal differ
      assert(StoreCatalog.findByRoot(root + "/store").contains(d))
      assert(StoreCatalog.findByRoot(root + "/elsewhere").isEmpty)
      assert(StoreCatalog.describe().map(_.name) === Seq("sc_reg"))
      // replace-by-name, same discipline as MvCatalog
      val d2 = d.copy(kind = "minhash")
      StoreCatalog.register(d2)
      assert(StoreCatalog.find("sc_reg").contains(d2))
      StoreCatalog.unregister("sc_reg")
      assert(StoreCatalog.find("sc_reg").isEmpty)
    } finally StoreCatalog.clear()
  }

  test("minhash store: advisor build registers lineage; insert-only window folds exactly-once; delete window tombstones at O(metadata)") {
    StoreCatalog.clear()
    val tbl = tempDir("graft-sc-mh") + "/docs_ice"
    val root = tempDir("graft-sc-mh-idx") + "/index"
    val docs = docsFixture
    IcebergWriter.append(spark, tbl, docs.filter($"doc_id" % 10 < 8),
      None, 1000L, formatVersion = 2)
    val rec = MvAdvisor.DedupIndexRecommendation(tbl, "text", 1)
    try {
      rec.materialize(spark, root): Unit
      val wm0 = IcebergMeta.load(tbl).currentSnapshot.get.id
      val d0 = StoreCatalog.find(rec.storeName).getOrElse(
        fail("materialize must register the store"))
      assert(d0.kind === "minhash" && d0.root === root)
      assert(d0.source === Some(StoreSource(tbl, "text", "doc_id", wm0)))
      // already current: the step no-ops
      assert(StoreCatalog.refreshStep(spark, d0).isEmpty)

      def expect() = MinHashIndex.shingleSets(
          IcebergSource.read(spark, tbl).select($"doc_id", $"text"))
        .select($"doc_id", size($"sh"))
        .as[(Long, Int)].collect().sorted.toSeq
      def stored() = MinHashIndex.shingles(
          spark, MinHashIndex.StoredIndex(root))
        .select($"doc_id", size($"sh"))
        .as[(Long, Int)].collect().sorted.toSeq

      // INSERT-only window: fold, not rebuild (version stays 1)
      IcebergWriter.append(spark, tbl, docs.filter($"doc_id" % 10 === 8),
        None, 2000L)
      val head1 = IcebergMeta.load(tbl).currentSnapshot.get.id
      assert(StoreCatalog.refreshStep(
        spark, StoreCatalog.find(rec.storeName).get).contains(head1))
      assert(StoreCatalog.find(rec.storeName).get.source.get.watermark
        === head1, "refresh must advance the registered watermark")
      assert(MinHashIndex.currentVersion(
        spark, MinHashIndex.StoredIndex(root)) === 1,
        "an insert-only window must fold, not rebuild")
      assert(stored() === expect())
      // replay: watermark is current, nothing happens
      assert(StoreCatalog.refreshStep(
        spark, StoreCatalog.find(rec.storeName).get).isEmpty)

      // DELETE window (round 18): O(metadata) TOMBSTONE, never the r17
      // O(corpus) rebuild — the version stays 1 (fold-not-rebuild) and a
      // live tombstone list appears; the anti-joined reads hide the
      // deleted docs from the commit on (stale entries would emit false
      // candidate pairs — the dedup-index correctness contract)
      IcebergWriter.deleteRowsWhere(spark, tbl, $"doc_id" % 10 === 3, 3000L)
      val head2 = IcebergMeta.load(tbl).currentSnapshot.get.id
      val idx = MinHashIndex.StoredIndex(root)
      val segsBefore = MinHashIndex.segmentCount(spark, idx)
      assert(StoreCatalog.refreshStep(
        spark, StoreCatalog.find(rec.storeName).get).contains(head2))
      assert(MinHashIndex.currentVersion(spark, idx) === 1,
        "a delete-only window must tombstone, not rebuild (version pin)")
      assert(MinHashIndex.segmentCount(spark, idx) === segsBefore,
        "a delete-only window must not touch the data segments")
      assert(MinHashIndex.tombstoneCount(spark, idx) === 1,
        "the delete window commits exactly one tombstone list")
      val after = stored()
      assert(after === expect())
      assert(!after.exists(_._1 % 10 === 3),
        "deleted docs must leave the index")
      // replay of the applied delete window: the snap token prefix-skips
      val d2 = StoreCatalog.find(rec.storeName).get
      StoreCatalog.register(
        d2.copy(source = d2.source.map(_.copy(watermark = wm0))))
      assert(StoreCatalog.refreshStep(
        spark, StoreCatalog.find(rec.storeName).get).contains(head2))
      assert(MinHashIndex.tombstoneCount(spark, idx) === 1,
        "a stale-cursor replay must not duplicate the tombstone list")
      assert(stored() === expect())
      // compact physically drops the dead rows and clears the lists
      MinHashIndex.compact(spark, idx)
      assert(MinHashIndex.tombstoneCount(spark, idx) === 0,
        "compact folds the tombstones away")
      assert(stored() === expect())
    } finally StoreCatalog.clear()
  }

  test("ivf store: insert-only ingests; update window is tombstone+ingest with NO compact; cross-window re-insert stays visible") {
    StoreCatalog.clear()
    val tbl = tempDir("graft-sc-ivf") + "/emb_ice"
    val root = tempDir("graft-sc-ivf-st") + "/store"
    val emb = embFixture
    IcebergWriter.append(spark, tbl, emb.filter($"vec_id" % 10 < 8),
      None, 1000L, formatVersion = 2)
    val rec = MvAdvisor.IndexRecommendation(tbl, "embedding", 1)
    try {
      rec.materialize(spark, root, nCells = 4): Unit
      assert(StoreCatalog.find(rec.storeName).exists(d =>
        d.kind == "ivf" && d.source.exists(_.basePath == tbl)))

      def refresh(): Option[Long] = StoreCatalog.refreshStep(
        spark, StoreCatalog.find(rec.storeName).get)
      def live(): Seq[(Long, Seq[Float])] = {
        val m = IvfStore.load(root)
        IvfStore.readLive(spark, root, m).select($"vec_id", $"embedding")
          .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
      }
      def base(): Seq[(Long, Seq[Float])] =
        IcebergSource.read(spark, tbl).select($"vec_id", $"embedding")
          .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq

      // INSERT-only window: one map-only ingest pass
      IcebergWriter.append(spark, tbl, emb.filter($"vec_id" % 10 === 8),
        None, 2000L)
      assert(refresh().isDefined)
      assert(live() === base())

      // UPDATE window (equality upsert of existing ids, new values):
      // tombstone the old values + ingest the new — with segment-scoped
      // tombstones (r18) there is NO compact: the new values land in an
      // uncovered segment and must be visible exactly once while the
      // dead list stays live (the pressure valve is the autopilot)
      val segsBefore = IvfStore.load(root).segments.size
      val upd = emb.filter($"vec_id" % 10 === 0)
        .select($"vec_id", transform($"embedding", x => -x).as("embedding"))
      IcebergWriter.upsertRows(spark, tbl, upd, "vec_id", 3000L)
      assert(refresh().isDefined)
      assert(live() === base(), "updated vectors must replace the old ones")
      val mUpd = IvfStore.load(root)
      assert(mUpd.tombstones.nonEmpty,
        "the O(churn) update path must NOT compact the tombstones away")
      assert(mUpd.segments.size === segsBefore + 1,
        "the update ingests ONE new segment — no rewrite of the store")
      assert(mUpd.tombstoneScopes.keySet === mUpd.tombstones.toSet,
        "every r18 tombstone records its segment scope")

      // DELETE-only window: O(metadata) tombstone, NO compact
      IcebergWriter.deleteRowsWhere(spark, tbl, $"vec_id" % 10 === 8, 4000L)
      assert(refresh().isDefined)
      assert(live() === base())
      assert(IvfStore.load(root).tombstones.size > mUpd.tombstones.size,
        "a delete-only window appends a tombstone list")

      // CROSS-WINDOW RESURRECTION: re-insert the ids deleted above in a
      // later insert-only window. The stale tombstone covers only the
      // segments that existed at delete time — the new segment is
      // uncovered, so the rows are visible with NO compact.
      IcebergWriter.append(spark, tbl, emb.filter($"vec_id" % 10 === 8),
        None, 5000L)
      assert(refresh().isDefined)
      assert(live() === base(),
        "a re-inserted id must be visible after the refresh")
      assert(IvfStore.load(root).tombstones.nonEmpty,
        "no compact ran — the scoped anti-join alone keeps reads exact")
      // idempotence: nothing moved, nothing to do
      assert(refresh().isEmpty)
      // the offline compact (the autopilot's job) folds the history and
      // changes NOTHING a reader sees
      IvfStore.compact(spark, root): Unit
      val mC = IvfStore.load(root)
      assert(mC.tombstones.isEmpty && mC.tombstoneScopes.isEmpty)
      assert(live() === base(), "compact must not change query results")
    } finally StoreCatalog.clear()
  }

  test("maintainAll sweeps stores with MVs: stale stores refresh, lineage-less report skipped, broken lineage is caught per store") {
    StoreCatalog.clear()
    val tbl = tempDir("graft-sc-sweep") + "/docs_ice"
    val root = tempDir("graft-sc-sweep-idx") + "/index"
    val docs = docsFixture
    IcebergWriter.append(spark, tbl, docs.filter($"doc_id" < 200),
      None, 1000L, formatVersion = 2)
    val rec = MvAdvisor.DedupIndexRecommendation(tbl, "text", 1)
    try {
      rec.materialize(spark, root): Unit
      StoreCatalog.register(StoreDef(
        "sc_plain", "split", tempDir("graft-sc-plain"), None))
      StoreCatalog.register(StoreDef(
        "sc_broken", "ivf", tempDir("graft-sc-broken"),
        Some(StoreSource(tempDir("graft-sc-nobase"), "e", "id", 1L))))
      // churn the real store's base, then ONE sweep
      IcebergWriter.append(spark, tbl,
        docs.filter($"doc_id" >= 200 && $"doc_id" < 260), None, 2000L)
      val rows = MvAdvisor.maintainAll(spark).map(r => r.name -> r).toMap
      assert(rows("sc_plain").skipped
        === Some("no source lineage — compaction-only store"))
      assert(rows("sc_broken").skipped.exists(_.startsWith("error: ")),
        rows("sc_broken"))
      val swept = rows(rec.storeName)
      assert(swept.kind === "minhash" && swept.stale
        && swept.appliedSnapshot
          .contains(IcebergMeta.load(tbl).currentSnapshot.get.id))
      // the sweep's refresh really landed: the index covers the churn
      val ids = MinHashIndex.shingles(
          spark, MinHashIndex.StoredIndex(root))
        .select($"doc_id").as[Long].collect().toSet
      assert(ids.exists(_ >= 200), "swept store must cover the new batch")
      // second sweep: everything current
      val again = MvAdvisor.maintainAll(spark).map(r => r.name -> r).toMap
      assert(!again(rec.storeName).stale
        && again(rec.storeName).skipped.isEmpty)
      // scoped face: maintainBase only touches stores of that base
      val scoped = MvAdvisor.maintainBase(spark, tbl)
      assert(scoped.exists(_.name == rec.storeName))
      assert(!scoped.exists(_.name == "sc_plain"))
      // the STREAMING face: maintainHook (the maintainedSink plug)
      // rides maintainBase, so one ingest hook now keeps the source's
      // index stores current too — no extra plumbing per store
      IcebergWriter.append(spark, tbl,
        docs.filter($"doc_id" >= 260 && $"doc_id" < 300), None, 3000L)
      val applied = MvAdvisor.maintainHook(tbl)(spark, 1L)
      assert(applied.contains(
        IcebergMeta.load(tbl).currentSnapshot.get.id), applied.toString)
      val hookIds = MinHashIndex.shingles(
          spark, MinHashIndex.StoredIndex(root))
        .select($"doc_id").as[Long].collect().toSet
      assert(hookIds.exists(_ >= 260),
        "the ingest hook must fold the new batch into the store")
    } finally StoreCatalog.clear()
  }

  test("split store refresh: insert-only windows ingest leakage-safe sides; delete windows refuse (frozen assignments)") {
    import graft.operators.SplitStore
    StoreCatalog.clear()
    val tbl = tempDir("graft-sc-split-ref") + "/docs_ice"
    val root = tempDir("graft-sc-split-st") + "/store"
    val docs = docsFixture
    IcebergWriter.append(spark, tbl, docs.filter($"doc_id" < 300),
      None, 1000L, formatVersion = 2)
    try {
      SplitStore.build(
        IcebergSource.read(spark, tbl).select($"doc_id", $"text"),
        root): Unit
      val wm0 = IcebergMeta.load(tbl).currentSnapshot.get.id
      StoreCatalog.register(StoreDef("sc_split", "split", root,
        Some(StoreSource(tbl, "text", "doc_id", wm0))))
      def d = StoreCatalog.find("sc_split").get
      assert(StoreCatalog.refreshStep(spark, d).isEmpty) // current

      // insert-only window: new docs get sides at increment cost
      IcebergWriter.append(spark, tbl,
        docs.filter($"doc_id" >= 300 && $"doc_id" < 360), None, 2000L)
      val head1 = IcebergMeta.load(tbl).currentSnapshot.get.id
      assert(StoreCatalog.refreshStep(spark, d).contains(head1))
      val assigned = SplitStore
        .assignments(spark, SplitStore.Store(root))
        .select($"doc_id", $"side").as[(Long, String)].collect().toMap
      val newIds = (300L until 360L).filter(assigned.contains)
      assert(newIds.size === 60,
        s"EVERY doc in the window must receive a side, got ${newIds.size}")
      assert(newIds.forall(i =>
        Set("train", "val", "quarantine")(assigned(i))),
        "every ingested doc must hold a valid frozen side")
      // replay no-ops (watermark current; the token guard backstops)
      assert(StoreCatalog.refreshStep(spark, d).isEmpty)

      // delete window: no sound automatic answer — refuse loudly, and
      // the catalog sweep surfaces it as the store's error row
      IcebergWriter.deleteRowsWhere(spark, tbl, $"doc_id" % 10 === 3, 3000L)
      val e = intercept[IllegalStateException](
        StoreCatalog.refreshStep(spark, d))
      assert(e.getMessage.contains("frozen"), e.getMessage)
      val row = MvAdvisor.maintainAll(spark)
        .find(_.name == "sc_split").get
      assert(row.skipped.exists(_.contains("frozen")), row.toString)
    } finally StoreCatalog.clear()
  }

  test("randomized churn/refresh interleaving: both store kinds equal the base recompute after every refresh (seeded)") {
    StoreCatalog.clear()
    val rnd = new scala.util.Random(42)
    val root = tempDir("graft-sc-fuzz")
    val docsTbl = s"$root/docs_ice"
    val embTbl = s"$root/emb_ice"
    val docs = docsFixture.filter($"doc_id" < 200)
    val emb = embFixture.filter($"vec_id" < 200)
    IcebergWriter.append(spark, docsTbl, docs.filter($"doc_id" < 120),
      None, 1000L, formatVersion = 2)
    IcebergWriter.append(spark, embTbl, emb.filter($"vec_id" < 120),
      None, 1000L, formatVersion = 2)
    val mhRec = MvAdvisor.DedupIndexRecommendation(docsTbl, "text", 1)
    val ivfRec = MvAdvisor.IndexRecommendation(embTbl, "embedding", 1)
    try {
      mhRec.materialize(spark, s"$root/mh"): Unit
      ivfRec.materialize(spark, s"$root/ivf", nCells = 4): Unit
      var nextNew = 120L
      var ts = 1000L
      def tick(): Long = { ts += 1000L; ts }
      // one random churn window against BOTH bases per round: appends of
      // brand-new ids, value-churning upserts of live ids, deletes —
      // composed so every refreshStep window shape (insert-only fold /
      // ingest, scoped-tombstone delete, scoped-tombstone update, and
      // the cross-window re-insert after a delete) occurs by round 8
      def churn(round: Int): Unit = {
        val t = tick()
        rnd.nextInt(3) match {
          // NOTE exhausted appends (nextNew == 200) fall through the
          // guard into the delete arm — accepted, but the delete arm
          // below must then tolerate an already-empty band (see there)
          case 0 if nextNew < 200L => // append brand-new ids
            val hi = math.min(nextNew + 10L + rnd.nextInt(10), 200L)
            IcebergWriter.append(spark, docsTbl, docs.filter(
              $"doc_id" >= nextNew && $"doc_id" < hi), None, t)
            IcebergWriter.append(spark, embTbl, emb.filter(
              $"vec_id" >= nextNew && $"vec_id" < hi), None, t)
            nextNew = hi
          case 1 => // upsert with round-varying values — also the
            // resurrection shape when a prior round deleted the band.
            // Bounded to ids already appended: idCol carries primary-key
            // semantics (the equality-upsert encoding's precondition),
            // and upserting a fixture id a later append would re-add
            // created duplicate identities in the BASE — which this very
            // fuzz caught as a store divergence before the bound
            val m = 3 + rnd.nextInt(5)
            IcebergWriter.upsertRows(spark, docsTbl,
              docs.filter($"doc_id" % 10 === m % 10 &&
                  $"doc_id" < nextNew)
                .withColumn("text", concat($"text", lit(s" r$round"))),
              "doc_id", t)
            IcebergWriter.upsertRows(spark, embTbl,
              emb.filter($"vec_id" % 10 === m % 10 &&
                  $"vec_id" < nextNew)
                .select($"vec_id", transform($"embedding",
                  x => x * lit(round + 1).cast("float"))
                  .cast("array<float>").as("embedding")),
              "vec_id", t)
          case _ => // delete one residue band — skipped when the band is
            // already empty (deleteRowsWhere refuses matched-no-rows;
            // seed 42 never hits this, but a seed/parameter change must
            // surface as a STORE divergence, not a churn-harness error)
            val m = rnd.nextInt(10)
            val bandLive = !IcebergSource.read(spark, docsTbl)
              .filter($"doc_id" % 10 === m).isEmpty
            if (bandLive) {
              IcebergWriter.deleteRowsWhere(spark, docsTbl,
                $"doc_id" % 10 === m, t)
              IcebergWriter.deleteRowsWhere(spark, embTbl,
                $"vec_id" % 10 === m, t)
            }
        }
      }
      def check(round: Int): Unit = {
        Seq(mhRec.storeName, ivfRec.storeName).foreach { n =>
          StoreCatalog.refreshStep(
            spark, StoreCatalog.find(n).get): Unit
        }
        val wantDocs = MinHashIndex.shingleSets(
            IcebergSource.read(spark, docsTbl).select($"doc_id", $"text"))
          .select($"doc_id", size($"sh"))
          .as[(Long, Int)].collect().sorted.toSeq
        val gotDocs = MinHashIndex.shingles(
            spark, MinHashIndex.StoredIndex(s"$root/mh"))
          .select($"doc_id", size($"sh"))
          .as[(Long, Int)].collect().sorted.toSeq
        assert(gotDocs === wantDocs, s"minhash diverged at round $round")
        val m = graft.operators.IvfStore.load(s"$root/ivf")
        val gotVecs = graft.operators.IvfStore
          .readLive(spark, s"$root/ivf", m)
          .select($"vec_id", $"embedding")
          .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
        val wantVecs = IcebergSource.read(spark, embTbl)
          .select($"vec_id", $"embedding")
          .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
        assert(gotVecs === wantVecs, s"ivf diverged at round $round")
      }
      (1 to 8).foreach { round =>
        churn(round)
        // occasionally stack a SECOND window before refreshing, so some
        // refreshes apply multi-snapshot windows
        if (rnd.nextBoolean()) churn(round)
        check(round)
      }
    } finally StoreCatalog.clear()
  }

  test("stale registry cursor (reload from an old save) converges: the prefix-skip never re-applies an applied window") {
    StoreCatalog.clear()
    val root = tempDir("graft-sc-stale")
    val docsTbl = s"$root/docs_ice"
    val embTbl = s"$root/emb_ice"
    val splitRoot = s"$root/split"
    val docs = docsFixture.filter($"doc_id" < 200)
    val emb = embFixture.filter($"vec_id" < 200)
    IcebergWriter.append(spark, docsTbl, docs.filter($"doc_id" < 120),
      None, 1000L, formatVersion = 2)
    IcebergWriter.append(spark, embTbl, emb.filter($"vec_id" < 120),
      None, 1000L, formatVersion = 2)
    val mhRec = MvAdvisor.DedupIndexRecommendation(docsTbl, "text", 1)
    val ivfRec = MvAdvisor.IndexRecommendation(embTbl, "embedding", 1)
    try {
      mhRec.materialize(spark, s"$root/mh"): Unit
      ivfRec.materialize(spark, s"$root/ivf", nCells = 4): Unit
      graft.operators.SplitStore.build(
        IcebergSource.read(spark, docsTbl).select($"doc_id", $"text"),
        splitRoot): Unit
      val wm0 = IcebergMeta.load(docsTbl).currentSnapshot.get.id
      StoreCatalog.register(StoreDef("stale_split", "split", splitRoot,
        Some(StoreSource(docsTbl, "text", "doc_id", wm0))))
      def stale(name: String, wm: Long): Unit = {
        val d = StoreCatalog.find(name).get
        StoreCatalog.register(
          d.copy(source = d.source.map(_.copy(watermark = wm))))
      }
      def refreshAll(): Unit =
        Seq(mhRec.storeName, ivfRec.storeName, "stale_split").foreach(n =>
          StoreCatalog.refreshStep(spark, StoreCatalog.find(n).get): Unit)

      // window A applied normally
      IcebergWriter.append(spark, docsTbl,
        docs.filter($"doc_id" >= 120 && $"doc_id" < 160), None, 2000L)
      IcebergWriter.append(spark, embTbl,
        emb.filter($"vec_id" >= 120 && $"vec_id" < 160), None, 2000L)
      refreshAll()
      val headA = IcebergMeta.load(docsTbl).currentSnapshot.get.id

      // the maintainer "crashes before catalog_save": cursors reload
      // STALE at wm0 while the head is still headA — the store already
      // holds this head, so the step must repair the cursor, not
      // re-fold/re-ingest/re-assign
      Seq(mhRec.storeName, ivfRec.storeName, "stale_split")
        .foreach(stale(_, wm0))
      assert(StoreCatalog.refreshStep(
        spark, StoreCatalog.find(mhRec.storeName).get).contains(headA))
      assert(StoreCatalog.refreshStep(spark,
        StoreCatalog.find(ivfRec.storeName).get).isDefined)
      StoreCatalog.refreshStep(
        spark, StoreCatalog.find("stale_split").get): Unit

      // ...and a stale cursor with FURTHER churn applies only the
      // missed suffix: final state equals the recompute, no duplicates
      Seq(mhRec.storeName, ivfRec.storeName, "stale_split")
        .foreach(stale(_, wm0))
      IcebergWriter.append(spark, docsTbl,
        docs.filter($"doc_id" >= 160), None, 3000L)
      IcebergWriter.append(spark, embTbl,
        emb.filter($"vec_id" >= 160), None, 3000L)
      refreshAll()
      val wantDocs = MinHashIndex.shingleSets(
          IcebergSource.read(spark, docsTbl).select($"doc_id", $"text"))
        .select($"doc_id", size($"sh"))
        .as[(Long, Int)].collect().sorted.toSeq
      val gotDocs = MinHashIndex.shingles(
          spark, MinHashIndex.StoredIndex(s"$root/mh"))
        .select($"doc_id", size($"sh"))
        .as[(Long, Int)].collect().sorted.toSeq
      assert(gotDocs === wantDocs,
        "a stale-cursor refresh must never double-fold")
      val m = graft.operators.IvfStore.load(s"$root/ivf")
      val gotVecs = graft.operators.IvfStore
        .readLive(spark, s"$root/ivf", m)
        .select($"vec_id").as[Long].collect().sorted.toSeq
      val wantVecs = IcebergSource.read(spark, embTbl)
        .select($"vec_id").as[Long].collect().sorted.toSeq
      assert(gotVecs === wantVecs,
        "a stale-cursor refresh must never duplicate vectors")
      val assigned = graft.operators.SplitStore
        .assignments(spark, graft.operators.SplitStore.Store(splitRoot))
        .select($"doc_id").as[Long].collect().toSeq
      assert(assigned.distinct.size === assigned.size,
        "a stale-cursor refresh must never re-assign a doc")
      assert(assigned.toSet ===
        IcebergSource.read(spark, docsTbl)
          .select($"doc_id").as[Long].collect().toSet,
        "every live doc holds exactly one frozen side")
    } finally StoreCatalog.clear()
  }

  test("store autopilot: compacts registered stores above the segment threshold, leaves quiet ones, reports broken ones") {
    import graft.operators.StoreMaintenance
    StoreCatalog.clear()
    try {
      val hotRoot = tempDir("graft-sc-ap-hot") + "/index"
      val quietRoot = tempDir("graft-sc-ap-quiet") + "/index"
      val docs = docsFixture
      // hot: base + two folds = 3 live segments; quiet: base only = 1.
      // Registered WITHOUT lineage — the autopilot is exactly the
      // maintenance face compaction-only registrations are promised.
      MinHashIndex.materialize(
        docs.filter($"doc_id" < 100).select($"doc_id", $"text"), hotRoot): Unit
      val idx = MinHashIndex.StoredIndex(hotRoot)
      assert(MinHashIndex.foldOnce(docs.filter($"doc_id" >= 100 &&
        $"doc_id" < 150).select($"doc_id", $"text"), idx, "ap-b1"))
      assert(MinHashIndex.foldOnce(docs.filter($"doc_id" >= 150 &&
        $"doc_id" < 200).select($"doc_id", $"text"), idx, "ap-b2"))
      MinHashIndex.materialize(
        docs.filter($"doc_id" < 50).select($"doc_id", $"text"),
        quietRoot): Unit
      StoreCatalog.register(StoreDef("ap_hot", "minhash", hotRoot, None))
      StoreCatalog.register(StoreDef("ap_quiet", "minhash", quietRoot, None))
      StoreCatalog.register(StoreDef("ap_broken", "minhash",
        tempDir("graft-sc-ap-broken") + "/nope", None))
      val rows = StoreMaintenance.autopilot(spark, segmentThreshold = 2)
        .map(r => r.name -> r).toMap
      // r19 leveled policy: no tombstone pressure, so the autopilot
      // takes the INCREMENTAL step — merge just enough of the smallest
      // segments (2 of 3) to get back under the threshold, leaving the
      // big base segment un-rewritten in its original version dir
      assert(rows("ap_hot").compacted &&
        rows("ap_hot").segmentsBefore === Some(3) &&
        rows("ap_hot").segmentsAfter === Some(2), rows("ap_hot").toString)
      assert(new java.io.File(s"$hotRoot/v1/base").isDirectory,
        "the incremental step must carry the base, not rewrite it")
      assert(!rows("ap_quiet").compacted &&
        rows("ap_quiet").segmentsBefore === Some(1) &&
        rows("ap_quiet").skipped.isEmpty)
      assert(rows("ap_broken").skipped.exists(_.startsWith("error: ")))
      // the fold's rows survived the compact — maintenance never loses data
      val ids = MinHashIndex.shingles(spark, idx)
        .select($"doc_id").as[Long].collect().toSet
      assert(ids.exists(_ >= 150), "compacted index must keep folded docs")
      // a second pass finds nothing to do
      val again = StoreMaintenance.autopilot(spark, segmentThreshold = 2)
        .map(r => r.name -> r).toMap
      assert(!again("ap_hot").compacted)
      intercept[IllegalArgumentException](
        StoreMaintenance.autopilot(spark, segmentThreshold = 0))
    } finally StoreCatalog.clear()
  }

  test("autopilot's second trigger: tombstone-list pressure compacts a one-segment store") {
    import graft.operators.StoreMaintenance
    StoreCatalog.clear()
    try {
      val root = tempDir("graft-sc-ap-tomb") + "/index"
      val docs = docsFixture
      // ONE data segment, but three live tombstone lists: a delete-heavy
      // store whose read amplification is all dead lists — segment count
      // alone would never compact it (the r18 delete path makes this the
      // common delete-window shape)
      MinHashIndex.materialize(
        docs.filter($"doc_id" < 100).select($"doc_id", $"text"), root): Unit
      val idx = MinHashIndex.StoredIndex(root)
      (1 to 3).foreach { i =>
        assert(MinHashIndex.deleteOnce(
          Seq(i.toLong * 7).toDF("doc_id"), idx, s"tp-$i"))
      }
      assert(MinHashIndex.segmentCount(spark, idx) === 1)
      assert(MinHashIndex.tombstoneCount(spark, idx) === 3)
      StoreCatalog.register(StoreDef("ap_tomb", "minhash", root, None))
      val rows = StoreMaintenance.autopilot(spark, segmentThreshold = 2)
        .map(r => r.name -> r).toMap
      assert(rows("ap_tomb").compacted, rows("ap_tomb").toString)
      assert(MinHashIndex.tombstoneCount(spark, idx) === 0,
        "the compact folds the dead lists away")
      val live = MinHashIndex.shingles(spark, idx)
        .select($"doc_id").as[Long].collect().toSet
      assert(Seq(7L, 14L, 21L).forall(!live.contains(_)),
        "tombstoned docs must be physically gone post-compact")
    } finally StoreCatalog.clear()
  }
}
