package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.operators.{MinHashIndex, StoreCatalog, StoreDef, StoreSource}
import graft.plans.{CatalogPersistence, JoinMvDef, MvAdvisor, MvCatalog, MvDef, MvMeasure}
import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}

/** The durable-catalog snapshot ([[graft.plans.CatalogPersistence]]):
  * save serializes every MV def and store def to one JSON file, load
  * re-registers them — the maintainer restart story. The killer
  * property pinned here: after save → process "restart" (clear) → load,
  * ONE maintainAll resumes every cursor at its SAVED watermark and
  * applies only the churn the process missed — never an O(corpus)
  * re-materialize.
  */
class CatalogPersistenceSpec extends SparkTestBase {
  import spark.implicits._

  private def mkdir(p: String): String = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
    p
  }

  test("save/load round-trips every def kind bit-exactly; a missing artifact skips with the reason") {
    MvCatalog.clear(); StoreCatalog.clear()
    try {
      val root = tempDir("graft-catpersist")
      val mvPath = mkdir(s"$root/mv.parquet")
      val joinPath = mkdir(s"$root/join.parquet")
      val storeRoot = mkdir(s"$root/mh_index")
      val goneRoot = s"$root/deleted_store" // never created
      val mv = MvDef(
        name = "cp_roll", basePath = s"$root/base", keys = Seq("k", "g"),
        measures = Map(
          "v::decimal(14,2)" -> MvMeasure(sum = Some("s_v"),
            min = Some("mn_v"), max = Some("mx_v")),
          "w" -> MvMeasure(cnt = Some("c_w"))),
        countStar = Some("n_star"), mvPath = mvPath,
        mvSchema = new StructType().add("k", StringType)
          .add("g", StringType).add("s_v", LongType),
        watermark = Some(41L), rows = Some(7L))
      val join = JoinMvDef(
        name = "cp_join", factPath = s"$root/fact",
        dimPath = s"$root/dim", joinKeys = Seq(("fk", "dk"), ("f2", "d2")),
        mvPath = joinPath,
        mvSchema = new StructType().add("fk", LongType).add("label", StringType),
        watermark = Some(10L), rows = Some(3L), dimWatermark = Some(5L))
      val s1 = StoreDef("cp_store_lineage", "minhash", storeRoot,
        Some(StoreSource(s"$root/base", "text", "doc_id", 41L)))
      val s2 = StoreDef("cp_store_plain", "split", mkdir(s"$root/split"), None)
      val s3 = StoreDef("cp_store_gone", "ivf", goneRoot, None)
      MvCatalog.register(mv); MvCatalog.registerJoin(join)
      Seq(s1, s2, s3).foreach(StoreCatalog.register)
      val file = s"$root/catalog.json"
      CatalogPersistence.save(file)

      // "restart": both registries empty, then reload
      MvCatalog.clear(); StoreCatalog.clear()
      assert(MvCatalog.isEmpty && StoreCatalog.describe().isEmpty)
      val results = CatalogPersistence.load(file)
        .map(r => r.name -> r).toMap
      assert(results("cp_roll").loaded && results("cp_join").loaded &&
        results("cp_store_lineage").loaded && results("cp_store_plain").loaded)
      assert(!results("cp_store_gone").loaded &&
        results("cp_store_gone").reason.exists(_.contains("missing")),
        results("cp_store_gone"))
      assert(MvCatalog.allDefs === Seq(mv),
        "rollup def must round-trip bit-exactly")
      assert(MvCatalog.allJoinDefs === Seq(join),
        "join def must round-trip bit-exactly")
      assert(StoreCatalog.describe() === Seq(s1, s2),
        "store defs must round-trip (minus the missing one)")
      // a second load is an idempotent replace-by-name, not a duplicate
      CatalogPersistence.load(file): Unit
      assert(MvCatalog.allDefs.size === 1 &&
        StoreCatalog.describe().size === 2)
      // refusals: absent file, unsupported version
      intercept[IllegalArgumentException](
        CatalogPersistence.load(s"$root/nope.json"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/bad.json"),
        """{"version": 99}""".getBytes)
      intercept[IllegalArgumentException](
        CatalogPersistence.load(s"$root/bad.json"))
    } finally { MvCatalog.clear(); StoreCatalog.clear() }
  }

  test("restart story: load resumes saved cursors and one sweep applies only the missed churn") {
    MvCatalog.clear(); StoreCatalog.clear()
    val root = tempDir("graft-catpersist-restart")
    val tbl = s"$root/orders_ice"
    val mvRoot = s"$root/mv"
    val idxRoot = s"$root/index"
    val file = s"$root/catalog.json"
    try {
      // an Iceberg base carrying both a rollup dashboard and a text col
      val docs = spark.read.parquet(
          SparkTestBase.Sf0001 + "/documents.parquet")
        .select($"doc_id", $"text", ($"doc_id" % 5).as("k"))
      IcebergWriter.append(spark, tbl, docs.filter($"doc_id" < 300),
        None, 1000L, formatVersion = 2)
      def dash(s: org.apache.spark.sql.SparkSession) =
        IcebergSource.read(s, tbl)
          .groupBy($"k").agg(count(lit(1)).as("n"), sum($"doc_id").as("sd"))
      val rollRec = MvAdvisor
        .recommend(MvAdvisor.analyze(dash(spark)).flatMap(_.toOption)).head
      rollRec.materialize(spark, mvRoot): Unit
      val mhRec = MvAdvisor.DedupIndexRecommendation(tbl, "text", 1)
      mhRec.materialize(spark, idxRoot): Unit
      val wm0 = IcebergMeta.load(tbl).currentSnapshot.get.id
      assert(MvCatalog.find(rollRec.mvName).get.watermark === Some(wm0))
      CatalogPersistence.save(file)

      // process "restart" loses the registries; churn lands while down
      MvCatalog.clear(); StoreCatalog.clear()
      IcebergWriter.append(spark, tbl,
        docs.filter($"doc_id" >= 300 && $"doc_id" < 360), None, 2000L)
      val head = IcebergMeta.load(tbl).currentSnapshot.get.id

      // reload: cursors resume at the SAVED watermark
      assert(CatalogPersistence.load(file).forall(_.loaded))
      assert(MvCatalog.find(rollRec.mvName).get.watermark === Some(wm0))
      assert(StoreCatalog.find(mhRec.storeName).get
        .source.get.watermark === wm0)
      // one sweep applies exactly the missed window for BOTH kinds
      val swept = MvAdvisor.maintainAll(spark)
        .filter(r => Set(rollRec.mvName, mhRec.storeName)(r.name))
      assert(swept.count(_.stale) === 2 &&
        swept.flatMap(_.appliedSnapshot).toSet === Set(head), swept.toString)
      // the minhash refresh was a FOLD of the missed batch (version
      // still 1 = no rebuild — the O(churn) claim), and covers it
      assert(MinHashIndex.currentVersion(
        spark, MinHashIndex.StoredIndex(idxRoot)) === 1)
      val ids = MinHashIndex.shingles(
          spark, MinHashIndex.StoredIndex(idxRoot))
        .select($"doc_id").as[Long].collect().toSet
      assert(ids.exists(_ >= 300), "fold must cover the missed batch")
      // the refreshed rollup answers the post-churn dashboard through
      // the rewrite, equal to the direct recompute
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.mv.rewrite.enabled", "true")
      assert(dash(s2).orderBy($"k").collect().map(_.toSeq).toSeq ===
        dash(spark).orderBy($"k").collect().map(_.toSeq).toSeq)
    } finally { MvCatalog.clear(); StoreCatalog.clear() }
  }

  test("crash before save: load -> sweep -> crash -> reload converges with zero re-applied windows") {
    MvCatalog.clear(); StoreCatalog.clear()
    val root = tempDir("graft-catpersist-crash")
    val tbl = s"$root/docs_ice"
    val idxRoot = s"$root/index"
    val file = s"$root/catalog.json"
    try {
      val docs = spark.read.parquet(
          SparkTestBase.Sf0001 + "/documents.parquet")
        .select($"doc_id", $"text")
      IcebergWriter.append(spark, tbl, docs.filter($"doc_id" < 200),
        None, 1000L, formatVersion = 2)
      val mhRec = MvAdvisor.DedupIndexRecommendation(tbl, "text", 1)
      mhRec.materialize(spark, idxRoot): Unit
      CatalogPersistence.save(file)

      // restart 1: reload, churn arrives, sweep applies it — and then
      // the maintainer CRASHES before its save (the autosave window)
      MvCatalog.clear(); StoreCatalog.clear()
      IcebergWriter.append(spark, tbl,
        docs.filter($"doc_id" >= 200 && $"doc_id" < 260), None, 2000L)
      assert(CatalogPersistence.load(file).forall(_.loaded))
      assert(MvAdvisor.maintainAll(spark)
        .find(_.name == mhRec.storeName).get.stale)
      val idx = MinHashIndex.StoredIndex(idxRoot)
      val segsAfterSweep = MinHashIndex.segmentCount(spark, idx)
      val rowsAfterSweep = MinHashIndex.shingles(spark, idx)
        .select($"doc_id", size($"sh")).as[(Long, Int)]
        .collect().sorted.toSeq
      // NO save happens (the crash) — the file still carries the
      // pre-sweep cursor

      // restart 2: reload the STALE cursor; the sweep must converge via
      // the store's own exactly-once memory — the head==effFrom repair
      // path — re-applying NOTHING (no new segment, no duplicated rows)
      MvCatalog.clear(); StoreCatalog.clear()
      assert(CatalogPersistence.load(file).forall(_.loaded))
      val head = IcebergMeta.load(tbl).currentSnapshot.get.id
      val swept2 = MvAdvisor.maintainAll(spark)
        .find(_.name == mhRec.storeName).get
      assert(swept2.appliedSnapshot === Some(head), swept2.toString)
      assert(MinHashIndex.segmentCount(spark, idx) === segsAfterSweep,
        "a stale-cursor resweep must not fold a new segment")
      val rowsAfterResweep = MinHashIndex.shingles(spark, idx)
        .select($"doc_id", size($"sh")).as[(Long, Int)]
        .collect().sorted.toSeq
      assert(rowsAfterResweep === rowsAfterSweep,
        "zero re-applied windows: rows identical across the crash")
      // the registry cursor is repaired; a save now closes the loop
      assert(StoreCatalog.find(mhRec.storeName).get
        .source.get.watermark === head)
      CatalogPersistence.save(file)
      MvCatalog.clear(); StoreCatalog.clear()
      CatalogPersistence.load(file): Unit
      assert(!MvAdvisor.maintainAll(spark)
        .find(_.name == mhRec.storeName).get.stale,
        "post-save reload is current")
    } finally { MvCatalog.clear(); StoreCatalog.clear() }
  }
}
