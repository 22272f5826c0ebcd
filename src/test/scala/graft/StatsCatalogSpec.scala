package graft

import org.apache.spark.sql.functions._

import graft.plans.{CatalogPersistence, StatsCatalog}
import graft.sources.IcebergWriter

/** plans.StatsCatalog — harvested row counts + mergeable per-column HLL
  * NDV sketches, the statistics that auto-arm EagerAggJoin. Contract
  * under test: one analyze pass estimates accurately, appends to a
  * TRACKED Iceberg table keep the stats current in O(increment) (the
  * writer hook), deletes adjust rows only (NDV stays a conservative
  * upper bound), untracked tables cost nothing, and the whole registry
  * survives a catalog save/load round trip.
  */
class StatsCatalogSpec extends SparkTestBase {
  import spark.implicits._

  private def within(got: Long, want: Long, relErr: Double): Boolean =
    math.abs(got - want) <= math.max(1.0, relErr * want)

  test("analyze: exact rows, HLL NDVs within sketch tolerance, all column types") {
    val li = s"${SparkTestBase.Sf0001}/lineitem.parquet"
    try {
      val st = StatsCatalog.analyze(spark, li)
      val df = spark.read.parquet(li)
      val rows = df.count()
      assert(st.rows === rows)
      // exact NDVs from a distinct pass; HLL lgK=12 is ~1.6% rse — allow 5%
      for (c <- Seq("l_returnflag", "l_suppkey", "l_partkey", "l_quantity",
          "l_shipdate")) {
        val want = df.select(col(c)).distinct().count()
        val got = st.cols(c).ndv
        assert(within(got, want, 0.05), s"$c: ndv=$got want=$want")
      }
      assert(StatsCatalog.tracked(li))
      assert(StatsCatalog.lookup(li).get.rows === rows)
    } finally StatsCatalog.unregister(li)
  }

  test("tracked Iceberg appends merge in O(increment); deletes adjust rows; untracked pay nothing") {
    val tbl = tempDir("graft-stats-ice") + "/t"
    val mk = (a: Long, b: Long) => spark.range(a, b)
      .select(col("id"), pmod(col("id"), lit(7)).as("k"),
        concat(lit("v"), col("id") % 100).as("s"))
    IcebergWriter.append(spark, tbl, mk(0, 500), None, 1000L,
      formatVersion = 2)
    // untracked: the append hook must have registered nothing
    assert(!StatsCatalog.tracked(tbl))
    try {
      val st0 = StatsCatalog.analyze(spark, tbl,
        data = Some(graft.sources.IcebergSource.read(spark, tbl)))
      assert(st0.rows === 500L)
      assert(within(st0.cols("k").ndv, 7, 0.05))
      // append NEW ids 500..1500: the writer hook unions the sketches
      IcebergWriter.append(spark, tbl, mk(500, 1500), None, 2000L)
      val st1 = StatsCatalog.lookup(tbl).get
      assert(st1.rows === 1500L, "append must merge the row count")
      assert(within(st1.cols("id").ndv, 1500, 0.05),
        s"id ndv=${st1.cols("id").ndv} after union")
      assert(within(st1.cols("k").ndv, 7, 0.05),
        "low-cardinality column must not inflate under union")
      // row-level delete: rows drop, NDV stays (upper bound by design)
      IcebergWriter.deleteRowsWhere(spark, tbl, col("id") < 100, 3000L)
      val st2 = StatsCatalog.lookup(tbl).get
      assert(st2.rows === 1400L, "delete must adjust the row count")
      assert(st2.cols("id").ndv >= st1.cols("id").ndv - 1,
        "sketches cannot forget — NDV stays an upper bound")
    } finally StatsCatalog.unregister(tbl)
  }

  test("catalog save/load round-trips the sketches and keeps them mergeable") {
    val dir = tempDir("graft-stats-persist")
    val li = s"${SparkTestBase.Sf0001}/lineitem.parquet"
    try {
      val st = StatsCatalog.analyze(spark, li)
      CatalogPersistence.save(s"$dir/catalog.json")
      StatsCatalog.clear()
      assert(!StatsCatalog.tracked(li))
      val results = CatalogPersistence.load(s"$dir/catalog.json")
      val mine = results.filter(_.kind == "stats")
      assert(mine.exists(r => r.loaded && r.name == StatsCatalog.normalize(li)),
        results.toString)
      val back = StatsCatalog.lookup(li).get
      assert(back.rows === st.rows)
      assert(back.cols("l_suppkey").ndv === st.cols("l_suppkey").ndv)
      // the reloaded sketch is still MERGEABLE, not just a number: a
      // merge of disjoint suppkeys must raise the estimate
      val inc = spark.range(1000000, 1001000)
        .select(col("id").as("l_suppkey"))
      StatsCatalog.mergeIncrement(spark, li, Some(inc))
      val merged = StatsCatalog.lookup(li).get
      assert(merged.cols("l_suppkey").ndv > back.cols("l_suppkey").ndv + 500,
        s"merged=${merged.cols("l_suppkey").ndv} base=${back.cols("l_suppkey").ndv}")
      assert(merged.rows === st.rows + 1000)
    } finally StatsCatalog.unregister(li)
  }

  test("joint combo sketches: correlated NDV exact-set, increments union, persistence round-trips (r20)") {
    val dir = tempDir("graft-stats-combo")
    val tbl = s"$dir/t"
    // k2 is a function of k: product 50*50=2500, joint NDV = 50
    spark.range(0, 10000)
      .select((col("id") % 50).as("k"), ((col("id") % 50) * 3).as("k2"),
        (col("id") % 11).as("v"))
      .write.mode("overwrite").parquet(tbl)
    try {
      val st = StatsCatalog.analyze(spark, tbl,
        combos = Seq(Seq("k2", "k"))) // order-insensitive: canonical key
      val key = StatsCatalog.comboKey(Seq("k", "k2"))
      assert(st.combos.contains(key), st.combos.keySet.toString)
      assert(within(st.combos(key).ndv, 50, 0.05),
        s"joint ndv=${st.combos(key).ndv}, want ~50")
      // increment with 30 NEW (k, k2) pairs unions into the joint sketch
      val inc = spark.range(0, 300)
        .select((col("id") % 30 + 1000).as("k"),
          ((col("id") % 30 + 1000) * 3).as("k2"), lit(0L).as("v"))
      StatsCatalog.mergeIncrement(spark, tbl, Some(inc))
      val st1 = StatsCatalog.lookup(tbl).get
      assert(within(st1.combos(key).ndv, 80, 0.05),
        s"joint ndv after union=${st1.combos(key).ndv}, want ~80")
      assert(st1.rows === 10300L)
      // combos survive the catalog document round trip
      CatalogPersistence.save(s"$dir/catalog.json")
      StatsCatalog.clear()
      CatalogPersistence.load(s"$dir/catalog.json")
      val back = StatsCatalog.lookup(tbl).get
      assert(back.combos(key).ndv === st1.combos(key).ndv)
    } finally StatsCatalog.unregister(tbl)
  }

  test("session-scoped entries: invisible to other sessions, shadow globals, never persisted (r20)") {
    val dir = tempDir("graft-stats-scoped")
    val tbl = s"$dir/t"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .write.mode("overwrite").parquet(tbl)
    val s2 = spark.newSession()
    val s3 = spark.newSession()
    try {
      StatsCatalog.analyzeScoped(s2, tbl)
      // visible exactly to s2
      assert(StatsCatalog.lookup(s2, tbl).isDefined)
      assert(StatsCatalog.lookup(s3, tbl).isEmpty)
      assert(StatsCatalog.lookup(spark, tbl).isEmpty)
      // not tracked, not described, not persisted
      assert(!StatsCatalog.tracked(tbl))
      assert(!StatsCatalog.describe().exists(
        _.path == StatsCatalog.normalize(tbl)))
      CatalogPersistence.save(s"$dir/catalog.json")
      val doc = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/catalog.json")), "UTF-8")
      assert(!doc.contains(StatsCatalog.normalize(tbl)),
        "a scoped entry leaked into the catalog document")
      // a global analyze coexists; the scoped entry shadows it for s2
      StatsCatalog.analyze(spark, tbl)
      assert(StatsCatalog.lookup(s3, tbl).isDefined)
      StatsCatalog.unregisterScoped(s2, tbl)
      assert(StatsCatalog.lookup(s2, tbl).isDefined,
        "after scoped unregister, s2 must fall back to the global entry")
    } finally {
      StatsCatalog.unregister(tbl)
      StatsCatalog.unregisterScoped(s2, tbl)
    }
  }

  test("staleness: fresh after analyze, stale after an out-of-band write, unknown when gone (r20)") {
    val dir = tempDir("graft-stats-stale")
    val tbl = s"$dir/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.mode("overwrite").parquet(tbl)
    try {
      val st = StatsCatalog.analyze(spark, tbl)
      assert(StatsCatalog.stale(spark, st) === Some(false))
      // an out-of-band overwrite (no hook): files newer than updatedMs
      Thread.sleep(1100) // mtime granularity can be one second
      Seq((9L, "z")).toDF("id", "s").write.mode("overwrite").parquet(tbl)
      assert(StatsCatalog.stale(spark, StatsCatalog.lookup(tbl).get)
        === Some(true))
      // re-analyze freshens
      val st2 = StatsCatalog.analyze(spark, tbl)
      assert(StatsCatalog.stale(spark, st2) === Some(false))
      // a vanished table is UNKNOWN, not fresh
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(tbl))
      assert(StatsCatalog.stale(spark, st2) === None)
    } finally StatsCatalog.unregister(tbl)
  }

  test("createTableAs re-analyzes a tracked target; untracked targets pay nothing (r20)") {
    val dir = tempDir("graft-stats-ctas")
    val tbl = s"$dir/t"
    val g = new graft.engine.GraftSession(spark)
    Seq((1L, 5L), (2L, 6L), (3L, 7L)).toDF("id", "v")
      .write.mode("overwrite").parquet(tbl)
    try {
      g.registerTable("src3",
        spark.range(0, 200).select(col("id"), (col("id") % 9).as("v")))
      // untracked: CTAS must register nothing
      g.createTableAs("t_ctas", "SELECT id, v FROM src3", tbl)
      assert(!StatsCatalog.tracked(tbl))
      // tracked (with a combo): CTAS REPLACES the table — the entry must
      // re-describe the new contents, combos re-harvested
      StatsCatalog.analyze(spark, tbl, combos = Seq(Seq("id", "v")))
      assert(StatsCatalog.lookup(tbl).get.rows === 200L)
      g.registerTable("src4",
        spark.range(0, 50).select(col("id"), (col("id") % 3).as("v")))
      g.createTableAs("t_ctas", "SELECT id, v FROM src4", tbl)
      val st = StatsCatalog.lookup(tbl).get
      assert(st.rows === 50L, "CTAS must re-analyze the replaced table")
      assert(within(st.cols("id").ndv, 50, 0.05))
      assert(within(st.combos(StatsCatalog.comboKey(Seq("id", "v"))).ndv,
        50, 0.05), "combos must survive the CTAS re-analyze")
    } finally StatsCatalog.unregister(tbl)
  }

  test("concurrent mergeIncrement composes: no lost rows or sketch unions (r20)") {
    // the r19 get-then-put raced: two concurrent appends could both
    // merge from the same base and the last put silently dropped the
    // other's rows and union. The computeIfPresent merge must compose.
    val dir = tempDir("graft-stats-race")
    val tbl = s"$dir/t"
    spark.range(0, 1000).select(col("id")).write.mode("overwrite").parquet(tbl)
    try {
      StatsCatalog.analyze(spark, tbl)
      val errs = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (0 until 2).map { t =>
        val th = new Thread(() => {
          try {
            (0 until 4).foreach { r =>
              val lo = 10000 + (t * 4 + r) * 250
              val inc = spark.range(lo, lo + 250).select(col("id"))
              StatsCatalog.mergeIncrement(spark, tbl, Some(inc))
            }
          } catch { case _: Throwable => errs.incrementAndGet(): Unit }
        })
        th.start(); th
      }
      threads.foreach(_.join(120000))
      assert(errs.get() === 0)
      val st = StatsCatalog.lookup(tbl).get
      assert(st.rows === 1000L + 8 * 250L,
        s"rows=${st.rows}: a concurrent increment was dropped")
      assert(within(st.cols("id").ndv, 3000, 0.05),
        s"id ndv=${st.cols("id").ndv}: a concurrent sketch union was lost")
    } finally StatsCatalog.unregister(tbl)
  }

  test("a stats entry whose table vanished is skipped on load") {
    val dir = tempDir("graft-stats-gone")
    val tblDir = tempDir("graft-stats-gone-tbl")
    val data = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    data.write.mode("overwrite").parquet(s"$tblDir/t")
    try {
      StatsCatalog.analyze(spark, s"$tblDir/t")
      CatalogPersistence.save(s"$dir/catalog.json")
      StatsCatalog.clear()
      // the table disappears between save and load
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(): Unit
      }
      rm(new java.io.File(s"$tblDir/t"))
      val results = CatalogPersistence.load(s"$dir/catalog.json")
      val entry = results.find(_.kind == "stats").get
      assert(!entry.loaded && entry.reason.exists(_.contains("missing")),
        entry.toString)
      assert(!StatsCatalog.tracked(s"$tblDir/t"))
    } finally StatsCatalog.unregister(s"$tblDir/t")
  }
}
