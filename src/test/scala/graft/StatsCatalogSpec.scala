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
