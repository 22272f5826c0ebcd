package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.plans.{MvAdvisor, MvCatalog}

/** plans.MvAdvisor: the workload analyzer harvests exactly the shapes
  * MvRewrite can answer (with actionable rejections for the rest), folds
  * them into rollup + multiplicity recommendations at the finest grain
  * the workload needs, and materialize() closes the loop — the
  * advisor-built, advisor-registered MVs make the original queries
  * rewrite and match their direct answers.
  */
class MvAdvisorSpec extends SparkTestBase with BeforeAndAfterAll {

  private var basePath: String = _
  private var s2: SparkSession = _

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    import spark.implicits._
    basePath = tempDir("graft-advisor") + "/wbase.parquet"
    Seq(
      ("a", "p", 1.5, 10L), ("a", "p", 2.5, 10L), ("a", "q", 3.0, 30L),
      ("b", "p", -1.0, 50L), ("b", "q", 4.0, 50L), ("b", "q", 4.0, 70L),
      ("c", "p", 0.25, 80L)
    ).toDF("k", "g", "x", "y").write.mode("overwrite").parquet(basePath)
    s2 = spark.newSession()
    s2.conf.set("spark.graft.mv.rewrite.enabled", "true")
  }

  override protected def afterAll(): Unit = {
    MvCatalog.unregister(basePath)
    super.afterAll()
  }

  private def q1(s: SparkSession): DataFrame = s.read.parquet(basePath)
    .filter(col("g") === "q").groupBy(col("k"))
    .agg(sum(col("y")).as("sy"), count(lit(1)).as("n"), avg(col("x")).as("ax"))
    .orderBy(col("k"))
  private def q2(s: SparkSession): DataFrame = s.read.parquet(basePath)
    .groupBy(col("k"), col("g"))
    .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    .orderBy(col("k"), col("g"))
  private def q3(s: SparkSession): DataFrame = s.read.parquet(basePath)
    .groupBy(col("k"))
    .agg(countDistinct(col("y")).as("dy"), count(lit(1)).as("n"))
    .orderBy(col("k"))

  test("analyze harvests MV-able shapes and explains the rest") {
    val shapes = Seq(q1(spark), q2(spark), q3(spark)).flatMap(MvAdvisor.analyze)
    assert(shapes.count(_.isRight) === 3, shapes)
    val s1 = shapes.head.toOption.get
    assert(s1.groupCols === Seq("k") && s1.filterCols === Seq("g"))
    assert(s1.sums === Set("y", "x") && s1.counts === Set("x") && s1.countStar)
    val s3 = shapes(2).toOption.get
    assert(s3.distinctCols === Set("y") && s3.countStar)
    // rejections carry the reason, not a silent drop
    val stddevQ = spark.read.parquet(basePath)
      .groupBy(col("k")).agg(stddev(col("x")).as("sd"))
    val r1 = MvAdvisor.analyze(stddevQ)
    assert(r1.exists(_.isLeft) &&
      r1.collectFirst { case scala.Left(r) => r.reason }.get
        .contains("not derivable"), r1)
    val randQ = spark.read.parquet(basePath)
      .filter(rand(7) < 0.5).groupBy(col("k")).agg(sum(col("y")).as("sy"))
    val r2 = MvAdvisor.analyze(randQ)
    assert(r2.collectFirst { case scala.Left(r) => r.reason }.get
      .contains("non-deterministic"), r2)
    // an aggregate over a join is out of the rollup advisor's scope:
    // skipped, not rejected (the join-MV surface registers separately)
    val joined = spark.read.parquet(basePath).as("l")
      .join(spark.read.parquet(basePath).as("r"), Seq("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    assert(MvAdvisor.analyze(joined).isEmpty)
  }

  test("recommend folds the workload: one rollup at the finest grain + one multiplicity per distinct column") {
    val shapes = Seq(q1(spark), q2(spark), q3(spark))
      .flatMap(MvAdvisor.analyze).flatMap(_.toOption)
    val recs = MvAdvisor.recommend(shapes)
    assert(recs.length === 2, recs)
    val rollup = recs.find(_.kind == "rollup").get
    assert(rollup.keys.toSet === Set("k", "g"),
      "keys must be the union of grouping AND filter columns")
    assert(rollup.sums === Set("y", "x") && rollup.counts === Set("x"))
    assert(rollup.mins === Set("x") && rollup.maxs === Set("x"))
    assert(rollup.queriesAnswered === 2)
    val mult = recs.find(_.kind == "multiplicity").get
    assert(mult.keys === Seq("k", "y"),
      "multiplicity grain = the distinct queries' OWN keys + the counted " +
        "column — q1/q2's filter column g must not widen the pair store")
    assert(mult.queriesAnswered === 1)
  }

  test("stats-fed cost model: analyzed bases rank recommendations by compression, un-analyzed stay None") {
    import graft.plans.StatsCatalog
    val shapes = Seq(q1(spark), q2(spark), q3(spark))
      .flatMap(MvAdvisor.analyze).flatMap(_.toOption)
    val recs = MvAdvisor.recommend(shapes)
    val rollup = recs.find(_.kind == "rollup").get
    // un-analyzed: structural recommendations carry no cost — the model
    // only ranks, never gates
    assert(MvAdvisor.costOf(rollup).isEmpty)
    try {
      StatsCatalog.analyze(spark, basePath)
      val cost = MvAdvisor.costOf(rollup).get
      // base = 7 rows; grain (k, g) has 3x2 NDVs, 5 actual combos —
      // the NDV-product bound must cap at the base rows and the
      // compression must reflect the real shrink direction
      assert(cost.baseRows === 7L)
      assert(cost.estimatedMvRows >= 5L && cost.estimatedMvRows <= 7L,
        cost.toString)
      assert(cost.compression >= 1.0)
      // a near-unique grain estimates at ~rows: compression ~1 — the
      // signal an operator uses to SKIP materializing
      val wide = rollup.copy(keys = Seq("k", "g", "x", "y"))
      val wideCost = MvAdvisor.costOf(wide).get
      assert(wideCost.estimatedMvRows === 7L, wideCost.toString)
      assert(wideCost.compression <= cost.compression)
      // a key with no sketch (unknown column) stays None, conservatively
      assert(MvAdvisor.costOf(rollup.copy(keys = Seq("k", "nope"))).isEmpty)
    } finally StatsCatalog.unregister(basePath)
  }

  test("grain clustering: an incomparable near-unique key set splits into its own rollup instead of poisoning the shared grain") {
    import spark.implicits._
    val dir = tempDir("graft-advisor-cluster")
    val bPath = s"$dir/cbase.parquet"
    // 400 rows, k has 4 values, u is near-unique (200 values)
    (1 to 400).map(i => (s"k${i % 4}", (i % 200).toLong, i.toLong))
      .toDF("k", "u", "y").write.mode("overwrite").parquet(bPath)
    def qFat(s: SparkSession) = s.read.parquet(bPath)
      .groupBy(col("k")).agg(sum(col("y")).as("sy"))
    def qThin(s: SparkSession) = s.read.parquet(bPath)
      .groupBy(col("u")).agg(count(lit(1)).as("n"))
    val shapes = Seq(qFat(spark), qThin(spark))
      .flatMap(MvAdvisor.analyze).flatMap(_.toOption)
    val recs = MvAdvisor.recommend(shapes)
    // the single-grain fold would emit ONE (k, u) rollup — 400 groups of
    // 400 rows, ratio 1, useless for both queries; containment
    // clustering emits one 4-row and one 200-row rollup instead
    val rollups = recs.filter(_.kind == "rollup")
    assert(rollups.map(_.keys.toSet).toSet === Set(Set("k"), Set("u")),
      s"expected split grains, got ${rollups.map(_.keys)}")
    assert(rollups.forall(_.queriesAnswered == 1))
    // distinct registered names (replace-by-name must not collide)
    assert(rollups.map(_.mvName).distinct.length === 2, rollups.map(_.mvName))
    try {
      val ratios = rollups.map(r =>
        r -> r.materialize(spark, s"$dir/${r.mvName}.parquet")).toMap
      assert(ratios.values.forall(_ < 0.6),
        s"both split rollups must compress: $ratios")
      // and both dashboards rewrite to THEIR rollup
      def scanPaths(df: DataFrame): Seq[String] =
        df.queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.rootPaths.map(_.toUri.getPath)
        }.flatten
      assert(scanPaths(qFat(s2)).exists(_.contains("rollup_cbase_parquet_k")))
      assert(scanPaths(qThin(s2)).exists(_.contains("rollup_cbase_parquet_u")))
      assert(qFat(s2).orderBy(col("k")).collect().map(_.toSeq).toSeq ===
        qFat(spark).orderBy(col("k")).collect().map(_.toSeq).toSeq)
      assert(qThin(s2).orderBy(col("u")).collect().map(_.toSeq).toSeq ===
        qThin(spark).orderBy(col("u")).collect().map(_.toSeq).toSeq)
      // a SUBSET query regroups through the fat cluster's grain: it must
      // not seed a third cluster
      def qSub(s: SparkSession) = s.read.parquet(bPath)
        .filter(col("k") === "k1").groupBy(col("k"))
        .agg(sum(col("y")).as("sy"))
      val shapes2 = (Seq(qFat(spark), qThin(spark), qSub(spark)))
        .flatMap(MvAdvisor.analyze).flatMap(_.toOption)
      val recs2 = MvAdvisor.recommend(shapes2)
      assert(recs2.count(_.kind == "rollup") === 2,
        s"subset shape must join the containing cluster: $recs2")
      assert(recs2.find(_.keys.toSet == Set("k")).get.queriesAnswered === 2)
    } finally MvCatalog.unregister(bPath)
  }

  test("join workload: analyzeJoins harvests the trio, ambiguity rejects, materialize makes the join query rewrite") {
    import spark.implicits._
    val dir = tempDir("graft-advisor-join")
    val factPath = s"$dir/jfact.parquet"
    val dimPath = s"$dir/jdim.parquet"
    Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "z", 40L))
      .toDF("fk", "jk", "v").write.mode("overwrite").parquet(factPath)
    Seq(("a", "alpha"), ("b", "beta"), ("c", "gamma"))
      .toDF("dk", "name").write.mode("overwrite").parquet(dimPath)
    def jq(s: SparkSession): DataFrame = {
      val f = s.read.parquet(factPath)
      val d = s.read.parquet(dimPath)
      f.join(d, col("jk") === col("dk"), "inner")
        .filter(col("name") =!= "gamma")
        .groupBy(col("name"))
        .agg(sum(col("v")).as("sv"), countDistinct(col("fk")).as("df"))
        .orderBy(col("name"))
    }
    val shapes = MvAdvisor.analyzeJoins(jq(spark))
    assert(shapes.length === 1 && shapes.head.isRight, shapes)
    val sh = shapes.head.toOption.get
    assert(sh.factPath.contains("jfact") && sh.dimPath.contains("jdim"))
    assert(sh.joinKeys === Seq(("jk", "dk")))
    assert(sh.columns.toSet ===
      Set(("name", false), ("v", true), ("fk", true), ("jk", true),
        ("dk", false)), sh.columns)
    // a non-key column both sides expose rejects with the reason
    val fact2Path = s"$dir/jfact2.parquet"
    Seq((1L, "a", "t1")).toDF("fk", "jk", "name")
      .write.mode("overwrite").parquet(fact2Path)
    val f2 = spark.read.parquet(fact2Path)
    val amb = f2.join(spark.read.parquet(dimPath), f2("jk") === col("dk"))
      .groupBy(f2("jk"))
      .agg(count(lit(1)).as("n"), max(f2("name")).as("mx"))
    val ambShapes = MvAdvisor.analyzeJoins(amb)
    assert(ambShapes.exists(s => s.isLeft &&
      s.swap.toOption.get.reason.contains("both join sides")), ambShapes)
    // recommend + materialize; the join query then rewrites and matches
    val recs = MvAdvisor.recommendJoins(Seq(sh))
    assert(recs.length === 1 && recs.head.queriesAnswered === 1)
    val ratio = recs.head.materialize(spark, s"$dir/adv_join.parquet")
    assert(ratio > 0 && ratio <= 1, s"ratio $ratio") // inner join filters
    try {
      val rewritten = jq(s2)
      def paths(df: DataFrame) = df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toUri.getPath)
      }.flatten
      assert(paths(rewritten).exists(_.contains("adv_join")),
        s"expected advisor join view scan, got ${paths(rewritten)}")
      assert(!paths(rewritten).exists(p =>
        p.contains("jfact.parquet") || p.contains("jdim.parquet")))
      assert(rewritten.collect().map(_.toSeq).toSeq ===
        jq(spark).collect().map(_.toSeq).toSeq)
    } finally MvCatalog.unregisterJoin(factPath, dimPath)
  }

  test("Iceberg lifecycle: pinned build stamps the watermark, churn-scoped refresh brings the view current, time travel never rewrites") {
    import spark.implicits._
    import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}
    val tbl = tempDir("graft-advisor-ice") + "/table"
    val mvRoot = tempDir("graft-advisor-ice-mv") + "/mv"
    IcebergWriter.append(spark, tbl,
      Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "v"),
      None, 1000L, formatVersion = 2)
    def dash(s: SparkSession) = IcebergSource.read(s, tbl)
      .groupBy(col("k")).agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      .orderBy(col("k"))
    def scanPaths(df: DataFrame): Seq[String] =
      df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toUri.getPath)
      }.flatten
    // harvest resolves the multi-file Iceberg read to the TABLE ROOT
    val shapes = MvAdvisor.analyze(dash(spark)).flatMap(_.toOption)
    assert(shapes.nonEmpty && shapes.head.basePath === tbl,
      s"harvest must key the table root, got $shapes")
    val rec = MvAdvisor.recommend(shapes).head
    try {
      val ratio = rec.materialize(spark, mvRoot)
      assert(ratio > 0 && ratio <= 1, s"ratio $ratio")
      val snap1 = IcebergMeta.load(tbl).currentSnapshot.get.id
      val d1 = MvCatalog.lookup(tbl).find(_.name == rec.mvName).get
      assert(d1.watermark === Some(snap1), "build must stamp the snapshot")
      assert(d1.mvPath.contains(s"v$snap1"), d1.mvPath)
      // the dashboard rewrites to the versioned store and matches
      val r1 = dash(s2)
      assert(scanPaths(r1).exists(_.contains(s"v$snap1")),
        s"expected the versioned MV scan, got ${scanPaths(r1)}")
      assert(r1.collect().map(_.toSeq).toSeq ===
        dash(spark).collect().map(_.toSeq).toSeq)
      // churn: one group grows, one brand-new group appears
      IcebergWriter.append(spark, tbl,
        Seq(("a", 100L), ("c", 7L)).toDF("k", "v"), None, 2000L)
      val applied = rec.refreshStep(spark, mvRoot).get
      val snap2 = IcebergMeta.load(tbl).currentSnapshot.get.id
      assert(applied === snap2)
      val d2 = MvCatalog.lookup(tbl).find(_.name == rec.mvName).get
      assert(d2.watermark === Some(snap2))
      // a replay no-ops off the registered watermark
      assert(rec.refreshStep(spark, mvRoot).isEmpty)
      // refreshed store == full recompute, and the rewrite follows it
      val r2 = dash(s2)
      assert(scanPaths(r2).exists(_.contains(s"v$snap2")),
        s"expected the refreshed version scan, got ${scanPaths(r2)}")
      assert(r2.collect().map(_.toSeq).toSeq ===
        dash(spark).collect().map(_.toSeq).toSeq)
      // a TIME-TRAVEL read resolves to a different file set and must
      // never match the current-state MV
      val tt = IcebergSource.read(s2, tbl, snapshotId = Some(snap1),
          asOfTimestampMs = None, prune = None)
        .groupBy(col("k")).agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      assert(!scanPaths(tt).exists(_.contains("/mv/")),
        s"time travel must not rewrite: ${scanPaths(tt)}")
      // second churn + refresh prunes versions older than the superseded
      IcebergWriter.append(spark, tbl, Seq(("b", 9L)).toDF("k", "v"),
        None, 3000L)
      rec.refreshStep(spark, mvRoot).get
      val versions = new java.io.File(mvRoot).listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(!versions.contains(s"v$snap1"),
        s"the oldest version must be pruned: $versions")
      assert(versions.size === 2, s"current + superseded only: $versions")
      // DELETE churn (equality upsert) refreshes correctly too — the MoR
      // base no longer rewrites (a merge read is not a plain scan), so
      // certify against the direct recompute instead
      IcebergWriter.upsertRows(spark, tbl, Seq(("a", 1L)).toDF("k", "v"),
        "k", 4000L)
      rec.refreshStep(spark, mvRoot).get
      val d3 = MvCatalog.lookup(tbl).find(_.name == rec.mvName).get
      val stored = spark.read.parquet(d3.mvPath)
        .orderBy(col("k")).collect().map(_.toSeq).toSeq
      val recomputed = IcebergSource.read(spark, tbl)
        .groupBy(col("k"))
        .agg(sum(col("v")).as("s_v"), count(lit(1)).as("n_star"))
        .orderBy(col("k")).collect().map(_.toSeq).toSeq
      assert(stored.map(r => (r.head, r(1), r.last)) ===
        recomputed.map(r => (r.head, r(1), r.last)),
        "refreshed store must equal the full recompute after deletes")
    } finally MvCatalog.unregister(tbl)
  }

  test("advisor hook plugs into maintainedSink: streaming ingest keeps the advisor-built MV fresh exactly-once") {
    import spark.implicits._
    import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}
    import graft.streaming.MaterializedAgg
    val dropDir = tempDir("graft-advisor-sink-drop")
    val checkpoint = tempDir("graft-advisor-sink-ckpt")
    val tbl = tempDir("graft-advisor-sink-src") + "/table"
    val mvRoot = tempDir("graft-advisor-sink-mv") + "/mv"
    // seed the table, advise + materialize (pins + stamps snapshot 1).
    // Seed goes through parquet so its schema is NULLABLE like the
    // streamed batches' (the table schema is fixed at creation)
    val seedPath = tempDir("graft-advisor-sink-seed") + "/seed.parquet"
    (0L until 12L).map(i => (s"g${i % 3}", i)).toDF("k", "v")
      .write.mode("overwrite").parquet(seedPath)
    IcebergWriter.append(spark, tbl, spark.read.parquet(seedPath),
      None, 1000L, formatVersion = 2)
    def dash(s: SparkSession) = IcebergSource.read(s, tbl)
      .groupBy(col("k")).agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
    val rec = MvAdvisor
      .recommend(MvAdvisor.analyze(dash(spark)).flatMap(_.toOption))
      .headOption.getOrElse(fail("no recommendation"))
    try {
      rec.materialize(spark, mvRoot): Unit
      // the advisor's refresh hook IS a maintainedSink thunk: the same
      // foreachBatch that ingests the source refreshes the advisor MV
      var tick = 1000L
      val clock = () => { tick += 1000L; tick }
      val sink = MaterializedAgg.maintainedSink(
        tbl, rec.refreshHook(mvRoot), clock = clock)
      val docs = (12L until 24L).map(i => (s"g${i % 3}", i)).toDF("k", "v")
      docs.filter($"v" < 18).write.parquet(s"$dropDir/b0")
      def run(): Unit = {
        val q = spark.readStream.schema(docs.schema)
          .parquet(s"$dropDir/*/")
          .writeStream.option("checkpointLocation", checkpoint)
          .foreachBatch(sink)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination(120000): Unit finally q.stop()
      }
      run()
      def storedMv() = {
        val d = MvCatalog.lookup(tbl).find(_.name == rec.mvName).get
        spark.read.parquet(d.mvPath).orderBy(col("k"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .toSeq
      }
      def direct() = dash(spark).orderBy(col("k"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(storedMv() === direct(), "MV must be fresh after the batch")
      val wm1 = MvCatalog.lookup(tbl).find(_.name == rec.mvName).get.watermark
      assert(wm1 === IcebergMeta.load(tbl).currentSnapshot.map(_.id))
      // a second drop + restart: ingest lands, the hook follows
      docs.filter($"v" >= 18).write.parquet(s"$dropDir/b1")
      run()
      assert(IcebergSource.read(spark, tbl).count() === 24)
      assert(storedMv() === direct(), "MV must track the second batch")
    } finally MvCatalog.unregister(tbl)
  }

  test("maintainAll: one sweep refreshes every stale advisor view (rollup + join), skips hand-declared defs, and a second sweep is a no-op") {
    import spark.implicits._
    import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}
    val fact = tempDir("graft-maintain-fact") + "/table"
    val dimP = tempDir("graft-maintain-dim") + "/dim.parquet"
    val rollRoot = tempDir("graft-maintain-roll") + "/mv"
    val joinRoot = tempDir("graft-maintain-join") + "/mv"
    IcebergWriter.append(spark, fact,
      Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "v"),
      None, 1000L, formatVersion = 2)
    Seq(("a", "alpha"), ("b", "beta"), ("c", "gamma"))
      .toDF("dk", "label").write.mode("overwrite").parquet(dimP)
    def rollDash(s: SparkSession) = IcebergSource.read(s, fact)
      .groupBy(col("k")).agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
    def joinDash(s: SparkSession) = IcebergSource.read(s, fact)
      .join(s.read.parquet(dimP), col("k") === col("dk"), "inner")
      .groupBy(col("label")).agg(sum(col("v")).as("sv"))
    val roll = MvAdvisor
      .recommend(MvAdvisor.analyze(rollDash(spark)).flatMap(_.toOption)).head
    val join = MvAdvisor.recommendJoins(
      MvAdvisor.analyzeJoins(joinDash(spark)).flatMap(_.toOption)).head
    try {
      roll.materialize(spark, rollRoot): Unit
      join.materialize(spark, joinRoot): Unit
      // a hand-declared def shares the catalog — the sweep must report
      // it skipped, never rewrite files it does not understand
      MvCatalog.register(graft.plans.MvDef(
        name = "hand_decl_maintain", basePath = fact, keys = Seq("k"),
        measures = Map.empty, countStar = None, mvPath = rollRoot,
        mvSchema = new org.apache.spark.sql.types.StructType()))
      // fromJoinDef round-trips the registered join def (the refresh-by-
      // name face), re-deriving side attribution from the live schemas
      val jd = MvCatalog.findJoin(join.mvName).get
      val backJoin = MvAdvisor.fromJoinDef(spark, jd).get
      assert(backJoin.joinKeys === join.joinKeys)
      assert(backJoin.columns.toSet === join.columns.toSet)
      // and refuses a def whose stored columns no side carries anymore
      assert(MvAdvisor.fromJoinDef(spark, jd.copy(mvSchema =
        new org.apache.spark.sql.types.StructType()
          .add("ghost", "string"))).isEmpty)
      val mine = Set(roll.mvName, join.mvName, "hand_decl_maintain")
      // everything just-built: the first sweep refreshes nothing
      val sweep0 = MvAdvisor.maintainAll(spark)
        .filter(r => mine(r.name)).map(r => r.name -> r).toMap
      assert(sweep0.size === 3, sweep0.keySet)
      assert(!sweep0(roll.mvName).stale && !sweep0(join.mvName).stale)
      assert(sweep0("hand_decl_maintain").skipped.exists(
        _.contains("hand-declared")))
      // churn the fact: BOTH advisor views go stale; ONE sweep fixes both
      IcebergWriter.append(spark, fact,
        Seq(("a", 100L), ("c", 7L)).toDF("k", "v"), None, 2000L)
      val head2 = IcebergMeta.load(fact).currentSnapshot.get.id
      val sweep1 = MvAdvisor.maintainAll(spark)
        .filter(r => mine(r.name)).map(r => r.name -> r).toMap
      assert(sweep1(roll.mvName).stale &&
        sweep1(roll.mvName).appliedSnapshot === Some(head2), sweep1)
      assert(sweep1(join.mvName).stale &&
        sweep1(join.mvName).appliedSnapshot === Some(head2), sweep1)
      // the refreshed stores equal their direct recomputes
      val rd = MvCatalog.lookup(fact).find(_.name == roll.mvName).get
      assert(spark.read.parquet(rd.mvPath).orderBy(col("k"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
        rollDash(spark).orderBy(col("k"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
      val jd2 = MvCatalog.findJoin(join.mvName).get
      assert(jd2.watermark === Some(head2), "join def must re-stamp")
      assert(spark.read.parquet(jd2.mvPath)
        .groupBy(col("label")).agg(sum(col("v")).as("sv"))
        .orderBy(col("label"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
        joinDash(spark).orderBy(col("label"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
      // second sweep: everything current again, nothing rewritten
      val sweep2 = MvAdvisor.maintainAll(spark)
        .filter(r => mine(r.name)).map(r => r.name -> r).toMap
      assert(!sweep2(roll.mvName).stale && !sweep2(join.mvName).stale,
        sweep2)
    } finally {
      MvCatalog.unregister(fact)
      MvCatalog.unregisterJoin(fact, dimP)
    }
  }

  test("ANN index advisor: a cosine top-k workload recommends an IVF store; the built store's probe answers it exactly") {
    import graft.operators.IvfStore
    val embPath = SparkTestBase.Sf0001 + "/embeddings.parquet"
    val emb = spark.read.parquet(embPath)
    val qvec = emb.orderBy(col("vec_id")).select(col("embedding"))
      .head.getSeq[Float](0).toArray
    val qCol = array(qvec.toIndexedSeq.map(v => lit(v)): _*)
      .cast("array<float>")
    // brute-force top-k: the workload shape the index serves (rounded
    // to the probe's 6dp so tie-breaks compare identically)
    val dash = emb.select(col("vec_id"),
      round(graft.functions.Functions.cosineSim(col("embedding"), qCol), 6)
        .as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(5)
    val shapes = MvAdvisor.analyzeAnn(dash)
    assert(shapes.map(_.embCol) === Seq("embedding"), shapes)
    assert(shapes.head.basePath.endsWith("embeddings.parquet"), shapes)
    // a threshold self-join shape harvests the same recommendation
    // (both sides resolve to one (base, column) pair — one shape)
    val selfJoin = emb.as("a").join(emb.as("b"),
      graft.functions.Functions.cosineSim(
        col("a.embedding"), col("b.embedding")) > lit(0.9) &&
        col("a.vec_id") < col("b.vec_id"))
    assert(MvAdvisor.analyzeAnn(selfJoin).map(_.embCol) ===
      Seq("embedding"))
    val rec = MvAdvisor.recommendIndexes(
      shapes ++ MvAdvisor.analyzeAnn(selfJoin)) match {
      case Seq(one) => one
      case other    => fail(s"expected ONE folded recommendation: $other")
    }
    assert(rec.queriesAnswered === 2)
    assert(rec.storeName === "advisor_ivf_embeddings_parquet_embedding")
    // materialize builds the stored incremental IVF index; probing all
    // leaves is exact — the advisor-built index answers the workload
    val root = tempDir("graft-advisor-ivf") + "/store"
    rec.materialize(spark, root, nCells = 4): Unit
    val got = IvfStore.probe(spark, root, qvec, k = 5, nProbe = 64)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    val want = dash.collect().map(_.getLong(0)).toSeq
    assert(got === want, "advisor-built index must answer the top-k")
    // non-vector workloads harvest nothing
    assert(MvAdvisor.analyzeAnn(q1(spark)).isEmpty)
    // a column behind a CAST still harvests (the walker is
    // full-subtree, not direct-children)
    val castDash = emb.select(
      graft.functions.Functions.cosineSim(
        col("embedding").cast("array<float>"), qCol).as("cos"))
    assert(MvAdvisor.analyzeAnn(castDash).map(_.embCol) ===
      Seq("embedding"))
  }

  test("maintainHook keeps EVERY advisor view of a source fresh through maintainedSink — including one registered after the sink was built") {
    import spark.implicits._
    import graft.sources.IcebergSource
    import graft.streaming.MaterializedAgg
    val dropDir = tempDir("graft-mnt-hook-drop")
    val checkpoint = tempDir("graft-mnt-hook-ckpt")
    val tbl = tempDir("graft-mnt-hook-src") + "/table"
    val mv1Root = tempDir("graft-mnt-hook-mv1") + "/mv"
    val mv2Root = tempDir("graft-mnt-hook-mv2") + "/mv"
    val seedPath = tempDir("graft-mnt-hook-seed") + "/seed.parquet"
    (0L until 12L).map(i => (s"k${i % 3}", s"g${i % 2}", i))
      .toDF("k", "g", "v").write.mode("overwrite").parquet(seedPath)
    graft.sources.IcebergWriter.append(spark, tbl,
      spark.read.parquet(seedPath), None, 1000L, formatVersion = 2)
    def d1(s: SparkSession) = IcebergSource.read(s, tbl)
      .groupBy(col("k")).agg(sum(col("v")).as("sv"))
    def d2(s: SparkSession) = IcebergSource.read(s, tbl)
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
    def recOf(df: DataFrame) = MvAdvisor
      .recommend(MvAdvisor.analyze(df).flatMap(_.toOption)).head
    val rec1 = recOf(d1(spark))
    try {
      rec1.materialize(spark, mv1Root): Unit
      // ONE hook for the whole source — not one per view
      var tick = 1000L
      val clock = () => { tick += 1000L; tick }
      val sink = MaterializedAgg.maintainedSink(
        tbl, MvAdvisor.maintainHook(tbl), clock = clock)
      val docs = (12L until 24L).map(i => (s"k${i % 3}", s"g${i % 2}", i))
        .toDF("k", "g", "v")
      docs.filter($"v" < 18).write.parquet(s"$dropDir/b0")
      def run(): Unit = {
        val q = spark.readStream.schema(docs.schema)
          .parquet(s"$dropDir/*/")
          .writeStream.option("checkpointLocation", checkpoint)
          .foreachBatch(sink)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination(120000): Unit finally q.stop()
      }
      run()
      def stored(name: String) = {
        val d = MvCatalog.lookup(tbl).find(_.name == name).get
        spark.read.parquet(d.mvPath)
      }
      def pairs(df: DataFrame, key: String) = df.orderBy(col(key))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(pairs(stored(rec1.mvName), "k") === pairs(d1(spark), "k"),
        "the pre-registered view must track the first batch")
      // a SECOND view registers AFTER the sink was built — the
      // base-scoped hook picks it up with no sink re-plumbing
      val rec2 = recOf(d2(spark))
      rec2.materialize(spark, mv2Root): Unit
      docs.filter($"v" >= 18).write.parquet(s"$dropDir/b1")
      run()
      assert(IcebergSource.read(spark, tbl).count() === 24)
      assert(pairs(stored(rec1.mvName), "k") === pairs(d1(spark), "k"))
      assert(pairs(stored(rec2.mvName), "g") === pairs(d2(spark), "g"),
        "the later-registered view must join the maintenance loop")
    } finally MvCatalog.unregister(tbl)
  }

  test("shared-window refresh: two rollup views on one base refresh from ONE pinned window with zero extra metadata loads") {
    import spark.implicits._
    import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}
    val tbl = tempDir("graft-shared-window") + "/table"
    val r1Root = tempDir("graft-shared-window-mv1") + "/mv"
    val r2Root = tempDir("graft-shared-window-mv2") + "/mv"
    IcebergWriter.append(spark, tbl,
      Seq(("a", "x", 10L), ("a", "y", 20L), ("b", "x", 5L))
        .toDF("k", "g", "v"),
      None, 1000L, formatVersion = 2)
    // INCOMPARABLE grains ({k} vs {g}) so clustering yields TWO rollups
    def d1(s2: SparkSession) = IcebergSource.read(s2, tbl)
      .groupBy(col("k")).agg(sum(col("v")).as("sv"))
    def d2(s2: SparkSession) = IcebergSource.read(s2, tbl)
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
    val recs = MvAdvisor.recommend(
      (MvAdvisor.analyze(d1(spark)) ++ MvAdvisor.analyze(d2(spark)))
        .flatMap(_.toOption))
    assert(recs.length === 2, recs)
    val rk = recs.find(_.keys == Seq("k")).getOrElse(fail(s"no k rollup: $recs"))
    val rg = recs.find(_.keys == Seq("g")).getOrElse(fail(s"no g rollup: $recs"))
    try {
      rk.materialize(spark, r1Root): Unit
      rg.materialize(spark, r2Root): Unit
      val wm = MvCatalog.lookup(tbl).head.watermark.get
      IcebergWriter.append(spark, tbl,
        Seq(("a", "x", 100L), ("c", "z", 7L)).toDF("k", "g", "v"),
        None, 2000L)
      // the sweep's economics, isolated: ONE meta load + ONE window
      // read serve BOTH views' pinned steps — zero loads inside them
      val meta = IcebergMeta.load(tbl)
      val cur = meta.currentSnapshot.get.id
      val w = IcebergSource.readChangelog(spark, tbl,
        fromSnapshotId = wm, toSnapshotId = Some(cur),
        preloaded = Some(meta))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      w.count(): Unit
      val loads0 = IcebergMeta.loadCount.get()
      assert(rk.refreshStepPinned(spark, r1Root,
        Some((w, cur, meta))) === Some(cur))
      assert(rg.refreshStepPinned(spark, r2Root,
        Some((w, cur, meta))) === Some(cur))
      w.unpersist(blocking = false): Unit
      assert(IcebergMeta.loadCount.get() === loads0,
        "pinned refresh steps must plan every read against the ONE " +
          "preloaded metadata")
      // both refreshed stores equal their direct recomputes
      def stored(name: String) = {
        val d = MvCatalog.lookup(tbl).find(_.name == name).get
        spark.read.parquet(d.mvPath)
      }
      assert(stored(rk.mvName).orderBy(col("k"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
        d1(spark).orderBy(col("k"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
      assert(stored(rg.mvName).orderBy(col("g"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
        d2(spark).orderBy(col("g"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
      // maintainAll drives the same shared-window path end to end
      IcebergWriter.append(spark, tbl,
        Seq(("b", "y", 1L)).toDF("k", "g", "v"), None, 3000L)
      val head3 = IcebergMeta.load(tbl).currentSnapshot.get.id
      val swept = MvAdvisor.maintainAll(spark)
        .filter(r => Set(rk.mvName, rg.mvName)(r.name))
      assert(swept.forall(r =>
        r.stale && r.appliedSnapshot === Some(head3)), swept)
    } finally MvCatalog.unregister(tbl)
  }

  test("dedup index advisor: a minhash workload recommends the stored MinHash index; the built index answers incremental dedup") {
    import graft.operators.TextOps
    val doc = spark.read.parquet(
      SparkTestBase.Sf0001 + "/documents.parquet")
    val corpusPath = tempDir("graft-advisor-mh-base") + "/corpus.parquet"
    doc.filter(col("doc_id") % 10 =!= 9)
      .write.mode("overwrite").parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    // the workload: LSH signature projection over the corpus text
    val wl = corpus.select(col("doc_id"),
      TextOps.minhashSignatureArray(TextOps.shingleHashes(
        TextOps.shingles(TextOps.tokens(col("text"))))).as("sig"))
    val shapes = MvAdvisor.analyzeDedup(wl)
    assert(shapes.map(_.textCol) === Seq("text"), shapes)
    assert(shapes.head.basePath.endsWith("corpus.parquet"), shapes)
    // the same workload expressed in SQL (the wire face compiles SQL —
    // word_shingles/array_xxhash64/minhash_signature are SQL-registered)
    corpus.createOrReplaceTempView("advisor_mh_corpus")
    val sqlShapes = MvAdvisor.analyzeDedup(spark.sql(
      "SELECT doc_id, minhash_signature(array_xxhash64(word_shingles(" +
        "split(lower(text), '\\\\s+'), 3)), 64) AS sig " +
        "FROM advisor_mh_corpus"))
    assert(sqlShapes === shapes, sqlShapes)
    val rec = MvAdvisor.recommendDedupIndexes(shapes ++ sqlShapes).head
    assert(rec.queriesAnswered === 2)
    assert(rec.storeName === "advisor_minhash_corpus_parquet_text")
    // materialize builds the stored index; the held-out batch dedupes
    // against it incrementally — the planted cross pair (89, 114) with
    // the SMALLER id in the increment must surface
    val root = tempDir("graft-advisor-mh") + "/index"
    val idx = rec.materialize(spark, root)
    val batch = doc.filter(col("doc_id") % 10 === 9)
    val pairs = graft.queries.DedupQueries
      .incrementalPairs(spark, batch, idx, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.exists(p => Set(p._1, p._2) == Set(89L, 114L)), pairs)
    // non-text workloads harvest nothing
    assert(MvAdvisor.analyzeDedup(q1(spark)).isEmpty)
    graft.engine.PersistScope.releaseAll()
  }

  test("materialize closes the loop: the advisor-built MVs make the workload rewrite and match") {
    val shapes = Seq(q1(spark), q2(spark), q3(spark))
      .flatMap(MvAdvisor.analyze).flatMap(_.toOption)
    val recs = MvAdvisor.recommend(shapes)
    val dir = new java.io.File(basePath).getParent
    val ratios = recs.map { r =>
      r -> r.materialize(spark, s"$dir/adv_${r.kind}.parquet")
    }
    // 7 base rows -> 5 (k,g) groups and 6 (k,g,y) pairs: both compress
    ratios.foreach { case (r, ratio) =>
      assert(ratio > 0 && ratio < 1, s"${r.kind} ratio $ratio")
    }
    def scanPaths(df: DataFrame): Seq[String] =
      df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toUri.getPath)
      }.flatten
    for ((q, mv) <- Seq(
        (q1 _, "adv_rollup"), (q2 _, "adv_rollup"),
        (q3 _, "adv_multiplicity"))) {
      val rewritten = q(s2)
      assert(scanPaths(rewritten).exists(_.contains(mv)),
        s"expected $mv scan, got ${scanPaths(rewritten)}")
      assert(!scanPaths(rewritten).exists(_.contains("wbase")))
      assert(rewritten.collect().map(_.toSeq).toSeq ===
        q(spark).collect().map(_.toSeq).toSeq,
        "rewritten answer must equal the direct plan's")
    }
  }

  test("CUBE workloads are advisable: the PreAggExpand grain aggregate harvests, and the built rollup answers the cube") {
    // PreAggExpand plants Aggregate_grain(scan) inside every cube plan —
    // exactly the shape analyze() harvests — so dashboard cubes feed the
    // advisor without special-casing grouping sets anywhere
    def cubeQ(s: SparkSession): DataFrame = s.read.parquet(basePath)
      .cube(col("k"), col("g"))
      .agg(sum(col("y")).as("sy"), count(lit(1)).as("n"))
      .orderBy(col("k").asc_nulls_first, col("g").asc_nulls_first)
    val shapes = MvAdvisor.analyze(cubeQ(spark)).flatMap(_.toOption)
    assert(shapes.size === 1, s"expected ONE harvested grain shape: $shapes")
    val s = shapes.head
    assert(s.groupCols.toSet === Set("k", "g") && s.sums === Set("y") &&
      s.countStar, s"grain shape drifted: $s")

    val recs = MvAdvisor.recommend(shapes)
    assert(recs.size === 1 && recs.head.kind === "rollup")
    val dir = new java.io.File(basePath).getParent
    recs.head.materialize(spark, s"$dir/adv_cube_rollup.parquet")
    def scanPaths(df: DataFrame): Seq[String] =
      df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toUri.getPath)
      }.flatten
    val rewritten = cubeQ(s2)
    // any advisor-built rollup on the base may win cost selection; the
    // pinned property is: the cube reads an MV, never the base
    assert(scanPaths(rewritten).exists(_.contains("adv_")),
      s"cube did not route to an advisor MV: ${scanPaths(rewritten)}")
    assert(!scanPaths(rewritten).exists(_.contains("wbase")))
    assert(rewritten.collect().map(_.toSeq).toSeq ===
      cubeQ(spark).collect().map(_.toSeq).toSeq)
  }
}
