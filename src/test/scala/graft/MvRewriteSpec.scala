package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.plans.{JoinMvDef, MvCatalog, MvDef, MvMeasure}

/** plans.MvRewrite: the aggregate-rollup rewrite answers matching queries
  * from the stored MV (scan-location pinned), preserves results exactly,
  * and REFUSES every shape it cannot derive — non-key filters, distinct
  * aggregates, unregistered measures, disabled sessions. Uses its own
  * synthetic base (nulls in the measure column, multiple groups) rather
  * than a fixture, so null-aware avg/count derivations are actually
  * exercised.
  */
class MvRewriteSpec extends SparkTestBase with BeforeAndAfterAll {

  private var basePath: String = _
  private var mvPath: String = _
  private var factPath: String = _
  private var dimPath: String = _
  private var jmvPath: String = _
  // the rewrite-enabled session; built in beforeAll
  private var s2: SparkSession = _

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    val dir = tempDir("graft-mv-spec")
    basePath = s"$dir/base.parquet"
    mvPath = s"$dir/mv.parquet"
    import spark.implicits._
    // x: double with nulls (one group all-null), y: long, keys (k, g)
    Seq(
      ("a", "p", Some(1.5), 10L), ("a", "p", Some(2.5), 20L),
      ("a", "q", None, 30L), ("a", "q", Some(4.0), 40L),
      ("b", "p", Some(-1.0), 50L), ("b", "q", None, 60L),
      ("b", "q", None, 70L), ("c", "p", Some(0.25), 80L)
    ).toDF("k", "g", "x", "y").write.mode("overwrite").parquet(basePath)

    val base = spark.read.parquet(basePath)
    base.groupBy($"k", $"g")
      .agg(
        sum($"y").as("s_y"), count($"y").as("c_y"),
        sum($"x").as("s_x"), count($"x").as("c_x"),
        min($"x").as("mn_x"), max($"x").as("mx_x"),
        count(lit(1)).as("n")
      )
      .write.mode("overwrite").parquet(mvPath)

    MvCatalog.register(MvDef(
      name = "spec_rollup",
      basePath = basePath,
      keys = Seq("k", "g"),
      measures = Map(
        "y" -> MvMeasure(sum = Some("s_y"), cnt = Some("c_y")),
        "x" -> MvMeasure(sum = Some("s_x"), cnt = Some("c_x"),
          min = Some("mn_x"), max = Some("mx_x"))
      ),
      countStar = Some("n"),
      mvPath = mvPath,
      mvSchema = spark.read.parquet(mvPath).schema
    ))

    // join-MV fixture: fact(fk, jk, v, tag) ⋈ dim(dk, name, tag) on
    // jk = dk, stored at ROW grain. Both sides expose "tag" (the
    // ambiguity refusal case); the dim's "extra" column is deliberately
    // NOT stored (the unresolvable-column refusal case).
    factPath = s"$dir/fact.parquet"
    dimPath = s"$dir/dim.parquet"
    jmvPath = s"$dir/jmv.parquet"
    Seq(
      (1L, "a", 10L, "ft1"), (2L, "a", 20L, "ft2"),
      (3L, "b", 30L, "ft3"), (4L, "c", 40L, "ft4"),
      (5L, "b", 30L, "ft5")
    ).toDF("fk", "jk", "v", "tag").write.mode("overwrite").parquet(factPath)
    Seq(
      ("a", "alpha", "dt1", "e1"), ("b", "beta", "dt2", "e2"),
      ("d", "delta", "dt3", "e3")
    ).toDF("dk", "name", "tag", "extra")
      .write.mode("overwrite").parquet(dimPath)
    val fact = spark.read.parquet(factPath)
    val dim = spark.read.parquet(dimPath)
    fact.as("f").join(dim.as("d"), col("f.jk") === col("d.dk"), "inner")
      .select(col("f.fk"), col("f.jk"), col("f.v"), col("f.tag"),
        col("d.dk"), col("d.name"))
      .write.mode("overwrite").parquet(jmvPath)
    MvCatalog.registerJoin(JoinMvDef(
      name = "spec_join_view",
      factPath = factPath,
      dimPath = dimPath,
      joinKeys = Seq(("jk", "dk")),
      mvPath = jmvPath,
      mvSchema = spark.read.parquet(jmvPath).schema
    ))

    s2 = spark.newSession()
    s2.conf.set("spark.graft.mv.rewrite.enabled", "true")
  }

  override protected def afterAll(): Unit = {
    MvCatalog.unregister(basePath)
    MvCatalog.unregisterJoin(factPath, dimPath)
    super.afterAll()
  }

  /** Root paths of every file scan in the PRE-AQE physical plan (AQE wraps
    * executedPlan in an opaque adaptive node; the static plan is the one
    * the rewrite shapes).
    */
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toUri.getPath)
    }.flatten

  private def readsMv(df: DataFrame): Boolean = {
    val paths = scanPaths(df)
    paths.exists(_.contains("mv.parquet")) &&
      !paths.exists(_.contains("base.parquet"))
  }

  private def query(s: SparkSession): DataFrame = {
    val b = s.read.parquet(basePath)
    b.filter(col("g") === "q")
      .groupBy(col("k"))
      .agg(
        sum(col("y")).as("sy"),
        count(lit(1)).as("n"),
        count(col("x")).as("cx"),
        min(col("x")).as("mn"),
        max(col("x")).as("mx"),
        avg(col("x")).as("av")
      )
      .orderBy(col("k"))
  }

  test("rewrite fires: scans the MV, results identical to the direct plan") {
    val rewritten = query(s2)
    assert(readsMv(rewritten), s"expected MV scan, got ${scanPaths(rewritten)}")
    val direct = query(spark)
    assert(!readsMv(direct))
    assert(rewritten.schema === direct.schema)
    val r = rewritten.collect().map(_.toSeq)
    val d = direct.collect().map(_.toSeq)
    // exact for long sum/counts/min/max; the avg column is a double
    // derived sum/cnt both ways here (same arithmetic), and the all-null
    // group ("b","q") must yield avg NULL, cx 0 through the rollup too
    assert(r.toSeq === d.toSeq)
    val bRow = r.find(_.head == "b").get
    assert(bRow(3) === 0L && bRow(6) == null)
  }

  test("CUBE answers from the MV: PreAggExpand + MvRewrite compose") {
    // PreAggExpand plants a finest-grain (k, g) aggregate below the
    // grouping-sets Expand; MvRewrite then answers THAT aggregate from
    // the stored rollup — so the whole cube runs without touching the
    // base table. At 100 TB this composition is the difference between
    // a dashboard cube costing a keys-sized MV scan and a full-corpus
    // expand
    def cube(s: SparkSession): DataFrame = s.read.parquet(basePath)
      .cube(col("k"), col("g"))
      .agg(sum(col("y")).as("sy"), count(lit(1)).as("n"),
        grouping(col("k")).cast("int").as("gk"))
      .orderBy(col("gk"), col("k").asc_nulls_first, col("g").asc_nulls_first)
    val rewritten = cube(s2)
    assert(readsMv(rewritten),
      s"cube did not route to the MV: ${scanPaths(rewritten)}")
    val direct = cube(spark)
    assert(!readsMv(direct))
    assert(rewritten.schema === direct.schema)
    assert(rewritten.collect().map(_.toSeq).toSeq ===
      direct.collect().map(_.toSeq).toSeq)
  }

  test("aggregate-over-join answers from the MV: EagerAggJoin + MvRewrite compose") {
    // with both rules on, EagerAggJoin plants a grain aggregate over the
    // fact side of the join, and MvRewrite answers THAT from the stored
    // rollup — the join's fact input becomes a keys-sized MV scan. At
    // 100 TB: the dominant join shuffle drops to the dimension tables'
    // scale without the user rewriting anything
    val dimDf = spark.createDataFrame(Seq(
      ("a", "grpA"), ("b", "grpB"), ("c", "grpA"), ("z", "grpZ")
    )).toDF("jk", "grp")
    dimDf.createOrReplaceGlobalTempView("eager_mv_dim")
    def q(s: SparkSession): DataFrame = {
      val d = s.table("global_temp.eager_mv_dim")
      s.read.parquet(basePath)
        .join(d, col("k") === col("jk"))
        .groupBy(col("grp"))
        .agg(sum(col("y")).as("sy"), count(lit(1)).as("n"))
        .orderBy(col("grp"))
    }
    val s3 = spark.newSession()
    s3.conf.set("spark.graft.mv.rewrite.enabled", "true")
    s3.conf.set("spark.graft.optimizer.eagerAggJoin", "true")
    val rewritten = q(s3)
    assert(readsMv(rewritten),
      s"join query did not route its fact side to the MV: ${scanPaths(rewritten)}")
    val direct = q(spark)
    assert(!readsMv(direct))
    assert(rewritten.schema === direct.schema)
    assert(rewritten.collect().map(_.toSeq).toSeq ===
      direct.collect().map(_.toSeq).toSeq)
  }

  test("count(*) over an empty selection is 0 through the MV, not null") {
    val q = s2.read.parquet(basePath)
      .filter(col("g") === "zzz")
      .agg(count(lit(1)).as("n"))
    assert(readsMv(q))
    assert(q.collect().head.getLong(0) === 0L)
  }

  test("global (no group-by) aggregate rewrites and matches") {
    val q = s2.read.parquet(basePath)
      .agg(sum(col("y")).as("sy"), count(lit(1)).as("n"))
    assert(readsMv(q))
    assert(q.collect().head.toSeq === Seq(360L, 8L))
  }

  test("non-key filter disqualifies: the MV has no base rows to re-filter") {
    val q = s2.read.parquet(basePath)
      .filter(col("y") > 20L)
      .groupBy(col("k")).agg(sum(col("y")).as("sy"))
    assert(!readsMv(q) && scanPaths(q).exists(_.contains("base.parquet")))
  }

  test("distinct aggregate over a NON-KEY column disqualifies: the rollup has no row grain for it") {
    // (the KEY-column case rewrites — see the multiplicity-MV test below)
    val q = s2.read.parquet(basePath)
      .groupBy(col("k")).agg(countDistinct(col("y")).as("dy"))
    assert(!readsMv(q))
  }

  test("unregistered aggregate function (stddev) disqualifies") {
    val q = s2.read.parquet(basePath)
      .groupBy(col("k")).agg(stddev(col("x")).as("sd"))
    assert(!readsMv(q))
  }

  test("grouping by a non-key column disqualifies") {
    val q = s2.read.parquet(basePath)
      .groupBy(col("y")).agg(count(lit(1)).as("n"))
    assert(!readsMv(q))
  }

  test("default session never rewrites: the conf gate is opt-in") {
    assert(!readsMv(query(spark)))
  }

  test("multiple MVs per base: the first candidate that derives the query wins; a query only the second can answer routes there") {
    import spark.implicits._
    // a SECOND rollup on the same base, keys (k) only, carrying the y
    // min/max measures the first MV lacks
    val mv2Path = s"${new java.io.File(basePath).getParent}/mv2.parquet"
    val base = spark.read.parquet(basePath)
    base.groupBy($"k")
      .agg(min($"y").as("mn_y"), max($"y").as("mx_y"), count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(mv2Path)
    MvCatalog.register(MvDef(
      name = "spec_rollup_minmax",
      basePath = basePath,
      keys = Seq("k"),
      measures = Map("y" -> MvMeasure(min = Some("mn_y"), max = Some("mx_y"))),
      countStar = Some("n"),
      mvPath = mv2Path,
      mvSchema = spark.read.parquet(mv2Path).schema
    ))
    // the original query still routes to the FIRST candidate
    assert(scanPaths(query(s2)).exists(p =>
      p.contains("mv.parquet") && !p.contains("mv2")))
    // a min/max-of-y query bails on MV1 (no y extrema declared) and the
    // candidate walk lands it on MV2
    def q2(s: SparkSession) = s.read.parquet(basePath)
      .groupBy(col("k"))
      .agg(min(col("y")).as("mn"), max(col("y")).as("mx"))
      .orderBy(col("k"))
    val r = q2(s2)
    assert(scanPaths(r).exists(_.contains("mv2.parquet")),
      s"expected mv2 scan, got ${scanPaths(r)}")
    assert(r.collect().map(_.toSeq).toSeq ===
      q2(spark).collect().map(_.toSeq).toSeq)
    // a query NEITHER can answer (grouping by a non-key of both after
    // the g-keyed MV1 bails on the measure, the k-keyed MV2 on the key)
    val neither = s2.read.parquet(basePath)
      .groupBy(col("g")).agg(min(col("y")).as("mn"))
    assert(scanPaths(neither).exists(_.contains("base.parquet")))
    // re-registering a NAME replaces that def in place, not the list:
    // point the second def at a fresh path and the rewrite follows it
    val mv3Path = s"${new java.io.File(basePath).getParent}/mv3.parquet"
    spark.read.parquet(mv2Path).write.mode("overwrite").parquet(mv3Path)
    MvCatalog.register(MvDef(
      name = "spec_rollup_minmax", basePath = basePath, keys = Seq("k"),
      measures = Map("y" -> MvMeasure(min = Some("mn_y"), max = Some("mx_y"))),
      countStar = Some("n"), mvPath = mv3Path,
      mvSchema = spark.read.parquet(mv3Path).schema))
    assert(scanPaths(q2(s2)).exists(_.contains("mv3.parquet")))
    assert(MvCatalog.describe().count(_.basePath == basePath) === 2,
      "replace-by-name must not grow the candidate list")
  }

  test("cost-based candidate selection: a keys-sized rollup beats an earlier-registered multiplicity store when both derive") {
    import spark.implicits._
    // fresh base so this test owns its candidate list
    val dir = tempDir("graft-mv-cost")
    val bPath = s"$dir/costbase.parquet"
    (1 to 400).map(i => (s"g${i % 4}", i.toLong))
      .toDF("k", "v").write.mode("overwrite").parquet(bPath)
    val b = spark.read.parquet(bPath)
    // the FINE-GRAINED multiplicity store registers FIRST (399+ rows)
    val multPath = s"$dir/mult.parquet"
    b.groupBy($"k", $"v").agg(count(lit(1)).as("ref"))
      .write.mode("overwrite").parquet(multPath)
    MvCatalog.register(MvDef(
      name = "cost_mult", basePath = bPath, keys = Seq("k", "v"),
      measures = Map.empty, countStar = Some("ref"), mvPath = multPath,
      mvSchema = spark.read.parquet(multPath).schema,
      rows = Some(spark.read.parquet(multPath).count())))
    // the 4-row rollup registers SECOND
    val rollPath = s"$dir/roll.parquet"
    b.groupBy($"k").agg(sum($"v").as("s_v"), count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(rollPath)
    MvCatalog.register(MvDef(
      name = "cost_roll", basePath = bPath, keys = Seq("k"),
      measures = Map("v" -> MvMeasure(sum = Some("s_v"))),
      countStar = Some("n"), mvPath = rollPath,
      mvSchema = spark.read.parquet(rollPath).schema,
      rows = Some(spark.read.parquet(rollPath).count())))
    try {
      // a non-DISTINCT dashboard BOTH candidates derive: registration
      // order would serve the 100x multiplicity store; the cost rule
      // routes it to the 4-row rollup
      def dash(s: SparkSession) = s.read.parquet(bPath)
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("s"))
        .orderBy(col("k"))
      val r = dash(s2)
      assert(scanPaths(r).exists(_.contains("roll.parquet")),
        s"expected the smaller rollup scan, got ${scanPaths(r)}")
      assert(r.collect().map(_.toSeq).toSeq ===
        dash(spark).collect().map(_.toSeq).toSeq)
      // derivation still trumps cost: count(DISTINCT v) bails on the
      // small rollup and lands on the multiplicity store
      def dq(s: SparkSession) = s.read.parquet(bPath)
        .groupBy(col("k")).agg(countDistinct(col("v")).as("nd"))
        .orderBy(col("k"))
      val rd = dq(s2)
      assert(scanPaths(rd).exists(_.contains("mult.parquet")),
        s"expected the multiplicity scan, got ${scanPaths(rd)}")
      assert(rd.collect().map(_.toSeq).toSeq ===
        dq(spark).collect().map(_.toSeq).toSeq)
    } finally MvCatalog.unregister(bPath)
  }

  test("DISTINCT over KEY columns rewrites: the multiplicity-MV deployment; non-key and expression arguments refuse") {
    import spark.implicits._
    // the multiplicity table (refreshDistinct's level-1 storage shape) on
    // the same base: keys (k, y), refcount as countStar. Registered as a
    // LATER candidate — countDistinct(y) must bail on every rollup whose
    // keys lack y and land here via the candidate walk.
    val mvdPath = s"${new java.io.File(basePath).getParent}/mvd.parquet"
    spark.read.parquet(basePath).groupBy($"k", $"y")
      .agg(count(lit(1)).as("ref"))
      .write.mode("overwrite").parquet(mvdPath)
    MvCatalog.register(MvDef(
      name = "spec_multiplicity",
      basePath = basePath,
      keys = Seq("k", "y"),
      measures = Map.empty,
      countStar = Some("ref"),
      mvPath = mvdPath,
      mvSchema = spark.read.parquet(mvdPath).schema))
    def q(s: SparkSession) = s.read.parquet(basePath)
      .groupBy(col("k"))
      .agg(
        countDistinct(col("y")).as("dy"),
        sum_distinct(col("y")).as("sy"),
        count(lit(1)).as("n"))
      .orderBy(col("k"))
    val r = q(s2)
    assert(scanPaths(r).exists(_.contains("mvd.parquet")),
      s"expected multiplicity scan, got ${scanPaths(r)}")
    assert(!scanPaths(r).exists(_.contains("base.parquet")))
    assert(r.collect().map(_.toSeq).toSeq ===
      q(spark).collect().map(_.toSeq).toSeq)
    // approx_count_distinct over a key column rewrites bit-identically:
    // HLL++ registers are duplicate-insensitive, so the sketch over the
    // MV's distinct pairs equals the sketch over the base rows
    def qApprox(s: SparkSession) = s.read.parquet(basePath)
      .groupBy(col("k")).agg(approx_count_distinct(col("y")).as("ady"))
      .orderBy(col("k"))
    val ra = qApprox(s2)
    assert(scanPaths(ra).exists(_.contains("mvd.parquet")), scanPaths(ra))
    assert(ra.collect().map(_.toSeq).toSeq ===
      qApprox(spark).collect().map(_.toSeq).toSeq)
    // ...but over a non-key column it refuses like any other measure
    val raNk = s2.read.parquet(basePath)
      .groupBy(col("k")).agg(approx_count_distinct(col("x")).as("adx"))
    assert(scanPaths(raNk).exists(_.contains("base.parquet")))
    // multi-argument DISTINCT over key columns rewrites too: the MV
    // grain preserves exactly the distinct (k, y) combinations
    def qMulti(s: SparkSession) = s.read.parquet(basePath)
      .agg(countDistinct(col("k"), col("y")).as("dky"))
    val rm = qMulti(s2)
    assert(scanPaths(rm).exists(_.contains("mvd.parquet")), scanPaths(rm))
    assert(rm.collect().head.getLong(0) ===
      qMulti(spark).collect().head.getLong(0))
    // DISTINCT over a non-key of EVERY candidate still refuses
    val nonKey = s2.read.parquet(basePath)
      .groupBy(col("k")).agg(countDistinct(col("x")).as("dx"))
    assert(scanPaths(nonKey).exists(_.contains("base.parquet")))
    // DISTINCT over an EXPRESSION of a key refuses (bare columns only —
    // the MV stores y's values, not y+1's)
    val exprArg = s2.read.parquet(basePath)
      .groupBy(col("k")).agg(countDistinct(col("y") + 1).as("dy1"))
    assert(scanPaths(exprArg).exists(_.contains("base.parquet")))
  }

  // ---- join-view rewrite (row-grain JoinMvDef) ----

  private def readsJoinMv(df: DataFrame): Boolean = {
    val paths = scanPaths(df)
    paths.exists(_.contains("jmv.parquet")) &&
      !paths.exists(p => p.contains("fact.parquet") || p.contains("dim.parquet"))
  }

  private def joinQuery(s: SparkSession): DataFrame = {
    val f = s.read.parquet(factPath)
    val d = s.read.parquet(dimPath)
    f.join(d, col("jk") === col("dk"), "inner")
      .filter(col("name") =!= "delta")
      .groupBy(col("jk"))
      .agg(
        sum(col("v")).as("sv"),
        count(lit(1)).as("n"),
        // DISTINCT: derivable at row grain, the rollup path's hard refusal
        countDistinct(col("v")).as("dv"),
        max(col("name")).as("mx")
      )
      .orderBy(col("jk"))
  }

  test("join rewrite fires: scans the join MV only, results identical incl. countDistinct") {
    val rewritten = joinQuery(s2)
    assert(readsJoinMv(rewritten),
      s"expected join-MV scan, got ${scanPaths(rewritten)}")
    val direct = joinQuery(spark)
    assert(!readsJoinMv(direct))
    assert(rewritten.schema === direct.schema)
    assert(rewritten.collect().map(_.toSeq).toSeq ===
      direct.collect().map(_.toSeq).toSeq)
  }

  test("join rewrite: an extra join conjunct beyond the declared keys re-applies as a filter") {
    def q(s: SparkSession) = {
      val f = s.read.parquet(factPath)
      val d = s.read.parquet(dimPath)
      f.join(d, col("jk") === col("dk") && col("v") > 15L, "inner")
        .groupBy(col("name")).agg(count(lit(1)).as("n"))
        .orderBy(col("name"))
    }
    val rewritten = q(s2)
    assert(readsJoinMv(rewritten), s"got ${scanPaths(rewritten)}")
    assert(rewritten.collect().map(_.toSeq).toSeq ===
      q(spark).collect().map(_.toSeq).toSeq)
  }

  test("join rewrite refusals: outer join, missing key equality, ambiguous name, unstored column, non-deterministic filter") {
    val f = s2.read.parquet(factPath)
    val d = s2.read.parquet(dimPath)
    // LEFT join: the MV stores inner rows only
    val outer = f.join(d, col("jk") === col("dk"), "left")
      .groupBy(col("jk")).agg(count(col("name")).as("n"))
    assert(!readsJoinMv(outer))
    // join NOT on the declared equality: those pairs were never stored
    val wrongKey = f.as("f").join(d.as("d"), col("f.tag") === col("d.tag"))
      .groupBy(col("f.jk")).agg(count(lit(1)).as("n"))
    assert(!readsJoinMv(wrongKey))
    // "tag" exists on BOTH sides and in the MV schema, but the stored
    // column's side is unknowable -> bail even though the name resolves
    val ambiguous = f.as("f").join(d.as("d"), col("f.jk") === col("d.dk"))
      .groupBy(col("f.jk")).agg(max(col("f.tag")).as("mt"))
    assert(!readsJoinMv(ambiguous))
    // dim's "extra" is not a stored MV column
    val unstored = f.join(d, col("jk") === col("dk"))
      .filter(col("extra") === "e1")
      .groupBy(col("jk")).agg(count(lit(1)).as("n"))
    assert(!readsJoinMv(unstored))
    // a non-deterministic filter must re-evaluate per BASE row (a
    // vacuous rand() >= 0 predicate gets constant-folded away before the
    // rule runs — this one survives the optimizer)
    val nondet = f.join(d, col("jk") === col("dk"))
      .filter(rand(7) < 0.5)
      .groupBy(col("jk")).agg(count(lit(1)).as("n"))
    assert(!readsJoinMv(nondet))
  }

  test("join rewrite: default session never rewrites") {
    assert(!readsJoinMv(joinQuery(spark)))
  }

  test("HAVING commutes: the filter above the aggregate survives while the aggregate underneath rewrites") {
    def q(s: SparkSession) = s.read.parquet(basePath)
      .groupBy(col("k"))
      .agg(sum(col("y")).as("sy"), count(lit(1)).as("n"))
      .filter(col("sy") > 100L) // HAVING — parent of the Aggregate
      .orderBy(col("k"))
    val r = q(s2)
    assert(readsMv(r), s"HAVING must not block the rewrite: ${scanPaths(r)}")
    assert(r.collect().map(_.toSeq).toSeq ===
      q(spark).collect().map(_.toSeq).toSeq)
  }

  test("multiple join MVs per pair: a query needing a column only the second stores routes there") {
    import spark.implicits._
    // a SECOND join view on the same (fact, dim) pair storing the dim's
    // "extra" column the first one deliberately omits
    val jmv2Path = s"${new java.io.File(jmvPath).getParent}/jmv2.parquet"
    val fact = spark.read.parquet(factPath)
    val dim = spark.read.parquet(dimPath)
    fact.as("f").join(dim.as("d"), col("f.jk") === col("d.dk"), "inner")
      .select(col("f.fk"), col("f.jk"), col("f.v"), col("d.dk"),
        col("d.name"), col("d.extra"))
      .write.mode("overwrite").parquet(jmv2Path)
    MvCatalog.registerJoin(JoinMvDef(
      name = "spec_join_view_extra", factPath = factPath, dimPath = dimPath,
      joinKeys = Seq(("jk", "dk")), mvPath = jmv2Path,
      mvSchema = spark.read.parquet(jmv2Path).schema))
    // the original query still routes to the FIRST candidate
    assert(scanPaths(joinQuery(s2)).exists(p =>
      p.contains("jmv.parquet") && !p.contains("jmv2")))
    // a query filtering on "extra" bails on candidate 1 (unstored
    // column) and lands on candidate 2
    def q2(s: SparkSession) = {
      val f = s.read.parquet(factPath)
      val d = s.read.parquet(dimPath)
      f.join(d, col("jk") === col("dk"), "inner")
        .filter(col("extra") =!= "e3")
        .groupBy(col("name")).agg(sum(col("v")).as("sv"))
        .orderBy(col("name"))
    }
    val r = q2(s2)
    assert(scanPaths(r).exists(_.contains("jmv2.parquet")),
      s"expected second join MV, got ${scanPaths(r)}")
    assert(r.collect().map(_.toSeq).toSeq ===
      q2(spark).collect().map(_.toSeq).toSeq)
  }

  test("AGGREGATED join MV by composition: join rewrite then rollup rewrite chain in the fixed-point batch") {
    import spark.implicits._
    // a rollup registered ON THE JOIN VIEW ITSELF: the optimizer batch
    // runs to fixed point, so iteration 1 re-roots the aggregate onto
    // the row-grain join MV and iteration 2 rolls it up to the
    // keys-sized rollup — the Calcite aggregated-join-MV surface as a
    // composition of the two registered shapes, no third rewrite form
    val rollupPath =
      s"${new java.io.File(jmvPath).getParent}/jmv_rollup.parquet"
    spark.read.parquet(jmvPath)
      .groupBy($"jk")
      .agg(sum($"v").as("s_v"), count($"v").as("c_v"), count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(rollupPath)
    MvCatalog.register(MvDef(
      name = "jmv_rollup",
      basePath = jmvPath,
      keys = Seq("jk"),
      measures = Map("v" -> MvMeasure(sum = Some("s_v"), cnt = Some("c_v"))),
      countStar = Some("n"),
      mvPath = rollupPath,
      mvSchema = spark.read.parquet(rollupPath).schema
    ))
    try {
      def q(s: SparkSession) = {
        val f = s.read.parquet(factPath)
        val d = s.read.parquet(dimPath)
        f.join(d, col("jk") === col("dk"), "inner")
          .groupBy(col("jk"))
          .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
          .orderBy(col("jk"))
      }
      val r = q(s2)
      val paths = scanPaths(r)
      assert(paths.exists(_.contains("jmv_rollup.parquet")),
        s"expected the keys-sized rollup scan, got $paths")
      assert(!paths.exists(p => p.contains("fact.parquet") ||
        p.contains("dim.parquet") ||
        (p.contains("jmv.parquet") && !p.contains("jmv_rollup"))),
        s"bases and the row-grain view must both be replaced: $paths")
      assert(r.collect().map(_.toSeq).toSeq ===
        q(spark).collect().map(_.toSeq).toSeq)
    } finally MvCatalog.unregister(jmvPath)
  }

  test("full IVM loop: refreshJoin maintains the stored view, re-registration re-routes the rewrite, answers track the churned base") {
    import spark.implicits._
    val dir = tempDir("graft-mv-loop")
    val factP = s"$dir/lfact.parquet"
    val dimP = s"$dir/ldim.parquet"
    val mvV1 = s"$dir/lmv_v1.parquet"
    val mvV2 = s"$dir/lmv_v2.parquet"
    def writeFact(rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("pk", "jk", "v").write.mode("overwrite").parquet(factP)
    def writeDim(rows: Seq[(String, String)]): Unit =
      rows.toDF("jk", "name").write.mode("overwrite").parquet(dimP)
    writeFact(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)))
    writeDim(Seq(("a", "alpha"), ("b", "beta")))
    def fact = spark.read.parquet(factP)
    def dim = spark.read.parquet(dimP)
    def register(mvPath: String, wm: Long): Unit =
      MvCatalog.registerJoin(JoinMvDef(
        name = "loop_view", factPath = factP, dimPath = dimP,
        joinKeys = Seq(("jk", "jk")), mvPath = mvPath,
        mvSchema = spark.read.parquet(mvPath).schema,
        watermark = Some(wm)))
    fact.join(dim, Seq("jk"), "inner").write.parquet(mvV1)
    register(mvV1, 1L)
    def q(s: SparkSession) = {
      val f = s.read.parquet(factP)
      val d = s.read.parquet(dimP)
      f.join(d, Seq("jk"), "inner")
        .groupBy(col("name"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .orderBy(col("name"))
    }
    try {
      // v1: the rewrite answers from the stored view
      val r1 = q(s2)
      assert(scanPaths(r1).exists(_.contains("lmv_v1")), scanPaths(r1))
      assert(r1.collect().map(_.toSeq).toSeq ===
        q(spark).collect().map(_.toSeq).toSeq)
      // base churn: f1 MOVES a -> b, f4 inserts under b; dim relabels a
      writeFact(Seq((1L, "b", 10L), (2L, "a", 20L), (3L, "b", 30L),
        (4L, "b", 40L)))
      writeDim(Seq(("a", "ALPHA"), ("b", "beta")))
      val factChanges = Seq(("delete", 1L), ("insert", 1L), ("insert", 4L))
        .toDF("_change_type", "pk")
      val dimChanges = Seq(("delete", "a"), ("insert", "a"))
        .toDF("_change_type", "jk")
      // maintain the view from churn (keyed reads over the CURRENT base),
      // publish as a NEW stored version, re-register at watermark 2 —
      // registration re-points the rewrite AND invalidates the scan cache
      graft.operators.IncrementalOps.refreshJoin(
        spark.read.parquet(mvV1), factChanges, dimChanges, "pk", "jk",
        factByPk = keys => fact.join(keys, Seq("pk"), "left_semi"),
        factByJoinKey = keys => fact.join(keys, Seq("jk"), "left_semi"),
        dimByJoinKey = keys => dim.join(keys, Seq("jk"), "left_semi"))
        .write.parquet(mvV2)
      register(mvV2, 2L)
      val r2 = q(s2)
      assert(scanPaths(r2).exists(_.contains("lmv_v2")),
        s"rewrite must re-route to the refreshed version: ${scanPaths(r2)}")
      assert(!scanPaths(r2).exists(_.contains("lmv_v1")))
      assert(r2.collect().map(_.toSeq).toSeq ===
        q(spark).collect().map(_.toSeq).toSeq,
        "rewritten answer must reflect the churned base exactly")
      // and the freshness face reports the new watermark
      val info = MvCatalog.describe().find(_.name == "loop_view").get
      assert(info.watermark === Some(2L) && info.mvPath == mvV2)
    } finally MvCatalog.unregisterJoin(factP, dimP)
  }

  test("full DISTINCT-IVM loop: refreshDistinct maintains the multiplicity store, re-registration re-routes count(DISTINCT)") {
    import spark.implicits._
    val dir = tempDir("graft-mvd-loop")
    val baseP = s"$dir/dbase.parquet"
    val multV1 = s"$dir/dmult_v1.parquet"
    val multV2 = s"$dir/dmult_v2.parquet"
    def writeBase(rows: Seq[(String, Long)]): Unit =
      rows.toDF("k", "v").write.mode("overwrite").parquet(baseP)
    // a holds v=1 twice and v=2; b holds v=5
    writeBase(Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 5L)))
    def register(mvPath: String, wm: Long): Unit =
      MvCatalog.register(MvDef(
        name = "loop_mult", basePath = baseP, keys = Seq("k", "v"),
        measures = Map.empty, countStar = Some("ref"), mvPath = mvPath,
        mvSchema = spark.read.parquet(mvPath).schema, watermark = Some(wm)))
    spark.read.parquet(baseP).groupBy($"k", $"v")
      .agg(count(lit(1)).as("ref")).write.parquet(multV1)
    register(multV1, 1L)
    def q(s: SparkSession) = s.read.parquet(baseP)
      .groupBy(col("k"))
      .agg(countDistinct(col("v")).as("nd"), count(lit(1)).as("n"))
      .orderBy(col("k"))
    try {
      val r1 = q(s2)
      assert(scanPaths(r1).exists(_.contains("dmult_v1")), scanPaths(r1))
      assert(r1.collect().map(_.toSeq).toSeq ===
        q(spark).collect().map(_.toSeq).toSeq)
      // churn: delete ONE duplicate copy of (a,1) — nd must not move —
      // kill (a,2) — death — and birth (b,9)
      writeBase(Seq(("a", 1L), ("b", 5L), ("b", 9L)))
      val changes = Seq(
        ("delete", "a", 1L), ("delete", "a", 2L), ("insert", "b", 9L)
      ).toDF("_change_type", "k", "m")
      val refreshed = graft.operators.IncrementalOps.refreshDistinct(
        spark.read.parquet(multV1),
        // the distinct level is re-derivable from the multiplicity store
        // (count of non-null value rows per key), so the loop only needs
        // to PERSIST level 1 — recompute level 2 on registration
        spark.read.parquet(multV1).groupBy($"k")
          .agg(count(when($"v".isNotNull, lit(1))).as("nd"),
            sum($"ref").as("n")),
        changes, "k", col("m"), "v", "ref", "nd", "n")
      refreshed.multiplicity.write.parquet(multV2)
      register(multV2, 2L)
      val r2 = q(s2)
      assert(scanPaths(r2).exists(_.contains("dmult_v2")),
        s"rewrite must re-route to the refreshed store: ${scanPaths(r2)}")
      assert(r2.collect().map(_.toSeq).toSeq ===
        q(spark).collect().map(_.toSeq).toSeq,
        "rewritten distinct answer must reflect the churned base exactly")
      val info = MvCatalog.describe().find(_.name == "loop_mult").get
      assert(info.watermark === Some(2L) && info.mvPath == multV2)
    } finally MvCatalog.unregister(baseP)
  }
}
