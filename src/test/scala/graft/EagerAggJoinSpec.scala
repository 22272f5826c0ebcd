package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.apache.spark.sql.functions._

/** plans.EagerAggJoin — the partial-aggregate-below-join rewrite (Yan &
  * Larson eager aggregation). Contract under test: opt-in only; when it
  * fires, the join's fact side is an Aggregate at the (keys + grouped
  * fact columns) grain and results match the unrewritten plan exactly —
  * including the subtle multiplicity weighting (each grain row joins k
  * dim rows, re-aggregating partials over the join output must weight by
  * exactly k); every unsupported shape bails to the original plan.
  */
class EagerAggJoinSpec extends SparkTestBase {

  import spark.implicits._

  private val Conf = "spark.graft.optimizer.eagerAggJoin"

  private def withRule[T](on: Boolean)(f: => T): T = {
    spark.conf.set(Conf, on.toString)
    try f
    finally spark.conf.unset(Conf)
  }

  /** Joins whose left or right side is an Aggregate in the optimized plan. */
  private def eagerJoins(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case j: Join
          if j.left.isInstanceOf[Aggregate] || j.right.isInstanceOf[Aggregate] =>
        j
    }.size

  private def checkExact(fires: Boolean)(build: => DataFrame): Unit = {
    val (onRows, onSchema, onFired) = withRule(on = true) {
      val df = build
      (df.collect().sortBy(_.toString).toSeq, df.schema, eagerJoins(df))
    }
    val (offRows, offSchema, offFired) = withRule(on = false) {
      val df = build
      (df.collect().sortBy(_.toString).toSeq, df.schema, eagerJoins(df))
    }
    assert(offFired === 0, "default-off contract broken")
    if (fires) assert(onFired >= 1, "expected the rewrite to fire")
    else assert(onFired === 0, "expected the rewrite to bail")
    assert(onSchema === offSchema,
      s"schema drift:\n  on: $onSchema\n  off: $offSchema")
    assert(onRows.size === offRows.size,
      s"row-count drift: ${onRows.size} vs ${offRows.size}")
    def close(a: Double, b: Double): Boolean =
      (a == b) || (a.isNaN && b.isNaN) ||
        math.abs(a - b) <= 1e-12 * math.max(math.abs(a), math.abs(b))
    onRows.zip(offRows).zipWithIndex.foreach { case ((on, off), i) =>
      (0 until on.length).foreach { f =>
        val same = (on.get(f), off.get(f)) match {
          case (null, null) => true
          case (x: java.lang.Double, y: java.lang.Double) => close(x, y)
          case (x, y) => x == y
        }
        assert(same, s"row $i field $f drift: $on vs $off")
      }
    }
  }

  /** fact: multiple rows per key, null keys, unmatched keys, null
    * measures; dim: DUPLICATE join keys (multiplicity 2 for key "b" —
    * the weighting case), unmatched dim rows, null dim keys.
    */
  private lazy val (fact, dim): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(20260817)
    val keys = Array("a", "b", "c", "d", null)
    val f = (1 to 400).map { i =>
      (
        keys(rnd.nextInt(keys.length)),
        if (rnd.nextInt(10) == 0) null
        else java.lang.Integer.valueOf(rnd.nextInt(100)),
        rnd.nextDouble() * 10,
        s"t${i % 7}"
      )
    }.toDF("fk", "v", "w", "tag")
    // dim key "b" appears TWICE (join multiplicity 2), "x" matches
    // nothing, null key matches nothing
    val d = Seq(
      ("a", "alpha", 1L), ("b", "beta1", 2L), ("b", "beta2", 3L),
      ("c", "gamma", 4L), ("x", "unmatched", 5L), (null, "nullkey", 6L)
    ).toDF("dk", "name", "rank")
    (f.cache(), d.cache())
  }

  test("fires on the warehouse shape; duplicate dim keys weight exactly") {
    checkExact(fires = true) {
      fact.join(dim, $"fk" === $"dk")
        .groupBy($"name")
        .agg(
          sum($"v").as("sv"),
          count(lit(1)).as("n"),
          count($"v").as("nv"),
          min($"w").as("mnw"),
          max($"w").as("mxw"),
          avg($"v").as("av")
        )
    }
  }

  test("group by fact column and dim column together") {
    checkExact(fires = true) {
      fact.join(dim, $"fk" === $"dk")
        .groupBy($"tag", $"name")
        .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
    }
  }

  test("group-by EXPRESSION over a fact column joins the grain") {
    checkExact(fires = true) {
      fact.join(dim, $"fk" === $"dk")
        .groupBy(substring($"tag", 1, 2).as("t2"), $"name")
        .agg(sum($"v").as("sv"))
    }
  }

  test("global aggregate over the join (no group-by) stays exact") {
    checkExact(fires = true) {
      fact.join(dim, $"fk" === $"dk")
        .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
    }
    // empty join result: the global aggregate's empty-input row must
    // survive identically
    checkExact(fires = true) {
      fact.filter($"fk" === "zzz").join(dim, $"fk" === $"dk")
        .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
    }
  }

  test("dim-side min/max ride verbatim; distincts ride on either side") {
    checkExact(fires = true) {
      fact.join(dim, $"fk" === $"dk")
        .groupBy($"name")
        .agg(
          sum($"v").as("sv"),
          min($"rank").as("mnr"), // dim side, multiplicity-insensitive
          max($"rank").as("mxr"),
          countDistinct($"tag").as("ndt"), // fact side: grain extension
          countDistinct($"rank").as("ndr") // dim side: verbatim
        )
    }
  }

  test("FILTERed distincts: fact-side predicate joins the grain, dim-side passes through") {
    checkExact(fires = true) {
      fact.join(dim, $"fk" === $"dk")
        .groupBy($"name")
        .agg(
          // fact argument + fact predicate: both join the grain
          expr("count(DISTINCT tag) FILTER (WHERE w > 2)").as("ndt_f"),
          // dim argument + FACT predicate: predicate column joins the grain
          expr("count(DISTINCT rank) FILTER (WHERE tag LIKE 't1%')").as("ndr_f"),
          // fact argument + DIM predicate: predicate passes through the join
          expr("count(DISTINCT tag) FILTER (WHERE rank > 2)").as("ndt_d"),
          sum($"v").as("sv")
        )
    }
  }

  test("bail: outer join, non-equi condition, mixed-side argument") {
    checkExact(fires = false) {
      fact.join(dim, $"fk" === $"dk", "left")
        .groupBy($"name").agg(sum($"v").as("sv"))
    }
    checkExact(fires = false) {
      fact.join(dim, $"fk" === $"dk" && $"v" > $"rank")
        .groupBy($"name").agg(sum($"v").as("sv"))
    }
    checkExact(fires = false) {
      fact.join(dim, $"fk" === $"dk")
        .groupBy($"name").agg(sum($"v" + $"rank").as("s"))
    }
  }

  test("measures on BOTH sides: dim sum/count/avg ride weighted by the fact partial count") {
    // the r18 bail, now Yan & Larson's full algebra — dim-side measures
    // re-aggregate as sum(x*w) / sum(if(x nonnull, w, 0)) over the fact
    // pre-aggregate's per-grain count w; duplicate dim keys ("b" twice)
    // exercise the multiplicity, the unmatched and null keys the drops
    checkExact(fires = true) {
      fact.join(dim, $"fk" === $"dk")
        .groupBy($"tag").agg(
          sum($"v").as("sv"), // fact: decomposed partial
          sum($"rank").as("sr"), // dim: weighted (long)
          count($"rank").as("nr"), // dim: weighted count
          avg($"rank").as("ar"), // dim: weighted avg
          count(lit(1)).as("n"),
          min($"rank").as("mnr") // dim: verbatim
        )
    }
    // NULLs in the dim measure: the weight must count only rows where
    // the measure is non-null, exactly like vanilla count/avg
    val dimN = Seq(
      ("a", Option(1.5)), ("b", Option.empty[Double]), ("b", Option(2.5)),
      ("c", Option(-3.0))
    ).toDF("dk2", "score")
    checkExact(fires = true) {
      fact.join(dimN, $"fk" === $"dk2")
        .groupBy($"tag").agg(
          sum($"v").as("sv"), sum($"score").as("ss"),
          count($"score").as("ns"), avg($"score").as("asc")
        )
    }
  }

  test("dim-side-only measures pre-aggregate the dim side instead") {
    // all decomposable measures on the right side: the rule flips which
    // side it treats as the fact
    checkExact(fires = true) {
      fact.join(dim, $"fk" === $"dk")
        .groupBy($"tag")
        .agg(sum($"rank").as("sr"), count(lit(1)).as("n"))
    }
  }

  test("ANSI: a raising derived grouping column cannot relocate below the pre-aggregate") {
    // the unparsable code exists ONLY on a row the inner join drops:
    // vanilla never evaluates the derived column there, but a copy
    // relocated below the pre-aggregate would see ALL fact rows — and
    // raise. Cast-to-int is outside the cannot-raise whitelist, so the
    // rule must bail and the query keeps succeeding (checkExact would
    // crash, not just fail, if the relocation happened).
    val f = Seq(("a", 10.0, "1"), ("a", 20.0, "2"), ("b", 5.0, "1"),
      ("zz", 1.0, "oops")).toDF("fk2", "v2", "code")
    checkExact(fires = false) {
      f.join(dim, $"fk2" === $"dk")
        .groupBy($"code".cast("int").as("g"), $"name")
        .agg(sum($"v2").as("sv"))
    }
    // the SAFE shapes keep firing under ANSI: date-part extraction
    // cannot raise on any row
    val f2 = Seq(("a", 10.0, "2024-01-15"), ("a", 20.0, "2024-02-10"),
      ("b", 5.0, "2025-03-01"), ("zz", 1.0, "2025-04-01"))
      .toDF("fk2", "v2", "ds")
      .select($"fk2", $"v2", $"ds".cast("date").as("d"))
    checkExact(fires = true) {
      f2.join(dim, $"fk2" === $"dk")
        .groupBy(year($"d").as("y"), $"name")
        .agg(sum($"v2").as("sv"), count(lit(1)).as("n"))
    }
  }

  test("post-join filter between aggregate and join bails") {
    checkExact(fires = false) {
      fact.join(dim, $"fk" === $"dk")
        .filter($"w" > $"rank")
        .groupBy($"name").agg(sum($"v").as("sv"))
    }
  }

  test("idempotent: exactly one grain aggregate on the fact side") {
    withRule(on = true) {
      val df = fact.join(dim, $"fk" === $"dk")
        .groupBy($"name").agg(sum($"v").as("sv"))
      assert(eagerJoins(df) === 1)
      val stacked = df.queryExecution.optimizedPlan.collect {
        case j: Join => Seq(j.left, j.right).collect {
          case a: Aggregate =>
            a.child.collect { case aa: Aggregate => aa }.size
        }.sum
      }.sum
      assert(stacked === 0, "grain aggregate stacked on itself")
    }
  }

  test("compound join key: both equalities land in the grain") {
    val d2 = dim.withColumn("dk2", length($"name") % 3)
    val f2 = fact.withColumn("fk2", $"v" % 3)
    checkExact(fires = true) {
      f2.join(d2, $"fk" === $"dk" && $"fk2" === $"dk2")
        .groupBy($"name").agg(sum($"v").as("sv"), count(lit(1)).as("n"))
    }
  }

  test("multi-way star: the rewrite cascades one level per join, no stacking") {
    // fixed-point recursion: the planted grain aggregate over the inner
    // join is itself the match shape, so fact ⋈ d1 ⋈ d2 pre-aggregates
    // at (k1, k2) before the first join and re-aggregates at (k2)
    // before the second — each join sees grain-many rows
    val d2 = Seq(("t0", "u0"), ("t1", "u1"), ("t2", "u0"), ("t3", "u1"),
      ("t4", "u0"), ("t5", "u1"), ("t6", "u0")).toDF("tk", "u")
    def q = fact
      .join(dim, $"fk" === $"dk")
      .join(d2, $"tag" === $"tk")
      .groupBy($"u")
      .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
    withRule(on = true) {
      val df = q
      assert(eagerJoins(df) === 2,
        "expected the rewrite to cascade through both joins")
      // a redundant stack = two Aggregates at the same grain with no
      // join between them (the legit cascade nests aggregates ACROSS
      // joins); look through pruning Projects/Filters like the rule does
      def under(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
          : Option[Aggregate] = p match {
        case a: Aggregate => Some(a)
        case org.apache.spark.sql.catalyst.plans.logical.Project(_, c) =>
          under(c)
        case org.apache.spark.sql.catalyst.plans.logical.Filter(_, c) =>
          under(c)
        case _ => None
      }
      val stacked = df.queryExecution.optimizedPlan.collect {
        case a: Aggregate if under(a.child).exists { b =>
          b.groupingExpressions.map(_.references.map(_.exprId)).toSet ==
            a.groupingExpressions.map(_.references.map(_.exprId)).toSet
        } => a
      }.size
      assert(stacked === 0, "redundant grain aggregate stacked in the cascade")
    }
    checkExact(fires = true)(q)
  }

  test("pure DISTINCT over a join: no aggregates, the grain dedup still fires") {
    checkExact(fires = true) {
      fact.join(dim, $"fk" === $"dk").select($"tag", $"name").distinct()
    }
  }

  test("null-safe equality (<=>): the null grain group matches the null dim row") {
    // the fixture has null fact keys AND a null dim key: under <=> they
    // MATCH — the grain's single null row must carry its partials to
    // that dim row with exact multiplicity
    checkExact(fires = true) {
      fact.join(dim, $"fk" <=> $"dk")
        .groupBy($"name").agg(sum($"v").as("sv"), count(lit(1)).as("n"))
    }
  }

  test("decimal dim measures: narrow sums multiply exactly, wide ones bail the side") {
    val dimDec = Seq(("a", "1.50"), ("b", "2.25"), ("b", "-3.10"), ("c", "4.00"))
      .toDF("dk2", "bals")
      .select($"dk2", $"bals".cast("decimal(14,2)").as("bal"),
        $"bals".cast("decimal(20,2)").as("balwide"))
    // decimal(14,2): the weighted product is exact decimal(35,2) —
    // bit-identical re-aggregation
    checkExact(fires = true) {
      fact.join(dimDec, $"fk" === $"dk2")
        .groupBy($"tag").agg(sum($"v").as("sv"), sum($"bal").as("sb"))
    }
    // sum(v) + sum(balwide): left-as-fact fails (wide decimal cannot
    // weight on the dim side), but the rule FLIPS — right-as-fact
    // decomposes the wide decimal as a plain partial and weights the
    // int sum instead, so the rewrite still fires and stays exact
    checkExact(fires = true) {
      fact.join(dimDec, $"fk" === $"dk2")
        .groupBy($"tag").agg(sum($"v").as("sv"), sum($"balwide").as("sw"))
    }
    // wide decimals on BOTH sides: neither assignment can weight the
    // other side — the rule must bail entirely
    val factWide = fact.withColumn("vwide", $"w".cast("decimal(20,2)"))
    checkExact(fires = false) {
      factWide.join(dimDec, $"fk" === $"dk2")
        .groupBy($"tag")
        .agg(sum($"vwide").as("svw"), sum($"balwide").as("sw"))
    }
  }

  test("registered q_join_eager_agg fires in its child session only") {
    for (name <- Seq("q_join_eager_agg", "q_join_eager_agg_bilateral")) {
      val df = graft.queries.Registry.byName(name)
        .fn(spark, SparkTestBase.Sf0001)
      assert(eagerJoins(df) === 1,
        s"registered query $name lost the eager-aggregation plan")
    }
    // the enclosing session must stay stock
    val stock = fact.join(dim, $"fk" === $"dk")
      .groupBy($"name").agg(sum($"v").as("sv"))
    assert(eagerJoins(stock) === 0, "conf leaked into the parent session")
  }

  test("auto mode: harvested statistics arm the rewrite with no manual conf") {
    import graft.plans.StatsCatalog
    val dir = SparkTestBase.Sf0001
    val liPath = s"$dir/lineitem.parquet"
    try {
      StatsCatalog.analyze(spark, liPath)
      // child session: eagerAggJoin conf NEVER set — default auto; only
      // the size floor is lowered to fixture scale
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.optimizer.eagerAggJoin.minRows", "1000")
      def q(s: org.apache.spark.sql.SparkSession) = {
        val li = s.read.parquet(liPath)
        val sup = s.read.parquet(s"$dir/supplier.parquet")
        li.join(sup, li("l_suppkey") === sup("s_suppkey"))
          .groupBy(sup("s_nationkey"))
          .agg(sum(li("l_quantity")).as("sq"), count(lit(1)).as("n"))
      }
      // broadcast regime (tiny supplier under the default threshold):
      // no fact shuffle to save — the gate must refuse
      assert(eagerJoins(q(s2)) === 0,
        "auto mode must skip the broadcast-dim regime")
      // shuffle regime (broadcast disabled): grain NDV (suppliers) is a
      // tiny fraction of fact rows — the gate must fire, unprompted
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(eagerJoins(q(s2)) === 1,
        "auto mode must fire in the shuffle-dim regime")
      // exactness: the auto-fired plan matches the stock plan
      val auto = q(s2).collect().map(_.toString).sorted.toSeq
      val s3 = spark.newSession()
      s3.conf.set("spark.graft.optimizer.eagerAggJoin", "false")
      s3.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val stock = q(s3).collect().map(_.toString).sorted.toSeq
      assert(auto === stock, "auto-fired rewrite drifted from stock")
      // near-unique grain (group by a fact key): the NDV-ratio gate
      // must refuse even in the shuffle regime
      val li2 = s2.read.parquet(liPath)
      val sup2 = s2.read.parquet(s"$dir/supplier.parquet")
      val wide = li2.join(sup2, li2("l_suppkey") === sup2("s_suppkey"))
        .groupBy(li2("l_orderkey"))
        .agg(sum(li2("l_quantity")).as("sq"))
      assert(eagerJoins(wide) === 0,
        "auto mode must refuse a near-unique grain")
      // the size floor holds: a default-conf session (minRows 1M) stays
      // stock even with broadcast off at this fixture scale
      val s4 = spark.newSession()
      s4.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(eagerJoins(q(s4)) === 0,
        "the minRows floor must keep tiny facts stock")
      // and an UNANALYZED session fires nothing anywhere
      StatsCatalog.unregister(liPath)
      assert(eagerJoins(q(s2)) === 0,
        "no statistics -> no fire, the default-cost contract")
    } finally StatsCatalog.unregister(liPath)
  }

  test("registered q_join_eager_agg_auto rides the auto gate in its child session") {
    val df = graft.queries.Registry.byName("q_join_eager_agg_auto")
      .fn(spark, SparkTestBase.Sf0001)
    try {
      assert(eagerJoins(df) === 1,
        "the auto-armed registered query lost the eager-aggregation plan")
    } finally graft.plans.StatsCatalog.unregister(
      s"${SparkTestBase.Sf0001}/lineitem.parquet")
  }

  test("FILTERed dim-side sum/count/avg ride weighted; min rides verbatim (r20)") {
    checkExact(fires = true) {
      fact.join(dim, $"fk" === $"dk")
        .groupBy($"name")
        .agg(
          sum($"v").as("sv"),
          // dim measure + dim predicate: filter passes through the join
          expr("sum(rank) FILTER (WHERE rank > 2)").as("sr_f"),
          // dim measure + FACT predicate: predicate column joins the grain
          expr("count(rank) FILTER (WHERE tag LIKE 't1%')").as("nr_f"),
          // weighted avg under a fact predicate
          expr("avg(rank) FILTER (WHERE w > 2)").as("ar_f"),
          // multiplicity-insensitive dim min with a fact predicate
          expr("min(rank) FILTER (WHERE tag = 't1')").as("mnr_f")
        )
    }
    // dim measures with NULLs under a filter: the weight must count only
    // rows passing the predicate AND non-null, exactly like vanilla
    val dimN = Seq(
      ("a", Option(1.5), 1), ("b", Option.empty[Double], 2),
      ("b", Option(2.5), 3), ("c", Option(-3.0), 4)
    ).toDF("dk2", "score", "r2")
    checkExact(fires = true) {
      fact.join(dimN, $"fk" === $"dk2")
        .groupBy($"tag").agg(
          sum($"v").as("sv"),
          expr("sum(score) FILTER (WHERE r2 > 1)").as("ss_f"),
          expr("count(score) FILTER (WHERE v > 25)").as("ns_f"),
          expr("avg(score) FILTER (WHERE r2 < 4)").as("as_f")
        )
    }
  }

  test("ANSI dim-side weighted sum survives a per-grain product overflow (decimal buffer)") {
    // x*w = 2^61 * 4 = 2^63 overflows a long PRODUCT, but the group's
    // row-by-row total is only 400 — vanilla succeeds, so the rewrite
    // must too (the r19 long-product Multiply threw here; the r20 ANSI
    // path runs the product in an exact decimal(38,0) buffer and casts
    // only the true total back to long)
    assume(spark.conf.get("spark.sql.ansi.enabled", "true") == "true")
    val big = 1L << 61
    val f = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4)).toDF("fk2", "v2")
    val d = Seq(("a", big), ("a", -(big - 100L))).toDF("dk2", "x")
    withRule(on = true) {
      val df = f.join(d, $"fk2" === $"dk2")
        .groupBy($"dk2")
        .agg(sum($"x").as("sx"), sum($"v2").as("sv"))
      assert(eagerJoins(df) === 1, "expected the weighted rewrite to fire")
      val row = df.collect().head
      assert(row.getAs[Long]("sx") === 400L,
        s"weighted ANSI sum drifted: $row")
      // each fact row joins BOTH dim rows: sum(v2) doubles over the join
      assert(row.getAs[Long]("sv") === 20L)
    }
  }

  test("auto mode: post-filter selectivity refuses a fact filtered under the size floor") {
    import graft.plans.StatsCatalog
    val dir = SparkTestBase.Sf0001
    val liPath = s"$dir/lineitem.parquet"
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.graft.optimizer.eagerAggJoin.minRows", "1000")
    StatsCatalog.analyzeScoped(s2, liPath)
    val li = s2.read.parquet(liPath)
    val sup = s2.read.parquet(s"$dir/supplier.parquet")
    def q(f: DataFrame => DataFrame) =
      f(li).join(sup, li("l_suppkey") === sup("s_suppkey"))
        .groupBy(sup("s_nationkey"))
        .agg(sum(li("l_quantity")).as("sq"))
    // unfiltered: ~6k rows clear the floor — fires
    assert(eagerJoins(q(identity)) === 1, "unfiltered case must fire")
    // equality on the supplier key: estimated rows/NDV(l_suppkey) ~ 600
    // falls UNDER the 1000-row floor — the r19 table-row check fired
    // here; the post-filter estimate must refuse
    val aKey = li.select("l_suppkey").head().get(0)
    assert(eagerJoins(q(_.filter(li("l_suppkey") === aKey))) === 0,
      "selective-filter case must refuse: post-filter rows under minRows")
    // an unrecognized predicate keeps selectivity 1.0 (upper bound) and
    // the r19 behavior: still fires
    assert(eagerJoins(q(_.filter(li("l_quantity") > 0))) === 1)
  }

  test("auto mode: a correlated grain fires only through its joint combo sketch") {
    import graft.plans.StatsCatalog
    import org.apache.spark.sql.functions.col
    val dir = tempDir("graft-joint-ndv")
    val factPath = s"$dir/factc"
    // k2 is a FUNCTION of k: per-column NDV product 60*60=3600 exceeds
    // the ratio gate (0.125 * 20000 = 2500) but the true joint NDV is 60
    spark.range(0, 20000)
      .select((col("id") % 60).as("k"), ((col("id") % 60) * 7).as("k2"),
        (col("id") % 97).as("v"))
      .write.mode("overwrite").parquet(factPath)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.graft.optimizer.eagerAggJoin.minRows", "1000")
    val dimc = (0L until 60L).map(k => (k, s"g${k % 4}")).toDF("dk", "grp")
      .repartition(2)
    def q(s: SparkSession) = {
      val f = s.read.parquet(factPath)
      f.join(dimc, f("k") === dimc("dk"))
        .groupBy(f("k2")).agg(sum(f("v")).as("sv"))
    }
    // per-column product over-estimates the correlated grain: refuses
    StatsCatalog.analyzeScoped(s2, factPath)
    assert(eagerJoins(q(s2)) === 0,
      "per-column NDV product must refuse the correlated grain")
    // a joint sketch for (k, k2) restores the win — and stays exact
    StatsCatalog.analyzeScoped(s2, factPath, combos = Seq(Seq("k", "k2")))
    assert(eagerJoins(q(s2)) === 1,
      "the joint combo sketch must fire the correlated grain")
    val s3 = spark.newSession()
    s3.conf.set("spark.graft.optimizer.eagerAggJoin", "false")
    val auto = q(s2).collect().map(_.toString).sorted.toSeq
    val stock = q(s3).collect().map(_.toString).sorted.toSeq
    assert(auto === stock, "joint-NDV-armed rewrite drifted from stock")
  }

  test("auto mode cascades a 2-level star from derived cardinality, no conf") {
    val df = graft.queries.Registry.byName("q_join_eager_agg_cascade")
      .fn(spark, SparkTestBase.Sf0001)
    assert(eagerJoins(df) === 2,
      "the auto cascade must feed BOTH star joins with grain pre-aggregates")
    // scoped statistics must not leak into other sessions: the same
    // star in a fresh (un-analyzed) session stays stock
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.graft.optimizer.eagerAggJoin.minRows", "1000")
    val dir = SparkTestBase.Sf0001
    val li = s2.read.parquet(s"$dir/lineitem.parquet")
    val sup = s2.read.parquet(s"$dir/supplier.parquet")
    val nat = s2.read.parquet(s"$dir/nation.parquet")
    val stock = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(nat, sup("s_nationkey") === nat("n_nationkey"))
      .groupBy(nat("n_name")).agg(sum(li("l_quantity")).as("sq"))
    assert(eagerJoins(stock) === 0,
      "another session saw the registered query's scoped statistics")
  }

  test("adversarial sweep: all 22 TPC-H shapes force-enabled stay exact") {
    // the strongest gate receipt: force the rule on for every composite
    // TPC-H query (multi-way joins, correlated subqueries, semi/anti
    // joins, HAVING, distinct aggregates) and require each to either
    // bail or rewrite EXACTLY — a wrong multiplicity weighting or a
    // dangling reference fails loudly here
    val tpch = Seq(
      "q1_agg", "q2_min_per_group", "q3_join_agg", "q4_priority_count",
      "q5_join_multi", "q6_filter_agg", "q7_volume_shipping",
      "q8_market_share", "q9_product_profit", "q10_returned_items",
      "q11_important_stock", "q12_priority_lines", "q13_count_dist",
      "q14_promo_share", "q15_top_supplier", "q16_part_supplier",
      "q17_small_qty", "q18_large_orders", "q19_disjunctive",
      "q20_potential_promo", "q21_waiting_supplier", "q22_global_sales")
    val forced = spark.newSession()
    forced.conf.set(Conf, "true")
    var fired = 0
    tpch.foreach { name =>
      val q = graft.queries.Registry.byName(name)
      val stock = q.fn(spark, SparkTestBase.Sf0001)
        .collect().map(_.toString).sorted.toSeq
      val df = q.fn(forced, SparkTestBase.Sf0001)
      fired += eagerJoins(df)
      val on = df.collect().map(_.toString).sorted.toSeq
      assert(on === stock, s"$name drifted under forced eager aggregation")
    }
    assert(fired >= 1,
      "expected at least one TPC-H shape to actually exercise the rewrite")
  }

  test("fuzz: seeded random shapes stay exact under duplicate dim AND fact keys") {
    val rnd = new scala.util.Random(11)
    (1 to 6).foreach { round =>
      val nKeys = 1 + rnd.nextInt(12)
      // duplicate fact keys by construction (rows >> keys), some null
      val f = (1 to 100 + rnd.nextInt(300)).map { _ =>
        (if (rnd.nextInt(12) == 0) null else s"k${rnd.nextInt(nKeys)}",
          rnd.nextInt(50), rnd.nextDouble())
      }.toDF("fk", "v", "w")
      // every key 1-3 copies on the dim side; dim measure with nulls
      val d = (0 until nKeys).flatMap { k =>
        (0 to rnd.nextInt(2)).map(c => (s"k$k", s"g${k % 3}", c.toLong,
          if (rnd.nextInt(5) == 0) Option.empty[Double]
          else Option(rnd.nextDouble() * 10)))
      }.toDF("dk", "grp", "copy", "score")
      val aggs = Seq(
        sum($"v").as("sv"), count(lit(1)).as("n"), avg($"w").as("aw"),
        min($"w").as("mnw"), max($"copy").as("mxc"),
        countDistinct($"fk").as("ndk"),
        // dim-side measures: weighted re-aggregation paths
        sum($"score").as("ss"), count($"score").as("ns"),
        avg($"score").as("asc"), sum($"copy").as("sc"))
      val picked = rnd.shuffle(aggs).take(1 + rnd.nextInt(aggs.size))
      checkExact(fires = true) {
        f.join(d, $"fk" === $"dk")
          .groupBy($"grp").agg(picked.head, picked.tail: _*)
      }
    }
  }
}
