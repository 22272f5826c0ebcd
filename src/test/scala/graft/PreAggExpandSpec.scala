package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand}
import org.apache.spark.sql.functions._

import graft.queries.Registry

/** plans.PreAggExpand — the finest-grain pre-aggregation below
  * CUBE/ROLLUP/GROUPING SETS expansion. The contract under test: the
  * rewritten plan returns EXACTLY the rows and schema of the unrewritten
  * plan (the rule is algebra, not approximation), it fires on the shapes
  * it claims, and it bails — to the original plan, never to an error —
  * on every shape outside its gates.
  */
class PreAggExpandSpec extends SparkTestBase {

  import spark.implicits._

  private val Conf = "spark.graft.optimizer.preAggExpand"

  private def withRule[T](on: Boolean)(f: => T): T = {
    spark.conf.set(Conf, on.toString)
    try f
    finally spark.conf.set(Conf, "true")
  }

  /** Number of grouping-sets Expands fed by a pre-aggregate. */
  private def preAggExpands(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case e: Expand if e.child.isInstanceOf[Aggregate] => e
    }.size

  /** Sorted rows + schema, computed with the rule on and off; asserts
    * both agree and (optionally) that the rule actually fired. Double /
    * float values compare with 1e-12 relative tolerance — pre-aggregation
    * REASSOCIATES floating-point addition, the same last-ulp
    * nondeterminism Spark's own partial aggregation and any repartition
    * already exhibit; every other type must match bit-for-bit.
    */
  private def checkExact(fires: Boolean)(build: => DataFrame): Unit = {
    val (onRows, onSchema, onFired) = withRule(on = true) {
      val df = build
      (df.collect().sortBy(_.toString).toSeq, df.schema, preAggExpands(df))
    }
    val (offRows, offSchema, offFired) = withRule(on = false) {
      val df = build
      (df.collect().sortBy(_.toString).toSeq, df.schema, preAggExpands(df))
    }
    assert(offFired === 0, "kill switch must suppress the rewrite")
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
        val (a, b) = (on.get(f), off.get(f))
        val same = (a, b) match {
          case (null, null) => true
          case (x: java.lang.Double, y: java.lang.Double) => close(x, y)
          case (x: java.lang.Float, y: java.lang.Float) =>
            close(x.doubleValue, y.doubleValue)
          case (x, y) => x == y
        }
        assert(same, s"row $i field $f drift: $on vs $off")
      }
    }
  }

  /** Dims with real NULL data values (must stay distinct from
    * grouping-set nulls), doubles, ints with nulls, decimals.
    */
  private lazy val fixture: DataFrame = {
    val rnd = new scala.util.Random(20260816)
    val dims = Array("a", "b", "c", null)
    val rows = (1 to 600).map { i =>
      (
        dims(rnd.nextInt(dims.length)),
        dims(rnd.nextInt(dims.length)),
        if (rnd.nextInt(10) == 0) null else java.lang.Integer.valueOf(rnd.nextInt(100)),
        rnd.nextDouble() * 100,
        new java.math.BigDecimal(rnd.nextInt(100000)).movePointLeft(2)
      )
    }
    rows.toDF("d1", "d2", "v_int", "v_dbl", "v_dec")
      .withColumn("v_dec", $"v_dec".cast("decimal(14,2)"))
  }

  test("cube: count/sum/min/max/avg match the unrewritten plan exactly") {
    checkExact(fires = true) {
      fixture.cube($"d1", $"d2").agg(
        count(lit(1)).as("n"),
        count($"v_int").as("n_int"),
        sum($"v_int").as("s_int"),
        sum($"v_dec").as("s_dec"),
        min($"v_dbl").as("mn"),
        max($"v_dbl").as("mx"),
        avg($"v_dbl").as("a_dbl"),
        avg($"v_int").as("a_int"),
        grouping($"d1").cast("int").as("g1"),
        grouping_id().as("gid")
      )
    }
  }

  test("rollup and grouping sets (incl. the empty set) are exact") {
    checkExact(fires = true) {
      fixture.rollup($"d1", $"d2").agg(sum($"v_dec").as("s"), count(lit(1)).as("n"))
    }
    fixture.createOrReplaceTempView("pre_agg_fx")
    checkExact(fires = true) {
      spark.sql(
        """SELECT d1, d2, count(*) AS n, sum(v_dbl) AS s,
          |       CAST(grouping(d1) AS INT) AS g1
          |FROM pre_agg_fx
          |GROUP BY GROUPING SETS ((d1), (d2), (d1, d2), ())""".stripMargin)
    }
  }

  test("aggregate over a dimension column reads row values, not set-nulls") {
    // count(d1) under cube(d1): the argument is the PASSTHROUGH copy of
    // d1 (original row values) — the grouping-set null in the d1 output
    // column must not leak into the count
    checkExact(fires = true) {
      fixture.cube($"d1").agg(count($"d1").as("c_dim"), count(lit(1)).as("n"))
    }
  }

  test("expression dims and expression aggregate arguments fire") {
    checkExact(fires = true) {
      fixture.cube(substring($"d1", 1, 1).as("d"), $"d2")
        .agg(sum($"v_dbl" * $"v_int").as("s"), count(lit(1)).as("n"))
    }
  }

  test("HAVING above and filter below the cube are exact") {
    checkExact(fires = true) {
      fixture.filter($"v_dbl" > 10)
        .cube($"d1", $"d2").agg(count(lit(1)).as("n"), sum($"v_int").as("s"))
        .filter($"n" > 3)
    }
  }

  test("empty input stays empty (no fabricated global row)") {
    // PropagateEmptyRelation folds the whole plan before the rule can
    // fire (fires = false); the property under test survives it: a
    // dimensionless grain must never pre-aggregate (the rule requires
    // dims.nonEmpty), or an empty cube would fabricate a global row
    checkExact(fires = false) {
      fixture.filter($"v_dbl" < -1).cube($"d1", $"d2")
        .agg(count(lit(1)).as("n"), sum($"v_dbl").as("s"))
    }
    // same shape built from a parquet scan (not foldable to empty at
    // plan time): the rule fires and the result is still empty
    val empty = withRule(on = true) {
      val df = spark.read
        .parquet(s"${SparkTestBase.Sf0001}/lineitem.parquet")
        .filter($"l_quantity" < -1)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("s"))
      assert(preAggExpands(df) === 1)
      df.collect()
    }
    assert(empty.isEmpty, "empty cube fabricated rows")
  }

  test("DISTINCT aggregates ride via grain extension and stay exact") {
    // count(distinct x) by cube(dims): the grain extends to
    // (dims, x) pairs, the distinct re-runs verbatim above the Expand
    checkExact(fires = true) {
      fixture.cube($"d1").agg(
        countDistinct($"d2").as("nd"),
        sum($"v_int").as("s"),
        count(lit(1)).as("n"))
    }
    // distinct over a column that is ALSO a dim; multi-arg distinct;
    // sum(distinct); distinct over an expression of a column
    checkExact(fires = true) {
      fixture.cube($"d1", $"d2").agg(
        countDistinct($"d2").as("nd_dim"),
        countDistinct($"d1", $"d2").as("nd_pair"),
        sum_distinct($"v_int").as("sd"),
        countDistinct(substring($"d2", 1, 1).as("e")).as("nd_expr"))
    }
  }

  test("FILTERed non-distinct aggregates decompose on the partial (r20); holistic aggregates bail") {
    fixture.createOrReplaceTempView("pre_agg_fx")
    // the r19 bail, now exact decomposition: the predicate reads only
    // passthrough columns, so it evaluates per base row below the Expand
    // exactly as it did on each replica above
    checkExact(fires = true) {
      spark.sql(
        "SELECT d1, sum(v_int) FILTER (WHERE v_dbl > 50) AS s, " +
          "count(v_dbl) FILTER (WHERE v_int < 40) AS nf, count(*) AS n " +
          "FROM pre_agg_fx GROUP BY CUBE(d1)")
    }
    checkExact(fires = false) {
      fixture.cube($"d1").agg(first($"d2").as("f"))
    }
    checkExact(fires = false) {
      fixture.cube($"d1").agg(percentile_approx($"v_dbl", lit(0.5), lit(100)).as("p"))
    }
  }

  test("FILTERed distincts ride by extending the grain with the predicate columns") {
    fixture.createOrReplaceTempView("pre_agg_fx")
    // predicate over a non-grain measure column: v_dbl joins the grain,
    // the filter re-evaluates identically above the Expand
    checkExact(fires = true) {
      spark.sql(
        "SELECT d1, count(DISTINCT d2) FILTER (WHERE v_dbl > 50) AS nd, " +
          "count(*) AS n FROM pre_agg_fx GROUP BY CUBE(d1)")
    }
    // predicate referencing a DIM column's row values plus a measure;
    // mixed with a plain distinct and a decomposed sum
    checkExact(fires = true) {
      spark.sql(
        "SELECT d1, d2, " +
          "count(DISTINCT v_int) FILTER (WHERE d2 = 'a' OR v_dbl < 30) AS ndf, " +
          "count(DISTINCT v_int) AS nd, sum(v_dbl) AS s " +
          "FROM pre_agg_fx GROUP BY ROLLUP(d1, d2)")
    }
    // (a non-deterministic predicate is rejected by the analyzer itself
    // — INVALID_AGGREGATE_FILTER.NON_DETERMINISTIC — before the rule
    // could see it; the rule's determinism guard is defense-in-depth)
  }

  test("bail: decimal avg keeps Spark's own division typing") {
    checkExact(fires = false) {
      fixture.cube($"d1").agg(avg($"v_dec").as("a"))
    }
  }

  test("bail: decimal sum under ANSI-off keeps null-on-overflow semantics") {
    // with ANSI off, a grain-level partial sum that overflows decimal(38)
    // evaluates to NULL (CheckOverflowInSum nullOnOverflow) and a re-sum
    // would SKIP it as "no input" — turning vanilla Spark's NULL total
    // into a wrong non-null one. The rule must decline the decomposition;
    // checkExact then proves the on-plan still matches vanilla, including
    // the overflowed grand-total row staying NULL.
    // string source: the default BigDecimal encoder is decimal(38,18),
    // which 9e37 does not fit
    val big = "90000000000000000000000000000000000000"
    val df = Seq(("a", big), ("a", big), ("b", "5"))
      .toDF("d1", "vs").select($"d1", $"vs".cast("decimal(38,0)").as("v"))
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      checkExact(fires = false) {
        df.cube($"d1").agg(sum($"v").as("s"))
      }
      val total = withRule(on = true) {
        df.cube($"d1").agg(sum($"v").as("s"))
          .filter($"d1".isNull).collect()
      }
      assert(total.length === 1 && total(0).isNullAt(1),
        "overflowed legacy decimal grand total must stay NULL")
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("bail: try_sum keeps null-on-overflow semantics") {
    // TRY-mode sum nulls on overflow exactly like legacy decimal — a
    // skipped-null partial would fabricate a non-null total
    fixture.createOrReplaceTempView("pre_agg_fx")
    checkExact(fires = false) {
      spark.sql("SELECT d1, try_sum(v_int) AS s FROM pre_agg_fx GROUP BY CUBE(d1)")
    }
  }

  test("decimal sum under ANSI (the default) still decomposes") {
    checkExact(fires = true) {
      fixture.cube($"d1").agg(sum($"v_dec").as("s"))
    }
  }

  test("stats-aware adverse-case skip: a proven near-unique grain keeps the stock plan") {
    import graft.plans.StatsCatalog
    val dir = tempDir("graft-preagg-stats")
    // id is unique (the adverse grain); k has 5 values (the cube grain)
    spark.range(20000)
      .select($"id", ($"id" % 5).as("k"), ($"id" % 97).cast("double").as("v"))
      .write.mode("overwrite").parquet(s"$dir/t")
    def cubeBy(c: String) = spark.read.parquet(s"$dir/t")
      .cube(col(c)).agg(sum($"v").as("s"), count(lit(1)).as("n"))
    // un-analyzed: both fire (the r18 default — no stats, no opinion)
    assert(preAggExpands(cubeBy("id")) === 1)
    assert(preAggExpands(cubeBy("k")) === 1)
    try {
      StatsCatalog.analyze(spark, s"$dir/t")
      // analyzed: the near-unique grain is PROVEN adverse and skips; the
      // low-NDV grain keeps firing, and stays exact
      assert(preAggExpands(cubeBy("id")) === 0,
        "a near-unique grain must keep the stock plan once stats prove it")
      assert(preAggExpands(cubeBy("k")) === 1)
      val on = cubeBy("k").collect().map(_.toString).sorted.toSeq
      val off = withRule(on = false)(
        cubeBy("k").collect().map(_.toString).sorted.toSeq)
      assert(on === off)
    } finally StatsCatalog.unregister(s"$dir/t")
  }

  test("plain groupBy (no Expand) is untouched") {
    checkExact(fires = false) {
      fixture.groupBy($"d1").agg(sum($"v_dbl").as("s"))
    }
  }

  test("idempotent in the fixed-point batch: exactly one pre-aggregate") {
    withRule(on = true) {
      val df = fixture.cube($"d1", $"d2").agg(count(lit(1)).as("n"))
      assert(preAggExpands(df) === 1)
      // the pre-aggregate itself must not recurse: its child is not
      // another grain aggregate
      val nested = df.queryExecution.optimizedPlan.collect {
        case e: Expand => e.child match {
          case a: Aggregate => a.child.collect { case aa: Aggregate => aa }.size
          case _ => 0
        }
      }.sum
      assert(nested === 0, "pre-aggregate stacked on itself")
    }
  }

  test("fuzz: random dim cardinalities and aggregate mixes stay exact") {
    val rnd = new scala.util.Random(7)
    (1 to 6).foreach { trial =>
      val card = 1 + rnd.nextInt(40)
      val n = 50 + rnd.nextInt(400)
      val rows = (1 to n).map { _ =>
        (
          if (rnd.nextInt(8) == 0) null else s"k${rnd.nextInt(card)}",
          s"j${rnd.nextInt(1 + rnd.nextInt(6))}",
          rnd.nextInt(1000),
          rnd.nextDouble()
        )
      }
      val df = rows.toDF("a", "b", "x", "y")
      val aggs = Seq(
        count(lit(1)).as("n"),
        sum($"x").as("sx"),
        min($"y").as("mny"),
        max($"a").as("mxa"),
        avg($"x").as("ax"),
        countDistinct($"b").as("ndb")
      )
      val picked = rnd.shuffle(aggs).take(1 + rnd.nextInt(aggs.size))
      checkExact(fires = true) {
        if (trial % 2 == 0) df.cube($"a", $"b").agg(picked.head, picked.tail: _*)
        else df.rollup($"a", $"b").agg(picked.head, picked.tail: _*)
      }
    }
  }

  test("registered cube/rollup/grouping-sets queries ride the pre-aggregate") {
    Seq("q_agg_cube", "q_agg_rollup", "q_agg_grouping_sets",
        "q_agg_cube_distinct", "q_agg_cube_filtered_distinct").foreach { q =>
      val df = Registry.byName(q).fn(spark, SparkTestBase.Sf0001)
      assert(preAggExpands(df) === 1,
        s"$q: expected the grouping-sets Expand to read a pre-aggregate")
    }
  }
}
