package graft

import graft.plans.{PlanInvariants, PlanShapes}
import graft.queries.Registry

/** The CI plan-invariant gate: every bench query and headline family
  * query is measured against its pinned [[graft.plans.ShapeBounds]] row.
  * A refactor that adds a shuffle, loses a broadcast or a pushed filter,
  * degenerates to a cartesian product, or sneaks a driver-side collect
  * into a build path fails HERE — not in a verdict's hand-read of
  * `explain` output three rounds later. Bench adjudication then reduces
  * to the CPU canary plus this gate: if the gate is green, a wall-clock
  * swing is the host, not the plan.
  *
  * Drift that is intentional edits the table in PlanShapes.scala — the
  * one place the pinned shape lives.
  */
class PlanAuditSpec extends SparkTestBase {

  private lazy val audit = PlanInvariants.auditSession(spark)

  private def targets =
    Registry.all.filter(q => q.bench || PlanShapes.headline(q.name))

  test("every bench + headline query has a pinned bounds row (and vice versa)") {
    val names = targets.map(_.name).toSet
    val pinned = PlanShapes.bounds.keySet
    assert(names.diff(pinned).isEmpty,
      s"audited queries missing a bounds row: ${names.diff(pinned).toSeq.sorted}")
    assert(pinned.diff(names).isEmpty,
      s"bounds rows for queries not audited (renamed? unregistered?): " +
        s"${pinned.diff(names).toSeq.sorted}")
  }

  test("plan shapes hold their pinned invariants") {
    // warm read-metadata caches so the one-time schema-inference / CSV
    // materialization jobs don't attribute to whichever query runs first
    PlanInvariants.prewarm(audit, SparkTestBase.Sf0001)
    // fixture-building queries (iceberg tables, stored MVs) build once
    // OUTSIDE the measurement so one-time materialization jobs don't
    // count against the audited refresh
    targets.filter(q => PlanShapes.warmFirst(q.name))
      .foreach(q => q.fn(audit, SparkTestBase.Sf0001): Unit)
    val failures = targets.flatMap { q =>
      val b = PlanShapes.bounds(q.name)
      val s = PlanInvariants.shape(audit, q.fn(_, SparkTestBase.Sf0001))
      val errs = PlanShapes.violations(b, s)
      if (errs.isEmpty) Nil
      else Seq(s"${q.name}: ${errs.mkString("; ")}\n  measured: ${s.render}")
    }
    assert(failures.isEmpty, "\n" + failures.mkString("\n"))
  }

  /** Root paths of every file scan in the PRE-AQE physical plan — the
    * rewrite queries run in a child session where the audit session's
    * AQE-off conf does not propagate, and the static plan is the one the
    * rewrite shapes anyway.
    */
  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toUri.getPath)
    }.flatten

  private def mvScanViolations(
      df: org.apache.spark.sql.DataFrame,
      mustRead: String,
      mustNotRead: Seq[String]): Seq[String] = {
    val paths = scanPaths(df)
    val missing =
      if (paths.exists(_.contains(mustRead))) Nil
      else Seq(s"plan does not read the MV ($mustRead); scans: $paths")
    val leaked = mustNotRead.filter(b => paths.exists(_.contains(b)))
      .map(b => s"plan reads base table $b the rewrite should have replaced")
    missing ++ leaked
  }

  test("MV rewrite queries read the registered view, never the base tables") {
    val byName = Registry.all.map(q => q.name -> q).toMap
    val rollup = byName("q_mv_rewrite").fn(spark, SparkTestBase.Sf0001)
    assert(mvScanViolations(rollup, "mv.parquet",
      Seq("lineitem.parquet")).isEmpty,
      mvScanViolations(rollup, "mv.parquet", Seq("lineitem.parquet")))
    val join = byName("q_mv_rewrite_join").fn(spark, SparkTestBase.Sf0001)
    assert(mvScanViolations(join, "mv.parquet",
      Seq("orders.parquet", "customer.parquet")).isEmpty,
      mvScanViolations(join, "mv.parquet",
        Seq("orders.parquet", "customer.parquet")))
    // the DISTINCT query must route to the MULTIPLICITY candidate
    // specifically (its workspace path carries "lineitem_mult"), not
    // merely to some MV
    val dist = byName("q_mv_rewrite_distinct").fn(spark, SparkTestBase.Sf0001)
    assert(mvScanViolations(dist, "lineitem_mult",
      Seq("lineitem.parquet")).isEmpty,
      mvScanViolations(dist, "lineitem_mult", Seq("lineitem.parquet")))
    // the advisor loop: the dashboard must read the ADVISOR-built store
    val adv = byName("q_mv_advisor").fn(spark, SparkTestBase.Sf0001)
    assert(mvScanViolations(adv, "orders_advisor",
      Seq("orders.parquet")).isEmpty,
      mvScanViolations(adv, "orders_advisor", Seq("orders.parquet")))
    // the ICEBERG advisor lifecycle: after churn + refreshStep the
    // dashboard must read the refreshed versioned store, never the
    // Iceberg base's data files (the hash oracle alone can't tell a
    // rewrite from a direct recompute — this pin can)
    val advIce = byName("q_mv_advisor_refresh").fn(spark, SparkTestBase.Sf0001)
    assert(mvScanViolations(advIce, "/mv/v",
      Seq("orders_ice")).isEmpty,
      mvScanViolations(advIce, "/mv/v", Seq("orders_ice")))
    // the maintenance sweep: after ONE maintainAll the join dashboard
    // must read the swept join store — never the Iceberg fact's data
    // files or the customer dim
    val maint = byName("q_mv_maintain").fn(spark, SparkTestBase.Sf0001)
    assert(mvScanViolations(maint, "/mv_join/v",
      Seq("orders_ice", "customer.parquet")).isEmpty,
      mvScanViolations(maint, "/mv_join/v",
        Seq("orders_ice", "customer.parquet")))
  }

  test("the gate fires on deliberate regressions") {
    // shape gate: a cartesian product + surprise shuffle against a
    // zero-shuffle pin must produce BOTH violations. Built on the
    // AQE-off audit session (the adaptive wrapper is opaque to the
    // traversal) with broadcast suppressed so the cross join really
    // plans as CartesianProductExec.
    val l = graft.queries.QueryUtil.t(audit, SparkTestBase.Sf0001, "nation")
      .hint("shuffle_replicate_nl")
    val bad = l.crossJoin(
      graft.queries.QueryUtil.t(audit, SparkTestBase.Sf0001, "region"))
      .groupBy(org.apache.spark.sql.functions.col("n_regionkey"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val s = PlanInvariants.of(bad)
    val errs = PlanShapes.violations(
      graft.plans.ShapeBounds(maxShuffles = 0), s)
    assert(errs.exists(_.contains("cartesian")), s"missing cartesian: $errs")
    assert(errs.exists(_.contains("shuffle exchanges")), s"missing shuffle: $errs")
    // maxScans gate: the same frame against a one-scan ceiling
    val scanErrs = PlanShapes.violations(
      graft.plans.ShapeBounds(maxShuffles = 9, maxScans = 1), s)
    assert(scanErrs.exists(_.contains("file scans")), s"missing scans: $scanErrs")
    // MV scan-path gate: the SAME query text with the rewrite disabled
    // (the regressed world) must be caught reading the base
    val direct = spark.read.parquet(
      s"${SparkTestBase.Sf0001}/lineitem.parquet")
      .groupBy(org.apache.spark.sql.functions.col("l_returnflag"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val caught = mvScanViolations(direct, "mv.parquet", Seq("lineitem.parquet"))
    assert(caught.size === 2, s"expected missing-MV + base-leak, got: $caught")
  }
}
