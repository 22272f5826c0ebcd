package graft

import graft.engine.GraftSession
import graft.queries.Registry

/** Dev tool: dump `explain("formatted")` plus the measured
  * [[graft.plans.PlanShape]] for the headline queries so plan regressions
  * (lost pushdown, accidental cartesian, fact-side broadcast, a collect
  * hiding in a build path) are visible — the same extraction
  * PlanAuditSpec pins in CI. Run: runMain graft.PlanAudit [sfDir]
  * [queryName...|--shapes]. `--shapes` prints ONLY the one-line shape
  * per bench/headline query (the quick diff against the spec's table).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val shapesOnly = args.contains("--shapes")
    // --stock disables graft's r20 decimal-sum rewrite so before/after
    // plan diffs come from one binary
    val stock = args.contains("--stock")
    val rest = args.filterNot(a => a == "--shapes" || a == "--stock")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (rest.length > 1) rest.drop(1).toSet else Set.empty[String]
    val spark = GraftSession.local(cores = 4, appName = "graft-plan-audit").spark
    val audit = graft.plans.PlanInvariants.auditSession(spark)
    if (stock) audit.conf.set("spark.graft.optimizer.unscaledDecimalSum", "false")

    val targets =
      if (names.nonEmpty) Registry.all.filter(q => names(q.name))
      else if (shapesOnly) Registry.all.filter(q =>
        q.bench || graft.plans.PlanShapes.headline(q.name))
      else Registry.all.filter(_.bench)

    graft.plans.PlanInvariants.prewarm(audit, sfDir)
    targets.foreach { q =>
      try {
        val (df, jobs) =
          graft.plans.PlanInvariants.countingJobs(audit)(q.fn(audit, sfDir))
        val s = graft.plans.PlanInvariants.of(df, jobs)
        if (shapesOnly) println(f"${q.name}%-28s ${s.render}")
        else {
          println(s"\n================ ${q.name} ================")
          println(s.render)
          // reuse the frame shape() built: a second q.fn would re-run
          // build-time work (KMeans fits, eager pins) just for explain
          println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode
          ))
        }
      } catch {
        case e: Throwable => println(s"${q.name} PLAN FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
