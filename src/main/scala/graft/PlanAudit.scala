package graft

import graft.engine.GraftSession
import graft.queries.Registry

/** Dev tool: dump `explain("formatted")` for the headline queries so plan
  * regressions (lost pushdown, accidental cartesian, fact-side broadcast)
  * are visible. Run: runMain graft.PlanAudit [sfDir] [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = GraftSession.local(cores = 4, appName = "graft-plan-audit").spark

    val targets =
      if (names.nonEmpty) Registry.all.filter(q => names(q.name))
      else Registry.all.filter(_.bench)

    targets.foreach { q =>
      println(s"\n================ ${q.name} ================")
      try {
        val df = q.fn(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode
        ))
      } catch {
        case e: Throwable => println(s"PLAN FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
