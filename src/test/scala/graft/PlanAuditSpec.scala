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
    val failures = targets.flatMap { q =>
      val b = PlanShapes.bounds(q.name)
      val s = PlanInvariants.shape(audit, q.fn(_, SparkTestBase.Sf0001))
      val errs = Seq(
        (s.cartesianProducts == 0) ->
          s"cartesian product in the plan (${s.cartesianProducts})",
        (s.shuffleExchanges <= b.maxShuffles) ->
          s"shuffle exchanges ${s.shuffleExchanges} > pinned ${b.maxShuffles}",
        (s.broadcastHashJoins >= b.minBroadcastJoins) ->
          s"broadcast joins ${s.broadcastHashJoins} < pinned ${b.minBroadcastJoins} (a dim side stopped broadcasting)",
        (s.sortMergeJoins + s.shuffledHashJoins <= b.maxShuffleJoins) ->
          s"shuffle-side joins ${s.sortMergeJoins + s.shuffledHashJoins} > pinned ${b.maxShuffleJoins}",
        (s.scansWithPushedFilters >= b.minPushedScans) ->
          s"scans with pushed filters ${s.scansWithPushedFilters} < pinned ${b.minPushedScans}",
        (s.buildJobs <= b.maxBuildJobs) ->
          s"build ran ${s.buildJobs} driver-action jobs > allowed ${b.maxBuildJobs} (a collect crept into the build path)",
        (b.allowBnlj || s.broadcastNestedLoops == 0) ->
          s"broadcast nested loop join appeared (${s.broadcastNestedLoops}) where none is allowed"
      ).collect { case (false, msg) => msg }
      if (errs.isEmpty) Nil
      else Seq(s"${q.name}: ${errs.mkString("; ")}\n  measured: ${s.render}")
    }
    assert(failures.isEmpty, "\n" + failures.mkString("\n"))
  }
}
