package graft.plans

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{CollectLimitExec, FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** The measurable plan properties that make a query scale — extracted as
  * one comparable value so CI can pin them per query instead of verdicts
  * re-reading `explain` output by hand every round.
  *
  * The invariants pinned here are exactly the ones each round's plan
  * audit checks: how many shuffle exchanges the plan carries, which join
  * sides broadcast vs shuffle, that no cartesian product crept in, that
  * filters reached the parquet scans, and that BUILDING the frame ran no
  * driver-ACTION jobs (an action at build time means a collect is hiding
  * in the operator — the anti-pattern that turns a declarative plan into
  * a driver bottleneck at 100 TB; Spark's own scan-metadata jobs are
  * excluded, see [[PlanInvariants.countingJobs]]).
  *
  * Shapes are extracted from the AQE-OFF physical plan ([[auditSession]]):
  * the static shape is what survives a 100x scale-up — AQE may only
  * IMPROVE it at runtime (shuffle coalescing, broadcast demotion), and
  * `AdaptiveSparkPlanExec` is a leaf node the tree traversal could not
  * descend into anyway.
  */
final case class PlanShape(
    shuffleExchanges: Int,
    broadcastExchanges: Int,
    reusedExchanges: Int,
    broadcastHashJoins: Int,
    sortMergeJoins: Int,
    shuffledHashJoins: Int,
    broadcastNestedLoops: Int,
    cartesianProducts: Int,
    scans: Int,
    scansWithPushedFilters: Int,
    collectLimits: Int,
    buildJobs: Int
) {
  def render: String =
    s"shuffles=$shuffleExchanges bcast=$broadcastExchanges reused=$reusedExchanges " +
      s"bhj=$broadcastHashJoins smj=$sortMergeJoins shj=$shuffledHashJoins " +
      s"bnlj=$broadcastNestedLoops cartesian=$cartesianProducts " +
      s"scans=$scans pushed=$scansWithPushedFilters " +
      s"collectLimit=$collectLimits buildJobs=$buildJobs"
}

object PlanInvariants {

  /** A sibling session with AQE off: plan shapes are compared pre-runtime
    * so they are deterministic and independent of the fixture's sizes.
    */
  def auditSession(spark: SparkSession): SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2
  }

  /** Build the frame under `build`, then measure its physical plan.
    * `build` runs with a job-counting listener attached — any Spark job
    * it triggers (a collect(), a head(), an eager materialization) is
    * reported in [[PlanShape.buildJobs]].
    */
  def shape(spark: SparkSession, build: SparkSession => DataFrame): PlanShape = {
    val (df, jobs) = countingJobs(spark)(build(spark))
    of(df, jobs)
  }

  /** Measure an already-built frame's plan (buildJobs unknowable: 0). */
  def of(df: DataFrame, buildJobs: Int = 0): PlanShape = {
    val plan = df.queryExecution.executedPlan
    def count(pf: PartialFunction[SparkPlan, Unit]): Int =
      plan.collectWithSubqueries(pf.andThen(_ => 1)).size
    val scanMeta = plan.collectWithSubqueries {
      case s: FileSourceScanExec => s.metadata.getOrElse("PushedFilters", "[]")
    }
    PlanShape(
      shuffleExchanges = count { case _: ShuffleExchangeExec => },
      broadcastExchanges = count { case _: BroadcastExchangeExec => },
      reusedExchanges = count { case _: ReusedExchangeExec => },
      broadcastHashJoins = count { case _: BroadcastHashJoinExec => },
      sortMergeJoins = count { case _: SortMergeJoinExec => },
      shuffledHashJoins = count { case _: ShuffledHashJoinExec => },
      broadcastNestedLoops = count { case _: BroadcastNestedLoopJoinExec => },
      cartesianProducts = count { case _: CartesianProductExec => },
      scans = scanMeta.size,
      scansWithPushedFilters = scanMeta.count(m => m != "[]" && m.nonEmpty),
      collectLimits = count { case _: CollectLimitExec => },
      buildJobs = buildJobs
    )
  }

  /** Spark's data-source layer runs its own tiny jobs while a frame is
    * merely being DECLARED — parallel file listing and schema inference
    * surface with the read call's site ("parquet at Q.scala:51", "csv
    * at CsvSource.scala:58"). Those are metadata work every scan pays
    * once, not a driver-side collect, so they are excluded from the
    * action count the invariants pin. Genuine actions keep their own
    * call sites: "collect at", "count at", "head at", "treeAggregate
    * at" (a KMeans fit), ...
    */
  private val ScanJobSites =
    Seq("parquet at ", "csv at ", "json at ", "orc at ", "text at ",
      "load at ", "table at ")

  /** Run `body` with a listener counting DRIVER-ACTION jobs it starts
    * (scan-metadata jobs excluded, see [[ScanJobSites]]). The listener
    * bus is asynchronous, so the count is read after it goes quiet
    * (stable for 200 ms, bounded at 3 s) — build-time jobs are posted
    * within milliseconds of the triggering action returning, so a
    * stable zero is a real zero.
    */
  def countingJobs[A](spark: SparkSession)(body: => A): (A, Int) = {
    val n = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("")
        if (!ScanJobSites.exists(site.startsWith)) n.incrementAndGet()
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val a = body
      val deadline = System.nanoTime() + 3000L * 1000 * 1000
      var last = n.get()
      var stableSince = System.nanoTime()
      while (System.nanoTime() < deadline &&
        System.nanoTime() - stableSince < 200L * 1000 * 1000) {
        Thread.sleep(20)
        val now = n.get()
        if (now != last) { last = now; stableSince = System.nanoTime() }
      }
      (a, n.get())
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
