package graft.plans

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{CollectLimitExec, FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** The measurable plan properties that make a query scale — extracted as
  * one comparable value so CI can pin them per query instead of verdicts
  * re-reading `explain` output by hand every round.
  *
  * The invariants pinned here are exactly the ones each round's plan
  * audit checks: how many shuffle exchanges the plan carries, which join
  * sides broadcast vs shuffle, that no cartesian product crept in, that
  * filters reached the parquet scans, and that BUILDING the frame ran no
  * Spark jobs at all (a job at build time means an action — a collect,
  * a fit, a hidden write — is hiding in the operator: the anti-pattern
  * that turns a declarative plan into a driver bottleneck at 100 TB.
  * Spark's own read-metadata jobs are PREVENTED rather than filtered:
  * warm schema caches + driver-side listing, see
  * [[PlanInvariants.prewarm]] and [[PlanInvariants.auditSession]]).
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
    buildJobs: Int,
    // equi-joins with an AGGREGATE feeding one side (no other join in
    // between) — the eager-aggregation signature: a pre-aggregate below
    // the join is the whole point of that rewrite, so its gated queries
    // pin a MINIMUM here (r19)
    aggFedJoins: Int = 0
) {
  def render: String =
    s"shuffles=$shuffleExchanges bcast=$broadcastExchanges reused=$reusedExchanges " +
      s"bhj=$broadcastHashJoins smj=$sortMergeJoins shj=$shuffledHashJoins " +
      s"bnlj=$broadcastNestedLoops cartesian=$cartesianProducts " +
      s"scans=$scans pushed=$scansWithPushedFilters " +
      s"collectLimit=$collectLimits buildJobs=$buildJobs aggFedJoins=$aggFedJoins"
}

object PlanInvariants {

  /** A sibling session with AQE off: plan shapes are compared pre-runtime
    * so they are deterministic and independent of the fixture's sizes.
    * Parallel file listing is also disabled (driver-side listing at
    * fixture scale) so a declared read can never surface as a Spark job
    * and muddy the build-action count.
    */
  def auditSession(spark: SparkSession): SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "10000")
    s2
  }

  /** Warm the per-JVM read-metadata caches the audited queries touch —
    * fixture parquet schemas (QueryUtil.t's cache; the one-time
    * inference job must not attribute to whichever query reads a table
    * first) and the federated query's one-time CSV materialization.
    * Call once before measuring; afterwards a WARM build that still runs
    * a job is a genuine driver action.
    */
  def prewarm(spark: SparkSession, sfDir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { tbl =>
      if (new java.io.File(s"$sfDir/$tbl.parquet").exists())
        graft.queries.QueryUtil.t(spark, sfDir, tbl): Unit
    }
    graft.sources.CsvSource
      .csvCopyOfParquet(spark, s"$sfDir/supplier.parquet", "supplier"): Unit
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
      buildJobs = buildJobs,
      aggFedJoins = {
        def aggAboveJoin(p: SparkPlan): Boolean = p match {
          case _: HashAggregateExec | _: ObjectHashAggregateExec |
              _: SortAggregateExec => true
          case _: BaseJoinExec => false
          case other => other.children.exists(aggAboveJoin)
        }
        count { case j: BaseJoinExec
            if Seq(j.left, j.right).exists(aggAboveJoin) => }
      }
    )
  }

  /** Run `body` with a listener counting EVERY job it starts. With the
    * read-metadata caches warm ([[prewarm]]) and parallel listing off
    * ([[auditSession]]), a declared read triggers no job at all — so
    * every counted job is a genuine driver action (a collect, a head, a
    * KMeans fit, a hidden write). No call-site allowlist: a
    * `df.write.parquet` shares its call-site shape with the schema
    *-inference job a filter would have excluded, and an allowlist that
    * lets a full materializing write through is worse than none. The
    * listener bus is asynchronous, so the count is read after it goes
    * quiet (stable for 200 ms, bounded at 3 s) — build-time jobs are
    * posted within milliseconds of the triggering action returning, so
    * a stable zero is a real zero.
    */
  def countingJobs[A](spark: SparkSession)(body: => A): (A, Int) = {
    val n = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        n.incrementAndGet()
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
