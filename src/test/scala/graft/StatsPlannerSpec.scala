package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

import graft.plans.StatsCatalog

/** plans.RelationStats — the harvested-statistics hand-off to Spark's
  * OWN planner. Contract under test: analyzed path-backed relations gain
  * a synthetic catalog entry carrying rowCount + NDVs (visible to CBO),
  * a dictionary-compressed table whose TRUE row count dwarfs its file
  * size stops broadcasting once analyzed (the scale-safety direction:
  * file size lies small, statistics tell the truth), non-CBO sessions
  * keep byte-identical plans, results never change, and the kill switch
  * restores stock behavior.
  */
class StatsPlannerSpec extends SparkTestBase {

  // two dictionary-friendly tables: ~1M rows each but only 100/7 (resp.
  // 100/5) distinct values, so the parquet files compress far under the
  // 10 MB broadcast threshold while the TRUE in-memory size (rowCount x
  // row width under CBO) is ~24 MB — the shape where trusting file size
  // broadcasts a million-row build side
  private lazy val (pathA, pathB): (String, String) = {
    val dir = tempDir("graft-relstats")
    val a = s"$dir/a"
    val b = s"$dir/b"
    spark.range(0, 1000000)
      .select((col("id") % 100).as("k"), (col("id") % 7).as("v"))
      .write.mode("overwrite").parquet(a)
    spark.range(0, 1000000)
      .select((col("id") % 100).as("k2"), (col("id") % 5).as("w"))
      .write.mode("overwrite").parquet(b)
    (a, b)
  }

  private def q(s: SparkSession): DataFrame = {
    val da = s.read.parquet(pathA)
    val db = s.read.parquet(pathB)
    da.join(db, da("k") === db("k2")).groupBy(da("v"))
      .agg(count(lit(1)).as("n"))
  }

  /** Broadcast hash joins in the (pre-adaptive) physical plan. */
  private def bhj(df: DataFrame): Int =
    df.queryExecution.sparkPlan.collect {
      case b: BroadcastHashJoinExec => b
    }.size

  private def newSession(cbo: Boolean): SparkSession = {
    val s = spark.newSession()
    // plain physical plan (no AQE wrapper) so the join strategy is
    // directly visible; the file-size-vs-rowCount contrast is identical
    // under AQE, whose initial plan is this one
    s.conf.set("spark.sql.adaptive.enabled", "false")
    if (cbo) s.conf.set("spark.sql.cbo.enabled", "true")
    s
  }

  test("analyzed relations surface rowCount + NDVs to CBO; broadcast flips to shuffle join") {
    val s2 = newSession(cbo = true)
    // un-analyzed: the tiny files broadcast a million-row side
    assert(bhj(q(s2)) === 1, "fixture expectation: file size under threshold")
    StatsCatalog.analyzeScoped(s2, pathA)
    StatsCatalog.analyzeScoped(s2, pathB)
    val df = q(s2)
    // the synthetic catalog entry carries the harvested statistics
    val cats = df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation if lr.catalogTable.isDefined =>
        lr.catalogTable.get
    }
    assert(cats.size === 2, "both analyzed scans must carry a catalog entry")
    cats.foreach { ct =>
      assert(ct.identifier.database.contains("graft_stats"))
      assert(ct.stats.flatMap(_.rowCount).contains(BigInt(1000000)))
      assert(ct.stats.exists(_.colStats.nonEmpty), "NDVs must ride along")
    }
    // rowCount x width (~24 MB) exceeds the 10 MB threshold: Spark now
    // REFUSES the dangerous broadcast it would have made from file size
    assert(bhj(df) === 0,
      "statistics must stop the million-row broadcast")
    // and the results are identical either way (statistics change plan
    // choice, never semantics)
    val s3 = newSession(cbo = false)
    val stock = q(s3).collect().map(_.toString).sorted.toSeq
    val armed = df.collect().map(_.toString).sorted.toSeq
    assert(armed === stock, "CBO-armed plan drifted from stock results")
  }

  test("CostBasedJoinReorder reorders a 3-table join exactly when the tables are analyzed") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    val dir = tempDir("graft-reorder")
    val (big1, big2, sel) = (s"$dir/big1", s"$dir/big2", s"$dir/sel")
    // big1 ⋈ big2 produces ~20M rows (500 shared keys); big1 ⋈ sel
    // only ~20k — the DP must sink `sel` to the bottom of the tree,
    // which it can only know from rowCount + key NDVs
    spark.range(0, 100000)
      .select((col("id") % 500).as("k"), (col("id") % 7).as("v1"))
      .write.mode("overwrite").parquet(big1)
    spark.range(0, 100000)
      .select((col("id") % 500).as("k2"), (col("id") % 5).as("v2"))
      .write.mode("overwrite").parquet(big2)
    spark.range(0, 100).select(col("id").as("k3"))
      .write.mode("overwrite").parquet(sel)
    def q(s: SparkSession): DataFrame = {
      val b1 = s.read.parquet(big1)
      val b2 = s.read.parquet(big2)
      val sl = s.read.parquet(sel)
      // syntactic order: the catastrophic join FIRST
      b1.join(b2, b1("k") === b2("k2")).join(sl, b1("k") === sl("k3"))
        .groupBy(b1("v1")).agg(count(lit(1)).as("n"))
    }
    /** Output column names of the DEEPEST join in the optimized plan. */
    def deepestJoinCols(df: DataFrame): Set[String] = {
      val deepest = df.queryExecution.optimizedPlan.collect {
        case j: LJoin if j.collect { case jj: LJoin => jj }.size == 1 => j
      }
      assert(deepest.size === 1, "expected exactly one innermost join")
      deepest.head.output.map(_.name).toSet
    }
    val s2 = newSession(cbo = true)
    s2.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    // un-analyzed: no rowCount, the DP refuses — syntactic order kept
    assert(!deepestJoinCols(q(s2)).contains("k3"),
      "without statistics the syntactic join order must survive")
    StatsCatalog.analyzeScoped(s2, big1)
    StatsCatalog.analyzeScoped(s2, big2)
    StatsCatalog.analyzeScoped(s2, sel)
    val df = q(s2)
    assert(deepestJoinCols(df).contains("k3"),
      "analyzed statistics must let the DP join the selective table first")
    // semantics preserved: same rows as the stock (non-CBO) plan
    val stock = q(newSession(cbo = false)).collect()
      .map(_.toString).sorted.toSeq
    assert(df.collect().map(_.toString).sorted.toSeq === stock,
      "reordered plan drifted from stock results")
  }

  test("non-CBO sessions keep byte-identical join choices; kill switch restores stock") {
    // analyzed but CBO off: toPlanStats only surfaces sizeInBytes, which
    // stays the REAL file size — the broadcast choice is unchanged
    val s4 = newSession(cbo = false)
    StatsCatalog.analyzeScoped(s4, pathA)
    StatsCatalog.analyzeScoped(s4, pathB)
    assert(bhj(q(s4)) === 1,
      "without CBO the plan must look exactly like stock Spark")
    // kill switch: CBO on but the rule disabled — no catalog entries
    val s5 = newSession(cbo = true)
    s5.conf.set("spark.graft.optimizer.relationStats", "false")
    StatsCatalog.analyzeScoped(s5, pathA)
    StatsCatalog.analyzeScoped(s5, pathB)
    val df5 = q(s5)
    assert(df5.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation if lr.catalogTable.isDefined => lr
    }.isEmpty, "kill switch must keep relations catalog-free")
    assert(bhj(df5) === 1)
  }
}
