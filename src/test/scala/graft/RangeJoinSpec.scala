package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkTestBase {

  test("bucketed epsilon join counts exactly the in-range pairs (incl. boundary)") {
    import spark.implicits._
    def ts(us: Long) = new java.sql.Timestamp(us / 1000) // ms precision is enough here
    val left = Seq(
      (1L, ts(10000000L)), // matches right at 10s±5s: 5s,10s,15s -> 3
      (2L, ts(30000000L)), // matches 25s only (boundary 25s == 30-5) -> 1
      (3L, ts(100000000L)) // nothing near -> 0
    ).toDF("id", "t")
    val right = Seq(ts(5000000L), ts(10000000L), ts(15000000L), ts(25000000L))
      .toDF("rt")

    val out = RangeJoin
      .epsilonCount(left, right, "t", "rt", 5L * 1000000)
      .select($"id", $"n_matches")
      .orderBy($"id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 3L), (2L, 1L), (3L, 0L)))
  }

  test("no cartesian in the plan") {
    import spark.implicits._
    val l = (1 to 100).map(i => (i.toLong, new java.sql.Timestamp(i * 1000L))).toDF("id", "t")
    val r = (1 to 100).map(i => new java.sql.Timestamp(i * 1500L)).toDF("rt")
    val out = RangeJoin.epsilonCount(l, r, "t", "rt", 2000000L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"range join fell back to a product:\n$plan")
    assert(out.count() === 100)
  }
}
