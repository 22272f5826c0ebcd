package graft

import org.apache.spark.sql.Row
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {

  test("backward as-of: latest at-or-before, inclusive ties, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, "k1", 100L), // after right@50 -> 50
      (2L, "k1", 50L),  // exact tie with right@50 -> inclusive -> 50
      (3L, "k1", 49L),  // before any right -> null
      (4L, "k2", 10L),  // key with no right rows -> null
      (5L, "k1", 200L)  // after right@150 -> 150
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("k1", 50L, 5.0),
      ("k1", 150L, 15.0)
    ).toDF("k", "ts", "v")

    val out = AsOfJoin
      .asofBackward(left, right, "k", "ts", "ts",
        Map("ts" -> "r_ts", "v" -> "r_v"))
      .select($"id", $"r_ts", $"r_v")
      .orderBy($"id")
      .collect()

    assert(out.toSeq === Seq(
      Row(1L, 50L, 5.0),
      Row(2L, 50L, 5.0),
      Row(3L, null, null),
      Row(4L, null, null),
      Row(5L, 150L, 15.0)
    ))
  }

  test("duplicate right timestamps: exactly one winner per left row, value from the dup set") {
    import spark.implicits._
    val left = Seq((1L, "k", 100L)).toDF("id", "k", "ts")
    val right = Seq(("k", 50L, 1.0), ("k", 50L, 2.0)).toDF("k", "ts", "v")
    val out = AsOfJoin
      .asofBackward(left, right, "k", "ts", "ts", Map("v" -> "rv"))
      .select($"id", $"rv")
      .collect()
    assert(out.length === 1) // never a row explosion
    assert(Set(1.0, 2.0).contains(out.head.getDouble(1))) // documented: unspecified among ties
  }

  test("null right payloads are not confused with 'no match'") {
    import spark.implicits._
    val left = Seq((1L, "k", 100L), (2L, "k", 10L)).toDF("id", "k", "ts")
    val right = Seq(("k", 50L, Option.empty[Double]), ("k", 40L, Option(4.0)))
      .toDF("k", "ts", "v")
    val out = AsOfJoin
      .asofBackward(left, right, "k", "ts", "ts",
        Map("ts" -> "r_ts", "v" -> "rv"))
      .orderBy($"id")
      .select($"r_ts", $"rv")
      .collect()
    // the payload travels as a struct, so a MATCHED row with a NULL value
    // (ts=50 for id=1) is distinct from NO match (id=2) — DuckDB ASOF
    // semantics: id=1 matches the latest row (r_ts=50) and gets its null v
    assert(out(0).getLong(0) === 50L && out(0).isNullAt(1))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
  }

  test("null join keys never match each other (NULL != NULL, DuckDB ASOF contract)") {
    import spark.implicits._
    val left = Seq(
      (1L, Option.empty[String], 100L), // null key -> must come back unmatched
      (2L, Option("k1"), 100L)          // real key -> matches right@50
    ).toDF("id", "k", "ts")
    val right = Seq(
      (Option.empty[String], 50L, 99.0), // null-keyed right row: matches nothing
      (Option("k1"), 50L, 5.0)
    ).toDF("k", "ts", "v")

    val out = AsOfJoin
      .asofBackward(left, right, "k", "ts", "ts", Map("v" -> "rv"))
      .select($"id", $"rv")
      .orderBy($"id")
      .collect()

    assert(out(0).isNullAt(1), "null-keyed left row must not match null-keyed right row")
    assert(out(1).getDouble(1) === 5.0)
  }

  test("as-of plans one shuffle on the key, no join explosion") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (i.toLong, s"k${i % 10}", i.toLong)).toDF("id", "k", "ts")
    val right = (1 to 100).map(i => (s"k${i % 10}", i.toLong, i.toDouble)).toDF("k", "ts", "v")
    val out = AsOfJoin.asofBackward(left, right, "k", "ts", "ts", Map("v" -> "rv"))
    assert(out.count() === 1000) // exactly one output row per left row
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }
}
