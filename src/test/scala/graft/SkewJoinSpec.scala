package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkTestBase {

  test("salted join equals plain join on heavily skewed data") {
    import spark.implicits._
    // 10k rows of one hot key + a uniform tail — the classic skew shape
    val fact = ((1 to 10000).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong + 1, i)))
      .toDF("k", "v")
    val dim = (1 to 101).map(i => (i.toLong, s"dim$i")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k")).groupBy($"k", $"name")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val salted = SkewJoin.saltedInnerJoin(fact, dim, "k", salts = 8)
      .groupBy($"k", $"name")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))

    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
  }

  test("null join keys drop out of the salted join like the plain inner join") {
    import spark.implicits._
    val fact = Seq((Option(1L), 10), (Option.empty[Long], 20), (Option(1L), 30))
      .toDF("k", "v")
    val dim = Seq((Option(1L), "one"), (Option.empty[Long], "null-dim"))
      .toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).count()
    val salted = SkewJoin.saltedInnerJoin(fact, dim, "k", salts = 4).count()
    assert(salted === plain)
    assert(salted === 2) // null keys never match in an inner equi join
  }

  test("salting preserves row multiplicity (no dup or loss on the hot key)") {
    import spark.implicits._
    val fact = (1 to 5000).map(_ => (42L, 1)).toDF("k", "v")
    val dim = Seq((42L, "hot")).toDF("k", "name")
    val joined = SkewJoin.saltedInnerJoin(fact, dim, "k", salts = 16)
    assert(joined.count() === 5000)
  }

  test("AQE splits an above-threshold skewed partition at runtime (skew=true SMJ)") {
    // The FIRST-resort path the SkewJoin scaladoc points at: prove AQE's
    // runtime skew split actually fires on this session's conf lineage,
    // complementing the manual-salting table in BASELINE.md. Thresholds
    // are shrunk so a test-sized hot key crosses them; the detection
    // logic (partition > max(threshold, 5x median) -> split) is the same
    // one that fires at 100 TB sizes.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")

    val pad = "x" * 64
    // one hot key holding 80% of the rows (plus payload bytes so the hot
    // shuffle partition dwarfs both the 64KB threshold and 2x the median
    // partition); uniform tail elsewhere
    val fact = s2.range(0, 200000).select(
      when(col("id") % 10 < 8, lit(1L)).otherwise(col("id")).as("k"),
      concat(lit(pad), col("id")).as("payload"))
    val dim = s2.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
    // the global agg keeps payload un-pruned (its length is consumed) and
    // imposes no partitioning requirement that would veto the skew split;
    // collect() executes THIS df's own QueryExecution, so its adaptive
    // plan is final when inspected (a .write would execute a copy)
    val agg = fact.join(dim, Seq("k")).agg(sum(length(col("payload"))).as("n"))
    agg.collect()

    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      "AQE did not mark the SMJ as skew-split:\n" + plan.take(3000))
  }
}
