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
}
