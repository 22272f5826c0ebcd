package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.queries.Registry

class DedupSpec extends SparkTestBase {

  test("shingles capture order; identical text -> identical shingle set") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d"),
      (2L, "d c b a")
    ).toDF("id", "t")
    val sh = df
      .select($"id", TextOps.shingles(TextOps.tokens($"t")).as("s"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .toMap
    assert(sh(1L) === Set("a b c", "b c d"))
    assert(sh(2L) === Set("d c b", "c b a"))
    assert(sh(1L).intersect(sh(2L)).isEmpty) // same words, zero overlap
  }

  test("exact dedup keeps min id per content") {
    import spark.implicits._
    val docs = Seq(
      (10L, "same text"),
      (3L, "same text"),
      (7L, "other text")
    ).toDF("doc_id", "text")
    val kept = docs
      .groupBy(sha2($"text", 256))
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getLong(1) -> r.getLong(2))
      .toMap
    assert(kept === Map(3L -> 2L, 7L -> 1L))
  }

  test("minhash-LSH finds exactly the planted near-dup pairs (sf0.001)") {
    val minhash = Registry.byName("q_dedup_minhash")
      .fn(spark, SparkTestBase.Sf0001).collect()
    val exact = Registry.byName("q_dedup_jaccard")
      .fn(spark, SparkTestBase.Sf0001).collect()
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(minhash.map(_.toString).toSet === exact.map(_.toString).toSet)
    // every reported pair is a true near-dup at the 0.5 threshold
    assert(exact.forall(_.getDouble(2) >= 0.5))
  }

  test("native MinHashSignature is bit-identical to the composed array_min form") {
    import org.apache.spark.sql.functions._
    val hs = graft.queries.QueryUtil
      .t(spark, SparkTestBase.Sf0001, "documents")
      .select(
        col("doc_id"),
        transform(
          graft.operators.TextOps.shingles(graft.operators.TextOps.tokens(col("text"))),
          x => xxhash64(x)
        ).as("hs")
      )
    val native = hs
      .select(
        col("doc_id"),
        graft.operators.TextOps.minhashSignatureArray(col("hs")).as("sig"))
      .select(col("doc_id") +: (0 until 64).map(j =>
        org.apache.spark.sql.functions.element_at(col("sig"), j + 1).as(s"mh$j")): _*)
      .collect().map(_.toString).sorted
    val composed = hs
      .select(col("doc_id") +: (0 until 64).map(j =>
        array_min(transform(col("hs"), h => xxhash64(lit(j), h))).as(s"mh$j")): _*)
      .collect().map(_.toString).sorted
    assert(native.length === composed.length)
    assert(native.toSeq === composed.toSeq)
  }

  test("fingerprint-keyed dedup equals the exact operator on this corpus") {
    val byFp = Registry.byName("q_dedup_fingerprint")
      .fn(spark, SparkTestBase.Sf0001).collect().map(_.toString).toSet
    val exact = Registry.byName("q_dedup_jaccard")
      .fn(spark, SparkTestBase.Sf0001).collect().map(_.toString).toSet
    assert(byFp === exact)
  }

  test("simhash: near-dup pairs are close in Hamming space") {
    val nearDups = Registry.byName("q_dedup_jaccard")
      .fn(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val simhashPairs = Registry.byName("q_dedup_simhash")
      .fn(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // SimHash is a weaker signal than MinHash on word-soup text, but the
    // truly-planted pairs must be among its candidates
    val missed = nearDups -- simhashPairs
    assert(
      missed.size <= nearDups.size / 5,
      s"simhash missed too many planted pairs: $missed"
    )
  }

  test("LSH candidate generation plans no cartesian product") {
    val plan = Registry.byName("q_dedup_minhash")
      .fn(spark, SparkTestBase.Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }
}
