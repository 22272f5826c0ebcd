package graft

import graft.queries.Registry

class SimilaritySpec extends SparkTestBase {

  test("brute-force top-k: scores descend, k respected") {
    val rows = Registry.byName("q_sim_topk").fn(spark, SparkTestBase.Sf0001).collect()
    assert(rows.length === 10)
    val scores = rows.map(_.getDouble(2))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("LSH top-k is consistent with brute force on shared candidates") {
    val brute = Registry.byName("q_sim_topk").fn(spark, SparkTestBase.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val lsh = Registry.byName("q_sim_topk_lsh").fn(spark, SparkTestBase.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    assert(lsh.nonEmpty, "query bucket should not be empty")
    // any candidate both paths scored must have the identical score (same
    // expression, same vectors — LSH only changes the candidate set)
    lsh.foreach { case (id, s) =>
      brute.get(id).foreach(bs => assert(bs === s, s"score mismatch for vec $id"))
    }
  }
}
