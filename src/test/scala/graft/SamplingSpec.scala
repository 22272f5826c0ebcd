package graft

import graft.queries.{QueryUtil, Registry}

class SamplingSpec extends SparkTestBase {

  test("seeded sample is deterministic and lands in binomial bounds") {
    val a = Registry.byName("q_sample_bernoulli").fn(spark, SparkTestBase.Sf0001)
      .collect().map(_.getLong(0)).toSeq
    val b = Registry.byName("q_sample_bernoulli").fn(spark, SparkTestBase.Sf0001)
      .collect().map(_.getLong(0)).toSeq
    assert(a === b, "same seed must give the same sample")
    val total = QueryUtil.t(spark, SparkTestBase.Sf0001, "documents").count()
    // p=0.2: allow +-5 sigma of binomial(total, 0.2)
    val mean = 0.2 * total
    val sigma = math.sqrt(total * 0.2 * 0.8)
    assert(math.abs(a.size - mean) <= 5 * sigma, s"sample size ${a.size} vs mean $mean")
  }

  test("hash sample keeps a stable ~1/5 and is idempotent by construction") {
    val rows = Registry.byName("q_sample_hash").fn(spark, SparkTestBase.Sf0001)
      .collect().map(_.getLong(0)).toSet
    val total = QueryUtil.t(spark, SparkTestBase.Sf0001, "documents").count()
    assert(rows.nonEmpty && rows.size < total)
    // hash membership is a function of content: re-evaluation is identical
    val again = Registry.byName("q_sample_hash").fn(spark, SparkTestBase.Sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(rows === again)
  }

  test("DSIR selects target-like docs: top-50 is en-dominated and deterministic") {
    val top = Registry.byName("q_sample_dsir").fn(spark, SparkTestBase.Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(top.length === 50)
    // sorted by weight desc with doc_id tiebreak
    assert(top.sameElements(top.sortBy(t => (-t._3, t._1))))
    // the target distribution was fitted on the en slice, so en docs must
    // dominate the selection (the corpus is ~half en; the top-50 should be
    // clearly above that base rate, else the importance weights are noise)
    val enShare = top.count(_._2 == "en").toDouble / top.length
    val baseRate = {
      val byLang = QueryUtil.t(spark, SparkTestBase.Sf0001, "documents")
        .groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      byLang("en").toDouble / byLang.values.sum
    }
    assert(enShare > baseRate + 0.15,
      s"top-50 en share $enShare should clearly exceed corpus base rate $baseRate")
    // content-hash features: re-evaluation is bit-identical
    val again = Registry.byName("q_sample_dsir").fn(spark, SparkTestBase.Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(top.toSeq === again.toSeq)
  }

  test("mixing keeps en at a higher rate than other languages") {
    val kept = Registry.byName("q_sample_mix").fn(spark, SparkTestBase.Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = QueryUtil.t(spark, SparkTestBase.Sf0001, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = kept.getOrElse("en", 0L).toDouble / byLang("en")
    val otherKept = (kept - "en").values.sum.toDouble
    val otherTotal = (byLang - "en").values.sum.toDouble
    assert(enRate > otherKept / otherTotal, s"en rate $enRate should exceed others")
  }
}
