package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.queries.Registry

/** Cross-cutting contracts over the registered query surface. */
class QuerySurfaceSpec extends SparkTestBase {

  test("registry: unique names, every oracle belongs to a query") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(Registry.all.count(_.bench) >= 5, "need headline bench queries")
  }

  test("approx_count_distinct stays within its 5% error contract") {
    val rows = Registry.byName("q_agg_hll").fn(spark, SparkTestBase.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(
        math.abs(approx - exact) / exact <= 0.05,
        s"HLL error too high for ${r.get(0)}: approx=$approx exact=$exact"
      )
    }
  }

  test("entry() is non-empty (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("decontamination flags exactly the docs sharing an 8-gram with the benchmark slice") {
    val docs = graft.queries.QueryUtil
      .t(spark, SparkTestBase.Sf0001, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").toSeq)
    def grams(ws: Seq[String]): Set[String] =
      ws.sliding(8).filter(_.size == 8).map(_.mkString(" ")).toSet
    val bench = docs.filter(_._1 % 20 == 0).map { case (id, ws) => id -> grams(ws) }
    val expected = docs
      .filter(_._1 % 20 != 0)
      .flatMap { case (id, ws) =>
        val g = grams(ws)
        val hits = bench.filter(_._2.intersect(g).nonEmpty)
        if (hits.isEmpty) None
        else Some(id -> (
          hits.length.toLong,
          hits.flatMap(b => b._2.intersect(g)).toSet.size.toLong))
      }
      .toMap
    assert(expected.nonEmpty, "fixture should contain contaminated docs")
    val got = Registry.byName("q_decontaminate")
      .fn(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === expected)
  }

  test("sequence packing: each doc starts exactly where its shard's previous doc ended") {
    val rows = Registry.byName("q_pack_sequences")
      .fn(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (shard, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (id, _, nTok, bin, off) =>
        assert(bin === cum / 512, s"doc $id in shard $shard: bin")
        assert(off === cum % 512, s"doc $id in shard $shard: offset")
        cum += nTok
      }
    }
  }

  test("PII redaction leaves no unredacted PII and counts every planted item") {
    val rows = Registry.byName("q_text_redact")
      .fn(spark, SparkTestBase.Sf0001)
      .collect()
    assert(rows.length === 40)
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val ssn = "\\b\\d{3}-\\d{2}-\\d{4}\\b".r
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b".r
    val phone = "\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]?\\d{4}".r
    rows.foreach { r =>
      // counts see the planted items: 2 emails, 1 ssn, 1 ip, 1 phone
      assert(r.getLong(1) === 2L, s"doc ${r.get(0)}: n_email")
      assert(r.getLong(2) === 1L, s"doc ${r.get(0)}: n_ssn")
      assert(r.getLong(3) === 1L, s"doc ${r.get(0)}: n_ip")
      assert(r.getLong(4) === 1L, s"doc ${r.get(0)}: n_phone")
      // the clean text carries the placeholders and zero residual matches
      val clean = r.getString(5)
      Seq("<EMAIL>", "<ID>", "<IP>", "<PHONE>").foreach(tok =>
        assert(clean.contains(tok), s"doc ${r.get(0)}: missing $tok"))
      Seq(email, ssn, ip, phone).foreach(p =>
        assert(p.findFirstIn(clean).isEmpty,
          s"doc ${r.get(0)}: unredacted PII in: $clean"))
    }
  }

  test("paragraph dedup: every distinct paragraph survives exactly once, docs reassemble in order") {
    import org.apache.spark.sql.functions.col
    val rows = Registry.byName("q_dedup_paragraph")
      .fn(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // independent model: chunk each doc's tokens by 25, first occurrence wins
    val docs = graft.queries.QueryUtil
      .t(spark, SparkTestBase.Sf0001, "documents")
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").toSeq)
      .sortBy(_._1)
    val seen = collection.mutable.Set[String]()
    val model = docs.map { case (id, ws) =>
      val paras = ws.grouped(25).map(_.mkString(" ")).toSeq
      val kept = paras.filter(p => seen.add(p))
      (id, paras.size.toLong, kept, kept.mkString(" "))
    }
    assert(rows.toSeq === model.map(m => (m._1, m._2, m._3.size.toLong, m._4)).toSeq)
    // corpus-wide invariant: the kept paragraphs are pairwise distinct and
    // cover every distinct paragraph in the corpus
    val allParas = docs.flatMap { case (_, ws) => ws.grouped(25).map(_.mkString(" ")) }
    val keptParas = model.flatMap(_._3)
    assert(keptParas.distinct.size === keptParas.size)
    assert(keptParas.toSet === allParas.toSet)
    // the fixture really exercises the operator: some doc must lose a paragraph
    assert(rows.exists { case (_, n, k, _) => k < n })
  }

  test("boilerplate removal: exactly the df>=3 lines die, in every document") {
    import org.apache.spark.sql.functions.col
    val rows = Registry.byName("q_text_boilerplate")
      .fn(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // independent model: 5-token lines, df counted over DISTINCT docs,
    // df>=3 lines removed from every doc (first occurrence included)
    val docs = graft.queries.QueryUtil
      .t(spark, SparkTestBase.Sf0001, "documents")
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").toSeq)
      .sortBy(_._1)
    val lined = docs.map { case (id, ws) => id -> ws.grouped(5).map(_.mkString(" ")).toSeq }
    val df = lined
      .flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val boiler = df.collect { case (l, d) if d >= 3 => l }.toSet
    assert(boiler.nonEmpty, "fixture must exercise the operator")
    val model = lined.map { case (id, ls) =>
      val kept = ls.filterNot(boiler)
      (id, ls.size.toLong, kept.size.toLong, kept.mkString(" "))
    }
    assert(rows.toSeq === model.toSeq)
    // the defining contract vs first-wins paragraph dedup: a boilerplate
    // line survives in NO document — not even its first occurrence
    val keptLines = rows.flatMap(_._4.split(" ").grouped(5).map(_.mkString(" ")))
    assert(keptLines.forall(l => !boiler(l)))
    // and non-boilerplate duplicated lines (df=2) DO survive everywhere
    val dupKept = df.collect { case (l, 2) => l }.toSet
    assert(dupKept.exists(l => keptLines.contains(l)),
      "df=2 lines must be untouched — this pass is a df threshold, not a dedup")
  }

  test("bigram LM penalizes scrambled word order where the unigram cannot") {
    import spark.implicits._
    // corpus: a->b->c->a is the dominant transition cycle; the reversed
    // doc has the SAME unigram profile but transitions (c->b, b->a, a->c)
    // that occur nowhere else (an alternating two-word string would not
    // do: "x y x y" contains BOTH directions)
    val docs = ((1L to 8L).map(i => (i, "a b c a b c a b c")) :+
      (99L, "c b a c b a c b a")).toDF("doc_id", "text")
    val bi = graft.queries.TextQueries.bigramNll(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val uniScores = graft.queries.TextQueries.unigramNll(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // unigram is blind: identical token multiset, identical score
    assert(uniScores(99L) === uniScores(1L))
    // bigram sees the order: the scrambled doc is strictly more surprising
    assert(bi(99L) > bi(1L) + 0.1,
      s"scrambled doc not penalized: ${bi(99L)} vs ${bi(1L)}")
    // every scored position counts: n_tokens == token count
    val n = graft.queries.TextQueries.bigramNll(docs)
      .filter($"doc_id" === 1L).head().getLong(1)
    assert(n === 9L)
  }

  test("bigram LM past the broadcast bound takes the shuffle join, same rows") {
    val docs = graft.queries.QueryUtil
      .t(spark, SparkTestBase.Sf0001, "documents")
    val viaBroadcast = graft.queries.TextQueries.bigramNll(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    graft.engine.PersistScope.releaseAll()
    // bound 0 forces every model row onto the shuffle path — the plan the
    // 64k-vocab probe corpus needs, where the bigram table is ~corpus-sized
    val viaShuffle = graft.queries.TextQueries
      .bigramNll(docs, maxBroadcastBigrams = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(viaBroadcast.nonEmpty && viaBroadcast.toSeq === viaShuffle.toSeq,
      "shuffle-join fallback changed the scores")
  }

  test("quality classifier: loss decreases monotonically and the classes separate") {
    import org.apache.spark.sql.functions._
    import graft.operators.QualityClassifier
    val nBuckets = 64
    val docs = graft.queries.QueryUtil.t(spark, SparkTestBase.Sf0001, "documents")
    val feat = QualityClassifier
      .featurize(docs, col("lang") === "en", nBuckets).cache()
    try {
      val model = QualityClassifier.fit(feat, nBuckets, iters = 20, step = 1.0)
      // convergence evidence: standardized GD must descend every step
      val l = model.lossHistory
      assert(l.length === 20)
      assert(l.zip(l.tail).forall { case (a, b) => b <= a },
        s"loss not monotone: ${l.mkString(", ")}")
      assert(l.last < l.head - 0.05, s"fit barely moved: ${l.head} -> ${l.last}")
      val scored = QualityClassifier.scoreFeaturized(feat, model)
        .collect().map(r => (r.getDouble(1), r.getDouble(2)))
      assert(scored.forall { case (_, q) => q >= 0.0 && q <= 1.0 })
      val tgt = scored.filter(_._1 == 1.0).map(_._2)
      val rest = scored.filter(_._1 == 0.0).map(_._2)
      val sep = tgt.sum / tgt.length - rest.sum / rest.length
      assert(sep > 0.1,
        s"classifier failed to separate the target slice: gap $sep")
    } finally feat.unpersist(): Unit
  }

  test("filter composition commutes (ScalaCheck generators, fixed seeds)") {
    import spark.implicits._
    val df = (1 to 200).toDF("x").cache()
    val gen = Gen.choose(0, 200)
    val params = Gen.Parameters.default
    (0 until 15).foreach { i =>
      val a = gen.pureApply(params, Seed(i.toLong))
      val b = gen.pureApply(params, Seed(i.toLong + 1000))
      val n1 = df.filter($"x" > a).filter($"x" < b).count()
      val n2 = df.filter($"x" < b).filter($"x" > a).count()
      assert(n1 === n2)
      assert(n1 === (1 to 200).count(x => x > a && x < b).toLong)
    }
    df.unpersist()
  }
}
