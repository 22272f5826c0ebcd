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

  test("fused setsWithSignatures equals shingleSets joined with signatures") {
    // r20 build-job fusion: the hot dedup paths pin ONE (doc_id, sh, sig)
    // frame instead of two sequential cache fills — this pins that the
    // fused projection is value-identical to the composed pipeline
    import graft.operators.MinHashIndex
    val doc = graft.queries.QueryUtil.t(spark, SparkTestBase.Sf0001, "documents")
    val fused = MinHashIndex.setsWithSignatures(doc)
      .select("doc_id", "sh", "sig").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1), r.getSeq[Long](2))).toSet
    val sets = MinHashIndex.shingleSets(doc)
    val composed = sets
      .join(MinHashIndex.signatures(sets), "doc_id")
      .select("doc_id", "sh", "sig").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1), r.getSeq[Long](2))).toSet
    assert(fused === composed)
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

  test("incremental dedup equals the full operator restricted to the increment") {
    val full = Registry.byName("q_dedup_minhash")
      .fn(spark, SparkTestBase.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val incr = Registry.byName("q_dedup_incremental")
      .fn(spark, SparkTestBase.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // Symmetric contract: a pair is reported iff EITHER side is in the
    // increment — duplicates must be caught regardless of which doc got
    // the higher id at ingest.
    assert(incr === full.filter(p => p._1 % 10 == 9 || p._2 % 10 == 9),
      "new-batch-vs-corpus dedup must find exactly the full operator's pairs with at least one side in the increment")
    // Regression pin for the id-order asymmetry (round-8 ADVICE medium):
    // sf0.001 plants duplicates whose increment doc has the SMALLER id —
    // e.g. doc 89 (%10==9) duplicating corpus doc 114. An id-ordered
    // candidate join drops all of these; the symmetric join must not.
    val smallerIdIncrement = incr.filter(p => p._1 % 10 == 9 && p._2 % 10 != 9)
    assert(smallerIdIncrement.nonEmpty,
      "fixture must exercise the increment-doc-has-smaller-id direction")
    assert(smallerIdIncrement.exists(p => p._1 == 89L && p._2 == 114L),
      "planted pair (89, 114) — increment doc 89 vs higher-id corpus dup 114 — must be flagged")
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

  test("incremental dedup on a DISJOINT batch flags intra-increment duplicates too") {
    import spark.implicits._
    // production shape: the increment shares no ids with the stored
    // corpus. Its own internal duplicate pair (201, 205) must be flagged —
    // a store-only candidate join would silently miss it — alongside the
    // increment-vs-corpus duplicate (3, 209).
    // per-seed disjoint vocabulary: distinct seeds share ZERO shingles
    def sent(seed: Int): String =
      (0 until 30).map(i => s"w${seed}x$i").mkString(" ")
    val corpus = Seq(
      (1L, sent(1)), (2L, sent(2)), (3L, sent(3)), (4L, sent(4))
    ).toDF("doc_id", "text")
    val increment = Seq(
      (201L, sent(10)),
      (205L, sent(10)), // intra-increment duplicate pair
      (209L, sent(3)),  // duplicates corpus doc 3
      (212L, sent(12))  // unique — must not pair with anything
    ).toDF("doc_id", "text")
    val idx = graft.operators.MinHashIndex
      .materialize(corpus, tempDir("graft-minhash-disjoint"))
    val pairs = graft.queries.DedupQueries
      .incrementalPairs(spark, increment, idx, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((201L, 205L)), s"intra-increment pair missed: $pairs")
    assert(pairs.contains((3L, 209L)), s"corpus-vs-increment pair missed: $pairs")
    assert(!pairs.exists(p => p._1 == 212L || p._2 == 212L), s"false positive: $pairs")
  }

  // ---------------------------------------------------------------------
  // versioned index: crash matrix (fault injected at every commit step)
  // ---------------------------------------------------------------------

  private def crashSent(tag: String)(seed: Int): String =
    (0 until 30).map(i => s"$tag${seed}z$i").mkString(" ")

  private def allRows(
      idx: graft.operators.MinHashIndex.StoredIndex): (Seq[String], Seq[String]) = (
    graft.operators.MinHashIndex.bands(spark, idx)
      .collect().map(_.toString).sorted.toSeq,
    graft.operators.MinHashIndex.shingles(spark, idx)
      .collect().map(_.toString).sorted.toSeq)

  private def assertExactNoDups(
      got: (Seq[String], Seq[String]), want: (Seq[String], Seq[String]),
      clue: String): Unit = {
    assert(got._1.size === got._1.distinct.size, s"$clue: duplicate band rows")
    assert(got._2.size === got._2.distinct.size, s"$clue: duplicate shingle rows")
    assert(got._1 === want._1, s"$clue: band rows differ")
    assert(got._2 === want._2, s"$clue: shingle rows differ")
  }

  private def crashAt(point: String): String => Unit =
    p => if (p == point) throw new RuntimeException(s"injected crash @$p")

  test("index foldOnce is replay-idempotent; compact coalesces; dedupe heals append misuse") {
    import graft.operators.MinHashIndex
    import spark.implicits._
    val sent = crashSent("c") _
    val corpus = Seq((1L, sent(1)), (2L, sent(2))).toDF("doc_id", "text")
    val batch = Seq((10L, sent(1)), (11L, sent(5))).toDF("doc_id", "text")
    val idx = MinHashIndex.materialize(corpus, tempDir("graft-minhash-compact"))

    // a replayed batch (same token) must fold exactly once
    assert(MinHashIndex.foldOnce(batch, idx, "b-1"))
    assert(!MinHashIndex.foldOnce(batch, idx, "b-1"), "replay was not skipped")
    val clean = allRows(idx)
    assert(clean._1.size === clean._1.distinct.size)

    // at-least-once append API misused twice: corpus rows land TWICE
    MinHashIndex.append(corpus, idx)
    assert(MinHashIndex.bands(spark, idx).count() > clean._1.size.toLong)
    // the operator's output stays duplicate-free over the dirty store
    val pairs = graft.queries.DedupQueries
      .incrementalPairs(spark, batch, idx, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === pairs.distinct.toSeq, s"duplicate pairs: ${pairs.toSeq}")
    assert(pairs.contains((1L, 10L)), s"planted dup lost: ${pairs.toSeq}")

    // compaction with dedupe drops the exact duplicates, coalesces to one file
    MinHashIndex.compact(spark, idx, nFiles = 1, dedupe = true)
    assertExactNoDups(allRows(idx), clean, "post-compact")
    val v = MinHashIndex.currentVersion(spark, idx)
    val files = new java.io.File(s"${idx.root}/v$v/base/bands")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files === 1, s"expected 1 data file after compaction, got $files")
  }

  test("compactStep merges only the smallest segments; reads exact; carried segments never copied") {
    import graft.operators.MinHashIndex
    import spark.implicits._
    val sent = crashSent("s") _
    // base = 6 docs (the BIG segment); three 1-doc folds = the small tail
    val corpus = (1 to 6).map(i => (i.toLong, sent(i))).toDF("doc_id", "text")
    val idx = MinHashIndex.materialize(corpus, tempDir("graft-mh-step"))
    (10 to 12).foreach { i =>
      assert(MinHashIndex.foldOnce(
        Seq((i.toLong, sent(i))).toDF("doc_id", "text"), idx, s"b-$i"))
    }
    assert(MinHashIndex.segmentCount(spark, idx) === 4)
    val before = allRows(idx)
    // merge the 2 smallest (two of the 1-doc batches): base + the third
    // batch must stay PHYSICALLY in the v1 dir, referenced, not copied
    assert(MinHashIndex.compactStep(spark, idx, mergeCount = 2))
    assert(MinHashIndex.segmentCount(spark, idx) === 3)
    assertExactNoDups(allRows(idx), before, "after step 1")
    val v1base = new java.io.File(s"${idx.root}/v1/base")
    assert(v1base.isDirectory,
      "the big kept segment must stay in its original version dir")
    assert(new java.io.File(s"${idx.root}/v2/_carried").isFile,
      "the new version must reference the kept segments")
    // fold into the stepped version, step again, fold again: the chain
    // of carried references keeps resolving to one physical home
    assert(MinHashIndex.foldOnce(
      Seq((20L, sent(20))).toDF("doc_id", "text"), idx, "b-20"))
    assert(MinHashIndex.compactStep(spark, idx, mergeCount = 2))
    val afterChain = allRows(idx)
    assert(afterChain._2.size === before._2.size + 1, "fold row lost in the chain")
    // a replayed fold still skips across versions
    assert(!MinHashIndex.foldOnce(
      Seq((20L, sent(20))).toDF("doc_id", "text"), idx, "b-20"))
    // the FULL compact converges everything to one base and removes the
    // old host dirs entirely
    MinHashIndex.compact(spark, idx, nFiles = 1)
    assert(MinHashIndex.segmentCount(spark, idx) === 1)
    assertExactNoDups(allRows(idx), afterChain, "after full compact")
    assert(!v1base.exists, "full compact must clear the carried hosts")
    graft.engine.PersistScope.releaseAll()
  }

  test("compactStep + tombstones: covered lists absorbed or carried, re-fold visibility preserved") {
    import graft.operators.MinHashIndex
    import spark.implicits._
    val sent = crashSent("t2") _
    val corpus = (1 to 5).map(i => (i.toLong, sent(i))).toDF("doc_id", "text")
    val idx = MinHashIndex.materialize(corpus, tempDir("graft-mh-step-tomb"))
    (10 to 11).foreach { i =>
      assert(MinHashIndex.foldOnce(
        Seq((i.toLong, sent(i))).toDF("doc_id", "text"), idx, s"b-$i"))
    }
    // delete doc 10 (scope = all three current segments) and doc 1
    assert(MinHashIndex.deleteOnce(Seq(10L).toDF("doc_id"), idx, "d1"))
    // re-fold doc 10: lands uncovered, visible (the update shape)
    assert(MinHashIndex.foldOnce(
      Seq((10L, sent(10))).toDF("doc_id", "text"), idx, "b-10-refold"))
    def live(id: Long): Long = MinHashIndex.shingles(spark, idx)
      .filter($"doc_id" === id).count()
    assert(live(10L) === 1L)
    val before = allRows(idx)
    val tombsBefore = MinHashIndex.tombstoneCount(spark, idx)
    assert(tombsBefore === 1)
    // merge the two smallest segments (1-doc batches). The d1 list's
    // scope spans base too, so it is NOT fully absorbed — it must carry
    // and keep hiding doc 10's OLD rows while the re-fold stays visible
    assert(MinHashIndex.compactStep(spark, idx, mergeCount = 2))
    assertExactNoDups(allRows(idx), before, "after step with live list")
    assert(MinHashIndex.tombstoneCount(spark, idx) === 1,
      "a partially-covered list must carry, not die")
    assert(live(10L) === 1L, "re-fold visibility must survive the step")
    // now merge EVERYTHING: every covered segment is in the merge set,
    // the list's dead rows are physically dropped, the list absorbed
    assert(MinHashIndex.compactStep(spark, idx, mergeCount = 64))
    assert(MinHashIndex.tombstoneCount(spark, idx) === 0,
      "a fully-covered list must be absorbed by the merge")
    assertExactNoDups(allRows(idx), before, "after absorbing step")
    assert(live(10L) === 1L)
    graft.engine.PersistScope.releaseAll()
  }

  test("compactStep retires legacy scope-less lists: narrowed per step, re-folds unhidden, absorbed when covered") {
    import graft.operators.MinHashIndex
    import spark.implicits._
    val sent = crashSent("lg") _
    val corpus = (1 to 5).map(i => (i.toLong, sent(i))).toDF("doc_id", "text")
    val idx = MinHashIndex.materialize(corpus, tempDir("graft-mh-legacy"))
    (10 to 11).foreach { i =>
      assert(MinHashIndex.foldOnce(
        Seq((i.toLong, sent(i))).toDF("doc_id", "text"), idx, s"b-$i"))
    }
    // delete doc 10, then STRIP the list's _scope side file — the
    // pre-r18 legacy shape whose global coverage hides future re-folds
    assert(MinHashIndex.deleteOnce(Seq(10L).toDF("doc_id"), idx, "d1"))
    def delDirs(v: Int): Seq[java.io.File] =
      new java.io.File(s"${idx.root}/v$v").listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("del-"))
    val v0 = MinHashIndex.currentVersion(spark, idx)
    delDirs(v0).foreach { d =>
      val scope = new java.io.File(d, "_scope")
      assert(scope.isFile, "fixture expectation: r18+ lists are scoped")
      assert(scope.delete())
    }
    def live(id: Long): Long = MinHashIndex.shingles(spark, idx)
      .filter($"doc_id" === id).count()
    assert(live(10L) === 0L)
    val before = allRows(idx)
    // a leveled step that merges the two 1-doc batch segments: doc 10's
    // dead rows drop physically with its segment, the legacy list must
    // come out NARROWED to the surviving base segment — not carried
    // globally forever (the r19 behavior this test pins the fix for)
    assert(MinHashIndex.compactStep(spark, idx, mergeCount = 2))
    assertExactNoDups(allRows(idx), before, "after narrowing step")
    assert(MinHashIndex.tombstoneCount(spark, idx) === 1,
      "a narrowed list still covers the kept segments")
    val v1 = MinHashIndex.currentVersion(spark, idx)
    delDirs(v1).foreach { d =>
      assert(new java.io.File(d, "_scope").isFile,
        "the legacy list must be rewritten WITH a scope")
    }
    // the behavioral payoff: a re-fold of the deleted id lands in a new
    // segment OUTSIDE the narrowed scope and is visible again — under
    // the old global list it stayed hidden until a FULL compact
    assert(MinHashIndex.foldOnce(
      Seq((10L, sent(10))).toDF("doc_id", "text"), idx, "b-10-refold"))
    assert(live(10L) === 1L,
      "re-fold hidden: the legacy list was not narrowed")
    // a step that merges every segment the narrowed scope still names
    // absorbs the list entirely
    assert(MinHashIndex.compactStep(spark, idx, mergeCount = 64))
    assert(MinHashIndex.tombstoneCount(spark, idx) === 0,
      "the narrowed list must absorb once its scope is fully merged")
    assert(live(10L) === 1L)
    graft.engine.PersistScope.releaseAll()
  }

  test("compactStep crash matrix: reads exact at every fault point; rerun converges") {
    import graft.operators.MinHashIndex
    import spark.implicits._
    val sent = crashSent("sc2") _
    val corpus = (1 to 4).map(i => (i.toLong, sent(i))).toDF("doc_id", "text")
    for (point <- Seq("recovered", "next-version-written", "legacy-narrowed",
        "carried-written", "committed", "old-cleaned")) {
      val idx = MinHashIndex.materialize(corpus, tempDir("graft-step-crash"))
      (10 to 11).foreach { i =>
        assert(MinHashIndex.foldOnce(
          Seq((i.toLong, sent(i))).toDF("doc_id", "text"), idx, s"b-$i"))
      }
      val before = allRows(idx)
      val boom = intercept[RuntimeException] {
        MinHashIndex.compactStepWithFaults(
          spark, idx, 2, crashAt(point))
      }
      assert(boom.getMessage.contains(point))
      // post-crash reads are EXACT at every fault point (the version
      // marker is the one commit; carried hosts must never be torn)
      assertExactNoDups(allRows(idx), before, s"$point post-crash")
      // rerun converges (recovery first, then a clean step)
      assert(MinHashIndex.compactStep(spark, idx, mergeCount = 2))
      assertExactNoDups(allRows(idx), before, s"$point post-rerun")
      // and the store still folds + fully compacts afterwards
      assert(MinHashIndex.foldOnce(
        Seq((30L, sent(30))).toDF("doc_id", "text"), idx, "b-30"))
      MinHashIndex.compact(spark, idx, nFiles = 1)
      assert(MinHashIndex.shingles(spark, idx).count() === before._2.size + 1L,
        s"$point: rows lost through the post-crash lifecycle")
    }
    graft.engine.PersistScope.releaseAll()
  }

  test("fold crash matrix: zero loss AND zero duplication at every fault point") {
    import graft.operators.MinHashIndex
    import spark.implicits._
    val sent = crashSent("f") _
    val corpus = Seq((1L, sent(1)), (2L, sent(2))).toDF("doc_id", "text")
    val batch = Seq((10L, sent(1)), (11L, sent(5))).toDF("doc_id", "text")
    for (point <- Seq("segment-written", "published")) {
      val idx = MinHashIndex.materialize(corpus, tempDir(s"graft-fold-crash"))
      val before = allRows(idx)
      val boom = intercept[RuntimeException] {
        MinHashIndex.foldOnceWithFaults(batch, idx, "b1", crashAt(point))
      }
      assert(boom.getMessage.contains(point))
      // post-crash reads are consistent: either the fold is invisible or
      // fully visible — never partial, never duplicated
      val mid = allRows(idx)
      assert(mid._1.size === mid._1.distinct.size, s"$point: dup band rows")
      assert(mid._1 === before._1 || mid._1.size > before._1.size)
      // replay converges to exactly-once
      MinHashIndex.foldOnce(batch, idx, "b1"): Unit
      val after = allRows(idx)
      assert(after._1.size > before._1.size, s"$point: batch rows lost")
      assertExactNoDups(after, after, s"$point replayed") // self-check dups
      assert(!MinHashIndex.foldOnce(batch, idx, "b1"), s"$point: replay not skipped")
      // the final state equals a crash-free fold's state
      val cleanIdx = MinHashIndex.materialize(corpus, tempDir("graft-fold-clean"))
      assert(MinHashIndex.foldOnce(batch, cleanIdx, "b1"))
      assertExactNoDups(after, allRows(cleanIdx), s"$point final-vs-clean")
    }
  }

  test("compact crash matrix: reads exact at every fault point; rerun converges") {
    import graft.operators.MinHashIndex
    import spark.implicits._
    val sent = crashSent("k") _
    val corpus = Seq((1L, sent(1)), (2L, sent(2))).toDF("doc_id", "text")
    val batch1 = Seq((10L, sent(5))).toDF("doc_id", "text")
    val batch2 = Seq((20L, sent(7))).toDF("doc_id", "text")
    for (point <- Seq("recovered", "next-version-written", "committed", "old-dir-removed")) {
      val idx = MinHashIndex.materialize(corpus, tempDir("graft-compact-crash"))
      assert(MinHashIndex.foldOnce(batch1, idx, "b1"))
      val expected = allRows(idx)
      val boom = intercept[RuntimeException] {
        MinHashIndex.compactWithFaults(spark, idx, 1, false, crashAt(point))
      }
      assert(boom.getMessage.contains(point))
      // whichever side of the commit the crash landed on, readers see the
      // exact row set — the commit is atomic, so never a blend, a loss,
      // or a duplicate
      assertExactNoDups(allRows(idx), expected, s"$point post-crash")
      // a rerun recovers and completes
      MinHashIndex.compact(spark, idx, nFiles = 1)
      assertExactNoDups(allRows(idx), expected, s"$point recompacted")
      // the index stays fully operational: fold + replay-skip + read
      assert(MinHashIndex.foldOnce(batch2, idx, "b2"), s"$point: post-recovery fold")
      assert(!MinHashIndex.foldOnce(batch2, idx, "b2"))
      val fin = allRows(idx)
      assert(fin._1.size > expected._1.size)
      assert(fin._1.size === fin._1.distinct.size)
    }
  }

  test("tombstone deletes: a deleted doc emits no candidate pairs pre-compact; compact drops it physically; compact+re-fold resurrects") {
    import graft.operators.MinHashIndex
    import spark.implicits._
    val sent = crashSent("t") _
    // docs 1 and 10 are planted near-dups; 2 and 11 unique
    val corpus = Seq(
      (1L, sent(1)), (2L, sent(2)), (10L, sent(1)), (11L, sent(5))
    ).toDF("doc_id", "text")
    val idx = MinHashIndex.materialize(corpus, tempDir("graft-mh-tomb"))
    def pairsWith(id: Long): Boolean = {
      // an empty increment probes the stored corpus alone: bands/shingles
      // self-candidates via incrementalPairs need an increment, so read
      // the candidate-emitting sides directly — the contract is that NO
      // read-side row for the id survives the tombstone
      MinHashIndex.bands(spark, idx).filter($"doc_id" === id).count() > 0 ||
        MinHashIndex.shingles(spark, idx).filter($"doc_id" === id).count() > 0
    }
    // pre-delete: the dup pair is discoverable through an increment probe
    val inc = Seq((100L, sent(1))).toDF("doc_id", "text")
    def probePairs(): Set[(Long, Long)] = graft.queries.DedupQueries
      .incrementalPairs(spark, inc, idx, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probePairs().contains((1L, 100L)), "planted dup must pair pre-delete")
    // O(metadata) delete: version unchanged, segments unchanged, one list
    val v0 = MinHashIndex.currentVersion(spark, idx)
    val segs0 = MinHashIndex.segmentCount(spark, idx)
    assert(MinHashIndex.deleteOnce(
      Seq(1L).toDF("doc_id"), idx, "d1"))
    assert(!MinHashIndex.deleteOnce(Seq(1L).toDF("doc_id"), idx, "d1"),
      "replayed delete token must skip")
    assert(MinHashIndex.currentVersion(spark, idx) === v0)
    assert(MinHashIndex.segmentCount(spark, idx) === segs0)
    assert(MinHashIndex.tombstoneCount(spark, idx) === 1)
    // PRE-COMPACT: the tombstoned doc emits nothing — no bands, no
    // shingles, no candidate pairs (the dedup-index correctness contract)
    assert(!pairsWith(1L), "tombstoned doc leaked through a read path")
    val post = probePairs()
    assert(!post.exists(p => p._1 == 1L || p._2 == 1L),
      s"tombstoned doc still emits candidate pairs: $post")
    assert(post.contains((10L, 100L)), "surviving dup twin must still pair")
    assert(MinHashIndex.deadIds(spark, idx).get
      .as[Long].collect().toSeq === Seq(1L))
    // SCOPED RESURRECTION (the update shape, NO compact): the tombstone
    // covers only the segments that existed at delete time, so folding
    // the id again lands in an uncovered segment and is visible
    // immediately — delete + fold = two O(churn) commits
    assert(MinHashIndex.foldOnce(
      Seq((1L, sent(1))).toDF("doc_id", "text"), idx, "refold-early"))
    assert(pairsWith(1L), "re-folded doc must be visible with NO compact")
    assert(probePairs().contains((1L, 100L)))
    assert(MinHashIndex.tombstoneCount(spark, idx) === 1,
      "the scoped resurrection needs no compact — the list stays live")
    // the old rows stay dead: exactly ONE live shingle row for doc 1
    assert(MinHashIndex.shingles(spark, idx)
      .filter($"doc_id" === 1L).count() === 1L,
      "the tombstone must keep hiding the OLD rows while the new show")
    // a SECOND delete covers the refold segment too: hidden again
    assert(MinHashIndex.deleteOnce(Seq(1L).toDF("doc_id"), idx, "d2"))
    assert(!pairsWith(1L), "a re-delete must cover the newer segment")
    assert(probePairs() === post)
    // compact: physical drop, lists cleared, reads identical
    MinHashIndex.compact(spark, idx, nFiles = 1)
    assert(MinHashIndex.tombstoneCount(spark, idx) === 0)
    assert(MinHashIndex.deadIds(spark, idx).isEmpty)
    assert(!pairsWith(1L))
    assert(probePairs() === post, "compact must not change query results")
    // resurrection after the compact cleared the lists: still works
    assert(MinHashIndex.foldOnce(
      Seq((1L, sent(1))).toDF("doc_id", "text"), idx, "refold-1"))
    assert(pairsWith(1L), "re-folded doc must be visible post-compact")
    assert(probePairs().contains((1L, 100L)))
    graft.engine.PersistScope.releaseAll()
  }

  test("delete crash matrix: tombstone commit is atomic and replay-idempotent at every fault point") {
    import graft.operators.MinHashIndex
    import spark.implicits._
    val sent = crashSent("x") _
    val corpus = Seq((1L, sent(1)), (2L, sent(2))).toDF("doc_id", "text")
    for (point <- Seq("tombstone-written", "published")) {
      val idx = MinHashIndex.materialize(corpus, tempDir("graft-del-crash"))
      val boom = intercept[RuntimeException] {
        MinHashIndex.deleteOnceWithFaults(
          Seq(1L).toDF("doc_id"), idx, "d1", crashAt(point))
      }
      assert(boom.getMessage.contains(point))
      // post-crash: the tombstone is invisible or fully live, never torn
      val mid = MinHashIndex.tombstoneCount(spark, idx)
      assert(mid === 0 || mid === 1, s"$point: torn tombstone state")
      // replay converges to exactly one committed list
      MinHashIndex.deleteOnce(Seq(1L).toDF("doc_id"), idx, "d1"): Unit
      assert(MinHashIndex.tombstoneCount(spark, idx) === 1,
        s"$point: replay did not converge")
      assert(!MinHashIndex.deleteOnce(Seq(1L).toDF("doc_id"), idx, "d1"),
        s"$point: second replay not skipped")
      assert(MinHashIndex.shingles(spark, idx)
        .filter($"doc_id" === 1L).count() === 0L, s"$point: delete lost")
      // a compact right after the crash-heal keeps the same live rows
      MinHashIndex.compact(spark, idx, nFiles = 1)
      assert(MinHashIndex.shingles(spark, idx)
        .select($"doc_id").as[Long].collect().toSeq === Seq(2L))
    }
  }

  test("corrupt tombstone _scope degrades to GLOBAL coverage: re-fold hidden, never double-emitted, reads never crash") {
    import graft.operators.MinHashIndex
    import spark.implicits._
    val sent = crashSent("sc") _
    val corpus = Seq((1L, sent(1)), (2L, sent(2)), (10L, sent(1)))
      .toDF("doc_id", "text")
    val idx = MinHashIndex.materialize(corpus, tempDir("graft-mh-scope"))
    assert(MinHashIndex.deleteOnce(Seq(1L).toDF("doc_id"), idx, "d1"))
    assert(MinHashIndex.foldOnce(
      Seq((1L, sent(1))).toDF("doc_id", "text"), idx, "refold"))
    def liveRows(id: Long): Long =
      MinHashIndex.shingles(spark, idx).filter($"doc_id" === id).count()
    // healthy scope: the re-fold is visible, exactly once
    assert(liveRows(1L) === 1L)
    // corrupt the side file: replace it with a same-named DIRECTORY so
    // open() throws — the documented degrade path (file-corruption only;
    // the publish writes it atomically inside the del-dir rename)
    val v = MinHashIndex.currentVersion(spark, idx)
    val vdir = new java.io.File(idx.root, s"v$v")
    val del = vdir.listFiles().filter(_.getName.startsWith("del-")).head
    val scope = new java.io.File(del, "_scope")
    assert(scope.delete() && scope.mkdir(), "fixture: could not corrupt _scope")
    // CONSERVATIVE direction, and no crash: the list now covers every
    // segment, so the re-folded id is HIDDEN (a dedup recall loss on
    // that id) — never resurrected dead rows, never a double emission
    assert(liveRows(1L) === 0L,
      "corrupt scope must hide the re-fold, not double-emit or resurrect")
    assert(liveRows(10L) === 1L, "unrelated docs must be untouched")
    assert(liveRows(2L) === 1L)
    graft.engine.PersistScope.releaseAll()
  }

  test("maintenance lease: fold-during-compact serializes or fails cleanly, never interleaves") {
    import graft.operators.MinHashIndex
    import spark.implicits._
    val sent = crashSent("l") _
    val corpus = Seq((1L, sent(1)), (2L, sent(2))).toDF("doc_id", "text")
    val batch = Seq((10L, sent(3))).toDF("doc_id", "text")
    val idx = MinHashIndex.materialize(corpus, tempDir("graft-lease"))

    // a fold attempted while compact holds the lease fails cleanly —
    // nothing lands, no replay marker, and the compact completes
    var foldRefusal: Option[IllegalStateException] = None
    MinHashIndex.compactWithFaults(spark, idx, 1, dedupe = false, point =>
      if (point == "recovered") {
        foldRefusal = Some(intercept[IllegalStateException] {
          MinHashIndex.foldOnce(batch, idx, "during-compact")
        })
      })
    assert(foldRefusal.exists(_.getMessage.contains("lease")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(idx.root, "_folded", "during-compact")),
      "a refused fold must not leave a replay marker")
    assert(MinHashIndex.currentVersion(spark, idx) === 2, "compact did not complete")

    // lease released: the SAME token folds normally (serialized, not lost)
    assert(MinHashIndex.foldOnce(batch, idx, "during-compact"))

    // an EXPIRED compact lease (crashed holder) is broken, not honored
    val compactLease = java.nio.file.Paths.get(idx.root, "_lease", "compact")
    java.nio.file.Files.createDirectories(compactLease.getParent)
    java.nio.file.Files.writeString(compactLease,
      (System.currentTimeMillis() - 1000L).toString)
    assert(MinHashIndex.foldOnce(
      Seq((20L, sent(6))).toDF("doc_id", "text"), idx, "after-expiry"))
    assert(!java.nio.file.Files.exists(compactLease),
      "expired lease was not broken")

    // a LIVE compact lease excludes a second compact
    java.nio.file.Files.writeString(compactLease,
      (System.currentTimeMillis() + 60_000L).toString)
    val second = intercept[IllegalStateException] {
      MinHashIndex.compact(spark, idx, nFiles = 1)
    }
    assert(second.getMessage.contains("lease"))
    java.nio.file.Files.delete(compactLease)

    // an in-flight fold makes compact back off after the drain window
    val foldLease = java.nio.file.Paths.get(idx.root, "_lease", "fold-x")
    java.nio.file.Files.writeString(foldLease,
      (System.currentTimeMillis() + 60_000L).toString)
    val drained = intercept[IllegalStateException] {
      MinHashIndex.compactWithFaults(spark, idx, 1, dedupe = false,
        MinHashIndex.NoFaults, foldDrainWaitMs = 200L)
    }
    assert(drained.getMessage.contains("in flight"))
    java.nio.file.Files.delete(foldLease)
    MinHashIndex.compact(spark, idx, nFiles = 1) // and then proceeds
    assert(MinHashIndex.currentVersion(spark, idx) === 3)
  }

  test("fold crash then compact then replay: healed marker prevents re-fold") {
    import graft.operators.MinHashIndex
    import spark.implicits._
    val sent = crashSent("h") _
    val corpus = Seq((1L, sent(1)), (2L, sent(2))).toDF("doc_id", "text")
    val batch = Seq((10L, sent(5))).toDF("doc_id", "text")
    val idx = MinHashIndex.materialize(corpus, tempDir("graft-heal-crash"))
    // crash AFTER the batch segment published but BEFORE its _folded
    // marker; then a compact folds the segment into base (the batch dir
    // disappears) — the replay's only protection is the marker compact's
    // recovery healed from the published dir
    intercept[RuntimeException] {
      MinHashIndex.foldOnceWithFaults(batch, idx, "b1", crashAt("published"))
    }
    val withBatch = allRows(idx)
    MinHashIndex.compact(spark, idx, nFiles = 1)
    assert(!MinHashIndex.foldOnce(batch, idx, "b1"),
      "replay after compact must skip via the healed marker")
    assertExactNoDups(allRows(idx), withBatch, "healed replay")
  }

  test("fixture satisfies the oracle envelope: space-only whitespace, stable lower()") {
    // Since round 9 the Karp-Rabin oracles fold UTF-8 OCTETS
    // (QueryUtil.utf8OctetsSql) so non-ASCII text no longer breaks them —
    // tools/multibyte_oracle_check.py proves the 3 fold-oracled queries
    // bit-for-bit on a 2/3/4-byte multibyte corpus. What REMAINS
    // fixture-envelope territory is tokenization: Java \s includes \x0B
    // where RE2's does not (moot while whitespace is plain spaces), and
    // lower()'s locale-free simple case mapping can differ between JVM and
    // DuckDB for a handful of exotic codepoints (dotted-I, final sigma).
    // Pin both at the spec'd sf AND the driver's oracle-gate sf, so a
    // regenerated fixture that breaks an assumption fails HERE, not as a
    // silent engine-vs-oracle divergence.
    // env-resolved; the oracle-gate sf skips cleanly where it isn't present
    val dirs = Seq(SparkTestBase.Sf0001, SparkTestBase.Sf001)
      .filter(SparkTestBase.sfDirExists)
    assert(dirs.nonEmpty,
      s"no fixture dir found under ${SparkTestBase.TestDataRoot} — " +
        "the envelope pin would pass vacuously")
    for (dir <- dirs) {
      val doc = graft.queries.QueryUtil.t(spark, dir, "documents")
      val oddWs = doc.filter(col("text").rlike("[\\t\\n\\u000B\\f\\r]")).count()
      assert(oddWs === 0L, s"$dir: $oddWs docs contain non-space whitespace")
      val caseTricky = doc.filter(col("text").rlike("[İıΣςß]")).count()
      assert(caseTricky === 0L,
        s"$dir: $caseTricky docs contain case-mapping-divergent codepoints")
    }
  }

  test("simhash banding envelope: Hamming<=3 guaranteed, emissions bounded at 6") {
    // 4 bands x 15 bits over bits 0-59: a pair differing in <= 3 bits
    // cannot dirty all 4 chunks (pigeonhole; a bit-60 diff is outside
    // every chunk and only helps), so Hamming <= 3 pairs MUST be emitted.
    // Pairs at 4-6 are best-effort — emitted iff their diffs cluster into
    // <= 3 chunks. Everything emitted must verify at Hamming <= 6.
    val fps = graft.queries.QueryUtil
      .t(spark, SparkTestBase.Sf0001, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .select(col("doc_id"), TextOps.simhashTokenHash(col("w")).as("h"))
      .groupBy(col("doc_id"))
      .agg(TextOps.simhashVoteAggs(col("h")).head, TextOps.simhashVoteAggs(col("h")).tail: _*)
      .select(col("doc_id"), TextOps.simhashFromVotes.as("simhash"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val emitted = Registry.byName("q_dedup_simhash")
      .fn(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    val allPairs = for {
      (a, fa) <- fps
      (b, fb) <- fps if a < b
    } yield ((a, b), java.lang.Long.bitCount(fa ^ fb))
    val guaranteed = allPairs.filter(_._2 <= 3).map(_._1).toSet
    assert(guaranteed.nonEmpty, "fixture should contain Hamming<=3 pairs")
    assert(
      guaranteed.subsetOf(emitted.keySet),
      s"pigeonhole-guaranteed pairs missing: ${guaranteed -- emitted.keySet}"
    )
    assert(emitted.values.forall(_ <= 6))
    val within6 = allPairs.filter(_._2 <= 6).map(_._1).toSet
    assert(emitted.keySet.subsetOf(within6), "emitted a pair beyond Hamming 6")
  }

  test("label propagation crosses checkpoint boundaries without changing labels") {
    import spark.implicits._
    // a 13-node path graph: min-label 0 travels one hop per iteration, so
    // convergence takes >= 12 iterations — the localCheckpoint branch
    // (every 5th iteration) fires at least twice, proving truncation is
    // invisible to the fixpoint. Plus a disjoint triangle as a second
    // component.
    val chain = (0L until 12L).map(i => (i, i + 1))
    val tri = Seq((100L, 101L), (101L, 102L))
    val pairs = (chain ++ tri).toDF("doc_a", "doc_b")
    val edges = pairs
      .union(pairs.select($"doc_b", $"doc_a"))
      .toDF("src", "dst")
    val labels = graft.queries.DedupQueries
      .minLabelPropagation(edges)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert((0L to 12L).forall(labels(_) == 0L), s"chain labels: $labels")
    assert((100L to 102L).forall(labels(_) == 100L), s"triangle labels: $labels")
  }

  test("dedup clustering emits one keeper per cluster, keyed by min label") {
    val rows = Registry.byName("q_dedup_clusters")
      .fn(spark, SparkTestBase.Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(1)).foreach { case (cid, members) =>
      assert(members.count(_.getBoolean(2)) === 1, s"cluster $cid keepers")
      assert(members.map(_.getLong(0)).min === cid, s"cluster $cid min-label")
    }
  }

  test("leakage-safe split: every doc assigned once, clusters never straddle sides, both sides populated") {
    import spark.implicits._
    val split = Registry.byName("q_split_leakage_safe")
      .fn(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val total = graft.queries.QueryUtil
      .t(spark, SparkTestBase.Sf0001, "documents").count()
    assert(split.length.toLong === total, "every doc gets exactly one row")
    assert(split.map(_._3).toSet === Set("train", "val"),
      "both sides must be populated on the fixture")
    // the structural guarantee, verified against the actual near-dup
    // pairs: no pair straddles the split
    val side = split.map(t => t._1 -> t._3).toMap
    val pairs = Registry.byName("q_dedup_jaccard")
      .fn(spark, SparkTestBase.Sf0001)
      .select($"doc_a", $"doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must have near-dup pairs to make the test mean anything")
    pairs.foreach { case (a, b) =>
      assert(side(a) === side(b), s"near-dup pair ($a, $b) straddles the split")
    }
    // same-cluster docs share the rep; singletons are their own rep
    split.foreach { case (id, rep, _) => assert(rep <= id) }
  }

  test("LSH candidate generation plans no cartesian product") {
    val plan = Registry.byName("q_dedup_minhash")
      .fn(spark, SparkTestBase.Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }

  test("span dedup: keeper untouched, a >k-word run dies as ONE region, within-doc repeats and sub-k docs pass") {
    import spark.implicits._
    val run = (1 to 12).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      // doc 1 is the keeper of the 12-word run
      (1L, s"head1 head2 $run tail1"),
      // doc 2 duplicates the run: its 12 words die as one merged region
      (2L, s"x1 x2 $run y1"),
      // doc 3 repeats an 8-gram WITHIN itself only (df = 1 doc): untouched
      (3L, ("b " * 20).trim),
      // doc 4 is sub-k: no shingles, passes through
      (4L, "short doc")
    ).toDF("doc_id", "text")
    val out = TextOps.spanDedup(docs, k = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out(0) === ((1L, 15L, 0L, s"head1 head2 $run tail1")),
      s"keeper must keep every word: ${out(0)}")
    // doc 2: exactly the 12 run words die — one contiguous region from
    // the 5 overlapping duplicated shingles, not 8-word stutters
    assert(out(1) === ((2L, 15L, 12L, "x1 x2 y1")), s"run region: ${out(1)}")
    assert(out(2)._3 === 0L, s"within-doc repeat must not be touched: ${out(2)}")
    assert(out(3) === ((4L, 2L, 0L, "short doc")), s"sub-k doc: ${out(3)}")
  }

  test("span dedup: the 128-bit hashed scale path is row-identical to the string-keyed oracle path") {
    import spark.implicits._
    val docs = graft.queries.QueryUtil
      .t(spark, SparkTestBase.Sf0001, "documents")
      .select($"doc_id", $"text")
    val hashed = TextOps.spanDedup(docs, k = 8, hashKeys = true)
    val strings = TextOps.spanDedup(docs, k = 8, hashKeys = false)
    assert(hashed.exceptAll(strings).count() === 0)
    assert(strings.exceptAll(hashed).count() === 0)
  }

  test("SplitStore: ingest assigns against the frozen store — side-stable, no straddling pair, replay-idempotent") {
    import org.apache.spark.sql.functions.col
    import graft.operators.SplitStore
    val doc = graft.queries.QueryUtil.t(spark, SparkTestBase.Sf0001, "documents")
    val root = tempDir("graft-splitstore-spec") + "/store"
    val store = SplitStore.build(doc.filter(col("doc_id") % 10 =!= 8 && col("doc_id") % 10 =!= 9), root)
    def snap() = SplitStore.assignments(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    val base = snap()
    // the built store IS the batch split on the base corpus
    assert(base.map(_._3).toSet.subsetOf(Set("train", "val")))
    // two sequential ingests; existing assignments NEVER change
    val inc1 = doc.filter(col("doc_id") % 10 === 8)
    val out1 = SplitStore.ingest(spark, store, inc1, token = "w1")
    assert(out1.count() === inc1.count(), "every ingested doc gets a row")
    val after1 = snap()
    assert(after1.filter(t => base.exists(_._1 == t._1)) === base,
      "ingest must not touch existing assignments")
    val inc2 = doc.filter(col("doc_id") % 10 === 9)
    SplitStore.ingest(spark, store, inc2, token = "w2"): Unit
    val after2 = snap()
    assert(after2.length.toLong === doc.count())
    assert(after2.filter(t => after1.exists(_._1 == t._1)) === after1,
      "second ingest must not touch first-ingest assignments either")
    // the INVARIANT, re-derived from scratch over the whole corpus: no
    // near-dup pair has one end train and the other val
    val side = after2.map(t => t._1 -> t._3).toMap
    val pairs = graft.queries.DedupQueries.jaccardPairs(doc, 0.5)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(Set(side(a), side(b)) != Set("train", "val"),
        s"near-dup pair ($a, $b) straddles the split after ingests")
    }
    // matched docs inherit the corpus cluster's frozen rep
    val crossMatched = pairs.filter { case (a, b) =>
      (a % 10 >= 8) != (b % 10 >= 8) }
    assert(crossMatched.nonEmpty, "fixture must exercise the inherit path")
    val rep = after2.map(t => t._1 -> t._2).toMap
    crossMatched.foreach { case (a, b) =>
      assert(rep(a) === rep(b), s"matched pair ($a, $b) must share a rep")
    }
    // replay: the same token returns the committed segment, no new rows
    SplitStore.ingest(spark, store, inc2, token = "w2"): Unit
    assert(snap() === after2, "token replay must be a structural no-op")
    // immutability refusal: re-ingesting an assigned doc under a NEW
    // token fails loudly
    val err = intercept[IllegalArgumentException] {
      SplitStore.ingest(spark, store, inc1, token = "w3")
    }
    assert(err.getMessage.contains("immutable"), err.getMessage)
    graft.engine.PersistScope.releaseAll()
  }

  test("SplitStore compact: folds to one segment with the identical assignment set; pre-compaction replays stay no-ops; crash windows recover") {
    import org.apache.spark.sql.functions.col
    import graft.operators.SplitStore
    val doc = graft.queries.QueryUtil.t(spark, SparkTestBase.Sf0001, "documents")
    val root = tempDir("graft-splitstore-compact") + "/store"
    val store = SplitStore.build(doc.filter(col("doc_id") % 10 < 7), root)
    val inc1 = doc.filter(col("doc_id") % 10 === 7)
    val inc2 = doc.filter(col("doc_id") % 10 === 8)
    SplitStore.ingest(spark, store, inc1, token = "w1"): Unit
    SplitStore.ingest(spark, store, inc2, token = "w2"): Unit
    def snap() = SplitStore.assignments(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    def segDirs() = Option(new java.io.File(root, "segments").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSet
    def markers() = new java.io.File(root, "_commits").list().toSet
    val before = snap()
    assert(segDirs().size === 3, segDirs())
    // crash BEFORE the marker: the merged dir is uncommitted — invisible
    intercept[RuntimeException] {
      SplitStore.compactWithFaults(spark, store, 2,
        f => if (f == "merged-written") throw new RuntimeException("boom"))
    }
    assert(snap() === before, "uncommitted compaction must be invisible")
    assert(segDirs().contains("seg-compact-1") && !markers()("compact-1"))
    // crash AFTER the ledger write, before the marker: still uncommitted.
    // The ledger now names still-live tokens — harmless, the guard would
    // answer true for them via their markers anyway
    intercept[RuntimeException] {
      SplitStore.compactWithFaults(spark, store, 2,
        f => if (f == "ledger-written") throw new RuntimeException("boom"))
    }
    assert(snap() === before, "ledger-only compaction must be invisible")
    assert(!markers().exists(_.startsWith("compact-")), markers())
    // crash AFTER the marker, before cleanup: readers already exclude
    // the superseded segments through the marker's supersedes list
    intercept[RuntimeException] {
      SplitStore.compactWithFaults(spark, store, 2,
        f => if (f == "committed") throw new RuntimeException("boom"))
    }
    assert(markers()("compact-1") && markers()("w1"),
      "old markers survive the crash window")
    assert(snap() === before,
      "reads must be exact while cleanup is unfinished")
    // rerun converges: finishes the cleanup, then no-ops (one segment)
    SplitStore.compact(spark, store, nFiles = 2)
    assert(segDirs() === Set("seg-compact-1"), segDirs())
    assert(markers() === Set("compact-1"), markers())
    assert(snap() === before, "compaction must not change one row")
    // a PRE-compaction ingest token replays as a no-op and still
    // answers the batch's frozen rows
    val replay = SplitStore.ingest(spark, store, inc2, token = "w2")
    assert(replay.count() === inc2.count())
    assert(snap() === before && markers() === Set("compact-1"),
      "pre-compaction token replay must not re-ingest")
    // ingests keep landing after compaction; a second compact refolds
    SplitStore.ingest(spark, store,
      doc.filter(col("doc_id") % 10 === 9), token = "w3"): Unit
    val after3 = snap()
    assert(after3.length.toLong === doc.count())
    assert(after3.filter(t => before.exists(_._1 == t._1)) === before,
      "compaction + later ingest must leave frozen assignments frozen")
    SplitStore.compact(spark, store, nFiles = 2)
    assert(segDirs() === Set("seg-compact-2"), segDirs())
    assert(snap() === after3)
    // TRANSITIVE supersede: w1 was folded by compact-1, whose marker
    // compact-2 just superseded and deleted — w1's committedness must
    // survive through the replay-guard LEDGER (compact-2's marker names
    // only what IT folded), so its replay still no-ops instead of
    // re-ingesting into the id-collision refusal
    val replay1 = SplitStore.ingest(spark, store, inc1, token = "w1")
    assert(replay1.count() === inc1.count())
    assert(snap() === after3 && markers() === Set("compact-2"),
      "pre-first-compaction token replay must survive a SECOND compaction")
    // the compaction prefix is reserved (it is how readers tell a
    // supersede-list marker from an ingest marker)
    val bad = intercept[IllegalArgumentException] {
      SplitStore.ingest(spark, store,
        doc.filter(col("doc_id") === -1L), token = "compact-9")
    }
    assert(bad.getMessage.contains("reserved"), bad.getMessage)
    graft.engine.PersistScope.releaseAll()
  }

  test("SplitStore lifecycle fuzz: random ingest/compact/replay sequences keep assignments frozen, replays no-ops, and the no-straddle invariant intact") {
    import org.apache.spark.sql.functions.col
    import graft.operators.SplitStore
    import spark.implicits._
    // the compact/replay protocol earned two real bug fixes this round
    // (orphaned-fold heal, transitive supersedes) — this pins the WHOLE
    // protocol under random composition: every committed token must
    // replay as a no-op at any later point, assignments never change
    // once written, and the invariant survives every interleaving.
    val rng = new scala.util.Random(20260815L)
    def text(i: Long): String =
      // ~1 in 6 docs duplicates an earlier doc's text -> inherit paths
      if (i % 6 == 5) textOf(i - 5) else textOf(i)
    def textOf(i: Long): String =
      (0 until 6).map(j => s"t${i}w$j").mkString(" ")
    def docs(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, text(i))).toDF("doc_id", "text")
    val root = tempDir("graft-splitstore-fuzz") + "/store"
    val store = SplitStore.build(docs(0, 60), root)
    var nextId = 60L
    var committed = Vector.empty[(String, Long, Long)] // token, lo, hi
    def snapMap() = SplitStore.assignments(spark, store).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    var frozen = snapMap()
    for (step <- 1 to 15) {
      rng.nextInt(4) match {
        case 0 | 1 => // ingest a fresh batch
          val n = 5L + rng.nextInt(10)
          val tok = f"f$step%02d"
          SplitStore.ingest(spark, store, docs(nextId, nextId + n),
            token = tok): Unit
          committed :+= ((tok, nextId, nextId + n))
          nextId += n
          val now = snapMap()
          assert(frozen.forall { case (id, v) => now(id) == v },
            s"step $step: an ingest changed a frozen assignment")
          frozen = now
        case 2 => // replay a random earlier token — structural no-op
          if (committed.nonEmpty) {
            val (tok, lo, hi) = committed(rng.nextInt(committed.length))
            val out = SplitStore.ingest(spark, store, docs(lo, hi),
              token = tok)
            assert(out.count() === (hi - lo),
              s"step $step: replay of $tok must answer its rows")
            assert(snapMap() === frozen,
              s"step $step: replay of $tok changed state")
          }
        case 3 => // compact, then verify reads are row-identical
          SplitStore.compact(spark, store, nFiles = 2)
          assert(snapMap() === frozen,
            s"step $step: compaction changed an assignment")
      }
    }
    // the invariant, re-derived from scratch over everything ingested:
    // no near-dup pair straddles train/val
    val all = docs(0, nextId)
    val sides = frozen.map { case (id, (_, s)) => id -> s }
    graft.queries.DedupQueries.jaccardPairs(all, 0.5)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .foreach { case (a, b) =>
        assert(Set(sides(a), sides(b)) != Set("train", "val"),
          s"near-dup pair ($a, $b) straddles the split after the fuzz")
      }
    graft.engine.PersistScope.releaseAll()
  }

  test("SplitStore: a crash between the segment commit and the index fold heals on replay — later near-dups still inherit") {
    import org.apache.spark.sql.functions.col
    import graft.operators.SplitStore
    import spark.implicits._
    val corpus = (0L until 40L)
      .map(i => (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e"))
      .toDF("doc_id", "text")
    val root = tempDir("graft-splitstore-heal") + "/store"
    val store = SplitStore.build(corpus, root)
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    val batch1 = Seq((200L, t)).toDF("doc_id", "text")
    // crash AFTER the segment marker, BEFORE the index fold
    intercept[RuntimeException] {
      SplitStore.ingestWithFaults(spark, store, batch1, "c1", 0.5,
        f => if (f == "segment-committed") throw new RuntimeException("boom"))
    }
    // the assignment IS committed...
    val side200 = SplitStore.assignments(spark, store)
      .filter(col("doc_id") === 200L).collect()
    assert(side200.length === 1, "crashed ingest's segment must serve")
    // ...and the replay HEALS the orphaned fold (without it, doc 300 —
    // an exact near-dup of 200 — would miss the index, hash a fresh
    // side, and potentially straddle the boundary)
    val replay = SplitStore.ingest(spark, store, batch1, token = "c1")
    assert(replay.count() === 1)
    val batch2 = Seq((300L, t)).toDF("doc_id", "text")
    val out2 = SplitStore.ingest(spark, store, batch2, token = "c2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out2.head._2 === 200L,
      s"near-dup of the healed batch must inherit its rep: ${out2.toSeq}")
    assert(out2.head._3 === side200.head.getString(2),
      "and its frozen side")
    graft.engine.PersistScope.releaseAll()
  }

  test("SplitStore: a batch doc bridging train and val clusters is QUARANTINED, keeping both sets leak-free") {
    import org.apache.spark.sql.functions.col
    import graft.operators.SplitStore
    import spark.implicits._
    // controlled corpus: overlapping 20-token windows over one word
    // stream. X = w1..w20 and Y = w11..w30 share 8 of 28 word-3-gram
    // shingles (j = 0.286 < 0.5 -> separate clusters); Z = w6..w25
    // shares 13 of 23 with EACH (j = 0.565 >= 0.5 -> bridges both).
    def words(lo: Int, hi: Int) = (lo to hi).map(i => s"w$i").mkString(" ")
    // doc ids chosen so the reps HASH TO OPPOSITE SIDES (sha256("1")
    // buckets to train, sha256("5") to val) — the conditional below
    // still guards against a future hash-formula change, but as written
    // the quarantine branch is the one exercised
    val corpus = Seq((1L, words(1, 20)), (5L, words(11, 30))).toDF("doc_id", "text")
    val root = tempDir("graft-splitstore-quarantine") + "/store"
    val store = SplitStore.build(corpus, root)
    val built = SplitStore.assignments(spark, store).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    assert(built(1L) != built(5L),
      "fixture reps must hash to opposite sides for the quarantine branch")
    val bridge = Seq((10L, words(6, 25))).toDF("doc_id", "text")
    val out = SplitStore.ingest(spark, store, bridge, token = "b1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length === 1)
    if (built(1L) != built(5L)) {
      assert(out.head._3 === "quarantine",
        s"bridge of conflicting sides must quarantine: $out vs $built")
    } else {
      // reps hashed to the same side: the bridge inherits it
      assert(out.head._3 === built(1L), s"$out vs $built")
    }
    // and a LATER near-dup of the quarantined doc inherits quarantine
    val follow = Seq((11L, words(6, 25))).toDF("doc_id", "text")
    val out2 = SplitStore.ingest(spark, store, follow, token = "b2")
      .collect().map(r => r.getString(2))
    if (built(1L) != built(5L))
      assert(out2.head === "quarantine",
        "a near-dup of a quarantined doc must stay out of both sets")
    // fresh unmatched docs hash their own side deterministically
    val fresh = Seq((20L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val out3 = SplitStore.ingest(spark, store, fresh, token = "b3")
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(out3.head._1 === 20L, "unmatched doc is its own rep")
    assert(Set("train", "val")(out3.head._2))
    graft.engine.PersistScope.releaseAll()
  }
}
