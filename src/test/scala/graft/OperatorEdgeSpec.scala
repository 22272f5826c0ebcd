package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Multimodal, MediaRecord, MediaMeta}

/** Edge-case pins for the operator utilities not covered elsewhere. */
class OperatorEdgeSpec extends SparkTestBase {

  test("multimodal decode handles null media payloads") {
    import spark.implicits._
    val ds = Seq(
      MediaRecord(1L, "mem://a", "abc".getBytes("UTF-8"), MediaMeta("text/utf-8", 3, 1, 1)),
      MediaRecord(2L, "mem://b", null, MediaMeta("text/utf-8", 0, 1, 1))
    ).toDS()
    val feats = Multimodal.extractFeatures(ds).collect().sortBy(_.id)
    assert(feats(0).nBytes === 3L && feats(0).brightness > 0)
    assert(feats(1).nBytes === 0L && feats(1).brightness === 0.0)
    assert(feats(1).digest.nonEmpty) // digest of empty payload, not a crash
  }

  test("merge upsert: updates win, inserts land, untouched rows pass through") {
    import spark.implicits._
    val target = Seq((1L, "old-a", "x"), (2L, "old-b", "y"), (3L, "old-c", "z"))
      .toDF("id", "text", "tag")
    val updates = Seq((2L, "NEW-b", "y2"), (9L, "NEW-i", "w"))
      .toDF("id", "text", "tag")
    val out = graft.operators.IncrementalOps.merge(target, updates, "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, "old-a", "x", "kept"),
      (2L, "NEW-b", "y2", "updated"),
      (3L, "old-c", "z", "kept"),
      (9L, "NEW-i", "w", "inserted")
    ))
  }

  test("merge upsert: an update that clears a field to NULL wins over the stale value") {
    import spark.implicits._
    val target = Seq((1L, Option("keep"), "x"), (2L, Option("stale"), "y"))
      .toDF("id", "text", "tag")
    val updates = Seq((2L, Option.empty[String], "y2")).toDF("id", "text", "tag")
    val out = graft.operators.IncrementalOps.merge(target, updates, "id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, Some("keep"), "x", "kept"),
      (2L, None, "y2", "updated") // NULL from the update row replaces 'stale'
    ))
  }

  test("snapshot diff is null-safe: null vs value is changed, null vs null is not") {
    import spark.implicits._
    val old = Seq((1L, Option("a")), (2L, Option.empty[String]), (3L, Option("c")), (4L, Option("d")))
      .toDF("id", "text")
    val news = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Option("c2")), (5L, Option("e")))
      .toDF("id", "text")
    val out = graft.operators.IncrementalOps
      .snapshotDiff(old, news, "id", Seq("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, "changed"),   // value -> null
      (2L, "unchanged"), // null <=> null
      (3L, "changed"),
      (4L, "removed"),
      (5L, "added")
    ))
  }

  test("Z-order layout bounds BOTH dimensions per file; single-dim sort does not") {
    import spark.implicits._
    import graft.operators.ZOrderLayout
    // 64x64 grid, shuffled input
    val df = spark.range(4096).select(
      (col("id") % 64).as("a"),
      (col("id") / 64).cast("long").as("b")
    )
    val dir = tempDir("graft-zorder")
    ZOrderLayout.writeZOrdered(df, s"$dir/z", "a", "b", bits = 6, partitions = 8)
    // per written FILE, both dims must be bounded near sqrt(4096/8) tiles;
    // a plain sort by `a` would bound a but leave b spanning 0..63
    val files = new java.io.File(s"$dir/z").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size > 1, "need multiple files to show per-file bounds")
    def bBoxes(paths: Seq[String]): Seq[(Long, Long)] = paths.map { f =>
      val r = spark.read.parquet(f).agg(min("b"), max("b")).head()
      (r.getLong(0), r.getLong(1))
    }
    def overlapping(boxes: Seq[(Long, Long)], lo: Long, hi: Long): Int =
      boxes.count { case (l, h) => h >= lo && l <= hi }

    // the guaranteed z-curve property is file PRUNING on the second
    // dimension (an unaligned contiguous zkey range may legally span one
    // full dimension as a strip, so per-file span bounds are NOT the
    // invariant): the upper half of the key space has b >= 32, so a
    // b-predicate in the lower half must exclude the files covering it
    val zOverlap = overlapping(bBoxes(files), 20, 23)
    assert(zOverlap < files.size,
      s"b-predicate pruned nothing: $zOverlap of ${files.size} files overlap")

    // control: sorted by `a` alone, every file carries every b value —
    // the same predicate prunes NOTHING
    val sortedDir = s"$dir/plain"
    df.repartitionByRange(8, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(sortedDir)
    val plainFiles = new java.io.File(sortedDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val plainOverlap = overlapping(bBoxes(plainFiles), 20, 23)
    assert(plainOverlap === plainFiles.size,
      s"control failed: single-dim sort pruned b files: $plainOverlap of ${plainFiles.size}")
  }

  test("decontaminate/pack handle edge docs: empty, sub-8-gram, and ctx-width texts") {
    import spark.implicits._
    import graft.queries.Registry
    val dirPath = java.nio.file.Files.createTempDirectory("graft-edge-docs")
    graft.engine.TempDirs.register(dirPath)
    val dir = dirPath.toString
    Seq(
      (0L, ""), // empty -> 1 pseudo-token (split semantics, oracle-mirrored)
      (1L, "only seven tokens in this short doc"), // 7 tokens: no 8-gram
      (2L, "exactly eight tokens sit in this tiny doc"), // one 8-gram
      (20L, "exactly eight tokens sit in this tiny doc"), // benchmark twin of 2
      (21L, (1 to 512).map(i => s"t$i").mkString(" ")) // exactly one full ctx bin
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // only doc 2 shares its single 8-gram with benchmark doc 20; docs 0/1
    // are too short to shingle, doc 21 overlaps nothing
    val decon = Registry.byName("q_decontaminate").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(decon === Seq((2L, 1L, 1L)))

    val pack = Registry.byName("q_pack_sequences").fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(pack(0L) === ((0L, 1L, 0L, 0L)), "empty doc costs its pseudo-token")
    assert(pack(20L) === ((0L, 8L, 0L, 1L)), "starts after shard 0's empty doc")
    assert(pack(1L) === ((1L, 7L, 0L, 0L)))
    assert(pack(21L) === ((1L, 512L, 0L, 7L)), "512-token doc starts at offset 7")
    assert(pack(2L) === ((2L, 8L, 0L, 0L)))
  }

  test("IVF rankCells orders by true centroid distance") {
    import spark.implicits._
    // two obvious clusters on a 2d-ish axis embedded in 4 dims
    val vecs = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Array(base + i * 0.01f, base, 0.0f, 0.0f), i % 2)
    }.toDF("vec_id", "embedding", "label")
    val model = IvfIndex.build(vecs, "embedding", nCells = 2, seed = 7L)
    val nearZero = IvfIndex.rankCells(model, Array(0.0f, 0.0f, 0.0f, 0.0f))
    val nearTen = IvfIndex.rankCells(model, Array(10.0f, 10.0f, 0.0f, 0.0f))
    // the closest cell for the two probes must differ (two real clusters)
    assert(nearZero.head !== nearTen.head)
    // and probing returns rows from the right cluster
    val top = IvfIndex.probe(model, Array(10.0f, 10.0f, 0.0f, 0.0f), "embedding", k = 3, nProbe = 1)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(top.forall(_ % 2 == 1), s"probe near (10,10) returned even-cluster ids: ${top.toSeq}")
  }

  test("IVF build sample-fits past the train cap but assigns the full corpus") {
    import spark.implicits._
    val vecs = (0 until 400).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Array(base + i * 0.001f, base, 0.0f, 0.0f), i % 2)
    }.toDF("vec_id", "embedding", "label")
    // cap far below the corpus: the FIT is sampled, the assignment is not
    val model = IvfIndex.build(vecs, "embedding", nCells = 2, seed = 7L, maxTrainRows = 50L)
    assert(model.assignments.count() === 400L)
    val cells = model.assignments.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf(Set(0, 1)) && cells.size === 2,
      s"sample-fit lost the cluster structure: cells=$cells")
  }

  test("text pipeline edges: empty / whitespace / single-token docs neither crash nor divide by zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val edge = Seq(
      (1L, ""),           // split -> [""] (one empty token)
      (2L, "   "),        // leading whitespace -> ["", ...] artifacts
      (3L, "word"),       // single real token
      (4L, "the the the the the") // degenerate repetition
    ).toDF("doc_id", "text")

    val gopher = graft.queries.TextQueries.gopherFilter(edge)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getBoolean(3)))
      .toMap
    assert(gopher.size === 4, "every edge doc must get a verdict")
    // all are too short; none may keep; reasons must be non-empty strings
    gopher.values.foreach { case (n, reasons, keep) =>
      assert(n >= 1L && !keep && reasons.nonEmpty)
    }
    assert(gopher(4L)._2.contains("repetition"), gopher(4L).toString)

    // NLL scoring under a frozen model: empty-token docs VANISH (no
    // scorable tokens — the documented contract), real tokens score
    val (model, oov) = graft.queries.TextQueries.fitUnigramModel(
      Seq((10L, "a b c")).toDF("doc_id", "text"))
    val scored = graft.queries.TextQueries.scoreNll(edge, model, oov)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored.keySet === Set(3L, 4L),
      s"only token-bearing docs score: ${scored.keySet}")
    assert(scored.values.forall(v => !v.isNaN && !v.isInfinite))

    // redaction chain: a doc that is ONLY PII reduces to placeholders
    val onlyPii = Seq((1L, "a@b.co 10.0.0.1 123-45-6789")).toDF("doc_id", "text")
      .select(col("doc_id"),
        org.apache.spark.sql.functions.regexp_replace(
          org.apache.spark.sql.functions.regexp_replace(
            org.apache.spark.sql.functions.regexp_replace(col("text"),
              "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
            "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<ID>"),
          "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>").as("clean"))
      .head().getString(1)
    assert(onlyPii === "<EMAIL> <IP> <ID>", onlyPii)
  }

  test("join pruning refuses a fact-sized dim (measured, loud)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, pmod}
    val bigDim = spark.range(0, 100L).toDF("dk")
    // guard fires BEFORE any table access, so the path can be bogus
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.JoinPruning.prunedScan(
        spark, "/nonexistent/table", "k", bigDim, "dk", maxDimKeys = 10L)
    }
    assert(e1.getMessage.contains("prunedScan") &&
      e1.getMessage.contains("measured"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.JoinPruning.prunedScanByPartition(
        spark, "/nonexistent/table", "p", bigDim, "dk", maxDimKeys = 10L)
    }
    assert(e2.getMessage.contains("prunedScanByPartition"), e2.getMessage)
    // the partition flavor bounds DISTINCT KEYS, the quantity actually
    // collected: many rows over few keys passes the guard (and then
    // fails on the bogus path, proving the guard let it through)
    val fewKeys = spark.range(0, 100L)
      .select(pmod(col("id"), org.apache.spark.sql.functions.lit(3)).as("dk"))
    val e3 = intercept[Throwable] {
      graft.operators.JoinPruning.prunedScanByPartition(
        spark, "/nonexistent/table", "p", fewKeys, "dk", maxDimKeys = 10L)
    }
    assert(!e3.getMessage.contains("distinct keys"), e3.getMessage)
  }

  test("serving shim honors a custom batch size") {
    import spark.implicits._
    session.registerTable("serve_small", (1 to 10).toDF("v"))
    val shim = new graft.engine.ServingShim(session, batchSize = 3)
    val (_, batches) = shim.doGet("SELECT v FROM serve_small ORDER BY v")
    val sizes = batches.map(_.size).toSeq
    assert(sizes === Seq(3, 3, 3, 1))
  }

  test("MV refresh: deltas net out, dead groups drop, new groups appear") {
    import spark.implicits._
    val mv = Seq(("a", 10L, 2L), ("b", 7L, 1L), ("c", 5L, 1L))
      .toDF("k", "s", "n")
    // a: update encoded as delete+insert (6 -> 9); b: its only row deleted
    // (group must DIE); d: brand-new group; c: untouched by the changelog
    val changes = Seq(
      ("a", 6L, "delete"), ("a", 9L, "insert"),
      ("b", 7L, "delete"),
      ("d", 4L, "insert"), ("d", 2L, "insert")
    ).toDF("k", "m", "_change_type")
    val out = graft.operators.IncrementalOps
      .refreshSumCount(mv, changes, "k", col("m"), "s", "n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq === Seq(("a", 13L, 2L), ("c", 5L, 1L), ("d", 6L, 2L)))
  }

  test("min/max MV refresh: inserts fold WITHOUT rescan; extremum deletes rescan; interior deletes do not") {
    import spark.implicits._
    val mv = Seq(("a", 2L, 9L, 3L), ("b", 1L, 5L, 2L), ("c", 4L, 6L, 2L))
      .toDF("k", "mn", "mx", "n")
    // a: insert-only (new max 12); b: delete its MINIMUM (1) + insert 3;
    // c: delete an INTERIOR value (5) — no rescan allowed; d: new group
    val changes = Seq(
      ("a", 12L, "insert"),
      ("b", 1L, "delete"), ("b", 3L, "insert"),
      ("c", 5L, "delete"),
      ("d", 7L, "insert")
    ).toDF("k", "m", "_change_type")
    // the base AFTER the window, for the groups that may rescan
    val base = Seq(("b", 3L), ("b", 5L)).toDF("k", "m")
    val asked = scala.collection.mutable.Set[String]()
    val out = graft.operators.IncrementalOps
      .refreshMinMax(mv, changes, "k", col("m"), "mn", "mx", "n",
        rescan = keys => {
          asked.synchronized {
            asked ++= keys.collect().map(_.getString(0))
          }
          base.join(keys, Seq("k"), "left_semi")
        })
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // ONLY b rescans — a/c/d must take the incremental path
    assert(asked.toSet === Set("b"), s"rescanned: $asked")
    assert(out.toSeq === Seq(
      ("a", 2L, 12L, 4L),  // fold: max extends, min untouched
      ("b", 3L, 5L, 2L),   // authoritative rescan after min died
      ("c", 4L, 6L, 1L),   // interior delete: bounds stand, count drops
      ("d", 7L, 7L, 1L)    // new group from inserts alone
    ))
  }

  test("min/max MV refresh: a group whose count dies is dropped without touching the base") {
    import spark.implicits._
    val mv = Seq(("x", 5L, 5L, 1L)).toDF("k", "mn", "mx", "n")
    val changes = Seq(("x", 5L, "delete")).toDF("k", "m", "_change_type")
    val out = graft.operators.IncrementalOps
      .refreshMinMax(mv, changes, "k", col("m"), "mn", "mx", "n",
        rescan = keys => {
          // a dead group never reaches the rescan (its _n is 0)
          assert(keys.isEmpty, "dead group must not rescan")
          keys.withColumn("m", lit(0L))
        })
      .collect()
    assert(out.isEmpty)
  }

  test("join-view refresh: a fact row moving between two UN-churned dims rejoins correctly, reads churn-scoped") {
    import spark.implicits._
    // view grain: (jk, pk, v, name) = fact JOIN dim. f1 moved d1 -> d2 in
    // the current base; neither dim churned. Pure view-side delta
    // approaches miss this (the d2 dim row was never touched); the
    // region recompute must re-read f1 and the dim it NOW references.
    val factsNow = Seq((1L, "d2", 10L), (2L, "d1", 20L), (3L, "d2", 30L))
      .toDF("pk", "jk", "v")
    val dimNow = Seq(("d1", "one"), ("d2", "two")).toDF("jk", "name")
    val mv = Seq(("d1", 1L, 10L, "one"), ("d1", 2L, 20L, "one"),
      ("d2", 3L, 30L, "two")).toDF("jk", "pk", "v", "name")
    val factChanges = Seq(("delete", 1L, "d1", 10L), ("insert", 1L, "d2", 10L))
      .toDF("_change_type", "pk", "jk", "v")
    val dimChanges = Seq.empty[(String, String, String)]
      .toDF("_change_type", "jk", "name")
    val askedPk = scala.collection.mutable.Set[Long]()
    val askedFactJk = scala.collection.mutable.Set[String]()
    val askedDimJk = scala.collection.mutable.Set[String]()
    val out = graft.operators.IncrementalOps
      .refreshJoin(mv, factChanges, dimChanges, "pk", "jk",
        factByPk = keys => {
          askedPk.synchronized { askedPk ++= keys.collect().map(_.getLong(0)) }
          factsNow.join(keys, Seq("pk"), "left_semi")
        },
        factByJoinKey = keys => {
          askedFactJk.synchronized {
            askedFactJk ++= keys.collect().map(_.getString(0))
          }
          factsNow.join(keys, Seq("jk"), "left_semi")
        },
        dimByJoinKey = keys => {
          askedDimJk.synchronized {
            askedDimJk ++= keys.collect().map(_.getString(0))
          }
          dimNow.join(keys, Seq("jk"), "left_semi")
        })
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._2)
    // churn-scoped reads: ONLY the churned pk; no dim churn means the
    // fact-by-joinkey read gets an empty key set; the dim read is asked
    // for exactly the key the moved row NOW references
    assert(askedPk.toSet === Set(1L), s"factByPk asked: $askedPk")
    assert(askedFactJk.isEmpty, s"factByJoinKey asked: $askedFactJk")
    assert(askedDimJk.toSet === Set("d2"), s"dimByJoinKey asked: $askedDimJk")
    assert(out.toSeq === Seq(
      ("d2", 1L, 10L, "two"), // moved: rejoined under its NEW dim
      ("d1", 2L, 20L, "one"), // pass-through, untouched
      ("d2", 3L, 30L, "two")  // pass-through, untouched
    ))
  }

  test("join-view refresh: dim relabel rewrites its facts; dim insert backfills PRE-EXISTING facts; dim delete kills its facts") {
    import spark.implicits._
    // f4 -> d3 predates the view but was unmatched at build time (no d3
    // dim row): it exists NOWHERE in the old view, so only the
    // current-base region read can produce it. d2's dim row is deleted:
    // f3 must die through inner-join semantics, with no explicit
    // fact-side delete. f5/d5 are untouched and must pass through.
    val factsNow = Seq((1L, "d1", 10L), (2L, "d1", 20L), (3L, "d2", 30L),
      (4L, "d3", 40L), (5L, "d5", 50L)).toDF("pk", "jk", "v")
    val dimNow = Seq(("d1", "uno"), ("d3", "three"), ("d5", "five"))
      .toDF("jk", "name")
    val mv = Seq(("d1", 1L, 10L, "one"), ("d1", 2L, 20L, "one"),
      ("d2", 3L, 30L, "two"), ("d5", 5L, 50L, "five"))
      .toDF("jk", "pk", "v", "name")
    val factChanges = Seq.empty[(String, Long, String, Long)]
      .toDF("_change_type", "pk", "jk", "v")
    val dimChanges = Seq(
      ("delete", "d1", "one"), ("insert", "d1", "uno"),
      ("insert", "d3", "three"), ("delete", "d2", "two")
    ).toDF("_change_type", "jk", "name")
    val askedFactJk = scala.collection.mutable.Set[String]()
    val out = graft.operators.IncrementalOps
      .refreshJoin(mv, factChanges, dimChanges, "pk", "jk",
        factByPk = keys => {
          // no fact churn: an empty key frame must stay an empty read
          assert(keys.isEmpty, "factByPk must not be asked without fact churn")
          factsNow.join(keys, Seq("pk"), "left_semi")
        },
        factByJoinKey = keys => {
          askedFactJk.synchronized {
            askedFactJk ++= keys.collect().map(_.getString(0))
          }
          factsNow.join(keys, Seq("jk"), "left_semi")
        },
        dimByJoinKey = keys => dimNow.join(keys, Seq("jk"), "left_semi"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._2)
    assert(askedFactJk.toSet === Set("d1", "d2", "d3"),
      s"factByJoinKey asked: $askedFactJk")
    assert(out.toSeq === Seq(
      ("d1", 1L, 10L, "uno"),   // relabel reaches existing fact rows
      ("d1", 2L, 20L, "uno"),
      ("d3", 4L, 40L, "three"), // backfill: fact predates the view
      ("d5", 5L, 50L, "five")   // pass-through; f3 is GONE (dim deleted)
    ))
  }

  test("join-view refresh: null join keys pass through unchurned, and die through inner-join semantics when churned") {
    import spark.implicits._
    // a caller's view may carry a null-join-key row (e.g. an outer-join
    // view fed to the maintainer); the contract is: untouched -> passes
    // through byte-identical; churned -> routed to the region recompute,
    // where the inner join's plain equality drops it (nulls never join)
    val factsNow = Seq((1L, Option("d1"), 10L), (9L, Option.empty[String], 90L))
      .toDF("pk", "jk", "v")
    val dimNow = Seq(("d1", "one")).toDF("jk", "name")
    val mv = Seq((Option("d1"), 1L, 10L, "one"),
      (Option.empty[String], 9L, 90L, "?")).toDF("jk", "pk", "v", "name")
    val noFactChurn = Seq.empty[(String, Long, String, Long)]
      .toDF("_change_type", "pk", "jk", "v")
    def run(dimChanges: org.apache.spark.sql.DataFrame) =
      graft.operators.IncrementalOps
        .refreshJoin(mv, noFactChurn, dimChanges, "pk", "jk",
          factByPk = keys => factsNow.join(keys, Seq("pk"), "left_semi"),
          factByJoinKey = keys => factsNow.as("f")
            .join(keys.as("ks"), col("f.jk") <=> col("ks.jk"), "left_semi"),
          dimByJoinKey = keys => dimNow.join(keys, Seq("jk"), "left_semi"))
        .collect()
        .map(r => (if (r.isNullAt(0)) null else r.getString(0),
          r.getLong(1), r.getString(3)))
        .sortBy(_._2)
    // no churn at all: the null-key row survives verbatim
    val untouched = run(Seq.empty[(String, String, String)]
      .toDF("_change_type", "jk", "name"))
    assert(untouched.toSeq === Seq(("d1", 1L, "one"), (null, 9L, "?")))
    // null key churned: the row leaves pass-through and the inner
    // rejoin (correctly) never re-emits it
    val nullChurned = run(Seq(("delete", Option.empty[String], "?"))
      .toDF("_change_type", "jk", "name"))
    assert(nullChurned.toSeq === Seq(("d1", 1L, "one")))
  }

  test("distinct MV refresh: duplicate-copy churn moves nothing; births and deaths move exactly one") {
    import spark.implicits._
    // multiplicity: a holds v=1 twice and v=2 once; b holds v=5 once
    val mvMult = Seq(("a", 1L, 2L), ("a", 2L, 1L), ("b", 5L, 1L))
      .toDF("k", "v", "ref")
    val mvDistinct = Seq(("a", 2L, 3L), ("b", 1L, 1L)).toDF("k", "nd", "n")
    // a: delete ONE copy of the duplicated v=1 (nd must NOT move), delete
    // the only v=2 (death), insert brand-new v=7 (birth) — net nd 2 -> 2;
    // b: insert+delete of the same new value nets to no transition;
    // c: brand-new group from inserts alone
    val changes = Seq(
      ("a", 1L, "delete"), ("a", 2L, "delete"), ("a", 7L, "insert"),
      ("b", 9L, "insert"), ("b", 9L, "delete"),
      ("c", 3L, "insert"), ("c", 3L, "insert")
    ).toDF("k", "m", "_change_type")
    val out = graft.operators.IncrementalOps
      .refreshDistinct(mvMult, mvDistinct, changes, "k", col("m"),
        "v", "ref", "nd", "n")
    val mult = out.multiplicity.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(mult.toSeq === Seq(
      ("a", 1L, 1L), ("a", 7L, 1L), ("b", 5L, 1L), ("c", 3L, 2L)))
    val dist = out.distinct.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(dist.toSeq === Seq(("a", 2L, 2L), ("b", 1L, 1L), ("c", 1L, 2L)))
  }

  test("distinct MV refresh: null values count rows but never distinct; dead groups drop; negative refcounts raise") {
    import spark.implicits._
    val mvMult = Seq(("a", Option(1L), 1L), ("a", Option.empty[Long], 2L))
      .toDF("k", "v", "ref")
    val mvDistinct = Seq(("a", 1L, 3L)).toDF("k", "nd", "n")
    // kill a's only non-null value: the group must STAY (null rows keep
    // it alive) with nd = 0, the recompute's answer; then kill one null
    // row too — n drops to 1, nd stays 0
    val changes = Seq(
      ("a", Option(1L), "delete"), ("a", Option.empty[Long], "delete")
    ).toDF("k", "m", "_change_type")
    val out = graft.operators.IncrementalOps
      .refreshDistinct(mvMult, mvDistinct, changes, "k", col("m"),
        "v", "ref", "nd", "n")
    assert(out.distinct.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("a", 0L, 1L)))
    // group netted to zero rows drops from the distinct view entirely
    val killAll = Seq(
      ("a", Option(1L), "delete"), ("a", Option.empty[Long], "delete"),
      ("a", Option.empty[Long], "delete")
    ).toDF("k", "m", "_change_type")
    val dead = graft.operators.IncrementalOps
      .refreshDistinct(mvMult, mvDistinct, killAll, "k", col("m"),
        "v", "ref", "nd", "n")
    assert(dead.distinct.collect().isEmpty)
    assert(dead.multiplicity.collect().isEmpty)
    // deleting a value the table never held is an inconsistent feed —
    // BOTH outputs must fail loudly, not go negative
    val bogus = Seq(("a", Option(99L), "delete")).toDF("k", "m", "_change_type")
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    Seq(true, false).foreach { useMult =>
      val r = graft.operators.IncrementalOps
        .refreshDistinct(mvMult, mvDistinct, bogus, "k", col("m"),
          "v", "ref", "nd", "n")
      val e = intercept[Throwable] {
        (if (useMult) r.multiplicity else r.distinct).collect()
      }
      assert(causes(e).exists(c => Option(c.getMessage)
        .exists(_.contains("negative multiplicity"))),
        s"expected loud negative-multiplicity failure, got: ${e.getMessage}")
    }
  }

  test("approx-distinct MV refresh: insert-only folds by union without rescan; estimates exact in the sparse regime") {
    import spark.implicits._
    val base0 = Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("k", "v")
    val mv = base0.groupBy($"k").agg(hll_sketch_agg($"v").as("sk"))
    // a: inserts only (one duplicate, one new value); c: brand-new key.
    // The rescan THROWS — proof the insert-only window never reads base.
    val changes = Seq(
      ("a", 2L, "insert"), ("a", 3L, "insert"),
      ("c", 7L, "insert")
    ).toDF("k", "m", "_change_type")
    val out = graft.operators.IncrementalOps
      .refreshApproxDistinct(mv, changes, "k", col("m"), "sk",
        // the rescan fn is invoked at PLAN time to build the (empty)
        // branch — the no-rescan proof is that no key reaches it
        rescan = keys => {
          assert(keys.isEmpty, "insert-only refresh must not rescan")
          keys.withColumn("v", lit(0L))
        })
      .select($"k", hll_sketch_estimate($"sk").as("nd"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(out.toSeq === Seq(("a", 3L), ("b", 1L), ("c", 1L)))
  }

  test("approx-distinct MV refresh: deletes rescan exactly the deleted keys; dead groups drop; unknown types raise") {
    import spark.implicits._
    val base0 = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("c", 5L))
      .toDF("k", "v")
    val mv = base0.groupBy($"k").agg(hll_sketch_agg($"v").as("sk"))
    // a: delete v=1 AND insert v=9 — the whole group rescans (sketches
    // cannot forget) and the rescan read already contains the insert;
    // b: dies (only row deleted); c: untouched passes through
    val changes = Seq(
      ("a", 1L, "delete"), ("a", 9L, "insert"),
      ("b", 10L, "delete")
    ).toDF("k", "m", "_change_type")
    val baseNow = Seq(("a", 2L), ("a", 9L), ("c", 5L)).toDF("k", "v")
    val asked = scala.collection.mutable.Set[String]()
    val out = graft.operators.IncrementalOps
      .refreshApproxDistinct(mv, changes, "k", col("m"), "sk",
        rescan = keys => {
          asked.synchronized { asked ++= keys.collect().map(_.getString(0)) }
          baseNow.join(keys, Seq("k"), "left_semi")
        })
      .select($"k", hll_sketch_estimate($"sk").as("nd"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(asked.toSet === Set("a", "b"), s"rescanned: $asked")
    assert(out.toSeq === Seq(("a", 2L), ("c", 1L)))
    val bad = Seq(("a", 1L, "upsert")).toDF("k", "m", "_change_type")
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    val e = intercept[Throwable] {
      graft.operators.IncrementalOps
        .refreshApproxDistinct(mv, bad, "k", col("m"), "sk",
          rescan = keys => keys.withColumn("v", lit(0L)))
        .collect()
    }
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("unknown _change_type"))), e.getMessage)
  }

  test("approx-distinct MV refresh: dense-regime union estimates stay within the sketch's error bounds of a recompute") {
    import spark.implicits._
    // 5000 distinct values per key — far past the lgK=12 list/set regime,
    // where union invalidates the HIP estimator: merged and recomputed
    // estimates may legitimately differ, but BOTH must sit within the
    // published ~1.6% (3-sigma ~ 4.9%) relative error of the truth
    val half1 = spark.range(0, 2500).selectExpr("'k' as k", "id as v")
    val half2 = spark.range(2500, 5000).selectExpr("'k' as k", "id as v")
    val mv = half1.groupBy($"k").agg(hll_sketch_agg($"v").as("sk"))
    val changes = half2.select($"k", $"v".as("m"), lit("insert").as("_change_type"))
    val merged = graft.operators.IncrementalOps
      .refreshApproxDistinct(mv, changes, "k", col("m"), "sk",
        rescan = keys => {
          assert(keys.isEmpty, "insert-only refresh must not rescan")
          keys.withColumn("v", lit(0L))
        })
      .select(hll_sketch_estimate($"sk")).collect().head.getLong(0)
    val recomputed = half1.unionByName(half2).groupBy($"k")
      .agg(hll_sketch_estimate(hll_sketch_agg($"v")).as("e"))
      .select($"e").collect().head.getLong(0)
    def relErr(est: Long): Double = math.abs(est - 5000.0) / 5000.0
    assert(relErr(merged) < 0.05, s"merged estimate $merged off by ${relErr(merged)}")
    assert(relErr(recomputed) < 0.05, s"recomputed estimate $recomputed off by ${relErr(recomputed)}")
  }

  test("MV refresh fails loudly on an unknown change type") {
    import spark.implicits._
    val mv = Seq(("a", 1L, 1L)).toDF("k", "s", "n")
    val changes = Seq(("a", 2L, "upsert")).toDF("k", "m", "_change_type")
    val e = intercept[Throwable] {
      graft.operators.IncrementalOps
        .refreshSumCount(mv, changes, "k", col("m"), "s", "n")
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("unknown _change_type"))),
      s"expected a loud unknown-change-type failure, got: ${e.getMessage}")
  }
}
