package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Functions
import QueryUtil._

/** Similarity search over the `embeddings` fixture (64-dim float vectors;
  * SURVEY.md §2.C). Two paths:
  *
  *  - brute force: broadcast the query vector, codegen'd cosine over the
  *    full scan, TakeOrderedAndProject top-k. At 100 TB this is one pass,
  *    embarrassingly parallel, zero shuffle beyond the final top-k merge —
  *    the correct baseline, and often the right answer outright.
  *  - LSH-bucketed: random-hyperplane signs -> bucket id; only the query's
  *    bucket is scanned. The 100 TB path when the corpus is queried often
  *    (bucket once, then each probe reads ~1/2^H of the data; partition
  *    the stored table by bucket so probes are partition-pruned scans).
  */
object SimilarityQueries {

  private val QueryVecId = 0

  /** q_sim_topk_ivf's DYNAMIC oracle (Q.oracleFn): the SQL text embeds the
    * KMeans centroids and probed cells the run actually fitted, so it can
    * only be authored AFTER the query executes. The query fn stores it
    * here; Verify reads `oracleNow` post-run when dumping oracle_sql.json.
    *
    * LAST-WRITER-WINS by design: the holder is object-global, so two runs
    * of the query against DIFFERENT sf dirs in one JVM would leave the
    * second run's centroids in the dump. That is exactly the consumer's
    * contract — only Verify reads `oracleNow`, it runs each query once
    * against ONE sfDir on a single thread, then dumps. Spec JVMs write
    * the holder too but never dump it.
    */
  private val ivfOracle =
    new java.util.concurrent.atomic.AtomicReference[Option[String]](None)

  /** q_embed_clusters' dynamic oracle — same mechanism as [[ivfOracle]]. */
  private val clustersOracle =
    new java.util.concurrent.atomic.AtomicReference[Option[String]](None)

  /** q_dedup_semantic's dynamic oracle — same mechanism as [[ivfOracle]]. */
  private val semanticOracle =
    new java.util.concurrent.atomic.AtomicReference[Option[String]](None)

  /** q_sim_ivf_ingest's dynamic oracle — same mechanism as [[ivfOracle]]. */
  private val ivfIngestOracle =
    new java.util.concurrent.atomic.AtomicReference[Option[String]](None)

  /** Shortest round-trip double repr — DuckDB's parser is correctly
    * rounded, so the literal parses back to the identical double bits.
    */
  private def dbl(d: Double): String = java.lang.Double.toString(d)

  /** DuckDB mirror of IvfIndex.assignCells over the same float32-rounded
    * centroid literals: score_i = c_i·c_i - 2·list_dot_product(e, c_i),
    * cell = first-index argmin. list_dot_product accumulates left-to-right
    * in double exactly like functions.DotProduct's sequential loop, and
    * list_position breaks ties at the first occurrence exactly like
    * Spark's array_position — identical bits end to end. Emits the WITH
    * prefix ending in `assigned(vec_id, label, e, cell)`; shared by the
    * IVF probe oracle and the clustering oracle.
    */
  private def assignedCteSql(centroids: Array[Array[Float]]): String = {
    val scoreExprs = centroids.map { f =>
      val lst = f.map(v => dbl(v.toDouble)).mkString("[", ", ", "]")
      s"(${dbl(graft.operators.IvfIndex.selfDot(f))} - 2 * list_dot_product(e, $lst))"
    }
    s"""WITH emb AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |), scored AS (
       |  SELECT vec_id, label, e,
       |         [${scoreExprs.mkString(",\n          ")}] AS scores
       |  FROM emb
       |), assigned AS (
       |  SELECT vec_id, label, e,
       |         list_position(scores, list_min(scores)) - 1 AS cell
       |  FROM scored
       |)""".stripMargin
  }

  /** DuckDB mirror of IvfIndex.buildBalanced's HIERARCHICAL assignment:
    * the root argmin from [[assignedCteSql]], then one CASE level per
    * split depth — each over-cap parent path refines via its own
    * sub-centroid argmin (same score algebra, same first-index
    * tie-break), all others pass through. Emits CTEs ending in
    * `balanced(vec_id, label, e, cell)` with STRING path cells
    * ("3", "3.1"). Splits arrive level-ordered from the builder; the
    * groupBy re-derives levels from the dot count so the SQL shape is
    * independent of fit order.
    */
  private def balancedAssignSql(
      root: Array[Array[Float]],
      splits: Seq[(String, Array[Array[Float]])]): String = {
    def scoreList(cents: Array[Array[Float]]): String =
      cents.map { f =>
        val lst = f.map(v => dbl(v.toDouble)).mkString("[", ", ", "]")
        s"(${dbl(graft.operators.IvfIndex.selfDot(f))} - 2 * list_dot_product(e, $lst))"
      }.mkString("[", ",\n           ", "]")
    val sb = new StringBuilder(assignedCteSql(root))
    sb.append(
      """, a0 AS (
        |  SELECT vec_id, label, e, CAST(cell AS VARCHAR) AS p FROM assigned
        |)""".stripMargin)
    val byLevel = splits.groupBy(_._1.count(_ == '.')).toSeq.sortBy(_._1)
    var lvl = 0
    byLevel.foreach { case (_, ss) =>
      val scoreCols = ss.zipWithIndex.map { case ((_, cents), i) =>
        s"${scoreList(cents)} AS sc_$i"
      }
      val cases = ss.zipWithIndex.map { case ((p, _), i) =>
        s"WHEN p = '$p' THEN p || '.' || " +
          s"CAST(list_position(sc_$i, list_min(sc_$i)) - 1 AS VARCHAR)"
      }
      sb.append(s""", l${lvl}s AS (
         |  SELECT vec_id, label, e, p,
         |         ${scoreCols.mkString(",\n         ")}
         |  FROM a$lvl
         |), a${lvl + 1} AS (
         |  SELECT vec_id, label, e,
         |         CASE ${cases.mkString("\n              ")}
         |              ELSE p END AS p
         |  FROM l${lvl}s
         |)""".stripMargin)
      lvl += 1
    }
    sb.append(
      s", balanced AS (\n  SELECT vec_id, label, e, p AS cell FROM a$lvl\n)")
    sb.toString
  }

  private def ivfOracleSql(
      centroids: Array[Array[Float]],
      probedCells: Seq[Int]
  ): String =
    s"""${assignedCteSql(centroids)}, topk AS (
       |  SELECT x.vec_id, x.label,
       |         round(list_cosine_similarity(x.e, q.e), 6) AS cos
       |  FROM assigned x, (SELECT e FROM emb WHERE vec_id = $QueryVecId) q
       |  WHERE x.cell IN (${probedCells.mkString(", ")})
       |  ORDER BY cos DESC, x.vec_id
       |  LIMIT 10
       |)
       |SELECT vec_id, label, cos FROM topk WHERE vec_id <> $QueryVecId""".stripMargin

  /** Deterministic plan-time ±1 hyperplanes (see functions.LshPlanes). */
  private def hyperplane(h: Int, dim: Int): Seq[Float] =
    graft.functions.LshPlanes.plane(h, dim)

  private def hyperplaneCol(h: Int, dim: Int) =
    array(hyperplane(h, dim).map(v => lit(v)): _*).cast("array<float>")

  /** The same hyperplane as a DuckDB DOUBLE[] literal — ±1.0 is exact in
    * both float and double, so the engine-side and oracle-side dot
    * products run on identical operands.
    */
  private def hyperplaneSql(h: Int, dim: Int): String =
    hyperplane(h, dim)
      .map(v => if (v > 0) "1.0" else "-1.0")
      .mkString("[", ", ", "]")

  /** DuckDB mirror of `bucketCol`: same sign-bit bucket arithmetic over
    * the same literals (list_dot_product accumulates left-to-right in
    * double, matching DotProduct's sequential loop).
    */
  private def bucketSql(embExpr: String, hps: Int, dim: Int): String =
    (0 until hps)
      .map(h =>
        s"(CASE WHEN list_dot_product($embExpr, ${hyperplaneSql(h, dim)}) > 0 " +
          s"THEN ${1 << h} ELSE 0 END)"
      )
      .mkString(" + ")

  /** 2^H-bucket id from the signs of H hyperplane dot products.
    * `private[graft]` so ScaleProbe.simScaleProbe buckets with the SAME
    * hyperplanes/arithmetic the query uses — no inline replica to drift.
    */
  private[graft] def bucketCol(emb: org.apache.spark.sql.Column, hps: Int, dim: Int) =
    (0 until hps)
      .map(h =>
        when(Functions.dotProduct(emb, hyperplaneCol(h, dim)) > 0, lit(1 << h))
          .otherwise(lit(0))
      )
      .reduce(_ + _)

  val all: Seq[Q] = Seq(
    // Brute-force cosine top-k: the oracle is the same computation in
    // DuckDB, so this is a fully correctness-gated ANN baseline.
    Q(
      "q_sim_topk",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val qv = e
          .filter($"vec_id" === QueryVecId)
          .select($"embedding".as("qvec"))
        e.filter($"vec_id" =!= QueryVecId)
          .crossJoin(broadcast(qv))
          .select(
            $"vec_id",
            $"label",
            round(Functions.cosineSim($"embedding", $"qvec"), 6).as("cos")
          )
          .orderBy($"cos".desc, $"vec_id")
          .limit(10)
      },
      Some(
        s"SELECT e.vec_id, e.label, " +
          "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS cos " +
          s"FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = $QueryVecId) q " +
          s"WHERE e.vec_id <> $QueryVecId " +
          "ORDER BY cos DESC, e.vec_id LIMIT 10"
      ),
      bench = true
    ),
    // LSH-bucketed ANN: scan only vectors sharing the query's hyperplane
    // sign bucket. The hyperplanes are deterministic plan-time ±1 literals,
    // so the SAME bucket arithmetic is expressible in DuckDB — this query
    // is fully hash-oracled, not just rows-checked; SimilaritySpec
    // additionally asserts bucket recall against the brute-force top-k.
    Q(
      "q_sim_topk_lsh",
      (s, dir) => {
        val dim = 64
        val hps = 4 // 16 buckets; each probe scans ~1/16 of the corpus
        val e = t(s, dir, "embeddings")
          .withColumn("bucket", bucketCol($"embedding", hps, dim))
        val qv = e
          .filter($"vec_id" === QueryVecId)
          .select($"embedding".as("qvec"), $"bucket".as("qbucket"))
        e.filter($"vec_id" =!= QueryVecId)
          .join(broadcast(qv), $"bucket" === $"qbucket")
          .select(
            $"vec_id",
            $"label",
            round(Functions.cosineSim($"embedding", $"qvec"), 6).as("cos")
          )
          .orderBy($"cos".desc, $"vec_id")
          .limit(10)
      },
      Some {
        val bucket = bucketSql("e", hps = 4, dim = 64)
        s"""WITH emb AS (
           |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
           |), bkt AS (
           |  SELECT vec_id, label, e, $bucket AS bucket FROM emb
           |)
           |SELECT x.vec_id, x.label,
           |       round(list_cosine_similarity(x.e, q.e), 6) AS cos
           |FROM bkt x, (SELECT e, bucket FROM bkt WHERE vec_id = $QueryVecId) q
           |WHERE x.vec_id <> $QueryVecId AND x.bucket = q.bucket
           |ORDER BY cos DESC, x.vec_id LIMIT 10""".stripMargin
      }
    ),
    // Int8 symmetric quantization: per-vector scale s = 127/max|x|,
    // q = floor(x*s + 0.5) — the 4x memory cut (float32 -> int8) that makes
    // a 100 TB embedding corpus fit a cluster's RAM budget; the quantized
    // dot product is rescaled by 1/(s_a*s_b) to approximate the original.
    // Every step is exact-or-deterministic double arithmetic (floor, not
    // round: round() half-ties differ between engines for negatives), so
    // the whole pipeline hash-matches the DuckDB mirror; SimilaritySpec
    // bounds the quantization error against the exact dot product.
    Q(
      "q_sim_quantized",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val dbl = e.select(
          $"vec_id",
          $"label",
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e")
        )
        val q = dbl
          .withColumn(
            "s",
            lit(127.0) /
              greatest(expr("array_max(transform(e, x -> abs(x)))"), lit(1e-30))
          )
          .select(
            $"vec_id",
            $"label",
            expr("transform(e, x -> floor(x * s + 0.5))").as("qv"),
            $"s"
          )
        q.as("a")
          .join(
            q.as("b"),
            col("a.label") === col("b.label") &&
              col("a.vec_id") < col("b.vec_id") && col("a.vec_id") < 20
          )
          .select(
            col("a.vec_id").as("id_a"),
            col("b.vec_id").as("id_b"),
            round(
              expr(
                "aggregate(zip_with(a.qv, b.qv, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
                / (col("a.s") * col("b.s")),
              6
            ).as("qdot")
          )
          .orderBy($"id_a", $"id_b")
          .limit(10)
      },
      Some(
        """WITH emb AS (
          |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          |), scaled AS (
          |  SELECT vec_id, label, e,
          |         127.0 / greatest(list_max(list_transform(e, x -> abs(x))), 1e-30) AS s
          |  FROM emb
          |), q AS (
          |  SELECT vec_id, label,
          |         list_transform(e, x -> floor(x * s + 0.5)) AS qv, s
          |  FROM scaled
          |)
          |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |       round(list_dot_product(a.qv, b.qv) / (a.s * b.s), 6) AS qdot
          |FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
          |WHERE a.vec_id < 20
          |ORDER BY id_a, id_b LIMIT 10""".stripMargin
      )
    ),
    // IVF-partitioned ANN over the MATERIALIZED index: build (sample-fit
    // KMeans) -> write partitioned by cell -> probe via the written table,
    // so the query exercised here is the partition-pruned scan that scales
    // (see operators.IvfIndex; SimilaritySpec asserts PartitionFilters and
    // that only nProbe cells' files are read). The fit stays KMeans, but
    // the labelling pass is IvfIndex.assignCells — a deterministic
    // sequential-dot argmin whose DuckDB mirror (centroids embedded as
    // post-run literals via the oracleFn hook) reproduces every bit, so
    // this query carries a full hash oracle; SimilaritySpec additionally
    // measures recall against brute force.
    Q(
      "q_sim_topk_ivf",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val model = graft.operators.IvfIndex.build(e, "embedding")
        // per-(sfdir, JVM) path, overwritten on each build: repeated
        // invocations within one process reuse ONE directory instead of
        // leaking a fresh index copy into /tmp per run, while the PID
        // component keeps concurrent JVMs (bench + verify in parallel CI)
        // from racing overwrite-vs-scan on a shared mutable index
        val idxPath = java.nio.file.Paths
          .get(
            System.getProperty("java.io.tmpdir"),
            s"graft_ivf_${math.abs(dir.hashCode)}_p${ProcessHandle.current().pid()}"
          )
          .toString
        graft.engine.TempDirs.register(java.nio.file.Paths.get(idxPath))
        val idx = graft.operators.IvfIndex.materialize(model, idxPath)
        val query = e
          .filter($"vec_id" === QueryVecId)
          .select($"embedding")
          .head()
          .getSeq[Float](0)
          .toArray
        val probed =
          graft.operators.IvfIndex.rankCells(idx.centroids, query).take(4)
        ivfOracle.set(
          Some(
            ivfOracleSql(
              idx.centroids.map(graft.operators.IvfIndex.centroidF32),
              probed
            )
          )
        )
        graft.operators.IvfIndex
          .probeStored(s, idx, query, "embedding", k = 10, nProbe = 4)
          .filter($"vec_id" =!= QueryVecId)
          .select($"vec_id", $"label", $"cos")
      },
      None,
      oracleFn = Some(() => ivfOracle.get())
    ),
    // Embedding corpus clustering — topic binning for data mixing /
    // cluster-balanced sampling (group the corpus into K semantic cells,
    // then weight or quota per cell). Same machinery as IVF: seeded
    // sample-capped KMeans fit + the deterministic assignCells labelling,
    // whose DuckDB mirror (fitted centroids as post-run literals) makes
    // the per-cell histogram fully hash-oracled. One codegen'd pass over
    // the corpus + a 16-group aggregation: nothing here breaks at 100 TB
    // (the FIT is sample-capped; the labelling is map-only).
    Q(
      "q_embed_clusters",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val model = graft.operators.IvfIndex.build(e, "embedding")
        clustersOracle.set(
          Some {
            val cte = assignedCteSql(
              model.centroids.map(graft.operators.IvfIndex.centroidF32))
            s"""$cte
               |SELECT CAST(cell AS BIGINT) AS cell, count(*) AS n,
               |       min(vec_id) AS exemplar_id
               |FROM assigned GROUP BY cell ORDER BY cell""".stripMargin
          }
        )
        model.assignments
          .groupBy($"cell".cast("bigint").as("cell"))
          .agg(count(lit(1)).as("n"), min($"vec_id").as("exemplar_id"))
          .orderBy($"cell")
      },
      None,
      oracleFn = Some(() => clustersOracle.get())
    ),
    // ----- semantic dedup (SemDeDup) ---------------------------------------
    // Abbas et al. 2023: cluster the embedding space, then remove
    // near-duplicates WITHIN each cluster — the clusters bound the
    // pairwise comparison to O(sum |cell|^2) instead of O(n^2), which is
    // the whole reason semantic dedup runs at corpus scale (k grows with
    // the corpus, so cells stay bounded). Greedy keep-lowest-id: a vector
    // is dropped when ANY earlier vector in its cell clears the cosine
    // threshold; the kept_id column names its surviving representative,
    // making the drop auditable. Cross-cell near-dups are missed by
    // construction — that is SemDeDup's documented recall trade, not a
    // bug. Same dynamic-oracle mechanism as the IVF queries: the fitted
    // centroids are embedded as DuckDB literals post-run, so the cell
    // assignment, the pairwise cosines, and the greedy election are all
    // hash-gated end to end.
    Q(
      "q_dedup_semantic",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        // cellCap scaled to the fixture (~3x the n/k mean) so the SPLIT
        // path is exercised at every verify SF — production sets the cap
        // the same way, as a multiple of the target mean cell size
        val model = graft.operators.IvfIndex.buildBalanced(
          e, "embedding", nCells = 16, cellCap = 48)
        semanticOracle.set(
          Some {
            val cte = balancedAssignSql(
              model.root.map(graft.operators.IvfIndex.centroidF32),
              model.splits.map { case (p, cs) =>
                (p, cs.map(graft.operators.IvfIndex.centroidF32))
              })
            s"""$cte
               |SELECT b.cell AS cell, b.vec_id AS dup_id,
               |       min(a.vec_id) AS kept_id
               |FROM balanced a JOIN balanced b
               |  ON a.cell = b.cell AND a.vec_id < b.vec_id
               |WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.3
               |GROUP BY b.cell, b.vec_id
               |ORDER BY dup_id""".stripMargin
          }
        )
        semanticDupPairs(model.assignments).orderBy($"dup_id")
      },
      None,
      oracleFn = Some(() => semanticOracle.get())
    ),
    // ----- stored incremental IVF index (IvfStore) --------------------------
    // The daily-append shape: build the index once, then each increment
    // pays ONE map-only assignment pass + a metadata commit — the indexed
    // corpus is never re-read (operators.IvfStore; IvfStoreSpec pins the
    // crash/race/split/compaction lifecycle). This query drives the whole
    // lifecycle on the fixture — create on half the corpus, two ingests,
    // hot cells splitting in the model mid-stream — then probes. The
    // probe is exact w.r.t. the final model (stored prefix labels are a
    // directory-pruned I/O superset; the current-leaf re-filter runs on
    // candidates only), so the DuckDB oracle replays the HIERARCHICAL
    // assignment over the whole table with the fitted centroids as
    // post-run literals and must hash-match bit for bit.
    Q(
      "q_sim_ivf_ingest",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val storeRoot = java.nio.file.Paths
          .get(
            System.getProperty("java.io.tmpdir"),
            s"graft_ivfstore_${math.abs(dir.hashCode)}_p${ProcessHandle.current().pid()}"
          )
          .toString
        graft.engine.TempDirs.register(java.nio.file.Paths.get(storeRoot))
        // rebuilt from scratch per invocation: the lifecycle IS the query
        graft.operators.IvfStore.destroy(storeRoot)
        graft.operators.IvfStore.create(
          e.filter($"vec_id" < 250), "embedding", storeRoot,
          nCells = 8, cellCap = 45, splitK = 2)
        graft.operators.IvfStore.ingest(
          s, storeRoot, e.filter($"vec_id" >= 250 && $"vec_id" < 400))
        val m = graft.operators.IvfStore.ingest(
          s, storeRoot, e.filter($"vec_id" >= 400))
        val query = e
          .filter($"vec_id" === QueryVecId)
          .select($"embedding")
          .head()
          .getSeq[Float](0)
          .toArray
        val probed = graft.operators.IvfStore.probedLeaves(m, query, nProbe = 3)
        ivfIngestOracle.set(
          Some {
            val cte = balancedAssignSql(
              m.model.root.toArray,
              m.model.splits.map { case (p, cs) =>
                (p.stripPrefix("c"), cs.toArray)
              })
            val cells = probed.map(p => s"'${p.stripPrefix("c")}'")
            s"""$cte, topk AS (
               |  SELECT x.vec_id, x.label,
               |         round(list_cosine_similarity(x.e, q.e), 6) AS cos
               |  FROM balanced x, (SELECT e FROM emb WHERE vec_id = $QueryVecId) q
               |  WHERE x.cell IN (${cells.mkString(", ")})
               |  ORDER BY cos DESC, x.vec_id
               |  LIMIT 10
               |)
               |SELECT vec_id, label, cos FROM topk WHERE vec_id <> $QueryVecId""".stripMargin
          }
        )
        graft.operators.IvfStore
          .probe(s, storeRoot, query, k = 10, nProbe = 3)
          .filter($"vec_id" =!= QueryVecId)
          .select($"vec_id", $"label", $"cos")
      },
      None,
      oracleFn = Some(() => ivfIngestOracle.get())
    )
  )

  /** SemDeDup's within-cell greedy election over ANY `cell`-labelled
    * assignment frame — flat int cells (Model) or balanced string paths
    * (SplitModel) alike. Shared by `q_dedup_semantic` and ScaleProbe's
    * similarity probe (which scales nCells with the corpus AND caps cell
    * sizes via the balanced build, so the per-cell pairwise cost stays
    * bounded as the corpus grows).
    */
  private[graft] def semanticDupPairs(
      assigned: org.apache.spark.sql.DataFrame
  ): org.apache.spark.sql.DataFrame = {
    val a = assigned
      .select($"cell", $"vec_id".as("id_a"), $"embedding".as("emb_a"))
    val b = assigned
      .select($"cell", $"vec_id".as("dup_id"), $"embedding".as("emb_b"))
    a.join(b, Seq("cell"))
      .filter($"id_a" < $"dup_id")
      .filter(
        round(graft.functions.Functions.cosineSim($"emb_a", $"emb_b"), 6)
          >= 0.3)
      .groupBy($"cell", $"dup_id")
      .agg(min($"id_a").as("kept_id"))
  }
}
