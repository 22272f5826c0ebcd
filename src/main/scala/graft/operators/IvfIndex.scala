package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) index for approximate nearest neighbor over an
  * embedding column — the second scale path next to the random-hyperplane
  * LSH in SimilarityQueries.
  *
  * Build: KMeans (fixed seed) fit on a bounded SAMPLE of the corpus (a
  * coarse quantizer needs ~1000 points per cell, not 100 TB of them)
  * partitions vectors into nCells Voronoi cells; every vector is then
  * assigned its cell id in one full codegen'd pass.
  *
  * Store: `materialize` writes the assignments PARTITIONED BY cell, so a
  * probe is a partition-pruned scan — `probeStored`'s `cell IN (...)`
  * filter shows up as `PartitionFilters` in the scan node and only
  * nProbe/nCells of the files are ever opened (asserted by
  * SimilaritySpec).
  *
  * Probe: rank cells by centroid distance to the query, scan the nProbe
  * closest, exact-score candidates with the codegen'd cosine.
  */
object IvfIndex {

  final case class Model(
      assignments: DataFrame, // original columns + `cell`
      centroids: Array[MlVector]
  )

  /** A materialized index: cell-partitioned parquet + the centroid table. */
  final case class StoredIndex(path: String, centroids: Array[MlVector])

  /** Fit the cell structure. `embCol` must be array<float>.
    *
    * @param maxTrainRows cap on the KMeans training set: corpora above it
    *                     are down-sampled (seeded, so the build is
    *                     reproducible). The full corpus is still assigned
    *                     a cell — only the FIT is sampled.
    */
  def build(
      df: DataFrame,
      embCol: String,
      nCells: Int = 16,
      seed: Long = 42L,
      maxTrainRows: Long = 100000L
  ): Model = {
    val cents = fitCentroids(df, embCol, nCells, seed, maxTrainRows)
    Model(assignCells(df, embCol, cents), cents)
  }

  /** The KMeans fit alone (seeded, sample-capped): the coarse-quantizer
    * training step shared by [[build]] and the per-cell refits of
    * [[buildBalanced]]. Memoized per (plan, k, seed, cap) within the
    * call via the df's analyzed plan would be over-engineering — the
    * fit is cheap on the capped sample and callers hold the result.
    */
  def fitCentroids(
      df: DataFrame,
      embCol: String,
      k: Int,
      seed: Long = 42L,
      maxTrainRows: Long = 100000L
  ): Array[MlVector] = {
    // null embeddings can't train a quantizer (array_to_vector NPEs on
    // them mid-fit) — they are assignable, though: assignCells labels
    // them with a null cell, which every downstream join/probe drops
    val withVec = df.filter(col(embCol).isNotNull)
      .withColumn("__vec", array_to_vector(col(embCol)))
    val n = withVec.count()
    val train =
      if (n <= maxTrainRows) withVec
      else {
        // slight oversample so the seeded Bernoulli draw lands >= the cap
        // with near-certainty; KMeans only needs a representative sample
        val fraction = math.min(1.0, maxTrainRows.toDouble * 1.1 / n.toDouble)
        withVec.sample(withReplacement = false, fraction, seed)
      }
    val km = new KMeans()
      .setK(k)
      .setSeed(seed)
      .setFeaturesCol("__vec")
      // never materialized — but fit() validates the name does not
      // collide, and buildBalanced's sub-fit inputs already carry `cell`
      .setPredictionCol("__cell_pred")
    km.fit(train).clusterCenters
  }

  /** Centroid rounded to float32 — the precision both the engine and the
    * DuckDB oracle share (DotProduct takes array<float> operands).
    */
  def centroidF32(c: MlVector): Array[Float] = c.toArray.map(_.toFloat)

  /** Sequential-order self dot product of a float-rounded centroid; the
    * constant term of the assignment score, embedded as a literal on both
    * engine and oracle sides so the bits are identical by construction.
    */
  def selfDot(f: Array[Float]): Double = {
    var d = 0.0
    var i = 0
    while (i < f.length) { val v = f(i).toDouble; d += v * v; i += 1 }
    d
  }

  /** Deterministic nearest-centroid assignment, replacing KMeansModel
    * .transform for the labelling pass. transform's fastSquaredDistance
    * (norm-cached, precision-gated) is not reproducible outside Spark ML;
    * this computes argmin_i [ c_i·c_i - 2·(x·c_i) ] — same argmin as
    * euclidean distance since x·x is constant per row — with a strictly
    * sequential double-accumulation dot product (functions.DotProduct) over
    * float32 operands. Every step (float widen, sequential fma-free adds,
    * multiply by 2, subtract, argmin with first-index tie-break) has an
    * exact DuckDB mirror, which is what lets q_sim_topk_ivf carry a full
    * hash oracle instead of a rows-only check. Fitting stays KMeans; only
    * the labelling is re-expressed.
    */
  def assignCells(
      df: DataFrame,
      embCol: String,
      centroids: Array[MlVector]
  ): DataFrame =
    df.withColumn("cell", cellIdxExpr(col(embCol), centroids))

  /** The nearest-centroid argmin as a bare int Column — assignCells'
    * body, reusable inside the per-level when-chains of [[buildBalanced]].
    */
  def cellIdxExpr(
      emb: org.apache.spark.sql.Column,
      centroids: Array[MlVector]): org.apache.spark.sql.Column = {
    val scores = centroids.toIndexedSeq.map { c =>
      val f = centroidF32(c)
      val centLit = array(f.toIndexedSeq.map(v => lit(v)): _*).cast("array<float>")
      lit(selfDot(f)) -
        lit(2.0) * graft.functions.Functions.dotProduct(emb, centLit)
    }
    val scoreArr = array(scores: _*)
    // first-occurrence argmin: array_position is 1-based and returns the
    // FIRST index equal to the min — DuckDB's list_position ties the same way
    (array_position(scoreArr, array_min(scoreArr)) - 1).cast("int")
  }

  /** A cell-size-BALANCED model: hierarchical coarse quantization. Cells
    * are string paths ("3", "3.1", "3.1.2"); `splits` records, in the
    * order they were fitted, each over-cap parent path and the
    * sub-centroids that refine it — everything an oracle needs to replay
    * the assignment exactly.
    */
  final case class SplitModel(
      assignments: DataFrame, // original columns + string `cell` path
      root: Array[MlVector],
      splits: Seq[(String, Array[MlVector])]
  )

  /** [[build]] plus the production bound SemDeDup needs: KMeans balances
    * nothing — a skewed fit leaves cells far above n/k, and every
    * within-cell pairwise pass pays |cell|^2 for them (the measured 2M
    * overage in BASELINE.md r12). So after the root fit, any cell above
    * `cellCap` rows is recursively re-quantized with a `splitK`-way
    * sub-KMeans (fit on the cell's own rows, seeded per path) until
    * every cell fits the cap, the sub-fit stops making progress
    * (identical-vector pileups cannot be split), or `maxDepth` levels.
    *
    * Scale shape: each level is ONE map-only codegen pass over the
    * corpus (a when-chain of argmin expressions keyed by parent path)
    * plus one bounded count agg; the per-cell KMeans fits sample at most
    * `maxTrainRows` each and the number of fits is bounded by the number
    * of over-cap cells. Nothing here is driver-quadratic, and the
    * election pass downstream becomes Σ|cell|² ≤ n·cellCap — linear in
    * the corpus at fixed cap.
    */
  def buildBalanced(
      df: DataFrame,
      embCol: String,
      nCells: Int = 16,
      cellCap: Long = 100000L,
      splitK: Int = 4,
      maxDepth: Int = 4,
      seed: Long = 42L,
      maxTrainRows: Long = 100000L
  ): SplitModel = {
    require(splitK >= 2, "splitK must split")
    val root = fitCentroids(df, embCol, nCells, seed, maxTrainRows)
    // Each level is PINNED (PersistScope) before the per-cell work: the
    // size count, every sub-fit's filter, and the next level's refinement
    // all read the cached labels. Without the pin, each of potentially
    // hundreds of sub-fits would recompute the full k-way argmin chain
    // over the whole corpus just to filter one cell — the difference
    // between minutes and hours at 2M vectors and k ∝ n. The final
    // level's pin also feeds the election's self-join (the pinEager
    // contract); the driver's releaseAll drops every level after the
    // query, and superseded levels unpersist eagerly below.
    var assigned = graft.engine.PersistScope.pinEager(
      df.withColumn("cell", cellIdxExpr(col(embCol), root).cast("string")))
    val splits = Vector.newBuilder[(String, Array[MlVector])]
    // parent sizes from the previous level, for the no-progress stop
    var parentSize = Map.empty[String, Long]
    var depth = 0
    var continue = true
    while (continue && depth < maxDepth) {
      val sizes = assigned.groupBy("cell").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // a child the same size as its parent means the sub-fit put every
      // row in one subcell (an identical-vector pileup) — re-splitting
      // it would loop to maxDepth for nothing, so it stays excluded
      // (parentSize ACCUMULATES across levels for exactly that).
      // Null-embedding rows land in a NULL cell (cellIdxExpr of null is
      // null) — unsplittable by construction, excluded like the flat
      // build tolerated them; downstream elections drop null cells at
      // the join.
      val over = sizes.filter { case (p, n) =>
        p != null && n > cellCap && !parentSize.get(parentOf(p)).contains(n)
      }.keys.toSeq.sorted // deterministic fit order
      if (over.isEmpty) continue = false
      else {
        val levelSplits = over.map { p =>
          // per-path seed: sub-fits on different cells must not share a
          // sampling/init stream, but the same cell must refit identically
          val cents = fitCentroids(
            assigned.filter(col("cell") === p), embCol, splitK,
            seed ^ p.hashCode.toLong, maxTrainRows)
          (p, cents)
        }
        levelSplits.foreach(splits += _)
        val refined = levelSplits.foldRight(col("cell")) {
          case ((p, cents), els) =>
            when(col("cell") === p,
              concat(col("cell"), lit("."),
                cellIdxExpr(col(embCol), cents).cast("string")))
              .otherwise(els)
        }
        val prev = assigned
        assigned = graft.engine.PersistScope.pinEager(
          prev.withColumn("cell", refined))
        prev.unpersist(blocking = false)
        parentSize = parentSize ++ sizes
        depth += 1
      }
    }
    SplitModel(assigned, root, splits.result())
  }

  private def parentOf(path: String): String = {
    val i = path.lastIndexOf('.')
    if (i < 0) "" else path.substring(0, i)
  }

  /** Write the assignments partitioned by cell — the layout that turns a
    * probe into a partition-pruned scan of nProbe directories.
    */
  def materialize(model: Model, path: String): StoredIndex = {
    model.assignments.write.mode("overwrite").partitionBy("cell").parquet(path)
    StoredIndex(path, model.centroids)
  }

  /** Cell ids ranked by (euclidean) distance of centroid to query. */
  def rankCells(centroids: Array[MlVector], query: Array[Float]): Seq[Int] = {
    val q = query.map(_.toDouble)
    centroids.zipWithIndex
      .map { case (c, i) =>
        val arr = c.toArray
        var d = 0.0
        var j = 0
        while (j < arr.length && j < q.length) {
          val diff = arr(j) - q(j); d += diff * diff; j += 1
        }
        (i, d)
      }
      .sortBy { case (i, d) => (d, i) }
      .map(_._1)
      .toSeq
  }

  def rankCells(model: Model, query: Array[Float]): Seq[Int] =
    rankCells(model.centroids, query)

  /** Top-k by cosine within the nProbe closest cells of an in-memory
    * assignment table (no storage layout — fine for interactive reuse of
    * a just-built model; `probeStored` is the scan-pruned scale path).
    */
  def probe(
      model: Model,
      query: Array[Float],
      embCol: String,
      k: Int = 10,
      nProbe: Int = 4
  ): DataFrame =
    scoreCells(
      model.assignments,
      rankCells(model.centroids, query).take(nProbe),
      query,
      embCol,
      k
    )

  /** Top-k by cosine over a MATERIALIZED index: reads only the nProbe
    * closest cells' files (directory-level partition pruning).
    */
  def probeStored(
      spark: SparkSession,
      index: StoredIndex,
      query: Array[Float],
      embCol: String,
      k: Int = 10,
      nProbe: Int = 4
  ): DataFrame =
    scoreCells(
      spark.read.parquet(index.path),
      rankCells(index.centroids, query).take(nProbe),
      query,
      embCol,
      k
    )

  private def scoreCells(
      assignments: DataFrame,
      cells: Seq[Int],
      query: Array[Float],
      embCol: String,
      k: Int
  ): DataFrame = {
    val qCol = array(query.toIndexedSeq.map(v => lit(v)): _*).cast("array<float>")
    assignments
      .filter(col("cell").isin(cells: _*)) // partition-pruned when stored
      .withColumn(
        "cos",
        round(graft.functions.Functions.cosineSim(col(embCol), qCol), 6)
      )
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }
}
