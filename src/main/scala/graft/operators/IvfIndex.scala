package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) index for approximate nearest neighbor over an
  * embedding column — the second scale path next to the random-hyperplane
  * LSH in SimilarityQueries.
  *
  * Build: KMeans (fixed seed) partitions the corpus into nCells Voronoi
  * cells; every vector is stored with its cell id. At 100 TB the stored
  * table is WRITTEN PARTITIONED BY cell, so a probe is a partition-pruned
  * scan of nProbe/nCells of the data — the train step runs on a sample,
  * not the full corpus.
  *
  * Probe: rank cells by centroid distance to the query, scan the nProbe
  * closest, exact-score candidates (here with the codegen'd cosine).
  */
object IvfIndex {

  final case class Model(
      assignments: DataFrame, // original columns + `cell`
      centroids: Array[MlVector]
  )

  /** Fit the cell structure. `embCol` must be array<float>. */
  def build(
      df: DataFrame,
      embCol: String,
      nCells: Int = 16,
      seed: Long = 42L
  ): Model = {
    val withVec = df.withColumn("__vec", array_to_vector(col(embCol)))
    val km = new KMeans()
      .setK(nCells)
      .setSeed(seed)
      .setFeaturesCol("__vec")
      .setPredictionCol("cell")
    val model = km.fit(withVec)
    Model(model.transform(withVec).drop("__vec"), model.clusterCenters)
  }

  /** Cell ids ranked by (euclidean) distance of centroid to query. */
  def rankCells(model: Model, query: Array[Float]): Seq[Int] = {
    val q = query.map(_.toDouble)
    model.centroids.zipWithIndex
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

  /** Top-k by cosine within the nProbe closest cells. */
  def probe(
      model: Model,
      query: Array[Float],
      embCol: String,
      k: Int = 10,
      nProbe: Int = 4
  ): DataFrame = {
    val cells = rankCells(model, query).take(nProbe)
    val spark = model.assignments.sparkSession
    val qCol = array(query.toIndexedSeq.map(v => lit(v)): _*).cast("array<float>")
    model.assignments
      .filter(col("cell").isin(cells: _*)) // partition-pruned at scale
      .withColumn(
        "cos",
        round(graft.functions.Functions.cosineSim(col(embCol), qCol), 6)
      )
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }
}
