package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.queries.QueryUtil

class MultimodalSpec extends SparkTestBase {

  test("binary media plumbing: schema, batch decode, deterministic features") {
    val docs = QueryUtil.t(spark, SparkTestBase.Sf0001, "documents")
    val media = Multimodal.fromDocuments(spark, docs)
    val feats = Multimodal.extractFeatures(media, batchSize = 16)

    val fdf = feats.toDF().cache()
    val n = docs.count()
    assert(fdf.count() === n)

    // features line up with ground truth computable in SQL: byte length ==
    // char length (ASCII fixture), digest == sha2(text), histogram sums to
    // byte count
    val joined = fdf
      .join(docs, fdf("id") === docs("doc_id"))
      .select(
        (col("nBytes") === length(col("text"))).as("len_ok"),
        (col("digest") === sha2(col("text"), 256)).as("digest_ok"),
        (aggregate(col("histogram"), lit(0L), (a, x) => a + x) === col("nBytes"))
          .as("hist_ok"),
        (col("brightness") > 0).as("bright_ok")
      )
    assert(joined.filter(!col("len_ok") || !col("digest_ok") || !col("hist_ok") || !col("bright_ok")).count() === 0)

    // determinism: running the decode twice yields identical output
    val again = Multimodal.extractFeatures(media, batchSize = 64).toDF()
    assert(fdf.select("id", "digest").except(again.select("id", "digest")).count() === 0)
    fdf.unpersist()
  }
}
