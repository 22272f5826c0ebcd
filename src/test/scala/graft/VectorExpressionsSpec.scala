package graft

import org.apache.spark.sql.functions._
import graft.functions.Functions

class VectorExpressionsSpec extends SparkTestBase {

  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(1.0f, 2.0f, 2.0f), Array(2.0f, 4.0f, 4.0f)),
      (4L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))
    ).toDF("id", "a", "b")
  }

  test("cosine_sim: identical=1, orthogonal=0, parallel=1, zero-norm=0") {
    val rows = vecs
      .select(col("id"), Functions.cosineSim(col("a"), col("b")).as("c"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(math.abs(rows(1L) - 1.0) < 1e-12)
    assert(rows(2L) === 0.0)
    assert(math.abs(rows(3L) - 1.0) < 1e-12)
    assert(rows(4L) === 0.0) // zero-norm contract
  }

  test("dot_product known value") {
    val r = vecs
      .filter(col("id") === 3L)
      .select(Functions.dotProduct(col("a"), col("b")))
      .head()
      .getDouble(0)
    assert(r === (1 * 2 + 2 * 4 + 2 * 4).toDouble)
  }

  test("null propagation") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(Functions.cosineSim($"a", $"b")).head()
    assert(r.isNullAt(0))
  }

  test("two calls in one projection codegen-compile (freshName regression)") {
    // Before the ctx.freshName fix, two calls declared duplicate Janino
    // locals and silently fell back to interpreted eval; with
    // CODEGEN_FALLBACK disabled a collision would throw instead.
    withCodegenStrict {
      val r = vecs
        .filter(col("id") === 1L)
        .select(
          Functions.cosineSim(col("a"), col("b")).as("c1"),
          Functions.cosineSim(col("b"), col("a")).as("c2"),
          Functions.dotProduct(col("a"), col("b")).as("d1"),
          Functions.dotProduct(col("b"), col("a")).as("d2")
        )
        .head()
      assert(r.getDouble(0) === r.getDouble(1))
      assert(r.getDouble(2) === r.getDouble(3))
    }
  }

  test("SQL-registered names work end-to-end") {
    session.registerTable("vec_t", vecs)
    val r = session
      .execute("SELECT cosine_sim(a, b) c, dot_product(a, b) d FROM vec_t WHERE id = 1")
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) === 1.0)
  }

  private def withCodegenStrict[A](body: => A): A = {
    val key = "spark.sql.codegen.fallback"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
