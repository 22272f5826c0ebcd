package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** plans.UnscaledDecimalSums — wide-decimal SUMs rewritten to
  * overflow-PROVEN unscaled-long sums. Contract under test: the rewrite
  * fires only when parquet footer min/max x row count proves the long
  * sum safe; fired plans are BIT-IDENTICAL to the kill-switched decimal
  * plans (values, schema, nulls, DISTINCT, FILTER); unprovable or
  * structurally unsafe shapes (huge values, joins, scale-changing ops)
  * decline and keep the stock decimal plan.
  */
class UnscaledDecimalSumsSpec extends SparkTestBase {

  // prices in cents-money range with nulls + negatives; `huge` makes any
  // sum bound fail (1e17 * 10^2 * rows >> Long.MaxValue)
  private lazy val path: String = {
    val dir = s"${tempDir("graft-udsums")}/t"
    spark.range(0, 10000)
      .select(
        (col("id") % 13).as("k"),
        when(col("id") % 97 === 0, lit(null))
          .otherwise((col("id") % 9999) * 10.07 - 5000.0).as("price"),
        ((col("id") % 10) / 100.0 + 0.001).as("disc"),
        (col("id") * 1.0e17).as("huge")
      )
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def newSession(rewrite: Boolean): SparkSession = {
    val s = spark.newSession()
    if (!rewrite) s.conf.set("spark.graft.optimizer.unscaledDecimalSum", "false")
    s
  }

  private def unscaledSums(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString()
      .sliding("UnscaledValue".length).count(_ == "UnscaledValue")

  /** Run the same builder with the rule on and off; assert the ON plan
    * fired (contains UnscaledValue under a sum) and both results match
    * exactly, schema included.
    */
  private def assertExactAndFired(build: SparkSession => DataFrame): Unit = {
    val on = build(newSession(rewrite = true))
    val off = build(newSession(rewrite = false))
    assert(unscaledSums(on) > 0, s"rewrite did not fire:\n${on.queryExecution}")
    assert(unscaledSums(off) == 0, "kill switch did not disable the rewrite")
    assert(on.schema == off.schema, "rewrite changed the result schema")
    assert(on.collect().toSeq == off.collect().toSeq,
      "rewritten results differ from the exact decimal plan")
  }

  test("grouped wide-decimal sums (money shape) fire and match bit-for-bit") {
    assertExactAndFired { s =>
      val t = s.read.parquet(path)
      t.groupBy(col("k"))
        .agg(
          sum(col("price").cast(DecimalType(14, 2))).as("s1"),
          sum(col("price").cast(DecimalType(14, 2)) *
            col("disc").cast(DecimalType(4, 2))).as("s2"),
          sum(col("price").cast(DecimalType(14, 2)) *
            (lit(1).cast(DecimalType(4, 2)) - col("disc").cast(DecimalType(4, 2))) *
            (lit(1).cast(DecimalType(4, 2)) + col("disc").cast(DecimalType(4, 2))))
            .as("s3"),
          count(lit(1)).as("n")
        )
        .orderBy(col("k"))
    }
  }

  test("DISTINCT and FILTER clauses ride the rewrite exactly") {
    assertExactAndFired { s =>
      val t = s.read.parquet(path)
      t.groupBy(col("k"))
        .agg(
          sum_distinct(col("price").cast(DecimalType(14, 2))).as("sd"),
          expr("sum(CAST(price AS DECIMAL(14,2))) FILTER (WHERE disc > 0.05)")
            .as("sf")
        )
        .orderBy(col("k"))
    }
  }

  test("global (ungrouped) sum over a filtered scan fires and matches") {
    assertExactAndFired { s =>
      val t = s.read.parquet(path)
      t.filter(col("disc") < 0.08)
        .agg(sum(col("price").cast(DecimalType(14, 2))).as("rev"),
          count(lit(1)).as("n"))
    }
  }

  test("unprovable bound declines: huge values keep the decimal plan") {
    val s = newSession(rewrite = true)
    val t = s.read.parquet(path)
    val df = t.groupBy(col("k"))
      .agg(sum(col("huge").cast(DecimalType(28, 2))).as("s"))
    assert(unscaledSums(df) == 0,
      s"rewrite fired on an unprovable bound:\n${df.queryExecution}")
    // and still computes (the decline is a no-op, not a failure)
    assert(df.count() == 13)
  }

  test("join child declines: row multiplication breaks the row-count proof") {
    val s = newSession(rewrite = true)
    val t = s.read.parquet(path)
    val dim = s.range(0, 13).select(col("id").as("k"), lit(2).as("m"))
    val df = t.join(dim, "k")
      .agg(sum(col("price").cast(DecimalType(14, 2))).as("s"))
    assert(unscaledSums(df) == 0,
      s"rewrite fired above a join:\n${df.queryExecution}")
  }

  // ------------------------------------------------------------------
  // r21: unique-key inner equi-joins carry the proof through
  // ------------------------------------------------------------------

  /** A parquet dim with unique key `k` (0..12) and a non-unique variant
    * `dupdim` where every key appears twice.
    */
  private lazy val dimPath: String = {
    val dir = s"${tempDir("graft-udsums")}/dim"
    spark.range(0, 13)
      .select(col("id").as("k"), concat(lit("g"), col("id") % 3).as("grp"),
        (col("id") * 11.5).as("price"))
      .write.mode("overwrite").parquet(dir)
    dir
  }
  private lazy val dupDimPath: String = {
    val dir = s"${tempDir("graft-udsums")}/dupdim"
    spark.range(0, 26)
      .select((col("id") % 13).as("k"), concat(lit("g"), col("id") % 3).as("grp"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("unique-key inner equi-join: proof carries through, bit-identical") {
    graft.plans.KeyUniqueness.ensure(spark, dimPath, Seq("k"))
    assertExactAndFired { s =>
      val t = s.read.parquet(path)
      val dim = s.read.parquet(dimPath).select(col("k"), col("grp"))
      t.join(dim, "k")
        .groupBy(col("grp"))
        .agg(
          sum(col("price").cast(DecimalType(14, 2))).as("s1"),
          sum(col("price").cast(DecimalType(14, 2)) *
            (lit(1).cast(DecimalType(4, 2)) -
              col("disc").cast(DecimalType(4, 2)))).as("s2"),
          count(lit(1)).as("n"))
        .orderBy(col("grp"))
    }
  }

  test("two-level star with a filtered dim still proves and matches") {
    graft.plans.KeyUniqueness.ensure(spark, dimPath, Seq("k"))
    assertExactAndFired { s =>
      val t = s.read.parquet(path)
      val dim = s.read.parquet(dimPath)
        .filter(col("grp") =!= "g9").select(col("k"), col("grp"))
      val dim2 = s.read.parquet(dimPath)
        .select(col("k").as("k2"), col("grp").as("grp2"))
      t.join(dim, "k")
        .join(dim2, col("k") === col("k2"))
        .groupBy(col("grp2"))
        .agg(sum(col("price").cast(DecimalType(14, 2))).as("s1"))
        .orderBy(col("grp2"))
    }
  }

  test("duplicate-key dim declines: the exact harvest rejects it") {
    graft.plans.KeyUniqueness.ensure(spark, dupDimPath, Seq("k"))
    val s = newSession(rewrite = true)
    val t = s.read.parquet(path)
    val dim = s.read.parquet(dupDimPath)
    val df = t.join(dim, "k")
      .agg(sum(col("price").cast(DecimalType(14, 2))).as("s"))
    assert(unscaledSums(df) == 0,
      s"rewrite fired above a non-unique-key join:\n${df.queryExecution}")
  }

  test("dim-side summed column declines even when it shadows a fact name") {
    // dim carries its own `price`; the bound of a DIM column cannot come
    // from the FACT footer — attribute identity, not name, must gate it
    graft.plans.KeyUniqueness.ensure(spark, dimPath, Seq("k"))
    val s = newSession(rewrite = true)
    val t = s.read.parquet(path).select(col("k"), col("disc"))
    val dim = s.read.parquet(dimPath)
    val df = t.join(dim, "k")
      .agg(sum(col("price").cast(DecimalType(14, 2))).as("s"))
    assert(unscaledSums(df) == 0,
      s"rewrite fired on a dim-side column's sum:\n${df.queryExecution}")
  }

  test("stale uniqueness fact declines: a rewritten dim changes the fingerprint") {
    val dir = s"${tempDir("graft-udsums")}/staledim"
    spark.range(0, 13).select(col("id").as("k"), lit("x").as("grp"))
      .write.mode("overwrite").parquet(dir)
    graft.plans.KeyUniqueness.ensure(spark, dir, Seq("k"))
    // overwrite with DUPLICATE keys after the harvest; ensure is not
    // re-run, so only the fingerprint check protects exactness
    spark.range(0, 26).select((col("id") % 13).as("k"), lit("y").as("grp"))
      .write.mode("overwrite").parquet(dir)
    val s = newSession(rewrite = true)
    val t = s.read.parquet(path)
    val dim = s.read.parquet(dir)
    val df = t.join(dim, "k")
      .agg(sum(col("price").cast(DecimalType(14, 2))).as("s"))
    assert(unscaledSums(df) == 0,
      s"rewrite trusted a stale uniqueness fact:\n${df.queryExecution}")
  }

  test("scale-changing expressions decline (decimal division)") {
    val s = newSession(rewrite = true)
    val t = s.read.parquet(path)
    val df = t.agg(
      sum(col("price").cast(DecimalType(14, 2)) /
        lit(3).cast(DecimalType(4, 0))).as("s"))
    assert(unscaledSums(df) == 0,
      s"rewrite fired through a division:\n${df.queryExecution}")
  }

  test("all-null groups and empty input stay null/empty like the stock plan") {
    val s = newSession(rewrite = true)
    val t = s.read.parquet(path)
    // null-only price slice: sum must be NULL, not 0
    val nulls = t.filter(col("price").isNull)
      .agg(sum(col("price").cast(DecimalType(14, 2))).as("s"))
    assert(nulls.collect().head.isNullAt(0))
    val empty = t.filter(col("disc") < -1)
      .agg(sum(col("price").cast(DecimalType(14, 2))).as("s"))
    assert(empty.collect().toSeq == Seq(Row(null)))
  }
}
