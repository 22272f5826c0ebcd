package graft

import org.apache.spark.sql.Row

/** The reference's UDF end-to-end test transliterated
  * (crates/engine/src/lib.rs:146-231): `capitalize` is full uppercase
  * (lib.rs:89), null-preserving (lib.rs:85-86), and the canonical query
  * sorts ASC NULLS FIRST (lib.rs:205) expecting
  * [NULL, "", "HELLO", "RUST", "WORLD"] (lib.rs:205-226).
  */
class UdfSpec extends SparkTestBase {

  test("capitalize: uppercase, null-preserving, NULLS FIRST ordering") {
    import spark.implicits._
    val df = Seq(Some("hello"), Some("WoRlD"), None, Some("rust"), Some(""))
      .toDF("text_col")
    session.registerTable("test_strings", df)

    val rows = session
      .execute(
        "SELECT capitalize(text_col) AS capitalized_text FROM test_strings " +
          "ORDER BY capitalized_text ASC NULLS FIRST"
      )
      .collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))

    assert(rows.toSeq === Seq(null, "", "HELLO", "RUST", "WORLD"))
  }

  test("weighted-avg aggregator survives volumes that overflow a Long accumulator") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 3M rows x (v*w scaled ~5.2e12 per row) = 1.56e19 micro-units: past
    // Long.MaxValue (9.2e18), where the pre-fix buffer wrapped negative.
    val n = 3000000L
    val v = 52000.5
    val w = 100.25
    val df = spark.range(n).select(lit(v).as("v"), lit(w).as("w"))
    val wavg = udaf(graft.functions.Aggregators.weightedAvg)
    val got = df.agg(wavg($"v", $"w").as("wa")).head().getDouble(0)
    // identical rows -> exact expected value mirrors the per-row micro math
    val perRowVW = BigDecimal(math.round(v * 1000000L)) *
      BigDecimal(math.round(w * 1000000L)) / 1000000L
    val expected =
      (perRowVW * n).toDouble / (BigDecimal(math.round(w * 1000000L)) * n).toDouble
    assert(got > 0.0, s"accumulator overflow produced $got")
    assert(math.abs(got - expected) / expected < 1e-12, s"got $got expected $expected")
  }

  test("weighted-avg floors negative products like the DuckDB `//` oracle") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // v*w in micro-units = -52000500000*100250000/1e6, NOT divisible by 1e6
    // after the product: floor (-52.0005*100.25 -> -5213050.125 -> floor of
    // the micro-scaled product) differs from truncation by exactly one
    // micro-unit per row — the pre-fix drift flagged in round-3 ADVICE.
    val df = Seq((-52000.5007, 100.25), (31.4159, 2.5)).toDF("v", "w")
    val wavg = udaf(graft.functions.Aggregators.weightedAvg)
    val got = df.agg(wavg($"v", $"w").as("wa")).head().getDouble(0)
    def microProdFloored(v: Double, w: Double): BigDecimal = {
      val p = (BigDecimal(math.round(v * 1e6)) * BigDecimal(math.round(w * 1e6)))
      BigDecimal(
        p.bigDecimal.divide(
          java.math.BigDecimal.valueOf(1000000L), 0,
          java.math.RoundingMode.FLOOR))
    }
    val sumVW = microProdFloored(-52000.5007, 100.25) + microProdFloored(31.4159, 2.5)
    val sumW = BigDecimal(math.round(100.25 * 1e6)) + BigDecimal(math.round(2.5 * 1e6))
    val expected = sumVW.toDouble / sumW.toDouble
    assert(got === expected, s"got $got expected $expected")
  }

  test("capitalize stays a native codegen expression (no UDF node)") {
    import spark.implicits._
    session.registerTable("cap_t", Seq("x").toDF("s"))
    val plan = session.execute("SELECT capitalize(s) FROM cap_t")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("upper"), s"expected native Upper in plan:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"UDF node leaked into plan:\n$plan")
  }
}
