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

  test("capitalize stays a native codegen expression (no UDF node)") {
    import spark.implicits._
    session.registerTable("cap_t", Seq("x").toDF("s"))
    val plan = session.execute("SELECT capitalize(s) FROM cap_t")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("upper"), s"expected native Upper in plan:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"UDF node leaked into plan:\n$plan")
  }
}
