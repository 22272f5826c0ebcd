package graft

import org.apache.spark.sql.Row

/** The reference's flagship integration test, transliterated
  * (crates/engine/tests/integration_test.rs:14-76): write Parquet to a
  * tempdir, register it, run the canonical filter+sort query, assert exact
  * rows and ordering; plus its `SELECT 42` planner round-trip (:78-109).
  */
class IntegrationSpec extends SparkTestBase {

  test("parquet roundtrip: filter + project + sort returns exact rows") {
    import spark.implicits._
    val dir = tempDir("graft-it")
    Seq(
      (1, "Alice", 25),
      (2, "Bob", 30),
      (3, "Charlie", 35),
      (4, "Diana", 28),
      (5, "Eve", 32)
    ).toDF("id", "name", "age").write.mode("overwrite").parquet(s"$dir/t")

    session.registerTable("test_table", spark.read.parquet(s"$dir/t"))
    val rows = session
      .execute("SELECT name, age FROM test_table WHERE age > 30 ORDER BY age")
      .collect()

    // integration_test.rs:69-75: exactly Eve(32) then Charlie(35)
    assert(rows.toSeq === Seq(Row("Eve", 32), Row("Charlie", 35)))
  }

  test("constant SELECT without FROM (reference main.rs:43, it:78-109)") {
    val rows = session.execute("SELECT 42 AS answer, 'Hello Igloo' AS greeting").collect()
    assert(rows.toSeq === Seq(Row(42, "Hello Igloo")))
  }

  test("empty table with declared schema (reference coordinator/tests/catalog.rs:9)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a", IntegerType, nullable = false)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      schema
    )
    session.registerTable("empty_t", empty)
    assert(session.execute("SELECT * FROM empty_t").count() === 0)
    assert(session.table("empty_t").schema === schema)
  }
}
