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

  test("daily-pipeline composition: iceberg incremental read -> stored-index dedup -> fold") {
    // The production shape the round-10 pieces exist for, as ONE flow:
    // the LAKE TABLE is the corpus (Iceberg, snapshot per ingest day),
    // the incremental read is the increment source, the stored MinHash
    // index is the dedup state, and accepted batches fold back in.
    import graft.operators.MinHashIndex
    import graft.sources.{IcebergSource, IcebergWriter}
    import spark.implicits._
    def sent(seed: Int): String =
      (0 until 30).map(i => s"p${seed}d$i").mkString(" ")
    val lake = tempDir("graft-pipeline-lake")

    // day 0: corpus lands as snapshot 1; index materialized FROM THE LAKE
    val day0 = Seq((1L, sent(1)), (2L, sent(2)), (3L, sent(3)))
      .toDF("doc_id", "text")
    val s1 = IcebergWriter.append(spark, lake, day0, None, 1000L)
    val idx = MinHashIndex.materialize(
      IcebergSource.read(spark, lake), tempDir("graft-pipeline-idx"))

    // day 1: a batch lands as snapshot 2 — one corpus dup, one intra-batch
    // dup pair, one unique
    val day1 = Seq(
      (101L, sent(2)), (102L, sent(9)), (103L, sent(9)), (104L, sent(11))
    ).toDF("doc_id", "text")
    IcebergWriter.append(spark, lake, day1, None, 2000L)

    // the pipeline: read ONLY what landed since day 0, dedup it against
    // the stored corpus index, fold it in
    val increment = IcebergSource.readAppendsSince(spark, lake, fromSnapshotId = s1)
    assert(increment.count() === 4, "incremental read must see only day 1")
    val pairs = graft.queries.DedupQueries
      .incrementalPairs(spark, increment, idx, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((2L, 101L), (102L, 103L)),
      s"corpus dup + intra-batch dup expected, got $pairs")
    assert(MinHashIndex.foldOnce(increment, idx, "day1"))

    // day 2 dedupes against BOTH days through the same two primitives
    val day2 = Seq((201L, sent(9)), (202L, sent(13))).toDF("doc_id", "text")
    val s2 = graft.sources.IcebergMeta.load(lake).currentSnapshotId.get
    IcebergWriter.append(spark, lake, day2, None, 3000L)
    val inc2 = IcebergSource.readAppendsSince(spark, lake, fromSnapshotId = s2)
    val pairs2 = graft.queries.DedupQueries
      .incrementalPairs(spark, inc2, idx, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs2 === Set((102L, 201L), (103L, 201L)),
      s"day-2 dup must match BOTH day-1 copies via the folded index: $pairs2")
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
