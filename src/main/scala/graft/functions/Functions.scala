package graft.functions

import org.apache.spark.sql.catalyst.expressions.Upper
import org.apache.spark.sql.classic.GraftSqlInternals
import org.apache.spark.sql.{Column, SparkSession}

/** graft's SQL function surface.
  *
  * The reference engine registers exactly one UDF, `capitalize`, whose
  * kernel is full uppercasing despite the name (reference:
  * crates/engine/src/lib.rs:64-144, kernel at :89 `to_uppercase`,
  * registration at :136-144). We register the same name with the same
  * semantics, but resolve it to Spark's *native* `Upper` expression so it
  * stays inside whole-stage codegen — a Scala UDF would break the codegen
  * pipeline for zero benefit.
  *
  * On top of the reference surface we add the vector expressions used by
  * the similarity/dedup extension operators (SURVEY.md §2.C).
  */
object Functions {

  /** Idempotently register graft's functions on a session. */
  def register(spark: SparkSession): Unit = {
    GraftSqlInternals.registerFunction(spark, "capitalize", es => Upper(es.head))
    GraftSqlInternals.registerFunction(
      spark,
      "cosine_sim",
      es => CosineSimilarity(es(0), es(1))
    )
    GraftSqlInternals.registerFunction(
      spark,
      "dot_product",
      es => DotProduct(es(0), es(1))
    )
    GraftSqlInternals.registerFunction(
      spark,
      "rolling_fingerprint",
      es => RollingFingerprint(es(0), es(1))
    )
    GraftSqlInternals.registerFunction(
      spark,
      "lsh_rewrite_hint",
      es => LshRewriteHint(es.head)
    )
    GraftSqlInternals.registerFunction(
      spark,
      "max_token_freq",
      es => MaxTokenFreq(es.head)
    )
  }

  /** Column API: `capitalize(c)` — reference semantics = UPPER(c),
    * null-preserving (reference crates/engine/src/lib.rs:85-89).
    */
  def capitalize(c: Column): Column =
    GraftSqlInternals.column(Upper(GraftSqlInternals.expression(c)))

  /** Column API: cosine similarity of two `array<float>` columns. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlInternals.column(
      CosineSimilarity(GraftSqlInternals.expression(a), GraftSqlInternals.expression(b))
    )

  /** Column API: dot product of two `array<float>` columns. */
  def dotProduct(a: Column, b: Column): Column =
    GraftSqlInternals.column(
      DotProduct(GraftSqlInternals.expression(a), GraftSqlInternals.expression(b))
    )

  /** Column API: Karp-Rabin rolling fingerprint (window<=0 = whole text). */
  def rollingFingerprint(text: Column, window: Column): Column =
    GraftSqlInternals.column(
      RollingFingerprint(
        GraftSqlInternals.expression(text),
        GraftSqlInternals.expression(window)
      )
    )

  /** Column API: per-row max token frequency of an `array<string>` —
    * one O(n) hash-map pass vs the O(v*n) interpreted-lambda composed
    * form (see [[MaxTokenFreq]]).
    */
  def maxTokenFreq(ws: Column): Column =
    GraftSqlInternals.column(MaxTokenFreq(GraftSqlInternals.expression(ws)))

  /** Column API: mark a boolean predicate as an opt-in for the banded-LSH
    * join rewrite (plans.LshJoinRewrite). Identity everywhere the rule
    * does not fire — see the rule's scaladoc for the recall contract.
    */
  def lshRewriteHint(pred: Column): Column =
    GraftSqlInternals.column(LshRewriteHint(GraftSqlInternals.expression(pred)))
}
