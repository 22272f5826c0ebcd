package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.{Column, SparkSession}

/** Narrow bridge into Spark's `private[sql]` Column/registry internals, so
  * graft can register native Catalyst expressions (codegen'd — no UDF
  * serialization overhead) and lift them into `Column`s. This is the
  * supported extension seam for libraries that ship custom expressions;
  * everything else in graft stays on the public API.
  */
object GraftSqlInternals {

  /** Lift a Catalyst Expression into a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst Expression backing a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The bare column name a Column denotes, if it denotes exactly one —
    * `col("jk")` → Some("jk"); any computed expression → None. Callers
    * (e.g. scan-filter derivation) use None as "cannot reason about this
    * expression, fall back to the unoptimized path".
    */
  def simpleColumnName(c: Column): Option[String] = c.node match {
    case a: org.apache.spark.sql.internal.UnresolvedAttribute
        if a.nameParts.length == 1 => Some(a.nameParts.head)
    case ExpressionColumnNode(
        a: org.apache.spark.sql.catalyst.expressions.AttributeReference, _) =>
      Some(a.name)
    case ExpressionColumnNode(
        a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute, _)
        if a.nameParts.length == 1 => Some(a.nameParts.head)
    case _ => None
  }

  /** Register a native expression builder under a SQL function name in the
    * session's temp-function registry (the analogue of the reference's
    * `SessionContext::register_udf`, crates/engine/src/lib.rs:136-144 —
    * but resolving to a codegen-capable Catalyst expression).
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression
  ): Unit =
    spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState
      .functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
