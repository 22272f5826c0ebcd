package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions over `array<float>` embedding columns.
  *
  * These power the similarity-search operators (SURVEY.md §2.C). A Scala
  * UDF here would box every element per row; a native expression with
  * `doGenCode` keeps the dot-product loop inside whole-stage codegen and
  * reads floats directly out of the columnar `ArrayData` — the difference
  * between ~GB/s and ~100MB/s per core on a 100 TB brute-force scan.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<float> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}"
      )
  }
}

/** cosine_sim(a, b) = dot(a,b) / (|a| * |b|); 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  // Variable names come from ctx.freshName so two cosine_sim calls in one
  // projection never collide inside the same generated method (a collision
  // would fail Janino compilation and silently fall back to interpreted
  // eval, defeating the whole point of this expression).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val i = ctx.freshName("i")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        val denom = ctx.freshName("denom")
        s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $xv = (double) $a.getFloat($i);
        |  double $yv = (double) $b.getFloat($i);
        |  $dot += $xv * $yv;
        |  $nx += $xv * $xv;
        |  $ny += $yv * $yv;
        |}
        |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
        |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
      """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

/** lsh_rewrite_hint(pred) — identity wrapper marking ONE predicate as a
  * candidate for [[graft.plans.LshJoinRewrite]]. Semantically transparent
  * (evaluates to its child; codegen passthrough), but `foldable = false`
  * keeps ConstantFolding from erasing it before the optimizer rule runs,
  * and because it wraps a predicate referencing BOTH join sides it rides
  * predicate pushdown into the join condition instead of detaching to one
  * child. This is what scopes the probabilistic rewrite to exactly the
  * joins that asked for it — a session-wide conf would silently alter
  * every cosine-threshold join in the session (round-3 ADVICE, medium).
  */
case class LshRewriteHint(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "lsh_rewrite_hint"
  override def dataType: DataType = child.dataType
  override def foldable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a boolean predicate, got " +
          child.dataType.catalogString
      )

  override def nullSafeEval(v: Any): Any = v

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** dot_product(a, b) — plain inner product, same codegen shape. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val i = ctx.freshName("i")
        s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        |}
        |${ev.value} = $dot;
      """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}
