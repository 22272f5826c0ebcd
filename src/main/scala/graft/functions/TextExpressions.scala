package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Karp-Rabin rolling-hash document fingerprint (a winnowing-lite sketch).
  *
  * `rolling_fingerprint(text, window)`:
  *  - window <= 0: polynomial hash of the whole UTF-8 byte sequence —
  *    a cheap content fingerprint (base 257 mod 2^61-1).
  *  - window  > 0: minimum over all rolling window hashes — robust to
  *    content being shifted by insertions outside the matching region,
  *    which is what makes it useful for near-dup *candidate* keys.
  *
  * Native expression with doGenCode: the byte loop runs inside whole-stage
  * codegen, reading straight from the UTF8String, no per-row allocation.
  */
case class RollingFingerprint(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "rolling_fingerprint"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (string, int), got ${l.catalogString}, ${r.catalogString}"
        )
    }

  override def nullSafeEval(t: Any, w: Any): Any = {
    val bytes = t.asInstanceOf[UTF8String].getBytes
    RollingFingerprint.compute(bytes, w.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (t, w) =>
        s"${ev.value} = graft.functions.RollingFingerprint.compute($t.getBytes(), $w);"
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object RollingFingerprint {
  // Mersenne prime 2^61-1: fast modular reduction, no bias worth caring
  // about for fingerprinting; base 257 > any byte value.
  final val Mod: Long = (1L << 61) - 1
  final val Base: Long = 257L

  private def mulmod(a: Long, b: Long): Long = {
    // 128-bit multiply then Mersenne fold
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // (hi:lo) mod 2^61-1 == (lo & Mod) + (hi << 3 | lo >>> 61)  folded
    var r = (lo & Mod) + ((hi << 3) | (lo >>> 61))
    if (r >= Mod) r -= Mod
    r
  }

  /** Shared by interpreted eval and generated code. Named `compute`, NOT
    * `eval`: the case class inherits Expression.eval, which suppresses the
    * companion's static forwarder — generated Java then resolves
    * `RollingFingerprint.eval(byte[], int)` against the instance methods
    * and fails to compile, silently dropping the whole stage out of
    * codegen (the exact failure mode this expression exists to avoid).
    */
  def compute(bytes: Array[Byte], window: Int): Long = {
    val n = bytes.length
    if (window <= 0 || window >= n) {
      var h = 0L
      var i = 0
      while (i < n) { h = mulmod(h, Base) + (bytes(i) & 0xff); if (h >= Mod) h -= Mod; i += 1 }
      h
    } else {
      // precompute Base^(window-1) for the roll-out term
      var pow = 1L
      var k = 0
      while (k < window - 1) { pow = mulmod(pow, Base); k += 1 }
      var h = 0L
      var i = 0
      while (i < window) { h = mulmod(h, Base) + (bytes(i) & 0xff); if (h >= Mod) h -= Mod; i += 1 }
      var minH = h
      while (i < n) {
        val out = mulmod((bytes(i - window) & 0xff).toLong, pow)
        h = h - out
        if (h < 0) h += Mod
        h = mulmod(h, Base) + (bytes(i) & 0xff)
        if (h >= Mod) h -= Mod
        if (h < minH) minH = h
        i += 1
      }
      minH
    }
  }
}
