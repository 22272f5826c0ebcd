package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** A fitted byte-pair-encoding merge table plus its word-encode cache.
  *
  * Encode semantics (the contract the DuckDB oracle mirrors exactly):
  * a word starts as its character symbols; each merge rule is applied
  * IN RANK ORDER to fixpoint, merging occurrences leftmost-first, before
  * the next rule is considered — the subword-nmt in-order encode. One
  * greedy left-to-right pass per rule reaches the fixpoint: merging
  * (l, r) produces the strictly longer symbol `l+r`, which can never
  * equal `l` or `r`, so a rule cannot create new occurrences of itself.
  *
  * The table rides into executors inside the expression (it is
  * `nMerges` short strings — broadcast-by-serialization is exactly
  * right at any scale). The per-word cache makes the encode cost
  * proportional to the VOCABULARY, not the corpus: natural text repeats
  * words millions of times at 100 TB, and the cache is capped so an
  * adversarial unique-word stream degrades to uncached encoding, never
  * to unbounded executor memory.
  */
final class BpeTable(val rules: Array[(String, String)]) extends Serializable {

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()
  private val CacheCap = 1 << 16

  def encodeWord(w: String): Array[UTF8String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    val enc = encodeUncached(w)
    if (cache.size < CacheCap) cache.put(w, enc)
    enc
  }

  private def encodeUncached(w: String): Array[UTF8String] = {
    if (w.isEmpty) return Array.empty
    // split by CODEPOINT, not UTF-16 unit: charAt would cleave a
    // supplementary character (emoji) into two lone surrogates that
    // UTF8String renders as '?' — corrupt tokens, and a divergence from
    // the DuckDB oracle's regexp '(.)' codepoint split
    val syms = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var ci = 0
    while (ci < w.length) {
      val cp = w.codePointAt(ci)
      val len = Character.charCount(cp)
      syms(i) = w.substring(ci, ci + len)
      ci += len
      i += 1
    }
    var n = syms.length
    var ri = 0
    while (ri < rules.length && n > 1) {
      val (l, r) = rules(ri)
      // one greedy leftmost pass: write index chases read index
      var read = 0
      var write = 0
      while (read < n) {
        if (read + 1 < n && syms(read) == l && syms(read + 1) == r) {
          syms(write) = l + r
          read += 2
        } else {
          syms(write) = syms(read)
          read += 1
        }
        write += 1
      }
      n = write
      ri += 1
    }
    val out = new Array[UTF8String](n)
    var j = 0
    while (j < n) { out(j) = UTF8String.fromString(syms(j)); j += 1 }
    out
  }
}

/** `bpe_encode(words)` — BPE-tokenize an array of words under a fitted
  * [[BpeTable]], returning the concatenated token array. Composes with
  * `TextOps.tokens` (whose split semantics are already oracle-pinned),
  * so the expression owns only the merge algebra.
  */
case class BpeEncode(child: Expression, table: BpeTable)
    extends UnaryExpression {

  override def prettyName: String = "bpe_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    BpeEncode.compute(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef =
      ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      |${ev.value} = graft.functions.BpeEncode.compute($a, $tableRef);
    """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {

  /** Static forwarder shared by eval and codegen (named `compute`, never
    * `eval` — see RollingFingerprint). Null WORDS inside the array are
    * skipped (contribute no tokens), mirroring how a null never survives
    * the split that produces the input.
    */
  def compute(words: ArrayData, table: BpeTable): GenericArrayData = {
    val nw = words.numElements()
    var total = 0
    val parts = new Array[Array[UTF8String]](nw)
    var i = 0
    while (i < nw) {
      if (!words.isNullAt(i)) {
        val enc = table.encodeWord(words.getUTF8String(i).toString)
        parts(i) = enc
        total += enc.length
      }
      i += 1
    }
    val out = new Array[Any](total)
    var o = 0
    i = 0
    while (i < nw) {
      val p = parts(i)
      if (p != null) {
        var j = 0
        while (j < p.length) { out(o) = p(j); o += 1; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
