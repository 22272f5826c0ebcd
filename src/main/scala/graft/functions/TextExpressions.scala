package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** One-pass k-way MinHash signature of a pre-hashed shingle array.
  *
  * `minhash_signature(hashes)` = array of k longs where
  * `out[j] = min over h in hashes of xxhash64-mix(j, h)` — BIT-IDENTICAL
  * to Spark's `array_min(transform(hashes, h -> xxhash64(lit(j), h)))`
  * family (the seed chain is `hashLong(h, hashInt(j, 42))`, exactly what
  * the XxHash64 expression computes for an (int, long) argument pair), so
  * it is interchangeable with the composed form everywhere, including
  * against fixtures pinned on those values.
  *
  * Why native: the composed form builds k=64 temporary arrays PER ROW
  * (one per transform) and walks the input k times. ScaleProbe measured
  * the GC pressure of that shape super-linear at 10x docs. This
  * expression walks the input once, keeps 64 running minima in a local
  * long[], allocates only the output array, and runs inside whole-stage
  * codegen.
  *
  * Null/empty semantics: null input -> null; empty array -> null (the
  * composed array_min form yields all-null mins there — callers treat
  * both as "no signature").
  */
case class MinHashSignature(child: Expression, k: Int = 64)
    extends UnaryExpression {

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint> and k > 0, got " +
          s"${child.dataType.catalogString} (k=$k)"
      )
  }

  // resolved once per expression instance, not per row — the interpreted
  // path would otherwise pay a ConcurrentHashMap lookup per evaluation
  @transient private lazy val mySeeds: Array[Long] = MinHashSignature.seeds(k)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = MinHashSignature.compute(arr, mySeeds)
    if (mins == null) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("mhSeeds", MinHashSignature.seeds(k), "long[]")
    val mins = ctx.freshName("mins")
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
        |long[] $mins = graft.functions.MinHashSignature.compute($a, $seedsRef);
        |if ($mins == null) {
        |  ${ev.isNull} = true;
        |} else {
        |  ${ev.value} =
        |    new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
        |}
      """.stripMargin
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  /** Per-family seeds: seed_j = XXH64(int j, seed 42) — the first link of
    * Spark's `xxhash64(lit(j), h)` chain, precomputed once per k.
    */
  def seeds(k: Int): Array[Long] =
    seedCache.computeIfAbsent(
      k,
      kk => Array.tabulate(kk)(j => XXH64.hashInt(j, 42L))
    )

  /** Element-major one-pass minima; null for empty input (see scaladoc).
    * A null ELEMENT contributes seeds(j) itself — exactly what the
    * composed `xxhash64(lit(j), h)` yields for a null `h` (hash
    * expressions skip null children, leaving the running hash at the
    * j-mix) — so the bit-equality contract holds even on
    * containsNull=true inputs with actual nulls.
    */
  def compute(arr: ArrayData, seeds: Array[Long]): Array[Long] = {
    val n = arr.numElements()
    if (n == 0) return null
    val k = seeds.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var j = 0
        while (j < k) {
          if (seeds(j) < mins(j)) mins(j) = seeds(j)
          j += 1
        }
      } else {
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val m = XXH64.hashLong(h, seeds(j))
          if (m < mins(j)) mins(j) = m
          j += 1
        }
      }
      i += 1
    }
    mins
  }
}

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

/** Per-row MAXIMUM TOKEN FREQUENCY of a string array — the repetition
  * signal the Gopher filter thresholds (`max_tf * 8 > n_tokens`).
  *
  * Why native: the composed form
  * `array_max(transform(array_distinct(ws), t -> size(filter(ws, x -> x = t))))`
  * is O(v·n) with three temporary arrays per row, and Spark evaluates
  * higher-order-function lambdas INTERPRETED — per element, per row —
  * even inside a codegen stage. This expression makes one O(n) pass with
  * a single hash map and runs as a straight call from whole-stage
  * codegen. Used by the streaming quality screen, where the per-row
  * formulation is what keeps the operator stateless.
  *
  * Semantics: null input -> null; null ELEMENTS are skipped (split()
  * never produces them; skipping beats crashing on foreign data); empty
  * array -> 0.
  */
case class MaxTokenFreq(child: Expression) extends UnaryExpression {

  override def prettyName: String = "max_token_freq"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    MaxTokenFreq.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = graft.functions.MaxTokenFreq.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaxTokenFreq {
  /** One pass, one map. UTF8String keys are safe WITHIN a row evaluation
    * (the backing buffer is stable for the duration of the call; nothing
    * escapes this method).
    */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val m = new java.util.HashMap[UTF8String, Integer](Math.min(n * 2, 1024))
    var max = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val c = m.merge(s, Integer.valueOf(1), (x, y) => Integer.valueOf(x + y))
        if (c > max) max = c.toLong
      }
      i += 1
    }
    max
  }
}

/** Distinct word n-gram shingles of a token array, one pass.
  *
  * For `size(ws) >= n`, exactly
  * `array_distinct(transform(sequence(0, size(ws)-n), i -> concat_ws(" ", ws[i+1..i+n])))`
  * — same strings, same first-occurrence order. (Below n tokens the
  * composed form is NOT a reference: its descending `sequence` drives
  * `element_at` to indices <= 0 and throws; this expression returns the
  * sane empty array, and every production caller filters
  * `size(ws) >= n` first.) The composed form
  * evaluates its lambda INTERPRETED per window per row and allocates a
  * full pre-distinct array; this walks the tokens once with a linked
  * hash set and runs as a straight call from whole-stage codegen.
  * Shingling is the entry pass of the entire dedup/decontamination
  * family, so this is the hottest lambda in the engine.
  *
  * Semantics: null input -> null; fewer than n tokens -> empty array;
  * null TOKENS are skipped inside a shingle (concat_ws semantics).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> and n > 0, got " +
          s"${other.catalogString} (n=$n)")
  }

  override def nullSafeEval(v: Any): Any =
    WordShingles.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = graft.functions.WordShingles.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[AnyRef])
    // LinkedHashSet: dedupe while keeping first-occurrence order, the
    // exact contract of array_distinct over the transform's output
    val seen = new java.util.LinkedHashSet[UTF8String]((sz - n + 1) * 2)
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i <= sz - n) {
      var k = 0
      while (k < n) {
        toks(k) = if (arr.isNullAt(i + k)) null else arr.getUTF8String(i + k)
        k += 1
      }
      seen.add(UTF8String.concatWs(Space, toks: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }
}

/** Elementwise xxhash64 of a string array — bit-identical to
  * `transform(arr, x -> xxhash64(x))` (seed 42, the XxHash64
  * expression's exact byte hash), but one native pass instead of an
  * interpreted lambda per element. With [[WordShingles]] and
  * [[MinHashSignature]] this makes the whole
  * tokens -> shingles -> hashes -> signature chain lambda-free.
  *
  * Null elements hash to the seed (42), exactly what xxhash64(null)
  * yields inside the composed transform.
  */
case class ArrayXxHash64(child: Expression) extends UnaryExpression {

  override def prettyName: String = "array_xxhash64"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayXxHash64.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = graft.functions.ArrayXxHash64.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayXxHash64 {
  private val Seed = 42L

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) Seed
        else XXH64.hashUTF8String(arr.getUTF8String(i), Seed)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Count of array elements contained in a small STATIC string set —
  * bit-equal to `size(filter(ws, w -> array_contains(array(set...), w)))`
  * (occurrences, not distinct membership), one native pass against a
  * prebuilt hash set instead of an interpreted lambda scanning a literal
  * array per token per row. Drives the stopword-ratio and language-ID
  * profiles over every token of the corpus.
  *
  * Null input -> null; null elements never match (array_contains
  * semantics against a non-null literal set).
  */
case class CountTokensIn(child: Expression, tokens: Seq[String])
    extends UnaryExpression {

  override def prettyName: String = "count_tokens_in"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if tokens.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> and a non-empty set, got " +
          s"${other.catalogString} (set size=${tokens.size})")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] =
    CountTokensIn.buildSet(tokens.toArray)

  override def nullSafeEval(v: Any): Any =
    CountTokensIn.compute(v.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reuse the instance's set: one construction site for both paths
    val setRef = ctx.addReferenceObj("tokenSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = graft.functions.CountTokensIn.compute($a, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CountTokensIn {
  def buildSet(tokens: Array[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](tokens.length * 2)
    tokens.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  def compute(arr: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}
