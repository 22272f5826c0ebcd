package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BpeEncode, BpeTable}

/** Merge-loop byte-pair encoding: the real thing training pipelines
  * budget tokens with, replacing the regex pre-tokenizer approximation
  * (`q_text_tokens_bpe`) for anything that needs the actual merges
  * table. Reference capability: the token-accounting surface of
  * crates/quality (token counts drive its thresholds); the algorithm is
  * Sennrich et al. 2016 (arXiv:1508.07909) — fit on a word-frequency
  * dictionary, encode by applying merges in rank order.
  *
  * Scale split, the tokenizer-training production shape:
  *  - FIT is one distributed word-count shuffle capped to the top
  *    `vocabCap` words (count desc, word asc — deterministic), then a
  *    driver loop over that bounded dictionary. Tokenizers are never
  *    fit on the full 100 TB — the capped dictionary IS the algorithm's
  *    input (subword-nmt trains on word->freq, not raw text), and the
  *    collect is bounded by the cap, not the corpus.
  *  - ENCODE is a native codegen expression ([[BpeEncode]]) with the
  *    table serialized into the plan (nMerges short strings) and a
  *    per-executor word cache — per-row cost amortizes to a hash lookup
  *    on natural text.
  */
object BpeTokenizer {

  /** Fit `nMerges` merge rules on the corpus' word-frequency dictionary.
    * Deterministic: vocab selection orders (freq desc, word asc); each
    * round's winning pair orders (count desc, left asc, right asc).
    * Stops early when no adjacent pair repeats (count < 2) — merging
    * singletons would memorize the tail, not compress it.
    */
  def fitMerges(
      words: DataFrame,
      wordCol: String,
      nMerges: Int = 40,
      vocabCap: Int = 4096): BpeTable = {
    val dict = words
      .groupBy(col(wordCol).as("w"))
      .agg(count(lit(1)).as("f"))
      .orderBy(desc("f"), asc("w"))
      .limit(vocabCap)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .filter(_._1.nonEmpty)

    val reps = dict.map { case (w, f) => (codepointSymbols(w), f) }
    val rules = Vector.newBuilder[(String, String)]
    var live = reps
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = new java.util.HashMap[(String, String), java.lang.Long]()
      val add: java.util.function.BiFunction[java.lang.Long, java.lang.Long, java.lang.Long] =
        (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue())
      live.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          counts.merge((syms(i), syms(i + 1)), java.lang.Long.valueOf(f), add)
          i += 1
        }
      }
      import scala.jdk.CollectionConverters._
      val best = counts.asScala.iterator
        .map { case (k, v) => (k, v.longValue()) }
        .filter(_._2 >= 2).toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }
        .headOption
      best match {
        case None => done = true
        case Some((pair, _)) =>
          rules += pair
          live = live.map { case (syms, f) => (mergePass(syms, pair._1, pair._2), f) }
            .filter(_._1.length > 1)
          round += 1
      }
    }
    new BpeTable(rules.result().toArray)
  }

  /** Codepoint split (not UTF-16 charAt — surrogate pairs stay whole),
    * matching the encoder's symbol alphabet exactly.
    */
  private def codepointSymbols(w: String): Array[String] = {
    val out = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var ci = 0
    while (ci < w.length) {
      val len = Character.charCount(w.codePointAt(ci))
      out(i) = w.substring(ci, ci + len)
      ci += len
      i += 1
    }
    out
  }

  /** One greedy leftmost pass of rule (l, r) — the encoder's exact pass
    * (see [[BpeTable]]: one pass per rule is the fixpoint).
    */
  private def mergePass(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new Array[String](syms.length)
    var read = 0
    var write = 0
    while (read < syms.length) {
      if (read + 1 < syms.length && syms(read) == l && syms(read + 1) == r) {
        out(write) = l + r
        read += 2
      } else {
        out(write) = syms(read)
        read += 1
      }
      write += 1
    }
    java.util.Arrays.copyOf(out, write)
  }

  /** `bpe_encode(words, table)` as a Column. */
  def encode(words: Column, table: BpeTable): Column =
    org.apache.spark.sql.classic.GraftSqlInternals.column(
      BpeEncode(
        org.apache.spark.sql.classic.GraftSqlInternals.expression(words),
        table))
}
