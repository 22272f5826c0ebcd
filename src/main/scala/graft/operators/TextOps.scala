package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level building blocks for the LLM-data-pipeline operators
  * (SURVEY.md §2.C): tokenization, shingling, MinHash signatures, SimHash,
  * and quality statistics. Everything here is built from codegen'd Spark
  * built-ins (split/transform/xxhash64/aggregate) — no Scala UDFs — so the
  * hot loops stay inside whole-stage codegen on a 100 TB scan.
  */
object TextOps {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Distinct word n-gram shingles ("a b c") of the token array. Shingles
    * capture local word ORDER, which is what separates true near-dups from
    * documents that merely share vocabulary. Native one-pass expression
    * since r12 ([[graft.functions.WordShingles]] — same strings, same
    * order as the composed HOF form it replaced, which interpreted its
    * lambda per window per row; TextExpressionsSpec pins the equality).
    */
  def shingles(ws: Column, n: Int = 3): Column =
    org.apache.spark.sql.classic.GraftSqlInternals.column(
      graft.functions.WordShingles(
        org.apache.spark.sql.classic.GraftSqlInternals.expression(ws), n))

  /** Elementwise xxhash64 of the shingle array — bit-identical to
    * `transform(sh, x -> xxhash64(x))`, one native pass
    * ([[graft.functions.ArrayXxHash64]]). The middle link of the
    * lambda-free tokens -> shingles -> hashes -> signature chain.
    */
  def shingleHashes(sh: Column): Column =
    org.apache.spark.sql.classic.GraftSqlInternals.column(
      graft.functions.ArrayXxHash64(
        org.apache.spark.sql.classic.GraftSqlInternals.expression(sh)))

  /** The pre-r12 composed formulation of [[shingles]] — kept as the
    * executable specification the native expression is pinned against.
    */
  private[graft] def shinglesComposed(ws: Column, n: Int = 3): Column =
    array_distinct(
      transform(
        sequence(lit(0), size(ws) - lit(n)),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k + 1))): _*)
      )
    )

  /** k MinHash values of an exploded shingle column. The shingle STRING is
    * hashed once; the j-th family member then mixes that long with the
    * family index — hashing 16 bytes instead of re-hashing the string k
    * times (ScaleProbe caught the k-fold string pass scaling super-linearly
    * at 10x docs). Used as
    * `explodedShingles.groupBy(docId).agg(minhashAggs(col("s")): _*)` —
    * a single shuffle of (doc, shingle) pairs; each agg is a map-side
    * partial min, so the reducer sees k longs per doc, not the shingles.
    */
  def minhashAggs(shingle: Column, k: Int = 64): Seq[Column] = {
    val base = xxhash64(shingle)
    (0 until k).map(j => min(xxhash64(lit(j), base)).as(s"mh$j"))
  }

  /** k MinHash values computed PER ROW from a pre-hashed shingle array —
    * no explode, no shuffle: `array_min(transform(hashes, mix_j))` runs
    * entirely inside whole-stage codegen. Produces bit-identical values to
    * [[minhashAggs]] (same xxhash64(j, xxhash64(s)) family), so the two
    * paths are interchangeable; this one is preferred when shingles are
    * already materialized as per-doc arrays (the dedup pipeline), the agg
    * path when the input is an exploded inverted index.
    *
    * `shingleHashes` must be `transform(sh, s -> xxhash64(s))` — hashing
    * the STRING once outside the per-family loop; mixing 64 longs per
    * element instead of re-hashing the string 64 times is the difference
    * ScaleProbe measured at 14x.
    */
  def minhashSignature(shingleHashes: Column, k: Int = 64): Seq[Column] =
    // composed per-family form, NOT element_at over minhashSignatureArray:
    // extracting k scalars from the same array expression in one projection
    // re-inlines the whole signature k times when subexpression elimination
    // can't hold the tree — a silent k-fold recompute. Callers that can
    // carry one array column should prefer [[minhashSignatureArray]].
    (0 until k).map { j =>
      array_min(transform(shingleHashes, h => xxhash64(lit(j), h))).as(s"mh$j")
    }

  /** The k minima as ONE array column, computed by the native one-pass
    * [[graft.functions.MinHashSignature]] expression: the composed
    * `array_min(transform(...))` form walks the hash array k times and
    * allocates k temporary arrays per row — ScaleProbe measured that
    * GC-bound super-linear at 10x docs; the native expression keeps 64
    * running minima in a local long[] inside whole-stage codegen
    * (bit-identical values, DedupSpec pins the equality).
    */
  def minhashSignatureArray(shingleHashes: Column, k: Int = 64): Column =
    org.apache.spark.sql.classic.GraftSqlInternals.column(
      graft.functions.MinHashSignature(
        org.apache.spark.sql.classic.GraftSqlInternals.expression(shingleHashes),
        k
      )
    )

  /** LSH band digests over a MinHash signature laid out as columns mh0..mhK:
    * band b = hash of its r consecutive signature rows. Docs sharing any
    * band digest are candidate near-dup pairs; with k=64, bands=16, r=4 the
    * match probability is 1-(1-J^4)^16 — ~1 for J≥0.8, ~0.03 for J=0.2.
    */
  def bandStructs(bands: Int = 16, rowsPerBand: Int = 4): Column =
    array(
      (0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          xxhash64((0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*)
            .as("digest")
        )
      }: _*
    )

  /** Band digests straight off a signature ARRAY column (the
    * [[minhashSignatureArray]] output). Same digests as [[bandStructs]]
    * over extracted mh columns — the band hash consumes the same longs —
    * but the signature stays ONE materialized array column end to end:
    * extracting 64 scalar columns in a projection tempts Catalyst to
    * inline the signature expression 64 times when subexpression
    * elimination can't hold the whole tree (ScaleProbe measured that
    * recompute at ~4x the composed form's cost; the array form is ~10x
    * cheaper than composed instead).
    */
  def bandStructsFromSig(
      sig: Column,
      bands: Int = 16,
      rowsPerBand: Int = 4
  ): Column =
    array(
      (0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          xxhash64((0 until rowsPerBand).map(r =>
            element_at(sig, b * rowsPerBand + r + 1)): _*)
            .as("digest")
        )
      }: _*
    )

  /** Usable SimHash fingerprint bits. The per-token hash is Karp-Rabin mod
    * the Mersenne prime 2^61-1 ([[graft.functions.RollingFingerprint]]), so
    * values live in [0, 2^61-1): 61 bits carry signal. Chosen over xxhash64
    * precisely because the KR fold is mirrorable in DuckDB HUGEINT algebra
    * (QueryUtil.fingerprintOracleCte) — with it, the WHOLE vote/band/Hamming
    * pipeline is hash-oracled instead of rows-only checked.
    */
  val SimhashBits = 61

  /** Suffix appended to each token before hashing. KR folds these 8 extra
    * bytes after the token, so the final value is
    * `tokHash * 257^8 + C (mod 2^61-1)` — an affine multiplicative spread
    * that fills all 61 bits even for short tokens. Without it a bare
    * 1-3-char token hashes below 257^3 (~2^24): the high bits of MOST
    * tokens would be constantly 0, every document's high-bit votes would
    * collapse to -1, and the high LSH band would put the entire corpus in
    * one bucket (an O(n^2) candidate blowup). The oracle concatenates the
    * same pad before its fold.
    */
  val SimhashPad = "#simhash"

  /** Per-token 61-bit hash feeding the SimHash votes: whole-string
    * Karp-Rabin (window 0) over the padded token. Codegen'd native
    * expression — the hot loop stays inside whole-stage codegen.
    */
  def simhashTokenHash(token: Column): Column =
    graft.functions.Functions
      .rollingFingerprint(concat(token, lit(SimhashPad)), lit(0))

  /** SimHash of a token-hash column: every token votes its hash bits up or
    * down; the fingerprint keeps the majority sign per bit. Near-identical
    * texts land within a few bits of Hamming distance.
    * Takes the PRE-COMPUTED hash column ([[simhashTokenHash]], materialized
    * once in a projection) — referencing the hash expression itself from
    * all 61 sums would tempt Catalyst to inline the KR fold 61 times per
    * token when subexpression elimination can't hold the tree.
    * Returns per-bit vote aggregates to lay over a groupBy; combine with
    * [[simhashFromVotes]].
    */
  def simhashVoteAggs(tokenHash: Column): Seq[Column] =
    (0 until SimhashBits).map { i =>
      sum(
        when(shiftright(tokenHash, i).bitwiseAND(lit(1L)) === 1L, 1)
          .otherwise(-1)
      ).as(s"v$i")
    }

  /** Reassemble the vote sums into the fingerprint long (bits 0..60). */
  def simhashFromVotes: Column =
    (0 until SimhashBits)
      .map(i => when(col(s"v$i") > 0, shiftleft(lit(1L), i)).otherwise(0L))
      .reduce(_.bitwiseOR(_))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** English-ish stopword lists used by the language-ID heuristic. The
    * choice of lists is the heuristic; scoring = count of tokens present.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "los", "y", "es", "un"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "un"),
    "zh" -> Seq("de", "shi", "le", "zai", "he", "you", "wo")
  )

  /** Count of tokens that appear in `list` (an order-insensitive hit count,
    * cast to bigint so Spark and DuckDB agree on the type).
    */
  def stopwordHits(ws: Column, list: Seq[String]): Column =
    org.apache.spark.sql.classic.GraftSqlInternals.column(
      graft.functions.CountTokensIn(
        org.apache.spark.sql.classic.GraftSqlInternals.expression(ws), list))
      .cast("bigint")

  /** The pre-r12 composed formulation of [[stopwordHits]] — the
    * executable spec the native expression is pinned against.
    */
  private[graft] def stopwordHitsComposed(ws: Column, list: Seq[String]): Column =
    size(filter(ws, w => array_contains(array(list.map(lit): _*), w))).cast("bigint")

  /** EXACT SUBSTRING (SPAN) DEDUP — cross-document duplicated-span
    * removal (Lee et al. 2021): any `k`-word shingle occurring in >= 2
    * DISTINCT documents is a duplicated span; the smallest doc_id
    * containing it keeps its text, every other occurrence's k-word
    * window is removed, and overlapping windows merge through word-level
    * kill marks (an N-word duplicated run, N > k, dies as one region).
    * Within-doc repeats (df = 1 document) are untouched — span dedup is
    * cross-document by definition. Input: (doc_id, text); output:
    * (doc_id, n_words, n_removed, clean_text), one row per input doc
    * (sub-k docs pass through with n_removed = 0).
    *
    * 100 TB shape: the text NEVER shuffles — shingle rows carry
    * (doc_id, pos, shingle) through the df dictionary and the kill
    * join, kill positions collapse to per-doc sets, and the one
    * text-side join is by doc_id. This is the distributed re-expression
    * of the inherently-sequential suffix-array formulation.
    *
    * `hashKeys` (default TRUE — the scale path) replaces the shingle
    * STRING key with a 128-bit pair of xxhash64 values before the
    * dictionary groupBy and kill join, so the shuffled bytes per shingle
    * drop from ~k words to 16 — at corpus scale the difference between
    * shuffling the corpus and shuffling fingerprints. The q_dedup_spans
    * oracle gate runs hashKeys = false (DuckDB replays the string
    * algebra exactly); DedupSpec pins the two paths row-identical, and
    * a 128-bit collision (~1e-18 at 1e10 distinct shingles) is the
    * standard fingerprinting trade every MinHash/SimHash operator in
    * this repo already makes.
    */
  def spanDedup(
      docs: DataFrame, k: Int = 8, hashKeys: Boolean = true): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("ws"))
    // sequence(0, negative) DESCENDS in Spark — the size guard is
    // load-bearing, not cosmetic
    val posStrings = toks
      .filter(size(col("ws")) >= k)
      .select(
        col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("ws")) - k),
          i => concat_ws(" ", slice(col("ws"), i + 1, lit(k))))))
      .select(col("doc_id"), col("pos"), col("col").as("sh"))
    val posShingle =
      if (!hashKeys) posStrings
      else posStrings.select(
        col("doc_id"), col("pos"),
        struct(
          xxhash64(col("sh")),
          xxhash64(col("sh"), lit(1L))).as("sh"))
    val dict = posShingle
      .groupBy(col("sh"))
      .agg(
        min(col("doc_id")).as("keeper"),
        countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2)
      .select(col("sh"), col("keeper"))
    val killStarts = posShingle
      .join(dict, Seq("sh"))
      .filter(col("doc_id") =!= col("keeper"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("pos")).as("ks"))
    toks
      .join(killStarts, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        size(col("ws")).cast("bigint").as("n_words"),
        coalesce(col("ks"), array().cast("array<int>")).as("ks"),
        col("ws"))
      .select(
        col("doc_id"),
        col("n_words"),
        filter(col("ws"), (w, p) =>
          !exists(col("ks"), st => p >= st && p < st + k)).as("kept"))
      .select(
        col("doc_id"),
        col("n_words"),
        (col("n_words") - size(col("kept"))).cast("bigint").as("n_removed"),
        concat_ws(" ", col("kept")).as("clean_text"))
  }
}
