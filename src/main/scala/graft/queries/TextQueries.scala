package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.TextOps
import QueryUtil._

/** Text-analysis operators over `documents` (SURVEY.md §2.C): quality
  * statistics, token counting, language-ID heuristic, content
  * fingerprinting, and multimodal (binary-column) conventions. All the
  * SQL-portable ones carry a DuckDB oracle with the SAME formula so the
  * numbers — not just the row counts — are gated.
  */
object TextQueries {

  /** q_text_bpe_fertility's DYNAMIC oracle (Q.oracleFn, the ivfOracle
    * mechanism — see SimilarityQueries): the SQL embeds the merge table
    * the run actually fitted, so it is authored post-run. Last-writer-
    * wins by design; only Verify dumps it, once, single-threaded.
    */
  private val bpeOracle =
    new java.util.concurrent.atomic.AtomicReference[Option[String]](None)

  /** DuckDB mirror of the BPE merge algebra ([[graft.functions.BpeTable]]
    * semantics): each word becomes a space-delimited symbol string
    * `' c1 c2 … '`; a recursive CTE applies each fitted merge rule in
    * rank order via plain string `replace` until fixpoint before
    * advancing to the next rank. String replace on the delimited form
    * merges leftmost-first exactly like the expression's greedy pass
    * (adjacent same-rule chains defer to the next replace call, reaching
    * the same fixpoint), so token counts agree exactly — an INDEPENDENT
    * re-computation of the merge loop, not an echo of Spark's output.
    * Encoded once per DISTINCT word (like the expression's cache), then
    * joined back onto the word stream.
    */
  private def bpeOracleSql(rules: Array[(String, String)]): String = {
    def esc(x: String) = x.replace("'", "''")
    val vals = rules.zipWithIndex
      .map { case ((l, r), i) => s"($i, '${esc(l)}', '${esc(r)}')" }
      .mkString(",\n    ")
    val n = rules.length
    raw"""WITH RECURSIVE merges(rank, l, r) AS (
       |  VALUES $vals
       |), docw AS (
       |  SELECT doc_id, lang,
       |         unnest(regexp_split_to_array(lower(text), '\s+')) AS w
       |  FROM documents
       |), words AS (
       |  SELECT DISTINCT w FROM docw
       |), steps(w, s, k) AS (
       |  SELECT w, ' ' || regexp_replace(w, '(.)', '\1 ', 'g'), 0 FROM words
       |  UNION ALL
       |  SELECT w,
       |         r2,
       |         CASE WHEN r2 = s THEN k + 1 ELSE k END
       |  FROM (
       |    SELECT st.w AS w, st.s AS s, st.k AS k,
       |           replace(st.s, ' ' || m.l || ' ' || m.r || ' ',
       |                         ' ' || m.l || m.r || ' ') AS r2
       |    FROM steps st JOIN merges m ON m.rank = st.k
       |  )
       |), tok AS (
       |  SELECT w, CAST(len(s) - len(replace(s, ' ', '')) - 1 AS BIGINT) AS n_tok
       |  FROM steps WHERE k = $n
       |), joined AS (
       |  SELECT d.doc_id, d.lang, t.n_tok FROM docw d JOIN tok t ON d.w = t.w
       |)
       |SELECT lang,
       |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS total_words,
       |       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       |       round(sum(n_tok) * 1.0 / count(*), 6) AS fertility
       |FROM joined GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** q_text_quality_classifier's DYNAMIC oracle — same mechanism as
    * [[bpeOracle]]: the SQL embeds the logistic-regression weights the
    * run actually fitted (GD over doubles is deterministic up to
    * partition summation order, so the weights are only known post-run).
    */
  private val qcOracle =
    new java.util.concurrent.atomic.AtomicReference[Option[String]](None)

  /** Shortest round-trip double literal (DuckDB's parser is correctly
    * rounded, so the literal parses back to identical bits).
    */
  private def dbl(d: Double): String = java.lang.Double.toString(d)

  /** DuckDB mirror of QualityClassifier.score under fitted weights:
    * recompute the hashed-gram frequency features from scratch (an
    * independent re-derivation, not an echo) and score
    * sigma(sum_b x_b*w_b + bias). The bucket sum is unordered double
    * addition vs Spark's sequential fold — round-6 absorbs the ulps,
    * the same contract as every other double-scoring oracle here.
    */
  private def qcOracleSql(weights: Array[Double], nBuckets: Int): String = {
    val vals = weights.take(nBuckets).zipWithIndex
      .map { case (w, b) => s"($b, ${dbl(w)})" }
      .mkString(", ")
    val bias = dbl(weights.last)
    s"""WITH toks AS (
       |  SELECT doc_id, lang, regexp_split_to_array(lower(text), '\\s+') AS ws
       |  FROM documents
       |), grams AS (
       |  SELECT doc_id, lang,
       |         unnest(ws || [ws[i] || ' ' || ws[i+1]
       |                       for i in range(1, len(ws))]) AS g
       |  FROM toks
       |), tf AS (
       |  SELECT doc_id, lang,
       |         CAST(('0x' || substring(sha256(g), 1, 4)) AS BIGINT) % $nBuckets AS b,
       |         count(*) AS n
       |  FROM grams WHERE g <> '' GROUP BY 1, 2, 3
       |), tot AS (
       |  SELECT doc_id, sum(n) AS ntot FROM tf GROUP BY 1
       |), wt(b, w) AS (
       |  VALUES $vals
       |), z AS (
       |  SELECT tf.doc_id, CAST(lang = 'en' AS DOUBLE) AS is_target,
       |         sum((CAST(n AS DOUBLE) * $nBuckets / ntot) * w) + $bias AS z
       |  FROM tf JOIN tot USING (doc_id) JOIN wt USING (b)
       |  GROUP BY 1, 2
       |)
       |SELECT doc_id, is_target,
       |       round(1.0 / (1.0 + exp(-z)), 6) AS quality
       |FROM z ORDER BY doc_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    // ----- quality statistics ---------------------------------------------
    // Integer counts first, ratios as double at the end (identical operand
    // order both engines -> bit-equal doubles).
    Q(
      "q_text_stats",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            $"doc_id",
            $"lang",
            $"n_chars",
            TextOps.tokens($"text").as("ws"),
            length($"text").cast("bigint").as("len"),
            (length($"text") -
              length(regexp_replace($"text", "[.,!?;:]", "")))
              .cast("bigint")
              .as("n_punct")
          )
          .select(
            $"doc_id",
            $"lang",
            $"len",
            size($"ws").cast("bigint").as("n_tokens"),
            size(array_distinct($"ws")).cast("bigint").as("n_distinct_tokens"),
            $"n_punct",
            round($"n_punct" * lit(1.0) / $"len", 6).as("punct_ratio"),
            round(
              TextOps.stopwordHits($"ws", TextOps.stopwords("en")) * lit(1.0) /
                size($"ws"),
              6
            ).as("stopword_ratio"),
            round(size(array_distinct($"ws")) * lit(1.0) / size($"ws"), 6)
              .as("ttr") // type-token ratio: low = repetitive/low-quality
          )
          .orderBy($"doc_id"),
      Some(
        """WITH base AS (
          |  SELECT doc_id, lang,
          |         CAST(length(text) AS BIGINT) AS len,
          |         regexp_split_to_array(lower(text), '\s+') AS ws,
          |         CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct
          |  FROM documents
          |)
          |SELECT doc_id, lang, len,
          |       CAST(len(ws) AS BIGINT) AS n_tokens,
          |       CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_tokens,
          |       n_punct,
          |       round(n_punct * 1.0 / len, 6) AS punct_ratio,
          |       round(CAST(len(list_filter(ws, w -> list_contains(['the','a','of','and','to','in','is'], w))) AS BIGINT) * 1.0 / len(ws), 6) AS stopword_ratio,
          |       round(len(list_distinct(ws)) * 1.0 / len(ws), 6) AS ttr
          |FROM base ORDER BY doc_id""".stripMargin
      ),
      bench = true
    ),
    // ----- token counting (whitespace + BPE-ish char/4 estimate) -----------
    Q(
      "q_text_tokens",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            $"lang",
            size(TextOps.tokens($"text")).cast("bigint").as("n_words"),
            ceil(length($"text") / lit(4.0)).cast("bigint").as("n_tok_est")
          )
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum($"n_words").cast("bigint").as("total_words"),
            sum($"n_tok_est").cast("bigint").as("total_tok_est"),
            round(sum($"n_words") * lit(1.0) / count(lit(1)), 6).as("avg_words")
          )
          .orderBy($"lang"),
      Some(
        """WITH base AS (
          |  SELECT lang,
          |         CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT) AS n_words,
          |         CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tok_est
          |  FROM documents
          |)
          |SELECT lang, count(*) AS n_docs,
          |       CAST(sum(n_words) AS BIGINT) AS total_words,
          |       CAST(sum(n_tok_est) AS BIGINT) AS total_tok_est,
          |       round(sum(n_words) * 1.0 / count(*), 6) AS avg_words
          |FROM base GROUP BY lang ORDER BY lang""".stripMargin
      )
    ),
    // ----- BPE-ish token counting --------------------------------------------
    // Whitespace words (q_text_tokens) undercount what a subword tokenizer
    // bills you for; this runs a GPT-2-style pre-tokenizer regex
    // (contractions | space-prefixed letter runs | digit runs |
    // punctuation runs | whitespace) and reports pieces plus fertility
    // (pieces per whitespace word) per language — the number you budget a
    // training run with. ASCII character classes on both engines (the
    // fixture envelope DedupSpec pins), identical match semantics in Java
    // regex and RE2 for this pattern. One codegen'd pass + a 5-group agg.
    Q(
      "q_text_tokens_bpe",
      (s, dir) => {
        val pat = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+| +"
        t(s, dir, "documents")
          .select(
            $"lang",
            size(regexp_extract_all($"text", lit(pat), lit(0)))
              .cast("bigint").as("n_pieces"),
            size(TextOps.tokens($"text")).cast("bigint").as("n_words")
          )
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum($"n_pieces").cast("bigint").as("total_pieces"),
            round(sum($"n_pieces") * lit(1.0) / sum($"n_words"), 6)
              .as("pieces_per_word")
          )
          .orderBy($"lang")
      },
      Some {
        val pat =
          "''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+| +"
        s"""WITH base AS (
           |  SELECT lang,
           |         CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_pieces,
           |         CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS n_words
           |  FROM documents
           |)
           |SELECT lang, count(*) AS n_docs,
           |       CAST(sum(n_pieces) AS BIGINT) AS total_pieces,
           |       round(sum(n_pieces) * 1.0 / sum(n_words), 6) AS pieces_per_word
           |FROM base GROUP BY lang ORDER BY lang""".stripMargin
      }
    ),
    // ----- real merge-loop BPE ---------------------------------------------
    // The actual merges-table tokenizer (Sennrich 2016), not the regex
    // approximation above: FIT a deterministic merge table on the
    // corpus' capped word-frequency dictionary (one shuffle + a bounded
    // collect — tokenizers are fit on dictionaries, never raw corpora),
    // then ENCODE per doc with the native merge-loop expression
    // (functions.BpeEncode — table serialized into the plan, per-word
    // cache) and report token totals + fertility per language. The
    // oracle re-runs the same merge algebra in DuckDB (recursive CTE of
    // string replaces over the fitted rules — see bpeOracleSql), so the
    // merge LOOP itself is cross-engine gated, not just the counts.
    Q(
      "q_text_bpe_fertility",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val table = graft.operators.BpeTokenizer.fitMerges(
          docs.select(explode(TextOps.tokens($"text")).as("w")),
          "w", nMerges = 40, vocabCap = 4096)
        bpeOracle.set(Some(bpeOracleSql(table.rules)))
        docs
          .select(
            $"lang",
            size(TextOps.tokens($"text")).cast("bigint").as("n_words"),
            size(graft.operators.BpeTokenizer
              .encode(TextOps.tokens($"text"), table))
              .cast("bigint").as("n_tokens"))
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum($"n_words").cast("bigint").as("total_words"),
            sum($"n_tokens").cast("bigint").as("total_tokens"),
            round(sum($"n_tokens") * lit(1.0) / sum($"n_words"), 6)
              .as("fertility"))
          .orderBy($"lang")
      },
      None,
      oracleFn = Some(() => bpeOracle.get())
    ),
    // ----- language-ID heuristic -------------------------------------------
    // Stopword-profile scoring; argmax with a fixed tie order. The fixture
    // text is synthetic word soup, so this gates the MACHINERY (scoring +
    // argmax identical in both engines), not real-world accuracy.
    Q(
      "q_text_lang",
      (s, dir) => {
        val langs = Seq("en", "de", "es", "fr")
        val scored = t(s, dir, "documents")
          .select($"doc_id", TextOps.tokens($"text").as("ws"))
          .select(
            $"doc_id" +:
              langs.map(l =>
                TextOps.stopwordHits($"ws", TextOps.stopwords(l)).as(s"s_$l")
              ): _*
          )
        val best = langs.foldRight(lit("und")) { (l, elseCol) =>
          when(
            col(s"s_$l") > 0 &&
              langs.filter(_ != l).map(o => col(s"s_$l") >= col(s"s_$o"))
                .reduce(_ && _),
            lit(l)
          ).otherwise(elseCol)
        }
        scored
          .select($"doc_id", best.as("lang_pred"), $"s_en", $"s_de", $"s_es", $"s_fr")
          .orderBy($"doc_id")
      },
      Some(
        """WITH sc AS (
          |  SELECT doc_id,
          |    CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), w -> list_contains(['the','a','of','and','to','in','is'], w))) AS BIGINT) AS s_en,
          |    CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), w -> list_contains(['der','die','das','und','ist','ein','zu'], w))) AS BIGINT) AS s_de,
          |    CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), w -> list_contains(['el','la','de','los','y','es','un'], w))) AS BIGINT) AS s_es,
          |    CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), w -> list_contains(['le','la','les','et','des','est','un'], w))) AS BIGINT) AS s_fr
          |  FROM documents
          |)
          |SELECT doc_id,
          |  CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
          |       WHEN s_de > 0 AND s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
          |       WHEN s_es > 0 AND s_es >= s_en AND s_es >= s_de AND s_es >= s_fr THEN 'es'
          |       WHEN s_fr > 0 AND s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es THEN 'fr'
          |       ELSE 'und' END AS lang_pred,
          |  s_en, s_de, s_es, s_fr
          |FROM sc ORDER BY doc_id""".stripMargin
      )
    ),
    // ----- document chunking ------------------------------------------------
    // Fixed-size token windows with stride — the standard pre-tokenization
    // step that turns documents into training samples. One explode, no
    // shuffle until the final order; chunk boundaries are pure arithmetic
    // over the token array, so DuckDB reproduces them exactly.
    Q(
      "q_text_chunk",
      (s, dir) => {
        val chunkLen = 40
        val stride = 30
        t(s, dir, "documents")
          .select($"doc_id", TextOps.tokens($"text").as("ws"))
          .filter(size($"ws") >= 1)
          .select(
            $"doc_id",
            size($"ws").as("n_tokens"),
            posexplode(
              transform(
                // chunk starts: 0, stride, 2*stride, ... while start < n
                // (`div`: / on int columns is double division in Spark)
                sequence(lit(0), expr(s"(size(ws) - 1) div $stride")),
                i => concat_ws(" ", slice($"ws", i * stride + 1, lit(chunkLen)))
              )
            )
          )
          .select(
            $"doc_id",
            $"pos".cast("bigint").as("chunk_idx"),
            size(split($"col", " ")).cast("bigint").as("chunk_tokens"),
            substring($"col", 1, 30).as("chunk_head")
          )
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some(
        """WITH toks AS (
          |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws
          |  FROM documents
          |), lists AS (
          |  SELECT doc_id,
          |         [array_to_string(ws[i*30+1 : i*30+40], ' ')
          |          for i in range(0, (len(ws)-1)//30 + 1)] AS chunks
          |  FROM toks WHERE len(ws) >= 1
          |), flat AS (
          |  SELECT doc_id, unnest(chunks) AS chunk,
          |         generate_subscripts(chunks, 1) AS idx
          |  FROM lists
          |)
          |SELECT doc_id, CAST(idx - 1 AS BIGINT) AS chunk_idx,
          |       CAST(len(string_split(chunk, ' ')) AS BIGINT) AS chunk_tokens,
          |       substring(chunk, 1, 30) AS chunk_head
          |FROM flat ORDER BY doc_id, chunk_idx""".stripMargin
      )
    ),
    // ----- repetition detection --------------------------------------------
    // Loop/boilerplate detector: the share of the document taken by its
    // most frequent word-3gram. Generated/spammy text repeats shingles;
    // clean prose almost never exceeds a few percent. Standard corpus-
    // cleaning signal next to TTR.
    Q(
      "q_text_repetition",
      (s, dir) =>
        t(s, dir, "documents")
          .select($"doc_id", TextOps.tokens($"text").as("ws"))
          .filter(size($"ws") >= 3)
          .select(
            $"doc_id",
            explode(
              transform(
                sequence(lit(0), size($"ws") - lit(3)),
                i =>
                  concat_ws(
                    " ",
                    element_at($"ws", i + lit(1)),
                    element_at($"ws", i + lit(2)),
                    element_at($"ws", i + lit(3))
                  )
              )
            ).as("s")
          )
          .groupBy($"doc_id", $"s")
          .agg(count(lit(1)).as("c"))
          .groupBy($"doc_id")
          .agg(
            max($"c").cast("bigint").as("max_rep"),
            sum($"c").cast("bigint").as("n_shingles"),
            round(max($"c") * lit(1.0) / sum($"c"), 6).as("rep_ratio")
          )
          .orderBy($"doc_id"),
      Some(
        """WITH toks AS (
          |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws FROM documents
          |), sh AS (
          |  SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
          |                         for i in range(1, len(ws)-1)]) AS s
          |  FROM toks WHERE len(ws) >= 3
          |), cnt AS (
          |  SELECT doc_id, s, count(*) AS c FROM sh GROUP BY doc_id, s
          |)
          |SELECT doc_id, CAST(max(c) AS BIGINT) AS max_rep,
          |       CAST(sum(c) AS BIGINT) AS n_shingles,
          |       round(max(c) * 1.0 / sum(c), 6) AS rep_ratio
          |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin
      )
    ),
    // ----- end-to-end corpus pipeline --------------------------------------
    // The flagship LLM-data story in one query: exact-dedup -> quality
    // filter -> per-language corpus statistics. Each stage is the operator
    // defined elsewhere in this pack; the oracle replays the whole pipeline
    // in SQL, so the composition (not just the pieces) is hash-gated.
    Q(
      "q_pipeline_corpus",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // r21 single-pass restructure (guide §2/§6, oracle-hash-gated):
        // the r20 shape scanned documents TWICE (once to pick min-doc_id
        // keepers per sha256, once as the probe side of a keeper join)
        // and the pushed-down quality filter re-tokenized each row 3x.
        // Now ONE scan computes (h, doc_id, lang, n_tokens, n_distinct)
        // per row; the dedup becomes min_by over the digest — only these
        // five small columns cross the exchange, never `text` (the §8
        // proxy rule: decide placement on hashes and sizes, not
        // payloads). Equivalence: equal digests mean equal text, so the
        // per-row metrics of every row in a digest group are identical;
        // min_by(_, doc_id) returns exactly the row the keeper join
        // selected (doc_id is the fixture's unique key). The quality
        // filter moves ABOVE the dedup aggregate — identical survivors,
        // since metrics are constant within a group.
        val ws = TextOps.tokens($"text")
        val perDoc = docs.select(
          sha2($"text", 256).as("h"),
          $"doc_id",
          $"lang",
          size(ws).cast("bigint").as("n_tokens"),
          size(array_distinct(ws)).cast("bigint").as("n_distinct")
        )
        val keepers = perDoc
          .groupBy($"h")
          .agg(
            min_by($"lang", $"doc_id").as("lang"),
            min_by($"n_tokens", $"doc_id").as("n_tokens"),
            min_by($"n_distinct", $"doc_id").as("n_distinct")
          )
        val quality = keepers.filter(
          $"n_tokens" >= 20 &&
            $"n_distinct" * lit(1.0) / $"n_tokens" >= 0.10
        )
        // per-language corpus stats. Corpus TTR is the ratio of
        // exact integer sums — no double summation anywhere, so the
        // distributed agg order cannot perturb the oracle hash.
        quality
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum($"n_tokens").cast("bigint").as("total_tokens"),
            round(
              sum($"n_distinct").cast("double") / sum($"n_tokens").cast("double"),
              6
            ).as("corpus_ttr")
          )
          .orderBy($"lang")
      },
      Some(
        """WITH keepers AS (
          |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
          |), quality AS (
          |  SELECT d.lang,
          |         CAST(len(regexp_split_to_array(lower(d.text), '\s+')) AS BIGINT) AS n_tokens,
          |         CAST(len(list_distinct(regexp_split_to_array(lower(d.text), '\s+'))) AS BIGINT) AS n_distinct
          |  FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
          |)
          |SELECT lang, count(*) AS n_docs,
          |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
          |       round(CAST(sum(n_distinct) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE), 6) AS corpus_ttr
          |FROM quality
          |WHERE n_tokens >= 20 AND n_distinct * 1.0 / n_tokens >= 0.10
          |GROUP BY lang ORDER BY lang""".stripMargin
      ),
      bench = true
    ),
    // ----- content fingerprinting ------------------------------------------
    // Native rolling-hash expression, HASH-ORACLED since round 3: the
    // Karp-Rabin arithmetic is reproduced in DuckDB as HUGEINT modular
    // folds (QueryUtil.fingerprintOracleCte) — the oracle recomputes every
    // window hash O(n*w) while the engine rolls in O(n); equal results
    // prove the rolling algebra. TextExpressionsSpec still pins shift
    // robustness.
    Q(
      "q_text_fingerprint",
      (s, dir) => {
        graft.functions.Functions.register(s)
        t(s, dir, "documents")
          .select(
            $"doc_id",
            expr("rolling_fingerprint(text, 0)").as("full_fp"),
            expr("rolling_fingerprint(text, 32)").as("win_fp")
          )
          .orderBy($"doc_id")
      },
      Some(
        s"""WITH ${QueryUtil.fingerprintOracleCte(32)}
           |SELECT doc_id, full_fp, win_fp FROM fpc ORDER BY doc_id""".stripMargin
      )
    ),
    // ----- multimodal column conventions ------------------------------------
    // Media travels as an opaque binary column + typed metadata; here the
    // binary payload is the UTF-8 encoding of text (the fixture has no real
    // media), and the "feature extraction" is metadata-only: byte length,
    // content digest, leading-bytes signature (what you'd use to sniff
    // magic numbers). The decode path proper lives in operators.Multimodal.
    Q(
      "q_multimodal_meta",
      (s, dir) =>
        t(s, dir, "documents")
          .select($"doc_id", encode($"text", "UTF-8").as("media"))
          .select(
            $"doc_id",
            octet_length($"media").cast("bigint").as("n_bytes"),
            sha2($"media", 256).as("digest"),
            lower(hex(substring($"media", 1, 8))).as("magic")
          )
          .orderBy($"doc_id"),
      Some(
        // DuckDB's substring/sha256 are VARCHAR-only: take the leading
        // bytes as a slice of the full hex string instead (first 8 bytes =
        // first 16 hex chars), and hash the text (same UTF-8 bytes).
        "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
          "sha256(text) AS digest, " +
          "lower(substring(hex(encode(text)), 1, 16)) AS magic " +
          "FROM documents ORDER BY doc_id"
      )
    ),
    // ----- TF-IDF term weighting -------------------------------------------
    // The classic corpus-relative term scorer: tf from a (doc, term)
    // explode+count, df from a per-term distinct-doc count, idf = ln(N/df).
    // 100 TB shape: ONE token shuffle feeds both aggregates; df (vocab-
    // sized) and N (one row) are broadcast back onto tf, so the fact-side
    // data is shuffled once and joined without movement. ln() on both
    // engines is the platform libm; round(...,6) absorbs any last-ulp
    // disagreement, and (tfidf DESC, term) is a total order per doc.
    Q(
      "q_text_tfidf",
      (s, dir) =>
        tfidfTopTerms(t(s, dir, "documents"), 3)
          .filter($"doc_id" < 50)
          .orderBy($"doc_id", $"tfidf".desc, $"term"),
      Some(
        """WITH toks AS (
          |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
          |  FROM documents
          |), tf AS (
          |  SELECT doc_id, term, count(*) AS tf FROM toks
          |  WHERE term <> '' GROUP BY doc_id, term
          |), dfreq AS (
          |  SELECT term, count(DISTINCT doc_id) AS df FROM toks
          |  WHERE term <> '' GROUP BY term
          |), n AS (SELECT count(*) AS n_docs FROM documents),
          |scored AS (
          |  SELECT doc_id, term, tf, round(tf * ln(n_docs * 1.0 / df), 6) AS tfidf
          |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
          |), ranked AS (
          |  SELECT *, row_number() OVER (
          |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
          |  FROM scored
          |)
          |SELECT doc_id, term, tf, tfidf FROM ranked
          |WHERE rk <= 3 AND doc_id < 50
          |ORDER BY doc_id, tfidf DESC, term""".stripMargin
      )
    ),
    // ----- corpus n-gram frequency -----------------------------------------
    // Top bigrams across the corpus — the vocabulary-induction / contamination-
    // check primitive. Bigrams are built per row inside the token array
    // (no self-join, no positional shuffle): one explode, one count.
    Q(
      "q_text_ngram_freq",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            expr("filter(split(lower(text), '\\\\s+'), w -> w != '')").as("l")
          )
          .filter(size($"l") >= 2)
          .select(
            explode(
              expr(
                "transform(sequence(1, size(l) - 1), " +
                  "i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))"
              )
            ).as("bigram")
          )
          .groupBy($"bigram")
          .agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"bigram")
          .limit(20),
      Some(
        """WITH toks AS (
          |  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> '') AS l
          |  FROM documents
          |), bg AS (
          |  SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram
          |  FROM toks WHERE len(l) >= 2
          |)
          |SELECT bigram, count(*) AS n FROM bg
          |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin
      )
    ),
    // ----- sequence packing ---------------------------------------------------
    // The concat-and-cut packing step that turns a cleaned corpus into
    // fixed-length pretraining sequences: concatenate documents in a
    // deterministic order, cut every ctx tokens, and record for each doc
    // which sequence (bin) it starts in and at what offset. Packing is
    // SHARDED (shard = doc_id % nShards, each shard packs independently
    // ordered by doc_id) because one global running sum is a
    // single-partition window — the classic scale-killer; real pipelines
    // shard exactly like this so every window partition stays
    // executor-sized (nShards grows with the corpus; 4 here keeps the
    // demo readable). All-integer math -> full hash oracle.
    Q(
      "q_pack_sequences",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ctx = 512
        val nShards = 4
        val w = Window
          .partitionBy($"shard")
          .orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "documents")
          .select(
            $"doc_id",
            pmod($"doc_id", lit(nShards)).as("shard"),
            size(TextOps.tokens($"text")).cast("bigint").as("n_tok")
          )
          .withColumn("start_tok", sum($"n_tok").over(w) - $"n_tok")
          .select(
            $"doc_id",
            $"shard",
            $"n_tok",
            expr(s"start_tok div $ctx").as("bin"),
            ($"start_tok" % ctx).as("bin_offset")
          )
          .orderBy($"shard", $"doc_id")
      },
      Some(
        """WITH toks AS (
          |  SELECT doc_id, doc_id % 4 AS shard,
          |         len(regexp_split_to_array(lower(text), '\s+')) AS n_tok
          |  FROM documents
          |), packed AS (
          |  SELECT doc_id, shard, CAST(n_tok AS BIGINT) AS n_tok,
          |         CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
          |              ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS start_tok
          |  FROM toks
          |)
          |SELECT doc_id, shard, n_tok,
          |       start_tok // 512 AS bin,
          |       start_tok % 512 AS bin_offset
          |FROM packed ORDER BY shard, doc_id""".stripMargin
      )
    ),
    // ----- benchmark decontamination ----------------------------------------
    // The eval-set overlap check every serious training-data pipeline runs
    // before training (the GPT-3/Llama recipe: flag training docs sharing
    // long n-grams with benchmark data). Here the "benchmark" is the
    // deterministic doc_id % 20 == 0 slice of the corpus and the probe is
    // distinct word-8-gram collision: one shared 8-gram = contamination.
    // Scale shape: eval suites are tiny next to a 100 TB corpus, so the
    // benchmark gram set BROADCASTS and the corpus side is one streaming
    // pass (explode -> broadcast-hash-join -> per-doc partial agg); no
    // corpus-sized shuffle anywhere. If the benchmark ever outgrew
    // broadcast, the same plan degrades gracefully to a shuffle join on
    // the gram — the inverted-index shape jaccardPairs already proves.
    Q(
      "q_decontaminate",
      // % 20 mirrors the oracle SQL below; fine at fixture scale, and the
      // proportional-slice caveat lives in contaminationCounts' scaladoc
      (s, dir) =>
        contaminationCounts(t(s, dir, "documents"), $"doc_id" % 20 === 0),
      Some {
        val gram = (0 until 8).map(k => s"ws[i+$k]").mkString(" || ' ' || ")
        s"""WITH toks AS (
           |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws
           |  FROM documents
           |), grams AS (
           |  SELECT doc_id,
           |         unnest(list_distinct([$gram for i in range(1, len(ws)-6)])) AS g
           |  FROM toks WHERE len(ws) >= 8
           |), bench AS (
           |  SELECT doc_id AS bench_id, g FROM grams WHERE doc_id % 20 = 0
           |), corpus AS (
           |  SELECT doc_id, g FROM grams WHERE doc_id % 20 <> 0
           |)
           |SELECT c.doc_id,
           |       count(DISTINCT b.bench_id) AS n_bench_docs,
           |       count(DISTINCT c.g) AS n_shared_grams
           |FROM corpus c JOIN bench b ON c.g = b.g
           |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin
      }
    ),
    // ----- BM25 keyword retrieval ------------------------------------------
    // The classic lexical ranking function (k1=1.2, b=0.75) for a fixed
    // keyword query — the retrieval half of hybrid search and the
    // workhorse of quality-targeted corpus curation. Same shuffle shape
    // as TF-IDF: one token pass feeds tf/dl/df; df and the corpus stats
    // broadcast back onto the per-(doc,term) scores. All-double math with
    // identical operand order in both engines; round-6 absorbs the <=
    // 3-term summation-order ulp.
    Q(
      "q_text_bm25",
      (s, dir) =>
        bm25Scores(s, dir, Seq("merge", "window", "batch"))
          .orderBy($"bm25".desc, $"doc_id")
          .limit(15),
      Some(
        s"""WITH ${bm25OracleCtes("'merge', 'window', 'batch'")}
           |SELECT doc_id, bm25 FROM bm
           |ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin
      )
    ),
    // ----- hybrid search (RRF fusion) ---------------------------------------
    // Reciprocal-rank fusion of the lexical (BM25) and vector (cosine)
    // rankings: rrf = 1/(60+r_bm25) + 1/(60+r_cos), a modality outside
    // its top-K list contributes nothing — the standard way to combine
    // retrieval modalities without score calibration. RRF is DEFINED over
    // top-K retrieval lists, and that is what is ranked here: each
    // modality keeps its global top-K (TakeOrderedAndProject — bounded
    // per-partition top-k + one K-row merge, never a corpus sort) and
    // ranks those K rows via rankTopK's broadcast self-join — zero
    // WindowExec in the plan (PlanSpec-pinned; the round-4 version's
    // unpartitioned row_number windows moved the whole corpus to one
    // partition). Ranks come from round-6 scores with doc_id tiebreaks,
    // so both engines rank identically; embeddings.vec_id aligns 1:1
    // with documents.doc_id in the fixture.
    Q(
      "q_hybrid_search",
      (s, dir) => {
        val topK = 100
        val bm = rankTopK(
          bm25Scores(s, dir, Seq("merge", "window", "batch")),
          "bm25", topK, "r_bm")
        val e = t(s, dir, "embeddings")
        val qv = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
        val cos = e
          .crossJoin(broadcast(qv))
          .select(
            $"vec_id".as("doc_id"),
            round(graft.functions.Functions.cosineSim($"embedding", $"qvec"), 6)
              .as("cos")
          )
        val vec = rankTopK(cos, "cos", topK, "r_vec")
        bm.join(vec, Seq("doc_id"), "full_outer")
          .select(
            $"doc_id",
            round(
              coalesce(lit(1.0) / (lit(60) + $"r_bm"), lit(0.0)) +
                coalesce(lit(1.0) / (lit(60) + $"r_vec"), lit(0.0)),
              6
            ).as("rrf")
          )
          .orderBy($"rrf".desc, $"doc_id")
          .limit(10)
      },
      Some(
        s"""WITH ${bm25OracleCtes("'merge', 'window', 'batch'")},
           |bmr AS (
           |  SELECT doc_id, r_bm FROM (
           |    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_bm
           |    FROM bm
           |  ) WHERE r_bm <= 100
           |), vec AS (
           |  SELECT e.vec_id AS doc_id,
           |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
           |                                      CAST(q.embedding AS DOUBLE[])), 6) AS cos
           |  FROM embeddings e,
           |       (SELECT embedding FROM embeddings WHERE vec_id = 0) q
           |), vr AS (
           |  SELECT doc_id, r_vec FROM (
           |    SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS r_vec
           |    FROM vec
           |  ) WHERE r_vec <= 100
           |)
           |SELECT coalesce(bmr.doc_id, vr.doc_id) AS doc_id,
           |       round(coalesce(CAST(1.0 AS DOUBLE) / (60 + r_bm), 0.0) +
           |             coalesce(CAST(1.0 AS DOUBLE) / (60 + r_vec), 0.0), 6) AS rrf
           |FROM bmr FULL OUTER JOIN vr ON bmr.doc_id = vr.doc_id
           |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
      )
    ),
    // ----- text scrubbing ---------------------------------------------------
    // The cleaning pass of a training pipeline: drop stopwords, collapse
    // whitespace, trim. Pure codegen'd regexp_replace — Java regex and RE2
    // agree on this \b alternation (the hash gate proves it per run).
    Q(
      "q_text_scrub",
      (s, dir) =>
        t(s, dir, "documents")
          .filter($"doc_id" < 20)
          .select(
            $"doc_id",
            trim(
              regexp_replace(
                regexp_replace(
                  lower($"text"),
                  "\\b(the|a|of|and|to|in|is)\\b",
                  ""
                ),
                "\\s+",
                " "
              )
            ).as("clean")
          )
          .orderBy($"doc_id"),
      Some(
        """SELECT doc_id,
          |  trim(regexp_replace(regexp_replace(lower(text),
          |    '\b(the|a|of|and|to|in|is)\b', '', 'g'), '\s+', ' ', 'g')) AS clean
          |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin
      )
    ),
    // ----- PII redaction ---------------------------------------------------
    // The privacy pass every training pipeline runs before text leaves the
    // lake: emails, SSN-shaped ids, IPv4s, and phone numbers replaced by
    // typed placeholder tokens, with per-doc match counts for the audit
    // trail. The fixture corpus is synthetic word soup with no PII, so the
    // query plants deterministic PII derived from doc_id in BOTH engines
    // (same trick as the derived partsupp) — the redaction regexes then do
    // real work and the hash gate proves Java regex and RE2 agree on this
    // pattern class. Redaction order matters and is fixed: email first
    // (digit-bearing local parts), then SSN, then IP, then phone — the
    // earlier placeholders carry no digits, so later patterns cannot
    // re-match inside them. Counts are measured on the raw planted text
    // with the same patterns, before any replacement.
    // Scale: one codegen'd per-row pass, no shuffle except the final sort.
    Q(
      "q_text_redact",
      (s, dir) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ssn = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
        val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val phone = "\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]?\\d{4}"
        t(s, dir, "documents")
          .filter($"doc_id" < 40)
          .select(
            $"doc_id",
            concat(
              substring($"text", 1, 40),
              lit(" contact user"), $"doc_id".cast("string"),
              lit("@example.com or ops+"), $"doc_id".cast("string"),
              lit("@mail.co call (415) 555-"),
              lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
              lit(" ssn 123-45-"),
              lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
              lit(" from 10.0."), ($"doc_id" % 256).cast("string"),
              lit("."), (($"doc_id" * 7) % 256).cast("string")
            ).as("pii")
          )
          .select(
            $"doc_id",
            regexp_count($"pii", lit(email)).cast("bigint").as("n_email"),
            regexp_count($"pii", lit(ssn)).cast("bigint").as("n_ssn"),
            regexp_count($"pii", lit(ip)).cast("bigint").as("n_ip"),
            regexp_count($"pii", lit(phone)).cast("bigint").as("n_phone"),
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace($"pii", email, "<EMAIL>"),
                  ssn, "<ID>"),
                ip, "<IP>"),
              phone, "<PHONE>").as("clean")
          )
          .orderBy($"doc_id")
      },
      Some(
        """WITH pii AS (
          |  SELECT doc_id,
          |    substring(text, 1, 40)
          |      || ' contact user' || CAST(doc_id AS VARCHAR)
          |      || '@example.com or ops+' || CAST(doc_id AS VARCHAR)
          |      || '@mail.co call (415) 555-'
          |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          |      || ' ssn 123-45-'
          |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          |      || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
          |      || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS pii
          |  FROM documents WHERE doc_id < 40
          |)
          |SELECT doc_id,
          |  CAST(len(regexp_extract_all(pii, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
          |  CAST(len(regexp_extract_all(pii, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn,
          |  CAST(len(regexp_extract_all(pii, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
          |  CAST(len(regexp_extract_all(pii, '\(?\d{3}\)?[-. ]\d{3}[-. ]?\d{4}')) AS BIGINT) AS n_phone,
          |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(pii,
          |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |    '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g'),
          |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
          |    '\(?\d{3}\)?[-. ]\d{3}[-. ]?\d{4}', '<PHONE>', 'g') AS clean
          |FROM pii ORDER BY doc_id""".stripMargin
      )
    ),
    // ----- language-model quality scoring (unigram NLL) --------------------
    // The CCNet-style quality signal: score each document by how
    // surprising its tokens are under a language model — here a unigram
    // model with add-one smoothing fitted on the corpus itself
    // (lp(t) = ln((count(t)+1) / (N+V))), scored as mean negative log
    // likelihood per token. High NLL = rare-token soup (mojibake, spam,
    // boilerplate IDs); low = fluent in-distribution text. Real pipelines
    // swap in a pretrained KenLM; the Spark shape is identical.
    //
    // 100 TB shape: ONE token shuffle feeds tf; the vocab-sized unigram
    // table and the (N, V) scalar broadcast back onto it — the corpus is
    // read once and never reshuffled. Fit and score in the same pass
    // because the model IS an aggregate of the data; a pretrained model
    // would just replace `lp` with a broadcast lookup table.
    Q(
      "q_text_perplexity",
      (s, dir) => unigramNll(t(s, dir, "documents")).orderBy($"doc_id"),
      Some(
        """WITH toks AS (
          |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
          |  FROM documents
          |), tf AS (
          |  SELECT doc_id, term, count(*) AS tf
          |  FROM toks WHERE term <> '' GROUP BY doc_id, term
          |), cnt AS (
          |  SELECT term, sum(tf) AS c FROM tf GROUP BY term
          |), stats AS (
          |  SELECT sum(c) AS n, count(*) AS v FROM cnt
          |), lp AS (
          |  SELECT term, ln((c + 1.0) / (n + v)) AS lp FROM cnt, stats
          |)
          |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
          |       round(-sum(tf * lp) / sum(tf), 6) AS nll
          |FROM tf JOIN lp USING (term)
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin
      )
    ),
    // ----- interpolated bigram LM scoring ----------------------------------
    // The next rung of the LM-quality ladder above q_text_perplexity's
    // unigram: an add-one-smoothed BIGRAM model interpolated with the
    // unigram (p = 0.7*p_bi(cur|prev) + 0.3*p_uni(cur)) — the shape of a
    // real KenLM quality signal, where word ORDER finally matters:
    // shuffled word soup and fluent text share a unigram score but not a
    // bigram one. First token scores under the unigram; per-doc NLL is
    // the mean over all n scored positions.
    //
    // 100 TB shape: one token shuffle (unigram counts) + one bigram-pair
    // shuffle (bigram + context counts); both models broadcast back onto
    // the per-doc pair stream — corpus text is read once, never
    // reshuffled. A pretrained KenLM swaps in as the same broadcast
    // lookup; vocab-squared is the model bound, which is why real models
    // prune — the join shape is unchanged either way.
    Q(
      "q_text_perplexity_bigram",
      (s, dir) => bigramNll(t(s, dir, "documents")).orderBy($"doc_id"),
      Some(
        """WITH toks AS (
          |  SELECT doc_id,
          |         list_filter(regexp_split_to_array(lower(text), '\s+'),
          |                     w -> w <> '') AS ws
          |  FROM documents
          |), uni AS (
          |  SELECT w, count(*) AS c FROM (SELECT unnest(ws) AS w FROM toks)
          |  GROUP BY w
          |), stats AS (
          |  SELECT sum(c) AS n, count(*) AS v FROM uni
          |), pairs AS (
          |  SELECT doc_id, pr.p AS prev, pr.c AS cur FROM (
          |    SELECT doc_id,
          |           unnest([{'p': ws[i], 'c': ws[i+1]}
          |                   for i in range(1, len(ws))]) AS pr
          |    FROM toks)
          |), big AS (
          |  SELECT prev, cur, count(*) AS cb FROM pairs GROUP BY 1, 2
          |), ctx AS (
          |  SELECT prev, sum(cb) AS cc FROM big GROUP BY prev
          |), pair_lp AS (
          |  SELECT doc_id,
          |         ln(0.7 * (cb + 1.0) / (cc + v) +
          |            0.3 * (u.c + 1.0) / (n + v)) AS lp
          |  FROM pairs
          |  JOIN big USING (prev, cur) JOIN ctx USING (prev)
          |  JOIN uni u ON u.w = cur, stats
          |), first_lp AS (
          |  SELECT doc_id, ln((u.c + 1.0) / (n + v)) AS lp
          |  FROM (SELECT doc_id, ws[1] AS w FROM toks WHERE len(ws) >= 1)
          |  JOIN uni u USING (w), stats
          |), all_lp AS (
          |  SELECT doc_id, lp FROM pair_lp UNION ALL
          |  SELECT doc_id, lp FROM first_lp
          |)
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
          |       round(-sum(lp) / count(*), 6) AS nll
          |FROM all_lp GROUP BY doc_id ORDER BY doc_id""".stripMargin
      )
    ),
    // ----- Gopher-style quality filter -------------------------------------
    // The rule-based keep/drop gate (Rae et al. Gopher §A1.1, simplified
    // to the fixture's deterministic subset): minimum length, mean word
    // length envelope, stopword evidence, and single-token repetition —
    // each failure tagged with a reason code so the drop set is auditable
    // (the difference between a curated corpus and a mystery one). All
    // comparisons are integer arithmetic (3n <= sum_len <= 10n instead of
    // a double mean; max_tf * 8 > n instead of a 0.125 ratio), so both
    // engines decide every boundary identically — no float thresholds.
    // One token shuffle (for max_tf); everything else is per-row codegen.
    Q(
      "q_text_gopher",
      (s, dir) => gopherFilter(t(s, dir, "documents")).orderBy($"doc_id"),
      Some(
        """WITH t AS (
          |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws,
          |         CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS sum_len
          |  FROM documents
          |), base AS (
          |  SELECT doc_id, sum_len, CAST(len(ws) AS BIGINT) AS n_tokens,
          |         CAST(len(list_filter(['the','a','of','and','to','in','is'],
          |              sw -> list_contains(ws, sw))) AS BIGINT) AS sw_hits
          |  FROM t
          |), tf AS (
          |  SELECT doc_id, unnest(ws) AS term FROM t
          |), mtf AS (
          |  SELECT doc_id, max(c) AS max_tf FROM (
          |    SELECT doc_id, term, count(*) AS c FROM tf GROUP BY 1, 2) GROUP BY doc_id
          |), scored AS (
          |  SELECT b.doc_id, n_tokens,
          |    concat_ws(',',
          |      CASE WHEN n_tokens < 30 THEN 'short' END,
          |      CASE WHEN NOT (sum_len >= n_tokens*3 AND sum_len <= n_tokens*10) THEN 'word_len' END,
          |      CASE WHEN sw_hits < 2 THEN 'stopwords' END,
          |      CASE WHEN max_tf * 8 > n_tokens THEN 'repetition' END) AS reasons
          |  FROM base b JOIN mtf USING (doc_id)
          |)
          |SELECT doc_id, n_tokens, reasons, reasons = '' AS keep
          |FROM scored ORDER BY doc_id""".stripMargin
      )
    ),
    // ----- modern cleaning recipe: composition gate -------------------------
    // The r13 operators CHAINED the way a production pipeline runs them:
    // corpus-frequency boilerplate removal feeds the Gopher rules, which
    // judge the CLEANED text (a doc that loses its padding lines can now
    // fail `short` — the stages interact, which is exactly what this
    // query gates), then per-language accounting of what survives. All
    // outputs are integers, so the hash gate has no float surface at
    // all. Each stage is the production operator; the oracle replays the
    // whole composition in SQL.
    Q(
      "q_pipeline_recipe",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val cleaned = boilerplateRemoval(docs)
          .select($"doc_id", $"clean_text".as("text"))
        // lang rejoins from the INPUT, not from `cleaned` — a second
        // reference to the uncached cleaned subtree would recompute the
        // whole boilerplate pass (df shuffle + dictionary + HOF filter)
        gopherFilter(cleaned)
          .join(docs.select($"doc_id", $"lang"), Seq("doc_id"))
          .filter($"keep")
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum($"n_tokens").cast("bigint").as("total_tokens")
          )
          .orderBy($"lang")
      },
      Some(
        """WITH toks AS (
          |  SELECT doc_id, lang, regexp_split_to_array(lower(text), '\s+') AS ws
          |  FROM documents
          |), lists AS (
          |  SELECT doc_id, lang,
          |         [array_to_string(ws[i*5+1 : i*5+5], ' ')
          |          for i in range(0, (len(ws)-1)//5 + 1)] AS lines
          |  FROM toks WHERE len(ws) >= 1
          |), flat AS (
          |  SELECT doc_id, lang, unnest(lines) AS line,
          |         CAST(generate_subscripts(lines, 1) - 1 AS BIGINT) AS idx
          |  FROM lists
          |), df AS (
          |  SELECT line, count(DISTINCT doc_id) AS d FROM flat GROUP BY line
          |), cleaned AS (
          |  SELECT f.doc_id, f.lang,
          |         coalesce(string_agg(CASE WHEN d < 3 THEN f.line END, ' '
          |                             ORDER BY idx), '') AS text
          |  FROM flat f JOIN df ON f.line = df.line
          |  GROUP BY f.doc_id, f.lang
          |), g AS (
          |  SELECT doc_id, lang,
          |         regexp_split_to_array(lower(text), '\s+') AS ws,
          |         CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS sum_len
          |  FROM cleaned
          |), base AS (
          |  SELECT doc_id, lang, sum_len, CAST(len(ws) AS BIGINT) AS n_tokens,
          |         CAST(len(list_filter(['the','a','of','and','to','in','is'],
          |              sw -> list_contains(ws, sw))) AS BIGINT) AS sw_hits
          |  FROM g
          |), terms AS (
          |  SELECT doc_id, unnest(ws) AS term FROM g
          |), mtf AS (
          |  SELECT doc_id, max(c) AS max_tf FROM (
          |    SELECT doc_id, term, count(*) AS c
          |    FROM terms GROUP BY doc_id, term) GROUP BY doc_id
          |), kept AS (
          |  SELECT b.lang, n_tokens
          |  FROM base b JOIN mtf USING (doc_id)
          |  WHERE n_tokens >= 30
          |    AND sum_len >= n_tokens*3 AND sum_len <= n_tokens*10
          |    AND sw_hits >= 2
          |    AND max_tf * 8 <= n_tokens
          |)
          |SELECT lang, count(*) AS n_docs,
          |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
          |FROM kept GROUP BY lang ORDER BY lang""".stripMargin
      )
    ),
    // ----- trained quality-classifier scoring -------------------------------
    // The DCLM/FineWeb-edu filtering approach: a logistic-regression
    // classifier fitted to separate a reference slice (here the en docs —
    // a real run points this at Wikipedia/textbooks) from the raw crawl,
    // then every document scored P(target | hashed-ngram features). The
    // fit is deterministic full-batch GD (operators/QualityClassifier);
    // the DYNAMIC oracle embeds the fitted weights and independently
    // re-derives features + sigmoid scoring in DuckDB, so the gate proves
    // the SCORING math end-to-end while the fit's convergence is
    // spec-pinned (loss decreases, target/non-target separation).
    //
    // 100 TB shape: one gram shuffle featurizes into a slim cached frame;
    // each GD iteration scans that frame twice and syncs B+2 doubles to
    // the driver (treeAggregate pattern); scoring is a per-row fold over
    // literal weights. At real scale the fit runs on a hash-sample and
    // only scoring touches the full corpus.
    Q(
      "q_text_quality_classifier",
      (s, dir) => {
        val nBuckets = 64
        val feat = graft.engine.PersistScope.pinEager(
          graft.operators.QualityClassifier.featurize(
            t(s, dir, "documents"), ($"lang" === "en"), nBuckets))
        val model = graft.operators.QualityClassifier
          .fit(feat, nBuckets, iters = 20, step = 1.0)
        qcOracle.set(Some(qcOracleSql(model.weights, nBuckets)))
        graft.operators.QualityClassifier
          .scoreFeaturized(feat, model)
          .orderBy($"doc_id")
      },
      None,
      oracleFn = Some(() => qcOracle.get())
    ),
    // ----- corpus-frequency boilerplate removal -----------------------------
    // The CCNet/RefinedWeb line-level pass that q_dedup_paragraph does NOT
    // cover: a line occurring in >= K DISTINCT documents is boilerplate
    // (nav bars, cookie banners, license footers) and is removed from
    // EVERY document — including the first occurrence, which is what
    // separates this from first-wins dedup. "Line" = the same fixed
    // 5-token chunk arithmetic as the paragraph pass (the fixture has no
    // newlines); on real text the split-on-newline tokenizer is the only
    // change. K=3 on this corpus flags ~35 of ~5.3k lines — a selective
    // dictionary, not a wipe.
    //
    // 100 TB shape: document text NEVER shuffles. The df count shuffles
    // only md5 digests (with map-side partial agg); the resulting
    // boilerplate dictionary is tiny BY CONSTRUCTION (df >= K lines are
    // the repeated few) and broadcasts back as one collected set, so the
    // removal is a per-row codegen'd HOF filter over each doc's own
    // lines — no explode/reassemble round trip, no second shuffle.
    Q(
      "q_text_boilerplate",
      (s, dir) => boilerplateRemoval(t(s, dir, "documents")).orderBy($"doc_id"),
      Some(
        """WITH toks AS (
          |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws
          |  FROM documents
          |), lists AS (
          |  SELECT doc_id,
          |         [array_to_string(ws[i*5+1 : i*5+5], ' ')
          |          for i in range(0, (len(ws)-1)//5 + 1)] AS lines
          |  FROM toks WHERE len(ws) >= 1
          |), flat AS (
          |  SELECT doc_id, unnest(lines) AS line,
          |         CAST(generate_subscripts(lines, 1) - 1 AS BIGINT) AS idx
          |  FROM lists
          |), df AS (
          |  SELECT line, count(DISTINCT doc_id) AS d FROM flat GROUP BY line
          |)
          |SELECT f.doc_id,
          |  CAST(count(*) AS BIGINT) AS n_lines,
          |  CAST(sum(CASE WHEN d < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          |  coalesce(string_agg(CASE WHEN d < 3 THEN f.line END, ' '
          |                      ORDER BY idx), '') AS clean_text
          |FROM flat f JOIN df ON f.line = df.line
          |GROUP BY f.doc_id ORDER BY f.doc_id""".stripMargin
      )
    ),
    // PER-SOURCE (domain) REPUTATION — the RefinedWeb/C4 filtering axis
    // the per-document passes miss: a crawl is curated by DOMAIN, not
    // just by document (a URL blocklist plus kill rules for domains
    // whose aggregate stats are pathological — mostly-duplicated or
    // mostly-trivial content). Signals here: exact-dup docs (shared
    // sha256 across the corpus; the fixture has none naturally, so a
    // canned landing page is planted on doc_id % 25 == 0 — both engines
    // replay the plant) and short docs; verdicts with integer-arithmetic
    // thresholds (5*n_dup >= n_docs, i.e. >= 20% duplicated;
    // 5*n_short >= 2*n_docs, i.e. >= 40% trivial) so no FP boundary can
    // disagree across engines. The static blocklist wins over stats.
    //
    // 100 TB shape: per-doc rows carry (source, digest, n_tokens) —
    // never text; the digest df groupBy and the per-source rollup are
    // the only shuffles, and the verdict table is domains-sized — it
    // BROADCASTS back onto the corpus for the actual kill join in a
    // full pipeline (the q_pipeline_recipe composition pattern).
    Q(
      "q_pipeline_source_quality",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(
            $"source", $"doc_id",
            when($"doc_id" % 25 === 0,
              lit("duplicated boilerplate landing page text"))
              .otherwise($"text").as("text"))
        val perDoc = docs.select(
          $"source",
          sha2($"text", 256).as("h"),
          size(TextOps.tokens($"text")).cast("bigint").as("n_tokens"))
        val hashCounts = perDoc.groupBy($"h").agg(count(lit(1)).as("hc"))
        val flagged = perDoc
          .join(hashCounts, Seq("h"))
          .select(
            $"source", $"n_tokens",
            ($"hc" > 1).cast("int").as("is_dup"),
            ($"n_tokens" < 40).cast("int").as("is_short"))
        val blocklist = Seq("src3", "src17")
        flagged
          .groupBy($"source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum($"is_dup").cast("bigint").as("n_dup"),
            sum($"is_short").cast("bigint").as("n_short"),
            round(avg($"n_tokens"), 6).as("avg_tokens"))
          .withColumn("verdict",
            when($"source".isin(blocklist: _*), lit("blocked"))
              .when($"n_dup" * 5 >= $"n_docs" ||
                $"n_short" * 5 >= $"n_docs" * 2, lit("low"))
              .otherwise(lit("ok")))
          .orderBy($"source")
      },
      Some(
        """WITH docs AS (
          |  SELECT source, doc_id,
          |         CASE WHEN doc_id % 25 = 0
          |              THEN 'duplicated boilerplate landing page text'
          |              ELSE text END AS text
          |  FROM documents
          |), d AS (
          |  SELECT source, sha256(text) AS h,
          |         CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
          |           AS n_tokens
          |  FROM docs
          |), hc AS (
          |  SELECT h, count(*) AS c FROM d GROUP BY h
          |), f AS (
          |  SELECT d.source, d.n_tokens,
          |         CASE WHEN hc.c > 1 THEN 1 ELSE 0 END AS is_dup,
          |         CASE WHEN d.n_tokens < 40 THEN 1 ELSE 0 END AS is_short
          |  FROM d JOIN hc USING (h)
          |), ps AS (
          |  SELECT source, count(*) AS n_docs,
          |         CAST(sum(is_dup) AS BIGINT) AS n_dup,
          |         CAST(sum(is_short) AS BIGINT) AS n_short,
          |         round(avg(n_tokens), 6) AS avg_tokens
          |  FROM f GROUP BY source
          |)
          |SELECT source, n_docs, n_dup, n_short, avg_tokens,
          |  CASE WHEN source IN ('src3', 'src17') THEN 'blocked'
          |       WHEN n_dup * 5 >= n_docs OR n_short * 5 >= n_docs * 2
          |         THEN 'low'
          |       ELSE 'ok' END AS verdict
          |FROM ps ORDER BY source""".stripMargin
      )
    )
  )

  // NOTE: defs below `all` (object-init order: a val here would be null
  // while `all` initializes).

  /** Per-doc BM25 (k1=1.2, b=0.75) for a fixed term set — shared by the
    * ranking query and the hybrid-search fusion. One token shuffle feeds
    * tf/dl/df; df and corpus stats broadcast back onto the scores.
    */
  /** Global top-k of `scored` under (scoreCol desc, doc_id asc) with
    * 1-based ranks — WITHOUT a window. The top-k plans as
    * TakeOrderedAndProject (per-partition top-k, one bounded K-row
    * merge); each survivor's rank is then 1 + the number of
    * strictly-better survivors, from a broadcast self-join over the K
    * rows (K^2 comparisons on K<=100 rows — constant work at any corpus
    * size). Equivalent to row_number() because (round-6 score, doc_id)
    * is a strict total order; unlike row_number over an empty partition
    * spec, it never moves the corpus to one partition. pinEager: the
    * K-row top list feeds both self-join sides.
    */
  private def rankTopK(
      scored: org.apache.spark.sql.DataFrame,
      scoreCol: String,
      k: Int,
      rankCol: String
  ): org.apache.spark.sql.DataFrame = {
    val top = graft.engine.PersistScope.pinEager(
      scored.orderBy(col(scoreCol).desc, $"doc_id").limit(k)
    )
    val better = top.select(col(scoreCol).as("s2"), $"doc_id".as("d2"))
    top
      .join(
        broadcast(better),
        col("s2") > col(scoreCol) ||
          (col("s2") === col(scoreCol) && $"d2" < $"doc_id"),
        "left"
      )
      .groupBy($"doc_id", col(scoreCol))
      .agg((count($"d2") + 1).as(rankCol))
  }

  def bm25Scores(
      s: org.apache.spark.sql.SparkSession,
      dir: String,
      query: Seq[String]
  ): org.apache.spark.sql.DataFrame =
    bm25Scores(t(s, dir, "documents"), query)

  /** BM25 over an arbitrary documents frame — the overload ScaleProbe's
    * text-family probe drives, so the probe times EXACTLY the production
    * scoring pipeline (same no-drift rationale as DedupQueries
    * .minhashPairs).
    */
  def bm25Scores(
      docs: org.apache.spark.sql.DataFrame,
      query: Seq[String]
  ): org.apache.spark.sql.DataFrame = {
    val toks = docs
      .select($"doc_id", explode(TextOps.tokens($"text")).as("term"))
      .filter($"term" =!= "")
    val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy($"doc_id").agg(count(lit(1)).as("dlen"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val stats = docs
      .agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg((sum($"dlen").cast("double") / count(lit(1))).as("avgdl")))
    val idf = log(($"n" - $"df" + 0.5) / ($"df" + 0.5) + 1.0)
    val termScore = idf * ($"tf" * 2.2) /
      ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dlen" / $"avgdl"))
    tf.filter($"term".isin(query: _*))
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .groupBy($"doc_id")
      .agg(round(sum(termScore), 6).as("bm25"))
  }

  /** Corpus-frequency boilerplate removal over an arbitrary documents
    * frame — the overload ScaleProbe's text probe drives, so the probe
    * times EXACTLY the production pipeline. Lines occurring in >= minDf
    * DISTINCT docs die everywhere; df counts shuffle md5 digests only,
    * the dictionary collapses to one collect_list row and broadcasts,
    * removal is a per-row HOF filter — document text never shuffles.
    */
  private[graft] def boilerplateRemoval(
      raw: org.apache.spark.sql.DataFrame,
      lineLen: Int = 5,
      minDf: Int = 3
  ): org.apache.spark.sql.DataFrame = {
    val docs = raw
      .select($"doc_id", TextOps.tokens($"text").as("ws"))
      .filter(size($"ws") >= 1)
      .select(
        $"doc_id",
        transform(
          sequence(lit(0), expr(s"(size(ws) - 1) div $lineLen")),
          i => concat_ws(" ", slice($"ws", i * lineLen + 1, lit(lineLen)))
        ).as("lines")
      )
    // digests-only df count; the dictionary collapses to ONE tiny row
    val boiler = docs
      .select($"doc_id", explode($"lines").as("line"))
      .groupBy(md5($"line").as("h"))
      .agg(count_distinct($"doc_id").as("df"))
      .filter($"df" >= minDf)
      .agg(collect_list($"h").as("bset"))
    docs
      .crossJoin(broadcast(boiler))
      .select(
        $"doc_id",
        size($"lines").cast("bigint").as("n_lines"),
        filter($"lines", l => !array_contains($"bset", md5(l))).as("kept")
      )
      .select(
        $"doc_id",
        $"n_lines",
        size($"kept").cast("bigint").as("n_kept"),
        array_join($"kept", " ").as("clean_text")
      )
  }

  /** Interpolated bigram-LM NLL over an arbitrary documents frame (the
    * q_text_perplexity_bigram engine; see the Q for the full contract).
    * Two model shuffles (unigram, bigram+context), models joined back
    * onto the per-doc pair stream, one scoring groupBy.
    *
    * The unigram and context tables are VOCAB-sized and always
    * broadcast. The bigram table is vocab-SQUARED-bounded and sparse —
    * on real text it is a prunable few-hundred-MB model, but on a
    * high-entropy corpus nearly every adjacent pair is distinct and the
    * table scales with the corpus itself: the r13 probe's 64k-vocab
    * corpus built a ~30M-row bigram table at 600k docs and OOM'd the
    * broadcast. Same resolution as decontamination's benchmark grams:
    * a measured cutover — the (pinned, slim) bigram model is counted,
    * and past `maxBroadcastBigrams` the scoring join runs as a shuffle
    * join on (prev, cur) instead of refusing or dying.
    */
  private[graft] def bigramNll(
      docs: org.apache.spark.sql.DataFrame,
      maxBroadcastBigrams: Long = 2000000L): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(
      $"doc_id",
      filter(TextOps.tokens($"text"), w => w =!= "").as("ws"))
    // pinEager: the unigram model feeds stats, the pair scoring, AND
    // the first-token scoring — unpinned, the corpus-wide token
    // explode+shuffle would recompute once per consumer (the same 3x
    // defect the r13 probe measured on DSIR's unpinned tf). Vocab-sized.
    val uni = graft.engine.PersistScope.pinEager(toks
      .select(explode($"ws").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c")))
    val stats = uni.agg(sum($"c").as("n"), count(lit(1)).as("v"))
    // docs with a single token produce no pairs (sequence(1,0) would
    // DESCEND, not empty out — hence the size guard, same as gramsOf)
    val pairs = toks
      .filter(size($"ws") >= 2)
      .select(
        $"doc_id",
        explode(transform(
          sequence(lit(1), size($"ws") - 1),
          i => struct(
            element_at($"ws", i).as("prev"),
            element_at($"ws", i + 1).as("cur"))
        )).as("pr"))
      .select($"doc_id", $"pr.prev".as("prev"), $"pr.cur".as("cur"))
    // pinEager: the bigram model feeds the cutover count, the context
    // aggregation, AND the scoring join — unpinned it would recompute
    // the pair shuffle per consumer
    val big = graft.engine.PersistScope.pinEager(
      pairs.groupBy($"prev", $"cur").agg(count(lit(1)).as("cb")))
    val bigSide =
      if (big.count() <= maxBroadcastBigrams) broadcast(big) else big
    val ctx = big.groupBy($"prev").agg(sum($"cb").as("cc"))
    val pairLp = pairs
      .join(bigSide, Seq("prev", "cur"))
      .join(broadcast(ctx), Seq("prev"))
      .join(broadcast(uni.withColumnRenamed("w", "cur")), Seq("cur"))
      .crossJoin(broadcast(stats))
      .select(
        $"doc_id",
        log(lit(0.7) * ($"cb" + 1.0) / ($"cc" + $"v") +
          lit(0.3) * ($"c" + 1.0) / ($"n" + $"v")).as("lp"))
    val firstLp = toks
      .filter(size($"ws") >= 1)
      .select($"doc_id", element_at($"ws", 1).as("w"))
      .join(broadcast(uni), Seq("w"))
      .crossJoin(broadcast(stats))
      .select($"doc_id", log(($"c" + 1.0) / ($"n" + $"v")).as("lp"))
    pairLp
      .unionByName(firstLp)
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).cast("bigint").as("n_tokens"),
        round(-sum($"lp") / count(lit(1)), 6).as("nll"))
  }

  /** Unigram-NLL quality scores over an arbitrary documents frame — the
    * overload ScaleProbe's text probe drives, so the probe times EXACTLY
    * the production scoring pipeline. One token shuffle feeds tf; the
    * vocab-sized unigram table and the (N, V) scalar broadcast back.
    */
  private[graft] def unigramNll(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = docs
      .select($"doc_id", explode(TextOps.tokens($"text")).as("term"))
      .filter($"term" =!= "")
    val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val cnt = tf.groupBy($"term").agg(sum($"tf").as("c"))
    val stats = cnt.agg(sum($"c").as("n"), count(lit(1)).as("v"))
    val lp = cnt
      .crossJoin(broadcast(stats))
      .select($"term", log(($"c" + 1.0) / ($"n" + $"v")).as("lp"))
    tf.join(broadcast(lp), Seq("term"))
      .groupBy($"doc_id")
      .agg(
        sum($"tf").cast("bigint").as("n_tokens"),
        round(-sum($"tf" * $"lp") / sum($"tf"), 6).as("nll")
      )
  }

  /** Fit the add-one-smoothed unigram model on a TRAINING corpus and
    * return (model, oovLp): the (term, lp) table plus the log-prob an
    * unseen token scores (ln(1/(N+V)) — the same smoothing mass the
    * fitted terms' +1 comes from). This is the production split of
    * [[unigramNll]]: fit once offline, broadcast the vocab-sized model,
    * score anything — including streams — without touching the training
    * corpus again.
    */
  private[graft] def fitUnigramModel(
      docs: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, Double) = {
    val toks = docs
      .select($"doc_id", explode(TextOps.tokens($"text")).as("term"))
      .filter($"term" =!= "")
    val cnt = toks.groupBy($"term").agg(count(lit(1)).as("c"))
    val (n, v) = {
      val r = cnt.agg(sum($"c"), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    val model = cnt.select($"term",
      log(($"c" + 1.0) / lit((n + v).toDouble)).as("lp"))
    (model, math.log(1.0 / (n + v)))
  }

  /** Score documents under a PRE-FITTED unigram model (left join +
    * `oovLp` for unseen tokens) — mean negative log-likelihood per
    * token, like [[unigramNll]], but against a frozen model so new
    * corpora (or arriving micro-batches) score without refitting. The
    * model is vocab-sized and broadcasts; one token shuffle per scored
    * corpus.
    */
  private[graft] def scoreNll(
      docs: org.apache.spark.sql.DataFrame,
      model: org.apache.spark.sql.DataFrame,
      oovLp: Double): org.apache.spark.sql.DataFrame = {
    val tf = docs
      .select($"doc_id", explode(TextOps.tokens($"text")).as("term"))
      .filter($"term" =!= "")
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    tf.join(broadcast(model), Seq("term"), "left")
      .withColumn("lp", coalesce($"lp", lit(oovLp)))
      .groupBy($"doc_id")
      .agg(
        sum($"tf").cast("bigint").as("n_tokens"),
        round(-sum($"tf" * $"lp") / sum($"tf"), 6).as("nll")
      )
  }

  /** Gopher-rules keep/drop over an arbitrary documents frame (see
    * `q_text_gopher` for the rule rationale) — integer-arithmetic
    * boundaries, fully per-row: since the native [[graft.functions
    * .MaxTokenFreq]] expression landed, even the repetition rule needs
    * no token shuffle (the earlier explode + two-level groupBy shape is
    * gone), so the whole filter is ONE codegen'd pass over the corpus —
    * and the batch operator and the streaming screen
    * ([[graft.streaming.CorpusStream.qualityScreen]]) are literally the
    * same computation.
    */
  private[graft] def gopherFilter(
      docs0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val docs = docs0
      .select(
        $"doc_id",
        TextOps.tokens($"text").as("ws"),
        length(regexp_replace($"text", "\\s", ""))
          .cast("bigint").as("sum_len"))
    docs.select(
      $"doc_id",
      $"sum_len",
      size($"ws").cast("bigint").as("n_tokens"),
      expr("size(filter(array('the','a','of','and','to','in','is'), " +
        "sw -> array_contains(ws, sw)))").cast("bigint").as("sw_hits"),
      graft.functions.Functions.maxTokenFreq($"ws").as("max_tf"))
      .select(
        $"doc_id",
        $"n_tokens",
        concat_ws(",",
          when($"n_tokens" < 30, "short"),
          when(!($"sum_len" >= $"n_tokens" * 3 &&
            $"sum_len" <= $"n_tokens" * 10), "word_len"),
          when($"sw_hits" < 2, "stopwords"),
          when($"max_tf" * 8 > $"n_tokens", "repetition")
        ).as("reasons"))
      .withColumn("keep", $"reasons" === "")
  }

  /** Per-doc top-k TF-IDF terms over an arbitrary documents frame —
    * shared by `q_text_tfidf` (which adds its demo doc_id filter and
    * presentation order) and ScaleProbe's text-family probe. One token
    * shuffle feeds tf + df; the vocab-sized df table and the N scalar
    * broadcast back onto the per-(doc, term) scores; ranking windows are
    * per-doc partitions, never global.
    */
  private[graft] def tfidfTopTerms(
      docs: org.apache.spark.sql.DataFrame,
      k: Int
  ): org.apache.spark.sql.DataFrame = {
    val toks = docs
      .select($"doc_id", explode(TextOps.tokens($"text")).as("term"))
      .filter($"term" =!= "")
    val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy($"term").agg(countDistinct($"doc_id").as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id")
      .orderBy($"tfidf".desc, $"term")
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(n))
      .select(
        $"doc_id",
        $"term",
        $"tf",
        round($"tf" * log($"n_docs" * lit(1.0) / $"df"), 6).as("tfidf")
      )
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"doc_id", $"term", $"tf", $"tfidf")
  }

  /** Benchmark-decontamination counts over an arbitrary documents frame —
    * shared by `q_decontaminate` and ScaleProbe's text-family probe. Only
    * the BENCHMARK grams are pinned (they are read by the broadcast
    * build); the corpus grams STREAM unpinned through the broadcast join
    * into the per-doc partial agg. Pinning the full exploded gram table
    * instead (the probe's first instinct) is a scale bug this probe
    * caught at 100x: 2M docs explode to ~86M gram rows (~10 GB of cache)
    * which starves execution memory — tokenizing the corpus twice is
    * free by comparison, and here the corpus side is consumed exactly
    * once anyway.
    *
    * `isBench` selects the benchmark slice — deliberately REQUIRED, no
    * default: the broadcast strategy assumes that slice is
    * EVAL-SUITE-SIZED AND FIXED, never growing with the corpus, and a
    * default would bake one choice invisibly into every new caller. The
    * text-family probe proved the hazard the hard way: a proportional
    * (doc_id % 20) benchmark at 2M docs built a ~1 GB gram broadcast and
    * OOM'd executors, while a fixed eval-suite-sized benchmark stays a
    * few MB at any corpus size.
    *
    * A benchmark that DOES outgrow broadcast no longer refuses: the
    * operator measures the materialized bench gram count (the eager
    * cache fill it already pays for self-join safety doubles as the
    * probe) and past `maxBroadcastGramRows` switches to a SHUFFLE HASH
    * join on the gram — both sides exchange on `g`, the bench side
    * stays the per-partition build. Same rows either way; the broadcast
    * plan is strictly better while the bench fits, which is why it
    * remains the default and the cutover is by measurement, not hope.
    * Pass 0 to force the shuffle plan (probe/spec hook).
    */
  private[graft] def contaminationCounts(
      doc: org.apache.spark.sql.DataFrame,
      isBench: org.apache.spark.sql.Column,
      // ~4M gram rows ≈ low tens of MB broadcast — safely inside a
      // default 8 GB executor while leaving headroom for the hash table
      maxBroadcastGramRows: Long = 4L << 20
  ): org.apache.spark.sql.DataFrame = {
    def grams(d: org.apache.spark.sql.DataFrame) =
      d.select($"doc_id", TextOps.tokens($"text").as("ws"))
        .filter(size($"ws") >= 8)
        .select($"doc_id", explode(TextOps.shingles($"ws", 8)).as("g"))
    val bench = graft.engine.PersistScope.pin(
      grams(doc.filter(isBench)).select($"doc_id".as("bench_id"), $"g")
    )
    // eager fill (a lazily-shared cache would be raced by the join) AND
    // the strategy probe in one action
    val benchGramRows = bench.count()
    val corpus = grams(doc.filter(!isBench))
    val joined =
      if (benchGramRows <= maxBroadcastGramRows)
        corpus.join(broadcast(bench), Seq("g"))
      else
        // over-broadcast benchmark: shuffle both sides on the gram; the
        // hint keeps the (still smaller) bench side as the hash build so
        // the corpus side is never sorted
        corpus.join(bench.hint("shuffle_hash"), Seq("g"))
    joined
      .groupBy($"doc_id")
      .agg(
        countDistinct($"bench_id").as("n_bench_docs"),
        countDistinct($"g").as("n_shared_grams")
      )
      .orderBy($"doc_id")
  }

  /** The BM25 CTE chain shared by both oracle texts. */
  def bm25OracleCtes(termsSql: String): String =
    s"""toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM toks
       |  WHERE term <> '' GROUP BY doc_id, term
       |), dl AS (
       |  SELECT doc_id, count(*) AS dlen FROM toks WHERE term <> '' GROUP BY doc_id
       |), stats AS (
       |  SELECT (SELECT count(*) FROM documents) AS n,
       |         (SELECT CAST(sum(dlen) AS DOUBLE) / count(*) FROM dl) AS avgdl
       |), dfreq AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY term
       |), bm AS (
       |  SELECT tf.doc_id,
       |         round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
       |             (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl.dlen / avgdl))), 6) AS bm25
       |  FROM tf JOIN dfreq USING (term) JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats
       |  WHERE term IN ($termsSql)
       |  GROUP BY tf.doc_id
       |)""".stripMargin
}
