package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.PersistScope
import graft.operators.TextOps
import QueryUtil._

/** Deduplication operators over the `documents` / `embeddings` fixtures
  * (SURVEY.md §2.C; BASELINE north star). Four families:
  *
  *  - exact:       content-hash groupBy (one shuffle of (hash, id) pairs)
  *  - exact-sim:   inverted-index word-shingle Jaccard (join on shingle —
  *                 NEVER a cartesian product)
  *  - probabilistic: MinHash-LSH banding (candidates only from shared
  *                 band digests, then exact Jaccard verification)
  *  - embedding:   blocked cosine near-dup using the native codegen'd
  *                 cosine_sim expression
  *
  * 100 TB notes per operator inline. The planted fixture truth: 25 doc
  * pairs with shingle-Jaccard >= 0.8 and none in (0.2, 0.8), so threshold
  * 0.5 separates cleanly and LSH recall at 16x4 banding is ~1-4e-8.
  */
object DedupQueries {

  /** Per-doc distinct word-3gram shingle sets (canonical form shared with
    * the stored index — [[graft.operators.MinHashIndex.shingleSets]]).
    */
  private def shingleSets(doc: DataFrame): DataFrame =
    graft.operators.MinHashIndex.shingleSets(doc)

  /** (doc_id, distinct word-3gram shingle) pairs — the inverted-index rows. */
  private def shingleRows(doc: DataFrame): DataFrame =
    shingleSets(doc).select($"doc_id", explode($"sh").as("s"))

  /** Stop-shingle document-frequency cap for the exact Jaccard operator.
    * A shingle appearing in D docs contributes D*(D-1)/2 intermediate pairs
    * to the inverted-index self-join, so one boilerplate shingle in 1M docs
    * means 5e11 pairs. Dropping shingles with df > cap (the classic
    * stop-shingle cut) bounds every shingle's contribution to
    * cap^2/2 pairs. Shingles that common carry ~zero similarity signal
    * anyway — they are corpus boilerplate, exactly what IDF down-weights
    * to nothing. The fixture's max df is 25 (sf0.1), far below the cap,
    * so the cut is a no-op on every oracle hash while removing the
    * quadratic blowup at scale (hotShingleProbe in ScaleProbe measures it).
    */
  val JaccardDfCap = 1000

  /** Exact shingle-Jaccard pairs >= minJ via inverted-index join: join docs
    * that SHARE a shingle (grouped to intersection counts), then Jaccard
    * from the per-doc set sizes. Jaccard is computed over the NON-STOP
    * shingle sets: shingles in more than dfCap docs are cut from the index
    * (sizes and intersections alike) before the self-join, so no single
    * hot shingle can contribute more than dfCap^2/2 pairs. The MinHash
    * path below is still the first-pass scale answer; this capped exact
    * operator is the verification/oracle layer you run on candidates or
    * samples — now safe to run even when the corpus has boilerplate.
    */
  private[graft] def jaccardPairs(
      doc: DataFrame,
      minJ: Double,
      dfCap: Int = JaccardDfCap
  ): DataFrame = {
    // the inverted index feeds the df aggregation and (filtered) the
    // self-join (both sides) and the size table — pinEager runs the
    // shingle explosion exactly once before the join (see
    // PersistScope.pinEager for the self-join race this avoids)
    val exAll = PersistScope.pinEager(shingleRows(doc))
    // stop-shingle cut BEFORE the self-join. The stop list holds only
    // shingles hotter than the cap — tiny by construction (bounded by
    // corpus_shingles/dfCap) — so it broadcasts and the anti-join adds
    // no shuffle of the inverted index itself.
    val stop = exAll
      .groupBy($"s")
      .agg(count(lit(1)).as("df"))
      .filter($"df" > dfCap)
      .select($"s")
    val ex = PersistScope.pinEager(exAll.join(broadcast(stop), Seq("s"), "left_anti"))
    val sizes = ex.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = ex
      .as("a")
      .join(ex.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("sa"), $"doc_a" === col("sa.doc_id"))
      .join(sizes.as("sb"), $"doc_b" === col("sb.doc_id"))
      .select(
        $"doc_a",
        $"doc_b",
        round($"i" * lit(1.0) / (col("sa.n") + col("sb.n") - $"i"), 6).as("jaccard")
      )
      .filter($"jaccard" >= minJ)
  }

  /** DuckDB mirror of `shingleSets`: lowercase, split on \s+, distinct
    * word 3-grams — the CTE fragment every shingle-based oracle shares
    * (emits `toks` and `sh(doc_id, shingles)`).
    *
    * `\s+` is NOT the same class in both engines — Java's includes \x0B
    * (vertical tab), RE2's does not. The mirror is exact only because the
    * fixture's whitespace is plain spaces, which DedupSpec's
    * fixture-envelope test asserts so a future fixture regeneration that
    * violates it fails loudly in CI, not as a silent oracle divergence.
    */
  private def shingleCteSql: String =
    """toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws FROM documents
      |), sh AS (
      |  SELECT doc_id, list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                                for i in range(1, len(ws)-1)]) AS shingles
      |  FROM toks WHERE len(ws) >= 3
      |)""".stripMargin

  /** The `ex` inverted-index CTE chain (appended after [[shingleCteSql]]):
    * with a cap, mirrors the stop-shingle cut of [[jaccardPairs]] (df
    * computed on the raw index, hot shingles dropped before anything
    * downstream); without, the raw index (for the MinHash oracle, whose
    * Spark side verifies candidates against FULL shingle sets).
    */
  private def exCteSql(dfCap: Option[Int]): String = dfCap match {
    case Some(cap) =>
      s"""ex0 AS (
        |  SELECT doc_id, unnest(shingles) AS s FROM sh
        |), dfs AS (SELECT s, count(*) AS df FROM ex0 GROUP BY s),
        |ex AS (SELECT e.doc_id, e.s FROM ex0 e JOIN dfs USING (s) WHERE dfs.df <= $cap)""".stripMargin
    case None =>
      """ex AS (
        |  SELECT doc_id, unnest(shingles) AS s FROM sh
        |)""".stripMargin
  }

  private def jaccardOracle(dfCap: Option[Int]): String =
    s"""WITH $shingleCteSql, ${exCteSql(dfCap)}, sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT doc_a, doc_b,
      |       round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = doc_a
      |JOIN sizes sb ON sb.doc_id = doc_b
      |WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** DuckDB mirror of `q_dedup_simhash`, bit for bit:
    *  - per-token hash: the padded Karp-Rabin fold (same algebra as
    *    QueryUtil.fingerprintOracleCte — HUGEINT modular folds, base 257
    *    mod 2^61-1; `TextOps.SimhashPad` concatenated exactly like the
    *    engine side so short tokens fill all 61 bits);
    *  - votes: one (doc, bit) row per bit via a range() cross join instead
    *    of 61 SUM columns — same sums, tractable SQL text;
    *  - fingerprint: majority sign per bit reassembled with shifts;
    *  - banding: 4 x 15-bit chunks, pairs sharing any chunk;
    *  - verify: exact Hamming (bit_count of xor) <= 6.
    * Every operation is integer-exact, so the hash gate proves the whole
    * pipeline, not just row counts.
    *
    * The per-token fold runs over UTF-8 OCTETS (QueryUtil.utf8OctetsSql,
    * round 9) exactly like the engine's RollingFingerprint, so the
    * bit-for-bit claim holds for non-ASCII tokens too. The one REMAINING
    * fixture assumption (pinned by DedupSpec's envelope test): Java's
    * `\s` includes \x0B where RE2's does not — irrelevant only while the
    * corpus' whitespace is plain spaces.
    */
  private def simhashOracle: String = {
    val fold = "list_reduce(list_prepend(CAST(0 AS HUGEINT), codes), " +
      "(a, b) -> (a * 257 + b) % 2305843009213693951)"
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
      |  FROM documents
      |), padded AS (
      |  SELECT doc_id, w || '${TextOps.SimhashPad}' AS pw FROM toks
      |), codes AS (
      |  SELECT doc_id, ${QueryUtil.utf8OctetsSql("pw")} AS codes
      |  FROM padded
      |), th AS (
      |  SELECT doc_id, CAST($fold AS BIGINT) AS h FROM codes
      |), votes AS (
      |  SELECT doc_id, i AS bit,
      |         SUM(CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END) AS v
      |  FROM th, range(0, ${TextOps.SimhashBits}) t(i)
      |  GROUP BY doc_id, i
      |), fp AS (
      |  SELECT doc_id,
      |         CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << bit
      |                       ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
      |  FROM votes GROUP BY doc_id
      |), chunks AS (
      |  SELECT doc_id, simhash, c AS chunk, (simhash >> (c * 15)) & 32767 AS bits
      |  FROM fp, range(0, 4) t(c)
      |)
      |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
      |FROM chunks x JOIN chunks y
      |  ON x.chunk = y.chunk AND x.bits = y.bits AND x.doc_id < y.doc_id
      |WHERE bit_count(xor(x.simhash, y.simhash)) <= 6
      |ORDER BY doc_a, doc_b""".stripMargin
  }

  val all: Seq[Q] = Seq(
    // ----- exact dedup: content-hash keeper selection ----------------------
    // groupBy(sha2) ships 32-byte hashes + ids through the shuffle, never
    // the document bodies; min() is a map-side partial agg. At this sf all
    // texts are distinct, so every doc is its own keeper (n_copies = 1) —
    // the oracle still verifies hashing + grouping + keeper choice.
    Q(
      "q_dedup_exact",
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(sha2($"text", 256).as("content_hash"))
          .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
          .select($"keeper_id", $"content_hash", $"n_copies")
          .orderBy($"keeper_id"),
      Some(
        "SELECT min(doc_id) AS keeper_id, sha256(text) AS content_hash, " +
          "count(*) AS n_copies FROM documents GROUP BY sha256(text) " +
          "ORDER BY keeper_id"
      )
    ),
    // ----- exact near-dedup: inverted-index shingle Jaccard ----------------
    Q(
      "q_dedup_jaccard",
      (s, dir) =>
        jaccardPairs(t(s, dir, "documents"), 0.5).orderBy($"doc_a", $"doc_b"),
      Some(jaccardOracle(Some(JaccardDfCap)))
    ),
    // ----- MinHash-LSH near-dedup ------------------------------------------
    // Signature: 64 minhashes from one (doc, shingle) shuffle. Banding:
    // 16 bands x 4 rows -> candidates ONLY where a band digest collides
    // (groupBy digest, never an all-pairs join). Candidates then verified
    // with exact Jaccard, so false positives drop out and the result equals
    // the exact operator whenever recall is 1 — which the banding math
    // guarantees at J >= 0.8 (miss prob (1-J^4)^16 <= 4e-8) — AND the
    // q_dedup_jaccard df cap is a no-op (true on this fixture, max shingle
    // df 25 << JaccardDfCap). On a corpus where the cap actually cuts
    // stop-shingles the two operators legitimately diverge: this path
    // verifies over FULL shingle sets, q_dedup_jaccard over capped ones.
    // The oracle IS the exact computation over the FULL sets (uncapped —
    // this path never builds the inverted-index self-join, so the
    // stop-shingle cut protecting jaccardPairs does not apply here;
    // banding is what bounds the candidates instead).
    Q(
      "q_dedup_minhash",
      (s, dir) => minhashPairs(t(s, dir, "documents"), 0.5),
      Some(jaccardOracle(None)),
      bench = true
    ),
    // ----- incremental (new-batch-vs-corpus) near-dedup ---------------------
    // The production ingest shape: a small daily increment (here the
    // doc_id % 10 == 9 slice) is deduped against the WHOLE corpus without
    // ever re-running all-pairs — new-side band digests join the corpus
    // band index and only candidates verify. The corpus bands and shingle
    // sets come from a STORED index (operators.MinHashIndex, materialized
    // once per fixture like the IVF index) — the query itself never
    // re-tokenizes the corpus, so ingest-time cost is one index scan +
    // candidate verification, zero corpus shuffle; the oracle recomputes
    // everything from the raw table, gating the index write+read
    // round-trip too. Recall argument = the MinHash banding math
    // (miss <= 4e-8 at J >= 0.8), so the oracle is the exact Jaccard
    // operator restricted to pairs with AT LEAST ONE side in the
    // increment — same contract as q_dedup_minhash.
    //
    // The band join is deliberately SYMMETRIC in doc_id: a new doc must be
    // flagged whether its corpus duplicate has a lower OR higher id (ids
    // carry no ingest-order meaning), so the only join-side restriction is
    // "y is in the increment" and pairs are canonicalized afterwards as
    // (least, greatest). An id-ordered join predicate here would silently
    // drop every duplicate whose corpus twin has a higher id.
    // HEADLINE BENCH ROW (round 18): the stored-index read path joins
    // the per-round gate — the index materializes once per fixture dir
    // (the cold pass pays it; timed reps measure the INCREMENTAL read
    // economics: one stored-band scan + candidate verification), so a
    // regression in the maintenance-path read side shows up in
    // BENCH_r{N}.json, not only in ad-hoc probes.
    Q(
      "q_dedup_incremental",
      (s, dir) => {
        val doc = t(s, dir, "documents")
        val index = fixtureMinhashIndex(s, dir)
        incrementalPairs(s, doc.filter($"doc_id" % 10 === 9), index, 0.5)
      },
      Some(
        s"""WITH $shingleCteSql, ${exCteSql(None)}, sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
          |inter AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          |  WHERE a.doc_id % 10 = 9 OR b.doc_id % 10 = 9
          |  GROUP BY 1, 2
          |)
          |SELECT doc_a, doc_b,
          |       round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
          |FROM inter
          |JOIN sizes sa ON sa.doc_id = doc_a
          |JOIN sizes sb ON sb.doc_id = doc_b
          |WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.5
          |ORDER BY doc_a, doc_b""".stripMargin
      ),
      bench = true
    ),
    // ----- SimHash fingerprints + near-dup candidates ----------------------
    // Per-token hash = padded Karp-Rabin (TextOps.simhashTokenHash), chosen
    // over xxhash64 because the KR fold IS reproducible in DuckDB HUGEINT
    // algebra — the vote/band/Hamming pipeline below is therefore fully
    // hash-oracled (simhashOracle mirrors every bit operation), graduating
    // this query from the rows-only check it carried through round 5.
    // DedupSpec additionally pins the semantics: planted near-dup pairs
    // land within small Hamming distance, unrelated pairs far apart.
    Q(
      "q_dedup_simhash",
      (s, dir) => simhashPairs(t(s, dir, "documents")),
      Some(simhashOracle)
    ),
    // ----- dedup clustering (connected components over near-dup pairs) -----
    // Pairs are only half the job: production dedup groups transitively
    // connected documents and keeps one per GROUP. Components via
    // iterative min-label propagation over the symmetric edge list — the
    // same fixpoint GraphX computes, expressed in DataFrame ops; each
    // iteration is one join+groupBy (shuffles on node id), and the
    // iteration count is the cluster diameter (tiny for dup clusters).
    // The oracle computes min-reachable-label with a recursive CTE.
    Q(
      "q_dedup_clusters",
      (s, dir) => {
        val doc = t(s, dir, "documents")
        // pinEager: `pairs` feeds both union branches of `edges` and
        // `edges` feeds two branches of every propagation job — the same
        // lazy-shared-cache race as the self-joins
        val pairs = PersistScope.pinEager(
          jaccardPairs(doc, 0.5).select($"doc_a", $"doc_b")
        )
        val edges = PersistScope.pinEager(
          pairs
            .union(pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
            .toDF("src", "dst")
        )
        PersistScope.track(minLabelPropagation(edges))
          .select(
            $"node".as("doc_id"),
            $"label".as("cluster_id"),
            ($"node" === $"label").as("is_keeper")
          )
          .orderBy($"cluster_id", $"doc_id")
      },
      Some(
        s"""WITH RECURSIVE $shingleCteSql, ${exCteSql(Some(JaccardDfCap))}, sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
          |inter AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2
          |), pairs AS (
          |  SELECT doc_a, doc_b FROM inter
          |  JOIN sizes sa ON sa.doc_id = doc_a
          |  JOIN sizes sb ON sb.doc_id = doc_b
          |  WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.5
          |), edges AS (
          |  SELECT doc_a AS s, doc_b AS d FROM pairs
          |  UNION ALL SELECT doc_b, doc_a FROM pairs
          |), reach(node, label) AS (
          |  SELECT DISTINCT s, s FROM edges
          |  UNION
          |  SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.node
          |)
          |SELECT node AS doc_id, min(label) AS cluster_id,
          |       node = min(label) AS is_keeper
          |FROM reach GROUP BY node ORDER BY cluster_id, doc_id""".stripMargin
      )
    ),
    // ----- leakage-safe train/val split ------------------------------------
    // The split every training pipeline needs and naive random splits get
    // wrong: near-duplicate documents must land on the SAME side, or the
    // eval set leaks training data (Lee et al. 2022 measure the inflation).
    // Composition: near-dup clusters (the same banded candidate generation
    // + min-label fixpoint as q_dedup_clusters), every unclustered doc its
    // own singleton, then side = sha256-hash of the CLUSTER REP mod 10
    // (8/10 train). Because the side is a deterministic function of the
    // rep alone, "no cluster straddles the split" holds structurally —
    // there is nothing to re-check at scale, and adding documents later
    // never reassigns an existing cluster (the rep is its min doc id,
    // stable under growth until clusters merge). Scale shape: the cluster
    // cost is the dedup family's (bucketed candidates, diameter-bounded
    // fixpoint); the split itself is one left join + a map-only hash.
    Q(
      "q_split_leakage_safe",
      (s, dir) => {
        val doc = t(s, dir, "documents")
        val pairs = PersistScope.pinEager(
          jaccardPairs(doc, 0.5).select($"doc_a", $"doc_b")
        )
        val edges = PersistScope.pinEager(
          pairs
            .union(pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
            .toDF("src", "dst")
        )
        val labels = PersistScope.track(minLabelPropagation(edges))
          .withColumnRenamed("node", "doc_id")
        val assigned = doc
          .select($"doc_id")
          .join(labels, Seq("doc_id"), "left")
          .select($"doc_id", coalesce($"label", $"doc_id").as("rep"))
        assigned
          .select(
            $"doc_id",
            $"rep",
            when(
              conv(substring(sha2($"rep".cast("string"), 256), 1, 4), 16, 10)
                .cast("bigint") % 10 < 8,
              "train").otherwise("val").as("side")
          )
          .orderBy($"doc_id")
      },
      Some(
        s"""WITH RECURSIVE $shingleCteSql, ${exCteSql(Some(JaccardDfCap))}, sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
          |inter AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2
          |), pairs AS (
          |  SELECT doc_a, doc_b FROM inter
          |  JOIN sizes sa ON sa.doc_id = doc_a
          |  JOIN sizes sb ON sb.doc_id = doc_b
          |  WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.5
          |), edges AS (
          |  SELECT doc_a AS s, doc_b AS d FROM pairs
          |  UNION ALL SELECT doc_b, doc_a FROM pairs
          |), reach(node, label) AS (
          |  SELECT DISTINCT s, s FROM edges
          |  UNION
          |  SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.node
          |), labels AS (
          |  SELECT node, min(label) AS rep FROM reach GROUP BY node
          |), assigned AS (
          |  SELECT d.doc_id, coalesce(l.rep, d.doc_id) AS rep
          |  FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
          |)
          |SELECT doc_id, rep,
          |       CASE WHEN CAST(('0x' || substring(sha256(CAST(rep AS VARCHAR)), 1, 4)) AS BIGINT) % 10 < 8
          |            THEN 'train' ELSE 'val' END AS side
          |FROM assigned ORDER BY doc_id""".stripMargin
      )
    ),
    // ----- MAINTAINED leakage-safe split (operators.SplitStore, r15) -------
    // The split as a training pipeline consumes it: built ONCE from the
    // base corpus (doc_id % 10 <> 9) and then an ingest batch (% 10 = 9)
    // assigned INCREMENTALLY against the stored corpus index — matched
    // components inherit their corpus cluster's frozen (rep, side),
    // side-conflicting matches quarantine, unmatched components hash a
    // fresh side — with no corpus re-clustering anywhere. The DuckDB
    // oracle re-derives the whole thing independently: base clustering
    // (recursive CTE), increment components (second recursive CTE), the
    // match/conflict/fresh rule — so the hash gate certifies the stored
    // artifact equals the from-scratch algebra. At 100 TB: build pays the
    // corpus once; each ingest costs the increment's signatures + one
    // broadcast band join against the stored index (the MinHashIndex
    // economics, measured ~6x cheaper than re-run in BASELINE.md).
    Q(
      "q_split_incremental",
      (s, dir) => {
        val doc = t(s, dir, "documents")
        val ws = graft.engine.TempDirs
          .workspace("graft-splitstore", "documents", dir)
        java.nio.file.Files.createDirectories(ws): Unit
        val root = java.nio.file.Files
          .createTempDirectory(ws, "run").toString
        val store = graft.operators.SplitStore
          .build(doc.filter($"doc_id" % 10 =!= 9), root)
        graft.operators.SplitStore
          .ingest(s, store, doc.filter($"doc_id" % 10 === 9), token = "t1"): Unit
        graft.operators.SplitStore.assignments(s, store).orderBy($"doc_id")
      },
      Some(
        s"""WITH RECURSIVE $shingleCteSql, ${exCteSql(None)}, sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
          |inter AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2
          |), pairs AS (
          |  SELECT doc_a, doc_b FROM inter
          |  JOIN sizes sa ON sa.doc_id = doc_a
          |  JOIN sizes sb ON sb.doc_id = doc_b
          |  WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.5
          |), bedges AS (
          |  SELECT doc_a AS s, doc_b AS d FROM pairs WHERE doc_a % 10 <> 9 AND doc_b % 10 <> 9
          |  UNION ALL SELECT doc_b, doc_a FROM pairs WHERE doc_a % 10 <> 9 AND doc_b % 10 <> 9
          |), breach(node, label) AS (
          |  SELECT DISTINCT s, s FROM bedges
          |  UNION
          |  SELECT e.d, r.label FROM breach r JOIN bedges e ON e.s = r.node
          |), blabels AS (SELECT node, min(label) AS rep FROM breach GROUP BY node),
          |base_sided AS (
          |  SELECT d.doc_id, coalesce(l.rep, d.doc_id) AS rep,
          |         CASE WHEN CAST(('0x' || substring(sha256(CAST(coalesce(l.rep, d.doc_id) AS VARCHAR)), 1, 4)) AS BIGINT) % 10 < 8
          |              THEN 'train' ELSE 'val' END AS side
          |  FROM documents d LEFT JOIN blabels l ON l.node = d.doc_id
          |  WHERE d.doc_id % 10 <> 9
          |), iedges AS (
          |  SELECT doc_a AS s, doc_b AS d FROM pairs WHERE doc_a % 10 = 9 AND doc_b % 10 = 9
          |  UNION ALL SELECT doc_b, doc_a FROM pairs WHERE doc_a % 10 = 9 AND doc_b % 10 = 9
          |), ireach(node, label) AS (
          |  SELECT DISTINCT s, s FROM iedges
          |  UNION
          |  SELECT e.d, r.label FROM ireach r JOIN iedges e ON e.s = r.node
          |), ilabels AS (SELECT node, min(label) AS comp FROM ireach GROUP BY node),
          |icomp AS (
          |  SELECT d.doc_id, coalesce(l.comp, d.doc_id) AS comp
          |  FROM documents d LEFT JOIN ilabels l ON l.node = d.doc_id
          |  WHERE d.doc_id % 10 = 9
          |), cross_m AS (
          |  SELECT CASE WHEN doc_a % 10 = 9 THEN doc_a ELSE doc_b END AS doc_id,
          |         CASE WHEN doc_a % 10 = 9 THEN doc_b ELSE doc_a END AS corp_doc
          |  FROM pairs WHERE (doc_a % 10 = 9) <> (doc_b % 10 = 9)
          |), cmatch AS (
          |  SELECT c.comp, min(b.rep) AS m_rep, count(DISTINCT b.side) AS n_sides,
          |         min(b.side) AS m_side,
          |         max(CASE WHEN b.side = 'quarantine' THEN 1 ELSE 0 END) AS m_quar
          |  FROM icomp c JOIN cross_m x ON x.doc_id = c.doc_id
          |  JOIN base_sided b ON b.doc_id = x.corp_doc
          |  GROUP BY c.comp
          |), cassign AS (
          |  SELECT u.comp, coalesce(m.m_rep, u.comp) AS rep,
          |    CASE WHEN m.comp IS NULL THEN
          |      CASE WHEN CAST(('0x' || substring(sha256(CAST(u.comp AS VARCHAR)), 1, 4)) AS BIGINT) % 10 < 8
          |           THEN 'train' ELSE 'val' END
          |    WHEN m.n_sides > 1 OR m.m_quar = 1 THEN 'quarantine'
          |    ELSE m.m_side END AS side
          |  FROM (SELECT DISTINCT comp FROM icomp) u
          |  LEFT JOIN cmatch m ON m.comp = u.comp
          |)
          |SELECT doc_id, rep, side FROM base_sided
          |UNION ALL
          |SELECT c.doc_id, a.rep, a.side FROM icomp c JOIN cassign a ON a.comp = c.comp
          |ORDER BY doc_id""".stripMargin
      )
    ),
    // ----- fingerprint-keyed near-dedup ------------------------------------
    // The cheapest candidate generator of the three: ONE rolling-hash pass
    // per document (vs 64 hash families for MinHash), groupBy fingerprint,
    // pairs only within buckets, exact-Jaccard verification. The winnowed
    // min-window hash collides for texts sharing their minimal window —
    // measured on the fixture: 25/25 planted pairs share it, 22 docs of
    // false candidates. Recall is data-dependent (an edit inside the
    // minimal window splits a pair), so this is the cheap first pass;
    // MinHash is the recall-guaranteed second. HASH-ORACLED since round 3:
    // the fingerprint is reproduced in DuckDB (HUGEINT Karp-Rabin folds,
    // QueryUtil.fingerprintOracleCte) and the candidate+verify pipeline
    // mirrored; DedupSpec additionally asserts equality with the exact
    // operator on this corpus.
    Q(
      "q_dedup_fingerprint",
      (s, dir) => {
        graft.functions.Functions.register(s)
        val doc = t(s, dir, "documents")
        // eager: both bucket-join sides share the hash pass
        val fp = PersistScope.pinEager(
          doc.select(
            $"doc_id",
            expr("rolling_fingerprint(text, 32)").as("fp")
          )
        )
        val cand = fp
          .as("x")
          .join(
            fp.as("y"),
            col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id")
          )
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        val sets = shingleSets(doc)
        val inter = size(array_intersect($"sh_a", $"sh_b"))
        cand
          .join(sets.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), Seq("doc_a"))
          .join(sets.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), Seq("doc_b"))
          .select(
            $"doc_a",
            $"doc_b",
            round(inter * lit(1.0) / (size($"sh_a") + size($"sh_b") - inter), 6)
              .as("jaccard")
          )
          .filter($"jaccard" >= 0.5)
          .orderBy($"doc_a", $"doc_b")
      },
      Some {
        val jac =
          "len(list_intersect(sa.shingles, sb.shingles)) * 1.0 / " +
            "(len(sa.shingles) + len(sb.shingles) - " +
            "len(list_intersect(sa.shingles, sb.shingles)))"
        s"""WITH ${QueryUtil.fingerprintOracleCte(32)},
           |$shingleCteSql, cand AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM fpc a JOIN fpc b ON a.win_fp = b.win_fp AND a.doc_id < b.doc_id
           |)
           |SELECT doc_a, doc_b, round($jac, 6) AS jaccard
           |FROM cand
           |JOIN sh sa ON sa.doc_id = doc_a
           |JOIN sh sb ON sb.doc_id = doc_b
           |WHERE round($jac, 6) >= 0.5
           |ORDER BY doc_a, doc_b""".stripMargin
      }
    ),
    // ----- embedding cosine near-dup (blocked) -----------------------------
    // Blocking by label keeps the pairwise compare inside ~50-row blocks
    // (at 100 TB: block by a coarse quantizer / IVF cell instead of a
    // cartesian). cosine_sim is the native codegen'd expression.
    Q(
      "q_dedup_embedding",
      // plain-join baseline: no lsh_rewrite_hint in the predicate, so the
      // optimizer rule structurally cannot touch it — no conf needed, and
      // nothing on the caller's session is mutated
      (s, dir) => embeddingNearDup(s, dir),
      Some(embeddingNearDupOracle)
    ),
    // ----- the same query THROUGH the optimizer rewrite --------------------
    // plans.LshJoinRewrite (injected via GraftExtensions) turns the
    // cosine-threshold join into a banded-LSH candidate join at PLAN time;
    // the identical oracle proves the rewrite loses nothing on this corpus
    // (recall math in the rule's scaladoc). PlanSpec asserts the rewritten
    // shape actually fired — same results through a different plan. The
    // opt-in is the lsh_rewrite_hint marker ON THE PREDICATE, so only this
    // join is rewritten, never other cosine joins in the same session.
    Q(
      "q_dedup_embedding_lsh",
      (s, dir) => {
        // a DERIVED session scopes the rewrite PARAMETER confs to this
        // query's plan (conf is read at optimization time; newSession
        // shares the SparkContext, extensions, and base conf — only the
        // runtime conf diverges, and the caller's session is untouched).
        val s2 = s.newSession()
        // the demo threshold (0.3) is WEAK similarity: per-plane agreement
        // is only ~0.6, so recall needs 32 bands of 2 rows (miss <= 8e-7
        // per pair — certain-recall territory for any fixture size). At
        // production thresholds >=0.8 the defaults (16x2) are already
        // recall-saturated and r can rise for real pruning.
        s2.conf.set("spark.graft.lsh.rewrite.bands", "32")
        embeddingNearDup(s2, dir, lshHint = true)
      },
      Some(embeddingNearDupOracle)
    ),
    // ----- paragraph-level exact dedup -------------------------------------
    // The sub-document pass (C4/Dolma style): duplicated PARAGRAPHS are
    // removed corpus-wide while their host documents survive — boilerplate
    // headers/footers die without dropping the page. The fixture corpus has
    // no newlines, so a "paragraph" is a fixed 25-token chunk (the same
    // arithmetic as q_text_chunk, stride == length); on real text the
    // split-on-blank-line tokenizer is the only change. First occurrence
    // in (doc_id, para_idx) order wins; every later copy — across docs OR
    // within one — is dropped, and each doc is reassembled from its kept
    // paragraphs in original order.
    //
    // Scale shape (the part that must survive 100 TB): the global
    // winner-election window shuffles ONLY (md5, doc_id, para_idx) — 32-byte
    // digests, never paragraph text; the per-doc kept-index SETS (a handful
    // of ints per doc) then join back to the documents on doc_id, so
    // paragraph text moves exactly once, in the reassembly join. No
    // explode of text, no text in the window state.
    Q(
      "q_dedup_paragraph",
      (s, dir) => {
        val paraLen = 25
        val docs = t(s, dir, "documents")
          .select($"doc_id", TextOps.tokens($"text").as("ws"))
          .filter(size($"ws") >= 1)
          .select(
            $"doc_id",
            transform(
              sequence(lit(0), expr(s"(size(ws) - 1) div $paraLen")),
              i => concat_ws(" ", slice($"ws", i * paraLen + 1, lit(paraLen)))
            ).as("paras")
          )
        // hash-only rows for the election: text stays behind in `docs`
        val keys = docs.select(
          $"doc_id",
          posexplode($"paras")
        ).select($"doc_id", $"pos".cast("bigint").as("para_idx"), md5($"col").as("h"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"h").orderBy($"doc_id", $"para_idx")
        val keptSets = keys
          .withColumn("rn", row_number().over(w))
          .groupBy($"doc_id")
          .agg(
            count(lit(1)).cast("bigint").as("n_paras"),
            // collect_list skips nulls: kept indices only
            collect_list(when($"rn" === 1, $"para_idx")).as("kept_idx")
          )
        docs
          .join(keptSets, Seq("doc_id"))
          .select(
            $"doc_id",
            $"n_paras",
            size($"kept_idx").cast("bigint").as("n_kept"),
            array_join(
              transform(array_sort($"kept_idx"),
                i => element_at($"paras", (i + 1).cast("int"))),
              " ").as("clean_text")
          )
          .orderBy($"doc_id")
      },
      Some(
        """WITH toks AS (
          |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws
          |  FROM documents
          |), lists AS (
          |  SELECT doc_id,
          |         [array_to_string(ws[i*25+1 : i*25+25], ' ')
          |          for i in range(0, (len(ws)-1)//25 + 1)] AS paras
          |  FROM toks WHERE len(ws) >= 1
          |), flat AS (
          |  SELECT doc_id, unnest(paras) AS para,
          |         CAST(generate_subscripts(paras, 1) - 1 AS BIGINT) AS para_idx
          |  FROM lists
          |), ranked AS (
          |  SELECT doc_id, para_idx, para,
          |         row_number() OVER (PARTITION BY md5(para)
          |                            ORDER BY doc_id, para_idx) AS rn
          |  FROM flat
          |)
          |SELECT doc_id,
          |  CAST(count(*) AS BIGINT) AS n_paras,
          |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          |  coalesce(string_agg(CASE WHEN rn = 1 THEN para END, ' '
          |                      ORDER BY para_idx), '') AS clean_text
          |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin
      )
    ),
    // EXACT SUBSTRING (SPAN) DEDUP — the Lee et al. 2021 "Deduplicating
    // Training Data Makes Language Models Better" rung the document- and
    // paragraph-level family misses: a duplicated SPAN inside otherwise-
    // unique documents (a licence block, a quoted passage, a shared
    // footer) survives whole-doc and fixed-paragraph dedup but still
    // memorizes. Contract: any 8-word shingle occurring in >= 2 distinct
    // docs is a duplicated span; the smallest doc_id containing it keeps
    // its text, every other occurrence's 8-word window is removed, and
    // overlapping windows merge through word-level kill marks (so an
    // N-word duplicated run, N > 8, dies as one region, not 8-word
    // stutters). Within-doc repeats with df = 1 are NOT touched — span
    // dedup is cross-document by definition; q_text_repetition owns the
    // within-doc axis.
    //
    // 100 TB shape: the TEXT never shuffles. Shingle rows carry (doc_id,
    // pos, shingle); the dictionary groupBy (min doc + distinct-doc df)
    // and the kill join shuffle those rows only; kill positions collapse
    // to per-doc sets; the single text-side join is by doc_id. The
    // suffix-array formulation this replaces is inherently sequential —
    // banded shingle df IS the distributed re-expression (at lake scale
    // the shingle key becomes a 128-bit hash; here the string itself so
    // the DuckDB oracle replays the algebra exactly). The fixture plants
    // a 9-word phrase on every doc_id % 7 == 0 doc, so ~1/7 of the corpus
    // shares two overlapping duplicated shingles -> 9 words die per
    // non-keeper; natural soup 8-gram collisions are deterministic in
    // both engines.
    Q(
      "q_dedup_spans",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(
            $"doc_id",
            when($"doc_id" % 7 === 0,
              concat($"text",
                lit(" the quick brown fox jumps over the lazy dog")))
              .otherwise($"text").as("text"))
        // string keys HERE so DuckDB replays the algebra exactly; the
        // production default is the 128-bit-hashed scale path, pinned
        // row-identical to this one in DedupSpec
        TextOps.spanDedup(docs, k = 8, hashKeys = false).orderBy($"doc_id")
      },
      Some(
        """WITH docs AS (
          |  SELECT doc_id,
          |         CASE WHEN doc_id % 7 = 0
          |              THEN text || ' the quick brown fox jumps over the lazy dog'
          |              ELSE text END AS text
          |  FROM documents
          |), toks AS (
          |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws
          |  FROM docs
          |), poss AS (
          |  SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 8)) AS pos
          |  FROM toks WHERE len(ws) >= 8
          |), sh AS (
          |  SELECT doc_id, pos, array_to_string(ws[pos+1 : pos+8], ' ') AS s
          |  FROM poss
          |), dict AS (
          |  SELECT s, min(doc_id) AS keeper
          |  FROM sh GROUP BY s HAVING count(DISTINCT doc_id) >= 2
          |), kills AS (
          |  SELECT sh.doc_id, sh.pos FROM sh JOIN dict USING (s)
          |  WHERE sh.doc_id <> dict.keeper
          |), idx AS (
          |  SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS p
          |  FROM toks
          |), kept AS (
          |  SELECT i.doc_id, i.p, i.ws[i.p] AS w
          |  FROM idx i
          |  WHERE NOT EXISTS (
          |    SELECT 1 FROM kills x
          |    WHERE x.doc_id = i.doc_id AND i.p - 1 >= x.pos
          |      AND i.p - 1 < x.pos + 8)
          |), agg AS (
          |  SELECT doc_id, count(*) AS n_kept,
          |         string_agg(w, ' ' ORDER BY p) AS clean_text
          |  FROM kept GROUP BY doc_id
          |)
          |SELECT t.doc_id,
          |  CAST(len(t.ws) AS BIGINT) AS n_words,
          |  CAST(len(t.ws) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
          |  coalesce(a.clean_text, '') AS clean_text
          |FROM toks t LEFT JOIN agg a USING (doc_id)
          |ORDER BY t.doc_id""".stripMargin
      )
    )
  )

  // NOTE: declared as defs below `all` — a val here would still be null
  // while `all` initializes (object init order).

  /** The MinHash-LSH near-dedup pipeline as a reusable operator — shared
    * by `q_dedup_minhash` and ScaleProbe.dedupScaleProbe so the probe can
    * never drift from what production runs.
    *
    * ONE tokenize+shingle pass: the eagerly-pinned sets feed the signature
    * computation AND both sides of the verify join (the round-3 bench
    * measured the lazy-cache self-join race at ~2x once per-rep
    * unpersisting made runs honest). Signatures per ROW from the cached
    * arrays: hash each shingle string once, then ONE native one-pass walk
    * over the hash array (functions.MinHashSignature) for all 64 minima —
    * no explode, no shuffle, no per-family temp arrays (bit-identical to
    * the minhashAggs inverted-index path AND to the composed
    * array_min(transform(...)) form, DedupSpec-pinned). Candidates come
    * only from shared band digests; exact verification joins CANDIDATES
    * ONLY to their shingle sets — cost O(|candidates|), not the full
    * inverted-index join (which would defeat the LSH pruning).
    */
  private[graft] def minhashPairs(doc: DataFrame, minJ: Double): DataFrame = {
    import graft.operators.MinHashIndex
    // r20: ONE fused pin (doc_id, sh, sig) instead of two sequential
    // cache fills (sets, then sigs) — same expressions, same cache-race
    // safety, one fewer eager build job per run
    val sets = PersistScope.pinEager(MinHashIndex.setsWithSignatures(doc))
    val bands = MinHashIndex.bandDigests(sets)
    val cand = bands
      .as("x")
      .join(
        bands.as("y"),
        col("x.band") === col("y.band") && col("x.digest") === col("y.digest") &&
          col("x.doc_id") < col("y.doc_id")
      )
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val inter = size(array_intersect($"sh_a", $"sh_b"))
    cand
      .join(sets.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), Seq("doc_a"))
      .join(sets.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), Seq("doc_b"))
      .select(
        $"doc_a",
        $"doc_b",
        round(inter * lit(1.0) / (size($"sh_a") + size($"sh_b") - inter), 6)
          .as("jaccard")
      )
      .filter($"jaccard" >= minJ)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Materialize (once per fixture dir + process) the stored MinHash index
    * for `documents` — the corpus-side artifact `q_dedup_incremental`
    * reads instead of re-banding the corpus. PID-keyed like every other
    * fixture materialization; cleaned up at exit via TempDirs.
    */
  private def fixtureMinhashIndex(
      s: org.apache.spark.sql.SparkSession,
      dir: String
  ): graft.operators.MinHashIndex.StoredIndex = {
    import graft.operators.MinHashIndex
    val root =
      graft.engine.TempDirs.workspace("graft-minhash-index", "documents", dir)
    graft.engine.TempDirs.materializeOnce(root)(
      MinHashIndex.isReady(s, root.toString)
    )(MinHashIndex.materialize(t(s, dir, "documents"), root.toString))
    MinHashIndex.StoredIndex(root.toString)
  }

  /** Incremental (new-batch-vs-corpus) near-dedup against a STORED index —
    * shared by `q_dedup_incremental` and ScaleProbe's dedup probe.
    *
    * The increment's shingle sets and band digests are computed fresh
    * (those docs are new by definition) and BROADCAST; the corpus side is
    * a scan of the stored band index — no corpus tokenization, no corpus
    * shuffle. The candidate join's left side is stored-bands ∪
    * increment-bands (store rows for increment ids anti-joined away so an
    * overlap never double-counts): the union is what catches a pair of
    * duplicates that are BOTH new — with the store alone, an intra-batch
    * duplicate pair would silently never be flagged when the batch is
    * disjoint from the corpus, the production shape. Verification reads
    * stored shingle sets, with the increment's fresh sets taking
    * precedence for ids the store also carries.
    */
  private[graft] def incrementalPairs(
      s: org.apache.spark.sql.SparkSession,
      increment: DataFrame,
      index: graft.operators.MinHashIndex.StoredIndex,
      minJ: Double
  ): DataFrame = {
    import graft.operators.MinHashIndex
    // r20: one fused (doc_id, sh, sig) pin replaces the sets + bands pin
    // pair; band digests derive from the cached sigs on demand (a cheap
    // explode of increment-many cached rows, used by both join sides)
    val incSets = PersistScope.pinEager(MinHashIndex.setsWithSignatures(increment))
    val incBands = MinHashIndex.bandDigests(incSets)
    val cand = MinHashIndex
      .bands(s, index)
      .join(broadcast(incSets.select($"doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(incBands)
      .as("x")
      .join(
        broadcast(incBands.as("y")),
        col("x.band") === col("y.band") && col("x.digest") === col("y.digest") &&
          col("x.doc_id") =!= col("y.doc_id")
      )
      .select(
        least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b")
      )
      .distinct()
    val sets = MinHashIndex
      .shingles(s, index)
      .join(broadcast(incSets.select($"doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(incSets.select($"doc_id", $"sh"))
    val inter = size(array_intersect($"sh_a", $"sh_b"))
    cand
      .join(sets.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), Seq("doc_a"))
      .join(sets.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), Seq("doc_b"))
      .select(
        $"doc_a",
        $"doc_b",
        round(inter * lit(1.0) / (size($"sh_a") + size($"sh_b") - inter), 6)
          .as("jaccard")
      )
      .filter($"jaccard" >= minJ)
      // per-pair aggregation on the (tiny) pairs frame: a no-op on a
      // clean index, and the correctness backstop when the store carries
      // replay-duplicated (doc_id, sh) rows — each duplicate set row
      // would otherwise duplicate its pair's output row. max() rather
      // than dropDuplicates so that even CONFLICTING rows for a doc_id
      // (a re-appended edit) yield a deterministic jaccard, not
      // whichever partition won the race.
      .groupBy($"doc_a", $"doc_b")
      .agg(max($"jaccard").as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** The SimHash near-dedup pipeline as a reusable operator — shared by
    * `q_dedup_simhash` and ScaleProbe.dedupScaleProbe (same no-drift
    * rationale as [[minhashPairs]]).
    *
    * The per-token hash is materialized in its own projection so the 61
    * vote sums read a column, not 61 inlined copies of the KR fold; the
    * fingerprint is eagerly pinned because both chunk-join sides share
    * the vote aggregation. Candidate pairs: any shared 15-bit chunk
    * (4-band LSH over the 61 usable fingerprint bits; bit 60 participates
    * in Hamming only), then exact Hamming <= 6. RECALL ENVELOPE
    * (DedupSpec-pinned): 4 bands x <=3 differing banded bits
    * pigeonhole-GUARANTEE a clean shared band, so every pair at
    * Hamming <= 3 is emitted; pairs at 4-6 are emitted iff their
    * differing bits cluster into <= 3 of the 4 chunks (measured on the
    * fixture: all planted pairs do — real near-dup edits touch few
    * tokens, so their flipped vote bits clump). A true <= 6 guarantee
    * needs 7 bands of ~9 bits, but 2^9-bucket bands collide quadratically
    * on a large corpus (~n^2/2^10 candidate pairs per band) — a
    * scale-killer; 15-bit bands keep buckets at 32768 and candidates
    * near-linear. The Hamming filter runs BEFORE distinct
    * (semantics-identical: hamming is a deterministic function of the
    * pair): unrelated-doc band collisions grow ~n^2/2^15 per band, so at
    * corpus scale the candidate stream is orders of magnitude larger
    * than the survivors — the cut must run streaming off the join, with
    * the distinct's shuffle paid only by true near-dups
    * (dedupScaleProbe measures the candidate/survivor gap at 100x).
    */
  private[graft] def simhashPairs(doc: DataFrame): DataFrame = {
    val th = doc
      .select($"doc_id", explode(TextOps.tokens($"text")).as("w"))
      .select($"doc_id", TextOps.simhashTokenHash($"w").as("h"))
    val votes = th
      .groupBy($"doc_id")
      .agg(
        TextOps.simhashVoteAggs($"h").head,
        TextOps.simhashVoteAggs($"h").tail: _*
      )
    val fp = PersistScope.pinEager(
      votes.select($"doc_id", TextOps.simhashFromVotes.as("simhash"))
    )
    val chunks = fp.select(
      $"doc_id",
      $"simhash",
      explode(
        array((0 until 4).map { c =>
          struct(
            lit(c).as("chunk"),
            shiftright($"simhash", c * 15).bitwiseAND(lit(0x7fffL)).as("bits")
          )
        }: _*)
      ).as("ck")
    )
    chunks
      .as("x")
      .join(
        chunks.as("y"),
        col("x.ck.chunk") === col("y.ck.chunk") &&
          col("x.ck.bits") === col("y.ck.bits") &&
          col("x.doc_id") < col("y.doc_id")
      )
      .select(
        col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"),
        TextOps
          .hamming(col("x.simhash"), col("y.simhash"))
          .cast("bigint")
          .as("hamming")
      )
      .filter($"hamming" <= 6)
      .distinct()
      .orderBy($"doc_a", $"doc_b")
  }

  /** Min-label propagation over a SYMMETRIC edge list `(src, dst)` to the
    * fixpoint: returns `(node, label)` where label = min reachable node id
    * (= connected component id). Converges in <= diameter iterations; dup
    * clusters are shallow, so the default cap is generous. Exceeding it
    * throws — failing loudly beats silently emitting wrong cluster ids
    * (the round-2 audit's truncation hazard).
    *
    * Lineage grows one join+groupBy per iteration; without truncation the
    * plan (and any recompute) deepens without bound. Every 5 iterations
    * (deep enough to amortize the materialization, shallow enough that a
    * replay re-runs <= 5 iterations) the labels are checkpointed — and
    * the convergence-check count has already forced each generation, so
    * the eager checkpoint re-reads cached blocks, not the join chain.
    * WHICH checkpoint matters on a real cluster: `localCheckpoint` stores
    * blocks only on executors, so truncated lineage + a lost executor =
    * unrecoverable job, NOT a slow recompute. When the session has a
    * checkpoint dir configured (sc.setCheckpointDir — do this on any
    * multi-executor deployment) the RELIABLE `checkpoint` is used and
    * executor loss recovers from the checkpoint files; `localCheckpoint`
    * is the fallback for dir-less local/bench sessions, where executor
    * loss means the JVM died anyway. DedupSpec drives a 13-node chain
    * (diameter crosses two checkpoint boundaries) to pin that
    * checkpointing is invisible to the labels.
    */
  private[graft] def minLabelPropagation(
      edges: DataFrame,
      maxIters: Int = 50
  ): DataFrame = minLabelPropagationWithIters(edges, maxIters)._1

  /** [[minLabelPropagation]] plus the iteration count it converged in —
    * the scale probe records it (iterations = component diameter + 1
    * confirm pass; planted dup clusters are shallow, so a growing count
    * at scale would flag a data problem before a time problem).
    */
  private[graft] def minLabelPropagationWithIters(
      edges: DataFrame,
      maxIters: Int = 50
  ): (DataFrame, Int) = {
    val nodes = edges.select($"src".as("node")).distinct()
    var labels = nodes.select($"node", $"node".as("label")).persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val prop = edges
        .join(labels, $"src" === $"node")
        .select($"dst".as("node"), $"label")
      val next = labels
        .union(prop)
        .groupBy($"node")
        .agg(min($"label").as("label"))
        .persist()
      val changed = next
        .as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.label") =!= col("o.label"))
        .count()
      labels.unpersist(blocking = false)
      labels =
        if (iter % 5 == 4) {
          val reliable =
            edges.sparkSession.sparkContext.getCheckpointDir.isDefined
          val cp =
            if (reliable) next.checkpoint(eager = true)
            else next.localCheckpoint(eager = true)
          next.unpersist(blocking = false)
          cp
        } else next
      converged = changed == 0
      iter += 1
    }
    if (!converged) {
      labels.unpersist(blocking = false)
      throw new IllegalStateException(
        s"minLabelPropagation did not converge within $maxIters iterations " +
          "(component diameter exceeds the cap); refusing to emit " +
          "unconverged cluster ids"
      )
    }
    (labels, iter)
  }

  /** Label-blocked cosine near-dup pairs (shared by the baseline query and
    * its LSH-rewritten twin — identical plan INPUT except for the hint
    * marker, so any output difference is the rewrite's fault).
    *
    * `lshHint = true` wraps the cosine threshold in `lsh_rewrite_hint`,
    * the per-predicate opt-in that lets plans.LshJoinRewrite fire on THIS
    * join only (the marker is a transparent identity predicate wherever
    * the rule leaves it alone).
    */
  def embeddingNearDup(
      s: org.apache.spark.sql.SparkSession,
      dir: String,
      lshHint: Boolean = false
  ): DataFrame = {
    val e = t(s, dir, "embeddings")
    val a = e.select($"vec_id".as("id_a"), $"label", $"embedding".as("emb_a"))
    val b = e.select($"vec_id".as("id_b"), $"label", $"embedding".as("emb_b"))
    val threshold = $"cos" >= 0.3
    a.join(b, Seq("label"))
      .filter($"id_a" < $"id_b")
      .select(
        $"label",
        $"id_a",
        $"id_b",
        round(graft.functions.Functions.cosineSim($"emb_a", $"emb_b"), 6)
          .as("cos")
      )
      .filter(
        if (lshHint) graft.functions.Functions.lshRewriteHint(threshold)
        else threshold
      )
      .orderBy($"label", $"id_a", $"id_b")
  }

  private def embeddingNearDupOracle: String =
    "SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b, " +
      "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos " +
      "FROM embeddings a JOIN embeddings b " +
      "ON a.label = b.label AND a.vec_id < b.vec_id " +
      "WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.3 " +
      "ORDER BY label, id_a, id_b"
}
