package graft.queries

import org.apache.spark.sql.functions._
import QueryUtil._

/** Sampling / data-mixing operators — the corpus-subsetting layer of a
  * training-data pipeline (choose N% of crawl A, M% of crawl B, ...).
  *
  * Spark's sample() is seeded per-partition Bernoulli/Poisson; the draw
  * sequence is engine-specific, so no DuckDB oracle can reproduce the
  * exact rows (driver does rows-only checks). Determinism, fraction
  * bounds, and stratification contracts are pinned in SamplingSpec.
  * The hash-based variant IS oracle-able: selecting rows by a content
  * hash threshold is a deterministic, portable "sample" both engines
  * compute identically — and at 100 TB it is also the better tool
  * (reproducible across reruns and engines, no RNG state).
  */
object SamplingQueries {

  val all: Seq[Q] = Seq(
    // Seeded Bernoulli sample (rows-only: RNG is engine-specific).
    Q(
      "q_sample_bernoulli",
      (s, dir) =>
        t(s, dir, "documents")
          .sample(withReplacement = false, fraction = 0.2, seed = 42L)
          .select($"doc_id", $"lang")
          .orderBy($"doc_id"),
      None
    ),
    // Deterministic hash sample: content-hash mod-N threshold. Fully
    // portable -> DuckDB oracle. This is the reproducible sample you want
    // in a 100 TB pipeline (stable across engines, reruns, partitionings).
    Q(
      "q_sample_hash",
      (s, dir) =>
        t(s, dir, "documents")
          .filter(
            conv(substring(sha2($"text", 256), 1, 4), 16, 10).cast("bigint") % 5 === 0
          )
          .select($"doc_id", $"lang")
          .orderBy($"doc_id"),
      Some(
        "SELECT doc_id, lang FROM documents " +
          "WHERE CAST(('0x' || substring(sha256(text), 1, 4)) AS BIGINT) % 5 = 0 " +
          "ORDER BY doc_id"
      )
    ),
    // Source mixing: different hash-sample rates per source bucket — the
    // portable version of weighted corpus mixing.
    Q(
      "q_sample_mix",
      (s, dir) => {
        val bucket =
          conv(substring(sha2($"text", 256), 1, 4), 16, 10).cast("bigint") % 10
        t(s, dir, "documents")
          .filter(
            ($"lang" === "en" && bucket < 8) || // keep 80% of en
              ($"lang" =!= "en" && bucket < 3) // keep 30% of the rest
          )
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_kept"))
          .orderBy($"lang")
      },
      Some(
        """WITH b AS (
          |  SELECT lang, CAST(('0x' || substring(sha256(text), 1, 4)) AS BIGINT) % 10 AS bucket
          |  FROM documents
          |)
          |SELECT lang, count(*) AS n_kept FROM b
          |WHERE (lang = 'en' AND bucket < 8) OR (lang <> 'en' AND bucket < 3)
          |GROUP BY lang ORDER BY lang""".stripMargin
      )
    ),
    // Fixed-size stratified sample: exactly K docs per language, chosen by
    // content-hash order — the deterministic, engine-portable version of
    // per-stratum reservoir sampling (quota sampling). One shuffle on the
    // stratum key; the hash order makes the draw uniform-ish yet exactly
    // reproducible across reruns, engines, and partitionings — at 100 TB
    // this replaces driver-side reservoirs entirely.
    Q(
      "q_sample_stratified",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"lang")
          .orderBy($"hk", $"doc_id")
        t(s, dir, "documents")
          .select(
            $"doc_id",
            $"lang",
            substring(sha2($"text", 256), 1, 16).as("hk")
          )
          .withColumn("rk", row_number().over(w))
          .filter($"rk" <= 10)
          .select($"lang", $"doc_id")
          .orderBy($"lang", $"doc_id")
      },
      Some(
        """WITH h AS (
          |  SELECT doc_id, lang, substring(sha256(text), 1, 16) AS hk FROM documents
          |), r AS (
          |  SELECT doc_id, lang,
          |         row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rk
          |  FROM h
          |)
          |SELECT lang, doc_id FROM r WHERE rk <= 10 ORDER BY lang, doc_id""".stripMargin
      )
    ),
    // Temperature sampling (the multilingual rebalancing of mBERT/XLM-R:
    // keep probability proportional to n_lang^(alpha-1), alpha = 0.5): the
    // smallest language keeps everything, a language k-times larger keeps
    // a sqrt(1/k) fraction — flattening the size distribution without
    // discarding the head entirely. The rate is DENOMINATOR-FREE —
    // sqrt(n_min/n_lang), two integers and one correctly-rounded sqrt, so
    // both engines compute bit-identical thresholds (a sum-normalized
    // p_l = n^a / SUM n^a would hinge on float summation order). Selection
    // is the house deterministic-hash pattern: 16 content-hash bits
    // against floor(rate * 65536).
    //
    // 100 TB shape: one tiny per-lang count agg, thresholds broadcast back,
    // one codegen'd selection pass — the corpus text never shuffles.
    Q(
      "q_sample_temperature",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val c = docs.groupBy($"lang").agg(count(lit(1)).cast("bigint").as("n"))
        val m = c.agg(min($"n").as("nmin"))
        val r = c
          .crossJoin(broadcast(m))
          .select($"lang", $"n",
            floor(sqrt($"nmin".cast("double") / $"n") * 65536)
              .cast("bigint").as("thresh"))
        val kept = docs
          .select($"lang",
            conv(substring(sha2($"text", 256), 1, 4), 16, 10)
              .cast("bigint").as("b"))
          .join(broadcast(r), Seq("lang"))
          .filter($"b" < $"thresh")
          .groupBy($"lang").agg(count(lit(1)).cast("bigint").as("n_kept"))
        r.join(kept, Seq("lang"), "left")
          .select($"lang", $"n".as("n_total"), $"thresh",
            coalesce($"n_kept", lit(0L)).as("n_kept"))
          .orderBy($"lang")
      },
      Some(
        """WITH c AS (
          |  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
          |), m AS (
          |  SELECT min(n) AS nmin FROM c
          |), r AS (
          |  SELECT lang, n,
          |         CAST(floor(sqrt(CAST(nmin AS DOUBLE) / n) * 65536) AS BIGINT) AS thresh
          |  FROM c, m
          |), k AS (
          |  SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
          |  FROM documents d JOIN r USING (lang)
          |  WHERE CAST(('0x' || substring(sha256(text), 1, 4)) AS BIGINT) < thresh
          |  GROUP BY d.lang
          |)
          |SELECT r.lang, n AS n_total, thresh, coalesce(n_kept, 0) AS n_kept
          |FROM r LEFT JOIN k ON r.lang = k.lang ORDER BY r.lang""".stripMargin
      )
    ),
    // DSIR-style importance resampling (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling"): score every raw
    // document by how target-like its hashed n-gram distribution is —
    // logw(doc) = sum_b n_b(doc) * ln(p_target(b) / p_raw(b)) over B=256
    // hashed unigram+bigram buckets with add-one smoothing — and keep the
    // top-k. Target here = the 'en' slice of the corpus itself (a real
    // run would point it at Wikipedia/books); the bucket hash is the house
    // sha256 prefix, so both engines bucket identically. Ranking is on
    // the ROUND-6 weight with doc_id tiebreak — a strict total order both
    // engines agree on (the raw double sum is order-sensitive at 1e-15;
    // the round-6 + tiebreak pattern is the same one q_hybrid_search pins).
    //
    // 100 TB shape: ONE gram explode feeds a per-(doc,bucket) partial-agg
    // shuffle; the bucket model (<= 256 rows) and its log-ratios broadcast
    // back; the final top-k plans as TakeOrderedAndProject. Raw text never
    // shuffles, and fitting + scoring read the corpus exactly once.
    Q(
      "q_sample_dsir",
      (s, dir) =>
        dsirScores(
          t(s, dir, "documents").select($"doc_id", $"lang", $"text"),
          Seq($"lang"),
          $"lang" === "en"
        )
          .orderBy($"logw".desc, $"doc_id")
          .limit(50),
      Some(
        """WITH toks AS (
          |  SELECT doc_id, lang, regexp_split_to_array(lower(text), '\s+') AS ws
          |  FROM documents
          |), grams AS (
          |  SELECT doc_id, lang,
          |         unnest(ws || [ws[i] || ' ' || ws[i+1]
          |                       for i in range(1, len(ws))]) AS g
          |  FROM toks
          |), bkt AS (
          |  SELECT doc_id, lang,
          |         CAST(('0x' || substring(sha256(g), 1, 4)) AS BIGINT) % 256 AS b
          |  FROM grams WHERE g <> ''
          |), tf AS (
          |  SELECT doc_id, lang, b, count(*) AS n FROM bkt GROUP BY 1, 2, 3
          |), counts AS (
          |  SELECT b, sum(n) AS c_raw,
          |         sum(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS c_tgt
          |  FROM tf GROUP BY b
          |), stats AS (
          |  SELECT sum(c_raw) AS nr, sum(c_tgt) AS nt FROM counts
          |), lr AS (
          |  SELECT b, ln((c_tgt + 1.0) / (nt + 256)) -
          |            ln((c_raw + 1.0) / (nr + 256)) AS lr
          |  FROM counts, stats
          |)
          |SELECT doc_id, lang, round(sum(n * lr), 6) AS logw
          |FROM tf JOIN lr USING (b)
          |GROUP BY doc_id, lang
          |ORDER BY logw DESC, doc_id LIMIT 50""".stripMargin
      )
    )
  )

  // NOTE: def below `all` (object-init order).

  /** DSIR importance weights over an arbitrary documents frame — the
    * overload ScaleProbe's text probe drives, so the probe times EXACTLY
    * the production scoring pipeline. `passThrough` columns ride along
    * into the output (the fixture query carries `lang`); `isTarget`
    * selects the reference slice the target distribution is fitted on.
    * One gram explode feeds the per-(doc,bucket) partial-agg shuffle;
    * the <= nBuckets-row log-ratio model broadcasts back.
    */
  private[graft] def dsirScores(
      docs: org.apache.spark.sql.DataFrame,
      passThrough: Seq[org.apache.spark.sql.Column],
      isTarget: org.apache.spark.sql.Column,
      nBuckets: Int = 256
  ): org.apache.spark.sql.DataFrame = {
    val ws = graft.operators.TextOps.tokens($"text")
    val grams = docs
      .select(
        ($"doc_id" +: isTarget.cast("int").as("_tgt") +: passThrough) :+
          explode(graft.operators.QualityClassifier.gramsOf(ws)).as("g"): _*
      )
      .filter($"g" =!= "")
      .withColumn(
        "b", graft.operators.QualityClassifier.bucketOf($"g", nBuckets))
      .drop("g")
    // one explode pass -> per-(doc,bucket) counts; the bucket model is
    // a second agg over THESE (doc x bucket rows, not raw grams)
    val passNames = grams.columns.filter(c =>
      c != "doc_id" && c != "_tgt" && c != "b").toSeq
    // pinEager: tf feeds BOTH the model fit (counts -> stats -> lr) and
    // the scoring join — unpinned, the sha256-heavy gram explode would
    // recompute once per consumer (the r13 probe measured the 3-pass
    // version at ~3x: 174 s vs ~60 s at 600k docs). The pinned frame is
    // the slim (doc, bucket, n) projection, never the gram stream.
    val tf = graft.engine.PersistScope.pinEager(grams
      .groupBy($"doc_id" +: $"_tgt" +: passNames.map(col) :+ $"b": _*)
      .agg(count(lit(1)).as("n")))
    val counts = tf
      .groupBy($"b")
      .agg(
        sum($"n").as("c_raw"),
        sum(when($"_tgt" === 1, $"n").otherwise(0L)).as("c_tgt")
      )
    val stats = counts.agg(sum($"c_raw").as("nr"), sum($"c_tgt").as("nt"))
    val lr = counts
      .crossJoin(broadcast(stats))
      .select(
        $"b",
        (log(($"c_tgt" + 1.0) / ($"nt" + nBuckets)) -
          log(($"c_raw" + 1.0) / ($"nr" + nBuckets))).as("lr")
      )
    tf.join(broadcast(lr), Seq("b"))
      .groupBy($"doc_id" +: passNames.map(col): _*)
      .agg(round(sum($"n" * $"lr"), 6).as("logw"))
  }
}
