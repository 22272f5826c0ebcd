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
    )
  )
}
