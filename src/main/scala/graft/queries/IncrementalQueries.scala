package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.IncrementalOps
import QueryUtil._

/** Incremental corpus maintenance (operators.IncrementalOps): MERGE-style
  * upsert and snapshot diff, both hash-oracled by replaying the same
  * full-outer-join semantics in DuckDB. The "updates" / "new snapshot"
  * inputs are deterministic transforms of the documents fixture (modular
  * selections + text edits), so both engines derive identical inputs.
  */
object IncrementalQueries {

  val all: Seq[Q] = Seq(
    // MERGE upsert: refreshed docs (reversed text, doc_id % 7 == 0) update
    // in place, brand-new ids (doc_id + 100000) insert, the rest pass
    // through. The audit aggregation gates per-action row counts AND the
    // post-merge content (total chars) — a wrong coalesce side or a
    // dropped row moves the numbers.
    Q(
      "q_incr_upsert",
      (s, dir) => {
        val base = t(s, dir, "documents")
          .select($"doc_id", $"text", $"lang", $"source")
        val updates = base
          .filter($"doc_id" % 7 === 0)
          .withColumn("text", reverse($"text"))
          .unionByName(
            base
              .filter($"doc_id" < 5)
              .withColumn("doc_id", $"doc_id" + 100000)
          )
        IncrementalOps
          .merge(base, updates, "doc_id")
          .groupBy($"merge_action")
          .agg(
            count(lit(1)).as("n"),
            sum(length($"text")).cast("bigint").as("total_chars")
          )
          .orderBy($"merge_action")
      },
      Some(
        """WITH base AS (
          |  SELECT doc_id, text, lang, source FROM documents
          |), updates AS (
          |  SELECT doc_id, reverse(text) AS text, lang, source FROM base
          |  WHERE doc_id % 7 = 0
          |  UNION ALL
          |  SELECT doc_id + 100000 AS doc_id, text, lang, source FROM base
          |  WHERE doc_id < 5
          |), merged AS (
          |  SELECT CASE WHEN u.doc_id IS NOT NULL THEN u.text ELSE b.text END AS text,
          |         CASE WHEN u.doc_id IS NOT NULL AND b.doc_id IS NOT NULL
          |                THEN 'updated'
          |              WHEN u.doc_id IS NOT NULL THEN 'inserted'
          |              ELSE 'kept' END AS merge_action
          |  FROM base b FULL OUTER JOIN updates u ON b.doc_id = u.doc_id
          |)
          |SELECT merge_action, count(*) AS n,
          |       CAST(sum(length(text)) AS BIGINT) AS total_chars
          |FROM merged GROUP BY merge_action ORDER BY merge_action""".stripMargin
      )
    ),
    // Snapshot diff: new snapshot edits text on doc_id % 11 == 0, drops
    // doc_id % 13 == 0, adds three fresh ids — the diff must classify
    // every key into exactly one bucket. Null-safe compare (<=>) makes
    // 'changed' robust to null text in either snapshot.
    Q(
      "q_incr_diff",
      (s, dir) => {
        val old = t(s, dir, "documents").select($"doc_id", $"text")
        val news = old
          .filter($"doc_id" % 13 =!= 0)
          .withColumn(
            "text",
            when($"doc_id" % 11 === 0, concat($"text", lit(" v2")))
              .otherwise($"text")
          )
          .unionByName(
            old.filter($"doc_id" < 3).withColumn("doc_id", $"doc_id" + 200000)
          )
        IncrementalOps
          .snapshotDiff(old, news, "doc_id", Seq("text"))
          .groupBy($"change")
          .agg(count(lit(1)).as("n"))
          .orderBy($"change")
      },
      Some(
        """WITH oldsnap AS (
          |  SELECT doc_id, text FROM documents
          |), newsnap AS (
          |  SELECT doc_id,
          |         CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
          |  FROM oldsnap WHERE doc_id % 13 <> 0
          |  UNION ALL
          |  SELECT doc_id + 200000 AS doc_id, text FROM oldsnap WHERE doc_id < 3
          |)
          |SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
          |            WHEN n.doc_id IS NULL THEN 'removed'
          |            WHEN o.text IS DISTINCT FROM n.text THEN 'changed'
          |            ELSE 'unchanged' END AS change,
          |       count(*) AS n
          |FROM oldsnap o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id
          |GROUP BY change ORDER BY change""".stripMargin
      )
    )
  )
}
