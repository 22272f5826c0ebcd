package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import graft.sources.{BucketedTables, CsvSource, JsonSource, OrcSource}
import QueryUtil._

/** Source-layer queries: CSV scan with declared schema, the cross-source
  * federated join the reference advertises (README.md:201 — different
  * connectors joined in one query), and the events time-window rollup
  * (batch twin of the M5 streaming pipeline).
  *
  * The CSV inputs are temp-dir copies of the parquet fixtures, so the
  * DuckDB oracle (which reads the parquet) checks the CSV round-trip
  * end-to-end: write -> scan with declared schema -> query.
  */
object SourceQueries {

  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)
  ))

  private val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)
  ))

  /** Materialize (once per fixture dir + process) a REAL Iceberg metadata
    * table over `part` + an identity partition band `p_partkey % 4`:
    *   snapshot 1 appends bands 0,1,2 · snapshot 2 appends band 3 ·
    *   snapshot 3 deletes band 1 (copy-on-write: files stay, the new
    *   manifest marks them DELETED).
    * The three iceberg queries read snapshots of this one table.
    */
  private def fixtureIcebergTable(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    import graft.sources.IcebergWriter
    val root = graft.engine.TempDirs.workspace("graft-iceberg", "part", dir)
    graft.engine.TempDirs.materializeOnce(root)(
      java.nio.file.Files.exists(
        root.resolve("metadata").resolve("v3.metadata.json"))
    ) {
      // a half-built table (crashed prior attempt in THIS process) would
      // double-append on retry: start clean
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
      val df = t(s, dir, "part")
        .withColumn("p_band", (col("p_partkey") % 4).cast("int"))
      IcebergWriter.append(s, root.toString, df.filter(col("p_band") < 3),
        Some("p_band"), timestampMs = 1000L)
      IcebergWriter.append(s, root.toString, df.filter(col("p_band") === 3),
        Some("p_band"), timestampMs = 2000L)
      IcebergWriter.deletePartitions(s, root.toString, "p_band", Set(1),
        timestampMs = 3000L)
    }
    root.toString
  }

  /** Materialize (once per fixture dir + process) a format-v2 Iceberg
    * table over `embeddings` whose payload is a primitive-element LIST
    * column (`array<float>`) — the r17 schema extension that makes
    * embedding corpora first-class Iceberg bases:
    *   snapshot 1 appends vec_id % 4 != 3 · snapshot 2 appends the rest
    *   · snapshot 3 equality-UPSERTS vec_id % 8 == 0 with REVERSED
    *   embeddings (array data files riding the MoR delete machinery).
    * The metadata JSON carries the spec's nested list object form;
    * reads resolve it back to ArrayType through the explicit schema.
    */
  private def fixtureIcebergArrayTable(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    import graft.sources.IcebergWriter
    val root = graft.engine.TempDirs.workspace("graft-iceberg", "arrayemb", dir)
    graft.engine.TempDirs.materializeOnce(root)(
      java.nio.file.Files.exists(
        root.resolve("metadata").resolve("v3.metadata.json"))
    ) {
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), col("label"))
      IcebergWriter.append(s, root.toString,
        emb.filter(col("vec_id") % 4 =!= 3), None, timestampMs = 1000L,
        formatVersion = 2)
      IcebergWriter.append(s, root.toString,
        emb.filter(col("vec_id") % 4 === 3), None, timestampMs = 2000L)
      IcebergWriter.upsertRows(s, root.toString,
        emb.filter(col("vec_id") % 8 === 0)
          .select(col("vec_id"), reverse(col("embedding")).as("embedding"),
            col("label")),
        "vec_id", timestampMs = 3000L)
    }
    root.toString
  }

  /** Materialize (once per fixture dir + process) a format-v2 Iceberg
    * table over `part` exercising MERGE-ON-READ — the state any table
    * written by Flink CDC / Spark MERGE is in:
    *   snapshot 1 (seq 1) appends bands 0,1,2 · snapshot 2 (seq 2)
    *   appends band 3 · snapshot 3 (seq 3) POSITION-deletes rows with
    *   p_size < 25 · snapshot 4 (seq 4) EQUALITY-deletes p_band=2 ·
    *   snapshot 5 (seq 5) re-appends band-2 rows with p_size > 30, which
    *   must SURVIVE the earlier equality delete (sequence scoping).
    */
  private def fixtureIcebergV2Table(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    import graft.sources.IcebergWriter
    val root = graft.engine.TempDirs.workspace("graft-iceberg", "v2part", dir)
    graft.engine.TempDirs.materializeOnce(root)(
      java.nio.file.Files.exists(
        root.resolve("metadata").resolve("v5.metadata.json"))
    ) {
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
      val df = t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_size"))
        .withColumn("p_band", (col("p_partkey") % 4).cast("int"))
      IcebergWriter.append(s, root.toString, df.filter(col("p_band") < 3),
        None, timestampMs = 1000L, formatVersion = 2)
      IcebergWriter.append(s, root.toString, df.filter(col("p_band") === 3),
        None, timestampMs = 2000L)
      IcebergWriter.deleteRowsWhere(s, root.toString, col("p_size") < 25,
        timestampMs = 3000L)
      import s.implicits._
      IcebergWriter.deleteEquality(s, root.toString,
        Seq(2).toDF("p_band"), timestampMs = 4000L)
      IcebergWriter.append(s, root.toString,
        df.filter(col("p_band") === 2 && col("p_size") > 30),
        None, timestampMs = 5000L): Unit
    }
    root.toString
  }

  /** Materialize (once per fixture dir + process) a MANIFEST-REWRITTEN
    * v2 table: snapshots 1-3 are the MoR shape (append all, equality-
    * delete band 2, re-append the band-2 p_size>30 rows); snapshot 4 is
    * [[graft.sources.IcebergWriter.rewriteManifests]] — metadata-only
    * consolidation carrying every entry as EXISTING with its ORIGINAL
    * sequence number; snapshot 5 appends post-rewrite rows. The read
    * gates exactly what a broken rewrite would corrupt: the carried
    * eq-delete must still reach ONLY seq-1 data (band-2 base rows dead,
    * seq-3 re-appends alive) after its manifest was rewritten.
    */
  private def fixtureIcebergManifestsTable(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    import graft.sources.IcebergWriter
    val root = graft.engine.TempDirs.workspace("graft-iceberg", "manifests", dir)
    graft.engine.TempDirs.materializeOnce(root)(
      java.nio.file.Files.exists(
        root.resolve("metadata").resolve("v5.metadata.json"))
    ) {
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
      val df = t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_size"))
        .withColumn("p_band", (col("p_partkey") % 4).cast("int"))
      val kT = df.schema("p_partkey").dataType
      val sT = df.schema("p_size").dataType
      IcebergWriter.append(s, root.toString, df, None,
        timestampMs = 1000L, formatVersion = 2)
      import s.implicits._
      IcebergWriter.deleteEquality(s, root.toString,
        Seq(2).toDF("p_band"), timestampMs = 2000L)
      IcebergWriter.append(s, root.toString,
        df.filter(col("p_band") === 2 && col("p_size") > 30),
        None, timestampMs = 3000L)
      IcebergWriter.rewriteManifests(s, root.toString, timestampMs = 4000L)
      IcebergWriter.append(s, root.toString,
        df.filter(col("p_partkey") % 17 === 0).select(
          (col("p_partkey") + 3000000L).cast(kT).as("p_partkey"),
          concat(lit("post-"), col("p_partkey")).as("p_name"),
          lit(5).cast(sT).as("p_size"),
          lit(9).cast("int").as("p_band")),
        None, timestampMs = 5000L): Unit
    }
    root.toString
  }

  /** Materialize (once per fixture dir + process) a v2 table that went
    * through BOTH single-commit write flavors ([[graft.sources
    * .IcebergWriter]]): snapshot 1 appends all of `part`; snapshot 2 is
    * a position-delete MERGE (`mergeRows`: p_size+100 for p_partkey % 5
    * == 0, 'merged-' inserts at +1000000 per % 7 == 0); snapshot 3 is an
    * equality-delete UPSERT (`upsertRows`: 'upserted-'/p_size=7 for
    * % 11 == 0, 'ups-new-' inserts at +2000000 per % 13 == 0); snapshot
    * 4 COMPACTS — rewrites the delete-applied state into clean data
    * files (`compact`), leaving snapshots 2/3 reachable by time travel.
    * Key offsets keep the insert spaces collision-free at any fixture
    * SF, and no upsert key collides with a merge insert (upsert keys
    * are original part keys or +2000000).
    */
  /** Oracle for the merge-then-upsert logical state — shared VERBATIM by
    * `q_iceberg_upsert` (snapshot-3 MoR read: base + pos-delete +
    * eq-delete subtraction) and `q_iceberg_compacted` (current read off
    * the rewritten files): same rows from two physically different
    * layouts is exactly the compaction contract.
    */
  private val icebergUpsertOracle: String =
    "SELECT p_partkey, " +
      "CASE WHEN p_partkey % 11 = 0 THEN 'upserted-' || CAST(p_partkey AS VARCHAR) " +
      "ELSE p_name END AS p_name, " +
      "CASE WHEN p_partkey % 11 = 0 THEN 7 " +
      "WHEN p_partkey % 5 = 0 THEN p_size + 100 ELSE p_size END AS p_size " +
      "FROM part " +
      "UNION ALL " +
      "SELECT p_partkey + 1000000 AS p_partkey, " +
      "'merged-' || CAST(p_partkey AS VARCHAR) AS p_name, 1 AS p_size " +
      "FROM part WHERE p_partkey % 7 = 0 " +
      "UNION ALL " +
      "SELECT p_partkey + 2000000 AS p_partkey, " +
      "'ups-new-' || CAST(p_partkey AS VARCHAR) AS p_name, 3 AS p_size " +
      "FROM part WHERE p_partkey % 13 = 0 " +
      "ORDER BY p_partkey"

  private def fixtureIcebergMergeTable(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    import graft.sources.IcebergWriter
    val root = graft.engine.TempDirs.workspace("graft-iceberg", "mergev2", dir)
    graft.engine.TempDirs.materializeOnce(root)(
      java.nio.file.Files.exists(
        root.resolve("metadata").resolve("v4.metadata.json"))
    ) {
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
      val df = t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_size"))
      IcebergWriter.append(s, root.toString, df, None,
        timestampMs = 1000L, formatVersion = 2)
      // explicit casts pin the updates frame to the table's column types
      // (a widened +1000000 long over an int key would fail the writer's
      // schema gate, by design)
      val kT = df.schema("p_partkey").dataType
      val sT = df.schema("p_size").dataType
      val updates = df
        .filter(col("p_partkey") % 5 === 0)
        .withColumn("p_size", (col("p_size") + lit(100)).cast(sT))
        .unionByName(df.filter(col("p_partkey") % 7 === 0).select(
          (col("p_partkey") + 1000000L).cast(kT).as("p_partkey"),
          concat(lit("merged-"), col("p_partkey")).as("p_name"),
          lit(1).cast(sT).as("p_size")))
      IcebergWriter.mergeRows(s, root.toString, updates, "p_partkey",
        timestampMs = 2000L)
      val upserts = df
        .filter(col("p_partkey") % 11 === 0)
        .select(
          col("p_partkey"),
          concat(lit("upserted-"), col("p_partkey")).as("p_name"),
          lit(7).cast(sT).as("p_size"))
        .unionByName(df.filter(col("p_partkey") % 13 === 0).select(
          (col("p_partkey") + 2000000L).cast(kT).as("p_partkey"),
          concat(lit("ups-new-"), col("p_partkey")).as("p_name"),
          lit(3).cast(sT).as("p_size")))
      IcebergWriter.upsertRows(s, root.toString, upserts, "p_partkey",
        timestampMs = 3000L)
      IcebergWriter.compact(s, root.toString, timestampMs = 4000L): Unit
    }
    root.toString
  }

  /** Materialize (once per fixture dir + process) a SCHEMA-EVOLVED v2
    * table: snapshot 1 appends (p_partkey, p_name) from `part`;
    * `addColumn("p_score", double)` evolves the schema metadata-only;
    * snapshot 2 appends 'ev-' rows (per p_partkey % 9 == 0, +3000000
    * key offset) WITH scores. Old files read p_score as null.
    */
  private def fixtureIcebergEvolvedTable(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    import graft.sources.IcebergWriter
    val root = graft.engine.TempDirs.workspace("graft-iceberg", "evolved", dir)
    graft.engine.TempDirs.materializeOnce(root)(
      java.nio.file.Files.exists(
        root.resolve("metadata").resolve("v3.metadata.json"))
    ) {
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
      val df = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
      IcebergWriter.append(s, root.toString, df, None,
        timestampMs = 1000L, formatVersion = 2)
      IcebergWriter.addColumn(root.toString, "p_score", "double",
        timestampMs = 2000L)
      val kT = df.schema("p_partkey").dataType
      IcebergWriter.append(s, root.toString,
        df.filter(col("p_partkey") % 9 === 0).select(
          (col("p_partkey") + 3000000L).cast(kT).as("p_partkey"),
          concat(lit("ev-"), col("p_partkey")).as("p_name"),
          (col("p_partkey").cast("double") / 2).as("p_score")),
        None, timestampMs = 3000L): Unit
    }
    root.toString
  }

  /** Materialize (once per fixture dir + process) a v2 table that went
    * through the FULL column-evolution lifecycle: snapshot 1 appends
    * (p_partkey, p_name, p_size); `renameColumn` p_size -> p_weight
    * (metadata-only, field id kept — old files keep reading by id);
    * `dropColumn` p_name; `addColumn` p_name back (FRESH field id, so
    * old files' p_name must NOT resurrect); snapshot 2 appends 'rn-'
    * rows (per p_partkey % 6 == 0, +4000000 key offset) under the
    * evolved shape.
    */
  private def fixtureIcebergRenamedTable(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    import graft.sources.IcebergWriter
    val root = graft.engine.TempDirs.workspace("graft-iceberg", "renamed", dir)
    graft.engine.TempDirs.materializeOnce(root)(
      java.nio.file.Files.exists(
        root.resolve("metadata").resolve("v5.metadata.json"))
    ) {
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
      val df = t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_size"))
      IcebergWriter.append(s, root.toString, df, None,
        timestampMs = 1000L, formatVersion = 2)
      IcebergWriter.renameColumn(root.toString, "p_size", "p_weight", 2000L)
      IcebergWriter.dropColumn(root.toString, "p_name", 3000L)
      IcebergWriter.addColumn(root.toString, "p_name", "string", 4000L)
      val kT = df.schema("p_partkey").dataType
      val szT = df.schema("p_size").dataType
      IcebergWriter.append(s, root.toString,
        df.filter(col("p_partkey") % 6 === 0).select(
          (col("p_partkey") + 4000000L).cast(kT).as("p_partkey"),
          (col("p_size") + 1000).cast(szT).as("p_weight"),
          concat(lit("rn-"), col("p_partkey")).as("p_name")),
        None, timestampMs = 5000L): Unit
    }
    root.toString
  }

  /** Materialize (once per fixture dir + process) a v2 table that went
    * through the full WRITE-AUDIT-PUBLISH lifecycle over refs:
    * snapshot 1 appends bands 0,1 of `part` (main); tag `prepub` pins
    * s1; branch `audit` takes TWO commits (band 2 at s2, band 3's
    * p_size>30 "quality-gated" rows at s3) while main stays at s1; then
    * `fastForward` publishes — main flips to s3 atomically. The tag
    * keeps naming the pre-publish state forever.
    */
  private def fixtureIcebergBranchTable(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    import graft.sources.IcebergWriter
    val root = graft.engine.TempDirs.workspace("graft-iceberg", "branch", dir)
    // six metadata commits: append(v1), tag(v2), branch(v3), two branch
    // appends(v4,v5), publish(v6) — materializeOnce keys on the last
    graft.engine.TempDirs.materializeOnce(root)(
      java.nio.file.Files.exists(
        root.resolve("metadata").resolve("v6.metadata.json"))
    ) {
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
      val df = t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_size"))
        .withColumn("p_band", (col("p_partkey") % 4).cast("int"))
      IcebergWriter.append(s, root.toString, df.filter(col("p_band") < 2),
        None, timestampMs = 1000L, formatVersion = 2) // s1
      IcebergWriter.createTag(root.toString, "prepub", 1500L)
      IcebergWriter.createBranch(root.toString, "audit", 1600L)
      IcebergWriter.appendToBranch(s, root.toString,
        df.filter(col("p_band") === 2), "audit", 2000L) // s2
      IcebergWriter.appendToBranch(s, root.toString,
        df.filter(col("p_band") === 3 && col("p_size") > 30), "audit", 3000L) // s3
      IcebergWriter.fastForward(root.toString, "audit", 4000L): Unit
    }
    root.toString
  }

  /** Materialize (once per fixture dir + process) the EVENTS fixture as a
    * MULTI-FIELD-partitioned v2 table: identity(event_type) x day(ts) —
    * the classic event-lake layout (5 types x 30 days ≈ 150 tuples).
    * The raw ts stays in the data files; event_type is identity-dropped
    * into the dirs and reconstituted on read.
    */
  private def fixtureIcebergMultipartTable(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    import graft.sources.IcebergWriter
    val root = graft.engine.TempDirs.workspace("graft-iceberg", "multipart", dir)
    graft.engine.TempDirs.materializeOnce(root)(
      java.nio.file.Files.exists(
        root.resolve("metadata").resolve("v1.metadata.json"))
    ) {
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
      IcebergWriter.appendPartitioned(s, root.toString,
        events(s, dir).select(
          col("event_id"), col("event_type"), col("ts"), col("value")),
        Seq(
          IcebergWriter.PartitionTransform("event_type"),
          IcebergWriter.PartitionTransform("ts", "day")),
        1000L, 2, Map.empty): Unit
    }
    root.toString
  }

  /** Materialize (once per fixture dir + process) a RANGE-CLUSTERED v2
    * table over `lineitem`: 8 files with disjoint l_orderkey ranges
    * (repartitionByRange + sortWithinPartitions — the state a sorted or
    * Z-ordered rewrite leaves). The writer harvests per-file column
    * min/max into the manifests, so a key-range scan skips whole files.
    */
  private def fixtureIcebergClusteredTable(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    import graft.sources.IcebergWriter
    val root = graft.engine.TempDirs.workspace("graft-iceberg", "clustered", dir)
    graft.engine.TempDirs.materializeOnce(root)(
      java.nio.file.Files.exists(
        root.resolve("metadata").resolve("v1.metadata.json"))
    ) {
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
      val df = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
        .repartitionByRange(8, col("l_orderkey"))
        .sortWithinPartitions(col("l_orderkey"))
      IcebergWriter.append(s, root.toString, df, None,
        timestampMs = 1000L, formatVersion = 2): Unit
    }
    root.toString
  }

  /** q_iceberg_events_hour's DYNAMIC oracle (Q.oracleFn, same
    * last-writer-wins holder contract as SimilarityQueries.ivfOracle):
    * the SQL embeds the hour the run actually targeted — the hour of the
    * fixture's earliest event, discovered at run time.
    */
  private val eventsHourOracle =
    new java.util.concurrent.atomic.AtomicReference[Option[String]](None)

  /** Materialize (once per fixture dir + process) the EVENTS fixture as
    * an `hour(ts)`-hidden-partitioned v2 Iceberg table — the layout an
    * event-ingest pipeline actually uses (30 fixture days -> ~720 hour
    * manifests). The raw ts stays in the data; only the hour ordinal
    * shapes the layout.
    */
  private def fixtureIcebergEventsHourTable(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    import graft.sources.IcebergWriter
    val root = graft.engine.TempDirs.workspace("graft-iceberg", "eventshour", dir)
    graft.engine.TempDirs.materializeOnce(root)(
      java.nio.file.Files.exists(
        root.resolve("metadata").resolve("v1.metadata.json"))
    ) {
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
      IcebergWriter.appendPartitioned(s, root.toString, events(s, dir),
        Some(IcebergWriter.PartitionTransform("ts", "hour")),
        timestampMs = 1000L, formatVersion = 2): Unit
    }
    root.toString
  }

  /** Materialize (once per fixture dir + process) a HIDDEN-partitioned
    * Iceberg table: `day(o_date)` — the data files keep the raw date
    * column; only the transformed day ordinal shapes the layout and the
    * manifest summaries. 8 distinct days -> 8 manifests, so a one-day
    * predicate must open 1 (SourcesSpec pins the count on its own table).
    */
  private def fixtureIcebergDayTable(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    import graft.sources.IcebergWriter
    val root = graft.engine.TempDirs.workspace("graft-iceberg", "daypart", dir)
    graft.engine.TempDirs.materializeOnce(root)(
      java.nio.file.Files.exists(
        root.resolve("metadata").resolve("v1.metadata.json"))
    ) {
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
      // a synthetic ingest date with guaranteed density at every SF: the
      // oracle replays the same o_orderkey % 8 mapping
      val df = t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          date_add(lit("1995-03-01").cast("date"),
            (col("o_orderkey") % 8).cast("int")).as("o_date"))
      IcebergWriter.appendPartitioned(s, root.toString, df,
        Some(IcebergWriter.PartitionTransform("o_date", "day")),
        timestampMs = 1000L): Unit
    }
    root.toString
  }

  /** Materialize (once per fixture dir + process) a v2 table whose
    * PARTITION SPEC EVOLVED mid-life: snapshot 1 appends a third of
    * `orders` (o_orderkey % 3 == 0, synthetic o_date = 1995-03-01 +
    * o_orderkey % 8) FLAT (unpartitioned); `evolveSpec` switches the
    * default to hidden day(o_date); snapshot 2 appends the rest under
    * the day layout. The two generations coexist: flat files directly
    * under data/, day files under o_date_day=N/ dirs.
    */
  private def fixtureIcebergSpecEvolvedTable(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    import graft.sources.IcebergWriter
    val root = graft.engine.TempDirs.workspace("graft-iceberg", "specevolved", dir)
    graft.engine.TempDirs.materializeOnce(root)(
      java.nio.file.Files.exists(
        root.resolve("metadata").resolve("v3.metadata.json"))
    ) {
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
      val df = t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          date_add(lit("1995-03-01").cast("date"),
            (col("o_orderkey") % 8).cast("int")).as("o_date"))
      IcebergWriter.append(s, root.toString,
        df.filter(col("o_orderkey") % 3 === 0), None,
        timestampMs = 1000L, formatVersion = 2)
      IcebergWriter.evolveSpec(root.toString,
        Some(IcebergWriter.PartitionTransform("o_date", "day")), 2000L)
      IcebergWriter.appendPartitioned(s, root.toString,
        df.filter(col("o_orderkey") % 3 =!= 0),
        Some(IcebergWriter.PartitionTransform("o_date", "day")),
        timestampMs = 3000L): Unit
    }
    root.toString
  }

  val all: Seq[Q] = Seq(
    // CSV scan with declared schema + header (reference:
    // coordinator/src/main.rs:33-43).
    Q(
      "q_csv_scan",
      (s, dir) => {
        val csv = CsvSource.csvCopyOfParquet(s, s"$dir/nation.parquet", "nation")
        CsvSource
          .read(s, csv, nationSchema, header = true)
          .filter($"n_regionkey" < 3)
          .select($"n_nationkey", $"n_name", $"n_regionkey")
          .orderBy($"n_nationkey")
      },
      Some(
        "SELECT n_nationkey, n_name, n_regionkey FROM nation " +
          "WHERE n_regionkey < 3 ORDER BY n_nationkey"
      )
    ),
    // JSONL scan with declared schema: parquet -> JSONL round-trip gated
    // by the parquet oracle (same pattern as q_csv_scan). Doubles survive
    // the trip exactly: Spark's JSON writer emits shortest-round-trip
    // digits and the reader parses them back to the identical bits.
    Q(
      "q_json_scan",
      (s, dir) => {
        val json =
          JsonSource.jsonCopyOfParquet(s, s"$dir/supplier.parquet", "supplier")
        JsonSource
          .read(s, json, supplierSchema)
          .filter($"s_acctbal" > 0)
          .select($"s_suppkey", $"s_name", $"s_nationkey", $"s_acctbal")
          .orderBy($"s_suppkey")
      },
      Some(
        "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier " +
          "WHERE s_acctbal > 0 ORDER BY s_suppkey"
      )
    ),
    // ORC scan: parquet -> ORC round-trip gated by the parquet oracle
    // (same pattern as q_csv_scan/q_json_scan). Spark's native ORC reader
    // is vectorized with pushdown + pruning, so a Hive-era ORC table gets
    // the same scan treatment as parquet; decimals and dates survive the
    // trip exactly (both formats store them losslessly).
    Q(
      "q_orc_scan",
      (s, dir) => {
        val orc = OrcSource.orcCopyOfParquet(s, s"$dir/customer.parquet", "customer")
        OrcSource
          .read(s, orc)
          .filter($"c_acctbal" > 0)
          .select($"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal")
          .orderBy($"c_custkey")
      },
      Some(
        "SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer " +
          "WHERE c_acctbal > 0 ORDER BY c_custkey"
      )
    ),
    // Bucket-co-located fact-fact join: both sides written bucketed+sorted
    // by the join key into the same bucket count, so the orders ⋈ lineitem
    // join plans WITHOUT a shuffle on either side (PlanSpec pins the
    // exchange-free join subtree). This is the pay-once storage layout
    // that makes the recurring 100 TB fact join scan-local; the oracle
    // replays the same join over the original parquet, gating that the
    // bucketed write+read round-trip loses nothing.
    Q(
      "q_bucketed_join",
      (s, dir) => {
        val o = BucketedTables.bucketedCopy(s, dir, "orders", "o_orderkey", 8)
        val l = BucketedTables.bucketedCopy(s, dir, "lineitem", "l_orderkey", 8)
        s.table(o)
          .join(s.table(l), $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_orderpriority")
          .agg(
            count(lit(1)).as("n_lines"),
            asDouble(sum(dec2($"l_extendedprice") * (lit(1).cast(DecimalType(4, 2)) - pct($"l_discount"))))
              .as("revenue")
          )
          .orderBy($"o_orderpriority")
      },
      Some(
        "SELECT o_orderpriority, count(*) AS n_lines, " +
          "CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * " +
          "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue " +
          "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
          "GROUP BY o_orderpriority ORDER BY o_orderpriority"
      )
    ),
    // Z-order layout key (operators.ZOrderLayout): Morton-interleave
    // (partkey, suppkey) and aggregate per 16x16 tile — the min/max
    // ranges PROVE the layout property (both dimensions bounded per
    // tile), which is what makes file skipping work for 2-dim predicates
    // after writeZOrdered. Oracle mirrors the bit arithmetic digit for
    // digit.
    Q(
      "q_zorder_tiles",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val a = pmod($"l_partkey", lit(256))
        val b = pmod($"l_suppkey", lit(256))
        li.select(
            a.as("a"),
            b.as("b"),
            graft.operators.ZOrderLayout.zorderKey(a, b, 8).as("zkey")
          )
          .select(shiftright($"zkey", 8).as("tile"), $"a", $"b")
          .groupBy($"tile")
          .agg(
            count(lit(1)).as("n"),
            min($"a").as("min_a"),
            max($"a").as("max_a"),
            min($"b").as("min_b"),
            max($"b").as("max_b")
          )
          .orderBy($"tile")
      },
      Some {
        val zexpr = (0 until 8)
          .map(i =>
            s"(((a >> $i) & 1) << ${2 * i}) | (((b >> $i) & 1) << ${2 * i + 1})")
          .mkString(" | ")
        s"""WITH dmm AS (
           |  SELECT l_partkey % 256 AS a, l_suppkey % 256 AS b FROM lineitem
           |), z AS (SELECT a, b, ($zexpr) AS zkey FROM dmm)
           |SELECT zkey >> 8 AS tile, count(*) AS n,
           |       min(a) AS min_a, max(a) AS max_a,
           |       min(b) AS min_b, max(b) AS max_b
           |FROM z GROUP BY tile ORDER BY tile""".stripMargin
      }
    ),
    // Iceberg-layout scan: a temp copy of `part` laid out as an Iceberg
    // table directory (data/ + metadata/version-hint.text), read through
    // IcebergSource (runtime-detecting; directory-scan fallback here).
    // The oracle reads the parquet original, gating the whole round-trip.
    Q(
      "q_iceberg_scan",
      (s, dir) => {
        val root = fixtureIcebergTable(s, dir)
        graft.sources.IcebergSource
          .read(s, root)
          .filter($"p_size" > 40)
          .select($"p_partkey", $"p_name", $"p_size")
          .orderBy($"p_partkey")
      },
      // current snapshot = after the band-1 delete: the oracle replays the
      // delete as a predicate over the original parquet, gating the whole
      // metadata chain (hint -> json -> manifest list -> manifests ->
      // status filter) on real row content
      Some(
        "SELECT p_partkey, p_name, p_size FROM part " +
          "WHERE p_size > 40 AND p_partkey % 4 <> 1 ORDER BY p_partkey"
      )
    ),
    // Time-travel: as-of snapshot 1 (before the band-3 append and the
    // band-1 delete) — the manifest list that snapshot pinned at commit
    // time still resolves exactly bands 0,1,2, no matter how many
    // snapshots came later. At 100 TB this is the reproducibility story:
    // yesterday's training run re-reads yesterday's exact file set.
    Q(
      "q_iceberg_timetravel",
      (s, dir) => {
        val root = fixtureIcebergTable(s, dir)
        graft.sources.IcebergSource
          .read(s, root, snapshotId = Some(1L), asOfTimestampMs = None, prune = None)
          .groupBy($"p_band")
          .agg(
            count(lit(1)).as("n"),
            sum($"p_size").as("sum_size"),
            min($"p_partkey").as("min_pk"),
            max($"p_partkey").as("max_pk"))
          .orderBy($"p_band")
      },
      Some(
        "SELECT CAST(p_partkey % 4 AS INT) AS p_band, count(*) AS n, " +
          "CAST(sum(p_size) AS BIGINT) AS sum_size, " +
          "min(p_partkey) AS min_pk, max(p_partkey) AS max_pk " +
          "FROM part WHERE p_partkey % 4 < 3 GROUP BY 1 ORDER BY p_band"
      )
    ),
    // Manifest pruning: the identity-partition equality predicate is
    // resolved against the manifest list's field summaries, so planning
    // opens 1 of 4 manifests and hands Spark exactly band 0's files
    // (SourcesSpec pins manifestsRead === 1; this oracle pins the rows).
    Q(
      "q_iceberg_pruned",
      (s, dir) => {
        val root = fixtureIcebergTable(s, dir)
        graft.sources.IcebergSource
          .read(s, root, snapshotId = None, asOfTimestampMs = None,
            prune = Some(graft.sources.IcebergMeta.PartitionEquals("p_band", 0)))
          .select($"p_partkey", $"p_name", $"p_band")
          .orderBy($"p_partkey")
      },
      Some(
        "SELECT p_partkey, p_name, CAST(p_partkey % 4 AS INT) AS p_band " +
          "FROM part WHERE p_partkey % 4 = 0 ORDER BY p_partkey"
      )
    ),
    // METADATA TABLES: per-partition row counts straight from the
    // manifests' record_count — zero data files opened (the ops view a
    // 100-TB operator watches instead of scanning). Band 1 is COW-
    // deleted at the current snapshot, so its files are absent: the
    // oracle's <> 1 filter gates that the files view reflects the LIVE
    // set, not the directory contents.
    Q(
      "q_iceberg_filestats",
      (s, dir) => {
        val root = fixtureIcebergTable(s, dir)
        graft.sources.IcebergMetaTables.files(s, root)
          .filter($"content" === 0)
          .groupBy($"partition"("p_band").cast("int").as("p_band"))
          .agg(sum($"record_count").as("n_rows"))
          .orderBy($"p_band")
      },
      Some(
        "SELECT CAST(p_partkey % 4 AS INT) AS p_band, count(*) AS n_rows " +
          "FROM part WHERE p_partkey % 4 <> 1 GROUP BY 1 ORDER BY p_band"
      )
    ),
    // IN-SET pruning: a multi-value predicate over the identity
    // partition opens exactly the matching bands' manifests (2 of 4 —
    // SourcesSpec pins the counts on its own tables) — the shape a
    // dim-driven fact scan produces ("these two segments"). Band 1 is
    // in the set AND deleted at the current snapshot, so the oracle's
    // %4=3 branch also gates that IN-pruning composes with the COW
    // delete replay.
    Q(
      "q_iceberg_inpruned",
      (s, dir) => {
        val root = fixtureIcebergTable(s, dir)
        graft.sources.IcebergSource
          .read(s, root, None, None,
            Some(graft.sources.IcebergMeta.PartitionIn("p_band", Set(1, 3))))
          .select($"p_partkey", $"p_name", $"p_band")
          .orderBy($"p_partkey")
      },
      Some(
        "SELECT p_partkey, p_name, CAST(p_partkey % 4 AS INT) AS p_band " +
          "FROM part WHERE p_partkey % 4 = 3 ORDER BY p_partkey"
      )
    ),
    // ----- dynamic partition pruning -----------------------------------------
    // The #1 scan-pruning lever at 100 TB: the fact is stored hive-
    // partitioned by month, the quarter filter lives on a tiny dim, and
    // Catalyst injects a DynamicPruningExpression on the fact scan whose
    // IN-set is the dim's broadcast result — 3 of 80 month directories are
    // read, decided at RUNTIME from the dim filter, with zero static
    // knowledge of which months '1995-Q1' covers. PlanSpec pins both the
    // injected pruning expression and the partitions-read metric (3), so a
    // conf or layout regression that silently reads all 80 fails CI. The
    // oracle replays the same join over the original parquet, gating the
    // partitioned write+read round-trip as well as the join semantics.
    Q(
      "q_dpp_join",
      (s, dir) => {
        val fact = graft.sources.PartitionedTables.ordersByMonth(s, dir)
        val dim = graft.sources.PartitionedTables.monthDim(s, "1992-01-01", 168)
        fact
          .join(
            broadcast(dim.filter($"quarter" === "1995-Q1")),
            $"o_month" === $"month"
          )
          .groupBy($"o_month")
          .agg(
            count(lit(1)).as("n_orders"),
            asDouble(sum(dec2($"o_totalprice"))).as("total_price")
          )
          .orderBy($"o_month")
      },
      Some(
        """WITH dim AS (
          |  SELECT CAST(d AS DATE) AS month,
          |         CAST(year(d) AS VARCHAR) || '-Q' || CAST(quarter(d) AS VARCHAR) AS quarter
          |  FROM generate_series(TIMESTAMP '1992-01-01', TIMESTAMP '2005-12-01', INTERVAL 1 MONTH) t(d)
          |)
          |SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS o_month,
          |       count(*) AS n_orders,
          |       CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
          |FROM orders JOIN dim ON CAST(date_trunc('month', o_orderdate) AS DATE) = dim.month
          |WHERE dim.quarter = '1995-Q1'
          |GROUP BY 1 ORDER BY 1""".stripMargin
      )
    ),
    // Incremental read: the NET APPENDS of the snapshot window (1, current]
    // — band 3 was appended by snapshot 2; band 1's files were added
    // BEFORE the window and band 1 is deleted at current anyway. The
    // "process only what landed since the last run" primitive, planned
    // entirely from KB-scale metadata — at 100 TB this is what lets a
    // daily pipeline touch one day's files instead of re-listing the lake.
    Q(
      "q_iceberg_incremental",
      (s, dir) => {
        val root = fixtureIcebergTable(s, dir)
        graft.sources.IcebergSource
          .readAppendsSince(s, root, fromSnapshotId = 1L)
          .select($"p_partkey", $"p_name", $"p_band")
          .orderBy($"p_partkey")
      },
      Some(
        "SELECT p_partkey, p_name, CAST(p_partkey % 4 AS INT) AS p_band " +
          "FROM part WHERE p_partkey % 4 = 3 ORDER BY p_partkey"
      )
    ),
    // Hidden-partition pruning: the predicate is on the SOURCE column
    // (the user never sees the day() partition field); planning runs the
    // transform on the literal and prunes manifests via the summaries of
    // the transformed values — 1 of 8 day-manifests opened (SourcesSpec
    // pins the count), and the oracle replays the date derivation over
    // the original parquet to gate the whole layout round-trip.
    Q(
      "q_iceberg_daypruned",
      (s, dir) => {
        val root = fixtureIcebergDayTable(s, dir)
        graft.sources.IcebergSource
          .read(s, root, snapshotId = None, asOfTimestampMs = None,
            prune = Some(graft.sources.IcebergMeta.PartitionEquals(
              "o_date", java.time.LocalDate.of(1995, 3, 4))))
          .select($"o_orderkey", $"o_custkey", $"o_date")
          .orderBy($"o_orderkey")
      },
      Some(
        "SELECT o_orderkey, o_custkey, " +
          "CAST(DATE '1995-03-01' + CAST(o_orderkey % 8 AS INTEGER) AS DATE) AS o_date " +
          "FROM orders WHERE o_orderkey % 8 = 3 ORDER BY o_orderkey"
      )
    ),
    // v2 merge-on-read, position deletes: time-travel to snapshot 3 —
    // right after a MERGE-shaped row-level delete (one parquet of
    // (file_path, pos), no data file rewritten). The scan anti-joins the
    // broadcast delete positions against `_metadata.row_index`, so the
    // oracle replaying the predicate over the original parquet gates the
    // whole chain: delete-file write -> v2 manifest (content=1, sequence
    // numbers) -> plan -> sequence-scoped position subtraction.
    Q(
      "q_iceberg_posdelete",
      (s, dir) => {
        val root = fixtureIcebergV2Table(s, dir)
        graft.sources.IcebergSource
          .read(s, root, snapshotId = Some(3L), asOfTimestampMs = None, prune = None)
          .select($"p_partkey", $"p_name", $"p_size")
          .orderBy($"p_partkey")
      },
      Some(
        "SELECT p_partkey, p_name, p_size FROM part " +
          "WHERE p_size >= 25 ORDER BY p_partkey"
      )
    ),
    // v2 merge-on-read, equality deletes + sequence scoping: the current
    // snapshot has BOTH delete kinds live, and band 2 was re-appended
    // AFTER its equality delete — those rows must survive (equality
    // deletes reach only data files with a strictly LOWER sequence
    // number). The oracle's band-2 branch pins exactly that: p_size>30
    // re-appends present, everything else from band 2 gone.
    Q(
      "q_iceberg_eqdelete",
      (s, dir) => {
        val root = fixtureIcebergV2Table(s, dir)
        graft.sources.IcebergSource
          .read(s, root)
          .select($"p_partkey", $"p_name", $"p_size", $"p_band")
          .orderBy($"p_partkey")
      },
      Some(
        "SELECT p_partkey, p_name, p_size, CAST(p_partkey % 4 AS INT) AS p_band " +
          "FROM part WHERE (p_partkey % 4 IN (0,1,3) AND p_size >= 25) " +
          "OR (p_partkey % 4 = 2 AND p_size > 30) ORDER BY p_partkey"
      )
    ),
    // v2 merge-on-read WRITE path: the table went through a single-commit
    // MERGE (position-delete file + new data files in ONE snapshot —
    // IcebergWriter.mergeRows). Reading the post-MERGE table back gates
    // the whole chain: matched rows replaced (old positions subtracted,
    // same-commit re-inserts survive the same-sequence delete because
    // position deletes bind to file paths), unmatched rows inserted,
    // untouched rows intact. The oracle replays the merge arithmetic
    // over the original parquet.
    Q(
      "q_iceberg_merge",
      (s, dir) => {
        val root = fixtureIcebergMergeTable(s, dir)
        graft.sources.IcebergSource
          .read(s, root, snapshotId = Some(2L), asOfTimestampMs = None,
            prune = None)
          .select($"p_partkey", $"p_name", $"p_size")
          .orderBy($"p_partkey")
      },
      Some(
        "SELECT p_partkey, p_name, " +
          "CASE WHEN p_partkey % 5 = 0 THEN p_size + 100 ELSE p_size END AS p_size " +
          "FROM part " +
          "UNION ALL " +
          "SELECT p_partkey + 1000000 AS p_partkey, " +
          "'merged-' || CAST(p_partkey AS VARCHAR) AS p_name, 1 AS p_size " +
          "FROM part WHERE p_partkey % 7 = 0 " +
          "ORDER BY p_partkey"
      )
    ),
    // v2 merge-on-read UPSERT (equality-delete flavor, current snapshot):
    // the O(|updates|) CDC commit — an equality-delete file on the key
    // plus the new data files, ONE snapshot, no table data read at write
    // time. The read applies the delete sequence-scoped: it reaches the
    // base AND the earlier merge's data files but never this commit's
    // own rows. The oracle replays merge-then-upsert arithmetic, upsert
    // branch winning where both touched a key (p_partkey % 55 == 0).
    Q(
      "q_iceberg_upsert",
      (s, dir) => {
        val root = fixtureIcebergMergeTable(s, dir)
        graft.sources.IcebergSource
          .read(s, root, snapshotId = Some(3L), asOfTimestampMs = None,
            prune = None)
          .select($"p_partkey", $"p_name", $"p_size")
          .orderBy($"p_partkey")
      },
      Some(icebergUpsertOracle)
    ),
    // COMPACTION (current snapshot): the same logical state as
    // q_iceberg_upsert — same oracle text — but served from the
    // rewritten clean data files with ZERO delete files left to apply
    // (SourcesSpec pins the empty delete list and time-travel survival).
    // Together the two queries gate that compaction is a physical
    // rewrite, never a logical change.
    Q(
      "q_iceberg_compacted",
      (s, dir) => {
        val root = fixtureIcebergMergeTable(s, dir)
        graft.sources.IcebergSource
          .read(s, root)
          .select($"p_partkey", $"p_name", $"p_size")
          .orderBy($"p_partkey")
      },
      Some(icebergUpsertOracle)
    ),
    // MANIFEST REWRITE (metadata compaction): snapshots 1-3 built the MoR
    // state, snapshot 4 consolidated the manifests (operation=replace,
    // manifests-only — data files untouched), snapshot 5 appended after.
    // The current read gates the rewrite's one hard invariant: carried
    // entries keep their ORIGINAL data sequence numbers, so the seq-2
    // equality delete still kills only the seq-1 band-2 base rows while
    // the seq-3 re-appends and seq-5 post-rewrite rows survive. A rewrite
    // that re-stamped sequences would flip both and fail the hash.
    Q(
      "q_iceberg_manifests",
      (s, dir) => {
        val root = fixtureIcebergManifestsTable(s, dir)
        graft.sources.IcebergSource
          .read(s, root)
          .select($"p_partkey", $"p_name", $"p_size", $"p_band")
          .orderBy($"p_partkey")
      },
      Some(
        "SELECT p_partkey, p_name, p_size, CAST(p_partkey % 4 AS INT) AS p_band " +
          "FROM part WHERE p_partkey % 4 <> 2 " +
          "UNION ALL " +
          "SELECT p_partkey, p_name, p_size, CAST(2 AS INT) AS p_band " +
          "FROM part WHERE p_partkey % 4 = 2 AND p_size > 30 " +
          "UNION ALL " +
          "SELECT p_partkey + 3000000 AS p_partkey, " +
          "'post-' || CAST(p_partkey AS VARCHAR) AS p_name, " +
          "CAST(5 AS INT) AS p_size, CAST(9 AS INT) AS p_band " +
          "FROM part WHERE p_partkey % 17 = 0 " +
          "ORDER BY p_partkey"
      )
    ),
    // EVENTS over hour(ts) hidden partitioning, end to end: the fixture
    // events land in an hour-laid-out v2 table; the query aggregates ONE
    // hour selected by an instant predicate — the planner opens exactly
    // that hour's manifest of ~720 (the 100-TB event-scan economics:
    // scan cost is the HOUR's bytes, not the table's). The oracle is
    // dynamic: it embeds the hour the run targeted (the fixture's
    // earliest), replaying the same range over the raw events parquet.
    Q(
      "q_iceberg_events_hour",
      (s, dir) => {
        val root = fixtureIcebergEventsHourTable(s, dir)
        // driver-side KB probe picks the target hour: the earliest event's
        val minMicros = events(s, dir)
          .agg(min(unix_micros($"ts")).as("m")).head().getLong(0)
        val hourStartMicros =
          Math.floorDiv(minMicros, 3600000000L) * 3600000000L
        val hourStr = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss")
          .withZone(java.time.ZoneOffset.UTC)
          .format(java.time.Instant.ofEpochSecond(hourStartMicros / 1000000L))
        eventsHourOracle.set(Some(
          "SELECT event_type, count(*) AS n, " +
            "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value " +
            s"FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '$hourStr' " +
            s"AND CAST(ts AS TIMESTAMP) < TIMESTAMP '$hourStr' + INTERVAL 1 HOUR " +
            "GROUP BY 1 ORDER BY event_type"))
        graft.sources.IcebergSource
          .read(s, root, None, None,
            Some(graft.sources.IcebergMeta.PartitionEquals(
              "ts", new java.sql.Timestamp(hourStartMicros / 1000L))))
          .groupBy($"event_type")
          .agg(
            count(lit(1)).as("n"),
            asDouble(sum($"value".cast(DecimalType(18, 6)))).as("sum_value"))
          .orderBy($"event_type")
      },
      None,
      oracleFn = Some(() => eventsHourOracle.get())
    ),
    // SCHEMA EVOLUTION read-back: the current read surfaces the added
    // column as null for every pre-evolution file and as real values for
    // the post-evolution append — the metadata schema drives the parquet
    // read (write side: IcebergWriter.addColumn, metadata-only, no
    // snapshot; SourcesSpec pins the time-travel old-shape half).
    Q(
      "q_iceberg_evolved",
      (s, dir) => {
        val root = fixtureIcebergEvolvedTable(s, dir)
        graft.sources.IcebergSource
          .read(s, root)
          .select($"p_partkey", $"p_name", $"p_score")
          .orderBy($"p_partkey")
      },
      Some(
        "SELECT p_partkey, p_name, CAST(NULL AS DOUBLE) AS p_score FROM part " +
          "UNION ALL " +
          "SELECT p_partkey + 3000000 AS p_partkey, " +
          "'ev-' || CAST(p_partkey AS VARCHAR) AS p_name, " +
          "CAST(p_partkey AS DOUBLE) / 2 AS p_score " +
          "FROM part WHERE p_partkey % 9 = 0 " +
          "ORDER BY p_partkey"
      )
    ),
    // FILE-LEVEL DATA SKIPPING read-back: lineitem range-clustered on
    // l_orderkey into 8 disjoint files; the writer harvested per-file
    // min/max bounds into the manifests, and the key-range scan plans
    // only the file(s) whose range overlaps (SourcesSpec pins
    // filesSkipped on its own table). The residual filter restores
    // exact semantics — skipping is conservative, never semantic. This
    // is the 100-TB sorted-table economics: scan cost tracks the
    // PREDICATE's byte range, not the table's.
    Q(
      "q_iceberg_skipdata",
      (s, dir) => {
        val root = fixtureIcebergClusteredTable(s, dir)
        graft.sources.IcebergSource
          .read(s, root, None, None, None,
            Seq(graft.sources.IcebergMeta.ColumnBound(
              "l_orderkey", "lteq", 2000L)))
          .filter($"l_orderkey" <= 2000L)
          .agg(
            count(lit(1)).as("n"),
            asDouble(sum(dec2($"l_extendedprice"))).as("revenue"))
      },
      Some(
        "SELECT count(*) AS n, " +
          "CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue " +
          "FROM lineitem WHERE l_orderkey <= 2000"
      )
    ),
    // RUNTIME JOIN PRUNING: the dim (an orders key window) is evaluated
    // first, its min/max become file filters on the range-clustered
    // lineitem scan, and the scan plans only the overlapping files —
    // dynamic partition pruning re-expressed at the file level for the
    // metadata source (SourcesSpec pins filesSkipped 7 of 8 on its own
    // table; this oracle pins the composed join's rows). The dim range
    // prunes, the join matches exactly — bounds are never semantic.
    Q(
      "q_iceberg_joinpruned",
      (s, dir) => {
        val root = fixtureIcebergClusteredTable(s, dir)
        val dim = t(s, dir, "orders")
          .filter($"o_orderkey".between(500L, 1500L))
          .select($"o_orderkey", $"o_custkey")
        graft.operators.JoinPruning
          .join(s, root, "l_orderkey", dim, "o_orderkey")
          .agg(
            count(lit(1)).as("n"),
            asDouble(sum(dec2($"l_extendedprice"))).as("revenue"),
            sum($"o_custkey").as("sum_cust"))
      },
      Some(
        "SELECT count(*) AS n, " +
          "CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue, " +
          "CAST(sum(o_custkey) AS BIGINT) AS sum_cust " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "WHERE o_orderkey BETWEEN 500 AND 1500"
      )
    ),
    // MULTI-FIELD partitioning read-back: events in an identity(
    // event_type) x day(ts) layout — the one-type predicate prunes to
    // that type's ~30 day manifests of ~150 EXACTLY (identity pruning
    // needs no residual filter), and the per-day rollup runs off the
    // pruned scan. The oracle replays the type filter + UTC day
    // grouping over the raw events parquet — gating layout, tuple
    // manifests, dir reconstitution, and the day transform at once.
    Q(
      "q_iceberg_multipart",
      (s, dir) => {
        val root = fixtureIcebergMultipartTable(s, dir)
        graft.sources.IcebergSource
          .read(s, root, None, None,
            Some(graft.sources.IcebergMeta.PartitionEquals(
              "event_type", "purchase")))
          .groupBy(to_date($"ts").as("day"))
          .agg(
            count(lit(1)).as("n"),
            asDouble(sum($"value".cast(DecimalType(18, 6)))).as("sum_value"))
          .orderBy($"day")
      },
      Some(
        "SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, count(*) AS n, " +
          "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value " +
          "FROM events WHERE event_type = 'purchase' " +
          "GROUP BY 1 ORDER BY day"
      )
    ),
    // PARTITION SPEC EVOLUTION read-back: the table started flat, then
    // evolved to hidden day(o_date) — each manifest prunes via the spec
    // it was written under (the day generation opens 1 of 8 day
    // manifests; the pre-evolution flat manifest has no o_date field and
    // is read in full, conservative-correct), the two directory layouts
    // are read as one table, and the residual filter restores exact
    // predicate semantics over the unprunable old files. The oracle
    // replays the date derivation over the original parquet.
    Q(
      "q_iceberg_specevolved",
      (s, dir) => {
        val root = fixtureIcebergSpecEvolvedTable(s, dir)
        graft.sources.IcebergSource
          .read(s, root, None, None,
            Some(graft.sources.IcebergMeta.PartitionEquals(
              "o_date", java.time.LocalDate.of(1995, 3, 4))))
          .filter($"o_date" === lit("1995-03-04").cast("date"))
          .select($"o_orderkey", $"o_custkey", $"o_date")
          .orderBy($"o_orderkey")
      },
      Some(
        "SELECT o_orderkey, o_custkey, " +
          "CAST(DATE '1995-03-01' + CAST(o_orderkey % 8 AS INTEGER) AS DATE) AS o_date " +
          "FROM orders WHERE o_orderkey % 8 = 3 ORDER BY o_orderkey"
      )
    ),
    // COLUMN-EVOLUTION LIFECYCLE read-back: rename keeps the field id, so
    // every pre-rename file's p_size surfaces under p_weight (id-based
    // parquet resolution — name matching would null them); the dropped-
    // then-readded p_name gets a FRESH id, so old files read it as null
    // (NOT the dropped values — the resurrection trap), while the
    // post-evolution append carries real names. One oracle pins all
    // three semantics at once.
    Q(
      "q_iceberg_renamed",
      (s, dir) => {
        val root = fixtureIcebergRenamedTable(s, dir)
        graft.sources.IcebergSource
          .read(s, root)
          .select($"p_partkey", $"p_weight", $"p_name")
          .orderBy($"p_partkey")
      },
      Some(
        "SELECT p_partkey, p_size AS p_weight, " +
          "CAST(NULL AS VARCHAR) AS p_name FROM part " +
          "UNION ALL " +
          "SELECT p_partkey + 4000000 AS p_partkey, " +
          "p_size + 1000 AS p_weight, " +
          "'rn-' || CAST(p_partkey AS VARCHAR) AS p_name " +
          "FROM part WHERE p_partkey % 6 = 0 " +
          "ORDER BY p_partkey"
      )
    ),
    // REFS, branch read: the table went through write-audit-publish —
    // two commits landed on the `audit` branch (band 2, then band 3's
    // quality-gated p_size>30 rows) while main stayed at the base, then
    // fastForward flipped main to the branch head in one metadata
    // commit. Reading the branch by NAME gates ref resolution plus the
    // branch-parented manifest accumulation (each branch commit carried
    // the BRANCH head's manifests, not main's). SourcesSpec pins the
    // isolation half (main unmoved until publish, divergence refusal).
    Q(
      "q_iceberg_branch",
      (s, dir) => {
        val root = fixtureIcebergBranchTable(s, dir)
        graft.sources.IcebergSource
          .read(s, root, None, None, None, ref = Some("audit"))
          .select($"p_partkey", $"p_name", $"p_size", $"p_band")
          .orderBy($"p_partkey")
      },
      Some(
        "SELECT p_partkey, p_name, p_size, CAST(p_partkey % 4 AS INT) AS p_band " +
          "FROM part WHERE p_partkey % 4 < 3 OR p_size > 30 ORDER BY p_partkey"
      )
    ),
    // REFS, tag read: `prepub` pinned the pre-publish snapshot by name
    // and the publish has since happened — the tag still resolves the
    // original two bands (named time-travel surviving main's movement;
    // the reproducibility handle a training run records instead of a
    // raw snapshot id).
    Q(
      "q_iceberg_tag",
      (s, dir) => {
        val root = fixtureIcebergBranchTable(s, dir)
        graft.sources.IcebergSource
          .read(s, root, None, None, None, ref = Some("prepub"))
          .select($"p_partkey", $"p_name", $"p_size", $"p_band")
          .orderBy($"p_partkey")
      },
      Some(
        "SELECT p_partkey, p_name, p_size, CAST(p_partkey % 4 AS INT) AS p_band " +
          "FROM part WHERE p_partkey % 4 < 2 ORDER BY p_partkey"
      )
    ),
    // CDC CHANGELOG, v1 copy-on-write: the window (s1, s3] over the base
    // iceberg fixture saw band 3 appended (s2) and band 1 COW-deleted
    // (s3). The changelog emits both sides with snapshot provenance —
    // the read a downstream index consumes instead of re-scanning the
    // table. The oracle replays the band arithmetic with literal
    // snapshot ids, gating insert/delete attribution row by row.
    Q(
      "q_iceberg_changelog",
      (s, dir) => {
        val root = fixtureIcebergTable(s, dir)
        graft.sources.IcebergSource
          .readChangelog(s, root, fromSnapshotId = 1L)
          .select($"p_partkey", $"p_name", $"p_band",
            $"_change_type", $"_change_snapshot_id")
          .orderBy($"p_partkey")
      },
      Some(
        "SELECT p_partkey, p_name, CAST(p_partkey % 4 AS INT) AS p_band, " +
          "'insert' AS _change_type, CAST(2 AS BIGINT) AS _change_snapshot_id " +
          "FROM part WHERE p_partkey % 4 = 3 " +
          "UNION ALL " +
          "SELECT p_partkey, p_name, CAST(p_partkey % 4 AS INT) AS p_band, " +
          "'delete' AS _change_type, CAST(3 AS BIGINT) AS _change_snapshot_id " +
          "FROM part WHERE p_partkey % 4 = 1 " +
          "ORDER BY p_partkey"
      )
    ),
    // CDC CHANGELOG, v2 merge-on-read: the window (s2, s5] saw a
    // position delete (p_size<25, s3), an equality delete (band 2, s4 —
    // whose removed rows are computed against the POST-s3 live state, so
    // rows the position delete already killed are correctly absent), and
    // a re-append (band 2, p_size>30, s5). Delete+insert pairs on the
    // same key are the CDC encoding of an update, so the sort includes
    // the snapshot id.
    Q(
      "q_iceberg_changelog_mor",
      (s, dir) => {
        val root = fixtureIcebergV2Table(s, dir)
        graft.sources.IcebergSource
          .readChangelog(s, root, fromSnapshotId = 2L)
          .select($"p_partkey", $"p_name", $"p_size", $"p_band",
            $"_change_type", $"_change_snapshot_id")
          .orderBy($"_change_snapshot_id", $"p_partkey")
      },
      Some(
        "SELECT p_partkey, p_name, p_size, CAST(p_partkey % 4 AS INT) AS p_band, " +
          "'delete' AS _change_type, CAST(3 AS BIGINT) AS _change_snapshot_id " +
          "FROM part WHERE p_size < 25 " +
          "UNION ALL " +
          "SELECT p_partkey, p_name, p_size, CAST(p_partkey % 4 AS INT) AS p_band, " +
          "'delete' AS _change_type, CAST(4 AS BIGINT) AS _change_snapshot_id " +
          "FROM part WHERE p_partkey % 4 = 2 AND p_size >= 25 " +
          "UNION ALL " +
          "SELECT p_partkey, p_name, p_size, CAST(p_partkey % 4 AS INT) AS p_band, " +
          "'insert' AS _change_type, CAST(5 AS BIGINT) AS _change_snapshot_id " +
          "FROM part WHERE p_partkey % 4 = 2 AND p_size > 30 " +
          "ORDER BY _change_snapshot_id, p_partkey"
      )
    ),
    // LIST-typed payload through the full Iceberg lifecycle (r17): the
    // embedding column (array<float>) rides append, equality-upsert MoR,
    // and the explicit-schema read — the training-corpus table shape
    // (row identity + vector payload + label) as a first-class Iceberg
    // base. The oracle recomputes first/last element and dimension from
    // the raw parquet with the upsert's reversal replayed as a CASE, so
    // the hash gate certifies the nested-type schema JSON round-trip
    // (writer emits the spec's list object, reader folds it back to
    // ArrayType) AND that the array VALUES survived the delete+insert
    // encoding bit-exactly.
    Q(
      "q_iceberg_array",
      (s, dir) => {
        val root = fixtureIcebergArrayTable(s, dir)
        graft.sources.IcebergSource.read(s, root)
          .select($"vec_id", $"label",
            round(element_at($"embedding", 1).cast("double"), 6).as("e1"),
            round(element_at($"embedding", size($"embedding"))
              .cast("double"), 6).as("elast"),
            size($"embedding").cast("bigint").as("dim"))
          .orderBy($"vec_id")
      },
      Some(
        """SELECT vec_id, label,
          |  round(CAST(CASE WHEN vec_id % 8 = 0 THEN embedding[len(embedding)]
          |                  ELSE embedding[1] END AS DOUBLE), 6) AS e1,
          |  round(CAST(CASE WHEN vec_id % 8 = 0 THEN embedding[1]
          |                  ELSE embedding[len(embedding)] END AS DOUBLE), 6) AS elast,
          |  len(embedding) AS dim
          |FROM embeddings ORDER BY vec_id""".stripMargin
      )
    ),
    // INCREMENTAL MATERIALIZED-VIEW MAINTENANCE over the CDC changelog:
    // the aggregate economics of a 100 TB lake. The MV (per-band
    // sum/avg/count of p_size) is computed ONCE against snapshot 2, then
    // refreshed purely from the changelog window (2, current] — the s3
    // position deletes, the s4 equality delete, and the s5 re-append net
    // into per-key deltas and a full-outer join against the MV; the
    // current base table is NEVER rescanned. The oracle is the full
    // recompute over the final live state, so the hash gate proves
    // incremental == full for every group — including the signed
    // arithmetic across both delete flavors and sequence-scoped
    // re-inserts.
    Q(
      "q_mv_incremental",
      (s, dir) => {
        val root = fixtureIcebergV2Table(s, dir)
        val baseAtS2 = graft.sources.IcebergSource
          .read(s, root, snapshotId = Some(2L), asOfTimestampMs = None,
            prune = None)
        val mv = baseAtS2
          .groupBy($"p_band")
          .agg(
            sum($"p_size").cast("bigint").as("sum_size"),
            count(lit(1)).as("n_rows")
          )
        val changes = graft.sources.IcebergSource
          .readChangelog(s, root, fromSnapshotId = 2L)
        graft.operators.IncrementalOps
          .refreshSumCount(mv, changes, "p_band",
            col("p_size").cast("bigint"), "sum_size", "n_rows")
          .select(
            $"p_band",
            $"sum_size",
            (asDouble($"sum_size") / $"n_rows").as("avg_size"),
            $"n_rows"
          )
          .orderBy($"p_band")
      },
      Some(
        "SELECT CAST(p_partkey % 4 AS INT) AS p_band, " +
          "CAST(sum(p_size) AS BIGINT) AS sum_size, " +
          "CAST(sum(p_size) AS DOUBLE) / count(*) AS avg_size, " +
          "count(*) AS n_rows FROM part " +
          "WHERE (p_partkey % 4 IN (0,1,3) AND p_size >= 25) " +
          "OR (p_partkey % 4 = 2 AND p_size > 30) " +
          "GROUP BY 1 ORDER BY 1"
      )
    ),
    // MIN/MAX MV maintenance — the NON-delta-invertible aggregate class:
    // deleting the current minimum says nothing about the next one, so
    // q_mv_incremental's pure-delta arithmetic cannot apply. The
    // operator folds inserts incrementally and rescans ONLY the groups
    // whose deletes could have hit an extremum — here the s3 position
    // delete (p_size < 25) hits every band's minimum, forcing the
    // rescan path, while the rescan itself is a keyed semi-join read of
    // the CURRENT table, never a full recompute of untouched groups.
    // The oracle is the full min/max/count recompute over the final
    // live state, so the hash gate proves fold + rescan == recompute.
    Q(
      "q_mv_minmax",
      (s, dir) => {
        val root = fixtureIcebergV2Table(s, dir)
        val baseAtS2 = graft.sources.IcebergSource
          .read(s, root, snapshotId = Some(2L), asOfTimestampMs = None,
            prune = None)
        val mv = baseAtS2
          .groupBy($"p_band")
          .agg(
            min($"p_size").cast("bigint").as("mn_size"),
            max($"p_size").cast("bigint").as("mx_size"),
            count(lit(1)).as("n_rows")
          )
        val changes = graft.sources.IcebergSource
          .readChangelog(s, root, fromSnapshotId = 2L)
        graft.operators.IncrementalOps
          .refreshMinMax(mv, changes, "p_band",
            col("p_size").cast("bigint"), "mn_size", "mx_size", "n_rows",
            rescan = keys => graft.sources.IcebergSource.read(s, root)
              .join(keys, Seq("p_band"), "left_semi")
              .select($"p_band", $"p_size".cast("bigint").as("m")))
          .orderBy($"p_band")
      },
      Some(
        "SELECT CAST(p_partkey % 4 AS INT) AS p_band, " +
          "CAST(min(p_size) AS BIGINT) AS mn_size, " +
          "CAST(max(p_size) AS BIGINT) AS mx_size, " +
          "count(*) AS n_rows FROM part " +
          "WHERE (p_partkey % 4 IN (0,1,3) AND p_size >= 25) " +
          "OR (p_partkey % 4 = 2 AND p_size > 30) " +
          "GROUP BY 1 ORDER BY 1"
      )
    ),
    // JOIN-VIEW IVM — the third maintenance class: a stored
    // part-join-band-dim view refreshed from BOTH sides' churn without
    // rescanning either base. The fact side churns through the real
    // iceberg changelog (s3 pos-deletes, s4 eq-delete, s5 re-append);
    // the dim side relabels band 0 (delete+insert) and INSERTS band 3 —
    // whose fact rows were unmatched at MV-build time and exist nowhere
    // in the old view, the case pure view-side delta approaches cannot
    // produce. Pass-through (band-1 rows the fact churn missed) flows
    // untouched; every keyed read is churn-scoped. The oracle is the
    // full recompute of the join over the final live state of both
    // sides, so the hash gate proves region-recompute == recompute.
    Q(
      "q_mv_join",
      (s, dir) => {
        import s.implicits._
        val root = fixtureIcebergV2Table(s, dir)
        val dim0 = Seq((0, "b0"), (1, "b1"), (2, "b2"))
          .toDF("p_band", "band_name")
        val dimNow =
          Seq((0, "band-zero"), (1, "b1"), (2, "b2"), (3, "band-three"))
            .toDF("p_band", "band_name")
        val dimChanges = Seq(
          ("delete", 0, "b0"), ("insert", 0, "band-zero"),
          ("insert", 3, "band-three")
        ).toDF("_change_type", "p_band", "band_name")
        // col(), not the $ interpolator: s.implicits (needed for toDF)
        // would make $ ambiguous with QueryUtil's interpolator
        val factCols = Seq("p_partkey", "p_name", "p_size", "p_band").map(col)
        val baseAtS2 = graft.sources.IcebergSource
          .read(s, root, snapshotId = Some(2L), asOfTimestampMs = None,
            prune = None)
          .select(factCols: _*)
        val mv = baseAtS2.join(dim0, Seq("p_band"), "inner")
        val factChanges = graft.sources.IcebergSource
          .readChangelog(s, root, fromSnapshotId = 2L)
        def cur = graft.sources.IcebergSource.read(s, root)
          .select(factCols: _*)
        graft.operators.IncrementalOps
          .refreshJoin(mv, factChanges, dimChanges,
            factKey = "p_partkey", joinKey = "p_band",
            factByPk = keys => cur.join(keys, Seq("p_partkey"), "left_semi"),
            factByJoinKey = keys => cur.join(keys, Seq("p_band"), "left_semi"),
            dimByJoinKey = keys => dimNow.join(keys, Seq("p_band"), "left_semi"))
          .orderBy(col("p_partkey"))
      },
      Some(
        "SELECT CAST(p_partkey % 4 AS INT) AS p_band, p_partkey, p_name, " +
          "p_size, band_name FROM part " +
          "JOIN (VALUES (0, 'band-zero'), (1, 'b1'), (2, 'b2'), " +
          "(3, 'band-three')) AS d(b, band_name) ON p_partkey % 4 = b " +
          "WHERE (p_partkey % 4 IN (0,1,3) AND p_size >= 25) " +
          "OR (p_partkey % 4 = 2 AND p_size > 30) " +
          "ORDER BY p_partkey"
      )
    ),
    // EXACT COUNT(DISTINCT) IVM — the aggregate class everyone declares
    // un-maintainable, made delta-invertible again by one level of
    // indirection: a stored (band, size, refcount) MULTIPLICITY table
    // turns the distinct view's delta into (#values born - #values
    // died). The fixture churn makes the hard cases real: the s3
    // pos-delete kills SOME copies of duplicated sizes (refcount drops,
    // no death event — distinct count must NOT move) and ALL copies of
    // others (death), and the s4+s5 eq-delete/re-append nets band 2 down
    // to its p_size>30 values. The result gates BOTH levels: nd_sizes
    // from the maintained distinct view, nd_mult recounted from the
    // maintained multiplicity table, and the oracle computes each by
    // full recompute over the final live state.
    Q(
      "q_mv_distinct",
      (s, dir) => {
        val root = fixtureIcebergV2Table(s, dir)
        val baseAtS2 = graft.sources.IcebergSource
          .read(s, root, snapshotId = Some(2L), asOfTimestampMs = None,
            prune = None)
        val mvMult = baseAtS2
          .groupBy($"p_band", $"p_size".cast("bigint").as("v"))
          .agg(count(lit(1)).as("ref"))
        val mvDistinct = baseAtS2
          .groupBy($"p_band")
          .agg(
            countDistinct($"p_size").as("nd"),
            count(lit(1)).as("n"))
        val changes = graft.sources.IcebergSource
          .readChangelog(s, root, fromSnapshotId = 2L)
        val refreshed = graft.operators.IncrementalOps
          .refreshDistinct(mvMult, mvDistinct, changes, "p_band",
            col("p_size").cast("bigint"), "v", "ref", "nd", "n")
        val ndFromMult = refreshed.multiplicity
          .groupBy($"p_band")
          .agg(count(when($"v".isNotNull, lit(1))).as("nd_mult"))
        refreshed.distinct
          .join(ndFromMult, Seq("p_band"), "inner")
          .select(
            $"p_band",
            $"nd".as("nd_sizes"),
            $"nd_mult",
            $"n".as("n_rows"))
          .orderBy($"p_band")
      },
      Some(
        "SELECT CAST(p_partkey % 4 AS INT) AS p_band, " +
          "count(DISTINCT p_size) AS nd_sizes, " +
          "count(DISTINCT p_size) AS nd_mult, " +
          "count(*) AS n_rows FROM part " +
          "WHERE (p_partkey % 4 IN (0,1,3) AND p_size >= 25) " +
          "OR (p_partkey % 4 = 2 AND p_size > 30) " +
          "GROUP BY 1 ORDER BY 1"
      )
    ),
    // APPROX-distinct IVM — the MERGEABLE-SKETCH class: the view stores
    // one HLL sketch per band (O(#keys) state, the scale answer when
    // q_mv_distinct's multiplicity table is itself too big), inserts
    // fold by sketch union, deletes force the authoritative keyed
    // rescan. Two refresh steps drive three paths: the (s1, s2] window
    // is insert-only on a BRAND-NEW key (band 3 — no stored sketch to
    // union), the (s2, s5] window's deletes rescan every band pinned at
    // the window end, and band 2's die-then-revive (eq-delete + seq-5
    // re-append) lands in one rescan whose read sees only the
    // re-appended rows. Estimates here are EXACT — the p_size domain
    // (<=50 distinct per band) keeps every sketch in the DataSketches
    // list/set regime — so the oracle is the plain count(DISTINCT)
    // recompute; the operator's dense-regime error contract is pinned
    // in OperatorEdgeSpec instead.
    Q(
      "q_mv_approx_distinct",
      (s, dir) => {
        val root = fixtureIcebergV2Table(s, dir)
        val baseAtS1 = graft.sources.IcebergSource
          .read(s, root, snapshotId = Some(1L), asOfTimestampMs = None,
            prune = None)
        val mv0 = baseAtS1
          .groupBy($"p_band")
          .agg(hll_sketch_agg($"p_size".cast("bigint")).as("sk"))
        def step(mv: org.apache.spark.sql.DataFrame, from: Long,
            to: Option[Long]) = {
          val win = graft.sources.IcebergSource
            .readChangelog(s, root, fromSnapshotId = from, toSnapshotId = to)
          graft.operators.IncrementalOps
            .refreshApproxDistinct(mv, win, "p_band",
              col("p_size").cast("bigint"), "sk",
              rescan = keys => graft.sources.IcebergSource
                .read(s, root, snapshotId = to, asOfTimestampMs = None,
                  prune = None)
                .join(keys, Seq("p_band"), "left_semi")
                .select($"p_band", $"p_size".cast("bigint").as("v")))
        }
        val refreshed = step(step(mv0, 1L, Some(2L)), 2L, None)
        refreshed
          .select($"p_band", hll_sketch_estimate($"sk").as("nd_sizes"))
          .orderBy($"p_band")
      },
      Some(
        "SELECT CAST(p_partkey % 4 AS INT) AS p_band, " +
          "count(DISTINCT p_size) AS nd_sizes FROM part " +
          "WHERE (p_partkey % 4 IN (0,1,3) AND p_size >= 25) " +
          "OR (p_partkey % 4 = 2 AND p_size > 30) " +
          "GROUP BY 1 ORDER BY 1"
      )
    ),
    // The SECOND DPP shape: subquery pruning WITHOUT a broadcast to reuse.
    // The dim is merge-join-hinted (stand-in for a dim too big to
    // broadcast), so there is no broadcast result to piggyback on —
    // with reuseBroadcastOnly=false (GraftSession default) Catalyst
    // instead runs the filtered dim as its OWN pruning subquery and the
    // fact scan still reads 3 of 168 month dirs (PlanSpec pins the
    // SortMergeJoin + DynamicPruningExpression + partitions-read=3).
    Q(
      "q_dpp_subquery",
      (s, dir) => {
        val fact = graft.sources.PartitionedTables.ordersByMonth(s, dir)
        val dim = graft.sources.PartitionedTables.monthDim(s, "1992-01-01", 168)
        fact
          .join(
            dim.filter($"quarter" === "1996-Q3").hint("merge"),
            $"o_month" === $"month"
          )
          .groupBy($"o_month")
          .agg(
            count(lit(1)).as("n_orders"),
            // FP-exact avg: exact decimal sum -> double, / exact count —
            // one IEEE division both engines perform identically (decimal
            // avg would round at engine-specific scales)
            (asDouble(sum(dec2($"o_totalprice"))) / count(lit(1)))
              .as("avg_price")
          )
          .orderBy($"o_month")
      },
      Some(
        """WITH dim AS (
          |  SELECT CAST(d AS DATE) AS month,
          |         CAST(year(d) AS VARCHAR) || '-Q' || CAST(quarter(d) AS VARCHAR) AS quarter
          |  FROM generate_series(TIMESTAMP '1992-01-01', TIMESTAMP '2005-12-01', INTERVAL 1 MONTH) t(d)
          |)
          |SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS o_month,
          |       count(*) AS n_orders,
          |       CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS avg_price
          |FROM orders JOIN dim ON CAST(date_trunc('month', o_orderdate) AS DATE) = dim.month
          |WHERE dim.quarter = '1996-Q3'
          |GROUP BY 1 ORDER BY 1""".stripMargin
      )
    ),
    // Result cache on the driver-contract path: cache a query's result
    // under a key, then serve a follow-up query FROM the cached table —
    // the reference cache's put/get round-trip (cache/src/lib.rs:38-50)
    // with the oracle recomputing directly.
    Q(
      "q_cached_agg",
      (s, dir) => {
        val session = graft.engine.GraftSession(s)
        session.registerTable("orders_src", t(s, dir, "orders"))
        session.cacheQuery(
          "cached_orders_agg",
          "SELECT o_orderstatus, o_orderpriority, count(*) AS n, " +
            "CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total " +
            "FROM orders_src GROUP BY o_orderstatus, o_orderpriority"
        )
        session.execute(
          "SELECT o_orderstatus, o_orderpriority, n, total " +
            "FROM cached_orders_agg ORDER BY o_orderstatus, o_orderpriority"
        )
      },
      Some(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n, " +
          "CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total " +
          "FROM orders GROUP BY o_orderstatus, o_orderpriority " +
          "ORDER BY o_orderstatus, o_orderpriority"
      )
    ),
    // Write path through the gate: CTAS materializes a filtered projection
    // as parquet, the query reads the WRITTEN files back and aggregates —
    // the oracle recomputes from the original table, so a corrupted or
    // lossy write (types, nulls, ordering) fails the hash.
    Q(
      "q_ctas_roundtrip",
      (s, dir) => {
        val session = graft.engine.GraftSession(s)
        session.registerTable("li_src", t(s, dir, "lineitem"))
        val out = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"),
          "graft-ctas",
          "big_items-" + Integer.toHexString(dir.hashCode)
        )
        session.createTableAs(
          "big_items",
          "SELECT l_orderkey, l_quantity, l_extendedprice FROM li_src WHERE l_quantity > 40",
          out.toString
        )
        session.execute(
          "SELECT count(*) AS n, " +
            "CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS total_qty, " +
            "CAST(min(l_orderkey) AS BIGINT) AS min_key " +
            "FROM big_items"
        )
      },
      Some(
        "SELECT count(*) AS n, " +
          "CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS total_qty, " +
          "CAST(min(l_orderkey) AS BIGINT) AS min_key " +
          "FROM lineitem WHERE l_quantity > 40"
      )
    ),
    // Cross-source federated join: CSV supplier ⋈ parquet nation ⋈ parquet
    // region in one plan — connectors are just scan nodes to Catalyst, so
    // pushdown/broadcast work across sources exactly as within one.
    Q(
      "q_federated_join",
      (s, dir) => {
        val csv = CsvSource.csvCopyOfParquet(s, s"$dir/supplier.parquet", "supplier")
        val sup = CsvSource.read(s, csv, supplierSchema, header = true)
        val nation = t(s, dir, "nation")
        val region = t(s, dir, "region")
        sup
          .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(
            count(lit(1)).as("n_suppliers"),
            asDouble(sum(dec2($"s_acctbal"))).as("total_bal")
          )
          .orderBy($"r_name", $"n_name")
      },
      Some(
        "SELECT r_name, n_name, count(*) AS n_suppliers, " +
          "CAST(sum(CAST(s_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS total_bal " +
          "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
          "JOIN region ON n_regionkey = r_regionkey " +
          "GROUP BY r_name, n_name ORDER BY r_name, n_name"
      ),
      bench = true
    ),
    // Tumbling-window rollup over events — the batch twin of the M5
    // streaming pipeline (same window() operator Structured Streaming
    // uses), exercising the TIMESTAMP(NANOS) -> micros typed read.
    Q(
      "q_events_window",
      (s, dir) =>
        events(s, dir)
          .groupBy(
            window($"ts", "1 day").getField("start").as("day"),
            $"event_type"
          )
          .agg(
            count(lit(1)).as("n"),
            // exact-decimal sum: double summation order differs between
            // engines, decimals don't (QueryUtil.dec2 pattern)
            asDouble(sum($"value".cast(DecimalType(18, 6)))).as("sum_value")
          )
          .orderBy($"day", $"event_type"),
      Some(
        "SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type, " +
          "count(*) AS n, " +
          "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value " +
          "FROM events GROUP BY 1, 2 ORDER BY day, event_type"
      ),
      bench = true
    ),
    // ----- funnel analysis ---------------------------------------------------
    // The ordered-sequence conversion count every product-analytics user
    // runs: of the users who VIEWed, how many then CLICKed after their
    // first view, and PURCHASEd after that click. Each stage is one
    // groupBy(user) min-timestamp plus a user-keyed join against the
    // previous stage — shuffles on user_id with map-side partial mins,
    // no window over the full event stream, no self-join on time. At
    // 100 TB the three stage aggregates are each one shuffle of (user,
    // ts) pairs, not events.
    Q(
      "q_events_funnel",
      (s, dir) => funnelCounts(events(s, dir)),
      Some(
        """WITH e AS (
          |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
          |), v AS (
          |  SELECT user_id, min(ts) AS v_ts FROM e WHERE event_type = 'view'
          |  GROUP BY user_id
          |), c AS (
          |  SELECT e.user_id, min(e.ts) AS c_ts
          |  FROM e JOIN v ON e.user_id = v.user_id
          |  WHERE e.event_type = 'click' AND e.ts > v.v_ts
          |  GROUP BY e.user_id
          |), p AS (
          |  SELECT e.user_id, min(e.ts) AS p_ts
          |  FROM e JOIN c ON e.user_id = c.user_id
          |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
          |  GROUP BY e.user_id
          |)
          |SELECT stage, n_users FROM (
          |  SELECT '1_view' AS stage, count(*) AS n_users FROM v
          |  UNION ALL SELECT '2_click', count(*) FROM c
          |  UNION ALL SELECT '3_purchase', count(*) FROM p
          |) ORDER BY stage""".stripMargin
      )
    ),
    // ----- cohort retention --------------------------------------------------
    // Week-cohorted retention: users grouped by their first-active week,
    // counted in each subsequent week they return. One distinct
    // (user, week) pass feeds both the cohort assignment and the
    // activity join; offsets are exact integer day arithmetic on
    // week-truncated timestamps (both engines truncate to ISO Monday),
    // so the whole matrix hash-oracles. Shuffle shape at scale: distinct
    // on (user, week) ~ active-users x weeks, then a user-keyed join —
    // never a scan-sized shuffle.
    Q(
      "q_events_cohort",
      (s, dir) => cohortMatrix(events(s, dir)),
      Some(
        """WITH wk AS (
          |  SELECT DISTINCT user_id,
          |         date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
          |  FROM events
          |), coh AS (
          |  SELECT user_id, min(wk) AS cohort_week FROM wk GROUP BY user_id
          |)
          |SELECT coh.cohort_week,
          |       CAST(date_diff('day', coh.cohort_week, wk.wk) // 7 AS BIGINT) AS week_offset,
          |       count(DISTINCT wk.user_id) AS n_users
          |FROM wk JOIN coh USING (user_id)
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      )
    )
  )

  /** Ordered view->click->purchase conversion counts over an events frame
    * (`user_id`, `event_type`, `ts`) — shared by `q_events_funnel` and
    * ScaleProbe's events-family probe. Each stage is one groupBy(user)
    * min-timestamp plus a user-keyed join against the previous stage:
    * shuffles (user, ts) pairs with map-side partial mins, never raw
    * events, and no window over the full stream.
    */
  private[graft] def funnelCounts(
      ev0: org.apache.spark.sql.DataFrame
  ): org.apache.spark.sql.DataFrame = {
    val ev = ev0.select($"user_id", $"event_type", $"ts")
    def firstAfter(
        typ: String,
        prev: org.apache.spark.sql.DataFrame, // (user_id, prev_ts)
        out: String
    ) =
      ev.filter($"event_type" === typ)
        .join(prev, Seq("user_id"))
        .filter($"ts" > $"prev_ts")
        .groupBy($"user_id")
        .agg(min($"ts").as(out))
    val views = ev
      .filter($"event_type" === "view")
      .groupBy($"user_id")
      .agg(min($"ts").as("v_ts"))
    val clicks =
      firstAfter("click", views.select($"user_id", $"v_ts".as("prev_ts")), "c_ts")
    val purchases =
      firstAfter("purchase", clicks.select($"user_id", $"c_ts".as("prev_ts")), "p_ts")
    views.agg(lit("1_view").as("stage"), count(lit(1)).as("n_users"))
      .union(clicks.agg(lit("2_click").as("stage"), count(lit(1)).as("n_users")))
      .union(purchases.agg(lit("3_purchase").as("stage"), count(lit(1)).as("n_users")))
      .orderBy($"stage")
  }

  /** Week-cohorted retention matrix over an events frame — shared by
    * `q_events_cohort` and ScaleProbe's events-family probe. One distinct
    * (user, week) pass feeds both cohort assignment and the activity
    * join; offsets are exact integer day arithmetic on week-truncated
    * timestamps.
    */
  private[graft] def cohortMatrix(
      ev: org.apache.spark.sql.DataFrame
  ): org.apache.spark.sql.DataFrame = {
    val wk = ev
      .select($"user_id", date_trunc("week", $"ts").as("wk"))
      .distinct()
    val cohort = wk.groupBy($"user_id").agg(min($"wk").as("cohort_week"))
    wk.join(cohort, Seq("user_id"))
      .groupBy(
        $"cohort_week",
        (datediff($"wk", $"cohort_week") / 7).cast("bigint").as("week_offset")
      )
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_week", $"week_offset")
  }
}
