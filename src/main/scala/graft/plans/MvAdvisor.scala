package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}

/** The advisor face of the MV family — Oracle's SQL Access Advisor /
  * Calcite lattice-suggester analogue, Spark-native: hand it the
  * WORKLOAD (the dashboard queries as DataFrames) and it tells you which
  * materialized views would answer them, materializes the ones you pick,
  * and registers them so [[MvRewrite]] starts firing — closing the loop
  * whose other arcs already exist (IVM refresh keeps the stored view
  * current, `mv_describe` serves its freshness).
  *
  * [[analyze]] walks each query's OPTIMIZED plan — the same plan stage
  * [[MvRewrite]] rewrites, so what the advisor harvests is exactly what
  * the rewrite will later match — and extracts every
  * `Aggregate([Project|Filter]* Scan(parquet))` shape: base path,
  * grouping columns, filter-referenced columns, measure arguments (by
  * the same canonical-text contract MvDef.measures is keyed by), and
  * DISTINCT arguments. Shapes the rewrite could never answer (a
  * non-column grouping expression, an unsupported aggregate like stddev,
  * a FILTER'd aggregate) are reported with the reason instead of being
  * silently dropped — the advisor's "no" is as actionable as its "yes".
  *
  * [[recommend]] folds the shapes per base table: one ROLLUP
  * recommendation keyed by the union of every query's grouping + filter
  * columns (the finest grain any of them needs — coarser queries regroup
  * through the rewrite's subset rule) carrying the union of their
  * measures, plus one MULTIPLICITY recommendation per DISTINCT-counted
  * column (rollup keys + that column — the [[graft.operators
  * .IncrementalOps.refreshDistinct]] store, which the rewrite answers
  * DISTINCT aggregates from). One multiplicity MV per distinct column,
  * deliberately NOT one keyed by all of them at once: the combined grain
  * is the PRODUCT of the value domains and its state can explode, while
  * per-column stores stay bounded by each column's live pairs.
  *
  * [[Recommendation.materialize]] builds the stored table from the base,
  * writes it, registers the [[MvDef]], and returns the measured
  * compression (MV rows / base rows) — the number that says whether the
  * MV is worth it: a dashboard aggregate over a 100 TB fact at ratio
  * 1e-6 turns into a megabyte-scale scan, while a ratio near 1 says the
  * keys are nearly unique and the advisor recommends NOT materializing
  * (the caller sees the ratio and decides; nothing here auto-builds).
  */
object MvAdvisor {

  /** One harvested aggregate shape, or the reason it is not MV-able. */
  final case class AggShape(
      basePath: String,
      groupCols: Seq[String],
      filterCols: Seq[String],
      // canonical measure text -> which derivations the query needs
      sums: Set[String],
      counts: Set[String],
      mins: Set[String],
      maxs: Set[String],
      countStar: Boolean,
      distinctCols: Set[String])

  final case class Rejection(reason: String)

  /** The advisor's verdict for one base table. `keys` is the finest
    * grain the workload needs; measure sets are unioned across queries.
    *
    * LIFECYCLE on an Iceberg base: [[materialize]] pins the build at the
    * base's current snapshot and stamps it as the [[MvDef]] watermark, so
    * `mv_describe` reports staleness from day one; [[refreshStep]] (or
    * the [[refreshHook]] thunk, pluggable into
    * [[graft.streaming.MaterializedAgg.maintainedSink]]) then brings the
    * stored view current for O(churned groups) — the changelog window
    * names the touched key tuples, ONLY those groups recompute from a
    * keyed read pinned at the new snapshot, and untouched rows carry
    * over from the stored view. Every build/refresh writes a fresh
    * `v<snapshotId>` directory under the MV root and re-registers —
    * queries planned against a superseded version still find its files
    * (no delete-under-reader window), and [[refreshStep]] prunes
    * versions older than the one it just replaced.
    */
  final case class Recommendation(
      basePath: String,
      kind: String, // "rollup" | "multiplicity"
      keys: Seq[String],
      sums: Set[String],
      counts: Set[String],
      mins: Set[String],
      maxs: Set[String],
      queriesAnswered: Int) {

    private def safe(text: String): String =
      text.replaceAll("[^A-Za-z0-9_]", "_")

    /** Deterministic registered name per (base, kind, grain) — stable
      * across re-materializations (replace-in-place), distinct across
      * the per-cluster rollups one base can carry (the grain signature
      * disambiguates; sorted so key ORDER never splits an identity),
      * and distinct across BASES sharing a directory basename (the
      * path-digest tail — find-by-name and the refresh verbs rely on
      * name uniqueness, and two `.../runN/orders` tables must not
      * alias one identity).
      */
    def mvName: String = {
      val grain = kind match {
        case "multiplicity" => s"_${safe(keys.last)}"
        case _              => s"_${keys.sorted.map(safe).mkString("_")}"
      }
      s"advisor_${kind}_${safe(new java.io.File(basePath).getName)}$grain" +
        s"_${MvAdvisor.baseTag(MvCatalog.normalize(basePath))}"
    }

    private def arg(text: String): org.apache.spark.sql.Column = {
      val parts = text.split("::", 2)
      if (parts.length == 1) col(parts(0))
      else col(parts(0)).cast(
        org.apache.spark.sql.types.DataType.fromDDL(parts(1)))
    }

    private def aggList: Seq[org.apache.spark.sql.Column] =
      sums.toSeq.sorted.map(t => sum(arg(t)).as(s"s_${safe(t)}")) ++
        counts.toSeq.sorted.map(t => count(arg(t)).as(s"c_${safe(t)}")) ++
        mins.toSeq.sorted.map(t => min(arg(t)).as(s"mn_${safe(t)}")) ++
        maxs.toSeq.sorted.map(t => max(arg(t)).as(s"mx_${safe(t)}")) :+
        count(lit(1)).as("n_star")

    private def rollup(base: DataFrame): DataFrame = {
      val aggs = aggList
      base.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }

    private def register(
        spark: SparkSession, dataPath: String,
        watermark: Option[Long]): Long = {
      val schema = spark.read.parquet(dataPath).schema
      val mvRows = spark.read.parquet(dataPath).count()
      val measureTexts = sums ++ counts ++ mins ++ maxs
      MvCatalog.register(MvDef(
        name = mvName,
        basePath = basePath,
        keys = keys,
        measures = measureTexts.map { t =>
          t -> MvMeasure(
            sum = if (sums(t)) Some(s"s_${safe(t)}") else None,
            cnt = if (counts(t)) Some(s"c_${safe(t)}") else None,
            min = if (mins(t)) Some(s"mn_${safe(t)}") else None,
            max = if (maxs(t)) Some(s"mx_${safe(t)}") else None)
        }.toMap,
        countStar = Some("n_star"),
        mvPath = dataPath,
        mvSchema = schema,
        watermark = watermark,
        rows = Some(mvRows)))
      mvRows
    }

    /** Build, write, register — and report the compression ratio
      * (stored MV rows / base rows), the advisor's go/no-go number. On a
      * plain parquet base the build writes `mvPath` directly and
      * `watermark` is whatever external lineage the caller vouches; on
      * an ICEBERG base the read pins at the current snapshot, the build
      * writes `mvPath/v<snapshot>`, the snapshot is stamped as the
      * watermark (the `watermark` argument is ignored — stamping
      * anything else would misdeclare what was actually built), and the
      * MV becomes refreshable via [[refreshStep]].
      */
    def materialize(
        spark: SparkSession, mvPath: String,
        watermark: Option[Long] = None): Double = {
      if (graft.sources.IcebergMeta.hasMetadata(basePath)) {
        val cur = graft.sources.IcebergMeta.load(basePath).currentSnapshot
          .getOrElse(throw new IllegalStateException(
            s"iceberg base $basePath has no snapshots")).id
        val base = graft.sources.IcebergSource.read(
          spark, basePath, snapshotId = Some(cur), asOfTimestampMs = None,
          prune = None)
        val dataPath = versionDir(mvPath, cur)
        // a re-materialize at an unmoved base head overwrites the SAME
        // version dir — drop any cached listing first (same protocol as
        // the plain-parquet branch)
        MvCatalog.invalidateScan(dataPath)
        rollup(base).write.mode("overwrite").parquet(dataPath)
        val mvRows = register(spark, dataPath, Some(cur))
        val baseRows = base.count().toDouble
        if (baseRows == 0) 1.0 else mvRows.toDouble / baseRows
      } else {
        val base = spark.read.parquet(basePath)
        // a re-materialize overwrites the stored files: drop the
        // catalog's cached file listing FIRST, or a query compiling in
        // the overwrite window plans against deleted files
        MvCatalog.invalidateScan(mvPath)
        rollup(base).write.mode("overwrite").parquet(mvPath)
        val mvRows = register(spark, mvPath, watermark)
        val baseRows = base.count().toDouble
        if (baseRows == 0) 1.0 else mvRows.toDouble / baseRows
      }
    }

    /** One refresh step for an Iceberg-based advisor MV: apply the
      * source changelog (watermark, current] for O(churned groups) —
      * touched key tuples name the ONLY groups recomputed (keyed read
      * pinned at `current`), untouched rows carry over, the new version
      * directory registers with the new watermark. Returns the applied
      * snapshot, or None when the view is already current. Replays
      * no-op off the registered watermark (same delivery shape as
      * [[graft.streaming.MaterializedAgg.refreshStep]]; the catalog
      * replace-by-name IS the commit here, so run one refresher at a
      * time per view).
      */
    def refreshStep(spark: SparkSession, mvRoot: String): Option[Long] =
      refreshStepPinned(spark, mvRoot, pinned = None)

    /** [[refreshStep]] against an ALREADY-READ changelog window pinned
      * at a caller-captured head — what [[maintainAll]] hands each of N
      * views sharing one base so the sweep reads the window ONCE, not N
      * times. The caller vouches the frame IS exactly this view's
      * (registered watermark, pinned head] window of `basePath` and the
      * meta is the load that resolved that head — the same trust shape
      * as `IcebergSource.read`'s `preloaded`.
      */
    private[graft] def refreshStepPinned(
        spark: SparkSession,
        mvRoot: String,
        pinned: Option[(DataFrame, Long, graft.sources.IcebergMeta.TableMeta)]
    ): Option[Long] = {
      // commit fence: inside a leased sweep, renew-or-refuse before the
      // catalog replace-by-name commits (no-op for leaseless callers)
      graft.operators.MaintenanceLease.fenceActive()
      val d = MvCatalog.lookup(basePath).find(_.name == mvName)
        .getOrElse(throw new IllegalStateException(
          s"$mvName is not registered — materialize first"))
      val wm = d.watermark.getOrElse(throw new IllegalStateException(
        s"$mvName carries no watermark — not an Iceberg-based advisor MV"))
      val meta = pinned.map(_._3)
        .getOrElse(graft.sources.IcebergMeta.load(basePath))
      val cur = pinned.map(_._2).getOrElse(
        meta.currentSnapshot.getOrElse(throw new IllegalStateException(
          s"iceberg base $basePath has no snapshots")).id)
      if (cur == wm) return None
      require(meta.snapshots.exists(_.id == wm),
        s"MV watermark $wm is not a snapshot of $basePath — the source " +
          "history was rewritten under the view; re-materialize")
      // the churned key tuples feed both the keyed recompute and the
      // untouched carry-over's anti-join — pin once. Every read this
      // step issues plans against the ONE meta resolved above (the
      // preloaded contract), so a step costs one metadata load, shared
      // across a whole sweep when the caller pinned it.
      val window = pinned.map(_._1).getOrElse(
        graft.sources.IcebergSource.readChangelog(
          spark, basePath, fromSnapshotId = wm, toSnapshotId = Some(cur),
          preloaded = Some(meta)))
      val touched = window
        .select(keys.map(col): _*).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      touched.count(): Unit
      try {
        val baseNow = graft.sources.IcebergSource.read(
          spark, basePath, snapshotId = Some(cur), asOfTimestampMs = None,
          prune = None, preloaded = Some(meta))
        // null-safe tuple joins: NULL keys are legitimate rollup groups
        def tupleCond(l: String, r: String) = keys.map(k =>
          col(s"$l.$k") <=> col(s"$r.$k")).reduce(_ && _)
        // touched is churn-sized — Spark broadcasts it into both joins,
        // so the recompute costs one base read (prunable by layout) and
        // the carry-over one keys-sized MV read, never a shuffle of the
        // base
        val recomputed = rollup(
          baseNow.as("b").join(touched.as("t"), tupleCond("b", "t"),
            "left_semi"))
        val untouched = spark.read.schema(d.mvSchema).parquet(d.mvPath)
          .as("m")
          .join(touched.as("t"), tupleCond("m", "t"), "left_anti")
        val dataPath = versionDir(mvRoot, cur)
        // a crash-retry of this same window rewrites the same version
        // dir — invalidate any cached listing before the overwrite
        MvCatalog.invalidateScan(dataPath)
        untouched.unionByName(recomputed)
          .write.mode("overwrite").parquet(dataPath)
        register(spark, dataPath, Some(cur))
        // keep the version just superseded (in-flight queries may still
        // hold its listing); drop anything older
        pruneVersions(mvRoot, keep = Set(dataPath, d.mvPath))
        Some(cur)
      } finally touched.unpersist(blocking = false): Unit
    }

    /** The [[graft.streaming.MaterializedAgg.maintainedSink]]-shaped
      * refresh thunk: plug the advisor-built MV into the same
      * ingest-then-refresh foreachBatch the hand-declared streaming
      * views use.
      */
    def refreshHook(mvRoot: String): (SparkSession, Long) => Option[Long] =
      (s, _) => refreshStep(s, mvRoot)
  }

  /** Rebuild the [[Recommendation]] a registered advisor [[MvDef]] was
    * built from — what lets an operator REFRESH an advisor MV knowing
    * only its registered name (e.g. the serving layer's `mv_refresh`
    * action): the def carries everything the recommendation did (base,
    * keys, measure texts by derivation), and the deterministic-name
    * round trip is verified so a hand-declared def that merely looks
    * advisor-ish returns None instead of refreshing under wrong
    * assumptions. `queriesAnswered` is not recoverable (and not needed
    * to refresh); it comes back 0.
    */
  def fromDef(d: MvDef): Option[Recommendation] = {
    val kind =
      if (d.name.startsWith("advisor_rollup_")) "rollup"
      else if (d.name.startsWith("advisor_multiplicity_")) "multiplicity"
      else return None
    val rec = Recommendation(
      d.basePath, kind, d.keys,
      sums = d.measures.collect { case (t, m) if m.sum.isDefined => t }.toSet,
      counts = d.measures.collect { case (t, m) if m.cnt.isDefined => t }.toSet,
      mins = d.measures.collect { case (t, m) if m.min.isDefined => t }.toSet,
      maxs = d.measures.collect { case (t, m) if m.max.isDefined => t }.toSet,
      queriesAnswered = 0)
    if (rec.mvName == d.name) Some(rec) else None
  }

  /** Six hex chars of a (normalized) base-path key — the disambiguator
    * that keeps deterministic advisor names UNIQUE across bases sharing
    * a directory basename. Deterministic per path, so re-advising the
    * same base still replaces-in-place.
    */
  private[graft] def baseTag(key: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(3).map(b => f"$b%02x").mkString

  /** The MV root an advisor def's versioned store lives under — the
    * parent of the registered `v<snapshot>` directory ([[versionDir]]).
    */
  def mvRootOf(d: MvDef): String = new java.io.File(d.mvPath).getParent

  /** Rebuild the [[JoinRecommendation]] a registered advisor
    * [[JoinMvDef]] was built from — the join-view twin of [[fromDef]],
    * so `mv_refresh`/[[maintainAll]] can refresh an advisor join view
    * knowing only its registered name. Side attribution of the stored
    * columns is re-derived from the CURRENT side schemas (the build
    * rule makes this unambiguous: a name both sides expose must be a
    * same-named key and stores the fact column); a stored column no
    * side still carries means the sources evolved under the view —
    * returns None rather than rebuilding under wrong assumptions, same
    * refusal contract as the rollup path. `queriesAnswered` comes back
    * 0, as in [[fromDef]].
    */
  def fromJoinDef(
      spark: SparkSession, d: JoinMvDef): Option[JoinRecommendation] = {
    if (!d.name.startsWith("advisor_join_")) return None
    def sideNames(path: String): Set[String] =
      if (graft.sources.IcebergMeta.hasMetadata(path))
        graft.sources.IcebergSource.read(spark, path)
          .schema.fieldNames.toSet
      else spark.read.parquet(path).schema.fieldNames.toSet
    val factNames = sideNames(d.factPath)
    val dimNames = sideNames(d.dimPath)
    val cols = d.mvSchema.fieldNames.toSeq.map { c =>
      if (factNames(c)) (c, true)
      else if (dimNames(c)) (c, false)
      else return None
    }
    val rec = JoinRecommendation(
      d.factPath, d.dimPath, d.joinKeys, cols, queriesAnswered = 0)
    if (rec.mvName == d.name) Some(rec) else None
  }

  /** The root a join view's versioned store lives under: the parent of
    * a `v<factSnap>_<dimSnap>` directory ([[joinVersionDir]]), or the
    * path itself for a plain-parquet build (which wrote `mvPath`
    * directly and is not refreshable anyway).
    */
  def joinMvRootOf(d: JoinMvDef): String = {
    val f = new java.io.File(d.mvPath)
    if (f.getName.matches("v\\d+_\\d+")) f.getParent else d.mvPath
  }

  /** One view's outcome from [[maintainAll]]: `stale` says the source
    * head had moved past the stamped cursor(s) and a refresh ran;
    * `skipped` carries the reason a view was left alone (hand-declared,
    * no snapshot lineage, or the refresh itself failed — one broken
    * view never blocks the rest of the catalog).
    */
  final case class MaintainResult(
      name: String,
      kind: String,
      stale: Boolean,
      appliedSnapshot: Option[Long],
      appliedDimSnapshot: Option[Long],
      skipped: Option[String])

  /** Catalog-wide maintenance — the orchestration face of the advisor
    * lifecycle: walk EVERY registered materialized view, refresh each
    * advisor-built one whose Iceberg source head moved past its stamped
    * watermark, and report per view. The per-view refresh is the same
    * churn-scoped [[Recommendation.refreshStep]] /
    * [[JoinRecommendation.refreshStep]] the `mv_refresh` action runs,
    * so a maintenance sweep costs O(total churn across stale views),
    * not O(catalog × base). Hand-declared defs are reported as skipped
    * (their freshness is their registrant's contract — this sweep must
    * not rewrite files it does not understand), as are advisor defs
    * with no snapshot lineage. Failures are caught per view and
    * reported in `skipped` ("error: …"), so one corrupted store never
    * blocks the sweep. Run one maintainer at a time: the catalog
    * replace-by-name is each step's commit, same single-refresher
    * contract as [[Recommendation.refreshStep]]. The sweep also covers
    * registered index STORES ([[graft.operators.StoreCatalog]]): each
    * minhash/ivf store with source lineage gets one changelog refresh
    * step, reported in the same row shape — one sweep brings MVs AND
    * stores current.
    */
  def maintainAll(spark: SparkSession): Seq[MaintainResult] =
    // the single-maintainer contract, ENFORCED when the deployment asks
    // for it: with spark.graft.maintenance.lease set, a second
    // concurrent sweep backs off with a clear error instead of
    // interleaving store refreshes (round 18; leaseless when unset)
    graft.operators.MaintenanceLease.withConfigured(spark) {
      sweep(spark, MvCatalog.describe()) ++
        sweepStores(spark, graft.operators.StoreCatalog.describe())
    }

  /** [[maintainAll]] scoped to ONE base table: refresh every stale
    * advisor view whose (fact-side) base is `basePath` — rollups and
    * multiplicity stores on it, plus join views whose fact is it. The
    * "this source just ingested — bring ALL its dashboards current"
    * face, one catalog walk cheaper than enumerating view names.
    */
  def maintainBase(
      spark: SparkSession, basePath: String): Seq[MaintainResult] = {
    val base = MvCatalog.normalize(basePath)
    graft.operators.MaintenanceLease.withConfigured(spark) {
      sweep(spark, MvCatalog.describe()
        .filter(i => MvCatalog.normalize(i.basePath) == base)) ++
        sweepStores(spark, graft.operators.StoreCatalog.describe()
          .filter(_.source.exists(s =>
            MvCatalog.normalize(s.basePath) == base)))
    }
  }

  /** The store half of the catalog-wide sweep: walk registered index
    * stores ([[graft.operators.StoreCatalog]]), run one changelog
    * [[graft.operators.StoreCatalog.refreshStep]] on each that carries
    * source lineage, and report in the same [[MaintainResult]] rows as
    * the MV half (kind = "minhash" | "ivf") so `mv_maintain` over the
    * wire and the CLI answer ONE table for "bring everything current".
    * Lineage-less (compaction-only) stores are reported skipped — their
    * freshness is their registrant's contract; failures are caught per
    * store so one corrupt store never blocks the rest.
    */
  private def sweepStores(
      spark: SparkSession,
      defs: Seq[graft.operators.StoreDef]): Seq[MaintainResult] =
    defs.map { d =>
      if (d.source.isEmpty)
        MaintainResult(d.name, d.kind, stale = false, None, None,
          Some("no source lineage — compaction-only store"))
      else try graft.operators.StoreCatalog.refreshStep(spark, d) match {
        case Some(snap) =>
          MaintainResult(d.name, d.kind, stale = true, Some(snap), None,
            None)
        case None =>
          MaintainResult(d.name, d.kind, stale = false, None, None, None)
      } catch {
        // a LOST lease aborts the whole sweep — degrading it to an error
        // row would let the overrun holder keep committing to the NEXT
        // stores while another maintainer owns the lease
        case e: graft.operators.MaintenanceLease.LostException => throw e
        case scala.util.control.NonFatal(e) =>
          MaintainResult(d.name, d.kind, stale = false, None, None,
            Some("error: " + Option(e.getMessage).getOrElse(e.toString)
              .replaceAll("\\s+", " ").take(200)))
      }
    }

  /** The [[graft.streaming.MaterializedAgg.maintainedSink]]-shaped
    * thunk over [[maintainBase]]: plug ONE hook into the ingest
    * foreachBatch and every advisor view of the source refreshes after
    * each batch — views registered later join the loop without
    * re-plumbing the sink. Returns the highest snapshot any view
    * applied (None = everything was already current).
    *
    * Lease interplay (round 18): when the configured maintenance lease
    * is HELD by a scheduled sweep, the hook yields the round instead of
    * crashing the stream — the holder's sweep is doing the same work,
    * and the next micro-batch retries. Only the lease back-off is
    * swallowed; every other failure propagates to the stream as before.
    */
  def maintainHook(
      basePath: String): (SparkSession, Long) => Option[Long] =
    (s, _) =>
      try maintainBase(s, basePath).flatMap(_.appliedSnapshot).maxOption
      catch {
        case e: IllegalStateException
            if e.getMessage != null && e.getMessage.contains("backed off") =>
          None
      }

  private def sweep(
      spark: SparkSession, infos: Seq[MvInfo]): Seq[MaintainResult] = {
    // N rollup views sharing one (base, watermark) refresh from ONE
    // metadata load and ONE changelog read: the sweep's cost is
    // O(distinct stale windows), not O(views × base metadata). Entries
    // are Try so one unreadable base skips ITS views with the reason
    // without blocking the rest.
    val metaCache = scala.collection.mutable.Map
      .empty[String, scala.util.Try[graft.sources.IcebergMeta.TableMeta]]
    def metaOf(base: String) = metaCache.getOrElseUpdate(base,
      scala.util.Try(graft.sources.IcebergMeta.load(base)))
    val windowCache = scala.collection.mutable.Map.empty[
      (String, Long),
      scala.util.Try[(DataFrame, Long, graft.sources.IcebergMeta.TableMeta)]]
    def windowOf(base: String, wm: Long) =
      windowCache.getOrElseUpdate((base, wm), metaOf(base).map { meta =>
        val cur = meta.currentSnapshot.getOrElse(
          throw new IllegalStateException(
            s"iceberg base $base has no snapshots")).id
        val w = graft.sources.IcebergSource.readChangelog(
          spark, base, fromSnapshotId = wm, toSnapshotId = Some(cur),
          preloaded = Some(meta))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (w, cur, meta)
      })
    try infos.map { info =>
      def done(stale: Boolean, snap: Option[Long], dim: Option[Long]) =
        MaintainResult(info.name, info.kind, stale, snap, dim, None)
      def skip(reason: String) =
        MaintainResult(info.name, info.kind, stale = false, None, None,
          Some(reason))
      try info.kind match {
        case "rollup" =>
          // resolve by (base, name), never name alone: names are unique
          // since the path-digest tail, but the sweep must stay correct
          // even against defs registered by older code
          MvCatalog.lookup(info.basePath).find(_.name == info.name) match {
            case None => skip("unregistered during the sweep")
            case Some(d) => fromDef(d) match {
              case None => skip(
                "hand-declared — refresh through its own IVM loop")
              case Some(_) if d.watermark.isEmpty => skip(
                "no watermark — plain-parquet base, nothing to refresh " +
                  "against")
              case Some(rec) =>
                val wm = d.watermark.get
                val head = metaOf(d.basePath).get.currentSnapshot
                  .getOrElse(throw new IllegalStateException(
                    s"iceberg base ${d.basePath} has no snapshots")).id
                if (head == wm) done(stale = false, None, None)
                else rec.refreshStepPinned(spark, mvRootOf(d),
                  Some(windowOf(d.basePath, wm).get)) match {
                  case Some(snap) => done(stale = true, Some(snap), None)
                  case None       => done(stale = false, None, None)
                }
            }
          }
        case _ =>
          MvCatalog.lookupJoin(info.basePath, info.dimPath.getOrElse(""))
            .find(_.name == info.name) match {
            case None => skip("unregistered during the sweep")
            case Some(d) => fromJoinDef(spark, d) match {
              case None => skip(
                "hand-declared or schema-drifted — refresh through its " +
                  "own IVM loop")
              case Some(_)
                  if !graft.sources.IcebergMeta.hasMetadata(d.factPath) &&
                    !graft.sources.IcebergMeta.hasMetadata(d.dimPath) =>
                skip("no Iceberg side — nothing to refresh against")
              case Some(rec) =>
                rec.refreshStep(spark, joinMvRootOf(d)) match {
                  case Some((f, dm)) =>
                    done(stale = true, Some(f), Some(dm))
                  case None => done(stale = false, None, None)
                }
            }
          }
      } catch {
        // a LOST lease aborts the whole sweep, never degrades to a row
        case e: graft.operators.MaintenanceLease.LostException => throw e
        case scala.util.control.NonFatal(e) => skip("error: " +
          Option(e.getMessage).getOrElse(e.toString)
            .replaceAll("\\s+", " ").take(200))
      }
    } finally windowCache.values.foreach(_.foreach {
      case (w, _, _) => w.unpersist(blocking = false): Unit
    })
  }

  /** `<mvRoot>/v<snapshotId>` — one immutable directory per applied
    * source snapshot. Refresh never rewrites a live directory, so a
    * query planned against a superseded version still finds its files.
    */
  private def versionDir(mvRoot: String, snapshotId: Long): String =
    new java.io.File(mvRoot, s"v$snapshotId").getPath

  /** Delete `v*` version directories under `mvRoot` except `keep`. */
  private def pruneVersions(mvRoot: String, keep: Set[String]): Unit = {
    val root = new java.io.File(mvRoot)
    val keepCanon = keep.map(p => new java.io.File(p).getCanonicalPath)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v") &&
        !keepCanon.contains(f.getCanonicalPath))
      .foreach(deleteRecursively)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** One harvested join-aggregate shape: the
    * `Aggregate([Project|Filter]* Join(Inner, fact, dim))` form
    * [[MvRewrite.rewriteJoin]] answers from a row-grain [[JoinMvDef]].
    * `columns` carries side attribution (true = left/fact) so
    * materialization can qualify names; a non-key name both sides
    * expose is rejected at harvest — the rewrite would bail on it too.
    */
  final case class JoinShape(
      factPath: String,
      dimPath: String,
      joinKeys: Seq[(String, String)],
      columns: Seq[(String, Boolean)])

  /** A recommended row-grain join view for a (fact, dim, keys) trio:
    * the stored column set is the union every matching workload query
    * touches. Row grain means ANY deterministic aggregate recomputes
    * from it, so there is no measure bookkeeping here.
    */
  final case class JoinRecommendation(
      factPath: String,
      dimPath: String,
      joinKeys: Seq[(String, String)],
      columns: Seq[(String, Boolean)],
      queriesAnswered: Int) {

    private def safe(p: String): String =
      new java.io.File(p).getName.replaceAll("[^A-Za-z0-9_]", "_")

    def mvName: String =
      s"advisor_join_${safe(factPath)}_${safe(dimPath)}_" +
        MvAdvisor.baseTag(
          s"${MvCatalog.normalize(factPath)}|${MvCatalog.normalize(dimPath)}")

    /** One side's read: plain parquet, or Iceberg pinned at the given
      * snapshot (None = the side is not an Iceberg table).
      */
    private def sideRead(
        spark: SparkSession, path: String, snap: Option[Long]): DataFrame =
      snap match {
        case Some(id) => graft.sources.IcebergSource.read(
          spark, path, snapshotId = Some(id), asOfTimestampMs = None,
          prune = None)
        case None => spark.read.parquet(path)
      }

    private def headOf(path: String): Option[Long] =
      if (graft.sources.IcebergMeta.hasMetadata(path))
        graft.sources.IcebergMeta.load(path).currentSnapshot.map(_.id)
      else None

    private def build(
        spark: SparkSession, dataPath: String,
        factSnap: Option[Long], dimSnap: Option[Long]): Long = {
      val fact = sideRead(spark, factPath, factSnap).as("f")
      val dim = sideRead(spark, dimPath, dimSnap).as("d")
      val cond = joinKeys.map { case (a, b) =>
        col(s"f.$a") === col(s"d.$b") }.reduce(_ && _)
      val sel = columns.map { case (c, isFact) =>
        (if (isFact) col(s"f.$c") else col(s"d.$c")).as(c) }
      MvCatalog.invalidateScan(dataPath)
      fact.join(dim, cond, "inner").select(sel: _*)
        .write.mode("overwrite").parquet(dataPath)
      val mvRows = spark.read.parquet(dataPath).count()
      MvCatalog.registerJoin(JoinMvDef(
        name = mvName,
        factPath = factPath,
        dimPath = dimPath,
        joinKeys = joinKeys,
        mvPath = dataPath,
        mvSchema = spark.read.parquet(dataPath).schema,
        watermark = factSnap,
        rows = Some(mvRows),
        dimWatermark = dimSnap))
      mvRows
    }

    /** Build the row-grain view, write it, register the [[JoinMvDef]];
      * returns stored rows / fact rows (join selectivity × dim fanout —
      * near or below 1 is the healthy row-grain regime; well above 1
      * means the "dim" fans out and the caller should reconsider).
      * Iceberg sides build PINNED at their current snapshot and stamp it
      * as the matching watermark cursor (`watermark` argument ignored
      * for such sides), making the view [[refreshStep]]-able; the data
      * lands in a `v<factSnap>_<dimSnap>` directory under `mvPath`.
      */
    def materialize(spark: SparkSession, mvPath: String,
        watermark: Option[Long] = None): Double = {
      val factSnap = headOf(factPath)
      val dimSnap = headOf(dimPath)
      val mvRows =
        if (factSnap.isEmpty && dimSnap.isEmpty) {
          val n = build(spark, mvPath, None, None)
          // plain-parquet bases: external lineage is the caller's vouch
          if (watermark.isDefined)
            MvCatalog.lookupJoin(factPath, dimPath).find(_.name == mvName)
              .foreach(d => MvCatalog.registerJoin(
                d.copy(watermark = watermark)))
          n
        } else build(
          spark,
          joinVersionDir(mvPath, factSnap, dimSnap),
          factSnap, dimSnap)
      // ratio denominator through the same pinned side read as the
      // build — an Iceberg fact root is not directly parquet-readable
      val factRows = sideRead(spark, factPath, factSnap).count().toDouble
      if (factRows == 0) 1.0 else mvRows.toDouble / factRows
    }

    /** Refresh an Iceberg-based advisor join view: when EITHER source
      * head moved past its stamped cursor, REBUILD pinned at the new
      * head pair into a fresh version directory and re-register (the
      * previous version is kept for in-flight queries, older ones
      * pruned). Returns the applied (fact, dim) cursor pair, or None
      * when both are current. A rebuild — not a churn-scoped merge —
      * because the advisor's view stores an arbitrary projection; the
      * O(churn) path for high-rate sources is the fixed-schema
      * [[graft.streaming.MaterializedAgg.refreshStepJoin]].
      */
    def refreshStep(
        spark: SparkSession, mvRoot: String): Option[(Long, Long)] = {
      graft.operators.MaintenanceLease.fenceActive()
      val d = MvCatalog.lookupJoin(factPath, dimPath).find(_.name == mvName)
        .getOrElse(throw new IllegalStateException(
          s"$mvName is not registered — materialize first"))
      val factSnap = headOf(factPath)
      val dimSnap = headOf(dimPath)
      require(factSnap.isDefined || dimSnap.isDefined,
        s"$mvName has no Iceberg side — nothing to refresh against")
      if (d.watermark == factSnap && d.dimWatermark == dimSnap) return None
      build(spark, joinVersionDir(mvRoot, factSnap, dimSnap),
        factSnap, dimSnap)
      pruneVersions(mvRoot, keep = Set(
        joinVersionDir(mvRoot, factSnap, dimSnap), d.mvPath))
      Some((factSnap.getOrElse(0L), dimSnap.getOrElse(0L)))
    }

    /** The maintainedSink-shaped refresh thunk, same contract as
      * [[Recommendation.refreshHook]].
      */
    def refreshHook(
        mvRoot: String): (SparkSession, Long) => Option[(Long, Long)] =
      (s, _) => refreshStep(s, mvRoot)
  }

  private def joinVersionDir(
      mvRoot: String, factSnap: Option[Long], dimSnap: Option[Long]): String =
    new java.io.File(mvRoot,
      s"v${factSnap.getOrElse(0L)}_${dimSnap.getOrElse(0L)}").getPath

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** Harvest every MV-able aggregate shape from one query's optimized
    * plan; non-MV-able aggregates over a parquet base come back as
    * [[Rejection]]s with the first disqualifying reason. Aggregates not
    * over a single parquet base (joins, unions) are out of the rollup
    * advisor's scope and are skipped silently — the join-MV surface has
    * its own registration path.
    */
  def analyze(df: DataFrame): Seq[Either[Rejection, AggShape]] = {
    val out = scala.collection.mutable.Buffer.empty[Either[Rejection, AggShape]]
    df.queryExecution.optimizedPlan.foreach {
      case agg: Aggregate =>
        stripToScan(agg.child, Nil).foreach { case (conds, path) =>
          out += harvest(agg, conds, path)
        }
      case _ =>
    }
    out.toSeq
  }

  private def stripToScan(
      p: LogicalPlan, conds: Seq[Expression]
  ): Option[(Seq[Expression], String)] = p match {
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      stripToScan(c, conds)
    case Filter(cond, c) => stripToScan(c, conds ++ splitConjuncts(cond))
    case lr: LogicalRelation =>
      // same root contract as the rewrite: plain parquet by directory, a
      // current-snapshot Iceberg read by TABLE root (so the advisor's
      // recommendation carries the root the rewrite will later match,
      // and materialize can pin + stamp the source snapshot)
      MvRewrite.scanRoot(lr).map(root => (conds, root))
    case _ => None
  }

  private def harvest(
      agg: Aggregate,
      conds: Seq[Expression],
      path: String): Either[Rejection, AggShape] = {
    val groupCols = agg.groupingExpressions.map {
      case a: AttributeReference => a.name
      case other => return scala.Left(Rejection(
        s"grouping expression '${other.sql}' is not a bare column — " +
          "the rewrite regroups the MV by stored key columns only"))
    }
    for (c <- conds) {
      if (!c.deterministic) return scala.Left(Rejection(
        s"non-deterministic filter '${c.sql}' cannot re-apply on a rollup"))
      if (c.references.isEmpty) return scala.Left(Rejection(
        s"filter '${c.sql}' references no columns — per-row semantics " +
          "would change at group grain"))
    }
    val filterCols = conds.flatMap(_.references.map(_.name)).distinct
    var sums, counts, mins, maxs, distincts = Set.empty[String]
    var countStar = false
    def measureOf(e: Expression, what: String): Either[Rejection, String] =
      MvRewrite.measureKey(e).toRight[Rejection](Rejection(
        s"$what argument '${e.sql}' is not a bare or cast column — " +
          "declare it as a stored measure expression instead"))
    for (ne <- agg.aggregateExpressions; e <- ne.collect {
        case ae: AggregateExpression => ae }) {
      if (e.filter.isDefined)
        return scala.Left(Rejection(
          s"FILTER'd aggregate '${e.sql}' is not derivable from a rollup"))
      if (e.isDistinct) {
        e.aggregateFunction.children.foreach {
          case a: AttributeReference => distincts += a.name
          case other => return scala.Left(Rejection(
            s"DISTINCT argument '${other.sql}' is not a bare column — " +
              "a multiplicity store needs the column itself as a key"))
        }
      } else e.aggregateFunction match {
        case Sum(c, _) => measureOf(c, "sum") match {
          case scala.Right(t) => sums += t;   case scala.Left(r) => return scala.Left(r) }
        case Min(c)    => measureOf(c, "min") match {
          case scala.Right(t) => mins += t;   case scala.Left(r) => return scala.Left(r) }
        case Max(c)    => measureOf(c, "max") match {
          case scala.Right(t) => maxs += t;   case scala.Left(r) => return scala.Left(r) }
        case Count(Seq(Literal(v, _))) if v != null => countStar = true
        case Count(Seq(c)) => measureOf(c, "count") match {
          case scala.Right(t) => counts += t; case scala.Left(r) => return scala.Left(r) }
        case Average(c, _) => measureOf(c, "avg") match {
          case scala.Right(t) => sums += t; counts += t
          case scala.Left(r)  => return scala.Left(r) }
        case other => return scala.Left(Rejection(
          s"aggregate '${other.prettyName}' is not derivable from a rollup"))
      }
    }
    scala.Right(AggShape(path, groupCols, filterCols, sums, counts, mins, maxs,
      countStar, distincts))
  }

  /** Group shapes into grain clusters by KEY-SET CONTAINMENT: the widest
    * key sets seed clusters and every shape whose keys are a subset of a
    * seed joins it (first match in deterministic seed order); shapes
    * comparable to no cluster seed new ones. Containment is the safe
    * merge rule — a shape regroups through any superset grain — while
    * merging INCOMPARABLE key sets (the old single-grain fold) multiplies
    * the grain's cardinality: one near-unique filter column poisons the
    * compression of every query sharing the base.
    */
  private[plans] def clusterByContainment(
      ss: Seq[AggShape]): Seq[Seq[AggShape]] = {
    val keyed = ss.map(s => (s, (s.groupCols ++ s.filterCols).distinct.toSet))
      .sortBy { case (_, k) => (-k.size, k.toSeq.sorted.mkString(",")) }
    val clusters =
      scala.collection.mutable.Buffer
        .empty[(Set[String], scala.collection.mutable.Buffer[AggShape])]
    for ((s, k) <- keyed) {
      clusters.find { case (grain, _) => k.subsetOf(grain) } match {
        case Some((_, members)) => members += s
        case None => clusters += ((k,
          scala.collection.mutable.Buffer(s)))
      }
    }
    clusters.map(_._2.toSeq).toSeq
  }

  /** Stats-fed cost estimate for a recommendation (r19): the MV's row
    * count is bounded by the product of its key-column NDVs
    * ([[StatsCatalog]] sketches), capped at the base row count;
    * `compression` = base rows / estimated MV rows is the payoff of
    * materializing — the scan shrink every rewritten dashboard gets.
    * None when the base is un-analyzed or a key has no sketch: the
    * advisor's structural recommendations need no statistics, the cost
    * model only RANKS them (materialize high-compression ones first,
    * skip grain-near-rows ones) — the same harvested sketches that
    * auto-arm [[EagerAggJoin]].
    */
  final case class MvCost(baseRows: Long, estimatedMvRows: Long) {
    def compression: Double = baseRows.toDouble / math.max(1L, estimatedMvRows)
  }

  def costOf(rec: Recommendation): Option[MvCost] =
    StatsCatalog.lookup(rec.basePath).flatMap { st =>
      val ndvs = rec.keys.map(k => st.cols.get(k).map(_.ndv))
      if (ndvs.exists(_.isEmpty) || st.rows <= 0) None
      else {
        var est = 1.0d
        ndvs.flatten.foreach(n =>
          est = math.min(est * math.max(n, 1L), st.rows.toDouble))
        Some(MvCost(st.rows, math.round(est)))
      }
    }

  /** Fold harvested shapes into per-base recommendations: one rollup PER
    * CONTAINMENT CLUSTER of the distinct-free shapes (a DISTINCT
    * aggregate bails the whole rewrite, so those queries are served by
    * the multiplicity stores and must not widen a rollup grain), plus
    * one multiplicity store per DISTINCT-counted column at ITS USERS'
    * grain. Shapes from different bases never mix.
    */
  def recommend(shapes: Seq[AggShape]): Seq[Recommendation] =
    shapes.groupBy(_.basePath).toSeq.sortBy(_._1).flatMap {
      case (base, ss) =>
        val rollupShapes = ss.filter(s => s.distinctCols.isEmpty &&
          (s.sums.nonEmpty || s.counts.nonEmpty || s.mins.nonEmpty ||
            s.maxs.nonEmpty || s.countStar))
        val rollups = clusterByContainment(rollupShapes).map { members =>
          val keys = members.flatMap(s => s.groupCols ++ s.filterCols).distinct
          Recommendation(
            base, "rollup", keys,
            members.flatMap(_.sums).toSet, members.flatMap(_.counts).toSet,
            members.flatMap(_.mins).toSet, members.flatMap(_.maxs).toSet,
            queriesAnswered = members.length)
        }
        val mults = ss.flatMap(_.distinctCols).distinct.sorted.map { v =>
          // the store inherits the measures of the queries it answers —
          // a `count(DISTINCT v), sum(y)` dashboard needs s_y ON the
          // multiplicity grain (sums re-aggregate through any finer
          // grain), or the rewrite would bail on the measure — and only
          // ITS USERS' key columns: an unrelated dashboard's filter
          // column would multiply the stored pair count for nothing
          val users = ss.filter(_.distinctCols.contains(v))
          val keys = users.flatMap(s => s.groupCols ++ s.filterCols)
            .distinct.filterNot(_ == v) :+ v
          Recommendation(
            base, "multiplicity", keys,
            users.flatMap(_.sums).toSet, users.flatMap(_.counts).toSet,
            users.flatMap(_.mins).toSet, users.flatMap(_.maxs).toSet,
            queriesAnswered = users.length)
        }
        rollups ++ mults
    }

  /** Harvest every join-aggregate shape [[MvRewrite.rewriteJoin]] could
    * answer from one query's optimized plan: an Aggregate over an INNER
    * equi-join of two single-root parquet scans. Orientation follows the
    * plan (left = fact); the rewrite tries both registered orientations,
    * so the choice only names the recommendation.
    */
  def analyzeJoins(df: DataFrame): Seq[Either[Rejection, JoinShape]] = {
    val out =
      scala.collection.mutable.Buffer.empty[Either[Rejection, JoinShape]]
    df.queryExecution.optimizedPlan.foreach {
      case agg: Aggregate => harvestJoin(agg).foreach(out += _)
      case _ =>
    }
    out.toSeq
  }

  private def harvestJoin(
      agg: Aggregate): Option[Either[Rejection, JoinShape]] = {
    def stripToJoin(p: LogicalPlan, conds: Seq[Expression])
        : Option[(Seq[Expression], Join)] = p match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        stripToJoin(c, conds)
      case Filter(cond, c) => stripToJoin(c, conds ++ splitConjuncts(cond))
      case jn: Join        => Some((conds, jn))
      case _               => None
    }
    val (aboveConds, jn) = stripToJoin(agg.child, Nil).getOrElse(return None)
    if (jn.joinType != org.apache.spark.sql.catalyst.plans.Inner) return None
    val (lConds, lPath, lLr) = stripSide(jn.left).getOrElse(return None)
    val (rConds, rPath, rLr) = stripSide(jn.right).getOrElse(return None)
    val lIds = lLr.output.map(_.exprId).toSet
    val rIds = rLr.output.map(_.exprId).toSet
    val lNames = lLr.output.map(_.name).toSet
    val rNames = rLr.output.map(_.name).toSet
    // key equalities out of the join condition; leftover conjuncts are
    // row-grain filters (they re-apply on the stored view) but their
    // columns must still be stored
    var keys = Seq.empty[(String, String)]
    val residual = jn.condition.map(splitConjuncts).getOrElse(return None)
      .filter {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if lIds(a.exprId) && rIds(b.exprId) =>
          keys :+= ((a.name, b.name)); false
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if lIds(b.exprId) && rIds(a.exprId) =>
          keys :+= ((b.name, a.name)); false
        case _ => true
      }
    if (keys.isEmpty) return Some(scala.Left(Rejection(
      "join has no bare fact-column = dim-column equality — a row-grain " +
        "view needs declared key equalities")))
    val allConds = aboveConds ++ lConds ++ rConds ++ residual
    for (c <- allConds if !c.deterministic)
      return Some(scala.Left(Rejection(
        s"non-deterministic filter '${c.sql}' cannot re-apply on a " +
          "stored view")))
    if (!agg.aggregateExpressions.forall(_.deterministic))
      return Some(scala.Left(Rejection(
        "non-deterministic aggregate expression")))
    // every referenced column, side-attributed; a non-key name BOTH
    // sides expose is the ambiguity the rewrite bails on — reject here
    // with the reason instead of recommending a view that can't fire
    val sameNamedKeys = keys.collect { case (f, d) if f == d => f }.toSet
    val refs = (agg.references ++ allConds.flatMap(_.references)).toSeq ++
      keys.flatMap { case (f, d) =>
        Seq(lLr.output.find(_.name == f), rLr.output.find(_.name == d))
          .flatten }
    var cols = Seq.empty[(String, Boolean)]
    for (a <- refs) {
      val isFact = lIds(a.exprId)
      if (!isFact && !rIds(a.exprId)) return None // not this join's column
      if (lNames(a.name) && rNames(a.name) && !sameNamedKeys(a.name))
        return Some(scala.Left(Rejection(
          s"column '${a.name}' exists on both join sides and is not a " +
            "same-named key — the rewrite cannot resolve it by name")))
      val attributed =
        if (lNames(a.name) && rNames(a.name)) (a.name, true)
        else (a.name, isFact)
      if (!cols.contains(attributed)) cols :+= attributed
    }
    Some(scala.Right(JoinShape(lPath, rPath, keys, cols)))
  }

  private def stripSide(p: LogicalPlan)
      : Option[(Seq[Expression], String, LogicalRelation)] = {
    def go(p: LogicalPlan, conds: Seq[Expression])
        : Option[(Seq[Expression], LogicalRelation)] = p match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        go(c, conds)
      case Filter(cond, c) => go(c, conds ++ splitConjuncts(cond))
      case lr: LogicalRelation => Some((conds, lr))
      case _ => None
    }
    go(p, Nil).flatMap { case (conds, lr) =>
      MvRewrite.scanRoot(lr).map(root => (conds, root, lr))
    }
  }

  /** Fold join shapes into one recommendation per (fact, dim, key-set)
    * trio, storing the union of every query's referenced columns.
    */
  def recommendJoins(shapes: Seq[JoinShape]): Seq[JoinRecommendation] =
    shapes.groupBy(s => (s.factPath, s.dimPath, s.joinKeys.toSet)).toSeq
      .sortBy(_._1.toString)
      .map { case ((f, d, _), ss) =>
        JoinRecommendation(f, d, ss.head.joinKeys,
          ss.flatMap(_.columns).distinct, queriesAnswered = ss.length)
      }

  /** One harvested ANN shape: a workload query computes vector
    * similarity (cosine or dot product) over an embedding column read
    * straight off one base table — the access pattern a stored IVF
    * index ([[graft.operators.IvfStore]]) turns from a full-corpus scan
    * into a directory-pruned probe.
    */
  final case class AnnShape(basePath: String, embCol: String)

  /** A recommended stored ANN index for a (base, embedding-column)
    * pair. [[IndexRecommendation.materialize]] builds the incremental
    * IVF store from the base corpus; thereafter the serving layer's
    * `ann_probe` answers top-k at flat probe cost and
    * [[graft.operators.IvfStore.ingestSink]] keeps it maintained —
    * the index twin of the MV recommendations (same advisor loop:
    * analyze the workload, recommend the access structure, build it).
    */
  final case class IndexRecommendation(
      basePath: String,
      embCol: String,
      queriesAnswered: Int) {

    def storeName: String = {
      def safe(t: String): String = t.replaceAll("[^A-Za-z0-9_]", "_")
      s"advisor_ivf_${safe(new java.io.File(basePath).getName)}_${safe(embCol)}"
    }

    /** Build the stored IVF index at `root` from the base corpus (plain
      * parquet or Iceberg — the read pins at the current snapshot).
      * `idCol` must name the base's row-identity column
      * ([[graft.operators.IvfStore.create]]'s contract: tombstones and
      * probe tie-breaks key on it). Registers the store in
      * [[graft.operators.StoreCatalog]] — with full source lineage
      * (watermark = the snapshot the build read) when the base is
      * Iceberg, so the catalog sweep's
      * [[graft.operators.StoreCatalog.refreshStep]] keeps it current;
      * lineage-less (compaction-only) for a plain-parquet base.
      */
    def materialize(
        spark: SparkSession,
        root: String,
        nCells: Int = 16,
        cellCap: Long = 100000L,
        idCol: String = "vec_id"): graft.operators.IvfStore.Meta = {
      // ONE metadata load pins BOTH the build read and the registered
      // watermark: loading again after the build would stamp a snapshot
      // that committed mid-build as "applied" — refreshStep would then
      // skip that window's rows forever, silently
      val iceMeta =
        if (graft.sources.IcebergMeta.hasMetadata(basePath))
          Some(graft.sources.IcebergMeta.load(basePath))
        else None
      val base = iceMeta match {
        case Some(m) => graft.sources.IcebergSource.read(
          spark, basePath, snapshotId = m.currentSnapshot.map(_.id),
          asOfTimestampMs = None, prune = None, preloaded = Some(m))
        case None => spark.read.parquet(basePath)
      }
      val meta = graft.operators.IvfStore.create(
        base, embCol, root, nCells = nCells, cellCap = cellCap,
        idCol = idCol)
      val source = iceMeta.flatMap(_.currentSnapshot)
        .map(s => graft.operators.StoreSource(
          basePath, embCol, idCol, watermark = s.id))
      graft.operators.StoreCatalog.register(graft.operators.StoreDef(
        storeName, "ivf", root, source))
      meta
    }
  }

  /** Harvest every ANN shape from one query's optimized plan: any
    * cosine-similarity or dot-product expression whose argument is an
    * `array<float>` column read off a single-root scan (the other
    * argument is typically the broadcast/literal query vector — not
    * this harvest's concern). Plan position is deliberately ignored:
    * brute-force top-k (Sort+Limit over the score), threshold filters,
    * and self-join near-dup shapes all pay the same full-corpus
    * similarity evaluation an IVF store prunes.
    */
  def analyzeAnn(df: DataFrame): Seq[AnnShape] =
    harvestScanColumns(df,
      e => e.isInstanceOf[graft.functions.CosineSimilarity] ||
        e.isInstanceOf[graft.functions.DotProduct],
      {
        case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, _) => true
        case _ => false
      }).map { case (root, c) => AnnShape(root, c) }

  /** The shared index-advisor harvester: every expression the matcher
    * accepts is walked in FULL (so a column behind a Cast or a nested
    * composition still harvests), and each matching-typed attribute in
    * its subtree that resolves to a single-root scan emits one
    * (root, column) pair — deduped in first-seen order.
    */
  private def harvestScanColumns(
      df: DataFrame,
      matcher: Expression => Boolean,
      attrType: org.apache.spark.sql.types.DataType => Boolean
  ): Seq[(String, String)] = {
    val plan = df.queryExecution.optimizedPlan
    def rootOfAttr(a: AttributeReference): Option[String] =
      plan.collectFirst {
        case lr: LogicalRelation if lr.output.exists(_.exprId == a.exprId) =>
          MvRewrite.scanRoot(lr)
      }.flatten
    val out = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
    plan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case e if matcher(e) =>
          e.foreach {
            case a: AttributeReference if attrType(a.dataType) =>
              rootOfAttr(a).foreach(r => out += ((r, a.name)))
            case _ => ()
          }
        case _ => ()
      })
    }
    out.toSeq
  }

  /** Fold ANN shapes into one index recommendation per
    * (base, embedding-column) pair, counting the workload shapes each
    * would serve.
    */
  def recommendIndexes(shapes: Seq[AnnShape]): Seq[IndexRecommendation] =
    shapes.groupBy(s => (s.basePath, s.embCol)).toSeq.sortBy(_._1)
      .map { case ((base, emb), ss) =>
        IndexRecommendation(base, emb, queriesAnswered = ss.length)
      }

  /** One harvested dedup shape: a workload query computes MinHash
    * signatures or word shingles over a text column read off one base
    * table — the access pattern the stored MinHash/LSH index
    * ([[graft.operators.MinHashIndex]]) turns from a per-run corpus
    * recompute into increment-cost banded lookups.
    */
  final case class DedupShape(basePath: String, textCol: String)

  /** A recommended stored MinHash index for a (base, text-column) pair —
    * the dedup twin of [[IndexRecommendation]]: materialize builds the
    * versioned index once, then incremental dedup
    * ([[graft.queries.DedupQueries.incrementalPairs]]) and the
    * leakage-safe split store match each ingest batch against it at
    * increment cost, and [[graft.operators.MinHashIndex.foldOnce]]
    * keeps it maintained exactly-once.
    */
  final case class DedupIndexRecommendation(
      basePath: String,
      textCol: String,
      queriesAnswered: Int) {

    def storeName: String = {
      def safe(t: String): String = t.replaceAll("[^A-Za-z0-9_]", "_")
      s"advisor_minhash_${safe(new java.io.File(basePath).getName)}" +
        s"_${safe(textCol)}"
    }

    /** Build the stored MinHash/LSH index at `root` from the base
      * corpus (plain parquet or Iceberg). The index pipeline keys rows
      * by `doc_id` and shingles `text`, so the base's identity and text
      * columns are renamed into that contract. Registers the store in
      * [[graft.operators.StoreCatalog]] (Iceberg base → full lineage
      * with the build snapshot as watermark, so the catalog sweep keeps
      * it current; plain parquet → compaction-only).
      */
    def materialize(
        spark: SparkSession,
        root: String,
        idCol: String = "doc_id"): graft.operators.MinHashIndex.StoredIndex = {
      // one metadata load pins the build read AND the registered
      // watermark — same mid-build-commit rationale as the IVF twin
      val iceMeta =
        if (graft.sources.IcebergMeta.hasMetadata(basePath))
          Some(graft.sources.IcebergMeta.load(basePath))
        else None
      val base = iceMeta match {
        case Some(m) => graft.sources.IcebergSource.read(
          spark, basePath, snapshotId = m.currentSnapshot.map(_.id),
          asOfTimestampMs = None, prune = None, preloaded = Some(m))
        case None => spark.read.parquet(basePath)
      }
      val idx = graft.operators.MinHashIndex.materialize(
        base.select(
          org.apache.spark.sql.functions.col(idCol).as("doc_id"),
          org.apache.spark.sql.functions.col(textCol).as("text")),
        root)
      val source = iceMeta.flatMap(_.currentSnapshot)
        .map(s => graft.operators.StoreSource(
          basePath, textCol, idCol, watermark = s.id))
      graft.operators.StoreCatalog.register(graft.operators.StoreDef(
        storeName, "minhash", root, source))
      idx
    }
  }

  /** Harvest every dedup shape from one query's optimized plan: a
    * MinHash-signature or word-shingle expression whose subtree reads a
    * string column off a single-root scan. As with [[analyzeAnn]], plan
    * position is ignored — signature projection, LSH banding, and exact
    * shingle-join dedup all start from the same per-corpus shingle
    * computation a stored index amortizes.
    */
  def analyzeDedup(df: DataFrame): Seq[DedupShape] =
    harvestScanColumns(df,
      e => e.isInstanceOf[graft.functions.MinHashSignature] ||
        e.isInstanceOf[graft.functions.WordShingles],
      _ == org.apache.spark.sql.types.StringType)
      .map { case (root, c) => DedupShape(root, c) }

  /** Fold dedup shapes into one MinHash-index recommendation per
    * (base, text-column) pair.
    */
  def recommendDedupIndexes(
      shapes: Seq[DedupShape]): Seq[DedupIndexRecommendation] =
    shapes.groupBy(s => (s.basePath, s.textCol)).toSeq.sortBy(_._1)
      .map { case ((base, text), ss) =>
        DedupIndexRecommendation(base, text, queriesAnswered = ss.length)
      }
}
