package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered stored index/store: the maintenance unit the catalog
  * sweep ([[graft.plans.MvAdvisor.maintainAll]]) and the compaction
  * autopilot ([[StoreMaintenance.autopilot]]) walk.
  * `source` carries the lineage that makes a store REFRESHABLE — the
  * Iceberg base it was built from, which base columns map onto the
  * store's (id, payload) contract, and the applied snapshot cursor.
  * All three kinds refresh when lineage is present (minhash/ivf via
  * their changelog windows, split via the leakage-safe ingest of
  * insert windows). Stores registered WITHOUT lineage (`source =
  * None` — hand-built indexes, stores whose base isn't Iceberg) are
  * compaction-only: the refresh sweep reports them skipped, the
  * autopilot still gauges and compacts them.
  */
final case class StoreDef(
    name: String,
    kind: String, // one of StoreMaintenance.Kinds
    root: String,
    source: Option[StoreSource])

/** Source lineage of a refreshable store: `basePath` is the Iceberg
  * table the store indexes, `idCol` its row-identity column, `column`
  * the indexed payload (text for minhash, embedding for ivf),
  * `watermark` the base snapshot the store state reflects.
  *
  * `idCol` carries PRIMARY-KEY semantics: at most one live row per id
  * in the base — the same precondition Iceberg equality deletes and
  * every CDC upsert encoding already impose (an equality delete removes
  * ALL rows of its key; a key with concurrent duplicates has no
  * coherent update story). A base that violates it makes the refresh's
  * per-id window netting collapse duplicate identities arbitrarily —
  * enforce uniqueness upstream, where the duplicate write is the bug.
  */
final case class StoreSource(
    basePath: String,
    column: String,
    idCol: String,
    watermark: Long)

/** Process-wide registry of stored indexes/stores — the store twin of
  * [[graft.plans.MvCatalog]] (same scope, same replace-by-name identity,
  * same single-maintainer contract: the registry's watermark advance is
  * each refresh step's commit, so run one sweep at a time). Advisor
  * builds ([[graft.plans.MvAdvisor.IndexRecommendation.materialize]] and
  * its dedup twin) register here automatically; hand-built stores can
  * register too to join the maintenance loop.
  */
object StoreCatalog {

  private val byName = new ConcurrentHashMap[String, StoreDef]()

  def register(d: StoreDef): Unit = {
    require(StoreMaintenance.Kinds.contains(d.kind),
      s"unknown store kind '${d.kind}' " +
        s"(one of: ${StoreMaintenance.Kinds.mkString(", ")})")
    byName.put(d.name, d): Unit
  }

  def unregister(name: String): Unit = byName.remove(name): Unit

  def find(name: String): Option[StoreDef] = Option(byName.get(name))

  /** The registered store living at `root`, if any — path-normalized so
    * the maintenance gauge ([[StoreMaintenance.describe]]) can attach
    * lineage/staleness to a describe addressed by filesystem root.
    */
  def findByRoot(root: String): Option[StoreDef] = {
    val key = graft.plans.MvCatalog.normalize(root)
    import scala.jdk.CollectionConverters._
    byName.values.asScala
      .find(d => graft.plans.MvCatalog.normalize(d.root) == key)
  }

  /** Every registered store, sorted by name — the sweep's work list. */
  def describe(): Seq[StoreDef] = {
    import scala.jdk.CollectionConverters._
    byName.values.asScala.toSeq.sortBy(_.name)
  }

  def clear(): Unit = byName.clear()

  /** Advance a registered store's watermark — each refresh step's
    * commit (replace-by-name, same discipline as MvCatalog re-register).
    */
  private[graft] def advanceWatermark(name: String, snapshot: Long): Unit =
    byName.computeIfPresent(name, (_, d) =>
      d.copy(source = d.source.map(_.copy(watermark = snapshot)))): Unit

  /** One refresh step for a registered index store: apply the source
    * changelog (watermark, head] and advance the cursor. Returns the
    * applied snapshot, or None when the store is already current.
    * Cost shape by window content:
    *
    *  - INSERT-only window (the training-pipeline append shape): O(churn)
    *    — minhash folds the batch exactly-once ([[MinHashIndex.foldOnce]]
    *    keyed on the snapshot id), ivf pays one map-only assignment pass
    *    ([[IvfStore.ingest]]).
    *  - DELETE-only window: BOTH kinds tombstone the deleted ids at
    *    O(metadata) — [[MinHashIndex.deleteOnce]] (round 18; the r17
    *    O(corpus) rebuild is gone) and [[IvfStore.delete]]. Every
    *    candidate-emitting read anti-joins the dead lists, so a stale
    *    entry never emits a false candidate pair; the next compact drops
    *    the rows physically.
    *  - Window with UPDATES (delete+insert of one id): both kinds
    *    tombstone every updated/deleted id (scoped to the pre-existing
    *    segments) and then fold/ingest the net inserts into a NEW,
    *    uncovered segment — O(churn) end to end (round 18; the r17
    *    resurrection-guard compact that made this O(store) is gone —
    *    tombstones are segment-scoped, so new values are never hidden
    *    by old deletes). The offline compact remains the pressure valve
    *    that physically drops dead rows ([[StoreMaintenance.autopilot]]
    *    triggers on live tombstone-list count as well as segments).
    *  - SPLIT stores ([[SplitStore]]): insert-only windows ingest
    *    through the leakage-safe assignment path (O(churn), snapshot-
    *    token idempotent); any delete/update REFUSES — assignments are
    *    frozen by the leakage contract (see [[refreshSplit]]).
    *
    * Replay/crash: the registry is process-scoped (like MvCatalog), so
    * the watermark is an in-JVM cursor — a crashed maintainer's restart
    * re-registers (re-materializes) rather than replaying a half-applied
    * window. Within a JVM, the head==watermark check plus the
    * single-maintainer contract make each window apply once.
    */
  def refreshStep(spark: SparkSession, d: StoreDef): Option[Long] = {
    // commit fence: inside a leased sweep, renew-or-refuse before
    // touching the store (no-op for leaseless deployments)
    MaintenanceLease.fenceActive()
    val src = d.source.getOrElse(throw new IllegalStateException(
      s"store '${d.name}' has no source lineage — nothing to refresh " +
        "against"))
    require(graft.sources.IcebergMeta.hasMetadata(src.basePath),
      s"store '${d.name}' source ${src.basePath} is not an Iceberg table")
    val meta = graft.sources.IcebergMeta.load(src.basePath)
    val head = meta.currentSnapshot.getOrElse(
      throw new IllegalStateException(
        s"iceberg base ${src.basePath} has no snapshots")).id
    if (head == src.watermark) return None
    require(meta.snapshots.exists(_.id == src.watermark),
      s"store watermark ${src.watermark} is not a snapshot of " +
        s"${src.basePath} — the source history was rewritten under the " +
        "store; re-materialize")
    // PREFIX-SKIP against the store's OWN exactly-once memory: the
    // registered watermark can be STALE (a maintainer that crashed after
    // applying a window but before its catalog_save reloads the older
    // cursor), and re-applying an already-applied prefix would corrupt a
    // mutable store (double-folded minhash rows, duplicated ivf
    // vectors). The stores already record what they applied — minhash's
    // `_folded/snap-<id>` tokens, ivf's refresh-namespaced
    // lastRefreshSnapshot cursor — so
    // the effective window start is the NEWEST chain snapshot the store
    // remembers applying; split converges through its own
    // already-assigned anti-join (see [[refreshSplit]]).
    val chain = { // snapshot ids in (watermark, head], oldest first
      var acc = List.empty[Long]
      var cur = meta.snapshots.find(_.id == head)
      while (cur.isDefined && cur.get.id != src.watermark) {
        acc = cur.get.id :: acc
        cur = cur.get.parentId.flatMap(p => meta.snapshots.find(_.id == p))
      }
      acc
    }
    val effFrom: Long = d.kind match {
      case "minhash" =>
        val idx = MinHashIndex.StoredIndex(d.root)
        chain.filter(id =>
          MinHashIndex.foldTokenExists(spark, idx, s"snap-$id"))
          .lastOption.getOrElse(src.watermark)
      case "ivf" =>
        // the refresh-namespaced cursor (round 18): membership in the
        // pending chain, never ordering — works for foreign tables with
        // random snapshot ids, and a store also fed by streaming
        // ingestSink can no longer collide its batch ids into this check
        val last = IvfStore.load(d.root).lastRefreshSnapshot
        if (chain.contains(last)) last else src.watermark
      case _ => src.watermark
    }
    if (effFrom == head) {
      // the store already holds this head — only the registry cursor was
      // stale; repair it and report the snapshot as (re-)applied
      advanceWatermark(d.name, head)
      return Some(head)
    }
    val window = graft.sources.IcebergSource.readChangelog(
      spark, src.basePath, fromSnapshotId = effFrom,
      toSnapshotId = Some(head), preloaded = Some(meta))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val hasDeletes = !window.filter(col("_change_type") === "delete")
        .isEmpty
      d.kind match {
        case "minhash" => refreshMinhash(spark, d, src, meta, head, window,
          hasDeletes)
        case "ivf" => refreshIvf(spark, d, src, head, window, hasDeletes)
        case "split" => refreshSplit(spark, d, src, head, window, hasDeletes)
        case other => throw new IllegalStateException(
          s"store kind '$other' has no changelog refresh path")
      }
      advanceWatermark(d.name, head)
      Some(head)
    } finally window.unpersist(blocking = false): Unit
  }

  /** Minhash refresh (round 18 — tombstones, never a rebuild): a window
    * carrying deletes tombstones every id with a delete change at
    * O(metadata) ([[MinHashIndex.deleteOnce]], snapshot-keyed
    * exactly-once), then folds the NET inserts. The tombstone list is
    * SEGMENT-SCOPED to the pre-existing segments, so the fold's new
    * segment is uncovered and an UPDATE (delete old + fold new of one
    * id) is two O(churn) commits with no compact — order matters
    * (delete first, so the fold's segment post-dates the scope), and the
    * crash replay preserves it: a replayed delete skips via its marker
    * (its original scope intact), then the fold runs. Insert-only
    * windows stay the plain O(churn) fold. Every path ends by recording
    * the `snap-<head>` window token, so a stale-cursor maintainer
    * prefix-skips delete-only windows exactly like folded ones.
    */
  private def refreshMinhash(
      spark: SparkSession,
      d: StoreDef,
      src: StoreSource,
      meta: graft.sources.IcebergMeta.TableMeta,
      head: Long,
      window: DataFrame,
      hasDeletes: Boolean): Unit = {
    val idx = MinHashIndex.StoredIndex(d.root)
    if (!hasDeletes) {
      val inserts = windowInserts(window, src)
      // snapshot-keyed fold token: a window replayed inside one JVM (or
      // against a shared filesystem by a second maintainer) no-ops
      if (!inserts.isEmpty)
        MinHashIndex.foldOnce(inserts, idx, token = s"snap-$head"): Unit
    } else {
      val delIds = window.filter(col("_change_type") === "delete")
        .select(col(src.idCol).as("doc_id")).distinct()
      MinHashIndex.deleteOnce(delIds, idx, token = s"snap-$head"): Unit
      // the fold must carry each id's FINAL value only: an un-netted
      // multi-snapshot window (insert v1, delete, insert v2 of one id)
      // would fold both versions' rows
      val netInserts = netLastChange(window, src.idCol)
        .filter(col("_change_type") === "insert")
        .select(col(src.idCol).as("doc_id"), col(src.column).as("text"))
      if (!netInserts.isEmpty)
        // segment-scoped tombstones make this safe without a compact:
        // the tombstone above covers only the PRE-EXISTING segments, so
        // this fold's segment is uncovered and a re-inserted id is
        // visible immediately — the update window is O(churn) end to end
        MinHashIndex.foldOnce(netInserts, idx, token = s"snap-$head"): Unit
      // delete-only windows never fold, so the window-applied token the
      // prefix-skip reads must be recorded explicitly (a no-op when the
      // fold above already committed it)
      MinHashIndex.recordFoldToken(spark, idx, s"snap-$head")
    }
  }

  /** Split-store refresh: an INSERT-only window is exactly
    * [[SplitStore.ingest]]'s contract — the new docs get leakage-safe
    * sides against the frozen corpus (inherit / quarantine-on-conflict /
    * fresh-hash) at increment cost, keyed by the snapshot token so a
    * replayed window is a structural no-op. A window carrying DELETES
    * (or updates — delete+insert of an assigned id) REFUSES: assignments
    * are immutable by the leakage contract (a doc's side was exposed to
    * training; re-assigning or forgetting it cannot retract that), so
    * there is no sound automatic answer — the sweep surfaces the error
    * and the store's owner decides (typically: rebuild under a new
    * root at the next training-set cut). The ingest's own id-collision
    * guard backstops this: even a mislabeled window cannot silently
    * re-side an assigned doc.
    */
  private def refreshSplit(
      spark: SparkSession,
      d: StoreDef,
      src: StoreSource,
      head: Long,
      window: DataFrame,
      hasDeletes: Boolean): Unit = {
    if (hasDeletes) throw new IllegalStateException(
      s"split store '${d.name}': the changelog window carries deletes, " +
        "but split assignments are frozen (exposure cannot be " +
        "retracted) — rebuild the store under a new root to drop rows")
    val inserts = windowInserts(window, src)
    // PARTIAL-REPLAY convergence: a maintainer that crashed between a
    // refresh and its catalog_save restarts with an older watermark, so
    // this window can cover docs an earlier step ALREADY assigned (under
    // a token this head-keyed token no longer matches). Their
    // assignments are frozen — skipping them is the sound answer — and
    // without the skip the ingest's id-collision guard would refuse the
    // whole window forever, wedging the store on exactly the restart
    // path the durable catalog exists for. Both probes broadcast the
    // churn-sized side; the assignment table never shuffles.
    val already = SplitStore
      .assignments(spark, SplitStore.Store(d.root))
      .select(col("doc_id"))
      .join(broadcast(inserts.select(col("doc_id"))),
        Seq("doc_id"), "left_semi")
    val fresh = inserts.join(broadcast(already), Seq("doc_id"), "left_anti")
    if (!fresh.isEmpty)
      SplitStore.ingest(spark, SplitStore.Store(d.root), fresh,
        token = s"snap-$head"): Unit
  }

  /** The window's insert rows renamed into the text-store contract —
    * shared by the minhash fold and the split ingest so the projection
    * can never drift between the two text-keyed refresh paths.
    */
  private def windowInserts(window: DataFrame, src: StoreSource): DataFrame =
    window
      .filter(col("_change_type") === "insert")
      .select(col(src.idCol).as("doc_id"), col(src.column).as("text"))

  /** Net change per id across a changelog window: last change wins;
    * within one snapshot a delete+insert pair is a MERGE's update
    * encoding, so insert outranks delete at equal snapshot. Shared by the
    * ivf and minhash refresh paths so the netting algebra cannot drift.
    */
  private def netLastChange(window: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val rank = org.apache.spark.sql.functions.row_number().over(
      W.partitionBy(col(idCol))
        .orderBy(col("_change_snapshot_id").desc,
          when(col("_change_type") === "insert", 1).otherwise(0).desc))
    window.withColumn("_rn", rank).filter(col("_rn") === 1).drop("_rn")
  }

  private def refreshIvf(
      spark: SparkSession,
      d: StoreDef,
      src: StoreSource,
      head: Long,
      window: DataFrame,
      hasDeletes: Boolean): Unit = {
    val netted = netLastChange(window, src.idCol)
    val netInserts = netted.filter(col("_change_type") === "insert")
      .drop("_change_type", "_change_snapshot_id")
    // the window's exactly-once key: the head snapshot id, recorded on
    // the REFRESH-NAMESPACED cursor (IvfStore.ingestRefresh /
    // Meta.lastRefreshSnapshot — membership semantics, so foreign tables
    // with random ids key too, and streaming ingestSink batch ids can't
    // collide). The cursor only advances on INGEST (the window's last
    // action), so a crash mid-window replays delete/compact (both
    // content-idempotent) and then ingests — convergent.
    if (hasDeletes) {
      val netDeleted = netted.filter(col("_change_type") === "delete")
        .select(col(src.idCol))
      // ids seen with BOTH change types = updates: netting keeps only
      // the insert, so the OLD value must be explicitly tombstoned too
      // (it is physically dropped by the compact below)
      val updatedIds = window
        .filter(col("_change_type") === "delete")
        .select(col(src.idCol))
        .join(window.filter(col("_change_type") === "insert")
          .select(col(src.idCol)), Seq(src.idCol), "left_semi")
        .distinct()
      IvfStore.delete(spark, d.root,
        netDeleted.union(updatedIds).distinct()): Unit
    }
    if (!netInserts.isEmpty)
      // segment-scoped tombstones (round 18) make this safe without the
      // r17 resurrection-guard compact: the delete above covers only
      // the PRE-EXISTING segments, so this ingest's segment is
      // uncovered and a re-inserted/updated id is visible immediately —
      // the update window is delete + ingest, O(churn) end to end
      IvfStore.ingestRefresh(spark, d.root, netInserts,
        refreshSnapshot = head): Unit
  }
}
