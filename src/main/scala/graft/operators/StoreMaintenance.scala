package graft.operators

import org.apache.spark.sql.SparkSession

/** One shared dispatch for the store-maintenance faces — the serving
  * actions `store_describe` / `store_compact` and their CLI twins — so
  * the kind routing AND the validations live exactly once (the two
  * faces had already drifted when they each carried their own copy:
  * the CLI accepted an nFiles the ivf compact silently dropped and
  * reported `segments=0` for a path that was no store at all).
  *
  * `describe` is metadata-only (the pressure gauge a scheduler polls
  * to decide when compaction is due); `compact` runs the store's own
  * offline fold under its usual single-writer contract. Both refuse
  * loudly — unknown kind, wrong-kind root, ivf + nFiles — with
  * messages safe to ship to a wire client verbatim.
  */
object StoreMaintenance {

  val Kinds: Seq[String] = Seq("minhash", "ivf", "split")

  /** One gauge row: `version` is None for stores without a version
    * cursor (split), `detail` carries per-kind extras (ivf: live rows,
    * tombstones, model leaves), `tombstones` the live dead-list count
    * (minhash/ivf) — the second read-amplification term next to
    * `segments`, and the autopilot's second compaction trigger.
    *
    * FRESHNESS (round 18): when the root belongs to a store registered
    * in [[StoreCatalog]] with source lineage, the gauge also reports
    * `registered` (the store name), its `watermark`, the live source
    * `head`, and `fresh` = watermark == head — so a scheduler polls
    * staleness AND compaction pressure from ONE verb, the same way
    * `mv_describe` reports its fresh verdict. An unreachable source
    * leaves head/fresh empty with the reason in `detail` (the gauge
    * stays metadata-only and never fails on lineage problems).
    */
  final case class Gauge(
      kind: String,
      root: String,
      version: Option[Long],
      segments: Int,
      detail: Option[String],
      tombstones: Option[Int] = None,
      registered: Option[String] = None,
      watermark: Option[Long] = None,
      head: Option[Long] = None,
      fresh: Option[Boolean] = None)

  private def unknown(kind: String): Nothing =
    throw new IllegalArgumentException(
      s"unknown store kind '$kind' (one of: ${Kinds.mkString(", ")})")

  /** The maintenance-pressure gauge, metadata-only. The minhash row
    * resolves the version head ONCE and counts that version's segments
    * (never a torn version/segments pair under a concurrent compact).
    */
  def describe(spark: SparkSession, kind: String, root: String): Gauge = {
    val base = kind match {
      case "minhash" =>
        val idx = MinHashIndex.StoredIndex(root)
        val v = MinHashIndex.currentVersion(spark, idx)
        Gauge("minhash", root, Some(v.toLong),
          MinHashIndex.segmentCount(spark, idx, v), None,
          tombstones = Some(MinHashIndex.tombstoneCount(spark, idx, v)))
      case "ivf" =>
        val m = IvfStore.load(root)
        Gauge("ivf", root, Some(m.version.toLong), m.segments.size,
          Some(s"rows=${m.counts.values.sum} " +
            s"leaves=${m.model.leaves.size}"),
          tombstones = Some(m.tombstones.size))
      case "split" =>
        val segs = SplitStore.liveSegments(root)
        require(segs > 0,
          s"$root is not a split store (no live segments)")
        Gauge("split", root, None, segs, None)
      case other => unknown(other)
    }
    attachFreshness(base)
  }

  /** Lineage attachment for [[describe]]: see the Gauge doc. */
  private def attachFreshness(g: Gauge): Gauge =
    StoreCatalog.findByRoot(g.root) match {
      case None => g
      case Some(d) =>
        d.source match {
          case None => g.copy(registered = Some(d.name))
          case Some(src) =>
            scala.util.Try(graft.sources.IcebergMeta
                .load(src.basePath).currentSnapshot.map(_.id)) match {
              case scala.util.Success(head) =>
                g.copy(registered = Some(d.name),
                  watermark = Some(src.watermark), head = head,
                  fresh = head.map(_ == src.watermark))
              case scala.util.Failure(e) =>
                g.copy(registered = Some(d.name),
                  watermark = Some(src.watermark),
                  detail = Some((g.detail.toSeq :+
                    ("source unreachable: " +
                      Option(e.getMessage).getOrElse(e.toString)
                        .replaceAll("\\s+", " ").take(120)))
                    .mkString(" ")))
            }
        }
    }

  /** One [[autopilot]] row: `segmentsBefore` is the gauge that drove
    * the decision; `segmentsAfter` is present only when a compact ran;
    * `skipped` carries a per-store error (gauge or compact failure —
    * one broken store never blocks the walk).
    */
  final case class AutopilotResult(
      name: String,
      kind: String,
      segmentsBefore: Option[Int],
      compacted: Boolean,
      segmentsAfter: Option[Int],
      skipped: Option[String])

  /** The compaction AUTOPILOT: walk every store registered in
    * [[StoreCatalog]], gauge it, and compact those whose live segment
    * count exceeds `segmentThreshold` — the scheduled "keep read
    * amplification bounded" job a production deployment runs nightly,
    * expressed once instead of per-store cron entries. Lineage-less
    * (compaction-only) registrations are first-class here — this walk
    * is exactly the maintenance face [[StoreDef]] promises them; the
    * changelog-refresh half ([[StoreCatalog.refreshStep]] via
    * `maintainAll`) needs lineage, compaction pressure does not.
    * Same single-maintainer contract as each store's own compact:
    * quiesce that store's writers, run one autopilot at a time.
    */
  def autopilot(
      spark: SparkSession,
      segmentThreshold: Int = 8): Seq[AutopilotResult] = {
    require(segmentThreshold > 0, "segmentThreshold must be positive")
    // same enforced single-maintainer story as the refresh sweep: with
    // spark.graft.maintenance.lease set, a racing autopilot backs off
    // instead of double-compacting the walk (round 18)
    MaintenanceLease.withConfigured(spark) {
      StoreCatalog.describe().map { d =>
        try {
          val g = describe(spark, d.kind, d.root)
          val before = g.segments
          // pressure = max(segments, live tombstone lists): a
          // delete-heavy store can sit at one data segment while its
          // dead lists (each an extra anti-join input per read) pile
          // up — without this second trigger it would never compact
          val pressure = math.max(before, g.tombstones.getOrElse(0))
          if (pressure <= segmentThreshold)
            AutopilotResult(d.name, d.kind, Some(before),
              compacted = false, None, None)
          else {
            // r19 LEVELED policy (the autopilot picks the level):
            // tombstone pressure needs the FULL rewrite — a list only
            // dies when every segment it covers merges, and the global
            // clear is the full compact's contract; plain segment
            // pressure on a minhash store takes the INCREMENTAL step
            // instead, merging just enough of the smallest segments to
            // get back under the threshold — cost bounded by the bytes
            // merged, never the store size. Other kinds keep the full
            // compact until they grow a step face.
            val tombs = g.tombstones.getOrElse(0)
            val mergeCount = math.max(2, before - segmentThreshold + 1)
            if (tombs > segmentThreshold) compact(spark, d.kind, d.root, None): Unit
            else d.kind match {
              case "minhash" =>
                MinHashIndex.compactStep(spark,
                  MinHashIndex.StoredIndex(d.root), mergeCount): Unit
              case "ivf" =>
                IvfStore.compactStep(spark, d.root, mergeCount): Unit
              case _ => compact(spark, d.kind, d.root, None): Unit
            }
            AutopilotResult(d.name, d.kind, Some(before), compacted = true,
              Some(describe(spark, d.kind, d.root).segments), None)
          }
        } catch {
          // a LOST lease aborts the whole walk, never degrades to a row
          case e: MaintenanceLease.LostException => throw e
          case scala.util.control.NonFatal(e) =>
            AutopilotResult(d.name, d.kind, None, compacted = false, None,
              Some("error: " + Option(e.getMessage).getOrElse(e.toString)
                .replaceAll("\\s+", " ").take(200)))
        }
      }
    }
  }

  /** The store's own offline compaction; returns the post-fold gauge
    * summary text the faces print/stream. `nFiles = None` means the
    * caller passed no file count — REQUIRED for kind `ivf`, whose
    * compact re-clusters one file per cell and would otherwise let the
    * caller believe a dropped argument applied.
    */
  def compact(
      spark: SparkSession, kind: String, root: String,
      nFiles: Option[Int]): String = {
    // commit fence: inside a leased sweep (the autopilot), renew-or-
    // refuse before rewriting the store (no-op for leaseless callers)
    MaintenanceLease.fenceActive()
    nFiles.foreach(n => require(n > 0, "nFiles must be positive"))
    kind match {
      case "minhash" =>
        val idx = MinHashIndex.StoredIndex(root)
        MinHashIndex.compact(spark, idx, nFiles.getOrElse(8))
        s"version=${MinHashIndex.currentVersion(spark, idx)}"
      case "ivf" =>
        require(nFiles.isEmpty,
          "kind 'ivf' takes no nFiles — its compact re-clusters one " +
            "file per cell")
        val m = IvfStore.compact(spark, root)
        s"version=${m.version} segments=${m.segments.size}"
      case "split" =>
        SplitStore.compact(spark, SplitStore.Store(root),
          nFiles.getOrElse(8))
        s"segments=${SplitStore.liveSegments(root)}"
      case other => unknown(other)
    }
  }
}
