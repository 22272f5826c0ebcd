package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored MinHash/LSH dedup index — the pay-once artifact that makes
  * incremental (new-batch-vs-corpus) dedup an ingest-time operation
  * instead of a corpus recompute.
  *
  * At 100 TB the corpus' shingle sets and band digests are computed in ONE
  * pass and WRITTEN (this object); every daily increment then:
  *   1. computes signatures for its own (tiny) batch,
  *   2. equi-joins its broadcast band digests against the stored band
  *      index — a scan of the stored segments, zero corpus shuffle, and
  *   3. verifies candidates against the stored shingle sets.
  * Without the store, step 2's left side would re-tokenize, re-hash and
  * re-band the whole corpus per increment — the exact cost the index
  * amortizes to once (the IVF index in [[IvfIndex.materialize]] makes the
  * same trade for ANN probes).
  *
  * == Versioned layout (round 10) ==
  *
  * {{{
  *   root/_versions/v<N>                       commit markers (empty files)
  *   root/_folded/<token>                      fold/delete replay memory
  *   root/v<N>/base/{bands,shingles}/          materialized / compacted core
  *   root/v<N>/batch-<token>/{bands,shingles}/ folded batches (segments)
  *   root/v<N>/del-<token>/                    tombstoned doc_ids (round 18)
  *   root/v<N>/.tmp-<token>/                   in-flight fold (invisible)
  * }}}
  *
  * == Tombstone deletes (round 18) ==
  *
  * [[deleteOnce]] commits a doc_id tombstone list as a `del-<token>` dir —
  * an O(|ids|) metadata-scale operation, never a corpus rewrite (the same
  * trade as [[IvfStore.delete]]). Every candidate-emitting read
  * ([[bands]], [[shingles]] — so band joins and incremental pair
  * generation inherit it) anti-joins the live tombstones, so a deleted doc
  * emits no candidate pairs the moment the delete commits; [[compact]]
  * physically drops the dead rows and the lists die with the old version
  * dir.
  *
  * Tombstones are SEGMENT-SCOPED, not global by id: each list records
  * (in its `_scope` side file, written inside the atomic publish) the
  * segments that existed when the delete committed, and the anti-join
  * applies only to rows from those segments. A LATER fold that
  * re-inserts a tombstoned id lands in a new, uncovered segment and is
  * visible immediately — so an UPDATE (delete old value + fold new) is
  * two O(churn) commits with no compact in between, closing the last
  * O(store) window shape the catalog refresh had
  * ([[graft.operators.StoreCatalog]]'s r18 resurrection-compact is
  * gone). A list with no `_scope` file covers every segment (the
  * conservative legacy meaning).
  *
  * Every mutation commits through ONE atomic filesystem primitive, so no
  * crash point loses OR duplicates rows (the round-9 delete+rename swap
  * could duplicate; this layout removes the window instead of healing it):
  *   - fold: rows are written to a hidden `.tmp-<token>` dir, then a
  *     single directory RENAME publishes them as `batch-<token>` (atomic
  *     on HDFS and local filesystems; on rename-less object stores layer
  *     the index on a transactional table format instead);
  *   - compact: the rewritten core is built under the next version dir,
  *     then a single marker-file CREATE under `_versions/` flips readers
  *     to it; old versions are garbage, removed post-commit.
  * Readers resolve `max(_versions)` at plan time, so they see complete
  * versions only. The single-writer maintenance contract is ENFORCED by
  * lease markers under `_lease/` (round 11): [[compact]] takes the
  * exclusive `compact` marker and waits for in-flight fold markers to
  * drain; each fold holds a `fold-<token>` marker and backs off if a
  * compact acquired concurrently — so a fold can never land in a version
  * the compact is about to discard. Markers carry a TTL so a crashed
  * holder never wedges the index. Readers only need to stay clear of the
  * post-commit removal of the superseded version dir.
  */
object MinHashIndex extends org.apache.spark.internal.Logging {

  final case class StoredIndex(root: String)

  /** Thrown by test fault injectors to simulate a crash; production
    * callers never see it (the default injector is a no-op).
    */
  private[graft] type FaultInjector = String => Unit
  private[graft] val NoFaults: FaultInjector = _ => ()

  // ---------------------------------------------------------------------
  // signature pipeline (unchanged by the storage layout)
  // ---------------------------------------------------------------------

  /** Per-doc distinct word-3gram shingle sets — the canonical first pass
    * every MinHash/Jaccard operator shares (docs shorter than 3 tokens
    * have no shingles and drop out).
    */
  def shingleSets(doc: DataFrame): DataFrame =
    doc
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), TextOps.shingles(col("ws")).as("sh"))

  /** Shingle sets AND their 64-minhash signatures in one frame
    * (doc_id, sh, sig) — the fused form for callers that pin both (the
    * q_dedup_minhash / q_dedup_incremental hot paths). r20 measurement:
    * pinning `shingleSets` and then `signatures` eagerly runs TWO
    * sequential cache-fill jobs over the same rows; fusing them halves
    * the build-job count of the pair without recomputing anything (the
    * signature is derived in the same projection that caches the set).
    * Same expressions as [[signatures]], so the two forms cannot drift.
    */
  def setsWithSignatures(doc: DataFrame): DataFrame =
    shingleSets(doc).select(
      col("doc_id"),
      col("sh"),
      TextOps.minhashSignatureArray(TextOps.shingleHashes(col("sh"))).as("sig"))

  /** 64-minhash signatures from shingle sets: hash each shingle once, then
    * one native one-pass walk (functions.MinHashSignature) for all minima.
    */
  def signatures(sets: DataFrame): DataFrame =
    sets
      .select(col("doc_id"), graft.operators.TextOps.shingleHashes(col("sh")).as("hs"))
      .select(col("doc_id"), TextOps.minhashSignatureArray(col("hs")).as("sig"))

  /** (doc_id, band, digest) rows — 16 bands x 4 rows per signature. */
  def bandDigests(sigs: DataFrame): DataFrame =
    sigs
      .select(col("doc_id"), explode(TextOps.bandStructsFromSig(col("sig"))).as("bd"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.digest").as("digest"))

  /** One pass over `doc` -> a segment dir holding both `shingles/` and
    * `bands/`, shared by materialize and fold so the write paths can
    * never drift. The shingle sets are persisted so tokenization runs
    * once while feeding both writes.
    */
  private def writeSegment(doc: DataFrame, segDir: String): Unit = {
    val sets = shingleSets(doc).persist()
    try {
      sets.write.mode("overwrite").parquet(s"$segDir/shingles")
      bandDigests(signatures(sets)).write.mode("overwrite").parquet(s"$segDir/bands")
    } finally sets.unpersist(blocking = false)
  }

  // ---------------------------------------------------------------------
  // versioned storage
  // ---------------------------------------------------------------------

  private def fileSystem(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionsDir(root: String) = new Path(root, "_versions")
  private def foldedDir(root: String) = new Path(root, "_folded")
  private def versionDir(root: String, v: Int) = new Path(root, s"v$v")
  private def leaseDir(root: String) = new Path(root, "_lease")

  /** How long a crashed holder's lease survives before anyone may break
    * it. Production default is generous (a compact at 100 TB takes
    * minutes, not hours); tests shrink it to exercise expiry.
    */
  private[graft] val DefaultLeaseTtlMs: Long = 10 * 60 * 1000L

  // -------------------------------------------------------------------
  // maintenance leases — the ENFORCED single-writer contract (round 11;
  // previously a documented convention). compact holds the exclusive
  // `_lease/compact` marker; every fold holds a `_lease/fold-<token>`
  // marker for its duration. compact only proceeds once no fold markers
  // remain; a fold re-checks for the compact marker AFTER planting its
  // own, so every interleaving ends in "serialized" or "one side fails
  // cleanly", never a fold landing in a version the compact is about to
  // discard. Markers carry `expiry:owner`: a crashed holder's lease is
  // broken (deleted) by the next acquirer after the TTL, and RELEASE is
  // ownership-checked — an overrun holder whose lease was broken and
  // re-acquired must not delete the new holder's marker on its way out.
  //
  // KNOWN LIMITS (documented, not closed): leases are not renewed, so a
  // holder that outlives the TTL loses exclusivity — size leaseTtlMs
  // generously above the longest expected fold/compact; and the
  // expired-break (read -> delete -> create) is not atomic on
  // filesystems without compare-and-swap, so two breakers racing over
  // the SAME expired marker can, in a narrow window, both acquire. Both
  // limits require a crashed-or-overrun holder to bite; the normal path
  // is create-exclusive and safe.
  // -------------------------------------------------------------------

  // marker primitives live in MaintenanceLease since round 18 (one
  // implementation for the per-index leases here AND the catalog-sweep
  // lease); these thin aliases keep this file's call sites readable
  private def writeMarker(
      fs: FileSystem, p: Path, expiresAtMs: Long, owner: String): Boolean =
    MaintenanceLease.writeMarker(fs, p, expiresAtMs, owner)

  private def breakIfExpired(fs: FileSystem, p: Path): Unit =
    MaintenanceLease.breakIfExpired(fs, p)

  private def releaseIfOwner(fs: FileSystem, p: Path, owner: String): Unit =
    MaintenanceLease.releaseIfOwner(fs, p, owner)

  private def activeFoldMarkers(fs: FileSystem, root: String): Seq[Path] = {
    val dir = leaseDir(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath)
      .filter(_.getName.startsWith("fold-"))
      .filter { p => breakIfExpired(fs, p); fs.exists(p) }
  }

  private def committedVersions(fs: FileSystem, root: String): Seq[Int] = {
    val dir = versionsDir(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      // strict v\d+ match (same filter recover uses for version dirs): a
      // stray non-conforming file (editor temp "v1.swp", lost+found) must
      // not throw NumberFormatException and make the index unreadable
      .collect { case s if s.matches("v\\d+") => s.drop(1).toInt }
      .sorted
  }

  /** Highest committed version — what readers resolve at plan time. */
  def currentVersion(spark: SparkSession, index: StoredIndex): Int = {
    val versions = committedVersions(fileSystem(spark, index.root), index.root)
    require(versions.nonEmpty, s"MinHash index at ${index.root} has no " +
      "committed version (not materialized, or materialize crashed — rerun it)")
    versions.max
  }

  /** True when the index has a committed, present version. */
  def isReady(spark: SparkSession, root: String): Boolean = {
    val fs = fileSystem(spark, root)
    committedVersions(fs, root).maxOption
      .exists(v => fs.exists(versionDir(root, v)))
  }

  /** Segments in ONE version (base + one per fold since the last
    * compaction) — the compaction-pressure gauge an operator or the
    * serving layer's `store_describe` polls; metadata-only. Pass the
    * version you already resolved so gauge rows are never torn between
    * two head resolutions.
    */
  def segmentCount(
      spark: SparkSession, index: StoredIndex, version: Int): Int = {
    val fs = fileSystem(spark, index.root)
    segmentDirs(fs, index.root, version).length
  }

  /** [[segmentCount]] at the current version (one extra head listing). */
  def segmentCount(spark: SparkSession, index: StoredIndex): Int =
    segmentCount(spark, index, currentVersion(spark, index))

  /** Non-hidden segment dirs (base + committed batches) of a version —
    * tombstone lists (`del-`) are NOT segments, they subtract.
    */
  private def segmentDirs(fs: FileSystem, root: String, v: Int): Seq[Path] = {
    val vdir = versionDir(root, v)
    require(fs.exists(vdir), s"committed version dir missing: $vdir")
    val local = fs.listStatus(vdir).toSeq
      .filter(st => st.isDirectory &&
        !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("del-"))
      .map(_.getPath)
    (local ++ carriedPaths(fs, root, v)
      .filterNot(_.getName.startsWith("del-")))
      .sortBy(_.getName)
  }

  /** Committed tombstone dirs of a version (carried lists included). */
  private def tombstoneDirs(fs: FileSystem, root: String, v: Int): Seq[Path] = {
    val vdir = versionDir(root, v)
    require(fs.exists(vdir), s"committed version dir missing: $vdir")
    val local = fs.listStatus(vdir).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("del-"))
      .map(_.getPath)
    (local ++ carriedPaths(fs, root, v)
      .filter(_.getName.startsWith("del-")))
      .sortBy(_.getName)
  }

  // -------------------------------------------------------------------
  // carried segments (r19 incremental compaction)
  //
  // A PARTIAL compact must not copy the segments it does NOT merge — at
  // scale that copy IS the full-compact cost it exists to avoid. Instead
  // the new version's `_carried` side file lists, one absolute path per
  // line, the segment and tombstone dirs the version still reads from
  // OLDER version dirs (paths are pre-resolved when written, so the
  // chain never deepens: a twice-carried segment is referenced at its
  // one physical home). The version-marker create stays the ONE commit
  // point; superseded version dirs survive only as hosts for their
  // referenced children (cleanupSuperseded prunes everything else).
  // -------------------------------------------------------------------

  private def carriedFile(vdir: Path) = new Path(vdir, "_carried")

  private def carriedPaths(fs: FileSystem, root: String, v: Int): Seq[Path] = {
    val f = carriedFile(versionDir(root, v))
    if (!fs.exists(f)) Nil
    else {
      val in = fs.open(f)
      val raw = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      raw.split("\n").map(_.trim).filter(_.nonEmpty).map(new Path(_)).toSeq
    }
  }

  private def writeCarried(fs: FileSystem, vdir: Path, paths: Seq[Path]): Unit = {
    fs.mkdirs(vdir)
    val out = fs.create(carriedFile(vdir), true)
    try out.write(paths.map(_.toString).mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Carry-aware cleanup of superseded versions: drop their markers,
    * delete unreferenced version dirs wholesale, and inside dirs that
    * still HOST a current-version carried child, delete only the
    * unreferenced children (merged-away segments, absorbed tombstone
    * lists, stale garbage from crashed cleanups). Idempotent; shared by
    * both compact flavors' post-commit cleanup and crash recovery.
    */
  private def cleanupSuperseded(fs: FileSystem, root: String): Unit = {
    val versions = committedVersions(fs, root)
    val current = versions.max
    val refHosts: Map[String, Set[String]] =
      carriedPaths(fs, root, current)
        .groupBy(_.getParent.getName)
        .map { case (host, ps) => host -> ps.map(_.getName).toSet }
    versions.filter(_ != current).foreach { v =>
      fs.delete(new Path(versionsDir(root), s"v$v"), false): Unit
    }
    fs.listStatus(new Path(root)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+"))
      .filter(_.getPath.getName.drop(1).toInt != current)
      .foreach { st =>
        refHosts.get(st.getPath.getName) match {
          case None => fs.delete(st.getPath, true): Unit
          case Some(keep) =>
            fs.listStatus(st.getPath).toSeq
              .filterNot(c => keep.contains(c.getPath.getName))
              .foreach(c => fs.delete(c.getPath, true))
        }
      }
  }

  /** Live tombstone-list count — the second compaction-pressure term next
    * to [[segmentCount]]: each live list is one extra anti-join input on
    * every read until a compact folds the dead rows away.
    */
  def tombstoneCount(
      spark: SparkSession, index: StoredIndex, version: Int): Int = {
    val fs = fileSystem(spark, index.root)
    tombstoneDirs(fs, index.root, version).length
  }

  /** [[tombstoneCount]] at the current version. */
  def tombstoneCount(spark: SparkSession, index: StoredIndex): Int =
    tombstoneCount(spark, index, currentVersion(spark, index))

  /** The union of the live tombstone lists as one `(doc_id)` frame
    * REGARDLESS of scope, or None when nothing is tombstoned — the
    * coarse view the pressure gauge and tests consume (liveness itself
    * is segment-scoped; see [[liveSide]]), mirroring
    * [[IvfStore.deadIds]].
    */
  def deadIds(spark: SparkSession, index: StoredIndex): Option[DataFrame] = {
    val fs = fileSystem(spark, index.root)
    val dirs = tombstoneDirs(fs, index.root, currentVersion(spark, index))
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.map(_.toString): _*)
      .select(col("doc_id")).distinct())
  }

  /** The segment names a tombstone list covers: its `_scope` side file
    * (one name per line, written inside the atomic publish), or None =
    * covers everything (legacy lists without the file, and — loudly —
    * lists whose file exists but cannot be read). The degrade direction
    * is deliberate: global coverage can only HIDE a later re-fold of a
    * deleted id from candidate generation (a dedup recall loss on that
    * id), never resurrect a deleted doc or fabricate a false pair.
    */
  private def tombstoneScope(fs: FileSystem, delDir: Path): Option[Set[String]] = {
    val f = new Path(delDir, "_scope")
    if (!fs.exists(f)) None
    else {
      try {
        val in = fs.open(f)
        val raw = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        Some(raw.split("\n").map(_.trim).filter(_.nonEmpty).toSet)
      } catch {
        case scala.util.control.NonFatal(e) =>
          logWarning(
            s"MinHashIndex: tombstone scope file $f is unreadable " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage}); degrading " +
              "the list to GLOBAL coverage — deletes stay enforced, but a " +
              "re-fold of a deleted doc_id will be hidden from candidate " +
              "generation until the next compact rewrites the lists")
          None
      }
    }
  }

  /** The LIVE rows of one side at version `v`: segments grouped by the
    * set of tombstone lists covering them (typically two groups — the
    * pre-delete segments under their lists, the post-delete folds under
    * none), each group anti-joined against only ITS covering lists. The
    * dead lists are churn-scale by contract, so every anti-join
    * broadcasts; a deleted doc emits no bands and no shingles from the
    * commit on (the dedup-index correctness contract), while a LATER
    * re-fold of the same id — landing in an uncovered segment — stays
    * visible. Shared by the reads and [[compact]]'s physical drop so the
    * liveness algebra cannot drift between them.
    */
  private def liveSide(
      spark: SparkSession,
      fs: FileSystem,
      root: String,
      v: Int,
      side: String): DataFrame =
    liveOf(spark, segmentDirs(fs, root, v),
      tombstoneDirs(fs, root, v).map(d => d -> tombstoneScope(fs, d)), side)

  /** [[liveSide]] restricted to an explicit segment subset — the shared
    * algebra [[compactStep]] reuses to materialize ONLY the segments it
    * merges.
    */
  private def liveOf(
      spark: SparkSession,
      segs: Seq[Path],
      dels: Seq[(Path, Option[Set[String]])],
      side: String): DataFrame = {
    if (dels.isEmpty)
      return spark.read.parquet(segs.map(p => s"$p/$side"): _*)
    val covering: Map[Path, Seq[Path]] = segs.map { s =>
      s -> dels.collect {
        case (d, scope) if scope.forall(_.contains(s.getName)) => d
      }
    }.toMap
    segs.groupBy(s => covering(s).map(_.getName))
      .map { case (_, members) =>
        val rows = spark.read.parquet(members.map(p => s"$p/$side"): _*)
        val lists = covering(members.head)
        if (lists.isEmpty) rows
        else rows.join(
          broadcast(spark.read.parquet(lists.map(_.toString): _*)
            .select(col("doc_id")).distinct()),
          Seq("doc_id"), "left_anti")
      }
      .reduce(_.unionByName(_))
  }

  private def readSide(spark: SparkSession, index: StoredIndex, side: String): DataFrame = {
    val fs = fileSystem(spark, index.root)
    val v = currentVersion(spark, index)
    liveSide(spark, fs, index.root, v, side)
  }

  def bands(spark: SparkSession, index: StoredIndex): DataFrame =
    readSide(spark, index, "bands")

  def shingles(spark: SparkSession, index: StoredIndex): DataFrame =
    readSide(spark, index, "shingles")

  /** One corpus pass -> committed v1. A re-materialize resets the root
    * completely (stale versions, fold markers, temps): markers describe
    * rows the rebuild is about to destroy, and a survivor would make a
    * later foldOnce silently skip a batch the new index never saw. The
    * commit point is the v1 marker create — a crash anywhere earlier
    * leaves an index [[isReady]] reports not-ready, never a partial one.
    */
  def materialize(doc: DataFrame, root: String): StoredIndex = {
    val spark = doc.sparkSession
    val fs = fileSystem(spark, root)
    // the wipe-and-rebuild runs UNDER the maintenance lease, inside the
    // same single-writer contract as compact: without it a concurrent
    // fold could publish into a dir mid-deletion (or into the fresh v1 a
    // batch the reset was supposed to forget), and a concurrent compact
    // could commit a version built from pre-wipe segments
    fs.mkdirs(leaseDir(root))
    val compactMarker = new Path(leaseDir(root), "compact")
    breakIfExpired(fs, compactMarker)
    val owner = java.util.UUID.randomUUID().toString
    if (!writeMarker(fs, compactMarker,
        System.currentTimeMillis() + DefaultLeaseTtlMs, owner))
      throw new IllegalStateException(
        s"maintenance lease held on $root; cannot re-materialize under a " +
          "running compact")
    try {
      val deadline = System.currentTimeMillis() + 30_000L
      while (activeFoldMarkers(fs, root).nonEmpty &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val inFlight = activeFoldMarkers(fs, root)
      if (inFlight.nonEmpty)
        throw new IllegalStateException(
          s"folds still in flight: ${inFlight.map(_.getName).mkString(", ")}" +
            " — materialize backed off")
      // wipe everything EXCEPT the lease dir (it holds OUR exclusivity);
      // stale fold leases inside it are already proven drained/expired
      fs.listStatus(new Path(root)).toSeq
        .filterNot(_.getPath.getName == "_lease")
        .foreach(st => fs.delete(st.getPath, true))
      fs.listStatus(leaseDir(root)).toSeq
        .filterNot(_.getPath.getName == "compact")
        .foreach(st => fs.delete(st.getPath, false))
      writeSegment(doc, versionDir(root, 1).suffix("/base").toString)
      fs.mkdirs(foldedDir(root))
      commitMarker(fs, new Path(versionsDir(root), "v1"))
      StoredIndex(root)
    } finally releaseIfOwner(fs, compactMarker, owner)
  }

  /** Fold a new (accepted) batch into the stored index — the cross-batch
    * half of the ingest contract: after a batch is deduped and admitted,
    * appending its shingle sets + band digests makes every LATER batch
    * dedupe against it too.
    *
    * EXACTLY-ONCE under replay: the batch's segment is fully written to a
    * hidden temp dir, then one atomic rename publishes it; the `_folded/`
    * token marker is recorded after. A replay after ANY crash point
    * either re-folds from scratch (temp never published — no partial
    * rows were visible) or finds the published segment / its marker and
    * skips. No crash point loses or duplicates rows.
    * Returns true when the batch was folded, false when skipped.
    */
  def foldOnce(doc: DataFrame, index: StoredIndex, token: String): Boolean =
    foldOnceWithFaults(doc, index, token, NoFaults)

  private[graft] def foldOnceWithFaults(
      doc: DataFrame,
      index: StoredIndex,
      token: String,
      fault: FaultInjector,
      leaseTtlMs: Long = DefaultLeaseTtlMs): Boolean = {
    require(token.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"fold token must be a safe dir-name fragment, got '$token'")
    val spark = doc.sparkSession
    val fs = fileSystem(spark, index.root)
    val marker = new Path(foldedDir(index.root), token)
    if (fs.exists(marker)) return false

    // ---- lease: no fold may land while a compact holds the root -------
    val compactMarker = new Path(leaseDir(index.root), "compact")
    breakIfExpired(fs, compactMarker)
    if (fs.exists(compactMarker))
      throw new IllegalStateException(
        s"maintenance lease held (compact in progress) on ${index.root}; " +
          "retry after it completes")
    fs.mkdirs(leaseDir(index.root))
    val myLease = new Path(leaseDir(index.root), s"fold-$token")
    // a same-token lease is reclaimed ONLY once expired: an orchestrator
    // re-launching a batch whose first attempt is a live zombie (hung,
    // not crashed) must not run two attempts into the same temp dir —
    // the live holder keeps the lease and the retry fails loudly
    breakIfExpired(fs, myLease)
    val attemptOwner = java.util.UUID.randomUUID().toString
    if (!writeMarker(fs, myLease, System.currentTimeMillis() + leaseTtlMs,
        attemptOwner))
      throw new IllegalStateException(
        s"another attempt of batch '$token' holds its fold lease on " +
          s"${index.root} (still running, not expired) — retry later")
    try {
      // re-check AFTER planting: a compact that acquired in between is
      // now waiting for fold markers to drain — back off so it proceeds
      if (fs.exists(compactMarker))
        throw new IllegalStateException(
          s"maintenance lease acquired concurrently (compact) on " +
            s"${index.root}; fold backed off cleanly — retry after it")

      // version resolution happens UNDER the lease: resolving before it
      // could publish this batch into a version a concurrent compact is
      // about to discard — the exact interleave the lease removes
      val v = currentVersion(spark, index)
      val batchDir = new Path(versionDir(index.root, v), s"batch-$token")
      if (fs.exists(batchDir)) {
        // published but crashed before the marker: heal the marker, skip
        commitMarker(fs, marker)
        return false
      }
      val tmp = new Path(versionDir(index.root, v), s".tmp-$token")
      fs.delete(tmp, true) // stale pre-publish attempt: invisible, discard
      writeSegment(doc, tmp.toString)
      fault("segment-written")
      require(fs.rename(tmp, batchDir), s"could not publish $batchDir")
      fault("published")
      commitMarker(fs, marker)
      true
    } finally releaseIfOwner(fs, myLease, attemptOwner)
  }

  /** Whether `token`'s fold has committed — [[foldOnce]]'s exactly-once
    * memory, exposed so a maintainer with a STALE cursor (a catalog
    * reload from an old snapshot) can recognize an already-applied
    * window prefix instead of re-folding it
    * ([[graft.operators.StoreCatalog.refreshStep]]'s prefix-skip).
    */
  def foldTokenExists(
      spark: SparkSession, index: StoredIndex, token: String): Boolean =
    fileSystem(spark, index.root)
      .exists(new Path(foldedDir(index.root), token))

  /** Record `token` as applied WITHOUT folding rows — the REBUILD
    * path's cursor: a re-materialize pinned at snapshot S is, by
    * construction, every window through S applied, and recording S's
    * token lets the prefix-skip treat it that way (materialize wipes
    * `_folded/`, so without this a rebuild would erase the replay
    * memory a stale-cursor maintainer later needs).
    */
  def recordFoldToken(
      spark: SparkSession, index: StoredIndex, token: String): Unit = {
    val fs = fileSystem(spark, index.root)
    fs.mkdirs(foldedDir(index.root))
    commitMarker(fs, new Path(foldedDir(index.root), token))
  }

  /** Tombstone `ids` (a `doc_id` frame) out of the index — O(|ids|)
    * metadata-scale, never a corpus rewrite: the distinct ids are
    * committed as a `del-<token>` list the read paths anti-join (see the
    * object doc) and [[compact]] physically folds away. EXACTLY-ONCE
    * under replay with the same discipline as [[foldOnce]]: hidden temp →
    * atomic rename → `_folded/del-<token>` marker; any crash point
    * replays to a skip or a clean redo. Runs under a fold-class lease so
    * a concurrent compact drains it (a list landing in a version the
    * compact is about to discard would silently resurrect its docs).
    * Returns true when the tombstone committed, false when skipped.
    *
    * The list is SEGMENT-SCOPED to the segments present at commit time:
    * a later [[foldOnce]] re-inserting a deleted id lands in an
    * uncovered segment and is visible immediately, no compact needed —
    * see the object doc.
    */
  def deleteOnce(ids: DataFrame, index: StoredIndex, token: String): Boolean =
    deleteOnceWithFaults(ids, index, token, NoFaults)

  private[graft] def deleteOnceWithFaults(
      ids: DataFrame,
      index: StoredIndex,
      token: String,
      fault: FaultInjector,
      leaseTtlMs: Long = DefaultLeaseTtlMs): Boolean = {
    require(token.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"delete token must be a safe dir-name fragment, got '$token'")
    val spark = ids.sparkSession
    val fs = fileSystem(spark, index.root)
    val marker = new Path(foldedDir(index.root), s"del-$token")
    if (fs.exists(marker)) return false

    val compactMarker = new Path(leaseDir(index.root), "compact")
    breakIfExpired(fs, compactMarker)
    if (fs.exists(compactMarker))
      throw new IllegalStateException(
        s"maintenance lease held (compact in progress) on ${index.root}; " +
          "retry after it completes")
    fs.mkdirs(leaseDir(index.root))
    // the "fold-" prefix is deliberate: compact/materialize drain ALL
    // fold-class leases before touching segments, and a tombstone commit
    // is exactly such a mutation
    val myLease = new Path(leaseDir(index.root), s"fold-del-$token")
    breakIfExpired(fs, myLease)
    val attemptOwner = java.util.UUID.randomUUID().toString
    if (!writeMarker(fs, myLease, System.currentTimeMillis() + leaseTtlMs,
        attemptOwner))
      throw new IllegalStateException(
        s"another attempt of delete '$token' holds its lease on " +
          s"${index.root} (still running, not expired) — retry later")
    try {
      if (fs.exists(compactMarker))
        throw new IllegalStateException(
          s"maintenance lease acquired concurrently (compact) on " +
            s"${index.root}; delete backed off cleanly — retry after it")
      val v = currentVersion(spark, index)
      val delDir = new Path(versionDir(index.root, v), s"del-$token")
      if (fs.exists(delDir)) {
        commitMarker(fs, marker) // published, marker write crashed: heal
        return false
      }
      val tmp = new Path(versionDir(index.root, v), s".tmp-del-$token")
      fs.delete(tmp, true)
      // one small file: tombstone lists are churn-scale by contract
      ids.select(col("doc_id")).distinct().coalesce(1)
        .write.parquet(tmp.toString)
      // the SCOPE rides inside the atomic publish: this list covers
      // exactly the segments that exist now — a later fold's segment is
      // uncovered, so re-inserting a deleted id needs no compact (the
      // update-window economics; see the object doc). Resolved under
      // the same lease-guarded version as the publish target.
      val scope = segmentDirs(fs, index.root, v).map(_.getName)
      val sOut = fs.create(new Path(tmp, "_scope"), true)
      try sOut.write(scope.mkString("\n").getBytes("UTF-8"))
      finally sOut.close()
      fault("tombstone-written")
      require(fs.rename(tmp, delDir), s"could not publish $delDir")
      fault("published")
      commitMarker(fs, marker)
      true
    } finally releaseIfOwner(fs, myLease, attemptOwner)
  }

  /** At-least-once append for callers WITHOUT a replay token (no
    * replayable source, no batch identity): publishes a uniquely-named
    * segment. A caller that retries after a crash can duplicate rows —
    * duplicates are information-free set members here and
    * `compact(dedupe = true)` drops them; callers with batch identity
    * should use [[foldOnce]], which is exactly-once.
    */
  def append(doc: DataFrame, index: StoredIndex): Unit = {
    val token = "anon-" + java.util.UUID.randomUUID().toString
    foldOnceWithFaults(doc, index, token, NoFaults): Unit
  }

  /** OFFLINE maintenance pass: rewrite the current version's segments
    * into a single `base/` of `nFiles` coalesced files, committed as the
    * next version. `dedupe = true` also drops exact-duplicate rows (only
    * [[append]] misuse or re-folding the same doc under two tokens can
    * create them; [[foldOnce]] cannot).
    *
    * Crash safety: the new version is built under its own uncommitted
    * dir; the marker create is the single commit point. Recovery on every
    * call first heals fold markers from published batch dirs (so a
    * compact right after a fold's crashed marker write can't orphan the
    * token), then drops uncommitted version dirs, stale temps, and
    * superseded versions. Quiesce writers for the duration (folds into
    * the old version after its segments are read would be lost from the
    * new one) — enforced by the maintenance lease, not convention;
    * readers only need to stay clear of the post-commit old-version
    * removal.
    */
  def compact(
      spark: SparkSession,
      index: StoredIndex,
      nFiles: Int = 8,
      dedupe: Boolean = false
  ): Unit = compactWithFaults(spark, index, nFiles, dedupe, NoFaults)

  private[graft] def compactWithFaults(
      spark: SparkSession,
      index: StoredIndex,
      nFiles: Int,
      dedupe: Boolean,
      fault: FaultInjector,
      leaseTtlMs: Long = DefaultLeaseTtlMs,
      foldDrainWaitMs: Long = 30_000L
  ): Unit = {
    require(nFiles > 0)
    val fs = fileSystem(spark, index.root)
    withCompactLease(fs, index.root, leaseTtlMs, foldDrainWaitMs) {
      compactLeased(spark, fs, index, nFiles, dedupe, fault)
    }
  }

  /** LSM-style INCREMENTAL compaction (r19): merge only the `mergeCount`
    * SMALLEST segments into one new segment, leaving every other segment
    * physically in place — the cost is proportional to the bytes MERGED,
    * never the store size (the full [[compact]] stays the offline face
    * that also clears global tombstone lists). Kept segments ride into
    * the new version through its `_carried` side file (see the carried-
    * segments section); tombstone lists whose scope is fully inside the
    * merged set are absorbed (their dead rows are physically dropped by
    * the merge), scoped survivors carry over and keep covering exactly
    * the segments they always did — the merged segment has a FRESH name
    * no existing scope contains, so a carried list can never hide its
    * live rows. SCOPE-LESS survivors (pre-r18 legacy lists, whose
    * global coverage would otherwise hide re-folds forever) are
    * RETIRED incrementally (r20): rewritten into the new version scoped
    * to exactly the surviving segments, so each step narrows them and a
    * step that merges everything they cover absorbs them — no FULL
    * compact required anymore. Same lease, drain, atomic
    * version-marker commit and crash
    * matrix as the full compact. Returns false when there is nothing to
    * merge (fewer than two segments).
    */
  def compactStep(
      spark: SparkSession,
      index: StoredIndex,
      mergeCount: Int = 4
  ): Boolean = compactStepWithFaults(spark, index, mergeCount, NoFaults)

  private[graft] def compactStepWithFaults(
      spark: SparkSession,
      index: StoredIndex,
      mergeCount: Int,
      fault: FaultInjector,
      leaseTtlMs: Long = DefaultLeaseTtlMs,
      foldDrainWaitMs: Long = 30_000L
  ): Boolean = {
    require(mergeCount >= 2, "a merge needs at least two segments")
    val fs = fileSystem(spark, index.root)
    withCompactLease(fs, index.root, leaseTtlMs, foldDrainWaitMs) {
      compactStepLeased(spark, fs, index, mergeCount, fault)
    }
  }

  private def withCompactLease[T](
      fs: FileSystem, root: String,
      leaseTtlMs: Long, foldDrainWaitMs: Long)(body: => T): T = {
    // ---- exclusive maintenance lease ---------------------------------
    fs.mkdirs(leaseDir(root))
    val compactMarker = new Path(leaseDir(root), "compact")
    breakIfExpired(fs, compactMarker)
    val owner = java.util.UUID.randomUUID().toString
    if (!writeMarker(fs, compactMarker,
        System.currentTimeMillis() + leaseTtlMs, owner))
      throw new IllegalStateException(
        s"another compact holds the maintenance lease on $root")
    try {
      // in-flight folds drain quickly (they're per-batch); crashed ones
      // expire via TTL and are broken by activeFoldMarkers itself
      val deadline = System.currentTimeMillis() + foldDrainWaitMs
      while (activeFoldMarkers(fs, root).nonEmpty &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val inFlight = activeFoldMarkers(fs, root)
      if (inFlight.nonEmpty)
        throw new IllegalStateException(
          s"folds still in flight after ${foldDrainWaitMs}ms: " +
            s"${inFlight.map(_.getName).mkString(", ")} — compact backed off")
      body
    } finally releaseIfOwner(fs, compactMarker, owner)
  }

  private def compactStepLeased(
      spark: SparkSession,
      fs: FileSystem,
      index: StoredIndex,
      mergeCount: Int,
      fault: FaultInjector
  ): Boolean = {
    recover(spark, fs, index)
    fault("recovered")
    val root = index.root
    val v = currentVersion(spark, index)
    val segs = segmentDirs(fs, root, v)
    if (segs.size < 2) return false
    // smallest-K policy (LSM tiering): merging the small tail buys the
    // same read-side fan-in reduction for the fewest bytes rewritten
    val picked = segs
      .map(p => p -> fs.getContentSummary(p).getLength)
      .sortBy { case (p, sz) => (sz, p.getName) }
      .take(math.min(mergeCount, segs.size))
      .map(_._1)
    val pickedNames = picked.map(_.getName).toSet
    val dels = tombstoneDirs(fs, root, v).map(d => d -> tombstoneScope(fs, d))
    val keptSegs = segs.filterNot(p => pickedNames(p.getName))
    // a list is absorbed when every segment it STILL covers is in the
    // merge set (its dead rows are physically dropped by the merge);
    // scope entries naming segments an earlier step already merged away
    // are vacuous — only live names count. A SCOPE-LESS list (pre-r18
    // legacy, or a degraded unreadable `_scope`) covers every live
    // segment, so it absorbs exactly when the step merges them all
    val allNames = segs.map(_.getName).toSet
    val absorbed = dels.collect {
      case (d, scope)
          if scope.getOrElse(allNames).intersect(allNames)
            .subsetOf(pickedNames) => d
    }.toSet
    // retire surviving scope-less lists incrementally (r20): carried as
    // is, a global list can only die at a FULL compact — a leveled step
    // carries it forever, and its every-segment coverage HIDES re-folds
    // landing in future segments. Rewrite it instead, scoped to exactly
    // the segments that survive this step: its dead rows inside the
    // merged set were physically dropped by the merge just performed,
    // rows in kept segments stay covered verbatim, and re-inserted ids
    // in any LATER segment become visible again — the segment-scoped
    // contract every post-r18 list already obeys. (absorption above
    // already handled the keptSegs-empty case, so the narrowed scope is
    // never empty.)
    val (legacyKept, scopedKept) =
      dels.filterNot { case (d, _) => absorbed(d) }
        .partition(_._2.isEmpty)

    val next = versionDir(root, v + 1)
    val mergedName = s"merged-${java.util.UUID.randomUUID().toString.take(12)}"
    Seq("bands", "shingles").foreach { side =>
      liveOf(spark, picked, dels, side)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(new Path(next, s"$mergedName/$side").toString)
    }
    fault("next-version-written")
    // legacy lists materialize NARROWED into the next version (same dir
    // name, so the folded-marker replay guard keeps recognizing the
    // delete token; the old physical dir dies with the superseded
    // version). Lists are churn-scale single files by contract — the
    // copy is O(list), never O(store).
    legacyKept.foreach { case (d, _) =>
      val dest = new Path(next, d.getName)
      org.apache.hadoop.fs.FileUtil.copy(fs, d, fs, dest, false, fs.getConf)
      val sOut = fs.create(new Path(dest, "_scope"), true)
      try sOut.write(
        keptSegs.map(_.getName).mkString("\n").getBytes("UTF-8"))
      finally sOut.close()
    }
    fault("legacy-narrowed")
    // kept segments/lists ride by REFERENCE (pre-resolved paths, so a
    // twice-carried segment is referenced at its one physical home)
    writeCarried(fs, next, keptSegs ++ scopedKept.map(_._1))
    fault("carried-written")
    commitMarker(fs, new Path(versionsDir(root), s"v${v + 1}"))
    fault("committed")
    cleanupSuperseded(fs, root)
    fault("old-cleaned")
    true
  }

  private def compactLeased(
      spark: SparkSession,
      fs: FileSystem,
      index: StoredIndex,
      nFiles: Int,
      dedupe: Boolean,
      fault: FaultInjector
  ): Unit = {
    recover(spark, fs, index)
    fault("recovered")
    val v = currentVersion(spark, index)
    val next = versionDir(index.root, v + 1)
    // tombstoned rows are PHYSICALLY dropped here — the next version's
    // base carries the LIVE rows only (the same segment-scoped liveness
    // the reads serve, so compact can never change query results), and
    // the del- lists die with the old version dir (cleared the same way
    // IvfStore.compact clears its tombstone field)
    Seq("bands", "shingles").foreach { side =>
      val rows = liveSide(spark, fs, index.root, v, side)
      (if (dedupe) rows.distinct() else rows)
        .coalesce(nFiles)
        .write.mode("overwrite").parquet(new Path(next, s"base/$side").toString)
    }
    fault("next-version-written")
    commitMarker(fs, new Path(versionsDir(index.root), s"v${v + 1}"))
    fault("committed")
    // post-commit cleanup, carry-aware: the full rewrite references
    // nothing older, so every superseded version dir (including hosts a
    // partial compact left behind) dies wholesale
    cleanupSuperseded(fs, index.root)
    fault("old-dir-removed")
  }

  /** Put the root back into a clean state after any crash (see
    * [[compact]]). Heals fold markers, then removes everything not
    * reachable from the highest committed version. Re-entrant.
    */
  private def recover(spark: SparkSession, fs: FileSystem, index: StoredIndex): Unit = {
    val root = index.root
    val versions = committedVersions(fs, root)
    require(versions.nonEmpty, s"MinHash index at $root has no committed version")
    val current = versions.max
    // 1. fold/delete crash window: published batch and del- dirs whose
    //    marker write never ran — record them now so a replay (even after
    //    this compact folds their rows into base) skips instead of
    //    re-applying (the del- marker name IS the dir name)
    fs.listStatus(versionDir(root, current)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName).foreach { name =>
        if (name.startsWith("batch-"))
          commitMarker(fs,
            new Path(foldedDir(root), name.stripPrefix("batch-")))
        else if (name.startsWith("del-"))
          commitMarker(fs, new Path(foldedDir(root), name))
      }
    // 2+3. superseded/uncommitted version dirs, carry-aware: committed
    //      older versions and crashed-compact leftovers both resolve
    //      through cleanupSuperseded — a dir hosting a carried child of
    //      the CURRENT version survives pruned to exactly those
    //      children, everything else (uncommitted v-dirs included: a
    //      committed version's references only point backward, so an
    //      uncommitted dir is never referenced) is deleted. In-flight
    //      fold temps die with the current dir sweep.
    cleanupSuperseded(fs, root)
    fs.listStatus(versionDir(root, current)).toSeq
      .filter(_.getPath.getName.startsWith(".tmp-"))
      .foreach(st => fs.delete(st.getPath, true))
  }

  /** Atomic empty-file create — the commit primitive for markers. */
  private def commitMarker(fs: FileSystem, marker: Path): Unit = {
    fs.mkdirs(marker.getParent)
    if (!fs.exists(marker)) fs.create(marker, false).close()
  }
}
