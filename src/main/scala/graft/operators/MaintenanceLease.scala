package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The filesystem lease primitive behind every single-maintainer
  * contract in the engine, generalized (round 18) from the marker
  * machinery [[MinHashIndex]] has enforced per-index since round 11 —
  * one implementation of "atomic create-exclusive marker with
  * `expiry:owner` content, TTL break, ownership-checked release" instead
  * of one per store kind.
  *
  * Two layers:
  *
  *  - the MARKER primitives ([[writeMarker]]/[[readMarker]]/
  *    [[breakIfExpired]]/[[releaseIfOwner]]) — shared by
  *    [[MinHashIndex]]'s per-index fold/compact leases and the
  *    catalog-level lease below; semantics from the round-11 originals
  *    plus renewal and fencing (round 19): [[fence]] renews the lease
  *    before each commit and refuses with [[LostException]] once it is
  *    lost, so an overrun holder can no longer race the maintainer that
  *    re-acquired. The expired-break itself is still not atomic without
  *    filesystem CAS — it needs a crashed holder to bite, and the fence
  *    bounds the damage of the overrun case to zero commits.
  *  - the CATALOG-SWEEP lease ([[withConfigured]]): the catalog walkers
  *    ([[graft.plans.MvAdvisor.maintainAll]]/`maintainBase`, the
  *    compaction autopilot, `catalog_save` over the wire) document a
  *    single-maintainer contract — two concurrent sweeps on one shared
  *    filesystem could interleave store refreshes between each store's
  *    own commit points. Set `spark.graft.maintenance.lease` to a
  *    shared-filesystem DIRECTORY and every such walker serializes on
  *    one `maintainer` marker there: the second concurrent sweep fails
  *    fast with a clear back-off message instead of interleaving.
  *    Unset (the default), behavior is unchanged — the contract stays
  *    convention for single-process deployments that don't need the
  *    marker round-trips.
  *
  * The reference leaves maintenance orchestration entirely to the
  * caller (its CDC/compaction layers are stubs — `crates/cdc/src/
  * lib.rs:9`); this is the coordination story a multi-maintainer
  * deployment actually needs.
  */
object MaintenanceLease {

  /** Session conf: directory holding the catalog-sweep lease marker.
    * Empty/unset = leaseless (single-process convention).
    */
  val ConfKey = "spark.graft.maintenance.lease"

  /** Session conf: lease TTL override in ms ([[DefaultTtlMs]] unset). */
  val TtlConfKey = "spark.graft.maintenance.lease.ttlMs"

  /** How long a crashed holder's lease survives before anyone may break
    * it. A LIVE sweep renews on every [[fence]] (so the TTL only needs
    * to outlast the longest single step, not the whole sweep); a crashed
    * holder stops renewing and expires one TTL after its last commit.
    */
  val DefaultTtlMs: Long = 10 * 60 * 1000L

  // -------------------------------------------------------------------
  // marker primitives (moved verbatim from MinHashIndex round 11)
  // -------------------------------------------------------------------

  private[operators] def writeMarker(
      fs: FileSystem, p: Path, expiresAtMs: Long, owner: String): Boolean = {
    val content = s"$expiresAtMs:$owner".getBytes("UTF-8")
    val scheme = Option(fs.getUri).map(_.getScheme).getOrElse("")
    if (scheme == "file" || scheme.isEmpty) {
      // Hadoop's LocalFileSystem `create(p, overwrite = false)` is
      // CHECK-THEN-ACT (exists() then create), not atomic — a race found
      // by MaintenanceLeaseSpec let 5 of 8 barrier-released acquirers
      // "win" the same lease. On local filesystems go through NIO's
      // O_EXCL createFile, which IS atomic; the marker content lands
      // right after (a torn write reads as stale garbage, already
      // tolerated by readMarker)
      try {
        val local = java.nio.file.Paths.get(p.toUri.getPath)
        java.nio.file.Files.createFile(local)
        java.nio.file.Files.write(local, content)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else
      try {
        val out = fs.create(p, false) // atomic create-exclusive on HDFS
        try out.write(content) finally out.close()
        true
      } catch {
        // ONLY "already exists" means held-by-another; a permission or
        // quota failure misdiagnosed as a phantom lease would send the
        // operator hunting for a concurrent maintainer that doesn't exist
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException
            if e.getMessage != null && e.getMessage.contains("exists") =>
          false
      }
  }

  /** Marker content as (expiry, owner); None when vanished or torn. */
  private[operators] def readMarker(
      fs: FileSystem, p: Path): Option[(Long, String)] =
    try {
      val in = fs.open(p)
      val raw = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
      val cut = raw.indexOf(':')
      val (e, o) = if (cut < 0) (raw, "") else (raw.take(cut), raw.drop(cut + 1))
      Some((e.toLong, o))
    } catch {
      // vanished between list and open = not held; torn write = stale
      // garbage. Any OTHER IO failure propagates: treating a transient
      // read error on a LIVE lease as "expired" would delete it.
      case _: java.io.FileNotFoundException => None
      case _: NumberFormatException         => None
    }

  private[operators] def markerExpired(fs: FileSystem, p: Path): Boolean =
    readMarker(fs, p) match {
      case Some((expiry, _)) => System.currentTimeMillis() > expiry
      case None              => true // vanished/torn: not meaningfully held
    }

  /** Delete `p` if it exists and has expired. */
  private[operators] def breakIfExpired(fs: FileSystem, p: Path): Unit =
    if (fs.exists(p) && markerExpired(fs, p)) fs.delete(p, false): Unit

  /** Release `p` ONLY if this caller still owns it — an overrun holder
    * whose lease was TTL-broken and re-acquired by someone else must
    * leave the new holder's marker alone (legacy owner-less markers
    * release unconditionally).
    */
  private[operators] def releaseIfOwner(
      fs: FileSystem, p: Path, owner: String): Unit =
    readMarker(fs, p) match {
      case Some((_, o)) if o == owner || o.isEmpty => fs.delete(p, false): Unit
      case Some(_) => () // someone else's live lease: hands off
      case None    => ()
    }

  // -------------------------------------------------------------------
  // catalog-sweep lease
  // -------------------------------------------------------------------

  /** Thrown by [[fence]] when the holder's lease has been lost (expired
    * past its TTL — and possibly broken and re-acquired). Deliberately
    * NOT caught by the per-store/per-view error isolation in the sweep
    * walkers: a lost lease must abort the WHOLE sweep before its next
    * commit, not degrade to an error row.
    */
  final class LostException(msg: String) extends IllegalStateException(msg)

  final case class Held private[MaintenanceLease] (
      fs: FileSystem, marker: Path, owner: String, ttlMs: Long)

  /** Take the sweep lease under `dir`, or throw [[IllegalStateException]]
    * when another maintainer holds a live one — the caller backs off;
    * it must NOT retry-spin against a live holder (the holder's sweep is
    * doing the same work).
    */
  def acquire(
      spark: SparkSession, dir: String,
      ttlMs: Long = DefaultTtlMs): Held = {
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(d)
    val marker = new Path(d, "maintainer")
    breakIfExpired(fs, marker)
    val owner = java.util.UUID.randomUUID().toString
    if (!writeMarker(fs, marker, System.currentTimeMillis() + ttlMs, owner))
      throw new IllegalStateException(
        s"maintenance lease at $dir held by another maintainer — this " +
          "sweep backed off cleanly; retry after it completes (a crashed " +
          s"holder's lease expires after ${ttlMs}ms)")
    Held(fs, marker, owner, ttlMs)
  }

  def release(h: Held): Unit = releaseIfOwner(h.fs, h.marker, h.owner)

  /** Heartbeat: push the holder's expiry another TTL out, but ONLY while
    * the marker is still this holder's AND still live. The liveness
    * condition makes the replace safe: breakers may only delete
    * EXPIRED markers, so no new holder can exist while ours is live —
    * the rewrite can't clobber anyone (modulo clock skew, the same
    * assumption the TTL break itself already makes). Once expired, the
    * lease is treated as LOST even if the marker still sits on disk —
    * a new holder may be acquiring it at this very instant.
    *
    * The replace itself must never expose a TORN marker: the r19
    * implementation rewrote the live marker with `create(overwrite)` —
    * a truncate-then-write — and a concurrent acquirer reading during
    * the truncate window saw an empty marker, mapped it to "expired",
    * deleted the LIVE lease and acquired it while this renewer still
    * returned true: two maintainers committing concurrently, exactly
    * what the fence exists to prevent. Now the new content is written
    * COMPLETE to a tmp file and moved over the marker: atomically on
    * local filesystems (`ATOMIC_MOVE`), and on HDFS-likes (no atomic
    * replace) via delete + rename-no-overwrite, whose marker-absent
    * window fails CLOSED — a racing acquirer that creates the marker
    * first makes the rename fail and this renewal returns false (lease
    * lost, the fence refuses the next commit). Either way no reader
    * ever observes torn bytes and mutual exclusion holds.
    */
  def renewIfOwned(h: Held): Boolean =
    readMarker(h.fs, h.marker) match {
      case Some((expiry, o))
          if o == h.owner && System.currentTimeMillis() < expiry =>
        val content =
          s"${System.currentTimeMillis() + h.ttlMs}:${h.owner}".getBytes("UTF-8")
        val scheme = Option(h.fs.getUri).map(_.getScheme).getOrElse("")
        if (scheme == "file" || scheme.isEmpty) {
          val local = java.nio.file.Paths.get(h.marker.toUri.getPath)
          val tmp = local.resolveSibling(
            s".${local.getFileName}.renew-${h.owner.take(8)}")
          java.nio.file.Files.write(tmp, content)
          java.nio.file.Files.move(tmp, local,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          true
        } else {
          val tmp = new Path(h.marker.getParent,
            s".${h.marker.getName}.renew-${h.owner.take(8)}")
          val out = h.fs.create(tmp, true)
          try out.write(content) finally out.close()
          h.fs.delete(h.marker, false)
          val won = h.fs.rename(tmp, h.marker)
          if (!won) h.fs.delete(tmp, false): Unit
          won
        }
      case _ => false
    }

  /** The commit fence (the fencing half of the single-maintainer
    * contract): called immediately before each store/view commit inside
    * a sweep, it renews the lease while held and THROWS [[LostException]]
    * the moment the lease is lost — an overrun holder refuses its next
    * commit instead of racing the maintainer that re-acquired. Doubles
    * as the heartbeat, so a sweep that fences at every step never
    * expires mid-run no matter how long it takes.
    */
  def fence(h: Held): Unit =
    if (!renewIfOwned(h))
      throw new LostException(
        s"maintenance lease ${h.marker} lost (expired past its TTL and " +
          "possibly re-acquired by another maintainer) — refusing to " +
          "commit; the store is untouched by this step, re-run the sweep")

  /** The lease the current thread's sweep holds, if any — plumbing so
    * commit sites deep in the walkers can fence without threading the
    * handle through every signature.
    */
  private val active = new scala.util.DynamicVariable[Option[Held]](None)

  /** Fence against the thread's active sweep lease; no-op when the
    * deployment runs leaseless (ConfKey unset — single-process
    * convention, unchanged behavior).
    */
  def fenceActive(): Unit = active.value.foreach(fence)

  /** Run `body` under the sweep lease at `dir`. */
  def withLease[T](
      spark: SparkSession, dir: String,
      ttlMs: Long = DefaultTtlMs)(body: => T): T = {
    val h = acquire(spark, dir, ttlMs)
    try active.withValue(Some(h))(body) finally release(h)
  }

  /** Run `body` under the lease configured on [[ConfKey]], or leaseless
    * when unset — the wrapper every catalog-walking maintenance face
    * (sweep, autopilot, catalog_save) routes through.
    */
  def withConfigured[T](spark: SparkSession)(body: => T): T =
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case None => body
      case Some(dir) =>
        val ttl = spark.conf.getOption(TtlConfKey).map(_.toLong)
          .getOrElse(DefaultTtlMs)
        withLease(spark, dir, ttl)(body)
    }
}
