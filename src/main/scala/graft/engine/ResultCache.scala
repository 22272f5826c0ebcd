package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Keyed query-result cache — the Spark-native analogue of the reference's
  * `Cache` (crates/cache/src/lib.rs:20-56: a keyed `Vec<RecordBatch>` map
  * with put/get/invalidate/clear).
  *
  * Where the reference materializes batches on one node, `put` here keeps
  * the result DISTRIBUTED: `persist(MEMORY_AND_DISK)` pins the computed
  * partitions across executors (spilling instead of OOMing — the reference
  * cache has no spill), and the registry only holds the handle. A 100 TB
  * cached result therefore costs the driver nothing.
  *
  * `capacity` realizes the bound the reference DECLARES but never enforces
  * (crates/cache/src/lib.rs:13-16: `CacheConfig.capacity` is read by no
  * code path) — when set, the least-recently-USED entry is evicted and
  * unpersisted on overflow, so a long-lived session cannot pin unbounded
  * executor storage. `None` (the default, matching the reference's
  * `Default`) keeps the cache unbounded with explicit invalidation only.
  *
  * Invalidation is explicit (`invalidate`/`clear`), mirroring the
  * reference's API; the CDC-driven refresh the reference stubs
  * (crates/cdc/src/lib.rs:9) is realized by streaming.EventsStream wiring
  * `foreachBatch` to `refresh`.
  */
final class ResultCache(
    capacity: Option[Int] = None,
    // how often a thread that is ITSELF inside a builder re-checks the
    // wait graph for a deadlock cycle while awaiting another key's flight.
    // Pure detection cadence: a legitimately slow build is waited on
    // indefinitely — only a REAL cycle breaks. See getOrPut.
    cyclePollMs: Long = 50L
) {
  require(capacity.forall(_ > 0), s"capacity must be positive, got $capacity")
  require(cyclePollMs > 0, s"cyclePollMs must be positive, got $cyclePollMs")

  // access-ordered LinkedHashMap = LRU order for free; all map access is
  // synchronized on `entries` (the 10x50 EngineSpec concurrency test runs
  // against this). unpersist is non-blocking and happens outside no lock
  // hazard — Spark's own unpersist is thread-safe.
  private val entries = new java.util.LinkedHashMap[String, DataFrame](
    16, 0.75f, /* accessOrder = */ true)

  // what each cached key READS (table names / table paths) — the
  // write-through invalidation edge: a commit to any of these evicts the
  // entry. Maintained under the same lock as `entries`.
  private val dependsOn = new java.util.HashMap[String, Set[String]]()

  // write-through race guard: each invalidation bumps the global stamp
  // and records it per LOWERCASED target; a put whose build overlapped an
  // invalidation of one of its deps (or its own key) declines to install
  private val invalidationStamp = new java.util.concurrent.atomic.AtomicLong()
  private val lastInvalidated =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Cache a result under a key (reference cache/src/lib.rs:38-44 `put`).
    * Eagerly materializes so the first read doesn't pay compute. On
    * overflow past `capacity`, evicts + unpersists least-recently-used
    * entries (never the key just written).
    *
    * `deps` names what the result was computed FROM (registered table
    * names, or absolute table paths for path-addressed sources like
    * Iceberg): [[invalidateDependents]] evicts every entry whose deps
    * contain the written target — the reference's CDC-invalidation
    * aspiration (crates/cdc/src/lib.rs:9) as a write-through rule.
    */
  def put(key: String, df: DataFrame, deps: Set[String] = Set.empty): DataFrame = {
    // capture BEFORE the (possibly long) materialization: a commit that
    // invalidates one of our deps while we build must keep the stale
    // result OUT of the map — installing it after the invalidation ran
    // would leave a permanently stale entry behind the write-through
    // contract's back
    val startStamp = invalidationStamp.get()
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    try cached.count() // force materialization, like the reference's stored batches
    catch {
      case e: Throwable =>
        // a failed build must not leave the plan registered in Spark's
        // CacheManager with no owning entry (retried failures would
        // accumulate leaked pinned storage for the session's lifetime)
        try cached.unpersist(blocking = false)
        catch { case _: Throwable => () }
        throw e
    }
    val watched = (deps + key).map(_.toLowerCase)
    def staleNow: Boolean = watched.exists(d =>
      Option(lastInvalidated.get(d)).exists(_.longValue() > startStamp))
    if (staleNow) {
      unpersistUnlessShared(cached)
      return cached // correct rows for the caller, just not installed
    }
    var installed = false
    val evicted = entries.synchronized {
      // Re-check UNDER the entries lock, immediately before install:
      // invalidateDependents writes the stamp BEFORE taking this lock,
      // so either the invalidator sees our installed entry (and evicts
      // it) or we see its bumped stamp here and decline. Checking only
      // outside the lock left a window — invalidate between the check
      // and the install would miss the not-yet-installed entry and a
      // permanently stale result would land in the map.
      if (staleNow) List.empty[DataFrame]
      else {
        installed = true
        val prev = Option(entries.put(key, cached))
        if (deps.nonEmpty) dependsOn.put(key, deps) else dependsOn.remove(key)
        val over = Iterator
          .continually {
            val it = entries.entrySet().iterator()
            if (capacity.exists(_ < entries.size())) {
              // eldest-by-access first; the just-put key is most recent so
              // it is only reachable when capacity == 0, excluded by require
              val eldest = it.next()
              it.remove()
              dependsOn.remove(eldest.getKey)
              Some(eldest.getValue)
            } else None
          }
          .takeWhile(_.isDefined)
          .flatten
          .toList
        prev.toList ++ over
      }
    }
    evicted.foreach(unpersistUnlessShared)
    if (!installed) unpersistUnlessShared(cached)
    cached
  }

  /** Unpersist an evicted/invalidated frame UNLESS a live entry shares
    * its plan: Spark's CacheManager uncaches by PLAN equality, not
    * Dataset identity, so unpersisting a replaced frame whose plan
    * matches a still-live entry (re-putting the same SQL is the common
    * case) would silently unpin the live entry's storage.
    */
  private def unpersistUnlessShared(evicted: DataFrame): Unit = {
    val shared = entries.synchronized {
      import scala.jdk.CollectionConverters._
      entries.values().asScala.exists(live =>
        (live ne evicted) &&
          live.queryExecution.analyzed.sameResult(evicted.queryExecution.analyzed))
    }
    if (!shared) evicted.unpersist(blocking = false)
  }

  /** Lookup (reference cache/src/lib.rs:46-50 `get`); refreshes LRU rank. */
  def get(key: String): Option[DataFrame] =
    entries.synchronized(Option(entries.get(key)))

  // single-flight guard for getOrPut: the first miss on a key installs a
  // future, concurrent misses await it instead of each computing and
  // persisting a frame only to have all but one replaced + unpersisted
  // (check-then-act waste, round-6 VERDICT). Explicit put/invalidate/
  // refresh intentionally stay race-y exactly like the reference's API —
  // the guard covers only the compute-through path, where duplicated work
  // is pure loss.
  private val inFlight = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[DataFrame]]()

  // keys whose build THIS thread is currently running: a reentrant
  // getOrPut(K) from inside K's own builder must not join its own flight
  // (self-deadlock — only the outer frame can ever complete it); it falls
  // through to a direct compute, the pre-single-flight behavior
  private val building =
    ThreadLocal.withInitial[java.util.HashSet[String]](() => new java.util.HashSet)

  // the wait graph, for REAL deadlock detection (not a timeout heuristic):
  // owners maps each in-flight key to the thread building it; awaiting maps
  // each blocked BUILDER thread to the key whose flight it is joining.
  // A deadlock is a cycle key -> owner -> awaited key -> owner -> ... back
  // to the current thread; following those edges is exact, so a
  // legitimately slow build (minutes-long Spark job) is never broken into
  // duplicate work the way the old 30 s timeout fallback did.
  private val owners =
    new java.util.concurrent.ConcurrentHashMap[String, Thread]()
  private val awaiting =
    new java.util.concurrent.ConcurrentHashMap[Thread, String]()

  /** Compute-through: return the cached frame or build, cache, and return.
    * Concurrent misses on the same key build ONCE (single-flight); waiters
    * observe the winner's frame, or its exception if the build failed (a
    * failed flight is removed, so the next call retries fresh).
    *
    * Cross-key deadlock guard: a wait CYCLE (A's builder awaits B's flight
    * while B's builder awaits A's) needs every participant to be holding a
    * flight of its own — so a waiter that is NOT inside any builder can
    * never be part of one and waits indefinitely, while a waiter that IS
    * building some other key polls the wait graph and breaks ONLY on a
    * detected cycle, by computing directly (duplicated work, the
    * pre-single-flight cost, strictly better than a hung session —
    * and, unlike a timeout, never triggered by a merely slow build).
    */
  def getOrPut(key: String)(build: => DataFrame): DataFrame = get(key) match {
    case Some(df) => df
    case None if building.get().contains(key) => put(key, build) // reentrant
    case None =>
      val mine = new java.util.concurrent.CompletableFuture[DataFrame]()
      val race = inFlight.putIfAbsent(key, mine)
      if (race != null) {
        if (building.get().isEmpty) {
          // get(), not join(): join ignores interruption, so a cancelled
          // caller would be held hostage for the whole build
          try race.get()
          catch {
            // unwrap so waiters see the builder's own exception type
            case e: java.util.concurrent.ExecutionException =>
              throw Option(e.getCause).getOrElse(e)
            case e: InterruptedException =>
              Thread.currentThread().interrupt()
              throw new RuntimeException(
                s"interrupted while awaiting cache build of '$key'", e)
          }
        } else awaitAsBuilder(key, race, build)
      } else {
        building.get().add(key)
        owners.put(key, Thread.currentThread())
        try {
          // re-check under the flight: a put() may have landed between the
          // miss above and winning the flight
          val df = get(key).getOrElse(put(key, build))
          mine.complete(df)
          df
        } catch {
          case e: Throwable =>
            mine.completeExceptionally(e)
            throw e
        } finally {
          building.get().remove(key)
          owners.remove(key, Thread.currentThread())
          inFlight.remove(key, mine)
        }
      }
    }

  /** A builder thread joining another key's flight: publish the wait edge,
    * poll the flight, and break ONLY when the wait graph actually cycles
    * back to this thread.
    */
  private def awaitAsBuilder(
      key: String,
      race: java.util.concurrent.CompletableFuture[DataFrame],
      build: => DataFrame): DataFrame = {
    awaiting.put(Thread.currentThread(), key)
    try {
      while (true) {
        try return race.get(cyclePollMs, java.util.concurrent.TimeUnit.MILLISECONDS)
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
          case _: java.util.concurrent.TimeoutException =>
            if (cycleDetected(key)) {
              // real deadlock: stop waiting. Serve a direct UNCACHED
              // compute — a put() here would race the flight's still-live
              // winner, whose later put would evict this entry and
              // unpersist a frame callers just received (and vice versa).
              // The winner's entry stays authoritative; this thread just
              // pays duplicated work once. Re-check the cache first: the
              // winner may have landed while we waited.
              // Drop our wait edge BEFORE the (possibly long) direct
              // build: we are no longer blocked, and a stale edge would
              // let other pollers "detect" cycles through us and cascade
              // into duplicated builds of their own.
              awaiting.remove(Thread.currentThread())
              return get(key).getOrElse {
                // register the key for the direct build: a REENTRANT
                // getOrPut(key) inside it must take the line-139 branch,
                // not re-detect this same still-live cycle and recurse
                // until StackOverflow
                building.get().add(key)
                try build
                finally building.get().remove(key)
              }
            }
        }
      }
      throw new IllegalStateException("unreachable")
    } finally awaiting.remove(Thread.currentThread())
  }

  /** Follow key -> owner thread -> key that owner awaits -> ... and report
    * whether the chain reaches the current thread. Exact on a quiescent
    * deadlock (every participant is parked in `awaiting`, edges stable);
    * transiently missing edges only delay detection one poll — a false
    * negative retries, and a stale edge for a thread that just completed
    * its flight resolves on the next poll when the join succeeds.
    */
  private def cycleDetected(startKey: String): Boolean = {
    val me = Thread.currentThread()
    var k = startKey
    var hops = 0
    while (hops < 10000) {
      val owner = owners.get(k)
      if (owner == null) return false // flight done/failed: join will resolve
      if (owner eq me) return true
      val next = awaiting.get(owner)
      if (next == null) return false // owner is running, not blocked
      k = next
      hops += 1
    }
    false
  }

  /** Drop one key (reference `invalidate`). */
  def invalidate(key: String): Unit =
    entries.synchronized {
      dependsOn.remove(key)
      Option(entries.remove(key))
    }.foreach(unpersistUnlessShared)

  /** Write-through invalidation: a commit landed on `target` (a
    * registered table name or an absolute table path) — evict the entry
    * keyed AS the target and every entry whose declared deps contain it.
    * Conservative by design: over-invalidation recomputes, stale data
    * misleads.
    */
  def invalidateDependents(target: String): Unit = {
    // stamp FIRST: an in-flight put that read pre-commit data observes
    // the bump at install time and declines (see put). Case-insensitive
    // throughout — Spark table names are; callers lowercase; a
    // mixed-case cache key must not dodge its own table's rewrite.
    lastInvalidated.put(target.toLowerCase, invalidationStamp.incrementAndGet())
    val hit = entries.synchronized {
      import scala.jdk.CollectionConverters._
      entries.keySet().asScala.toSeq.filter(k =>
        k.equalsIgnoreCase(target) ||
          Option(dependsOn.get(k)).exists(_.exists(_.equalsIgnoreCase(target))))
    }
    hit.foreach(invalidate)
  }

  /** Recompute a cached entry from a fresh build — the CDC-refresh hook. */
  def refresh(key: String, build: => DataFrame): DataFrame = {
    invalidate(key)
    put(key, build)
  }

  /** Drop everything (reference `clear`). */
  def clear(): Unit = keys.foreach(invalidate)

  def keys: Set[String] = {
    import scala.jdk.CollectionConverters._
    entries.synchronized(entries.keySet().asScala.toSet)
  }
}
