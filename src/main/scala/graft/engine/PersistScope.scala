package graft.engine

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset

/** Registry for `persist()` handles created inside lazily-returned query
  * plans, so the caller that finally materializes the DataFrame can release
  * every intermediate pin in one call.
  *
  * Why not unpersist inside the query function: the functions return an
  * UNEXECUTED plan — unpersisting there would drop the cache before the
  * first action ever fills it. Why not rely on GC: Spark keeps a strong
  * reference to cached plans in the shared CacheManager, so un-released
  * handles accumulate storage for the life of the session (the
  * "already cached" warnings the round-2 audit flagged).
  *
  * Contract: query builders wrap every `persist()` in `track(...)`;
  * Verify/Bench (and any other driver of the registry) call `releaseAll()`
  * after each query's action completes. Thread-safe; releasing is
  * non-blocking (async cache drop).
  */
object PersistScope {
  private val handles = new ConcurrentLinkedQueue[Dataset[_]]()

  // when a thread runs inside `scoped`, its pins land here instead of the
  // global queue, so releasing them cannot strip pins belonging to work
  // running CONCURRENTLY on other threads (the global releaseAll remains
  // correct for the strictly-sequential drivers: Verify, Bench, probes)
  private val localScope =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[Dataset[_]]]()

  /** Register a persisted dataset for later release; returns it unchanged. */
  def track[T <: Dataset[_]](ds: T): T = {
    val scope = localScope.get()
    if (scope != null) scope += ds else handles.add(ds)
    ds
  }

  /** Run `body` with THIS THREAD's pins captured locally and released when
    * it returns — the concurrency-safe alternative to releaseAll for
    * callers that share the process with other running work (the
    * streaming ingest sink's foreachBatch is the motivating case: a
    * global release there would unpersist a concurrently-running batch
    * query's pins mid-job). Nests: an inner scope restores the outer one.
    * Everything the body builds AND executes must finish inside it — the
    * pins are dropped on exit.
    */
  def scoped[A](body: => A): A = {
    val outer = localScope.get()
    val mine = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]
    localScope.set(mine)
    try body
    finally {
      localScope.set(outer)
      mine.foreach(_.unpersist(blocking = false))
    }
  }

  /** persist + track in one step. */
  def pin[T <: Dataset[_]](ds: T): T = {
    ds.persist()
    track(ds)
  }

  /** persist + track + EAGERLY materialize. Use when the pinned plan feeds
    * both sides of a self-join: a lazily-shared cache gets raced by the
    * join's sides inside one job and computed multiple times — the eager
    * count() fills it once, sequentially, before the join runs.
    */
  def pinEager[T <: Dataset[_]](ds: T): T = {
    val pinned = pin(ds)
    pinned.count()
    pinned
  }

  /** Unpersist (non-blocking) everything tracked since the last release. */
  def releaseAll(): Unit = {
    var d = handles.poll()
    while (d != null) {
      d.unpersist(blocking = false)
      d = handles.poll()
    }
  }
}
