package graft.engine

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Invalidation is explicit (`invalidate`/`clear`), mirroring the
  * reference's API; the CDC-driven refresh the reference stubs
  * (crates/cdc/src/lib.rs:9) is realized by streaming.EventsStream wiring
  * `foreachBatch` to `refresh`.
  */
final class ResultCache(spark: SparkSession) {

  private val entries = TrieMap.empty[String, DataFrame]

  /** Cache a result under a key (reference cache/src/lib.rs:38-44 `put`).
    * Eagerly materializes so the first read doesn't pay compute.
    */
  def put(key: String, df: DataFrame): DataFrame = {
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    cached.count() // force materialization, like the reference's stored batches
    entries.put(key, cached).foreach(_.unpersist(blocking = false))
    cached
  }

  /** Lookup (reference cache/src/lib.rs:46-50 `get`). */
  def get(key: String): Option[DataFrame] = entries.get(key)

  /** Compute-through: return the cached frame or build, cache, and return. */
  def getOrPut(key: String)(build: => DataFrame): DataFrame =
    entries.getOrElse(key, put(key, build))

  /** Drop one key (reference `invalidate`). */
  def invalidate(key: String): Unit =
    entries.remove(key).foreach(_.unpersist(blocking = false))

  /** Recompute a cached entry from a fresh build — the CDC-refresh hook. */
  def refresh(key: String, build: => DataFrame): DataFrame = {
    invalidate(key)
    put(key, build)
  }

  /** Drop everything (reference `clear`). */
  def clear(): Unit = {
    entries.keys.foreach(invalidate)
  }

  def keys: Set[String] = entries.keySet.toSet
}
