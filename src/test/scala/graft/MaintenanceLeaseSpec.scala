package graft

import org.apache.spark.sql.functions._

import graft.operators.{MaintenanceLease, MinHashIndex, StoreCatalog}
import graft.plans.MvAdvisor
import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}

/** The catalog-sweep maintenance lease ([[graft.operators
  * .MaintenanceLease]]): the previously-documented single-maintainer
  * contract for `maintainAll`/autopilot/`catalog_save`, now ENFORCED
  * when `spark.graft.maintenance.lease` names a shared-filesystem lease
  * dir — a second concurrent sweep backs off cleanly instead of
  * interleaving store refreshes.
  */
class MaintenanceLeaseSpec extends SparkTestBase {
  import spark.implicits._

  test("acquire is exclusive, release frees, TTL breaks a crashed holder, release is ownership-checked") {
    val dir = tempDir("graft-lease-basic")
    val h1 = MaintenanceLease.acquire(spark, dir)
    val e = intercept[IllegalStateException](
      MaintenanceLease.acquire(spark, dir))
    assert(e.getMessage.contains("backed off"), e.getMessage)
    MaintenanceLease.release(h1)
    val h2 = MaintenanceLease.acquire(spark, dir)
    // a crashed holder's lease expires: acquire with a tiny TTL, don't
    // release, and the next acquirer breaks it after expiry
    MaintenanceLease.release(h2)
    val crashed = MaintenanceLease.acquire(spark, dir, ttlMs = 50L)
    Thread.sleep(80L)
    val h3 = MaintenanceLease.acquire(spark, dir)
    // the overrun holder's release must NOT free the new holder's lease
    MaintenanceLease.release(crashed)
    intercept[IllegalStateException](MaintenanceLease.acquire(spark, dir))
    MaintenanceLease.release(h3)
  }

  test("N threads racing one acquire: exactly one wins (create-exclusive)") {
    val dir = tempDir("graft-lease-race")
    val n = 8
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val backoffs = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to n).map(_ => new Thread(() => {
      barrier.await()
      try {
        MaintenanceLease.acquire(spark, dir): Unit
        wins.incrementAndGet(): Unit
      } catch {
        case e: IllegalStateException if e.getMessage.contains("backed off") =>
          backoffs.incrementAndGet(): Unit
      }
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    // all threads attempted BEFORE any release: exactly one may hold
    assert(wins.get() === 1, s"wins=${wins.get()} backoffs=${backoffs.get()}")
    assert(backoffs.get() === n - 1)
  }

  test("maintainAll under a held configured lease backs off; leaseless when unset; autopilot and sweep share the one lease") {
    val leaseDir = tempDir("graft-lease-sweep")
    try {
      spark.conf.set(MaintenanceLease.ConfKey, leaseDir)
      val held = MaintenanceLease.acquire(spark, leaseDir)
      val e = intercept[IllegalStateException](MvAdvisor.maintainAll(spark))
      assert(e.getMessage.contains("backed off"), e.getMessage)
      val e2 = intercept[IllegalStateException](
        graft.operators.StoreMaintenance.autopilot(spark))
      assert(e2.getMessage.contains("backed off"), e2.getMessage)
      MaintenanceLease.release(held)
      // freed: the sweep runs (empty catalog -> empty result is fine)
      MvAdvisor.maintainAll(spark): Unit
      graft.operators.StoreMaintenance.autopilot(spark): Unit
    } finally spark.conf.unset(MaintenanceLease.ConfKey)
    // unset: leaseless, even while someone holds the dir's marker
    val held2 = MaintenanceLease.acquire(spark, leaseDir)
    try MvAdvisor.maintainAll(spark): Unit
    finally MaintenanceLease.release(held2)
  }

  test("the streaming maintain hook yields under a held lease instead of crashing the stream") {
    val leaseDir = tempDir("graft-lease-hook")
    try {
      spark.conf.set(MaintenanceLease.ConfKey, leaseDir)
      val held = MaintenanceLease.acquire(spark, leaseDir)
      // a scheduled sweep holds the lease: the ingest hook must NOT
      // throw into foreachBatch (which would fail the stream) — it
      // yields the round; the holder's sweep covers the same work and
      // the next micro-batch retries
      try assert(MvAdvisor.maintainHook(
        tempDir("graft-lease-hook-base"))(spark, 1L).isEmpty)
      finally MaintenanceLease.release(held)
      // freed: the hook runs normally again (empty catalog -> None)
      assert(MvAdvisor.maintainHook(
        tempDir("graft-lease-hook-base2"))(spark, 2L).isEmpty)
    } finally spark.conf.unset(MaintenanceLease.ConfKey)
  }

  test("renewal: a holder that fences outlives many TTLs; once lost, fence refuses") {
    val dir = tempDir("graft-lease-renew")
    // generous renew-to-TTL margin (250ms cadence vs 1s TTL) so a GC
    // pause on a loaded host cannot expire the lease between fences
    val h = MaintenanceLease.acquire(spark, dir, ttlMs = 1000L)
    // fence every ~250ms for 2+ TTLs' worth of wall clock: each fence
    // renews, so the lease never expires and no acquirer can break in
    (1 to 9).foreach { _ =>
      Thread.sleep(250L)
      MaintenanceLease.fence(h)
      intercept[IllegalStateException](
        MaintenanceLease.acquire(spark, dir, ttlMs = 1000L))
    }
    // stop renewing: the lease expires, a second maintainer takes it,
    // and the overrun holder's next fence REFUSES (its release is also
    // ownership-checked and leaves the new holder's marker alone)
    Thread.sleep(1200L)
    val h2 = MaintenanceLease.acquire(spark, dir)
    val lost = intercept[MaintenanceLease.LostException](
      MaintenanceLease.fence(h))
    assert(lost.getMessage.contains("refusing to commit"), lost.getMessage)
    MaintenanceLease.release(h)
    MaintenanceLease.fence(h2) // the live holder keeps fencing fine
    MaintenanceLease.release(h2)
  }

  test("renewal is atomic: concurrent readers never observe a torn marker (r20)") {
    // the r19 renewal rewrote the LIVE marker with truncate-then-write:
    // a breaker reading during the truncate saw an empty marker, mapped
    // it to "expired", and deleted the live lease — two maintainers then
    // committed concurrently. The r20 tmp+atomic-move renewal must never
    // expose an empty or unparsable marker to any reader.
    val dir = tempDir("graft-lease-atomic")
    val h = MaintenanceLease.acquire(spark, dir, ttlMs = 60000L)
    val marker = java.nio.file.Paths.get(dir, "maintainer")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val torn = new java.util.concurrent.atomic.AtomicInteger(0)
    val reads = new java.util.concurrent.atomic.AtomicLong(0)
    def parsable(raw: String): Boolean = {
      val cut = raw.indexOf(':')
      cut > 0 && raw.take(cut).forall(_.isDigit) && raw.length > cut + 1
    }
    val readers = (1 to 4).map { _ =>
      val t = new Thread(() => {
        while (!stop.get()) {
          try {
            val raw = new String(
              java.nio.file.Files.readAllBytes(marker), "UTF-8").trim
            reads.incrementAndGet()
            if (!parsable(raw)) torn.incrementAndGet()
          } catch {
            // the marker must EXIST throughout — a vanish is exactly the
            // torn state a breaker would misread as expired
            case _: java.nio.file.NoSuchFileException => torn.incrementAndGet()
            case _: java.io.IOException => torn.incrementAndGet()
          }
        }
      })
      t.start(); t
    }
    try {
      (1 to 300).foreach { _ =>
        assert(MaintenanceLease.renewIfOwned(h), "live renewal must succeed")
      }
    } finally {
      stop.set(true)
      readers.foreach(_.join(5000))
    }
    assert(reads.get() > 0, "readers never got a look in")
    assert(torn.get() === 0,
      s"${torn.get()} torn/vanished marker reads out of ${reads.get()}")
    // no renewal tmp left behind, and the fence still works
    val leftovers = new java.io.File(dir).listFiles()
      .filter(_.getName.contains(".renew-"))
    assert(leftovers.isEmpty, leftovers.map(_.getName).mkString(", "))
    MaintenanceLease.fence(h)
    MaintenanceLease.release(h)
  }

  test("an overrun sweep's post-break store commit refuses; the new maintainer's sweep converges") {
    StoreCatalog.clear()
    val leaseDir = tempDir("graft-lease-fence-sweep")
    val tbl = tempDir("graft-lease-fence-docs") + "/docs_ice"
    val root = tempDir("graft-lease-fence-idx") + "/index"
    val docs = spark.read
      .parquet(SparkTestBase.Sf0001 + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    IcebergWriter.append(spark, tbl, docs.filter($"doc_id" < 150),
      None, 1000L, formatVersion = 2)
    val rec = MvAdvisor.DedupIndexRecommendation(tbl, "text", 1)
    try {
      rec.materialize(spark, root): Unit
      IcebergWriter.append(spark, tbl,
        docs.filter($"doc_id" >= 150 && $"doc_id" < 200), None, 2000L)
      spark.conf.set(MaintenanceLease.ConfKey, leaseDir)
      val lost = intercept[MaintenanceLease.LostException] {
        MaintenanceLease.withLease(spark, leaseDir, ttlMs = 150L) {
          // the sweep stalls past its TTL without fencing...
          Thread.sleep(300L)
          // ...a second maintainer breaks the expired lease and runs the
          // whole sweep (bringing the store current), then releases
          val t = new Thread(() => { MvAdvisor.maintainAll(spark): Unit })
          t.start(); t.join()
          // the overrun holder's next store commit hits the fence INSIDE
          // refreshStep and refuses before touching the store
          StoreCatalog.refreshStep(
            spark, StoreCatalog.find(rec.storeName).get): Unit
        }
      }
      assert(lost.getMessage.contains("refusing to commit"), lost.getMessage)
      // the surviving state IS the single-sweep state: cursor at head,
      // stored rows equal to a base recompute
      val head = IcebergMeta.load(tbl).currentSnapshot.get.id
      assert(StoreCatalog.find(rec.storeName).get.source.get.watermark
        === head)
      val want = MinHashIndex.shingleSets(
          IcebergSource.read(spark, tbl).select($"doc_id", $"text"))
        .select($"doc_id", size($"sh"))
        .as[(Long, Int)].collect().sorted.toSeq
      val stored = MinHashIndex.shingles(
          spark, MinHashIndex.StoredIndex(root))
        .select($"doc_id", size($"sh"))
        .as[(Long, Int)].collect().sorted.toSeq
      assert(stored === want,
        "overrun sweep must leave the new maintainer's state untouched")
    } finally {
      spark.conf.unset(MaintenanceLease.ConfKey)
      StoreCatalog.clear()
    }
  }

  test("two racing sweeps on one catalog leave the store equal to a single-sweep run") {
    StoreCatalog.clear()
    val leaseDir = tempDir("graft-lease-race-sweep")
    val tbl = tempDir("graft-lease-docs") + "/docs_ice"
    val root = tempDir("graft-lease-idx") + "/index"
    val docs = spark.read
      .parquet(SparkTestBase.Sf0001 + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    IcebergWriter.append(spark, tbl, docs.filter($"doc_id" < 150),
      None, 1000L, formatVersion = 2)
    val rec = MvAdvisor.DedupIndexRecommendation(tbl, "text", 1)
    try {
      rec.materialize(spark, root): Unit
      IcebergWriter.append(spark, tbl,
        docs.filter($"doc_id" >= 150 && $"doc_id" < 200), None, 2000L)
      spark.conf.set(MaintenanceLease.ConfKey, leaseDir)
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val outcomes =
        new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val threads = (1 to 2).map(_ => new Thread(() => {
        barrier.await()
        try {
          MvAdvisor.maintainAll(spark): Unit
          outcomes.add("swept"): Unit
        } catch {
          case e: IllegalStateException
              if e.getMessage.contains("backed off") =>
            outcomes.add("backed-off"): Unit
        }
      }))
      threads.foreach(_.start()); threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      val got = outcomes.asScala.toSeq.sorted
      // either they truly raced (one swept, one backed off) or they
      // serialized (both swept — the second a no-op); NEVER interleaved
      assert(got == Seq("backed-off", "swept") || got == Seq("swept", "swept"),
        got.toString)
      // the store equals a single-sweep run: cursor at head, index rows
      // equal to the base recompute, no duplicates
      val head = IcebergMeta.load(tbl).currentSnapshot.get.id
      assert(StoreCatalog.find(rec.storeName).get.source.get.watermark
        === head)
      val want = MinHashIndex.shingleSets(
          IcebergSource.read(spark, tbl).select($"doc_id", $"text"))
        .select($"doc_id", size($"sh"))
        .as[(Long, Int)].collect().sorted.toSeq
      val stored = MinHashIndex.shingles(
          spark, MinHashIndex.StoredIndex(root))
        .select($"doc_id", size($"sh"))
        .as[(Long, Int)].collect().sorted.toSeq
      assert(stored === want, "racing sweeps must equal one sweep")
    } finally {
      spark.conf.unset(MaintenanceLease.ConfKey)
      StoreCatalog.clear()
    }
  }
}
