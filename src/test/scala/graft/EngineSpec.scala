package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import graft.sources.CsvSource

/** Session/catalog, result cache, CSV source, and serving shim — the
  * reference's non-relational surfaces (catalog.rs, cache/src/lib.rs,
  * connectors/filesystem, api/src/lib.rs).
  */
class EngineSpec extends SparkTestBase {

  // ----- catalog (reference crates/common/src/catalog.rs:5-27) -------------

  test("registerTable round-trip + tableNames + SQL over registered tables") {
    import spark.implicits._
    session.registerTable("cat_users", Seq((1, "a"), (2, "b")).toDF("id", "name"))
    session.registerTable("cat_orders", Seq((1, 10.0), (1, 5.0), (2, 7.0)).toDF("uid", "amt"))
    assert(session.tableNames.contains("cat_users"))
    val rows = session
      .execute(
        "SELECT u.name, sum(o.amt) AS total FROM cat_users u " +
          "JOIN cat_orders o ON u.id = o.uid GROUP BY u.name ORDER BY u.name"
      )
      .collect()
    assert(rows.toSeq === Seq(Row("a", 15.0), Row("b", 7.0)))
  }

  // ----- result cache (reference crates/cache/src/lib.rs:20-56,89-191) -----

  test("cache put/get/invalidate") {
    import spark.implicits._
    val df = Seq((1, "foo"), (2, "bar"), (3, "baz")).toDF("id", "name")
    session.cache.put("batch1", df)
    assert(session.cache.get("batch1").isDefined)
    assert(session.cache.get("batch1").get.count() === 3)
    assert(session.cache.get("missing").isEmpty)
    session.cache.invalidate("batch1")
    assert(session.cache.get("batch1").isEmpty)
  }

  test("cacheQuery registers a queryable cached table; refresh recomputes") {
    import spark.implicits._
    session.registerTable("cache_src", Seq(1, 2, 3).toDF("v"))
    session.cacheQuery("cached_sum", "SELECT sum(v) AS s FROM cache_src")
    assert(session.execute("SELECT s FROM cached_sum").head().getLong(0) === 6L)
    // underlying data changes; cached result must NOT move until refresh
    session.registerTable("cache_src", Seq(10, 20).toDF("v"))
    assert(session.execute("SELECT s FROM cached_sum").head().getLong(0) === 6L)
    val fresh = session.cache.refresh(
      "cached_sum",
      session.execute("SELECT sum(v) AS s FROM cache_src")
    )
    fresh.createOrReplaceTempView("cached_sum")
    assert(session.execute("SELECT s FROM cached_sum").head().getLong(0) === 30L)
  }

  test("write-through invalidation: CTAS and Iceberg commits evict dependent entries") {
    import spark.implicits._
    // --- createTableAs over a dependency of a cached query -------------
    session.registerTable("inv_src", Seq(1, 2, 3).toDF("v"))
    session.cacheQuery("inv_agg", "SELECT sum(v) AS s FROM inv_src")
    assert(session.execute("SELECT s FROM inv_agg").head().getLong(0) === 6L)
    assert(session.cache.keys.contains("inv_agg"))
    // rewrite the source THROUGH the engine's write path: the stale
    // aggregate is evicted, not served
    session.createTableAs("inv_src", "SELECT 10 AS v", tempDir("graft-inv") + "/t")
    assert(!session.cache.keys.contains("inv_agg"),
      "entry computed FROM the rewritten table must be evicted")
    // unrelated entries survive
    session.cacheQuery("inv_other", "SELECT 1 AS one")
    session.createTableAs("inv_src", "SELECT 20 AS v", tempDir("graft-inv2") + "/t")
    assert(session.cache.keys.contains("inv_other"))
    // recompute over the new files sees the write
    session.cacheQuery("inv_agg", "SELECT sum(v) AS s FROM inv_src")
    assert(session.execute("SELECT s FROM inv_agg").head().getLong(0) === 20L)

    // --- Iceberg commit over a path-declared dependency -----------------
    val root = tempDir("graft-inv-ice")
    graft.sources.IcebergWriter.append(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), None, 1000L)
    val abs = java.nio.file.Paths.get(root).toAbsolutePath.toString
    session.cache.put("ice_n",
      graft.sources.IcebergSource.read(spark, root)
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n")),
      deps = Set(abs))
    assert(session.cache.get("ice_n").get.head().getLong(0) === 2L)
    // a new snapshot commit fires the listener -> entry evicted
    graft.sources.IcebergWriter.append(spark, root,
      Seq((3L, "c")).toDF("id", "v"), None, 2000L)
    assert(session.cache.get("ice_n").isEmpty,
      "Iceberg commit must evict entries dep'd on the table path")
    // recompute sees snapshot 2
    val fresh = session.cache.put("ice_n",
      graft.sources.IcebergSource.read(spark, root)
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n")),
      deps = Set(abs))
    assert(fresh.head().getLong(0) === 3L)
  }

  test("bounded cache evicts least-recently-USED, unpersists it, keeps the rest") {
    import spark.implicits._
    val c = new graft.engine.ResultCache(capacity = Some(3))
    val frames = (1 to 3).map { i =>
      i -> c.put(s"ev-$i", Seq(i).toDF("v"))
    }.toMap
    // touch ev-1 so ev-2 becomes the LRU entry
    assert(c.get("ev-1").isDefined)
    val f4 = c.put("ev-4", Seq(4).toDF("v"))
    assert(c.keys === Set("ev-1", "ev-3", "ev-4"), "LRU entry ev-2 should be gone")
    assert(frames(2).storageLevel === org.apache.spark.storage.StorageLevel.NONE,
      "evicted frame must be unpersisted")
    // survivors stay pinned and readable
    assert(frames(1).storageLevel.useMemory)
    assert(c.get("ev-1").get.head().getInt(0) === 1)
    assert(c.get("ev-3").get.head().getInt(0) === 3)
    assert(c.get("ev-4").get.head().getInt(0) === 4)
    c.clear()
    assert(c.keys.isEmpty)
    assert(f4.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
  }

  test("cache concurrency (reference cache 10 tasks x 50 ops, lib.rs:139-191)") {
    import spark.implicits._
    val pool = Executors.newFixedThreadPool(10)
    val done = new CountDownLatch(10)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until 10).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit =
          try {
            (0 until 50).foreach { i =>
              val key = s"ck-$t-${i % 5}"
              session.cache.put(key, Seq((t, i)).toDF("t", "i"))
              assert(session.cache.get(key).isDefined)
              if (i % 10 == 9) session.cache.invalidate(key)
            }
          } catch { case e: Throwable => errors.add(e) }
          finally done.countDown()
      })
    }
    assert(done.await(120, TimeUnit.SECONDS), "concurrency test timed out")
    pool.shutdown()
    assert(errors.isEmpty, s"concurrent cache ops failed: ${errors.peek()}")
    session.cache.clear()
    assert(session.cache.keys.isEmpty)
  }

  test("re-putting the same plan keeps the live entry pinned; invalidation is case-insensitive") {
    import spark.implicits._
    val c = new graft.engine.ResultCache()
    c.put("rp", Seq(1, 2).toDF("v"))
    // same plan, fresh Dataset: Spark's CacheManager uncaches by PLAN
    // equality, so unpersisting the replaced frame naively would unpin
    // the replacement too
    val b = c.put("rp", Seq(1, 2).toDF("v"))
    assert(b.storageLevel.useMemory,
      "replacement lost its pinned storage to the evicted twin's unpersist")
    assert(c.get("rp").get.count() === 2)
    c.clear()

    // a mixed-case key must not dodge its own table's rewrite
    c.put("MixedCase", Seq(3).toDF("v"))
    c.invalidateDependents("mixedcase")
    assert(c.get("MixedCase").isEmpty,
      "case difference let a stale entry survive its table's rewrite")
  }

  test("getOrPut is single-flight: concurrent misses materialize once") {
    import spark.implicits._
    val c = new graft.engine.ResultCache()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(8)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = Executors.newFixedThreadPool(8)
    (0 until 8).foreach { _ =>
      pool.submit(new Runnable {
        def run(): Unit =
          try {
            start.await()
            val df = c.getOrPut("sf-key") {
              builds.incrementAndGet()
              Thread.sleep(200) // widen the miss window so threads genuinely race
              Seq(41L, 1L).toDF("v")
                .agg(org.apache.spark.sql.functions.sum($"v").as("s"))
            }
            results.add(df.head().getLong(0))
          } catch { case e: Throwable => errors.add(e) }
          finally done.countDown()
      })
    }
    start.countDown()
    assert(done.await(120, TimeUnit.SECONDS), "single-flight test timed out")
    pool.shutdown()
    assert(errors.isEmpty, s"getOrPut failed: ${errors.peek()}")
    assert(builds.get() === 1, s"expected exactly one build, got ${builds.get()}")
    assert(results.size === 8 && results.asScala.forall(_ == 42L))

    // a failed build propagates to all waiters and does NOT poison the key
    val boom = intercept[IllegalStateException] {
      c.getOrPut("sf-bad")(throw new IllegalStateException("builder boom"))
    }
    assert(boom.getMessage === "builder boom")
    assert(c.getOrPut("sf-bad")(Seq(7).toDF("v")).head().getInt(0) === 7)

    // a builder that reentrantly asks for ITS OWN key must not join its
    // own flight (self-deadlock); it computes directly instead
    val reentrant = c.getOrPut("sf-re") {
      val inner = c.getOrPut("sf-re")(Seq(5).toDF("v"))
      inner.select(
        (org.apache.spark.sql.functions.col("v") + 1).as("v"))
    }
    assert(reentrant.head().getInt(0) === 6)
    c.clear()
  }

  test("a slow build is NOT broken: builder-waiters wait it out, zero duplicate work") {
    import spark.implicits._
    // the old 30 s timeout fallback duplicated any heavy build a waiting
    // builder outlasted; real cycle detection must NOT fire here — the
    // slow flight (well past many poll intervals) completes exactly once
    val c = new graft.engine.ResultCache(cyclePollMs = 20L)
    val builds = new java.util.concurrent.atomic.AtomicInteger()
    val slowEntered = new CountDownLatch(1)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val slow = new Thread(() =>
      try c.getOrPut("slow-key") {
        slowEntered.countDown()
        Thread.sleep(1000) // >> cyclePollMs: many polls, still no cycle
        builds.incrementAndGet()
        Seq(1).toDF("v")
      }: Unit
      catch { case e: Throwable => errors.add(e) })
    slow.setDaemon(true); slow.start()
    assert(slowEntered.await(30, TimeUnit.SECONDS))
    // this thread is a BUILDER of another key when it joins slow-key's
    // flight — exactly the waiter class the old timeout would break
    val out = c.getOrPut("outer-key") {
      c.getOrPut("slow-key")(fail("duplicate build ran"))
    }
    slow.join(30000)
    assert(out.head().getInt(0) === 1)
    assert(builds.get() === 1, "slow build must run exactly once")
    assert(errors.isEmpty, s"slow builder threw: ${errors.peek()}")
    c.clear()
  }

  test("cross-key builder cycle breaks via wait-graph detection instead of deadlocking") {
    import spark.implicits._
    // A's builder asks for B while B's builder asks for A — with unbounded
    // joins both threads wait on each other's flight forever. The guard
    // follows owner->awaited edges and breaks only on the REAL cycle.
    val c = new graft.engine.ResultCache(cyclePollMs = 50L)
    val aInstalled = new CountDownLatch(1)
    val bInstalled = new CountDownLatch(1)
    val done = new CountDownLatch(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val results = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    def worker(mine: String, theirs: String,
        installed: CountDownLatch, other: CountDownLatch): Thread = {
      val t = new Thread(() =>
        try {
          val df = c.getOrPut(mine) {
            installed.countDown()
            // only proceed once BOTH flights exist, so the cycle is real
            assert(other.await(30, TimeUnit.SECONDS), "peer flight never installed")
            c.getOrPut(theirs)(Seq(1).toDF("v")).select(($"v" + 1).as("v"))
          }
          results.put(mine, df.head().getInt(0))
        } catch { case e: Throwable => errors.add(e) }
        finally done.countDown())
      t.setDaemon(true)
      t.start()
      t
    }
    worker("cyc-a", "cyc-b", aInstalled, bInstalled)
    worker("cyc-b", "cyc-a", bInstalled, aInstalled)
    assert(done.await(120, TimeUnit.SECONDS),
      "cross-key builders deadlocked — cycle detection did not fire")
    assert(errors.isEmpty, s"cycle breaker threw: ${errors.peek()}")
    // exactly the broken thread direct-computes (base 1 -> its key = 2);
    // the OTHER builder's join then legitimately observes that completed
    // flight and layers its own +1 on top (= 3). Both breaking (2/2) is
    // the tie race; both reusing (3/3) would mean nobody broke — the
    // old timeout design always produced 2/2 because both sides gave up.
    val a = results.get("cyc-a")
    val b = results.get("cyc-b")
    assert(Set(a, b).subsetOf(Set(2, 3)), s"unexpected values: $a, $b")
    assert(a === 2 || b === 2,
      s"at least one builder must break the cycle with a direct compute: $a, $b")
    c.clear()
  }

  // ----- CSV source (reference crates/connectors/filesystem/src/lib.rs) ----

  test("CSV with header + declared schema (reference lib.rs:48-72)") {
    import org.apache.spark.sql.types._
    val dir = tempDir("graft-csv")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "t.csv"),
      "col_a,col_b\n1,foo\n2,bar\n"
    )
    val schema = StructType(Seq(
      StructField("col_a", LongType),
      StructField("col_b", StringType)
    ))
    val rows = CsvSource.read(spark, s"$dir/t.csv", schema, header = true)
      .orderBy("col_a").collect()
    assert(rows.toSeq === Seq(Row(1L, "foo"), Row(2L, "bar")))
  }

  test("headerless CSV (reference lib.rs:74-98)") {
    import org.apache.spark.sql.types._
    val dir = tempDir("graft-csv2")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "t.csv"),
      "1,foo\n2,bar\n"
    )
    val schema = StructType(Seq(
      StructField("col_a", LongType),
      StructField("col_b", StringType)
    ))
    val n = CsvSource.read(spark, s"$dir/t.csv", schema, header = false).count()
    assert(n === 2)
  }

  test("missing CSV file errors (reference lib.rs:100-113)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a", IntegerType)))
    intercept[Exception] {
      CsvSource.read(spark, "/nonexistent/missing.csv", schema, header = true).collect()
    }
  }

  // ----- serving shim (reference crates/api/src/lib.rs:81-149) -------------

  test("registerIcebergTable: SQL view follows commits (upsert lands without re-registration)") {
    import spark.implicits._
    import graft.sources.IcebergWriter
    val root = tempDir("graft-engine-iceberg")
    IcebergWriter.append(spark, root,
      (0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "v"), None, 1000L,
      formatVersion = 2)
    session.registerIcebergTable("ice_live", root)
    assert(session.execute("SELECT count(*) AS n FROM ice_live")
      .head().getLong(0) === 10L)

    // a MoR upsert through the writer: the view re-binds on commit —
    // no manual refresh, SQL sees the new current snapshot
    IcebergWriter.upsertRows(spark, root,
      Seq((3L, "updated"), (50L, "new")).toDF("id", "v"), "id", 2000L)
    assert(session.execute("SELECT count(*) AS n FROM ice_live")
      .head().getLong(0) === 11L)
    assert(session
      .execute("SELECT v FROM ice_live WHERE id = 3")
      .head().getString(0) === "updated")

    // compaction is equally transparent
    IcebergWriter.compact(spark, root, 3000L)
    assert(session.execute("SELECT count(*) AS n FROM ice_live")
      .head().getLong(0) === 11L)
  }

  test("registerIcebergMetaTables: the ops views answer SQL and follow commits") {
    import spark.implicits._
    import graft.sources.IcebergWriter
    val root = tempDir("graft-engine-metatables")
    IcebergWriter.append(spark, root,
      (0 until 8).map(i => (i.toLong, i % 2)).toDF("id", "band"),
      Some("band"), 1000L, formatVersion = 2)
    session.registerIcebergMetaTables("mt", root)
    assert(session.execute(
      "SELECT count(*) AS n FROM mt_snapshots").head().getLong(0) === 1L)
    assert(session.execute(
      "SELECT sum(record_count) AS n FROM mt_partitions").head().getLong(0) === 8L)
    // a commit re-binds every view: the delete file shows up in files,
    // the new snapshot in snapshots
    IcebergWriter.deleteEquality(spark, root, Seq(3L).toDF("id"), 2000L)
    assert(session.execute(
      "SELECT count(*) AS n FROM mt_snapshots").head().getLong(0) === 2L)
    assert(session.execute(
      "SELECT count(*) AS n FROM mt_files WHERE content = 2")
      .head().getLong(0) === 1L)
    // the manifest gauge and the table card are SQL too
    assert(session.execute(
      "SELECT count(*) AS n FROM mt_manifests WHERE content = 1")
      .head().getLong(0) === 1L)
    assert(session.execute(
      "SELECT format_version, n_snapshots FROM mt_describe").head()
      .getInt(0) === 2)
  }

  test("registerIcebergTable: branch and tag views sit in the catalog next to main") {
    import spark.implicits._
    import graft.sources.IcebergWriter
    val root = tempDir("graft-engine-iceberg-refs")
    IcebergWriter.append(spark, root,
      (0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "v"), None, 1000L,
      formatVersion = 2)
    IcebergWriter.createTag(root, "rel1", 1500L)
    IcebergWriter.createBranch(root, "audit", 1600L)
    session.registerIcebergTable("rt_main", root)
    session.registerIcebergTable("rt_audit", root, Some("audit"))
    session.registerIcebergTable("rt_rel1", root, Some("rel1"))

    // a branch commit: the audit view follows, main and the tag don't
    IcebergWriter.appendToBranch(spark, root,
      (10 until 15).map(i => (i.toLong, s"a$i")).toDF("id", "v"), "audit", 2000L)
    def n(t: String): Long =
      session.execute(s"SELECT count(*) AS n FROM $t").head().getLong(0)
    assert(n("rt_audit") === 15L)
    assert(n("rt_main") === 10L)
    assert(n("rt_rel1") === 10L)

    // publish: main's view follows the fast-forward; the tag stays pinned
    IcebergWriter.fastForward(root, "audit", 3000L)
    assert(n("rt_main") === 15L)
    assert(n("rt_rel1") === 10L)
    // SQL can join across history lines — the audit-vs-release diff
    assert(session.execute(
      "SELECT count(*) AS n FROM rt_main m LEFT ANTI JOIN rt_rel1 r ON m.id = r.id")
      .head().getLong(0) === 5L)
  }

  test("registerIcebergTable: SQL view follows schema evolution (rename visible, no resurrect)") {
    import spark.implicits._
    import graft.sources.IcebergWriter
    val root = tempDir("graft-engine-iceberg-evolve")
    IcebergWriter.append(spark, root,
      (0 until 6).map(i => (i.toLong, i * 10)).toDF("id", "qty"), None,
      1000L, formatVersion = 2)
    session.registerIcebergTable("ice_evolving", root)
    assert(session.execute("SELECT sum(qty) AS s FROM ice_evolving")
      .head().getLong(0) === 150L)

    // a metadata-only rename re-binds the view: the NEW name queries the
    // OLD files' values, the old name is gone from the SQL surface
    IcebergWriter.renameColumn(root, "qty", "quantity", 2000L)
    assert(session.execute("SELECT sum(quantity) AS s FROM ice_evolving")
      .head().getLong(0) === 150L)
    intercept[Exception] {
      session.execute("SELECT sum(qty) FROM ice_evolving").head()
    }

    // drop + re-add through the live view: nulls, not resurrected values
    IcebergWriter.dropColumn(root, "quantity", 3000L)
    IcebergWriter.addColumn(root, "quantity", "long", 4000L)
    assert(session.execute(
      "SELECT count(*) AS n FROM ice_evolving WHERE quantity IS NOT NULL")
      .head().getLong(0) === 0L)
  }

  test("serving surfaces analysis errors eagerly (reference FlightError behavior)") {
    intercept[Exception] {
      session.serving.flightInfo("SELECT nope FROM does_not_exist")
    }
  }

  test("flightInfo returns the schema without executing; doGet streams batches") {
    import spark.implicits._
    session.registerTable("serve_t", (1 to 3000).toDF("v"))
    val schema = session.serving.flightInfo("SELECT v, v * 2 AS d FROM serve_t")
    assert(schema.fieldNames.toSeq === Seq("v", "d"))

    val (s2, batches) = session.serving.doGet("SELECT v FROM serve_t ORDER BY v")
    assert(s2.fieldNames.toSeq === Seq("v"))
    val collected = batches.toSeq
    assert(collected.forall(_.size <= 1024)) // reference batch granularity
    assert(collected.map(_.size).sum === 3000)
    assert(collected.flatten.map(_.getInt(0)).take(3) === Seq(1, 2, 3))
  }
}
