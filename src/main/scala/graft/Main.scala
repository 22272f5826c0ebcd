package graft

import graft.engine.GraftSession
import graft.queries.QueryUtil

/** CLI entry point mirroring the reference's `igloo --sql "…"`
  * (crates/igloo/src/main.rs:22-46): build a session, register the demo
  * catalog, run the SQL, pretty-print.
  *
  * Usage: runMain graft.Main --sql "SELECT …" [--dir /root/testdata/sf0.001]
  *        runMain graft.Main --explain "SELECT …" [--dir …]  # formatted plan
  *        runMain graft.Main --serve 50051 [--token s3cret] [--dir …]  # serving endpoint
  *        runMain graft.Main --connect 15002 [--dir …]  # Spark Connect gRPC endpoint
  *        runMain graft.Main --maintain /path/to/iceberg [--retain-ms 604800000]  # nightly table job
  *        runMain graft.Main --describe /path/to/iceberg  # table card + manifest gauge
  *        runMain graft.Main --advise "SELECT …" [--dir …]  # MV advisor: what to materialize
  *        runMain graft.Main --mv-refresh <name>            # refresh an advisor MV to its source head
  *        runMain graft.Main --mv-maintain all              # refresh every stale advisor MV in the catalog
  *        runMain graft.Main --store-describe "<kind> <root>"   # store maintenance-pressure gauge
  *        runMain graft.Main --store-compact "<kind> <root> [nFiles]"  # fold a store's segment history
  *        runMain graft.Main --catalog-load <file> --mv-maintain all --catalog-save <file>
  *            # the restartable maintainer loop: resume saved cursors, apply missed churn, re-snapshot
  *        runMain graft.Main --store-autopilot <threshold|default>  # compact registered stores above the segment threshold
  *        runMain graft.Main --analyze <table-path>         # harvest row count + HLL NDV statistics (auto-arms the optimizer)
  * Tables registered: the TESTDATA fixtures (region…embeddings) plus the
  * reference's demo `users` table (crates/igloo/src/main.rs:59-77).
  * `--serve` starts the Flight-analogue TCP server (engine.ServingServer)
  * on the given port and blocks — the reference coordinator's role
  * (crates/coordinator/src/main.rs:66-77, serving on :50051).
  */
object Main {

  private val FixtureTables = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  /** AUTOSAVE defaulting for the sweep verbs (round 18): a maintainer
    * that LOADED a durable catalog saves back to it post-sweep even
    * without an explicit `--catalog-save` — the crash window between
    * sweep and save is exactly what the stores' prefix-skip machinery
    * absorbs, but shrinking it is free. An explicit `--catalog-save`
    * (possibly to a different path) still wins. Only the sweep verbs
    * default this way — a bare `--catalog-load` inspection stays
    * read-only.
    */
  private def withAutosave(opts: Map[String, String]): Map[String, String] =
    if (opts.contains("catalog-save") || !opts.contains("catalog-load")) opts
    else opts + ("catalog-save" -> opts("catalog-load"))

  /** `--catalog-save <path>` handler, shared by the standalone verb and
    * the post-sweep save of the composed maintainer invocation.
    */
  private def saveCatalogIfAsked(
      opts: Map[String, String],
      spark: org.apache.spark.sql.SparkSession): Unit =
    opts.get("catalog-save").foreach { p =>
      // under the configured maintenance lease (see MaintenanceLease):
      // a snapshot raced by a concurrent sweep could persist
      // half-advanced cursors
      scala.util.Try(graft.operators.MaintenanceLease
        .withConfigured(spark)(graft.plans.CatalogPersistence.save(p))) match {
        case scala.util.Success(_) =>
          println(s"[catalog-save] $p: " +
            s"${graft.plans.MvCatalog.describe().size} MV defs, " +
            s"${graft.operators.StoreCatalog.describe().size} store defs")
        case scala.util.Failure(e) =>
          println("[catalog-save] refused: " +
            Option(e.getMessage).getOrElse(e.toString))
      }
    }

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val sql = opts.getOrElse(
      "sql",
      "SELECT 42 as answer, 'Hello Igloo' as greeting" // reference main.rs:43
    )
    val dir = opts.getOrElse("dir", "/root/testdata/sf0.001")

    val session = GraftSession.local(appName = "graft-cli")
    val spark = session.spark

    // demo users table (reference crates/igloo/src/main.rs:64-77)
    import spark.implicits._
    session.registerTable(
      "users",
      Seq((1, "Alice"), (2, "Bob"), (3, "Charlie"), (4, "Diana"), (5, "Eve"))
        .toDF("id", "name")
    )
    FixtureTables.foreach { t =>
      val p = new java.io.File(s"$dir/$t.parquet")
      if (p.exists()) session.registerTable(t, QueryUtil.t(spark, dir, t))
    }

    // durable-catalog reload runs FIRST: a fresh CLI JVM's registries can
    // ONLY be populated this way, so every verb that consults them —
    // --serve's wire actions, --mv-refresh by name, --mv-maintain,
    // --store-autopilot — must see the loaded state, not dispatch
    // against an empty registry and then have the load run too late
    opts.get("catalog-load").foreach { p =>
      scala.util.Try(graft.plans.CatalogPersistence.load(p)) match {
        case scala.util.Success(rows) =>
          rows.foreach { r =>
            val verdict =
              if (r.loaded) "loaded"
              else s"skipped: ${r.reason.getOrElse("?")}"
            println(s"[catalog-load] ${r.name} (${r.kind}) $verdict")
          }
        case scala.util.Failure(e) =>
          println("[catalog-load] refused: " +
            Option(e.getMessage).getOrElse(e.toString))
          spark.stop()
          return
      }
    }

    opts.get("connect") match {
      case Some(portStr) =>
        // wire-standard remote path: stock Spark Connect clients (JVM,
        // PySpark remote(), Connect JDBC) query the fixture catalog and
        // the published q1_agg view over gRPC
        graft.engine.ConnectEndpoint.registerShared(
          spark, dir, FixtureTables,
          views = Map(
            "q1_agg" -> graft.queries.Registry.byName("q1_agg").fn(spark, dir)))
        val bound = graft.engine.ConnectEndpoint.start(spark, portStr.toInt)
        System.err.println(
          s"[graft] spark-connect endpoint on sc://localhost:$bound " +
            "(tables: fixtures by name; views: global_temp.q1_agg)")
        Thread.currentThread().join()
      case None => ()
    }
    opts.get("serve") match {
      case Some(portStr) =>
        // --token <secret> gates every verb behind HANDSHAKE (Flight auth)
        val srv = new graft.engine.ServingServer(session, portStr.toInt,
          authToken = opts.get("token")).start()
        System.err.println(s"[graft] serving on 127.0.0.1:${srv.boundPort}" +
          opts.get("token").map(_ => " (token auth)").getOrElse(""))
        Thread.currentThread().join() // block until killed, like the reference
      case None =>
        opts.get("describe") match {
          case Some(tablePath) =>
            // the table card + per-manifest gauge an operator checks
            // before deciding maintenance is due
            graft.sources.IcebergMetaTables.describe(spark, tablePath)
              .show(truncate = false)
            graft.sources.IcebergMetaTables.manifests(spark, tablePath)
              .show(truncate = false)
            spark.stop()
            return
          case None => ()
        }
        opts.get("maintain") match {
          case Some(tablePath) =>
            // the nightly-job entry point: compact on delete pressure,
            // expire history past --retain-ms (optional), consolidate
            // manifests on metadata pressure — then print the report
            val cutoff = opts.get("retain-ms")
              .map(ms => System.currentTimeMillis() - ms.toLong)
            val r = graft.sources.IcebergMaintenance.maintain(
              spark, tablePath, System.currentTimeMillis(),
              expireOlderThanMs = cutoff)
            println(s"[maintain] deleteFiles=${r.deleteFiles} " +
              s"deleteRows=${r.deleteRows} dataFiles=${r.dataFiles} " +
              s"compacted=${r.compacted.getOrElse("-")} " +
              s"expired=${r.expired.mkString(",")} " +
              s"manifestsRewritten=${r.manifestsRewritten.getOrElse("-")}")
            spark.stop()
            return
          case None => ()
        }
        opts.get("advise") match {
          case Some(asql) =>
            // the MV advisor: what would pay off for this query — the
            // serving action's CLI face (reports only, builds nothing)
            val df = session.execute(asql)
            val shapes = graft.plans.MvAdvisor.analyze(df)
            graft.plans.MvAdvisor.recommend(shapes.flatMap(_.toOption))
              .foreach { r =>
                println(s"[advise] ${r.kind} on ${r.basePath} keys=" +
                  s"${r.keys.mkString(",")} sums=${r.sums.mkString(",")} " +
                  s"counts=${r.counts.mkString(",")} " +
                  s"mins=${r.mins.mkString(",")} maxs=${r.maxs.mkString(",")}")
              }
            graft.plans.MvAdvisor
              .recommendJoins(graft.plans.MvAdvisor.analyzeJoins(df)
                .flatMap(_.toOption))
              .foreach { r =>
                println(s"[advise] join view ${r.factPath} ⋈ ${r.dimPath} " +
                  s"on ${r.joinKeys.map { case (f, d) => s"$f=$d" }
                    .mkString(",")} columns=${r.columns.map(_._1).mkString(",")}")
              }
            graft.plans.MvAdvisor
              .recommendIndexes(graft.plans.MvAdvisor.analyzeAnn(df))
              .foreach { r =>
                println(s"[advise] ivf index on ${r.basePath} " +
                  s"embedding=${r.embCol} (${r.storeName})")
              }
            graft.plans.MvAdvisor
              .recommendDedupIndexes(graft.plans.MvAdvisor.analyzeDedup(df))
              .foreach { r =>
                println(s"[advise] minhash index on ${r.basePath} " +
                  s"text=${r.textCol} (${r.storeName})")
              }
            (shapes ++ graft.plans.MvAdvisor.analyzeJoins(df))
              .collect { case scala.util.Left(j) => j.reason }
              .foreach(reason => println(s"[advise] rejected: $reason"))
            spark.stop()
            return
          case None => ()
        }
        opts.get("mv-refresh") match {
          case Some(name) =>
            // the advisor-lifecycle refresh, CLI face (the serving
            // action's twin): bring a registered advisor MV — rollup,
            // multiplicity, or join view — to its source head via the
            // churn-scoped step
            graft.plans.MvCatalog.find(name) match {
              case Some(d) =>
                graft.plans.MvAdvisor.fromDef(d) match {
                  case None =>
                    println(s"[mv-refresh] '$name' is not an advisor-built MV")
                  case Some(rec) =>
                    rec.refreshStep(spark, graft.plans.MvAdvisor.mvRootOf(d)) match {
                      case Some(snap) =>
                        println(s"[mv-refresh] $name refreshed to snapshot $snap")
                      case None =>
                        println(s"[mv-refresh] $name already current")
                    }
                }
              case None =>
                graft.plans.MvCatalog.findJoin(name) match {
                  case None =>
                    println(s"[mv-refresh] no registered MV named '$name'")
                  case Some(d) =>
                    graft.plans.MvAdvisor.fromJoinDef(spark, d) match {
                      case None => println(
                        s"[mv-refresh] '$name' is not an advisor-built MV")
                      case Some(rec) =>
                        rec.refreshStep(
                          spark, graft.plans.MvAdvisor.joinMvRootOf(d)) match {
                          case Some((f, dm)) => println(
                            s"[mv-refresh] $name refreshed to fact=$f dim=$dm")
                          case None =>
                            println(s"[mv-refresh] $name already current")
                        }
                    }
                }
            }
            spark.stop()
            return
          case None => ()
        }
        opts.get("mv-maintain") match {
          case Some(_) =>
            // the catalog-wide sweep, CLI face: one line per registered
            // view/store — refreshed-to cursors, already-current, or the
            // skip reason (hand-declared / no lineage / per-entry error)
            val results = graft.plans.MvAdvisor.maintainAll(spark)
            if (results.isEmpty) println("[mv-maintain] no registered MVs")
            results.foreach { r =>
              val verdict = r.skipped match {
                case Some(reason)    => s"skipped: $reason"
                case None if r.stale =>
                  s"refreshed to ${r.appliedSnapshot.getOrElse("?")}" +
                    r.appliedDimSnapshot.map(d => s" dim=$d").getOrElse("")
                case None            => "already current"
              }
              println(s"[mv-maintain] ${r.name} (${r.kind}) $verdict")
            }
            saveCatalogIfAsked(withAutosave(opts), spark)
            spark.stop()
            return
          case None => ()
        }
        opts.get("store-describe") match {
          case Some(kr) =>
            // the stores' pressure gauge, CLI face (quote the argument:
            // "--store-describe 'split /path/store'") — the SAME
            // dispatch + validations as the serving action, so a
            // typo'd path refuses instead of printing a healthy-looking
            // zero
            val p = kr.trim.split("\\s+")
            if (p.length != 2)
              println("[store-describe] usage: <kind> <root>")
            else scala.util.Try(graft.operators.StoreMaintenance
              .describe(spark, p(0), p(1))) match {
              case scala.util.Success(g) =>
                println(s"[store-describe] ${g.kind} ${g.root}" +
                  g.version.map(v => s" version=$v").getOrElse("") +
                  s" segments=${g.segments}" +
                  g.tombstones.map(t => s" tombstones=$t").getOrElse("") +
                  g.registered.map(n => s" registered=$n").getOrElse("") +
                  g.watermark.map(w => s" watermark=$w").getOrElse("") +
                  g.head.map(h => s" head=$h").getOrElse("") +
                  g.fresh.map(f => s" fresh=$f").getOrElse("") +
                  g.detail.map(d => s" $d").getOrElse(""))
              case scala.util.Failure(e) =>
                println(s"[store-describe] refused: " +
                  Option(e.getMessage).getOrElse(e.toString))
            }
            spark.stop()
            return
          case None => ()
        }
        opts.get("store-compact") match {
          case Some(kr) =>
            // offline store compaction, CLI face — same dispatch,
            // validations and single-writer contract as the serving
            // action (incl. refusing an nFiles the ivf compact would
            // silently drop)
            val p = kr.trim.split("\\s+")
            val nFiles: Option[Int] =
              if (p.length == 3) p(2).toIntOption else None
            if (p.length < 2 || p.length > 3 ||
                (p.length == 3 && nFiles.isEmpty))
              println("[store-compact] usage: <kind> <root> [nFiles]")
            else scala.util.Try(graft.operators.StoreMaintenance
              .compact(spark, p(0), p(1), nFiles)) match {
              case scala.util.Success(info) =>
                println(s"[store-compact] ${p(0)} ${p(1)} compacted: $info")
              case scala.util.Failure(e) =>
                println(s"[store-compact] refused: " +
                  Option(e.getMessage).getOrElse(e.toString))
            }
            spark.stop()
            return
          case None => ()
        }
        opts.get("store-autopilot") match {
          case Some(t) =>
            // the registered-store compaction autopilot, CLI face:
            // "--store-autopilot 8" (or "default") — one line per
            // registered store, compacting those above the threshold
            val threshold =
              if (t == "default") 8
              else t.toIntOption.getOrElse(-1)
            if (threshold <= 0)
              println("[store-autopilot] usage: <threshold|default>")
            else {
              val rows = graft.operators.StoreMaintenance
                .autopilot(spark, threshold)
              if (rows.isEmpty)
                println("[store-autopilot] no registered stores")
              rows.foreach { r =>
                val verdict = r.skipped match {
                  case Some(reason) => s"skipped: $reason"
                  case None if r.compacted =>
                    s"compacted ${r.segmentsBefore.getOrElse(-1)} -> " +
                      s"${r.segmentsAfter.getOrElse(-1)} segments"
                  case None =>
                    s"ok (${r.segmentsBefore.getOrElse(-1)} segments)"
                }
                println(s"[store-autopilot] ${r.name} (${r.kind}) $verdict")
              }
            }
            saveCatalogIfAsked(withAutosave(opts), spark)
            spark.stop()
            return
          case None => ()
        }
        opts.get("analyze") match {
          case Some(spec) =>
            // table-statistics harvest, CLI face (r19): one pass = row
            // count + mergeable per-column HLL NDV sketches into the
            // stats catalog — auto-arms the eager-aggregation rewrite,
            // feeds the advisor cost model, rides --catalog-save.
            // r20: whitespace-separated comma-lists after the path are
            // JOINT combos ("--analyze /t k,k2" sketches the (k,k2)
            // tuple NDV — the correlated-grain fix)
            val parts = spec.trim.split("\\s+").toSeq
            val path = parts.head
            val combos = parts.tail.map(_.split(',').toSeq.filter(_.nonEmpty))
              .filter(_.nonEmpty)
            scala.util.Try(
              graft.plans.StatsCatalog.analyze(spark, path,
                combos = combos)) match {
              case scala.util.Success(st) =>
                println(s"[analyze] ${st.path}: rows=${st.rows}")
                st.cols.toSeq.sortBy(_._1).foreach { case (c, cs) =>
                  println(f"[analyze]   $c%-24s ndv=${cs.ndv}")
                }
                st.combos.toSeq.sortBy(_._1).foreach { case (c, cs) =>
                  println(f"[analyze]   ${s"($c)"}%-24s joint-ndv=${cs.ndv}")
                }
              case scala.util.Failure(e) =>
                println("[analyze] refused: " +
                  Option(e.getMessage).getOrElse(e.toString))
            }
            saveCatalogIfAsked(withAutosave(opts), spark)
            spark.stop()
            return
          case None => ()
        }
        if (opts.contains("catalog-save") || opts.contains("catalog-load")) {
          // catalog-only invocation (no verb consumed the run above):
          // snapshot/report and exit instead of falling through to the
          // default SQL query
          saveCatalogIfAsked(opts, spark)
          spark.stop()
          return
        }
        opts.get("explain") match {
          case Some(esql) =>
            // the plan-inspection loop every perf-minded user needs:
            // pushed filters, read schemas, exchanges, codegen spans
            println(
              session
                .execute(esql)
                .queryExecution
                .explainString(org.apache.spark.sql.execution.FormattedMode))
          case None =>
            session.execute(sql).show(100, truncate = false)
        }
        spark.stop()
    }
  }
}
