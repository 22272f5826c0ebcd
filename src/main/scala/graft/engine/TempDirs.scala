package graft.engine

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Registry of per-process temp workspaces (fixture copies, materialized
  * indexes, bucketed tables). The PID-keyed paths that keep concurrent
  * JVMs from racing each other would otherwise accumulate one directory
  * per process in java.io.tmpdir across bench/verify/test runs — register
  * them here and a shutdown hook deletes them best-effort on JVM exit.
  */
object TempDirs {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(
      () => registered.forEach(deleteRecursively),
      "graft-tempdir-cleanup"
    ))

  /** Register a directory for deletion at JVM exit; returns it. */
  def register(p: Path): Path = {
    hookInstalled
    registered.add(p)
    p
  }

  /** The canonical per-process fixture-workspace path — one place for the
    * `tmpdir/<family>/<name>-<dirHash>_p<PID>` idiom every materialize-once
    * site (bucketed tables, DPP layout, MinHash index, iceberg copy) was
    * hand-rolling: keyed by the SOURCE dir so different fixtures never
    * collide, PID-keyed so concurrent JVMs never race each other's
    * check-then-write, registered here so it is cleaned up at exit.
    */
  def workspace(family: String, name: String, sourceDir: String): Path =
    register(java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      family,
      s"$name-${Integer.toHexString(sourceDir.hashCode)}" +
        s"_p${ProcessHandle.current().pid()}"
    ))

  private val materializeMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Process-local single-flight for check-then-materialize fixture sites.
    * The PID-keyed [[workspace]] paths already keep concurrent JVMs apart;
    * this closes the remaining window where two THREADS of one process
    * (parallel suites, concurrent queries) both miss the ready check and
    * materialize into the same root concurrently. Same discipline
    * ResultCache applies to query builds.
    */
  def materializeOnce(root: Path)(ready: => Boolean)(build: => Unit): Unit = {
    val monitor =
      materializeMonitors.computeIfAbsent(root.toString, _ => new Object)
    monitor.synchronized { if (!ready) build }
  }

  private def deleteRecursively(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try
          walk
            .sorted(Comparator.reverseOrder())
            .forEach(f => try Files.delete(f) catch { case _: Throwable => () })
        finally walk.close()
      }
    } catch { case _: Throwable => () } // best-effort: exit must not fail
}
