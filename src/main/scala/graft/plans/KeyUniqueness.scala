package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** EXACT single-column key-uniqueness facts, freshness-checked by file
  * fingerprint — the proof obligation [[UnscaledDecimalSums]] needs to
  * carry its overflow bound through an inner equi-join: when the dim
  * side's join key is unique (each value appears at most once), every
  * fact row matches at most one dim row, so join output rows <= fact
  * rows and the footer-row proof applies unchanged.
  *
  * Why not [[StatsCatalog]]'s NDVs: those are HLL ESTIMATES (~2% error)
  * — fine for cost decisions, unusable for an exactness proof. A key
  * that is 98%-probably-unique could silently multiply rows past the
  * proven overflow bound. This registry stores the answer of an EXACT
  * `count(col) == count_distinct(col)` pass (uniqueness among non-null
  * values; null dim keys never match an inner equi-join, so they cannot
  * add multiplicity).
  *
  * Freshness: entries are keyed by the fingerprint of the EXACT file set
  * (sorted path:length:modTime lines) the harvest ran over — the same
  * identity the footer-stats cache uses. At proof time the consumer
  * recomputes the relation's current fingerprint (metadata-only, one
  * getFileStatus per file, files capped at 64 like footerStats); any
  * rewrite/append/compaction changes the fingerprint and the stale entry
  * simply never matches again. The registry is therefore safe to keep
  * GLOBAL (like the footer cache): an entry is a fact about one
  * immutable file set, it can only enable an exact rewrite, never change
  * a result.
  *
  * Cost model: [[ensure]] is one aggregation job per NEW (file set,
  * columns) pair — the ANALYZE-style metadata pass a production system
  * gets from declared primary keys — memoized per JVM so repeated query
  * builds (bench reps, Verify) pay file stats only.
  */
object KeyUniqueness {

  /** unique/dup are lower-cased column names; dup memoizes
    * checked-but-not-unique so a repeat ensure never re-runs the job.
    */
  private final case class Entry(unique: Set[String], dup: Set[String])

  // fingerprint -> facts; bounded like the footer cache (entries for
  // replaced file sets are permanently dead)
  private val reg = new ConcurrentHashMap[String, Entry]()
  private val MaxEntries = 4096

  private[plans] def clear(): Unit = reg.clear()

  /** One data file's fingerprint line: scheme-less path + length +
    * modTime — the SAME normalization whether the file arrives from a
    * directory listing ([[ensure]]) or a relation's inputFiles
    * ([[provenUnique]]), so the two sides can never disagree on
    * identical file sets.
    */
  private def line(p: org.apache.hadoop.fs.Path, len: Long, mtime: Long) =
    s"${p.toUri.getPath}:$len:$mtime"

  /** Metadata-only identity of an exact file set from relation
    * inputFiles; None = unprovable (no files, too many, or stat failed).
    */
  private def fingerprint(
      spark: SparkSession, files: Seq[String]): Option[String] =
    try {
      if (files.isEmpty || files.length > 64) return None
      val conf = spark.sessionState.newHadoopConf()
      Some(files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val st = p.getFileSystem(conf).getFileStatus(p)
        line(st.getPath, st.getLen, st.getModificationTime)
      }.sorted.mkString("\n"))
    } catch { case NonFatal(_) => None }

  /** Same identity from a recursive listing of `path` (file or
    * directory), skipping hidden/_-prefixed names like Spark's own file
    * index — lets [[ensure]]'s memo check run WITHOUT building a
    * DataFrame (a `spark.read.parquet` schema inference can itself
    * launch a job, which would charge every memoized re-build one job).
    */
  private def fingerprintOfPath(
      spark: SparkSession, path: String): Option[String] =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p)
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      if (st.isDirectory) {
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val f = it.next()
          val n = f.getPath.getName
          if (!n.startsWith("_") && !n.startsWith("."))
            lines += line(f.getPath, f.getLen, f.getModificationTime)
        }
      } else lines += line(st.getPath, st.getLen, st.getModificationTime)
      if (lines.isEmpty || lines.length > 64) None
      else Some(lines.sorted.mkString("\n"))
    } catch { case NonFatal(_) => None }

  /** Harvest exact uniqueness for `cols` of the parquet table at `path`
    * (memoized per exact file set — a bench rep or Verify re-build after
    * the first pays ONLY the metadata listing, zero jobs). Failures are
    * silently absorbed: a missing proof just leaves the exact decimal
    * path in place.
    */
  def ensure(spark: SparkSession, path: String, cols: Seq[String]): Unit =
    try {
      val fp = fingerprintOfPath(spark, path).getOrElse(return)
      val have = Option(reg.get(fp)).getOrElse(Entry(Set.empty, Set.empty))
      val want = cols.map(_.toLowerCase).toSet -- have.unique -- have.dup
      if (want.isEmpty) return
      val df = spark.read.parquet(path)
      val present = df.schema.fieldNames.map(_.toLowerCase).toSet
      val check = want.filter(present).toSeq.sorted
      if (check.isEmpty) return
      // one job: non-null count and exact distinct count per candidate
      val aggs = check.flatMap(c =>
        Seq(count(col(c)).as(s"_n_$c"), countDistinct(col(c)).as(s"_d_$c")))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      val uniq = check.zipWithIndex.collect {
        case (c, i) if row.getLong(2 * i) == row.getLong(2 * i + 1) => c
      }.toSet
      if (reg.size > MaxEntries) reg.clear()
      reg.compute(fp, (_, cur) => {
        val c = Option(cur).getOrElse(Entry(Set.empty, Set.empty))
        Entry(c.unique ++ uniq, c.dup ++ (check.toSet -- uniq))
      }): Unit
    } catch { case NonFatal(_) => () }

  /** Is `a` a PROVEN-unique base column of this parquet relation, with
    * the proof's file set identical to the relation's current one?
    * Metadata-only; any failure answers false (decline).
    */
  private[plans] def provenUnique(
      spark: SparkSession, rel: LogicalRelation, a: Attribute): Boolean =
    try {
      if (reg.isEmpty) return false
      val fs = rel.relation.asInstanceOf[HadoopFsRelation]
      fingerprint(spark, fs.location.inputFiles.toSeq)
        .flatMap(fp => Option(reg.get(fp)))
        .exists(_.unique.contains(a.name.toLowerCase))
    } catch { case NonFatal(_) => false }
}
