package graft.operators

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
  *      index — a scan of `bands/`, zero corpus shuffle, and
  *   3. verifies candidates against the stored shingle sets.
  * Without the store, step 2's left side would re-tokenize, re-hash and
  * re-band the whole corpus per increment — the exact cost the index
  * amortizes to once (the IVF index in [[IvfIndex.materialize]] makes the
  * same trade for ANN probes).
  *
  * Layout under `root`:
  *   `bands/`    (doc_id, band, digest) — the LSH join side
  *   `shingles/` (doc_id, sh)           — candidate verification sets
  */
object MinHashIndex {

  final case class StoredIndex(root: String) {
    def bandsPath: String = s"$root/bands"
    def shinglesPath: String = s"$root/shingles"
  }

  /** Per-doc distinct word-3gram shingle sets — the canonical first pass
    * every MinHash/Jaccard operator shares (docs shorter than 3 tokens
    * have no shingles and drop out).
    */
  def shingleSets(doc: DataFrame): DataFrame =
    doc
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), TextOps.shingles(col("ws")).as("sh"))

  /** 64-minhash signatures from shingle sets: hash each shingle once, then
    * one native one-pass walk (functions.MinHashSignature) for all minima.
    */
  def signatures(sets: DataFrame): DataFrame =
    sets
      .select(col("doc_id"), transform(col("sh"), x => xxhash64(x)).as("hs"))
      .select(col("doc_id"), TextOps.minhashSignatureArray(col("hs")).as("sig"))

  /** (doc_id, band, digest) rows — 16 bands x 4 rows per signature. */
  def bandDigests(sigs: DataFrame): DataFrame =
    sigs
      .select(col("doc_id"), explode(TextOps.bandStructsFromSig(col("sig"))).as("bd"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.digest").as("digest"))

  /** One pass over `doc` -> both index directories, shared by the initial
    * build and every append so the two write paths can never drift. The
    * shingle sets are persisted so tokenization runs once while feeding
    * both the `shingles/` write and the signature/band write.
    */
  private def writeIndex(doc: DataFrame, root: String, mode: String): Unit = {
    val sets = shingleSets(doc).persist()
    try {
      sets.write.mode(mode).parquet(s"$root/shingles")
      bandDigests(signatures(sets)).write.mode(mode).parquet(s"$root/bands")
    } finally sets.unpersist(blocking = false)
  }

  /** One corpus pass -> written index. Rebuilding at an existing root
    * clears `_folded/` replay markers and stale compaction temps first —
    * markers describe rows the overwrite is about to destroy, and a
    * survivor would make a later foldOnce silently skip a batch the new
    * index never saw.
    */
  def materialize(doc: DataFrame, root: String): StoredIndex = {
    val hconf = doc.sparkSession.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(hconf)
    Seq("_folded", "bands.compact", "shingles.compact", "bands.swap", "shingles.swap")
      .foreach(s => fs.delete(new org.apache.hadoop.fs.Path(rootPath, s), true))
    writeIndex(doc, root, "overwrite")
    StoredIndex(root)
  }

  def bands(spark: SparkSession, index: StoredIndex): DataFrame =
    spark.read.parquet(index.bandsPath)

  def shingles(spark: SparkSession, index: StoredIndex): DataFrame =
    spark.read.parquet(index.shinglesPath)

  /** Fold a new (accepted) batch into the stored index — the cross-batch
    * half of the ingest contract: after a batch is deduped and admitted,
    * appending its shingle sets + band digests makes every LATER batch
    * dedupe against it too. One parquet append per call; a long-running
    * ingest compacts on its maintenance cadence ([[compact]]).
    *
    * Plain append is AT-LEAST-ONCE under replay (a crashed driver can
    * re-run a batch): callers with replayable sources use [[foldOnce]],
    * which skips batches whose token is already recorded.
    */
  def append(doc: DataFrame, index: StoredIndex): Unit =
    writeIndex(doc, index.root, "append")

  /** Idempotent [[append]]: a marker under `_folded/` records each token
    * (e.g. a streaming batchId) AFTER its rows land, so a replayed batch
    * is skipped instead of folded twice. The crash window between append
    * and marker write still yields duplicate rows (exactly-once needs a
    * transactional table format underneath) — [[compact]]'s distinct
    * heals them, and `incrementalPairs` dedupes its output regardless.
    * Returns true when the batch was appended, false when skipped.
    */
  def foldOnce(doc: DataFrame, index: StoredIndex, token: String): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(s"${index.root}/_folded/$token")
    val fs = marker.getFileSystem(
      doc.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) false
    else {
      append(doc, index)
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
      true
    }
  }

  /** OFFLINE maintenance pass for the append-mostly index: rewrite each
    * directory into `nFiles` coalesced files. `dedupe = true` also drops
    * exact-duplicate rows — run it after a suspected foldOnce
    * append-then-crash window (duplicates carry no information here, rows
    * are set members); the default pass stays shuffle-free, since routine
    * small-file compaction shouldn't pay a full-index shuffle for a rare
    * crash artifact that `incrementalPairs` already masks at read time.
    *
    * Contract: quiesce writers AND readers first. A raw parquet directory
    * has no transaction log, so no rewrite of it can be atomic for
    * concurrent scans — that is precisely what layering the index on a
    * transactional table format buys at 100 TB; this utility is the
    * single-writer maintenance window version. Paths go through Hadoop's
    * FileSystem (hdfs/s3/local alike).
    *
    * Crash safety (any step, including repeated crashes): the swap is
    * guarded by a `<dir>.swap` marker created only AFTER the `.compact`
    * temp is fully written and removed only after the swap completes.
    * Recovery runs first on every call and promotes BY ADDITION, never
    * deletion: with no marker, a leftover temp is an incomplete write and
    * is discarded (the live dir was never touched); with a marker, the
    * temp's rows are APPENDED into the live dir (creating it if the crash
    * landed after the delete) and the temp dropped. Rows appended during
    * the down window therefore always survive. The price of loss-proof
    * recovery on a raw parquet dir: a crash in the marker window can
    * leave rows DUPLICATED (worst case the whole pre-compact dir, when
    * the crash hit between marker and delete). Duplicates here are
    * information-free — rows are set members, `incrementalPairs`
    * aggregates its output regardless — and one `dedupe = true` pass
    * heals them; exact once-only atomicity is what a transactional table
    * format underneath would buy.
    */
  def compact(
      spark: SparkSession,
      index: StoredIndex,
      nFiles: Int = 8,
      dedupe: Boolean = false
  ): Unit = {
    require(nFiles > 0)
    val hconf = spark.sparkContext.hadoopConfiguration
    Seq(index.bandsPath, index.shinglesPath).foreach { dir =>
      val p = new org.apache.hadoop.fs.Path(dir)
      val tmp = new org.apache.hadoop.fs.Path(dir + ".compact")
      val marker = new org.apache.hadoop.fs.Path(dir + ".swap")
      val fs = p.getFileSystem(hconf)
      recoverSwap(spark, fs, p, tmp, marker)
      val rows0 = spark.read.parquet(dir)
      (if (dedupe) rows0.distinct() else rows0)
        .coalesce(nFiles)
        .write.mode("overwrite").parquet(tmp.toString)
      fs.create(marker, true).close() // temp is complete: commit point
      require(fs.delete(p, true), s"could not remove old layout at $dir")
      require(fs.rename(tmp, p), s"could not promote compacted $dir")
      fs.delete(marker, false): Unit
    }
  }

  /** Put a directory back into a clean state after a compact crash (see
    * [[compact]]'s crash-safety notes). Addition-only: the pre-crash
    * snapshot is appended into the live dir rather than swapped over it,
    * so no crash point or down-window append interleaving can lose rows —
    * a repeated crash can only duplicate set members, which dedupe
    * compaction heals. Re-entrant at every step.
    */
  private def recoverSwap(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path,
      tmp: org.apache.hadoop.fs.Path,
      marker: org.apache.hadoop.fs.Path
  ): Unit = {
    if (!fs.exists(marker)) {
      // no swap in flight: a leftover temp is an incomplete (pre-marker)
      // write; the live dir was never touched, so just discard it
      if (fs.exists(tmp)) fs.delete(tmp, true): Unit
    } else {
      if (fs.exists(tmp)) {
        // the marker proves tmp was fully written; fold it back into the
        // live dir (created implicitly when the crash landed after the
        // delete). Append, never delete-and-rename: a crash inside this
        // append means the next attempt re-appends (duplicates, healable)
        // instead of choosing which directory's rows to discard.
        spark.read.parquet(tmp.toString)
          .write.mode("append").parquet(p.toString)
        fs.delete(tmp, true): Unit
      }
      fs.delete(marker, false): Unit
    }
  }
}
