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

  /** One corpus pass -> written index. */
  def materialize(doc: DataFrame, root: String): StoredIndex = {
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
    * directory into `nFiles` coalesced files, dropping exact-duplicate
    * rows (which also heals any at-least-once replay leftovers —
    * duplicates carry no information here, rows are set members).
    *
    * Contract: quiesce writers AND readers first. A raw parquet directory
    * has no transaction log, so no rewrite of it can be atomic for
    * concurrent scans — that is precisely what layering the index on a
    * transactional table format buys at 100 TB; this utility is the
    * single-writer maintenance window version. Paths go through Hadoop's
    * FileSystem (works on hdfs/s3/local alike), and a crash between the
    * delete and the rename is recovered on the next call (the completed
    * `.compact` temp is promoted before anything else runs).
    */
  def compact(spark: SparkSession, index: StoredIndex, nFiles: Int = 8): Unit = {
    require(nFiles > 0)
    val hconf = spark.sparkContext.hadoopConfiguration
    Seq(index.bandsPath, index.shinglesPath).foreach { dir =>
      val p = new org.apache.hadoop.fs.Path(dir)
      val tmp = new org.apache.hadoop.fs.Path(dir + ".compact")
      val fs = p.getFileSystem(hconf)
      if (!fs.exists(p) && fs.exists(tmp)) {
        // previous compact died between delete and rename: promote the
        // fully-written temp (writes below always complete before the
        // live dir is touched, so the temp is whole if the dir is gone)
        require(fs.rename(tmp, p), s"crash recovery failed for $dir")
      } else {
        spark.read.parquet(dir).distinct().coalesce(nFiles)
          .write.mode("overwrite").parquet(tmp.toString)
        require(fs.delete(p, true), s"could not remove old layout at $dir")
        require(fs.rename(tmp, p), s"could not promote compacted $dir")
      }
    }
  }
}
