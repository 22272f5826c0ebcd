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

  /** One corpus pass -> written index. The shingle sets are persisted so
    * tokenization runs once while feeding both the `shingles/` write and
    * the signature/band write.
    */
  def materialize(doc: DataFrame, root: String): StoredIndex = {
    val sets = shingleSets(doc).persist()
    try {
      sets.write.mode("overwrite").parquet(s"$root/shingles")
      bandDigests(signatures(sets)).write.mode("overwrite").parquet(s"$root/bands")
    } finally sets.unpersist(blocking = false)
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
    * ingest should compact the index directories on its maintenance
    * cadence like any other append-mostly table (small-file pressure is
    * the usual one-file-per-batch kind, not a correctness concern — the
    * readers are plain directory scans).
    */
  def append(doc: DataFrame, index: StoredIndex): Unit = {
    val sets = shingleSets(doc).persist()
    try {
      sets.write.mode("append").parquet(index.shinglesPath)
      bandDigests(signatures(sets)).write.mode("append").parquet(index.bandsPath)
    } finally sets.unpersist(blocking = false)
  }

  /** The maintenance pass for an append-mostly index: rewrite each
    * directory into `nFiles` coalesced files (write-to-temp, swap, drop —
    * a reader mid-compaction sees either the old or the new layout, never
    * a partial one, because the swap is two directory renames). Run on
    * the same cadence as any other small-file compaction; contents are
    * byte-identical rows, so no oracle or dedup result can change.
    */
  def compact(spark: SparkSession, index: StoredIndex, nFiles: Int = 8): Unit = {
    require(nFiles > 0)
    Seq(index.bandsPath, index.shinglesPath).foreach { dir =>
      val tmp = dir + ".compact"
      val old = dir + ".old"
      spark.read.parquet(dir).coalesce(nFiles)
        .write.mode("overwrite").parquet(tmp)
      val fs = new java.io.File(dir)
      require(fs.renameTo(new java.io.File(old)), s"swap failed for $dir")
      require(new java.io.File(tmp).renameTo(fs), s"swap failed for $tmp")
      graft.engine.TempDirs.register(java.nio.file.Paths.get(old))
      // best-effort immediate cleanup; the TempDirs hook covers failures
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(old))
    }
  }
}
