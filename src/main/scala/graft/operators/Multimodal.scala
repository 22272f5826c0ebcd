package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed media payload metadata carried next to the opaque bytes. */
final case class MediaMeta(format: String, width: Int, height: Int, channels: Int)

/** Multimodal row convention: media travels as an opaque binary column plus
  * typed metadata; large payloads can alternatively stay at `uri` with
  * `media = null` (lazy fetch at decode time).
  */
final case class MediaRecord(
    id: Long,
    uri: String,
    media: Array[Byte],
    meta: MediaMeta
)

/** Decoded per-item features (what a real pipeline would feed a model). */
final case class MediaFeatures(
    id: Long,
    nBytes: Long,
    digest: String,
    histogram: Array[Long], // 16-bin byte histogram ("pixel stats")
    brightness: Double // mean byte value ("luma")
)

/** Multimodal column plumbing (SURVEY.md §2.C): schema, partitioning, and
  * the batched decode/feature-extract shape — all real Spark; only the
  * codec itself is STUBBED (no image/audio libraries exist in this
  * environment). `decodeStub` stands in for e.g. an ImageIO/ffmpeg call
  * and computes deterministic byte-level features instead, so the
  * distributed plumbing is fully testable.
  *
  * Scale notes: decode is CPU-bound per item and must never serialize a
  * codec per row — mapPartitions amortizes setup (one "codec" per
  * partition, items processed in batches). Media blobs make rows fat:
  * repartition so partitions stay in the 100-500 MB range
  * (`spark.sql.files.maxPartitionBytes` governs the scan side; an explicit
  * `repartition(n)` after filters governs the decode stage).
  */
object Multimodal {

  /** Build a MediaRecord dataset from the `documents` fixture: the UTF-8
    * bytes act as the opaque payload, metadata is derived deterministically.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs
      .select(
        $"doc_id".cast("long").as("id"),
        concat(lit("mem://documents/"), $"doc_id").as("uri"),
        encode($"text", "UTF-8").as("media"),
        struct(
          lit("text/utf-8").as("format"),
          length($"text").cast("int").as("width"),
          lit(1).as("height"),
          lit(1).as("channels")
        ).as("meta")
      )
      .as[MediaRecord]
  }

  /** STUB of the real codec call. A production build would decode
    * `rec.media` with an actual image/audio library here; this environment
    * ships none, so the "decode" is a deterministic byte-level feature
    * extraction with the same signature and cost shape (touches every
    * byte once, allocates one small output per item).
    */
  def decodeStub(digest: MessageDigest, rec: MediaRecord): MediaFeatures = {
    val bytes = if (rec.media == null) Array.emptyByteArray else rec.media
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      hist(b >> 4) += 1
      sum += b
      i += 1
    }
    digest.reset()
    val hex = digest.digest(bytes).map("%02x".format(_)).mkString
    MediaFeatures(
      id = rec.id,
      nBytes = bytes.length.toLong,
      digest = hex,
      histogram = hist,
      brightness = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
    )
  }

  /** Batched distributed decode: one codec ("digest" here) per partition,
    * items streamed through in `batchSize` groups — the exact shape a real
    * decoder needs (batch inference, bounded memory), with no collect and
    * no per-row setup.
    */
  def extractFeatures(
      ds: Dataset[MediaRecord],
      batchSize: Int = 64
  ): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = MessageDigest.getInstance("SHA-256") // per-partition setup
      it.grouped(batchSize).flatMap { batch =>
        batch.map(rec => decodeStub(codec, rec))
      }
    }
  }
}
