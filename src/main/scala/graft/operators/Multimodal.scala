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

/** Decoded per-item features (what a real pipeline would feed a model).
  * For image payloads the histogram/brightness are over decoded LUMA
  * values and width/height/channels describe the decoded raster; for
  * non-image payloads they are byte-level stats and the dims are 0.
  */
final case class MediaFeatures(
    id: Long,
    nBytes: Long,
    digest: String,
    histogram: Array[Long], // 16-bin luma/byte histogram ("pixel stats")
    brightness: Double, // mean luma/byte value
    width: Int,
    height: Int,
    channels: Int
)

/** Multimodal column plumbing (SURVEY.md §2.C): schema, partitioning, and
  * the batched decode / feature-extract / resize / frame-sample shapes —
  * all real Spark. IMAGE decode and resize are REAL (JDK ImageIO +
  * Graphics2D), AUDIO decode is REAL for WAV/AIFF/AU
  * (javax.sound.sampled), and MJPEG video demux+decode is REAL
  * (marker-structure walk + ImageIO per frame) — no external libraries
  * needed for any of them. Only codec-less formats (mp3/opus/h264...)
  * fall back to a clearly-marked deterministic byte-level STUB
  * (`decodeStub`, `sampleFrames`' slice demux) with the same signature
  * and cost shape as the real call — the distributed plumbing around it
  * is identical and is what matters at scale.
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

  /** Stub codec for NON-IMAGE payloads (audio/video libraries don't exist
    * in this environment): a deterministic byte-level feature extraction
    * with the same signature and cost shape as a real decoder (touches
    * every byte once, allocates one small output per item).
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
      brightness = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
      width = 0,
      height = 0,
      channels = 0
    )
  }

  /** REAL image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP — no
    * external libraries needed): decodes the raster and computes a 16-bin
    * LUMA histogram + mean brightness (ITU-R BT.601 weights), exactly the
    * per-item stats an image-quality filter in a training pipeline keys
    * on. Undecodable bytes fall back to the byte-level stub (degraded,
    * never failing — one corrupt file must not kill a 100 TB stage).
    */
  def decodeImage(digest: MessageDigest, rec: MediaRecord): MediaFeatures = {
    val bytes = if (rec.media == null) Array.emptyByteArray else rec.media
    // decompression-bomb guard from the HEADER, before ImageIO.read
    // allocates the declared raster (see rasterUnsafe)
    val img =
      if (bytes.isEmpty || rasterUnsafe(bytes)) null
      else
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch {
          // JDK plugin decoders throw RuntimeExceptions (AIOOBE, IAE, ...)
          // on malformed input, not just IOException — catch them all or
          // one fuzzed file kills the stage
          case scala.util.control.NonFatal(_) => null
        }
    if (img == null)
      decodeStub(digest, rec)
    else {
      val w = img.getWidth
      val h = img.getHeight
      val (hist, sum) = lumaScan(img)
      digest.reset()
      val hex = digest.digest(bytes).map("%02x".format(_)).mkString
      MediaFeatures(
        id = rec.id,
        nBytes = bytes.length.toLong,
        digest = hex,
        histogram = hist,
        brightness = if (w * h == 0) 0.0 else sum / (w.toLong * h),
        width = w,
        height = h,
        channels = img.getRaster.getNumBands
      )
    }
  }

  /** One pass over a decoded raster: 16-bin luma histogram + luma sum
    * (ITU-R BT.601 weights) — shared by [[decodeImage]] and the per-frame
    * [[decodedLuma]] so a colorspace fix can never drift between them.
    */
  private def lumaScan(img: java.awt.image.BufferedImage): (Array[Long], Double) = {
    val w = img.getWidth
    val h = img.getHeight
    val hist = new Array[Long](16)
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        hist(math.min(15, (luma / 16.0).toInt)) += 1
        sum += luma
        x += 1
      }
      y += 1
    }
    (hist, sum)
  }

  /** Raster dimensions from the image HEADER — no pixel decode. This is
    * the decompression-bomb guard that actually guards: a crafted 200-byte
    * PNG can declare a multi-gigabyte raster, and `ImageIO.read` allocates
    * the whole thing before any post-decode size check could run. Reading
    * width/height off the stream header costs a few bytes and lets callers
    * refuse BEFORE the allocation. Returns null when no reader claims the
    * bytes or the header is unreadable.
    */
  private def headerDims(bytes: Array[Byte]): (Int, Int) =
    try {
      val iis = javax.imageio.ImageIO
        .createImageInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) null
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            (r.getWidth(0), r.getHeight(0))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => null }

  /** True when the declared raster is absent or too large to decode
    * safely (64M pixels ~= 256 MB of TYPE_INT_RGB per image).
    */
  private def rasterUnsafe(bytes: Array[Byte]): Boolean = {
    val dims = headerDims(bytes)
    dims == null || dims._1.toLong * dims._2 > 64000000L
  }

  /** REAL image resize via JDK Graphics2D (no external libraries): decode,
    * scale the longest side to `maxDim` preserving aspect (never upscale),
    * re-encode as PNG. The standard preprocessing step before a vision
    * encoder — and the honest cost model for it: decode + filtered blit +
    * re-encode per item. Undecodable or non-image payloads pass through
    * UNCHANGED (a corrupt file must not kill a 100 TB stage; downstream
    * sees the original bytes and its own decode fallback).
    */
  def resizeImage(rec: MediaRecord, maxDim: Int): MediaRecord = {
    val bytes = if (rec.media == null) Array.emptyByteArray else rec.media
    val img =
      if (bytes.isEmpty || rasterUnsafe(bytes)) null // refuse BEFORE decoding
      else
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || math.max(img.getWidth, img.getHeight) <= maxDim) rec
    else {
      val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
      val w = math.max(1, math.round(img.getWidth * scale).toInt)
      val h = math.max(1, math.round(img.getHeight * scale).toInt)
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", buf)
      MediaRecord(rec.id, rec.uri, buf.toByteArray,
        MediaMeta("image/png", w, h, 3))
    }
  }

  /** Distributed batched resize — same mapPartitions shape as
    * [[extractFeatures]]; only `image/<i>` payloads are touched.
    */
  def resizeAll(ds: Dataset[MediaRecord], maxDim: Int = 256): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { rec =>
      if (rec.meta != null && rec.meta.format != null &&
        rec.meta.format.startsWith("image/")) resizeImage(rec, maxDim)
      else rec
    })
  }

  /** Decoded per-item audio features (the audio twin of [[MediaFeatures]]:
    * what a speech/audio curation pipeline filters on — clipping via
    * `peak`, silence via `rms`, format sanity via rate/channels/duration).
    */
  final case class AudioFeatures(
      id: Long,
      nBytes: Long,
      digest: String,
      sampleRate: Int,
      channels: Int,
      nFrames: Long,
      durationSec: Double,
      rms: Double, // root-mean-square of normalized [-1,1] samples
      peak: Double // max |sample|
  )

  /** REAL audio decode for WAV/AIFF/AU via the JDK's javax.sound.sampled —
    * no external codec needed, same trick as ImageIO for images. Any PCM
    * variant the JDK can convert (8/16/24-bit, signed/unsigned, BE/LE) is
    * normalized to 16-bit signed little-endian before the stats pass.
    * Returns None when no reader claims the bytes or the header declares
    * an absurd frame count (the audio analogue of the raster bomb guard —
    * a WAV header can promise gigabytes the body never carries).
    */
  def decodeAudio(rec: MediaRecord): Option[AudioFeatures] = {
    val bytes = if (rec.media == null) Array.emptyByteArray else rec.media
    if (bytes.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        // bomb guard from the HEADER: frames x channels x 2B, capped 256MB
        if (ais.getFrameLength > 0 &&
          ais.getFrameLength * fmt.getChannels > 128000000L) return None
        val target = new javax.sound.sampled.AudioFormat(
          fmt.getSampleRate, 16, fmt.getChannels, true, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
        try {
          val data = pcm.readAllBytes()
          val n = data.length / 2
          var sumSq = 0.0
          var peak = 0.0
          var i = 0
          while (i + 1 < data.length) {
            val s = ((data(i) & 0xff) | (data(i + 1) << 8)).toShort / 32768.0
            sumSq += s * s
            val a = math.abs(s)
            if (a > peak) peak = a
            i += 2
          }
          val frames = n.toLong / math.max(1, fmt.getChannels)
          Some(AudioFeatures(
            id = rec.id,
            nBytes = bytes.length.toLong,
            digest = "", // filled by the batched caller's shared digest
            sampleRate = fmt.getSampleRate.toInt,
            channels = fmt.getChannels,
            nFrames = frames,
            durationSec =
              if (fmt.getSampleRate > 0) frames / fmt.getSampleRate.toDouble else 0.0,
            rms = if (n == 0) 0.0 else math.sqrt(sumSq / n),
            peak = peak
          ))
        } finally pcm.close()
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Batched distributed audio feature extraction — the mapPartitions
    * shape of [[extractFeatures]] for `audio/<i>` payloads: REAL decode
    * where the JDK has a reader (WAV/AIFF/AU), degraded byte-level rows
    * (audio fields zeroed, digest/nBytes real) for codec-less formats or
    * corrupt payloads — one bad file must not kill the stage.
    */
  def extractAudioFeatures(
      ds: Dataset[MediaRecord],
      batchSize: Int = 64
  ): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = MessageDigest.getInstance("SHA-256") // per-partition setup
      it.grouped(batchSize).flatMap { batch =>
        batch.map { rec =>
          val bytes = if (rec.media == null) Array.emptyByteArray else rec.media
          codec.reset()
          val hex = codec.digest(bytes).map("%02x".format(_)).mkString
          decodeAudio(rec) match {
            case Some(f) => f.copy(digest = hex)
            case None =>
              AudioFeatures(rec.id, bytes.length.toLong, hex, 0, 0, 0L, 0.0, 0.0, 0.0)
          }
        }
      }
    }
  }

  /** One sampled "frame" of a video-ish payload. */
  final case class FrameFeatures(
      id: Long,
      frameIdx: Int,
      nBytes: Long,
      digest: String,
      brightness: Double
  )

  /** Split a concatenated-JPEG (MJPEG-style) payload into its frames'
    * [start, end) byte ranges by walking the JPEG MARKER STRUCTURE, not by
    * scanning for a raw EOI: FF D9 legitimately occurs INSIDE marker
    * segment payloads (an EXIF APP1 thumbnail is itself a complete JPEG,
    * ICC and COM payloads are arbitrary bytes), so a naive byte scan
    * truncates real camera frames at the embedded thumbnail's EOI. The
    * walk: after SOI, every non-RST marker before SOS carries a 2-byte
    * big-endian length (inclusive) whose payload is SKIPPED wholesale;
    * after SOS the data is entropy-coded, where a 0xFF data byte is always
    * stuffed as FF 00 and standalone FF D0-D7 are restarts — there (and
    * only there) a raw FF D9 is the frame terminator. A structurally
    * broken or truncated frame is dropped rather than emitted as garbage.
    */
  private[operators] def demuxMjpegRanges(bytes: Array[Byte]): Vector[(Int, Int)] = {
    val frames = Vector.newBuilder[(Int, Int)]
    val n = bytes.length
    def b(i: Int): Int = bytes(i) & 0xff
    var i = 0
    while (i < n - 1) {
      if (b(i) == 0xff && b(i + 1) == 0xd8) {
        val start = i
        var j = i + 2
        var end = -1 // set on EOI
        var broken = false
        var inScan = false
        // where to resync after a break: just past the last marker whose
        // DECLARED length we trusted. A corrupt length can jump the walk
        // over the next frame's SOI; rescanning from the bad marker
        // recovers that frame, and since a segment length is <= 65535 the
        // re-walked span is constant-bounded — still amortized linear.
        var lastJump = start + 2
        // a length jump is SUSPECT only until the walk parses the next
        // marker at its target; after that the segment is confirmed.
        // Breaks at a confirmed position resync AT the break (breakPos) —
        // resyncing from lastJump there would rescan a trusted segment's
        // payload, and an EXIF APP1 payload holds a complete thumbnail
        // JPEG the rescan would wrongly emit as a standalone frame. Only
        // a break exactly AT an unconfirmed jump target blames the length
        // (breakPos = -1) and rescans from it.
        var breakPos = -1
        var jumpTarget = -1
        while (j < n && end < 0 && !broken) {
          if (!inScan) {
            // marker-segment section: expect FF <marker>
            if (j + 1 >= n || b(j) != 0xff) {
              broken = true
              if (j != jumpTarget) breakPos = j // confirmed position: no rescan behind it
            } else b(j + 1) match {
              case 0xd9 => end = j + 2 // EOI with no scan (degenerate, legal)
              case m if m >= 0xd0 && m <= 0xd7 => j += 2 // RST (no length)
              case 0xff => j += 1 // fill byte before a marker
              case 0x01 => j += 2 // TEM (no length)
              case m =>
                if (j + 3 >= n) { broken = true; breakPos = j }
                else {
                  val len = (b(j + 2) << 8) | b(j + 3) // includes its 2 bytes
                  if (len < 2 || j + 2 + len > n) { broken = true; breakPos = j }
                  else {
                    if (m == 0xda) inScan = true // SOS: entropy data follows
                    lastJump = j + 2
                    j += 2 + len
                    jumpTarget = j
                  }
                }
            }
          } else {
            // entropy-coded data: FF 00 is a stuffed data byte, FF D0-D7
            // are restart markers, FF D9 ends the frame; any other FF xx
            // marker (DNL, next-scan SOS header...) leaves scan mode
            if (b(j) != 0xff) j += 1
            else if (j + 1 >= n) broken = true
            else b(j + 1) match {
              case 0x00                        => j += 2
              case m if m >= 0xd0 && m <= 0xd7 => j += 2
              case 0xd9                        => end = j + 2
              case _                           => inScan = false
            }
          }
        }
        if (end > 0) { frames += ((start, end)); i = end }
        else if (broken)
          // resync point depends on WHAT broke:
          //  - length check failed at marker breakPos: no jump was taken
          //    with a bad length, so resync at that marker — never inside
          //    an earlier (confirmed) segment's payload, whose embedded
          //    thumbnail JPEG must not become a frame;
          //  - structure broke after a jump: the LAST length is the
          //    suspect — rescan from its position, recovering a next-frame
          //    SOI a bogus length jumped over. One corrupt frame drops
          //    only itself; never before start+2, so the outer scan always
          //    advances, and never re-walking more than one <=64KB segment
          //    span keeps the demux amortized-linear on adversarial bytes.
          i = math.max(start + 2, if (breakPos >= 0) breakPos else lastJump)
        else if (j == jumpTarget)
          // ran off the end EXACTLY at an unconfirmed length jump
          // (j + 2 + len == n): indistinguishable from a corrupt length
          // that swallowed the rest of the payload — same suspect-length
          // treatment as a structure break, so a whole valid frame inside
          // the jumped span is recovered instead of silently lost
          i = math.max(start + 2, lastJump)
        else i = n // clean truncation at payload end: nothing left
      } else i += 1
    }
    frames.result()
  }

  /** Frame sampling for video payloads. `video/mjpeg` containers get a
    * REAL demux + decode: [[demuxMjpegRanges]] splits the concatenated-JPEG
    * stream into frames and each sampled frame is decoded with ImageIO for
    * true luma brightness (falling back to byte stats only for a corrupt
    * frame — one bad frame must not kill a 100 TB stage). Other declared
    * video formats have no codec in this environment and keep the
    * clearly-marked deterministic STUB demux (fixed `frameBytes` slices
    * standing in for frames); a real build swaps in an ffmpeg/JCodec
    * demuxer there and NOTHING else changes. Everything Spark-side is
    * shared and real: flatMap fan-out (one row in, nFrames/every rows
    * out — size the shuffle for the multiplier), per-partition codec
    * setup, every-k-th sampling so the output volume is bounded by design.
    */
  def sampleFrames(
      ds: Dataset[MediaRecord],
      frameBytes: Int = 4096,
      every: Int = 10
  ): Dataset[FrameFeatures] = {
    require(frameBytes > 0 && every > 0)
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = MessageDigest.getInstance("SHA-256")
      it.flatMap { rec =>
        val bytes = if (rec.media == null) Array.emptyByteArray else rec.media
        val mjpeg = rec.meta != null && rec.meta.format == "video/mjpeg"
        // sample the frame INDEX RANGES first, copy bytes only for the
        // sampled frames: a 1 GiB payload at every=30 must materialize
        // ~1/30th of itself, never a full second copy
        val ranges: IndexedSeq[((Int, Int), Int)] =
          if (mjpeg) demuxMjpegRanges(bytes).zipWithIndex
          else {
            // STUB demux: fixed-size slices as stand-in frames. Long math:
            // the Int sum overflows for payloads near the array max (or a
            // huge frameBytes), which would wrap nFrames negative and
            // SILENTLY emit zero frames for exactly the records that have
            // the most.
            val nFrames =
              ((bytes.length.toLong + frameBytes - 1) / frameBytes).toInt
            (0 until nFrames).map { f =>
              val lo = f * frameBytes
              ((lo, math.min(bytes.length, lo + frameBytes)), f)
            }
          }
        ranges.collect { case ((lo, hi), f) if f % every == 0 =>
          val frame = java.util.Arrays.copyOfRange(bytes, lo, hi)
          val brightness =
            (if (mjpeg) decodedLuma(frame) else None).getOrElse {
              var sum = 0L
              var i = 0
              while (i < frame.length) { sum += frame(i) & 0xff; i += 1 }
              if (frame.isEmpty) 0.0 else sum.toDouble / frame.length
            }
          codec.reset()
          FrameFeatures(
            id = rec.id,
            frameIdx = f,
            nBytes = frame.length.toLong,
            digest = codec.digest(frame).map("%02x".format(_)).mkString,
            brightness = brightness
          )
        }
      }
    }
  }

  /** Mean decoded luma of one frame's bytes, or None when no reader can
    * decode them (or the declared raster fails the bomb guard).
    */
  private def decodedLuma(frame: Array[Byte]): Option[Double] = {
    val img =
      if (frame.isEmpty || rasterUnsafe(frame)) null
      else
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
        catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth.toLong * img.getHeight == 0) None
    else {
      val (_, sum) = lumaScan(img)
      Some(sum / (img.getWidth.toLong * img.getHeight))
    }
  }

  /** Batched distributed decode: one codec per partition, items streamed
    * through in `batchSize` groups — the exact shape a real decoder needs
    * (batch inference, bounded memory), with no collect and no per-row
    * setup. Dispatch is by declared format: `image/<i>` runs the real
    * ImageIO decode, everything else the byte-level stub.
    */
  def extractFeatures(
      ds: Dataset[MediaRecord],
      batchSize: Int = 64
  ): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = MessageDigest.getInstance("SHA-256") // per-partition setup
      it.grouped(batchSize).flatMap { batch =>
        batch.map { rec =>
          if (rec.meta != null && rec.meta.format != null &&
            rec.meta.format.startsWith("image/"))
            decodeImage(codec, rec)
          else decodeStub(codec, rec)
        }
      }
    }
  }
}
