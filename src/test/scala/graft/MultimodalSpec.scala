package graft

import org.apache.spark.sql.functions._
import graft.operators.{MediaMeta, MediaRecord, Multimodal}
import graft.queries.QueryUtil

class MultimodalSpec extends SparkTestBase {

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG decode: dims, channels, luma histogram and brightness") {
    import spark.implicits._
    val records = Seq(
      MediaRecord(1L, "mem://gray.png", png(8, 5, 0x646464), MediaMeta("image/png", 8, 5, 3)),
      MediaRecord(2L, "mem://white.png", png(4, 4, 0xffffff), MediaMeta("image/png", 4, 4, 3)),
      MediaRecord(3L, "mem://black.png", png(4, 4, 0x000000), MediaMeta("image/png", 4, 4, 3)),
      MediaRecord(4L, "mem://plain.txt", "hello".getBytes("UTF-8"), MediaMeta("text/utf-8", 5, 1, 1))
    ).toDS()
    val f = Multimodal.extractFeatures(records, batchSize = 2)
      .collect().sortBy(_.id)

    // gray (r=g=b=100): BT.601 luma == 100 for every pixel
    assert(f(0).width === 8 && f(0).height === 5 && f(0).channels === 3)
    assert(math.abs(f(0).brightness - 100.0) < 1e-9, s"gray luma ${f(0).brightness}")
    assert(f(0).histogram(100 / 16) === 40L) // all 40 pixels in one luma bin

    // white: luma 255 -> top bin; black: luma 0 -> bottom bin
    assert(math.abs(f(1).brightness - 255.0) < 1e-9 && f(1).histogram(15) === 16L)
    assert(f(2).brightness === 0.0 && f(2).histogram(0) === 16L)

    // non-image format takes the byte-level stub path: no raster dims,
    // digest still the payload hash
    assert(f(3).width === 0 && f(3).height === 0 && f(3).channels === 0)
    val expectHash = java.security.MessageDigest.getInstance("SHA-256")
      .digest("hello".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(f(3).digest === expectHash)
  }

  test("resize scales the longest side to maxDim, preserves aspect, skips non-images") {
    import spark.implicits._
    val records = Seq(
      MediaRecord(1L, "mem://wide.png", png(64, 16, 0x336699), MediaMeta("image/png", 64, 16, 3)),
      MediaRecord(2L, "mem://small.png", png(8, 8, 0x336699), MediaMeta("image/png", 8, 8, 3)),
      MediaRecord(3L, "mem://plain.txt", "hello".getBytes("UTF-8"), MediaMeta("text/utf-8", 5, 1, 1)),
      MediaRecord(4L, "mem://junk.png", Array[Byte](1, 2, 3), MediaMeta("image/png", 0, 0, 3))
    ).toDS()
    val out = Multimodal.resizeAll(records, maxDim = 32).collect().sortBy(_.id).toSeq
    // 64x16 -> 32x8, re-encoded PNG that really decodes at the new raster
    assert(out(0).meta.width === 32 && out(0).meta.height === 8)
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).media))
    assert(decoded.getWidth === 32 && decoded.getHeight === 8)
    // already within bound -> untouched; non-image -> untouched;
    // undecodable -> passes through unchanged rather than failing
    assert(out(1).media.sameElements(records.collect().sortBy(_.id).apply(1).media))
    assert(new String(out(2).media, "UTF-8") === "hello")
    assert(out(3).media.sameElements(Array[Byte](1, 2, 3)))
  }

  test("frame sampling fans out every k-th fixed-size slice with bounded output") {
    import spark.implicits._
    // 10000 bytes / 1000-byte frames = 10 frames; every 3rd -> idx 0,3,6,9
    val payload = Array.tabulate[Byte](10000)(i => (i % 251).toByte)
    val rec = Seq(
      MediaRecord(7L, "mem://clip.bin", payload, MediaMeta("video/fake", 0, 0, 0)),
      MediaRecord(8L, "mem://empty.bin", Array.emptyByteArray, MediaMeta("video/fake", 0, 0, 0))
    ).toDS()
    val frames = Multimodal.sampleFrames(rec, frameBytes = 1000, every = 3)
      .collect().sortBy(f => (f.id, f.frameIdx)).toSeq
    assert(frames.map(f => (f.id, f.frameIdx)) === Seq((7L, 0), (7L, 3), (7L, 6), (7L, 9)))
    assert(frames.forall(_.nBytes === 1000L))
    // deterministic: the same slice hashes identically across runs
    val again = Multimodal.sampleFrames(rec, frameBytes = 1000, every = 3)
      .collect().sortBy(f => (f.id, f.frameIdx)).toSeq
    assert(frames.map(_.digest) === again.map(_.digest))
  }

  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("mjpeg container demuxes into REAL decoded frames (luma, not byte stats)") {
    import spark.implicits._
    // a concatenated-JPEG (MJPEG-style) container: dark, bright, dark,
    // bright frames back to back — plus a truncated tail that must drop
    val dark = jpeg(16, 16, 0x101010)
    val bright = jpeg(16, 16, 0xf0f0f0)
    val container = dark ++ bright ++ dark ++ bright ++ bright.dropRight(10)
    val rec = Seq(
      MediaRecord(9L, "mem://clip.mjpeg", container, MediaMeta("video/mjpeg", 16, 16, 3))
    ).toDS()

    val frames = Multimodal.sampleFrames(rec, every = 1)
      .collect().sortBy(_.frameIdx).toSeq
    assert(frames.map(_.frameIdx) === Seq(0, 1, 2, 3),
      "expected exactly the 4 complete frames (truncated tail dropped)")
    // PROOF the demux+decode is real: JPEG bytes of dark and bright frames
    // have similar byte-level averages, but their decoded luma differs by
    // an order of magnitude — byte stats could never separate them
    assert(frames(0).brightness < 40, s"dark frame luma: ${frames(0).brightness}")
    assert(frames(1).brightness > 200, s"bright frame luma: ${frames(1).brightness}")
    assert(frames(2).brightness < 40 && frames(3).brightness > 200)
    assert(frames.forall(_.nBytes > 100L), "frames carry the real JPEG bytes")

    // every-k sampling bounds the fan-out on the same container
    val sampled = Multimodal.sampleFrames(rec, every = 2)
      .collect().sortBy(_.frameIdx).toSeq
    assert(sampled.map(_.frameIdx) === Seq(0, 2))
  }

  test("mjpeg demux walks marker segments: FF D9 inside an APP1 payload is data") {
    import spark.implicits._
    // camera-style frame: an EXIF-like APP1 segment whose payload contains
    // a raw EOI marker (real thumbnails are complete embedded JPEGs) — a
    // naive byte scan would truncate the frame there
    val dark = jpeg(16, 16, 0x101010)
    val bright = jpeg(16, 16, 0xf0f0f0)
    val payload = Array[Byte](
      'E', 'x', 'i', 'f', 0, 0,
      0xff.toByte, 0xd9.toByte, // embedded EOI inside the segment payload
      1, 2, 3)
    val app1 = Array(0xff.toByte, 0xe1.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload
    val withApp1 = dark.take(2) ++ app1 ++ dark.drop(2)
    val container = withApp1 ++ bright
    val rec = Seq(
      MediaRecord(10L, "mem://cam.mjpeg", container, MediaMeta("video/mjpeg", 16, 16, 3))
    ).toDS()
    val frames = Multimodal.sampleFrames(rec, every = 1)
      .collect().sortBy(_.frameIdx).toSeq
    assert(frames.map(_.frameIdx) === Seq(0, 1),
      s"expected 2 whole frames, got ${frames.map(f => (f.frameIdx, f.nBytes))}")
    assert(frames(0).nBytes === withApp1.length.toLong,
      "frame 0 must include everything past the embedded EOI")
    assert(frames(0).brightness < 40 && frames(1).brightness > 200,
      "both frames must still decode to their true luma")
  }

  test("a corrupt frame drops alone: the demux resyncs on the next SOI") {
    import spark.implicits._
    val dark = jpeg(16, 16, 0x101010)
    val bright = jpeg(16, 16, 0xf0f0f0)
    // middle frame declares an APP1 length that overruns the container —
    // the walk must drop it and recover the following valid frame
    val corrupt = Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
      0xff.toByte, 0xff.toByte) ++ Array.fill[Byte](32)(0)
    val container = dark ++ corrupt ++ bright
    val rec = Seq(
      MediaRecord(11L, "mem://glitch.mjpeg", container, MediaMeta("video/mjpeg", 16, 16, 3))
    ).toDS()
    val frames = Multimodal.sampleFrames(rec, every = 1)
      .collect().sortBy(_.frameIdx).toSeq
    assert(frames.map(_.frameIdx) === Seq(0, 1),
      s"expected the two valid frames, got ${frames.map(f => (f.frameIdx, f.nBytes))}")
    assert(frames(0).brightness < 40 && frames(1).brightness > 200,
      "the frame AFTER the corrupt one must still decode")

    // boundary case: the corrupt segment's declared length lands the walk
    // exactly ONE BYTE past the next frame's SOI — resyncing from the bad
    // marker (not the jump target) must still recover that frame
    // frame layout: [FFD8][FFE0 len][pad] then bright at offset 6+pad;
    // the walk jumps to 4+len, so len = pad+3 lands it at SOI+1 exactly
    val pad = 24
    val len = pad + 3
    val jumper = Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++
      Array.fill[Byte](pad)(0)
    val rec2 = Seq(
      MediaRecord(12L, "mem://jump.mjpeg", jumper ++ bright,
        MediaMeta("video/mjpeg", 16, 16, 3))
    ).toDS()
    val f2 = Multimodal.sampleFrames(rec2, every = 1).collect().toSeq
    assert(f2.map(_.frameIdx) === Seq(0), s"got ${f2.map(_.frameIdx)}")
    assert(f2.head.brightness > 200,
      "the frame the bogus length jumped over must be recovered")

    // boundary-of-the-boundary: the corrupt length lands the walk EXACTLY
    // at end-of-payload (j + 2 + len == n) — previously indistinguishable
    // from clean truncation, silently losing the swallowed frame
    // jump from offset 2 lands at 4 + len; n = 6 + bright.length, so
    // len = bright.length + 2 hits end-of-payload exactly (len =
    // bright.length would land ON bright's trailing EOI and swallow it
    // into one mega-frame instead)
    val lenEdge = bright.length + 2
    val edge = Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte,
      ((lenEdge >> 8) & 0xff).toByte, (lenEdge & 0xff).toByte) ++ bright
    val rec3 = Seq(
      MediaRecord(14L, "mem://edge.mjpeg", edge,
        MediaMeta("video/mjpeg", 16, 16, 2))
    ).toDS()
    val f3 = Multimodal.sampleFrames(rec3, every = 1).collect().toSeq
    assert(f3.map(_.frameIdx) === Seq(0),
      s"exact-end bogus length must not eat the real frame: ${f3.map(_.frameIdx)}")
    assert(f3.head.brightness > 200 && f3.head.nBytes === bright.length.toLong)
  }

  test("resync never emits a trusted APP1's embedded thumbnail as a frame") {
    import spark.implicits._
    // adversarial camera frame: a VALID APP1 carrying a complete thumbnail
    // JPEG, then a LATER segment whose length check fails. The old resync
    // (rescan from the last length jump) walked back INTO the trusted APP1
    // payload and emitted the thumbnail as a standalone frame; the fix
    // resyncs at the corrupt marker, past every confirmed payload.
    val thumb = jpeg(8, 8, 0xf0f0f0) // bright: detectable if wrongly emitted
    val dark = jpeg(16, 16, 0x101010)
    val payload = Array[Byte]('E', 'x', 'i', 'f', 0, 0) ++ thumb
    val app1 = Array(0xff.toByte, 0xe1.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload
    // corrupt DQT right after the APP1: declared length 1 (< 2 = invalid)
    val badSeg = Array(0xff.toByte, 0xdb.toByte, 0x00.toByte, 0x01.toByte)
    val brokenFrame =
      Array(0xff.toByte, 0xd8.toByte) ++ app1 ++ badSeg ++ Array.fill[Byte](64)(0)
    val container = brokenFrame ++ dark
    val rec = Seq(
      MediaRecord(13L, "mem://thumb.mjpeg", container,
        MediaMeta("video/mjpeg", 16, 16, 2))
    ).toDS()
    val frames = Multimodal.sampleFrames(rec, every = 1).collect().toSeq
    assert(frames.map(_.frameIdx) === Seq(0),
      s"only the trailing real frame, got ${frames.map(f => (f.frameIdx, f.nBytes))}")
    assert(frames.head.nBytes === dark.length.toLong,
      "the emitted frame must be the real dark frame, not the thumbnail")
    assert(frames.head.brightness < 40,
      "a bright frame here means the embedded thumbnail leaked out")
  }

  private def wav(freqHz: Double, amplitude: Double, rateHz: Float, nFrames: Int): Array[Byte] = {
    val data = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s = (math.sin(2 * math.Pi * freqHz * i / rateHz) * amplitude * 32767).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rateHz, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV decode: rate, duration, RMS and peak from actual samples") {
    import spark.implicits._
    // 440 Hz sine at amplitude 0.5: RMS = 0.5/sqrt(2) ~ 0.354, peak ~ 0.5
    val sine = wav(440.0, 0.5, 8000f, 4000)
    val quiet = wav(440.0, 0.05, 8000f, 4000)
    val records = Seq(
      MediaRecord(1L, "mem://sine.wav", sine, MediaMeta("audio/wav", 0, 0, 1)),
      MediaRecord(2L, "mem://quiet.wav", quiet, MediaMeta("audio/wav", 0, 0, 1)),
      MediaRecord(3L, "mem://noise.bin", Array[Byte](1, 2, 3, 4),
        MediaMeta("audio/opus", 0, 0, 1)) // no JDK codec -> degraded row
    ).toDS()
    val f = Multimodal.extractAudioFeatures(records, batchSize = 2)
      .collect().sortBy(_.id)
    assert(f(0).sampleRate === 8000 && f(0).channels === 1)
    assert(f(0).nFrames === 4000L && math.abs(f(0).durationSec - 0.5) < 1e-6)
    assert(math.abs(f(0).rms - 0.5 / math.sqrt(2)) < 0.01, s"rms=${f(0).rms}")
    assert(math.abs(f(0).peak - 0.5) < 0.01, s"peak=${f(0).peak}")
    // amplitude scales RMS linearly — proof the numbers come from samples
    assert(math.abs(f(1).rms * 10 - f(0).rms) < 0.02, s"${f(1).rms} vs ${f(0).rms}")
    // undecodable: audio fields zeroed, identity fields real
    assert(f(2).sampleRate === 0 && f(2).rms === 0.0 && f(2).nBytes === 4L)
    assert(f(2).digest.nonEmpty)
  }

  test("decompression bomb is refused from the header, never decoded") {
    import spark.implicits._
    // a syntactically-valid PNG signature + IHDR declaring 100000x100000
    // (10 gigapixels): ImageIO's header read sees the dims; actually
    // decoding it would allocate ~40 GB. The guard must stub/pass-through
    // from the header alone — this test OOMs if the raster is ever built.
    def chunk(typ: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 4 + body.length + 4)
      bb.putInt(body.length).put(typ.getBytes("US-ASCII")).put(body)
      val crc = new java.util.zip.CRC32
      crc.update(typ.getBytes("US-ASCII")); crc.update(body)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(100000).putInt(100000)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val bomb = sig ++ chunk("IHDR", ihdr)

    val rec = Seq(
      MediaRecord(66L, "mem://bomb.png", bomb, MediaMeta("image/png", 0, 0, 3))
    ).toDS()
    val f = Multimodal.extractFeatures(rec).collect().head
    assert(f.width === 0 && f.height === 0, "bomb must take the stub path")
    val resized = Multimodal.resizeAll(rec, maxDim = 32).collect().head
    assert(resized.media.sameElements(bomb), "bomb must pass through resize untouched")
  }

  test("corrupt image bytes degrade to stub features instead of failing the stage") {
    import spark.implicits._
    val junk = Array.tabulate[Byte](32)(i => (i * 7).toByte)
    val rec = Seq(
      MediaRecord(9L, "mem://junk.png", junk, MediaMeta("image/png", 0, 0, 3))
    ).toDS()
    val f = Multimodal.extractFeatures(rec).collect().head
    assert(f.width === 0 && f.nBytes === 32L && f.digest.nonEmpty)
  }

  test("binary media plumbing: schema, batch decode, deterministic features") {
    val docs = QueryUtil.t(spark, SparkTestBase.Sf0001, "documents")
    val media = Multimodal.fromDocuments(spark, docs)
    val feats = Multimodal.extractFeatures(media, batchSize = 16)

    val fdf = feats.toDF().cache()
    val n = docs.count()
    assert(fdf.count() === n)

    // features line up with ground truth computable in SQL: byte length ==
    // char length (ASCII fixture), digest == sha2(text), histogram sums to
    // byte count
    val joined = fdf
      .join(docs, fdf("id") === docs("doc_id"))
      .select(
        (col("nBytes") === length(col("text"))).as("len_ok"),
        (col("digest") === sha2(col("text"), 256)).as("digest_ok"),
        (aggregate(col("histogram"), lit(0L), (a, x) => a + x) === col("nBytes"))
          .as("hist_ok"),
        (col("brightness") > 0).as("bright_ok")
      )
    assert(joined.filter(!col("len_ok") || !col("digest_ok") || !col("hist_ok") || !col("bright_ok")).count() === 0)

    // determinism: running the decode twice yields identical output
    val again = Multimodal.extractFeatures(media, batchSize = 64).toDF()
    assert(fdf.select("id", "digest").except(again.select("id", "digest")).count() === 0)
    fdf.unpersist()
  }
}
