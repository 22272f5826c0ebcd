package graft.sources

import java.nio.charset.StandardCharsets

/** Iceberg hidden-partition transform evaluation (public spec,
  * https://iceberg.apache.org/spec/#partition-transforms): given a
  * predicate literal on the SOURCE column, produce the stored partition
  * value so manifest summaries and entry tuples can be pruned against it.
  * This is what makes `day(ts)` / `bucket(n, id)` partitioning "hidden" —
  * the user filters on the source column and planning does the math.
  *
  * Reference capability: crates/connectors/iceberg/src/lib.rs:18-148
  * declares the connector; transforms are part of the table spec it
  * claims to read.
  *
  * Result types (spec): day/month/year/hour and bucket are int-typed
  * partition values; truncate keeps the source type; identity is the
  * source value. `bucket[N]` is the 32-bit Murmur3 (x86, seed 0) of the
  * value's single-value binary, `(hash & Int.MaxValue) % N` — pinned in
  * SourcesSpec against the spec's own published vectors (int 34 →
  * 2017239379, string "iceberg" → 1210000089, date 2017-11-16 →
  * -653330422).
  */
object IcebergTransforms {

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  def bucketCount(transform: String): Option[Int] =
    transform match { case BucketRe(n) => Some(n.toInt); case _ => None }

  def truncateWidth(transform: String): Option[Int] =
    transform match { case TruncateRe(w) => Some(w.toInt); case _ => None }

  /** The Iceberg type name of the TRANSFORMED partition value — what the
    * manifest summary bounds of this partition field are encoded as.
    */
  def resultTypeName(transform: String, sourceTypeName: String): String =
    transform match {
      case "identity"                        => sourceTypeName
      case "day" | "month" | "year" | "hour" => "int"
      case BucketRe(_)                       => "int"
      case TruncateRe(_)                     => sourceTypeName
      case other =>
        throw new UnsupportedOperationException(
          s"Iceberg partition transform '$other' not supported")
    }

  /** Evaluate the transform on a predicate literal. Accepted literal
    * forms per source type: date — LocalDate / java.sql.Date /
    * ISO string / epoch-day number; timestamptz — Instant / ISO string /
    * epoch-micros number; int/long — Number; string — String.
    */
  def apply(transform: String, sourceTypeName: String, value: Any): Any = {
    require(value != null, "transform of a null literal is not defined; " +
      "null partitions match via contains_null, not bounds")
    transform match {
      case "identity" => value
      case "day" =>
        sourceTypeName match {
          case "date"        => toEpochDay(value).toInt
          case "timestamptz" => Math.floorDiv(toEpochMicros(value), MicrosPerDay).toInt
          case other => unsupportedSource("day", other)
        }
      case "month" =>
        val d = toLocalDate(sourceTypeName, value)
        (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
      case "year" =>
        toLocalDate(sourceTypeName, value).getYear - 1970
      case "hour" =>
        sourceTypeName match {
          case "timestamptz" => Math.floorDiv(toEpochMicros(value), MicrosPerHour).toInt
          case other => unsupportedSource("hour", other)
        }
      case BucketRe(n) => bucket(sourceTypeName, value, n.toInt)
      case TruncateRe(w) => truncate(sourceTypeName, value, w.toInt)
      case other =>
        throw new UnsupportedOperationException(
          s"Iceberg partition transform '$other' not supported")
    }
  }

  /** `bucket[N]` (spec Appendix B): Murmur3 x86 32-bit, seed 0, of the
    * value's hash form; int/long/date/timestamp hash as the 8-byte
    * little-endian long, strings as UTF-8 bytes.
    */
  def bucket(sourceTypeName: String, value: Any, n: Int): Int = {
    require(n > 0, s"bucket[$n] is not a valid transform")
    val h = sourceTypeName match {
      case "int" | "long" => hashLong(value.asInstanceOf[Number].longValue())
      case "date"         => hashLong(toEpochDay(value))
      case "timestamptz"  => hashLong(toEpochMicros(value))
      case "string"       => hashBytes(value.toString.getBytes(StandardCharsets.UTF_8))
      case other => unsupportedSource("bucket", other)
    }
    (h & Integer.MAX_VALUE) % n
  }

  def truncate(sourceTypeName: String, value: Any, w: Int): Any = {
    require(w > 0, s"truncate[$w] is not a valid transform")
    sourceTypeName match {
      // spec: v - (v mod W) with FLOOR mod (negative values round down)
      case "int" =>
        val v = value.asInstanceOf[Number].intValue()
        v - Math.floorMod(v, w)
      case "long" =>
        val v = value.asInstanceOf[Number].longValue()
        v - Math.floorMod(v, w.toLong)
      case "string" =>
        val s = value.toString
        if (s.length <= w) s else s.substring(0, w)
      case other => unsupportedSource("truncate", other)
    }
  }

  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    hashBytes(b)
  }

  /** Murmur3 x86 32-bit, seed 0 (Austin Appleby's public algorithm —
    * the spec names this exact variant for bucketing).
    */
  def hashBytes(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = data.length
    var h1 = 0 // seed
    val nblocks = len / 4
    var i = 0
    while (i < nblocks) {
      val base = 4 * i
      var k1 = (data(base) & 0xff) |
        ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) |
        ((data(base + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    val tailStart = nblocks * 4
    var k1 = 0
    (len & 3) match {
      case 3 =>
        k1 ^= (data(tailStart + 2) & 0xff) << 16
        k1 ^= (data(tailStart + 1) & 0xff) << 8
        k1 ^= data(tailStart) & 0xff
      case 2 =>
        k1 ^= (data(tailStart + 1) & 0xff) << 8
        k1 ^= data(tailStart) & 0xff
      case 1 =>
        k1 ^= data(tailStart) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  private val MicrosPerDay = 86_400_000_000L
  private val MicrosPerHour = 3_600_000_000L

  private def toEpochDay(value: Any): Long = value match {
    case d: java.time.LocalDate => d.toEpochDay
    case d: java.sql.Date       => d.toLocalDate.toEpochDay
    case s: String              => java.time.LocalDate.parse(s).toEpochDay
    case n: Number              => n.longValue()
    case other =>
      throw new IllegalArgumentException(s"cannot read a date from $other")
  }

  private def toEpochMicros(value: Any): Long = value match {
    case i: java.time.Instant => i.getEpochSecond * 1_000_000L + i.getNano / 1000L
    case t: java.sql.Timestamp =>
      t.getTime / 1000L * 1_000_000L + t.getNanos / 1000L
    case s: String => toEpochMicros(java.time.Instant.parse(s))
    case n: Number => n.longValue()
    case other =>
      throw new IllegalArgumentException(s"cannot read a timestamp from $other")
  }

  private def toLocalDate(sourceTypeName: String, value: Any): java.time.LocalDate =
    sourceTypeName match {
      case "date" => java.time.LocalDate.ofEpochDay(toEpochDay(value))
      case "timestamptz" =>
        java.time.LocalDate.ofEpochDay(
          Math.floorDiv(toEpochMicros(value), MicrosPerDay))
      case other => unsupportedSource("month/year", other)
    }

  private def unsupportedSource(transform: String, sourceType: String): Nothing =
    throw new UnsupportedOperationException(
      s"Iceberg transform '$transform' over source type '$sourceType' not supported")
}
