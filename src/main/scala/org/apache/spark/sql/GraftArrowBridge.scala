package org.apache.spark.sql

import java.io.{InputStream, OutputStream}

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnVector, ColumnarBatch}

/** A DO_PUT ingest exceeded the server's configured row/byte bound. A
  * distinct type so ServingServer can answer `ERR RESOURCE_EXHAUSTED`
  * (client should shrink/back off) instead of `ERR INTERNAL` (server bug).
  */
final class IngestLimitExceeded(msg: String) extends RuntimeException(msg)

/** Narrow bridge into Spark's `private[sql]` Arrow machinery: the serving
  * endpoint streams query results as Arrow IPC (the reference's wire
  * format, crates/api/src/lib.rs:122-148) and Spark already ships a
  * complete, tested InternalRow->Arrow writer — re-implementing the type
  * matrix (decimals, timestamps, nested arrays...) outside this bridge
  * would be strictly worse. Everything else in graft stays on public API.
  */
object GraftArrowBridge {

  /** Stream an Arrow IPC stream containing ONLY the schema (no batches) —
    * the `get_flight_info` response shape.
    */
  def writeSchemaOnly(
      schema: StructType,
      timeZoneId: String,
      out: OutputStream
  ): Unit = {
    val arrowSchema =
      ArrowUtils.toArrowSchema(schema, timeZoneId,
        errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val allocator =
      ArrowUtils.rootAllocator.newChildAllocator("graft-flight-info", 0, Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    try {
      val ipc = new ArrowStreamWriter(root, null, out)
      ipc.start()
      ipc.end()
    } finally {
      root.close()
      allocator.close()
    }
  }

  /** Execute `df` and stream its rows as an Arrow IPC stream in batches of
    * `batchSize` rows. Streams via the partition-local iterator, so at
    * most one partition plus one Arrow batch is in driver memory at once.
    */
  def writeBatches(df: DataFrame, batchSize: Int, out: OutputStream): Unit = {
    val classic = df.asInstanceOf[ClassicDataFrame]
    val tz = classic.sparkSession.sessionState.conf.sessionLocalTimeZone
    // toRdd yields REUSED UnsafeRow buffers — they must be copied inside
    // the task before crossing to the driver, or every row in a collected
    // partition aliases the same (freed) buffer
    writeRows(classic.schema, tz,
      classic.queryExecution.toRdd.map(_.copy()).toLocalIterator, batchSize, out)
  }

  /** The result of a query as (schema, InternalRow RDD): the multi-endpoint
    * serving shape — each RDD partition is one flight endpoint, fetched by
    * its own DO_GET ticket. Rows are task-side copies (see writeBatches).
    * Building the RDD finalizes the (possibly adaptive) physical plan; no
    * rows reach the driver until a partition is fetched.
    */
  def resultRdd(
      df: DataFrame
  ): (StructType, org.apache.spark.rdd.RDD[InternalRow]) = {
    val classic = df.asInstanceOf[ClassicDataFrame]
    (classic.schema, classic.queryExecution.toRdd.map(_.copy()))
  }

  /** Collect exactly one partition of a flight RDD to the driver — the
    * per-ticket DO_GET unit. Driver memory is bounded by that single
    * partition (the same bound the toLocalIterator path has), but N
    * tickets can be fetched over N connections CONCURRENTLY, which the
    * single shared toLocalIterator stream cannot.
    */
  def partitionRows(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[InternalRow],
      partition: Int
  ): Array[InternalRow] =
    spark.sparkContext
      .runJob(rdd, (it: Iterator[InternalRow]) => it.toArray, Seq(partition))
      .head

  /** Lazily page through one flight partition in `chunkRows`-row slices —
    * driver memory is bounded by ONE chunk instead of the whole partition.
    * Each pull is a job over the (persisted) flight RDD: the partition's
    * cached columnar/row form is re-iterated to the slice offset, which is
    * a memory-for-CPU trade the serving tier makes knowingly — the cache
    * makes the re-iteration a cheap in-memory skip, and the alternative
    * (whole partition on the driver) is exactly the reference's
    * collect-everything shape this layer exists to avoid
    * (api/src/lib.rs:92-98). Ends on the first short chunk.
    *
    * Consistency tripwire: offset-sliced pulls are only sound if every
    * job sees the SAME row sequence. A cached block lost between pulls
    * (executor loss; impossible in local mode, real on a cluster) makes a
    * shuffled partition recompute in a different fetch order — silently
    * duplicating and dropping rows across the slice boundaries. Each job
    * therefore also digests the rows it SKIPS (count + order-insensitive
    * sum of UnsafeRow hashes, computed during the skip it already pays
    * for) and the driver checks that against what it has already
    * streamed; a mismatch throws, aborting the connection (the client
    * sees a truncated Arrow stream and retries) instead of serving a
    * corrupted row set under an OK status. Order-insensitivity is
    * deliberate: a recompute that reorders the SAME prefix set leaves the
    * remaining-rows set intact, so the stream stays correct as a set —
    * and sorted results recompute in sorted order anyway.
    */
  def partitionChunks(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[InternalRow],
      partition: Int,
      chunkRows: Int
  ): Iterator[Array[InternalRow]] = {
    require(chunkRows > 0)
    val part = partition // Iterator has a `partition` member; don't shadow
    new Iterator[Array[InternalRow]] {
      private var start = 0
      private var sentDigest = 0L
      private var lastWasShort = false
      def hasNext: Boolean = !lastWasShort
      def next(): Array[InternalRow] = {
        val n = chunkRows
        val offset = start
        val (skipped, prefixDigest, chunk) = spark.sparkContext
          .runJob(
            rdd,
            (it: Iterator[InternalRow]) => {
              var d = 0L
              var i = 0
              while (i < offset && it.hasNext) { d += rowDigest(it.next()); i += 1 }
              (i, d, it.take(n).toArray)
            },
            Seq(part))
          .head
        if (skipped != start || prefixDigest != sentDigest)
          throw new IllegalStateException(
            s"flight partition $part changed between chunk fetches " +
              s"(sent $start rows, recompute has $skipped; digest " +
              s"$sentDigest vs $prefixDigest) — cached block lost and " +
              "recomputed in a different order; client must re-fetch the ticket")
        chunk.foreach(r => sentDigest += rowDigest(r))
        start += chunk.length
        lastWasShort = chunk.length < chunkRows
        chunk
      }
    }
  }

  /** Deterministic per-row digest for the chunk tripwire: UnsafeRow
    * hashes its bytes (Murmur3). Non-UnsafeRow implementations hash by
    * identity, which would false-positive across JVM boundaries — digest
    * 0 there, disabling the tripwire rather than corrupting it.
    */
  private def rowDigest(r: InternalRow): Long = r match {
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow => u.hashCode().toLong
    case _                                                      => 0L
  }

  /** Stream already-materialized InternalRows as Arrow IPC record batches
    * of `batchSize` rows — shared by the full-result and per-ticket paths.
    */
  def writeRows(
      schema: StructType,
      timeZoneId: String,
      rows: Iterator[InternalRow],
      batchSize: Int,
      out: OutputStream
  ): Unit = {
    val arrowSchema =
      ArrowUtils.toArrowSchema(schema, timeZoneId,
        errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val allocator =
      ArrowUtils.rootAllocator.newChildAllocator("graft-do-get", 0, Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    try {
      val writer = ArrowWriter.create(root)
      val ipc = new ArrowStreamWriter(root, null, out)
      ipc.start()
      var inBatch = 0
      while (rows.hasNext) {
        writer.write(rows.next())
        inBatch += 1
        if (inBatch == batchSize) {
          writer.finish()
          ipc.writeBatch()
          writer.reset()
          inBatch = 0
        }
      }
      if (inBatch > 0) {
        writer.finish()
        ipc.writeBatch()
      }
      ipc.end()
    } finally {
      root.close()
      allocator.close()
    }
  }

  /** Execute `sql` with every reference to the single-part table name
    * `name` bound to `df` — the DO_EXCHANGE shape: the client's uploaded
    * batch IS the query's input relation. Binding happens by substituting
    * the parsed (unresolved) plan's matching `UnresolvedRelation`s
    * (subqueries included) with the DataFrame's plan BEFORE analysis, so
    * nothing touches the shared catalog — concurrent exchanges cannot
    * collide the way a shared temp-view name would, and the bound name
    * shadows any real table of the same name for exactly this query.
    * An exchange whose SQL never references `name` is refused: uploading
    * data the query ignores is a malformed request, not a query.
    */
  /** Parse-level check that `sql` references the single-part relation
    * `name` — the DO_EXCHANGE precondition, checkable BEFORE the
    * uploaded body is decoded (a refused request must not first land
    * maxPutBytes on the driver heap; same parse [[sqlOver]] repeats with
    * the binding).
    */
  def referencesRelation(
      spark: SparkSession,
      sql: String,
      name: String): Boolean = {
    val classic = spark.asInstanceOf[ClassicSparkSession]
    val parsed = classic.sessionState.sqlParser.parsePlan(sql)
    var hits = 0
    parsed.transformUpWithSubqueries {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
          if u.multipartIdentifier.length == 1 &&
            u.multipartIdentifier.head.equalsIgnoreCase(name) =>
        hits += 1
        u
    }
    hits > 0
  }

  def sqlOver(
      spark: SparkSession,
      sql: String,
      name: String,
      df: DataFrame
  ): DataFrame = {
    val classic = spark.asInstanceOf[ClassicSparkSession]
    val parsed = classic.sessionState.sqlParser.parsePlan(sql)
    val bound = df.asInstanceOf[ClassicDataFrame].logicalPlan
    var hits = 0
    val substituted = parsed.transformUpWithSubqueries {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
          if u.multipartIdentifier.length == 1 &&
            u.multipartIdentifier.head.equalsIgnoreCase(name) =>
        hits += 1
        bound
    }
    require(hits > 0,
      s"DO_EXCHANGE sql must reference the uploaded relation '$name'")
    org.apache.spark.sql.classic.Dataset.ofRows(classic, substituted)
  }

  /** Decode an Arrow IPC stream into a DataFrame — the `do_put` ingest
    * direction. Reads batches with the stock Arrow reader, views each via
    * Spark's own `ArrowColumnVector`/`ColumnarBatch` (the same Arrow->row
    * path every columnar scan uses — full type matrix, no hand-rolled
    * value conversion), and parallelizes the rows into a DataFrame.
    *
    * The rows land on the driver first because they arrived over ONE
    * socket — exactly the reference's (unimplemented) DoPut shape, a
    * single gRPC stream into one node. This is the CDC/small-batch ingest
    * path; bulk data enters through the distributed sources.
    *
    * Leaves `in` OPEN (the caller still owes the client a status line on
    * the same socket).
    *
    * Because the whole stream lands on the driver, it MUST be bounded: a
    * single fat-fingered (or malicious) client would otherwise OOM the
    * driver that every other connection shares. `maxRows` caps the decoded
    * row count and `maxBytes` caps the Arrow child allocator (so even one
    * giant record batch is refused at allocation time, before it is
    * resident); both trip [[IngestLimitExceeded]].
    */
  def readBatches(
      in: InputStream,
      spark: SparkSession,
      maxRows: Long = Long.MaxValue,
      maxBytes: Long = Long.MaxValue
  ): DataFrame = {
    val classic = spark.asInstanceOf[ClassicSparkSession]
    val allocator =
      ArrowUtils.rootAllocator.newChildAllocator("graft-do-put", 0, maxBytes)
    val reader = new ArrowStreamReader(in, allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val schema = ArrowUtils.fromArrowSchema(root.getSchema)
      val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      var total = 0L
      var totalBytes = 0L
      while (reader.loadNextBatch()) {
        total += root.getRowCount
        if (total > maxRows)
          throw new IngestLimitExceeded(
            s"DO_PUT stream exceeds the $maxRows-row ingest bound")
        // maxBytes must bound the STREAM, not just one resident batch: the
        // allocator frees each batch's buffers on the next loadNextBatch,
        // but every decoded row is copied onto the driver heap below — so
        // account the Arrow buffer bytes cumulatively (the heap copies are
        // the same order of magnitude) and refuse past the cap. The
        // allocator limit remains the single-giant-batch defense.
        var c = 0
        while (c < root.getFieldVectors.size()) {
          totalBytes += root.getVector(c).getBufferSize
          c += 1
        }
        if (totalBytes > maxBytes)
          throw new IngestLimitExceeded(
            s"DO_PUT stream exceeds the $maxBytes-byte ingest bound")
        val cols = Array.tabulate[ColumnVector](root.getFieldVectors.size()) {
          i => new ArrowColumnVector(root.getVector(i))
        }
        val batch = new ColumnarBatch(cols, root.getRowCount)
        val it = batch.rowIterator()
        while (it.hasNext) rows += it.next().copy() // views over freed Arrow memory otherwise
      }
      classic.internalCreateDataFrame(
        classic.sparkContext.parallelize(rows.toSeq), schema)
    } catch {
      case _: org.apache.arrow.memory.OutOfMemoryException =>
        // unambiguous: ArrowUtils.rootAllocator is unbounded
        // (RootAllocator(Long.MaxValue)), so an Arrow OOM on this path can
        // only be the child allocator's maxBytes cap refusing one
        // oversized record batch — never server-side memory pressure
        // masquerading as the client's fault.
        throw new IngestLimitExceeded(
          s"DO_PUT stream exceeds the $maxBytes-byte ingest bound")
    } finally {
      reader.close( /* closeReadSource = */ false)
      allocator.close()
    }
  }
}
