package org.apache.spark.sql

import java.io.OutputStream

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame}
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils

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
    val schema = classic.schema
    val tz = classic.sparkSession.sessionState.conf.sessionLocalTimeZone
    val arrowSchema =
      ArrowUtils.toArrowSchema(schema, tz,
        errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val allocator =
      ArrowUtils.rootAllocator.newChildAllocator("graft-do-get", 0, Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    try {
      val writer = ArrowWriter.create(root)
      val ipc = new ArrowStreamWriter(root, null, out)
      ipc.start()
      // toRdd yields REUSED UnsafeRow buffers — they must be copied inside
      // the task before crossing to the driver, or every row in a collected
      // partition aliases the same (freed) buffer
      val rows = classic.queryExecution.toRdd.map(_.copy()).toLocalIterator
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
}
