package graft.engine

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Library-level serving surface mirroring the reference's Arrow Flight
  * handlers (crates/api/src/lib.rs:81-149):
  *
  *  - `flightInfo(sql)`  ≈ `get_flight_info`: plan the query, return the
  *    result schema without executing the full query.
  *  - `doGet(sql)`       ≈ `do_get`: execute and stream the result as
  *    bounded row batches.
  *
  * The reference collects every batch into memory before streaming
  * (api/src/lib.rs:121-148); here `toLocalIterator` pulls one partition at
  * a time through the driver, so serving a huge result holds at most one
  * partition in driver memory. Transport (gRPC/Arrow IPC) is a deployment
  * concern layered on top; the contract is (sql -> schema, batch stream).
  */
final class ServingShim(session: GraftSession, batchSize: Int = 1024) {

  /** Result schema for a query — planned, not executed. QUERIES only:
    * since Spark 3, `spark.sql` runs command plans (DDL, INSERT, SET)
    * EAGERLY, so letting one through would turn this schema probe into a
    * state-mutating call — they are rejected at parse time instead.
    */
  def flightInfo(sql: String): StructType = {
    requireQuery(sql)
    session.execute(sql).schema
  }

  /** The command guard alone — parse + reject commands/DML, NO analysis.
    * Callers that go on to execute the SQL themselves use this so the
    * statement is parsed and analyzed once, not twice (the schema-probe
    * analysis [[flightInfo]] adds is pure waste when the caller's own
    * `execute` produces the schema anyway).
    */
  def requireQuery(sql: String): Unit = {
    val parsed = session.spark.sessionState.sqlParser.parsePlan(sql)
    val mutating = parsed.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Command             => true
      case _: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement => true
      case _                                                                  => false
    }
    require(!mutating,
      "flightInfo plans queries only; commands/DML would execute eagerly")
  }

  /** Execute and stream: schema + an iterator of row batches (each at most
    * `batchSize` rows, mirroring the reference's RecordBatch granularity —
    * its scan batches are 1024 rows, parquet_scan.rs:54).
    */
  def doGet(sql: String): (StructType, Iterator[Seq[Row]]) = {
    val df = session.execute(sql)
    (df.schema, df.toLocalIterator().asScala.grouped(batchSize))
  }

  private implicit class IterConv[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
