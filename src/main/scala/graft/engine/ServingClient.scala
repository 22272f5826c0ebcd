package graft.engine

import java.io.BufferedInputStream
import java.net.Socket
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowStreamReader

/** Minimal client for [[ServingServer]] — what a user (or the spec) points
  * at the port. Speaks the one-request-per-connection protocol and decodes
  * the Arrow IPC payload with the stock Arrow reader, proving the bytes on
  * the wire are real Arrow streams, not a private format.
  */
object ServingClient {

  final case class Response(
      status: String, // "OK[ <n> <handle>]" or "ERR <CODE> <message>"
      columnNames: Seq[String],
      rows: Seq[Seq[Any]]
  ) {
    def isOk: Boolean = status == "OK" || status.startsWith("OK ")

    /** Partition tickets from a GET_FLIGHT_INFO `OK <n> <handle>` status —
      * one per result partition, each fetchable with its own DO_GET
      * connection (Flight's endpoint list).
      */
    def tickets: Seq[String] = status.split(' ') match {
      case Array("OK", n, handle) =>
        // total accessor: a malformed count degrades to no tickets, like
        // every other unrecognized status shape
        n.toIntOption.fold(Seq.empty[String])(c =>
          (0 until c).map(i => s"graft-ticket:$handle:$i"))
      case _ => Seq.empty
    }
  }

  /** One request round-trip. For OK responses the Arrow stream is fully
    * drained into driver-side values (fine for a client; the SERVER never
    * materializes more than a batch).
    */
  def request(
      port: Int,
      verb: String,
      payload: String = "",
      body: java.io.OutputStream => Unit = _ => (),
      auth: Option[String] = None
  ): Response = {
    val sock = new Socket("127.0.0.1", port)
    try {
      val out = sock.getOutputStream
      // token-protected server: handshake line precedes the request on
      // the SAME connection (the server reads the real verb after it)
      auth.foreach(tok =>
        out.write(s"HANDSHAKE $tok\n".getBytes(StandardCharsets.UTF_8)))
      val line = if (payload.isEmpty) verb else s"$verb $payload"
      out.write((line + "\n").getBytes(StandardCharsets.UTF_8))
      body(out) // DO_PUT's Arrow IPC stream; a no-op for every other verb
      out.flush()
      // half-close: the request is complete. A server-side body reader
      // sees EOF instead of waiting out its socket timeout on a body
      // that ends without Arrow's end-of-stream marker.
      sock.shutdownOutput()

      val in = new BufferedInputStream(sock.getInputStream)
      val status = readLine(in)
      if (!(status == "OK" || status.startsWith("OK ")))
        Response(status, Seq.empty, Seq.empty)
      else {
        val allocator = new RootAllocator(Long.MaxValue)
        val reader = new ArrowStreamReader(in, allocator)
        try {
          val root = reader.getVectorSchemaRoot
          val names = root.getSchema.getFields
          val nameSeq = (0 until names.size()).map(names.get(_).getName)
          val rows = ArrayBuffer.empty[Seq[Any]]
          while (reader.loadNextBatch()) {
            val n = root.getRowCount
            var i = 0
            while (i < n) {
              rows += (0 until root.getFieldVectors.size())
                .map(c => root.getVector(c).getObject(i))
              i += 1
            }
          }
          Response(status, nameSeq, rows.toSeq)
        } finally {
          reader.close()
          allocator.close()
        }
      }
    } finally sock.close()
  }

  def getFlightInfo(port: Int, sql: String): Response =
    request(port, "GET_FLIGHT_INFO", sql)

  def doGet(port: Int, sql: String): Response =
    request(port, "DO_GET", sql)

  /** Fetch one endpoint of a registered flight (a ticket from
    * [[Response.tickets]]) — the multi-connection scale path.
    */
  def doGetTicket(port: Int, ticket: String): Response =
    request(port, "DO_GET", ticket)

  /** Upload a DataFrame as the DO_PUT Arrow IPC body; the response's
    * columnNames echo the schema the server registered under `table`.
    */
  def doPut(
      port: Int,
      table: String,
      df: org.apache.spark.sql.DataFrame,
      batchSize: Int = 1024
  ): Response =
    request(port, "DO_PUT", table,
      body = out => {
        org.apache.spark.sql.GraftArrowBridge.writeBatches(df, batchSize, out)
        out.flush()
      })

  /** Bidirectional round trip: upload `df` as the exchange body, have the
    * server run `sql` with the uploaded batch bound as the relation
    * `input`, and decode the transformed rows from the response stream.
    */
  def doExchange(
      port: Int,
      sql: String,
      df: org.apache.spark.sql.DataFrame,
      batchSize: Int = 1024
  ): Response =
    request(port, "DO_EXCHANGE", sql,
      body = out => {
        org.apache.spark.sql.GraftArrowBridge.writeBatches(df, batchSize, out)
        out.flush()
      })

  def getSchema(port: Int, table: String): Response =
    request(port, "GET_SCHEMA", table)

  def listFlights(port: Int): Response =
    request(port, "LIST_FLIGHTS")

  /** Async submit (SQL payload) or progress poll (handle payload). The
    * status line is `OK <handle> <state> <doneTasks> <totalTasks>
    * <endpoints>[ <error>]`; [[Poll.parse]] decodes it.
    */
  def pollFlightInfo(port: Int, sqlOrHandle: String): Response =
    request(port, "POLL_FLIGHT_INFO", sqlOrHandle)

  def doAction(port: Int, action: String, arg: String = ""): Response =
    request(port, "DO_ACTION", if (arg.isEmpty) action else s"$action $arg")

  def listActions(port: Int): Response =
    request(port, "LIST_ACTIONS")

  /** Bare handshake: banner on an open server, auth check on a
    * token-protected one. For handshake-then-request on one connection,
    * pass `auth = Some(token)` to [[request]] instead.
    */
  def handshake(port: Int, token: String = ""): Response =
    request(port, "HANDSHAKE", token)

  /** Decoded POLL_FLIGHT_INFO status line. */
  final case class Poll(
      handle: String,
      state: String, // RUNNING | DONE | FAILED | CANCELLED
      doneTasks: Int,
      totalTasks: Int,
      endpoints: Int,
      error: String
  ) {
    def tickets: Seq[String] =
      if (state == "DONE" && endpoints > 0)
        (0 until endpoints).map(i => s"graft-ticket:$handle:$i")
      else Seq.empty
  }

  object Poll {
    def parse(status: String): Option[Poll] = status.split(' ').toSeq match {
      case "OK" +: handle +: state +: done +: total +: eps +: rest =>
        for {
          d <- done.toIntOption
          t <- total.toIntOption
          e <- eps.toIntOption
        } yield Poll(handle, state, d, t, e, rest.mkString(" "))
      case _ => None
    }
  }

  private def readLine(in: java.io.InputStream): String = {
    // byte-at-a-time (must not over-read into the Arrow stream), decoded
    // as UTF-8 at the end — per-byte toChar would mangle any non-ASCII in
    // an error status line
    val buf = new java.io.ByteArrayOutputStream
    var b = in.read()
    while (b != -1 && b != '\n') {
      buf.write(b)
      b = in.read()
    }
    new String(buf.toByteArray, StandardCharsets.UTF_8)
  }
}
