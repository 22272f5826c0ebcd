package graft.engine

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream}
import java.net.{InetAddress, ServerSocket, Socket, SocketException, SocketTimeoutException}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{LinkedBlockingQueue, ThreadPoolExecutor, TimeUnit}

/** Network serving endpoint — the reference's Arrow Flight surface
  * (crates/api/src/lib.rs:60-190, served by tonic on :50051,
  * crates/coordinator/src/main.rs:66-77) re-expressed over a plain TCP
  * socket: gRPC isn't available offline, but the SEMANTICS and the wire
  * payload (Arrow IPC streams) are the reference's.
  *
  * Protocol, one request per connection:
  *   request  = one UTF-8 line: `VERB[ payload]\n` (SQL must be one line);
  *     DO_PUT is followed by an Arrow IPC stream on the same connection
  *   response = status line, then for OK an Arrow IPC stream:
  *     `GET_FLIGHT_INFO <sql>` -> `OK <n> <handle>\n` + IPC stream carrying
  *        ONLY the schema. The n ENDPOINTS are the reference FlightInfo's
  *        endpoint list (api/src/lib.rs:81-99): partition i of the result
  *        is fetched with ticket `graft-ticket:<handle>:<i>`, and the n
  *        fetches can run over n CONCURRENT connections — the scale story
  *        gRPC Flight tells with one ticket per partition. The result RDD
  *        is registered (persisted, LRU-bounded) under <handle>; counting
  *        its endpoints finalizes the adaptive plan, which EXECUTES the
  *        query's shuffle stages up front — the FlightInfo readiness
  *        contract — but no result rows reach the driver until a ticket
  *        is fetched. (The reference executes AND COLLECTS the whole
  *        result just to build FlightInfo, api/src/lib.rs:92-98; a
  *        client that wants a registered table's schema with zero
  *        execution uses GET_SCHEMA, and the in-process
  *        ServingShim.flightInfo stays planning-only.)
  *     `DO_GET <sql>`          -> `OK\n` + IPC stream of <=batchSize-row
  *        record batches (reference: batches_to_flight_data,
  *        api/src/lib.rs:122-148). A payload of the form
  *        `graft-ticket:<handle>:<i>` instead streams ONLY partition i of
  *        the registered flight (`ERR NOT_FOUND` once the handle ages out
  *        of the LRU; `ERR INVALID_ARGUMENT` for an out-of-range index) —
  *        Flight's ticket-dispatch semantics, where the DO_GET payload is
  *        whatever GET_FLIGHT_INFO issued.
  *     `DO_PUT <table>` + IPC  -> decodes the client's Arrow stream,
  *        registers it as `<table>`, answers `OK\n` + a schema-only IPC
  *        stream of what was registered. The reference DECLARES DoPut and
  *        leaves it unimplemented (api/src/lib.rs:151-156); implementing
  *        it closes the ingest->query->serve loop its CDC story promises.
  *        Streams past `maxPutRows`/`maxPutBytes` answer
  *        `ERR RESOURCE_EXHAUSTED` — ingest lands on the driver, so the
  *        bound is what keeps one client from OOMing everyone's server.
  *     `DO_EXCHANGE <sql>` + IPC -> the bidirectional verb: decodes the
  *        client's Arrow stream, binds it as the relation `input` in the
  *        SQL (plan-level substitution, no catalog registration — so
  *        concurrent exchanges can't collide on a shared view name and
  *        `input` shadows any real table for exactly this query), executes,
  *        answers `OK\n` + IPC stream of the transformed rows. Upload the
  *        batch, transform it server-side against the full catalog (joins
  *        against registered tables work), download the result — one round
  *        trip. Same ingest bounds and status-then-drain discipline as
  *        DO_PUT; SQL that never references `input`, or is a command, is
  *        refused before the body is decoded. (The reference DECLARES
  *        DoExchange and leaves it unimplemented, api/src/lib.rs:158-190.)
  *     `GET_SCHEMA <table|sql>` -> `OK\n` + schema-only IPC stream of a
  *        registered table, or the PLANNED (never executed) schema of a
  *        SQL payload — the zero-cost schema probe (reference:
  *        unimplemented, api/src/lib.rs).
  *     `LIST_FLIGHTS`          -> `OK\n` + IPC stream of one batch with
  *        (kind, name, partitions) rows: the catalog's tables
  *        (kind=table, partitions=-1 — planning cost, not paid here) and
  *        every LIVE registered flight (kind=flight, name=the dispatch
  *        handle, partitions=its endpoint count) — what a second client
  *        needs to discover and fetch in-flight results (reference:
  *        unimplemented, api/src/lib.rs:77-79).
  *     `POLL_FLIGHT_INFO <sql>` -> ASYNC submit: the query starts executing
  *        in a dedicated Spark job group and the response returns
  *        immediately as `OK <handle> RUNNING 0 0 -1\n` + empty-schema IPC.
  *        `POLL_FLIGHT_INFO <handle>` (a whitespace-free payload is a
  *        handle, anything else is SQL) then reports
  *        `OK <handle> <RUNNING|DONE|FAILED|CANCELLED> <doneTasks>
  *        <totalTasks> <endpoints>[ <error>]\n` + schema IPC once known —
  *        task counts come from the job group's stages via the status
  *        tracker, so a 100-TB query shows real progress. On DONE the
  *        flight is registered exactly like GET_FLIGHT_INFO's and its
  *        `graft-ticket:<handle>:<i>` endpoints fetch as usual. This is
  *        Flight's PollFlightInfo long-query contract; the reference
  *        declares it and leaves it unimplemented (api/src/lib.rs:67-75).
  *     `DO_ACTION cancel <handle>` -> cancels the handle's Spark job group
  *        (interrupting running tasks), unpins/unpersists its result, and
  *        answers `OK\n` + a one-row IPC batch (action, handle, outcome) —
  *        the dropped-client story: a flight no longer waits for LRU
  *        pressure once the client gives up. `ERR NOT_FOUND` for an
  *        unknown handle. (Reference: DoAction unimplemented,
  *        api/src/lib.rs:158-165.)
  *     `DO_ACTION mv_describe` -> the MV freshness contract: one row per
  *        registered materialized view (plans.MvCatalog) with the
  *        registrant-declared applied-source-snapshot watermark, the
  *        LIVE source head when the base is an Iceberg table, and a
  *        `fresh` verdict — so a client can tell how stale an answer
  *        the optimizer rewrote to a view is. A JOIN view is stale when
  *        EITHER source moved: its dim-side cursor (JoinMvDef
  *        .dimWatermark) is ANDed into the verdict while the wire row
  *        keeps the fact-side columns.
  *     `DO_ACTION ann_probe <store_root> <k> <nProbe> <v1,v2,...>` ->
  *        top-k cosine neighbors streamed from a stored incremental IVF
  *        index (operators.IvfStore) — similarity search served without
  *        a SQL round-trip; argument/store errors refuse before OK.
  *     `DO_ACTION mv_refresh <name>` -> refresh an advisor-built MV by
  *        registered name: the def reconstructs its recommendation
  *        (plans.MvAdvisor.fromDef), the churn-scoped step brings the
  *        stored view to the source head and re-registers the new
  *        version — the wire face of the advisor lifecycle
  *        (advise -> materialize -> stale -> mv_refresh -> fresh).
  *        Join views refresh too (plans.MvAdvisor.fromJoinDef); their
  *        rows carry the applied dim-side cursor as well.
  *     `DO_ACTION mv_maintain` -> catalog-wide maintenance sweep
  *        (plans.MvAdvisor.maintainAll): refresh every stale
  *        advisor-built view AND every registered index store
  *        (operators.StoreCatalog — minhash/ivf with source lineage
  *        get one changelog refresh step) in one action, one row per
  *        registered view/store — stale verdict + applied snapshot(s),
  *        or the reason it was skipped (hand-declared, no lineage,
  *        per-entry error). When a catalog_load ran on this server, the
  *        sweep AUTOSAVES the registry back to that path and appends a
  *        `__catalog_autosave` row with the outcome (round 18) — the
  *        load -> sweep -> save loop collapses to load -> sweep.
  *     `DO_ACTION stream_view_describe <view> <source> [<wm_col>]` ->
  *        freshness of a streaming MV (streaming/MaterializedAgg):
  *        the view's applied watermark, the live source head, and a
  *        `fresh` verdict — the streaming counterpart of mv_describe.
  *     `DO_ACTION store_compact <kind> <root> [nFiles]` -> offline
  *        store maintenance (kind = minhash | ivf | split): fold the
  *        store's segment history via its own compact; the work runs
  *        BEFORE the status so failures refuse cleanly. Single-writer
  *        contract: quiesce that store's writers for the duration.
  *     `DO_ACTION table_maintain <table_root> [retain_ms]` -> the
  *        Iceberg nightly-job policy (sources.IcebergMaintenance) over
  *        the wire; answers the maintenance report row.
  *     `DO_ACTION store_describe <kind> <root>` -> the stores'
  *        maintenance-pressure gauge (version, live segments, live
  *        tombstone lists, per-kind detail; metadata-only), plus —
  *        for a root registered in StoreCatalog with lineage — the
  *        FRESHNESS verdict (watermark vs live source head, round 18):
  *        one verb answers both "is compaction due" and "is this
  *        store stale".
  *     `DO_ACTION advise [<sql>]` -> the MV + index advisor
  *        (plans.MvAdvisor) over the wire: rollup/multiplicity/join/
  *        ivf_index/minhash_index recommendations + rejection
  *        reasons — for one single-line SQL statement, or,
  *        with no argument, folded over the session's OBSERVED query
  *        history (GraftSession's bounded side-effect-free log);
  *        reports only, materializes nothing.
  *     `DO_ACTION store_autopilot [threshold]` -> compaction autopilot
  *        over the REGISTERED stores (operators.StoreMaintenance
  *        .autopilot): gauge each, compact those above the live-segment
  *        threshold (default 8); one row per store, per-store errors as
  *        rows — covers lineage-less registrations the refresh sweep
  *        skips.
  *     `DO_ACTION catalog_save <path>` / `catalog_load <path>` -> the
  *        durable registry (plans.CatalogPersistence): snapshot every
  *        MV + store def to one atomic JSON file / reload it additively
  *        (replace-by-name, missing artifacts skipped with the reason).
  *        load -> mv_maintain -> save is the maintainer restart loop:
  *        cursors resume at their saved watermarks, so a restart costs
  *        O(downtime churn), never an O(corpus) re-materialize.
  *     `LIST_ACTIONS`          -> `OK\n` + IPC batch of (action,
  *        description) rows — the discovery face of DO_ACTION.
  *     `HANDSHAKE [token]`     -> auth. With no server token configured the
  *        server is open: `OK graft-serving 1\n` + empty-schema IPC. With
  *        `authToken` configured, the FIRST line of every connection must
  *        be a valid `HANDSHAKE <token>`; the REAL request follows on the
  *        next line of the same connection (Flight's
  *        handshake-then-call on one channel). A wrong token or a bare
  *        request answers `ERR UNAUTHENTICATED`.
  *     empty payload           -> `ERR INVALID_ARGUMENT ...` (reference:
  *        Status::invalid_argument, api/src/lib.rs:88-90).
  *     anything else           -> `ERR INVALID_ARGUMENT unknown method`
  *     execution failure       -> `ERR INTERNAL <first line of message>`
  *
  * Scale/robustness: accept loop + worker pool are daemon threads; a SQL
  * DO_GET streams through `toLocalIterator` (at most one partition on the
  * driver), and a TICKET DO_GET pages its partition in `ticketChunkRows`
  * slices (at most one chunk on the driver — a skewed multi-GB partition
  * cannot OOM the serving tier). The
  * pool is BOUNDED (maxWorkers threads, 2x queue, overflow refused with
  * `ERR RESOURCE_EXHAUSTED`) and the request line has a read timeout
  * (`ERR DEADLINE_EXCEEDED`), so idle or slow-loris clients can neither
  * pin threads forever nor grow them without bound.
  */
final class ServingServer(
    session: GraftSession,
    port: Int = 0, // 0 = ephemeral; boundPort tells the truth
    batchSize: Int = 1024,
    maxWorkers: Int = 16, // driver-side query threads; bounded by design
    requestTimeoutMs: Int = 30000, // max wait for the request line
    // DO_PUT ingest bounds: the decoded stream lands in driver memory, so
    // an unbounded put is a one-client driver OOM. Past either cap the
    // client gets `ERR RESOURCE_EXHAUSTED` (back off / shrink), matching
    // the pool-overflow vocabulary above. Bulk loads belong in the
    // distributed sources, not this CDC-sized verb.
    maxPutRows: Long = 1L << 20, // 1M rows
    maxPutBytes: Long = 256L << 20, // 256 MiB of Arrow buffers
    // registered-flight bound: each GET_FLIGHT_INFO pins one (lazy) result
    // RDD until LRU eviction or close — the cap is what keeps a client
    // looping flight-info from accumulating persisted results. Size it to
    // how many in-flight result sets the executors can afford to cache.
    maxFlights: Int = 32,
    // per-ticket streaming unit: a ticket fetch holds at most this many
    // rows on the driver at once (each chunk is one bounded job over the
    // persisted flight RDD), so a skewed multi-GB partition can't OOM the
    // serving tier. Small values trade extra jobs for tighter memory.
    ticketChunkRows: Int = 1 << 16,
    // registered-flight time-to-live: an ABANDONED flight (client gone,
    // no ticket fetched for this long) unpersists without waiting for LRU
    // pressure — the other half of the maxFlights bound. Ticket fetches
    // refresh the clock; <=0 disables expiry. Swept lazily on access and
    // by a background thread, so an idle server releases memory too.
    flightTtlMs: Long = 10 * 60 * 1000L,
    // optional shared-secret auth: when set, every connection must open
    // with `HANDSHAKE <token>` before its request line (Flight's
    // Handshake). None = open server (the default; loopback-only anyway).
    authToken: Option[String] = None
) extends AutoCloseable {

  /** One registered flight: the result's schema plus its persisted
    * InternalRow RDD — each partition is an endpoint. `touched` is the
    * TTL clock, refreshed by ticket fetches.
    */
  private final case class Flight(
      schema: org.apache.spark.sql.types.StructType,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      touched: java.util.concurrent.atomic.AtomicLong =
        new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
  )

  /** One async (POLL_FLIGHT_INFO-submitted) query: terminal state machine
    * RUNNING -> DONE | FAILED | CANCELLED. The runner thread owns the
    * transition to DONE/FAILED; DO_ACTION cancel owns CANCELLED (set
    * BEFORE cancelJobGroup so the runner's failure handler knows not to
    * relabel the interrupt as FAILED).
    */
  private final class Pending(val handle: String, val jobGroup: String) {
    @volatile var state: String = "RUNNING"
    @volatile var error: String = ""
    @volatile var endpoints: Int = -1
    @volatile var schema: org.apache.spark.sql.types.StructType = _
    val createdNanos: Long = System.nanoTime()
  }

  private val pending =
    new java.util.concurrent.ConcurrentHashMap[String, Pending]()

  private val TicketPrefix = "graft-ticket:"
  private val handleCounter = new java.util.concurrent.atomic.AtomicLong()
  // LRU by ACCESS order: a client fetching tickets keeps its flight live;
  // evicted flights unpersist their cached partitions. Bounded so a
  // client looping GET_FLIGHT_INFO can't accumulate persisted RDDs.
  private val flights =
    new java.util.LinkedHashMap[String, Flight](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Flight]): Boolean = {
        val evict = size() > maxFlights
        if (evict) {
          e.getValue.rdd.unpersist(false)
          // keep `pending` in step (like sweepExpired does): a DONE poll
          // entry whose flight was LRU-evicted would otherwise keep
          // answering DONE with tickets that all NOT_FOUND — a
          // permanently lying status with no resubmit signal
          pending.remove(e.getKey)
        }
        evict
      }
    }

  // DO_PUT table names go straight into the catalog — keep them plain
  // identifiers so a payload can never smuggle SQL into view registration
  private val TableName = "[A-Za-z_][A-Za-z0-9_]{0,127}".r

  private val server =
    new ServerSocket(port, 64, InetAddress.getLoopbackAddress)
  // Bounded pool + bounded queue (round-3 ADVICE): an unbounded cached
  // pool lets slow/idle clients each pin a thread running driver-side
  // query work — local resource exhaustion even on loopback. Overflow
  // beyond maxWorkers live + 2*maxWorkers queued is REJECTED, and the
  // rejection handler refuses the connection with a status line instead
  // of silently dropping it.
  private val pool = new ThreadPoolExecutor(
    maxWorkers, maxWorkers, 30L, TimeUnit.SECONDS,
    new LinkedBlockingQueue[Runnable](maxWorkers * 2),
    (r: Runnable) => {
      val t = new Thread(r, "graft-serve-worker")
      t.setDaemon(true)
      t
    },
    (r: Runnable, _: ThreadPoolExecutor) =>
      r match {
        case h: ServingHandler => h.reject()
        case _                 => // non-handler runnable: nothing to refuse
      }
  )
  pool.allowCoreThreadTimeOut(true)
  @volatile private var closed = false

  // the durable-catalog path the LAST successful catalog_load read —
  // mv_maintain autosaves the registry back to it post-sweep (round 18):
  // the crash window between a sweep and its catalog_save is exactly
  // what the stores' prefix-skip machinery absorbs, but shrinking it is
  // free. Server-scoped on purpose: the registries the path snapshots
  // are process-wide too.
  @volatile private var loadedCatalogPath: Option[String] = None

  /** The actually-bound port (differs from `port` when 0 was requested). */
  def boundPort: Int = server.getLocalPort

  def start(): this.type = {
    val acceptor = new Thread(
      () =>
        while (!closed) {
          try {
            val sock = server.accept()
            pool.execute(new ServingHandler(sock, handle, () => closed))
          } catch {
            case _: SocketException if closed => // normal shutdown
            case e: Throwable if !closed =>
              // transient accept/submit failure (fd exhaustion, race with
              // close): log and keep accepting — a dead acceptor behind a
              // live port is undiagnosable from the client side. The
              // short sleep keeps a PERSISTENT failure (fd limit hit)
              // from busy-spinning a core and flooding stderr, which
              // would make recovering from the exhaustion itself harder.
              System.err.println(s"[graft-serve] accept failed: ${e.getMessage}")
              try Thread.sleep(100L)
              catch { case _: InterruptedException => () }
          }
        },
      "graft-serve-accept"
    )
    acceptor.setDaemon(true)
    acceptor.start()
    if (flightTtlMs > 0) {
      // background expiry: an IDLE server must release abandoned flights
      // too — lazy on-access sweeping alone only fires when someone asks
      val sweeper = new Thread(
        () => {
          var interrupted = false
          while (!closed && !interrupted) {
            try Thread.sleep(math.max(50L, math.min(flightTtlMs / 4, 60000L)))
            catch { case _: InterruptedException => interrupted = true }
            if (!closed && !interrupted) sweepExpired()
          }
        },
        "graft-serve-sweeper"
      )
      sweeper.setDaemon(true)
      sweeper.start()
    }
    this
  }

  /** Drop flights idle past the TTL (unpersisting their RDDs) and prune
    * terminal pending entries of the same age — both maps stay bounded by
    * time as well as by count.
    */
  private def sweepExpired(): Unit = {
    if (flightTtlMs <= 0) return
    val now = System.nanoTime()
    val ttlNanos = flightTtlMs * 1000000L
    flights.synchronized {
      val it = flights.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (now - e.getValue.touched.get() > ttlNanos) {
          try e.getValue.rdd.unpersist(false)
          catch { case _: Throwable => () }
          pending.remove(e.getKey)
          it.remove()
        }
      }
    }
    // terminal pending entries without a live flight (FAILED, CANCELLED,
    // or DONE-then-expired) age out on the same clock
    val pit = pending.entrySet().iterator()
    while (pit.hasNext) {
      val e = pit.next()
      if (e.getValue.state != "RUNNING" && now - e.getValue.createdNanos > ttlNanos &&
          !flights.synchronized(flights.containsKey(e.getKey)))
        pit.remove()
    }
  }

  /** (completedTasks, totalTasks) across every stage the handle's job
    * group has submitted so far — the poll progress a client sees.
    */
  private def groupProgress(jobGroup: String): (Int, Int) = {
    val st = session.spark.sparkContext.statusTracker
    val stages = st
      .getJobIdsForGroup(jobGroup)
      .toSeq
      .flatMap(id => st.getJobInfo(id).toSeq)
      .flatMap(_.stageIds().toSeq)
      .distinct
      .flatMap(sid => st.getStageInfo(sid).toSeq)
    (stages.map(_.numCompletedTasks()).sum, stages.map(_.numTasks()).sum)
  }

  private def handle(sock: Socket): Unit = {
    def closeQuietly(): Unit =
      try sock.close()
      catch { case _: Throwable => () }
    // a client that connects and never sends the request line would pin
    // this worker forever in readLine without a read timeout. Failures
    // BEFORE the main try own the close themselves — a bare return (or a
    // getOutputStream throw) would otherwise leak the fd and, for the
    // throw, kill the pool worker.
    try sock.setSoTimeout(requestTimeoutMs)
    catch { case _: SocketException => closeQuietly(); return } // already closed
    val out =
      try new BufferedOutputStream(sock.getOutputStream)
      catch { case _: Throwable => closeQuietly(); return }
    var statusSent = false
    def status(line: String): Unit = {
      statusSent = true
      out.write((line + "\n").getBytes(StandardCharsets.UTF_8))
      out.flush()
    }
    try {
      // byte-level line read, NOT a Reader: a DO_PUT request line is
      // followed by raw Arrow IPC bytes on the same stream, and a
      // char-decoding reader would buffer-ahead into (and mangle) them
      val in = new BufferedInputStream(sock.getInputStream)
      def parseLine(line: String): (String, String) = line.indexOf(' ') match {
        case -1 => (line.trim, "")
        case i  => (line.substring(0, i), line.substring(i + 1).trim)
      }
      var (verb, payload) = parseLine(readRequestLine(in))
      if (verb == "HANDSHAKE") {
        if (authToken.exists(_ != payload)) {
          status("ERR UNAUTHENTICATED invalid token")
          return
        }
        // authenticated (or open server): the real request may follow on
        // the SAME connection; a bare handshake gets the banner
        val next = readRequestLine(in)
        if (next.isEmpty) {
          status("OK graft-serving 1")
          org.apache.spark.sql.GraftArrowBridge.writeSchemaOnly(
            new org.apache.spark.sql.types.StructType(),
            session.spark.sessionState.conf.sessionLocalTimeZone,
            out
          )
          out.flush()
          return
        }
        val (v2, p2) = parseLine(next)
        verb = v2
        payload = p2
      } else if (authToken.isDefined) {
        status("ERR UNAUTHENTICATED handshake required")
        return
      }
      verb match {
        case "GET_FLIGHT_INFO" =>
          if (payload.isEmpty)
            status("ERR INVALID_ARGUMENT No SQL command in request")
          else {
            // query-only guard (parse-level, no analysis: the execute on
            // the next line is the ONE parse+analyze this request pays)
            session.serving.requireQuery(payload)
            val (schema, rdd) = org.apache.spark.sql.GraftArrowBridge
              .resultRdd(session.execute(payload))
            rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            val handle = java.lang.Long.toHexString(
              handleCounter.incrementAndGet()) + "f" +
              java.lang.Integer.toHexString(
                System.identityHashCode(rdd))
            sweepExpired()
            flights.synchronized { flights.put(handle, Flight(schema, rdd)) }
            status(s"OK ${rdd.getNumPartitions} $handle")
            org.apache.spark.sql.GraftArrowBridge.writeSchemaOnly(
              schema,
              session.spark.sessionState.conf.sessionLocalTimeZone,
              out
            )
            out.flush()
          }
        case "DO_GET" if payload.startsWith(TicketPrefix) =>
          // Flight ticket dispatch: stream exactly one endpoint/partition
          val rest = payload.stripPrefix(TicketPrefix)
          val cut = rest.lastIndexOf(':')
          val idx =
            if (cut < 0) -1
            else
              try rest.substring(cut + 1).toInt
              catch { case _: NumberFormatException => -1 }
          sweepExpired() // expired handles must answer NOT_FOUND, not serve
          val flight =
            if (cut < 0) None
            else flights.synchronized(Option(flights.get(rest.substring(0, cut))))
          flight.foreach(_.touched.set(System.nanoTime())) // TTL clock
          (flight, idx) match {
            case (_, i) if cut < 0 || i < 0 =>
              status(s"ERR INVALID_ARGUMENT malformed ticket '$payload'")
            case (None, _)
                if Option(pending.get(rest.substring(0, cut)))
                  .exists(_.state == "RUNNING") =>
              // an async flight that hasn't finished is not "unknown" —
              // tell the client to keep polling instead of giving up
              status("ERR UNAVAILABLE flight is still RUNNING " +
                s"(POLL_FLIGHT_INFO ${rest.substring(0, cut)})")
            case (None, _) =>
              status("ERR NOT_FOUND unknown or expired flight handle")
            case (Some(f), i) if i >= f.rdd.getNumPartitions =>
              status(
                s"ERR INVALID_ARGUMENT ticket partition $i out of range " +
                  s"(flight has ${f.rdd.getNumPartitions})")
            case (Some(f), i) =>
              // stream the partition in bounded chunks. The FIRST chunk is
              // executed BEFORE the OK, so execution failures still arrive
              // as a status line; driver memory is then bounded by one
              // chunk (ticketChunkRows rows), not the whole partition. A
              // chunk-fetch failure mid-stream falls under the same
              // contract as DO_GET mid-stream: abort the connection, never
              // splice text into Arrow bytes.
              val chunks = org.apache.spark.sql.GraftArrowBridge
                .partitionChunks(session.spark, f.rdd, i, ticketChunkRows)
              val first = chunks.next()
              status("OK")
              org.apache.spark.sql.GraftArrowBridge.writeRows(
                f.schema,
                session.spark.sessionState.conf.sessionLocalTimeZone,
                first.iterator ++ chunks.flatMap(_.iterator),
                batchSize,
                out
              )
              out.flush()
          }
        case "DO_GET" =>
          if (payload.isEmpty)
            status("ERR INVALID_ARGUMENT No SQL command in request")
          else {
            // same query-only guard as every other SQL verb: DO_GET was
            // the one door a command (DROP/INSERT) could walk through —
            // mutating shared catalog state via the read verb
            session.serving.requireQuery(payload)
            val df = session.execute(payload)
            // force parse/analysis/optimization/physical planning BEFORE
            // the OK goes out: plan-time failures must arrive as a status
            // line, not as garbage inside an Arrow stream
            df.queryExecution.executedPlan
            status("OK")
            try {
              org.apache.spark.sql.GraftArrowBridge.writeBatches(df, batchSize, out)
              out.flush()
            } catch {
              case e: Throwable =>
                // runtime failure mid-stream: the status channel is spent.
                // Abort the connection so the client's Arrow reader sees a
                // truncated stream (same contract as a dropped Flight
                // stream) — NEVER append text into the IPC bytes.
                System.err.println(
                  s"[graft-serve] DO_GET failed mid-stream: ${e.getMessage}")
                throw e
            }
          }
        case "DO_PUT" =>
          payload match {
            case "" =>
              status("ERR INVALID_ARGUMENT No table name in request")
            case TableName() =>
              try {
                // decode BEFORE the OK: a malformed IPC payload must come
                // back as a status line, not a half-registered table
                val df = org.apache.spark.sql.GraftArrowBridge
                  .readBatches(in, session.spark, maxPutRows, maxPutBytes)
                session.registerTable(payload, df)
                status("OK")
                org.apache.spark.sql.GraftArrowBridge.writeSchemaOnly(
                  df.schema,
                  session.spark.sessionState.conf.sessionLocalTimeZone,
                  out
                )
                out.flush()
              } catch {
                case e: org.apache.spark.sql.IngestLimitExceeded =>
                  // over-limit put: the client's fault, not the server's —
                  // same vocabulary as pool overflow so retry loops back off
                  status(s"ERR RESOURCE_EXHAUSTED ${e.getMessage}")
                  // drain (bounded) what the client already sent: closing
                  // with bytes unread RSTs the connection, which on Linux
                  // flushes the receive queue and can destroy the status
                  // line before the client reads it. The cap is scaled to
                  // the configured bound (a barely-over-limit client's
                  // whole stream fits and gets the clean status); only a
                  // genuine firehose — more than 2x the allowed bytes —
                  // is cut off with the RST it earned.
                  drain(in, cap =
                    if (maxPutBytes > Long.MaxValue / 2) Long.MaxValue
                    else math.max(16L << 20, 2 * maxPutBytes))
                case e if scala.util.control.NonFatal(e) && !statusSent =>
                  // malformed payload (not Arrow, truncated stream, ...):
                  // same status-then-drain discipline — an ERR INTERNAL
                  // the client never reads because close() RST'd their
                  // half-written body is indistinguishable from a crash.
                  // The !statusSent guard matters: a failure AFTER the OK
                  // (schema echo mid-write) must fall through to the
                  // outer handler's abort-the-connection contract, never
                  // splice a second status line into Arrow bytes.
                  status(s"ERR INTERNAL ${firstLine(e)}")
                  drain(in, cap = 16L << 20)
              }
            case bad =>
              status(s"ERR INVALID_ARGUMENT invalid table name '$bad'")
          }
        case "DO_EXCHANGE" =>
          if (payload.isEmpty)
            status("ERR INVALID_ARGUMENT No SQL command in request")
          else {
            try {
              // refuse BEFORE decoding the body: commands and SQL that
              // never references `input` answer on the status line and
              // drain what the client already sent (DO_PUT's discipline).
              // Both checks are parse-level — a refused request must not
              // first land maxPutBytes of Arrow on the driver heap.
              session.serving.requireQuery(payload)
              require(org.apache.spark.sql.GraftArrowBridge
                .referencesRelation(session.spark, payload, "input"),
                "DO_EXCHANGE sql must reference the uploaded relation 'input'")
              val df = org.apache.spark.sql.GraftArrowBridge
                .readBatches(in, session.spark, maxPutRows, maxPutBytes)
              val result = org.apache.spark.sql.GraftArrowBridge
                .sqlOver(session.spark, payload, "input", df)
              // force planning before the OK: analysis failures (bad
              // column against the uploaded schema) must arrive as a
              // status line, not garbage inside an Arrow stream
              result.queryExecution.executedPlan
              status("OK")
              org.apache.spark.sql.GraftArrowBridge.writeBatches(result, batchSize, out)
              out.flush()
            } catch {
              case e: org.apache.spark.sql.IngestLimitExceeded =>
                status(s"ERR RESOURCE_EXHAUSTED ${e.getMessage}")
                drain(in, cap =
                  if (maxPutBytes > Long.MaxValue / 2) Long.MaxValue
                  else math.max(16L << 20, 2 * maxPutBytes))
              case e if scala.util.control.NonFatal(e) && !statusSent =>
                // refused SQL, malformed payload, analysis failure: the
                // status line answers; a failure AFTER the OK falls through
                // to the outer abort-the-connection contract
                status(s"ERR INTERNAL ${firstLine(e)}")
                drain(in, cap = 16L << 20)
            }
          }
        case "GET_SCHEMA" =>
          if (payload.isEmpty)
            status("ERR INVALID_ARGUMENT No table name in request")
          else {
            // a registered table's schema, or — for any payload that is
            // not a plain identifier — the PLANNED schema of a SQL query:
            // the zero-execution schema probe GET_FLIGHT_INFO gave up
            // when it took on endpoint registration (planning never runs
            // a job; failures surface as ERR INTERNAL)
            val schema = payload match {
              case TableName() => session.table(payload).schema
              case sql         => session.serving.flightInfo(sql)
            }
            status("OK")
            org.apache.spark.sql.GraftArrowBridge.writeSchemaOnly(
              schema,
              session.spark.sessionState.conf.sessionLocalTimeZone,
              out
            )
            out.flush()
          }
        case "LIST_FLIGHTS" =>
          sweepExpired()
          val catalog = session.tableNames.sorted
            .map(n => ("table", n, -1L))
          val active = flights.synchronized {
            import scala.jdk.CollectionConverters._
            // entry iteration does not perturb the LRU (only get/put do)
            flights.entrySet().asScala.toSeq.map(e =>
              ("flight", e.getKey, e.getValue.rdd.getNumPartitions.toLong))
          }.sortBy(_._2)
          val submitted = {
            import scala.jdk.CollectionConverters._
            // in-flight async submissions a second client can poll/cancel
            pending.asScala.toSeq
              .filter(e => e._2.state == "RUNNING")
              .map(e => ("pending", e._1, -1L))
              .sortBy(_._2)
          }
          val listing = {
            import session.spark.implicits._
            (catalog ++ active ++ submitted).toDF("kind", "name", "partitions")
          }
          status("OK")
          org.apache.spark.sql.GraftArrowBridge.writeBatches(listing, batchSize, out)
          out.flush()
        case "POLL_FLIGHT_INFO" =>
          // a payload is a handle iff it MATCHES the server's own handle
          // shape (hex 'p' hex) or names a live pending entry — never a
          // whitespace heuristic, which would misroute whitespace-free
          // SQL like `select(1)` to NOT_FOUND instead of submitting it
          val isHandle = pending.containsKey(payload) ||
            payload.matches("[0-9a-f]+p[0-9a-f]+")
          if (payload.isEmpty)
            status("ERR INVALID_ARGUMENT No SQL command or handle in request")
          else if (isHandle) {
            sweepExpired()
            Option(pending.get(payload)) match {
              case None =>
                status("ERR NOT_FOUND unknown or expired flight handle")
              case Some(p) =>
                // an actively-polling client is not "abandoned": refresh
                // the flight's TTL clock so it cannot expire mid-poll-loop
                flights.synchronized(Option(flights.get(p.handle)))
                  .foreach(_.touched.set(System.nanoTime()))
                val (done, total) = groupProgress(p.jobGroup)
                val err = if (p.state == "FAILED") s" ${p.error}" else ""
                status(s"OK ${p.handle} ${p.state} $done $total ${p.endpoints}$err")
                org.apache.spark.sql.GraftArrowBridge.writeSchemaOnly(
                  Option(p.schema)
                    .getOrElse(new org.apache.spark.sql.types.StructType()),
                  session.spark.sessionState.conf.sessionLocalTimeZone,
                  out
                )
                out.flush()
            }
          } else {
            // SQL payload = async submit. Refusals (commands, parse-level
            // junk) surface synchronously; execution runs on a dedicated
            // daemon thread under a per-flight job group so poll sees its
            // stages and cancel can interrupt its tasks.
            session.serving.requireQuery(payload)
            sweepExpired()
            import scala.jdk.CollectionConverters._
            // count-bound the pending map INDEPENDENTLY of the TTL: with
            // expiry disabled (flightTtlMs <= 0) sweepExpired no-ops and
            // terminal entries would otherwise accumulate forever — the
            // RUNNING gate below only bounds live work, not history.
            // Oldest terminal entries go first. Terminal entries whose
            // handle still has a LIVE flight are exempt: a client
            // actively fetching tickets keeps the flight resident in the
            // access-ordered LRU while its pending entry ages — pruning
            // it here would answer the next poll NOT_FOUND and force a
            // needless resubmit of a query whose every ticket still
            // serves. The flights LRU's eviction hook (which removes the
            // pending entry too) is the authority for DONE-with-flight
            // lifecycles.
            val terminal = pending.entrySet().asScala
              .filter(e => e.getValue.state != "RUNNING" &&
                !flights.synchronized(flights.containsKey(e.getKey))).toSeq
              .sortBy(_.getValue.createdNanos)
            terminal.dropRight(maxFlights).foreach(e => pending.remove(e.getKey))
            val running = pending.values.asScala.count(_.state == "RUNNING")
            if (running >= maxFlights)
              status(s"ERR RESOURCE_EXHAUSTED $running flights already running")
            else {
              val handle = java.lang.Long.toHexString(
                handleCounter.incrementAndGet()) + "p" +
                java.lang.Integer.toHexString(System.identityHashCode(payload))
              val p = new Pending(handle, s"graft-flight-$handle")
              pending.put(handle, p)
              val sql = payload
              val runner = new Thread(
                () => {
                  val sc = session.spark.sparkContext
                  var rddOpt: Option[org.apache.spark.rdd.RDD[
                    org.apache.spark.sql.catalyst.InternalRow]] = None
                  try {
                    // interruptOnCancel: cancelJobGroup must actually stop
                    // running tasks, not just future ones — that is the
                    // whole point of the cancel verb
                    sc.setJobGroup(p.jobGroup, s"graft flight $handle",
                      interruptOnCancel = true)
                    // a cancel that raced AHEAD of the first job found an
                    // empty job group — cancelJobGroup had nothing to
                    // interrupt, so honor the state here instead of
                    // running the whole query for a client that already
                    // gave up (the cancel verb also cancels FUTURE jobs
                    // of the group, closing the between-AQE-jobs window;
                    // this check closes the before-any-job one)
                    if (p.state != "CANCELLED") {
                      val (schema, rdd) = org.apache.spark.sql.GraftArrowBridge
                        .resultRdd(session.execute(sql))
                      rddOpt = Some(rdd)
                      rdd.persist(
                        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
                      // finalizing the adaptive plan EXECUTES the query's
                      // shuffle stages under the job group — the readiness
                      // work poll reports progress on
                      val n = rdd.getNumPartitions
                      p.schema = schema
                      p.endpoints = n
                      // check-and-register ATOMICALLY under the same lock
                      // cancel uses for its own check-and-transition — a
                      // cancel interleaving between an unlocked check and
                      // the put would leave a "cancelled" flight registered
                      // (and its RDD pinned), or a DONE pending with no
                      // flight behind its tickets
                      val registered = flights.synchronized {
                        if (p.state == "RUNNING") {
                          flights.put(handle, Flight(schema, rdd))
                          p.state = "DONE"
                          true
                        } else false
                      }
                      if (!registered) rdd.unpersist(false) // cancelled at the line
                    }
                  } catch {
                    case e: Throwable =>
                      rddOpt.foreach(r =>
                        try r.unpersist(false)
                        catch { case _: Throwable => () })
                      if (p.state != "CANCELLED") {
                        p.error = firstLine(e)
                        p.state = "FAILED"
                      }
                  } finally sc.clearJobGroup()
                },
                s"graft-flight-$handle"
              )
              runner.setDaemon(true)
              runner.start()
              status(s"OK $handle RUNNING 0 0 -1")
              org.apache.spark.sql.GraftArrowBridge.writeSchemaOnly(
                new org.apache.spark.sql.types.StructType(),
                session.spark.sessionState.conf.sessionLocalTimeZone,
                out
              )
              out.flush()
            }
          }
        case "DO_ACTION" =>
          val (action, arg) = payload.indexOf(' ') match {
            case -1 => (payload, "")
            case i  => (payload.substring(0, i), payload.substring(i + 1).trim)
          }
          action match {
            case "cancel" if arg.nonEmpty =>
              val p = Option(pending.get(arg))
              // check-and-transition under the SAME lock the runner's
              // register uses: after this block either the runner will
              // observe CANCELLED and unpersist, or the flight is already
              // registered and the removal below unpins it — no window
              // where both miss
              val (wasRunning, hadFlight) = flights.synchronized {
                val running = p.exists(_.state == "RUNNING")
                if (running) p.get.state = "CANCELLED"
                val removed = Option(flights.remove(arg)) match {
                  case Some(f) =>
                    try f.rdd.unpersist(false)
                    catch { case _: Throwable => () }
                    // a registered flight's pending entry is terminal
                    // DONE; mark the cancellation for later pollers
                    p.foreach(_.state = "CANCELLED")
                    true
                  case None => false
                }
                (running, removed)
              }
              if (wasRunning)
                // outside the lock: cancelJobGroup can block on the
                // scheduler, and the runner's failure handler keys off
                // the already-set CANCELLED state either way
                session.spark.sparkContext.cancelJobGroupAndFutureJobs(p.get.jobGroup)
              if (!wasRunning && !hadFlight && p.isEmpty)
                status("ERR NOT_FOUND unknown or expired flight handle")
              else {
                val outcome =
                  if (wasRunning) "cancelled_running"
                  else if (hadFlight) "cancelled_registered"
                  else "already_finished"
                status("OK")
                val result = {
                  import session.spark.implicits._
                  Seq(("cancel", arg, outcome)).toDF("action", "handle", "outcome")
                }
                org.apache.spark.sql.GraftArrowBridge
                  .writeBatches(result, batchSize, out)
                out.flush()
              }
            case "cancel" =>
              status("ERR INVALID_ARGUMENT cancel requires a flight handle")
            case "mv_describe" =>
              // the MV freshness contract: one row per registered
              // materialized view, carrying the applied-source-snapshot
              // watermark the registrant declared at (re-)registration
              // plus the LIVE head of the base when it is an Iceberg
              // table — `fresh` tells the client whether an answer the
              // optimizer rewrote to this view reflects the current
              // source (null when the base has no snapshot lineage to
              // compare against, e.g. a plain parquet table)
              status("OK")
              val rows = graft.plans.MvCatalog.describe().map { i =>
                def headOf(p: String): Option[Long] =
                  try {
                    if (graft.sources.IcebergMeta.hasMetadata(p))
                      graft.sources.IcebergMeta.load(p)
                        .currentSnapshot.map(_.id)
                    else None
                  } catch { case _: Throwable => None }
                val sourceHead: Option[Long] = headOf(i.basePath)
                // a JOIN view is stale when EITHER source moved past its
                // stamped cursor: AND the dim verdict in where the def
                // carries one (the wire row keeps the fact-side columns;
                // dim staleness only tightens `fresh`)
                val dimFresh: Option[Boolean] = i.dimPath match {
                  case Some(dp) => (i.dimWatermark, headOf(dp)) match {
                    case (Some(w), Some(h)) => Some(w == h)
                    case (None, None)       => None
                    case _                  => Some(false)
                  }
                  case None => None
                }
                val fresh: java.lang.Boolean = (i.watermark, sourceHead) match {
                  case (Some(w), Some(h)) =>
                    java.lang.Boolean.valueOf(w == h && dimFresh.forall(identity))
                  case _ => dimFresh
                    .map(java.lang.Boolean.valueOf).orNull
                }
                (i.name, i.kind, i.basePath, i.dimPath.orNull, i.mvPath,
                  i.watermark.map(java.lang.Long.valueOf).orNull,
                  sourceHead.map(java.lang.Long.valueOf).orNull, fresh)
              }
              val result = {
                import session.spark.implicits._
                rows.toDF("name", "kind", "base_path", "dim_path", "mv_path",
                  "watermark", "source_snapshot", "fresh")
              }
              org.apache.spark.sql.GraftArrowBridge
                .writeBatches(result, batchSize, out)
              out.flush()
            case "advise" if arg.nonEmpty =>
              // the MV advisor over the wire: arg is ONE SQL statement
              // (the line protocol is single-line — multi-statement
              // workloads call once per query; recommendations fold
              // client-side or via repeated calls). Analysis runs
              // BEFORE the OK so a parse/analysis error refuses
              // cleanly; nothing is materialized or registered here —
              // the action only reports what WOULD pay off.
              val advParsed = scala.util.Try {
                adviseRows(Seq(session.execute(arg)))
              }
              advParsed match {
                case scala.util.Failure(e) =>
                  status("ERR INVALID_ARGUMENT advise: " +
                    Option(e.getMessage).getOrElse(e.toString)
                      .replaceAll("\\s+", " ").take(200))
                case scala.util.Success(rows) =>
                  status("OK")
                  val result = {
                    import session.spark.implicits._
                    rows.toDF("kind", "base_path", "keys", "measures",
                      "queries_answered", "rejection")
                  }
                  org.apache.spark.sql.GraftArrowBridge
                    .writeBatches(result, batchSize, out)
                  out.flush()
              }
            case "advise" =>
              // no argument: advise over the session's OBSERVED workload
              // (GraftSession's bounded side-effect-free query log) —
              // the advisor UX that needs no input at all: "look at
              // what this endpoint has been serving and tell me what to
              // materialize". Entries that no longer plan (a dropped
              // temp view) are skipped; re-planning is lazy and
              // side-effect-free by the log's admission contract.
              val dfs = session.recentQueries.flatMap(sql =>
                scala.util.Try(session.spark.sql(sql)).toOption)
              if (dfs.isEmpty)
                status("ERR NOT_FOUND advise: the session has no " +
                  "replayable query history yet — pass a single-line " +
                  "SQL statement instead")
              else {
                status("OK")
                val result = {
                  import session.spark.implicits._
                  adviseRows(dfs).toDF("kind", "base_path", "keys",
                    "measures", "queries_answered", "rejection")
                }
                org.apache.spark.sql.GraftArrowBridge
                  .writeBatches(result, batchSize, out)
                out.flush()
              }
            case "mv_refresh" if arg.nonEmpty =>
              // refresh an ADVISOR-built MV by registered name — the
              // wire face of the advisor lifecycle: advise ->
              // materialize -> mv_describe says stale -> mv_refresh ->
              // fresh, all over DO_ACTION. The registered def carries
              // everything the refresh needs (MvAdvisor.fromDef /
              // fromJoinDef reconstructs the recommendation; the name
              // round-trip is verified, so a hand-declared def refuses
              // rather than refreshing under wrong assumptions).
              // Validation runs BEFORE the OK; the refresh itself is
              // the churn-scoped step (join views rebuild pinned at the
              // new head pair), and a view already at the source head
              // answers with null applied snapshots. The response's
              // applied_dim_snapshot column is non-null for join views
              // only.
              val name = arg.trim
              val parsed = scala.util.Try {
                graft.plans.MvCatalog.find(name) match {
                  case Some(d) =>
                    val rec = graft.plans.MvAdvisor.fromDef(d).getOrElse(
                      throw new IllegalArgumentException(
                        s"'$name' is not an advisor-built MV — only " +
                          "advisor defs carry a reconstructible refresh"))
                    require(d.watermark.isDefined,
                      s"'$name' has no watermark — not built from an " +
                        "Iceberg base, nothing to refresh against")
                    scala.Left((d, rec))
                  case None =>
                    val d = graft.plans.MvCatalog.findJoin(name).getOrElse(
                      throw new IllegalArgumentException(
                        s"no registered MV named '$name'"))
                    val rec = graft.plans.MvAdvisor
                      .fromJoinDef(session.spark, d).getOrElse(
                        throw new IllegalArgumentException(
                          s"'$name' is not an advisor-built MV — only " +
                            "advisor defs carry a reconstructible refresh"))
                    require(
                      graft.sources.IcebergMeta.hasMetadata(d.factPath) ||
                        graft.sources.IcebergMeta.hasMetadata(d.dimPath),
                      s"'$name' has no Iceberg side — nothing to " +
                        "refresh against")
                    scala.Right((d, rec))
                }
              }
              parsed match {
                case scala.util.Failure(e) =>
                  status("ERR INVALID_ARGUMENT mv_refresh: " +
                    Option(e.getMessage).getOrElse(e.toString)
                      .replaceAll("\\s+", " ").take(200))
                case scala.util.Success(defRec) =>
                  status("OK")
                  val (nm, snap, dimSnap) = defRec match {
                    case scala.Left((d, rec)) =>
                      (d.name,
                        rec.refreshStep(session.spark,
                          graft.plans.MvAdvisor.mvRootOf(d)),
                        None)
                    case scala.Right((d, rec)) =>
                      rec.refreshStep(session.spark,
                        graft.plans.MvAdvisor.joinMvRootOf(d)) match {
                        case Some((f, dm)) => (d.name, Some(f), Some(dm))
                        case None          => (d.name, None, None)
                      }
                  }
                  val result = {
                    import session.spark.implicits._
                    Seq((nm,
                      snap.map(java.lang.Long.valueOf).orNull,
                      dimSnap.map(java.lang.Long.valueOf).orNull))
                      .toDF("name", "applied_snapshot",
                        "applied_dim_snapshot")
                  }
                  org.apache.spark.sql.GraftArrowBridge
                    .writeBatches(result, batchSize, out)
                  out.flush()
              }
            case "mv_refresh" =>
              status("ERR INVALID_ARGUMENT mv_refresh requires the " +
                "registered MV name")
            case "mv_maintain" =>
              // catalog-wide maintenance sweep: refresh EVERY stale
              // advisor-built view (rollup, multiplicity, join) in one
              // action and report per view — the orchestration face of
              // the lifecycle, for a scheduler that wants "bring
              // everything current" without enumerating names.
              // Hand-declared defs and views with no snapshot lineage
              // come back as skipped rows with the reason; per-view
              // failures are caught inside the sweep, so the action
              // always answers one row per registered view (zero rows
              // on an empty catalog). WORK-then-status, same rationale
              // as store_compact: the per-view catch covers refresh
              // failures, but a failure OUTSIDE it (window unpersist,
              // catalog iteration) would otherwise kill the connection
              // mid-stream after an OK the client already consumed.
              // AUTOSAVE (round 18): when a durable catalog was loaded
              // on this server, the sweep saves the registry back to it
              // before answering — load -> sweep -> save becomes the
              // default loop, not three verbs the scheduler must
              // remember to compose. Reported as a synthetic trailing
              // row (same schema) so the caller sees the save outcome;
              // a save failure degrades to that row's error, never to a
              // lost sweep result.
              val mmRes = scala.util.Try {
                val sweep = graft.plans.MvAdvisor.maintainAll(session.spark)
                val autosave = loadedCatalogPath.map { p =>
                  scala.util.Try(graft.operators.MaintenanceLease
                      .withConfigured(session.spark) {
                    graft.plans.CatalogPersistence.save(p)
                  }) match {
                    case scala.util.Success(_) =>
                      graft.plans.MvAdvisor.MaintainResult(
                        "__catalog_autosave", "catalog", stale = false,
                        None, None, Some(s"saved: $p"))
                    case scala.util.Failure(e) =>
                      graft.plans.MvAdvisor.MaintainResult(
                        "__catalog_autosave", "catalog", stale = false,
                        None, None, Some("error: " +
                          Option(e.getMessage).getOrElse(e.toString)
                            .replaceAll("\\s+", " ").take(200)))
                  }
                }
                sweep ++ autosave
              }
              mmRes match {
                case scala.util.Failure(e) =>
                  status("ERR INTERNAL mv_maintain: " +
                    Option(e.getMessage).getOrElse(e.toString)
                      .replaceAll("\\s+", " ").take(200))
                case scala.util.Success(sweep) =>
                  status("OK")
                  val rows = sweep
                    .map(r => (r.name, r.kind, r.stale,
                      r.appliedSnapshot.map(java.lang.Long.valueOf).orNull,
                      r.appliedDimSnapshot.map(java.lang.Long.valueOf).orNull,
                      r.skipped.orNull))
                  val result = {
                    import session.spark.implicits._
                    rows.toDF("name", "kind", "stale", "applied_snapshot",
                      "applied_dim_snapshot", "skipped")
                  }
                  org.apache.spark.sql.GraftArrowBridge
                    .writeBatches(result, batchSize, out)
                  out.flush()
              }
            case "store_compact" if arg.nonEmpty =>
              // offline store maintenance over the wire:
              // <kind> <root> [nFiles], kind = minhash | ivf | split.
              // Unlike the streaming verbs the WORK runs before the
              // status line — a compaction yields one summary row, so
              // running it first lets any failure (wrong kind, missing
              // store, lease conflict) refuse cleanly instead of dying
              // mid-stream. Same single-writer contract as the driver-
              // side compact calls: quiesce that store's writers.
              val scParts = arg.split("\\s+")
              val scRes = scala.util.Try {
                require(scParts.length == 2 || scParts.length == 3,
                  "store_compact requires <kind> <root> [nFiles]")
                val nFiles =
                  if (scParts.length == 3) Some(scParts(2).toInt)
                  else None
                (scParts(0), scParts(1),
                  graft.operators.StoreMaintenance.compact(
                    session.spark, scParts(0), scParts(1), nFiles))
              }
              scRes match {
                case scala.util.Failure(e) =>
                  status("ERR INVALID_ARGUMENT store_compact: " +
                    Option(e.getMessage).getOrElse(e.toString)
                      .replaceAll("\\s+", " ").take(200))
                case scala.util.Success((k, r, info)) =>
                  status("OK")
                  val result = {
                    import session.spark.implicits._
                    Seq((k, r, info)).toDF("kind", "root", "result")
                  }
                  org.apache.spark.sql.GraftArrowBridge
                    .writeBatches(result, batchSize, out)
                  out.flush()
              }
            case "store_compact" =>
              status("ERR INVALID_ARGUMENT store_compact requires " +
                "<kind> <root> [nFiles]")
            case "store_describe" if arg.nonEmpty =>
              // <kind> <root>: the maintenance-pressure gauge feeding
              // store_compact decisions — metadata-only, no data read.
              // segments is the read-amplification term compaction
              // folds back to 1 (minhash/split) or re-clusters (ivf);
              // tombstones the second pressure term (live dead lists).
              // For a REGISTERED store with lineage the row also carries
              // freshness — registered name, watermark, live source
              // head, fresh — so one verb answers both "is compaction
              // due" and "is this store stale" (round 18).
              val sdParts = arg.split("\\s+")
              val sdRes = scala.util.Try {
                require(sdParts.length == 2,
                  "store_describe requires <kind> <root>")
                val g = graft.operators.StoreMaintenance.describe(
                  session.spark, sdParts(0), sdParts(1))
                (g.kind, g.root,
                  g.version.map(java.lang.Long.valueOf).orNull,
                  g.segments, g.detail.orNull,
                  g.tombstones.map(java.lang.Integer.valueOf).orNull,
                  g.registered.orNull,
                  g.watermark.map(java.lang.Long.valueOf).orNull,
                  g.head.map(java.lang.Long.valueOf).orNull,
                  g.fresh.map(java.lang.Boolean.valueOf).orNull)
              }
              sdRes match {
                case scala.util.Failure(e) =>
                  status("ERR INVALID_ARGUMENT store_describe: " +
                    Option(e.getMessage).getOrElse(e.toString)
                      .replaceAll("\\s+", " ").take(200))
                case scala.util.Success(row) =>
                  status("OK")
                  val result = {
                    import session.spark.implicits._
                    Seq(row).toDF("kind", "root", "version", "segments",
                      "detail", "tombstones", "registered", "watermark",
                      "head", "fresh")
                  }
                  org.apache.spark.sql.GraftArrowBridge
                    .writeBatches(result, batchSize, out)
                  out.flush()
              }
            case "store_describe" =>
              status("ERR INVALID_ARGUMENT store_describe requires " +
                "<kind> <root>")
            case "table_maintain" if arg.nonEmpty =>
              // the nightly Iceberg table job over the wire (the CLI
              // --maintain twin): <table_root> [retain_ms]. Runs the
              // IcebergMaintenance policy once — compact on delete
              // pressure, expire history past the retention window,
              // consolidate manifests on metadata pressure — and
              // answers the report row. Work-then-status, same
              // rationale as store_compact.
              val tmParts = arg.split("\\s+")
              val tmRes = scala.util.Try {
                require(tmParts.length == 1 || tmParts.length == 2,
                  "table_maintain requires <table_root> [retain_ms]")
                val root = tmParts(0)
                require(graft.sources.IcebergMeta.hasMetadata(root),
                  s"$root is not an Iceberg table")
                val now = System.currentTimeMillis()
                val cutoff =
                  if (tmParts.length == 2) Some(now - tmParts(1).toLong)
                  else None
                graft.sources.IcebergMaintenance.maintain(
                  session.spark, root, now, expireOlderThanMs = cutoff)
              }
              tmRes match {
                case scala.util.Failure(e) =>
                  status("ERR INVALID_ARGUMENT table_maintain: " +
                    Option(e.getMessage).getOrElse(e.toString)
                      .replaceAll("\\s+", " ").take(200))
                case scala.util.Success(rep) =>
                  status("OK")
                  val result = {
                    import session.spark.implicits._
                    Seq((rep.deleteFiles, rep.deleteRows, rep.dataFiles,
                      rep.compacted.map(java.lang.Long.valueOf).orNull,
                      rep.expired.mkString(","),
                      rep.manifestsRewritten
                        .map(java.lang.Long.valueOf).orNull))
                      .toDF("delete_files", "delete_rows", "data_files",
                        "compacted_snapshot", "expired_snapshots",
                        "manifests_rewritten")
                  }
                  org.apache.spark.sql.GraftArrowBridge
                    .writeBatches(result, batchSize, out)
                  out.flush()
              }
            case "table_maintain" =>
              status("ERR INVALID_ARGUMENT table_maintain requires " +
                "<table_root> [retain_ms]")
            case "store_autopilot" =>
              // the compaction autopilot over the REGISTERED stores:
              // gauge each, compact those above the segment threshold
              // (optional integer arg, default 8), one row per store.
              // Work-then-status, same rationale as store_compact; the
              // per-store catch inside the walk reports gauge/compact
              // failures as rows, so one broken store never kills the
              // sweep.
              val apRes = scala.util.Try {
                val threshold =
                  if (arg.isEmpty) 8
                  else arg.trim.toIntOption.getOrElse(
                    throw new IllegalArgumentException(
                      s"store_autopilot threshold '$arg' is not an integer"))
                graft.operators.StoreMaintenance.autopilot(
                  session.spark, threshold)
              }
              apRes match {
                case scala.util.Failure(e) =>
                  status("ERR INVALID_ARGUMENT store_autopilot: " +
                    Option(e.getMessage).getOrElse(e.toString)
                      .replaceAll("\\s+", " ").take(200))
                case scala.util.Success(rows) =>
                  status("OK")
                  val result = {
                    import session.spark.implicits._
                    rows.map(r => (r.name, r.kind,
                      r.segmentsBefore.map(Integer.valueOf).orNull,
                      r.compacted,
                      r.segmentsAfter.map(Integer.valueOf).orNull,
                      r.skipped.orNull))
                      .toDF("name", "kind", "segments_before", "compacted",
                        "segments_after", "skipped")
                  }
                  org.apache.spark.sql.GraftArrowBridge
                    .writeBatches(result, batchSize, out)
                  out.flush()
              }
            case "catalog_save" if arg.nonEmpty =>
              // durable registry snapshot: every MV def + store def to
              // ONE JSON file (tmp+atomic-rename). With catalog_load
              // this is the maintainer restart story — load →
              // mv_maintain → save resumes every cursor at O(downtime
              // churn) instead of re-materializing at O(corpus).
              // Work-then-status, same rationale as store_compact.
              // the save runs under the configured maintenance lease
              // (spark.graft.maintenance.lease): a snapshot raced by a
              // concurrent sweep could persist half-advanced cursors
              val csRes = scala.util.Try {
                graft.operators.MaintenanceLease
                  .withConfigured(session.spark) {
                    graft.plans.CatalogPersistence.save(arg)
                  }
                (arg, graft.plans.MvCatalog.describe().size,
                  graft.operators.StoreCatalog.describe().size)
              }
              csRes match {
                case scala.util.Failure(e) =>
                  status("ERR INVALID_ARGUMENT catalog_save: " +
                    Option(e.getMessage).getOrElse(e.toString)
                      .replaceAll("\\s+", " ").take(200))
                case scala.util.Success((p, nMv, nStores)) =>
                  status("OK")
                  val result = {
                    import session.spark.implicits._
                    Seq((p, nMv, nStores)).toDF("path", "mvs", "stores")
                  }
                  org.apache.spark.sql.GraftArrowBridge
                    .writeBatches(result, batchSize, out)
                  out.flush()
              }
            case "catalog_save" =>
              status("ERR INVALID_ARGUMENT catalog_save requires <path>")
            case "catalog_load" if arg.nonEmpty =>
              // reload a saved registry snapshot (additive,
              // replace-by-name); one row per def — loaded, or the skip
              // reason (missing stored artifact, bad record). Defs whose
              // artifacts moved on refresh cursors: the sweep's own
              // refusal contracts handle staleness, load only validates
              // existence.
              val clRes = scala.util.Try {
                val r = graft.plans.CatalogPersistence.load(arg)
                loadedCatalogPath = Some(arg) // arm mv_maintain autosave
                r
              }
              clRes match {
                case scala.util.Failure(e) =>
                  status("ERR INVALID_ARGUMENT catalog_load: " +
                    Option(e.getMessage).getOrElse(e.toString)
                      .replaceAll("\\s+", " ").take(200))
                case scala.util.Success(results) =>
                  status("OK")
                  val result = {
                    import session.spark.implicits._
                    results.map(r => (r.name, r.kind, r.loaded,
                      r.reason.orNull))
                      .toDF("name", "kind", "loaded", "reason")
                  }
                  org.apache.spark.sql.GraftArrowBridge
                    .writeBatches(result, batchSize, out)
                  out.flush()
              }
            case "catalog_load" =>
              status("ERR INVALID_ARGUMENT catalog_load requires <path>")
            case "analyze_table" if arg.nonEmpty =>
              // harvest table statistics (r19): one full pass = row
              // count + a mergeable per-column HLL NDV sketch into
              // StatsCatalog — the statistics that auto-arm the
              // eager-aggregation rewrite, feed the advisor's cost
              // model, and ride catalog_save. Work-then-status.
              // r20: whitespace-separated comma-lists after the path
              // request JOINT combo sketches ("<path> k,k2"); combo
              // rows come back with the comboKey as the column name.
              val atParts = arg.trim.split("\\s+").toSeq
              val atPath = atParts.head
              val atCombos = atParts.tail
                .map(_.split(',').toSeq.filter(_.nonEmpty)).filter(_.nonEmpty)
              val atRes = scala.util.Try(
                graft.plans.StatsCatalog.analyze(session.spark, atPath,
                  combos = atCombos))
              atRes match {
                case scala.util.Failure(e) =>
                  status("ERR INVALID_ARGUMENT analyze_table: " +
                    Option(e.getMessage).getOrElse(e.toString)
                      .replaceAll("\\s+", " ").take(200))
                case scala.util.Success(st) =>
                  status("OK")
                  val result = {
                    import session.spark.implicits._
                    (st.cols.toSeq.sortBy(_._1)
                      .map { case (c, cs) => (st.path, st.rows, c, cs.ndv) } ++
                      st.combos.toSeq.sortBy(_._1)
                        .map { case (c, cs) =>
                          (st.path, st.rows, s"($c)", cs.ndv) })
                      .toDF("path", "rows", "column", "ndv")
                  }
                  org.apache.spark.sql.GraftArrowBridge
                    .writeBatches(result, batchSize, out)
                  out.flush()
              }
            case "analyze_table" =>
              status("ERR INVALID_ARGUMENT analyze_table requires <path>")
            case "stats_describe" =>
              // one row per analyzed table — metadata-only. `stale`
              // (r20) compares updatedMs against the newest file under
              // the path: true = a write outside the maintained hooks
              // landed since the last analyze/merge; null = the path
              // cannot be inspected (unknown, not fresh). `combos` is
              // the joint-sketch count (correlated-grain NDVs).
              status("OK")
              val result = {
                import session.spark.implicits._
                graft.plans.StatsCatalog.describe()
                  .map(st => (st.path, st.rows, st.cols.size,
                    st.combos.size, st.updatedMs,
                    graft.plans.StatsCatalog.stale(session.spark, st)))
                  .toDF("path", "rows", "columns", "combos",
                    "updated_ms", "stale")
              }
              org.apache.spark.sql.GraftArrowBridge
                .writeBatches(result, batchSize, out)
              out.flush()
            case "stream_view_describe" if arg.nonEmpty =>
              // freshness for the STREAMING MV family (streaming/
              // MaterializedAgg): arg is <view_path> <source_path>
              // [<wm_col>] where wm_col names the column the view's
              // watermark row carries its cursor in — "s" (sum/count,
              // the default), "mn" (min/max), "nd" (approx-distinct),
              // "v" (exact-distinct). The two-cursor join flavor keeps
              // its cursors in the view table itself (jk/fv of the
              // sentinel row) and is read by SQL, not this action.
              // Validation (view + source reads) happens BEFORE the OK
              // status so a missing table refuses cleanly.
              val svParts = arg.split("\\s+")
              val svParsed = scala.util.Try {
                require(svParts.length == 2 || svParts.length == 3,
                  "stream_view_describe requires <view_path> " +
                    "<source_path> [<wm_col>]")
                val wmCol = if (svParts.length == 3) svParts(2) else "s"
                require(Set("s", "mn", "nd", "v")(wmCol),
                  s"wm_col '$wmCol' is not a single-cursor streaming MV " +
                    "flavor (one of: s, mn, nd, v)")
                val wm = graft.streaming.MaterializedAgg
                  .watermarkOf(session.spark, svParts(0), wmCol)
                val head = graft.sources.IcebergMeta.load(svParts(1))
                  .currentSnapshot.map(_.id)
                (svParts(0), svParts(1), wmCol, wm, head)
              }
              svParsed match {
                case scala.util.Failure(e) =>
                  status("ERR INVALID_ARGUMENT stream_view_describe: " +
                    Option(e.getMessage).getOrElse(e.toString)
                      .replaceAll("\\s+", " ").take(200))
                case scala.util.Success((vp, sp, wmCol, wm, head)) =>
                  status("OK")
                  val result = {
                    import session.spark.implicits._
                    Seq((vp, sp, wmCol, wm,
                      head.map(java.lang.Long.valueOf).orNull,
                      head.map(h => java.lang.Boolean.valueOf(h == wm))
                        .orNull: java.lang.Boolean))
                      .toDF("view_path", "source_path", "wm_col",
                        "watermark", "source_snapshot", "fresh")
                  }
                  org.apache.spark.sql.GraftArrowBridge
                    .writeBatches(result, batchSize, out)
                  out.flush()
              }
            case "stream_view_describe" =>
              status("ERR INVALID_ARGUMENT stream_view_describe requires " +
                "<view_path> <source_path> [<wm_col>]")
            case "ann_probe" if arg.nonEmpty =>
              // serve the stored incremental IVF index (operators/
              // IvfStore) directly: arg is
              //   <store_root> <k> <nProbe> <v1,v2,...>
              // Validation (store load + vector parse) happens BEFORE
              // the OK status so argument errors refuse cleanly; the
              // probe itself then streams like any other result.
              val parts = arg.split("\\s+", 4)
              if (parts.length != 4)
                status("ERR INVALID_ARGUMENT ann_probe requires " +
                  "<store_root> <k> <nProbe> <comma-separated query vector>")
              else {
                val parsed = scala.util.Try {
                  val k = parts(1).toInt
                  val nProbe = parts(2).toInt
                  val q = parts(3).split(',').map(_.trim.toFloat)
                  require(k > 0 && nProbe > 0 && q.nonEmpty,
                    "k, nProbe must be positive; query vector non-empty")
                  (k, nProbe, q, graft.operators.IvfStore.load(parts(0)))
                }
                parsed match {
                  case scala.util.Failure(e) =>
                    status("ERR INVALID_ARGUMENT ann_probe: " +
                      Option(e.getMessage).getOrElse(e.toString)
                        .replaceAll("\\s+", " ").take(200))
                  case scala.util.Success((k, nProbe, q, storeMeta)) =>
                    status("OK")
                    // ids + payload + score; the query already HAS the
                    // vectors — re-shipping each neighbor's embedding
                    // would dominate the response for no information.
                    // The probe REUSES the validated Meta (single load):
                    // a concurrent ingest/compact between two loads could
                    // change embCol and the drop would silently no-op,
                    // shipping every neighbor's full vector.
                    val result = graft.operators.IvfStore
                      .probe(session.spark, parts(0), storeMeta, q, k, nProbe)
                      .drop(storeMeta.embCol)
                    org.apache.spark.sql.GraftArrowBridge
                      .writeBatches(result, batchSize, out)
                    out.flush()
                }
              }
            case "ann_probe" =>
              status("ERR INVALID_ARGUMENT ann_probe requires " +
                "<store_root> <k> <nProbe> <comma-separated query vector>")
            case other =>
              status(s"ERR INVALID_ARGUMENT unknown action '$other' " +
                "(LIST_ACTIONS lists what this server supports)")
          }
        case "LIST_ACTIONS" =>
          status("OK")
          val actions = {
            import session.spark.implicits._
            Seq(
              ("cancel",
                "cancel a running or registered flight by handle; " +
                  "interrupts its Spark job group and unpersists its result"),
              ("mv_describe",
                "describe every registered materialized view: declared " +
                  "applied-source-snapshot watermark, live source head, " +
                  "and whether a rewritten answer would be fresh"),
              ("ann_probe",
                "top-k cosine neighbors from a stored incremental IVF " +
                  "index: <store_root> <k> <nProbe> <comma-separated " +
                  "query vector>"),
              ("mv_refresh",
                "refresh an advisor-built MV by registered name: the " +
                  "churn-scoped step brings the stored view to the " +
                  "source head and re-registers the new version"),
              ("mv_maintain",
                "catalog-wide maintenance sweep: refresh every stale " +
                  "advisor-built MV (rollup/multiplicity/join) and " +
                  "answer one row per registered view — stale verdict, " +
                  "applied snapshot(s), or the skip reason; after a " +
                  "catalog_load, autosaves the registry back to that " +
                  "path (see the __catalog_autosave row)"),
              ("stream_view_describe",
                "freshness of a streaming materialized view: " +
                  "<view_path> <source_path> [<wm_col: s|mn|nd|v>] -> " +
                  "applied watermark, live source head, fresh verdict"),
              ("store_compact",
                "offline store maintenance: <kind> <root> [nFiles], " +
                  "kind = minhash | ivf | split — fold the store's " +
                  "segment history; quiesce that store's writers first"),
              ("store_describe",
                "maintenance-pressure gauge: <kind> <root> -> version, " +
                  "live segment count, live tombstone lists, per-kind " +
                  "detail, and — for a registered store with lineage — " +
                  "watermark vs live source head + fresh verdict; " +
                  "metadata-only — one poll answers both compaction " +
                  "pressure and staleness"),
              ("table_maintain",
                "Iceberg nightly-job policy: <table_root> [retain_ms] " +
                  "— compact on delete pressure, expire history past " +
                  "the retention window, consolidate manifests; " +
                  "answers the report row"),
              ("advise",
                "MV + index advisor: with a single-line SQL argument, " +
                  "advise that statement; with no argument, fold the " +
                  "session's observed query history. Rollup/" +
                  "multiplicity/join/ivf_index/minhash_index " +
                  "recommendations + rejection reasons; reports only"),
              ("store_autopilot",
                "compaction autopilot over the REGISTERED stores: " +
                  "gauge each, compact those above [threshold] live " +
                  "segments (default 8); one row per store — covers " +
                  "lineage-less registrations the refresh sweep skips"),
              ("catalog_save",
                "snapshot the whole registry (MV defs + store defs + " +
                  "table statistics) to <path> as one JSON file, " +
                  "tmp+atomic-rename — the durable half of the " +
                  "maintainer restart story"),
              ("catalog_load",
                "reload a saved registry snapshot from <path> " +
                  "(additive, replace-by-name); one row per def — " +
                  "loaded, or the skip reason; cursors resume at their " +
                  "saved watermarks, so the next mv_maintain applies " +
                  "only the missed churn"),
              ("analyze_table",
                "harvest table statistics from <path>: row count + a " +
                  "mergeable per-column HLL NDV sketch into the stats " +
                  "catalog — auto-arms the eager-aggregation rewrite, " +
                  "feeds the advisor cost model, kept current by " +
                  "Iceberg appends, persisted by catalog_save; one row " +
                  "per column"),
              ("stats_describe",
                "one row per analyzed table: normalized path, row " +
                  "count, sketched column count, last update — " +
                  "metadata-only"))
              .toDF("action", "description")
          }
          org.apache.spark.sql.GraftArrowBridge.writeBatches(actions, batchSize, out)
          out.flush()
        case v =>
          status(s"ERR INVALID_ARGUMENT unknown method '$v'")
      }
    } catch {
      case _: SocketTimeoutException =>
        if (!statusSent) {
          try status("ERR DEADLINE_EXCEEDED no request received in time")
          catch { case _: Throwable => () }
        }
      case e: Throwable =>
        // single-line message: the status line IS the error channel — but
        // only while it is still unsent; after OK the Arrow bytes own the
        // socket and the only correct signal is connection abort
        if (!statusSent) {
          try status(s"ERR INTERNAL ${firstLine(e)}")
          catch { case _: Throwable => () }
        }
    } finally {
      try sock.close()
      catch { case _: Throwable => () }
    }
  }

  /** First line of an exception's message for the single-line status
    * channel; survives null AND empty messages (an empty string's
    * linesIterator has no `next()` — calling it would throw from inside
    * the error handler, closing the connection with no status at all).
    */
  private def firstLine(e: Throwable): String =
    Option(e.getMessage).getOrElse("")
      .linesIterator.nextOption().filter(_.nonEmpty)
      .getOrElse(e.getClass.getSimpleName)
      .take(500)

  /** Consume (and discard) the rest of a refused request body, bounded
    * three ways: `cap` bytes, EOF (arrives as soon as the client
    * half-closes after its last write), and a WALL-CLOCK deadline SCALED
    * TO THE CAP. The deadline matters because SO_TIMEOUT is per-read: a
    * slow-drip client feeding one byte per 25 s never trips the read
    * timeout and would otherwise pin this worker for the connection's
    * lifetime. Scaling matters too: a flat `requestTimeoutMs` would RST a
    * barely-over-limit client on a slow link before it finished sending
    * and read its RESOURCE_EXHAUSTED — so the budget allows a 1 MiB/s
    * floor across the whole cap (clamped to a day). That generosity must
    * not hand slow-loris clients the worker time the flat deadline denied
    * them: after a `requestTimeoutMs` grace period the drain ALSO enforces
    * a 64 KiB/s minimum throughput, so a byte-per-25-s dripper is cut at
    * ~30 s as before while a genuinely slow DSL link keeps its budget.
    */
  private def drain(in: InputStream, cap: Long): Unit = {
    val buf = new Array[Byte](8192)
    var n = 0L
    val t0 = System.nanoTime()
    val budgetMs =
      math.min(86400000L, requestTimeoutMs + (cap >> 20) * 1000L)
    val deadline = t0 + budgetMs * 1000000L
    val graceNs = requestTimeoutMs * 1000000L
    try while (n < cap && System.nanoTime() < deadline) {
      val elapsed = System.nanoTime() - t0
      if (elapsed > graceNs && n < (elapsed / 1000000000L) * 65536L)
        return // below the throughput floor: a dripper, not a slow link
      val r = in.read(buf)
      if (r == -1) return
      n += r
    } catch { case _: Throwable => () }
  }

  /** Read the `VERB[ payload]\n` line byte-at-a-time (over the shared
    * BufferedInputStream, so it costs one syscall, not one per byte) and
    * leave every byte after the newline — a DO_PUT body — untouched.
    */
  private def readRequestLine(in: InputStream): String = {
    // hard cap: every other driver-side ingest is bounded (maxPutBytes),
    // and a client streaming newline-free bytes would otherwise grow
    // this buffer until the shared driver OOMs — SO_TIMEOUT never trips
    // while data keeps arriving
    val maxLine = 256 * 1024
    val buf = new java.io.ByteArrayOutputStream
    var b = in.read()
    while (b != -1 && b != '\n') {
      buf.write(b)
      if (buf.size() > maxLine)
        throw new IllegalArgumentException(
          s"request line exceeds $maxLine bytes (no newline seen)")
      b = in.read()
    }
    new String(buf.toByteArray, StandardCharsets.UTF_8).stripSuffix("\r")
  }

  override def close(): Unit = {
    closed = true
    try server.close()
    catch { case _: Throwable => () }
    // QUEUED connections must be refused, not abandoned: shutdownNow
    // returns the never-started runnables, and each queued client would
    // otherwise hang on read until its own timeout while its fd leaks
    pool.shutdownNow().forEach {
      case h: ServingHandler => h.reject()
      case _                 => ()
    }
    // orphaned async submissions must not keep burning executor time
    // after the server that could serve their results is gone
    pending.forEach { (_, p) =>
      if (p.state == "RUNNING") {
        p.state = "CANCELLED"
        try session.spark.sparkContext.cancelJobGroupAndFutureJobs(p.jobGroup)
        catch { case _: Throwable => () }
      }
    }
    pending.clear()
    flights.synchronized {
      flights.values.forEach(f =>
        try f.rdd.unpersist(false)
        catch { case _: Throwable => () })
      flights.clear()
    }
  }

  /** The advise action's row pipeline, shared by the single-statement
    * and query-history branches: harvest rollup + join shapes from every
    * workload frame, fold them into recommendations (cross-query — the
    * whole point of history mode is queries_answered > 1), and append
    * rejection reasons.
    */
  private def adviseRows(dfs: Seq[org.apache.spark.sql.DataFrame])
      : Seq[(String, String, String, String, Long, String)] = {
    val results = dfs.flatMap(graft.plans.MvAdvisor.analyze)
    val joinResults = dfs.flatMap(graft.plans.MvAdvisor.analyzeJoins)
    val recRows = graft.plans.MvAdvisor
      .recommend(results.flatMap(_.toOption)).map(r =>
        (r.kind, r.basePath, r.keys.mkString(","),
          (r.sums.toSeq.sorted.map("sum:" + _) ++
            r.counts.toSeq.sorted.map("cnt:" + _) ++
            r.mins.toSeq.sorted.map("min:" + _) ++
            r.maxs.toSeq.sorted.map("max:" + _)).mkString(","),
          r.queriesAnswered.toLong, null: String))
    val joinRows = graft.plans.MvAdvisor
      .recommendJoins(joinResults.flatMap(_.toOption)).map(r =>
        ("join", s"${r.factPath} ⋈ ${r.dimPath}",
          r.joinKeys.map { case (f, d) => s"$f=$d" }.mkString(","),
          r.columns.map { case (c, isFact) =>
            s"${if (isFact) "f" else "d"}.$c" }.mkString(","),
          r.queriesAnswered.toLong, null: String))
    // ANN workloads recommend a stored IVF index — the keys column
    // carries the embedding column, measures is n/a for an index
    val annRows = graft.plans.MvAdvisor
      .recommendIndexes(dfs.flatMap(graft.plans.MvAdvisor.analyzeAnn))
      .map(r => ("ivf_index", r.basePath, r.embCol, null: String,
        r.queriesAnswered.toLong, null: String))
    // dedup workloads (minhash/shingle computation over a scanned text
    // column) recommend the stored MinHash/LSH index
    val dedupRows = graft.plans.MvAdvisor
      .recommendDedupIndexes(
        dfs.flatMap(graft.plans.MvAdvisor.analyzeDedup))
      .map(r => ("minhash_index", r.basePath, r.textCol, null: String,
        r.queriesAnswered.toLong, null: String))
    val rejRows =
      (results.collect { case scala.util.Left(j) => j.reason } ++
        joinResults.collect { case scala.util.Left(j) => j.reason })
        .map(reason => ("rejected", null: String, null: String,
          null: String, 0L, reason))
    recRows ++ joinRows ++ annRows ++ dedupRows ++ rejRows
  }
}

/** One connection's work item — a named top-level class so the pool's
  * rejection handler can tell a queued connection apart from internal
  * runnables and refuse it with a proper status line.
  */
private[engine] final class ServingHandler(
    sock: Socket,
    doHandle: Socket => Unit,
    serverClosed: () => Boolean
) extends Runnable {
  override def run(): Unit = doHandle(sock)

  /** Called by the pool when it cannot run this connection: refuse, never
    * hang the client. Saturation and shutdown are distinct conditions —
    * a client's retry loop should back off on RESOURCE_EXHAUSTED but
    * fail over on UNAVAILABLE, not retry a server that is gone.
    */
  def reject(): Unit = {
    val msg =
      if (serverClosed()) "ERR UNAVAILABLE server shutting down\n"
      else "ERR RESOURCE_EXHAUSTED server at capacity\n"
    try {
      val out = sock.getOutputStream
      out.write(msg.getBytes(StandardCharsets.UTF_8))
      out.flush()
    } catch { case _: Throwable => () }
    try sock.close()
    catch { case _: Throwable => () }
  }
}
