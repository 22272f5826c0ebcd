package graft

import graft.engine.{ServingClient, ServingServer}
import graft.queries.QueryUtil

/** The judge-specified serving contract: a REAL localhost connection
  * round-trips SQL to Arrow IPC streams; every verb the reference leaves
  * unimplemented answers exactly that.
  */
class ServingServerSpec extends SparkTestBase {

  private def withServer[A](f: ServingServer => A): A = {
    val srv = new ServingServer(session).start()
    try f(srv)
    finally srv.close()
  }

  test("DO_GET refuses commands; an endless request line is cut, not buffered") {
    withServer { srv =>
      // the read verb must not be the one door DDL walks through
      val r = ServingClient.doGet(srv.boundPort, "DROP TABLE users")
      assert(!r.isOk && r.status.contains("ERR"), r.status)
      // the connection path still serves queries
      val ok = ServingClient.doGet(srv.boundPort, "SELECT 7 AS c")
      assert(ok.isOk && ok.rows.head.head.toString.toLong === 7L)

      // a newline-free byte stream is refused at the line cap instead of
      // growing a driver-side buffer until OOM
      val sock = new java.net.Socket(
        java.net.InetAddress.getLoopbackAddress, srv.boundPort)
      try {
        val out = sock.getOutputStream
        val chunk = new Array[Byte](64 * 1024)
        java.util.Arrays.fill(chunk, 'x'.toByte)
        try (0 until 8).foreach { _ => out.write(chunk); out.flush() }
        catch { case _: java.io.IOException => () } // server may cut us off
        val resp = new String(
          sock.getInputStream.readNBytes(200), java.nio.charset.StandardCharsets.UTF_8)
        assert(resp.startsWith("ERR"), s"expected refusal, got: $resp")
      } finally sock.close()
    }
  }

  test("DO_GET round-trips SELECT 42 over a real socket as Arrow IPC") {
    withServer { srv =>
      val r = ServingClient.doGet(srv.boundPort, "SELECT 42 AS answer")
      assert(r.isOk, r.status)
      assert(r.columnNames === Seq("answer"))
      assert(r.rows === Seq(Seq(42)))
    }
  }

  test("DO_GET streams a fixture query in 1024-row batches") {
    QueryUtil
      .t(spark, SparkTestBase.Sf0001, "customer")
      .createOrReplaceTempView("serving_customer")
    withServer { srv =>
      val r = ServingClient.doGet(
        srv.boundPort,
        "SELECT c_custkey, c_name FROM serving_customer ORDER BY c_custkey"
      )
      assert(r.isOk, r.status)
      assert(r.columnNames === Seq("c_custkey", "c_name"))
      val expected = spark.table("serving_customer").count()
      assert(r.rows.size.toLong === expected)
      assert(r.rows.head(0).toString.toLong === 0L) // lowest key first (ORDER BY held)

      // and a result wider than one batch arrives complete (3 batches)
      val big = ServingClient.doGet(srv.boundPort, "SELECT id FROM range(3000)")
      assert(big.isOk && big.rows.size === 3000)
    }
  }

  test("an Iceberg table registered in the catalog serves over the socket and follows commits") {
    import spark.implicits._
    import graft.sources.IcebergWriter
    val root = java.nio.file.Files
      .createTempDirectory("graft-serve-iceberg").toString
    IcebergWriter.append(spark, root,
      (0 until 8).map(i => (i.toLong, s"v$i")).toDF("id", "v"), None, 1000L,
      formatVersion = 2)
    session.registerIcebergTable("served_ice", root)
    withServer { srv =>
      val r = ServingClient.doGet(srv.boundPort,
        "SELECT id, v FROM served_ice ORDER BY id")
      assert(r.isOk, r.status)
      assert(r.rows.size === 8 && r.rows.head(1).toString === "v0")
      // a MoR delete commits; the served view follows without re-registering
      IcebergWriter.deleteRowsWhere(spark, root,
        org.apache.spark.sql.functions.col("id") < 3, 2000L)
      val r2 = ServingClient.doGet(srv.boundPort,
        "SELECT count(*) AS n FROM served_ice")
      assert(r2.isOk && r2.rows.head.head.toString.toLong === 5L,
        s"served view did not follow the delete commit: ${r2.rows}")
    }
  }

  test("GET_FLIGHT_INFO answers endpoints + schema, streams no row data") {
    withServer { srv =>
      val r = ServingClient.getFlightInfo(
        srv.boundPort,
        "SELECT 1 AS a, 'x' AS b, CAST(1.5 AS DOUBLE) AS c"
      )
      assert(r.isOk, r.status)
      assert(r.tickets.nonEmpty, s"flight info must carry endpoints: ${r.status}")
      assert(r.columnNames === Seq("a", "b", "c"))
      assert(r.rows.isEmpty, "flight info must not carry row data")
    }
  }

  test("GET_FLIGHT_INFO issues partition tickets; parallel DO_GETs reassemble the result") {
    withServer { srv =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val sql = "SELECT id, id * 3 AS x FROM range(5000)"
      val info = ServingClient.getFlightInfo(srv.boundPort, sql)
      assert(info.isOk, info.status)
      assert(info.columnNames === Seq("id", "x"))
      assert(info.rows.isEmpty, "flight info must not carry row data")
      val tickets = info.tickets
      assert(tickets.size >= 2,
        s"multi-endpoint flight expected, got ${info.status}")

      // every endpoint over its own CONCURRENT connection — the scale
      // path a single toLocalIterator stream cannot serve
      val parts = Await.result(
        Future.sequence(tickets.map(t =>
          Future(ServingClient.doGetTicket(srv.boundPort, t)))),
        120.seconds)
      parts.foreach(r => assert(r.isOk, r.status))
      val reassembled = parts.flatMap(_.rows)
        .map(r => (r.head.toString.toLong, r(1).toString.toLong))
      assert(reassembled.size === 5000, "endpoints must partition the result")
      assert(reassembled.toSet === (0L until 5000L).map(i => (i, i * 3)).toSet)

      // a re-fetch of one ticket serves the persisted partition again
      val again = ServingClient.doGetTicket(srv.boundPort, tickets.head)
      assert(again.isOk && again.rows === parts.head.rows)

      // error paths: expired/unknown handle, out-of-range index, garbage
      assert(ServingClient.doGetTicket(srv.boundPort, "graft-ticket:nope:0")
        .status.startsWith("ERR NOT_FOUND"))
      assert(ServingClient
        .doGetTicket(srv.boundPort, tickets.head.replaceAll(":\\d+$", ":99999"))
        .status.startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.doGetTicket(srv.boundPort, "graft-ticket:garbage")
        .status.startsWith("ERR INVALID_ARGUMENT"))
    }
  }

  test("ticket DO_GET pages a huge single-partition flight in bounded chunks") {
    // one skewed partition, tiny chunk unit: the server must stream it
    // chunk-by-chunk (≤ ticketChunkRows rows on the driver per pull)
    // and the stitched stream must be row-exact, including across chunk
    // boundaries and the exact-multiple edge below
    val srv = new ServingServer(session, ticketChunkRows = 64).start()
    try {
      val sql =
        "SELECT id, id * 7 AS y FROM range(10000) DISTRIBUTE BY 1" // 1 shuffle partition
      val info = ServingClient.getFlightInfo(srv.boundPort, sql)
      assert(info.isOk, info.status)
      val bigTickets = info.tickets
      val parts = bigTickets.map(t => ServingClient.doGetTicket(srv.boundPort, t))
      parts.foreach(r => assert(r.isOk, r.status))
      val rows = parts.flatMap(_.rows)
        .map(r => (r.head.toString.toLong, r(1).toString.toLong))
      assert(rows.size === 10000)
      assert(rows.toSet === (0L until 10000L).map(i => (i, i * 7)).toSet)
    } finally srv.close()

    // the chunk iterator itself: bounded pulls, lossless total, and the
    // exact-multiple edge (last chunk full -> one extra empty pull, not
    // a duplicate or a miss)
    val (_, rdd) = org.apache.spark.sql.GraftArrowBridge
      .resultRdd(spark.sql("SELECT id FROM range(256) DISTRIBUTE BY 1"))
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val chunks = org.apache.spark.sql.GraftArrowBridge
        .partitionChunks(spark, rdd, 0, 64).toSeq
      assert(chunks.map(_.length) === Seq(64, 64, 64, 64, 0))
      val ids = chunks.flatMap(_.map(_.getLong(0))).sorted
      assert(ids === (0L until 256L).toSeq)
    } finally rdd.unpersist(false)
  }

  test("GET_SCHEMA plans a SQL payload's schema with zero execution") {
    withServer { srv =>
      val r = ServingClient.getSchema(
        srv.boundPort, "SELECT 1 AS a, 'x' AS b, CAST(1.5 AS DOUBLE) AS c")
      assert(r.isOk, r.status)
      assert(r.columnNames === Seq("a", "b", "c") && r.rows.isEmpty)
      assert(ServingClient.getSchema(srv.boundPort, "SELECT FROM WHERE")
        .status.startsWith("ERR INTERNAL"))
      // commands would execute EAGERLY under spark.sql — the probe must
      // refuse them instead of mutating server state
      val cmd = ServingClient.getSchema(srv.boundPort, "SET spark.graft.x=1")
      assert(cmd.status.startsWith("ERR INTERNAL") &&
        cmd.status.contains("queries only"), cmd.status)
      assert(spark.conf.getOption("spark.graft.x").isEmpty,
        "the refused command must not have run")
    }
  }

  test("a silent client times out with DEADLINE_EXCEEDED instead of pinning a worker") {
    val srv = new ServingServer(session, requestTimeoutMs = 300).start()
    try {
      val sock = new java.net.Socket(
        java.net.InetAddress.getLoopbackAddress, srv.boundPort)
      try {
        // send NOTHING: the server must give up on its own
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream))
        val line = in.readLine()
        assert(line != null && line.startsWith("ERR DEADLINE_EXCEEDED"), s"got: $line")
      } finally sock.close()
      // and the worker it held is free again: a normal request still works
      val r = ServingClient.doGet(srv.boundPort, "SELECT 7 AS x")
      assert(r.isOk && r.rows === Seq(Seq(7)))
    } finally srv.close()
  }

  test("pool saturation refuses with RESOURCE_EXHAUSTED, never hangs the client") {
    // 1 worker + queue of 2 = capacity 3; once the held connections occupy
    // it, an overflow connection must be refused with a status line. The
    // handoff from accept loop to pool is async, so probe in a bounded
    // retry loop instead of assuming the very next connection overflows.
    val srv = new ServingServer(session, maxWorkers = 1, requestTimeoutMs = 20000).start()
    try {
      // occupy the single worker DETERMINISTICALLY with a genuinely slow
      // query (a sleeping UDF, not CPU burn — robust under parallel-suite
      // load where silent-socket timing races the probe loop)
      spark.udf.register(
        "graft_test_sleep",
        (ms: Int) => { Thread.sleep(ms.toLong); 1 })
      val slow = new Thread(() =>
        try ServingClient.doGet(srv.boundPort, "SELECT graft_test_sleep(8000) AS x")
        catch { case _: Throwable => () })
      slow.setDaemon(true)
      slow.start()
      val held = (1 to 2).map { _ =>
        // silent connections fill the 2-slot queue behind the busy worker
        new java.net.Socket(java.net.InetAddress.getLoopbackAddress, srv.boundPort)
      }
      try {
        var refused = false
        val statuses = collection.mutable.Buffer[String]()
        var attempts = 0
        while (!refused && attempts < 30) {
          attempts += 1
          val s = new java.net.Socket(
            java.net.InetAddress.getLoopbackAddress, srv.boundPort)
          try {
            s.setSoTimeout(500) // a QUEUED probe blocks; don't hang the test
            val in = new java.io.BufferedReader(
              new java.io.InputStreamReader(s.getInputStream))
            val line =
              try Option(in.readLine()).getOrElse("<closed>")
              catch { case _: java.net.SocketTimeoutException => "<queued>" }
            statuses += line
            refused = line.startsWith("ERR RESOURCE_EXHAUSTED")
          } finally s.close()
        }
        assert(refused, s"no explicit refusal among: $statuses")
      } finally held.foreach(s => try s.close() catch { case _: Throwable => () })
      slow.join(30000)
      // after the worker frees, service resumes. RETRY with a deadline
      // (same pattern as the refusal probe above): the worker may still be
      // draining the closed silent/probe sockets left in the bounded queue,
      // so the first recovery request can race into RESOURCE_EXHAUSTED —
      // a drain-timing artifact, not a server defect.
      val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
      var r = ServingClient.doGet(srv.boundPort, "SELECT 9 AS x")
      while (!r.isOk && System.nanoTime() < deadline) {
        Thread.sleep(200)
        r = ServingClient.doGet(srv.boundPort, "SELECT 9 AS x")
      }
      assert(r.isOk && r.rows === Seq(Seq(9)), s"recovery status: ${r.status}")
    } finally srv.close()
  }

  test("concurrent clients each get complete, correct streams") {
    withServer { srv =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val futures = (1 to 8).map { i =>
        Future {
          val r = ServingClient.doGet(
            srv.boundPort,
            s"SELECT id, id * $i AS x FROM range(${500 * i}) ORDER BY id"
          )
          (i, r)
        }
      }
      Await.result(Future.sequence(futures), 60.seconds).foreach { case (i, r) =>
        assert(r.isOk, s"client $i: ${r.status}")
        assert(r.rows.size === 500 * i, s"client $i row count")
        assert(r.rows.last(1).toString.toLong === (500L * i - 1) * i, s"client $i payload")
      }
    }
  }

  test("DO_PUT ingests an Arrow stream; DO_GET queries it — the full loop") {
    import spark.implicits._
    withServer { srv =>
      val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5))
        .toDF("k", "s", "v")
      val put = ServingClient.doPut(srv.boundPort, "put_tbl", df, batchSize = 2)
      assert(put.isOk, put.status)
      assert(put.columnNames === Seq("k", "s", "v"), "DO_PUT echoes the registered schema")
      assert(put.rows.isEmpty, "DO_PUT response is schema-only")

      val got = ServingClient.doGet(
        srv.boundPort,
        "SELECT k, s, v * 2 AS v2 FROM put_tbl ORDER BY k"
      )
      assert(got.isOk, got.status)
      assert(got.rows.map(r => (r(0).toString.toLong, r(1).toString, r(2).toString.toDouble))
        === Seq((1L, "alpha", 3.0), (2L, "beta", 5.0), (3L, "gamma", 7.0)))

      // GET_SCHEMA over what DO_PUT registered
      val sch = ServingClient.getSchema(srv.boundPort, "put_tbl")
      assert(sch.isOk && sch.columnNames === Seq("k", "s", "v") && sch.rows.isEmpty)

      // LIST_FLIGHTS surfaces it in the catalog
      val ls = ServingClient.listFlights(srv.boundPort)
      assert(ls.isOk && ls.columnNames === Seq("kind", "name", "partitions"))
      assert(ls.rows.filter(_.head.toString == "table")
        .map(_(1).toString).contains("put_tbl"))
    }
  }

  test("LIST_FLIGHTS lists live flights with their partition counts") {
    import spark.implicits._
    (1 to 40).map(i => (i.toLong, s"n$i")).toDF("k", "s")
      .repartition(4).createOrReplaceTempView("lf_tbl")
    withServer { srv =>
      // no flights registered yet: only catalog rows
      val before = ServingClient.listFlights(srv.boundPort)
      assert(before.isOk)
      assert(before.rows.forall(_.head.toString == "table"))

      // register two flights; each should list with its endpoint count
      val f1 = ServingClient.getFlightInfo(srv.boundPort,
        "SELECT k FROM lf_tbl")
      val f2 = ServingClient.getFlightInfo(srv.boundPort,
        "SELECT k, s FROM lf_tbl WHERE k <= 10")
      assert(f1.isOk && f2.isOk)
      def handleOf(r: ServingClient.Response): String =
        r.status.split(' ')(2)
      def endpointsOf(r: ServingClient.Response): Long =
        r.status.split(' ')(1).toLong
      val ls = ServingClient.listFlights(srv.boundPort)
      assert(ls.isOk && ls.columnNames === Seq("kind", "name", "partitions"))
      val flightRows = ls.rows.filter(_.head.toString == "flight")
        .map(r => r(1).toString -> r(2).toString.toLong).toMap
      assert(flightRows.keySet === Set(handleOf(f1), handleOf(f2)))
      assert(flightRows(handleOf(f1)) === endpointsOf(f1))
      assert(flightRows(handleOf(f2)) === endpointsOf(f2))
      // a listed flight is directly fetchable by a SECOND client via the
      // listed handle + partition count — the discovery loop LIST_FLIGHTS
      // exists for
      val rows = (0L until flightRows(handleOf(f2))).flatMap { i =>
        val t = ServingClient.doGetTicket(srv.boundPort,
          s"graft-ticket:${handleOf(f2)}:$i")
        assert(t.isOk, t.status)
        t.rows
      }
      assert(rows.map(_.head.toString.toLong).sorted === (1L to 10L))
    }
  }

  test("DO_PUT past the row/byte bound answers RESOURCE_EXHAUSTED, registers nothing") {
    import spark.implicits._
    // row bound
    val rowSrv = new ServingServer(session, maxPutRows = 5).start()
    try {
      val big = (1 to 50).map(i => (i.toLong, s"row$i")).toDF("k", "s")
      val r = ServingClient.doPut(rowSrv.boundPort, "oversized_tbl", big, batchSize = 4)
      assert(r.status.startsWith("ERR RESOURCE_EXHAUSTED"), r.status)
      // the refused table must not be half-registered
      assert(ServingClient.getSchema(rowSrv.boundPort, "oversized_tbl").status
        .startsWith("ERR INTERNAL"))
      // and an in-bound put on the same server still works
      val ok = ServingClient.doPut(
        rowSrv.boundPort, "small_tbl", Seq((1L, "a")).toDF("k", "s"))
      assert(ok.isOk, ok.status)
    } finally rowSrv.close()

    // byte bound, single giant batch: the child allocator refuses at
    // allocation time, before the payload is ever resident in driver memory
    val byteSrv = new ServingServer(session, maxPutBytes = 1024).start()
    try {
      val fat = (1 to 2000).map(i => (i.toLong, "x" * 64)).toDF("k", "s")
      val r = ServingClient.doPut(byteSrv.boundPort, "fat_tbl", fat, batchSize = 2000)
      assert(r.status.startsWith("ERR RESOURCE_EXHAUSTED"), r.status)
    } finally byteSrv.close()

    // byte bound, MANY SMALL batches: each batch fits the allocator, but
    // the decoded rows accumulate on the driver — the cumulative
    // accounting must refuse what per-batch allocation alone would admit
    val cumSrv = new ServingServer(session, maxPutBytes = 64 * 1024).start()
    try {
      val wide = (1 to 4000).map(i => (i.toLong, "y" * 64)).toDF("k", "s")
      val r = ServingClient.doPut(cumSrv.boundPort, "cum_tbl", wide, batchSize = 100)
      assert(r.status.startsWith("ERR RESOURCE_EXHAUSTED"), r.status)
      assert(ServingClient.getSchema(cumSrv.boundPort, "cum_tbl").status
        .startsWith("ERR INTERNAL"))
    } finally cumSrv.close()
  }

  test("DO_PUT rejects missing/invalid table names and garbage payloads") {
    withServer { srv =>
      assert(ServingClient.request(srv.boundPort, "DO_PUT").status
        .startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.request(srv.boundPort, "DO_PUT", "bad name; drop").status
        .startsWith("ERR INVALID_ARGUMENT"))
      // a body that is not an Arrow stream must come back as a status line
      val garbage = ServingClient.request(srv.boundPort, "DO_PUT", "g_tbl",
        body = out => out.write("this is not arrow".getBytes("UTF-8")))
      assert(garbage.status.startsWith("ERR INTERNAL"), garbage.status)
      assert(ServingClient.getSchema(srv.boundPort, "nonexistent_tbl").status
        .startsWith("ERR INTERNAL"))
    }
  }

  test("DO_EXCHANGE transforms an uploaded batch server-side in one round trip") {
    import spark.implicits._
    withServer { srv =>
      val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
        .toDF("id", "v")
      val r = ServingClient.doExchange(srv.boundPort,
        "SELECT id, v * 2 AS dbl FROM input WHERE id % 2 = 0 ORDER BY id", df)
      assert(r.isOk, r.status)
      assert(r.columnNames === Seq("id", "dbl"))
      assert(r.rows.map(row => (row(0).toString.toLong, row(1).toString.toDouble))
        === Seq((2L, 40.0), (4L, 80.0)))
    }
  }

  test("DO_EXCHANGE joins the uploaded batch against the server's catalog") {
    import spark.implicits._
    Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "name")
      .createOrReplaceTempView("xchg_dim")
    withServer { srv =>
      val keys = Seq(Tuple1(3L), Tuple1(1L)).toDF("k")
      val r = ServingClient.doExchange(srv.boundPort,
        "SELECT i.k, d.name FROM input i JOIN xchg_dim d ON i.k = d.k ORDER BY i.k",
        keys)
      assert(r.isOk, r.status)
      assert(r.rows.map(row => (row(0).toString.toLong, row(1).toString))
        === Seq((1L, "one"), (3L, "three")))
    }
  }

  test("DO_EXCHANGE binds `input` per-request: concurrent exchanges and catalog shadowing") {
    import spark.implicits._
    // a REAL catalog table named `input` must be shadowed by the upload
    // for exactly the exchange's query — and stay untouched afterwards
    Seq(Tuple1("catalog-row")).toDF("s").createOrReplaceTempView("input")
    withServer { srv =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val futs = (1 to 6).map { i =>
        Future {
          val df = Seq.tabulate(10)(j => (i.toLong, j.toLong)).toDF("tag", "j")
          ServingClient.doExchange(srv.boundPort,
            "SELECT tag, sum(j) AS sj FROM input GROUP BY tag", df)
        }
      }
      val results = Await.result(Future.sequence(futs), 120.seconds)
      results.zipWithIndex.foreach { case (r, idx) =>
        assert(r.isOk, r.status)
        assert(r.rows.map(row => (row(0).toString.toLong, row(1).toString.toLong))
          === Seq(((idx + 1).toLong, 45L)), s"exchange ${idx + 1} saw foreign rows")
      }
      // the catalog's own `input` is untouched by six shadowing exchanges
      val cat = ServingClient.doGet(srv.boundPort, "SELECT s FROM input")
      assert(cat.isOk && cat.rows === Seq(Seq(new org.apache.arrow.vector.util.Text("catalog-row"))),
        s"catalog table corrupted: ${cat.rows}")
    }
  }

  test("DO_EXCHANGE refusals: commands, SQL ignoring input, bad columns, over-limit bodies") {
    import spark.implicits._
    withServer { srv =>
      val df = Seq(Tuple1(1L)).toDF("k")
      // empty payload
      assert(ServingClient.request(srv.boundPort, "DO_EXCHANGE").status
        .startsWith("ERR INVALID_ARGUMENT"))
      // a command must be refused at parse time (would execute eagerly)
      assert(ServingClient.doExchange(srv.boundPort,
        "CREATE TABLE pwned AS SELECT * FROM input", df).status
        .startsWith("ERR INTERNAL"))
      // SQL that never references the upload is a malformed exchange
      assert(ServingClient.doExchange(srv.boundPort,
        "SELECT 1 AS x", df).status
        .startsWith("ERR INTERNAL"))
      // analysis failure against the uploaded schema arrives pre-OK
      assert(ServingClient.doExchange(srv.boundPort,
        "SELECT no_such_col FROM input", df).status
        .startsWith("ERR INTERNAL"))
      // garbage body: status line, not a hang or RST
      assert(ServingClient.request(srv.boundPort, "DO_EXCHANGE",
        "SELECT k FROM input",
        body = out => out.write("not arrow".getBytes("UTF-8"))).status
        .startsWith("ERR INTERNAL"))
      // and the server still serves after all that
      assert(ServingClient.doExchange(srv.boundPort,
        "SELECT k FROM input", df).isOk)
    }
    // ingest bounds apply to the exchange body exactly as to DO_PUT
    val bounded = new ServingServer(session, maxPutRows = 5).start()
    try {
      val big = (1 to 50).map(i => Tuple1(i.toLong)).toDF("k")
      val r = ServingClient.doExchange(bounded.boundPort,
        "SELECT count(*) AS n FROM input", big, batchSize = 4)
      assert(r.status.startsWith("ERR RESOURCE_EXHAUSTED"), r.status)
    } finally bounded.close()
  }

  test("POLL_FLIGHT_INFO: async submit, poll to DONE, fetch tickets") {
    withServer { srv =>
      val sub = ServingClient.pollFlightInfo(
        srv.boundPort,
        "SELECT id % 10 AS k, count(*) AS n FROM range(2000000) GROUP BY id % 10"
      )
      val p0 = ServingClient.Poll.parse(sub.status).getOrElse(
        fail(s"unparseable poll status: ${sub.status}"))
      assert(p0.state === "RUNNING")
      assert(sub.columnNames.isEmpty, "schema is unknown at submit time")

      var poll = p0
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (poll.state == "RUNNING" && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val r = ServingClient.pollFlightInfo(srv.boundPort, p0.handle)
        poll = ServingClient.Poll.parse(r.status).getOrElse(
          fail(s"unparseable poll status: ${r.status}"))
      }
      assert(poll.state === "DONE", s"final state: $poll")
      assert(poll.endpoints > 0)
      assert(poll.totalTasks > 0 && poll.doneTasks === poll.totalTasks,
        s"progress must reach completion: $poll")
      // DONE poll carries the result schema
      val done = ServingClient.pollFlightInfo(srv.boundPort, p0.handle)
      assert(done.columnNames === Seq("k", "n"))

      val rows = poll.tickets.flatMap(t =>
        ServingClient.doGetTicket(srv.boundPort, t).rows)
      assert(rows.size === 10)
      assert(rows.map(_(1).toString.toLong).sum === 2000000L)
    }
  }

  test("DO_ACTION cancel kills a running flight's job group and unpins it") {
    withServer { srv =>
      // ~4e10-row cross join: long enough to be mid-flight when cancelled
      val slow = "SELECT x.id % 7 AS k, count(*) AS n " +
        "FROM range(200000) x CROSS JOIN range(200000) y GROUP BY x.id % 7"
      val sub = ServingClient.pollFlightInfo(srv.boundPort, slow)
      val handle = ServingClient.Poll.parse(sub.status).get.handle

      // progress becomes visible once the first stage submits
      var saw = ServingClient.Poll.parse(
        ServingClient.pollFlightInfo(srv.boundPort, handle).status).get
      val t0 = System.nanoTime()
      while (saw.state == "RUNNING" && saw.totalTasks == 0 &&
          System.nanoTime() - t0 < 60L * 1000000000L) {
        Thread.sleep(100)
        saw = ServingClient.Poll.parse(
          ServingClient.pollFlightInfo(srv.boundPort, handle).status).get
      }
      assert(saw.state === "RUNNING", s"query finished before cancel: $saw")
      assert(saw.totalTasks > 0, "status tracker never saw the job group")

      val cancel = ServingClient.doAction(srv.boundPort, "cancel", handle)
      assert(cancel.isOk, cancel.status)
      assert(cancel.rows.map(_.map(_.toString))
        === Seq(Seq("cancel", handle, "cancelled_running")))

      val after = ServingClient.Poll.parse(
        ServingClient.pollFlightInfo(srv.boundPort, handle).status).get
      assert(after.state === "CANCELLED")
      // the Spark jobs actually die (interruptOnCancel), freeing executors
      val tracker = spark.sparkContext.statusTracker
      val drainBy = System.nanoTime() + 60L * 1000000000L
      def live() = tracker
        .getJobIdsForGroup(s"graft-flight-$handle")
        .flatMap(id => tracker.getJobInfo(id).toSeq)
        .count(_.status() == org.apache.spark.JobExecutionStatus.RUNNING)
      while (live() > 0 && System.nanoTime() < drainBy) Thread.sleep(200)
      assert(live() === 0, "cancelled job group still has running jobs")
      // and no flight was pinned: its ticket namespace answers NOT_FOUND
      val t = ServingClient.doGetTicket(
        srv.boundPort, s"graft-ticket:$handle:0")
      assert(t.status.startsWith("ERR NOT_FOUND"), t.status)
    }
  }

  test("DO_ACTION cancel unpersists an already-registered flight") {
    withServer { srv =>
      val persistedBefore = spark.sparkContext.getPersistentRDDs.size
      val info = ServingClient.getFlightInfo(
        srv.boundPort, "SELECT id FROM range(1000)")
      assert(info.isOk, info.status)
      val handle = info.status.split(' ')(2)
      assert(spark.sparkContext.getPersistentRDDs.size === persistedBefore + 1)

      val cancel = ServingClient.doAction(srv.boundPort, "cancel", handle)
      assert(cancel.isOk, cancel.status)
      assert(cancel.rows.map(_.map(_.toString))
        === Seq(Seq("cancel", handle, "cancelled_registered")))
      assert(spark.sparkContext.getPersistentRDDs.size === persistedBefore,
        "cancel must unpersist the flight's RDD")
      val t = ServingClient.doGetTicket(srv.boundPort, s"graft-ticket:$handle:0")
      assert(t.status.startsWith("ERR NOT_FOUND"), t.status)
    }
  }

  test("abandoned flights expire after the TTL: tickets fail, RDD unpersists") {
    val srv = new ServingServer(session, flightTtlMs = 300).start()
    try {
      val persistedBefore = spark.sparkContext.getPersistentRDDs.size
      val info = ServingClient.getFlightInfo(
        srv.boundPort, "SELECT id FROM range(1000)")
      assert(info.isOk, info.status)
      val ticket = info.tickets.head
      // live flight serves while fresh
      assert(ServingClient.doGetTicket(srv.boundPort, ticket).isOk)

      // ... then the client vanishes; the background sweeper reaps it
      val deadline = System.nanoTime() + 30L * 1000000000L
      var expired = false
      while (!expired && System.nanoTime() < deadline) {
        Thread.sleep(200)
        expired = spark.sparkContext.getPersistentRDDs.size == persistedBefore
      }
      assert(expired, "expired flight's RDD was never unpersisted")
      val r = ServingClient.doGetTicket(srv.boundPort, ticket)
      assert(r.status.startsWith("ERR NOT_FOUND"), r.status)
    } finally srv.close()
  }

  test("POLL_FLIGHT_INFO surfaces async failures as FAILED with the error text") {
    withServer { srv =>
      // parses fine (so the submit is accepted), fails at analysis in
      // the runner — the client must see FAILED + the reason, not a
      // silent RUNNING forever or a dropped connection
      val sub = ServingClient.pollFlightInfo(
        srv.boundPort, "SELECT x FROM table_that_never_was")
      val handle = ServingClient.Poll.parse(sub.status).get.handle
      var poll = ServingClient.Poll.parse(sub.status).get
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (poll.state == "RUNNING" && System.nanoTime() < deadline) {
        Thread.sleep(100)
        poll = ServingClient.Poll.parse(
          ServingClient.pollFlightInfo(srv.boundPort, handle).status).get
      }
      assert(poll.state === "FAILED", s"final state: $poll")
      assert(poll.error.toLowerCase.contains("table_that_never_was"),
        s"error text lost: '${poll.error}'")
      // cleanup-cancel of a FAILED flight reports already_finished and
      // must NOT overwrite the recorded failure
      val c = ServingClient.doAction(srv.boundPort, "cancel", handle)
      assert(c.rows.map(_.map(_.toString)) ===
        Seq(Seq("cancel", handle, "already_finished")))
      val after = ServingClient.Poll.parse(
        ServingClient.pollFlightInfo(srv.boundPort, handle).status).get
      assert(after.state === "FAILED" && after.error.nonEmpty,
        s"cancel erased the failure record: $after")
    }
  }

  test("analyze_table harvests wire-visible statistics; stats_describe lists; catalog_save persists them") {
    withServer { srv =>
      val li = s"${SparkTestBase.Sf0001}/lineitem.parquet"
      try {
        val at = ServingClient.doAction(srv.boundPort, "analyze_table", li)
        assert(at.isOk, at.status)
        val supp = at.rows.find(_(2).toString == "l_suppkey")
          .getOrElse(fail(s"no l_suppkey row: ${at.rows.take(3)}"))
        assert(supp(3).toString.toLong >= 5L, supp.toString)
        // r20: joint combo request over the wire — comma-list after the
        // path; the joint row reports the canonical comboKey
        val atC = ServingClient.doAction(srv.boundPort, "analyze_table",
          s"$li l_suppkey,l_returnflag")
        assert(atC.isOk, atC.status)
        val joint = atC.rows.find(_(2).toString == "(l_returnflag,l_suppkey)")
          .getOrElse(fail(s"no joint row: ${atC.rows.map(_(2)).mkString(",")}"))
        assert(joint(3).toString.toLong >= 5L, joint.toString)
        val sd = ServingClient.doAction(srv.boundPort, "stats_describe")
        assert(sd.isOk && sd.rows.exists(_(0).toString ==
          graft.plans.StatsCatalog.normalize(li)), sd.rows.toString)
        // r20: the staleness column reads FRESH right after the analyze
        // (fixtures are immutable), and the combo count surfaces
        val sdRow = sd.rows.find(_(0).toString ==
          graft.plans.StatsCatalog.normalize(li)).get
        // the combo analyze above re-registered the entry with one joint
        assert(sdRow(3).toString.toLong === 1L, s"combos: $sdRow")
        assert(sdRow(5).toString == "false", s"stale: $sdRow")
        // the statistics ride the durable catalog over the wire
        val file = tempDir("graft-ss-stats") + "/cat.json"
        assert(ServingClient.doAction(
          srv.boundPort, "catalog_save", file).isOk)
        graft.plans.StatsCatalog.clear()
        assert(ServingClient.doAction(
          srv.boundPort, "catalog_load", file).isOk)
        assert(graft.plans.StatsCatalog.tracked(li),
          "statistics must survive the save/load round trip")
        // refusals stay on the status line, never a broken stream
        assert(ServingClient.doAction(srv.boundPort, "analyze_table").status
          .startsWith("ERR INVALID_ARGUMENT"))
        assert(ServingClient.doAction(srv.boundPort, "analyze_table",
          "/nope/nothing").status.startsWith("ERR INVALID_ARGUMENT"))
      } finally graft.plans.StatsCatalog.unregister(li)
    }
  }

  test("LIST_ACTIONS advertises cancel; unknown actions/handles refuse cleanly") {
    withServer { srv =>
      val actions = ServingClient.listActions(srv.boundPort)
      assert(actions.isOk, actions.status)
      assert(actions.rows.map(_.head.toString) ===
        Seq("cancel", "mv_describe", "ann_probe", "mv_refresh",
          "mv_maintain", "stream_view_describe", "store_compact",
          "store_describe", "table_maintain", "advise",
          "store_autopilot", "catalog_save", "catalog_load",
          "analyze_table", "stats_describe"))
      assert(ServingClient.doAction(srv.boundPort, "cancel", "nope").status
        .startsWith("ERR NOT_FOUND"))
      assert(ServingClient.doAction(srv.boundPort, "cancel").status
        .startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.doAction(srv.boundPort, "vacuum").status
        .startsWith("ERR INVALID_ARGUMENT"))
      // handle-shaped (hex 'p' hex) but unknown -> NOT_FOUND...
      assert(ServingClient.pollFlightInfo(srv.boundPort, "deadpbeef").status
        .startsWith("ERR NOT_FOUND"))
      // ...whitespace-free NON-handle payloads are SQL, not handles:
      // valid compact SQL submits (async) instead of misrouting
      val compactSql = ServingClient.pollFlightInfo(srv.boundPort, "select(1)")
      assert(ServingClient.Poll.parse(compactSql.status).exists(_.state == "RUNNING"),
        s"compact SQL misrouted: ${compactSql.status}")
    }
  }

  test("DO_ACTION mv_describe: the freshness watermark of a just-refreshed view, gone stale, fresh again") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    import graft.sources.{IcebergMeta, IcebergWriter}
    import graft.streaming.MaterializedAgg
    val src = tempDir("graft-mvdesc-src") + "/table"
    val view = tempDir("graft-mvdesc-view") + "/table"
    IcebergWriter.append(spark, src,
      (0L until 8L).map(i => (i, i * 10)).toDF("id", "m"),
      None, 1000L, formatVersion = 2)
    def registerAt(wm: Long): Unit =
      graft.plans.MvCatalog.register(graft.plans.MvDef(
        name = "served_view", basePath = src, keys = Seq("k"),
        measures = Map.empty, countStar = Some("c"), mvPath = view,
        mvSchema = new org.apache.spark.sql.types.StructType(),
        watermark = Some(wm)))
    val applied = MaterializedAgg.refreshStep(
      spark, view, src, pmod(col("id"), lit(2)), col("m"), 2000L).get
    registerAt(applied)
    try withServer { srv =>
      // row: name kind base_path dim_path mv_path watermark source_snapshot fresh
      def row() = {
        val r = ServingClient.doAction(srv.boundPort, "mv_describe")
        assert(r.isOk, r.status)
        r.rows.find(_.head.toString == "served_view")
          .getOrElse(fail(s"served_view missing from: ${r.rows}"))
      }
      val freshRow = row()
      assert(freshRow(1).toString === "rollup")
      assert(freshRow(5) === applied && freshRow(6) === applied)
      assert(freshRow(7) === true, s"just-refreshed view must be fresh: $freshRow")
      // the source advances UNDER the view: the watermark stands, the
      // live head moves, and the row says a rewritten answer is stale
      IcebergWriter.upsertRows(spark, src, Seq((100L, 5L)).toDF("id", "m"),
        "id", 3000L)
      val staleRow = row()
      assert(staleRow(5) === applied)
      assert(staleRow(6) === IcebergMeta.load(src).currentSnapshot.get.id)
      assert(staleRow(7) === false, s"advanced source must read stale: $staleRow")
      // refresh + re-register closes the loop
      val applied2 = MaterializedAgg.refreshStep(
        spark, view, src, pmod(col("id"), lit(2)), col("m"), 4000L).get
      registerAt(applied2)
      val again = row()
      assert(again(5) === applied2 && again(7) === true, s"re-refreshed: $again")
    } finally graft.plans.MvCatalog.unregister(src)
  }

  test("DO_ACTION advise: recommendations + rejection reasons over the wire; bad SQL refuses before OK") {
    import spark.implicits._
    val base = tempDir("graft-advise-srv") + "/srvbase.parquet"
    Seq(("a", 1L, 10L), ("a", 2L, 10L), ("b", 3L, 20L))
      .toDF("g", "v", "m").write.mode("overwrite").parquet(base)
    session.registerTable("advise_base", spark.read.parquet(base))
    withServer { srv =>
      val r = ServingClient.doAction(srv.boundPort, "advise",
        "SELECT g, sum(m) AS sm, count(DISTINCT v) AS dv, " +
          "stddev(m) AS sd FROM advise_base GROUP BY g")
      assert(r.isOk, r.status)
      // the DISTINCT makes this whole aggregate non-rollup-able, so the
      // harvest rejects on the first disqualifier (stddev) — the action
      // must surface the reason rather than a silent empty answer
      val kinds = r.rows.map(_.head.toString)
      assert(kinds.contains("rejected"), s"rows: ${r.rows}")
      assert(r.rows.filter(_.head.toString == "rejected")
        .exists(_(5).toString.contains("not derivable")), r.rows)
      // a DISTINCT dashboard is served WHOLE by the multiplicity store
      // (the sum measure rides its grain) — no useless rollup alongside
      val r2 = ServingClient.doAction(srv.boundPort, "advise",
        "SELECT g, sum(m) AS sm, count(DISTINCT v) AS dv " +
          "FROM advise_base GROUP BY g")
      assert(r2.isOk, r2.status)
      val byKind = r2.rows.groupBy(_.head.toString)
      assert(byKind.keySet === Set("multiplicity"), r2.rows)
      assert(byKind("multiplicity").head(2).toString === "g,v")
      assert(byKind("multiplicity").head(3).toString.contains("sum:m"))
      // a distinct-free statement recommends the rollup
      val r2b = ServingClient.doAction(srv.boundPort, "advise",
        "SELECT g, sum(m) AS sm FROM advise_base GROUP BY g")
      assert(r2b.isOk, r2b.status)
      val rollRows = r2b.rows.filter(_.head.toString == "rollup")
      assert(rollRows.nonEmpty && rollRows.head(3).toString.contains("sum:m"),
        r2b.rows)
      // a join aggregate recommends a row-grain join view
      val dimB = tempDir("graft-advise-dim") + "/srvdim.parquet"
      Seq(("a", "alpha"), ("b", "beta")).toDF("dg", "label")
        .write.mode("overwrite").parquet(dimB)
      session.registerTable("advise_dim", spark.read.parquet(dimB))
      val r3 = ServingClient.doAction(srv.boundPort, "advise",
        "SELECT label, sum(m) AS sm FROM advise_base " +
          "JOIN advise_dim ON g = dg GROUP BY label")
      assert(r3.isOk, r3.status)
      val joinRow = r3.rows.find(_.head.toString == "join")
      assert(joinRow.isDefined, s"rows: ${r3.rows}")
      assert(joinRow.get(2).toString === "g=dg")
      // an ANN workload (cosine top-k over a scanned embedding column)
      // recommends a stored IVF index
      val annB = tempDir("graft-advise-ann") + "/vecs.parquet"
      Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
        (3L, Seq(0.7f, 0.7f))).toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(annB)
      session.registerTable("advise_vecs", spark.read.parquet(annB))
      val r4 = ServingClient.doAction(srv.boundPort, "advise",
        "SELECT vec_id, cosine_sim(embedding, array(CAST(1.0 AS FLOAT), " +
          "CAST(0.0 AS FLOAT))) AS c FROM advise_vecs ORDER BY c DESC " +
          "LIMIT 2")
      assert(r4.isOk, r4.status)
      val annRow = r4.rows.find(_.head.toString == "ivf_index")
      assert(annRow.isDefined, s"rows: ${r4.rows}")
      assert(annRow.get(2).toString === "embedding", annRow.get)
      // bad SQL refuses BEFORE the OK status
      assert(ServingClient.doAction(srv.boundPort, "advise",
        "SELECT FROM nothing AT ALL").status
        .startsWith("ERR INVALID_ARGUMENT"))
      // bare advise folds the session's OBSERVED workload. The stddev
      // statement above was rejected WHOLE (one disqualifier poisons
      // the shape), so land a second clean distinct dashboard first —
      // the fold must then count both
      assert(ServingClient.doAction(srv.boundPort, "advise",
        "SELECT g, count(DISTINCT v) AS dv FROM advise_base " +
          "WHERE g <> 'zz' GROUP BY g").isOk)
      val hist = ServingClient.doAction(srv.boundPort, "advise")
      assert(hist.isOk, hist.status)
      val histMult = hist.rows
        .find(r => r.head.toString == "multiplicity" &&
          r(1).toString.contains("srvbase"))
      assert(histMult.isDefined, s"rows: ${hist.rows}")
      assert(histMult.get(4).toString.toLong >= 2L,
        s"history fold must count both dashboards: ${histMult.get}")
      assert(hist.rows.exists(_.head.toString == "join"),
        "history fold must carry the join recommendation")
    }
  }

  test("advisor lifecycle over the wire: advise names the Iceberg root, the built MV serves fresh, goes stale on churn, refreshes fresh") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    import graft.plans.{MvAdvisor, MvCatalog}
    import graft.sources.{IcebergSource, IcebergWriter}
    val tbl = tempDir("graft-advise-ice") + "/table"
    val mvRoot = tempDir("graft-advise-ice-mv") + "/mv"
    IcebergWriter.append(spark, tbl,
      Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "v"),
      None, 1000L, formatVersion = 2)
    session.registerTable("advise_ice", IcebergSource.read(spark, tbl))
    def dash = IcebergSource.read(spark, tbl)
      .groupBy(col("k")).agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
    val rec = MvAdvisor
      .recommend(MvAdvisor.analyze(dash).flatMap(_.toOption))
      .headOption.getOrElse(fail("advisor recommended nothing"))
    try withServer { srv =>
      // advise over the wire carries the TABLE ROOT as the base
      val adv = ServingClient.doAction(srv.boundPort, "advise",
        "SELECT k, sum(v) AS sv, count(*) AS n FROM advise_ice GROUP BY k")
      assert(adv.isOk, adv.status)
      val roll = adv.rows.find(_.head.toString == "rollup")
        .getOrElse(fail(s"no rollup row: ${adv.rows}"))
      assert(roll(1).toString === tbl,
        s"recommendation must key the Iceberg root: $roll")
      // materialize: pinned build, watermark stamped -> fresh over the wire
      rec.materialize(spark, mvRoot)
      def freshRow() = {
        val r = ServingClient.doAction(srv.boundPort, "mv_describe")
        assert(r.isOk, r.status)
        r.rows.find(_.head.toString == rec.mvName)
          .getOrElse(fail(s"${rec.mvName} missing: ${r.rows}"))
      }
      assert(freshRow()(7) === true, s"just-built MV must be fresh")
      // churn the base: the stamped watermark stands, the head moves
      IcebergWriter.append(spark, tbl, Seq(("c", 9L)).toDF("k", "v"),
        None, 2000L)
      assert(freshRow()(7) === false, "churned base must read stale")
      // the WIRE face of the refresh: mv_refresh by registered name
      val refreshed = ServingClient.doAction(
        srv.boundPort, "mv_refresh", rec.mvName)
      assert(refreshed.isOk, refreshed.status)
      assert(refreshed.rows.head.head.toString === rec.mvName)
      assert(refreshed.rows.head(1) ===
        graft.sources.IcebergMeta.load(tbl).currentSnapshot.get.id,
        s"applied snapshot must be the head: ${refreshed.rows}")
      assert(freshRow()(7) === true, "refreshed MV must be fresh again")
      // an already-current view answers OK with a null applied snapshot
      val noop = ServingClient.doAction(
        srv.boundPort, "mv_refresh", rec.mvName)
      assert(noop.isOk && noop.rows.head(1) == null, noop.rows)
      // refusals before OK: unknown name; a hand-declared def
      assert(ServingClient.doAction(srv.boundPort, "mv_refresh", "nope")
        .status.startsWith("ERR INVALID_ARGUMENT"))
      graft.plans.MvCatalog.register(graft.plans.MvDef(
        name = "hand_declared", basePath = tbl, keys = Seq("k"),
        measures = Map.empty, countStar = None, mvPath = mvRoot,
        mvSchema = new org.apache.spark.sql.types.StructType()))
      assert(ServingClient.doAction(srv.boundPort, "mv_refresh",
        "hand_declared").status.startsWith("ERR INVALID_ARGUMENT"))
      // the refresh hook shape still works driver-side too (the
      // maintainedSink plug the streaming test composes)
      IcebergWriter.append(spark, tbl, Seq(("d", 4L)).toDF("k", "v"),
        None, 3000L)
      assert(rec.refreshHook(mvRoot)(spark, 4000L).isDefined)
      assert(freshRow()(7) === true)
      // and the served answer equals the direct recompute
      val d = MvCatalog.lookup(tbl).find(_.name == rec.mvName).get
      val stored = spark.read.parquet(d.mvPath)
        .orderBy(col("k")).collect().map(_.toSeq).toSeq
      val direct = dash.orderBy(col("k")).collect().map(_.toSeq).toSeq
      assert(stored.map(r => (r.head, r(1), r.last)) ===
        direct.map(r => (r.head, r(1), r.last)))
    } finally MvCatalog.unregister(tbl)
  }

  test("DO_ACTION mv_maintain sweeps the catalog; mv_refresh answers join views by name") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    import graft.plans.{MvAdvisor, MvCatalog}
    import graft.sources.{IcebergMeta, IcebergSource, IcebergWriter}
    val fact = tempDir("graft-maint-wire-fact") + "/table"
    val dimP = tempDir("graft-maint-wire-dim") + "/dim.parquet"
    val rollRoot = tempDir("graft-maint-wire-roll") + "/mv"
    val joinRoot = tempDir("graft-maint-wire-join") + "/mv"
    IcebergWriter.append(spark, fact,
      Seq(("a", 10L), ("b", 5L)).toDF("k", "v"), None, 1000L,
      formatVersion = 2)
    Seq(("a", "alpha"), ("b", "beta")).toDF("dk", "label")
      .write.mode("overwrite").parquet(dimP)
    def rollDash = IcebergSource.read(spark, fact)
      .groupBy(col("k")).agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
    def joinDash = IcebergSource.read(spark, fact)
      .join(spark.read.parquet(dimP), col("k") === col("dk"), "inner")
      .groupBy(col("label")).agg(sum(col("v")).as("sv"))
    val roll = MvAdvisor
      .recommend(MvAdvisor.analyze(rollDash).flatMap(_.toOption)).head
    val join = MvAdvisor.recommendJoins(
      MvAdvisor.analyzeJoins(joinDash).flatMap(_.toOption)).head
    try withServer { srv =>
      roll.materialize(spark, rollRoot): Unit
      join.materialize(spark, joinRoot): Unit
      def sweep() = {
        val r = ServingClient.doAction(srv.boundPort, "mv_maintain")
        assert(r.isOk, r.status)
        r.rows.filter(row => Set(roll.mvName, join.mvName)(
          row.head.toString)).map(row => row.head.toString -> row).toMap
      }
      // just built: the sweep reports both current, refreshes nothing
      val s0 = sweep()
      assert(s0.size === 2, s0.keySet)
      assert(s0.values.forall(r => r(2) == false && r(5) == null), s0)
      // churn the fact: ONE wire action brings both views current
      IcebergWriter.append(spark, fact,
        Seq(("a", 100L), ("c", 7L)).toDF("k", "v"), None, 2000L)
      val head2 = IcebergMeta.load(fact).currentSnapshot.get.id
      val s1 = sweep()
      assert(s1(roll.mvName)(2) == true && s1(roll.mvName)(3) === head2, s1)
      assert(s1(join.mvName)(2) == true && s1(join.mvName)(3) === head2, s1)
      // join rows carry the dim cursor too (0 = plain-parquet dim side)
      assert(s1(join.mvName)(4) === 0L, s1)
      assert(s1(roll.mvName)(4) == null, s1)
      // both registered defs re-stamped; the stored join view matches
      assert(MvCatalog.findJoin(join.mvName).get.watermark === Some(head2))
      val jd = MvCatalog.findJoin(join.mvName).get
      assert(spark.read.parquet(jd.mvPath)
        .groupBy(col("label")).agg(sum(col("v")).as("sv"))
        .orderBy(col("label"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
        joinDash.orderBy(col("label"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
      // index STORES ride the SAME wire sweep (r17): a lineage-carrying
      // minhash store on the fact refreshes with the views; a
      // lineage-less store reports its skip reason over the wire
      val mhRec = MvAdvisor.DedupIndexRecommendation(fact, "k", 1)
      val mhRoot = tempDir("graft-maint-wire-store") + "/index"
      mhRec.materialize(spark, mhRoot, idCol = "v"): Unit
      graft.operators.StoreCatalog.register(graft.operators.StoreDef(
        "wire_plain", "split", tempDir("graft-maint-wire-plain"), None))
      IcebergWriter.append(spark, fact,
        Seq(("d", 11L)).toDF("k", "v"), None, 2500L)
      val s2 = {
        val r = ServingClient.doAction(srv.boundPort, "mv_maintain")
        assert(r.isOk, r.status)
        r.rows.map(row => row.head.toString -> row).toMap
      }
      val headS = IcebergMeta.load(fact).currentSnapshot.get.id
      assert(s2(mhRec.storeName)(1).toString === "minhash",
        s2(mhRec.storeName))
      assert(s2(mhRec.storeName)(2) == true &&
        s2(mhRec.storeName)(3) === headS, s2(mhRec.storeName))
      assert(s2("wire_plain")(5).toString.contains("no source lineage"),
        s2("wire_plain"))
      // mv_refresh now answers JOIN views by registered name too
      IcebergWriter.append(spark, fact,
        Seq(("b", 1L)).toDF("k", "v"), None, 3000L)
      val head3 = IcebergMeta.load(fact).currentSnapshot.get.id
      val jr = ServingClient.doAction(
        srv.boundPort, "mv_refresh", join.mvName)
      assert(jr.isOk, jr.status)
      assert(jr.rows.head.head.toString === join.mvName)
      assert(jr.rows.head(1) === head3 && jr.rows.head(2) === 0L, jr.rows)
      // already current: null applied cursors
      val noop = ServingClient.doAction(
        srv.boundPort, "mv_refresh", join.mvName)
      assert(noop.isOk && noop.rows.head(1) == null &&
        noop.rows.head(2) == null, noop.rows)
      // refusal: a hand-declared join def never refreshes
      MvCatalog.registerJoin(graft.plans.JoinMvDef(
        name = "hand_join", factPath = fact, dimPath = dimP,
        joinKeys = Seq(("k", "dk")), mvPath = joinRoot,
        mvSchema = new org.apache.spark.sql.types.StructType()))
      assert(ServingClient.doAction(srv.boundPort, "mv_refresh",
        "hand_join").status.startsWith("ERR INVALID_ARGUMENT"))
    } finally {
      MvCatalog.unregister(fact)
      MvCatalog.unregisterJoin(fact, dimP)
      graft.operators.StoreCatalog.unregister("wire_plain")
      graft.operators.StoreCatalog.unregister(
        MvAdvisor.DedupIndexRecommendation(fact, "k", 1).storeName)
    }
  }

  test("DO_ACTION mv_maintain / catalog_save back off over the wire while another maintainer holds the configured lease") {
    import graft.operators.MaintenanceLease
    val leaseDir = tempDir("graft-wire-lease")
    val file = tempDir("graft-wire-lease-cat") + "/catalog.json"
    try withServer { srv =>
      spark.conf.set(MaintenanceLease.ConfKey, leaseDir)
      val held = MaintenanceLease.acquire(spark, leaseDir)
      try {
        // a second maintainer's sweep/save over the wire: clean ERR with
        // the back-off message, never an interleaved walk
        val sweep = ServingClient.doAction(srv.boundPort, "mv_maintain")
        assert(sweep.status.startsWith("ERR INTERNAL") &&
          sweep.status.contains("backed off"), sweep.status)
        val save = ServingClient.doAction(
          srv.boundPort, "catalog_save", file)
        assert(save.status.startsWith("ERR") &&
          save.status.contains("backed off"), save.status)
      } finally MaintenanceLease.release(held)
      // lease freed: both verbs proceed
      assert(ServingClient.doAction(srv.boundPort, "mv_maintain").isOk)
      assert(ServingClient.doAction(
        srv.boundPort, "catalog_save", file).isOk)
    } finally spark.conf.unset(MaintenanceLease.ConfKey)
  }

  test("DO_ACTION mv_maintain autosaves the registry after a catalog_load: the saved file carries the post-sweep cursors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.StoreCatalog
    import graft.plans.{CatalogPersistence, MvAdvisor, MvCatalog}
    import graft.sources.{IcebergMeta, IcebergWriter}
    val root = tempDir("graft-wire-autosave")
    val tbl = s"$root/docs_ice"
    val file = s"$root/catalog.json"
    val docs = spark.read
      .parquet(SparkTestBase.Sf0001 + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    IcebergWriter.append(spark, tbl, docs.filter($"doc_id" < 150),
      None, 1000L, formatVersion = 2)
    val rec = MvAdvisor.DedupIndexRecommendation(tbl, "text", 1)
    try withServer { srv =>
      rec.materialize(spark, s"$root/index"): Unit
      CatalogPersistence.save(file)
      // no load yet: the sweep does NOT autosave (no autosave row)
      val s0 = ServingClient.doAction(srv.boundPort, "mv_maintain")
      assert(s0.isOk &&
        !s0.rows.exists(_.head.toString == "__catalog_autosave"), s0.rows)
      // restart + churn, then load over the wire — arming the autosave
      MvCatalog.clear(); StoreCatalog.clear()
      IcebergWriter.append(spark, tbl,
        docs.filter($"doc_id" >= 150 && $"doc_id" < 200), None, 2000L)
      assert(ServingClient.doAction(
        srv.boundPort, "catalog_load", file).isOk)
      val head = IcebergMeta.load(tbl).currentSnapshot.get.id
      val s1 = ServingClient.doAction(srv.boundPort, "mv_maintain")
      assert(s1.isOk, s1.status)
      val auto = s1.rows.find(_.head.toString == "__catalog_autosave")
        .getOrElse(fail(s"no autosave row: ${s1.rows}"))
      assert(auto(5).toString.startsWith("saved: "), auto)
      // the FILE now carries the post-sweep cursor: a fresh reload is
      // already current — the crash window between sweep and save is gone
      MvCatalog.clear(); StoreCatalog.clear()
      assert(CatalogPersistence.load(file).forall(_.loaded))
      assert(StoreCatalog.find(rec.storeName).get
        .source.get.watermark === head,
        "autosaved file must carry the swept watermark")
      assert(!MvAdvisor.maintainAll(spark)
        .find(_.name == rec.storeName).get.stale)
    } finally { MvCatalog.clear(); StoreCatalog.clear() }
  }

  test("DO_ACTION store_describe reports freshness for a registered store: fresh -> churn -> stale -> sweep -> fresh") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.plans.MvAdvisor
    import graft.sources.{IcebergMeta, IcebergWriter}
    val tbl = tempDir("graft-sd-fresh") + "/docs_ice"
    val root = tempDir("graft-sd-fresh-idx") + "/index"
    val docs = spark.read
      .parquet(SparkTestBase.Sf0001 + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    IcebergWriter.append(spark, tbl, docs.filter($"doc_id" < 150),
      None, 1000L, formatVersion = 2)
    val rec = MvAdvisor.DedupIndexRecommendation(tbl, "text", 1)
    try withServer { srv =>
      rec.materialize(spark, root): Unit
      def gauge() = {
        val r = ServingClient.doAction(srv.boundPort, "store_describe",
          s"minhash $root")
        assert(r.isOk, r.status)
        val row = r.rows.head
        // (…, tombstones@5, registered@6, watermark@7, head@8, fresh@9)
        (row(6), row(7), row(8), row(9))
      }
      // just built: fresh, cursor at head
      val wm0 = IcebergMeta.load(tbl).currentSnapshot.get.id
      val g0 = gauge()
      assert(g0._1.toString === rec.storeName, g0)
      assert(g0._2 === wm0 && g0._3 === wm0 && g0._4 === true, g0)
      // churn the base: the gauge flips stale WITHOUT any refresh work
      IcebergWriter.append(spark, tbl,
        docs.filter($"doc_id" >= 150 && $"doc_id" < 200), None, 2000L)
      val head1 = IcebergMeta.load(tbl).currentSnapshot.get.id
      val g1 = gauge()
      assert(g1._2 === wm0 && g1._3 === head1 && g1._4 === false,
        s"churned store must gauge stale: $g1")
      // one wire sweep brings it current; the gauge flips back fresh
      assert(ServingClient.doAction(srv.boundPort, "mv_maintain").isOk)
      val g2 = gauge()
      assert(g2._2 === head1 && g2._3 === head1 && g2._4 === true, g2)
      // an UNREGISTERED root still gauges (pressure only, no freshness)
      val other = tempDir("graft-sd-unreg") + "/index"
      graft.operators.MinHashIndex.materialize(
        docs.filter($"doc_id" < 50), other): Unit
      val ru = ServingClient.doAction(srv.boundPort, "store_describe",
        s"minhash $other")
      assert(ru.isOk && ru.rows.head(6) == null && ru.rows.head(9) == null,
        ru.rows)
    } finally graft.operators.StoreCatalog.unregister(rec.storeName)
  }

  test("DO_ACTION catalog_save/catalog_load: the registry snapshot round-trips over the wire") {
    import graft.operators.{StoreCatalog, StoreDef}
    val root = tempDir("graft-wire-catalog")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/store")): Unit
    val file = s"$root/catalog.json"
    val d = StoreDef("wire_cat_store", "split", s"$root/store", None)
    try withServer { srv =>
      StoreCatalog.register(d)
      val saved = ServingClient.doAction(srv.boundPort, "catalog_save", file)
      assert(saved.isOk, saved.status)
      assert(saved.rows.head(2).toString.toInt >= 1, saved.rows)
      StoreCatalog.unregister(d.name)
      assert(StoreCatalog.find(d.name).isEmpty)
      val loaded = ServingClient.doAction(srv.boundPort, "catalog_load", file)
      assert(loaded.isOk, loaded.status)
      val row = loaded.rows.find(_.head.toString == d.name).getOrElse(
        fail(s"no row for ${d.name}: ${loaded.rows}"))
      assert(row(2) == true, row)
      assert(StoreCatalog.find(d.name).contains(d),
        "wire reload must re-register the def")
      // the autopilot rides the same registry: one row for our store
      // (an empty dir is no split store — the gauge failure comes back
      // as the row's skip reason, never a dead connection); a
      // non-integer threshold refuses on the status line
      val ap = ServingClient.doAction(srv.boundPort, "store_autopilot")
      assert(ap.isOk, ap.status)
      val apRow = ap.rows.find(_.head.toString == d.name).getOrElse(
        fail(s"no autopilot row for ${d.name}: ${ap.rows}"))
      assert(apRow(3) == false &&
        apRow(5).toString.startsWith("error: "), apRow)
      assert(ServingClient.doAction(srv.boundPort, "store_autopilot",
        "soon").status.startsWith("ERR INVALID_ARGUMENT"))
      // refusals stay on the status line, never a broken stream
      assert(ServingClient.doAction(srv.boundPort, "catalog_load",
        s"$root/absent.json").status.startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.doAction(srv.boundPort, "catalog_save").status
        .startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.doAction(srv.boundPort, "catalog_load").status
        .startsWith("ERR INVALID_ARGUMENT"))
    } finally StoreCatalog.unregister(d.name)
  }

  test("DO_ACTION store_compact + table_maintain: store maintenance over the wire; refusals before any stream") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.{IvfStore, SplitStore}
    import graft.sources.IcebergWriter
    // a small split store with two ingest segments
    val splitRoot = tempDir("graft-sc-split") + "/store"
    def sdocs(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").as("doc_id"),
      org.apache.spark.sql.functions.concat_ws(" ",
        (0 until 8).map(i => org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit(s"w$i-"),
          col("id") * 17 + i)): _*).as("text"))
    val store = SplitStore.build(sdocs(0, 300), splitRoot)
    SplitStore.ingest(spark, store, sdocs(300, 350), token = "a1"): Unit
    SplitStore.ingest(spark, store, sdocs(350, 400), token = "a2"): Unit
    val beforeRows = SplitStore.assignments(spark, store).count()
    // a small IVF store with one ingest segment
    val ivfRoot = tempDir("graft-sc-ivf") + "/store"
    def vecs(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, Seq(i.toFloat, (i % 7).toFloat)))
      .toDF("vec_id", "embedding")
    IvfStore.create(vecs(0, 200), "embedding", ivfRoot, nCells = 2): Unit
    IvfStore.ingest(spark, ivfRoot, vecs(200, 260)): Unit
    // an Iceberg table with delete pressure (seed via parquet so the
    // table schema is NULLABLE like the upsert batch's)
    val tbl = tempDir("graft-sc-ice") + "/table"
    val seed = tempDir("graft-sc-ice-seed") + "/seed.parquet"
    spark.range(1000).select(col("id"),
      org.apache.spark.sql.functions.lit("x").as("v"))
      .write.mode("overwrite").parquet(seed)
    IcebergWriter.append(spark, tbl, spark.read.parquet(seed),
      None, 1000L, formatVersion = 2)
    IcebergWriter.upsertRows(spark, tbl,
      Seq((5L, "y"), (6L, "y")).toDF("id", "v"), "id", 2000L)
    withServer { srv =>
      // the pressure gauge reads the history compaction then folds:
      // base + two ingests = 3 live split segments; the split store's
      // embedded minhash index carries base + two folds = 3 segments
      val sd0 = ServingClient.doAction(srv.boundPort, "store_describe",
        s"split $splitRoot")
      assert(sd0.isOk && sd0.rows.head(3) === 3, sd0.rows)
      val sdm = ServingClient.doAction(srv.boundPort, "store_describe",
        s"minhash $splitRoot/index")
      assert(sdm.isOk && sdm.rows.head(2) === 1L &&
        sdm.rows.head(3) === 3, sdm.rows)
      val sc = ServingClient.doAction(srv.boundPort, "store_compact",
        s"split $splitRoot 2")
      assert(sc.isOk, sc.status)
      assert(sc.rows.head(2).toString === "segments=1", sc.rows)
      assert(SplitStore.assignments(spark, store).count() === beforeRows,
        "compaction must not change one assignment row")
      val iv = ServingClient.doAction(srv.boundPort, "store_compact",
        s"ivf $ivfRoot")
      assert(iv.isOk, iv.status)
      assert(iv.rows.head(2).toString.contains("segments=1"), iv.rows)
      // the compacted IVF store still probes
      assert(IvfStore.probe(spark, ivfRoot, Array(1.0f, 1.0f), k = 3,
        nProbe = 8).count() === 3)
      // post-compaction pressure reads 1 for both kinds; ivf detail
      // carries the live-row/tombstone/leaf gauge
      assert(ServingClient.doAction(srv.boundPort, "store_describe",
        s"split $splitRoot").rows.head(3) === 1)
      val sdi = ServingClient.doAction(srv.boundPort, "store_describe",
        s"ivf $ivfRoot")
      assert(sdi.isOk && sdi.rows.head(3) === 1 &&
        sdi.rows.head(4).toString.contains("rows=260"), sdi.rows)
      assert(ServingClient.doAction(srv.boundPort, "store_describe",
        s"bogus $splitRoot").status.startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.doAction(srv.boundPort, "store_describe")
        .status.startsWith("ERR INVALID_ARGUMENT"))
      val tm = ServingClient.doAction(srv.boundPort, "table_maintain",
        tbl)
      assert(tm.isOk, tm.status)
      assert(tm.rows.head.head.toString.toInt >= 1,
        s"upsert must have left delete pressure: ${tm.rows}")
      // refusals land BEFORE any stream
      assert(ServingClient.doAction(srv.boundPort, "store_compact",
        s"bogus $splitRoot").status.startsWith("ERR INVALID_ARGUMENT"))
      // a root of the WRONG store kind refuses instead of no-opping
      assert(ServingClient.doAction(srv.boundPort, "store_compact",
        s"split $ivfRoot").status.startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.doAction(srv.boundPort, "store_compact")
        .status.startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.doAction(srv.boundPort, "table_maintain",
        tempDir("graft-sc-nope")).status
        .startsWith("ERR INVALID_ARGUMENT"))
    }
  }

  test("DO_ACTION stream_view_describe: watermark + source head + fresh verdict; staleness after an unapplied commit; refusals") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.{IcebergMeta, IcebergWriter}
    val src = tempDir("graft-svd-src") + "/table"
    val view = tempDir("graft-svd-view") + "/table"
    IcebergWriter.append(spark, src,
      (0L until 8L).map(i => (i, i * 10L)).toDF("id", "v"),
      None, 1000L, formatVersion = 2)
    assert(graft.streaming.MaterializedAgg.refreshStep(
      spark, view, src, col("id") % 2, col("v"), 2000L).isDefined)
    withServer { srv =>
      def describe(extra: String = "") =
        ServingClient.doAction(srv.boundPort, "stream_view_describe",
          s"$view $src$extra")
      val r1 = describe()
      assert(r1.isOk, r1.status)
      assert(r1.rows.length === 1)
      // (view_path, source_path, wm_col, watermark, source_snapshot, fresh)
      val head = IcebergMeta.load(src).currentSnapshot.get.id
      assert(r1.rows.head(3).toString.toLong === head)
      assert(r1.rows.head(5).toString.toBoolean,
        s"just-refreshed view must be fresh: ${r1.rows.head}")
      // a source commit the view has not applied makes it STALE
      IcebergWriter.upsertRows(spark, src, Seq((99L, 990L)).toDF("id", "v"),
        "id", 3000L)
      val r2 = describe()
      assert(r2.isOk && !r2.rows.head(5).toString.toBoolean,
        s"unapplied source commit must read stale: ${r2.rows}")
      // and a refresh step restores freshness
      assert(graft.streaming.MaterializedAgg.refreshStep(
        spark, view, src, col("id") % 2, col("v"), 4000L).isDefined)
      assert(describe().rows.head(5).toString.toBoolean)
      // refusals happen BEFORE the OK status: bad wm_col, missing args,
      // nonexistent view
      assert(describe(" zz").status.startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.doAction(srv.boundPort, "stream_view_describe",
        view).status.startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.doAction(srv.boundPort, "stream_view_describe",
        s"${tempDir("graft-svd-none")}/nope $src")
        .status.startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.doAction(srv.boundPort, "stream_view_describe")
        .status.startsWith("ERR INVALID_ARGUMENT"))
    }
  }

  test("DO_ACTION ann_probe: serves top-k from a stored IVF index; argument and store errors refuse before OK") {
    import spark.implicits._
    val root = tempDir("graft-annserve") + "/store"
    val vecs = (0L until 60L).map { i =>
      val base = if (i % 2 == 0) 6f else -6f
      (i, Array(base + (i % 5) * 0.1f, base, 0.5f), (i % 2).toInt)
    }.toDF("vec_id", "embedding", "label")
    graft.operators.IvfStore.create(vecs, "embedding", root,
      nCells = 2, cellCap = 500, splitK = 2, seed = 7L)
    withServer { srv =>
      val r = ServingClient.doAction(srv.boundPort, "ann_probe",
        s"$root 5 1 6.1,6.0,0.5")
      assert(r.isOk, r.status)
      assert(r.rows.length === 5)
      // only the even (positive-cluster) side can reach the probed cell
      assert(r.rows.forall(_(1).toString.toLong % 2 == 0),
        s"probe leaked the far cluster: ${r.rows}")
      // refusals happen BEFORE the OK status
      assert(ServingClient.doAction(srv.boundPort, "ann_probe").status
        .startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.doAction(srv.boundPort, "ann_probe",
        s"$root 5 1").status.startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.doAction(srv.boundPort, "ann_probe",
        s"$root 0 1 1.0").status.startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.doAction(srv.boundPort, "ann_probe",
        s"${tempDir("graft-annserve-none")} 5 1 1.0,2.0")
        .status.startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.doAction(srv.boundPort, "ann_probe",
        s"$root 5 1 not,a,vector").status.startsWith("ERR INVALID_ARGUMENT"))
    }
  }

  test("HANDSHAKE: open server banners; token server gates every verb") {
    withServer { srv =>
      val r = ServingClient.handshake(srv.boundPort)
      assert(r.status === "OK graft-serving 1", r.status)
    }
    val gated = new ServingServer(session, authToken = Some("s3cret")).start()
    try {
      // bare request: refused before any SQL runs
      assert(ServingClient.doGet(gated.boundPort, "SELECT 1").status
        === "ERR UNAUTHENTICATED handshake required")
      // wrong token
      assert(ServingClient.handshake(gated.boundPort, "wrong").status
        === "ERR UNAUTHENTICATED invalid token")
      // right token, bare handshake: banner
      assert(ServingClient.handshake(gated.boundPort, "s3cret").status
        === "OK graft-serving 1")
      // handshake-then-request on one connection: the real call works
      val ok = ServingClient.request(
        gated.boundPort, "DO_GET", "SELECT 7 AS x", auth = Some("s3cret"))
      assert(ok.isOk && ok.rows === Seq(Seq(7)), ok.status)
    } finally gated.close()
  }

  test("runtime failure mid-stream aborts the connection, never corrupts the stream") {
    withServer { srv =>
      // planning succeeds, execution throws (raise_error is not foldable):
      // the client must observe a broken/truncated Arrow stream — not a
      // clean OK with silently missing rows, and not text spliced into IPC
      val thrown = intercept[Exception] {
        val r = ServingClient.doGet(
          srv.boundPort,
          "SELECT raise_error('mid-stream boom') AS x FROM range(10)"
        )
        // if the reader happened to end cleanly, it must not look like success
        assert(!r.isOk || r.rows.isEmpty, s"got ${r.rows.size} rows from a failing query")
        throw new IllegalStateException("stream ended cleanly (acceptable only if empty)")
      }
      assert(thrown != null)
    }
  }

  test("empty SQL and unknown verbs are invalid arguments; bad SQL is INTERNAL") {
    withServer { srv =>
      assert(ServingClient.request(srv.boundPort, "DO_GET").status
        .startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.request(srv.boundPort, "GET_FLIGHT_INFO").status
        .startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.request(srv.boundPort, "TELEPORT x").status
        .startsWith("ERR INVALID_ARGUMENT"))
      assert(ServingClient.doGet(srv.boundPort, "SELECT FROM WHERE").status
        .startsWith("ERR INTERNAL"))
    }
  }
}
