package graft

import graft.engine.ConnectEndpoint
import graft.queries.Registry

/** End-to-end wire test of the Spark Connect endpoint: the service runs
  * inside this JVM; the CLIENT is the stock
  * `spark-connect-client-jvm_2.13` jar from the Spark distribution,
  * loaded in a CHILD-FIRST classloader so its own (shaded-gRPC) classes
  * are used rather than the server's — the same isolation a separate
  * client process would have, minus the process. Everything crosses a
  * real gRPC socket: session create, SQL over the shared catalog table,
  * SQL over the published global view.
  */
class ConnectEndpointSpec extends SparkTestBase {

  private val ClientJar =
    "/opt/spark/jars/connect-repl/spark-connect-client-jvm_2.13-4.1.2.jar"

  /** Child-first so the client jar's org.apache.spark classes win over
    * the server's; JDK + scala delegate to the parent (the fat client
    * jar does not carry scala-library).
    */
  private final class ChildFirst(url: java.net.URL, parent: ClassLoader)
      extends java.net.URLClassLoader(Array(url), parent) {
    override def loadClass(name: String, resolve: Boolean): Class[_] =
      getClassLoadingLock(name).synchronized {
        val seen = findLoadedClass(name)
        if (seen != null) seen
        else if (name.startsWith("java.") || name.startsWith("javax.") ||
          name.startsWith("jdk.") || name.startsWith("sun.") ||
          name.startsWith("scala."))
          super.loadClass(name, resolve)
        else
          try {
            val c = findClass(name)
            if (resolve) resolveClass(c)
            c
          } catch {
            case _: ClassNotFoundException => super.loadClass(name, resolve)
          }
      }
  }

  test("stock Connect client runs q1_agg over gRPC against the shared catalog") {
    assume(new java.io.File(ClientJar).isFile, s"client jar absent: $ClientJar")
    assume(SparkTestBase.sfDirExists(SparkTestBase.Sf0001))

    ConnectEndpoint.registerShared(
      spark, SparkTestBase.Sf0001, Seq("lineitem"),
      views = Map("q1_agg" -> Registry.byName("q1_agg").fn(spark, SparkTestBase.Sf0001)))
    val port = ConnectEndpoint.start(spark, 0)
    assert(port > 0)

    // local expectations BEFORE the classloader swap: server-side codegen
    // resolves classes through the thread's context classloader, and the
    // child-first loader must only ever see CLIENT work
    val localAgg = spark.sql(
      "SELECT l_returnflag, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
      .collect().map(_.toString).toSeq
    val localView = Registry.byName("q1_agg").fn(spark, SparkTestBase.Sf0001)
      .orderBy(org.apache.spark.sql.functions.col("l_returnflag"),
        org.apache.spark.sql.functions.col("l_linestatus"))
      .collect().map(_.toString).toSeq

    val loader = new ChildFirst(
      new java.io.File(ClientJar).toURI.toURL, getClass.getClassLoader)
    val prev = Thread.currentThread().getContextClassLoader
    Thread.currentThread().setContextClassLoader(loader)
    try {
      val module = loader.loadClass("org.apache.spark.sql.connect.SparkSession$")
      val sessions = module.getField("MODULE$").get(null)
      val builder = module.getMethod("builder").invoke(sessions)
      val withRemote = builder.getClass.getMethod("remote", classOf[String])
        .invoke(builder, s"sc://localhost:$port")
      val client = withRemote.getClass.getMethod("create").invoke(withRemote)
      try {
        def sqlRows(q: String): Seq[String] = {
          val ds = client.getClass.getMethod("sql", classOf[String])
            .invoke(client, q)
          ds.getClass.getMethod("collect").invoke(ds)
            .asInstanceOf[Array[AnyRef]].map(_.toString).toSeq
        }
        // the q1_agg shape over the SHARED CATALOG TABLE, remote vs local
        val remoteAgg = sqlRows(
          "SELECT l_returnflag, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty " +
            "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
        assert(remoteAgg.nonEmpty && remoteAgg === localAgg)

        // the PUBLISHED VIEW (engine-built DataFrame) through the wire
        val remoteView = sqlRows(
          "SELECT * FROM global_temp.q1_agg ORDER BY 1, 2")
        assert(remoteView.nonEmpty && remoteView === localView)
      } finally {
        try client.getClass.getMethod("close").invoke(client)
        catch { case _: Throwable => () }
      }
    } finally {
      Thread.currentThread().setContextClassLoader(prev)
      ConnectEndpoint.stop()
    }
  }
}
