package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.GraftSession

/** One shared local session for the whole test run (Spark startup is ~5s;
  * per-suite sessions would dominate the suite).
  */
object SparkTestBase {
  lazy val session: GraftSession = GraftSession.local(cores = 4, appName = "graft-test")
  lazy val spark: SparkSession = session.spark

  /** Driver-generated fixture root (TESTDATA.md), overridable so the
    * suite runs (or skips cleanly) where the parquet lives elsewhere.
    */
  val TestDataRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
  val Sf0001 = s"$TestDataRoot/sf0.001"
  val Sf001 = s"$TestDataRoot/sf0.01"

  def sfDirExists(dir: String): Boolean =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir))
}

abstract class SparkTestBase extends AnyFunSuite with BeforeAndAfterEach {
  lazy val session: GraftSession = SparkTestBase.session
  lazy val spark: SparkSession = SparkTestBase.spark

  // query builders register their persist() pins with PersistScope; drop
  // them between tests so repeated builder invocations in one suite don't
  // stack cached copies ("already cached" warnings)
  override protected def afterEach(): Unit = {
    graft.engine.PersistScope.releaseAll()
    super.afterEach()
  }

  def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
