package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.GraftSession

/** One shared local session for the whole test run (Spark startup is ~5s;
  * per-suite sessions would dominate the suite).
  */
object SparkTestBase {
  lazy val session: GraftSession = GraftSession.local(cores = 4, appName = "graft-test")
  lazy val spark: SparkSession = session.spark

  val Sf0001 = "/root/testdata/sf0.001"
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val session: GraftSession = SparkTestBase.session
  lazy val spark: SparkSession = SparkTestBase.spark

  def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
