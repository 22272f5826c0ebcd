package graft

/** GraftExtensions injects the native functions at session-build time, so
  * they exist in every derived session state — including a fresh
  * `newSession()`, which has NO temp functions (the dynamic
  * `Functions.register` path never touched it). That distinction is what
  * this spec pins.
  */
class ExtensionsSpec extends SparkTestBase {

  test("injected functions resolve in a fresh newSession() with no temp registrations") {
    val fresh = spark.newSession()
    val r = fresh
      .sql(
        "SELECT capitalize('abc') c, " +
          "cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) cs, " +
          "dot_product(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) dp, " +
          "rolling_fingerprint('abc', 0) fp, " +
          "max_token_freq(array('a', 'b', 'a')) mtf"
      )
      .head()
    assert(r.getString(0) === "ABC")
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getDouble(2) === 6.0)
    assert(r.getLong(3) === graft.functions.RollingFingerprint.compute("abc".getBytes("UTF-8"), 0))
    assert(r.getLong(4) === 2L)
  }

  test("DESCRIBE FUNCTION sees the injected function") {
    val desc = spark.sql("DESCRIBE FUNCTION cosine_sim").collect().map(_.getString(0)).mkString("\n")
    assert(desc.toLowerCase.contains("cosine_sim"))
  }
}
