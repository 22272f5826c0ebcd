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

  test("all four optimizer rules are injected; fresh sessions honor each gate") {
    // the rule set IS the extension contract: losing one in a refactor
    // would silently drop a rewrite capability from every session
    val ruleNames = spark.sessionState.optimizer.batches
      .flatMap(_.rules).map(_.ruleName).toSet
    Seq("LshJoinRewrite", "MvRewrite", "PreAggExpand", "EagerAggJoin")
      .foreach { r =>
        assert(ruleNames.exists(_.endsWith(r)), s"rule $r not injected")
      }
    // per-rule gates in a fresh derived session: the two opt-ins are off
    val fresh = spark.newSession()
    assert(fresh.conf
      .get("spark.graft.mv.rewrite.enabled", "false") === "false")
    assert(fresh.conf
      .get("spark.graft.optimizer.eagerAggJoin", "false") === "false")
    assert(fresh.conf
      .get("spark.graft.optimizer.preAggExpand", "true") === "true")
  }

  test("DESCRIBE FUNCTION sees the injected function") {
    val desc = spark.sql("DESCRIBE FUNCTION cosine_sim").collect().map(_.getString(0)).mkString("\n")
    assert(desc.toLowerCase.contains("cosine_sim"))
  }

  test("SQL dedup primitives equal their TextOps twins; non-literal arity refuses") {
    import org.apache.spark.sql.functions.col
    import graft.operators.TextOps
    val fresh = spark.newSession()
    import fresh.implicits._
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = fresh.sql(
      "SELECT minhash_signature(array_xxhash64(word_shingles(" +
        "split(lower(text), '\\\\s+'), 3)), 64) AS sig FROM ext_docs")
      .head.getSeq[Long](0)
    val viaOps = df.select(
      TextOps.minhashSignatureArray(TextOps.shingleHashes(
        TextOps.shingles(TextOps.tokens(col("text"))))).as("sig"))
      .head.getSeq[Long](0)
    assert(viaSql === viaOps, "SQL chain must be bit-identical to TextOps")
    // arity arguments shape codegen — they must be integer literals
    val err = intercept[Exception] {
      fresh.sql("SELECT word_shingles(split(text, ' '), doc_id) " +
        "FROM ext_docs").collect()
    }
    assert(err.getMessage.contains("integer literal"), err.getMessage)
  }
}
