package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, Upper}

import graft.functions.{ArrayXxHash64, CosineSimilarity, DotProduct, LshRewriteHint, MaxTokenFreq, MinHashSignature, RollingFingerprint, WordShingles}

/** SparkSessionExtensions entry point: injects graft's native functions
  * into every session built with
  * `spark.sql.extensions=graft.engine.GraftExtensions` (set by
  * GraftSession.local), making them first-class SQL functions — visible in
  * every derived session state (`spark.newSession()`), DESCRIBE FUNCTION,
  * and thrift/connect clients — rather than per-session temp functions.
  *
  * This is the supported seam for library-provided Catalyst expressions
  * (the analogue of the reference registering its UDF at engine
  * construction, crates/engine/src/lib.rs:39-44). The temp-function path in
  * graft.functions.Functions.register stays as the dynamic/runtime API for
  * sessions graft did not build.
  *
  * Three optimizer Rules are injected. The two that can change WHAT a
  * query reads each have their own opt-in so neither can alter queries
  * that never asked for it: plans.LshJoinRewrite (the
  * cosine-threshold-join -> banded-LSH-join rewrite; fires ONLY on
  * predicates wrapped in `lsh_rewrite_hint(...)`) and plans.MvRewrite
  * (the materialized-view rollup rewrite; fires ONLY on base tables with
  * a view registered in MvCatalog). plans.PreAggExpand (finest-grain
  * pre-aggregation below CUBE/ROLLUP/GROUPING SETS expansion) is a pure
  * algebraic optimization with a proven-exact output contract, so it
  * defaults on like a built-in Catalyst rule (kill switch:
  * `spark.graft.optimizer.preAggExpand=false`). No SparkStrategy: SURVEY.md
  * §4 found Catalyst's own rule families cover every rewrite the
  * reference performs or aspires to — the LSH rewrite is a graft-value
  * addition, not a parity need.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session => new graft.plans.LshJoinRewrite(session))
    // MV rollup rewrite: no-op until an MV is registered in MvCatalog —
    // the registration IS the per-view opt-in (see MvRewrite's contract)
    ext.injectOptimizerRule(session => new graft.plans.MvRewrite(session))
    // cube/rollup pre-aggregation: a pure algebraic optimization (exact
    // same rows, types, nullability — see PreAggExpand's gates), so like
    // Catalyst's own rules it defaults ON; harvested StatsCatalog NDVs
    // skip proven high-cardinality-grain workloads automatically (r19),
    // spark.graft.optimizer.preAggExpand=false stays the manual switch
    ext.injectOptimizerRule(session => new graft.plans.PreAggExpand(session))
    // eager aggregation (partial aggregate below an inner equi-join):
    // default `auto` (r19) — fires only when harvested StatsCatalog
    // statistics prove the fact grain materially smaller than the fact
    // AND the dim side is not broadcast-sized; "true" forces per
    // session, "false" disables. No statistics = no fire = zero cost.
    ext.injectOptimizerRule(session => new graft.plans.EagerAggJoin(session))
    // harvested-statistics hand-off to Spark's OWN planner (r20): runs
    // immediately before the Join Reorder batch, attaching row counts +
    // NDVs from StatsCatalog to analyzed path-backed relations so
    // CostBasedJoinReorder and plan-stats estimation see the same truth
    // graft's rules use. Inert until a table is analyzed AND the session
    // enables CBO (sizeInBytes stays the real file size, so non-CBO
    // plans are byte-identical); spark.graft.optimizer.relationStats=
    // false disables.
    ext.injectPreCBORule(session => new graft.plans.RelationStats(session))
    // wide-decimal SUM -> overflow-PROVEN unscaled-long SUM (r20): exact
    // by construction (same integer, same result type), fires only when
    // parquet footer min/max x row count proves the long sum cannot
    // overflow; spark.graft.optimizer.unscaledDecimalSum=false disables
    ext.injectOptimizerRule(session => new graft.plans.UnscaledDecimalSums(session))
    register(ext, "capitalize", "uppercases a string (reference semantics)",
      es => Upper(es.head))
    register(ext, "cosine_sim", "cosine similarity of two array<float> vectors",
      es => CosineSimilarity(es(0), es(1)))
    register(ext, "dot_product", "dot product of two array<float> vectors",
      es => DotProduct(es(0), es(1)))
    register(ext, "rolling_fingerprint",
      "Karp-Rabin rolling-hash fingerprint (window<=0: whole string)",
      es => RollingFingerprint(es(0), es(1)))
    register(ext, "lsh_rewrite_hint",
      "opt-in marker: rewrite this cosine-threshold join predicate via banded LSH",
      es => LshRewriteHint(es.head))
    register(ext, "max_token_freq",
      "maximum token frequency of an array<string>, one native pass",
      es => MaxTokenFreq(es.head))
    // the dedup primitive chain (operators.TextOps), SQL-visible so a
    // SQL-only client can express LSH dedup — and so the MV/index
    // advisor can harvest dedup workloads arriving over the wire
    register(ext, "word_shingles",
      "distinct word n-gram shingles of an array<string> token array " +
        "(optional 2nd arg: n, default 3)",
      es => { arity("word_shingles", es, min = 1, max = 2)
        WordShingles(es(0), litInt(es, 1, default = 3)) })
    register(ext, "array_xxhash64",
      "elementwise xxhash64 of an array<string>, one native pass",
      es => { arity("array_xxhash64", es, min = 1, max = 1)
        ArrayXxHash64(es.head) })
    register(ext, "minhash_signature",
      "MinHash signature of an array<long> of shingle hashes " +
        "(optional 2nd arg: k hashes, default 64)",
      es => { arity("minhash_signature", es, min = 1, max = 2)
        MinHashSignature(es(0), litInt(es, 1, default = 64)) })
  }

  /** Refuse wrong argument counts loudly — a surplus argument silently
    * dropped is a silently wrong result (e.g. a user passing
    * (tokens, n, k) expecting combined shingle+hash behavior).
    */
  private def arity(
      name: String, es: Seq[Expression], min: Int, max: Int): Unit =
    require(es.length >= min && es.length <= max,
      s"$name takes $min to $max arguments, got ${es.length}")

  /** Optional literal-int argument at position `i` — these expressions
    * take their arity as a constructor constant (it shapes codegen), so
    * a non-literal is a user error worth a clear message.
    */
  private def litInt(es: Seq[Expression], i: Int, default: Int): Int =
    if (es.length <= i) default
    else es(i) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"argument ${i + 1} must be an integer literal, got ${other.sql}")
    }

  private def register(
      ext: SparkSessionExtensions,
      name: String,
      usage: String,
      builder: Seq[Expression] => Expression
  ): Unit =
    ext.injectFunction(
      (
        new FunctionIdentifier(name),
        new ExpressionInfo(
          "graft", null, name, usage, "", "", "", "", "", "", "built-in"),
        builder
      )
    )
}
