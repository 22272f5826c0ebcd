package graft

import graft.queries.Registry

/** Plan-shape regressions: the properties that make these queries scale
  * are in the PLAN, not the output — pin them so a refactor that silently
  * loses pushdown or broadcasts a fact table fails CI, not the cluster.
  */
class PlanSpec extends SparkTestBase {

  private def executed(name: String): String =
    Registry.byName(name).fn(spark, SparkTestBase.Sf0001)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  test("q6 filters reach the parquet scan") {
    val plan = executed("q6_filter_agg")
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") || plan.contains("GreaterThan(l_shipdate"),
      "shipdate range not pushed:\n" + plan.take(2000))
  }

  test("top-k plans TakeOrderedAndProject, not global sort") {
    val plan = executed("q_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q4 EXISTS plans a semi join; q14 date filter reaches the scan") {
    val q4 = executed("q4_priority_count")
    assert(q4.contains("LeftSemi"), "EXISTS did not become a semi join:\n" + q4.take(2000))
    val q14 = executed("q14_promo_share")
    assert(q14.contains("GreaterThanOrEqual(l_shipdate"),
      "shipdate range not pushed to the lineitem scan:\n" + q14.take(3000))
  }

  test("LshJoinRewrite fires on the hinted cosine join (and only on hinted ones)") {
    val lsh = Registry.byName("q_dedup_embedding_lsh")
      .fn(spark, SparkTestBase.Sf0001).queryExecution.optimizedPlan.toString
    assert(lsh.contains("__lsh_band_digest"),
      "rewrite did not fire — no band digest in plan:\n" + lsh.take(3000))
    assert(lsh.contains("Generate explode"),
      "rewrite did not explode band digests:\n" + lsh.take(3000))

    val baseline = Registry.byName("q_dedup_embedding")
      .fn(spark, SparkTestBase.Sf0001).queryExecution.optimizedPlan.toString
    assert(!baseline.contains("__lsh_band_digest"),
      "baseline query must NOT be rewritten:\n" + baseline.take(3000))
  }

  test("LSH-rewritten join returns exactly the plain join's rows") {
    val plain = Registry.byName("q_dedup_embedding")
      .fn(spark, SparkTestBase.Sf0001).collect().map(_.toString).sorted
    val rewritten = Registry.byName("q_dedup_embedding_lsh")
      .fn(spark, SparkTestBase.Sf0001).collect().map(_.toString).sorted
    assert(rewritten.length === plain.length,
      s"rewrite changed row count: ${rewritten.length} vs ${plain.length}")
    assert(rewritten.toSeq === plain.toSeq)
  }

  test("q21 plans EXISTS as a semi join and NOT EXISTS as an anti join") {
    val plan = executed("q21_waiting_supplier")
    assert(plan.contains("LeftSemi"), "EXISTS lost its semi join:\n" + plan.take(2000))
    assert(plan.contains("LeftAnti"), "NOT EXISTS lost its anti join:\n" + plan.take(2000))
  }

  test("q10 pushes the quarter range and returnflag selection to the scans") {
    val plan = executed("q10_returned_items")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      "orderdate range not pushed:\n" + plan.take(3000))
    assert(plan.contains("EqualTo(l_returnflag,R)"),
      "returnflag not pushed:\n" + plan.take(3000))
  }

  test("bucketed fact-fact join plans with NO shuffle exchange on either side") {
    import org.apache.spark.sql.functions.col
    // broadcast off so the assert pins the bucketing, not a size decision
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val o = graft.sources.BucketedTables
      .bucketedCopy(s2, SparkTestBase.Sf0001, "orders", "o_orderkey", 8)
    val l = graft.sources.BucketedTables
      .bucketedCopy(s2, SparkTestBase.Sf0001, "lineitem", "l_orderkey", 8)
    val j = s2.table(o).join(s2.table(l), col("o_orderkey") === col("l_orderkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), "expected a sort-merge join:\n" + plan.take(3000))
    assert(!plan.contains("Exchange"),
      "bucketed join must not shuffle:\n" + plan.take(3000))
  }

  test("star joins only HINT broadcast on true dimensions") {
    // q3 hints only filtered customer; q5 only nation+region. The hint
    // count in the analyzed plan is the contract — Spark may still choose
    // broadcast for other sides from SIZE stats, which is fine and
    // size-adaptive, unlike a hardcoded hint.
    def hintCount(name: String): Int =
      "(?i)hint".r.findAllIn(
        Registry.byName(name).fn(spark, SparkTestBase.Sf0001)
          .queryExecution.analyzed.toString
      ).length
    assert(hintCount("q3_join_agg") <= 2, "q3 grew broadcast hints")
    assert(hintCount("q5_join_multi") <= 4, "q5 grew broadcast hints")
  }

  test("hybrid search plans zero windows — ranks come from bounded top-k") {
    val plan = executed("q_hybrid_search")
    // operator names are capitalized in formatted explain; the lowercase
    // 'window' BM25 query term can't false-positive this
    assert(!"""\bWindow\b""".r.findFirstIn(plan).isDefined,
      "global window crept back into hybrid search:\n" + plan.take(3000))
    // ≥3 pins the two per-modality top-K cuts as well as the final
    // top-10 — a single match could be satisfied by the final
    // .orderBy(rrf).limit(10) alone.
    val cuts = "TakeOrderedAndProject".r.findAllIn(plan).length
    assert(cuts >= 3,
      s"expected >=3 TakeOrderedAndProject (2 modality top-Ks + final top-10), got $cuts:\n" +
        plan.take(3000))
  }

  test("decontamination broadcasts the benchmark grams and packs windows by shard") {
    val decon = executed("q_decontaminate")
    assert(decon.contains("BroadcastHashJoin"),
      "benchmark gram set must broadcast, never shuffle the corpus:\n" + decon.take(3000))
    assert(!decon.contains("SortMergeJoin") && !decon.contains("CartesianProduct"),
      "corpus-sized join crept into decontamination:\n" + decon.take(3000))
    // packing must never run a one-partition global window: the Window's
    // partition spec (formatted explain detail section) carries the shard
    val pack = executed("q_pack_sequences")
    assert("""windowspecdefinition\(shard""".r.findFirstIn(pack).isDefined,
      "packing window is not shard-partitioned:\n" + pack.take(3000))
  }

  test("iceberg MoR reads apply deletes as broadcast anti-joins, never sort-merge") {
    // the delete files are KB-scale relative to data: their subtraction
    // must broadcast onto the scan, not shuffle the fact side — the
    // property that keeps a 100-TB MoR read one pass over the data
    val plan = executed("q_iceberg_eqdelete") // pos + eq deletes both live
    assert(plan.contains("LeftAnti"),
      "delete application lost its anti-join:\n" + plan.take(3000))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "delete side must broadcast:\n" + plan.take(3000))
    assert(!plan.contains("SortMergeJoin"),
      "fact-side shuffle crept into the MoR read:\n" + plan.take(3000))
  }

  test("decontamination past the broadcast bound falls back to a shuffle hash join, same rows") {
    import org.apache.spark.sql.functions.col
    val docs = graft.queries.QueryUtil.t(spark, SparkTestBase.Sf0001, "documents")
    val isBench = col("doc_id") % 20 === 0
    // forced over-broadcast (limit 0): the same gram pipeline must plan a
    // ShuffledHashJoin — bench side the build — with NO broadcast of it
    val shuf = graft.queries.TextQueries
      .contaminationCounts(docs, isBench, maxBroadcastGramRows = 0)
    val plan = shuf.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      "over-broadcast benchmark must shuffle-hash-join on the gram:\n" +
        plan.take(3000))
    // and the two strategies are interchangeable on rows
    val broad = graft.queries.TextQueries.contaminationCounts(docs, isBench)
    assert(shuf.collect().toSeq === broad.collect().toSeq,
      "shuffle fallback changed the decontamination result")
    graft.engine.PersistScope.releaseAll()
  }

  test("incremental dedup broadcasts the increment's bands at the candidate join") {
    val plan = executed("q_dedup_incremental")
    assert(plan.contains("BroadcastHashJoin"),
      "the new-batch band side must broadcast (zero corpus shuffle at ingest):\n" +
        plan.take(3000))
    assert(!plan.contains("CartesianProduct"))
  }

  test("column pruning: dedup reads only doc_id and text") {
    val plan = executed("q_dedup_minhash")
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(reads.nonEmpty)
    assert(reads.forall(s => s.split(",").length <= 2), s"over-wide scan: $reads")
  }

  test("q_dpp_join injects dynamic partition pruning and reads only the 3 quarter months") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // AQE wraps finished stages in leaf QueryStageExec nodes that plan
    // .collect can't descend into; DPP itself is AQE-independent, so pin
    // it on a plain plan where the fact scan is reachable.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val df = Registry.byName("q_dpp_join").fn(s2, SparkTestBase.Sf0001)
    df.collect() // metrics (partitions actually read) exist only post-run

    val factScans = df.queryExecution.executedPlan
      .collect { case s: FileSourceScanExec => s }
      .filter(_.partitionFilters.nonEmpty)
    assert(factScans.nonEmpty, "no partitioned fact scan in the plan")
    val scan = factScans.head
    // plan-time pin: the pruning expression was INJECTED (not a static IN)
    assert(
      scan.partitionFilters.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])),
      "fact scan carries no DynamicPruningExpression:\n" + scan.toString.take(2000))
    // runtime pin: of the fixture's 80 month directories, exactly the
    // three 1995-Q1 months were read
    assert(scan.metrics.contains("numPartitions"), scan.metrics.keys.toSeq.toString)
    val read = scan.metrics("numPartitions").value
    assert(read === 3, s"expected 3 partitions read after dynamic pruning, got $read")
  }

  test("q_dpp_subquery prunes via a pruning SUBQUERY with no broadcast to reuse") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val df = Registry.byName("q_dpp_subquery").fn(s2, SparkTestBase.Sf0001)
    df.collect()

    // the dim join is a SortMergeJoin (merge hint honored): there is no
    // broadcast result for DPP to piggyback on — this IS the second shape
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("SortMergeJoin"),
      "dim join must be merge, not broadcast:\n" + formatted.take(3000))

    val factScans = df.queryExecution.executedPlan
      .collect { case s: FileSourceScanExec => s }
      .filter(_.partitionFilters.nonEmpty)
    assert(factScans.nonEmpty, "no partitioned fact scan in the plan")
    val scan = factScans.head
    assert(
      scan.partitionFilters.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])),
      "fact scan carries no DynamicPruningExpression:\n" + scan.toString.take(2000))
    // the pruning filter runs as its OWN subquery, not a broadcast reuse
    assert(!scan.toString.contains("SubqueryBroadcast"),
      "expected a plain pruning subquery, found broadcast reuse:\n" +
        scan.toString.take(2000))
    val read = scan.metrics("numPartitions").value
    assert(read === 3, s"expected 3 partitions read after subquery pruning, got $read")
  }

  test("perplexity broadcasts the unigram model; semantic dedup joins on cell, never cartesian") {
    val ppl = executed("q_text_perplexity")
    assert(ppl.contains("BroadcastHashJoin"),
      "unigram model not broadcast onto tf:\n" + ppl.take(3000))
    val sem = executed("q_dedup_semantic")
    assert(!sem.contains("CartesianProduct"),
      "semantic dedup degenerated to a cartesian product:\n" + sem.take(3000))
  }

  test("paragraph dedup's winner-election window never carries paragraph text") {
    // the election shuffles (h, doc_id, para_idx) digests only; the text
    // column re-enters downstream via the doc_id reassembly join. The
    // Window operator's required ordering names the digest columns — if
    // `para` ever appears in the Window's attribute list, someone routed
    // text through the shuffle.
    val plan = executed("q_dedup_paragraph")
    val windowLine = plan.linesIterator
      .find(l => l.contains("Window [") || l.contains("RunningWindowFunction") ||
        l.contains("Arguments: [row_number"))
      .orElse(plan.linesIterator.find(_.contains("row_number")))
      .getOrElse(fail("no window operator in the paragraph-dedup plan:\n" + plan.take(2000)))
    // "para#N" is the text attribute; "para_idx#N" does not match it
    assert(!windowLine.contains("para#"),
      "window operator references paragraph text:\n" + windowLine)
    assert(windowLine.contains("h#") || windowLine.contains("md5"),
      "window not keyed on the digest:\n" + windowLine)
  }

  test("boilerplate removal broadcasts the dictionary; document text never shuffles") {
    // AQE-disabled audit session: under AQE the executedPlan is the
    // unelaborated adaptive wrapper and every typed count reads zero
    val s2 = graft.plans.PlanInvariants.auditSession(spark)
    val shape = graft.plans.PlanInvariants.of(
      Registry.byName("q_text_boilerplate").fn(s2, SparkTestBase.Sf0001))
    // the dictionary joins back as a broadcast over ONE tiny collected
    // row — any shuffle-side join here means someone re-keyed the corpus
    assert(shape.broadcastExchanges + shape.broadcastNestedLoops >= 1,
      s"boilerplate dictionary not broadcast: $shape")
    assert(shape.cartesianProducts === 0, shape.toString)
    // exactly four digest/scalar-sized exchanges: count_distinct's two
    // agg phases ((h, doc_id) distinct then per-h count), the
    // dictionary's single-row collapse, and the output sort. Document
    // text re-keyed through a shuffle would add a fifth.
    assert(shape.shuffleExchanges <= 4,
      s"text side appears to shuffle: $shape")
  }

  test("DSIR broadcasts the bucket model and plans the top-k bounded") {
    val plan = executed("q_sample_dsir")
    assert(plan.contains("TakeOrderedAndProject"),
      "DSIR top-k degenerated to a global sort:\n" + plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"),
      "bucket log-ratio model not broadcast onto tf:\n" + plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("MV refresh reads the changelog window, never the current base files") {
    // snapshot 2 has 2 data files (bands 0-2, band 3); the refresh may
    // read those (MV fit) plus the changelog window's file set — but a
    // regression that recomputes the aggregate from the CURRENT live
    // state would pull in the s5 re-append file. Pin the refresh plan to
    // the delta join shape: exactly one full-outer join against the MV.
    val plan = executed("q_mv_incremental")
    assert(plan.contains("FullOuter"),
      "MV refresh lost its full-outer delta join:\n" + plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("runtime Bloom-filter join pruning injects might_contain on the fact side") {
    // The row-level sibling of DPP: a selective dim predicate builds a
    // bloom filter that prunes fact rows BEFORE the join's shuffle —
    // at 100 TB that is shuffle bytes saved in proportion to dim
    // selectivity. Injection preconditions worth pinning because they
    // are easy to silently lose: the join must NOT be broadcast and
    // must NOT carry a user join-strategy hint (InjectRuntimeFilter
    // pattern-matches the bare join), and the application side must
    // clear the scan-size threshold (lowered here — the sf fixture is
    // tiny; on the real cluster the 10GB default does the gating).
    import org.apache.spark.sql.functions._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val l = graft.queries.QueryUtil.t(s2, SparkTestBase.Sf0001, "lineitem")
    val o = graft.queries.QueryUtil.t(s2, SparkTestBase.Sf0001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
    val plan = j.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
      "runtime bloom filter not injected:\n" + plan.take(3000))
    // pruning is an optimization, never a semantic change
    val expected = graft.queries.QueryUtil.t(spark, SparkTestBase.Sf0001, "lineitem")
      .join(graft.queries.QueryUtil.t(spark, SparkTestBase.Sf0001, "orders")
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      .head().getDouble(1)
    assert(j.head().getDouble(1) === expected)
  }

  test("every registered query plans without error at sf0.001") {
    Registry.all.foreach { q =>
      val df = q.fn(spark, SparkTestBase.Sf0001)
      df.queryExecution.executedPlan // force planning
    }
  }
}
