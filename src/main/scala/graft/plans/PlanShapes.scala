package graft.plans

/** The pinned plan-shape bounds for every bench query and headline
  * family query — the single source of truth PlanAuditSpec enforces in
  * CI and `runMain graft.PlanAudit --shapes` prints for eyeball diffs.
  *
  * Bounds, not exact counts, where the optimizer has legitimate freedom
  * (a stats-driven broadcast appearing is fine; a new shuffle is not).
  * Universal invariants asserted for EVERY audited query regardless of
  * its row here: zero `CartesianProductExec`, and `buildJobs == 0`
  * unless the row grants an allowance (a build-time Spark job means a
  * driver-side collect runs while CONSTRUCTING the frame).
  */
final case class ShapeBounds(
    maxShuffles: Int,
    minBroadcastJoins: Int = 0,
    maxShuffleJoins: Int = 0, // sort-merge + shuffled-hash
    minPushedScans: Int = 0,
    maxBuildJobs: Int = 0,
    allowBnlj: Boolean = false,
    // floor on aggregate-fed joins — the eager-aggregation pin: the
    // grain pre-aggregate must keep feeding the join (r19)
    minAggFedJoins: Int = 0,
    // ceiling on file scans in the plan — the MV-family pin: an
    // incremental refresh that starts re-reading a table it is supposed
    // to avoid (a base rescan creeping into a delta path) adds a scan
    // before it adds anything else
    maxScans: Int = Int.MaxValue
)

object PlanShapes {

  /** Headline family queries audited beyond the bench set. */
  val headlineNames: Seq[String] = Seq(
    "q_decontaminate", "q_text_perplexity", "q_text_gopher",
    "q_dedup_incremental", "q_dedup_semantic", "q_dedup_paragraph",
    "q_hybrid_search", "q_pack_sequences", "q_dedup_embedding_lsh",
    "q_sim_topk_ivf", "q_sim_topk_lsh", "q_sample_temperature",
    "q_text_bm25", "q_dedup_exact", "q_dedup_simhash",
    "q_text_bpe_fertility",
    // the MV maintenance family (r14): their scale property IS a plan
    // shape — refresh cost must stay bounded by churn + view size, so a
    // scan creeping in is the regression that matters most
    "q_mv_incremental", "q_mv_minmax", "q_mv_join",
    "q_mv_distinct", "q_mv_approx_distinct",
    // r14 pipeline additions: span dedup's whole design is "text never
    // shuffles" (4 shuffles of digest/position rows, zero driver jobs)
    "q_dedup_spans", "q_pipeline_source_quality",
    // r18/r19 optimizer-rule queries: their scale property IS the plan —
    // the pre-aggregate below the Expand / the join must stay put, in
    // the broadcast regime, the gated shuffle regime, the bilateral
    // (dim-weighted) shape and the stats-armed auto shape
    "q_agg_cube_distinct", "q_join_eager_agg", "q_join_eager_agg_shuffle",
    "q_join_eager_agg_bilateral", "q_join_eager_agg_auto",
    // r20 optimizer-rule queries: the 2-level auto cascade (BOTH star
    // joins must stay fed by grain pre-aggregates) and the FILTERed
    // dim-aggregate shape
    "q_join_eager_agg_cascade", "q_join_eager_agg_filtered"
  )

  def headline(name: String): Boolean = headlineNames.contains(name)

  /** Queries whose fixtures (iceberg tables, stored MV parquet) build on
    * first touch: PlanAuditSpec warms these by building the frame once
    * before measuring, so the one-time fixture-materialization jobs do
    * not attribute to the audited build.
    */
  val warmFirst: Set[String] =
    Set("q_mv_incremental", "q_mv_minmax", "q_mv_join",
      "q_mv_distinct", "q_mv_approx_distinct",
      // r21: first build harvests exact dim-key uniqueness (memoized per
      // file set) for the UnscaledDecimalSums join proof
      "q3_join_agg", "q5_join_multi")

  /** Every way a measured shape violates its pinned bounds (plus the
    * universal no-cartesian invariant) — the single check PlanAuditSpec
    * enforces per query and the deliberate-regression test proves fires.
    */
  def violations(b: ShapeBounds, s: PlanShape): Seq[String] = Seq(
    (s.cartesianProducts == 0) ->
      s"cartesian product in the plan (${s.cartesianProducts})",
    (s.shuffleExchanges <= b.maxShuffles) ->
      s"shuffle exchanges ${s.shuffleExchanges} > pinned ${b.maxShuffles}",
    (s.broadcastHashJoins >= b.minBroadcastJoins) ->
      s"broadcast joins ${s.broadcastHashJoins} < pinned ${b.minBroadcastJoins} (a dim side stopped broadcasting)",
    (s.sortMergeJoins + s.shuffledHashJoins <= b.maxShuffleJoins) ->
      s"shuffle-side joins ${s.sortMergeJoins + s.shuffledHashJoins} > pinned ${b.maxShuffleJoins}",
    (s.scansWithPushedFilters >= b.minPushedScans) ->
      s"scans with pushed filters ${s.scansWithPushedFilters} < pinned ${b.minPushedScans}",
    (s.scans <= b.maxScans) ->
      s"file scans ${s.scans} > pinned ${b.maxScans} (an extra read crept in — e.g. a refresh rescanning its base)",
    (s.buildJobs <= b.maxBuildJobs) ->
      s"build ran ${s.buildJobs} driver-action jobs > allowed ${b.maxBuildJobs} (a collect crept into the build path)",
    (b.allowBnlj || s.broadcastNestedLoops == 0) ->
      s"broadcast nested loop join appeared (${s.broadcastNestedLoops}) where none is allowed",
    (s.aggFedJoins >= b.minAggFedJoins) ->
      s"aggregate-fed joins ${s.aggFedJoins} < pinned minimum ${b.minAggFedJoins} (the grain pre-aggregate left the join)"
  ).collect { case (false, msg) => msg }

  /** name -> pinned bounds, from the measured sf0.001 shapes (PlanAudit
    * --shapes) the round this gate landed; any drift is a deliberate
    * decision that edits this table, never an accident.
    *
    * Nonzero maxBuildJobs rows are the operators whose BUILD is an
    * action by design: the MinHash/SimHash pipelines materialize their
    * df-capped stop-shingle set (a bounded count), incremental dedup
    * loads the stored index manifest, decontamination measures the gram
    * count for its broadcast-vs-shuffle cutover, and the IVF/semantic/
    * hybrid family FIT KMeans centroids (an iterative bounded job loop —
    * the allowance covers the iteration cap, not "anything goes").
    */
  val bounds: Map[String, ShapeBounds] = Map(
    // bench set
    "q6_filter_agg" -> ShapeBounds(maxShuffles = 1, minPushedScans = 1),
    "q1_agg" -> ShapeBounds(maxShuffles = 2, minPushedScans = 1),
    // 3 = finest-grain pre-aggregate (PreAggExpand; its exchange moves
    // |grain| ~ 6 rows) + grouping-sets aggregate + final sort — the
    // r17 2-shuffle plan expanded ALL input rows 4x instead
    "q_agg_cube" -> ShapeBounds(maxShuffles = 3),
    // 4 = extended-grain pre-aggregate (distinct args join the grain) +
    // post-expand aggregate + the distinct-rewrite final + sort; the
    // expand replicates (flag, suppkey) pairs, never lineitem rows
    "q_agg_cube_distinct" -> ShapeBounds(maxShuffles = 4),
    // 4 = grain pre-aggregate (EagerAggJoin: the join's fact input is
    // the supplier-key grain, not lineitem) + distinct-pair aggregate +
    // final + sort; supplier broadcasts
    "q_join_eager_agg" -> ShapeBounds(maxShuffles = 4, minBroadcastJoins = 1,
      minAggFedJoins = 1),
    // the regression gate for the WINNING (shuffle) regime the probe
    // measures at ~2x: broadcast disabled, so the grain pre-aggregate
    // must feed a shuffle join — a rule regression that drops the
    // pre-aggregate (aggFedJoins=0) or re-broadcasts fails this row
    "q_join_eager_agg_shuffle" -> ShapeBounds(maxShuffles = 4,
      maxShuffleJoins = 1, minAggFedJoins = 1),
    // dim-weighted algebra rides the same broadcast-regime plan
    "q_join_eager_agg_bilateral" -> ShapeBounds(maxShuffles = 3,
      minBroadcastJoins = 1, minAggFedJoins = 1),
    // stats-armed auto mode in the shuffle regime; the 2-job allowance
    // is the analyze pass (count + sketches), an action by design
    "q_join_eager_agg_auto" -> ShapeBounds(maxShuffles = 4,
      maxShuffleJoins = 1, minAggFedJoins = 1, maxBuildJobs = 2),
    // the 2-level star cascade under auto (r20): derived cardinality
    // must keep BOTH joins fed by grain pre-aggregates — minAggFedJoins
    // = 2 is the load-bearing pin; the 4-job allowance is the two
    // scoped analyze passes (schema + sketch job each)
    "q_join_eager_agg_cascade" -> ShapeBounds(maxShuffles = 6,
      maxShuffleJoins = 2, minPushedScans = 3, minAggFedJoins = 2,
      maxBuildJobs = 4),
    // FILTERed dim-side aggregates ride the weighted algebra on the
    // broadcast-regime plan (r20)
    "q_join_eager_agg_filtered" -> ShapeBounds(maxShuffles = 3,
      minBroadcastJoins = 1, minPushedScans = 2, minAggFedJoins = 1),
    // r21: q3/q5 build runs ONE-TIME KeyUniqueness.ensure jobs (exact
    // dim-key count-distincts, memoized per file set — the proof that
    // lets UnscaledDecimalSums carry its bound through the star joins);
    // the warmFirst warm-up absorbs them like the MV fixture builds, so
    // maxBuildJobs stays 0 for the steady-state build
    "q3_join_agg" -> ShapeBounds(maxShuffles = 1, minBroadcastJoins = 2, minPushedScans = 3),
    "q5_join_multi" -> ShapeBounds(maxShuffles = 2, minBroadcastJoins = 5, minPushedScans = 6),
    "q_win_rank" -> ShapeBounds(maxShuffles = 2),
    "q_topk" -> ShapeBounds(maxShuffles = 0),
    "q_asof_join" -> ShapeBounds(maxShuffles = 2, minPushedScans = 2),
    "q_range_join" -> ShapeBounds(maxShuffles = 2, minBroadcastJoins = 1, minPushedScans = 2),
    "q_dedup_minhash" -> ShapeBounds(maxShuffles = 2, minBroadcastJoins = 3, maxBuildJobs = 2),
    "q_sim_topk" -> ShapeBounds(maxShuffles = 0, minPushedScans = 2, allowBnlj = true),
    "q_text_stats" -> ShapeBounds(maxShuffles = 1),
    // r21 single-pass restructure: the keeper join (and its broadcast,
    // and the second documents scan) is GONE — dedup is a min_by over
    // the sha256 digest, so the pin is now one scan and no join; the
    // scan has no residual predicate to push (the old IsNotNull came
    // from the join key)
    "q_pipeline_corpus" -> ShapeBounds(maxShuffles = 3, maxScans = 1),
    "q_federated_join" -> ShapeBounds(maxShuffles = 2, minBroadcastJoins = 2, minPushedScans = 3),
    "q_events_window" -> ShapeBounds(maxShuffles = 2, minPushedScans = 1),
    // headline families
    "q_decontaminate" -> ShapeBounds(maxShuffles = 3, minBroadcastJoins = 1,
      minPushedScans = 1, maxBuildJobs = 1),
    "q_text_perplexity" -> ShapeBounds(maxShuffles = 5, minBroadcastJoins = 1, allowBnlj = true),
    "q_text_gopher" -> ShapeBounds(maxShuffles = 1),
    // incremental dedup's build loads the stored index manifest and
    // materializes the increment's bands — bounded by the index layout,
    // not the corpus (strict counting sees 6 such jobs at the fixture)
    "q_dedup_incremental" -> ShapeBounds(maxShuffles = 2, minBroadcastJoins = 5,
      minPushedScans = 2, maxBuildJobs = 8),
    // r13 balanced build: levels are PINNED (election self-joins read the
    // cache, so no file scans survive in the plan) and the per-cell
    // sub-fits are bounded action jobs — the allowance covers root fit +
    // per-level pins/counts + the fixture's over-cap sub-fits
    "q_dedup_semantic" -> ShapeBounds(maxShuffles = 2, minBroadcastJoins = 1,
      maxBuildJobs = 64),
    "q_dedup_paragraph" -> ShapeBounds(maxShuffles = 3, minBroadcastJoins = 1, minPushedScans = 1),
    "q_hybrid_search" -> ShapeBounds(maxShuffles = 0, maxShuffleJoins = 1,
      maxBuildJobs = 12, allowBnlj = true),
    "q_pack_sequences" -> ShapeBounds(maxShuffles = 2),
    "q_dedup_embedding_lsh" -> ShapeBounds(maxShuffles = 0),
    "q_sim_topk_ivf" -> ShapeBounds(maxShuffles = 0, maxBuildJobs = 24),
    "q_sim_topk_lsh" -> ShapeBounds(maxShuffles = 0, minBroadcastJoins = 1, minPushedScans = 2),
    "q_sample_temperature" -> ShapeBounds(maxShuffles = 5, minBroadcastJoins = 1,
      maxShuffleJoins = 1, minPushedScans = 2, allowBnlj = true),
    "q_text_bm25" -> ShapeBounds(maxShuffles = 8, minBroadcastJoins = 2,
      minPushedScans = 2, allowBnlj = true),
    "q_dedup_exact" -> ShapeBounds(maxShuffles = 2),
    "q_dedup_simhash" -> ShapeBounds(maxShuffles = 1, minBroadcastJoins = 1, maxBuildJobs = 1),
    // the BPE FIT is one bounded action: the capped word-frequency
    // dictionary collect (tokenizers fit on dictionaries, never corpora)
    "q_text_bpe_fertility" -> ShapeBounds(maxShuffles = 2, maxBuildJobs = 1),
    // MV maintenance family: maxScans is the load-bearing pin — the
    // refresh must read changelog windows + the view frame, never grow a
    // new base read; buildJobs are the iceberg metadata/delete-file
    // reads (bounded by manifests, not data). Measured sf0.001 shapes:
    // incremental 5/6bhj/1smj/7scans/9jobs, minmax 8/16/2/12/4 (the
    // extremum rescan is the one extra keyed read), join 11/30/3/15/5.
    "q_mv_incremental" -> ShapeBounds(maxShuffles = 5, minBroadcastJoins = 4,
      maxShuffleJoins = 2, minPushedScans = 2, maxBuildJobs = 12,
      maxScans = 7),
    "q_mv_minmax" -> ShapeBounds(maxShuffles = 8, minBroadcastJoins = 10,
      maxShuffleJoins = 3, minPushedScans = 3, maxBuildJobs = 8,
      maxScans = 12),
    "q_mv_join" -> ShapeBounds(maxShuffles = 11, minBroadcastJoins = 20,
      maxShuffleJoins = 4, minPushedScans = 8, maxBuildJobs = 8,
      maxScans = 15),
    // distinct-count MVs (r14): same contract — the refresh reads the
    // changelog window + the view frames, never a fresh base scan.
    // Measured sf0.001: distinct 12sh/7bhj/3smj/8scans/3jobs; the
    // approx flavor runs TWO refresh steps (new-key insert window, then
    // the delete-rescan window) so its shape is roughly doubled:
    // 20/16/7/17scans/4jobs — the 17 scans are the two windows'
    // changelog + delete-file reads plus the keyed rescan, all
    // manifest- or churn-bounded.
    "q_mv_distinct" -> ShapeBounds(maxShuffles = 12, minBroadcastJoins = 7,
      maxShuffleJoins = 3, minPushedScans = 2, maxBuildJobs = 6,
      maxScans = 8),
    "q_mv_approx_distinct" -> ShapeBounds(maxShuffles = 20,
      minBroadcastJoins = 16, maxShuffleJoins = 7, minPushedScans = 5,
      maxBuildJobs = 8, maxScans = 17),
    // span dedup: 4 shuffles carry digests/positions only (dict groupBy,
    // kill join, kill collect, doc_id reattach) — text itself never
    // shuffles, and the build is fully declarative (zero driver jobs)
    "q_dedup_spans" -> ShapeBounds(maxShuffles = 4, minBroadcastJoins = 1,
      maxShuffleJoins = 1, minPushedScans = 1, maxScans = 3),
    "q_pipeline_source_quality" -> ShapeBounds(maxShuffles = 3,
      minBroadcastJoins = 1, maxShuffleJoins = 1, maxScans = 2)
  )
}
