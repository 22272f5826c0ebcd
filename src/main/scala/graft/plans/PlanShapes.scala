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
    allowBnlj: Boolean = false
)

object PlanShapes {

  /** Headline family queries audited beyond the bench set. */
  val headlineNames: Seq[String] = Seq(
    "q_decontaminate", "q_text_perplexity", "q_text_gopher",
    "q_dedup_incremental", "q_dedup_semantic", "q_dedup_paragraph",
    "q_hybrid_search", "q_pack_sequences", "q_dedup_embedding_lsh",
    "q_sim_topk_ivf", "q_sim_topk_lsh", "q_sample_temperature",
    "q_text_bm25", "q_dedup_exact", "q_dedup_simhash",
    "q_text_bpe_fertility"
  )

  def headline(name: String): Boolean = headlineNames.contains(name)

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
    "q_agg_cube" -> ShapeBounds(maxShuffles = 2),
    "q3_join_agg" -> ShapeBounds(maxShuffles = 1, minBroadcastJoins = 2, minPushedScans = 3),
    "q5_join_multi" -> ShapeBounds(maxShuffles = 2, minBroadcastJoins = 5, minPushedScans = 6),
    "q_win_rank" -> ShapeBounds(maxShuffles = 2),
    "q_topk" -> ShapeBounds(maxShuffles = 0),
    "q_asof_join" -> ShapeBounds(maxShuffles = 2, minPushedScans = 2),
    "q_range_join" -> ShapeBounds(maxShuffles = 2, minBroadcastJoins = 1, minPushedScans = 2),
    "q_dedup_minhash" -> ShapeBounds(maxShuffles = 2, minBroadcastJoins = 3, maxBuildJobs = 2),
    "q_sim_topk" -> ShapeBounds(maxShuffles = 0, minPushedScans = 2, allowBnlj = true),
    "q_text_stats" -> ShapeBounds(maxShuffles = 1),
    "q_pipeline_corpus" -> ShapeBounds(maxShuffles = 3, minBroadcastJoins = 1, minPushedScans = 1),
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
    "q_text_bpe_fertility" -> ShapeBounds(maxShuffles = 2, maxBuildJobs = 1)
  )
}
