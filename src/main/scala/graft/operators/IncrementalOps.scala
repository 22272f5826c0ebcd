package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental-corpus maintenance operators: MERGE-style upsert and
  * snapshot diff. A 100 TB training corpus is never rebuilt from scratch —
  * it is upserted (new crawl segments in, refreshed documents replacing
  * stale ones) and audited by diffing snapshots. Both operators are a
  * single full-outer join on the key — at scale that join co-locates by
  * key partitioning (or disappears entirely when both sides are stored
  * bucketed by the key, see sources.BucketedTables), and nothing here
  * ever materializes more than the joined row pair.
  *
  * The reference has no write path at all (Flight do_put unimplemented,
  * crates/api/src/lib.rs:151-156); these are Spark-native extensions in
  * the SURVEY.md §2.C spirit.
  */
object IncrementalOps {

  /** MERGE semantics over DataFrames: rows in `updates` replace same-key
    * rows of `target` (matched -> UPDATE), new-key rows append
    * (unmatched -> INSERT), untouched target rows pass through. Adds a
    * `merge_action` column ('updated' / 'inserted' / 'kept') so pipelines
    * can audit what a merge did — drop it for pure MERGE output.
    *
    * Both sides must share the schema; `key` must be unique per side
    * (standard MERGE precondition — violations surface as row-count
    * inflation, never silent row loss).
    */
  def merge(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val dataCols = target.columns.filter(_ != key).toSeq
    // alias-qualified string refs, NOT df(col): `updates` routinely derives
    // from `target` (same lineage), where df-bound references trip Spark's
    // ambiguous-self-join detection
    val joined = target
      .as("b")
      .join(updates.as("u"), col(s"b.$key") === col(s"u.$key"), "full_outer")
    // matched rows take the update row's value EVEN WHEN NULL (true MERGE
    // "UPDATE SET *" semantics) — a coalesce here would silently keep the
    // stale target value whenever a refresh legitimately clears a field
    val matched = col(s"u.$key").isNotNull
    joined.select(
      coalesce(col(s"u.$key"), col(s"b.$key")).as(key) +:
        dataCols.map(c =>
          when(matched, col(s"u.$c")).otherwise(col(s"b.$c")).as(c)) :+
        when(matched && col(s"b.$key").isNotNull, lit("updated"))
          .when(matched, lit("inserted"))
          .otherwise(lit("kept"))
          .as("merge_action"): _*
    )
  }

  /** Incremental materialized-aggregate maintenance (IVM): refresh a
    * materialized `SELECT key, sum(measure) AS sumCol, count(*) AS nCol
    * GROUP BY key` from a CDC changelog (rows tagged `_change_type`
    * 'insert' / 'delete', the [[graft.sources.IcebergSource.readChangelog]]
    * contract) WITHOUT rescanning the base table. Inserts contribute
    * (+measure, +1), deletes (-measure, -1); an update arrives as its
    * delete+insert pair and nets out exactly. Groups whose count reaches
    * zero are dropped — precisely the groups a full recompute would not
    * emit. avg and other algebraic aggregates derive from (sum, count)
    * downstream; holistic aggregates (median, distinct) are NOT
    * maintainable this way and must recompute.
    *
    * 100 TB shape: the refresh cost is O(|changes|) + one key-partitioned
    * join against the MV — never a base-table scan. With the MV stored
    * bucketed by the key the join co-locates and the refresh moves only
    * the delta. An unknown `_change_type` fails the job loudly rather
    * than corrupting the view.
    */
  def refreshSumCount(
      mv: DataFrame,
      changelog: DataFrame,
      key: String,
      measure: org.apache.spark.sql.Column,
      sumCol: String,
      nCol: String,
      // false: keep zero-count groups as rows — the stored-MV flavor
      // (streaming.MaterializedAgg) writes them back as TOMBSTONES so a
      // dead group's death is itself a recorded, mergeable update
      dropEmptyGroups: Boolean = true
  ): DataFrame = {
    val sign = when(col("_change_type") === "insert", lit(1L))
      .when(col("_change_type") === "delete", lit(-1L))
      .otherwise(raise_error(concat(
        lit("refreshSumCount: unknown _change_type "), col("_change_type")))
        .cast("bigint"))
    val delta = changelog
      .groupBy(col(key))
      .agg(
        sum(sign * measure).as("_d_sum"),
        sum(sign).as("_d_n")
      )
    // alias-qualified string refs: the MV routinely shares lineage with the
    // changelog's table (same ambiguous-self-join rationale as merge).
    // Null-SAFE key equality: a null-key group (e.g. a cast that nulls
    // malformed keys) must MERGE with its delta like any other group —
    // plain === would split it into two rows where the full recompute
    // emits one
    mv.as("m")
      .join(delta.as("d"), col(s"m.$key") <=> col(s"d.$key"), "full_outer")
      .select(
        coalesce(col(s"d.$key"), col(s"m.$key")).as(key),
        (coalesce(col(s"m.$sumCol"), lit(0L)) + coalesce(col("_d_sum"), lit(0L)))
          .as(sumCol),
        (coalesce(col(s"m.$nCol"), lit(0L)) + coalesce(col("_d_n"), lit(0L)))
          .as(nCol)
      )
      .filter(if (dropEmptyGroups) col(nCol) > 0 else lit(true))
  }

  /** Incremental min/max maintenance — the aggregate class
    * [[refreshSumCount]] cannot touch: min/max are not delta-invertible
    * (deleting the current minimum says nothing about the next one), so
    * pure-delta IVM is impossible. The standard production answer,
    * implemented here: INSERTS fold incrementally
    * (new_min = least(old, batch_min)); a group takes the RESCAN
    * fallback only when a delete could have hit its extremum
    * (batch_del_min <= stored_min or batch_del_max >= stored_max) — the
    * caller-supplied `rescan` reads the CURRENT base rows for exactly
    * those keys (a semi-join the base's layout can prune; never a full
    * scan) and their min/max/count recompute authoritatively. Groups
    * whose deletes sit strictly inside (min, max) never rescan.
    *
    * `mv` is (key, mnCol, mxCol, nCol); `changelog` carries the key,
    * `measure`, and `_change_type` insert/delete (unknown types raise);
    * `rescan` maps a frame of keys (single `key` column) to the base's
    * live (key, m) rows for those keys. Dead groups (count to zero) are
    * dropped, exactly as a recompute would not emit them; a rescanned
    * group whose base rows all vanished likewise disappears (the rescan
    * is authoritative). 100 TB shape: O(churn) delta agg + the
    * keys-sized MV join + a pruned base read proportional to
    * EXTREMUM-hitting churn, not table size.
    */
  def refreshMinMax(
      mv: DataFrame,
      changelog: DataFrame,
      key: String,
      measure: org.apache.spark.sql.Column,
      mnCol: String,
      mxCol: String,
      nCol: String,
      rescan: DataFrame => DataFrame
  ): DataFrame = {
    val ct = col("_change_type")
    val sign = when(ct === "insert", lit(1L))
      .when(ct === "delete", lit(-1L))
      .otherwise(raise_error(concat(
        lit("refreshMinMax: unknown _change_type "), ct)).cast("bigint"))
    val ch = changelog.select(col(key), measure.as("_m"), ct)
    val delta = ch
      .groupBy(col(key))
      .agg(
        sum(sign).as("_dn"),
        min(when(ct === "insert", col("_m"))).as("_ins_mn"),
        max(when(ct === "insert", col("_m"))).as("_ins_mx"),
        min(when(ct === "delete", col("_m"))).as("_del_mn"),
        max(when(ct === "delete", col("_m"))).as("_del_mx")
      )
    val joined = mv.as("m")
      .join(delta.as("d"), col(s"m.$key") <=> col(s"d.$key"), "full_outer")
      .select(
        coalesce(col(s"d.$key"), col(s"m.$key")).as(key),
        col(s"m.$mnCol").as("_mn"),
        col(s"m.$mxCol").as("_mx"),
        (coalesce(col(s"m.$nCol"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
          .as("_n"),
        col("_ins_mn"), col("_ins_mx"), col("_del_mn"), col("_del_mx")
      )
      // a delete against a key the MV has no row for (null _mn) cannot
      // be reasoned about incrementally — route it to the authoritative
      // rescan rather than guessing
      .withColumn("_rescan",
        col("_del_mn").isNotNull && col("_n") > 0 &&
          (col("_mn").isNull ||
            col("_del_mn") <= col("_mn") || col("_del_mx") >= col("_mx")))
    val fast = joined
      .filter(!col("_rescan") && col("_n") > 0)
      .select(
        col(key),
        least(col("_mn"), col("_ins_mn")).as(mnCol),
        greatest(col("_mx"), col("_ins_mx")).as(mxCol),
        col("_n").as(nCol)
      )
    val rescanned = rescan(joined.filter(col("_rescan")).select(col(key)))
      .groupBy(col(key))
      .agg(
        min(col("m")).as(mnCol),
        max(col("m")).as(mxCol),
        count(lit(1)).as(nCol)
      )
    fast.unionByName(rescanned)
  }

  /** Incremental JOIN-view maintenance — the third IVM class alongside
    * [[refreshSumCount]] (delta-invertible aggregates) and
    * [[refreshMinMax]] (extremum rescan): a stored inner equi-join view
    * `fact JOIN dim ON joinKey` refreshed from BOTH sides' changelogs
    * without ever rescanning either base table.
    *
    * The algebra is delta-scoped recompute rather than signed-delta
    * arithmetic: the changelogs are read ONLY for their churned key sets
    * (`factKey`s touched on the fact side, `joinKey`s touched on the dim
    * side — change types are irrelevant, because the affected region is
    * re-derived from the CURRENT base state through caller-supplied keyed
    * readers, the same authoritative-read contract as refreshMinMax's
    * rescan). View rows touching neither set pass through untouched; the
    * affected region — current fact rows whose pk churned or whose
    * joinKey's dim row churned — rejoins against exactly the dim rows it
    * references. That covers every hard case pure view-side approaches
    * miss: a fact update that MOVES a row between two un-churned dims, a
    * dim insert that makes previously-unmatched fact rows appear in the
    * view for the first time (those rows exist nowhere in the old view),
    * and a dim delete that kills its fact rows through inner-join
    * semantics rather than through explicit delete handling.
    *
    * Preconditions (the standard star-join view contract): `factKey` is
    * unique per fact row, `joinKey` is the dim's primary key (N:1 join),
    * and the readers return CURRENT base rows for exactly the requested
    * keys. 100 TB shape: two broadcastable churn-key anti-joins over the
    * view plus keyed base reads proportional to churn — with the bases
    * stored partitioned/bucketed by their keys, every read prunes; a
    * stored-table deployment feeds the same key sets to a MERGE so only
    * touched files rewrite.
    */
  def refreshJoin(
      mv: DataFrame,
      factChanges: DataFrame,
      dimChanges: DataFrame,
      factKey: String,
      joinKey: String,
      factByPk: DataFrame => DataFrame,
      factByJoinKey: DataFrame => DataFrame,
      dimByJoinKey: DataFrame => DataFrame
  ): DataFrame = {
    val churnedPks = factChanges.select(col(factKey)).distinct()
    val churnedDims = dimChanges.select(col(joinKey)).distinct()
    // untouched view rows: neither their fact pk nor their dim key churned.
    // Null-safe anti-join conditions: a null fact/join key in the view must
    // still match a null churn key (nulls never join in the inner view, but
    // the guard keeps the pass-through well-defined if the caller's view
    // carries them)
    val passThrough = mv.as("v")
      .join(churnedPks.as("cp"), col(s"v.$factKey") <=> col(s"cp.$factKey"),
        "left_anti")
      .as("v2")
      .join(churnedDims.as("cd"), col(s"v2.$joinKey") <=> col(s"cd.$joinKey"),
        "left_anti")
    // the affected region, from CURRENT base state: fact rows whose pk
    // churned plus fact rows pointing at a churned dim (distinct by pk —
    // a row can be in both sets)
    val affectedFacts = factByPk(churnedPks)
      .unionByName(factByJoinKey(churnedDims))
      .dropDuplicates(factKey)
    // exactly the dim rows the region references (churned or not: a fact
    // update may move a row UNDER an un-churned dim)
    val neededDims = affectedFacts.select(col(joinKey)).distinct()
    val regionRows = affectedFacts
      .join(dimByJoinKey(neededDims), Seq(joinKey), "inner")
    passThrough.unionByName(regionRows.select(passThrough.columns.map(col): _*))
  }

  /** Snapshot diff: classify every key as added / removed / changed /
    * unchanged between two snapshots, comparing `compareCols`. The audit
    * primitive for corpus versioning ("what did this crawl refresh
    * actually change?").
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      key: String,
      compareCols: Seq[String]
  ): DataFrame = {
    // alias-qualified string refs for the same shared-lineage reason as merge
    val changed = compareCols
      .map(c => not(col(s"o.$c") <=> col(s"n.$c")))
      .reduce(_ || _)
    oldSnap
      .as("o")
      .join(newSnap.as("n"), col(s"o.$key") === col(s"n.$key"), "full_outer")
      .select(
        coalesce(col(s"n.$key"), col(s"o.$key")).as(key),
        when(col(s"o.$key").isNull, lit("added"))
          .when(col(s"n.$key").isNull, lit("removed"))
          .when(changed, lit("changed"))
          .otherwise(lit("unchanged"))
          .as("change")
      )
  }
}
