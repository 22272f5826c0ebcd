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

  /** Both levels of a refreshed distinct-count view — see
    * [[refreshDistinct]].
    */
  final case class DistinctRefresh(multiplicity: DataFrame, distinct: DataFrame)

  /** Incremental EXACT COUNT(DISTINCT) maintenance — the aggregate
    * everyone declares un-maintainable is maintainable with one level of
    * indirection: a stored MULTIPLICITY table `(key, value, ref)` (how
    * many live base rows carry each value under each key) makes the
    * distinct view's delta fully invertible again. The changelog folds
    * into the multiplicity table exactly like [[refreshSumCount]] on the
    * composite (key, value) grain; a value is BORN under its key when its
    * refcount crosses 0 -> positive and DIES on positive -> 0, and the
    * distinct view's per-key delta is simply (#births - #deaths) — so a
    * delete of one duplicate copy correctly changes NOTHING downstream.
    *
    * Semantics match SQL `count(DISTINCT value)`: NULL values are carried
    * in the multiplicity table (so its refcounts sum to count(*)) but
    * never fire birth/death events. The distinct view is
    * `(key, ndCol, nCol)` with nCol = live row count, which also decides
    * group liveness: a group whose rows all carry NULL values stays, with
    * ndCol = 0, exactly as a recompute would emit it; a group netted to
    * zero rows drops. A changelog that drives any refcount negative
    * (deleting a value the table never held) fails loudly rather than
    * corrupting either level.
    *
    * 100 TB shape: O(churn) delta aggregation, one (key,value)-
    * partitioned join against the multiplicity table, one churn-scoped
    * probe of it for the transition events, one key-partitioned join
    * against the (small) distinct view — the base table is NEVER
    * rescanned, and with the multiplicity table stored bucketed by
    * (key, value) the big join co-locates. The multiplicity table is the
    * price of exactness: it is bounded by the number of LIVE DISTINCT
    * (key, value) pairs, not by base rows — for the approximate flavor
    * whose state is O(#keys) regardless of cardinality, see
    * [[refreshApproxDistinct]].
    */
  def refreshDistinct(
      mvMult: DataFrame,
      mvDistinct: DataFrame,
      changelog: DataFrame,
      key: String,
      value: org.apache.spark.sql.Column,
      valCol: String,
      refCol: String,
      ndCol: String,
      nCol: String
  ): DistinctRefresh = {
    val ct = col("_change_type")
    val sign = when(ct === "insert", lit(1L))
      .when(ct === "delete", lit(-1L))
      .otherwise(raise_error(concat(
        lit("refreshDistinct: unknown _change_type "), ct)).cast("bigint"))
    val delta = changelog
      .select(col(key), value.as("_v"), sign.as("_sg"))
      .groupBy(col(key), col("_v"))
      .agg(sum(col("_sg")).as("_d"))
    // a refcount can only go negative on an inconsistent feed — raise in
    // BOTH outputs' lineage (they are separate frames; a guard on one
    // would not protect a caller using only the other)
    def guardNeg(c: org.apache.spark.sql.Column) =
      when(c < 0, raise_error(concat(
        lit("refreshDistinct: negative multiplicity — the changelog "),
        lit("deleted a (key, value) the table never held"))).cast("bigint"))
        .otherwise(c)
    // level 1, the multiplicity table: refreshSumCount's algebra on the
    // composite grain. Null-SAFE equality on both columns: null keys are
    // one group and null VALUES are one (uncounted) multiplicity row.
    val multiplicity = mvMult.as("m")
      .join(delta.as("d"),
        col(s"m.$key") <=> col(s"d.$key") && col(s"m.$valCol") <=> col("_v"),
        "full_outer")
      .select(
        coalesce(col(s"d.$key"), col(s"m.$key")).as(key),
        coalesce(col("_v"), col(s"m.$valCol")).as(valCol),
        guardNeg(coalesce(col(s"m.$refCol"), lit(0L)) +
          coalesce(col("_d"), lit(0L))).as(refCol))
      .filter(col(refCol) > 0)
    // level 2, the transition events: only churned (key, value) pairs can
    // cross zero, so this probe is delta-scoped — a left join FROM the
    // churn, never a pass over the multiplicity table
    val transitions = delta.as("d")
      .join(mvMult.as("m"),
        col(s"d.$key") <=> col(s"m.$key") && col("_v") <=> col(s"m.$valCol"),
        "left_outer")
      .select(
        col(s"d.$key").as(key),
        col("_v"),
        coalesce(col(s"m.$refCol"), lit(0L)).as("_old"),
        guardNeg(coalesce(col(s"m.$refCol"), lit(0L)) + col("_d")).as("_new"),
        col("_d"))
    val dAgg = transitions
      .groupBy(col(key))
      .agg(
        sum(when(col("_v").isNull, lit(0L))
          .when(col("_old") === 0 && col("_new") > 0, lit(1L))
          .when(col("_old") > 0 && col("_new") === 0, lit(-1L))
          .otherwise(lit(0L))).as("_dnd"),
        sum(col("_d")).as("_dn"))
    val distinct = mvDistinct.as("v")
      .join(dAgg.as("dd"), col(s"v.$key") <=> col(s"dd.$key"), "full_outer")
      .select(
        coalesce(col(s"dd.$key"), col(s"v.$key")).as(key),
        (coalesce(col(s"v.$ndCol"), lit(0L)) + coalesce(col("_dnd"), lit(0L)))
          .as(ndCol),
        (coalesce(col(s"v.$nCol"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
          .as(nCol))
      .filter(col(nCol) > 0)
    DistinctRefresh(multiplicity, distinct)
  }

  /** Incremental APPROX-distinct maintenance — the MERGEABLE-SKETCH
    * aggregate class, completing the IVM taxonomy alongside
    * delta-invertible ([[refreshSumCount]], [[refreshDistinct]]),
    * extremum-rescan ([[refreshMinMax]]) and join views
    * ([[refreshJoin]]): the view stores one HLL sketch per key
    * (O(#keys) state, independent of value cardinality — the scale
    * answer when [[refreshDistinct]]'s multiplicity table is itself too
    * big), and INSERTS fold by sketch UNION, which is exactly as cheap
    * and as shuffle-shaped as summing longs. Sketches cannot forget, so
    * a group with ANY delete in the window takes the authoritative
    * rescan — the caller-supplied keyed read of CURRENT base rows, the
    * same contract as refreshMinMax — and re-sketches from scratch;
    * groups the rescan returns no rows for are dead and drop.
    *
    * Estimator honesty (measured, Spark 4 DataSketches HLL): while a
    * key's sketch stays in the exact list/set regime (up to a few
    * hundred distinct values at the default lgK=12), estimates are
    * EXACT and union is lossless. Once dense, a UNIONED sketch's
    * estimate can differ ~1% from a freshly-streamed one — union
    * invalidates the HIP estimator and falls back to the composite one —
    * so refresh-vs-recompute equality is exact in the sparse regime and
    * bounded-error (both within the sketch's published bounds of the
    * truth) in the dense one. hll_sketch_agg ignores NULL values (SQL
    * count(DISTINCT) semantics) and returns an EMPTY sketch, never
    * null, for an all-null group.
    */
  def refreshApproxDistinct(
      mv: DataFrame,
      changelog: DataFrame,
      key: String,
      value: org.apache.spark.sql.Column,
      skCol: String,
      rescan: DataFrame => DataFrame
  ): DataFrame = {
    val ct = col("_change_type")
    val guarded = when(ct.isin("insert", "delete"), ct)
      .otherwise(raise_error(concat(
        lit("refreshApproxDistinct: unknown _change_type "), ct)))
    val perKey = changelog
      .select(col(key), value.as("_v"), guarded.as("_ct"))
      .groupBy(col(key))
      .agg(
        hll_sketch_agg(when(col("_ct") === "insert", col("_v"))).as("_ins_sk"),
        max(col("_ct") === "delete").as("_has_del"))
    val joined = mv.as("m")
      .join(perKey.as("d"), col(s"m.$key") <=> col(s"d.$key"), "full_outer")
    // deletes force the rescan; a delete against a key the view has no
    // row for is equally un-mergeable and routes the same way
    val needRescan = coalesce(col("_has_del"), lit(false))
    val fast = joined
      .filter(!needRescan)
      .select(
        coalesce(col(s"d.$key"), col(s"m.$key")).as(key),
        // hll_union nulls out if EITHER side is null — a new key (no
        // stored sketch) or an untouched key (no batch sketch) must
        // take the other side whole
        when(col(s"m.$skCol").isNull, col("_ins_sk"))
          .when(col("_ins_sk").isNull, col(s"m.$skCol"))
          .otherwise(hll_union(col(s"m.$skCol"), col("_ins_sk"))).as(skCol))
    val rescanned = rescan(joined.filter(needRescan)
        .select(coalesce(col(s"d.$key"), col(s"m.$key")).as(key)))
      .groupBy(col(key))
      .agg(hll_sketch_agg(col("v")).as(skCol))
    fast.unionByName(rescanned)
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
