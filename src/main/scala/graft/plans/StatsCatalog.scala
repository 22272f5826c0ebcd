package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.datasketches.hll.{HllSketch, Union}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table statistics for the cost decisions the optimizer rules cannot
  * make blind: row counts plus one MERGEABLE per-column HLL sketch
  * (Apache DataSketches — the same library behind Spark's own
  * `hll_sketch_agg`, which computes the sketches distributed; estimates
  * and merges happen driver-side on the stored bytes).
  *
  * Why sketches and not plain NDV numbers: plain counts cannot absorb an
  * increment without a full rescan, sketches union in O(sketch bytes) —
  * so a table analyzed ONCE stays current through O(churn) maintenance
  * ([[mergeIncrement]], wired into the tracked-table write paths). Deletes
  * only adjust the row count; a sketch cannot forget, so NDVs are upper
  * bounds under deletion — which only makes the consumers MORE
  * conservative (a too-high grain NDV skips a rewrite, never mis-fires
  * one).
  *
  * Beyond per-column sketches, [[analyze]] accepts column COMBOS: a
  * joint HLL sketch per requested column set (sketched through one
  * xxhash64 of the tuple), closing the correlated-grain blind spot — the
  * per-column NDV PRODUCT overestimates a correlated grain (zip-code x
  * city ~ |zip|, not |zip|*|city|), skipping rewrites that are real wins;
  * an exact-set joint sketch restores them. Increments keep combos
  * current through the same union path.
  *
  * Consumers (all through [[estimatePlan]], the derived-cardinality
  * estimator that walks Filter/Project/Join/Aggregate shapes ABOVE the
  * analyzed scans — so a decision no longer requires the input to BE a
  * bare scan, the limitation that kept r19's auto mode from cascading
  * through multi-way stars):
  *
  *  - [[EagerAggJoin]] in its `auto` mode (the default): fire the
  *    below-join pre-aggregate only when grain-NDV / fact-rows clears a
  *    conservative threshold and the dim side is not broadcast-sized —
  *    the decision the reference delegates to its SQL backend's
  *    cost-based optimizer (crates/engine/src/lib.rs:54-57) and a plain
  *    parquet scan otherwise has no statistics to make. The estimator
  *    derives level-2+ cardinality through the level-1 rewrite itself: a
  *    planted pre-aggregate's rows ~= its grain NDV, an inner equi-join's
  *    rows ~= |l|*|r| / max(key NDVs) — so the cascade now arms from
  *    harvested statistics alone.
  *  - [[PreAggExpand]]'s adverse-skip, and [[MvAdvisor]]'s cost model.
  *  - [[RelationStats]] injects the harvested row counts + NDVs into
  *    Spark's OWN planner (CBO join reordering, AQE presets), so one
  *    analyze pass feeds every cost decision in the stack.
  *
  * Scoping: entries are either GLOBAL (visible to every session, ride
  * [[CatalogPersistence]], maintained by tracked write paths) or
  * SESSION-scoped ([[analyzeScoped]] — keyed by the analyzing session's
  * UUID, invisible anywhere else, never persisted). Registered queries
  * that analyze during construction use the scoped face so building one
  * query can never change another query's plan (suite-order
  * independence).
  *
  * Durability: the global registry rides [[CatalogPersistence]]'s one
  * JSON document (sketch bytes base64-encoded), so a maintainer restart
  * keeps its statistics exactly like its store watermarks.
  *
  * Column coverage: natively sketchable types go in as-is (int/long/
  * string/binary); dates, timestamps, decimals, floats and booleans are
  * sketched through a canonical string cast (NDV-faithful — the cast is
  * injective per type); nested types are skipped. The SAME canon cast
  * runs at analyze and merge time, so increments union consistently.
  */
object StatsCatalog {

  /** `ndv` is the driver-side estimate of the stored sketch, kept
    * denormalized so consumers never pay a heapify per plan.
    */
  final case class ColStats(ndv: Long, sketch: Array[Byte])

  /** `combos` is keyed by the canonical combo name: the member column
    * names sorted and comma-joined (see [[comboKey]]).
    */
  final case class TableStats(
      path: String,
      rows: Long,
      cols: Map[String, ColStats],
      updatedMs: Long,
      combos: Map[String, ColStats] = Map.empty)

  // key = path for global entries, sessionUUID + NUL + path for
  // session-scoped ones — one map so isEmpty stays a single fast check
  private val reg = new ConcurrentHashMap[String, TableStats]()

  def normalize(p: String): String = MvCatalog.normalize(p)

  def comboKey(cols: Seq[String]): String = cols.sorted.mkString(",")

  /** The session's scope id rides its OWN conf (set lazily by
    * [[analyzeScoped]]): collision-free, inherited by nothing — a
    * newSession() gets fresh conf state, hence a fresh scope.
    */
  private val ScopeConf = "spark.graft.stats.scope"

  private def scopeOf(session: SparkSession): Option[String] =
    Option(session.sessionState.conf.getConfString(ScopeConf, null))
      .filter(_.nonEmpty)

  private def scopedKey(id: String, path: String): String =
    id + "\u0000" + normalize(path)

  /** Fast emptiness check — the optimizer rules' early-out: with no
    * table analyzed, auto-mode gates can skip their whole plan analysis
    * (the same pattern as MvCatalog.isEmpty in MvRewrite).
    */
  def isEmpty: Boolean = reg.isEmpty

  /** Global entries only. */
  def lookup(path: String): Option[TableStats] =
    Option(reg.get(normalize(path)))

  /** Session-scoped entry first, global fallback — the consumer-facing
    * resolution every optimizer gate uses.
    */
  def lookup(session: SparkSession, path: String): Option[TableStats] =
    scopeOf(session).flatMap(id => Option(reg.get(scopedKey(id, path))))
      .orElse(Option(reg.get(normalize(path))))

  /** Is this table GLOBALLY analyzed — i.e. should write paths keep it
    * current? (Session-scoped entries are construction-time snapshots by
    * design; write paths never maintain them.)
    */
  def tracked(path: String): Boolean = reg.containsKey(normalize(path))

  /** Global entries only — the persistence and wire-describe face;
    * session-scoped snapshots stay invisible outside their session.
    */
  def describe(): Seq[TableStats] = {
    import scala.jdk.CollectionConverters._
    reg.entrySet().asScala.toSeq
      .filterNot(_.getKey.contains('\u0000'))
      .map(_.getValue).sortBy(_.path)
  }

  def unregister(path: String): Unit = reg.remove(normalize(path)): Unit
  def unregisterScoped(session: SparkSession, path: String): Unit =
    scopeOf(session).foreach(id => reg.remove(scopedKey(id, path)): Unit)
  def clear(): Unit = reg.clear()

  /** Restore one saved entry (catalog reload). */
  private[plans] def register(st: TableStats): Unit =
    reg.put(normalize(st.path), st.copy(path = normalize(st.path))): Unit

  private def sketchExpr(name: String, dt: DataType) = dt match {
    case IntegerType | LongType | StringType | BinaryType =>
      Some(hll_sketch_agg(col(name)))
    case ByteType | ShortType | BooleanType | FloatType | DoubleType |
        DateType | TimestampType | TimestampNTZType | _: DecimalType =>
      Some(hll_sketch_agg(col(name).cast(StringType)))
    case _ => None
  }

  /** One joint sketch per combo: the tuple reduces to one xxhash64 (a
    * 64-bit hash under-counts NDV only at birthday-collision scale —
    * far below the HLL's own ~2% error for any realistic cardinality).
    * Combos referencing unsketchable or absent columns are dropped.
    */
  private def comboExpr(
      df: DataFrame, combo: Seq[String]): Option[org.apache.spark.sql.Column] = {
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val ok = combo.nonEmpty && combo.forall(c =>
      fields.get(c).exists(dt => sketchExpr(c, dt).isDefined))
    if (!ok) None
    else Some(hll_sketch_agg(xxhash64(combo.sorted.map(col): _*)))
  }

  private def estimate(sketch: Array[Byte]): Long =
    math.round(HllSketch.heapify(sketch).getEstimate)

  private def sketchRow(
      df: DataFrame,
      combos: Seq[Seq[String]]
  ): (Long, Map[String, Array[Byte]], Map[String, Array[Byte]]) = {
    val sketched = df.schema.fields
      .flatMap(f => sketchExpr(f.name, f.dataType).map(f.name -> _)).toSeq
    val comboCols = combos
      .map(c => comboKey(c) -> c).distinct
      .flatMap { case (k, c) => comboExpr(df, c).map(k -> _) }
    val aggs = count(lit(1)).as("_rows") +:
      (sketched.map { case (n, e) => e.as(s"_hll_$n") } ++
        comboCols.map { case (k, e) => e.as(s"_hllc_$k") })
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getLong(0)
    def harvest(names: Seq[String], offset: Int): Map[String, Array[Byte]] =
      names.zipWithIndex.flatMap { case (n, i) =>
        // an all-null column yields a null sketch; record it as empty
        Option(row.getAs[Array[Byte]](offset + i)).map(n -> _)
      }.toMap
    (rows,
      harvest(sketched.map(_._1), 1),
      harvest(comboCols.map(_._1), 1 + sketched.size))
  }

  /** ONE full pass over the table: count(*) plus an HLL sketch per
    * sketchable column plus one JOINT sketch per requested combo,
    * registered globally under the normalized path. `data` overrides how
    * the table reads (Iceberg roots, session-specific reader confs);
    * default is a plain parquet read of `path`.
    */
  def analyze(
      spark: SparkSession, path: String,
      data: Option[DataFrame] = None,
      combos: Seq[Seq[String]] = Nil): TableStats = {
    val st = compute(spark, path, data, combos)
    reg.put(st.path, st)
    st
  }

  /** [[analyze]] into a SESSION-scoped entry: visible only to `spark`'s
    * lookups, never persisted, never maintained by write paths — the
    * face for registered-query builders, whose statistics must not leak
    * into any other query's plan (suite-order independence).
    */
  def analyzeScoped(
      spark: SparkSession, path: String,
      data: Option[DataFrame] = None,
      combos: Seq[Seq[String]] = Nil): TableStats = {
    val st = compute(spark, path, data, combos)
    val id = scopeOf(spark).getOrElse {
      val fresh = java.util.UUID.randomUUID().toString
      spark.conf.set(ScopeConf, fresh)
      fresh
    }
    reg.put(scopedKey(id, path), st)
    st
  }

  private def compute(
      spark: SparkSession, path: String,
      data: Option[DataFrame], combos: Seq[Seq[String]]): TableStats = {
    val df = data.getOrElse(spark.read.parquet(path))
    val (rows, sketches, comboSketches) = sketchRow(df, combos)
    TableStats(
      normalize(path), rows,
      sketches.map { case (n, b) => n -> ColStats(estimate(b), b) },
      System.currentTimeMillis(),
      comboSketches.map { case (n, b) => n -> ColStats(estimate(b), b) })
  }

  /** O(increment) maintenance: sketch the appended rows alone and UNION
    * into the stored sketches; `deletedRows` only adjusts the count
    * (sketches cannot forget — NDV stays an upper bound, the
    * conservative direction). No-op for untracked tables, so the write
    * path stays zero-cost until someone analyzes. Combos tracked on the
    * stored entry are sketched over the increment too, so joint NDVs
    * stay as current as the per-column ones.
    *
    * Concurrency: the increment's sketches compute OUTSIDE the registry
    * lock (a Spark job), then the union + row-count update applies
    * inside `computeIfPresent` — so two concurrent appends to the same
    * table COMPOSE instead of racing (the r19 get-then-put dropped one
    * side's rows and sketch union silently).
    */
  def mergeIncrement(
      spark: SparkSession, path: String,
      appended: Option[DataFrame], deletedRows: Long = 0L): Unit = {
    val key = normalize(path)
    val snapshot = Option(reg.get(key)).getOrElse(return)
    val trackedCombos =
      snapshot.combos.keySet.toSeq.map(_.split(',').toSeq)
    val (incRows, incSketches, incCombos) = appended match {
      case Some(df) => sketchRow(df, trackedCombos)
      case None =>
        (0L, Map.empty[String, Array[Byte]], Map.empty[String, Array[Byte]])
    }
    def mergeCols(
        cur: Map[String, ColStats],
        inc: Map[String, Array[Byte]]): Map[String, ColStats] =
      (cur.keySet ++ inc.keySet).flatMap { n =>
        val merged = (cur.get(n).map(_.sketch), inc.get(n)) match {
          case (Some(a), Some(b)) =>
            val u = new Union(12)
            u.update(HllSketch.heapify(a))
            u.update(HllSketch.heapify(b))
            Some(u.getResult.toCompactByteArray)
          case (Some(a), None) => Some(a)
          case (None, Some(b)) => Some(b)
          case (None, None)    => None // unreachable by construction
        }
        merged.map(m => n -> ColStats(estimate(m), m))
      }.toMap
    reg.computeIfPresent(key, (k, cur) => TableStats(
      k, math.max(0L, cur.rows + incRows - deletedRows),
      mergeCols(cur.cols, incSketches),
      System.currentTimeMillis(),
      mergeCols(cur.combos, incCombos))): Unit
  }

  /** Best-effort staleness signal (r20): Some(true) when any data file
    * under the table path is NEWER than the statistics' updatedMs — a
    * write outside the maintained hooks (an external writer, a direct
    * parquet overwrite, a store build publishing over the path) has
    * landed since the last analyze/merge, so the entry may no longer
    * describe the table. None when the path cannot be inspected
    * (vanished, unreadable), which consumers surface as UNKNOWN rather
    * than fresh. Metadata-only: one recursive listing, no data read.
    */
  def stale(spark: SparkSession, st: TableStats): Option[Boolean] =
    try {
      val p = new org.apache.hadoop.fs.Path(st.path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        var newest = 0L
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val f = it.next()
          val n = f.getPath.getName
          if (!n.startsWith("_") && !n.startsWith("."))
            newest = math.max(newest, f.getModificationTime)
        }
        Some(newest > st.updatedMs)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  // -------------------------------------------------------------------
  // derived-cardinality estimation (r20)
  // -------------------------------------------------------------------

  /** Statistical view of one plan node's output: estimated rows, a
    * per-attribute NDV upper bound, and joint NDVs for harvested column
    * combos (attribute-set keyed). NDVs deliberately stay UNCAPPED by
    * the row estimate — rows is itself an estimate, and a spuriously low
    * one capping NDVs could mis-arm a rewrite; uncapped they remain pure
    * upper bounds, the direction every consumer treats as safe.
    */
  final case class PlanEst(
      rows: Double,
      ndv: Map[ExprId, Long],
      joint: Map[Set[ExprId], Long])

  /** Derive output statistics for the plan shapes the optimizer rules
    * actually see between their decision point and the analyzed scans:
    *
    *  - analyzed [[LogicalRelation]]: the harvested row count + NDVs;
    *  - Project: attributes pass through, an Alias of a bare attribute
    *    inherits its NDV (PullOutGroupingExpressions' relocation shape);
    *  - Filter: rows scale by [[selectivity]] (equality: 1/NDV, IN:
    *    |set|/NDV, conjunction: product; unrecognized predicates: 1.0 —
    *    an upper bound), NDVs stay (upper bounds survive filtering);
    *  - Aggregate over attribute grains: rows = the grain's joint NDV
    *    (exact-set combo sketch when harvested, else the capped product)
    *    — this is how a level-1 eager-aggregation rewrite becomes an
    *    ESTIMATED input for the level-2 decision;
    *  - inner equi-join: |l|*|r| / max(key NDVs) per key pair, the
    *    textbook containment estimate (both sides' attributes pass
    *    through).
    *
    * None = a node outside this algebra or a scan without harvested
    * statistics — consumers treat None as "unknown", which for
    * [[shouldEagerAgg]] means refuse and for
    * [[preAggExpandWorthwhile]] means fire (each rule's safe default).
    */
  def estimatePlan(
      session: SparkSession, plan: LogicalPlan): Option[PlanEst] = plan match {
    case lr: LogicalRelation =>
      for {
        root <- MvRewrite.scanRoot(lr)
        st <- lookup(session, root)
      } yield {
        val byName = lr.output.map(a => a.name -> a.exprId).toMap
        val ndv = lr.output.flatMap(a =>
          st.cols.get(a.name).map(c => a.exprId -> c.ndv)).toMap
        val joint = st.combos.flatMap { case (k, c) =>
          val ids = k.split(',').toSeq.map(byName.get)
          if (ids.forall(_.isDefined)) Some(ids.flatten.toSet -> c.ndv)
          else None
        }
        PlanEst(st.rows.toDouble, ndv, joint)
      }
    case Project(pl, child) =>
      estimatePlan(session, child).map { e =>
        val inherited = pl.collect {
          case a @ Alias(ar: AttributeReference, _)
              if e.ndv.contains(ar.exprId) =>
            a.exprId -> e.ndv(ar.exprId)
        }.toMap
        e.copy(ndv = e.ndv ++ inherited)
      }
    case Filter(cond, child) =>
      estimatePlan(session, child).map(e =>
        e.copy(rows = e.rows * selectivity(cond, e)))
    case Aggregate(groupingExprs, _, child, _) =>
      estimatePlan(session, child).flatMap { e =>
        val grainIds = groupingExprs.flatMap {
          case ar: AttributeReference => Some(ar.exprId)
          case _ => None
        }
        if (grainIds.size != groupingExprs.size) None // non-attr grain
        else grainNdv(e, grainIds).map { g =>
          val rows = if (grainIds.isEmpty) 1.0 else math.min(g, e.rows)
          // grouping attrs keep their NDV (one output row per distinct
          // grain preserves each member's distinct set); aggregate
          // results and joints over dropped attrs are unknown
          val kept = grainIds.toSet
          PlanEst(math.max(rows, 1.0),
            e.ndv.view.filterKeys(kept).toMap,
            e.joint.view.filterKeys(_.subsetOf(kept)).toMap)
        }
      }
    case j @ Join(left, right, Inner, Some(cond), _) =>
      for {
        le <- estimatePlan(session, left)
        re <- estimatePlan(session, right)
        sel <- joinSelectivity(j, cond, le, re)
      } yield PlanEst(
        math.max(le.rows * re.rows * sel, 1.0),
        le.ndv ++ re.ndv, le.joint ++ re.joint)
    case _ => None
  }

  /** Containment estimate over the equi conjuncts: 1/max(NDV_l, NDV_r)
    * per key pair; a non-equi conjunct or a key without statistics makes
    * the whole join unknown (None — conservative).
    */
  private def joinSelectivity(
      j: Join, cond: Expression,
      le: PlanEst, re: PlanEst): Option[Double] = {
    val leftOut = j.left.outputSet
    val rightOut = j.right.outputSet
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    val sels = split(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        keyPairSel(a, b, leftOut, rightOut, le, re)
      case EqualNullSafe(a: AttributeReference, b: AttributeReference) =>
        keyPairSel(a, b, leftOut, rightOut, le, re)
      case _ => None
    }
    if (sels.exists(_.isEmpty)) None else Some(sels.flatten.product)
  }

  private def keyPairSel(
      a: AttributeReference, b: AttributeReference,
      leftOut: AttributeSet, rightOut: AttributeSet,
      le: PlanEst, re: PlanEst): Option[Double] = {
    val (l, r) =
      if (leftOut.contains(a) && rightOut.contains(b)) (a, b)
      else if (leftOut.contains(b) && rightOut.contains(a)) (b, a)
      else return None
    for {
      ln <- le.ndv.get(l.exprId)
      rn <- re.ndv.get(r.exprId)
    } yield 1.0 / math.max(math.max(ln, rn), 1L).toDouble
  }

  /** Joint NDV of an attribute set: the exact-set combo sketch when one
    * was harvested (the correlated-grain fix), else the per-attribute
    * product — which OVERestimates under correlation, so it can only
    * skip a rewrite, never mis-fire one. None when any member has no
    * statistics at all.
    */
  private def grainNdv(e: PlanEst, ids: Seq[ExprId]): Option[Double] = {
    val set = ids.toSet
    e.joint.get(set) match {
      case Some(j) => Some(math.max(j, 1L).toDouble)
      case None =>
        val per = ids.map(e.ndv.get)
        if (per.exists(_.isEmpty)) None
        else Some(per.flatten.map(n => math.max(n, 1L).toDouble)
          .foldLeft(1.0)(_ * _))
    }
  }

  /** Selectivity of a filter predicate from harvested NDVs — equality
    * with a literal: 1/NDV; IN over literals: |set|/NDV; conjunction:
    * product; disjunction: capped sum; anything unrecognized: 1.0 (an
    * upper bound on rows, which for [[shouldEagerAgg]]'s size floor is
    * the direction that can only keep the r19 behavior, never refuse
    * more).
    */
  private def selectivity(cond: Expression, e: PlanEst): Double = {
    def eq(a: AttributeReference): Double =
      e.ndv.get(a.exprId).map(n => 1.0 / math.max(n, 1L)).getOrElse(1.0)
    cond match {
      case And(l, r) => selectivity(l, e) * selectivity(r, e)
      case Or(l, r) =>
        math.min(1.0, selectivity(l, e) + selectivity(r, e))
      case EqualTo(a: AttributeReference, _: Literal) => eq(a)
      case EqualTo(_: Literal, a: AttributeReference) => eq(a)
      case EqualNullSafe(a: AttributeReference, _: Literal) => eq(a)
      case EqualNullSafe(_: Literal, a: AttributeReference) => eq(a)
      case In(a: AttributeReference, list) if list.forall(_.foldable) =>
        math.min(1.0, list.size * eq(a))
      case InSet(a: AttributeReference, set) =>
        math.min(1.0, set.size * eq(a))
      case _ => 1.0
    }
  }

  // -------------------------------------------------------------------
  // the EagerAggJoin auto-arm decision
  // -------------------------------------------------------------------

  /** Auto skip-gate for [[PreAggExpand]] — the reverse default of
    * [[shouldEagerAgg]]: that rule is default-ON (its adverse case is a
    * bounded small overhead), so statistics only ever argue AGAINST it.
    * Returns false — skip the rewrite — exactly when the input's derived
    * statistics ([[estimatePlan]]) resolve and the grain NDV exceeds
    * `maxGrainRatio` of the rows (a near-unique grain pays the extra
    * exchange for almost no Expand reduction — the measured adverse case
    * the kill switch existed for, now automated). Unknown anything →
    * true (fire), preserving the no-stats behavior.
    */
  def preAggExpandWorthwhile(
      session: SparkSession,
      child: LogicalPlan,
      grainAttrs: Seq[Attribute]): Boolean = {
    val maxRatio = session.sessionState.conf
      .getConfString("spark.graft.optimizer.preAggExpand.maxGrainRatio", "0.5")
      .toDouble
    val est = estimatePlan(session, child).getOrElse(return true)
    if (est.rows <= 0) return true
    val g = grainNdv(est, grainAttrs.map(_.exprId)).getOrElse(return true)
    math.min(g, est.rows) <= maxRatio * est.rows
  }

  /** Auto-mode gate for [[EagerAggJoin]]: true when the fact side's
    * derived statistics resolve ([[estimatePlan]] — an analyzed scan, or
    * Filter/Project/Join/pre-aggregate shapes over analyzed scans: the
    * cascade's level-2 fact side is exactly such a derived plan) and
    * they say the rewrite is a win —
    *
    *  - `rows >= minRows` (tiny facts have nothing to save; POST-FILTER
    *    rows, so a selective fact filter now refuses where r19's
    *    table-row check fired),
    *  - `grain NDV <= maxGrainRatio * rows` (the pre-aggregate must
    *    materially shrink the join's fact input; joint combo sketches
    *    serve correlated grains exactly, the per-column product
    *    otherwise OVERestimates — which only skips rewrites, never
    *    mis-fires them),
    *  - the dim side is not broadcast-sized (when the dim broadcasts
    *    there is no fact shuffle to save and the extra aggregate is pure
    *    cost — the probe's measured adverse regime).
    *
    * Grain attributes without derivable statistics (relocated derived
    * columns, aggregate outputs) make the gate refuse, conservatively.
    */
  def shouldEagerAgg(
      session: SparkSession,
      factPlan: LogicalPlan,
      grainAttrs: Seq[Attribute],
      dimPlan: LogicalPlan): Boolean = {
    val conf = session.sessionState.conf
    val minRows = conf
      .getConfString("spark.graft.optimizer.eagerAggJoin.minRows", "1000000")
      .toLong
    val maxRatio = conf
      .getConfString("spark.graft.optimizer.eagerAggJoin.maxGrainRatio", "0.125")
      .toDouble
    val est = estimatePlan(session, factPlan).getOrElse(return false)
    if (est.rows < minRows) return false
    val g = grainNdv(est, grainAttrs.map(_.exprId)).getOrElse(return false)
    if (math.min(g, est.rows) > maxRatio * est.rows) return false
    // dim broadcastability through the same signal Spark's own join
    // selection uses at this stage: logical size estimate vs threshold
    val thresh = conf.autoBroadcastJoinThreshold
    val dimBroadcastable =
      thresh >= 0 && dimPlan.stats.sizeInBytes <= BigInt(thresh)
    !dimBroadcastable
  }
}
