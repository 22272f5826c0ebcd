package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, StructType}

/** One registered materialized view: a stored `GROUP BY keys` rollup of a
  * base parquet table, declared precisely enough that [[MvRewrite]] can
  * answer matching aggregate queries from it without ever scanning the
  * base.
  *
  * `measures` is keyed by the CANONICAL TEXT of the aggregated argument —
  * a bare column name (`l_quantity`) or `name::castType` when the query
  * aggregates a cast (`l_quantity::decimal(14,2)`). The key IS the
  * contract: registering `"x::decimal(14,2)" -> MvMeasure(sum = Some("s"))`
  * asserts that column `s` of the MV holds `SUM(CAST(x AS DECIMAL(14,2)))`
  * per group. The rule never re-derives this from the MV's own plan (the
  * MV is a stored table; its lineage is gone), so a wrong declaration
  * produces wrong rewrites — same trust model as every MV-rewrite engine
  * (Calcite, Oracle query rewrite): the registrant vouches for the
  * definition AND the freshness. Pair registration with the IVM refresh
  * operators ([[graft.operators.IncrementalOps]]) to keep the stored view
  * current, and [[MvCatalog.unregister]] before base mutations you cannot
  * refresh through.
  *
  * REFRESH PROTOCOL for the stored files: the catalog caches the MV's
  * analyzed scan (file listing) between registrations, so any process
  * that rewrites the files at `mvPath` must call
  * [[MvCatalog.invalidateScan]] BEFORE the overwrite and re-[[MvCatalog
  * .register]] (same name — replace-in-place) after it, or concurrent
  * query compiles plan against deleted files and later ones serve a
  * stale listing.
  */
final case class MvDef(
    name: String,
    basePath: String,
    keys: Seq[String],
    measures: Map[String, MvMeasure],
    countStar: Option[String],
    mvPath: String,
    mvSchema: StructType,
    // the source snapshot/version the stored MV reflects, vouched by the
    // registrant and updated by re-registering after each IVM refresh —
    // the freshness contract the serving layer's mv_describe exposes so
    // a client can tell how stale a rewritten answer is
    watermark: Option[Long] = None,
    // stored row count at (re-)registration — the COST SIGNAL candidate
    // selection orders by: among MVs that derive a query exactly, the
    // smallest answers it cheapest. None = unknown (sorts last, then
    // registration order breaks the tie)
    rows: Option[Long] = None
)

/** The MV columns derivable for one aggregated argument: `sum` holds the
  * per-group SUM, `cnt` the per-group COUNT of NON-NULL values (what
  * `count(x)` and the denominator of `avg(x)` need — `countStar` on
  * [[MvDef]] is the all-rows count), `min`/`max` the extrema.
  */
final case class MvMeasure(
    sum: Option[String] = None,
    cnt: Option[String] = None,
    min: Option[String] = None,
    max: Option[String] = None
)

/** One registered JOIN materialized view: the stored result of
  * `fact INNER JOIN dim ON <joinKeys>` at ROW grain (no pre-aggregation —
  * the [[graft.operators.IncrementalOps.refreshJoin]] storage shape).
  * Because the grain is identical to the join's output, [[MvRewrite]] can
  * answer ANY deterministic aggregate over the matching join from it —
  * including DISTINCT aggregates the rollup path must refuse — by
  * re-rooting the whole Aggregate on the MV scan. `joinKeys` is the
  * declared equality set as (factColumn, dimColumn) pairs; `mvSchema`
  * names the stored columns (same trust model as [[MvDef]]: the
  * registrant vouches that column `c` of the MV holds base column `c`,
  * and keeps the view fresh via the IVM operators).
  */
final case class JoinMvDef(
    name: String,
    factPath: String,
    dimPath: String,
    joinKeys: Seq[(String, String)],
    mvPath: String,
    mvSchema: StructType,
    // applied FACT-side watermark, same contract as [[MvDef.watermark]]
    watermark: Option[Long] = None,
    // stored row count, same cost-signal contract as [[MvDef.rows]]
    rows: Option[Long] = None,
    // applied DIM-side watermark — a join view is stale when EITHER
    // source moved, so freshness serving ANDs the two cursors
    dimWatermark: Option[Long] = None
)

/** One row of [[MvCatalog.describe]]: the registry's freshness face.
  * `dimPath` is defined for join views only.
  */
final case class MvInfo(
    name: String,
    kind: String,
    basePath: String,
    dimPath: Option[String],
    mvPath: String,
    watermark: Option[Long],
    // join views only: the applied dim-side cursor
    dimWatermark: Option[Long] = None
)

/** Process-wide registry of materialized views, keyed by the ABSOLUTE
  * path of the base table they roll up. [[MvRewrite]] consults it on
  * every Aggregate; an empty catalog makes the rule a no-op, so sessions
  * that never register an MV pay nothing.
  */
object MvCatalog {
  // MULTIPLE MVs per base are first-class (a wide table legitimately
  // carries several rollups with different key sets): each entry is the
  // candidate list in registration order, identity within a base is the
  // def's NAME (re-registering a name replaces that def in place — the
  // IVM refresh-then-re-register loop), and the rewrite tries candidates
  // in order, taking the first that derives the query exactly.
  private val byBase = new ConcurrentHashMap[String, Vector[MvDef]]()
  // join MVs, keyed by the (fact, dim) base-path pair — same list contract
  private val joinByBases =
    new ConcurrentHashMap[(String, String), Vector[JoinMvDef]]()
  // analyzed MV scans, keyed by mvPath: building one lists the MV's files,
  // so doing it inside the optimizer on EVERY pass of every matching query
  // is planning-time overhead that grows with compilation rate. The cache
  // is invalidated whenever the catalog changes (register/unregister/
  // clear) — the moments the MV's definition or its stored files can move.
  // Rewrite sites take a fresh-exprId copy via newInstance(), never the
  // cached node itself (two sites in one query must not collide).
  private val scanCache =
    new ConcurrentHashMap[String, LogicalRelation]()

  /** Normalize a path (URI or plain) to an absolute filesystem path, so
    * `file:/x/y`, `/x/y`, and `/x/../x/y` all key identically.
    */
  def normalize(p: String): String = {
    val noScheme =
      if (p.startsWith("file:")) new java.net.URI(p).getPath else p
    new java.io.File(noScheme).getCanonicalFile.getAbsolutePath
  }

  /** Replace-by-name within a candidate list, preserving order for
    * existing names and appending new ones.
    */
  private def upsertByName[A](list: Vector[A], d: A, name: A => String): Vector[A] =
    if (list.exists(x => name(x) == name(d)))
      list.map(x => if (name(x) == name(d)) d else x)
    else list :+ d

  def register(d: MvDef): Unit = {
    byBase.compute(normalize(d.basePath), (_, cur) =>
      upsertByName(Option(cur).getOrElse(Vector.empty), d, (_: MvDef).name))
    scanCache.remove(d.mvPath): Unit
  }
  def unregister(basePath: String): Unit =
    Option(byBase.remove(normalize(basePath)))
      .foreach(_.foreach(d => scanCache.remove(d.mvPath): Unit))
  def registerJoin(d: JoinMvDef): Unit = {
    joinByBases.compute((normalize(d.factPath), normalize(d.dimPath)),
      (_, cur) => upsertByName(Option(cur).getOrElse(Vector.empty), d,
        (_: JoinMvDef).name))
    scanCache.remove(d.mvPath): Unit
  }
  def unregisterJoin(factPath: String, dimPath: String): Unit =
    Option(joinByBases.remove((normalize(factPath), normalize(dimPath))))
      .foreach(_.foreach(d => scanCache.remove(d.mvPath): Unit))
  def clear(): Unit = {
    byBase.clear(); joinByBases.clear(); scanCache.clear()
  }
  /** Drop the cached analyzed scan (file listing) for one MV path. Call
    * BEFORE overwriting the stored MV's files: a query compiling between
    * the overwrite and the subsequent re-register would otherwise plan
    * against a listing of deleted files (FileNotFoundException), and a
    * refresh loop that rewrites files WITHOUT re-registering would
    * silently keep serving the stale listing.
    */
  def invalidateScan(mvPath: String): Unit = scanCache.remove(mvPath): Unit
  def isEmpty: Boolean = byBase.isEmpty && joinByBases.isEmpty
  /** The registered rollup def with this name, if any — names are the
    * replace-by-name identity, so at most one matches.
    */
  def find(name: String): Option[MvDef] = {
    import scala.jdk.CollectionConverters._
    byBase.values.asScala.flatten.find(_.name == name)
  }
  /** The registered join-view def with this name, if any — same
    * replace-by-name identity contract as [[find]].
    */
  def findJoin(name: String): Option[JoinMvDef] = {
    import scala.jdk.CollectionConverters._
    joinByBases.values.asScala.flatten.find(_.name == name)
  }
  /** Candidate rollup MVs for a base, in registration order. */
  def lookup(basePath: String): Seq[MvDef] =
    Option(byBase.get(normalize(basePath))).getOrElse(Vector.empty)
  /** Candidate join MVs for a (fact, dim) pair, in registration order. */
  def lookupJoin(factPath: String, dimPath: String): Seq[JoinMvDef] =
    Option(joinByBases.get((normalize(factPath), normalize(dimPath))))
      .getOrElse(Vector.empty)

  /** Every registered MV with its declared freshness watermark, sorted
    * by name — the registry's DESCRIBE surface (the serving layer
    * enriches each row with the live source snapshot).
    */
  def describe(): Seq[MvInfo] = {
    import scala.jdk.CollectionConverters._
    val rollups = byBase.values.asScala.flatten.map(d =>
      MvInfo(d.name, "rollup", d.basePath, None, d.mvPath, d.watermark))
    val joins = joinByBases.values.asScala.flatten.map(d =>
      MvInfo(d.name, "join", d.factPath, Some(d.dimPath), d.mvPath,
        d.watermark, d.dimWatermark))
    (rollups ++ joins).toSeq.sortBy(_.name)
  }

  /** Every registered rollup def, sorted by name — the full-definition
    * snapshot face [[CatalogPersistence.save]] serializes (describe()
    * deliberately drops the derivation metadata a reload needs).
    */
  def allDefs: Seq[MvDef] = {
    import scala.jdk.CollectionConverters._
    byBase.values.asScala.flatten.toSeq.sortBy(_.name)
  }

  /** Every registered join-view def, sorted by name — same persistence
    * contract as [[allDefs]].
    */
  def allJoinDefs: Seq[JoinMvDef] = {
    import scala.jdk.CollectionConverters._
    joinByBases.values.asScala.flatten.toSeq.sortBy(_.name)
  }

  /** A fresh-exprId analyzed scan of the stored MV (file listing cached
    * across rewrite sites; exprIds unique per call).
    */
  private[plans] def analyzedScan(
      spark: SparkSession, mvPath: String, mvSchema: StructType): LogicalPlan =
    scanCache.computeIfAbsent(mvPath, _ =>
      spark.read.schema(mvSchema).parquet(mvPath)
        .queryExecution.analyzed.collectFirst { case lr: LogicalRelation => lr }
        .getOrElse(throw new IllegalStateException(
          s"MV scan of $mvPath did not analyze to a LogicalRelation"))
    ).newInstance()
}

/** Optimizer rule: answer matching aggregate queries from a registered
  * materialized view instead of the base table — the classic OLAP
  * "aggregate rollup" rewrite (Oracle query rewrite, Calcite
  * MaterializedViewRule), Spark-native. Paired with the IVM refresh
  * operators this closes the loop the reference's cache crate only
  * gestures at (`/root/reference/crates/cache/src/lib.rs`: a RecordBatch
  * cache with planned CDC invalidation): the MV is maintained
  * incrementally from the changelog AND queries are routed to it
  * automatically.
  *
  * Matched shape (anywhere in the plan, including subqueries-as-joined
  * subtrees):
  * {{{ Aggregate(G, A, [Project*|Filter*] LogicalRelation(basePath)) }}}
  * where, against the registered [[MvDef]] for `basePath`:
  *  - every grouping expression is a bare base column in `keys` (a
  *    SUBSET regroup is the point: the MV stores the finest grouping,
  *    queries roll it up further);
  *  - every Filter conjunct references only `keys` columns (key
  *    predicates commute with the rollup, so they re-apply verbatim on
  *    the MV's key columns; any non-key predicate disqualifies — it
  *    would need base rows the MV no longer has);
  *  - every aggregate function is derivable:
  *      sum(x)   -> sum(mv.sum_x)
  *      count(*) -> coalesce(sum(mv.n), 0)       (empty input: COUNT is 0)
  *      count(x) -> coalesce(sum(mv.cnt_x), 0)
  *      min(x)   -> min(mv.min_x)   /  max(x) -> max(mv.max_x)
  *      avg(x)   -> sum(mv.sum_x) / sum(mv.cnt_x)   (double avg only —
  *                  decimal avg has engine-defined rounding the two-step
  *                  derivation would not reproduce, so it bails)
  *    FILTER'd aggregates bail. DISTINCT aggregates bail UNLESS every
  *    argument is a bare KEY column of the MV — then they re-run
  *    verbatim on the keys-sized MV (the grain preserves exactly the
  *    distinct key combinations), which is the multiplicity-table
  *    deployment: register the refreshDistinct store (GROUP BY keys, v)
  *    with v among the keys and `count(DISTINCT v)` rolls up from it.
  *    `approx_count_distinct` over a key column rewrites the same way,
  *    BIT-IDENTICALLY — HLL++ registers are duplicate-insensitive, so
  *    the sketch over the MV's distinct pairs equals the base's.
  *    `x` matches by the measure-key canonical text, so
  *    `sum(cast(x as decimal(14,2)))` finds the `x::decimal(14,2)`
  *    measure.
  *
  * The rewritten Aggregate preserves the original output exprIds (parents
  * of the Aggregate are untouched), regroups the MV on its key columns,
  * and casts any re-aggregated result back to the original type (e.g.
  * SUM over decimal(24,2) partials widens to decimal(34,2); the cast
  * back to (24,2) is exact for any value the original query could have
  * produced). A rewrite that cannot preserve semantics exactly does not
  * fire — the rule either returns an equivalent plan or the original.
  *
  * FP caveat, stated rather than hidden: for DOUBLE sums the rollup
  * re-associates the addition, so results can differ in the last ulp
  * from the direct scan — the standard MV-rewrite contract in every
  * engine. Exact types (long, decimal) are bit-identical.
  *
  * OPT-IN, twice over: the rule is inert until (a) an MV is registered
  * for the scanned base AND (b) the session sets
  * `spark.graft.mv.rewrite.enabled=true` (default FALSE — same contract
  * as Oracle's QUERY_REWRITE_ENABLED, and the same philosophy as the
  * LSH hint: a rewrite that changes which stored data a query reads
  * must be asked for, or registering one MV would silently re-route
  * every matching aggregate in the process — including benchmark scans
  * whose entire point is to measure the base-table plan).
  *
  * At 100 TB this is the difference between an aggregate dashboard query
  * costing a full-table scan and costing a scan of a keys-sized rollup:
  * the MV is smaller than the base by the group cardinality ratio, and
  * the IVM operators keep it fresh for O(churn) per refresh.
  */
object MvRewrite {
  /** The canonical measure-key text of an aggregated argument — the
    * contract key [[MvDef.measures]] is declared under and the shape
    * [[MvAdvisor]] harvests. A bare column is its name; a cast is
    * `name::castType`.
    */
  private[plans] def measureKey(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case Cast(a: AttributeReference, dt, _, _) =>
      Some(s"${a.name}::${dt.catalogString}")
    case _ => None
  }

  /** The catalog key of a planned parquet scan: a single root path reads
    * as itself (the plain-parquet MV contract), while a MULTI-FILE read
    * resolves to its Iceberg TABLE ROOT — but only when the file set is
    * exactly the current snapshot's live files
    * ([[graft.sources.IcebergSource.currentTableRoot]]), so a
    * time-travel or pruned read of the table never matches an MV vouched
    * against the current state. A single file that happens to be a
    * one-file Iceberg table's current snapshot resolves to the root too
    * (root registration beats file-path registration for Iceberg bases).
    */
  private[plans] def scanRoot(lr: LogicalRelation): Option[String] = {
    val roots = lr.relation match {
      case h: HadoopFsRelation => h.location.rootPaths.map(_.toUri.getPath)
      case _                   => return None
    }
    graft.sources.IcebergSource.currentTableRoot(roots)
      .orElse(if (roots.length == 1) Some(roots.head) else None)
  }
}

class MvRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private case object Bail extends Exception { override def fillInStackTrace(): Throwable = this }
  private def bail(): Nothing = throw Bail

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MvCatalog.isEmpty ||
      !conf.getConfString("spark.graft.mv.rewrite.enabled", "false").toBoolean) plan
    else plan.transformUp {
      case agg: Aggregate =>
        try rewrite(agg).orElse(rewriteJoin(agg)).getOrElse(agg)
        catch { case Bail => agg }
    }
  }

  /** Peel attribute-only Projects and Filters down to a single-root
    * parquet LogicalRelation, accumulating filter conjuncts. Any other
    * node shape means the subtree is not a plain base-table aggregate.
    */
  private def strip(
      p: LogicalPlan,
      conds: Seq[Expression]
  ): Option[(Seq[Expression], LogicalRelation)] = p match {
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      strip(c, conds)
    case Filter(cond, c) => strip(c, conds ++ splitConjuncts(cond))
    case lr: LogicalRelation => Some((conds, lr))
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  private def measureKey(e: Expression): Option[String] =
    MvRewrite.measureKey(e)

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (conds, lr) = strip(agg.child, Nil).getOrElse(return None)
    val root = MvRewrite.scanRoot(lr).getOrElse(return None)
    // COST-BASED candidate selection: try candidates smallest-stored
    // first (stable sort — unknown row counts sort last, registration
    // order breaks ties), take the first that derives the query EXACTLY.
    // Each attempt bails whole on any non-derivable shape, so among
    // matching candidates the minimum-rows one always answers — a large
    // fine-grained store registered earlier can no longer shadow a
    // smaller rollup that answers the same query cheaper.
    MvCatalog.lookup(root)
      .sortBy(_.rows.getOrElse(Long.MaxValue)).view
      .flatMap(d => attemptRollup(agg, conds, root, d))
      .headOption
  }

  private def attemptRollup(
      agg: Aggregate,
      conds: Seq[Expression],
      root: String,
      d: MvDef): Option[LogicalPlan] = {
    val keyNames = d.keys.toSet

    // grouping: bare key columns only
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if keyNames(a.name) => a
      case _                                         => return None
    }
    // filters: DETERMINISTIC, key-column references only. The determinism
    // check is load-bearing: a conjunct like rand() < 0.5 has EMPTY
    // references (vacuously key-only) but re-applying it on the MV
    // evaluates it once per GROUP instead of once per base row — a silent
    // semantics change (count(*) under a sampled filter), so it bails like
    // every other non-commuting shape.
    if (!conds.forall(c =>
        c.deterministic && c.references.forall(a => keyNames(a.name))))
      return None

    // fresh-exprId MV scan per rewrite site (file listing cached in the
    // catalog), so one MV answering two aggregates in one query never
    // collides
    val mvScan = MvCatalog.analyzedScan(spark, d.mvPath, d.mvSchema)
    val mvAttrByName = mvScan.output.map(a => a.name -> a).toMap
    def mvAttr(n: String): Attribute = mvAttrByName.getOrElse(n, bail())

    def measure(arg: Expression): MvMeasure =
      measureKey(arg).flatMap(d.measures.get).getOrElse(bail())

    def sumOf(col: String): Expression =
      new Sum(mvAttr(col)).toAggregateExpression()

    def rewriteAggFn(ae: AggregateExpression): Expression = {
      if (ae.filter.isDefined) bail()
      if (ae.isDistinct) {
        // DISTINCT over MV KEY columns only: the MV's grain is exactly
        // the distinct key combinations of live base rows, so a DISTINCT
        // aggregate whose every argument is a bare key column re-runs
        // VERBATIM on the keys-sized MV — at any coarser grouping, since
        // a finer grain preserves which (group, value) pairs exist. This
        // is the MULTIPLICITY-TABLE deployment: register the
        // [[graft.operators.IncrementalOps.refreshDistinct]] store
        // (GROUP BY keys..., v) as an MvDef with v among the keys, and
        // count(DISTINCT v) dashboards stop scanning the base. DISTINCT
        // over anything the MV no longer has row grain for bails.
        val remapped = (ae.aggregateFunction match {
          case f @ (_: Count | _: Sum | _: Average | _: Min | _: Max) => f
          case _ => bail()
        }).mapChildren {
          case a: AttributeReference if keyNames(a.name) => mvAttr(a.name)
          case _ => bail()
        }.asInstanceOf[AggregateFunction]
        // same function over the same-typed stored column: dataType is
        // unchanged by construction, so no castBack is needed
        return ae.copy(aggregateFunction = remapped)
      }
      val replaced: Expression = ae.aggregateFunction match {
        case Sum(c, _) => sumOf(measure(c).sum.getOrElse(bail()))
        case Min(c)    => new Min(mvAttr(measure(c).min.getOrElse(bail())))
          .toAggregateExpression()
        case Max(c)    => new Max(mvAttr(measure(c).max.getOrElse(bail())))
          .toAggregateExpression()
        case Count(Seq(Literal(v, _))) if v != null =>
          Coalesce(Seq(sumOf(d.countStar.getOrElse(bail())), Literal(0L)))
        case Count(Seq(c)) =>
          Coalesce(Seq(sumOf(measure(c).cnt.getOrElse(bail())), Literal(0L)))
        // approx_count_distinct over a KEY column re-runs on the MV
        // grain EXACTLY estimate-preserving — HLL++ registers are
        // duplicate-insensitive (each value hashes to the same register
        // update however many rows carry it), so the sketch built over
        // the distinct key combinations is bit-identical to the one
        // built over the base rows
        case h: HyperLogLogPlusPlus => h.child match {
          case a: AttributeReference if keyNames(a.name) =>
            h.copy(child = mvAttr(a.name)).toAggregateExpression()
          case _ => bail()
        }
        case Average(c, _) if ae.dataType == DoubleType =>
          val m = measure(c)
          new Divide(
            Cast(sumOf(m.sum.getOrElse(bail())), DoubleType),
            Cast(sumOf(m.cnt.getOrElse(bail())), DoubleType))
        case _ => bail()
      }
      if (replaced.dataType != ae.dataType) castBack(replaced, ae.dataType)
      else replaced
    }

    // re-aggregation widens exact types (SUM over decimal partials gains
    // 10 digits of precision; SUM over the bigint count column could in
    // principle widen too) — casting back to the original result type is
    // exact for any value the original aggregate could have produced.
    // Anything that would NARROW semantics (double -> decimal etc.) bails.
    def castBack(e: Expression, to: DataType): Expression = (e.dataType, to) match {
      case (f: DecimalType, t: DecimalType)
          if f.scale == t.scale && f.precision >= t.precision => Cast(e, to)
      case _ => bail()
    }

    def rewriteExpr(e: Expression): Expression = e match {
      case ae: AggregateExpression                   => rewriteAggFn(ae)
      case a: AttributeReference if keyNames(a.name) => mvAttr(a.name)
      case _: AttributeReference                     => bail()
      case other => other.mapChildren(rewriteExpr)
    }

    try {
      val newAggList: Seq[NamedExpression] = agg.aggregateExpressions.map {
        case a: AttributeReference if keyNames(a.name) =>
          Alias(mvAttr(a.name), a.name)(exprId = a.exprId)
        case al: Alias =>
          Alias(rewriteExpr(al.child), al.name)(
            exprId = al.exprId, qualifier = al.qualifier)
        case _ => bail()
      }
      val newChild =
        if (conds.isEmpty) mvScan
        else Filter(
          conds.map(c => c.transform {
            case a: AttributeReference => mvAttr(a.name)
          }).reduce(And(_, _)),
          mvScan)
      logWarning(
        s"MvRewrite: answering aggregate over $root from " +
          s"materialized view '${d.name}' (${d.mvPath})")
      Some(Aggregate(
        groupAttrs.map(a => mvAttr(a.name)), newAggList, newChild, None))
    } catch { case Bail => None }
  }

  /** The JOIN-VIEW rewrite: answer an aggregate over
    * `fact INNER JOIN dim ON <declared keys>` from a registered ROW-grain
    * join MV ([[JoinMvDef]]). Matched shape (Projects attribute-only,
    * Filters accumulate anywhere above the join or on either side — for
    * an inner join they commute):
    * {{{
    * Aggregate(G, A,
    *   [Project*|Filter*] Join(Inner, cond,
    *     [Project*|Filter*] LR(factPath), [Project*|Filter*] LR(dimPath)))
    * }}}
    * Eligibility:
    *  - the join condition contains EVERY declared key equality as a bare
    *    `factCol = dimCol` conjunct (a subset join would need rows the MV
    *    never stored); leftover conjuncts re-apply as filters on the MV;
    *  - every filter conjunct is deterministic and references only
    *    columns resolvable to the MV (ANY stored column, not just keys —
    *    the MV holds the join at row grain, so row-level predicates
    *    commute);
    *  - grouping expressions are bare resolvable columns; aggregate
    *    expressions are deterministic with all references resolvable —
    *    and because the grain is identical, ANY aggregate recomputes
    *    exactly, including the DISTINCT shapes the rollup path refuses.
    * Name resolution is by column name against `mvSchema`; a name both
    * base sides expose resolves only when it is a same-named declared key
    * (the join equality makes the sides agree) — otherwise the stored
    * column's side is unknowable and the rewrite bails.
    */
  private def rewriteJoin(agg: Aggregate): Option[LogicalPlan] = {
    def stripToJoin(
        p: LogicalPlan,
        conds: Seq[Expression]
    ): Option[(Seq[Expression], Join)] = p match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        stripToJoin(c, conds)
      case Filter(cond, c) => stripToJoin(c, conds ++ splitConjuncts(cond))
      case jn: Join        => Some((conds, jn))
      case _               => None
    }
    val (aboveConds, jn) = stripToJoin(agg.child, Nil).getOrElse(return None)
    if (jn.joinType != Inner) return None
    val (lConds, lLr) = strip(jn.left, Nil).getOrElse(return None)
    val (rConds, rLr) = strip(jn.right, Nil).getOrElse(return None)
    val lPath = MvRewrite.scanRoot(lLr).getOrElse(return None)
    val rPath = MvRewrite.scanRoot(rLr).getOrElse(return None)
    // candidates from both orientations, smallest stored view first
    // (same cost rule as the rollup path); first exact derivation wins
    val candidates =
      (MvCatalog.lookupJoin(lPath, rPath).map(d => (d, lLr, rLr)) ++
        MvCatalog.lookupJoin(rPath, lPath).map(d => (d, rLr, lLr)))
        .sortBy(_._1.rows.getOrElse(Long.MaxValue))
    candidates.view.flatMap { case (d, f, dm) =>
      attemptJoin(agg, aboveConds ++ lConds ++ rConds, jn, d, f, dm)
    }.headOption
  }

  private def attemptJoin(
      agg: Aggregate,
      filterConds: Seq[Expression],
      jn: Join,
      d: JoinMvDef,
      factLr: LogicalRelation,
      dimLr: LogicalRelation): Option[LogicalPlan] = {
    val factIds = factLr.output.map(_.exprId).toSet
    val dimIds = dimLr.output.map(_.exprId).toSet
    val factNames = factLr.output.map(_.name).toSet
    val dimNames = dimLr.output.map(_.name).toSet

    // join condition: consume the declared key equalities; anything left
    // over is an ordinary inner-join predicate and re-applies as a filter
    val declared = d.joinKeys.toSet
    var found = Set.empty[(String, String)]
    val residual = jn.condition.map(splitConjuncts).getOrElse(return None)
      .filter {
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          val pair =
            if (factIds(a.exprId) && dimIds(b.exprId)) Some((a.name, b.name))
            else if (factIds(b.exprId) && dimIds(a.exprId))
              Some((b.name, a.name))
            else None
          pair match {
            case Some(p) if declared(p) => found += p; false
            case _                      => true
          }
        case _ => true
      }
    if (found != declared) return None

    val allConds = filterConds ++ residual
    if (!allConds.forall(_.deterministic)) return None
    if (!agg.aggregateExpressions.forall(_.deterministic)) return None

    val mvScan = MvCatalog.analyzedScan(spark, d.mvPath, d.mvSchema)
    val mvAttrByName = mvScan.output.map(a => a.name -> a).toMap
    val sameNamedKeys = d.joinKeys.collect { case (f, g) if f == g => f }.toSet
    def resolve(a: AttributeReference): Attribute = {
      if (!factIds(a.exprId) && !dimIds(a.exprId)) bail()
      if (factNames(a.name) && dimNames(a.name) && !sameNamedKeys(a.name))
        bail()
      mvAttrByName.getOrElse(a.name, bail())
    }
    def remap(e: Expression): Expression = e match {
      case a: AttributeReference => resolve(a)
      case other                 => other.mapChildren(remap)
    }
    try {
      val groupExprs = agg.groupingExpressions.map {
        case a: AttributeReference => resolve(a)
        case _                     => bail()
      }
      val newAggList: Seq[NamedExpression] = agg.aggregateExpressions.map {
        case a: AttributeReference =>
          Alias(resolve(a), a.name)(exprId = a.exprId)
        case al: Alias =>
          Alias(remap(al.child), al.name)(
            exprId = al.exprId, qualifier = al.qualifier)
        case _ => bail()
      }
      val mapped = allConds.map(remap)
      val newChild =
        if (mapped.isEmpty) mvScan
        else Filter(mapped.reduce(And(_, _)), mvScan)
      logWarning(
        s"MvRewrite: answering join aggregate over (${d.factPath} ⋈ " +
          s"${d.dimPath}) from join view '${d.name}' (${d.mvPath})")
      Some(Aggregate(groupExprs, newAggList, newChild, None))
    } catch { case Bail => None }
  }
}
