package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Pre-aggregation below grouping-sets expansion (CUBE / ROLLUP /
  * GROUPING SETS).
  *
  * Spark plans `GROUP BY CUBE(a, b)` as `Aggregate(Expand(child))`: the
  * Expand node REPLICATES every input row once per grouping set (4x for a
  * two-dimension cube, 2^n in general) before any aggregation happens, so
  * the hash-aggregate above it probes its table |input| x |sets| times.
  * At 100 TB that replication is the whole cost of the query — yet for
  * DISTRIBUTIVE aggregate functions (Gray et al., "Data Cube: A
  * Relational Aggregation Operator", ICDE 1996: sum/count/min/max, plus
  * ALGEBRAIC avg = sum/count) every coarser grouping set is computable
  * from the FINEST grain alone. This rule inserts that finest-grain
  * aggregate below the Expand:
  *
  *   Aggregate_sets(Expand(child))
  *     ==>  Aggregate_sets'(Expand'(Aggregate_grain(child)))
  *
  * where Aggregate_grain groups by the union of all grouping-set
  * dimensions and emits one partial per aggregate (sum -> sum, count ->
  * count, min/max -> min/max, avg -> (sum, count)), and Aggregate_sets'
  * re-aggregates the partials (sum of sums, sum of counts, min of mins,
  * ...). Expand now replicates |distinct grain| rows instead of |input| —
  * for the dashboard cubes this targets (low-cardinality dimensions) that
  * is the difference between expanding a trillion rows x 2^n and
  * expanding a few thousand.
  *
  * The rewrite is EXACT (same rows, same types, same nullability), not
  * approximate: each input row lands in exactly one finest-grain group,
  * and each finest-grain group lands in exactly one output group per
  * grouping set, so re-aggregating partials computes the identical value
  * — including NULL dimension values in the data, which stay distinct
  * grouping keys at both levels and remain distinguishable from
  * grouping-set nulls via `spark_grouping_id` exactly as before. The one
  * caveat is the one every distributed engine carries: float/double sums
  * REASSOCIATE, so the last ulp can differ — the same nondeterminism
  * Spark's own partial aggregation and any repartition already exhibit;
  * integral, decimal, min/max and count results are bit-identical.
  *
  * Cost: the pre-aggregate adds one exchange (its own partial/final
  * pair). When the grain is small — the cube use case — both shuffles
  * move ~|grain| rows and the saved Expand work dominates. When the
  * grain is near |input| the rule still bounds Expand input at |input|
  * but pays one extra ~|input|-row shuffle. Since r19 harvested
  * [[StatsCatalog]] NDVs skip that adverse case automatically (one
  * analyzed scan + grain NDV proven above
  * `spark.graft.optimizer.preAggExpand.maxGrainRatio` of the rows →
  * keep the stock plan; no statistics → fire, unchanged); the manual
  * kill switch `spark.graft.optimizer.preAggExpand=false` remains for
  * un-analyzed workloads.
  *
  * Reference context: the reference engine delegates grouping sets to its
  * SQL backend with no equivalent rewrite (crates/engine/src/lib.rs:54-57
  * hands the whole query string over); this is a graft-value scale
  * addition in the same family as its roadmap's "pre-computed rollups"
  * aspiration (roadmap.md).
  *
  * Safety gates — the rule bails to the original plan unless ALL hold:
  *  - the Expand is a grouping-sets expand (`spark_grouping_id` output,
  *    literal gid per projection) — NOT the distinct-aggregate rewrite's
  *    Expand (that one's gid is named `gid` and is produced by a later
  *    optimizer batch anyway);
  *  - every output position classifies as passthrough (same attribute in
  *    every projection, child's exprId preserved) or dimension (attribute
  *    or null literal per set, fresh output exprId) — the shapes
  *    ResolveGroupingAnalytics emits;
  *  - at least one dimension (a dimensionless expand of an empty input
  *    must stay empty; a global pre-aggregate would fabricate a row);
  *  - every non-DISTINCT aggregate is a sum/count/min/max, or a
  *    legacy/ansi-mode avg over float/double/integral input (decimal
  *    avg's division typing is not worth replicating; try_avg bails);
  *    a deterministic FILTER reading only passthrough columns rides on
  *    the partial (r20 — it evaluates per base row below the Expand
  *    exactly as it did on each replica above, since replicas keep
  *    passthrough values intact); first/last, collect_*, UDAFs,
  *    percentile, and filters touching dimension copies all bail.
  *    DISTINCT aggregates are supported by GRAIN EXTENSION instead of
  *    decomposition: the finest grain grows by the distinct arguments'
  *    columns, grain rows then preserve the exact distinct value sets,
  *    and the aggregate re-runs verbatim above the Expand — count
  *    (distinct user) by cube(dims) pre-reduces to the distinct
  *    (dims, user) pairs, exactly the rows ANY exact distinct must
  *    shuffle, before the per-set replication and before
  *    RewriteDistinctAggregates adds its own expand downstream.
  *    FILTERed distincts ride the same path with the grain further
  *    extended by the predicate's columns — grain rows then preserve
  *    the exact (argument, predicate-column) combinations and the
  *    filter re-evaluates identically above the Expand (argument-less
  *    and non-deterministic-filter distincts bail);
  *  - the rebuilt aggregate output matches the original column-for-column
  *    in dataType AND nullability (checked, not assumed — a schema drift
  *    here would silently change downstream DataFrame schemas).
  *
  * Idempotence (the rule runs in the fixed-point operator-optimization
  * batch): a rebuilt Expand carries a TreeNodeTag the entry guard skips
  * (robust even when a LATER rule rewrites the pre-aggregate underneath
  * — MvRewrite routing the grain aggregate to a stored rollup MV is the
  * live case: the cube then answers entirely from the MV, and the tag
  * keeps this rule from stacking a second grain aggregate on the
  * rewritten child). A structural backstop also skips any Expand whose
  * child is already an Aggregate at the dimension grain — including
  * user plans that pre-aggregated by hand, where the rewrite could only
  * add overhead.
  */
class PreAggExpand(session: SparkSession) extends Rule[LogicalPlan] {

  import PreAggExpand._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.sessionState.conf
          .getConfString("spark.graft.optimizer.preAggExpand", "true")
          .toBoolean) {
      return plan
    }
    plan.transformUp {
      case agg @ Aggregate(_, _, expand: Expand, _) =>
        // a library rule must never turn a working query into a crash:
        // any unexpected shape this rule's gates missed degrades to the
        // original plan, loudly
        try rewrite(agg, expand).getOrElse(agg)
        catch {
          case scala.util.control.NonFatal(e) =>
            logWarning(
              s"PreAggExpand: unexpected failure, keeping the original " +
                s"plan (${e.getClass.getSimpleName}: ${e.getMessage})")
            agg
        }
    }
  }

  private def rewrite(agg: Aggregate, expand: Expand): Option[Aggregate] = {
    // idempotence guard 1: an Expand this rule already rebuilt is tagged
    // (tags survive makeCopy, so later rules rewriting the pre-aggregate
    // underneath — e.g. MvRewrite routing it to a stored rollup — don't
    // trick the rule into stacking a second grain aggregate)
    if (expand.getTagValue(PreAggExpand.Applied).isDefined) return None
    val shape = classify(expand).getOrElse(return None)
    if (shape.dims.isEmpty) return None

    val dimSrcIds = shape.dims.map(_.source.exprId).toSet
    // idempotence guard 2 (structural backstop, also skips user plans
    // already aggregated at the grain where the rewrite buys nothing)
    expand.child match {
      case a: Aggregate
          if a.groupingExpressions.forall {
            case ar: AttributeReference => dimSrcIds.contains(ar.exprId)
            case _ => false
          } =>
        return None
      case _ =>
    }

    val passByIdMap = shape.passthrough.map(a => a.exprId -> a).toMap
    val passIds = passByIdMap.keySet

    import AggDecompose.Decomposed
    // one partial set per distinct aggregate (keyed canonically, so
    // sum(x) referenced twice shares one partial column). DISTINCT
    // aggregates take the verbatim path instead: the grain is EXTENDED
    // by their argument columns, so grain rows preserve the exact
    // distinct value sets and the aggregate re-runs unchanged above the
    // Expand — over |dims x distinct-args| rows, which is exactly the
    // pair set any exact distinct computation must shuffle anyway,
    // reduced BEFORE the per-set replication (and before
    // RewriteDistinctAggregates adds its own expand downstream).
    val partialByAgg =
      scala.collection.mutable.LinkedHashMap.empty[Expression, Decomposed]
    val verbatimRefs =
      scala.collection.mutable.LinkedHashMap.empty[ExprId, Attribute]
    var ok = true
    agg.aggregateExpressions.foreach(_.foreach {
      case ae: AggregateExpression if ok =>
        if (!partialByAgg.contains(ae.canonicalized)) {
          if (ae.isDistinct) {
            // FILTERed distincts ride the same grain extension: the
            // grain grows by the predicate's columns too, so grain rows
            // preserve the exact (argument, predicate-column) value
            // combinations — the filter then selects the identical
            // distinct sets above the Expand (it reads only passthrough
            // columns, i.e. original row values, never set-nulls)
            val refs = (ae.aggregateFunction.references ++
              ae.filter.map(_.references).getOrElse(AttributeSet.empty)).toSeq
            if (ae.filter.forall(_.deterministic) &&
                ae.aggregateFunction.references.nonEmpty &&
                refs.forall(a => passIds.contains(a.exprId))) {
              refs.foreach(a =>
                verbatimRefs.getOrElseUpdate(a.exprId, passByIdMap(a.exprId)))
              partialByAgg.put(ae.canonicalized, Decomposed(Nil, ae))
            } else ok = false
          } else {
            // arguments must read only passthrough columns (original row
            // values); anything touching the nulled dimension copies or
            // the grouping id has per-set semantics a grain
            // pre-aggregate cannot reproduce
            AggDecompose.decompose(ae, passIds) match {
              case Some(d) => partialByAgg.put(ae.canonicalized, d)
              case None => ok = false
            }
          }
        }
      case _ =>
    })
    if (!ok) return None

    // grain = dimension sources, extended by the distinct-aggregate
    // argument columns (dedup'd by exprId, dims first)
    val grainAttrs: Seq[Attribute] = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[ExprId]
      (shape.dims.map(_.source) ++ verbatimRefs.values).flatMap { a =>
        if (seen.add(a.exprId)) Some(a) else None
      }
    }
    // stats-aware adverse-case skip (r19): the rule stays default-ON
    // (bounded overhead, no statistics needed), but when the input is
    // ONE analyzed scan whose harvested NDVs PROVE the grain near the
    // row count, the rewrite buys almost no Expand reduction for a full
    // extra exchange — the measured adverse case the kill switch existed
    // for, now skipped automatically. Unknown stats → fire, unchanged.
    if (!StatsCatalog.isEmpty &&
        !StatsCatalog.preAggExpandWorthwhile(session, expand.child, grainAttrs))
      return None

    val partialAliases = partialByAgg.values.flatMap(_.partials).toSeq
    val preAgg = Aggregate(
      grainAttrs,
      grainAttrs ++ partialAliases,
      expand.child
    )

    // passthrough block: partials + the verbatim aggregates' argument
    // columns (all preAgg outputs, ids preserved)
    val partialAttrs = partialAliases.map(_.toAttribute)
    val passBlock = partialAttrs ++ verbatimRefs.values
    val newProjections = expand.projections.map { proj =>
      passBlock ++ shape.dims.map(d => proj(d.pos)) :+ proj(shape.gidPos)
    }
    val newOutput =
      passBlock ++ shape.dims.map(_.out) :+ expand.output(shape.gidPos)
    val newExpand = Expand(newProjections, newOutput, preAgg)
    newExpand.setTagValue(PreAggExpand.Applied, ())

    val newAggExprs = agg.aggregateExpressions.map { ne =>
      ne.transformUp {
        case ae: AggregateExpression =>
          partialByAgg.get(ae.canonicalized).map(_.reAgg).getOrElse(ae)
      }.asInstanceOf[NamedExpression]
    }

    val rebuilt = agg.copy(aggregateExpressions = newAggExprs, child = newExpand)
    // exactness gates: identical visible schema, nothing dangling
    val schemaStable = agg.aggregateExpressions.zip(newAggExprs).forall {
      case (o, n) =>
        o.dataType == n.dataType && o.nullable == n.nullable &&
          o.exprId == n.exprId
    }
    if (!schemaStable) return None
    if (!rebuilt.references.subsetOf(newExpand.outputSet)) return None
    logInfo(
      s"PreAggExpand: pre-aggregating ${expand.projections.size} grouping " +
        s"sets at grain [${grainAttrs.map(_.name).mkString(", ")}] below Expand")
    Some(rebuilt)
  }

  /** Classify a grouping-sets Expand's output positions. */
  private def classify(expand: Expand): Option[ExpandShape] = {
    val out = expand.output
    val projs = expand.projections
    if (out.isEmpty || projs.isEmpty) return None
    if (projs.exists(_.length != out.length)) return None
    val gidPos = out.length - 1
    if (out(gidPos).name != VirtualColumn.groupingIdName) return None
    if (!projs.forall(_(gidPos).isInstanceOf[Literal])) return None

    val passthrough = Seq.newBuilder[Attribute]
    val dims = Seq.newBuilder[DimPos]
    var pos = 0
    while (pos < gidPos) {
      val cells = projs.map(_(pos))
      val attrs = cells.collect { case a: Attribute => a }
      val nulls = cells.collect { case l: Literal if l.value == null => l }
      if (attrs.size + nulls.size != cells.size) return None
      val srcIds = attrs.map(_.exprId).distinct
      if (srcIds.size != 1) return None
      val src = attrs.head
      if (nulls.isEmpty && out(pos).exprId == src.exprId) {
        passthrough += out(pos)
      } else if (out(pos).exprId != src.exprId) {
        dims += DimPos(pos, src, out(pos))
      } else {
        return None
      }
      pos += 1
    }
    Some(ExpandShape(passthrough.result(), dims.result(), gidPos))
  }
}

object PreAggExpand {
  /** Marks an Expand whose child this rule already pre-aggregated. */
  private[plans] val Applied =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit]("graft.preAggExpand")

  /** Dimension output position: `source` is the child-side attribute the
    * non-null projections carry, `out` the Expand's (nulled-per-set)
    * output attribute.
    */
  private final case class DimPos(pos: Int, source: Attribute, out: Attribute)

  private final case class ExpandShape(
      passthrough: Seq[Attribute],
      dims: Seq[DimPos],
      gidPos: Int
  )

}
