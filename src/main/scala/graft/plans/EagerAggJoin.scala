package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Eager aggregation: push a partial aggregate BELOW an inner equi-join
  * (Yan & Larson, "Eager Aggregation and Lazy Aggregation", VLDB 1995 —
  * the group-by/join reordering Spark's optimizer does not perform).
  *
  *   Aggregate_G(Join(fact, dim))
  *     ==>  Aggregate_G'(Join(Aggregate_grain(fact), dim))
  *
  * where grain = (fact join keys) u (fact columns the group-by reads).
  * The join then processes |distinct grain| fact rows instead of |fact|
  * — for the warehouse shape this targets (measures on a big fact,
  * grouped by dimension attributes) that shrinks the join's shuffle from
  * the fact's row count to its key cardinality. At 100 TB the join
  * shuffle IS the query; this is the single biggest reducer of it.
  *
  * Exactness is the subtle part, and it comes from NOT pre-aggregating
  * the dim side: every grain row joins exactly as many dim rows as each
  * of its fact rows would have (they share the join key), so re-
  * aggregating the partials OVER THE JOIN OUTPUT weights join
  * multiplicity automatically — sum(partial_sum) over joined rows counts
  * each partial once per matching dim row, exactly the duplication the
  * original per-row join produced. Fact rows whose key matches nothing
  * (or is NULL) drop with their grain row just as they dropped
  * row-by-row. Aggregates on the DIM side ride verbatim when join
  * multiplicity cannot change them (min/max, DISTINCT) and otherwise as
  * multiplicity-WEIGHTED re-aggregations over the fact pre-aggregate's
  * per-grain row count w (Yan & Larson's full algebra, r19):
  * sum(x) == sum(x*w), count(x) == sum(if(x is not null, w, 0)),
  * avg(x) == their ratio — each grain row joins exactly the dim rows
  * its w fact rows would have ([[AggDecompose.decomposeWeighted]]).
  *
  * Safety gates — bail to the original plan unless ALL hold:
  *  - INNER join, condition a pure conjunction of attribute equalities
  *    — plain `=` or null-safe `<=>`, whose null-matching is exactly
  *    the grain's null group (outer joins null-extend per fact ROW,
  *    not per grain; non-equi conditions select per-row);
  *  - between Aggregate and Join only column-pruning Projects (a Filter
  *    there reads mixed-side per-row values);
  *  - every aggregate's arguments live wholly on one side: the
  *    pre-aggregated side decomposes via [[AggDecompose]] (sum/count/
  *    min/max/avg; a fact-side FILTER rides on the partial when its
  *    references are fact-side and, under ANSI, it cannot raise on the
  *    fact rows the join would have dropped; ref-less filtered counts
  *    fall back to the weighted path), the other
  *    side rides min/max verbatim and sum/count/avg weighted (decimal
  *    sums up to precision 17 multiply exactly — the decimal(p,s) x
  *    decimal(20,0) product must fit precision 38 to stay bit-exact, so
  *    wider ones and decimal avgs bail to the original plan, a
  *    documented bound rather than a rounding risk); dim-side FILTERs
  *    (r20) ride onto the weighted re-aggregation with fact-side
  *    predicate columns joining the grain, dim-side ones passing
  *    through — the predicate re-evaluates identically above the join;
  *    ref-less aggregates (count(*)) decompose on the pre-aggregated
  *    side. DISTINCT aggregates are multiplicity-insensitive
  *    (duplication cannot change a distinct value set), so they ride
  *    verbatim: on the dim side as-is, on the fact side by extending
  *    the grain with their argument columns (the PreAggExpand
  *    grain-extension argument — grain rows preserve the exact distinct
  *    value sets). FILTERed distincts ride the same way with fact-side
  *    predicate columns joining the grain (dim-side ones pass through
  *    the join), so the filter re-evaluates identically above it;
  *  - group-by expressions' fact-side references join the grain (the
  *    grain is then strictly finer, so regrouping above is exact);
  *  - the rebuilt aggregate matches the original column-for-column in
  *    dataType, nullability and exprId, and references nothing dangling
  *    — else the original plan returns.
  *
  * Which side pre-aggregates: the side carrying decomposable measures;
  * with measures on both sides the rule tries left-as-fact first and
  * falls back to the right (one side's measures may fail the weighting
  * gates). With only min/max + count(*) in play either side works; the
  * rule picks the left by convention.
  *
  * Arming (`spark.graft.optimizer.eagerAggJoin`, default `auto`):
  * unlike [[PreAggExpand]] — whose worst case is a bounded small
  * overhead — eager aggregation is only a win when the fact grain (join
  * keys + grouped fact columns) is materially smaller than the fact
  * itself, and a plain parquet scan carries no NDV statistics to decide
  * that. In `auto` mode the rule consults [[StatsCatalog]]'s harvested
  * row counts and per-column HLL NDVs and fires ONLY when the grain
  * NDV is a small fraction of the fact rows and the dim side is not
  * broadcast-sized — sessions without harvested statistics are
  * untouched (no stats, no fire), so the default costs nothing until a
  * table is analyzed. `true` forces the rewrite wherever the exactness
  * gates pass (the r18 per-session contract, still what the registered
  * oracle queries pin); `false` disables. The multi-way-star CASCADE
  * arms under `auto` too (r20): [[StatsCatalog.estimatePlan]] derives
  * cardinality THROUGH the level-1 rewrite — a planted pre-aggregate's
  * rows ~= its grain NDV, an inner equi-join's rows ~= |l|*|r|/max(key
  * NDVs) — so the level-2 gate decides from harvested statistics alone
  * (the r19 limit required the fact side to BE an analyzed scan; the
  * registered `q_join_eager_agg_cascade` pins the 2-level auto fire).
  * Idempotence: the rebuilt
  * Join carries a TreeNodeTag; a
  * structural backstop also skips joins whose fact side is already
  * aggregated at (or finer than) the grain.
  *
  * Reference context: the reference engine hands aggregate-over-join
  * queries verbatim to its SQL backend (crates/engine/src/lib.rs:54-57)
  * with no eager-aggregation rewrite; graft-value scale addition.
  */
class EagerAggJoin(session: SparkSession) extends Rule[LogicalPlan] {

  import AggDecompose.Decomposed

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mode = session.sessionState.conf
      .getConfString("spark.graft.optimizer.eagerAggJoin", "auto")
    if (mode == "false") return plan
    val statsGated = mode != "true" // "auto" (the default) and anything else
    // auto with nothing analyzed can never fire: skip the per-plan
    // analysis entirely so stats-less sessions pay the r18-default zero
    if (statsGated && StatsCatalog.isEmpty) return plan
    plan.transformUp {
      case agg @ Aggregate(_, _, child, _) =>
        try {
          unwrap(child, Nil) match {
            case Some((aliases, join)) =>
              rewrite(agg, aliases, join, statsGated).getOrElse(agg)
            case None => agg
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            logWarning(
              s"EagerAggJoin: unexpected failure, keeping the original " +
                s"plan (${e.getClass.getSimpleName}: ${e.getMessage})")
            agg
        }
    }
  }

  /** Unwrap Projects between Aggregate and Join. Column-pruning levels
    * pass freely; ONE level may carry Alias columns (the shape
    * PullOutGroupingExpressions leaves: derived grouping/measure columns
    * computed over the join output) — those are returned for the rewrite
    * to relocate to whichever join side their references live on.
    */
  private def unwrap(
      p: LogicalPlan, acc: Seq[Alias]): Option[(Seq[Alias], Join)] = p match {
    case Project(pl, c) =>
      val aliases = pl.collect { case a: Alias => a }
      val attrsOnly = pl.forall {
        case _: AttributeReference => true
        case _: Alias => true
        case _ => false
      }
      if (!attrsOnly) None
      else if (aliases.isEmpty) unwrap(c, acc)
      else if (acc.nonEmpty) None // two alias-bearing levels: out of scope
      else unwrap(c, aliases)
    case j: Join => Some((acc, j))
    case _ => None
  }

  private def rewrite(
      agg: Aggregate, aliases: Seq[Alias], join: Join,
      statsGated: Boolean): Option[Aggregate] = {
    if (join.joinType != Inner) return None
    if (join.getTagValue(EagerAggJoin.Applied).isDefined) return None
    val cond = join.condition.getOrElse(return None)

    val leftOut = join.left.outputSet
    val rightOut = join.right.outputSet
    // pure conjunction of cross-side attribute equalities. Null-safe
    // equality (<=>) is admissible too: the grain groups all null-keyed
    // fact rows into ONE row, which is exactly the set <=> treats as
    // equal — they all match the same dim rows, so the multiplicity
    // argument holds unchanged (and under plain =, the null grain row
    // matches nothing, as each of its fact rows would have)
    val conjuncts = splitConjunctivePredicates(cond)
    val keyPairs = conjuncts.map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if leftOut.contains(a) && rightOut.contains(b) => (a, b)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if leftOut.contains(a) && rightOut.contains(b) => (a, b)
      case EqualNullSafe(a: AttributeReference, b: AttributeReference)
          if leftOut.contains(a) && rightOut.contains(b) => (a, b)
      case EqualNullSafe(b: AttributeReference, a: AttributeReference)
          if leftOut.contains(a) && rightOut.contains(b) => (a, b)
      case _ => return None
    }

    // relocate derived columns (Project aliases over the join output) to
    // the side their references live on: each must be deterministic and
    // single-side; constants go with the left (computable anywhere)
    val leftAliases = Seq.newBuilder[Alias]
    val rightAliases = Seq.newBuilder[Alias]
    aliases.foreach { a =>
      if (!a.deterministic) return None
      if (a.references.subsetOf(leftOut)) leftAliases += a
      else if (a.references.subsetOf(rightOut)) rightAliases += a
      else return None
    }
    val (lAliases, rAliases) = (leftAliases.result(), rightAliases.result())
    val effLeft = AttributeSet(leftOut.toSeq ++ lAliases.map(_.toAttribute))
    val effRight = AttributeSet(rightOut.toSeq ++ rAliases.map(_.toAttribute))

    // classify every aggregate by side; decide the pre-aggregated side.
    // Side: Some(true)=left, Some(false)=right, None=ref-less (count(*));
    // a mixed-side argument bails the whole rewrite.
    val aggExprs = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    val sides: Seq[(AggregateExpression, Option[Boolean])] = aggExprs.map {
      ae =>
        val refs = ae.aggregateFunction.references
        if (refs.isEmpty) ae -> None
        else if (refs.subsetOf(effLeft)) ae -> Some(true)
        else if (refs.subsetOf(effRight)) ae -> Some(false)
        else return None // argument spans both sides: unsupported
    }
    val heavySides = sides.collect { case (ae, Some(s)) if heavy(ae) => s }.distinct
    // the pre-aggregated (fact) side is where decomposable measures live.
    // Measures on BOTH sides no longer bail (r19): the dim side's ride
    // as multiplicity-WEIGHTED re-aggregations over the fact
    // pre-aggregate's per-grain row count (Yan & Larson's full algebra,
    // [[AggDecompose.decomposeWeighted]]) — try left-as-fact first, then
    // right, in case only one assignment passes the weighting gates
    val candidates = heavySides match {
      case Seq(s) => Seq(s)
      case Seq()  => Seq(true)
      case _      => Seq(true, false)
    }
    candidates.view.flatMap { preLeft =>
      val (factOut, factAliases, dimAliases) =
        if (preLeft) (effLeft, lAliases, rAliases)
        else (effRight, rAliases, lAliases)
      attempt(agg, join, keyPairs, sides, factOut, factAliases, dimAliases,
        preLeft, statsGated)
    }.headOption
  }

  /** "heavy" = needs decomposition (multiplicity-sensitive, non-distinct):
    * those pick the pre-aggregated side. min/max are multiplicity-
    * insensitive; DISTINCT aggregates are multiplicity-insensitive too
    * (duplication cannot change a distinct value set), so both ride
    * verbatim on the dim side — and on the fact side distincts ride by
    * grain extension, exactly as in PreAggExpand.
    */
  private def heavy(ae: AggregateExpression): Boolean =
    !ae.isDistinct && (ae.aggregateFunction match {
      case _: Min | _: Max => false
      case _ => true
    })

  /** One rewrite attempt with a FIXED pre-aggregated (fact) side; None =
    * this side assignment fails a gate (the caller may try the other).
    */
  private def attempt(
      agg: Aggregate,
      join: Join,
      keyPairs: Seq[(AttributeReference, AttributeReference)],
      sides: Seq[(AggregateExpression, Option[Boolean])],
      factOut: AttributeSet,
      factAliases: Seq[Alias],
      dimAliases: Seq[Alias],
      preLeft: Boolean,
      statsGated: Boolean): Option[Aggregate] = {
    import AggDecompose.Decomposed
    val factPlan0 = if (preLeft) join.left else join.right
    // fact-side derived columns compute BELOW the pre-aggregate — on ALL
    // fact rows, including rows the inner join would have dropped. Under
    // ANSI mode an expression that only errors on dropped rows (a
    // division, an overflowing cast) would turn a previously-succeeding
    // query into a runtime error, so with ANSI on the relocation is
    // restricted to expressions that cannot raise; anything else bails
    // to the original plan. (Dim-side aliases recompute ABOVE the join
    // on exactly the surviving rows — no such restriction needed.)
    if (session.sessionState.conf.ansiEnabled &&
        !factAliases.forall(a => cannotRaise(a.child))) {
      return None
    }
    // the plain fact columns stay visible for measures and keys
    val factPlan =
      if (factAliases.isEmpty) factPlan0
      else Project(factPlan0.output ++ factAliases, factPlan0)
    val factKeys = keyPairs.map { case (l, r) => if (preLeft) l else r }
    val factIds = factOut.map(_.exprId).toSet

    // first pass: classify into fact-decomposed / fact-verbatim-distinct
    // (extends the grain) / dim-verbatim; collect grain extensions
    val partialByAgg =
      scala.collection.mutable.LinkedHashMap.empty[Expression, Decomposed]
    val grainExt =
      scala.collection.mutable.LinkedHashMap.empty[ExprId, Attribute]
    val factById = factOut.map(a => a.exprId -> a).toMap
    // the shared multiplicity weight for dim-side measures: one count(*)
    // partial at the grain, planted only when something needs it
    val weightAlias = Alias(
      AggregateExpression(Count(Seq(Literal(1))), Complete,
        isDistinct = false),
      "_preagg_w")()
    var weightUsed = false
    for ((ae, side) <- sides) {
      if (!partialByAgg.contains(ae.canonicalized)) {
        val onFact = side.forall(_ == preLeft) // ref-less goes to fact
        if (ae.isDistinct && side.isDefined) {
          // FILTERed distincts ride too: fact-side predicate columns
          // join the grain (grain rows then preserve the exact
          // (argument, predicate) value combinations), dim-side ones
          // pass through the join untouched — either way the filter
          // re-evaluates identically above the join, and distinct
          // ignores the multiplicity
          if (!ae.filter.forall(_.deterministic)) return None
          ae.filter.foreach(_.references.foreach { a =>
            if (factOut.contains(a)) {
              grainExt.getOrElseUpdate(a.exprId, factById(a.exprId))
            }
          })
          if (onFact) {
            // grain extension: grain rows then carry the exact distinct
            // value sets, and distinct ignores join multiplicity
            ae.aggregateFunction.references.foreach(a =>
              grainExt.getOrElseUpdate(a.exprId, factById(a.exprId)))
          }
          partialByAgg.put(ae.canonicalized, Decomposed(Nil, ae))
        } else if (onFact) {
          // a fact-side FILTER decomposes onto the partial (it evaluates
          // per fact row below the join exactly as it did above) — but
          // under ANSI the partial also sees rows the join would have
          // DROPPED, so a predicate that can raise there must bail,
          // exactly like relocated derived columns
          if (session.sessionState.conf.ansiEnabled &&
              !ae.filter.forall(cannotRaise)) return None
          AggDecompose.decompose(ae, factIds) match {
            case Some(d) => partialByAgg.put(ae.canonicalized, d)
            case None if side.isEmpty && ae.filter.isDefined =>
              // ref-less aggregate (count(*), or count(x) canonicalized
              // to count(1) over a non-nullable x) whose FILTER reads
              // dim or mixed columns: ride the WEIGHTED path instead —
              // count(*) FILTER p == sum(w) FILTER p above the join,
              // with fact-side predicate columns joining the grain
              if (!ae.filter.forall(_.deterministic)) return None
              ae.filter.foreach(_.references.foreach { a =>
                if (factOut.contains(a)) {
                  grainExt.getOrElseUpdate(a.exprId, factById(a.exprId))
                }
              })
              val re = AggDecompose
                .decomposeWeighted(ae, weightAlias.toAttribute)
                .getOrElse(return None)
              weightUsed = true
              partialByAgg.put(ae.canonicalized, Decomposed(Nil, re))
            case None => return None
          }
        } else {
          // dim side, non-distinct: min/max ride verbatim; sum/count/avg
          // re-aggregate WEIGHTED by the fact pre-aggregate's per-grain
          // row count w — each grain row joins exactly the dim rows its
          // w fact rows would have, so sum(x) == sum(x*w) over the join
          // output (Yan & Larson's dim-side algebra). A FILTER rides by
          // the same grain-extension argument as filtered distincts
          // (r20): fact-side predicate columns join the grain — the
          // predicate then evaluates identically for a grain row as it
          // did for each of its w fact rows — and dim-side ones pass
          // through the join, so the filter re-evaluates verbatim on
          // the weighted re-aggregation (decomposeWeighted carries it).
          if (!ae.filter.forall(_.deterministic)) return None
          ae.filter.foreach(_.references.foreach { a =>
            if (factOut.contains(a)) {
              grainExt.getOrElseUpdate(a.exprId, factById(a.exprId))
            }
          })
          if (!heavy(ae)) {
            partialByAgg.put(ae.canonicalized, Decomposed(Nil, ae))
          } else {
            val re = AggDecompose
              .decomposeWeighted(ae, weightAlias.toAttribute)
              .getOrElse(return None)
            weightUsed = true
            partialByAgg.put(ae.canonicalized, Decomposed(Nil, re))
          }
        }
      }
    }

    // grain: fact join keys + fact columns the group-by reads + distinct
    // extensions
    val grainAttrs: Seq[Attribute] = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[ExprId]
      val groupFactRefs = agg.groupingExpressions
        .flatMap(_.references.toSeq).filter(factOut.contains)
      (factKeys ++ groupFactRefs ++ grainExt.values).flatMap { a =>
        if (seen.add(a.exprId)) Some(a) else None
      }
    }
    val grainIds = grainAttrs.map(_.exprId).toSet
    // structural backstop: fact side already aggregated at or coarser
    // than the grain — seen THROUGH pruning Projects and Filters, which
    // the fixed-point batches interleave between the join and a planted
    // pre-aggregate (InferFiltersFromConstraints parks an isnotnull
    // filter above it before predicate pushdown sinks it to the scan;
    // without looking through, the hidden aggregate gets a redundant
    // second layer stacked on top). Skipping more often is always safe:
    // rows at-or-under an at-grain aggregate can only shrink further
    // through a Filter, so there is nothing left to pre-aggregate.
    def aggregatedAtGrain(p: LogicalPlan): Boolean = p match {
      case a: Aggregate =>
        a.groupingExpressions.forall {
          case ar: AttributeReference => grainIds.contains(ar.exprId)
          case _ => false
        }
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        aggregatedAtGrain(c)
      case Filter(_, c) => aggregatedAtGrain(c)
      case _ => false
    }
    if (aggregatedAtGrain(factPlan0)) return None

    // auto mode (the default): fire only when harvested statistics say
    // the grain materially shrinks the fact AND the dim side is not
    // broadcast-sized ([[StatsCatalog.shouldEagerAgg]]) — the cost
    // decision the reference delegates to its backend's CBO. Forced
    // mode ("true") skips the gate, unchanged per-session contract.
    if (statsGated && !StatsCatalog.shouldEagerAgg(
        session, factPlan0, grainAttrs,
        if (preLeft) join.right else join.left)) {
      return None
    }

    val partialAliases = partialByAgg.values.flatMap(_.partials).toSeq ++
      (if (weightUsed) Seq(weightAlias) else Nil)
    val preAgg = Aggregate(grainAttrs, grainAttrs ++ partialAliases, factPlan)
    val newJoin =
      if (preLeft) join.copy(left = preAgg) else join.copy(right = preAgg)
    newJoin.setTagValue(EagerAggJoin.Applied, ())
    // dim-side derived columns recompute above the join (their inputs
    // pass through it unchanged)
    val joinChild: LogicalPlan =
      if (dimAliases.isEmpty) newJoin
      else Project(newJoin.output ++ dimAliases, newJoin)

    val newAggExprs = agg.aggregateExpressions.map { ne =>
      ne.transformUp {
        case ae: AggregateExpression =>
          partialByAgg.get(ae.canonicalized).map(_.reAgg).getOrElse(ae)
      }.asInstanceOf[NamedExpression]
    }
    val rebuilt = agg.copy(aggregateExpressions = newAggExprs, child = joinChild)
    val schemaStable = agg.aggregateExpressions.zip(newAggExprs).forall {
      case (o, n) =>
        o.dataType == n.dataType && o.nullable == n.nullable &&
          o.exprId == n.exprId
    }
    if (!schemaStable) return None
    if (!rebuilt.references.subsetOf(joinChild.outputSet)) return None
    logInfo(
      s"EagerAggJoin: pre-aggregating the ${if (preLeft) "left" else "right"} " +
        s"join side at grain [${grainAttrs.map(_.name).mkString(", ")}]")
    Some(rebuilt)
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }

  /** Conservative whitelist of expressions that cannot raise a runtime
    * error under ANSI mode on ANY input row — the admission test for
    * relocating a derived column below the pre-aggregate, where it will
    * see fact rows the join would have dropped. Covers the shapes
    * PullOutGroupingExpressions actually parks (date-part extraction,
    * string normalization, float/double arithmetic, conditionals);
    * everything unlisted — integer/decimal arithmetic (overflow),
    * division/remainder (zero), narrowing or string-parsing casts,
    * array/map indexing — is assumed able to raise and bails.
    */
  private def cannotRaise(e: Expression): Boolean = {
    import org.apache.spark.sql.types.{DoubleType, FloatType, StringType}
    val selfSafe = e match {
      case _: Attribute | _: Literal => true
      case _: IsNull | _: IsNotNull | _: Not | _: And | _: Or => true
      case _: EqualTo | _: EqualNullSafe | _: LessThan | _: LessThanOrEqual |
          _: GreaterThan | _: GreaterThanOrEqual | _: In | _: InSet => true
      case _: CaseWhen | _: If | _: Coalesce => true
      case _: Year | _: Month | _: DayOfMonth | _: Quarter | _: DayOfYear |
          _: WeekOfYear | _: Hour | _: Minute | _: Second | _: LastDay |
          _: DayOfWeek | _: WeekDay => true
      // literal-pattern string matching cannot raise (RLike stays out:
      // a malformed runtime pattern throws)
      case _: Like | _: StartsWith | _: EndsWith | _: Contains => true
      case _: Upper | _: Lower | _: Length | _: Substring | _: Concat |
          _: StringTrim | _: StringTrimLeft | _: StringTrimRight => true
      // float/double arithmetic saturates to Infinity, never raises;
      // integer/decimal overflow and ANY division can raise under ANSI
      case b @ (_: Add | _: Subtract | _: Multiply | _: UnaryMinus | _: Abs) =>
        b.dataType == DoubleType || b.dataType == FloatType
      // casts that parse (string source) or narrow (overflow) can raise;
      // numeric widening to float/double and anything-to-string cannot
      case c: Cast =>
        c.dataType == StringType ||
          ((c.dataType == DoubleType || c.dataType == FloatType) &&
            c.child.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      case _ => false
    }
    selfSafe && e.children.forall(cannotRaise)
  }
}

object EagerAggJoin {
  /** Marks a Join whose fact side this rule already pre-aggregated. */
  private[plans] val Applied =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit]("graft.eagerAggJoin")
}
