package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._

/** Shared aggregate-decomposition algebra for the two pre-aggregation
  * rules ([[PreAggExpand]] below grouping-sets expansion, [[EagerAggJoin]]
  * below joins): split one aggregate into finest-grain PARTIALS plus the
  * RE-AGGREGATION that combines partial rows into exactly the original
  * value — the distributive/algebraic function classification of Gray et
  * al. (Data Cube, ICDE 1996). sum -> sum of sums (decimal re-sum cast
  * back to the original type), count -> sum of counts kept never-null via
  * coalesce, min/max -> min/max, avg -> sum/count carried in Spark's own
  * double buffer type. Holistic functions (percentile, collect_*,
  * first/last, UDAFs) and filtered/distinct aggregates return None — the
  * callers have their own stricter or alternative handling for those.
  */
private[plans] object AggDecompose {

  /** `partials` run at the finest grain; `reAgg` combines partial rows
    * above it, producing exactly the original aggregate's type.
    */
  final case class Decomposed(partials: Seq[Alias], reAgg: Expression)

  /** Decompose one aggregate; `allowed` is the set of column ids the
    * aggregate's arguments may read (the caller's definition of "row
    * values available at the grain"). None = not decomposable.
    *
    * A deterministic FILTER whose references all live at the grain rides
    * on the PARTIALS (r20): the predicate evaluates per input row below
    * the re-aggregation exactly as it did in the original aggregate (the
    * partial's input rows are the same rows the original read — Expand
    * replication and join multiplicity both happen ABOVE the grain), and
    * the re-aggregation combines the already-filtered partials
    * unfiltered. Callers whose partial input can contain EXTRA rows the
    * original never evaluated (EagerAggJoin's dropped-by-the-join fact
    * rows under ANSI) must gate the filter's raising behavior themselves.
    * Filters reading columns outside `allowed` return None.
    */
  def decompose(
      ae: AggregateExpression,
      allowed: Set[ExprId]
  ): Option[Decomposed] = {
    if (ae.isDistinct) return None
    if (!ae.filter.forall(f => f.deterministic &&
        f.references.forall(a => allowed.contains(a.exprId)))) return None
    if (!ae.aggregateFunction.references.forall(a => allowed.contains(a.exprId)))
      return None
    def alias(e: Expression, n: String): Alias = Alias(e, n)()
    def partial(f: AggregateFunction): AggregateExpression =
      AggregateExpression(f, Complete, ae.isDistinct, filter = ae.filter)
    def complete(f: AggregateFunction): AggregateExpression =
      AggregateExpression(f, Complete, isDistinct = false)
    def castTo(e: Expression, dt: DataType): Expression =
      if (e.dataType == dt) e else Cast(e, dt)
    val n = s"_preagg_${ae.resultId.id}"
    ae.aggregateFunction match {
      case s @ Sum(_, ctx) if sumDecomposable(s.child.dataType, ctx.evalMode) =>
        val p = alias(partial(s), n)
        val re = complete(Sum(p.toAttribute, ctx))
        Some(Decomposed(Seq(p), castTo(re, s.dataType)))
      case c: Count =>
        val p = alias(partial(c), n)
        // count never returns null; sum-of-counts must not either
        val re = Coalesce(Seq(complete(Sum(p.toAttribute)), Literal(0L)))
        Some(Decomposed(Seq(p), castTo(re, c.dataType)))
      case m: Min =>
        val p = alias(partial(m), n)
        Some(Decomposed(Seq(p), complete(Min(p.toAttribute))))
      case m: Max =>
        val p = alias(partial(m), n)
        Some(Decomposed(Seq(p), complete(Max(p.toAttribute))))
      case a @ Average(child, evalMode)
          if (evalMode == EvalMode.LEGACY || evalMode == EvalMode.ANSI) &&
            avgDecomposable(child.dataType) =>
        // algebraic: avg = sum(partial sums) / sum(partial counts), in the
        // same double buffer type Spark's own Average accumulates in.
        // LEGACY and ANSI agree on double arithmetic (no overflow checks
        // on doubles; the divisor is zero only when the numerator is
        // already null, so ANSI division cannot raise); TRY mode bails
        val pSum =
          alias(partial(Sum(castTo(child, DoubleType))), s"${n}_s")
        val pCnt = alias(partial(Count(Seq(child))), s"${n}_c")
        val re = Divide(
          complete(Sum(pSum.toAttribute)),
          castTo(complete(Sum(pCnt.toAttribute)), DoubleType)
        )
        Some(Decomposed(Seq(pSum, pCnt), castTo(re, a.dataType)))
      case _ => None
    }
  }

  /** The DIM-side half of Yan & Larson's eager-aggregation algebra
    * ([[EagerAggJoin]]): rewrite an aggregate over un-pre-aggregated dim
    * columns into its multiplicity-weighted form, where `weight` is the
    * fact pre-aggregate's per-grain row count. Each grain row joins
    * exactly the dim rows its `weight` fact rows would have, so over the
    * join output
    *
    *   sum(x)   == sum(x * w)
    *   count(x) == sum(CASE WHEN x IS NOT NULL THEN w ELSE 0 END)
    *   avg(x)   == sum(x*w) / sum(CASE WHEN x IS NOT NULL THEN w ELSE 0 END)
    *
    * Weighted sums stay exact per eval mode — LongType products for
    * LEGACY integral inputs (wraparound is modular, and modular
    * multiplication IS repeated modular addition, so legacy stays
    * bit-exact), an exact decimal(38,0) product buffer for ANSI
    * integrals (a long product could raise on per-grain magnitudes
    * vanilla's row-ordered accumulation never reaches — the decimal
    * buffer raises only on a TRUE total overflow, so a succeeding ANSI
    * query can never turn into an error), DoubleType for float/double
    * (the usual reassociation ulp), and for decimal(p<=17,s) the exact
    * decimal product — bit-identical to the naive plan.
    *
    * REFUSAL BOUNDS (r21, made explicit): (1) decimal p>17 bails because
    * the weight must be typed decimal(20,0) to hold any long count, and
    * decimal(p,s) x decimal(20,0) lands in decimal(p+21,s) — past
    * p=17 that exceeds 38 and Spark's precision-loss typing ROUNDS the
    * product, breaking bit-equality. The bound is the weight's 20
    * digits, not the data: a proven per-grain row-count ceiling (e.g.
    * the fact footer rows, as in UnscaledDecimalSums) of d digits would
    * admit p <= 37-d exactly — left unimplemented because no registered
    * workload sums decimals wider than 17 under a join today. (2)
    * decimal AVG bails in every mode: vanilla's Average(decimal(p,s))
    * divides in its own result typing (p+4 scale bump), while the
    * decomposed sum(x*w)/sum(w) divides decimal(p+21,s) by long — Spark
    * types that division differently and the HALF_UP landing can differ
    * in the last digit; no cast sequence reproduces vanilla's rounding
    * point exactly. (3) TRY-mode sums bail (null-on-overflow would
    * mis-skip). Returns the RE-AGGREGATION
    * expression (no new
    * partials — the caller plants the shared weight column once);
    * min/max/distinct never come here (they ride verbatim), filtered
    * and holistic aggregates return None.
    */
  def decomposeWeighted(
      ae: AggregateExpression,
      weight: Attribute
  ): Option[Expression] = {
    if (ae.isDistinct) return None
    // a FILTER rides onto the weighted re-aggregation verbatim (r20):
    // the predicate evaluates per (grain x dim) join row, where it holds
    // for either ALL w collapsed fact rows or none — the CALLER
    // guarantees that by joining the predicate's fact-side columns into
    // the grain (EagerAggJoin's grain extension; dim-side references
    // pass through the join untouched). sum(x) FILTER p == sum(x*w)
    // FILTER p under that contract; count and avg follow the same way.
    if (!ae.filter.forall(_.deterministic)) return None
    def complete(f: AggregateFunction): AggregateExpression =
      AggregateExpression(f, Complete, isDistinct = false, filter = ae.filter)
    def castTo(e: Expression, dt: DataType): Expression =
      if (e.dataType == dt) e else Cast(e, dt)
    def nonNullWeight(guard: Expression): Expression =
      If(guard, weight, Literal(0L))
    ae.aggregateFunction match {
      case s @ Sum(child, ctx) =>
        child.dataType match {
          case ByteType | ShortType | IntegerType | LongType
              if ctx.evalMode == EvalMode.LEGACY =>
            // LEGACY long arithmetic is provably bit-exact: wraparound
            // is modular, and modular multiplication IS repeated modular
            // addition, so sum(x*w) mod 2^64 equals the row-by-row sum
            val prod = Multiply(castTo(child, LongType), weight)
            Some(castTo(complete(Sum(prod, ctx)), s.dataType))
          case ByteType | ShortType | IntegerType | LongType
              if ctx.evalMode == EvalMode.ANSI =>
            // ANSI cannot take the long product: Multiply(x: long, w)
            // can overflow on a per-grain PRODUCT (x=2^61, w=8) in a
            // group whose mixed-sign row-by-row accumulation never
            // overflowed in the order vanilla actually ran — the rewrite
            // would turn a succeeding query into a runtime error. So the
            // product runs in an exact decimal buffer instead:
            // decimal(20,0) x decimal(20,0) -> decimal(38,0), which
            // holds ANY long*long product (< 2^126 ~ 8.5e37 < 1e38), so
            // the multiply never raises; the decimal Sum raises only
            // past 38 digits (where every vanilla ordering overflows
            // long too), and the final ANSI cast back to long raises
            // exactly and only on a TRUE total overflow.
            val prod = Multiply(
              castTo(child, DecimalType(20, 0)),
              castTo(weight, DecimalType(20, 0)))
            Some(castTo(complete(Sum(prod, ctx)), s.dataType))
          case FloatType | DoubleType =>
            val prod =
              Multiply(castTo(child, DoubleType), castTo(weight, DoubleType))
            Some(castTo(complete(Sum(prod, ctx)), s.dataType))
          case dt: DecimalType
              if dt.precision + 20 + 1 <= 38 && ctx.evalMode != EvalMode.TRY =>
            // the product decimal(p,s) x decimal(20,0) lands in
            // decimal(p+21,s) — EXACT when p <= 17, so unlike the
            // float path this is bit-identical to the naive plan. No
            // partial-null-skipping hazard either (the one that gates
            // plain decimal decomposition to ANSI): the single Sum runs
            // above the join, so a legacy overflow nulls the whole
            // group exactly as vanilla's CheckOverflowInSum does, and
            // the final cast back to sum(decimal(p,s))'s own type
            // restores vanilla's (earlier) overflow point
            val prod = Multiply(child, castTo(weight, DecimalType(20, 0)))
            Some(castTo(complete(Sum(prod, ctx)), s.dataType))
          case _ => None
        }
      case c: Count =>
        val guards = c.children.filterNot(_.foldable)
          .map(IsNotNull(_): Expression)
        val term = guards.reduceOption(And)
          .map(nonNullWeight).getOrElse(weight)
        val re = Coalesce(Seq(complete(Sum(term)), Literal(0L)))
        Some(castTo(re, c.dataType))
      case a @ Average(child, evalMode)
          if (evalMode == EvalMode.LEGACY || evalMode == EvalMode.ANSI) &&
            avgDecomposable(child.dataType) =>
        // numerator null (no non-null x in the group) short-circuits the
        // Divide to null before any zero-divisor check, matching
        // vanilla avg's empty-input null
        val num = complete(Sum(
          Multiply(castTo(child, DoubleType), castTo(weight, DoubleType))))
        val den = complete(Sum(nonNullWeight(IsNotNull(child))))
        Some(castTo(Divide(num, castTo(den, DoubleType)), a.dataType))
      case _ => None
    }
  }

  private def avgDecomposable(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => true
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Sum decomposition must preserve overflow semantics, which depend on
    * the eval mode AND the input type:
    *  - decimal: a grain-level partial that overflows decimal(p+10) under
    *    LEGACY evaluates to NULL (CheckOverflowInSum nullOnOverflow) and
    *    the re-sum would SKIP it as "no input", returning a wrong non-null
    *    total where vanilla Spark returns NULL for the group — so decimal
    *    sums decompose only under ANSI, where the partial THROWS exactly
    *    as vanilla's own partial aggregation does;
    *  - integral under TRY: same null-on-overflow trap as legacy decimal;
    *    integral under LEGACY is safe (wraparound is modular, and modular
    *    addition reassociates: sum-of-partial-sums mod 2^64 equals the
    *    row-by-row sum), under ANSI both levels throw;
    *  - float/double never null/throw on magnitude (they saturate to
    *    Infinity identically at both levels).
    */
  private def sumDecomposable(dt: DataType, mode: EvalMode.Value): Boolean =
    dt match {
      case _: DecimalType => mode == EvalMode.ANSI
      case ByteType | ShortType | IntegerType | LongType =>
        mode != EvalMode.TRY
      case _ => true
    }
}
