package graft.plans

import java.math.MathContext

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._

/** Wide-decimal SUM -> overflow-PROVEN unscaled-long SUM.
  *
  * Exact money math (the `QueryUtil.dec2` contract: cast to decimal, sum
  * exactly, cast to double once at the end) is the right answer for
  * cross-engine bit-equality, but it executes on Spark's slow path: a
  * `sum(decimal(14,2))` buffers in `decimal(24,2)`, and every row pays
  * BigDecimal allocation for the upscale/add (and for each decimal
  * multiply feeding it). Spark's own `DecimalAggregates` rule rewrites
  * sums to long arithmetic over `UnscaledValue`, but only when the input
  * precision proves overflow-freedom unconditionally (p + 10 digits must
  * fit a long, i.e. p <= 8) — TPC-H-shaped `decimal(14,2)` money columns
  * never qualify.
  *
  * This rule closes the gap with STATISTICS instead of types: parquet
  * footers carry per-column min/max and row counts (the same metadata
  * the scan planner reads — no data pass, no caching). From those it
  * derives a hard bound on the absolute unscaled value of the summed
  * expression per row, multiplies by the files' total row count (filters
  * below the aggregate only remove rows), and rewrites
  *
  *   sum(e: decimal(p, s))   [p + 10 > 18, so Spark's rule passed]
  *     ==>  MakeDecimal(sum(U(e)), min(38, p+10), s)
  *
  * only when `bound(e) * rows <= Long.MaxValue / 2` is PROVEN. U(e)
  * rebuilds e in unscaled-long space: casts keep their exact rounding
  * semantics and contribute `UnscaledValue(cast)`, decimal literals
  * become long literals, multiplies become long multiplies (unscaled
  * values multiply exactly; scales add), add/subtract align scales by a
  * power-of-ten factor. Every node's per-row bound is checked against
  * Long range, so no intermediate can wrap. The result is bit-identical
  * by construction — the decimal algebra is exact in both forms, and the
  * final MakeDecimal re-types the same integer to the same
  * DecimalType(min(38, p+10), s) the original Sum produced — while the
  * per-row work drops from BigDecimal allocate/add chains to codegen'd
  * long multiply-adds.
  *
  * At 100 TB the proof gets STRONGER, not weaker: bounds come from the
  * actual files' min/max, so a petabyte of rows simply fails the proof
  * when the sum could overflow (the rule declines; the exact decimal
  * path runs) and fires when it cannot. Guards, all structural:
  *  - the aggregate's child must be Project/Filter/Repartition chains
  *    over ONE parquet LogicalRelation (expands/unions can multiply
  *    rows — declined), possibly THROUGH inner equi-joins whose dim-side
  *    key is proven unique ([[KeyUniqueness]], r21): at most one dim row
  *    per fact row keeps output rows <= fact footer rows, so the same
  *    bound algebra carries through star joins (the summed columns must
  *    still belong to the fact relation by attribute identity);
  *  - every leaf decimal is a cast-from-proven-numeric, a literal, or an
  *    attribute whose project-chain definition proves a bound, with
  *    precision <= 18 (unscaled fits a long);
  *  - scale-changing ops (the decimal-precision-loss path) decline;
  *  - a column with missing/NaN/Inf footer statistics declines;
  *  - DISTINCT is admitted (unscaled longs are in bijection with
  *    decimals at a fixed scale), FILTER clauses ride unchanged (they
  *    only remove rows from the proven bound).
  * Kill switch: spark.graft.optimizer.unscaledDecimalSum=false.
  */
class UnscaledDecimalSums(session: SparkSession) extends Rule[LogicalPlan] {

  import UnscaledDecimalSums._

  private def enabled: Boolean =
    session.conf.get("spark.graft.optimizer.unscaledDecimalSum", "true") != "false"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case agg @ Aggregate(_, aggExprs, child, _)
          if aggExprs.exists(hasCandidateSum) =>
        try rewriteAggregate(agg, child).getOrElse(agg)
        catch { case NonFatal(_) => agg }
    }
  }

  private def hasCandidateSum(ne: Expression): Boolean =
    ne.exists {
      case AggregateExpression(Sum(e, _), _, _, _, _) =>
        e.dataType match {
          case d: DecimalType => d.precision + 10 > Decimal.MAX_LONG_DIGITS
          case _ => false
        }
      case _ => false
    }

  private def rewriteAggregate(
      agg: Aggregate, child: LogicalPlan): Option[Aggregate] = {
    val (aliasMaps, base) = stripToRelation(child, Nil) match {
      case Some(x) => x
      case None    => return None
    }
    val stats = footerStats(session, base) match {
      case Some(s) => s
      case None    => return None
    }
    val relOut = base.outputSet
    // resolve an expression down to base-relation attributes, for BOUND
    // derivation only (the rewritten expression keeps the original refs,
    // which stay valid against the aggregate's unchanged child)
    def resolveBase(e: Expression): Expression =
      aliasMaps.foldLeft(e)((cur, m) =>
        cur.transformUp {
          case a: AttributeReference if m.contains(a.exprId) => m(a.exprId)
        })

    var fired = false
    val newExprs = agg.aggregateExpressions.map { ne =>
      ne.transformUp {
        case ae @ AggregateExpression(Sum(e, _), mode, isDistinct, filter, _)
            if candidateType(e.dataType) =>
          toUnscaled(e, resolveBase, stats, relOut) match {
            case Some(u)
                if u.scale == e.dataType.asInstanceOf[DecimalType].scale &&
                  u.bound * stats.rows <= SafeLongBound =>
              fired = true
              val dt = e.dataType.asInstanceOf[DecimalType]
              val resultPrec = math.min(DecimalType.MAX_PRECISION, dt.precision + 10)
              // LEGACY long sum: overflow is proven impossible, so skip
              // the ANSI per-add checks; TRY/ANSI observable behavior is
              // unchanged (they differ only on overflow)
              val longSum = AggregateExpression(
                Sum(u.expr, legacyCtx), mode, isDistinct, filter)
              MakeDecimal(longSum, resultPrec, dt.scale,
                nullOnOverflow = true) // unreachable: any long fits p >= 19
            case _ => ae
          }
      }.asInstanceOf[NamedExpression]
    }
    if (fired) Some(agg.copy(aggregateExpressions = newExprs)) else None
  }

  /** Strip Project/Filter/Repartition — and unique-key inner equi-joins
    * (r21) — down to a single FACT parquet relation; returns the alias
    * maps (top-down) and the relation. Any node that can multiply or
    * fabricate rows returns None.
    *
    * The join case: `Join(fact, dim, Inner)` where some equi-conjunct's
    * dim side is a PROVEN-unique key ([[KeyUniqueness]] — exact
    * count-distinct, fingerprint-fresh) matches each fact row to AT MOST
    * one dim row, so output rows <= fact rows and the footer-row bound
    * algebra applies unchanged. Extra conjuncts (equi or theta) only
    * remove rows from an inner join — they never weaken the bound. The
    * summed expression must still resolve to FACT-relation columns:
    * [[maxAbs]] checks attribute identity against the relation's output,
    * so a dim-side column in the sum declines (its bound is unknowable
    * from the fact footer).
    */
  @annotation.tailrec
  private def stripToRelation(
      plan: LogicalPlan,
      maps: List[Map[ExprId, Expression]]
  ): Option[(List[Map[ExprId, Expression]], LogicalRelation)] = plan match {
    case p: Project =>
      val m: Map[ExprId, Expression] =
        p.projectList.collect { case al: Alias => al.exprId -> al.child }.toMap
      stripToRelation(p.child, maps :+ m)
    case f: Filter => stripToRelation(f.child, maps)
    case r: RepartitionOperation => stripToRelation(r.child, maps)
    case h: ResolvedHint => stripToRelation(h.child, maps)
    case Join(l, r, Inner, Some(cond), _) =>
      if (atMostOneMatch(r, cond)) stripToRelation(l, maps)
      else if (atMostOneMatch(l, cond)) stripToRelation(r, maps)
      else None
    case r: LogicalRelation
        if r.relation.isInstanceOf[HadoopFsRelation] &&
          r.relation.asInstanceOf[HadoopFsRelation]
            .fileFormat.isInstanceOf[ParquetFileFormat] =>
      Some((maps, r))
    case _ => None
  }

  /** Does this (dim) side of an inner join match AT MOST ONE of its rows
    * to any row of the other side? True when some equi-conjunct
    * `other = dimKey` has a dim key proven unique through the dim
    * subtree. EqualTo only: EqualNullSafe can match MANY null dim rows,
    * which single-column uniqueness (non-null values) does not rule out.
    */
  private def atMostOneMatch(dim: LogicalPlan, cond: Expression): Boolean = {
    val dimOut = dim.outputSet
    def isDimKey(k: Expression, other: Expression): Boolean = k match {
      case a: AttributeReference =>
        dimOut.contains(a) && other.references.intersect(dimOut).isEmpty &&
          uniqueThrough(dim, a)
      case _ => false
    }
    splitConjuncts(cond).exists {
      case EqualTo(x, y) => isDimKey(y, x) || isDimKey(x, y)
      case _ => false
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Is attribute `a` unique (each value on at most one row) in the
    * output of `plan`? Base case: an exact, fingerprint-fresh
    * [[KeyUniqueness]] fact about a parquet relation column. Filters,
    * projections (pass-through or alias-of-attribute), hints and
    * repartitions preserve uniqueness; an inner join preserves the
    * unique side's uniqueness when the OTHER side matches at most once
    * (mutual recursion with [[atMostOneMatch]] — exactly how a
    * unique-key star schema composes: orders⋈customer stays unique on
    * o_orderkey when c_custkey is unique).
    */
  private def uniqueThrough(plan: LogicalPlan, a: Attribute): Boolean =
    plan match {
      case p: Project =>
        p.projectList.collectFirst {
          case al: Alias if al.exprId == a.exprId => al.child
          case ar: AttributeReference if ar.exprId == a.exprId => ar
        } match {
          case Some(ar: AttributeReference) => uniqueThrough(p.child, ar)
          case _ => false
        }
      case f: Filter => uniqueThrough(f.child, a)
      case r: RepartitionOperation => uniqueThrough(r.child, a)
      case h: ResolvedHint => uniqueThrough(h.child, a)
      case Join(l, r, Inner, Some(cond), _) =>
        (l.outputSet.contains(a) && atMostOneMatch(r, cond) &&
          uniqueThrough(l, a)) ||
          (r.outputSet.contains(a) && atMostOneMatch(l, cond) &&
            uniqueThrough(r, a))
      case rel: LogicalRelation
          if rel.relation.isInstanceOf[HadoopFsRelation] &&
            rel.relation.asInstanceOf[HadoopFsRelation]
              .fileFormat.isInstanceOf[ParquetFileFormat] =>
        KeyUniqueness.provenUnique(session, rel, a)
      case _ => false
    }

  private def candidateType(dt: DataType): Boolean = dt match {
    case d: DecimalType => d.precision + 10 > Decimal.MAX_LONG_DIGITS
    case _ => false
  }

  private val legacyCtx = NumericEvalContext(EvalMode.LEGACY)

  /** The unscaled-long mirror of a decimal expression: the rewritten
    * expression (LongType), its decimal scale, and a proven bound on the
    * per-row |unscaled| value. None = not provable / not exactly
    * expressible.
    */
  private case class U(expr: Expression, scale: Int, bound: BigInt)

  private def withinLong(u: U): Option[U] =
    if (u.bound <= SafeLongBound) Some(u) else None

  private def toUnscaled(
      e: Expression,
      resolveBase: Expression => Expression,
      stats: FooterStats,
      relOut: AttributeSet
  ): Option[U] = {
    def recurse(x: Expression): Option[U] = x match {
      case c @ Cast(_, dt: DecimalType, _, _)
          if dt.precision <= Decimal.MAX_LONG_DIGITS =>
        maxAbs(resolveBase(c.child), stats, relOut).flatMap { m =>
          // the cast rounds half-up to dt.scale: |unscaled| <= ceil(m*10^s)+1
          val b = (m * BigDecimal(10).pow(dt.scale))
            .setScale(0, scala.math.BigDecimal.RoundingMode.CEILING).toBigInt + 1
          withinLong(U(UnscaledValue(c), dt.scale, b))
        }
      case a: AttributeReference =>
        a.dataType match {
          case dt: DecimalType if dt.precision <= Decimal.MAX_LONG_DIGITS =>
            // bound from the attribute's project-chain definition; the
            // rewrite reads the attribute itself (still in child output)
            boundOnly(resolveBase(a), stats, relOut)
              .filter(_._1 == dt.scale)
              .flatMap { case (_, b) => withinLong(U(UnscaledValue(a), dt.scale, b)) }
          case _ => None
        }
      case Literal(d: Decimal, dt: DecimalType)
          if dt.precision <= Decimal.MAX_LONG_DIGITS =>
        Some(U(Literal(d.toUnscaledLong, LongType), dt.scale,
          BigInt(d.toUnscaledLong).abs))
      case co: CheckOverflow =>
        // exact only when the declared type keeps the child's scale and
        // our proven bound fits its precision (no round, no null)
        recurse(co.child).flatMap { u =>
          if (co.dataType.scale == u.scale &&
            u.bound < BigInt(10).pow(co.dataType.precision)) Some(u)
          else None
        }
      case m @ Multiply(a, b, _) if m.dataType.isInstanceOf[DecimalType] =>
        for {
          ua <- recurse(a); ub <- recurse(b)
          if m.dataType.asInstanceOf[DecimalType].scale == ua.scale + ub.scale
          r <- withinLong(U(Multiply(ua.expr, ub.expr, legacyCtx),
            ua.scale + ub.scale, ua.bound * ub.bound))
        } yield r
      case ad @ Add(a, b, _) if ad.dataType.isInstanceOf[DecimalType] =>
        alignPair(recurse(a), recurse(b), ad.dataType).flatMap {
          case (ua, ub) =>
            withinLong(U(Add(ua.expr, ub.expr, legacyCtx), ua.scale,
              ua.bound + ub.bound))
        }
      case sb @ Subtract(a, b, _) if sb.dataType.isInstanceOf[DecimalType] =>
        alignPair(recurse(a), recurse(b), sb.dataType).flatMap {
          case (ua, ub) =>
            withinLong(U(Subtract(ua.expr, ub.expr, legacyCtx), ua.scale,
              ua.bound + ub.bound))
        }
      case um @ UnaryMinus(a, _) if um.dataType.isInstanceOf[DecimalType] =>
        recurse(a).map(u => u.copy(expr = UnaryMinus(u.expr, failOnError = false)))
      case _ => None
    }
    recurse(e)
  }

  /** Scale-align two unscaled operands to the add/subtract's declared
    * result scale (must equal max of the operand scales — the exact,
    * no-precision-loss case).
    */
  private def alignPair(
      a: Option[U], b: Option[U], resultType: DataType): Option[(U, U)] =
    (a, b) match {
      case (Some(ua), Some(ub)) =>
        val s = math.max(ua.scale, ub.scale)
        resultType match {
          case dt: DecimalType if dt.scale == s =>
            def up(u: U): Option[U] =
              if (u.scale == s) Some(u)
              else {
                val f = BigInt(10).pow(s - u.scale)
                if (!f.isValidLong) None
                else withinLong(U(
                  Multiply(u.expr, Literal(f.toLong, LongType), legacyCtx),
                  s, u.bound * f))
              }
            for (xa <- up(ua); xb <- up(ub)) yield (xa, xb)
          case _ => None
        }
      case _ => None
    }

  /** Proven bound of a decimal-typed BASE expression (used for project
    * aliases): same algebra as toUnscaled, no rewrite.
    */
  private def boundOnly(
      e: Expression, stats: FooterStats,
      relOut: AttributeSet): Option[(Int, BigInt)] = e match {
    case c @ Cast(_, dt: DecimalType, _, _)
        if dt.precision <= Decimal.MAX_LONG_DIGITS =>
      maxAbs(c.child, stats, relOut).map { m =>
        (dt.scale,
          (m * BigDecimal(10).pow(dt.scale))
            .setScale(0, scala.math.BigDecimal.RoundingMode.CEILING).toBigInt + 1)
      }
    case Literal(d: Decimal, dt: DecimalType) =>
      Some((dt.scale, BigInt(d.toUnscaledLong).abs))
    case co: CheckOverflow =>
      boundOnly(co.child, stats, relOut).filter {
        case (s, b) =>
          co.dataType.scale == s && b < BigInt(10).pow(co.dataType.precision)
      }
    case m @ Multiply(a, b, _) if m.dataType.isInstanceOf[DecimalType] =>
      for {
        (sa, ba) <- boundOnly(a, stats, relOut)
        (sb, bb) <- boundOnly(b, stats, relOut)
        if m.dataType.asInstanceOf[DecimalType].scale == sa + sb
      } yield (sa + sb, ba * bb)
    case _ => None
  }

  /** Proven max |value| of a numeric cast INPUT, from footer statistics
    * or literals. Attributes must be columns OF THE FACT RELATION by
    * identity (exprId), not just by name: with joins below the aggregate
    * (r21) a dim-side column could share a lower-cased name with a fact
    * column and silently borrow its bound.
    */
  private def maxAbs(
      e: Expression, stats: FooterStats,
      relOut: AttributeSet): Option[BigDecimal] =
    e match {
      case a: AttributeReference if relOut.contains(a) =>
        stats.maxAbs.get(a.name.toLowerCase)
      case Literal(v, _: NumericType) if v != null =>
        try Some(BigDecimal(v.toString, MathContext.UNLIMITED).abs)
        catch { case NonFatal(_) => None }
      case _ => None
    }
}

object UnscaledDecimalSums {

  /** Headroom factor: proofs must land the total within half the long
    * range (the bound itself is already a hard upper bound; the slack is
    * pure paranoia against off-by-one reasoning, not a correctness need).
    */
  val SafeLongBound: BigInt = BigInt(Long.MaxValue / 2)

  /** Per-relation footer statistics: total rows and per-column (by
    * lower-cased name) proven max |value|. A column missing sound
    * statistics in ANY row group is absent from the map.
    */
  private[plans] case class FooterStats(
      rows: BigInt, maxAbs: Map[String, BigDecimal])

  // footers of immutable inputs, keyed by (path, length, modTime) — the
  // same metadata read the scan planner performs, cached per JVM.
  // Bounded (r21): entries for overwritten files can never be hit again,
  // so a long-running session over churning datasets would otherwise
  // grow without limit; a full clear at the cap is cheaper and simpler
  // than LRU for a cache whose entries cost one footer read to rebuild.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, FooterStats]()
  private val MaxCacheEntries = 4096

  private[plans] def footerStats(
      session: SparkSession, rel: LogicalRelation): Option[FooterStats] =
    try {
      val fs = rel.relation.asInstanceOf[HadoopFsRelation]
      val files = fs.location.inputFiles
      if (files.isEmpty || files.length > 64) return None // metadata cost cap
      val conf = session.sessionState.newHadoopConf()
      val per = files.toSeq.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val st = p.getFileSystem(conf).getFileStatus(p)
        val key = s"$f:${st.getLen}:${st.getModificationTime}"
        if (cache.size > MaxCacheEntries) cache.clear()
        cache.computeIfAbsent(key, _ => readFooter(conf, st))
      }
      val rows = per.map(_.rows).sum
      // a column is proven only if every file proves it
      val names = per.map(_.maxAbs.keySet).reduce(_ intersect _)
      val merged = names.map(n => n -> per.map(_.maxAbs(n)).max).toMap
      Some(FooterStats(rows, merged))
    } catch { case NonFatal(_) => None }

  private def readFooter(
      conf: org.apache.hadoop.conf.Configuration,
      st: org.apache.hadoop.fs.FileStatus): FooterStats = {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(b => BigInt(b.getRowCount)).sum
      var ok = Map.empty[String, BigDecimal]
      var bad = Set.empty[String]
      for (b <- blocks; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString.toLowerCase
        if (name.contains('.')) bad += name // nested: not a top-level column
        else colMaxAbs(c) match {
          case Some(m) =>
            if (!bad.contains(name))
              ok = ok.updated(name, ok.get(name).map(_.max(m)).getOrElse(m))
          case None => bad += name; ok -= name
        }
      }
      FooterStats(rows, ok)
    } finally r.close()
  }

  /** Sound |max| for one column chunk, None when statistics are absent
    * or non-finite (NaN/Inf-tainted double stats fail BigDecimal and land
    * on None via the exception guard).
    *
    * Unsigned logical types DECLINE (r21): parquet stores UINT_32/UINT_64
    * stats as raw two's-complement ints, so genericGetMin/Max on a column
    * with values near 2^32 / 2^64 would return small-magnitude (or
    * negative) numbers and the derived bound would UNDERestimate the true
    * |value| by orders of magnitude — a silent overflow on legal
    * Arrow/pandas-written inputs. Int stats are accepted only when the
    * logical-type annotation is absent or explicitly signed.
    */
  private def signedIntStats(
      c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Boolean =
    c.getPrimitiveType.getLogicalTypeAnnotation match {
      case null => true
      case i: org.apache.parquet.schema.LogicalTypeAnnotation
            .IntLogicalTypeAnnotation => i.isSigned
      case _ => false // decimal/date/time/etc annotated ints: decline
    }

  private def colMaxAbs(
      c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData
  ): Option[BigDecimal] =
    try {
      val s = c.getStatistics
      if (s == null || s.isEmpty || !s.hasNonNullValue) {
        // a chunk of only nulls contributes bound 0 (sum ignores nulls)
        if (s != null && !s.isEmpty && s.getNumNulls == c.getValueCount)
          Some(BigDecimal(0))
        else None
      } else {
        (s.genericGetMin, s.genericGetMax) match {
          case (mn: java.lang.Double, mx: java.lang.Double)
              if !mn.isNaN && !mn.isInfinite && !mx.isNaN && !mx.isInfinite =>
            Some(BigDecimal(math.max(math.abs(mn), math.abs(mx))))
          case (mn: java.lang.Float, mx: java.lang.Float)
              if !mn.isNaN && !mn.isInfinite && !mx.isNaN && !mx.isInfinite =>
            Some(BigDecimal(math.max(math.abs(mn.toDouble), math.abs(mx.toDouble))))
          case (mn: java.lang.Long, mx: java.lang.Long) if signedIntStats(c) =>
            Some(BigDecimal(BigInt(mn.longValue).abs.max(BigInt(mx.longValue).abs)))
          case (mn: java.lang.Integer, mx: java.lang.Integer)
              if signedIntStats(c) =>
            Some(BigDecimal(math.max(math.abs(mn.toLong), math.abs(mx.toLong))))
          case _ => None
        }
      }
    } catch { case NonFatal(_) => None }
}
