package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.datasketches.hll.{HllSketch, Union}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
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
  * ([[mergeIncrement]], wired into the Iceberg append path for tracked
  * tables). Deletes only adjust the row count; a sketch cannot forget,
  * so NDVs are upper bounds under deletion — which only makes the
  * consumers MORE conservative (a too-high grain NDV skips a rewrite,
  * never mis-fires one).
  *
  * Consumers:
  *  - [[EagerAggJoin]] in its `auto` mode (the default): fire the
  *    below-join pre-aggregate only when grain-NDV / fact-rows clears a
  *    conservative threshold and the dim side is not broadcast-sized —
  *    the decision the reference delegates to its SQL backend's
  *    cost-based optimizer (crates/engine/src/lib.rs:54-57) and a plain
  *    parquet scan otherwise has no statistics to make.
  *
  * Durability: the whole registry rides [[CatalogPersistence]]'s one
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

  final case class TableStats(
      path: String,
      rows: Long,
      cols: Map[String, ColStats],
      updatedMs: Long)

  private val reg = new ConcurrentHashMap[String, TableStats]()

  def normalize(p: String): String = MvCatalog.normalize(p)

  /** Fast emptiness check — the optimizer rules' early-out: with no
    * table analyzed, auto-mode gates can skip their whole plan analysis
    * (the same pattern as MvCatalog.isEmpty in MvRewrite).
    */
  def isEmpty: Boolean = reg.isEmpty

  def lookup(path: String): Option[TableStats] =
    Option(reg.get(normalize(path)))

  /** Is this table analyzed — i.e. should write paths keep it current? */
  def tracked(path: String): Boolean = reg.containsKey(normalize(path))

  def describe(): Seq[TableStats] = {
    import scala.jdk.CollectionConverters._
    reg.values.asScala.toSeq.sortBy(_.path)
  }

  def unregister(path: String): Unit = reg.remove(normalize(path)): Unit
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

  private def estimate(sketch: Array[Byte]): Long =
    math.round(HllSketch.heapify(sketch).getEstimate)

  private def sketchRow(df: DataFrame): (Long, Map[String, Array[Byte]]) = {
    val sketched = df.schema.fields
      .flatMap(f => sketchExpr(f.name, f.dataType).map(f.name -> _)).toSeq
    val aggs = count(lit(1)).as("_rows") +:
      sketched.map { case (n, e) => e.as(s"_hll_$n") }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getLong(0)
    val sketches = sketched.zipWithIndex.flatMap { case ((n, _), i) =>
      // an all-null column yields a null sketch; record it as empty
      Option(row.getAs[Array[Byte]](i + 1)).map(n -> _)
    }.toMap
    (rows, sketches)
  }

  /** ONE full pass over the table: count(*) plus an HLL sketch per
    * sketchable column, registered under the normalized path. `data`
    * overrides how the table reads (Iceberg roots, session-specific
    * reader confs); default is a plain parquet read of `path`.
    */
  def analyze(
      spark: SparkSession, path: String,
      data: Option[DataFrame] = None): TableStats = {
    val df = data.getOrElse(spark.read.parquet(path))
    val (rows, sketches) = sketchRow(df)
    val st = TableStats(
      normalize(path), rows,
      sketches.map { case (n, b) => n -> ColStats(estimate(b), b) },
      System.currentTimeMillis())
    reg.put(st.path, st)
    st
  }

  /** O(increment) maintenance: sketch the appended rows alone and UNION
    * into the stored sketches; `deletedRows` only adjusts the count
    * (sketches cannot forget — NDV stays an upper bound, the
    * conservative direction). No-op for untracked tables, so the write
    * path stays zero-cost until someone analyzes.
    */
  def mergeIncrement(
      spark: SparkSession, path: String,
      appended: Option[DataFrame], deletedRows: Long = 0L): Unit = {
    val key = normalize(path)
    val cur = Option(reg.get(key)).getOrElse(return)
    val (incRows, incSketches) = appended match {
      case Some(df) => sketchRow(df)
      case None     => (0L, Map.empty[String, Array[Byte]])
    }
    val mergedCols = (cur.cols.keySet ++ incSketches.keySet).map { n =>
      val merged = (cur.cols.get(n).map(_.sketch), incSketches.get(n)) match {
        case (Some(a), Some(b)) =>
          val u = new Union(12)
          u.update(HllSketch.heapify(a))
          u.update(HllSketch.heapify(b))
          u.getResult.toCompactByteArray
        case (Some(a), None) => a
        case (None, Some(b)) => b
        case (None, None)    => return // unreachable by construction
      }
      n -> ColStats(estimate(merged), merged)
    }.toMap
    reg.put(key, TableStats(
      key, math.max(0L, cur.rows + incRows - deletedRows), mergedCols,
      System.currentTimeMillis())): Unit
  }

  // -------------------------------------------------------------------
  // the EagerAggJoin auto-arm decision
  // -------------------------------------------------------------------

  /** Auto-mode gate for [[EagerAggJoin]]: true when the fact side
    * resolves to ONE analyzed file-backed table, every grain column has
    * a sketch there, and the statistics say the rewrite is a win —
    *
    *  - `rows >= minRows` (tiny facts have nothing to save),
    *  - `product(grain NDVs) <= maxGrainRatio * rows` (the pre-aggregate
    *    must materially shrink the join's fact input; the product
    *    OVERestimates the joint NDV under correlation, which only skips
    *    rewrites, never mis-fires them),
    *  - the dim side is not broadcast-sized (when the dim broadcasts
    *    there is no fact shuffle to save and the extra aggregate is pure
    *    cost — the probe's measured adverse regime).
    *
    * Grain attributes must be the scan's OWN output attributes (exprId
    * match); relocated derived columns have no statistics and make the
    * gate refuse, conservatively.
    */
  /** Auto skip-gate for [[PreAggExpand]] — the reverse default of
    * [[shouldEagerAgg]]: that rule is default-ON (its adverse case is a
    * bounded small overhead), so statistics only ever argue AGAINST it.
    * Returns false — skip the rewrite — exactly when the input resolves
    * to ONE analyzed scan, every grain column has a sketch, and the
    * grain NDV exceeds `maxGrainRatio` of the rows (a near-unique grain
    * pays the extra exchange for almost no Expand reduction — the
    * measured adverse case the kill switch existed for, now automated).
    * Unknown anything → true (fire), preserving the no-stats behavior.
    */
  def preAggExpandWorthwhile(
      session: SparkSession,
      child: LogicalPlan,
      grainAttrs: Seq[Attribute]): Boolean = {
    val maxRatio = session.sessionState.conf
      .getConfString("spark.graft.optimizer.preAggExpand.maxGrainRatio", "0.5")
      .toDouble
    val lr = child.collectLeaves() match {
      case Seq(l: LogicalRelation) => l
      case _                       => return true
    }
    val root = MvRewrite.scanRoot(lr).getOrElse(return true)
    val st = lookup(root).getOrElse(return true)
    if (st.rows <= 0) return true
    val nameById = lr.output.map(a => a.exprId -> a.name).toMap
    var grainNdv = 1.0d
    grainAttrs.foreach { a =>
      val name = nameById.getOrElse(a.exprId, return true)
      val ndv = st.cols.get(name).map(_.ndv).getOrElse(return true)
      grainNdv = math.min(grainNdv * math.max(ndv, 1L), st.rows.toDouble)
    }
    grainNdv <= maxRatio * st.rows
  }

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
    val leaves = factPlan.collectLeaves()
    val lr = leaves match {
      case Seq(l: LogicalRelation) => l
      case _                       => return false
    }
    val root = MvRewrite.scanRoot(lr).getOrElse(return false)
    val st = lookup(root).getOrElse(return false)
    if (st.rows < minRows) return false
    val nameById = lr.output.map(a => a.exprId -> a.name).toMap
    var grainNdv = 1.0d
    grainAttrs.foreach { a =>
      val name = nameById.getOrElse(a.exprId, return false)
      val ndv = st.cols.get(name).map(_.ndv).getOrElse(return false)
      grainNdv = math.min(grainNdv * math.max(ndv, 1L), st.rows.toDouble)
    }
    if (grainNdv > maxRatio * st.rows) return false
    // dim broadcastability through the same signal Spark's own join
    // selection uses at this stage: logical size estimate vs threshold
    val thresh = conf.autoBroadcastJoinThreshold
    val dimBroadcastable =
      thresh >= 0 && dimPlan.stats.sizeInBytes <= BigInt(thresh)
    !dimBroadcastable
  }
}
