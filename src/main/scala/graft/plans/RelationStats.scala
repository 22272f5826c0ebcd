package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Feed [[StatsCatalog]]'s harvested statistics to Spark's OWN planner
  * (r20). Path-registered parquet reads carry no catalog entry, so
  * Spark's cost-based machinery never sees a row count or NDV for them:
  * `CostBasedJoinReorder` refuses to reorder (every join item needs
  * `rowCount`), and size estimates stay file-size-only. This rule —
  * injected through `injectPreCBORule`, i.e. immediately BEFORE the
  * optimizer's "Join Reorder" batch — attaches a synthetic
  * [[CatalogTable]] carrying [[CatalogStatistics]] (row count +
  * per-column distinct counts from the harvested HLL sketches) to every
  * analyzed [[LogicalRelation]], so the same one-pass analyze that arms
  * graft's own rules ([[EagerAggJoin]] auto, [[PreAggExpand]] skip, the
  * MV advisor) also arms Spark's join reordering and plan-stats
  * estimation. The reference gets all of this for free from its SQL
  * backend's CBO (crates/engine/src/lib.rs:54-57); for a Spark library
  * the supported seam is exactly this statistics hand-off.
  *
  * Semantics-preserving by construction: statistics never change query
  * RESULTS, only plan choice. `sizeInBytes` stays the relation's real
  * file size, so sessions without CBO enabled (`spark.sql.cbo.enabled`,
  * default off) see byte-identical plans — `toPlanStats` only consults
  * rowCount/colStats when CBO or plan-stats is on. Session-scoped
  * statistics resolve through [[StatsCatalog.lookup(session,path)*]]
  * like every other consumer. Kill switch:
  * `spark.graft.optimizer.relationStats=false`. Idempotent: relations
  * that already carry a catalog table (real catalog tables, or a prior
  * pass of this rule) are left untouched.
  */
class RelationStats(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (StatsCatalog.isEmpty) return plan
    val on = session.sessionState.conf
      .getConfString("spark.graft.optimizer.relationStats", "true")
    if (on == "false") return plan
    plan.transformUp {
      case lr: LogicalRelation if lr.catalogTable.isEmpty =>
        (for {
          root <- MvRewrite.scanRoot(lr)
          st <- StatsCatalog.lookup(session, root)
        } yield lr.copy(catalogTable = Some(synthetic(lr, st))))
          .getOrElse(lr)
    }
  }

  private def synthetic(
      lr: LogicalRelation, st: StatsCatalog.TableStats): CatalogTable = {
    val colStats = lr.output.flatMap { a =>
      st.cols.get(a.name).map(c =>
        a.name -> CatalogColumnStat(distinctCount = Some(BigInt(c.ndv))))
    }.toMap
    CatalogTable(
      identifier = TableIdentifier(
        // a stable, obviously-synthetic identity (never resolvable in
        // any real catalog — this table exists only to carry stats)
        st.path.replaceAll("[^A-Za-z0-9_]", "_"), Some("graft_stats")),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty,
      schema = lr.relation.schema,
      stats = Some(CatalogStatistics(
        sizeInBytes = BigInt(lr.relation.sizeInBytes),
        rowCount = Some(BigInt(math.max(st.rows, 0L))),
        colStats = colStats)))
  }
}
