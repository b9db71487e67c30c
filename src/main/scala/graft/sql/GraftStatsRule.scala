package graft.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Statistics, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}

/** [[V1ScanWrapper]] that forwards the wrapped scan's size statistics.
  *
  * Spark's V2 pushdown wraps every `V1Scan` in a `V1ScanWrapper` when it
  * rewrites the relation, and the wrapper does not implement
  * `SupportsReportStatistics` — so `DataSourceV2ScanRelation.computeStats`
  * falls back to `defaultSizeInBytes` (effectively "infinite") even when
  * the underlying scan reports real statistics. That default makes every
  * join against a V1-bridged source a shuffle: Catalyst never sees a
  * broadcastable side. This subclass restores the signal by delegating.
  * Everything else (pattern matches on `V1ScanWrapper`, the physical V1
  * strategy, equality) is inherited unchanged.
  */
private[sql] class StatsV1ScanWrapper(w: V1ScanWrapper,
    stats: SupportsReportStatistics)
    extends V1ScanWrapper(w.v1Scan, w.handledFilters, w.pushedDownOperators)
    with SupportsReportStatistics {
  override def estimateStatistics(): Statistics = stats.estimateStatistics()
  // MUST differ from the plain wrapper under the case-class equality,
  // or TreeNode.transform's fastEquals sees the rewritten relation as
  // unchanged and silently keeps the original node (no stats). canEqual
  // keeps it symmetric: plain.equals(stats) consults stats.canEqual.
  override def canEqual(that: Any): Boolean =
    that.isInstanceOf[StatsV1ScanWrapper]
  override def equals(that: Any): Boolean = that match {
    case s: StatsV1ScanWrapper => super.equals(s)
    case _ => false
  }
  override def hashCode(): Int = super.hashCode() * 31 + 1
}

/** Optimizer rule (wired by [[GraftSqlCatalog.initialize]] into
  * `spark.experimental.extraOptimizations` — the "User Provided
  * Optimizers" batch, the one extension seam that runs AFTER V2 pushdown
  * creates the wrappers; the injectable pre-CBO batch runs before
  * pushdown and never sees them): re-wrap stats-reporting V1 scans so
  * the manifest-size statistics the graft doors compute
  * ([[GraftV1Scan.estimateStatistics]],
  * [[GraftWideScan.estimateStatistics]]) reach Catalyst's join sizing —
  * a small graft table then auto-broadcasts with no hint, instead of
  * shuffling the fact side.
  * Correctness-neutral: only the reported statistics change, never the
  * data plane — a session without the extension plans the same results
  * with shuffle joins. */
object GraftStatsRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r: DataSourceV2ScanRelation if r.scan.isInstanceOf[V1ScanWrapper] &&
        !r.scan.isInstanceOf[SupportsReportStatistics] =>
      val w = r.scan.asInstanceOf[V1ScanWrapper]
      w.v1Scan match {
        case s: SupportsReportStatistics =>
          r.copy(scan = new StatsV1ScanWrapper(w, s))
        case _ => r
      }
  }
}
