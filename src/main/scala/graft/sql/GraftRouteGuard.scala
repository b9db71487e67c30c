package graft.sql

import graft.catalog.Catalog
import org.apache.spark.sql.DataFrame

/** A graft scan whose chosen index route passed through the r13
  * selectivity guard — the seam trait [[GraftRouteSeams]] aggregates. */
private[sql] trait GraftGuardedRoute {
  /** True once the guard DECLINED a route on this scan (it fell back to
    * the pushed scan + residual). Inspect after execution. */
  private[sql] def routeGuardDeclined: Boolean
}

/** The route SELECTIVITY guard (r13): index-probe routes used to
  * activate on predicate SHAPE alone, so an anti-selective arm — e.g.
  * `status = 'O'` matching ~half the table inside a cross-column OR —
  * paid index probe + row-key dedup + gather join over half the data,
  * slower than the pushed scan it replaced, and widening with scale.
  * The reference never pays this cost shape: its filters stream inside
  * the scan (`hbase/regionserver/ScanQueryMatcher.java:186-200`), so a
  * routed OR was the one legal input where this engine could be WORSE
  * than the reference.
  *
  * The guard measures, not guesses: the route's own probe frame is
  * counted with a `limit(cap + 1)` occupancy probe (incremental
  * execution stops early on anti-selective arms) against the index
  * table's total entry count ([[Catalog.manifestRows]], a cached
  * footer-only statistic) — candidate mass and table mass in the SAME
  * units. The route declines when hits exceed
  * `spark.graft.route.guard.maxCandidateFraction` (default 0.2) of the
  * entries; indexes under `spark.graft.route.guard.minIndexRows`
  * (default 1,048,576) route unguarded — below that a mis-routed scan
  * costs less than the measurement, and small tables never pay the
  * double probe. Covered (index-only) routes skip the guard entirely:
  * with no gather join, reading O(hits) of the index alone never loses
  * to a full fact scan + decode.
  *
  * Routing is cost-only on every door (the OR/value predicates stay
  * residual, or the join re-checks equality), so a declined route can
  * never change semantics — the query just runs as the pushed scan. */
private[sql] object GraftRouteGuard {

  private def conf(k: String, d: String): String =
    try org.apache.spark.sql.SparkSession.active.conf.get(k, d)
    catch { case scala.util.control.NonFatal(_) => d }

  /** True when the summed capped hit count of the `probes` (one builder
    * per route member — an intersected frame for conjunctive members)
    * stays within the configured fraction of the involved index tables'
    * (`manifests`) total entry count. Any failure ALLOWS (an
    * optimization gate must never fail or pessimize the query on
    * measurement error). */
  def allows(engine: Catalog, manifests: Seq[graft.catalog.Manifest],
      probes: Seq[() => DataFrame]): Boolean =
    try {
      if (!conf("spark.graft.route.guard.enabled", "true").toBoolean)
        return true
      val fraction =
        conf("spark.graft.route.guard.maxCandidateFraction", "0.2").toDouble
      val minRows =
        conf("spark.graft.route.guard.minIndexRows", "1048576").toLong
      val total = manifests.map(engine.manifestRows).sum
      if (total <= minRows) return true
      val cap = math.max(1L, (total * fraction).toLong)
      var hits = 0L
      val it = probes.iterator
      while (it.hasNext && hits <= cap) {
        val probe = it.next()
        val budget = math.min(cap - hits + 1L, Int.MaxValue.toLong).toInt
        hits += probe().limit(budget).count()
      }
      hits <= cap
    } catch { case scala.util.control.NonFatal(_) => true }
}

/** Public plan seam for harnesses outside this package (PerfEval,
  * specs): whether any graft scan under `df`'s executed plan had a
  * route declined by the selectivity guard. */
object GraftRouteSeams {
  def guardDeclined(df: DataFrame): Boolean =
    GraftPlanSeams.scansOf[GraftGuardedRoute](df).exists(_.routeGuardDeclined)
}
