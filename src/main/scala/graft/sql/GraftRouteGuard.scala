package graft.sql

import graft.catalog.Catalog
import graft.read.SecondaryIndex.{ArmIn, ArmRange, ValueArm}
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
  * counted with a capped occupancy probe (incremental execution stops
  * early on anti-selective arms) against the index table's total entry
  * count ([[Catalog.manifestRows]], a cached footer-only statistic) —
  * candidate mass and table mass in the SAME units. The route declines
  * when hits exceed `spark.graft.route.guard.maxCandidateFraction`
  * (default 0.2) of the entries; indexes under
  * `spark.graft.route.guard.minIndexRows` (default 1,048,576) route
  * unguarded — below that a mis-routed scan costs less than the
  * measurement, and small tables never pay the double probe. Covered
  * (index-only) routes skip the guard entirely: with no gather, reading
  * O(hits) of the index alone never loses to a full fact scan + decode.
  *
  * r14 — the refusal itself must be scale-safe (a decline that costs
  * more than the plan it protects, and GROWS with the table, is a
  * scale-killer of its own):
  *  - **Constant measurement budget.** The occupancy probe reads at
  *    most `spark.graft.route.guard.maxProbeRows` (default 1,048,576)
  *    hits regardless of index size — the r13 budget was
  *    `fraction × manifestRows`, which at 100 TB let one decline read
  *    20% of a huge index. When the budget is exhausted before the
  *    fraction verdict is reachable, the guard declines optimistically
  *    — the estimate below must NOT vouch past an exhausted budget
  *    (entries concentrate inside narrow arms in banded key spaces, so
  *    tiny value-space coverage can still be ~every entry). The flip
  *    side is deliberate, cost-only conservatism: on an index whose
  *    cap exceeds the constant, a selective probe with more than
  *    `maxProbeRows` hits declines too and the query runs as the
  *    pushed scan — raise the knob to trade measurement cost for
  *    routing reach on very large indexes.
  *  - **Span pre-estimate, no index job.** Range-shaped arms (the
  *    runtime filter's over-cap degradation) already carry the
  *    occupancy-clustered byte ranges the dim pass computed
  *    ([[GraftRuntimeFilterable]] `clusterRuns`/`clusterPrefixRuns`);
  *    their byte-space overlap with the index's cached key span
  *    ([[Catalog.manifestKeySpan]], one min/max aggregate per version)
  *    estimates arm mass under uniformity. Arms covering ≥ 2× the
  *    allowed fraction decline with ZERO index jobs — exactly the
  *    hash-scattered-dim shape whose r13 refusal cost 2.1× the plan it
  *    protected. Equality arms contribute nothing (a point's byte-space
  *    mass is ~0); the measured probe keeps the final word for them.
  *  - **Cross-query verdict cache.** A verdict is a pure function of
  *    (index manifest versions, arm-set signature, guard config), so it
  *    caches in the catalog next to `manifestRows`
  *    ([[Catalog.guardVerdict]]) — the dashboard pattern (same query
  *    re-run) pays zero re-measurement; an index append bumps the
  *    version and naturally invalidates.
  *
  * Known estimate caveats (cost-only in both directions): the
  * denominator counts raw stored index cells including stale versions
  * and tombstones, so a heavily churned index inflates it and the guard
  * leans permissive until a compaction shrinks the manifest; the span
  * estimate assumes rough uniformity of entries over the key span, so a
  * skewed index can estimate-decline a genuinely selective range probe.
  * Either way the query falls back to the pushed scan + residual — the
  * reference's own cost shape.
  *
  * Routing is cost-only on every door (the OR/value predicates stay
  * residual, or the join re-checks equality), so a declined route can
  * never change semantics — the query just runs as the pushed scan. */
private[sql] object GraftRouteGuard {

  private def conf(k: String, d: String): String =
    try org.apache.spark.sql.SparkSession.active.conf.get(k, d)
    catch { case scala.util.control.NonFatal(_) => d }

  /** Measurement entries this JVM has executed (test seam: the verdict
    * cache spec asserts a repeated query re-enters ZERO times). */
  private[graft] val measurements = new java.util.concurrent.atomic.AtomicLong

  /** Stable fingerprint of a route's probe shape — the verdict cache
    * key component that distinguishes two routes over the same index
    * tables (an r13 memo keyed by table alone aliased them). `marker`
    * names the route class / probe looseness; each part is one probed
    * index table with its value arms. */
  def signature(marker: String, parts: Seq[(String, Seq[ValueArm])])
      : String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def put(b: Array[Byte]): Unit = {
      md.update((b.length & 0xff).toByte)
      md.update((b.length >>> 8).toByte)
      md.update(b)
    }
    md.update(marker.getBytes("UTF-8"))
    parts.foreach { case (table, arms) =>
      put(table.getBytes("UTF-8"))
      arms.foreach {
        case ArmIn(vs) =>
          md.update(1.toByte)
          vs.foreach(put)
        case ArmRange(lo, hi) =>
          md.update(2.toByte)
          md.update(if (lo.isDefined) 3.toByte else 4.toByte)
          lo.foreach(put)
          md.update(if (hi.isDefined) 5.toByte else 6.toByte)
          hi.foreach(put)
      }
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  /** True when the summed capped hit count of the `probes` (one builder
    * per route member — an intersected frame for conjunctive members)
    * stays within the configured fraction of the involved index tables'
    * (`manifests`) total entry count. `sig` keys the cross-query
    * verdict cache ([[signature]]); `estimateArms` (single-index routes
    * only) feeds the span pre-estimate. Any failure ALLOWS (an
    * optimization gate must never fail or pessimize the query on
    * measurement error). */
  def allows(engine: Catalog, manifests: Seq[graft.catalog.Manifest],
      probes: Seq[() => DataFrame], sig: String,
      estimateArms: Seq[ValueArm] = Nil): Boolean =
    try {
      if (!conf("spark.graft.route.guard.enabled", "true").toBoolean)
        return true
      val fraction =
        conf("spark.graft.route.guard.maxCandidateFraction", "0.2").toDouble
      val minRows =
        conf("spark.graft.route.guard.minIndexRows", "1048576").toLong
      // the constant is sized so the FRACTION verdict rules outright up
      // to ~5M-entry caps (the fraction test is exact there) and the
      // exhaustion decline only kicks in where r13's fraction-scaled
      // budget became the hazard; 262,144 was tried first and declined
      // a genuinely profitable 12.5%-selectivity cross-OR at sf1 (the
      // CrossCheck battery caught it) — a bigger constant is still a
      // constant
      val maxProbeRows =
        conf("spark.graft.route.guard.maxProbeRows", "1048576").toLong
      val total = manifests.map(engine.manifestRows).sum
      // byte-space mass of the arms over the index's key span, under
      // uniformity; single-index range-shaped routes only (a point
      // value's byte-space mass is ~0, so equality/IN arms never
      // estimate — the measured probe keeps the final word for them)
      lazy val estimate: Option[Double] =
        if (manifests.sizeIs != 1 ||
            !estimateArms.exists(_.isInstanceOf[ArmRange])) None
        else engine.manifestKeySpan(manifests.head).flatMap {
          case (minK, maxK) =>
            // 7-byte prefixes via the clustering's OWN arithmetic
            // (GraftRuntimeFilter.prefixLong) — shared definition, so
            // the estimate's units can never drift from the runs'
            val w = 7
            val lo = GraftRuntimeFilter.prefixLong(minK, w)
            val hi = GraftRuntimeFilter.prefixLong(maxK, w)
            if (hi <= lo) None
            else Some(estimateArms.map {
              case ArmIn(_) => 0.0
              case ArmRange(a, b) =>
                val s = a.fold(lo)(x =>
                  math.max(GraftRuntimeFilter.prefixLong(x, w), lo))
                val e = b.fold(hi)(x =>
                  math.min(GraftRuntimeFilter.prefixLong(x, w), hi))
                math.max(0L, e - s).toDouble / (hi - lo).toDouble
            }.sum)
        }
      // below the floor routes go UNGUARDED, estimate included: a
      // mis-routed scan at this size costs less than any measurement,
      // and the route-mechanism contracts (specs pin that small
      // fixtures route on predicate shape) stay honest
      if (total <= minRows) return true
      val key = manifests.map(m => s"${m.table}@${m.version}")
        .mkString(",") + s"|$sig|$fraction|$maxProbeRows"
      engine.guardVerdict(key) {
        measurements.incrementAndGet(): Unit
        val cap = math.max(1L, (total * fraction).toLong)
        val budget = math.min(cap, math.max(1L, maxProbeRows))
        if (estimate.exists(_ >= fraction * 2.0)) false
        else {
          var hits = 0L
          val it = probes.iterator
          while (it.hasNext && hits <= budget) {
            val probe = it.next()
            val b = math.min(budget - hits + 1L, Int.MaxValue.toLong).toInt
            hits += probe().limit(b).count()
          }
          // budget exhausted below the fraction verdict -> decline
          // OPTIMISTICALLY: measurement cost must not scale with the
          // index, and the span estimate must NOT vouch past an
          // exhausted budget — entries concentrate INSIDE narrow arms
          // (banded key spaces are the norm in scaled corpora), so a
          // tiny value-space coverage can still be ~every entry; only
          // counting tells. `cap` is unused past the budget floor but
          // kept explicit: budget == cap whenever the cap is small
          // enough to measure outright.
          hits <= math.min(budget, cap)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => true }

}

/** Public plan seam for harnesses outside this package (PerfEval,
  * specs): whether any graft scan under `df`'s executed plan had a
  * route declined by the selectivity guard. */
object GraftRouteSeams {
  def guardDeclined(df: DataFrame): Boolean =
    GraftPlanSeams.scansOf[GraftGuardedRoute](df).exists(_.routeGuardDeclined)
}
