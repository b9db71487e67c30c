package graft.sql

import graft.catalog.{Catalog, Manifest}
import graft.core.Bytes
import graft.read.SecondaryIndex
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
  * A route is a set of [[GuardMember]]s (one per OR member; a member's
  * `probe` builds the EXACT hit frame its gather would fetch — an
  * intersected frame for conjunctive multi-leg members) whose summed
  * candidate mass is compared against the involved index tables' entry
  * count. The verdict ladder, cheapest first:
  *
  *  1. **Histogram bounds (r15) — zero index jobs, may VOUCH or
  *     decline.** Index builds/compactions persist an equi-depth
  *     row-key histogram in the manifest ([[graft.catalog.ManifestStats]]);
  *     the member arms map to the probes' own scan key ranges
  *     ([[SecondaryIndex.armEstimateRanges]] — one shared definition, so
  *     estimate and probe can never drift) and rank arithmetic over the
  *     boundaries yields a SOUND upper and (for exact mappings) lower
  *     bound on the stored entries a probe would count; appends since
  *     the computation are covered by the unseen mass `rows - histRows`
  *     added to every upper bound. Upper below the allowed fraction →
  *     ROUTE with zero measurement jobs — this is what lets a selective
  *     probe with MORE than `maxProbeRows` hits on a very large index
  *     still route, where the r14 exhaustion rule surrendered the
  *     index's advantage exactly where it is largest. Lower above 2×
  *     the fraction → DECLINE with zero jobs. Unlike the uniformity
  *     span estimate below, the histogram is measurement-derived (a
  *     banded key space concentrating every entry inside a narrow VALUE
  *     range spreads those entries across ALL histogram buckets, so the
  *     bounds stay honest where r14's uniformity hazard lived).
  *  2. **Span pre-estimate (r14) — zero index jobs, decline-only.**
  *     Range-shaped single-leg members estimate byte-space mass against
  *     the index's persisted key span under a UNIFORMITY assumption;
  *     per-member masses compose by sum (r15 — multi-member cross/mixed
  *     ORs estimate too) and ≥ 2× the allowed fraction declines. An
  *     assumption may only ever send the query to the pushed scan —
  *     never vouch a route.
  *  3. **Measured occupancy probe — capped.** The member probes are
  *     counted incrementally under a CONSTANT budget
  *     (`spark.graft.route.guard.maxProbeRows`, default 1,048,576 —
  *     measurement cost must not scale with the index); exhaustion
  *     before the fraction verdict declines optimistically.
  *
  * The denominator is the RESOLVED entry bound
  * ([[Catalog.manifestResolvedRows]]) when the manifest persists one
  * (r15 — a churned index no longer inflates the denominator and leans
  * the guard permissive), else the raw count. Indexes at or under
  * `spark.graft.route.guard.minIndexRows` (default 1,048,576) route
  * unguarded — below that a mis-routed scan costs less than the
  * measurement, and small tables never pay the double probe. Covered
  * (index-only) routes skip the guard entirely: with no gather, reading
  * O(hits) of the index alone never loses to a full fact scan + decode.
  * Verdicts cache cross-query in the catalog ([[Catalog.guardVerdict]],
  * keyed by index versions + arm signature + config), so the dashboard
  * pattern pays zero re-measurement and an index append invalidates
  * naturally.
  *
  * Routing is cost-only on every door (the OR/value predicates stay
  * residual, or the join re-checks equality), so a declined route can
  * never change semantics — the query just runs as the pushed scan. */
private[sql] object GraftRouteGuard {

  /** One index leg of a route member: the pinned index manifest plus
    * the value arms probed on it. */
  final case class GuardLeg(manifest: Manifest, arms: Seq[ValueArm])

  /** One route member: `probe` builds the member's exact hit frame (an
    * intersected frame when `legs.sizeIs > 1` — conjunctive members);
    * `legs` carry the per-index arms the estimates work from. */
  final case class GuardMember(probe: () => DataFrame, legs: Seq[GuardLeg])

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
    * index table with its value arms. Every variable-length component
    * (marker included) is 4-byte-length-delimited, so components can
    * never alias across boundaries (ADVICE r14: the 16-bit prefix
    * aliased lengths modulo 64 KiB and left the marker undelimited). */
  def signature(marker: String, parts: Seq[(String, Seq[ValueArm])])
      : String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def put(b: Array[Byte]): Unit = {
      val n = b.length
      md.update((n >>> 24).toByte)
      md.update((n >>> 16).toByte)
      md.update((n >>> 8).toByte)
      md.update(n.toByte)
      md.update(b)
    }
    put(marker.getBytes("UTF-8"))
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

  /** (lower, upper) bound on the FRACTION of histogram rows whose key
    * sorts strictly below `x`, from the equi-depth boundaries `bs`.
    * `err` is the boundaries' uniform rank-error budget: 0 when the
    * histogram was computed over the FULL key set (histRows at or under
    * the sample target — boundaries are exact order statistics),
    * [[Catalog.HistRankErr]] for sampled boundaries (DKW — see
    * [[graft.catalog.ManifestStats]]). */
  private def cdfBounds(bs: Seq[Array[Byte]], x: Array[Byte], err: Double)
      : (Double, Double) = {
    val b = bs.length - 1
    val below = bs.lastIndexWhere(Bytes.compareTo(_, x) < 0)
    val atOrAbove = bs.indexWhere(Bytes.compareTo(_, x) >= 0)
    (if (below < 0) 0.0 else math.max(0.0, below.toDouble / b - err),
      if (atOrAbove < 0) 1.0 else math.min(1.0, atOrAbove.toDouble / b + err))
  }

  /** Pure (upper, lower) bound on the number of the histogram's
    * `n0` keys falling inside the UNION of `rs` — merge to disjoint
    * ranges, then rank arithmetic per range. Exposed for the
    * property test that pins this arithmetic against brute force. */
  private[sql] def rangeMassBounds(bs: Seq[Array[Byte]],
      rs: Seq[(Option[Array[Byte]], Option[Array[Byte]])],
      err: Double, n0: Long): (Double, Double) = {
    val merged = mergeRanges(rs)
    def mass(lower: Boolean): Double =
      merged.map { case (lo, hi) =>
        val (fLoL, fLoU) =
          lo.map(cdfBounds(bs, _, err)).getOrElse((0.0, 0.0))
        val (fHiL, fHiU) =
          hi.map(cdfBounds(bs, _, err)).getOrElse((1.0, 1.0))
        if (lower) math.max(0.0, fHiL - fLoU) * n0
        else math.max(0.0, fHiU - fLoL) * n0
      }.sum
    (mass(lower = false), mass(lower = true))
  }

  /** Merge key ranges into disjoint ones (bytewise; None = unbounded),
    * so summed per-range bounds never double-count an overlap. */
  private def mergeRanges(
      rs: Seq[(Option[Array[Byte]], Option[Array[Byte]])])
      : Seq[(Option[Array[Byte]], Option[Array[Byte]])] = {
    def loLt(a: Option[Array[Byte]], b: Option[Array[Byte]]): Boolean =
      (a, b) match {
        case (None, None) => false
        case (None, _) => true
        case (_, None) => false
        case (Some(x), Some(y)) => Bytes.compareTo(x, y) < 0
      }
    // next.lo < cur.hi (None hi = +inf always overlaps)
    def overlaps(hi: Option[Array[Byte]], lo: Option[Array[Byte]]): Boolean =
      hi.forall(h => lo.forall(l => Bytes.compareTo(l, h) <= 0))
    def hiMax(a: Option[Array[Byte]], b: Option[Array[Byte]]) =
      if (a.isEmpty || b.isEmpty) None
      else if (Bytes.compareTo(a.get, b.get) >= 0) a else b
    rs.sortWith((p, q) => loLt(p._1, q._1))
      .foldLeft(List.empty[(Option[Array[Byte]], Option[Array[Byte]])]) {
        case (acc @ (cLo, cHi) :: rest, (lo, hi)) =>
          if (overlaps(cHi, lo)) (cLo, hiMax(cHi, hi)) :: rest
          else (lo, hi) :: acc
        case (Nil, r) => r :: Nil
      }.reverse
  }

  /** Histogram-derived (upper, lower) bound on the entries one leg's
    * probe would count; None without a persisted histogram. The upper
    * bound adds the persisted UNSEEN mass (rows appended since the
    * histogram — tracked explicitly; deriving it from the raw total
    * was unsound under partial compactions) and stays in STORED-cell
    * units — always at or above what the probe counts, so vouching is
    * sound. The lower bound (decline direction, cost-only) is scaled
    * by the resolved/raw churn ratio: the histogram counts stored
    * cells while the probe counts distinct resolved hits, so on a
    * version-churned index an unscaled lower bound would
    * estimate-decline selective routes the measured path used to
    * route (review r15); under skewed churn the scaled value is an
    * estimate, and the 2x decline margin absorbs it. */
  private def histBounds(engine: Catalog, leg: GuardLeg)
      : Option[(Double, Double)] =
    engine.manifestHistogram(leg.manifest)
      .filter(_ => leg.arms.nonEmpty)
      .map { case (n0, unseen, bs) =>
        val mapped = leg.arms.map(SecondaryIndex.armEstimateRanges)
        val err =
          if (n0 <= Catalog.HistSampleTarget) 0.0 else Catalog.HistRankErr
        val raw = engine.manifestRows(leg.manifest)
        val upper = math.min(raw.toDouble,
          rangeMassBounds(bs, mapped.flatMap(_._1), err, n0)._1 +
            unseen.toDouble)
        // the lower bound may only use EXACTLY-mapped arms (a widened
        // range bounds the probe's count from above, not below)
        val exact = mapped.filter(_._2)
        val churn =
          if (raw <= 0L) 1.0
          else math.min(1.0,
            engine.manifestResolvedRows(leg.manifest)
              .fold(1.0)(_.toDouble / raw.toDouble))
        val lower =
          if (exact.isEmpty) 0.0
          else rangeMassBounds(bs, exact.flatMap(_._1), err, n0)._2 * churn
        (upper, lower)
      }

  /** True when the route's candidate mass stays within the configured
    * fraction of the involved index tables' entry count — see the
    * verdict ladder in the class doc. `sig` keys the cross-query
    * verdict cache ([[signature]]). Any failure ALLOWS (an optimization
    * gate must never fail or pessimize the query on measurement
    * error). */
  def allows(engine: Catalog, members: Seq[GuardMember], sig: String)
      : Boolean =
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
      // constant. Above it, HISTOGRAM-vouched routes (ladder step 1)
      // keep selective probes routing without any measurement at all.
      val maxProbeRows =
        conf("spark.graft.route.guard.maxProbeRows", "1048576").toLong
      val histEnabled =
        conf("spark.graft.route.guard.histogram", "true").toBoolean
      val manifests = members.flatMap(_.legs.map(_.manifest))
        .groupBy(m => (m.table, m.version)).values.map(_.head).toSeq
      def effRows(m: Manifest): Long =
        engine.manifestResolvedRows(m).getOrElse(engine.manifestRows(m))
      val total = manifests.map(effRows).sum
      // below the floor routes go UNGUARDED, estimates included: a
      // mis-routed scan at this size costs less than any measurement,
      // and the route-mechanism contracts (specs pin that small
      // fixtures route on predicate shape) stay honest
      if (total <= minRows) return true
      val key = manifests.map(m => s"${m.table}@${m.version}").sorted
        .mkString(",") + s"|$sig|$fraction|$maxProbeRows|$histEnabled"
      engine.guardVerdict(key) {
        measurements.incrementAndGet(): Unit
        // 1) histogram bounds: sound both ways (vouch needs EVERY
        // member bounded; a multi-leg member's probe is an
        // intersection, so the tightest leg bounds it from above and
        // no lower bound exists)
        val bounds: Seq[Option[(Double, Double)]] =
          if (!histEnabled) members.map(_ => None)
          else members.map { mem =>
            val legBounds = mem.legs.flatMap(histBounds(engine, _))
            if (legBounds.isEmpty) None
            else Some((legBounds.map(_._1).min,
              if (mem.legs.sizeIs == 1) legBounds.head._2 else 0.0))
          }
        val upperAll: Option[Double] =
          if (bounds.forall(_.isDefined))
            Some(bounds.flatten.map(_._1).sum)
          else None
        val lowerAll = bounds.flatten.map(_._2).sum
        if (upperAll.exists(_ <= fraction * total)) true
        else if (lowerAll >= 2.0 * fraction * total) false
        // 2) span pre-estimate (uniformity — decline only): per-member
        // single-leg byte-space masses over the persisted key span,
        // composed by sum; members without an estimate contribute
        // nothing (under-sum = fewer declines, cost-only)
        else if (spanMass(engine, members, effRows) >= 2.0 * fraction * total)
          false
        else {
          // 3) measured occupancy probes under the constant budget
          val cap = math.max(1L, (total * fraction).toLong)
          val budget = math.min(cap, math.max(1L, maxProbeRows))
          var hits = 0L
          val it = members.iterator
          while (it.hasNext && hits <= budget) {
            val probe = it.next().probe
            val b = math.min(budget - hits + 1L, Int.MaxValue.toLong).toInt
            hits += probe().limit(b).count()
          }
          // budget exhausted below the fraction verdict -> decline
          // OPTIMISTICALLY: measurement cost must not scale with the
          // index, and the UNIFORMITY estimate must never vouch past an
          // exhausted budget — entries concentrate INSIDE narrow arms
          // (banded key spaces are the norm in scaled corpora); only
          // counting, or the measurement-derived histogram above,
          // tells. `cap` is unused past the budget floor but kept
          // explicit: budget == cap whenever the cap is small enough
          // to measure outright.
          hits <= math.min(budget, cap)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => true }

  /** Summed byte-space mass estimate of the members' range arms over
    * their indexes' key spans, under uniformity (7-byte prefixes via
    * the clustering's OWN arithmetic — [[GraftRuntimeFilter.prefixLong]]
    * — so the estimate's units can never drift from the runs').
    * Equality arms contribute nothing (a point's byte-space mass is
    * ~0); multi-leg members and degenerate spans contribute nothing
    * (an unknown is never a reason to decline). */
  private def spanMass(engine: Catalog, members: Seq[GuardMember],
      effRows: Manifest => Long): Double =
    members.map { mem =>
      if (mem.legs.sizeIs != 1) 0.0
      else {
        val leg = mem.legs.head
        if (!leg.arms.exists(_.isInstanceOf[ArmRange])) 0.0
        else engine.manifestKeySpan(leg.manifest).fold(0.0) {
          case (minK, maxK) =>
            val w = 7
            val lo = GraftRuntimeFilter.prefixLong(minK, w)
            val hi = GraftRuntimeFilter.prefixLong(maxK, w)
            if (hi <= lo) 0.0
            else leg.arms.map {
              case ArmIn(_) => 0.0
              case ArmRange(a, b) =>
                val s = a.fold(lo)(x =>
                  math.max(GraftRuntimeFilter.prefixLong(x, w), lo))
                val e = b.fold(hi)(x =>
                  math.min(GraftRuntimeFilter.prefixLong(x, w), hi))
                math.max(0L, e - s).toDouble / (hi - lo).toDouble
            }.sum * effRows(leg.manifest)
        }
      }
    }.sum

}

/** Public plan seam for harnesses outside this package (PerfEval,
  * specs): whether any graft scan under `df`'s executed plan had a
  * route declined by the selectivity guard. */
object GraftRouteSeams {
  def guardDeclined(df: DataFrame): Boolean =
    GraftPlanSeams.scansOf[GraftGuardedRoute](df).exists(_.routeGuardDeclined)
}
