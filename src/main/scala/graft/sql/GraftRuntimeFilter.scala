package graft.sql

import graft.core.Bytes
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, AttributeSet, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, BitAndAgg, BitOrAgg, BitXorAgg, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, DeduplicateWithinWatermark, Filter => LFilter, GlobalLimit, Join, LocalLimit, LogicalPlan, Offset, Project, Sample, SubqueryAlias, Tail}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}
import org.apache.spark.sql.sources

/** One resolved runtime (join-driven) probe on a scan attribute: either
  * the dim's distinct encoded join-key values (at or under the key cap)
  * or — over the cap — encoded byte RANGES covering [min, max] of the
  * join keys. Both are value SUPERSETS of the dim's keys under the
  * column's codec, and the join above re-checks the equality, so either
  * form is pruning-only. The range form is the graceful degradation for
  * mid-size dims (10k–1M keys — exactly where 100 TB star joins live):
  * instead of declining entirely past `maxKeys`, the scan still skips
  * every row group outside the dim's key span. */
private[sql] sealed trait RuntimeProbe { def attr: String }
private[sql] final case class RuntimeKeys(attr: String,
    keys: Seq[Array[Byte]]) extends RuntimeProbe
private[sql] final case class RuntimeRanges(attr: String,
    ranges: Seq[(Option[Array[Byte]], Option[Array[Byte]])])
    extends RuntimeProbe

/** Runtime (join-driven) key pruning for the graft SQL doors — the
  * dynamic twin of the static `row IN (...)` multiGet span prune
  * (`read/Scan.scala` multiGet; the reference never scans regions a key
  * batch does not touch — its client routes each Get of a batch to only
  * the regions owning those keys, `HConnectionManager`-style location
  * lookup). Here: a `fact JOIN dim ON fact.key = dim.k` re-prunes the
  * fact scan's key ranges with dim's ACTUAL key values at execution, so
  * the fact side reads O(|dim| probes) instead of O(table) — at 100 TB
  * the difference between touching a handful of parquet row groups and
  * scanning the fact table into a join.
  *
  * Two layers:
  *  - the scans implement the official
  *    [[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]]
  *    (`filterAttributes` = the key column; `filter(In(key, vs))` =
  *    re-prune). Spark only DRIVES that interface for scans planned as
  *    V2 `Batch`es (`BatchScanExec`); both graft doors deliberately plan
  *    through the `V1Scan` bridge (batch resolution is a DataFrame-level
  *    merge, not a per-file read), and Spark's `V1ScanWrapper` does not
  *    forward the interface — so stock runtime filtering never fires.
  *  - [[GraftRuntimeFilterRule]] (wired into
  *    `spark.experimental.extraOptimizations`, AFTER V2 pushdown like
  *    [[GraftStatsRule]]) is the activation path: it finds eligible
  *    joins, and ATTACHES the dim subtree to the fact scan. The scan
  *    evaluates it lazily at execution (`collect` of ≤ maxKeys distinct
  *    join-key values — the same out-of-band build-side execution
  *    Spark's own DPP does via SubqueryBroadcastExec) and re-prunes
  *    itself. Past the cap, one cheap min/max aggregate over the same
  *    dim subtree degrades the probe to a key-RANGE superset (still
  *    row-group-prunable); non-encodable values or any execution
  *    failure decline silently and the plan runs un-pruned.
  *
  * Soundness: the join stays in the plan and re-checks the equality, so
  * pruning only needs to KEEP every fact row that could match — an
  * `In(key, dimKeys)` superset filter by construction (the wide door's
  * head-prefix probes are supersets for multi-part keys; the join drops
  * the tail mismatches). Restrictions enforced here:
  *  - join types Inner / LeftSemi, the fact on the probe side (an outer
  *    side must keep its unmatched rows);
  *  - the fact key reaches the scan through row-wise operators only
  *    (Project aliasing / Filter / SubqueryAlias — never Aggregate,
  *    Window or Generate, whose output is not row-lineage);
  *  - the scan declines when a LIMIT/TopN was pushed (pruning would
  *    change WHICH k rows surface) — see `runtimeFilterEligible`;
  *  - the dim subtree must be fully deterministic, non-streaming, and
  *    free of row-SELECTION nodes (LIMIT / TABLESAMPLE / TAIL / OFFSET):
  *    it executes twice — once for the probe collect, once in the join —
  *    and a limit/sample without a defining order can return DIFFERENT
  *    row sets across executions, which would prune fact rows the join's
  *    second execution actually matches (Spark's own DPP avoids this by
  *    reusing the build-side exchange; here the decline is the sound
  *    equivalent);
  *  - one probe per scan ATTRIBUTE (a fact joined to two dims on two
  *    routed columns intersects both probe sets — key ranges ∩ index
  *    route); at most ONE side of a join is pruned (pruning both would
  *    make each scan's build plan contain the other — a collect cycle).
  *
  * PLAN-ONCE semantics: a scan resolves its probes once and caches them
  * for the life of the planned frame. This is consistent by
  * construction with re-execution: the graft doors pin their manifest at
  * planning (`plannedManifest` / the captured wide manifest), so a
  * re-executed frame reads the SAME pinned fact and dim data the probe
  * was collected from — a dim mutation between executions is invisible
  * to both the join and the prune (RuntimeFilterSpec pins this). */
private[sql] trait GraftRuntimeFilterable extends SupportsRuntimeFiltering {

  /** Columns runtime key values can prune on, STRONGEST FIRST: the key
    * (`row` / the declared key head) always; the wide door additionally
    * exposes its ROUTABLE indexed value columns (a runtime In on one of
    * those prunes through the index route — probe + gather + verify —
    * instead of the key ranges). */
  def runtimeFilterAttributes: Seq[String]

  /** Encode one runtime literal of `attr` into probe bytes under that
    * column's codec; None = not encodable (the whole probe declines). */
  protected def encodeRuntimeKey(attr: String, v: Any): Option[Array[Byte]]

  /** Encode the CLOSED value interval [min, max] of `attr` into byte
    * ranges (lo inclusive, hi exclusive, None = open) that form a value
    * SUPERSET of the interval under the column's codec — the over-cap
    * degradation. None = range pruning unsupported for this attribute
    * (the probe declines; doors support it on the key/row head only,
    * where ranges prune row groups — a value-range has no index form). */
  protected def encodeRuntimeRange(attr: String, min: Any, max: Any)
      : Option[Seq[(Option[Array[Byte]], Option[Array[Byte]])]]

  /** SQL expression rendering `colName` (the probe frame's collected
    * key column) as the attribute's ENCODED bytes — the hook for
    * byte-PREFIX occupancy clustering of non-integral keys (see
    * [[clusterPrefixRuns]]). None = prefix clustering unsupported for
    * this attribute (the over-cap probe keeps the single [min, max]
    * envelope). Doors return it only where a byte range on the encoded
    * form is a VALUE superset: raw binary columns, UTF-8 strings. */
  protected def encodeRuntimeKeyBytesSql(attr: String, colName: String)
      : Option[String]

  /** Per-ATTRIBUTE exact-keys cap (default: the session cap). Doors
    * clamp VALUE attributes to the static probe cap (64): an exact-keys
    * probe past it builds a predicate that leaves whole-stage codegen
    * (interpreted per-arm evaluation — measured 9x the unpruned join it
    * was meant to beat), while the RANGE degradation it falls to keeps
    * ≤16 arms, wins where the dim's values cluster (the PE cluster
    * pairs), and is guard-declined where they scatter — where a
    * broadcast join over one scan is already the optimal plan and the
    * engine should refuse to pay probe machinery at all. */
  protected def runtimeKeyCap(attr: String, maxKeys: Int): Int = maxKeys

  /** False when this scan carries pushed state runtime pruning would
    * corrupt (LIMIT / TopN: pruning changes which k rows surface). */
  private[sql] def runtimeFilterEligible: Boolean

  // ---- state: a directly-set key list (the official interface) and/or
  // deferred build-side plans (the rule), resolved once per scan. One
  // probe per ATTRIBUTE (first attach per attr wins).
  @volatile private var directKeys: Option[(String, Seq[Array[Byte]])] = None
  @volatile private var probePlans
      : List[(String, LogicalPlan, Expression, Int)] = Nil
  @volatile private var resolvedProbes: Option[Seq[RuntimeProbe]] = None
  @volatile private var attempted = false
  @volatile private var collecting = false

  /** Seam: the rule attached a probe (or filter() was called). */
  private[sql] def runtimeAttempted: Boolean = attempted
  /** Seam: runtime probes were actually applied to this scan. */
  private[sql] def runtimePruned: Boolean =
    directKeys.isDefined || resolvedProbes.exists(_.nonEmpty)
  /** Seam: the applied probes' (attribute, form) pairs — form is
    * "keys" or "range" (specs assert the over-cap degradation and the
    * multi-attribute intersection). */
  private[sql] def runtimeProbeShapes: Seq[(String, String)] =
    directKeys.map(d => (d._1, "keys")).toSeq ++
      resolvedProbes.getOrElse(Nil).map {
        case RuntimeKeys(a, _) => (a, "keys")
        case RuntimeRanges(a, _) => (a, "range")
      }

  /** Seam: the byte-range count of each applied RANGE probe (specs and
    * PerfEval assert the over-cap CLUSTERED degradation — a two-cluster
    * dim must produce > 1 run, maxRanges=1 must collapse to the single
    * [min, max] span). */
  private[sql] def runtimeRangeCounts: Seq[(String, Int)] =
    resolvedProbes.getOrElse(Nil).collect {
      case RuntimeRanges(a, rs) => (a, rs.size)
    }

  private[sql] def runtimeHasProbe(attr: String): Boolean =
    directKeys.exists(_._1 == attr) || probePlans.exists(_._1 == attr)

  private[sql] def attachRuntimeProbe(attr: String, dim: LogicalPlan,
      keyExpr: Expression, maxKeys: Int): Unit =
    if (runtimeFilterEligible && !runtimeHasProbe(attr) &&
        resolvedProbes.isEmpty && runtimeFilterAttributes.contains(attr)) {
      attempted = true
      probePlans = probePlans :+ ((attr, dim, keyExpr, maxKeys))
    }

  // ---- the official SupportsRuntimeFiltering surface
  override def filterAttributes(): Array[NamedReference] =
    runtimeFilterAttributes.map(Expressions.column).toArray

  override def filter(filters: Array[sources.Filter]): Unit =
    if (runtimeFilterEligible) filters.foreach {
      case sources.In(c, vs)
          if runtimeFilterAttributes.contains(c) && vs != null &&
            directKeys.isEmpty =>
        attempted = true
        val enc = vs.toSeq.filter(_ != null).map(encodeRuntimeKey(c, _))
        if (enc.forall(_.isDefined)) directKeys = Some((c, enc.flatten))
      case _ => ()
    }

  /** The runtime probes for this execution — collects each attached
    * build plan on first use (cached for the life of the planned frame;
    * declines per-probe on non-encodable values and any execution
    * failure — an optimization must never fail the query it optimizes). */
  protected def currentRuntimeProbes(spark: SparkSession)
      : Seq[RuntimeProbe] = {
    val fromPlans = resolvedProbes match {
      case Some(r) => r
      case None =>
        val r =
          if (collecting) Nil // re-entrant build (defensive): decline
          else {
            collecting = true
            try probePlans.flatMap { case (attr, dim, expr, maxKeys) =>
              collectProbe(spark, attr, dim, expr, maxKeys)
            }
            finally collecting = false
          }
        resolvedProbes = Some(r)
        r
    }
    directKeys.map(d => RuntimeKeys(d._1, d._2)).toSeq ++ fromPlans
  }

  private def collectProbe(spark: SparkSession, attr: String,
      dim: LogicalPlan, keyExpr: Expression, sessionMaxKeys: Int)
      : Option[RuntimeProbe] =
    try {
      import org.apache.spark.sql.functions.{col, max, min}
      val maxKeys = runtimeKeyCap(attr, sessionMaxKeys)
      val proj = Project(Seq(Alias(keyExpr, "_graft_rk")()), dim)
      val raw = org.apache.spark.sql.graft.SparkInternals.ofRows(spark, proj)
        .filter(col("_graft_rk").isNotNull)
      val vals = raw.distinct().limit(maxKeys + 1).collect().map(_.get(0))
      // only the OVER-CAP branch re-reads the frame (min/max aggregate +
      // bucket-occupancy distinct), so only it persists — the common
      // under-cap case stays a single unpersisted pass. Bounded: the
      // build side is gated to broadcast size at attach.
      val frame =
        if (vals.length > maxKeys)
          raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else raw
      try {
      if (vals.length > maxKeys) {
        // over the cap: degrade to the key-range superset — one cheap
        // aggregate over the same (size-gated) dim subtree yields exact
        // [min, max]; the door encodes it into prunable byte ranges.
        // For integral keys the span is further CLUSTERED into at most
        // maxRanges gap-separated runs (see clusterRuns); string/binary
        // keys cluster by a fixed-width byte PREFIX of the encoded form
        // instead (clusterPrefixRuns, r13) — either way a dim whose
        // keys live in a few regions of the fact key space skips the
        // empty regions too, not just the outside of [min, max].
        val mm = frame.agg(min(col("_graft_rk")), max(col("_graft_rk")))
          .collect().headOption
        mm.filter(r => !r.isNullAt(0) && !r.isNullAt(1)).flatMap { r =>
          val (lo, hi) = (r.get(0), r.get(1))
          val envelope = encodeRuntimeRange(attr, lo, hi)
          val runs = clusterRuns(spark, frame, lo, hi)
          val clustered =
            if (runs.sizeIs > 1) {
              val enc = runs.map { case (a, b) =>
                encodeRuntimeRange(attr, a, b)
              }
              if (enc.forall(_.isDefined)) Some(enc.flatMap(_.get)) else None
            } else None
          clustered
            .orElse(clusterPrefixRuns(spark, frame, attr, lo, hi, envelope))
            .orElse(envelope)
            .map(RuntimeRanges(attr, _))
        }
      } else {
        val enc = vals.toSeq.map(encodeRuntimeKey(attr, _))
        if (enc.forall(_.isDefined)) Some(RuntimeKeys(attr, enc.flatten))
        else None
      }
      } finally { if (vals.length > maxKeys) frame.unpersist(false) }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Cluster an over-cap dim's INTEGRAL key span [lo, hi] into at most
    * `spark.graft.runtimeFilter.maxRanges` (default 16) CLOSED value
    * runs covering every key, by bucketing `(k - lo) / width` into
    * `spark.graft.runtimeFilter.rangeBuckets` (default 4096) cells and
    * merging occupied cells — keeping the widest empty gaps as
    * separators. Soundness is per-bucket: every key lands in its
    * bucket's value range, so the union of occupied-bucket runs is a
    * value superset of the dim's keys (runs are built from occupancy,
    * never from a sample). Costs one extra distinct over the same
    * size-gated dim subtree; any non-integral type, huge span, bucket
    * overflow, or failure falls back to the single [lo, hi] run. */
  private def clusterRuns(spark: SparkSession, frame: => org.apache.spark.sql.DataFrame,
      lo: Any, hi: Any): Seq[(Any, Any)] = {
    val single = Seq((lo, hi))
    def asLong(v: Any): Option[Long] = v match {
      case i: java.lang.Integer => Some(i.longValue)
      case l: java.lang.Long => Some(l.longValue)
      case s: java.lang.Short => Some(s.longValue)
      case b: java.lang.Byte => Some(b.longValue)
      case _ => None
    }
    def back(v: Long): Any = lo match {
      case _: java.lang.Integer => java.lang.Integer.valueOf(v.toInt)
      case _: java.lang.Long => java.lang.Long.valueOf(v)
      case _: java.lang.Short => java.lang.Short.valueOf(v.toShort)
      case _: java.lang.Byte => java.lang.Byte.valueOf(v.toByte)
      case _ => v
    }
    try {
      val maxRanges = spark.conf
        .get("spark.graft.runtimeFilter.maxRanges", "16").toInt
      val buckets = spark.conf
        .get("spark.graft.runtimeFilter.rangeBuckets", "4096").toInt
      (asLong(lo), asLong(hi)) match {
        case (Some(l), Some(h))
            if maxRanges > 1 && buckets > 1 &&
              // (k - l) must not overflow and the span must outsize the
              // grid (a narrower span prunes fine as one run)
              BigInt(h) - BigInt(l) < BigInt(Long.MaxValue) &&
              h - l >= buckets.toLong =>
          val width = ((BigInt(h) - BigInt(l) + 1 + buckets - 1) / buckets)
            .toLong
          // integer DIV, not `/` (double division loses bits past 2^53 —
          // a key mis-bucketed at a boundary would break the superset)
          val ids = frame
            .selectExpr(s"(CAST(_graft_rk AS BIGINT) - ${l}L) DIV ${width}L"
              + " AS _graft_b")
            .distinct().limit(buckets + 1).collect().map(_.getLong(0))
          if (ids.isEmpty || ids.length > buckets) single
          else mergeIdRuns(ids.sorted, maxRanges).map { case (s, e) =>
            // BigInt bounds clamped into [l, h] before narrowing —
            // (e + 1) * width can pass Long.MaxValue near the top
            def clamp(v: BigInt): Long =
              v.max(BigInt(l)).min(BigInt(h)).toLong
            (back(clamp(BigInt(l) + BigInt(s) * width)),
              back(clamp(BigInt(l) + (BigInt(e) + 1) * width - 1)))
          }
        case _ => single
      }
    } catch { case scala.util.control.NonFatal(_) => single }
  }

  /** Occupied cells -> contiguous runs of sorted bucket ids, merged
    * down to `maxRanges` by keeping the (maxRanges - 1) WIDEST gaps as
    * separators (shared by the integral and byte-prefix clusterings). */
  private def mergeIdRuns(sorted: Seq[Long], maxRanges: Int)
      : Vector[(Long, Long)] = {
    val runs = sorted.tail.foldLeft(List((sorted.head, sorted.head))) {
      case ((s, e) :: rest, id) if id == e + 1 => (s, id) :: rest
      case (acc, id) => (id, id) :: acc
    }.reverse.toVector
    if (runs.size <= maxRanges) runs
    else {
      val keep = runs.indices.tail
        .sortBy(i => -(runs(i)._1 - runs(i - 1)._2))
        .take(maxRanges - 1).sorted
      (Seq(0) ++ keep :+ runs.size).sliding(2).map { w =>
        (runs(w(0))._1, runs(w(1) - 1)._2)
      }.toVector
    }
  }

  /** Cluster an over-cap dim's STRING/BINARY keys (r13): bucket a
    * fixed-width byte PREFIX of each ENCODED key — 7 bytes, so the
    * hex/conv round trip stays inside a non-negative signed long — by
    * the same occupancy grid as [[clusterRuns]], and map occupied-run
    * boundaries back to byte ranges. Soundness per bucket run [s, e]
    * (7-byte prefixes as big-endian longs): every key k with
    * paddedPrefix(k) ∈ [s, e] satisfies
    * `stripTrailingZeros(bytes(s)) <= k < prefixSuccessor(bytes(e))` —
    * the lower bound because stripping a 0x00 tail only moves a bound
    * DOWN past any key whose padding produced it, the upper because
    * prefixSuccessor exceeds every extension of a <= prefix. Each run
    * additionally intersects the known-sound [min, max] `envelope`, so
    * the union stays a value superset built from occupancy, never a
    * sample. Supported only where the door vouches (encodeRuntimeKeyBytesSql)
    * that encoded-byte ranges are value supersets: raw binary columns
    * and UTF-8 strings (order-preserving codecs). Declines (None) on a
    * shared 7-byte prefix, bucket overflow, or any failure — the caller
    * falls back to the envelope. */
  private def clusterPrefixRuns(spark: SparkSession,
      frame: org.apache.spark.sql.DataFrame, attr: String, lo: Any, hi: Any,
      envelope: Option[Seq[(Option[Array[Byte]], Option[Array[Byte]])]])
      : Option[Seq[(Option[Array[Byte]], Option[Array[Byte]])]] =
    try {
      val maxRanges = spark.conf
        .get("spark.graft.runtimeFilter.maxRanges", "16").toInt
      val buckets = spark.conf
        .get("spark.graft.runtimeFilter.rangeBuckets", "4096").toInt
      val w = 7
      for {
        sqlBytes <- encodeRuntimeKeyBytesSql(attr, "_graft_rk")
        if maxRanges > 1 && buckets > 1
        loB <- encodeRuntimeKey(attr, lo)
        hiB <- encodeRuntimeKey(attr, hi)
        loP = GraftRuntimeFilter.prefixLong(loB, w)
        hiP = GraftRuntimeFilter.prefixLong(hiB, w)
        if hiP > loP
        width = ((BigInt(hiP) - BigInt(loP) + buckets) / buckets)
          .max(1).toLong
        ids = frame.selectExpr(
            s"(CAST(conv(hex(rpad(substring($sqlBytes, 1, $w), $w, x'00'))" +
              s", 16, 10) AS BIGINT) - ${loP}L) DIV ${width}L AS _graft_b")
          .distinct().limit(buckets + 1).collect().map(_.getLong(0))
        if ids.nonEmpty && ids.length <= buckets
      } yield {
        def maxLoB(a: Option[Array[Byte]], b: Option[Array[Byte]]) =
          (a, b) match {
            case (Some(x), Some(y)) =>
              Some(if (Bytes.compareTo(x, y) >= 0) x else y)
            case _ => a.orElse(b)
          }
        def minHiB(a: Option[Array[Byte]], b: Option[Array[Byte]]) =
          (a, b) match {
            case (Some(x), Some(y)) =>
              Some(if (Bytes.compareTo(x, y) <= 0) x else y)
            case _ => a.orElse(b)
          }
        val (envLo, envHi) = envelope match {
          case Some(Seq((a, b))) => (a, b)
          case _ => (None, None)
        }
        mergeIdRuns(ids.sorted, maxRanges).map { case (s, e) =>
          def clamp(v: BigInt): Long =
            v.max(BigInt(loP)).min(BigInt(hiP)).toLong
          val startP = clamp(BigInt(loP) + BigInt(s) * width)
          val endP = clamp(BigInt(loP) + (BigInt(e) + 1) * width - 1)
          (maxLoB(Some(stripTrailingZeros(prefixBytes(startP, w))), envLo),
            minHiB(Bytes.prefixSuccessor(prefixBytes(endP, w)), envHi))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def prefixBytes(v: Long, w: Int): Array[Byte] =
    Array.tabulate(w)(i => ((v >>> ((w - 1 - i) * 8)) & 0xff).toByte)

  private def stripTrailingZeros(b: Array[Byte]): Array[Byte] = {
    var n = b.length
    while (n > 0 && b(n - 1) == 0) n -= 1
    b.take(n)
  }
}

/** Public seam for harnesses (PerfEval, specs outside this package):
  * whether any graft scan under `df`'s plan attached / applied runtime
  * probes. Inspect AFTER executing the frame — application happens at
  * execution. */
object GraftRuntimeFilter {
  import org.apache.spark.sql.DataFrame

  /** First `w` bytes of `b` (0x00-right-padded) as a big-endian long —
    * the canonical prefix arithmetic shared by the byte-prefix
    * clustering above and the route guard's span estimate
    * ([[GraftRouteGuard]]), so the estimate's units can never drift
    * from the clustering's. */
  private[sql] def prefixLong(b: Array[Byte], w: Int): Long = {
    var v = 0L
    var i = 0
    while (i < w) {
      v = (v << 8) | (if (i < b.length) b(i) & 0xffL else 0L)
      i += 1
    }
    v
  }
  private def scans(df: DataFrame): Seq[GraftRuntimeFilterable] =
    GraftPlanSeams.scansOf[GraftRuntimeFilterable](df)
  def attempted(df: DataFrame): Boolean = scans(df).exists(_.runtimeAttempted)
  def pruned(df: DataFrame): Boolean = scans(df).exists(_.runtimePruned)
  /** (attribute, "keys"|"range") pairs applied across the frame's scans. */
  def probeShapes(df: DataFrame): Seq[(String, String)] =
    scans(df).flatMap(_.runtimeProbeShapes)
  /** (attribute, rangeCount) of applied RANGE probes (the clustered
    * over-cap degradation's seam). */
  def rangeCounts(df: DataFrame): Seq[(String, Int)] =
    scans(df).flatMap(_.runtimeRangeCounts)
}

/** The activation rule (see [[GraftRuntimeFilterable]]): for each
  * eligible `Join`, attach the build (dim) subtree to the probe-side
  * graft scan so it can re-prune its key ranges with the dim's actual
  * values at execution. Runs in `spark.experimental.extraOptimizations`
  * — after V2 pushdown created the V1 wrappers, before physical
  * planning. Plan-neutral: the tree is returned UNCHANGED (only scan
  * state is attached), so the fixpoint batch converges immediately. */
object GraftRuntimeFilterRule extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.runtimeFilter.enabled", "true").toBoolean
  private def maxKeys: Int =
    conf.getConfString("spark.graft.runtimeFilter.maxKeys", "1024").toInt
  /** Build sides up to this many (estimated) bytes qualify — default is
    * the session's broadcast threshold: "a dim small enough to
    * broadcast is small enough to enumerate". */
  private def maxBuildBytes: Long =
    conf.getConfString("spark.graft.runtimeFilter.maxBuildBytes",
      math.max(conf.autoBroadcastJoinThreshold, 0L).toString).toLong

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || maxBuildBytes <= 0L) return plan
    plan.foreach {
      case j @ Join(left, right, joinType, Some(cond), _) if !j.isStreaming =>
        val conjuncts = splitConjunctivePredicates(cond)
        // fact-on-left serves Inner and LeftSemi; fact-on-right only
        // Inner (a semi join's right side never reaches the output).
        // At most ONE side is attached per join — see the trait doc.
        val attached = joinType match {
          case Inner | LeftSemi => tryAttach(conjuncts, left, right)
          case _ => false
        }
        if (!attached) joinType match {
          case Inner => tryAttach(conjuncts, right, left): Unit
          case _ => ()
        }
      case _ => ()
    }
    plan
  }

  /** Try to attach `dim`'s join-key values to a graft scan under `fact`;
    * true when a probe was attached. */
  private def tryAttach(conjuncts: Seq[Expression], fact: LogicalPlan,
      dim: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        val pairs = Seq((a, b), (b, a))
        pairs.exists {
          case (f: AttributeReference, d)
              if f.references.subsetOf(fact.outputSet) &&
                d.references.nonEmpty &&
                d.references.subsetOf(dim.outputSet) && d.deterministic =>
            attachTo(f, fact, d, dim)
          case _ => false
        }
      case _ => false
    }

  private def attachTo(factAttr: AttributeReference, fact: LogicalPlan,
      dimExpr: Expression, dim: LogicalPlan): Boolean =
    lineage(factAttr, fact) match {
      case Some((leafAttr, scan: GraftRuntimeFilterable))
          if scan.runtimeFilterAttributes.contains(leafAttr.name) &&
            !scan.runtimeHasProbe(leafAttr.name) &&
            scan.runtimeFilterEligible &&
            !dim.isStreaming &&
            stableProbePlan(dim, dimExpr.references) &&
            dim.stats.sizeInBytes <= maxBuildBytes =>
        scan.attachRuntimeProbe(leafAttr.name, dim, dimExpr, maxKeys)
        scan.runtimeHasProbe(leafAttr.name)
      case _ => false
    }

  /** Row-wise lineage only: walk `attr` down through Project aliasing /
    * Filter / SubqueryAlias — and through a Join into the child that
    * OWNS the attribute (join columns pass through uncomputed, and the
    * attaching join's equality is re-checked above the whole subtree,
    * so pruning a scan under an intermediate join keeps every row that
    * could reach the output; this is what lets a fact inside
    * `(fact ⋈ dim1) ⋈ dim2` take dim2's probe too). Anything else
    * (Aggregate, Window, Generate...) stops the walk — pruning below
    * those is not generally sound. */
  @annotation.tailrec
  private def lineage(attr: Attribute, p: LogicalPlan)
      : Option[(Attribute, GraftRuntimeFilterable)] = p match {
    case Project(projList, child) =>
      projList.find(_.exprId == attr.exprId) match {
        case Some(a: AttributeReference) => lineage(a, child)
        case Some(Alias(a: AttributeReference, _)) => lineage(a, child)
        case _ => None
      }
    case f: LFilter => lineage(attr, f.child)
    case s: SubqueryAlias => lineage(attr, s.child)
    case j: Join if j.left.outputSet.contains(attr) => lineage(attr, j.left)
    case j: Join if j.right.outputSet.contains(attr) => lineage(attr, j.right)
    case r: DataSourceV2ScanRelation
        if r.output.exists(_.exprId == attr.exprId) =>
      (r.scan match {
        case w: V1ScanWrapper => w.v1Scan
        case s => s
      }) match {
        case g: GraftRuntimeFilterable => Some((attr, g))
        case _ => None
      }
    case _ => None
  }

  /** The probe executes the dim subtree OUT OF BAND (the join executes
    * it again), so the two executions must agree on the probe's key SET.
    * The strict core (`strictStable`): every expression deterministic,
    * no row-SELECTION node — GlobalLimit/LocalLimit/Tail/Offset/Sample
    * without a defining order can legally pick different rows per
    * execution — and no ORDER-DEPENDENT aggregate: `dropDuplicates
    * (subset)` optimizes to Aggregate(groupBy subset, first(others)),
    * and First/Last (and friends) report deterministic=true while
    * legally returning a DIFFERENT representative per execution as
    * shuffle order varies. Aggregates pass only when every aggregate
    * function is on a known order-INSENSITIVE whitelist; anything
    * unrecognized declines — a declined probe just runs unpruned.
    *
    * `refs` (the probe key expression's references) buys one sound
    * relaxation on the path from the root down through row-wise nodes:
    * a Deduplicate — or a First/Last-carrying Aggregate — whose dedup /
    * grouping KEYS cover every probe reference is accepted, because the
    * key SET is execution-stable even though the representative rows
    * are not (`dim.select(k).dropDuplicates("k")` — a very common dim
    * shape). A probe referencing any non-key column still declines. */
  private def stableProbePlan(p: LogicalPlan, refs: AttributeSet)
      : Boolean = p match {
    case s: SubqueryAlias => stableProbePlan(s.child, refs)
    case Project(list, child) =>
      list.forall(_.deterministic) && stableProbePlan(child,
        AttributeSet(list.filter(ne => refs.contains(ne.toAttribute))
          .flatMap(_.references)))
    case f: LFilter =>
      // the filter's row selection reads its condition columns, so the
      // child must be stable in those too (a filter over an unstable
      // dedup representative would make the key SET unstable)
      f.condition.deterministic &&
        stableProbePlan(f.child, refs ++ f.condition.references)
    case d: Deduplicate =>
      refs.subsetOf(AttributeSet(d.keys)) && stableProbePlan(d.child, refs)
    case a: Aggregate if a.expressions.forall(_.deterministic) =>
      val orderSensitive = a.aggregateExpressions.exists(_.exists {
        case ae: AggregateExpression => !orderInsensitive(ae)
        case _ => false
      })
      val ok = !orderSensitive || {
        // order-dependent aggregate VALUES are unstable, but the
        // grouping-key OUTPUT columns are not: a probe referencing only
        // those sees the child's distinct grouping tuples — stable when
        // the child's rows are
        val groupingOut = AttributeSet(a.aggregateExpressions.collect {
          case ne if a.groupingExpressions.exists(_.semanticEquals(
              ne match {
                case Alias(c, _) => c
                case e => e
              })) => ne.toAttribute
        })
        refs.subsetOf(groupingOut)
      }
      ok && strictStable(a.child)
    case other => strictStable(other)
  }

  private def strictStable(p: LogicalPlan): Boolean =
    p.find {
      case _: GlobalLimit | _: LocalLimit | _: Tail | _: Offset |
          _: Sample => true
      case _: Deduplicate | _: DeduplicateWithinWatermark => true
      case a: Aggregate =>
        a.aggregateExpressions.exists(_.exists {
          case ae: AggregateExpression => !orderInsensitive(ae)
          case _ => false
        }) || !a.expressions.forall(_.deterministic)
      case n => !n.expressions.forall(_.deterministic)
    }.isEmpty

  private def orderInsensitive(ae: AggregateExpression): Boolean =
    ae.aggregateFunction match {
      // Sum/Average only over EXACT arithmetic: floating-point addition
      // is non-associative, so a Double/Float sum can legally differ
      // across partition merge orders — the same execution-instability
      // class First/Last are declined for.
      case s: Sum => exactNumeric(s.child.dataType)
      case a: Average => exactNumeric(a.child.dataType)
      case _: Min | _: Max | _: Count |
          _: BitAndAgg | _: BitOrAgg | _: BitXorAgg => true
      case _ => false
    }

  private def exactNumeric(dt: org.apache.spark.sql.types.DataType)
      : Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _: DecimalType => true
      case _ => false
    }
  }
}


/** The ONE plan-walking seam: graft scans under a frame's optimized
  * plan, V1ScanWrapper unwrapped. Every harness seam (runtime-filter
  * probes, wide-route facts) goes through here so a Spark-upgrade
  * change to scan wrapping is fixed in one place. */
private[sql] object GraftPlanSeams {
  import org.apache.spark.sql.DataFrame
  import scala.reflect.ClassTag
  def scansOf[T](df: DataFrame)(implicit ct: ClassTag[T]): Seq[T] =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan match {
        case w: V1ScanWrapper => w.v1Scan
        case s => s
      }
    }.collect { case g: T => g }
}
