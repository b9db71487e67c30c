package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Join, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}
import org.apache.spark.sql.sources

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
  *    itself; over-cap or non-encodable values decline silently and the
  *    plan runs un-pruned.
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
  *  - the dim subtree must be fully deterministic and non-streaming
  *    (it executes twice: once for the prune, once in the join);
  *  - at most ONE side of a join is pruned (pruning both would make each
  *    scan's build plan contain the other — a collect cycle).
  */
private[sql] trait GraftRuntimeFilterable extends SupportsRuntimeFiltering {

  /** Columns runtime key values can prune on, STRONGEST FIRST: the key
    * (`row` / the declared key head) always; the wide door additionally
    * exposes its ROUTABLE indexed value columns (a runtime In on one of
    * those prunes through the index route — probe + gather + verify —
    * instead of the key ranges). */
  def runtimeFilterAttributes: Seq[String]

  /** Encode one runtime literal of `attr` into probe bytes under that
    * column's codec; None = not encodable (the whole filter declines). */
  protected def encodeRuntimeKey(attr: String, v: Any): Option[Array[Byte]]

  /** False when this scan carries pushed state runtime pruning would
    * corrupt (LIMIT / TopN: pruning changes which k rows surface). */
  private[sql] def runtimeFilterEligible: Boolean

  // ---- state: a directly-set key list (the official interface) or a
  // deferred build-side plan (the rule), resolved once per scan. At most
  // ONE attribute is pruned per scan (first attach wins).
  @volatile private var directKeys: Option[(String, Seq[Array[Byte]])] = None
  @volatile private var probePlan
      : Option[(String, LogicalPlan, Expression, Int)] = None
  @volatile private var resolved
      : Option[Option[(String, Seq[Array[Byte]])]] = None
  @volatile private var attempted = false
  @volatile private var collecting = false

  /** Seam: the rule attached a probe (or filter() was called). */
  private[sql] def runtimeAttempted: Boolean = attempted
  /** Seam: runtime keys were actually applied to this scan. */
  private[sql] def runtimePruned: Boolean =
    directKeys.isDefined || resolved.exists(_.isDefined)

  private[sql] def attachRuntimeProbe(attr: String, dim: LogicalPlan,
      keyExpr: Expression, maxKeys: Int): Unit =
    if (!attempted && runtimeFilterEligible &&
        runtimeFilterAttributes.contains(attr)) {
      attempted = true
      probePlan = Some((attr, dim, keyExpr, maxKeys))
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

  /** The runtime (attribute, key probes) for this execution — collects
    * the attached build plan on first use (cached; declines over-cap,
    * non-encodable values, and any execution failure — an optimization
    * must never fail the query it optimizes). */
  protected def currentRuntimeKeys(spark: SparkSession)
      : Option[(String, Seq[Array[Byte]])] =
    directKeys.orElse {
      resolved match {
        case Some(r) => r
        case None =>
          val r =
            if (collecting) None // re-entrant build (defensive): decline
            else probePlan.flatMap { case (attr, dim, expr, maxKeys) =>
              collecting = true
              try collectKeys(spark, attr, dim, expr, maxKeys)
              finally collecting = false
            }
          resolved = Some(r)
          r
      }
    }

  private def collectKeys(spark: SparkSession, attr: String,
      dim: LogicalPlan, keyExpr: Expression, maxKeys: Int)
      : Option[(String, Seq[Array[Byte]])] =
    try {
      val proj = Project(Seq(Alias(keyExpr, "_graft_rk")()), dim)
      val vals = org.apache.spark.sql.graft.SparkInternals.ofRows(spark, proj)
        .filter(org.apache.spark.sql.functions.col("_graft_rk").isNotNull)
        .distinct()
        .limit(maxKeys + 1)
        .collect()
        .map(_.get(0))
      if (vals.length > maxKeys) None
      else {
        val enc = vals.toSeq.map(encodeRuntimeKey(attr, _))
        if (enc.forall(_.isDefined)) Some((attr, enc.flatten)) else None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}

/** Public seam for harnesses (PerfEval, specs outside this package):
  * whether any graft scan under `df`'s plan attached / applied runtime
  * keys. Inspect AFTER executing the frame — application happens at
  * execution. */
object GraftRuntimeFilter {
  import org.apache.spark.sql.DataFrame
  private def scans(df: DataFrame): Seq[GraftRuntimeFilterable] =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan match {
        case w: V1ScanWrapper => w.v1Scan
        case s => s
      }
    }.collect { case g: GraftRuntimeFilterable => g }
  def attempted(df: DataFrame): Boolean = scans(df).exists(_.runtimeAttempted)
  def pruned(df: DataFrame): Boolean = scans(df).exists(_.runtimePruned)
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
            !scan.runtimeAttempted && scan.runtimeFilterEligible &&
            !dim.isStreaming && deterministicPlan(dim) &&
            dim.stats.sizeInBytes <= maxBuildBytes =>
        scan.attachRuntimeProbe(leafAttr.name, dim, dimExpr, maxKeys)
        scan.runtimeAttempted
      case _ => false
    }

  /** Row-wise lineage only: walk `attr` down through Project aliasing /
    * Filter / SubqueryAlias to a graft scan relation. Anything else
    * (Aggregate, Window, Join, Generate...) stops the walk — pruning
    * below those is not generally sound. */
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

  private def deterministicPlan(p: LogicalPlan): Boolean =
    p.find(n => !n.expressions.forall(_.deterministic)).isEmpty
}
