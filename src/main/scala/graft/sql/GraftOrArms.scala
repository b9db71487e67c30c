package graft.sql

import graft.core.Bytes
import graft.read.SecondaryIndex.{ArmIn, ArmRange, ValueArm}
import org.apache.spark.sql.sources

/** Normalizes a pushed `Or` tree into a bounded union of per-column
  * probe ARMS — the routing form of the reference's
  * `FilterList(MUST_PASS_ONE)` (`hbase/filter/FilterList.java:47-49`,
  * evaluated server-side): a disjunction of equalities / IN lists /
  * intervals on ONE column becomes a single OR-of-probes pass
  * ([[graft.read.SecondaryIndex.probeOr]]) instead of a full scan.
  *
  * The tree parses when every disjunct is a leaf predicate (or an
  * AND-conjunction of interval leaves, which intersects into one arm) on
  * the SAME column, and the total arm count stays within `maxArms` —
  * past the cap the disjunction falls back to the residual full scan
  * (the probe predicate must stay bounded). Any unparseable shape
  * returns None; the filter always STAYS residual either way, so parsing
  * is pure routing, never semantics. */
/** Column combinators for LARGE predicate disjunctions/conjunctions.
  * A linear `reduce(_ || _)` nests one level per operand; past a few
  * hundred operands (runtime key probes go to 1,024) the Column →
  * Expression conversion recurses past the thread stack. A BALANCED
  * tree keeps the depth at log2(n). */
private[sql] object GraftCols {
  import org.apache.spark.sql.Column

  /** The Or-of-row-ranges predicate (`[lo, hi) ∪ ...` on `df`'s binary
    * `row` column, lo inclusive / hi exclusive / None open), built as a
    * BALANCED disjunction — the ONE builder every range-disjunction
    * site uses (static keyRangeOr, runtime over-cap ranges, the mixed
    * routes' branch split), so they stay uniformly stack-safe and a
    * semantics fix lands once. `rs` must be non-empty (callers record
    * only non-empty sets). */
  def rowRangesPred(df: org.apache.spark.sql.DataFrame,
      rs: Seq[(Option[Array[Byte]], Option[Array[Byte]])]): Column = {
    import org.apache.spark.sql.functions.lit
    orAll(rs.map { case (lo, hi) =>
      (lo.map(b => df("row") >= lit(b)) ++ hi.map(b => df("row") < lit(b)))
        .reduceOption(_ && _).getOrElse(lit(true))
    })
  }

  def orAll(ps: Seq[Column]): Column = {
    // the combinator exists to avoid stack overflows — it must not
    // introduce one itself: length 0 would recurse on empty halves
    // forever under the bare `case n` arm
    require(ps.nonEmpty, "orAll of an empty arm list (caller must " +
      "handle the vacuous disjunction — usually lit(false))")
    ps.length match {
      case 1 => ps.head
      case n => orAll(ps.take(n / 2)) || orAll(ps.drop(n / 2))
    }
  }
}

private[sql] object GraftOrArms {

  private def maxLo(a: Option[Array[Byte]], b: Option[Array[Byte]]) =
    (a, b) match {
      case (Some(x), Some(y)) => Some(if (Bytes.compareTo(x, y) >= 0) x else y)
      case _ => a.orElse(b)
    }
  private def minHi(a: Option[Array[Byte]], b: Option[Array[Byte]]) =
    (a, b) match {
      case (Some(x), Some(y)) => Some(if (Bytes.compareTo(x, y) <= 0) x else y)
      case _ => a.orElse(b)
    }

  /** One parsed DISJUNCT: its conjunctive LEGS, each (column, arm).
    * Plain leaves are single-leg; in superset mode an And disjunct
    * whose BOTH sides parsed keeps every side's legs — a multi-leg
    * member whose candidate set a route may serve as the INTERSECTION
    * of its legs' probes (each leg alone is already a value superset
    * of the conjunction, so any subset of legs stays sound). */
  private type Conj = Seq[(String, ValueArm)]

  private def disjuncts(f: sources.Filter,
      leaf: sources.Filter => Option[(String, ValueArm)],
      superset: Boolean)
      : Option[Seq[Conj]] = {
    def disj(g: sources.Filter): Option[Seq[Conj]] = g match {
      case sources.Or(a, b) =>
        for { x <- disj(a); y <- disj(b) } yield x ++ y
      case sources.And(a, b) =>
        // interval conjuncts intersect into one arm (`x >= 5 AND x < 9`);
        // in strict mode anything else inside an And bails the parse
        val ca = disj(a)
        val cb = disj(b)
        ((ca, cb) match {
          case (Some(Seq(Seq((c1, ArmRange(l1, h1))))),
              Some(Seq(Seq((c2, ArmRange(l2, h2)))))) if c1 == c2 =>
            Some(Seq(Seq((c1, ArmRange(maxLo(l1, l2), minHi(h1, h2))))))
          case _ => None
        }).orElse {
          // SUPERSET conjunction (`(a = 1 AND b = 2) OR c = 3`): a row
          // satisfying the conjunction satisfies each conjunct, so any
          // side's arms are a value superset of the And — sound ONLY
          // because every caller keeps the whole Or residual (routing,
          // never semantics). Both single-disjunct sides keep ALL
          // their legs (r13: the route intersects multi-leg members'
          // probes before the gather); an Or-bearing side falls back
          // to the r12 tighter-side pick. Tried AFTER the exact forms
          // (same-column intersect above; the tuple-OR composite route
          // at the call site), so exact probes keep precedence.
          if (!superset) None
          else (ca, cb) match {
            case (Some(Seq(la)), Some(Seq(lb))) => Some(Seq(la ++ lb))
            case _ => Seq(ca, cb).flatten match {
              case Nil => None
              case picks => Some(picks.minBy(as =>
                (armCount(as), as.flatten.count(_._2.isInstanceOf[ArmRange]))))
            }
          }
        }
      case other => leaf(other).map(a => Seq(Seq(a)))
    }
    disj(f)
  }

  private def armCount(as: Seq[Conj]): Int =
    as.flatten.map(_._2 match {
      case ArmIn(vs) => vs.size
      case _ => 1
    }).sum

  /** The tightest leg of a conjunctive member — fewest arms, equalities
    * before ranges (the r12 single-pick, now per member). */
  private def pickLeg(c: Conj): (String, ValueArm) =
    c.minBy(l => (l._2 match {
      case ArmIn(vs) => vs.size
      case _ => 1
    }, if (l._2.isInstanceOf[ArmRange]) 1 else 0))

  /** Parse `f` (an `Or` tree) into `(column, arms)`. `leaf` encodes one
    * comparison leaf under the door's codec; None from it fails the
    * whole parse. Multi-leg members reduce to their tightest leg (a
    * value superset — the single-column route has no intersect form). */
  def parse(f: sources.Filter,
      leaf: sources.Filter => Option[(String, ValueArm)],
      maxArms: Int, superset: Boolean = false)
      : Option[(String, Seq[ValueArm])] =
    disjuncts(f, leaf, superset).flatMap { cs =>
      val as = cs.map(pickLeg)
      val cols = as.map(_._1).distinct
      if (cols.sizeIs == 1 && armCount(as.map(Seq(_))) <= maxArms)
        Some((cols.head, as.map(_._2)))
      else None
    }

  /** [[parse]] generalized ACROSS columns — the full
    * `FilterList(MUST_PASS_ONE)` shape (`custkey = 7 OR status = 'F'`,
    * heterogeneous filters composed, `hbase/filter/FilterList.java:
    * 47-49`): every disjunct is still a leaf (or an And of interval
    * leaves on ONE column, intersected; or, superset mode, an And whose
    * every side parsed — kept as a multi-leg member), but the leaves
    * may name DIFFERENT columns. Single-leg members group by column in
    * first-appearance order (their probes union anyway); multi-leg
    * members stay separate so the route can intersect their legs.
    * Requires ≥ 2 distinct columns overall (one column is [[parse]]'s
    * job) and the TOTAL arm count within `maxArms` — past the cap the
    * disjunction falls back to the residual full scan. */
  def parseMulti(f: sources.Filter,
      leaf: sources.Filter => Option[(String, ValueArm)],
      maxArms: Int, superset: Boolean = false)
      : Option[Seq[Seq[(String, Seq[ValueArm])]]] =
    disjuncts(f, leaf, superset).flatMap { cs =>
      val cols = cs.flatten.map(_._1).distinct
      if (cols.sizeIs >= 2 && armCount(cs) <= maxArms) {
        val singles = cs.filter(_.sizeIs == 1).map(_.head)
        val grouped = singles.map(_._1).distinct.map(c =>
          Seq(c -> singles.collect { case (`c`, arm) => arm }))
        val multi = cs.filter(_.sizeIs > 1).map(_.map {
          case (c, arm) => c -> Seq(arm)
        })
        Some(grouped ++ multi)
      } else None
    }
}
