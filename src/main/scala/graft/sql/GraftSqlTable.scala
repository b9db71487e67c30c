package graft.sql

import graft.catalog.Catalog
import graft.core.{Bytes, Cell}
import graft.read.{Scan => GScan, ScanExec}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, FieldReference, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Avg, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{Scan => V2Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** One graft table as a DSv2 `Table`.
  *
  * Read path: filters Spark pushes down are translated onto the engine's
  * own [[graft.read.Scan]] spec — the SAME operator the facade uses, so
  * the sargable-range machinery (PrefixFilter successors, row-range →
  * parquet min/max pruning, family projection before resolve) is reused,
  * not re-derived. The data plane goes through the official `V1Scan`
  * fallback: the resolved DataFrame's RDD feeds Spark's
  * RowDataSourceScanExec. The inner plan (and its parquet pushdown) is
  * exactly the facade's, asserted by SqlCatalogSpec.
  *
  * Write path: `V1Write`/`InsertableRelation` → `Catalog.append` — an
  * `INSERT INTO graft.t` is the bulk put path with the usual manifest
  * commit. `DELETE FROM graft.t WHERE <row bounds> [AND family = 'f']`
  * writes DeleteFamily TOMBSTONES (the reference's `Delete` semantics —
  * `HTable.delete`, visibility at read time, snapshots unaffected), and
  * `TRUNCATE TABLE` is a `replaceData` to empty (`HBaseAdmin` truncate =
  * disable+drop+recreate; ours keeps history/snapshots reachable via
  * old manifests until vacuum).
  */
class GraftSqlTable(engine: Catalog, tableName: String,
    pinned: Option[graft.catalog.Manifest] = None)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  /** SQL `UPDATE` / `MERGE INTO` / predicate-general `DELETE` — the
    * checkAndMutate-shaped delta path (see [[GraftRowLevelOperation]]).
    * Sargable DELETEs never get here: Spark's metadata-delete rule
    * consults [[canDeleteWhere]] first and takes the tombstone-only
    * path; everything else reads matched cells and writes deltas. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(pinned.isEmpty,
      s"cannot ${info.command} a time-travel view of $tableName")
    () => new GraftRowLevelOperation(engine, tableName, info.command)
  }

  override def name(): String = tableName
  override def schema(): StructType = Cell.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ, TableCapability.V1_BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxVersions = GraftMicroBatchStream.parseMaxVersions(
      Option(options.get("maxVersionsPerTrigger")))
    new GraftScanBuilder(engine, tableName, pinned, maxVersions,
      Option(options.get("startingVersion")))
  }

  /** Deletable predicates: row bounds and at most one family equality —
    * the same sargable subset the read path pushes. Anything else makes
    * Spark fall back to an error (no silent full-table delete). */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    pinned.isEmpty && filters.forall {
      case sources.EqualTo("row", _: Array[Byte]) => true
      case sources.GreaterThanOrEqual("row", _: Array[Byte]) => true
      case sources.GreaterThan("row", _: Array[Byte]) => true
      case sources.LessThan("row", _: Array[Byte]) => true
      case sources.LessThanOrEqual("row", _: Array[Byte]) => true
      case sources.EqualTo("family", _: String) => true
      case sources.IsNotNull("row" | "family") => true
      case _: sources.AlwaysTrue => true
      case _ => false
    } && filters.count {
      case sources.EqualTo("family", _) => true; case _ => false
    } <= 1

  /** SQL `DELETE` as the reference's tombstone write: one DeleteFamily
    * cell per present (row, family) in the predicate's scope, stamped at
    * that group's max cell ts — masking exactly the current contents
    * (same <=-ts masking rule as `HBase Delete`; later writes with newer
    * stamps survive, snapshots and time travel keep the pre-delete
    * view). O(matching keys) appended, nothing rewritten. */
  override def deleteWhere(filters: Array[Filter]): Unit = {
    import org.apache.spark.sql.functions.{col, lit, max}
    require(pinned.isEmpty, s"cannot DELETE from a time-travel view of $tableName")
    // Collect the (logical) row bounds + family, then scope like any
    // read: on a salted table the bounds scatter over the salted order
    // and strip (filtering raw storage keys with logical bounds would
    // delete the wrong rows), on an unsalted one they filter directly.
    val d = engine.currentManifest(tableName).descriptor
    var start: Option[Array[Byte]] = None
    var stop: Option[Array[Byte]] = None
    var fam: Option[String] = None
    def tightenStart(b: Array[Byte]): Unit =
      if (start.forall(cur => Bytes.compareTo(b, cur) > 0)) start = Some(b)
    def tightenStop(b: Array[Byte]): Unit =
      if (stop.forall(cur => Bytes.compareTo(b, cur) < 0)) stop = Some(b)
    filters.foreach {
      case sources.EqualTo("row", v: Array[Byte]) =>
        tightenStart(v); tightenStop(Bytes.successor(v))
      case sources.GreaterThanOrEqual("row", v: Array[Byte]) => tightenStart(v)
      case sources.GreaterThan("row", v: Array[Byte]) =>
        tightenStart(Bytes.successor(v))
      case sources.LessThan("row", v: Array[Byte]) => tightenStop(v)
      case sources.LessThanOrEqual("row", v: Array[Byte]) =>
        tightenStop(Bytes.successor(v))
      case sources.EqualTo("family", f: String) => fam = Some(f)
      case _ => () // IsNotNull / AlwaysTrue — vetted by canDeleteWhere
    }
    GraftTombstones.write(engine, tableName, d, start, stop, fam)
  }

  /** `TRUNCATE TABLE` — a compaction-to-empty commit (history and
    * snapshot manifests still reference the old dirs until vacuum).
    * Checks readOnly HERE: `replaceData` deliberately has no guard (major
    * compaction is maintenance, allowed on read-only tables), but a
    * truncate is a data mutation like INSERT/DELETE. */
  override def truncateTable(): Boolean = {
    require(pinned.isEmpty, s"cannot TRUNCATE a time-travel view of $tableName")
    require(!engine.currentManifest(tableName).descriptor.readOnly,
      s"table $tableName is read-only")
    val spark = SparkSession.active
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], graft.core.Cell.schema)
    engine.replaceData(tableName, empty, GraftSqlCatalog.nowMs())
    true
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinned.isEmpty,
      s"cannot write to a time-travel view of $tableName")
    new WriteBuilder {
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              require(!overwrite, "INSERT OVERWRITE is not supported; " +
                "use DELETE tombstones or replaceData (compaction)")
              // SQL has no caller-supplied batch time; stamp from the wall
              // clock like the reference stamps server-side mutations.
              engine.append(tableName, data, GraftSqlCatalog.nowMs()): Unit
            }
          }
      }
    }
  }
}

/** The shared SQL-DELETE body (cell door row-bounds deletes and the wide
  * view's metadata deletes): one DeleteFamily tombstone per present
  * (row, family) in `[start, stop) x fam` (all present families when
  * None), stamped at that group's max cell ts — masking exactly the
  * current contents (`HBase Delete`'s <=-ts rule; later writes with
  * newer stamps survive, snapshots and time travel keep the pre-delete
  * view). O(matching keys) appended, nothing rewritten. */
private[sql] object GraftTombstones {
  def write(engine: Catalog, tableName: String,
      d: graft.catalog.TableDescriptor,
      start: Option[Array[Byte]], stop: Option[Array[Byte]],
      fam: Option[String]): Unit =
    writeRanges(engine, tableName, d, Seq((start, stop)), fam)

  /** The multi-range form (the wide view's IN-list metadata DELETE): one
    * tombstone batch covering the UNION of the ranges — one append, one
    * manifest commit, however many probes. */
  def writeRanges(engine: Catalog, tableName: String,
      d: graft.catalog.TableDescriptor,
      ranges: Seq[(Option[Array[Byte]], Option[Array[Byte]])],
      fam: Option[String]): Unit = {
    import org.apache.spark.sql.functions.{col, lit, max}
    require(ranges.nonEmpty, "tombstone write needs at least one range")
    var cells =
      if (d.saltBuckets > 0)
        graft.core.Salt.stripCells(engine.read(tableName).filter(
          ranges.map { case (s, e) =>
            graft.core.Salt.scatter(d.saltBuckets, s, e)
          }.reduce(_ || _)))
      else {
        def pred(s: Option[Array[Byte]], e: Option[Array[Byte]])
            : org.apache.spark.sql.Column = {
          val lo = s.map(b => col("row") >= lit(b))
          val hi = e.map(b => col("row") < lit(b))
          (lo, hi) match {
            case (Some(a), Some(b)) => a && b
            case (Some(a), None) => a
            case (None, Some(b)) => b
            case (None, None) => lit(true)
          }
        }
        engine.read(tableName)
          .filter(ranges.map((pred _).tupled).reduce(_ || _))
      }
    fam.foreach(f => cells = cells.filter(col("family") === f))
    val tombs = cells
      .groupBy("row", "family").agg(max("ts").as("ts"))
      .select(col("row"), col("family"),
        lit(Array.emptyByteArray).as("qualifier"), col("ts"),
        lit(graft.core.CellKind.DeleteFamily).as("kind"),
        lit(null).cast(org.apache.spark.sql.types.BinaryType).as("value"),
        lit(0L).as("seq"))
    // No isEmpty pre-check — that would execute the read+aggregate twice
    // (once to count, once to write). An empty tombstone batch writes no
    // leaf dirs and commits a data-less manifest version, which is
    // harmless (the reference logs a WAL entry for a no-op Delete too).
    engine.append(tableName, tombs, GraftSqlCatalog.nowMs()): Unit
  }
}

/** Translates pushed V1 filters into a [[graft.read.Scan]]:
  *  - `row` bounds → startRow/stopRow (binary, unsigned-lex — identical
  *    ordering to Spark's BinaryType, BytesSpec-asserted);
  *  - `family` equality / IN → family projection (applied pre-resolve;
  *    commutes with resolution);
  *  - `qualifier` equality / IN → column projection (`Scan.addColumn` —
  *    `Get.addColumn` parity), accepted only once a family projection is
  *    in place (`Scan.columns` is keyed by family) and only once (a
  *    ∧-chain of distinct qualifier equalities must stay residual: the
  *    projection set is a union, which would turn the conjunction into a
  *    disjunction);
  *  - a bare LIMIT → `.limit` on the resolved frame (incremental
  *    execution stops the scan after n resolved rows — at 100 TB the
  *    difference between a peek and a full pass);
  *  - everything else → residual, evaluated by Spark post-resolve.
  * Column pruning lands as a final projection so the inner plan's parquet
  * scan reads only what survives.
  */
class GraftScanBuilder(engine: Catalog, tableName: String,
    pinned: Option[graft.catalog.Manifest] = None,
    maxVersionsPerTrigger: Option[Long] = None,
    startingVersion: Option[String] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN
    with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = Cell.schema
  private var scan: GScan = GScan()
  private var limit: Option[Int] = None
  private var topN: Option[(Seq[GraftSortCol], Int)] = None
  private var aggSpec: Option[GraftAggSpec] = None
  private var valueEq: Seq[Array[Byte]] = Nil
  // recorded `value` interval (VALUE space, lo inclusive / hi exclusive —
  // binary successor `v ++ 0x00` converts the other inclusivities
  // exactly); routes comparison predicates through a registered index
  private var valueLo: Option[Array[Byte]] = None
  private var valueHi: Option[Array[Byte]] = None
  private var rowKeys: Seq[Array[Byte]] = Nil
  // row-range disjunction (`row < a OR row >= b`): pruning-only byte
  // ranges, the Or stays residual
  private var rowRangeOr
      : Option[Seq[(Option[Array[Byte]], Option[Array[Byte]])]] = None
  // recorded OR-of-probes arms on `value` (FilterList(MUST_PASS_ONE) —
  // see GraftOrArms): a bounded disjunction of equalities/intervals on
  // the one projected column, routed as ONE probeOr pass
  private var valueOr: Seq[graft.read.SecondaryIndex.ValueArm] = Nil
  // recorded MIXED row/value OR (`row < a OR value = v` — RowFilter OR
  // SingleColumnValueFilter composed MUST_PASS_ONE): exact row ranges
  // (binary row order IS the value order) + value index arms
  private var mixedOr: Option[(
      Seq[(Option[Array[Byte]], Option[Array[Byte]])],
      Seq[graft.read.SecondaryIndex.ValueArm])] = None

  /** Aggregate pushdown — COMPLETE (final values, not partial buffers):
    * the aggregation runs inside the inner resolved plan (hash aggregate
    * with map-side combine, whole-stage codegen) instead of above the V1
    * bridge, so an aggregate-only SQL query converts `|groups|` rows
    * through the Row boundary rather than every resolved cell. Semantics
    * are safe by construction: aggregation COMPOSES over the resolved
    * view (the same frame a SELECT returns — tombstones and version
    * windows already applied), never over raw cells.
    *
    * Accepted: group-bys on plain columns, COUNT(*), COUNT(col),
    * MIN/MAX(col) on non-binary columns (binary min/max stays above the
    * bridge: Spark's typed ordering on BinaryType differs from simple
    * column ordering in enough edge cases that we refuse rather than
    * risk a silent divergence). Everything else falls back — Spark keeps
    * its own Aggregate node. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translateAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    // Only complete pushdown is offered: without it Spark would expect
    // partial-aggregation buffers (sum/count pairs) this source does not
    // produce. supportCompletePushDown is consulted first; a false from
    // there must make this a no-op too.
    val spec = translateAgg(agg)
    spec.foreach(s => aggSpec = Some(s))
    spec.isDefined
  }

  private def fieldName(e: V2Expression): Option[String] = e match {
    case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames.head)
    case _ => None
  }

  private def translateAgg(agg: Aggregation): Option[GraftAggSpec] = {
    import org.apache.spark.sql.types.BinaryType
    val cellType = Cell.schema.fields.map(f => f.name -> f.dataType).toMap
    val groups = agg.groupByExpressions.toSeq.map(fieldName)
    val aggs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(GraftAggCol("count", None))
      case c: Count if !c.isDistinct =>
        fieldName(c.column).map(n => GraftAggCol("count_col", Some(n)))
      case m: Min =>
        fieldName(m.column)
          .filter(n => cellType.get(n).exists(_ != BinaryType))
          .map(n => GraftAggCol("min", Some(n)))
      case m: Max =>
        fieldName(m.column)
          .filter(n => cellType.get(n).exists(_ != BinaryType))
          .map(n => GraftAggCol("max", Some(n)))
      case s: Sum if !s.isDistinct =>
        fieldName(s.column)
          .filter(n => cellType.get(n).exists(GraftAggSpec.summable))
          .map(n => GraftAggCol("sum", Some(n)))
      case a: Avg if !a.isDistinct =>
        fieldName(a.column)
          .filter(n => cellType.get(n).exists(GraftAggSpec.summable))
          .map(n => GraftAggCol("avg", Some(n)))
      case _ => None
    }
    if (groups.forall(_.isDefined) && aggs.forall(_.isDefined) &&
        groups.flatten.forall(cellType.contains) && aggs.nonEmpty)
      Some(GraftAggSpec(groups.flatten, aggs.flatten))
    else None
  }

  private def succ(v: Array[Byte]): Array[Byte] = Bytes.successor(v)

  private def tightenStart(b: Array[Byte]): Unit =
    if (scan.startRow.forall(cur => Bytes.compareTo(b, cur) > 0))
      scan = scan.setStartRow(b)
  private def tightenStop(b: Array[Byte]): Unit =
    if (scan.stopRow.forall(cur => Bytes.compareTo(b, cur) < 0))
      scan = scan.setStopRow(b)
  private def tightenValueLo(b: Array[Byte]): Unit =
    if (valueLo.forall(cur => Bytes.compareTo(b, cur) > 0)) valueLo = Some(b)
  private def tightenValueHi(b: Array[Byte]): Unit =
    if (valueHi.forall(cur => Bytes.compareTo(b, cur) < 0)) valueHi = Some(b)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val accepted = Array.newBuilder[Filter]
    val residual = Array.newBuilder[Filter]
    // Row bounds are each sound as conjuncts (every bound only tightens
    // the range). Family filters union into a projection SET, so a second
    // conjunct would widen instead of intersect — accept only the first
    // and leave the rest residual (a ∧-chain of distinct family
    // equalities is degenerate anyway). Qualifier projection needs the
    // family set, so it runs in a second pass (Spark's filter order is
    // not guaranteed).
    var famTaken = false
    val rest = Array.newBuilder[Filter]
    filters.foreach {
      case f @ sources.EqualTo("row", v: Array[Byte]) =>
        tightenStart(v); tightenStop(succ(v)); accepted += f
      case f @ sources.GreaterThanOrEqual("row", v: Array[Byte]) =>
        tightenStart(v); accepted += f
      case f @ sources.GreaterThan("row", v: Array[Byte]) =>
        tightenStart(succ(v)); accepted += f
      case f @ sources.LessThan("row", v: Array[Byte]) =>
        tightenStop(v); accepted += f
      case f @ sources.LessThanOrEqual("row", v: Array[Byte]) =>
        tightenStop(succ(v)); accepted += f
      // The multiGet shape: `row IN (k1..kn)` scopes the scan to the
      // exact key set (per-key equality disjunction pushed to parquet;
      // JVM-side salted keys + span bounds on a salted table — see
      // resolvedFrame). Kept RESIDUAL for exactness like `value`; the
      // pruning happens below the bridge.
      case f @ sources.In("row", ks)
          if rowKeys.isEmpty && ks.nonEmpty &&
            ks.forall(_.isInstanceOf[Array[Byte]]) =>
        rowKeys = ks.toSeq.map(_.asInstanceOf[Array[Byte]])
        residual += f
      case f @ sources.EqualTo("family", fam: String) if !famTaken =>
        scan = scan.addFamily(fam); famTaken = true; accepted += f
      case f @ sources.In("family", fs)
          if !famTaken && fs.nonEmpty && fs.forall(_.isInstanceOf[String]) =>
        fs.foreach(x => scan = scan.addFamily(x.asInstanceOf[String]))
        famTaken = true; accepted += f
      // `row = a OR row = b` — the multiGet shape via disjunction
      // (FilterList(MUST_PASS_ONE) over row equalities): scoped exactly
      // like `row IN (...)`, kept residual. A disjunction of row RANGES
      // (`row < a OR row >= b` — the time-partition-union shape) records
      // pruning-only byte ranges (binary row order IS the value order,
      // so every arm is exact). Non-row Or trees fall through to the
      // value pass below.
      case f @ sources.Or(_, _) =>
        rowOrKeys(f) match {
          case Some(ks) if rowKeys.isEmpty &&
              ks.size <= graft.read.SecondaryIndex.MaxCompositeProbes =>
            rowKeys = ks; residual += f
          case _ =>
            rowOrRanges(f) match {
              case Some(rs) if rowRangeOr.isEmpty && rs.nonEmpty &&
                  rs.size <= graft.read.SecondaryIndex.MaxCompositeProbes &&
                  rs.forall { case (lo, hi) => lo.isDefined || hi.isDefined } =>
                rowRangeOr = Some(rs); residual += f
              case _ =>
                // r12: MIXED row/value disjunction (the reference's
                // RowFilter-OR-SCVF FilterList shape) — row disjuncts
                // become exact byte ranges, value disjuncts index arms
                // (superset pick inside And conjuncts); recorded for
                // the mixed route, the Or stays residual either way
                type KR = (Option[Array[Byte]], Option[Array[Byte]])
                def mixedOf(g: Filter)
                    : Option[(Seq[KR],
                      Seq[graft.read.SecondaryIndex.ValueArm])] = g match {
                  case sources.Or(a, b) =>
                    for { x <- mixedOf(a); y <- mixedOf(b) }
                      yield (x._1 ++ y._1, x._2 ++ y._2)
                  case other =>
                    rowOrRanges(other).map(rs => (rs,
                      Nil: Seq[graft.read.SecondaryIndex.ValueArm]))
                      .orElse(GraftOrArms.parse(other, cellValueLeaf,
                        graft.read.SecondaryIndex.MaxCompositeProbes,
                        superset = true).collect {
                          case ("value", arms) => (Nil: Seq[KR], arms)
                        })
                }
                mixedOf(f) match {
                  case Some((krs, varms))
                      if mixedOr.isEmpty && krs.nonEmpty &&
                        varms.nonEmpty &&
                        krs.forall { case (lo, hi) =>
                          lo.isDefined || hi.isDefined } &&
                        krs.size + varms.size <=
                          graft.read.SecondaryIndex.MaxCompositeProbes =>
                    mixedOr = Some((krs, varms))
                  case _ => ()
                }
                rest += f
            }
        }
      case other => rest += other
    }
    var qualTaken = false
    def addQualifiers(qs: Seq[Array[Byte]]): Unit =
      scan.families.getOrElse(Set.empty).foreach { fam =>
        qs.foreach(q => scan = scan.addColumn(fam, q))
      }
    rest.result().foreach {
      case f @ sources.EqualTo("qualifier", v: Array[Byte])
          if famTaken && !qualTaken =>
        addQualifiers(Seq(v)); qualTaken = true; accepted += f
      case f @ sources.In("qualifier", vs)
          if famTaken && !qualTaken && vs.nonEmpty &&
            vs.forall(_.isInstanceOf[Array[Byte]]) =>
        addQualifiers(vs.toSeq.map(_.asInstanceOf[Array[Byte]]))
        qualTaken = true; accepted += f
      // `value` equality/IN stays RESIDUAL (Spark re-applies it above the
      // bridge — the index gather only produces a candidate superset),
      // but is recorded: build() routes the scan through a registered
      // secondary index when one covers the projected (family, qualifier).
      case f @ sources.EqualTo("value", v: Array[Byte]) if valueEq.isEmpty =>
        valueEq = Seq(v); residual += f
      case f @ sources.In("value", vs)
          if valueEq.isEmpty && vs.nonEmpty &&
            vs.forall(_.isInstanceOf[Array[Byte]]) =>
        valueEq = vs.toSeq.map(_.asInstanceOf[Array[Byte]]); residual += f
      // `value` comparisons — the reference's dominant filter surface
      // (CompareFilter.java:49-64 LESS/GREATER... via
      // SingleColumnValueFilter) — record an INTERVAL; each conjunct only
      // tightens it, so all are sound together. RESIDUAL like equality:
      // the value-prefix index layout serves the interval as one pruned
      // range probe, Spark's re-application keeps exactness.
      case f @ sources.GreaterThan("value", v: Array[Byte]) =>
        tightenValueLo(Bytes.successor(v)); residual += f
      case f @ sources.GreaterThanOrEqual("value", v: Array[Byte]) =>
        tightenValueLo(v); residual += f
      case f @ sources.LessThan("value", v: Array[Byte]) =>
        tightenValueHi(v); residual += f
      case f @ sources.LessThanOrEqual("value", v: Array[Byte]) =>
        tightenValueHi(Bytes.successor(v)); residual += f
      // OR-of-probes on `value`: a bounded disjunction of equalities /
      // IN lists / intervals records its arms for one probeOr routing
      // pass; the filter stays residual (Spark re-applies it), so the
      // parse is pure routing — which is also why superset mode is
      // sound here (a disjunct that is an And over mixed columns
      // routes by its tightest `value` conjunct's arm)
      case f @ sources.Or(_, _) =>
        if (valueOr.isEmpty)
          GraftOrArms.parse(f, cellValueLeaf,
            graft.read.SecondaryIndex.MaxCompositeProbes,
            superset = true) match {
            case Some(("value", arms)) => valueOr = arms
            case _ => ()
          }
        residual += f
      case other => residual += other
    }
    pushed = accepted.result()
    residual.result()
  }

  /** Row-range disjunction arms: And-conjuncts intersect into one arm;
    * equality/IN become exact one-key ranges. Binary unsigned-lex row
    * order is the value order, so every arm is value-exact. */
  private def rowOrRanges(f: Filter)
      : Option[Seq[(Option[Array[Byte]], Option[Array[Byte]])]] = {
    def maxLoB(a: Option[Array[Byte]], b: Option[Array[Byte]]) = (a, b) match {
      case (Some(x), Some(y)) => Some(if (Bytes.compareTo(x, y) >= 0) x else y)
      case _ => a.orElse(b)
    }
    def minHiB(a: Option[Array[Byte]], b: Option[Array[Byte]]) = (a, b) match {
      case (Some(x), Some(y)) => Some(if (Bytes.compareTo(x, y) <= 0) x else y)
      case _ => a.orElse(b)
    }
    def go(g: Filter)
        : Option[Seq[(Option[Array[Byte]], Option[Array[Byte]])]] = g match {
      case sources.Or(a, b) => for { x <- go(a); y <- go(b) } yield x ++ y
      case sources.And(a, b) => (go(a), go(b)) match {
        case (Some(Seq((l1, h1))), Some(Seq((l2, h2)))) =>
          Some(Seq((maxLoB(l1, l2), minHiB(h1, h2))))
        case _ => None
      }
      case sources.EqualTo("row", v: Array[Byte]) =>
        Some(Seq((Some(v), Some(Bytes.successor(v)))))
      case sources.In("row", vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Array[Byte]]) =>
        Some(vs.toSeq.map(_.asInstanceOf[Array[Byte]])
          .map(v => (Some(v), Some(Bytes.successor(v)))))
      case sources.GreaterThanOrEqual("row", v: Array[Byte]) =>
        Some(Seq((Some(v), None)))
      case sources.GreaterThan("row", v: Array[Byte]) =>
        Some(Seq((Some(Bytes.successor(v)), None)))
      case sources.LessThan("row", v: Array[Byte]) =>
        Some(Seq((None, Some(v))))
      case sources.LessThanOrEqual("row", v: Array[Byte]) =>
        Some(Seq((None, Some(Bytes.successor(v)))))
      case _ => None
    }
    go(f)
  }

  private def rowOrKeys(f: Filter): Option[Seq[Array[Byte]]] = f match {
    case sources.Or(a, b) =>
      for { x <- rowOrKeys(a); y <- rowOrKeys(b) } yield x ++ y
    case sources.EqualTo("row", v: Array[Byte]) => Some(Seq(v))
    case sources.In("row", vs)
        if vs.nonEmpty && vs.forall(_.isInstanceOf[Array[Byte]]) =>
      Some(vs.toSeq.map(_.asInstanceOf[Array[Byte]]))
    case _ => None
  }

  /** One comparison leaf on `value` -> a probe arm (binary order IS the
    * cell door's value order, so every comparison shape is arm-sound). */
  private def cellValueLeaf(f: Filter)
      : Option[(String, graft.read.SecondaryIndex.ValueArm)] = {
    import graft.read.SecondaryIndex.{ArmIn, ArmRange}
    f match {
      case sources.EqualTo("value", v: Array[Byte]) =>
        Some(("value", ArmIn(Seq(v))))
      case sources.In("value", vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Array[Byte]]) =>
        Some(("value", ArmIn(vs.toSeq.map(_.asInstanceOf[Array[Byte]]))))
      case sources.GreaterThan("value", v: Array[Byte]) =>
        Some(("value", ArmRange(Some(Bytes.successor(v)), None)))
      case sources.GreaterThanOrEqual("value", v: Array[Byte]) =>
        Some(("value", ArmRange(Some(v), None)))
      case sources.LessThan("value", v: Array[Byte]) =>
        Some(("value", ArmRange(None, Some(v))))
      case sources.LessThanOrEqual("value", v: Array[Byte]) =>
        Some(("value", ArmRange(None, Some(Bytes.successor(v)))))
      case _ => None
    }
  }

  /** Transparent index routing (the Phoenix property the index design
    * cites): a scan projecting exactly ONE family and ONE qualifier with
    * an equality/IN predicate — or a comparison INTERVAL — on `value`
    * routes through that column's registered index: probe O(hits) (the
    * value-prefix layout serves an interval as ONE pruned range scan),
    * gather, resolve over candidates — instead of a full scan + residual
    * filter. Correct by superset: the index holds every put of the
    * column, so candidate rows cover every possibly-visible match; the
    * residual value predicate (and normal resolution) make the result
    * exact. Time-travel scans never route (a rebuilt index reflects the
    * present, not the pinned version). Covered-PROJECTION routing (a
    * predicate on the indexed column with covered columns projected)
    * has no faithful rendering in the cell schema — that query is
    * relational, and routes through [[GraftWideTable]]'s wide view. */
  private def indexProbe: Option[GraftIndexRoute] =
    if (pinned.isDefined) None
    else for {
      fams <- scan.families
      if fams.size == 1 && scan.columns.get(fams.head).exists(_.size == 1)
      desc = engine.currentManifest(tableName).descriptor
      q = scan.columns(fams.head).head
      (ix, pred) <- desc.indexOn(fams.head, q).flatMap { ix =>
        if (valueEq.nonEmpty) Some((ix, GraftValueIn(valueEq)))
        else if (valueLo.isDefined || valueHi.isDefined)
          Some((ix, GraftValueRange(valueLo, valueHi)))
        else if (valueOr.nonEmpty) Some((ix, GraftValueOr(valueOr)))
        else None
      }.orElse {
        // leading member of a composite index (the Phoenix leading-column
        // rule; the left-outer tuple join keeps the index COMPLETE for
        // it): equality probes the blob's [v ++ 0x00, v ++ 0x01) prefix
        // ranges directly; an interval routes through the LOOSE range
        // probe (scan bounds only — the reconstructed-prefix residual
        // would compare whole blobs and false-negative on 0x00-embedding
        // bounds). Both yield a candidate superset the residual value
        // predicate reduces exactly.
        desc.compositeLeadingOn(fams.head, q).flatMap { ix =>
          if (valueEq.nonEmpty) Some((ix, GraftValueIn(valueEq)))
          else if (valueLo.isDefined || valueHi.isDefined)
            Some((ix, GraftValueRange(valueLo, valueHi)))
          else None
        }
      }
    } yield GraftIndexRoute(ix, pred, Nil)

  /** The MIXED row/value OR route: only when no tighter index route
    * exists, the scan touches exactly one column, and that column
    * carries a single-column index for the value arms. */
  private def mixedRoute(probe: Option[GraftIndexRoute])
      : Option[(graft.catalog.IndexDescriptor,
      Seq[(Option[Array[Byte]], Option[Array[Byte]])],
      Seq[graft.read.SecondaryIndex.ValueArm])] =
    // cheap guards first: the common no-mixed-Or build must not pay the
    // manifest reads below (and `probe` is the build's ONE indexProbe
    // evaluation, shared — indexProbe itself reads the manifest)
    if (mixedOr.isEmpty || pinned.isDefined || probe.isDefined) None
    else for {
      (krs, varms) <- mixedOr
      fams <- scan.families
      if fams.size == 1 && scan.columns.get(fams.head).exists(_.size == 1)
      ix <- engine.currentManifest(tableName).descriptor
        .indexOn(fams.head, scan.columns(fams.head).head)
    } yield (ix, krs, varms)

  override def pushedFilters(): Array[Filter] = pushed

  /** With an aggregate pushed, the scan's output is the aggregate schema
    * — Spark's subsequent pruning call (if any) refers to that output,
    * not to cell columns, so the cell projection must not change. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    if (aggSpec.isEmpty) required = requiredSchema

  /** The resolved frame's `.limit` turns a peek query into incremental
    * execution instead of a full resolve pass. The push is exact (a
    * global `.limit(n)`), but `isPartiallyPushed` is overridden to true
    * anyway so Spark keeps its own limit node as a safety net — the
    * interface DEFAULT is false, which would make Spark silently trust
    * any future relaxation of this to a per-partition cut. */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true

  /** ORDER BY + LIMIT (top-k) pushdown: sort+limit runs INSIDE the
    * inner plan (planned as `TakeOrderedAndProject` — per-partition
    * top-k + merge, no full sort), so k rows cross the V1 bridge
    * instead of every resolved cell. Partial: Spark re-sorts the k
    * survivors above the bridge, keeping exactness structural. */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      n: Int): Boolean = {
    val translated =
      GraftSortCol.translate(orders, Cell.schema.fieldNames.toSet)
    if (aggSpec.isEmpty && translated.isDefined) {
      topN = Some((translated.get, n)); true
    } else false
  }

  override def build(): V2Scan = {
    val probe = indexProbe
    new GraftV1Scan(engine, tableName, scan, required, pinned, limit,
      maxVersionsPerTrigger, aggSpec, probe, rowKeys, topN,
      startingVersion, rowRangeOr = rowRangeOr,
      mixedRoute = mixedRoute(probe))
  }
}

/** The index-routable `value` predicate the scan builder recorded. */
private[sql] sealed trait GraftValuePred
private[sql] case class GraftValueIn(values: Seq[Array[Byte]])
    extends GraftValuePred
/** VALUE-space interval, lo inclusive / hi exclusive. */
private[sql] case class GraftValueRange(lo: Option[Array[Byte]],
    hi: Option[Array[Byte]]) extends GraftValuePred
/** OR-of-probes: a bounded union of equality/interval arms on ONE
  * column (`FilterList(MUST_PASS_ONE)` — see [[GraftOrArms]]), served
  * as one [[graft.read.SecondaryIndex.probeOr]] pass. */
private[sql] case class GraftValueOr(
    arms: Seq[graft.read.SecondaryIndex.ValueArm]) extends GraftValuePred

/** One resolved index route: the registered index, the recorded value
  * predicate, and the covered columns the query projects (empty = only
  * the indexed column's cells are wanted). */
private[sql] case class GraftIndexRoute(ix: graft.catalog.IndexDescriptor,
    pred: GraftValuePred, covered: Seq[(String, Array[Byte])])

/** One pushed aggregate column: `fn` in count | count_col | min | max |
  * sum | avg, `col` absent only for COUNT(*). */
private[sql] case class GraftAggCol(fn: String, col: Option[String])

/** One pushed top-k sort key: plain column + direction + null order. */
private[sql] case class GraftSortCol(name: String, ascending: Boolean,
    nullsFirst: Boolean) {
  def toColumn: org.apache.spark.sql.Column = {
    val c = org.apache.spark.sql.functions.col(name)
    (ascending, nullsFirst) match {
      case (true, true) => c.asc_nulls_first
      case (true, false) => c.asc_nulls_last
      case (false, true) => c.desc_nulls_first
      case (false, false) => c.desc_nulls_last
    }
  }
}

private[sql] object GraftSortCol {
  import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection, SortOrder}
  /** All-or-nothing translation: every sort key must be a plain column
    * of the scanned schema, or the top-k stays above the bridge. */
  def translate(orders: Array[SortOrder], names: Set[String])
      : Option[Seq[GraftSortCol]] = {
    val ts = orders.toSeq.map { o =>
      o.expression match {
        case r: NamedReference
            if r.fieldNames.length == 1 && names(r.fieldNames.head) =>
          Some(GraftSortCol(r.fieldNames.head,
            o.direction == SortDirection.ASCENDING,
            o.nullOrdering == NullOrdering.NULLS_FIRST))
        case _ => None
      }
    }
    if (ts.nonEmpty && ts.forall(_.isDefined)) Some(ts.flatten) else None
  }
  /** Inner-plan top-k: the sort runs BEFORE `project` (every scanned
    * column is still in scope), and Spark fuses Limit(Project(Sort))
    * into one `TakeOrderedAndProject` — per-partition top-k + merge of
    * k-row heads, never a full sort. Without a top-k, plain limit. */
  def apply(df: DataFrame, topN: Option[(Seq[GraftSortCol], Int)],
      limit: Option[Int], project: DataFrame => DataFrame): DataFrame =
    topN match {
      case Some((orders, n)) =>
        project(df.sort(orders.map(_.toColumn): _*)).limit(n)
      case None =>
        val p = project(df)
        limit.fold(p)(p.limit)
    }
}

/** A completely-pushed aggregation: output = groupBy columns (source
  * types preserved) ++ aggregate columns, in Spark's declared order.
  * `source` is the scanned view's schema the names resolve against —
  * `Cell.schema` on the cell door, the declared wide schema on the wide
  * view. */
private[sql] case class GraftAggSpec(groupBy: Seq[String], aggs: Seq[GraftAggCol],
    source: StructType = Cell.schema) {
  import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType, StructField}
  def schema: StructType = {
    val cellType = source.fields.map(f => f.name -> f.dataType).toMap
    StructType(
      groupBy.map(g => StructField(g, cellType(g))) ++
        aggs.zipWithIndex.map { case (a, i) =>
          val name = a.col.fold(s"agg_$i")(c => s"agg_${i}_$c")
          a.fn match {
            case "count" | "count_col" => StructField(name, LongType, nullable = false)
            // result types mirror Spark's own Sum/Average resolution, so
            // the completely-pushed schema is exactly what the replaced
            // Aggregate would have produced
            case "sum" => cellType(a.col.get) match {
              case ByteType | ShortType | IntegerType | LongType =>
                StructField(name, LongType)
              case _ => StructField(name, DoubleType)
            }
            case "avg" => StructField(name, DoubleType)
            case _ => StructField(name, cellType(a.col.get))
          }
        })
  }
  def apply(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{avg, col, count, lit, max, min, sum}
    val names = schema.fieldNames.drop(groupBy.length)
    val exprs = aggs.zip(names).map {
      case (GraftAggCol("count", _), n) => count(lit(1)).as(n)
      case (GraftAggCol("count_col", Some(c)), n) => count(col(c)).as(n)
      case (GraftAggCol("min", Some(c)), n) => min(col(c)).as(n)
      case (GraftAggCol("max", Some(c)), n) => max(col(c)).as(n)
      case (GraftAggCol("sum", Some(c)), n) => sum(col(c)).as(n)
      case (GraftAggCol("avg", Some(c)), n) => avg(col(c)).as(n)
      case (a, _) => throw new IllegalStateException(s"unreachable agg $a")
    }
    df.groupBy(groupBy.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }
}

private[sql] object GraftAggSpec {
  import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
  /** Sum/avg-able source types — float sums differ by accumulation
    * ORDER, so only exact integrals are accepted; a double sum stays
    * above the bridge where Spark owns the nondeterminism. */
  def summable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
}

class GraftV1Scan(engine: Catalog, tableName: String, gscan: GScan,
    required: StructType,
    pinned: Option[graft.catalog.Manifest] = None,
    limit: Option[Int] = None,
    maxVersionsPerTrigger: Option[Long] = None,
    aggSpec: Option[GraftAggSpec] = None,
    indexProbe: Option[GraftIndexRoute] = None,
    rowKeys: Seq[Array[Byte]] = Nil,
    topN: Option[(Seq[GraftSortCol], Int)] = None,
    startingVersion: Option[String] = None,
    rowRangeOr: Option[Seq[(Option[Array[Byte]], Option[Array[Byte]])]] = None,
    mixedRoute: Option[(graft.catalog.IndexDescriptor,
      Seq[(Option[Array[Byte]], Option[Array[Byte]])],
      Seq[graft.read.SecondaryIndex.ValueArm])] = None)
    extends V1Scan
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with GraftRuntimeFilterable with GraftGuardedRoute {

  override def readSchema(): StructType =
    aggSpec.fold(required)(_.schema)

  // ---- route selectivity guard (r13, see GraftRouteGuard): a measured
  // anti-selective probe falls back to the pushed scan + residual
  // (cost-only — every value predicate stays residual, and runtime
  // probes are re-checked by their join). Verdicts memoize per scan so
  // execution and the seams agree.
  @volatile private var guardVerdicts = Map.empty[String, Boolean]
  @volatile private var guardDeclinedFlag = false
  override private[sql] def routeGuardDeclined: Boolean = guardDeclinedFlag

  /** ONE metadata read per index table per scan (the wide door's
    * indexTableMeta pattern): guard and routed resolution share the
    * same pinned (manifest, cells) pair, so the guard measures exactly
    * the index version resolution reads and a routed scan pays a single
    * index-manifest read. */
  @volatile private var indexMeta =
    Map.empty[String, (graft.catalog.Manifest, DataFrame)]
  private def indexTableMeta(t: String): (graft.catalog.Manifest, DataFrame) =
    indexMeta.getOrElse(t, {
      val m = engine.currentManifest(t)
      val v = (m, engine.readManifest(m))
      indexMeta += t -> v
      v
    })
  private def indexCells(t: String): DataFrame = indexTableMeta(t)._2

  /** Guard one probe against one index table: the verdict memoizes per
    * scan BY SIGNATURE (not table alone — two routes over the same
    * table with different arms must not alias, ADVICE r13) and
    * cross-query in the catalog ([[graft.catalog.Catalog.guardVerdict]],
    * keyed by index version + signature — the dashboard pattern pays
    * zero re-measurement). `marker` names the probe shape so an exact
    * and a loose probe over identical arms key apart; `arms` also feed
    * the guard's span pre-estimate. */
  private def guardAllows(ixTable: String, marker: String,
      arms: Seq[graft.read.SecondaryIndex.ValueArm],
      probe: () => DataFrame): Boolean = {
    val sig = GraftRouteGuard.signature(marker, Seq((ixTable, arms)))
    guardVerdicts.get(sig).getOrElse {
      val ok = GraftRouteGuard.allows(engine,
        Seq(GraftRouteGuard.GuardMember(probe,
          Seq(GraftRouteGuard.GuardLeg(indexTableMeta(ixTable)._1, arms)))),
        sig)
      guardVerdicts += sig -> ok
      if (!ok) guardDeclinedFlag = true
      ok
    }
  }

  private def armsOf(p: GraftValuePred)
      : Seq[graft.read.SecondaryIndex.ValueArm] = p match {
    case GraftValueIn(vs) => Seq(graft.read.SecondaryIndex.ArmIn(vs))
    case GraftValueRange(lo, hi) =>
      Seq(graft.read.SecondaryIndex.ArmRange(lo, hi))
    case GraftValueOr(arms) => arms
  }

  /** The EXACT probe frame the route's resolution would gather — the
    * guard must count what the gather would fetch, so each shape
    * mirrors the `frame` dispatch below (including the composite
    * leading member's LOOSE range probe). */
  private def guardProbeOf(r: GraftIndexRoute): () => DataFrame = {
    import graft.read.SecondaryIndex
    def ixc = indexCells(r.ix.indexTable)
    r.pred match {
      case GraftValueIn(vs) => () =>
        if (vs.sizeIs == 1) SecondaryIndex.probe(ixc, vs.head)
        else SecondaryIndex.probeAll(ixc, vs)
      case GraftValueRange(lo, hi) => () =>
        SecondaryIndex.probeRange(ixc, lo, hi,
          exactPrefix = r.ix.moreColumns.isEmpty)
      case GraftValueOr(arms) => () => SecondaryIndex.probeOr(ixc, arms)
    }
  }

  /** [[indexProbe]] after the selectivity guard. Covered routes skip
    * (index-only answer, no gather — reading O(hits) of the index alone
    * never loses to a full fact scan). r14: composite-LEADING routes no
    * longer skip — the loose blob probe is exactly as arm-shaped as the
    * single-column case (a range on the leading member matching half
    * the table pays probe + dedup + gather like any anti-selective
    * arm), so it is measured with the same probe the gather would run. */
  private def effIndexProbe: Option[GraftIndexRoute] =
    indexProbe.filter { r =>
      r.ix.covered.nonEmpty || guardAllows(r.ix.indexTable,
        if (r.ix.moreColumns.nonEmpty) "cellLeading" else "cellSingle",
        armsOf(r.pred), guardProbeOf(r))
    }
  private def effMixedRoute: Option[(graft.catalog.IndexDescriptor,
      Seq[(Option[Array[Byte]], Option[Array[Byte]])],
      Seq[graft.read.SecondaryIndex.ValueArm])] =
    mixedRoute.filter { case (ix, _, varms) =>
      guardAllows(ix.indexTable, "cellMixed", varms,
        () => graft.read.SecondaryIndex.probeOr(indexCells(ix.indexTable),
          varms))
    }

  // ---- runtime (join-driven) key pruning — see GraftRuntimeFilterable.
  // `row` is binary end-to-end; a pushed LIMIT/TopN declines (pruning
  // would change WHICH k rows surface). Aggregates stay eligible: the
  // join key only reaches the agg output as a GROUP column, and pruning
  // whole head groups never changes a surviving group's value.
  //
  // r13: the projected VALUE column is prunable too — the reference's
  // native surface (`index_lookup` / `salted_index_lookup` shapes)
  // deserves the same star-join story the wide door got in r12. Exposed
  // only when the scan projects exactly ONE (family, qualifier), that
  // column carries a registered single-column index, and no static
  // index route was chosen (static predicates constrain harder). A
  // runtime In probes the index + size-gated gather; the join's
  // equality re-check above the bridge replaces the static route's
  // verify, and index completeness for puts guarantees every current
  // match is a candidate. Over-cap dims degrade to an Or of ArmRanges
  // (binary value order IS the cell door's value order).
  private def runtimeValueIndex: Option[graft.catalog.IndexDescriptor] =
    if (pinned.isDefined || indexProbe.isDefined || mixedRoute.isDefined)
      None
    else for {
      fams <- gscan.families
      if fams.size == 1 && gscan.columns.get(fams.head).exists(_.size == 1)
      ix <- plannedManifest.descriptor
        .indexOn(fams.head, gscan.columns(fams.head).head)
    } yield ix
  override def runtimeFilterAttributes: Seq[String] =
    "row" +: (if (runtimeValueIndex.isDefined) Seq("value") else Nil)
  override protected def encodeRuntimeKey(attr: String, v: Any)
      : Option[Array[Byte]] =
    v match {
      case b: Array[Byte] => Some(b)
      case _ => None
    }
  /** Both cell-door probe attributes are raw binary — encoded-byte
    * ranges ARE value ranges, so prefix clustering is always sound. */
  override protected def encodeRuntimeKeyBytesSql(attr: String,
      colName: String): Option[String] = Some(colName)
  /** `value` exact-keys probes clamp to the STATIC probe cap: past it
    * the range degradation wins or the guard refuses (see the trait
    * doc); `row` keeps the session cap (row-key Or chains push to
    * parquet and stay cheap — runtimePrunedJoin holds flat at 1,024). */
  override protected def runtimeKeyCap(attr: String, maxKeys: Int): Int =
    if (attr == "value")
      math.min(maxKeys, graft.read.SecondaryIndex.MaxCompositeProbes)
    else maxKeys
  /** Over-cap range degradation: `row` and `value` are raw binary whose
    * byte order IS the value order, so [min, max] is exactly
    * [min, successor(max)). */
  override protected def encodeRuntimeRange(attr: String, min: Any, max: Any)
      : Option[Seq[(Option[Array[Byte]], Option[Array[Byte]])]] =
    (min, max) match {
      case (lo: Array[Byte], hi: Array[Byte]) =>
        Some(Seq((Some(lo), Some(Bytes.successor(hi)))))
      case _ => None
    }
  override private[sql] def runtimeFilterEligible: Boolean =
    limit.isEmpty && topN.isEmpty

  /** The manifest this planned scan reads — captured once so statistics
    * and execution see the SAME version (and planning costs one
    * CURRENT read, not one per consumer). */
  private lazy val plannedManifest: graft.catalog.Manifest =
    pinned.getOrElse(engine.currentManifest(tableName))

  /** Size statistics from the manifest's live data-dir bytes (cached per
    * table version — dirs are immutable). With these, Catalyst's join
    * sizing sees a small graft table as small and auto-broadcasts it;
    * without them a DSv2 relation defaults to "unknown = huge" and every
    * join against the door becomes a shuffle. A pushed top-k/limit also
    * bounds the row count. Conservative by construction: bytes are an
    * upper bound of what the scan emits (filters/limits only shrink). */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val bytes = engine.manifestBytes(plannedManifest)
    val rows = topN.map(_._2.toLong).orElse(limit.map(_.toLong))
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        rows.fold(java.util.OptionalLong.empty())(java.util.OptionalLong.of)
    }
  }

  /** Seam for plan asserts: the top-k this scan runs inner-side. */
  private[sql] def pushedTopN: Option[(Seq[GraftSortCol], Int)] = topN

  /** The index table this scan routes through, if any — the plan-assert
    * seam (SqlCatalogSpec checks routing fires for indexed predicates and
    * stays off for unindexed ones). Includes a runtime value-probe
    * route once resolution APPLIED it (inspect after execution). */
  private[sql] def usedIndexTable: Option[String] =
    effIndexProbe.map(_.ix.indexTable)
      .orElse(effMixedRoute.map(_._1.indexTable))
      .orElse(appliedRuntimeValueIndex)
  @volatile private var appliedRuntimeValueIndex: Option[String] = None
  /** Seam: the MIXED row/value OR route's shape — (row-range arm count,
    * probed index table). */
  private[sql] def mixedOrShape: Option[(Int, String)] =
    effMixedRoute.map { case (ix, krs, _) => (krs.size, ix.indexTable) }

  /** The resolved view this scan produces — also the seam SqlCatalogSpec
    * uses to assert that pushdown reached the inner parquet scan. */
  private[sql] def resolvedFrame(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.{col => fcol, lit => flit}
    val m = plannedManifest
    val d = m.descriptor
    // Effective key scope: the static `row IN (...)` multiGet keys
    // intersected with any runtime (join-driven) keys — byte-exact
    // intersection, both are raw logical row keys. None = unscoped;
    // Some(empty) = provably-empty scan (empty dim / empty intersection).
    // Over the key cap the probe degrades to a [min, max] row-range
    // superset (rtRanges below) instead of declining.
    val rtProbes = currentRuntimeProbes(spark)
    val rtRanges = rtProbes.collectFirst {
      case RuntimeRanges("row", rs) => rs
    }
    val effKeys: Option[Seq[Array[Byte]]] =
      (rowKeys, rtProbes.collectFirst {
        case RuntimeKeys("row", ks) => ks
      }) match {
        case (Nil, None) => None
        case (Nil, Some(r)) => Some(r)
        case (ks, None) => Some(ks)
        case (ks, Some(r)) =>
          val set = r.map(java.nio.ByteBuffer.wrap).toSet
          Some(ks.filter(k => set.contains(java.nio.ByteBuffer.wrap(k))))
      }
    // Salt as a table property: logical row bounds compile to the
    // scatter-gather disjunction on the salted storage order, then the
    // prefix strips so everything downstream (resolution, residuals,
    // the index gather) sees logical keys.
    val (frame0, gs) =
      if (d.saltBuckets > 0) {
        effKeys match {
          case Some(ks) if ks.nonEmpty =>
            // multiGet scope on the salted order: JVM-side salted keys +
            // span bounds + broadcast semi-join, stripped back to logical
            // rows; any logical bounds still apply in ScanExec below
            (graft.core.Salt.scopeKeys(engine.readManifest(m), d.saltBuckets,
              ks), gscan)
          case Some(_) => // scoped to nothing: structurally empty
            (graft.core.Salt.stripCells(engine.readManifest(m))
              .filter(flit(false)), gscan)
          case None =>
            (graft.core.Salt.scanRange(engine.readManifest(m), d.saltBuckets,
              gscan.startRow, gscan.stopRow),
              gscan.copy(startRow = None, stopRow = None))
        }
      } else {
        val base = engine.readManifest(m)
        val keyed = effKeys match {
          case None => base
          case Some(ks) =>
            // balanced Or (GraftCols doc): runtime key sets reach 1,024
            // arms — a linear reduce overflows the converter stack
            base.filter(if (ks.isEmpty) flit(false)
              else GraftCols.orAll(ks.map(k => fcol("row") === flit(k))))
        }
        (keyed, gscan)
      }
    // row-range disjunctions (the pushed Or-of-ranges; the runtime
    // over-cap [min, max] degradation) — pruning-only; the residual (or
    // the join's equality re-check) keeps exactness. Applied on LOGICAL
    // rows — pushed to parquet on the unsalted path, an in-plan filter
    // after the salted strip.
    val frame0r = (rowRangeOr.toSeq ++ rtRanges.toSeq).foldLeft(frame0) {
      (df, rs) => df.filter(GraftCols.rowRangesPred(df, rs))
    }
    // Transparent secondary-index routing: candidates = rows the index
    // probe names (size-gated gather), a superset the residual value
    // predicate reduces to the exact answer above the bridge. When the
    // routed index is COVERED (immutableRows + synchronous deletes +
    // data-first commits — the index content is exact), the candidate
    // cells are RECONSTRUCTED from the index table alone (the pointer
    // entry carries (mainRow, ts, seq); covered-projection queries get
    // their covered columns' cells the same way), so the whole SQL
    // answer is index-only: zero main-table touch, no gather — the
    // strongest form of the Phoenix route.
    val frame0m = effMixedRoute.fold(frame0r) { case (ix, krs, varms) =>
      // MIXED row/value OR: the row-range branch reads straight off the
      // (logical) cell frame — exact byte ranges, binary row order IS
      // the value order — while the value branch probes the index for
      // rows OUTSIDE those ranges; the branches partition the candidate
      // rows, one resolution pass below, the residual Or keeps
      // exactness over the candidate superset.
      import graft.read.SecondaryIndex
      val hits = SecondaryIndex.probeOr(indexCells(ix.indexTable), varms)
      val hitsOut = hits.filter(!GraftCols.rowRangesPred(hits, krs))
      SecondaryIndex.gatherHits(frame0r, hitsOut)
        .unionByName(frame0r.filter(GraftCols.rowRangesPred(frame0r, krs)))
    }
    // runtime (join-driven) probes on the projected VALUE column (r13):
    // exact keys gather through the column's index (probe + size-gated
    // gather — the multiGet shape on the index); over-cap ranges probe
    // as an Or of ArmRanges. Exposed only with no static route, so
    // frame0m is the plain bounded scan here. The join above re-checks
    // the equality over the resolved candidates, which both drops stale
    // index hits and keeps the superset exact; an empty dim makes the
    // scan structurally empty.
    val frameV = runtimeValueIndex.fold(frame0m) { ix =>
      import graft.read.SecondaryIndex
      val keys = rtProbes.collectFirst { case RuntimeKeys("value", ks) => ks }
      val ranges = rtProbes.collectFirst {
        case RuntimeRanges("value", rs) if rs.nonEmpty => rs
      }
      (keys, ranges) match {
        case (Some(Nil), _) => frame0m.filter(flit(false))
        case (Some(ks), _)
            if guardAllows(ix.indexTable, "cellRtKeys",
              Seq(SecondaryIndex.ArmIn(ks)),
              () => if (ks.sizeIs == 1)
                SecondaryIndex.probe(indexCells(ix.indexTable), ks.head)
              else SecondaryIndex.probeAll(indexCells(ix.indexTable), ks)) =>
          appliedRuntimeValueIndex = Some(ix.indexTable)
          SecondaryIndex.gather(frame0m, indexCells(ix.indexTable), ks)
        case (None, Some(rs))
            // range arms carry the dim's occupancy-clustered byte
            // ranges — the guard's span pre-estimate declines a
            // near-full-span dim with ZERO index jobs (the r13 weak
            // path: a hash-scattered dim paid 2.1x the plan its
            // refusal protected)
            if guardAllows(ix.indexTable, "cellRtRanges",
              rs.map { case (lo, hi) => SecondaryIndex.ArmRange(lo, hi) },
              () => SecondaryIndex.probeOr(indexCells(ix.indexTable),
                rs.map { case (lo, hi) =>
                  SecondaryIndex.ArmRange(lo, hi) })) =>
          appliedRuntimeValueIndex = Some(ix.indexTable)
          SecondaryIndex.gatherHits(frame0m,
            SecondaryIndex.probeOr(indexCells(ix.indexTable),
              rs.map { case (lo, hi) => SecondaryIndex.ArmRange(lo, hi) }))
        case _ => frame0m
      }
    }
    val frame = effIndexProbe.fold(frameV) { route =>
      import graft.read.SecondaryIndex
      val ixCells = indexCells(route.ix.indexTable)
      if (route.ix.covered.nonEmpty) {
        var cov = route.pred match {
          case GraftValueIn(vs) => SecondaryIndex.lookupCovered(ixCells,
            route.ix.family, route.ix.qualifier, vs, route.covered)
          case GraftValueRange(lo, hi) => SecondaryIndex.lookupCoveredRange(
            ixCells, route.ix.family, route.ix.qualifier, lo, hi,
            route.covered)
          case GraftValueOr(arms) => SecondaryIndex.lookupCoveredOr(
            ixCells, route.ix.family, route.ix.qualifier, arms,
            route.covered)
        }
        // Pushed row bounds were ACCEPTED (Spark will not re-apply them)
        // and compiled into frame0 on a salted table — which the covered
        // answer bypasses entirely. Re-apply the ORIGINAL logical bounds
        // on the reconstructed rows (idempotent on unsalted tables,
        // where `gs` still carries them into ScanExec below).
        import org.apache.spark.sql.functions.{col => c, lit => l}
        gscan.startRow.foreach(b => cov = cov.filter(c("row") >= l(b)))
        gscan.stopRow.foreach(b => cov = cov.filter(c("row") < l(b)))
        cov
      } else route.pred match {
        case GraftValueIn(vs) => SecondaryIndex.gather(frame0r, ixCells, vs)
        case GraftValueRange(lo, hi) =>
          SecondaryIndex.gatherHits(frame0r,
            SecondaryIndex.probeRange(ixCells, lo, hi,
              exactPrefix = route.ix.moreColumns.isEmpty))
        case GraftValueOr(arms) =>
          SecondaryIndex.gatherHits(frame0r,
            SecondaryIndex.probeOr(ixCells, arms))
      }
    }
    // Family TTLs evaluate against the SQL-surface clock (reference: TTL
    // uses server time, ScanQueryMatcher.java:56). A now of 0 would make
    // every TTL inert (cutoff = 0 - ttl < any ts).
    val resolved = ScanExec(frame, gs,
      ttlMs = None, now = GraftSqlCatalog.nowMs(),
      familyMaxVersions = d.families.map(f => f.name -> f.maxVersions).toMap,
      familyTtlMs = d.families.flatMap(f => f.ttlMs.map(f.name -> _)).toMap)
    import org.apache.spark.sql.functions.col
    aggSpec match {
      case Some(spec) =>
        // the pushed aggregation runs INSIDE the inner plan (codegen'd
        // hash aggregate over the resolved view); LIMIT pushdown is
        // refused alongside aggregates (Spark never offers both), and
        // the bridge converts |groups| rows instead of every cell
        spec(resolved)
      case None =>
        GraftSortCol(resolved, topN, limit,
          _.select(required.fieldNames.map(col).toIndexedSeq: _*))
    }
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      // MUST be readSchema() (not the cell projection): with a pushed
      // aggregate the scan's output is the aggregate schema, and Spark
      // validates the v1 relation against the v2 scan's schema.
      override def schema: StructType = readSchema()
      override def buildScan(): RDD[Row] =
        resolvedFrame(context.sparkSession).rdd
    }.asInstanceOf[T]

  /** Streaming read = the table's append feed (see
    * [[GraftMicroBatchStream]] for the semantics contract). */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(pinned.isEmpty,
      s"cannot stream from a time-travel view of $tableName")
    new GraftMicroBatchStream(engine, tableName, gscan, required,
      maxVersionsPerTrigger,
      saltBuckets = engine.currentManifest(tableName).descriptor.saltBuckets,
      startingVersion = startingVersion)
  }
}
