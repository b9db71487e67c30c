package graft.sql

import graft.catalog.{Catalog, FamilyDescriptor, TableDescriptor}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The SQL door (VERDICT "What's missing" #1): a DataSource V2
  * `TableCatalog` over the engine's manifest catalog, so graft tables are
  * first-class `spark.sql` citizens — no facade calls, no temp views:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", classOf[GraftSqlCatalog].getName)
  * spark.conf.set("spark.sql.catalog.graft.root", "/data/graft")
  * spark.sql("SELECT * FROM graft.t WHERE row >= x'00'")   // resolved view
  * spark.sql("INSERT INTO graft.t SELECT ...")             // Catalog.append
  * spark.sql("CREATE TABLE graft.u TBLPROPERTIES('families'='f;g:maxVersions=1')")
  * }}}
  *
  * The read surface is the RESOLVED cell view (visible puts after
  * tombstone/TTL/version resolution — what the reference's protocol
  * surfaces ship to clients: `hbase/thrift/ThriftServer.java:271-681`,
  * `hbase/rest/RowResource.java:55`); row-range and family predicates are
  * pushed into the pre-resolve scan (they commute with resolution — every
  * Resolve window partitions by `(row, family)` prefixes), where the
  * sorted range-partitioned layout turns them into parquet row-group
  * pruning. Everything else is reported back as residual for Spark to
  * evaluate post-resolve.
  *
  * DDL carries the family descriptors in the `families` table property:
  * `name[:maxVersions=N][:ttlMs=N](;next)*` — the `HColumnDescriptor`
  * surface (`HBaseAdmin.createTable:198`) — and the salted layout in
  * `saltBuckets` (immutable, like the Scala descriptor's).
  */
class GraftSqlCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: String = _

  // One engine catalog per (session, root); resolved lazily so the plugin
  // can be constructed before a SparkSession exists.
  private[sql] def engine: Catalog = {
    val spark = SparkSession.active
    new Catalog(spark, root)
  }

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.root"))
    // Wire the stats-forwarding rule into "User Provided Optimizers" —
    // the only extension batch that runs AFTER V2 pushdown (which wraps
    // V1 scans) and before join planning (which reads the stats). Done
    // here so registering a graft catalog is all a user needs; idempotent
    // across catalogs (the rule is a singleton).
    // GraftRuntimeFilterRule rides the same batch, AFTER the stats rule
    // (it reads build-side sizes the stats rule restores).
    val session = org.apache.spark.sql.SparkSession.active
    session.experimental.synchronized {
      Seq(GraftStatsRule, GraftRuntimeFilterRule).foreach { r =>
        if (!session.experimental.extraOptimizations.contains(r))
          session.experimental.extraOptimizations =
            session.experimental.extraOptimizations :+ r
      }
    }
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    engine.listTables().map(t => Identifier.of(namespace, t)).toArray

  override def loadTable(ident: Identifier): Table = {
    val t = ident.name()
    // `t$wide` resolves the declared relational view of table t (wideKey
    // + wideSchema properties — see GraftWideTable). Quoted in SQL:
    // SELECT ... FROM graft.`t$wide` ...
    if (t.endsWith(WideSpec.Suffix)) {
      val base = t.stripSuffix(WideSpec.Suffix)
      if (!engine.tableExists(base)) throw new NoSuchTableException(ident)
      val d = engine.currentManifest(base).descriptor
      if (d.wideSchema.isEmpty) throw new NoSuchTableException(ident)
      return new GraftWideTable(engine, base)
    }
    if (!engine.tableExists(t)) throw new NoSuchTableException(ident)
    new GraftSqlTable(engine, t)
  }

  /** `VERSION AS OF v` — pin the scan to manifest version `v` (the
    * manifest history IS the version chain; the reference's snapshot
    * read, `SnapshotDescriptor` by name, maps to a frozen manifest the
    * same way). */
  /** Time-travel resolution shared by the VERSION/TIMESTAMP overloads:
    * `t$wide` pins the WIDE view to the manifest (its spec, data dirs,
    * and decode all come from that version; index routing is off — a
    * live index reflects the present). */
  private def pinnedTable(ident: Identifier,
      manifestOf: String => graft.catalog.Manifest): Table = {
    val t = ident.name()
    if (t.endsWith(WideSpec.Suffix)) {
      val base = t.stripSuffix(WideSpec.Suffix)
      if (!engine.tableExists(base)) throw new NoSuchTableException(ident)
      val m = manifestOf(base)
      if (m.descriptor.wideSchema.isEmpty) throw new NoSuchTableException(ident)
      new GraftWideTable(engine, base, Some(m))
    } else {
      if (!engine.tableExists(t)) throw new NoSuchTableException(ident)
      new GraftSqlTable(engine, t, Some(manifestOf(t)))
    }
  }

  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft VERSION AS OF takes a manifest version number, got '$version'")
    }
    pinnedTable(ident, t => engine.manifestAt(t, v))
  }

  /** `TIMESTAMP AS OF ts` — latest manifest committed at or before the
    * timestamp (Spark hands micros since epoch; manifests carry
    * `createdMs`). Newest-first early-exit lookup: O(1) manifest reads
    * for recent timestamps, not O(history) JSON parses. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val ms = Math.floorDiv(timestampMicros, 1000L)
    pinnedTable(ident, t => engine.manifestAtOrBefore(t, ms).getOrElse(
      throw new IllegalArgumentException(
        s"table $t has no manifest at or before ${ms}ms")))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    val t = ident.name()
    if (engine.tableExists(t)) throw new TableAlreadyExistsException(ident)
    val fams = GraftSqlCatalog.parseFamilies(
      Option(properties.get("families")).getOrElse("f"))
    // 'saltBuckets' makes the salted layout declarable from SQL DDL —
    // the same immutable table property the Scala descriptor carries —
    // and 'immutableRows' the Phoenix IMMUTABLE_ROWS declaration that
    // covered indexes require.
    val salt = Option(properties.get("saltBuckets")).map(_.toInt).getOrElse(0)
    val immutable = Option(properties.get("immutableRows"))
      .exists(_.toBoolean)
    // 'wideKey'/'wideSchema' declare the relational view `t$wide`
    // (validated eagerly so a bad declaration fails the DDL, not the
    // first query)
    val wideKey = Option(properties.get("wideKey"))
    val wideSchema = Option(properties.get("wideSchema"))
    if (wideKey.isDefined || wideSchema.isDefined)
      WideSpec.parse(wideKey, wideSchema): Unit
    // SQL has no caller-supplied clock; stamp DDL like the insert path
    // does (a 0 here would poison TIMESTAMP AS OF: the created manifest
    // would sort before every real commit while carrying the newest
    // version number).
    engine.createTable(TableDescriptor(t, fams, saltBuckets = salt,
      immutableRows = immutable, wideKey = wideKey, wideSchema = wideSchema),
      nowMs = GraftSqlCatalog.nowMs())
    new GraftSqlTable(engine, t)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = ident.name()
    if (!engine.tableExists(t)) throw new NoSuchTableException(ident)
    changes.foreach {
      case p: TableChange.SetProperty if p.property() == "families" =>
        val cur = engine.currentManifest(t).descriptor
        engine.alterTable(t,
          cur.copy(families = GraftSqlCatalog.parseFamilies(p.value())),
          nowMs = GraftSqlCatalog.nowMs())
      case p: TableChange.SetProperty
          if p.property() == "wideKey" || p.property() == "wideSchema" =>
        val cur = engine.currentManifest(t).descriptor
        val next =
          if (p.property() == "wideKey") cur.copy(wideKey = Some(p.value()))
          else cur.copy(wideSchema = Some(p.value()))
        // validate once both halves are present
        if (next.wideKey.isDefined && next.wideSchema.isDefined) {
          val ns = WideSpec.parse(next.wideKey, next.wideSchema)
          // Re-typing a DECLARED column through DDL would flip the decode
          // without re-encoding stored bytes — that is GraftMigrate
          // .alterColumnCodec's job (one rewrite + atomic flip). Adding
          // or removing columns stays legal; the key is immutable once
          // declared (re-keying rewrites row identity).
          if (cur.wideKey.isDefined && cur.wideSchema.isDefined) {
            val os = WideSpec.parse(cur.wideKey, cur.wideSchema)
            require(ns.key == os.key && ns.orderedKey == os.orderedKey,
              s"cannot re-declare the wideKey of $t via DDL (row identity " +
                "is baked into stored keys) — CopyTable into a new table")
            os.cols.foreach { oc =>
              ns.cols.find(nc => nc.family == oc.family && nc.name == oc.name)
                .foreach(nc => require(nc.dt == oc.dt && nc.ordered == oc.ordered,
                  s"cannot re-type wide column ${oc.family}:${oc.name} via " +
                    "DDL (stored bytes must be rewritten) — use " +
                    "alterColumnCodec"))
            }
            // Re-ADDED columns (dropped by an earlier ALTER, re-declared
            // now) must come back with their LAST declared type: the
            // dropped column's cells are still stored under the old
            // encoding, so a different type token would flip the decode
            // with no rewrite — the same torn-decode hazard as an
            // in-place re-type, laundered through two ALTERs. The
            // manifest history holds every prior declaration; compare
            // against the latest one (best-effort: pruned history
            // cannot testify).
            val readded = ns.cols.filterNot(nc => os.cols.exists(oc =>
              oc.family == nc.family && oc.name == nc.name))
            if (readded.nonEmpty) {
              val history = engine.manifests(t).sortBy(-_.version)
                .flatMap(m => (m.descriptor.wideKey, m.descriptor.wideSchema)
                  match {
                    case (wk @ Some(_), ws @ Some(_)) =>
                      scala.util.Try(WideSpec.parse(wk, ws)).toOption
                    case _ => None
                  })
              readded.foreach { nc =>
                history.iterator
                  .flatMap(_.cols.find(pc =>
                    pc.family == nc.family && pc.name == nc.name))
                  .nextOption()
                  .foreach(last => require(
                    nc.dt == last.dt && nc.ordered == last.ordered,
                    s"cannot re-add wide column ${nc.family}:${nc.name} " +
                      s"with a different type (last declared as " +
                      s"${last.dt.simpleString}${if (last.ordered) ", ordered"
                        else ""}; stored cells still carry that encoding) " +
                      "— use alterColumnCodec to migrate, or a new name"))
              }
            }
          }
        }
        engine.alterTable(t, next, nowMs = GraftSqlCatalog.nowMs())
      case other => throw new UnsupportedOperationException(
        "graft catalog supports only SET TBLPROPERTIES('families'=..., " +
          s"'wideKey'=..., 'wideSchema'=...), got $other")
    }
    new GraftSqlTable(engine, t)
  }

  override def dropTable(ident: Identifier): Boolean =
    if (engine.tableExists(ident.name())) {
      engine.deleteTable(ident.name()); true
    } else false

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft tables cannot be renamed")

  // ---- SupportsNamespaces: one flat default namespace (the catalog root
  // is the namespace — the reference has no table namespaces either), so
  // `SHOW TABLES IN <cat>` / `USE <cat>` resolve.
  override def listNamespaces(): Array[Array[String]] = Array(Array.empty)
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) Array.empty
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty
  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] =
    if (namespace.isEmpty) java.util.Collections.emptyMap()
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft has a single flat namespace")
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft has a single flat namespace")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft has a single flat namespace")
}

object GraftSqlCatalog {
  /** Clock for SQL-surface commits and TTL evaluation — wall clock (the
    * reference's server-side time), overridable for deterministic tests
    * via the session conf. */
  private[sql] def nowMs(): Long =
    SparkSession.active.conf.getOption("spark.graft.sql.nowMs")
      .map(_.toLong).getOrElse(System.currentTimeMillis())

  /** `name[:maxVersions=N][:ttlMs=N][:bloom=row|rowcol|none]
    * [:compression=zstd][:inMemory=true](;next)*` — the
    * `HColumnDescriptor` attr surface (`bloom=true` accepted as a legacy
    * alias for the row bloom). */
  private[sql] def parseFamilies(spec: String): Seq[FamilyDescriptor] =
    spec.split(';').toSeq.map(_.trim).filter(_.nonEmpty).map { s =>
      val parts = s.split(':')
      parts.drop(1).foldLeft(FamilyDescriptor(parts.head)) { (fd, kv) =>
        kv.split('=') match {
          case Array("maxVersions", v) => fd.copy(maxVersions = v.toInt)
          case Array("ttlMs", v) => fd.copy(ttlMs = Some(v.toLong))
          case Array("bloom", v) => fd.copy(bloomFilter = v.toLowerCase match {
            case "true" | "row" => graft.catalog.BloomType.Row
            case "rowcol" => graft.catalog.BloomType.RowCol
            case "false" | "none" => graft.catalog.BloomType.None
            case other => throw new IllegalArgumentException(
              s"bad bloom type '$other' in '$spec'")
          })
          case Array("compression", v) => fd.copy(compression = Some(v))
          case Array("inMemory", v) => fd.copy(inMemory = v.toBoolean)
          case other => throw new IllegalArgumentException(
            s"bad family attribute '${other.mkString("=")}' in '$spec'")
        }
      }
    }
}
