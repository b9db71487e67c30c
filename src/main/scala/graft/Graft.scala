package graft

import graft.catalog.{Catalog, FamilyDescriptor, TableDescriptor}
import graft.read.{Get, ReadView, Resolve, Scan, ScanExec}
import graft.snapshot.Snapshots
import graft.write.{Compact, Delete, Mutations, Put}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

/** The engine facade — the reference's `HBaseAdmin` + `HTable` surface
  * (§2.7, §2.8) on one object: a user of the reference switches by
  * replacing client calls one-for-one:
  *
  * {{{
  * val g = Graft(spark, "/data/graft")
  * g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f"))), nowMs)
  * val t = g.table("t")
  * t.put(Seq(Put(rk).add("f", q, v)), nowMs)
  * t.scan(Scan().addFamily("f").setFilter(...))   // DataFrame of cells
  * t.get(Get(rk))
  * g.snapshot("s1", "t", nowMs); g.restoreSnapshot("s1", nowMs)
  * }}}
  */
final case class Graft(spark: SparkSession, root: String) {
  val catalog = new Catalog(spark, root)
  val snapshots = new Snapshots(spark, catalog, root)

  // ---- DDL (`HBaseAdmin`)
  def createTable(desc: TableDescriptor, nowMs: Long): Unit =
    catalog.createTable(desc, nowMs)
  def deleteTable(name: String): Unit = catalog.deleteTable(name)
  def listTables(): Seq[String] = catalog.listTables()
  def tableExists(name: String): Boolean = catalog.tableExists(name)
  def alterTable(name: String, desc: TableDescriptor, nowMs: Long): Unit =
    catalog.alterTable(name, desc, nowMs)
  /** `disableTable:449`/`enableTable:393` — our only semantic is the
    * read-only latch (no serving lifecycle to manage). */
  def disableTable(name: String, nowMs: Long): Unit = {
    val d = catalog.currentManifest(name).descriptor
    catalog.alterTable(name, d.copy(readOnly = true), nowMs)
  }
  def enableTable(name: String, nowMs: Long): Unit = {
    val d = catalog.currentManifest(name).descriptor
    catalog.alterTable(name, d.copy(readOnly = false), nowMs)
  }

  def table(name: String): GraftTable = GraftTable(this, name)

  // ---- snapshot lifecycle (`HBaseAdmin:899-948`)
  def snapshot(name: String, tableName: String, nowMs: Long): Unit =
    snapshots.snapshot(name, tableName, nowMs)
  def listSnapshots(): Seq[String] = snapshots.listSnapshots()
  def restoreSnapshot(name: String, nowMs: Long): Unit =
    snapshots.restore(name, nowMs)
  def cloneSnapshot(name: String, newTable: String, nowMs: Long): Unit =
    snapshots.clone(name, newTable, nowMs)
  def deleteSnapshot(name: String): Unit = snapshots.deleteSnapshot(name)
  def readSnapshot(name: String): DataFrame = snapshots.read(name)
  def diffSnapshots(a: String, b: String): DataFrame = snapshots.diff(a, b)
  def exportSnapshot(name: String, targetDir: String,
      baseExportDir: Option[String] = None): Unit =
    snapshots.exportSnapshot(name, targetDir, baseExportDir = baseExportDir)
  def importSnapshot(name: String, exportedDir: String): Unit =
    snapshots.importSnapshot(name, exportedDir)

  /** Refcount-style GC: drop data dirs referenced by no table version and
    * no snapshot (`SnapshotLogCleaner` + META refcounts). */
  def vacuum(tableName: String): Seq[String] =
    catalog.vacuum(tableName, snapshots.protectedDirs())

  /** Open a table's change feed as an unbounded streaming DataFrame —
    * the table's own `data-*` append history is the WAL
    * ([[graft.streaming.Replication.tableChangeFeed]]); replays existing
    * append batches, then tails new ones. Like the reference's WAL, the
    * file feed runs AHEAD of the catalog commit: batch files written by
    * an append that then failed its manifest commit still ship (and are
    * absorbed by the ts/seq-idempotent sink contract); the
    * manifest-gated alternative is `spark.readStream.table` through
    * [[graft.sql.GraftSqlCatalog]]. */
  def readStream(tableName: String, maxFilesPerTrigger: Int = 16): DataFrame =
    graft.streaming.Replication.tableChangeFeed(
      spark, root, tableName, maxFilesPerTrigger)
}

/** Per-table operations (`HTable`). Reads honor the family descriptor's
  * maxVersions/TTL defaults the way `ScanQueryMatcher` reads them off the
  * `HColumnDescriptor`. */
final case class GraftTable(g: Graft, name: String) {
  private def spark = g.spark

  def cells: DataFrame = g.catalog.read(name)
  def descriptor: TableDescriptor = g.catalog.currentManifest(name).descriptor

  // ---- reads (per-family descriptor maxVersions/TTL applied, exactly
  // as ScanQueryMatcher reads them off the HColumnDescriptor)
  def scan(s: Scan, nowMs: Long = 0L): DataFrame = {
    val d = descriptor
    ScanExec(cells, s, ttlMs = None, now = nowMs,
      familyMaxVersions = d.families.map(f => f.name -> f.maxVersions).toMap,
      familyTtlMs = d.families.flatMap(f => f.ttlMs.map(f.name -> _)).toMap)
  }
  /** Scan decoded to a relational view (`Result`-shaped rows): one row
    * per table row, columns = qualifier names typed by `schema`. */
  def scanDecoded(s: Scan, schema: org.apache.spark.sql.types.StructType,
      key: Seq[(String, org.apache.spark.sql.types.DataType)] = Nil,
      family: Option[String] = None, nowMs: Long = 0L): DataFrame =
    graft.core.CellCodec.decode(scan(s, nowMs), schema, key, family)

  def get(gt: Get): DataFrame = ScanExec.get(cells, gt)
  /** Batch point reads (`HTable.get(List<Get>):692`) as one job, under
    * the family descriptor's maxVersions/TTL like [[scan]]. All gets
    * share `scan`'s projection/version options. */
  def multiGet(rows: Seq[Array[Byte]], s: Scan = Scan(),
      nowMs: Long = 0L): DataFrame = {
    val d = descriptor
    ScanExec.multiGet(cells, rows, s, ttlMs = None, now = nowMs,
      familyMaxVersions = d.families.map(f => f.name -> f.maxVersions).toMap,
      familyTtlMs = d.families.flatMap(f => f.ttlMs.map(f.name -> _)).toMap)
  }
  def exists(gt: Get): Boolean = ScanExec.exists(cells, gt)
  def getRowOrBefore(row: Array[Byte], family: String): DataFrame =
    ScanExec.getRowOrBefore(cells, row, family)

  // Family validation on client-built mutations — the reference rejects
  // unknown families per mutation (`HRegion.checkFamilies` via
  // `HRegion.put:1303`). Data-derived bulk batches (`mutate`) skip this
  // driver-side check by design.
  private def checkFamilies(cells: Seq[graft.core.Cell]): Unit = {
    val known = descriptor.families.map(_.name).toSet
    val bad = cells.map(_.family).distinct.filterNot(known)
    require(bad.isEmpty,
      s"unknown column families ${bad.mkString(",")} for table $name " +
        s"(has: ${known.mkString(",")})")
  }

  // ---- writes (each commits one new immutable data dir)
  def put(puts: Seq[Put], nowMs: Long): Unit = {
    checkFamilies(puts.flatMap(_.cells))
    g.catalog.append(name, Mutations.toDF(spark, puts, nowMs), nowMs)
  }
  def delete(dels: Seq[Delete], nowMs: Long): Unit = {
    checkFamilies(dels.flatMap(_.cells))
    g.catalog.append(name, Mutations.toDF(spark, dels, nowMs), nowMs)
  }
  def mutate(batch: DataFrame, nowMs: Long): Unit =
    g.catalog.append(name, batch, nowMs)
  def increment(increments: DataFrame, nowMs: Long): Unit =
    g.catalog.append(name, Mutations.increment(cells, increments, nowMs), nowMs)
  def checkAndMutate(checks: DataFrame, batch: DataFrame, nowMs: Long): Unit =
    g.catalog.append(name, Mutations.checkAndMutate(cells, checks, batch), nowMs)

  /** Major compaction (`majorCompact:736`): rewrite to the resolved view
    * under the family descriptor's maxVersions/TTL, dropping tombstones. */
  def majorCompact(nowMs: Long): Unit =
    g.catalog.replaceData(name,
      Compact.major(cells, descriptor.families, nowMs), nowMs)

  /** Minor compaction / `compact:714`: merge small deltas into one dir,
    * KEEPING tombstones (`MinorCompactingStoreScanner` semantics). */
  def minorCompact(nowMs: Long): Unit =
    g.catalog.replaceData(name, cells, nowMs)

  /** Shell `truncate` parity (disable+drop+recreate in the reference):
    * a compaction-to-empty commit — schema kept, data gone, old manifest
    * versions/snapshots still readable until vacuum. Refused on
    * read-only tables (a data mutation, unlike maintenance compaction). */
  def truncate(nowMs: Long): Unit = {
    require(!descriptor.readOnly, s"table $name is read-only")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.core.Cell.schema)
    g.catalog.replaceData(name, empty, nowMs): Unit
  }

  /** Register the RESOLVED view as a Spark SQL temp view, so the table is
    * queryable with `spark.sql` (graft_* functions are registered by the
    * session extension): the relational face of the cell table. */
  def createTempView(viewName: String, maxVersions: Int = 1): Unit =
    ScanExec(cells, Scan().setMaxVersions(maxVersions))
      .createOrReplaceTempView(viewName)
}
