package graft.snapshot

import graft.catalog.{Catalog, Manifest, ManifestJson}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets

/** Snapshot lifecycle — the fork's core feature (SURVEY §2.6), re-expressed
  * on immutable manifests. The reference needs a ZooKeeper 2-phase protocol
  * (`SnapshotMonitor.java:46`, `ZKSnapshotWatcher.java:42`) because region
  * servers mutate HFiles in place; our data dirs are immutable once
  * referenced, so `snapshot` is one atomic manifest write — same
  * reference-file/copy-on-write idea as `HRegion.java:2263-2292`, without
  * the coordination.
  *
  * Layout: `{root}/.snapshot/{name}.json` holding the frozen table
  * manifest (a `SnapshotDescriptor`: name, table, creationTime —
  * `SnapshotDescriptor.java:36-106` — plus the file references).
  */
final class Snapshots(spark: SparkSession, catalog: Catalog, root: String) {

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def snapDir = new Path(root, ".snapshot")
  private def snapPath(name: String) = new Path(snapDir, s"$name.json")

  private def writeFile(p: Path, content: String): Unit = {
    val out = fs.create(p, false)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def readFile(p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  /** `admin.snapshot(name, table)` (`HBaseAdmin.java:899`): freeze the
    * current manifest under the snapshot name. O(1), no data copied. */
  def snapshot(name: String, table: String, nowMs: Long): Unit = {
    require(!fs.exists(snapPath(name)), s"snapshot $name exists")
    fs.mkdirs(snapDir)
    val m = catalog.currentManifest(table).copy(createdMs = nowMs)
    writeFile(snapPath(name), ManifestJson.write(m))
  }

  /** `HBaseAdmin.listSnapshots:920`. */
  def listSnapshots(): Seq[String] =
    if (!fs.exists(snapDir)) Seq.empty
    else fs.listStatus(snapDir).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json")).sorted

  def manifest(name: String): Manifest =
    ManifestJson.read(readFile(snapPath(name)))

  /** Read a snapshot directly (time travel read, no restore needed). */
  def read(name: String): DataFrame = catalog.readManifest(manifest(name))

  /** `HBaseAdmin.restoreSnapshot:934`: repoint the live table at the
    * snapshot's data. Copy-on-write — instant, reversible while newer
    * manifests are retained. */
  def restore(name: String, nowMs: Long): Unit = {
    val snap = manifest(name)
    catalog.commitDataDirs(snap.table, snap.dataDirs, nowMs)
  }

  /** Clone: new table over the SAME data dirs (zero copy) — the restore
    * path applied to a fresh name (`RestoreSnapshot.java:97-133`).
    * Index registrations are NOT cloned: they name the SOURCE table's
    * index tables, and a clone appending through them would pollute the
    * source's index (Phoenix likewise scopes an index to its one data
    * table). A clone starts index-less; create fresh indexes on it. */
  def clone(name: String, newTable: String, nowMs: Long): Unit = {
    val snap = manifest(name)
    catalog.createTable(
      snap.descriptor.copy(name = newTable, indexes = Nil), nowMs)
    catalog.commitDataDirs(newTable, snap.dataDirs, nowMs)
  }

  /** `HBaseAdmin.deleteSnapshot:948`: remove the snapshot manifest. Data
    * dirs it referenced stay until `vacuum` proves nothing else points at
    * them — the refcount-GC contract (SURVEY §7.5 risk 6). */
  def deleteSnapshot(name: String): Unit = {
    require(fs.exists(snapPath(name)), s"no snapshot $name")
    fs.delete(snapPath(name), false)
  }

  /** Data dirs referenced by any live snapshot (vacuum protection set). */
  def protectedDirs(): Set[String] =
    listSnapshots().flatMap(n => manifest(n).dataDirs).toSet

  // Leaf dirs are data-{v}/_fam={f}: keep the version component in the
  // exported layout or same-named family leaves of different versions
  // would collide. Idempotent on the exported layout itself (the parent
  // of an exported leaf is again `data-{v}`), which is what lets an
  // incremental export chain off a previous one.
  //
  // ONLY version-scoped dirs are shareable with a base export: for
  // `data-{v}/...`/`compact-{v}/...` names, leaf-name equality IS content
  // equality (versions are unique within a table, dirs immutable once
  // referenced). Bulk-loaded dirs are adopted by `Catalog.bulkLoad` at
  // ARBITRARY paths — two different bulk dirs can share a bare leaf name,
  // so matching them against a base export by leaf name could silently
  // skip a copy and point the new manifest at wrong-content data. They are
  // never shared (always copied), under a rel name disambiguated by a
  // hash of their full source path.
  private def shareableRel(dp: Path): Option[String] = {
    val parent = Option(dp.getParent).map(_.getName).getOrElse("")
    if (parent.startsWith("data-") || parent.startsWith("compact-"))
      Some(s"$parent/${dp.getName}")
    else None
  }

  private def exportRel(dp: Path): String = shareableRel(dp).getOrElse {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dp.toString.getBytes(StandardCharsets.UTF_8))
      .take(6).map(b => f"$b%02x").mkString
    s"adopted-$h/${dp.getName}"
  }

  /** `ExportSnapshot` (745 LoC MR distcp): copy a snapshot's files to
    * another filesystem/dir as a size-balanced distributed Spark job over
    * the file list (`SnapshotInputFormat:388` splits by size; here we
    * repartition the file list and copy per-partition).
    *
    * `baseExportDir` makes the export INCREMENTAL: data dirs already
    * shipped by that earlier export of the same table are not copied
    * again — the new manifest references them in place (the reference's
    * `ExportSnapshot` ships reference-files for HFiles the target
    * already holds, so successive snapshot exports cost only the delta).
    * Sharing applies only to version-scoped `data-{v}`/`compact-{v}`
    * dirs, where the name is content (see [[shareableRel]]); bulk-loaded
    * dirs adopted at arbitrary paths are always copied. The exported
    * snapshot then stands on (targetDir + the base export chain); the
    * SOURCE catalog can die. */
  def exportSnapshot(name: String, targetDir: String, parallelism: Int = 16,
      baseExportDir: Option[String] = None): Unit = {
    val snap = manifest(name)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // relName -> absolute dir in the base export (or ITS base, if the
    // base manifest already references further back)
    val shared: Map[String, String] = baseExportDir match {
      case None => Map.empty
      case Some(b) =>
        val mp = new Path(b, "snapshotinfo.json")
        val bm = ManifestJson.read(readFile(mp))
        require(bm.table == snap.table,
          s"base export is of table ${bm.table}, not ${snap.table}")
        bm.dataDirs.flatMap(d => shareableRel(new Path(d)).map(_ -> d)).toMap
    }
    val copyDirs =
      snap.dataDirs.filterNot(d =>
        shareableRel(new Path(d)).exists(shared.contains))
    val files: Seq[(String, String, Long)] = copyDirs.flatMap { d =>
      val dp = new Path(d)
      val dfs = dp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!dfs.exists(dp)) Seq.empty
      else {
        // recursive: leaf dirs may nest _bucket={i} subdirs (pre-split
        // boundaries); keep each file's path relative to the leaf
        val base = dfs.makeQualified(dp).toString
        val it = dfs.listFiles(dp, true)
        val out = Seq.newBuilder[(String, String, Long)]
        while (it.hasNext) {
          val st = it.next()
          val rel = st.getPath.toString.stripPrefix(base).stripPrefix("/")
          out += ((st.getPath.toString, s"${exportRel(dp)}/$rel", st.getLen))
        }
        out.result()
      }
    }
    // Largest-first round-robin over partitions = size balancing.
    val balanced = files.sortBy(-_._3).zipWithIndex
      .map { case ((src, rel, _), i) => (i % parallelism, src, rel) }
    val target = targetDir
    spark.sparkContext.parallelize(balanced, parallelism)
      .foreachPartition { it =>
        val c = conf.value
        it.foreach { case (_, src, rel) =>
          val srcP = new Path(src)
          val dstP = new Path(target, rel)
          val dstFs = dstP.getFileSystem(c)
          val srcFs = srcP.getFileSystem(c)
          org.apache.hadoop.fs.FileUtil.copy(srcFs, srcP, dstFs, dstP, false, true, c)
        }
      }
    // snapshot manifest, rewritten to the exported layout; dirs the base
    // export already holds point there instead of being re-shipped
    val exported = snap.copy(dataDirs = snap.dataDirs.map { d =>
      val dp = new Path(d)
      shareableRel(dp).flatMap(shared.get)
        .getOrElse(new Path(target, exportRel(dp)).toString)
    })
    val mp = new Path(target, "snapshotinfo.json")
    val tfs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = tfs.create(mp, true)
    try out.write(ManifestJson.write(exported).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Snapshot DIFF — what changed between two snapshots of one table,
    * the audit primitive of a VERSIONED corpus (which documents entered,
    * left, or changed between corpus v1 and v2; the natural extension of
    * the reference's snapshot surface for data-pipeline use). One row per
    * visible (row, family, qualifier) whose latest value differs:
    * `change` ∈ added (in `b`, not `a`) / removed / changed, with both
    * value sides carried for inspection.
    *
    * Both sides resolve through the normal scan path (tombstones, version
    * caps — `scan` must keep maxVersions=1 so the cell coordinate is
    * unique), then meet in ONE full-outer hash join on the coordinate —
    * two snapshot scans + one shuffle, no driver materialization, so the
    * diff of two 100 TB snapshots is an ordinary distributed join. Equal
    * coordinates with equal bytes drop out early (the common case: most
    * of a corpus is unchanged between versions). */
  def diff(a: String, b: String, scan: graft.read.Scan = graft.read.Scan()):
      DataFrame = {
    require(scan.maxVersions == 1,
      "diff compares the single visible version per coordinate")
    import org.apache.spark.sql.functions._
    def visible(name: String, vCol: String) =
      graft.read.ScanExec(read(name), scan)
        .select(col("row"), col("family"), col("qualifier"),
          col("value").as(vCol))
    visible(a, "value_a").join(visible(b, "value_b"),
        Seq("row", "family", "qualifier"), "full_outer")
      .withColumn("change",
        when(col("value_a").isNull, lit("added"))
          .when(col("value_b").isNull, lit("removed"))
          .when(col("value_a") =!= col("value_b"), lit("changed")))
      .filter(col("change").isNotNull)
      .select("row", "family", "qualifier", "change", "value_a", "value_b")
  }

  /** `ImportSnapshot`: register an exported snapshot dir as a local
    * snapshot (data stays where it is — reference files). */
  def importSnapshot(name: String, exportedDir: String): Unit = {
    val mp = new Path(exportedDir, "snapshotinfo.json")
    val m = ManifestJson.read(readFile(mp))
    fs.mkdirs(snapDir)
    writeFile(snapPath(name), ManifestJson.write(m))
  }
}
