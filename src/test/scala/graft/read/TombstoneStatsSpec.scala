package graft.read

import graft.{Graft, SparkSpec}
import graft.core.{Cell, CellKind, StoreStats}
import graft.catalog.{FamilyDescriptor, TableDescriptor}
import graft.write.{Delete, Put}
import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.functions._

/** Write-side tombstone stats (r17): [[StoreStats]] roundtrip, the
  * zero-job plan-walk proof in [[Resolve.masked]] (decision order:
  * caller hint > written stats > limit-1 probe), and the Catalog writer
  * seam. The decisive fixtures use a stats file that CONTRADICTS the
  * data: only the stats path can produce the observed plan/output, so
  * the tests pin which decision source ran without counting jobs. */
class TombstoneStatsSpec extends SparkSpec {

  private def b(s: String) = s.getBytes("UTF-8")
  private def put(r: String, q: String, ts: Long, v: String) =
    Cell.put(b(r), "f", b(q), ts, b(v), 0L)

  private def hadoopFs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write `cs` as a bare parquet dir (no stats file unless asked). */
  private def store(cs: Seq[Cell], tombstonesStat: Option[Long]): String = {
    val dir = Files.createTempDirectory("graft-tombstats").toString
    cells(cs).toDF().write.mode("overwrite").parquet(dir)
    tombstonesStat.foreach(t => StoreStats.write(hadoopFs(dir), new Path(dir), t))
    dir
  }

  private def read(dir: String): DataFrame =
    spark.read.schema(Cell.schema).parquet(dir)

  private def hasMaskingWindows(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collect { case w: LWindow => w }.nonEmpty

  test("StoreStats roundtrip; absent or garbage file reads as unknown") {
    val dir = Files.createTempDirectory("graft-stats-rt").toString
    val conf = spark.sparkContext.hadoopConfiguration
    assert(StoreStats.tombstones(conf, new Path(dir)).isEmpty)
    StoreStats.write(hadoopFs(dir), new Path(dir), 42L)
    assert(StoreStats.tombstones(conf, new Path(dir)).contains(42L))
    StoreStats.write(hadoopFs(dir), new Path(dir), 0L) // overwrite
    assert(StoreStats.tombstones(conf, new Path(dir)).contains(0L))
    val os = hadoopFs(dir).create(new Path(dir, StoreStats.FileName), true)
    os.write("not json".getBytes("UTF-8")); os.close()
    assert(StoreStats.tombstones(conf, new Path(dir)).isEmpty)
  }

  test("written stats short-circuit the probe (writer is trusted, no data scan)") {
    // Stats CLAIM tombstone-free; the data disagrees. True masking would
    // remove the put (DeleteColumn ts=5 masks ts<=5); the stats fast path
    // keeps it. Only the stats path yields this output — the probe would
    // have found the tombstone — so this pins stats-before-probe AND that
    // no data pass ran for the decision.
    val dir = store(Seq(
      put("r1", "q1", 1, "v1"),
      Cell.deleteColumn(b("r1"), "f", b("q1"), 5)), tombstonesStat = Some(0L))
    val out = Resolve.masked(read(dir), ReadView(maxVersions = 10))
    assert(!hasMaskingWindows(out))
    assert(collectCells(out) == Set(("r1", "f", "q1", 1L, "v1")))
  }

  test("truthful nonzero stats keep the full masking windows") {
    val dir = store(Seq(
      put("r1", "q1", 1, "v1"), put("r1", "q1", 7, "v7"),
      Cell.deleteColumn(b("r1"), "f", b("q1"), 5)), tombstonesStat = Some(1L))
    val out = Resolve.masked(read(dir), ReadView(maxVersions = 10))
    assert(hasMaskingWindows(out))
    assert(collectCells(out) == Set(("r1", "f", "q1", 7L, "v7")))
  }

  test("absent stats fall back to the probe, both directions") {
    val free = store(Seq(put("r1", "q1", 1, "v1")), tombstonesStat = None)
    val outFree = Resolve.masked(read(free), ReadView(maxVersions = 10))
    assert(!hasMaskingWindows(outFree)) // probe proved all-Put
    assert(collectCells(outFree) == Set(("r1", "f", "q1", 1L, "v1")))

    val dirty = store(Seq(
      put("r1", "q1", 1, "v1"),
      Cell.deleteColumn(b("r1"), "f", b("q1"), 5)), tombstonesStat = None)
    val outDirty = Resolve.masked(read(dirty), ReadView(maxVersions = 10))
    assert(hasMaskingWindows(outDirty))
    assert(collectCells(outDirty).isEmpty)
  }

  test("plan walk admits filter/pass-through-project/union over stats-free dirs") {
    // d1's stats lie (data has a tombstone) so the fast-path output is
    // distinguishable; d2 is genuinely free. The composed frame —
    // union + filter + pass-through select — must still be PROVEN free
    // via stats (the d1 put survives un-masked).
    val d1 = store(Seq(
      put("r1", "q1", 1, "v1"),
      Cell.deleteColumn(b("r1"), "f", b("q1"), 5)), tombstonesStat = Some(0L))
    val d2 = store(Seq(put("r2", "q1", 2, "v2")), tombstonesStat = Some(0L))
    val composed = read(d1).union(read(d2))
      .filter(col("ts") >= 0L)
      .select(Cell.schema.fieldNames.map(col): _*)
    val out = Resolve.masked(composed, ReadView(maxVersions = 10))
    assert(!hasMaskingWindows(out))
    assert(collectCells(out) ==
      Set(("r1", "f", "q1", 1L, "v1"), ("r2", "f", "q1", 2L, "v2")))
  }

  test("a projection that rewrites `kind` disqualifies the proof") {
    // All-Put dir with truthful stats=0, then kind is REWRITTEN so ts=5
    // becomes a DeleteColumn. The Alias named `kind` must void the proof;
    // the probe then sees the tombstone and full masking removes the
    // ts=1 put. A wrong proof would keep it via the Put filter.
    val dir = store(Seq(
      put("r1", "q1", 1, "v1"), put("r1", "q1", 5, "v5")),
      tombstonesStat = Some(0L))
    val rewritten = read(dir).withColumn("kind",
      when(col("ts") === 5L, lit(CellKind.DeleteColumn)).otherwise(col("kind")))
    val out = Resolve.masked(rewritten, ReadView(maxVersions = 10))
    assert(hasMaskingWindows(out))
    assert(collectCells(out).isEmpty)
  }

  test("ReadView.tombstoneFree hint wins over stats and probe") {
    // Some(true) on an in-memory frame WITH a tombstone: masking reduces
    // to the Put filter, the masked put survives (caller's contract).
    val fx = cells(Seq(
      put("r1", "q1", 1, "v1"),
      Cell.deleteColumn(b("r1"), "f", b("q1"), 5)))
    val hinted = Resolve.masked(fx.toDF(),
      ReadView(maxVersions = 10, tombstoneFree = Some(true)))
    assert(!hasMaskingWindows(hinted))
    assert(collectCells(hinted) == Set(("r1", "f", "q1", 1L, "v1")))

    // Some(false) on a provably-free store: windows run anyway (the
    // caller opted out of the probe AND the fast path), output correct.
    val dir = store(Seq(put("r1", "q1", 1, "v1")), tombstonesStat = Some(0L))
    val forced = Resolve.masked(read(dir),
      ReadView(maxVersions = 10, tombstoneFree = Some(false)))
    assert(hasMaskingWindows(forced))
    assert(collectCells(forced) == Set(("r1", "f", "q1", 1L, "v1")))
  }

  test("Catalog.writeCells records exact per-leaf tombstone counts") {
    val root = Files.createTempDirectory("graft-cat-tomb").toString
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f"), FamilyDescriptor("g"))), 1L)
    g.table("t").put(Seq(
      Put(b("r1")).add("f", b("q"), b("vf")).add("g", b("q"), b("vg")),
      Put(b("r2")).add("f", b("q"), b("v2"))), 2L)
    g.table("t").delete(Seq(
      Delete(b("r1")).deleteColumn("f", b("q"), 2L)), 3L)

    val conf = spark.sparkContext.hadoopConfiguration
    val dirs = g.catalog.currentManifest("t").dataDirs
    assert(dirs.nonEmpty)
    val stats = dirs.map(d =>
      d -> StoreStats.tombstones(conf, new Path(d)))
    // every committed leaf carries a stats file
    assert(stats.forall(_._2.isDefined), stats.filter(_._2.isEmpty))
    // the delete batch wrote exactly one tombstone, into family f's leaf
    val nonZero = stats.filter(_._2.exists(_ > 0))
    assert(nonZero.map(_._2.get) == Seq(1L), stats)
    assert(nonZero.head._1.endsWith("_fam=f"), nonZero)
    assert(stats.map(_._2.get).sum == 1L, stats)

    // and the catalog read path proves freeness per-dir: a scan of the
    // all-Put dirs only is provably free, the full set is not
    val freeDirs = stats.filter(_._2.contains(0L)).map(_._1)
    val freeScan = Resolve.masked(
      g.catalog.readLeafDirs(freeDirs), ReadView(maxVersions = 10))
    assert(!hasMaskingWindows(freeScan))
    val fullScan = Resolve.masked(
      g.catalog.readLeafDirs(dirs), ReadView(maxVersions = 10))
    assert(hasMaskingWindows(fullScan))
  }
}
