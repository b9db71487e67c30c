package graft.catalog

import graft.{Graft, SparkSpec}
import graft.core.Bytes
import graft.write.Put
import java.nio.file.Files

/** r15 persisted per-version stats ([[ManifestStats]]): computed while
  * the data is in hand (create/append/compaction/build), rolled forward
  * in O(delta) on appends, served metadata-only at query time — plus the
  * r14 ADVICE fixes (root-scoped verdict purge, LRU stat caches). */
class CatalogStatsSpec extends SparkSpec {

  private def b(s: String) = Bytes.toBytes(s)
  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString
  private def desc(name: String) = TableDescriptor(name,
    Seq(FamilyDescriptor("f")), splitKeys = 2)

  test("manifest JSON round-trips stats (histogram with 0x00 bytes, " +
      "empty stats, and legacy absence)") {
    val d = desc("t")
    val withStats = Manifest("t", 3L, 9L, d, Seq("/a", "/b"),
      stats = Some(ManifestStats(100L, 80L,
        Some(Array[Byte](0, 1, 0)), Some(Array[Byte](-1, 0, 2)),
        100L, Seq(Array[Byte](0), Array[Byte](0, 5), Array[Byte](-1)),
        unseenRows = 7L)))
    val rt = ManifestJson.read(ManifestJson.write(withStats))
    val st = rt.stats.get
    assert(st.rows == 100L && st.resolvedRows == 80L && st.histRows == 100L)
    assert(st.unseenRows == 7L)
    assert(st.minKey.get.toSeq == Seq[Byte](0, 1, 0))
    assert(st.maxKey.get.toSeq == Seq[Byte](-1, 0, 2))
    assert(st.histogram.map(_.toSeq) ==
      Seq(Seq[Byte](0), Seq[Byte](0, 5), Seq[Byte](-1)))
    val empty = Manifest("t", 1L, 9L, d, Nil,
      stats = Some(ManifestStats(0L, 0L, None, None, 0L, Nil)))
    val rtE = ManifestJson.read(ManifestJson.write(empty)).stats.get
    assert(rtE.rows == 0L && rtE.minKey.isEmpty && rtE.histogram.isEmpty)
    // legacy manifests carry no stats and must stay byte-identical
    val legacy = Manifest("t", 2L, 9L, d, Seq("/a"))
    assert(ManifestJson.read(ManifestJson.write(legacy)).stats.isEmpty)
    assert(!ManifestJson.write(legacy).contains("statsRows"))
  }

  test("stats roll forward in O(delta): first batch computes full stats " +
      "(histogram included), later appends merge, tombstones add no " +
      "resolved mass, a full rewrite re-tightens") {
    val root = freshRoot("statroll")
    val g = Graft(spark, root)
    g.createTable(desc("t"), 1L)
    val engine = g.catalog
    assert(engine.currentManifest("t").stats.contains(
      ManifestStats(0L, 0L, None, None, 0L, Nil)))
    g.table("t").put((1 to 100).map(i =>
      Put(b(f"r$i%04d")).add("f", b("v"), 2L, Bytes.toBytes(i.toLong))), 2L)
    val m1 = engine.currentManifest("t")
    val s1 = m1.stats.get
    assert(s1.rows == 100L && s1.resolvedRows == 100L)
    assert(new String(s1.minKey.get, "UTF-8") == "r0001")
    assert(new String(s1.maxKey.get, "UTF-8") == "r0100")
    assert(s1.histRows == 100L &&
      s1.histogram.length == Catalog.HistBuckets + 1,
      "the FIRST batch must compute the histogram (CREATE INDEX's " +
        "initial build lands on this path)")
    // exact boundaries at this size: ends are the true min/max
    assert(new String(s1.histogram.head, "UTF-8") == "r0001")
    assert(new String(s1.histogram.last, "UTF-8") == "r0100")
    // second append: rows add, span widens, histogram carries
    g.table("t").put((101 to 150).map(i =>
      Put(b(f"r$i%04d")).add("f", b("v"), 3L, Bytes.toBytes(i.toLong))), 3L)
    val s2 = engine.currentManifest("t").stats.get
    assert(s2.rows == 150L && s2.resolvedRows == 150L)
    assert(new String(s2.maxKey.get, "UTF-8") == "r0150")
    assert(s2.histRows == 100L &&
      s2.histogram.map(_.toSeq) == s1.histogram.map(_.toSeq),
      "appends must not recompute the histogram — unseen mass covers")
    assert(s1.unseenRows == 0L && s2.unseenRows == 50L,
      "the unseen-mass term must track post-histogram appends")
    // tombstones: raw rows grow, the resolved upper bound does not
    g.table("t").delete(Seq(graft.write.Delete(b("r0001"))
      .deleteFamily("f", 4L)), 4L)
    val s3 = engine.currentManifest("t").stats.get
    assert(s3.rows == 151L && s3.resolvedRows == 150L,
      "a tombstone adds raw mass but never resolved mass")
    // a full rewrite (compaction path) recomputes everything exactly
    val resolved = graft.read.Resolve(engine.read("t"))
    val m4 = engine.replaceData("t", resolved, 5L)
    val s4 = m4.stats.get
    assert(s4.rows == 149L && s4.resolvedRows == 149L,
      s"full rewrite must re-tighten (got $s4)")
    assert(s4.histRows == 149L && s4.histogram.nonEmpty &&
      s4.unseenRows == 0L)
    assert(new String(s4.minKey.get, "UTF-8") == "r0002")
  }

  test("a partial compaction carries the histogram AND the unseen-mass " +
      "term unchanged (review r15: deriving unseen from the shrunken " +
      "raw total was unsound)") {
    val root = freshRoot("statpartial")
    val g = Graft(spark, root)
    g.createTable(desc("t"), 1L)
    g.table("t").put((1 to 100).map(i =>
      Put(b(f"r$i%04d")).add("f", b("v"), 2L, Bytes.toBytes(i.toLong))), 2L)
    g.table("t").put((101 to 150).map(i =>
      Put(b(f"r$i%04d")).add("f", b("v"), 3L, Bytes.toBytes(i.toLong))), 3L)
    val engine = g.catalog
    val before = engine.currentManifest("t")
    val s0 = before.stats.get
    assert(s0.unseenRows == 50L && s0.histRows == 100L)
    // fold the SECOND batch's leaves (a minor compaction of the delta
    // tail): raw total is back to 150, yet the 50 post-histogram rows
    // are still stored — the carried unseen term must keep covering
    // them (rows - histRows would read 50 here by luck; fold the FIRST
    // batch instead and it would read 0 while the 50 appended rows
    // remain — so pin the EXPLICIT carry on exactly that shape)
    val firstLeaves = before.dataDirs.filter(_.contains("data-2"))
    assert(firstLeaves.nonEmpty)
    val folded = engine.replaceDirs("t", firstLeaves,
      engine.readLeafDirs(firstLeaves), 4L)
    val s1 = folded.stats.get
    assert(s1.rows == 150L, s"raw total after fold (got ${s1.rows})")
    assert(s1.unseenRows == 50L,
      "the unseen term must carry UNCHANGED through a partial " +
        "compaction — the appended rows are still histogram-invisible")
    assert(s1.histRows == 100L &&
      s1.histogram.map(_.toSeq) == s0.histogram.map(_.toSeq),
      "the histogram must carry through a partial compaction")
  }

  test("query-time stats are metadata-only after a build: zero lazy " +
      "stat jobs (r15 ask: cold-start guarding reads the manifest)") {
    val root = freshRoot("statcold")
    val g = Graft(spark, root)
    g.createTable(desc("t"), 1L)
    g.table("t").put((1 to 50).map(i =>
      Put(b(f"r$i%03d")).add("f", b("v"), 2L, Bytes.toBytes(i.toLong))), 2L)
    val engine = g.catalog
    val m = engine.currentManifest("t")
    val before = Catalog.statJobs.get()
    assert(engine.manifestRows(m) == 50L)
    assert(engine.manifestKeySpan(m).isDefined)
    assert(engine.manifestResolvedRows(m).contains(50L))
    assert(engine.manifestHistogram(m).exists(_._1 == 50L))
    assert(Catalog.statJobs.get() == before,
      "persisted stats must serve without a single lazy stat job")
    // the legacy path (stats-less manifest — a restore repoint) still
    // works and is what the counter counts
    val m2 = engine.commitDataDirs("t", m.dataDirs, 3L)
    assert(m2.stats.isEmpty)
    assert(engine.manifestRows(m2) == 50L)
    assert(Catalog.statJobs.get() > before,
      "the stats-less fallback is a real (counted) job")
    // analyzeTable re-persists full stats for exactly this shape
    val m3 = engine.analyzeTable("t", 4L)
    assert(m3.stats.exists(s => s.rows == 50L && s.histogram.nonEmpty))
  }

  test("stat caches evict LRU, not wholesale (ADVICE r14)") {
    val c = new Catalog.LruCache[Int, String](4)
    (1 to 4).foreach(i => c.getOrElseUpdate(i)(i.toString): Unit)
    // touch 1 so it is the most recent; 2 becomes eldest
    c.getOrElseUpdate(1)("X"): Unit
    c.getOrElseUpdate(5)("5"): Unit
    assert(c.size == 4, "one miss past the cap evicts exactly one entry")
    var computed = false
    assert(c.getOrElseUpdate(1) { computed = true; "Y" } == "1",
      "the recently-touched entry must survive the eviction")
    assert(!computed)
    assert(c.getOrElseUpdate(2) { computed = true; "2b" } == "2b",
      "the eldest entry (2) must be the one evicted")
    assert(computed)
  }
}
