package graft.snapshot

import graft.{Graft, SparkSpec}
import graft.catalog.{FamilyDescriptor, TableDescriptor}
import graft.core.Bytes
import graft.read.Scan
import graft.write.{Delete, Put}
import java.nio.file.Files

/** Snapshot/catalog lifecycle transcribed from the reference's
  * `TestSnapshot.java:150,177` (online/offline table),
  * `TestHRegionSnapshot.java:111,169,269` (basic, compaction-after-
  * snapshot) and the refcount-GC contract (SURVEY §7.5 risk 6). */
class SnapshotSpec extends SparkSpec {

  private def b(s: String) = Bytes.toBytes(s)
  private def freshGraft(): Graft =
    Graft(spark, Files.createTempDirectory("graft-cat").toString)

  private def rows(g: Graft, t: String): Set[(String, String)] =
    g.table(t).scan(Scan()).collect().map { r =>
      (new String(r.getAs[Array[Byte]]("row"), "UTF-8"),
        Option(r.getAs[Array[Byte]]("value")).map(new String(_, "UTF-8")).orNull)
    }.toSet

  private val desc = TableDescriptor("t", Seq(FamilyDescriptor("f")), splitKeys = 2)

  test("DDL: create/list/exists/alter/disable blocks writes/delete") {
    val g = freshGraft()
    g.createTable(desc, 1L)
    assert(g.listTables() == Seq("t") && g.tableExists("t"))
    g.table("t").put(Seq(Put(b("r1")).add("f", b("q"), b("v1"))), 2L)
    g.disableTable("t", 3L)
    intercept[IllegalArgumentException] {
      g.table("t").put(Seq(Put(b("r2")).add("f", b("q"), b("v2"))), 4L)
    }
    g.enableTable("t", 5L)
    g.table("t").put(Seq(Put(b("r2")).add("f", b("q"), b("v2"))), 6L)
    assert(rows(g, "t") == Set(("r1", "v1"), ("r2", "v2")))
    g.deleteTable("t")
    assert(!g.tableExists("t") && g.listTables().isEmpty)
  }

  test("illegal family names are rejected at DDL time") {
    val g = freshGraft()
    // '#' and '*' are percent-escaped by Spark's partition-path writer —
    // the allowlist must reject everything outside [A-Za-z0-9_.-]
    for (bad <- Seq("a/b", "a=b", "a:b", "a%b", ".hidden", "", "a b",
        "a#b", "a*b", "a?b", "a'b")) {
      intercept[IllegalArgumentException] {
        g.createTable(TableDescriptor("bad",
          Seq(FamilyDescriptor(bad)), splitKeys = 2), 1L)
      }
    }
    assert(!g.tableExists("bad"))
    // the full allowlist alphabet is accepted
    g.createTable(TableDescriptor("ok",
      Seq(FamilyDescriptor("Fam_1.x-y")), splitKeys = 2), 1L)
    assert(g.tableExists("ok"))
    // alterTable is guarded too
    g.createTable(desc, 1L)
    intercept[IllegalArgumentException] {
      g.catalog.alterTable("t",
        desc.copy(families = Seq(FamilyDescriptor("f/x"))), 2L)
    }
  }

  test("manifestAtOrBefore finds the newest manifest at or before ts") {
    val g = freshGraft()
    g.createTable(desc, 10L)
    g.table("t").put(Seq(Put(b("r1")).add("f", b("q"), b("v1"))), 20L)
    g.table("t").put(Seq(Put(b("r2")).add("f", b("q"), b("v2"))), 30L)
    assert(g.catalog.manifestAtOrBefore("t", 5L).isEmpty)
    assert(g.catalog.manifestAtOrBefore("t", 10L).map(_.version).contains(1L))
    assert(g.catalog.manifestAtOrBefore("t", 25L).map(_.version).contains(2L))
    assert(g.catalog.manifestAtOrBefore("t", 99L).map(_.version).contains(3L))
  }

  test("truncate empties the table, keeps schema, refuses read-only") {
    val g = freshGraft()
    g.createTable(desc, 1L)
    g.table("t").put(Seq(Put(b("r1")).add("f", b("q"), b("v1"))), 2L)
    g.snapshot("pre", "t", 3L)
    g.table("t").truncate(4L)
    assert(rows(g, "t").isEmpty)
    assert(g.table("t").descriptor.families.map(_.name) == Seq("f"))
    // the snapshot still reads the pre-truncate state
    val snap = graft.read.Resolve(g.readSnapshot("pre")).collect()
      .map(r => new String(r.getAs[Array[Byte]]("row"), "UTF-8")).toSet
    assert(snap == Set("r1"))
    g.disableTable("t", 5L)
    intercept[IllegalArgumentException] { g.table("t").truncate(6L) }
  }

  test("snapshot is point-in-time: later writes/deletes don't leak in") {
    val g = freshGraft()
    g.createTable(desc, 1L)
    g.table("t").put(Seq(Put(b("r1")).add("f", b("q"), b("v1"))), 2L)
    g.snapshot("s1", "t", 3L)
    g.table("t").put(Seq(Put(b("r2")).add("f", b("q"), b("v2"))), 4L)
    g.table("t").delete(Seq(Delete(b("r1")).deleteFamily("f")), 5L)
    assert(rows(g, "t") == Set(("r2", "v2")))
    // snapshot still sees the frozen state
    val snapRows = graft.read.Resolve(g.readSnapshot("s1")).collect().map { r =>
      new String(r.getAs[Array[Byte]]("row"), "UTF-8")
    }.toSet
    assert(snapRows == Set("r1"))
  }

  test("diff: change kinds, tombstone visibility, empty on identical snapshots") {
    val g = freshGraft()
    g.createTable(desc, 1L)
    g.table("t").put(Seq(
      Put(b("r1")).add("f", b("q"), b("v1")),
      Put(b("r2")).add("f", b("q"), b("v2")),
      Put(b("r3")).add("f", b("q"), b("v3"))), 2L)
    g.snapshot("a", "t", 3L)
    g.snapshot("a2", "t", 3L)
    // identical snapshots diff to nothing
    assert(g.diffSnapshots("a", "a2").count() == 0L)
    // change r2, tombstone r3, add r4
    g.table("t").put(Seq(Put(b("r2")).add("f", b("q"), b("V2"))), 4L)
    g.table("t").delete(Seq(Delete(b("r3")).deleteFamily("f")), 5L)
    g.table("t").put(Seq(Put(b("r4")).add("f", b("q"), b("v4"))), 6L)
    g.snapshot("b", "t", 7L)
    val d = g.diffSnapshots("a", "b").collect().map { r =>
      (new String(r.getAs[Array[Byte]]("row"), "UTF-8"), r.getAs[String]("change"),
        Option(r.getAs[Array[Byte]]("value_b")).map(new String(_, "UTF-8")).orNull)
    }.toSet
    assert(d == Set(("r2", "changed", "V2"), ("r3", "removed", null),
      ("r4", "added", "v4")))
    // reversed direction flips kinds
    val rev = g.diffSnapshots("b", "a").collect()
      .map(r => (new String(r.getAs[Array[Byte]]("row"), "UTF-8"),
        r.getAs[String]("change"))).toSet
    assert(rev == Set(("r2", "changed"), ("r3", "added"), ("r4", "removed")))
  }

  test("restore repoints the table; clone shares files zero-copy") {
    val g = freshGraft()
    g.createTable(desc, 1L)
    g.table("t").put(Seq(Put(b("r1")).add("f", b("q"), b("v1"))), 2L)
    g.snapshot("s1", "t", 3L)
    g.table("t").put(Seq(Put(b("r2")).add("f", b("q"), b("v2"))), 4L)
    g.restoreSnapshot("s1", 5L)
    assert(rows(g, "t") == Set(("r1", "v1")))
    g.cloneSnapshot("s1", "t2", 6L)
    assert(rows(g, "t2") == Set(("r1", "v1")))
    // clone is independent: writing to t2 doesn't affect t
    g.table("t2").put(Seq(Put(b("r3")).add("f", b("q"), b("v3"))), 7L)
    assert(rows(g, "t") == Set(("r1", "v1")))
    assert(rows(g, "t2") == Set(("r1", "v1"), ("r3", "v3")))
  }

  test("compaction after snapshot preserves both views; vacuum honors refcounts") {
    val g = freshGraft()
    g.createTable(desc, 1L)
    g.table("t").put(Seq(Put(b("r1")).add("f", b("q"), b("v1"))), 2L)
    g.snapshot("s1", "t", 3L)
    g.table("t").put(Seq(Put(b("r1")).add("f", b("q"), b("v1b"))), 4L)
    g.table("t").majorCompact(5L)
    assert(rows(g, "t") == Set(("r1", "v1b")))
    def snapVals(): Set[String] =
      graft.read.Resolve(g.readSnapshot("s1")).collect().map { r =>
        new String(r.getAs[Array[Byte]]("value"), "UTF-8")
      }.toSet
    assert(snapVals() == Set("v1")) // TestHRegionSnapshot:269 semantics
    // vacuum with live snapshot: snapshot-referenced dirs must survive
    g.catalog.expireVersions("t", 1)
    g.vacuum("t")
    assert(snapVals() == Set("v1")) // re-read AFTER vacuum: files intact
    // after snapshot deletion, its dirs become collectible
    g.deleteSnapshot("s1")
    val deleted2 = g.vacuum("t")
    assert(deleted2.nonEmpty)
    assert(rows(g, "t") == Set(("r1", "v1b"))) // live table intact
  }

  test("export + import: files copied size-balanced, snapshot readable at target") {
    val g = freshGraft()
    g.createTable(desc, 1L)
    g.table("t").put(Seq(
      Put(b("r1")).add("f", b("q"), b("v1")),
      Put(b("r2")).add("f", b("q"), b("v2"))), 2L)
    g.snapshot("s1", "t", 3L)
    val target = Files.createTempDirectory("graft-export").toString
    g.exportSnapshot("s1", target)
    // import into a fresh catalog rooted elsewhere
    val g2 = freshGraft()
    g2.importSnapshot("s1-imported", target)
    val got = graft.read.Resolve(g2.readSnapshot("s1-imported")).collect().map { r =>
      new String(r.getAs[Array[Byte]]("value"), "UTF-8")
    }.toSet
    assert(got == Set("v1", "v2"))
  }

  test("incremental export ships only the delta and chains off the base") {
    val g = freshGraft()
    g.createTable(desc, 1L)
    g.table("t").put(Seq(Put(b("r1")).add("f", b("q"), b("v1"))), 2L)
    g.snapshot("s1", "t", 3L)
    val e1 = Files.createTempDirectory("graft-exp1").toString
    g.exportSnapshot("s1", e1)
    g.table("t").put(Seq(Put(b("r2")).add("f", b("q"), b("v2"))), 4L)
    g.snapshot("s2", "t", 5L)
    val e2 = Files.createTempDirectory("graft-exp2").toString
    g.exportSnapshot("s2", e2, baseExportDir = Some(e1))
    def leaves(d: String) = new java.io.File(d).listFiles
      .filter(_.isDirectory).map(_.getName).toSet
    // s2 references both data versions but the incremental target holds
    // ONLY dirs the base export lacks
    assert(leaves(e2).nonEmpty && (leaves(e2) & leaves(e1)).isEmpty)
    // a third export chained off the INCREMENTAL one resolves through to
    // the full chain (shared map carries the base's own back-references)
    g.snapshot("s3", "t", 6L)
    val e3 = Files.createTempDirectory("graft-exp3").toString
    g.exportSnapshot("s3", e3, baseExportDir = Some(e2))
    assert((leaves(e3) & (leaves(e1) ++ leaves(e2))).isEmpty)
    // imported s2 reads the full state, standing on e2 + e1 only
    val g2 = freshGraft()
    g2.importSnapshot("s2i", e2)
    val got = graft.read.Resolve(g2.readSnapshot("s2i")).collect().map { r =>
      new String(r.getAs[Array[Byte]]("value"), "UTF-8")
    }.toSet
    assert(got == Set("v1", "v2"))
    // wrong-table base is rejected
    val gOther = freshGraft()
    gOther.createTable(TableDescriptor("u", Seq(FamilyDescriptor("f"))), 1L)
    gOther.table("u").put(Seq(Put(b("x")).add("f", b("q"), b("v"))), 2L)
    gOther.snapshot("su", "u", 3L)
    val eU = Files.createTempDirectory("graft-expU").toString
    intercept[IllegalArgumentException] {
      gOther.exportSnapshot("su", eU, baseExportDir = Some(e1))
    }
  }

  test("incremental export never leaf-name-matches bulk-loaded dirs") {
    // Two DIFFERENT bulk dirs sharing the leaf name "prepared": the base
    // export holds the first; the incremental export of a snapshot
    // referencing the second must COPY it (version-scoped data-* names are
    // content-addressed, bare bulk leaf names are not — matching by leaf
    // would silently point the new manifest at the old content).
    val g = freshGraft()
    g.createTable(desc, 1L)
    val extA = Files.createTempDirectory("graft-bulkA").toString + "/prepared"
    cells(Seq(graft.core.Cell.put(b("rA"), "f", b("q"), 2L, b("vA"))))
      .toDF().write.parquet(extA)
    g.catalog.bulkLoad("t", extA, 2L)
    g.snapshot("s1", "t", 3L)
    val e1 = Files.createTempDirectory("graft-expb1").toString
    g.exportSnapshot("s1", e1)
    val extB = Files.createTempDirectory("graft-bulkB").toString + "/prepared"
    cells(Seq(graft.core.Cell.put(b("rB"), "f", b("q"), 4L, b("vB"))))
      .toDF().write.parquet(extB)
    g.catalog.bulkLoad("t", extB, 4L)
    g.snapshot("s2", "t", 5L)
    val e2 = Files.createTempDirectory("graft-expb2").toString
    g.exportSnapshot("s2", e2, baseExportDir = Some(e1))
    val g2 = freshGraft()
    g2.importSnapshot("s2i", e2)
    val got = graft.read.Resolve(g2.readSnapshot("s2i")).collect().map { r =>
      (new String(r.getAs[Array[Byte]]("row"), "UTF-8"),
        new String(r.getAs[Array[Byte]]("value"), "UTF-8"))
    }.toSet
    assert(got == Set(("rA", "vA"), ("rB", "vB")))
  }

  test("bulkLoad adopts a pre-written cell dir by reference (no rewrite)") {
    val g = freshGraft()
    g.createTable(desc, 1L)
    g.table("t").put(Seq(Put(b("r1")).add("f", b("q"), b("v1"))), 2L)
    // prepared "HFiles": a cell-schema parquet dir written elsewhere
    val ext = Files.createTempDirectory("graft-bulk").toString + "/prepared"
    cells(Seq(graft.core.Cell.put(b("r2"), "f", b("q"), 3L, b("v2"))))
      .toDF().write.parquet(ext)
    g.catalog.bulkLoad("t", ext, 4L)
    assert(rows(g, "t") == Set(("r1", "v1"), ("r2", "v2")))
    // vacuum never touches externally-referenced dirs
    g.vacuum("t")
    assert(rows(g, "t") == Set(("r1", "v1"), ("r2", "v2")))
  }

  test("increment and checkAndMutate through the table facade") {
    val g = freshGraft()
    g.createTable(desc, 1L)
    import spark.implicits._
    g.table("t").put(Seq(Put(b("u1")).add("f", b("n"), Bytes.toBytes(10L))), 2L)
    val incs = Seq((b("u1"), "f", b("n"), 5L), (b("u2"), "f", b("n"), 1L))
      .toDF("row", "family", "qualifier", "delta")
    g.table("t").increment(incs, 3L)
    val vals = g.table("t").scan(Scan()).collect().map { r =>
      (new String(r.getAs[Array[Byte]]("row"), "UTF-8"),
        Bytes.toLong(r.getAs[Array[Byte]]("value")))
    }.toSet
    assert(vals == Set(("u1", 15L), ("u2", 1L)))
  }
}
