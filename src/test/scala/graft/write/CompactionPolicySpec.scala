package graft.write

import graft.SparkSpec
import graft.catalog.{FamilyDescriptor, TableDescriptor}
import graft.core.Bytes

/** Minor-compaction batch selection — the reference's size-ratio rule
  * (`Store.java:739-745`) as a pure function, plus the partial-commit
  * path: fold the small-delta tail, never re-touch the big old batches. */
class CompactionPolicySpec extends SparkSpec {

  private def b(s: String) = Bytes.toBytes(s)
  private val q = b("v")

  test("selectMinor: the size-ratio rule on the oldest->newest batch list") {
    // uniform sizes: everything qualifies
    assert(Compact.selectMinor(Seq(10, 10, 10, 10)) == Some(0 until 4))
    // a big old batch is skipped; the small tail compacts
    assert(Compact.selectMinor(Seq(1000, 10, 10, 10)) == Some(1 until 4))
    // two large leading batches skipped
    assert(Compact.selectMinor(Seq(1000, 500, 10, 10, 10)) == Some(2 until 5))
    // fewer than minBatches qualifying -> no-op
    assert(Compact.selectMinor(Seq(1000, 10, 10)).isEmpty)
    assert(Compact.selectMinor(Seq(1000, 10, 10), minBatches = 2)
      == Some(1 until 3))
    // maxBatches keeps the OLDEST of the selection (compaction.max cap)
    assert(Compact.selectMinor(Seq.fill(20)(10L), maxBatches = 10)
      == Some(0 until 10))
    // monotonically growing newer batches: ratio decides per position
    // 80 > 1.2*(40+10) = 60 -> skip; 40 <= 1.2*10? no -> skip; 10 <= 0? no
    assert(Compact.selectMinor(Seq(80, 40, 10), minBatches = 1).isEmpty)
    // empty input
    assert(Compact.selectMinor(Nil, minBatches = 1).isEmpty)
  }

  test("minorCompact folds only the small tail and keeps tombstones") {
    import graft.write.{Delete, Put}
    val g = graft.Graft(spark,
      java.nio.file.Files.createTempDirectory("graft-minor").toString)
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f", maxVersions = 1)), splitKeys = 2), 1L)
    val t = g.table("t")
    // one BIG initial batch...
    t.put((0 until 2000).map(i =>
      Put(Bytes.toBytes(i.toLong)).add("f", q, 2L, b(s"v$i"))), 2L)
    val bigLeaves = g.catalog.currentManifest("t").dataDirs.toSet
    // ...then several small deltas, one carrying a tombstone
    t.put(Seq(Put(Bytes.toBytes(9001L)).add("f", q, 3L, b("a"))), 3L)
    t.put(Seq(Put(Bytes.toBytes(9002L)).add("f", q, 4L, b("b"))), 4L)
    t.delete(Seq(Delete(Bytes.toBytes(7L)).deleteFamily("f", 5L)), 5L)
    t.put(Seq(Put(Bytes.toBytes(9003L)).add("f", q, 6L, b("c"))), 6L)
    def view(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String, Long, String)] =
      df.collect().map { r =>
        (Bytes.toLong(r.getAs[Array[Byte]]("row")), r.getAs[String]("family"),
          new String(r.getAs[Array[Byte]]("qualifier"), "UTF-8"),
          r.getAs[Long]("ts"),
          new String(r.getAs[Array[Byte]]("value"), "UTF-8"))
      }.sorted.toSeq
    val before = view(t.scan(graft.read.Scan()))
    val folded = t.minorCompact(7L)
    assert(folded.nonEmpty, "small tail was not compacted")
    val after = g.catalog.currentManifest("t")
    // the BIG batch's leaves survive untouched; the small deltas are gone
    assert(bigLeaves.subsetOf(after.dataDirs.toSet),
      "minor compaction re-wrote the big batch")
    assert(folded.toSet.intersect(after.dataDirs.toSet).isEmpty)
    assert(after.dataDirs.exists(_.contains("compact-")),
      "no compacted dir referenced")
    // read equivalence, including the tombstone still masking row 7
    val post = view(t.scan(graft.read.Scan()))
    assert(post == before, "minor compaction changed the view")
    assert(t.get(graft.read.Get(Bytes.toBytes(7L))).isEmpty)
    // the tombstone is physically KEPT (minor semantics): a major
    // compaction afterwards is what drops it
    val rawDeletes = g.catalog.read("t")
      .filter(org.apache.spark.sql.functions.col("kind") =!=
        graft.core.CellKind.Put).count()
    assert(rawDeletes == 1L, s"tombstone not preserved: $rawDeletes")
  }

  test("folded dirs vacuum away once history is pruned; survivors stay") {
    import graft.write.Put
    val g = graft.Graft(spark,
      java.nio.file.Files.createTempDirectory("graft-minor3").toString)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2), 1L)
    val t = g.table("t")
    t.put((0 until 2000).map(i =>
      Put(Bytes.toBytes(i.toLong)).add("f", q, 2L, b(s"v$i"))), 2L)
    for (k <- 0 until 3)
      t.put(Seq(Put(Bytes.toBytes(9000L + k)).add("f", q, 3L + k, b("x"))),
        3L + k)
    val folded = t.minorCompact(9L)
    assert(folded.nonEmpty)
    // folded dirs are still referenced by OLD manifest versions — a
    // vacuum with history retained must NOT delete them...
    assert(g.vacuum("t").isEmpty)
    // ...pruning history releases them; the surviving big batch and the
    // compacted dir stay, and the view is unchanged
    g.catalog.expireVersions("t", keep = 1)
    val dead = g.vacuum("t")
    assert(dead.nonEmpty, "pruned fold did not free space")
    val live = g.catalog.currentManifest("t").dataDirs
    assert(live.forall(d => new java.io.File(
      new java.net.URI("file://" + d).getPath).exists() ||
      new java.io.File(d.stripPrefix("file:")).exists()))
    assert(t.scan(graft.read.Scan()).count() == 2003L)
  }

  test("minorCompact is a no-op below the compaction threshold") {
    import graft.write.Put
    val g = graft.Graft(spark,
      java.nio.file.Files.createTempDirectory("graft-minor2").toString)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2), 1L)
    val t = g.table("t")
    t.put((0 until 2000).map(i =>
      Put(Bytes.toBytes(i.toLong)).add("f", q, 2L, b(s"v$i"))), 2L)
    t.put(Seq(Put(Bytes.toBytes(9001L)).add("f", q, 3L, b("a"))), 3L)
    t.put(Seq(Put(Bytes.toBytes(9002L)).add("f", q, 4L, b("b"))), 4L)
    val v0 = g.catalog.currentManifest("t").version
    assert(t.minorCompact(5L).isEmpty)
    assert(g.catalog.currentManifest("t").version == v0,
      "no-op minor compaction committed a version")
  }
}
