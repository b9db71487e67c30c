package graft.read

import graft.SparkSpec
import graft.catalog.{FamilyDescriptor, TableDescriptor}
import graft.core.Bytes
import graft.write.{Delete, Put}

/** Covered (INCLUDE) index columns — the Phoenix covered-column design
  * on immutable-rows tables: lookups whose projection is within
  * indexed + covered + row key are answered from the index table ALONE,
  * with deletes maintained synchronously as index tombstones. */
class CoveredIndexSpec extends SparkSpec {

  private def b(s: String) = Bytes.toBytes(s)
  private val q = b("city")
  private val popQ = b("pop")
  private val zipQ = b("zip")

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("row").distinct().collect()
      .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")).toSet

  private def freshGraft(tag: String): graft.Graft = graft.Graft(spark,
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString)

  private def coveredTable(g: graft.Graft): graft.GraftTable = {
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f", maxVersions = 1),
        FamilyDescriptor("m", maxVersions = 1)),
      splitKeys = 2, immutableRows = true), 1L)
    val t = g.table("t")
    t.put(Seq(
      Put(b("r1")).add("f", q, 2L, b("paris")).add("f", popQ, 2L, b("2m"))
        .add("m", zipQ, 2L, b("75")),
      Put(b("r2")).add("f", q, 2L, b("tokyo")).add("f", popQ, 2L, b("14m"))
        .add("m", zipQ, 2L, b("100")),
      Put(b("r3")).add("f", q, 2L, b("paris")).add("f", popQ, 2L, b("2m"))
        .add("m", zipQ, 2L, b("75"))), 2L)
    g.createIndex("t", "f", q, 3L,
      covered = Seq("f" -> popQ, "m" -> zipQ))
    t
  }

  test("covered lookup answers from the index alone — zero main-table touch") {
    val g = freshGraft("cov")
    val t = coveredTable(g)
    val hit = t.indexLookupCovered("f", q, Seq(b("paris")))
    assert(rowsOf(hit) == Set("r1", "r3"))
    // the full covering set comes back: indexed column + both covered
    // columns, with the right values
    val cellsBack = collectCells(hit)
    assert(cellsBack.map(_._3) == Set("city", "pop", "zip"))
    assert(cellsBack.filter(_._1 == "r1").map(c => (c._2, c._3, c._5)) ==
      Set(("f", "city", "paris"), ("f", "pop", "2m"), ("m", "zip", "75")))
    // THE covering property: the plan reads only the index table's files
    val mainDir = g.root + "/t/"
    val plan = hit.queryExecution.executedPlan.toString
    assert(!plan.contains(mainDir),
      s"covered lookup touched the main table:\n$plan")
    val ixDir = g.root + "/" +
      t.descriptor.indexOn("f", q).get.indexTable + "/"
    assert(plan.contains(ixDir), s"covered lookup read no index files:\n$plan")
  }

  test("IN-list covered lookup, probe ranges pushed to the index scan") {
    val g = freshGraft("covin")
    val t = coveredTable(g)
    val hit = t.indexLookupCovered("f", q, Seq(b("paris"), b("tokyo")))
    assert(rowsOf(hit) == Set("r1", "r2", "r3"))
    val plan = hit.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(row"),
      s"probe value ranges not pushed into the index scan:\n$plan")
  }

  test("deletes reach covered reads synchronously — no rebuild needed") {
    val g = freshGraft("covdel")
    val t = coveredTable(g)
    // whole-row delete: DeleteFamily on the indexed family kills the
    // index row via the synchronously-written index DeleteFamily
    t.delete(Seq(Delete(b("r1")).deleteFamily("f", 3L)
      .deleteFamily("m", 3L)), 3L)
    assert(rowsOf(t.indexLookupCovered("f", q, Seq(b("paris")))) == Set("r3"))
    // covered-column-only delete in the other family: r3 stays matching
    // but its zip covered cell disappears
    t.delete(Seq(Delete(b("r3")).deleteColumns("m", zipQ, 4L)), 4L)
    val after = t.indexLookupCovered("f", q, Seq(b("paris")))
    assert(rowsOf(after) == Set("r3"))
    assert(collectCells(after).map(_._3) == Set("city", "pop"))
    // the verified (non-covered) path agrees with the covered path
    assert(rowsOf(t.indexLookup("f", q, Seq(b("paris")))) == Set("r3"))
  }

  test("rebuild (index GC) preserves covered answers and drops dead entries") {
    val g = freshGraft("covgc")
    val t = coveredTable(g)
    t.delete(Seq(Delete(b("r1")).deleteFamily("f", 3L)
      .deleteFamily("m", 3L)), 3L)
    val ixTable = t.descriptor.indexOn("f", q).get.indexTable
    val before = g.catalog.read(ixTable).count()
    t.majorCompact(4L)
    val after = g.catalog.read(ixTable).count()
    assert(after < before, s"covered index did not shrink: $before -> $after")
    // 2 live rows x (pointer + 2 covered cells)
    assert(after == 6L)
    val hit = t.indexLookupCovered("f", q, Seq(b("paris")))
    assert(rowsOf(hit) == Set("r3"))
    assert(collectCells(hit).map(_._3) == Set("city", "pop", "zip"))
  }

  test("covered index on a salted table returns logical keys") {
    val g = freshGraft("covsalt")
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, saltBuckets = 8, immutableRows = true), 1L)
    val t = g.table("t")
    t.put((0 until 200).map(i =>
      Put(Bytes.toBytes(i.toLong))
        .add("f", q, 2L, b(if (i % 50 == 7) "paris" else "other"))
        .add("f", popQ, 2L, Bytes.toBytes(i.toLong * 10))), 2L)
    g.createIndex("t", "f", q, 3L, covered = Seq("f" -> popQ))
    val hit = t.indexLookupCovered("f", q, Seq(b("paris")))
    val keys = hit.select("row").distinct().collect()
      .map(r => Bytes.toLong(r.getAs[Array[Byte]](0))).sorted.toSeq
    assert(keys == Seq(7L, 57L, 107L, 157L))
    // covered values decode against the logical key
    val pops = hit.filter(org.apache.spark.sql.functions.col("qualifier")
        === org.apache.spark.sql.functions.lit(popQ))
      .collect().map(r => Bytes.toLong(r.getAs[Array[Byte]]("row")) ->
        Bytes.toLong(r.getAs[Array[Byte]]("value"))).toMap
    assert(pops == Map(7L -> 70L, 57L -> 570L, 107L -> 1070L, 157L -> 1570L))
  }

  test("projected lookup picks the covered or verified route like Phoenix") {
    val g = freshGraft("covroute")
    val t = coveredTable(g)
    val mainDir = g.root + "/t/"
    // projection within the covering set -> index-only plan
    val covered = t.indexLookup("f", q, Seq(b("paris")),
      project = Seq("f" -> q, "m" -> zipQ))
    assert(!covered.queryExecution.executedPlan.toString.contains(mainDir),
      "covered projection still touched the main table")
    assert(rowsOf(covered) == Set("r1", "r3"))
    assert(collectCells(covered).map(_._3) == Set("city", "zip"))
    // projection naming a NON-covered column -> verified route on main
    val extraQ = Bytes.toBytes("extra")
    val fallback = t.indexLookup("f", q, Seq(b("paris")),
      project = Seq("f" -> q, "f" -> extraQ))
    assert(fallback.queryExecution.executedPlan.toString.contains(mainDir),
      "uncovered projection did not fall back to the verified route")
    assert(rowsOf(fallback) == Set("r1", "r3"))
    // both routes agree on the shared projected column
    def cityVals(df: org.apache.spark.sql.DataFrame) =
      collectCells(df).filter(_._3 == "city").map(c => (c._1, c._5))
    assert(cityVals(covered) == cityVals(fallback))
  }

  test("put + delete folded into ONE batch: covered read sees the delete") {
    // a replayed change feed can fold several source appends into one
    // micro-batch — the tombstone's indexed value then lives in the SAME
    // delta, not the pre-state
    val g = freshGraft("covfold")
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f", maxVersions = 1)),
      splitKeys = 2, immutableRows = true), 1L)
    g.createIndex("t", "f", q, 2L, covered = Seq("f" -> popQ))
    val t = g.table("t")
    import graft.core.Cell
    t.mutate(cells(Seq(
      Cell.put(b("r1"), "f", q, 3L, b("lyon")),
      Cell.put(b("r1"), "f", popQ, 3L, b("500k")),
      Cell.deleteFamily(b("r1"), "f", 4L),
      Cell.put(b("r2"), "f", q, 3L, b("lyon")),
      Cell.put(b("r2"), "f", popQ, 3L, b("520k")))).toDF(), 4L)
    val hit = t.indexLookupCovered("f", q, Seq(b("lyon")))
    assert(rowsOf(hit) == Set("r2"),
      "same-batch delete leaked through the covered read")
    assert(collectCells(hit).map(c => (c._3, c._5)) ==
      Set(("city", "lyon"), ("pop", "520k")))
  }

  test("covered creation requires the immutableRows declaration") {
    val g = freshGraft("covreq")
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2), 1L)
    intercept[IllegalArgumentException] {
      g.createIndex("t", "f", q, 2L, covered = Seq("f" -> popQ))
    }
    // pointer-only indexes never need it
    g.createIndex("t", "f", q, 3L)
  }

  test("crash residue: covered is data-first (no phantoms), pointer is index-first") {
    // Fault injection through the read-only latch: disabling the INDEX
    // table makes its maintenance append throw, splitting the dual-write
    // exactly at the crash window the ordering is designed around.
    val g = freshGraft("covcrash")
    val t = coveredTable(g)
    val ixTable = t.descriptor.indexOn("f", q).get.indexTable
    g.disableTable(ixTable, 10L)
    intercept[IllegalArgumentException] {
      t.put(Seq(Put(b("r9")).add("f", q, 11L, b("oslo"))
        .add("f", popQ, 11L, b("1m"))), 11L)
    }
    // COVERED = data-first: the main commit happened (the row is real)...
    assert(rowsOf(t.scan(graft.read.Scan(
      Some(b("r9")), Some(Bytes.successor(b("r9")))))) == Set("r9"))
    // ...and the covered read MISSES it (availability gap), never a
    // phantom of a row that failed to commit
    assert(rowsOf(t.indexLookupCovered("f", q, Seq(b("oslo")))).isEmpty)
    // heal: re-enable + rebuild brings the index current
    g.enableTable(ixTable, 12L)
    t.rebuildIndexes(13L)
    assert(rowsOf(t.indexLookupCovered("f", q, Seq(b("oslo")))) == Set("r9"))

    // POINTER-ONLY = index-first: the same failure aborts BEFORE the
    // main commit — no partial main state, a retry re-runs cleanly
    val g2 = freshGraft("ptrcrash")
    g2.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2), 1L)
    g2.createIndex("t", "f", q, 2L)
    val ix2 = g2.table("t").descriptor.indexOn("f", q).get.indexTable
    g2.disableTable(ix2, 3L)
    intercept[IllegalArgumentException] {
      g2.table("t").put(Seq(Put(b("r1")).add("f", q, 4L, b("rome"))), 4L)
    }
    assert(rowsOf(g2.table("t").scan(graft.read.Scan())).isEmpty,
      "pointer-index failure leaked a main-table commit")
    g2.enableTable(ix2, 5L)
    g2.table("t").put(Seq(Put(b("r1")).add("f", q, 6L, b("rome"))), 6L)
    assert(rowsOf(g2.table("t").indexLookup("f", q, Seq(b("rome")))) == Set("r1"))
  }

  test("0x00-embedding indexed values never alias into phantom covered matches") {
    // value [5,0,7] begins with [5] ++ 0x00, so its index rows land
    // INSIDE [5]'s probe range; the covered path has no main-table
    // verify, so the reshape itself (pointer-anchored split) must reject
    // the alias instead of emitting a phantom row with a fabricated value
    val g = freshGraft("covzero")
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f", maxVersions = 1)),
      splitKeys = 2, immutableRows = true), 1L)
    val t = g.table("t")
    val v = Array[Byte](5)
    val vz = Array[Byte](5, 0, 7)
    t.put(Seq(
      Put(b("r1")).add("f", q, 2L, v).add("f", popQ, 2L, b("one")),
      Put(b("r2")).add("f", q, 2L, vz).add("f", popQ, 2L, b("two"))), 2L)
    g.createIndex("t", "f", q, 3L, covered = Seq("f" -> popQ))
    val hit = t.indexLookupCovered("f", q, Seq(v))
    assert(rowsOf(hit) == Set("r1"),
      "0x00-prefix value aliased into the covered probe range")
    assert(collectCells(hit).map(c => (c._1, c._3, c._5)).contains(
      ("r1", "pop", "one")))
    assert(rowsOf(t.indexLookupCovered("f", q, Seq(vz))) == Set("r2"))
    // covered RANGE with a 0x00-embedding hi bound: [v, vz) = {v} only
    val ixT = t.descriptor.indexOn("f", q).get.indexTable
    assert(rowsOf(SecondaryIndex.lookupCoveredRange(g.catalog.read(ixT),
      "f", q, Some(v), Some(vz), Seq("f" -> popQ))) == Set("r1"))
  }

  test("covered IN-list plan width is independent of the value count") {
    val g = freshGraft("covwide")
    val t = coveredTable(g)
    val two = t.indexLookupCovered("f", q, Seq(b("paris"), b("tokyo")))
    val many = t.indexLookupCovered("f", q,
      (1 to 200).map(i => b(s"city$i")) ++ Seq(b("paris"), b("tokyo")))
    assert(rowsOf(many) == rowsOf(two))
    assert(collectCells(many) == collectCells(two))
    def leaves(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collectLeaves().size
    assert(leaves(many) == leaves(two),
      s"plan branches scale with the IN list: ${leaves(two)} -> ${leaves(many)}")
  }

  test("covered range lookup answers comparison predicates index-only") {
    val g = freshGraft("covrange")
    val t = coveredTable(g)
    // paris <= city < tokyo — r1/r3; reshaped from the index alone
    val hit = t.indexLookupRange("f", q, Some(b("paris")), Some(b("tokyo")),
      project = Seq("f" -> q, "f" -> popQ))
    assert(rowsOf(hit) == Set("r1", "r3"))
    assert(collectCells(hit).filter(_._1 == "r1").map(c => (c._3, c._5))
      == Set(("city", "paris"), ("pop", "2m")))
    val mainDir = g.root + "/t/"
    assert(!hit.queryExecution.executedPlan.toString.contains(mainDir),
      "covered range lookup touched the main table")
    // the verified (unprojected) route agrees
    val verified = t.indexLookupRange("f", q, Some(b("paris")), Some(b("tokyo")))
    assert(rowsOf(verified) == Set("r1", "r3"))
    assert(verified.queryExecution.executedPlan.toString.contains(mainDir))
  }

  test("covered registration survives the manifest JSON roundtrip") {
    val g = freshGraft("covjson")
    coveredTable(g)
    // a FRESH engine instance re-reads the descriptor from disk
    val g2 = graft.Graft(spark, g.root)
    val ix = g2.table("t").descriptor.indexOn("f", q).get
    assert(g2.table("t").descriptor.immutableRows)
    assert(ix.covered.map { case (f, cq) => (f, new String(cq, "UTF-8")) } ==
      Seq("f" -> "pop", "m" -> "zip"))
    assert(rowsOf(g2.table("t").indexLookupCovered("f", q, Seq(b("tokyo"))))
      == Set("r2"))
  }
}
