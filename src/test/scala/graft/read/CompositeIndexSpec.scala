package graft.read

import graft.SparkSpec
import graft.catalog.{FamilyDescriptor, TableDescriptor}
import graft.core.Bytes
import graft.write.{Delete, Put}

/** Composite (multi-column) secondary index: conjunctive equality over
  * the member columns as ONE blob range probe, verified reads. */
class CompositeIndexSpec extends SparkSpec {

  private def b(s: String) = Bytes.toBytes(s)
  private val cityQ = b("city")
  private val tierQ = b("tier")

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("row").distinct().collect()
      .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")).toSet

  private def freshGraft(tag: String): graft.Graft = graft.Graft(spark,
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString)

  private val cols = Seq("f" -> cityQ, "f" -> tierQ)

  private def mk(g: graft.Graft): graft.GraftTable = {
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f", maxVersions = 1)),
      splitKeys = 2, immutableRows = true), 1L)
    val t = g.table("t")
    t.put(Seq(
      Put(b("r1")).add("f", cityQ, 2L, b("paris")).add("f", tierQ, 2L, b("gold"))
        .add("f", b("pop"), 2L, b("2m")),
      Put(b("r2")).add("f", cityQ, 2L, b("paris")).add("f", tierQ, 2L, b("iron")),
      Put(b("r3")).add("f", cityQ, 2L, b("tokyo")).add("f", tierQ, 2L, b("gold")),
      Put(b("r4")).add("f", cityQ, 2L, b("paris")).add("f", tierQ, 2L, b("gold"))),
      2L)
    g.createCompositeIndex("t", cols, 3L)
    t
  }

  test("conjunctive equality probes one blob range; whole rows verified") {
    val g = freshGraft("cidx")
    val t = mk(g)
    val hit = t.indexLookupComposite(cols, Seq(b("paris"), b("gold")))
    assert(rowsOf(hit) == Set("r1", "r4"))
    // whole matching rows come back, including non-member columns
    assert(collectCells(hit).filter(_._1 == "r1").map(_._3)
      == Set("city", "tier", "pop"))
    // values in ANY column order reorder into key order
    val swapped = t.indexLookupComposite(cols.reverse, Seq(b("gold"), b("paris")))
    assert(rowsOf(swapped) == Set("r1", "r4"))
    // no single-column route accidentally matches the composite
    assert(t.descriptor.indexOn("f", cityQ).isEmpty)
    assert(t.descriptor.compositeIndexOn(cols).isDefined)
  }

  test("append-time maintenance keeps the tuple index current") {
    val g = freshGraft("cidxm")
    val t = mk(g)
    t.put(Seq(Put(b("r9")).add("f", cityQ, 4L, b("paris"))
      .add("f", tierQ, 4L, b("gold"))), 4L)
    assert(rowsOf(t.indexLookupComposite(cols, Seq(b("paris"), b("gold"))))
      == Set("r1", "r4", "r9"))
    // the index table physically holds the new entry (not a fallback scan)
    val ixT = t.descriptor.compositeIndexOn(cols).get.indexTable
    assert(g.catalog.read(ixT).count() == 5)
  }

  test("deletes are verified away with no index maintenance; rebuild GCs") {
    val g = freshGraft("cidxd")
    val t = mk(g)
    t.delete(Seq(Delete(b("r4")).deleteFamily("f", 5L)), 5L)
    assert(rowsOf(t.indexLookupComposite(cols, Seq(b("paris"), b("gold"))))
      == Set("r1"))
    val ixT = t.descriptor.compositeIndexOn(cols).get.indexTable
    val before = g.catalog.read(ixT).count()
    t.majorCompact(6L)
    assert(g.catalog.read(ixT).count() < before)
    assert(rowsOf(t.indexLookupComposite(cols, Seq(b("paris"), b("gold"))))
      == Set("r1"))
  }

  test("composite registration survives the manifest JSON roundtrip") {
    val g = freshGraft("cidxj")
    mk(g)
    val g2 = graft.Graft(spark, g.root)
    val ix = g2.table("t").descriptor.compositeIndexOn(cols).get
    assert(ix.moreColumns.map { case (f, q) => (f, new String(q, "UTF-8")) }
      == Seq("f" -> "tier"))
    assert(rowsOf(g2.table("t").indexLookupComposite(cols,
      Seq(b("paris"), b("gold")))) == Set("r1", "r4"))
  }

  test("composite creation requires immutableRows") {
    val g = freshGraft("cidxreq")
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2), 1L)
    intercept[IllegalArgumentException] {
      g.createCompositeIndex("t", cols, 2L)
    }
  }

  test("wide view routes conjunctive equality through the composite index") {
    val g = freshGraft("cidxw")
    val t = mk(g)
    g.catalog.alterTable("t", t.descriptor.copy(
      wideKey = Some("k:string"),
      wideSchema = Some("f:city:string;f:tier:string;f:pop:string")), 7L)
    // (the composite route seam is asserted in WideViewSpec — package
    // access; here: end-to-end through spark.sql)
    spark.conf.set("spark.sql.catalog.graft_cw",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cw.root", g.root)
    val sql = spark.sql("SELECT k, pop FROM graft_cw.`t$wide` " +
      "WHERE city = 'paris' AND tier = 'gold' ORDER BY k")
    assert(sql.collect().map(_.getString(0)).toSeq == Seq("r1", "r4"))
  }
}
