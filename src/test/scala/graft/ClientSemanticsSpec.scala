package graft

import graft.catalog.{FamilyDescriptor, TableDescriptor}
import graft.core.Bytes
import graft.read.{Get, Scan}
import graft.write.{Delete, Put}
import java.nio.file.Files

/** Behavioral spec transcribed from the reference's
  * `TestFromClientSide.java` (3695 LoC — the de-facto client-API spec:
  * versions, deletes, timestamps, family projections) driven through the
  * Graft facade over a multi-batch table lifecycle. */
class ClientSemanticsSpec extends SparkSpec {

  private def b(s: String) = Bytes.toBytes(s)

  private def fresh(maxVersions: Int = 3, ttlMs: Option[Long] = None): Graft = {
    val g = Graft(spark, Files.createTempDirectory("graft-client").toString)
    g.createTable(TableDescriptor("t", Seq(
      FamilyDescriptor("f", maxVersions, ttlMs),
      FamilyDescriptor("g", maxVersions, ttlMs)), splitKeys = 2), 1L)
    g
  }

  private def vals(df: org.apache.spark.sql.DataFrame): Set[(String, Long, String)] =
    df.collect().map { r =>
      (r.getAs[String]("family"), r.getAs[Long]("ts"),
        new String(r.getAs[Array[Byte]]("value"), "UTF-8"))
    }.toSet

  test("multi-version put/get across separate write batches") {
    val g = fresh()
    val t = g.table("t")
    // four versions written in four commits (four data dirs)
    (1 to 4).foreach(i => t.put(Seq(
      Put(b("r")).add("f", b("q"), i.toLong, b(s"v$i"))), nowMs = i.toLong))
    assert(vals(t.get(Get(b("r")))) == Set(("f", 4L, "v4")))
    assert(vals(t.get(Get(b("r")).setMaxVersions(3))) ==
      Set(("f", 4L, "v4"), ("f", 3L, "v3"), ("f", 2L, "v2")))
    // explicit time range: [2, 4) newest-first
    assert(vals(t.get(Get(b("r")).setMaxVersions(1).setTimeRange(2L, 4L))) ==
      Set(("f", 3L, "v3")))
  }

  test("delete granularities across batches mirror TestFromClientSide") {
    val g = fresh()
    val t = g.table("t")
    t.put(Seq(
      Put(b("r")).add("f", b("q1"), 1L, b("a1")).add("f", b("q1"), 3L, b("a3"))
        .add("f", b("q2"), 2L, b("b2")).add("g", b("q1"), 2L, b("c2"))), 1L)
    // point delete of q1@3 only
    t.delete(Seq(Delete(b("r")).deleteColumn("f", b("q1"), 3L)), 2L)
    assert(vals(t.scan(Scan().setMaxVersions(5))) ==
      Set(("f", 1L, "a1"), ("f", 2L, "b2"), ("g", 2L, "c2")))
    // deleteFamily masks everything in f up to its stamp; g untouched
    t.delete(Seq(Delete(b("r")).deleteFamily("f", 5L)), 3L)
    assert(vals(t.scan(Scan().setMaxVersions(5))) == Set(("g", 2L, "c2")))
    // write AFTER the family tombstone is visible again
    t.put(Seq(Put(b("r")).add("f", b("q1"), 9L, b("back"))), 4L)
    assert(vals(t.scan(Scan().setMaxVersions(5))) ==
      Set(("f", 9L, "back"), ("g", 2L, "c2")))
  }

  test("per-family descriptor: different maxVersions and TTL per family") {
    val g = Graft(spark, Files.createTempDirectory("graft-perfam").toString)
    g.createTable(TableDescriptor("t", Seq(
      FamilyDescriptor("keep3", maxVersions = 3),
      FamilyDescriptor("keep1", maxVersions = 1),
      FamilyDescriptor("shortttl", maxVersions = 3, ttlMs = Some(100L))),
      splitKeys = 2), 1L)
    val t = g.table("t")
    t.put(Seq((1 to 4).foldLeft(Put(b("r"))) { (p, i) =>
      p.add("keep3", b("q"), i.toLong, b(s"a$i"))
        .add("keep1", b("q"), i.toLong, b(s"b$i"))
        .add("shortttl", b("q"), 900L + i, b(s"c$i"))
    }), 1L)
    // scan requesting up to 10 versions: each family caps at its own max
    val out = t.scan(Scan().setMaxVersions(10), nowMs = 1000L)
      .collect().map(r => (r.getAs[String]("family"),
        new String(r.getAs[Array[Byte]]("value"), "UTF-8"))).toSet
    assert(out.count(_._1 == "keep3") == 3 && !out.contains(("keep3", "a1")))
    assert(out.filter(_._1 == "keep1") == Set(("keep1", "b4")))
    assert(out.count(_._1 == "shortttl") == 3) // ts 901..904 >= 1000-100
    // at a later clock the short-TTL family expires entirely
    val later = t.scan(Scan().setMaxVersions(10), nowMs = 2000L)
      .collect().map(_.getAs[String]("family")).toSet
    assert(later == Set("keep3", "keep1"))
  }

  test("TTL from the family descriptor hides expired cells at read time") {
    val g = fresh(ttlMs = Some(100L))
    val t = g.table("t")
    t.put(Seq(
      Put(b("r")).add("f", b("q"), 100L, b("old")),
      Put(b("r2")).add("f", b("q"), 950L, b("new"))), 1L)
    assert(vals(t.scan(Scan(), nowMs = 1000L)) == Set(("f", 950L, "new")))
    // without a clock the table shows everything
    assert(vals(t.scan(Scan().setMaxVersions(5), nowMs = 0L)).size == 2)
  }

  test("family projection only scans requested stores") {
    val g = fresh()
    val t = g.table("t")
    t.put(Seq(Put(b("r")).add("f", b("q"), 1L, b("fv")).add("g", b("q"), 1L, b("gv"))), 1L)
    assert(vals(t.scan(Scan().addFamily("g"))) == Set(("g", 1L, "gv")))
  }

  test("wide rows: 1000 qualifiers in one row scan and paginate correctly") {
    val g = fresh()
    val t = g.table("t")
    val wide = (0 until 1000).foldLeft(Put(b("wide"))) { (p, i) =>
      p.add("f", b(f"q$i%04d"), 1L, b(s"v$i"))
    }
    t.put(Seq(wide), 1L)
    assert(t.scan(Scan()).count() == 1000)
    // per-row column pagination slices the middle (TestWideScanner-ish)
    val page = t.scan(Scan().setFilter(
      graft.read.ColumnPaginationFilter(limit = 10, offset = 500)))
      .collect().map(r => new String(r.getAs[Array[Byte]]("qualifier"), "UTF-8"))
      .sorted.toSeq
    assert(page == (500 until 510).map(i => f"q$i%04d"))
  }

  test("edge cases: empty table, absent family, empty decode, SQL view") {
    val g = fresh()
    val t = g.table("t")
    assert(t.scan(Scan()).count() == 0) // empty table scans cleanly
    t.put(Seq(Put(b("r")).add("f", b("q"), 1L, b("v"))), 1L)
    assert(t.scan(Scan().addFamily("nope")).count() == 0) // absent family
    assert(graft.core.CellCodec.decode(
      t.scan(Scan().addFamily("nope")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("q",
          org.apache.spark.sql.types.StringType)))).count() == 0)
    // unknown family rejected like HRegion.checkFamilies
    intercept[IllegalArgumentException] {
      t.put(Seq(Put(b("r")).add("zzz", b("q"), b("v"))), 9L)
    }
    // SQL access through the temp view + extension functions
    t.createTempView("graft_t")
    val n = spark.sql(
      "SELECT count(*) FROM graft_t WHERE family = 'f'").collect()(0).getLong(0)
    assert(n == 1L)
  }

  test("decodeToMaps: Result-style per-family qualifier maps, sorted, dynamic") {
    val g = fresh()
    val t = g.table("t")
    // row r1 carries DYNAMIC qualifiers in f (different set than r2) plus
    // one g cell; r2 has f only — its g map must come back EMPTY
    t.put(Seq(
      Put(b("r1")).add("f", b("beta"), 1L, b("v2")).add("f", b("alpha"), 1L, b("v1"))
        .add("g", b("n"), 1L, b("g1")),
      Put(b("r2")).add("f", b("gamma"), 1L, b("v3"))), 1L)
    val out = graft.core.CellCodec.decodeToMaps(t.scan(Scan()), Seq("f", "g"))
      .collect().map { r =>
        new String(r.getAs[Array[Byte]]("row"), "UTF-8") ->
          (r.getMap[Array[Byte], Array[Byte]](1), r.getMap[Array[Byte], Array[Byte]](2))
      }.toMap
    def render(m: scala.collection.Map[Array[Byte], Array[Byte]]): Seq[(String, String)] =
      m.toSeq.map { case (k, v) => (new String(k, "UTF-8"), new String(v, "UTF-8")) }
    // entries are qualifier-sorted (NavigableMap parity)
    assert(render(out("r1")._1) == Seq("alpha" -> "v1", "beta" -> "v2"))
    assert(render(out("r1")._2) == Seq("n" -> "g1"))
    assert(render(out("r2")._1) == Seq("gamma" -> "v3"))
    assert(out("r2")._2.isEmpty) // no g cells -> empty map, not null
  }

  test("decodeToMaps: multi-version scans keep the newest value per qualifier") {
    val g = fresh(maxVersions = 3)
    val t = g.table("t")
    t.put(Seq(Put(b("r1")).add("f", b("q"), 1L, b("old"))), 1L)
    t.put(Seq(Put(b("r1")).add("f", b("q"), 5L, b("new"))), 5L)
    t.put(Seq(Put(b("r1")).add("f", b("other"), 2L, b("x"))), 6L)
    // a multi-version scan yields two q cells — the map must carry the
    // newest, not crash on a duplicate key or pick by value byte-order
    val out = graft.core.CellCodec.decodeToMaps(
      t.scan(Scan().setMaxVersions(3)), Seq("f")).collect()(0)
    val m = out.getMap[Array[Byte], Array[Byte]](1).toSeq
      .map { case (k, v) => (new String(k, "UTF-8"), new String(v, "UTF-8")) }
    assert(m == Seq("other" -> "x", "q" -> "new"))
  }

  test("encodeFromMaps: map-frame round-trips through cells and a real table") {
    val g = fresh()
    val t = g.table("t")
    // dynamic-qualifier source data born as maps — no relational schema
    t.put(Seq(
      Put(b("r1")).add("f", b("beta"), 1L, b("v2")).add("f", b("alpha"), 1L, b("v1"))
        .add("g", b("n"), 1L, b("g1")),
      Put(b("r2")).add("f", b("gamma"), 1L, b("v3"))), 1L)
    val maps = graft.core.CellCodec.decodeToMaps(t.scan(Scan()), Seq("f", "g"))
    // encode twin: maps -> cells; kinds all Put, null/empty maps silent
    val cells = graft.core.CellCodec.encodeFromMaps(maps, Seq("f", "g"),
      batchTs = 7L)
    val got = cells.collect().map { r =>
      (new String(r.getAs[Array[Byte]]("row"), "UTF-8"), r.getString(1),
        new String(r.getAs[Array[Byte]]("qualifier"), "UTF-8"), r.getLong(3),
        new String(r.getAs[Array[Byte]]("value"), "UTF-8"))
    }.toSet
    assert(got == Set(
      ("r1", "f", "alpha", 7L, "v1"), ("r1", "f", "beta", 7L, "v2"),
      ("r1", "g", "n", 7L, "g1"), ("r2", "f", "gamma", 7L, "v3")))
    // round-trip law: decodeToMaps(encodeFromMaps(m)) == m (empty maps
    // for families a row lacks, entries qualifier-sorted)
    val back = graft.core.CellCodec.decodeToMaps(cells, Seq("f", "g"))
      .collect().map { r =>
        new String(r.getAs[Array[Byte]]("row"), "UTF-8") ->
          (r.getMap[Array[Byte], Array[Byte]](1).toSeq.map { case (k, v) =>
            (new String(k, "UTF-8"), new String(v, "UTF-8")) },
           r.getMap[Array[Byte], Array[Byte]](2).toSeq.map { case (k, v) =>
            (new String(k, "UTF-8"), new String(v, "UTF-8")) })
      }.toMap
    assert(back("r1") == (Seq("alpha" -> "v1", "beta" -> "v2"), Seq("n" -> "g1")))
    assert(back("r2") == (Seq("gamma" -> "v3"), Seq()))
    // and the encoded cells WRITE into a real table (mutate path)
    g.createTable(TableDescriptor("t_rt", Seq(
      FamilyDescriptor("f"), FamilyDescriptor("g"))), 1L)
    g.table("t_rt").mutate(cells, nowMs = 7L)
    assert(g.table("t_rt").scan(Scan()).count() == 4L)
  }

  test("multiTableWrite routes cells to their tables") {
    import org.apache.spark.sql.functions._
    val g = fresh()
    g.createTable(TableDescriptor("t2", Seq(FamilyDescriptor("f")), splitKeys = 2), 1L)
    val batch = cells(Seq(
      graft.core.Cell.put(b("r1"), "f", b("q"), 1L, b("to-t")),
      graft.core.Cell.put(b("r2"), "f", b("q"), 1L, b("to-t2")))).toDF()
      .withColumn("_table", when(col("row") === b("r1"), "t").otherwise("t2"))
    val routed = graft.jobs.Jobs.multiTableWrite(g, batch, "_table", 2L)
    assert(routed == Seq("t", "t2"))
    assert(vals(g.table("t").scan(Scan())) == Set(("f", 1L, "to-t")))
    assert(vals(g.table("t2").scan(Scan())) == Set(("f", 1L, "to-t2")))
  }
}
