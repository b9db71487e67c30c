package graft.read

import graft.SparkSpec
import graft.core.{Bytes, Cell}

/** Secondary index: build transform, range probe, and the verified-read
  * contract (stale hits and deleted columns never leak through). */
class IndexSpec extends SparkSpec {

  private def b(s: String) = Bytes.toBytes(s)
  private val q = b("city")

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("row").distinct().collect()
      .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")).toSet

  test("probe returns exactly the matching main-row keys") {
    val main = cells(Seq(
      Cell.put(b("r1"), "f", q, 1L, b("paris")),
      Cell.put(b("r2"), "f", q, 1L, b("tokyo")),
      Cell.put(b("r3"), "f", q, 1L, b("paris")),
      Cell.put(b("r3"), "f", b("pop"), 1L, b("9")))).toDF()
    val idx = SecondaryIndex.indexCells(main, "f", q)
    assert(rowsOf(SecondaryIndex.probe(idx, b("paris"))) == Set("r1", "r3"))
    assert(rowsOf(SecondaryIndex.probe(idx, b("tokyo"))) == Set("r2"))
    assert(rowsOf(SecondaryIndex.probe(idx, b("oslo"))).isEmpty)
    // value-prefix probe boundary: "pari" must not match "paris"
    assert(rowsOf(SecondaryIndex.probe(idx, b("pari"))).isEmpty)
  }

  test("lookup gathers whole rows and verifies against the live value") {
    val main = cells(Seq(
      Cell.put(b("r1"), "f", q, 1L, b("paris")),
      Cell.put(b("r1"), "f", b("pop"), 1L, b("2m")),
      // r2 was paris at ts=1, updated to tokyo at ts=2; index maintained
      // with the delta so BOTH entries exist
      Cell.put(b("r2"), "f", q, 1L, b("paris")),
      Cell.put(b("r2"), "f", q, 2L, b("tokyo")))).toDF()
    val idx = SecondaryIndex.indexCells(main, "f", q)
    val hitParis = SecondaryIndex.lookup(main, idx, "f", q, b("paris"))
    // stale hit r2 eliminated by the verify filter; r1 returns ALL its
    // columns, not just the indexed one
    assert(rowsOf(hitParis) == Set("r1"))
    assert(collectCells(hitParis).map(_._3) == Set("city", "pop"))
    assert(rowsOf(SecondaryIndex.lookup(main, idx, "f", q, b("tokyo")))
      == Set("r2"))
  }

  test("a deleted column never leaks through a stale index entry") {
    val main = cells(Seq(
      Cell.put(b("r1"), "f", q, 1L, b("paris")),
      Cell.put(b("r1"), "f", b("pop"), 1L, b("2m")),
      Cell.deleteColumn(b("r1"), "f", q, 2L))).toDF()
    // index built before the delete (maintenance indexes puts only)
    val idx = SecondaryIndex.indexCells(
      main.filter(org.apache.spark.sql.functions.col("ts") === 1L), "f", q)
    assert(rowsOf(SecondaryIndex.probe(idx, b("paris"))) == Set("r1"))
    assert(rowsOf(SecondaryIndex.lookup(main, idx, "f", q, b("paris"))).isEmpty)
  }

  test("lookupAll: one pass answers an IN-list with the same verify") {
    val main = cells(Seq(
      Cell.put(b("r1"), "f", q, 1L, b("paris")),
      Cell.put(b("r2"), "f", q, 1L, b("tokyo")),
      Cell.put(b("r3"), "f", q, 1L, b("oslo")),
      // stale: was paris, now lima; only the lima probe may return it
      Cell.put(b("r4"), "f", q, 1L, b("paris")),
      Cell.put(b("r4"), "f", q, 2L, b("lima")))).toDF()
    val idx = SecondaryIndex.indexCells(main, "f", q)
    assert(rowsOf(SecondaryIndex.lookupAll(main, idx, "f", q,
      Seq(b("paris"), b("oslo")))) == Set("r1", "r3"))
    assert(rowsOf(SecondaryIndex.lookupAll(main, idx, "f", q,
      Seq(b("paris"), b("lima")))) == Set("r1", "r4"))
    assert(rowsOf(SecondaryIndex.lookupAll(main, idx, "f", q,
      Seq(b("nowhere")))).isEmpty)
  }

  test("probe hits are broadcast into the main-table gather") {
    val main = cells(Seq(
      Cell.put(b("r1"), "f", q, 1L, b("paris")))).toDF()
    val idx = SecondaryIndex.indexCells(main, "f", q)
    val plan = SecondaryIndex.lookup(main, idx, "f", q, b("paris"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"index gather is not a broadcast join:\n$plan")
  }

  test("size gate: a hot value's gather falls back to a shuffle semi-join") {
    // Low-cardinality indexed column (the classic "index on status"
    // mistake): 400 of 500 rows share one value. With the gate forced
    // low, the gather must NOT build a driver broadcast of the hit keys —
    // and the results must be identical to the broadcast path.
    val main = cells((0 until 500).map { i =>
      Cell.put(Bytes.toBytes(i.toLong), "f", q, 1L,
        if (i % 5 == 4) b("rare") else b("hot"))
    }).toDF()
    val idx = SecondaryIndex.indexCells(main, "f", q)
    val gated = SecondaryIndex.lookup(main, idx, "f", q, b("hot"),
      broadcastMaxKeys = 10L)
    val gatedPlan = gated.queryExecution.executedPlan.toString
    assert(!gatedPlan.contains("BroadcastHashJoin") &&
      !gatedPlan.contains("BroadcastNestedLoop"),
      s"hot-value gather still broadcasts:\n$gatedPlan")
    val wide = SecondaryIndex.lookup(main, idx, "f", q, b("hot"))
    assert(wide.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    def keysOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("row").distinct().collect()
        .map(r => Bytes.toLong(r.getAs[Array[Byte]](0))).toSet
    assert(keysOf(gated).size == 400 && keysOf(gated) == keysOf(wide))
    // the selective value stays on the broadcast plan under the same gate
    val rare = SecondaryIndex.lookup(main, idx, "f", q, b("rare"),
      broadcastMaxKeys = 1000L)
    assert(rare.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(keysOf(rare).size == 100)
  }

  test("registered index: create builds, append maintains, rebuild GCs") {
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    import graft.write.{Delete, Put}
    val g = graft.Graft(spark,
      java.nio.file.Files.createTempDirectory("graft-ixreg").toString)
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f", maxVersions = 1)), splitKeys = 2), 1L)
    g.table("t").put(Seq(
      Put(b("r1")).add("f", q, 2L, b("paris")),
      Put(b("r2")).add("f", q, 2L, b("tokyo"))), 2L)
    val ix = g.createIndex("t", "f", q, 3L)
    assert(g.tableExists(ix.indexTable))
    assert(rowsOf(g.table("t").indexLookup("f", q, Seq(b("paris")))) == Set("r1"))
    // appends after registration maintain the index automatically
    g.table("t").put(Seq(Put(b("r3")).add("f", q, 4L, b("paris"))), 4L)
    assert(rowsOf(g.table("t").indexLookup("f", q, Seq(b("paris"))))
      == Set("r1", "r3"))
    // update + delete: stale entries are verified away on read...
    g.table("t").put(Seq(Put(b("r1")).add("f", q, 5L, b("oslo"))), 5L)
    g.table("t").delete(Seq(Delete(b("r3")).deleteFamily("f", 6L)), 6L)
    assert(rowsOf(g.table("t").indexLookup("f", q, Seq(b("paris")))).isEmpty)
    assert(rowsOf(g.table("t").indexLookup("f", q, Seq(b("oslo")))) == Set("r1"))
    // ...and majorCompact's rebuild physically drops them (index GC)
    val before = g.catalog.read(ix.indexTable).count()
    g.table("t").majorCompact(7L)
    val after = g.catalog.read(ix.indexTable).count()
    assert(after < before, s"index did not shrink: $before -> $after")
    // exactly the two live entries (r1=oslo, r2=tokyo) survive
    assert(after == 2L)
    assert(rowsOf(g.table("t").indexLookup("f", q, Seq(b("oslo")))) == Set("r1"))
    assert(rowsOf(g.table("t").indexLookup("f", q, Seq(b("tokyo")))) == Set("r2"))
    assert(rowsOf(g.table("t").indexLookup("f", q, Seq(b("paris")))).isEmpty)
    // double registration is refused
    intercept[IllegalArgumentException] { g.createIndex("t", "f", q, 8L) }
  }

  test("salted table + global index compose: logical keys, O(hits) probe") {
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    import graft.write.Put
    val g = graft.Graft(spark,
      java.nio.file.Files.createTempDirectory("graft-ixsalt").toString)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, saltBuckets = 8), 1L)
    g.table("t").put((0 until 300).map(i =>
      Put(Bytes.toBytes(i.toLong)).add("f", q, 2L,
        b(if (i % 100 == 7) "paris" else "other"))), 2L)
    g.createIndex("t", "f", q, 3L)
    // the index stores LOGICAL keys: lookup returns unsalted 8-byte rows
    val hit = g.table("t").indexLookup("f", q, Seq(b("paris")))
    val keys = hit.select("row").distinct().collect()
      .map(r => Bytes.toLong(r.getAs[Array[Byte]](0))).sorted.toSeq
    assert(keys == Seq(7L, 107L, 207L))
    // maintenance keeps composing after the fact
    g.table("t").put(Seq(Put(Bytes.toBytes(777L)).add("f", q, 4L, b("paris"))), 4L)
    assert(g.table("t").indexLookup("f", q, Seq(b("paris"))).select("row")
      .distinct().count() == 4L)
    // probe stays O(hits): the index scan pushes the value-range bounds
    val idx = g.catalog.read(
      g.table("t").descriptor.indexOn("f", q).get.indexTable)
    // asserted INSIDE the PushedFilters list (r16 ADVICE: anywhere-in-plan
    // could match incidental text), with the metadata print limit raised
    // so the fast path's leading kind IsNotNulls cannot truncate the
    // range bound away
    val prevLim = spark.conf.get("spark.sql.maxMetadataStringLength")
    val probePushed =
      try {
        spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
        SecondaryIndex.probe(idx, b("paris"))
          .queryExecution.executedPlan.toString
          .linesIterator.filter(_.contains("PushedFilters")).mkString
      } finally spark.conf.set("spark.sql.maxMetadataStringLength", prevLim)
    assert(probePushed.contains("GreaterThanOrEqual(row"),
      s"probe range not pushed:\n$probePushed")
  }

  test("gather span-bounds the main scan: hit-key range pushed to parquet") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-ixspan")
      .toString + "/cells"
    cells((0 until 1000).map { i =>
      Cell.put(Bytes.toBytes(i.toLong), "f", q, 1L,
        b(if (i == 400 || i == 600) "paris" else "other"))
    }).toDF().write.parquet(dir)
    val main = spark.read.schema(graft.core.Cell.schema).parquet(dir)
    val idx = SecondaryIndex.indexCells(main, "f", q)
    val hit = SecondaryIndex.lookup(main, idx, "f", q, b("paris"))
    // correctness: exactly the two matching rows, all their cells
    assert(hit.select("row").distinct().collect()
      .map(r => Bytes.toLong(r.getAs[Array[Byte]](0))).toSet == Set(400L, 600L))
    // the span [min(hit), succ(max(hit))) reached the MAIN parquet scan:
    // row-group pruning bounds the gather to the candidates' key range
    val plan = hit.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(row") && plan.contains("LessThan(row"),
      s"hit-key span not pushed into the main scan:\n$plan")
  }

  test("index lifecycle: clone never shares an index; deleteTable cascades") {
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    import graft.write.Put
    val g = graft.Graft(spark,
      java.nio.file.Files.createTempDirectory("graft-ixlife").toString)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2), 1L)
    g.table("t").put(Seq(Put(b("r1")).add("f", q, 2L, b("paris"))), 2L)
    val ix = g.createIndex("t", "f", q, 3L)
    g.snapshot("s", "t", 4L)
    // a clone starts INDEX-LESS (its appends must never dual-write into
    // the source's index table)
    g.cloneSnapshot("s", "t2", 5L)
    assert(g.table("t2").descriptor.indexes.isEmpty)
    val idxCellsBefore = g.catalog.read(ix.indexTable).count()
    g.table("t2").put(Seq(Put(b("r9")).add("f", q, 6L, b("lima"))), 6L)
    assert(g.catalog.read(ix.indexTable).count() == idxCellsBefore,
      "a clone append leaked into the source's index table")
    // source lookups are unaffected by clone writes
    assert(rowsOf(g.table("t").indexLookup("f", q, Seq(b("paris")))) == Set("r1"))
    assert(rowsOf(g.table("t").indexLookup("f", q, Seq(b("lima")))).isEmpty)
    // dropping the data table cascades to its registered index tables
    g.deleteTable("t")
    assert(!g.tableExists(ix.indexTable))
    assert(g.tableExists("t2")) // unrelated tables untouched
  }

  test("probeRange / lookupRange serve comparison predicates from the index") {
    val main = cells(Seq(
      Cell.put(b("r1"), "f", q, 1L, b("lyon")),
      Cell.put(b("r2"), "f", q, 1L, b("oslo")),
      Cell.put(b("r3"), "f", q, 1L, b("paris")),
      Cell.put(b("r4"), "f", q, 1L, b("tokyo")),
      Cell.put(b("r3"), "f", b("pop"), 1L, b("2m")))).toDF()
    val idx = SecondaryIndex.indexCells(main, "f", q)
    // oslo <= v < tokyo
    assert(rowsOf(SecondaryIndex.probeRange(idx, Some(b("oslo")),
      Some(b("tokyo")))) == Set("r2", "r3"))
    // unbounded sides
    assert(rowsOf(SecondaryIndex.probeRange(idx, Some(b("paris")), None))
      == Set("r3", "r4"))
    // hi = successor(oslo) in VALUE space = inclusive upper bound
    assert(rowsOf(SecondaryIndex.probeRange(idx, None,
      Some(Bytes.successor(b("oslo"))))) == Set("r1", "r2"))
    // lookupRange returns whole verified rows
    val hit = SecondaryIndex.lookupRange(main, idx, "f", q,
      Some(b("oslo")), Some(b("tokyo")))
    assert(rowsOf(hit) == Set("r2", "r3"))
    assert(collectCells(hit).filter(_._1 == "r3").map(_._3)
      == Set("city", "pop"))
  }

  test("range lookup verifies away stale entries inside the interval") {
    // r2 was oslo (in range) but updated to zurich (out of range); the
    // stale index entry names it as a candidate — the verify step must
    // re-check the CURRENT value against the interval
    val main = cells(Seq(
      Cell.put(b("r1"), "f", q, 1L, b("oslo")),
      Cell.put(b("r2"), "f", q, 1L, b("oslo")),
      Cell.put(b("r2"), "f", q, 2L, b("zurich")))).toDF()
    val idx = SecondaryIndex.indexCells(main, "f", q)
    assert(rowsOf(SecondaryIndex.lookupRange(main, idx, "f", q,
      Some(b("a")), Some(b("paris")))) == Set("r1"))
  }

  test("ordered-encoded doubles serve negative and fractional range probes") {
    // values stored in the ORDER-PRESERVING encoding (Bytes.toBytesOrdered
    // — the OrderedBytes/Phoenix sign-flip trick): byte ranges on the
    // index now mean numeric ranges, including negatives — the case the
    // plain IEEE-754 big-endian encoding inverts
    def ob(d: Double) = Bytes.toBytesOrdered(d)
    val main = cells(Seq(
      Cell.put(b("r1"), "f", q, 1L, ob(-2.5)),
      Cell.put(b("r2"), "f", q, 1L, ob(-0.5)),
      Cell.put(b("r3"), "f", q, 1L, ob(0.25)),
      Cell.put(b("r4"), "f", q, 1L, ob(3.5)))).toDF()
    val idx = SecondaryIndex.indexCells(main, "f", q)
    // [-1.0, 1.0): straddles zero — both signs on both sides
    assert(rowsOf(SecondaryIndex.probeRange(idx, Some(ob(-1.0)),
      Some(ob(1.0)))) == Set("r2", "r3"))
    // (-inf, -0.5 inclusive] via successor
    assert(rowsOf(SecondaryIndex.probeRange(idx, None,
      Some(Bytes.successor(ob(-0.5))))) == Set("r1", "r2"))
    // verified whole-row lookup over the same interval
    assert(rowsOf(SecondaryIndex.lookupRange(main, idx, "f", q,
      Some(ob(-3.0)), Some(ob(0.0)))) == Set("r1", "r2"))
  }

  test("indexLookupPrefix serves a value prefix as one probe range") {
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    import graft.write.Put
    val g = graft.Graft(spark,
      java.nio.file.Files.createTempDirectory("graft-ixpfx").toString)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2), 1L)
    g.table("t").put(Seq(
      Put(b("r1")).add("f", q, 2L, b("paris")),
      Put(b("r2")).add("f", q, 2L, b("parma")),
      Put(b("r3")).add("f", q, 2L, b("par")),
      Put(b("r4")).add("f", q, 2L, b("pa")),
      Put(b("r5")).add("f", q, 2L, b("tokyo"))), 2L)
    g.createIndex("t", "f", q, 3L)
    // startsWith "par": the exact-boundary cases — "par" itself in,
    // "pa" out, successors of the prefix range out
    assert(rowsOf(g.table("t").indexLookupPrefix("f", q, b("par")))
      == Set("r1", "r2", "r3"))
    assert(rowsOf(g.table("t").indexLookupPrefix("f", q, b("pa")))
      == Set("r1", "r2", "r3", "r4"))
    assert(rowsOf(g.table("t").indexLookupPrefix("f", q, b("part"))).isEmpty)
    // an all-0xff prefix leaves the range open above, still exact
    g.table("t").put(Seq(
      Put(b("r6")).add("f", q, 4L, Array(0xff.toByte, 0xff.toByte, 1.toByte)),
      Put(b("r7")).add("f", q, 4L, Array(0xff.toByte, 0xfe.toByte))), 4L)
    assert(rowsOf(g.table("t").indexLookupPrefix("f", q,
      Array(0xff.toByte, 0xff.toByte))) == Set("r6"))
  }

  test("indexLookupOr serves a one-column disjunction as one probe pass") {
    // FilterList(MUST_PASS_ONE): equality arm + interval arm + prefix-
    // shaped arm, all answered in one probeOr pass; updates make stale
    // entries the verified read must drop from a MATCHING arm.
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    import graft.read.SecondaryIndex.{ArmIn, ArmRange}
    import graft.write.Put
    val g = graft.Graft(spark,
      java.nio.file.Files.createTempDirectory("graft-ixor").toString)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2), 1L)
    g.table("t").put(Seq(
      Put(b("r1")).add("f", q, 2L, b("paris")),
      Put(b("r2")).add("f", q, 2L, b("parma")),
      Put(b("r3")).add("f", q, 2L, b("rome")),
      Put(b("r4")).add("f", q, 2L, b("lyon")),
      Put(b("r5")).add("f", q, 2L, b("tokyo"))), 2L)
    g.createIndex("t", "f", q, 3L)
    val arms = Seq(
      ArmIn(Seq(b("rome"), b("nice"))),
      ArmRange(Some(b("par")), Some(b("pars"))))
    assert(rowsOf(g.table("t").indexLookupOr("f", q, arms))
      == Set("r1", "r2", "r3"))
    // an update moves r3 out of its arm: the stale index entry must be
    // verified away (and the new value caught by a matching arm)
    g.table("t").put(Seq(Put(b("r3")).add("f", q, 4L, b("lyon"))), 4L)
    assert(rowsOf(g.table("t").indexLookupOr("f", q, arms))
      == Set("r1", "r2"))
    assert(rowsOf(g.table("t").indexLookupOr("f", q,
      Seq(ArmIn(Seq(b("lyon")))))) == Set("r3", "r4"))
  }

  test("range probe stays exact when values and bounds embed 0x00 bytes") {
    val v1 = Array[Byte](5)
    val v2 = Array[Byte](5, 0, 3)
    val v3 = Array[Byte](5, 0, 7)
    val v4 = Array[Byte](6)
    val main = cells(Seq(
      Cell.put(b("r1"), "f", q, 1L, v1),
      Cell.put(b("r2"), "f", q, 1L, v2),
      Cell.put(b("r3"), "f", q, 1L, v3),
      Cell.put(b("r4"), "f", q, 1L, v4))).toDF()
    val idx = SecondaryIndex.indexCells(main, "f", q)
    // hi embeds 0x00 ([5,0,3]): entries of the prefix value [5] sprawl
    // past it in index-row order — the reconstructed-value residual must
    // keep exactly {v1}, not leak v3 or lose v1
    assert(rowsOf(SecondaryIndex.probeRange(idx, Some(v1), Some(v2)))
      == Set("r1"))
    assert(rowsOf(SecondaryIndex.probeRange(idx, Some(v2), Some(v4)))
      == Set("r2", "r3"))
    // equality around the prefix boundary: the probe legitimately
    // over-approximates ([5,0,...] rows land inside [5]'s range), and
    // the VERIFIED lookup reduces it to the exact answer
    assert(rowsOf(SecondaryIndex.lookup(main, idx, "f", q, v1)) == Set("r1"))
    assert(rowsOf(SecondaryIndex.lookup(main, idx, "f", q, v2)) == Set("r2"))
  }
}
