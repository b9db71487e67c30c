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
}
