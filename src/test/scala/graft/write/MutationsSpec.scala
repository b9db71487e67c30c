package graft.write

import graft.SparkSpec
import graft.core.{Bytes, Cell, CellKind}
import graft.read.{ReadView, Resolve}
import org.apache.spark.sql.functions._

/** Write-path semantics transcribed from the reference's `TestHRegion`
  * put/delete/ICV/checkAndMutate cases (SURVEY.md §2.2, §7.3 step 5). */
class MutationsSpec extends SparkSpec {
  import spark.implicits._

  private def b(s: String) = Bytes.toBytes(s)

  test("Put merge: newer batch ts wins at read; LATEST_TIMESTAMP stamped to batchTs") {
    val table = cells(Seq(Cell.put(b("r1"), "f", b("q"), 10L, b("old")))).toDF()
    val batch = Mutations.toDF(spark,
      Seq(Put(b("r1")).add("f", b("q"), b("new"))), batchTs = 20L)
    val out = collectCells(Resolve(Mutations.merge(table, batch)))
    assert(out == Set(("r1", "f", "q", 20L, "new")))
  }

  test("same-coordinate writes in one batch: batch order decides (seq)") {
    val batch = Mutations.toDF(spark, Seq(
      Put(b("r1")).add("f", b("q"), b("first")),
      Put(b("r1")).add("f", b("q"), b("second"))), batchTs = 5L)
    val out = collectCells(Resolve(batch))
    assert(out == Set(("r1", "f", "q", 5L, "second")))
  }

  test("Delete builders: family/columns/point granularities") {
    val table = cells(Seq(
      Cell.put(b("r1"), "f", b("q1"), 1L, b("a")),
      Cell.put(b("r1"), "f", b("q1"), 3L, b("c")),
      Cell.put(b("r1"), "f", b("q2"), 2L, b("x")),
      Cell.put(b("r2"), "f", b("q1"), 2L, b("keep")))).toDF()
    val batch = Mutations.toDF(spark, Seq(
      Delete(b("r1")).deleteColumn("f", b("q1"), 1L), // point: only ts=1
      Delete(b("r1")).deleteColumns("f", b("q2"), 2L)), // all <= 2
      batchTs = 10L)
    val out = collectCells(Resolve(Mutations.merge(table, batch),
      ReadView(maxVersions = 10)))
    assert(out == Set(("r1", "f", "q1", 3L, "c"), ("r2", "f", "q1", 2L, "keep")))
  }

  test("increment: batch deltas sum associatively onto current value; absent -> 0") {
    val table = cells(Seq(
      Cell.put(b("r1"), "c", b("n"), 1L, Bytes.toBytes(100L)))).toDF()
    val incs = Seq(
      (b("r1"), "c", b("n"), 5L), (b("r1"), "c", b("n"), 7L),
      (b("r2"), "c", b("n"), 3L))
      .toDF("row", "family", "qualifier", "delta")
    val newCells = Mutations.increment(table, incs, batchTs = 9L)
    val out = Resolve(Mutations.merge(table, newCells)).collect().map { r =>
      (new String(r.getAs[Array[Byte]]("row"), "UTF-8"),
        Bytes.toLong(r.getAs[Array[Byte]]("value")))
    }.toSet
    assert(out == Set(("r1", 112L), ("r2", 3L)))
  }

  test("increment: negative deltas and negative stored counters round-trip") {
    val table = cells(Seq(
      Cell.put(b("r1"), "c", b("n"), 1L, Bytes.toBytes(-100L)))).toDF()
    val incs = Seq(
      (b("r1"), "c", b("n"), -5L), // -100 + -5 = -105, not -5
      (b("r2"), "c", b("n"), -3L)) // absent -> 0 + -3
      .toDF("row", "family", "qualifier", "delta")
    val merged = Mutations.merge(table, Mutations.increment(table, incs, batchTs = 9L))
    val out = Resolve(merged).collect().map { r =>
      (new String(r.getAs[Array[Byte]]("row"), "UTF-8"),
        Bytes.toLong(r.getAs[Array[Byte]]("value")))
    }.toSet
    assert(out == Set(("r1", -105L), ("r2", -3L)))
  }

  test("checkAndMutate: applies only where latest value matches expected; null = absent") {
    val table = cells(Seq(
      Cell.put(b("r1"), "f", b("st"), 1L, b("F")),
      Cell.put(b("r2"), "f", b("st"), 1L, b("O")))).toDF()
    val checks = Seq(
      (b("r1"), "f", b("st"), b("F")), // matches -> accept
      (b("r2"), "f", b("st"), b("F")), // latest is O -> reject
      (b("r3"), "f", b("st"), null.asInstanceOf[Array[Byte]])) // absent -> accept
      .toDF("row", "family", "qualifier", "expected")
    val batch = Mutations.toDF(spark, Seq(
      Put(b("r1")).add("f", b("v"), b("w1")),
      Put(b("r2")).add("f", b("v"), b("w2")),
      Put(b("r3")).add("f", b("v"), b("w3"))), batchTs = 5L)
    val accepted = Mutations.checkAndMutate(table, checks, batch)
    val rows = accepted.select("row").as[Array[Byte]].collect()
      .map(new String(_, "UTF-8")).toSet
    assert(rows == Set("r1", "r3"))
  }

  test("descriptor major compaction: each family keeps its own TTL and maxVersions") {
    import graft.catalog.FamilyDescriptor
    val table = cells(Seq(
      Cell.put(b("r1"), "short", b("q"), 10L, b("s-old")), // expired for short
      Cell.put(b("r1"), "short", b("q"), 90L, b("s-new")),
      Cell.put(b("r1"), "long", b("q"), 10L, b("l-old")), // ALIVE: long TTL
      Cell.put(b("r1"), "long", b("q"), 20L, b("l-mid")),
      Cell.put(b("r1"), "long", b("q"), 30L, b("l-new")),
      Cell.put(b("r1"), "keep", b("q"), 1L, b("k")))).toDF() // no TTL at all
    val fams = Seq(
      FamilyDescriptor("short", maxVersions = 3, ttlMs = Some(50L)),
      FamilyDescriptor("long", maxVersions = 2, ttlMs = Some(1000L)),
      FamilyDescriptor("keep", maxVersions = 1))
    val out = collectCells(Compact.major(table, fams, now = 100L))
    // A collapsed min-TTL (50) would have dropped l-old/l-mid and k; the
    // per-family view keeps them, and long's maxVersions=2 drops only l-old.
    assert(out == Set(
      ("r1", "short", "q", 90L, "s-new"),
      ("r1", "long", "q", 30L, "l-new"),
      ("r1", "long", "q", 20L, "l-mid"),
      ("r1", "keep", "q", 1L, "k")))
  }

  test("major compaction: reads identical, tombstones physically gone") {
    val table = cells(Seq(
      Cell.put(b("r1"), "f", b("q"), 1L, b("a")),
      Cell.put(b("r1"), "f", b("q"), 2L, b("b")),
      Cell.deleteColumn(b("r1"), "f", b("q"), 1L),
      Cell.put(b("r2"), "f", b("q"), 1L, b("x")),
      Cell.deleteFamily(b("r2"), "f", 5L))).toDF()
    val compacted = Compact.major(table, maxVersions = 3)
    assert(compacted.filter(col("kind") =!= CellKind.Put).isEmpty)
    assert(collectCells(Resolve(compacted, ReadView(maxVersions = 3))) ==
      collectCells(Resolve(table, ReadView(maxVersions = 3))))
    assert(collectCells(Resolve(compacted)) == Set(("r1", "f", "q", 2L, "b")))
  }
}
