package graft.read

import graft.SparkSpec
import graft.core.{Cell, CellKind}

/** F3 micro-fixtures (FIXTURES.md): resolve-transform semantics transcribed
  * from the reference's `TestScanDeleteTracker`, `TestQueryMatcher`,
  * `TestStoreScanner` and the delete-granularity cases of `TestHRegion`. */
class ResolveSpec extends SparkSpec {

  private def b(s: String) = s.getBytes("UTF-8")
  private def put(r: String, q: String, ts: Long, v: String, fam: String = "f", seq: Long = 0) =
    Cell.put(b(r), fam, b(q), ts, b(v), seq)

  test("maxVersions keeps newest N per column") {
    val fx = cells(Seq(
      put("r1", "q1", 1, "v1"), put("r1", "q1", 2, "v2"),
      put("r1", "q1", 3, "v3"), put("r1", "q1", 4, "v4")))
    val latest = collectCells(Resolve(fx.toDF(), ReadView(maxVersions = 1)))
    assert(latest == Set(("r1", "f", "q1", 4L, "v4")))
    val three = collectCells(Resolve(fx.toDF(), ReadView(maxVersions = 3)))
    assert(three.map(_._4) == Set(2L, 3L, 4L))
  }

  test("Delete masks exactly one version; DeleteColumn masks all <= ts") {
    val fx = cells(Seq(
      put("r1", "q1", 1, "v1"), put("r1", "q1", 2, "v2"), put("r1", "q1", 3, "v3"),
      Cell.delete(b("r1"), "f", b("q1"), 2), // point delete of ts=2 only
      put("r1", "q2", 1, "w1"), put("r1", "q2", 2, "w2"), put("r1", "q2", 3, "w3"),
      Cell.deleteColumn(b("r1"), "f", b("q2"), 2))) // masks w1, w2
    val out = collectCells(Resolve(fx.toDF(), ReadView(maxVersions = 10)))
    assert(out.filter(_._3 == "q1").map(_._4) == Set(1L, 3L))
    assert(out.filter(_._3 == "q2").map(_._4) == Set(3L))
  }

  test("DeleteFamily masks all cells of the family <= ts; other family untouched") {
    val fx = cells(Seq(
      put("r1", "q1", 1, "v1"), put("r1", "q1", 5, "v5"),
      put("r1", "q2", 3, "w3"),
      put("r1", "q1", 3, "g3", fam = "g"),
      Cell.deleteFamily(b("r1"), "f", 3)))
    val out = collectCells(Resolve(fx.toDF(), ReadView(maxVersions = 10)))
    assert(out == Set(("r1", "f", "q1", 5L, "v5"), ("r1", "g", "q1", 3L, "g3")))
  }

  test("delete wins over put at equal timestamp (type sorts before Put)") {
    val fx = cells(Seq(
      put("r1", "q1", 5, "v5"),
      Cell.delete(b("r1"), "f", b("q1"), 5)))
    assert(collectCells(Resolve(fx.toDF(), ReadView(maxVersions = 10))).isEmpty)
  }

  test("put newer than tombstone is visible (out-of-order write after delete)") {
    val fx = cells(Seq(
      Cell.deleteColumn(b("r1"), "f", b("q1"), 10),
      put("r1", "q1", 11, "after"),
      put("r1", "q1", 9, "before")))
    val out = collectCells(Resolve(fx.toDF(), ReadView(maxVersions = 10)))
    assert(out == Set(("r1", "f", "q1", 11L, "after")))
  }

  test("time range is half-open [min, max)") {
    val fx = cells(Seq(put("r1", "q1", 1, "a"), put("r1", "q1", 2, "b"),
      put("r1", "q1", 3, "c")))
    val out = collectCells(Resolve(fx.toDF(),
      ReadView(maxVersions = 10, timeRange = Some((1L, 3L)))))
    assert(out.map(_._4) == Set(1L, 2L))
  }

  test("TTL hides cells older than now - ttl") {
    val fx = cells(Seq(put("r1", "q1", 100, "old"), put("r1", "q1", 900, "new")))
    val out = collectCells(Resolve(fx.toDF(),
      ReadView(maxVersions = 10, ttlMs = Some(200L), now = 1000L)))
    assert(out.map(_._5) == Set("new"))
  }

  test("asOf time travel caps puts AND tombstones") {
    val fx = cells(Seq(
      put("r1", "q1", 1, "v1"),
      Cell.deleteColumn(b("r1"), "f", b("q1"), 5), // after asOf -> ignored
      put("r1", "q1", 10, "v10")))
    val out = collectCells(Resolve(fx.toDF(), ReadView(maxVersions = 10, asOf = Some(3L))))
    assert(out == Set(("r1", "f", "q1", 1L, "v1")))
  }

  test("duplicate write at identical coords+ts: highest seq wins") {
    val fx = cells(Seq(
      put("r1", "q1", 5, "first", seq = 1), put("r1", "q1", 5, "second", seq = 2)))
    val out = collectCells(Resolve(fx.toDF(), ReadView(maxVersions = 10)))
    assert(out == Set(("r1", "f", "q1", 5L, "second")))
  }

  test("resolve is idempotent") {
    val fx = cells(Seq(
      put("r1", "q1", 1, "v1"), put("r1", "q1", 2, "v2"),
      Cell.delete(b("r1"), "f", b("q1"), 1),
      put("r2", "q1", 1, "x"))).toDF()
    val once = Resolve(fx, ReadView(maxVersions = 3))
    val twice = Resolve(once, ReadView(maxVersions = 3))
    assert(collectCells(once) == collectCells(twice))
  }

  test("hot row: 10k versions of one cell resolve to the latest, in bounded time") {
    // skew hardening: a single (row, family) carrying 10^4 versions is
    // ONE group in the versions_latest-shaped exchange — the resolve
    // must stay a per-group sorted fold (memory O(maxVersions of one
    // column), never a cross product of versions), and emit exactly the
    // newest cell of each qualifier next to untouched normal rows.
    val hot = (1 to 10000).map(i => put("hot", "q1", i.toLong, s"v$i"))
    val cold = Seq(put("r2", "q1", 1, "x"), put("r3", "q1", 2, "y"))
    val t0 = System.nanoTime()
    val out = collectCells(Resolve(cells(hot ++ cold).toDF(),
      ReadView(maxVersions = 1)))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out == Set(("hot", "f", "q1", 10000L, "v10000"),
      ("r2", "f", "q1", 1L, "x"), ("r3", "f", "q1", 2L, "y")))
    // generous bound — the point is no quadratic blowup on the hot group
    assert(secs < 60.0, s"hot-row resolve took ${secs}s")
  }

  test("hot row skew posture: wide row with tombstones resolves exactly") {
    // The pinned hash(row) exchange concentrates a hot row key into ONE
    // task (skew posture recorded at Resolve.masked, r17). This pins
    // that the concentration is CORRECT: a row carrying a corpus-sized
    // cell share — many qualifiers x versions across two families, with
    // family- and column-level tombstones interleaved — must mask and
    // version-cap exactly, next to untouched normal rows.
    val hot = (0 until 300).flatMap { i =>
      val q = f"q$i%03d"
      Seq(put("hot", q, 1, s"$q-1"), put("hot", q, 2, s"$q-2"),
        put("hot", q, 3, s"$q-3"))
    } ++ Seq(
      Cell.deleteFamily(b("hot"), "f", 1), // masks every f ts<=1
      // masks ts<=2 of even qualifiers
    ) ++ (0 until 300 by 2).map(i =>
      Cell.deleteColumn(b("hot"), "f", b(f"q$i%03d"), 2)) ++
      (0 until 50).map(i => put(f"r$i%03d", "q1", 1, s"n$i")) ++
      Seq(put("hot", "g1", 7, "gv", fam = "g"))
    val out = collectCells(Resolve(cells(hot).toDF(), ReadView(maxVersions = 2)))
    val hotF = out.filter(c => c._1 == "hot" && c._2 == "f")
    // odd qualifiers: DeleteFamily@1 masks ts1, cap keeps ts3+ts2
    assert(hotF.count(_._4 == 2L) == 150, "odd quals keep ts2")
    assert(hotF.count(_._4 == 3L) == 300, "all quals keep ts3")
    assert(!hotF.exists(_._4 == 1L), "DeleteFamily@1 masks every ts1")
    assert(hotF.size == 450)
    assert(out.count(_._2 == "g") == 1) // other family untouched
    assert(out.count(c => c._1 != "hot") == 50) // normal rows intact
  }
}
