package graft.read

import graft.SparkSpec
import graft.core.{Bytes, Cell}

/** The PageFilter bounded-seek fast path in `ScanExec`: the page must be
  * exactly "the first N visible rows from the seek point" even when the
  * first probe window is eaten by tombstones (escalation), when the table
  * has fewer visible rows than the page (exhaustion), and when rows are
  * wide (more cells than the per-row estimate). Global-page semantics per
  * the reference's PageFilter + our whole-table view. */
class BoundedSeekSpec extends SparkSpec {

  private def key(i: Int) = Bytes.toBytes(i.toLong)
  private def put(i: Int, q: String, v: String, ts: Long = 5L) =
    Cell.put(key(i), "f", q.getBytes("UTF-8"), ts, v.getBytes("UTF-8"), 0L)

  private def visibleKeys(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("row").distinct().collect()
      .map(r => Bytes.toLong(r.getAs[Array[Byte]]("row"))).sorted.toSeq

  test("clean page: first N rows from the seek point") {
    val fx = cells((0 until 300).map(i => put(i, "q", s"v$i"))).toDF()
    val out = ScanExec(fx, Scan().setStartRow(key(40)).setFilter(PageFilter(5)))
    assert(visibleKeys(out) == Seq(40L, 41L, 42L, 43L, 44L))
  }

  test("tombstoned prefix forces escalation past the first probe window") {
    // rows 0..199 family-deleted (ts 9 > put ts 5): the first 8x5-cell
    // probe window is 100% masked, so the seek must widen until it finds
    // the 5 visible rows at 200..204
    val puts = (0 until 205).map(i => put(i, "q", s"v$i"))
    val tombs = (0 until 200).map(i => Cell.deleteFamily(key(i), "f", 9L))
    val fx = cells(puts ++ tombs).toDF()
    val out = ScanExec(fx, Scan().setFilter(PageFilter(5)))
    assert(visibleKeys(out) == Seq(200L, 201L, 202L, 203L, 204L))
  }

  test("exhaustion: fewer visible rows than the page returns them all") {
    val fx = cells((0 until 3).map(i => put(i, "q", s"v$i"))).toDF()
    val out = ScanExec(fx, Scan().setFilter(PageFilter(100)))
    assert(visibleKeys(out) == Seq(0L, 1L, 2L))
    assert(ScanExec(cells(Seq(put(0, "q", "v")))
      .toDF().filter("ts < 0"), Scan().setFilter(PageFilter(3))).isEmpty)
  }

  test("wide rows: more cells per row than the probe estimate") {
    // 20 qualifiers per row > the 8 cells/row first-probe estimate: the
    // raw-key probe must escalate on distinct-count, not return a short page
    val fx = cells(for (i <- 0 until 30; q <- 0 until 20)
      yield put(i, s"q$q", s"v$i-$q")).toDF()
    val out = ScanExec(fx, Scan().setFilter(PageFilter(12)))
    assert(visibleKeys(out) == (0L until 12L))
  }

  test("probe budget exhausted: capped escalation falls back to the distributed pass") {
    // page=1 -> probes 8, 32, 128, 512 cells (initial + 3 widenings, the
    // cap). Row 0 carries 600 fully-tombstoned cells, so every capped
    // probe sees only row 0 and masks to nothing; the answer (row 1) is
    // found by the distributed masked-pass fallback — and driver traffic
    // stayed O(page) the whole way, the ADVICE-r6 property.
    val wide = (0 until 600).map(q => put(0, s"q$q", s"v$q"))
    val tomb = Seq(Cell.deleteFamily(key(0), "f", 9L))
    val fx = cells(wide ++ tomb ++ Seq(put(1, "q", "win"))).toDF()
    val out = ScanExec(fx, Scan().setFilter(PageFilter(1)))
    assert(visibleKeys(out) == Seq(1L))
  }

  test("boundary row keeps all its cells (no partial-row page)") {
    val fx = cells(for (i <- 0 until 10; q <- 0 until 6)
      yield put(i, s"q$q", s"v$i-$q")).toDF()
    val out = ScanExec(fx, Scan().setFilter(PageFilter(2)))
    assert(out.count() == 12L) // 2 rows x 6 cells, never a clipped row
  }
}
