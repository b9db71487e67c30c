package graft.read

import graft.SparkSpec
import graft.core.Cell
import org.apache.spark.sql.DataFrame

/** F1 filter-matrix fixture (FIXTURES.md, from `test/filter/TestFilter.java:58-110`):
  * 8 rows x 8 cells across two families; every filter asserted against
  * expected row/cell counts. */
class FiltersSpec extends SparkSpec {

  private def b(s: String) = s.getBytes("UTF-8")

  // rows testRowOne-0..3 / testRowTwo-0..3; families One/Two each with
  // 4 qualifiers; group-One rows carry testValueOne, group-Two testValueTwo.
  private lazy val fixture: DataFrame = {
    val cs = for {
      group <- Seq("One", "Two")
      i <- 0 to 3
      fam <- Seq("testFamilyOne", "testFamilyTwo")
      q <- 0 to 3
    } yield Cell.put(
      b(s"testRow$group-$i"), fam,
      b(s"testQualifier${if (fam.endsWith("One")) "One" else "Two"}-$q"),
      ts = 1L, b(s"testValue$group"))
    Resolve(cells(cs).toDF(), ReadView(maxVersions = 1))
  }

  private def rows(df: DataFrame): Set[String] =
    collectCells(df).map(_._1)
  private def nCells(df: DataFrame): Long = df.count()

  test("fixture geometry: 8 rows x 8 cells") {
    assert(nCells(fixture) == 64)
    assert(rows(fixture).size == 8)
  }

  test("RowFilter EQUAL / NOT_EQUAL / LESS") {
    assert(rows(RowFilter(CompareOp.EQUAL, BinaryComparator(b("testRowOne-2")))(fixture)) ==
      Set("testRowOne-2"))
    assert(rows(RowFilter(CompareOp.NOT_EQUAL, BinaryComparator(b("testRowOne-2")))(fixture)).size == 7)
    assert(rows(RowFilter(CompareOp.LESS, BinaryComparator(b("testRowOne-2")))(fixture)) ==
      Set("testRowOne-0", "testRowOne-1"))
  }

  test("ValueFilter with substring and regex comparators") {
    assert(nCells(ValueFilter(CompareOp.EQUAL, SubstringComparator("ValueOne"))(fixture)) == 32)
    assert(nCells(ValueFilter(CompareOp.EQUAL, RegexStringComparator(".*Two$"))(fixture)) == 32)
    assert(nCells(ValueFilter(CompareOp.NOT_EQUAL, BinaryComparator(b("testValueOne")))(fixture)) == 32)
  }

  test("QualifierFilter restricts columns") {
    val f = QualifierFilter(CompareOp.EQUAL, BinaryComparator(b("testQualifierOne-2")))
    assert(nCells(f(fixture)) == 8) // one cell per row
  }

  test("PrefixFilter row-prefix") {
    assert(rows(PrefixFilter(b("testRowOne"))(fixture)).size == 4)
    assert(rows(PrefixFilter(b("testRowTwo-3"))(fixture)) == Set("testRowTwo-3"))
  }

  test("ColumnPrefixFilter qualifier-prefix") {
    assert(nCells(ColumnPrefixFilter(b("testQualifierTwo"))(fixture)) == 32)
  }

  test("InclusiveStopFilter closed upper bound") {
    assert(rows(InclusiveStopFilter(b("testRowOne-1"))(fixture)) ==
      Set("testRowOne-0", "testRowOne-1"))
  }

  test("PageFilter limits rows globally, in row order") {
    val out = PageFilter(3)(fixture)
    assert(rows(out) == Set("testRowOne-0", "testRowOne-1", "testRowOne-2"))
    assert(nCells(out) == 24)
  }

  test("FirstKeyOnlyFilter keeps one cell per row") {
    val out = FirstKeyOnlyFilter()(fixture)
    assert(nCells(out) == 8)
    assert(collectCells(out).forall(c => c._2 == "testFamilyOne" && c._3 == "testQualifierOne-0"))
  }

  test("ColumnCountGetFilter / ColumnPaginationFilter per-row slices") {
    assert(nCells(ColumnCountGetFilter(3)(fixture)) == 24)
    val page = ColumnPaginationFilter(limit = 2, offset = 5)(fixture)
    assert(nCells(page) == 16)
    // offset 5 in (fam,qual) order lands in family Two
    assert(collectCells(page).forall(_._2 == "testFamilyTwo"))
  }

  test("TimestampsFilter keeps explicit stamps") {
    assert(nCells(TimestampsFilter(Seq(1L))(fixture)) == 64)
    assert(nCells(TimestampsFilter(Seq(99L))(fixture)) == 0)
  }

  test("SingleColumnValueFilter row-level veto + filterIfMissing") {
    val f = SingleColumnValueFilter("testFamilyOne", b("testQualifierOne-0"),
      CompareOp.EQUAL, BinaryComparator(b("testValueOne")))
    assert(rows(f(fixture)).size == 4) // group-One rows only
    // rows missing the tested column: kept unless filterIfMissing
    val missing = SingleColumnValueFilter("testFamilyOne", b("noSuchQualifier"),
      CompareOp.EQUAL, BinaryComparator(b("x")))
    assert(rows(missing(fixture)).size == 8)
    assert(rows(missing.copy(filterIfMissing = true)(fixture)).isEmpty)
  }

  test("SingleColumnValueExcludeFilter drops the tested column") {
    val f = SingleColumnValueExcludeFilter("testFamilyOne", b("testQualifierOne-0"),
      CompareOp.EQUAL, BinaryComparator(b("testValueOne")))
    val out = f(fixture)
    assert(rows(out).size == 4)
    assert(nCells(out) == 4 * 7)
  }

  test("SkipFilter drops whole row on any cell rejection") {
    // reject cells whose value is testValueTwo -> group-Two rows vanish entirely
    val f = SkipFilter(ValueFilter(CompareOp.NOT_EQUAL, BinaryComparator(b("testValueTwo"))))
    assert(rows(f(fixture)).size == 4)
  }

  test("WhileMatchFilter terminates at first rejection in row order") {
    val f = WhileMatchFilter(RowFilter(CompareOp.NOT_EQUAL, BinaryComparator(b("testRowOne-2"))))
    assert(rows(f(fixture)) == Set("testRowOne-0", "testRowOne-1"))
  }

  test("FilterList AND / OR composition") {
    val and = FilterList.and(
      PrefixFilter(b("testRowOne")),
      QualifierFilter(CompareOp.EQUAL, BinaryComparator(b("testQualifierOne-1"))))
    assert(nCells(and(fixture)) == 4)
    val or = FilterList.or(
      RowFilter(CompareOp.EQUAL, BinaryComparator(b("testRowOne-0"))),
      RowFilter(CompareOp.EQUAL, BinaryComparator(b("testRowTwo-0"))))
    assert(rows(or(fixture)) == Set("testRowOne-0", "testRowTwo-0"))
    // AND with a stateful child composes as transforms
    val mixed = FilterList.and(PrefixFilter(b("testRowOne")), PageFilter(2))
    assert(rows(mixed(fixture)) == Set("testRowOne-0", "testRowOne-1"))
  }

  test("DependentColumnFilter keeps cells matching reference column ts") {
    val fx = cells(Seq(
      Cell.put(b("r1"), "f", b("ref"), 5, b("x")),
      Cell.put(b("r1"), "f", b("a"), 5, b("a5")),
      Cell.put(b("r1"), "f", b("a"), 6, b("a6")),
      Cell.put(b("r2"), "f", b("a"), 5, b("noref")))).toDF()
    val resolved = Resolve(fx, ReadView(maxVersions = 10))
    val out = DependentColumnFilter("f", b("ref"))(resolved)
    assert(collectCells(out).map(c => (c._1, c._3, c._4)) ==
      Set(("r1", "ref", 5L), ("r1", "a", 5L)))
    val dropped = DependentColumnFilter("f", b("ref"), dropDependentColumn = true)(resolved)
    assert(collectCells(dropped).map(c => (c._1, c._3, c._4)) == Set(("r1", "a", 5L)))
  }

  test("Get is a one-row scan; getRowOrBefore finds floor row") {
    val g = Get(b("testRowOne-1")).addFamily("testFamilyOne")
    val out = ScanExec.get(fixture, g)
    assert(rows(out) == Set("testRowOne-1"))
    assert(nCells(out) == 4)
    assert(ScanExec.exists(fixture, Get(b("testRowOne-1"))))
    assert(!ScanExec.exists(fixture, Get(b("zzz"))))
    val floor = ScanExec.getRowOrBefore(fixture, b("testRowOne-15"), "testFamilyOne")
    assert(rows(floor) == Set("testRowOne-1"))
  }

  test("Scan range + projection + filter end-to-end") {
    val scan = Scan()
      .setStartRow(b("testRowOne-1")).setStopRow(b("testRowTwo-1"))
      .addFamily("testFamilyOne")
      .setFilter(ColumnPrefixFilter(b("testQualifierOne-0")))
    val out = ScanExec(fixture, scan)
    assert(rows(out) == Set("testRowOne-1", "testRowOne-2", "testRowOne-3", "testRowTwo-0"))
    assert(nCells(out) == 4)
  }
}
