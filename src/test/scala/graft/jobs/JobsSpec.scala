package graft.jobs

import graft.SparkSpec
import graft.core.{Bytes, Cell}
import graft.read.Resolve
import java.nio.file.Files

class JobsSpec extends SparkSpec {
  import spark.implicits._

  private def b(s: String) = Bytes.toBytes(s)

  private def fixture() = cells(Seq(
    Cell.put(b("r1"), "f", b("a"), 1L, b("x")),
    Cell.put(b("r1"), "f", b("b"), 2L, b("y")),
    Cell.put(b("r2"), "f", b("a"), 3L, b("z")),
    Cell.deleteFamily(b("r3"), "f", 9L),
    Cell.put(b("r3"), "f", b("a"), 5L, b("dead")))).toDF()

  test("rowCount counts rows with visible non-empty cells only") {
    assert(Jobs.rowCount(fixture()) == 2L) // r3 fully tombstoned
  }

  test("copyTable applies time window and resolves tombstones") {
    val all = Jobs.copyTable(fixture())
    assert(collectCells(all).map(_._1) == Set("r1", "r2"))
    val windowed = Jobs.copyTable(fixture(), startTime = Some(2L), endTime = Some(4L))
    assert(collectCells(windowed).map(_._4) == Set(2L, 3L))
  }

  test("export/import round-trips the visible state") {
    val dir = Files.createTempDirectory("graft-export-job").toString + "/dump"
    Jobs.exportTable(fixture(), dir)
    val back = Jobs.importTable(spark, dir)
    assert(collectCells(Resolve(back)) == collectCells(Jobs.copyTable(fixture())))
  }

  test("importTsv parses column spec, skips bad lines, counts them") {
    val dir = Files.createTempDirectory("graft-tsv").toString
    val p = java.nio.file.Paths.get(dir, "in.tsv")
    java.nio.file.Files.writeString(p,
      "row1\tv1\tw1\nrow2\tv2\tw2\nbadline\nrow3\tv3\tw3\n")
    val (cellsDf, bad) = Jobs.importTsv(spark, p.toString,
      Seq("HBASE_ROW_KEY", "f:c1", "g:c2"), ts = 7L)
    assert(bad == 1L)
    val out = collectCells(cellsDf)
    assert(out == Set(
      ("row1", "f", "c1", 7L, "v1"), ("row1", "g", "c2", 7L, "w1"),
      ("row2", "f", "c1", 7L, "v2"), ("row2", "g", "c2", 7L, "w2"),
      ("row3", "f", "c1", 7L, "v3"), ("row3", "g", "c2", 7L, "w3")))
  }

  test("asOfJoin picks latest right row with ts <= left ts, per key") {
    import org.apache.spark.sql.functions.col
    val left = Seq((1L, 10L, "o1"), (1L, 25L, "o2"), (2L, 5L, "o3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 10L, "e10"), (1L, 20L, "e20"), (1L, 30L, "e30"),
      (2L, 7L, "e7"))
      .toDF("rk", "rt", "ev")
    val out = Jobs.asOfJoin(left, right,
      col("k"), col("rk"), col("t"), col("rt"), Seq("ev"))
      .collect().map(r => (r.getAs[String]("name"), r.getAs[String]("ev"))).toSet
    // o1: equal-ts right row visible (>= semantics); o3: no event <= 5
    assert(out == Set(("o1", "e10"), ("o2", "e20"), ("o3", null)))
  }

  test("groupingKey concatenates chosen column values space-joined") {
    val resolved = Resolve(fixture())
    val keys = Jobs.groupingKey(resolved, "f", Seq(b("a"), b("b")))
      .collect().map(r => (new String(r.getAs[Array[Byte]]("row"), "UTF-8"),
        r.getAs[String]("groupKey"))).toSet
    assert(keys == Set(("r1", "x y"))) // r2 lacks column b -> skipped like the mapper
  }
}
