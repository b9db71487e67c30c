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

  test("importJson: key field, nested values as JSON, bad-line counting") {
    val dir = Files.createTempDirectory("graft-json").toString
    val p = java.nio.file.Paths.get(dir, "in.json")
    java.nio.file.Files.writeString(p,
      """{"id": "a", "name": "x", "meta": {"k": 1}}
        |{"id": "b", "name": "y", "tags": ["t1", "t2"]}
        |{"name": "keyless"}
        |not json
        |""".stripMargin)
    val (cellsDf, bad) = Jobs.importJson(spark, p.toString,
      family = "d", rowKeyField = "id", ts = 5L)
    assert(bad == 2L)
    val out = collectCells(cellsDf)
    assert(out == Set(
      ("a", "d", "name", 5L, "x"), ("a", "d", "meta", 5L, """{"k":1}"""),
      ("b", "d", "name", 5L, "y"), ("b", "d", "tags", 5L, """["t1","t2"]""")))
    // explicit schema: inference pass skipped, absent fields -> no cells
    val sc = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType)))
    val (cells2, bad2) = Jobs.importJson(spark, p.toString,
      family = "d", rowKeyField = "id", ts = 5L, schema = Some(sc))
    assert(bad2 == 2L)
    assert(collectCells(cells2) ==
      Set(("a", "d", "name", 5L, "x"), ("b", "d", "name", 5L, "y")))
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

  test("intervalJoin: inclusive bounds, multi-bin intervals, hot-key plan") {
    import org.apache.spark.sql.functions.col
    // intervals span several bins (binWidth=10 vs width-25 interval) and
    // points sit exactly ON both bounds — the binned rewrite must agree
    // with the plain range predicate everywhere, including boundaries
    val pts = Seq((1L, 0L, "p0"), (1L, 10L, "p10"), (1L, 35L, "p35"),
      (1L, 36L, "p36"), (2L, 10L, "q10"), (3L, 50L, "x50"))
      .toDF("k", "t", "name")
    val ivs = Seq((1L, 10L, 35L, "A"), (2L, 0L, 100L, "B"), (2L, 11L, 12L, "C"),
      (3L, 60L, 40L, "rev")) // end < start -> no pairs
      .toDF("rk", "s", "e", "iv")
    val joined = Jobs.intervalJoin(pts, ivs, col("k"), col("rk"),
      col("t"), col("s"), col("e"), binWidth = 10L)
    val out = joined.collect()
      .map(r => (r.getStruct(0).getAs[String]("name"),
        r.getStruct(1).getAs[String]("iv"))).toSet
    assert(out == Set(("p10", "A"), ("p35", "A"), ("q10", "B")))
    // naive-equivalence on the same data
    val naive = pts.join(ivs, col("k") === col("rk") &&
        col("t") >= col("s") && col("t") <= col("e"))
      .collect().map(r => (r.getAs[String]("name"), r.getAs[String]("iv"))).toSet
    assert(out == naive)
    // the join must be a pure equi-join on (key, bin): no cartesian, no
    // broadcast-nested-loop (the shapes a residual range join degrades to)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // epoch-nanos magnitudes: bin arithmetic must be integral (no double
    // rounding) — a point on an interval bound at ~1.7e18 still matches
    val bigT = 1704067200L * 1000000000L
    val bigOut = Jobs.intervalJoin(
      Seq((1L, bigT, "bp")).toDF("k", "t", "name"),
      Seq((1L, bigT, bigT + 3600L * 1000000000L, "BW")).toDF("rk", "s", "e", "iv"),
      col("k"), col("rk"), col("t"), col("s"), col("e"),
      binWidth = 3600L * 1000000000L).count()
    assert(bigOut == 1L)
    // over-wide interval fails loudly, not silently exploding
    val wide = Jobs.intervalJoin(pts, ivs, col("k"), col("rk"),
      col("t"), col("s"), col("e"), binWidth = 10L, maxBinsPerRow = 2)
    intercept[Exception] { wide.count() }
  }

  test("intervalJoin property: binned == naive on random data, varied binWidths") {
    import org.apache.spark.sql.functions.col
    // collision-rich random keyspace; negative times included (truncating
    // div bins differ from floor bins there — correctness must not depend
    // on the bin function beyond monotonicity)
    for (seed <- Seq(3L, 99L, 2024L)) {
      val rnd = new scala.util.Random(seed)
      val pts = (1 to 120).map(i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.between(-100L, 100L)))
        .toDF("id", "k", "t")
      val ivs = (1 to 60).map(i =>
        { val s = rnd.between(-100L, 100L)
          (i.toLong, rnd.nextInt(5).toLong, s, s + rnd.between(0L, 40L)) })
        .toDF("iid", "rk", "s", "e")
      val naive = pts.join(ivs, col("k") === col("rk") &&
          col("t") >= col("s") && col("t") <= col("e"))
        .select("id", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for (bw <- Seq(3L, 17L, 1000L)) {
        val binned = Jobs.intervalJoin(pts, ivs, col("k"), col("rk"),
          col("t"), col("s"), col("e"), binWidth = bw)
          .select(col("_l.id"), col("_r.iid")).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        // exact multiset equality: no missed pairs AND no bin-overlap dups
        assert(binned.length == binned.toSet.size, s"seed=$seed bw=$bw dup pairs")
        assert(binned.toSet == naive, s"seed=$seed bw=$bw")
      }
    }
  }

  test("groupingKey concatenates chosen column values space-joined") {
    val resolved = Resolve(fixture())
    val keys = Jobs.groupingKey(resolved, "f", Seq(b("a"), b("b")))
      .collect().map(r => (new String(r.getAs[Array[Byte]]("row"), "UTF-8"),
        r.getAs[String]("groupKey"))).toSet
    assert(keys == Set(("r1", "x y"))) // r2 lacks column b -> skipped like the mapper
  }
}
