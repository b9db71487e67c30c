package graft.read

import graft.{Graft, SparkSpec}
import graft.catalog.{FamilyDescriptor, TableDescriptor}
import graft.core.Bytes
import graft.write.Put
import java.nio.file.Files

/** Plan-quality assertions (SURVEY §4): the scan path must keep Catalyst
  * pushdown — row-range and family predicates reach the parquet source as
  * PushedFilters (region/family pruning), and the resolve pipeline plans
  * exactly one exchange. These are the properties that decide whether the
  * design survives 100 TB, asserted on the actual physical plan. */
class PlanSpec extends SparkSpec {

  private def b(s: String) = Bytes.toBytes(s)

  private lazy val g: Graft = {
    val gg = Graft(spark, Files.createTempDirectory("graft-plan").toString)
    gg.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f"), FamilyDescriptor("g")), splitKeys = 4), 1L)
    gg.table("t").put((1 to 100).map(i =>
      Put(b(f"r$i%03d")).add("f", b("q"), b(s"v$i")).add("g", b("q"), b(s"w$i"))), 2L)
    gg
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString("UTF-8")
  }

  test("row range + family projection are pushed to the parquet scan") {
    val scan = Scan()
      .setStartRow(b("r010")).setStopRow(b("r020")).addFamily("f")
    val plan = planOf(g.table("t").scan(scan))
    assert(plan.contains("PushedFilters"), plan)
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("row") && pushed.contains("family"), pushed)
    assert(pushed.contains("GreaterThanOrEqual") || pushed.contains("IsNotNull"), pushed)
  }

  test("multiGet batch key-span bounds reach the parquet scan") {
    val plan = planOf(g.table("t").multiGet(Seq(b("r010"), b("r050"))))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(row") &&
      pushed.contains("LessThan(row"), pushed)
  }

  test("multiGet intersects caller row bounds with the batch key span") {
    // caller restricts the scan to [r020, r060); batch keys outside the
    // bounds must NOT widen them back (tighten-only intersection)
    val bounded = Scan().setStartRow(b("r020")).setStopRow(b("r060"))
    val got = g.table("t")
      .multiGet(Seq(b("r010"), b("r030"), b("r050"), b("r090")), bounded)
    val rows = collectCells(got).map(_._1)
    assert(rows == Set("r030", "r050"), rows)
  }

  test("resolve plans exactly one exchange (single (row,family) clustering)") {
    val plan = planOf(Resolve(g.table("t").cells, ReadView(maxVersions = 2)))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("column pruning: a projection that needs 2 columns reads 2 columns") {
    val df = g.table("t").cells.select("row", "ts")
    val plan = planOf(df)
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("row") && readSchema.contains("ts"), readSchema)
    assert(!readSchema.contains("value"), readSchema)
  }
}
