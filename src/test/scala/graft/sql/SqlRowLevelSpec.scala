package graft.sql

import graft.{Graft, SparkSpec}
import graft.catalog.{FamilyDescriptor, TableDescriptor}
import graft.core.Bytes
import graft.write.Put
import java.nio.file.Files

/** SQL UPDATE / MERGE INTO / predicate-general DELETE through the DSv2
  * row-level-operation door (delta-based checkAndMutate shape). */
class SqlRowLevelSpec extends SparkSpec {

  private def b(s: String) = Bytes.toBytes(s)
  private def hex(s: String) = "X'" + s.getBytes("UTF-8").map("%02X".format(_)).mkString + "'"

  private def freshTable(name: String): (String, Graft) = {
    val r = Files.createTempDirectory(s"graft-rl-$name").toString
    val g = Graft(spark, r)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")), splitKeys = 4), 1L)
    g.table("t").put((1 to 20).map(i =>
      Put(b(f"r$i%03d")).add("f", b("q"), b(s"v$i")).add("f", b("p"), b(s"u$i"))), 2L)
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", r)
    (r, g)
  }

  test("UPDATE writes a new Put version for matched cells only") {
    val (_, g) = freshTable("rl_upd")
    spark.sql(s"""UPDATE rl_upd.t SET value = ${hex("FIXED")}
                  WHERE row >= ${hex("r005")} AND row < ${hex("r010")}
                    AND qualifier = ${hex("q")}""")
    val out = collectCells(
      spark.sql("SELECT row, family, qualifier, ts, value FROM rl_upd.t"))
    // 5 rows' f:q updated; their f:p and everything else untouched
    assert(out.count(_._5 == "FIXED") == 5)
    (5 until 10).foreach { i =>
      assert(out.exists(c => c._1 == f"r$i%03d" && c._3 == "q" && c._5 == "FIXED"))
      assert(out.exists(c => c._1 == f"r$i%03d" && c._3 == "p" && c._5 == s"u$i"))
    }
    assert(out.exists(c => c._1 == "r004" && c._3 == "q" && c._5 == "v4"))
    // the update is a NEW version stamped after the old cell, not a rewrite:
    // the pre-update snapshotless history still holds v5 at ts=2
    val raw = collectCells(g.catalog.read("t")
      .select("row", "family", "qualifier", "ts", "value"))
    assert(raw.contains(("r005", "f", "q", 2L, "v5")))
    assert(raw.exists(c => c._1 == "r005" && c._3 == "q" && c._4 > 2L && c._5 == "FIXED"))
  }

  test("UPDATE with a non-sargable predicate matches on resolved values") {
    val (_, _) = freshTable("rl_upd2")
    spark.sql(s"""UPDATE rl_upd2.t SET value = ${hex("X")}
                  WHERE value = ${hex("v7")}""")
    val out = collectCells(
      spark.sql("SELECT row, family, qualifier, ts, value FROM rl_upd2.t"))
    assert(out.count(_._5 == "X") == 1)
    assert(out.exists(c => c._1 == "r007" && c._3 == "q" && c._5 == "X"))
    assert(out.exists(c => c._1 == "r007" && c._3 == "p" && c._5 == "u7"))
  }

  test("DELETE with a non-sargable predicate tombstones just the matched cell") {
    val (_, _) = freshTable("rl_del")
    spark.sql(s"DELETE FROM rl_del.t WHERE value = ${hex("v3")}")
    val out = collectCells(
      spark.sql("SELECT row, family, qualifier, ts, value FROM rl_del.t"))
    assert(!out.exists(c => c._1 == "r003" && c._3 == "q"))
    assert(out.exists(c => c._1 == "r003" && c._3 == "p" && c._5 == "u3"))
    assert(out.size == 39, out.size)
  }

  test("MERGE INTO: matched cells update, unmatched source rows insert") {
    val (_, _) = freshTable("rl_mrg")
    import spark.implicits._
    val src = Seq(
      // matches r001 f:q -> update
      (b("r001"), "f", b("q"), 100L, graft.core.CellKind.Put, b("MERGED"), 0L),
      // no such row -> insert (LatestTimestamp sentinel -> commit stamp)
      (b("r999"), "f", b("q"), graft.core.Cell.LatestTimestamp,
        graft.core.CellKind.Put, b("NEW"), 0L))
      .toDF("row", "family", "qualifier", "ts", "kind", "value", "seq")
    src.createOrReplaceTempView("rl_mrg_src")
    spark.sql("""MERGE INTO rl_mrg.t t USING rl_mrg_src s
                 ON t.row = s.row AND t.family = s.family
                    AND t.qualifier = s.qualifier
                 WHEN MATCHED THEN UPDATE SET value = s.value
                 WHEN NOT MATCHED THEN INSERT
                   (row, family, qualifier, ts, kind, value, seq)
                   VALUES (s.row, s.family, s.qualifier, s.ts, s.kind, s.value, s.seq)""")
    val out = collectCells(
      spark.sql("SELECT row, family, qualifier, ts, value FROM rl_mrg.t"))
    assert(out.exists(c => c._1 == "r001" && c._3 == "q" && c._5 == "MERGED"))
    assert(out.exists(c => c._1 == "r999" && c._3 == "q" && c._5 == "NEW"))
    assert(out.exists(c => c._1 == "r001" && c._3 == "p" && c._5 == "u1"))
    assert(out.size == 41, out.size)
  }

  test("UPDATE's matched-row scan pushes row bounds to the source") {
    val (_, _) = freshTable("rl_plan")
    val plan = spark.sql(
      s"""EXPLAIN FORMATTED UPDATE rl_plan.t SET value = ${hex("X")}
          WHERE row >= ${hex("r005")} AND row < ${hex("r010")}""")
      .collect().map(_.getString(0)).mkString("\n")
    // the row-level operation reuses GraftScanBuilder, so the UPDATE's
    // read side carries the pushed row bounds — an UPDATE of a bounded
    // range must read the bounded range, not the table
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("row"), s"no pushed row bounds in:\n$plan")
  }

  test("UPDATE is rejected on a time-travel view") {
    val (_, _) = freshTable("rl_tt")
    val e = intercept[Exception] {
      spark.sql(s"""UPDATE rl_tt.t VERSION AS OF 1
                    SET value = ${hex("X")} WHERE value = ${hex("v1")}""")
    }
    assert(e.getMessage != null)
  }
}
