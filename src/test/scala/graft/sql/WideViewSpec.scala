package graft.sql

import graft.{Graft, SparkSpec}
import graft.catalog.{FamilyDescriptor, TableDescriptor}
import graft.core.Bytes
import graft.write.{Delete, Put}
import java.nio.file.Files
import org.apache.spark.sql.functions.col

/** The declared relational (wide) view `t$wide`: typed decode through
  * the SQL door, with predicates routing through registered indexes —
  * including the covered-projection form the cell schema cannot
  * express. */
class WideViewSpec extends SparkSpec {

  private def b(s: String) = Bytes.toBytes(s)

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString

  /** orders-like fixture: key k:long, columns city:string, pop:long. */
  private def mkTable(root: String, saltBuckets: Int = 0,
      immutable: Boolean = true): Graft = {
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, saltBuckets = saltBuckets, immutableRows = immutable,
      wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;f:pop:long")), 1L)
    g.table("t").put((1 to 40).map(i =>
      Put(Bytes.toBytes(i.toLong))
        .add("f", b("city"), 2L, b(if (i % 10 == 3) "paris" else s"other$i"))
        .add("f", b("pop"), 2L, Bytes.toBytes(i.toLong * 10))), 2L)
    g
  }

  private def register(cat: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("wide view decodes typed rows; key bounds prune the scan") {
    val root = freshRoot("wide")
    mkTable(root)
    register("gw", root)
    val all = spark.sql("SELECT k, city, pop FROM gw.`t$wide` ORDER BY k")
    assert(all.count() == 40)
    assert(rowsOf(all).contains((13L, "paris", 130L)))
    // key range: bounds recorded below the bridge + residual exactness
    val ranged = spark.sql(
      "SELECT k, city, pop FROM gw.`t$wide` WHERE k >= 10 AND k < 20 ORDER BY k")
    assert(ranged.collect().map(_.getLong(0)).toSeq == (10L until 20L))
    // key equality
    assert(rowsOf(spark.sql(
      "SELECT k, city, pop FROM gw.`t$wide` WHERE k = 7"))
      == Set((7L, "other7", 70L)))
  }

  test("undeclared wide view does not resolve; bad declarations fail DDL") {
    val root = freshRoot("widenone")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("plain", Seq(FamilyDescriptor("f"))), 1L)
    register("gwn", root)
    intercept[Exception] { spark.sql("SELECT * FROM gwn.`plain$wide`") }
    intercept[Exception] {
      spark.sql("CREATE TABLE gwn.bad TBLPROPERTIES('families'='f', " +
        "'wideKey'='k:long', 'wideSchema'='f:c:nosuchtype')")
    }
  }

  test("an indexed predicate routes through the verified index path") {
    val root = freshRoot("wideix")
    val g = mkTable(root)
    g.createIndex("t", "f", b("city"), 3L)
    register("gwi", root)
    val out = spark.sql(
      "SELECT k, city, pop FROM gwi.`t$wide` WHERE city = 'paris' ORDER BY k")
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(3L, 13L, 23L, 33L))
    // seam: the route fires; a scan without predicates does not
    val engine = new graft.catalog.Catalog(spark, root)
    val spec = WideSpec.parse(Some("k:long"), Some("f:city:string;f:pop:long"))
    import org.apache.spark.sql.sources
    def built(filters: Array[sources.Filter]): GraftWideScan = {
      val bld = new GraftWideScanBuilder(engine, "t", spec, engine.currentManifest("t"))
      bld.pushFilters(filters)
      bld.build().asInstanceOf[GraftWideScan]
    }
    val routed = built(Array(sources.EqualTo("city", "paris")))
    assert(routed.usedIndexTable.exists(_.startsWith("t_idx_f_")))
    assert(!routed.indexOnly) // pop is not covered
    assert(built(Array.empty).usedIndexTable.isEmpty)
    // a range predicate on the indexed string column routes too
    assert(built(Array(sources.GreaterThanOrEqual("city", "paris"),
      sources.LessThan("city", "parit"))).usedIndexTable.isDefined)
    // stale-entry safety comes from the verified read: delete a row,
    // no rebuild — it must disappear from the wide answer
    g.table("t").delete(Seq(Delete(Bytes.toBytes(13L)).deleteFamily("f", 4L)), 4L)
    assert(spark.sql("SELECT k FROM gwi.`t$wide` WHERE city = 'paris'")
      .collect().map(_.getLong(0)).toSet == Set(3L, 23L, 33L))
  }

  test("covered index answers the wide covered-projection query index-only") {
    val root = freshRoot("widecov")
    val g = mkTable(root)
    g.createIndex("t", "f", b("city"), 3L, covered = Seq("f" -> b("pop")))
    register("gwc", root)
    val q = "SELECT k, pop FROM gwc.`t$wide` WHERE city = 'paris' ORDER BY k"
    val out = spark.sql(q)
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq(3L -> 30L, 13L -> 130L, 23L -> 230L, 33L -> 330L))
    // seam: index-only — zero main-table touch
    val engine = new graft.catalog.Catalog(spark, root)
    val spec = WideSpec.parse(Some("k:long"), Some("f:city:string;f:pop:long"))
    import org.apache.spark.sql.sources
    val bld = new GraftWideScanBuilder(engine, "t", spec, engine.currentManifest("t"))
    bld.pushFilters(Array(sources.EqualTo("city", "paris")))
    bld.pruneColumns(org.apache.spark.sql.types.StructType(
      spec.schema.filter(f => Seq("k", "pop", "city").contains(f.name))))
    val scan = bld.build().asInstanceOf[GraftWideScan]
    assert(scan.indexOnly, "covered projection did not go index-only")
    val plan = scan.resolvedFrame(spark).queryExecution.executedPlan.toString
    assert(!plan.contains(root + "/t/"),
      s"wide covered projection scanned the main table:\n$plan")
    // a synchronous delete is visible with no rebuild
    g.table("t").delete(Seq(Delete(Bytes.toBytes(3L)).deleteFamily("f", 4L)), 4L)
    assert(spark.sql(q).collect().map(_.getLong(0)).toSet == Set(13L, 23L, 33L))
  }

  test("row set does not depend on the projection (absent columns are null)") {
    val root = freshRoot("widesparse")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;f:pop:long")), 1L)
    // r1 has only city; r2 has only pop
    g.table("t").put(Seq(
      Put(Bytes.toBytes(1L)).add("f", b("city"), 2L, b("paris")),
      Put(Bytes.toBytes(2L)).add("f", b("pop"), 2L, Bytes.toBytes(99L))), 2L)
    register("gws", root)
    // projecting ONLY pop must still return r1 (null pop), because no
    // recorded predicate implies pop is non-null
    val out = spark.sql("SELECT k, pop FROM gws.`t$wide` ORDER BY k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).isNullAt(1) && out(1).getLong(1) == 99L)
    // a predicate on city legitimately drops r2 (null city never matches)
    assert(spark.sql(
      "SELECT k FROM gws.`t$wide` WHERE city = 'paris'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("wide view over a salted table: logical keys, bounds, index route") {
    val root = freshRoot("widesalt")
    val g = mkTable(root, saltBuckets = 8)
    g.createIndex("t", "f", b("city"), 3L)
    register("gwsl", root)
    val ranged = spark.sql(
      "SELECT k, city, pop FROM gwsl.`t$wide` WHERE k >= 10 AND k < 20 ORDER BY k")
    assert(ranged.collect().map(_.getLong(0)).toSeq == (10L until 20L))
    assert(spark.sql("SELECT k FROM gwsl.`t$wide` WHERE city = 'paris'")
      .collect().map(_.getLong(0)).toSet == Set(3L, 13L, 23L, 33L))
  }

  test("conjunctive equality picks the composite route over single-column") {
    val root = freshRoot("widecomp")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f", maxVersions = 1)),
      splitKeys = 2, immutableRows = true,
      wideKey = Some("k:string"),
      wideSchema = Some("f:city:string;f:tier:string;f:pop:string")), 1L)
    g.table("t").put(Seq(
      Put(b("r1")).add("f", b("city"), 2L, b("paris"))
        .add("f", b("tier"), 2L, b("gold")).add("f", b("pop"), 2L, b("2m")),
      Put(b("r2")).add("f", b("city"), 2L, b("paris"))
        .add("f", b("tier"), 2L, b("iron"))), 2L)
    val cols = Seq("f" -> b("city"), "f" -> b("tier"))
    g.createCompositeIndex("t", cols, 3L)
    g.createIndex("t", "f", b("city"), 4L) // a single-column rival
    val engine = g.catalog
    val spec = WideSpec.parse(Some("k:string"),
      Some("f:city:string;f:tier:string;f:pop:string"))
    import org.apache.spark.sql.sources
    def built(filters: Array[sources.Filter]): GraftWideScan = {
      val bld = new GraftWideScanBuilder(engine, "t", spec, engine.currentManifest("t"))
      bld.pushFilters(filters)
      bld.build().asInstanceOf[GraftWideScan]
    }
    // both equalities -> composite wins over the single-column index
    val both = built(Array(sources.EqualTo("city", "paris"),
      sources.EqualTo("tier", "gold")))
    assert(both.usedIndexTable.exists(_.contains("_cidx_")))
    val out = both.resolvedFrame(spark).collect()
      .map(r => (r.getAs[String]("k"), r.getAs[String]("pop"))).toSet
    assert(out == Set(("r1", "2m")))
    // one equality -> the single-column route
    assert(built(Array(sources.EqualTo("city", "paris")))
      .usedIndexTable.exists(_.contains("_idx_")))
    // a BOUNDED IN-list member routes through the composite too: the
    // probed blobs are the lists' cartesian in ONE probe pass
    val inBoth = built(Array(sources.In("city", Array("paris", "tokyo")),
      sources.EqualTo("tier", "gold")))
    assert(inBoth.usedIndexTable.exists(_.contains("_cidx_")),
      "IN-list member did not route through the composite")
    assert(inBoth.resolvedFrame(spark).collect()
      .map(r => (r.getAs[String]("k"), r.getAs[String]("pop"))).toSet
      == Set(("r1", "2m")))
    // an OVER-BUDGET IN cartesian falls back to the single-column route
    val big = (1 to 100).map(i => s"c$i").toArray[Any] :+ "paris"
    assert(built(Array(sources.In("city", big),
      sources.EqualTo("tier", "gold")))
      .usedIndexTable.exists(_.contains("_idx_")))
    // a TRAILING member alone routes nowhere (its value sits mid-key)
    assert(built(Array(sources.EqualTo("tier", "gold")))
      .usedIndexTable.isEmpty)
  }

  test("leading member of a composite serves equality alone (no single index)") {
    val root = freshRoot("widelead")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f", maxVersions = 1)),
      splitKeys = 2, immutableRows = true,
      wideKey = Some("k:string"),
      wideSchema = Some("f:city:string;f:tier:string")), 1L)
    g.table("t").put(Seq(
      Put(b("r1")).add("f", b("city"), 2L, b("paris"))
        .add("f", b("tier"), 2L, b("gold")),
      Put(b("r2")).add("f", b("city"), 2L, b("tokyo"))
        .add("f", b("tier"), 2L, b("gold"))), 2L)
    g.createCompositeIndex("t",
      Seq("f" -> b("city"), "f" -> b("tier")), 3L)
    val spec = WideSpec.parse(Some("k:string"), Some("f:city:string;f:tier:string"))
    import org.apache.spark.sql.sources
    val bld = new GraftWideScanBuilder(g.catalog, "t", spec, g.catalog.currentManifest("t"))
    bld.pushFilters(Array(sources.EqualTo("city", "paris")))
    val scan = bld.build().asInstanceOf[GraftWideScan]
    assert(scan.usedIndexTable.exists(_.contains("_cidx_")),
      "leading-member equality did not reuse the composite index")
    assert(scan.resolvedFrame(spark).collect().map(_.getString(0)).toSeq
      == Seq("r1"))
    // a RANGE on the leading member routes through the LOOSE probe (the
    // verified lookup re-checks the interval); rows with the trailing
    // member missing are still found (left-outer tuple join)
    g.table("t").put(Seq(
      Put(b("r3")).add("f", b("city"), 3L, b("rome"))), 3L)
    val bld2 = new GraftWideScanBuilder(g.catalog, "t", spec, g.catalog.currentManifest("t"))
    bld2.pushFilters(Array(sources.GreaterThanOrEqual("city", "paris")))
    val scan2 = bld2.build().asInstanceOf[GraftWideScan]
    assert(scan2.usedIndexTable.exists(_.contains("_cidx_")),
      "leading-member range did not reuse the composite index")
    assert(scan2.resolvedFrame(spark).collect()
      .map(r => (r.getString(0), Option(r.getString(2)))).toSet
      == Set(("r1", Some("gold")), ("r2", Some("gold")), ("r3", None)))
  }

  test("aggregate pushdown on the wide view runs inside the inner plan") {
    val root = freshRoot("wideagg")
    mkTable(root)
    register("gwa", root)
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    def pushed(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.isEmpty
    // grouped COUNT over the whole table: no residual filters, pushes
    val grouped = spark.sql("SELECT city, count(*) AS cnt " +
      "FROM gwa.`t$wide` GROUP BY city ORDER BY city")
    assert(pushed(grouped), s"unfiltered grouped agg was not pushed:\n${
      grouped.queryExecution.optimizedPlan}")
    assert(grouped.collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(_._1 == "paris").toSeq == Seq("paris" -> 4L))
    // key EQUALITY on a fixed-width head is accepted (exact byte-prefix
    // range), so the agg under it pushes too
    val eq = spark.sql("SELECT count(*) AS cnt, min(pop) AS mn " +
      "FROM gwa.`t$wide` WHERE k = 13")
    assert(pushed(eq), s"agg under key equality was not pushed:\n${
      eq.queryExecution.optimizedPlan}")
    assert(eq.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 130L)))
    // a RANGE on a plain long head stays residual (negative-key byte
    // order) — the agg falls back above the bridge and stays correct
    val ranged = spark.sql("SELECT count(*) AS cnt FROM gwa.`t$wide` " +
      "WHERE k >= 10 AND k < 20")
    assert(!pushed(ranged))
    assert(ranged.collect()(0).getLong(0) == 10L)
    // SUM/AVG on exact integral columns push completely (result types
    // mirror Spark's own Sum/Average resolution)
    val sum = spark.sql("SELECT city, sum(pop) AS s, avg(pop) AS a " +
      "FROM gwa.`t$wide` GROUP BY city ORDER BY city")
    assert(pushed(sum), s"sum/avg agg was not pushed:\n${
      sum.queryExecution.optimizedPlan}")
    assert(sum.collect().filter(_.getString(0) == "paris")
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
      == Seq((30L + 130L + 230L + 330L, (30L + 130L + 230L + 330L) / 4.0)))
    // DISTINCT aggregates fall back and stay correct
    val dsum = spark.sql("SELECT sum(DISTINCT pop) AS s FROM gwa.`t$wide`")
    assert(!pushed(dsum))
    assert(dsum.collect()(0).getLong(0) == (1 to 40).map(_ * 10L).sum)
  }

  test("ordered key head: range-pruned aggregates push completely") {
    val root = freshRoot("wideaggord")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:olong"),
      wideSchema = Some("f:pop:long")), 1L)
    g.table("t").put((-5L to 10L).map(k =>
      Put(Bytes.toBytesOrdered(k)).add("f", b("pop"), 2L,
        Bytes.toBytes(k * 10 + 1000))), 2L)
    register("gwao", root)
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    // comparisons on an olong head are accepted (order-preserving over
    // the full signed range) — the VERDICT ask: `count(*) WHERE
    // key-range` converts ONE row through the bridge, key-range-pruned
    val agg = spark.sql("SELECT count(*) AS cnt, min(pop) AS mn, " +
      "max(pop) AS mx FROM gwao.`t$wide` WHERE k >= -3 AND k < 4")
    assert(agg.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
      .isEmpty, s"range agg on ordered key was not pushed:\n${
        agg.queryExecution.optimizedPlan}")
    assert(agg.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((7L, 970L, 1030L)))
    // exactness of the accepted bounds themselves (no residual safety
    // net anymore): the plain SELECT under the same range
    assert(spark.sql("SELECT k FROM gwao.`t$wide` WHERE k > -3 AND k <= 4 " +
      "ORDER BY k").collect().map(_.getLong(0)).toSeq
      == (-2L to 4L))
    // an accepted key-head IN (the multiGet shape) leaves no residual, so
    // aggregates still push — and the probes, not the [min, max]
    // envelope, define the counted set (9 keys between -3 and 9 are
    // outside the IN list and must not count)
    val aggIn = spark.sql("SELECT count(*) AS cnt, min(pop) AS mn " +
      "FROM gwao.`t$wide` WHERE k IN (-3, 0, 9, 77)")
    assert(aggIn.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
      .isEmpty, s"IN agg was not pushed:\n${aggIn.queryExecution.optimizedPlan}")
    assert(aggIn.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((3L, 970L)))
  }

  test("ORDER BY + LIMIT runs as top-k inside the inner plan") {
    val root = freshRoot("widetopn")
    val g = mkTable(root)
    register("gwt", root)
    // end-to-end correctness through the SQL door
    val q = spark.sql("SELECT k, pop FROM gwt.`t$wide` ORDER BY pop DESC LIMIT 3")
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((40L, 400L), (39L, 390L), (38L, 380L)))
    // seam: the builder accepts a plain-column top-k, and the inner plan
    // is a TakeOrderedAndProject (per-partition top-k + merge — no full
    // sort, k rows cross the bridge)
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
    val sp2 = WideSpec.parse(Some("k:long"), Some("f:city:string;f:pop:long"))
    val m = g.catalog.currentManifest("t")
    val bld = new GraftWideScanBuilder(g.catalog, "t", sp2, m)
    assert(bld.pushTopN(
      Array(Expressions.sort(Expressions.column("pop"), SortDirection.DESCENDING)), 3))
    val scan = bld.build().asInstanceOf[GraftWideScan]
    assert(scan.pushedTopN.isDefined)
    assert(scan.resolvedFrame(spark).queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    // a non-column sort key is refused (stays above the bridge)
    val bld2 = new GraftWideScanBuilder(g.catalog, "t", sp2, m)
    assert(!bld2.pushTopN(
      Array(Expressions.sort(Expressions.column("nope"), SortDirection.ASCENDING)), 3))
  }

  test("wide scans report manifest-size statistics to the optimizer") {
    val root = freshRoot("widestats")
    val g = mkTable(root)
    register("gwst", root)
    val sp2 = WideSpec.parse(Some("k:long"), Some("f:city:string;f:pop:long"))
    val m = g.catalog.currentManifest("t")
    val scan = new GraftWideScanBuilder(g.catalog, "t", sp2, m)
      .build().asInstanceOf[GraftWideScan]
    val st = scan.estimateStatistics()
    assert(st.sizeInBytes.isPresent &&
      st.sizeInBytes.getAsLong == g.catalog.manifestBytes(m))
    // the optimizer sees the small size (not the huge DSv2 default), so
    // the wide view is a broadcast candidate in joins
    val logical = spark.sql("SELECT k, pop FROM gwst.`t$wide`")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(logical > 0 && logical < 10L * 1024 * 1024, logical)
  }

  test("VERSION AS OF pins the wide view; pinned views are read-only and unrouted") {
    val root = freshRoot("widetravel")
    val g = mkTable(root) // v2 = the initial 40 rows
    register("gwtt", root)
    // v3: overwrite row 7's city
    g.table("t").put(Seq(Put(Bytes.toBytes(7L))
      .add("f", b("city"), 3L, b("newtown"))), 3L)
    assert(spark.sql("SELECT city FROM gwtt.`t$wide` WHERE k = 7")
      .collect().head.getString(0) == "newtown")
    assert(spark.sql("SELECT city FROM gwtt.`t$wide` VERSION AS OF 2 WHERE k = 7")
      .collect().head.getString(0) == "other7")
    // a pinned wide view never index-routes (live index, pinned data)
    g.createIndex("t", "f", b("city"), 4L)
    val sp = WideSpec.parse(Some("k:long"), Some("f:city:string;f:pop:long"))
    import org.apache.spark.sql.sources
    val bld = new GraftWideScanBuilder(g.catalog, "t", sp,
      g.catalog.manifestAt("t", 2L), timeTravel = true)
    bld.pushFilters(Array(sources.EqualTo("city", "paris")))
    assert(bld.build().asInstanceOf[GraftWideScan].usedIndexTable.isEmpty)
    // ... while the live view does route, and writes to a pinned view fail
    val bld2 = new GraftWideScanBuilder(g.catalog, "t", sp,
      g.catalog.currentManifest("t"))
    bld2.pushFilters(Array(sources.EqualTo("city", "paris")))
    assert(bld2.build().asInstanceOf[GraftWideScan].usedIndexTable.isDefined)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gwtt.`t$wide` VERSION AS OF 2 VALUES (99, 'x', 1)")
    }
    assert(e.getMessage != null)
  }

  test("sargable wide DELETEs take the metadata tombstone path") {
    val root = freshRoot("widemdel")
    val g = Graft(spark, root)
    // olong key: range comparisons are provably exact, so they qualify
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:olong"),
      wideSchema = Some("f:pop:long")), 1L)
    g.table("t").put((-5 to 5).map(i =>
      Put(Bytes.toBytesOrdered(i.toLong))
        .add("f", b("pop"), 2L, Bytes.toBytes(i.toLong * 10))), 2L)
    register("gwmd", root)
    import org.apache.spark.sql.sources
    val tbl = new GraftWideTable(g.catalog, "t")
    // exact subsets qualify; a value-column predicate or a plain-long
    // range (negative keys leak into the byte range) does not
    assert(tbl.canDeleteWhere(Array[sources.Filter](
      sources.GreaterThanOrEqual("k", java.lang.Long.valueOf(-2L)),
      sources.LessThan("k", java.lang.Long.valueOf(3L)))))
    assert(!tbl.canDeleteWhere(Array[sources.Filter](
      sources.EqualTo("pop", java.lang.Long.valueOf(10L)))))
    // end-to-end: the range delete tombstones exactly [-2, 3)
    spark.sql("DELETE FROM gwmd.`t$wide` WHERE k >= -2 AND k < 3")
    assert(spark.sql("SELECT k FROM gwmd.`t$wide` ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(-5L, -4L, -3L, 3L, 4L, 5L))
    // path seam: metadata tombstones stamp each group's MAX CELL TS (2);
    // the row-level fallback would stamp the wall-clock commitMs
    val tombs = g.catalog.read("t")
      .filter(org.apache.spark.sql.functions.col("kind") ===
        graft.core.CellKind.DeleteFamily)
      .select("ts").collect().map(_.getLong(0)).toSeq
    assert(tombs.size == 5 && tombs.forall(_ == 2L), tombs)
  }

  test("key-head IN is the multiGet shape: probe scoping, exact delete set") {
    val root = freshRoot("widemget")
    val g = mkTable(root) // k:long, keys 1..40
    register("gwmg", root)
    import org.apache.spark.sql.sources
    val engine = g.catalog
    val spec = WideSpec.parse(Some("k:long"), Some("f:city:string;f:pop:long"))
    val bld = new GraftWideScanBuilder(engine, "t", spec,
      engine.currentManifest("t"))
    val residual = bld.pushFilters(Array[sources.Filter](
      sources.In("k", Array(3L, 13L, 999L).map(java.lang.Long.valueOf))))
    // ACCEPTED on the fixed-width head (each probe range holds exactly
    // its head == v rows), so Spark plans no re-filter
    assert(residual.isEmpty)
    val scan = bld.build().asInstanceOf[GraftWideScan]
    assert(scan.pushedKeyProbes.exists(_.size == 3))
    // the per-probe range disjunction reaches the parquet scan
    val plan = scan.resolvedFrame(spark).queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("Or(") && pushed.contains("row"), plan)
    // end-to-end: the probe filter IS the only filter (no residual)
    assert(spark.sql(
      "SELECT k, city, pop FROM gwmg.`t$wide` WHERE k IN (3, 13, 999)")
      .collect().map(_.getLong(0)).toSet == Set(3L, 13L))
    // salted single-part key: the multiGet scoping (JVM-side salted keys,
    // one pruned span + broadcast semi-join) returns the same logical rows
    val root2 = freshRoot("widemgets")
    mkTable(root2, saltBuckets = 8)
    register("gwmgs", root2)
    assert(spark.sql("SELECT k FROM gwmgs.`t$wide` WHERE k IN (3, 13, 999)")
      .collect().map(_.getLong(0)).toSet == Set(3L, 13L))
    // metadata DELETE with IN deletes the per-probe prefix ranges, NOT
    // the [min, succ(max)) envelope: keys BETWEEN the IN values survive
    val tbl = new GraftWideTable(engine, "t")
    assert(tbl.canDeleteWhere(Array[sources.Filter](
      sources.In("k",
        Array(java.lang.Long.valueOf(3L), java.lang.Long.valueOf(13L))))))
    spark.sql("DELETE FROM gwmg.`t$wide` WHERE k IN (3, 13)")
    val left = spark.sql("SELECT k FROM gwmg.`t$wide`")
      .collect().map(_.getLong(0)).toSet
    assert(!left.contains(3L) && !left.contains(13L))
    assert(left.contains(7L) && left.contains(10L) && left.size == 38, left)
  }

  test("planning a wide scan reads the manifest exactly once") {
    val root = freshRoot("widemeta")
    val g = mkTable(root)
    val engine = g.catalog
    val spec = WideSpec.parse(Some("k:long"), Some("f:city:string;f:pop:long"))
    import org.apache.spark.sql.sources
    // plain scan: the capture at newScanBuilder is the ONLY read —
    // spec/route/resolvedFrame all run off the captured manifest
    val before = engine.manifestReads.get()
    val m = engine.currentManifest("t")
    val bld = new GraftWideScanBuilder(engine, "t", spec, m)
    bld.pushFilters(Array(sources.GreaterThanOrEqual("k", 10L)))
    val scan = bld.build().asInstanceOf[GraftWideScan]
    scan.route; scan.usedIndexTable; scan.indexOnly
    scan.resolvedFrame(spark)
    assert(engine.manifestReads.get() - before == 1,
      s"wide scan build read the manifest ${engine.manifestReads.get() - before} times")
    // a routed scan adds exactly the index TABLE read (data access), not
    // repeated base-table metadata reads
    g.createIndex("t", "f", b("city"), 3L)
    val before2 = engine.manifestReads.get()
    val m2 = engine.currentManifest("t")
    val bld2 = new GraftWideScanBuilder(engine, "t", spec, m2)
    bld2.pushFilters(Array(sources.EqualTo("city", "paris")))
    val scan2 = bld2.build().asInstanceOf[GraftWideScan]
    assert(scan2.usedIndexTable.isDefined)
    scan2.resolvedFrame(spark)
    assert(engine.manifestReads.get() - before2 == 2,
      s"routed wide scan read ${engine.manifestReads.get() - before2} manifests")
  }

  test("odouble: a range on an indexed double column routes and is exact") {
    val root = freshRoot("wideod")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:price:odouble;f:city:string")), 1L)
    val prices = Seq(1L -> -2.5, 2L -> -0.5, 3L -> 0.25, 4L -> 3.5, 5L -> 99.0)
    g.table("t").put(prices.map { case (k, p) =>
      Put(Bytes.toBytes(k)).add("f", b("price"), 2L, Bytes.toBytesOrdered(p))
        .add("f", b("city"), 2L, b(s"c$k"))
    }, 2L)
    g.createIndex("t", "f", b("price"), 3L)
    register("gwod", root)
    // negative + fractional bounds — exactly what the plain IEEE encoding
    // cannot range-serve; decode must round-trip the ordered bytes
    val out = spark.sql("SELECT k, price FROM gwod.`t$wide` " +
      "WHERE price > -1.0 AND price < 1.0 ORDER BY k").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq
      == Seq(2L -> -0.5, 3L -> 0.25))
    // seam: the interval routes through the index
    val spec = WideSpec.parse(Some("k:long"),
      Some("f:price:odouble;f:city:string"))
    import org.apache.spark.sql.sources
    val bld = new GraftWideScanBuilder(g.catalog, "t", spec, g.catalog.currentManifest("t"))
    bld.pushFilters(Array(sources.GreaterThan("price", -1.0),
      sources.LessThan("price", 1.0)))
    assert(bld.build().asInstanceOf[GraftWideScan]
      .usedIndexTable.exists(_.startsWith("t_idx_f_")),
      "odouble interval did not route through the index")
    // a plain (non-ordered) double column must NOT route a range
    val plainSpec = WideSpec.parse(Some("k:long"),
      Some("f:price:double;f:city:string"))
    val bld2 = new GraftWideScanBuilder(g.catalog, "t", plainSpec, g.catalog.currentManifest("t"))
    bld2.pushFilters(Array(sources.GreaterThan("price", -1.0)))
    assert(bld2.build().asInstanceOf[GraftWideScan].usedIndexTable.isEmpty)
  }

  test("alterColumnCodec: plain->ordered migration re-encodes, flips the " +
      "declaration atomically, rebuilds the index, and routes") {
    // r10 ask 4: a PLAIN double column (signed ranges decline the index)
    // migrates to odouble through the compaction machinery — afterwards
    // the SAME signed-interval query routes (the sql_index_double_range
    // shape) with hash-identical results.
    val root = freshRoot("widemig")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:price:double;f:city:string")), 1L)
    val prices = Seq(1L -> -2.5, 2L -> -0.5, 3L -> 0.25, 4L -> 3.5, 5L -> 99.0)
    g.table("t").put(prices.map { case (k, p) =>
      Put(Bytes.toBytes(k)).add("f", b("price"), 2L, Bytes.toBytes(p))
        .add("f", b("city"), 2L, b(s"c$k"))
    }, 2L)
    g.createIndex("t", "f", b("price"), 3L)
    register("gwmig", root)
    val q = "SELECT k, price, city FROM gwmig.`t$wide` " +
      "WHERE price > -1.0 AND price < 1.0 ORDER BY k"
    def rows() = spark.sql(q).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    val before = rows()
    assert(before == Seq((2L, -0.5, "c2"), (3L, 0.25, "c3")))
    // pre-migration: the signed interval must NOT route (plain IEEE)
    import org.apache.spark.sql.sources
    def routeOf(schema: String): Option[String] = {
      val spec = WideSpec.parse(Some("k:long"), Some(schema))
      val bld = new GraftWideScanBuilder(g.catalog, "t", spec,
        g.catalog.currentManifest("t"))
      bld.pushFilters(Array(sources.GreaterThan("price", -1.0),
        sources.LessThan("price", 1.0)))
      bld.build().asInstanceOf[GraftWideScan].usedIndexTable
    }
    assert(routeOf("f:price:double;f:city:string").isEmpty)

    g.alterColumnCodec("t", "f", b("price"), "odouble", nowMs = 4L)

    // declaration flipped; stored bytes re-encoded; answers identical
    assert(g.table("t").descriptor.wideSchema
      .contains("f:price:odouble;f:city:string"))
    assert(rows() == before, "migration changed query results")
    assert(spark.sql("SELECT k, price FROM gwmig.`t$wide` ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == prices)
    // post-migration: the SAME signed interval routes through the
    // REBUILT index (the sql_index_double_range seam)
    assert(routeOf("f:price:odouble;f:city:string")
      .exists(_.startsWith("t_idx_f_")),
      "migrated odouble interval did not route")
    // and a fresh put under the new declaration keeps routing exact
    g.table("t").put(Seq(Put(Bytes.toBytes(6L))
      .add("f", b("price"), 5L, Bytes.toBytesOrdered(0.75))
      .add("f", b("city"), 5L, b("c6"))), 5L)
    assert(rows() == before :+ ((6L, 0.75, "c6")))
    // refusals: key parts and non-width-preserving retypes
    intercept[IllegalArgumentException] {
      g.alterColumnCodec("t", "f", b("k"), "olong", nowMs = 6L)
    }
    intercept[IllegalArgumentException] {
      g.alterColumnCodec("t", "f", b("city"), "odouble", nowMs = 6L)
    }
    // the DDL door refuses a silent re-type (decode flip without the
    // rewrite) — adding a column stays legal
    val ddlErr = intercept[Exception](spark.sql("ALTER TABLE gwmig.t SET " +
      "TBLPROPERTIES('wideSchema'='f:price:double;f:city:string')"))
    assert(ddlErr.getMessage.contains("alterColumnCodec"), ddlErr.getMessage)
    spark.sql("ALTER TABLE gwmig.t SET TBLPROPERTIES(" +
      "'wideSchema'='f:price:odouble;f:city:string;f:extra:long')")
    assert(spark.sql("SELECT k, extra FROM gwmig.`t$wide` WHERE k = 6")
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).toSeq ==
      Seq((6L, true)))
    // ADVICE r11: the re-type guard cannot be laundered through TWO
    // ALTERs (drop the column, re-add it with a different type token —
    // stored cells still carry the odouble encoding)
    spark.sql("ALTER TABLE gwmig.t SET TBLPROPERTIES(" +
      "'wideSchema'='f:city:string;f:extra:long')") // drop price
    val readdErr = intercept[Exception](spark.sql(
      "ALTER TABLE gwmig.t SET TBLPROPERTIES(" +
        "'wideSchema'='f:price:double;f:city:string;f:extra:long')"))
    assert(readdErr.getMessage.contains("re-add"), readdErr.getMessage)
    // re-adding with the LAST declared type stays legal and exact
    spark.sql("ALTER TABLE gwmig.t SET TBLPROPERTIES(" +
      "'wideSchema'='f:price:odouble;f:city:string;f:extra:long')")
    assert(rows() == before :+ ((6L, 0.75, "c6")))
  }

  test("alterColumnCodec: the write fence rejects a concurrent append; " +
      "a crash mid-rebuild leaves a resumable pending marker") {
    val root = freshRoot("widemigf")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:price:double;f:city:string")), 1L)
    g.table("t").put((1L to 5L).map(k =>
      Put(Bytes.toBytes(k)).add("f", b("price"), 2L, Bytes.toBytes(k * 0.5))
        .add("f", b("city"), 2L, b(s"c$k"))), 2L)
    g.createIndex("t", "f", b("price"), 3L)
    register("gwmigf", root)
    // --- write fence (r11 verdict ask 3 / ADVICE): a concurrent append
    // landing between the migration's manifest read and its commit must
    // fail the MIGRATION loudly, not silently discard the append
    val err = intercept[IllegalStateException] {
      GraftMigrate.alterColumnCodec(g.catalog, "t", "f", b("price"),
        "odouble", nowMs = 4L, beforeCommit = () =>
          g.table("t").put(Seq(Put(Bytes.toBytes(9L))
            .add("f", b("price"), 4L, Bytes.toBytes(9.5))
            .add("f", b("city"), 4L, b("c9"))), 4L))
    }
    assert(err.getMessage.contains("fence"), err.getMessage)
    // the DEDICATED fence type (ADVICE r12): retry loops must be able to
    // distinguish a retryable concurrency loss (a fence trip, a commit
    // race — both throw this type) from an unrelated
    // IllegalStateException (a corrupted manifest) — the latter must
    // propagate immediately, never retry as a full index rebuild
    assert(err.isInstanceOf[graft.catalog.FenceTrippedException],
      s"fence must throw the dedicated type, got ${err.getClass}")
    // nothing lost, nothing flipped: old declaration, append visible
    assert(g.table("t").descriptor.wideSchema
      .contains("f:price:double;f:city:string"))
    assert(spark.sql("SELECT k, price FROM gwmigf.`t$wide` ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      (1L to 5L).map(k => (k, k * 0.5)) :+ ((9L, 9.5)))
    // re-run from the current version: succeeds
    GraftMigrate.alterColumnCodec(g.catalog, "t", "f", b("price"),
      "odouble", nowMs = 5L)
    assert(g.table("t").descriptor.wideSchema
      .contains("f:price:odouble;f:city:string"))
    assert(spark.sql("SELECT k, price FROM gwmigf.`t$wide` ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      (1L to 5L).map(k => (k, k * 0.5)) :+ ((9L, 9.5)))
    // --- crash recovery (ADVICE r11): stop after commit 1 — the
    // affected index is PERSISTED as pending (not silently gone)
    val root2 = freshRoot("widemigp")
    val g2 = Graft(spark, root2)
    g2.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:price:double;f:city:string")), 1L)
    g2.table("t").put((1L to 5L).map(k =>
      Put(Bytes.toBytes(k)).add("f", b("price"), 2L, Bytes.toBytes(k * 0.5))
        .add("f", b("city"), 2L, b(s"c$k"))), 2L)
    g2.createIndex("t", "f", b("price"), 3L)
    register("gwmigp", root2)
    GraftMigrate.migrateColumnData(g2.catalog, "t", "f", b("price"),
      "odouble", nowMs = 4L) // "crash" before the rebuilds
    val d1 = g2.catalog.currentManifest("t").descriptor
    assert(d1.indexes.isEmpty && d1.pendingIndexes.size == 1,
      s"pending marker missing: ${d1.indexes} / ${d1.pendingIndexes}")
    // queries stay correct while unrouted (full scan + residual)
    assert(spark.sql("SELECT k FROM gwmigp.`t$wide` " +
      "WHERE price >= 1.0 AND price < 2.1 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    // restart path: detect + finish the rebuild; routing returns
    val rebuilt = GraftMigrate.resumePendingIndexRebuilds(g2.catalog, "t",
      nowMs = 5L)
    assert(rebuilt.size == 1)
    val d2 = g2.catalog.currentManifest("t").descriptor
    assert(d2.pendingIndexes.isEmpty && d2.indexes.size == 1)
    import org.apache.spark.sql.sources
    val spec = WideSpec.parse(Some("k:long"),
      Some("f:price:odouble;f:city:string"))
    val bld = new GraftWideScanBuilder(g2.catalog, "t", spec,
      g2.catalog.currentManifest("t"))
    bld.pushFilters(Array(sources.GreaterThanOrEqual("price", 1.0),
      sources.LessThan("price", 2.1)))
    assert(bld.build().asInstanceOf[GraftWideScan].usedIndexTable.isDefined,
      "resumed index does not route")
    assert(spark.sql("SELECT k FROM gwmigp.`t$wide` " +
      "WHERE price >= 1.0 AND price < 2.1 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    // --- re-registration fence (r12): a put landing AFTER the rebuild's
    // manifest read but BEFORE the alterTable re-registration must not
    // ship an index missing that row. The stale-expectVersion path is
    // exercised directly (the resume loop retries it internally).
    val d3 = g2.catalog.currentManifest("t")
    // the column is odouble after the migration — raw puts must encode
    // under the DECLARED codec
    g2.table("t").put(Seq(Put(Bytes.toBytes(8L))
      .add("f", b("price"), 6L, Bytes.toBytesOrdered(1.5))
      .add("f", b("city"), 6L, b("c8"))), 6L)
    val fenceErr = intercept[IllegalStateException] {
      g2.catalog.alterTable("t", d3.descriptor, nowMs = 7L,
        expectVersion = Some(d3.version))
    }
    assert(fenceErr.getMessage.contains("fence"), fenceErr.getMessage)
    // ...and the index maintained for the put routes it (registered
    // indexes get synchronous maintenance; the fence only protects the
    // pending->registered transition)
    assert(spark.sql("SELECT k FROM gwmigp.`t$wide` " +
      "WHERE price >= 1.0 AND price < 2.1 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L, 8L))
  }

  test("olong key: negative key ranges prune and stay exact") {
    val root = freshRoot("wideol")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:olong"),
      wideSchema = Some("f:city:string")), 1L)
    val keys = Seq(-10L, -3L, -1L, 0L, 2L, 7L)
    g.table("t").put(keys.map(k =>
      Put(Bytes.toBytesOrdered(k)).add("f", b("city"), 2L, b(s"c$k"))), 2L)
    register("gwol", root)
    assert(spark.sql("SELECT k FROM gwol.`t$wide` WHERE k >= -3 AND k < 2 " +
      "ORDER BY k").collect().map(_.getLong(0)).toSeq == Seq(-3L, -1L, 0L))
    assert(spark.sql("SELECT k FROM gwol.`t$wide` WHERE k > -11 AND k <= -1 " +
      "ORDER BY k").collect().map(_.getLong(0)).toSeq == Seq(-10L, -3L, -1L))
  }

  test("a LIKE prefix on an indexed string column routes as one probe") {
    val root = freshRoot("widepfx")
    val g = mkTable(root)
    g.createIndex("t", "f", b("city"), 3L)
    register("gwpf", root)
    // 'par%' matches the four paris rows and nothing else; exactness
    // includes the boundary (prefix range [par, pas))
    assert(spark.sql("SELECT k FROM gwpf.`t$wide` WHERE city LIKE 'par%'")
      .collect().map(_.getLong(0)).toSet == Set(3L, 13L, 23L, 33L))
    // seam: the recorded [p, prefixSuccessor(p)) interval routes
    val spec = WideSpec.parse(Some("k:long"), Some("f:city:string;f:pop:long"))
    import org.apache.spark.sql.sources
    val bld = new GraftWideScanBuilder(g.catalog, "t", spec, g.catalog.currentManifest("t"))
    bld.pushFilters(Array(sources.StringStartsWith("city", "par")))
    assert(bld.build().asInstanceOf[GraftWideScan]
      .usedIndexTable.exists(_.startsWith("t_idx_f_")),
      "prefix predicate did not route through the index")
  }

  test("a LIKE prefix on a string key head prunes the row range") {
    val root = freshRoot("widekpfx")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:string"),
      wideSchema = Some("f:city:string")), 1L)
    g.table("t").put(Seq(
      Put(b("pa")).add("f", b("city"), 2L, b("x")),
      Put(b("par")).add("f", b("city"), 2L, b("x")),
      Put(b("paris")).add("f", b("city"), 2L, b("x")),
      Put(b("pb")).add("f", b("city"), 2L, b("x"))), 2L)
    register("gwkp", root)
    assert(spark.sql("SELECT k FROM gwkp.`t$wide` WHERE k LIKE 'par%'")
      .collect().map(_.getString(0)).toSet == Set("par", "paris"))
  }

  test("strict GreaterThan on a string key head does not over-prune") {
    val root = freshRoot("widegt")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:string"),
      wideSchema = Some("f:city:string")), 1L)
    g.table("t").put(Seq(
      Put(b("a")).add("f", b("city"), 2L, b("x1")),
      Put(b("ab")).add("f", b("city"), 2L, b("x2")),
      Put(b("b")).add("f", b("city"), 2L, b("x3"))), 2L)
    register("gwgt", root)
    // "ab" satisfies k > 'a' but sorts inside [prefixSuccessor('a'), ...) —
    // the old start bound silently dropped it
    assert(spark.sql("SELECT k FROM gwgt.`t$wide` WHERE k > 'a' ORDER BY k")
      .collect().map(_.getString(0)).toSeq == Seq("ab", "b"))
    assert(spark.sql("SELECT k FROM gwgt.`t$wide` WHERE k >= 'a' AND k <= 'ab'")
      .collect().map(_.getString(0)).toSet == Set("a", "ab"))
  }

  test("family TTL is honored on index-routed wide reads") {
    val root = freshRoot("widettl")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f", ttlMs = Some(60000L))),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;f:pop:long")), 1L)
    val now = System.currentTimeMillis()
    g.table("t").put(Seq(
      Put(Bytes.toBytes(1L)).add("f", b("city"), now, b("paris"))
        .add("f", b("pop"), now, Bytes.toBytes(10L)),
      // expired: far older than the 60 s TTL against the SQL-surface clock
      Put(Bytes.toBytes(2L)).add("f", b("city"), 5L, b("paris"))
        .add("f", b("pop"), 5L, Bytes.toBytes(20L))), 2L)
    g.createIndex("t", "f", b("city"), 3L)
    // seam: the indexed predicate ROUTES — and the routed hit set is
    // re-resolved under the family TTL, so the expired row (a stale
    // index hit whose cells are past the TTL) never resurrects
    val spec = WideSpec.parse(Some("k:long"), Some("f:city:string;f:pop:long"))
    import org.apache.spark.sql.sources
    val bld = new GraftWideScanBuilder(g.catalog, "t", spec, g.catalog.currentManifest("t"))
    bld.pushFilters(Array(sources.EqualTo("city", "paris")))
    assert(bld.build().asInstanceOf[GraftWideScan].usedIndexTable.isDefined,
      "TTL'd family must still index-route (TTL is threaded through)")
    register("gwttl", root)
    assert(spark.sql("SELECT k FROM gwttl.`t$wide` WHERE city = 'paris'")
      .collect().map(_.getLong(0)).toSet == Set(1L))
    // same answer for a projected non-test column (the TTL re-resolve
    // covers every gathered cell, not just the indexed one)
    assert(spark.sql("SELECT k, pop FROM gwttl.`t$wide` WHERE city = 'paris'")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 10L)))
  }

  test("wideKey/wideSchema declarations are validated with clear errors") {
    // mid-key variable-length part: non-prefix-free row key
    intercept[IllegalArgumentException] {
      WideSpec.parse(Some("s:string,n:long"), Some("f:c:long"))
    }
    // malformed entries fail with IllegalArgumentException, not MatchError
    intercept[IllegalArgumentException] {
      WideSpec.parse(Some("k"), Some("f:c:long"))
    }
    intercept[IllegalArgumentException] {
      WideSpec.parse(Some("k:long"), Some("f:c"))
    }
    // fixed-width parts + one variable tail is the legal shape
    val ok = WideSpec.parse(Some("n:long,s:string"), Some("f:c:long"))
    assert(ok.key.map(_._1) == Seq("n", "s"))
  }

  test("manifest wideKey/wideSchema parse is anchored to the top level") {
    import graft.catalog.{Manifest, ManifestJson}
    // a dataDir whose PATH contains the property text must not leak into
    // the descriptor (and the real properties still round-trip)
    val desc = TableDescriptor("t", Seq(FamilyDescriptor("f")),
      wideKey = Some("k:long"), wideSchema = Some("f:c:string"))
    val m = Manifest("t", 3L, 9L, desc,
      Seq("/data/wideKey/x", "/tmp/has_wideSchema_text/_fam=f"))
    val back = ManifestJson.read(ManifestJson.write(m))
    assert(back.descriptor.wideKey.contains("k:long"))
    assert(back.descriptor.wideSchema.contains("f:c:string"))
    assert(back.dataDirs == m.dataDirs)
    // absent properties stay absent even when array content mentions them
    val plain = Manifest("t", 1L, 9L,
      TableDescriptor("t", Seq(FamilyDescriptor("f"))),
      Seq("/data/wideKey-lookalike"))
    val pb = ManifestJson.read(ManifestJson.write(plain))
    assert(pb.descriptor.wideKey.isEmpty && pb.descriptor.wideSchema.isEmpty)
  }

  test("INSERT INTO the wide view writes cells through the append seam") {
    val root = freshRoot("wideins")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, immutableRows = true, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;f:pop:long")), 1L)
    g.createIndex("t", "f", b("city"), 2L)
    register("gwin", root)
    spark.sql("INSERT INTO gwin.`t$wide` VALUES " +
      "(1, 'paris', 10), (2, 'tokyo', NULL)")
    val out = spark.sql("SELECT k, city, pop FROM gwin.`t$wide` ORDER BY k")
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getString(1) == "paris" && out(0).getLong(2) == 10L)
    assert(out(1).getString(1) == "tokyo" && out(1).isNullAt(2))
    // the insert went through Catalog.append: the registered index was
    // dual-written, so the route answers without a rebuild
    assert(rowsOf2(spark.sql(
      "SELECT k, city FROM gwin.`t$wide` WHERE city = 'paris'"))
      == Set(1L -> "paris"))
    val ixTable = g.table("t").descriptor.indexOn("f", b("city")).get.indexTable
    assert(g.catalog.read(ixTable).count() == 2L)
    // a null key part fails loudly, not silently
    intercept[Exception] {
      spark.sql("INSERT INTO gwin.`t$wide` VALUES (NULL, 'x', 1)")
    }
    // facade reads see the inserted cells (one write model)
    assert(g.table("t").get(graft.read.Get(Bytes.toBytes(1L))).count() == 2L)
  }

  private def rowsOf2(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  /** Pin the SQL commit clock (distinct per statement — same-ms verdict
    * cells would tie on ts). */
  private def atMs(ms: Long)(body: => Unit): Unit = {
    spark.conf.set("spark.graft.sql.nowMs", ms.toString)
    try body finally spark.conf.unset("spark.graft.sql.nowMs")
  }

  test("UPDATE on the wide view: SET value, SET NULL, and a key move") {
    val root = freshRoot("wideupd")
    val g = mkTable(root)
    register("gwu", root)
    atMs(100L)(spark.sql(
      "UPDATE gwu.`t$wide` SET pop = pop + 1000 WHERE city = 'paris'"))
    // 4 matched rows (k = 3,13,23,33) got new pop versions; others untouched
    val after = spark.sql(
      "SELECT k, pop FROM gwu.`t$wide` WHERE city = 'paris' ORDER BY k").collect()
    assert(after.map(_.getLong(0)).toSeq == Seq(3L, 13L, 23L, 33L))
    assert(after.map(_.getLong(1)).toSeq == Seq(1030L, 1130L, 1230L, 1330L))
    assert(rowsOf(spark.sql(
      "SELECT k, city, pop FROM gwu.`t$wide` WHERE k = 7"))
      == Set((7L, "other7", 70L)))
    // SET c = NULL deletes the cell (absence == null)
    atMs(200L)(spark.sql("UPDATE gwu.`t$wide` SET pop = NULL WHERE k = 13"))
    val nulled = spark.sql("SELECT city, pop FROM gwu.`t$wide` WHERE k = 13").collect()
    assert(nulled.length == 1 && nulled(0).getString(0) == "paris" &&
      nulled(0).isNullAt(1))
    // a key-moving SET tombstones the old row and writes the new one
    atMs(300L)(spark.sql("UPDATE gwu.`t$wide` SET k = 1003 WHERE k = 3"))
    assert(spark.sql("SELECT k FROM gwu.`t$wide` WHERE k = 3").count() == 0)
    assert(rowsOf(spark.sql(
      "SELECT k, city, pop FROM gwu.`t$wide` WHERE k = 1003"))
      == Set((1003L, "paris", 1030L)))
    assert(spark.sql("SELECT k FROM gwu.`t$wide`").count() == 40)
    // the facade sees the same mutations (one write model): k=13's pop is
    // masked by a DeleteColumn, its city cell survives
    assert(g.table("t").get(graft.read.Get(Bytes.toBytes(13L))).count() == 1L)
  }

  test("DELETE FROM the wide view tombstones matched rows") {
    val root = freshRoot("widedel")
    val g = mkTable(root)
    g.createIndex("t", "f", b("city"), 3L)
    register("gwdel", root)
    val vPre = g.catalog.currentManifest("t").version
    atMs(100L)(spark.sql("DELETE FROM gwdel.`t$wide` WHERE city = 'paris'"))
    assert(spark.sql("SELECT k FROM gwdel.`t$wide`").count() == 36)
    assert(spark.sql(
      "SELECT k FROM gwdel.`t$wide` WHERE city = 'paris'").count() == 0)
    // the indexed route agrees with the scan (maintenance went through
    // the same append seam; the verified read drops the stale pointers)
    assert(spark.sql(
      "SELECT k FROM gwdel.`t$wide` WHERE city = 'other7'").collect()
      .map(_.getLong(0)).toSeq == Seq(7L))
    // facade view: the deleted row resolves to nothing
    assert(g.table("t").get(graft.read.Get(Bytes.toBytes(13L))).count() == 0L)
    // time travel keeps the pre-delete view: the delete APPENDED
    // tombstones (nothing rewritten), so the prior version still reads
    assert(spark.sql(s"SELECT * FROM gwdel.t VERSION AS OF $vPre").count() == 80L)
  }

  test("MERGE INTO the wide view upserts through the delta path") {
    val root = freshRoot("widemrg")
    mkTable(root)
    register("gwm", root)
    atMs(100L)(spark.sql(
      """MERGE INTO gwm.`t$wide` t
        |USING (SELECT * FROM VALUES (13, 'lyon', 7L), (999, 'nice', 9L) AS s(k, city, pop)) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET city = s.city, pop = s.pop
        |WHEN NOT MATCHED THEN INSERT (k, city, pop) VALUES (s.k, s.city, s.pop)
        |""".stripMargin))
    assert(rowsOf(spark.sql(
      "SELECT k, city, pop FROM gwm.`t$wide` WHERE k IN (13, 999)"))
      == Set((13L, "lyon", 7L), (999L, "nice", 9L)))
    assert(spark.sql("SELECT k FROM gwm.`t$wide`").count() == 41)
  }

  test("plain long key: upper-bounded ranges keep negative keys exact") {
    // Two's-complement big-endian puts negative keys ABOVE all positives
    // in unsigned byte order, so a recorded stop bound from `k < 5` must
    // not prune them away (they satisfy the predicate; a pruned row is a
    // silent false negative the residual filter cannot resurrect).
    val root = freshRoot("widesk")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string")), 1L)
    val keys = Seq(-10L, -3L, -1L, 0L, 2L, 7L, 40L)
    g.table("t").put(keys.map(k =>
      Put(Bytes.toBytes(k)).add("f", b("city"), 2L, b(s"c$k"))), 2L)
    register("gwsk", root)
    assert(spark.sql("SELECT k FROM gwsk.`t$wide` WHERE k < 5 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(-10L, -3L, -1L, 0L, 2L))
    assert(spark.sql("SELECT k FROM gwsk.`t$wide` WHERE k <= 2 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(-10L, -3L, -1L, 0L, 2L))
    // conjunct with a lower bound: byte range plus residual stays exact
    assert(spark.sql(
      "SELECT k FROM gwsk.`t$wide` WHERE k >= 0 AND k < 5 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(0L, 2L))
    // equality on the head is bijective per width — negatives exact too
    assert(spark.sql("SELECT k FROM gwsk.`t$wide` WHERE k = -3")
      .collect().map(_.getLong(0)).toSeq == Seq(-3L))
    // ADVICE r10: negative equality + non-negative stop must not INVERT
    // the range ([enc(-3), enc(5)) is byte-empty) — the deferred plain
    // stop is dropped once the equality pins the head, whatever order
    // the filters arrive in
    assert(spark.sql("SELECT k FROM gwsk.`t$wide` WHERE k = -3 AND k < 5")
      .collect().map(_.getLong(0)).toSeq == Seq(-3L))
    assert(spark.sql("SELECT k FROM gwsk.`t$wide` WHERE k < 5 AND k = -3")
      .collect().map(_.getLong(0)).toSeq == Seq(-3L))
    assert(spark.sql("SELECT k FROM gwsk.`t$wide` WHERE k = -3 AND k <= 2")
      .collect().map(_.getLong(0)).toSeq == Seq(-3L))
    // and the unsatisfiable combination still returns empty
    assert(spark.sql("SELECT k FROM gwsk.`t$wide` WHERE k = 7 AND k < 5")
      .count() == 0L)
    // the IN analog keeps working (IN never pins the head)
    assert(spark.sql(
      "SELECT k FROM gwsk.`t$wide` WHERE k IN (-3, -1) AND k < 5 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(-3L, -1L))
    // r11: key-head RANGE disjunction (`k < a OR k >= b`) prunes as an
    // Or of row ranges — and on a plain signed head the lo-less arm
    // keeps the negative byte region (those keys satisfy `< 0`)
    assert(spark.sql(
      "SELECT k FROM gwsk.`t$wide` WHERE k < 0 OR k >= 7 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(-10L, -3L, -1L, 7L, 40L))
    assert(spark.sql(
      "SELECT k FROM gwsk.`t$wide` WHERE (k >= 0 AND k < 3) OR k = 40 " +
        "ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(0L, 2L, 40L))
    // ADVICE r11: an And-intersected disjunct mixing sign REGIONS on a
    // plain head (`(k = -3 AND k < 5) OR k = 40`) must not intersect in
    // raw byte space — [enc(-3), enc(5)) is byte-EMPTY for a non-empty
    // value set and keyRangeOr is pruning-only (the residual Or cannot
    // resurrect the -3 row). The parse must bail instead (full scan +
    // residual).
    assert(spark.sql(
      "SELECT k FROM gwsk.`t$wide` WHERE (k = -3 AND k < 5) OR k = 40 " +
        "ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(-3L, 40L))
    assert(spark.sql(
      "SELECT k FROM gwsk.`t$wide` WHERE (k = -3 AND k <= 5) OR " +
        "(k >= 7 AND k < 41) ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(-3L, 7L, 40L))
    // same-region And-intersections still prune (arms stay recorded)
    assert(spark.sql(
      "SELECT k FROM gwsk.`t$wide` WHERE (k = 2 AND k < 5) OR k = 40 " +
        "ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 40L))
    // positive-only ranges still prune correctly
    assert(spark.sql("SELECT k FROM gwsk.`t$wide` WHERE k >= 2 AND k < 40 " +
      "ORDER BY k").collect().map(_.getLong(0)).toSeq == Seq(2L, 7L))
    // plan seam: the wrapped stop reaches the parquet scan as a pushed
    // Or of row ranges — the prune survives the wrap
    import org.apache.spark.sql.sources
    val spec = WideSpec.parse(Some("k:long"), Some("f:city:string"))
    val bld = new GraftWideScanBuilder(g.catalog, "t", spec,
      g.catalog.currentManifest("t"))
    bld.pushFilters(Array(sources.LessThan("k", java.lang.Long.valueOf(5L))))
    val plan = bld.build().asInstanceOf[GraftWideScan]
      .resolvedFrame(spark).queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters"))
      .mkString(" | ")
    assert(pushed.contains("Or(LessThan(row") ||
      pushed.contains("Or(GreaterThanOrEqual(row"),
      s"wrapped stop bound not pushed to parquet:\n$pushed")
    // r11 seam: the key-range disjunction records its arms — the two
    // literal arms + the appended negative-region arm on a plain head
    val orBld = new GraftWideScanBuilder(g.catalog, "t", spec,
      g.catalog.currentManifest("t"))
    orBld.pushFilters(Array(sources.Or(
      sources.LessThan("k", java.lang.Long.valueOf(0L)),
      sources.GreaterThanOrEqual("k", java.lang.Long.valueOf(7L)))))
    val orScan = orBld.build().asInstanceOf[GraftWideScan]
    assert(orScan.pushedKeyRangeOr.exists(_.size == 3),
      orScan.pushedKeyRangeOr.map(_.size))
    // ADVICE r11 seam: the mixed-sign And-intersection bails the parse
    // (no recorded keyRangeOr) whatever filter tree Spark hands down
    val mixBld = new GraftWideScanBuilder(g.catalog, "t", spec,
      g.catalog.currentManifest("t"))
    mixBld.pushFilters(Array(sources.Or(
      sources.And(sources.EqualTo("k", java.lang.Long.valueOf(-3L)),
        sources.LessThan("k", java.lang.Long.valueOf(5L))),
      sources.EqualTo("k", java.lang.Long.valueOf(40L)))))
    val mixScan = mixBld.build().asInstanceOf[GraftWideScan]
    assert(mixScan.pushedKeyRangeOr.isEmpty,
      s"mixed-sign And-intersection must bail: ${mixScan.pushedKeyRangeOr}")
    // salted variant: the wrap rides the scatter as a second per-bucket
    // range disjunct on the raw (pushable) salted column
    val root2 = freshRoot("widesks")
    val g2 = Graft(spark, root2)
    g2.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, saltBuckets = 4, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string")), 1L)
    g2.table("t").put(keys.map(k =>
      Put(Bytes.toBytes(k)).add("f", b("city"), 2L, b(s"c$k"))), 2L)
    register("gwsks", root2)
    assert(spark.sql("SELECT k FROM gwsks.`t$wide` WHERE k < 5 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(-10L, -3L, -1L, 0L, 2L))
    assert(spark.sql(
      "SELECT k FROM gwsks.`t$wide` WHERE k >= 0 AND k <= 7 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(0L, 2L, 7L))
  }

  test("plain long value column: hi-bounded ranges do not misroute") {
    // An index range probe is byte-ordered; a plain signed long column
    // stores negatives ABOVE positives, so `pop < 50` must not route as
    // the byte interval [*, enc(50)) — that hit set misses negative
    // values and the residual cannot resurrect rows the route dropped.
    val root = freshRoot("widesv")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:pop:long")), 1L)
    val rows = Seq(1L -> -20L, 2L -> -5L, 3L -> 0L, 4L -> 30L, 5L -> 70L)
    g.table("t").put(rows.map { case (k, v) =>
      Put(Bytes.toBytes(k)).add("f", b("pop"), 2L, Bytes.toBytes(v)) }, 2L)
    g.createIndex("t", "f", b("pop"), 3L)
    register("gwng", root)
    assert(spark.sql("SELECT k FROM gwng.`t$wide` WHERE pop < 50 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(spark.sql("SELECT k FROM gwng.`t$wide` WHERE pop <= 30 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    // lo-only bounds are a byte-order SUPERSET (negatives sort above the
    // start and the residual drops them) — routing stays sound and the
    // answer exact
    assert(spark.sql("SELECT k FROM gwng.`t$wide` WHERE pop >= 0 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(3L, 4L, 5L))
    // seam: the hi-bounded range DECLINES the route; the lo-only range
    // routes (byte-order superset, residual-exact)
    import org.apache.spark.sql.sources
    val spec = WideSpec.parse(Some("k:long"), Some("f:pop:long"))
    val hiBld = new GraftWideScanBuilder(g.catalog, "t", spec,
      g.catalog.currentManifest("t"))
    hiBld.pushFilters(Array(sources.LessThan("pop", java.lang.Long.valueOf(50L))))
    assert(hiBld.build().asInstanceOf[GraftWideScan].usedIndexTable.isEmpty,
      "hi-bounded range on a plain signed column must not route")
    val loBld = new GraftWideScanBuilder(g.catalog, "t", spec,
      g.catalog.currentManifest("t"))
    loBld.pushFilters(Array(sources.GreaterThanOrEqual("pop", java.lang.Long.valueOf(0L))))
    assert(loBld.build().asInstanceOf[GraftWideScan].usedIndexTable.isDefined,
      "lo-only range should still route (superset + residual)")
    // r11: a BOUNDED range with a non-negative lo IS byte-exact on a
    // plain signed column (negatives sort above both bounds and the
    // value interval holds none) — it routes, and the answer stays exact
    // with negatives stored
    val bounded = new GraftWideScanBuilder(g.catalog, "t", spec,
      g.catalog.currentManifest("t"))
    bounded.pushFilters(Array(
      sources.GreaterThanOrEqual("pop", java.lang.Long.valueOf(0L)),
      sources.LessThan("pop", java.lang.Long.valueOf(50L))))
    assert(bounded.build().asInstanceOf[GraftWideScan].usedIndexTable.isDefined,
      "a non-negative-bounded range should route on a plain column")
    assert(spark.sql(
      "SELECT k FROM gwng.`t$wide` WHERE pop >= 0 AND pop < 50 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(3L, 4L))
  }

  test("OR-of-probes: one-column disjunctions route as a single probe pass") {
    // FilterList(MUST_PASS_ONE) shape: `pop = -5 OR (pop >= 0 AND
    // pop < 50)` routes through pop's index as ONE probeOr pass (an
    // equality arm + a bounded range arm); `pop = 70 OR pop < 0`
    // carries a lo-less hi-bounded arm on a PLAIN signed column and must
    // NOT route (negative stored values byte-sort above the range) —
    // residual-only, still exact.
    val root = freshRoot("wideor")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:pop:long;f:city:string")), 1L)
    val rows = Seq(1L -> -20L, 2L -> -5L, 3L -> 0L, 4L -> 30L, 5L -> 70L)
    g.table("t").put(rows.map { case (k, v) =>
      Put(Bytes.toBytes(k)).add("f", b("pop"), 2L, Bytes.toBytes(v))
        .add("f", b("city"), 2L, b(s"c$k")) }, 2L)
    g.createIndex("t", "f", b("pop"), 3L)
    register("gwor", root)
    import org.apache.spark.sql.sources
    val spec = WideSpec.parse(Some("k:long"), Some("f:pop:long;f:city:string"))
    def built(fs: Array[sources.Filter]): GraftWideScan = {
      val bld = new GraftWideScanBuilder(g.catalog, "t", spec,
        g.catalog.currentManifest("t"))
      bld.pushFilters(fs): Unit
      bld.build().asInstanceOf[GraftWideScan]
    }
    // mixed equality + bounded-range arms: routes
    val orMixed = sources.Or(
      sources.EqualTo("pop", java.lang.Long.valueOf(-5L)),
      sources.And(sources.GreaterThanOrEqual("pop", java.lang.Long.valueOf(0L)),
        sources.LessThan("pop", java.lang.Long.valueOf(50L))))
    assert(built(Array(orMixed)).usedIndexTable.isDefined,
      "eq + bounded-range OR should route")
    assert(spark.sql("SELECT k FROM gwor.`t$wide` " +
      "WHERE pop = -5 OR (pop >= 0 AND pop < 50) ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    // a lo-less hi-bounded arm on a plain column: no route, exact answer
    val orUnsound = sources.Or(
      sources.EqualTo("pop", java.lang.Long.valueOf(70L)),
      sources.LessThan("pop", java.lang.Long.valueOf(0L)))
    assert(built(Array(orUnsound)).usedIndexTable.isEmpty,
      "lo-less hi-bounded arm on a plain column must not route")
    assert(spark.sql(
      "SELECT k FROM gwor.`t$wide` WHERE pop = 70 OR pop < 0 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 5L))
    // a two-column disjunction never routes (arms must share one column)
    val orTwoCols = sources.Or(
      sources.EqualTo("pop", java.lang.Long.valueOf(70L)),
      sources.EqualTo("city", "c1"))
    assert(built(Array(orTwoCols)).usedIndexTable.isEmpty)
    assert(spark.sql(
      "SELECT k FROM gwor.`t$wide` WHERE pop = 70 OR city = 'c1' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 5L))
    // key-head OR of equalities = the multiGet probes (the IN shape)
    val keyOr = built(Array(sources.Or(
      sources.EqualTo("k", java.lang.Long.valueOf(2L)),
      sources.EqualTo("k", java.lang.Long.valueOf(5L)))))
    assert(keyOr.pushedKeyProbes.exists(_.size == 2),
      "key-head OR should set the probe set")
    assert(spark.sql(
      "SELECT k FROM gwor.`t$wide` WHERE k = 2 OR k = 5 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 5L))
    // TUPLE-OR through a composite index: `(city=a AND pop=x) OR
    // (city=b AND pop IN (y, z))` probes the union of the disjuncts'
    // blob cartesians in ONE pass
    val root3 = freshRoot("wideort")
    val g3 = Graft(spark, root3)
    g3.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, immutableRows = true, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;f:pop:long")), 1L)
    g3.table("t").put((1 to 40).map(i =>
      Put(Bytes.toBytes(i.toLong))
        .add("f", b("city"), 2L, b(s"c${i % 4}"))
        .add("f", b("pop"), 2L, Bytes.toBytes((i % 10).toLong))), 2L)
    g3.createCompositeIndex("t",
      Seq("f" -> b("city"), "f" -> b("pop")), 3L)
    register("gwort", root3)
    val tupQ = "SELECT k FROM gwort.`t$wide` WHERE " +
      "(city = 'c1' AND pop = 3) OR (city = 'c2' AND pop IN (4, 6)) " +
      "ORDER BY k"
    assert(spark.sql(tupQ).collect().map(_.getLong(0)).toSeq ==
      (1 to 40).filter(i =>
        (i % 4 == 1 && i % 10 == 3) || (i % 4 == 2 && (i % 10 == 4 ||
          i % 10 == 6))).map(_.toLong))
    val tupBld = new GraftWideScanBuilder(g3.catalog, "t",
      WideSpec.parse(Some("k:long"), Some("f:city:string;f:pop:long")),
      g3.catalog.currentManifest("t"))
    tupBld.pushFilters(Array(sources.Or(
      sources.And(sources.EqualTo("city", "c1"),
        sources.EqualTo("pop", java.lang.Long.valueOf(3L))),
      sources.And(sources.EqualTo("city", "c2"),
        sources.In("pop", Array[Any](java.lang.Long.valueOf(4L),
          java.lang.Long.valueOf(6L)))))))
    assert(tupBld.build().asInstanceOf[GraftWideScan].usedIndexTable
      .exists(_.contains("cidx")), "tuple-OR did not route composite")
    // disjuncts over DIFFERENT column sets stay residual-only
    val mixBld = new GraftWideScanBuilder(g3.catalog, "t",
      WideSpec.parse(Some("k:long"), Some("f:city:string;f:pop:long")),
      g3.catalog.currentManifest("t"))
    mixBld.pushFilters(Array(sources.Or(
      sources.And(sources.EqualTo("city", "c1"),
        sources.EqualTo("pop", java.lang.Long.valueOf(3L))),
      sources.EqualTo("city", "c2"))))
    assert(mixBld.build().asInstanceOf[GraftWideScan].usedIndexTable.isEmpty)
    assert(spark.sql("SELECT k FROM gwort.`t$wide` WHERE " +
      "(city = 'c1' AND pop = 3) OR city = 'c2' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq ==
      (1 to 40).filter(i => (i % 4 == 1 && i % 10 == 3) || i % 4 == 2)
        .map(_.toLong))
    // COVERED OR: the disjunction answered from the index table alone
    val root2 = freshRoot("wideorc")
    val g2 = mkTable(root2)
    g2.createIndex("t", "f", b("city"), 3L, covered = Seq("f" -> b("pop")))
    register("gworc", root2)
    val covQ = "SELECT k, pop FROM gworc.`t$wide` " +
      "WHERE city = 'paris' OR (city >= 'other1' AND city < 'other2') " +
      "ORDER BY k"
    assert(spark.sql(covQ).collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq == Seq(1L, 3L, 10L, 11L, 12L, 13L, 14L, 15L, 16L, 17L, 18L,
        19L, 23L, 33L).map(k => k -> k * 10L))
    val covSpec = WideSpec.parse(Some("k:long"),
      Some("f:city:string;f:pop:long"))
    val covBld = new GraftWideScanBuilder(g2.catalog, "t", covSpec,
      g2.catalog.currentManifest("t"))
    covBld.pushFilters(Array(sources.Or(sources.EqualTo("city", "paris"),
      sources.And(sources.GreaterThanOrEqual("city", "other1"),
        sources.LessThan("city", "other2")))))
    covBld.pruneColumns(org.apache.spark.sql.types.StructType(
      covSpec.schema.filter(f => Seq("k", "pop", "city").contains(f.name))))
    val covScan = covBld.build().asInstanceOf[GraftWideScan]
    assert(covScan.usedIndexTable.isDefined, "covered OR did not route")
    assert(covScan.indexOnly, "covered OR should answer index-only")
    val covPlan = covScan.resolvedFrame(spark)
      .queryExecution.executedPlan.toString
    assert(!covPlan.contains(root2 + "/t/"),
      s"covered OR touched the main table:\n$covPlan")
  }

  test("CROSS-column OR: a disjunction over two indexed columns routes " +
      "as a union of per-column probes") {
    // the GENERAL FilterList(MUST_PASS_ONE): `pop = 3 OR city = 'c1'`,
    // each column indexed — served as the union of the two probeOr
    // passes, deduped by row key, one gather; the residual Or keeps
    // exactness (r12)
    val root = freshRoot("widexor")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;f:pop:long")), 1L)
    g.table("t").put((1 to 40).map(i =>
      Put(Bytes.toBytes(i.toLong))
        .add("f", b("city"), 2L, b(s"c${i % 4}"))
        .add("f", b("pop"), 2L, Bytes.toBytes((i % 10).toLong))), 2L)
    g.createIndex("t", "f", b("city"), 3L)
    g.createIndex("t", "f", b("pop"), 3L)
    // a delete AFTER the index builds: synchronous tombstones must keep
    // the routed answer exact (k=13 matches city c1)
    g.table("t").delete(Seq(graft.write.Delete(Bytes.toBytes(13L))
      .deleteFamily("f", 4L)), 4L)
    register("gwxor", root)
    val q = "SELECT k FROM gwxor.`t$wide` " +
      "WHERE pop = 3 OR city = 'c1' OR pop IN (6, 7) ORDER BY k"
    val expect = (1 to 40).filter(i => i != 13 &&
      (i % 10 == 3 || i % 4 == 1 || i % 10 == 6 || i % 10 == 7))
      .map(_.toLong)
    assert(spark.sql(q).collect().map(_.getLong(0)).toSeq == expect)
    // route seam: BOTH index tables probed in one route
    import org.apache.spark.sql.sources
    val spec = WideSpec.parse(Some("k:long"),
      Some("f:city:string;f:pop:long"))
    def built(fs: Array[sources.Filter]): GraftWideScan = {
      val bld = new GraftWideScanBuilder(g.catalog, "t", spec,
        g.catalog.currentManifest("t"))
      bld.pushFilters(fs): Unit
      bld.build().asInstanceOf[GraftWideScan]
    }
    val cross = sources.Or(sources.Or(
      sources.EqualTo("pop", java.lang.Long.valueOf(3L)),
      sources.EqualTo("city", "c1")),
      sources.In("pop", Array[Any](java.lang.Long.valueOf(6L),
        java.lang.Long.valueOf(7L))))
    val crossScan = built(Array(cross))
    assert(crossScan.crossOrIndexTables.size == 2,
      s"expected both indexes in the route: ${crossScan.crossOrIndexTables}")
    val plan = crossScan.resolvedFrame(spark)
      .queryExecution.executedPlan.toString
    assert(plan.contains("t_idx_f_") && crossScan.crossOrIndexTables
      .forall(plan.contains), s"cross-OR probes missing from plan:\n$plan")
    // an UNSOUND arm in either column declines the WHOLE route (probing
    // only the sound disjuncts would drop the other disjuncts' rows):
    // lo-less hi-bounded range on plain signed pop
    val unsound = sources.Or(sources.EqualTo("city", "c1"),
      sources.LessThan("pop", java.lang.Long.valueOf(2L)))
    assert(built(Array(unsound)).usedIndexTable.isEmpty,
      "unsound member arm must decline the cross-OR route")
    assert(spark.sql("SELECT k FROM gwxor.`t$wide` " +
      "WHERE city = 'c1' OR pop < 2 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq ==
      (1 to 40).filter(i => i != 13 && (i % 4 == 1 || i % 10 < 2))
        .map(_.toLong))
    // over the arm cap (64): the parse bails, residual-only, still exact
    val bigIn = sources.In("pop",
      (0L until 70L).map(java.lang.Long.valueOf).toArray[Any])
    assert(built(Array(sources.Or(sources.EqualTo("city", "c1"), bigIn)))
      .usedIndexTable.isEmpty, "over-cap cross-OR must fall back")
    // a bounded range arm + an equality on the other column still routes
    val rangeCross = sources.Or(
      sources.And(sources.GreaterThanOrEqual("pop", java.lang.Long.valueOf(6L)),
        sources.LessThan("pop", java.lang.Long.valueOf(8L))),
      sources.EqualTo("city", "c2"))
    assert(built(Array(rangeCross)).crossOrIndexTables.size == 2)
    assert(spark.sql("SELECT k FROM gwxor.`t$wide` " +
      "WHERE (pop >= 6 AND pop < 8) OR city = 'c2' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq ==
      (1 to 40).filter(i => i != 13 &&
        (i % 10 == 6 || i % 10 == 7 || i % 4 == 2)).map(_.toLong))
  }

  test("conjunct-SUPERSET OR: an And disjunct over mixed columns routes " +
      "by its indexed conjunct's arm") {
    // `(a AND b) OR c` — strict parses bail on the mixed And; the
    // superset retry routes the disjunct by ONE of its INDEXED
    // conjuncts (a value superset of the conjunction), sound because
    // the Or stays residual (r12)
    val root = freshRoot("widecso")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;f:pop:long;f:note:string")), 1L)
    g.table("t").put((1 to 40).map(i =>
      Put(Bytes.toBytes(i.toLong))
        .add("f", b("city"), 2L, b(s"c${i % 4}"))
        .add("f", b("pop"), 2L, Bytes.toBytes((i % 10).toLong))
        .add("f", b("note"), 2L, b(s"n${i % 3}"))), 2L)
    g.createIndex("t", "f", b("city"), 3L)
    g.createIndex("t", "f", b("pop"), 3L)
    register("gwcso", root)
    import org.apache.spark.sql.sources
    val spec = WideSpec.parse(Some("k:long"),
      Some("f:city:string;f:pop:long;f:note:string"))
    def built(fs: Array[sources.Filter]): GraftWideScan = {
      val bld = new GraftWideScanBuilder(g.catalog, "t", spec,
        g.catalog.currentManifest("t"))
      bld.pushFilters(fs): Unit
      bld.build().asInstanceOf[GraftWideScan]
    }
    // SAME-column superset: `(city='c1' AND pop=3) OR city='c2'` routes
    // as one probeOr pass on the city index (arms c1 ∪ c2)
    val sameCol = sources.Or(
      sources.And(sources.EqualTo("city", "c1"),
        sources.EqualTo("pop", java.lang.Long.valueOf(3L))),
      sources.EqualTo("city", "c2"))
    assert(built(Array(sameCol)).usedIndexTable.exists(_.contains("t_idx_f_")),
      "same-column superset OR did not route")
    assert(spark.sql("SELECT k FROM gwcso.`t$wide` " +
      "WHERE (city = 'c1' AND pop = 3) OR city = 'c2' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq ==
      (1 to 40).filter(i => (i % 4 == 1 && i % 10 == 3) || i % 4 == 2)
        .map(_.toLong))
    // CROSS-column superset: `(pop=3 AND note='n1') OR city='c2'` — note
    // is unindexed, so the disjunct routes by its pop conjunct; the
    // residual Or re-applies the exact note condition
    val crossCol = sources.Or(
      sources.And(sources.EqualTo("note", "n1"),
        sources.EqualTo("pop", java.lang.Long.valueOf(3L))),
      sources.EqualTo("city", "c2"))
    assert(built(Array(crossCol)).crossOrIndexTables.size == 2,
      "cross-column superset OR did not route both indexes")
    assert(spark.sql("SELECT k FROM gwcso.`t$wide` " +
      "WHERE (note = 'n1' AND pop = 3) OR city = 'c2' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq ==
      (1 to 40).filter(i => (i % 3 == 1 && i % 10 == 3) || i % 4 == 2)
        .map(_.toLong))
    // no indexed conjunct in a disjunct: the route declines whole,
    // residual-only, still exact
    val noIx = sources.Or(
      sources.And(sources.EqualTo("note", "n1"),
        sources.EqualTo("note", "n2")),
      sources.EqualTo("city", "c2"))
    assert(built(Array(noIx)).usedIndexTable.isEmpty,
      "un-routable And disjunct must decline")
    assert(spark.sql("SELECT k FROM gwcso.`t$wide` " +
      "WHERE (note = 'n1' AND note = 'n2') OR city = 'c2' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq ==
      (1 to 40).filter(_ % 4 == 2).map(_.toLong))
  }

  test("MIXED key/value OR: a RowFilter-OR-SCVF disjunction routes as " +
      "key ranges unioned with index probes") {
    // the reference's classic FilterList(MUST_PASS_ONE) shape: one
    // disjunct on the ROW, one on an indexed VALUE column (r12)
    val root = freshRoot("widemixor")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;f:pop:long;f:note:string")), 1L)
    // includes a NEGATIVE key: `k < 5` on a plain signed head must keep
    // the negative byte region (k = -3 satisfies it but byte-sorts
    // above every non-negative) — the mixed route's key arms carry the
    // same negative-region adjustment as keyRangeOr
    g.table("t").put((Seq(-3L) ++ (1L to 40L)).map(i =>
      Put(Bytes.toBytes(i))
        .add("f", b("city"), 2L, b(s"c${math.floorMod(i, 4)}"))
        .add("f", b("pop"), 2L, Bytes.toBytes(math.floorMod(i, 10)))
        .add("f", b("note"), 2L, b(s"n${math.floorMod(i, 3)}"))), 2L)
    g.createIndex("t", "f", b("city"), 3L)
    g.createIndex("t", "f", b("pop"), 3L)
    register("gwmxor", root)
    def ks(q: String): Seq[Long] =
      spark.sql(q).collect().map(_.getLong(0)).toSeq.sorted
    val q1 = "SELECT k FROM gwmxor.`t$wide` WHERE k < 5 OR pop = 3"
    val df1 = spark.sql(q1)
    assert(ks(q1) == (Seq(-3L) ++ (1L to 40L))
      .filter(i => i < 5 || math.floorMod(i, 10) == 3).sorted)
    val shapes = GraftWideSeams.mixedOrShapes(df1)
    assert(shapes.nonEmpty && shapes.head._1 == 2 &&
      shapes.head._2.sizeIs == 1,
      s"expected (2 key arms incl. negative region, 1 index): $shapes")
    // two value members + an IN key arm set
    val q2 = "SELECT k FROM gwmxor.`t$wide` " +
      "WHERE k IN (2, 30) OR city = 'c1' OR pop = 3"
    assert(ks(q2) == (Seq(-3L) ++ (1L to 40L)).filter(i =>
      i == 2 || i == 30 || math.floorMod(i, 4) == 1 ||
        math.floorMod(i, 10) == 3).sorted)
    assert(GraftWideSeams.mixedOrShapes(spark.sql(q2))
      .exists(_._2.sizeIs == 2), "both indexes should probe")
    // an UNINDEXED value member declines the whole route (residual-only,
    // still exact)
    val q3 = "SELECT k FROM gwmxor.`t$wide` WHERE k < 5 OR note = 'n1'"
    val df3 = spark.sql(q3)
    assert(ks(q3) == (Seq(-3L) ++ (1L to 40L))
      .filter(i => i < 5 || math.floorMod(i, 3) == 1).sorted)
    assert(GraftWideSeams.mixedOrShapes(df3).isEmpty &&
      GraftWideSeams.usedIndexTables(df3).isEmpty,
      "unindexed mixed member must decline the route")
  }

  test("manifest-size statistics flow through the WIDE door too " +
      "(GraftStatsRule fires on its V1ScanWrapper)") {
    val root = freshRoot("widestats")
    val g = mkTable(root)
    register("gwst", root)
    // seam: the wide V2 scan reports the manifest's live data-dir bytes
    val spec2 = WideSpec.parse(Some("k:long"), Some("f:city:string;f:pop:long"))
    val scan = new GraftWideScanBuilder(g.catalog, "t", spec2,
      g.catalog.currentManifest("t")).build().asInstanceOf[GraftWideScan]
    val st = scan.estimateStatistics()
    assert(st.sizeInBytes.isPresent && st.sizeInBytes.getAsLong ==
      g.catalog.manifestBytes(g.catalog.currentManifest("t")))
    // ... and reach the optimizer's sizing through the stats rule (the
    // rule matches ANY V1ScanWrapper — this is the wide-door twin of
    // SqlCatalogSpec's cell-door assert)
    val logical = spark.sql("SELECT k, city FROM gwst.`t$wide`")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(logical > 0 && logical < 10L * 1024 * 1024, logical)
    // a join against a too-big-to-broadcast frame plans the WIDE side as
    // the broadcast side with no hint
    val big = spark.range(0, 20000000L).select(col("id").as("jk"))
    val joined = spark.sql("SELECT k, city FROM gwst.`t$wide`")
      .join(big, col("k") === col("jk"))
    assert(joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), joined.queryExecution.executedPlan)
  }

  test("conjunct-INTERSECT OR (r13): an And disjunct with BOTH conjuncts " +
      "indexed probes both indexes and intersects before the gather") {
    val root = freshRoot("wideisect")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;f:pop:long;f:tag:string")), 1L)
    g.table("t").put((1 to 200).map(i =>
      Put(Bytes.toBytes(i.toLong))
        .add("f", b("city"), 2L, b(s"c${i % 20}"))
        .add("f", b("pop"), 2L, Bytes.toBytes((i % 7).toLong))
        .add("f", b("tag"), 2L, b(s"t${i % 50}"))), 2L)
    g.createIndex("t", "f", b("city"), 3L)
    g.createIndex("t", "f", b("pop"), 3L)
    g.createIndex("t", "f", b("tag"), 3L)
    register("gwis", root)
    // r12 routed this shape by ONE conjunct's arms (a value superset of
    // the And); r13 probes BOTH indexed conjuncts and intersects their
    // candidate row keys before the gather — fewer rows fetched, same
    // residual-exact answer
    val df = spark.sql("SELECT k FROM gwis.`t$wide` " +
      "WHERE (city = 'c3' AND pop = 3) OR tag = 't1' ORDER BY k")
    val expect = (1 to 200).filter(i =>
      (i % 20 == 3 && i % 7 == 3) || i % 50 == 1).map(_.toLong)
    assert(df.collect().map(_.getLong(0)).toSeq == expect)
    val memberTables = GraftWideSeams.crossOrMemberTables(df)
    assert(memberTables.exists(_.distinct.sizeIs == 2),
      s"expected one member probing TWO index tables, got $memberTables")
    assert(memberTables.flatten.distinct.sizeIs == 3,
      s"all three indexes should participate, got $memberTables")
    // an And with ONE unindexed conjunct still routes by the indexed
    // leg alone (the r12 superset pick, unchanged) — drop the pop index
    // by querying an unindexed column in the conjunct
    val df2 = spark.sql("SELECT k FROM gwis.`t$wide` " +
      "WHERE (city = 'c3' AND k < 100) OR tag = 't1' ORDER BY k")
    val expect2 = (1 to 200).filter(i =>
      (i % 20 == 3 && i < 100) || i % 50 == 1).map(_.toLong)
    assert(df2.collect().map(_.getLong(0)).toSeq == expect2)
  }

  test("route selectivity guard: a MEASURED anti-selective arm falls " +
      "back to the pushed scan; selective arms keep routing") {
    val root = freshRoot("wideguard")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:status:string;f:pop:long")), 1L)
    // 'O' covers half the table (anti-selective), 'P' ~0.25%
    g.table("t").put((1 to 2000).map(i =>
      Put(Bytes.toBytes(i.toLong))
        .add("f", b("status"), 2L,
          b(if (i % 400 == 3) "P" else if (i % 2 == 0) "O" else "F"))
        .add("f", b("pop"), 2L, Bytes.toBytes(i.toLong))), 2L)
    g.createIndex("t", "f", b("status"), 3L)
    register("gwg", root)
    // the floor exists so SMALL indexes never pay the measurement —
    // zero it so this fixture is measured like a large table would be
    spark.conf.set("spark.graft.route.guard.minIndexRows", "0")
    try {
      val expO = (1 to 2000)
        .filter(i => i % 2 == 0 && i % 400 != 3).map(_.toLong)
      val anti = spark.sql(
        "SELECT k, status FROM gwg.`t$wide` WHERE status = 'O' ORDER BY k")
      assert(anti.collect().map(_.getLong(0)).toSeq == expO)
      assert(GraftWideSeams.usedIndexTables(anti).isEmpty,
        "anti-selective arm must fall back to the pushed scan")
      assert(GraftRouteSeams.guardDeclined(anti),
        "guard-decline seam must report")
      // an anti-selective OR disjunction declines the same way
      val antiOr = spark.sql("SELECT k, status FROM gwg.`t$wide` " +
        "WHERE status = 'O' OR status = 'ZZZ' ORDER BY k")
      assert(antiOr.collect().map(_.getLong(0)).toSeq == expO)
      assert(GraftWideSeams.usedIndexTables(antiOr).isEmpty &&
        GraftRouteSeams.guardDeclined(antiOr))
      // selective: 'P' routes through the index, guard quiet
      val sel = spark.sql(
        "SELECT k, status FROM gwg.`t$wide` WHERE status = 'P' ORDER BY k")
      assert(sel.collect().map(_.getLong(0)).toSeq ==
        (1 to 2000).filter(_ % 400 == 3).map(_.toLong))
      assert(GraftWideSeams.usedIndexTables(sel).nonEmpty,
        "selective arm should keep routing")
      assert(!GraftRouteSeams.guardDeclined(sel))
      // the guard is a cost-only knob: disabled, the anti-selective arm
      // routes again and still returns the same rows (residual exactness)
      spark.conf.set("spark.graft.route.guard.enabled", "false")
      try {
        val forced = spark.sql(
          "SELECT k, status FROM gwg.`t$wide` WHERE status = 'O' ORDER BY k")
        assert(forced.collect().map(_.getLong(0)).toSeq == expO)
        assert(GraftWideSeams.usedIndexTables(forced).nonEmpty)
      } finally spark.conf.unset("spark.graft.route.guard.enabled")
      // CELL door: the same anti-selective value equality declines too
      g.createTable(TableDescriptor("c", Seq(FamilyDescriptor("f")),
        splitKeys = 2), 1L)
      g.table("c").put((1 to 2000).map(i =>
        Put(b(f"r$i%04d")).add("f", b("st"), 2L,
          b(if (i % 2 == 0) "O" else "F"))), 2L)
      g.createIndex("c", "f", b("st"), 3L)
      val stQ = "X'" + "st".getBytes("UTF-8").map(x => f"$x%02x").mkString + "'"
      val oV = "X'" + "O".getBytes("UTF-8").map(x => f"$x%02x").mkString + "'"
      val cAnti = spark.sql("SELECT row FROM gwg.c WHERE family = 'f' " +
        s"AND qualifier = $stQ AND value = $oV")
      assert(cAnti.collect().length == 1000)
      assert(GraftRouteSeams.guardDeclined(cAnti),
        "cell-door anti-selective value equality must decline")
    } finally spark.conf.unset("spark.graft.route.guard.minIndexRows")
  }

  test("DDL declares the wide view; SHOW/DML still hit the cell table") {
    val root = freshRoot("wideddl")
    register("gwd", root)
    spark.sql("CREATE TABLE gwd.td TBLPROPERTIES('families'='f', " +
      "'wideKey'='k:long', 'wideSchema'='f:c:string')")
    spark.sql("INSERT INTO gwd.td VALUES " +
      s"(X'0000000000000007', 'f', X'63', 1, CAST(4 AS TINYINT), X'7878', 0)")
    val out = spark.sql("SELECT k, c FROM gwd.`td$wide`").collect()
    assert(out.length == 1 && out(0).getLong(0) == 7L && out(0).getString(1) == "xx")
  }
}
