package graft.sql

import graft.{Graft, SparkSpec}
import graft.catalog.{FamilyDescriptor, TableDescriptor}
import graft.core.Bytes
import graft.write.Put
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}

/** Runtime (join-driven) key pruning — the dynamic multiGet: a
  * `fact JOIN small-dim ON fact.key = dim.k` re-prunes the fact scan's
  * key ranges with the dim's actual values at execution. */
class RuntimeFilterSpec extends SparkSpec {

  private def b(s: String) = Bytes.toBytes(s)
  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString
  private def register(cat: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
  }

  /** All graft scans under a frame's optimized plan (triggers
    * optimization, so the rule has run by the time this returns). */
  private def graftScans(df: DataFrame): Seq[GraftRuntimeFilterable] =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan match {
        case w: V1ScanWrapper => w.v1Scan
        case s => s
      }
    }.collect { case g: GraftRuntimeFilterable => g }

  test("cell door: a fact-dim join re-prunes the scan to the dim's keys") {
    val root = freshRoot("rtf-cell")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 4), 1L)
    g.table("t").put((1 to 200).map(i =>
      Put(b(f"r$i%03d")).add("f", b("q"), 2L, b(s"v$i"))), 2L)
    register("grtf", root)
    import spark.implicits._
    Seq("r005", "r017", "r141").toDF("k")
      .select(org.apache.spark.sql.functions.encode($"k", "UTF-8").as("rk"))
      .createOrReplaceTempView("rtf_dim")
    val q = "SELECT t.row, t.value FROM grtf.t t JOIN rtf_dim d " +
      "ON t.row = d.rk WHERE t.family = 'f'"
    // unpruned baseline (conf off)
    spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
    val base = try {
      val df = spark.sql(q)
      assert(graftScans(df).forall(!_.runtimeAttempted))
      df.collect().map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")).toSet
    } finally spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
    assert(base == Set("r005", "r017", "r141"))
    // pruned run: the rule attached, execution collected + applied
    val df = spark.sql(q)
    val scans = graftScans(df)
    assert(scans.exists(_.runtimeAttempted), "rule never attached a probe")
    val got = df.collect().map(r =>
      new String(r.getAs[Array[Byte]](0), "UTF-8")).toSet
    assert(got == base)
    assert(scans.exists(_.runtimePruned), "probe attached but never applied")
  }

  test("wide door: typed key-head join prunes; results match unpruned") {
    val root = freshRoot("rtf-wide")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 4, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;f:pop:long")), 1L)
    g.table("t").put((1 to 200).map(i =>
      Put(Bytes.toBytes(i.toLong)).add("f", b("city"), 2L, b(s"c$i"))
        .add("f", b("pop"), 2L, Bytes.toBytes(i.toLong * 10))), 2L)
    register("grtfw", root)
    import spark.implicits._
    Seq(3L, 77L, 190L).toDF("k").createOrReplaceTempView("rtf_dim_w")
    val q = "SELECT t.k, t.city, t.pop FROM grtfw.`t$wide` t " +
      "JOIN rtf_dim_w d ON t.k = d.k"
    spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
    val base = try spark.sql(q).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    finally spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
    assert(base == Set((3L, "c3", 30L), (77L, "c77", 770L),
      (190L, "c190", 1900L)))
    val df = spark.sql(q)
    val scans = graftScans(df)
    assert(scans.exists(_.runtimeAttempted), "rule never attached a probe")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == base)
    assert(scans.exists(_.runtimePruned), "probe attached but never applied")
    // the runtime probes reach PARQUET on the unsalted path: the inner
    // plan's scan carries the per-key row ranges as pushed filters (the
    // same range-disjunction shape the static IN pushes)
    val inner = scans.collectFirst { case s: GraftWideScan => s }.get
      .resolvedFrame(spark).queryExecution.executedPlan.toString
    val pushedLine = inner.linesIterator
      .filter(_.contains("PushedFilters")).mkString(" | ")
    assert(pushedLine.contains("GreaterThanOrEqual(row") ||
      pushedLine.contains("Or(And(GreaterThanOrEqual(row"),
      s"runtime probes not pushed to parquet:\n$pushedLine")
    // salted variant: the probes route through the salted scopeKeys path
    val root2 = freshRoot("rtf-wide-salt")
    val g2 = Graft(spark, root2)
    g2.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 4, saltBuckets = 4, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;f:pop:long")), 1L)
    g2.table("t").put((1 to 200).map(i =>
      Put(Bytes.toBytes(i.toLong)).add("f", b("city"), 2L, b(s"c$i"))
        .add("f", b("pop"), 2L, Bytes.toBytes(i.toLong * 10))), 2L)
    register("grtfws", root2)
    val dfs = spark.sql("SELECT t.k, t.city FROM grtfws.`t$wide` t " +
      "JOIN rtf_dim_w d ON t.k = d.k")
    assert(dfs.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((3L, "c3"), (77L, "c77"), (190L, "c190")))
    assert(graftScans(dfs).exists(_.runtimePruned))
  }

  test("indexed value column: a runtime In routes through the index") {
    val root = freshRoot("rtf-ix")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 4, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;f:pop:long")), 1L)
    g.table("t").put((1 to 200).map(i =>
      Put(Bytes.toBytes(i.toLong))
        .add("f", b("city"), 2L, b(s"c${i % 20}"))
        .add("f", b("pop"), 2L, Bytes.toBytes(i.toLong * 10))), 2L)
    g.createIndex("t", "f", b("city"), 3L)
    register("grtfi2", root)
    import spark.implicits._
    Seq("c3", "c17").toDF("city").createOrReplaceTempView("rtf_dim_ix")
    val q = "SELECT t.k, t.city, t.pop FROM grtfi2.`t$wide` t " +
      "JOIN rtf_dim_ix d ON t.city = d.city"
    spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
    val base = try spark.sql(q).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    finally spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
    assert(base.size == 20 && base.forall { case (k, c, p) =>
      c == s"c${k % 20}" && p == k * 10 && (k % 20 == 3 || k % 20 == 17) })
    val df = spark.sql(q)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == base)
    assert(graftScans(df).exists(_.runtimePruned),
      "indexed-column probe never applied")
    // the executed inner plan reads the INDEX table (the route fired)
    val scan = graftScans(df).collectFirst {
      case s: GraftWideScan => s
    }.get
    val plan = scan.resolvedFrame(spark).queryExecution.executedPlan.toString
    assert(plan.contains("t_idx_f_"),
      s"runtime In did not route through the index:\n$plan")
  }

  test("an empty dim scopes the scan to nothing (and stays correct)") {
    val root = freshRoot("rtf-empty")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string")), 1L)
    g.table("t").put((1 to 20).map(i =>
      Put(Bytes.toBytes(i.toLong)).add("f", b("city"), 2L, b(s"c$i"))), 2L)
    register("grtfe", root)
    // a PLAN-TIME-empty dim (empty LocalRelation) is eliminated by
    // PropagateEmptyRelation before the rule ever runs — the interesting
    // case is a dim that is only empty AT RUNTIME (a leaf + filter the
    // optimizer cannot fold away)
    val df = spark.sql("SELECT t.k FROM grtfe.`t$wide` t " +
      "JOIN (SELECT id AS k FROM range(1, 100) WHERE id > 1000) d " +
      "ON t.k = d.k")
    // collect() (not count()) — count() re-plans through a fresh
    // QueryExecution with fresh scan objects; the seam below must see
    // the scans THIS frame executed
    assert(df.collect().isEmpty)
    assert(graftScans(df).exists(_.runtimePruned))
  }

  test("outer joins and pushed limits decline; oversized dims fall back") {
    val root = freshRoot("rtf-decl")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string")), 1L)
    g.table("t").put((1 to 50).map(i =>
      Put(Bytes.toBytes(i.toLong)).add("f", b("city"), 2L, b(s"c$i"))), 2L)
    register("grtfd", root)
    import spark.implicits._
    Seq(3L, 7L).toDF("k").createOrReplaceTempView("rtf_dim_d")
    // LEFT OUTER with the fact on the LEFT: unmatched fact rows must
    // survive, so no probe lands on the fact scan
    val lo = spark.sql("SELECT t.k, d.k FROM grtfd.`t$wide` t " +
      "LEFT JOIN rtf_dim_d d ON t.k = d.k")
    assert(graftScans(lo).forall(!_.runtimeAttempted))
    assert(lo.collect().length == 50)
    // over-cap dim: attach happens, the collect declines, results exact
    spark.conf.set("spark.graft.runtimeFilter.maxKeys", "2")
    try {
      val big = spark.sql("SELECT t.k FROM grtfd.`t$wide` t JOIN " +
        "(SELECT explode(sequence(1L, 10L)) AS k) d ON t.k = d.k")
      assert(big.collect().length == 10)
      val scans = graftScans(big)
      assert(scans.exists(_.runtimeAttempted))
      assert(scans.forall(!_.runtimePruned), "over-cap dim must decline")
    } finally spark.conf.unset("spark.graft.runtimeFilter.maxKeys")
  }

  test("the official SupportsRuntimeFiltering surface re-prunes directly") {
    // the interface Spark would drive if these scans ever plan as V2
    // batches: filter(In(key, vs)) scopes the scan like the static IN
    val root = freshRoot("rtf-iface")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2), 1L)
    g.table("t").put((1 to 30).map(i =>
      Put(b(f"r$i%03d")).add("f", b("q"), 2L, b(s"v$i"))), 2L)
    register("grtfi", root)
    val df = spark.sql("SELECT row, value FROM grtfi.t WHERE family = 'f'")
    val scan = graftScans(df).head
    assert(scan.filterAttributes().map(_.describe()).toSeq == Seq("row"))
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("row",
        Array[Any](b("r002"), b("r019")))))
    assert(scan.runtimePruned)
    val got = df.collect().map(r =>
      new String(r.getAs[Array[Byte]]("row"), "UTF-8")).toSet
    assert(got == Set("r002", "r019"))
  }
}
