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

  test("outer joins decline; over-cap dims degrade to a key-RANGE prune") {
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
    // over-cap dim: the key enumeration declines, but the probe DEGRADES
    // to the [min, max] key-range superset (one extra aggregate over the
    // size-gated dim) instead of running unpruned — the mid-size-dim
    // star-join case
    spark.conf.set("spark.graft.runtimeFilter.maxKeys", "2")
    try {
      val big = spark.sql("SELECT t.k FROM grtfd.`t$wide` t JOIN " +
        "(SELECT explode(sequence(5L, 14L)) AS k) d ON t.k = d.k")
      assert(big.collect().map(_.getLong(0)).toSet == (5L to 14L).toSet)
      val scans = graftScans(big)
      assert(scans.exists(_.runtimeAttempted))
      assert(scans.flatMap(_.runtimeProbeShapes).contains(("k", "range")),
        "over-cap dim must degrade to a range probe")
    } finally spark.conf.unset("spark.graft.runtimeFilter.maxKeys")
  }

  test("over-cap range on a PLAIN signed head splits the sign regions") {
    // plain long head: negatives byte-sort ABOVE all non-negatives, so a
    // mixed-sign [min, max] must prune as TWO byte ranges — a single
    // [enc(min), succ(enc(max))) range would be byte-EMPTY and silently
    // drop every row (the join cannot resurrect pruned rows)
    val root = freshRoot("rtf-neg")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string")), 1L)
    g.table("t").put((-10L to 10L).map(i =>
      Put(Bytes.toBytes(i)).add("f", b("city"), 2L, b(s"c$i"))), 2L)
    register("grtfn", root)
    spark.conf.set("spark.graft.runtimeFilter.maxKeys", "3")
    try {
      val df = spark.sql("SELECT t.k, t.city FROM grtfn.`t$wide` t JOIN " +
        "(SELECT explode(sequence(-5L, 5L)) AS k) d ON t.k = d.k")
      assert(df.collect().map(_.getLong(0)).toSet == (-5L to 5L).toSet)
      assert(graftScans(df).flatMap(_.runtimeProbeShapes)
        .contains(("k", "range")))
    } finally spark.conf.unset("spark.graft.runtimeFilter.maxKeys")
  }

  test("cell door: over-cap dims degrade to a binary row-range prune") {
    val root = freshRoot("rtf-cellrange")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2), 1L)
    g.table("t").put((1 to 40).map(i =>
      Put(b(f"r$i%03d")).add("f", b("q"), 2L, b(s"v$i"))), 2L)
    register("grtfcr", root)
    import spark.implicits._
    (10 to 19).map(i => f"r$i%03d").toDF("k")
      .select(org.apache.spark.sql.functions.encode($"k", "UTF-8").as("rk"))
      .createOrReplaceTempView("rtf_dim_cr")
    spark.conf.set("spark.graft.runtimeFilter.maxKeys", "2")
    try {
      val df = spark.sql("SELECT t.row FROM grtfcr.t t JOIN rtf_dim_cr d " +
        "ON t.row = d.rk WHERE t.family = 'f'")
      val got = df.collect()
        .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")).toSet
      assert(got == (10 to 19).map(i => f"r$i%03d").toSet)
      assert(graftScans(df).flatMap(_.runtimeProbeShapes)
        .contains(("row", "range")))
    } finally spark.conf.unset("spark.graft.runtimeFilter.maxKeys")
  }

  test("a dim containing LIMIT/TABLESAMPLE declines (row-selection hazard)") {
    // the probe executes the dim subtree out of band; a LIMIT without a
    // defining order can return a DIFFERENT row set in the join's own
    // execution, so pruning with its first answer could drop matching
    // fact rows — the rule must not attach at all
    val root = freshRoot("rtf-lim")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string")), 1L)
    g.table("t").put((1 to 30).map(i =>
      Put(Bytes.toBytes(i.toLong)).add("f", b("city"), 2L, b(s"c$i"))), 2L)
    register("grtfl", root)
    val lim = spark.sql("SELECT t.k FROM grtfl.`t$wide` t JOIN " +
      "(SELECT explode(sequence(1L, 9L)) AS k LIMIT 4) d ON t.k = d.k")
    assert(graftScans(lim).forall(!_.runtimeAttempted),
      "a LIMIT dim must not attach a probe")
    assert(lim.collect().length == 4)
    val samp = spark.sql("SELECT t.k FROM grtfl.`t$wide` t JOIN " +
      "(SELECT k FROM (SELECT explode(sequence(1L, 9L)) AS k) " +
      "TABLESAMPLE (50 PERCENT)) d ON t.k = d.k")
    assert(graftScans(samp).forall(!_.runtimeAttempted),
      "a TABLESAMPLE dim must not attach a probe")
    samp.collect(): Unit
    // dropDuplicates on a SUBSET optimizes to Aggregate(groupBy subset,
    // first(others)); first() reports deterministic=true but legally
    // returns a DIFFERENT representative per execution — pruning with
    // the probe's answer could drop rows the join's own execution
    // matches, so the rule must decline (same hazard class as LIMIT)
    import spark.implicits._
    Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b")).toDF("k", "grp")
      .createOrReplaceTempView("rtf_dim_dd")
    val dd = spark.sql("SELECT t.k FROM grtfl.`t$wide` t JOIN " +
      "(SELECT first(k) AS k FROM rtf_dim_dd GROUP BY grp) d ON t.k = d.k")
    assert(graftScans(dd).forall(!_.runtimeAttempted),
      "an order-dependent aggregate dim must not attach a probe")
    dd.collect(): Unit
    // ...while order-INSENSITIVE aggregates (min/max/sum/count + group
    // keys) still attach: their output row set is execution-stable
    val ok = spark.sql("SELECT t.k FROM grtfl.`t$wide` t JOIN " +
      "(SELECT min(k) AS k FROM rtf_dim_dd GROUP BY grp) d ON t.k = d.k")
    ok.collect(): Unit
    assert(graftScans(ok).exists(_.runtimePruned),
      "a min/max aggregate dim should still prune")
  }

  test("key-covering dedup dims prune; probes on unstable columns and " +
      "float sums still decline") {
    val root = freshRoot("rtf-dd")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string")), 1L)
    g.table("t").put((1 to 30).map(i =>
      Put(Bytes.toBytes(i.toLong)).add("f", b("city"), 2L, b(s"c$i"))), 2L)
    register("grtfd", root)
    import spark.implicits._
    Seq((3L, "a", 1.5), (3L, "b", 2.5), (7L, "a", 3.25), (11L, "c", 4.0))
      .toDF("k", "grp", "dbl").createOrReplaceTempView("rtf_dim_kc")
    // dropDuplicates(subset) compiles to Aggregate(groupBy k, first(grp))
    // — First's representative is execution-unstable, but the probe's
    // key expression references ONLY the grouping key k, whose SET is
    // stable: the r13 relaxation attaches where r12 declined
    val dd = spark.sql("SELECT t.k, d.g FROM grtfd.`t$wide` t JOIN " +
      "(SELECT k, first(grp) AS g FROM rtf_dim_kc GROUP BY k) d " +
      "ON t.k = d.k")
    assert(dd.collect().map(_.getLong(0)).toSet == Set(3L, 7L, 11L))
    assert(graftScans(dd).exists(_.runtimePruned),
      "a key-covering dedup dim should prune (probe refs ⊆ group keys)")
    // counter-case: the probe key IS the First output — representative-
    // dependent, must still decline (this is the r12 hazard unchanged)
    val bad = spark.sql("SELECT t.k FROM grtfd.`t$wide` t JOIN " +
      "(SELECT first(k) AS k FROM rtf_dim_kc GROUP BY grp) d ON t.k = d.k")
    assert(graftScans(bad).forall(!_.runtimeAttempted),
      "a probe on a First output must not attach")
    bad.collect(): Unit
    // float sums are NOT execution-stable (non-associative addition
    // across partition merge orders) — ADVICE r12: a probe keyed on
    // sum(double) must decline...
    val fsum = spark.sql("SELECT t.k FROM grtfd.`t$wide` t JOIN " +
      "(SELECT CAST(sum(dbl) AS BIGINT) AS k FROM rtf_dim_kc GROUP BY grp)" +
      " d ON t.k = d.k")
    assert(graftScans(fsum).forall(!_.runtimeAttempted),
      "a probe keyed on a floating-point sum must not attach")
    fsum.collect(): Unit
    // ...while integral sums stay exact in any order and still prune
    val isum = spark.sql("SELECT t.k FROM grtfd.`t$wide` t JOIN " +
      "(SELECT sum(k) AS k FROM rtf_dim_kc GROUP BY grp) d ON t.k = d.k")
    isum.collect(): Unit
    assert(graftScans(isum).exists(_.runtimePruned),
      "an integral-sum dim should still prune")
  }

  test("cell door: a join on an indexed qualifier VALUE prunes through " +
      "the index; over-cap dims degrade to ArmRanges") {
    val root = freshRoot("rtf-cellval")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 4), 1L)
    g.table("t").put((1 to 200).map(i =>
      Put(b(f"r$i%03d")).add("f", b("city"), 2L, b(f"c${i % 20}%02d"))), 2L)
    g.createIndex("t", "f", b("city"), 3L)
    // an update + a delete AFTER the index build: the probe's candidate
    // set must stay exact through stale entries and tombstones (the
    // join's equality re-check over the RESOLVED rows)
    g.table("t").put(Seq(
      Put(b("r003")).add("f", b("city"), 4L, b("c99"))), 4L)
    g.table("t").delete(
      Seq(graft.write.Delete(b("r023")).deleteFamily("f", 5L)), 5L)
    register("grtfcv", root)
    import spark.implicits._
    val cityQ = "X'" + "city".getBytes("UTF-8")
      .map(x => f"$x%02x").mkString + "'"
    Seq("c03", "c17").toDF("c")
      .select(org.apache.spark.sql.functions.encode($"c", "UTF-8").as("cv"))
      .createOrReplaceTempView("rtf_dim_cv")
    val q = "SELECT t.row FROM grtfcv.t t JOIN rtf_dim_cv d " +
      s"ON t.value = d.cv WHERE t.family = 'f' AND t.qualifier = $cityQ"
    spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
    val base = try {
      val df = spark.sql(q)
      assert(graftScans(df).forall(!_.runtimeAttempted))
      df.collect().map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")).toSet
    } finally spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
    // r003 updated away from c03; r023 (== c03 mod 20) deleted
    assert(base == (1 to 200)
      .filter(i => i % 20 == 3 || i % 20 == 17)
      .map(i => f"r$i%03d").toSet -- Set("r003", "r023"), s"fixture: $base")
    val df = spark.sql(q)
    val got = df.collect()
      .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")).toSet
    assert(got == base)
    val scans = graftScans(df)
    assert(scans.flatMap(_.runtimeProbeShapes).contains(("value", "keys")),
      s"expected a value-keys probe, got ${scans.flatMap(_.runtimeProbeShapes)}")
    assert(scans.collect { case s: GraftV1Scan => s }
      .exists(_.usedIndexTable.isDefined), "value probe did not route " +
      "through the index")
    // over the key cap: the probe degrades to index RANGE arms instead
    // of declining — same answer, ("value", "range") shape
    spark.conf.set("spark.graft.runtimeFilter.maxKeys", "1")
    try {
      val dfr = spark.sql(q)
      assert(dfr.collect()
        .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")).toSet == base)
      assert(graftScans(dfr).flatMap(_.runtimeProbeShapes)
        .contains(("value", "range")))
    } finally spark.conf.unset("spark.graft.runtimeFilter.maxKeys")
    // a time-travel or statically-routed scan does not expose the value
    // attribute; a LIMIT-pushed scan declines entirely (existing rule)
  }

  test("over-cap STRING and BINARY keys cluster by byte prefix " +
      "(gap-skipping ranges, rangeCount > 1)") {
    val root = freshRoot("rtf-pfx")
    val g = Graft(spark, root)
    // wide door: string single-part key (r12 degraded these to the one
    // [min, max] span; r13 occupancy-clusters a 7-byte encoded prefix)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 4, wideKey = Some("k:string"),
      wideSchema = Some("f:pop:long")), 1L)
    g.table("t").put((1 to 500).map(i =>
      Put(b(f"r$i%04d")).add("f", b("pop"), 2L, Bytes.toBytes(i.toLong))), 2L)
    // cell door: raw binary row keys, same clustered shape
    g.createTable(TableDescriptor("c", Seq(FamilyDescriptor("f")),
      splitKeys = 4), 1L)
    g.table("c").put((1 to 500).map(i =>
      Put(b(f"r$i%04d")).add("f", b("q"), 2L, b(s"v$i"))), 2L)
    register("grtfx", root)
    import spark.implicits._
    // dim keys in TWO byte-separated clusters with a wide hole between
    val dimKeys = ((10 to 99) ++ (400 to 450)).map(i => f"r$i%04d")
    dimKeys.toDF("k").createOrReplaceTempView("rtf_dim_pfx")
    dimKeys.toDF("k")
      .select(org.apache.spark.sql.functions.encode($"k", "UTF-8").as("rk"))
      .createOrReplaceTempView("rtf_dim_pfxc")
    spark.conf.set("spark.graft.runtimeFilter.maxKeys", "8")
    try {
      val dfw = spark.sql("SELECT t.k, t.pop FROM grtfx.`t$wide` t " +
        "JOIN rtf_dim_pfx d ON t.k = d.k")
      assert(dfw.collect().map(_.getString(0)).toSet == dimKeys.toSet)
      val wScans = graftScans(dfw)
      assert(wScans.flatMap(_.runtimeProbeShapes).contains(("k", "range")),
        s"wide: ${wScans.flatMap(_.runtimeProbeShapes)}")
      val wRc = wScans.flatMap(_.runtimeRangeCounts)
      assert(wRc.exists(_._2 > 1),
        s"wide string head: expected gap-separated prefix runs, got $wRc")
      val dfc = spark.sql("SELECT t.row FROM grtfx.c t " +
        "JOIN rtf_dim_pfxc d ON t.row = d.rk WHERE t.family = 'f'")
      assert(dfc.collect()
        .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")).toSet ==
        dimKeys.toSet)
      val cScans = graftScans(dfc)
      assert(cScans.flatMap(_.runtimeProbeShapes).contains(("row", "range")),
        s"cell: ${cScans.flatMap(_.runtimeProbeShapes)}")
      val cRc = cScans.flatMap(_.runtimeRangeCounts)
      assert(cRc.exists(_._2 > 1),
        s"cell binary row: expected gap-separated prefix runs, got $cRc")
    } finally spark.conf.unset("spark.graft.runtimeFilter.maxKeys")
  }

  test("multi-attribute: key-head and indexed-column probes intersect") {
    val root = freshRoot("rtf-multi")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 4, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;f:pop:long")), 1L)
    g.table("t").put((1 to 200).map(i =>
      Put(Bytes.toBytes(i.toLong))
        .add("f", b("city"), 2L, b(s"c${i % 20}"))
        .add("f", b("pop"), 2L, Bytes.toBytes(i.toLong * 10))), 2L)
    g.createIndex("t", "f", b("city"), 3L)
    register("grtfm", root)
    import spark.implicits._
    (1L to 60L).toDF("k").createOrReplaceTempView("rtf_dim_k")
    Seq("c3", "c17").toDF("city").createOrReplaceTempView("rtf_dim_c")
    val q = "SELECT t.k, t.city FROM grtfm.`t$wide` t " +
      "JOIN rtf_dim_k dk ON t.k = dk.k " +
      "JOIN rtf_dim_c dc ON t.city = dc.city"
    spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
    val base = try spark.sql(q).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    finally spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
    assert(base == (1L to 60L).filter(k => k % 20 == 3 || k % 20 == 17)
      .map(k => (k, s"c${k % 20}")).toSet)
    val df = spark.sql(q)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSet == base)
    val shapes = graftScans(df).flatMap(_.runtimeProbeShapes).toSet
    assert(shapes == Set(("k", "keys"), ("city", "keys")),
      s"expected both probes applied, got $shapes")
  }

  test("plan-once: re-executing a pruned frame across a dim mutation " +
      "stays consistent (both sides pinned at planning)") {
    val root = freshRoot("rtf-pin")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("fact", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string")), 1L)
    g.table("fact").put((1 to 30).map(i =>
      Put(Bytes.toBytes(i.toLong)).add("f", b("city"), 2L, b(s"c$i"))), 2L)
    g.createTable(TableDescriptor("dim", Seq(FamilyDescriptor("d")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("d:tag:string")), 1L)
    g.table("dim").put(Seq(3L, 7L).map(k =>
      Put(Bytes.toBytes(k)).add("d", b("tag"), 2L, b("x"))), 2L)
    register("grtfp", root)
    val df = spark.sql("SELECT f.k FROM grtfp.`fact$wide` f " +
      "JOIN grtfp.`dim$wide` d ON f.k = d.k")
    assert(df.collect().map(_.getLong(0)).toSet == Set(3L, 7L))
    assert(graftScans(df).exists(_.runtimePruned))
    // mutate the dim AFTER the first execution: a new key that matches
    // an existing fact row. The planned frame pinned BOTH manifests at
    // planning, so re-execution returns the SAME answer — the stale
    // probe can never drop a row the join's own (equally pinned) dim
    // data matches. A FRESH frame sees the new row, pruned.
    g.table("dim").put(Seq(Put(Bytes.toBytes(11L))
      .add("d", b("tag"), 3L, b("x"))), 3L)
    assert(df.collect().map(_.getLong(0)).toSet == Set(3L, 7L),
      "re-execution must stay consistent with the planned snapshot")
    val fresh = spark.sql("SELECT f.k FROM grtfp.`fact$wide` f " +
      "JOIN grtfp.`dim$wide` d ON f.k = d.k")
    assert(fresh.collect().map(_.getLong(0)).toSet == Set(3L, 7L, 11L))
    assert(graftScans(fresh).exists(_.runtimePruned))
  }

  test("a near-cap key set (800 arms) applies without overflowing " +
      "(balanced Or regression)") {
    // the probe Or must build as a BALANCED tree: a linear reduce nests
    // one converter stack frame per arm and overflows past a few
    // hundred keys — caught live at 699 arms (sql_runtime_multi_prune)
    val root = freshRoot("rtf-big")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 4, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string")), 1L)
    g.table("t").put((1 to 1000).map(i =>
      Put(Bytes.toBytes(i.toLong)).add("f", b("city"), 2L, b(s"c$i"))), 2L)
    register("grtfb", root)
    val df = spark.sql("SELECT t.k FROM grtfb.`t$wide` t JOIN " +
      "(SELECT explode(sequence(101L, 900L)) AS k) d ON t.k = d.k")
    assert(df.collect().map(_.getLong(0)).toSet == (101L to 900L).toSet)
    assert(graftScans(df).flatMap(_.runtimeProbeShapes)
      .contains(("k", "keys")))
    // cell door, same arm count through the equality-Or path
    val root2 = freshRoot("rtf-bigc")
    val g2 = Graft(spark, root2)
    g2.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 4), 1L)
    g2.table("t").put((1 to 1000).map(i =>
      Put(b(f"r$i%04d")).add("f", b("q"), 2L, b(s"v$i"))), 2L)
    register("grtfbc", root2)
    import spark.implicits._
    (101 to 900).map(i => f"r$i%04d").toDF("kk")
      .select(org.apache.spark.sql.functions.encode($"kk", "UTF-8").as("rk"))
      .createOrReplaceTempView("rtf_dim_big")
    val dfc = spark.sql("SELECT t.row FROM grtfbc.t t JOIN rtf_dim_big d " +
      "ON t.row = d.rk WHERE t.family = 'f'")
    assert(dfc.collect().length == 800)
    assert(graftScans(dfc).exists(_.runtimePruned))
  }

  test("over-cap CLUSTERED dim prunes as gap-separated ranges; " +
      "maxRanges=1 collapses to the single span") {
    // a dim whose keys live in two separated clusters must not pay for
    // the hole between them: the over-cap degradation buckets the span
    // and keeps only OCCUPIED runs (soundness is per-bucket — every key
    // lands in its bucket's value range, so runs are a superset by
    // construction, never a sample)
    val root = freshRoot("rtf-clu")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 4, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string")), 1L)
    g.table("t").put((0 to 2000).map(i =>
      Put(Bytes.toBytes(i.toLong)).add("f", b("city"), 2L, b(s"c$i"))), 2L)
    register("grtfclu", root)
    spark.conf.set("spark.graft.runtimeFilter.maxKeys", "16")
    spark.conf.set("spark.graft.runtimeFilter.rangeBuckets", "256")
    try {
      val q = "SELECT t.k FROM grtfclu.`t$wide` t JOIN " +
        "(SELECT explode(sequence(100L, 200L)) AS k UNION ALL " +
        "SELECT explode(sequence(1800L, 1900L)) AS k) d ON t.k = d.k"
      val expect = ((100L to 200L) ++ (1800L to 1900L)).toSet
      val df = spark.sql(q)
      assert(df.collect().map(_.getLong(0)).toSet == expect)
      val scans = graftScans(df)
      assert(scans.flatMap(_.runtimeProbeShapes).contains(("k", "range")))
      val counts = scans.flatMap(_.runtimeRangeCounts)
      assert(counts == Seq(("k", 2)), s"expected 2 clustered runs: $counts")
      // maxRanges=1: the same dim collapses to one [min, max] span
      spark.conf.set("spark.graft.runtimeFilter.maxRanges", "1")
      val one = spark.sql(q)
      assert(one.collect().map(_.getLong(0)).toSet == expect)
      assert(graftScans(one).flatMap(_.runtimeRangeCounts) == Seq(("k", 1)))
    } finally {
      spark.conf.unset("spark.graft.runtimeFilter.maxKeys")
      spark.conf.unset("spark.graft.runtimeFilter.rangeBuckets")
      spark.conf.unset("spark.graft.runtimeFilter.maxRanges")
    }
  }

  test("clustered runs on a PLAIN signed head keep the sign regions " +
      "sound") {
    // run bounds are computed in VALUE space and only then encoded, so
    // an all-negative run and an all-positive run each encode exactly,
    // and a sign-straddling run splits (encodeRuntimeRange's existing
    // mixed-sign rule) — no lo > hi byte inversion possible
    val root = freshRoot("rtf-clun")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string")), 1L)
    g.table("t").put((-200L to 200L).map(i =>
      Put(Bytes.toBytes(i)).add("f", b("city"), 2L, b(s"c$i"))), 2L)
    register("grtfclun", root)
    spark.conf.set("spark.graft.runtimeFilter.maxKeys", "16")
    spark.conf.set("spark.graft.runtimeFilter.rangeBuckets", "64")
    try {
      val df = spark.sql("SELECT t.k FROM grtfclun.`t$wide` t JOIN " +
        "(SELECT explode(sequence(-150L, -100L)) AS k UNION ALL " +
        "SELECT explode(sequence(100L, 150L)) AS k) d ON t.k = d.k")
      assert(df.collect().map(_.getLong(0)).toSet ==
        ((-150L to -100L) ++ (100L to 150L)).toSet)
      val counts = graftScans(df).flatMap(_.runtimeRangeCounts)
      assert(counts == Seq(("k", 2)), s"expected 2 sign-pure runs: $counts")
    } finally {
      spark.conf.unset("spark.graft.runtimeFilter.maxKeys")
      spark.conf.unset("spark.graft.runtimeFilter.rangeBuckets")
    }
  }

  test("over-cap dim on an INDEXED value column degrades to index " +
      "RANGE probes (clustered for integral AND string columns)") {
    // r11 declined entirely here; the r12 degradation probes the
    // column's index with an Or of ArmRanges built from the dim's
    // [min, max] (clustered for integral values) — candidates gathered
    // + verified, join re-checks
    val root = freshRoot("rtf-ixr")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 4, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;f:pop:long")), 1L)
    g.table("t").put((0 to 199).map(i =>
      Put(Bytes.toBytes(i.toLong))
        .add("f", b("city"), 2L, b(f"c$i%03d"))
        .add("f", b("pop"), 2L, Bytes.toBytes(i.toLong))), 2L)
    g.createIndex("t", "f", b("pop"), 3L)
    g.createIndex("t", "f", b("city"), 3L)
    register("grtfixr", root)
    spark.conf.set("spark.graft.runtimeFilter.maxKeys", "16")
    spark.conf.set("spark.graft.runtimeFilter.rangeBuckets", "32")
    try {
      // integral indexed column, two clusters -> two index range arms
      val q = "SELECT t.k, t.pop FROM grtfixr.`t$wide` t JOIN " +
        "(SELECT explode(sequence(50L, 80L)) AS p UNION ALL " +
        "SELECT explode(sequence(150L, 180L)) AS p) d ON t.pop = d.p"
      val expect = ((50L to 80L) ++ (150L to 180L)).toSet
      spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
      val base = try spark.sql(q).collect().map(_.getLong(1)).toSet
      finally spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
      assert(base == expect)
      val df = spark.sql(q)
      assert(df.collect().map(_.getLong(1)).toSet == expect)
      val scans = graftScans(df)
      assert(scans.flatMap(_.runtimeProbeShapes).contains(("pop", "range")))
      assert(scans.flatMap(_.runtimeRangeCounts) == Seq(("pop", 2)),
        s"expected 2 clustered index arms: " +
          scans.flatMap(_.runtimeRangeCounts))
      // the executed inner plan reads the pop INDEX table (range route)
      val scan = scans.collectFirst { case s: GraftWideScan => s }.get
      val plan = scan.resolvedFrame(spark)
        .queryExecution.executedPlan.toString
      assert(plan.contains("t_idx_f_"),
        s"runtime ranges did not route through the index:\n$plan")
      // STRING indexed column: r12 held the single
      // [enc(min), succ(enc(max))) arm; r13's byte-prefix occupancy
      // clustering (clusterPrefixRuns) now gap-separates the two
      // clusters here too — still index-routed and exact
      val qs = "SELECT t.k, t.city FROM grtfixr.`t$wide` t JOIN " +
        "(SELECT format_string('c%03d', id) AS c FROM range(60, 90) " +
        "UNION ALL SELECT format_string('c%03d', id) FROM range(110, 140)" +
        ") d ON t.city = d.c"
      val dfs = spark.sql(qs)
      assert(dfs.collect().map(_.getLong(0)).toSet ==
        ((60L until 90L) ++ (110L until 140L)).toSet)
      val sRc = graftScans(dfs).flatMap(_.runtimeRangeCounts)
      assert(sRc.nonEmpty && sRc.forall(_._1 == "city") &&
        sRc.exists(_._2 > 1),
        s"expected gap-separated string index arms, got $sRc")
    } finally {
      spark.conf.unset("spark.graft.runtimeFilter.maxKeys")
      spark.conf.unset("spark.graft.runtimeFilter.rangeBuckets")
    }
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
