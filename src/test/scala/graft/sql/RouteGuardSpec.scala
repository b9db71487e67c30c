package graft.sql

import graft.{Graft, SparkSpec}
import graft.catalog.{FamilyDescriptor, TableDescriptor}
import graft.core.Bytes
import graft.write.Put
import java.nio.file.Files

/** r14 route-guard hardening: the previously-exempt LEADING-member and
  * COMPOSITE routes are guarded, verdicts cache across queries in the
  * catalog (zero re-measurement for the dashboard pattern, invalidated
  * by index appends), and the measurement itself is scale-safe (a
  * constant probe budget plus the arm-span pre-estimate — a refusal
  * must never cost more than the plan it protects). */
class RouteGuardSpec extends SparkSpec {

  private def b(s: String) = Bytes.toBytes(s)
  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString
  private def register(cat: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
  }

  /** 2000-row fixture: pop = i (dense longs), status 'O'/'F' split in
    * half with a rare 'P', flag 'x' on even rows; composite indexes
    * (pop, status) — pop is a LEADING member only — and (status, flag). */
  private def mkGuardTable(root: String): Graft = {
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, immutableRows = true, wideKey = Some("k:long"),
      wideSchema = Some("f:pop:long;f:status:string;f:flag:string")), 1L)
    g.table("t").put((1 to 2000).map(i =>
      Put(Bytes.toBytes(i.toLong))
        .add("f", b("pop"), 2L, Bytes.toBytes(i.toLong))
        .add("f", b("status"), 2L,
          b(if (i % 400 == 3) "P" else if (i % 2 == 0) "O" else "F"))
        .add("f", b("flag"), 2L, b(if (i % 2 == 0) "x" else "y"))), 2L)
    g.createCompositeIndex("t",
      Seq("f" -> b("pop"), "f" -> b("status")), 3L)
    g.createCompositeIndex("t",
      Seq("f" -> b("status"), "f" -> b("flag")), 4L)
    g
  }

  test("leading-member and composite routes are selectivity-guarded " +
      "(r14: the r13 exemptions closed)") {
    val root = freshRoot("guardlead")
    mkGuardTable(root)
    register("ggl", root)
    spark.conf.set("spark.graft.route.guard.minIndexRows", "0")
    try {
      // LEADING-member range, anti-selective: pop in [10, 1990) is ~99%
      // of the table — the loose blob probe + dedup + gather must NOT
      // fire; the pushed scan + residual answers
      val anti = spark.sql("SELECT k, pop FROM ggl.`t$wide` " +
        "WHERE pop >= 10 AND pop < 1990 ORDER BY k")
      assert(anti.collect().map(_.getLong(0)).toSeq ==
        (10L until 1990L))
      assert(GraftWideSeams.usedIndexTables(anti).isEmpty,
        "anti-selective leading range must fall back to the pushed scan")
      assert(GraftRouteSeams.guardDeclined(anti))
      // LEADING-member range, selective: [5, 10) routes through the
      // composite index's loose probe
      val sel = spark.sql("SELECT k, pop FROM ggl.`t$wide` " +
        "WHERE pop >= 5 AND pop < 10 ORDER BY k")
      assert(sel.collect().map(_.getLong(0)).toSeq == (5L until 10L))
      assert(GraftWideSeams.usedIndexTables(sel).nonEmpty,
        "selective leading range should keep routing")
      assert(!GraftRouteSeams.guardDeclined(sel))
      // guard off: the anti-selective leading range routes again and
      // still answers exactly (cost-only knob)
      spark.conf.set("spark.graft.route.guard.enabled", "false")
      try {
        val forced = spark.sql("SELECT k, pop FROM ggl.`t$wide` " +
          "WHERE pop >= 10 AND pop < 1990 ORDER BY k")
        assert(forced.collect().map(_.getLong(0)).toSeq == (10L until 1990L))
        assert(GraftWideSeams.usedIndexTables(forced).nonEmpty)
      } finally spark.conf.unset("spark.graft.route.guard.enabled")
      // COMPOSITE tuple, anti-selective: ('O','x') is half the table —
      // the blob probe counts its hits and declines
      val cAnti = spark.sql("SELECT k, status, flag FROM ggl.`t$wide` " +
        "WHERE status = 'O' AND flag = 'x' ORDER BY k")
      assert(cAnti.collect().map(_.getLong(0)).toSeq ==
        (1 to 2000).filter(i => i % 2 == 0 && i % 400 != 3).map(_.toLong))
      assert(GraftWideSeams.usedIndexTables(cAnti).isEmpty &&
        GraftRouteSeams.guardDeclined(cAnti))
      // COMPOSITE tuple, selective: ('P', 'y') is 5 rows — routes
      val cSel = spark.sql("SELECT k, status, flag FROM ggl.`t$wide` " +
        "WHERE status = 'P' AND flag = 'y' ORDER BY k")
      assert(cSel.collect().map(_.getLong(0)).toSeq ==
        (1 to 2000).filter(i => i % 400 == 3 && i % 2 == 1).map(_.toLong))
      assert(GraftWideSeams.usedIndexTables(cSel).nonEmpty &&
        !GraftRouteSeams.guardDeclined(cSel))
    } finally spark.conf.unset("spark.graft.route.guard.minIndexRows")
  }

  test("cell-door composite-leading probes are guarded too") {
    val root = freshRoot("guardcell")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("c", Seq(FamilyDescriptor("f")),
      splitKeys = 2, immutableRows = true), 1L)
    g.table("c").put((1 to 2000).map(i =>
      Put(b(f"r$i%04d"))
        .add("f", b("ck"), 2L, Bytes.toBytes(i.toLong))
        .add("f", b("st"), 2L, b(if (i % 2 == 0) "O" else "F"))), 2L)
    g.createCompositeIndex("c", Seq("f" -> b("ck"), "f" -> b("st")), 3L)
    register("ggc", root)
    spark.conf.set("spark.graft.route.guard.minIndexRows", "0")
    try {
      val ckQ = "X'" + b("ck").map(x => f"$x%02x").mkString + "'"
      def h(v: Long) = "X'" + Bytes.toBytes(v).map(x => f"$x%02x").mkString + "'"
      // anti-selective leading range on the cell door: ck in [10, 1990)
      val anti = spark.sql(s"SELECT row FROM ggc.c WHERE family = 'f' " +
        s"AND qualifier = $ckQ AND value >= ${h(10L)} AND value < ${h(1990L)}")
      assert(anti.collect().length == 1980)
      assert(GraftRouteSeams.guardDeclined(anti),
        "cell-door anti-selective leading range must decline")
      // selective leading range routes (no decline seam)
      val sel = spark.sql(s"SELECT row FROM ggc.c WHERE family = 'f' " +
        s"AND qualifier = $ckQ AND value >= ${h(5L)} AND value < ${h(10L)}")
      assert(sel.collect().length == 5)
      assert(!GraftRouteSeams.guardDeclined(sel))
    } finally spark.conf.unset("spark.graft.route.guard.minIndexRows")
  }

  test("guard verdicts cache across queries and invalidate on index " +
      "append (r14: zero re-measurement for the dashboard pattern)") {
    val root = freshRoot("guardcache")
    val g = mkGuardTable(root)
    register("ggv", root)
    spark.conf.set("spark.graft.route.guard.minIndexRows", "0")
    try {
      def q() = spark.sql("SELECT k, status, flag FROM ggv.`t$wide` " +
        "WHERE status = 'P' AND flag = 'y' ORDER BY k")
      val expect = (1 to 2000)
        .filter(i => i % 400 == 3 && i % 2 == 1).map(_.toLong)
      val before = GraftRouteGuard.measurements.get()
      val first = q()
      assert(first.collect().map(_.getLong(0)).toSeq == expect)
      assert(GraftWideSeams.usedIndexTables(first).nonEmpty)
      val afterFirst = GraftRouteGuard.measurements.get()
      assert(afterFirst > before, "first execution must measure")
      // SECOND execution (fresh plan, fresh scan, fresh Catalog
      // instance): the verdict comes from the catalog cache — the guard
      // runs ZERO measurement jobs
      val second = q()
      assert(second.collect().map(_.getLong(0)).toSeq == expect)
      assert(GraftWideSeams.usedIndexTables(second).nonEmpty)
      assert(GraftRouteGuard.measurements.get() == afterFirst,
        "repeated query must not re-measure")
      // declined verdicts cache the same way
      def anti() = spark.sql("SELECT k, status, flag FROM ggv.`t$wide` " +
        "WHERE status = 'O' AND flag = 'x' ORDER BY k")
      anti().collect(): Unit
      val afterAnti = GraftRouteGuard.measurements.get()
      val anti2 = anti()
      anti2.collect(): Unit
      assert(GraftRouteSeams.guardDeclined(anti2),
        "cached decline must still report through the seam")
      assert(GraftRouteGuard.measurements.get() == afterAnti,
        "repeated declined query must not re-measure")
      // an APPEND bumps the maintained index's version -> the cached
      // verdict no longer matches and the guard re-measures
      g.table("t").put(Seq(Put(Bytes.toBytes(2001L))
        .add("f", b("pop"), 5L, Bytes.toBytes(2001L))
        .add("f", b("status"), 5L, b("P"))
        .add("f", b("flag"), 5L, b("y"))), 5L)
      val third = q()
      assert(third.collect().map(_.getLong(0)).toSeq == expect :+ 2001L)
      assert(GraftRouteGuard.measurements.get() > afterAnti,
        "an index append must invalidate the cached verdict")
    } finally spark.conf.unset("spark.graft.route.guard.minIndexRows")
  }

  private def member(m: graft.catalog.Manifest,
      arms: Seq[graft.read.SecondaryIndex.ValueArm],
      probe: () => org.apache.spark.sql.DataFrame) =
    Seq(GraftRouteGuard.GuardMember(probe,
      Seq(GraftRouteGuard.GuardLeg(m, arms))))

  test("span pre-estimate declines near-full-span range arms with zero " +
      "probe jobs; constant budget caps measurement on huge caps") {
    val root = freshRoot("guardest")
    val g = mkGuardTable(root)
    val engine = g.catalog
    val ixTable = engine.currentManifest("t").descriptor.indexes
      .find(_.columns.map(_._2.toSeq) ==
        Seq(b("pop").toSeq, b("status").toSeq))
      .map(_.indexTable).get
    val m = engine.currentManifest(ixTable)
    spark.conf.set("spark.graft.route.guard.minIndexRows", "0")
    try {
      import graft.read.SecondaryIndex.{ArmIn, ArmRange}
      var probeRan = false
      def probe(): org.apache.spark.sql.DataFrame = {
        probeRan = true
        engine.readManifest(m).select(
          org.apache.spark.sql.functions.col("row"))
      }
      // arms covering the full encoded-value span: the estimate declines
      // BEFORE any index job — the probe closure must never run
      val full = Seq(ArmRange(Some(Bytes.toBytes(1L)),
        Some(Bytes.toBytes(2001L))))
      assert(!GraftRouteGuard.allows(engine,
        member(m, full, () => probe()), "est-full"))
      assert(!probeRan, "estimate-decline must not run an index job")
      // narrow LONG-bounded arms (0x00-embedding bounds -> the histogram
      // mapping widens to an upper-only bound and stays quiet): the
      // measured probe runs and (selective) allows
      val narrow = Seq(ArmRange(Some(Bytes.toBytes(5L)),
        Some(Bytes.toBytes(10L))))
      var narrowHits = 0
      assert(GraftRouteGuard.allows(engine,
        member(m, narrow, () => { narrowHits += 1
          graft.read.SecondaryIndex.probeRange(engine.readManifest(m),
            Some(Bytes.toBytes(5L)), Some(Bytes.toBytes(10L)),
            exactPrefix = false) }),
        "est-narrow"))
      assert(narrowHits == 1, "narrow arms must be measured")
      // CONSTANT budget: with maxProbeRows=8 a probe that exceeds the
      // budget declines OPTIMISTICALLY — measurement cost must not
      // scale with the index — and the UNIFORMITY estimate must NOT
      // vouch past the exhaustion even for narrow range arms (banded
      // key spaces put ~every entry inside narrow arms). The
      // measurement-derived HISTOGRAM is the sanctioned way past the
      // budget (next test); disable it here to pin the fallback.
      spark.conf.set("spark.graft.route.guard.maxProbeRows", "8")
      spark.conf.set("spark.graft.route.guard.histogram", "false")
      try {
        assert(!GraftRouteGuard.allows(engine,
          member(m, Seq(ArmIn(Seq(Bytes.toBytes(1L)))),
            () => engine.readManifest(m).select(
              org.apache.spark.sql.functions.col("row"))),
          "est-budget-in"))
        assert(!GraftRouteGuard.allows(engine,
          member(m, narrow, () => engine.readManifest(m).select(
            org.apache.spark.sql.functions.col("row")).limit(20)),
          "est-budget-range"),
          "narrow-arm estimate must not override an exhausted budget")
        // under the budget the same narrow probe still measures + allows
        assert(GraftRouteGuard.allows(engine,
          member(m, narrow, () => engine.readManifest(m).select(
            org.apache.spark.sql.functions.col("row")).limit(5)),
          "est-budget-under"))
      } finally {
        spark.conf.unset("spark.graft.route.guard.maxProbeRows")
        spark.conf.unset("spark.graft.route.guard.histogram")
      }
    } finally spark.conf.unset("spark.graft.route.guard.minIndexRows")
  }

  test("histogram crossover (r15): a sub-fraction probe LARGER than the " +
      "probe budget still routes — zero index jobs either way") {
    val root = freshRoot("guardhist")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("h", Seq(FamilyDescriptor("f")),
      splitKeys = 2, immutableRows = true), 1L)
    // grp skew: value 7 on 60% of rows (anti-selective), values 0..7 on
    // the rest (~10% each of the remainder) — value 3 is ~5% (selective)
    g.table("h").put((1 to 2000).map(i =>
      Put(Bytes.toBytes(i.toLong)).add("f", b("grp"), 2L,
        Bytes.toBytes(if (i <= 1200) 7L else (i % 8).toLong))), 2L)
    g.createIndex("h", "f", b("grp"), 3L)
    val engine = g.catalog
    val ixTable = engine.currentManifest("h").descriptor.indexes
      .head.indexTable
    val m = engine.currentManifest(ixTable)
    assert(m.stats.exists(_.histogram.nonEmpty),
      "the initial index build must persist a histogram")
    import graft.read.SecondaryIndex.ArmIn
    spark.conf.set("spark.graft.route.guard.minIndexRows", "0")
    // budget far below the selective probe's ~100 hits: the r14
    // exhaustion rule alone would surrender the route
    spark.conf.set("spark.graft.route.guard.maxProbeRows", "8")
    try {
      var probeRan = false
      def probe(): org.apache.spark.sql.DataFrame = {
        probeRan = true
        graft.read.SecondaryIndex.probe(engine.readManifest(m),
          Bytes.toBytes(3L))
      }
      // selective value (≈5% << 20% fraction), hits >> budget: the
      // histogram upper bound VOUCHES — routes with ZERO index jobs
      assert(GraftRouteGuard.allows(engine,
        member(m, Seq(ArmIn(Seq(Bytes.toBytes(3L)))), () => probe()),
        "hist-route"),
        "histogram must route a selective probe past the budget")
      assert(!probeRan, "histogram-vouched route must run zero index jobs")
      // anti-selective value (60%): the histogram LOWER bound declines,
      // also with zero index jobs
      assert(!GraftRouteGuard.allows(engine,
        member(m, Seq(ArmIn(Seq(Bytes.toBytes(7L)))), () => probe()),
        "hist-decline"),
        "histogram must decline the anti-selective probe")
      assert(!probeRan, "histogram decline must run zero index jobs")
      // histogram off: the same selective probe falls back to the
      // measured path, exhausts the forced-low budget, and declines —
      // the retained no-histogram fallback
      spark.conf.set("spark.graft.route.guard.histogram", "false")
      try
        assert(!GraftRouteGuard.allows(engine,
          member(m, Seq(ArmIn(Seq(Bytes.toBytes(3L)))), () => probe()),
          "hist-off"),
          "without the histogram the exhausted budget must decline")
      finally spark.conf.unset("spark.graft.route.guard.histogram")
      assert(probeRan, "the no-histogram fallback must measure")
    } finally {
      spark.conf.unset("spark.graft.route.guard.minIndexRows")
      spark.conf.unset("spark.graft.route.guard.maxProbeRows")
    }
  }

  test("multi-member span estimate (r15): an anti-selective two-member " +
      "cross-or declines from per-member estimates, zero index jobs") {
    val root = freshRoot("guardxor")
    val g = mkGuardTable(root)
    val engine = g.catalog
    val ixs = engine.currentManifest("t").descriptor.indexes
    val m1 = engine.currentManifest(ixs.head.indexTable)
    val m2 = engine.currentManifest(ixs.last.indexTable)
    spark.conf.set("spark.graft.route.guard.minIndexRows", "0")
    // pin the SPAN path (the histogram would decline this on its own)
    spark.conf.set("spark.graft.route.guard.histogram", "false")
    try {
      import graft.read.SecondaryIndex.ArmRange
      var probes = 0
      def probe(m: graft.catalog.Manifest)
          : org.apache.spark.sql.DataFrame = {
        probes += 1
        engine.readManifest(m).select(
          org.apache.spark.sql.functions.col("row"))
      }
      def full(m: graft.catalog.Manifest) = {
        val span = engine.manifestKeySpan(m).get
        Seq(ArmRange(Some(span._1),
          Some(span._2 ++ Array(0.toByte))))
      }
      // each member alone is ~its whole index: the summed per-member
      // masses cross the 2x margin and the route declines with ZERO
      // index jobs — r14 skipped estimation entirely for multi-index
      // routes and paid a measured first probe here
      val members =
        member(m1, full(m1), () => probe(m1)) ++
          member(m2, full(m2), () => probe(m2))
      assert(!GraftRouteGuard.allows(engine, members, "xor-est"),
        "summed member estimates must decline the cross-or")
      assert(probes == 0,
        "multi-member estimate-decline must run zero index jobs")
    } finally {
      spark.conf.unset("spark.graft.route.guard.minIndexRows")
      spark.conf.unset("spark.graft.route.guard.histogram")
    }
  }

  test("second execution of a guarded query runs ZERO guard jobs — " +
      "listener-counted against the guard-disabled twin") {
    val root = freshRoot("guardjobs")
    mkGuardTable(root)
    register("ggj", root)
    spark.conf.set("spark.graft.route.guard.minIndexRows", "0")
    try {
      def q() = spark.sql("SELECT k, status, flag FROM ggj.`t$wide` " +
        "WHERE status = 'P' AND flag = 'y' ORDER BY k")
      // first execution measures (and caches the verdict + stats)
      q().collect(): Unit
      // count only THIS test's jobs: guard measurement jobs and the
      // query's own jobs are submitted from this thread, so a job group
      // scopes them — an unrelated job from a parallel suite on the
      // shared context no longer breaks the exact equality (ADVICE r14:
      // the unscoped count was flaky by design)
      def jobsOf(f: => Unit): Int = {
        val group = s"guardjobs-${java.util.UUID.randomUUID()}"
        val n = new java.util.concurrent.atomic.AtomicInteger
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            if (group == js.properties.getProperty("spark.jobGroup.id"))
              n.incrementAndGet(): Unit
        }
        spark.sparkContext.addSparkListener(l)
        spark.sparkContext.setJobGroup(group, "RouteGuardSpec.jobsOf")
        try {
          f
          // the listener bus is async: poll until the count is stable
          var last = -1
          var stable = 0
          while (stable < 3) {
            Thread.sleep(100)
            val c = n.get
            if (c == last) stable += 1 else { stable = 0; last = c }
          }
        } finally {
          spark.sparkContext.clearJobGroup()
          spark.sparkContext.removeSparkListener(l)
        }
        n.get
      }
      // cached verdict: the guarded run must cost EXACTLY the jobs of
      // the same query with the guard off (same routed plan, zero
      // measurement jobs on top)
      val guarded = jobsOf { q().collect(): Unit }
      spark.conf.set("spark.graft.route.guard.enabled", "false")
      val unguarded = try jobsOf { q().collect(): Unit }
      finally spark.conf.unset("spark.graft.route.guard.enabled")
      assert(guarded == unguarded,
        s"cached-verdict run cost $guarded jobs vs $unguarded unguarded" +
          " — the guard ran measurement jobs on a repeated query")
    } finally spark.conf.unset("spark.graft.route.guard.minIndexRows")
  }

  test("covered routes skip the guard ONLY when genuinely index-only: " +
      "an over-cap runtime IN resolves through the gather and is measured") {
    // the covered skip's rationale is "no gather to lose" — but an In
    // past the static probe cap (a runtime key set) resolves through
    // the VERIFIED probe+gather path even when the projection is
    // covered, so it must be guarded like any arm (review r14)
    val root = freshRoot("guardcov")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, immutableRows = true, wideKey = Some("k:long"),
      wideSchema = Some("f:pop:long")), 1L)
    g.table("t").put((1 to 2000).map(i =>
      Put(Bytes.toBytes(i.toLong))
        .add("f", b("pop"), 2L, Bytes.toBytes((i % 200).toLong))), 2L)
    g.createIndex("t", "f", b("pop"), 3L)
    register("ggcov", root)
    spark.conf.set("spark.graft.route.guard.minIndexRows", "0")
    try {
      // 150 distinct runtime keys (over the 64 static cap) matching 75%
      // of rows: the gather-shaped covered route must DECLINE
      val anti = spark.sql("SELECT t.k, t.pop FROM ggcov.`t$wide` t " +
        "JOIN (SELECT explode(sequence(0L, 149L)) AS p) d ON t.pop = d.p")
      assert(anti.collect().length == 1500)
      assert(GraftWideSeams.usedIndexTables(anti).isEmpty,
        "anti-selective over-cap covered IN must not route")
      assert(GraftRouteSeams.guardDeclined(anti))
      // 10 keys (under the static cap): genuinely index-only — skips
      // the guard and routes
      val sel = spark.sql("SELECT t.k, t.pop FROM ggcov.`t$wide` t " +
        "JOIN (SELECT explode(sequence(0L, 9L)) AS p) d ON t.pop = d.p")
      assert(sel.collect().length == 100)
      assert(GraftWideSeams.usedIndexTables(sel).nonEmpty,
        "under-cap covered IN should stay index-only routed")
      assert(!GraftRouteSeams.guardDeclined(sel))
    } finally spark.conf.unset("spark.graft.route.guard.minIndexRows")
  }

  test("below the measurement floor routes go unguarded — zero jobs, " +
      "zero measurements (small-fixture route mechanics stay pinned)") {
    val root = freshRoot("guardfloor")
    val g = mkGuardTable(root)
    val engine = g.catalog
    val ixTable = engine.currentManifest("t").descriptor.indexes
      .head.indexTable
    val m = engine.currentManifest(ixTable)
    import graft.read.SecondaryIndex.{ArmIn, ArmRange}
    var probeRan = false
    def probe(): org.apache.spark.sql.DataFrame = {
      probeRan = true
      engine.readManifest(m)
    }
    // default minIndexRows (1,048,576) >> this 2,000-entry index: every
    // arm shape routes without measurement — even a full-span range
    // (estimate included; a mis-routed scan at this size costs less
    // than any measurement, and WideViewSpec pins that small fixtures
    // route on predicate shape)
    val before = GraftRouteGuard.measurements.get()
    assert(GraftRouteGuard.allows(engine,
      member(m, Seq(ArmRange(Some(Bytes.toBytes(1L)),
        Some(Bytes.toBytes(2001L)))), () => probe()), "floor-full"))
    assert(GraftRouteGuard.allows(engine,
      member(m, Seq(ArmIn(Seq(Bytes.toBytes(1L)))), () => probe()),
      "floor-in"))
    assert(!probeRan, "below the floor no probe may run")
    assert(GraftRouteGuard.measurements.get() == before,
      "below the floor no measurement may be counted")
  }

  test("churned index: the resolved denominator declines a probe the " +
      "raw one would have routed (r15)") {
    val root = freshRoot("guardchurn")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2), 1L)
    // value 5 on 30% of rows; the batch is re-put 5x (same cells, newer
    // ts) so the INDEX build sees 5 stored versions per entry: raw
    // index mass 5x the live mass — the churn shape that inflated the
    // r14 denominator and leaned the guard permissive
    def batch(ts: Long) = (1 to 2000).map(i =>
      Put(b(f"r$i%04d")).add("f", b("grp"), ts,
        Bytes.toBytes(if (i % 10 < 3) 5L else (i % 10).toLong)))
    (2L to 6L).foreach(ts => g.table("t").put(batch(ts), ts))
    g.createIndex("t", "f", b("grp"), 7L)
    val engine = g.catalog
    val ixTable = engine.currentManifest("t").descriptor.indexes
      .head.indexTable
    val m = engine.currentManifest(ixTable)
    val st = m.stats.get
    assert(st.rows == 10000L, s"raw stored index cells (got ${st.rows})")
    // the resolved bound is an HLL distinct-coordinate count (~1%
    // relative error) — the 5x stored versions collapse to ~2,000
    assert(st.resolvedRows >= 1900L && st.resolvedRows <= 2100L,
      s"index build must persist the ~resolved count (got " +
        s"${st.resolvedRows}) — distinct coords collapse the re-puts")
    // value 5 hits 600 distinct rows: ~30% of the resolved ~2,000 (must
    // decline at fraction 0.2) but only 6% of the raw 10,000 — the r14
    // raw denominator would have ROUTED this probe (600 <= 2,000 cap)
    assert(600L <= (st.rows * 0.2).toLong &&
      600L > (st.resolvedRows * 0.2).toLong,
      "fixture drift: the probe must sit between the two denominators")
    spark.conf.set("spark.graft.route.guard.minIndexRows", "0")
    try {
      import graft.read.SecondaryIndex.ArmIn
      val declined = !GraftRouteGuard.allows(engine,
        member(m, Seq(ArmIn(Seq(Bytes.toBytes(5L)))),
          () => graft.read.SecondaryIndex.probe(engine.readManifest(m),
            Bytes.toBytes(5L))), "churn-denominator")
      assert(declined,
        "30% of the RESOLVED entries must decline even though it is " +
          "only 6% of the raw stored cells")
    } finally spark.conf.unset("spark.graft.route.guard.minIndexRows")
  }

  test("deleteTable purges guard verdicts by ROOT: a drop in catalog A " +
      "leaves catalog B's cached verdicts hot (r15)") {
    val rootA = freshRoot("guardpurgeA")
    val rootB = freshRoot("guardpurgeB")
    def mk(root: String): Graft = {
      val g = Graft(spark, root)
      g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
        splitKeys = 2), 1L)
      g.table("t").put((1 to 200).map(i =>
        Put(b(f"r$i%03d")).add("f", b("v"), 2L,
          Bytes.toBytes((i % 4).toLong))), 2L)
      g.createIndex("t", "f", b("v"), 3L)
      g
    }
    val gA = mk(rootA)
    val gB = mk(rootB)
    import graft.read.SecondaryIndex.ArmIn
    def verdict(g: Graft): Boolean = {
      val engine = g.catalog
      val ix = engine.currentManifest("t").descriptor.indexes.head.indexTable
      val m = engine.currentManifest(ix)
      GraftRouteGuard.allows(engine,
        member(m, Seq(ArmIn(Seq(Bytes.toBytes(1L)))),
          () => graft.read.SecondaryIndex.probe(engine.readManifest(m),
            Bytes.toBytes(1L))), "purge-scope")
    }
    spark.conf.set("spark.graft.route.guard.minIndexRows", "0")
    try {
      verdict(gA): Unit
      verdict(gB): Unit
      val cached = GraftRouteGuard.measurements.get()
      verdict(gB): Unit
      assert(GraftRouteGuard.measurements.get() == cached,
        "B's verdict must be cached before the drop")
      gA.deleteTable("t")
      verdict(gB): Unit
      assert(GraftRouteGuard.measurements.get() == cached,
        "dropping a table in root A must not purge root B's verdicts")
      // A's own verdicts ARE gone: a recreated A re-measures
      mk(rootA): Unit
      verdict(Graft(spark, rootA)): Unit
      assert(GraftRouteGuard.measurements.get() > cached,
        "root A's recreated table must re-measure")
    } finally spark.conf.unset("spark.graft.route.guard.minIndexRows")
  }
}
