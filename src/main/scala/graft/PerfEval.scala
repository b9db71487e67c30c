package graft

import graft.catalog.{BloomType, FamilyDescriptor, TableDescriptor}
import graft.core.{Bytes, CellCodec}
import graft.read.{BinaryComparator, CompareOp, Get, PageFilter, Scan,
  SingleColumnValueFilter}
import org.apache.spark.sql.functions._

/** PE-style workload harness — the reference's `PerformanceEvaluation`
  * (modeled on Bigtable §7; workloads at `PerformanceEvaluation.java:
  * 154-176`) re-expressed against the catalog/facade:
  * sequentialWrite (table build), scan, scanRange100, randomRead (point
  * Gets), filterScan (scan + SingleColumnValueFilter), randomWrite
  * (mutation batch append). Prints one JSON line of seconds per workload.
  *
  * Keys derive deterministically from the orders table at
  * SPARK_GRAFT_SF_DIR; "random" reads use a hash-scrambled key order (no
  * RNG — reproducible across runs). */
object PerfEval {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    val work = java.nio.file.Files.createTempDirectory("graft-pe").toString
    val g = Graft(spark, work)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // Read-only workloads report MIN-of-2 — the bench methodology
    // (BENCHNOTES): one sample on a shared machine confounds the plan
    // with I/O-cache state and competing load (observed: the same
    // scanRange10 loop at 25.4 s and 9.1 s in back-to-back runs).
    // Write workloads stay single-shot (a second run would time a
    // different table state).
    def timedMin2(f: => Unit): Double = math.min(timed(f), timed(f))
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    // the wide declaration costs nothing at write time (descriptor
    // properties only) and lets wideMultiGet20 price the relational
    // IN-probe path over the same cells every other workload reads
    g.createTable(TableDescriptor("pe", Seq(FamilyDescriptor("o")),
      wideKey = Some("o_orderkey:long"),
      wideSchema = Some("o:o_custkey:long;o:o_totalprice:double;" +
        "o:o_orderstatus:string")), 1L)

    // sequentialWrite: encode + total-order layout commit
    results("sequentialWrite") = timed {
      g.table("pe").mutate(
        CellCodec.encode(orders, "o", Seq("o_orderkey")), nowMs = 1L)
    }

    val t = g.table("pe")

    // scan: full-table resolved scan
    results("scan") = timedMin2 { t.scan(Scan()).count(): Unit }

    // scanRange10/100/1000/10000: 20 range scans of N keys each from
    // scrambled start keys (PE's RandomScanWithRange{10,100,1000,10000};
    // `PerformanceEvaluation.java:852-906` — random start, start+N stop,
    // count rows; our starts are hash-scrambled, not RNG).
    val keys = orders.select(max("o_orderkey")).collect()(0).getLong(0)
    for (range <- Seq(10L, 100L, 1000L, 10000L)) {
      results(s"scanRange$range") = timedMin2 {
        var i = 0L
        while (i < 20) {
          val start = (i * 9973L) % math.max(1L, keys - range)
          t.scan(Scan().setStartRow(Bytes.toBytes(start))
            .setStopRow(Bytes.toBytes(start + range))).count()
          i += 1
        }
      }
    }

    // randomSeekScan: seek to a scrambled key, read the next 120 rows —
    // PE's RandomSeekScanTest (`PerformanceEvaluation.java:798-814`:
    // Scan(randomRow) + WhileMatchFilter(PageFilter(120))). With our
    // global-page semantics, PageFilter(120) on a start-row scan IS
    // "the next 120 rows after the seek" — the WhileMatch wrapper only
    // exists in the reference to stop its per-region scanners early.
    results("randomSeekScan") = timedMin2 {
      var i = 0L
      while (i < 10) {
        val start = 1L + (i * 6364136223846793005L >>> 33) % math.max(1L, keys)
        t.scan(Scan().setStartRow(Bytes.toBytes(start))
          .setFilter(PageFilter(120))).count()
        i += 1
      }
    }

    // randomRead: 20 point Gets at hash-scrambled keys
    t.get(Get(Bytes.toBytes(1L))).count() // warm footers outside timing
    results("randomRead") = timedMin2 {
      var i = 0L
      while (i < 20) {
        val k = 1L + (i * 6364136223846793005L >>> 33) % math.max(1L, keys)
        t.get(Get(Bytes.toBytes(k))).count()
        i += 1
      }
    }

    // sequentialRead: point Gets at sequential keys (PE's
    // SequentialReadTest, `PerformanceEvaluation.java:978-990`)
    results("sequentialRead") = timedMin2 {
      var i = 1L
      while (i <= 20) {
        t.get(Get(Bytes.toBytes(i))).count()
        i += 1
      }
    }

    // multiGet20: the same 20 keys as ONE batch job (HTable.get(List<Get>))
    results("multiGet20") = timedMin2 {
      val batch = (0L until 20L).map(i =>
        Bytes.toBytes(1L + (i * 6364136223846793005L >>> 33) % math.max(1L, keys)))
      graft.read.ScanExec.multiGet(t.cells, batch).count(): Unit
    }

    // randomReadBloom: the same Gets against a bloom-filtered family
    // (BLOOMFILTER parity — parquet row blooms prune row groups the
    // min/max range check can't exclude)
    g.createTable(TableDescriptor("pe_bloom",
      Seq(FamilyDescriptor("o", bloomFilter = BloomType.Row))), 1L)
    g.table("pe_bloom").mutate(
      CellCodec.encode(orders, "o", Seq("o_orderkey")), nowMs = 1L)
    val tb = g.table("pe_bloom")
    tb.get(Get(Bytes.toBytes(1L))).count() // warm footers outside timing
    results("randomReadBloom") = timedMin2 {
      var i = 0L
      while (i < 20) {
        val k = 1L + (i * 6364136223846793005L >>> 33) % math.max(1L, keys)
        tb.get(Get(Bytes.toBytes(k))).count()
        i += 1
      }
    }

    // randomReadRowCol: single-column Gets against a ROWCOL-bloomed family
    // (StoreFile.BloomType ROWCOL parity — the qualifier bloom prunes for
    // column-addressed point reads on wide rows)
    g.createTable(TableDescriptor("pe_rowcol",
      Seq(FamilyDescriptor("o", bloomFilter = BloomType.RowCol))), 1L)
    g.table("pe_rowcol").mutate(
      CellCodec.encode(orders, "o", Seq("o_orderkey")), nowMs = 1L)
    val trc = g.table("pe_rowcol")
    trc.get(Get(Bytes.toBytes(1L))).count() // warm footers outside timing
    results("randomReadRowCol") = timedMin2 {
      var i = 0L
      while (i < 20) {
        val k = 1L + (i * 6364136223846793005L >>> 33) % math.max(1L, keys)
        trc.get(Get(Bytes.toBytes(k))
          .addColumn("o", Bytes.toBytes("o_orderstatus"))).count()
        i += 1
      }
    }

    // filterScan: scan + SingleColumnValueFilter (PE's filterScan)
    results("filterScan") = timedMin2 {
      t.scan(Scan().setFilter(SingleColumnValueFilter(
        "o", Bytes.toBytes("o_orderstatus"),
        CompareOp.EQUAL, BinaryComparator(Bytes.toBytes("F"))))).count(): Unit
    }

    // indexBuild / indexLookup5 / fullScanLookup5: the secondary-index
    // trade. Build is the one-pass per-cell transform + commit (the
    // write-side cost); lookup5 runs 5 scrambled o_custkey equality
    // queries through the index (range probe + broadcast gather +
    // verify); fullScanLookup5 answers the SAME 5 queries the only way
    // the primary-key-only reference can — full scan +
    // SingleColumnValueFilter. The ratio is the 100 TB argument: probe
    // cost is O(hits), full scan is O(table).
    val custMax = orders.select(max("o_custkey")).collect()(0).getLong(0)
    def custKey(i: Long): Array[Byte] =
      Bytes.toBytes(1L + (i * 6364136223846793005L >>> 33) % math.max(1L, custMax))
    val custQ = Bytes.toBytes("o_custkey")
    g.createTable(TableDescriptor("pe_idx",
      Seq(FamilyDescriptor(graft.read.SecondaryIndex.IndexFamily))), 1L)
    results("indexBuild") = timed {
      g.table("pe_idx").mutate(
        graft.read.SecondaryIndex.indexCells(t.cells, "o", custQ), nowMs = 1L)
    }
    val ti = g.table("pe_idx")
    results("indexLookup5") = timedMin2 {
      var i = 0L
      while (i < 5) {
        graft.read.SecondaryIndex.lookup(t.cells, ti.cells, "o", custQ,
          custKey(i)).count()
        i += 1
      }
    }
    results("fullScanLookup5") = timedMin2 {
      var i = 0L
      while (i < 5) {
        t.scan(Scan().setFilter(SingleColumnValueFilter("o", custQ,
          CompareOp.EQUAL, BinaryComparator(custKey(i)),
          filterIfMissing = true))).count()
        i += 1
      }
    }

    // --- property-driven paths (r08): salt + registered index as TABLE
    // properties, same workload shapes as their manual twins above so the
    // numbers answer "what does the transparent layer cost":
    // saltedWrite vs sequentialWrite (one extra codegen'd hash-prefix
    // column in the layout job), saltedScanRange1000 vs scanRange1000
    // (16-way scatter OR vs one range, both parquet-pruned),
    // saltedRandomRead vs randomRead (a single salted range each — the
    // JVM-side salt keeps point reads O(1)), registeredIndexLookup5 vs
    // indexLookup5 (the facade route over the SALTED table: registered
    // probe + size-gated gather + verified read on the logical view).
    g.createTable(TableDescriptor("pe_salt",
      Seq(FamilyDescriptor("o")), saltBuckets = 16), 1L)
    results("saltedWrite") = timed {
      g.table("pe_salt").mutate(
        CellCodec.encode(orders, "o", Seq("o_orderkey")), nowMs = 1L)
    }
    val tsalt = g.table("pe_salt")
    tsalt.get(Get(Bytes.toBytes(1L))).count() // warm footers outside timing
    results("saltedScanRange1000") = timedMin2 {
      var i = 0L
      while (i < 20) {
        val start = (i * 9973L) % math.max(1L, keys - 1000L)
        tsalt.scan(Scan().setStartRow(Bytes.toBytes(start))
          .setStopRow(Bytes.toBytes(start + 1000L))).count()
        i += 1
      }
    }
    results("saltedRandomRead") = timedMin2 {
      var i = 0L
      while (i < 20) {
        val k = 1L + (i * 6364136223846793005L >>> 33) % math.max(1L, keys)
        tsalt.get(Get(Bytes.toBytes(k))).count()
        i += 1
      }
    }
    results("registeredIndexBuild") = timed {
      g.createIndex("pe_salt", "o", custQ, nowMs = 2L): Unit
    }
    results("registeredIndexLookup5") = timedMin2 {
      var i = 0L
      while (i < 5) {
        tsalt.indexLookup("o", custQ, Seq(custKey(i))).count()
        i += 1
      }
    }

    // coveredIndexBuild / coveredIndexLookup5: the COVERED-column trade
    // (Phoenix INCLUDE on an immutableRows table). Build pays the
    // resolve + within-batch covered join; lookup5 answers the same 5
    // equality queries from the index table ALONE — no gather, no span,
    // no main-table scan. The spread vs registeredIndexLookup5 prices
    // what covering buys: the read cost is the hit set, full stop.
    g.createTable(TableDescriptor("pe_cov",
      Seq(FamilyDescriptor("o")), immutableRows = true), 1L)
    g.table("pe_cov").mutate(
      CellCodec.encode(orders, "o", Seq("o_orderkey")), nowMs = 1L)
    results("coveredIndexBuild") = timed {
      g.createIndex("pe_cov", "o", custQ, nowMs = 2L,
        covered = Seq("o" -> Bytes.toBytes("o_totalprice"))): Unit
    }
    val tcov = g.table("pe_cov")
    results("coveredIndexLookup5") = timedMin2 {
      var i = 0L
      while (i < 5) {
        tcov.indexLookupCovered("o", custQ, Seq(custKey(i))).count()
        i += 1
      }
    }

    // coveredWrite / pointerWrite / plainWrite: the covered WRITE tax in
    // steady state — the same 10% delta batch appended to (a) the
    // covered-indexed table (dual-write + within-batch covered join +
    // tombstone pre-check + localCheckpoint pin), (b) a pointer-only
    // indexed table (projection dual-write + pin), (c) the plain table
    // below (no index). The (a)-(c) spread prices what covered reads
    // cost at write time, the way saltedWrite prices the salt.
    // key-shifted so the delta is genuinely NEW rows — the append shape
    // the immutableRows contract describes (never value overwrites)
    val writeBatch = CellCodec.encode(
      orders.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L)),
      "o", Seq("o_orderkey"), batchTs = 3L)
    results("coveredWrite") = timed {
      g.table("pe_cov").mutate(writeBatch, nowMs = 3L)
    }
    results("pointerWrite") = timed {
      g.table("pe_salt").mutate(writeBatch, nowMs = 3L)
    }


    // compositeIndexBuild / compositeLookup5: the multi-column key —
    // conjunctive equality over (o_custkey, o_orderstatus) as ONE blob
    // range probe + gather + every-member verify. Probe cost = the hit
    // set (the narrower tuple predicate), not the table: at a 10x
    // scale-up the lookup should stay flat like the other probes while
    // full scans grow.
    val compCols = Seq("o" -> custQ, "o" -> Bytes.toBytes("o_orderstatus"))
    results("compositeIndexBuild") = timed {
      g.createCompositeIndex("pe_cov", compCols, nowMs = 2L): Unit
    }
    results("compositeLookup5") = timedMin2 {
      var i = 0L
      while (i < 5) {
        tcov.indexLookupComposite(compCols,
          Seq(custKey(i), Bytes.toBytes("O"))).count()
        i += 1
      }
    }

    // doubleRangeLookup5 / doubleRangeFullScan5 (r10): range predicates
    // on an ORDERED-encoded double column (odouble — the sign-flip codec)
    // served by the index range probe vs the full scan + two comparison
    // filters the reference would run. Same O(hits)-vs-O(table) argument
    // as indexLookup5, now for a value class the plain IEEE encoding
    // cannot range-serve at all.
    val priceQ = Bytes.toBytes("o_totalprice")
    g.createTable(TableDescriptor("pe_ord", Seq(FamilyDescriptor("o"))), 1L)
    g.table("pe_ord").mutate(
      CellCodec.encode(orders, "o", Seq("o_orderkey"),
        ordered = Set("o_totalprice")), nowMs = 1L)
    g.createIndex("pe_ord", "o", priceQ, nowMs = 2L)
    val tord = g.table("pe_ord")
    def priceLo(i: Long): Double = 1000.0 * (i * 37 + 3)
    results("doubleRangeLookup5") = timedMin2 {
      var i = 0L
      while (i < 5) {
        tord.indexLookupRange("o", priceQ,
          Some(Bytes.toBytesOrdered(priceLo(i))),
          Some(Bytes.toBytesOrdered(priceLo(i) + 500.0))).count()
        i += 1
      }
    }
    results("doubleRangeFullScan5") = timedMin2 {
      var i = 0L
      while (i < 5) {
        tord.scan(Scan().setFilter(graft.read.FilterList.and(
          SingleColumnValueFilter("o", priceQ, CompareOp.GREATER_OR_EQUAL,
            BinaryComparator(Bytes.toBytesOrdered(priceLo(i))),
            filterIfMissing = true),
          SingleColumnValueFilter("o", priceQ, CompareOp.LESS,
            BinaryComparator(Bytes.toBytesOrdered(priceLo(i) + 500.0)),
            filterIfMissing = true)))).count()
        i += 1
      }
    }

    // prefixLookup5 (r10): value-prefix probes (indexLookupPrefix — the
    // PrefixFilter/BinaryPrefixComparator surface) through a c_name
    // index. Customer names are 'Customer#' + 9 digits; dropping the
    // last digit makes each prefix a selective 10-customer decade — the
    // shape the route exists for (a low-cardinality prefix would be the
    // size-gated hot-value shape instead).
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val nameQ = Bytes.toBytes("c_name")
    g.createTable(TableDescriptor("pe_cust", Seq(FamilyDescriptor("c"))), 1L)
    g.table("pe_cust").mutate(
      CellCodec.encode(customer, "c", Seq("c_custkey")), nowMs = 1L)
    g.createIndex("pe_cust", "c", nameQ, nowMs = 2L)
    val tcust = g.table("pe_cust")
    val nCust = customer.count()
    results("prefixLookup5") = timedMin2 {
      var i = 0L
      while (i < 5) {
        val base = (i * 6364136223846793005L >>> 33) % math.max(1L, nCust)
        val prefix = f"Customer#$base%09d".dropRight(1)
        tcust.indexLookupPrefix("c", nameQ, Bytes.toBytes(prefix)).count()
        i += 1
      }
    }

    // randomWrite: a 10% mutation batch appended as a delta
    results("randomWrite") = timed {
      val batch = CellCodec.encode(
        orders.filter(col("o_orderkey") % 10 === 0), "o", Seq("o_orderkey"),
        batchTs = 2L)
      g.table("pe").mutate(batch, nowMs = 2L)
    }

    // sqlUpdate: the row-level delta door end-to-end — matched-row scan
    // (bounded, pushed) + task-staged delta cells + one append commit.
    // ~10% of rows by key range, one qualifier.
    spark.conf.set("spark.sql.catalog.graft_pe",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_pe.root", work)
    results("sqlUpdate") = timed {
      val lo = "X'" + CellCodec.rowKeyOf(1L).map(b => f"$b%02x").mkString + "'"
      val hi = "X'" + CellCodec.rowKeyOf(math.max(2L, keys / 10))
        .map(b => f"$b%02x").mkString + "'"
      val q = "X'" + "o_orderpriority".getBytes("UTF-8")
        .map(b => f"$b%02x").mkString + "'"
      spark.sql(s"""UPDATE graft_pe.pe SET value = CAST('RUSH' AS BINARY)
                    WHERE row >= $lo AND row < $hi AND qualifier = $q""")
    }

    // wideMultiGet20: the relational multiGet (r10) — the SAME 20
    // scrambled keys as multiGet20, but as `key IN (...)` SQL through
    // the wide view: per-key prefix probes pushed to parquet as a range
    // disjunction, typed decode, no Spark re-filter (the IN is accepted
    // on the fixed-width head). Comparable to multiGet20 — the spread is
    // what the relational door (decode + V1 bridge) costs over the raw
    // cell batch on an identical key set.
    results("wideMultiGet20") = timedMin2 {
      val inList = (0L until 20L).map(i =>
        1L + (i * 6364136223846793005L >>> 33) % math.max(1L, keys))
        .mkString(", ")
      spark.sql(s"""SELECT o_orderkey, o_custkey, o_totalprice
                    FROM graft_pe.`pe$$wide`
                    WHERE o_orderkey IN ($inList)""").count(): Unit
    }

    // statsJoin pair: the manifest-size statistics seam PRICED — a graft
    // dim table (cell door, decoded) joined to the orders parquet fact.
    // With statistics the dim side auto-broadcasts (GraftStatsRule, no
    // hint — the require pins that the plan really is a broadcast); with
    // the broadcast threshold disabled the SAME query is what every join
    // against a stats-less V1 DSv2 source gets: both sides shuffled.
    {
      spark.conf.set("spark.sql.catalog.graft_pe",
        classOf[graft.sql.GraftSqlCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_pe.root", work)
      val cust = spark.read.parquet(s"$sfDir/customer.parquet")
        .select("c_custkey", "c_mktsegment")
      g.createTable(TableDescriptor("dimc", Seq(FamilyDescriptor("c"))), 1L)
      g.table("dimc").mutate(
        CellCodec.encode(cust, "c", Seq("c_custkey")), nowMs = 1L)
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      def joined = {
        val cells = spark.sql(
          "SELECT row, qualifier, value FROM graft_pe.dimc")
        val dim = CellCodec.decode(cells, StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("c_mktsegment", StringType))))
        orders.join(dim, col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment").count()
      }
      require(joined.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"), "stats did not broadcast the dim")
      results("statsJoinBroadcast") = timedMin2 { joined.collect(): Unit }
      val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        results("statsJoinShuffle") = timedMin2 { joined.collect(): Unit }
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }

    // statsJoinWideBroadcast (r11): the SAME fact/dim join through the
    // DECLARED wide view — GraftStatsRule matches ANY V1ScanWrapper, so
    // the typed relational dim auto-broadcasts exactly like the
    // cell-door dim above (the require pins it). Prices what the wide
    // door's decode + V1 bridge add over statsJoinBroadcast's raw-cell
    // decode on the same join.
    {
      val cust = spark.read.parquet(s"$sfDir/customer.parquet")
        .select("c_custkey", "c_mktsegment")
      g.createTable(TableDescriptor("dimw", Seq(FamilyDescriptor("c")),
        wideKey = Some("c_custkey:long"),
        wideSchema = Some("c:c_mktsegment:string")), 1L)
      g.table("dimw").mutate(
        CellCodec.encode(cust, "c", Seq("c_custkey")), nowMs = 1L)
      def joined = orders.join(
        spark.sql("SELECT c_custkey, c_mktsegment FROM graft_pe.`dimw$wide`"),
        col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").count()
      require(joined.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"), "wide-door stats did not broadcast")
      results("statsJoinWideBroadcast") = timedMin2 { joined.collect(): Unit }
    }

    // runtimePrune pair (r11): join-driven key pruning PRICED — the wide
    // fact joined to a small DATA-DERIVED dim (customer 7's order keys,
    // ~constant count at any SF). Pruned: the scan reads O(|dim|) probed
    // key ranges (GraftRuntimeFilterRule attaches the dim subtree; the
    // scan collects its keys at execution — the dynamic multiGet).
    // Unpruned (conf off): the same join scans the whole wide table.
    // The pair's divergence across 10x is the design claim: probe cost
    // tracks the dim, full-scan cost tracks the table.
    {
      spark.conf.set("spark.graft.runtimeFilter.maxBuildBytes",
        (256L << 20).toString)
      orders.filter(col("o_custkey") === 7L).select("o_orderkey")
        .createOrReplaceTempView("pe_rt_dim")
      def q = spark.sql(
        """SELECT f.o_orderkey, f.o_totalprice
           FROM graft_pe.`pe$wide` f
           JOIN pe_rt_dim d ON f.o_orderkey = d.o_orderkey""")
      // seam: the probe really attaches and applies on this plan shape
      val probe = q
      probe.collect(): Unit
      require(graft.sql.GraftRuntimeFilter.pruned(probe),
        "runtime filter did not attach/apply on the PE join")
      results("runtimePrunedJoin") = timedMin2 { q.collect(): Unit }
      spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
      try results("runtimeUnprunedJoin") = timedMin2 { q.collect(): Unit }
      finally spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
    }

    // runtimeRangePrune pair (r12): the MID-SIZE dim case — more
    // distinct join keys than the runtime key cap (1,024), so key
    // enumeration declines and the probe DEGRADES to the dim's exact
    // [min, max] key-range superset instead of running unpruned. The
    // dim's key span is ~10% of the table at any SF, so the pruned
    // fact scan reads ~10% of the row groups while the unpruned twin
    // reads them all: the pair's gap is the degradation's value, and
    // the pruned side staying ~flat across 10x is the design claim.
    {
      val span = spark.read.parquet(s"$sfDir/orders.parquet")
        .agg(org.apache.spark.sql.functions.max("o_orderkey")).head.getLong(0)
      // the dim is MATERIALIZED (its own table, as a real star-schema
      // dimension is) — a dim defined as a filter over the fact's own
      // parquet would charge every probe pass a full fact-file scan,
      // a shape no production star join has
      orders.filter(col("o_orderkey") >= (span * 5 / 100) &&
          col("o_orderkey") < (span * 15 / 100)).select("o_orderkey")
        .write.mode("overwrite").parquet(s"$work/pe_rtr_dim")
      spark.read.parquet(s"$work/pe_rtr_dim")
        .createOrReplaceTempView("pe_rtr_dim")
      // aggregated output: the pair prices probe + scan + join, not the
      // driver-side transfer of a ~10%-of-table result set (which is
      // identical in both variants and would mask the scan saving)
      def q = spark.sql(
        """SELECT sum(f.o_totalprice) AS s, count(*) AS n
           FROM graft_pe.`pe$wide` f
           JOIN pe_rtr_dim d ON f.o_orderkey = d.o_orderkey""")
      val probe = q
      probe.collect(): Unit
      require(graft.sql.GraftRuntimeFilter.probeShapes(probe)
        .exists(_._2 == "range"),
        "range degradation did not apply on the PE mid-size dim join")
      results("runtimeRangePrunedJoin") = timedMin2 { q.collect(): Unit }
      spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
      try results("runtimeRangeUnprunedJoin") = timedMin2 { q.collect(): Unit }
      finally spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
    }

    // runtimeClusterPrune pair (r12): the over-cap dim's keys in TWO
    // separated ~5%-span clusters. The clustered degradation prunes
    // with gap-separated occupied runs and skips the ~60%-span hole
    // between them; the maxRanges=1 twin degrades to the single
    // [min, max] span and must read the hole too — the pair's gap is
    // what clustering adds ON TOP of the r12 range degradation.
    {
      // cluster bounds from the key QUANTILES, not span percentages —
      // scaled corpora band their keys (ScaleData shifts each replica by
      // a large stride), so a span-relative window can land in an empty
      // hole; the 5-10% and 70-75% mass windows are non-empty and
      // separated by construction at every scale
      val qs = spark.read.parquet(s"$sfDir/orders.parquet")
        .stat.approxQuantile("o_orderkey",
          Array(0.05, 0.10, 0.70, 0.75), 0.001)
      orders.filter(
        (col("o_orderkey") >= qs(0) && col("o_orderkey") < qs(1)) ||
          (col("o_orderkey") >= qs(2) && col("o_orderkey") < qs(3)))
        .select("o_orderkey")
        .write.mode("overwrite").parquet(s"$work/pe_rtc_dim")
      spark.read.parquet(s"$work/pe_rtc_dim")
        .createOrReplaceTempView("pe_rtc_dim")
      // aggregated output, same reason as the range pair above
      def q = spark.sql(
        """SELECT sum(f.o_totalprice) AS s, count(*) AS n
           FROM graft_pe.`pe$wide` f
           JOIN pe_rtc_dim d ON f.o_orderkey = d.o_orderkey""")
      val probe = q
      probe.collect(): Unit
      require(graft.sql.GraftRuntimeFilter.rangeCounts(probe)
        .exists(_._2 > 1),
        "clustered degradation did not produce gap-separated runs")
      results("runtimeClusterPrunedJoin") = timedMin2 { q.collect(): Unit }
      spark.conf.set("spark.graft.runtimeFilter.maxRanges", "1")
      try results("runtimeClusterSingleRangeJoin") =
        timedMin2 { q.collect(): Unit }
      finally spark.conf.unset("spark.graft.runtimeFilter.maxRanges")
    }

    // mixedOr pair (r12): `k < 1% OR custkey IN (...)` — the
    // RowFilter-OR-SCVF FilterList shape. Before the index exists the
    // disjunction is residual-only (full scan); after createIndex the
    // SAME query routes mixed (row-range branch off the scan + index
    // probe for the rest). The indexLookup5/fullScanLookup5 pattern:
    // time the unrouted twin FIRST, then build, then the routed side.
    {
      def q = spark.sql(
        s"""SELECT sum(o_totalprice) AS s, count(*) AS n
            FROM graft_pe.`pe$$wide`
            WHERE o_orderkey < ${keys / 100}
               OR o_custkey IN (7, 37, 73)""")
      results("mixedOrFullScan") = timedMin2 { q.collect(): Unit }
      g.createIndex("pe", "o", custQ, nowMs = 2L)
      val probe = q
      probe.collect(): Unit
      require(graft.sql.GraftWideSeams.mixedOrShapes(probe)
        .exists(s => s._1 >= 1 && s._2.nonEmpty),
        "mixed OR did not route after the index build")
      results("mixedOrRouted") = timedMin2 { q.collect(): Unit }
    }

    // routeGuard pair (r13): an ANTI-selective indexed disjunction —
    // `status IN ('O', 'F')` matches ~97% of orders — was the one legal
    // input where routing LOST to the pushed scan it replaced (index
    // probe + row-key dedup + gather join over most of the table; the
    // reference's filters stream inside the scan and never pay this,
    // ScanQueryMatcher.java:186-200). The selectivity guard measures
    // and declines: `routeGuardFallback` is the guarded path (capped
    // occupancy probe + pushed scan), `routeGuardForcedRoute` the same
    // query with the guard disabled — the r12 behavior. Forced should
    // exceed fallback; the selective workloads (mixedOrRouted,
    // indexLookup5) sit on the other side of the crossover.
    {
      // NOTE the status index persists on the shared 'pe' table from
      // here on — no later workload carries a status predicate, so
      // nothing downstream changes routing; a future workload that does
      // should build its own table (the r15 guardHistogram pair does).
      g.createIndex("pe", "o", Bytes.toBytes("o_orderstatus"), nowMs = 3L)
      def q = spark.sql(
        s"""SELECT sum(o_totalprice) AS s, count(*) AS n
            FROM graft_pe.`pe$$wide`
            WHERE o_orderstatus IN ('O', 'F')""")
      spark.conf.set("spark.graft.route.guard.minIndexRows", "0")
      try {
        val guarded = q
        guarded.collect(): Unit
        require(graft.sql.GraftRouteSeams.guardDeclined(guarded),
          "route guard did not decline the anti-selective arm")
        results("routeGuardFallback") = timedMin2 { q.collect(): Unit }
        spark.conf.set("spark.graft.route.guard.enabled", "false")
        try {
          val forced = q
          forced.collect(): Unit
          require(graft.sql.GraftWideSeams.usedIndexTables(forced).nonEmpty,
            "guard-off twin did not route — fixture drift?")
          results("routeGuardForcedRoute") = timedMin2 { q.collect(): Unit }
        } finally spark.conf.set("spark.graft.route.guard.enabled", "true")
      } finally spark.conf.unset("spark.graft.route.guard.minIndexRows")
    }

    // guardHistogram pair (r15): the OTHER side of the budget — a
    // SELECTIVE equality (a derived custkey-digit column, 10% of
    // orders; the corpus's natural categoricals are uniform thirds,
    // all anti-selective) whose hit count exceeds a forced-low probe
    // budget (64). r14's exhaustion rule surrendered this route to the
    // pushed scan exactly where the index advantage is largest; the
    // persisted equi-depth histogram's upper bound now VOUCHES it with
    // zero measurement jobs. `guardHistogramRouted` is the r15
    // behavior; the `guardHistogramDeclined` twin disables the
    // histogram so the budget exhausts and the query runs as the
    // pushed scan — the r14 behavior at the same knob settings. Routed
    // should beat declined, and the gap is the routing reach the
    // histogram buys. Own table (a string category column — the long
    // custkey's 0x00-embedding bounds never histogram-vouch by
    // design), untimed setup. The probed category marks a CLUSTERED
    // ~1% key block (quantile-derived — banded scaled corpora make
    // span-relative windows unreliable): the span-bounded gather then
    // reads ~the block, the tenant/time-block shape where index
    // routing genuinely wins. Two boundary shapes were measured first
    // and recorded in BENCHNOTES: a SCATTERED 10% value set (gather
    // span degenerates to the whole table — cost-neutral at best) and
    // a CLUSTERED 10% block (150k-hit dedup + broadcast + span scan
    // exceed the plain scan at sf1's per-job floors) — the 20%
    // fraction heuristic still routes those, so they are its honest
    // measured boundary; the pair prices the WIN shape.
    {
      val qh = spark.read.parquet(s"$sfDir/orders.parquet")
        .stat.approxQuantile("o_orderkey", Array(0.45, 0.46), 0.001)
      g.createTable(TableDescriptor("peh", Seq(FamilyDescriptor("o")),
        wideKey = Some("o_orderkey:long"),
        wideSchema = Some("o:ckd:string;o:o_totalprice:double")), 6L)
      g.table("peh").mutate(CellCodec.encode(
        orders.select(col("o_orderkey"),
          when(col("o_orderkey") >= qh(0) && col("o_orderkey") < qh(1),
            lit("7"))
            .otherwise(concat(lit("d"),
              pmod(col("o_custkey"), lit(9L))
                .cast(org.apache.spark.sql.types.StringType))).as("ckd"),
          col("o_totalprice")),
        "o", Seq("o_orderkey")), nowMs = 6L)
      g.createIndex("peh", "o", Bytes.toBytes("ckd"), nowMs = 7L)
      def q = spark.sql(
        s"""SELECT sum(o_totalprice) AS s, count(*) AS n
            FROM graft_pe.`peh$$wide`
            WHERE ckd = '7'""")
      spark.conf.set("spark.graft.route.guard.minIndexRows", "0")
      spark.conf.set("spark.graft.route.guard.maxProbeRows", "64")
      try {
        val routed = q
        routed.collect(): Unit
        require(graft.sql.GraftWideSeams.usedIndexTables(routed).nonEmpty &&
          !graft.sql.GraftRouteSeams.guardDeclined(routed),
          "histogram did not vouch the selective probe past the budget")
        results("guardHistogramRouted") = timedMin2 { q.collect(): Unit }
        spark.conf.set("spark.graft.route.guard.histogram", "false")
        try {
          val declined = q
          declined.collect(): Unit
          require(graft.sql.GraftRouteSeams.guardDeclined(declined),
            "histogram-off twin did not exhaustion-decline — drift?")
          results("guardHistogramDeclined") = timedMin2 { q.collect(): Unit }
        } finally spark.conf.unset("spark.graft.route.guard.histogram")
      } finally {
        spark.conf.unset("spark.graft.route.guard.minIndexRows")
        spark.conf.unset("spark.graft.route.guard.maxProbeRows")
      }
    }

    // cell-door runtime VALUE pair (r13): a fact-dim join on the indexed
    // custkey VALUE through the CELL door — the reference's native
    // surface as a star join. The dim is MATERIALIZED parquet (the
    // BENCHNOTES lesson: a dim defined over the fact's own files charges
    // every probe pass a fact scan). This pair prices the REFUSAL bound,
    // not a win: the dim's hash-scattered values are the shape where a
    // broadcast join over one scan is already the optimal plan — under
    // the 64-key value cap the tiny-range probe stays near-parity (the
    // probe+gather job floor vs one scan), over it the clustered-range
    // degradation is anti-selective and the guard DECLINES, so pruned
    // must track unpruned instead of paying probe machinery (an r13
    // interim without the cap paid 9x here). The WIN cases are priced
    // by their own pairs: clustered value dims (runtimeRangePrunedJoin /
    // runtimeClusterPrunedJoin) and selective static probes
    // (registeredIndexLookup5).
    {
      val dimPath = s"$work/cellval_dim"
      orders.filter(pmod(xxhash64(col("o_custkey")), lit(500)) === 7)
        .select(CellCodec.encodeValue(col("o_custkey"),
          org.apache.spark.sql.types.LongType, ordered = false).as("cv"))
        .distinct().write.mode("overwrite").parquet(dimPath)
      spark.read.parquet(dimPath).createOrReplaceTempView("pe_cellval_dim")
      val ckHex = "X'" + Bytes.toBytes("o_custkey")
        .map(x => f"$x%02x").mkString + "'"
      def q = spark.sql(
        s"""SELECT f.row, f.value FROM graft_pe.pe f
            JOIN pe_cellval_dim d ON f.value = d.cv
            WHERE f.family = 'o' AND f.qualifier = $ckHex""")
      val probe = q
      probe.collect(): Unit
      require(graft.sql.GraftRuntimeFilter.probeShapes(probe)
        .exists(_._1 == "value"),
        "cell-door value probe did not apply — fixture drift?")
      results("runtimeCellValueJoin") = timedMin2 { q.collect(): Unit }
      spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
      try results("runtimeCellValueUnprunedJoin") =
        timedMin2 { q.collect(): Unit }
      finally spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
    }

    // annLshHash: hash-derived-hyperplane ANN top-k (native HyperplaneBand
    // signatures). Timed here rather than in the correctness battery:
    // DuckDB cannot recompute xxhash64 buckets, so the battery carries the
    // md5-plane variant (full oracle) and this workload keeps the fused
    // signature path's performance tracked round-over-round.
    results("annLshHash") = timedMin2 {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      graft.pipeline.Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, bands = 16, bitsPerBand = 8)
        .count(): Unit
    }

    // annMatryoshka (r10): two-stage prefix-shortlist + full-dim re-rank.
    // The corpus-sized pass reads prefixDim/dim of each vector and ranks
    // an ids-only frame; re-rank touches queries x shortlist rows. The
    // delta vs the brute window in similarity_topk is the shortlist
    // effect; at 100 TB the prefix pass is the only corpus-wide stage.
    results("annMatryoshka") = timedMin2 {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      graft.pipeline.Similarity.matryoshkaTopK(
        emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, prefixDim = 16, shortlist = 20)
        .count(): Unit
    }

    // annMatryoshkaIvf pair (r11): the bucketed composition — stage 1
    // touches only nProbe/nLists of the corpus AND only prefixDim/dim of
    // each touched vector. The coarse quantizer trains ONCE, outside the
    // query timer (`annMatryoshkaIvfTrain` — at scale the codebook is
    // ingest-time state like an index); the query pair with
    // annMatryoshka (linear stage 1, same prefix/shortlist/k) prices the
    // bucket restriction: stage-1 QUERY cost tracks probed buckets.
    {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      var cents: Seq[(Int, Seq[Double])] = Nil
      results("annMatryoshkaIvfTrain") = timed {
        cents = graft.pipeline.Similarity.ivfTrain(
          emb, "vec_id", "embedding", nLists = 16, iters = 2)
      }
      results("annMatryoshkaIvf") = timedMin2 {
        graft.pipeline.Similarity.matryoshkaIvfTopKWith(
          emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, prefixDim = 16, shortlist = 20,
          cents, nProbe = 2)
          .count(): Unit
      }
    }

    // annPqAdc: product-quantization ANN end-to-end (maximin-seeded L2
    // codebook training + PqEncode codes + ADC-table scan + exact
    // re-rank). Like annLshHash, timed here rather than oracle-gated: the
    // k-means training has no tractable SQL replay; recall and the
    // native-expression parity are spec-asserted.
    results("annPqAdc") = timedMin2 {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val books = graft.pipeline.Similarity.pqTrain(
        emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
      graft.pipeline.Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", kNN = 5, codebooks = books)
        .count(): Unit
    }

    // canonicalFoldScan: the ingest canonicalization pass (NFC + full
    // lowercase + accent strip, native codegen'd kernels) over the whole
    // documents corpus — the normalization every hash-based dedup assumes
    // already ran at ingest, so its scan rate IS the ingest budget line.
    results("canonicalFoldScan") = timedMin2 {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      docs.select(graft.pipeline.Text.canonicalFold(col("text")).as("k"))
        .write.format("noop").mode("overwrite").save()
    }

    // auditExact vs auditApprox (r10): the corpus-audit cost cliff. The
    // exact path pays a per-group sort (rank-pick quantiles) plus the
    // distinct-count shuffle; the sketch path (HLL++ distinct,
    // percentile_approx quantiles) is ONE partial-aggregating pass with
    // constant per-group state — the shape that survives 100 TB. The
    // sketch's error bounds are spec-pinned against the exact anchor.
    {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      results("auditExact") = timedMin2 {
        val exact = graft.pipeline.Text.corpusStats(docs, col("lang"),
          graft.pipeline.Text.tokenCount(col("text")), col("doc_id"))
        val distinct = docs.groupBy(col("lang").as("group"))
          .agg(countDistinct(
            graft.pipeline.Text.fingerprint(col("text"))).as("d"))
        exact.join(distinct, "group").collect(): Unit
      }
      results("auditApprox") = timedMin2 {
        graft.pipeline.Text.corpusStatsApprox(docs, col("lang"),
          graft.pipeline.Text.tokenCount(col("text")), col("text"))
          .collect(): Unit
      }
    }

    // segmentDedup (r10): the CCNet segment-level dedup corpus pass —
    // window split, md5-keyed doc-frequency count, survivor join,
    // position-ordered reassembly, full result materialized. Cost should
    // track corpus tokens linearly: all three shuffles are constant-width
    // (32-byte hash keys; reassembly width bounded by document size).
    results("segmentDedup") = timedMin2 {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      graft.pipeline.Text.segmentDedup(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }

    // dsirScore (r10): DSIR importance scoring end-to-end — bigram
    // featurization of the full corpus AND the target sample, the two
    // bucket-count models, the broadcast ratio join, the per-doc reduce.
    // The cost should track corpus tokens linearly (one narrow explode +
    // one broadcast join + one agg); the model side is buckets-bounded.
    results("dsirScore") = timedMin2 {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      graft.pipeline.Sampling.dsirWeights(docs,
        docs.filter(col("source") === "src0")).count(): Unit
    }

    // intervalJoinSkew: the binned equi-join vs the naive residual range
    // join on a DELIBERATELY hot-keyed copy of the events table
    // (user_id % 8 — each key holds ~1/8 of all clicks and purchases).
    // The naive plan pairs every (click, purchase) of a key before the
    // range filter runs — quadratic per key — while the binned plan only
    // pairs within (key, 24h-bin) co-occupancy. Both counted to force the
    // full join; the pair counts are identical (spec-proven operator
    // equality), so the delta is pure plan shape.
    {
      val ev = graft.core.EventTime.normalize(
        graft.core.EventTime.readAdaptive(spark, s"$sfDir/events.parquet"))
        .withColumn("hk", col("user_id") % 8)
      val winNs = 24L * 3600L * 1000000000L
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("hk"), col("ts"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("hk").as("phk"),
          col("ts").as("pts"))
      results("intervalJoinBinned") = timedMin2 {
        graft.jobs.Jobs.intervalJoin(clicks, purch,
          col("hk"), col("phk"), col("ts"), col("pts"),
          rightEnd = col("pts") + winNs, binWidth = winNs)
          .count(): Unit
      }
      results("intervalJoinNaive") = timedMin2 {
        clicks.join(purch, col("hk") === col("phk") &&
            col("ts") >= col("pts") && col("ts") <= col("pts") + winNs)
          .count(): Unit
      }
    }

    val json = results.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val line =
      s"""{"metric":"pe_total","value":${results.values.sum},"unit":"sec","workloads":{$json},"sf":"$sfDir"}"""
    println(line)
    // also persist as a diffable artifact (PE_rNN.json) so point-read /
    // write regressions are tracked round-over-round, not from memory
    sys.env.get("SPARK_GRAFT_PE_OUT").foreach { path =>
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        (line + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
