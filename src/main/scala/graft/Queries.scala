package graft

import graft.core.{Bytes, CellCodec, EventTime}
import graft.read._
import graft.write.{Compact, Mutations}
import graft.pipeline.{Dedup, Multimodal, Pack, Sampling, Similarity, Text}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver-checked query battery: one entry per implemented operator
  * (SURVEY.md §2), each with an ANSI-SQL DuckDB oracle over the raw parquet
  * tables. The pattern for engine-semantics operators is
  * relational → `CellCodec.encode` → operator → `CellCodec.decode` →
  * relational, so the oracle can be plain SQL on the source table while the
  * Spark side exercises the full cell pipeline.
  *
  * Determinism rules (driver hash-compares):
  *  - every query ends in an ORDER BY on a unique non-null key, mirrored in
  *    the oracle;
  *  - double aggregates go through exact DECIMAL arithmetic and are cast
  *    back to double at the end (bit-identical in Spark and DuckDB);
  *  - pass-through doubles are untouched (same parquet bits on both sides).
  */
object Queries {

  final case class Q(
      name: String,
      oracle: Option[String],
      bench: Boolean = false)(val run: (SparkSession, String) => DataFrame)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // Exact decimal money/rate types for order-independent, engine-identical
  // aggregation (raw double sums differ in final ulps between engines and
  // across partition orders).
  private val money = DecimalType(12, 2)
  private val rate = DecimalType(12, 4)
  private def m(c: String): Column = col(c).cast(money)
  private def r(c: String): Column = col(c).cast(rate)
  private val oneR: Column = lit(1).cast(rate)

  /** Cell-table fixture store: each encoded variant is materialized ONCE
    * per (source file mtime+size, variant) into a tmp dir with
    * `Catalog.append`'s exact layout (range-partitioned by row, sorted by
    * full cell order), then SCANNED like any stored table. The reference's
    * own `PerformanceEvaluation` likewise writes the table before timing
    * scans — encode-on-the-fly would (a) measure fixture construction
    * (explode + value codecs) instead of the engine and (b) re-run the
    * encode in every branch of plans that reuse the input (e.g. the
    * PageFilter keys + probe sides). */
  private def storedCells(s: SparkSession, dir: String, table: String,
      variant: String)(build: => DataFrame): DataFrame = {
    val src = new java.io.File(s"$dir/$table.parquet")
    val root = new java.io.File(
      s"/tmp/graft_cellstore/${src.lastModified}_${src.length}/$variant")
    // The store is shared across harness PROCESSES (Verify + Bench can
    // run concurrently): a cross-process FileLock serializes build +
    // publish, so exactly one process builds, losers block and adopt the
    // winner's copy, and a published root (which always carries
    // _SUCCESS) is never deleted out from under a reader. A root WITHOUT
    // _SUCCESS under the lock is a crashed writer's partial copy and is
    // self-healed. Queries.synchronized additionally serializes within
    // the JVM (FileLock throws on same-JVM overlap instead of blocking).
    Queries.synchronized {
      if (!new java.io.File(root, "_SUCCESS").exists()) {
        root.getParentFile.mkdirs()
        val lockPath = new java.io.File(root.getParentFile,
          s".${root.getName}.lock").toPath
        val ch = java.nio.channels.FileChannel.open(lockPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        val lock = ch.lock()
        try {
          if (!new java.io.File(root, "_SUCCESS").exists()) {
            if (root.exists()) deleteRec(root)
            val tmp = new java.io.File(root.getParentFile,
              s".${root.getName}.tmp${ProcessHandle.current().pid()}")
            build
              .repartitionByRange(32, col("row"))
              .sortWithinPartitions(col("row"), col("family"), col("qualifier"),
                col("ts").desc, col("seq").desc)
              .write.mode("overwrite").parquet(tmp.toString)
            // Write-side tombstone stats (r17), same contract as
            // Catalog.writeCells: the store's exact non-Put count rides
            // next to the data, so Resolve.masked proves
            // tombstone-freeness from metadata instead of running a
            // probe job per scan. Computed once here at store-build
            // time — the writer's knowledge, not a query-time cache.
            val tomb = s.read.schema(graft.core.Cell.schema)
              .parquet(tmp.toString)
              .filter(col("kind") =!= graft.core.CellKind.Put).count()
            graft.core.StoreStats.write(
              org.apache.hadoop.fs.FileSystem.getLocal(
                s.sparkContext.hadoopConfiguration),
              new org.apache.hadoop.fs.Path(tmp.toString), tomb)
            if (!tmp.renameTo(root)) {
              deleteRec(tmp)
              throw new IllegalStateException(
                s"cellstore publish failed under lock: $root")
            }
          }
        } finally { lock.release(); ch.close() }
      }
    }
    s.read.schema(graft.core.Cell.schema).parquet(root.toString)
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }

  /** `X'..'` SQL literal for an engine row key (shared by the SQL-door
    * queries — the encoding must match `CellCodec.rowKeyOf` exactly). */
  private def hexKey(k: Long): String =
    "X'" + CellCodec.rowKeyOf(k).map(b => f"$b%02x").mkString + "'"

  private def ordersCells(s: SparkSession, dir: String): DataFrame =
    storedCells(s, dir, "orders", "orders_o")(
      CellCodec.encode(t(s, dir, "orders"), "o", Seq("o_orderkey")))

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    // Parquet timestamp[ms] isAdjustedToUTC=false — Spark 4 reads NTZ;
    // keeping NTZ end-to-end makes our output bit-match DuckDB's TIMESTAMP.
    StructField("o_orderdate", TimestampNTZType),
    StructField("o_orderpriority", StringType)))

  private val ordersCols =
    "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"

  private val customerCols =
    "c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment"

  private val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  private def sub(parent: StructType, names: String*): StructType =
    StructType(names.map(n => parent(n)))

  /** nanos since epoch for an ISO date at UTC midnight (deterministic).
    * Cell timestamps for the events table are epoch NANOS regardless of the
    * unit the parquet writer chose — `EventTime` dispatches on the actual
    * column type at ingest (`eventsNs`), and these constants come from the
    * same contract so TimeRange/as-of bounds always agree with the data. */
  private def nanosOf(isoDate: String): Long = EventTime.nanosOf(isoDate)

  /** THE events-table ingest point: `ts` normalized to epoch-nanos long by
    * schema dispatch (ns-as-long, us/ms NTZ, instant timestamps all land
    * identically). Every consumer reads through here — an upstream unit
    * change is one adapted branch, not ten broken queries. */
  // readAdaptive: a TIMESTAMP(NANOS)-annotated regen (unreadable under
  // Spark 4.1's inferred NTZ) reads as epoch-nanos longs instead — the
  // same shape the normalize seam already dispatches on LongType
  private def eventsNs(s: SparkSession, dir: String): DataFrame =
    EventTime.normalize(EventTime.readAdaptive(s, s"$dir/events.parquet"))

  // ----------------------------------------------------------------------
  // Aggregation surface (RowCounter/GroupingTableMapper analogs — SURVEY
  // §2.4 — generalized to the relational view; bench headliners).
  // ----------------------------------------------------------------------

  // DuckDB's direct DECIMAL->DOUBLE cast is twice-rounded (int128->double,
  // then scale adjust) and drifts 1 ulp from Spark's correctly-rounded
  // BigDecimal.doubleValue once the unscaled value exceeds 2^53 (observed on
  // sum_charge at sf0.001). The VARCHAR round-trip forces strtod, which IS
  // correctly rounded — so both engines agree at any magnitude.
  private def d2d(expr: String): String = s"CAST(CAST($expr AS VARCHAR) AS DOUBLE)"
  private val sumQtySql = "sum(CAST(l_quantity AS DECIMAL(12,2)))"
  private val sumPriceSql = "sum(CAST(l_extendedprice AS DECIMAL(12,2)))"
  private val sumDiscSql = "sum(CAST(l_discount AS DECIMAL(12,4)))"
  private val discPriceSql = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))"

  private val q1Agg = Q("q1_agg", Some(s"""
    SELECT l_returnflag, l_linestatus,
      ${d2d(sumQtySql)} AS sum_qty,
      ${d2d(sumPriceSql)} AS sum_base_price,
      ${d2d(s"sum($discPriceSql)")} AS sum_disc_price,
      ${d2d(s"sum($discPriceSql * (CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4))))")} AS sum_charge,
      ${d2d(sumQtySql)} / count(*) AS avg_qty,
      ${d2d(sumPriceSql)} / count(*) AS avg_price,
      ${d2d(sumDiscSql)} / count(*) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""), bench = true) { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1999-09-02").cast(TimestampType))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(m("l_quantity")).cast(DoubleType).as("sum_qty"),
        sum(m("l_extendedprice")).cast(DoubleType).as("sum_base_price"),
        // Sums run exact DECIMAL end-to-end, DOUBLE only at the very end:
        // the final cast is correctly rounded in both engines while the
        // unscaled sum fits 2^53 (verified bit-exact vs DuckDB at sf0.1 by
        // tools/exact_diff.py). DECIMAL output columns are avoided — the
        // driver's value hasher normalizes DECIMAL and DOUBLE differently
        // across the two engines' result paths (r01: the only two red rows
        // were exactly the two DECIMAL-emitting queries, values identical).
        sum(m("l_extendedprice") * (oneR - r("l_discount")))
          .cast(DoubleType).as("sum_disc_price"),
        sum(m("l_extendedprice") * (oneR - r("l_discount")) * (oneR + r("l_tax")))
          .cast(DoubleType).as("sum_charge"),
        (sum(m("l_quantity")).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(m("l_extendedprice")).cast(DoubleType) / count(lit(1))).as("avg_price"),
        (sum(r("l_discount")).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val q3Join = Q("q3_join_topn", Some(s"""
    SELECT l_orderkey, CAST(CAST(revenue AS VARCHAR) AS DOUBLE) AS revenue,
      o_orderdate, o_orderpriority
    FROM (
      SELECT l_orderkey,
        sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS revenue,
        o_orderdate, o_orderpriority
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-03-15'
        AND l_shipdate > TIMESTAMP '1998-03-15'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10)"""), bench = true) { (s, dir) =>
    val cutoff = lit("1998-03-15").cast(TimestampType)
    // customer is the small dim at every SF — broadcast it explicitly.
    val cust = broadcast(
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING"))
    t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
      .join(t(s, dir, "orders").filter(col("o_orderdate") < cutoff),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      // Top-N is selected on the EXACT decimal revenue (both engines), so
      // the chosen rows cannot shift even if a double rounding collides;
      // the DOUBLE projection happens only after the LIMIT.
      .agg(sum(m("l_extendedprice") * (oneR - r("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
      .select(col("l_orderkey"), col("revenue").cast(DoubleType).as("revenue"),
        col("o_orderdate"), col("o_orderpriority"))
  }

  // ----------------------------------------------------------------------
  // Scan / Get surface (SURVEY §2.1)
  // ----------------------------------------------------------------------

  private val scanRange = Q("scan_range_filter", Some(s"""
    SELECT $ordersCols FROM orders
    WHERE o_orderkey >= 100 AND o_orderkey < 500 AND o_orderstatus = 'F'
    ORDER BY o_orderkey"""), bench = true) { (s, dir) =>
    val scan = Scan()
      .setStartRow(Bytes.toBytes(100L)).setStopRow(Bytes.toBytes(500L))
      .addFamily("o")
      .setFilter(SingleColumnValueFilter("o", Bytes.toBytes("o_orderstatus"),
        CompareOp.EQUAL, BinaryComparator(Bytes.toBytes("F"))))
    CellCodec.decode(ScanExec(ordersCells(s, dir), scan), ordersSchema)
      .orderBy("o_orderkey")
  }

  // Salt + secondary index as TABLE properties (catalog/Catalog.scala):
  // one catalog root holding `orders_s`, the orders table stored under a
  // 16-bucket salted layout DECLARED IN THE DESCRIPTOR (Catalog.append
  // salts on write) with a registered global index on o_custkey. The two
  // appends split around CREATE INDEX so the index content covers both
  // the initial build and the automatic append-time maintenance. Shared
  // by salted_scan and salted_index_lookup.
  private val saltedRoots = scala.collection.mutable.Map.empty[String, String]
  private def saltedOrdersRoot(s: SparkSession, dir: String): String =
    Queries.synchronized {
      saltedRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-salted").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("orders_s",
          Seq(FamilyDescriptor("o")), splitKeys = 8, saltBuckets = 16),
          nowMs = 1L)
        val cells = CellCodec.encode(t(s, dir, "orders"), "o", Seq("o_orderkey"))
        val second = pmod(xxhash64(col("row")), lit(3)) === 0
        g.table("orders_s").mutate(cells.filter(!second), nowMs = 1L)
        g.createIndex("orders_s", "o", Bytes.toBytes("o_custkey"), nowMs = 2L)
        g.table("orders_s").mutate(cells.filter(second), nowMs = 2L)
        r
      })
    }

  // Property-driven salted scan: a PLAIN facade range scan on the salted
  // table — no Salt.* calls anywhere, the descriptor's saltBuckets makes
  // the logical bounds compile to the scatter-gather on the salted sort
  // order and strip back to logical keys. Oracle is the plain unsalted
  // range — salting must be invisible to query semantics.
  private val saltedScan = Q("salted_scan", Some(s"""
    SELECT $ordersCols FROM orders
    WHERE o_orderkey >= 1000 AND o_orderkey < 5000
    ORDER BY o_orderkey""")) { (s, dir) =>
    val g = graft.Graft(s, saltedOrdersRoot(s, dir))
    val res = g.table("orders_s").scan(
      Scan(Some(Bytes.toBytes(1000L)), Some(Bytes.toBytes(5000L))))
    CellCodec.decode(res, ordersSchema).orderBy("o_orderkey")
  }

  // Salted table + registered index COMPOSE (the hot-write +
  // selective-read production shape): the facade lookup probes the
  // index (logical keys — append indexes the batch before salting),
  // gathers the logical view, verifies. Half the matching rows entered
  // through the initial CREATE INDEX build, half through append-time
  // maintenance. Oracle is the plain predicate.
  private val saltedIndexLookup = Q("salted_index_lookup", Some(s"""
    SELECT $ordersCols FROM orders WHERE o_custkey IN (7, 37, 73)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val g = graft.Graft(s, saltedOrdersRoot(s, dir))
    val hit = g.table("orders_s").indexLookup("o", Bytes.toBytes("o_custkey"),
      Seq(7L, 37L, 73L).map(Bytes.toBytes))
    CellCodec.decode(hit, ordersSchema).orderBy("o_orderkey")
  }

  // The multiGet shape through the SQL door: `row IN (keys)` over the
  // SALTED catalog table — each key salts JVM-side, the span bounds
  // prune the parquet scan, a broadcast semi-join picks the exact keys,
  // logical rows come back (sql/GraftSqlTable.scala rowKeys push;
  // SqlCatalogSpec asserts the pushed key disjunction). Oracle = the
  // plain IN predicate.
  private val sqlMultiGet = Q("sql_multi_get", Some(s"""
    SELECT $ordersCols FROM orders WHERE o_orderkey IN (100, 101, 4000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = saltedOrdersRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_s",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_s.root", root)
    val keys = Seq(100L, 101L, 4000L)
      .map(k => "X'" + CellCodec.rowKeyOf(k).map(b => f"$b%02x").mkString + "'")
      .mkString(", ")
    val cells = s.sql(
      s"""SELECT row, family, qualifier, ts, kind, value, seq
          FROM graft_s.orders_s WHERE row IN ($keys)""")
    CellCodec.decode(cells, ordersSchema).orderBy("o_orderkey")
  }

  // Secondary-index lookup (read/Index.scala): "orders of customer k"
  // without a full scan — the index table (value-prefix row keys) is
  // range-probed per key, hit row keys broadcast into the main scan,
  // and the verifying SingleColumnValueFilter re-checks the current
  // visible value. Oracle is the plain predicate — the index must be
  // invisible to semantics.
  private val indexLookup = Q("index_lookup", Some(s"""
    SELECT $ordersCols FROM orders WHERE o_custkey IN (7, 37, 73)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val main = ordersCells(s, dir)
    val idx = storedCells(s, dir, "orders", "orders_custkey_idx")(
      SecondaryIndex.indexCells(
        CellCodec.encode(t(s, dir, "orders"), "o", Seq("o_orderkey")),
        "o", Bytes.toBytes("o_custkey")))
    val hit = SecondaryIndex.lookupAll(main, idx, "o",
      Bytes.toBytes("o_custkey"), Seq(7L, 37L, 73L).map(Bytes.toBytes))
    CellCodec.decode(hit, ordersSchema).orderBy("o_orderkey")
  }

  // TRANSPARENT index routing through the SQL door (the Phoenix
  // property): the user writes a plain value-equality SQL predicate over
  // a table with a REGISTERED index on (o, o_custkey) and the scan
  // builder rewrites it into an index probe + gather — SqlCatalogSpec
  // asserts the plan seam (usedIndexTable + the index table's parquet in
  // the inner plan); this gate proves the routed answer matches the
  // full-scan oracle exactly.
  private val sqlIndexRoots = scala.collection.mutable.Map.empty[String, String]
  /** One registered-index fixture per sf dir (table `orders_ix`, index on
    * (o, o_custkey)), shared by the equality, IN, and range gates. */
  private def sqlIndexRoot(s: SparkSession, dir: String): String =
    Queries.synchronized {
      sqlIndexRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-sqlix").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("orders_ix",
          Seq(FamilyDescriptor("o")), splitKeys = 8), nowMs = 1L)
        g.table("orders_ix").mutate(
          CellCodec.encode(t(s, dir, "orders"), "o", Seq("o_orderkey")),
          nowMs = 1L)
        g.createIndex("orders_ix", "o", Bytes.toBytes("o_custkey"), nowMs = 2L)
        r
      })
    }
  private val sqlIndexLookup = Q("sql_index_lookup", Some("""
    SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey IN (7, 37, 73)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = sqlIndexRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_ix",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_ix.root", root)
    val qual = "X'" + Bytes.toBytes("o_custkey").map(b => f"$b%02x").mkString + "'"
    val vals = Seq(7L, 37L, 73L)
      .map(k => "X'" + Bytes.toBytes(k).map(b => f"$b%02x").mkString + "'")
      .mkString(", ")
    val cells = s.sql(
      s"""SELECT row, family, qualifier, ts, kind, value, seq
          FROM graft_ix.orders_ix
          WHERE family = 'o' AND qualifier = $qual AND value IN ($vals)""")
    CellCodec.decode(cells,
      StructType(Seq(StructField("o_custkey", LongType))),
      key = Seq("o_orderkey" -> LongType))
      .orderBy("o_orderkey")
  }

  // Index-backed RANGE lookup (read/Index.scala probeRange): comparison
  // predicates on the indexed value — the reference's dominant filter
  // surface (CompareFilter LESS/GREATER... via SingleColumnValueFilter)
  // — served as ONE pruned range scan of the value-prefix index layout
  // plus the verified re-check. Oracle is the plain interval predicate —
  // the index must be invisible to semantics.
  private val indexRangeLookup = Q("index_range_lookup", Some(s"""
    SELECT $ordersCols FROM orders WHERE o_custkey >= 40 AND o_custkey < 60
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = sqlIndexRoot(s, dir)
    val g = graft.Graft(s, root)
    val hit = g.table("orders_ix").indexLookupRange("o",
      Bytes.toBytes("o_custkey"),
      Some(Bytes.toBytes(40L)), Some(Bytes.toBytes(60L)))
    CellCodec.decode(hit, ordersSchema).orderBy("o_orderkey")
  }

  // The same interval through the SQL door: plain `value >= .. AND
  // value < ..` comparisons on the indexed column route through the
  // registered index transparently (GraftScanBuilder records the
  // interval; SqlCatalogSpec asserts the route seam). Oracle = the
  // full-scan formulation.
  private val sqlIndexRange = Q("sql_index_range", Some("""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey >= 40 AND o_custkey < 60
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = sqlIndexRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_ixr",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_ixr.root", root)
    val qual = "X'" + Bytes.toBytes("o_custkey").map(b => f"$b%02x").mkString + "'"
    def h(v: Long) = "X'" + Bytes.toBytes(v).map(b => f"$b%02x").mkString + "'"
    val cells = s.sql(
      s"""SELECT row, family, qualifier, ts, kind, value, seq
          FROM graft_ixr.orders_ix
          WHERE family = 'o' AND qualifier = $qual
            AND value >= ${h(40L)} AND value < ${h(60L)}""")
    CellCodec.decode(cells,
      StructType(Seq(StructField("o_custkey", LongType))),
      key = Seq("o_orderkey" -> LongType))
      .orderBy("o_orderkey")
  }

  // OR-of-probes through the CELL door (r11): a `value = v OR (value
  // BETWEEN ...)` disjunction on the one projected indexed column —
  // FilterList(MUST_PASS_ONE) in SQL — routes as ONE probeOr pass
  // (SqlCatalogSpec holds the route seam assert); the Or stays residual,
  // so exactness is structural. Oracle = the relational disjunction.
  private val sqlCellOrRoute = Q("sql_cell_or_route", Some("""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey = 7 OR (o_custkey >= 40 AND o_custkey < 44)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = sqlIndexRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_ixo",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_ixo.root", root)
    val qual = "X'" + Bytes.toBytes("o_custkey").map(b => f"$b%02x").mkString + "'"
    def h(v: Long) = "X'" + Bytes.toBytes(v).map(b => f"$b%02x").mkString + "'"
    val cells = s.sql(
      s"""SELECT row, family, qualifier, ts, kind, value, seq
          FROM graft_ixo.orders_ix
          WHERE family = 'o' AND qualifier = $qual
            AND (value = ${h(7L)}
                 OR (value >= ${h(40L)} AND value < ${h(44L)}))""")
    CellCodec.decode(cells,
      StructType(Seq(StructField("o_custkey", LongType))),
      key = Seq("o_orderkey" -> LongType))
      .orderBy("o_orderkey")
  }

  // MIXED row/value OR on the CELL door (r12): `row < k OR value = v` —
  // the reference's RowFilter-OR-SingleColumnValueFilter FilterList on
  // its native surface (hbase/filter/FilterList.java:47-49). The row
  // disjunct reads its exact byte range off the cell scan (binary row
  // order IS the value order), the value disjunct probes the custkey
  // index for rows outside that range; one resolution pass, residual Or
  // exact. SqlCatalogSpec asserts the mixedOrShape seam.
  private val sqlCellMixedOr = Q("sql_cell_mixed_or", Some("""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_orderkey < 200 OR o_custkey = 7
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = sqlIndexRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_ixm",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_ixm.root", root)
    val qual = "X'" + Bytes.toBytes("o_custkey").map(b => f"$b%02x").mkString + "'"
    def h(v: Long) = "X'" + Bytes.toBytes(v).map(b => f"$b%02x").mkString + "'"
    val cells = s.sql(
      s"""SELECT row, family, qualifier, ts, kind, value, seq
          FROM graft_ixm.orders_ix
          WHERE family = 'o' AND qualifier = $qual
            AND (row < ${h(200L)} OR value = ${h(7L)})""")
    CellCodec.decode(cells,
      StructType(Seq(StructField("o_custkey", LongType))),
      key = Seq("o_orderkey" -> LongType))
      .orderBy("o_orderkey")
  }

  // Runtime (join-driven) VALUE pruning on the CELL door (r13): a
  // fact-dim join keyed on an indexed qualifier VALUE — the reference's
  // native surface (the index_lookup shape, as a star join). The
  // runtime-filter rule attaches the dim's distinct encoded values to
  // the scan, which resolves them at execution into an index probe +
  // size-gated gather (O(index hits) instead of a fact scan); the
  // join's equality re-check above the bridge replaces the static
  // route's verify, and index completeness for puts keeps the candidate
  // superset exact. RuntimeFilterSpec asserts the ("value", "keys")
  // shape, the over-cap ArmRange degradation, and exactness through an
  // update + delete; this gate proves the pruned join hash-matches the
  // relational oracle.
  private val sqlCellRuntimeIndex = Q("sql_cell_runtime_index", Some("""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT DISTINCT o_custkey FROM orders
                        WHERE o_custkey < 50)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = sqlIndexRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_ixrt",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_ixrt.root", root)
    s.conf.set("spark.graft.runtimeFilter.maxBuildBytes",
      (256L << 20).toString)
    val qual = "X'" + Bytes.toBytes("o_custkey").map(b => f"$b%02x").mkString + "'"
    t(s, dir, "orders").filter(col("o_custkey") < 50L)
      .select(CellCodec.encodeValue(col("o_custkey"), LongType,
        ordered = false).as("cv"))
      .distinct()
      .createOrReplaceTempView("graft_cri_dim")
    val cells = s.sql(
      s"""SELECT f.row, f.family, f.qualifier, f.ts, f.kind, f.value, f.seq
          FROM graft_ixrt.orders_ix f JOIN graft_cri_dim d ON f.value = d.cv
          WHERE f.family = 'o' AND f.qualifier = $qual""")
    CellCodec.decode(cells,
      StructType(Seq(StructField("o_custkey", LongType))),
      key = Seq("o_orderkey" -> LongType))
      .orderBy("o_orderkey")
  }

  // COVERED transparent SQL routing — the strongest form of the Phoenix
  // route: the table declares immutableRows, the registered index covers
  // (so its content is exact: synchronous deletes, data-first commits),
  // and the SQL door reconstructs the answer's cells from the index
  // table ALONE — zero main-table touch, no gather (SqlCatalogSpec
  // asserts the plan seam). A range DELETE lands before the query and
  // must be visible through the route with no rebuild. Oracle = the
  // full-scan formulation.
  private val sqlCoveredRoots = scala.collection.mutable.Map.empty[String, String]
  private val sqlCoveredLookup = Q("sql_covered_lookup", Some("""
    SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey IN (7, 37, 73)
      AND NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = Queries.synchronized {
      sqlCoveredRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-sqlcov").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("orders_cv",
          Seq(FamilyDescriptor("o")), splitKeys = 8, immutableRows = true),
          nowMs = 1L)
        val cells = CellCodec.encode(t(s, dir, "orders"), "o", Seq("o_orderkey"))
        g.table("orders_cv").mutate(cells, nowMs = 1L)
        g.createIndex("orders_cv", "o", Bytes.toBytes("o_custkey"), nowMs = 2L,
          covered = Seq("o" -> Bytes.toBytes("o_totalprice")))
        g.table("orders_cv").mutate(
          Mutations.deleteFamilyCells(
            cells.filter(col("row") >= lit(Bytes.toBytes(1000L)) &&
              col("row") < lit(Bytes.toBytes(30000L))).select("row").distinct(),
            col("row"), "o", ts = 3L),
          nowMs = 3L)
        r
      })
    }
    s.conf.set("spark.sql.catalog.graft_cv",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_cv.root", root)
    val qual = "X'" + Bytes.toBytes("o_custkey").map(b => f"$b%02x").mkString + "'"
    val vals = Seq(7L, 37L, 73L)
      .map(k => "X'" + Bytes.toBytes(k).map(b => f"$b%02x").mkString + "'")
      .mkString(", ")
    val cellsOut = s.sql(
      s"""SELECT row, family, qualifier, ts, kind, value, seq
          FROM graft_cv.orders_cv
          WHERE family = 'o' AND qualifier = $qual AND value IN ($vals)""")
    CellCodec.decode(cellsOut,
      StructType(Seq(StructField("o_custkey", LongType))),
      key = Seq("o_orderkey" -> LongType))
      .orderBy("o_orderkey")
  }

  // The WIDE (relational) view through the SQL door (sql/GraftWideTable):
  // typed decode of the declared wideKey/wideSchema, key bounds pruning
  // the scan. Oracle = the plain relational projection — the cell
  // round-trip and the view must be invisible to semantics.
  private val wideRoots = scala.collection.mutable.Map.empty[String, String]
  private def wideRoot(s: SparkSession, dir: String): String =
    Queries.synchronized {
      wideRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-wide").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("orders_w",
          Seq(FamilyDescriptor("o")), splitKeys = 8, immutableRows = true,
          wideKey = Some("o_orderkey:long"),
          wideSchema = Some(
            "o:o_custkey:long;o:o_totalprice:double;o:o_orderstatus:string")),
          nowMs = 1L)
        val cells = CellCodec.encode(t(s, dir, "orders"), "o", Seq("o_orderkey"))
        g.table("orders_w").mutate(cells, nowMs = 1L)
        g.createIndex("orders_w", "o", Bytes.toBytes("o_custkey"), nowMs = 2L,
          covered = Seq("o" -> Bytes.toBytes("o_totalprice")))
        g.createIndex("orders_w", "o", Bytes.toBytes("o_orderstatus"),
          nowMs = 2L)
        g.createCompositeIndex("orders_w",
          Seq("o" -> Bytes.toBytes("o_custkey"),
            "o" -> Bytes.toBytes("o_orderstatus")), nowMs = 2L)
        // a range delete AFTER the covered build: reaches the wide view
        // through synchronous tombstone translation, no rebuild
        g.table("orders_w").mutate(
          Mutations.deleteFamilyCells(
            cells.filter(col("row") >= lit(Bytes.toBytes(1000L)) &&
              col("row") < lit(Bytes.toBytes(30000L))).select("row").distinct(),
            col("row"), "o", ts = 3L),
          nowMs = 3L)
        r
      })
    }
  private val sqlWideScan = Q("sql_wide_scan", Some("""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderkey >= 1 AND o_orderkey < 1000
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_w",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_w.root", root)
    s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
             FROM graft_w.`orders_w$wide`
             WHERE o_orderkey >= 1 AND o_orderkey < 1000
             ORDER BY o_orderkey""")
  }

  // The covered-PROJECTION query through the wide view — the exact query
  // covered columns exist for (Phoenix INCLUDE: predicate on the indexed
  // column, projection within indexed + covered + key), which the cell
  // schema cannot express as one scan. Routes index-only (WideViewSpec
  // asserts zero main-table touch); a post-build range DELETE is visible
  // through synchronously-translated index tombstones, no rebuild.
  // Oracle = the plain relational formulation.
  private val sqlCoveredProjection = Q("sql_covered_projection", Some("""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_custkey IN (7, 37, 73)
      AND NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wc",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wc.root", root)
    s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
             FROM graft_wc.`orders_w$wide`
             WHERE o_custkey IN (7, 37, 73)
             ORDER BY o_orderkey""")
  }

  // The multiGet shape through the WIDE view (HTable.get(List<Get>) as
  // SQL): `WHERE key IN (...)` becomes per-key row-prefix probes — the
  // scan reads only the probed ranges, pushed to parquet as a range
  // disjunction (GraftWideScanBuilder In-on-key-head case; ACCEPTED for
  // the fixed-width long head, so Spark plans no re-filter). The list
  // mixes live keys (7, 32, 517), keys masked by the fixture's range
  // DELETE (1024, 2466 — tombstones must still win inside a probe), and
  // a key that never existed. Oracle = the relational projection with
  // the delete range applied.
  private val sqlWideMultiGet = Q("sql_wide_multi_get", Some("""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderkey IN (7, 32, 517, 1024, 2466, 999999)
      AND NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wmg",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wmg.root", root)
    s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
             FROM graft_wmg.`orders_w$wide`
             WHERE o_orderkey IN (7, 32, 517, 1024, 2466, 999999)
             ORDER BY o_orderkey""")
  }

  // Wide-view INSERT (GraftWideTable SupportsWrite): relational rows in
  // through `INSERT INTO t$wide ... SELECT`, encoded to cells by the
  // declared key/schema and committed through the SAME append seam as
  // every write (salt, registered index dual-writes, manifest commit).
  // Oracle = the inserted subset read straight off the parquet table.
  private val sqlInsertRoots = scala.collection.mutable.Map.empty[String, String]
  private val sqlWideInsert = Q("sql_wide_insert", Some("""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
    WHERE o_orderkey < 3000
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = Queries.synchronized {
      sqlInsertRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-sqlwi").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("orders_wi",
          Seq(FamilyDescriptor("o")), splitKeys = 8, immutableRows = true,
          wideKey = Some("o_orderkey:long"),
          wideSchema = Some("o:o_custkey:long;o:o_totalprice:double;" +
            "o:o_orderstatus:string")), nowMs = 1L)
        s.conf.set("spark.sql.catalog.graft_wi",
          classOf[graft.sql.GraftSqlCatalog].getName)
        s.conf.set("spark.sql.catalog.graft_wi.root", r)
        t(s, dir, "orders").createOrReplaceTempView("graft_wi_src")
        s.sql("""INSERT INTO graft_wi.`orders_wi$wide`
                 SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
                 FROM graft_wi_src WHERE o_orderkey < 3000""")
        r
      })
    }
    s.conf.set("spark.sql.catalog.graft_wi",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wi.root", root)
    s.sql("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
             FROM graft_wi.`orders_wi$wide`
             ORDER BY o_orderkey""")
  }

  // Relational DML on the WIDE view (GraftWideRowLevelOperation —
  // SupportsDelta over the declared key): ONE scratch table, three SQL
  // statements in a pinned order (UPDATE at ms 10, DELETE at ms 20,
  // MERGE at ms 30 — the commit clock is pinned per statement so verdict
  // cells never tie on ts), each statement's effect verified by its own
  // gate against the plain relational rendering of the final state. A
  // pointer index on o_custkey makes every statement exercise index
  // maintenance through the same append seam.
  private val wideDmlRoots = scala.collection.mutable.Map.empty[String, String]
  private def wideDmlRoot(s: SparkSession, dir: String): String =
    Queries.synchronized {
      wideDmlRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-wdml").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("orders_wm",
          Seq(FamilyDescriptor("o")), splitKeys = 8, immutableRows = true,
          wideKey = Some("o_orderkey:long"),
          wideSchema = Some("o:o_custkey:long;o:o_totalprice:double;" +
            "o:o_orderstatus:string")), nowMs = 1L)
        g.table("orders_wm").mutate(CellCodec.encode(
          t(s, dir, "orders").where(col("o_orderkey") < 6000)
            .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"),
          "o", Seq("o_orderkey")), nowMs = 1L)
        g.createIndex("orders_wm", "o", Bytes.toBytes("o_custkey"), nowMs = 2L)
        s.conf.set("spark.sql.catalog.graft_wm",
          classOf[graft.sql.GraftSqlCatalog].getName)
        s.conf.set("spark.sql.catalog.graft_wm.root", r)
        def at(ms: Long)(sql: String): Unit = {
          s.conf.set("spark.graft.sql.nowMs", ms.toString)
          try s.sql(sql): Unit
          finally s.conf.unset("spark.graft.sql.nowMs")
        }
        at(10L)("""UPDATE graft_wm.`orders_wm$wide`
                   SET o_totalprice = o_totalprice + 1000
                   WHERE o_orderstatus = 'O' AND o_orderkey < 3000""")
        at(20L)("""DELETE FROM graft_wm.`orders_wm$wide`
                   WHERE o_orderstatus = 'F' AND o_orderkey < 3000""")
        t(s, dir, "orders").where(
            col("o_orderkey") >= 3000 && col("o_orderkey") < 9000)
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
          .createOrReplaceTempView("graft_wm_src")
        at(30L)("""MERGE INTO graft_wm.`orders_wm$wide` t
                   USING graft_wm_src s
                   ON t.o_orderkey = s.o_orderkey
                   WHEN MATCHED THEN UPDATE SET o_orderstatus = 'U'
                   WHEN NOT MATCHED THEN INSERT
                     (o_orderkey, o_custkey, o_totalprice, o_orderstatus)
                     VALUES (s.o_orderkey, s.o_custkey, s.o_totalprice,
                       s.o_orderstatus)""")
        r
      })
    }
  private def wideDml(s: SparkSession, dir: String, sql: String): DataFrame = {
    val root = wideDmlRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wm",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wm.root", root)
    s.sql(sql)
  }
  // SQL UPDATE through the wide view: 'O' rows under 3000 carry the new
  // price version; the matched-row scan and the write both went through
  // the one append seam. (The k<3000 slice also reflects the later
  // DELETE — the oracle is the final state.)
  private val sqlWideUpdate = Q("sql_wide_update", Some("""
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 1000
                ELSE o_totalprice END AS o_totalprice,
           o_orderstatus
    FROM orders
    WHERE o_orderkey < 3000 AND o_orderstatus <> 'F'
    ORDER BY o_orderkey""")) { (s, dir) =>
    wideDml(s, dir, """
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      FROM graft_wm.`orders_wm$wide`
      WHERE o_orderkey < 3000
      ORDER BY o_orderkey""")
  }
  // SQL DELETE through the wide view: 'F' rows under 3000 resolve to
  // nothing (DeleteFamily tombstones, nothing rewritten); the status
  // histogram proves the row SET, not just a projection, changed.
  private val sqlWideDelete = Q("sql_wide_delete", Some("""
    SELECT o_orderstatus, count(*) AS cnt FROM orders
    WHERE o_orderkey < 3000 AND o_orderstatus <> 'F'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus""")) { (s, dir) =>
    wideDml(s, dir, """
      SELECT o_orderstatus, count(*) AS cnt
      FROM graft_wm.`orders_wm$wide`
      WHERE o_orderkey < 3000
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")
  }
  // SQL MERGE through the wide view: matched rows (3000..6000) flipped
  // to 'U', unmatched source rows (6000..9000) inserted verbatim.
  private val sqlWideMerge = Q("sql_wide_merge", Some("""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CASE WHEN o_orderkey < 6000 THEN 'U' ELSE o_orderstatus END
             AS o_orderstatus
    FROM orders
    WHERE o_orderkey >= 3000 AND o_orderkey < 9000
    ORDER BY o_orderkey""")) { (s, dir) =>
    wideDml(s, dir, """
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      FROM graft_wm.`orders_wm$wide`
      WHERE o_orderkey >= 3000
      ORDER BY o_orderkey""")
  }

  // Aggregate pushdown on the WIDE view (GraftWideScanBuilder
  // SupportsPushDownAggregates): grouped COUNT/MIN/MAX runs inside the
  // inner plan as a codegen'd hash aggregate over the decoded frame, so
  // only |groups| rows cross the V1 bridge (WideViewSpec asserts the
  // no-outer-Aggregate plan). Oracle = the same aggregation over the
  // undeleted rows.
  private val sqlWideAgg = Q("sql_wide_agg", Some("""
    SELECT o_orderstatus, count(*) AS cnt,
           min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
    FROM orders
    WHERE NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wa",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wa.root", root)
    s.sql("""SELECT o_orderstatus, count(*) AS cnt,
                    min(o_totalprice) AS min_price,
                    max(o_totalprice) AS max_price
             FROM graft_wa.`orders_w$wide`
             GROUP BY o_orderstatus
             ORDER BY o_orderstatus""")
  }

  // SUM/AVG pushdown on the WIDE view: exact-integral sums translate
  // (float sums stay above the bridge — accumulation order), result
  // types mirror Spark's own Sum/Average resolution, and only |groups|
  // rows cross the V1 bridge. Oracle = the same aggregation over the
  // undeleted rows (integer-valued partial sums stay exactly
  // representable, so avg is bit-deterministic in both engines).
  private val sqlWideSum = Q("sql_wide_sum", Some("""
    SELECT o_orderstatus, CAST(sum(o_custkey) AS DOUBLE) AS sum_ck,
           avg(o_custkey) AS avg_ck
    FROM orders
    WHERE NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_ws",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_ws.root", root)
    // the outer CAST stays in the Project above the pushed aggregate
    // (exact for these magnitudes); DuckDB's int128 sum surfaces as
    // float64 through pandas, so both sides land on DOUBLE
    s.sql("""SELECT o_orderstatus, CAST(sum(o_custkey) AS DOUBLE) AS sum_ck,
                    avg(o_custkey) AS avg_ck
             FROM graft_ws.`orders_w$wide`
             GROUP BY o_orderstatus
             ORDER BY o_orderstatus""")
  }

  // Top-k pushdown on the WIDE view (SupportsPushDownTopN): ORDER BY +
  // LIMIT runs inside the inner plan as TakeOrderedAndProject
  // (per-partition top-k + merge of k-row heads — no full sort), so k
  // rows cross the V1 bridge instead of every decoded row. The second
  // sort key makes the order TOTAL (price ties broken by unique key), so
  // the row set is deterministic on both sides.
  private val sqlWideTopN = Q("sql_wide_topn", Some("""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wt",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wt.root", root)
    s.sql("""SELECT o_orderkey, o_totalprice
             FROM graft_wt.`orders_w$wide`
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""")
  }

  // Metadata DELETE on the wide view: a provably-exact key-range
  // predicate (comparisons on an ORDERED key head) takes the cell door's
  // tombstone path — O(matching keys) DeleteFamily cells, no
  // read-modify-write delta. WideViewSpec pins the path (tombstones
  // stamp max cell ts, not commit time); this gate pins the answer.
  private val sqlWideMetaDeleteRoots =
    scala.collection.mutable.Map.empty[String, String]
  private val sqlWideMetaDelete = Q("sql_wide_meta_delete", Some(s"""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE NOT (o_orderkey >= 2000 AND o_orderkey < 40000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val root = Queries.synchronized {
      sqlWideMetaDeleteRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-wmd").toString
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("o")),
          splitKeys = 8, wideKey = Some("o_orderkey:olong"),
          wideSchema = Some("o:o_orderstatus:string;o:o_totalprice:double")), 1L)
        g.table("t").mutate(CellCodec.encode(
          t(s, dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice"),
          "o", Seq("o_orderkey"), ordered = Set("o_orderkey")), nowMs = 1L)
        s.conf.set("spark.sql.catalog.graft_wmd",
          classOf[graft.sql.GraftSqlCatalog].getName)
        s.conf.set("spark.sql.catalog.graft_wmd.root", r)
        s.sql("""DELETE FROM graft_wmd.`t$wide`
                 WHERE o_orderkey >= 2000 AND o_orderkey < 40000""")
        r
      })
    }
    s.conf.set("spark.sql.catalog.graft_wmd",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wmd.root", root)
    s.sql("""SELECT o_orderkey, o_orderstatus, o_totalprice
             FROM graft_wmd.`t$wide` ORDER BY o_orderkey""")
  }

  // TIME TRAVEL on the wide view: `VERSION AS OF v` pins spec, data dirs
  // and decode to manifest v (index routing off — a live index reflects
  // the present). The table gets an initial load (v2) plus a
  // status-overwrite batch (v3); the pinned query must return the
  // PRE-update rows, which the oracle recomputes from the source.
  private val sqlWideTimeTravelRoots =
    scala.collection.mutable.Map.empty[String, String]
  private val sqlWideTimeTravel = Q("sql_wide_time_travel", Some("""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderkey < 5000 ORDER BY o_orderkey""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val root = Queries.synchronized {
      sqlWideTimeTravelRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-wtt").toString
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("o")),
          splitKeys = 8, wideKey = Some("o_orderkey:long"),
          wideSchema = Some("o:o_orderstatus:string;o:o_totalprice:double")), 1L)
        g.table("t").mutate(ordersCells(s, dir), nowMs = 1L) // v2
        g.table("t").mutate(CellCodec.encode(
          t(s, dir, "orders").filter(col("o_orderkey") < 1000)
            .select(col("o_orderkey"), lit("X").as("o_orderstatus")),
          "o", Seq("o_orderkey"), batchTs = 2L), nowMs = 2L) // v3
        r
      })
    }
    s.conf.set("spark.sql.catalog.graft_wtt",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wtt.root", root)
    s.sql("""SELECT o_orderkey, o_orderstatus, o_totalprice
             FROM graft_wtt.`t$wide` VERSION AS OF 2
             WHERE o_orderkey < 5000 ORDER BY o_orderkey""")
  }

  // COMPOSITE index through the wide view: conjunctive equality/IN over
  // (o_custkey, o_orderstatus) becomes ONE probe pass over the bounded
  // blob cartesian of the composite key (read/Index.scala
  // lookupCompositeAll; WideViewSpec asserts the route seam — including
  // that this exact IN shape picks the composite), every member
  // re-verified on the main table. ONE SQL statement — the query a real
  // user writes. Oracle = the plain two-predicate formulation.
  private val sqlIndexComposite = Q("sql_index_composite", Some("""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_custkey IN (7, 37, 73, 103, 133) AND o_orderstatus = 'O'
      AND NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wx",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wx.root", root)
    s.sql(s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
              FROM graft_wx.`orders_w$$wide`
              WHERE o_custkey IN (7, 37, 73, 103, 133)
                AND o_orderstatus = 'O'
              ORDER BY o_orderkey""")
  }

  // LEADING-member range through the composite index (the Phoenix
  // leading-column rule): a table with ONLY a composite index on
  // (o_custkey, o_orderstatus) serves `o_custkey ∈ [lo, hi)` via the
  // LOOSE blob range probe — big-endian long bounds embed 0x00 bytes,
  // exactly the case the loose probe's union-of-prefix-ranges covers —
  // with the interval kept residual for exactness. Oracle = full scan.
  private val sqlLeadingRoots = scala.collection.mutable.Map.empty[String, String]
  private val sqlIndexLeadingRange = Q("sql_index_leading_range", Some("""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey >= 40 AND o_custkey < 60
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = Queries.synchronized {
      sqlLeadingRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-sqllr").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("orders_lc",
          Seq(FamilyDescriptor("o")), splitKeys = 8, immutableRows = true),
          nowMs = 1L)
        g.table("orders_lc").mutate(
          CellCodec.encode(t(s, dir, "orders"), "o", Seq("o_orderkey")),
          nowMs = 1L)
        g.createCompositeIndex("orders_lc",
          Seq("o" -> Bytes.toBytes("o_custkey"),
            "o" -> Bytes.toBytes("o_orderstatus")), nowMs = 2L)
        r
      })
    }
    s.conf.set("spark.sql.catalog.graft_lr",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_lr.root", root)
    val qual = "X'" + Bytes.toBytes("o_custkey").map(b => f"$b%02x").mkString + "'"
    def h(v: Long) = "X'" + Bytes.toBytes(v).map(b => f"$b%02x").mkString + "'"
    val cells = s.sql(
      s"""SELECT row, family, qualifier, ts, kind, value, seq
          FROM graft_lr.orders_lc
          WHERE family = 'o' AND qualifier = $qual
            AND value >= ${h(40L)} AND value < ${h(60L)}""")
    CellCodec.decode(cells,
      StructType(Seq(StructField("o_custkey", LongType))),
      key = Seq("o_orderkey" -> LongType))
      .orderBy("o_orderkey")
  }

  // PREFIX-predicate routing (the reference's PrefixFilter /
  // BinaryPrefixComparator surface, hbase/filter/PrefixFilter.java:34):
  // `LIKE '1-%'` on an indexed string column records the value interval
  // [p, prefixSuccessor(p)) on the wide view and is served as ONE pruned
  // probe of the value-prefix index layout (WideViewSpec asserts the
  // route seam). Oracle = the plain LIKE over the parquet table.
  private val sqlPrefixRoots = scala.collection.mutable.Map.empty[String, String]
  private val sqlPrefixRoute = Q("sql_prefix_route", Some("""
    SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
    WHERE o_orderpriority LIKE '1-%'
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = Queries.synchronized {
      sqlPrefixRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-sqlpfx").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("orders_pf",
          Seq(FamilyDescriptor("o")), splitKeys = 8, immutableRows = true,
          wideKey = Some("o_orderkey:long"),
          wideSchema = Some(
            "o:o_orderpriority:string;o:o_totalprice:double")), nowMs = 1L)
        g.table("orders_pf").mutate(
          CellCodec.encode(t(s, dir, "orders"), "o", Seq("o_orderkey")),
          nowMs = 1L)
        g.createIndex("orders_pf", "o", Bytes.toBytes("o_orderpriority"),
          nowMs = 2L)
        r
      })
    }
    s.conf.set("spark.sql.catalog.graft_pf",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_pf.root", root)
    s.sql("""SELECT o_orderkey, o_orderpriority, o_totalprice
             FROM graft_pf.`orders_pf$wide`
             WHERE o_orderpriority LIKE '1-%'
             ORDER BY o_orderkey""")
  }

  // ORDER-PRESERVING double encoding (odouble — Bytes.toBytesOrdered,
  // the OrderedBytes/Phoenix sign-flip trick): a RANGE predicate on an
  // indexed DOUBLE column routes through the index as one pruned probe.
  // This closes the reference's documented Bytes.toBytes caveat (IEEE
  // sign bit inverts byte order — SURVEY §7.5 risk 1) instead of
  // inheriting it. Oracle = the plain interval over the parquet table.
  private val sqlDoubleRoots = scala.collection.mutable.Map.empty[String, String]
  private val sqlIndexDoubleRange = Q("sql_index_double_range", Some("""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 1000.5 AND o_totalprice < 5000.25
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = Queries.synchronized {
      sqlDoubleRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-sqlod").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("orders_od",
          Seq(FamilyDescriptor("o")), splitKeys = 8, immutableRows = true,
          wideKey = Some("o_orderkey:long"),
          wideSchema = Some("o:o_totalprice:odouble;o:o_custkey:long")),
          nowMs = 1L)
        g.table("orders_od").mutate(
          CellCodec.encode(
            t(s, dir, "orders").select("o_orderkey", "o_totalprice", "o_custkey"),
            "o", Seq("o_orderkey"), ordered = Set("o_totalprice")),
          nowMs = 1L)
        g.createIndex("orders_od", "o", Bytes.toBytes("o_totalprice"),
          nowMs = 2L)
        r
      })
    }
    s.conf.set("spark.sql.catalog.graft_od",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_od.root", root)
    s.sql("""SELECT o_orderkey, o_totalprice
             FROM graft_od.`orders_od$wide`
             WHERE o_totalprice > 1000.5 AND o_totalprice < 5000.25
             ORDER BY o_orderkey""")
  }

  // PLAIN signed semantics through the SQL door: a non-ordered long key
  // and a non-ordered indexed long column, both holding NEGATIVE values
  // (two's-complement big-endian byte-sorts negatives ABOVE positives).
  // `k < 100` must keep the negative keys (the stop prune wraps the
  // negative byte region — GraftWideScanBuilder.stopFromComparison), and
  // `bal <= 50` must NOT route through bal's index (a byte-interval hit
  // set would miss negative values; the route declines and the plain
  // scan + residual answers). Oracle = the same intervals over parquet.
  private val sqlSignedRoots = scala.collection.mutable.Map.empty[String, String]
  private val sqlSignedRange = Q("sql_signed_range", Some("""
    SELECT o_orderkey - 3000 AS k, o_custkey - 75 AS bal FROM orders
    WHERE o_orderkey - 3000 < 100 AND o_custkey - 75 <= 50
    ORDER BY k""")) { (s, dir) =>
    val root = Queries.synchronized {
      sqlSignedRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-sqlsg").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("orders_sg",
          Seq(FamilyDescriptor("o")), splitKeys = 8, immutableRows = true,
          wideKey = Some("k:long"),
          wideSchema = Some("o:bal:long")), nowMs = 1L)
        g.table("orders_sg").mutate(
          CellCodec.encode(
            t(s, dir, "orders").select(
              (col("o_orderkey") - 3000).as("k"),
              (col("o_custkey") - 75).as("bal")),
            "o", Seq("k")),
          nowMs = 1L)
        g.createIndex("orders_sg", "o", Bytes.toBytes("bal"), nowMs = 2L)
        r
      })
    }
    s.conf.set("spark.sql.catalog.graft_sg",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sg.root", root)
    s.sql("""SELECT k, bal FROM graft_sg.`orders_sg$wide`
             WHERE k < 100 AND bal <= 50
             ORDER BY k""")
  }

  // Index GC end-to-end: tombstone a key range, majorCompact (which
  // rebuilds registered indexes to currently-visible entries — the
  // monotonic-growth fix; IndexSpec asserts the physical shrink), then
  // answer through the rebuilt index. Oracle = the predicate minus the
  // deleted range.
  private val indexGcRoots = scala.collection.mutable.Map.empty[String, String]
  private val indexGcLookup = Q("index_gc_lookup", Some(s"""
    SELECT $ordersCols FROM orders WHERE o_custkey IN (7, 37, 73)
      AND NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = Queries.synchronized {
      indexGcRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-ixgc").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("orders_gc",
          Seq(FamilyDescriptor("o")), splitKeys = 8), nowMs = 1L)
        val cells = CellCodec.encode(t(s, dir, "orders"), "o", Seq("o_orderkey"))
        g.table("orders_gc").mutate(cells, nowMs = 1L)
        g.createIndex("orders_gc", "o", Bytes.toBytes("o_custkey"), nowMs = 2L)
        val doomed = cells
          .filter(col("row") >= lit(Bytes.toBytes(1000L)) &&
            col("row") < lit(Bytes.toBytes(30000L)))
          .select("row").distinct()
        g.table("orders_gc").mutate(
          Mutations.deleteFamilyCells(doomed, col("row"), "o", ts = 3L),
          nowMs = 3L)
        g.table("orders_gc").majorCompact(nowMs = 4L)
        r
      })
    }
    val g = graft.Graft(s, root)
    val hit = g.table("orders_gc").indexLookup("o", Bytes.toBytes("o_custkey"),
      Seq(7L, 37L, 73L).map(Bytes.toBytes))
    CellCodec.decode(hit, ordersSchema).orderBy("o_orderkey")
  }

  // COVERED index columns (Phoenix INCLUDE, read/Index.scala
  // lookupCovered): the index on o_custkey additionally stores
  // o_totalprice and o_orderdate, so this projection is answered from
  // the index table ALONE — zero main-table touch (CoveredIndexSpec
  // asserts the plan reads no main-table files). The table declares
  // immutableRows; batches split around CREATE INDEX so entries come
  // through both the initial covered build and append-time covered
  // maintenance; a key-range DELETE lands as synchronously-translated
  // index tombstones and the lookup runs WITHOUT any rebuild — deletes
  // must reach covered reads at write time. Oracle = plain predicate
  // minus the deleted range.
  private val coveredIndexRoots = scala.collection.mutable.Map.empty[String, String]
  private val coveredIndexLookup = Q("index_covered_lookup", Some("""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
    WHERE o_custkey IN (7, 37, 73)
      AND NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = Queries.synchronized {
      coveredIndexRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-ixcov").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("orders_cov",
          Seq(FamilyDescriptor("o")), splitKeys = 8, immutableRows = true),
          nowMs = 1L)
        val cells = CellCodec.encode(t(s, dir, "orders"), "o", Seq("o_orderkey"))
        val second = pmod(xxhash64(col("row")), lit(3)) === 0
        g.table("orders_cov").mutate(cells.filter(!second), nowMs = 1L)
        g.createIndex("orders_cov", "o", Bytes.toBytes("o_custkey"), nowMs = 2L,
          covered = Seq("o" -> Bytes.toBytes("o_totalprice"),
            "o" -> Bytes.toBytes("o_orderdate")))
        g.table("orders_cov").mutate(cells.filter(second), nowMs = 2L)
        val doomed = cells
          .filter(col("row") >= lit(Bytes.toBytes(1000L)) &&
            col("row") < lit(Bytes.toBytes(30000L)))
          .select("row").distinct()
        g.table("orders_cov").mutate(
          Mutations.deleteFamilyCells(doomed, col("row"), "o", ts = 3L),
          nowMs = 3L)
        r
      })
    }
    val g = graft.Graft(s, root)
    val hit = g.table("orders_cov").indexLookupCovered("o",
      Bytes.toBytes("o_custkey"), Seq(7L, 37L, 73L).map(Bytes.toBytes))
    CellCodec.decode(hit, StructType(Seq(
        StructField("o_custkey", LongType),
        StructField("o_totalprice", DoubleType),
        StructField("o_orderdate", TimestampNTZType))),
      key = Seq("o_orderkey" -> LongType))
      .orderBy("o_orderkey")
  }

  // STREAMING covered-index maintenance: the peer table carries a
  // REGISTERED covered index, and the CDC replication sink goes through
  // Catalog.append — so covered entries AND synchronous delete
  // tombstones are maintained per micro-batch with zero extra wiring
  // (the registered-property composition). Source history: two put
  // batches + a range-delete batch; the feed may fold them into one
  // micro-batch, exercising the same-batch put+delete translation. The
  // covered lookup runs on the PEER with no rebuild; oracle = the final
  // relational state.
  private val streamCoveredMaintain = Q("stream_covered_maintain", Some("""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
    WHERE o_custkey IN (7, 37, 73)
      AND NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val work = java.nio.file.Files.createTempDirectory("graft-q-scov").toString
    val src = graft.Graft(s, s"$work/src")
    src.createTable(TableDescriptor("t", Seq(FamilyDescriptor("o")),
      splitKeys = 8), 1L)
    val cells = CellCodec.encode(t(s, dir, "orders"), "o", Seq("o_orderkey"))
    val second = pmod(xxhash64(col("row")), lit(3)) === 0
    src.table("t").mutate(cells.filter(!second), nowMs = 1L)
    src.table("t").mutate(cells.filter(second), nowMs = 2L)
    src.table("t").mutate(
      Mutations.deleteFamilyCells(
        cells.filter(col("row") >= lit(Bytes.toBytes(1000L)) &&
          col("row") < lit(Bytes.toBytes(30000L))).select("row").distinct(),
        col("row"), "o", ts = 3L),
      nowMs = 3L)
    val peer = graft.Graft(s, s"$work/peer")
    peer.createTable(TableDescriptor("t", Seq(FamilyDescriptor("o")),
      splitKeys = 8, immutableRows = true), 1L)
    peer.createIndex("t", "o", Bytes.toBytes("o_custkey"), nowMs = 1L,
      covered = Seq("o" -> Bytes.toBytes("o_totalprice"),
        "o" -> Bytes.toBytes("o_orderdate")))
    graft.streaming.Replication.replicate(
      graft.streaming.Replication.tableChangeFeed(s, s"$work/src", "t"),
      peer.catalog, "t", s"$work/ckpt", nowMsOf = _ + 10L).awaitTermination()
    val hit = peer.table("t").indexLookupCovered("o",
      Bytes.toBytes("o_custkey"), Seq(7L, 37L, 73L).map(Bytes.toBytes))
    CellCodec.decode(hit, StructType(Seq(
        StructField("o_custkey", LongType),
        StructField("o_totalprice", DoubleType),
        StructField("o_orderdate", TimestampNTZType))),
      key = Seq("o_orderkey" -> LongType))
      .orderBy("o_orderkey")
  }

  private val getPoint = Q("get_point", Some(s"""
    SELECT $ordersCols FROM orders WHERE o_orderkey = 100""")) { (s, dir) =>
    val g = Get(CellCodec.rowKeyOf(100L))
    CellCodec.decode(ScanExec.get(ordersCells(s, dir), g), ordersSchema)
  }

  private val getRowOrBefore = Q("get_row_or_before", Some(s"""
    SELECT $ordersCols FROM orders WHERE o_orderkey <= 999999999
    ORDER BY o_orderkey DESC LIMIT 1""")) { (s, dir) =>
    val res = ScanExec.getRowOrBefore(
      ordersCells(s, dir), CellCodec.rowKeyOf(999999999L), "o")
    CellCodec.decode(res, ordersSchema)
  }

  private def customerCells(s: SparkSession, dir: String): DataFrame =
    storedCells(s, dir, "customer", "customer_key")(
      CellCodec.encode(t(s, dir, "customer"), "c", Seq("c_custkey")))

  private val rowCounter = Q("row_counter", Some(
    "SELECT count(*) AS count_rows FROM customer"), bench = true) { (s, dir) =>
    ScanExec(customerCells(s, dir), Scan().setFilter(FirstKeyOnlyFilter()))
      .agg(count(lit(1)).as("count_rows"))
  }

  // ----------------------------------------------------------------------
  // Filter surface (SURVEY §2.3) — each filter exercised end-to-end
  // against a SQL oracle. Unit tests (FiltersSpec) cover the finer
  // per-cell semantics; these prove the compiled plans on real data.
  // ----------------------------------------------------------------------

  private val prefixFilter = Q("prefix_filter", Some("""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_name LIKE 'Customer#00000004%'
    ORDER BY c_custkey""")) { (s, dir) =>
    val scan = Scan().setFilter(PrefixFilter(Bytes.toBytes("Customer#00000004")))
    CellCodec.decode(ScanExec(customerByNameCells(s, dir), scan), customerSchema)
      .orderBy("c_custkey")
  }

  private val columnPrefixFilter = Q("column_prefix_filter", Some("""
    SELECT o_orderkey, o_orderdate, o_orderpriority, o_orderstatus
    FROM orders ORDER BY o_orderkey""")) { (s, dir) =>
    val scan = Scan().setFilter(ColumnPrefixFilter(Bytes.toBytes("o_order")))
    CellCodec.decode(ScanExec(ordersCells(s, dir), scan),
      sub(ordersSchema, "o_orderkey", "o_orderdate", "o_orderpriority", "o_orderstatus"))
      .orderBy("o_orderkey")
  }

  private val valueFilterSubstr = Q("value_filter_substring", Some("""
    SELECT doc_id, text FROM documents WHERE contains(lower(text), 'merge')
    ORDER BY doc_id""")) { (s, dir) =>
    val cells = storedCells(s, dir, "documents", "documents_d")(
      CellCodec.encode(t(s, dir, "documents"), "d", Seq("doc_id")))
    val scan = Scan().addColumn("d", Bytes.toBytes("text"))
      .setFilter(ValueFilter(CompareOp.EQUAL, SubstringComparator("merge")))
    CellCodec.decode(ScanExec(cells, scan),
      StructType(Seq(StructField("text", StringType))),
      key = Seq("doc_id" -> LongType))
      .orderBy("doc_id")
  }

  private val valueFilterRegex = Q("value_filter_regex", Some("""
    SELECT event_id, event_type FROM events
    WHERE regexp_matches(event_type, '^(click|view)$')
    ORDER BY event_id""")) { (s, dir) =>
    val cells = eventsIdCells(s, dir)
    val scan = Scan().addColumn("e", Bytes.toBytes("event_type"))
      .setFilter(ValueFilter(CompareOp.EQUAL, RegexStringComparator("^(click|view)$")))
    CellCodec.decode(ScanExec(cells, scan),
      StructType(Seq(StructField("event_type", StringType))),
      key = Seq("event_id" -> LongType))
      .orderBy("event_id")
  }

  private val inclusiveStop = Q("inclusive_stop_scan", Some(s"""
    SELECT $ordersCols FROM orders
    WHERE o_orderkey >= 1000 AND o_orderkey <= 1200
    ORDER BY o_orderkey""")) { (s, dir) =>
    val scan = Scan().setStartRow(Bytes.toBytes(1000L))
      .setFilter(InclusiveStopFilter(Bytes.toBytes(1200L)))
    CellCodec.decode(ScanExec(ordersCells(s, dir), scan), ordersSchema)
      .orderBy("o_orderkey")
  }

  private val pageFilter = Q("page_filter_scan", Some(s"""
    SELECT $ordersCols FROM orders ORDER BY o_orderkey LIMIT 50"""),
    bench = true) { (s, dir) =>
    val scan = Scan().setFilter(PageFilter(50))
    CellCodec.decode(ScanExec(ordersCells(s, dir), scan), ordersSchema)
      .orderBy("o_orderkey")
  }

  // `HTable.get(List<Get>)` — batch point reads as one broadcast
  // semi-join job (absent key contributes nothing, like the reference's
  // empty Result).
  private val multiGet = Q("multi_get", Some(s"""
    SELECT $ordersCols FROM orders
    WHERE o_orderkey IN (100, 200, 300, 999999999)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val keys = Seq(100L, 200L, 300L, 999999999L).map(k => CellCodec.rowKeyOf(k))
    CellCodec.decode(
      ScanExec.multiGet(ordersCells(s, dir), keys), ordersSchema)
      .orderBy("o_orderkey")
  }

  // Family TTL visibility at scan time (`ScanQueryMatcher.java:56,76`):
  // with synthetic stamps ts = key%5+1, a 3ms TTL at now=6 keeps ts>=3.
  private val ttlScan = Q("ttl_scan", Some(s"""
    SELECT $ordersCols FROM orders WHERE o_orderkey % 5 + 1 >= 3
    ORDER BY o_orderkey""")) { (s, dir) =>
    val cells = storedCells(s, dir, "orders", "orders_ts")(
      CellCodec.encode(t(s, dir, "orders"), "o", Seq("o_orderkey"),
        tsCol = Some(col("o_orderkey") % 5 + 1)))
    CellCodec.decode(
      ScanExec(cells, Scan(), ttlMs = Some(3L), now = 6L), ordersSchema)
      .orderBy("o_orderkey")
  }

  // `HTable.exists:651` — the reference's behavioral tests probe both a
  // present and an absent key (`TestFromClientSide` exists-cases); the
  // per-key booleans land in a 2-row frame the DuckDB EXISTS subquery
  // recomputes.
  private val existsGet = Q("exists_get", Some("""
    SELECT CAST(k AS BIGINT) AS o_orderkey,
      EXISTS(SELECT 1 FROM orders WHERE o_orderkey = k) AS exists_flag
    FROM (VALUES (100), (999999999)) t(k) ORDER BY o_orderkey""")) { (s, dir) =>
    import s.implicits._
    val table = ordersCells(s, dir)
    Seq(100L, 999999999L)
      .map(k => (k, ScanExec.exists(table, Get(CellCodec.rowKeyOf(k)))))
      .toDF("o_orderkey", "exists_flag").orderBy("o_orderkey")
  }

  // `DependentColumnFilter` (TestDependentColumnFilter parity): a second
  // version of o_orderstatus lands at ts=2, but the dependent column
  // (o_orderdate) only has stamps at ts=1 — the filter drops every cell
  // whose ts has no matching dependent stamp, so the decoded view is the
  // unmodified base table.
  private val dependentColumn = Q("dependent_column_scan", Some(s"""
    SELECT $ordersCols FROM orders ORDER BY o_orderkey""")) { (s, dir) =>
    val orders = t(s, dir, "orders")
    val extra = Mutations.putCells(
      orders.filter(col("o_orderkey") % 2 === 0),
      CellCodec.rowKey(orders.filter(col("o_orderkey") % 2 === 0), Seq("o_orderkey")),
      "o", "o_orderstatus", lit("X"), ts = 2L)
    val table = Mutations.merge(ordersCells(s, dir), extra)
    val scan = Scan().setMaxVersions(2)
      .setFilter(DependentColumnFilter("o", Bytes.toBytes("o_orderdate")))
    CellCodec.decode(ScanExec(table, scan), ordersSchema).orderBy("o_orderkey")
  }

  // Export -> Import round-trip (`Export.java:41`/`Import.java:39`,
  // `TestSnapshotExport.java:105`-style file round-trip): the dump is real
  // parquet on disk, re-read and decoded.
  private val exportImportRoots = scala.collection.mutable.Map.empty[String, String]
  private val exportImport = Q("export_import_scan", Some(s"""
    SELECT $ordersCols FROM orders ORDER BY o_orderkey""")) { (s, dir) =>
    val dump = Queries.synchronized {
      exportImportRoots.getOrElseUpdate(dir, {
        val d = java.nio.file.Files.createTempDirectory("graft-q-export").toString
        graft.jobs.Jobs.exportTable(ordersCells(s, dir), s"$d/dump")
        s"$d/dump"
      })
    }
    CellCodec.decode(
      ScanExec(graft.jobs.Jobs.importTable(s, dump), Scan()), ordersSchema)
      .orderBy("o_orderkey")
  }

  private val columnPagination = Q("column_pagination", Some("""
    SELECT o_orderkey, o_orderdate FROM orders ORDER BY o_orderkey""")) { (s, dir) =>
    // Qualifiers in (family, qualifier) order: o_custkey, o_orderdate,
    // o_orderkey, ... — offset 1, limit 2 slices exactly the middle two.
    val scan = Scan().setFilter(ColumnPaginationFilter(limit = 2, offset = 1))
    CellCodec.decode(ScanExec(ordersCells(s, dir), scan),
      sub(ordersSchema, "o_orderkey", "o_orderdate"))
      .orderBy("o_orderkey")
  }

  private def customerByNameCells(s: SparkSession, dir: String): DataFrame =
    storedCells(s, dir, "customer", "customer_name")(
      CellCodec.encode(t(s, dir, "customer"), "c", Seq("c_name")))

  private def eventsIdCells(s: SparkSession, dir: String): DataFrame =
    storedCells(s, dir, "events", "events_id")(
      CellCodec.encode(eventsNs(s, dir), "e", Seq("event_id")))

  private val rowFilterRegex = Q("row_filter_regex", Some(s"""
    SELECT $customerCols FROM customer
    WHERE regexp_matches(c_name, '^Customer#0000001[0-9]$$')
    ORDER BY c_custkey""")) { (s, dir) =>
    val scan = Scan().setFilter(RowFilter(CompareOp.EQUAL,
      RegexStringComparator("^Customer#0000001[0-9]$")))
    CellCodec.decode(ScanExec(customerByNameCells(s, dir), scan), customerSchema)
      .orderBy("c_custkey")
  }

  private val qualifierFilter = Q("qualifier_filter", Some("""
    SELECT o_orderkey, o_orderpriority, o_orderstatus, o_totalprice
    FROM orders ORDER BY o_orderkey""")) { (s, dir) =>
    // binary >= on qualifier names: keeps o_orderkey..o_totalprice
    val scan = Scan().setFilter(QualifierFilter(CompareOp.GREATER_OR_EQUAL,
      BinaryComparator(Bytes.toBytes("o_orderkey"))))
    CellCodec.decode(ScanExec(ordersCells(s, dir), scan),
      sub(ordersSchema, "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"))
      .orderBy("o_orderkey")
  }

  private val timestampsFilter = Q("timestamps_filter", Some(s"""
    SELECT $ordersCols FROM orders WHERE o_orderkey % 5 + 1 IN (1, 3)
    ORDER BY o_orderkey""")) { (s, dir) =>
    // synthetic per-row version stamps: ts = key % 5 + 1
    val cells = storedCells(s, dir, "orders", "orders_ts")(
      CellCodec.encode(t(s, dir, "orders"), "o", Seq("o_orderkey"),
        tsCol = Some(col("o_orderkey") % 5 + 1)))
    val scan = Scan().setFilter(TimestampsFilter(Seq(1L, 3L)))
    CellCodec.decode(ScanExec(cells, scan), ordersSchema)
      .orderBy("o_orderkey")
  }

  private val columnCountGet = Q("column_count_get", Some("""
    SELECT o_orderkey, o_custkey, o_orderdate FROM orders
    ORDER BY o_orderkey""")) { (s, dir) =>
    // first 3 qualifiers in (family, qualifier) order: custkey, orderdate, orderkey
    val scan = Scan().setFilter(ColumnCountGetFilter(3))
    CellCodec.decode(ScanExec(ordersCells(s, dir), scan),
      sub(ordersSchema, "o_orderkey", "o_custkey", "o_orderdate"))
      .orderBy("o_orderkey")
  }

  private val skipFilterQ = Q("skip_filter", Some(s"""
    SELECT $ordersCols FROM orders WHERE o_orderstatus <> 'F'
    ORDER BY o_orderkey""")) { (s, dir) =>
    // SkipFilter: one failing cell (status == 'F') vetoes the whole row
    val scan = Scan().setFilter(SkipFilter(
      ValueFilter(CompareOp.NOT_EQUAL, BinaryComparator(Bytes.toBytes("F")))))
    CellCodec.decode(ScanExec(ordersCells(s, dir), scan), ordersSchema)
      .orderBy("o_orderkey")
  }

  private val whileMatch = Q("while_match_scan", Some(s"""
    SELECT $ordersCols FROM orders WHERE o_orderkey < 1000
    ORDER BY o_orderkey""")) { (s, dir) =>
    val scan = Scan().setFilter(WhileMatchFilter(
      RowFilter(CompareOp.LESS, BinaryComparator(Bytes.toBytes(1000L)))))
    CellCodec.decode(ScanExec(ordersCells(s, dir), scan), ordersSchema)
      .orderBy("o_orderkey")
  }

  private val filterListOr = Q("filter_list_or", Some(s"""
    SELECT $customerCols FROM customer
    WHERE c_name LIKE 'Customer#0000001%' OR c_name LIKE 'Customer#0000002%'
    ORDER BY c_custkey""")) { (s, dir) =>
    val scan = Scan().setFilter(FilterList.or(
      PrefixFilter(Bytes.toBytes("Customer#0000001")),
      PrefixFilter(Bytes.toBytes("Customer#0000002"))))
    CellCodec.decode(ScanExec(customerByNameCells(s, dir), scan), customerSchema)
      .orderBy("c_custkey")
  }

  private val scvExclude = Q("single_column_value_exclude", Some("""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey""")) { (s, dir) =>
    val scan = Scan().setFilter(SingleColumnValueExcludeFilter(
      "o", Bytes.toBytes("o_orderstatus"),
      CompareOp.EQUAL, BinaryComparator(Bytes.toBytes("F"))))
    CellCodec.decode(ScanExec(ordersCells(s, dir), scan),
      sub(ordersSchema, "o_orderkey", "o_custkey", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
      .orderBy("o_orderkey")
  }

  private val binaryPrefixScan = Q("binary_prefix_value", Some("""
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority LIKE '1-%' ORDER BY o_orderkey""")) { (s, dir) =>
    val scan = Scan().addColumn("o", Bytes.toBytes("o_orderpriority"))
      .setFilter(ValueFilter(CompareOp.EQUAL,
        BinaryPrefixComparator(Bytes.toBytes("1-"))))
    CellCodec.decode(ScanExec(ordersCells(s, dir), scan),
      sub(ordersSchema, "o_orderpriority"),
      key = Seq("o_orderkey" -> LongType))
      .orderBy("o_orderkey")
  }

  private val groupingMapperAgg = Q("grouping_mapper_agg", Some("""
    SELECT c_mktsegment AS group_key, count(*) AS cnt FROM customer
    GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
    val resolved = ScanExec(customerCells(s, dir), Scan())
    graft.jobs.Jobs.groupingKey(resolved, "c", Seq(Bytes.toBytes("c_mktsegment")))
      .groupBy(col("groupKey").cast(StringType).as("group_key"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("group_key")
  }

  // ----------------------------------------------------------------------
  // Version semantics (SURVEY §7.2): event-time versions over the events
  // table; the oracle is the equivalent windowed SQL.
  // ----------------------------------------------------------------------

  private def eventsCells(s: SparkSession, dir: String): DataFrame =
    storedCells(s, dir, "events", "events_user")(
      CellCodec.encode(eventsNs(s, dir), "e", Seq("user_id"),
        tsCol = Some(col("ts")), seqCol = Some(col("event_id"))))

  private val eventsValSchema = StructType(Seq(
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private val versionsLatest = Q("versions_latest", Some("""
    SELECT user_id, event_type, value FROM (
      SELECT user_id, event_type, value,
        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1 ORDER BY user_id"""), bench = true) { (s, dir) =>
    val scan = Scan().addFamily("e") // maxVersions = 1: newest event per user
    CellCodec.decode(ScanExec(eventsCells(s, dir), scan), eventsValSchema,
      key = Seq("user_id" -> LongType))
      .orderBy("user_id")
  }

  private val timeRangeScan = Q("time_range_scan", Some("""
    SELECT user_id, event_type, value FROM (
      SELECT user_id, event_type, value,
        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20')
    WHERE rn = 1 ORDER BY user_id""")) { (s, dir) =>
    val scan = Scan().addFamily("e")
      .setTimeRange(nanosOf("2024-01-10"), nanosOf("2024-01-20"))
    CellCodec.decode(ScanExec(eventsCells(s, dir), scan), eventsValSchema,
      key = Seq("user_id" -> LongType))
      .orderBy("user_id")
  }

  // ----------------------------------------------------------------------
  // Write surface (SURVEY §2.2): mutations are batch merges; visibility is
  // read-time. Oracles express the post-merge state in plain SQL.
  // ----------------------------------------------------------------------

  private val deleteFamilyScan = Q("delete_family_scan", Some(s"""
    SELECT $customerCols FROM customer WHERE c_acctbal >= 0
    ORDER BY c_custkey""")) { (s, dir) =>
    val cust = t(s, dir, "customer")
    val table = customerCells(s, dir) // batchTs=1
    val victims = cust.filter(col("c_acctbal") < 0)
    val tombs = Mutations.deleteFamilyCells(
      victims, CellCodec.rowKey(victims, Seq("c_custkey")), "c", ts = 2L)
    CellCodec.decode(ScanExec(Mutations.merge(table, tombs), Scan()),
      customerSchema).orderBy("c_custkey")
  }

  // Major compaction must not change what a scan sees (reference
  // `Store.java:778` — tombstone/version GC preserves visible state).
  private val compactionScan = Q("compaction_scan", Some(s"""
    SELECT $customerCols FROM customer WHERE c_acctbal >= 0
    ORDER BY c_custkey""")) { (s, dir) =>
    val cust = t(s, dir, "customer")
    val table = customerCells(s, dir)
    val victims = cust.filter(col("c_acctbal") < 0)
    val tombs = Mutations.deleteFamilyCells(
      victims, CellCodec.rowKey(victims, Seq("c_custkey")), "c", ts = 2L)
    val compacted = Compact.major(Mutations.merge(table, tombs))
    CellCodec.decode(ScanExec(compacted, Scan()), customerSchema)
      .orderBy("c_custkey")
  }

  // SELECTIVE minor compaction end-to-end (write/Mutations.scala
  // Compact.selectMinor <- Store.java:739-745): one big append + four
  // small deltas (one of them tombstones) on a catalog table; the
  // size-ratio rule folds ONLY the small tail (CompactionPolicySpec
  // asserts the big batch's leaves survive untouched), tombstones are
  // KEPT through the fold (minor semantics) and still mask at read
  // time. Oracle = the final visible state.
  private val minorCompactionScan = Q("minor_compaction_scan", Some(s"""
    SELECT $customerCols FROM customer WHERE c_acctbal >= 0
    ORDER BY c_custkey""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val work = java.nio.file.Files.createTempDirectory("graft-q-minor").toString
    val g = graft.Graft(s, work)
    g.createTable(TableDescriptor("c",
      Seq(FamilyDescriptor("c", maxVersions = 1)), splitKeys = 8), 1L)
    val cust = t(s, dir, "customer")
    val cells = CellCodec.encode(cust, "c", Seq("c_custkey"))
    val small = pmod(xxhash64(col("row")), lit(3)) === 0
    g.table("c").mutate(cells.filter(!small), nowMs = 1L)
    for (k <- 0 until 3)
      g.table("c").mutate(cells.filter(small &&
        pmod(xxhash64(col("row"), lit(7)), lit(3)) === k), nowMs = 2L + k)
    val victims = cust.filter(col("c_acctbal") < 0)
    g.table("c").mutate(Mutations.deleteFamilyCells(
      victims, CellCodec.rowKey(victims, Seq("c_custkey")), "c", ts = 9L),
      nowMs = 9L)
    g.table("c").minorCompact(10L)
    CellCodec.decode(g.table("c").scan(Scan()), customerSchema)
      .orderBy("c_custkey")
  }

  private val incrementCounters = Q("increment_counters", Some("""
    SELECT user_id, 100 + count(*) AS clicks FROM events
    GROUP BY user_id ORDER BY user_id""")) { (s, dir) =>
    val ev = eventsNs(s, dir)
    val seed = Mutations.putCells(ev.select("user_id").distinct(),
      CellCodec.longBytes(col("user_id")), "c", "clicks",
      lit(Bytes.toBytes(100L)), ts = 1L)
    val incs = ev.select(
      CellCodec.longBytes(col("user_id")).as("row"),
      lit("c").as("family"), lit(Bytes.toBytes("clicks")).as("qualifier"),
      lit(1L).as("delta"))
    val merged = Mutations.merge(seed,
      Mutations.increment(seed, incs, batchTs = 2L))
    CellCodec.decode(ScanExec(merged, Scan()),
      StructType(Seq(StructField("clicks", LongType))),
      key = Seq("user_id" -> LongType))
      .orderBy("user_id")
  }

  private val checkAndPut = Q("check_and_put", Some(s"""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
      CASE WHEN o_orderstatus = 'F' THEN 'APPLIED' ELSE o_orderpriority END
        AS o_orderpriority
    FROM orders ORDER BY o_orderkey""")) { (s, dir) =>
    val orders = t(s, dir, "orders")
    val table = ordersCells(s, dir) // batchTs=1
    val rk = CellCodec.rowKey(orders, Seq("o_orderkey"))
    val checks = orders.select(
      rk.as("row"), lit("o").as("family"),
      lit(Bytes.toBytes("o_orderstatus")).as("qualifier"),
      lit(Bytes.toBytes("F")).as("expected"))
    val batch = Mutations.putCells(orders, rk, "o", "o_orderpriority",
      lit("APPLIED"), ts = 2L)
    val accepted = Mutations.checkAndMutate(table, checks, batch)
    CellCodec.decode(ScanExec(Mutations.merge(table, accepted), Scan()),
      ordersSchema).orderBy("o_orderkey")
  }

  // ----------------------------------------------------------------------
  // Snapshot / time travel (SURVEY §2.6). snapshot_scan drives the full
  // catalog lifecycle (create/append/snapshot/mutate/read-snapshot) and
  // must still see the pre-mutation state; asof_scan is the read-path
  // time travel on event-time cells.
  // ----------------------------------------------------------------------

  // The SQL door end-to-end: a catalog table (NOT a temp view) read with
  // spark.sql, WHERE bounds on the binary row key pushed through the DSv2
  // ScanBuilder onto the engine Scan (and from there to parquet row-group
  // pruning — SqlCatalogSpec asserts the plan).
  private val sqlCatalogRoots = scala.collection.mutable.Map.empty[String, String]
  /** Registers catalog `graft` over a root holding `cust_sql` (the
    * customer table as stored cells), building both at most once per sf
    * dir. Shared by sql_catalog_scan and sql_agg_pushdown. */
  private def custSqlCatalog(s: SparkSession, dir: String): Unit = {
    val root = Queries.synchronized {
      sqlCatalogRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-sql").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("cust_sql",
          Seq(graft.catalog.FamilyDescriptor("c")), splitKeys = 8), nowMs = 1L)
        g.table("cust_sql").mutate(customerCells(s, dir), nowMs = 1L)
        r
      })
    }
    s.conf.set("spark.sql.catalog.graft",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.root", root)
  }
  private val sqlCatalogScan = Q("sql_catalog_scan", Some(s"""
    SELECT $customerCols FROM customer
    WHERE c_custkey >= 100 AND c_custkey < 600
    ORDER BY c_custkey""")) { (s, dir) =>
    custSqlCatalog(s, dir)
    val cells = s.sql(
      s"""SELECT row, family, qualifier, ts, kind, value, seq
          FROM graft.cust_sql
          WHERE row >= ${hexKey(100L)} AND row < ${hexKey(600L)}""")
    CellCodec.decode(cells, customerSchema).orderBy("c_custkey")
  }

  // Aggregate pushdown through the SQL door: the grouped COUNT/MIN/MAX
  // runs INSIDE the inner resolved plan (SupportsPushDownAggregates,
  // complete pushdown — SqlCatalogSpec asserts no Aggregate node
  // survives), so only |groups| rows cross the V1 bridge. The oracle
  // recomputes per-qualifier cell counts from the relational source:
  // one cell per non-null column value, all stamped with batch ts 1.
  private val sqlAggPushdown = Q("sql_agg_pushdown", bench = true, oracle = Some(
    customerSchema.fieldNames.sorted.map { c =>
      s"""SELECT '$c' AS q, count($c) AS n_cells,
            CAST(1 AS BIGINT) AS min_ts, CAST(1 AS BIGINT) AS max_ts
          FROM customer"""
    }.mkString("SELECT q, n_cells, min_ts, max_ts FROM (",
      " UNION ALL ", ") ORDER BY q"))) { (s, dir) =>
    custSqlCatalog(s, dir)
    s.sql("""SELECT CAST(qualifier AS STRING) AS q, count(*) AS n_cells,
               min(ts) AS min_ts, max(ts) AS max_ts
             FROM graft.cust_sql GROUP BY qualifier ORDER BY q""")
  }

  // Join THROUGH the SQL door: the scan reports manifest-size statistics
  // (SupportsReportStatistics — live data-dir bytes, cached per table
  // version), so Catalyst's join sizing sees the graft side's real size
  // and auto-broadcasts it against the parquet fact table with no hint.
  // Without stats a DSv2 V1 relation defaults to "unknown = huge" and
  // every join against the door would shuffle both sides — at 100 TB the
  // difference between shipping a dimension and shuffling a fact table.
  // SqlCatalogSpec asserts the BroadcastHashJoin plan; this gate pins the
  // answer.
  private val sqlBroadcastJoin = Q("sql_broadcast_join", Some("""
    SELECT c.c_mktsegment AS seg, count(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey < 300
    GROUP BY c.c_mktsegment ORDER BY seg""")) { (s, dir) =>
    custSqlCatalog(s, dir)
    val cells = s.sql(
      s"""SELECT row, family, qualifier, ts, kind, value, seq
          FROM graft.cust_sql WHERE row < ${hexKey(300L)}""")
    val cust = CellCodec.decode(cells, customerSchema)
    t(s, dir, "orders").join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("seg")
  }

  // Runtime (join-driven) key pruning through the SQL door (r10 ask 1,
  // sql/GraftRuntimeFilter.scala): `fact JOIN small-dim ON fact.key =
  // dim.k` re-prunes the wide scan's key ranges with the dim's ACTUAL
  // key values at execution — the dynamic twin of the static multiGet
  // span prune (the reference's client routes a Get batch to only the
  // regions owning those keys). The dim is DATA-DERIVED (customer 7's
  // order keys), so the probe set exists only at runtime; the scan reads
  // O(|dim|) probed ranges instead of the table. Results hash-match the
  // plain relational join; the fixture's range DELETE stays applied.
  private val sqlRuntimePrune = Q("sql_runtime_prune", Some("""
    SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
    FROM orders f
    JOIN (SELECT o_orderkey FROM orders WHERE o_custkey < 20) d
      ON f.o_orderkey = d.o_orderkey
    WHERE NOT (f.o_orderkey >= 1000 AND f.o_orderkey < 30000)
    ORDER BY f.o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wrt",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wrt.root", root)
    // the dim is small AFTER its filter; without CBO Spark's size
    // estimate for it is the unfiltered file bytes, so raise the
    // advisory byte gate — the HARD bound stays the runtime key-count
    // cap (spark.graft.runtimeFilter.maxKeys), enforced at collect time
    s.conf.set("spark.graft.runtimeFilter.maxBuildBytes",
      (256L << 20).toString)
    t(s, dir, "orders").filter(col("o_custkey") < 20L)
      .select(col("o_orderkey")).createOrReplaceTempView("graft_rt_dim")
    s.sql("""SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
             FROM graft_wrt.`orders_w$wide` f
             JOIN graft_rt_dim d ON f.o_orderkey = d.o_orderkey
             ORDER BY f.o_orderkey""")
  }

  // Key-range disjunction (r11): `key < a OR key BETWEEN b AND c` — the
  // time-partition-union shape — prunes as an Or of row ranges pushed to
  // parquet (keyRangeOr, pruning-only; the Or stays residual so
  // exactness is structural). On a plain signed head a lo-less arm keeps
  // the negative byte region (WideViewSpec pins that case).
  private val sqlKeyRangeOr = Q("sql_key_range_or", Some("""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE (o_orderkey < 300 OR (o_orderkey >= 600 AND o_orderkey < 900))
      AND NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wkr",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wkr.root", root)
    s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
             FROM graft_wkr.`orders_w$wide`
             WHERE o_orderkey < 300 OR (o_orderkey >= 600 AND o_orderkey < 900)
             ORDER BY o_orderkey""")
  }

  // TUPLE-OR through the composite index (r11): `(custkey=a AND
  // status=s) OR (custkey IN (..) AND status=t)` — FilterList
  // (MUST_PASS_ONE) of conjunctions — probes the UNION of the
  // disjuncts' blob cartesians in ONE gather pass over the composite
  // key (WideViewSpec holds the route seam assert). The Or stays
  // residual, so exactness is structural; the fixture's range DELETE
  // stays applied.
  private val sqlCompositeOr = Q("sql_composite_or", Some("""
    SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
    WHERE ((o_custkey = 7 AND o_orderstatus = 'O')
        OR (o_custkey IN (37, 73) AND o_orderstatus = 'F'))
      AND NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wco",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wco.root", root)
    s.sql("""SELECT o_orderkey, o_custkey, o_orderstatus
             FROM graft_wco.`orders_w$wide`
             WHERE (o_custkey = 7 AND o_orderstatus = 'O')
                OR (o_custkey IN (37, 73) AND o_orderstatus = 'F')
             ORDER BY o_orderkey""")
  }

  // Runtime pruning on a ROUTED INDEXED column (the r10 ask 1
  // parenthetical): the join key is NOT the row key — it is o_custkey,
  // which carries a covered index — so the runtime In routes through
  // the INDEX (probe + covered reconstruction, zero main-table touch)
  // with probe values that exist only at execution (BUILDING customers
  // below 60, read from the customer table). Exact: the index is
  // complete for puts, the covered read applies synchronously-translated
  // deletes, and the join re-checks the equality.
  private val sqlRuntimeIndexPrune = Q("sql_runtime_index_prune", Some("""
    SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
    FROM orders f
    JOIN (SELECT c_custkey FROM customer
          WHERE c_mktsegment = 'BUILDING' AND c_custkey < 60) d
      ON f.o_custkey = d.c_custkey
    WHERE NOT (f.o_orderkey >= 1000 AND f.o_orderkey < 30000)
    ORDER BY f.o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wri",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wri.root", root)
    s.conf.set("spark.graft.runtimeFilter.maxBuildBytes",
      (256L << 20).toString)
    t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING" && col("c_custkey") < 60)
      .select(col("c_custkey")).createOrReplaceTempView("graft_rti_dim")
    s.sql("""SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
             FROM graft_wri.`orders_w$wide` f
             JOIN graft_rti_dim d ON f.o_custkey = d.c_custkey
             ORDER BY f.o_orderkey""")
  }

  // OR-of-probes routing (r10 ask 2, sql/GraftOrArms.scala +
  // SecondaryIndex.probeOr): a one-column disjunction of equalities and
  // bounded intervals — the reference's FilterList(MUST_PASS_ONE)
  // evaluated server-side (hbase/filter/FilterList.java:47-49) — routes
  // through o_custkey's covered index as ONE multi-arm probe pass
  // (WideViewSpec holds the route seam assert), instead of a full scan.
  // The single SQL statement keeps the OR residual, so exactness is
  // structural; the fixture's range DELETE stays applied through the
  // synchronously-translated index tombstones.
  private val sqlOrRoute = Q("sql_or_route", Some("""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE (o_custkey = 7 OR (o_custkey >= 37 AND o_custkey < 40)
           OR o_custkey IN (73, 88))
      AND NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wor",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wor.root", root)
    s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
             FROM graft_wor.`orders_w$wide`
             WHERE o_custkey = 7 OR (o_custkey >= 37 AND o_custkey < 40)
                OR o_custkey IN (73, 88)
             ORDER BY o_orderkey""")
  }

  // CROSS-column OR routing (r12): `custkey = 7 OR status = 'P'` — the
  // GENERAL FilterList(MUST_PASS_ONE): heterogeneous filters on
  // DIFFERENT columns composed in one disjunction
  // (hbase/filter/FilterList.java:47-49). Each column carries its own
  // index, so the door serves the disjunction as the UNION of the
  // per-column probeOr passes, deduped by row key, ONE gather
  // (WideViewSpec holds the route seam assert: BOTH index tables
  // probed). The Or stays residual, so exactness is structural; the
  // fixture's range DELETE stays applied through the synchronous index
  // tombstones.
  private val sqlCrossOr = Q("sql_cross_or", Some("""
    SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
    WHERE (o_custkey = 7 OR o_orderstatus = 'P'
           OR o_custkey IN (37, 73))
      AND NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wxo",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wxo.root", root)
    s.sql("""SELECT o_orderkey, o_custkey, o_orderstatus
             FROM graft_wxo.`orders_w$wide`
             WHERE o_custkey = 7 OR o_orderstatus = 'P'
                OR o_custkey IN (37, 73)
             ORDER BY o_orderkey""")
  }

  // Runtime-filter RANGE degradation (r12): the dim's distinct join
  // keys exceed the runtime key cap (1,024), so instead of declining —
  // leaving the fact scan unpruned, exactly where mid-size-dim star
  // joins live — the probe degrades to the dim's exact [min, max]
  // key-range superset (one extra aggregate over the size-gated dim)
  // and the fact scan still skips every row group outside the span.
  // The join re-checks equality, so the superset prune is structurally
  // exact; RuntimeFilterSpec asserts the ("k", "range") probe shape.
  private val sqlRuntimeRangePrune = Q("sql_runtime_range_prune", Some("""
    SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
    FROM orders f
    JOIN (SELECT o_orderkey FROM orders
          WHERE o_orderkey >= 400 AND o_orderkey < 12000) d
      ON f.o_orderkey = d.o_orderkey
    WHERE NOT (f.o_orderkey >= 1000 AND f.o_orderkey < 30000)
    ORDER BY f.o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wrr",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wrr.root", root)
    s.conf.set("spark.graft.runtimeFilter.maxBuildBytes",
      (256L << 20).toString)
    t(s, dir, "orders")
      .filter(col("o_orderkey") >= 400L && col("o_orderkey") < 12000L)
      .select(col("o_orderkey")).createOrReplaceTempView("graft_rtr_dim")
    s.sql("""SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
             FROM graft_wrr.`orders_w$wide` f
             JOIN graft_rtr_dim d ON f.o_orderkey = d.o_orderkey
             ORDER BY f.o_orderkey""")
  }

  // MULTI-attribute runtime pruning (r12): the fact joined to TWO dims
  // on two routed columns — the key head (o_orderkey, prunes key
  // ranges) and an indexed value column (o_custkey, prunes through the
  // index route) — applies BOTH probes to one scan: key ranges ∩ index
  // route (RuntimeFilterSpec asserts the two probe shapes). Each join
  // re-checks its own equality, so the intersected superset is
  // structurally exact; the fixture's range DELETE stays applied.
  private val sqlRuntimeMultiPrune = Q("sql_runtime_multi_prune", Some("""
    SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
    FROM orders f
    JOIN (SELECT o_orderkey FROM orders WHERE o_orderkey < 700) dk
      ON f.o_orderkey = dk.o_orderkey
    JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey < 50) dc
      ON f.o_custkey = dc.o_custkey
    WHERE NOT (f.o_orderkey >= 1000 AND f.o_orderkey < 30000)
    ORDER BY f.o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wrm",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wrm.root", root)
    s.conf.set("spark.graft.runtimeFilter.maxBuildBytes",
      (256L << 20).toString)
    t(s, dir, "orders").filter(col("o_orderkey") < 700L)
      .select(col("o_orderkey")).createOrReplaceTempView("graft_rtm_dk")
    t(s, dir, "orders").filter(col("o_custkey") < 50L)
      .select(col("o_custkey")).distinct()
      .createOrReplaceTempView("graft_rtm_dc")
    s.sql("""SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
             FROM graft_wrm.`orders_w$wide` f
             JOIN graft_rtm_dk dk ON f.o_orderkey = dk.o_orderkey
             JOIN graft_rtm_dc dc ON f.o_custkey = dc.o_custkey
             ORDER BY f.o_orderkey""")
  }

  // MIXED key/value OR routing (r12): `o_orderkey < 200 OR o_custkey=7`
  // — the reference's CLASSIC FilterList(MUST_PASS_ONE) of a RowFilter
  // with a SingleColumnValueFilter (hbase/filter/FilterList.java:47-49).
  // The key disjunct prunes as a row range read straight off the cell
  // scan; the value disjunct probes the custkey index EXCLUDING rows
  // the range branch owns; one resolution pass over the disjoint cell
  // union, residual Or exact. WideViewSpec asserts the mixedOrShape
  // seam; this gate proves the routed answer hash-matches the
  // relational oracle through the fixture's range delete.
  private val sqlMixedOr = Q("sql_mixed_or", Some("""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE (o_orderkey < 200 OR o_custkey = 7)
      AND NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wmx",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wmx.root", root)
    s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
             FROM graft_wmx.`orders_w$wide`
             WHERE o_orderkey < 200 OR o_custkey = 7
             ORDER BY o_orderkey""")
  }

  // Runtime INDEX-RANGE degradation (r12): the over-cap dim joins on an
  // INDEXED VALUE column (not the key head), where r11 declined
  // entirely — the probe now degrades to index RANGE arms: [min, max]
  // of the dim's join values encodes to an Or of ArmRanges probed
  // through the column's single-column index (candidates gathered +
  // verified; covered here, so the answer can stay index-only), and the
  // join's equality re-check keeps the superset exact.
  // RuntimeFilterSpec asserts the ("pop", "range") shape + index route
  // on a twin fixture; sf0.001's dim sits under the cap and takes the
  // exact-keys path (both paths hash the same oracle).
  private val sqlRuntimeIndexRange = Q("sql_runtime_index_range", Some("""
    SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
    FROM orders f
    JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey < 1200) d
      ON f.o_custkey = d.o_custkey
    WHERE NOT (f.o_orderkey >= 1000 AND f.o_orderkey < 30000)
    ORDER BY f.o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wir",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wir.root", root)
    s.conf.set("spark.graft.runtimeFilter.maxBuildBytes",
      (256L << 20).toString)
    t(s, dir, "orders").filter(col("o_custkey") < 1200L)
      .select(col("o_custkey")).distinct()
      .createOrReplaceTempView("graft_rti_dim")
    s.sql("""SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
             FROM graft_wir.`orders_w$wide` f
             JOIN graft_rti_dim d ON f.o_custkey = d.o_custkey
             ORDER BY f.o_orderkey""")
  }

  // Conjunct-SUPERSET OR routing (r12): a disjunct that is an And over
  // MIXED columns (`(status = 'P' AND totalprice > x) OR custkey = 7`)
  // no longer bails the whole route — it routes by ONE of its INDEXED
  // conjuncts' arms (here o_orderstatus; o_totalprice carries no index),
  // a value superset of the disjunct, unioned with the other arms'
  // probes. Sound because the Or stays residual (Spark re-applies the
  // exact disjunction, totalprice conjunct included) — the arbitrary-
  // nesting face of FilterList(MUST_PASS_ONE)
  // (hbase/filter/FilterList.java:47-49). WideViewSpec holds the route
  // seam assert; this gate proves the routed answer hash-matches the
  // relational oracle through the fixture's range delete.
  private val sqlConjunctOr = Q("sql_conjunct_or", Some("""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
    WHERE ((o_orderstatus = 'P' AND o_totalprice > 150000) OR o_custkey = 7)
      AND NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wco",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wco.root", root)
    s.sql("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
             FROM graft_wco.`orders_w$wide`
             WHERE (o_orderstatus = 'P' AND o_totalprice > 150000)
                OR o_custkey = 7
             ORDER BY o_orderkey""")
  }

  // Runtime-filter CLUSTERED range degradation (r12): the over-cap dim's
  // keys live in TWO separated clusters of the fact key space, so the
  // probe prunes with gap-separated ranges (occupied-bucket runs, ≤
  // maxRanges) instead of one [min, max] span — the scan skips the
  // multi-thousand-key hole between the clusters too. Each run is built from
  // bucket OCCUPANCY (never a sample), so the union stays a value
  // superset and the join's equality re-check keeps exactness;
  // RuntimeFilterSpec asserts the ("o_orderkey", "range") shape with
  // range count > 1 on a twin fixture.
  private val sqlRuntimeClusterPrune = Q("sql_runtime_cluster_prune", Some("""
    SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
    FROM orders f
    JOIN (SELECT o_orderkey FROM orders
          WHERE o_orderkey < 1200
             OR (o_orderkey >= 8000 AND o_orderkey < 9000)) d
      ON f.o_orderkey = d.o_orderkey
    WHERE NOT (f.o_orderkey >= 1000 AND f.o_orderkey < 30000)
    ORDER BY f.o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wrc",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wrc.root", root)
    s.conf.set("spark.graft.runtimeFilter.maxBuildBytes",
      (256L << 20).toString)
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 1200L ||
        (col("o_orderkey") >= 8000L && col("o_orderkey") < 9000L))
      .select(col("o_orderkey")).createOrReplaceTempView("graft_rtc_dim")
    s.sql("""SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
             FROM graft_wrc.`orders_w$wide` f
             JOIN graft_rtc_dim d ON f.o_orderkey = d.o_orderkey
             ORDER BY f.o_orderkey""")
  }

  // LEADING-member guard gate (r14): the r13 guard exempted
  // composite-LEADING routes — a range on the leading member matching
  // ~the whole table still paid loose probe + dedup + gather. The
  // exemption is closed on both doors; this gate drives the CELL door
  // (the sql_index_leading_range fixture: composite (custkey, status)
  // index, custkey is a leading member only) with an anti-selective
  // leading range and asserts the decline in-closure. At sf0.01+ the
  // decline comes from the SPAN PRE-ESTIMATE (zero index jobs — the
  // arms cover the index's whole cached key span); at sf0.001 the
  // 7-byte prefixes degenerate (custkey < 256) and the measured
  // occupancy probe declines instead — both paths must produce the
  // same pushed-scan answer, hash-matched against the oracle.
  private val sqlGuardLeading = Q("sql_guard_leading", Some("""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey >= 10 AND o_custkey < 4611686018427387904
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = Queries.synchronized {
      sqlLeadingRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-sqllr").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("orders_lc",
          Seq(FamilyDescriptor("o")), splitKeys = 8, immutableRows = true),
          nowMs = 1L)
        g.table("orders_lc").mutate(
          CellCodec.encode(t(s, dir, "orders"), "o", Seq("o_orderkey")),
          nowMs = 1L)
        g.createCompositeIndex("orders_lc",
          Seq("o" -> Bytes.toBytes("o_custkey"),
            "o" -> Bytes.toBytes("o_orderstatus")), nowMs = 2L)
        r
      })
    }
    s.conf.set("spark.sql.catalog.graft_lr",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_lr.root", root)
    s.conf.set("spark.graft.route.guard.minIndexRows", "0")
    try {
      val qual = "X'" + Bytes.toBytes("o_custkey").map(b => f"$b%02x").mkString + "'"
      def h(v: Long) = "X'" + Bytes.toBytes(v).map(b => f"$b%02x").mkString + "'"
      val cells = s.sql(
        s"""SELECT row, family, qualifier, ts, kind, value, seq
            FROM graft_lr.orders_lc
            WHERE family = 'o' AND qualifier = $qual
              AND value >= ${h(10L)} AND value < ${h(1L << 62)}""")
      val df = CellCodec.decode(cells,
        StructType(Seq(StructField("o_custkey", LongType))),
        key = Seq("o_orderkey" -> LongType))
        .orderBy("o_orderkey")
      val rows = df.collect()
      require(graft.sql.GraftRouteSeams.guardDeclined(df),
        "anti-selective leading range did not decline — guard regressed")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
    } finally s.conf.unset("spark.graft.route.guard.minIndexRows")
  }

  // Route SELECTIVITY-guard gate (r13): an ANTI-selective equality on an
  // indexed column — status 'O' matches ~half of orders — with the guard
  // floor zeroed. The route MUST decline (asserted in-closure via the
  // GraftRouteSeams.guardDeclined seam; r12 would have paid index probe
  // + dedup + gather over half the table) and the declined plan's full
  // scan + residual must hash-match the relational oracle. The result is
  // LOCALIZED (collected + re-created) so the guard conf never leaks
  // into other gates' executions in the same session.
  private val sqlRouteGuard = Q("sql_route_guard", Some("""
    SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
    WHERE o_orderstatus = 'O'
      AND NOT (o_orderkey >= 1000 AND o_orderkey < 30000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = wideRoot(s, dir)
    s.conf.set("spark.sql.catalog.graft_wgd",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wgd.root", root)
    s.conf.set("spark.graft.route.guard.minIndexRows", "0")
    try {
      val df = s.sql("""SELECT o_orderkey, o_custkey, o_orderstatus
               FROM graft_wgd.`orders_w$wide`
               WHERE o_orderstatus = 'O'
               ORDER BY o_orderkey""")
      val rows = df.collect()
      require(graft.sql.GraftRouteSeams.guardDeclined(df),
        "route guard did not decline the anti-selective arm")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
    } finally s.conf.unset("spark.graft.route.guard.minIndexRows")
  }

  // HISTOGRAM-vouched routing gate (r15): a SELECTIVE equality (a
  // derived custkey-digit column — 10% of orders; the corpus's natural
  // categoricals are uniform thirds, all anti-selective) with the probe
  // budget forced far below its hit count. r14's exhaustion rule
  // declined this shape — surrendering the index's advantage exactly
  // where it is largest — and at sf0.01+ (where the ~1,500 hits exceed
  // the forced budget of 64) neither the measured probe (exhausts) nor
  // the span estimate (never vouches) can route it, so the in-closure
  // route assertion below is only satisfiable by the persisted
  // equi-depth histogram's upper bound
  // ([[graft.catalog.ManifestStats]]) vouching with ZERO index jobs.
  // (At sf0.001 the ~150 hits also exceed the budget — the gate pins
  // the crossing at every sf.) The routed answer must hash-match the
  // relational oracle; result LOCALIZED so the forced knobs never leak
  // into other gates.
  private val sqlGuardHistRoots =
    scala.collection.mutable.Map.empty[String, String]
  private val sqlGuardHistogram = Q("sql_guard_histogram", Some("""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE CAST(o_custkey % 10 AS VARCHAR) = '7'
    ORDER BY o_orderkey""")) { (s, dir) =>
    val root = Queries.synchronized {
      sqlGuardHistRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-gh").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("orders_gh",
          Seq(FamilyDescriptor("o")), splitKeys = 8, immutableRows = true,
          wideKey = Some("o_orderkey:long"),
          wideSchema = Some("o:o_custkey:long;o:ckd:string")), nowMs = 1L)
        g.table("orders_gh").mutate(CellCodec.encode(
          t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
            pmod(col("o_custkey"), lit(10L)).cast(StringType).as("ckd")),
          "o", Seq("o_orderkey")), nowMs = 1L)
        g.createIndex("orders_gh", "o", Bytes.toBytes("ckd"), nowMs = 2L)
        r
      })
    }
    s.conf.set("spark.sql.catalog.graft_wgh",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wgh.root", root)
    s.conf.set("spark.graft.route.guard.minIndexRows", "0")
    s.conf.set("spark.graft.route.guard.maxProbeRows", "64")
    try {
      val df = s.sql("""SELECT o_orderkey, o_custkey
               FROM graft_wgh.`orders_gh$wide`
               WHERE ckd = '7'
               ORDER BY o_orderkey""")
      val rows = df.collect()
      require(graft.sql.GraftWideSeams.usedIndexTables(df).nonEmpty &&
        !graft.sql.GraftRouteSeams.guardDeclined(df),
        "selective probe above the forced-low budget did not route — " +
          "the histogram vouch regressed")
      require(rows.length > 64,
        "fixture drift: hits must exceed the forced budget so only the " +
          "histogram can have vouched")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
    } finally {
      s.conf.unset("spark.graft.route.guard.minIndexRows")
      s.conf.unset("spark.graft.route.guard.maxProbeRows")
    }
  }

  // Runtime-filter PREFIX-CLUSTERED degradation on a STRING key (r13):
  // the MOST common HBase row-key shape is string/binary, where r12's
  // over-cap degradation could only hold the single [min, max] span.
  // The probe now occupancy-clusters a 7-byte prefix of the ENCODED key
  // into gap-separated byte ranges (value supersets per bucket — see
  // GraftRuntimeFilter.clusterPrefixRuns), so a two-cluster dim skips
  // holes in its key distribution on a string-keyed fact too. The
  // fixture key is UNPADDED ('k<digits>#' — '#' keeps distinct keys
  // prefix-free), so the dim's 7-byte prefixes genuinely differ and
  // clustering engages; a zero-padded key would share one prefix and
  // (correctly) fall back to the single envelope, proving nothing.
  // The dense orderkey domain makes the dim 2,200 distinct keys from
  // sf0.01 up — over the 1,024 runtime key cap, so the gate runs the
  // over-cap prefix path there (under-cap exact keys at sf0.001; both
  // paths must hash identically). RuntimeFilterSpec asserts
  // rangeCount > 1 on string AND binary keyed fixtures.
  private val sqlRuntimePrefixRoots =
    scala.collection.mutable.Map.empty[String, String]
  private val sqlRuntimePrefixPrune = Q("sql_runtime_prefix_prune", Some("""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderkey < 1200 OR (o_orderkey >= 8000 AND o_orderkey < 9000)
    ORDER BY o_orderkey""")) { (s, dir) =>
    val skey = concat(lit("k"),
      col("o_orderkey").cast(StringType), lit("#")).as("ok")
    val root = Queries.synchronized {
      sqlRuntimePrefixRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-rpp").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("orders_sk",
          Seq(FamilyDescriptor("o")), splitKeys = 8,
          wideKey = Some("ok:string"),
          wideSchema = Some("o:o_orderkey:long;o:o_custkey:long;" +
            "o:o_totalprice:double")), nowMs = 1L)
        g.table("orders_sk").mutate(CellCodec.encode(
          t(s, dir, "orders").select(skey, col("o_orderkey"),
            col("o_custkey"), col("o_totalprice")),
          "o", Seq("ok")), nowMs = 1L)
        r
      })
    }
    s.conf.set("spark.sql.catalog.graft_rpp",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_rpp.root", root)
    s.conf.set("spark.graft.runtimeFilter.maxBuildBytes",
      (256L << 20).toString)
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 1200L ||
        (col("o_orderkey") >= 8000L && col("o_orderkey") < 9000L))
      .select(skey).createOrReplaceTempView("graft_rpp_dim")
    val df = s.sql("""SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
             FROM graft_rpp.`orders_sk$wide` f
             JOIN graft_rpp_dim d ON f.ok = d.ok
             ORDER BY f.o_orderkey""")
    val rows = df.collect()
    // gate integrity (r14, the sql_route_guard standard): the join is
    // exact whether or not the probe engages, so a silently-declined
    // prefix path would still hash-match — assert the CLUSTERED range
    // probe actually APPLIED (over-cap string key => rangeCount > 1),
    // except at sf0.001 where the dim is under the 1,024 key cap and
    // the exact-keys shape is the correct application
    val shapes = graft.sql.GraftRuntimeFilter.probeShapes(df)
    val overCap = shapes.exists(p => p._1 == "ok" && p._2 == "range")
    require(shapes.exists(_._1 == "ok"),
      "runtime probe on the string key did not apply — fixture drift?")
    require(!overCap ||
      graft.sql.GraftRuntimeFilter.rangeCounts(df).exists(p =>
        p._1 == "ok" && p._2 > 1),
      "over-cap string-key probe fell back to the single envelope — " +
        "prefix clustering regressed")
    s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
  }

  // SQL DELETE end-to-end: tombstones written through the DSv2 door
  // (SupportsDelete -> DeleteFamily cells at each group's max ts), read
  // back resolved. Oracle = the source minus the deleted key range.
  private val sqlDeleteRoots = scala.collection.mutable.Map.empty[String, String]
  private val sqlDeleteScan = Q("sql_delete_scan", Some(s"""
    SELECT $customerCols FROM customer
    WHERE NOT (c_custkey >= 100 AND c_custkey < 600)
    ORDER BY c_custkey""")) { (s, dir) =>
    val root = Queries.synchronized {
      sqlDeleteRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-sqldel").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("cust_del",
          Seq(FamilyDescriptor("c")), splitKeys = 8), nowMs = 1L)
        g.table("cust_del").mutate(customerCells(s, dir), nowMs = 1L)
        s.conf.set("spark.sql.catalog.graft_del",
          classOf[graft.sql.GraftSqlCatalog].getName)
        s.conf.set("spark.sql.catalog.graft_del.root", r)
        s.sql(s"""DELETE FROM graft_del.cust_del
                  WHERE row >= ${hexKey(100L)} AND row < ${hexKey(600L)}""")
        r
      })
    }
    s.conf.set("spark.sql.catalog.graft_del",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_del.root", root)
    val cells = s.sql(
      "SELECT row, family, qualifier, ts, kind, value, seq FROM graft_del.cust_del")
    CellCodec.decode(cells, customerSchema).orderBy("c_custkey")
  }

  // SQL UPDATE end-to-end through the DSv2 row-level (delta) door: matched
  // cells get a NEW Put version stamped after the old one (checkAndPut
  // shape — never a rewrite), read back resolved. Oracle = customer with
  // the updated segment applied by CASE.
  private val sqlUpdateRoots = scala.collection.mutable.Map.empty[String, String]
  private val sqlUpdateScan = Q("sql_update_scan", Some(s"""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal,
      CASE WHEN c_custkey >= 100 AND c_custkey < 600 THEN 'UPDATED'
           ELSE c_mktsegment END AS c_mktsegment
    FROM customer ORDER BY c_custkey""")) { (s, dir) =>
    val mktQual = "X'" + "c_mktsegment".getBytes("UTF-8")
      .map(b => f"$b%02x").mkString + "'"
    val root = Queries.synchronized {
      sqlUpdateRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-sqlupd").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("cust_upd",
          Seq(FamilyDescriptor("c")), splitKeys = 8), nowMs = 1L)
        g.table("cust_upd").mutate(customerCells(s, dir), nowMs = 1L)
        s.conf.set("spark.sql.catalog.graft_upd",
          classOf[graft.sql.GraftSqlCatalog].getName)
        s.conf.set("spark.sql.catalog.graft_upd.root", r)
        s.sql(s"""UPDATE graft_upd.cust_upd SET value = CAST('UPDATED' AS BINARY)
                  WHERE row >= ${hexKey(100L)} AND row < ${hexKey(600L)}
                    AND qualifier = $mktQual""")
        r
      })
    }
    s.conf.set("spark.sql.catalog.graft_upd",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_upd.root", root)
    val cells = s.sql(
      "SELECT row, family, qualifier, ts, kind, value, seq FROM graft_upd.cust_upd")
    CellCodec.decode(cells, customerSchema).orderBy("c_custkey")
  }

  // SQL MERGE INTO end-to-end: one statement carrying both the
  // checkAndPut branch (matched segment cells update to 'MERGED') and the
  // put branch (unmatched synthetic customers insert whole), against a
  // cell-level source view. Oracle = the same two branches in SQL.
  private val sqlMergeRoots = scala.collection.mutable.Map.empty[String, String]
  private val sqlMergeScan = Q("sql_merge_scan", Some(s"""
    SELECT * FROM (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal,
        CASE WHEN c_custkey < 50 THEN 'MERGED' ELSE c_mktsegment END
          AS c_mktsegment
      FROM customer
      UNION ALL
      SELECT c_custkey + 1000000, 'NEW', c_nationkey, c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey < 20)
    ORDER BY c_custkey""")) { (s, dir) =>
    val root = Queries.synchronized {
      sqlMergeRoots.getOrElseUpdate(dir, {
        val r = java.nio.file.Files.createTempDirectory("graft-q-sqlmrg").toString
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        val g = graft.Graft(s, r)
        g.createTable(TableDescriptor("cust_mrg",
          Seq(FamilyDescriptor("c")), splitKeys = 8), nowMs = 1L)
        g.table("cust_mrg").mutate(customerCells(s, dir), nowMs = 1L)
        s.conf.set("spark.sql.catalog.graft_mrg",
          classOf[graft.sql.GraftSqlCatalog].getName)
        s.conf.set("spark.sql.catalog.graft_mrg.root", r)
        val cust = t(s, dir, "customer")
        val updates = CellCodec.encode(
          cust.filter(col("c_custkey") < 50)
            .withColumn("c_mktsegment", lit("MERGED")),
          "c", Seq("c_custkey"), batchTs = 5L)
          .filter(col("qualifier") === lit(Bytes.toBytes("c_mktsegment")))
        val inserts = CellCodec.encode(
          cust.filter(col("c_custkey") < 20)
            .withColumn("c_custkey", col("c_custkey") + 1000000L)
            .withColumn("c_name", lit("NEW")),
          "c", Seq("c_custkey"), batchTs = 5L)
        updates.unionByName(inserts).createOrReplaceTempView("cust_mrg_src")
        s.sql("""MERGE INTO graft_mrg.cust_mrg t USING cust_mrg_src s
                 ON t.row = s.row AND t.family = s.family
                    AND t.qualifier = s.qualifier
                 WHEN MATCHED THEN UPDATE SET value = s.value
                 WHEN NOT MATCHED THEN INSERT
                   (row, family, qualifier, ts, kind, value, seq)
                   VALUES (s.row, s.family, s.qualifier, s.ts, s.kind,
                           s.value, s.seq)""")
        r
      })
    }
    s.conf.set("spark.sql.catalog.graft_mrg",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mrg.root", root)
    val cells = s.sql(
      "SELECT row, family, qualifier, ts, kind, value, seq FROM graft_mrg.cust_mrg")
    CellCodec.decode(cells, customerSchema).orderBy("c_custkey")
  }

  private val snapshotScan = Q("snapshot_scan", Some(s"""
    SELECT $customerCols FROM customer ORDER BY c_custkey""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val root = java.nio.file.Files.createTempDirectory("graft-q-snap").toString
    val g = graft.Graft(s, root)
    g.createTable(TableDescriptor("cust", Seq(FamilyDescriptor("c")),
      splitKeys = 8), nowMs = 1L)
    g.table("cust").mutate(
      CellCodec.encode(t(s, dir, "customer"), "c", Seq("c_custkey")), nowMs = 1L)
    g.snapshot("s1", "cust", nowMs = 2L)
    // post-snapshot damage: delete every row, then major-compact
    val cust = t(s, dir, "customer")
    g.table("cust").mutate(Mutations.deleteFamilyCells(
      cust, CellCodec.rowKey(cust, Seq("c_custkey")), "c", ts = 3L), nowMs = 3L)
    g.table("cust").majorCompact(nowMs = 4L)
    // the snapshot still reads the full original table
    CellCodec.decode(ScanExec(g.readSnapshot("s1"), Scan()), customerSchema)
      .orderBy("c_custkey")
  }

  // The RESTORE side of the lifecycle (TestSnapshot.java:150,177 —
  // restored table == snapshot-time state): snapshot, then damage the
  // LIVE table three ways (delete a key range, overwrite a column,
  // append new rows), then restoreSnapshot and read the TABLE itself.
  // Also proves restore is a manifest swap, not a data copy: the clone
  // reads post-damage state independently. Oracle = the untouched source.
  private val snapshotRestoreScan = Q("snapshot_restore_scan", Some(s"""
    SELECT $customerCols FROM customer ORDER BY c_custkey""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val root = java.nio.file.Files.createTempDirectory("graft-q-snaprest").toString
    val g = graft.Graft(s, root)
    g.createTable(TableDescriptor("cust", Seq(FamilyDescriptor("c")),
      splitKeys = 8), nowMs = 1L)
    val cust = t(s, dir, "customer")
    g.table("cust").mutate(
      CellCodec.encode(cust, "c", Seq("c_custkey")), nowMs = 1L)
    g.snapshot("s1", "cust", nowMs = 2L)
    // post-snapshot damage: range delete + column overwrite + new rows
    val lowKeys = cust.filter(col("c_custkey") < 200)
    g.table("cust").mutate(Mutations.deleteFamilyCells(
      lowKeys, CellCodec.rowKey(lowKeys, Seq("c_custkey")), "c", ts = 3L), nowMs = 3L)
    g.table("cust").mutate(CellCodec.encode(
      cust.withColumn("c_name", lit("DAMAGED")), "c", Seq("c_custkey"),
      batchTs = 3L), nowMs = 4L)
    g.table("cust").mutate(CellCodec.encode(
      cust.select((col("c_custkey") + 10000000L).as("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
        .limit(50), "c", Seq("c_custkey"), batchTs = 3L), nowMs = 5L)
    // clone from the snapshot, then restore the original: the clone
    // shares the snapshot's data dirs by reference, so a correct restore
    // must leave it intact (refcount integrity in one lifecycle)
    g.cloneSnapshot("s1", "cust_clone", nowMs = 6L)
    g.restoreSnapshot("s1", nowMs = 7L)
    require(g.table("cust_clone").scan(Scan()).count() ==
      g.table("cust").scan(Scan()).count(), "clone diverged after restore")
    // the restored table must be exactly the snapshot-time state
    CellCodec.decode(g.table("cust").scan(Scan()), customerSchema)
      .orderBy("c_custkey")
  }

  // Refcount GC in one lifecycle (`hbase/master/DeleteSnapshot.java:50-64`
  // + `SnapshotLogCleaner`): two snapshots share one data dir, a later
  // append is referenced by only one of them, history is pruned, the
  // scratch snapshot is deleted, and vacuum runs. A correct protection
  // set deletes the scratch-only dir and KEEPS the shared one; get the
  // refcount wrong in either direction and the survivor snapshot's scan
  // (the gate output) loses rows or reads deleted files. The require()
  // pins the other direction — the scratch-only dir must actually die,
  // or "GC" is a no-op that never frees space.
  private val snapshotGcScan = Q("snapshot_gc_scan", Some(s"""
    SELECT $customerCols FROM customer ORDER BY c_custkey""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val root = java.nio.file.Files.createTempDirectory("graft-q-snapgc").toString
    val g = graft.Graft(s, root)
    g.createTable(TableDescriptor("cust", Seq(FamilyDescriptor("c")),
      splitKeys = 8), nowMs = 1L)
    val cust = t(s, dir, "customer")
    g.table("cust").mutate(
      CellCodec.encode(cust, "c", Seq("c_custkey")), nowMs = 1L)
    g.snapshot("s_keep", "cust", nowMs = 2L) // refs data-1 only
    // append damage -> data-2; scratch snapshot refs data-1 AND data-2
    g.table("cust").mutate(CellCodec.encode(
      cust.withColumn("c_name", lit("SCRATCH")), "c", Seq("c_custkey"),
      batchTs = 3L), nowMs = 3L)
    g.snapshot("s_tmp", "cust", nowMs = 4L)
    // compact the live table away from both dirs, prune history so only
    // snapshots keep the old dirs alive, then drop the scratch snapshot
    g.table("cust").majorCompact(nowMs = 5L)
    g.catalog.expireVersions("cust", keep = 1)
    g.deleteSnapshot("s_tmp")
    val dead = g.vacuum("cust")
    require(dead.nonEmpty, "vacuum freed nothing — scratch-only dir leaked")
    // the surviving snapshot still reads the full pre-damage table
    CellCodec.decode(ScanExec(g.readSnapshot("s_keep"), Scan()), customerSchema)
      .orderBy("c_custkey")
  }

  // Snapshot DIFF — the corpus-versioning audit: snapshot v1, apply
  // three disjoint-key-range damages (delete < 200, overwrite c_name on
  // [200, 400), append 50 fresh keys at +1e7), snapshot v2, diff. The
  // oracle reconstructs the expected change set from the SAME ranges in
  // SQL: removed rows contribute one row per encoded qualifier, the
  // overwrite contributes exactly the c_name coordinate, appends
  // contribute all qualifiers of the new keys. Wrong tombstone handling,
  // a version cap leak, or a join-side mixup each produce a different
  // change multiset.
  private val snapshotDiffScan = Q("snapshot_diff", Some("""
    SELECT k, q, change FROM (
      SELECT c_custkey AS k,
        unnest(['c_acctbal','c_custkey','c_mktsegment','c_name','c_nationkey']) AS q,
        'removed' AS change
      FROM customer WHERE c_custkey < 200
      UNION ALL
      SELECT c_custkey, 'c_name', 'changed'
      FROM customer WHERE c_custkey >= 200 AND c_custkey < 400
      UNION ALL
      SELECT c_custkey + 10000000,
        unnest(['c_acctbal','c_custkey','c_mktsegment','c_name','c_nationkey']), 'added'
      FROM customer WHERE c_custkey < 50)
    ORDER BY k, q""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val root = java.nio.file.Files.createTempDirectory("graft-q-snapdiff").toString
    val g = graft.Graft(s, root)
    g.createTable(TableDescriptor("cust", Seq(FamilyDescriptor("c")),
      splitKeys = 8), nowMs = 1L)
    val cust = t(s, dir, "customer")
    g.table("cust").mutate(
      CellCodec.encode(cust, "c", Seq("c_custkey")), nowMs = 1L)
    g.snapshot("v1", "cust", nowMs = 2L)
    val lowKeys = cust.filter(col("c_custkey") < 200)
    g.table("cust").mutate(Mutations.deleteFamilyCells(
      lowKeys, CellCodec.rowKey(lowKeys, Seq("c_custkey")), "c", ts = 3L), nowMs = 3L)
    g.table("cust").mutate(CellCodec.encode(
      cust.filter(col("c_custkey") >= 200 && col("c_custkey") < 400)
        .withColumn("c_name", lit("DAMAGED")), "c", Seq("c_custkey"),
      batchTs = 3L), nowMs = 4L)
    g.table("cust").mutate(CellCodec.encode(
      cust.filter(col("c_custkey") < 50)
        .withColumn("c_custkey", col("c_custkey") + 10000000L),
      "c", Seq("c_custkey"), batchTs = 3L), nowMs = 5L)
    g.snapshot("v2", "cust", nowMs = 6L)
    g.diffSnapshots("v1", "v2")
      .select(
        graft.functions.VectorFunctions.bitsToLong(col("row")).as("k"),
        col("qualifier").cast("string").as("q"), col("change"))
      .orderBy("k", "q")
  }

  // Export -> import across CATALOGS, then prove the copy is self-
  // contained: the source root is deleted outright before the imported
  // snapshot is read (`ExportSnapshot.java:53` — the MR distcp whose
  // whole point is that the target survives the source cluster). A
  // reference-not-copy bug, a dropped file, or a manifest path not
  // rewritten to the exported layout all surface as missing rows or a
  // read error on the gate's scan.
  private val snapshotExportScan = Q("snapshot_export_scan", Some(s"""
    SELECT $customerCols FROM customer ORDER BY c_custkey""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val rootA = java.nio.file.Files.createTempDirectory("graft-q-snapexA").toString
    val rootB = java.nio.file.Files.createTempDirectory("graft-q-snapexB").toString
    val exportDir = java.nio.file.Files.createTempDirectory("graft-q-snapexD").toString
    val gA = graft.Graft(s, rootA)
    gA.createTable(TableDescriptor("cust", Seq(FamilyDescriptor("c")),
      splitKeys = 8), nowMs = 1L)
    gA.table("cust").mutate(
      CellCodec.encode(t(s, dir, "customer"), "c", Seq("c_custkey")), nowMs = 1L)
    gA.snapshot("s1", "cust", nowMs = 2L)
    gA.exportSnapshot("s1", exportDir)
    val gB = graft.Graft(s, rootB)
    gB.importSnapshot("s1", exportDir)
    // the export must stand on its own: the source catalog disappears
    val fsA = new org.apache.hadoop.fs.Path(rootA)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fsA.delete(new org.apache.hadoop.fs.Path(rootA), true)
    CellCodec.decode(ScanExec(gB.readSnapshot("s1"), Scan()), customerSchema)
      .orderBy("c_custkey")
  }

  // INCREMENTAL export: export snapshot s1 in full, append a delta,
  // snapshot s2, export s2 AGAINST the first export — only the delta's
  // data dir may ship (asserted below: the incremental target holds
  // strictly fewer leaf dirs than s2 references, and none of s1's).
  // The imported s2 stands on (incremental dir + base export chain); the
  // SOURCE catalog is deleted before the verifying scan, so a dir that
  // silently resolved back to the source would fail the read. Reference:
  // `ExportSnapshot.java:53` ships reference-files for HFiles the target
  // already holds — successive exports cost only the delta.
  private val snapshotExportIncremental = Q("snapshot_export_incremental",
      Some(s"""
    SELECT $customerCols FROM (
      SELECT $customerCols FROM customer
      UNION ALL
      SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal,
        c_mktsegment FROM customer WHERE c_custkey < 50)
    ORDER BY c_custkey""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val rootA = java.nio.file.Files.createTempDirectory("graft-q-snapincA").toString
    val rootB = java.nio.file.Files.createTempDirectory("graft-q-snapincB").toString
    val exp1 = java.nio.file.Files.createTempDirectory("graft-q-snapincE1").toString
    val exp2 = java.nio.file.Files.createTempDirectory("graft-q-snapincE2").toString
    val gA = graft.Graft(s, rootA)
    gA.createTable(TableDescriptor("cust", Seq(FamilyDescriptor("c")),
      splitKeys = 8), nowMs = 1L)
    val cust = t(s, dir, "customer")
    gA.table("cust").mutate(
      CellCodec.encode(cust, "c", Seq("c_custkey")), nowMs = 1L)
    gA.snapshot("s1", "cust", nowMs = 2L)
    gA.exportSnapshot("s1", exp1)
    gA.table("cust").mutate(CellCodec.encode(
      cust.filter(col("c_custkey") < 50)
        .withColumn("c_custkey", col("c_custkey") + 10000000L),
      "c", Seq("c_custkey"), batchTs = 3L), nowMs = 3L)
    gA.snapshot("s2", "cust", nowMs = 4L)
    gA.exportSnapshot("s2", exp2, baseExportDir = Some(exp1))
    // the incremental target must hold ONLY the delta: no leaf of the
    // base export's layout may have been re-shipped
    val e1Leaves = new java.io.File(exp1).listFiles
      .filter(_.isDirectory).map(_.getName).toSet
    val e2Leaves = new java.io.File(exp2).listFiles
      .filter(_.isDirectory).map(_.getName).toSet
    require(e2Leaves.nonEmpty && (e2Leaves & e1Leaves).isEmpty,
      s"incremental export re-shipped base dirs: ${e2Leaves & e1Leaves}")
    val gB = graft.Graft(s, rootB)
    gB.importSnapshot("s2", exp2)
    val fsA = new org.apache.hadoop.fs.Path(rootA)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fsA.delete(new org.apache.hadoop.fs.Path(rootA), true)
    CellCodec.decode(ScanExec(gB.readSnapshot("s2"), Scan()), customerSchema)
      .orderBy("c_custkey")
  }

  private val bulkLoadScan = Q("bulk_load_scan", Some(s"""
    SELECT $customerCols FROM customer ORDER BY c_custkey""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val root = java.nio.file.Files.createTempDirectory("graft-q-bulk").toString
    val g = graft.Graft(s, root)
    g.createTable(TableDescriptor("cust", Seq(FamilyDescriptor("c")),
      splitKeys = 8), nowMs = 1L)
    // "prepared HFiles": cell parquet written outside the table, adopted
    // by reference (LoadIncrementalHFiles semantics — no rewrite)
    val prepared = s"$root/prepared"
    CellCodec.encode(t(s, dir, "customer"), "c", Seq("c_custkey"))
      .write.parquet(prepared)
    g.catalog.bulkLoad("cust", prepared, nowMs = 2L)
    CellCodec.decode(ScanExec(g.catalog.read("cust"), Scan()), customerSchema)
      .orderBy("c_custkey")
  }

  private val asofScan = Q("asof_scan", Some("""
    SELECT user_id, event_type, value FROM (
      SELECT user_id, event_type, value,
        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts <= TIMESTAMP '2024-02-01')
    WHERE rn = 1 ORDER BY user_id""")) { (s, dir) =>
    val resolved = ScanExec(eventsCells(s, dir), Scan().addFamily("e"),
      asOf = Some(nanosOf("2024-02-01")))
    CellCodec.decode(resolved, eventsValSchema, key = Seq("user_id" -> LongType))
      .orderBy("user_id")
  }

  // Gap-based sessionization over the events table (1-hour inactivity
  // gap): the canonical event-pipeline windowing op. One window pass:
  // session start = gap from previous event > threshold; sessions per
  // user = sum of starts.
  private val sessionizeOracleSql = """
    SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
      count(*) AS n_events FROM (
      SELECT user_id, CASE WHEN lag(ts) OVER w IS NULL
        OR ts - lag(ts) OVER w > INTERVAL '1 hour' THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    GROUP BY user_id ORDER BY user_id"""

  private val sessionize = Q("sessionize_events", Some(sessionizeOracleSql)) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    eventsNs(s, dir)
      .withColumn("_prev", lag("ts", 1).over(w)) // ts is epoch nanos
      .withColumn("new_s",
        when(col("_prev").isNull ||
          col("ts") - col("_prev") > 3600L * 1000000000L, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum("new_s").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  // STREAMING sessionization (StreamSessions.sessionize,
  // flatMapGroupsWithState: three longs of state per active user), same
  // oracle as sessionize_events. The corpus ships as one micro-batch
  // PLUS a per-user sentinel flush event gap+1ns past the corpus max:
  // the sentinel closes every real session (strict-> gap rule), while
  // its own 1-event session stays open in state and is never emitted —
  // so the emitted closed sessions aggregate to exactly the batch
  // query's (n_sessions, n_events).
  private val streamSessionize = Q("stream_sessionize",
      Some(sessionizeOracleSql)) { (s, dir) =>
    val gap = 3600L * 1000000000L
    val ev = eventsNs(s, dir)
    val mx = ev.agg(max(col("ts"))).head.getLong(0) // one scalar: fixture prep
    val work = java.nio.file.Files.createTempDirectory("graft-q-ssess").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))
    // the file-stream source lists top-level files and reads them with the
    // NORMALIZED (epoch-nanos long) schema, so the corpus is staged through
    // eventsNs rather than file-copied raw — the raw parquet's ts unit is
    // the writer's choice, not the stream's contract
    def stage(df: DataFrame, name: String): Unit = {
      val st = s"$work/stage_$name"
      df.coalesce(1).write.parquet(st)
      val part = new java.io.File(st).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$work/in/$name.parquet")): Unit
    }
    stage(ev, "events")
    stage(ev.select(col("user_id")).distinct()
      .select(lit(-1L).as("event_id"), lit(mx + gap + 1L).as("ts"),
        col("user_id"), lit("flush").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props")), "flush")
    val sessions = runDirStream(s, s"$work/in", ev.schema, work, "ssess")(
      stream => graft.streaming.StreamSessions.sessionize(
        stream, col("user_id"), col("ts"), col("event_id"), gap))
    sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .orderBy("user_id")
  }

  // EVENT-TIME streaming sessionization over OUT-OF-ORDER arrival
  // (StreamSessions.sessionizeEventTime): the corpus replays as two
  // micro-batches split by event_id parity — every user's timeline
  // interleaves across the two files, so cross-batch arrival is genuinely
  // out of event order — then a single watermark-driver event pushes the
  // watermark past every session's last+gap, sealing all real events and
  // event-time-closing every open tail. Watermark delay = the corpus's
  // full time span, so no real event is ever late-dropped: arrival order
  // is unconstrained and the emitted sessions must still aggregate to
  // exactly the batch query's result.
  private val streamSessionizeLate = Q("stream_sessionize_late",
      Some(sessionizeOracleSql)) { (s, dir) =>
    val gap = 3600L * 1000000000L
    val ev = eventsNs(s, dir)
    val b = ev.agg(min(col("ts")), max(col("ts"))).head // two scalars: fixture prep
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val delayMs = (mx - mn) / 1000000L + 1000L
    val work = java.nio.file.Files.createTempDirectory("graft-q-slate").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))
    def stage(df: DataFrame, name: String, mtimeMs: Long): Unit = {
      val st = s"$work/stage_$name"
      df.coalesce(1).write.parquet(st)
      val part = new java.io.File(st).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(s"$work/in/$name.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      // the file source orders by modification time (latestFirst=false);
      // explicit spaced mtimes pin the arrival sequence
      dst.toFile.setLastModified(mtimeMs): Unit
    }
    stage(ev.filter(col("event_id") % 2 === 1), "a", 1000000L)
    stage(ev.filter(col("event_id") % 2 === 0), "b", 2000000L)
    stage(ev.limit(1).select(lit(-1L).as("event_id"),
      lit(mx + gap + (delayMs + 100L) * 1000000L).as("ts"),
      lit(-1L).as("user_id"), lit("flush").as("event_type"),
      lit(0.0).as("value"), lit("{}").as("props")), "c", 3000000L)
    val sessions = runDirStreamSequenced(s, s"$work/in", ev.schema, work,
      "slate")(stream => graft.streaming.StreamSessions.sessionizeEventTime(
        stream, col("user_id"), col("ts"), col("event_id"), gap,
        java.time.Duration.ofMillis(delayMs)))
    sessions.filter(col("user_id") =!= -1L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .orderBy("user_id")
  }

  // JSON metadata extraction over the cell pipeline — the
  // props-parsing step every training-data pipeline has. The cell value
  // carries the raw JSON; extraction happens on the decoded view.
  private val jsonPropsAgg = Q("json_props_agg", Some("""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
      count(*) AS cnt
    FROM events GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
    val cells = eventsIdCells(s, dir)
    val decoded = CellCodec.decode(ScanExec(cells, Scan()),
      StructType(Seq(StructField("props", StringType))))
    decoded
      .select((get_json_object(col("props"), "$.k").cast(LongType) % 10).as("k_mod"))
      .groupBy("k_mod").agg(count(lit(1)).as("cnt"))
      .orderBy("k_mod")
  }

  // Pivoted Result-style family-map view over genuinely DYNAMIC
  // qualifiers (`Result.java:168,213` NavigableMap parity — SURVEY §1.6):
  // row = user, family "e" holds one qualifier PER EVENT TYPE the user
  // actually produced (different set per user — no fixed schema exists),
  // family "m" holds a fixed "n" total. The query reads the maps
  // themselves: entry count, qualifier-sorted "type=count" rendering via
  // map_entries (deterministic because decodeToMaps sorts entries), and a
  // point lookup into the second family's map. The oracle recomputes all
  // three from the relational source.
  private val resultFamilyMap = Q("result_family_map", Some("""
    SELECT user_id, n_quals, quals, total FROM (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_quals,
        string_agg(event_type || '=' || cnt, ',' ORDER BY event_type) AS quals,
        CAST(CAST(sum(cnt) AS VARCHAR) AS BIGINT) AS total
      FROM (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2)
      GROUP BY user_id)
    ORDER BY user_id""")) { (s, dir) =>
    val ev = eventsNs(s, dir)
    val counts = ev.groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
    val eCells = counts.select(
      CellCodec.rowKey(counts, Seq("user_id")).as("row"),
      lit("e").as("family"),
      col("event_type").cast(BinaryType).as("qualifier"),
      lit(1L).as("ts"),
      lit(graft.core.CellKind.Put).as("kind"),
      CellCodec.encodeValue(col("cnt"), LongType).as("value"),
      lit(0L).as("seq"))
    val totals = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
    val mCells = totals.select(
      CellCodec.rowKey(totals, Seq("user_id")).as("row"),
      lit("m").as("family"),
      lit("n").cast(BinaryType).as("qualifier"),
      lit(1L).as("ts"),
      lit(graft.core.CellKind.Put).as("kind"),
      CellCodec.encodeValue(col("n"), LongType).as("value"),
      lit(0L).as("seq"))
    // round-trip through the encode twin before reading: maps -> cells
    // (encodeFromMaps) -> maps again, so the oracle hash-verifies the
    // dynamic-qualifier WRITE path too, not just the pivoted read
    val maps = CellCodec.decodeToMaps(
      CellCodec.encodeFromMaps(
        CellCodec.decodeToMaps(eCells.unionByName(mCells), Seq("e", "m")),
        Seq("e", "m")),
      Seq("e", "m"))
    maps.select(
      Bytes.asLong(col("row")).as("user_id"),
      size(col("e")).cast(LongType).as("n_quals"),
      concat_ws(",", transform(map_entries(col("e")), ent =>
        concat(ent.getField("key").cast(StringType), lit("="),
          Bytes.asLong(ent.getField("value")).cast(StringType)))).as("quals"),
      Bytes.asLong(element_at(col("m"), lit("n").cast(BinaryType))).as("total"))
      .orderBy("user_id")
  }

  // COLLIDING qualifier names across families — the case `decode`'s
  // single-family scoping documents (`CellCodec.scala` map-key-collision
  // note) and the family-map view exists to serve: families "a" and "b"
  // both carry one qualifier PER EVENT TYPE (identical names), with
  // different payloads (count vs min event id). The round trip
  // maps -> encodeFromMaps -> decodeToMaps must keep each family's
  // entries on its own side of the collision, and the rendered maps
  // must both match the oracle's per-family recomputation.
  private val familyMapCollision = Q("family_map_collision", Some("""
    SELECT user_id, quals_a, quals_b FROM (
      SELECT user_id,
        string_agg(event_type || '=' || cnt, ',' ORDER BY event_type) AS quals_a,
        string_agg(event_type || '=' || mid, ',' ORDER BY event_type) AS quals_b
      FROM (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt,
              CAST(min(event_id) AS BIGINT) AS mid
            FROM events GROUP BY 1, 2)
      GROUP BY user_id)
    ORDER BY user_id""")) { (s, dir) =>
    val byType = eventsNs(s, dir).groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"), min("event_id").as("mid"))
    def famCells(fam: String, payload: Column): DataFrame = byType.select(
      CellCodec.rowKey(byType, Seq("user_id")).as("row"),
      lit(fam).as("family"),
      col("event_type").cast(BinaryType).as("qualifier"),
      lit(1L).as("ts"),
      lit(graft.core.CellKind.Put).as("kind"),
      CellCodec.encodeValue(payload, LongType).as("value"),
      lit(0L).as("seq"))
    val cells = famCells("a", col("cnt")).unionByName(famCells("b", col("mid")))
    val maps = CellCodec.decodeToMaps(
      CellCodec.encodeFromMaps(
        CellCodec.decodeToMaps(cells, Seq("a", "b")), Seq("a", "b")),
      Seq("a", "b"))
    def render(fam: String): Column =
      concat_ws(",", transform(map_entries(col(fam)), ent =>
        concat(ent.getField("key").cast(StringType), lit("="),
          Bytes.asLong(ent.getField("value")).cast(StringType))))
    maps.select(
      Bytes.asLong(col("row")).as("user_id"),
      render("a").as("quals_a"),
      render("b").as("quals_b"))
      .orderBy("user_id")
  }

  // ----------------------------------------------------------------------
  // Jobs + streaming (SURVEY §2.1 MR layer, §2.1 replication row).
  // ----------------------------------------------------------------------

  private val copyTableScan = Q("copy_table_window", Some("""
    SELECT user_id, event_type, value FROM (
      SELECT user_id, event_type, value,
        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-03-01')
    WHERE rn = 1 ORDER BY user_id""")) { (s, dir) =>
    val copied = graft.jobs.Jobs.copyTable(eventsCells(s, dir),
      startTime = Some(nanosOf("2024-01-05")), endTime = Some(nanosOf("2024-03-01")))
    CellCodec.decode(copied, eventsValSchema, key = Seq("user_id" -> LongType))
      .orderBy("user_id")
  }

  private val importTsvScan = Q("import_tsv_scan", Some("""
    SELECT CAST(c_custkey AS VARCHAR) AS rowkey, c_name, c_mktsegment
    FROM customer ORDER BY c_custkey""")) { (s, dir) =>
    // Round-trip: customer -> TSV file -> ImportTsv column-spec ingestion
    // -> cell table -> scan. The oracle is the source table itself.
    val work = java.nio.file.Files.createTempDirectory("graft-q-tsv").toString
    t(s, dir, "customer")
      .select(col("c_custkey").cast(StringType), col("c_name"), col("c_mktsegment"))
      .write.mode("overwrite").option("sep", "\t").csv(s"$work/tsv")
    val (cells, bad) = graft.jobs.Jobs.importTsv(s, s"$work/tsv",
      Seq("HBASE_ROW_KEY", "c:c_name", "c:c_mktsegment"), ts = 1L)
    require(bad == 0L, s"unexpected bad TSV lines: $bad")
    CellCodec.decode(ScanExec(cells, Scan()),
      StructType(Seq(StructField("c_name", StringType),
        StructField("c_mktsegment", StringType))),
      key = Seq("rowkey" -> StringType))
      .withColumn("_k", col("rowkey").cast(LongType))
      .orderBy("_k").drop("_k")
  }

  // JSON-lines ingestion (Jobs.importJson — the document pipeline's
  // ImportTsv): documents -> JSONL -> schema-on-read ingest -> cell
  // table -> scan. A deliberately corrupt line and a keyless line are
  // appended and must be COUNTED, not ingested; the oracle is the
  // source table (string-typed, as JSON ingestion is schema-on-read).
  private val importJsonScan = Q("import_json_scan", Some("""
    SELECT CAST(doc_id AS VARCHAR) AS rowkey, lang, source,
      CAST(n_chars AS VARCHAR) AS n_chars
    FROM documents ORDER BY CAST(rowkey AS BIGINT)""")) { (s, dir) =>
    val work = java.nio.file.Files.createTempDirectory("graft-q-json").toString
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").json(s"$work/json")
    // two bad lines: unparseable JSON, and a parseable object with no key
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$work/json/zz_bad.json"),
      "{not json at all\n{\"lang\": \"xx\", \"source\": \"orphan\"}\n"
        .getBytes("UTF-8"))
    val (cells, bad) = graft.jobs.Jobs.importJson(
      s, s"$work/json", family = "d", rowKeyField = "doc_id", ts = 1L)
    require(bad == 2L, s"expected 2 bad JSON lines, counted $bad")
    CellCodec.decode(ScanExec(cells, Scan()),
      StructType(Seq(StructField("lang", StringType),
        StructField("source", StringType),
        StructField("n_chars", StringType))),
      key = Seq("rowkey" -> StringType))
      .withColumn("_k", col("rowkey").cast(LongType))
      .orderBy("_k").drop("_k")
  }

  // MultiTableOutputFormat (`MultiTableOutputFormat.java:58`): ONE cell
  // frame carrying a table-name column routes into two catalog tables in
  // a single `Jobs.multiTableWrite` call; the gate scans BOTH tables back
  // and re-labels each row with its table, so a row landing in the wrong
  // table, a lost slice, or a routing dup all break the oracle, which
  // recomputes the per-table content relationally from events.
  private val multiTableWriteQ = Q("multi_table_write", Some("""
    SELECT tbl, user_id, cnt FROM (
      SELECT CASE WHEN event_type IN ('click', 'view') THEN 'hot'
                  ELSE 'cold' END AS tbl,
             user_id, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2)
    ORDER BY tbl, user_id""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val root = java.nio.file.Files.createTempDirectory("graft-q-mtw").toString
    val g = graft.Graft(s, root)
    Seq("hot", "cold").foreach(tn =>
      g.createTable(TableDescriptor(tn, Seq(FamilyDescriptor("c")),
        splitKeys = 4), nowMs = 1L))
    val agg = eventsNs(s, dir)
      .groupBy(when(col("event_type").isin("click", "view"), "hot")
        .otherwise("cold").as("_tbl"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    val cells = agg.select(
      col("_tbl"),
      CellCodec.rowKey(agg, Seq("user_id")).as("row"),
      lit("c").as("family"),
      lit("cnt").cast(BinaryType).as("qualifier"),
      lit(1L).as("ts"),
      lit(graft.core.CellKind.Put).as("kind"),
      CellCodec.encodeValue(col("cnt"), LongType).as("value"),
      lit(0L).as("seq"))
    val routed = graft.jobs.Jobs.multiTableWrite(g, cells, "_tbl", nowMs = 2L)
    require(routed.sorted == Seq("cold", "hot"), s"unexpected routing: $routed")
    Seq("cold", "hot").map { tn =>
      CellCodec.decode(g.table(tn).scan(Scan()),
        StructType(Seq(StructField("cnt", LongType))),
        key = Seq("user_id" -> LongType))
        .withColumn("tbl", lit(tn))
    }.reduce(_ unionByName _)
      .select("tbl", "user_id", "cnt")
      .orderBy("tbl", "user_id")
  }

  // Watermarked event-time windowed aggregation over a table's OWN change
  // feed (Structured Streaming end-to-end in the gate, not just specs):
  // daily edit counts per family, AvailableNow over the append history,
  // complete-mode memory sink. The feed ships in one micro-batch
  // (maxFilesPerTrigger above the file count), so the advancing watermark
  // cannot drop replayed history mid-run and the batch SQL oracle applies
  // exactly: each event encodes to 4 cells (user_id/ts/event_id/
  // event_type qualifiers), so edits = 4 * events per day.
  private val streamWindowAgg = Q("stream_window_agg", Some("""
    SELECT epoch_ms(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS window_ms,
      'e' AS family, 4 * count(*) AS edits
    FROM events GROUP BY 1 ORDER BY window_ms""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val work = java.nio.file.Files.createTempDirectory("graft-q-winagg").toString
    val src = graft.Graft(s, s"$work/src")
    src.createTable(TableDescriptor("t", Seq(FamilyDescriptor("e")), splitKeys = 8), 1L)
    val ev = eventsNs(s, dir).select("user_id", "ts", "event_id", "event_type")
    src.table("t").mutate(
      CellCodec.encode(ev, "e", Seq("user_id"),
        tsCol = Some(col("ts")), seqCol = Some(col("event_id"))), nowMs = 1L)
    val feed = graft.streaming.Replication.tableChangeFeed(
      s, s"$work/src", "t", maxFilesPerTrigger = 100000)
    val windowed = graft.streaming.Replication
      .windowedEditCounts(feed, "1 day", "1 hour", tsDivisorToMillis = 1000000L)
      .select(unix_millis(col("window_start")).as("window_ms"),
        col("family"), col("edits"))
    val sink = s"winagg_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = windowed.writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // a hung stream (corrupt checkpoint etc.) must fail THIS query, not
    // wedge the whole battery — and must be STOPPED, not left running
    // (and holding threads/state) alongside every later query
    if (!q.awaitTermination(600000L)) {
      q.stop()
      throw new IllegalStateException("stream_window_agg timed out")
    }
    s.table(sink).orderBy("window_ms")
  }

  // As-of join: for each 'click' event, the SAME user's latest 'purchase'
  // at-or-before the click — the generalized `getRowKeyAtOrBefore`
  // (`hbase/regionserver/Store.java:980`) as a relational join. Both sides
  // come from the events timeline, so matches exist by construction (the
  // r06 fixture joined 1990s order dates against 2024 events and passed
  // vacuously on 0 rows). Deterministic: the corpus has no duplicate
  // (user_id, ts), so each probe's max-ts match is unique. DuckDB's
  // native ASOF JOIN is the oracle (inner, >= semantics, picks max ts).
  private val asOfJoinQ = Q("as_of_join", Some("""
    SELECT probe_id, user_id, match_id FROM (
      SELECT l.event_id AS probe_id, l.user_id AS user_id,
        r.event_id AS match_id
      FROM (SELECT * FROM events WHERE event_type = 'click') l
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        ON l.user_id = r.user_id AND l.ts >= r.ts)
    ORDER BY probe_id""")) { (s, dir) =>
    val ev = eventsNs(s, dir) // ts already epoch-nanos long on both sides
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("probe_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("match_id"),
        col("ts"))
    graft.jobs.Jobs.asOfJoin(
      clicks, purchases,
      leftKey = col("user_id"), rightKey = col("p_user"),
      leftTs = col("ts"), rightTs = col("ts"),
      payloadCols = Seq("match_id"))
      .filter(col("match_id").isNotNull) // ASOF JOIN is inner: drop no-match rows
      .select("probe_id", "user_id", "match_id")
      .orderBy("probe_id")
  }

  // Stream-static enrichment: the events firehose joined per-micro-batch
  // against the customer dimension (broadcast — the stream side never
  // shuffles). Stateless streaming: no watermark, no state store; the
  // oracle is the plain batch join, which stream-static semantics must
  // equal exactly for an append-only source.
  private val streamEnrich = Q("stream_enrich", Some("""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment, e.value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    ORDER BY event_id""")) { (s, dir) =>
    val dim = t(s, dir, "customer")
      .select("c_custkey", "c_name", "c_mktsegment")
    runFileStream(s, s"$dir/events.parquet", "senr")(stream =>
      graft.streaming.StreamEnrich.enrich(
        stream, dim, col("user_id"), col("c_custkey"))
        .select("event_id", "user_id", "c_name", "c_mktsegment", "value"))
      .orderBy("event_id")
  }

  // Interval (point-in-range) join — the time-window companion of the
  // as-of join: every click inside the 1-hour window opened by a purchase
  // of the same user. The Spark side runs the BINNED equi-join
  // formulation (Jobs.intervalJoin: hot keys split across (key, bin)
  // shuffle partitions, no per-key quadratic residual), the oracle is the
  // plain range predicate — value equality proves the binning rewrite
  // changes nothing. binWidth = the window length (24h): each purchase
  // explodes to at most 2 bins. (24h gives 84 pairs at sf0.001 / 922 at
  // sf0.01 — dense enough that a boundary or binning drift shows.)
  private val intervalJoinQ = Q("interval_join", bench = true, oracle = Some("""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 24 HOUR
    ORDER BY click_id, purchase_id""")) { (s, dir) =>
    val winNs = 24L * 3600L * 1000000000L
    val ev = eventsNs(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withColumn("p_end", col("p_ts") + winNs)
    graft.jobs.Jobs.intervalJoin(clicks, purchases,
      leftKey = col("user_id"), rightKey = col("p_user"),
      leftTs = col("ts"), rightStart = col("p_ts"), rightEnd = col("p_end"),
      binWidth = winNs)
      .select(col("_l.click_id").as("click_id"),
        col("_r.purchase_id").as("purchase_id"))
      .orderBy("click_id", "purchase_id")
  }

  // STREAMING event-time as-of join — the streaming face of the
  // reference's closest-row-before lookup (Jobs.asOfJoin's twin; Spark's
  // built-in stream-stream joins cannot express "latest before", so this
  // is the custom-state seam). Same fixture and DuckDB ASOF JOIN oracle
  // as the batch `as_of_join` gate: the two execution models must
  // produce the identical match set. Two far-future sentinel PURCHASE
  // batches drive the watermark past every real event so all lefts seal
  // (rights emit nothing; the sentinel key is filtered defensively).
  private val streamAsofJoin = Q("stream_asof_join", Some("""
    SELECT probe_id, user_id, match_id FROM (
      SELECT l.event_id AS probe_id, l.user_id AS user_id,
        r.event_id AS match_id
      FROM (SELECT * FROM events WHERE event_type = 'click') l
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        ON l.user_id = r.user_id AND l.ts >= r.ts)
    ORDER BY probe_id""")) { (s, dir) =>
    val ev = eventsNs(s, dir).select("event_id", "user_id", "event_type", "ts")
    val sentKey = 888888888L
    def sentinel(tsNs: Long) = s.range(1).select(
      lit(sentKey).as("event_id"), lit(sentKey).as("user_id"),
      lit("purchase").as("event_type"), lit(tsNs).as("ts"))
    val y2100 = 4102444800L * 1000000000L
    val work = java.nio.file.Files.createTempDirectory("graft-q-sasof").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))
    stageBatch(work, ev, "a", 1000000L)
    stageBatch(work, sentinel(y2100), "b", 2000000L)
    stageBatch(work, sentinel(y2100 + 3600L * 1000000000L), "c", 3000000L)
    runDirStreamSequenced(s, s"$work/in", ev.schema, work, "sasof") { stream =>
      val clicks = stream.filter(col("event_type") === "click")
      val purchases = stream.filter(col("event_type") === "purchase")
      graft.streaming.StreamJoin.asOfJoinEventTime(
        clicks, purchases,
        leftKey = col("user_id"), rightKey = col("user_id"),
        leftTs = col("ts"), rightTs = col("ts"),
        leftId = col("event_id"), rightId = col("event_id"),
        watermarkDelay = java.time.Duration.ofHours(1))
    }
      .filter(col("match_id").isNotNull && col("key") =!= sentKey)
      .select(col("left_id").as("probe_id"), col("key").as("user_id"),
        col("match_id"))
      .orderBy("probe_id")
  }

  // STREAM-STREAM event-time interval join — both sides unbounded (two
  // filtered branches of the event stream), matches inside the 24h
  // purchase window, state bounded by watermark + the range condition.
  // Same oracle as the batch `interval_join`: the two execution models
  // must produce the identical pair set.
  private val streamIntervalJoin = Q("stream_interval_join", Some("""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 24 HOUR
    ORDER BY click_id, purchase_id""")) { (s, dir) =>
    val ev = eventsNs(s, dir).select("event_id", "user_id", "event_type", "ts")
    val work = java.nio.file.Files.createTempDirectory("graft-q-ssij").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))
    stageBatch(work, ev, "a", 1000000L)
    runDirStream(s, s"$work/in", ev.schema, work, "ssij") { stream =>
      val clicks = stream.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val purchases = stream.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      graft.streaming.StreamJoin.intervalJoin(clicks, purchases,
        col("user_id"), col("p_user"), col("ts"), col("p_ts"),
        window = java.time.Duration.ofHours(24),
        watermarkDelay = java.time.Duration.ofHours(1))
        .select("click_id", "purchase_id")
    }.orderBy("click_id", "purchase_id")
  }

  private val replicationStream = Q("replication_stream", Some("""
    SELECT user_id, event_type, value FROM (
      SELECT user_id, event_type, value,
        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1 ORDER BY user_id""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val work = java.nio.file.Files.createTempDirectory("graft-q-repl").toString
    // The SOURCE is a real catalog table; its own append history is the
    // change feed (tableChangeFeed tails data-* — the WAL analog). No
    // parallel feed dir, no double-publish.
    val src = graft.Graft(s, s"$work/src")
    src.createTable(TableDescriptor("t", Seq(FamilyDescriptor("e")), splitKeys = 8), 1L)
    src.table("t").mutate(eventsCells(s, dir), nowMs = 1L)
    val peer = graft.Graft(s, s"$work/peer")
    peer.createTable(TableDescriptor("t", Seq(FamilyDescriptor("e")), splitKeys = 8), 1L)
    graft.streaming.Replication.replicate(
      graft.streaming.Replication.tableChangeFeed(s, s"$work/src", "t"),
      peer.catalog, "t", s"$work/ckpt", nowMsOf = _ + 10L).awaitTermination()
    CellCodec.decode(ScanExec(peer.catalog.read("t"), Scan()), eventsValSchema,
      key = Seq("user_id" -> LongType))
      .orderBy("user_id")
  }

  // STREAMING index maintenance: the secondary index kept current from
  // the table's own change feed — the per-cell index transform runs ON
  // the CDC stream (indexCells is a filter+select, streaming-safe) and
  // lands in the index table via the replication sink. The source gets
  // two appends (initial load + a custkey reassignment), so the index
  // holds entries under both old and new values; the post-stream lookup
  // must return rows by their CURRENT custkey only (verified read), and
  // the oracle recomputes the final state relationally.
  private val streamIndexMaintain = Q("stream_index_maintain", Some(s"""
    SELECT $ordersCols FROM (
      SELECT o_orderkey,
        CASE WHEN o_orderkey < 100 THEN 999999 ELSE o_custkey END
          AS o_custkey,
        o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders)
    WHERE o_custkey IN (999999, 37)
    ORDER BY o_orderkey""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val work = java.nio.file.Files.createTempDirectory("graft-q-sidx").toString
    val custQ = Bytes.toBytes("o_custkey")
    val src = graft.Graft(s, s"$work/src")
    src.createTable(TableDescriptor("t", Seq(FamilyDescriptor("o")),
      splitKeys = 8), 1L)
    val orders = t(s, dir, "orders")
    src.table("t").mutate(
      CellCodec.encode(orders, "o", Seq("o_orderkey")), nowMs = 1L)
    src.table("t").mutate(CellCodec.encode(
      orders.filter(col("o_orderkey") < 100)
        .withColumn("o_custkey", lit(999999L)),
      "o", Seq("o_orderkey"), batchTs = 2L), nowMs = 2L)
    val idx = graft.Graft(s, s"$work/idx")
    idx.createTable(TableDescriptor("idx",
      Seq(FamilyDescriptor(SecondaryIndex.IndexFamily)), splitKeys = 8), 1L)
    graft.streaming.Replication.replicate(
      SecondaryIndex.indexCells(
        graft.streaming.Replication.tableChangeFeed(s, s"$work/src", "t"),
        "o", custQ),
      idx.catalog, "idx", s"$work/ckpt", nowMsOf = _ + 10L).awaitTermination()
    val hit = SecondaryIndex.lookupAll(src.table("t").cells,
      idx.catalog.read("idx"), "o", custQ,
      Seq(999999L, 37L).map(Bytes.toBytes))
    CellCodec.decode(hit, ordersSchema).orderBy("o_orderkey")
  }

  // STREAMING read of the WIDE view: the append feed decoded to
  // relational UPSERT rows (GraftWideMicroBatchStream — per-file
  // assembly over the sorted committed layout, no shuffle, no state).
  // The source gets an initial load plus a partial update batch; the
  // feed must ship one full-row upsert per customer and one
  // segment-only upsert (untouched columns NULL — a change feed, not
  // resolved state) per updated key. Oracle = the same union,
  // recomputed relationally.
  private val streamWideFeed = Q("stream_wide_feed", Some("""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
    UNION ALL
    SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name,
           CAST(NULL AS INTEGER) AS c_nationkey,
           CAST(NULL AS DOUBLE) AS c_acctbal, 'UPDATED' AS c_mktsegment
    FROM customer WHERE c_custkey < 300
    ORDER BY c_custkey, c_mktsegment""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val work = java.nio.file.Files.createTempDirectory("graft-q-widefeed").toString
    val g = graft.Graft(s, s"$work/src")
    // TWO families: each initial row's cells split across sibling
    // per-family files, so the feed's assembly must merge them back into
    // ONE upsert (the k-way group merge, exercised at oracle scale)
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("c"), FamilyDescriptor("d")),
      splitKeys = 8, wideKey = Some("c_custkey:long"),
      wideSchema = Some("c:c_name:string;c:c_nationkey:int;" +
        "d:c_acctbal:double;d:c_mktsegment:string")), 1L)
    val cust = t(s, dir, "customer")
    g.table("t").mutate(
      CellCodec.encode(cust.select("c_custkey", "c_name", "c_nationkey"),
        "c", Seq("c_custkey")).unionByName(
        CellCodec.encode(cust.select("c_custkey", "c_acctbal", "c_mktsegment"),
          "d", Seq("c_custkey"))), nowMs = 1L)
    g.table("t").mutate(CellCodec.encode(
      cust.filter(col("c_custkey") < 300)
        .select(col("c_custkey"), lit("UPDATED").as("c_mktsegment")),
      "d", Seq("c_custkey"), batchTs = 2L), nowMs = 2L)
    s.conf.set("spark.sql.catalog.graft_wf",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wf.root", s"$work/src")
    val q = s.readStream.table("graft_wf.`t$wide`")
      .writeStream.format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(s"$work/out")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .orderBy("c_custkey", "c_mktsegment")
  }

  // The wide change feed WITH delete markers (withDeletes): a whole-row
  // delete (DeleteFamily in every declared family, no Put) ships as one
  // all-null marker row — unambiguous because upserts always carry >= 1
  // non-null column. Three versions: full load, a partial update, a
  // range delete; the feed must be exactly load-upserts ∪
  // update-upserts ∪ markers. Oracle = the same union relationally.
  private val streamWideDeletes = Q("stream_wide_deletes", Some("""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
    UNION ALL
    SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name,
           CAST(NULL AS INTEGER) AS c_nationkey,
           CAST(NULL AS DOUBLE) AS c_acctbal, 'X' AS c_mktsegment
    FROM customer WHERE c_custkey >= 300 AND c_custkey < 600
    UNION ALL
    SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name,
           CAST(NULL AS INTEGER) AS c_nationkey,
           CAST(NULL AS DOUBLE) AS c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment
    FROM customer WHERE c_custkey < 300
    ORDER BY c_custkey, c_mktsegment""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val work = java.nio.file.Files.createTempDirectory("graft-q-widedel").toString
    val g = graft.Graft(s, s"$work/src")
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("c"), FamilyDescriptor("d")),
      splitKeys = 8, wideKey = Some("c_custkey:long"),
      wideSchema = Some("c:c_name:string;c:c_nationkey:int;" +
        "d:c_acctbal:double;d:c_mktsegment:string")), 1L)
    val cust = t(s, dir, "customer")
    g.table("t").mutate(
      CellCodec.encode(cust.select("c_custkey", "c_name", "c_nationkey"),
        "c", Seq("c_custkey")).unionByName(
        CellCodec.encode(cust.select("c_custkey", "c_acctbal", "c_mktsegment"),
          "d", Seq("c_custkey"))), nowMs = 1L)
    g.table("t").mutate(CellCodec.encode(
      cust.filter(col("c_custkey") >= 300 && col("c_custkey") < 600)
        .select(col("c_custkey"), lit("X").as("c_mktsegment")),
      "d", Seq("c_custkey"), batchTs = 2L), nowMs = 2L)
    s.conf.set("spark.sql.catalog.graft_wd",
      classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wd.root", s"$work/src")
    // whole-row range delete THROUGH the wide view's metadata-DELETE
    // path — one DeleteFamily per (row, declared family), the exact
    // shape the feed's marker contract keys on
    s.sql("DELETE FROM graft_wd.`t$wide` WHERE c_custkey < 300")
    val q = s.readStream.option("withDeletes", "true")
      .table("graft_wd.`t$wide`")
      .writeStream.format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(s"$work/out")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .orderBy("c_custkey", "c_mktsegment")
  }

  // Flush-triggered maintenance on a streaming sink: the change feed is
  // throttled to 2 files/trigger so the replay arrives as MANY small
  // micro-batches; replicateMaintained folds the accumulating tail via the
  // size-ratio minor-compaction check after each commit and (keepVersions)
  // prunes+vacuums released history. The verifying scan must see the same
  // latest-state view as a plain replicate — maintenance is invisible to
  // readers. Oracle = latest cell per user_id, same as replication_stream.
  private val streamAutoCompact = Q("stream_auto_compact", Some("""
    SELECT user_id, event_type, value FROM (
      SELECT user_id, event_type, value,
        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1 ORDER BY user_id""")) { (s, dir) =>
    import graft.catalog.{FamilyDescriptor, TableDescriptor}
    val work = java.nio.file.Files.createTempDirectory("graft-q-autoc").toString
    val src = graft.Graft(s, s"$work/src")
    src.createTable(TableDescriptor("t", Seq(FamilyDescriptor("e")), splitKeys = 8), 1L)
    src.table("t").mutate(eventsCells(s, dir), nowMs = 1L)
    val peer = graft.Graft(s, s"$work/peer")
    peer.createTable(TableDescriptor("t", Seq(FamilyDescriptor("e")), splitKeys = 8), 1L)
    graft.streaming.Replication.replicateMaintained(
      graft.streaming.Replication.tableChangeFeed(s, s"$work/src", "t",
        maxFilesPerTrigger = 2),
      peer.table("t"), s"$work/ckpt", nowMsOf = _ + 10L,
      minBatches = 3, keepVersions = 2).awaitTermination()
    CellCodec.decode(ScanExec(peer.catalog.read("t"), Scan()), eventsValSchema,
      key = Seq("user_id" -> LongType))
      .orderBy("user_id")
  }

  // ----------------------------------------------------------------------
  // Training-data pipeline (dedup / similarity / text / multimodal) over
  // the documents + embeddings tables. Oracles recompute the operator in
  // DuckDB SQL where the arithmetic can be made engine-identical; the
  // hash-based ops (simhash, langid profiles) get rows-only checks.
  // ----------------------------------------------------------------------

  private val duckToks =
    "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"
  private val duckShingles = s"""
    (SELECT doc_id, list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
       for i in generate_series(1, len(ts)-2)]) AS sg
     FROM (SELECT doc_id, $duckToks AS ts FROM documents))"""

  private val dedupExact = Q("dedup_exact", Some("""
    SELECT doc_id, text FROM documents
    WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
    ORDER BY doc_id""")) { (s, dir) =>
    Dedup.keepFirst(t(s, dir, "documents"), col("text"), "doc_id")
      .select("doc_id", "text").orderBy("doc_id")
  }

  // Canonical-key dedup: the normalization primitive feeding the exact
  // dedup path. Every pair of rows (2k, 2k+1) spells the SAME word two
  // ways — composed é on even ids, e + combining acute (chr(769)) on odd
  // — so byte-exact grouping sees two distinct documents while grouping
  // by canonicalFold collapses each pair to its min id. The oracle
  // rebuilds the canonical key with DuckDB's independent
  // nfc_normalize/strip_accents stack.
  private val dedupCanonical = Q("dedup_canonical", Some(s"""
    WITH spelled AS (
      SELECT doc_id, strip_accents(lower(nfc_normalize('menu: ' ||
        CASE WHEN doc_id % 2 = 0 THEN 'café' ELSE 'cafe' || chr(769) END ||
        ' #' || CAST(doc_id // 2 AS VARCHAR)))) AS canon
      FROM documents)
    SELECT doc_id, canon FROM spelled
    WHERE doc_id IN (SELECT min(doc_id) FROM spelled GROUP BY canon)
    ORDER BY doc_id""")) { (s, dir) =>
    val spelled = t(s, dir, "documents").select(col("doc_id"),
      concat(lit("menu: "),
        when(col("doc_id") % 2 === 0, lit("café")).otherwise(lit("café")),
        lit(" #"), expr("doc_id div 2").cast(StringType)).as("spelled"))
    val keyed = spelled.withColumn("canon", Text.canonicalFold(col("spelled")))
    Dedup.keepFirst(keyed, col("canon"), "doc_id")
      .select("doc_id", "canon").orderBy("doc_id")
  }

  /** Replay one parquet file as a file-arrival stream through
    * `transform`, AvailableNow into a memory sink; returns the sink's
    * frame. The whole file ships as ONE micro-batch (maxFilesPerTrigger
    * far above the file count), which is what lets the streaming gates
    * reuse their batch oracles. Shared containment: a hung stream fails
    * ITS query and is STOPPED, never wedging the battery (the
    * stream_window_agg lesson; that gate keeps its own harness — cell
    * change-feed source, complete output mode — but the same timeout
    * rule). */
  private def runFileStream(s: SparkSession, inputFile: String,
      namePrefix: String)(transform: DataFrame => DataFrame): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory(s"graft-q-$namePrefix").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(inputFile),
      java.nio.file.Paths.get(
        s"$work/in/${java.nio.file.Paths.get(inputFile).getFileName}"))
    runDirStream(s, s"$work/in", s.read.parquet(inputFile).schema, work,
      namePrefix)(transform)
  }

  /** [[runFileStream]] over a PREPARED input dir (gates that need extra
    * fixture files — e.g. a sentinel flush batch — alongside the source
    * parquet build the dir themselves, then stream it as one batch). */
  // one file per micro-batch, oldest mtime first — the replay harness for
  // operators whose semantics depend on CROSS-batch arrival order
  private def runDirStreamSequenced(s: SparkSession, inDir: String,
      schema: org.apache.spark.sql.types.StructType, work: String,
      namePrefix: String)(transform: DataFrame => DataFrame): DataFrame =
    runDirStreamImpl(s, inDir, schema, work, namePrefix, filesPerTrigger = 1)(
      transform)

  /** Write `df` as ONE parquet file `$work/in/$name.parquet` with the given
    * mtime — the unit [[runDirStreamSequenced]] orders micro-batches by. */
  private def stageBatch(work: String, df: DataFrame, name: String,
      mtimeMs: Long): Unit = {
    val st = s"$work/stage_$name"
    df.coalesce(1).write.parquet(st)
    val part = new java.io.File(st).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = java.nio.file.Paths.get(s"$work/in/$name.parquet")
    java.nio.file.Files.move(part.toPath, dst)
    dst.toFile.setLastModified(mtimeMs): Unit
  }

  private def runDirStream(s: SparkSession, inDir: String,
      schema: org.apache.spark.sql.types.StructType, work: String,
      namePrefix: String)(transform: DataFrame => DataFrame): DataFrame =
    runDirStreamImpl(s, inDir, schema, work, namePrefix,
      filesPerTrigger = 100000)(transform)

  private def runDirStreamImpl(s: SparkSession, inDir: String,
      schema: org.apache.spark.sql.types.StructType, work: String,
      namePrefix: String, filesPerTrigger: Int)(
      transform: DataFrame => DataFrame): DataFrame = {
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger).parquet(inDir)
    val sink = s"${namePrefix}_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = transform(stream).writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(600000L)) {
      q.stop()
      throw new IllegalStateException(s"$namePrefix stream timed out")
    }
    s.table(sink)
  }

  // STREAMING exact dedup over a file-arrival stream of documents
  // (StreamDedup.firstSeen: flatMapGroupsWithState, one bit of state per
  // distinct key) — same oracle as dedup_exact because the whole corpus
  // ships in ONE micro-batch (see runFileStream), where firstSeen's
  // winner is the min doc_id of the key's first batch = the global min
  // the batch SQL computes. Keyed on md5(text), the documented at-scale
  // posture (16 bytes shuffled and stored, not the document): equivalent
  // to grouping by text itself absent md5 collisions. The stream emits
  // winner IDs only; text is joined back from the batch table after
  // termination.
  private val streamDedup = Q("stream_dedup", Some("""
    SELECT doc_id, text FROM documents
    WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
    ORDER BY doc_id""")) { (s, dir) =>
    val winners = runFileStream(s, s"$dir/documents.parquet", "sdedup")(
      stream => graft.streaming.StreamDedup.firstSeen(
        stream, key = md5(col("text")), id = col("doc_id")))
    t(s, dir, "documents")
      .join(winners.select(col("id").as("doc_id")), "doc_id")
      .select("doc_id", "text").orderBy("doc_id")
  }

  // CROSS-BATCH streaming dedup: the corpus (plus deterministically
  // INJECTED duplicates — the driver tables carry no duplicate texts,
  // which would make a dedup gate vacuous) replays as TWO sequenced
  // micro-batches split by doc_id parity, odds first. First-seen's
  // batch semantics is then driver-verified on its interesting branch:
  // texts whose ONLY odd member is a large injected id win with that id
  // even though a smaller even id arrives in batch 2 — the winner is
  // the min of the key's FIRST batch, NOT the global min (a single-batch
  // replay cannot distinguish the two rules). The oracle replays the
  // injection and the two-phase rule in SQL.
  private val streamDedupBatches = Q("stream_dedup_batches", Some("""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT 2000000 + 2*doc_id + 1, text FROM documents WHERE doc_id % 6 = 0
      UNION ALL SELECT 2000000 + 2*doc_id, text FROM documents WHERE doc_id % 6 = 3)
    SELECT doc_id, text FROM corpus
    WHERE doc_id IN (
      SELECT CASE WHEN count(*) FILTER (WHERE doc_id % 2 = 1) > 0
                  THEN min(doc_id) FILTER (WHERE doc_id % 2 = 1)
                  ELSE min(doc_id) END
      FROM corpus GROUP BY text)
    ORDER BY doc_id""")) { (s, dir) =>
    val docs = t(s, dir, "documents").select("doc_id", "text")
    // injected duplicates: %6=0 texts gain a LARGE odd twin (first-batch
    // rule must pick it over the smaller even original); %6=3 texts gain
    // a large even twin (control: the odd original stays the winner)
    val corpus = docs
      .unionByName(docs.filter(col("doc_id") % 6 === 0)
        .select((lit(2000000L) + col("doc_id") * 2 + 1).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") % 6 === 3)
        .select((lit(2000000L) + col("doc_id") * 2).as("doc_id"), col("text")))
    val work = java.nio.file.Files.createTempDirectory("graft-q-sdb").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))
    stageBatch(work, corpus.filter(col("doc_id") % 2 === 1), "a", 1000000L)
    stageBatch(work, corpus.filter(col("doc_id") % 2 === 0), "b", 2000000L)
    val winners = runDirStreamSequenced(s, s"$work/in", corpus.schema, work,
      "sdb")(stream => graft.streaming.StreamDedup.firstSeen(
        stream, key = md5(col("text")), id = col("doc_id")))
    corpus.join(winners.select(col("id").as("doc_id")), "doc_id")
      .select("doc_id", "text").orderBy("doc_id")
  }

  // EVENT-time TTL streaming dedup (StreamDedup.firstSeenEventTime) over
  // THREE sequenced micro-batches. B1 seeds every doc with a parity-split
  // timeline (even docs at T0, odd at T0+20h); B2 is one fresh key whose
  // ts only drives the watermark; B3 re-sights every doc. Whether a B3
  // re-sighting re-emits is decided by the WATERMARK rule alone: after B1
  // the watermark is max(B1 ts) - delay = T0+19h, so even docs' deadlines
  // (T0 + ttl = T0+10h) have passed -> their timers fire in B2 (state
  // dropped, B3 re-emits with the NEW min id), while odd docs' deadlines
  // (T0+30h) have not (B3 suppresses). The oracle recomputes exactly that
  // rule in SQL — lastSeen per key, watermark from the global max, evict
  // iff lastSeen + ttl < watermark — so a semantics drift in eviction
  // timing (the clock the replay-determinism argument rests on) breaks
  // the hash, not just a count. Margins are hours (>= 1h) against the
  // engine's ms-floor watermark arithmetic and strict-vs-equal timer
  // comparisons.
  private val streamDedupEventTtl = Q("stream_dedup_event_ttl", Some("""
    WITH k AS (
      SELECT text, min(doc_id) AS win,
        max(1704067200000 + (doc_id % 2) * 72000000) AS last_ms,
        min(1000000 + doc_id) AS rewin
      FROM documents GROUP BY text),
    wm1 AS (SELECT max(last_ms) - 3600000 AS wm FROM k)
    SELECT id FROM (
      SELECT win AS id FROM k
      UNION ALL SELECT 1000000000 AS id
      UNION ALL SELECT rewin AS id FROM k, wm1 WHERE last_ms + 36000000 < wm1.wm)
    ORDER BY id""")) { (s, dir) =>
    val hourNs = 3600L * 1000000000L
    val t0 = graft.core.EventTime.nanosOf("2024-01-01") // 1704067200000 ms
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val b1 = docs.select(col("doc_id"), col("text"),
      (lit(t0) + (col("doc_id") % 2) * lit(20L * hourNs)).as("ts"))
    // fresh key, ts chosen to be NOT late vs the post-B1 watermark
    // (T0+19h) and to leave odd docs' deadlines (T0+30h) un-passed
    val b2 = s.range(1).select(lit(1000000000L).as("doc_id"),
      lit("~watermark-driver~").as("text"), lit(t0 + 30L * hourNs).as("ts"))
    val b3 = docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
      lit(t0 + 40L * hourNs).as("ts")) // >= post-B2 watermark: admitted
    val work = java.nio.file.Files.createTempDirectory("graft-q-sdet").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))
    stageBatch(work, b1, "a", 1000000L)
    stageBatch(work, b2, "b", 2000000L)
    stageBatch(work, b3, "c", 3000000L)
    val winners = runDirStreamSequenced(s, s"$work/in", b1.schema, work,
      "sdet")(stream => graft.streaming.StreamDedup.firstSeenEventTime(
        stream, key = md5(col("text")), id = col("doc_id"), ts = col("ts"),
        ttl = java.time.Duration.ofHours(10),
        watermarkDelay = java.time.Duration.ofHours(1)))
    winners.select("id").orderBy("id")
  }

  private val dedupFingerprint = Q("dedup_fingerprint", Some(s"""
    SELECT doc_id, md5(array_to_string(list_sort(list_distinct($duckToks)), ' ')) AS fp
    FROM documents
    WHERE doc_id IN (
      SELECT min(doc_id) FROM documents
      GROUP BY md5(array_to_string(list_sort(list_distinct($duckToks)), ' ')))
    ORDER BY doc_id""")) { (s, dir) =>
    val fp = Text.fingerprint(col("text"))
    Dedup.keepFirst(t(s, dir, "documents"), fp, "doc_id")
      .select(col("doc_id"), fp.as("fp")).orderBy("doc_id")
  }

  private val jaccardOracle = s"""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      len(list_intersect(a.sg, b.sg))::DOUBLE /
        (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) AS jaccard
    FROM $duckShingles a JOIN $duckShingles b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sg, b.sg))::DOUBLE /
        (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) >= 0.8
    ORDER BY id_a, id_b"""

  private val dedupNgramJaccard = Q("dedup_ngram_jaccard", Some(jaccardOracle),
    bench = true) { (s, dir) =>
    Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
      k = 3, threshold = 0.8).orderBy("id_a", "id_b")
  }

  private val dedupMinhashLsh = Q("dedup_minhash_lsh", Some(jaccardOracle),
    bench = true) { (s, dir) =>
    Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
      k = 3, threshold = 0.8).orderBy("id_a", "id_b")
  }

  // INCREMENTAL dedup — the crawl-pipeline shape: the kept corpus is
  // frozen (doc_id % 3 != 0 stands in for it), a fresh batch arrives
  // (doc_id % 3 == 0), and only batch docs unseen in the corpus AND first
  // of their content within the batch are admitted. The mod-3 split puts
  // the corpus copy of the generator's duplicate groups on one side and
  // batch re-sightings on the other, so both drop reasons fire. Exact
  // variant: md5 content keys both ways.
  private val dedupIncremental = Q("dedup_incremental", Some("""
    WITH inc AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
         corp AS (SELECT text FROM documents WHERE doc_id % 3 <> 0)
    SELECT doc_id, text FROM inc i
    WHERE doc_id IN (SELECT min(doc_id) FROM inc GROUP BY text)
      AND NOT EXISTS (SELECT 1 FROM corp c WHERE c.text = i.text)
    ORDER BY doc_id""")) { (s, dir) =>
    val docs = t(s, dir, "documents")
    Dedup.incrementalKeepNew(
      corpus = docs.filter(col("doc_id") % 3 =!= 0),
      incoming = docs.filter(col("doc_id") % 3 === 0),
      on = col("text"), idCol = "doc_id")
      .select("doc_id", "text").orderBy("doc_id")
  }

  // Near-dup variant of the incremental admit: a batch doc is dropped iff
  // it has a DIRECT Jaccard>=0.8 match in the corpus or among ANY earlier
  // (lower-id) batch docs — the order-free relational rule (see
  // Dedup.incrementalNearDupNew), exactly SQL-expressible, so the oracle
  // recomputes it with the same exact-Jaccard arithmetic as the proven
  // pair oracles. The Spark
  // side goes through the full LSH candidate path (band index on the
  // corpus, probe join, exact verification), so a recall hole or a broken
  // probe join surfaces as a kept-vs-dropped hash mismatch.
  private val dedupIncrementalNear = Q("dedup_incremental_near", bench = true,
    oracle = Some(s"""
    WITH sh AS $duckShingles,
         inc AS (SELECT doc_id, sg FROM sh WHERE doc_id % 3 = 0),
         corp AS (SELECT doc_id, sg FROM sh WHERE doc_id % 3 <> 0)
    SELECT i.doc_id FROM inc i
    WHERE NOT EXISTS (
        SELECT 1 FROM corp c
        WHERE len(list_intersect(i.sg, c.sg))::DOUBLE /
          (len(i.sg) + len(c.sg) - len(list_intersect(i.sg, c.sg))) >= 0.8)
      AND NOT EXISTS (
        SELECT 1 FROM inc p WHERE p.doc_id < i.doc_id
          AND len(list_intersect(i.sg, p.sg))::DOUBLE /
            (len(i.sg) + len(p.sg) - len(list_intersect(i.sg, p.sg))) >= 0.8)
    ORDER BY doc_id""")) { (s, dir) =>
    val docs = t(s, dir, "documents")
    Dedup.incrementalNearDupNew(
      corpus = docs.filter(col("doc_id") % 3 =!= 0),
      incoming = docs.filter(col("doc_id") % 3 === 0),
      idCol = "doc_id", textCol = "text", k = 3, threshold = 0.8)
      .select("doc_id").orderBy("doc_id")
  }

  // STREAMING near-dup over a file-arrival stream: shingle + MinHash
  // bands computed per arriving doc (narrow compiled expressions,
  // streaming-safe), candidate pairs emitted by per-bucket GroupState
  // (StreamDedup.lshCandidates), exact-Jaccard verification batch-side
  // after termination through the SAME verifyJaccard arithmetic as the
  // batch path. One micro-batch + an uncapped bucket bound makes the
  // candidate set equal the batch banded join's, so the batch minhash
  // oracle applies verbatim; across real incremental batches the
  // candidate set only grows (new docs probe all remembered ones).
  private val streamMinhashLsh = Q("stream_minhash_lsh",
    Some(jaccardOracle)) { (s, dir) =>
    val cands = runFileStream(s, s"$dir/documents.parquet", "slsh")(
      stream => graft.streaming.StreamDedup.lshCandidates(
        graft.pipeline.Text.withShingles(
          stream.select(col("doc_id"), col("text")), "text", 3),
        col("doc_id"),
        graft.functions.VectorFunctions.minHashBands(col("sh"), 32, 4),
        maxBucketSize = 1000000))
    // verification reuses the batch path's PERSISTED shingle frame
    // (verifyJaccard joins it twice — unpersisted, the full-corpus
    // regexp shingling pass would run once per join) and the batch
    // arithmetic, so emitted jaccard doubles are bit-identical
    val sh = Dedup.shingled(t(s, dir, "documents"), "doc_id", "text", k = 3)
    Dedup.verifyJaccard(cands.distinct(), sh, threshold = 0.8)
      .orderBy("id_a", "id_b")
  }

  // EVENT-time TTL for the streaming near-dup bucket state
  // (StreamDedup.lshCandidatesEventTime), made oracle-discriminating by a
  // GENERATION-crossing design: batch 1 streams the corpus (full banded
  // candidates -> the batch jaccard pairs), two watermark-driver batches
  // advance the data's clock past every batch-1 bucket's lastSeen+ttl
  // (their own buckets are sentinel values no minhash band can hit), and
  // batch 4 replays the SAME texts under offset ids. If eviction fires on
  // the watermark rule, batch-4 docs pair only among THEMSELVES -> the
  // verified output is exactly the jaccard pair set twice (original ids +
  // offset ids). If eviction does NOT fire (or fires on the wrong clock),
  // batch-4 docs also pair with the remembered batch-1 members -> CROSS-
  // generation pairs of the same text (jaccard 1.0) survive verification
  // and break rows+hash. If eviction over-fires (state dropped while the
  // deadline is live), batch-1 pairs themselves go missing. Candidate
  // recall is exact-verified through the same verifyJaccard arithmetic as
  // every LSH gate, so the oracle stays pure SQL on `documents`.
  private val streamLshEventTtl = Q("stream_lsh_event_ttl", Some(s"""
    WITH p AS ($jaccardOracle)
    SELECT id_a, id_b, jaccard FROM (
      SELECT id_a, id_b, jaccard FROM p
      UNION ALL SELECT id_a + 1000000, id_b + 1000000, jaccard FROM p)
    ORDER BY id_a, id_b""")) { (s, dir) =>
    val hourNs = 3600L * 1000000000L
    val t0 = graft.core.EventTime.nanosOf("2024-01-01")
    val docs = t(s, dir, "documents").select("doc_id", "text")
    def withBands(df: DataFrame): DataFrame =
      graft.pipeline.Text.withShingles(df, "text", 3)
        .select(col("doc_id"), graft.functions.VectorFunctions
          .minHashBands(col("sh"), 32, 4).as("bands"))
    val b1 = withBands(docs).withColumn("ts", lit(t0))
    // sentinel buckets (min over non-empty xxhash64 mins never lands on
    // Long.MinValue): drives the watermark without touching doc buckets
    val b2 = s.range(1).select(lit(2000000000L).as("doc_id"),
      array(lit(Long.MinValue)).as("bands"), lit(t0 + 30L * hourNs).as("ts"))
    val b3 = s.range(1).select(lit(2000000001L).as("doc_id"),
      array(lit(Long.MinValue + 1L)).as("bands"), lit(t0 + 40L * hourNs).as("ts"))
    val b4 = withBands(docs.select((col("doc_id") + 1000000L).as("doc_id"),
      col("text"))).withColumn("ts", lit(t0 + 50L * hourNs))
    val work = java.nio.file.Files.createTempDirectory("graft-q-slet").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))
    stageBatch(work, b1, "a", 1000000L)
    stageBatch(work, b2, "b", 2000000L)
    stageBatch(work, b3, "c", 3000000L)
    stageBatch(work, b4, "d", 4000000L)
    val cands = runDirStreamSequenced(s, s"$work/in", b1.schema, work,
      "slet")(stream => graft.streaming.StreamDedup.lshCandidatesEventTime(
        stream, col("doc_id"), col("bands"), col("ts"),
        ttl = java.time.Duration.ofHours(10),
        watermarkDelay = java.time.Duration.ofHours(1),
        maxBucketSize = 1000000))
    val both = docs.unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val sh2 = Dedup.shingled(both, "doc_id", "text", k = 3)
    Dedup.verifyJaccard(cands.distinct(), sh2, threshold = 0.8)
      .orderBy("id_a", "id_b")
  }

  // Near-dup clustering: connected components over the jaccard>=0.8 pair
  // graph; cluster id = min doc id of the component (singletons keep
  // their own id). Oracle: DuckDB recursive-CTE transitive closure over
  // the same pair set.
  private val dedupClusters = Q("dedup_clusters", Some(s"""
    WITH RECURSIVE
    sh AS (SELECT doc_id, list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
      for i in generate_series(1, len(ts)-2)]) AS sg
      FROM (SELECT doc_id, $duckToks AS ts FROM documents)),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sg, b.sg))::DOUBLE /
        (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) >= 0.8),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
    SELECT a AS id, min(b) AS cluster FROM reach GROUP BY a ORDER BY a""")) {
    (s, dir) =>
    val docs = t(s, dir, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3,
      threshold = 0.8)
    Dedup.connectedComponents(docs.select(col("doc_id").as("id")), pairs)
      .orderBy("id")
  }

  // From clusters to the SHIPPED corpus: drop every near-duplicate but
  // each cluster's min-id representative. Same candidate machinery as
  // dedup_clusters (MinHash-LSH at scale feeds the same pairs), one
  // extra semi-join.
  private val dedupKeepCanonical = Q("dedup_keep_canonical", Some(s"""
    WITH RECURSIVE
    sh AS (SELECT doc_id, list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
      for i in generate_series(1, len(ts)-2)]) AS sg
      FROM (SELECT doc_id, $duckToks AS ts FROM documents)),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sg, b.sg))::DOUBLE /
        (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) >= 0.8),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    lbl AS (SELECT a AS id, min(b) AS cluster FROM reach GROUP BY a)
    SELECT d.doc_id, d.n_chars FROM documents d
    JOIN lbl ON d.doc_id = lbl.id
    WHERE lbl.id = lbl.cluster ORDER BY d.doc_id""")) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3,
      threshold = 0.8)
    Dedup.keepCanonical(docs, "doc_id", pairs)
      .select("doc_id", "n_chars").orderBy("doc_id")
  }

  // WITHIN-document repeated-window removal: 2-token segments (the
  // window width that actually repeats inside this corpus's docs —
  // 181/500 reduce), first occurrence survives, position-ordered
  // reassembly — all per-row (zero shuffles). Oracle replays the
  // prefix-membership test with DuckDB's 1-based list comprehension
  // (both engines' position functions return 0 for absent).
  private val dedupWithinDoc = Q("dedup_within_doc", Some(s"""
    WITH segd AS (SELECT doc_id,
        [array_to_string(ts[i:least(i+1, len(ts))], ' ')
         for i in generate_series(1, greatest(len(ts), 1), 2)
         if len(ts) > 0] AS segs
      FROM (SELECT doc_id, $duckToks AS ts FROM documents)),
    k AS (SELECT doc_id, segs,
        [segs[i] for i in generate_series(1, len(segs))
         if list_position(segs[1:i-1], segs[i]) = 0] AS kept
      FROM segd)
    SELECT doc_id,
      coalesce(array_to_string(kept, ' '), '') AS text_deduped,
      CAST(len(segs) AS BIGINT) AS n_segments,
      CAST(len(kept) AS BIGINT) AS n_kept
    FROM k ORDER BY doc_id""")) { (s, dir) =>
    Text.dedupWithinDoc(t(s, dir, "documents"), "doc_id", "text",
      windowTokens = 2)
      .select("doc_id", "text_deduped", "n_segments", "n_kept")
      .orderBy("doc_id")
  }

  // Cluster selection with a QUALITY preference: per near-dup cluster
  // keep the member with the most characters (doc-id tie-break) instead
  // of the arbitrary min id — what curation actually ships. Same pair
  // machinery as dedup_clusters; the oracle re-runs the closure and
  // picks per-cluster argmax with the identical deterministic ordering.
  private val dedupKeepBest = Q("dedup_keep_best", Some(s"""
    WITH RECURSIVE
    sh AS (SELECT doc_id, list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
      for i in generate_series(1, len(ts)-2)]) AS sg
      FROM (SELECT doc_id, $duckToks AS ts FROM documents)),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sg, b.sg))::DOUBLE /
        (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) >= 0.8),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    lbl AS (SELECT a AS id, min(b) AS cluster FROM reach GROUP BY a),
    sel AS (SELECT d.doc_id, d.n_chars,
        row_number() OVER (PARTITION BY lbl.cluster
          ORDER BY d.n_chars DESC, d.doc_id) AS rn
      FROM documents d JOIN lbl ON d.doc_id = lbl.id)
    SELECT doc_id, n_chars FROM sel WHERE rn = 1 ORDER BY doc_id""")) {
    (s, dir) =>
    val docs = t(s, dir, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3,
      threshold = 0.8)
    Dedup.keepBest(docs, "doc_id", pairs, col("n_chars"))
      .select("doc_id", "n_chars").orderBy("doc_id")
  }

  // Winnowing (MOSS) fingerprints: the oracle replays char-8-gram
  // hashing and window-4 min selection in SQL (hashes are md5-derived
  // positive longs, identical on both engines; DuckDB list slices are
  // 1-based inclusive, matching Spark's slice(start, length=4)).
  private val dedupWinnowing = Q("dedup_winnowing", bench = true, oracle = Some("""
    WITH n AS (SELECT doc_id, regexp_replace(trim(text), '\s+', ' ', 'g') AS t
               FROM documents),
    g AS (SELECT doc_id,
            [CAST(('0x' || substring(md5(substring(t, i, 8)), 1, 14)) AS BIGINT)
             for i in generate_series(1, len(t) - 7)] AS hs
          FROM n),
    f AS (SELECT doc_id,
            CASE WHEN len(hs) >= 4 THEN
                   list_distinct([list_min(hs[i:i+3])
                                  for i in generate_series(1, len(hs) - 3)])
                 WHEN len(hs) >= 1 THEN [list_min(hs)]
                 ELSE [] END AS fps
          FROM g)
    SELECT doc_id AS id, unnest(fps) AS fp FROM f ORDER BY id, fp""")) { (s, dir) =>
    Dedup.winnowingFingerprints(t(s, dir, "documents"), "doc_id", "text",
      k = 8, window = 4)
      .orderBy("id", "fp")
  }

  // Exact duplicate-substring spans (ExactSubstr, Lee et al. 2022,
  // `Dedup.duplicateSpans`): every maximal >= 12-token span occurring
  // verbatim in MORE THAN ONE document, reduced to per-doc span count +
  // duplicated-token coverage. The oracle replays positional 12-grams,
  // cross-doc duplicate-gram detection (min(doc) <> max(doc)), and the
  // gaps-and-islands interval merge in SQL on the raw gram strings; the
  // Spark side detects duplicates on xxhash64 gram hashes and re-verifies
  // every candidate position on the actual string, so the two engines
  // agree exactly even though the corpus-wide pass only shuffles hashes.
  private val dedupSpanExact = Q("dedup_span_exact", bench = true, oracle = Some(s"""
    WITH toks AS (SELECT doc_id, $duckToks AS ts FROM documents),
    grams AS (
      SELECT doc_id, i AS pos, array_to_string(ts[i:i+11], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, greatest(len(ts) - 11, 0))) AS g(i)),
    dup AS (SELECT gram FROM grams GROUP BY gram
            HAVING min(doc_id) <> max(doc_id)),
    hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (gram)),
    lagged AS (SELECT doc_id, pos,
        lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM hits),
    isl AS (SELECT doc_id, pos,
        sum(CASE WHEN prev IS NULL OR pos - prev > 12 THEN 1 ELSE 0 END)
          OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM lagged),
    spans AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 11 AS e
              FROM isl GROUP BY 1, 2)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
    FROM spans GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
    Dedup.duplicateSpans(t(s, dir, "documents"), "doc_id", "text", k = 12)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  // Boilerplate spans: per-document fraction of winnowing fingerprints
  // shared by >= 2 documents (span-level repetition, the complement of
  // whole-doc dedup). The oracle replays the winnowing CTE (same md5
  // gram hash as dedup_winnowing), counts fingerprint doc-frequency,
  // and recomputes each doc's common-fingerprint fraction.
  // BM25 retrieval over the corpus (Text.bm25) with the
  // Robertson/Sparck-Jones ODDS idf — the log-free rational form, so the
  // oracle replays every term contribution bit-for-bit (ln differs in
  // the last ulp across engines; the standard log-idf variant is
  // spec-asserted instead). Contributions quantize to the 2^-20 grid
  // and accumulate as LONGS (order-independent — a raw double sum's
  // value depends on partial-aggregate combine order), so the per-doc
  // score is exact on both sides. The SQL mirrors the Spark expression
  // tree operation for operation.
  private val bm25OracleSql = s"""
    WITH toks AS (
      SELECT doc_id, unnest($duckToks) AS t FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    tf AS (SELECT doc_id, t, count(*) AS tf FROM toks
           WHERE t IN ('spark', 'table', 'row') GROUP BY doc_id, t),
    dfreq AS (SELECT t, count(*) AS dfreq FROM tf GROUP BY t),
    stats AS (SELECT count(*) AS n_docs,
      CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
    contrib AS (
      SELECT tf.doc_id,
        CAST(floor(((n_docs - dfreq + 0.5) / (dfreq + 0.5)) *
          ((tf * (1.2 + 1)) /
            (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) * 1048576.0 + 0.5)
          AS BIGINT) AS q
      FROM tf JOIN dfreq USING (t) JOIN dl USING (doc_id) CROSS JOIN stats),
    scored AS (SELECT doc_id, sum(q) / 1048576.0 AS score
               FROM contrib GROUP BY doc_id)
    SELECT doc_id, score, rank FROM (
      SELECT doc_id, score,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored)
    WHERE rank <= 50 ORDER BY rank"""

  private val rsjIdf: (Column, Column) => Column =
    (dfreq, nDocs) => (nDocs - dfreq + 0.5) / (dfreq + 0.5)

  private val textBm25 = Q("text_bm25", Some(bm25OracleSql)) { (s, dir) =>
    graft.pipeline.Text.bm25(t(s, dir, "documents"), "doc_id", "text",
      queryTerms = Seq("spark", "table", "row"), topN = 50, idf = rsjIdf)
      .select(col("id").as("doc_id"), col("score"),
        col("rank").cast(LongType).as("rank"))
      .orderBy("rank")
  }

  // BM25 answered from the ingest-time inverted index
  // (Text.buildInvertedIndex + bm25FromIndex) instead of raw text. The
  // oracle is the SAME SQL as text_bm25: the index path must reproduce
  // the from-text scores exactly (shared scoring core; the index only
  // changes WHERE tf/dl come from). The parquet round-trip + row-group
  // pruning behavior of the written index is spec-asserted
  // (PipelineSpec "inverted index").
  private val textBm25Indexed = Q("text_bm25_indexed",
      Some(bm25OracleSql)) { (s, dir) =>
    val ix = graft.pipeline.Text.buildInvertedIndex(
      t(s, dir, "documents"), "doc_id", "text")
    graft.pipeline.Text.bm25FromIndex(ix,
      queryTerms = Seq("spark", "table", "row"), topN = 50, idf = rsjIdf)
      .select(col("id").as("doc_id"), col("score"),
        col("rank").cast(LongType).as("rank"))
      .orderBy("rank")
  }

  // CCNet-style bigram-LM fluency scoring (Text.trainBigramLm +
  // Text.perplexity), self-trained on the corpus for gate determinism
  // (a production run trains on a reference corpus instead — same
  // plumbing, different `df` argument). The oracle-compared column is
  // the rational `predictability` twin (counts + IEEE `+ - * /` +
  // floor: bit-identical across engines); the transcendental
  // `perplexity` column is projected away here and ranking-asserted in
  // PipelineSpec. The SQL replays bigram formation, both count tables,
  // Laplace smoothing, and the quantized-long mean operation for
  // operation.
  private val textPerplexity = Q("text_perplexity", Some(s"""
    WITH toks AS (SELECT doc_id, $duckToks AS ts FROM documents),
    bg AS (
      SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
        SELECT doc_id,
          unnest([{'w1': ts[i], 'w2': ts[i+1]}
                  for i in generate_series(1, len(ts)-1)]) AS b
        FROM toks WHERE len(ts) >= 2)),
    big AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
    ctx AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
    voc AS (SELECT count(DISTINCT t) AS v
            FROM (SELECT unnest($duckToks) AS t FROM documents)),
    q AS (
      SELECT bg.doc_id,
        CAST(floor(((coalesce(c2, 0) + 1.0) / (coalesce(c1, 0) + v))
          * 1048576.0 + 0.5) AS BIGINT) AS q
      FROM bg LEFT JOIN big USING (w1, w2) LEFT JOIN ctx USING (w1)
        CROSS JOIN voc)
    SELECT doc_id, count(*) AS n_bigrams,
      sum(q) / 1048576.0 / count(*) AS predictability
    FROM q GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
    val docs = t(s, dir, "documents")
    graft.pipeline.Text.perplexity(docs, "doc_id", "text",
        graft.pipeline.Text.trainBigramLm(docs))
      .select(col("id").as("doc_id"), col("n_bigrams"),
        col("predictability"))
      .orderBy("doc_id")
  }

  private val textBoilerplate = Q("text_boilerplate", bench = true, oracle = Some(s"""
    WITH n AS (SELECT doc_id, regexp_replace(trim(text), '\\s+', ' ', 'g') AS t
               FROM documents),
    g AS (SELECT doc_id,
            [CAST(('0x' || substring(md5(substring(t, i, 8)), 1, 14)) AS BIGINT)
             for i in generate_series(1, len(t) - 7)] AS hs
          FROM n),
    f AS (SELECT doc_id,
            CASE WHEN len(hs) >= 4 THEN
                   list_distinct([list_min(hs[i:i+3])
                                  for i in generate_series(1, len(hs) - 3)])
                 WHEN len(hs) >= 1 THEN [list_min(hs)]
                 ELSE [] END AS fps
          FROM g),
    fp AS (SELECT doc_id AS id, unnest(fps) AS fp FROM f),
    common AS (SELECT fp, 1 AS isc FROM fp GROUP BY fp HAVING count(*) >= 2),
    per AS (SELECT f2.id, count(*) AS n_fps,
              coalesce(sum(c.isc), 0) AS common_fps
            FROM fp f2 LEFT JOIN common c ON c.fp = f2.fp GROUP BY f2.id)
    SELECT d.doc_id,
      coalesce(per.n_fps, 0)::BIGINT AS n_fps,
      coalesce(per.common_fps, 0)::BIGINT AS common_fps,
      CASE WHEN coalesce(per.n_fps, 0) > 0
           THEN per.common_fps::DOUBLE / per.n_fps ELSE 0.0 END AS boilerplate_frac
    FROM documents d LEFT JOIN per ON per.id = d.doc_id
    ORDER BY d.doc_id""")) { (s, dir) =>
    Text.boilerplateSignals(t(s, dir, "documents"), "doc_id")
      .orderBy("doc_id")
  }

  // simhash with the md5-derived token hash (Dedup.md5Hash64Of), so the
  // oracle recomputes the IDENTICAL 64-bit signatures in SQL: bit j of
  // the signature = sign of the sum over tokens of (+1/-1 by bit j of the
  // hash). The pigeonhole chunk join is exact (any pair within hamming 3
  // agrees on >= 1 of 4 chunks), so the all-pairs oracle applies
  // verbatim. The xxhash64 default stays the production path (PipelineSpec
  // covers it); the hash is the only pluggable piece.
  private val dedupSimhash = Q("dedup_simhash", Some(s"""
    WITH toks AS (
      SELECT doc_id,
        CAST(('0x' || substring(md5(unnest($duckToks)), 1, 16)) AS UBIGINT) AS h
      FROM documents),
    bits AS (
      SELECT doc_id, g.b,
        sum(CASE WHEN ((h >> g.b) & 1) = 1 THEN 1 ELSE -1 END) AS w
      FROM toks CROSS JOIN generate_series(0, 63) g(b)
      GROUP BY doc_id, g.b),
    sig AS (
      SELECT doc_id,
        bit_or(CASE WHEN w > 0 THEN (CAST(1 AS UBIGINT) << b)
               ELSE CAST(0 AS UBIGINT) END) AS s
      FROM bits GROUP BY doc_id)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      bit_count(xor(a.s, b.s))::BIGINT AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 3
    ORDER BY id_a, id_b""")) { (s, dir) =>
    Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
      maxHamming = 3, hashFn = Dedup.md5Hash64Of)
      .select(col("id_a"), col("id_b"), col("hamming").cast(LongType).as("hamming"))
      .orderBy("id_a", "id_b")
  }

  private val textQuality = Q("text_quality", bench = true, oracle = Some(s"""
    SELECT doc_id,
      len($duckToks)::BIGINT AS n_tokens,
      list_sum(list_transform($duckToks, x -> len(x)))::DOUBLE /
        greatest(len($duckToks), 1) AS avg_token_len,
      len(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE /
        greatest(len(text), 1) AS punct_ratio,
      len(list_filter($duckToks, x -> lower(x) IN
        ('the','a','an','and','or','of','to','in','is','it')))::DOUBLE /
        greatest(len($duckToks), 1) AS stopword_ratio,
      (list_sum(list_transform($duckToks, x -> ceil(len(x)/4.0)::BIGINT)) +
        len(regexp_replace(text, '[^.,!?;:]', '', 'g')))::BIGINT AS bpeish_tokens
    FROM documents ORDER BY doc_id""")) { (s, dir) =>
    Text.qualitySignals(t(s, dir, "documents"))
      .withColumn("bpeish_tokens", Text.tokenCountBpeIsh(col("text")))
      .withColumn("avg_token_len",
        when(col("n_tokens") > 0, col("avg_token_len")).otherwise(0.0))
      .select("doc_id", "n_tokens", "avg_token_len", "punct_ratio",
        "stopword_ratio", "bpeish_tokens")
      // materialize the NARROW result before the global sort (same
      // rationale as text_repetition: the range-exchange sampling pass
      // re-ran this shuffle-free regex pipeline end-to-end; r17
      // measured 7.3 -> 3.7 s at sf1). Values byte-identical; the
      // checkpoint is recomputed inside every run.
      .localCheckpoint()
      .orderBy("doc_id")
  }

  // The Gopher quality rules (Rae et al. 2021 Appendix A — the
  // MassiveText heuristics RefinedWeb/Dolma reuse): word-count bounds,
  // mean-word-length bounds, symbol-to-word ratio, bullet/ellipsis line
  // ratios, alphabetic-word fraction, stop-word containment. Every ratio
  // threshold is CROSS-MULTIPLIED into integer arithmetic on both
  // engines (5*alpha >= 4*words, never alpha/words >= 0.8), so each flag
  // is exact — no boundary doc can flip on float rounding. On this
  // synthetic corpus the word-count rule provides the variance ("the" is
  // the only Gopher stop word in the vocabulary, so the stop rule is
  // uniformly false — faithful to the published list; PipelineSpec
  // exercises every rule's both sides on purpose-built docs).
  private val textGopher = Q("text_gopher", Some(s"""
    WITH s AS (SELECT doc_id, text, $duckToks AS ts,
        list_filter(list_transform(string_split(text, chr(10)),
          x -> trim(x)), x -> x <> '') AS ls
      FROM documents),
    m AS (SELECT doc_id,
        CAST(len(ts) AS BIGINT) AS nw,
        CAST(coalesce(list_sum(list_transform(ts, x -> length(x))), 0)
          AS BIGINT) AS sum_len,
        CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
          AS hashes,
        CAST(length(text) - length(replace(text, '...', '')) AS BIGINT)
          AS ell3,
        CAST(len(list_filter(ts, x -> regexp_matches(x, '[A-Za-z]')))
          AS BIGINT) AS alpha_w,
        CAST(greatest(len(ls), 1) AS BIGINT) AS nl,
        CAST(len(list_filter(ls, x -> x LIKE '•%' OR x LIKE '-%'
          OR x LIKE '*%')) AS BIGINT) AS bullet_l,
        CAST(len(list_filter(ls, x -> x LIKE '%...')) AS BIGINT) AS ell_l,
        CAST(len(list_filter(
          ['the','be','to','of','and','that','have','with'],
          w -> list_contains(list_transform(ts, x -> lower(x)), w)))
          AS BIGINT) AS stop_hits
      FROM s)
    SELECT doc_id, nw AS n_words,
      (nw >= 50 AND nw <= 100000) AS rule_word_count,
      (3*nw <= sum_len AND sum_len <= 10*nw) AS rule_mean_word_len,
      (10*(3*hashes + ell3) <= 3*nw) AS rule_symbol_ratio,
      (10*bullet_l <= 9*nl) AS rule_bullet_lines,
      (10*ell_l <= 3*nl) AS rule_ellipsis_lines,
      (5*alpha_w >= 4*nw) AS rule_alpha_words,
      (stop_hits >= 2) AS rule_stop_words,
      ((nw >= 50 AND nw <= 100000)
        AND (3*nw <= sum_len AND sum_len <= 10*nw)
        AND (10*(3*hashes + ell3) <= 3*nw)
        AND (10*bullet_l <= 9*nl)
        AND (10*ell_l <= 3*nl)
        AND (5*alpha_w >= 4*nw)
        AND (stop_hits >= 2)) AS gopher_pass
    FROM m ORDER BY doc_id""")) { (s, dir) =>
    Text.gopherRules(t(s, dir, "documents"))
      .select("doc_id", "n_words", "rule_word_count", "rule_mean_word_len",
        "rule_symbol_ratio", "rule_bullet_lines", "rule_ellipsis_lines",
        "rule_alpha_words", "rule_stop_words", "gopher_pass")
      .orderBy("doc_id")
  }

  // The C4 cleaning heuristics (Raffel et al. 2020 §2.2): line retention
  // (terminal punctuation + >= 3 words + no "javascript") then page
  // flags (>= 5 sentences on the CLEANED text, no lorem ipsum, no curly
  // bracket). The synthetic corpus is single-line and punctuation-free
  // (every rule would be vacuous), so BOTH engines first derive a
  // structured corpus with the same deterministic string transforms:
  // ' line ' becomes a sentence break (period + newline), every 7th doc
  // swaps ' vector ' for ' javascript ', every 11th leads with
  // 'lorem ipsum ', every 13th trails a curly brace — each rule then
  // fires both ways on real data. Thresholds are integer counts; the
  // cleaned text is compared verbatim.
  private val textC4 = Q("text_c4", Some(s"""
    WITH d AS (SELECT doc_id,
        concat(
          CASE WHEN doc_id % 11 = 0 THEN 'lorem ipsum ' ELSE '' END,
          regexp_replace(
            CASE WHEN doc_id % 7 = 0
              THEN regexp_replace(text, ' vector ', ' javascript ', 'g')
              ELSE text END,
            ' line ', '.' || chr(10), 'g'),
          CASE WHEN doc_id % 13 = 0 THEN ' {' ELSE '' END) AS text
      FROM documents),
    s AS (SELECT doc_id, text,
        list_filter(list_transform(string_split(text, chr(10)),
          x -> trim(x)), x -> x <> '') AS ls
      FROM d),
    k AS (SELECT doc_id, text, ls,
        list_filter(ls, l ->
          (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?' OR l LIKE '%"')
          AND len(list_filter(string_split_regex(l, '\\s+'),
            w -> w <> '')) >= 3
          AND NOT contains(lower(l), 'javascript')) AS kept
      FROM s),
    m AS (SELECT doc_id, text,
        coalesce(array_to_string(kept, chr(10)), '') AS text_clean,
        CAST(len(ls) AS BIGINT) AS n_lines,
        CAST(len(kept) AS BIGINT) AS n_kept_lines
      FROM k)
    SELECT doc_id, text_clean, n_lines, n_kept_lines,
      (length(text_clean) - length(regexp_replace(text_clean, '[.!?]', '',
        'g')) >= 5) AS rule_min_sentences,
      (NOT contains(lower(text), 'lorem ipsum')) AS rule_no_lorem,
      (NOT (contains(text, '{') OR contains(text, '}'))) AS rule_no_brace,
      ((length(text_clean) - length(regexp_replace(text_clean, '[.!?]', '',
         'g')) >= 5)
        AND NOT contains(lower(text), 'lorem ipsum')
        AND NOT (contains(text, '{') OR contains(text, '}'))) AS c4_keep
    FROM m ORDER BY doc_id""")) { (s, dir) =>
    val derived = t(s, dir, "documents").select(col("doc_id"),
      concat(
        when(col("doc_id") % 11 === 0, lit("lorem ipsum ")).otherwise(lit("")),
        regexp_replace(
          when(col("doc_id") % 7 === 0,
            regexp_replace(col("text"), " vector ", " javascript "))
            .otherwise(col("text")),
          " line ", ".\n"),
        when(col("doc_id") % 13 === 0, lit(" {")).otherwise(lit("")))
        .as("text"))
    Text.c4Rules(derived)
      .select("doc_id", "text_clean", "n_lines", "n_kept_lines",
        "rule_min_sentences", "rule_no_lorem", "rule_no_brace", "c4_keep")
      .orderBy("doc_id")
  }

  // Model-based quality scoring: a fastText-style linear classifier over
  // unigrams. The operator quantizes weights to 1e-6 fixed point so the
  // dot product is an INTEGER sum — the oracle re-derives every score
  // from the hardcoded fixed-point weights with order-free integer
  // aggregation, then both sides make the identical single float op
  // (int→double cast + one division). Both engine paths (inlined HOF map
  // walk and explode+broadcast-join) are spec-asserted identical; the
  // gate runs the HOF path.
  private val textClassifier = Q("text_classifier", Some(s"""
    WITH w(term, wt) AS (VALUES
      ('fast', 800000), ('slow', -600000), ('merge', 250000),
      ('hash', 100000), ('filter', -150000)),
    d AS (SELECT doc_id, $duckToks AS ts FROM documents),
    e AS (SELECT doc_id, unnest(ts) AS term FROM d),
    s AS (SELECT e.doc_id, CAST(sum(w.wt) AS BIGINT) AS fp
          FROM e JOIN w USING (term) GROUP BY e.doc_id)
    SELECT d.doc_id,
      CAST(50000 + COALESCE(s.fp, 0) AS DOUBLE) / 1000000.0 AS score
    FROM d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id""")) { (s, dir) =>
    val weights = Map("fast" -> 0.8, "slow" -> -0.6, "merge" -> 0.25,
      "hash" -> 0.1, "filter" -> -0.15)
    t(s, dir, "documents")
      .select(col("doc_id"),
        Text.linearScore(col("text"), weights, bias = 0.05).as("score"))
      .orderBy("doc_id")
  }

  // CCNet-style segment-level dedup: fixed 4-token windows stand in for
  // lines on this single-line corpus; segments shared by >= 2 documents
  // corpus-wide are boilerplate and drop; per-document remainders
  // reassemble in original order. The oracle replays the identical
  // window split, md5-keyed doc-frequency count, and ordered reassembly.
  private val dedupSegments = Q("dedup_segments", bench = true, oracle = Some(s"""
    WITH d AS (SELECT doc_id, $duckToks AS ts FROM documents),
    segs AS (SELECT doc_id, u.pos AS pos, u.seg AS seg FROM (
      SELECT doc_id, unnest([{'pos': i, 'seg': array_to_string(ts[(i*4+1):(i*4+4)], ' ')}
        for i in range(0, CAST(ceil(len(ts)/4.0) AS BIGINT))]) AS u FROM d)),
    freq AS (SELECT md5(seg) AS h, count(DISTINCT doc_id) AS df
             FROM segs GROUP BY 1),
    kept AS (SELECT s.doc_id, s.pos, s.seg
             FROM segs s JOIN freq f ON md5(s.seg) = f.h WHERE f.df < 2),
    re AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS td,
           count(*) AS nk FROM kept GROUP BY doc_id),
    tot AS (SELECT doc_id, count(*) AS ns FROM segs GROUP BY doc_id)
    SELECT d.doc_id, coalesce(re.td, '') AS text_deduped,
      CAST(coalesce(tot.ns, 0) AS BIGINT) AS n_segments,
      CAST(coalesce(re.nk, 0) AS BIGINT) AS n_kept
    FROM d LEFT JOIN re USING (doc_id) LEFT JOIN tot USING (doc_id)
    ORDER BY d.doc_id""")) { (s, dir) =>
    Text.segmentDedup(t(s, dir, "documents"), "doc_id", "text",
      windowTokens = 4, maxDocFreq = 2)
      .orderBy("doc_id")
  }

  // URL-level dedup: a deliberately messy URL (uppercase scheme/host,
  // default port, trailing slash, unsorted + tracking query params,
  // fragment) is derived per document from its own columns; the
  // canonicalizer must collapse it to the clean form the oracle
  // constructs INDEPENDENTLY (direct string derivation, not a regex
  // replay), then dedup keeps the lowest doc_id per canonical URL.
  private val dedupUrl = Q("dedup_url_canonical", Some("""
    WITH c AS (SELECT doc_id,
      'https://www.' || source || '.example.com/' || lang || '/item/' ||
        (doc_id % 5) || '?a=1&b=2' AS canonical_url
      FROM documents)
    SELECT min(doc_id) AS doc_id, canonical_url,
      CAST(count(*) AS BIGINT) AS n_dups
    FROM c GROUP BY canonical_url ORDER BY doc_id""")) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val messy = concat(lit("HTTPS://WWW."), col("source"),
      lit(".Example.COM:443/"), col("lang"), lit("/item/"),
      (col("doc_id") % 5).cast("string"),
      lit("/?b=2&utm_source=feed&a=1&ref="), col("doc_id").cast("string"),
      lit("#sec"))
    Dedup.byCanonicalUrl(docs.withColumn("url", messy), "doc_id", "url")
      .orderBy("doc_id")
  }

  // Corpus statistics: global top-N word bigrams by occurrence count
  // (vocabulary / boilerplate / stop-phrase mining). The cut is
  // total-ordered (occurrences desc, then the gram), so LIMIT is
  // deterministic on both engines.
  private val textTopNgrams = Q("text_topngrams", bench = true, oracle = Some(s"""
    SELECT g AS ngram, count(*) AS occurrences, count(DISTINCT doc_id) AS doc_freq
    FROM (SELECT doc_id, unnest([ts[i] || ' ' || ts[i+1]
            for i in generate_series(1, len(ts)-1)]) AS g
          FROM (SELECT doc_id, $duckToks AS ts FROM documents))
    GROUP BY g ORDER BY occurrences DESC, ngram LIMIT 50""")) { (s, dir) =>
    Text.topNgrams(t(s, dir, "documents"), "doc_id", "text", k = 2, topN = 50)
  }

  // Benchmark decontamination: documents (doc_id >= 5, the "training"
  // corpus) sharing any 3-shingle with the probe set (doc_id < 5, the
  // "eval benchmark"), with the distinct-shingle hit count per document.
  private val dedupContamination = Q("dedup_contamination", bench = true, oracle = Some(s"""
    WITH sh AS $duckShingles,
    probe AS (SELECT DISTINCT s FROM
      (SELECT unnest(sg) AS s FROM sh WHERE doc_id < 5)),
    corpus AS (SELECT doc_id, unnest(sg) AS s FROM sh WHERE doc_id >= 5)
    SELECT c.doc_id AS id, count(*) AS hits
    FROM corpus c JOIN probe USING (s)
    GROUP BY c.doc_id ORDER BY id""")) { (s, dir) =>
    val docs = t(s, dir, "documents")
    Dedup.contaminationHits(docs.filter(col("doc_id") >= 5),
      docs.filter(col("doc_id") < 5), "doc_id", "text", k = 3)
      .orderBy("id")
  }

  // Repetition signals (Gopher/MassiveText-family quality filters) at
  // token/bigram granularity; the oracle recomputes duplicate-token
  // fraction, top-bigram frequency share, and max token count from the
  // same tokenization.
  private val textRepetition = Q("text_repetition", bench = true, oracle = Some(s"""
    WITH d AS (SELECT doc_id, $duckToks AS ts FROM documents),
    bg AS (SELECT doc_id, unnest([ts[i] || ' ' || ts[i+1]
             for i in generate_series(1, len(ts)-1)]) AS g FROM d),
    bgc AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS top_bigram_frac
            FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g)
            GROUP BY doc_id),
    tc AS (SELECT doc_id, max(c) AS max_token_rep
           FROM (SELECT doc_id, t, count(*) AS c
                 FROM (SELECT doc_id, unnest(ts) AS t FROM d) GROUP BY doc_id, t)
           GROUP BY doc_id)
    SELECT d.doc_id, len(ts)::BIGINT AS n_tokens,
      CASE WHEN len(ts) > 0
           THEN (len(ts) - len(list_distinct(ts)))::DOUBLE / len(ts)
           ELSE 0.0 END AS dup_token_frac,
      coalesce(bgc.top_bigram_frac, 0.0) AS top_bigram_frac,
      coalesce(tc.max_token_rep, 0)::BIGINT AS max_token_rep
    FROM d LEFT JOIN bgc USING (doc_id) LEFT JOIN tc USING (doc_id)
    ORDER BY doc_id""")) { (s, dir) =>
    Text.repetitionSignals(t(s, dir, "documents"), "doc_id")
      .select("doc_id", "n_tokens", "dup_token_frac", "top_bigram_frac",
        "max_token_rep")
      // materialize the NARROW result before the global sort: orderBy's
      // range-exchange SAMPLING pass re-executes its child, and this
      // child is a shuffle-free per-row pipeline (tokenize + two mode
      // folds over every document) with no map outputs to reuse — the
      // whole corpus pass ran TWICE (r17, measured 11.1 -> 5.8 s at
      // sf1). The checkpoint is (id + 4 numbers)/doc, recomputed inside
      // every timed/verified run; at 100 TB it is exactly guide §2.3:
      // sample and sort the numbers, never re-run the regexes.
      .localCheckpoint()
      .orderBy("doc_id")
  }

  // PII redaction: deterministic synthetic PII (email/IPv4/phone built
  // from doc_id) is injected into each document on BOTH sides, then the
  // same engine-portable regex chain scrubs it — so the oracle verifies
  // the redaction actually fires, not just passes text through.
  private val textRedact = Q("text_redact", Some(s"""
    SELECT doc_id,
      regexp_replace(regexp_replace(regexp_replace(
        text || ' contact' || doc_id || '@example.com via 10.0.0.' ||
          (doc_id % 256) || ' call +49-30-1234' || (doc_id % 10),
        '${Text.EmailRe}', '<EMAIL>', 'g'),
        '${Text.Ipv4Re}', '<IP>', 'g'),
        '${Text.PhoneRe}', '<PHONE>', 'g') AS redacted
    FROM documents ORDER BY doc_id""")) { (s, dir) =>
    val injected = concat(col("text"),
      lit(" contact"), col("doc_id").cast(StringType),
      lit("@example.com via 10.0.0."), (col("doc_id") % 256).cast(StringType),
      lit(" call +49-30-1234"), (col("doc_id") % 10).cast(StringType))
    t(s, dir, "documents")
      .select(col("doc_id"), Text.redactPii(injected).as("redacted"))
      .orderBy("doc_id")
  }

  // Unicode normalization (native UnicodeNormalize/StripAccents
  // expressions): the oracle is DuckDB's OWN nfc_normalize/strip_accents
  // (utf8proc) vs our java.text.Normalizer twins — two independent
  // Unicode implementations agreeing byte-for-byte. The injected suffix
  // exercises the interesting cases on every row: a combining acute that
  // NFC must compose (chr(769) after 'e'), precomposed accents the fold
  // must strip (è Û É ç ï ó ź, multi-mark ệ), and the characters
  // strip_accents must NOT touch (ß ﬁ Æ ø Ł have no canonical
  // decomposition — compat folding would corrupt them).
  private val normSuf1 =
    " Crème BRÛLÉE façade naïve e"
  private val normSuf2 =
    " ệ Łódź ﬁß Æø"
  private val textNormalize = Q("text_normalize", Some(s"""
    SELECT doc_id,
      nfc_normalize(raw) AS nfc,
      length(nfc_normalize(raw)) AS nfc_len,
      strip_accents(lower(nfc_normalize(raw))) AS folded
    FROM (SELECT doc_id,
      text || '$normSuf1' || chr(769) || '$normSuf2' AS raw
      FROM documents)
    ORDER BY doc_id""")) { (s, dir) =>
    val raw = concat(col("text"), lit(normSuf1 + "́" + normSuf2))
    t(s, dir, "documents")
      .select(col("doc_id"),
        Text.normalize(raw).as("nfc"),
        length(Text.normalize(raw)).cast("long").as("nfc_len"),
        Text.canonicalFold(raw).as("folded"))
      .orderBy("doc_id")
  }

  // langid: the DuckDB oracle recomputes the SAME stopword-profile
  // heuristic (per-language token-fraction scores, argmax with lang-code
  // tie-break, "und" below minScore). Both engines compute each score as
  // an exact small-int division to double, so comparisons agree bitwise.
  // Real-language behavior is additionally asserted in PipelineSpec.
  private def langScoreSql(lang: String): String = {
    val words = Text.LangProfiles(lang)
      .map(w => s"'${w}'").mkString(", ")
    s"""len(list_filter(list_transform($duckToks, x -> lower(x)),
        t -> t IN ($words)))::DOUBLE / greatest(len($duckToks), 1)"""
  }
  private val textLangid = Q("text_langid", Some(s"""
    SELECT doc_id,
      CASE WHEN greatest(s_de, s_en, s_es, s_fr) < 0.08 THEN 'und'
           WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) THEN 'fr'
           WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
           WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
           ELSE 'de' END AS lang_guess
    FROM (SELECT doc_id,
      ${langScoreSql("de")} AS s_de, ${langScoreSql("en")} AS s_en,
      ${langScoreSql("es")} AS s_es, ${langScoreSql("fr")} AS s_fr
      FROM documents)
    ORDER BY doc_id""")) { (s, dir) =>
    Text.withLangId(t(s, dir, "documents"), "text")
      .select("doc_id", "lang_guess")
      .orderBy("doc_id")
  }

  private val duckCos =
    """list_dot_product(a.v, b.v) /
       (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"""

  // Deterministic k-means clustering (Similarity.kmeansCluster): the
  // oracle replays the ENTIRE algorithm — maximin seeding over the
  // md5-hash-ordered 256-sample (three unrolled farthest-point rounds,
  // distances as quantized longs: combine-order-independent), one Lloyd
  // step with the quantized-grid per-dimension mean, keep-old-on-empty,
  // and both argmax assignments (score desc, ties to lowest cid) —
  // because every arithmetic step is IEEE `+ - * /`, floor, sqrt, and a
  // sequential-fold dot product: no RNG, no transcendentals, no
  // order-dependent double sums.
  private def kmeansQd2(s: String) = s"""
    list_sum([CAST(floor((p.v[i]-$s.v[i])*(p.v[i]-$s.v[i])*1048576.0+0.5) AS BIGINT)
              for i in generate_series(1, len(p.v))])"""
  private val kmeansCteSql = s"""
    emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    samp AS (SELECT v, row_number() OVER (
               ORDER BY md5('kmseed' || CAST(vec_id AS VARCHAR)), vec_id) AS sn
             FROM emb
             ORDER BY md5('kmseed' || CAST(vec_id AS VARCHAR)), vec_id
             LIMIT 256),
    sd1 AS (SELECT p.sn, p.v, ${kmeansQd2("s")} AS dm
            FROM samp p CROSS JOIN (SELECT v FROM samp WHERE sn = 1) s),
    sd2 AS (SELECT p.sn, p.v, least(p.dm, ${kmeansQd2("s")}) AS dm
            FROM sd1 p CROSS JOIN
              (SELECT v FROM sd1 ORDER BY dm DESC, sn LIMIT 1) s),
    sd3 AS (SELECT p.sn, p.v, least(p.dm, ${kmeansQd2("s")}) AS dm
            FROM sd2 p CROSS JOIN
              (SELECT v FROM sd2 ORDER BY dm DESC, sn LIMIT 1) s),
    init AS (
      SELECT CAST(0 AS BIGINT) AS cid, v FROM samp WHERE sn = 1
      UNION ALL SELECT * FROM
        (SELECT CAST(1 AS BIGINT) AS cid, v FROM sd1 ORDER BY dm DESC, sn LIMIT 1)
      UNION ALL SELECT * FROM
        (SELECT CAST(2 AS BIGINT) AS cid, v FROM sd2 ORDER BY dm DESC, sn LIMIT 1)
      UNION ALL SELECT * FROM
        (SELECT CAST(3 AS BIGINT) AS cid, v FROM sd3 ORDER BY dm DESC, sn LIMIT 1)),
    a1 AS (SELECT vec_id, cid FROM (
      SELECT e.vec_id, i.cid, row_number() OVER (PARTITION BY e.vec_id
        ORDER BY
          CASE WHEN sqrt(list_dot_product(i.v, i.v)) = 0 THEN 0.0
               ELSE list_dot_product(e.v, i.v) /
                    sqrt(list_dot_product(i.v, i.v)) END DESC,
          i.cid) AS rn
      FROM emb e CROSS JOIN init i) WHERE rn = 1),
    mem AS (SELECT cid, u.pos AS pos, u.x AS x FROM (
      SELECT cid, unnest([{'pos': i-1, 'x': v[i]}
               for i in generate_series(1, len(v))]) AS u
      FROM a1 JOIN emb USING (vec_id))),
    means AS (SELECT cid, pos,
                sum(CAST(floor(x * 1048576.0 + 0.5) AS BIGINT)) AS sq,
                count(*) AS n
              FROM mem GROUP BY 1, 2),
    initg AS (SELECT cid, u.pos AS pos, u.x AS x FROM (
      SELECT cid, unnest([{'pos': i-1, 'x': v[i]}
               for i in generate_series(1, len(v))]) AS u FROM init)),
    ref AS (SELECT ig.cid, ig.pos,
              coalesce(m.sq / 1048576.0 / m.n, ig.x) AS m
            FROM initg ig LEFT JOIN means m
              ON m.cid = ig.cid AND m.pos = ig.pos),
    cents AS (SELECT cid, list(m ORDER BY pos) AS v FROM ref GROUP BY cid),
    assign AS (SELECT vec_id, cid FROM (
      SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
        ORDER BY
          CASE WHEN sqrt(list_dot_product(c.v, c.v)) = 0 THEN 0.0
               ELSE list_dot_product(e.v, c.v) /
                    sqrt(list_dot_product(c.v, c.v)) END DESC,
          c.cid) AS rn
      FROM emb e CROSS JOIN cents c) WHERE rn = 1)"""

  private val clusterKmeans = Q("cluster_kmeans", Some(s"""
    WITH $kmeansCteSql
    SELECT vec_id, cid FROM assign ORDER BY vec_id""")) { (s, dir) =>
    Similarity.kmeansCluster(t(s, dir, "embeddings"), "vec_id",
        "embedding", k = 4, iters = 1)
      .select(col("vec_id"), col("cid").cast(LongType).as("cid"))
      .orderBy("vec_id")
  }

  // Cluster-balanced sampling: the composition the clustering exists
  // for — k-means assignments feed stratifiedTopN with cid as the
  // stratum, giving a deterministic equal-per-cluster subsample
  // (diversity-preserving curation: rare embedding regions keep
  // representation a uniform sample would wash out). The oracle chains
  // the full replayed k-means with the salted-md5 rank replay of the
  // stratified sampler.
  private val sampleClusterBalanced = Q("sample_cluster_balanced", Some(s"""
    WITH $kmeansCteSql
    SELECT cid, vec_id FROM (
      SELECT cid, vec_id, row_number() OVER (PARTITION BY cid
        ORDER BY CAST(('0x' || substring(md5('cbal' || CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT),
                 vec_id) AS rn
      FROM assign) WHERE rn <= 20 ORDER BY cid, vec_id""")) { (s, dir) =>
    val cids = Similarity.kmeansCluster(t(s, dir, "embeddings"),
      "vec_id", "embedding", k = 4, iters = 1)
    Sampling.stratifiedTopN(cids, col("vec_id"), col("cid"), n = 20,
        salt = "cbal")
      .select(col("cid").cast(LongType).as("cid"), col("vec_id"))
      .orderBy("cid", "vec_id")
  }

  private val similarityTopk = Q("similarity_topk", Some(s"""
    SELECT query_id, rank, nn_id, cosine FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS nn_id, $duckCos AS cosine,
        row_number() OVER (PARTITION BY a.vec_id
          ORDER BY $duckCos DESC, b.vec_id) AS rank
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 10) a
      JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) b
        ON a.vec_id <> b.vec_id)
    WHERE rank <= 5 ORDER BY query_id, rank"""), bench = true) { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("nn_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  // Matryoshka two-stage retrieval: prefix-16-dim cosine shortlist of 20,
  // exact 64-dim re-rank to top-5. The oracle replays both stages —
  // shortlist membership and the emitted full-dimension cosines are both
  // exact, so this is an end-to-end machinery check, not a recall bound.
  private val similarityMatryoshka = Q("similarity_matryoshka", Some(s"""
    WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT a.vec_id AS query_id, b.vec_id AS nn_id,
        list_dot_product(a.v[1:16], b.v[1:16]) /
          (sqrt(list_dot_product(a.v[1:16], a.v[1:16])) *
           sqrt(list_dot_product(b.v[1:16], b.v[1:16]))) AS pcos,
        $duckCos AS cosine
      FROM q a JOIN c b ON a.vec_id <> b.vec_id),
    sl AS (SELECT query_id, nn_id, cosine, row_number() OVER (
        PARTITION BY query_id ORDER BY pcos DESC, nn_id) AS prank FROM s)
    SELECT query_id, rank, nn_id, cosine FROM (
      SELECT query_id, nn_id, cosine, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank
      FROM sl WHERE prank <= 20)
    WHERE rank <= 5 ORDER BY query_id, rank""")) { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    Similarity.matryoshkaTopK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5, prefixDim = 16, shortlist = 20)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("nn_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  // Bucketed Matryoshka (r10 ask 3, Similarity.matryoshkaIvfTopK): IVF
  // coarse buckets composed with the prefix-cosine shortlist + exact
  // full-dim re-rank. With nProbe == nLists every bucket is probed, so
  // the bucket restriction vanishes BY CONSTRUCTION and the two-stage
  // Matryoshka replay oracle applies verbatim — the fixture's
  // determinism lever (the same one similarity_ivf_topk uses); the
  // probed-bucket scale path is priced in PerfEval (annMatryoshkaIvf).
  private val similarityMatryoshkaIvf = Q("similarity_matryoshka_ivf", Some(s"""
    WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT a.vec_id AS query_id, b.vec_id AS nn_id,
        list_dot_product(a.v[1:16], b.v[1:16]) /
          (sqrt(list_dot_product(a.v[1:16], a.v[1:16])) *
           sqrt(list_dot_product(b.v[1:16], b.v[1:16]))) AS pcos,
        $duckCos AS cosine
      FROM q a JOIN c b ON a.vec_id <> b.vec_id),
    sl AS (SELECT query_id, nn_id, cosine, row_number() OVER (
        PARTITION BY query_id ORDER BY pcos DESC, nn_id) AS prank FROM s)
    SELECT query_id, rank, nn_id, cosine FROM (
      SELECT query_id, nn_id, cosine, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank
      FROM sl WHERE prank <= 20)
    WHERE rank <= 5 ORDER BY query_id, rank""")) { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    Similarity.matryoshkaIvfTopK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5, prefixDim = 16, shortlist = 20,
      nLists = 8, nProbe = 8, iters = 2)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("nn_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  // IVF with nProbe == nLists probes every list — the full IVF machinery
  // (train/assign/probe/re-rank) with provably exact output, so the
  // brute-force oracle applies verbatim.
  private val similarityIvf = Q("similarity_ivf_topk", Some(s"""
    SELECT query_id, rank, nn_id, cosine FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS nn_id, $duckCos AS cosine,
        row_number() OVER (PARTITION BY a.vec_id
          ORDER BY $duckCos DESC, b.vec_id) AS rank
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 10) a
      JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) b
        ON a.vec_id <> b.vec_id)
    WHERE rank <= 5 ORDER BY query_id, rank""")) { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5, nLists = 8, nProbe = 8, iters = 2)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("nn_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  // The full LSH path (signatures -> band buckets -> candidate join ->
  // exact re-rank) with md5-derived hyperplanes both engines can build:
  // the oracle rebuilds the plane matrix in SQL, recomputes every
  // signature bit (list_dot_product is sequential like the native
  // DotProduct, so the sign of every plane sum matches bitwise), joins
  // buckets, and re-ranks — an end-to-end exactness check of the LSH
  // machinery, not just its recall. The hash-derived-plane variant
  // (native HyperplaneBand signatures, identical candidate/re-rank code)
  // is recall-asserted in PipelineSpec and timed as PerfEval's
  // `annLshHash` workload; it has no battery entry because DuckDB cannot
  // recompute xxhash64 buckets and its recall on near-random embeddings
  // is legitimately partial, so no exact row-level oracle exists.
  private val similarityLshPlanes = Q("similarity_lsh_planes", bench = true,
    oracle = Some(s"""
    WITH planes AS (
      SELECT j, [ (CAST(('0x' || substring(md5('hp_' || j || '_' || (i-1)), 1, 15)) AS BIGINT) % 2001 - 1000) / 1000.0
                  for i in generate_series(1, (SELECT len(embedding) FROM embeddings LIMIT 1)) ] AS pv
      FROM generate_series(0, 127) t(j)),
    vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sigs AS (
      SELECT vec_id, j // 8 AS band,
        bit_or(CASE WHEN list_dot_product(v, pv) > 0 THEN (CAST(1 AS BIGINT) << (j % 8))
               ELSE CAST(0 AS BIGINT) END) AS bucket
      FROM vecs CROSS JOIN planes
      GROUP BY vec_id, j // 8),
    cands AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS nn_id
      FROM sigs q JOIN sigs c ON q.band = c.band AND q.bucket = c.bucket
      WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
    scored AS (
      SELECT cd.query_id, cd.nn_id,
        list_dot_product(a.v, b.v) /
          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
      FROM cands cd
      JOIN vecs a ON a.vec_id = cd.query_id
      JOIN vecs b ON b.vec_id = cd.nn_id)
    SELECT query_id, rank, nn_id, cosine FROM (
      SELECT query_id, nn_id, cosine,
        row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank
      FROM scored)
    WHERE rank <= 5 ORDER BY query_id, rank""")) { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    Similarity.lshTopKPlanes(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5,
      planes = Similarity.md5Planes(128, dim), bands = 16)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("nn_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  // Quantized ANN: top-k over int8-grid-quantized embeddings (the 4x
  // memory path at 100 TB). The floor-based grid is engine-portable, so
  // the oracle requantizes in SQL and the ranking — including the more
  // frequent ties a coarse grid produces — matches exactly (ties break
  // on nn_id over bit-identical doubles).
  private val similarityQuantized = Q("similarity_quantized_topk", Some(s"""
    WITH vq AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
        x -> floor(least(greatest(x, -1.0), 1.0) * 127 + 0.5) / 127.0) AS v
      FROM embeddings)
    SELECT query_id, rank, nn_id, cosine FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS nn_id, $duckCos AS cosine,
        row_number() OVER (PARTITION BY a.vec_id
          ORDER BY $duckCos DESC, b.vec_id) AS rank
      FROM (SELECT * FROM vq WHERE vec_id < 10) a
      JOIN vq b ON a.vec_id <> b.vec_id)
    WHERE rank <= 5 ORDER BY query_id, rank""")) { (s, dir) =>
    val emb = t(s, dir, "embeddings").select(col("vec_id"),
      Similarity.quantizeUnit(col("embedding")).as("qv"))
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "qv", k = 5)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("nn_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  // PQ/ADC ANN with md5-derived codebooks both engines can rebuild: the
  // oracle re-derives the 8x16x8 codebook, re-encodes every corpus
  // vector (argmax(dot - |c|^2/2), ties to the lowest cid — the exact
  // PqEncode rule over bit-identical doubles), rebuilds each query's ADC
  // table, replays the candidate cut (left-fold lookup sum / corpus
  // norm, explicit 8-term parenthesized sum = the Spark aggregate()
  // fold), and re-ranks by exact cosine — end-to-end exactness for the
  // whole PQ path, the same pattern as similarity_lsh_planes. The
  // TRAINED-codebook variant (pqTrain) is recall-asserted in
  // PipelineSpec and timed as PerfEval's annPqAdc; its k-means has no
  // tractable SQL replay, so the replayable-codebook query is the gate.
  private val similarityPq = Q("similarity_pq_topk", Some(s"""
    WITH cb AS (
      SELECT j, c, [ (CAST(('0x' || substring(md5('pq_' || j || '_' || c || '_' || (t-1)), 1, 15)) AS BIGINT) % 2001 - 1000) / 1000.0
                     for t in generate_series(1, 8) ] AS cv
      FROM generate_series(0, 7) tj(j) CROSS JOIN generate_series(0, 15) tc(c)),
    vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    codes AS (
      SELECT vec_id, j, c AS code FROM (
        SELECT v.vec_id, cb.j, cb.c,
          row_number() OVER (PARTITION BY v.vec_id, cb.j
            ORDER BY list_dot_product(v.v[cb.j*8+1 : cb.j*8+8], cb.cv)
                     - list_dot_product(cb.cv, cb.cv)/2 DESC, cb.c) AS rn
        FROM vecs v CROSS JOIN cb)
      WHERE rn = 1),
    qtab AS (
      SELECT v.vec_id AS query_id, cb.j, cb.c,
        list_dot_product(v.v[cb.j*8+1 : cb.j*8+8], cb.cv) AS d
      FROM vecs v CROSS JOIN cb
      WHERE v.vec_id < 10),
    approx AS (
      SELECT q.query_id, co.vec_id AS nn_id, list(q.d ORDER BY q.j) AS ds
      FROM qtab q JOIN codes co ON co.j = q.j AND co.code = q.c
      WHERE co.vec_id <> q.query_id
      GROUP BY q.query_id, co.vec_id),
    cands AS (
      SELECT query_id, nn_id FROM (
        SELECT a.query_id, a.nn_id,
          row_number() OVER (PARTITION BY a.query_id
            ORDER BY (ds[1]+ds[2]+ds[3]+ds[4]+ds[5]+ds[6]+ds[7]+ds[8]) /
              sqrt(list_dot_product(n.v, n.v)) DESC, a.nn_id) AS ar
        FROM approx a JOIN vecs n ON n.vec_id = a.nn_id)
      WHERE ar <= 20),
    scored AS (
      SELECT cd.query_id, cd.nn_id,
        list_dot_product(a.v, b.v) /
          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
      FROM cands cd
      JOIN vecs a ON a.vec_id = cd.query_id
      JOIN vecs b ON b.vec_id = cd.nn_id)
    SELECT query_id, rank, nn_id, cosine FROM (
      SELECT query_id, nn_id, cosine,
        row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank
      FROM scored)
    WHERE rank <= 5 ORDER BY query_id, rank""")) { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", kNN = 5,
      codebooks = Similarity.md5Codebooks(m = 8, k = 16, sub = 8))
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("nn_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  private val dedupEmbedding = Q("dedup_embedding", Some(s"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, $duckCos AS cosine
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) a
    JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) b
      ON a.vec_id < b.vec_id
    WHERE $duckCos >= 0.4
    ORDER BY id_a, id_b""")) { (s, dir) =>
    Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
      threshold = 0.4).orderBy("id_a", "id_b")
  }

  // SemDeDup over md5-derived hyperplanes: banded-LSH candidate pairs ->
  // exact cosine verify -> connected components -> keep each cluster's
  // min-id embedding. The oracle replays ALL of it in SQL: rebuilds the
  // 128-plane matrix (same md5 arithmetic as similarity_lsh_planes, 16
  // bands x 8 bits — the operator's default banding; 4-bit bands at this
  // deliberately-low 0.4 threshold degenerate into a near-all-pairs join,
  // 1.7M of 2M possible candidates at sf0.1), re-derives every bucket,
  // re-verifies candidates at cosine >= 0.4, closes components with a
  // recursive CTE (dedup_clusters pattern), and keeps min-id survivors.
  // Pair recall at 0.4 is intentionally partial (~38% at sf0.1 — sign-LSH
  // is built for the >= ~0.9 SemDeDup regime; dedup_embedding is the
  // exact-quadratic anchor at this threshold) and both engines replay the
  // SAME discovered pairs, so the comparison is exact.
  //
  // This gate runs the PRODUCTION configuration: a reliable checkpoint
  // dir (parquet materialization, not localCheckpoint) and a bucket-size
  // cap of 64, with the oracle replaying the cap (buckets above it
  // contribute no candidates) — so what the driver hash-verifies is the
  // reliability-and-skew-capped path a 100 TB run would use, not the
  // defaults.
  // Embedding-space decontamination (`Dedup.crossContaminationPlanes`):
  // probe set = vec_id < 100 (the "benchmark"), corpus = the rest; 32
  // bands x 4 bits over the shared md5 plane matrix, exact cosine >=
  // 0.35 verify, distinct-probe count per corpus row. The oracle
  // rebuilds the planes, BOTH sides' signatures, the asymmetric band
  // join, the cosine verify, and the count — so a bucket-derivation or
  // verify drift on either side breaks the hash.
  private val contaminationSemantic = Q("contamination_semantic", bench = true,
    oracle = Some(s"""
    WITH planes AS (
      SELECT j, [ (CAST(('0x' || substring(md5('hp_' || j || '_' || (i-1)), 1, 15)) AS BIGINT) % 2001 - 1000) / 1000.0
                  for i in generate_series(1, (SELECT len(embedding) FROM embeddings LIMIT 1)) ] AS pv
      FROM generate_series(0, 127) t(j)),
    corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id >= 100),
    probe AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 100),
    csigs AS (SELECT vec_id, j // 4 AS band,
        bit_or(CASE WHEN list_dot_product(v, pv) > 0 THEN (CAST(1 AS BIGINT) << (j % 4)) ELSE CAST(0 AS BIGINT) END) AS bucket
      FROM corpus CROSS JOIN planes GROUP BY vec_id, j // 4),
    psigs AS (SELECT vec_id, j // 4 AS band,
        bit_or(CASE WHEN list_dot_product(v, pv) > 0 THEN (CAST(1 AS BIGINT) << (j % 4)) ELSE CAST(0 AS BIGINT) END) AS bucket
      FROM probe CROSS JOIN planes GROUP BY vec_id, j // 4),
    cand AS (SELECT DISTINCT c.vec_id AS cid, p.vec_id AS pid
      FROM csigs c JOIN psigs p ON c.band = p.band AND c.bucket = p.bucket),
    hits AS (SELECT cid, pid FROM cand
      JOIN corpus a ON a.vec_id = cand.cid
      JOIN probe b ON b.vec_id = cand.pid
      WHERE $duckCos >= 0.35)
    SELECT cid AS vec_id, CAST(count(*) AS BIGINT) AS hits
    FROM hits GROUP BY cid ORDER BY vec_id""")) { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    Dedup.crossContaminationPlanes(
      emb.filter(col("vec_id") >= 100), emb.filter(col("vec_id") < 100),
      "vec_id", "embedding", threshold = 0.35,
      planes = Similarity.md5Planes(128, dim), bands = 32)
      .withColumnRenamed("id", "vec_id")
      .orderBy("vec_id")
  }

  private val dedupSemantic = Q("dedup_semantic", bench = true, oracle = Some(s"""
    WITH RECURSIVE
    planes AS (
      SELECT j, [ (CAST(('0x' || substring(md5('hp_' || j || '_' || (i-1)), 1, 15)) AS BIGINT) % 2001 - 1000) / 1000.0
                  for i in generate_series(1, (SELECT len(embedding) FROM embeddings LIMIT 1)) ] AS pv
      FROM generate_series(0, 127) t(j)),
    vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sigs AS (
      SELECT vec_id, j // 8 AS band,
        bit_or(CASE WHEN list_dot_product(v, pv) > 0 THEN (CAST(1 AS BIGINT) << (j % 8))
               ELSE CAST(0 AS BIGINT) END) AS bucket
      FROM vecs CROSS JOIN planes
      GROUP BY vec_id, j // 8),
    bsz AS (SELECT band, bucket, count(*) AS n FROM sigs GROUP BY 1, 2),
    cands AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b ON a.band = b.band AND a.bucket = b.bucket
      JOIN bsz ON bsz.band = a.band AND bsz.bucket = a.bucket AND bsz.n <= 64
      WHERE a.vec_id < b.vec_id),
    pairs AS (
      SELECT id_a, id_b FROM cands
      JOIN vecs a ON a.vec_id = cands.id_a
      JOIN vecs b ON b.vec_id = cands.id_b
      WHERE $duckCos >= 0.4),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
    SELECT e.vec_id, e.label FROM embeddings e
    JOIN (SELECT a FROM reach GROUP BY a HAVING a = min(b)) k ON k.a = e.vec_id
    ORDER BY e.vec_id""")) { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-q-sdedup").toString
    Dedup.semanticDedupPlanes(emb, "vec_id", "embedding", threshold = 0.4,
      planes = Similarity.md5Planes(128, dim), bands = 16,
      maxBucketSize = Some(64), checkpointDir = Some(ckpt))
      .select("vec_id", "label").orderBy("vec_id")
  }

  // Domain-mixture weighted sampling: per-source keep fractions (the
  // data-mixing step — downsample boilerplate-heavy domains). Thresholds
  // are exact integer bucket counts on both engines; the oracle replays
  // the same salted-md5 bucket arithmetic with the group folded into the
  // salt.
  private val sampleWeighted = Q("sample_weighted", Some("""
    SELECT doc_id, source FROM documents
    WHERE CAST(('0x' || substring(md5('wmix|' || source || '|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 <
      CASE WHEN source IN ('src0','src1','src2','src3') THEN 1000
           WHEN source IN ('src4','src5','src6','src7') THEN 500
           ELSE 250 END
    ORDER BY doc_id""")) { (s, dir) =>
    val full = (0 to 3).map(i => s"src$i" -> 1.0)
    val half = (4 to 7).map(i => s"src$i" -> 0.5)
    Sampling.weightedSample(t(s, dir, "documents"),
      col("doc_id"), col("source"),
      weights = (full ++ half).toMap, defaultWeight = 0.25)
      .select("doc_id", "source").orderBy("doc_id")
  }

  // The duplication side of data mixing: floor(w) replicas per row plus
  // a fractional extra by the same salted-md5 bucket arithmetic as
  // sample_weighted, with a replica index. Weights 2.5/1.0/0.5 keep
  // every driver-side threshold binary-exact.
  private val sampleUpsampled = Q("sample_upsampled", Some("""
    WITH t AS (SELECT doc_id, source,
      CAST(('0x' || substring(md5('wmix|' || source || '|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS h
      FROM documents),
    c AS (SELECT doc_id, source,
      (CASE WHEN source IN ('src0','src1','src2','src3') THEN 2
            WHEN source IN ('src4','src5','src6','src7') THEN 1
            ELSE 0 END
       + CASE WHEN h < (CASE WHEN source IN ('src4','src5','src6','src7') THEN 0
                             ELSE 500 END)
              THEN 1 ELSE 0 END) AS copies
      FROM t)
    SELECT doc_id, source, unnest(generate_series(0, copies - 1)) AS replica
    FROM c WHERE copies > 0
    ORDER BY doc_id, replica""")) { (s, dir) =>
    val heavy = (0 to 3).map(i => s"src$i" -> 2.5)
    val unit = (4 to 7).map(i => s"src$i" -> 1.0)
    Sampling.upsampleWeighted(t(s, dir, "documents"),
      col("doc_id"), col("source"),
      weights = (heavy ++ unit).toMap, defaultWeight = 0.5)
      .select("doc_id", "source", "replica").orderBy("doc_id", "replica")
  }

  // DSIR importance resampling (Xie et al. 2023): documents featurized
  // as salted-md5-hashed token bigrams over 1024 buckets; target =
  // source 'src0'; per-bucket add-one-smoothed likelihood ratios,
  // 2^-20-quantized (integer counts in, IEEE-exact divisions, floor) so
  // the per-doc mean — the affinity the selection ranks by — is
  // bit-identical on any engine and combine-order-independent (the
  // quantized-long sum). The oracle recomputes the whole pipeline:
  // features, both count models, ratios, quantization, top-200 cut with
  // the doc_id tie-break. The paper's log weight (transcendental) is
  // spec-ranked, not hashed.
  private val sampleDsir = Q("sample_dsir", Some(s"""
    WITH f AS (
      SELECT doc_id, source,
        CAST(('0x' || substring(md5('dsir|' || b), 1, 15)) AS BIGINT)
          % 1024 AS h
      FROM (
        SELECT doc_id, source,
          unnest([ts[i] || ' ' || ts[i+1]
                  for i in generate_series(1, len(ts)-1)]) AS b
        FROM (SELECT doc_id, source, $duckToks AS ts FROM documents)
        WHERE len(ts) >= 2)),
    rawc AS (SELECT h, count(*) AS cr FROM f GROUP BY h),
    tgtc AS (SELECT h, count(*) AS ct FROM f WHERE source = 'src0' GROUP BY h),
    tot AS (SELECT (SELECT sum(cr) FROM rawc) AS r_tot,
                   (SELECT coalesce(sum(ct), 0) FROM tgtc) AS t_tot),
    lr AS (SELECT h,
             floor((((coalesce(ct, 0) + 1) / (t_tot + 1024.0)) /
                    ((cr + 1) / (r_tot + 1024.0))) * 1048576.0 + 0.5) AS q
           FROM rawc LEFT JOIN tgtc USING (h), tot)
    SELECT doc_id, count(*) AS n_feats,
           SUM(q) / 1048576.0 / count(*) AS affinity
    FROM f JOIN lr USING (h)
    GROUP BY doc_id
    ORDER BY affinity DESC, doc_id
    LIMIT 200""")) { (s, dir) =>
    val docs = t(s, dir, "documents")
    Sampling.dsirResample(docs, docs.filter(col("source") === "src0"), 200)
      .select("doc_id", "n_feats", "affinity")
  }

  // Temperature-scaled source mixing (q_g ∝ p_g^0.5, token-weighted,
  // target 60k tokens): the oracle independently recomputes the whole
  // weight derivation — per-source token masses, the 2^20-QUANTIZED sqrt
  // masses (integer normalizing sum, so aggregation order cannot perturb
  // the weights on either engine), the fixed-association-order weight
  // arithmetic, and the same salted-md5 replica buckets as
  // sample_upsampled. sqrt is correctly rounded per IEEE-754, so every
  // intermediate double is bit-identical across Spark and DuckDB.
  private val sampleTemperature = Q("sample_temperature", Some(s"""
    WITH d AS (SELECT doc_id, source, len($duckToks)::BIGINT AS n_tok FROM documents),
    g AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS n FROM d GROUP BY source),
    m AS (SELECT source, n,
      CAST(round(sqrt(CAST(n AS DOUBLE)) * 1048576) AS BIGINT) AS s FROM g),
    z AS (SELECT CAST(sum(s) AS BIGINT) AS z FROM m),
    w AS (SELECT source,
      CAST(s AS DOUBLE) / CAST(z.z AS DOUBLE) * 60000.0 / CAST(n AS DOUBLE) AS wt
      FROM m, z),
    c AS (SELECT d.doc_id, d.source,
      CAST(floor(wt) AS BIGINT) +
      CASE WHEN CAST(('0x' || substring(md5('tmix|' || d.source || '|' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
        < CAST(round((wt - floor(wt)) * 1000) AS BIGINT) THEN 1 ELSE 0 END AS copies
      FROM d JOIN w ON w.source = d.source)
    SELECT doc_id, source, unnest(generate_series(0, copies - 1)) AS replica
    FROM c WHERE copies > 0
    ORDER BY doc_id, replica""")) { (s, dir) =>
    Sampling.mixByTemperature(t(s, dir, "documents"),
      col("doc_id"), col("source"), Text.tokenCount(col("text")),
      alpha = 0.5, targetTotal = 60000L)
      .select("doc_id", "source", "replica").orderBy("doc_id", "replica")
  }

  // Deterministic train/val/test split: salted-md5 bucket assignment,
  // reproducible across engines (the DuckDB oracle recomputes the same
  // md5 arithmetic).
  private val sampleSplit = Q("sample_split", Some("""
    SELECT split, count(*) AS cnt, min(doc_id) AS min_id FROM (
      SELECT doc_id,
        CASE WHEN h < 800 THEN 'train' WHEN h < 900 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT doc_id,
        CAST(('0x' || substring(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS h
      FROM documents))
    GROUP BY split ORDER BY split""")) { (s, dir) =>
    t(s, dir, "documents")
      .withColumn("split", Sampling.splitLabel(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
      .groupBy("split")
      .agg(count(lit(1)).as("cnt"), min("doc_id").as("min_id"))
      .orderBy("split")
  }

  // Deterministic pre-training shuffle + sharding: salted-md5 rank gives
  // every doc a shard and a dense in-shard position — the global shuffle
  // before training export. The oracle replays the identical md5
  // arithmetic (same 60-bit rank as sample_split) and window.
  private val sampleShardShuffle = Q("sample_shard_shuffle", Some("""
    SELECT doc_id, shard, pos FROM (
      SELECT doc_id, h % 16 AS shard,
        row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) - 1 AS pos
      FROM (SELECT doc_id,
        CAST(('0x' || substring(md5('shuf' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM documents))
    ORDER BY doc_id""")) { (s, dir) =>
    Sampling.shardAndShuffle(t(s, dir, "documents"), col("doc_id"), nShards = 16)
      .select("doc_id", "shard", "pos").orderBy("doc_id")
  }

  // Training-sequence packing: fixed-token-budget bins over the doc
  // stream in doc_id order. The engine runs the distributed two-pass
  // prefix sum (Pack.packSequences — no global window); the oracle is
  // the naive single-window formulation. `div`/`//` keep the bin index
  // in exact integer arithmetic on both engines.
  private val packSequences = Q("pack_sequences", bench = true, oracle = Some(s"""
    WITH d AS (SELECT doc_id, len($duckToks)::BIGINT AS n_tok FROM documents),
    c AS (SELECT doc_id, n_tok,
      CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pre
      FROM d)
    SELECT CAST(pre // 512 AS BIGINT) AS seq_id, count(*) AS n_docs,
      CAST(sum(n_tok) AS BIGINT) AS seq_tokens,
      min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM c GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
    Pack.packManifest(t(s, dir, "documents"), "doc_id",
      Text.tokenCount(col("text")), budget = 512L)
      .orderBy("seq_id")
  }

  // Context-window chunking: 32-token windows advancing by 24 (8-token
  // overlap) — the split-long-documents step before packing. Window
  // starts cap at max(n - overlap, 1) so the last window reaches the end
  // without emitting a pure-suffix chunk. Zero shuffles engine-side; the
  // oracle replays the start arithmetic and slices in SQL.
  private val packChunks = Q("pack_chunks", Some(s"""
    WITH d AS (SELECT doc_id, $duckToks AS ts FROM documents),
    e AS (SELECT doc_id, ts, len(ts) AS n FROM d WHERE len(ts) > 0),
    ch AS (SELECT doc_id, u.i AS chunk_id,
        array_to_string(ts[(1 + u.i*24):(1 + u.i*24 + 31)], ' ') AS chunk_text,
        CAST(least(32, n - (1 + u.i*24) + 1) AS BIGINT) AS n_tokens
      FROM (SELECT doc_id, ts, n, unnest([{'i': i}
          for i in range(0, ((greatest(n - 8, 1) - 1) // 24) + 1)]) AS u
        FROM e))
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, chunk_text, n_tokens
    FROM ch ORDER BY doc_id, chunk_id""")) { (s, dir) =>
    Pack.chunkDocuments(t(s, dir, "documents"), "doc_id", "text",
      maxTokens = 32, stride = 24)
      .orderBy("doc_id", "chunk_id")
  }

  // Class-balanced sampling: exactly n docs per language, deterministic
  // md5 rank. The engine runs the candidate-prefilter + verify-exact
  // shape (Sampling.stratifiedTopN — the ranked sort touches ~4n rows
  // per stratum, not the stratum); the oracle ranks every row.
  // Corpus audit stats — per-language doc counts, token sums, and EXACT
  // lower-quantile token counts (rank ceil(q*n) in (tok, doc_id) order:
  // a data value, no interpolation, so both engines agree bit-for-bit
  // where interpolated percentile arithmetic is implementation-defined).
  private val corpusStatsQ = Q("corpus_stats", Some(s"""
    WITH b AS (SELECT lang, doc_id, len($duckToks)::BIGINT AS tok FROM documents),
    s AS (SELECT lang, count(*)::BIGINT AS n_docs, sum(tok)::BIGINT AS tok_sum,
                 min(tok) AS tok_min, max(tok) AS tok_max FROM b GROUP BY lang),
    r AS (SELECT lang, tok,
          row_number() OVER (PARTITION BY lang ORDER BY tok, doc_id) AS rn FROM b)
    SELECT s.lang AS "group", n_docs, tok_sum, tok_min, tok_max,
      p50.tok AS tok_p50, p90.tok AS tok_p90
    FROM s
    JOIN (SELECT r.lang, r.tok FROM r JOIN s ON r.lang = s.lang
          WHERE r.rn = CAST(ceil(0.5 * s.n_docs) AS BIGINT)) p50 ON p50.lang = s.lang
    JOIN (SELECT r.lang, r.tok FROM r JOIN s ON r.lang = s.lang
          WHERE r.rn = CAST(ceil(0.9 * s.n_docs) AS BIGINT)) p90 ON p90.lang = s.lang
    ORDER BY "group"""")) { (s, dir) =>
    Text.corpusStats(t(s, dir, "documents"), col("lang"),
      Text.tokenCount(col("text")), col("doc_id"))
      .orderBy("group")
  }

  // The PERSISTED-index form of the incremental near-dup admit: the
  // corpus band index + shingle sets are built once, written to disk
  // (range-partitioned/sorted for row-group pruning), read back, and
  // probed — the production loop where the frozen corpus is never
  // re-processed per batch. Same oracle as dedup_incremental_near: the
  // disk round-trip must change nothing.
  private val dedupIncrementalIndexed = Q("dedup_incremental_indexed",
    oracle = dedupIncrementalNear.oracle) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val ixDir = java.nio.file.Files.createTempDirectory("graft-q-ndix").toString
    Dedup.writeNearDupIndex(
      Dedup.buildNearDupIndex(docs.filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text"), ixDir)
    Dedup.incrementalNearDupNewFromIndex(
      Dedup.readNearDupIndex(s, ixDir),
      incoming = docs.filter(col("doc_id") % 3 === 0),
      idCol = "doc_id", textCol = "text", threshold = 0.8)
      .select("doc_id").orderBy("doc_id")
  }

  // Token-budget mixing — per-source token TARGETS (the "mix 5k en tokens
  // with 2k de" step), kept rows = salted-rank prefix of each group whose
  // inclusive token sum fits the budget. Budgets cut mid-group for
  // en/de/es, keep zh whole, and omit fr entirely — all three admit
  // regimes in one gate. The oracle replays the single-window rule; the
  // Spark side runs the two-pass distributed prefix sum (fixed rank-range
  // buckets, driver sees groups x buckets longs) — value equality proves
  // the decomposition exact.
  private val sampleTokenBudgetQ = Q("sample_token_budget", Some(s"""
    SELECT lang, doc_id FROM (
      SELECT lang, doc_id,
        sum(n_tok) OVER (PARTITION BY lang ORDER BY rk, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM (SELECT lang, doc_id, len($duckToks)::BIGINT AS n_tok,
        CAST(('0x' || substring(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS rk
        FROM documents))
    WHERE cum <= CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000
      WHEN 'es' THEN 2000 WHEN 'zh' THEN 100000 END
    ORDER BY lang, doc_id""")) { (s, dir) =>
    Sampling.sampleTokenBudget(t(s, dir, "documents"), col("doc_id"),
      col("lang"), Text.tokenCount(col("text")),
      budgets = Map("en" -> 5000L, "de" -> 2000L, "es" -> 2000L,
        "zh" -> 100000L))
      .select("lang", "doc_id").orderBy("lang", "doc_id")
  }

  private val sampleStratified = Q("sample_stratified", Some("""
    SELECT lang, doc_id FROM (
      SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        ORDER BY CAST(('0x' || substring(md5('stratn' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                 doc_id) AS rn
      FROM documents) WHERE rn <= 20 ORDER BY lang, doc_id""")) { (s, dir) =>
    Sampling.stratifiedTopN(t(s, dir, "documents"),
      col("doc_id"), col("lang"), n = 20)
      .select("lang", "doc_id").orderBy("lang", "doc_id")
  }

  // The whole pipeline as ONE composed query — what a user actually runs
  // before training: quality gate -> language filter -> exact dedup
  // (min-id canonical per md5 fingerprint) -> deterministic split ->
  // per-split manifest. Every stage is a library operator; the oracle
  // replays the identical chain in SQL (same stopword lists, same CASE
  // precedence as text_langid, same md5 split arithmetic as
  // sample_split). Scale shape: three narrow passes + one fingerprint
  // groupBy + one split agg — no all-pairs anything.
  // Shared by the batch gate and its STREAMING twin — the two must match
  // the same relational oracle.
  private lazy val curationOracleSql = s"""
    WITH sig AS (
      SELECT doc_id, text, len($duckToks)::BIGINT AS n_tokens,
        len(list_filter($duckToks, x -> lower(x) IN
          ('the','a','an','and','or','of','to','in','is','it')))::DOUBLE /
          greatest(len($duckToks), 1) AS stopword_ratio
      FROM documents),
    q AS (SELECT doc_id, text, n_tokens FROM sig
          WHERE n_tokens >= 30 AND stopword_ratio > 0),
    l AS (SELECT doc_id, text, n_tokens FROM (
        SELECT doc_id, text, n_tokens,
          ${langScoreSql("de")} AS s_de, ${langScoreSql("en")} AS s_en,
          ${langScoreSql("es")} AS s_es, ${langScoreSql("fr")} AS s_fr
        FROM q)
      WHERE greatest(s_de, s_en, s_es, s_fr) >= 0.08
        AND s_fr <> greatest(s_de, s_en, s_es, s_fr)
        AND s_es <> greatest(s_de, s_en, s_es, s_fr)
        AND s_en = greatest(s_de, s_en, s_es, s_fr)),
    d AS (SELECT doc_id, n_tokens FROM (
        SELECT doc_id, n_tokens,
          min(doc_id) OVER (PARTITION BY md5(text)) AS rep FROM l)
      WHERE doc_id = rep),
    s AS (SELECT doc_id, n_tokens,
        CASE WHEN h < 800 THEN 'train' WHEN h < 900 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT doc_id, n_tokens,
        CAST(('0x' || substring(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS h
      FROM d))
    SELECT split, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM s GROUP BY split ORDER BY split"""

  private val curationPipeline = Q("curation_pipeline", bench = true,
      oracle = Some(curationOracleSql)) { (s, dir) =>
    val quality = Text.qualitySignals(t(s, dir, "documents"))
      .filter(col("n_tokens") >= 30 && col("stopword_ratio") > 0)
    val english = Text.withLangId(quality, "text")
      .filter(col("lang_guess") === "en")
    // min-id canonical via ONE window pass (Dedup.keepFirst — the same
    // min-over-md5-partition formulation as the oracle): the previous
    // fingerprint SELF-JOIN (groupBy min + left_semi) evaluated the
    // whole quality+langid chain TWICE, once per join side (no exchange
    // reuse across an aggregate). Same winner set by definition
    // (doc_id is unique, so row_number()=1 ordered by doc_id ==
    // doc_id = min(doc_id) per fingerprint); r17 measured 9.24 -> 4.77 s
    // on the dedup stage at sf1.
    val canon = Dedup.keepFirst(english, md5(col("text")), "doc_id")
    canon
      .withColumn("split", Sampling.splitLabel(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("split")
  }

  // STREAMING curation twin: the same stage composition running as ONE
  // structured stream — quality scoring and langid are stateless per-row
  // expressions (streaming-safe by construction, no rewrite), exact
  // dedup is the stateful firstSeen operator. Winner ids come off the
  // stream; the split/agg summary is computed batch-side over them (the
  // stream decides membership, exactly like stream_dedup). Same oracle
  // as curation_pipeline — a corpus curated incrementally off a feed
  // must equal the batch curation of the same corpus.
  private val streamCuration = Q("stream_curation",
      Some(curationOracleSql)) { (s, dir) =>
    val winners = runFileStream(s, s"$dir/documents.parquet", "scur") {
      stream =>
        val quality = Text.qualitySignals(stream)
          .filter(col("n_tokens") >= 30 && col("stopword_ratio") > 0)
        val english = Text.withLangId(quality, "text")
          .filter(col("lang_guess") === "en")
        graft.streaming.StreamDedup.firstSeen(english,
          key = md5(col("text")), id = col("doc_id"))
    }
    Text.qualitySignals(
        t(s, dir, "documents")
          .join(winners.select(col("id").as("doc_id")), "doc_id"))
      .withColumn("split", Sampling.splitLabel(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("split")
  }

  private val multimodalFeatures = Q("multimodal_features", Some("""
    SELECT doc_id AS media_id, octet_length(encode(text))::BIGINT AS byte_len,
      md5(text) AS checksum
    FROM documents ORDER BY media_id""")) { (s, dir) =>
    // documents' UTF-8 bytes stand in for opaque media payloads; the stub
    // decoder + feature pipeline runs for real, the oracle checks the
    // parts DuckDB can recompute (payload length + checksum).
    val media = t(s, dir, "documents").select(
      col("doc_id").as("media_id"), lit("image").as("kind"),
      col("text").cast(BinaryType).as("payload"), lit("text/plain").as("mime"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms"))
    Multimodal.extractFeatures(media, Multimodal.FakeDecoder)
      .select("media_id", "byte_len", "checksum")
      .orderBy("media_id")
  }

  private val multimodalMixed = Q("multimodal_mixed", Some("""
    SELECT doc_id AS media_id,
      CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav' ELSE 'png' END AS format,
      CASE WHEN doc_id % 3 = 1 THEN 1
           ELSE LEAST(8, GREATEST(octet_length(encode(text)), 1)) END::BIGINT AS width,
      CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 4 END::BIGINT AS height,
      CASE WHEN doc_id % 3 = 1
           THEN LEAST(1000, GREATEST(octet_length(encode(text)), 1))
           ELSE 1 END::BIGINT AS n_frames,
      (CASE doc_id % 3
        WHEN 0 THEN 54 + ((3 * LEAST(8, GREATEST(octet_length(encode(text)), 1)) + 3) // 4) * 4 * 4
        WHEN 1 THEN 44 + 2 * LEAST(1000, GREATEST(octet_length(encode(text)), 1))
        ELSE NULL END)::BIGINT AS byte_len
    FROM documents ORDER BY media_id""")) { (s, dir) =>
    // REAL codecs end-to-end: each document's UTF-8 bytes become an actual
    // BMP / PCM-WAV / PNG payload (by doc_id mod 3), decoded back by the
    // magic-byte-routed real decoders, and the oracle replays the
    // dims/frame/size arithmetic in SQL. PNG's compressed size is
    // writer-dependent → byte_len NULL on both sides; its width/height
    // still prove a real PNG decode happened (only the decoder knows
    // them). Payload construction is a narrow per-row map; payloads never
    // shuffle (extractFeatures contract).
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val media = s.createDataFrame(
      docs.rdd.map { r =>
        val id = r.getLong(0)
        val raw = r.getString(1).getBytes("UTF-8")
        val n = math.max(1, raw.length)
        def b(i: Int): Byte = if (raw.isEmpty) 0 else raw(i % raw.length)
        val payload = (id % 3) match {
          case 0 =>
            val w = math.min(8, n)
            Multimodal.encodeBmpGray(w, 4, Array.tabulate(w * 4)(b))
          case 1 =>
            val frames = math.min(1000, n)
            Multimodal.encodeWavPcm16(
              Array.tabulate(frames)(i => (((b(i) & 0xff) - 128) * 256).toShort))
          case _ =>
            val w = math.min(8, n)
            Multimodal.encodePngGray(w, 4, Array.tabulate(w * 4)(b))
        }
        org.apache.spark.sql.Row(
          id, if (id % 3 == 1) "audio" else "image", payload,
          null, null, null, null)
      }, Multimodal.mediaSchema)
    Multimodal.extractFeatures(media, Multimodal.SniffDecoder())
      .select(col("media_id"),
        when(col("media_id") % 3 === 0, "bmp")
          .when(col("media_id") % 3 === 1, "wav")
          .otherwise("png").as("format"),
        col("width").cast(LongType).as("width"),
        col("height").cast(LongType).as("height"),
        col("n_frames").cast(LongType).as("n_frames"),
        when(col("media_id") % 3 === 2, lit(null).cast(LongType))
          .otherwise(col("byte_len")).as("byte_len"))
      .orderBy("media_id")
  }

  // Pre-flight corpus contract: asserts every load-bearing column of every
  // driver table is inside the engine's adaptable type envelope (one
  // actionable line per drift — the labeled-diff answer to round 5's silent
  // ns->us regen). The result is the contract's own static surface, so the
  // gate goes red EITHER on corpus drift (Spark side throws) or on a
  // contract edit that forgot its documented shape (oracle mismatch).
  private val dataContract = Q("data_contract", Some("""
    SELECT tbl, CAST(n_cols AS BIGINT) AS n_cols FROM (VALUES
      ('customer', 5), ('documents', 4), ('embeddings', 2), ('events', 6),
      ('lineitem', 8), ('nation', 3), ('orders', 6), ('part', 2),
      ('region', 2), ('supplier', 2)) AS t(tbl, n_cols)
    ORDER BY tbl""")) { (s, dir) =>
    graft.core.DataContract.enforce(s, dir)
    val rows = graft.core.DataContract.tables.toSeq.sortBy(_._1)
      .map { case (name, cols) => (name, cols.size.toLong) }
    s.createDataFrame(rows).toDF("tbl", "n_cols").orderBy("tbl")
  }

  // ----------------------------------------------------------------------
  // Registry
  // ----------------------------------------------------------------------

  val all: Seq[Q] = Seq(
    dataContract,
    q1Agg, q3Join,
    scanRange, saltedScan, saltedIndexLookup, indexLookup, sqlIndexLookup,
    indexRangeLookup, sqlIndexRange, sqlCellOrRoute,
    sqlCoveredLookup, sqlMultiGet, sqlWideScan, sqlCoveredProjection,
    sqlWideMultiGet,
    sqlIndexComposite, sqlIndexLeadingRange, sqlPrefixRoute,
    sqlIndexDoubleRange, sqlSignedRange, sqlWideAgg, sqlWideInsert,
    sqlWideUpdate, sqlWideDelete, sqlWideMerge, sqlWideSum, sqlWideTopN,
    sqlWideTimeTravel, sqlWideMetaDelete,
    indexGcLookup, coveredIndexLookup, streamCoveredMaintain,
    getPoint, getRowOrBefore, rowCounter,
    existsGet,
    dependentColumn, exportImport, multiGet, ttlScan,
    prefixFilter, columnPrefixFilter, valueFilterSubstr, valueFilterRegex,
    inclusiveStop, pageFilter, columnPagination,
    rowFilterRegex, qualifierFilter, timestampsFilter, columnCountGet,
    skipFilterQ, whileMatch, filterListOr, scvExclude, binaryPrefixScan,
    groupingMapperAgg,
    versionsLatest, timeRangeScan, jsonPropsAgg, resultFamilyMap,
    familyMapCollision, sessionize, streamSessionize,
    streamSessionizeLate,
    deleteFamilyScan, compactionScan, minorCompactionScan,
    incrementCounters, checkAndPut,
    snapshotScan, snapshotRestoreScan, snapshotGcScan, snapshotExportScan,
    snapshotExportIncremental,
    snapshotDiffScan,
    asofScan, bulkLoadScan,
    sqlCatalogScan, sqlAggPushdown, sqlBroadcastJoin, sqlRuntimePrune,
    sqlRuntimeIndexPrune, sqlOrRoute, sqlCompositeOr, sqlKeyRangeOr,
    sqlCrossOr, sqlRuntimeRangePrune, sqlRuntimeMultiPrune,
    sqlConjunctOr, sqlRuntimeClusterPrune, sqlRuntimeIndexRange,
    sqlMixedOr, sqlCellMixedOr, sqlCellRuntimeIndex, sqlRuntimePrefixPrune,
    sqlRouteGuard, sqlGuardLeading, sqlGuardHistogram,
    sqlDeleteScan, sqlUpdateScan, sqlMergeScan,
    copyTableScan, importTsvScan, importJsonScan, multiTableWriteQ,
    replicationStream, streamIndexMaintain, streamAutoCompact,
    streamWideFeed, streamWideDeletes,
    streamWindowAgg, streamEnrich, streamIntervalJoin, streamAsofJoin,
    asOfJoinQ, intervalJoinQ,
    dedupExact, dedupCanonical, streamDedup, streamDedupBatches,
    streamDedupEventTtl,
    dedupFingerprint, dedupWinnowing, dedupSpanExact, dedupNgramJaccard,
    dedupMinhashLsh, dedupIncremental, dedupIncrementalNear,
    dedupIncrementalIndexed,
    streamMinhashLsh, streamLshEventTtl,
    dedupClusters, dedupKeepCanonical, dedupKeepBest, dedupWithinDoc,
    dedupSimhash, textQuality, textGopher, textC4, textLangid, textNormalize,
    textRepetition, textRedact, textBm25,
    textPerplexity, textBm25Indexed,
    textTopNgrams, textBoilerplate, textClassifier, dedupContamination,
    contaminationSemantic,
    similarityTopk, similarityIvf, clusterKmeans, sampleClusterBalanced,
    similarityLshPlanes, similarityQuantized, similarityPq,
    dedupEmbedding, dedupSemantic, dedupSegments, dedupUrl,
    similarityMatryoshka, similarityMatryoshkaIvf, multimodalFeatures, multimodalMixed, sampleSplit,
    sampleWeighted, sampleUpsampled, sampleTemperature, sampleDsir,
    sampleShardShuffle,
    packSequences, packChunks, sampleStratified, sampleTokenBudgetQ, corpusStatsQ,
    curationPipeline, streamCuration)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap

  def benchNames: Seq[String] = all.filter(_.bench).map(_.name)
}
