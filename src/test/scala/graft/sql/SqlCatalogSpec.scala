package graft.sql

import graft.{Graft, SparkSpec}
import graft.catalog.{FamilyDescriptor, TableDescriptor}
import graft.core.Bytes
import graft.write.{Delete, Put}
import java.nio.file.Files
import org.apache.spark.sql.functions.{col, lit}

object SqlCatalogSpec {
  // foreachBatch accumulator (memory sink can't resume checkpoints)
  val streamed = scala.collection.mutable.ListBuffer.empty[(String, String, String)]
}

/** The SQL door: graft tables resolved and queryable through a DSv2
  * catalog — `spark.sql("... FROM graft_sql.t ...")` with row/family
  * pushdown reaching the inner parquet scan. */
class SqlCatalogSpec extends SparkSpec {

  private def b(s: String) = Bytes.toBytes(s)
  private def hex(s: String): String =
    "X'" + b(s).map(x => f"$x%02X").mkString + "'"

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-sqlcat").toString
    val g = Graft(spark, r)
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f"), FamilyDescriptor("g")), splitKeys = 4), 1L)
    g.table("t").put((1 to 50).map(i =>
      Put(b(f"r$i%03d")).add("f", b("q"), b(s"v$i")).add("g", b("q"), b(s"w$i"))), 2L)
    // overwrite r010's f:q and tombstone r011's whole f family — the SQL
    // view must show resolution, not raw cells
    g.table("t").put(Seq(Put(b("r010")).add("f", b("q"), b("v10b"))), 3L)
    g.table("t").delete(Seq(Delete(b("r011")).deleteFamily("f", 3L)), 3L)
    spark.conf.set("spark.sql.catalog.graft_sql", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_sql.root", r)
    r
  }

  test("SELECT over the catalog table returns the RESOLVED view") {
    root
    val out = spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_sql.t " +
        "WHERE family = 'f'")
    val rows = collectCells(out)
    assert(rows.size == 49, rows.size) // r011's f family tombstoned
    assert(rows.contains(("r010", "f", "q", 3L, "v10b"))) // latest version
    assert(!rows.exists(_._1 == "r011"))
    assert(rows.forall(_._2 == "f"))
  }

  test("row-range WHERE prunes via the scan spec down to the parquet source") {
    root
    val df = spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_sql.t " +
        "WHERE row >= X'72303130' AND row < X'72303230'") // 'r010'..'r020'
    assert(collectCells(df).map(_._1).forall(r => r >= "r010" && r < "r020"))
    assert(collectCells(df).map(_._1).size == 10 * 1) // 10 rows (dedup'd keys)

    // the same translation, asserted at the seam: the builder must turn
    // the pushed bounds into a Scan whose inner plan carries parquet
    // PushedFilters on row
    val engine = new graft.catalog.Catalog(spark, root)
    val builder = new GraftScanBuilder(engine, "t")
    import org.apache.spark.sql.sources
    val residual = builder.pushFilters(Array(
      sources.GreaterThanOrEqual("row", b("r010")),
      sources.LessThan("row", b("r020")),
      sources.EqualTo("family", "f")))
    assert(residual.isEmpty)
    assert(builder.pushedFilters().length == 3)
    val v1 = builder.build().asInstanceOf[GraftV1Scan]
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      v1.resolvedFrame(spark).explain("formatted")
    }
    val pushed = out.toString("UTF-8").linesIterator
      .filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("row") && pushed.contains("family"), pushed)
  }

  test("qualifier equality pushes as a column projection; LIMIT pushes down") {
    val r2 = Files.createTempDirectory("graft-sqlcat-q").toString
    val g = Graft(spark, r2)
    g.createTable(TableDescriptor("tq", Seq(FamilyDescriptor("f")), splitKeys = 2), 1L)
    g.table("tq").put((1 to 20).map(i =>
      Put(b(f"r$i%03d")).add("f", b("qa"), b(s"a$i")).add("f", b("qb"), b(s"b$i"))), 2L)
    spark.conf.set("spark.sql.catalog.graft_sqlq", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_sqlq.root", r2)
    val out = spark.sql("SELECT row, family, qualifier, ts, value FROM graft_sqlq.tq " +
      "WHERE family = 'f' AND qualifier = X'7161'") // 'qa'
    val rows = collectCells(out)
    assert(rows.size == 20 && rows.forall(_._3 == "qa"), rows.take(3))

    val engine = new graft.catalog.Catalog(spark, r2)
    import org.apache.spark.sql.sources
    // qualifier listed BEFORE family: acceptance must be order-independent
    val builder = new GraftScanBuilder(engine, "tq")
    val residual = builder.pushFilters(Array(
      sources.EqualTo("qualifier", b("qa")),
      sources.EqualTo("family", "f")))
    assert(residual.isEmpty && builder.pushedFilters().length == 2)
    // a second qualifier equality must stay residual (∧ would become ∨)
    val b2 = new GraftScanBuilder(engine, "tq")
    assert(b2.pushFilters(Array(sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("qa")),
      sources.EqualTo("qualifier", b("qb")))).length == 1)
    // without a family projection, qualifier stays residual
    val b3 = new GraftScanBuilder(engine, "tq")
    assert(b3.pushFilters(Array(sources.EqualTo("qualifier", b("qa")))).length == 1)

    // LIMIT: advisory push lands on the resolved frame
    assert(builder.pushLimit(5))
    val v1 = builder.build().asInstanceOf[GraftV1Scan]
    assert(v1.resolvedFrame(spark).count() == 5)
    assert(spark.sql("SELECT * FROM graft_sqlq.tq LIMIT 7").count() == 7)
  }

  test("DELETE writes tombstones; TRUNCATE empties; old versions unaffected") {
    val r3 = Files.createTempDirectory("graft-sqlcat-del").toString
    val g = Graft(spark, r3)
    g.createTable(TableDescriptor("td", Seq(FamilyDescriptor("f")), splitKeys = 2), 1L)
    g.table("td").put((1 to 10).map(i =>
      Put(b(f"r$i%02d")).add("f", b("q"), b(s"v$i"))), 2L)
    spark.conf.set("spark.sql.catalog.graft_sqld", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_sqld.root", r3)
    val dataVersion = g.catalog.currentManifest("td").version

    // row-range DELETE -> DeleteFamily tombstones, resolved at read time
    spark.sql("DELETE FROM graft_sqld.td " +
      "WHERE row >= X'723033' AND row < X'723037'") // 'r03'..'r07'
    val left = collectCells(spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_sqld.td")).map(_._1)
    assert(left == Set("r01", "r02", "r07", "r08", "r09", "r10"), left)
    // the pre-delete manifest version still reads the full table
    val asOf = collectCells(spark.sql(
      s"SELECT row, family, qualifier, ts, value FROM graft_sqld.td VERSION AS OF $dataVersion"))
    assert(asOf.map(_._1) == (1 to 10).map(i => f"r$i%02d").toSet)

    // TRUNCATE -> compaction-to-empty commit; old version still readable
    spark.sql("TRUNCATE TABLE graft_sqld.td")
    assert(spark.sql("SELECT * FROM graft_sqld.td").isEmpty)
    assert(collectCells(spark.sql(
      s"SELECT row, family, qualifier, ts, value FROM graft_sqld.td VERSION AS OF $dataVersion"))
      .map(_._1) == (1 to 10).map(i => f"r$i%02d").toSet)

    // a read-only table refuses TRUNCATE like it refuses INSERT/DELETE
    g.catalog.alterTable("td",
      g.catalog.currentManifest("td").descriptor.copy(readOnly = true), 99L)
    val e = intercept[Exception] { spark.sql("TRUNCATE TABLE graft_sqld.td") }
    assert(e.getMessage.contains("read-only"), e.getMessage)
  }

  test("INSERT INTO appends through the manifest catalog") {
    root
    val newCells = cells(Seq(
      graft.core.Cell.put(b("r999"), "f", b("q"), 9L, b("new"))))
    newCells.createOrReplaceTempView("ins_src")
    spark.sql("INSERT INTO graft_sql.t SELECT * FROM ins_src")
    val got = collectCells(spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_sql.t " +
        "WHERE row = X'72393939'"))
    assert(got == Set(("r999", "f", "q", 9L, "new")))
  }

  test("SHOW TABLES lists catalog tables (flat namespace)") {
    root
    val names = spark.sql("SHOW TABLES IN graft_sql").collect()
      .map(_.getAs[String]("tableName")).toSet
    assert(names.contains("t"), names)
  }

  test("CREATE TABLE / DROP TABLE with family descriptors in TBLPROPERTIES") {
    root
    spark.sql("CREATE TABLE graft_sql.u " +
      "TBLPROPERTIES('families'='a:maxVersions=1;b:maxVersions=5:ttlMs=1000')")
    val engine = new graft.catalog.Catalog(spark, root)
    val d = engine.currentManifest("u").descriptor
    assert(d.families == Seq(
      FamilyDescriptor("a", maxVersions = 1),
      FamilyDescriptor("b", maxVersions = 5, ttlMs = Some(1000L))))
    spark.sql("DROP TABLE graft_sql.u")
    assert(!engine.tableExists("u"))
  }

  test("VERSION AS OF / TIMESTAMP AS OF read the pinned manifest") {
    root
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("tt", Seq(FamilyDescriptor("f"))), 1000L)
    g.table("tt").put(Seq(Put(b("k1")).add("f", b("q"), b("v1"))), 2000L)
    val vAfterFirst = g.catalog.currentManifest("tt").version
    g.table("tt").put(Seq(Put(b("k2")).add("f", b("q"), b("v2"))), 60000L)

    val now = collectCells(spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_sql.tt"))
    assert(now.map(_._1) == Set("k1", "k2"))

    val versioned = collectCells(spark.sql(
      s"SELECT row, family, qualifier, ts, value FROM graft_sql.tt " +
        s"VERSION AS OF $vAfterFirst"))
    assert(versioned.map(_._1) == Set("k1"), versioned)

    // manifests carry createdMs 2000 and 60000: a timestamp between the
    // two pins the first append
    val timed = collectCells(spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_sql.tt " +
        "TIMESTAMP AS OF TIMESTAMP '1970-01-01 00:00:30+00:00'"))
    assert(timed.map(_._1) == Set("k1"), timed)

    // a time-travel view is read-only
    val err = intercept[Exception] {
      spark.sql(s"INSERT INTO graft_sql.tt VERSION AS OF $vAfterFirst " +
        "SELECT * FROM graft_sql.tt")
    }
    assert(err.getMessage != null)
  }

  test("spark.readStream.table streams the append feed; compaction invisible") {
    root
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("st", Seq(FamilyDescriptor("f"))), 1L)
    g.table("st").put(Seq(Put(b("r1")).add("f", b("q"), 1L, b("v1"))), 1L)
    val work = Files.createTempDirectory("graft-sqlstream").toString
    def run(): Unit = {
      val q = spark.readStream.table("graft_sql.st")
        .writeStream
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.collect().map { r =>
            (new String(r.getAs[Array[Byte]]("row"), "UTF-8"),
              r.getAs[String]("family"),
              Option(r.getAs[Array[Byte]]("value"))
                .map(new String(_, "UTF-8")).orNull)
          }
          SqlCatalogSpec.streamed.synchronized {
            SqlCatalogSpec.streamed ++= rows
          }: Unit
        }
        .start()
      q.awaitTermination()
    }
    def seen(): Seq[(String, String, String)] =
      SqlCatalogSpec.streamed.synchronized(SqlCatalogSpec.streamed.toList)

    run() // replay of the committed append
    assert(seen() == Seq(("r1", "f", "v1")), seen())
    // compaction must not re-ship; a new append must tail in
    g.table("st").majorCompact(2L)
    g.table("st").put(Seq(Put(b("r2")).add("f", b("q"), 3L, b("v2"))), 3L)
    run()
    assert(seen().sorted == Seq(("r1", "f", "v1"), ("r2", "f", "v2")), seen())

    // a row-bound WHERE pushes into the streaming reader (parquet
    // FilterPredicate + per-record check). A LIVE sub-bound row (r0,
    // appended post-compaction so the fresh replay would ship it) makes
    // the exclusion assertion non-vacuous: if the claimed bound were
    // silently dropped, r0 would arrive and fail the assert.
    g.table("st").put(Seq(Put(b("r0")).add("f", b("q"), 4L, b("v0"))), 4L)
    val filtered = scala.collection.mutable.ListBuffer.empty[String]
    val q2 = spark.readStream.table("graft_sql.st")
      .where(col("row") >= lit(b("r2")))
      .writeStream
      .option("checkpointLocation", s"$work/ckpt2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect()
          .map(r => new String(r.getAs[Array[Byte]]("row"), "UTF-8"))
        filtered.synchronized { filtered ++= rows }: Unit
      }
      .start()
    q2.awaitTermination()
    assert(filtered.synchronized(filtered.toList) == Seq("r2"), filtered)

    // column pruning: a projected stream (reader requests a schema subset
    // from the file footer) still delivers correct values. This is a
    // FRESH replay after the compaction above, so only appends still
    // referenced by the manifest chain ship (r2): compacted-away history
    // lives in the table state, not the feed — the same way the
    // reference cannot replay WAL segments its log cleaner removed.
    val projected = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    val q3 = spark.readStream.table("graft_sql.st")
      .select("row", "ts")
      .writeStream
      .option("checkpointLocation", s"$work/ckpt3")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect().map(r =>
          (new String(r.getAs[Array[Byte]]("row"), "UTF-8"), r.getAs[Long]("ts")))
        projected.synchronized { projected ++= rows }: Unit
      }
      .start()
    q3.awaitTermination()
    assert(projected.synchronized(projected.toList).sorted ==
      Seq(("r0", 4L), ("r2", 3L)), projected)
  }

  test("aggregate pushdown: grouped COUNT/MIN/MAX runs inside the inner plan") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    root
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("ag",
      Seq(FamilyDescriptor("f"), FamilyDescriptor("h"))), 1L)
    g.table("ag").put(Seq(
      Put(b("r1")).add("f", b("q1"), 10L, b("a")).add("f", b("q2"), 20L, b("b"))
        .add("h", b("q1"), 30L, b("c")),
      Put(b("r2")).add("f", b("q1"), 40L, b("d"))), 1L)

    val agg = spark.sql(
      "SELECT family, count(*) AS n, min(ts) AS mn, max(ts) AS mx " +
        "FROM graft_sql.ag GROUP BY family ORDER BY family")
    // complete pushdown: no Aggregate node survives in the outer plan
    assert(agg.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.isEmpty,
      agg.queryExecution.optimizedPlan)
    assert(agg.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq == Seq(("f", 3L, 10L, 40L), ("h", 1L, 30L, 30L)))

    // aggregation composes over the RESOLVED view: a family tombstone
    // changes the counts the pushed aggregate sees
    g.table("ag").delete(Seq(Delete(b("r1")).deleteFamily("f", 25L)), 2L)
    val after = spark.sql(
      "SELECT family, count(*) AS n FROM graft_sql.ag GROUP BY family ORDER BY family")
    assert(after.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.isEmpty)
    // r1/f cells at ts 10,20 are masked (<= 25); ts 40 on r2 survives
    assert(after.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("f", 1L), ("h", 1L)))

    // binary min/max is refused -> Spark keeps its own Aggregate, same result
    val binAgg = spark.sql("SELECT min(row) AS mr FROM graft_sql.ag")
    assert(binAgg.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.nonEmpty)
    assert(new String(binAgg.collect()(0).getAs[Array[Byte]](0), "UTF-8") == "r1")

    // global (ungrouped) count over a row-bounded WHERE composes with the
    // pushed filter
    val bounded = spark.sql(
      s"SELECT count(*) AS n FROM graft_sql.ag WHERE row >= ${hex("r2")}")
    assert(bounded.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.isEmpty)
    assert(bounded.collect()(0).getLong(0) == 1L)

    // grouping by a binary column with a CAST in the projection (the
    // sql_agg_pushdown gate-query shape) still pushes: the cast stays in
    // the outer Project, the grouping reference is the plain column
    val castAgg = spark.sql(
      "SELECT CAST(qualifier AS STRING) AS q, count(*) AS n " +
        "FROM graft_sql.ag GROUP BY qualifier ORDER BY q")
    assert(castAgg.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.isEmpty,
      castAgg.queryExecution.optimizedPlan)
    // post-tombstone visible cells: r1/h:q1 (ts 30) and r2/f:q1 (ts 40)
    assert(castAgg.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("q1", 2L)))

    // SUM/AVG on exact integral columns push completely too
    val sumAgg = spark.sql(
      "SELECT family, sum(ts) AS s, avg(ts) AS a " +
        "FROM graft_sql.ag GROUP BY family ORDER BY family")
    assert(sumAgg.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.isEmpty,
      sumAgg.queryExecution.optimizedPlan)
    assert(sumAgg.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2))).toSeq == Seq(("f", 40L, 40.0), ("h", 30L, 30.0)))
  }

  test("ORDER BY + LIMIT runs as top-k inside the inner plan (cell door)") {
    root
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("tk", Seq(FamilyDescriptor("f"))), 1L)
    g.table("tk").put((1 to 20).map(i =>
      Put(b(s"r%02d".format(i))).add("f", b("q"), i.toLong, b(s"v$i"))), 1L)
    val q = spark.sql(
      "SELECT ts, CAST(value AS STRING) AS v FROM graft_sql.tk " +
        "ORDER BY ts DESC LIMIT 2")
    assert(q.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((20L, "v20"), (19L, "v19")))
    // seam: builder-level translation + inner TakeOrderedAndProject
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
    val bld = new GraftScanBuilder(g.catalog, "tk")
    assert(bld.pushTopN(
      Array(Expressions.sort(Expressions.column("ts"), SortDirection.DESCENDING)), 2))
    val scan = bld.build().asInstanceOf[GraftV1Scan]
    assert(scan.pushedTopN.isDefined)
    assert(scan.resolvedFrame(spark).queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("manifest-size statistics flow to Catalyst and auto-broadcast joins") {
    root
    val engine = new graft.catalog.Catalog(spark, root)
    // the v2 scan reports the manifest's live data-dir bytes
    val scan = new GraftScanBuilder(engine, "t").build().asInstanceOf[GraftV1Scan]
    val st = scan.estimateStatistics()
    assert(st.sizeInBytes.isPresent && st.sizeInBytes.getAsLong > 0)
    assert(st.sizeInBytes.getAsLong ==
      engine.manifestBytes(engine.currentManifest("t")))
    // ... and reach the optimizer's sizing (not the huge DSv2 default)
    val logical = spark.sql("SELECT row, value FROM graft_sql.t")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(logical > 0 && logical < 10L * 1024 * 1024, logical)
    // a join against a frame too big to broadcast plans the graft side
    // as the BROADCAST side with no hint — the stats did it
    val big = spark.range(0, 20000000L).select(
      col("id").cast("string").cast("binary").as("jk"))
    val joined = spark.sql("SELECT row, value FROM graft_sql.t WHERE family='f'")
      .join(big, col("row") === col("jk"))
    assert(joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), joined.queryExecution.executedPlan)
    // a pushed top-k also bounds the reported row count
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
    val bld2 = new GraftScanBuilder(engine, "t")
    assert(bld2.pushTopN(
      Array(Expressions.sort(Expressions.column("ts"), SortDirection.DESCENDING)), 7))
    val st2 = bld2.build().asInstanceOf[GraftV1Scan].estimateStatistics()
    assert(st2.numRows.isPresent && st2.numRows.getAsLong == 7L)
  }

  test("maxVersionsPerTrigger bounds each micro-batch to n manifest versions") {
    root
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("adm", Seq(FamilyDescriptor("f"))), 1L)
    // three separate appends = three manifest versions of backlog
    (1 to 3).foreach { i =>
      g.table("adm").put(Seq(Put(b(s"r$i")).add("f", b("q"), i.toLong, b(s"v$i"))), i.toLong)
    }
    val work = Files.createTempDirectory("graft-adm").toString
    val batches = scala.collection.mutable.ListBuffer.empty[Seq[String]]
    val q = spark.readStream
      .option("maxVersionsPerTrigger", "1")
      .table("graft_sql.adm")
      .writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect()
          .map(r => new String(r.getAs[Array[Byte]]("row"), "UTF-8")).toSeq
        batches.synchronized { batches += rows }: Unit
      }
      .start()
    q.awaitTermination()
    val all = batches.synchronized(batches.toList)
    // the full backlog arrives, but never more than one version per batch
    assert(all.flatten.sorted == Seq("r1", "r2", "r3"), all)
    assert(all.forall(_.size <= 1), s"a batch exceeded the version cap: $all")
    assert(all.count(_.nonEmpty) == 3, all)
    // without the cap, the same fresh replay drains in ONE batch
    val one = scala.collection.mutable.ListBuffer.empty[Int]
    val q2 = spark.readStream.table("graft_sql.adm")
      .writeStream
      .option("checkpointLocation", s"$work/ckpt2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        one.synchronized { one += batch.collect().length }: Unit
      }
      .start()
    q2.awaitTermination()
    assert(one.synchronized(one.toList).filter(_ > 0) == List(3), one)
  }

  test("streaming resumes after manifest history pruning (nearest retained offset)") {
    root
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("pr", Seq(FamilyDescriptor("f"))), 1L)
    g.table("pr").put(Seq(Put(b("a")).add("f", b("q"), 1L, b("v1"))), 1L)
    val work = Files.createTempDirectory("graft-prune").toString
    val got = scala.collection.mutable.ListBuffer.empty[String]
    def run(): Unit = {
      val q = spark.readStream.table("graft_sql.pr")
        .writeStream
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.collect()
            .map(r => new String(r.getAs[Array[Byte]]("row"), "UTF-8"))
          got.synchronized { got ++= rows }: Unit
        }
        .start()
      q.awaitTermination()
    }
    run()
    assert(got.synchronized(got.toList) == Seq("a"))
    // prune history PAST the checkpointed offset, then append more: the
    // stream must resume (fall back to nearest retained version), not
    // crash-loop; the at-least-once contract allows re-shipping "a"
    g.table("pr").put(Seq(Put(b("b")).add("f", b("q"), 2L, b("v2"))), 2L)
    g.catalog.expireVersions("pr", keep = 1)
    run()
    val after = got.synchronized(got.toList)
    assert(after.contains("b"), after)
  }

  test("a cloned table's adopted dirs do not enter its own stream (WAL bypass)") {
    root
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("src2", Seq(FamilyDescriptor("f"))), 1L)
    g.table("src2").put(Seq(Put(b("x")).add("f", b("q"), 1L, b("v"))), 1L)
    g.snapshot("s2", "src2", 2L)
    g.cloneSnapshot("s2", "cl2", 3L)
    // batch read of the clone sees the data; its stream ships NOTHING —
    // the dirs are adopted by reference from src2 (the reference's bulk
    // loads bypass the WAL the same way)
    assert(collectCells(spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_sql.cl2")).size == 1)
    val work = Files.createTempDirectory("graft-clone").toString
    val got = scala.collection.mutable.ListBuffer.empty[String]
    val q = spark.readStream.table("graft_sql.cl2")
      .writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect()
          .map(r => new String(r.getAs[Array[Byte]]("row"), "UTF-8"))
        got.synchronized { got ++= rows }: Unit
      }
      .start()
    q.awaitTermination()
    assert(got.synchronized(got.toList).isEmpty, got)
    // but the clone's OWN subsequent appends do stream
    g.table("cl2").put(Seq(Put(b("y")).add("f", b("q"), 4L, b("w"))), 4L)
    val q2 = spark.readStream.table("graft_sql.cl2")
      .writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect()
          .map(r => new String(r.getAs[Array[Byte]]("row"), "UTF-8"))
        got.synchronized { got ++= rows }: Unit
      }
      .start()
    q2.awaitTermination()
    assert(got.synchronized(got.toList) == Seq("y"), got)
  }

  test("SELECT sees maxVersions from the family descriptor (resolution knobs)") {
    root
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("v", Seq(FamilyDescriptor("m", maxVersions = 2))), 1L)
    g.table("v").put(Seq(Put(b("k")).add("m", b("q"), b("v1"))), 10L)
    g.table("v").put(Seq(Put(b("k")).add("m", b("q"), b("v2"))), 20L)
    g.table("v").put(Seq(Put(b("k")).add("m", b("q"), b("v3"))), 30L)
    val got = collectCells(spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_sql.v"))
    // scan default maxVersions=1 — the SQL view is the latest visible cell
    assert(got == Set(("k", "m", "q", 30L, "v3")))
  }

  test("value equality routes through a registered index transparently") {
    val r = Files.createTempDirectory("graft-sqlix").toString
    val g = Graft(spark, r)
    g.createTable(TableDescriptor("tix", Seq(FamilyDescriptor("f")),
      splitKeys = 2), 1L)
    g.table("tix").put((1 to 40).map(i =>
      Put(b(f"r$i%03d")).add("f", b("city"), 2L,
          b(if (i % 10 == 3) "paris" else "other"))
        .add("f", b("pop"), 2L, b(s"p$i"))), 2L)
    g.createIndex("tix", "f", b("city"), 3L)
    spark.conf.set("spark.sql.catalog.graft_ix", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ix.root", r)
    // end-to-end: the query answers through the index, same result as the
    // full-scan formulation (the oracle's semantics)
    val out = spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_ix.tix " +
        s"WHERE family = 'f' AND qualifier = ${hex("city")} " +
        s"AND value = ${hex("paris")}")
    assert(collectCells(out).map(_._1) == Set("r003", "r013", "r023", "r033"))

    // the seam: a qualifying predicate set routes (usedIndexTable set and
    // the inner plan probes the index table); near-misses do not
    val engine = new graft.catalog.Catalog(spark, r)
    import org.apache.spark.sql.sources
    def built(filters: Array[sources.Filter]): GraftV1Scan = {
      val builder = new GraftScanBuilder(engine, "tix")
      builder.pushFilters(filters)
      builder.build().asInstanceOf[GraftV1Scan]
    }
    val routed = built(Array(
      sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("city")),
      sources.EqualTo("value", b("paris"))))
    assert(routed.usedIndexTable.contains("tix_idx_f_63697479"))
    val innerOut = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(innerOut)) {
      routed.resolvedFrame(spark).explain("formatted")
    }
    val inner = innerOut.toString("UTF-8")
    assert(inner.contains("tix_idx_f_63697479"),
      s"index table not in the routed inner plan:\n$inner")
    assert(inner.contains("LeftSemi"), s"no semi-join gather:\n$inner")
    // IN-list routes too
    assert(built(Array(
      sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("city")),
      sources.In("value", Array(b("paris"), b("other")))))
      .usedIndexTable.isDefined)
    // no value predicate -> no routing
    assert(built(Array(sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("city")))).usedIndexTable.isEmpty)
    // unindexed qualifier -> no routing
    assert(built(Array(sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("pop")),
      sources.EqualTo("value", b("p7")))).usedIndexTable.isEmpty)
    // no qualifier projection -> no routing (the index covers one column)
    assert(built(Array(sources.EqualTo("family", "f"),
      sources.EqualTo("value", b("paris")))).usedIndexTable.isEmpty)
    // time travel never routes (the index reflects the present)
    val pinnedBuilder = new GraftScanBuilder(engine, "tix",
      pinned = Some(engine.currentManifest("tix")))
    pinnedBuilder.pushFilters(Array(
      sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("city")),
      sources.EqualTo("value", b("paris"))))
    assert(pinnedBuilder.build().asInstanceOf[GraftV1Scan]
      .usedIndexTable.isEmpty)
  }

  test("value OR-of-probes routes as one pass; row OR scopes like IN") {
    val r = Files.createTempDirectory("graft-sqlor").toString
    val g = Graft(spark, r)
    g.createTable(TableDescriptor("tor", Seq(FamilyDescriptor("f")),
      splitKeys = 2), 1L)
    g.table("tor").put((1 to 40).map(i =>
      Put(b(f"r$i%03d")).add("f", b("city"), 2L,
        b(if (i % 10 == 3) "paris" else if (i % 10 == 7) "rome" else "other"))),
      2L)
    g.createIndex("tor", "f", b("city"), 3L)
    spark.conf.set("spark.sql.catalog.graft_or", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_or.root", r)
    // end-to-end: equality arm OR range arm, answered in one probe pass
    val out = spark.sql(
      "SELECT row, value FROM graft_or.tor " +
        s"WHERE family = 'f' AND qualifier = ${hex("city")} " +
        s"AND (value = ${hex("paris")} OR " +
        s"(value >= ${hex("rome")} AND value < ${hex("romf")}))")
    assert(out.collect().map(x =>
      new String(x.getAs[Array[Byte]]("row"), "UTF-8")).toSet ==
      (1 to 40).filter(i => i % 10 == 3 || i % 10 == 7)
        .map(i => f"r$i%03d").toSet)
    // seam: the OR routes through the index (one probeOr pass)
    val engine = new graft.catalog.Catalog(spark, r)
    import org.apache.spark.sql.sources
    val bld = new GraftScanBuilder(engine, "tor")
    bld.pushFilters(Array(
      sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("city")),
      sources.Or(sources.EqualTo("value", b("paris")),
        sources.And(sources.GreaterThanOrEqual("value", b("rome")),
          sources.LessThan("value", b("romf"))))))
    val routed = bld.build().asInstanceOf[GraftV1Scan]
    assert(routed.usedIndexTable.contains("tor_idx_f_63697479"))
    val innerOut = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(innerOut)) {
      routed.resolvedFrame(spark).explain("formatted")
    }
    assert(innerOut.toString("UTF-8").contains("LeftSemi"))
    // a conjunct predicate takes precedence over the OR for routing
    val bld2 = new GraftScanBuilder(engine, "tor")
    bld2.pushFilters(Array(
      sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("city")),
      sources.EqualTo("value", b("paris")),
      sources.Or(sources.EqualTo("value", b("paris")),
        sources.EqualTo("value", b("rome")))))
    assert(bld2.build().asInstanceOf[GraftV1Scan].usedIndexTable.isDefined)
    // `row = a OR row = b` scopes the scan like the IN shape
    val orRows = spark.sql(
      "SELECT row, value FROM graft_or.tor " +
        s"WHERE row = ${hex("r003")} OR row = ${hex("r017")}")
    assert(orRows.collect().map(x =>
      new String(x.getAs[Array[Byte]]("row"), "UTF-8")).toSet ==
      Set("r003", "r017"))
    // row-RANGE disjunction (`row < a OR row >= b`): pruning-only byte
    // ranges, residual-exact
    val orRanges = spark.sql(
      "SELECT row, value FROM graft_or.tor " +
        s"WHERE row < ${hex("r003")} OR " +
        s"(row >= ${hex("r010")} AND row < ${hex("r012")}) OR " +
        s"row >= ${hex("r039")}")
    assert(orRanges.collect().map(x =>
      new String(x.getAs[Array[Byte]]("row"), "UTF-8")).toSet ==
      Set("r001", "r002", "r010", "r011", "r039", "r040"))
  }

  test("MIXED row/value OR routes: row range off the scan, value arm " +
      "through the index") {
    // the reference's RowFilter-OR-SingleColumnValueFilter FilterList on
    // its native surface (r12): row disjuncts = exact byte ranges,
    // value disjuncts probe the index for rows OUTSIDE those ranges
    val r = Files.createTempDirectory("graft-sqlmix").toString
    val g = Graft(spark, r)
    g.createTable(TableDescriptor("tmx", Seq(FamilyDescriptor("f")),
      splitKeys = 2), 1L)
    g.table("tmx").put((1 to 40).map(i =>
      Put(b(f"r$i%03d")).add("f", b("city"), 2L,
        b(if (i % 10 == 3) "paris" else "other"))), 2L)
    g.createIndex("tmx", "f", b("city"), 3L)
    spark.conf.set("spark.sql.catalog.graft_mx",
      classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_mx.root", r)
    val out = spark.sql(
      "SELECT row, value FROM graft_mx.tmx " +
        s"WHERE family = 'f' AND qualifier = ${hex("city")} " +
        s"AND (row < ${hex("r005")} OR value = ${hex("paris")})")
    assert(out.collect().map(x =>
      new String(x.getAs[Array[Byte]]("row"), "UTF-8")).toSet ==
      (1 to 40).filter(i => i < 5 || i % 10 == 3)
        .map(i => f"r$i%03d").toSet)
    // seam: the mixed route fired (1 row-range arm, the city index)
    val engine = new graft.catalog.Catalog(spark, r)
    import org.apache.spark.sql.sources
    val bld = new GraftScanBuilder(engine, "tmx")
    bld.pushFilters(Array(
      sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("city")),
      sources.Or(sources.LessThan("row", b("r005")),
        sources.EqualTo("value", b("paris")))))
    val routed = bld.build().asInstanceOf[GraftV1Scan]
    assert(routed.mixedOrShape.exists { case (n, ix) =>
      n == 1 && ix == "tmx_idx_f_63697479" }, routed.mixedOrShape)
    assert(routed.usedIndexTable.contains("tmx_idx_f_63697479"))
    // a pure value OR keeps the tighter probeOr route (no mixed shape),
    // and a mixed tree over an UNINDEXED qualifier stays residual-only
    val bld2 = new GraftScanBuilder(engine, "tmx")
    bld2.pushFilters(Array(
      sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("city")),
      sources.Or(sources.EqualTo("value", b("paris")),
        sources.EqualTo("value", b("rome")))))
    assert(bld2.build().asInstanceOf[GraftV1Scan].mixedOrShape.isEmpty)
    g.table("tmx").put((1 to 40).map(i =>
      Put(b(f"r$i%03d")).add("f", b("pop"), 4L, b(s"p${i % 5}"))), 4L)
    val unidx = spark.sql(
      "SELECT row, value FROM graft_mx.tmx " +
        s"WHERE family = 'f' AND qualifier = ${hex("pop")} " +
        s"AND (row < ${hex("r005")} OR value = ${hex("p3")})")
    assert(unidx.collect().map(x =>
      new String(x.getAs[Array[Byte]]("row"), "UTF-8")).toSet ==
      (1 to 40).filter(i => i < 5 || i % 5 == 3)
        .map(i => f"r$i%03d").toSet)
  }

  test("row IN pushes the multiGet scope to the parquet scan") {
    val r = Files.createTempDirectory("graft-sqlmget").toString
    val g = Graft(spark, r)
    g.createTable(TableDescriptor("tm", Seq(FamilyDescriptor("f")),
      splitKeys = 2), 1L)
    g.table("tm").put((1 to 50).map(i =>
      Put(b(f"r$i%03d")).add("f", b("q"), 2L, b(s"v$i"))), 2L)
    spark.conf.set("spark.sql.catalog.graft_mg", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_mg.root", r)
    val out = spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_mg.tm " +
        s"WHERE row IN (${hex("r007")}, ${hex("r031")}, ${hex("r999")})")
    assert(collectCells(out).map(_._1) == Set("r007", "r031"))
    // the seam: the key disjunction reaches the inner parquet scan
    val engine = new graft.catalog.Catalog(spark, r)
    import org.apache.spark.sql.sources
    val builder = new GraftScanBuilder(engine, "tm")
    builder.pushFilters(Array(
      sources.In("row", Array(b("r007"), b("r031")))))
    val keyed = builder.build().asInstanceOf[GraftV1Scan]
    val innerOut = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(innerOut)) {
      keyed.resolvedFrame(spark).explain("formatted")
    }
    val inner = innerOut.toString("UTF-8")
    assert(inner.contains("EqualTo(row") || inner.contains("In(row"),
      s"row keys not pushed into the scan:\n$inner")
    // salted table: the same IN scopes via JVM-side salted keys and
    // returns logical rows
    val g2 = Graft(spark, Files.createTempDirectory("graft-sqlmgs").toString)
    g2.createTable(TableDescriptor("tms", Seq(FamilyDescriptor("f")),
      splitKeys = 2, saltBuckets = 8), 1L)
    g2.table("tms").put((1 to 50).map(i =>
      Put(b(f"r$i%03d")).add("f", b("q"), 2L, b(s"v$i"))), 2L)
    spark.conf.set("spark.sql.catalog.graft_mgs", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_mgs.root", g2.root)
    val outS = spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_mgs.tms " +
        s"WHERE row IN (${hex("r007")}, ${hex("r031")})")
    assert(collectCells(outS).map(_._1) == Set("r007", "r031"))
  }

  test("a COVERED index answers the SQL route index-only — no main scan") {
    val r = Files.createTempDirectory("graft-sqlcov").toString
    val g = Graft(spark, r)
    g.createTable(TableDescriptor("tcov", Seq(FamilyDescriptor("f")),
      splitKeys = 2, immutableRows = true), 1L)
    g.table("tcov").put((1 to 40).map(i =>
      Put(b(f"r$i%03d")).add("f", b("city"), 2L,
          b(if (i % 10 == 3) "paris" else "other"))
        .add("f", b("pop"), 2L, b(s"p$i"))), 2L)
    g.createIndex("tcov", "f", b("city"), 3L, covered = Seq("f" -> b("pop")))
    spark.conf.set("spark.sql.catalog.graft_cv", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cv.root", r)
    val out = spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_cv.tcov " +
        s"WHERE family = 'f' AND qualifier = ${hex("city")} " +
        s"AND value = ${hex("paris")}")
    assert(collectCells(out).map(_._1) == Set("r003", "r013", "r023", "r033"))
    // the seam: the route fires AND the inner plan is index-only — the
    // candidate cells are reconstructed from the pointer entries, so no
    // main-table file and no gather join appear anywhere
    val engine = new graft.catalog.Catalog(spark, r)
    import org.apache.spark.sql.sources
    val builder = new GraftScanBuilder(engine, "tcov")
    builder.pushFilters(Array(
      sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("city")),
      sources.EqualTo("value", b("paris"))))
    val routed = builder.build().asInstanceOf[GraftV1Scan]
    assert(routed.usedIndexTable.exists(_.startsWith("tcov_idx_f_")))
    val innerOut = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(innerOut)) {
      routed.resolvedFrame(spark).explain("formatted")
    }
    val inner = innerOut.toString("UTF-8")
    assert(inner.contains("tcov_idx_f_"),
      s"index table not in the covered inner plan:\n$inner")
    assert(!inner.contains("tcov/data-"),
      s"covered SQL route still scans the main table:\n$inner")
    assert(!inner.contains("LeftSemi"),
      s"covered SQL route still gathers:\n$inner")
    // a DELETE is visible through the covered route with no rebuild
    // (synchronous tombstone translation behind the SQL door)
    import graft.write.Delete
    g.table("tcov").delete(Seq(Delete(b("r013")).deleteFamily("f", 4L)), 4L)
    assert(collectCells(spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_cv.tcov " +
        s"WHERE family = 'f' AND qualifier = ${hex("city")} " +
        s"AND value = ${hex("paris")}")).map(_._1)
      == Set("r003", "r023", "r033"))
  }

  test("salted table through the SQL door: bounds, DELETE, INSERT") {
    val r = Files.createTempDirectory("graft-sqlsalt").toString
    val g = Graft(spark, r)
    g.createTable(TableDescriptor("ts", Seq(FamilyDescriptor("f")),
      splitKeys = 2, saltBuckets = 8), 1L)
    g.table("ts").put((1 to 40).map(i =>
      Put(b(f"r$i%03d")).add("f", b("q"), 2L, b(s"v$i"))), 2L)
    spark.conf.set("spark.sql.catalog.graft_salt", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_salt.root", r)
    // logical row bounds scatter over the salted layout; logical keys out
    val sel = collectCells(spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_salt.ts " +
        s"WHERE row >= ${hex("r010")} AND row < ${hex("r020")}"))
    assert(sel.map(_._1) == (10 to 19).map(i => f"r$i%03d").toSet)
    // DELETE with logical bounds tombstones exactly that logical range
    spark.sql(s"DELETE FROM graft_salt.ts WHERE row >= ${hex("r010")} " +
      s"AND row < ${hex("r020")}")
    val after = collectCells(spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_salt.ts"))
    assert(after.map(_._1).size == 30 &&
      !after.exists(c => c._1 >= "r010" && c._1 < "r020"))
    // INSERT of logical cells lands salted (storage) but reads logical
    spark.sql("INSERT INTO graft_salt.ts VALUES " +
      s"(${hex("r099")}, 'f', ${hex("q")}, 9, CAST(4 AS TINYINT), ${hex("v99")}, 0)")
    assert(collectCells(spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_salt.ts " +
        s"WHERE row = ${hex("r099")}")) == Set(("r099", "f", "q", 9L, "v99")))
    val raw = g.table("ts").cells.select(org.apache.spark.sql.functions
      .length(col("row"))).distinct().collect().map(_.getInt(0)).toSet
    assert(raw == Set(5)) // 'rNNN' (4 bytes) + 1 salt byte
  }

  test("streaming reads of a salted table emit logical keys; bounds hold") {
    val r = Files.createTempDirectory("graft-saltstream").toString
    val g = Graft(spark, r)
    g.createTable(TableDescriptor("ss", Seq(FamilyDescriptor("f")),
      saltBuckets = 8), 1L)
    g.table("ss").put(Seq(
      Put(b("r1")).add("f", b("q"), 1L, b("v1")),
      Put(b("r2")).add("f", b("q"), 1L, b("v2")),
      Put(b("r3")).add("f", b("q"), 1L, b("v3"))), 1L)
    spark.conf.set("spark.sql.catalog.graft_ss", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ss.root", r)
    val work = Files.createTempDirectory("graft-saltstream-w").toString
    // SQL-door micro-batch stream: per-record salt strip + LOGICAL bound
    // re-check (the parquet range pushdown is skipped on salted layouts)
    val got = scala.collection.mutable.ListBuffer.empty[(String, String)]
    val q = spark.readStream.table("graft_ss.ss")
      .where(col("row") >= lit(b("r2")))
      .writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect().map(r =>
          (new String(r.getAs[Array[Byte]]("row"), "UTF-8"),
            new String(r.getAs[Array[Byte]]("value"), "UTF-8")))
        got.synchronized { got ++= rows }: Unit
      }
      .start()
    q.awaitTermination()
    assert(got.synchronized(got.toList).sorted ==
      Seq(("r2", "v2"), ("r3", "v3")), got)
    // facade change feed strips too, and replicating it into ANOTHER
    // salted table round-trips through the append seam (re-salted there)
    g.createTable(TableDescriptor("ss2", Seq(FamilyDescriptor("f")),
      saltBuckets = 4), 2L)
    val rep = graft.streaming.Replication.replicate(
      g.readStream("ss"), g.catalog, "ss2", s"$work/repckpt")
    rep.awaitTermination()
    val back = g.table("ss2").scan(graft.read.Scan()).collect().map { row =>
      (new String(row.getAs[Array[Byte]]("row"), "UTF-8"),
        new String(row.getAs[Array[Byte]]("value"), "UTF-8"))
    }.toSet
    assert(back == Set(("r1", "v1"), ("r2", "v2"), ("r3", "v3")), back)
    // and ss2's storage really is salted on ITS OWN bucket count layout
    assert(g.table("ss2").cells.select(org.apache.spark.sql.functions
      .length(col("row"))).distinct().collect().map(_.getInt(0)).toSet == Set(3))
  }

  test("value comparisons route through the index as one range probe") {
    val r = Files.createTempDirectory("graft-sqlrange").toString
    val g = Graft(spark, r)
    g.createTable(TableDescriptor("tr", Seq(FamilyDescriptor("f")),
      splitKeys = 2), 1L)
    g.table("tr").put((1 to 40).map(i =>
      Put(b(f"r$i%03d")).add("f", b("city"), 2L, b(f"c$i%03d"))
        .add("f", b("pop"), 2L, b(s"p$i"))), 2L)
    g.createIndex("tr", "f", b("city"), 3L)
    spark.conf.set("spark.sql.catalog.graft_rg", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_rg.root", r)
    // end-to-end: c010 <= city <= c013 through plain SQL comparisons
    val out = spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_rg.tr " +
        s"WHERE family = 'f' AND qualifier = ${hex("city")} " +
        s"AND value >= ${hex("c010")} AND value <= ${hex("c013")}")
    assert(collectCells(out).map(_._1)
      == Set("r010", "r011", "r012", "r013"))
    // the seam: comparisons alone (no equality) fire the route
    val engine = new graft.catalog.Catalog(spark, r)
    import org.apache.spark.sql.sources
    def built(filters: Array[sources.Filter]): GraftV1Scan = {
      val builder = new GraftScanBuilder(engine, "tr")
      builder.pushFilters(filters)
      builder.build().asInstanceOf[GraftV1Scan]
    }
    val routed = built(Array(
      sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("city")),
      sources.GreaterThanOrEqual("value", b("c010")),
      sources.LessThan("value", b("c014"))))
    assert(routed.usedIndexTable.exists(_.startsWith("tr_idx_f_")))
    val innerOut = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(innerOut)) {
      routed.resolvedFrame(spark).explain("formatted")
    }
    val inner = innerOut.toString("UTF-8")
    assert(inner.contains("tr_idx_f_"),
      s"index table not in the range-routed inner plan:\n$inner")
    assert(inner.contains("LeftSemi"), s"no semi-join gather:\n$inner")
    // one-sided intervals route too
    assert(built(Array(sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("city")),
      sources.GreaterThan("value", b("c035")))).usedIndexTable.isDefined)
    // comparisons on an unindexed qualifier do not
    assert(built(Array(sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("pop")),
      sources.GreaterThan("value", b("p1")))).usedIndexTable.isEmpty)
  }

  test("leading member of a composite index serves cell-door equality") {
    val r = Files.createTempDirectory("graft-sqllead").toString
    val g = Graft(spark, r)
    g.createTable(TableDescriptor("tl",
      Seq(FamilyDescriptor("f", maxVersions = 1)),
      splitKeys = 2, immutableRows = true), 1L)
    g.table("tl").put((1 to 40).map(i =>
      Put(b(f"r$i%03d")).add("f", b("city"), 2L,
          b(if (i % 10 == 3) "paris" else "other"))
        .add("f", b("tier"), 2L, b(if (i % 2 == 0) "gold" else "iron"))), 2L)
    g.createCompositeIndex("tl",
      Seq("f" -> b("city"), "f" -> b("tier")), 3L)
    spark.conf.set("spark.sql.catalog.graft_ld", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ld.root", r)
    // end-to-end exactness through the blob-prefix probe
    val out = spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_ld.tl " +
        s"WHERE family = 'f' AND qualifier = ${hex("city")} " +
        s"AND value = ${hex("paris")}")
    assert(collectCells(out).map(_._1) == Set("r003", "r013", "r023", "r033"))
    // seams: leading equality routes; trailing member and ranges do not
    val engine = new graft.catalog.Catalog(spark, r)
    import org.apache.spark.sql.sources
    def built(filters: Array[sources.Filter]): GraftV1Scan = {
      val builder = new GraftScanBuilder(engine, "tl")
      builder.pushFilters(filters)
      builder.build().asInstanceOf[GraftV1Scan]
    }
    assert(built(Array(sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("city")),
      sources.EqualTo("value", b("paris"))))
      .usedIndexTable.exists(_.contains("_cidx_")))
    assert(built(Array(sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("tier")),
      sources.EqualTo("value", b("gold")))).usedIndexTable.isEmpty)
    // a RANGE on the leading member routes too (loose probe; the value
    // conjuncts stay residual, so exactness is Spark's)
    assert(built(Array(sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("city")),
      sources.GreaterThanOrEqual("value", b("paris"))))
      .usedIndexTable.exists(_.contains("_cidx_")))
  }

  test("leading member of a composite serves cell-door ranges, sparse rows kept") {
    val r = Files.createTempDirectory("graft-sqllr").toString
    val g = Graft(spark, r)
    g.createTable(TableDescriptor("nr",
      Seq(FamilyDescriptor("f", maxVersions = 1)),
      splitKeys = 2, immutableRows = true), 1L)
    import graft.core.Bytes
    val numQ = b("num")
    // big-endian long values: bounds and values all embed 0x00 bytes
    g.table("nr").put((1 to 50).map(i =>
      Put(b(f"r$i%03d")).add("f", numQ, 2L, Bytes.toBytes(i.toLong))
        .add("f", b("st"), 2L, b(if (i % 2 == 0) "E" else "O"))), 2L)
    // sparse row inside the interval: no trailing member
    g.table("nr").put(Seq(
      Put(b("r900")).add("f", numQ, 3L, Bytes.toBytes(25L))), 3L)
    g.createCompositeIndex("nr", Seq("f" -> numQ, "f" -> b("st")), 4L)
    spark.conf.set("spark.sql.catalog.graft_lr", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_lr.root", r)
    def h(v: Long) = "X'" + Bytes.toBytes(v).map(x => f"$x%02x").mkString + "'"
    val qual = "X'" + numQ.map(x => f"$x%02x").mkString + "'"
    val out = spark.sql(
      s"""SELECT row, family, qualifier, ts, value FROM graft_lr.nr
          WHERE family = 'f' AND qualifier = $qual
            AND value >= ${h(20L)} AND value < ${h(40L)}""")
    assert(collectCells(out).map(_._1)
      == (20 to 39).map(i => f"r$i%03d").toSet + "r900")
    // seam: the interval routed through the composite
    val engine = new graft.catalog.Catalog(spark, r)
    import org.apache.spark.sql.sources
    val builder = new GraftScanBuilder(engine, "nr")
    builder.pushFilters(Array(sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", numQ),
      sources.GreaterThanOrEqual("value", Bytes.toBytes(20L)),
      sources.LessThan("value", Bytes.toBytes(40L))))
    assert(builder.build().asInstanceOf[GraftV1Scan]
      .usedIndexTable.exists(_.contains("_cidx_")))
  }

  test("covered route keeps pushed row bounds on a salted table") {
    // regression: on a salted table the pushed row bounds compile into
    // the scatter-gather frame, which the covered (index-only) route
    // bypasses — the bounds must be re-applied on the reconstructed
    // rows, or the route returns rows outside the requested key range
    val r = Files.createTempDirectory("graft-sqlcovsalt").toString
    val g = Graft(spark, r)
    g.createTable(TableDescriptor("tcs", Seq(FamilyDescriptor("f")),
      splitKeys = 2, saltBuckets = 8, immutableRows = true), 1L)
    g.table("tcs").put((1 to 40).map(i =>
      Put(b(f"r$i%03d")).add("f", b("city"), 2L,
          b(if (i % 10 == 3) "paris" else "other"))
        .add("f", b("pop"), 2L, b(s"p$i"))), 2L)
    g.createIndex("tcs", "f", b("city"), 3L, covered = Seq("f" -> b("pop")))
    spark.conf.set("spark.sql.catalog.graft_cs", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cs.root", r)
    val out = spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_cs.tcs " +
        s"WHERE family = 'f' AND qualifier = ${hex("city")} " +
        s"AND value = ${hex("paris")} " +
        s"AND row >= ${hex("r010")} AND row < ${hex("r030")}")
    assert(collectCells(out).map(_._1) == Set("r013", "r023"),
      "covered route dropped the pushed row bounds")
    // and the route did fire (this is not the full-scan fallback)
    val engine = new graft.catalog.Catalog(spark, r)
    import org.apache.spark.sql.sources
    val builder = new GraftScanBuilder(engine, "tcs")
    builder.pushFilters(Array(
      sources.EqualTo("family", "f"),
      sources.EqualTo("qualifier", b("city")),
      sources.EqualTo("value", b("paris")),
      sources.GreaterThanOrEqual("row", b("r010")),
      sources.LessThan("row", b("r030"))))
    assert(builder.build().asInstanceOf[GraftV1Scan]
      .usedIndexTable.exists(_.startsWith("tcs_idx_f_")))
  }

  test("CREATE TABLE declares saltBuckets from SQL DDL") {
    val r = Files.createTempDirectory("graft-sqlddlsalt").toString
    spark.conf.set("spark.sql.catalog.graft_dsalt", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_dsalt.root", r)
    spark.sql("CREATE TABLE graft_dsalt.td " +
      "TBLPROPERTIES('families'='f', 'saltBuckets'='8')")
    val g = Graft(spark, r)
    assert(g.table("td").descriptor.saltBuckets == 8)
    spark.sql("INSERT INTO graft_dsalt.td VALUES " +
      s"(${hex("k1")}, 'f', ${hex("q")}, 1, CAST(4 AS TINYINT), ${hex("v1")}, 0)")
    // stored salted (3-byte keys), read logical
    assert(g.table("td").cells.select(org.apache.spark.sql.functions
      .length(col("row"))).collect().map(_.getInt(0)).toSet == Set(3))
    assert(collectCells(spark.sql(
      "SELECT row, family, qualifier, ts, value FROM graft_dsalt.td"))
      == Set(("k1", "f", "q", 1L, "v1")))
  }
}
