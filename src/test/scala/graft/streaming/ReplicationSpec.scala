package graft.streaming

import graft.{Graft, SparkSpec}
import graft.catalog.{FamilyDescriptor, TableDescriptor}
import graft.core.{Bytes, Cell}
import graft.read.Scan
import java.nio.file.Files

object ReplicationSpec {
  // foreachBatch closures run on the driver but outside the test's scope;
  // accumulate emitted deltas here (memory sink can't restart checkpoints)
  val deltas = scala.collection.mutable.ListBuffer.empty[(String, String)]
  val horizonDeltas = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
}

/** Replication semantics from `ReplicationSource`/`ReplicationSink`
  * (SURVEY §2.1): at-least-once shipping of appended edit batches into a
  * peer table, idempotent under replay. */
class ReplicationSpec extends SparkSpec {
  import spark.implicits._

  private def b(s: String) = Bytes.toBytes(s)

  test("change feed ships appended batches into the peer table; replay is idempotent") {
    val work = Files.createTempDirectory("graft-repl").toString
    val feedDir = s"$work/feed"
    val ckpt = s"$work/ckpt"
    new java.io.File(feedDir).mkdirs()

    val g = Graft(spark, s"$work/peer")
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")), splitKeys = 2), 1L)

    // WAL batch 1
    cells(Seq(Cell.put(b("r1"), "f", b("q"), 1L, b("v1")))).toDF()
      .write.parquet(s"$feedDir/batch1")
    Replication.replicate(
      Replication.changeFeed(spark, feedDir), g.catalog, "t", ckpt,
      nowMsOf = _ + 100L).awaitTermination()
    // WAL batch 2 arrives later; AvailableNow query already ended -> restart
    cells(Seq(
      Cell.put(b("r2"), "f", b("q"), 2L, b("v2")),
      Cell.delete(b("r1"), "f", b("q"), 1L))).toDF()
      .write.parquet(s"$feedDir/batch2")
    Replication.replicate(
      Replication.changeFeed(spark, feedDir), g.catalog, "t", ckpt,
      nowMsOf = _ + 100L).awaitTermination()

    def state(): Set[(String, String)] =
      g.table("t").scan(Scan()).collect().map { r =>
        (new String(r.getAs[Array[Byte]]("row"), "UTF-8"),
          new String(r.getAs[Array[Byte]]("value"), "UTF-8"))
      }.toSet
    assert(state() == Set(("r2", "v2"))) // r1 tombstoned by batch 2

    // Replay from scratch (fresh checkpoint): at-least-once duplicates —
    // the peer state must not change (ts/seq idempotence).
    Replication.replicate(
      Replication.changeFeed(spark, feedDir), g.catalog, "t", s"$work/ckpt2",
      nowMsOf = _ + 200L).awaitTermination()
    assert(state() == Set(("r2", "v2")))
  }

  test("tableChangeFeed tails the table's own appends; compaction does not re-ship") {
    import graft.write.{Delete, Put}
    val work = Files.createTempDirectory("graft-replt").toString
    val src = Graft(spark, s"$work/src")
    src.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")), splitKeys = 2), 1L)
    val peer = Graft(spark, s"$work/peer")
    peer.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")), splitKeys = 2), 1L)

    def ship(ckpt: String): Unit = Replication.replicate(
      Replication.tableChangeFeed(spark, s"$work/src", "t"),
      peer.catalog, "t", ckpt, nowMsOf = _ + 100L).awaitTermination()
    def state(g: Graft): Set[(String, String)] =
      g.table("t").scan(Scan()).collect().map { r =>
        (new String(r.getAs[Array[Byte]]("row"), "UTF-8"),
          new String(r.getAs[Array[Byte]]("value"), "UTF-8"))
      }.toSet

    // two appends (puts, then a tombstone) — normal WAL shipping
    src.table("t").put(Seq(
      Put(b("r1")).add("f", b("q"), 1L, b("v1")),
      Put(b("r2")).add("f", b("q"), 1L, b("v2"))), nowMs = 1L)
    src.table("t").delete(Seq(Delete(b("r1")).deleteColumn("f", b("q"), 1L)), 2L)
    ship(s"$work/ckpt")
    assert(state(peer) == Set(("r2", "v2")))

    // major compaction rewrites the source into compact-{v}; the feed
    // must NOT re-ship it (the peer already consumed those edits, and a
    // compacted rewrite is not an edit). A fresh checkpoint replays the
    // ORIGINAL appends only — same final state, tombstone included.
    src.table("t").majorCompact(nowMs = 3L)
    assert(state(src) == Set(("r2", "v2")))
    ship(s"$work/ckpt") // incremental: nothing new to ship
    assert(state(peer) == Set(("r2", "v2")))
    ship(s"$work/ckpt2") // full replay from scratch: appends only
    assert(state(peer) == Set(("r2", "v2")))

    // post-compaction appends keep flowing
    src.table("t").put(Seq(Put(b("r3")).add("f", b("q"), 4L, b("v3"))), nowMs = 4L)
    ship(s"$work/ckpt")
    assert(state(peer) == Set(("r2", "v2"), ("r3", "v3")))
  }

  test("replicateMaintained folds the small-batch tail and bounds history; view unchanged") {
    import graft.write.Put
    val work = Files.createTempDirectory("graft-replm").toString
    val src = Graft(spark, s"$work/src")
    src.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")), splitKeys = 4), 1L)
    // 6 separate appends × 4 files each; maxFilesPerTrigger=1 makes every
    // FILE its own micro-batch on the sink — the worst-case small-files
    // ingest shape
    for (batch <- 0 until 6)
      src.table("t").put((0 until 40).map(i =>
        Put(Bytes.toBytes(batch * 1000L + i)).add("f", b("q"),
          batch + 1L, b(s"v$batch-$i"))), nowMs = batch + 1L)
    val peer = Graft(spark, s"$work/peer")
    peer.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")), splitKeys = 4), 1L)
    val q = Replication.replicateMaintained(
      Replication.tableChangeFeed(spark, s"$work/src", "t", maxFilesPerTrigger = 1),
      peer.table("t"), s"$work/ckpt", nowMsOf = _ + 100L, keepVersions = 1)
    q.awaitTermination()
    val microBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(microBatches >= 6, s"expected many micro-batches, got $microBatches")
    // the folded tail: far fewer physical commit batches than micro-batches
    val parents = peer.catalog.currentManifest("t").dataDirs
      .map(d => new org.apache.hadoop.fs.Path(d).getParent.toString).distinct
    assert(parents.size < microBatches / 2,
      s"maintenance did not fold: ${parents.size} parents / $microBatches batches")
    // keepVersions=1 prunes+vacuums released fold inputs immediately (a
    // keep of k>1 lags by one fold generation: the retained older
    // manifests still reference the folded dirs until the next fold's
    // vacuum): the table dir holds no data-*/compact-* parents beyond the
    // live manifest's
    val live = parents.map(p => new org.apache.hadoop.fs.Path(p).getName).toSet
    val onDisk = new java.io.File(s"$work/peer/t").listFiles().toSeq
      .map(_.getName).filter(n => n.startsWith("data-") || n.startsWith("compact-"))
    assert(onDisk.toSet == live,
      s"vacuum left orphans: disk=$onDisk live=$live")
    // maintenance is invisible to readers: peer view == source view
    def state(g: Graft): Set[(Long, String)] =
      g.table("t").scan(Scan()).collect().map { r =>
        (Bytes.toLong(r.getAs[Array[Byte]]("row")),
          new String(r.getAs[Array[Byte]]("value"), "UTF-8"))
      }.toSet
    assert(state(peer) == state(src))
    assert(state(peer).size == 240)
  }

  test("windowed edit counts with watermark; stateful running counters") {
    val work = Files.createTempDirectory("graft-repl3").toString
    cells(Seq(
      Cell.put(b("r1"), "f", b("q"), 1000L, b("a")),
      Cell.put(b("r1"), "f", b("q"), 1500L, b("b")),
      Cell.put(b("r2"), "g", b("q"), 61000L, b("c")))).toDF()
      .write.parquet(s"$work/feed/b1")
    val feed = Replication.changeFeed(spark, s"$work/feed")

    // complete mode: every window state emitted per batch (append mode
    // would emit a window only once a LATER batch advances the watermark
    // past it — with a single AvailableNow batch nothing would surface)
    val q1 = Replication.windowedEditCounts(feed, "1 minute", "10 seconds")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q1.awaitTermination()
    val wins = spark.table("win_counts").collect()
      .map(r => (r.getAs[String]("family"), r.getAs[Long]("edits"))).toSet
    assert(wins == Set(("f", 2L), ("g", 1L)))

    val q2 = Replication.runningEditCounts(feed)
      .writeStream.format("memory").queryName("run_counts")
      .outputMode("update").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val counts = spark.table("run_counts").collect()
      .map(r => r.getAs[Long]("edits")).sorted.toSeq
    assert(counts == Seq(1L, 2L)) // r1/f/q counted twice, r2/g/q once
  }

  test("dedupedFeed drops duplicate cells from an at-least-once stream") {
    val work = Files.createTempDirectory("graft-repl4").toString
    // the same batch shipped twice (replay) + one distinct cell
    val dup = Seq(Cell.put(b("r1"), "f", b("q"), 1000L, b("v1")))
    cells(dup).toDF().write.parquet(s"$work/feed/b1")
    cells(dup ++ Seq(Cell.put(b("r2"), "f", b("q"), 2000L, b("v2")))).toDF()
      .write.parquet(s"$work/feed/b2")
    val q = Replication.dedupedFeed(
      Replication.changeFeed(spark, s"$work/feed", maxFilesPerTrigger = 16),
      watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("dedup_feed_t")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("dedup_feed_t").collect()
      .map(r => new String(r.getAs[Array[Byte]]("value"), "UTF-8")).sorted.toSeq
    assert(rows == Seq("v1", "v2")) // duplicate v1 dropped
  }

  test("latestState emits update deltas; stale edits are suppressed") {
    val work = Files.createTempDirectory("graft-repl2").toString
    val ckpt = s"$work/ckpt"
    // memory sink can't recover from a checkpoint; collect deltas through
    // foreachBatch instead (checkpoint-compatible like any real sink)
    def run(): Unit = {
      val q = Replication.latestState(
        Replication.changeFeed(spark, s"$work/feed"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update").trigger(
          org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.collect().map { r =>
            (new String(r.getAs[Array[Byte]]("row"), "UTF-8"),
              new String(r.getAs[Array[Byte]]("value"), "UTF-8"))
          }
          ReplicationSpec.deltas.synchronized {
            ReplicationSpec.deltas ++= rows
          }: Unit
        }
        .start()
      q.awaitTermination()
    }
    cells(Seq(
      Cell.put(b("r1"), "f", b("q"), 1L, b("old")),
      Cell.put(b("r1"), "f", b("q"), 5L, b("new")),
      Cell.put(b("r2"), "f", b("q"), 3L, b("x")))).toDF()
      .write.parquet(s"$work/feed/b1")
    run()
    def emitted(): Seq[(String, String)] =
      ReplicationSpec.deltas.synchronized(ReplicationSpec.deltas.toList)
    // one delta per key — the in-batch older version never surfaces
    assert(emitted().toSet == Set(("r1", "new"), ("r2", "x")))
    assert(emitted().size == 2)

    // a STALE late edit (ts 2 < current 5) must emit nothing...
    cells(Seq(Cell.put(b("r1"), "f", b("q"), 2L, b("stale")))).toDF()
      .write.parquet(s"$work/feed/b2")
    run()
    assert(emitted().size == 2)
    // ...and a genuinely newer one emits exactly one delta
    cells(Seq(Cell.put(b("r1"), "f", b("q"), 9L, b("v9")))).toDF()
      .write.parquet(s"$work/feed/b3")
    run()
    assert(emitted().size == 3)
    assert(emitted().contains(("r1", "v9")))
  }

  test("latestState with a state horizon expires idle keys (bounded state)") {
    val work = Files.createTempDirectory("graft-repl5").toString
    val ckpt = s"$work/ckpt"
    // returns the state store's total key count after the run — the
    // direct, deterministic observation of expiry (a behavioral probe is
    // impossible by design: the watermark drops any event old enough to
    // have been affected by the expired state before it reaches the
    // operator)
    def run(): Long = {
      val q = Replication.latestState(
        Replication.changeFeed(spark, s"$work/feed"),
        stateHorizonMs = Some(5000L), watermarkDelay = "0 seconds")
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update").trigger(
          org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.collect().map { r =>
            (new String(r.getAs[Array[Byte]]("row"), "UTF-8"),
              new String(r.getAs[Array[Byte]]("value"), "UTF-8"),
              r.getAs[Long]("ts"))
          }
          ReplicationSpec.horizonDeltas.synchronized {
            ReplicationSpec.horizonDeltas ++= rows
          }: Unit
        }
        .start()
      q.awaitTermination()
      q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)
    }
    def emitted(): Seq[(String, String, Long)] =
      ReplicationSpec.horizonDeltas.synchronized(
        ReplicationSpec.horizonDeltas.toList)
    // r1 lives at event-time 1000, horizon 5000 -> times out once the
    // watermark passes 6000
    cells(Seq(Cell.put(b("r1"), "f", b("q"), 1000L, b("v1")))).toDF()
      .write.parquet(s"$work/feed/b1")
    assert(run() == 1L)
    assert(emitted().toSet == Set(("r1", "v1", 1000L)))
    // advance the watermark far past r1's horizon (another key).
    // AvailableNow runs a trailing no-data batch that commits the
    // advanced watermark (100000 > r1's 6000 horizon) — r1's timeout
    // fires within this run and its state is REMOVED: 1 key left (r2),
    // not 2
    cells(Seq(Cell.put(b("r2"), "f", b("q"), 100000L, b("v2")))).toDF()
      .write.parquet(s"$work/feed/b2")
    assert(run() == 1L)
    // r2 (horizon 105000) survives; r3 joins — 2 keys, r1 still gone
    cells(Seq(Cell.put(b("r3"), "f", b("q"), 100001L, b("v3")))).toDF()
      .write.parquet(s"$work/feed/b3")
    assert(run() == 2L)
    assert(emitted().map(t => (t._1, t._2)).toSet ==
      Set(("r1", "v1"), ("r2", "v2"), ("r3", "v3")))
  }

  test("StreamEnrich: per-batch static join, broadcast side, inner/left semantics") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "bronze")).toDF("k", "tier")
    val ms = MemoryStream[(Long, Long)]
    val out = StreamEnrich.enrich(
      ms.toDF().toDF("ev", "user"), dim, col("user"), col("k"))
    // the stream-static join must plan the dimension broadcast (stream
    // side un-shuffled); assert on the streaming logical plan pre-start
    assert(out.queryExecution.analyzed.toString.contains("ResolvedHint"),
      out.queryExecution.analyzed.toString)
    val q = out.writeStream.format("memory").queryName("senrich")
      .outputMode("append").start()
    try {
      ms.addData((100L, 1L), (101L, 3L)) // 3 has no dim row -> dropped (inner)
      q.processAllAvailable()
      ms.addData((102L, 2L))
      q.processAllAvailable()
      val got = spark.table("senrich").select("ev", "tier")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((100L, "gold"), (102L, "bronze")))
    } finally q.stop()
    // left-outer keeps unmatched stream rows with null attributes
    val ms2 = MemoryStream[(Long, Long)]
    val lo = StreamEnrich.enrich(ms2.toDF().toDF("ev", "user"), dim,
      col("user"), col("k"), joinType = "left_outer")
    val q2 = lo.writeStream.format("memory").queryName("senrich_lo")
      .outputMode("append").start()
    try {
      ms2.addData((200L, 9L))
      q2.processAllAvailable()
      val r = spark.table("senrich_lo").select("ev", "tier").collect()
      assert(r.length == 1 && r(0).getLong(0) == 200L && r(0).isNullAt(1))
    } finally q2.stop()
  }

  test("StreamJoin.intervalJoin: cross-batch matches both directions, bounds inclusive") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val secNs = 1000000000L
    val t0 = 1704067200L * secNs
    val msL = MemoryStream[(Long, Long, Long)] // (id, key, ts)
    val msR = MemoryStream[(Long, Long, Long)]
    val out = StreamJoin.intervalJoin(
      msL.toDF().toDF("lid", "lk", "lts"), msR.toDF().toDF("rid", "rk", "rts"),
      col("lk"), col("rk"), col("lts"), col("rts"),
      window = java.time.Duration.ofSeconds(10),
      watermarkDelay = java.time.Duration.ofSeconds(5))
    val q = out.select("lid", "rid").writeStream.format("memory")
      .queryName("ssij").outputMode("append").start()
    try {
      // batch 1: a right interval-opener and a left point that precedes
      // any right arrival for key 2
      msR.addData((100L, 1L, t0))
      msL.addData((200L, 2L, t0 + 3 * secNs))
      q.processAllAvailable()
      // batch 2: lefts matching the buffered right — exactly ON both
      // bounds (ts = rts and ts = rts + 10s) and one outside; plus the
      // right that retroactively matches batch-1's left (right arrives
      // AFTER the left — state must have buffered the left side too)
      msL.addData((101L, 1L, t0), (102L, 1L, t0 + 10 * secNs),
        (103L, 1L, t0 + 11 * secNs))
      msR.addData((201L, 2L, t0 + 1 * secNs))
      q.processAllAvailable()
      val got = spark.table("ssij").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((101L, 100L), (102L, 100L), (200L, 201L)))
    } finally q.stop()
  }

  test("StreamJoin.intervalJoin left_outer: unmatched lefts emit nulls after watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val secNs = 1000000000L
    val t0 = 1704067200L * secNs
    val msL = MemoryStream[(Long, Long, Long)]
    val msR = MemoryStream[(Long, Long, Long)]
    val out = StreamJoin.intervalJoin(
      msL.toDF().toDF("lid", "lk", "lts"), msR.toDF().toDF("rid", "rk", "rts"),
      col("lk"), col("rk"), col("lts"), col("rts"),
      window = java.time.Duration.ofSeconds(10),
      watermarkDelay = java.time.Duration.ofSeconds(5),
      joinType = "left_outer")
    val q = out.select("lid", "rid").writeStream.format("memory")
      .queryName("ssij_lo").outputMode("append").start()
    try {
      msR.addData((100L, 1L, t0))
      msL.addData((201L, 1L, t0 + 3 * secNs), // matches 100
        (202L, 2L, t0 + 3 * secNs))           // no right for key 2 ever
      q.processAllAvailable()
      // drive BOTH sides' watermarks far past 202's horizon (the global
      // watermark is the MIN across inputs — advancing only the right
      // stream would hold eviction back forever) so its null emits
      msR.addData((900L, 9L, t0 + 1000 * secNs))
      msL.addData((900L, 9L, t0 + 1000 * secNs))
      q.processAllAvailable()
      msR.addData((901L, 9L, t0 + 2000 * secNs))
      msL.addData((901L, 9L, t0 + 2000 * secNs))
      q.processAllAvailable()
      val got = spark.table("ssij_lo").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(got.contains((201L, 100L)))
      assert(got.contains((202L, -1L)), got.toString) // outer null, post-watermark
    } finally q.stop()
  }

  test("StreamJoin.asOfJoinEventTime: out-of-order seal, compaction, null match") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val secNs = 1000000000L
    val t0 = 1704067200L * secNs
    def at(s: Long) = t0 + s * secNs
    val msL = MemoryStream[(Long, Long, Long)] // (key, ts, id)
    val msR = MemoryStream[(Long, Long, Long)]
    val out = StreamJoin.asOfJoinEventTime(
      msL.toDF().toDF("k", "ts", "id"), msR.toDF().toDF("rk", "rts", "rid"),
      col("k"), col("rk"), col("ts"), col("rts"), col("id"), col("rid"),
      watermarkDelay = java.time.Duration.ofSeconds(30))
    val q = out.writeStream.format("memory").queryName("sasof")
      .outputMode("append").start()
    try {
      // batch 1: lefts arrive BEFORE the rights that will match them
      // (out-of-order across sides, inside the 30s delay); left 11 has no
      // preceding right
      msL.addData((1L, at(0), 11L), (1L, at(20), 12L))
      q.processAllAvailable()
      // batch 2: rights at 10 and 15 — both before left 12's ts, so the
      // LATEST (15) must win even though the lefts arrived first; plus a
      // watermark driver on another key (wm after this batch: 70s)
      msR.addData((1L, at(10), 91L), (1L, at(15), 92L), (9L, at(100), 99L))
      q.processAllAvailable()
      // batch 3: wm=70s during processing -> key 1's timer fires, sealing
      // both lefts and both rights; rights compact to (15, 92)
      msR.addData((9L, at(200), 98L))
      q.processAllAvailable()
      // batch 4: a left arriving LONG after right 92 sealed — must match
      // via the COMPACTED latest, exercising the 2-long steady state
      msL.addData((1L, at(400), 13L))
      q.processAllAvailable()
      // drive the watermark past 400s so left 13 seals (two steps: the
      // timer re-arms at 400s+1ms, fires once wm exceeds it)
      msR.addData((9L, at(500), 97L))
      q.processAllAvailable()
      msR.addData((9L, at(600), 96L))
      q.processAllAvailable()
      val got = spark.table("sasof")
        .select("left_id", "match_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(got(11L) == -1L)  // nothing at-or-before t0
      assert(got(12L) == 92L)  // latest of the two preceding rights
      assert(got(13L) == 92L)  // matched via compacted state long after seal
    } finally q.stop()
  }

  test("StreamDedup.firstSeen: min id of the first batch wins; re-sightings suppressed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, md5}
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = StreamDedup.firstSeen(
      ms.toDF().toDF("doc_id", "text"), md5(col("text")), col("doc_id"))
    val q = out.writeStream.format("memory").queryName("fs_dedup")
      .outputMode("append").start()
    try {
      // batch 1: key A arrives as ids 5 and 7 -> 5 wins; B -> 9
      ms.addData((5L, "A"), (7L, "A"), (9L, "B"))
      q.processAllAvailable()
      // batch 2: A again with a SMALLER id (3) -> suppressed, first
      // batch won; new key C -> 1
      ms.addData((3L, "A"), (1L, "C"))
      q.processAllAvailable()
      val ids = spark.table("fs_dedup").select("id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(5L, 9L, 1L))
    } finally q.stop()
  }

  test("StreamDedup.firstSeenEventTime: watermark-driven TTL evicts on the data's clock") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, md5}
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val msNanos = 1000000L
    val ms = MemoryStream[(Long, String, Long)] // (id, text, ts nanos)
    val out = StreamDedup.firstSeenEventTime(
      ms.toDF().toDF("doc_id", "text", "ts"),
      md5(col("text")), col("doc_id"), col("ts"),
      ttl = java.time.Duration.ofMillis(300),
      watermarkDelay = java.time.Duration.ofMillis(200))
    val q = out.writeStream.format("memory").queryName("fs_dedup_et")
      .outputMode("append").start()
    def ids() = spark.table("fs_dedup_et").select("id")
      .collect().map(_.getLong(0)).toSet
    try {
      // batch 1, SHUFFLED arrival within the batch: A's min id wins
      ms.addData((7L, "A", 1500 * msNanos), (5L, "A", 1000 * msNanos),
        (9L, "B", 1200 * msNanos))
      q.processAllAvailable()
      assert(ids() == Set(5L, 9L)) // watermark now 1300ms
      // batch 2: a LATE re-sighting of A (1400ms >= watermark) is
      // suppressed — still inside the event-time TTL (lastSeen 1500 +
      // 300); Z drives the watermark to 2800ms, past both deadlines
      ms.addData((3L, "A", 1400 * msNanos), (6L, "Z", 3000 * msNanos))
      q.processAllAvailable()
      assert(ids() == Set(5L, 9L, 6L))
      // batch 3 (no data for A/B): their expired timers fire, state drops
      ms.addData((8L, "Z2", 6000 * msNanos))
      q.processAllAvailable()
      assert(ids() == Set(5L, 9L, 6L, 8L))
      // batch 4: A re-arrives AFTER eviction -> re-emits (the documented
      // recall-for-memory trade, now on the data's own timeline)
      ms.addData((4L, "A", 5900 * msNanos))
      q.processAllAvailable()
      assert(ids() == Set(5L, 9L, 6L, 8L, 4L))
    } finally q.stop()
  }

  test("StreamDedup.lshCandidatesEventTime: bucket members evict on the data's clock") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val msNanos = 1000000L
    val ms = MemoryStream[(Long, Seq[Int], Long)] // (id, band buckets, ts nanos)
    val out = StreamDedup.lshCandidatesEventTime(
      ms.toDF().toDF("doc_id", "bands", "ts"),
      col("doc_id"), col("bands"), col("ts"),
      ttl = java.time.Duration.ofMillis(300),
      watermarkDelay = java.time.Duration.ofMillis(200))
    val q = out.writeStream.format("memory").queryName("lsh_et")
      .outputMode("append").start()
    def pairs() = spark.table("lsh_et").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      // batch 1: docs 1,2 share bucket 7 -> pair (1,2); lastSeen 1100ms
      ms.addData((1L, Seq(7), 1000 * msNanos), (2L, Seq(7), 1100 * msNanos))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L)))
      // batch 2: doc 3 alone in bucket 9 at 3000ms — no pair; drives the
      // watermark to 2800ms, past bucket 7's deadline (1100 + 300)
      ms.addData((3L, Seq(9), 3000 * msNanos))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L)))
      // batch 3: bucket 7's timer fires (no data for it; wm 2800 > 1400)
      // -> members 1,2 forgotten. Bucket 9 is ALIVE (deadline 3300 > wm):
      // doc 4 joins it -> pair (3,4)
      ms.addData((4L, Seq(9), 3100 * msNanos))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L), (3L, 4L)))
      // batch 4: doc 5 lands in the EVICTED bucket 7 -> pairs with nobody
      // (1 and 2 are forgotten — the documented recall-for-memory trade,
      // decided by the data's own clock, not wall time)
      ms.addData((5L, Seq(7), 3200 * msNanos))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L), (3L, 4L)))
    } finally q.stop()
  }

  test("StreamSessions.sessionize: gap closes across batches; open tail stays in state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)] // (user, ts, id)
    val out = StreamSessions.sessionize(
      ms.toDF().toDF("user_id", "ts", "event_id"),
      col("user_id"), col("ts"), col("event_id"), gapNanos = 100L)
    val q = out.writeStream.format("memory").queryName("ssess")
      .outputMode("append").start()
    def sessions() = spark.table("ssess").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    try {
      // batch 1: user 1 events at 0,50 (one open session); user 2 at 0
      ms.addData((1L, 0L, 1L), (1L, 50L, 2L), (2L, 0L, 3L))
      q.processAllAvailable()
      assert(sessions().isEmpty) // nothing closed yet
      // batch 2: user 1 at 150 EXTENDS (150-50 <= 100, strict-> rule);
      // user 2 at 101 closes its session (101-0 > 100)
      ms.addData((1L, 150L, 4L), (2L, 101L, 5L))
      q.processAllAvailable()
      assert(sessions() == Set((2L, 0L, 0L, 1L)))
      // batch 3: user 1 far future -> closes the 3-event session 0..150
      ms.addData((1L, 1000L, 6L))
      q.processAllAvailable()
      assert(sessions() == Set((2L, 0L, 0L, 1L), (1L, 0L, 150L, 3L)))
      // out-of-order WITHIN a batch sorts by (ts, id) before the fold:
      // user 3's 250,30,100 form sessions {30,100} (70<=100) then {250}
      ms.addData((3L, 250L, 7L), (3L, 30L, 8L), (3L, 100L, 9L))
      q.processAllAvailable()
      ms.addData((3L, 1000L, 10L)) // close the {250} tail
      q.processAllAvailable()
      assert(sessions().contains((3L, 30L, 100L, 2L)))
      assert(sessions().contains((3L, 250L, 250L, 1L)))
    } finally q.stop()
  }

  test("StreamSessions.sessionizeEventTime: out-of-order across batches equals batch fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)] // (user, ts nanos, id)
    val msNanos = 1000000L
    val gap = 100 * msNanos
    val out = StreamSessions.sessionizeEventTime(
      ms.toDF().toDF("user_id", "ts", "event_id"),
      col("user_id"), col("ts"), col("event_id"), gapNanos = gap,
      watermarkDelay = java.time.Duration.ofMillis(200))
    val q = out.writeStream.format("memory").queryName("ssess_et")
      .outputMode("append").start()
    def sessions() = spark.table("ssess_et").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    try {
      // batch 1: user 1 arrives OUT OF EVENT ORDER within the batch
      ms.addData((1L, 1500 * msNanos, 1L), (1L, 1000 * msNanos, 2L),
        (1L, 1100 * msNanos, 3L))
      q.processAllAvailable()
      // batch 2: a LATE arrival for user 1 lands between its earlier
      // events (1400ms, still >= watermark 1300ms -> admitted), plus
      // user 2, plus a watermark driver at 3000ms
      ms.addData((1L, 1400 * msNanos, 4L), (2L, 1600 * msNanos, 5L),
        (9L, 3000 * msNanos, 6L))
      q.processAllAvailable()
      // watermark is now 2800ms: user 1's timeline 1000,1100,1400,1500
      // folds in EVENT order -> {1000,1100} then {1400,1500} (300 > gap),
      // both sealed + tail-closed (2800 > 1500+100); user 2's single
      // event closed too. The driver's open {3000} stays in state.
      assert(sessions() == Set(
        (1L, 1000 * msNanos, 1100 * msNanos, 2L),
        (1L, 1400 * msNanos, 1500 * msNanos, 2L),
        (2L, 1600 * msNanos, 1600 * msNanos, 1L)))
      // batch 3: advance the watermark past the driver's tail
      ms.addData((9L, 6000 * msNanos, 7L))
      q.processAllAvailable()
      assert(sessions().contains((9L, 3000 * msNanos, 3000 * msNanos, 1L)))
    } finally q.stop()
  }

  test("StreamDedup.lshCandidates: new docs probe remembered buckets; full bucket freezes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Seq[Long])]
    val out = StreamDedup.lshCandidates(
      ms.toDF().toDF("id", "bands"), col("id"), col("bands"),
      maxBucketSize = 3)
    val q = out.writeStream.format("memory").queryName("lsh_cands")
      .outputMode("append").start()
    def pairs() = spark.table("lsh_cands").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      // batch 1: ids 1,2 share band-0 bucket 10 -> pair (1,2)
      ms.addData((1L, Seq(10L, 20L)), (2L, Seq(10L, 30L)))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L)))
      // batch 2: id 3 probes the REMEMBERED bucket -> (1,3), (2,3)
      ms.addData((3L, Seq(10L, 40L)))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L), (1L, 3L), (2L, 3L)))
      // batch 3: bucket 10 is at the cap (3 ids) -> frozen: id 4 emits
      // nothing there and is not remembered
      ms.addData((4L, Seq(10L, 50L)))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    } finally q.stop()
  }
}
