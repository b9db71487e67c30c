package graft.streaming

import graft.{Graft, SparkSpec}
import graft.catalog.{FamilyDescriptor, TableDescriptor}
import graft.core.{Bytes, Cell}
import graft.read.Scan
import java.nio.file.Files

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

  test("latestState streaming aggregation tracks current value per column") {
    val work = Files.createTempDirectory("graft-repl2").toString
    cells(Seq(
      Cell.put(b("r1"), "f", b("q"), 1L, b("old")),
      Cell.put(b("r1"), "f", b("q"), 5L, b("new")),
      Cell.put(b("r2"), "f", b("q"), 3L, b("x")))).toDF()
      .write.parquet(s"$work/feed/b1")
    val q = Replication.latestState(
      Replication.changeFeed(spark, s"$work/feed"))
      .writeStream.format("memory").queryName("latest_state_t")
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("latest_state_t").collect().map { r =>
      (new String(r.getAs[Array[Byte]]("row"), "UTF-8"),
        new String(r.getAs[Array[Byte]]("value"), "UTF-8"))
    }.toSet
    assert(out == Set(("r1", "new"), ("r2", "x")))
  }
}
