package graft.sql

import graft.{Graft, SparkSpec}
import graft.catalog.{FamilyDescriptor, TableDescriptor}
import graft.core.Bytes
import graft.write.{Delete, Put}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Streaming read of the wide view: the append feed decoded to
  * relational upsert rows, byte-parity with the batch decode. */
class WideStreamSpec extends SparkSpec {

  private def b(s: String) = Bytes.toBytes(s)
  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString
  private def register(cat: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
  }

  private def drain(table: String, work: String,
      options: Map[String, String] = Map.empty): Seq[Seq[org.apache.spark.sql.Row]] = {
    val batches = scala.collection.mutable.ListBuffer.empty[Seq[org.apache.spark.sql.Row]]
    var r = spark.readStream
    options.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.table(table)
      .writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect().toSeq
        batches.synchronized { batches += rows }: Unit
      }
      .start()
    q.awaitTermination()
    batches.synchronized(batches.toList).filter(_.nonEmpty)
  }

  test("the wide stream ships per-version upserts; tombstones ship nothing") {
    val root = freshRoot("widestream")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;f:pop:long")), 1L)
    // version 2: two full rows
    g.table("t").put(Seq(
      Put(Bytes.toBytes(1L)).add("f", b("city"), 2L, b("paris"))
        .add("f", b("pop"), 2L, Bytes.toBytes(10L)),
      Put(Bytes.toBytes(2L)).add("f", b("city"), 2L, b("rome"))
        .add("f", b("pop"), 2L, Bytes.toBytes(20L))), 2L)
    // version 3: partial update of row 1 (city only) + a whole-row
    // tombstone of row 2 — a delete is visibility, not an upsert
    g.table("t").put(Seq(
      Put(Bytes.toBytes(1L)).add("f", b("city"), 3L, b("lyon"))), 3L)
    g.table("t").delete(Seq(Delete(Bytes.toBytes(2L)).deleteFamily("f", 3L)), 3L)
    register("gws1", root)
    val work = freshRoot("widestream-w")
    val batches = drain("gws1.`t$wide`", work,
      Map("maxVersionsPerTrigger" -> "1"))
    def tup(r: org.apache.spark.sql.Row) =
      (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    // version 2's batch: both rows, all columns
    assert(batches.head.map(tup).toSet ==
      Set((1L, Some("paris"), Some(10L)), (2L, Some("rome"), Some(20L))),
      batches.head)
    // version 3's put: row 1 with the untouched column null (a CHANGE
    // feed, not resolved state); the tombstone batch ships nothing
    assert(batches.tail.flatten.map(tup) == Seq((1L, Some("lyon"), None)),
      batches.tail)
  }

  test("streamed decode is value-parity with the batch wide SELECT (all types)") {
    val root = freshRoot("widestream-types")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long,s:string"),
      wideSchema = Some("f:il:long;f:ii:int;f:st:string;f:du:double;" +
        "f:fl:float;f:ts:timestamp;f:tn:timestamp_ntz;f:dt:date;" +
        "f:bo:boolean;f:bi:binary;f:ol:olong;f:oi:oint;f:od:odouble")), 1L)
    register("gws2", root)
    // typed rows (incl. negatives for the ordered codecs and a negative
    // plain long — value round-trip does not need order preservation)
    spark.sql("""SELECT * FROM VALUES
        (1L, 'a', -5L, -7, 'x', 1.5D, CAST(2.5 AS FLOAT),
         TIMESTAMP'2024-03-01 12:00:00', TIMESTAMP_NTZ'2024-03-01 13:00:00',
         DATE'1969-07-20', true, X'DEADBEEF', -99L, -42, -0.25D),
        (2L, 'b', 8L, 9, 'y', -3.25D, CAST(-1.5 AS FLOAT),
         TIMESTAMP'1970-01-01 00:00:01', TIMESTAMP_NTZ'1969-12-31 23:59:59',
         DATE'2030-01-02', false, X'00', 77L, 6, 1e300D)
        AS t(k, s, il, ii, st, du, fl, ts, tn, dt, bo, bi, ol, oi, od)""")
      .writeTo("gws2.`t$wide`").append()
    val batch = spark.sql("SELECT * FROM gws2.`t$wide`").collect()
      .map(_.toSeq.map {
        case a: Array[Byte] => a.toSeq
        case x => x
      }).toSet
    val work = freshRoot("widestream-types-w")
    val streamed = drain("gws2.`t$wide`", work).flatten
      .map(_.toSeq.map {
        case a: Array[Byte] => a.toSeq
        case x => x
      }).toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(batch.size == 2)
  }

  test("the wide stream strips salt: logical keys, assembled rows") {
    val root = freshRoot("widestream-salt")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 4, saltBuckets = 8, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;f:pop:long")), 1L)
    g.table("t").put((1 to 100).map(i =>
      Put(Bytes.toBytes(i.toLong))
        .add("f", b("city"), 2L, b(s"c$i"))
        .add("f", b("pop"), 2L, Bytes.toBytes(i.toLong * 10))), 2L)
    register("gwss", root)
    val work = freshRoot("widestream-salt-w")
    val streamed = drain("gwss.`t$wide`", work).flatten
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == (1 to 100).map(i =>
      (i.toLong, s"c$i", i.toLong * 10)).toSet)
  }

  test("committed files stay row-sorted at order-breaking scale") {
    // Regression: the dynamic-partition writer re-sorts any task not
    // already ordered by the partition columns, and that re-sort is NOT
    // stable — with two families and enough rows per task it silently
    // shuffled the within-file row order (invisible at driver scales,
    // caught by the wide stream's sf1 sweep). writeCells now leads the
    // sort with (_fam[, _bucket]); this pins it at a size where the old
    // layout reliably broke.
    val root = freshRoot("layoutsort")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f"), FamilyDescriptor("g")), splitKeys = 4,
      wideKey = Some("k:long"), wideSchema = Some("f:a:long;g:b:long")), 1L)
    import org.apache.spark.sql.functions.{col, lit, hex => _}
    val src = spark.range(1, 60001).select(col("id").as("k"),
      (col("id") * 2).as("a"), (col("id") * 3).as("b"))
    g.table("t").mutate(
      graft.core.CellCodec.encode(src.select("k", "a"), "f", Seq("k"))
        .unionByName(
          graft.core.CellCodec.encode(src.select("k", "b"), "g", Seq("k"))),
      nowMs = 1L)
    val conf = spark.sparkContext.hadoopConfiguration
    val dirs = g.catalog.currentManifest("t").dataDirs
    val files = dirs.flatMap { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(conf)
      val it = fs.listFiles(p, true)
      val out = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) out += st.getPath.toString
      }
      out.result()
    }
    assert(files.nonEmpty)
    files.foreach { f =>
      val r = new GraftFileReader(GraftFilePartition(
        f, Array("row"), None, None, None, 0), conf)
      var prev: Array[Byte] = null
      var n = 0
      while (r.next()) {
        val row = r.get().getBinary(0)
        assert(prev == null || Bytes.compareTo(prev, row) <= 0,
          s"unsorted rows in $f at record $n")
        prev = row; n += 1
      }
      r.close()
      assert(n > 0, f)
    }
  }

  test("multi-family wide views stream: assembly merges sibling family files") {
    val root = freshRoot("widestream-mf")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f"), FamilyDescriptor("g")),
      splitKeys = 4, wideKey = Some("k:long"),
      wideSchema = Some("f:a:long;g:b:string")), 1L)
    // 200 full rows (cells split across two per-family files per range
    // partition), plus sparse rows living in only one family each
    g.table("t").put(
      (1 to 200).map(i => Put(Bytes.toBytes(i.toLong))
        .add("f", b("a"), 2L, Bytes.toBytes(i.toLong * 2))
        .add("g", b("b"), 2L, b(s"s$i"))) ++
      (201 to 210).map(i => Put(Bytes.toBytes(i.toLong))
        .add("f", b("a"), 2L, Bytes.toBytes(i.toLong * 2))) ++
      (211 to 220).map(i => Put(Bytes.toBytes(i.toLong))
        .add("g", b("b"), 2L, b(s"s$i"))), 2L)
    register("gwsmf", root)
    def tup(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        Option(r.getString(2)))
    val work = freshRoot("widestream-mf-w")
    val streamed = drain("gwsmf.`t$wide`", work).flatten.map(tup).toSet
    val batch = spark.sql("SELECT k, a, b FROM gwsmf.`t$wide`")
      .collect().map(tup).toSet
    assert(streamed == batch)
    assert(streamed.size == 220)
    // every full row arrived as ONE upsert with BOTH families' columns
    assert(streamed.count(t => t._2.isDefined && t._3.isDefined) == 200)
  }

  test("startingVersion: a fresh stream can skip the backfill") {
    val root = freshRoot("widestream-sv")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string")), 1L)   // version 1
    g.table("t").put(Seq(
      Put(Bytes.toBytes(1L)).add("f", b("city"), 2L, b("paris"))), 2L) // v2
    g.table("t").put(Seq(
      Put(Bytes.toBytes(2L)).add("f", b("city"), 3L, b("rome"))), 3L)  // v3
    register("gwsv", root)
    def keys(batches: Seq[Seq[org.apache.spark.sql.Row]]) =
      batches.flatten.map(_.getLong(0)).sorted
    // default: full retained history
    assert(keys(drain("gwsv.`t$wide`", freshRoot("sv-w0"))) == Seq(1L, 2L))
    // from version 3: only the second append ships
    assert(keys(drain("gwsv.`t$wide`", freshRoot("sv-w1"),
      Map("startingVersion" -> "3"))) == Seq(2L))
    // latest: nothing already committed ships
    assert(keys(drain("gwsv.`t$wide`", freshRoot("sv-w2"),
      Map("startingVersion" -> "latest"))).isEmpty)
    // malformed value fails loudly
    val err = intercept[Exception](drain("gwsv.`t$wide`",
      freshRoot("sv-w3"), Map("startingVersion" -> "nope")))
    assert(err.getMessage != null)
    // ADVICE r10: a start AHEAD of the table's head fails loudly too —
    // the first latestOffset would otherwise land BEHIND the initial
    // offset and break Spark's monotonicity handling
    val ahead = intercept[Exception](drain("gwsv.`t$wide`",
      freshRoot("sv-w4"), Map("startingVersion" -> "99")))
    assert(ahead.getMessage.contains("ahead") ||
      Option(ahead.getCause).exists(_.getMessage.contains("ahead")),
      ahead.getMessage)
  }

  test("default read limit: a long backfill drains in bounded batches") {
    // r10 ask 5: without maxVersionsPerTrigger, a fresh stream against a
    // long history must NOT plan the whole backlog as one micro-batch —
    // the cap defaults to DefaultMaxVersionsPerTrigger; the literal
    // 'all' is the explicit opt-out.
    assert(GraftMicroBatchStream.parseMaxVersions(None)
      .contains(GraftMicroBatchStream.DefaultMaxVersionsPerTrigger))
    assert(GraftMicroBatchStream.parseMaxVersions(Some("all")).isEmpty)
    assert(GraftMicroBatchStream.parseMaxVersions(Some("7")).contains(7L))
    intercept[IllegalArgumentException](
      GraftMicroBatchStream.parseMaxVersions(Some("0")))
    val root = freshRoot("widestream-cap")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string")), 1L)
    val n = GraftMicroBatchStream.DefaultMaxVersionsPerTrigger.toInt + 2
    (1 to n).foreach { i =>
      g.table("t").put(Seq(Put(Bytes.toBytes(i.toLong))
        .add("f", b("city"), i + 1L, b(s"c$i"))), i + 1L)
    }
    register("gwcap", root)
    // default: the backfill splits (> 1 non-empty batch), nothing lost
    val capped = drain("gwcap.`t$wide`", freshRoot("widestream-cap-w1"))
    assert(capped.size > 1,
      s"backfill of $n versions landed in ${capped.size} batch(es)")
    assert(capped.flatten.map(_.getLong(0)).sorted == (1 to n).map(_.toLong))
    // explicit opt-out: one batch carries everything
    val all = drain("gwcap.`t$wide`", freshRoot("widestream-cap-w2"),
      Map("maxVersionsPerTrigger" -> "all"))
    assert(all.size == 1, s"'all' still split into ${all.size} batches")
    assert(all.head.map(_.getLong(0)).sorted == (1 to n).map(_.toLong))
  }

  test("withDeletes ships whole-row delete markers; default ships nothing") {
    val root = freshRoot("widestream-del")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f"), FamilyDescriptor("g")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;g:pop:long")), 1L)
    g.table("t").put(Seq(
      Put(Bytes.toBytes(1L)).add("f", b("city"), 2L, b("paris"))
        .add("g", b("pop"), 2L, Bytes.toBytes(10L)),
      Put(Bytes.toBytes(2L)).add("f", b("city"), 2L, b("rome"))
        .add("g", b("pop"), 2L, Bytes.toBytes(20L))), 2L)
    // version 3: whole-row delete of key 2 (DeleteFamily in EVERY
    // family), a PARTIAL family delete of key 1 (no marker — visibility,
    // not a relational delete)
    g.table("t").delete(Seq(
      Delete(Bytes.toBytes(2L)).deleteFamily("f", 3L).deleteFamily("g", 3L),
      Delete(Bytes.toBytes(1L)).deleteFamily("g", 3L)), 3L)
    register("gwsd", root)
    def tup(r: org.apache.spark.sql.Row) =
      (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    // default: the tombstone batch ships nothing
    val plain = drain("gwsd.`t$wide`", freshRoot("widestream-del-w1"),
      Map("maxVersionsPerTrigger" -> "1"))
    assert(plain.size == 1 && plain.head.size == 2, plain)
    // withDeletes: ONE all-null marker for key 2, nothing for key 1
    val withDel = drain("gwsd.`t$wide`", freshRoot("widestream-del-w2"),
      Map("maxVersionsPerTrigger" -> "1", "withDeletes" -> "true"))
    assert(withDel.size == 2, withDel)
    assert(withDel.head.map(tup).toSet ==
      Set((1L, Some("paris"), Some(10L)), (2L, Some("rome"), Some(20L))))
    assert(withDel(1).map(tup) == Seq((2L, None, None)), withDel(1))
    // batch reads refuse the option — resolved state has no deletes
    val err = intercept[Exception](
      spark.read.option("withDeletes", "true").table("gwsd.`t$wide`")
        .collect())
    assert(err.getMessage.contains("withDeletes"), err.getMessage)
  }

  test("withDeletes: a put masked by a same-batch newer DeleteFamily " +
      "ships the marker, not a stale upsert") {
    // ADVICE r10: one mutate mixing a Put and a NEWER whole-row delete
    // for the same key — the resolved state deletes the row, so the CDC
    // feed must ship the marker (shipping the put would break the
    // 'merge reconstructs resolved state' contract). A put NEWER than
    // the tombstone survives as a normal upsert.
    import graft.write.Mutations
    val root = freshRoot("widestream-mix")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f"), FamilyDescriptor("g")),
      splitKeys = 2, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;g:pop:long")), 1L)
    // version 2, ONE batch: key 1 put(ts=3) + DeleteFamily(ts=4) in every
    // family (masked — marker); key 2 put(ts=5) + DeleteFamily(ts=4)
    // (put survives — upsert); key 3 put(ts=3) + DeleteFamily(ts=4) in
    // ONE family only (partial delete — upsert with that family nulled)
    g.table("t").mutate(Mutations.toDF(spark, Seq(
      Put(Bytes.toBytes(1L)).add("f", b("city"), 3L, b("paris"))
        .add("g", b("pop"), 3L, Bytes.toBytes(10L)),
      Delete(Bytes.toBytes(1L)).deleteFamily("f", 4L).deleteFamily("g", 4L),
      Put(Bytes.toBytes(2L)).add("f", b("city"), 5L, b("rome"))
        .add("g", b("pop"), 5L, Bytes.toBytes(20L)),
      Delete(Bytes.toBytes(2L)).deleteFamily("f", 4L).deleteFamily("g", 4L),
      Put(Bytes.toBytes(3L)).add("f", b("city"), 3L, b("oslo"))
        .add("g", b("pop"), 3L, Bytes.toBytes(30L)),
      Delete(Bytes.toBytes(3L)).deleteFamily("g", 4L)), 2L), 2L)
    register("gwsm", root)
    def tup(r: org.apache.spark.sql.Row) =
      (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    val withDel = drain("gwsm.`t$wide`", freshRoot("widestream-mix-w"),
      Map("withDeletes" -> "true"))
    assert(withDel.flatten.map(tup).toSet == Set(
      (1L, None, None),                  // masked put -> marker
      (2L, Some("rome"), Some(20L)),     // newer put survives the delete
      (3L, Some("oslo"), None)),         // partial delete nulls g.pop only
      withDel)
    // CDC-merge parity: the batch read (resolved state) agrees
    val resolved = spark.sql("SELECT k, city, pop FROM gwsm.`t$wide`")
      .collect().map(tup).toSet
    assert(resolved == Set(
      (2L, Some("rome"), Some(20L)), (3L, Some("oslo"), None)), resolved)
    // default (no withDeletes): key 1 ships NOTHING (no surviving put)
    val plain = drain("gwsm.`t$wide`", freshRoot("widestream-mix-w2"))
    assert(plain.flatten.map(tup).toSet == Set(
      (2L, Some("rome"), Some(20L)), (3L, Some("oslo"), None)), plain)
  }

  test("salted multi-family streams never split a row across upserts") {
    // Regression: committed files sort by the SALTED key, but the merge
    // comparator saw stripped keys — when a range partition spans a salt
    // bucket boundary and the families' row sets differ, the sparse
    // family's stream runs ahead in salted order, the stripped-order heap
    // picks its row early, and the dense family's cells for the SAME row
    // surface later as a second upsert (a split row). The comparator now
    // orders by (salt byte, key), matching the files' physical order.
    val root = freshRoot("widestream-saltmf")
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t",
      Seq(FamilyDescriptor("f"), FamilyDescriptor("g")),
      splitKeys = 4, saltBuckets = 8, wideKey = Some("k:long"),
      wideSchema = Some("f:city:string;g:pop:long")), 1L)
    // f on every row, g only on a sparse subset — the desync shape
    g.table("t").put((1 to 200).map { i =>
      val p = Put(Bytes.toBytes(i.toLong)).add("f", b("city"), 2L, b(s"c$i"))
      if (i % 7 == 0) p.add("g", b("pop"), 2L, Bytes.toBytes(i.toLong * 10))
      else p
    }, 2L)
    register("gwssm", root)
    val work = freshRoot("widestream-saltmf-w")
    val rows = drain("gwssm.`t$wide`", work).flatten
    val dup = rows.map(_.getLong(0)).groupBy(identity).filter(_._2.size > 1)
    assert(dup.isEmpty, s"split upserts for keys ${dup.keys.toSeq.sorted}")
    val tup = rows.map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(tup == (1 to 200).map(i => (i.toLong, s"c$i",
      if (i % 7 == 0) Some(i.toLong * 10) else None)).toSet)
  }
}
