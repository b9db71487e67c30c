package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.sql.Timestamp

/** The round-5 lesson as executable law: the engine adapts to whatever
  * timestamp unit the corpus ships (ns-as-long, us/NTZ, instant) and the
  * contract pre-flight turns a non-adaptable regen into one actionable
  * line, not ten AnalysisExceptions. */
class DataContractSpec extends SparkSpec {

  import spark.implicits._

  private val microsA = 1704067200000000L // 2024-01-01T00:00:00Z in us
  private val microsB = 1704070800000000L // +1h

  test("EventTime.normalize: long nanos pass through untouched") {
    val df = Seq((1L, microsA * 1000L), (2L, microsB * 1000L)).toDF("id", "ts")
    val out = EventTime.normalize(df)
    assert(out.schema("ts").dataType == LongType)
    assert(out.orderBy("id").select("ts").as[Long].collect().toSeq ==
      Seq(microsA * 1000L, microsB * 1000L))
  }

  test("EventTime.normalize: timestamp_ntz micros land on identical nanos") {
    val ntz = Seq((1L, microsA), (2L, microsB)).toDF("id", "us")
      .select(col("id"), timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType == TimestampNTZType) // fixture is really NTZ
    val out = EventTime.normalize(ntz)
    assert(out.schema("ts").dataType == LongType)
    // BOTH directions: the us-shaped fixture normalizes to the same nanos
    // as the ns-shaped one — the two corpus generations are one engine view
    assert(out.orderBy("id").select("ts").as[Long].collect().toSeq ==
      Seq(microsA * 1000L, microsB * 1000L))
  }

  test("EventTime.normalize: instant timestamps convert via unix_micros") {
    val df = Seq((1L, new Timestamp(microsA / 1000L))).toDF("id", "ts")
    assert(df.schema("ts").dataType == TimestampType)
    val out = EventTime.normalize(df)
    assert(out.select("ts").as[Long].head() == microsA * 1000L)
  }

  test("EventTime.nanos rejects a non-temporal column with a unit message") {
    val e = intercept[IllegalArgumentException] {
      EventTime.nanos(StringType, col("ts"))
    }
    assert(e.getMessage.contains("unsupported type"))
  }

  test("contract passes on a conforming corpus, either ts unit") {
    def corpus(tsUnit: String): String = {
      val dir = Files.createTempDirectory("graft-contract").toString
      val ev = Seq((1L, microsA, 10L, "click", 1.0, "{}"))
        .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      val shaped = tsUnit match {
        case "ns" => ev.select(col("event_id"), (col("us") * 1000L).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        case "us" => ev.select(col("event_id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      }
      shaped.write.parquet(s"$dir/events.parquet")
      Seq((1, "r")).toDF("r_regionkey", "r_name").write.parquet(s"$dir/region.parquet")
      Seq((1, "n", 1)).toDF("n_nationkey", "n_name", "n_regionkey")
        .write.parquet(s"$dir/nation.parquet")
      Seq((1L, "c", 1, 0.0, "B"))
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .write.parquet(s"$dir/customer.parquet")
      Seq((1L, "s")).toDF("s_suppkey", "s_name").write.parquet(s"$dir/supplier.parquet")
      Seq((1L, "p")).toDF("p_partkey", "p_name").write.parquet(s"$dir/part.parquet")
      Seq((1L, 1L, "F", 1.0, new Timestamp(0L), "1-URGENT"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.parquet(s"$dir/orders.parquet")
      Seq((1L, 1.0, 1.0, 0.1, 0.02, "N", "O", new Timestamp(0L)))
        .toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
          "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
        .write.parquet(s"$dir/lineitem.parquet")
      Seq((1L, "t", "en", "web")).toDF("doc_id", "text", "lang", "source")
        .write.parquet(s"$dir/documents.parquet")
      Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
        .write.parquet(s"$dir/embeddings.parquet")
      dir
    }
    assert(DataContract.violations(spark, corpus("ns")).isEmpty)
    assert(DataContract.violations(spark, corpus("us")).isEmpty)
  }

  test("EventTime.normalize: all four dispatch arms agree across parquet") {
    // Midnight-aligned instants, so DateType (day resolution) can encode
    // the SAME instants as the three finer-grained arms. Each shape is
    // WRITTEN to parquet and read back — proving the whole ingest path
    // (writer encoding -> parquet logical type -> Spark read type ->
    // EventTime dispatch), not just in-memory casts.
    val days = Seq("2024-01-01", "2024-03-15")
    val expected = days.map(EventTime.nanosOf)
    val base = days.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("id", "day")
    val shapes: Map[String, DataType] = Map(
      "long" -> LongType, "instant" -> TimestampType,
      "ntz" -> TimestampNTZType, "date" -> DateType)
    val dir = Files.createTempDirectory("graft-et4").toString
    val results = shapes.map { case (kind, expectType) =>
      val ts = kind match {
        case "long" => unix_micros(to_timestamp(col("day"))) * 1000L
        case "instant" => to_timestamp(col("day"))
        case "ntz" => to_timestamp_ntz(col("day"))
        case "date" => to_date(col("day"))
      }
      base.select(col("id"), ts.as("ts")).write.parquet(s"$dir/$kind")
      val back = spark.read.parquet(s"$dir/$kind")
      assert(back.schema("ts").dataType == expectType,
        s"$kind round-tripped as ${back.schema("ts").dataType}")
      kind -> EventTime.normalize(back)
        .orderBy("id").select("ts").as[Long].collect().toSeq
    }
    for ((kind, nanos) <- results)
      assert(nanos == expected, s"arm $kind: $nanos != $expected")
  }

  test("contract rejects epoch-long calendar-time columns (no normalize seam)") {
    // o_orderdate/l_shipdate are compared against date literals directly;
    // a regen shipping them as epoch longs must FAIL pre-flight, not pass
    // as 'adaptable event time' and die inside the first date comparison.
    val dir = Files.createTempDirectory("graft-contract-cal").toString
    Seq((1L, 1L, "F", 1.0, 1704067200000000000L, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val v = DataContract.violations(spark, dir)
    val line = v.find(_.startsWith("orders.o_orderdate:"))
    assert(line.isDefined, s"expected o_orderdate violation in: $v")
    assert(line.get.contains("bigint not adaptable"))
    assert(line.get.contains("calendar time"))
  }

  test("contract flags a non-adaptable ts type with one actionable line") {
    val dir = Files.createTempDirectory("graft-contract-bad").toString
    Seq((1L, "2024-01-01", 10L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val v = DataContract.violations(spark, dir)
    val tsLine = v.find(_.startsWith("events.ts:"))
    assert(tsLine.isDefined, s"expected events.ts violation in: $v")
    assert(tsLine.get.contains("string not adaptable"))
    assert(tsLine.get.contains("event time"))
    // missing tables are reported as missing, not as crashes
    assert(v.exists(_.startsWith("region: missing")))
  }

  test("readAdaptive: ns-annotated parquet reads as nanos longs, even with stale embedded schema") {
    // TIMESTAMP(NANOS) parquet comes in two flavors (both written with
    // parquet-hadoop's low-level writer — Spark cannot produce either):
    //  (a) CLEAN: inference maps it to LongType via nanosAsLong — always
    //      readable, and readAdaptive is an identity on it;
    //  (b) STALE-METADATA: the footer also carries an embedded
    //      `org.apache.spark.sql.parquet.row.metadata` key claiming the
    //      column is timestamp_ntz (what you get when a rewriting tool
    //      casts a Spark-written us column to ns but PRESERVES key-value
    //      metadata — pyarrow does, and tools/finalize_scale.py shipped
    //      exactly this for two rounds). Spark trusts the embedded schema
    //      over the footer's physical truth, infers NTZ, and the
    //      vectorized reader then dies on the nanos column. readAdaptive
    //      keys on the footer ANNOTATION instead, overrides to LongType,
    //      and reads the raw nanos — the engine ingests the file the
    //      embedded lie would otherwise brick.
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
    val dir = Files.createTempDirectory("graft-et-ns").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val schema = Types.buildMessage()
      .addField(Types.required(INT64).named("id"))
      .addField(Types.required(INT64)
        .as(LogicalTypeAnnotation.timestampType(false,
          LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts"))
      .named("events")
    val gf = new SimpleGroupFactory(schema)
    def write(file: String, extra: Map[String, String]): Unit = {
      import scala.jdk.CollectionConverters._
      val w = ExampleParquetWriter.builder(HadoopOutputFile.fromPath(
          new org.apache.hadoop.fs.Path(file), conf))
        .withType(schema).withExtraMetaData(extra.asJava).build()
      try {
        w.write(gf.newGroup().append("id", 1L).append("ts", microsA * 1000L))
        w.write(gf.newGroup().append("id", 2L).append("ts", microsB * 1000L))
      } finally w.close()
    }
    val clean = s"$dir/clean.parquet"
    write(clean, Map.empty)
    assert(spark.read.parquet(clean).schema("ts").dataType == LongType,
      "clean ns-annotated parquet should infer long via nanosAsLong")
    val staleSchema = StructType(Seq(StructField("id", LongType),
      StructField("ts", TimestampNTZType)))
    val stale = s"$dir/stale.parquet"
    write(stale, Map("org.apache.spark.sql.parquet.row.metadata" -> staleSchema.json))
    // the embedded lie wins at inference and bricks the plain read path
    assert(spark.read.parquet(stale).schema("ts").dataType == TimestampNTZType)
    intercept[Exception] {
      spark.read.parquet(stale).select("ts").collect()
    }
    for (file <- Seq(clean, stale)) {
      assert(EventTime.nanosAnnotated(spark, file) == Set("ts"))
      val adaptive = EventTime.readAdaptive(spark, file)
      assert(adaptive.schema("ts").dataType == LongType)
      val out = EventTime.normalize(adaptive)
        .orderBy("id").select("ts").as[Long].collect().toSeq
      assert(out == Seq(microsA * 1000L, microsB * 1000L), s"file $file")
    }
  }

  test("contract read-probe flags a schema-adaptable but unreadable file") {
    // The failure class the probe exists for: inference succeeds (types
    // all adaptable) but row-level read dies — e.g. TIMESTAMP(NANOS)
    // parquet on Spark 4.1, or a corrupt data page. Fabricated here by
    // corrupting data-page bytes while leaving the footer (and thus the
    // schema) intact.
    val dir = Files.createTempDirectory("graft-contract-probe").toString
    (1L to 200L).map(i => (i, s"text body $i", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val part = new java.io.File(s"$dir/documents.parquet").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val raf = new java.io.RandomAccessFile(part, "rw")
    try {
      raf.seek(50) // inside the first data page, far from the footer
      raf.write(Array.fill[Byte](64)(0x5a))
    } finally raf.close()
    val v = DataContract.violations(spark, dir)
    val line = v.find(_.startsWith("documents:"))
    assert(line.isDefined, s"expected documents read-probe violation in: $v")
    assert(line.get.contains("UNREADABLE"))
  }

  test("contract flags an absent column") {
    val dir = Files.createTempDirectory("graft-contract-col").toString
    Seq((1L, 1L)).toDF("event_id", "user_id").write.parquet(s"$dir/events.parquet")
    val v = DataContract.violations(spark, dir)
    assert(v.exists(l => l.startsWith("events.ts:") && l.contains("column absent")))
  }
}
