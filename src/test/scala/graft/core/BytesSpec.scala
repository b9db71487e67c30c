package graft.core

import graft.SparkSpec

/** Codec parity with the reference's `Bytes` (`hbase/util/Bytes.java`) and
  * the SURVEY §7.5 risk-1 check: Spark BinaryType ordering must equal the
  * unsigned-lexicographic `Bytes.BYTES_COMPARATOR`. Seeded randomness for
  * determinism. */
class BytesSpec extends SparkSpec {
  private val rnd = new scala.util.Random(42)

  test("long round-trip, big-endian, order-preserving for non-negatives") {
    val samples = Seq(0L, 1L, 255L, 256L, Long.MaxValue) ++
      Seq.fill(200)(rnd.nextLong().abs)
    for (a <- samples; b <- samples.take(20)) {
      assert(Bytes.toLong(Bytes.toBytes(a)) == a)
      assert(math.signum(Bytes.compareTo(Bytes.toBytes(a), Bytes.toBytes(b))) ==
        math.signum(java.lang.Long.compare(a, b)))
    }
  }

  test("int/double/string/boolean round-trips") {
    for (_ <- 1 to 200) {
      val i = rnd.nextInt(); assert(Bytes.toInt(Bytes.toBytes(i)) == i)
      val d = rnd.nextDouble() * rnd.nextLong()
      assert(Bytes.toDouble(Bytes.toBytes(d)) == d)
      val s = rnd.alphanumeric.take(rnd.nextInt(20)).mkString
      assert(Bytes.toString(Bytes.toBytes(s)) == s)
    }
    assert(Bytes.toBoolean(Bytes.toBytes(true)))
    assert(!Bytes.toBoolean(Bytes.toBytes(false)))
  }

  test("Spark BinaryType ordering == unsigned-lexicographic BYTES_COMPARATOR") {
    import spark.implicits._
    val arrays: Seq[Array[Byte]] =
      Seq.fill(300) { val b = new Array[Byte](rnd.nextInt(7)); rnd.nextBytes(b); b } ++
        Seq(Array[Byte](0), Array[Byte](-1), Array[Byte](127), Array[Byte](-128), Array.emptyByteArray)
    val sparkSorted = spark.createDataset(arrays).toDF("b")
      .orderBy("b").collect().map(_.getAs[Array[Byte]](0).toSeq).toSeq
    val ourSorted = arrays.sortWith((a, b) => Bytes.compareTo(a, b) < 0).map(_.toSeq)
    assert(sparkSorted == ourSorted)
  }

  test("ordered encodings: round-trip + order-preserving over the FULL range") {
    // signed longs/ints — including both signs and the extremes
    val longs = Seq(Long.MinValue, -256L, -1L, 0L, 1L, 255L, Long.MaxValue) ++
      Seq.fill(200)(rnd.nextLong())
    for (a <- longs; b <- longs.take(25)) {
      assert(Bytes.toLongOrdered(Bytes.toBytesOrdered(a)) == a)
      assert(math.signum(Bytes.compareTo(
        Bytes.toBytesOrdered(a), Bytes.toBytesOrdered(b))) ==
        math.signum(java.lang.Long.compare(a, b)))
    }
    val ints = Seq(Int.MinValue, -1, 0, 1, Int.MaxValue) ++
      Seq.fill(100)(rnd.nextInt())
    for (a <- ints; b <- ints.take(20)) {
      assert(Bytes.toIntOrdered(Bytes.toBytesOrdered(a)) == a)
      assert(math.signum(Bytes.compareTo(
        Bytes.toBytesOrdered(a), Bytes.toBytesOrdered(b))) ==
        math.signum(Integer.compare(a, b)))
    }
    // doubles — negatives, fractions, zeros, infinities (the IEEE sign
    // bit is exactly what the plain encoding gets wrong)
    val doubles = Seq(Double.NegativeInfinity, -1e300, -2.5, -0.5, -0.0,
      0.0, 0.25, 1.0, 1e300, Double.PositiveInfinity) ++
      Seq.fill(200)(rnd.nextDouble() * rnd.nextLong())
    for (a <- doubles; b <- doubles.take(25)) {
      assert(Bytes.toDoubleOrdered(Bytes.toBytesOrdered(a)) == a ||
        (a == 0.0 && Bytes.toDoubleOrdered(Bytes.toBytesOrdered(a)) == 0.0))
      if (java.lang.Double.compare(a, b) != 0 && !(a == b))
        assert(math.signum(Bytes.compareTo(
          Bytes.toBytesOrdered(a), Bytes.toBytesOrdered(b))) ==
          math.signum(java.lang.Double.compare(a, b)).toInt)
    }
  }

  test("column-side ordered codecs match the JVM-side encodings bit-exactly") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val longs = Seq(Long.MinValue, -256L, -1L, 0L, 1L, Long.MaxValue) ++
      Seq.fill(50)(rnd.nextLong())
    val encL = longs.toDF("v")
      .select(CellCodec.longBytesOrdered(col("v")).as("b"),
        col("v")).collect()
    encL.foreach { r =>
      assert(r.getAs[Array[Byte]]("b").toSeq ==
        Bytes.toBytesOrdered(r.getLong(1)).toSeq)
    }
    assert(longs.toDF("v")
      .select(Bytes.asLongOrdered(CellCodec.longBytesOrdered(col("v"))))
      .collect().map(_.getLong(0)).toSeq == longs)
    val ints = Seq(Int.MinValue, -1, 0, 1, Int.MaxValue) ++
      Seq.fill(50)(rnd.nextInt())
    ints.toDF("v")
      .select(CellCodec.intBytesOrdered(col("v")).as("b"), col("v"))
      .collect().foreach { r =>
        assert(r.getAs[Array[Byte]]("b").toSeq ==
          Bytes.toBytesOrdered(r.getInt(1)).toSeq)
      }
    assert(ints.toDF("v")
      .select(Bytes.asIntOrdered(CellCodec.intBytesOrdered(col("v"))))
      .collect().map(_.getInt(0)).toSeq == ints)
    val doubles = Seq(-1e300, -2.5, -0.5, 0.0, 0.25, 1.0, 1e300) ++
      Seq.fill(50)(rnd.nextDouble() * rnd.nextLong())
    doubles.toDF("v")
      .select(CellCodec.doubleBytesOrdered(col("v")).as("b"), col("v"))
      .collect().foreach { r =>
        assert(r.getAs[Array[Byte]]("b").toSeq ==
          Bytes.toBytesOrdered(r.getDouble(1)).toSeq)
      }
    assert(doubles.toDF("v")
      .select(Bytes.asDoubleOrdered(CellCodec.doubleBytesOrdered(col("v"))))
      .collect().map(_.getDouble(0)).toSeq == doubles)
  }

  test("column-side PLAIN int/long codecs match Bytes.toBytes for the FULL signed range") {
    // The trap: a negative int cast to long sign-extends to 16 hex
    // nibbles and lpad keeps the leftmost 8 — every negative int (and
    // every pre-1970 DateType days value) used to encode as 0xFFFFFFFF.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val ints = Seq(Int.MinValue, -86400, -256, -5, -1, 0, 1, Int.MaxValue) ++
      Seq.fill(50)(rnd.nextInt())
    ints.toDF("v")
      .select(CellCodec.intBytes(col("v")).as("b"), col("v"))
      .collect().foreach { r =>
        assert(r.getAs[Array[Byte]]("b").toSeq == Bytes.toBytes(r.getInt(1)).toSeq)
      }
    assert(ints.toDF("v")
      .select(Bytes.asInt(CellCodec.intBytes(col("v"))))
      .collect().map(_.getInt(0)).toSeq == ints)
    val longs = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue) ++
      Seq.fill(50)(rnd.nextLong())
    longs.toDF("v")
      .select(CellCodec.longBytes(col("v")).as("b"), col("v"))
      .collect().foreach { r =>
        assert(r.getAs[Array[Byte]]("b").toSeq == Bytes.toBytes(r.getLong(1)).toSeq)
      }
    assert(longs.toDF("v")
      .select(Bytes.asLong(CellCodec.longBytes(col("v"))))
      .collect().map(_.getLong(0)).toSeq == longs)
  }

  test("prefixSuccessor produces tight sargable ranges") {
    assert(Bytes.prefixSuccessor("abc".getBytes).get.toSeq == "abd".getBytes.toSeq)
    assert(Bytes.prefixSuccessor(Array(0x61.toByte, 0xff.toByte)).get.toSeq == Seq(0x62.toByte))
    assert(Bytes.prefixSuccessor(Array(0xff.toByte, 0xff.toByte)).isEmpty)
  }
}
