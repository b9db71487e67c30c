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

  test("prefixSuccessor produces tight sargable ranges") {
    assert(Bytes.prefixSuccessor("abc".getBytes).get.toSeq == "abd".getBytes.toSeq)
    assert(Bytes.prefixSuccessor(Array(0x61.toByte, 0xff.toByte)).get.toSeq == Seq(0x62.toByte))
    assert(Bytes.prefixSuccessor(Array(0xff.toByte, 0xff.toByte)).isEmpty)
  }
}
