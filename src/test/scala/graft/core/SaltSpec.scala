package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted row keys: write-side spread + read-side scatter-gather must be
  * invisible to scan semantics, spread a monotonic keyspace evenly, and
  * keep the fan-out predicate parquet-prunable. */
class SaltSpec extends SparkSpec {

  import spark.implicits._

  private def monotonicCells(n: Int) = cells(
    (0 until n).map(i => Cell.put(Bytes.toBytes(i.toLong), "f",
      Bytes.toBytes("q"), 1L, Bytes.toBytes(i.toLong)))).toDF()

  test("strip(salt(cells)) round-trips every row key") {
    val src = monotonicCells(500)
    val back = Salt.stripCells(Salt.saltCells(src, 16))
    val a = src.select("row").collect().map(_.getAs[Array[Byte]](0).toVector).sortBy(_.toString)
    val b = back.select("row").collect().map(_.getAs[Array[Byte]](0).toVector).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("salt is deterministic and bounded by n") {
    val salted = Salt.saltCells(monotonicCells(300), 8)
    val salts = salted.select(col("row")).collect()
      .map(_.getAs[Array[Byte]](0)(0) & 0xff)
    assert(salts.forall(s => s >= 0 && s < 8))
    val again = Salt.saltCells(monotonicCells(300), 8)
      .select(col("row")).collect().map(_.getAs[Array[Byte]](0)(0) & 0xff)
    assert(salts.toSeq == again.toSeq)
  }

  test("monotonic keys spread across buckets (max within 2x of mean)") {
    val salted = Salt.saltCells(monotonicCells(4000), 16)
    val byBucket = salted
      .groupBy(substring(col("row"), 1, 1).as("s")).count()
      .collect().map(_.getAs[Long]("count"))
    assert(byBucket.length == 16)
    val mean = 4000.0 / 16
    assert(byBucket.max <= 2 * mean,
      s"hot bucket ${byBucket.max} vs mean $mean")
  }

  test("scatter-gather range equals the unsalted range scan") {
    val src = monotonicCells(1000)
    val salted = Salt.saltCells(src, 16)
    val ranges = Seq(
      (Some(Bytes.toBytes(100L)), Some(Bytes.toBytes(400L))),
      (None, Some(Bytes.toBytes(77L))),
      (Some(Bytes.toBytes(990L)), None),
      (None, None))
    for ((lo, hi) <- ranges) {
      var expect = src
      lo.foreach(b => expect = expect.filter(col("row") >= lit(b)))
      hi.foreach(b => expect = expect.filter(col("row") < lit(b)))
      val got = Salt.scanRange(salted, 16, lo, hi)
      val e = expect.select("row").collect().map(_.getAs[Array[Byte]](0).toVector).sortBy(_.toString).toSeq
      val g = got.select("row").collect().map(_.getAs[Array[Byte]](0).toVector).sortBy(_.toString).toSeq
      assert(g == e, s"range ($lo, $hi)")
    }
  }

  test("open-stop scatter keeps salt 255 tail (n=256 edge)") {
    val src = monotonicCells(2000)
    val salted = Salt.saltCells(src, 256)
    assert(Salt.scanRange(salted, 256, None, None).count() == 2000)
  }

  test("scatter predicate reaches the parquet scan as pushed filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-salt").toString
    Salt.saltCells(monotonicCells(2000), 16)
      .write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .filter(Salt.scatter(16, Some(Bytes.toBytes(10L)), Some(Bytes.toBytes(20L))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [Or("),
      s"scatter OR-of-ranges not pushed:\n$plan")
  }
}
