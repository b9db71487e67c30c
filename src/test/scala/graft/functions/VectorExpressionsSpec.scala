package graft.functions

import graft.SparkSpec
import graft.core.Bytes
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("double<->bits round-trips and matches the JVM codec byte-for-byte") {
    val vals = Seq(0.0, -0.0, 1.5, -273.15, Double.MaxValue, Double.MinPositiveValue)
    val df = vals.toDF("d")
      .withColumn("bits", VectorFunctions.doubleToBits(col("d")))
      .withColumn("back", VectorFunctions.bitsToDouble(col("bits")))
    val rows = df.collect()
    for ((v, r) <- vals.zip(rows)) {
      assert(r.getAs[Array[Byte]]("bits").toSeq == Bytes.toBytes(v).toSeq)
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("back")) ==
        java.lang.Double.doubleToLongBits(v))
    }
    // null in -> null out
    val n = Seq[Option[Double]](None).toDF("d")
      .select(VectorFunctions.doubleToBits(col("d"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("bits_to_long/int decode SIGNED values and match the JVM codec") {
    val vals = Seq(0L, 1L, -1L, 42L, -42L, Long.MaxValue, Long.MinValue)
    val df = vals.map(v => Tuple1(Bytes.toBytes(v))).toDF("b")
      .select(VectorFunctions.bitsToLong(col("b")).as("v"))
    assert(df.as[Long].collect().toSeq == vals)
    val ints = Seq(0, 7, -7, Int.MaxValue, Int.MinValue)
    val di = ints.map(v => Tuple1(Bytes.toBytes(v))).toDF("b")
      .select(VectorFunctions.bitsToInt(col("b")).as("v"))
    assert(di.as[Int].collect().toSeq == ints)
    // short input decodes unsigned (conv-compat); null in -> null out
    val s = Seq(Tuple1(Array[Byte](1, 2))).toDF("b")
      .select(VectorFunctions.bitsToLong(col("b"))).collect()(0)
    assert(s.getLong(0) == 258L)
    val n = Seq(Tuple1(null.asInstanceOf[Array[Byte]])).toDF("b")
      .select(VectorFunctions.bitsToLong(col("b"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("graft_dot matches the interpreted zip_with+aggregate bit-for-bit") {
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(0.5f, -1.0f, 2.0f)),
      (2L, Seq(0.1f, 0.2f, 0.3f), Seq(0.9f, 0.8f, 0.7f)),
      (3L, Seq(1e-8f, 1e8f, -1e8f), Seq(1e8f, 1e-8f, 1e-8f)))
      .toDF("id", "a", "b")
    val out = vecs.select(
      VectorFunctions.dotProduct(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
  }

  test("graft_dot is available in SQL via the session extension") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").collect()(0)
    assert(r.getDouble(0) == 11.0)
  }

  test("graft_hyperplane_band matches the interpreted HOF formulation exactly") {
    // the HOF formulation the native expression replaced — kept here as
    // the parity oracle (sign bit = bit 0 of xxhash64(j, i), seed 42)
    def hofBand(vec: org.apache.spark.sql.Column, b: Int, w: Int) = {
      val bits = (0 until w).map { r =>
        val j = b * w + r
        val prods = transform(vec, (x, i) =>
          when(xxhash64(lit(j), i).bitwiseAND(1) === 1,
            x.cast("double")).otherwise(-x.cast("double")))
        val s = aggregate(prods, lit(0.0), (acc, x) => acc + x)
        when(s > 0, shiftleft(lit(1L), r)).otherwise(lit(0L))
      }
      bits.reduce((a, c) => a.bitwiseOR(c))
    }
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 50).map(i =>
      (i.toLong, Seq.fill(32)(rnd.nextFloat() * 2 - 1))).toDF("id", "v")
    for (b <- Seq(0, 3, 15); w <- Seq(1, 8, 64)) {
      val out = vecs.select(
        VectorFunctions.hyperplaneBand(col("v"), b, w).as("native"),
        hofBand(col("v"), b, w).as("hof")).collect()
      out.foreach(r => assert(r.getLong(0) == r.getLong(1), s"band=$b w=$w"))
    }
    // double-typed arrays take the other element path
    val dv = Seq((1L, Seq(0.5, -1.25, 3.0))).toDF("id", "v")
    val d = dv.select(VectorFunctions.hyperplaneBand(col("v"), 2, 16).as("n"),
      hofBand(col("v"), 2, 16).as("h")).collect()(0)
    assert(d.getLong(0) == d.getLong(1))
  }

  test("graft_plane_bands matches the per-band DotProduct composition exactly") {
    val rnd = new scala.util.Random(13)
    val dim = 24
    val planes = graft.pipeline.Similarity.md5Planes(32, dim)
    val vecs = ((1 to 40).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1))) :+
      (99L, Seq.fill(dim)(0.0f))) // all-zero edge: every sign non-positive
      .toDF("id", "v")
    for (bands <- Seq(4, 32)) {
      val composed = (0 until bands).map(b =>
        graft.pipeline.Similarity.planeBand(col("v"), planes, bands, b))
      val out = vecs.select(col("id"),
        VectorFunctions.planeBands(col("v"), planes, bands).as("native"),
        array(composed: _*).as("spec")).collect()
      out.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)} bands=$bands")
      }
    }
    // double-typed arrays take the other element path
    val dv = Seq((1L, Seq.fill(dim)(0.37))).toDF("id", "v")
    val d = dv.select(
      VectorFunctions.planeBands(col("v"), planes, 8).as("n"),
      array((0 until 8).map(b =>
        graft.pipeline.Similarity.planeBand(col("v"), planes, 8, b)): _*).as("s"))
      .collect()(0)
    assert(d.getSeq[Long](0) == d.getSeq[Long](1))
    // interpreted eval matches the codegen'd plan path
    val e = PlaneBands(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq.fill(dim)(0.37), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      8, 4, planes.take(32).flatten)
    assert(e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq == d.getSeq[Long](0))
  }

  test("graft_pq_encode / graft_pq_adc match a pure-Scala reference") {
    val rnd = new scala.util.Random(29)
    val m = 4; val k = 3; val sub = 5; val dim = m * sub
    val codebooks: Seq[Seq[Seq[Double]]] = Seq.fill(m, k, sub)(rnd.nextDouble() * 2 - 1)
    val vecs = (1 to 30).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1))).toDF("id", "v")
    def refEncode(v: Seq[Float]): Seq[Int] =
      (0 until m).map { j =>
        val x = v.slice(j * sub, (j + 1) * sub).map(_.toDouble)
        (0 until k).maxBy { c =>
          val cv = codebooks(j)(c)
          // tuple ordering: score asc, then PREFER lower cid on ties
          (x.zip(cv).map { case (a, b) => a * b }.sum -
            cv.map(b => b * b).sum / 2, -c)
        }
      }
    def refTable(v: Seq[Float]): Seq[Double] =
      for (j <- 0 until m; c <- 0 until k)
        yield v.slice(j * sub, (j + 1) * sub).map(_.toDouble)
          .zip(codebooks(j)(c)).map { case (a, b) => a * b }.sum
    val out = vecs.select(col("id"), col("v"),
      VectorFunctions.pqEncode(col("v"), codebooks).as("code"),
      VectorFunctions.pqAdcTable(col("v"), codebooks).as("tab")).collect()
    out.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(r.getSeq[Int](2) == refEncode(v), s"encode id=${r.getLong(0)}")
      val tab = r.getSeq[Double](3)
      // same sequential accumulation order -> bit-identical doubles
      assert(tab == refTable(v), s"table id=${r.getLong(0)}")
    }
    // interpreted eval path agrees with the codegen'd plan path
    val flat = codebooks.flatten.flatten
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      out(0).getSeq[Float](1).map(_.toDouble),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    assert(PqEncode(lit, m, k, flat).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq == out(0).getSeq[Int](2))
  }

  test("graft_pq_score: left-fold lookup sum matches the reference, bit-exact") {
    val rnd = new scala.util.Random(31)
    val m = 4; val k = 3; val sub = 5; val dim = m * sub
    val codebooks: Seq[Seq[Seq[Double]]] = Seq.fill(m, k, sub)(rnd.nextDouble() * 2 - 1)
    val vecs = (1 to 20).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1))).toDF("id", "v")
    // score every vector's own code against its own table through the
    // compiled kernel, and replay the fold in plain Scala
    val out = vecs.select(col("id"),
      VectorFunctions.pqAdcScore(
        VectorFunctions.pqEncode(col("v"), codebooks),
        VectorFunctions.pqAdcTable(col("v"), codebooks)).as("s"),
      VectorFunctions.pqEncode(col("v"), codebooks).as("code"),
      VectorFunctions.pqAdcTable(col("v"), codebooks).as("tab")).collect()
    out.foreach { r =>
      val code = r.getSeq[Int](2)
      val tab = r.getSeq[Double](3)
      val ref = code.zipWithIndex.foldLeft(0.0) { case (acc, (c, j)) =>
        acc + tab(j * k + c)
      }
      assert(r.getDouble(1) == ref, s"id=${r.getLong(0)}") // bit-exact
    }
    // interpreted eval agrees with the plan path
    val one = out(0)
    val codeLit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      one.getSeq[Int](2),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType))
    val tabLit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      one.getSeq[Double](3),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    assert(PqAdcScore(codeLit, tabLit).eval(null) == one.getDouble(1))
  }

  test("graft_minhash_bands: identical sets share all buckets, disjoint share none") {
    val docs = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("c d e", "a b c", "b c d")), // same SET, different order
      (3L, Seq("x y z", "y z w", "z w v"))) // disjoint
      .toDF("id", "sh")
    val out = docs.select(col("id"),
      VectorFunctions.minHashBands(col("sh"), 8, 2).as("b")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == out(2L)) // set semantics: order-invariant
    assert(out(1L).length == 8)
    assert(out(1L).intersect(out(3L)).isEmpty) // disjoint sets: no shared bucket
    // deterministic across evaluations
    val again = docs.filter(col("id") === 1).select(
      VectorFunctions.minHashBands(col("sh"), 8, 2)).collect()(0).getSeq[Long](0)
    assert(again == out(1L))
    // an EMPTY set has no minhash: null out (-> excluded from banding),
    // never a shared sentinel bucket that would pair all empty docs
    val empty = Seq((9L, Seq.empty[String])).toDF("id", "sh")
      .select(VectorFunctions.minHashBands(col("sh"), 8, 2)).collect()(0)
    assert(empty.isNullAt(0))
  }

  test("graft_winnow: interpreted eval matches the codegen'd plan output") {
    import org.apache.spark.unsafe.types.UTF8String
    val texts = Seq("abcdefghij klmnop", "exactly8!", "tiny", "")
    // interpreted path: Expression.eval directly
    val interp = texts.map { t =>
      val e = WinnowFingerprints(
        org.apache.spark.sql.catalyst.expressions.Literal(
          UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType), 8, 4)
      e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSet
    }
    // codegen path: through a DataFrame projection
    val plan = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
      .select(col("i"), VectorFunctions.winnowFingerprints(col("t"), 8, 4).as("f"))
      .collect().sortBy(_.getInt(0))
      .map(_.getSeq[Long](1).toSet)
    assert(interp == plan.toSeq)
    // (hash-chain equivalence with the portable builtin formulation is
    // asserted by the HOF-parity test in PipelineSpec)
  }

  test("expressions survive codegen (inside a wider projection)") {
    // a realistic plan: filter + groupBy over the expression output
    val df = (1 to 1000).map(i => (i.toLong, Seq.fill(16)(i.toFloat)))
      .toDF("id", "v")
    val s = df.select(VectorFunctions.dotProduct(col("v"), col("v")).as("d"))
      .filter(col("d") > 0).agg(sum(col("d"))).collect()(0).getDouble(0)
    val expected = (1 to 1000).map(i => 16.0 * i * i).sum
    assert(math.abs(s - expected) / expected < 1e-12)
  }
}
