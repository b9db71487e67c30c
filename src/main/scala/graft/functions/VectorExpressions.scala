package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the engine's two non-codegen hot
  * spots (SURVEY §7.4 tier (b) — "a native Catalyst Expression beats a
  * Scala UDF"): IEEE-754 double<->bits reinterpretation (no Spark
  * builtin) and the dense dot product over float/double arrays (the
  * `zip_with`+`aggregate` formulation is an interpreted higher-order
  * function — unacceptable as the inner loop of a 100 TB similarity
  * scan). Each implements both `nullSafeEval` and `doGenCode`, so they
  * run inside WholeStageCodegen like any builtin. */

/** double -> 8-byte big-endian IEEE-754 bits (reference `Bytes.java:599`). */
case class DoubleToBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    graft.core.Bytes.toBytes(input.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorExprUtil.doubleToBits($c)")
  override protected def withNewChildInternal(newChild: Expression): DoubleToBits =
    copy(child = newChild)
}

/** 8-byte big-endian IEEE-754 bits -> double (reference `Bytes.toDouble`). */
case class BitsToDouble(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    graft.core.Bytes.toDouble(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorExprUtil.bitsToDouble($c)")
  override protected def withNewChildInternal(newChild: Expression): BitsToDouble =
    copy(child = newChild)
}

/** 8-byte big-endian two's-complement bits -> SIGNED long (reference
  * `Bytes.toLong:452`). The builtin `conv(hex(c),16,10).cast("long")`
  * route is unsigned-only: a negative stored value exceeds Long.MaxValue
  * as an unsigned decimal string and casts to null, which downstream
  * `coalesce(_, 0)` silently turns into 0 — a counter that goes negative
  * would reset toward zero on its next increment. Inputs shorter than 8
  * bytes decode as unsigned (missing high bytes = 0), matching the conv
  * formulation this replaces. */
case class BitsToLong(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    VectorExprUtil.bitsToLong(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorExprUtil.bitsToLong($c)")
  override protected def withNewChildInternal(newChild: Expression): BitsToLong =
    copy(child = newChild)
}

/** 4-byte big-endian two's-complement bits -> SIGNED int (`Bytes.toInt`). */
case class BitsToInt(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    VectorExprUtil.bitsToInt(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorExprUtil.bitsToInt($c)")
  override protected def withNewChildInternal(newChild: Expression): BitsToInt =
    copy(child = newChild)
}

/** Dense dot product over two numeric arrays (float or double elements),
  * accumulated in double, sequential order (bit-compatible with the
  * `zip_with`+`aggregate` formulation it replaces — the DuckDB-oracle
  * comparisons depend on that). Nulls: null input array -> null; null
  * elements treated as 0. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0
        else if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (b.isNullAt(i)) 0.0
        else if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $a.isNullAt($i) ? 0.0 : (double) $a.$lGet($i);
         |  double y = $b.isNullAt($i) ? 0.0 : (double) $b.$rGet($i);
         |  $acc += x * y;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH band bucket: bit r of the result is
  * sign(dot(v, h_{band*width+r})) where hyperplane component i of plane j
  * is +1/-1 from bit 0 of xxhash64(j, i) — EXACTLY the bits the previous
  * `transform`+`aggregate` HOF formulation derived via Spark's xxhash64
  * (seed 42, int-typed inputs), reproduced here through the same
  * `XXH64.hashInt` so buckets are bit-compatible. The HOF version ran
  * width interpreted vector passes per row with no common-subexpression
  * elimination — unacceptable as the signature stage of a 100 TB ANN
  * scan; this is one compiled pass accumulating all `width` sums.
  * Accumulation order per plane matches the HOF's sequential aggregate,
  * so the sign of every sum is identical. */
case class HyperplaneBand(child: Expression, band: Int, width: Int)
    extends UnaryExpression {
  require(width > 0 && width <= 64, s"band width $width must be in [1,64]")
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_hyperplane_band needs array<float|double>, got ${other.simpleString}")
    }

  // Per-plane inner hash seeds: xxhash64(j, i) folds left over the args,
  // so hash(j, i) = XXH64.hashInt(i, XXH64.hashInt(j, DEFAULT_SEED)).
  private lazy val seeds: Array[Long] =
    Array.tabulate(width) { r =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(band * width + r, 42L)
    }
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    VectorExprUtil.hyperplaneBand(input.asInstanceOf[ArrayData], seeds, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("hplaneSeeds", seeds, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorExprUtil.hyperplaneBand($c, $seedsRef, $isFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBand =
    copy(child = newChild)
}

/** ALL plane-LSH band buckets in ONE compiled pass over an EXPLICIT
  * (caller-supplied, e.g. md5-derived) hyperplane matrix: element b of
  * the result is band b's bucket, whose bit r is
  * sign(dot(vec, plane_{b*width+r})). Each plane dot accumulates
  * SEQUENTIALLY in double — bit-identical to the per-plane
  * `DotProduct`-composition formulation ([[graft.pipeline.Similarity]]
  * `planeBand`, parity spec-asserted) and therefore to a SQL oracle's
  * sequential `list_dot_product`. Replaces `bands*width` separate
  * literal-plane dot expressions (a plan with thousands of inlined
  * array literals, measured 4 s at sf0.1) with one projection that
  * hoists the vector once and streams the flat matrix. `flat` is the
  * row-major concatenation of the `bands*width` planes. */
case class PlaneBands(child: Expression, bands: Int, width: Int,
    flat: Seq[Double]) extends UnaryExpression {
  require(bands > 0 && width > 0 && width <= 64,
    s"bands=$bands width=$width must be positive, width <= 64")
  require(flat.nonEmpty && flat.length % (bands * width) == 0,
    s"flat plane matrix (${flat.length}) must hold bands*width equal rows")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_plane_bands needs array<float|double>, got ${other.simpleString}")
    }

  private lazy val flatArr: Array[Double] = flat.toArray
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    VectorExprUtil.planeBands(input.asInstanceOf[ArrayData], flatArr,
      bands, width, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planeMatrix", flatArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorExprUtil.planeBands($c, $ref, $bands, $width, $isFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): PlaneBands =
    copy(child = newChild)
}

/** Product-quantization ENCODE in one compiled pass: split the vector
  * into `m` subspaces of `flat.length / (m*k)` dims each and emit, per
  * subspace, the id of the L2-nearest of its `k` codebook centroids
  * (argmin ||v_j - c||^2 = argmax (v_j . c - |c|^2/2); ties break to the
  * LOWEST cid — deterministic). `flat` is the row-major concatenation of
  * the m*k centroids, subspace-major. The 100 TB point of PQ: the stored
  * code is m small ints per vector instead of dim floats, so the ANN
  * scan becomes memory-bandwidth-bound on codes (see PqAdcTable). */
case class PqEncode(child: Expression, m: Int, k: Int, flat: Seq[Double])
    extends UnaryExpression {
  require(m > 0 && k > 0, s"m=$m k=$k must be positive")
  require(flat.nonEmpty && flat.length % (m * k) == 0,
    s"flat codebook (${flat.length}) must hold m*k equal centroids")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pq_encode needs array<float|double>, got ${other.simpleString}")
    }

  private lazy val flatArr: Array[Double] = flat.toArray
  // 0.5*|c|^2 per centroid, folded into the argmax score
  private lazy val halfNormSq: Array[Double] = {
    val sub = flat.length / (m * k)
    Array.tabulate(m * k) { p =>
      var s = 0.0; var t = 0
      while (t < sub) { val x = flatArr(p * sub + t); s += x * x; t += 1 }
      s / 2
    }
  }
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    VectorExprUtil.pqEncode(input.asInstanceOf[ArrayData], flatArr,
      halfNormSq, m, k, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fRef = ctx.addReferenceObj("pqCodebook", flatArr, "double[]")
    val nRef = ctx.addReferenceObj("pqHalfNorms", halfNormSq, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorExprUtil.pqEncode($c, $fRef, $nRef, $m, $k, $isFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** The ADC (asymmetric distance computation) lookup table for a QUERY
  * vector, one compiled pass: element j*k + c = dot(q_j, centroid_{j,c})
  * over the same subspace-major flat codebook as [[PqEncode]]. Scoring a
  * PQ-coded corpus vector is then m table lookups:
  * `sum_j table[j*k + code_j] ~ dot(q, x)` — the query pays m*k dots
  * ONCE, every corpus vector costs m array reads. */
case class PqAdcTable(child: Expression, m: Int, k: Int, flat: Seq[Double])
    extends UnaryExpression {
  require(m > 0 && k > 0, s"m=$m k=$k must be positive")
  require(flat.nonEmpty && flat.length % (m * k) == 0,
    s"flat codebook (${flat.length}) must hold m*k equal centroids")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pq_adc needs array<float|double>, got ${other.simpleString}")
    }

  private lazy val flatArr: Array[Double] = flat.toArray
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    VectorExprUtil.pqAdcTable(input.asInstanceOf[ArrayData], flatArr, m, k, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fRef = ctx.addReferenceObj("pqCodebook", flatArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorExprUtil.pqAdcTable($c, $fRef, $m, $k, $isFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqAdcTable =
    copy(child = newChild)
}

/** ADC SCORE in one compiled pass: `sum_j table[j*k + codes[j]]` as a
  * left fold in j order — bit-identical to a `zip_with`+`aggregate`
  * chain over the same lookups and to a SQL oracle's parenthesized
  * left-to-right sum. `codes` is a [[PqEncode]] output (length m),
  * `table` a [[PqAdcTable]] output (length m*k); k derives at runtime
  * as `table.length / codes.length`. This runs once per
  * corpus-vector × query pair — THE inner loop of a PQ scan — which is
  * exactly where interpreted HOF lambdas are unaffordable (the
  * DotProduct lesson: one compiled kernel, no per-element dispatch). */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pq_score needs (array<int> codes, array<double> table), " +
            s"got ${l.simpleString} / ${r.simpleString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    VectorExprUtil.pqAdcScore(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) =>
      s"graft.functions.VectorExprUtil.pqAdcScore($c, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

/** MinHash LSH band buckets in ONE narrow compiled pass: for a shingle
  * array, compute `bands*rows` minhashes (one xxhash64 per shingle +
  * affine 2-universal permutations h_i = a_i*h + b_i — the standard
  * sketching trick; MinHash only needs min-wise-independent-ish
  * permutations, and every emitted pair is exact-verified downstream),
  * then fold each band's `rows` minhashes into its bucket value. Replaces
  * an explode + 128-column min-aggregation: same signature quality, zero
  * shuffle, zero row explosion — the signature stage becomes a narrow
  * projection that scales embarrassingly at 100 TB.
  *
  * Returning the BUCKETS (not the signature) keeps the output
  * single-use: deriving 32 band columns from one array-typed signature
  * column would re-inline the whole signature expression per band after
  * projection collapse (the measured r01 trap). */
case class MinHashBands(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {
  require(bands > 0 && rows > 0, s"bands=$bands rows=$rows must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_minhash_bands needs array<string>, got ${other.simpleString}")
    }

  // odd multipliers + offsets derived deterministically per permutation
  private lazy val muls: Array[Long] = Array.tabulate(bands * rows)(i =>
    org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, 0x9E3779B97F4A7C15L) | 1L)
  private lazy val adds: Array[Long] = Array.tabulate(bands * rows)(i =>
    org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, 0x165667B19E3779F9L))

  override def nullable: Boolean = true // empty shingle set -> null (no bands)
  override def nullSafeEval(input: Any): Any =
    VectorExprUtil.minHashBands(input.asInstanceOf[ArrayData], muls, adds, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mulsRef = ctx.addReferenceObj("mhMuls", muls, "long[]")
    val addsRef = ctx.addReferenceObj("mhAdds", adds, "long[]")
    // not defineCodeGen: the helper returns null for an EMPTY shingle set
    // and ev.isNull must reflect that (a non-null-flagged null ArrayData
    // would NPE in the consumer)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.VectorExprUtil.minHashBands(
         |  $c, $mulsRef, $addsRef, $rows);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** Winnowing (MOSS) fingerprint set in ONE compiled pass: char `k`-grams
  * of the input string (the caller normalizes whitespace), each hashed to
  * the first 7 md5 digest bytes as a positive long — bit-identical to the
  * builtin chain `BitsToLong(unhex(substring(md5(gram), 1, 14)))` — then
  * a sliding `window` keeps each window's minimum, distinct. The
  * higher-order formulation (transform + slice + array_min per position)
  * runs interpreted with an array allocation per window position; this is
  * the hot-loop shape for fingerprinting a 100 TB corpus. */
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
    extends UnaryExpression {
  require(k > 0 && window > 0, s"k=$k window=$window must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_winnow needs a string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    VectorExprUtil.winnowFingerprints(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorExprUtil.winnowFingerprints($c, $k, $window)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** JVM helpers referenced from generated code. */
object VectorExprUtil {
  def doubleToBits(d: Double): Array[Byte] =
    graft.core.Bytes.toBytes(d)
  def bitsToDouble(b: Array[Byte]): Double =
    graft.core.Bytes.toDouble(b)
  def bitsToLong(b: Array[Byte]): Long = {
    val n = math.min(b.length, 8)
    var v = 0L; var i = 0
    while (i < n) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }
  def bitsToInt(b: Array[Byte]): Int = {
    val n = math.min(b.length, 4)
    var v = 0; var i = 0
    while (i < n) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  def minHashBands(arr: ArrayData, muls: Array[Long], adds: Array[Long],
      rows: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = muls.length
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val m = arr.numElements()
    var seen = false
    var j = 0
    while (j < m) {
      if (!arr.isNullAt(j)) {
        seen = true
        val s = arr.getUTF8String(j)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var i = 0
        while (i < n) {
          val v = muls(i) * h + adds(i)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    // An EMPTY set has no minhash: emitting the (identical) sentinel
    // buckets would band-join every empty doc with every other — the
    // exact hot-bucket quadratic blowup banding exists to prevent. Null
    // here = no bands = excluded from candidates, matching the previous
    // explode+min-agg formulation (explode of an empty array emits no
    // rows, so such docs never reached the band join).
    if (!seen) return null
    val buckets = new Array[Long](n / rows)
    var b = 0
    while (b < buckets.length) {
      var acc = XXH64.hashInt(b, 42L)
      var r = 0
      while (r < rows) {
        acc = XXH64.hashLong(mins(b * rows + r), acc)
        r += 1
      }
      buckets(b) = acc
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buckets)
  }

  def winnowFingerprints(s: org.apache.spark.unsafe.types.UTF8String,
      k: Int, window: Int): ArrayData = {
    // char (UTF-16) grams, matching the HOF reference formulation's Java
    // regex `(?=(.{k}))` — identical on any text without surrogate pairs
    val str = s.toString
    val n = str.length - k + 1
    if (n <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = md.digest(str.substring(i, i + k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 7 digest bytes big-endian = first 14 md5 hex chars decoded
      var v = 0L; var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      hs(i) = v
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val nWin = n - window + 1
    val lastStart = if (nWin <= 0) 0 else nWin - 1
    var w0 = 0
    while (w0 <= lastStart) {
      var m = Long.MaxValue
      var t = w0
      val end = math.min(w0 + window, n)
      while (t < end) { if (hs(t) < m) m = hs(t); t += 1 }
      out.add(m): Unit
      w0 += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator(); var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  def planeBands(arr: ArrayData, flat: Array[Double], bands: Int, width: Int,
      isFloat: Boolean): ArrayData = {
    val planeDim = flat.length / (bands * width)
    // DotProduct semantics exactly: iterate min(len, planeDim) ascending,
    // null elements contribute 0.0, accumulate in double
    val dim = math.min(arr.numElements(), planeDim)
    val xs = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      xs(i) = if (arr.isNullAt(i)) 0.0
        else if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val out = new Array[Long](bands)
    var p = 0 // plane row index = b*width + r
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var r = 0
      while (r < width) {
        val base = p * planeDim
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += xs(j) * flat(base + j); j += 1 }
        if (acc > 0) bucket |= (1L << r)
        r += 1; p += 1
      }
      out(b) = bucket
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** `sum_j table[j*k + codes[j]]`, left fold in j order. Null or
    * out-of-range codes contribute 0 (unreachable from [[PqEncode]]
    * output, which is dense and 0..k-1 by construction). */
  def pqAdcScore(codes: ArrayData, table: ArrayData): Double = {
    val m = codes.numElements()
    if (m == 0) return 0.0
    val k = table.numElements() / m
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (!codes.isNullAt(j)) {
        val idx = j * k + codes.getInt(j)
        if (idx >= 0 && idx < table.numElements() && !table.isNullAt(idx))
          acc += table.getDouble(idx)
      }
      j += 1
    }
    acc
  }

  /** Hoist the vector once (nulls -> 0.0, DotProduct semantics). */
  private def hoist(arr: ArrayData, upTo: Int, isFloat: Boolean): Array[Double] = {
    val dim = math.min(arr.numElements(), upTo)
    val xs = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      xs(i) = if (arr.isNullAt(i)) 0.0
        else if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    xs
  }

  /** dot(v_subspace_j, centroid p) over the subspace-major flat codebook;
    * subvectors past the vector's end contribute 0 (short-vector guard). */
  private def subDot(xs: Array[Double], flat: Array[Double], p: Int,
      j: Int, sub: Int): Double = {
    val base = p * sub
    val vOff = j * sub
    val n = math.min(sub, math.max(0, xs.length - vOff))
    var acc = 0.0
    var t = 0
    while (t < n) { acc += xs(vOff + t) * flat(base + t); t += 1 }
    acc
  }

  def pqEncode(arr: ArrayData, flat: Array[Double], halfNormSq: Array[Double],
      m: Int, k: Int, isFloat: Boolean): ArrayData = {
    val sub = flat.length / (m * k)
    val xs = hoist(arr, m * sub, isFloat)
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < k) {
        val p = j * k + c
        val score = subDot(xs, flat, p, j, sub) - halfNormSq(p)
        if (score > bestScore) { bestScore = score; best = c } // ties: lowest cid
        c += 1
      }
      out(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def pqAdcTable(arr: ArrayData, flat: Array[Double], m: Int, k: Int,
      isFloat: Boolean): ArrayData = {
    val sub = flat.length / (m * k)
    val xs = hoist(arr, m * sub, isFloat)
    val out = new Array[Double](m * k)
    var p = 0
    while (p < m * k) {
      out(p) = subDot(xs, flat, p, p / k, sub)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def hyperplaneBand(arr: ArrayData, seeds: Array[Long], isFloat: Boolean): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val w = seeds.length
    val sums = new Array[Double](w)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // a null element null-propagates every plane sum in the HOF
      // formulation (acc + null = null), collapsing the bucket to 0 —
      // keep that exact behavior for bit-compatibility
      if (arr.isNullAt(i)) return 0L
      val x =
        if (isFloat) arr.getFloat(i).toDouble
        else arr.getDouble(i)
      var r = 0
      while (r < w) {
        if ((XXH64.hashInt(i, seeds(r)) & 1L) == 1L) sums(r) += x
        else sums(r) -= x
        r += 1
      }
      i += 1
    }
    var bucket = 0L
    var r = 0
    while (r < w) {
      if (sums(r) > 0) bucket |= (1L << r)
      r += 1
    }
    bucket
  }
}

/** Column-level entry points, resolved through the function registry
  * (the expressions are injected by [[GraftExtensions]], configured on
  * every GraftSession via `spark.sql.extensions` — the public extension
  * mechanism, no private[sql] access). */
object VectorFunctions {
  import org.apache.spark.sql.functions.call_function
  def doubleToBits(c: Column): Column = call_function("graft_double_to_bits", c)
  def bitsToDouble(c: Column): Column = call_function("graft_bits_to_double", c)
  def bitsToLong(c: Column): Column = call_function("graft_bits_to_long", c)
  def bitsToInt(c: Column): Column = call_function("graft_bits_to_int", c)
  def dotProduct(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def hyperplaneBand(vec: Column, band: Int, width: Int): Column =
    call_function("graft_hyperplane_band", vec,
      org.apache.spark.sql.functions.lit(band),
      org.apache.spark.sql.functions.lit(width))
  def minHashBands(shingles: Column, bands: Int, rows: Int): Column =
    call_function("graft_minhash_bands", shingles,
      org.apache.spark.sql.functions.lit(bands),
      org.apache.spark.sql.functions.lit(rows))
  def planeBands(vec: Column, planes: Seq[Seq[Double]], bands: Int): Column = {
    require(bands > 0 && planes.nonEmpty && planes.length % bands == 0,
      s"planes (${planes.length}) must split evenly into $bands bands")
    require(planes.map(_.length).distinct.size == 1, "ragged plane matrix")
    call_function("graft_plane_bands", vec,
      org.apache.spark.sql.functions.lit(bands),
      org.apache.spark.sql.functions.lit(planes.length / bands),
      org.apache.spark.sql.functions.typedLit(planes.flatten))
  }
  def winnowFingerprints(text: Column, k: Int, window: Int): Column =
    call_function("graft_winnow", text,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(window))
  private def flatCodebook(codebooks: Seq[Seq[Seq[Double]]]): (Int, Int, Seq[Double]) = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebook")
    val k = codebooks.head.length
    require(codebooks.forall(_.length == k), "ragged codebook (k differs)")
    require(codebooks.flatten.map(_.length).distinct.size == 1,
      "ragged codebook (subspace dims differ)")
    (codebooks.length, k, codebooks.flatten.flatten)
  }
  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val (m, k, flat) = flatCodebook(codebooks)
    call_function("graft_pq_encode", vec,
      org.apache.spark.sql.functions.lit(m),
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.typedLit(flat))
  }
  def pqAdcTable(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val (m, k, flat) = flatCodebook(codebooks)
    call_function("graft_pq_adc", vec,
      org.apache.spark.sql.functions.lit(m),
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.typedLit(flat))
  }
  def pqAdcScore(codes: Column, table: Column): Column =
    call_function("graft_pq_score", codes, table)
}
