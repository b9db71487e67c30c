package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed codecs over `Array[Byte]` values, mirroring the reference's
  * client-side codec surface (`hbase/util/Bytes.java:249-599`): the engine
  * stores untyped bytes; typed interpretation is a client concern.
  *
  * Encodings are big-endian so that the engine's unsigned-lexicographic
  * binary ordering is order-preserving for NON-NEGATIVE integers — the
  * same caveat the reference documents for `Bytes.toBytes(long)`
  * (SURVEY.md §7.5 risk 1). Row keys built from signed-negative numbers
  * must be avoided or pre-shifted by the caller.
  *
  * Two layers:
  *   - JVM-side (driver/test) encode/decode for building keys & fixtures.
  *   - Column-side decode built from codegen'd Spark builtins where
  *     possible (`conv(hex(..))` for integers, `cast` for UTF-8 strings)
  *     so that decode at the output boundary stays in whole-stage codegen.
  */
object Bytes {

  // ---- JVM-side encoders (reference: Bytes.toBytes overloads :414,:560,:599)

  def toBytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  def toBytes(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var x = v; var i = 7
    while (i >= 0) { b(i) = (x & 0xff).toByte; x >>>= 8; i -= 1 }
    b
  }

  def toBytes(v: Int): Array[Byte] = {
    val b = new Array[Byte](4)
    var x = v; var i = 3
    while (i >= 0) { b(i) = (x & 0xff).toByte; x >>>= 8; i -= 1 }
    b
  }

  def toBytes(v: Boolean): Array[Byte] = Array(if (v) 1.toByte else 0.toByte)

  /** IEEE-754 bits, big-endian (reference `Bytes.java:599`). NOT
    * order-preserving for negatives — same as the reference. */
  def toBytes(v: Double): Array[Byte] = toBytes(java.lang.Double.doubleToLongBits(v))

  def toBytes(v: Float): Array[Byte] = toBytes(java.lang.Float.floatToIntBits(v))

  // ---- ORDER-PRESERVING signed encodings (the HBase OrderedBytes /
  // Phoenix sign-flip trick). The plain big-endian encodings above are
  // order-preserving for NON-NEGATIVE integrals only, and never for
  // IEEE-754 doubles (the sign bit inverts byte order) — the caveat the
  // reference documents for `Bytes.toBytes` (SURVEY §7.5 risk 1). These
  // opt-in variants close it: unsigned-lex order of the encoding equals
  // numeric order over the FULL signed / IEEE range, so ordered-encoded
  // row keys and indexed values serve range predicates exactly.
  //  - integrals: flip the sign bit (two's-complement order + 2^63);
  //  - doubles: flip the sign bit of non-negatives, ALL bits of
  //    negatives (more-negative doubles have larger bit patterns, so the
  //    inversion restores numeric order). NaN canonicalizes above +Inf;
  //    -0.0 encodes just below +0.0 (numerically equal values stay
  //    adjacent).

  def toBytesOrdered(v: Long): Array[Byte] = toBytes(v ^ Long.MinValue)

  def toBytesOrdered(v: Int): Array[Byte] = toBytes(v ^ Int.MinValue)

  def toBytesOrdered(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    toBytes(if (bits >= 0) bits ^ Long.MinValue else ~bits)
  }

  def toLongOrdered(b: Array[Byte]): Long = toLong(b) ^ Long.MinValue

  def toIntOrdered(b: Array[Byte]): Int = toInt(b) ^ Int.MinValue

  def toDoubleOrdered(b: Array[Byte]): Double = {
    val ord = toLong(b)
    java.lang.Double.longBitsToDouble(
      if (ord < 0) ord ^ Long.MinValue else ~ord)
  }

  // ---- JVM-side decoders (reference: Bytes.toLong:452, toString:249, ...)

  def toString(b: Array[Byte]): String =
    new String(b, java.nio.charset.StandardCharsets.UTF_8)

  def toLong(b: Array[Byte]): Long = {
    require(b.length == 8, s"toLong needs 8 bytes, got ${b.length}")
    var v = 0L; var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  def toInt(b: Array[Byte]): Int = {
    require(b.length == 4, s"toInt needs 4 bytes, got ${b.length}")
    var v = 0; var i = 0
    while (i < 4) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  def toBoolean(b: Array[Byte]): Boolean = b.nonEmpty && b(0) != 0

  def toDouble(b: Array[Byte]): Double = java.lang.Double.longBitsToDouble(toLong(b))

  def toFloat(b: Array[Byte]): Float = java.lang.Float.intBitsToFloat(toInt(b))

  /** Unsigned-lexicographic compare — reference `Bytes.BYTES_COMPARATOR:118`.
    * Must agree with Spark's BinaryType ordering (verified in BytesSpec). */
  def compareTo(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** Smallest byte string strictly greater than `v` (v ++ 0x00) — the
    * minimal exclusive upper bound for turning an inclusive key into a
    * half-open range. */
  def successor(v: Array[Byte]): Array[Byte] = v :+ 0.toByte

  /** Smallest byte string strictly greater than every string with this
    * prefix — used to turn PrefixFilter into a sargable range
    * `[prefix, succ(prefix))` for partition/row-group pruning. Returns
    * None when the prefix is all 0xff (range is then unbounded above). */
  def prefixSuccessor(prefix: Array[Byte]): Option[Array[Byte]] = {
    val out = prefix.clone()
    var i = out.length - 1
    while (i >= 0) {
      if (out(i) != 0xff.toByte) {
        out(i) = (out(i) + 1).toByte
        return Some(out.slice(0, i + 1))
      }
      i -= 1
    }
    None
  }

  // ---- Column-side decoders (codegen'd builtins; no UDFs)

  /** binary (UTF-8) -> string */
  def asString(c: Column): Column = c.cast("string")

  /** 8-byte big-endian -> SIGNED long, via the native codegen'd expression
    * (graft.functions.BitsToLong). The former `conv(hex(c),16,10)` builtin
    * chain was unsigned-only: negative stored values decoded to null. */
  def asLong(c: Column): Column =
    graft.functions.VectorFunctions.bitsToLong(c)

  /** 4-byte big-endian -> SIGNED int (graft.functions.BitsToInt). */
  def asInt(c: Column): Column =
    graft.functions.VectorFunctions.bitsToInt(c)

  /** 8-byte IEEE-754 bits -> double — the native codegen'd expression
    * (graft.functions.BitsToDouble). */
  def asDouble(c: Column): Column =
    graft.functions.VectorFunctions.bitsToDouble(c)

  /** single byte -> boolean (nonzero = true, empty = false). */
  def asBoolean(c: Column): Column =
    when(c.isNull, lit(null).cast("boolean"))
      .otherwise(length(c) > 0 && substring(hex(c), 1, 2) =!= "00")

  // Column-side inverses of the ORDER-PRESERVING encodings above — all
  // codegen'd builtins over the existing native bit expressions.

  /** 8-byte ordered encoding -> signed long (inverse of toBytesOrdered). */
  def asLongOrdered(c: Column): Column =
    asLong(c).bitwiseXOR(lit(Long.MinValue))

  /** 4-byte ordered encoding -> signed int. */
  def asIntOrdered(c: Column): Column =
    asInt(c).bitwiseXOR(lit(Int.MinValue))

  /** 8-byte ordered encoding -> double. */
  def asDoubleOrdered(c: Column): Column = {
    val ord = asLong(c)
    val bits = when(ord < 0, ord.bitwiseXOR(lit(Long.MinValue)))
      .otherwise(bitwise_not(ord))
    graft.functions.VectorFunctions.bitsToDouble(
      unhex(lpad(hex(bits), 16, "0")))
  }
}
