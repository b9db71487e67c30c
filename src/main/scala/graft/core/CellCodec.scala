package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Encodes relational DataFrames into the long cell format and back
  * (FIXTURES.md F6): row key = order-preserving binary of the key columns,
  * one cell per non-null column value, qualifier = column name, value =
  * big-endian typed bytes (the reference's `Bytes.toBytes` conventions).
  *
  * Everything here is built from codegen'd builtins (`hex`/`unhex`/`lpad`/
  * `conv`/`cast`) except IEEE-754 double bit-reinterpretation, which has no
  * Spark builtin and uses a deterministic scalar UDF.
  */
object CellCodec {

  // Native codegen'd expressions (graft.functions) — the double<->bits
  // reinterpretation has no Spark builtin, and a scalar UDF here would be
  // the one non-codegen operator at the decode boundary.
  private def doubleToBits(c: Column): Column =
    graft.functions.VectorFunctions.doubleToBits(c)
  private def bitsToDouble(c: Column): Column =
    graft.functions.VectorFunctions.bitsToDouble(c)

  /** Non-negative long -> 8-byte big-endian binary (order-preserving),
    * via builtins: hex -> zero-pad to 16 nibbles -> unhex. */
  def longBytes(c: Column): Column = unhex(lpad(hex(c.cast("long")), 16, "0"))

  /** Int -> 4-byte big-endian two's complement (order-preserving for
    * non-negatives — `Bytes.toBytes(int)` parity). The low-32-bit mask
    * matters: a NEGATIVE int cast to long sign-extends to 16 hex
    * nibbles, and `lpad` keeps the LEFTMOST 8 (`0xFFFFFFFF` for every
    * negative) — masking first makes the 8 nibbles the int's actual
    * two's complement, so pre-1970 dates and negative int cells encode
    * losslessly and byte-match the JVM-side `Bytes.toBytes(int)`. */
  def intBytes(c: Column): Column =
    unhex(lpad(hex(c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))), 8, "0"))

  // ORDER-PRESERVING signed variants (Bytes.toBytesOrdered parity — the
  // OrderedBytes/Phoenix sign-flip trick): unsigned-lex order of the
  // encoding == numeric order over the FULL signed / IEEE range. Opt-in
  // via the `ordered` column sets of encode/decode/rowKey (wide-view
  // types olong/oint/odouble). All codegen'd builtins.

  /** Signed long -> 8-byte ordered binary (hex renders negatives as the
    * full 16-nibble two's complement, so the sign-flipped value encodes
    * exactly). */
  def longBytesOrdered(c: Column): Column =
    unhex(lpad(hex(c.cast("long").bitwiseXOR(lit(Long.MinValue))), 16, "0"))

  /** Signed int -> 4-byte ordered binary: v + 2^31 in long space is the
    * sign-flip within [0, 2^32), so hex stays within 8 nibbles. */
  def intBytesOrdered(c: Column): Column =
    unhex(lpad(hex(c.cast("long") + lit(2147483648L)), 8, "0"))

  /** Double -> 8-byte ordered binary (sign bit flipped for non-negatives,
    * all bits for negatives — Bytes.toBytesOrdered(Double) parity). */
  def doubleBytesOrdered(c: Column): Column = {
    val bits = graft.functions.VectorFunctions.bitsToLong(
      doubleToBits(c.cast("double")))
    val ord = when(bits >= 0, bits.bitwiseXOR(lit(Long.MinValue)))
      .otherwise(bitwise_not(bits))
    unhex(lpad(hex(ord), 16, "0"))
  }

  /** Typed column -> binary cell value. `ordered` selects the
    * order-preserving signed encoding (long/int/double only). */
  def encodeValue(c: Column, dt: DataType, ordered: Boolean): Column =
    if (!ordered) encodeValue(c, dt)
    else dt match {
      case LongType => longBytesOrdered(c)
      case IntegerType | ShortType => intBytesOrdered(c)
      case DoubleType | FloatType => doubleBytesOrdered(c.cast("double"))
      case other => throw new IllegalArgumentException(
        s"no ordered encoding for cell type $other (long/int/double)")
    }

  /** binary ordered cell value -> typed column. */
  def decodeValue(c: Column, dt: DataType, ordered: Boolean): Column =
    if (!ordered) decodeValue(c, dt)
    else dt match {
      case LongType => Bytes.asLongOrdered(c)
      case IntegerType | ShortType => Bytes.asIntOrdered(c).cast(dt)
      case DoubleType | FloatType => Bytes.asDoubleOrdered(c).cast(dt)
      case other => throw new IllegalArgumentException(
        s"no ordered encoding for cell type $other (long/int/double)")
    }

  /** Typed column -> binary cell value. */
  def encodeValue(c: Column, dt: DataType): Column = dt match {
    case LongType => longBytes(c)
    case IntegerType | ShortType => intBytes(c)
    case StringType => c.cast(BinaryType) // UTF-8
    case DoubleType | FloatType => doubleToBits(c.cast("double"))
    case TimestampType => longBytes(unix_millis(c))
    // Parquet isAdjustedToUTC=false timestamps (Spark 4 reads them as NTZ).
    // Session tz is pinned to UTC, so the cast is instant-preserving; micros
    // keeps full precision.
    case TimestampNTZType => longBytes(unix_micros(c.cast(TimestampType)))
    case DateType => intBytes(datediff(c, lit("1970-01-01").cast(DateType)))
    // no boolean<->binary CAST exists in Spark — encode explicitly as the
    // single byte Bytes.toBytes(Boolean) writes (null stays null = no cell)
    case BooleanType =>
      when(c.isNull, lit(null).cast(BinaryType))
        .when(c.cast(BooleanType), lit(Array(1.toByte)))
        .otherwise(lit(Array(0.toByte)))
    case BinaryType => c
    case other => throw new IllegalArgumentException(s"unsupported cell type: $other")
  }

  /** binary cell value -> typed column. */
  def decodeValue(c: Column, dt: DataType): Column = dt match {
    case LongType => Bytes.asLong(c)
    case IntegerType | ShortType => Bytes.asInt(c).cast(dt)
    case StringType => c.cast(StringType)
    case DoubleType | FloatType => bitsToDouble(c).cast(dt)
    case TimestampType => timestamp_millis(Bytes.asLong(c))
    case TimestampNTZType => timestamp_micros(Bytes.asLong(c)).cast(TimestampNTZType)
    case DateType => date_add(lit("1970-01-01").cast(DateType), Bytes.asInt(c))
    case BooleanType => Bytes.asBoolean(c)
    case BinaryType => c
    case other => throw new IllegalArgumentException(s"unsupported cell type: $other")
  }

  /** Order-preserving composite row key from key columns: fixed-width
    * big-endian for integral types, raw UTF-8 for strings (strings must be
    * the last key part, or prefix-free, for ordering to be exact —
    * same constraint as any byte-concatenated HBase composite key). */
  def rowKey(df: DataFrame, keyCols: Seq[String],
      ordered: Set[String] = Set.empty): Column = {
    val parts = keyCols.map { k =>
      df.schema(k).dataType match {
        case LongType if ordered(k) => longBytesOrdered(col(k))
        case IntegerType if ordered(k) => intBytesOrdered(col(k))
        case LongType => longBytes(col(k))
        case IntegerType | ShortType => intBytes(col(k))
        case StringType => col(k).cast(BinaryType)
        case TimestampType => longBytes(unix_millis(col(k)))
        case TimestampNTZType => longBytes(unix_micros(col(k).cast(TimestampType)))
        case BinaryType => col(k)
        case other => throw new IllegalArgumentException(s"unsupported key type: $other")
      }
    }
    if (parts.size == 1) parts.head else concat(parts: _*)
  }

  /** JVM-side row-key builder for point lookups (must byte-match rowKey). */
  def rowKeyOf(parts: Any*): Array[Byte] =
    parts.flatMap {
      case l: Long => Bytes.toBytes(l)
      case i: Int => Bytes.toBytes(i)
      case s: String => Bytes.toBytes(s)
      case b: Array[Byte] => b
      case x => throw new IllegalArgumentException(s"unsupported key part: $x")
    }.toArray

  /** Relational DataFrame -> cells (one family). `tsCol` defaults to a
    * constant batch timestamp (deterministic — SURVEY.md §7.5 risk 3);
    * pass e.g. `unix_millis(col("ts"))` to use event time. Null column
    * values produce no cell (HBase has no null cells; absence == null). */
  def encode(df: DataFrame, family: String, keyCols: Seq[String],
      batchTs: Long = 1L, tsCol: Option[Column] = None,
      seq: Long = 0L, seqCol: Option[Column] = None,
      ordered: Set[String] = Set.empty): DataFrame = {
    val ts = tsCol.getOrElse(lit(batchTs))
    val sq = seqCol.getOrElse(lit(seq))
    val entries = df.schema.fields.map { f =>
      struct(
        lit(f.name).cast(BinaryType).as("qualifier"),
        encodeValue(col(f.name), f.dataType, ordered(f.name)).as("value"))
    }
    df.select(
        rowKey(df, keyCols, ordered).as("row"),
        ts.cast(LongType).as("ts"),
        sq.cast(LongType).as("seq"),
        filter(array(entries: _*), e => e.getField("value").isNotNull).as("_es"))
      .select(col("row"), explode(col("_es")).as("_e"), col("ts"), col("seq"))
      .select(
        col("row"),
        lit(family).as("family"),
        col("_e.qualifier").as("qualifier"),
        col("ts"),
        lit(CellKind.Put).as("kind"),
        col("_e.value").as("value"),
        col("seq"))
  }

  /** Resolved cells (<=1 version per column) -> relational rows with the
    * given schema. One shuffle (groupBy row). Columns absent for a row
    * decode to null. `key` optionally re-derives typed key columns from the
    * row key itself (so projections that drop the key qualifier still carry
    * identity): fixed-width numeric parts first, at most one string/binary
    * tail — the same prefix-free constraint as `rowKey`. */
  def decode(cells: DataFrame, schema: StructType,
      key: Seq[(String, DataType)] = Nil,
      family: Option[String] = None,
      ordered: Set[String] = Set.empty): DataFrame = {
    // Column identity in the decoded view is the qualifier NAME — with
    // cells from several families sharing a qualifier, the per-row map
    // would hit duplicate keys (mapKeyDedupPolicy=EXCEPTION). Scope to
    // one family when the input may span families with colliding names.
    val scoped = family.fold(cells)(f => cells.filter(col("family") === f))
    val m = map_from_entries(
      collect_list(struct(col("qualifier").cast(StringType), col("value"))))
    val keyCols = {
      var off = 1 // substring() is 1-based
      key.map { case (name, dt) =>
        dt match {
          case LongType =>
            val part = substring(col("row"), off, 8)
            val c = (if (ordered(name)) Bytes.asLongOrdered(part)
                     else Bytes.asLong(part)).as(name)
            off += 8; c
          case IntegerType =>
            val part = substring(col("row"), off, 4)
            val c = (if (ordered(name)) Bytes.asIntOrdered(part)
                     else Bytes.asInt(part)).as(name)
            off += 4; c
          case StringType =>
            substring(col("row"), off, Int.MaxValue).cast(StringType).as(name)
          case BinaryType =>
            substring(col("row"), off, Int.MaxValue).as(name)
          case other =>
            throw new IllegalArgumentException(s"unsupported key type: $other")
        }
      }
    }
    scoped
      .groupBy(col("row"))
      .agg(m.as("_m"))
      .select(keyCols ++ schema.fields.toSeq.map { f =>
        decodeValue(col("_m").getItem(f.name), f.dataType, ordered(f.name))
          .as(f.name)
      }: _*)
  }

  /** Resolved cells -> the pivoted `Result`-style row view: one row per
    * row key, one `map<binary, binary>` column PER FAMILY (qualifier ->
    * value), named after the family. The reference's `Result` exposes
    * exactly this — the per-family latest-version NavigableMap of
    * qualifier bytes to value bytes (`hbase/client/Result.java:168,213,
    * 244,273`, `getFamilyMap:273` = newest version per qualifier) — and
    * it is the right view when qualifiers are genuinely DYNAMIC data (the
    * wide-column data model's whole point: per-user event types, sparse
    * feature names), where [[decode]]'s fixed relational schema cannot
    * apply. When the input carries SEVERAL visible versions of a
    * qualifier (a multi-version scan), the NEWEST (max ts, then max seq)
    * wins — never an arbitrary or byte-order pick, and never the
    * duplicate-map-key error `map_from_entries` alone would raise. Map
    * entries are qualifier-sorted (unsigned lexicographic — the
    * NavigableMap's order), so downstream `map_entries` traversals are
    * deterministic. A row with no cells in a family gets an EMPTY map,
    * mirroring `Result.getFamilyMap` for an unrequested family. One
    * shuffle (groupBy row), same scale shape as [[decode]]. */
  /** The inverse of [[decodeToMaps]] — the WRITE path for dynamic
    * qualifiers: one row per row key, one `map<binary, binary>` column
    * per family (named after it), becomes Put cells. This is how
    * map-shaped data (per-user event types, sparse feature names — no
    * fixed schema exists) enters the table without forcing a relational
    * detour through [[encode]]'s column-per-qualifier contract. A null
    * or empty family map produces no cells (absence == null, the same
    * rule as [[encode]]); all builtins (`map_entries` + `explode`), no
    * UDF. Round-trip law, asserted in `ClientSemanticsSpec`:
    * `decodeToMaps(encodeFromMaps(df), families)` reproduces `df` with
    * null maps normalized to empty. */
  def encodeFromMaps(df: DataFrame, families: Seq[String],
      rowCol: String = "row", batchTs: Long = 1L,
      tsCol: Option[Column] = None, seq: Long = 0L): DataFrame = {
    require(families.nonEmpty, "at least one family")
    val ts = tsCol.getOrElse(lit(batchTs))
    families.map { f =>
      df.select(col(rowCol).cast(BinaryType).as("row"),
          explode(map_entries(col(f))).as("_e"),
          ts.cast(LongType).as("ts"))
        .select(
          col("row"),
          lit(f).as("family"),
          col("_e.key").as("qualifier"),
          col("ts"),
          lit(CellKind.Put).as("kind"),
          col("_e.value").as("value"),
          lit(seq).as("seq"))
    }.reduce(_ unionByName _)
  }

  def decodeToMaps(cells: DataFrame, families: Seq[String]): DataFrame = {
    require(families.nonEmpty, "at least one family")
    // sorted by (qualifier asc, ts desc, seq desc) via negated longs
    val aggs = families.zipWithIndex.map { case (f, i) =>
      array_sort(collect_list(when(col("family") === f,
        struct(col("qualifier"), (-col("ts")).as("_nts"),
          (-col("seq")).as("_nseq"), col("value"))))).as(s"_es$i")
    }
    val grouped = cells.groupBy(col("row")).agg(aggs.head, aggs.tail: _*)
    grouped.select(col("row") +: families.zipWithIndex.map { case (f, i) =>
      val es = col(s"_es$i")
      // keep each qualifier's FIRST (= newest) entry: filter's 0-based
      // index makes element_at(es, idx) the PREVIOUS (1-based) element
      val newest = filter(es, (e, idx) =>
        (idx === 0) || e.getField("qualifier") =!=
          element_at(es, idx).getField("qualifier"))
      map_from_entries(transform(newest, e =>
        struct(e.getField("qualifier").as("key"),
          e.getField("value").as("value")))).as(f)
    }: _*)
  }
}
