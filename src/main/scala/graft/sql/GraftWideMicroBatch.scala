package graft.sql

import graft.catalog.Catalog
import graft.core.{Bytes, Cell, CellKind}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.Offset
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Streaming read of a WIDE view — `spark.readStream.table("<cat>.
  * \`t\$wide\`")`: the table's append feed decoded into relational
  * UPSERT rows (the CDC shape a Phoenix/Delta user expects from a
  * declared relational view).
  *
  * Semantics, layered on the cell feed's contract
  * ([[GraftMicroBatchStream]] — offsets are manifest versions, appends
  * only, at-least-once): each appended batch's Put cells decode to one
  * row per (version, row key) carrying that batch's newest value per
  * declared column; columns the batch did not touch are null (this is a
  * CHANGE feed, not resolved state — readers merge upserts by key, the
  * standard CDC consumption). Tombstone kinds never produce values: a
  * batch whose newest cell for a column is a delete yields null there,
  * and a row with only tombstones ships nothing (deletes are visibility,
  * not upserts — the reference's replication sink applies them on the
  * peer, `Replication` here exposes them on the CELL feed for users who
  * need them).
  *
  * Exactness of per-FILE assembly (no shuffle, no state): every
  * committed `data-*` leaf file is range-partitioned by row and sorted
  * by (row, family, qualifier, ts desc, seq desc) — `Catalog.writeCells`
  * is the single append path — so one (version, family, row)'s cells are
  * CONTIGUOUS in exactly one file, and first-seen-per-qualifier is the
  * batch's newest version. This is also why the wide stream requires a
  * SINGLE-family wideSchema: a second family's cells land in a sibling
  * `_fam=` leaf dir, and assembling one row across two files would need
  * a shuffle the streaming partition contract does not have. Multi-family
  * views stream the cell door and decode in `foreachBatch`.
  */
class GraftWideMicroBatchStream(engine: Catalog, tableName: String,
    spec: WideSpec, required: StructType, family: String,
    startRow: Option[Array[Byte]], stopRow: Option[Array[Byte]],
    maxVersionsPerTrigger: Option[Long], saltBuckets: Int)
    extends GraftMicroBatchStream(engine, tableName,
      graft.read.Scan(startRow, stopRow).addFamily(family), Cell.schema,
      maxVersionsPerTrigger, saltBuckets) {

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    super.planInputPartitions(start, end).map { p =>
      val fp = p.asInstanceOf[GraftFilePartition]
      GraftWideFilePartition(fp.file, startRow, stopRow, family,
        saltBuckets, spec, required.fieldNames): InputPartition
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftWideReaderFactory(new SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))
}

case class GraftWideFilePartition(file: String,
    startRow: Option[Array[Byte]], stopRow: Option[Array[Byte]],
    family: String, saltBuckets: Int,
    spec: WideSpec, fields: Array[String]) extends InputPartition

class GraftWideReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftWideFileReader(partition.asInstanceOf[GraftWideFilePartition],
      conf.value)
}

/** Assembles one committed cell file (sorted by row — see the stream's
  * class doc) into wide upsert rows. The JVM-side value decode MUST
  * byte-match `CellCodec.decodeValue` — `WideStreamSpec` pins the parity
  * by comparing a streamed batch against the batch wide SELECT of the
  * same table across every declared type. */
class GraftWideFileReader(p: GraftWideFilePartition,
    conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {

  private val cellFields =
    Array("row", "family", "qualifier", "ts", "kind", "value", "seq")
  private val cells = new GraftFileReader(
    GraftFilePartition(p.file, cellFields, p.startRow, p.stopRow,
      Some(Set(p.family)), p.saltBuckets), conf)

  // qualifier name -> declared column index (column identity = qualifier)
  private val colOf: Map[String, Int] =
    p.spec.cols.zipWithIndex.map { case (c, i) => (c.name, i) }.toMap
  // output field -> (isKeyPart, index into key parts | column slots)
  private val outFields: Array[(Boolean, Int)] = p.fields.map { f =>
    val ki = p.spec.key.indexWhere(_._1 == f)
    if (ki >= 0) (true, ki)
    else (false, colOf.getOrElse(f, throw new IllegalArgumentException(
      s"unknown wide field $f")))
  }

  private var look: InternalRow = if (cells.next()) cells.get() else null
  private var out: InternalRow = _

  private def advance(): Unit =
    look = if (cells.next()) cells.get() else null

  /** Typed key parts from the (salt-stripped) row key — the JVM mirror of
    * `CellCodec.decode`'s key columns: fixed-width parts first, at most
    * one variable tail (WideSpec.parse enforces the shape). */
  private def keyParts(row: Array[Byte]): Array[Any] = {
    var off = 0
    p.spec.key.map { case (n, dt) =>
      dt match {
        case LongType =>
          val b = java.util.Arrays.copyOfRange(row, off, off + 8); off += 8
          if (p.spec.orderedKey(n)) Bytes.toLongOrdered(b) else Bytes.toLong(b)
        case IntegerType =>
          val b = java.util.Arrays.copyOfRange(row, off, off + 4); off += 4
          if (p.spec.orderedKey(n)) Bytes.toIntOrdered(b) else Bytes.toInt(b)
        case StringType =>
          UTF8String.fromBytes(java.util.Arrays.copyOfRange(row, off, row.length))
        case BinaryType =>
          java.util.Arrays.copyOfRange(row, off, row.length)
        case other =>
          throw new IllegalArgumentException(s"unsupported key type: $other")
      }
    }.toArray
  }

  /** Cell value bytes -> the column's InternalRow representation — the
    * JVM mirror of `CellCodec.decodeValue` (same byte conventions:
    * big-endian integrals, IEEE bits as 8 bytes for double AND float,
    * millis for timestamp, micros for timestamp_ntz, days for date). */
  private def decodeVal(c: WideCol, b: Array[Byte]): Any =
    if (c.ordered) c.dt match {
      case LongType => Bytes.toLongOrdered(b)
      case IntegerType => Bytes.toIntOrdered(b)
      case DoubleType => Bytes.toDoubleOrdered(b)
      case other => throw new IllegalArgumentException(
        s"no ordered encoding for cell type $other")
    } else c.dt match {
      case LongType => Bytes.toLong(b)
      case IntegerType => Bytes.toInt(b)
      case StringType => UTF8String.fromBytes(b)
      case DoubleType => Bytes.toDouble(b)
      case FloatType => Bytes.toDouble(b).toFloat // encoded as double bits
      case TimestampType => Bytes.toLong(b) * 1000L // millis -> micros
      case TimestampNTZType => Bytes.toLong(b) // micros
      case DateType => Bytes.toInt(b) // days
      case BooleanType => Bytes.toBoolean(b)
      case BinaryType => b
      case other =>
        throw new IllegalArgumentException(s"unsupported cell type: $other")
    }

  override def next(): Boolean = {
    out = null
    while (out == null && look != null) {
      val row = look.getBinary(0)
      val slots = new Array[Any](p.spec.cols.length)
      val seen = new Array[Boolean](p.spec.cols.length)
      var anyPut = false
      while (look != null && java.util.Arrays.equals(look.getBinary(0), row)) {
        val qual = new String(look.getBinary(2),
          java.nio.charset.StandardCharsets.UTF_8)
        colOf.get(qual).foreach { ci =>
          // first-seen wins: the file sorts (ts desc, seq desc) within a
          // qualifier, so this is the batch's newest version
          if (!seen(ci)) {
            seen(ci) = true
            if (look.getByte(4) == CellKind.Put && !look.isNullAt(5)) {
              slots(ci) = decodeVal(p.spec.cols(ci), look.getBinary(5))
              anyPut = true
            } // tombstone kinds leave the slot null
          }
        }
        advance()
      }
      if (anyPut) {
        val keys = keyParts(row)
        out = new GenericInternalRow(outFields.map {
          case (true, ki) => keys(ki)
          case (false, ci) => slots(ci)
        })
      }
    }
    out != null
  }

  override def get(): InternalRow = out

  override def close(): Unit = cells.close()
}
