package graft.core

import org.apache.spark.sql.types._

/** One cell of the sorted, versioned wide-column space — the engine's atom,
  * modeling the reference's `KeyValue` (`hbase/KeyValue.java:42-66`):
  * coordinates `(row, family, qualifier, timestamp, type) -> value`.
  *
  * Deletes are tombstone cells, not physical removal
  * (`hbase/KeyValue.java:905-933`); `kind` carries the cell type and
  * `value` is null for tombstones. `seq` is a per-batch sequence number
  * used only to break ties between writes at identical coordinates and
  * timestamp (the reference serializes those under the row lock; we are
  * batch-oriented, so the tie-break must be explicit and deterministic).
  */
case class Cell(
    row: Array[Byte],
    family: String,
    qualifier: Array[Byte],
    ts: Long,
    kind: Byte,
    value: Array[Byte],
    seq: Long = 0L)

/** Cell type codes — reference `hbase/KeyValue.java:156-165`. */
object CellKind {
  val Minimum: Byte = 0
  val Put: Byte = 4
  val Delete: Byte = 8 // one exact (row,family,qualifier,ts) version
  val DeleteColumn: Byte = 12 // all versions of a column with ts <= tombstone ts
  val DeleteFamily: Byte = 14 // all cells of a family with ts <= tombstone ts
  val Maximum: Byte = 255.toByte
}

object Cell {
  /** Timestamp sentinel meaning "stamp at write time"
    * (reference `HConstants.LATEST_TIMESTAMP`). Batch writers replace it
    * with a caller-supplied batch timestamp for determinism
    * (SURVEY.md §7.5 risk 3). */
  val LatestTimestamp: Long = Long.MaxValue

  val schema: StructType = StructType(Seq(
    StructField("row", BinaryType, nullable = false),
    StructField("family", StringType, nullable = false),
    StructField("qualifier", BinaryType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("kind", ByteType, nullable = false),
    StructField("value", BinaryType, nullable = true),
    StructField("seq", LongType, nullable = false)))

  val columns: Seq[String] = schema.fieldNames.toSeq

  def put(row: Array[Byte], family: String, qualifier: Array[Byte], ts: Long,
      value: Array[Byte], seq: Long = 0L): Cell =
    Cell(row, family, qualifier, ts, CellKind.Put, value, seq)

  def delete(row: Array[Byte], family: String, qualifier: Array[Byte], ts: Long,
      seq: Long = 0L): Cell =
    Cell(row, family, qualifier, ts, CellKind.Delete, null, seq)

  def deleteColumn(row: Array[Byte], family: String, qualifier: Array[Byte],
      ts: Long, seq: Long = 0L): Cell =
    Cell(row, family, qualifier, ts, CellKind.DeleteColumn, null, seq)

  def deleteFamily(row: Array[Byte], family: String, ts: Long, seq: Long = 0L): Cell =
    Cell(row, family, Array.emptyByteArray, ts, CellKind.DeleteFamily, null, seq)
}
