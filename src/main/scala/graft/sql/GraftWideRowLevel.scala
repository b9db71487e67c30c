package graft.sql

import graft.catalog.Catalog
import graft.core.{Bytes, CellKind}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL `UPDATE` / `DELETE` / `MERGE INTO` on the declared WIDE view —
  * the relational DML surface over the cell table, the same shape
  * Phoenix gives an HBase table (`UPSERT`/`DELETE` compiled to
  * Put/Delete mutations, `phoenix/.../UpsertCompiler`,`DeleteCompiler`
  * semantics; the reference's own mutation surface is
  * `HTable.put/delete` — `HTable.java:648,742`).
  *
  * The row identity is the DECLARED KEY (`wideKey` columns) — Spark's
  * `SupportsDelta` hands back per-row verdicts against it, and the
  * writer translates each verdict into the engine's native mutation
  * cells:
  *
  *  - `DELETE` → one `DeleteFamily` tombstone per table family at the
  *    statement's commit time (`Delete(row)` semantics — masks
  *    everything current, later writes survive, snapshots and time
  *    travel keep the pre-delete view);
  *  - `UPDATE` → a `Put` per non-null declared column and a
  *    `DeleteColumn` per null one (SET c = NULL deletes the cell —
  *    absence == null, the wide view's own reading of the cell model);
  *    a key-moving SET also tombstones the OLD row (a "move" is
  *    delete + put, there is no rename — same rule as the cell door);
  *  - MERGE's NOT MATCHED `INSERT` → `Put`s of the non-null columns
  *    (exactly `INSERT INTO t$wide`'s encoding, per-row).
  *
  * All cells flow through the SAME staging + commit path as the cell
  * door ([[GraftDeltaBatchWrite]]): per-task staged frames, ONE
  * distributed decode job, `Catalog.append` (salt applied, registered
  * indexes dual-written, manifest committed atomically). Matched rows
  * never visit the driver.
  *
  * Concurrency note: verdict cells are stamped at the statement's
  * commit time. Two mutating statements in the SAME wall-clock
  * millisecond would tie on `ts` (the facade's per-batch `seq` ordering
  * is per-statement); deterministic tests pin distinct times via
  * `spark.graft.sql.nowMs`.
  */
class GraftWideRowLevelOperation(engine: Catalog, baseTable: String,
    cmd: RowLevelOperation.Command) extends RowLevelOperation with SupportsDelta {

  // One manifest read per statement: scan, spec, and write plan agree on
  // one table version (same capture rule as GraftWideTable.newScanBuilder).
  private val manifest = engine.currentManifest(baseTable)
  private val sp: WideSpec =
    WideSpec.parse(manifest.descriptor.wideKey, manifest.descriptor.wideSchema)

  override def command(): RowLevelOperation.Command = cmd

  /** The SAME scan builder as any wide read — key-range pruning, index
    * routing, and column pruning apply to the matched-row scan too. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftWideScanBuilder(engine, baseTable, sp, manifest)

  /** A wide row is identified by its declared key columns. */
  override def rowId(): Array[NamedReference] =
    sp.key.map { case (n, _) => Expressions.column(n) }.toArray

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder = {
    require(!manifest.descriptor.readOnly, s"table $baseTable is read-only")
    val families = manifest.descriptor.families.map(_.name)
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = {
        val commitMs = GraftSqlCatalog.nowMs()
        new DeltaWrite {
          override def toBatch: DeltaBatchWrite =
            new GraftDeltaBatchWrite(engine, baseTable, commitMs,
              (dir, ms) => new GraftWideDeltaWriterFactory(dir, ms, sp, families))
          override def description(): String =
            s"graft wide delta write $baseTable"
        }
      }
    }
  }

  override def description(): String = s"graft.$baseTable${WideSpec.Suffix} $cmd"
}

class GraftWideDeltaWriterFactory(stagingDir: String, commitMs: Long,
    sp: WideSpec, families: Seq[String]) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftWideDeltaWriter(stagingDir, partitionId, taskId, commitMs, sp, families)
}

/** Per-task wide delta writer: relational verdict rows -> mutation
  * cells, streamed straight onto the task's staging file. Field order
  * contracts: `id` rows follow [[GraftWideRowLevelOperation.rowId]] (the
  * declared key parts, in key order); full rows follow the wide view's
  * schema (key parts, then declared columns — [[WideSpec.schema]]). All
  * encodings byte-match the Column-side codec ([[CellCodec]]; parity
  * pinned by `BytesSpec`/`WideViewSpec`), so a delta-written cell is
  * indistinguishable from an INSERT-written one. */
class GraftWideDeltaWriter(stagingDir: String, partitionId: Int, taskId: Long,
    commitMs: Long, sp: WideSpec, families: Seq[String])
    extends GraftDeltaWriter(stagingDir, partitionId, taskId, commitMs) {

  private def keyPart(name: String, dt: DataType, r: InternalRow, i: Int)
      : Array[Byte] = {
    require(!r.isNullAt(i), s"wide DML: key part '$name' must be non-null")
    dt match {
      case LongType =>
        if (sp.orderedKey(name)) Bytes.toBytesOrdered(r.getLong(i))
        else Bytes.toBytes(r.getLong(i))
      case IntegerType =>
        if (sp.orderedKey(name)) Bytes.toBytesOrdered(r.getInt(i))
        else Bytes.toBytes(r.getInt(i))
      case StringType => Bytes.toBytes(r.getUTF8String(i).toString)
      case BinaryType => r.getBinary(i)
      case other =>
        throw new IllegalArgumentException(s"unsupported key type: $other")
    }
  }

  /** Row key from an `id` row (key parts only) or a full row (key parts
    * lead the schema) — same layout either way. */
  private def rowKeyOf(r: InternalRow): Array[Byte] = {
    val parts = sp.key.zipWithIndex.map { case ((n, dt), i) => keyPart(n, dt, r, i) }
    if (parts.size == 1) parts.head else parts.flatten.toArray
  }

  /** JVM-side mirror of `CellCodec.encodeValue` (null -> no cell). */
  private def valueOf(c: WideCol, r: InternalRow, i: Int): Array[Byte] =
    if (r.isNullAt(i)) null
    else c.dt match {
      case LongType =>
        if (c.ordered) Bytes.toBytesOrdered(r.getLong(i))
        else Bytes.toBytes(r.getLong(i))
      case IntegerType =>
        if (c.ordered) Bytes.toBytesOrdered(r.getInt(i))
        else Bytes.toBytes(r.getInt(i))
      case StringType => Bytes.toBytes(r.getUTF8String(i).toString)
      case DoubleType =>
        if (c.ordered) Bytes.toBytesOrdered(r.getDouble(i))
        else Bytes.toBytes(r.getDouble(i))
      case FloatType => Bytes.toBytes(r.getFloat(i).toDouble) // 8-byte double bits
      case TimestampType => Bytes.toBytes(Math.floorDiv(r.getLong(i), 1000L)) // micros -> millis
      case TimestampNTZType => Bytes.toBytes(r.getLong(i)) // micros (UTC session)
      case DateType => Bytes.toBytes(r.getInt(i)) // epoch days
      case BooleanType => Bytes.toBytes(r.getBoolean(i))
      case BinaryType => r.getBinary(i)
      case other =>
        throw new IllegalArgumentException(s"unsupported cell type: $other")
    }

  /** Non-null declared columns -> Puts; with `tombstoneNulls`, null ones
    * -> DeleteColumn (UPDATE's SET c = NULL; a fresh INSERT skips the
    * tombstones — there is nothing to mask). */
  private def writeRow(key: Array[Byte], r: InternalRow,
      tombstoneNulls: Boolean): Unit =
    sp.cols.zipWithIndex.foreach { case (c, j) =>
      val v = valueOf(c, r, sp.key.size + j)
      if (v != null) emit(key, c.family, c.qualifier, commitMs, CellKind.Put, v)
      else if (tombstoneNulls)
        emit(key, c.family, c.qualifier, commitMs, CellKind.DeleteColumn, null)
    }

  private def deleteRow(key: Array[Byte]): Unit =
    families.foreach { f =>
      emit(key, f, Array.emptyByteArray, commitMs, CellKind.DeleteFamily, null)
    }

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    deleteRow(rowKeyOf(id))

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    val oldKey = rowKeyOf(id)
    val newKey = rowKeyOf(row)
    if (!java.util.Arrays.equals(oldKey, newKey)) deleteRow(oldKey)
    writeRow(newKey, row, tombstoneNulls = true)
  }

  override def insert(row: InternalRow): Unit =
    writeRow(rowKeyOf(row), row, tombstoneNulls = false)

  override def write(row: InternalRow): Unit = insert(row)
}
