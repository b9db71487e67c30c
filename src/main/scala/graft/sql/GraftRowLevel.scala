package graft.sql

import java.io.{DataInputStream, DataOutputStream, EOFException, IOException}

import graft.catalog.Catalog
import graft.core.{Cell, CellKind}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL `UPDATE` / `MERGE INTO` (and predicate-general `DELETE`) for graft
  * tables — the DSv2 row-level-operation door, delta-based.
  *
  * The reference's only conditional-mutation surface is
  * `checkAndPut`/`checkAndDelete` (`HTable.java:773,811`): read the
  * current cell, compare, write a mutation. Spark's `SupportsDelta`
  * protocol is the same shape made declarative — the table's own scan
  * produces the CURRENT resolved cells matching the predicate (the
  * "check", with row-range/family pushdown exactly like any read), and
  * the engine receives only the per-cell verdicts: insert / update /
  * delete. We map them onto the engine's native mutation model:
  *
  *  - `UPDATE`  → a new `Put` version stamped strictly after the matched
  *    cell (the reference's checkAndPut writes a new version at server
  *    time, never in place — `HRegion.put` via `checkAndMutate`);
  *  - `DELETE`  → a `DeleteColumn` tombstone at the matched version's ts
  *    (`Delete.deleteColumns` semantics: masks everything ≤ ts, later
  *    writes survive, snapshots/time travel keep the old view);
  *  - `INSERT` (from MERGE's NOT MATCHED) → a `Put` at the row's own ts
  *    (`LatestTimestamp` sentinel → the statement's commit time).
  *
  * Scale shape: matched rows never visit the driver. Each write task
  * streams its delta cells to one staging file next to the table (the
  * WAL analog — an `HLog` append before the memstore flush); commit runs
  * ONE distributed job that decodes the staged files and hands them to
  * `Catalog.append`, which lays them out range-partitioned + sorted like
  * every other batch. The driver sees file paths and counts, nothing
  * else. Snapshots are untouched (appends are new immutable dirs), and
  * the statement is atomic: the manifest commit is the only visible
  * effect, staging is invisible to readers and dropped on abort.
  */
class GraftRowLevelOperation(engine: Catalog, tableName: String,
    cmd: RowLevelOperation.Command) extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  /** The SAME scan builder as any read — row/family/qualifier pushdown
    * and parquet pruning apply to the matched-row scan too, so an UPDATE
    * with row bounds reads only the bounded range. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(engine, tableName)

  /** A resolved cell is identified by its full coordinates. `seq` is
    * excluded: resolution already collapsed ties, so (row, family,
    * qualifier, ts) is unique in the scanned view. */
  override def rowId(): Array[NamedReference] = Array(
    Expressions.column("row"), Expressions.column("family"),
    Expressions.column("qualifier"), Expressions.column("ts"))

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder = {
    // Fail before any task runs, not at commit.
    require(!engine.currentManifest(tableName).descriptor.readOnly,
      s"table $tableName is read-only")
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new GraftDeltaWrite(engine, tableName, GraftSqlCatalog.nowMs())
    }
  }

  override def description(): String = s"graft.$tableName $cmd"
}

class GraftDeltaWrite(engine: Catalog, tableName: String, commitMs: Long)
    extends DeltaWrite {
  override def toBatch: DeltaBatchWrite =
    new GraftDeltaBatchWrite(engine, tableName, commitMs)
  override def description(): String = s"graft delta write $tableName"
}

case class GraftDeltaCommitMessage(path: String, cells: Long)
    extends WriterCommitMessage

/** `mkWriters` picks the per-task verdict→cell translation (cell-schema
  * rows by default; the wide view substitutes its relational encoder) —
  * staging format and the commit job are IDENTICAL either way. */
class GraftDeltaBatchWrite(engine: Catalog, tableName: String, commitMs: Long,
    mkWriters: (String, Long) => DeltaWriterFactory =
      new GraftDeltaWriterFactory(_, _))
    extends DeltaBatchWrite {

  private val stagingDir: String = engine.newStagingDir(tableName)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    mkWriters(stagingDir, commitMs)

  /** One distributed decode job over the staged files, then the ordinary
    * append commit (range-partitioned sorted parquet + manifest bump).
    * Only staging paths cross the driver. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    try {
      val paths = messages.collect {
        case GraftDeltaCommitMessage(p, n) if p != null && n > 0 => p
      }.toSeq
      val cells =
        if (paths.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Cell.schema)
        else {
          val slices = math.min(paths.size, spark.sparkContext.defaultParallelism)
          val rdd = spark.sparkContext
            .parallelize(paths, math.max(1, slices))
            .flatMap(DeltaStage.readCells)
            .map(c => Row(c.row, c.family, c.qualifier, c.ts, c.kind, c.value, c.seq))
          spark.createDataFrame(rdd, Cell.schema)
        }
      engine.append(tableName, cells, commitMs): Unit
    } finally engine.dropStagingDir(stagingDir)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    engine.dropStagingDir(stagingDir)
}

class GraftDeltaWriterFactory(stagingDir: String, commitMs: Long)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(stagingDir, partitionId, taskId, commitMs)
}

/** Per-task delta writer. Buffers nothing: every verdict is framed
  * straight onto the task's staging stream. Field order contracts:
  * `id` rows follow [[GraftRowLevelOperation.rowId]] — (row, family,
  * qualifier, ts); full rows follow [[Cell.schema]] — (row, family,
  * qualifier, ts, kind, value, seq). */
class GraftDeltaWriter(stagingDir: String, partitionId: Int, taskId: Long,
    commitMs: Long) extends DeltaWriter[InternalRow] {

  private var out: DataOutputStream = _
  private var path: String = _
  private var count = 0L

  private def stream(): DataOutputStream = {
    if (out == null) {
      val p = new Path(stagingDir, s"delta-$partitionId-$taskId.cells")
      val fs = p.getFileSystem(new Configuration())
      out = new DataOutputStream(new java.io.BufferedOutputStream(fs.create(p, true)))
      path = p.toString
    }
    out
  }

  protected def emit(row: Array[Byte], family: String, qualifier: Array[Byte],
      ts: Long, kind: Byte, value: Array[Byte]): Unit = {
    DeltaStage.writeCell(stream(), row, family, qualifier, ts, kind, value)
    count += 1
  }

  /** DELETE of a resolved cell: a DeleteColumn tombstone at the matched
    * version — all versions ≤ it disappear from reads; snapshots and
    * time travel still see them. */
  override def delete(meta: InternalRow, id: InternalRow): Unit =
    emit(id.getBinary(0), id.getUTF8String(1).toString, id.getBinary(2),
      id.getLong(3), CellKind.DeleteColumn, null)

  /** UPDATE: a new Put version, stamped strictly after the matched cell.
    * If the assignment moved the cell's coordinates (row/family/qualifier
    * SET), the old coordinate also gets a tombstone — reference
    * semantics: a "move" is checkAndDelete + put, there is no rename. An
    * explicit `SET ts = ...` is honored verbatim (the reference lets
    * callers stamp Puts). */
  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    val oldRow = id.getBinary(0)
    val oldFam = id.getUTF8String(1).toString
    val oldQual = id.getBinary(2)
    val oldTs = id.getLong(3)
    val newRow = row.getBinary(0)
    val newFam = row.getUTF8String(1).toString
    val newQual = row.getBinary(2)
    val newTs = row.getLong(3)
    val value = if (row.isNullAt(5)) null else row.getBinary(5)
    val moved = !java.util.Arrays.equals(oldRow, newRow) || oldFam != newFam ||
      !java.util.Arrays.equals(oldQual, newQual)
    if (moved)
      emit(oldRow, oldFam, oldQual, oldTs, CellKind.DeleteColumn, null)
    val ts = if (newTs != oldTs) newTs else math.max(commitMs, oldTs + 1)
    emit(newRow, newFam, newQual, ts, CellKind.Put, value)
  }

  /** MERGE's NOT MATCHED INSERT: a Put with the row's own stamp (the
    * `LatestTimestamp` sentinel defers to the statement's commit time,
    * like an unstamped reference Put defers to server time). */
  override def insert(row: InternalRow): Unit = {
    val ts0 = row.getLong(3)
    val ts = if (ts0 == Cell.LatestTimestamp) commitMs else ts0
    val kind = row.getByte(4)
    val value = if (row.isNullAt(5)) null else row.getBinary(5)
    emit(row.getBinary(0), row.getUTF8String(1).toString, row.getBinary(2),
      ts, kind, value)
  }

  override def write(row: InternalRow): Unit = insert(row)

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    GraftDeltaCommitMessage(path, count)
  }

  override def abort(): Unit = if (out != null) out.close()
  override def close(): Unit = ()
}

/** Length-framed staging codec for delta cells — the on-disk WAL-entry
  * format between write tasks and the commit job. One frame per cell:
  * `[rowLen][row][famLen][famUtf8][qualLen][qual][ts][kind][valLen|-1][val]`.
  * `seq` is not framed: delta batches are stamped strictly after existing
  * data, so the tie-break never fires (written as 0 on decode). */
object DeltaStage {

  def writeCell(out: DataOutputStream, row: Array[Byte], family: String,
      qualifier: Array[Byte], ts: Long, kind: Byte, value: Array[Byte]): Unit = {
    val fam = family.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    out.writeInt(row.length); out.write(row)
    out.writeInt(fam.length); out.write(fam)
    out.writeInt(qualifier.length); out.write(qualifier)
    out.writeLong(ts); out.writeByte(kind)
    if (value == null) out.writeInt(-1)
    else { out.writeInt(value.length); out.write(value) }
  }

  /** Lazily decodes one staged file; closes the stream at EOF. */
  def readCells(path: String): Iterator[Cell] = {
    val p = new Path(path)
    val in = new DataInputStream(
      new java.io.BufferedInputStream(p.getFileSystem(new Configuration()).open(p)))
    new Iterator[Cell] {
      private var nextCell: Cell = _
      private var done = false
      private def advance(): Unit =
        try {
          val row = new Array[Byte](in.readInt()); in.readFully(row)
          val fam = new Array[Byte](in.readInt()); in.readFully(fam)
          val qual = new Array[Byte](in.readInt()); in.readFully(qual)
          val ts = in.readLong()
          val kind = in.readByte()
          val valLen = in.readInt()
          val value = if (valLen < 0) null
            else { val v = new Array[Byte](valLen); in.readFully(v); v }
          nextCell = Cell(row,
            new String(fam, java.nio.charset.StandardCharsets.UTF_8),
            qual, ts, kind, value)
        } catch {
          case _: EOFException => done = true; in.close()
          case e: IOException => in.close(); throw e
        }
      advance()
      override def hasNext: Boolean = !done
      override def next(): Cell = {
        if (done) throw new NoSuchElementException
        val c = nextCell; advance(); c
      }
    }
  }
}
