package graft.sql

import graft.catalog.Catalog
import graft.core.Bytes
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Streaming read of a graft table through the SQL door —
  * `spark.readStream.table("<cat>.<t>")`.
  *
  * Semantics are Delta-style: a BATCH read of the table is the resolved
  * current state, a STREAMING read is the table's append feed (the
  * `data-*` history — the WAL analog `Replication.tableChangeFeed` tails;
  * resolution is not an incremental operator, CDC is). Offsets are
  * manifest versions: each micro-batch covers the append dirs added
  * between two committed versions, diffed from the manifest endpoints so
  * pruned intermediate manifests are harmless. Compaction rewrites
  * (`compact-*`) and bulk-load adoptions (external paths) never enter the
  * feed, matching the reference's WAL (compactions and bulk loads bypass
  * it).
  *
  * Pushed row bounds / family projection ARE applied per record in the
  * reader — the ScanBuilder claimed them, so they must hold on the
  * streaming path too. */
class GraftMicroBatchStream(engine: Catalog, tableName: String,
    gscan: graft.read.Scan, required: StructType) extends MicroBatchStream {

  private case class GraftOffset(version: Long) extends Offset {
    override def json(): String = s"""{"version":$version}"""
  }

  override def initialOffset(): Offset = GraftOffset(0L)

  override def latestOffset(): Offset =
    GraftOffset(engine.currentManifest(tableName).version)

  override def deserializeOffset(json: String): Offset =
    GraftOffset("\"version\":(\\d+)".r.findFirstMatchIn(json).map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad graft offset: $json")))

  private def dirsAt(version: Long): Seq[String] =
    if (version <= 0L) Seq.empty
    else engine.manifestAt(tableName, version).dataDirs

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftOffset].version
    val to = end.asInstanceOf[GraftOffset].version
    val added = (dirsAt(to).toSet -- dirsAt(from).toSet).toSeq.sorted
      // append batches only: leaf dirs under a data-{v} parent
      .filter { d =>
        Option(new Path(d).getParent).exists(_.getName.startsWith("data-"))
      }
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    added.flatMap { d =>
      val p = new Path(d)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else {
        val it = fs.listFiles(p, true)
        val files = Seq.newBuilder[String]
        while (it.hasNext) {
          val st = it.next()
          if (st.getPath.getName.endsWith(".parquet"))
            files += st.getPath.toString
        }
        files.result()
      }
    }.map(f => GraftFilePartition(f, required.fieldNames,
      gscan.startRow, gscan.stopRow, gscan.families): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftFileReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class GraftFilePartition(file: String, fields: Array[String],
    startRow: Option[Array[Byte]], stopRow: Option[Array[Byte]],
    families: Option[Set[String]]) extends InputPartition

class GraftFileReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftFileReader(partition.asInstanceOf[GraftFilePartition])
}

/** Reads one committed cell parquet file via parquet-hadoop's Group API
  * (the files are written by Spark with the fixed Cell schema, so field
  * access by name is stable), applying the claimed row/family pushdown. */
class GraftFileReader(p: GraftFilePartition) extends PartitionReader[InternalRow] {
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.example.data.Group

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new Path(p.file)).build()
  private var current: Group = _

  private def visible(g: Group): Boolean = {
    val row = g.getBinary("row", 0).getBytes
    p.startRow.forall(s => Bytes.compareTo(row, s) >= 0) &&
      p.stopRow.forall(s => Bytes.compareTo(row, s) < 0) &&
      p.families.forall(_.contains(g.getString("family", 0)))
  }

  override def next(): Boolean = {
    var g = reader.read()
    while (g != null && !visible(g)) g = reader.read()
    current = g
    g != null
  }

  private def fieldValue(g: Group, name: String): Any = name match {
    case "row" | "qualifier" => g.getBinary(name, 0).getBytes
    case "value" =>
      if (g.getFieldRepetitionCount("value") == 0) null
      else g.getBinary("value", 0).getBytes
    case "family" => UTF8String.fromString(g.getString("family", 0))
    case "ts" | "seq" => g.getLong(name, 0)
    case "kind" => g.getInteger("kind", 0).toByte
    case other => throw new IllegalArgumentException(s"unknown cell field $other")
  }

  override def get(): InternalRow =
    new GenericInternalRow(p.fields.map(f => fieldValue(current, f)))

  override def close(): Unit = reader.close()
}
