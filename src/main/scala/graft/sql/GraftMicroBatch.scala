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
import org.apache.spark.util.SerializableConfiguration

/** Streaming read of a graft table through the SQL door —
  * `spark.readStream.table("<cat>.<t>")`.
  *
  * Semantics are Delta-style: a BATCH read of the table is the resolved
  * current state, a STREAMING read is the table's append feed (the
  * `data-*` history — the WAL analog `Replication.tableChangeFeed` tails;
  * resolution is not an incremental operator, CDC is). Offsets are
  * manifest versions: each micro-batch covers the append dirs added
  * between two committed versions, diffed from the manifest endpoints so
  * pruned INTERMEDIATE manifests never matter; a pruned ENDPOINT (an old
  * checkpoint racing `expireVersions`) falls back to the nearest retained
  * earlier version — some already-shipped dirs re-ship, which the
  * at-least-once / ts-seq-idempotent sink contract absorbs, instead of
  * crash-looping the stream. Compaction rewrites (`compact-*`) and
  * adopted external dirs (bulk load, imported snapshots) never enter the
  * feed — shipped dirs must be `data-*` AND live under THIS table's
  * directory, matching the reference's WAL (compactions and bulk loads
  * bypass it). A snapshot RESTORE that re-adds the table's own previously
  * streamed `data-*` dirs re-ships them (at-least-once again). A FRESH
  * replay after a compaction ships only the appends still referenced by
  * the manifest chain — compacted-away history is table state, not feed,
  * exactly as the reference cannot replay WAL segments its log cleaner
  * already removed.
  *
  * Pushed row bounds are handed to parquet as a FilterPredicate (row-group
  * skipping via the sorted layout's min/max + blooms) and re-checked with
  * the family projection per record — the ScanBuilder claimed them, so
  * they must hold on the streaming path too.
  *
  * Admission control: `option("maxVersionsPerTrigger", n)` caps each
  * micro-batch at `n` manifest versions (Delta's `maxFilesPerTrigger`
  * analog, reference parity: replication ships WAL in bounded batches —
  * `ReplicationSource` reads segments up to a size cap, not the whole
  * backlog). The cap DEFAULTS to
  * [[GraftMicroBatchStream.DefaultMaxVersionsPerTrigger]] (32) when the
  * option is absent (r10 ask 5): an unbounded backfill must not land in
  * one micro-batch — one giant commit, no incremental checkpoints, a
  * failure loses all progress. A 100 TB backfill instead becomes a
  * sequence of bounded, individually committed batches (AvailableNow
  * drains them to the prepared end). Explicit opt-out:
  * `option("maxVersionsPerTrigger", "all")`. */
object GraftMicroBatchStream {
  /** Default admission cap (manifest versions per micro-batch) when the
    * `maxVersionsPerTrigger` option is absent. Generous enough that a
    * live tail always drains in one batch, small enough that a fresh
    * checkpoint against a years-long history commits incrementally. */
  val DefaultMaxVersionsPerTrigger = 32L

  /** Shared option parsing for both streaming doors: absent -> the
    * default cap; the literal `"all"` -> unbounded (explicit opt-out);
    * a number -> that cap. */
  def parseMaxVersions(opt: Option[String]): Option[Long] = opt match {
    case None => Some(DefaultMaxVersionsPerTrigger)
    case Some(s) if s.equalsIgnoreCase("all") => None
    case Some(v) =>
      val n = v.toLong
      require(n > 0, s"maxVersionsPerTrigger must be positive or 'all', got $n")
      Some(n)
  }
}

class GraftMicroBatchStream(engine: Catalog, tableName: String,
    gscan: graft.read.Scan, required: StructType,
    maxVersionsPerTrigger: Option[Long] = None,
    saltBuckets: Int = 0,
    startingVersion: Option[String] = None) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private case class GraftOffset(version: Long) extends Offset {
    override def json(): String = s"""{"version":$version}"""
  }

  /** Where a FRESH checkpoint starts (Delta's `startingVersion` analog —
    * an existing checkpoint's offset always wins, Spark never calls this
    * again): absent = version 1, the full retained history (a backfill);
    * `"latest"` = the version current AT QUERY START, so only future
    * appends ship (the live-tail CDC consumer); `"<n>"` = ship version
    * n's appends onward (offsets are exclusive starts, so n-1). */
  override def initialOffset(): Offset = startingVersion match {
    case None => GraftOffset(0L)
    case Some(s) if s.equalsIgnoreCase("latest") =>
      GraftOffset(engine.currentManifest(tableName).version)
    case Some(s) =>
      val n = try s.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"startingVersion must be 'latest' or a version number, got '$s'")
      }
      require(n >= 1, s"startingVersion must be >= 1, got $n")
      // A start AHEAD of the table's head would make the first
      // latestOffset(start, limit) return an offset BEHIND the initial
      // one — Spark's offset-monotonicity checks can error or misbehave
      // instead of waiting for version n. Fail loudly like the malformed
      // string (Delta rejects a future startingVersion the same way).
      val head = engine.currentManifest(tableName).version
      require(n - 1 <= head,
        s"startingVersion $n is ahead of table $tableName's current " +
          s"version $head")
      GraftOffset(n - 1)
  }

  /** Under the SupportsAdmissionControl / SupportsTriggerAvailableNow
    * contract Spark must call the (start, ReadLimit) overload below; the
    * legacy no-arg form would silently bypass both maxVersionsPerTrigger
    * and the pinned AvailableNow target, so misuse fails loudly (the
    * standard pattern for admission-controlled sources). */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  /** `Trigger.AvailableNow` pins the drain target at query start —
    * REQUIRED alongside admission control: without
    * `SupportsTriggerAvailableNow` Spark demotes AvailableNow to a
    * single Trigger.Once batch, so a capped first batch would silently
    * drop the rest of the backlog instead of draining it in bounded
    * steps. */
  private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(engine.currentManifest(tableName).version)

  /** Bounded-backlog offset: at most `maxVersionsPerTrigger` manifest
    * versions past `start` (monotonic — manifest versions only grow, and
    * a cap never exceeds the head). The head is the AvailableNow target
    * when one is pinned, else the live current version. The `ReadLimit`
    * Spark hands back is our own `getDefaultReadLimit` (all-available);
    * the cap rides on the option so it applies per-run, not per-checkpoint. */
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val head = availableNowTarget
      .getOrElse(engine.currentManifest(tableName).version)
    val from = start.asInstanceOf[GraftOffset].version
    GraftOffset(maxVersionsPerTrigger.fold(head)(n => math.min(head, from + n)))
  }

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset =
    GraftOffset("\"version\":(\\d+)".r.findFirstMatchIn(json).map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad graft offset: $json")))

  /** Data dirs as of `version`, walking DOWN to the nearest retained
    * manifest when the exact one was pruned (see class doc). */
  private def dirsAt(version: Long): Seq[String] = {
    var v = version
    while (v > 0L) {
      engine.tryManifestAt(tableName, v) match {
        case Some(m) => return m.dataDirs
        case None => v -= 1
      }
    }
    Seq.empty
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftOffset].version
    val to = end.asInstanceOf[GraftOffset].version
    val tableRoot = engine.tablePath(tableName)
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    def qual(d: String): String =
      new Path(d).getFileSystem(conf).makeQualified(new Path(d)).toString
    val added = (dirsAt(to).toSet -- dirsAt(from).toSet).toSeq.sorted
      // append batches only: leaf dirs under a data-{v} parent that lives
      // UNDER this table (provenance, not just path shape — an imported
      // snapshot's external dirs also look like .../data-{v}/_fam=f)
      .filter { d =>
        Option(new Path(d).getParent).exists(_.getName.startsWith("data-")) &&
          qual(d).startsWith(tableRoot + "/")
      }
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
      gscan.startRow, gscan.stopRow, gscan.families,
      saltBuckets): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftFileReaderFactory(new SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class GraftFilePartition(file: String, fields: Array[String],
    startRow: Option[Array[Byte]], stopRow: Option[Array[Byte]],
    families: Option[Set[String]],
    saltBuckets: Int = 0) extends InputPartition

/** Carries the session's Hadoop configuration to executors — a default
  * `new Configuration()` would lose credentials/filesystem settings and
  * break exactly the deployments (s3a, custom FS) where batch reads of
  * the same table work. */
class GraftFileReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftFileReader(partition.asInstanceOf[GraftFilePartition], conf.value)
}

/** Reads one committed cell parquet file via parquet-hadoop's Group API
  * (the files are written by Spark with the fixed Cell schema, so field
  * access by name is stable). Row bounds push into parquet as a
  * FilterPredicate — row-group skipping against the sorted layout's
  * min/max stats and blooms — and are re-checked (with the family
  * projection) per record. */
class GraftFileReader(p: GraftFilePartition,
    conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {
  import org.apache.parquet.filter2.compat.FilterCompat
  import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.io.api.Binary

  // On a SALTED table the stored keys carry the salt prefix, so logical
  // row bounds cannot push as one parquet range — bounds are re-checked
  // per record on the STRIPPED key instead (append batches are small,
  // bounded by maxVersionsPerTrigger; the batch read path keeps full
  // scatter pruning).
  private val rowPredicate: Option[FilterPredicate] =
    if (p.saltBuckets > 0) None
    else {
      val col = FilterApi.binaryColumn("row")
      val lo = p.startRow.map(b =>
        FilterApi.gtEq(col, Binary.fromConstantByteArray(b)): FilterPredicate)
      val hi = p.stopRow.map(b =>
        FilterApi.lt(col, Binary.fromConstantByteArray(b)): FilterPredicate)
      (lo, hi) match {
        case (Some(a), Some(b)) => Some(FilterApi.and(a, b))
        case (a, b) => a.orElse(b)
      }
    }

  /** Logical key of a stored record (salt stripped on salted tables). */
  private def logicalRow(g: Group): Array[Byte] = {
    val raw = g.getBinary("row", 0).getBytes
    if (p.saltBuckets > 0) raw.drop(1) else raw
  }

  // Column projection: request only the pruned fields (plus row/family,
  // which the visibility check needs) so unneeded column chunks are never
  // read. Pruning happens inside ReadSupport.init against the file schema
  // the callback already receives — one footer read, exact repetitions,
  // no conf copy or schema-string round-trip.
  private class ProjectingReadSupport(needed: Set[String]) extends GroupReadSupport {
    override def init(context: org.apache.parquet.hadoop.api.InitContext)
        : org.apache.parquet.hadoop.api.ReadSupport.ReadContext = {
      import scala.jdk.CollectionConverters._
      val fileSchema = context.getFileSchema
      val kept = fileSchema.getFields.asScala.filter(f => needed(f.getName))
      new org.apache.parquet.hadoop.api.ReadSupport.ReadContext(
        new org.apache.parquet.schema.MessageType(fileSchema.getName, kept.asJava))
    }
  }

  private val reader: ParquetReader[Group] = {
    var b = ParquetReader.builder(
        new ProjectingReadSupport(p.fields.toSet + "row" + "family"),
        new Path(p.file))
      .withConf(conf)
    rowPredicate.foreach(pr => b = b.withFilter(FilterCompat.get(pr)))
    b.build()
  }
  private var current: Group = _

  private def visible(g: Group): Boolean = {
    val row = logicalRow(g)
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
    case "row" => logicalRow(g)
    case "qualifier" => g.getBinary(name, 0).getBytes
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
