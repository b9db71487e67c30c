package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time ingestion: maps a source timestamp column of WHATEVER unit
  * the upstream writer chose onto the engine's cell-timestamp unit, which
  * is epoch NANOS as a plain long (the finest unit any corpus has shipped;
  * every coarser unit embeds exactly).
  *
  * The unit is dispatched on the column's ACTUAL Spark type, never assumed:
  *  - parquet timestamp[ns] has no Spark type and reads as LongType
  *    epoch-nanos under `spark.sql.legacy.parquet.nanosAsLong` — pass-through;
  *  - parquet timestamp[us/ms] isAdjustedToUTC=false reads as TIMESTAMP_NTZ
  *    — with the session timeZone pinned to UTC the cast to TimestampType is
  *    instant-preserving, and `unix_micros` keeps full precision;
  *  - instant-semantics TimestampType converts directly.
  *
  * The reference stores cell timestamps as a first-class long everywhere
  * (`hbase/KeyValue.java:66`); interpreting the unit is the client codec's
  * job (`hbase/util/Bytes.java`), which is exactly where this object sits.
  * Hard-coding one unit is how a single upstream regen (ns -> us, observed
  * between rounds 4 and 5) silently kills every event-time query.
  */
object EventTime {

  /** Epoch-nanos expression for a source column of type `dt`. */
  def nanos(dt: DataType, c: Column): Column = dt match {
    case LongType => c // already epoch nanos (nanosAsLong read path)
    case TimestampNTZType => unix_micros(c.cast(TimestampType)) * 1000L
    case TimestampType => unix_micros(c) * 1000L
    case DateType => unix_micros(c.cast(TimestampType)) * 1000L
    case other => throw new IllegalArgumentException(
      s"event-time column has unsupported type $other " +
        "(expected long epoch-nanos, timestamp, timestamp_ntz, or date)")
  }

  /** `df` with `name` replaced by its epoch-nanos long form; a no-op when
    * the column is already a long. Every events-table consumer ingests
    * through this, so a unit change upstream lands in exactly one place. */
  def normalize(df: DataFrame, name: String = "ts"): DataFrame =
    df.schema(name).dataType match {
      case LongType => df
      case dt => df.withColumn(name, nanos(dt, col(name)))
    }

  /** Epoch nanos of an ISO date at UTC midnight — constants (TimeRange
    * bounds, as-of points) in the same unit as [[nanos]] output. */
  def nanosOf(isoDate: String): Long =
    java.time.Instant.parse(isoDate + "T00:00:00Z").toEpochMilli * 1000000L

  /** Columns of `path`'s parquet whose logical type is TIMESTAMP(NANOS)
    * (any adjustment), read from the FIRST footer — one metadata read, no
    * data scan. The footer ANNOTATION is the physical truth a reader can
    * rely on; embedded key-value schema metadata can lie (see
    * [[readAdaptive]]). */
  def nanosAnnotated(spark: org.apache.spark.sql.SparkSession,
      path: String): Set[String] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isFile) Some(p)
      else fs.listStatus(p).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).headOption
    file.fold(Set.empty[String]) { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        import scala.jdk.CollectionConverters._
        schema.getFields.asScala.collect {
          case g if Option(g.getLogicalTypeAnnotation).exists {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
            case _ => false
          } => g.getName
        }.toSet
      } finally reader.close()
    }
  }

  /** `spark.read.parquet` hardened against STALE EMBEDDED SCHEMAS on
    * TIMESTAMP(NANOS) columns. A clean ns-annotated file infers LongType
    * via `nanosAsLong` and needs no help. But when a rewriting tool casts
    * a Spark-written column to ns while PRESERVING the file's key-value
    * metadata (pyarrow does), the footer keeps an
    * `org.apache.spark.sql.parquet.row.metadata` entry still claiming
    * `timestamp_ntz` — Spark trusts that embedded schema over the
    * footer's physical annotation, infers NTZ, and the vectorized reader
    * then dies on the nanos column mid-query. (tools/finalize_scale.py
    * shipped exactly this shape for two rounds before the r07 sweep
    * caught it.) This reader keys on the ANNOTATION instead: any NANOS
    * column is overridden to LongType — the exact epoch-nanos form
    * [[nanos]] dispatches — and the raw INT64 reads fine under the
    * explicit schema. No-op (plain inference) when the file has no nanos
    * column. */
  def readAdaptive(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val nano = nanosAnnotated(spark, path)
    if (nano.isEmpty) spark.read.parquet(path)
    else {
      val inferred = spark.read.parquet(path).schema
      val overridden = org.apache.spark.sql.types.StructType(inferred.map(f =>
        if (nano(f.name)) f.copy(dataType = LongType) else f))
      spark.read.schema(overridden).parquet(path)
    }
  }
}
