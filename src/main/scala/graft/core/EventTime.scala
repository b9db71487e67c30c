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
}
