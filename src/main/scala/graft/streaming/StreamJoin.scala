package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream event-time joins — both sides unbounded, matches emitted
  * as they become possible, state bounded by watermarks + the join's own
  * time-range condition (Spark derives each side's state retention from
  * them: a buffered left row can only match right rows inside
  * `[its ts, its ts + window]`, so once the right watermark passes that
  * horizon the row is dropped from state). This is the streaming face of
  * `Jobs.intervalJoin`; the batch and streaming paths are gated against
  * the SAME oracle so their semantics provably coincide.
  */
object StreamJoin {

  /** Inner join of two streams on key equality + `leftTs` inside
    * `[rightTs, rightTs + window]`. Timestamps are epoch-nanos longs (the
    * engine-wide cell clock); watermarking needs Spark TimestampType, so
    * both sides derive an event-time column via INTEGRAL `div` by 1000
    * (epoch-nanos exceed 2^53 — `/` is double division and would round
    * boundary micros; see StreamDedup.firstSeenEventTime).
    *
    * `watermarkDelay` is the out-of-orderness tolerated on each side;
    * state per side is O(rows inside watermark + window horizon), not the
    * stream. Self-joins (two filtered branches of one source) are fine —
    * the usual "action within N hours of trigger" correlation. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTs: Column, rightTs: Column,
      window: java.time.Duration,
      watermarkDelay: java.time.Duration): DataFrame = {
    val delay = s"${watermarkDelay.toMillis} milliseconds"
    val l = left.withColumn("_lts", leftTs)
      .withColumn("_levt", timestamp_micros(expr("_lts div 1000")))
      .withWatermark("_levt", delay)
    val r = right.withColumn("_rts", rightTs)
      .withColumn("_revt", timestamp_micros(expr("_rts div 1000")))
      .withWatermark("_revt", delay)
    l.join(r,
        leftKey === rightKey &&
          col("_levt") >= col("_revt") &&
          col("_levt") <= col("_revt") +
            expr(s"INTERVAL ${window.toMillis} MILLISECONDS"))
      .drop("_lts", "_levt", "_rts", "_revt")
  }
}
