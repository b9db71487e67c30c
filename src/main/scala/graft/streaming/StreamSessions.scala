package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the streaming face of the batch
  * `sessionize_events` window query (reference scope: event-log analytics
  * over the `events` table), for the live stream where "how many sessions
  * so far" must not wait for a nightly batch.
  *
  * Spark's built-in `session_window` closes sessions on WATERMARK
  * advance (new-session-at-gap boundary is `>=`); this operator uses
  * `flatMapGroupsWithState` (SURVEY §2 custom-state seam) to keep the
  * batch query's exact contract — a new session starts strictly AFTER
  * `gap` (diff > gap), ties within a batch ordered by `(ts, id)` — so a
  * single-batch replay reproduces the batch result row for row.
  */
object StreamSessions {

  /** Emit one row per CLOSED session: `(user_id, start_ts, end_ts,
    * n_events)`. A session closes when a later event of the same user
    * arrives more than `gapNanos` after the session's last event (same
    * strict-`>` rule as the batch window query), or — with `idleTimeout`
    * set — when the user goes idle in processing time, which flushes the
    * open session as output (unlike [[StreamDedup]]'s TTL, which merely
    * forgets; a session that times out is FINISHED, not forgotten).
    *
    * State is three longs per ACTIVE user (start, last-event ts, count) —
    * independent of event volume; the only exchange is the groupBy on
    * user. Events inside one micro-batch sort by `(ts, id)` before the
    * gap fold, so batch boundaries never reorder a user's timeline as
    * long as arrival respects event order across batches (out-of-order
    * ACROSS micro-batches belongs to the watermark variant Spark's
    * `session_window` provides; this operator is the deterministic
    * in-order contract).
    */
  def sessionize(stream: DataFrame, userCol: Column, tsCol: Column,
      idCol: Column, gapNanos: Long,
      idleTimeout: Option[java.time.Duration] = None): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    stream
      .select(userCol.cast("long").as("_u"), tsCol.cast("long").as("_ts"),
        idCol.cast("long").as("_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long, Long)](
        OutputMode.Append(), timeoutConf) { (u, rows, state) =>
        if (state.hasTimedOut) {
          val (s0, last, n) = state.get
          state.remove()
          Iterator.single((u, s0, last, n))
        } else {
          val sorted = rows.map(t => (t._2, t._3)).toArray.sorted
          val closed =
            scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
          var open = state.getOption // (start, last, n)
          for ((ts, _) <- sorted) open match {
            case Some((s0, last, n)) if ts - last <= gapNanos =>
              open = Some((s0, ts, n + 1))
            case Some((s0, last, n)) =>
              closed += ((u, s0, last, n))
              open = Some((ts, ts, 1L))
            case None =>
              open = Some((ts, ts, 1L))
          }
          open.foreach(state.update)
          idleTimeout.foreach(d => state.setTimeoutDuration(d.toMillis))
          closed.iterator
        }
      }
      .toDF("user_id", "start_ts", "end_ts", "n_events")
  }
}
