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

  /** Per-user event-time state: `buf` holds arrivals still above the
    * watermark (their relative order can change until it passes), `open`
    * is the open session as 0 or 3 longs (start, last, count) — a flat
    * Seq, not Option[Tuple3], to keep the state encoder trivial. */
  final case class EtState(buf: Seq[(Long, Long)], open: Seq[Long])

  /** Watermarked OUT-OF-ORDER sessionization — the event-time twin of
    * [[sessionize]], same closed-session output and the same strict-`>`
    * gap contract, but tolerant of arrivals shuffled ACROSS micro-batches
    * (the reference's replication stream is explicitly asynchronous and
    * out-of-order; ts-keyed replay, `ReplicationSource.java:69`).
    *
    * Mechanism: arrivals buffer in state until the watermark passes their
    * event time — only then is their position in the user's timeline
    * final (Spark admits no row older than the watermark), so the gap
    * fold runs over SEALED events in exact `(ts, id)` nano order and its
    * output is identical to the batch query regardless of arrival order.
    * The open tail closes on event time too: once the watermark exceeds
    * `last + gap`, any future arrival must start a new session, so the
    * session is provably finished (an `EventTimeTimeout` wakes idle keys
    * for exactly that flush — a FINISHED session, not a forgotten key).
    * Arrivals later than `watermarkDelay` are dropped by Spark before
    * reaching the operator: that is the watermark contract's explicit
    * lateness bound, not silent corruption.
    *
    * State per user: the open-session triple plus the buffered arrivals
    * not yet sealed — bounded by `watermarkDelay` x that user's event
    * rate, independent of total stream length. `tsCol` stays a LONG of
    * epoch nanos end-to-end (exact arithmetic); the derived timestamp
    * column exists only to carry the watermark (ms resolution — sealing
    * compares against `watermarkMs * 1e6`, conservative by construction
    * because admitted rows always have `ts >= watermarkMs * 1e6`).
    */
  def sessionizeEventTime(stream: DataFrame, userCol: Column, tsCol: Column,
      idCol: Column, gapNanos: Long,
      watermarkDelay: java.time.Duration): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    stream
      .select(userCol.cast("long").as("_u"), tsCol.cast("long").as("_ts"),
        idCol.cast("long").as("_id"))
      // `div` = integral division: `/` on longs is DOUBLE division in Spark
      // SQL, and epoch-nanos (~1.7e18) exceed 2^53, so the double path is
      // inexact by up to ~1us — silently wrong even when tests pass
      .withColumn("_et", timestamp_micros(expr("_ts div 1000")))
      .withWatermark("_et", s"${watermarkDelay.toMillis} milliseconds")
      // the watermarked column must reach the grouped Dataset for
      // EventTimeTimeout to resolve; the fold itself never reads it
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EtState, (Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) { (u, rows, state) =>
        val wmMs = state.getCurrentWatermarkMs()
        val wmNanos = wmMs * 1000000L
        val st = state.getOption.getOrElse(EtState(Nil, Nil))
        val all = st.buf ++ rows.map(t => (t._2, t._3))
        // sealed = final-orderable: every future arrival has ts >= wmNanos
        val (done, pending) = all.partition(_._1 < wmNanos)
        val closed =
          scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var open: Option[(Long, Long, Long)] = st.open match {
          case Seq(s0, last, n) => Some((s0, last, n))
          case _ => None
        }
        for ((ts, _) <- done.sorted) open match {
          case Some((s0, last, n)) if ts - last <= gapNanos =>
            open = Some((s0, ts, n + 1))
          case Some((s0, last, n)) =>
            closed += ((u, s0, last, n))
            open = Some((ts, ts, 1L))
          case None =>
            open = Some((ts, ts, 1L))
        }
        // event-time close of the tail: pending rows all have
        // ts >= wmNanos > last + gap, so they'd start a new session anyway
        open match {
          case Some((s0, last, n)) if wmNanos > last + gapNanos =>
            closed += ((u, s0, last, n))
            open = None
          case _ => ()
        }
        if (open.isEmpty && pending.isEmpty) state.remove()
        else {
          state.update(EtState(pending,
            open.toSeq.flatMap(t => Seq(t._1, t._2, t._3))))
          // wake at the earliest ms where the watermark can unblock work:
          // sealing the oldest pending arrival, or closing the open tail
          val wake = (pending.map(_._1 / 1000000L + 1) ++
            open.map(t => (t._2 + gapNanos) / 1000000L + 1)).min
          state.setTimeoutTimestamp(math.max(wmMs + 1, wake))
        }
        closed.iterator
      }
      .toDF("user_id", "start_ts", "end_ts", "n_events")
  }
}
