package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

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
    * the usual "action within N hours of trigger" correlation.
    *
    * `joinType` accepts Spark's stream-stream-supported outer forms
    * (`left_outer`/`right_outer`/`full_outer`): an unmatched row emits
    * with nulls only once the other side's watermark proves no match can
    * still arrive — i.e. outer results are delayed by the watermark,
    * inner results are not. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTs: Column, rightTs: Column,
      window: java.time.Duration,
      watermarkDelay: java.time.Duration,
      joinType: String = "inner"): DataFrame = {
    val delay = s"${watermarkDelay.toMillis} milliseconds"
    val l = left.withColumn("_lts", leftTs)
      .withColumn("_levt", timestamp_micros(expr("_lts div 1000")))
      .withWatermark("_levt", delay)
    val r = right.withColumn("_rts", rightTs)
      .withColumn("_revt", timestamp_micros(expr("_rts div 1000")))
      .withWatermark("_revt", delay)
    // State retention derives from the event-time (micros) conjuncts; the
    // raw-nano conjuncts are residuals that make the match EXACTLY the
    // batch `Jobs.intervalJoin` nanos semantics (the micro-truncated
    // condition alone could match sub-microsecond deltas at window
    // boundaries that batch rejects). The nano conjuncts imply the micro
    // ones (window is whole millis), so they only tighten.
    l.join(r,
        leftKey === rightKey &&
          col("_levt") >= col("_revt") &&
          col("_levt") <= col("_revt") +
            expr(s"INTERVAL ${window.toMillis} MILLISECONDS") &&
          col("_lts") >= col("_rts") &&
          col("_lts") <= col("_rts") + lit(window.toNanos),
        joinType)
      .drop("_lts", "_levt", "_rts", "_revt")
  }

  /** Per-key as-of state: unsealed left/right arrivals as (ts, id) pairs,
    * and the compacted latest sealed right as 0 or 2 longs (ts, id) — a
    * flat Seq for a trivial state encoder (the EtState trick). */
  final case class AsOfState(lbuf: Seq[(Long, Long)], rbuf: Seq[(Long, Long)],
      rlatest: Seq[Long])

  /** Streaming EVENT-TIME as-of join — the streaming face of
    * [[graft.jobs.Jobs.asOfJoin]] (the reference's closest-row-before
    * lookup, `Store.getRowKeyAtOrBefore`): every left row emits exactly
    * once with the LATEST right row of the same key at-or-before its
    * event time, tolerant of out-of-order arrival across micro-batches.
    * Spark's built-in stream-stream joins cannot express "latest before"
    * (it is an ordering fold, not a range predicate), so this rides the
    * custom-state seam like `StreamSessions.sessionizeEventTime`.
    *
    * Mechanism: both sides buffer in per-key state until the watermark
    * passes their event time. A left row at `t` seals once `wm > t`: no
    * right row at-or-before `t` can still arrive (it would be older than
    * the watermark and dropped), so its match is final. Sealed rights
    * COMPACT to the single latest (ts, id): every left still unsealed
    * has `t >= wm` and only the latest sealed right can win for it —
    * state per key is the delay-bounded buffers plus two longs, and the
    * two longs are the operator's semantic floor (the as-of relation
    * itself: a right row must remain matchable forever, exactly like a
    * stored table's latest version). Ties at equal right ts break to the
    * larger id — deterministic where the batch window's tie order is
    * not. Emits `(key, left_id, left_ts, match_id)` with a null match
    * when no right precedes.
    *
    * COMPLETENESS CONTRACT: a left row at event time `t` seals (emits)
    * only once the watermark strictly passes `t`. "Every left row emits
    * exactly once" therefore requires the watermark to eventually advance
    * past every left event time — in a live stream that happens as newer
    * data arrives; at end of input the caller must push a final batch
    * whose event times exceed max(left ts) + watermarkDelay (the gates'
    * far-future sentinel pattern). Rows at or beyond a permanently
    * stalled watermark stay pending in state and never emit. */
  def asOfJoinEventTime(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTs: Column, rightTs: Column,
      leftId: Column, rightId: Column,
      watermarkDelay: java.time.Duration): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    def side(df: DataFrame, k: Column, ts: Column, id: Column, tag: Int) =
      df.select(k.cast("long").as("_k"), lit(tag).as("_side"),
        ts.cast("long").as("_ts"), id.cast("long").as("_id"))
    val merged = side(left, leftKey, leftTs, leftId, 1)
      .unionByName(side(right, rightKey, rightTs, rightId, 0))
      .withColumn("_et", timestamp_micros(expr("_ts div 1000")))
      .withWatermark("_et", s"${watermarkDelay.toMillis} milliseconds")
    merged
      .as[(Long, Int, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsOfState, (Long, Long, Long, Option[Long])](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) { (k, rows, state) =>
        val wmNanos = state.getCurrentWatermarkMs() * 1000000L
        val st = state.getOption.getOrElse(AsOfState(Nil, Nil, Nil))
        val arrivals = rows.toArray
        val ls = st.lbuf ++ arrivals.iterator.filter(_._2 == 1).map(r => (r._3, r._4))
        val rs = st.rbuf ++ arrivals.iterator.filter(_._2 == 0).map(r => (r._3, r._4))
        val (sealedL, pendL) = ls.partition(_._1 < wmNanos)
        val (sealedR, pendR) = rs.partition(_._1 < wmNanos)
        val rlatest0 = st.rlatest match {
          case Seq(ts, id) => Some((ts, id))
          case _ => None
        }
        // every candidate here is < wm <= any future left's ts, so the
        // lexicographic max is the only one that can ever win again
        val rAll = sealedR ++ rlatest0
        val out = sealedL.sorted.iterator.map { case (t, lid) =>
          val m = rAll.filter(_._1 <= t) // rlatest is < an older wm <= t, but guard anyway
          (k, lid, t, if (m.isEmpty) None else Some(m.max._2))
        }.toVector
        val rlatest1 = if (rAll.isEmpty) None else Some(rAll.max)
        if (pendL.isEmpty && pendR.isEmpty && rlatest1.isEmpty) state.remove()
        else {
          state.update(AsOfState(pendL, pendR,
            rlatest1.toSeq.flatMap(t => Seq(t._1, t._2))))
          // wake when the watermark can seal the oldest pending row; a key
          // holding only the compacted right needs no timer (2 longs is
          // the operator's steady state, like a stored latest version)
          val pend = pendL ++ pendR
          if (pend.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1,
                pend.map(_._1 / 1000000L + 1).min))
        }
        out.iterator
      }
      .toDF("key", "left_id", "left_ts", "match_id")
  }
}
