package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication for a continuously-ingested corpus —
  * the streaming face of `pipeline.Dedup.exact` (reference scope: the
  * LLM-pipeline operators over `documents`; the batch side's
  * first-seen/min-id contract, applied to an unbounded arrival stream).
  *
  * Spark's built-in `dropDuplicates` on a stream keeps an ARBITRARY row
  * per key within a micro-batch; this operator uses
  * `flatMapGroupsWithState` (SURVEY §2 custom-state seam) to make the
  * choice deterministic: the winner of a key is the MINIMUM id among the
  * rows of the first micro-batch that contains the key, and every later
  * sighting is suppressed by a one-bit GroupState.
  */
object StreamDedup {

  /** Emit exactly one `(key, id)` row per distinct key — the min id of
    * the key's first micro-batch — and nothing on re-sighting.
    *
    * `key` is any deterministic expression (castable to string). At
    * scale, pass a HASH of the content (`md5(col("text"))`), not the
    * content itself: the key is both shuffled (for grouping) and held in
    * the state store, so 16 opaque bytes beat a 100 KB document. State is
    * one boolean per distinct key — the minimum any exact streaming dedup
    * can hold.
    *
    * `stateTtl`: optional processing-time expiry for bounded state on
    * unbounded key cardinality (the 100 TB lever — without it the state
    * store grows with every distinct document forever). A key seen again
    * after its TTL re-emits: the standard recall-for-memory trade,
    * documented rather than silent. This variant's TTL is
    * PROCESSING-time: wall-clock idleness evicts, which is the right
    * clock for a live ingest feed. For REPLAY of historic data, which
    * duplicates slip through then depends on replay speed — when the
    * corpus build must be reproducible, use [[firstSeenEventTime]],
    * whose eviction clock is the data's own timeline (the same
    * watermark contract as `StreamSessions.sessionizeEventTime`).
    *
    * Output mode must be Append (the only mode
    * `flatMapGroupsWithState(Append)` supports downstream). */
  def firstSeen(stream: DataFrame, key: Column, id: Column,
      stateTtl: Option[java.time.Duration] = None): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    stream
      .select(key.cast("string").as("_k"), id.cast("long").as("_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append(), timeoutConf) {
        (k: String, rows: Iterator[(String, Long)], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove() // expired idle key: forget, allow re-emit later
            Iterator.empty
          } else if (state.exists) {
            // duplicate sighting: suppress — but RE-ARM the TTL. Spark
            // cancels a group's pending timeout on any invocation that
            // does not set one again (GroupStateImpl never carries the
            // old timestamp forward), so without this a key ever seen
            // twice would keep its state forever — the exact unbounded
            // growth stateTtl exists to prevent. Re-arming also gives
            // TTL its natural meaning: idle-time since LAST sighting.
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            Iterator.empty
          } else {
            val winner = rows.map(_._2).min
            state.update(true)
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            Iterator.single((k, winner))
          }
      }
      .toDF("key", "id")
  }

  /** [[firstSeen]] with an EVENT-time TTL: a key's state expires when the
    * WATERMARK passes `lastSeen + ttl`, where `lastSeen` is the key's max
    * event time so far — so eviction (and therefore which re-sightings
    * re-emit) is a deterministic function of the data and its arrival
    * order, independent of wall clock. Replaying a historic feed through
    * the same micro-batches reproduces the exact same output — the
    * property a versioned training-corpus build needs, and the one the
    * processing-time variant cannot give (replay speed would change the
    * evictions).
    *
    * `ts` is epoch NANOS (the cell-timestamp unit; `EventTime.normalize`
    * upstream makes any source unit land here). Same watermark contract
    * as `StreamSessions.sessionizeEventTime`: `watermarkDelay` bounds
    * out-of-order arrival; rows later than the delay may be dropped by
    * the engine before they reach the state function. State per key: one
    * long (last-seen event time) — same O(1)/key posture as [[firstSeen]].
    *
    * Out-of-order arrival WITHIN the TTL is handled exactly like
    * [[firstSeen]]: re-sightings suppress and push `lastSeen` forward
    * (never backward — `max`), so a late straggler cannot shorten a
    * key's retention. */
  def firstSeenEventTime(stream: DataFrame, key: Column, id: Column,
      ts: Column, ttl: java.time.Duration,
      watermarkDelay: java.time.Duration): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    stream
      .select(key.cast("string").as("_k"), id.cast("long").as("_id"),
        ts.cast("long").as("_ts"))
      // same nanos->micros derivation as sessionizeEventTime — integral
      // `div`, because `/` on longs is double division and epoch-nanos
      // exceed 2^53 (inexact by up to ~1us on the watermark clock)
      .withColumn("_evt", timestamp_micros(expr("_ts div 1000")))
      .withWatermark("_evt", s"${watermarkDelay.toMillis} milliseconds")
      .as[(String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: String, rows: Iterator[(String, Long, Long, java.sql.Timestamp)],
            state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove() // watermark passed lastSeen + ttl: forget
            Iterator.empty
          } else {
            val batch = rows.toVector
            val batchMax = batch.map(_._3).max
            val lastSeen = math.max(state.getOption.getOrElse(Long.MinValue),
              batchMax)
            val first = !state.exists
            state.update(lastSeen)
            // deadline in the WATERMARK's clock (ms); EventTimeTimeout
            // requires a timestamp strictly beyond the current watermark
            val deadlineMs = lastSeen / 1000000L + ttl.toMillis
            state.setTimeoutTimestamp(
              math.max(deadlineMs, state.getCurrentWatermarkMs() + 1L))
            if (first) Iterator.single((k, batch.map(_._2).min))
            else Iterator.empty
          }
      }
      .toDF("key", "id")
  }

  /** Streaming NEAR-dup candidate generation: each arriving document
    * probes the set of previously-seen documents sharing any LSH band
    * bucket — the streaming face of `Dedup.minhashLshPairs`' banded
    * join, for the continuously-ingested corpus where "dedup the new
    * docs against everything seen so far" is the actual requirement.
    *
    * `bandBuckets` is any per-row bucket array (e.g.
    * `VectorFunctions.minHashBands(sh, bands, rows)` — a narrow compiled
    * expression, streaming-safe). State per (band, bucket) key: the ids
    * seen in that bucket, capped at `maxBucketSize`. A full bucket
    * FREEZES — later arrivals in it emit no pairs and are not remembered
    * (the streaming analog of the batch `maxBucketSize` cap; a batch job
    * drops the hot bucket retroactively, a stream cannot un-emit, so it
    * stops instead — same bounded-state, bounded-output posture, recall
    * note and all. A degenerate hot bucket — empty docs, all-zero
    * vectors — would otherwise grow state AND emit O(n^2) pairs).
    *
    * Emits `(id_a, id_b)` with `id_a < id_b`; the SAME pair can surface
    * from several bands (and several batches if a doc re-arrives):
    * downstream dedups with `distinct()` and verifies with the exact
    * measure, exactly like the batch path — candidates are approximate,
    * emitted similarity never is. Batch-internal order is made
    * deterministic by processing each batch's ids in ascending order.
    *
    * `stateTtl`: optional idle-time expiry per bucket (re-armed on every
    * sighting) — the bucket-COUNT lever: `maxBucketSize` bounds each
    * bucket, but a stream of ever-new content mints ever-new buckets, so
    * without a TTL the state store still grows forever. An expired
    * bucket forgets its members; docs arriving after the expiry no
    * longer pair with them (the recall-for-memory trade, documented
    * rather than silent). This variant's TTL is PROCESSING-time; for
    * replay determinism use [[lshCandidatesEventTime]]. */
  def lshCandidates(stream: DataFrame, id: Column, bandBuckets: Column,
      maxBucketSize: Int = 64,
      stateTtl: Option[java.time.Duration] = None): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat_ws, posexplode}
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    stream
      .select(id.cast("long").as("_id"),
        posexplode(bandBuckets).as(Seq("_band", "_bucket")))
      .select(concat_ws(" ", col("_band"), col("_bucket")).as("_k"),
        col("_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Long], (Long, Long)](
        OutputMode.Append(), timeoutConf) {
        (k: String, rows: Iterator[(String, Long)],
            state: GroupState[Seq[Long]]) =>
          if (state.hasTimedOut) {
            state.remove() // idle bucket expired: forget its members
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(Seq.empty[Long]).toVector
            // O(1) membership probes (re-sightings that emit nothing
            // shouldn't pay a bucket-length scan each)
            val member = scala.collection.mutable.HashSet(seen: _*)
            val out = Vector.newBuilder[(Long, Long)]
            rows.map(_._2).toVector.sorted.distinct.foreach { nid =>
              if (seen.length < maxBucketSize && !member.contains(nid)) {
                seen.foreach(p =>
                  out += ((math.min(p, nid), math.max(p, nid))))
                seen = seen :+ nid
                member += nid
              } // else: frozen bucket (or re-sighting) — no pairs, no growth
            }
            state.update(seen)
            // re-arm on every sighting (see firstSeen: an un-set timeout
            // is CANCELLED, not carried forward)
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            out.result().iterator
          }
      }
      .toDF("id_a", "id_b")
  }

  /** [[lshCandidates]] with an EVENT-time TTL — the same replay-determinism
    * upgrade [[firstSeenEventTime]] gives [[firstSeen]]: a bucket's members
    * are forgotten when the WATERMARK passes `lastSeen + ttl` (lastSeen =
    * the bucket's max event time so far), so which candidate pairs a
    * replayed feed emits is a function of the data and its batch order
    * alone, independent of replay speed. A versioned corpus build that
    * near-dedups its ingest stream needs exactly this: re-running the
    * build must reproduce the same candidate set.
    *
    * `ts` is epoch NANOS (`EventTime.normalize` upstream); watermark
    * contract as [[firstSeenEventTime]]. State per (band, bucket): the
    * member ids (capped at `maxBucketSize` — full buckets freeze, see
    * [[lshCandidates]]) plus one lastSeen long. */
  def lshCandidatesEventTime(stream: DataFrame, id: Column,
      bandBuckets: Column, ts: Column, ttl: java.time.Duration,
      watermarkDelay: java.time.Duration,
      maxBucketSize: Int = 64): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat_ws, expr, posexplode, timestamp_micros}
    stream
      .select(id.cast("long").as("_id"), ts.cast("long").as("_ts"),
        posexplode(bandBuckets).as(Seq("_band", "_bucket")))
      .select(concat_ws(" ", col("_band"), col("_bucket")).as("_k"),
        col("_id"), col("_ts"))
      // integral `div` (see firstSeenEventTime): epoch-nanos exceed 2^53
      .withColumn("_evt", timestamp_micros(expr("_ts div 1000")))
      .withWatermark("_evt", s"${watermarkDelay.toMillis} milliseconds")
      .as[(String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Seq[Long]), (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: String, rows: Iterator[(String, Long, Long, java.sql.Timestamp)],
            state: GroupState[(Long, Seq[Long])]) =>
          if (state.hasTimedOut) {
            state.remove() // watermark passed lastSeen + ttl: forget members
            Iterator.empty
          } else {
            val batch = rows.toVector
            val (prevLast, prevSeen) =
              state.getOption.getOrElse((Long.MinValue, Seq.empty[Long]))
            var seen = prevSeen.toVector
            val member = scala.collection.mutable.HashSet(seen: _*)
            val out = Vector.newBuilder[(Long, Long)]
            batch.map(_._2).sorted.distinct.foreach { nid =>
              if (seen.length < maxBucketSize && !member.contains(nid)) {
                seen.foreach(p =>
                  out += ((math.min(p, nid), math.max(p, nid))))
                seen = seen :+ nid
                member += nid
              } // else: frozen bucket (or re-sighting) — no pairs, no growth
            }
            // lastSeen only moves FORWARD: a late straggler cannot shorten
            // the bucket's retention (same max rule as firstSeenEventTime)
            val lastSeen = math.max(prevLast, batch.map(_._3).max)
            state.update((lastSeen, seen))
            val deadlineMs = lastSeen / 1000000L + ttl.toMillis
            state.setTimeoutTimestamp(
              math.max(deadlineMs, state.getCurrentWatermarkMs() + 1L))
            out.result().iterator
          }
      }
      .toDF("id_a", "id_b")
  }
}
