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
    * documented rather than silent. The TTL is PROCESSING-time on
    * purpose: dedup state is a "have I ever seen this key" bit with no
    * timeline semantics, so wall-clock idleness is the right eviction
    * clock even when events carry timestamps. An event-time TTL (evict
    * when the watermark passes `lastSeen + ttl`) only changes which
    * duplicates slip through on REPLAY of historic data — replays of
    * ts-keyed idempotent sinks (the reference's replication model)
    * tolerate re-emits by construction, so the extra watermark plumbing
    * buys nothing here; see `StreamSessions.sessionizeEventTime` for the
    * operator where event-time state transitions ARE semantic and the
    * watermark variant is real.
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
    * rather than silent). */
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
}
