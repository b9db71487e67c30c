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
    * documented rather than silent.
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
            Iterator.empty // duplicate sighting: suppress
          } else {
            val winner = rows.map(_._2).min
            state.update(true)
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            Iterator.single((k, winner))
          }
      }
      .toDF("key", "id")
  }
}
