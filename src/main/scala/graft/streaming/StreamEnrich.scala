package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Stream-static enrichment: join a stream against a slowly-changing
  * dimension. Spark's stream-static join is stateless — the static side
  * is re-planned per micro-batch (so a dimension backed by a catalog
  * table picks up its latest committed state batch-by-batch), and no
  * watermark or state store is involved.
  *
  * The operator's one scale decision is the join distribution:
  * `broadcastDim = true` (default) ships the dimension to every executor
  * once per batch and keeps the stream side un-shuffled — right whenever
  * the dimension fits the broadcast budget (the usual case: user/item/
  * tenant attributes against an event firehose). Set it false for a
  * dimension too large to broadcast; the join then shuffles each
  * micro-batch by the key, which at high event rates is the cost to
  * watch.
  */
object StreamEnrich {

  def enrich(stream: DataFrame, dim: DataFrame,
      streamKey: Column, dimKey: Column,
      joinType: String = "inner",
      broadcastDim: Boolean = true): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    stream.join(d, streamKey === dimKey, joinType)
  }
}
