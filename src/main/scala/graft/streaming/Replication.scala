package graft.streaming

import graft.catalog.Catalog
import graft.core.Cell
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's WAL-shipping replication stream
  * (`hbase/replication/regionserver/ReplicationSource.java:69` tails WALs,
  * ships edit batches; `ReplicationSink` replays them) re-expressed as
  * Structured Streaming:
  *
  *  - the change feed is a directory of appended cell-batch parquet files
  *    (the WAL analog; every `Catalog.append` data dir is exactly such a
  *    batch);
  *  - the source is a file stream over that directory;
  *  - the sink merges each micro-batch into the target table via
  *    `foreachBatch` — at-least-once delivery with ts/seq-keyed idempotent
  *    replay (duplicate cells carry identical coordinates, so resolve's
  *    same-(coords,ts,seq) dedup makes reapplication a no-op), matching
  *    the reference's at-least-once + timestamp-idempotent contract.
  *
  * Checkpointing (the WAL position znode analog —
  * `ReplicationSourceManager` logPositions) is Spark's own checkpoint dir.
  */
object Replication {

  /** Open the change feed: an unbounded stream of cells. */
  def changeFeed(spark: SparkSession, feedDir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(Cell.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      // batches land as sub-directories (one per append, like WAL files)
      .option("recursiveFileLookup", "true")
      .parquet(feedDir)

  /** Ship the feed into a target catalog table. Returns the running query;
    * callers own its lifecycle. `nowMsOf` stamps each committed batch
    * deterministically from the batch id (no wall clock on executors). */
  def replicate(feed: DataFrame, catalog: Catalog, targetTable: String,
      checkpointDir: String, nowMsOf: Long => Long = identity): StreamingQuery =
    feed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          catalog.append(targetTable, batch, nowMsOf(batchId)): Unit
        }
      }
      .start()

  /** Streaming per-key latest-state view: the memstore-ish "current value
    * of every (row,family,qualifier)" maintained incrementally —
    * watermarked dedup + arbitrary stateful latest via flatMapGroups is
    * overkill; complete-mode max_by aggregation expresses it exactly. */
  def latestState(feed: DataFrame): DataFrame =
    feed
      .filter(col("kind") === graft.core.CellKind.Put)
      .groupBy(col("row"), col("family"), col("qualifier"))
      .agg(max_by(col("value"), struct(col("ts"), col("seq"))).as("value"),
        max(col("ts")).as("ts"))
}
