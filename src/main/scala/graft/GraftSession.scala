package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session configuration, so the Verify/Bench
  * mains and the test harness agree.
  *
  *  - timeZone UTC: makes NTZ<->instant casts identity, plans deterministic.
  *  - nanosAsLong: parquet timestamp[ns] (events.ts) has no Spark type;
  *    read it as LongType epoch-nanos and treat it as the cell timestamp.
  *  - AQE on: runtime coalescing + skew-join handling — the 100 TB posture.
  *  - shuffle.partitions = cores locally; a real cluster deployment would
  *    size this to 2-3x total cores (AQE coalesces the rest).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")

  def local(cpus: String): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
