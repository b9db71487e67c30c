package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session configuration, so the Verify/Bench
  * mains and the test harness agree.
  *
  *  - timeZone UTC: makes NTZ<->instant casts identity, plans deterministic.
  *  - nanosAsLong: parquet timestamp[ns] has no Spark type; with this flag a
  *    ns-unit corpus reads as LongType epoch-nanos instead of erroring. The
  *    engine does NOT assume any particular unit — `graft.core.EventTime`
  *    dispatches on the actual column type at ingest (ns-as-long, us/ms NTZ,
  *    instant timestamps all normalize to the same epoch-nanos cell ts).
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
