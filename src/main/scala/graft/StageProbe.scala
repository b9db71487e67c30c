package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Text}

/** Scratch stage-timing probe (optimization round instrumentation). */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("scan_only")(docs)
    time("tokens_size")(docs.select(size(Text.tokens(col("text")))))
    time("quality")(Text.qualitySignals(docs))
    time("langid")(Text.withLangId(docs, "text"))
    time("quality+langid")(Text.withLangId(Text.qualitySignals(docs), "text"))
    time("md5")(docs.select(md5(col("text"))))
    time("kgrams2")(docs.select(explode(Text.kgrams(col("text"), 2))))
    time("repetition")(Text.repetitionSignals(docs, "doc_id"))
    time("tokens_explode")(docs.select(col("doc_id"),
      explode(Text.tokens(col("text")))))
    // candidate: per-row mode counts via sorted-array HOF (no shuffle)
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.types._
    def modeCount(arr: Column): Column =
      aggregate(array_sort(arr),
        struct(lit(null).cast(StringType).as("prev"), lit(0L).as("run"),
          lit(0L).as("best")),
        (acc, x) => {
          val run = when(x <=> acc.getField("prev"),
            acc.getField("run") + 1L).otherwise(1L)
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
    def repHof(d: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      d.withColumn("_rts", Text.tokens(col("text")))
        .withColumn("_bg", Text.kgrams(col("text"), 2))
        .withColumn("n_tokens", size(col("_rts")).cast("long"))
        .withColumn("dup_token_frac",
          when(col("n_tokens") > 0,
            (col("n_tokens") - size(array_distinct(col("_rts"))))
              .cast("double") / col("n_tokens")).otherwise(lit(0.0)))
        .withColumn("top_bigram_frac",
          when(size(col("_bg")) > 0,
            modeCount(col("_bg")).cast("double") / size(col("_bg")))
            .otherwise(lit(0.0)))
        .withColumn("max_token_rep",
          when(col("n_tokens") > 0, modeCount(col("_rts"))).otherwise(lit(0L)))
        .drop("_rts", "_bg")
    time("repetition_hof")(repHof(docs))
    val a = Text.repetitionSignals(docs, "doc_id")
      .select("doc_id", "n_tokens", "dup_token_frac", "top_bigram_frac",
        "max_token_rep")
    val b = repHof(docs)
      .select("doc_id", "n_tokens", "dup_token_frac", "top_bigram_frac",
        "max_token_rep")
    println(s"[stage] rep_diff=${a.exceptAll(b).count()} + ${b.exceptAll(a).count()}")
    spark.stop()
  }
}
