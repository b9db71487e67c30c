package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.pipeline.Text

/** Scratch A/B probes for round 17 (instrumentation only — never part of
  * any query path): token-count expression A/Bs, and a Spark JOB COUNT
  * for the cell queries proving the tombstone probe job is gone when
  * write-side store stats are present (VERDICT r16 #4 done criterion).
  *
  * Usage: runMain graft.ProbeR17 [tokens|jobs] */
object ProbeR17 {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("jobs")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-24s ${ts.min}%.3f s (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    if (mode == "tokens") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val t = col("text")
      val oldTokens = filter(split(trim(t), "\\s+"), x => x =!= "")
      time("scan_only")(docs.select(t))
      time("count_split_old")(docs.select(size(oldTokens).as("n")))
      time("count_regex_new")(docs.select(regexp_count(t, lit("\\S+")).as("n")))
      time("bpeish_old")(docs.select(
        (aggregate(transform(oldTokens, x => ceil(length(x) / lit(4.0))),
          lit(0L), (acc, x) => acc + x.cast("long")) +
          length(regexp_replace(t, "[^.,!?;:]", ""))).cast("long").as("n")))
      time("bpeish_new")(docs.select(Text.tokenCountBpeIsh(t).as("n")))
      time("quality_cur")(Text.qualitySignals(docs))
      time("langid_cur")(Text.withLangId(docs, "text"))
    } else {
      // JOB COUNT per cell query: jobs fired during plan CONSTRUCTION
      // (where the tombstone probe lived) and during execution. Run
      // twice: with the fixture stores' _GRAFT_STATS present (stats
      // path, expect 0 construction jobs) and after deleting them
      // (probe fallback, expect 1+ construction jobs per resolve).
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit =
          counter.incrementAndGet(): Unit
      })
      def drain(): Unit = { Thread.sleep(300) } // let the listener bus settle
      for (n <- Seq("versions_latest", "row_counter", "scan_range_filter",
          "page_filter_scan", "sql_agg_pushdown")) {
        Queries.all.find(_.name == n).foreach { q =>
          // fixture store build (first touch) is outside the measurement
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          drain(); counter.set(0)
          val df = q.run(spark, sfDir) // construction only
          drain()
          val constructionJobs = counter.get()
          df.write.format("noop").mode("overwrite").save()
          drain()
          val totalJobs = counter.get()
          println(s"[jobs] $n construction=$constructionJobs " +
            s"execution=${totalJobs - constructionJobs}")
        }
      }
    }
    spark.stop()
  }
}
