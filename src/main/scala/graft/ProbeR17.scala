package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Text}

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
    } else if (mode == "repetition") {
      // stage decomposition of repetitionSignals' per-row cost
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val t = col("text")
      val ts = Text.tokens(t)
      time("scan_only")(docs.select(t))
      time("tokens_size")(docs.select(size(ts).as("n")))
      time("tokens_distinct")(docs.select(size(array_distinct(ts)).as("n")))
      time("tokens_sort")(docs.select(size(array_sort(ts)).as("n")))
      time("kgrams2")(docs.select(size(Text.kgrams(t, 2)).as("n")))
      time("kgrams2_sort")(docs.select(
        size(array_sort(Text.kgrams(t, 2))).as("n")))
      time("mode_tokens")(docs.select(Text.probeModeCount(ts).as("n")))
      time("mode_bigrams")(docs.select(
        Text.probeModeCount(Text.kgrams(t, 2)).as("n")))
      // variants: mode over hashes (long/128-bit struct) instead of
      // strings; bigrams rebuilt from the token ATTRIBUTE instead of a
      // second regex pass over the text
      val tsA = col("_ts")
      def withTs(f: org.apache.spark.sql.Column) =
        docs.select(ts.as("_ts")).select(f.as("n"))
      // type-parameterized clone of Text.modeCount (the production one
      // pins a string accumulator)
      def modeP(arr: org.apache.spark.sql.Column, prevType: String) =
        aggregate(array_sort(arr),
          struct(lit(null).cast(prevType).as("prev"), lit(0L).as("run"),
            lit(0L).as("best")),
          (acc, x) => {
            val run = when(x <=> acc.getField("prev"),
              acc.getField("run") + 1L).otherwise(1L)
            struct(x.as("prev"), run.as("run"),
              greatest(acc.getField("best"), run).as("best"))
          },
          acc => acc.getField("best"))
      val h128 = "struct<h1:bigint,h2:bigint>"
      time("mode_tokens_h64")(withTs(
        modeP(transform(tsA, x => xxhash64(x)), "bigint")))
      time("mode_tokens_h128")(withTs(modeP(
        transform(tsA, x =>
          struct(xxhash64(x).as("h1"), xxhash64(lit(1L), x).as("h2"))),
        h128)))
      time("mode_bigrams_zipstr")(withTs(modeP(
        transform(sequence(lit(1), greatest(size(tsA) - 1, lit(0))),
          i => concat_ws(" ", element_at(tsA, i), element_at(tsA, i + 1))),
        "string")))
      time("mode_bigrams_ziph64")(withTs(modeP(
        transform(sequence(lit(1), greatest(size(tsA) - 1, lit(0))),
          i => xxhash64(element_at(tsA, i), element_at(tsA, i + 1))),
        "bigint")))
      time("mode_bigrams_ziph128")(withTs(modeP(
        transform(sequence(lit(1), greatest(size(tsA) - 1, lit(0))),
          i => struct(
            xxhash64(element_at(tsA, i), element_at(tsA, i + 1)).as("h1"),
            xxhash64(lit(1L), element_at(tsA, i),
              element_at(tsA, i + 1)).as("h2"))),
        h128)))
      time("repetition_full")(Text.repetitionSignals(docs, "doc_id"))
    } else if (mode == "spans") {
      // duplicateSpans hash-pass A/B: hash the joined gram STRING
      // (current) vs the token SLICE directly (no string build). The
      // exact recheck downstream makes the choice output-invariant.
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val k = 12
      val toks = docs
        .select(col("doc_id").as("id"), Text.tokens(col("text")).as("_ts"))
        .filter(size(col("_ts")) >= k)
      def hashPass(h: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
        toks.select(col("id"),
          posexplode(transform(sequence(lit(1), size(col("_ts")) - (k - 1)),
            i => h(slice(col("_ts"), i, lit(k))))))
          .select(col("id"), (col("pos") + 1).as("pos"), col("col").as("h"))
      time("hash_gram_string")(hashPass(sl => xxhash64(concat_ws(" ", sl))))
      time("hash_token_slice")(hashPass(sl => xxhash64(sl)))
      time("spans_full")(Dedup.duplicateSpans(docs, "doc_id", "text", k))
    } else if (mode == "curation") {
      // curation_pipeline dedup-stage A/B: the fingerprint SELF-JOIN
      // evaluates the whole quality+langid chain twice (groupBy side +
      // probe side); the window form (Dedup.keepFirst — the oracle's own
      // min-over-partition formulation) evaluates it once.
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      def english = {
        val quality = Text.qualitySignals(docs)
          .filter(col("n_tokens") >= 30 && col("stopword_ratio") > 0)
        Text.withLangId(quality, "text").filter(col("lang_guess") === "en")
      }
      def aggOf(canon: org.apache.spark.sql.DataFrame) = canon
        .groupBy(col("doc_id") % 7) // stand-in for the split agg
        .agg(count(lit(1)), sum("n_tokens"), min("doc_id"), max("doc_id"))
      time("upstream_once")(english)
      time("dedup_selfjoin")(aggOf {
        val fp = english.withColumn("_fp", md5(col("text")))
        fp.join(fp.groupBy("_fp").agg(min("doc_id").as("doc_id")),
          Seq("_fp", "doc_id"), "left_semi")
      })
      time("dedup_keepfirst")(aggOf(
        Dedup.keepFirst(english, md5(col("text")), "doc_id")))
    } else if (mode == "sort") {
      // does a global orderBy over an expression-heavy projection pay
      // the projection TWICE (range-partitioner sampling pass)?
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      def qual = Text.qualitySignals(docs)
        .withColumn("bpeish_tokens", Text.tokenCountBpeIsh(col("text")))
        .withColumn("avg_token_len",
          when(col("n_tokens") > 0, col("avg_token_len")).otherwise(0.0))
        .select("doc_id", "n_tokens", "avg_token_len", "punct_ratio",
          "stopword_ratio", "bpeish_tokens")
      time("quality_nosort")(qual)
      time("quality_orderby")(qual.orderBy("doc_id"))
      time("quality_ckpt_orderby")(qual.localCheckpoint().orderBy("doc_id"))
      def rep = Text.repetitionSignals(docs, "doc_id")
        .select("doc_id", "n_tokens", "dup_token_frac", "top_bigram_frac",
          "max_token_rep")
      time("rep_nosort")(rep)
      time("rep_orderby")(rep.orderBy("doc_id"))
      time("rep_ckpt_orderby")(rep.localCheckpoint().orderBy("doc_id"))
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
