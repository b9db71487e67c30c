package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Text

/** Stage-timing probe (optimization-round instrumentation, guide §1):
  * times individual pipeline stages through the noop sink so hot spots
  * are attributed to operators, not whole queries. Harness only — never
  * part of a query path. */
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
    spark.stop()
  }
}
