package graft

import org.apache.spark.sql.execution.ExplainMode

/** Harness: dump `.explain("formatted")` for named battery queries to
  * `<outDir>/<name>.txt` (all bench queries when no names given). Used by
  * the optimization rounds to commit before/after physical plans — plan
  * evidence only, never part of any query path.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [query ...]
  * writes <outDir>/<name>_<suffix>.txt (suffix e.g. "before"/"after").
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query ...]")
    val outDir = new java.io.File(args(0))
    val suffix = args(1)
    outDir.mkdirs()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    val names =
      if (args.length > 2) args.drop(2).toSeq else Queries.benchNames
    val mode = ExplainMode.fromString("formatted")
    names.foreach { n =>
      Queries.all.find(_.name == n) match {
        case Some(q) =>
          val txt =
            try q.run(spark, sfDir).queryExecution.explainString(mode)
            catch { case scala.util.control.NonFatal(e) =>
              s"EXPLAIN FAILED: ${e}"
            }
          val f = new java.io.File(outDir, s"${n}_$suffix.txt")
          val w = new java.io.PrintWriter(f, "UTF-8")
          try w.write(txt) finally w.close()
          println(s"[plandump] wrote $f")
        case None => System.err.println(s"[plandump] unknown query: $n")
      }
    }
    spark.stop()
  }
}
