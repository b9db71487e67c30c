package graft
object Exp {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("32")
    val dir = "/root/testdata/sf0.1"
    val df = Queries.queries("page_filter_scan")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    println("[exp] ReusedExchange count: " +
      "ReusedExchange".r.findAllIn(plan).size)
    println("[exp] Exchange count: " + "Exchange".r.findAllIn(plan).size)
    println("[exp] Window count: " + "Window".r.findAllIn(plan).size)
    println("[exp] Scan parquet count: " + "Scan parquet".r.findAllIn(plan).size)
    spark.stop()
  }
}
