object PlanD15 {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("d15")(s, "/root/testdata/sf0.01")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGE_COUNT=" + "ReusedExchange".r.findAllIn(p).size)
    println("EXCHANGE_COUNT=" + "Exchange hashpartitioning".r.findAllIn(p).size)
    println("SCAN_COUNT=" + "Scan parquet".r.findAllIn(p).size)
    s.stop()
  }
}
