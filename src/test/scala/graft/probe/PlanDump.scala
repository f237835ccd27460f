package graft.probe

/** Ad-hoc plan dumper: `Test/runMain graft.probe.PlanDump <code> [sfDir]`
  * prints the final (post-AQE) physical plan for one registry query —
  * the iterate-on-assertions loop behind every PlanSpec invariant.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val s = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(s, sf)
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    s.stop()
  }
}
