package graft.probe

import org.apache.spark.sql.SparkSession

/** Final-plan dumper for d04's ENGAGED salted shape: runs the product
  * d04 on a (skew-amplified) corpus with the salt conf on and prints the
  * post-AQE executed plan, INSET literal lists elided. The
  * barrier-attribution companion of [[PlanDump]] — timing says WHAT
  * (D04BarrierProbe), this says WHY (is the salt exchange reused? where
  * did the a-side filter land? is there a CollectMetrics boundary?).
  *
  * Run: sbt "Test/runMain graft.probe.D04SaltPlanDump DIR BARRIER [nSalts] [hotMin]"
  */
object D04SaltPlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val barrier = args(1)
    val nSalts = args.lift(2).getOrElse("32")
    val hotMin = args.lift(3).getOrElse("1024")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.d04.salt", nSalts)
    spark.conf.set("spark.graft.d04.salt.hotMin", hotMin)
    if (barrier != "default")
      spark.conf.set("spark.graft.d04.salt.barrier", barrier)
    val df = graft.SparkEntry.queries("d04")(spark, dir)
    // collect, not count: count() wraps df in a separate aggregate query
    // and leaves THIS queryExecution unexecuted — the dump would show the
    // initial isFinalPlan=false plan, where duplicate exchanges are
    // normal and ReusedExchange never appears (AQE reuses at runtime)
    val n = df.collect().length
    val p = df.queryExecution.executedPlan.toString
      .replaceAll("IN \\([^)]{40,}\\)", "IN (..)")
      .replaceAll("INSET [-0-9, ]{40,}", "INSET ..")
    println(s"==== d04 barrier=$barrier rows=$n ====")
    println(p)
    spark.stop()
  }
}
