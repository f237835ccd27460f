package graft.probe
import org.apache.spark.sql.SparkSession
object LoadCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // warm: JVM + FS
    graft.Tables.load(spark, dir, "lineitem").count()
    for (t <- Seq("lineitem", "documents", "orders", "events")) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 20) { graft.Tables.load(spark, dir, t); i += 1 }
      println(f"[loadcost] $t%-10s ${(System.nanoTime()-t0)/20e6}%8.2f ms/load")
    }
    // and a full registerViews
    val t1 = System.nanoTime()
    graft.Tables.registerViews(spark, dir)
    println(f"[loadcost] registerViews ${(System.nanoTime()-t1)/1e6}%8.2f ms")
    spark.stop()
  }
}
