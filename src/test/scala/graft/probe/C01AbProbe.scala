package graft.probe

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Round-22 A/B (VERDICT r21 #4): c01's keeper attachment — groupBy+join
  * (2 corpus scans, full-row shuffle once `keep` outgrows broadcast) vs
  * window-min over one narrow-row exchange (1 scan, text never shuffled).
  * Interleaved min-of-N per mode at the given dir; run at sf0.1 AND a ×10
  * rung (scripts/make_scale_probe.py) — the ×10 rung is where the join
  * form's `keep` frame stops broadcasting and the structural difference
  * prices in.
  *
  * Run: sbt "Test/runMain graft.probe.C01AbProbe DIR [reps]"
  */
object C01AbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(mode: String): Double = {
      spark.conf.set("spark.graft.c01.keeper", mode)
      val t0 = System.nanoTime()
      SparkEntry.queries("c01")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once("join"); once("window") // warmup both plans
    val results = (1 to reps).flatMap { _ =>
      Seq("join" -> once("join"), "window" -> once("window"))
    }
    results.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (m, rs) =>
      val ts = rs.map(_._2)
      println(f"[c01ab] $m%-6s min=${ts.min}%.3f median=${ts.sorted.apply(ts.size / 2)}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.conf.unset("spark.graft.c01.keeper")
    spark.stop()
  }
}
