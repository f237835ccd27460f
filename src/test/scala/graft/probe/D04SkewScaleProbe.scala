package graft.probe

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Adversarial-scale runner for d04's hot-shingle hazard (VERDICT r17 #6):
  * the SHIPPED d04 query, end-to-end, on a skew-amplified corpus
  * (`make_skew_probe.py` — one 8-token hot span in 1% of documents), with
  * the salted escape off (plain) or on — one mode per JVM so each run
  * gets a fresh heap, matching the r17 ladder methodology.
  *
  * At ×1000 (5M docs, 50k hot) the plain path's six hot shingles emit
  * 6·C(50k,2) ≈ 7.5G join rows from six keys that AQE cannot split
  * (output skew, invisible to input-sized detection); the salted path
  * spreads them over nSalts tasks. This is the scale where the +51%
  * measured at ×100 becomes stall-or-finish.
  *
  * Run: sbt "Test/runMain graft.probe.D04SkewScaleProbe DIR plain|salted [nSalts] [hotMin]"
  * (SPARK_DRIVER_MEM and JAVA_TOOL_OPTIONS carry the single-box probe
  * accommodations — 64–96 GiB heap, zstd shuffle — exactly as the r17
  * ladder; none are product confs.)
  */
object D04SkewScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    val nSalts = args.lift(2).map(_.toInt).getOrElse(32)
    val hotMin = args.lift(3).map(_.toInt).getOrElse(1024)
    require(mode == "plain" || mode == "salted", s"mode plain|salted, got $mode")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (mode == "salted") {
      spark.conf.set("spark.graft.d04.salt", nSalts.toString)
      spark.conf.set("spark.graft.d04.salt.hotMin", hotMin.toString)
    }
    val t0 = System.nanoTime()
    val n = SparkEntry.queries("d04")(spark, dir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"D04SKEW dir=$dir mode=$mode nSalts=$nSalts hotMin=$hotMin " +
      f"rows=$n wall=$sec%.1f s")
    spark.stop()
  }
}
