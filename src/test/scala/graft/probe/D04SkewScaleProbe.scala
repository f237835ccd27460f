package graft.probe

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Adversarial-scale runner for d04's hot-shingle hazard (VERDICT r17 #6):
  * the SHIPPED d04 query, end-to-end, on a skew-amplified corpus
  * (`make_skew_probe.py` — one 8-token hot span in 1% of documents),
  * plain (salt conf unset) vs salted, INTERLEAVED inside one warmed
  * session: single-shot JVM-inclusive timings on this container are
  * ±10% ambient noise, which swallows the ×100 penalty entirely —
  * alternation inside one JVM is the r17 methodology that resolved it.
  *
  * At ×1000 (5M docs, 50k hot) the plain path's six hot shingles emit
  * 6·C(50k,2) ≈ 7.5G join rows from six keys that AQE cannot split
  * (output skew, invisible to input-sized detection); the salted path
  * spreads them over nSalts tasks.
  *
  * Run: sbt "Test/runMain graft.probe.D04SkewScaleProbe DIR [reps] [nSalts] [hotMin]"
  * (SPARK_DRIVER_MEM and JAVA_TOOL_OPTIONS carry the single-box probe
  * accommodations — 64–96 GiB heap, zstd shuffle — exactly as the r17
  * ladder; none are product confs.)
  */
object D04SkewScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val nSalts = args.lift(2).map(_.toInt).getOrElse(32)
    val hotMin = args.lift(3).map(_.toInt).getOrElse(1024)
    // warmup mode: at x1000-skewed a PLAIN warmup is itself the ~25-min
    // single-task stall — warm with the salted plan there instead
    val warmupMode = args.lift(4).getOrElse("plain")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(mode: String): (Long, Double) = {
      if (mode == "salted") {
        spark.conf.set("spark.graft.d04.salt", nSalts.toString)
        spark.conf.set("spark.graft.d04.salt.hotMin", hotMin.toString)
      } else {
        spark.conf.unset("spark.graft.d04.salt")
        spark.conf.unset("spark.graft.d04.salt.hotMin")
      }
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("d04")(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      (n, sec)
    }

    // warmup: parquet footers, codegen, scan cache — not timed as a rep
    val (nw, tw) = run(warmupMode)
    println(f"D04SKEW dir=$dir warmup $warmupMode rows=$nw wall=$tw%.1f s")
    var nRef = nw
    for (r <- 1 to reps; mode <- Seq("salted", "plain")) {
      val (n, sec) = run(mode)
      require(n == nRef, s"row count moved: $n vs $nRef ($mode)")
      nRef = n
      println(f"D04SKEW dir=$dir rep=$r mode=$mode%-6s nSalts=$nSalts " +
        f"hotMin=$hotMin rows=$n wall=$sec%.1f s")
    }
    spark.stop()
  }
}
