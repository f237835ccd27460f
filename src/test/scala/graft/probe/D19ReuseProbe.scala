package graft.probe

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.queries.DedupQueries

/** Probe-scale evidence for the r20 d19 change: the calibration audit
  * reads the shared minhash checkpoint instead of re-running the
  * signature/band/verify pipeline, so in a pipeline that has already run
  * d02, d19's marginal cost should be a projection over the checkpoint —
  * at ANY corpus size, because the avoided work is a whole corpus pass.
  *
  * Per rep: release the shared checkpoint, time d02 COLD (pays the one
  * materialization), then d19 WARM (the designed reuse), then — rep 0
  * only — d19 COLD after another release (what a calibration-only
  * session pays: the same materialization, charged to d19). Row counts
  * printed so output stability is visible across reps.
  *
  * Run: sbt "Test/runMain graft.probe.D19ReuseProbe DIR [reps]"
  */
object D19ReuseProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(q: String): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }

    // warmup: JVM/codegen/footers on an unrelated cheap query
    SparkEntry.queries("d01")(spark, dir).count()

    for (r <- 0 until reps) {
      DedupQueries.releaseShared(spark, "minhash")
      val (n02, t02) = time("d02")
      val (n19w, t19w) = time("d19")
      val cold = if (r == 0) {
        DedupQueries.releaseShared(spark, "minhash")
        val (n19c, t19c) = time("d19")
        f" | d19 cold rows=$n19c%d ${t19c}%7.1f s"
      } else ""
      println(f"[probe] rep=$r d02 cold rows=$n02%d ${t02}%7.1f s | " +
        f"d19 warm rows=$n19w%d ${t19w}%7.1f s$cold")
    }
    DedupQueries.releaseShared(spark, "minhash")
    spark.stop()
  }
}
