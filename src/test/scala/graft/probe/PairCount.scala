package graft.probe

import org.apache.spark.sql.SparkSession

/** Scale-probe helper: fully-parallel row count of one registry query.
  *
  * `sbt "Test/runMain graft.probe.PairCount <sfDir> <query>"`
  *
  * Exists because Verify's `coalesce(1)` parquet dump (right-sized for the
  * driver's sf0.01 oracle outputs) is single-threaded on the final stage —
  * pathological for counting the ~62M-row d19 candidate frame at the
  * 1000× probe decade (BENCH_NOTES "Round 16"). A count() keeps all 32
  * slots busy to the last byte and carries the same information the
  * ladder needs: the candidate-pair cardinality.
  */
object PairCount {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = if (args.length > 1) args(1) else "d19"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, dir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"PAIRS $name $dir: $n (${sec}%.1f s)")
    spark.stop()
  }
}
