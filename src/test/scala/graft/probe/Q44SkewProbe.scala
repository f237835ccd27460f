package graft.probe

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Round-22 skew guard for q44's basket rewrite (VERDICT r21 #3): the
  * collect_set form concentrates each order's whole basket in one
  * aggregation buffer and the a<b pair expansion is quadratic WITHIN a
  * row, so a pathological mega-basket would become a single-task
  * straggler/OOM where the old self-join would have spread it. This probe
  * measures the actual basket-size distribution and the worst single-row
  * pair expansion at a rung (run it at sf0.1 and a make_scale_probe ×10/
  * ×100 dir), plus q44's wall time there.
  *
  * Measured (2026-08-19): max basket 17 / avg 4.07 at sf0.1 AND at ×10 —
  * basket size is bounded by ORDER shape (TPC-H orders carry ≤7 line
  * items; distinct parts per order stays O(10) after the probe's key-
  * offset amplification), not by corpus size, so the per-row expansion is
  * ≤ 17·16/2 = 136 cells at every rung. The guard to watch if the data
  * model ever changes: max_basket growing with SF.
  *
  * Run: sbt "Test/runMain graft.probe.Q44SkewProbe DIR [reps]"
  */
object Q44SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sizes = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_partkey")).as("basket"))
      .agg(max(col("basket")).as("max_basket"),
        avg(col("basket")).as("avg_basket"),
        expr("percentile(basket, 0.99)").as("p99_basket"),
        count(lit(1)).as("n_orders"))
      .collect()(0)
    val maxB = sizes.getLong(0)
    println(f"[q44skew] $dir max_basket=$maxB avg=${sizes.getDouble(1)}%.2f " +
      f"p99=${sizes.getDouble(2)}%.1f n_orders=${sizes.getLong(3)} " +
      f"worst_row_pairs=${maxB * (maxB - 1) / 2}")

    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      SparkEntry.queries("q44")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[q44skew] q44 min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
